"""Property-based tests for the $setWindowFields compiler: random window
specs (aggregates / ranks / $shift / gap-fill over documents- and
range-frames, every sortBy direction, a null partition key, nulls in the
value column) run through BOTH the Catalyst compiler and a tiny Python
reference evaluator implementing Mongo's window semantics.  Third tier of
the fuzz family (find -> expressions -> pipelines -> windows); the earlier
tiers caught the $nin/$not null bugs and the all-null-$sum bug.

Mongo semantics locked here:
- default window is the WHOLE partition, even with a sortBy present;
- $sum over an empty/all-null frame is 0; $avg/$min/$max/$first/$last null;
- $push/$firstN/$lastN keep nulls in frame order; $addToSet keeps null;
  $minN/$maxN skip nulls;
- documents bounds clamp to the partition, [1, 2] at the last row is an
  EMPTY frame ($push -> [], $count -> 0);
- range bounds are value offsets on the (single, ascending) sortBy;
- rank family: BSON order (nulls lowest), $rank leaves gaps, $denseRank
  doesn't, $documentNumber is positional;
- $shift's default fires only OUTSIDE the partition (an in-partition null
  stays null); $locf carries the last non-null forward in sort order;
  $linearFill interpolates between surrounding non-nulls on the sort key.

Scope (mirroring the compiler's documented decisions): unique non-null sort
key per partition for order-sensitive ops, exactly-representable doubles so
sums are engine-exact, rank-family ties exercised via the nullable value
column.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate
from conftest import fuzz_examples

# seq: unique ASCENDING ints per partition (not globally contiguous, so
# range frames have gaps to skip); v: exact quarters with nulls and TIES
# (rank fodder); zz: all-null v so empty-frame aggregates fire.
DOCS = [
    {"_id": 0, "g": "a", "seq": 1, "v": 1.5},
    {"_id": 1, "g": "a", "seq": 2, "v": None},
    {"_id": 2, "g": "a", "seq": 4, "v": 0.25},
    {"_id": 3, "g": "a", "seq": 7, "v": 1.5},
    {"_id": 4, "g": "a", "seq": 8, "v": -2.75},
    {"_id": 5, "g": "b", "seq": 1, "v": 0.5},
    {"_id": 6, "g": "b", "seq": 3, "v": 0.5},
    {"_id": 7, "g": "b", "seq": 5, "v": None},
    {"_id": 8, "g": "b", "seq": 9, "v": 3.25},
    {"_id": 9, "g": None, "seq": 2, "v": 1.0},
    {"_id": 10, "g": None, "seq": 6, "v": None},
    {"_id": 11, "g": "zz", "seq": 1, "v": None},
    {"_id": 12, "g": "zz", "seq": 4, "v": None},
]

SCHEMA = "_id long, g string, seq long, v double"


# -- reference evaluator (Mongo window semantics) ------------------------------


def _frame_indices(n: int, i: int, frame, sort_vals):
    if frame is None:
        return list(range(n))
    if "documents" in frame:
        lo, hi = frame["documents"]
        lo_i = 0 if lo == "unbounded" else i if lo == "current" else i + lo
        hi_i = n - 1 if hi == "unbounded" else i if hi == "current" else i + hi
        lo_i, hi_i = max(lo_i, 0), min(hi_i, n - 1)
        return list(range(lo_i, hi_i + 1)) if lo_i <= hi_i else []
    lo, hi = frame["range"]
    s = sort_vals[i]
    lo_v = -math.inf if lo == "unbounded" else s if lo == "current" else s + lo
    hi_v = math.inf if hi == "unbounded" else s if hi == "current" else s + hi
    return [j for j in range(n) if lo_v <= sort_vals[j] <= hi_v]


def _bson_rank_key(v, direction):
    # BSON: null lowest; descending sort = reversed BSON order (nulls last)
    present = v is not None
    if direction >= 0:
        return (present, v if present else 0.0)
    return (not present, -v if present else 0.0)


def _eval_output(rows, sort_by, name, spec):
    """rows: one partition already in sort order (or input order when no
    sortBy).  Returns the list of per-row values for this output field."""
    spec = dict(spec)
    frame = spec.pop("window", None)
    op, arg = next(iter(spec.items()))
    n = len(rows)
    sort_vals = [r[next(iter(sort_by))] if sort_by else None for r in rows]

    if op in ("$rank", "$denseRank", "$documentNumber"):
        keys = [
            tuple(_bson_rank_key(r.get(f), d) for f, d in sort_by.items())
            for r in rows
        ]
        outs = []
        for i in range(n):
            if op == "$documentNumber":
                outs.append(i + 1)
            elif op == "$rank":
                outs.append(1 + sum(1 for k in keys if k < keys[i]))
            else:
                outs.append(1 + len({k for k in keys if k < keys[i]}))
        return outs
    if op == "$shift":
        by = int(arg.get("by", 1))
        dflt = arg.get("default")
        field = arg["output"][1:]
        outs = []
        for i in range(n):
            j = i + by
            if 0 <= j < n:
                outs.append(rows[j].get(field))
            else:
                outs.append(dflt)
        return outs
    if op == "$locf":
        field = arg[1:]
        outs, carry = [], None
        for r in rows:
            if r.get(field) is not None:
                carry = r[field]
            outs.append(carry)
        return outs
    if op == "$linearFill":
        field = arg[1:]
        ks = sort_vals
        outs = []
        for i, r in enumerate(rows):
            v = r.get(field)
            if v is not None:
                outs.append(v)
                continue
            pv = pk = nv = nk = None
            for j in range(i - 1, -1, -1):
                if rows[j].get(field) is not None:
                    pv, pk = rows[j][field], float(ks[j])
                    break
            for j in range(i + 1, n):
                if rows[j].get(field) is not None:
                    nv, nk = rows[j][field], float(ks[j])
                    break
            if pv is None or nv is None:
                outs.append(None)
            elif nk == pk:
                outs.append(pv)
            else:
                outs.append(pv + (nv - pv) * (float(ks[i]) - pk) / (nk - pk))
        return outs

    outs = []
    for i in range(n):
        idx = _frame_indices(n, i, frame, sort_vals)
        if op == "$count" or (op == "$sum" and arg == 1):
            outs.append(len(idx))
            continue
        if op in ("$top", "$topN", "$bottom", "$bottomN"):
            pick_sort = arg["sortBy"]
            k = 1 if op in ("$top", "$bottom") else int(arg["n"])
            bottom = op in ("$bottom", "$bottomN")
            field_out = arg["output"][1:]
            items = []
            for j in idx:
                key = tuple(
                    _bson_rank_key(rows[j].get(f), -d if bottom else d)
                    for f, d in pick_sort.items()
                )
                tie = _bson_rank_key(rows[j].get(field_out), 1)
                items.append((key, tie, rows[j].get(field_out)))
            items.sort(key=lambda t: (t[0], t[1]))
            picks = [v for _, _, v in items[:k]]
            if bottom:
                picks.reverse()
            if op in ("$top", "$bottom"):
                outs.append(picks[0] if picks else None)
            else:
                outs.append(picks)
            continue
        if op in ("$minN", "$maxN", "$firstN", "$lastN"):
            field, k = arg["input"][1:], int(arg["n"])
        else:
            field = arg[1:]
        vals = [rows[j].get(field) for j in idx]
        nn = [x for x in vals if x is not None]
        if op == "$sum":
            outs.append(sum(nn) if nn else 0)
        elif op == "$avg":
            outs.append(sum(nn) / len(nn) if nn else None)
        elif op == "$min":
            outs.append(min(nn) if nn else None)
        elif op == "$max":
            outs.append(max(nn) if nn else None)
        elif op == "$first":
            outs.append(vals[0] if vals else None)
        elif op == "$last":
            outs.append(vals[-1] if vals else None)
        elif op == "$push":
            outs.append(vals)
        elif op == "$addToSet":
            outs.append(set(vals))
        elif op == "$minN":
            outs.append(sorted(nn)[:k])
        elif op == "$maxN":
            outs.append(sorted(nn, reverse=True)[:k])
        elif op == "$firstN":
            outs.append(vals[:k])
        elif op == "$lastN":
            outs.append(vals[-k:] if len(vals) > k else vals)
        else:
            raise ValueError(op)
    return outs


def eval_swf(docs, sort_by, outputs):
    parts: dict = {}
    for d in docs:
        parts.setdefault(d["g"], []).append(d)
    res = []
    for rows in parts.values():
        if sort_by:
            rows = sorted(
                rows,
                key=lambda r: tuple(
                    _bson_rank_key(r.get(f), d) for f, d in sort_by.items()
                ),
            )
        cols = {name: _eval_output(rows, sort_by, name, spec)
                for name, spec in outputs.items()}
        for i, r in enumerate(rows):
            res.append({**r, **{name: cols[name][i] for name in outputs}})
    return res


# -- spec strategies -----------------------------------------------------------

_BOUND = st.sampled_from(["unbounded", "current", -3, -2, -1, 0, 1, 2, 3])


def _bound_rank(b):
    if b == "unbounded":
        return None  # context-dependent: -inf as lower, +inf as upper
    return 0 if b == "current" else b


@st.composite
def _frames(draw, allow_range: bool):
    kind = draw(st.sampled_from(
        ["default", "documents", "range"] if allow_range else ["default", "documents"]
    ))
    if kind == "default":
        return None
    lo = draw(_BOUND)
    hi = draw(_BOUND)
    # Mongo requires lower <= upper; order the drawn pair
    lo_r = -math.inf if lo == "unbounded" else _bound_rank(lo)
    hi_r = math.inf if hi == "unbounded" else _bound_rank(hi)
    if lo_r > hi_r:
        lo, hi = hi, lo
    return {kind: [lo, hi]}


_PLAIN_OPS = [
    {"$sum": "$v"}, {"$sum": 1}, {"$avg": "$v"}, {"$min": "$v"},
    {"$max": "$v"}, {"$count": {}}, {"$addToSet": "$v"},
    {"$minN": {"input": "$v", "n": 2}}, {"$maxN": {"input": "$v", "n": 3}},
    # ranked picks: default frame = per-partition ordered-window path;
    # explicit frame = per-row comparator path — both must match the eval.
    # Tie scope: Mongo leaves key-tie order unspecified and the two paths
    # break ties differently for SINGLE-direction desc specs, so entries
    # either pick the sort key itself as output or sort by the unique seq
    {"$top": {"output": "$v", "sortBy": {"v": 1}}},
    {"$topN": {"output": "$v", "sortBy": {"v": -1}, "n": 2}},
    {"$topN": {"output": "$v", "sortBy": {"v": 1, "seq": -1}, "n": 3}},
    {"$bottom": {"output": "$v", "sortBy": {"v": -1, "seq": 1}}},
    {"$bottomN": {"output": "$v", "sortBy": {"seq": -1}, "n": 2}},
]
# order-sensitive inside the frame -> need a deterministic (unique) sortBy
_ORDERED_OPS = [
    {"$push": "$v"}, {"$first": "$v"}, {"$last": "$v"},
    {"$firstN": {"input": "$v", "n": 2}}, {"$lastN": {"input": "$v", "n": 2}},
]
_RANK_OPS = [{"$rank": {}}, {"$denseRank": {}}, {"$documentNumber": {}}]


@st.composite
def _swf_specs(draw):
    sort_kind = draw(st.sampled_from(["asc", "desc", "none", "multi"]))
    sort_by = {"asc": {"seq": 1}, "desc": {"seq": -1}, "none": None,
               "multi": {"v": -1, "seq": 1}}[sort_kind]
    outputs = {}
    for i in range(draw(st.integers(min_value=1, max_value=3))):
        pool = list(_PLAIN_OPS)
        if sort_kind != "none":
            pool += _ORDERED_OPS
            pool.append({"$shift": {
                "output": "$v",
                "by": draw(st.sampled_from([-2, -1, 1, 2])),
                **({"default": draw(st.sampled_from([-9.0, 99.0]))}
                   if draw(st.booleans()) else {}),
            }})
        if sort_kind == "asc":
            pool += [{"$locf": "$v"}, {"$linearFill": "$v"}]
        op = draw(st.sampled_from(pool))
        op_name = next(iter(op))
        spec = dict(op)
        # explicit frames need a sortBy (Mongo and Spark both reject rows/
        # range frames without ordering); gap-fill/shift reject windows
        if sort_kind != "none" and op_name not in ("$shift", "$locf", "$linearFill"):
            frame = draw(_frames(allow_range=(sort_kind == "asc")))
            if frame is not None:
                spec["window"] = frame
        outputs[f"w{i}"] = spec
    if sort_kind != "none" and draw(st.booleans()):
        outputs[f"r{len(outputs)}"] = draw(st.sampled_from(_RANK_OPS))
    return sort_by, outputs


# -- comparison ----------------------------------------------------------------


def _canon(v):
    if isinstance(v, set):
        return ("set", tuple(sorted(repr(_canon(x)) for x in v)))
    if isinstance(v, list):
        return ("list", tuple(repr(_canon(x)) for x in v))
    if isinstance(v, float) or isinstance(v, int) and not isinstance(v, bool):
        return ("num", repr(round(float(v), 9)))
    return v


_DF_CACHE: dict = {}


def _corpus(spark):
    if "df" not in _DF_CACHE:
        df = spark.createDataFrame(
            [tuple(d[k] for k in ("_id", "g", "seq", "v")) for d in DOCS],
            SCHEMA,
        ).cache()
        df.count()
        _DF_CACHE["df"] = df
    return _DF_CACHE["df"]


def _run_and_compare(spark, sort_by, outputs):
    stage: dict = {"partitionBy": "$g", "output": outputs}
    if sort_by:
        stage["sortBy"] = sort_by
    sdf = aggregate(_corpus(spark), [{"$setWindowFields": stage}])
    got = {}
    for r in sdf.collect():
        d = r.asDict()
        for name, spec in outputs.items():
            if next(iter(k for k in spec if k != "window")) == "$addToSet":
                d[name] = set(d[name]) if d[name] is not None else set()
        got[d["_id"]] = d
    want = {d["_id"]: d for d in eval_swf(DOCS, sort_by, outputs)}
    assert set(got) == set(want)
    for _id in want:
        for name in outputs:
            g, w = _canon(got[_id][name]), _canon(want[_id][name])
            assert g == w, (
                f"_id={_id} field={name} spec={outputs[name]} "
                f"sortBy={sort_by}: spark={got[_id][name]!r} "
                f"ref={want[_id][name]!r}"
            )


@settings(
    max_examples=fuzz_examples(140),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_swf_specs())
def test_window_fields_match_reference_evaluator(spark, spec):
    sort_by, outputs = spec
    _run_and_compare(spark, sort_by, outputs)


def test_empty_documents_frame_semantics(spark):
    """[1, 2] at the last row is an empty frame: $push -> [], $count -> 0,
    $sum -> 0, $first/$avg -> null (deterministic pin for the fuzz corpus)."""
    outputs = {
        "p": {"$push": "$v", "window": {"documents": [1, 2]}},
        "c": {"$count": {}, "window": {"documents": [1, 2]}},
        "s": {"$sum": "$v", "window": {"documents": [1, 2]}},
        "f": {"$first": "$v", "window": {"documents": [1, 2]}},
    }
    _run_and_compare(spark, {"seq": 1}, outputs)


def test_range_frame_skips_gaps(spark):
    """range [-1, 1] on seq [1,2,4,7,8]: row seq=4 sees only itself (gaps on
    both sides), seq=7 sees {7,8}."""
    _run_and_compare(
        spark, {"seq": 1},
        {"n_in": {"$count": {}, "window": {"range": [-1, 1]}},
         "vs": {"$push": "$v", "window": {"range": [-1, 1]}}},
    )


def test_rank_ties_and_nulls_both_directions(spark):
    """$rank/$denseRank over the nullable, tied v column: nulls first asc
    (BSON lowest), last desc; gaps after ties for $rank only."""
    for d in (1, -1):
        sdf = aggregate(_corpus(spark), [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"v": d},
            "output": {"rk": {"$rank": {}}, "dr": {"$denseRank": {}}},
        }}])
        got = {r["_id"]: (r["rk"], r["dr"]) for r in sdf.collect()}
        keys = {}
        for doc in DOCS:
            keys.setdefault(doc["g"], []).append(
                (_bson_rank_key(doc["v"], d), doc["_id"]))
        for g_rows in keys.values():
            ks = [k for k, _ in g_rows]
            for k, _id in g_rows:
                assert got[_id][0] == 1 + sum(1 for x in ks if x < k)
                assert got[_id][1] == 1 + len({x for x in ks if x < k})
