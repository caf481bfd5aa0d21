"""Property-based tests for the aggregation-pipeline compiler: random
2–4-stage pipelines ($match / $unwind / $group / $sort / $limit over
$sum/$avg/$min/$max/$push/$addToSet/$count accumulators) run through BOTH
the Catalyst compiler (docstore/pipeline.py) and a tiny Python reference
evaluator implementing Mongo's aggregation semantics, over a corpus with
nulls everywhere.  The same sweep style that caught the $nin and $not null
bugs in the find tier (tests/test_find_properties.py), one level up.

Mongo semantics locked here:
- $sum of NO numeric values (empty/all-null group) is 0, never null;
  $avg/$min/$max of none are null.
- $push keeps null inputs (order compared as a multiset — pipeline input
  order is not defined over an unordered corpus); $addToSet is a set
  including null.
- plain $unwind drops docs with null/missing/empty arrays;
  preserveNullAndEmptyArrays keeps them with a null element.
- $sort asc places nulls first, desc places them last (BSON order).

Scope notes (mirroring the compiler's documented decisions): homogeneous
field types, floats chosen exactly representable so sums are engine-exact.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate
from conftest import fuzz_examples

# -- the corpus: every field nullable; g groups collide; one group ("zz")
# whose v is ALWAYS null so all-null-group accumulators actually fire
DOCS = [
    {"_id": 0, "g": "a", "n": 3, "v": 1.5, "xs": [1, 2, 3]},
    {"_id": 1, "g": "b", "n": 7, "v": 2.5, "xs": [2, 4]},
    {"_id": 2, "g": None, "n": 5, "v": None, "xs": []},
    {"_id": 3, "g": "a", "n": None, "v": 0.25, "xs": None},
    {"_id": 4, "g": "c", "n": 0, "v": 2.5, "xs": [5]},
    {"_id": 5, "g": "b", "n": 9, "v": None, "xs": [1, 5, 9]},
    {"_id": 6, "g": None, "n": None, "v": None, "xs": None},
    {"_id": 7, "g": "c", "n": 4, "v": 0.75, "xs": [3]},
    {"_id": 8, "g": "zz", "n": 2, "v": None, "xs": [7, 7]},
    {"_id": 9, "g": "zz", "n": None, "v": None, "xs": [0]},
]

SCHEMA = "_id long, g string, n long, v double, xs array<long>"


# -- reference evaluator (Mongo aggregation semantics) ------------------------


def _match_op(val, op, arg) -> bool:
    if op == "$eq":
        return val is not None and val == arg
    if op == "$ne":
        return not _match_op(val, "$eq", arg)
    if op == "$in":
        if val is None:
            return any(a is None for a in arg)
        if isinstance(val, list):
            return any(a in val for a in arg)
        return val in arg
    if val is None:
        return False
    return {
        "$gt": val > arg,
        "$gte": val >= arg,
        "$lt": val < arg,
        "$lte": val <= arg,
    }[op]


def _matches(doc, query) -> bool:
    for k, cond in query.items():
        val = doc.get(k)
        if isinstance(cond, dict):
            if not all(_match_op(val, op, a) for op, a in cond.items()):
                return False
        else:
            if isinstance(val, list):
                if cond not in val:
                    return False
            elif not _match_op(val, "$eq", cond):
                return False
    return True


def _eval_unwind(rows, spec):
    if isinstance(spec, dict):
        field = spec["path"][1:]
        preserve = bool(spec.get("preserveNullAndEmptyArrays", False))
    else:
        field = spec[1:]
        preserve = False
    out = []
    for r in rows:
        arr = r.get(field)
        if not arr:  # None or []
            if preserve:
                out.append({**r, field: None})
            continue
        for e in arr:
            out.append({**r, field: e})
    return out


def _acc_result(op, arg, group_rows):
    if op == "$count" or (op == "$sum" and arg == 1):
        return len(group_rows)
    field = arg[1:]
    vals = [r.get(field) for r in group_rows]
    nn = [x for x in vals if x is not None]
    if op == "$sum":
        return sum(nn) if nn else 0  # Mongo: 0, never null
    if op == "$avg":
        return sum(nn) / len(nn) if nn else None
    if op == "$min":
        return min(nn) if nn else None
    if op == "$max":
        return max(nn) if nn else None
    if op == "$push":
        return vals  # keeps nulls; compared as a multiset
    if op == "$addToSet":
        return set(vals)  # includes null
    raise ValueError(op)


def _eval_group(rows, spec):
    gid = spec["_id"]

    def key_of(r):
        if gid is None:
            return None
        if isinstance(gid, dict):
            return tuple(r.get(v[1:]) for v in gid.values())
        return r.get(gid[1:])

    groups: dict = {}
    for r in rows:
        groups.setdefault(key_of(r), []).append(r)
    out = []
    for k, grows in groups.items():
        doc = {"_id": k}
        for alias, acc in spec.items():
            if alias == "_id":
                continue
            op, arg = next(iter(acc.items()))
            doc[alias] = _acc_result(op, arg, grows)
        out.append(doc)
    return out


def _sort_key(direction):
    # BSON order on one nullable scalar: nulls lowest ascending
    def k(doc):
        v = doc["_id"]
        return (v is not None, v if v is not None else "")

    return k


def eval_pipeline(docs, stages):
    rows = [dict(d) for d in docs]
    for stage in stages:
        op, arg = next(iter(stage.items()))
        if op == "$match":
            rows = [r for r in rows if _matches(r, arg)]
        elif op == "$unwind":
            rows = _eval_unwind(rows, arg)
        elif op == "$group":
            rows = _eval_group(rows, arg)
        elif op == "$sort":
            direction = arg["_id"]
            rows = sorted(rows, key=_sort_key(direction), reverse=direction < 0)
        elif op == "$limit":
            rows = rows[: int(arg)]
        else:
            raise ValueError(op)
    return rows


# -- pipeline strategies -------------------------------------------------------

_G_VALS = st.sampled_from(["a", "b", "c", "zz", "missing"])
_N_VALS = st.integers(min_value=-1, max_value=9)
_V_VALS = st.sampled_from([0.25, 0.75, 1.5, 2.5])

_MATCH = st.one_of(
    _G_VALS.map(lambda v: {"$match": {"g": v}}),
    st.tuples(st.sampled_from(["$gt", "$gte", "$lt", "$lte", "$ne"]), _N_VALS).map(
        lambda t: {"$match": {"n": {t[0]: t[1]}}}
    ),
    st.tuples(st.sampled_from(["$lte", "$gt"]), _V_VALS).map(
        lambda t: {"$match": {"v": {t[0]: t[1]}}}
    ),
    st.lists(_G_VALS, min_size=1, max_size=3).map(
        lambda vs: {"$match": {"g": {"$in": vs}}}
    ),
    st.integers(min_value=0, max_value=9).map(lambda v: {"$match": {"xs": v}}),
)

_UNWIND = st.one_of(
    st.just({"$unwind": "$xs"}),
    st.just({"$unwind": {"path": "$xs", "preserveNullAndEmptyArrays": True}}),
)

_GID = st.sampled_from(
    [None, "$g", "$n", {"g": "$g", "k": "$n"}]
)

_ACC = st.sampled_from(
    [
        {"$sum": 1},
        {"$count": {}},
        {"$sum": "$n"},
        {"$sum": "$v"},
        {"$sum": "$xs"},  # meaningful after $unwind; null otherwise -> 0
        {"$avg": "$v"},
        {"$avg": "$n"},
        {"$min": "$n"},
        {"$max": "$v"},
        {"$min": "$v"},
        {"$max": "$n"},
        {"$push": "$v"},
        {"$push": "$n"},
        {"$addToSet": "$g"},
        {"$addToSet": "$n"},
    ]
)

_GROUP = st.tuples(
    _GID, st.lists(_ACC, min_size=1, max_size=3, unique_by=lambda a: str(a))
).map(
    lambda t: {
        "$group": {"_id": t[0], **{f"acc{i}": a for i, a in enumerate(t[1])}}
    }
)

_SORT_LIMIT = st.tuples(
    st.sampled_from([1, -1]), st.integers(min_value=1, max_value=5)
).map(lambda t: [{"$sort": {"_id": t[0]}}, {"$limit": t[1]}])


@st.composite
def _pipelines(draw):
    stages = []
    if draw(st.booleans()):
        stages.append(draw(_MATCH))
    unwound = draw(st.booleans())
    if unwound:
        stages.append(draw(_UNWIND))
    grouped = draw(st.booleans()) or not stages
    if grouped:
        g = draw(_GROUP)
        if not unwound:
            # $xs is an array unless unwound: Spark cannot SUM/AVG an array
            # column (Mongo would ignore it -> 0/null, a typed-storage scope
            # cut); retarget those accumulators at n
            spec = g["$group"]
            for alias, acc in list(spec.items()):
                if alias != "_id" and list(acc.values())[0] == "$xs":
                    spec[alias] = {next(iter(acc)): "$n"}
        stages.append(g)
        # $sort/$limit tail only over a SCALAR group key (deterministic
        # cutoff needs a unique, totally-ordered sort key)
        if isinstance(g["$group"]["_id"], str) and draw(st.booleans()):
            stages.extend(draw(_SORT_LIMIT))
    return stages, grouped


# -- comparison ----------------------------------------------------------------


def _canon_val(v):
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        # one numeric tower: Spark longs vs double-typed sums (0 vs 0.0)
        return ("num", repr(round(float(v), 9)))
    if isinstance(v, tuple):  # compound group key: order-significant
        return ("key", tuple(repr(_canon_val(x)) for x in v))
    if isinstance(v, list):  # $push / arrays: compared as a multiset
        return ("multiset", tuple(sorted(repr(_canon_val(x)) for x in v)))
    if isinstance(v, set):
        return ("set", tuple(sorted(repr(_canon_val(x)) for x in v)))
    return v


def _canon_spark_rows(rows, group_spec):
    out = []
    for r in rows:
        d = r.asDict()
        if group_spec is not None:
            gid = group_spec["_id"]
            doc = {}
            if gid is None:
                doc["_id"] = None  # global group: no key column in Spark
            elif isinstance(gid, dict):
                # compound key compiles to one top-level column per dict key
                doc["_id"] = tuple(d[k] for k in gid)
            else:
                doc["_id"] = d["_id"]
            for alias, acc in group_spec.items():
                if alias == "_id":
                    continue
                v = d[alias]
                if next(iter(acc)) == "$addToSet":
                    v = set(v)
                doc[alias] = v
        else:
            doc = d
        out.append(doc)
    return out


def _assert_same(spark_docs, ref_docs, ordered):
    def canon(doc):
        # repr-ize values so heterogenous (None/str/int) docs sort stably
        return tuple(
            sorted((k, repr(_canon_val(v))) for k, v in doc.items())
        )

    a = [canon(d) for d in spark_docs]
    b = [canon(d) for d in ref_docs]
    if not ordered:
        a, b = sorted(a), sorted(b)
    assert a == b


_DF_CACHE: dict = {}


def _corpus(spark):
    if "df" not in _DF_CACHE:
        df = spark.createDataFrame(
            [tuple(d[k] for k in ("_id", "g", "n", "v", "xs")) for d in DOCS],
            SCHEMA,
        ).cache()
        df.count()
        _DF_CACHE["df"] = df
    return _DF_CACHE["df"]


@settings(
    max_examples=fuzz_examples(120),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_pipelines())
def test_pipeline_matches_reference_evaluator(spark, pipeline):
    stages, grouped = pipeline
    df = _corpus(spark)
    sdf = aggregate(df, stages)
    group_spec = None
    for stage in stages:
        if "$group" in stage:
            group_spec = stage["$group"]
    got = _canon_spark_rows(sdf.collect(), group_spec)
    want = eval_pipeline(DOCS, stages)
    # $limit after $sort makes row ORDER part of the contract up to the cut;
    # compare as ordered lists then (sort key is the unique group _id)
    ordered = any("$limit" in s for s in stages)
    _assert_same(got, want, ordered)


def test_sum_of_all_null_group_is_zero(spark):
    """Deterministic pin for the Mongo rule the fuzz corpus targets with the
    'zz' group: $sum of no numeric values is 0 (SQL SUM would be null);
    $avg/$min/$max of none stay null."""
    df = _corpus(spark)
    out = aggregate(
        df,
        [
            {"$match": {"g": "zz"}},
            {"$group": {"_id": "$g", "s": {"$sum": "$v"}, "a": {"$avg": "$v"},
                        "mn": {"$min": "$v"}, "mx": {"$max": "$v"}}},
        ],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["s"] == 0.0 and r["a"] is None and r["mn"] is None and r["mx"] is None


def test_window_sum_of_all_null_frame_is_zero(spark):
    """Same rule for $setWindowFields $sum over an all-null window."""
    sdf = spark.createDataFrame(
        [("zz", 1, None), ("zz", 2, None)], "g string, seq int, v double"
    )
    out = aggregate(
        sdf,
        [{"$setWindowFields": {"partitionBy": "$g", "sortBy": {"seq": 1},
                               "output": {"s": {"$sum": "$v"}}}}],
    ).collect()
    assert [r["s"] for r in out] == [0.0, 0.0]


# -- tier 2: $addFields expression chains + $project shapes --------------------
#
# Locks the stage-level expression rules on the same nulls-everywhere corpus:
# arithmetic null-propagates ($add/$subtract/$multiply/$abs), $ifNull
# substitutes, aggregation comparisons are TOTAL over BSON order (null lowest,
# never SQL-null — the r5 _lt_total rule), include-mode $project passes an
# existing _id through unless {"_id": 0}, exclude-mode drops only the listed
# fields.


def _ev_expr(expr, doc):
    if isinstance(expr, str) and expr.startswith("$"):
        return doc.get(expr[1:])
    if not isinstance(expr, dict):
        return expr
    op, a = next(iter(expr.items()))
    if op in ("$add", "$subtract", "$multiply"):
        x, y = _ev_expr(a[0], doc), _ev_expr(a[1], doc)
        if x is None or y is None:
            return None
        return x + y if op == "$add" else x - y if op == "$subtract" else x * y
    if op == "$abs":
        x = _ev_expr(a, doc)
        return None if x is None else abs(x)
    if op == "$ifNull":
        x = _ev_expr(a[0], doc)
        return _ev_expr(a[1], doc) if x is None else x
    if op == "$gt":
        x, y = _ev_expr(a[0], doc), _ev_expr(a[1], doc)
        kx = (x is not None, x if x is not None else 0)
        ky = (y is not None, y if y is not None else 0)
        return kx > ky
    if op == "$cond":
        return _ev_expr(a[1], doc) if _ev_expr(a[0], doc) else _ev_expr(a[2], doc)
    raise ValueError(op)


def _ev_project(doc, spec):
    modes = {v for k, v in spec.items() if k != "_id"}
    include = modes == {1}
    if include:
        keep = {k for k, v in spec.items() if v == 1}
        out = {k: doc.get(k) for k in keep}
        if spec.get("_id", 1) != 0 and "_id" in doc:
            out["_id"] = doc["_id"]
        return out
    return {k: v for k, v in doc.items() if spec.get(k, 1) != 0}


_EXPRS = [
    {"$add": ["$n", 3]},
    {"$subtract": ["$n", 5]},
    {"$multiply": ["$v", 2.0]},
    {"$ifNull": ["$n", -1]},
    {"$abs": {"$subtract": ["$n", 4]}},
    {"$cond": [{"$gt": ["$n", 4]}, "$v", -0.5]},
    {"$ifNull": [{"$multiply": ["$v", 4.0]}, {"$add": ["$n", 0]}]},
]

_PROJECTS = [
    {"g": 1, "d": 1},
    {"_id": 0, "d": 1, "n": 1},
    {"xs": 0, "v": 0},
    {"d": 0},
]


@settings(
    max_examples=fuzz_examples(80),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.sampled_from(_EXPRS),
    st.sampled_from(_PROJECTS),
    st.one_of(st.none(), _G_VALS),
)
def test_addfields_project_matches_reference(spark, expr, proj, match_g):
    stages = [{"$addFields": {"d": expr}}]
    if match_g is not None:
        stages.append({"$match": {"g": match_g}})
    stages.append({"$project": proj})
    sdf = aggregate(_corpus(spark), stages)
    got = [r.asDict() for r in sdf.collect()]
    want = []
    for doc in DOCS:
        d2 = {**doc, "d": _ev_expr(expr, doc)}
        if match_g is not None and not _matches(d2, {"g": match_g}):
            continue
        want.append(_ev_project(d2, proj))
    _assert_same(got, want, ordered=False)
