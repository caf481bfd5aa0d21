"""Property-fuzz tier for the classic ``update_many`` compiler (VERDICT r10
ask #3): random Mongo update documents applied by the CASE-compiled
DocumentCollection.update_many vs a plain dict-mutation reference evaluator
implementing the documented semantics (docstore/collection.py docstring).

The lookup, merge, and redact/funnel fuzz tiers each caught a real bug on
first contact; this surface had the same silent-divergence seams.  Found
while building the tier (fixed in the same commit): $unset/$pop crashed at
analysis time on missing fields (Mongo no-ops), $addToSet re-appended an
already-present null on every update (array_contains returns NULL for a
null probe), and $pull's array_remove had unsafe null-element semantics.
The tier's first RUN then caught a fourth in those very fixes: a
default-arg lambda (``lambda x, v=...``) counts as two parameters to
PySpark's higher-order-function arity inspection, so $pull silently
compared elements against the array INDEX — exactly the silent-divergence
class this tier exists for.
"""

from __future__ import annotations
from conftest import fuzz_examples

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
    DocumentCollection,
)

SCHEMA = "id long, num double, tag string, tag2 string, arr array<bigint>"
COLUMNS = ["id", "num", "tag", "tag2", "arr"]

# -- input corpus -------------------------------------------------------------
_num = st.one_of(st.none(), st.sampled_from([-2.5, 0.0, 1.0, 3.5, 7.0]))
_tag = st.one_of(st.none(), st.sampled_from(["a", "b"]))
_elem = st.one_of(st.none(), st.sampled_from([1, 2, 3]))
_arr = st.one_of(st.none(), st.lists(_elem, max_size=4))
_docs = st.lists(
    st.tuples(_num, _tag, st.one_of(st.none(), st.just("x")), _arr),
    min_size=1,
    max_size=6,
)

# -- filters ------------------------------------------------------------------
_query = st.one_of(
    st.none(),
    st.builds(lambda k: {"id": {"$gte": k}}, st.integers(0, 5)),
    st.builds(lambda k: {"id": {"$lt": k}}, st.integers(0, 5)),
    st.builds(lambda v: {"tag": v}, st.sampled_from(["a", "b", "c"])),
    st.builds(lambda x: {"num": {"$gt": x}}, st.sampled_from([-1.0, 0.0, 2.0])),
)


def _matches(doc: dict, query: dict | None) -> bool:
    if query is None:
        return True
    ((f, cond),) = query.items()
    v = doc.get(f)
    if isinstance(cond, dict):
        ((op, arg),) = cond.items()
        if v is None:
            return False
        return {"$gte": v >= arg, "$lt": v < arg, "$gt": v > arg}[op]
    return v is not None and v == cond


# -- update documents ----------------------------------------------------------
_push_spec = st.one_of(
    _elem,
    st.builds(lambda xs: {"$each": xs}, st.lists(_elem, max_size=3)),
)
_ops = st.one_of(
    st.builds(lambda v: ("$set", {"num": v}), _num),
    st.builds(lambda v: ("$set", {"tag": v}), _tag),
    st.builds(lambda v: ("$set", {"arr": v}), st.lists(_elem, max_size=3)),
    st.builds(lambda v: ("$set", {"extra": v}), st.sampled_from([4.0, -1.0])),
    st.builds(
        lambda f: ("$unset", [f]), st.sampled_from(["num", "tag", "arr", "ghost"])
    ),
    st.builds(
        lambda f, n: ("$inc", {f: n}),
        st.sampled_from(["num", "extra"]),
        st.sampled_from([-1.0, 2.0]),
    ),
    st.builds(lambda n: ("$mul", {"num": n}), st.sampled_from([0.0, 2.0, -0.5])),
    st.builds(
        lambda op, v: (op, {"num": v}),
        st.sampled_from(["$min", "$max"]),
        st.sampled_from([-3.0, 1.0, 5.0]),
    ),
    st.builds(
        lambda op, spec: (op, {"arr": spec}),
        st.sampled_from(["$push", "$addToSet"]),
        _push_spec,
    ),
    st.builds(
        lambda op, v: (op, {"newarr": v}),
        st.sampled_from(["$push", "$addToSet"]),
        st.one_of(_elem, st.builds(lambda xs: {"$each": xs}, st.lists(_elem, min_size=1, max_size=3))),
    ),
    st.builds(
        lambda f, v: ("$pull", {f: v}), st.sampled_from(["arr", "ghost"]), _elem
    ),
    st.builds(
        lambda f, w: ("$pop", {f: w}),
        st.sampled_from(["arr", "ghost"]),
        st.sampled_from([1, -1]),
    ),
    st.builds(
        lambda src_dst: ("$rename", dict([src_dst])),
        st.sampled_from([("tag", "tag2"), ("tag", "fresh"), ("num", "num9")]),
    ),
)
_update = st.lists(_ops, min_size=1, max_size=3, unique_by=lambda t: t[0]).map(dict)


# -- reference evaluator --------------------------------------------------------
def _nse(a, b) -> bool:
    """Null-safe equality (Spark eqNullSafe)."""
    return (a is None and b is None) or (a is not None and b is not None and a == b)


def _dedup_first(xs: list) -> list:
    out: list = []
    for x in xs:
        if not any(_nse(y, x) for y in out):
            out.append(x)
    return out


def _apply_reference(docs: list[dict], columns: list[str], query, update):
    """Mongo-update semantics as plain dict mutation, mirroring the documented
    compiled behavior: matched rows mutate, unmatched pass through; a newly
    created column appears on EVERY row (typed columns), null where untouched."""
    docs = [dict(d) for d in docs]
    columns = list(columns)

    def ensure(f):
        if f not in columns:
            columns.append(f)
            for d in docs:
                d[f] = None

    for op, args in update.items():
        if op == "$set":
            for f, v in args.items():
                existed = f in columns
                ensure(f)
                for d in docs:
                    if _matches(d, query):
                        d[f] = list(v) if isinstance(v, list) else v
                    elif not existed:
                        d[f] = None
        elif op == "$unset":
            for f in args:
                if f not in columns:
                    continue
                for d in docs:
                    if _matches(d, query):
                        d[f] = None
        elif op in ("$inc", "$mul"):
            ident = 0.0 if op == "$inc" else 1.0
            for f, n in args.items():
                existed = f in columns
                ensure(f)
                for d in docs:
                    if _matches(d, query):
                        cur = d[f] if (existed and d[f] is not None) else ident
                        d[f] = cur + n if op == "$inc" else cur * n
        elif op in ("$min", "$max"):
            fn = min if op == "$min" else max
            for f, v in args.items():
                existed = f in columns
                ensure(f)
                for d in docs:
                    if _matches(d, query):
                        cur = d[f] if (existed and d[f] is not None) else v
                        d[f] = fn(cur, v)
        elif op in ("$push", "$addToSet"):
            for f, spec in args.items():
                new_vals = (
                    list(spec["$each"])
                    if isinstance(spec, dict)
                    else [spec]
                )
                existed = f in columns
                ensure(f)
                for d in docs:
                    if not _matches(d, query):
                        continue
                    if existed:
                        cur = list(d[f]) if d[f] is not None else []
                        if op == "$push":
                            d[f] = cur + new_vals
                        else:
                            for nv in new_vals:
                                if not any(_nse(x, nv) for x in cur):
                                    cur.append(nv)
                            d[f] = cur
                    else:
                        d[f] = (
                            list(new_vals)
                            if op == "$push"
                            else _dedup_first(new_vals)
                        )
        elif op == "$pull":
            for f, v in args.items():
                if f not in columns:
                    continue  # Mongo: no-op on missing fields
                for d in docs:
                    if _matches(d, query) and d[f] is not None:
                        d[f] = [x for x in d[f] if not _nse(x, v)]
        elif op == "$pop":
            for f, which in args.items():
                if f not in columns:
                    continue
                for d in docs:
                    if _matches(d, query) and d[f] is not None:
                        d[f] = d[f][:-1] if which == 1 else d[f][1:]
        elif op == "$rename":
            for old, new in args.items():
                existed = new in columns
                ensure(new)
                for d in docs:
                    if _matches(d, query):
                        d[new] = d[old]
                        d[old] = None
                    elif not existed:
                        d[new] = None
        else:  # pragma: no cover
            raise AssertionError(op)
    return docs, columns


def _norm(v):
    if isinstance(v, float) and v == 0.0:
        return 0.0  # -0.0 == 0.0 folding (0.0 * -0.5)
    return v


@given(docs=_docs, query=_query, update=_update)
@settings(
    max_examples=fuzz_examples(100),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_update_many_matches_dict_reference(spark, docs, query, update):
    rows = [
        {"id": i, "num": n, "tag": t, "tag2": t2, "arr": a}
        for i, (n, t, t2, a) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        [(r["id"], r["num"], r["tag"], r["tag2"], r["arr"]) for r in rows], SCHEMA
    )
    got_df = DocumentCollection(df).update_many(query, update).df
    want_docs, want_cols = _apply_reference(rows, COLUMNS, query, update)
    assert sorted(got_df.columns) == sorted(want_cols), (query, update)
    got = {
        r["id"]: {c: _norm(r[c]) for c in want_cols} for r in got_df.collect()
    }
    want = {d["id"]: {c: _norm(d[c]) for c in want_cols} for d in want_docs}
    assert got == want, (query, update)


def test_update_many_rejects_unknown_operator(spark):
    df = spark.createDataFrame([(1, 1.0, "a", None, None)], SCHEMA)
    coll = DocumentCollection(df)
    import pytest

    with pytest.raises(ValueError, match="unsupported update operator"):
        coll.update_many(None, {"$bit": {"num": 1}})
    with pytest.raises(ValueError, match="rename source field missing"):
        coll.update_many(None, {"$rename": {"ghost": "x"}})
    with pytest.raises(ValueError, match="takes 1 or -1"):
        coll.update_many(None, {"$pop": {"arr": 2}})
    with pytest.raises(ValueError, match="modifiers"):
        coll.update_many(None, {"$push": {"arr": {"$each": [1], "$sort": 1}}})
