"""Property-based tests for the find-query compiler: random query documents
run through BOTH the Catalyst compiler (docstore/find.py) and a tiny Python
reference evaluator implementing Mongo's matching semantics, over a corpus
with nulls everywhere.  Any divergence — especially around Mongo's
negation-matches-missing rules ($ne/$nin/$not/$nor) vs SQL's
null-propagating comparisons — fails with the offending query document.

Scope notes (mirroring the compiler's documented decisions): homogeneous
field types (Mongo's cross-type ordering is out of scope on typed storage),
no null literals inside query args except $in/$nin lists.  Null ELEMENTS
inside array values are in scope since r7: {$in: [null]} matches an array
containing a null element (ADVICE r6).
"""

from __future__ import annotations
from conftest import fuzz_examples

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
    DocumentCollection,
)

# -- the corpus: every field nullable, values from small pools so queries hit
DOCS = [
    {"_id": 0, "s": "alpha", "n": 3, "f": 1.5, "xs": [1, 2, 3], "p": [0.0, 0.0]},
    {"_id": 1, "s": "beta", "n": 7, "f": 2.5, "xs": [2, 4], "p": [3.0, 4.0]},
    {"_id": 2, "s": None, "n": 5, "f": None, "xs": [], "p": None},
    {"_id": 3, "s": "alpha", "n": None, "f": 0.5, "xs": None, "p": [10.0, -2.0]},
    {"_id": 4, "s": "gamma", "n": 0, "f": 2.5, "xs": [5], "p": [-5.0, 2.0]},
    {"_id": 5, "s": "beta", "n": 9, "f": None, "xs": [1, 5, 9], "p": [2.0, -1.0]},
    {"_id": 6, "s": None, "n": None, "f": None, "xs": None, "p": None},
    {"_id": 7, "s": "delta", "n": 4, "f": 0.5, "xs": [3], "p": [7.0, 7.0]},
    {"_id": 8, "s": "beta", "n": 2, "f": 1.5, "xs": [1, None], "p": [1.0, 1.0]},  # null element
]

SCHEMA = "_id long, s string, n long, f double, xs array<long>, p array<double>"


# -- reference evaluator (Mongo semantics on typed documents) ----------------
def _cmp(val, op, arg) -> bool:
    if val is None:
        return False
    return {
        "$gt": val > arg, "$gte": val >= arg,
        "$lt": val < arg, "$lte": val <= arg,
    }[op]


def _op(val, op, arg) -> bool:
    if op in ("$gt", "$gte", "$lt", "$lte"):
        return _cmp(val, op, arg)
    if op == "$eq":
        if isinstance(val, list):
            return arg in val
        return val is not None and val == arg
    if op == "$ne":
        return not _op(val, "$eq", arg)  # matches null/missing (Mongo)
    if op == "$in":
        # null in the list matches null/missing fields (Mongo)
        if val is None:
            return any(a is None for a in arg)
        if isinstance(val, list):
            return any(a in val for a in arg)
        return val in arg
    if op == "$nin":
        # exact complement: {$nin: [null]} must NOT match null/missing
        return not _op(val, "$in", arg)
    if op == "$exists":
        return (val is not None) == bool(arg)
    if op == "$regex":
        return val is not None and re.search(arg, val) is not None
    if op == "$not":
        if isinstance(arg, dict):
            return not all(_op(val, o, a) for o, a in arg.items())
        return not _op(val, "$eq", arg)
    if op == "$size":
        return isinstance(val, list) and len(val) == arg
    if op == "$all":
        return isinstance(val, list) and all(a in val for a in arg)
    if op == "$mod":
        d, r = arg
        if val is None:
            return False
        return val - d * int(val / d) == r  # C-style remainder, like SQL %
    if op == "$elemMatch":
        return isinstance(val, list) and any(
            all(_op(e, o, a) for o, a in arg.items()) for e in val
        )
    if op in ("$bitsAllSet", "$bitsAnySet", "$bitsAllClear", "$bitsAnyClear"):
        if val is None:
            return False  # null never matches bit tests, even under $nor
        mask = arg if isinstance(arg, int) else sum(1 << b for b in arg)
        m = val & mask
        return {"$bitsAllSet": m == mask, "$bitsAnySet": m != 0,
                "$bitsAllClear": m == 0, "$bitsAnyClear": m != mask}[op]
    if op == "$geoWithin":
        if not isinstance(val, list) or len(val) != 2:
            return False
        x, y = val
        shape, sarg = next(iter(arg.items()))
        if shape == "$box":
            (x1, y1), (x2, y2) = sarg
            return (min(x1, x2) <= x <= max(x1, x2)
                    and min(y1, y2) <= y <= max(y1, y2))
        (cx, cy), r = sarg  # $center (planar)
        return (x - cx) * (x - cx) + (y - cy) * (y - cy) <= r * r
    raise ValueError(op)


def _match(doc, query) -> bool:
    for k, v in query.items():
        if k == "$and":
            if not all(_match(doc, q) for q in v):
                return False
        elif k == "$or":
            if not any(_match(doc, q) for q in v):
                return False
        elif k == "$nor":
            if any(_match(doc, q) for q in v):
                return False
        elif isinstance(v, dict) and v and all(
            isinstance(kk, str) and kk.startswith("$") for kk in v
        ):
            if not all(_op(doc.get(k), op, a) for op, a in v.items()):
                return False
        else:
            if not _op(doc.get(k), "$eq", v):
                return False
    return True


# -- query strategies --------------------------------------------------------
_S_VALS = st.sampled_from(["alpha", "beta", "gamma", "delta", "missing"])
_N_VALS = st.integers(min_value=-2, max_value=10)
_F_VALS = st.sampled_from([0.5, 1.5, 2.5, 9.9])
_X_VALS = st.integers(min_value=0, max_value=9)


def _scalar_leaf(field, vals):
    cmp_ops = st.sampled_from(["$gt", "$gte", "$lt", "$lte", "$eq", "$ne"])
    return st.one_of(
        vals.map(lambda v: {field: v}),                                  # bare eq
        st.tuples(cmp_ops, vals).map(lambda t: {field: {t[0]: t[1]}}),
        st.lists(st.one_of(vals, st.none()), min_size=1, max_size=3).map(
            lambda vs: {field: {"$in": vs}}
        ),
        st.lists(st.one_of(vals, st.none()), min_size=1, max_size=3).map(
            lambda vs: {field: {"$nin": vs}}
        ),
        st.booleans().map(lambda b: {field: {"$exists": b}}),
        st.tuples(cmp_ops, vals).map(
            lambda t: {field: {"$not": {t[0]: t[1]}}}
        ),
        st.tuples(vals, vals).map(
            lambda t: {field: {"$gte": min(t), "$lte": max(t)}}          # range
        ),
    )


_N_LEAF_EXTRA = st.tuples(
    st.integers(min_value=2, max_value=4), st.integers(min_value=0, max_value=3)
).map(lambda t: {"n": {"$mod": [t[0], t[1]]}})

_S_REGEX = st.sampled_from(["^al", "a$", "et", "^g"]).map(
    lambda p: {"s": {"$regex": p}}
)

_X_LEAF = st.one_of(
    _X_VALS.map(lambda v: {"xs": v}),                                    # member eq
    st.lists(st.one_of(_X_VALS, st.none()), min_size=1, max_size=3).map(
        lambda vs: {"xs": {"$in": vs}}
    ),
    st.lists(st.one_of(_X_VALS, st.none()), min_size=1, max_size=3).map(
        lambda vs: {"xs": {"$nin": vs}}
    ),
    st.lists(_X_VALS, min_size=1, max_size=2).map(lambda vs: {"xs": {"$all": vs}}),
    st.integers(min_value=0, max_value=4).map(lambda n: {"xs": {"$size": n}}),
    _X_VALS.map(lambda v: {"xs": {"$ne": v}}),
    st.tuples(st.sampled_from(["$gt", "$lt", "$gte", "$lte"]), _X_VALS).map(
        lambda t: {"xs": {"$elemMatch": {t[0]: t[1]}}}
    ),
)

_BITS = st.tuples(
    st.sampled_from(["$bitsAllSet", "$bitsAnySet", "$bitsAllClear", "$bitsAnyClear"]),
    st.one_of(st.integers(min_value=1, max_value=7),
              st.lists(st.integers(min_value=0, max_value=3), min_size=1,
                       max_size=2, unique=True)),
).map(lambda t: {"n": {t[0]: t[1]}})

_GEO = st.one_of(
    st.tuples(st.floats(-6, 6), st.floats(-6, 6), st.floats(1, 8), st.floats(1, 8)).map(
        lambda t: {"p": {"$geoWithin": {"$box": [[t[0], t[1]], [t[0] + t[2], t[1] + t[3]]]}}}
    ),
    st.tuples(st.floats(-4, 4), st.floats(-4, 4), st.floats(0.5, 8)).map(
        lambda t: {"p": {"$geoWithin": {"$center": [[t[0], t[1]], t[2]]}}}
    ),
)

_LEAF = st.one_of(
    _BITS,
    _GEO,
    _scalar_leaf("s", _S_VALS),
    _scalar_leaf("n", _N_VALS),
    _scalar_leaf("f", _F_VALS),
    _N_LEAF_EXTRA,
    _S_REGEX,
    _X_LEAF,
)

_QUERY = st.recursive(
    _LEAF,
    lambda inner: st.one_of(
        st.lists(inner, min_size=1, max_size=3).map(lambda qs: {"$and": qs}),
        st.lists(inner, min_size=1, max_size=3).map(lambda qs: {"$or": qs}),
        st.lists(inner, min_size=1, max_size=2).map(lambda qs: {"$nor": qs}),
        st.tuples(inner, inner).map(lambda t: {"$and": [t[0], t[1]]}),
    ),
    max_leaves=4,
)


_DF_CACHE: dict = {}


def _corpus(spark):
    if "df" not in _DF_CACHE:
        df = spark.createDataFrame(
            [tuple(d[k] for k in ("_id", "s", "n", "f", "xs", "p")) for d in DOCS],
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
@given(_QUERY)
def test_find_matches_reference_evaluator(spark, query):
    df = _corpus(spark)
    got = {
        r["_id"] for r in DocumentCollection(df, "fuzz").find(query).collect()
    }
    want = {d["_id"] for d in DOCS if _match(d, query)}
    assert got == want, f"query={query!r} got={sorted(got)} want={sorted(want)}"
