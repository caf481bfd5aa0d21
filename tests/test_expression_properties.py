"""Property-based tests for the $-expression compiler: random expression
trees evaluate identically through Catalyst (docstore/expressions.py) and a
Python reference evaluator implementing Mongo's semantics — total BSON-order
comparisons (null == null, null lowest), null-propagating arithmetic,
null-as-empty-string for $toUpper/$toLower, $cond treating a null condition
as false, $ifNull coalescing.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import (
    ExpressionCompiler,
)

ROWS = [
    {"_id": 0, "n": 3, "m": 7, "f": 1.5, "s": "abc"},
    {"_id": 1, "n": None, "m": 2, "f": None, "s": "XyZ"},
    {"_id": 2, "n": -4, "m": None, "f": 2.5, "s": None},
    {"_id": 3, "n": 0, "m": 0, "f": -0.5, "s": ""},
    {"_id": 4, "n": None, "m": None, "f": None, "s": None},
]
SCHEMA = "_id long, n long, m long, f double, s string"


# -- reference evaluator -----------------------------------------------------
def _ev(doc, e):
    if isinstance(e, str) and e.startswith("$") and not e.startswith("$$"):
        return doc.get(e[1:])
    if not isinstance(e, dict):
        return e
    (op, args), = e.items()
    if op == "$add":
        vals = [_ev(doc, a) for a in args]
        return None if any(v is None for v in vals) else sum(vals)
    if op == "$subtract":
        a, b = (_ev(doc, x) for x in args)
        return None if a is None or b is None else a - b
    if op == "$multiply":
        vals = [_ev(doc, a) for a in args]
        return None if any(v is None for v in vals) else math.prod(vals)
    if op == "$abs":
        v = _ev(doc, args)
        return None if v is None else abs(v)
    if op == "$ifNull":
        for a in args:
            v = _ev(doc, a)
            if v is not None:
                return v
        return None
    if op == "$cond":
        cond, then, other = args
        return _ev(doc, then) if _ev(doc, cond) is True else _ev(doc, other)
    if op in ("$eq", "$ne", "$lt", "$lte", "$gt", "$gte"):
        a, b = (_ev(doc, x) for x in args)

        def lt(x, y):  # total order, null lowest
            if x is None:
                return y is not None
            if y is None:
                return False
            return x < y

        return {
            "$eq": a == b,
            "$ne": a != b,
            "$lt": lt(a, b),
            "$gt": lt(b, a),
            "$lte": not lt(b, a),
            "$gte": not lt(a, b),
        }[op]
    if op == "$toUpper":
        v = _ev(doc, args)
        return ("" if v is None else v).upper()
    if op == "$toLower":
        v = _ev(doc, args)
        return ("" if v is None else v).lower()
    if op == "$concat":
        vals = [_ev(doc, a) for a in args]
        return None if any(v is None for v in vals) else "".join(vals)
    if op == "$strcasecmp":
        a, b = ((_ev(doc, x) or "").upper() for x in args)
        return -1 if a < b else (1 if a > b else 0)
    raise ValueError(op)


# -- strategies --------------------------------------------------------------
_NUM_FIELD = st.sampled_from(["$n", "$m", "$f"])
_NUM_LIT = st.sampled_from([0, 1, 2, -3, 0.5])

_NUM_EXPR = st.recursive(
    st.one_of(_NUM_FIELD, _NUM_LIT),
    lambda inner: st.one_of(
        st.lists(inner, min_size=2, max_size=3).map(lambda xs: {"$add": xs}),
        st.tuples(inner, inner).map(lambda t: {"$subtract": [t[0], t[1]]}),
        st.lists(inner, min_size=2, max_size=2).map(lambda xs: {"$multiply": xs}),
        inner.map(lambda x: {"$abs": x}),
        st.tuples(inner, inner).map(lambda t: {"$ifNull": [t[0], t[1]]}),
    ),
    max_leaves=5,
)

_BOOL_EXPR = st.tuples(
    st.sampled_from(["$eq", "$ne", "$lt", "$lte", "$gt", "$gte"]),
    _NUM_EXPR,
    _NUM_EXPR,
).map(lambda t: {t[0]: [t[1], t[2]]})

_COND_EXPR = st.tuples(_BOOL_EXPR, _NUM_EXPR, _NUM_EXPR).map(
    lambda t: {"$cond": [t[0], t[1], t[2]]}
)

_STR_EXPR = st.one_of(
    st.sampled_from(["$s"]).map(lambda f: {"$toUpper": f}),
    st.sampled_from(["$s"]).map(lambda f: {"$toLower": f}),
    st.tuples(st.sampled_from(["$s"]), st.sampled_from(["-", "x"])).map(
        lambda t: {"$concat": [t[0], t[1]]}
    ),
    st.tuples(
        st.sampled_from(["$s", "abc", "XY"]), st.sampled_from(["$s", "aBc", ""])
    ).map(lambda t: {"$strcasecmp": [t[0], t[1]]}),
)

_EXPR = st.one_of(_NUM_EXPR, _BOOL_EXPR, _COND_EXPR, _STR_EXPR)

_DF_CACHE: dict = {}


def _corpus(spark):
    if "df" not in _DF_CACHE:
        df = spark.createDataFrame(
            [tuple(d[k] for k in ("_id", "n", "m", "f", "s")) for d in ROWS],
            SCHEMA,
        ).cache()
        df.count()
        _DF_CACHE["df"] = df
    return _DF_CACHE["df"]


def _close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=1e-12, abs_tol=1e-12)
    return a == b


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_EXPR)
def test_expression_matches_reference_evaluator(spark, expr):
    df = _corpus(spark)
    col = ExpressionCompiler(df).compile(expr)
    got = {r["_id"]: r["out"] for r in df.select("_id", col.alias("out")).collect()}
    for doc in ROWS:
        want = _ev(doc, expr)
        assert _close(got[doc["_id"]], want), (
            f"expr={expr!r} _id={doc['_id']} got={got[doc['_id']]!r} want={want!r}"
        )
