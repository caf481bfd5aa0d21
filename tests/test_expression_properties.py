"""Property-based tests for the $-expression compiler: random expression
trees evaluate identically through Catalyst (docstore/expressions.py) and a
Python reference evaluator implementing Mongo's semantics — total BSON-order
comparisons (null == null, null lowest), null-propagating arithmetic,
null-as-empty-string for $toUpper/$toLower, $cond treating a null condition
as false, $ifNull coalescing.
"""

from __future__ import annotations
from conftest import fuzz_examples

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import (
    ExpressionCompiler,
)

ROWS = [
    {"_id": 0, "n": 3, "m": 7, "f": 1.5, "s": "abc", "xs": [3, 1, 2]},
    {"_id": 1, "n": None, "m": 2, "f": None, "s": "XyZ", "xs": [0, 5]},
    {"_id": 2, "n": -4, "m": None, "f": 2.5, "s": None, "xs": []},
    {"_id": 3, "n": 0, "m": 0, "f": -0.5, "s": "", "xs": [2, 2, 7, -1]},
    {"_id": 4, "n": None, "m": None, "f": None, "s": None, "xs": None},
]
SCHEMA = "_id long, n long, m long, f double, s string, xs array<long>"


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
    if op in ("$sin", "$cos", "$tan", "$atan", "$sinh", "$cosh", "$tanh"):
        v = _ev(doc, args)
        return None if v is None else getattr(math, op[1:])(v)
    if op == "$atan2":
        a, b = (_ev(doc, x) for x in args)
        return None if a is None or b is None else math.atan2(a, b)
    if op == "$degreesToRadians":
        v = _ev(doc, args)
        return None if v is None else math.radians(v)
    if op == "$radiansToDegrees":
        v = _ev(doc, args)
        return None if v is None else math.degrees(v)
    if op == "$setEquals":
        a, b = (_ev(doc, x) for x in args)
        if a is None or b is None:
            return None
        return set(a) == set(b)
    if op == "$setIsSubset":
        a, b = (_ev(doc, x) for x in args)
        if a is None or b is None:
            return None
        return set(a) <= set(b)
    if op == "$allElementsTrue":
        v = _ev(doc, args[0])
        return False if v is None else all(x is not None and x != 0 for x in v)
    if op == "$anyElementTrue":
        v = _ev(doc, args[0])
        return False if v is None else any(x is not None and x != 0 for x in v)
    if op == "$first":
        v = _ev(doc, args)
        return None if not v else v[0]
    if op == "$last":
        v = _ev(doc, args)
        return None if not v else v[-1]
    if op in ("$minN", "$maxN"):
        v = _ev(doc, args["input"])
        if v is None:
            return None
        picked = sorted(
            (x for x in v if x is not None), reverse=(op == "$maxN")
        )
        return picked[: args["n"]]
    if op == "$median":
        v = _ev(doc, args["input"])
        if v is None:
            return None
        vals = sorted(float(x) for x in v if x is not None)
        if not vals:
            return None
        h = (len(vals) - 1) * 0.5
        lo = int(math.floor(h))
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (h - lo) * (vals[hi] - vals[lo])
    if op == "$type":
        static = {"n": "long", "m": "long", "f": "double", "s": "string",
                  "xs": "array"}
        if isinstance(args, str) and args.startswith("$"):
            name = args[1:]
            if name not in static:
                return "missing"
            return "null" if doc.get(name) is None else static[name]
        raise ValueError(args)
    if op == "$toBool":
        v = _ev(doc, args)
        if v is None:
            return None
        if isinstance(v, str):
            return True
        return v != 0
    if op == "$slice":  # r8 fuzz: Mongo front-clamping for negative starts
        arr = _ev(doc, args[0])
        if arr is None:
            return None
        if len(args) == 2:
            n = args[1]
            return list(arr[:n]) if n > 0 else list(arr[max(len(arr) + n, 0):])
        pos, n = args[1], args[2]
        start = pos if pos >= 0 else max(len(arr) + pos, 0)
        return list(arr[start : start + n])
    if op == "$arrayElemAt":
        arr, idx = _ev(doc, args[0]), _ev(doc, args[1])
        if arr is None or idx is None:
            return None
        i = int(idx)
        if i < -len(arr) or i >= len(arr):
            return None
        return arr[i]
    if op == "$split":  # literal delimiter (r8)
        s = _ev(doc, args[0])
        return None if s is None else s.split(args[1])
    if op == "$substr":
        s = _ev(doc, args[0]) or ""
        start, ln = args[1], args[2]
        return s[start:] if ln < 0 else s[start : start + ln]
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

_TRIG_EXPR = st.one_of(
    st.tuples(
        st.sampled_from(
            ["$sin", "$cos", "$tan", "$atan", "$sinh", "$cosh", "$tanh",
             "$degreesToRadians", "$radiansToDegrees"]
        ),
        st.sampled_from(["$f", 0.25, -1.5]),
    ).map(lambda t: {t[0]: t[1]}),
    st.tuples(
        st.sampled_from(["$f", 0.5]), st.sampled_from(["$f", 1.0, -2.0])
    ).map(lambda t: {"$atan2": [t[0], t[1]]}),
)

_ARR_LIT = st.sampled_from([[1, 2], [2, 1, 3], [0], [], [5, 2]])

_ARRAY_EXPR = st.one_of(
    st.tuples(st.sampled_from(["$setEquals", "$setIsSubset"]),
              st.sampled_from(["$xs"]), _ARR_LIT).map(
        lambda t: {t[0]: [t[1], t[2]]}
    ),
    st.tuples(st.sampled_from(["$allElementsTrue", "$anyElementTrue"]),
              st.sampled_from(["$xs"])).map(lambda t: {t[0]: [t[1]]}),
    st.sampled_from(["$first", "$last"]).map(lambda o: {o: "$xs"}),
    st.tuples(st.sampled_from(["$minN", "$maxN"]),
              st.integers(min_value=1, max_value=4)).map(
        lambda t: {t[0]: {"input": "$xs", "n": t[1]}}
    ),
    st.just({"$median": {"input": "$xs", "method": "approximate"}}),
    # r8 semantics: $slice clamping, $arrayElemAt dynamic index, $split
    # literal delimiters, $substr negative length
    st.integers(min_value=-6, max_value=6).filter(lambda n: n != 0).map(
        lambda n: {"$slice": ["$xs", n]}
    ),
    st.tuples(
        st.integers(min_value=-6, max_value=4),
        st.integers(min_value=1, max_value=4),
    ).map(lambda t: {"$slice": ["$xs", t[0], t[1]]}),
    st.sampled_from([-7, -2, -1, 0, 1, 2, 7, "$n", "$m"]).map(
        lambda i: {"$arrayElemAt": ["$xs", i]}
    ),
)

_STR2_EXPR = st.one_of(
    st.sampled_from(["-", "x", "b", "bc"]).map(
        lambda d: {"$split": ["$s", d]}
    ),
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=-2, max_value=4),
    ).map(lambda t: {"$substr": ["$s", t[0], t[1]]}),
)

_TYPE_EXPR = st.one_of(
    st.sampled_from(["$n", "$f", "$s", "$xs", "$nope"]).map(
        lambda f: {"$type": f}
    ),
    st.sampled_from(["$n", "$m", "$f"]).map(lambda f: {"$toBool": f}),
)

_EXPR = st.one_of(
    _NUM_EXPR, _BOOL_EXPR, _COND_EXPR, _STR_EXPR, _STR2_EXPR, _TRIG_EXPR,
    _ARRAY_EXPR, _TYPE_EXPR,
)

_DF_CACHE: dict = {}


def _corpus(spark):
    if "df" not in _DF_CACHE:
        df = spark.createDataFrame(
            [tuple(d[k] for k in ("_id", "n", "m", "f", "s", "xs")) for d in ROWS],
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
    max_examples=fuzz_examples(120),
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
