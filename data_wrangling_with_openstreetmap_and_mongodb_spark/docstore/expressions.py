"""Mongo aggregation-expression → Catalyst Column compiler.

The reference builds queries as BSON specs shipped to mongod (SURVEY.md §3.2).
Here the same specs compile to *native Column expressions* — no UDFs — so
Catalyst sees every predicate/projection and can push down, prune, and codegen.

Field paths use Mongo dot notation (``user.followers_count``,
``created.timestamp``) and map directly onto Spark struct paths.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

MILLIS_PER_SEC = 1000


class ExpressionCompiler:
    """Compiles Mongo expression documents against a DataFrame's schema.

    The schema is needed for type-directed semantics, e.g. ``$subtract`` on
    two datetimes yields milliseconds (README.md:1235-1242) while on numbers
    it is plain subtraction.
    """

    def __init__(self, df: DataFrame):
        self.df = df

    # -- helpers ------------------------------------------------------------
    def field_type(self, path: str) -> T.DataType | None:
        dt: T.DataType | None = self.df.schema
        for part in path.split("."):
            if isinstance(dt, T.StructType) and part in dt.fieldNames():
                dt = dt[part].dataType
            elif isinstance(dt, T.MapType):
                dt = dt.valueType
            else:
                return None
        return dt

    def _is_datetime(self, e: Any) -> bool:
        import datetime as _dt

        if isinstance(e, _dt.datetime):
            return True
        if isinstance(e, str):
            if e.startswith("$$NOW"):
                return True
            if e.startswith("$"):
                return isinstance(
                    self.field_type(e[1:]),
                    (T.TimestampType, T.TimestampNTZType, T.DateType),
                )
        if isinstance(e, dict) and len(e) == 1:
            op, arg = next(iter(e.items()))
            if op == "$literal":
                return self._is_datetime(arg)
            if op == "$ifNull":
                return any(self._is_datetime(a) for a in arg)
        return False

    # -- main entry ----------------------------------------------------------
    def compile(self, e: Any) -> Column:
        """Compile one expression: '$field' ref, literal, or {$op: args} doc."""
        if isinstance(e, str):
            if e.startswith("$$NOW"):
                return F.current_timestamp()
            if e.startswith("$"):
                return F.col(e[1:])
            return F.lit(e)
        if isinstance(e, dict):
            if len(e) != 1:
                raise ValueError(f"expression doc must have one operator: {e}")
            op, args = next(iter(e.items()))
            return self._op(op, args)
        return F.lit(e)

    def _binary_args(self, args: Any) -> tuple[Column, Column]:
        a, b = args
        return self.compile(a), self.compile(b)

    def _op(self, op: str, args: Any) -> Column:
        c = self.compile
        if op == "$literal":
            return F.lit(args)
        if op == "$add":
            out = c(args[0])
            for a in args[1:]:
                out = out + c(a)
            return out
        if op == "$subtract":
            a, b = args
            # datetime - datetime → milliseconds, matching mongod
            if self._is_datetime(a) and self._is_datetime(b):
                ca = c(a).cast("timestamp")
                cb = c(b).cast("timestamp")
                return (ca.cast("double") - cb.cast("double")) * MILLIS_PER_SEC
            return c(a) - c(b)
        if op == "$multiply":
            out = c(args[0])
            for a in args[1:]:
                out = out * c(a)
            return out
        if op == "$divide":
            ca, cb = self._binary_args(args)
            return ca / cb
        if op == "$mod":
            ca, cb = self._binary_args(args)
            return ca % cb
        if op == "$abs":
            return F.abs(c(args))
        if op == "$concat":
            return F.concat(*[c(a) for a in args])
        if op == "$toLower":
            return F.lower(c(args))
        if op == "$toUpper":
            return F.upper(c(args))
        if op == "$trim":
            return F.trim(c(args["input"] if isinstance(args, dict) else args))
        if op == "$substr" or op == "$substrCP":
            s, start, length = args
            return F.substring(c(s), int(start) + 1, int(length))
        if op == "$split":
            s, sep = args
            return F.split(c(s), F.lit(sep), -1) if isinstance(sep, str) else F.split(c(s), sep)
        if op == "$strLenCP":
            return F.length(c(args))
        if op == "$toInt":
            return c(args).cast("int")
        if op == "$toLong":
            return c(args).cast("long")
        if op == "$toDouble":
            return c(args).cast("double")
        if op == "$toString":
            return c(args).cast("string")
        # datetime parts (Mongo conventions: $dayOfWeek 1=Sunday..7=Saturday,
        # same as Spark's dayofweek — README.md:1202-1211)
        if op == "$dayOfWeek":
            return F.dayofweek(c(args))
        if op == "$year":
            return F.year(c(args))
        if op == "$month":
            return F.month(c(args))
        if op == "$dayOfMonth":
            return F.dayofmonth(c(args))
        if op == "$hour":
            return F.hour(c(args))
        if op == "$minute":
            return F.minute(c(args))
        # arrays
        if op == "$size":
            return F.size(c(args))
        if op == "$arrayElemAt":
            arr, idx = args
            return F.element_at(c(arr), int(idx) + 1 if int(idx) >= 0 else int(idx))
        if op == "$in":  # expression form: [needle, haystack-array]
            needle, hay = args
            return F.array_contains(c(hay), c(needle))
        # conditionals
        if op == "$cond":
            if isinstance(args, dict):
                cond, then, other = args["if"], args["then"], args["else"]
            else:
                cond, then, other = args
            return F.when(self.compile_bool(cond), c(then)).otherwise(c(other))
        if op == "$ifNull":
            return F.coalesce(*[c(a) for a in args])
        # comparisons as expressions (used inside $cond / $project)
        if op in ("$eq", "$ne", "$gt", "$gte", "$lt", "$lte"):
            ca, cb = self._binary_args(args)
            return {
                "$eq": ca == cb,
                "$ne": ca != cb,
                "$gt": ca > cb,
                "$gte": ca >= cb,
                "$lt": ca < cb,
                "$lte": ca <= cb,
            }[op]
        if op == "$and":
            out = self.compile_bool(args[0])
            for a in args[1:]:
                out = out & self.compile_bool(a)
            return out
        if op == "$or":
            out = self.compile_bool(args[0])
            for a in args[1:]:
                out = out | self.compile_bool(a)
            return out
        if op == "$not":
            return ~self.compile_bool(args[0] if isinstance(args, list) else args)
        raise ValueError(f"unsupported aggregation expression operator: {op}")

    def compile_bool(self, e: Any) -> Column:
        col = self.compile(e)
        return col
