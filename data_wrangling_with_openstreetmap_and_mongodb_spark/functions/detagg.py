"""Deterministic (engine- and order-independent) float aggregates.

``SUM``/``AVG`` over doubles depend on summation order: Spark sums partial
aggregates per partition while DuckDB folds sequentially, so the last few bits
of the result differ run-to-run and engine-to-engine.  The testdata's values
are cent-precision, which makes many aggregates land *exactly* on rounding
boundaries (e.g. 4110.245) where a 1-ulp difference flips a hash comparison.

The fix: quantize each term with **pure IEEE-754 double arithmetic** — which
is bit-identical across engines for identical inputs — before summing:

    q(x) = floor(x * 1e6 + 0.5)        # exact integer-valued double

``*``, ``+`` and ``floor`` are each correctly-rounded IEEE ops, so Spark and
DuckDB produce the same integer for every row (no engine-specific
double→decimal conversion, which is where Spark's shortest-representation
rounding and DuckDB's binary rounding disagree at half-way points).  The
integers then sum exactly (order-independent) in a 38-digit decimal — long
sums would overflow around 1e18, i.e. at the 100 TB design point — and one
final division restores the scale.  Result: bit-identical doubles at any
parallelism, with aggregate semantics of "sum/avg at micro precision".

Helpers come in pairs — a Column expression for the Spark plan and a SQL
fragment for the DuckDB oracle — so the two sides stay textually in sync.
The quantize + decimal hash-aggregate stays inside whole-stage codegen and
partial aggregation (map-side combine); overhead is a constant factor on the
agg buffer, not a plan change.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# 1e-6 quantum: far below the data's cent precision, far above the ~1e-13
# relative wobble of order-dependent double summation at these scales.
_SCALE = 1e6
# Exact integer accumulation with 38 digits of headroom (exceeds any
# realistic row count × value magnitude; a bigint would overflow ~1e18).
_ACC_T = "decimal(38,0)"


def _quantized(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(_SCALE) + F.lit(0.5)).cast(_ACC_T)


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over doubles (exact quantized accumulation)."""
    return F.sum(_quantized(col)).cast("double") / F.lit(_SCALE)


def davg(col: Column | str) -> Column:
    """Order-independent AVG over doubles: exact quantized sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_quantized(c)).cast("double") / F.lit(_SCALE) / F.count(c)


def quantize6(col: Column) -> Column:
    """Round a double to the 1e-6 quantum with pure IEEE ops — use on computed
    floats (e.g. cosine scores) whose low bits differ across engines, before
    any threshold filter / ranking / hash comparison."""
    return F.floor(col * F.lit(_SCALE) + F.lit(0.5)) / F.lit(_SCALE)


def quantize6_sql(expr: str) -> str:
    """DuckDB oracle fragment matching :func:`quantize6` bit-for-bit."""
    return f"(FLOOR(({expr}) * 1e6 + 0.5) / 1e6)"


def _quantized_sql(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * 1e6 + 0.5) AS DECIMAL(38,0))"


def dsum_sql(expr: str) -> str:
    """DuckDB oracle fragment matching :func:`dsum` bit-for-bit."""
    return f"(CAST(SUM({_quantized_sql(expr)}) AS DOUBLE) / 1e6)"


def davg_sql(expr: str) -> str:
    """DuckDB oracle fragment matching :func:`davg` bit-for-bit."""
    return f"(CAST(SUM({_quantized_sql(expr)}) AS DOUBLE) / 1e6 / COUNT({expr}))"
