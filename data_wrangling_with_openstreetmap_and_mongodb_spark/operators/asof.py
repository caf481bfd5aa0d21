"""As-of (point-in-time) join: attach to each left row the most recent
right row at-or-before its timestamp, per key.

The classic time-series enrichment operator (pandas ``merge_asof``, kdb
``aj``, DuckDB ``ASOF JOIN``).  Spark has no native form; the naive
translation — a non-equi range join — explodes to a per-key cross product
and Catalyst can only nested-loop it.  This implementation is the
union-merge idiom instead:

1. union left and right rows into one keyed timeline,
2. one window sorted by ``(time, right-rows-first, tiebreak)``,
3. ``last(payload-struct, ignorenulls=True)`` over the unbounded-preceding
   frame carries the latest right payload forward to every left row,
4. filter back to left rows.

Cost: ONE shuffle of |L|+|R| rows and one per-partition sort — the same
price as a regular sort-merge join, with no quadratic blowup on hot keys.
At 100 TB both sides pre-bucketed on the key skip even that shuffle.

Determinism: ties on equal timestamps resolve right-rows-before-left (a
right row at time T is visible to a left row at the same T — "at or
before"), and among simultaneous right rows by ascending ``tiebreak_col``
(the LAST one wins), so results are stable across partitionings and
engines.  The payload travels as ONE struct, so all attached columns come
from the same right row even when some payload fields are null.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left rows + ``payload_cols`` from the latest right row with
    ``right_time <= left_time`` and matching ``on`` key (null when none).

    ``left_time``/``right_time`` must be mutually comparable (same type or
    both numeric); ``tiebreak_col`` orders simultaneous right rows (defaults
    to the first payload column).
    """
    tb = tiebreak_col or payload_cols[0]
    left_cols = list(left.columns)
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.col(tb).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(right.schema[tb].dataType).alias("__tb"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    # right rows sort BEFORE left rows at equal time (desc on the 0/1 flag):
    # "at or before" includes simultaneous right rows
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r).withColumn(
        "__last", F.last("__p", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__is_right") == 0).select(
        *left_cols,
        *[F.col("__last")[c].alias(c) for c in payload_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lo: int,
    hi: int,
) -> DataFrame:
    """Pairs where ``right_time − left_time ∈ [lo, hi]`` and keys match:
    every left column prefixed ``l_``, every right column prefixed ``r_``.

    The scalable range-join pattern: expressing the band directly gives
    Catalyst a non-equi condition it can only nested-loop.  Instead both
    sides bin their (integer) timestamps at width ``hi − lo``; a window of
    that length spans at most TWO bins, so each left row emits its two
    candidate bins and the band becomes an equi-join on ``(key, bin)``
    followed by the exact filter.  Candidate volume is bounded by
    2 × (per-key rows per bin window) — never the per-key cross product.

    Bins use exact integer floor division (pmod-based, negative-safe);
    ``lo``/``hi``/timestamps must share one integer unit (e.g. epoch µs).
    """
    if hi <= lo:
        raise ValueError(f"empty interval [lo={lo}, hi={hi}]")
    w = hi - lo

    def ibin(col: F.Column) -> F.Column:
        # exact floor(col / w) on bigints: fp division can misround a
        # boundary at epoch-microsecond magnitudes
        return ((col - F.pmod(col, F.lit(w))) / w).cast("long")

    l = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
        F.col(on).alias("__k"),
        F.col(left_time).alias("__lt"),
    ).withColumn(
        "__bin",
        F.explode(
            F.array_distinct(
                F.array(
                    ibin(F.col("__lt") + F.lit(lo)),
                    ibin(F.col("__lt") + F.lit(hi)),
                )
            )
        ),
    )
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        F.col(on).alias("__rk"),
        F.col(right_time).alias("__rt"),
    ).withColumn("__bin", ibin(F.col("__rt")))
    d = F.col("__rt") - F.col("__lt")
    return (
        l.join(r, (F.col("__k") == F.col("__rk")) & (l["__bin"] == r["__bin"]))
        .filter((d >= lo) & (d <= hi))
        .drop("__k", "__rk", "__bin", "__lt", "__rt")
    )
