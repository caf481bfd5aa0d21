"""Count-min sketch: mergeable sub-linear frequency estimation.

The second sketch family next to HLL (``approx_distinct_users``), with one
decisive difference: HLL's register layout is engine-private, so that query
can only ever be rows-only-checked — this CMS is built from the repo's
engine-agnostic md5 hash family (operators/text.md5_hash32 + the
minhash universal-hash coefficients), so the ENTIRE sketch — every cell
count, every estimate, every collision — replays bit-for-bit in a DuckDB
oracle.  A sketch you can hash-verify externally is a sketch you can trust
in a multi-engine pipeline.

Semantics (Cormode & Muthukrishnan 2005): ``depth`` pairwise-independent
hash rows × ``width`` buckets; each occurrence increments one bucket per
row; a key's estimate is the MIN over its ``depth`` buckets.  Estimates
never undercount; with prob ≥ 1−(1/2)^depth the overcount is ≤ (e/width)·N.

Scale shape: building is ONE hash-aggregation over (row, bucket) — the
shuffle carries depth keys per item, and partial aggregation collapses each
partition to ≤ depth·width cells before the exchange regardless of input
size (that is the whole point of a sketch: the reduced state is the d×w
grid, not the keys).  Cell grids from disjoint corpus shards ADD cell-wise
(mergeable — a cell union + sum re-aggregation), which is what makes the
sketch the 100 TB path for streaming/incremental frequency tracking.
Estimation broadcasts the tiny grid (≤ depth·width rows) against the probe
keys — probes never shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
    MERSENNE61,
    minhash_perm_coeffs,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
    md5_hash32,
    md5_hash32_sql,
)


def _bucket_cols(key: Column, depth: int, width: int, seed: int) -> list[Column]:
    """One bucket index per hash row for ``key``: ((a·h32 + b) mod P) mod w.

    All operands are non-negative and < 2⁶³ (see minhash_perm_coeffs bounds),
    so plain ``%`` matches DuckDB's ``%`` with no sign correction.
    """
    h = md5_hash32(key)
    return [
        ((F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE61) % F.lit(width)).alias("bucket")
        for a, b in minhash_perm_coeffs(depth, seed)
    ]


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Build the sketch grid over every row of ``df`` (one increment per
    occurrence of ``key_col``): ``(row, bucket, cnt)`` — only non-empty
    cells, ≤ depth·width rows total.
    """
    cells = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("row"), b.alias("bucket"))
                for i, b in enumerate(
                    _bucket_cols(F.col(key_col), depth, width, seed)
                )
            ]
        )
    ).alias("rb")
    return (
        df.select(cells)
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Merge sketch grids built with identical (depth, width, seed): union +
    cell-wise sum — the property that lets shards/increments sketch
    independently and combine without rescanning anything."""
    it = iter(grids)
    out = next(it)
    for g in it:
        out = out.unionByName(g)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    grid: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Estimate each key's frequency from the grid: ``(key, est_cnt)`` =
    min over the key's ``depth`` cells (missing cell → 0).

    The grid broadcasts (≤ depth·width rows); probe keys never shuffle.
    """
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), b.alias("bucket"))
                    for i, b in enumerate(
                        _bucket_cols(F.col(key_col), depth, width, seed)
                    )
                ]
            )
        ).alias("rb"),
    ).select("key", "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(grid), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


def cms_hash_sql(key_expr: str, depth: int, width: int, seed: int = 7) -> str:
    """DuckDB fragment: a list of the key's ``depth`` bucket indices,
    bit-identical to :func:`_bucket_cols`."""
    h = md5_hash32_sql(key_expr)
    buckets = ", ".join(
        f"(({a} * ({h}) + {b}) % {MERSENNE61}) % {width}"
        for a, b in minhash_perm_coeffs(depth, seed)
    )
    return f"[{buckets}]"
