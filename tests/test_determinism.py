"""Parallelism-invariance: the determinism contract (functions/detagg.py)
holds under different partitionings — the property that makes the oracle
hash comparison safe on any cluster size."""

from __future__ import annotations

import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES

PARTITION_SENSITIVE = [
    "pricing_summary",  # sums/avgs of double products
    "avg_of_avgs_by_nation",  # two-level float aggregation
    "hourly_event_rollup",  # many small groups
    "text_quality_by_source",  # composite float scoring
    # r11 driver-window rotations with float paths (the rows the external
    # driver hash-checks fresh this round):
    "ds_window_integral",  # trapezoid fold + derivative division chain
    "ds_bucket_balances",  # conditional buckets + max over doubles
    "weekly_retention_cohorts",  # integer-exact, pins the cohort join
    "event_pairs_within_30min",  # banded self-join membership
    "mixture_sampled_counts",  # salted-hash membership must not see layout
    "hybrid_search_rrf",  # rank windows + quantized fused sum
]


@pytest.mark.parametrize("name", PARTITION_SENSITIVE)
def test_results_identical_across_shuffle_partitionings(name, spark, sf_dir):
    fn = QUERIES[name].fn
    results = []
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("1", "7", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            df = fn(spark, sf_dir)
            cols = sorted(df.columns)
            results.append(sorted(tuple(r[c] for c in cols) for r in df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    # bit-identical, not approximately equal: floats compare with ==
    assert results[0] == results[1] == results[2]
