"""Hypothesis property tests for the sketch tier: the count-min and Bloom
guarantees on arbitrary inputs, checked against driver-side references.
Small deterministic profiles (a Spark job per example); the properties carry
the value."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
    bloom_build,
    bloom_might_contain,
    cms_build,
    cms_estimate,
    cms_merge,
)

import pyspark.sql.functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_key = st.sampled_from([f"k{i}" for i in range(20)])
_corpus = st.lists(_key, min_size=1, max_size=60)


@given(occ=_corpus, width=st.sampled_from([4, 16, 256]))
@settings(**_SETTINGS)
def test_cms_never_undercounts_any_key(spark, occ, width):
    """est ≥ exact for EVERY key at ANY width — the one-sided CMS bound."""
    df = spark.createDataFrame([(k,) for k in occ], "k string")
    grid = cms_build(df, "k", depth=3, width=width)
    keys = df.distinct()
    est = {
        r["key"]: r["est_cnt"]
        for r in cms_estimate(grid, keys, "k", depth=3, width=width).collect()
    }
    exact = Counter(occ)
    assert all(est[k] >= c for k, c in exact.items()), (est, exact)
    # and the total in every grid row is exactly the occurrence count
    per_row = {
        r["row"]: r["tot"]
        for r in grid.groupBy("row").agg(F.sum("cnt").alias("tot")).collect()
    }
    assert all(t == len(occ) for t in per_row.values())


@given(occ_a=_corpus, occ_b=_corpus)
@settings(**_SETTINGS)
def test_cms_merge_is_exactly_the_union_sketch(spark, occ_a, occ_b):
    """Sharded build + merge == whole-corpus build, cell for cell."""
    a = spark.createDataFrame([(k,) for k in occ_a], "k string")
    b = spark.createDataFrame([(k,) for k in occ_b], "k string")
    merged = sorted(
        map(
            tuple,
            cms_merge(
                cms_build(a, "k", depth=3, width=32),
                cms_build(b, "k", depth=3, width=32),
            ).collect(),
        )
    )
    whole = sorted(
        map(tuple, cms_build(a.unionByName(b), "k", depth=3, width=32).collect())
    )
    assert merged == whole


@given(
    members=st.lists(_key, min_size=1, max_size=15, unique=True),
    n_bits=st.sampled_from([64, 512, 4096]),
)
@settings(**_SETTINGS)
def test_bloom_admits_every_member(spark, members, n_bits):
    """No false negatives at any width — keys inserted always pass."""
    df = spark.createDataFrame([(k,) for k in members], "k string")
    words = bloom_build(df, "k", n_bits=n_bits, n_hashes=4)
    passed = df.filter(
        bloom_might_contain(F.col("k"), words, n_bits=n_bits, n_hashes=4)
    ).count()
    assert passed == len(members)
