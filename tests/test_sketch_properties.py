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


_ts = st.integers(min_value=0, max_value=50)
_series = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), _ts), min_size=1, max_size=25
)


@given(series=_series, bucket=st.sampled_from([1, 3, 7]))
@settings(**_SETTINGS)
def test_gap_fill_locf_matches_sequential_reference(spark, series, bucket):
    """gap_fill_locf == the obvious per-key sequential spine+carry loop on
    arbitrary (key, ts) streams (value = ts as double, id = index)."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
        gap_fill_locf,
    )

    rows = [(k, i, t, float(t)) for i, (k, t) in enumerate(series)]
    df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
    got = {
        (r["key"], r["bucket"]): (r["v"], r["filled"], r["n_events"])
        for r in gap_fill_locf(df, "k", "t", "eid", "v", bucket_us=bucket).collect()
    }

    # sequential reference
    want = {}
    bykey: dict = {}
    for k, i, t, v in rows:
        bykey.setdefault(k, []).append((t, i, v))
    for k, obs in bykey.items():
        buckets: dict = {}
        for t, i, v in obs:
            b = t // bucket
            cur = buckets.get(b)
            # close = value of the (t, i)-max observation in the bucket
            if cur is None or (t, i) > cur[0]:
                buckets[b] = ((t, i), v, (cur[2] + 1 if cur else 1))
            else:
                buckets[b] = (cur[0], cur[1], cur[2] + 1)
        lo, hi = min(buckets), max(buckets)
        carry = None
        for b in range(lo, hi + 1):
            if b in buckets:
                carry = buckets[b][1]
                want[(k, b)] = (carry, False, buckets[b][2])
            else:
                want[(k, b)] = (carry, True, 0)
    assert got == want
