"""Streaming CMS maintenance: the incrementally-merged grid must equal the
whole-corpus batch sketch cell-for-cell after the stream drains."""

from __future__ import annotations

import os

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
    cms_build,
    cms_estimate,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.cms_stream import (
    apply_cms_batch,
    run_streaming_cms,
)


def _rows():
    # skewed token stream across 3 micro-batches
    out = []
    for i in range(30):
        out.append((i, f"k{i % 7}"))
    out += [(100 + i, "hot") for i in range(12)]
    return out


def test_streaming_grid_equals_batch_sketch(spark, tmp_path):
    rows = _rows()
    src = tmp_path / "arrivals"
    src.mkdir()
    for i in range(3):
        part = rows[i * 14 : (i + 1) * 14]
        spark.createDataFrame(part, "id long, k string").toPandas().to_parquet(
            src / f"b{i}.parquet"
        )
        os.utime(src / f"b{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("id long, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    grid_dir = tmp_path / "grid"
    run_streaming_cms(
        stream, "k", str(grid_dir), str(tmp_path / "ckpt"), depth=3, width=32
    )

    got = sorted(
        map(tuple, spark.read.parquet(str(grid_dir / "current")).collect())
    )
    whole = spark.createDataFrame(rows, "id long, k string")
    want = sorted(map(tuple, cms_build(whole, "k", depth=3, width=32).collect()))
    assert got == want

    # and the incrementally-built grid estimates like the batch one
    keys = whole.select("k").distinct()
    est = {
        r["key"]: r["est_cnt"]
        for r in cms_estimate(
            spark.read.parquet(str(grid_dir / "current")),
            keys,
            "k",
            depth=3,
            width=32,
        ).collect()
    }
    assert est["hot"] >= 12
    from collections import Counter

    exact = Counter(k for _, k in rows)
    assert all(est[k] >= c for k, c in exact.items())


def test_batch_replay_never_double_counts(spark, tmp_path):
    """Exactly-once under foreachBatch retry: replaying an already-applied
    batch (the failure-between-promote-and-checkpoint-commit case) must
    leave the grid identical — re-promote only, no re-merge."""
    rows = _rows()
    b0 = spark.createDataFrame(rows[:14], "id long, k string")
    b1 = spark.createDataFrame(rows[14:28], "id long, k string")
    b2 = spark.createDataFrame(rows[28:], "id long, k string")
    grid_dir = str(tmp_path / "grid")

    apply_cms_batch(b0, 0, "k", grid_dir, depth=3, width=32)
    apply_cms_batch(b1, 1, "k", grid_dir, depth=3, width=32)
    # torn promote: batch 1 replays after its grid was already applied
    apply_cms_batch(b1, 1, "k", grid_dir, depth=3, width=32)
    # ...and an even older replay arrives late
    apply_cms_batch(b0, 0, "k", grid_dir, depth=3, width=32)
    apply_cms_batch(b2, 2, "k", grid_dir, depth=3, width=32)

    got = sorted(
        map(tuple, spark.read.parquet(f"{grid_dir}/current").collect())
    )
    whole = spark.createDataFrame(rows, "id long, k string")
    want = sorted(map(tuple, cms_build(whole, "k", depth=3, width=32).collect()))
    assert got == want
