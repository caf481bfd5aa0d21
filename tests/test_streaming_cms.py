"""Streaming CMS maintenance: the incrementally-merged grid must equal the
whole-corpus batch sketch cell-for-cell after the stream drains."""

from __future__ import annotations

import os

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
    cms_build,
    cms_estimate,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.cms_stream import (
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
