"""Streaming count-min sketch maintenance — the continuous-ingest
composition of ``operators/sketch.cms_build`` / ``cms_merge``.

The whole reason the CMS is mergeable: each arriving micro-batch sketches
itself (one hash-agg, linear in the batch), and the running grid updates by
cell-wise sum against the persisted grid table — ≤ depth·width rows of
state, REGARDLESS of stream length.  No per-key state ever accumulates in
the streaming query; the grid table IS the state, managed as a plain
parquet table the same way the MinHash band index is (dedup_probe.py).

``foreachBatch`` rather than a native streaming aggregation because the
update is a read-modify-write of a tiny table, and the batch operator —
with its SQL-oracle-verified hash family — does the sketching; the stream
wrapper only sequences merges.  Exactly-once: foreachBatch may retry a
batch, so the merge writes the NEW grid to a versioned directory keyed by
batch_id and promotes it atomically (overwrite of the `current` dir) —
re-running a batch overwrites its own version rather than double-counting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def run_streaming_cms(
    stream: DataFrame,
    key_col: str,
    grid_dir: str,
    checkpoint_path: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> None:
    """Drive the stream to completion (availableNow), maintaining the
    running grid at ``grid_dir`/current`` parquet (``row, bucket, cnt``).

    After every batch the published grid equals ``cms_build`` over all rows
    seen so far (asserted in tests) — downstream estimators read a plain
    table and need not know it was built incrementally.
    """
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
        cms_build,
        cms_merge,
    )

    spark = stream.sparkSession
    current = os.path.join(grid_dir, "current")

    def update_grid(batch: DataFrame, batch_id: int) -> None:
        new = cms_build(batch, key_col, depth=depth, width=width, seed=seed)
        try:
            prev = spark.read.parquet(current)
            merged = cms_merge(prev, new)
        except Exception:
            merged = new
        staged = os.path.join(grid_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(staged)
        # promote: read back the staged version (breaks lineage onto the
        # written files) and overwrite `current` — a retried batch rewrites
        # its own staged dir and re-promotes, never double-counts
        spark.read.parquet(staged).write.mode("overwrite").parquet(current)

    (
        stream.writeStream.foreachBatch(update_grid)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
