"""Watermarked event-time windowed aggregation (append mode).

The complete-mode rollup (rollup.py) keeps all state forever — right for
bounded catch-up runs.  An unbounded deployment bounds state with a
watermark: windows finalize (and emit, in append mode) once the watermark —
max observed event time minus the allowed lateness — passes their end, and
events arriving later than the watermark are dropped.  This module is that
deployment shape; tests drive it with controlled micro-batches and assert
both the finalize-on-watermark and the late-drop behaviors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import dsum


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    allowed_lateness: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark.

    ``events`` must carry ``ts_utc`` (timestamp) — use
    ``catalog.events_with_time`` for the batch-equivalent column.  Output:
    one row per (window, event_type) with count + exact sum, emitted in
    append mode only once the watermark passes the window end.
    """
    return (
        events.withWatermark("ts_utc", allowed_lateness)
        .groupBy(F.window("ts_utc", window_duration), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
