"""Structured Streaming operators: the hourly rollup (readStream → stateful
agg → availableNow, bit-identical to batch) and gap sessionization as a
custom stateful operator (applyInPandasWithState)."""

from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.rollup import (
    hourly_rollup_plan,
    run_streaming_hourly_rollup,
    stream_events,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_batch_oracle_sql,
    sessionize_stream,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.windowed import (
    windowed_event_counts,
)

__all__ = [
    "hourly_rollup_plan",
    "run_streaming_hourly_rollup",
    "sessionize_batch",
    "sessionize_batch_oracle_sql",
    "sessionize_stream",
    "stream_events",
    "windowed_event_counts",
]
