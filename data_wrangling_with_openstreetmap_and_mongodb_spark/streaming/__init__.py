"""Structured Streaming operators: the hourly rollup (readStream → stateful
agg → availableNow, bit-identical to batch), gap sessionization as a custom
stateful operator (applyInPandasWithState), watermarked event-time windows,
watermark-bounded streaming exact dedup, stream-stream interval join,
streaming OHLC bars, the streaming MinHash-index dedup probe, and streaming
count-min sketch maintenance (foreachBatch cell-wise merge), streaming
as-of enrichment against an SCD2 dimension (foreachBatch interval join),
streaming NB classifier scoring (broadcast model per micro-batch), and
streaming multimodal decode (stateless Arrow-batched codec maps applied to
a readStream unchanged — the media-ingest landing-zone shape, r13)."""

from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.asof_enrich import (
    asof_enrich_against_scd2,
    run_streaming_asof_enrich,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.cms_stream import (
    run_streaming_cms,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.dedup_probe import (
    run_streaming_dedup_probe,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.dedup_stream import (
    dedup_stream,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.join import (
    stream_stream_interval_join,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.media_decode import (
    run_streaming_media_decode,
    streaming_media_features,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.nb_stream import (
    run_streaming_nb_scoring,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.ohlc import (
    streaming_ohlc,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.rollup import (
    hourly_rollup_plan,
    run_streaming_hourly_rollup,
    stream_events,
    stream_table,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_batch_oracle_sql,
    sessionize_stream,
    sessionize_stream_flushing,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.windowed import (
    windowed_event_counts,
)

__all__ = [
    "asof_enrich_against_scd2",
    "dedup_stream",
    "run_streaming_asof_enrich",
    "run_streaming_media_decode",
    "run_streaming_nb_scoring",
    "streaming_media_features",
    "run_streaming_cms",
    "run_streaming_dedup_probe",
    "stream_stream_interval_join",
    "streaming_ohlc",
    "hourly_rollup_plan",
    "run_streaming_hourly_rollup",
    "sessionize_batch",
    "sessionize_batch_oracle_sql",
    "sessionize_stream",
    "sessionize_stream_flushing",
    "stream_events",
    "stream_table",
    "windowed_event_counts",
]
