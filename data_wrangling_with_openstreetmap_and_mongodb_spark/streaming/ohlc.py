"""Streaming OHLC bars: the batch resampler (operators/events.py::
ohlc_resample) as a watermarked event-time windowed aggregation.

Same bar semantics — open/close anchored by the (event-time, id) total
order, order-independent high/low, quantized volume sum — emitted in append
mode once the watermark passes each window's end, so bars are final when
they appear (the property a downstream chart or feature store needs) and
state is bounded by lateness, not stream length.  ``min_by``/``max_by`` are
declarative aggregates, so they run inside the streaming state store like
any count/sum — no flatMapGroupsWithState needed for OHLC.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import dsum
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
    _order_key,
)


def streaming_ohlc(
    events: DataFrame,
    window_duration: str = "15 minutes",
    allowed_lateness: str | None = "1 hour",
) -> DataFrame:
    """Watermarked OHLC bars over an event stream.

    ``events`` must carry ``ts_utc`` (timestamp), ``event_id`` (long), and
    ``value`` (double).  Output: one row per finalized window with
    ``(window_start, window_end, n_events, open_v, high_v, low_v, close_v,
    volume)`` — identical values to the batch resampler over the same data
    (asserted by the stream/batch equivalence test).

    ``allowed_lateness=None`` omits the watermark — the right shape for a
    COMPLETE-mode catch-up run (complete mode retains all state, so a
    watermark would only risk dropping rows that files delivered out of
    event-time order between micro-batches).
    """
    key = _order_key(F.unix_micros(F.col("ts_utc")), F.col("event_id"))
    src = (
        events.withWatermark("ts_utc", allowed_lateness)
        if allowed_lateness is not None
        else events
    )
    return (
        src.select("ts_utc", F.col("value").alias("v"), key.alias("k"))
        .groupBy(F.window("ts_utc", window_duration))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("v", "k").alias("open_v"),
            F.max("v").alias("high_v"),
            F.min("v").alias("low_v"),
            F.max_by("v", "k").alias("close_v"),
            dsum("v").alias("volume"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "open_v",
            "high_v",
            "low_v",
            "close_v",
            "volume",
        )
    )


_ohlc_sink_counter = itertools.count()


def run_streaming_ohlc(
    spark,
    sf_dir: str,
    bucket_us: int = 15 * 60 * 1_000_000,
    state_partitions: int = 8,
) -> DataFrame:
    """Drive the streaming OHLC bars to completion over the events table
    (availableNow trigger, complete mode) and return the final bars keyed
    by the batch resampler's integer ``bucket`` — value-identical to
    ``operators/events.py::ohlc_resample`` over the same parquet (the
    driver row's oracle IS the batch SQL).

    Complete mode + no watermark: a bounded catch-up run wants every bar,
    including the trailing ones a watermark would still hold open at
    end-of-stream; min_by/max_by/quantized-sum state is micro-batch-order
    independent, so the bars are bit-identical to batch no matter how the
    file source splits the replay.  ``state_partitions`` sizes the state
    store like the rollup runner (bar-count cardinality, not the batch
    shuffle default).
    """
    from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import ts_micros
    from data_wrangling_with_openstreetmap_and_mongodb_spark.streaming.rollup import (
        stream_events,
    )

    if bucket_us % 1_000_000:
        raise ValueError("bucket_us must be whole seconds for F.window")
    name = f"ohlc_sink_{next(_ohlc_sink_counter)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        ev = stream_events(spark, sf_dir)
        # ts_micros handles BOTH testdata ts encodings (bigint nanos / native
        # timestamp); a bare cast would read bigint nanos as SECONDS
        ev = ev.select(
            F.timestamp_micros(ts_micros(ev)).alias("ts_utc"),
            "event_id",
            "value",
        )
        bars = streaming_ohlc(
            ev, f"{bucket_us // 1_000_000} seconds", allowed_lateness=None
        )
        q = (
            bars.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # window starts are epoch-aligned (F.window anchors at the epoch), so
    # bucket = unix_micros(window_start) / bucket_us reproduces the batch
    # resampler's floor(ts/bucket) key exactly
    return spark.table(name).select(
        (F.unix_micros(F.col("window_start")) / F.lit(bucket_us))
        .cast("long")
        .alias("bucket"),
        "n_events",
        "open_v",
        "high_v",
        "low_v",
        "close_v",
        "volume",
    )

