"""Gap-based sessionization: batch (window functions) and streaming
(custom stateful operator via ``applyInPandasWithState``).

The batch plan is two window passes over one ``user_id`` shuffle: a ``lag``
comparison marks session starts, a running sum numbers sessions, then one
aggregation collapses them — the canonical sessionization idiom, fully
expressible in SQL (and therefore oracle-checkable).

The streaming operator keeps (start, last, count) state per user and emits a
session when a later event for the same user arrives past the gap.  With no
timeout configured, emission depends only on the event sequence — never on
micro-batch boundaries or processing-time — so the streaming output is
deterministic: exactly the batch sessions minus each user's final (still
open) session.  An unbounded deployment would add an event-time timeout +
watermark to flush idle sessions; that changes liveness, not session
boundaries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

SESSION_SCHEMA = (
    "user_id long, session_seq int, start_ns long, end_ns long, n_events long"
)
_STREAM_OUT_SCHEMA = "user_id long, start_ns long, end_ns long, n_events long"
_STATE_SCHEMA = "start_ns long, last_ns long, cnt long"


def sessionize_batch(events: DataFrame, gap_ns: int) -> DataFrame:
    """Batch gap sessionization → one row per (user, session).

    Output: ``(user_id, session_seq, start_ns, end_ns, n_events)`` with
    ``session_seq`` numbering a user's sessions in time order from 1.
    """
    by_time = Window.partitionBy("user_id").orderBy("ts")
    new_session = (
        F.when(
            F.lag("ts").over(by_time).isNull()
            | ((F.col("ts") - F.lag("ts").over(by_time)) > gap_ns),
            1,
        )
        .otherwise(0)
        .alias("is_start")
    )
    numbered = events.select("user_id", "ts", new_session).withColumn(
        "session_seq",
        F.sum("is_start").over(by_time.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", F.col("session_seq").cast("int").alias("session_seq")).agg(
        F.min("ts").alias("start_ns"),
        F.max("ts").alias("end_ns"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_batch_oracle_sql(gap: int, ts_expr: str = "epoch_us(ts)") -> str:
    """DuckDB-equivalent of :func:`sessionize_batch` on the events view.

    ``ts_expr`` must yield the same integer time unit the Spark side feeds
    to :func:`sessionize_batch` (default microseconds: DuckDB truncates the
    parquet nano-timestamps to micros, so cross-engine comparison must too).
    """
    return f"""
        WITH marked AS (
            SELECT user_id, {ts_expr} AS ts_i,
                   CASE WHEN lag({ts_expr}) OVER w IS NULL
                             OR {ts_expr} - lag({ts_expr}) OVER w > {gap}
                        THEN 1 ELSE 0 END AS is_start
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY {ts_expr})
        ), numbered AS (
            SELECT user_id, ts_i,
                   CAST(SUM(is_start) OVER (
                       PARTITION BY user_id ORDER BY ts_i
                       ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq
            FROM marked
        )
        SELECT user_id, session_seq,
               MIN(ts_i) AS start_ns, MAX(ts_i) AS end_ns,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_seq
    """


def sessionize_stream(events: DataFrame, gap_ns: int) -> DataFrame:
    """Streaming sessionization as a custom stateful operator.

    Per-user state is ``(start_ns, last_ns, cnt)``; each batch's events merge
    in event-time order, emitting a closed session whenever the gap is
    exceeded.  Arrow-batched: the Python hop processes whole groups, not
    rows.

    Ordering contract: events for a user must not arrive in a *later* batch
    with an *earlier* timestamp than one already processed (the usual
    guarantee of a user-keyed, time-ordered source such as a Kafka partition;
    within one batch any order is fine — the operator sorts).  Handling
    arbitrarily late data needs a watermark + buffer-and-reorder state, which
    trades memory for reordering tolerance without changing session
    boundaries.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf["ts"])
        ts_all.sort()
        if state.exists:
            start_ns, last_ns, cnt = state.get
        else:
            start_ns = last_ns = cnt = None
        closed = []
        for t in ts_all:
            if start_ns is None:
                start_ns, last_ns, cnt = t, t, 1
            elif t - last_ns > gap_ns:
                closed.append((user_id, start_ns, last_ns, cnt))
                start_ns, last_ns, cnt = t, t, 1
            else:
                last_ns, cnt = t, cnt + 1
        state.update((start_ns, last_ns, cnt))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "start_ns", "end_ns", "n_events"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_STREAM_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream_flushing(
    events: DataFrame, gap_ns: int, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """:func:`sessionize_stream` + event-time timeout: idle sessions flush.

    The no-timeout operator only emits a user's session when a *later* event
    for the same user arrives — a user who stops producing events holds an
    open session (and its state) forever.  Here the stream carries a
    watermark (``ts`` nanos → a real timestamp column) and each group arms an
    event-time timeout at ``last_event + gap``: once the watermark — driven
    by the whole stream, not that user — passes it, the open session emits
    and its state is freed.  Session *boundaries* are identical to the batch
    operator's; the timeout changes liveness (when open sessions surface)
    and bounds state size, which is what an unbounded 100 TB/day deployment
    needs.

    ``watermark_delay`` is the usual lateness allowance: larger values delay
    flushes but tolerate more cross-user disorder.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    with_time = events.withColumn(
        "__event_time", F.timestamp_micros(F.expr("ts div 1000"))
    ).withWatermark("__event_time", watermark_delay)

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_ns, last_ns, cnt = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start_ns, last_ns, cnt)],
                columns=["user_id", "start_ns", "end_ns", "n_events"],
            )
            return
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf["ts"])
        ts_all.sort()
        if state.exists:
            start_ns, last_ns, cnt = state.get
        else:
            start_ns = last_ns = cnt = None
        closed = []
        for t in ts_all:
            if start_ns is None:
                start_ns, last_ns, cnt = t, t, 1
            elif t - last_ns > gap_ns:
                closed.append((user_id, start_ns, last_ns, cnt))
                start_ns, last_ns, cnt = t, t, 1
            else:
                last_ns, cnt = t, cnt + 1
        state.update((start_ns, last_ns, cnt))
        # flush once the stream-wide watermark passes this session's gap
        # horizon; must arm strictly past the current watermark
        flush_ms = (last_ns + gap_ns) // 1_000_000
        state.setTimeoutTimestamp(max(flush_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "start_ns", "end_ns", "n_events"]
            )

    return with_time.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_STREAM_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
