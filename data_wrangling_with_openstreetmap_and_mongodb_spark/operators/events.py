"""Event-sequence analytics: ordered funnels and time-bucket (OHLC)
resampling.

Both are pure DataFrame aggregation pipelines over an event stream:

- :func:`funnel_stages` — the classic product-analytics funnel: how many
  users performed stage 1, then stage 2 strictly after it, then stage 3
  strictly after that, each stage anchored at the EARLIEST qualifying
  occurrence (the standard strict-order semantics).  One filtered
  aggregation + one equi-join per stage: shuffles are bounded by the number
  of stages (a constant), never by the funnel depth of any one user, and
  each join key is the user id — the natural pre-partitioning key of an
  event store, so at scale these joins co-locate for free.
- :func:`ohlc_resample` — downsample to fixed time buckets with
  open/high/low/close/volume per bucket: one hash-aggregate keyed by the
  integer bucket.  Open/close use ``min_by``/``max_by`` on a zero-padded
  (time, id) string key, which gives deterministic first/last semantics
  under ties AND is reproducible in DuckDB (``arg_min``/``arg_max`` on the
  same key) — no window sort, no shuffle beyond the one aggregation.

Engine-parity notes: bucket indices and stage timestamps are integer
microseconds (exact); the volume sum uses the quantized order-independent
``dsum`` so float totals hash-match at any parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import dsum


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Strict-order funnel counts: ``(stage, stage_name, n_users)`` — one
    row per stage, ``n_users`` = users whose earliest qualifying event for
    every prior stage precedes (strictly) an event of this stage.

    ``ts_col`` must be an integer/long timestamp column (e.g. epoch micros);
    stage anchoring is min-based, so results are deterministic regardless of
    event-arrival or partition order.
    """
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        ev = df.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("ts")
        )
        if prev is None:
            cur = ev.groupBy("user").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(prev.select("user", F.col("t").alias("t_prev")), "user")
                .filter(F.col("ts") > F.col("t_prev"))
                .groupBy("user")
                .agg(F.min("ts").alias("t"))
            )
        reached.append(cur)
        prev = cur
    counts = None
    for i, (stage, cur) in enumerate(zip(stages, reached)):
        row = cur.agg(
            F.lit(i + 1).alias("stage"),
            F.lit(stage).alias("stage_name"),
            F.count(F.lit(1)).alias("n_users"),
        )
        counts = row if counts is None else counts.unionAll(row)
    return counts


def funnel_stages_sql(
    table: str, user_expr: str, ts_expr: str, type_expr: str, stages: list[str]
) -> str:
    """DuckDB oracle reproducing :func:`funnel_stages` value-for-value."""
    ctes = []
    selects = []
    for i, stage in enumerate(stages):
        name = f"s{i + 1}"
        if i == 0:
            ctes.append(
                f"{name} AS (SELECT {user_expr} AS u, MIN({ts_expr}) AS t"
                f" FROM {table} WHERE {type_expr} = '{stage}' GROUP BY u)"
            )
        else:
            prev = f"s{i}"
            ctes.append(
                f"{name} AS (SELECT e.{user_expr} AS u, MIN({ts_expr}) AS t"
                f" FROM {table} e JOIN {prev} p ON e.{user_expr} = p.u"
                f" WHERE e.{type_expr} = '{stage}' AND {ts_expr} > p.t"
                f" GROUP BY e.{user_expr})"
            )
        selects.append(
            f"SELECT {i + 1} AS stage, '{stage}' AS stage_name,"
            f" COUNT(*) AS n_users FROM s{i + 1}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _order_key(ts_col: Column, id_col: Column) -> Column:
    """Zero-padded (time, id) string — a total order both engines sort
    identically (non-negative integer inputs)."""
    return F.concat(
        F.lpad(ts_col.cast("string"), 20, "0"), F.lpad(id_col.cast("string"), 12, "0")
    )


def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """Fixed-bucket OHLC downsample: ``(bucket, n_events, open_v, high_v,
    low_v, close_v, volume)``; ``bucket = ts // bucket_us`` (integer
    microseconds), open/close anchored by the (time, id) total order.

    One hash-aggregate; min/max are order-independent, open/close are
    ``min_by``/``max_by`` over the deterministic key, volume is the
    quantized order-independent sum.
    """
    key = _order_key(F.col(ts_col), F.col(id_col))
    return (
        df.select(
            F.floor(F.col(ts_col) / F.lit(bucket_us)).cast("long").alias("bucket"),
            F.col(value_col).alias("v"),
            key.alias("k"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("v", "k").alias("open_v"),
            F.max("v").alias("high_v"),
            F.min("v").alias("low_v"),
            F.max_by("v", "k").alias("close_v"),
            dsum("v").alias("volume"),
        )
    )


def ohlc_resample_sql(
    table: str, ts_expr: str, id_expr: str, value_expr: str, bucket_us: int
) -> str:
    """DuckDB oracle reproducing :func:`ohlc_resample` value-for-value."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
        dsum_sql,
    )

    key = (
        f"lpad(CAST({ts_expr} AS VARCHAR), 20, '0') ||"
        f" lpad(CAST({id_expr} AS VARCHAR), 12, '0')"
    )
    return f"""
        SELECT CAST(FLOOR({ts_expr} / {bucket_us}) AS BIGINT) AS bucket,
               COUNT(*) AS n_events,
               arg_min({value_expr}, {key}) AS open_v,
               MAX({value_expr}) AS high_v,
               MIN({value_expr}) AS low_v,
               arg_max({value_expr}, {key}) AS close_v,
               {dsum_sql(value_expr)} AS volume
        FROM {table}
        GROUP BY bucket
    """


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_us: int,
) -> DataFrame:
    """Cohort retention triangle: ``(cohort, offset, n_users)`` — users are
    cohorted by the period of their FIRST event; ``n_users`` counts distinct
    users of cohort ``c`` active again ``offset`` periods later (offset 0 is
    the cohort size itself).

    Two hash-aggregates and one user-keyed equi-join: first-seen period per
    user (min over an integer bucket), then distinct (cohort, offset) pairs
    from the user's activity periods.  ``ts_col`` is integer microseconds;
    every derived value is integer-exact, so the result hash-matches any
    engine.  At scale both aggregations key on the user id / cohort pair —
    the same co-location story as :func:`funnel_stages`.
    """
    period = F.floor(F.col(ts_col) / F.lit(period_us)).cast("long")
    activity = df.select(
        F.col(user_col).alias("user"), period.alias("p")
    ).distinct()
    first_seen = activity.groupBy("user").agg(F.min("p").alias("cohort"))
    return (
        activity.join(first_seen, "user")
        .select("user", "cohort", (F.col("p") - F.col("cohort")).alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.count_distinct("user").alias("n_users"))
    )


def retention_cohorts_sql(
    table: str, user_expr: str, ts_expr: str, period_us: int
) -> str:
    """DuckDB oracle reproducing :func:`retention_cohorts` value-for-value."""
    return f"""
        WITH activity AS (
            SELECT DISTINCT {user_expr} AS u,
                   CAST(FLOOR({ts_expr} / {period_us}) AS BIGINT) AS p
            FROM {table}
        ),
        first_seen AS (SELECT u, MIN(p) AS cohort FROM activity GROUP BY u)
        SELECT cohort, p - cohort AS "offset", COUNT(DISTINCT u) AS n_users
        FROM activity JOIN first_seen USING (u)
        GROUP BY cohort, "offset"
    """


def rolling_avg(
    df: DataFrame,
    ts_us_col: Column,
    key_col: str,
    value_col: str,
    id_col: str,
    window_us: int = 3_600_000_000,
) -> DataFrame:
    """Trailing time-RANGE moving average per key: ``(id, key, ts_us,
    avg_trailing)`` — each event's value averaged with every same-key event
    in the preceding ``window_us`` microseconds (inclusive of peers at the
    same instant, per the SQL-standard RANGE frame, so tie order can't
    change the result).

    The frame is a true time RANGE, not N-rows: irregular event spacing
    means row frames measure the wrong thing.  The average uses the
    quantize-to-int exact accumulation of functions/detagg inside the
    window, so the trailing mean is order-independent and engine-identical.
    One shuffle (by key) + one ordered frame scan per partition; at scale
    the sort is per key-partition and AQE handles hot keys.
    """
    from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
        _quantized,
    )

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        ts_us_col.alias("ts_us"),
        F.col(value_col).alias("__v"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("ts_us"))
        .rangeBetween(-window_us, 0)
    )
    avg = (
        F.sum(_quantized(F.col("__v"))).over(w).cast("double")
        / F.lit(1e6)
        / F.count("__v").over(w)
    )
    return base.select("id", "key", "ts_us", avg.alias("avg_trailing"))


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """Dense time-spine resample with forward fill (LOCF): ``(key, bucket,
    v, filled, n_events)`` — one row per key per ``bucket_us`` interval from
    the key's first to last observed bucket, empty buckets carrying the
    last observed bucket's CLOSING value and ``filled = true``.

    The timeseries "last observation carried forward" operator (TimescaleDB
    ``locf``, Pandas ``ffill``): downstream window/feature code gets a
    gapless per-key series without learning each source's cadence.  The
    bucket close anchors on the same deterministic (time, id) total order
    as :func:`ohlc_resample`, so the fill is engine-reproducible.

    Plan shape: one hash-agg to per-bucket closes, a per-key min/max +
    ``sequence`` explode for the spine (never a cross join against a global
    calendar — each key materializes only ITS OWN range), a left equi-join,
    and one forward-fill window; the spine aggregation, join, and window
    all share the key partitioning, so the whole thing is two shuffles.
    Spine size is range/bucket_us rows per key — pick ``bucket_us`` so a
    key's span stays in task-sized territory (a year of 15-min buckets is
    ~35k rows; sub-second buckets over years belong in coarser tiers).
    """
    key = _order_key(F.col(ts_col), F.col(id_col))
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.col(ts_col) / F.lit(bucket_us)).cast("long").alias("bucket"),
            F.col(value_col).alias("v"),
            key.alias("k"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.max_by("v", "k").alias("close_v"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    spine = (
        obs.groupBy("key")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select("key", F.explode(F.sequence("mn", "mx")).alias("bucket"))
    )
    joined = spine.join(obs, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "key",
        "bucket",
        F.last("close_v", ignorenulls=True).over(w).alias("v"),
        F.col("close_v").isNull().alias("filled"),
        F.coalesce("n_obs", F.lit(0)).alias("n_events"),
    )


def gap_fill_locf_sql(
    table: str,
    key_expr: str,
    ts_expr: str,
    id_expr: str,
    value_expr: str,
    bucket_us: int,
) -> str:
    """DuckDB oracle reproducing :func:`gap_fill_locf` row-for-row."""
    key = (
        f"lpad(CAST({ts_expr} AS VARCHAR), 20, '0') ||"
        f" lpad(CAST({id_expr} AS VARCHAR), 12, '0')"
    )
    return f"""
        WITH obs AS (
            SELECT {key_expr} AS key,
                   CAST(FLOOR({ts_expr} / {bucket_us}) AS BIGINT) AS bucket,
                   arg_max({value_expr}, {key}) AS close_v,
                   COUNT(*) AS n_obs
            FROM {table} GROUP BY 1, 2
        ),
        ext AS (SELECT key, min(bucket) AS mn, max(bucket) AS mx
                FROM obs GROUP BY key),
        spine AS (SELECT key, unnest(range(mn, mx + 1)) AS bucket FROM ext),
        j AS (SELECT s.key, s.bucket, o.close_v, coalesce(o.n_obs, 0) AS n_obs
              FROM spine s LEFT JOIN obs o USING (key, bucket))
        SELECT key, bucket,
               last_value(close_v IGNORE NULLS) OVER (
                   PARTITION BY key ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
               close_v IS NULL AS filled,
               CAST(n_obs AS BIGINT) AS n_events
        FROM j
    """


def gap_fill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """:func:`gap_fill_locf`'s linear-interpolation sibling: gap buckets take
    the straight line between the surrounding observed closes instead of a
    flat carry — ``(key, bucket, v, filled, n_events)``.

    ``v`` for a gap at bucket t between observations (t₀, v₀) and (t₁, v₁)
    is ``v₀ + (v₁ − v₀) · (t − t₀)/(t₁ − t₀)``, quantized to 1e-6 like every
    float the engine compares across engines.  Interior gaps interpolate;
    there are no edge gaps by construction (the spine spans first..last
    observed bucket).  Observed buckets keep their exact close.

    Same two-shuffle shape as LOCF plus one extra pair of IGNORE NULLS
    windows (previous/next observation), all sharing the key partitioning.
    """
    from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import quantize6

    key = _order_key(F.col(ts_col), F.col(id_col))
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.col(ts_col) / F.lit(bucket_us)).cast("long").alias("bucket"),
            F.col(value_col).alias("v"),
            key.alias("k"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.max_by("v", "k").alias("close_v"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    spine = (
        obs.groupBy("key")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select("key", F.explode(F.sequence("mn", "mx")).alias("bucket"))
    )
    joined = spine.join(obs, ["key", "bucket"], "left")
    wp = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("close_v").isNotNull(), F.col("bucket"))
    prev_v = F.last("close_v", ignorenulls=True).over(wp)
    prev_t = F.last(obs_bucket, ignorenulls=True).over(wp)
    next_v = F.first("close_v", ignorenulls=True).over(wn)
    next_t = F.first(obs_bucket, ignorenulls=True).over(wn)
    interp = quantize6(
        prev_v
        + (next_v - prev_v)
        * ((F.col("bucket") - prev_t) / (next_t - prev_t))
    )
    return joined.select(
        "key",
        "bucket",
        F.when(F.col("close_v").isNotNull(), F.col("close_v"))
        .otherwise(interp)
        .alias("v"),
        F.col("close_v").isNull().alias("filled"),
        F.coalesce("n_obs", F.lit(0)).alias("n_events"),
    )


def gap_fill_interpolate_sql(
    table: str,
    key_expr: str,
    ts_expr: str,
    id_expr: str,
    value_expr: str,
    bucket_us: int,
) -> str:
    """DuckDB oracle reproducing :func:`gap_fill_interpolate` row-for-row."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
        quantize6_sql,
    )

    key = (
        f"lpad(CAST({ts_expr} AS VARCHAR), 20, '0') ||"
        f" lpad(CAST({id_expr} AS VARCHAR), 12, '0')"
    )
    interp = quantize6_sql(
        "prev_v + (next_v - prev_v)"
        " * ((bucket - prev_t) / CAST(next_t - prev_t AS DOUBLE))"
    )
    return f"""
        WITH obs AS (
            SELECT {key_expr} AS key,
                   CAST(FLOOR({ts_expr} / {bucket_us}) AS BIGINT) AS bucket,
                   arg_max({value_expr}, {key}) AS close_v,
                   COUNT(*) AS n_obs
            FROM {table} GROUP BY 1, 2
        ),
        ext AS (SELECT key, min(bucket) AS mn, max(bucket) AS mx
                FROM obs GROUP BY key),
        spine AS (SELECT key, unnest(range(mn, mx + 1)) AS bucket FROM ext),
        j AS (SELECT s.key, s.bucket, o.close_v, coalesce(o.n_obs, 0) AS n_obs
              FROM spine s LEFT JOIN obs o USING (key, bucket)),
        w AS (SELECT key, bucket, close_v, n_obs,
                     last_value(close_v IGNORE NULLS) OVER (
                         PARTITION BY key ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
                     last_value(CASE WHEN close_v IS NOT NULL THEN bucket END
                                IGNORE NULLS) OVER (
                         PARTITION BY key ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
                     first_value(close_v IGNORE NULLS) OVER (
                         PARTITION BY key ORDER BY bucket
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
                     first_value(CASE WHEN close_v IS NOT NULL THEN bucket END
                                 IGNORE NULLS) OVER (
                         PARTITION BY key ORDER BY bucket
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
              FROM j)
        SELECT key, bucket,
               CASE WHEN close_v IS NOT NULL THEN close_v
                    ELSE {interp} END AS v,
               close_v IS NULL AS filled,
               CAST(n_obs AS BIGINT) AS n_events
        FROM w
    """


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average per key: ``(key, twa, t_first, t_last,
    n_points)`` — each observation weighted by how long it REMAINED the
    current value (until the next observation), i.e. the integral of the
    last-known-value step function divided by the observed span.

    The right mean for irregularly-sampled state series (price, gauge,
    connection count): an arithmetic mean over-weights bursts of samples;
    TWAP is sampling-cadence-invariant.  The final observation carries no
    duration (nothing is known after it) — keys with a single observation
    (zero span) fall back to that value, per the usual locf convention.

    One ``lead`` window in the deterministic (ts, id) order + one hash-agg,
    both sharing the key partitioning; weights are integer microsecond
    deltas so the weighted sum is dsum-exact and the single final division
    quantizes — engine-reproducible bit-for-bit.
    """
    from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
        dsum,
        quantize6,
    )

    w = Window.partitionBy(F.col(key_col)).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    stepped = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("t"),
        F.col(value_col).alias("v"),
        _order_key(F.col(ts_col), F.col(id_col)).alias("k"),
        (F.lead(F.col(ts_col), 1).over(w) - F.col(ts_col)).alias("dur"),
    )
    agg = stepped.groupBy("key").agg(
        dsum(F.col("v") * F.coalesce(F.col("dur"), F.lit(0)).cast("double")).alias(
            "__wsum"
        ),
        F.sum(F.coalesce("dur", F.lit(0))).alias("__span"),
        F.min("t").alias("t_first"),
        F.max("t").alias("t_last"),
        F.count(F.lit(1)).alias("n_points"),
        F.min_by("v", "k").alias("__first_v"),
    )
    return agg.select(
        "key",
        F.when(
            F.col("__span") > 0, quantize6(F.col("__wsum") / F.col("__span"))
        )
        .otherwise(quantize6(F.col("__first_v")))
        .alias("twa"),
        "t_first",
        "t_last",
        F.col("n_points"),
    )


def time_weighted_avg_sql(
    table: str, key_expr: str, ts_expr: str, id_expr: str, value_expr: str
) -> str:
    """DuckDB oracle reproducing :func:`time_weighted_avg` bit-for-bit."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
        dsum_sql,
        quantize6_sql,
    )

    return f"""
        WITH stepped AS (
            SELECT {key_expr} AS key, {ts_expr} AS t, {value_expr} AS v,
                   lpad(CAST({ts_expr} AS VARCHAR), 20, '0') ||
                       lpad(CAST({id_expr} AS VARCHAR), 12, '0') AS k,
                   lead({ts_expr}) OVER (
                       PARTITION BY {key_expr}
                       ORDER BY {ts_expr} ASC, {id_expr} ASC
                   ) - {ts_expr} AS dur
            FROM {table}
        ),
        agg AS (
            SELECT key,
                   {dsum_sql("v * CAST(coalesce(dur, 0) AS DOUBLE)")} AS wsum,
                   CAST(sum(coalesce(dur, 0)) AS BIGINT) AS span,
                   min(t) AS t_first, max(t) AS t_last,
                   count(*) AS n_points,
                   arg_min(v, k) AS first_v
            FROM stepped GROUP BY key
        )
        SELECT key,
               CASE WHEN span > 0 THEN {quantize6_sql("wsum / span")}
                    ELSE {quantize6_sql("first_v")} END AS twa,
               t_first, t_last, n_points
        FROM agg
    """
