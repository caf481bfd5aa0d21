"""Core relational query catalog (SURVEY.md §2.2–§2.6) on the testdata tables.

Each query transposes a reference query *shape* (cited per entry) onto the
synthetic TPC-H-ish tables.  All are pure DataFrame plans — Catalyst supplies
pushdown, pruning, partial aggregation, TakeOrderedAndProject, and broadcast
joins; nothing here collects to the driver.

Determinism notes (the oracle hash is order-insensitive but membership-
sensitive): every LIMIT is preceded by a total order (tie-broken on a unique
key), mirroring SURVEY.md §2.5's sort-tie caveat.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import (
    events_with_time,
    load_table,
    register_temp_views,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.queries.registry import register


# ---------------------------------------------------------------------------
# Flagship: compound group-by aggregation (A1/A3/A4; $group with $sum/$avg —
# 05-analyzing-data/avg_population.py:35-42 shape at TPC-H Q1 scale).
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql("l_quantity")} AS sum_qty,
               {dsum_sql("l_extendedprice")} AS sum_base_price,
               {dsum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
               {davg_sql("l_quantity")} AS avg_qty,
               {davg_sql("l_extendedprice")} AS avg_price,
               {davg_sql("l_discount")} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="$match+$group compound key w/ $sum/$avg (05/avg_population.py:35-42; README.md:1140-1144)"
    "  Evicted from the driver window in the r12 rotation (driver-green r1-r11; stays entry()'s flagship and in the pinned r2 bench subset); still oracle-gated at sf0.01.",
    tags=("agg", "flagship"),
    driver_visible=False,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A1 + T1: group-count + sort desc + limit k ($sort/$limit top-k).
# ---------------------------------------------------------------------------
@register(
    "top_event_types",
    oracle="""
        SELECT event_type, COUNT(*) AS cnt
        FROM events
        GROUP BY event_type
        ORDER BY cnt DESC, event_type ASC
        LIMIT 3
    """,
    doc="$group/$sum:1 + $sort:-1 + $limit (05/tweet_apps.py:33-35)",
    tags=("agg", "topk"),
    driver_visible=False,
)
def top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(3)
    )


# ---------------------------------------------------------------------------
# P1–P4: equality predicate + conjunction + projection.
# ---------------------------------------------------------------------------
@register(
    "find_building_customers",
    oracle="""
        SELECT c_name, c_acctbal, c_nationkey
        FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
    """,
    doc="find({'manufacturer':'Porsche', ...}, projection) (04/find_porsche.py:17; 04/find_cars.py:34)",
    tags=("filter", "project"),
    driver_visible=False,
)
def find_building_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000.0)
    ).select("c_name", "c_acctbal", "c_nationkey")


# ---------------------------------------------------------------------------
# P5: range predicate ($gte/$lte on datetime — 04/find_cities.py:18).
# ---------------------------------------------------------------------------
@register(
    "orders_in_range",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
    """,
    doc="$gte/$lt datetime range (04/find_cities.py:18; 05/region_cities.py:30-31).  "
    "Rotated out of the driver window in r4 (VERDICT r3 ask #2: P5 shape "
    "covered by pricing_summary's date filter; slot given to "
    "events_gap_filled_locf); still in the local parity gate.",
    tags=("filter", "agg"),
    driver_visible=False,
)
def orders_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# P7: $in membership.
# ---------------------------------------------------------------------------
@register(
    "nations_in_set",
    oracle="""
        SELECT n_name, n_regionkey
        FROM nation
        WHERE n_name IN ('NATION_1', 'NATION_7', 'NATION_19')
    """,
    doc="$in membership (04/find_cars.py:16)",
    tags=("filter",),
    driver_visible=False,
)
def nations_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.filter(F.col("n_name").isin("NATION_1", "NATION_7", "NATION_19")).select(
        "n_name", "n_regionkey"
    )


# ---------------------------------------------------------------------------
# P8/P9: $exists + nested-path predicate, on the JSON props column.
# ---------------------------------------------------------------------------
@register(
    "events_with_large_k",
    oracle="""
        SELECT event_type, COUNT(*) AS cnt, AVG(k) AS avg_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        WHERE k IS NOT NULL AND k > 50
        GROUP BY event_type
    """,
    doc="$exists + dot-path predicate (05/most_common_city_name.py:39; 04/dot_find.py:18)"
    "  Evicted from the driver window in the r12 rotation (driver-green r1-r11); still oracle-gated at sf0.01.",
    tags=("filter", "json"),
    driver_visible=False,
)
def events_with_large_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull() & (F.col("k") > 50))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.avg("k").alias("avg_k"))
    )


# ---------------------------------------------------------------------------
# P2: computed projection + rename ($project with field renames).
# ---------------------------------------------------------------------------
@register(
    "project_rename",
    oracle="""
        SELECT c_name AS name,
               c_acctbal AS balance,
               c_acctbal * 1.1 AS adjusted
        FROM customer
        WHERE c_acctbal > 4900.0
    """,
    doc="$project rename + computed field (05/most_followed_brasilians.py:43-45)",
    tags=("project",),
    driver_visible=False,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 4900.0).select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
        (F.col("c_acctbal") * 1.1).alias("adjusted"),
    )


# ---------------------------------------------------------------------------
# A2/A3: group-avg with compound key.
# ---------------------------------------------------------------------------
@register(
    "avg_balance_by_nation_segment",
    oracle=f"""
        SELECT c_nationkey, c_mktsegment,
               {davg_sql("c_acctbal")} AS avg_bal, COUNT(*) AS cnt
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """,
    doc="$group compound _id + $avg (05/avg_population.py:37-39).  Parked "
    "from the driver window in r7 (near-dup of pricing_summary's "
    "compound-key aggregate) to rotate in etl_avro_roundtrip; stays in "
    "the oracle-parity gate.",
    tags=("agg",),
    driver_visible=False,
)
def avg_balance_by_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        davg("c_acctbal").alias("avg_bal"), F.count(F.lit(1)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# A5: two-level re-aggregation (avg of per-group avgs).
# ---------------------------------------------------------------------------
@register(
    "avg_of_avgs_by_nation",
    oracle=f"""
        SELECT c_nationkey, {davg_sql("avg_bal")} AS avg_of_avgs
        FROM (
            SELECT c_nationkey, c_mktsegment, {davg_sql("c_acctbal")} AS avg_bal
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
        )
        GROUP BY c_nationkey
    """,
    doc="two-level $group re-aggregation (05/avg_population.py:35-42).  "
    "Hidden from the driver window (r3) to give dedup_near_clusters a hard "
    "row: chained hash-agg shape keeps visible coverage via "
    "pricing_summary (avg_balance_by_nation_segment and "
    "ds_value_stats_by_type carried it r1-r10); stays in the "
    "local sf0.01 parity gate.",
    tags=("agg",),
    driver_visible=False,
)
def avg_of_avgs_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    inner = c.groupBy("c_nationkey", "c_mktsegment").agg(davg("c_acctbal").alias("avg_bal"))
    return inner.groupBy("c_nationkey").agg(davg("avg_bal").alias("avg_of_avgs"))


# ---------------------------------------------------------------------------
# A4: global aggregate (constant $group _id).
# ---------------------------------------------------------------------------
@register(
    "global_order_stats",
    oracle=f"""
        SELECT COUNT(*) AS n_orders,
               {davg_sql("o_totalprice")} AS avg_price,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders
    """,
    doc="global aggregate, _id: null (05/avg_city_pop_for_indian_regions.py:42-43)",
    tags=("agg",),
    driver_visible=False,
)
def global_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        davg("o_totalprice").alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# A6/A7: $push / $addToSet accumulators (stringified for stable hashing).
# ---------------------------------------------------------------------------
@register(
    "statuses_per_priority",
    oracle="""
        SELECT o_orderpriority,
               array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
               COUNT(*) AS cnt
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="$addToSet accumulator (05/frequent_tweeters.py:3-4,36-38)"
    "  Driver r1-r9; evicted in the r10 rotation (group-count family keeps "
    "pricing_summary), still oracle-gated at sf0.01.",
    tags=("agg", "array"),
    driver_visible=False,
)
def statuses_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("cnt"),
    )


# ---------------------------------------------------------------------------
# A8/A9: distinct count + filtered count.
# ---------------------------------------------------------------------------
@register(
    "distinct_customers_with_orders",
    oracle="""
        SELECT COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderstatus = 'F'
    """,
    doc="distinct('created.user') + find(pred).count() (README.md:882,868).  "
    "Evicted from the driver window in the r11 rotation (driver-green "
    "r1-r10; global-agg/distinct shapes covered by pricing_summary — "
    "ds_value_stats_by_type carried a row r1-r10 before its own "
    "second-wave eviction); still oracle-gated at sf0.01.",
    tags=("agg",),
    driver_visible=False,
)
def distinct_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "F").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# A13: group-first / dedupe-to-representative via window rank.
# ---------------------------------------------------------------------------
@register(
    "top_order_per_priority",
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rn
            FROM orders
        )
        WHERE rn = 1
    """,
    doc="group-first representative doc (README.md:919-920,985-986).  "
    "Rotated out of the driver window in r4: per-group representative "
    "pick covered by extreme_value_events' argmax row (gate-only itself "
    "since r9; the N-ary $topN family generalizes both); slot given to the new BPE "
    "training family (ask #8 hygiene); still in the local parity gate.",
    tags=("window", "topk"),
    driver_visible=False,
)
def top_order_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# F1: $unwind — explode document text into tokens, count (degree-count shape).
# ---------------------------------------------------------------------------
@register(
    "top_tokens",
    oracle="""
        SELECT token, COUNT(*) AS cnt
        FROM (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents
        )
        WHERE token <> ''
        GROUP BY token
        ORDER BY cnt DESC, token ASC
        LIMIT 20
    """,
    doc="$unwind + $group + $sort + $limit (README.md:976-986 "
    "three-most-referenced-nodes). Gate-only since round 3's second "
    "rotation: the explode+count+topk family keeps its hard row via "
    "ds_unwind_token_counts (same shape through the docstore pipeline "
    "compiler); this slot went to a novel operator family.",
    tags=("explode", "topk"),
    driver_visible=False,
)
def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J1: enrichment join (small dims broadcast — customer→nation→region).
# ---------------------------------------------------------------------------
@register(
    "customers_per_region",
    oracle=f"""
        SELECT r.r_name, COUNT(*) AS n_customers, {davg_sql("c.c_acctbal")} AS avg_bal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    doc="lookup/enrichment join (04/update.py:56-76 re-expressed as broadcast "
    "equi-join).  Hidden from the driver window (r3): J1's enrichment-join + "
    "broadcast shape already carries the upsert_supplier_acctbal hard row; "
    "the slot goes to the decontamination operator family.",
    tags=("join", "agg"),
    driver_visible=False,
)
def customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), davg("c_acctbal").alias("avg_bal"))
    )


# ---------------------------------------------------------------------------
# J2: top-k-then-fetch (semi-join fan-in).
# ---------------------------------------------------------------------------
@register(
    "orders_of_top_customers",
    oracle=f"""
        WITH topc AS (
            SELECT o_custkey, COUNT(*) AS cnt
            FROM orders
            GROUP BY o_custkey
            ORDER BY cnt DESC, o_custkey ASC
            LIMIT 5
        )
        SELECT o.o_custkey, COUNT(*) AS n_orders, {dsum_sql("o.o_totalprice")} AS total_spent
        FROM orders o
        WHERE o.o_custkey IN (SELECT o_custkey FROM topc)
        GROUP BY o.o_custkey
    """,
    doc="top-k agg then per-key find (README.md:911-920) as broadcast left-semi join"
    "  Evicted from the driver window in the r11 second wave (driver-green through r10; join+topk shapes covered by ds_lookup_group and bm25_keyword_topk); still oracle-gated at sf0.01.",
    tags=("join", "topk"),
    driver_visible=False,
)
def orders_of_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    topc = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("o_custkey"))
        .limit(5)
        .select("o_custkey")
    )
    return (
        o.join(F.broadcast(topc), "o_custkey", "left_semi")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# C13: $dayOfWeek histogram (1=Sunday..7=Saturday, Mongo & Spark convention;
# DuckDB's dayofweek is 0=Sunday so the oracle adds 1).
# ---------------------------------------------------------------------------
@register(
    "orders_by_dayofweek",
    oracle="""
        SELECT dayofweek(o_orderdate) + 1 AS dow, COUNT(*) AS cnt
        FROM orders
        GROUP BY dow
        ORDER BY dow ASC
    """,
    doc="$dayOfWeek histogram, $sort _id:1 (README.md:1202-1211).  Rotated "
    "out of the driver window in r4: derived-date-key group-count shape "
    "covered by streaming_hourly_rollup's visible row; slot given to the "
    "new chunk_training_windows family (ask #8 hygiene); still in the "
    "local parity gate.",
    tags=("datetime", "agg"),
    driver_visible=False,
)
def orders_by_dayofweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.dayofweek("o_orderdate").alias("dow"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.asc("dow"))
    )


# ---------------------------------------------------------------------------
# C14: datetime subtract / divide → age in days (deterministic 'now' literal).
# ---------------------------------------------------------------------------
@register(
    "order_age_days",
    oracle=f"""
        SELECT o_orderpriority,
               {davg_sql("date_diff('second', o_orderdate, TIMESTAMP '2002-01-01') / 86400.0")}
                   AS avg_age_days
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="$subtract datetimes → ms, $divide → ageInDays (README.md:1235-1242).  "
    "Hidden from the driver window (r3) to give events_asof_last_order a "
    "hard row: datetime arithmetic keeps visible coverage via "
    "orders_by_dayofweek and the streaming/sessionize families; stays in "
    "the local sf0.01 parity gate.",
    tags=("datetime",),
    driver_visible=False,
)
def order_age_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    now = F.lit("2002-01-01").cast("timestamp_ntz")
    age_days = (
        F.unix_timestamp(now.cast("timestamp")) - F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    ) / 86400.0
    return o.groupBy("o_orderpriority").agg(davg(age_days).alias("avg_age_days"))


# ---------------------------------------------------------------------------
# Batch time-bucketing on the events stream table (stretch per SURVEY.md §2.8;
# integer hour buckets keep the value-hash engine-agnostic).
# ---------------------------------------------------------------------------
@register(
    "hourly_event_rollup",
    oracle=f"""
        SELECT epoch_ns(ts) // 3600000000000 AS epoch_hour,
               event_type,
               COUNT(*) AS cnt,
               {dsum_sql("value")} AS sum_value
        FROM events
        GROUP BY epoch_hour, event_type
    """,
    doc="batch time-bucketed rollup (window(ts, '1 hour') analogue; SURVEY.md §2.8)",
    tags=("datetime", "agg", "streaming-analog"),
    driver_visible=False,
)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_with_time(spark, sf_dir)
    return ev.groupBy("epoch_hour", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("value").alias("sum_value")
    )


# ---------------------------------------------------------------------------
# F4/F5: nest (struct/map construction) then unnest back to columns — the
# shaped-document round-trip (created{}/address{} building, data.py:99-125,
# inverse select(col("address.*"))).  Output is flat so the oracle hash is
# engine-agnostic; the nesting happens mid-plan.
# ---------------------------------------------------------------------------
@register(
    "nest_unnest_roundtrip",
    oracle="""
        SELECT c_custkey, c_name AS name, c_acctbal AS balance,
               c_mktsegment AS segment
        FROM customer
        WHERE c_custkey <= 500
    """,
    doc="struct + map construction then flatten (F4/F5; data.py:99-125 shape).  "
    "Rotated out of the driver window in r9 (VERDICT r8 ask #1: flat-in/"
    "flat-out hash can't observe the mid-plan nesting anyway; slot given to "
    "scd2_incremental_state); still in the local parity gate.",
    tags=("reshape",),
    driver_visible=False,
)
def nest_unnest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    nested = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"), F.col("c_acctbal").alias("balance")
        ).alias("info"),
        F.create_map(F.lit("segment"), F.col("c_mktsegment")).alias("tags"),
    )
    return nested.select(
        "c_custkey",
        F.col("info.name").alias("name"),
        F.col("info.balance").alias("balance"),
        F.col("tags")["segment"].alias("segment"),
    )


# ---------------------------------------------------------------------------
# OLAP rollup (beyond the reference surface): hierarchical subtotals with
# null markers for aggregated-out levels — identical semantics both engines.
# ---------------------------------------------------------------------------
@register(
    "cube_order_counts",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="cube: all grouping-set combinations with null markers.  Rotated out "
    "of the driver window in r9 (VERDICT r8 ask #1: Expand+aggregate "
    "grouping-sets path ⊂ statuses_per_priority hash-agg family; slot given "
    "to geo_radius_join_wrap); still in the local parity gate.",
    tags=("agg", "cube"),
    driver_visible=False,
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "rollup_customer_counts",
    oracle="""
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
        FROM customer
        GROUP BY ROLLUP(c_nationkey, c_mktsegment)
    """,
    doc="hierarchical rollup subtotals (nation → segment → grand total).  "
    "Hidden from the driver window (r3): the Expand+aggregate grouping-sets "
    "plan is covered by cube_order_counts (cube ⊃ rollup); the slot goes to "
    "ann_ivf_kmeans_topk.",
    tags=("agg", "rollup"),
    driver_visible=False,
)
def rollup_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.rollup("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# Pivot (long→wide): the inverse of A11's unpivot.  Pivot values are pinned
# explicitly — dynamic value discovery would be nondeterministic schema.
# ---------------------------------------------------------------------------
_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@register(
    "pivot_segment_counts",
    oracle=f"""
        SELECT c_nationkey,
               {", ".join(
                   f"COUNT(*) FILTER (WHERE c_mktsegment = '{s}') AS {s.lower()}"
                   for s in _SEGMENTS
               )}
        FROM customer
        GROUP BY c_nationkey
    """,
    doc="long→wide pivot with pinned values (inverse of A11 unpivot).  "
    "Rotated out of the driver window in r9 (VERDICT r8 ask #1: pinned-value "
    "pivot compiles to the same first-agg-then-project hash agg as "
    "lineitem_measure_stats; slot given to dsir_gumbel_resample); still in "
    "the local parity gate.",
    tags=("reshape", "agg"),
    driver_visible=False,
)
def pivot_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    out = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "c_nationkey", *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in _SEGMENTS]
    )
    return renamed


# ---------------------------------------------------------------------------
# Exact percentiles (beyond the reference surface; both engines implement
# R-7 linear interpolation on order statistics, so the doubles bit-match).
# ---------------------------------------------------------------------------
@register(
    "value_percentiles",
    oracle="""
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM events
        GROUP BY event_type
    """,
    doc="exact percentile/median per group (R-7 interpolation, bit-matched)"
    "  Driver r1-r9; evicted in the r10 rotation (quantile family covered by ds_window_topn_median's new driver row + the ds_minmax_topn gate), still oracle-gated at sf0.01.",
    tags=("agg", "percentile"),
    driver_visible=False,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread(): percentile buffers merge once either way; the extra
    # shuffle lost the A/B at sf0.1 (0.63s vs 0.70s)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


# ---------------------------------------------------------------------------
# A8 scalable variant: HLL approximate distinct.  The registers are
# engine-private, so the ESTIMATE can never hash-match an oracle — but the
# ACCURACY CONTRACT can: the query emits the exact distinct count plus a
# boolean asserting the HLL estimate landed within ±5% of it (2.5σ at
# rsd=0.02; HLL++ is deterministic for a given dataset, so the boolean is
# stable, not flaky), and the oracle computes the exact side and asserts
# TRUE.  A hash match therefore PROVES the sketch met its bound on the
# driver's own data — the bounds-style oracle that makes the approx family
# fully verifiable (VERDICT r12 ask #6; previously rows-only forever).
# ---------------------------------------------------------------------------
@register(
    "approx_distinct_users",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               TRUE AS approx_within_5pct
        FROM events
        GROUP BY event_type
    """,
    doc="approx_count_distinct (HLL++): the 100 TB path where exact distinct "
    "would shuffle every key.  Bounds-style oracle (r13): the output carries "
    "exact_users plus approx_within_5pct = |est-exact|/exact <= 0.05; DuckDB "
    "replays the exact side and asserts TRUE, so the hash match verifies the "
    "sketch's accuracy contract on the driver's own data.  The bound is "
    "max(5% of exact, 2): 5% is 2.5 sigma at rsd=0.02, and the ±2 absolute "
    "floor (mirroring tests/test_scale.py's max(0.05*n, 2)) keeps tiny "
    "groups stable — below n=40 a single-register artifact legitimately "
    "exceeds 5% without violating the rsd contract (ADVICE r13).  HLL++ is "
    "deterministic per dataset, so the row is stable.  Point accuracy "
    "additionally asserted in "
    "tests/test_scale.py::test_approx_distinct_within_rsd_bound.",
    tags=("agg", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(0.05 * F.col("exact_users"), F.lit(2.0))
        ).alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# SQL entry path: the same engine through spark.sql over registered views —
# identical Catalyst plan as the DataFrame API, proving the declarative
# surface is interchangeable (SURVEY.md §3.2 pipeline ≙ SQL ≙ DataFrame).
# The quantized-sum fragment is dialect-shared between Spark SQL and DuckDB.
# ---------------------------------------------------------------------------
_REVENUE_SQL = """
    SELECT n.n_name,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 1e6 + 0.5)
                         AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
"""


@register(
    "shipping_priority_top10",
    oracle=f"""
        SELECT l.l_orderkey AS l_orderkey,
               {dsum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
               o.o_orderdate AS o_orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping-priority top-10): three-table join with "
    "selective filters on both fact sides, revenue agg, top-k.  The plan "
    "Catalyst should pick — and tests pin — broadcasts the filtered "
    "customer side and takes TakeOrderedAndProject for the top-k; at "
    "cluster scale the orders⋈lineitem side is the co-location candidate "
    "(bucket both by orderkey via operators/scale.write_bucketed).  "
    "Driver-visible since the r13 rotation (VERDICT r12 ask #1: never-driver-verified residual burn-down).",
    tags=("join", "topk", "agg"),
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c["c_custkey"] == o["o_custkey"])
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "sql_revenue_by_nation",
    oracle=_REVENUE_SQL,
    doc="spark.sql entry over registered views (TPC-H Q5 shape); same string "
    "runs on both engines — one definition, two executors, one hash.  "
    "Rotated out of the driver window in r9 (VERDICT r8 ask #1: spark.sql "
    "text lands on the identical Catalyst join+agg+sort plan as "
    "nation_order_ranking; slot given to geo_intersects_events); still in "
    "the local parity gate.",
    tags=("sql", "join", "agg"),
    driver_visible=False,
)
def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(_REVENUE_SQL)


# ---------------------------------------------------------------------------
# T3: full sort desc, no limit (ranked listing).
# ---------------------------------------------------------------------------
@register(
    "nation_order_ranking",
    oracle="""
        SELECT n.n_name, COUNT(*) AS cnt
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY cnt DESC, n_name ASC
    """,
    doc="full ranked listing $sort desc no limit (README.md:1056-1059,1101-1104)"
    "  Driver r1-r9; evicted in the r10 rotation (sort/rank family keeps events_with_large_k's driver row), still oracle-gated at sf0.01.",
    tags=("join", "sort"),
    driver_visible=False,
)
def nation_order_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("n_name"))
    )
