"""Table catalog over the driver's parquet testdata.

One DataFrame per collection, mirroring the reference's "named collection"
data model (SURVEY.md §1.1) with typed columns instead of dynamic BSON.

Scale notes: all loads are plain ``spark.read.parquet`` so Catalyst keeps
predicate pushdown / column pruning / partition pruning; nothing is cached or
collected here.  The ``events`` table's nanosecond timestamps are exposed both
raw (``ts`` bigint nanos) and as derived, cheap-to-compute columns.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from data_wrangling_with_openstreetmap_and_mongodb_spark.session import ensure_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

NANOS_PER_HOUR = 3_600_000_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from an ``sf*`` directory."""
    ensure_runtime_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` plus derived time columns.

    ``ts`` arrives as bigint nanoseconds (parquet TIMESTAMP(NANOS) via the
    nanosAsLong flag).  ``ts_utc`` truncates to microseconds — identical to
    what DuckDB/pandas see — and ``epoch_hour`` is an integer hour bucket that
    is stable across engines and cheap to group on (no timezone logic, pure
    int arithmetic inside whole-stage codegen).
    """
    ev = load_table(spark, sf_dir, "events")
    # Exact integer division: ts nanos (~1.7e18) exceed 2^53, so fp division
    # can round a boundary and shift the derived micros/hour by one.
    return ev.withColumn(
        "ts_utc", F.timestamp_micros(F.expr("ts div 1000"))
    ).withColumn("epoch_hour", F.expr(f"ts div {NANOS_PER_HOUR}"))


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for ``spark.sql`` entry points."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
