"""Table catalog over the driver's parquet testdata.

One DataFrame per collection, mirroring the reference's "named collection"
data model (SURVEY.md §1.1) with typed columns instead of dynamic BSON.

Scale notes: all loads are plain ``spark.read.parquet`` so Catalyst keeps
predicate pushdown / column pruning / partition pruning; nothing is cached or
collected here.  The ``events`` table's timestamps are exposed both raw
(``ts``) and as derived, cheap-to-compute columns; :func:`ts_micros` is the
one place that knows the physical encoding (the driver has shipped ``ts``
both as parquet TIMESTAMP(NANOS)-as-long and as TIMESTAMP(MICROS)), so every
consumer sees the same bigint epoch-microsecond timeline either way.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import LongType

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
MICROS_PER_HOUR = 3_600_000_000
MICROS_PER_DAY = 86_400_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from an ``sf*`` directory."""
    ensure_runtime_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """Event time as bigint microseconds since epoch, whatever the encoding.

    The testdata has shipped ``ts`` two ways: bigint nanoseconds (parquet
    TIMESTAMP(NANOS) surfaced via the ``nanosAsLong`` flag) and a native
    TIMESTAMP(MICROS) column (read as TIMESTAMP_NTZ).  Both map onto the same
    microsecond timeline — exactly what DuckDB/pandas see — so deriving every
    time bucket from this one expression keeps cross-engine hashes identical.

    Exact integer division for the long case: ts nanos (~1.7e18) exceed 2^53,
    so fp division can round a boundary and shift a derived bucket by one.
    The session timezone is pinned to UTC (session.py) so the NTZ→LTZ cast is
    wall-clock-identity on any host.
    """
    if isinstance(df.schema[col].dataType, LongType):
        return F.expr(f"{col} div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` plus derived time columns.

    ``ts_utc`` is the event time as a plain TIMESTAMP; ``epoch_hour`` is an
    integer hour bucket that is stable across engines and cheap to group on
    (no timezone logic, pure int arithmetic inside whole-stage codegen).
    """
    ev = load_table(spark, sf_dir, "events")
    # integer `div` (not fp `/` + floor): bucket boundaries must not misround
    return (
        ev.withColumn("ts_us", ts_micros(ev))
        .withColumn("ts_utc", F.timestamp_micros(F.col("ts_us")))
        .withColumn("epoch_hour", F.expr(f"ts_us div {MICROS_PER_HOUR}"))
        .drop("ts_us")
    )


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for ``spark.sql`` entry points."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
