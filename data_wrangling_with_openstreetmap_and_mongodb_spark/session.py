"""SparkSession construction with scale-appropriate defaults.

The engine targets large clusters (100 TB-class inputs) but is tested on
``local[N]``.  Every setting below is chosen so the *same* logical plans scale:
AQE re-plans shuffles at runtime, skew-join handling splits hot partitions,
and Arrow keeps any unavoidable Python boundary vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# All confs here are runtime-settable; `ensure_runtime_confs` applies them to
# sessions we did not build (e.g. the verification driver's own session).
# nanosAsLong: some testdata generations ship events.ts as parquet
# TIMESTAMP(NANOS), which Spark only reads via this legacy flag (as raw
# nanosecond longs); catalog.ts_micros adapts to whichever encoding arrives.
# session.timeZone pinned UTC: TIMESTAMP_NTZ→TIMESTAMP casts and epoch
# extraction must be wall-clock-identity regardless of host timezone.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # runtime-settable: keeps toPandas/createDataFrame vectorized on sessions
    # we did not build (the verification driver's plain session)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs this engine relies on to an existing session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by the host
            pass
    return spark


def get_spark(
    app_name: str = "data-wrangling-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract); on a
    real cluster ``master`` is left to spark-submit.  ``extra_conf`` entries
    are applied last and win over the defaults.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    if master is not None:
        builder = builder.master(master)
    elif os.environ.get("SPARK_MASTER") is None and "SPARK_GRAFT_CPUS" in os.environ:
        builder = builder.master(f"local[{cpus}]")
    return ensure_runtime_confs(builder.getOrCreate())
