"""Named query catalog: every entry pairs a Spark callable with a DuckDB
oracle SQL string (or ``None`` for non-SQL-expressible operators)."""

from data_wrangling_with_openstreetmap_and_mongodb_spark.queries.registry import (
    QUERIES,
    Query,
    apply_rotation_policy,
    driver_catalog,
    register,
)

# Importing the modules populates the registry.
from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import (  # noqa: E402,F401
    cleaning_queries,
    docstore_queries,
    etl_queries,
    geo_queries,
    relational,
    trainingdata_queries,
)

# Provenance-freshness rotation (r15): the driver window follows the
# committed CORRECTNESS artifacts — oldest latest-green first, new queries
# (no row yet) first of all — instead of per-query visibility flags.
apply_rotation_policy()

__all__ = ["QUERIES", "Query", "apply_rotation_policy", "driver_catalog", "register"]
