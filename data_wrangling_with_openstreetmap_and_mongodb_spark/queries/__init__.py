"""Named query catalog: every entry pairs a Spark callable with a DuckDB
oracle SQL string (or ``None`` for non-SQL-expressible operators)."""

from data_wrangling_with_openstreetmap_and_mongodb_spark.queries.registry import (
    QUERIES,
    Query,
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

__all__ = ["QUERIES", "Query", "driver_catalog", "register"]
