"""A PySpark-native analytics engine with the capabilities of the
``bestkao/data-wrangling-with-openstreetmap-and-mongodb`` reference.

The reference is an ETL pipeline plus a catalog of MongoDB find/aggregation
queries (see SURVEY.md).  This package re-expresses that capability surface
Spark-first:

- ``docstore``   — a MongoDB-style query surface (find documents and
                   aggregation pipelines) *compiled* to Catalyst expressions,
                   i.e. the reference's query lifecycle (SURVEY.md §3.2/§3.3)
                   as a thin declarative layer over DataFrames.
- ``functions``  — the scalar cleaning DSL (SURVEY.md §2.7, C1–C21) as native
                   Column expressions, never row-at-a-time UDFs.
- ``sources``    — readers/writers for csv (incl. metadata prologues),
                   json-lines, XML/OSM shaping, Excel serial dates
                   (SURVEY.md §2.1).
- ``operators``  — reshaping (unwind/nest/unnest), joins, top-k, plus the
                   training-data-pipeline extensions: dedup, similarity
                   search, text analysis, multimodal plumbing.
- ``queries``    — the named query catalog wired into ``__spark_entry__.py``.
- ``streaming``  — Structured-Streaming renderings of the batch time-bucket
                   operators.
"""

from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
