"""MongoDB-style query surface compiled to Catalyst (SURVEY.md §3.2/§3.3)."""

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
    DocumentCollection,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.find import (
    FindCompiler,
    compile_projection,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

__all__ = ["DocumentCollection", "FindCompiler", "compile_projection", "aggregate"]
