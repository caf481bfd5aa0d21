"""JSON sources & sinks (SURVEY.md §2.1 S13–S14, S19–S20).

The reference's universal interchange format is newline-delimited JSON
(``process_map`` output, ``mongoimport`` input — data.py:138-151,
README.md:822-843); whole-document JSON appears in lesson 01/04.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def read_json(spark: SparkSession, path: str, multiline: bool = False) -> DataFrame:
    """S13: JSON scan — ``multiline=True`` for whole-doc / list-of-docs files
    (01/nytimes.py:31-34), default JSON-lines."""
    return spark.read.option("multiLine", multiline).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S14 + S19: JSON-lines sink; ``overwrite`` is the drop-if-exists
    idempotent reload (README.md:832-839)."""
    df.write.mode(mode).json(path)


def find_one(df: DataFrame) -> dict[str, Any] | None:
    """S20: single-doc peek (``find_one()`` / ``cursor[0]``,
    04/add_chicago.py:19-20)."""
    row = df.first()
    return row.asDict(recursive=True) if row is not None else None
