"""CSV sources & sinks (SURVEY.md §2.1 S1–S5).

All readers return plain DataFrames through ``spark.read.csv`` so Catalyst
keeps pushdown/pruning; the reference's quirky prologue/metadata behaviors are
layered on as filters, never driver-side row loops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """S1: headered CSV scan, all columns string (csv.DictReader semantics —
    the reference never infers CSV types; 03-data-quality/validity.py:31-44)."""
    return spark.read.csv(path, header=header, inferSchema=False)


def read_csv_positional(spark: SparkSession, path: str) -> DataFrame:
    """S2: positional CSV (no header) — columns ``_c0``, ``_c1``…
    (01/parsecsv.py:23-33)."""
    return spark.read.csv(path, header=False, inferSchema=False)


def first_line_meta(spark: SparkSession, path: str) -> list[str]:
    """S2's metadata peek: the first line holds non-header metadata (station
    name, 01/parsecsv.py:25-27).  A ``limit(1)`` driver-side read — this is
    per-file metadata, not data."""
    row = spark.read.csv(path, header=False).limit(1).first()
    return [row[c] for c in row.asDict()]


def read_csv_with_prologue(
    spark: SparkSession,
    path: str,
    skip_rows: int = 3,
    uri_column: str | None = None,
) -> DataFrame:
    """S3: DBpedia-style CSV with a metadata prologue after the header
    (3 label/URI rows; 04/autos.py:33-35,144, 04/processing.py:64-65).

    Spark has no ordered row-skip, so two strategies (SURVEY.md S3):

    - ``uri_column`` given: drop rows whose URI is not a dbpedia resource
      (the reference's own validity guard, 03/validity.py:36) — fully
      distributed, order-independent, the scale path.
    - otherwise: anti-join on the first ``skip_rows`` physical rows of the
      (single, small) file — prologue files are dimension inputs, so the
      one-partition read that guarantees physical order is fine.
    """
    df = spark.read.csv(path, header=True, inferSchema=False)
    if uri_column is not None:
        return df.filter(F.col(uri_column).contains("dbpedia.org"))
    first = df.limit(skip_rows)
    return df.exceptAll(first)


def write_pipe_csv(df: DataFrame, path: str) -> None:
    """S4: pipe-delimited CSV sink with header (01/excel_csv.py:48-54)."""
    df.write.mode("overwrite").option("sep", "|").option("header", True).csv(path)


def split_good_bad(df: DataFrame, good_pred) -> tuple[DataFrame, DataFrame]:
    """S5: validity fork — rows passing the predicate vs the rest
    (03/validity.py:47-57 writes them to two files)."""
    return df.filter(good_pred), df.filter(~good_pred | good_pred.isNull())


def write_good_bad(df: DataFrame, good_pred, good_path: str, bad_path: str) -> None:
    good, bad = split_good_bad(df, good_pred)
    good.write.mode("overwrite").option("header", True).csv(good_path)
    bad.write.mode("overwrite").option("header", True).csv(bad_path)
