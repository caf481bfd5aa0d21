"""Excel source (SURVEY.md §2.1 S6), dependency-gated.

The reference reads ``.xls`` with xlrd and decodes Excel serial dates
(01/excel_csv.py:21-46).  Neither xlrd nor a Spark excel connector is baked
into this environment, so the reader is gated behind an import-try (pandas'
``read_excel`` picks up whichever engine is installed) and degrades to a clear
error.  The serial-date decode itself is a native Column expression
(functions/cleaning.py ``excel_serial_to_timestamp``, C15) and is fully
tested without any Excel dependency.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.cleaning import (
    excel_serial_to_timestamp,
)


def excel_support() -> bool:
    try:  # pragma: no cover - depends on environment
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        try:
            import xlrd  # noqa: F401

            return True
        except ImportError:
            return False


def read_excel(spark: SparkSession, path: str, sheet: int = 0) -> DataFrame:
    """S6: Excel sheet → DataFrame (driver-side pandas read — workbook files
    are small dimension inputs; the serial-date decode downstream is
    distributed Column algebra)."""
    if not excel_support():
        raise ImportError(
            "No Excel engine available (openpyxl/xlrd); convert the workbook "
            "to CSV and use sources.csvx, then decode serial dates with "
            "functions.cleaning.excel_serial_to_timestamp"
        )
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet)
    return spark.createDataFrame(pdf)


def decode_serial_date_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Decode Excel 1900-epoch serial-date columns to timestamps (C15)."""
    out = df
    for c in cols:
        out = out.withColumn(c, excel_serial_to_timestamp(F.col(c).cast("double")))
    return out
