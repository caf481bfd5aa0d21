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


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB7' → 27: base-26 letters prefix of an A1-style ref."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def read_xlsx(
    spark: SparkSession, path: str, sheet: int = 1, header: bool = True
) -> DataFrame:
    """S6 without third-party engines: a minimal stdlib XLSX reader.

    ``.xlsx`` is a zip of XML parts; this parses ``xl/sharedStrings.xml``
    (string table) and ``xl/worksheets/sheet{N}.xml`` (cells: ``t="s"``
    shared-string, ``t="inlineStr"``, numeric/formula ``<v>`` otherwise),
    honoring sparse rows via A1-style cell refs.  All values surface as
    strings — the same all-string contract as the CSV readers (S1), with
    typing applied downstream (e.g. ``decode_serial_date_columns`` for the
    ERCOT serial-date columns, 01/excel_csv.py:21-46).

    Like :func:`read_excel`, the parse is driver-side: workbooks are small
    dimension inputs (the reference's is 8 columns × 8.8k rows); the rows
    distribute immediately after.
    """
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        sheet_root = ET.fromstring(z.read(f"xl/worksheets/sheet{sheet}.xml"))
        raw_rows: list[dict[int, str | None]] = []
        for row in sheet_root.find(f"{_XLSX_NS}sheetData").findall(f"{_XLSX_NS}row"):
            cells: dict[int, str | None] = {}
            for c in row.findall(f"{_XLSX_NS}c"):
                col = _col_index(c.attrib.get("r", "A"))
                ctype = c.attrib.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_XLSX_NS}is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(f"{_XLSX_NS}t"))
                        if is_el is not None
                        else None
                    )
                else:
                    v = c.find(f"{_XLSX_NS}v")
                    val = None if v is None else v.text
                    if ctype == "s" and val is not None:
                        val = shared[int(val)]
                cells[col] = val
            raw_rows.append(cells)

    width = max((max(r) + 1 for r in raw_rows if r), default=0)
    table = [[r.get(i) for i in range(width)] for r in raw_rows]
    if header and table:
        names = [h if h else f"_c{i}" for i, h in enumerate(table[0])]
        data = table[1:]
    else:
        names = [f"_c{i}" for i in range(width)]
        data = table
    schema = ", ".join(f"`{n}` string" for n in names)
    return spark.createDataFrame([tuple(r) for r in data], schema=schema)
