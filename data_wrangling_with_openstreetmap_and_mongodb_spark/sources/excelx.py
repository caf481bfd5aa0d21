"""Excel source (SURVEY.md §2.1 S6).

The reference reads ``.xls`` with xlrd and decodes Excel serial dates
(01/excel_csv.py:21-46).  No Excel engine is baked into this environment, so
S6 is covered three ways:

* :func:`read_xls` — an engine-free minimal reader for the reference's actual
  file format: OLE2 compound file + BIFF8 records, stdlib only (struct + the
  record grammar from the public MS-CFB / MS-XLS specs).
* :func:`read_xlsx` — the same for modern zip/XML workbooks.
* :func:`read_excel` — delegates to pandas + whichever engine is installed,
  gated behind an import-try.

The serial-date decode itself is a native Column expression
(functions/cleaning.py ``excel_serial_to_timestamp``, C15) and is fully
tested without any Excel dependency.
"""

from __future__ import annotations

import struct

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


# ---------------------------------------------------------------------------
# Legacy .xls: OLE2 compound file + BIFF8 records, stdlib only.
#
# The reference's actual artifact (2013_ERCOT_Hourly_Load_Data.xls,
# 01/excel_csv.py:21-46) is this format — an OLE2 container holding a
# "Workbook" stream of BIFF8 records — and xlrd isn't installed here, so the
# container and record grammars (public MS-CFB / MS-XLS specs) are parsed
# directly.  Driver-side like read_xlsx: workbooks are small dimension
# inputs; rows distribute immediately after.
# ---------------------------------------------------------------------------

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


def _ole2_stream(data: bytes, stream_names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name matches, following the
    FAT chain (or the miniFAT chain inside the root storage for streams
    under the mini cutoff)."""
    if data[:8] != _OLE_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    sector_size = 1 << struct.unpack_from("<H", data, 30)[0]
    mini_size = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        off = (i + 1) * sector_size
        return data[off : off + sector_size]

    # FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
    fat_sectors = [
        s
        for (s,) in struct.iter_unpack("<I", data[76 : 76 + 4 * 109])
        if s != _FREESECT
    ][:n_fat]
    d = first_difat
    for _ in range(n_difat):
        chunk = sector(d)
        refs = list(struct.unpack_from(f"<{sector_size // 4}I", chunk))
        fat_sectors.extend(s for s in refs[:-1] if s != _FREESECT)
        d = refs[-1]
    fat_sectors = fat_sectors[:n_fat]
    fat = [
        e for s in fat_sectors for e in struct.unpack(f"<{sector_size // 4}I", sector(s))
    ]

    def chain(start: int, size: int | None = None) -> bytes:
        out, s, guard = [], start, 0
        while s != _ENDOFCHAIN and s != _FREESECT:
            out.append(sector(s))
            s = fat[s]
            guard += 1
            if guard > len(fat):  # pragma: no cover - corrupt file guard
                raise ValueError("FAT chain cycle")
        blob = b"".join(out)
        return blob if size is None else blob[:size]

    directory = chain(first_dir)
    root_start = root_size = None
    target = None
    for off in range(0, len(directory), 128):
        entry = directory[off : off + 128]
        if len(entry) < 128:
            break
        name_len = struct.unpack_from("<H", entry, 64)[0]
        obj_type = entry[66]
        name = entry[: max(0, name_len - 2)].decode("utf-16-le", errors="replace")
        start = struct.unpack_from("<I", entry, 116)[0]
        size = struct.unpack_from("<Q", entry, 120)[0]
        if obj_type == 5:  # root storage → ministream container
            root_start, root_size = start, size
        elif obj_type == 2 and name in stream_names and target is None:
            target = (name, start, size)
    if target is None:
        raise ValueError(f"no stream named any of {stream_names} in OLE2 file")
    _, start, size = target
    if size >= mini_cutoff:
        return chain(start, size)
    # ministream: 64-byte sectors inside the root storage stream, chained
    # through the miniFAT
    minifat: list[int] = []
    s = first_minifat
    for _ in range(n_minifat):
        minifat.extend(struct.unpack(f"<{sector_size // 4}I", sector(s)))
        s = fat[s]
    ministream = chain(root_start, root_size)
    out, s, guard = [], start, 0
    while s != _ENDOFCHAIN and s != _FREESECT:
        out.append(ministream[s * mini_size : (s + 1) * mini_size])
        s = minifat[s]
        guard += 1
        if guard > max(1, len(minifat)):  # pragma: no cover
            raise ValueError("miniFAT chain cycle")
    return b"".join(out)[:size]


def _rk_value(rk: int) -> float:
    """Decode a BIFF RK-compressed number (30-bit int or truncated double,
    optional ×0.01)."""
    if rk & 0x02:  # integer: signed 30-bit, arithmetic shift
        iv = rk - (1 << 32) if rk & 0x80000000 else rk
        val = float(iv >> 2)
    else:  # high 30 bits of an IEEE double
        val = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return val / 100.0 if rk & 0x01 else val


class _SSTCursor:
    """Sequential reader over SST + CONTINUE payloads.  A record break inside
    a string's character data restarts with a fresh option-flags byte (the
    BIFF continuation rule); breaks between fields do not."""

    def __init__(self, payloads: list[bytes]):
        self.payloads = payloads
        self.i = 0
        self.off = 0

    def _ensure(self) -> None:
        while self.i < len(self.payloads) and self.off >= len(self.payloads[self.i]):
            self.i += 1
            self.off = 0

    def read(self, n: int) -> bytes:
        """Raw bytes, spanning records with no continuation byte (headers,
        rich/ext payloads)."""
        out = b""
        while n > 0:
            self._ensure()
            if self.i >= len(self.payloads):
                raise ValueError("SST truncated")
            chunk = self.payloads[self.i][self.off : self.off + n]
            self.off += len(chunk)
            n -= len(chunk)
            out += chunk
        return out

    def read_chars(self, cch: int, high: bool) -> str:
        """Character data: record breaks re-read the grbit byte and may flip
        the compressed/UTF-16 encoding for the remainder."""
        parts: list[str] = []
        while cch > 0:
            self._ensure()
            if self.i >= len(self.payloads):
                raise ValueError("SST string truncated")
            avail = len(self.payloads[self.i]) - self.off
            if avail == 0:
                continue
            width = 2 if high else 1
            take = min(cch, avail // width)
            if take == 0:  # lone byte of a UTF-16 pair at record edge
                raise ValueError("SST split inside a UTF-16 code unit")
            raw = self.payloads[self.i][self.off : self.off + take * width]
            self.off += take * width
            parts.append(raw.decode("utf-16-le" if high else "latin-1"))
            cch -= take
            if cch > 0:  # continuation: fresh grbit byte
                self._ensure()
                high = bool(self.read(1)[0] & 0x01)
        return "".join(parts)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        grbit = self.read(1)[0]
        crun = struct.unpack("<H", self.read(2))[0] if grbit & 0x08 else 0
        cbext = struct.unpack("<i", self.read(4))[0] if grbit & 0x04 else 0
        s = self.read_chars(cch, bool(grbit & 0x01))
        if crun:
            self.read(4 * crun)
        if cbext > 0:
            self.read(cbext)
        return s


def _biff_records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        opcode, ln = struct.unpack_from("<HH", stream, pos)
        yield opcode, stream[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


def read_xls(
    spark: SparkSession, path: str, sheet: int = 0, header: bool = True
) -> DataFrame:
    """S6 for the reference's real file format: legacy ``.xls`` (OLE2 +
    BIFF8), stdlib only.

    Parses the workbook globals substream (SST shared strings incl.
    CONTINUE-spanning strings, BOUNDSHEET sheet offsets) then the requested
    sheet's cell records: NUMBER, RK, MULRK, LABELSST, LABEL, and FORMULA
    numeric cached results.  All values surface as strings — the same
    all-string contract as :func:`read_xlsx` and the CSV readers (S1) — with
    typing applied downstream (``decode_serial_date_columns`` for the ERCOT
    serial-date column, 01/excel_csv.py:21-46; numeric casts for loads).
    """
    with open(path, "rb") as f:
        data = f.read()
    wb = _ole2_stream(data, ("Workbook", "Book"))

    sst: list[str] = []
    sheets: list[int] = []  # BOF offsets from BOUNDSHEET
    sst_payloads: list[bytes] = []
    n_unique = 0
    in_sst = False
    for opcode, payload, _pos in _biff_records(wb):
        if opcode == 0x00FC:  # SST: cstTotal u32, cstUnique u32, strings
            n_unique = struct.unpack_from("<I", payload, 4)[0]
            sst_payloads = [payload[8:]]
            in_sst = True
        elif opcode == 0x003C and in_sst:  # CONTINUE extends the SST
            sst_payloads.append(payload)
        elif opcode == 0x0085:  # BOUNDSHEET
            sheets.append(struct.unpack_from("<I", payload, 0)[0])
            in_sst = False
        elif opcode == 0x000A:  # EOF of globals substream
            break
        else:
            in_sst = False  # any other record terminates the SST run
    if sst_payloads:
        cur = _SSTCursor(sst_payloads)
        for _ in range(n_unique):
            sst.append(cur.read_string())
    if not sheets:
        raise ValueError("no BOUNDSHEET records (not a BIFF8 workbook?)")
    if sheet >= len(sheets):
        raise IndexError(f"sheet {sheet} out of range ({len(sheets)} sheets)")

    cells: dict[tuple[int, int], str | None] = {}
    for opcode, payload, _pos in _biff_records(wb, sheets[sheet]):
        if opcode == 0x000A:  # EOF of sheet substream
            break
        if opcode == 0x0203:  # NUMBER
            r, c, _ixfe, v = struct.unpack_from("<HHHd", payload)
            cells[(r, c)] = repr(v)
        elif opcode == 0x027E:  # RK
            r, c, _ixfe, rk = struct.unpack_from("<HHHI", payload)
            cells[(r, c)] = repr(_rk_value(rk))
        elif opcode == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from("<HH", payload)
            n = (len(payload) - 6) // 6
            for j in range(n):
                _ixfe, rk = struct.unpack_from("<HI", payload, 4 + 6 * j)
                cells[(r, c0 + j)] = repr(_rk_value(rk))
        elif opcode == 0x00FD:  # LABELSST
            r, c, _ixfe, isst = struct.unpack_from("<HHHI", payload)
            cells[(r, c)] = sst[isst]
        elif opcode == 0x0204:  # LABEL (inline BIFF8 string)
            r, c, _ixfe, cch, grbit = struct.unpack_from("<HHHHB", payload)
            raw = payload[9:]
            cells[(r, c)] = (
                raw[: 2 * cch].decode("utf-16-le")
                if grbit & 0x01
                else raw[:cch].decode("latin-1")
            )
        elif opcode == 0x0006:  # FORMULA: numeric cached result only
            r, c, _ixfe = struct.unpack_from("<HHH", payload)
            if struct.unpack_from("<H", payload, 12)[0] != 0xFFFF:
                cells[(r, c)] = repr(struct.unpack_from("<d", payload, 6)[0])

    if not cells:
        nrows = width = 0
    else:
        nrows = max(r for r, _ in cells) + 1
        width = max(c for _, c in cells) + 1
    table = [[cells.get((r, c)) for c in range(width)] for r in range(nrows)]
    if header and table:
        names = [h if h else f"_c{i}" for i, h in enumerate(table[0])]
        rows = table[1:]
    else:
        names = [f"_c{i}" for i in range(width)]
        rows = table
    schema = ", ".join(f"`{n}` string" for n in names)
    return spark.createDataFrame([tuple(r) for r in rows], schema=schema)
