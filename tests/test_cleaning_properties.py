"""Property-based tests (hypothesis) for the cleaning DSL: the Column
expressions must agree with straightforward Python models on arbitrary
inputs, not just the goldens.  Each example generates a batch of strings and
runs ONE Spark job over the batch (per-example jobs would be prohibitively
slow)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions import (
    STREET_MAPPING,
    classify_value_type,
    clean_street_name,
    comma_int,
    parse_multivalue_array,
)

# no 'n'/'i'/'f' (NaN/Infinity parse differences are not interesting here)
RAW_ALPHABET = "0123456789abce.-+{}| eE"

SETTINGS = settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _run_batch(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r["out"] for r in df.select(expr(F.col("raw")).alias("out")).collect()]


def _model_multivalue(s: str) -> list[str]:
    if s in ("NULL", ""):
        return []
    if s.startswith("{"):
        return re.sub(r"^\{|\}$", "", s).split("|")
    return [s]


@given(st.lists(st.text(RAW_ALPHABET, min_size=0, max_size=24), min_size=1, max_size=25))
@SETTINGS
def test_multivalue_array_matches_model(spark, batch):
    got = _run_batch(spark, batch, parse_multivalue_array)
    assert got == [_model_multivalue(s) for s in batch]


def _model_value_type(s: str) -> str:
    if s in ("NULL", ""):
        return "NoneType"
    if s.startswith("{"):
        return "list"
    if re.fullmatch(r"-?[0-9]+", s):
        if -(2**63) <= int(s) <= 2**63 - 1:
            return "int"
        return "float"  # bigint overflow → still double-castable
    try:
        float(s)
        return "float"
    except ValueError:
        return "str"


@given(st.lists(st.text(RAW_ALPHABET, min_size=0, max_size=24), min_size=1, max_size=25))
@SETTINGS
def test_value_type_classifier_matches_model(spark, batch):
    got = _run_batch(spark, batch, classify_value_type)
    assert got == [_model_value_type(s) for s in batch]


@given(
    st.lists(
        st.tuples(
            st.text("abcdefgh", min_size=1, max_size=8),
            st.sampled_from(sorted(STREET_MAPPING)),
        ),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_street_cleaning_canonicalizes_any_trailing_abbrev(spark, batch):
    # metamorphic: '<words> <abbrev>' → '<words> <full>' for every mapping
    # entry, regardless of the prefix (lowercase → no cardinal interference)
    raws = [f"{prefix} {abbrev}" for prefix, abbrev in batch]
    got = _run_batch(spark, raws, clean_street_name)
    want = [f"{prefix} {STREET_MAPPING[abbrev]}" for prefix, abbrev in batch]
    assert got == want
    # fixed point: a cleaned name never still ends in a bare abbreviation
    abbrev_tail = r"\b(" + "|".join(re.escape(a) for a in STREET_MAPPING) + r")$"
    assert not any(re.search(abbrev_tail, g) for g in got)


@given(st.lists(st.integers(min_value=-(10**15), max_value=10**15), min_size=1, max_size=25))
@SETTINGS
def test_comma_int_inverts_grouping(spark, batch):
    raws = [f"{n:,}" for n in batch]  # 1,234,567-style grouped rendering
    got = _run_batch(spark, raws, comma_int)
    assert got == batch


@given(
    st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@SETTINGS
def test_shingle_rows_agree_with_column_shingles(spark, texts):
    """The JVM-native row-based shingle builder (posexplode + window lead,
    operators/dedup._shingle_rows) must produce exactly the distinct shingle
    sets of the Column-expression operators/text.shingles on arbitrary
    texts — including short docs, repeated tokens, and empty strings."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        _shingle_rows,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import shingles

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    via_column = {
        r["doc_id"]: set(r["sh"])
        for r in df.select("doc_id", shingles(F.lower(F.col("text")), 3).alias("sh")).collect()
        if r["sh"]
    }
    rows = _shingle_rows(df, "text", "doc_id", 3).collect()
    via_rows: dict[int, set] = {}
    for r in rows:
        via_rows.setdefault(r["id"], set()).add(r["shingle"])
    assert via_rows == via_column
    # n_sh must equal the distinct set size on every row
    for r in rows:
        assert r["n_sh"] == len(via_rows[r["id"]])
