"""Planted-fixture tests for Unicode normalization (operators/normalize.py)
plus a DuckDB cross-check of the SQL twins on accented/decomposed text."""

from __future__ import annotations

import unicodedata

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.normalize import (
    normalize_text,
    normalize_text_sql,
)

COMPOSED = "café"                 # é as one codepoint
DECOMPOSED = "café"              # e + combining acute
PLANTED = [
    (1, COMPOSED),
    (2, DECOMPOSED),
    (3, "naïve résumé"),
    (4, "plain ascii"),
    (5, None),
    (6, "ctrl\x07chars\tkept\nnewline"),
]


def _df(spark):
    return spark.createDataFrame(PLANTED, "id long, text string")


def test_nfc_unifies_composed_and_decomposed(spark):
    rows = {r.id: r.text for r in normalize_text(_df(spark), "text").collect()}
    assert rows[1] == rows[2] == COMPOSED  # NFC composes
    assert rows[4] == "plain ascii"        # ASCII fixed point
    assert rows[5] is None                 # nulls pass through


def test_strip_accents_removes_marks(spark):
    rows = {
        r.id: r.text
        for r in normalize_text(_df(spark), "text", strip_accents=True).collect()
    }
    assert rows[1] == rows[2] == "cafe"
    assert rows[3] == "naive resume"


def test_scrub_controls_keeps_tab_newline(spark):
    rows = {
        r.id: r.text
        for r in normalize_text(_df(spark), "text", scrub_controls=True).collect()
    }
    assert rows[6] == "ctrlchars\tkept\nnewline"


def test_sql_twins_match_on_planted_text(spark):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE planted (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO planted VALUES (?, ?)", PLANTED)
    for strip in (False, True):
        duck = dict(
            con.execute(
                f"SELECT id, {normalize_text_sql('text', strip_accents=strip)} FROM planted"
            ).fetchall()
        )
        ours = {
            r.id: r.text
            for r in normalize_text(
                _df(spark), "text", strip_accents=strip
            ).collect()
        }
        assert duck == ours, f"strip_accents={strip}"


def test_dedup_motivation_fingerprints_unify(spark):
    """The reason normalization runs BEFORE fingerprinting: composed and
    decomposed spellings must collapse to one exact-dup group."""
    import pyspark.sql.functions as F

    df = normalize_text(_df(spark).filter("id in (1, 2)"), "text")
    fps = df.select(F.md5("text").alias("fp")).distinct().count()
    assert fps == 1
