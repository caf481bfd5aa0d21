"""Data-quality expectation operators: planted violations must be counted
exactly."""

from __future__ import annotations

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.quality import (
    duplicate_keys,
    expectations_report,
    fk_orphans,
    null_fractions,
)


def test_null_fractions_counts_null_and_blank(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, ""), (4, "d")], "id long, v string"
    )
    row = null_fractions(df, "v").collect()[0]
    assert row.n_rows == 4 and row.v_nulls == 2


def test_duplicate_keys_flags_multiplicity(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (3,)], "k long"
    )
    got = {r.k: r.occurrences for r in duplicate_keys(df, "k").collect()}
    assert got == {2: 2, 3: 3}


def test_fk_orphans_left_anti(spark):
    child = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    got = [r.id for r in fk_orphans(child, "fk", parent, "pk").collect()]
    assert got == [3]


def test_expectations_report_one_row_per_rule(spark):
    child = spark.createDataFrame([(1, 10), (2, 99)], "id long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    rep = {
        r.rule: r.violations
        for r in expectations_report(
            [
                ("orphans", fk_orphans(child, "fk", parent, "pk")),
                ("dups", duplicate_keys(child, "id")),
            ]
        ).collect()
    }
    assert rep == {"orphans": 1, "dups": 0}


def test_null_fractions_multiple_columns_and_empty_frame(spark):
    df = spark.createDataFrame([(1, None, ""), (2, "x", "y")], "id long, a string, b string")
    row = null_fractions(df, "a", "b").collect()[0]
    assert (row.n_rows, row.a_nulls, row.b_nulls) == (2, 1, 1)
    empty = df.filter("id < 0")
    row = null_fractions(empty, "a").collect()[0]
    assert row.n_rows == 0 and row.a_nulls is None  # SUM over empty is NULL


def test_fk_orphans_null_fk_is_orphan(spark):
    child = spark.createDataFrame([(1, None), (2, 10)], "id long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    got = [r.id for r in fk_orphans(child, "fk", parent, "pk").collect()]
    assert got == [1]  # NULL fk never equi-matches -> surfaces as orphan
