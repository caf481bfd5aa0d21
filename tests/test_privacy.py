"""Planted-fixture tests for the PII detection/redaction operators
(operators/privacy.py), plus a DuckDB cross-check of the SQL twins on text
that actually contains every pattern (the testdata corpus is digit-run-only,
so the catalog query alone cannot exercise emails/phones/IPs)."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.privacy import (
    PII_PATTERNS,
    pii_count_sql,
    pii_counts,
    pii_profile,
    redact_pii,
    redact_pii_sql,
)

PLANTED = [
    (1, "contact alice.smith+work@example.co.uk for details"),
    (2, "call +1 555 123 4567 or 25-989-741-2988 today"),
    (3, "server at 192.168.10.1 responded"),
    (4, "account 123456789 was closed"),
    (5, "no personal data here at all"),
    (6, "mix: bob@x.io from 10.0.0.7 acct 99887766"),
    (7, ""),
]


def _planted_df(spark):
    return spark.createDataFrame(PLANTED, "id long, text string")


def test_redaction_replaces_each_pattern(spark):
    rows = {
        r.id: r.red
        for r in _planted_df(spark)
        .select("id", redact_pii(F.col("text")).alias("red"))
        .collect()
    }
    assert rows[1] == "contact <EMAIL> for details"
    assert rows[2] == "call <PHONE> or <PHONE> today"
    assert rows[3] == "server at <IP> responded"
    assert rows[4] == "account <ID> was closed"
    assert rows[5] == "no personal data here at all"  # untouched
    assert rows[6] == "mix: <EMAIL> from <IP> acct <ID>"
    assert rows[7] == ""


def test_counts_are_independent_per_pattern(spark):
    df = _planted_df(spark).select(
        "id", *[c.alias(f"n_{k}") for k, c in pii_counts(F.col("text")).items()]
    )
    got = {r.id: (r.n_email, r.n_ipv4, r.n_phone, r.n_id_number) for r in df.collect()}
    assert got[1] == (1, 0, 0, 0)
    assert got[2] == (0, 0, 2, 0)  # separators => phone, not id_number
    assert got[3] == (0, 1, 0, 0)
    assert got[4] == (0, 0, 0, 1)
    assert got[5] == (0, 0, 0, 0)
    assert got[6] == (1, 1, 0, 1)


def test_sql_twins_match_on_planted_text(spark):
    """The DuckDB fragments reproduce redaction and counts exactly on text
    containing every pattern — the parity the degenerate corpus can't show."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE planted (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO planted VALUES (?, ?)", PLANTED)
    count_cols = ", ".join(
        f"{pii_count_sql('text', name)} AS n_{name}" for name in PII_PATTERNS
    )
    duck_rows = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT id, {redact_pii_sql('text')} AS red, {count_cols} FROM planted"
        ).fetchall()
    }
    spark_rows = {
        r.id: (r.red, r.n_email, r.n_ipv4, r.n_phone, r.n_id_number)
        for r in _planted_df(spark)
        .select(
            "id",
            redact_pii(F.col("text")).alias("red"),
            *[c.alias(f"n_{k}") for k, c in pii_counts(F.col("text")).items()],
        )
        .collect()
    }
    assert duck_rows == spark_rows


def test_profile_aggregates_are_integer_exact(spark):
    df = _planted_df(spark).withColumn("grp", F.col("id") % 2)
    prof = {r.grp: r for r in pii_profile(df, "text", "grp").collect()}
    assert prof[0].n_rows == 3 and prof[1].n_rows == 4
    # group 0 = ids {2, 4, 6}: two 15-char phones -> <PHONE>(7), one 9-digit
    # id -> <ID>(4), and email/ip/id from the mixed row
    assert prof[0].chars_removed == (
        2 * (len("25-989-741-2988") - len("<PHONE>"))
        + (len("123456789") - len("<ID>"))
        + (len("bob@x.io") - len("<EMAIL>"))
        + (len("10.0.0.7") - len("<IP>"))
        + (len("99887766") - len("<ID>"))
    )


def test_redaction_plan_is_single_projection(spark):
    """The whole redact+count chain stays one codegen'd scan: no shuffle, no
    Python eval in the plan."""
    df = _planted_df(spark).select(
        redact_pii(F.col("text")).alias("red"),
        *[c.alias(f"n_{k}") for k, c in pii_counts(F.col("text")).items()],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
