"""Data-quality expectation checks — the constraint-audit stage every
production table pipeline runs before publishing (null fractions, key
uniqueness, referential integrity), in pure DataFrame algebra.

The reference audits its data ad hoc (type counts, problem-row scans:
SURVEY.md C19/§2.7); this module generalizes that into declarative
expectations evaluated in ONE pass per table plus one anti-join per
foreign-key rule:

- :func:`null_fractions` — per-column null/blank rates (one hash-agg scan).
- :func:`duplicate_keys` — rows whose declared key occurs more than once.
- :func:`fk_orphans` — child rows whose foreign key has no parent (the
  broadcast anti-join; at 100 TB the parent key set is a Bloom-filter or
  broadcast dim, exactly this plan shape).
- :func:`expectations_report` — the publishable summary: one row per rule
  with violation counts, integer-exact so it hash-verifies across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def null_fractions(df: DataFrame, *cols: str) -> DataFrame:
    """One-row frame: ``n_rows`` plus ``<col>_nulls`` per requested column
    (NULL or empty-string both count — ingest formats conflate them)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        is_bad = F.col(c).isNull() | (F.col(c).cast("string") == "")
        aggs.append(F.sum(is_bad.cast("long")).alias(f"{c}_nulls"))
    return df.agg(*aggs)


def duplicate_keys(df: DataFrame, *key_cols: str) -> DataFrame:
    """Keys violating uniqueness: ``(*key_cols, occurrences)`` with
    occurrences > 1 — one hash-aggregate, no self-join."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") > 1)
    )


def fk_orphans(child: DataFrame, fk_col: str, parent: DataFrame, pk_col: str) -> DataFrame:
    """Child rows whose ``fk_col`` has no matching parent ``pk_col`` —
    left-anti join; Catalyst broadcasts the parent key side when small
    (the dimension side of a star schema always is, relatively)."""
    keys = parent.select(F.col(pk_col).alias("__pk")).distinct()
    return child.join(keys, child[fk_col] == keys["__pk"], "left_anti")


def expectations_report(rules: list[tuple[str, DataFrame]]) -> DataFrame:
    """``(rule, violations)`` — one row per named rule, each counted from
    its violation frame.  Counts are independent aggregations unioned into
    one result: integer-exact, engine-reproducible, and each source frame
    keeps its own (already optimal) plan."""
    out = None
    for name, frame in rules:
        row = frame.agg(F.count(F.lit(1)).alias("violations")).select(
            F.lit(name).alias("rule"), "violations"
        )
        out = row if out is None else out.unionByName(row)
    return out
