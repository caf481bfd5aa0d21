"""Audit operators (SURVEY.md §2.4 A12, §2.7 C19): schema-inference type
audits and street-type frequency audits, as distributed aggregations.

The reference walks files row-by-row accumulating Python sets
(03-data-quality/audit.py:37-50; top-level audit.py:48-67); here each audit is
one groupBy over a stacked long-form projection — a single shuffle regardless
of column count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.cleaning import (
    classify_value_type,
)


def audit_types(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-field set of observed value types (03/audit.py:37-59).

    Returns ``(field, types)`` where types is the sorted comma-joined set of
    {NoneType,list,int,float,str} tags.  Implemented as unpivot (stack) →
    distinct per field (map-side combine collapses the bulk) → classify the
    distinct domain → set-agg, so the classification regexes run once per
    distinct value, not once per row.
    """
    # no spread(): distinct() map-side-combines off the scan, and the heavy
    # classify runs on the tiny distinct domain after the shuffle either
    # way — the up-front raw-row shuffle regressed the A/B (0.63s plain vs
    # 0.81s spread at sf0.1, n=5), same verdict as profile() below
    stacked = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot([], cols, "field", "value")
    return (
        stacked.distinct()
        .withColumn("type_tag", classify_value_type(F.col("value")))
        .groupBy("field")
        .agg(F.array_join(F.sort_array(F.collect_set("type_tag")), ",").alias("types"))
    )


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column profile: per column, row/null counts, exact distinct,
    lexicographic min/max (string domain), and the observed-type set — the
    lesson-03 quality audit generalized.

    Plan: unpivot to (field, value), pre-aggregate to (field, value, cnt) —
    map-side combine collapses the bulk before any wide shuffle — then a
    second aggregation over the (small) distinct domain computes every
    statistic.  Two narrow shuffles instead of one Expand-doubled pass
    (``countDistinct`` + other aggs forces Expand ×2 over N·|cols| rows), and
    the type-classification regex runs once per DISTINCT value, not per row.
    """
    # no spread() here: per-value pre-aggregation map-side-combines off the
    # scan; an up-front shuffle of the raw rows regressed the A/B (0.62s →
    # 1.28s at sf0.1) because the heavy classify runs on the distinct
    # domain AFTER the shuffle either way
    stacked = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot([], cols, "field", "value")
    per_value = stacked.groupBy("field", "value").agg(F.count(F.lit(1)).alias("cnt"))
    return per_value.groupBy("field").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(0)).alias("n_nulls"),
        F.count("value").alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.array_join(
            F.sort_array(F.collect_set(classify_value_type(F.col("value")))), ","
        ).alias("types"),
    )


def audit_street_types(df: DataFrame, street_col: str, expected: list[str]) -> DataFrame:
    """Street-type audit (top-level audit.py:18,48-67): extract the trailing
    token of each street name, keep those not in the expected list, and count
    occurrences per unexpected type."""
    token = F.regexp_extract(F.col(street_col), r"\b(\S+?)\.?$", 1)
    return (
        df.select(token.alias("street_type"))
        .filter(~F.col("street_type").isin(expected) & (F.col("street_type") != ""))
        .groupBy("street_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
