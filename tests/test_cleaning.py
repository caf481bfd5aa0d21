"""Cleaning-DSL unit tests against the reference's golden fixtures
(FIXTURES.md §8; README.md:407-511 street transcript; 06/tags.py:56 key
classes; 03/audit.py:58-59 type sets; 03/name.py:55-57; 03/area.py:64-67;
03/location.py:48-49)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions import (
    classify_key,
    classify_value_type,
    clean_street_name,
    comma_int,
    excel_serial_to_timestamp,
    expand_paired_year_ranges,
    expand_year_range,
    extract_year,
    fix_area,
    name_with_fallback,
    null_sentinel,
    parse_multivalue_array,
    parse_osm_timestamp,
    point_consistent,
    strip_label_parens,
    strip_parenthetical,
)


def _apply(spark, values, expr_fn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r[0] for r in df.select(expr_fn(F.col("v")).alias("out")).collect()]


# -- C1/C2: street cleaning (README.md:407-511, 543-567 transcript) ----------
STREET_CASES = [
    ("Stevens Creek Blvd", "Stevens Creek Boulevard"),
    ("Saratoga Ave", "Saratoga Avenue"),
    ("N Blaney Ave", "North Blaney Avenue"),
    ("S. Park Victoria Dr", "South Park Victoria Drive"),
    ("E Estates Dr", "East Estates Drive"),
    ("W Homestead Rd", "West Homestead Road"),
    ("Miller Ave.", "Miller Avenue"),
    ("Bollinger Rd", "Bollinger Road"),
    ("Lawrence Expy", "Lawrence Expy"),  # not in mapping: unchanged
    ("Moorpark Avenue", "Moorpark Avenue"),  # already clean
    ("Prospect Ct", "Prospect Court"),
    ("Wolfe Pkwy", "Wolfe Parkway"),
    ("First St", "First Street"),
    ("De Anza Ln", "De Anza Lane"),
]


def test_clean_street_name(spark):
    got = _apply(spark, [c[0] for c in STREET_CASES], clean_street_name)
    assert got == [c[1] for c in STREET_CASES]


# -- C3: key classification (06/tags.py:56 golden counts) --------------------
def test_classify_key(spark):
    keys = ["highway", "addr:street", "name_1", "rail;road", "x y", "Amenity", "addr:street:1"]
    got = _apply(spark, keys, classify_key)
    # 'name_1' has a digit → not ^([a-z]|_)*$ → 'other' (tags.py:21-23)
    assert got == ["lower", "lower_colon", "other", "problemchars", "problemchars", "other", "other"]


# -- C4/C5: paren stripping ---------------------------------------------------
def test_strip_parens(spark):
    got = _apply(spark, ["BMW 3 (automobile) x"], lambda c: strip_parenthetical(c, "automobile"))
    assert got == ["BMW 3 x"]
    got2 = _apply(spark, ["Argiope (spider)", "Lycosa"], strip_label_parens)
    assert got2 == ["Argiope", "Lycosa"]


# -- C8: year extraction + validity (03/validity.py:37-41) -------------------
def test_extract_year(spark):
    got = _apply(spark, ["1995-01-01", "2020", "1700", "NULL", None], extract_year)
    assert got == [1995, None, None, None, None]


# -- C16/C17 ------------------------------------------------------------------
def test_null_sentinel_and_fallback(spark):
    assert _apply(spark, ["NULL", "", "x"], null_sentinel) == [None, None, "x"]
    df = spark.createDataFrame(
        [("Abc123", "L1"), (None, "L2"), ("*bad*", "L3")], "name string, label string"
    )
    got = [r[0] for r in df.select(name_with_fallback(F.col("name"), F.col("label"))).collect()]
    assert got == ["Abc123", "L2", "L3"]


# -- C18: location consistency (03/location.py:48-49) ------------------------
def test_point_consistent(spark):
    df = spark.createDataFrame(
        [
            ("33.08 75.28", "33.08", "75.28"),
            ("44.57833333333333 -91.21833333333333", "44.5783", "-91.2183"),
        ],
        "point string, lat string, lon string",
    )
    got = [
        r[0]
        for r in df.select(
            point_consistent(F.col("point"), F.col("lat"), F.col("lon"))
        ).collect()
    ]
    assert got == [True, False]


# -- C19: type audit sets (03/audit.py:58-59) --------------------------------
def test_classify_value_type_sets(spark):
    # areaLand-style column → {float, list, NoneType}
    vals = ["3.23e+07", "{5.5e+07|5.58e+07}", "NULL", "12", "hello", None, ""]
    got = _apply(spark, vals, classify_value_type)
    assert got == ["float", "list", "NoneType", "int", "str", "NoneType", "NoneType"]


# -- F6/C20: multi-value array + area fix (03/name.py:55-57; 03/area.py:64-67)
def test_parse_multivalue_array(spark):
    got = _apply(spark, ["NULL", "{Negtemiut|Nightmute}", "Kwigillingok"], parse_multivalue_array)
    assert got == [[], ["Negtemiut", "Nightmute"], ["Kwigillingok"]]


def test_fix_area(spark):
    got = _apply(spark, ["NULL", "{5.5e+07|5.58e+07}", "14581600.0", "20564500.0"], fix_area)
    assert got[0] is None
    assert got[1] == 5.58e07  # longest element wins ('5.58e+07' is longer)
    assert got[2] == 14581600.0 and got[3] == 20564500.0


# -- C11/C12 ------------------------------------------------------------------
def test_comma_int_and_timestamp(spark):
    assert _apply(spark, ["815,489", "4"], comma_int) == [815489, 4]
    got = _apply(spark, ["2012-09-21T10:28:26Z"], parse_osm_timestamp)
    assert got == [dt.datetime(2012, 9, 21, 10, 28, 26)]


# -- C15: Excel serial decode (01/excel_csv.py:39) ----------------------------
def test_excel_serial(spark):
    # 41275.0 == 2013-01-01 00:00; 41275.5 adds 12h
    got = _apply(spark, [41275.0, 41275.5], excel_serial_to_timestamp, in_type="double")
    assert got[0] == dt.datetime(2013, 1, 1, 0, 0)
    assert got[1] == dt.datetime(2013, 1, 1, 12, 0)


# -- F7: year-range expansion (04/autos.py:118-138) ---------------------------
def test_expand_year_range(spark):
    df = spark.createDataFrame([("1948", "1950"), ("1960", None)], "s string, e string")
    got = [r[0] for r in df.select(expand_year_range(F.col("s"), F.col("e"))).collect()]
    assert got == [[1948, 1949, 1950], []]


def test_expand_paired_year_ranges(spark):
    df = spark.createDataFrame(
        [([1948, 1960], [1950, 1961])],
        "s array<int>, e array<int>",
    )
    got = [r[0] for r in df.select(expand_paired_year_ranges(F.col("s"), F.col("e"))).collect()]
    assert got == [[1948, 1949, 1950, 1960, 1961]]
