"""Reference-faithful golden tests on FIXTURES.md-shaped data.

Each fixture mirrors a reference dataset's *shape* (self-authored rows, not
copies) and each test reproduces a cited reference query/assert through the
engine's docstore compiler + cleaning DSL — the lesson-05 golden-value
methodology (SURVEY.md §5) transposed onto this engine.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore import DocumentCollection
from data_wrangling_with_openstreetmap_and_mongodb_spark.functions import (
    classify_value_type,
    expand_paired_year_ranges,
    fix_area,
    is_valid_year,
    kg_to_tonnes,
    lower_enum,
    mm_to_meters,
    name_with_fallback,
    null_sentinel,
    parse_multivalue_array,
    point_consistent,
    strip_label_parens,
    strip_parenthetical,
)


# ---------------------------------------------------------------------------
# cities (FIXTURES.md §2 — 03-data-quality + lesson-05 aggregation queries)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def cities(spark):
    rows = [
        # (name_raw, country, isPartOf, lat, lon, population, areaLand_raw, point)
        ("Shahpur", "India", ["Uttar Pradesh"], 27.0, 79.0, 10000, "NULL", "27.0 79.0"),
        ("Shahpur", "India", ["Karnataka"], 16.7, 76.8, 20000, "3.23e+07", "16.7 76.8"),
        ("Kuju", "India", ["Jharkhand"], 23.7, 85.5, 30000, "{5.5e+07|5.58e+07}", "23.7 85.5"),
        ("Chennai", "India", ["Tamil Nadu"], 13.0, 80.2, 4646732, "1.755e+08", "13.0 80.2"),
        ("Madurai", "India", ["Tamil Nadu"], 9.9, 78.1, 1017865, "1.47e+08", "9.9 78.1"),
        ("Salem", "India", ["Tamil Nadu"], 11.6, 78.1, 829267, "9.1e+07", "11.6 78.2"),
        ("{Negtemiut|Nightmute}", "United States", ["Alaska"], 60.5, -164.7, 280, "NULL", "60.5 -164.7"),
    ]
    return spark.createDataFrame(
        rows,
        "name_raw string, country string, isPartOf array<string>, lat double, "
        "lon double, population long, areaLand_raw string, point string",
    )


class TestCitiesQueries:
    def test_most_common_city_name(self, cities):
        # 05/most_common_city_name.py:37-44,59-60: $match $exists → $group →
        # $sort → $limit; golden {'_id': 'Shahpur', 'count': N}
        coll = DocumentCollection(
            cities.withColumn("name", F.col("name_raw")), "cities"
        )
        out = coll.aggregate(
            [
                {"$match": {"name": {"$exists": True}}},
                {"$group": {"_id": "$name", "count": {"$sum": 1}}},
                {"$sort": {"count": -1}},
                {"$limit": 1},
            ]
        ).first()
        assert out["_id"] == "Shahpur" and out["count"] == 2

    def test_region_with_most_cities(self, cities):
        # 05/indian_regions_with_most_cities.py:30-40,53-54: $unwind before
        # $match (mongod reorders; Catalyst too) → golden (region, count)
        coll = DocumentCollection(cities, "cities")
        out = coll.aggregate(
            [
                {"$unwind": "$isPartOf"},
                {"$match": {"country": "India"}},
                {"$group": {"_id": "$isPartOf", "count": {"$sum": 1}}},
                {"$sort": {"count": -1, "_id": 1}},
                {"$limit": 1},
            ]
        ).first()
        assert (out["_id"], out["count"]) == ("Tamil Nadu", 3)

    def test_avg_city_pop_for_indian_regions(self, cities):
        # 05/avg_city_pop_for_indian_regions.py:36-43,56: $unwind → compound
        # avg; float tolerance 1e-8 per the reference's own assert
        coll = DocumentCollection(cities, "cities")
        rows = coll.aggregate(
            [
                {"$match": {"country": "India"}},
                {"$unwind": "$isPartOf"},
                {"$group": {"_id": "$isPartOf", "avg": {"$avg": "$population"}}},
            ]
        ).collect()
        got = {r["_id"]: r["avg"] for r in rows}
        expected = (4646732 + 1017865 + 829267) / 3.0
        assert abs(got["Tamil Nadu"] - expected) < 1e-8

    def test_two_level_avg_of_avgs(self, cities):
        # 05/avg_population.py:35-42,65: region-avg then country-avg
        coll = DocumentCollection(cities, "cities")
        inner = coll.aggregate(
            [
                {"$unwind": "$isPartOf"},
                {
                    "$group": {
                        "_id": {"country": "$country", "region": "$isPartOf"},
                        "avgCityPop": {"$avg": "$population"},
                    }
                },
            ]
        )
        outer = (
            DocumentCollection(inner, "inner")
            .aggregate(
                [
                    {
                        "$group": {
                            "_id": "$country",
                            "avgRegionalPop": {"$avg": "$avgCityPop"},
                        }
                    }
                ]
            )
            .collect()
        )
        got = {r["_id"]: r["avgRegionalPop"] for r in outer}

        # engine-defined float-avg semantics: exact sum at micro precision
        # (functions/detagg.py) — mirror it in the expected value
        def q6(x: float) -> float:
            import math

            return math.floor(x * 1e6 + 0.5) / 1e6

        tn = q6(4646732 + 1017865 + 829267) / 3.0
        india = (q6(10000) + q6(20000) + q6(30000) + q6(tn)) / 4.0
        assert abs(got["India"] - india) < 1e-8

    def test_lon_range_query(self, cities):
        # 05/region_cities.py:29-31: country + lon range $gte/$lte
        coll = DocumentCollection(cities, "cities")
        out = coll.find({"country": "India", "lon": {"$gte": 75.0, "$lte": 80.0}})
        assert out.count() == 4  # Shahpur(79), Chennai, Madurai, Salem

    def test_name_array_normalization(self, cities):
        # 03/name.py:48-57 goldens: NULL→[], {a|b}→[a,b], scalar→[scalar]
        rows = cities.select(
            parse_multivalue_array(F.col("name_raw")).alias("names")
        ).collect()
        flat = [r["names"] for r in rows]
        assert ["Negtemiut", "Nightmute"] in flat
        assert ["Shahpur"] in flat

    def test_area_fix_goldens(self, cities):
        # 03/area.py:57-67: keep the longest element then float; NULL→None
        got = {
            r["name_raw"]: r["area"]
            for r in cities.select(
                "name_raw", fix_area(F.col("areaLand_raw")).alias("area")
            ).collect()
        }
        assert got["Kuju"] == 5.58e07  # longest of {5.5e+07|5.58e+07}
        assert got["Shahpur"] is None or got["Shahpur"] == 3.23e07
        assert got["Chennai"] == 1.755e08

    def test_point_consistency(self, cities):
        # 03/location.py:47-49: exact string compare lat+' '+lon
        rows = cities.select(
            "name_raw",
            point_consistent(
                F.col("point"), F.col("lat").cast("string"), F.col("lon").cast("string")
            ).alias("ok"),
        ).collect()
        got = {r["name_raw"]: r["ok"] for r in rows}
        assert got["Chennai"] is True
        assert got["Salem"] is False  # point says 78.2, lon is 78.1

    def test_type_audit_sets(self, cities):
        # 03/audit.py:53-59: per-field observed-type sets
        tags = cities.select(classify_value_type(F.col("areaLand_raw")).alias("t"))
        got = {r["t"] for r in tags.collect()}
        assert got == {"NoneType", "list", "float"}


# ---------------------------------------------------------------------------
# autos (FIXTURES.md §3 — 04/autos.py processing + find queries)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def autos(spark):
    rows = [
        # name_raw, manufacturer, assembly, bodyStyle_raw, width_raw, weight_raw,
        # modelStart_raw, modelEnd_raw, productionStartYear_raw
        ("Porsche 928 (automobile)", "Porsche", ["Germany"], " Coupe ", "0.0019", "1450", "{1978|1992}", "{1982|1995}", "1978"),
        ("Quattroporte", "Maserati", ["Italy"], "Sedan", "1.895", "1900", "1963", "1969", "1963"),
        ("Veyron", "Bugatti", ["France", "Germany"], "COUPE", "1.998", "1888", "2005", "2015", "2005"),
        ("Elise", "Lotus", ["United Kingdom"], "roadster", "1.72", "860", "1996", "2021", "1996"),
        ("Unknown", "Mystery", ["Atlantis"], "pod", "2.6", "99999", "NULL", "NULL", "1820"),
    ]
    return spark.createDataFrame(
        rows,
        "name_raw string, manufacturer string, assembly array<string>, "
        "bodyStyle_raw string, width_raw string, weight_raw string, "
        "modelStart_raw string, modelEnd_raw string, productionStartYear_raw string",
    )


class TestAutosProcessing:
    def test_strip_automobile_suffix(self, autos):
        # 04/autos.py:44-48
        got = autos.select(
            strip_parenthetical(F.col("name_raw"), "automobile").alias("name")
        ).collect()
        assert "Porsche 928" in {r["name"] for r in got}

    def test_find_porsche_projection(self, autos):
        # 04/find_porsche.py:17 + 04/find_cars.py:34 projection
        coll = DocumentCollection(autos, "autos")
        out = coll.find({"manufacturer": "Porsche"}, {"name_raw": 1, "_id": 0})
        assert out.columns == ["name_raw"]
        assert out.count() == 1

    def test_in_membership_on_array_field(self, autos):
        # 04/find_cars.py:16: $in against array-valued assembly —
        # scalar-or-member semantics (SURVEY.md P7)
        coll = DocumentCollection(autos, "autos")
        out = coll.find(
            {"assembly": {"$in": ["Germany", "United Kingdom", "Japan"]}}
        )
        assert out.count() == 3  # Porsche, Veyron, Elise

    def test_dot_path_gt_on_nested(self, spark, autos):
        # 04/dot_find.py:18: dimensions.width > 2.5 via dot path
        dims = autos.select(
            "name_raw",
            F.struct(
                mm_to_meters(F.col("width_raw").cast("double")).alias("width"),
                kg_to_tonnes(F.col("weight_raw").cast("double")).alias("weight"),
            ).alias("dimensions"),
        )
        coll = DocumentCollection(dims, "autos")
        out = coll.find({"dimensions.width": {"$gt": 2.5}})
        assert {r["name_raw"] for r in out.collect()} == {"Unknown"}

    def test_unit_normalization_quirk(self, autos):
        # 04/autos.py:59-69: width < 0.01 → ×1000 (the reference's own rule)
        got = {
            r["name_raw"]: r["w"]
            for r in autos.select(
                "name_raw",
                mm_to_meters(F.col("width_raw").cast("double")).alias("w"),
            ).collect()
        }
        assert got["Porsche 928 (automobile)"] == pytest.approx(1.9)
        assert got["Quattroporte"] == 1.895  # untouched

    def test_paired_year_range_expansion(self, autos):
        # 04/autos.py:118-138: paired {start|...} {end|...} arrays expand
        # per-index to inclusive ranges
        out = autos.select(
            "name_raw",
            expand_paired_year_ranges(
                parse_multivalue_array(F.col("modelStart_raw")),
                parse_multivalue_array(F.col("modelEnd_raw")),
            ).alias("years"),
        ).collect()
        got = {r["name_raw"]: r["years"] for r in out}
        porsche = got["Porsche 928 (automobile)"]
        assert porsche[:3] == [1978, 1979, 1980] and 1995 in porsche
        assert got["Quattroporte"] == list(range(1963, 1970))
        assert got["Unknown"] == []

    def test_good_bad_year_validity(self, autos):
        # 03/validity.py:26-44: 1886–2014 range gate
        good = autos.filter(is_valid_year(F.col("productionStartYear_raw")))
        bad = autos.filter(~is_valid_year(F.col("productionStartYear_raw")))
        assert good.count() == 4 and bad.count() == 1

    def test_enum_lowering(self, autos):
        got = {
            r["b"]
            for r in autos.select(lower_enum(F.col("bodyStyle_raw")).alias("b")).collect()
        }
        assert "coupe" in got and "sedan" in got


# ---------------------------------------------------------------------------
# arachnid (FIXTURES.md §4 — 04/processing.py + update.py enrichment join)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def arachnid(spark):
    rows = [
        ("Argiope (spider)", "argiope", "{Argiope|Argiopes}", "Araneidae"),
        ("Theridiidae", "NULL", "NULL", "Theridiidae"),
        ("Loxosceles", "lox0sceles!", "Loxosceles", "Sicariidae"),
    ]
    return spark.createDataFrame(
        rows, "label_raw string, name_raw string, synonym_raw string, family string"
    )


class TestArachnidProcessing:
    def test_label_paren_strip_and_name_fallback(self, arachnid):
        # 04/processing.py:79-84: strip parens; name NULL/non-alnum → label
        out = arachnid.select(
            strip_label_parens(F.col("label_raw")).alias("label"),
            name_with_fallback(
                null_sentinel(F.col("name_raw")),
                strip_label_parens(F.col("label_raw")),
            ).alias("name"),
        ).collect()
        got = {r["label"]: r["name"] for r in out}
        assert got["Argiope"] == "argiope"
        assert got["Theridiidae"] == "Theridiidae"  # NULL → label
        assert got["Loxosceles"] == "Loxosceles"  # non-alnum → label

    def test_synonym_normalization(self, arachnid):
        # 04/processing.py:93-97: {a|b}→[a,b], NULL→[], scalar→[x]
        got = [
            r["syn"]
            for r in arachnid.select(
                parse_multivalue_array(F.col("synonym_raw")).alias("syn")
            ).collect()
        ]
        assert ["Argiope", "Argiopes"] in got and [] in got and ["Loxosceles"] in got

    def test_enrichment_update_golden(self, spark, arachnid):
        # 04/update.py:56-94: build label→authority dict, update matched docs
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.upsert import (
            merge_update,
        )

        target = arachnid.select(
            strip_label_parens(F.col("label_raw")).alias("label"),
            F.lit(None).cast("string").alias("binomialAuthority"),
        )
        updates = spark.createDataFrame(
            [("Argiope", "Audouin, 1826")], ["label", "authority"]
        )
        out = merge_update(
            target, updates, "label", {"binomialAuthority": "authority"}
        )
        got = {r["label"]: r["binomialAuthority"] for r in out.collect()}
        assert got == {
            "Argiope": "Audouin, 1826",
            "Theridiidae": None,
            "Loxosceles": None,
        }


# ---------------------------------------------------------------------------
# hourly_load (FIXTURES.md §6 — ERCOT wide time series, 01/excel_csv.py)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def hourly_load(spark):
    base = datetime.datetime(2013, 1, 1)
    rows = []
    for h in range(48):
        ts = base + datetime.timedelta(hours=h)
        rows.append((ts, 10000.0 + h * 7, 5000.0 + ((h * 13) % 29) * 100))
    # plant known maxima: COAST peaks at the last hour, EAST mid-series
    rows[30] = (base + datetime.timedelta(hours=30), 10000.0 + 30 * 7, 9999.9)
    return spark.createDataFrame(rows, "ts timestamp, COAST double, EAST double")


class TestHourlyLoadWideSeries:
    def test_unpivot_max_and_argmax_time(self, hourly_load):
        # 01/excel_csv.py:34-44 loop-over-region-columns → melt + max/max_by;
        # golden: per-region max load AND the hour it occurred (A10+A11)
        long = hourly_load.unpivot(
            ids=["ts"], values=["COAST", "EAST"],
            variableColumnName="Station", valueColumnName="Load",
        )
        got = {
            r["Station"]: (r["MaxLoad"], r["MaxTime"])
            for r in long.groupBy("Station")
            .agg(
                F.max("Load").alias("MaxLoad"),
                F.max_by("ts", "Load").alias("MaxTime"),
            )
            .collect()
        }
        assert got["COAST"][0] == pytest.approx(10000.0 + 47 * 7, abs=0.1)
        assert got["COAST"][1] == datetime.datetime(2013, 1, 2, 23, 0)
        assert got["EAST"][0] == 9999.9
        assert got["EAST"][1] == datetime.datetime(2013, 1, 2, 6, 0)

    def test_global_stats_with_argminmax(self, hourly_load):
        # 01/ercot_coast_stats.py:22-81: min/max/avg + when they occurred
        r = hourly_load.agg(
            F.min("COAST").alias("lo"),
            F.max("COAST").alias("hi"),
            F.avg("COAST").alias("mean"),
            F.min_by("ts", "COAST").alias("lo_at"),
            F.max_by("ts", "COAST").alias("hi_at"),
        ).first()
        assert r["lo"] == 10000.0 and r["lo_at"] == datetime.datetime(2013, 1, 1)
        assert r["hi_at"] == datetime.datetime(2013, 1, 2, 23, 0)
        expected_mean = sum(10000.0 + h * 7 for h in range(48)) / 48
        assert abs(r["mean"] - expected_mean) < 1e-8


# ---------------------------------------------------------------------------
# tweets (FIXTURES.md §5 — lesson-05 nested-doc queries)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tweets(spark):
    rows = [
        ("t1", "web", ("behindertenpar", "Brasilia", 121, 17209)),
        ("t2", "web", ("alice", "Brasilia", 250, 300)),
        ("t3", "Ubertwitter", ("bob", "Brasilia", 90, 5000)),
        ("t4", "web", ("alice", "Brasilia", 250, 300)),
        ("t5", "txt", ("carol", None, 10, 50)),
    ]
    return spark.createDataFrame(
        rows,
        "text string, source string, "
        "user struct<screen_name:string, time_zone:string, "
        "statuses_count:int, followers_count:int>",
    )


class TestTweetsQueries:
    def test_tweet_sources_top1(self, tweets):
        # 05/tweet_apps.py:33-48 golden {'count': N, '_id': 'web'}
        coll = DocumentCollection(tweets, "tweets")
        out = coll.aggregate(
            [
                {"$group": {"_id": "$source", "count": {"$sum": 1}}},
                {"$sort": {"count": -1}},
                {"$limit": 1},
            ]
        ).first()
        assert (out["_id"], out["count"]) == ("web", 3)

    def test_most_followed_brasilian(self, tweets):
        # 05/most_followed_brasilians.py:41-47,60-61: nested $match +
        # computed $project + $sort desc; golden followers == 17209
        coll = DocumentCollection(tweets, "tweets")
        out = coll.aggregate(
            [
                {
                    "$match": {
                        "user.time_zone": "Brasilia",
                        "user.statuses_count": {"$gte": 100},
                    }
                },
                {
                    "$project": {
                        "followers": "$user.followers_count",
                        "screen_name": "$user.screen_name",
                        "tweets": "$user.statuses_count",
                    }
                },
                {"$sort": {"followers": -1}},
                {"$limit": 1},
            ]
        ).first()
        assert out["followers"] == 17209
        assert out["screen_name"] == "behindertenpar"

    def test_frequent_tweeters_push(self, tweets):
        # 05/frequent_tweeters.py:36-40: $push collects all texts per user
        coll = DocumentCollection(tweets, "tweets")
        rows = coll.aggregate(
            [
                {
                    "$group": {
                        "_id": "$user.screen_name",
                        "count": {"$sum": 1},
                        "tweet_texts": {"$push": "$text"},
                    }
                },
                {"$sort": {"count": -1, "_id": 1}},
                {"$limit": 5},
            ]
        ).collect()
        top = rows[0]
        assert top["_id"] == "alice" and sorted(top["tweet_texts"]) == ["t2", "t4"]
        # structural assert like the reference's result[0] > result[4]
        assert rows[0]["count"] >= rows[-1]["count"]
