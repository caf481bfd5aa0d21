"""Docstore (Mongo find/aggregate surface) tests on reference-shaped fixtures.

Fixtures mirror FIXTURES.md §3–§5 (autos / cities / tweets); the queries are
the reference's own (cited per test), re-run through the compiler.
"""

from __future__ import annotations

import datetime as dt

import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore import DocumentCollection


@pytest.fixture(scope="module")
def autos(spark):
    rows = [
        ("Porsche 356", "Porsche", ["Germany"], {"width": 1.7, "length": 4.0}),
        ("Porsche 911", "Porsche", ["Germany", "Finland"], {"width": 2.6, "length": 4.5}),
        ("Ford Focus", "Ford Motor Company", ["United States"], {"width": 2.7, "length": 4.3}),
        ("Mini", "BMW", ["United Kingdom"], {"width": 1.9, "length": 3.8}),
        ("Civic", "Honda", ["Japan", "United States"], {"width": 2.4, "length": 4.4}),
    ]
    df = spark.createDataFrame(
        rows, "name string, manufacturer string, assembly array<string>, dimensions struct<width:double,length:double>"
    )
    return DocumentCollection(df, "autos")


@pytest.fixture(scope="module")
def tweets(spark):
    rows = [
        ("hello", "web", ("alice", "Brasilia", 120, 1000)),
        ("hi", "web", ("bob", "Brasilia", 80, 5000)),
        ("yo", "Ubertwitter", ("alice", "Brasilia", 120, 1000)),
        ("sup", "web", ("carol", None, 300, 17209)),
        ("hey", "TweetDeck", ("dave", "Lisbon", 50, 10)),
    ]
    df = spark.createDataFrame(
        rows,
        "text string, source string, user struct<screen_name:string,time_zone:string,statuses_count:int,followers_count:int>",
    )
    return DocumentCollection(df, "tweets")


@pytest.fixture(scope="module")
def cities(spark):
    rows = [
        ("Shahpur", "India", ["Uttar Pradesh"], 3000.0),
        ("Shahpur", "India", ["Karnataka"], 10000.0),
        ("Madrid", "Spain", ["Community of Madrid"], 320000.0),
        ("Salem", "India", ["Tamil Nadu"], 82000.0),
        ("Salem", "United States", ["Oregon"], 15000.0),
        (None, "India", ["Tamil Nadu"], 1000.0),
    ]
    df = spark.createDataFrame(
        rows, "name string, country string, isPartOf array<string>, population double"
    )
    return DocumentCollection(df, "cities")


# -- find surface (04-working-with-mongodb) ---------------------------------
def test_find_equality_projection(autos):
    # find({'manufacturer':'Porsche'}, {'name':1,'_id':0}) — 04/find_porsche.py:17
    got = {r["name"] for r in autos.find({"manufacturer": "Porsche"}, {"name": 1, "_id": 0}).collect()}
    assert got == {"Porsche 356", "Porsche 911"}


def test_find_in_array_semantics(autos):
    # find({'assembly': {'$in': ['Germany','United Kingdom','Japan']}}) —
    # 04/find_cars.py:16; assembly is an array → scalar-or-member match
    got = {r["name"] for r in autos.find({"assembly": {"$in": ["Germany", "United Kingdom", "Japan"]}}).collect()}
    assert got == {"Porsche 356", "Porsche 911", "Mini", "Civic"}


def test_find_dot_path_gt(autos):
    # find({'dimensions.width': {'$gt': 2.5}}) — 04/dot_find.py:18
    got = {r["name"] for r in autos.find({"dimensions.width": {"$gt": 2.5}}).collect()}
    assert got == {"Porsche 911", "Ford Focus"}


def test_find_exists_and_count(cities):
    # $exists guard — 05/most_common_city_name.py:39; count — README.md:868
    assert cities.count({"name": {"$exists": True}}) == 5
    assert cities.count({"name": {"$exists": False}}) == 1


def test_find_one_and_distinct(tweets):
    row = tweets.find_one({"source": "web", "user.followers_count": {"$gte": 17209}})
    assert row is not None and row["user"]["screen_name"] == "carol"
    assert sorted(tweets.distinct("source")) == ["TweetDeck", "Ubertwitter", "web"]


def test_find_logical_and_regex(autos):
    got = autos.find(
        {"$or": [{"manufacturer": "BMW"}, {"name": {"$regex": "^Civ"}}]}
    ).count()
    assert got == 2
    got2 = autos.find({"manufacturer": {"$ne": "Porsche"}, "dimensions.length": {"$lt": 4.35}}).count()
    assert got2 == 2  # Ford Focus (4.3), Mini (3.8)


# -- aggregate surface (05-analyzing-data) -----------------------------------
def test_pipeline_tweet_sources(tweets):
    # make_pipeline: [{$group: {_id:'$source', count:{$sum:1}}}, {$sort:...}] —
    # 05/tweet_apps.py:33-35
    out = tweets.aggregate(
        [{"$group": {"_id": "$source", "count": {"$sum": 1}}}, {"$sort": {"count": -1}}, {"$limit": 1}]
    ).collect()
    assert out[0]["_id"] == "web" and out[0]["count"] == 3


def test_pipeline_most_common_city_name(cities):
    # 05/most_common_city_name.py:37-44 golden shape {'_id':'Shahpur','count':N}
    out = cities.aggregate(
        [
            {"$match": {"name": {"$exists": True}}},
            {"$group": {"_id": "$name", "count": {"$sum": 1}}},
            {"$sort": {"count": -1}},
            {"$limit": 1},
        ]
    ).collect()
    assert out[0]["_id"] in ("Shahpur", "Salem") and out[0]["count"] == 2


def test_pipeline_unwind_region(cities):
    # 05/region_cities.py:27-37: $match India + $unwind isPartOf + $group
    out = {
        r["_id"]: r["count"]
        for r in cities.aggregate(
            [
                {"$match": {"country": "India"}},
                {"$unwind": "$isPartOf"},
                {"$group": {"_id": "$isPartOf", "count": {"$sum": 1}}},
            ]
        ).collect()
    }
    assert out == {"Uttar Pradesh": 1, "Karnataka": 1, "Tamil Nadu": 2}


def test_unwind_options_preserve_and_index(spark):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], "id long, xs array<string>"
    )
    # default: empty/null docs dropped
    plain = aggregate(df, [{"$unwind": "$xs"}]).collect()
    assert sorted((r["id"], r["xs"]) for r in plain) == [(1, "a"), (1, "b")]
    # preserveNullAndEmptyArrays keeps docs 2 and 3 with a null element
    kept = aggregate(df, [{"$unwind": {
        "path": "$xs", "preserveNullAndEmptyArrays": True}}]).collect()
    assert sorted([(r["id"], r["xs"]) for r in kept], key=str) == sorted(
        [(1, "a"), (1, "b"), (2, None), (3, None)], key=str)
    # includeArrayIndex exposes the 0-based position (null when preserved)
    idx = aggregate(df, [{"$unwind": {
        "path": "$xs", "includeArrayIndex": "i",
        "preserveNullAndEmptyArrays": True}}]).collect()
    got = sorted(((r["id"], r["xs"], r["i"]) for r in idx), key=str)
    assert got == sorted(
        [(1, "a", 0), (1, "b", 1), (2, None, None), (3, None, None)], key=str)


def test_pipeline_two_level_avg(cities):
    # 05/avg_population.py:35-42: avg of per-(country,region) avgs
    out = cities.aggregate(
        [
            {"$unwind": "$isPartOf"},
            {
                "$group": {
                    "_id": {"country": "$country", "region": "$isPartOf"},
                    "avgCityPop": {"$avg": "$population"},
                }
            },
            {
                "$group": {
                    "_id": "$country",
                    "avgRegionalPop": {"$avg": "$avgCityPop"},
                }
            },
        ]
    ).collect()
    got = {r["_id"]: r["avgRegionalPop"] for r in out}
    # India: UP avg 3000, Karnataka 10000, Tamil Nadu (82000+1000)/2=41500 → 18166.66
    assert abs(got["India"] - (3000 + 10000 + 41500) / 3) < 1e-8


def test_pipeline_project_computed(tweets):
    # $project rename from nested paths — 05/most_followed_brasilians.py:41-47
    out = tweets.aggregate(
        [
            {"$match": {"user.time_zone": "Brasilia", "user.statuses_count": {"$gte": 100}}},
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
    ).collect()
    assert out[0].asDict() == {"followers": 1000, "screen_name": "alice", "tweets": 120}


def test_pipeline_push_addtoset(tweets):
    # $push tweet texts per user — 05/frequent_tweeters.py:36-40
    out = tweets.aggregate(
        [
            {"$group": {"_id": "$user.screen_name", "count": {"$sum": 1}, "tweet_texts": {"$push": "$text"}}},
            {"$sort": {"count": -1}},
            {"$limit": 5},
        ]
    ).collect()
    top = out[0]
    assert top["_id"] == "alice" and sorted(top["tweet_texts"]) == ["hello", "yo"]


def test_pipeline_dayofweek_and_datetime_subtract(spark):
    # $dayOfWeek histogram + $subtract datetimes → ms (README.md:1202-1242)
    df = spark.createDataFrame(
        [(dt.datetime(2016, 1, 3),), (dt.datetime(2016, 1, 4),), (dt.datetime(2016, 1, 10),)],
        "ts timestamp",
    )
    coll = DocumentCollection(df)
    out = {
        r["_id"]: r["count"]
        for r in coll.aggregate(
            [{"$group": {"_id": {"$dayOfWeek": "$ts"}, "count": {"$sum": 1}}}]
        ).collect()
    }
    assert out == {1: 2, 2: 1}  # two Sundays, one Monday
    age = coll.aggregate(
        [
            {
                "$project": {
                    "ageMs": {"$subtract": [{"$literal": dt.datetime(2016, 1, 11)}, "$ts"]},
                }
            },
            {"$group": {"_id": None, "maxAge": {"$max": "$ageMs"}}},
        ]
    ).collect()[0]
    assert age["maxAge"] == 8 * 86400 * 1000  # 8 days in ms


def test_update_from_enrichment_join(spark):
    # 04/update.py:56-76: {label → binomialAuthority} dict applied as upsert
    base = spark.createDataFrame(
        [
            ("Argiope", ("Araneidae", None)),
            ("Lycosa", ("Lycosidae", "Latreille")),
        ],
        "label string, classification struct<family:string,binomialAuthority:string>",
    )
    updates = spark.createDataFrame(
        [("Argiope", "Audouin")], "label string, binomialAuthority string"
    )
    coll = DocumentCollection(base).update_from(
        updates, on="label", set_map={"classification.binomialAuthority": "binomialAuthority"}
    )
    got = {r["label"]: r["classification"]["binomialAuthority"] for r in coll.df.collect()}
    assert got == {"Argiope": "Audouin", "Lycosa": "Latreille"}


def test_pipeline_lookup_join(spark):
    # $lookup (Mongo 3.2 join stage): matches collect into an array of
    # structs; unmatched docs get an empty array
    orders = DocumentCollection(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "order_id long, item string"
        ),
        "orders",
    )
    inventory = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "sku string, qty int"
    )
    out = orders.aggregate(
        [
            {
                "$lookup": {
                    "from": inventory,
                    "localField": "item",
                    "foreignField": "sku",
                    "as": "stock",
                }
            }
        ]
    )
    got = {r["order_id"]: sorted((s["sku"], s["qty"]) for s in r["stock"]) for r in out.collect()}
    assert got == {1: [("a", 10), ("a", 20)], 2: [("b", 5)], 3: []}


def test_pipeline_add_fields(spark):
    # $addFields/$set: computed columns join the document without a $project
    coll = DocumentCollection(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, price double"),
        "items",
    )
    out = coll.aggregate(
        [
            {"$addFields": {"taxed": {"$multiply": ["$price", 1.1]}}},
            {"$match": {"taxed": {"$gt": 15.0}}},
        ]
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["id"] == 2
    assert set(out.columns) == {"id", "price", "taxed"}


def test_pipeline_sample_exact_size_and_lazy(spark):
    # $sample must return exactly `size` docs (rand-rank + limit, not a
    # fraction sample) and compile without running any job
    coll = DocumentCollection(
        spark.createDataFrame([(i,) for i in range(100)], "id long"), "nums"
    )
    out = coll.aggregate([{"$sample": {"size": 7}}])
    assert out.columns == ["id"]  # helper column dropped
    rows = out.collect()
    assert len(rows) == 7
    assert len({r["id"] for r in rows}) == 7  # no replacement
    # deterministic under the fixed seed
    again = coll.aggregate([{"$sample": {"size": 7}}]).collect()
    assert {r["id"] for r in rows} == {r["id"] for r in again}


class TestPipelineStageExtensions:
    """$bucket / $facet / $sortByCount / $unionWith / $replaceRoot — the
    aggregation stages a reference user reaches for next."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                ("a", 5.0, "x", ("s1", 1)),
                ("b", 15.0, "y", ("s2", 2)),
                ("c", 25.0, "x", ("s1", 3)),
                ("d", 45.0, "x", ("s3", 4)),
            ],
            "name string, price double, kind string, "
            "meta struct<src: string, n: long>",
        )

    def test_bucket_with_default_and_output(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        out = aggregate(
            self._docs(spark),
            [
                {
                    "$bucket": {
                        "groupBy": "$price",
                        "boundaries": [0, 10, 20],
                        "default": "other",
                        "output": {
                            "count": {"$sum": 1},
                            "max_price": {"$max": "$price"},
                        },
                    }
                }
            ],
        )
        got = {r["_id"]: (r["count"], r["max_price"]) for r in out.collect()}
        assert got == {"0": (1, 5.0), "10": (1, 15.0), "other": (2, 45.0)}

    def test_bucket_without_default_errors_on_out_of_range(self, spark):
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        out = aggregate(
            self._docs(spark),
            [{"$bucket": {"groupBy": "$price", "boundaries": [0, 10, 20]}}],
        )
        with pytest.raises(Exception, match="outside boundaries"):
            out.collect()

    def test_n_ary_accumulators(self, spark):
        """$minN/$maxN/$topN/$bottomN/$top/$bottom — Mongo 5.2 group
        accumulators as one hash-agg + array ops (no window)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", "x", 3.0), ("a", "y", 1.0), ("a", "z", 4.0), ("a", "w", 1.5),
             ("b", "p", 9.0), ("b", "q", 7.0)],
            "grp string, name string, score double",
        )
        out = aggregate(
            df.orderBy("name"),  # pin arrival order for firstN
            [{"$group": {
                "_id": "$grp",
                "lo2": {"$minN": {"input": "$score", "n": 2}},
                "hi2": {"$maxN": {"input": "$score", "n": 2}},
                "first2": {"$firstN": {"input": "$name", "n": 2}},
                "best": {"$top": {"output": "$name", "sortBy": {"score": -1}}},
                "best2": {"$topN": {"output": "$name", "sortBy": {"score": -1}, "n": 2}},
                "worst2": {"$bottomN": {"output": "$name", "sortBy": {"score": -1}, "n": 2}},
            }}],
        )
        got = {r["_id"]: r for r in out.collect()}
        a, b = got["a"], got["b"]
        assert list(a["lo2"]) == [1.0, 1.5] and list(a["hi2"]) == [4.0, 3.0]
        assert list(b["lo2"]) == [7.0, 9.0] and list(b["hi2"]) == [9.0, 7.0]
        assert list(a["first2"]) == ["w", "x"]
        assert a["best"] == "z" and list(a["best2"]) == ["z", "x"]
        # bottomN: the LAST n of the sortBy order, presented in sort order
        assert list(a["worst2"]) == ["w", "y"]
        assert b["best"] == "p" and list(b["worst2"]) == ["p", "q"]

    def test_topn_invalid_direction_raises(self, spark):
        """Mixed ±1 directions are supported since r7 (comparator sort);
        directions OUTSIDE {1, -1} still raise."""
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([("a", 1.0, 2.0)], "g string, x double, y double")
        with pytest.raises(ValueError, match="directions must be 1/-1"):
            aggregate(df, [{"$group": {"_id": "$g",
                "t": {"$topN": {"output": "$x", "sortBy": {"x": 1, "y": 0}, "n": 2}}}}])

    def test_bucket_rejects_duplicate_boundaries(self, spark):
        """Non-strict ascent must error like mongod, not create a silent
        unreachable [lo, lo) bucket."""
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        with pytest.raises(ValueError, match="strictly ascending"):
            aggregate(
                self._docs(spark),
                [{"$bucket": {"groupBy": "$price", "boundaries": [0, 10, 10, 20]}}],
            )

    def test_sort_by_count(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        out = aggregate(self._docs(spark), [{"$sortByCount": "$kind"}]).collect()
        assert [(r["_id"], r["count"]) for r in out] == [("x", 3), ("y", 1)]

    def test_facet_runs_subpipelines_over_same_input(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        [row] = aggregate(
            self._docs(spark),
            [
                {
                    "$facet": {
                        "by_kind": [{"$sortByCount": "$kind"}],
                        "cheap": [
                            {"$match": {"price": {"$lt": 20}}},
                            {"$project": {"name": 1}},
                        ],
                    }
                }
            ],
        ).collect()
        assert [(d["_id"], d["count"]) for d in row["by_kind"]] == [("x", 3), ("y", 1)]
        assert sorted(d["name"] for d in row["cheap"]) == ["a", "b"]

    def test_union_with_pipeline(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        extra = spark.createDataFrame([{"name": "z", "price": 99.0, "kind": "y"}])
        out = aggregate(
            self._docs(spark),
            [
                {"$project": {"name": 1, "kind": 1}},
                {"$unionWith": {"coll": extra, "pipeline": [{"$project": {"name": 1, "kind": 1}}]}},
                {"$sortByCount": "$kind"},
            ],
        ).collect()
        assert [(r["_id"], r["count"]) for r in out] == [("x", 3), ("y", 2)]

    def test_replace_root_promotes_nested_doc(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        out = aggregate(
            self._docs(spark), [{"$replaceRoot": {"newRoot": "$meta"}}]
        )
        assert sorted(out.columns) == ["n", "src"]
        assert out.count() == 4


class TestDensifyFill:
    """$densify + $fill — Mongo's own gap-fill stages, compiled onto the
    same spine/LOCF machinery as operators/events.gap_fill_locf."""

    def _series(self, spark):
        return spark.createDataFrame(
            [
                ("a", 0, 10.0),
                ("a", 3, 40.0),
                ("b", 1, 7.0),
            ],
            "k string, t long, v double",
        )

    def test_densify_partition_bounds(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        out = aggregate(
            self._series(spark),
            [
                {
                    "$densify": {
                        "field": "t",
                        "range": {"step": 1, "bounds": "partition", "partitionByFields": ["k"]},
                    }
                }
            ],
        )
        got = sorted((r["k"], r["t"], r["v"]) for r in out.collect())
        assert got == [
            ("a", 0, 10.0),
            ("a", 1, None),
            ("a", 2, None),
            ("a", 3, 40.0),
            ("b", 1, 7.0),
        ]

    def test_densify_explicit_bounds_upper_exclusive(self, spark):
        """bounds: [lower, upper) array form (new r7): spine spans the
        literals with upper EXCLUSIVE; observed docs OUTSIDE the range pass
        through untouched; partitioned form repeats the range per key."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        out = aggregate(
            self._series(spark),
            [{"$densify": {"field": "t", "range": {"step": 1, "bounds": [1, 3]}}}],
        )
        got = sorted(
            ((r["k"], r["t"], r["v"]) for r in out.collect()),
            key=lambda x: (str(x[0]), x[1]),
        )
        # spine adds t=2 only (t=1 observed via b, t=3 is EXCLUSIVE);
        # out-of-range t=0 and t=3 rows pass through
        assert got == [
            (None, 2, None),
            ("a", 0, 10.0),
            ("a", 3, 40.0),
            ("b", 1, 7.0),
        ]
        out2 = aggregate(
            self._series(spark),
            [{"$densify": {"field": "t", "range": {
                "step": 1, "bounds": [0, 2], "partitionByFields": ["k"]}}}],
        )
        got2 = sorted((r["k"], r["t"]) for r in out2.collect())
        assert got2 == [("a", 0), ("a", 1), ("a", 3), ("b", 0), ("b", 1)]

    def test_densify_explicit_bounds_dates(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("2024-01-01 00:00:00",), ("2024-01-01 06:00:00",)], "s string"
        ).selectExpr("cast(s as timestamp) as ts")
        out = aggregate(df, [{"$densify": {"field": "ts", "range": {
            "step": 2, "unit": "hour",
            "bounds": ["2024-01-01 00:00:00", "2024-01-01 06:00:00"]}}}])
        got = sorted(str(r["ts"]) for r in out.collect())
        # spine 00/02/04 (06 exclusive); observed 00 dedups, observed 06 passes
        assert got == [
            "2024-01-01 00:00:00", "2024-01-01 02:00:00",
            "2024-01-01 04:00:00", "2024-01-01 06:00:00",
        ]

    def test_densify_full_bounds_spans_global_range(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        out = aggregate(
            self._series(spark),
            [
                {
                    "$densify": {
                        "field": "t",
                        "range": {"step": 1, "bounds": "full", "partitionByFields": ["k"]},
                    }
                }
            ],
        )
        # both partitions span the global 0..3
        got = {(r["k"], r["t"]) for r in out.collect()}
        assert got == {(k, t) for k in ("a", "b") for t in range(4)}

    def test_densify_then_fill_locf(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        out = aggregate(
            self._series(spark),
            [
                {
                    "$densify": {
                        "field": "t",
                        "range": {"step": 1, "bounds": "partition", "partitionByFields": ["k"]},
                    }
                },
                {
                    "$fill": {
                        "partitionBy": "$k",
                        "sortBy": {"t": 1},
                        "output": {"v": {"method": "locf"}},
                    }
                },
            ],
        )
        got = sorted((r["k"], r["t"], r["v"]) for r in out.collect())
        assert got == [
            ("a", 0, 10.0),
            ("a", 1, 10.0),
            ("a", 2, 10.0),
            ("a", 3, 40.0),
            ("b", 1, 7.0),
        ]

    def test_fill_constant_value(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = self._series(spark).unionByName(
            self._series(spark).sparkSession.createDataFrame(
                [("c", 9, None)], "k string, t long, v double"
            )
        )
        out = aggregate(df, [{"$fill": {"output": {"v": {"value": 0.0}}}}])
        assert {r["v"] for r in out.collect()} == {10.0, 40.0, 7.0, 0.0}
        # value form takes an expression (Mongo): fill from another field
        out2 = aggregate(df, [{"$fill": {"output": {"v": {"value": {"$multiply": ["$t", 2]}}}}}])
        filled = {r["t"]: r["v"] for r in out2.collect() if r["k"] == "c"}
        assert filled == {9: 18.0}

    def test_densify_time_unit(self, spark):
        """$densify with range.unit: the spine steps by step×unit micros
        from each partition's min timestamp; off-grid observed rows pass
        through, grid collisions don't duplicate."""
        import datetime as dt
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        t0 = dt.datetime(2024, 1, 1, 10, 0)
        rows = [
            ("a", t0, 1.0),
            ("a", t0 + dt.timedelta(minutes=90), 2.0),   # off-grid
            ("a", t0 + dt.timedelta(hours=3), 3.0),      # on-grid collision
            ("b", t0, 9.0),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = aggregate(df, [{"$densify": {
            "field": "ts",
            "range": {"step": 1, "unit": "hour", "bounds": "partition",
                      "partitionByFields": ["k"]},
        }}])
        got = sorted((r["k"], r["ts"], r["v"]) for r in out.collect())
        a_rows = [(t, v) for k, t, v in got if k == "a"]
        # spine: 10:00, 11:00, 12:00, 13:00; observed 10:00 & 13:00 collide,
        # 11:30 passes through off-grid
        assert a_rows == [
            (t0, 1.0),
            (t0 + dt.timedelta(hours=1), None),
            (t0 + dt.timedelta(minutes=90), 2.0),
            (t0 + dt.timedelta(hours=2), None),
            (t0 + dt.timedelta(hours=3), 3.0),
        ]
        assert [(t, v) for k, t, v in got if k == "b"] == [(t0, 9.0)]

    def test_densify_unit_requires_date_field(self, spark):
        """Any time unit (fixed or calendar) over a non-date field raises,
        mirroring mongod's validation (calendar units themselves compile
        since r6 — covered by test_densify_monthly_spine + the
        ds_densify_monthly oracle gate)."""
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([("a", 1.0)], "k string, v double")
        for unit in ("month", "hour"):
            with pytest.raises(ValueError, match="date/timestamp"):
                aggregate(df, [{"$densify": {"field": "v",
                    "range": {"step": 1, "unit": unit, "bounds": "full"}}}])

    def test_fill_linear_interpolation(self, spark):
        """$fill linear: interpolate between surrounding non-nulls by the
        sortBy VALUE (not row position); leading/trailing nulls stay null."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", 0, None), ("a", 1, 10.0), ("a", 3, None), ("a", 4, 40.0),
             ("a", 6, None), ("b", 0, 5.0), ("b", 2, None)],
            "k string, t long, v double",
        )
        out = aggregate(df, [{"$fill": {
            "partitionBy": "$k", "sortBy": {"t": 1},
            "output": {"v": {"method": "linear"}},
        }}])
        got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
        assert got[("a", 0)] is None            # leading null: no prev
        assert got[("a", 1)] == 10.0
        # t=3 between (1, 10) and (4, 40): 10 + 30 * (3-1)/(4-1) = 30
        assert got[("a", 3)] == 30.0
        assert got[("a", 6)] is None            # trailing null: no next
        assert got[("b", 2)] is None

    def test_fill_linear_validation(self, spark):
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([("a", 1, 1.0)], "k string, t long, v double")
        with pytest.raises(ValueError, match="exactly one sortBy"):
            aggregate(df, [{"$fill": {"sortBy": {"t": 1, "k": 1},
                "output": {"v": {"method": "linear"}}}}])
        with pytest.raises(ValueError, match="ascending"):
            aggregate(df, [{"$fill": {"sortBy": {"t": -1},
                "output": {"v": {"method": "linear"}}}}])


class TestBucketAutoAndOut:
    def test_bucket_auto_equal_population(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [(float(i),) for i in range(12)], "price double"
        )
        out = aggregate(
            df,
            [{"$bucketAuto": {"groupBy": "$price", "buckets": 3,
                              "output": {"count": {"$sum": 1}, "avg": {"$avg": "$price"}}}}],
        ).collect()
        assert [r["count"] for r in out] == [4, 4, 4]
        assert [(r["_id"]["min"], r["_id"]["max"]) for r in out] == [
            (0.0, 3.0), (4.0, 7.0), (8.0, 11.0),
        ]

    def test_bucket_auto_approx_equal_population_no_global_sort(self, spark):
        """scaleMode 'approx': quantile-derived boundaries through the
        $bucket-style conditional projection — equal-ish populations with NO
        window/global sort anywhere in the physical plan."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [(float(i),) for i in range(1200)], "price double"
        )
        out = aggregate(
            df,
            [{"$bucketAuto": {"groupBy": "$price", "buckets": 4,
                              "scaleMode": "approx",
                              "output": {"count": {"$sum": 1}}}}],
        )
        rows = out.collect()
        counts = [r["count"] for r in rows]
        assert sum(counts) == 1200
        assert len(counts) == 4
        # equal-ish: every bucket within 25% of the ideal 300
        assert all(225 <= c <= 375 for c in counts), counts
        # populations partition the key range in order
        pairs = [(r["_id"]["min"], r["_id"]["max"]) for r in rows]
        assert pairs == sorted(pairs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "ntile" not in plan

    def test_bucket_auto_granularity_powersof2(self, spark):
        """granularity auto-selects the approx path; _id bounds snap to the
        series (first rounded down, rest rounded up) per Mongo."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [(float(v),) for v in (3, 5, 6, 7, 9, 11, 13, 20, 30, 50, 60, 100)],
            "price double",
        )
        out = aggregate(
            df,
            [{"$bucketAuto": {"groupBy": "$price", "buckets": 3,
                              "granularity": "POWERSOF2"}}],
        )
        rows = out.collect()
        assert sum(r["count"] for r in rows) == 12
        for r in rows:
            for bound in (r["_id"]["min"], r["_id"]["max"]):
                # every boundary is a power of two
                m = bound
                while m > 1.0:
                    m /= 2.0
                while 0 < m < 1.0:
                    m *= 2.0
                assert m == 1.0, bound
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan

    def test_bucket_auto_granularity_r5_series(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import (
            _granularity_round,
        )

        assert _granularity_round(3.0, "R5", up=True) == 4.0
        assert _granularity_round(3.0, "R5", up=False) == 2.5
        assert _granularity_round(40.0, "R5", up=True) == 40.0
        assert _granularity_round(0.7, "R5", up=True) == 1.0
        assert _granularity_round(101.0, "1-2-5", up=True) == 200.0
        assert _granularity_round(0.0, "E12", up=False) == 0.0

    def test_graph_lookup_org_chart(self, spark):
        """$graphLookup transitive closure on the classic org chart:
        reportsTo chains resolve to the full management line with
        shallowest-depth semantics."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        employees = spark.createDataFrame(
            [("Dev", None), ("Eliot", "Dev"), ("Ron", "Eliot"),
             ("Andrew", "Eliot"), ("Asya", "Ron"), ("Dan", "Asya")],
            "name string, reportsTo string",
        )
        out = aggregate(employees, [{"$graphLookup": {
            "from": employees,
            "startWith": "$reportsTo",
            "connectFromField": "reportsTo",
            "connectToField": "name",
            "as": "chain",
            "depthField": "lvl",
        }}])
        got = {
            r["name"]: sorted((x["name"], x["lvl"]) for x in r["chain"])
            for r in out.collect()
        }
        assert got["Dev"] == []
        assert got["Eliot"] == [("Dev", 0)]
        assert got["Ron"] == [("Dev", 1), ("Eliot", 0)]
        assert got["Dan"] == [("Asya", 0), ("Dev", 3), ("Eliot", 2), ("Ron", 1)]

    def test_graph_lookup_max_depth_and_cycles(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        # a -> b -> c -> a cycle must terminate via the visited set
        nodes = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "id string, nxt string"
        )
        out = aggregate(nodes, [{"$graphLookup": {
            "from": nodes, "startWith": "$nxt",
            "connectFromField": "nxt", "connectToField": "id",
            "as": "reach",
        }}])
        got = {r["id"]: sorted(x["id"] for x in r["reach"]) for r in out.collect()}
        # every node reaches the whole cycle (including itself via the loop)
        assert got == {k: ["a", "b", "c"] for k in ("a", "b", "c")}

        capped = aggregate(nodes, [{"$graphLookup": {
            "from": nodes, "startWith": "$nxt",
            "connectFromField": "nxt", "connectToField": "id",
            "as": "reach", "maxDepth": 0,
        }}])
        got0 = {r["id"]: [x["id"] for x in r["reach"]] for r in capped.collect()}
        assert got0 == {"a": ["b"], "b": ["c"], "c": ["a"]}  # direct hop only

    def _run_graph(self, aggregate, docs, spec_extra):
        out = aggregate(docs, [{"$graphLookup": {
            "from": docs, "startWith": "$nxt",
            "connectFromField": "nxt", "connectToField": "id",
            "as": "reach", "depthField": "lvl", **spec_extra,
        }}])
        return {
            r["id"]: sorted((x["id"], x["lvl"]) for x in r["reach"])
            for r in out.collect()
        }

    @pytest.mark.slow  # 74 s scaled-up twin; test_graph doubling tiers +
    # the ds_graph_reachable_orders parity row keep the equivalence covered
    def test_graph_lookup_doubling_equals_frontier(self, spark):
        """Pointer-doubling traversal (method: doubling) must produce the
        exact frontier-loop result — docs, shallowest depths, empty arrays —
        on a deep chain, a cycle, and with maxDepth caps."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        # deep chain: n0 -> n1 -> ... -> n40 (frontier: 40 rounds;
        # doubling: 6 compositions)
        chain = spark.createDataFrame(
            [(f"n{i}", f"n{i+1}" if i < 40 else None) for i in range(41)],
            "id string, nxt string",
        )
        assert self._run_graph(aggregate, chain, {"method": "doubling"}) == \
            self._run_graph(aggregate, chain, {})

        # cycle: min-depth semantics must survive the closure
        cyc = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "id string, nxt string"
        )
        assert self._run_graph(aggregate, cyc, {"method": "doubling"}) == \
            self._run_graph(aggregate, cyc, {})

        # maxDepth (incl. 0: direct hop only) — fixed-round doubling path
        for md in (0, 1, 3, 7):
            assert self._run_graph(
                aggregate, chain, {"method": "doubling", "maxDepth": md}
            ) == self._run_graph(aggregate, chain, {"maxDepth": md}), md

        # branching graph: one root fans out, several nodes share targets
        fan = spark.createDataFrame(
            [("r", "x"), ("x", "y"), ("x2", "y"), ("y", "z"), ("z", None),
             ("q", "x2"), ("lone", None)],
            "id string, nxt string",
        )
        assert self._run_graph(aggregate, fan, {"method": "doubling"}) == \
            self._run_graph(aggregate, fan, {})

    def test_graph_lookup_unknown_method_raises(self, spark):
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        docs = spark.createDataFrame([("a", "b")], "id string, nxt string")
        with pytest.raises(ValueError, match="frontier/doubling"):
            aggregate(docs, [{"$graphLookup": {
                "from": docs, "startWith": "$nxt",
                "connectFromField": "nxt", "connectToField": "id",
                "as": "r", "method": "bfs",
            }}])

    def test_graph_lookup_null_doc_columns_in_cycle(self, spark):
        """A doc with a NULL identity column sitting on a cycle must still
        terminate (null-safe visited set) and join its results back."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame(
            [("x", None, "a")], "id string, note string, start string"
        )
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a")], "id string, nxt string"
        )
        out = aggregate(local, [{"$graphLookup": {
            "from": edges, "startWith": "$start",
            "connectFromField": "nxt", "connectToField": "id",
            "as": "reach",
        }}]).collect()
        assert len(out) == 1
        assert sorted(x["id"] for x in out[0]["reach"]) == ["a", "b"]
        assert out[0]["note"] is None

    def test_graph_lookup_duplicate_locals_and_map_column(self, spark):
        """r9 row-identity: byte-identical local docs each keep their own
        traversal result (Mongo emits one per input doc), and map-typed
        local columns ride through (they never enter grouping keys now) —
        both modes."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame(
            [("x", "a", {"k": "1"}), ("x", "a", {"k": "1"}), ("y", "c", {"k": "2"})],
            "id string, start string, attrs map<string,string>",
        )
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", None)], "nid string, nxt string"
        )
        for method in ("frontier", "doubling"):
            out = aggregate(local, [{"$graphLookup": {
                "from": edges, "startWith": "$start",
                "connectFromField": "nxt", "connectToField": "nid",
                "as": "reach", "method": method,
            }}]).collect()
            assert len(out) == 3, method
            xs = [r for r in out if r["id"] == "x"]
            assert len(xs) == 2, method
            for r in xs:
                assert sorted(x["nid"] for x in r["reach"]) == ["a", "b", "c"]
                assert dict(r["attrs"]) == {"k": "1"}
            (y,) = [r for r in out if r["id"] == "y"]
            assert [x["nid"] for x in y["reach"]] == ["c"]

    def test_graph_lookup_array_start_with(self, spark):
        """Mongo: an array-valued startWith seeds the traversal from EVERY
        element (r9); null/empty arrays seed nothing but still emit []."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame(
            [("multi", ["a", "x"]), ("none", []), ("nil", None)],
            "id string, starts array<string>",
        )
        edges = spark.createDataFrame(
            [("a", "b"), ("b", None), ("x", "y"), ("y", None), ("z", None)],
            "nid string, nxt string",
        )
        for method in ("frontier", "doubling"):
            out = {
                r["id"]: sorted((e["nid"], e["d"]) for e in r["reach"])
                for r in aggregate(local, [{"$graphLookup": {
                    "from": edges, "startWith": "$starts",
                    "connectFromField": "nxt", "connectToField": "nid",
                    "as": "reach", "depthField": "d", "method": method,
                }}]).collect()
            }
            assert out["multi"] == [("a", 0), ("b", 1), ("x", 0), ("y", 1)], method
            assert out["none"] == [] and out["nil"] == [], method

    def test_graph_lookup_restrict_search_with_match(self, spark):
        """restrictSearchWithMatch (r9 — was silently ignored): docs
        failing the restriction are invisible to the traversal, neither
        collected NOR followed (the chain breaks at them); unknown options
        on $graphLookup and $lookup raise."""
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame([("s", "a")], "id string, start string")
        edges = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 0), ("c", None, 1)],
            "nid string, nxt string, ok long",
        )
        for method in ("frontier", "doubling"):
            out = aggregate(local, [{"$graphLookup": {
                "from": edges, "startWith": "$start",
                "connectFromField": "nxt", "connectToField": "nid",
                "as": "reach", "method": method,
                "restrictSearchWithMatch": {"ok": 1},
            }}]).collect()
            # b fails the restriction: not collected, and the a→b→c chain
            # breaks there so c is unreachable too
            assert sorted(e["nid"] for e in out[0]["reach"]) == ["a"], method
        with pytest.raises(ValueError, match="unsupported \\$graphLookup"):
            aggregate(local, [{"$graphLookup": {
                "from": edges, "startWith": "$start",
                "connectFromField": "nxt", "connectToField": "nid",
                "as": "reach", "bogus": 1,
            }}])
        with pytest.raises(ValueError, match="unsupported \\$lookup"):
            aggregate(local, [{"$lookup": {
                "from": edges, "localField": "start",
                "foreignField": "nid", "as": "m", "bogus": 1,
            }}])

    def test_lookup_pipeline_form(self, spark):
        """Correlated $lookup (let + pipeline): the leading $match $expr
        becomes the join condition; trailing $project narrows the structs."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame(
            [(1, 100.0), (2, 50.0), (3, 10.0)], "cid long, budget double"
        )
        foreign = spark.createDataFrame(
            [(1, "a", 80.0), (1, "b", 120.0), (2, "c", 20.0), (9, "d", 5.0)],
            "cust long, item string, price double",
        )
        out = aggregate(local, [{"$lookup": {
            "from": foreign,
            "let": {"cid": "$cid", "cap": "$budget"},
            "pipeline": [
                {"$match": {"$expr": {"$and": [
                    {"$eq": ["$cust", "$$cid"]},
                    {"$lte": ["$price", "$$cap"]},
                ]}}},
                {"$project": {"item": 1, "price": 1}},
            ],
            "as": "affordable",
        }}])
        got = {
            r["cid"]: sorted((x["item"], x["price"]) for x in r["affordable"])
            for r in out.collect()
        }
        # cid 1: only 'a' (80 <= 100; 'b' at 120 exceeds); cid 2: 'c';
        # cid 3: no rows within budget -> empty array, row retained
        assert got == {1: [("a", 80.0)], 2: [("c", 20.0)], 3: []}

    def test_lookup_pipeline_requires_leading_expr_match(self, spark):
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame([(1,)], "cid long")
        foreign = spark.createDataFrame([(1, "x")], "cust long, item string")
        # a pipeline WITHOUT $expr is the UNCORRELATED form (valid since r7,
        # see test_lookup_uncorrelated_pipeline) — but `let` demands the
        # correlated shape
        with pytest.raises(ValueError, match="correlated"):
            aggregate(local, [{"$lookup": {"from": foreign,
                "let": {"c": "$cid"},
                "pipeline": [{"$project": {"item": 1}}], "as": "xs"}}])
        with pytest.raises(ValueError, match="preceding .sort"):
            # $limit without $sort: nondeterministic top-k, refused
            aggregate(local, [{"$lookup": {"from": foreign,
                "let": {"c": "$cid"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$cust", "$$c"]}}},
                    {"$limit": 1},
                ], "as": "xs"}}])
        with pytest.raises(ValueError, match="residual stage"):
            # $group and $sort+$skip paging are supported since r8 —
            # $addFields inside the correlated sub-pipeline still is not
            aggregate(local, [{"$lookup": {"from": foreign,
                "let": {"c": "$cid"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$cust", "$$c"]}}},
                    {"$addFields": {"y": 1}},
                ], "as": "xs"}}])

    def test_lookup_uncorrelated_pipeline(self, spark):
        """No-$expr sub-pipeline (Mongo 3.6 uncorrelated form): runs once
        against the foreign collection, the SAME array attaches to every
        input doc, in the sub-pipeline's $sort order (also when a $limit
        follows the $sort)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame([(1,), (2,)], "cid long")
        foreign = spark.createDataFrame(
            [(1, "a", 30.0), (2, "b", 10.0), (3, "c", 20.0), (4, "d", 5.0)],
            "k long, name string, score double",
        )
        out = aggregate(local, [{"$lookup": {"from": foreign, "pipeline": [
            {"$match": {"score": {"$gte": 10.0}}},
            {"$project": {"name": 1, "score": 1}},
            {"$sort": {"score": -1}},
        ], "as": "tops"}}]).collect()
        assert len(out) == 2
        for r in out:
            assert [e["name"] for e in r["tops"]] == ["a", "c", "b"]
        # $sort + $limit tail: top-n, still in sort order
        out2 = aggregate(local, [{"$lookup": {"from": foreign, "pipeline": [
            {"$sort": {"score": -1}},
            {"$limit": 2},
        ], "as": "t2"}}]).collect()
        for r in out2:
            assert [e["name"] for e in r["t2"]] == ["a", "c"]
        # group-shaped sub-pipeline: one summary row array for every doc
        out3 = aggregate(local, [{"$lookup": {"from": foreign, "pipeline": [
            {"$group": {"_id": None, "total": {"$sum": "$score"}}},
        ], "as": "sums"}}]).collect()
        for r in out3:
            assert len(r["sums"]) == 1 and r["sums"][0]["total"] == 65.0

    def test_lookup_pipeline_sort_limit(self, spark):
        """Per-local-document $sort + $limit inside $lookup (the 'top 3
        related docs each' idiom): arrays come back in sort order, pruned
        to the limit, empty for join misses."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame([(1,), (2,), (3,)], "cid long")
        foreign = spark.createDataFrame(
            [(1, "a", 10.0), (1, "b", 30.0), (1, "c", 20.0), (1, "d", 40.0),
             (2, "e", 5.0)],
            "cust long, item string, price double",
        )
        out = aggregate(local, [{"$lookup": {
            "from": foreign,
            "let": {"c": "$cid"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$cust", "$$c"]}}},
                {"$sort": {"price": -1}},
                {"$limit": 2},
                {"$project": {"item": 1, "price": 1}},
            ],
            "as": "top2",
        }}])
        got = {r["cid"]: [(x["item"], x["price"]) for x in r["top2"]]
               for r in out.collect()}
        assert got == {
            1: [("d", 40.0), ("b", 30.0)],  # sorted desc, pruned to 2
            2: [("e", 5.0)],
            3: [],                          # join miss -> empty array kept
        }
        # $sort alone (no limit): full match set, sorted ascending
        out2 = aggregate(local, [{"$lookup": {
            "from": foreign, "let": {"c": "$cid"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$cust", "$$c"]}}},
                {"$sort": {"price": 1}},
            ],
            "as": "all_sorted",
        }}])
        r1 = {r["cid"]: [x["item"] for x in r["all_sorted"]] for r in out2.collect()}
        assert r1[1] == ["a", "c", "b", "d"]

    def test_lookup_pipeline_leading_project_before_sort(self, spark):
        """A $project may precede the $sort (Mongo stage order): the sort
        then references PROJECTED fields — including computed ones — and
        the collected structs carry the projection."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame([(1,), (2,), (3,)], "cid long")
        foreign = spark.createDataFrame(
            [(1, "a", 10.0, 0.5), (1, "b", 30.0, 0.9), (1, "c", 20.0, 0.1),
             (2, "e", 5.0, 1.0)],
            "cust long, item string, price double, w double",
        )
        out = aggregate(local, [{"$lookup": {
            "from": foreign,
            "let": {"c": "$cid"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$cust", "$$c"]}}},
                {"$project": {"item": 1,
                              "score": {"$multiply": ["$price", "$w"]}}},
                {"$sort": {"score": -1}},
                {"$limit": 2},
            ],
            "as": "top2",
        }}])
        got = {r["cid"]: [(x["item"], x["score"]) for x in r["top2"]]
               for r in out.collect()}
        # scores: a=5.0, b=27.0, c=2.0 -> top2 desc = b, a; cid 2: e=5.0
        assert got == {1: [("b", 27.0), ("a", 5.0)], 2: [("e", 5.0)], 3: []}

    def test_lookup_sort_after_project_requires_projected_field(self, spark):
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        local = spark.createDataFrame([(1,)], "cid long")
        foreign = spark.createDataFrame(
            [(1, "x", 2.0)], "cust long, item string, price double"
        )
        with pytest.raises(ValueError, match="projected fields"):
            aggregate(local, [{"$lookup": {
                "from": foreign, "let": {"c": "$cid"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$cust", "$$c"]}}},
                    {"$project": {"item": 1}},
                    {"$sort": {"price": 1}},  # price was projected away
                ],
                "as": "xs",
            }}])
        with pytest.raises(ValueError, match="residual stage"):
            # two $projects (leading AND trailing) is not a Mongo shape we
            # compile — the leading one already defines the struct
            aggregate(local, [{"$lookup": {
                "from": foreign, "let": {"c": "$cid"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$cust", "$$c"]}}},
                    {"$project": {"item": 1}},
                    {"$sort": {"item": 1}},
                    {"$project": {"item": 1}},
                ],
                "as": "xs",
            }}])

    def test_set_window_fields(self, spark):
        """$setWindowFields: Mongo's DEFAULT window is the entire partition
        even with sortBy (running totals need an explicit
        ['unbounded','current']); explicit document frames, ranking ops,
        $shift."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
             ("b", 1, 5.0), ("b", 2, 5.0), ("b", 3, 7.0)],
            "grp string, seq int, v double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$grp",
            "sortBy": {"seq": 1},
            "output": {
                "dflt": {"$sum": "$v"},  # Mongo default: WHOLE partition
                "running": {"$sum": "$v",
                            "window": {"documents": ["unbounded", "current"]}},
                "trail2": {"$sum": "$v", "window": {"documents": [-1, 0]}},
                "total": {"$sum": "$v", "window": {"documents": ["unbounded", "unbounded"]}},
                "rnk": {"$rank": {}},
                "nxt": {"$shift": {"output": "$v", "by": 1, "default": -1.0}},
            },
        }}])
        got = {(r["grp"], r["seq"]): r for r in out.collect()}
        assert all(got[("a", i)]["dflt"] == 60.0 for i in (1, 2, 3))
        assert [got[("a", i)]["running"] for i in (1, 2, 3)] == [10.0, 30.0, 60.0]
        assert [got[("a", i)]["trail2"] for i in (1, 2, 3)] == [10.0, 30.0, 50.0]
        assert all(got[("a", i)]["total"] == 60.0 for i in (1, 2, 3))
        assert [got[("b", i)]["rnk"] for i in (1, 2, 3)] == [1, 2, 3]
        assert [got[("a", i)]["nxt"] for i in (1, 2, 3)] == [20.0, 30.0, -1.0]
        # rank with ties on the SORT key
        out2 = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$grp", "sortBy": {"v": 1},
            "output": {"r": {"$rank": {}}, "d": {"$denseRank": {}},
                       "n": {"$documentNumber": {}}},
        }}])
        b = {r["seq"]: r for r in out2.collect() if r["grp"] == "b"}
        assert (b[1]["r"], b[2]["r"], b[3]["r"]) == (1, 1, 3)
        assert (b[1]["d"], b[2]["d"], b[3]["d"]) == (1, 1, 2)
        assert sorted((b[1]["n"], b[2]["n"], b[3]["n"])) == [1, 2, 3]

    def test_set_window_fields_range_frame(self, spark):
        """Value-based range frames on a numeric sort key → rangeBetween:
        the frame covers rows whose KEY is within the offsets, regardless
        of row position."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        # keys 1, 2, 10: a [-1, 0] RANGE at key=2 includes key=1; at key=10
        # it includes only itself (9 is absent) — a ROWS frame would differ
        df = spark.createDataFrame(
            [("a", 1, 100.0), ("a", 2, 10.0), ("a", 10, 1.0)],
            "g string, k int, v double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"k": 1},
            "output": {"s": {"$sum": "$v", "window": {"range": [-1, 0]}}},
        }}])
        got = {r["k"]: r["s"] for r in out.collect()}
        assert got == {1: 100.0, 2: 110.0, 10: 1.0}

    def test_median_percentile_accumulators(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", float(v)) for v in (1, 2, 3, 4)] + [("b", 10.0)],
            "g string, v double",
        )
        out = aggregate(df, [{"$group": {
            "_id": "$g",
            "med": {"$median": {"input": "$v", "method": "approximate"}},
            "pct": {"$percentile": {"input": "$v", "p": [0.25, 0.75],
                                    "method": "approximate"}},
        }}])
        got = {r["_id"]: (r["med"], list(r["pct"])) for r in out.collect()}
        assert got["a"] == (2.5, [1.75, 3.25])  # exact R-7 interpolation
        assert got["b"] == (10.0, [10.0, 10.0])

    def test_set_window_fields_validation(self, spark):
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match="requires sortBy"):
            aggregate(df, [{"$setWindowFields": {"partitionBy": "$g",
                "output": {"r": {"$rank": {}}}}}])
        with pytest.raises(ValueError, match="date/timestamp"):
            # a unit range (calendar or fixed) needs a date-typed sortBy,
            # per mongod validation (calendar units compile since r6)
            aggregate(df, [{"$setWindowFields": {"partitionBy": "$g",
                "sortBy": {"v": 1},
                "output": {"s": {"$sum": "$v",
                                 "window": {"range": [-1, 0], "unit": "month"}}}}}])
        with pytest.raises(ValueError, match="exactly one sortBy"):
            aggregate(df, [{"$setWindowFields": {"partitionBy": "$g",
                "output": {"s": {"$sum": "$v", "window": {"range": [-1, 0]}}}}}])

    def test_window_unit_range_nested_sortby(self, spark):
        """A unit-range window's sortBy may be a NESTED date path (e.g.
        meta.ts) — the temporal validation resolves dotted paths through
        the struct schema instead of reporting them missing (ADVICE r6)."""
        import datetime as dt

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        rows = [
            ("a", 1.0, dt.datetime(2024, 1, 1, 10, 0)),
            ("a", 2.0, dt.datetime(2024, 1, 1, 10, 30)),
            ("a", 4.0, dt.datetime(2024, 1, 1, 12, 30)),
        ]
        import pyspark.sql.functions as F

        df = spark.createDataFrame(rows, "g string, v double, ts timestamp").select(
            "g", "v", F.struct(F.col("ts")).alias("meta")
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g",
            "sortBy": {"meta.ts": 1},
            "output": {"s": {"$sum": "$v",
                             "window": {"range": [-1, 0], "unit": "hour"}}},
        }}])
        got = sorted((r["v"], r["s"]) for r in out.collect())
        # trailing 1h: 10:00 -> 1; 10:30 -> 3 (both morning); 12:30 -> 4
        assert got == [(1.0, 1.0), (2.0, 3.0), (4.0, 4.0)]
        # calendar unit through the same nested resolution
        out2 = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g",
            "sortBy": {"meta.ts": 1},
            "output": {"s": {"$sum": "$v",
                             "window": {"range": [0, 1], "unit": "month"}}},
        }}])
        # forward month frame per row: 10:00 sees all (7), 10:30 sees
        # itself + 12:30 (6), 12:30 only itself (4)
        assert sorted((r["v"], r["s"]) for r in out2.collect()) == [
            (1.0, 7.0), (2.0, 6.0), (4.0, 4.0)
        ]
        # a NUMERIC nested path still fails the temporal validation
        import pytest

        df2 = df.select("g", "v", F.struct(F.col("v").alias("ts")).alias("meta"))
        with pytest.raises(ValueError, match="date/timestamp"):
            aggregate(df2, [{"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"meta.ts": 1},
                "output": {"s": {"$sum": "$v",
                                 "window": {"range": [-1, 0], "unit": "hour"}}},
            }}])

    def test_new_expression_ops_r7(self, spark):
        """$log (arbitrary base), $indexOfArray, $strcasecmp, $isArray."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [(8.0, "Apple", "apple", [10, 20, 30]),
             (81.0, "b", "a", [5])],
            "x double, s1 string, s2 string, xs array<long>",
        )
        out = aggregate(df, [{"$project": {
            "lg2": {"$log": ["$x", 2]},
            "lg3": {"$log": ["$x", 3]},
            "idx": {"$indexOfArray": ["$xs", 20]},
            "cmp_eq": {"$strcasecmp": ["$s1", "$s2"]},
            "is_arr": {"$isArray": "$xs"},
            "is_arr_scalar": {"$isArray": "$x"},
            "_id": 0,
        }}])
        rows = sorted([r.asDict() for r in out.collect()], key=lambda r: r["lg2"])
        assert rows[0]["lg2"] == 3.0 and abs(rows[1]["lg3"] - 4.0) < 1e-12
        assert rows[0]["idx"] == 1 and rows[1]["idx"] == -1
        assert rows[0]["cmp_eq"] == 0 and rows[1]["cmp_eq"] == 1  # 'B' > 'A'
        assert rows[0]["is_arr"] is True and rows[0]["is_arr_scalar"] is False

    def test_window_covariance(self, spark):
        """$covariancePop/$covarianceSamp running windows."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("g", 1, 1.0, 2.0), ("g", 2, 2.0, 4.0), ("g", 3, 3.0, 6.0)],
            "g string, seq int, x double, y double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"seq": 1},
            "output": {
                "cp": {"$covariancePop": ["$x", "$y"],
                       "window": {"documents": ["unbounded", "current"]}},
                "cs": {"$covarianceSamp": ["$x", "$y"],
                       "window": {"documents": ["unbounded", "current"]}},
            },
        }}])
        got = {r["seq"]: (r["cp"], r["cs"]) for r in out.collect()}
        assert got[1] == (0.0, None)            # single point: pop 0, samp null
        assert got[2] == (0.5, 1.0)
        assert abs(got[3][0] - 4.0 / 3.0) < 1e-12 and got[3][1] == 2.0

    def test_vector_search_and_unset_stages(self, spark):
        """$vectorSearch facade: (1+cos)/2 Atlas scores, limit cut, find
        pre-filter; score via {$meta}; $unset stage drops columns."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [(1, "a", [1.0, 0.0]), (2, "a", [0.0, 1.0]),
             (3, "b", [1.0, 1.0]), (4, "a", [-1.0, 0.0])],
            "vid long, grp string, emb array<double>",
        )
        out = aggregate(df, [
            {"$vectorSearch": {"path": "emb", "queryVector": [1.0, 0.0],
                               "limit": 2}},
            {"$project": {"vid": 1, "score": {"$meta": "vectorSearchScore"},
                          "_id": 0}},
        ])
        got = {r["vid"]: r["score"] for r in out.collect()}
        # cosines: vid1=1 -> score 1.0; vid3=1/sqrt(2) -> ~0.853553; cut=2
        assert set(got) == {1, 3}
        assert got[1] == 1.0 and abs(got[3] - (1 + 2 ** -0.5) / 2) < 1e-6
        # filter pre-restricts candidates (vid 3 is grp b -> excluded)
        out2 = aggregate(df, [
            {"$vectorSearch": {"path": "emb", "queryVector": [1.0, 0.0],
                               "limit": 2, "filter": {"grp": "a"}}},
            {"$project": {"vid": 1, "_id": 0}},
        ])
        assert {r["vid"] for r in out2.collect()} == {1, 2}
        # $unset stage drops columns; nested paths raise
        out3 = aggregate(df, [{"$unset": ["emb", "grp"]}])
        assert out3.columns == ["vid"]
        import pytest

        with pytest.raises(ValueError, match="nested paths"):
            aggregate(df, [{"$unset": "a.b"}])
        with pytest.raises(ValueError, match="unsupported \\$meta"):
            aggregate(df, [{"$project": {"s": {"$meta": "textScore"}}}])

    def test_search_stage_facade(self, spark):
        """$search (Atlas text operator) over BM25: only matching docs
        survive, ranked by score desc, full document preserved, score via
        {$meta: 'searchScore'}; missing idField raises."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [(1, "spark shuffle join", "a"),
             (2, "python pandas", "b"),
             (3, "spark spark spark", "c"),
             (4, "unrelated words here", "d")],
            "doc_id long, text string, tag string",
        )
        out = aggregate(df, [
            {"$search": {"text": {"query": "spark join", "path": "text"},
                         "idField": "doc_id"}},
            {"$project": {"id": "$doc_id", "tag": 1,
                          "score": {"$meta": "searchScore"}, "_id": 0}},
        ])
        rows = out.collect()
        ids = [r["id"] for r in rows]
        assert set(ids) == {1, 3}  # doc 4 matches nothing, 2 neither
        # doc 1 hits BOTH terms (incl. the rarer 'join') -> ranks first
        assert ids[0] == 1 and rows[0]["score"] > rows[1]["score"]
        assert rows[0]["tag"] == "a"  # full document preserved
        import pytest

        with pytest.raises(ValueError, match="idField"):
            aggregate(df, [{"$search": {"text": {"query": "x", "path": "text"}}}])

    def test_window_exp_moving_avg(self, spark):
        """$expMovingAvg: Mongo's recurrence y = a*x + (1-a)*y_prev with
        y_0 = x_0, alpha given directly or as N (a = 2/(N+1)); composes
        with Window-compiled outputs in one $setWindowFields."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("g", 1, 1.0), ("g", 2, 2.0), ("g", 3, 4.0), ("h", 1, 10.0)],
            "g string, seq int, v double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"seq": 1},
            "output": {
                "ema": {"$expMovingAvg": {"input": "$v", "alpha": 0.3}},
                "ema_n": {"$expMovingAvg": {"input": "$v", "N": 3}},
                "rnk": {"$rank": {}},
            },
        }}])
        r = {(x["g"], x["seq"]): x for x in out.collect()}
        assert r[("g", 1)]["ema"] == 1.0
        assert r[("g", 2)]["ema"] == 2.0 * 0.3 + 1.0 * (1 - 0.3)
        y2 = 2.0 * 0.3 + 1.0 * (1 - 0.3)
        assert r[("g", 3)]["ema"] == 4.0 * 0.3 + y2 * (1 - 0.3)
        assert [r[("g", i)]["ema_n"] for i in (1, 2, 3)] == [1.0, 1.5, 2.75]
        assert r[("h", 1)]["ema"] == 10.0 and r[("h", 1)]["rnk"] == 1
        import pytest

        with pytest.raises(ValueError, match="does not accept a window"):
            aggregate(df, [{"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"seq": 1},
                "output": {"e": {"$expMovingAvg": {"input": "$v", "alpha": 0.5},
                                 "window": {"documents": [-1, 0]}}}}}])
        with pytest.raises(ValueError, match="requires sortBy"):
            aggregate(df, [{"$setWindowFields": {
                "partitionBy": "$g",
                "output": {"e": {"$expMovingAvg": {"input": "$v", "alpha": 0.5}}}}}])

    def test_window_n_ary_accumulators(self, spark):
        """$minN/$maxN (nulls skipped) and $firstN/$lastN (nulls kept) and
        $addToSet inside $setWindowFields frames."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("g", 1, 5.0), ("g", 2, None), ("g", 3, 1.0), ("g", 4, 3.0)],
            "g string, seq int, v double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"seq": 1},
            "output": {
                "low2": {"$minN": {"input": "$v", "n": 2}},
                "top2": {"$maxN": {"input": "$v", "n": 2}},
                "first2": {"$firstN": {"input": "$v", "n": 2}},
                "last2": {"$lastN": {"input": "$v", "n": 2}},
                "run_first2": {"$firstN": {"input": "$v", "n": 2},
                               "window": {"documents": ["unbounded", "current"]}},
                "uniq": {"$addToSet": "$v"},
            },
        }}])
        r = {x["seq"]: x for x in out.collect()}
        assert r[1]["low2"] == [1.0, 3.0] and r[1]["top2"] == [5.0, 3.0]
        assert r[1]["first2"] == [5.0, None]       # nulls kept, frame order
        assert r[1]["last2"] == [1.0, 3.0]
        assert r[1]["run_first2"] == [5.0]         # running frame: 1 doc yet
        assert r[2]["run_first2"] == [5.0, None]
        assert r[4]["run_first2"] == [5.0, None]
        assert sorted(r[1]["uniq"], key=lambda x: (x is None, x or 0.0)) == [
            1.0, 3.0, 5.0, None
        ]

    def test_window_integral_derivative(self, spark):
        """$integral (trapezoidal, unit-scaled) and $derivative
        (endpoints slope) over sorted windows — Mongo 5.0 rate ops."""
        import datetime as dt

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        rows = [
            ("a", dt.datetime(2024, 1, 1, 0, 0), 0.0),
            ("a", dt.datetime(2024, 1, 1, 1, 0), 2.0),
            ("a", dt.datetime(2024, 1, 1, 3, 0), 4.0),
            ("b", dt.datetime(2024, 1, 1, 0, 0), 5.0),
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"ts": 1},
            "output": {
                "area": {"$integral": {"input": "$v", "unit": "hour"}},
                "slope": {"$derivative": {"input": "$v", "unit": "hour"}},
                "run": {"$integral": {"input": "$v", "unit": "hour"},
                        "window": {"documents": ["unbounded", "current"]}},
            },
        }}])
        got = {(r["g"], r["ts"].hour): (r["area"], r["slope"], r["run"])
               for r in out.collect()}
        # trapezoids: (0+2)/2*1h + (2+4)/2*2h = 7; slope (4-0)/3h
        assert got[("a", 0)] == (7.0, 4.0 / 3.0, 0.0)
        assert got[("a", 1)] == (7.0, 4.0 / 3.0, 1.0)
        assert got[("a", 3)] == (7.0, 4.0 / 3.0, 7.0)
        # single-point window: zero area, undefined (null) slope
        assert got[("b", 0)] == (0.0, None, 0.0)
        # numeric sortBy without a unit: raw-delta scaling
        df2 = spark.createDataFrame(
            [("g", 0.0, 10.0), ("g", 4.0, 30.0)], "g string, x double, v double"
        )
        out2 = aggregate(df2, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"x": 1},
            "output": {"area": {"$integral": {"input": "$v"}},
                       "slope": {"$derivative": {"input": "$v"}}},
        }}])
        r = out2.collect()[0]
        assert (r["area"], r["slope"]) == (80.0, 5.0)
        import pytest

        with pytest.raises(ValueError, match="ascending"):
            aggregate(df2, [{"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"x": -1},
                "output": {"a": {"$integral": {"input": "$v"}}}}}])
        with pytest.raises(ValueError, match="requires sortBy"):
            aggregate(df2, [{"$setWindowFields": {
                "partitionBy": "$g",
                "output": {"a": {"$derivative": {"input": "$v"}}}}}])
        with pytest.raises(ValueError, match="no fixed length"):
            aggregate(df, [{"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"ts": 1},
                "output": {"a": {"$integral": {"input": "$v", "unit": "month"}}}}}])
        with pytest.raises(ValueError, match="date/timestamp"):
            aggregate(df2, [{"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"x": 1},
                "output": {"a": {"$integral": {"input": "$v", "unit": "hour"}}}}}])

    def test_window_integral_sliding_frame_and_null_poison(self, spark):
        """The r12 prefix-sum rewrite of $integral (linear, replacing the
        O(n·w) collect_list fold) must keep the fold's exact semantics on
        the two paths the running-frame driver query never touches: a
        sliding documents frame whose FIRST row sits mid-partition (its
        trapezoid term references a predecessor OUTSIDE the frame and must
        be excluded), and null inputs poisoning the frame to null instead
        of being silently skipped by SUM."""
        import datetime as dt

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        rows = [
            ("a", dt.datetime(2024, 1, 1, 0, 0), 0.0),
            ("a", dt.datetime(2024, 1, 1, 1, 0), 2.0),
            ("a", dt.datetime(2024, 1, 1, 3, 0), 4.0),
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"ts": 1},
            "output": {"seg": {"$integral": {"input": "$v", "unit": "hour"},
                               "window": {"documents": [-1, 0]}}},
        }}])
        got = {r["ts"].hour: r["seg"] for r in out.collect()}
        # hour 0: single-row frame → 0; hour 1: (0+2)/2·1h = 1;
        # hour 3: frame {1h,3h} → (2+4)/2·2h = 6 — NOT 7: the 1h row's own
        # term (predecessor 0h) lies outside the frame and must drop
        assert got == {0: 0.0, 1: 1.0, 3: 6.0}

        nrows = [
            ("n", dt.datetime(2024, 1, 1, 0, 0), 1.0),
            ("n", dt.datetime(2024, 1, 1, 1, 0), None),
            ("n", dt.datetime(2024, 1, 1, 2, 0), 3.0),
        ]
        ndf = spark.createDataFrame(nrows, "g string, ts timestamp, v double")
        nout = aggregate(ndf, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"ts": 1},
            "output": {"run": {"$integral": {"input": "$v", "unit": "hour"},
                               "window": {"documents": ["unbounded", "current"]}},
                       "all": {"$integral": {"input": "$v", "unit": "hour"}}},
        }}])
        ngot = {r["ts"].hour: (r["run"], r["all"]) for r in nout.collect()}
        # running: head row has no terms (0.0); every frame containing a
        # null-valued trapezoid term is poisoned to null, never a partial
        # sum (SUM would have skipped the nulls and returned 2.0 at hour 2)
        assert ngot[0] == (0.0, None)
        assert ngot[1] == (None, None)
        assert ngot[2] == (None, None)

    def test_densify_nested_field_raises(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [("a", 1.0)], "g string, v double"
        ).select("g", F.struct(F.col("v")).alias("m"))
        with pytest.raises(ValueError, match="project the field first"):
            aggregate(df, [{"$densify": {
                "field": "m.v", "range": {"step": 1, "bounds": "full"},
            }}])

    def test_merge_upsert_modes(self, spark, tmp_path):
        """$merge whenMatched replace/keepExisting/merge + whenNotMatched
        insert/discard against a real parquet target."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        def fresh_target(path):
            spark.createDataFrame(
                [(1, "old1", 10.0), (2, "old2", 20.0), (3, "old3", None)],
                "_id long, name string, score double",
            ).write.mode("overwrite").parquet(path)

        src = spark.createDataFrame(
            [(2, "new2", None), (4, "new4", 40.0)],
            "_id long, name string, score double",
        )

        def run(path, **merge_args):
            fresh_target(path)
            out = aggregate(src, [{"$merge": {"into": path, "on": "_id", **merge_args}}])
            return {r["_id"]: (r["name"], r["score"]) for r in out.collect()}

        p = str(tmp_path / "t1")
        assert run(p, whenMatched="replace") == {
            1: ("old1", 10.0), 2: ("new2", None), 3: ("old3", None), 4: ("new4", 40.0),
        }
        assert run(p, whenMatched="keepExisting") == {
            1: ("old1", 10.0), 2: ("old2", 20.0), 3: ("old3", None), 4: ("new4", 40.0),
        }
        # merge: non-null source fields overwrite, null keeps target
        assert run(p, whenMatched="merge") == {
            1: ("old1", 10.0), 2: ("new2", 20.0), 3: ("old3", None), 4: ("new4", 40.0),
        }
        assert run(p, whenMatched="replace", whenNotMatched="discard") == {
            1: ("old1", 10.0), 2: ("new2", None), 3: ("old3", None),
        }

    def test_merge_compound_key(self, spark, tmp_path):
        """$merge with a multi-field `on` key: matching requires ALL key
        fields to agree."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "ck")
        spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0)],
            "region string, slot int, v double",
        ).write.parquet(path)
        src = spark.createDataFrame(
            [("a", 2, 99.0),   # matches (a, 2) only
             ("b", 2, 50.0)],  # (b, 2) absent -> insert
            "region string, slot int, v double",
        )
        out = aggregate(src, [{"$merge": {"into": path, "on": ["region", "slot"],
                                          "whenMatched": "replace"}}])
        got = {(r["region"], r["slot"]): r["v"] for r in out.collect()}
        assert got == {("a", 1): 10.0, ("a", 2): 99.0, ("b", 1): 30.0, ("b", 2): 50.0}

    def test_merge_fail_modes(self, spark, tmp_path):
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "t2")
        spark.createDataFrame([(1, "a")], "_id long, v string").write.parquet(path)
        clash = spark.createDataFrame([(1, "b")], "_id long, v string")
        with pytest.raises(Exception, match="whenMatched=fail"):
            aggregate(clash, [{"$merge": {"into": path, "on": "_id",
                                          "whenMatched": "fail"}}]).collect()
        fresh = spark.createDataFrame([(9, "z")], "_id long, v string")
        with pytest.raises(Exception, match="whenNotMatched=fail"):
            aggregate(fresh, [{"$merge": {"into": path, "on": "_id",
                                          "whenNotMatched": "fail"}}]).collect()

    def test_push_and_add_to_set_keep_nulls(self, spark):
        """$push arrays and $addToSet sets include null inputs (Mongo);
        collect_list/set would silently drop them."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, None), ("a", 3, 1.0), ("a", 4, 2.0)],
            "g string, seq int, v double",
        )
        out = aggregate(df.orderBy("seq"), [{"$group": {
            "_id": "$g",
            "pushed": {"$push": "$v"},
            "uniq": {"$addToSet": "$v"},
        }}])
        r = out.collect()[0]
        assert list(r["pushed"]) == [1.0, None, 1.0, 2.0]
        assert sorted(r["uniq"], key=lambda x: (x is None, x)) == [1.0, 2.0, None]

    def test_expression_comparisons_are_total(self, spark):
        """Aggregation $eq/$ne/$lt/$gt/$cmp follow Mongo's TOTAL order:
        null == null, null < any present value — never SQL null."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import (
            ExpressionCompiler,
        )

        df = spark.createDataFrame(
            [(1, None, None), (2, None, 5.0), (3, 5.0, None), (4, 5.0, 5.0),
             (5, 3.0, 5.0)],
            "_id long, a double, b double",
        )
        ec = ExpressionCompiler(df)
        out = df.select(
            "_id",
            ec.compile({"$eq": ["$a", "$b"]}).alias("eq"),
            ec.compile({"$ne": ["$a", "$b"]}).alias("ne"),
            ec.compile({"$lt": ["$a", "$b"]}).alias("lt"),
            ec.compile({"$gte": ["$a", "$b"]}).alias("gte"),
            ec.compile({"$cmp": ["$a", "$b"]}).alias("cmp"),
        )
        got = {r["_id"]: (r["eq"], r["ne"], r["lt"], r["gte"], r["cmp"])
               for r in out.collect()}
        assert got[1] == (True, False, False, True, 0)    # null == null
        assert got[2] == (False, True, True, False, -1)   # null < 5
        assert got[3] == (False, True, False, True, 1)    # 5 > null
        assert got[4] == (True, False, False, True, 0)
        assert got[5] == (False, True, True, False, -1)

    def test_update_many_operators(self, spark):
        """update_many: $set/$inc/$unset/$min on matching rows only; $inc
        treats missing/null as 0; new $set fields are null on non-matches;
        classic $set values are LITERALS ('$'-strings stored verbatim,
        expression dicts rejected) — ADVICE r5."""
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
            DocumentCollection,
        )

        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", None), (3, "a", 30.0)],
            "_id long, grp string, score double",
        )
        out = DocumentCollection(df, "t").update_many(
            {"grp": "a"},
            {
                "$inc": {"score": 5},
                "$set": {"bumped": True, "note": "$promo"},
                "$min": {"score_floor": 0.0},
            },
        ).df
        got = {r["_id"]: r for r in out.collect()}
        assert got[1]["score"] == 15.0 and got[3]["score"] == 35.0
        assert got[2]["score"] is None                    # non-matching untouched
        assert got[1]["bumped"] is True and got[2]["bumped"] is None
        assert got[1]["note"] == "$promo"                 # literal, NOT a field ref
        assert got[2]["note"] is None
        with pytest.raises(ValueError, match="pipeline-update"):
            DocumentCollection(df, "t").update_many(
                {}, {"$set": {"x": {"$multiply": ["$score", 2]}}}
            )
        # a PLAIN dict is a literal embedded document (Mongo stores the
        # subdocument; only $-prefixed keys mean "expression") — ADVICE r6
        out3 = DocumentCollection(df, "t").update_many(
            {"grp": "a"},
            {"$set": {"meta": {"kind": "promo", "pts": 2, "tags": ["x", "y"]}}},
        ).df
        got3 = {r["_id"]: r["meta"] for r in out3.collect()}
        assert got3[1].asDict() == {"kind": "promo", "pts": 2, "tags": ["x", "y"]}
        assert got3[2] is None
        # $unset nulls only matching rows
        out2 = DocumentCollection(df, "t").update_many(
            {"_id": 1}, {"$unset": ["grp"]}
        ).df
        got2 = {r["_id"]: r["grp"] for r in out2.collect()}
        assert got2 == {1: None, 2: "b", 3: "a"}

    def test_update_many_array_operators(self, spark):
        """Classic array updates (new r7): $push/$addToSet (value or $each,
        null array creates), $pull removes ALL copies, $pop 1/-1 trims
        last/first, $rename nulls the source on matched rows."""
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
            DocumentCollection,
        )

        df = spark.createDataFrame(
            [(1, "a", [1, 2, 2]), (2, "a", None), (3, "b", [5])],
            "_id long, grp string, xs array<long>",
        )
        coll = lambda: DocumentCollection(df, "t")
        got = {r["_id"]: list(r["xs"]) if r["xs"] is not None else None
               for r in coll().update_many({"grp": "a"}, {"$push": {"xs": 9}}).df.collect()}
        assert got == {1: [1, 2, 2, 9], 2: [9], 3: [5]}
        got = {r["_id"]: list(r["xs"]) if r["xs"] is not None else None
               for r in coll().update_many(
                   {"grp": "a"}, {"$addToSet": {"xs": {"$each": [2, 7]}}}
               ).df.collect()}
        assert got == {1: [1, 2, 2, 7], 2: [2, 7], 3: [5]}  # 2 already present
        got = {r["_id"]: list(r["xs"]) if r["xs"] is not None else None
               for r in coll().update_many({}, {"$pull": {"xs": 2}}).df.collect()}
        assert got == {1: [1], 2: None, 3: [5]}
        got = {r["_id"]: list(r["xs"]) if r["xs"] is not None else None
               for r in coll().update_many({}, {"$pop": {"xs": 1}}).df.collect()}
        assert got == {1: [1, 2], 2: None, 3: []}
        got = {r["_id"]: list(r["xs"]) if r["xs"] is not None else None
               for r in coll().update_many({}, {"$pop": {"xs": -1}}).df.collect()}
        assert got == {1: [2, 2], 2: None, 3: []}
        out = coll().update_many({"grp": "a"}, {"$rename": {"xs": "ys"}}).df
        got = {r["_id"]: (r["xs"], r["ys"]) for r in out.collect()}
        assert got[1] == (None, [1, 2, 2]) and got[3] == ([5], None)
        with pytest.raises(ValueError, match="pipeline"):
            coll().update_many({}, {"$pull": {"xs": {"$gt": 1}}})
        with pytest.raises(ValueError, match="source field missing"):
            coll().update_many({}, {"$rename": {"nope": "x"}})
        with pytest.raises(ValueError, match="takes 1 or -1"):
            coll().update_many({}, {"$pop": {"xs": 2}})

    def test_insert_many_and_one(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
            DocumentCollection,
        )

        df = spark.createDataFrame([(1, "a")], "_id long, v string")
        c = DocumentCollection(df, "t").insert_many([{"_id": 2, "v": "b"}])
        c = c.insert_one({"_id": 3, "v": None})
        assert sorted((r["_id"], r["v"]) for r in c.df.collect()) == [
            (1, "a"), (2, "b"), (3, None),
        ]
        # DataFrame form with missing columns null-fills
        extra = spark.createDataFrame([(4,)], "_id long")
        got = {r["_id"]: r["v"] for r in c.insert_many(extra).df.collect()}
        assert got[4] is None and len(got) == 4

    def test_delete_many_keeps_null_predicate_rows(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
            DocumentCollection,
        )

        df = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 50.0)], "_id long, v double"
        )
        out = DocumentCollection(df, "t").delete_many({"v": {"$gt": 10.0}}).df
        # row 3 deleted; row 2 (null predicate) KEPT, like Mongo
        assert sorted(r["_id"] for r in out.collect()) == [1, 2]

    def test_merge_duplicate_source_keys_raise(self, spark, tmp_path):
        """Mongo aborts $merge when several pipeline docs share an `on` key
        (the on-field must identify a unique source doc)."""
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "dup")
        spark.createDataFrame([(1, "a")], "_id long, v string").write.parquet(path)
        dup_src = spark.createDataFrame(
            [(2, "x"), (2, "y")], "_id long, v string"
        )
        with pytest.raises(Exception, match="multiple source documents"):
            aggregate(dup_src, [{"$merge": {"into": path, "on": "_id"}}])

    def test_merge_both_fail_modes_guard_both(self, spark, tmp_path):
        """whenMatched=fail AND whenNotMatched=fail: BOTH guards install —
        an unmatched insert must fail too, not slip through because the
        matched guard won the if/else."""
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "t3")
        spark.createDataFrame([(1, "a")], "_id long, v string").write.parquet(path)
        fresh = spark.createDataFrame([(9, "z")], "_id long, v string")
        with pytest.raises(Exception, match="fail hit"):
            aggregate(fresh, [{"$merge": {"into": path, "on": "_id",
                                          "whenMatched": "fail",
                                          "whenNotMatched": "fail"}}]).collect()

    def test_merge_keep_existing_ignores_source_only_fields(self, spark, tmp_path):
        """keepExisting leaves matched target docs ENTIRELY unchanged: a
        source-only column must stay null on matched rows (it lands only on
        inserted rows)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "t4")
        spark.createDataFrame(
            [(1, "old1"), (2, "old2")], "_id long, name string"
        ).write.parquet(path)
        src = spark.createDataFrame(
            [(2, "new2", "extra2"), (4, "new4", "extra4")],
            "_id long, name string, note string",
        )
        out = aggregate(src, [{"$merge": {"into": path, "on": "_id",
                                          "whenMatched": "keepExisting"}}])
        got = {r["_id"]: (r["name"], r["note"]) for r in out.collect()}
        assert got == {1: ("old1", None), 2: ("old2", None), 4: ("new4", "extra4")}

    def test_merge_when_matched_pipeline(self, spark, tmp_path):
        """whenMatched update-pipeline form (Mongo 4.2): $set sees the
        target via $field and the source via $$new (default let), stages
        apply sequentially, $unset nulls a field, and new fields extend the
        schema; unmatched source docs still insert."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "t5")
        spark.createDataFrame(
            [(1, 10.0, "keep1"), (2, 20.0, "keep2")],
            "_id long, total double, tag string",
        ).write.parquet(path)
        src = spark.createDataFrame(
            [(2, 5.0), (4, 40.0)], "_id long, total double"
        )
        out = aggregate(src, [{"$merge": {
            "into": path, "on": "_id",
            "whenMatched": [
                {"$set": {"total": {"$add": ["$total", "$$new.total"]}}},
                {"$set": {"doubled": {"$multiply": ["$total", 2]}}},  # sees stage-1 result
                {"$unset": "tag"},
            ],
        }}])
        got = {r["_id"]: (r["total"], r["tag"], r["doubled"]) for r in out.collect()}
        assert got[1] == (10.0, "keep1", None)       # untouched target row
        assert got[2] == (25.0, None, 50.0)          # updated via pipeline
        assert got[4] == (40.0, None, None)          # plain insert

    def test_merge_when_matched_pipeline_custom_let(self, spark, tmp_path):
        """Explicit let bindings: $$var resolves to a SOURCE-side field."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "t6")
        spark.createDataFrame([(1, 100.0)], "_id long, v double").write.parquet(path)
        src = spark.createDataFrame([(1, 7.0)], "_id long, v double")
        out = aggregate(src, [{"$merge": {
            "into": path, "on": "_id",
            "let": {"delta": "$v"},
            "whenMatched": [{"$set": {"v": {"$add": ["$v", "$$delta"]}}}],
        }}])
        assert {r["_id"]: r["v"] for r in out.collect()} == {1: 107.0}

    def test_merge_when_not_matched_pipeline(self, spark, tmp_path):
        """whenNotMatched insert-pipeline form: unmatched source docs run
        the $set/$unset stage algebra before inserting — $field reads the
        SOURCE document, stages apply sequentially with stage-boundary
        snapshots, $unset nulls a field, new fields extend the schema —
        while matched target rows follow whenMatched untouched."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "t7")
        spark.createDataFrame(
            [(1, 10.0, "t1"), (2, 20.0, "t2")],
            "_id long, total double, tag string",
        ).write.parquet(path)
        src = spark.createDataFrame(
            [(2, 5.0, "s2"), (4, 40.0, "s4")], "_id long, total double, tag string"
        )
        out = aggregate(src, [{"$merge": {
            "into": path, "on": "_id",
            "whenMatched": "keepExisting",
            "whenNotMatched": [
                {"$set": {"total": {"$multiply": ["$total", 10]}}},
                # sees stage-1's total (sequential), reads source tag
                {"$set": {"audit": {"$concat": ["ins:", "$tag"]},
                          "scaled": {"$add": ["$total", 1]}}},
                {"$unset": "tag"},
            ],
        }}])
        got = {
            r["_id"]: (r["total"], r["tag"], r["audit"], r["scaled"])
            for r in out.collect()
        }
        assert got[1] == (10.0, "t1", None, None)  # untouched target row
        assert got[2] == (20.0, "t2", None, None)  # matched, keepExisting
        assert got[4] == (400.0, None, "ins:s4", 401.0)  # pipeline insert

    def test_merge_both_pipelines_share_let(self, spark, tmp_path):
        """whenMatched AND whenNotMatched pipelines in one $merge: the
        matched side reads target fields + $$vars, the insert side reads
        source fields + the same $$vars."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "t8")
        spark.createDataFrame([(1, 100.0)], "_id long, v double").write.parquet(path)
        src = spark.createDataFrame([(1, 7.0), (9, 3.0)], "_id long, v double")
        out = aggregate(src, [{"$merge": {
            "into": path, "on": "_id",
            "let": {"delta": "$v"},
            "whenMatched": [{"$set": {"v": {"$add": ["$v", "$$delta"]}}}],
            "whenNotMatched": [{"$set": {"v": {"$multiply": ["$$delta", -1]}}}],
        }}])
        assert {r["_id"]: r["v"] for r in out.collect()} == {1: 107.0, 9: -3.0}

    def test_merge_insert_pipeline_cannot_set_key(self, spark, tmp_path):
        import pytest
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "t9")
        spark.createDataFrame([(1, 1.0)], "_id long, v double").write.parquet(path)
        src = spark.createDataFrame([(2, 2.0)], "_id long, v double")
        with pytest.raises(ValueError, match="cannot modify the 'on' key"):
            aggregate(src, [{"$merge": {
                "into": path, "on": "_id",
                "whenNotMatched": [{"$set": {"_id": 99}}],
            }}])

    def test_first_last_n_keep_nulls(self, spark):
        """$firstN/$lastN include null inputs (unlike $minN/$maxN, which
        skip them) — Mongo's documented asymmetry."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, 7.0)],
            "g string, seq int, v double",
        )
        out = aggregate(df.orderBy("seq"), [{"$group": {
            "_id": "$g",
            "f3": {"$firstN": {"input": "$v", "n": 3}},
            "l3": {"$lastN": {"input": "$v", "n": 3}},
            "lo2": {"$minN": {"input": "$v", "n": 2}},
        }}])
        r = out.collect()[0]
        assert list(r["f3"]) == [None, 5.0, None]
        assert list(r["l3"]) == [5.0, None, 7.0]
        assert list(r["lo2"]) == [5.0, 7.0]  # minN still skips nulls

    def test_shift_default_only_out_of_partition(self, spark):
        """$shift substitutes `default` only when the target POSITION is
        outside the partition — a legitimately-null shifted value stays
        null."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, None), ("a", 3, 30.0)],
            "g string, seq int, v double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"seq": 1},
            "output": {
                "nxt": {"$shift": {"output": "$v", "by": 1, "default": -1.0}},
                "prv": {"$shift": {"output": "$v", "by": -1, "default": -1.0}},
            },
        }}])
        got = {r["seq"]: (r["nxt"], r["prv"]) for r in out.collect()}
        assert got[1] == (None, -1.0)    # next value is a REAL null
        assert got[2] == (30.0, 10.0)
        assert got[3] == (-1.0, None)    # past the end → default; prev is real null

    def test_date_to_string_timezone(self, spark):
        """$dateToString timezone: Olson zones follow DST (spring-forward
        skips 02:xx, fall-back repeats 01:30), fixed offsets never shift."""
        import datetime as dt
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import (
            ExpressionCompiler,
        )

        rows = [
            (1, dt.datetime(2024, 3, 10, 6, 59)),   # 01:59 EST (UTC-5)
            (2, dt.datetime(2024, 3, 10, 7, 0)),    # 03:00 EDT — 02:xx skipped
            (3, dt.datetime(2024, 11, 3, 5, 30)),   # 01:30 EDT (first pass)
            (4, dt.datetime(2024, 11, 3, 6, 30)),   # 01:30 EST (repeated hour)
            (5, dt.datetime(2024, 6, 1, 0, 0)),     # 05:30 at +05:30
        ]
        df = spark.createDataFrame(rows, "id long, ts timestamp")
        ec = ExpressionCompiler(df)
        out = df.select(
            "id",
            ec.compile({"$dateToString": {
                "date": "$ts", "format": "%Y-%m-%d %H:%M",
                "timezone": "America/New_York"}}).alias("ny"),
            ec.compile({"$dateToString": {
                "date": "$ts", "format": "%H:%M", "timezone": "+05:30"}}).alias("ist"),
        )
        got = {r["id"]: (r["ny"], r["ist"]) for r in out.collect()}
        assert got[1][0] == "2024-03-10 01:59"
        assert got[2][0] == "2024-03-10 03:00"
        assert got[3][0] == "2024-11-03 01:30"
        assert got[4][0] == "2024-11-03 01:30"
        assert got[5] == ("2024-05-31 20:00", "05:30")

    def test_set_window_fields_unit_range(self, spark):
        """Time-unit range frames: bounds scale to microseconds over
        unix_micros(sortBy) — a [-1, 0] hour frame at 12:30 covers 11:30+."""
        import datetime as dt
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        rows = [
            ("a", dt.datetime(2024, 1, 1, 10, 0), 1.0),
            ("a", dt.datetime(2024, 1, 1, 11, 45), 2.0),
            ("a", dt.datetime(2024, 1, 1, 12, 30), 4.0),
            ("a", dt.datetime(2024, 1, 1, 15, 0), 8.0),
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"ts": 1},
            "output": {"s": {"$sum": "$v",
                             "window": {"range": [-1, 0], "unit": "hour"}}},
        }}])
        got = {r["ts"].hour: r["s"] for r in out.collect()}
        assert got == {10: 1.0, 11: 2.0, 12: 6.0, 15: 8.0}

    def test_out_materializes_and_returns_table(self, spark, tmp_path):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
        path = str(tmp_path / "outcoll")
        out = aggregate(df, [{"$match": {"id": {"$gte": 2}}}, {"$out": path}])
        assert [(r["id"], r["s"]) for r in out.collect()] == [(2, "b")]
        assert [(r["id"], r["s"]) for r in spark.read.parquet(path).collect()] == [(2, "b")]


class TestExpressionOperatorExtensions:
    """$filter/$map/$reduce with $$vars, $switch, set/array ops, math,
    strings, dates — the expression surface a switching user expects."""

    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, [1, 2, 3, 4], "Hello World", -2.76, dt_ts("2017-03-15 14:10:30")),
            ],
            "id long, xs array<long>, s string, x double, ts timestamp",
        )

    def test_filter_map_reduce_with_vars(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = self._df(spark)
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$filter": {"input": "$xs", "as": "n", "cond": {"$gt": ["$$n", 2]}}}).alias("f"),
            ec.compile({"$map": {"input": "$xs", "as": "n", "in": {"$multiply": ["$$n", 10]}}}).alias("m"),
            ec.compile({"$reduce": {"input": "$xs", "initialValue": 0, "in": {"$add": ["$$value", "$$this"]}}}).alias("r"),
        ).collect()[0]
        assert list(row["f"]) == [3, 4]
        assert list(row["m"]) == [10, 20, 30, 40]
        assert row["r"] == 10

    def test_zip_shortest_and_longest(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [([1, 2, 3], [10, 20])], "a array<long>, b array<long>"
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$zip": {"inputs": ["$a", "$b"]}}).alias("short"),
            ec.compile({"$zip": {"inputs": ["$a", "$b"],
                                 "useLongestLength": True}}).alias("long_null"),
            ec.compile({"$zip": {"inputs": ["$a", "$b"],
                                 "useLongestLength": True,
                                 "defaults": [0, -1]}}).alias("long_dflt"),
        ).collect()[0]
        assert [list(x) for x in row["short"]] == [[1, 10], [2, 20]]
        assert [list(x) for x in row["long_null"]] == [[1, 10], [2, 20], [3, None]]
        assert [list(x) for x in row["long_dflt"]] == [[1, 10], [2, 20], [3, -1]]

    def test_zip_empty_input_gives_empty(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame([([1, 2], [])], "a array<long>, b array<long>")
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$zip": {"inputs": ["$a", "$b"]}}).alias("z")
        ).collect()[0]
        assert list(row["z"]) == []

    def test_replace_one_first_occurrence_only(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = self._df(spark)
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$replaceOne": {"input": "$s", "find": "l",
                                        "replacement": "L"}}).alias("one"),
            ec.compile({"$replaceOne": {"input": "$s", "find": "zzz",
                                        "replacement": "X"}}).alias("miss"),
            ec.compile({"$replaceOne": {"input": "$s", "find": ".",
                                        "replacement": "!"}}).alias("noregex"),
        ).collect()[0]
        assert row["one"] == "HeLlo World"  # only the FIRST 'l'
        assert row["miss"] == "Hello World"
        assert row["noregex"] == "Hello World"  # '.' is literal, not regex

    def test_date_to_string_computed_directives(self, spark):
        """%U/%j/%w/%V/%L splice computed columns between date_format
        segments — swept against Python strftime where it defines them."""
        import datetime as d
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        dates = [
            d.datetime(2016, 1, 1) + d.timedelta(days=i * 37, milliseconds=i * 111)
            for i in range(30)
        ]
        df = spark.createDataFrame([(x,) for x in dates], "ts timestamp")
        ec = ExpressionCompiler(df)
        rows = df.select(
            "ts",
            ec.compile({"$dateToString": {"format": "%Y-%m-%d %U %j %V", "date": "$ts"}}).alias("s"),
            ec.compile({"$dateToString": {"format": "%w", "date": "$ts"}}).alias("w"),
            ec.compile({"$dateToString": {"format": "%H:%M:%S.%L", "date": "$ts"}}).alias("t"),
        ).collect()
        for r in rows:
            ts = r["ts"]
            want = ts.strftime("%Y-%m-%d %U %j %V")
            assert r["s"] == want, (ts, r["s"], want)
            # Mongo %w: 1=Sunday..7=Saturday (strftime %w is 0=Sunday)
            assert int(r["w"]) == int(ts.strftime("%w")) + 1
            assert r["t"] == ts.strftime("%H:%M:%S.") + f"{ts.microsecond // 1000:03d}"

    def test_let_getfield_sortarray_firstn(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [(5.0, [3, 1, 4, 1, 5], {"inner": 42})],
            "x double, xs array<long>, doc struct<inner: long>",
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$let": {"vars": {"t": {"$multiply": ["$x", 2]}},
                                 "in": {"$add": ["$$t", 1]}}}).alias("let_out"),
            ec.compile({"$let": {"vars": {"a": 1},
                                 "in": {"$let": {"vars": {"a": 2},
                                                 "in": "$$a"}}}}).alias("shadow"),
            ec.compile({"$getField": {"field": "inner", "input": "$doc"}}).alias("gf"),
            ec.compile({"$sortArray": {"input": "$xs", "sortBy": 1}}).alias("asc"),
            ec.compile({"$sortArray": {"input": "$xs", "sortBy": -1}}).alias("desc"),
            ec.compile({"$firstN": {"input": "$xs", "n": 2}}).alias("f2"),
            ec.compile({"$lastN": {"input": "$xs", "n": 2}}).alias("l2"),
            ec.compile({"$firstN": {"input": "$xs", "n": 99}}).alias("fall"),
            ec.compile({"$lastN": {"input": "$xs", "n": 99}}).alias("lall"),
            ec.compile({"$cmp": ["$x", 5.0]}).alias("c0"),
            ec.compile({"$cmp": ["$x", 9.9]}).alias("cneg"),
        ).collect()[0]
        assert row["let_out"] == 11.0
        assert row["shadow"] == 2  # inner binding shadows, outer restored
        assert row["gf"] == 42
        assert list(row["asc"]) == [1, 1, 3, 4, 5]
        assert list(row["desc"]) == [5, 4, 3, 1, 1]
        assert list(row["f2"]) == [3, 1]
        assert list(row["l2"]) == [1, 5]  # order preserved, not reversed
        assert list(row["fall"]) == [3, 1, 4, 1, 5]
        assert list(row["lall"]) == [3, 1, 4, 1, 5]
        assert (row["c0"], row["cneg"]) == (0, -1)

    def test_date_add_diff_trunc(self, spark):
        import datetime as d
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        # Wed 2020-02-26 → +5 days crosses the 2020 leap day
        df = spark.createDataFrame(
            [(d.datetime(2020, 2, 26, 10, 30, 45), d.datetime(2020, 3, 3, 9, 0, 0), 1582713045000)],
            "a timestamp, b timestamp, ms long",
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$dateAdd": {"startDate": "$a", "unit": "day", "amount": 5}}).alias("plus5d"),
            ec.compile({"$dateAdd": {"startDate": "$a", "unit": "quarter", "amount": 1}}).alias("plusq"),
            ec.compile({"$dateSubtract": {"startDate": "$a", "unit": "hour", "amount": 11}}).alias("minus11h"),
            ec.compile({"$dateDiff": {"startDate": "$a", "endDate": "$b", "unit": "day"}}).alias("dd"),
            ec.compile({"$dateDiff": {"startDate": "$a", "endDate": "$b", "unit": "month"}}).alias("dm"),
            ec.compile({"$dateDiff": {"startDate": "$a", "endDate": "$b", "unit": "week"}}).alias("dw"),
            ec.compile({"$dateDiff": {"startDate": "$a", "endDate": "$b", "unit": "hour"}}).alias("dh"),
            ec.compile({"$dateTrunc": {"date": "$a", "unit": "month"}}).alias("tm"),
            ec.compile({"$dateTrunc": {"date": "$a", "unit": "week"}}).alias("tw"),
            ec.compile({"$toDate": "$ms"}).alias("td"),
        ).collect()[0]
        assert row["plus5d"] == d.datetime(2020, 3, 2, 10, 30, 45)
        assert row["plusq"] == d.datetime(2020, 5, 26, 10, 30, 45)
        assert row["minus11h"] == d.datetime(2020, 2, 25, 23, 30, 45)
        # boundary crossings, not elapsed units: 2/26 10:30 → 3/3 09:00 is
        # 5.94 elapsed days but SIX midnight crossings
        assert row["dd"] == 6
        assert row["dm"] == 1
        # Sunday boundaries: Sun 3/1 lies between → 1 week crossing
        assert row["dw"] == 1
        assert row["dh"] == 143  # 5 days 23 h of hour-boundary crossings
        assert row["tm"] == d.datetime(2020, 2, 1, 0, 0, 0)
        assert row["tw"] == d.datetime(2020, 2, 23, 0, 0, 0)  # Sunday start
        assert row["td"] == d.datetime(2020, 2, 26, 10, 30, 45)  # epoch-ms UTC

    def test_projection_slice_shorthands(self, spark):
        """Mongo projection-form $slice: first-n, last-n, [skip, n] with
        negative skip counting from the end."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore import DocumentCollection

        df = spark.createDataFrame([(1, [10, 20, 30, 40, 50])], "id long, xs array<long>")
        coll = DocumentCollection(df, "t")

        def sl(proj):
            return list(coll.find({}, {"xs": proj, "_id": 0}).collect()[0]["xs"])

        assert sl({"$slice": 2}) == [10, 20]
        assert sl({"$slice": -2}) == [40, 50]
        assert sl({"$slice": [1, 2]}) == [20, 30]
        assert sl({"$slice": [-3, 2]}) == [30, 40]

    def test_convert_and_is_number(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [("42", None, "not-a-number", 7.0)],
            "ok string, missing string, bad string, num double",
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$convert": {"input": "$ok", "to": "int"}}).alias("a"),
            ec.compile({"$convert": {"input": "$bad", "to": "int",
                                     "onError": -1}}).alias("b"),
            ec.compile({"$convert": {"input": "$missing", "to": "int",
                                     "onNull": 0}}).alias("c"),
            ec.compile({"$convert": {"input": "$bad", "to": "int"}}).alias("d"),
            ec.compile({"$isNumber": "$num"}).alias("n1"),
            ec.compile({"$isNumber": "$ok"}).alias("n2"),
            ec.compile({"$isNumber": 3}).alias("n3"),
        ).collect()[0]
        assert (row["a"], row["b"], row["c"], row["d"]) == (42, -1, 0, None)
        assert (row["n1"], row["n2"], row["n3"]) == (True, False, True)

    def test_date_diff_randomized_sweep(self, spark):
        """$dateDiff counts boundary crossings — swept over 120 seeded
        random datetime pairs against a pure-Python reference per unit."""
        import datetime as d
        import random

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        rng = random.Random(42)
        base = d.datetime(2019, 6, 15, 12, 0, 0)
        pairs = []
        for _ in range(120):
            s = base + d.timedelta(
                days=rng.randrange(-900, 900),
                hours=rng.randrange(0, 24),
                minutes=rng.randrange(0, 60),
                seconds=rng.randrange(0, 60),
            )
            e = s + d.timedelta(
                days=rng.randrange(-400, 400),
                hours=rng.randrange(0, 24),
                minutes=rng.randrange(0, 60),
            )
            pairs.append((s, e))

        def sunday(x: d.datetime) -> d.date:
            return (x - d.timedelta(days=(x.weekday() + 1) % 7)).date()

        def ref(s: d.datetime, e: d.datetime, unit: str) -> int:
            if unit == "year":
                return e.year - s.year
            if unit == "quarter":
                return (e.year - s.year) * 4 + ((e.month - 1) // 3 - (s.month - 1) // 3)
            if unit == "month":
                return (e.year - s.year) * 12 + (e.month - s.month)
            if unit == "day":
                return (e.date() - s.date()).days
            if unit == "week":
                return (sunday(e) - sunday(s)).days // 7
            trunc = {
                "hour": lambda x: x.replace(minute=0, second=0, microsecond=0),
                "minute": lambda x: x.replace(second=0, microsecond=0),
            }[unit]
            secs = {"hour": 3600, "minute": 60}[unit]
            delta = trunc(e) - trunc(s)
            return int(delta.total_seconds()) // secs

        df = spark.createDataFrame(pairs, "s timestamp, e timestamp")
        ec = ExpressionCompiler(df)
        units = ["year", "quarter", "month", "day", "week", "hour", "minute"]
        sel = [
            ec.compile({"$dateDiff": {"startDate": "$s", "endDate": "$e",
                                      "unit": u}}).alias(u)
            for u in units
        ]
        for r in df.select("s", "e", *sel).collect():
            for u in units:
                want = ref(r["s"], r["e"], u)
                assert r[u] == want, (u, r["s"], r["e"], r[u], want)

    def test_date_add_randomized_roundtrip(self, spark):
        """$dateAdd then $dateSubtract of the same amount round-trips for
        fixed-width units (day and smaller), across 60 seeded cases."""
        import datetime as d
        import random

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        rng = random.Random(7)
        rows = [
            (
                d.datetime(2020, 1, 1)
                + d.timedelta(days=rng.randrange(0, 1000), seconds=rng.randrange(86400)),
                rng.randrange(-500, 500),
            )
            for _ in range(60)
        ]
        df = spark.createDataFrame(rows, "t timestamp, amt long")
        ec = ExpressionCompiler(df)
        for unit, delta in (("day", d.timedelta(days=1)),
                            ("hour", d.timedelta(hours=1)),
                            ("minute", d.timedelta(minutes=1))):
            got = df.select(
                "t", "amt",
                ec.compile({"$dateAdd": {"startDate": "$t", "unit": unit,
                                         "amount": "$amt"}}).alias("fwd"),
                ec.compile({"$dateSubtract": {
                    "startDate": {"$dateAdd": {"startDate": "$t", "unit": unit,
                                               "amount": "$amt"}},
                    "unit": unit, "amount": "$amt"}}).alias("back"),
            ).collect()
            for r in got:
                assert r["fwd"] == r["t"] + r["amt"] * delta, (unit, r)
                assert r["back"] == r["t"], (unit, r)

    def test_week_matches_strftime_percent_U(self, spark):
        """Mongo $week == C strftime %U (Sunday-start, week 0 before the
        first Sunday) — swept across year boundaries and leap years."""
        import datetime as d
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        dates = [
            d.datetime(2016, 1, 1) + d.timedelta(days=i * 13) for i in range(60)
        ] + [d.datetime(y, 1, 1) for y in range(2014, 2026)] + [
            d.datetime(y, 12, 31) for y in range(2014, 2026)
        ]
        df = spark.createDataFrame([(x,) for x in dates], "ts timestamp")
        ec = ExpressionCompiler(df)
        got = [
            (r["ts"], r["w"], r["iso"])
            for r in df.select(
                "ts",
                ec.compile({"$week": "$ts"}).alias("w"),
                ec.compile({"$isoWeek": "$ts"}).alias("iso"),
            ).collect()
        ]
        for ts, w, iso in got:
            assert w == int(ts.strftime("%U")), ts
            assert iso == int(ts.strftime("%V")), ts

    def test_switch_and_math(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = self._df(spark)
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$switch": {
                "branches": [
                    {"case": {"$lt": ["$x", -10]}, "then": "low"},
                    {"case": {"$lt": ["$x", 0]}, "then": "neg"},
                ],
                "default": "pos",
            }}).alias("sw"),
            ec.compile({"$ceil": "$x"}).alias("ce"),
            ec.compile({"$floor": "$x"}).alias("fl"),
            ec.compile({"$trunc": ["$x", 1]}).alias("tr"),
            ec.compile({"$round": ["$x", 1]}).alias("ro"),
            ec.compile({"$pow": [2, 10]}).alias("pw"),
        ).collect()[0]
        assert row["sw"] == "neg"
        assert (row["ce"], row["fl"]) == (-2, -3)
        assert row["tr"] == -2.7  # toward zero
        assert row["ro"] == -2.8
        assert row["pw"] == 1024.0

    def test_set_ops_slice_range(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = self._df(spark)
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$setUnion": ["$xs", {"$literal": [4, 9]}]}).alias("u"),
            ec.compile({"$setIntersection": ["$xs", {"$literal": [2, 9]}]}).alias("i"),
            ec.compile({"$setDifference": ["$xs", {"$literal": [1, 2]}]}).alias("d"),
            ec.compile({"$slice": ["$xs", 2]}).alias("s1"),
            ec.compile({"$slice": ["$xs", -2]}).alias("s2"),
            ec.compile({"$slice": ["$xs", 1, 2]}).alias("s3"),
            ec.compile({"$range": [0, 5, 2]}).alias("r1"),
            ec.compile({"$range": [5, 0]}).alias("r2"),
            ec.compile({"$reverseArray": "$xs"}).alias("rv"),
        ).collect()[0]
        assert sorted(row["u"]) == [1, 2, 3, 4, 9]
        assert list(row["i"]) == [2]
        assert list(row["d"]) == [3, 4]
        assert (list(row["s1"]), list(row["s2"]), list(row["s3"])) == ([1, 2], [3, 4], [2, 3])
        assert list(row["r1"]) == [0, 2, 4]
        assert list(row["r2"]) == []
        assert list(row["rv"]) == [4, 3, 2, 1]

    def test_strings_and_dates(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = self._df(spark)
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$regexMatch": {"input": "$s", "regex": "^Hello"}}).alias("rm"),
            ec.compile({"$replaceAll": {"input": "$s", "find": "l", "replacement": "L"}}).alias("ra"),
            ec.compile({"$indexOfCP": ["$s", "World"]}).alias("ix"),
            ec.compile({"$indexOfCP": ["$s", "zzz"]}).alias("miss"),
            ec.compile({"$second": "$ts"}).alias("sec"),
            ec.compile({"$dayOfYear": "$ts"}).alias("doy"),
            ec.compile({"$dateToString": {"format": "%Y-%m-%d %H:%M", "date": "$ts"}}).alias("fmt"),
        ).collect()[0]
        assert row["rm"] is True
        assert row["ra"] == "HeLLo WorLd"
        assert (row["ix"], row["miss"]) == (6, -1)
        # substring operand may itself be an expression/path — it must be
        # COMPILED, not searched as the literal text "$needle"
        from pyspark.sql import functions as F

        df2 = df.withColumn("needle", F.lit("World"))
        ec2 = ExpressionCompiler(df2)
        row2 = df2.select(
            ec2.compile({"$indexOfCP": ["$s", "$needle"]}).alias("ix2")
        ).collect()[0]
        assert row2["ix2"] == 6
        assert (row["sec"], row["doy"]) == (30, 74)
        assert row["fmt"] == "2017-03-15 14:10"

    def test_redact_descend_prune_keep(self, spark):
        """$redact: per-level access-control tags — root PRUNE drops the row,
        nested PRUNE nulls the struct / removes the array element, DESCEND
        recurses, root KEEP short-circuits every nested rewrite."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [
                (1, ["G"], ("alpha", ["G"], ("x", ["TS"])),
                 [("a", ["G"]), ("b", ["TS"])]),
                (2, ["TS"], ("beta", ["G"], ("y", ["G"])), [("c", ["G"])]),
            ],
            "id long, tags array<string>, "
            "sub struct<name:string, tags:array<string>, "
            "inner:struct<v:string, tags:array<string>>>, "
            "items array<struct<k:string, tags:array<string>>>",
        )
        gate = {
            "$cond": [
                {"$gt": [{"$size": {"$setIntersection": ["$tags", ["G"]]}}, 0]},
                "$$DESCEND",
                "$$PRUNE",
            ]
        }
        rows = {r["id"]: r for r in aggregate(df, [{"$redact": gate}]).collect()}
        assert set(rows) == {1}  # doc 2's root tags=[TS] → row pruned
        r = rows[1]
        assert r["sub"]["name"] == "alpha"  # sub carries G → descended into
        assert r["sub"]["inner"] is None  # TS subtree pruned → null struct
        assert [e["k"] for e in r["items"]] == ["a"]  # TS element removed
        keep_gate = dict(gate)
        keep_gate = {"$cond": [gate["$cond"][0], "$$KEEP", "$$PRUNE"]}
        rows2 = {
            r["id"]: r for r in aggregate(df, [{"$redact": keep_gate}]).collect()
        }
        assert rows2[1]["sub"]["inner"]["v"] == "x"  # KEEP kept the TS subtree

    def test_documents_stage(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([(1,)], "id long")
        out = aggregate(
            df,
            [
                {"$documents": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]},
                {"$match": {"a": {"$gte": 2}}},
            ],
        )
        assert [r.asDict() for r in out.collect()] == [{"a": 2, "b": "y"}]
        import pytest

        with pytest.raises(ValueError, match="first stage"):
            aggregate(df, [{"$match": {}}, {"$documents": [{"a": 1}]}])

    def test_sort_array_document_sort_by(self, spark):
        """$sortArray with a document sortBy: struct elements ordered by
        multiple keys with ±1 directions, BSON null placement (null lowest),
        later keys breaking ties."""
        from pyspark.sql import functions as F

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [(1,)], "id long"
        ).select(
            F.expr(
                "array(named_struct('a', 2, 'b', 'x'),"
                "      named_struct('a', 1, 'b', 'z'),"
                "      named_struct('a', CAST(NULL AS INT), 'b', 'q'),"
                "      named_struct('a', 1, 'b', 'y'))"
            ).alias("xs")
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile(
                {"$sortArray": {"input": "$xs", "sortBy": {"a": 1, "b": -1}}}
            ).alias("s"),
            ec.compile(
                {"$sortArray": {"input": "$xs", "sortBy": {"a": -1, "b": 1}}}
            ).alias("d"),
        ).collect()[0]
        assert [(e["a"], e["b"]) for e in row["s"]] == [
            (None, "q"), (1, "z"), (1, "y"), (2, "x")
        ]
        assert [(e["a"], e["b"]) for e in row["d"]] == [
            (2, "x"), (1, "y"), (1, "z"), (None, "q")
        ]

    def test_min_max_n_median_percentile_array_forms(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [([5, 1, None, 9, 3], [1.0, 2.0, 3.0, 4.0], [])],
            "xs array<int>, ys array<double>, empty array<double>",
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$minN": {"input": "$xs", "n": 2}}).alias("mn"),
            ec.compile({"$maxN": {"input": "$xs", "n": 2}}).alias("mx"),
            ec.compile({"$maxN": {"input": "$xs", "n": 99}}).alias("mx_all"),
            ec.compile({"$median": {"input": "$ys", "method": "approximate"}}).alias("med"),
            ec.compile({"$percentile": {"input": "$ys", "p": [0.25, 0.5, 1.0],
                                        "method": "approximate"}}).alias("pct"),
            ec.compile({"$median": {"input": "$empty"}}).alias("med_empty"),
        ).collect()[0]
        assert list(row["mn"]) == [1, 3]
        assert list(row["mx"]) == [9, 5]
        assert list(row["mx_all"]) == [9, 5, 3, 1]  # nulls ignored
        assert row["med"] == 2.5  # R-7: (2+3)/2
        assert list(row["pct"]) == [1.75, 2.5, 4.0]
        assert row["med_empty"] is None

    def test_window_locf_and_linear_fill(self, spark):
        """$locf/$linearFill window operators (Mongo 5.3): gap fill inside
        $setWindowFields — LOCF carries the last non-null forward, linear
        interpolates by sortBy position, edges stay null."""
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", 0, None), ("a", 10, 1.0), ("a", 20, None), ("a", 30, 4.0),
             ("a", 40, None), ("b", 0, 7.0)],
            "g string, t int, v double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g",
            "sortBy": {"t": 1},
            "output": {
                "carried": {"$locf": "$v"},
                "interp": {"$linearFill": "$v"},
            },
        }}])
        got = {(r["g"], r["t"]): (r["carried"], r["interp"]) for r in out.collect()}
        assert got[("a", 0)] == (None, None)  # leading null stays null
        assert got[("a", 10)] == (1.0, 1.0)
        assert got[("a", 20)] == (1.0, 2.5)  # midpoint of 1.0 → 4.0
        assert got[("a", 30)] == (4.0, 4.0)
        assert got[("a", 40)] == (4.0, None)  # trailing: locf yes, linear no
        assert got[("b", 0)] == (7.0, 7.0)  # partitions independent
        with pytest.raises(ValueError, match="does not accept a window"):
            aggregate(df, [{"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"t": 1},
                "output": {"x": {"$locf": "$v",
                                 "window": {"documents": [-1, 0]}}},
            }}])
        with pytest.raises(ValueError, match="ascending"):
            aggregate(df, [{"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"t": -1},
                "output": {"x": {"$linearFill": "$v"}},
            }}])

    def test_bitwise_and_trim_chars(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [(12, 10, "xxhixx", " pad ")], "a long, b long, s string, p string"
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$bitAnd": ["$a", "$b"]}).alias("band"),
            ec.compile({"$bitOr": ["$a", "$b", 1]}).alias("bor"),
            ec.compile({"$bitXor": ["$a", "$b"]}).alias("bxor"),
            ec.compile({"$bitNot": "$a"}).alias("bnot"),
            ec.compile({"$trim": {"input": "$s", "chars": "x"}}).alias("t"),
            ec.compile({"$ltrim": {"input": "$s", "chars": "xh"}}).alias("lt"),
            ec.compile({"$rtrim": {"input": "$s", "chars": "x"}}).alias("rt"),
            ec.compile({"$trim": {"input": "$p"}}).alias("ws"),
        ).collect()[0]
        assert (row["band"], row["bor"], row["bxor"], row["bnot"]) == (8, 15, 6, -13)
        assert (row["t"], row["lt"], row["rt"]) == ("hi", "ixx", "xxhi")
        assert row["ws"] == "pad"

    def test_group_topn_mixed_direction_sort_by(self, spark):
        """Mixed-direction $topN sortBy — previously raised; now sorts each
        key in its own direction with BSON null-lowest placement."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("g", "a", 1, 10), ("g", "a", 2, 20), ("g", "b", 1, 30),
             ("g", "b", 2, 40), ("g", "c", None, 50)],
            "g string, k string, r int, v int",
        )
        out = aggregate(df, [{"$group": {
            "_id": "$g",
            # k ascending, then r DESCENDING: a2, a1, b2, b1, c(null r)...
            "picks": {"$topN": {"output": "$v", "n": 3,
                                "sortBy": {"k": 1, "r": -1}}},
            "worst": {"$bottom": {"output": "$v",
                                  "sortBy": {"k": 1, "r": -1}}},
        }}])
        row = out.collect()[0]
        assert list(row["picks"]) == [20, 10, 40]
        # bottom of (k asc, r desc) = last element = c with null r? no:
        # nulls sort LOWEST on r, and r is descending, so within k='c' null
        # is the bottom; 'c' is the largest k → bottom overall is v=50
        assert row["worst"] == 50

    def test_window_topn_median_percentile(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("g", 1, 5.0), ("g", 2, 1.0), ("g", 3, 9.0), ("g", 4, 3.0)],
            "g string, seq int, v double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"seq": 1},
            "output": {
                "top2": {"$topN": {"output": "$v", "n": 2,
                                   "sortBy": {"v": -1}}},
                "med_run": {"$median": {"input": "$v", "method": "approximate"},
                            "window": {"documents": ["unbounded", "current"]}},
                "p50_75": {"$percentile": {"input": "$v", "p": [0.5, 0.75],
                                           "method": "approximate"}},
            },
        }}])
        got = {r["seq"]: r for r in out.collect()}
        # whole-partition default frame: top-2 by v desc everywhere
        assert all(list(got[s]["top2"]) == [9.0, 5.0] for s in (1, 2, 3, 4))
        # running median over [5], [5,1], [5,1,9], [5,1,9,3]
        assert got[1]["med_run"] == 5.0
        assert got[2]["med_run"] == 3.0
        assert got[3]["med_run"] == 5.0
        assert got[4]["med_run"] == 4.0
        # R-7 over the whole partition: sorted [1,3,5,9]
        assert list(got[1]["p50_75"]) == [4.0, 6.0]

    def test_trig_angles_millisecond(self, spark):
        import math

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [(0.5, dt_ts("2019-02-28 13:45:30.123"))], "x double, ts timestamp"
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$sin": "$x"}).alias("sin"),
            ec.compile({"$cos": "$x"}).alias("cos"),
            ec.compile({"$tanh": "$x"}).alias("tanh"),
            ec.compile({"$asinh": "$x"}).alias("asinh"),
            ec.compile({"$atan2": ["$x", 1.0]}).alias("at2"),
            ec.compile({"$degreesToRadians": 180}).alias("rad"),
            ec.compile({"$radiansToDegrees": {"$literal": math.pi}}).alias("deg"),
            ec.compile({"$millisecond": "$ts"}).alias("ms"),
        ).collect()[0]
        assert abs(row["sin"] - math.sin(0.5)) < 1e-15
        assert abs(row["cos"] - math.cos(0.5)) < 1e-15
        assert abs(row["tanh"] - math.tanh(0.5)) < 1e-15
        assert abs(row["asinh"] - math.asinh(0.5)) < 1e-15
        assert abs(row["at2"] - math.atan2(0.5, 1.0)) < 1e-15
        assert abs(row["rad"] - math.pi) < 1e-15
        assert abs(row["deg"] - 180.0) < 1e-12
        assert row["ms"] == 123

    def test_set_predicates_and_merge_objects(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [([1, 2, 3], [3, 2, 1, 1], {"a": 1, "b": 2}, {"b": 9, "c": 3})],
            "xs array<long>, ys array<long>, m1 map<string,long>, m2 map<string,long>",
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$setEquals": ["$xs", "$ys"]}).alias("eq"),
            ec.compile({"$setEquals": ["$xs", [1, 2]]}).alias("neq"),
            ec.compile({"$setIsSubset": [[1, 3], "$xs"]}).alias("sub"),
            ec.compile({"$setIsSubset": [[1, 9], "$xs"]}).alias("nsub"),
            ec.compile({"$allElementsTrue": ["$xs"]}).alias("allt"),
            ec.compile({"$allElementsTrue": [[1, 0]]}).alias("allf"),
            ec.compile({"$anyElementTrue": [[0, 0]]}).alias("anyf"),
            ec.compile({"$anyElementTrue": [[0, 2]]}).alias("anyt"),
            ec.compile({"$mergeObjects": ["$m1", "$m2"]}).alias("mo"),
        ).collect()[0]
        assert row["eq"] is True and row["neq"] is False
        assert row["sub"] is True and row["nsub"] is False
        assert row["allt"] is True and row["allf"] is False
        assert row["anyf"] is False and row["anyt"] is True
        # map form: later keys win, earlier survive
        assert row["mo"] == {"a": 1, "b": 9, "c": 3}

    def test_merge_objects_structs_null_ignored(self, spark):
        """Struct-typed $mergeObjects: schema-static rebuild; a NULL operand
        document is skipped entirely (Mongo ignores null/missing docs)."""
        from pyspark.sql import functions as F

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame([(1,), (2,)], "id long").select(
            "id",
            F.struct(F.lit(1).alias("a"), F.lit(2).alias("b")).alias("s1"),
            F.when(
                F.col("id") == 1,
                F.struct(F.lit(9).alias("b"), F.lit(3).alias("c")),
            ).alias("s2"),
        )
        ec = ExpressionCompiler(df)
        got = {
            r["id"]: r["mo"].asDict()
            for r in df.select(
                "id", ec.compile({"$mergeObjects": ["$s1", "$s2"]}).alias("mo")
            ).collect()
        }
        assert got[1] == {"a": 1, "b": 9, "c": 3}
        assert got[2] == {"a": 1, "b": 2, "c": None}  # null s2 ignored

    def test_type_tobool_bytes_first_last(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [(1, 2.5, "héllo", [7, 8, 9], None)],
            "id long, x double, u string, xs array<long>, gone string",
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$type": "$id"}).alias("t_long"),
            ec.compile({"$type": "$x"}).alias("t_dbl"),
            ec.compile({"$type": "$xs"}).alias("t_arr"),
            ec.compile({"$type": "$gone"}).alias("t_null"),
            ec.compile({"$type": "$nosuch"}).alias("t_missing"),
            ec.compile({"$toBool": "$x"}).alias("tb_num"),
            ec.compile({"$toBool": "$u"}).alias("tb_str"),
            ec.compile({"$toBool": "$gone"}).alias("tb_null"),
            ec.compile({"$toDecimal": "$x"}).alias("dec"),
            ec.compile({"$strLenBytes": "$u"}).alias("slb"),
            ec.compile({"$strLenCP": "$u"}).alias("slc"),
            ec.compile({"$substrBytes": ["$u", 0, 3]}).alias("ssb"),
            ec.compile({"$binarySize": "$u"}).alias("bs"),
            ec.compile({"$first": "$xs"}).alias("fst"),
            ec.compile({"$last": "$xs"}).alias("lst"),
            ec.compile({"$first": {"$literal": []}}).alias("fst_empty"),
        ).collect()[0]
        assert row["t_long"] == "long" and row["t_dbl"] == "double"
        assert row["t_arr"] == "array" and row["t_null"] == "null"
        assert row["t_missing"] == "missing"
        assert row["tb_num"] is True and row["tb_str"] is True
        assert row["tb_null"] is None
        assert float(row["dec"]) == 2.5
        # é is 2 UTF-8 bytes: byte length 6 vs codepoint length 5
        assert (row["slb"], row["slc"]) == (6, 5)
        assert row["ssb"] == "hé" and row["bs"] == 6
        assert (row["fst"], row["lst"]) == (7, 9)
        assert row["fst_empty"] is None

    def test_regex_find_and_find_all(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [("a1b22c333", "k=1;j=22", "aXaXa")], "s string, kv string, t string"
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$regexFind": {"input": "$s", "regex": r"(\d+)c"}}).alias("rf"),
            ec.compile({"$regexFind": {"input": "$s", "regex": "zz"}}).alias("rf_miss"),
            ec.compile({"$regexFindAll": {"input": "$s", "regex": r"\d+"}}).alias("rfa"),
            ec.compile({"$regexFindAll": {"input": "$kv", "regex": r"(\w)=(\d+)"}}).alias("rfa_caps"),
            ec.compile({"$regexFindAll": {"input": "$t", "regex": "a"}}).alias("rfa_rep"),
        ).collect()[0]
        assert row["rf"].asDict() == {"match": "22c", "idx": 3, "captures": ["22"]}
        assert row["rf_miss"] is None
        assert [e.asDict() for e in row["rfa"]] == [
            {"match": "1", "idx": 1, "captures": []},
            {"match": "22", "idx": 3, "captures": []},
            {"match": "333", "idx": 6, "captures": []},
        ]
        assert [e.asDict() for e in row["rfa_caps"]] == [
            {"match": "k=1", "idx": 0, "captures": ["k", "1"]},
            {"match": "j=22", "idx": 4, "captures": ["j", "22"]},
        ]
        # repeated identical matches: the positional fold must advance past
        # each occurrence, not re-find the first
        assert [e["idx"] for e in row["rfa_rep"]] == [0, 2, 4]
        import pytest

        with pytest.raises(ValueError, match="backreference"):
            ec.compile({"$regexFindAll": {"input": "$s", "regex": r"(a)\1"}})

    def test_date_from_parts_to_parts_from_string(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [(dt_ts("2019-02-28 13:45:30.123"),)], "ts timestamp"
        )
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$dateFromParts": {"year": 2017, "month": 2, "day": 31}}).alias("carry"),
            ec.compile({"$dateFromParts": {"year": 2017, "month": 14, "day": 1}}).alias("mcarry"),
            ec.compile({"$dateFromParts": {"year": 2017, "month": 3, "day": 0}}).alias("dzero"),
            ec.compile({"$dateFromParts": {
                "year": 2017, "month": 6, "day": 5, "hour": 10, "minute": 20,
                "second": 30, "millisecond": 250,
            }}).alias("full"),
            ec.compile({"$dateToParts": {"date": "$ts"}}).alias("parts"),
            ec.compile({"$dateFromString": {
                "dateString": "2021-01-02 03:04:05", "format": "%Y-%m-%d %H:%M:%S",
            }}).alias("dfs"),
            # onError must unify with the timestamp result type in a typed
            # engine (a string fallback would be coerced-and-cast by Spark)
            ec.compile({"$dateFromString": {
                "dateString": "not a date",
                "onError": {"$dateFromParts": {"year": 1970}},
            }}).alias("dfs_err"),
        ).collect()[0]
        # Mongo's documented carry: 2017-02-31 → 2017-03-03
        assert str(row["carry"]) == "2017-03-03 00:00:00"
        assert str(row["mcarry"]) == "2018-02-01 00:00:00"  # month 14 → Feb next yr
        assert str(row["dzero"]) == "2017-02-28 00:00:00"  # day 0 → prev month end
        assert str(row["full"]) == "2017-06-05 10:20:30.250000"
        assert row["parts"].asDict() == {
            "year": 2019, "month": 2, "day": 28,
            "hour": 13, "minute": 45, "second": 30, "millisecond": 123,
        }
        assert str(row["dfs"]) == "2021-01-02 03:04:05"
        assert str(row["dfs_err"]) == "1970-01-01 00:00:00"

    def test_date_from_parts_roundtrips_date_to_parts(self, spark):
        """Random instants: $dateToParts → $dateFromParts is the identity."""
        import random

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        rng = random.Random(77)
        base = dt_ts("2000-01-01 00:00:00")
        import datetime

        rows = [
            (base + datetime.timedelta(seconds=rng.randrange(0, 10**9),
                                       milliseconds=rng.randrange(0, 1000)),)
            for _ in range(50)
        ]
        df = spark.createDataFrame(rows, "ts timestamp")
        ec = ExpressionCompiler(df)
        parts = {
            k: {"$getField": {"input": "$p", "field": k}}
            for k in ("year", "month", "day", "hour", "minute", "second", "millisecond")
        }
        out = (
            df.select("ts", ec.compile({"$dateToParts": "$ts"}).alias("p"))
            .select("ts", ExpressionCompiler(df).compile(
                {"$dateFromParts": parts}).alias("back"))
        )
        bad = out.where("ts <> back").count()
        assert bad == 0

    def test_set_field_unset_field(self, spark):
        """$setField add/replace/$$REMOVE and $unsetField over struct docs,
        including a literal DOTTED field name ('$path' can't reach those)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [(1, (10, 2.5)), (2, (20, 7.5))],
            "_id long, d struct<`a.b`: long, price: double>",
        )
        out = aggregate(df, [{"$project": {
            "_id": 1,
            "repl": {"$setField": {"field": "price", "input": "$d", "value": 0.0}},
            "added": {"$setField": {"field": "tag", "input": "$d", "value": "x"}},
            "removed": {"$setField": {"field": "price", "input": "$d",
                                      "value": "$$REMOVE"}},
            "unset": {"$unsetField": {"field": "a.b", "input": "$d"}},
            "dotted": {"$getField": {"field": "a.b", "input": "$d"}},
        }}])
        r = {row["_id"]: row for row in out.collect()}
        assert r[1]["repl"].asDict() == {"a.b": 10, "price": 0.0}
        assert r[1]["added"].asDict() == {"a.b": 10, "price": 2.5, "tag": "x"}
        assert r[1]["removed"].asDict() == {"a.b": 10}
        assert r[2]["unset"].asDict() == {"price": 7.5}
        assert r[2]["dotted"] == 20

    def test_iso_day_of_week_and_iso_week_year(self, spark):
        """ISO weekday (1=Mon..7=Sun) and ISO week-owning year around a
        year boundary: 2021-01-01 (Friday) belongs to ISO week-year 2020;
        2019-12-30 (Monday) belongs to 2020."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("2021-01-01",), ("2019-12-30",), ("2020-06-15",), ("2023-01-01",)],
            "d string",
        )
        out = aggregate(df, [{"$project": {
            "d": 1,
            "dow": {"$isoDayOfWeek": {"$toDate": "$d"}},
            "wy": {"$isoWeekYear": {"$toDate": "$d"}},
        }}])
        got = {r["d"]: (r["dow"], r["wy"]) for r in out.collect()}
        assert got["2021-01-01"] == (5, 2020)   # Friday of ISO week 53/2020
        assert got["2019-12-30"] == (1, 2020)   # Monday of ISO week 1/2020
        assert got["2020-06-15"] == (1, 2020)
        assert got["2023-01-01"] == (7, 2022)   # Sunday of ISO week 52/2022


def dt_ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


class TestFindOperatorExtensions:
    def test_all_requires_every_member(self, autos):
        got = {r["name"] for r in autos.find({"assembly": {"$all": ["Germany", "Finland"]}}).collect()}
        assert got == {"Porsche 911"}
        got1 = {r["name"] for r in autos.find({"assembly": {"$all": ["Germany"]}}).collect()}
        assert got1 == {"Porsche 356", "Porsche 911"}

    def test_mod(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore import DocumentCollection

        df = spark.createDataFrame([(i,) for i in range(10)], "n long")
        c = DocumentCollection(df, "nums")
        got = {r["n"] for r in c.find({"n": {"$mod": [3, 1]}}).collect()}
        assert got == {1, 4, 7}

    def test_type_static_schema_semantics(self, autos):
        assert autos.find({"name": {"$type": "string"}}).count() == 5
        assert autos.find({"name": {"$type": "double"}}).count() == 0
        assert autos.find({"assembly": {"$type": "array"}}).count() == 5
        assert autos.find({"dimensions": {"$type": "object"}}).count() == 5

    def test_in_nin_with_null_in_list(self, spark):
        """Mongo: null in a $in list matches null/missing fields; $nin with
        null must therefore EXCLUDE them (ADVICE r5 — the old coalesce-true
        wrongly matched null fields for {$nin: [null]})."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore import DocumentCollection

        df = spark.createDataFrame(
            [(1, "a", [1, 2]), (2, None, None), (3, "b", [3])],
            "_id long, s string, xs array<long>",
        )
        c = DocumentCollection(df, "t")
        assert {r["_id"] for r in c.find({"s": {"$in": [None]}}).collect()} == {2}
        assert {r["_id"] for r in c.find({"s": {"$in": ["a", None]}}).collect()} == {1, 2}
        assert {r["_id"] for r in c.find({"s": {"$nin": [None]}}).collect()} == {1, 3}
        assert {r["_id"] for r in c.find({"s": {"$nin": ["a", None]}}).collect()} == {3}
        # without null in the list, $nin still matches null/missing fields
        assert {r["_id"] for r in c.find({"s": {"$nin": ["a"]}}).collect()} == {2, 3}
        # array fields: null-in-list matches a null/missing ARRAY
        assert {r["_id"] for r in c.find({"xs": {"$in": [None]}}).collect()} == {2}
        assert {r["_id"] for r in c.find({"xs": {"$in": [1, None]}}).collect()} == {1, 2}
        assert {r["_id"] for r in c.find({"xs": {"$nin": [3, None]}}).collect()} == {1}
        assert {r["_id"] for r in c.find({"xs": {"$nin": [9]}}).collect()} == {1, 2, 3}

    def test_text_search_terms_phrases_negation(self, spark):
        """$text: OR of terms on token membership; quoted phrases required
        (and alone decide the match); -negation always excludes;
        $caseSensitive opt-in."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore import DocumentCollection

        df = spark.createDataFrame(
            [(1, "the coffee shop sells cake"),
             (2, "CAKE and tea"),
             (3, "coffee beans wholesale"),
             (4, "tea house")],
            "_id long, body string",
        )
        c = DocumentCollection(df, "t")
        q = lambda s, **kw: {r["_id"] for r in c.find(
            {"$text": {"$search": s, "$path": "body", **kw}}).collect()}
        assert q("coffee cake") == {1, 2, 3}          # OR of terms
        assert q('"coffee shop" cake') == {1}          # phrase decides
        assert q("coffee -beans") == {1}               # negation excludes
        assert q("cake", **{"$caseSensitive": True}) == {1}
        assert q("CAKE", **{"$caseSensitive": True}) == {2}
        import pytest
        with pytest.raises(ValueError, match="positive term"):
            q("-only -negations")
        with pytest.raises(ValueError, match="names the indexed field"):
            c.find({"$text": {"$search": "coffee"}})

    def test_bitwise_query_operators(self, spark):
        """$bitsAllSet/$bitsAnySet/$bitsAllClear/$bitsAnyClear: int bitmask
        or list-of-positions mask; null fields never match (even under $nor)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore import DocumentCollection

        df = spark.createDataFrame(
            [(1, 0b1010), (2, 0b0110), (3, 0b0000), (4, None)],
            "_id long, flags long",
        )
        c = DocumentCollection(df, "t")
        q = lambda spec: {r["_id"] for r in c.find({"flags": spec}).collect()}
        assert q({"$bitsAllSet": 0b0010}) == {1, 2}
        assert q({"$bitsAllSet": [1, 3]}) == {1}        # positions 1,3 = 0b1010
        assert q({"$bitsAnySet": 0b1100}) == {1, 2}
        assert q({"$bitsAllClear": 0b0101}) == {1, 3}
        assert q({"$bitsAnyClear": 0b1010}) == {2, 3}
        # Mongo $nor matches docs where NO clause matches — null rows qualify,
        # which requires the bit predicates to be total (coalesce-false)
        assert {r["_id"] for r in c.find({"$nor": [{"flags": {"$bitsAnySet": 0b1111}}]}).collect()} == {3, 4}


class TestAdviceR5Regressions:
    def test_merge_pipeline_single_stage_snapshot(self, spark, tmp_path):
        """All expressions in ONE $set stage read the STAGE'S INPUT:
        {$set: {a: 1, b: "$a"}} gives b = ORIGINAL a (Mongo), not 1."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        path = str(tmp_path / "snap")
        spark.createDataFrame([(1, 10.0, 0.0)], "_id long, a double, b double").write.parquet(path)
        src = spark.createDataFrame([(1,)], "_id long")
        out = aggregate(src, [{"$merge": {
            "into": path, "on": "_id",
            "whenMatched": [{"$set": {"a": 1.0, "b": "$a"}}],
        }}])
        r = out.collect()[0]
        assert (r["a"], r["b"]) == (1.0, 10.0)  # b sees the ORIGINAL a
        # ...but a SECOND stage sees stage 1's result
        path2 = str(tmp_path / "snap2")
        spark.createDataFrame([(1, 10.0, 0.0)], "_id long, a double, b double").write.parquet(path2)
        out2 = aggregate(src, [{"$merge": {
            "into": path2, "on": "_id",
            "whenMatched": [{"$set": {"a": 1.0}}, {"$set": {"b": "$a"}}],
        }}])
        r2 = out2.collect()[0]
        assert (r2["a"], r2["b"]) == (1.0, 1.0)

    def test_range_window_rejects_descending_sort(self, spark):
        """mongod validates that a range/unit window's sortBy is ascending."""
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([("a", 1, 1.0), ("a", 2, 2.0)], "g string, k int, v double")
        with pytest.raises(ValueError, match="ascending"):
            aggregate(df, [{"$setWindowFields": {
                "partitionBy": "$g",
                "sortBy": {"k": -1},
                "output": {"s": {"$sum": "$v", "window": {"range": [-1, 0]}}},
            }}]).collect()


class TestCalendarUnits:
    """Calendar (month/quarter/year) units for $densify and $setWindowFields
    range frames — new r6 (VERDICT r5 ask #1).  Interval arithmetic with
    Mongo's clamp-to-month-end $dateAdd semantics."""

    def _ts(self, y, m, d=1):
        import datetime as dt

        return dt.datetime(y, m, d)

    def test_densify_monthly_partition(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", self._ts(2024, 1), 1.0), ("a", self._ts(2024, 4), 2.0),
             ("b", self._ts(2024, 2), 5.0)],
            "g string, ts timestamp, v double",
        )
        out = aggregate(df, [{"$densify": {
            "field": "ts",
            "range": {"step": 1, "unit": "month", "bounds": "partition",
                      "partitionByFields": ["g"]},
        }}]).orderBy("g", "ts").collect()
        assert [(r["g"], r["ts"].month, r["v"]) for r in out] == [
            ("a", 1, 1.0), ("a", 2, None), ("a", 3, None), ("a", 4, 2.0),
            ("b", 2, 5.0),
        ]

    def test_densify_quarter_and_year_full_bounds(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", self._ts(2022, 1), 1.0), ("b", self._ts(2023, 1), 2.0)],
            "g string, ts timestamp, v double",
        )
        out = aggregate(df, [{"$densify": {
            "field": "ts",
            "range": {"step": 1, "unit": "quarter", "bounds": "full",
                      "partitionByFields": ["g"]},
        }}])
        # full bounds: both partitions span the GLOBAL 2022-01..2023-01 —
        # 5 quarterly steps × 2 partitions
        assert out.count() == 10
        out2 = aggregate(df, [{"$densify": {
            "field": "ts",
            "range": {"step": 1, "unit": "year", "bounds": "full",
                      "partitionByFields": ["g"]},
        }}])
        assert out2.count() == 4

    def test_densify_month_end_clamp(self, spark):
        """Jan 31 + k months clamps to month end (Spark computes start +
        k·step months — documented divergence from Mongo's iterative add
        only ABOVE day 28)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", self._ts(2024, 1, 31), 1.0), ("a", self._ts(2024, 4, 30), 2.0)],
            "g string, ts timestamp, v double",
        )
        out = aggregate(df, [{"$densify": {
            "field": "ts",
            "range": {"step": 1, "unit": "month", "bounds": "partition",
                      "partitionByFields": ["g"]},
        }}]).orderBy("ts").collect()
        assert [(r["ts"].month, r["ts"].day) for r in out] == [
            (1, 31), (2, 29), (3, 31), (4, 30)]

    def test_window_month_range_frame(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", self._ts(2024, 1, 15), 1.0), ("a", self._ts(2024, 2, 10), 2.0),
             ("a", self._ts(2024, 2, 20), 4.0), ("a", self._ts(2024, 5, 1), 8.0),
             ("b", self._ts(2024, 1, 1), 16.0)],
            "g string, ts timestamp, v double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g",
            "sortBy": {"ts": 1},
            "output": {
                "s": {"$sum": "$v", "window": {"range": [-1, 0], "unit": "month"}},
                "nxt": {"$count": {}, "window": {"range": [0, 1], "unit": "quarter"}},
            },
        }}]).orderBy("g", "ts").collect()
        # trailing 1 month: Feb 10 sees Jan 15 (Feb10-1mo=Jan10 ≤ Jan15); Feb 20
        # sees Jan 20..Feb 20 → misses Jan 15; May 1 sees only itself
        assert [r["s"] for r in out] == [1.0, 3.0, 6.0, 8.0, 16.0]
        # forward quarter: Jan 15 sees through Apr 15 (3 rows); Feb 10 sees
        # through May 10 — including May 1 (3 rows)
        assert [r["nxt"] for r in out] == [3, 3, 2, 1, 1]

    def test_window_calendar_push_and_unbounded(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [("a", self._ts(2024, 1), 1.0), ("a", self._ts(2024, 3), None),
             ("a", self._ts(2024, 6), 3.0)],
            "g string, ts timestamp, v double",
        )
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g",
            "sortBy": {"ts": 1},
            "output": {
                "vs": {"$push": "$v",
                       "window": {"range": ["unbounded", "current"],
                                  "unit": "month"}},
            },
        }}]).orderBy("ts").collect()
        # $push keeps the null input (struct-wrap), like the fixed-unit path
        assert [r["vs"] for r in out] == [[1.0], [1.0, None], [1.0, None, 3.0]]

    def test_window_calendar_unsupported_op_raises(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([("a", self._ts(2024, 1), 1.0)],
                                   "g string, ts timestamp, v double")
        with pytest.raises(ValueError, match="calendar-unit"):
            aggregate(df, [{"$setWindowFields": {
                "sortBy": {"ts": 1},
                "output": {"x": {"$shift": {"output": "$v", "by": 1},
                                 "window": {"range": [-1, 0], "unit": "month"}}},
            }}]).collect()


class TestAdviceR7Regressions:
    """The four ADVICE r7 findings, locked as regressions."""

    def test_index_of_array_rejects_start_end(self, spark):
        """{$indexOfArray: [arr, x, start]} must raise, not silently search
        the whole array (ADVICE r7 medium)."""
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([([1, 2, 3],)], "xs array<long>")
        with pytest.raises(ValueError, match="start/end"):
            aggregate(df, [{"$project": {"i": {"$indexOfArray": ["$xs", 2, 1]}}}])

    def test_index_of_array_null_search(self, spark):
        """A null search value locates the first null ELEMENT (Mongo), not
        SQL-null; a null array stays null; absent null stays -1."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame(
            [(1, [10, None, None, 30]), (2, [1, 2]), (3, None)],
            "_id long, xs array<long>",
        )
        out = aggregate(df, [{"$project": {
            "_id": 1,
            "i_null": {"$indexOfArray": ["$xs", None]},
            "i_val": {"$indexOfArray": ["$xs", 30]},
        }}])
        got = {r["_id"]: (r["i_null"], r["i_val"]) for r in out.collect()}
        assert got[1] == (1, 3)
        assert got[2] == (-1, -1)
        assert got[3] == (None, None)

    def test_exp_moving_avg_compound_sortby(self, spark):
        """$expMovingAvg honors the FULL compound sortBy (ADVICE r7: only
        the first key was used) — ties on the first key break on the
        second, each with its own direction; asc nulls sort first."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        rows = [
            # (g, a, b, v): a has ties; b descending breaks them
            ("g", 1, 2, 10.0), ("g", 1, 9, 20.0), ("g", None, 1, 30.0),
            ("g", 2, 5, 40.0), ("g", 2, 7, 50.0),
        ]
        df = spark.createDataFrame(rows, "g string, a int, b int, v double")
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"a": 1, "b": -1},
            "output": {"e": {"$expMovingAvg": {"input": "$v", "alpha": 0.5}}},
        }}])
        # BSON order under {a:1, b:-1}: nulls first on a asc, then a=1 with
        # b desc (9 before 2), then a=2 (7 before 5)
        order = [30.0, 20.0, 10.0, 50.0, 40.0]
        ema, expect = None, {}
        for v in order:
            ema = v if ema is None else 0.5 * v + 0.5 * ema
            expect[v] = ema
        got = {r["v"]: r["e"] for r in out.collect()}
        assert got == expect

    def test_densify_explicit_bounds_empty_input(self, spark):
        """$densify with explicit [lower, upper) bounds generates the full
        spine even when the input collection is EMPTY (ADVICE r7: the
        extent row was seeded from df.limit(1))."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        df = spark.createDataFrame([], "x long, v double")
        out = aggregate(df, [{"$densify": {
            "field": "x", "range": {"step": 2, "bounds": [0, 7]}}}])
        assert sorted(r["x"] for r in out.collect()) == [0, 2, 4, 6]

    def test_pull_missing_field_and_null(self, spark):
        """$pull on a missing field is a no-op (was AnalysisException);
        $pull null drops null elements (array_remove returns null)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
            DocumentCollection,
        )

        df = spark.createDataFrame(
            [(1, [1, None, 2, None]), (2, None)], "_id long, xs array<long>"
        )
        c = DocumentCollection(df, "t")
        # missing field: unchanged frame, no analysis error
        out = c.update_many({}, {"$pull": {"nope": 1}}).df
        assert out.columns == df.columns and out.count() == 2
        got = {r["_id"]: (list(r["xs"]) if r["xs"] is not None else None)
               for r in c.update_many({}, {"$pull": {"xs": None}}).df.collect()}
        assert got == {1: [1, 2], 2: None}


class TestAggregatedLookup:
    """Interior $group (and $unwind) in the correlated $lookup sub-pipeline
    (VERDICT r7 ask #3): 'attach the count/sum of related docs', compiled
    as one join + two-level hash agg — never per-document."""

    def _frames(self, spark):
        cust = spark.createDataFrame(
            [(1, "alice"), (2, "bob"), (3, "carol")], "ck long, name string"
        )
        orders = spark.createDataFrame(
            [
                (1, "F", 10.0, ["a", "b"]),
                (1, "F", 20.0, ["a"]),
                (1, "O", 5.0, []),
                (2, "O", 7.0, None),
            ],
            "ock long, status string, price double, tags array<string>",
        )
        return cust, orders

    def test_group_count_sum(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust, orders = self._frames(spark)
        out = aggregate(cust, [{"$lookup": {
            "from": orders,
            "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$group": {"_id": "$status",
                            "n": {"$sum": 1},
                            "total": {"$sum": "$price"}}},
                {"$sort": {"_id": 1}},
            ],
            "as": "by_status",
        }}])
        got = {r["ck"]: [(e["_id"], e["n"], e["total"]) for e in r["by_status"]]
               for r in out.collect()}
        assert got == {
            1: [("F", 2, 30.0), ("O", 1, 5.0)],
            2: [("O", 1, 7.0)],
            3: [],  # no matches: empty sub-pipeline → []
        }

    def test_group_global_id_null(self, spark):
        """{_id: null} inside the lookup: one stats doc per local doc with
        matches, [] for docs without (mongod: $group over zero docs emits
        zero docs)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust, orders = self._frames(spark)
        out = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$group": {"_id": None, "n": {"$sum": 1},
                            "mx": {"$max": "$price"}}},
            ],
            "as": "stats",
        }}])
        got = {r["ck"]: [(e["n"], e["mx"]) for e in r["stats"]] for r in out.collect()}
        assert got == {1: [(3, 20.0)], 2: [(1, 7.0)], 3: []}

    def test_group_sort_limit_topk_groups(self, spark):
        """$sort + $limit after the interior $group: top-1 status by count
        (desc), ties broken by _id asc — array sliced AFTER the comparator
        sort."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust, orders = self._frames(spark)
        out = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$group": {"_id": "$status", "n": {"$sum": 1}}},
                {"$sort": {"n": -1, "_id": 1}},
                {"$limit": 1},
            ],
            "as": "top_status",
        }}])
        got = {r["ck"]: [(e["_id"], e["n"]) for e in r["top_status"]]
               for r in out.collect()}
        assert got == {1: [("F", 2)], 2: [("O", 1)], 3: []}

    def test_unwind_then_group(self, spark):
        """Interior $unwind before $group: per-customer tag frequencies.
        Default unwind semantics drop null/empty arrays (order ock=1 with
        tags=[] and ock=2 with tags=None contribute nothing)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust, orders = self._frames(spark)
        out = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$unwind": "$tags"},
                {"$group": {"_id": "$tags", "n": {"$sum": 1}}},
                {"$sort": {"_id": 1}},
            ],
            "as": "tag_counts",
        }}])
        got = {r["ck"]: [(e["_id"], e["n"]) for e in r["tag_counts"]]
               for r in out.collect()}
        assert got == {1: [("a", 2), ("b", 1)], 2: [], 3: []}

    def test_unwind_document_form_collect(self, spark):
        """$unwind WITHOUT $group: the collected array contains unwound
        docs (one element per array element), document form with
        preserveNullAndEmptyArrays."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust, orders = self._frames(spark)
        out = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": True}},
                {"$sort": {"price": 1, "tags": 1}},
                {"$project": {"price": 1, "tags": 1}},
            ],
            "as": "unwound",
        }}])
        got = {r["ck"]: [(e["price"], e["tags"]) for e in r["unwound"]]
               for r in out.collect()}
        assert got[1] == [(5.0, None), (10.0, "a"), (10.0, "b"), (20.0, "a")]
        assert got[2] == [(7.0, None)] and got[3] == []

    def test_compound_group_key(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust, orders = self._frames(spark)
        out = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$group": {"_id": {"s": "$status"}, "n": {"$sum": 1}}},
                {"$sort": {"_id.s": 1}},
            ],
            "as": "g",
        }}])
        got = {r["ck"]: [(e["_id"]["s"], e["n"]) for e in r["g"]] for r in out.collect()}
        assert got == {1: [("F", 2), ("O", 1)], 2: [("O", 1)], 3: []}

    def test_guards(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust, orders = self._frames(spark)
        # unwound field referenced by the join $expr → raise
        with pytest.raises(ValueError, match="conflicts with the join"):
            aggregate(cust, [{"$lookup": {
                "from": orders, "let": {"k": "$ck"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$tags", "$$k"]}}},
                    {"$unwind": "$tags"},
                    {"$group": {"_id": "$tags", "n": {"$sum": 1}}},
                ],
                "as": "x"}}])
        # $limit after $group without $sort → raise
        with pytest.raises(ValueError, match="needs a preceding"):
            aggregate(cust, [{"$lookup": {
                "from": orders, "let": {"k": "$ck"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                    {"$group": {"_id": "$status", "n": {"$sum": 1}}},
                    {"$limit": 2},
                ],
                "as": "x"}}])
        # residual stage after the aggregated tail → raise
        with pytest.raises(ValueError, match="residual stage"):
            aggregate(cust, [{"$lookup": {
                "from": orders, "let": {"k": "$ck"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                    {"$group": {"_id": "$status", "n": {"$sum": 1}}},
                    {"$sort": {"n": -1}},
                    {"$limit": 1},
                    {"$project": {"n": 1}},
                ],
                "as": "x"}}])


class TestLookupRowIdentity:
    """r9 (ADVICE r8): $lookup keys its join-back on an ephemeral row id —
    byte-identical local docs each keep their own result row (Mongo emits
    one per INPUT doc) and map-typed local columns no longer break the
    groupBy; the $unwind-vs-$expr conflict check walks the AST instead of
    substring-scanning the JSON dump."""

    def test_duplicate_local_docs_all_forms(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust = spark.createDataFrame(
            [(1, "alice"), (1, "alice"), (2, "bob")], "ck long, name string"
        )
        orders = spark.createDataFrame(
            [(1, "F", 10.0), (1, "O", 5.0), (2, "O", 7.0)],
            "ock long, status string, price double",
        )
        # equi-join form
        eq = aggregate(cust, [{"$lookup": {
            "from": orders, "localField": "ck", "foreignField": "ock",
            "as": "o"}}]).collect()
        assert len(eq) == 3
        assert sorted(len(r["o"]) for r in eq) == [1, 2, 2]
        # document pipeline form with $sort/$limit
        doc = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$sort": {"price": -1}},
                {"$limit": 1},
            ],
            "as": "top"}}]).collect()
        assert len(doc) == 3
        assert sorted(r["top"][0]["price"] for r in doc) == [7.0, 10.0, 10.0]
        # aggregated (interior $group) form
        grp = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$group": {"_id": "$status", "n": {"$sum": 1}}},
                {"$sort": {"_id": 1}},
            ],
            "as": "g"}}]).collect()
        assert len(grp) == 3
        both = [r for r in grp if r["ck"] == 1]
        assert len(both) == 2
        for r in both:
            assert [(e["_id"], e["n"]) for e in r["g"]] == [("F", 1), ("O", 1)]

    def test_map_typed_local_column(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust = spark.createDataFrame(
            [(1, {"tier": "gold"}), (2, {"tier": "basic"})],
            "ck long, attrs map<string,string>",
        )
        orders = spark.createDataFrame(
            [(1, 10.0), (1, 20.0)], "ock long, price double"
        )
        out = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$group": {"_id": None, "total": {"$sum": "$price"}}},
            ],
            "as": "g"}}]).collect()
        got = {r["ck"]: (dict(r["attrs"]), [e["total"] for e in r["g"]])
               for r in out}
        assert got == {1: ({"tier": "gold"}, [30.0]),
                       2: ({"tier": "basic"}, [])}

    def test_unwind_conflict_ast_walk(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust = spark.createDataFrame([(1,)], "ck long")
        orders = spark.createDataFrame(
            [(1, [5.0, 6.0], ["a", "b"])],
            "tag long, tags array<double>, items array<string>",
        )
        # prefix-sharing: condition references $tag, unwinding $tags — the
        # old '"$tag' substring scan false-raised here
        out = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$tag", "$$k"]}}},
                {"$unwind": "$tags"},
                {"$group": {"_id": None, "n": {"$sum": 1}}},
            ],
            "as": "x"}}]).collect()
        assert [e["n"] for e in out[0]["x"]] == [2]
        # a string LITERAL containing '$items' must not trip the check
        out2 = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$and": [
                    {"$eq": ["$tag", "$$k"]},
                    {"$ne": [{"$literal": "$items"}, "x"]},
                ]}}},
                {"$unwind": "$items"},
                {"$group": {"_id": "$items", "n": {"$sum": 1}}},
                {"$sort": {"_id": 1}},
            ],
            "as": "y"}}]).collect()
        assert [(e["_id"], e["n"]) for e in out2[0]["y"]] == [("a", 1), ("b", 1)]
        # a REAL conflict (condition reads the unwound field) still raises
        with pytest.raises(ValueError, match="conflicts with the join"):
            aggregate(cust, [{"$lookup": {
                "from": orders, "let": {"k": "$ck"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$items", "$$k"]}}},
                    {"$unwind": "$items"},
                    {"$group": {"_id": None, "n": {"$sum": 1}}},
                ],
                "as": "z"}}])


class TestAggregatedLookupProject:
    """Trailing $project after the interior $group (r8): include/rename of
    group-output fields, _id rides along unless excluded."""

    def test_project_rename_and_sort_on_projected(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust = spark.createDataFrame([(1,), (2,)], "ck long")
        orders = spark.createDataFrame(
            [(1, "F", 10.0), (1, "F", 20.0), (1, "O", 5.0), (2, "O", 7.0)],
            "ock long, status string, price double",
        )
        out = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$group": {"_id": "$status", "n": {"$sum": 1},
                            "total": {"$sum": "$price"}}},
                {"$project": {"status": "$_id", "n": 1, "_id": 0}},
                {"$sort": {"n": -1, "status": 1}},
            ],
            "as": "g",
        }}])
        got = {r["ck"]: [tuple(e.asDict().items()) for e in r["g"]]
               for r in out.collect()}
        # projected docs contain ONLY (status, n); sorted by projected names
        assert got[1] == [
            (("status", "F"), ("n", 2)), (("status", "O"), ("n", 1))]
        assert got[2] == [(("status", "O"), ("n", 1))]

    def test_id_rides_along_by_default(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust = spark.createDataFrame([(1,)], "ck long")
        orders = spark.createDataFrame(
            [(1, "F", 10.0)], "ock long, status string, price double"
        )
        out = aggregate(cust, [{"$lookup": {
            "from": orders, "let": {"k": "$ck"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$group": {"_id": "$status", "n": {"$sum": 1}}},
                {"$project": {"n": 1}},
            ],
            "as": "g",
        }}])
        e = out.collect()[0]["g"][0]
        assert e["_id"] == "F" and e["n"] == 1

    def test_project_guards(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust = spark.createDataFrame([(1,)], "ck long")
        orders = spark.createDataFrame(
            [(1, "F", 10.0)], "ock long, status string, price double"
        )
        def run(pspec):
            return aggregate(cust, [{"$lookup": {
                "from": orders, "let": {"k": "$ck"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                    {"$group": {"_id": "$status", "n": {"$sum": 1}}},
                    {"$project": pspec},
                ], "as": "g"}}])
        with pytest.raises(ValueError, match="unknown group field"):
            run({"nope": 1})
        with pytest.raises(ValueError, match="include/rename"):
            run({"n": 0})
        with pytest.raises(ValueError, match="group-output field"):
            run({"x": "$price"})  # raw foreign field: gone after $group


class TestLookupSkipPaging:
    """$skip between $sort and $limit in the correlated $lookup document
    form (r8): 'the second page of related docs'."""

    def test_skip_limit_pages(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust = spark.createDataFrame([(1,), (2,), (3,)], "ck long")
        orders = spark.createDataFrame(
            [(1, 10.0), (1, 20.0), (1, 30.0), (1, 40.0), (2, 5.0)],
            "ock long, price double",
        )
        def page(skip, limit=None):
            pipe = [
                {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                {"$sort": {"price": -1}},
                {"$skip": skip},
            ]
            if limit is not None:
                pipe.append({"$limit": limit})
            pipe.append({"$project": {"price": 1}})
            out = aggregate(cust, [{"$lookup": {
                "from": orders, "let": {"k": "$ck"}, "pipeline": pipe, "as": "p"}}])
            return {r["ck"]: [e["price"] for e in r["p"]] for r in out.collect()}

        assert page(1, 2) == {1: [30.0, 20.0], 2: [], 3: []}
        assert page(0, 2) == {1: [40.0, 30.0], 2: [5.0], 3: []}
        # skip past every match: the doc still emits [], not a missing row
        assert page(3, 2) == {1: [10.0], 2: [], 3: []}
        assert page(9, 2) == {1: [], 2: [], 3: []}
        # $skip without $limit: the rest of the sorted list
        assert page(2) == {1: [20.0, 10.0], 2: [], 3: []}

    def test_skip_requires_sort(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust = spark.createDataFrame([(1,)], "ck long")
        orders = spark.createDataFrame([(1, 10.0)], "ock long, price double")
        with pytest.raises(ValueError, match="deterministic paging"):
            aggregate(cust, [{"$lookup": {
                "from": orders, "let": {"k": "$ck"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                    {"$skip": 1},
                ], "as": "p"}}])


class TestRegexFindAllIndices:
    """r8 regression: match indices are the regex engine's own positions
    (split-segment scan), not first-OCCURRENCE positions — \\bsun over
    'xsun sun' is at 5, not 1 (the old substring+position fold's answer)."""

    def test_true_match_positions_not_occurrences(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [("xsun sun moon sunny",)], "text string"
        )
        ec = ExpressionCompiler(df)
        got = [
            e.asDict()
            for e in df.select(
                ec.compile(
                    {"$regexFindAll": {"input": "$text", "regex": r"\bsun[a-z]*"}}
                ).alias("ms")
            ).collect()[0]["ms"]
        ]
        import re

        want = [
            {"match": m.group(), "idx": m.start(), "captures": []}
            for m in re.finditer(r"\bsun[a-z]*", "xsun sun moon sunny")
        ]
        assert got == want  # [('sun', 5), ('sunny', 14)]

    def test_random_texts_match_python_engine(self, spark):
        import random
        import re

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        rng = random.Random(5)
        texts = [
            " ".join(
                rng.choice(["sun", "xsun", "sunny", "asunder", "s", "moon", "su n"])
                for _ in range(rng.randrange(0, 12))
            )
            for _ in range(40)
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        ec = ExpressionCompiler(df)
        rows = df.select(
            "text",
            ec.compile(
                {"$regexFindAll": {"input": "$text", "regex": r"\bsun[a-z]*"}}
            ).alias("ms"),
        ).collect()
        for r in rows:
            got = [(e["match"], e["idx"]) for e in r["ms"]]
            want = [
                (m.group(), m.start())
                for m in re.finditer(r"\bsun[a-z]*", r["text"])
            ]
            assert got == want, r["text"]

    def test_zero_width_pattern_raises_at_runtime(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame([("abc",)], "text string")
        ec = ExpressionCompiler(df)
        with pytest.raises(Exception, match="zero-width"):
            df.select(
                ec.compile(
                    {"$regexFindAll": {"input": "$text", "regex": "x*"}}
                ).alias("ms")
            ).collect()


class TestExpMovingAvgRandomized:
    """Randomized lock on the r8 compound-sortBy fix: 200 rows, several
    partitions, heavy ties on the leading keys, mixed directions — Spark's
    bucketed grouped-pandas ewm vs the plain Python recurrence over the
    full BSON ordering."""

    def test_matches_python_recurrence(self, spark):
        import random

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        rng = random.Random(13)
        rows = []
        for i in range(200):
            rows.append((
                i,
                rng.choice(["p", "q", "r"]),          # partition
                rng.randrange(0, 6),                   # a: heavy ties
                rng.randrange(0, 4),                   # b: ties too
                i,                                     # c: unique tiebreak
                float(rng.randrange(-40, 40)) / 4.0,   # exact quarters
            ))
        df = spark.createDataFrame(rows, "_id long, g string, a int, b int, c int, v double")
        alpha = 0.25
        out = aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"a": 1, "b": -1, "c": 1},
            "output": {"e": {"$expMovingAvg": {"input": "$v", "alpha": alpha}}},
        }}])
        got = {r["_id"]: r["e"] for r in out.collect()}

        want = {}
        by_g: dict = {}
        for r in rows:
            by_g.setdefault(r[1], []).append(r)
        for g, rs in by_g.items():
            rs.sort(key=lambda r: (r[2], -r[3], r[4]))  # a asc, b desc, c asc
            ema = None
            for r in rs:
                ema = r[5] if ema is None else alpha * r[5] + (1 - alpha) * ema
                want[r[0]] = ema
        assert got == want


class TestAggregatedLookupSkip:
    """$skip (+$limit) after $sort in the aggregated $lookup form: paging
    over the sorted group array; fully-skipped arrays become []."""

    def test_skip_limit_over_groups(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        cust = spark.createDataFrame([(1,), (2,)], "ck long")
        orders = spark.createDataFrame(
            [(1, "A", 1.0), (1, "B", 2.0), (1, "C", 3.0), (2, "A", 4.0)],
            "ock long, s string, p double",
        )
        def run(tail):
            out = aggregate(cust, [{"$lookup": {
                "from": orders, "let": {"k": "$ck"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                    {"$group": {"_id": "$s", "n": {"$sum": 1}}},
                    {"$sort": {"_id": 1}},
                    *tail,
                ], "as": "g"}}])
            return {r["ck"]: [e["_id"] for e in r["g"]] for r in out.collect()}

        assert run([{"$skip": 1}, {"$limit": 1}]) == {1: ["B"], 2: []}
        assert run([{"$skip": 2}]) == {1: ["C"], 2: []}
        assert run([{"$skip": 9}]) == {1: [], 2: []}
        import pytest

        with pytest.raises(ValueError, match="deterministic paging"):
            aggregate(cust, [{"$lookup": {
                "from": orders, "let": {"k": "$ck"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$ock", "$$k"]}}},
                    {"$group": {"_id": "$s", "n": {"$sum": 1}}},
                    {"$skip": 1},
                ], "as": "g"}}])


class TestProjectionElemMatch:
    """Projection-form $elemMatch (r8): the array narrows to its FIRST
    matching element; no match / missing array → null."""

    def test_elem_match_projection(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
            DocumentCollection,
        )

        rows = [
            (1, [1, 5, 9, 5]), (2, [2, 3]), (3, None), (4, []),
        ]
        df = spark.createDataFrame(rows, "_id long, xs array<long>")
        out = DocumentCollection(df, "t").find(
            {}, {"_id": 1, "xs": {"$elemMatch": {"$gte": 5}}}
        )
        got = {r["_id"]: (list(r["xs"]) if r["xs"] is not None else None)
               for r in out.collect()}
        assert got == {1: [5], 2: None, 3: None, 4: None}

    def test_elem_match_projection_subdoc(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
            DocumentCollection,
        )

        rows = [(1, [(1, "a"), (7, "b"), (9, "c")]), (2, [(2, "x")])]
        df = spark.createDataFrame(
            rows, "_id long, xs array<struct<k:long,v:string>>"
        )
        out = DocumentCollection(df, "t").find(
            {}, {"xs": {"$elemMatch": {"k": {"$gt": 5}}}}
        )
        got = {r["_id"]: ([e.asDict() for e in r["xs"]] if r["xs"] else None)
               for r in out.collect()}
        assert got == {1: [{"k": 7, "v": "b"}], 2: None}

    def test_two_elem_match_keys_independent(self, spark):
        """Loop-capture regression: two $elemMatch projections in one doc
        must each use their OWN condition."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
            DocumentCollection,
        )

        df = spark.createDataFrame(
            [(1, [1, 8], [3, 4])], "_id long, a array<long>, b array<long>"
        )
        out = DocumentCollection(df, "t").find(
            {}, {"a": {"$elemMatch": {"$gte": 5}}, "b": {"$elemMatch": {"$lte": 3}}}
        ).collect()[0]
        assert list(out["a"]) == [8] and list(out["b"]) == [3]


class TestArityGuards:
    """r8 sweep of the $indexOfArray silent-extra-operand class: every
    positional-args operator must raise on unsupported extras."""

    def test_index_of_cp_and_range_arity(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame([("abc",)], "s string")
        ec = ExpressionCompiler(df)
        with pytest.raises(ValueError, match="start/end"):
            ec.compile({"$indexOfCP": ["$s", "b", 1]})
        with pytest.raises(ValueError, match="2 or 3 operands"):
            ec.compile({"$range": [0, 10, 2, 99]})


class TestSplitLiteralDelimiter:
    """r8 bug fix: Mongo's $split delimiter is LITERAL, Spark's split() is
    regex — '.' must split on dots, not every character; '|' likewise;
    dynamic delimiter expressions quote via \\Q...\\E."""

    def test_literal_and_dynamic_delimiters(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [("a.b.c", "."), ("x|y|", "|"), ("k??v", "??"), ("plain", "-")],
            "s string, d string",
        )
        ec = ExpressionCompiler(df)
        rows = df.select(
            "s",
            ec.compile({"$split": ["$s", "."]}).alias("dot"),
            ec.compile({"$split": ["$s", "$d"]}).alias("dyn"),
        ).collect()
        got = {r["s"]: (list(r["dot"]), list(r["dyn"])) for r in rows}
        assert got["a.b.c"] == (["a", "b", "c"], ["a", "b", "c"])
        assert got["x|y|"] == (["x|y|"], ["x", "y", ""])  # trailing empty kept
        assert got["k??v"] == (["k??v"], ["k", "v"])
        assert got["plain"] == (["plain"], ["plain"])  # absent delim → whole

    def test_empty_delimiter_raises(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame([("abc",)], "s string")
        with pytest.raises(ValueError, match="non-empty"):
            ExpressionCompiler(df).compile({"$split": ["$s", ""]})

    def test_dynamic_delimiter_containing_backslash_e(self, spark):
        r"""r9 fix (VERDICT r8 item #3): a dynamic delimiter containing the
        literal sequence \E used to terminate the \Q...\E quote early and
        reinterpret the tail as regex; the Pattern.quote idiom
        (\E → \E\\E\Q) keeps the whole value literal."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        rows = [
            ("a\\Eb\\Ec", "\\E"),      # pure \E delimiter
            ("x\\E.y", "\\E."),        # regex metachar after the embedded \E
            ("p.q", "\\E."),           # old bug: tail '.' matched any char
            ("m\\En", "E"),            # plain 'E' must NOT match \E
        ]
        df = spark.createDataFrame(rows, "s string, d string")
        got = {
            r["s"]: list(r["parts"])
            for r in df.select(
                "s",
                ExpressionCompiler(df)
                .compile({"$split": ["$s", "$d"]})
                .alias("parts"),
            ).collect()
        }
        assert got["a\\Eb\\Ec"] == ["a", "b", "c"]
        assert got["x\\E.y"] == ["x", "y"]
        assert got["p.q"] == ["p.q"]
        assert got["m\\En"] == ["m\\", "n"]


class TestSubstrSemantics:
    """r8: $substr negative length → rest of string (Mongo), dynamic
    start/length expressions supported."""

    def test_negative_length_and_dynamic_operands(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [("hello world", 6, -1), ("hello world", 0, 5), (None, 0, 3)],
            "s string, st int, ln int",
        )
        ec = ExpressionCompiler(df)
        rows = df.select(
            ec.compile({"$substr": ["$s", 6, -1]}).alias("tail"),
            ec.compile({"$substr": ["$s", "$st", "$ln"]}).alias("dyn"),
        ).collect()
        got = [(r["tail"], r["dyn"]) for r in rows]
        assert got[0] == ("world", "world")
        assert got[1] == ("world", "hello")
        assert got[2] == ("", "")  # null input reads "" (Mongo)


class TestSliceElemAtEdges:
    """r8: $slice negative starts clamp to the array front (Mongo), and
    $arrayElemAt takes expression indices."""

    def test_slice_clamping(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame([(["a", "b", "c"],), (["a"],)], "xs array<string>")
        ec = ExpressionCompiler(df)
        rows = df.select(
            ec.compile({"$slice": ["$xs", -2]}).alias("last2"),
            ec.compile({"$slice": ["$xs", -5]}).alias("last5"),
            ec.compile({"$slice": ["$xs", -5, 2]}).alias("pos_neg5_n2"),
            ec.compile({"$slice": ["$xs", 1, 2]}).alias("pos1_n2"),
        ).collect()
        assert [list(r["last2"]) for r in rows] == [["b", "c"], ["a"]]
        assert [list(r["last5"]) for r in rows] == [["a", "b", "c"], ["a"]]
        # |pos| > size starts from the beginning (Mongo)
        assert [list(r["pos_neg5_n2"]) for r in rows] == [["a", "b"], ["a"]]
        assert [list(r["pos1_n2"]) for r in rows] == [["b", "c"], []]

    def test_array_elem_at_dynamic_index(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [(["a", "b", "c"], 1), (["a", "b", "c"], -1), (["a"], 5)],
            "xs array<string>, i int",
        )
        ec = ExpressionCompiler(df)
        rows = df.select(
            ec.compile({"$arrayElemAt": ["$xs", "$i"]}).alias("at_i"),
            ec.compile({"$arrayElemAt": [
                "$xs", {"$subtract": [{"$size": "$xs"}, 1]}]}).alias("last"),
        ).collect()
        assert [r["at_i"] for r in rows] == ["b", "c", None]
        assert [r["last"] for r in rows] == ["c", "c", "a"]


class TestFilterLimitOption:
    """r8: $filter limit (Mongo 5.2) — first n matches; unknown
    $filter/$map options raise."""

    def test_filter_limit(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame([([1, 8, 9, 2, 7],)], "xs array<long>")
        ec = ExpressionCompiler(df)
        row = df.select(
            ec.compile({"$filter": {
                "input": "$xs", "cond": {"$gte": ["$$this", 5]}, "limit": 2,
            }}).alias("two"),
            ec.compile({"$filter": {
                "input": "$xs", "as": "x",
                "cond": {"$gte": ["$$x", 5]},
                "limit": {"$add": [1, 0]},
            }}).alias("dyn"),
        ).collect()[0]
        assert list(row["two"]) == [8, 9] and list(row["dyn"]) == [8]
        import pytest

        with pytest.raises(ValueError, match="unsupported"):
            ec.compile({"$filter": {"input": "$xs", "cond": True, "bogus": 1}})
        with pytest.raises(ValueError, match="unsupported"):
            ec.compile({"$map": {"input": "$xs", "in": "$$this", "limit": 2}})

    def test_filter_limit_null_and_lt1(self, spark):
        """r9 fix (ADVICE r8): a DYNAMIC limit that evaluates to null at
        runtime behaves as absent (keep all matches), not a NULL array;
        limit < 1 raises — eagerly for constants, at runtime for
        expressions (mongod errors on both)."""
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [([1, 8, 9, 2, 7], None), ([4, 6], 1), ([1, 2], None)],
            "xs array<long>, lim long",
        )
        ec = ExpressionCompiler(df)
        rows = df.select(
            ec.compile({"$filter": {
                "input": "$xs", "cond": {"$gte": ["$$this", 5]}, "limit": "$lim",
            }}).alias("f"),
        ).collect()
        # third row: null limit over an EMPTY match result is [] — its
        # size(out)=0 fallback must not trip the <1 guard
        assert [list(r["f"]) for r in rows] == [[8, 9, 7], [6], []]
        with pytest.raises(ValueError, match=">= 1"):
            ec.compile({"$filter": {"input": "$xs", "cond": True, "limit": 0}})
        bad = spark.createDataFrame([([1, 2], 0)], "xs array<long>, lim long")
        with pytest.raises(Exception, match=">= 1"):
            bad.select(
                ExpressionCompiler(bad).compile({"$filter": {
                    "input": "$xs", "cond": True, "limit": "$lim",
                }}).alias("f")
            ).collect()


class TestDateOpOptionGuards:
    """r8: date ops refuse unknown options (a non-UTC timezone silently
    computed in UTC would be a wrong answer); explicit UTC passes."""

    def test_timezone_guards(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import ExpressionCompiler

        df = spark.createDataFrame(
            [("2024-01-15 10:00:00",)], "s string"
        ).selectExpr("CAST(s AS TIMESTAMP_NTZ) AS ts")
        ec = ExpressionCompiler(df)
        # explicit UTC accepted
        out = df.select(ec.compile({"$dateTrunc": {
            "date": "$ts", "unit": "day", "timezone": "UTC"}}).alias("d")).collect()
        assert str(out[0]["d"]).startswith("2024-01-15 00:00")
        for spec in (
            {"$dateTrunc": {"date": "$ts", "unit": "day", "timezone": "America/New_York"}},
            {"$dateAdd": {"startDate": "$ts", "unit": "day", "amount": 1, "timezone": "+05:00"}},
            {"$dateDiff": {"startDate": "$ts", "endDate": "$ts", "unit": "day", "startOfWeek": "monday"}},
        ):
            with pytest.raises(ValueError, match="unsupported"):
                ec.compile(spec)


class TestRegexOptions:
    """r8: find() {$regex, $options} sibling modifier — case-insensitive
    and multiline flags fold into the pattern as Java inline flags."""

    def test_options_flags(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.collection import (
            DocumentCollection,
        )

        df = spark.createDataFrame(
            [(1, "Hello World"), (2, "hello world"), (3, "line1\nstart here")],
            "_id long, s string",
        )
        c = DocumentCollection(df, "t")
        got = {r["_id"] for r in c.find({"s": {"$regex": "^hello"}}).collect()}
        assert got == {2}
        got = {r["_id"] for r in c.find(
            {"s": {"$regex": "^hello", "$options": "i"}}).collect()}
        assert got == {1, 2}
        got = {r["_id"] for r in c.find(
            {"s": {"$regex": "^start", "$options": "m"}}).collect()}
        assert got == {3}
        with pytest.raises(ValueError, match="unsupported .regex options"):
            c.find({"s": {"$regex": "x", "$options": "u"}})
        with pytest.raises(ValueError, match="sibling"):
            c.find({"s": {"$options": "i"}})
