"""Edge-case locks for $facet and $bucketAuto (VERDICT r9 ask #4): the two
compilers that compose whole sub-pipelines / round boundaries, exercised at
exactly the seams divergence hides in — empty input, all-null keys, ties at
bucket boundaries, single-value degeneracy — against hand-computed Mongo
semantics.

Contracts pinned (see _apply_bucket_auto's docstring):
- equal keys NEVER split across buckets (exact mode: min-ntile-per-peer
  coalescing; an all-identical keyspace is ONE bucket, not `buckets`
  arbitrary slices — pre-r10 the ntile split them);
- null keys are BSON-lowest: first bucket in both modes, `_id.min` null
  for a bucket containing nulls; granularity mode raises on null keys
  (mongod: granularity demands non-null numeric values);
- empty input → zero buckets (both modes), and an all-null keyspace is one
  all-null bucket;
- $facet over EMPTY input emits ONE document whose facet arrays are all []
  (group-stage facets obey the r7 {_id:null}-over-empty → zero-docs rule);
- $facet facets are independent sub-plans over the SAME input (1×1 cross
  join composition), and an unknown stage inside a facet raises.
"""

from __future__ import annotations

import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

PRICES_SCHEMA = "id long, price double"


def _df(spark, rows, schema=PRICES_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _buckets(out):
    return [
        (r["_id"]["min"], r["_id"]["max"], r["count"]) for r in out.collect()
    ]


class TestBucketAutoEdges:
    def test_ties_never_split_exact(self, spark):
        # 1,1,1,2 into 3 buckets: mongod fills [1,1], extends through the
        # tie → [1,1,1], then [2].  Two buckets, never a 1 split across.
        df = _df(spark, [(1, 1.0), (2, 1.0), (3, 1.0), (4, 2.0)])
        got = _buckets(aggregate(
            df, [{"$bucketAuto": {"groupBy": "$price", "buckets": 3}}]
        ))
        assert got == [(1.0, 1.0, 3), (2.0, 2.0, 1)]

    def test_all_identical_keys_one_bucket_exact(self, spark):
        df = _df(spark, [(i, 5.0) for i in range(7)])
        got = _buckets(aggregate(
            df, [{"$bucketAuto": {"groupBy": "$price", "buckets": 4}}]
        ))
        assert got == [(5.0, 5.0, 7)]

    def test_null_keys_first_bucket_exact(self, spark):
        # nulls are BSON-lowest → first bucket, whose _id.min is null
        df = _df(spark, [(1, None), (2, None), (3, 1.0), (4, 2.0), (5, 3.0), (6, 4.0)])
        got = _buckets(aggregate(
            df, [{"$bucketAuto": {"groupBy": "$price", "buckets": 3}}]
        ))
        assert got[0][0] is None and got[0][2] == 2  # (null, 1.0] bucket
        assert sum(c for _, _, c in got) == 6
        # non-first buckets never contain nulls
        assert all(lo is not None for lo, _, _ in got[1:])

    def test_all_null_keys_single_null_bucket_both_modes(self, spark):
        df = _df(spark, [(1, None), (2, None), (3, None)])
        for mode in ("exact", "approx"):
            got = _buckets(aggregate(
                df,
                [{"$bucketAuto": {"groupBy": "$price", "buckets": 3,
                                  "scaleMode": mode}}],
            ))
            assert got == [(None, None, 3)], mode

    def test_empty_input_zero_buckets_both_modes(self, spark):
        df = _df(spark, [], PRICES_SCHEMA)
        for mode in ("exact", "approx"):
            out = aggregate(
                df,
                [{"$bucketAuto": {"groupBy": "$price", "buckets": 3,
                                  "scaleMode": mode}}],
            )
            assert out.count() == 0, mode
            assert [f.name for f in out.schema] == ["_id", "count"]

    def test_null_keys_first_bucket_approx(self, spark):
        df = _df(spark, [(1, None), (2, 1.0), (3, 2.0), (4, 3.0), (5, 4.0)])
        got = _buckets(aggregate(
            df,
            [{"$bucketAuto": {"groupBy": "$price", "buckets": 2,
                              "scaleMode": "approx"}}],
        ))
        assert got[0][0] is None  # BSON min of a null-holding bucket
        assert sum(c for _, _, c in got) == 5

    def test_granularity_rejects_null_keys(self, spark):
        df = _df(spark, [(1, None), (2, 1.0), (3, 2.0)])
        with pytest.raises(Exception, match="granularity requires non-null"):
            aggregate(
                df,
                [{"$bucketAuto": {"groupBy": "$price", "buckets": 2,
                                  "granularity": "R5"}}],
            ).collect()

    def test_single_distinct_value_approx(self, spark):
        df = _df(spark, [(i, 9.0) for i in range(5)])
        got = _buckets(aggregate(
            df,
            [{"$bucketAuto": {"groupBy": "$price", "buckets": 3,
                              "scaleMode": "approx"}}],
        ))
        assert got == [(9.0, 9.0, 5)]


class TestFacetEdges:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "x", 10.0), (2, "x", 30.0), (3, "y", 20.0)],
            "id long, kind string, price double",
        )

    def test_facet_over_empty_input_one_doc_empty_arrays(self, spark):
        empty = spark.createDataFrame([], "id long, kind string, price double")
        [row] = aggregate(
            empty,
            [{"$facet": {
                "by_kind": [{"$sortByCount": "$kind"}],
                "stats": [{"$group": {"_id": None, "n": {"$sum": 1}}}],
                "page": [{"$sort": {"price": 1}}, {"$limit": 2}],
            }}],
        ).collect()
        # one output document; every facet array empty ({_id:null} over
        # EMPTY input emits zero docs — the r7 fuzz-locked rule — so even
        # the global-group facet is [])
        assert row["by_kind"] == [] and row["stats"] == [] and row["page"] == []

    def test_facet_with_bucket_auto_subpipeline(self, spark):
        [row] = aggregate(
            self._docs(spark),
            [{"$facet": {
                "pricebands": [
                    {"$bucketAuto": {"groupBy": "$price", "buckets": 2}}
                ],
                "kinds": [{"$sortByCount": "$kind"}],
            }}],
        ).collect()
        bands = [(d["_id"]["min"], d["_id"]["max"], d["count"])
                 for d in row["pricebands"]]
        assert bands == [(10.0, 20.0, 2), (30.0, 30.0, 1)]
        assert [(d["_id"], d["count"]) for d in row["kinds"]] == [("x", 2), ("y", 1)]

    def test_facet_arrays_differ_when_subpipelines_filter(self, spark):
        # facets see the SAME input independently: a $match in one facet
        # must not leak into its sibling
        [row] = aggregate(
            self._docs(spark),
            [{"$facet": {
                "cheap": [{"$match": {"price": {"$lt": 25}}},
                          {"$count": "n"}],
                "all": [{"$count": "n"}],
            }}],
        ).collect()
        assert row["cheap"][0]["n"] == 2 and row["all"][0]["n"] == 3

    def test_facet_unknown_stage_raises(self, spark):
        with pytest.raises(Exception):
            aggregate(
                self._docs(spark),
                [{"$facet": {"bad": [{"$nosuchstage": {}}]}}],
            ).collect()

    def test_facet_requires_a_facet(self, spark):
        with pytest.raises(ValueError, match="at least one facet"):
            aggregate(self._docs(spark), [{"$facet": {}}])


class TestUnknownOptionGuards:
    """r10 silent-ignore sweep: every option-bearing stage raises on
    unknown/misspelled spec keys instead of quietly defaulting (the class
    behind the concise-$lookup over-match and two prior ADVICE findings)."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "x", 10.0)], "id long, kind string, price double"
        )

    def test_stage_specs_reject_unknown_options(self, spark, tmp_path):
        import pyspark.sql.functions as F

        df = self._docs(spark)
        tgt = str(tmp_path / "t")
        df.write.parquet(tgt)
        cases = [
            {"$unwind": {"path": "$kind", "preserveNulls": True}},
            {"$bucket": {"groupBy": "$price", "boundaries": [0, 10, 20],
                         "defualt": "other"}},
            {"$bucketAuto": {"groupBy": "$price", "buckets": 2,
                             "granularty": "R5"}},
            {"$merge": {"into": tgt, "on": "id", "whenMatchd": "replace"}},
            {"$densify": {"field": "price", "range": {"step": 1,
                          "bounds": "full", "partitionBy": ["kind"]}}},
            {"$fill": {"sortBy": {"id": 1}, "partition": "$kind",
                       "output": {"price": {"method": "locf"}}}},
            {"$fill": {"sortBy": {"id": 1},
                       "output": {"price": {"method": "locf", "vlue": 0}}}},
            {"$setWindowFields": {"partitonBy": "$kind", "sortBy": {"id": 1},
                                  "output": {"n": {"$count": {}}}}},
            {"$unionWith": {"coll": df, "pipline": []}},
        ]
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        for stage in cases:
            with pytest.raises(ValueError, match="unsupported .* options"):
                aggregate(df, [stage])

    def test_fill_value_and_method_are_exclusive(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate

        with pytest.raises(ValueError, match="exclusive"):
            aggregate(self._docs(spark), [{"$fill": {
                "sortBy": {"id": 1},
                "output": {"price": {"method": "locf", "value": 0}}}}])
