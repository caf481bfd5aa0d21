"""Count-min sketch: guarantees, mergeability, and plan shape."""

import pyspark.sql.functions as F

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _occurrences(spark, pairs):
    """pairs: (key, count) -> one row per occurrence."""
    rows = [(k,) for k, c in pairs for _ in range(c)]
    return spark.createDataFrame(rows, "k string")


class TestCountMinSketch:
    def test_estimates_never_undercount(self, spark):
        """The CMS one-sided guarantee: est >= exact for EVERY key, even at a
        tiny width where collisions are guaranteed."""
        pairs = [(f"k{i}", (i % 7) + 1) for i in range(200)]
        occ = _occurrences(spark, pairs)
        grid = cms_build(occ, "k", depth=4, width=16)
        keys = spark.createDataFrame([(k,) for k, _ in pairs], "k string")
        est = {
            r["key"]: r["est_cnt"]
            for r in cms_estimate(grid, keys, "k", depth=4, width=16).collect()
        }
        exact = dict(pairs)
        assert all(est[k] >= exact[k] for k in exact)
        # width 16 against 200 keys MUST collide somewhere
        assert any(est[k] > exact[k] for k in exact)

    def test_exact_at_generous_width(self, spark):
        """With width >> #keys and depth 4, the min over rows almost surely
        dodges every collision — estimates equal exact counts."""
        pairs = [("alpha", 5), ("beta", 3), ("gamma", 11)]
        occ = _occurrences(spark, pairs)
        grid = cms_build(occ, "k", depth=4, width=4096)
        keys = spark.createDataFrame([(k,) for k, _ in pairs], "k string")
        est = {
            r["key"]: r["est_cnt"]
            for r in cms_estimate(grid, keys, "k", depth=4, width=4096).collect()
        }
        assert est == dict(pairs)

    def test_grid_bounded_by_depth_times_width(self, spark):
        occ = _occurrences(spark, [(f"k{i}", 2) for i in range(100)])
        grid = cms_build(occ, "k", depth=3, width=8)
        assert grid.count() <= 3 * 8
        # every occurrence lands once per row: cell counts per row sum to N
        per_row = {
            r["row"]: r["tot"]
            for r in grid.groupBy("row").agg(F.sum("cnt").alias("tot")).collect()
        }
        assert per_row == {0: 200, 1: 200, 2: 200}

    def test_merge_equals_whole_corpus_build(self, spark):
        """Shard-and-merge must equal the single-pass build cell-for-cell —
        the property that makes the sketch the incremental/streaming path."""
        a = _occurrences(spark, [("x", 4), ("y", 2)])
        b = _occurrences(spark, [("x", 1), ("z", 6)])
        merged = cms_merge(
            cms_build(a, "k", depth=4, width=32),
            cms_build(b, "k", depth=4, width=32),
        )
        whole = cms_build(a.unionByName(b), "k", depth=4, width=32)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_absent_key_estimate_is_collision_mass_only(self, spark):
        """A key never inserted estimates 0 unless all its depth cells
        collide — at depth 4 / width 4096 over 3 keys that's ~impossible."""
        occ = _occurrences(spark, [("alpha", 5), ("beta", 3)])
        grid = cms_build(occ, "k", depth=4, width=4096)
        keys = spark.createDataFrame([("never-seen",)], "k string")
        [row] = cms_estimate(grid, keys, "k", depth=4, width=4096).collect()
        assert row["est_cnt"] == 0

    def test_estimate_broadcasts_grid(self, spark):
        """The probe join must broadcast the tiny grid, never shuffle the
        probe keys into a sort-merge join."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        occ = _occurrences(spark, [(f"k{i}", 1) for i in range(50)])
        grid = cms_build(occ, "k", depth=4, width=64)
        keys = occ.distinct()
        plan = executed_plan(cms_estimate(grid, keys, "k", depth=4, width=64))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
