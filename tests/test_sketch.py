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


class TestBloomFilter:
    def test_no_false_negatives_ever(self, spark):
        """Every inserted key MUST pass — the Bloom one-sided guarantee,
        checked at a width tight enough that false positives abound."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
            bloom_build,
            bloom_might_contain,
        )

        keys = spark.createDataFrame([(f"k{i}",) for i in range(300)], "k string")
        words = bloom_build(keys, "k", n_bits=256, n_hashes=3)
        passed = keys.filter(
            bloom_might_contain(F.col("k"), words, n_bits=256, n_hashes=3)
        ).count()
        assert passed == 300

    def test_false_positive_rate_bounded_at_generous_width(self, spark):
        """Absent keys mostly fail at a generous width; the few that pass
        are the documented FP mass, not a correctness bug."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
            bloom_build,
            bloom_might_contain,
        )

        members = spark.createDataFrame([(f"in{i}",) for i in range(100)], "k string")
        words = bloom_build(members, "k", n_bits=1 << 14, n_hashes=5)
        absent = spark.createDataFrame([(f"out{i}",) for i in range(500)], "k string")
        fp = absent.filter(
            bloom_might_contain(F.col("k"), words, n_bits=1 << 14, n_hashes=5)
        ).count()
        # theoretical FP ~ (1-exp(-5*100/16384))^5 ~ 2e-8; allow slack
        assert fp <= 2

    def test_filter_is_expression_only(self, spark):
        """The membership test must compile to a codegen'd filter — no join,
        no exchange introduced by the pre-filter itself."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
            bloom_build,
            bloom_might_contain,
        )
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        members = spark.createDataFrame([("a",), ("b",)], "k string")
        words = bloom_build(members, "k", n_bits=512, n_hashes=4)
        probe = spark.range(200).select(F.concat(F.lit("p"), F.col("id")).alias("k"))
        filtered = probe.filter(
            bloom_might_contain(F.col("k"), words, n_bits=512, n_hashes=4)
        )
        plan = executed_plan(filtered)
        for op in ("Join", "Exchange"):
            assert op not in plan, plan

    def test_bloom_prefilter_equals_plain_decontamination(self, spark):
        """contaminated_docs_bloom's exact tier must equal contaminated_docs
        (the filter may only REMOVE non-candidates, never change hits)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            contaminated_docs,
            contaminated_docs_bloom,
        )

        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "a completely different sentence with no overlap here"),
                (3, "the quick brown fox runs far away from everything"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps high")], "doc_id long, text string"
        )
        plain = {
            r["id"]: (r["n_shared"], r["contam_frac"])
            for r in contaminated_docs(corpus, bench, "text", "doc_id", n=3).collect()
        }
        bloomed = {
            r["id"]: (r["n_shared"], r["contam_frac"])
            for r in contaminated_docs_bloom(
                corpus, bench, "text", "doc_id", n=3, n_bits=1 << 14
            ).collect()
            if r["n_shared"] > 0
        }
        assert bloomed == plain


class TestVocabEncode:
    """build_vocab + encode_tokens (operators/text.py) — the text→ids step."""

    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "b b b a a c"),
                (2, "a b unkworda unkwordb"),
                (3, "c a b"),
            ],
            "doc_id long, text string",
        )

    def test_vocab_ranks_by_count_then_lexical(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import build_vocab

        v = {
            r["tok"]: (r["tok_id"], r["tok_count"])
            for r in build_vocab(self._corpus(spark), "text", "doc_id", 3).collect()
        }
        # counts: a=4, b=5, c=2, unkworda=1, unkwordb=1
        assert v == {"b": (0, 5), "a": (1, 4), "c": (2, 2)}

    def test_encode_preserves_order_and_maps_oov(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
            build_vocab,
            encode_tokens,
        )

        d = self._corpus(spark)
        vocab = build_vocab(d, "text", "doc_id", 3)
        enc = {
            r["id"]: r["ids"]
            for r in encode_tokens(d, vocab, "text", "doc_id", unk_id=3).collect()
        }
        assert enc[1] == [0, 0, 0, 1, 1, 2]  # b b b a a c
        assert enc[2] == [1, 0, 3, 3]  # a b UNK UNK
        assert enc[3] == [2, 1, 0]  # c a b

    def test_encode_broadcasts_vocab(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
            build_vocab,
            encode_tokens,
        )
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        d = self._corpus(spark)
        vocab = build_vocab(d, "text", "doc_id", 3)
        plan = executed_plan(encode_tokens(d, vocab, "text", "doc_id", unk_id=3))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestLinearCounting:
    def test_estimate_within_a_few_percent(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
            lc_bits,
            lc_estimate,
        )

        n = 2000
        df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
        [r] = lc_estimate(lc_bits(df, "k", m=1 << 14), m=1 << 14).collect()
        assert abs(r["estimate"] - n) <= 0.05 * n
        assert r["n_bits_set"] <= n  # collisions only reduce set bits

    def test_duplicates_do_not_move_the_estimate(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
            lc_bits,
            lc_estimate,
        )

        base = [(f"u{i}",) for i in range(500)]
        d1 = spark.createDataFrame(base, "k string")
        d2 = spark.createDataFrame(base * 5, "k string")  # 5x duplicated
        [a] = lc_estimate(lc_bits(d1, "k", m=4096), m=4096).collect()
        [b] = lc_estimate(lc_bits(d2, "k", m=4096), m=4096).collect()
        assert a == b

    def test_shard_merge_is_bit_union(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
            lc_bits,
            lc_estimate,
        )

        a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "k string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "k string")
        merged_bits = lc_bits(a, "k", m=4096).unionByName(
            lc_bits(b, "k", m=4096)
        ).distinct()
        whole_bits = lc_bits(a.unionByName(b), "k", m=4096)
        assert sorted(r["bit"] for r in merged_bits.collect()) == sorted(
            r["bit"] for r in whole_bits.collect()
        )
        [m1] = lc_estimate(merged_bits, m=4096).collect()
        [m2] = lc_estimate(whole_bits, m=4096).collect()
        assert m1 == m2


class TestBloomDistributed:
    def test_distributed_words_equal_driver_bitmap(self, spark):
        """bloom_build_distributed's dense bitmap (executor-side) must be
        word-for-word identical to bloom_build's driver list."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
            bloom_bitmap_df,
            bloom_build,
            bloom_build_distributed,
        )

        keys = spark.createDataFrame([(f"k{i}",) for i in range(400)], "k string")
        n_bits = 1 << 10
        driver_words = bloom_build(keys, "k", n_bits=n_bits, n_hashes=4)
        dist = bloom_build_distributed(keys, "k", n_bits=n_bits, n_hashes=4)
        dense = bloom_bitmap_df(dist, n_bits).collect()[0]["__bloom_bitmap"]
        assert list(dense) == driver_words

    def test_distributed_filter_equals_literal_filter(self, spark):
        """bloom_filter_distributed (1-row broadcast bitmap) must pass
        exactly the rows the plan-literal path passes — including the same
        false positives (identical hash family, identical bits)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
            bloom_build,
            bloom_build_distributed,
            bloom_filter_distributed,
            bloom_might_contain,
        )

        members = spark.createDataFrame([(f"in{i}",) for i in range(150)], "k string")
        n_bits = 1 << 9  # tight: force false positives so they compare too
        probe = spark.createDataFrame(
            [(f"in{i}",) for i in range(150)] + [(f"out{i}",) for i in range(400)],
            "k string",
        )
        words = bloom_build(members, "k", n_bits=n_bits, n_hashes=3)
        lit_pass = {
            r["k"]
            for r in probe.filter(
                bloom_might_contain(F.col("k"), words, n_bits=n_bits, n_hashes=3)
            ).collect()
        }
        dist = bloom_build_distributed(members, "k", n_bits=n_bits, n_hashes=3)
        dist_pass = {
            r["k"]
            for r in bloom_filter_distributed(
                probe, "k", dist, n_bits=n_bits, n_hashes=3
            ).collect()
        }
        assert dist_pass == lit_pass
        assert all(f"in{i}" in dist_pass for i in range(150))  # no false negatives
        # negate flips to the definite-absent complement
        neg = {
            r["k"]
            for r in bloom_filter_distributed(
                probe, "k", dist, n_bits=n_bits, n_hashes=3, negate=True
            ).collect()
        }
        assert neg == {r["k"] for r in probe.collect()} - dist_pass

    def test_distributed_filter_plan_shape(self, spark):
        """The consumption plan must be a 1-row BroadcastNestedLoopJoin —
        the corpus never shuffles and the words never enter a plan literal."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.sketch import (
            bloom_build_distributed,
            bloom_filter_distributed,
        )
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        members = spark.createDataFrame([("a",), ("b",)], "k string")
        dist = bloom_build_distributed(members, "k", n_bits=512, n_hashes=4)
        probe = spark.range(500).select(F.concat(F.lit("p"), F.col("id")).alias("k"))
        out = bloom_filter_distributed(probe, "k", dist, n_bits=512, n_hashes=4)
        plan = executed_plan(out)
        assert "BroadcastNestedLoopJoin" in plan
        # the corpus side stays shuffle-free: the only exchange is the tiny
        # words aggregation feeding the broadcast
        assert "Exchange hashpartitioning" not in plan.split("BroadcastNestedLoopJoin")[0]
