"""Corpus-curation operators: repetition metrics, splits, sampling,
decontamination (operators/curation.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
    contaminated_docs,
    repetition_metrics,
    split_assign,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionMetrics:
    def test_degenerate_loop_scores_high(self, spark):
        df = _docs(
            spark,
            [
                (1, "spam spam spam spam spam spam"),
                (2, "one two three four five six"),
            ],
        )
        got = {
            r["id"]: r for r in repetition_metrics(df, "text", "doc_id").collect()
        }
        loop, clean = got[1], got[2]
        assert loop["n_tokens"] == 6 and clean["n_tokens"] == 6
        assert loop["top_token_frac"] == 1.0
        assert loop["distinct_token_ratio"] == 1 / 6
        # 5 bigrams, all "spam spam" -> 4/5 duplicated
        assert abs(loop["dup_bigram_frac"] - 0.8) < 1e-12
        assert clean["dup_bigram_frac"] == 0.0
        assert clean["distinct_token_ratio"] == 1.0

    def test_single_token_doc_has_zero_bigram_frac(self, spark):
        df = _docs(spark, [(1, "lonely")])
        (r,) = repetition_metrics(df, "text", "doc_id").collect()
        assert r["n_tokens"] == 1 and r["dup_bigram_frac"] == 0.0


class TestSplitAssign:
    def test_deterministic_and_id_pure(self, spark):
        df = _docs(spark, [(i, f"doc {i}") for i in range(200)])
        a = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id").collect()}
        b = {
            r["doc_id"]: r["split"]
            for r in split_assign(df.repartition(7), "doc_id").collect()
        }
        assert a == b  # repartition must not move any row between splits
        frac_train = sum(v == "train" for v in a.values()) / len(a)
        assert 0.8 < frac_train < 1.0  # 90% nominal, hash-bucket variance
        assert set(a.values()) <= {"train", "val", "test"}


class TestStratifiedSample:
    def test_exactly_k_per_stratum(self, spark):
        rows = [(i, "x", "en" if i % 2 else "de") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = stratified_sample(df, "lang", "doc_id", k=3)
        per = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert per == {"en": 3, "de": 3}
        # deterministic: same sample on re-run
        ids1 = sorted(r["doc_id"] for r in out.collect())
        ids2 = sorted(
            r["doc_id"] for r in stratified_sample(df, "lang", "doc_id", k=3).collect()
        )
        assert ids1 == ids2


class TestDecontamination:
    def test_planted_overlap_flagged(self, spark):
        bench = _docs(spark, [(100, "secret eval answer key here")])
        corpus = _docs(
            spark,
            [
                # contains the benchmark trigram "secret eval answer"
                (1, "intro text secret eval answer trailing"),
                (2, "totally unrelated clean document text"),
            ],
        )
        got = {
            r["id"]: r
            for r in contaminated_docs(corpus, bench, "text", "doc_id", n=3).collect()
        }
        assert set(got) == {1}
        # doc 1 trigrams: {intro text secret, text secret eval, secret eval
        # answer, eval answer trailing}; bench: {secret eval answer, eval
        # answer key, answer key here} -> exactly one shared trigram of 4
        assert got[1]["n_shared"] == 1
        assert abs(got[1]["contam_frac"] - 0.25) < 1e-12

    def test_shared_count_exact(self, spark):
        bench = _docs(spark, [(100, "a b c d")])
        corpus = _docs(spark, [(1, "x a b c d y"), (2, "a q b c")])
        got = {
            r["id"]: (r["n_shared"], r["contam_frac"])
            for r in contaminated_docs(corpus, bench, "text", "doc_id", n=3).collect()
        }
        # doc1 trigrams: {x a b, a b c, b c d, c d y}; bench: {a b c, b c d}
        # -> 2 shared of 4 -> frac 0.5; doc2 shares none
        assert got == {1: (2, 0.5)}

    def test_benchmark_side_broadcasts(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import (
            executed_plan,
        )

        bench = _docs(spark, [(100, "a b c d")])
        corpus = _docs(spark, [(i, f"tok{i} a b c d") for i in range(50)])
        plan = executed_plan(contaminated_docs(corpus, bench, "text", "doc_id"))
        assert "BroadcastHashJoin" in plan


class TestPackSequences:
    def test_single_shard_contiguous_fill(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            pack_sequences,
        )

        # token counts: 3, 2, 4, 1 in id order; budget 5, one shard
        docs = _docs(
            spark, [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "j")]
        )
        got = {
            r.id: (r.n_tok, r.bin, r.tok_offset)
            for r in pack_sequences(
                docs, "text", "doc_id", budget=5, n_shards=1
            ).collect()
        }
        # offsets: 0, 3, 5, 9 -> bins 0, 0, 1, 1
        assert got == {1: (3, 0, 0), 2: (2, 0, 3), 3: (4, 1, 5), 4: (1, 1, 9)}

    def test_oversize_document_keeps_one_row(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            pack_sequences,
        )

        docs = _docs(spark, [(1, "t " * 20), (2, "x y")])
        got = {
            r.id: (r.bin, r.tok_offset)
            for r in pack_sequences(
                docs, "text", "doc_id", budget=8, n_shards=1
            ).collect()
        }
        assert got == {1: (0, 0), 2: (2, 20)}  # doc2 starts past the long doc

    def test_sharding_is_hash_deterministic_and_repartition_invariant(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            pack_sequences,
        )

        docs = _docs(spark, [(i, "w " * (i % 7 + 1)) for i in range(60)])
        a = sorted(
            map(tuple, pack_sequences(docs, "text", "doc_id", 16, 8).collect())
        )
        b = sorted(
            map(
                tuple,
                pack_sequences(
                    docs.repartition(13), "text", "doc_id", 16, 8
                ).collect(),
            )
        )
        assert a == b
        shards = {t[2] for t in a}
        assert len(shards) > 1  # really spreads over shards


class TestMixtureSample:
    def test_rates_zero_and_one(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            mixture_sample,
        )

        df = spark.createDataFrame(
            [(i, "keep" if i % 2 else "drop") for i in range(100)],
            "doc_id long, source string",
        )
        kept = mixture_sample(
            df, "source", "doc_id", {"drop": 0.0, "keep": 1.0}
        ).collect()
        assert {r.source for r in kept} == {"keep"}
        assert len(kept) == 50

    def test_monotone_and_deterministic(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            mixture_sample,
        )

        df = spark.createDataFrame(
            [(i, "s") for i in range(400)], "doc_id long, source string"
        )
        low = {r.doc_id for r in mixture_sample(df, "source", "doc_id", {"s": 0.2}).collect()}
        high = {r.doc_id for r in mixture_sample(df, "source", "doc_id", {"s": 0.6}).collect()}
        again = {r.doc_id for r in mixture_sample(df, "source", "doc_id", {"s": 0.2}).collect()}
        assert low == again  # deterministic
        assert low <= high  # monotone nesting: raising the rate only adds rows
        assert 0.10 <= len(low) / 400 <= 0.30  # near the target rate
        assert 0.45 <= len(high) / 400 <= 0.75

    def test_salted_hash_independent_of_split_assign(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            mixture_sample,
            split_assign,
        )

        df = spark.createDataFrame(
            [(i, "s") for i in range(1000)], "doc_id long, source string"
        )
        sampled = mixture_sample(df, "source", "doc_id", {"s": 0.5})
        splits = split_assign(sampled, "doc_id", train_pct=50, val_pct=25)
        frac_train = (
            splits.filter(F.col("split") == "train").count() / splits.count()
        )
        # if the two hashes were correlated the sampled half would skew its
        # split distribution; salted domains keep it near 50%
        assert 0.4 <= frac_train <= 0.6


class TestRuleFilterAudit:
    """c4_rule_flags / rule_filter_audit: rule filter with reason counts."""

    def test_planted_rule_hits(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
            rule_filter_audit,
        )

        good = "the quick brown fox jumps over a lazy dog near the old river bank"
        rows = [
            (1, "web", good),
            (2, "web", "tiny doc"),  # too_short (<10 tokens)
            (3, "web", "{ config } " + good),  # has_brace
            (4, "web", "Lorem Ipsum dolor sit amet " + good),  # has_lorem
            (5, "web", " ".join(["pneumonoultramicroscopic"] * 12)),  # wl_out+no_stop
            (6, "pdf", good),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = {r.source: r for r in rule_filter_audit(df, "text", "source").collect()}
        web = out["web"]
        assert web.n_docs == 5
        assert web.n_too_short == 1
        assert web.n_has_brace == 1
        assert web.n_has_lorem == 1
        assert web.n_word_length_out == 1
        assert web.n_no_stopwords == 2  # doc 5, plus "tiny doc" has none either
        assert web.n_keep == 1  # only doc 1 trips no rule
        assert out["pdf"].n_keep == 1 and out["pdf"].n_docs == 1

    def test_keep_counts_no_rule_fired(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
            rule_filter_audit,
        )

        good = "she said the answer was hidden in a book on the high shelf"
        df = spark.createDataFrame(
            [(i, "s", good + f" variant {i}") for i in range(4)],
            "doc_id long, source string, text string",
        )
        row = rule_filter_audit(df, "text", "source").collect()[0]
        assert row.n_keep == 4 and row.n_docs == 4


class TestChunkTokenWindows:
    def _chunks(self, spark, rows, size, ov):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            chunk_token_windows,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return chunk_token_windows(df, "text", "doc_id", chunk_size=size, overlap=ov)

    def test_sliding_window_boundaries(self, spark):
        """10 tokens, size 4, overlap 2 (stride 2): ceil((10-2)/2)=4 chunks
        at starts 0,2,4,6 — every token covered, short tail allowed."""
        text = " ".join(f"t{i}" for i in range(10))
        out = self._chunks(spark, [(1, text)], 4, 2).collect()
        got = {r["chunk_idx"]: (r["chunk_text"], r["n_chunk_tokens"]) for r in out}
        assert got == {
            0: ("t0 t1 t2 t3", 4),
            1: ("t2 t3 t4 t5", 4),
            2: ("t4 t5 t6 t7", 4),
            3: ("t6 t7 t8 t9", 4),
        }

    def test_every_token_covered_and_no_gap(self, spark):
        """Property: the union of windows covers [0, n) and consecutive
        windows overlap by exactly `overlap` (except a shorter tail)."""
        for n_tok, size, ov in ((1, 8, 3), (7, 8, 3), (8, 8, 3), (9, 8, 3), (25, 8, 3)):
            text = " ".join(f"w{i}" for i in range(n_tok))
            rows = self._chunks(spark, [(1, text)], size, ov).collect()
            stride = size - ov
            seen = set()
            for r in sorted(rows, key=lambda r: r["chunk_idx"]):
                start = r["chunk_idx"] * stride
                toks = r["chunk_text"].split() if r["chunk_text"] else []
                assert toks == [f"w{i}" for i in range(start, min(start + size, n_tok))]
                seen.update(range(start, start + len(toks)))
            assert seen == set(range(n_tok)), (n_tok, size, ov)

    def test_empty_and_short_docs(self, spark):
        out = self._chunks(spark, [(1, ""), (2, "only two")], 4, 1).collect()
        got = {(r["id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"]) for r in out}
        assert got == {(1, 0): ("", 0), (2, 0): ("only two", 2)}

    def test_invalid_overlap_raises(self, spark):
        import pytest

        with pytest.raises(ValueError, match="overlap"):
            self._chunks(spark, [(1, "a b")], 4, 4)

    def test_no_shuffle_in_plan(self, spark):
        df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            chunk_token_windows,
        )

        plan = (
            chunk_token_windows(df, "text", "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # map-only: chunks inherit scan partitioning


class TestChunkIdWindows:
    def _chunks(self, spark, rows, size, ov):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            chunk_id_windows,
        )

        df = spark.createDataFrame(rows, "doc_id long, ids array<int>")
        return chunk_id_windows(df, "ids", "doc_id", chunk_size=size, overlap=ov)

    def test_boundaries_over_ids(self, spark):
        """10 ids, size 4, overlap 2 (stride 2): starts 0,2,4,6 with exact
        boundary ids and window contents."""
        out = self._chunks(spark, [(1, list(range(100, 110)))], 4, 2).collect()
        got = {r["chunk_idx"]: (r["first_id"], r["last_id"], list(r["chunk_ids"]))
               for r in out}
        assert got == {
            0: (100, 103, [100, 101, 102, 103]),
            1: (102, 105, [102, 103, 104, 105]),
            2: (104, 107, [104, 105, 106, 107]),
            3: (106, 109, [106, 107, 108, 109]),
        }

    def test_short_and_empty_sequences(self, spark):
        out = self._chunks(spark, [(1, []), (2, [7, 8])], 4, 1).collect()
        got = {r["id"]: (r["n_chunk_ids"], r["first_id"], r["last_id"]) for r in out}
        assert got == {1: (0, None, None), 2: (2, 7, 8)}

    def test_composes_with_bpe_encode(self, spark):
        """The advertised composition: bpe_encode token output → id encode →
        chunk.  Chunk windows must slice the BPE token sequence, not the
        whitespace words."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.bpe import (
            bpe_encode,
            bpe_train,
        )
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            chunk_id_windows,
        )
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [(1, "abab abab cdcd")], "doc_id long, text string"
        )
        merges, _ = bpe_train(df, "text", n_merges=2)
        enc = bpe_encode(df, "text", merges)
        # hash each BPE token to a deterministic int id for chunking
        with_ids = enc.select(
            "doc_id",
            F.transform(
                F.col("bpe_tokens"), lambda t: F.crc32(t.cast("binary"))
            ).alias("ids"),
        )
        n_bpe = enc.select(F.size("bpe_tokens")).collect()[0][0]
        rows = chunk_id_windows(with_ids, "ids", "doc_id", chunk_size=3,
                                overlap=1).collect()
        stride = 2
        assert len(rows) == max(1, -(-(n_bpe - 1) // stride))
        covered = sum(r["n_chunk_ids"] - (1 if r["chunk_idx"] else 0) for r in rows)
        assert covered == n_bpe  # every id covered once net of overlaps

    def test_no_shuffle_in_plan(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            chunk_id_windows,
        )

        df = spark.createDataFrame([(1, [1, 2, 3, 4])], "doc_id long, ids array<int>")
        plan = (
            chunk_id_windows(df, "ids", "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # chunk stage adds no shuffle


class TestDsirWeights:
    def test_matches_hand_computation(self, spark):
        """Tiny corpus where buckets don't collide: verify the exact
        smoothed log-ratio sum."""
        import math

        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            dsir_weights,
        )

        corpus = _docs(spark, [(1, "aa bb"), (2, "aa cc")])
        target = _docs(spark, [(10, "aa aa bb")])
        out = {
            r.id: r
            for r in dsir_weights(
                corpus, target, "text", "doc_id", n_buckets=64, alpha=1.0
            ).collect()
        }
        # bucket collisions would break the hand model — assert none first
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
            md5_hash32,
        )

        toks = spark.createDataFrame([("aa",), ("bb",), ("cc",)], "tok string")
        bs = [
            r[0]
            for r in toks.select((md5_hash32(F.col("tok")) % 64)).collect()
        ]
        assert len(set(bs)) == 3
        n_t, n_r, shift = 3.0, 4.0, 64.0

        def lr(ct, cr):
            return math.log((ct + 1.0) / (n_t + shift)) - math.log(
                (cr + 1.0) / (n_r + shift)
            )

        def q(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        want1 = (q(lr(2, 2)) + q(lr(1, 1))) / 1.0  # aa + bb
        want2 = q(lr(2, 2)) + q(lr(0, 1))  # aa + cc (cc unseen in target)
        assert out[1].n_tokens == 2
        assert abs(out[1].weight - (q(lr(2, 2)) + q(lr(1, 1)))) < 3e-6, out[1]
        assert abs(out[2].weight - want2) < 3e-6
        # the doc sharing more mass with the target ranks higher
        assert out[1].weight > out[2].weight

    def test_target_like_docs_rank_higher(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            dsir_weights,
        )

        corpus = _docs(
            spark,
            [(i, "clean prose text sample") for i in range(10)]
            + [(90 + i, "junk spam noise garbage") for i in range(10)],
        )
        target = _docs(spark, [(1000, "clean prose text"), (1001, "prose sample")])
        rows = {
            r.id: r.weight
            for r in dsir_weights(corpus, target, "text", "doc_id").collect()
        }
        assert min(rows[i] for i in range(10)) > max(rows[90 + i] for i in range(10))

    def test_repartition_invariant(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            dsir_weights,
        )

        import random

        rng = random.Random(11)
        words = ["w%d" % i for i in range(30)]
        docs = [
            (i, " ".join(rng.choice(words) for _ in range(rng.randrange(1, 15))))
            for i in range(50)
        ]
        corpus = _docs(spark, docs)
        target = _docs(spark, docs[:10])
        a = sorted(
            (r.id, r.n_tokens, r.weight)
            for r in dsir_weights(corpus, target, "text", "doc_id").collect()
        )
        b = sorted(
            (r.id, r.n_tokens, r.weight)
            for r in dsir_weights(
                corpus.repartition(9), target.repartition(3), "text", "doc_id"
            ).collect()
        )
        assert a == b


class TestShuffleIntoShards:
    """Deterministic epoch shuffle (r8): permutation, determinism across
    repartitioning, seed independence."""

    def test_permutation_and_determinism(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            shuffle_into_shards,
        )

        df = spark.createDataFrame([(i,) for i in range(500)], "id long")
        a = shuffle_into_shards(df, "id", 8, seed="e0")
        rows = a.collect()
        # every row exactly once; positions are 1..count(shard) per shard
        assert sorted(r["id"] for r in rows) == list(range(500))
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= set(range(8)) and len(by_shard) == 8
        for ps in by_shard.values():
            assert sorted(ps) == list(range(1, len(ps) + 1))
        # deterministic under repartitioning
        b = shuffle_into_shards(df.repartition(13), "id", 8, seed="e0")
        assert {(r["id"], r["shard"], r["pos"]) for r in b.collect()} == {
            (r["id"], r["shard"], r["pos"]) for r in rows
        }
        # a different seed is a different permutation
        c = shuffle_into_shards(df, "id", 8, seed="e1")
        assert {(r["id"], r["shard"], r["pos"]) for r in c.collect()} != {
            (r["id"], r["shard"], r["pos"]) for r in rows
        }

    def test_rejects_bad_shards(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            shuffle_into_shards,
        )

        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="positive"):
            shuffle_into_shards(df, "id", 0)


class TestGumbelTopkSample:
    def test_samples_proportional_and_deterministic(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            gumbel_topk_sample,
        )

        import math

        # two score classes: exp(3) ≈ 20x more likely than exp(0)
        rows = [(i, 3.0 if i < 50 else 0.0) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, w double")
        out = gumbel_topk_sample(df, "id", "w", 40, seed="s0").collect()
        assert len(out) == 40
        hi = sum(1 for r in out if r["w"] == 3.0)
        # uniform sampling would pick ~4 of the 10% high-weight rows;
        # exp(3)-weighted picks ~25 (observed 23 with this fixed seed)
        assert hi >= 15
        # deterministic under repartitioning and seed-sensitive
        again = gumbel_topk_sample(df.repartition(7), "id", "w", 40, seed="s0").collect()
        assert {r["id"] for r in again} == {r["id"] for r in out}
        other = gumbel_topk_sample(df, "id", "w", 40, seed="s1").collect()
        assert {r["id"] for r in other} != {r["id"] for r in out}

    def test_rejects_bad_k(self, spark):
        import pytest

        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
            gumbel_topk_sample,
        )

        df = spark.createDataFrame([(1, 0.0)], "id long, w double")
        with pytest.raises(ValueError, match="positive"):
            gumbel_topk_sample(df, "id", "w", 0)
