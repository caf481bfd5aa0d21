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
