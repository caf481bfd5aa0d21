"""Hashed multinomial Naive Bayes: separable-class recovery, prior fallback
for tokenless docs, deterministic tie-break, model shape bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.classify import (
    nb_predict,
    nb_train,
)


def _fit_predict(spark, train_rows, test_rows, num_buckets=256):
    train = spark.createDataFrame(train_rows, "doc_id long, text string, label string")
    test = spark.createDataFrame(test_rows, "doc_id long, text string")
    priors, lik = nb_train(train, "text", "label", num_buckets=num_buckets)
    pred = nb_predict(test, priors, lik, "text", "doc_id", num_buckets=num_buckets)
    return priors, lik, {r["id"]: r for r in pred.collect()}


class TestNaiveBayes:
    def test_separable_classes_recovered(self, spark):
        train = []
        for i in range(10):
            train.append((i, "ham spam-free breakfast eggs toast", "ham"))
            train.append((100 + i, "viagra lottery winner click now", "spam"))
        _, _, got = _fit_predict(
            spark,
            train,
            [(1000, "eggs and toast for breakfast"),
             (1001, "click now lottery winner"),
             (1002, "eggs lottery")],  # one token each side -> priors tie, eggs rarer? both 10 docs
        )
        assert got[1000]["predicted"] == "ham"
        assert got[1001]["predicted"] == "spam"
        assert got[1002]["predicted"] in ("ham", "spam")  # balanced; just total

    def test_tokenless_doc_falls_back_to_prior(self, spark):
        # 3:1 class imbalance -> empty doc classified as the majority class
        train = [(i, f"alpha w{i}", "big") for i in range(9)]
        train += [(100 + i, f"beta z{i}", "small") for i in range(3)]
        _, _, got = _fit_predict(spark, train, [(500, ""), (501, "   ")])
        assert got[500]["predicted"] == "big"
        assert got[501]["predicted"] == "big"

    def test_model_shape_is_bounded(self, spark):
        train = [(i, f"tok{i} tok{i+1} shared", "a" if i % 2 else "b")
                 for i in range(40)]
        df = spark.createDataFrame(train, "doc_id long, text string, label string")
        priors, lik = nb_train(df, "text", "label", num_buckets=64)
        assert priors.count() == 2
        # DENSE grid: exactly classes x buckets, no corpus-size dependence
        assert lik.count() == 2 * 64
        assert lik.groupBy("label").count().select(F.min("count")).collect()[0][0] == 64

    def test_score_ties_break_by_class_name(self, spark):
        # identical training text for both classes -> identical likelihoods
        # and priors; argmax must pick the DESC-max class name on every doc
        train = [(1, "same words here", "x"), (2, "same words here", "y")]
        _, _, got = _fit_predict(spark, train, [(10, "same words"), (11, "")])
        assert got[10]["predicted"] == "y" and got[11]["predicted"] == "y"

    def test_scores_match_python_reference(self, spark):
        import math

        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.classify import (
            _bucketed_tokens,  # noqa: F401 - formula doc
        )

        B, alpha = 32, 1.0
        train = [(1, "a b a", "p"), (2, "c d", "p"), (3, "e e f", "q")]
        test = [(9, "a e")]
        priors, lik, got = _fit_predict(spark, train, test, num_buckets=B)
        # python reference with the same md5 bucketing
        import hashlib

        def bucket(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

        def q6(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        toks = {"p": ["a", "b", "a", "c", "d"], "q": ["e", "e", "f"]}
        docs = {"p": 2, "q": 1}
        want = {}
        for cls in ("p", "q"):
            counts: dict[int, int] = {}
            for t in toks[cls]:
                counts[bucket(t)] = counts.get(bucket(t), 0) + 1
            tot = len(toks[cls])
            s = q6(math.log(docs[cls] / 3.0))
            for t in ["a", "e"]:
                s += q6(math.log((counts.get(bucket(t), 0) + alpha) / (tot + alpha * B)))
            want[cls] = s
        best = max(("p", "q"), key=lambda c: (want[c], c))
        assert got[9]["predicted"] == best
        assert got[9]["score"] == want[best]
