"""Tests for BM25 ranking, unigram-LM scoring (operators/search.py), and
int8 embedding quantization (operators/similarity.py::quantize_int8)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
    bm25_topk,
    unigram_logprob,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.similarity import (
    quantize_int8,
)

DOCS = [
    (1, "spark spark spark join"),
    (2, "spark join window group"),
    (3, "window window window window window window"),
    (4, "filter scan shuffle sort"),
    (5, "join"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _bm25_reference(terms, k1=1.2, b=0.75):
    """Driver-side reference implementation over DOCS."""
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    scores = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            contrib = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            s += math.floor(contrib * 1e6 + 0.5) / 1e6
        if s:
            scores[i] = s
    return scores


def test_bm25_scores_and_order_match_reference(docs):
    got = bm25_topk(docs, "text", "doc_id", terms=["spark", "join"], k=10).collect()
    ref = _bm25_reference(["spark", "join"])
    assert [r.id for r in got] == sorted(ref, key=lambda i: (-ref[i], i))
    for r in got:
        assert r.score == pytest.approx(ref[r.id], rel=1e-9)
    # docs without any term never appear
    assert {r.id for r in got} == set(ref)


def test_bm25_k_truncates_with_id_tiebreak(docs):
    got = bm25_topk(docs, "text", "doc_id", terms=["spark", "join"], k=2).collect()
    assert len(got) == 2
    ref = _bm25_reference(["spark", "join"])
    assert [r.id for r in got] == sorted(ref, key=lambda i: (-ref[i], i))[:2]


def test_bm25_plans_top_k_not_full_sort(docs):
    plan = (
        bm25_topk(docs, "text", "doc_id", terms=["spark"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_unigram_logprob_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b"), (3, "")], "doc_id long, text string"
    )
    # corpus: a:2, b:2, total 4 -> p(a)=p(b)=0.5
    rows = {r.id: r for r in unigram_logprob(df, "text", "doc_id").collect()}
    lp = math.floor(math.log(0.5) * 1e6 + 0.5) / 1e6
    assert rows[1].n_tokens == 3 and rows[1].avg_logprob == pytest.approx(lp)
    assert rows[2].n_tokens == 1 and rows[2].avg_logprob == pytest.approx(lp)
    assert 3 not in rows  # zero-token doc has no score


def test_unigram_logprob_flags_rare_token_docs(spark):
    corpus = [(i, "common common common") for i in range(20)] + [(99, "zzzz")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = {r.id: r.avg_logprob for r in unigram_logprob(df, "text", "doc_id").collect()}
    assert rows[99] < rows[0] < 0  # rare-token doc scores far lower


def test_bigram_logprob_matches_hand_computation(spark):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
        bigram_logprob,
    )

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "")], "doc_id long, text string"
    )
    # corpus: N=5, c(a)=3, c(b)=2; bigrams: (a,b)=1, (b,a)=2; ctx: a=1, b=2
    rows = {r.id: r for r in bigram_logprob(df, "text", "doc_id", lam=0.9).collect()}

    def q(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    # doc 2: first "b" -> ln(2/5); pair (b,a) -> ln(0.9*(2/2) + 0.1*(3/5))
    lp_first = q(math.log(2 / 5))
    lp_pair = q(math.log(0.9 * (2 / 2) + (1.0 - 0.9) * (3 / 5)))
    want2 = q((lp_first + lp_pair) / 2)
    assert rows[2].n_tokens == 2
    assert rows[2].avg_logprob == pytest.approx(want2, abs=2e-6)
    assert rows[2].ppl == pytest.approx(math.exp(-want2), abs=2e-5)
    # doc 1: ln(3/5) + ln(.9*(1/1)+.1*(2/5)) + ln(.9*(2/2)+.1*(3/5))
    lps = [
        q(math.log(3 / 5)),
        q(math.log(0.9 * (1 / 1) + (1.0 - 0.9) * (2 / 5))),
        q(math.log(0.9 * (2 / 2) + (1.0 - 0.9) * (3 / 5))),
    ]
    assert rows[1].n_tokens == 3
    assert rows[1].avg_logprob == pytest.approx(q(sum(lps) / 3), abs=2e-6)
    assert 3 not in rows  # zero-token doc has no score


def test_bigram_logprob_flags_scrambled_docs(spark):
    """Word salad with COMMON tokens still scores low — the property the
    unigram filter lacks (same unigram distribution, broken transitions)."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
        bigram_logprob,
    )

    fluent = [(i, "the cat sat on the mat") for i in range(20)]
    scrambled = [(99, "mat the on sat cat the")]
    df = spark.createDataFrame(fluent + scrambled, "doc_id long, text string")
    rows = {
        r.id: r.avg_logprob
        for r in bigram_logprob(df, "text", "doc_id").collect()
    }
    assert rows[99] < rows[0] < 0


def test_bigram_logprob_repartition_invariant(spark):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
        bigram_logprob,
    )

    rng = __import__("random").Random(5)
    words = ["alpha", "beta", "gamma", "delta"]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(1, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(
        (r.id, r.n_tokens, r.avg_logprob, r.ppl)
        for r in bigram_logprob(df, "text", "doc_id").collect()
    )
    b = sorted(
        (r.id, r.n_tokens, r.avg_logprob, r.ppl)
        for r in bigram_logprob(df.repartition(7), "text", "doc_id").collect()
    )
    assert a == b


def test_quantize_int8_roundtrip_error_bounded(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.001, 0.002, -0.003, 0.004])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.id: r for r in quantize_int8(df, "embedding", "vec_id").collect()}
    for vid, vec in [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.001, 0.002, -0.003, 0.004])]:
        r = rows[vid]
        assert max(abs(q) for q in r.qvec) == 127  # max element saturates
        for orig, q in zip(vec, r.qvec):
            assert abs(q) <= 127
            assert abs(q * r.scale - orig) <= r.scale / 2 + 1e-12


def test_quantize_int8_zero_vector_guard(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    r = quantize_int8(df, "embedding", "vec_id").collect()[0]
    assert r.scale == 0.0 and list(r.qvec) == [0, 0, 0]


class TestPhraseSearch:
    def test_three_token_phrase_consecutive_only(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
            phrase_match_counts,
            positional_index,
        )

        rows = [
            (1, "the quick brown fox"),          # match at pos 0
            (2, "quick the brown fox quick brown"),  # terms present, never consecutive
            (3, "x the quick brown y the quick brown"),  # two matches
            (4, "the quick red fox"),            # broken in the middle
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        idx = positional_index(df, "text", "doc_id")
        got = {
            r.id: r.n_matches
            for r in phrase_match_counts(idx, ["the", "quick", "brown"]).collect()
        }
        assert got == {1: 1, 3: 2}

    def test_duplicate_term_phrase(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
            phrase_match_counts,
            positional_index,
        )

        df = spark.createDataFrame(
            [(1, "go go go stop"), (2, "go stop go")], "doc_id long, text string"
        )
        idx = positional_index(df, "text", "doc_id")
        got = {
            r.id: r.n_matches for r in phrase_match_counts(idx, ["go", "go"]).collect()
        }
        assert got == {1: 2}  # overlapping "go go" at pos 0 and 1


def test_phrase_match_no_hits_returns_empty(spark):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
        phrase_match_counts,
        positional_index,
    )

    df = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    idx = positional_index(df, "text", "doc_id")
    assert phrase_match_counts(idx, ["missing", "phrase"]).count() == 0


def test_phrase_match_is_case_insensitive(spark):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
        phrase_match_counts,
        positional_index,
    )

    df = spark.createDataFrame([(1, "The Quick fox")], "doc_id long, text string")
    idx = positional_index(df, "text", "doc_id")
    got = {r.id: r.n_matches for r in phrase_match_counts(idx, ["the", "QUICK"]).collect()}
    assert got == {1: 1}


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (r11): hand-computed fusion semantics.
# ---------------------------------------------------------------------------
def test_rrf_fuse_matches_hand_computation(spark):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
        ranked,
        rrf_fuse,
    )

    # leg A ranks: 10 > 20 > 30; leg B ranks: 30 > 10 (20 absent from B)
    a = spark.createDataFrame(
        [(10, 0.9), (20, 0.5), (30, 0.1)], "id long, s double"
    )
    b = spark.createDataFrame([(30, 0.8), (10, 0.2)], "id long, s double")
    got = {
        r["id"]: (r["rrf_score"], r["n_legs"])
        for r in rrf_fuse([ranked(a, "s"), ranked(b, "s")], k_rrf=60).collect()
    }

    def q(x):  # the engine's 1e-6 quantized sum
        import math

        return math.floor(x * 1e6 + 0.5) / 1e6

    want = {
        10: (q(1 / 61) + q(1 / 62), 2),  # rank 1 in A, rank 2 in B
        30: (q(1 / 63) + q(1 / 61), 2),  # rank 3 in A, rank 1 in B
        20: (q(1 / 62), 1),              # rank 2 in A only
    }
    assert got == want
    # absent-leg convention: 20 contributes nothing from B, n_legs counts it


def test_rrf_fuse_tiebreak_and_topk(spark):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
        rrf_fuse,
    )
    import pytest

    # identical ranks in a single leg → equal scores; id ascending breaks
    # the tie deterministically and topk trims on the total order
    leg = spark.createDataFrame([(5, 1), (3, 1), (9, 2)], "id long, rank int")
    rows = rrf_fuse([leg], k_rrf=60, topk=2).collect()
    assert [r["id"] for r in rows] == [3, 5]
    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])


def test_ranked_is_one_based_with_id_tiebreak(spark):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import ranked

    df = spark.createDataFrame(
        [(7, 0.5), (2, 0.5), (4, 0.9)], "id long, s double"
    )
    got = {r["id"]: r["rank"] for r in ranked(df, "s").collect()}
    assert got == {4: 1, 2: 2, 7: 3}
