"""BPE training: the distributed trainer must reproduce a pure-Python
reference implementation (greedy most-frequent-pair merging with
lexicographic tie-break) merge-for-merge and segmentation-for-segmentation."""

from __future__ import annotations

from collections import Counter

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.bpe import (
    adjacent_pair_counts,
    bpe_encode,
    bpe_train,
    merge_pair_col,
    word_frequencies,
)

import pyspark.sql.functions as F


# -- pure-Python reference --------------------------------------------------
def _ref_merge(seq: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _ref_bpe(texts: list[str], n_merges: int):
    words = Counter(w for t in texts for w in t.split() if w)
    table = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, seq in table.items():
            for x, y in zip(seq, seq[1:]):
                counts[(x, y)] += words[w]
        if not counts:
            break
        # max count, ties lexicographic pair asc
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        table = {w: _ref_merge(seq, a, b) for w, seq in table.items()}
    return merges, table


CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest low lower",
    "banana bandana ana anna banana",
]


class TestMergeFold:
    def test_greedy_non_overlapping(self, spark):
        df = spark.createDataFrame(
            [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a", "b"],)],
            "s array<string>",
        )
        got = [
            list(r["m"])
            for r in df.select(merge_pair_col(F.col("s"), "a", "a").alias("m")).collect()
        ]
        assert got == [["aa", "a"], ["aa", "aa"], ["b", "aa", "b"]]

    def test_merge_matches_reference_on_random_seqs(self, spark):
        import random

        rng = random.Random(7)
        seqs = [
            [rng.choice("ab") for _ in range(rng.randrange(0, 9))] for _ in range(40)
        ]
        df = spark.createDataFrame([(s,) for s in seqs], "s array<string>")
        got = [
            list(r["m"])
            for r in df.select(merge_pair_col(F.col("s"), "a", "b").alias("m")).collect()
        ]
        assert got == [_ref_merge(s, "a", "b") for s in seqs]


class TestBpeTrain:
    def test_matches_reference_trainer(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges, table = bpe_train(df, "text", n_merges=8, checkpoint_every=3)
        ref_merges, ref_table = _ref_bpe(CORPUS, 8)
        assert merges == ref_merges
        got = {r["word"]: list(r["symbols"]) for r in table.collect()}
        assert got == ref_table

    def test_early_stop_when_no_pairs(self, spark):
        df = spark.createDataFrame([("a b c",)], "text string")
        merges, _ = bpe_train(df, "text", n_merges=5)
        assert merges == []  # single-char words: no adjacent pairs ever

    def test_word_freq_and_pair_counts(self, spark):
        df = spark.createDataFrame([("ab ab ba",)], "text string")
        wf = {r["word"]: r["freq"] for r in word_frequencies(df, "text").collect()}
        assert wf == {"ab": 2, "ba": 1}
        syms = word_frequencies(df, "text").select(
            "freq", F.split("word", "").alias("symbols")
        )
        pc = {
            (r["a"], r["b"]): r["cnt"] for r in adjacent_pair_counts(syms).collect()
        }
        assert pc == {("a", "b"): 2, ("b", "a"): 1}

    def test_encode_replays_merges(self, spark):
        train = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges, _ = bpe_train(train, "text", n_merges=6)
        enc = bpe_encode(
            spark.createDataFrame([("low newest",)], "text string"), "text", merges
        ).collect()[0]["bpe_tokens"]
        # reference encode of the same text with the same merge table
        ref = []
        for w in "low newest".split():
            seq = list(w)
            for a, b, _ in merges:
                seq = _ref_merge(seq, a, b)
            ref.extend(seq)
        assert list(enc) == ref

    def test_determinism_across_repartition(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        m1, _ = bpe_train(df, "text", n_merges=5)
        m2, _ = bpe_train(df.repartition(7), "text", n_merges=5)
        assert m1 == m2
