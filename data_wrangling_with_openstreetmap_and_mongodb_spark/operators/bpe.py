"""Distributed BPE (byte-pair-encoding) vocabulary training.

The standard subword-vocabulary construction for LLM training data
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"): start from characters, repeatedly merge the corpus-wide
most-frequent ADJACENT symbol pair, emit the merge table that tokenizers
replay at encode time.

Scale design — the whole reason to train BPE on the cluster:

- The corpus collapses ONCE into a ``(word, freq)`` table (one hash-agg over
  exploded tokens).  Every subsequent iteration works on that table — its
  size is the corpus VOCABULARY, not the corpus, and at 100 TB that is the
  difference between touching terabytes per merge and gigabytes.
- Each iteration is one explode + hash-agg (adjacent-pair counts weighted
  by word frequency) and one narrow map (apply the merge).  The only driver
  action per iteration is collecting the SINGLE best pair — a bounded
  1-row action, the iterative-algorithm exception the engine documents
  (same contract as connected_components' convergence count).
- The merge application is a pure higher-order-function fold
  (:func:`merge_pair_col`) — greedy left-to-right, non-overlapping, the
  exact semantics reference BPE implementations use — so the symbol table
  never round-trips through Python.
- Lineage: the symbol table re-derives from the word table through k merge
  expressions; ``localCheckpoint`` every few iterations truncates the
  growing fold-expression plan (flag-inherited from the caller via
  ``checkpoint_every``).

Determinism: ties on pair count break lexicographically (pair asc) — the
trained merge table is a pure function of the corpus, stable under retries
and repartitioning.  Verified against a pure-Python reference BPE in
tests/test_bpe.py; the first-iteration pair counts additionally replay in
DuckDB (catalog query ``bpe_first_merge_pairs``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import whitespace_tokens


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """``(word, freq)`` over whitespace tokens — the corpus collapse that
    bounds every BPE iteration by vocabulary size."""
    return (
        df.select(F.explode(whitespace_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def chars_col(word: Column) -> Column:
    """Initial symbol sequence: the word's characters."""
    return F.split(word, "")


def adjacent_pair_counts(symbols: DataFrame) -> DataFrame:
    """``(a, b, cnt)`` frequency-weighted adjacent pair counts over a
    ``(symbols array<string>, freq)`` table — one explode + one hash-agg."""
    n = F.size("symbols")
    pairs = symbols.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice("symbols", 1, n - 1).alias("a"),
                F.slice("symbols", 2, n - 1).alias("b"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("freq").alias("cnt"))


def merge_pair_col(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent ``(a, b)`` into ``a+b`` —
    a pure ``aggregate`` fold carrying one pending symbol, so overlapping
    occurrences merge non-overlapping exactly like reference BPE
    ("aaa" + (a,a) → [aa, a]; "aaaa" → [aa, aa])."""
    merged = F.lit(a + b)

    def step(acc: Column, x: Column) -> Column:
        hit = (acc["carry"] == F.lit(a)) & (x == F.lit(b))
        return F.when(
            hit,
            F.struct(
                F.concat(acc["arr"], F.array(merged)).alias("arr"),
                F.lit("").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["carry"] != "", F.concat(acc["arr"], F.array(acc["carry"]))
                )
                .otherwise(acc["arr"])
                .alias("arr"),
                x.alias("carry"),
            )
        )

    def finish(acc: Column) -> Column:
        return (
            F.when(acc["carry"] != "", F.concat(acc["arr"], F.array(acc["carry"])))
            .otherwise(acc["arr"])
        )

    init = F.struct(
        F.array().cast("array<string>").alias("arr"), F.lit("").alias("carry")
    )
    return F.aggregate(symbols, init, step, finish)


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
    checkpoint_every: int = 4,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, symbol_table)`` where ``merges`` is the ordered list
    of ``(a, b, corpus_count)`` merge rules (the tokenizer artifact) and
    ``symbol_table`` the final ``(word, freq, symbols)`` DataFrame.

    Stops early when no adjacent pair remains.  One bounded 1-row collect
    per iteration (the argmax pair); everything else is DataFrame algebra
    over the vocabulary-sized word table.
    """
    words = word_frequencies(df, text_col)
    table = words.select(
        "word", "freq", chars_col(F.col("word")).alias("symbols")
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        best = (
            adjacent_pair_counts(table)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # bounded: exactly one row (documented driver action)
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        table = table.withColumn("symbols", merge_pair_col(F.col("symbols"), a, b))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            # truncate the growing fold-expression lineage
            table = table.localCheckpoint()
    return merges, table


def bpe_encode(df: DataFrame, text_col: str, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Apply a trained merge table to a corpus: adds ``bpe_tokens``
    (array<string>) — per-word char split, merges replayed in training
    order, word boundaries preserved (flatten of per-word symbol arrays)."""
    words = F.transform(
        whitespace_tokens(F.col(text_col)), lambda w: F.split(w, "")
    )

    # factory, not default-arg capture: PySpark infers the higher-order
    # lambda's arity from the callable's PARAMETER COUNT, so `lambda s,
    # a=a, b=b` would be built as an (invalid) 3-arg array lambda
    def _merger(a: str, b: str):
        return lambda s: merge_pair_col(s, a, b)

    for a, b, _ in merges:
        words = F.transform(words, _merger(a, b))
    return df.withColumn("bpe_tokens", F.flatten(words))
