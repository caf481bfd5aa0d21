"""Corpus search and statistical-LM scoring: BM25 keyword ranking and
unigram language-model log-probability (a classic data-quality signal).

Both are expressed as pure DataFrame aggregation pipelines over one exploded
token stream — no inverted index is materialized driver-side, no Python row
path — so they run as ordinary shuffled hash-aggregates at corpus scale:

- :func:`bm25_topk` — Okapi BM25 over whitespace tokens.  The corpus-level
  statistics it needs (document frequency per query term, average document
  length) are tiny: per-term DF is at most ``len(terms)`` rows (broadcast),
  and the length stats are a single row (broadcast cross-join).  The corpus
  side is touched exactly twice, both times as linear scans feeding hash
  aggregates; the final ranking is a ``TakeOrderedAndProject`` top-k, never
  a full sort.
- :func:`unigram_logprob` — per-document mean log-probability under the
  corpus's own unigram distribution.  Low (very negative) scores mark
  documents made of rare junk tokens; high scores mark boilerplate.  The
  vocabulary table is built with one hash-aggregate and joined back by
  token (AQE broadcasts it when small — natural-language vocabularies are
  millions of rows against billions of documents, well inside broadcast
  range after the count aggregation).

Determinism/oracle story: token probabilities and BM25 addends are combined
with the quantized order-independent sum (functions/detagg.py), and ``ln``
is bit-identical between the JVM and DuckDB (verified on this platform), so
both scores hash-match an external SQL oracle at any parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
    davg,
    dsum,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
    _exploded_tokens,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
    token_count,
)


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 scores for every MATCHING document (no ranking cut):
    ``(id, score, n_terms_hit)`` — the scoring core shared by
    :func:`bm25_topk` and the ``$search`` stage facade
    (docstore/pipeline.py).

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

    Plan shape: one exploded-token scan → per-(id, term) tf hash-agg (the
    pre-shuffle by id satisfies the grouping, so no extra exchange); df(t)
    reduces the tf rows to ≤ ``len(terms)`` rows (broadcast back); doc
    lengths come from a codegen'd regex count on the base table with the
    (N, avgdl) single row broadcast onto scorers.  Per-document scores
    combine with the quantized order-independent sum, so ranking ties are
    engine-stable.  Final top-k is TakeOrderedAndProject.
    """
    lower_terms = [t.lower() for t in terms]
    # Term filter INSIDE the token array, before any explode: the row stream
    # entering the shuffle carries only query-term hits (a handful per
    # document) instead of every token — at corpus scale the full-token
    # explode, not the scoring, is the bottleneck.  The spread keeps the
    # tokenize+filter pass parallel off few-split scans.
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.scale import (
        spread,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
        whitespace_tokens,
    )

    hits = spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")), "id").select(
        "id",
        F.explode(
            F.filter(
                whitespace_tokens(F.lower(F.col("__text"))),
                lambda t: t.isin(*lower_terms),
            )
        ).alias("tok"),
    )
    tf = hits.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))
    dl = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("double").alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    contrib = (
        tf.join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(dfreq), "tok")
        .select(
            "id",
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return contrib.groupBy("id").agg(
        dsum("s").alias("score"), F.count(F.lit(1)).alias("n_terms_hit")
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag of query ``terms`` by Okapi BM25:
    ``(id, score, n_terms_hit)``, score descending, id ascending on ties
    (TakeOrderedAndProject over :func:`bm25_scores`)."""
    return (
        bm25_scores(df, text_col, id_col, terms, k1=k1, b=b)
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def bm25_topk_sql(
    table: str,
    text_expr: str,
    id_expr: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle reproducing :func:`bm25_topk` value-for-value."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
        dsum_sql,
    )

    term_list = "[" + ", ".join(f"'{t.lower()}'" for t in terms) + "]"
    return f"""
        WITH toks AS (
            SELECT {id_expr} AS id,
                   unnest(list_filter(string_split(lower({text_expr}), ' '),
                                      x -> x <> '')) AS tok
            FROM {table}
        ),
        tf AS (
            SELECT id, tok, COUNT(*) AS tf FROM toks
            WHERE list_contains({term_list}, tok) GROUP BY id, tok
        ),
        dfreq AS (SELECT tok, COUNT(*) AS df_t FROM tf GROUP BY tok),
        dl AS (
            SELECT {id_expr} AS id,
                   CAST(len(list_filter(string_split({text_expr}, ' '),
                                        x -> x <> '')) AS DOUBLE) AS dl
            FROM {table}
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   SUM(dl) / COUNT(*) AS avgdl
            FROM dl
        ),
        contrib AS (
            SELECT tf.id,
                   ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                   * (tf * {k1 + 1.0!r})
                   / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)) AS s
            FROM tf
            JOIN dl USING (id)
            CROSS JOIN stats
            JOIN dfreq USING (tok)
        )
        SELECT id, {dsum_sql('s')} AS score, COUNT(*) AS n_terms_hit
        FROM contrib GROUP BY id
        ORDER BY score DESC, id ASC LIMIT {k}
    """


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    token distribution: ``(id, n_tokens, avg_logprob)``.

    The poor-man's perplexity filter: train nothing, score every document by
    how typical its tokens are of the corpus.  Two hash-aggregates (vocab
    histogram; per-document quantized mean) plus one join by token.
    Documents with zero tokens are absent from the output (no tokens — no
    distribution to score under).
    """
    # persisted: the token stream feeds the vocab aggregate AND the scoring
    # join (and the vocab feeds the total) — without it the explode runs
    # three times in one job (same structural-reuse rationale as the dedup
    # shingle front-ends)
    toks = _exploded_tokens(df, text_col, id_col).persist()
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_t")).persist()
    total = vocab.agg(F.sum("c_t").cast("double").alias("t_total"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select("id", F.log(F.col("c_t") / F.col("t_total")).alias("lp"))
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"), davg("lp").alias("avg_logprob")
    )


def unigram_logprob_sql(table: str, text_expr: str, id_expr: str) -> str:
    """DuckDB oracle reproducing :func:`unigram_logprob` value-for-value."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
        davg_sql,
    )

    return f"""
        WITH toks AS (
            SELECT {id_expr} AS id,
                   unnest(list_filter(string_split(lower({text_expr}), ' '),
                                      x -> x <> '')) AS tok
            FROM {table}
        ),
        vocab AS (SELECT tok, COUNT(*) AS c_t FROM toks GROUP BY tok),
        total AS (SELECT CAST(SUM(c_t) AS DOUBLE) AS t_total FROM vocab),
        scored AS (
            SELECT id, ln(c_t / t_total) AS lp
            FROM toks JOIN vocab USING (tok) CROSS JOIN total
        )
        SELECT id, COUNT(*) AS n_tokens, {davg_sql('lp')} AS avg_logprob
        FROM scored GROUP BY id
    """


# ---------------------------------------------------------------------------
# Positional index + phrase search
# ---------------------------------------------------------------------------
def positional_index(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """``(tok, id, pos)`` positional inverted index — the build side of
    phrase/proximity search.  At corpus scale this is written ONCE
    partitioned/bucketed by ``tok`` so phrase probes touch only their
    terms' postings; here it's the same rows produced on the fly."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
        .repartition(n_parts, "id")
        .select(
            "id",
            F.posexplode(
                F.filter(F.split(F.lower(F.col("__text")), r"\s+"), lambda t: t != "")
            ).alias("pos", "tok"),
        )
    )


def phrase_match_counts(
    index: DataFrame, phrase: list[str]
) -> DataFrame:
    """Documents containing the exact token ``phrase`` (consecutive
    positions): ``(id, n_matches)``, one row per matching document.

    The classic positional-postings intersection: each phrase term's
    postings are anchored to ``pos − offset`` and equi-joined on
    ``(id, anchor)`` — a match survives all k joins exactly when the terms
    appear consecutively.  Join keys are (tok-filtered) postings only, so
    the work is bounded by the RAREST term's postings after the first
    join — the reason search engines process phrases by ascending document
    frequency.  Duplicate phrase terms are handled naturally (each slot
    filters independently)."""
    terms = [t.lower() for t in phrase]
    out = None
    for i, term in enumerate(terms):
        side = (
            index.filter(F.col("tok") == term)
            .select("id", (F.col("pos") - F.lit(i)).alias("anchor"))
        )
        out = side if out is None else out.join(side, ["id", "anchor"])
    return out.groupBy("id").agg(F.count(F.lit(1)).alias("n_matches"))
