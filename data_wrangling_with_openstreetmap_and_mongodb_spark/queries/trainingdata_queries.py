"""Training-data pipeline queries (dedup / similarity / text analysis) wired
into the driver's oracle gate.

SQL-expressible operators get full DuckDB oracles (value-hash checked);
hash-based LSH variants (engine-specific hash functions) register without an
oracle → the driver records the weaker rows-only check, and the LSH result is
instead validated in tests against the exact operator it approximates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import load_table
from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
    davg,
    davg_sql,
    quantize6_sql,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
    embedding_near_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.similarity import (
    cosine_topk,
    lsh_bucket_topk,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
    STOPWORDS,
    detect_language,
    fingerprint_md5,
    quality_score,
    regex_token_count,
    token_count,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.queries.registry import register

_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_SQL_LTOKS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def _sql_stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
@register(
    "text_token_stats",
    oracle=f"""
        SELECT lang,
               AVG(len({_SQL_TOKS})) AS avg_tokens,
               AVG(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')))
                   AS avg_bpe_tokens,
               AVG(n_chars) AS avg_chars,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang
    """,
    doc="token counting, whitespace + BPE-ish regex pre-tokenization "
    "(training-data text op; integer sums are exact so plain AVG hash-matches)",
    tags=("text", "agg"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.avg(token_count(F.col("text"))).alias("avg_tokens"),
        F.avg(regex_token_count(F.col("text"))).alias("avg_bpe_tokens"),
        F.avg("n_chars").alias("avg_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "text_quality_by_source",
    oracle=f"""
        WITH scored AS (
            SELECT source,
                   len({_SQL_TOKS}) AS n_tok,
                   length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1) AS pr,
                   list_sum(list_transform({_SQL_TOKS}, t -> length(t)))::DOUBLE
                       / greatest(len({_SQL_TOKS}), 1) AS mwl,
                   len(list_filter({_SQL_LTOKS}, t -> list_contains({_sql_stop_list("en")}, t)))::DOUBLE
                       / greatest(len({_SQL_LTOKS}), 1) AS sr
            FROM documents
        )
        SELECT source,
               {davg_sql('''(CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.25 END) * 0.4
                  + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.5 END) * 0.2
                  + (CASE WHEN mwl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2
                  + (CASE WHEN sr > 0.01 THEN 1.0 ELSE 0.75 END) * 0.2''')} AS avg_quality,
               COUNT(*) AS n_docs
        FROM scored
        GROUP BY source
    """,
    doc="composite quality scoring (length/punct/stopword/word-length bands)",
    tags=("text", "agg"),
)
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        davg(quality_score(F.col("text"))).alias("avg_quality"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def _sql_lang_score(lang: str) -> str:
    return f"len(list_filter({_SQL_LTOKS}, t -> list_contains({_sql_stop_list(lang)}, t)))"


@register(
    "lang_id_confusion",
    oracle=f"""
        WITH scores AS (
            SELECT lang,
                   {_sql_lang_score("de")} AS s_de,
                   {_sql_lang_score("en")} AS s_en,
                   {_sql_lang_score("es")} AS s_es,
                   {_sql_lang_score("fr")} AS s_fr
            FROM documents
        )
        SELECT lang,
               CASE WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                    WHEN s_en > 0 AND s_en >  s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                    WHEN s_es > 0 AND s_es >  s_de AND s_es >  s_en AND s_es >= s_fr THEN 'es'
                    WHEN s_fr > 0 AND s_fr >  s_de AND s_fr >  s_en AND s_fr >  s_es THEN 'fr'
                    ELSE 'unknown' END AS detected,
               COUNT(*) AS cnt
        FROM scores
        GROUP BY lang, detected
    """,
    doc="stopword-hit language-ID heuristic vs labeled lang column",
    tags=("text", "agg"),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", detect_language(F.col("text")).alias("detected"))
        .groupBy("lang", "detected")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------
@register(
    "dedup_exact_groups",
    oracle="""
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS dup_count
        FROM documents
        GROUP BY fingerprint
    """,
    doc="exact dedup via normalized-content fingerprint hash-aggregate",
    tags=("dedup", "agg"),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_duplicates(d, "text", "doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_SQL_LTOKS} AS t FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3 THEN
                       list_distinct([array_to_string(list_slice(t, i, i+2), ' ')
                                      for i in range(1, greatest(len(t) - 2, 1) + 1)])
                   ELSE [] END AS s
            FROM toks
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s))::DOUBLE
                   / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.s, b.s))::DOUBLE
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    """,
    doc="n-gram Jaccard near-dup pairs via prefix-filtered shingle self-join. "
    "Trigram shingles: the corpus vocabulary is tiny, so bigrams appear in "
    "hundreds of documents each and block nothing, while trigrams have "
    "single-digit document frequency — blocking quality is a data property, "
    "measured, not assumed.",
    tags=("dedup", "join"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.8)


@register(
    "dedup_minhash_lsh",
    oracle=None,  # engine-specific hash functions; validated vs exact Jaccard in tests
    doc="MinHash+LSH banded near-dup candidates, Jaccard-verified",
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "text", "doc_id", num_hashes=64, bands=16, n=3, threshold=0.8)


@register(
    "dedup_simhash",
    oracle=None,  # engine-specific hash functions
    doc="SimHash Hamming-distance near-dup pairs with pigeonhole blocking",
    tags=("dedup", "lsh"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(d, "text", "doc_id", max_hamming=3)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
        WITH n AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
            FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {quantize6_sql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")} AS cosine
        FROM n a, n b
        WHERE a.vec_id < b.vec_id
          AND {quantize6_sql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")} >= 0.3
    """,
    doc="embedding-cosine near-dup pairs (brute force; LSH variant separate)",
    tags=("dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs(e, "embedding", "vec_id", threshold=0.3)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------
def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    e = load_table(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(x) for x in row[0]]


@register(
    "ann_bruteforce_topk",
    oracle=f"""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
        )
        SELECT e.vec_id AS id,
               {quantize6_sql('''list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
                   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(q.qe, q.qe)))''')} AS cosine
        FROM embeddings e, q
        ORDER BY cosine DESC, id ASC
        LIMIT 10
    """,
    doc="exact cosine top-k (brute force baseline; TakeOrderedAndProject plan)",
    tags=("similarity", "topk"),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(e, "embedding", "vec_id", _query_vector(spark, sf_dir), k=10)


@register(
    "ann_lsh_topk",
    oracle=None,  # approximate; recall vs brute force asserted in tests
    doc="sign-LSH bucketed ANN top-k (multi-probe Hamming ≤ r)",
    tags=("similarity", "topk", "lsh"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_bucket_topk(
        e, "embedding", "vec_id", _query_vector(spark, sf_dir), k=10, bits=8, probe_hamming=3
    )


@register(
    "doc_fingerprints",
    oracle="""
        SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    doc="per-document content fingerprint (md5 of normalized text)",
    tags=("text",),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_md5(F.col("text")).alias("fingerprint"))
