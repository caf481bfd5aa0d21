"""Operator library: dedup, similarity search, text analysis, upsert joins,
multimodal binary plumbing, and scale-out primitives (salting, bucketing,
partitioned sinks)."""

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
    dedup_exact,
    embedding_near_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
    extract_features,
    with_binary_payload,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.scale import (
    events_partitioned_by_day,
    salted_count_distinct,
    salted_join,
    spread,
    write_bucketed,
    write_partitioned,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.similarity import (
    cosine_to_query,
    cosine_topk,
    ivf_flat_topk,
    ivf_flat_topk_trained,
    ivf_probe_partitioned,
    ivf_write_index,
    kmeans_centroids,
    lsh_bucket_topk,
    lsh_near_pairs,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
    detect_language,
    detect_language_agg,
    detect_from_scores,
    fingerprint_md5,
    quality_score,
    regex_token_count,
    shingles,
    token_count,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.upsert import (
    merge_update,
    merge_update_struct,
)

__all__ = [
    "cosine_to_query",
    "cosine_topk",
    "dedup_exact",
    "detect_from_scores",
    "detect_language",
    "detect_language_agg",
    "embedding_near_pairs",
    "events_partitioned_by_day",
    "exact_duplicates",
    "extract_features",
    "fingerprint_md5",
    "ivf_flat_topk",
    "ivf_flat_topk_trained",
    "ivf_probe_partitioned",
    "ivf_write_index",
    "kmeans_centroids",
    "lsh_bucket_topk",
    "lsh_near_pairs",
    "merge_update",
    "merge_update_struct",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "quality_score",
    "regex_token_count",
    "salted_count_distinct",
    "salted_join",
    "spread",
    "shingles",
    "simhash",
    "simhash_near_pairs",
    "token_count",
    "with_binary_payload",
    "write_bucketed",
    "write_partitioned",
]
