"""Validate the LSH/approximate operators against their exact counterparts
(the rows-only queries' real correctness check)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import load_table
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.similarity import (
    cosine_topk,
    lsh_bucket_topk,
    lsh_near_pairs,
)


def test_md5_hash_family_matches_duckdb(spark, duck):
    """The engine-agnostic hash primitives under MinHash/SimHash signatures:
    Spark and DuckDB must agree bit-for-bit, including the permutation
    arithmetic staying inside signed-64 (DuckDB errors on bigint overflow)."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        MERSENNE61,
        _perm_hash,
        minhash_perm_coeffs,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
        md5_hash32,
        md5_hash32_sql,
        md5_hash60,
        md5_hash60_sql,
    )

    words = ["", "a", "hello world", "the quick brown fox", "x" * 500]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    a, b = minhash_perm_coeffs(1, seed=7)[0]
    srows = df.select(
        "w",
        md5_hash60(F.col("w")).alias("h60"),
        md5_hash32(F.col("w")).alias("h32"),
        _perm_hash(a, b, md5_hash32(F.col("w"))).alias("p"),
    ).collect()
    for r in srows:
        d60, d32, dp = duck.execute(
            f"SELECT {md5_hash60_sql('?')}, {md5_hash32_sql('?')},"
            f" ({a} * {md5_hash32_sql('?')} + {b}) % {MERSENNE61}",
            [r["w"]] * 3,
        ).fetchone()
        assert (r["h60"], r["h32"], r["p"]) == (d60, d32, dp), r["w"][:20]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def exact_pairs(docs):
    rows = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.8).collect()
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}


def test_testdata_has_planted_near_dups(exact_pairs):
    # the synthetic corpus plants near-duplicate docs; the exact operator
    # must surface them (guards against a silently-empty dedup pipeline)
    assert len(exact_pairs) >= 5
    assert max(exact_pairs.values()) > 0.95


def test_minhash_lsh_recall(docs, exact_pairs):
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=64, bands=16, n=3, threshold=0.8
        ).collect()
    }
    # 16 bands × 4 rows: P(candidate | j=0.8) ≈ 0.9998 — expect near-total recall
    recall = len(got & set(exact_pairs)) / len(exact_pairs)
    assert recall >= 0.9
    # verification step guarantees precision == 1 vs the exact operator
    assert got <= set(exact_pairs)


def test_simhash_finds_identical_token_docs(spark, docs):
    # plant an exact duplicate: identical token multisets hash to identical
    # simhashes, so the pair must surface at hamming 0
    src = docs.limit(1).select("doc_id", "text").first()
    clone_id = 10_000_000
    clone = spark.createDataFrame([(clone_id, src["text"])], ["doc_id", "text"])
    with_clone = docs.select("doc_id", "text").unionByName(clone)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(with_clone, "text", "doc_id", max_hamming=3).collect()
    }
    assert got.get((src["doc_id"], clone_id)) == 0


def test_dedup_exact_preserves_schema_and_rows(docs):
    out = dedup_exact(docs, "text", "doc_id")
    assert out.columns == docs.columns
    # no exact duplicates in the synthetic corpus → row-preserving
    assert out.count() == docs.count()


def test_ann_lsh_agrees_with_bruteforce(emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["id"] for r in cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()]
    approx = [
        r["id"]
        for r in lsh_bucket_topk(
            emb, "embedding", "vec_id", q, k=10, bits=8, probe_hamming=3
        ).collect()
    ]
    assert exact[0] == 0  # the query vector itself
    assert approx[0] == 0  # hamming(q, q) = 0 → always probed
    assert len(set(exact) & set(approx)) >= 3


def test_embedding_near_pairs_guard_fails_over_to_lsh(emb):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        embedding_near_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_pairs(emb, "embedding", "vec_id", threshold=0.3).collect()
    }
    # above the guard the plan must switch to the sub-quadratic LSH path,
    # whose verified output is a subset of the exact pair set
    guarded = embedding_near_pairs(
        emb, "embedding", "vec_id", threshold=0.3, max_exact_rows=1
    )
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    assert got <= exact
    assert len(got) > 0


def test_lsh_near_pairs_subset_of_exact(emb):
    approx = lsh_near_pairs(
        emb, "embedding", "vec_id", threshold=0.3, bits=16, bands=4, dim=64
    )
    rows = approx.collect()
    # verification filter bounds precision: every returned pair really has
    # cosine >= threshold
    assert all(r["cosine"] >= 0.3 for r in rows)


def test_embedding_near_pairs_multiblock_equals_singleblock(spark):
    """Cross-block completeness: with many blocks, every unordered pair must
    still surface exactly once (regression for the off-diagonal mask that
    dropped pairs whose smaller id hashed into the b-side block)."""
    import itertools

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        embedding_near_pairs,
    )

    n = 40
    clones = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_pairs(
            clones, "embedding", "vec_id", threshold=0.99, block_target=10, n_rows=n
        ).collect()
    }
    want = set(itertools.combinations(range(n), 2))
    assert got == want  # full C(40,2) = 780, no loss, no dupes

    # and a non-degenerate corpus: multi-block output == single-block output
    rng_rows = [
        (i, [float((i * 7 + d * 13) % 11 - 5) for d in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<double>")
    multi = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_pairs(
            df, "embedding", "vec_id", threshold=0.5, block_target=7, n_rows=60
        ).collect()
    }
    single = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_pairs(
            df, "embedding", "vec_id", threshold=0.5, block_target=4096, n_rows=60
        ).collect()
    }
    assert multi == single and len(single) > 0


def test_embedding_near_pairs_plans_no_nested_loop_join(emb):
    """The block-pair attach must be hash joins (index side broadcast), never
    a BroadcastNestedLoopJoin/CartesianProduct shipping packed matrices."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        embedding_near_pairs,
    )

    plan = embedding_near_pairs(
        emb, "embedding", "vec_id", threshold=0.3, block_target=100, n_rows=500
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
