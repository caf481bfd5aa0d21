"""Dedup/graph cluster-skew probe (VERDICT r12 asks #3 and #7).

Part 1 — CC knob table on the uniform 10x replica (ask #3): the
dedup_keep_best_docs 10x row (4.31x, iteration-bound) cites knobs nobody
had timed on this shape.  Edges (ngram_jaccard_pairs over the 10x docs)
are materialized ONCE to parquet, then connected_components+keep-best runs
the knob matrix: method frontier/doubling x rounds_per_sync 1/2/4.

Part 2 — zipf cluster-size plant (ask #7): the 100 TB dedup reality is
power-law duplicate clusters (one boilerplate mega-cluster).  A planted
50k-doc corpus with cluster sizes {1500, 10x100, 20x20, rest singleton}
runs the two candidate-generation families end-to-end:

  - ngram_jaccard_pairs + dedup_keep_best (PPJoin prefix blocking: every
    rare-prefix shingle of the mega-cluster occurs in ~1500 docs, so ONE
    blocking key yields ~1.1M candidates — the AQE skew-join stress)
  - minhash_lsh_pairs (band buckets: the mega-cluster collides into the
    same (band, bucket) keys — the hot-bucket stress)

Planted members share a 60-token base text plus one unique suffix token
(pairwise Jaccard ~0.9 >= 0.8: a genuine near-dup clique), so OUTPUT is
legitimately ~size²/2 per cluster; the skew verdict compares wall against
the uniform corpus NORMALIZED by emitted pairs, not raw wall.

Results land in PLANS.md §cc-knobs-10x and §dedup-cluster-skew by hand.
Usage: python tools/cluster_skew_probe.py [part1|part2|all]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS10 = os.path.join(REPO, ".scaledata", "r12x10", "documents.parquet")
EDGES = "/tmp/skewprobe_edges.parquet"
PLANT = "/tmp/skewprobe_zipf_docs.parquet"


def timed(fn, n=3):
    samples = []
    for i in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i:
            samples.append(dt)
    return round(statistics.median(samples), 3)


def get_session():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark(
        "skew-probe",
        master=f"local[{os.environ['SPARK_GRAFT_CPUS']}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def part1(spark, out):
    import pyspark.sql.functions as F

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.graph import (
        connected_components,
        dedup_keep_best,
    )

    docs = spark.read.parquet(DOCS10)
    if not os.path.exists(EDGES):
        t0 = time.perf_counter()
        ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.8).write.mode(
            "overwrite"
        ).parquet(EDGES)
        out["edge_build_s"] = round(time.perf_counter() - t0, 3)
    edges = spark.read.parquet(EDGES)
    out["edges"] = edges.count()
    for method in ("frontier", "doubling"):
        for per in (1, 2, 4):
            stats: dict = {}

            def run():
                connected_components(
                    edges, max_iters=40, method=method,
                    rounds_per_sync=per, stats=stats,
                ).write.format("noop").mode("overwrite").save()

            wall = timed(run)
            out[f"cc_{method}_rps{per}"] = {
                "wall_s": wall, "syncs": stats.get("rounds"),
                "propagations": stats.get("propagations"),
                "jumps": stats.get("jumps"),
            }
            print(json.dumps({f"cc_{method}_rps{per}": out[f"cc_{method}_rps{per}"]}), flush=True)
            spark.catalog.clearCache()
    # end-to-end keep-best on cached edges at the default knobs, for scale
    kb = timed(
        lambda: dedup_keep_best(docs, edges, "doc_id", "n_chars")
        .write.format("noop").mode("overwrite").save()
    )
    out["keep_best_cached_edges_s"] = kb
    print(json.dumps({"keep_best_cached_edges_s": kb}), flush=True)


def build_plant(spark):
    """50k docs, zipf-flavored near-dup cluster sizes: one 1500-member
    mega-cluster, ten 100s, twenty 20s, the rest singletons.  Member i of
    cluster c: 60 shared tokens 'c<c>w<j>' + unique tail 'u<i>' (pairwise
    3-gram Jaccard ~0.93)."""
    import pyspark.sql.functions as F

    sizes = [1500] + [100] * 10 + [20] * 20
    bounds = []
    acc = 0
    for ci, s in enumerate(sizes):
        bounds.append((acc, acc + s, ci))
        acc += s
    n = 50_000
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    cluster = F.lit(None).cast("long")
    for lo, hi, ci in bounds:
        cluster = F.when(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi), F.lit(ci)
        ).otherwise(cluster)
    df = df.withColumn("cluster_plan", cluster)
    base = F.concat_ws(
        " ",
        *[F.concat(F.lit("c"), F.col("cluster_plan"), F.lit(f"w{j}")) for j in range(60)],
    )
    solo = F.concat_ws(
        " ", *[F.concat(F.lit("s"), F.col("doc_id"), F.lit(f"w{j}")) for j in range(60)]
    )
    text = F.when(
        F.col("cluster_plan").isNotNull(),
        F.concat(base, F.lit(" u"), F.col("doc_id")),
    ).otherwise(solo)
    df.select(
        "doc_id", text.alias("text"), F.length(text).cast("long").alias("n_chars")
    ).repartition(8).write.mode("overwrite").parquet(PLANT)


def part2(spark, out):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.graph import (
        dedup_keep_best,
    )

    if not os.path.exists(PLANT):
        build_plant(spark)
    plant = spark.read.parquet(PLANT)
    uniform = spark.read.parquet(DOCS10)
    for label, docs in (("uniform", uniform), ("zipf_plant", plant)):
        rec: dict = {}
        pairs_df = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.8)
        rec["ngram_pairs"] = pairs_df.count()
        rec["ngram_wall_s"] = timed(
            lambda: ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.8)
            .write.format("noop").mode("overwrite").save(),
            n=2,
        )
        spark.catalog.clearCache()
        rec["keep_best_wall_s"] = timed(
            lambda: dedup_keep_best(
                docs,
                ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.8),
                "doc_id",
                "n_chars",
            ).write.format("noop").mode("overwrite").save(),
            n=2,
        )
        spark.catalog.clearCache()
        mh = minhash_lsh_pairs(docs, "text", "doc_id")
        rec["minhash_pairs"] = mh.count()
        rec["minhash_wall_s"] = timed(
            lambda: minhash_lsh_pairs(docs, "text", "doc_id")
            .write.format("noop").mode("overwrite").save(),
            n=2,
        )
        spark.catalog.clearCache()
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
            simhash_near_pairs,
        )

        sh = simhash_near_pairs(docs, "text", "doc_id", key_chunks=2)
        rec["simhash_pairs"] = sh.count()
        rec["simhash_wall_s"] = timed(
            lambda: simhash_near_pairs(docs, "text", "doc_id", key_chunks=2)
            .write.format("noop").mode("overwrite").save(),
            n=2,
        )
        spark.catalog.clearCache()
        out[label] = rec
        print(json.dumps({label: rec}), flush=True)
    u, z = out["uniform"], out["zipf_plant"]
    for fam in ("ngram", "minhash", "simhash"):
        pw = z[f"{fam}_wall_s"] / max(u[f"{fam}_wall_s"], 1e-9)
        # per-emitted-pair normalization: clusters legitimately emit ~m²/2
        pp = (z[f"{fam}_wall_s"] / max(z[f"{fam}_pairs"], 1)) / (
            u[f"{fam}_wall_s"] / max(u[f"{fam}_pairs"], 1)
        )
        out[f"{fam}_wall_ratio"] = round(pw, 2)
        out[f"{fam}_per_pair_ratio"] = round(pp, 4)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_session()
    out: dict = {}
    if which in ("part1", "all"):
        part1(spark, out)
    if which in ("part2", "all"):
        part2(spark, out)
    print("FINAL " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
