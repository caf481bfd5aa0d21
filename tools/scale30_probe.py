"""30x scale probes for the heavy iterative families (VERDICT r14 ask #3).

The 100 TB claim rested on 10x measurements for three families (30x only
for the banded dedup tier); this extends the same replica protocol to 30x:

  cc          dedup_keep_best over ngram_jaccard candidate pairs on
              .scaledata/docs30 (150k docs, ~2.38M genuine pairs), the
              cc-method-ab protocol at 30x edges: doubling vs frontier,
              alternating in one session, loadavg recorded per sample —
              does doubling's 10x-edge win grow or invert at 30x?

  minhash_inc minhash_band_index built at 1x/10x/30x (5k/50k/150k docs),
              then a FIXED 500-doc increment (fresh prefix, so genuinely
              new text) probed against each index — probe wall must track
              the INCREMENT (flat-ish across index sizes modulo bucket
              fan-out), never the corpus.

  semdedup    semantic_dedup_pairs at 30x vectors (60k — built on demand
              into .scaledata/emb30 by the r12x10 rotation scheme: replica
              i rotates each embedding by i positions, so replicas are
              DISTINCT vectors with identical norms) at
              auto_n_centroids(60k)=240 cells vs the 10x/80-cell and
              1x/8-cell rows; k-means training timed separately (the
              catalog row trains once), warm wall median-of-3.

Results land in PLANS.md §scale30 by hand.

Usage: SPARK_GRAFT_CPUS=32 python tools/scale30_probe.py
       SPARK_GRAFT_PROBE_SECTIONS=cc,minhash_inc,semdedup (default all)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = "/root/testdata/sf0.1"
DOCS10 = os.path.join(REPO, ".scaledata", "docs10", "documents.parquet")
DOCS30 = os.path.join(REPO, ".scaledata", "docs30", "documents.parquet")
EMB30 = os.path.join(REPO, ".scaledata", "emb30", "embeddings.parquet")
EMB10 = os.path.join(REPO, ".scaledata", "r12x10", "embeddings.parquet")


def loadavg() -> float:
    return round(os.getloadavg()[0], 2)


def timed(fn, n=3, warmup=1):
    samples, loads = [], []
    for i in range(n + warmup):
        loads.append(loadavg())
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i >= warmup:
            samples.append(round(dt, 3))
    return round(statistics.median(samples), 3), samples, loads


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sections = set(
        os.environ.get(
            "SPARK_GRAFT_PROBE_SECTIONS", "cc,minhash_inc,semdedup"
        ).split(",")
    )

    import pyspark.sql.functions as F

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        minhash_band_index,
        minhash_probe_index,
        ngram_jaccard_pairs,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.graph import dedup_keep_best
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.similarity import (
        auto_n_centroids,
        kmeans_centroids,
        semantic_dedup_pairs,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "scale30",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def sink(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # --- cc: keep-best collapse, doubling vs frontier at 30x edges --------
    if "cc" in sections:
        docs30 = spark.read.parquet(DOCS30)
        n_docs = docs30.count()
        print(f"[cc] docs30: {n_docs} docs")

        def run_cc(method: str) -> None:
            # construction included: the CC loop materializes during build
            # (the r14 measurement trap — sink-only timing misses ~95%)
            pairs = ngram_jaccard_pairs(docs30, "text", "doc_id", n=3, threshold=0.8)
            best = dedup_keep_best(
                docs30, pairs, "doc_id", "n_chars", method=method
            ).select(F.col("id").alias("doc_id"), "cluster", "is_canonical")
            sink(best)
            spark.catalog.clearCache()

        # alternate methods so session drift hits both equally
        results: dict[str, list[float]] = {"doubling": [], "frontier": []}
        loads: list[float] = []
        for rnd in range(4):  # first alternation pair discarded as warm-up
            for method in ("doubling", "frontier"):
                loads.append(loadavg())
                t0 = time.perf_counter()
                run_cc(method)
                dt = round(time.perf_counter() - t0, 3)
                if rnd:
                    results[method].append(dt)
                print(f"[cc] round={rnd} {method}: {dt}s load={loads[-1]}")
        for m, s in results.items():
            print(f"[cc] {m}: median={statistics.median(s)} samples={s}")
        print(f"[cc] loads: {loads}")

    # --- minhash_inc: fixed increment vs index scale ----------------------
    if "minhash_inc" in sections:
        base = spark.read.parquet(os.path.join(SF1, "documents.parquet"))
        # fixed 500-doc increment with fresh text (new prefix = new shingles)
        increment = (
            base.limit(500)
            .withColumn("doc_id", F.col("doc_id") + F.lit(9_000_000_000))
            .withColumn("text", F.concat(F.lit("inc "), F.col("text")))
        )
        for label, path in (
            ("1x", os.path.join(SF1, "documents.parquet")),
            ("10x", DOCS10),
            ("30x", DOCS30),
        ):
            corpus = spark.read.parquet(path)
            n = corpus.count()
            idx = minhash_band_index(corpus, "text", "doc_id").persist()
            n_idx = idx.count()  # materialize the index OUTSIDE probe timing

            def probe() -> None:
                sink(minhash_probe_index(increment, idx, "text", "doc_id"))

            med, samples, lds = timed(probe, n=3)
            hits = minhash_probe_index(increment, idx, "text", "doc_id").count()
            print(
                f"[minhash_inc] {label}: corpus={n} index_rows={n_idx} "
                f"probe_median={med}s samples={samples} loads={lds} hits={hits}"
            )
            idx.unpersist()
            spark.catalog.clearCache()

    # --- semdedup: 30x vectors at scaled cells ----------------------------
    if "semdedup" in sections:
        if not os.path.exists(EMB30):
            # build 60k distinct vectors: replica i rotates embeddings by i
            # (same scheme as r12x10 — norms preserved, vectors distinct)
            emb = spark.read.parquet(os.path.join(SF1, "embeddings.parquet"))
            dim = 64
            parts = []
            for i in range(30):
                rep = emb.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * 100_000_000)
                )
                if i:
                    rep = rep.withColumn(
                        "embedding",
                        F.concat(
                            F.slice("embedding", i + 1, dim - i),
                            F.slice("embedding", 1, i),
                        ),
                    )
                parts.append(rep)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.repartition(8).write.mode("overwrite").parquet(EMB30)
            print(f"[semdedup] built {EMB30}")

        for label, path, k in (
            ("1x/8", os.path.join(SF1, "embeddings.parquet"), 8),
            ("10x/80", EMB10, 80),
            ("30x/240", EMB30, auto_n_centroids(60_000)),
        ):
            df = spark.read.parquet(path).persist()
            n = df.count()
            t0 = time.perf_counter()
            cents = kmeans_centroids(df, "embedding", "vec_id", n_centroids=k, iters=2)
            train_s = round(time.perf_counter() - t0, 3)

            def dedup() -> None:
                sink(
                    semantic_dedup_pairs(
                        df, "embedding", "vec_id", cents, threshold=0.95, dim=64
                    )
                )

            med, samples, lds = timed(dedup, n=3)
            n_pairs = semantic_dedup_pairs(
                df, "embedding", "vec_id", cents, threshold=0.95, dim=64
            ).count()
            print(
                f"[semdedup] {label}: n={n} k={k} train={train_s}s "
                f"dedup_median={med}s samples={samples} loads={lds} pairs={n_pairs}"
            )
            df.unpersist()
            spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
