"""CC round-count vs scale probe (VERDICT r8 ask #6).

The two r8 10x-scaling outliers (dedup_keep_best_docs 5.85x,
dedup_near_clusters 5.57x) are connected-components-round-bound: sync
rounds grow with component DIAMETER, not row count.  This probe produces
the hard numbers behind that claim and behind the new pointer-doubling
mode (operators/graph.py::connected_components(method="doubling")):

1. synthetic diameter sweep — ~65k vertices arranged as parallel chains of
   length L in {15, 63, 255, 1023}: frontier syncs grow ~L/2, doubling
   ~log2(L); wall time follows syncs;
2. the REAL near-dup graphs — documents at 1x (driver sf0.1), 10x
   (.scaledata/sf1 from tools/make_scale10.py) and a generated 30x
   documents-only replica set (same key-offset + replica-prefix-token
   scheme as make_scale10, so documents stay DISTINCT and the pair
   workload scales honestly): measured rounds + seconds, frontier vs
   doubling.

Results land in PLANS.md §cc-diameter-scaling by hand.

Usage: python tools/cc_diameter_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BIG = 100_000_000


def _ensure_docs_scale(spark, src: str, dst: str, replicas: int) -> str:
    """documents-only scale-up, make_scale10's exact scheme."""
    import pyspark.sql.functions as F

    out = os.path.join(dst, "documents.parquet")
    if os.path.exists(out):
        return dst
    os.makedirs(dst, exist_ok=True)
    df = spark.read.parquet(os.path.join(src, "documents.parquet"))
    parts = []
    for i in range(replicas):
        rep = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * BIG))
        pref = f"r{i} "
        rep = rep.withColumn("text", F.concat(F.lit(pref), F.col("text")))
        if "n_chars" in rep.columns:
            rep = rep.withColumn("n_chars", F.col("n_chars") + F.lit(len(pref)))
        parts.append(rep)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(out)
    return dst


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import pyspark.sql.functions as F

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import ngram_jaccard_pairs
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.graph import connected_components
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark(
        "cc_probe",
        master=f"local[{os.environ['SPARK_GRAFT_CPUS']}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {"synthetic": {}, "neardup": {}}

    # -- 1. synthetic diameter sweep ------------------------------------
    n_vertices = 65_536
    for chain_len in (15, 63, 255, 1023):
        n_chains = n_vertices // (chain_len + 1)
        # vertex v = chain*(L+1)+pos, edge (v, v+1) for pos in [0, L)
        edges = (
            spark.range(n_chains * chain_len)
            .select(
                (F.col("id") % n_chains).alias("c"),
                (F.col("id") / n_chains).cast("long").alias("p"),
            )
            .select(
                (F.col("c") * (chain_len + 1) + F.col("p")).alias("id_a"),
                (F.col("c") * (chain_len + 1) + F.col("p") + 1).alias("id_b"),
            )
        )
        row = {}
        for method, cap in (("frontier", 4 * chain_len), ("doubling", 64)):
            st: dict = {}
            t0 = time.perf_counter()
            out = connected_components(
                edges, max_iters=cap, method=method, stats=st
            )
            n_comp = out.select("component").distinct().count()
            row[method] = {
                "rounds": st["rounds"],
                "sec": round(time.perf_counter() - t0, 1),
                "components": n_comp,
            }
            assert n_comp == n_chains, (chain_len, method, n_comp, n_chains)
        results["synthetic"][f"L={chain_len}"] = row
        print(f"chain L={chain_len}: {json.dumps(row)}", flush=True)
        spark.catalog.clearCache()

    # -- 2. real near-dup pair graphs at 1x / 10x / 30x ------------------
    dirs = {"1x": "/root/testdata/sf0.1"}
    sf1 = os.path.join(REPO, ".scaledata", "sf1")
    if os.path.exists(os.path.join(sf1, "documents.parquet")):
        dirs["10x"] = sf1
    dirs["30x"] = _ensure_docs_scale(
        spark, "/root/testdata/sf0.1", os.path.join(REPO, ".scaledata", "docs30"), 30
    )
    for tag, d in dirs.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.8)
        pairs = pairs.localCheckpoint()  # pay the pair pipeline once per scale
        n_pairs = pairs.count()
        row = {"docs": docs.count(), "pairs": n_pairs}
        for method in ("frontier", "doubling"):
            st = {}
            t0 = time.perf_counter()
            out = connected_components(
                pairs, max_iters=40, method=method, stats=st
            )
            n_comp = out.select("component").distinct().count()
            row[method] = {
                "rounds": st["rounds"],
                "sec": round(time.perf_counter() - t0, 1),
                "components": n_comp,
            }
        results["neardup"][tag] = row
        print(f"neardup {tag}: {json.dumps(row)}", flush=True)
        spark.catalog.clearCache()

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
