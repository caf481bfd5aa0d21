"""SemDeDup scale-knob probe (VERDICT r12 ask #2): measure
semantic_dedup_pairs at 10x with n_centroids scaled ∝ corpus vs the
oracle-pinned 8-cell configuration, plus the sub_blocks hot-cell knob on a
PLANTED hot cell.  Results land in PLANS.md §semdedup-cell-scaling by hand.

Matrix (embeddings: sf0.1 = 2k vectors, .scaledata/r12x10 = 20k):

  A. sf0.1,   8 cells  (the catalog row's configuration — baseline)
  B. r12x10,  8 cells  (the pinned config at 10x — the known 7.45x row)
  C. r12x10, 80 cells  (auto_n_centroids(20_000): cells constant-size —
                        the documented scale rule; expect ~linear)
  D. hot-cell plant at 10x, 80 cells, sub_blocks=1 vs 8 — 25% of vectors
     are re-pointed into one half-cone (same cell, pairwise cosine mostly
     below the 0.95 probe threshold so OUTPUT stays small while the
     quadratic comparison work concentrates in one packed cell).

Training (kmeans_centroids) is timed separately and excluded from the
dedup wall — the catalog row trains once and caches, so warm-query wall is
the comparable number.

Usage: python tools/semdedup_scale_probe.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

THRESHOLD = 0.95  # probe threshold: high, so planted hot cells don't make
# the OUTPUT quadratic — the work being measured is the comparison matrix


def timed(fn, n=3):
    samples = []
    for i in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i:  # first run is warmup
            samples.append(dt)
    return round(statistics.median(samples), 3)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import pyspark.sql.functions as F

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.similarity import (
        auto_n_centroids,
        kmeans_centroids,
        semantic_dedup_pairs,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark(
        "semdedup-probe",
        master=f"local[{os.environ['SPARK_GRAFT_CPUS']}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    one = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    ten = spark.read.parquet(
        os.path.join(REPO, ".scaledata", "r12x10", "embeddings.parquet")
    )
    n_one, n_ten = one.count(), ten.count()
    out: dict[str, dict] = {}

    def run_case(label, df, k, sub_blocks=1):
        t0 = time.perf_counter()
        cents = kmeans_centroids(df, "embedding", "vec_id", n_centroids=k, iters=2)
        train_s = round(time.perf_counter() - t0, 3)
        pairs = lambda: (
            semantic_dedup_pairs(
                df, "embedding", "vec_id", cents,
                threshold=THRESHOLD, dim=64, sub_blocks=sub_blocks,
            )
            .write.format("noop").mode("overwrite").save()
        )
        wall = timed(pairs)
        n_pairs = semantic_dedup_pairs(
            df, "embedding", "vec_id", cents,
            threshold=THRESHOLD, dim=64, sub_blocks=sub_blocks,
        ).count()
        out[label] = {
            "rows": df.count(), "cells": k, "sub_blocks": sub_blocks,
            "train_s": train_s, "dedup_s": wall, "pairs": n_pairs,
        }
        print(json.dumps({label: out[label]}), flush=True)
        spark.catalog.clearCache()

    run_case("A_sf0.1_8cells", one, 8)
    run_case("B_10x_8cells_pinned", ten, 8)
    run_case("C_10x_scaled_cells", ten, auto_n_centroids(n_ten))

    # D: plant a hot cell — re-point 25% of the 10x vectors into a half-cone
    # around one direction: e_0 + 0.9*(v/|v|) keeps them mutually dissimilar
    # enough (pairwise cosine mostly < 0.95) while they all share a cell.
    dim = 64
    base = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(i == 0, F.lit(10.0)).otherwise(F.lit(0.0))
        + F.element_at(F.col("embedding").cast("array<double>"), i + 1),
    )
    hot = ten.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 4 == 0, base).otherwise(
            F.col("embedding").cast("array<double>")
        ),
    )
    hot.write.mode("overwrite").parquet("/tmp/semdedup_hot.parquet")
    hot = spark.read.parquet("/tmp/semdedup_hot.parquet")
    k10 = auto_n_centroids(n_ten)
    run_case("D_hot_subblocks_1", hot, k10, sub_blocks=1)
    run_case("D_hot_subblocks_8", hot, k10, sub_blocks=8)

    if out["A_sf0.1_8cells"]["dedup_s"]:
        a = out["A_sf0.1_8cells"]["dedup_s"]
        for k in ("B_10x_8cells_pinned", "C_10x_scaled_cells"):
            out[k]["ratio_vs_1x"] = round(out[k]["dedup_s"] / a, 2)
    print("FINAL " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
