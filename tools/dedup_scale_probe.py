"""Banded dedup tier scale probe at 1x/10x/30x (VERDICT r9 ask #5).

CC got its 30x measurement in r9; this probe extends the same evidence to
the two banded candidate generators — MinHash+LSH (`minhash_lsh_pairs`,
16 bands x 4 hashes) and SimHash pigeonhole blocking (`simhash_near_pairs`,
4 chunks) — whose scale story rests on band/chunk-bucket joins staying
sub-quadratic as the corpus grows.

Measures, per scale (1x = driver sf0.1 documents, 10x = .scaledata/sf1
from tools/make_scale10.py, 30x = .scaledata/docs30 via the cc probe's
documents-only replica scheme — all replicas are DISTINCT documents, so
the duplicate-pair workload scales honestly):

- docs and wall seconds for the full verified-pair pipeline;
- candidate volume (bucket-join output BEFORE verification, built from the
  operator's OWN band/chunk tables via the internal helpers — the quantity
  that would go quadratic if banding broke) and verified pair count;
- candidate growth vs the quadratic baseline: a 30x corpus has 900x the
  all-pairs volume, so candidates growing ~30-90x is the sub-quadratic
  signature.

Results land in PLANS.md "dedup-band-scaling" by hand.

Usage: SPARK_GRAFT_CPUS=32 python tools/dedup_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import pyspark.sql.functions as F

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        SIMHASH_BITS,
        _shingle_rows,
        _sig_and_bands,
        minhash_lsh_pairs,
        simhash,
        simhash_near_pairs,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from cc_diameter_probe import _ensure_docs_scale

    spark = get_spark(
        "dedup_scale_probe",
        master=f"local[{os.environ['SPARK_GRAFT_CPUS']}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {"1x": "/root/testdata/sf0.1"}
    sf1 = os.path.join(REPO, ".scaledata", "sf1")
    if os.path.exists(os.path.join(sf1, "documents.parquet")):
        dirs["10x"] = sf1
    dirs["30x"] = _ensure_docs_scale(
        spark, "/root/testdata/sf0.1", os.path.join(REPO, ".scaledata", "docs30"), 30
    )

    results: dict[str, dict] = {}
    for tag, d in dirs.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n_docs = docs.count()
        row: dict = {"docs": n_docs}

        # -- MinHash LSH ----------------------------------------------------
        # candidate volume from the operator's own band table (the exact
        # rows its bucket self-join moves), then the full verified pipeline
        # timed end-to-end
        t0 = time.perf_counter()
        shingle_rows = _shingle_rows(docs, "text", "doc_id", 3).persist()
        _, band_rows = _sig_and_bands(shingle_rows, 64, 16, 42)
        a, b = band_rows.alias("a"), band_rows.alias("b")
        n_cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select("a.id", "b.id")
            .dropDuplicates()
            .count()
        )
        cand_sec = round(time.perf_counter() - t0, 1)
        shingle_rows.unpersist()
        t0 = time.perf_counter()
        n_pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=64, bands=16, n=3, threshold=0.8
        ).count()
        row["minhash"] = {
            "candidates": n_cand,
            "cand_sec": cand_sec,
            "pairs": n_pairs,
            "pipeline_sec": round(time.perf_counter() - t0, 1),
        }
        spark.catalog.clearCache()

        # -- SimHash ---------------------------------------------------------
        t0 = time.perf_counter()
        chunks, cb = 4, SIMHASH_BITS // 4
        sh = simhash(docs, "text", "doc_id").persist()
        with_chunks = sh.select(
            "id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * cb)
                        .bitwiseAND(F.lit((1 << cb) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ])
            ).alias("ck"),
        ).select("id", "ck.chunk", "ck.key")
        a, b = with_chunks.alias("a"), with_chunks.alias("b")
        n_scand = (
            a.join(
                b,
                (F.col("a.chunk") == F.col("b.chunk"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select("a.id", "b.id")
            .dropDuplicates()
            .count()
        )
        scand_sec = round(time.perf_counter() - t0, 1)
        sh.unpersist()
        t0 = time.perf_counter()
        n_spairs = simhash_near_pairs(docs, "text", "doc_id", max_hamming=3).count()
        row["simhash"] = {
            "candidates": n_scand,
            "cand_sec": scand_sec,
            "pairs": n_spairs,
            "pipeline_sec": round(time.perf_counter() - t0, 1),
        }
        spark.catalog.clearCache()

        results[tag] = row
        print(f"{tag}: {json.dumps(row)}", flush=True)

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
