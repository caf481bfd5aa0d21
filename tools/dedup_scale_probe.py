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

r11 adds the `simhash_k2` section (VERDICT r10 ask #2): the combinatorial
2-chunk block keys (`key_chunks=2`, 10 keys x 24 bits instead of 4 x 15)
measured against the same corpus replicas — the row that shows candidates
tracking TRUE pairs instead of corpus².  SPARK_GRAFT_PROBE_SECTIONS
(comma list of minhash/simhash/simhash_k2, default all) selects sections,
so the new row doesn't force a re-run of the already-documented k=1
collision-bound measurement.

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
        _shingle_rows,
        _sig_and_bands,
        minhash_lsh_pairs,
        simhash,
        simhash_block_keys,
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
    else:
        # full sf1 not built this session: a documents-only 10x replica is
        # enough for the dedup tier (same scheme, same workload)
        dirs["10x"] = _ensure_docs_scale(
            spark, "/root/testdata/sf0.1", os.path.join(REPO, ".scaledata", "docs10"), 10
        )
    dirs["30x"] = _ensure_docs_scale(
        spark, "/root/testdata/sf0.1", os.path.join(REPO, ".scaledata", "docs30"), 30
    )

    KNOWN_SECTIONS = {"minhash", "simhash", "simhash_k2"}
    sections = {
        s.strip()
        for s in os.environ.get(
            "SPARK_GRAFT_PROBE_SECTIONS", ",".join(sorted(KNOWN_SECTIONS))
        ).split(",")
        if s.strip()
    }
    unknown = sections - KNOWN_SECTIONS
    if unknown:
        # fail loudly: a typo would otherwise silently skip a measurement
        raise SystemExit(
            f"unknown SPARK_GRAFT_PROBE_SECTIONS {sorted(unknown)}; "
            f"known: {sorted(KNOWN_SECTIONS)}"
        )

    def _simhash_candidates(docs, key_chunks: int) -> tuple[int, float]:
        """Distinct candidate-pair count from the operator's own block-key
        table (the exact rows its self-join moves) + wall seconds."""
        t0 = time.perf_counter()
        sh = simhash(docs, "text", "doc_id").persist()
        with_keys = sh.select(
            "id",
            F.explode(
                simhash_block_keys(F.col("simhash"), 3, key_chunks)
            ).alias("ck"),
        ).select("id", "ck.block", "ck.key")
        a, b = with_keys.alias("a"), with_keys.alias("b")
        n = (
            a.join(
                b,
                (F.col("a.block") == F.col("b.block"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select("a.id", "b.id")
            .dropDuplicates()
            .count()
        )
        sec = round(time.perf_counter() - t0, 1)
        sh.unpersist()
        return n, sec

    results: dict[str, dict] = {}
    for tag, d in dirs.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n_docs = docs.count()
        row: dict = {"docs": n_docs}

        # -- SimHash combinatorial 2-chunk keys (r11) -------------------------
        if "simhash_k2" in sections:
            n_k2, k2_sec = _simhash_candidates(docs, key_chunks=2)
            t0 = time.perf_counter()
            n_k2pairs = simhash_near_pairs(
                docs, "text", "doc_id", max_hamming=3, key_chunks=2
            ).count()
            row["simhash_k2"] = {
                "candidates": n_k2,
                "cand_sec": k2_sec,
                "pairs": n_k2pairs,
                "pipeline_sec": round(time.perf_counter() - t0, 1),
            }
            spark.catalog.clearCache()

        # -- MinHash LSH ----------------------------------------------------
        # candidate volume from the operator's own band table (the exact
        # rows its bucket self-join moves), then the full verified pipeline
        # timed end-to-end
        if "minhash" in sections:
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

        # -- SimHash single-chunk (classic, collision-bound) ------------------
        if "simhash" in sections:
            n_scand, scand_sec = _simhash_candidates(docs, key_chunks=1)
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
