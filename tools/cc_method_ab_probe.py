"""A/B probe: dedup_keep_best_docs with CC method doubling vs frontier
(VERDICT r13 ask #2 — the query's driver row tripled 3.49→9.87s the round
the `method="doubling"` pin landed, under ambient load 8.4-10.8).

Runs the FULL catalog query (trigram candidate pairs + CC + rank window)
at the driver's bench scale, n timed runs per method after a warm-up, in
ONE session, alternating methods so JIT/session drift hits both equally.
Records the 1-minute loadavg at every sample so a contaminated run is
visible, and prints medians/mins plus the verdict the pin needs.

    python tools/cc_method_ab_probe.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import pyspark.sql.functions as F

    from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import load_table
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.graph import (
        dedup_keep_best,
    )
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "cc_ab",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(method: str) -> float:
        # time CONSTRUCTION + write: the iterative CC inside dedup_keep_best
        # runs driver-side sync actions (checkpoint + convergence counts)
        # at call time, not at sink time — timing only the write measured
        # 0.2s where the bench row costs seconds
        t0 = time.perf_counter()
        d = load_table(spark, sf, "documents")
        pairs = ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.8)
        out = dedup_keep_best(
            d, pairs, "doc_id", "n_chars", method=method
        ).select(F.col("id").alias("doc_id"), "cluster", "is_canonical")
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    results: dict[str, list] = {"doubling": [], "frontier": []}
    loads: dict[str, list] = {"doubling": [], "frontier": []}
    # one warm-up each (JIT/codegen/footers), then alternate
    for m in ("frontier", "doubling"):
        print(f"warmup {m}: {run(m):.2f}s", flush=True)
    for i in range(n):
        for m in ("doubling", "frontier"):
            loads[m].append(round(os.getloadavg()[0], 2))
            dt = run(m)
            results[m].append(round(dt, 3))
            print(f"run {i} {m}: {dt:.2f}s load={loads[m][-1]}", flush=True)

    print()
    for m in ("frontier", "doubling"):
        s = results[m]
        print(
            f"{m:9s} median={statistics.median(s):.3f}s min={min(s):.3f}s "
            f"samples={s} loads={loads[m]}"
        )
    med_d = statistics.median(results["doubling"])
    med_f = statistics.median(results["frontier"])
    print(
        f"\ndoubling/frontier median ratio: {med_d / med_f:.2f} "
        f"({'doubling LOSES — unpin' if med_d > med_f * 1.1 else 'within 10% or doubling wins — pin holds'})"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
