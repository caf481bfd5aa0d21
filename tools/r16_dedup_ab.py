"""Isolated A/B for the r16 dedup-family join-strategy gates (guide §1, §3).

Usage:
  python tools/r16_dedup_ab.py [runs]

For each target query, alternates OFF/ON of the r16 broadcast gates in ONE
session (same JVM, interleaved so drift hits both arms equally), timing the
noop-sink execution.  OFF = env kill-switches zero the gate budgets
(reproducing the r15 shuffle plans from this tree); ON = shipped defaults.

Prints a per-query median table; exit code 0 always (measurement tool).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFF = {
    "SPARK_GRAFT_SHINGLE_DF_BROADCAST_MAX_BYTES": "0",
    "SPARK_GRAFT_BAND_BROADCAST_MAX_ROWS": "0",
}

TARGETS = [
    "dedup_ngram_jaccard",
    "dedup_near_clusters",
    "dedup_keep_best_docs",
    "dedup_minhash_lsh",
    "dedup_incremental_minhash",
    "dedup_simhash",
    "dedup_simhash_k2",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark("r16-dedup-ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    results: dict[str, dict[str, list[float]]] = {}
    names = [n for n in (sys.argv[2:] or TARGETS) if n in QUERIES]
    for name in names:
        results[name] = {"off": [], "on": []}
        timed(name)  # warm-up, discarded
        for rep in range(runs):
            # alternate which arm goes first: a fixed off-then-on order
            # biases "off" toward colder JIT/caches (measured: phantom
            # 1.8x "wins" on plan-identical arms)
            order = ("off", "on") if rep % 2 == 0 else ("on", "off")
            for mode in order:
                if mode == "off":
                    os.environ.update(OFF)
                else:
                    for k in OFF:
                        os.environ.pop(k, None)
                results[name][mode].append(timed(name))
    print(f"\n{'query':32s} {'off_med':>8s} {'on_med':>8s} {'speedup':>8s}  samples")
    for name, r in results.items():
        off_m = statistics.median(r["off"])
        on_m = statistics.median(r["on"])
        print(
            f"{name:32s} {off_m:8.3f} {on_m:8.3f} {off_m / on_m:8.2f}x  "
            f"off={[round(x, 2) for x in r['off']]} on={[round(x, 2) for x in r['on']]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
