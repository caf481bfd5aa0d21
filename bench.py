"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (round-over-round comparability):
- each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) back-to-back and
  reports the median, so one-off JIT/codegen warmup doesn't land on whichever
  query happens to run first;
- execution is forced through the noop sink (format("noop")), which computes
  every output column — ``count()`` lets Catalyst prune projection-only work
  (e.g. a fingerprint column) and under-measures;
- "value" is the sum of per-query medians: the steady-state cost of one full
  catalog pass.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    timings: dict[str, float | None] = {}
    # Warm the JVM + parquet footers once (excluded from per-query timings).
    try:
        QUERIES["pricing_summary"].fn(spark, sf_dir).count()
    except Exception as exc:
        print(f"bench: warm-up failed: {exc}", file=sys.stderr)

    for name, q in QUERIES.items():
        samples: list[float] = []
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                df = q.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
        except Exception as exc:  # keep benching even if one query regresses
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = None  # null in JSON (NaN is invalid strict JSON)
            continue
        finally:
            # per-query isolation: operators that persist shared front-ends
            # (dedup shingle/signature tables) register a NEW cache entry per
            # call; dropping them between queries keeps later measurements
            # free of accumulated executor-memory pressure
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(t for t in timings.values() if t is not None), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
