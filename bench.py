"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
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
        QUERIES["top_event_types"].fn(spark, sf_dir).collect()
    except Exception as exc:
        print(f"bench: warm-up failed: {exc}", file=sys.stderr)

    t_all = time.perf_counter()
    for name, q in QUERIES.items():
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            n = df.count() if "write" not in q.tags else None
            _ = n
        except Exception as exc:  # keep benching even if one query regresses
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = None  # null in JSON (NaN is invalid strict JSON)
            continue
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_all, 4)

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
