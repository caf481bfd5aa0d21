"""Zipfian skew-stress probe for the user-keyed join/window families
(VERDICT r11 ask #3).

Every earlier scaling probe replicated events with DISJOINT, balanced
key-shifted users — which can never surface skew.  A 100 TB events table is
zipfian in user_id, so this probe rebuilds the 10x events replica with
user_id REMAPPED to a zipf(s=1.2) distribution over the SAME user
cardinality (row count, timestamps, values, event types untouched), runs the
user-keyed driver queries on both layouts, and records:

- wall time uniform vs skewed (the contract: skewed <= 3x uniform, else the
  query needs salting/repartition treatment);
- whether AQE's skew machinery engages, read from the FINAL adaptive plan
  ("skew=true" on a sort-merge join / "coalesced" AQEShuffleReads);
- the data-level straggler ratio: rows landing in the hottest shuffle
  partition of a user_id exchange vs the mean partition, at the session's
  shuffle parallelism — the load imbalance an executor actually sees
  (task-time telemetry isn't exposed in local mode, so the row-load proxy is
  recorded alongside wall time, which IS end-to-end truth here).

Zipf remap: rank k gets weight 1/k^1.2; each event draws its user via the
inverse CDF at u = md5(event_id)/2^128 — deterministic, rerun-stable, and
independent of the original (balanced) user assignment.  The hottest user
ends up with ~1-2% of ALL rows (vs ~1/U uniformly), the classic power-law
head.

Usage: python tools/skew_probe.py [query ...]
Writes .scaledata/skew10/events.parquet once (reuses if present); prints one
JSON line per query plus a summary — paste the table into PLANS.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UNIF10 = os.path.join(REPO, ".scaledata", "r11x10")
SKEW10 = os.path.join(REPO, ".scaledata", "skew10")
ZIPF_S = 1.2
BIG = 100_000_000  # event_id offset per replica (make_scale10 convention)

DEFAULT = [
    "funnel_view_click_purchase",
    "weekly_retention_cohorts",
    "ds_window_integral",
    "event_pairs_within_30min",
]


def build_skewed_events(spark) -> None:
    """10x events with zipf(1.2) user_ids: union of 10 event_id-shifted
    replicas of sf0.1, users redrawn via inverse-CDF(md5(event_id))."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    src = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    # same NOMINAL user universe as the uniform 10x replica (which shifts
    # users into 10 disjoint blocks): zipf over 10x the base cardinality —
    # the comparison then differs only in the DISTRIBUTION, not the id space
    n_users = 10 * src.select("user_id").distinct().count()
    ranks = np.arange(1, n_users + 1, dtype=np.float64)
    w = 1.0 / ranks**ZIPF_S
    cdf = np.cumsum(w) / w.sum()
    bc = spark.sparkContext.broadcast(cdf)

    def remap(batches):
        import hashlib

        c = bc.value
        for pdf in batches:
            u = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(str(int(e)).encode()).digest(), "big"
                    )
                    / 2.0**128
                    for e in pdf["event_id"]
                ),
                dtype=np.float64,
                count=len(pdf),
            )
            pdf = pdf.copy()
            # searchsorted returns the zipf RANK (0-based); rank 0 is the
            # hottest user.  +1 keeps ids positive and 1..n_users.
            pdf["user_id"] = (np.searchsorted(c, u) + 1).astype("int64")
            yield pdf

    parts = []
    for i in range(10):
        parts.append(src.withColumn("event_id", F.col("event_id") + F.lit(i * BIG)))
    ten = parts[0]
    for p in parts[1:]:
        ten = ten.unionByName(p)
    skewed = ten.mapInPandas(remap, schema=ten.schema)
    os.makedirs(SKEW10, exist_ok=True)
    skewed.write.mode("overwrite").parquet(os.path.join(SKEW10, "events.parquet"))


def straggler_ratio(spark, sf_dir: str) -> dict:
    """Rows in the hottest user_id shuffle partition vs the mean, at the
    session's shuffle parallelism, plus the top user's share of all rows."""
    import pyspark.sql.functions as F

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    total = ev.count()
    by_part = (
        ev.groupBy((F.xxhash64("user_id") % n_part).alias("p"))
        .count()
        .collect()
    )
    loads = [r["count"] for r in by_part]
    top_user = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).first()["count"]
    )
    return {
        "partition_max_over_mean": round(max(loads) / (total / n_part), 2),
        "top_user_share_pct": round(100.0 * top_user / total, 2),
    }


def run_query(spark, name, sf_dir, runs=1):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES

    fn = QUERIES[name].fn
    times = []
    plan = ""
    for i in range(runs + 1):  # first run is warm-up
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        if i:
            times.append(dt)
        # executedPlan AFTER execution = final adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
    return statistics.median(times), plan


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark(
        "skew_probe",
        master=f"local[{os.environ['SPARK_GRAFT_CPUS']}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(SKEW10, "events.parquet")):
        print("building skewed 10x events ...", file=sys.stderr)
        build_skewed_events(spark)

    if "--skip-layout" not in names:
        layout = {
            "uniform": straggler_ratio(spark, UNIF10),
            "zipf1.2": straggler_ratio(spark, SKEW10),
        }
        print(json.dumps({"layout": layout}), flush=True)
    names = [n for n in names if not n.startswith("--")]

    for name in names:
        print(f"running {name} ...", file=sys.stderr, flush=True)
        t_u, _ = run_query(spark, name, UNIF10)
        t_s, plan = run_query(spark, name, SKEW10)
        skew_markers = {
            "smj_skew_true": plan.count("skew=true"),
            "aqe_coalesced": plan.count("coalesced"),
            "aqe_shuffle_reads": plan.count("AQEShuffleRead"),
        }
        print(
            json.dumps(
                {
                    "query": name,
                    "uniform_sec": round(t_u, 2),
                    "zipf_sec": round(t_s, 2),
                    "ratio": round(t_s / t_u, 2),
                    "over_3x": t_s > 3 * t_u,
                    **skew_markers,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
