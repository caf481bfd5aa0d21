"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line (strict JSON, headline fields first so a tail-capture of
the output always retains the totals):

  {"metric": "catalog_total_runtime", "value": N, "unit": "sec", "sf": ...,
   "n": runs, "r2_subset_total": N, "queries": {<driver-visible only>}}

Protocol notes (round-over-round comparability — see VERDICT r3 ask #1):
- the inline ``queries`` map is capped to DRIVER-VISIBLE queries at 2-decimal
  precision so the whole line stays under the driver's 2000-char tail capture;
  the full catalog detail (every query, 4-decimal medians, all samples) goes to
  ``BENCH_DETAIL.json`` next to this script;
- ``r2_subset_total`` is the sum of medians over the FIXED round-2 query set
  (the 59 names benched in BENCH_r02), giving a directly comparable
  cross-round number immune to catalog growth;
- each query first runs SPARK_GRAFT_BENCH_WARMUP discarded warm-up
  executions (default 1 — JIT/codegen/Arrow-init cold-start skew was one
  outlier from flipping an iterative-tier median, VERDICT r4 finding #3),
  then SPARK_GRAFT_BENCH_RUNS timed runs (default 3) back-to-back and
  reports the median of the TIMED runs only; the discarded warm-up samples
  are still recorded in BENCH_DETAIL.json under ``warmup_samples``;
- execution is forced through the noop sink (format("noop")), which computes
  every output column — ``count()`` lets Catalyst prune projection-only work
  (e.g. a fingerprint column) and under-measures;
- "value" is the sum of per-query medians over the whole catalog: the
  steady-state cost of one full catalog pass.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

# The exact query set benched in round 2 (BENCH_r02.json) — frozen so
# `r2_subset_total` is comparable across every future round regardless of how
# the catalog grows or which queries are driver-visible.
R2_SUBSET = (
    "clean_enum_part_types type_audit_events profile_orders "
    "ds_find_machinery_customers ds_top_clickers ds_value_stats_by_type "
    "ds_unwind_token_counts ds_cond_price_buckets ds_regex_find ds_elem_match "
    "ds_sort_skip_limit ds_compound_group_key upsert_supplier_acctbal "
    "extreme_value_events lineitem_measure_stats multimodal_payload_features "
    "multimodal_frame_index streaming_hourly_rollup sessionize_events "
    "pricing_summary top_event_types find_building_customers orders_in_range "
    "nations_in_set events_with_large_k project_rename "
    "avg_balance_by_nation_segment avg_of_avgs_by_nation global_order_stats "
    "statuses_per_priority distinct_customers_with_orders "
    "top_order_per_priority top_tokens customers_per_region "
    "orders_of_top_customers orders_by_dayofweek order_age_days "
    "hourly_event_rollup nest_unnest_roundtrip cube_order_counts "
    "rollup_customer_counts pivot_segment_counts value_percentiles "
    "approx_distinct_users sql_revenue_by_nation nation_order_ranking "
    "text_token_stats text_quality_by_source lang_id_confusion "
    "dedup_exact_groups dedup_ngram_jaccard dedup_minhash_lsh dedup_simhash "
    "dedup_embedding_cosine ann_bruteforce_topk ann_lsh_topk ann_ivf_topk "
    "doc_fingerprints winnowing_fingerprints"
).split()

# Keep the emitted line comfortably under the driver's 2000-char tail capture.
MAX_LINE = 1900


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES, driver_catalog
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        # No console progress bars: the driver tail-captures combined output
        # and a late progress repaint could push the JSON line out of view.
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    timings: dict[str, float | None] = {}
    all_samples: dict[str, list[float]] = {}
    # Warm the JVM + parquet footers once (excluded from per-query timings).
    try:
        QUERIES["pricing_summary"].fn(spark, sf_dir).count()
    except Exception as exc:
        print(f"bench: warm-up failed: {exc}", file=sys.stderr)

    warm_samples: dict[str, list[float]] = {}
    for name, q in QUERIES.items():
        samples: list[float] = []
        warms: list[float] = []
        try:
            for i in range(warmup + runs):
                t0 = time.perf_counter()
                df = q.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                # first `warmup` executions are discarded cold-start runs
                (warms if i < warmup else samples).append(dt)
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
        all_samples[name] = [round(s, 4) for s in samples]
        warm_samples[name] = [round(s, 4) for s in warms]
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(t for t in timings.values() if t is not None), 4)
    r2_subset_total = round(
        sum(timings.get(n) or 0.0 for n in R2_SUBSET if timings.get(n) is not None), 4
    )
    visible = set(driver_catalog())

    detail = {
        "metric": "catalog_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n": runs,
        "cpus": int(cpus),
        "r2_subset_total": r2_subset_total,
        "r2_subset_missing": [n for n in R2_SUBSET if timings.get(n) is None],
        "warmup": warmup,
        "queries": timings,
        "samples": all_samples,
        "warmup_samples": warm_samples,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=False)
    except OSError as exc:
        print(f"bench: could not write {detail_path}: {exc}", file=sys.stderr)

    # Inline map: driver-visible queries only, 2-decimal, slowest-first so a
    # truncated tail still shows the queries that matter; trim from the fast
    # end if the line would exceed the driver's capture window.
    inline = {
        k: (round(v, 2) if v is not None else None)
        for k, v in sorted(
            ((k, v) for k, v in timings.items() if k in visible),
            key=lambda kv: -(kv[1] or 0.0),
        )
    }

    def line_for(qmap: dict[str, float | None]) -> str:
        return json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n": runs,
                "r2_subset_total": r2_subset_total,
                "queries": qmap,
            },
            separators=(",", ":"),
        )

    out = line_for(inline)
    while len(out) > MAX_LINE and inline:
        inline.pop(next(reversed(inline)))  # drop the fastest remaining query
        out = line_for(inline)

    spark.stop()
    # Printed LAST, after spark.stop(), so no late executor/shutdown chatter
    # can land between the JSON line and EOF in a combined-stream capture.
    print(out, flush=True)


if __name__ == "__main__":
    main()
