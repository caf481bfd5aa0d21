"""Dump .explain("formatted") for the r15 optimization evidence.

Usage:
  python tools/r15_plans.py before|after [query ...]

Writes plans/r15/<query>_<suffix>.txt at the repo root.  "before" disables
the r15 scan-parallelism floor (SPARK_GRAFT_SPREAD_MIN_BYTES huge) so the
pre-optimization plan is reproducible from the same tree; "after" uses the
shipped defaults.  Queries whose construction executes jobs (streaming rows,
$merge/$out materializations, iterative loops) still work — construction
cost is paid, the plan written is the returned DataFrame's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The default pick list: every query the r15 round claims a plan change or
# a material timing change for.
PICKS = [
    "multimodal_jpeg_decode",
    "multimodal_jpeg12_decode",
    "multimodal_jpeg_lossless_decode",
    "multimodal_png_decode",
    "multimodal_png_variants",
    "multimodal_gif_frames",
    "multimodal_mp3_headers",
    "multimodal_adpcm_decode",
    "multimodal_bmp_resize",
    "multimodal_wav_resample",
    "multimodal_media_decode",
    "multimodal_payload_features",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_exact_groups",
    "pricing_summary",
    "lineitem_measure_stats",
    "type_audit_events",
    "sql_revenue_by_nation",
    "vocab_encode_stats",
    "nb_lang_confusion",
    "text_repetition_metrics",
    "shipping_priority_top10",
    "ds_lookup_topn",
    "events_trailing_avg_1h",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or PICKS
    if suffix == "before":
        # gate the spread off: reproduces the pre-r15 plans from this tree
        os.environ["SPARK_GRAFT_SPREAD_MIN_BYTES"] = str(1 << 60)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark("r15-plans", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(root, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        q = QUERIES.get(name)
        if q is None:
            print(f"skip unknown {name}", file=sys.stderr)
            continue
        df = q.fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — {suffix} (sf_dir={sf})\n\n{plan}")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
