"""Regenerate PLANS.md: formatted physical plans of the headline queries.

Usage: python tools/gen_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import io
import os

PICKS = [
    ("pricing_summary", "flagship aggregation: one scan, map-side partial agg, quantized exact sums"),
    ("shipping_priority_top10", "TPC-H Q3 shape: filtered dim broadcast, scan pushdown, TakeOrderedAndProject"),
    ("dedup_minhash_lsh", "MinHash LSH: persisted shingle/signature front-end, band-key candidate join"),
    ("span_dedup_documents", "span dedup: min(struct) winner hash-agg (no window sort), ordered reassembly"),
    ("ann_ivfpq_topk", "IVF-PQ ADC: broadcast codebooks + distance table, codes-only ranking"),
    ("events_asof_last_order", "as-of join: union-merge, one shuffle + one window, no nested loop"),
    ("semantic_dedup_embeddings", "SemDeDup: single scan, cells packed once, Arrow-batched numpy multiply — no pair join in the plan"),
    ("cms_token_counts", "count-min sketch: depth-bounded hash-agg grid, broadcast probe join"),
    ("ds_lookup_topn", "correlated $lookup + per-doc $sort/$limit: window and groupBy share ONE exchange, broadcast foreign side, limit prunes before arrays build"),
    ("multimodal_media_decode", "real BMP/WAV codec decode: Exchange-free — two chained Arrow-batched map stages over the scan, payloads never shuffle"),
    ("dedup_exact_substring", "ExactSubstr sliding-window dedup: shingles hash map-side, duplicate sites from one hash-agg, HOF-only rebuild, tokenize-once persisted base"),
    ("geo_radius_join_pairs", "grid-bucketed radius join: x9 cell fan-out map-side, equi-join on cell key, exact haversine filter — no cartesian"),
]

HEADER = """# PLANS — formatted physical plans of headline queries (sf0.01, local[8])

Regenerate: `python tools/gen_plans.py`.  These are the plans the engine is
DESIGNED to produce; the assertions in `tests/test_plans.py` pin the
load-bearing properties (pushdown, broadcast, TakeOrderedAndProject,
partial aggregation, absence of CartesianProduct) so regressions fail CI
rather than surfacing here.

"""


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark("plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = io.StringIO()
    out.write(HEADER)
    for name, note in PICKS:
        df = QUERIES[name].fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines = plan.splitlines()
        tree_end = next(
            (i for i, ln in enumerate(lines) if ln.strip() == ""), len(lines)
        )
        body = "\n".join(lines[: min(len(lines), tree_end + 40)])
        out.write(f"## {name}\n\n{note}\n\n```\n{body}\n```\n\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "PLANS.md")
    # Preserve hand-written analysis sections (checkpoint-modes, chunking,
    # window-stage notes, ...) below the marker across regenerations.
    marker = "<!-- MANUAL ANALYSIS BELOW - preserved by tools/gen_plans.py -->"
    manual = ""
    if os.path.exists(path):
        old = open(path).read()
        if marker in old:
            manual = old[old.index(marker):]
    with open(path, "w") as f:
        f.write(out.getvalue())
        if manual:
            f.write(manual)
    print("PLANS.md written")


if __name__ == "__main__":
    main()
