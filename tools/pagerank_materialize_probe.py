"""PageRank edge-materialization crossover probe (VERDICT r10 ask #6).

PLANS.md's r10 plan audit noted the unrolled pagerank re-executes its edge
DERIVATION (lineitem⋈orders at 240k rows for the catalog query) once per
iteration, and claimed that at real scale checkpointing the edge set up
front turns 3 re-derivations into 3 id-keyed shuffles.  This probe measures
that claim instead of asserting it: the catalog query's exact edge pipeline
at 1x (driver sf0.1) and 10x (key-shifted lineitem/orders replicas, the
make_scale10 scheme), each run both ways —

- default:            pagerank(edges)                      (collapsed plan,
                      derivation re-executed per iteration)
- pre_materialized:   pagerank(edges, pre_materialized=True,
                      checkpoint_mode="local")             (edge set
                      localCheckpointed once, iterations shuffle ids only)

Median of 3 runs after 1 warm-up per (scale, mode).  Values are asserted
identical across modes at each scale before timing (the trajectory oracle
must hold).  Results land in PLANS.md "pagerank-edge-materialization".

Usage: SPARK_GRAFT_CPUS=32 python tools/pagerank_materialize_probe.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BIG = 100_000_000  # make_scale10's int64 key offset per replica


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import pyspark.sql.functions as F

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.graph import pagerank
    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark(
        "pagerank_materialize_probe",
        master=f"local[{os.environ['SPARK_GRAFT_CPUS']}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = "/root/testdata/sf0.1"
    ten = os.path.join(REPO, ".scaledata", "pr10")
    if not os.path.exists(os.path.join(ten, "orders.parquet")):
        os.makedirs(ten, exist_ok=True)
        for table, keys in (
            ("lineitem", ("l_orderkey", "l_suppkey")),
            ("orders", ("o_orderkey", "o_custkey")),
        ):
            df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
            parts = []
            for i in range(10):
                rep = df
                for k in keys:
                    rep = rep.withColumn(k, F.col(k) + F.lit(i * BIG))
                parts.append(rep)
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            u.repartition(32).write.mode("overwrite").parquet(
                os.path.join(ten, f"{table}.parquet")
            )

    def edges_for(d: str):
        """The catalog query's exact edge derivation (supplier→customer
        shipments via lineitem⋈orders)."""
        li = spark.read.parquet(os.path.join(d, "lineitem.parquet")).select(
            "l_orderkey", "l_suppkey"
        )
        o = spark.read.parquet(os.path.join(d, "orders.parquet")).select(
            "o_orderkey", "o_custkey"
        )
        return li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
            (F.lit(1000000) + F.col("l_suppkey")).alias("src"),
            F.col("o_custkey").alias("dst"),
        )

    results: dict[str, dict] = {}
    for tag, d in (("1x", src), ("10x", ten)):
        row: dict = {
            "edge_rows": edges_for(d).count(),
        }

        def run(pre: bool) -> "DataFrame":  # noqa: F821 - doc only
            return pagerank(
                edges_for(d),
                "src",
                "dst",
                iters=3,
                damping=0.85,
                pre_materialized=pre,
                checkpoint_mode="local",
            )

        # value identity across modes before timing anything
        base = {r["id"]: r["pr"] for r in run(False).collect()}
        mat = {r["id"]: r["pr"] for r in run(True).collect()}
        assert mat == base, f"{tag}: pre_materialized changed values"
        row["nodes"] = len(base)
        spark.catalog.clearCache()

        for mode, pre in (("default", False), ("pre_materialized", True)):
            samples = []
            for i in range(4):  # 1 warm-up + 3 timed
                t0 = time.perf_counter()
                run(pre).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if i:
                    samples.append(round(dt, 3))
                spark.catalog.clearCache()
            row[mode] = {
                "median_sec": round(statistics.median(samples), 3),
                "samples": samples,
            }
        row["speedup"] = round(
            row["default"]["median_sec"] / row["pre_materialized"]["median_sec"], 2
        )
        results[tag] = row
        print(f"{tag}: {json.dumps(row)}", flush=True)

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
