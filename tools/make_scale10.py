"""Build a 10x scale-up of the driver-provided sf0.1 tables for the
scaling-evidence pass (VERDICT r7 ask #5) — NOT query input: catalog
queries and oracles always run on the driver's own /root/testdata sets;
this derived copy exists purely to measure time(10x)/time(1x) ratios.

Scheme: each table is the union of 10 key-shifted replicas of sf0.1 —
int64 keys offset by replica*100_000_000, int32 dimension keys by
replica*1_000 — so referential integrity holds WITHIN each replica and
every join fans out exactly as a 10x corpus would.  Document text gets a
replica prefix token ("r3 ...") so the dedup families see a 10x corpus of
DISTINCT documents rather than 10 exact copies of each (exact-copy
replication would quadratically inflate duplicate-pair output and measure
a different workload, not scale).  `n_chars` tracks the prefix so derived
stats stay consistent.

Usage: python tools/make_scale10.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> <repo>/.scaledata/sf1
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

BIG = 100_000_000  # int64 key offset per replica
SMALL = 1_000  # int32 dimension-key offset per replica

KEYS = {
    "customer": {"c_custkey": BIG, "c_nationkey": SMALL},
    "nation": {"n_nationkey": SMALL, "n_regionkey": SMALL},
    "region": {"r_regionkey": SMALL},
    "supplier": {"s_suppkey": BIG, "s_nationkey": SMALL},
    "part": {"p_partkey": BIG},
    "orders": {"o_orderkey": BIG, "o_custkey": BIG},
    "lineitem": {"l_orderkey": BIG, "l_partkey": BIG, "l_suppkey": BIG},
    "events": {"event_id": BIG, "user_id": BIG},
    "documents": {"doc_id": BIG},
    "embeddings": {"vec_id": BIG},
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".scaledata", "sf1")
    os.makedirs(dst, exist_ok=True)

    from data_wrangling_with_openstreetmap_and_mongodb_spark.session import get_spark

    spark = get_spark("scale10", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    for table, keycols in KEYS.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        parts = []
        for i in range(10):
            rep = df
            for col, off in keycols.items():
                dt = dict(df.dtypes)[col]
                rep = rep.withColumn(col, (F.col(col) + F.lit(i * off)).cast(dt))
            if table == "documents" and i > 0:
                prefix = f"r{i} "
                rep = rep.withColumn(
                    "text", F.concat(F.lit(prefix), F.col("text"))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(len(prefix)))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        n = out.repartition(8).write.mode("overwrite")
        n.parquet(os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: {df.count()} -> {spark.read.parquet(os.path.join(dst, f'{table}.parquet')).count()}")
    spark.stop()


if __name__ == "__main__":
    main()
