"""Dress rehearsal of the external driver's CORRECTNESS pass (r11).

Runs EVERY query in __spark_entry__.queries() sequentially in ONE plain
SparkSession (no engine confs beyond what ensure_runtime_confs sets at
call time — exactly the driver's calling convention) and compares each
against its oracle_sql() twin in DuckDB under THE DRIVER'S OWN
canonicalization: toPandas(), columns sorted by name, pandas
``sort_values`` over the RAW cells (NOT per-cell str() — that masked the
r13 ``ds_minmax_topn`` crash, where list-typed cells are unhashable under
pandas' lexsort and the real driver errored while this tool was green),
then stringified row equality.  This is the strictest local mirror of the
driver's rows+schema+hash check, INCLUDING the cross-query session effects
(conf leakage, temp-view collisions, accumulated JVM state) that
per-query pytest sessions cannot see — and now including output-SHAPE
compatibility with the driver's pandas canonicalization.

The per-query pytest gates (tests/test_oracle_parity.py strict tier) stay
the CI signal; this tool is the pre-round end-to-end sanity pass:

    python tools/driver_rehearsal.py [sf_dir]

Exit code 0 = every window query green.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _canon(pdf):
    """The driver's canonicalization, verbatim in shape: sort columns by
    name, pandas ``sort_values`` over the RAW cells — list/ndarray cells
    are unhashable under pandas' lexsort, so an array-typed output column
    raises here exactly as it does in the real driver (the r13
    ``ds_minmax_topn`` red row; the old per-cell str() canonicalization
    masked it) — then stringify rows for comparison."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols).reset_index(drop=True)
    rows = [
        tuple(str(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return cols, rows


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    failures: list[tuple] = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf)
            cols, got = _canon(df.toPandas())
            if name not in osql:
                print(f"{name:40s} rows-only  rows={len(got)}", flush=True)
                continue
            wcols, want = _canon(con.sql(osql[name]).df())
            ok = cols == wcols and got == want
            print(
                f"{name:40s} {'OK' if ok else 'FAIL'}  rows={len(got)}",
                flush=True,
            )
            if not ok:
                failures.append(
                    (name, cols == wcols, len(got), len(want), got[:1], want[:1])
                )
        except Exception as exc:  # keep rehearsing; report at the end
            print(f"{name:40s} ERROR {str(exc)[:120]}", flush=True)
            failures.append((name, "error", str(exc)[:300]))
    print(f"\nchecked {len(qs)} window queries; failures: {len(failures)}")
    for f in failures:
        print(" ", f)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
