"""Mirror of the driver's correctness gate: run every catalog query on Spark
and its oracle SQL on DuckDB, compare row count + columns + order-insensitive
values (1e-8 relative tolerance on floats, per SURVEY.md §5)."""

from __future__ import annotations

import math

import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES


def _normalize(rows, columns):
    """Sort columns by name, keep raw values, sort rows by a stable string key."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(row[i] for i in order) for row in rows]
    out.sort(key=lambda r: tuple(_sort_key(v) for v in r))
    return out


def _sort_key(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        return f"{float(v):.6g}"  # coarse key: near-equal floats sort together
    return str(v)


def _values_match(a, b) -> bool:
    """Exact for non-floats; 1e-8 relative tolerance for floats (SURVEY.md §5)."""
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-8, abs_tol=1e-10)
    return _sort_key(a) == _sort_key(b)


def _rows_match(ra, rb) -> bool:
    return len(ra) == len(rb) and all(_values_match(a, b) for a, b in zip(ra, rb))


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
    mismatches = [(a, b) for a, b in zip(snorm, dnorm) if not _rows_match(a, b)]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
