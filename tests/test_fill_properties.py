"""Property tests for the $fill compiler (docstore/pipeline.py::_apply_fill):
random output specs — locf / linear / constant-or-expression value, one or
two target fields, partitioned or global — against a Python reference over a
corpus exercising every interpolation seam: leading/trailing nulls, an
all-null group, a single-row group, consecutive null runs, and duplicate
non-null neighbors (next_k == prev_k guard).

Semantics pinned (the _apply_fill docstring's contract):
- locf: last non-null at-or-before the row in sortBy order, per partition;
  leading nulls stay null.
- linear: interpolate between the SURROUNDING non-nulls positioned by the
  sortBy VALUE (not row index); leading/trailing nulls stay null; equal
  surrounding positions degenerate to the previous value.
- value: fill with a compiled expression (constants included); non-null
  rows never change under any method.
- fields fill independently (a later output field never reads an earlier
  field's filled values unless it names that column itself).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate
from conftest import fuzz_examples

# (g, k, x, y): group A normal holes; B all-null x; C single row; D leading
# + trailing nulls and a consecutive null run; duplicate values (not keys)
ROWS = [
    ("A", 1.0, 10.0, None),
    ("A", 2.0, None, 1.0),
    ("A", 4.0, None, None),
    ("A", 7.0, 40.0, 2.0),
    ("A", 9.0, None, None),
    ("A", 10.0, 50.0, 3.0),
    ("B", 1.0, None, 0.5),
    ("B", 2.0, None, None),
    ("B", 3.0, None, 0.25),
    ("C", 5.0, None, 9.0),
    ("D", 0.0, None, None),
    ("D", 1.0, 7.0, 1.0),
    ("D", 2.0, None, 1.5),
    ("D", 3.0, 7.0, None),
    ("D", 6.0, None, None),
    ("D", 8.0, None, 2.0),
]
SCHEMA = "g string, k double, x double, y double"


def _ref_fill(rows, field_idx, how):
    """Reference fill over (k-sorted-within-group) rows; returns new column
    values aligned to the input order."""
    by_g: dict = {}
    for i, r in enumerate(rows):
        by_g.setdefault(r[0], []).append(i)
    out = [r[field_idx] for r in rows]
    for g, idxs in by_g.items():
        idxs = sorted(idxs, key=lambda i: rows[i][1])
        vals = [rows[i][field_idx] for i in idxs]
        ks = [rows[i][1] for i in idxs]
        if "value" in how:
            filled = [v if v is not None else how["__const"] for v in vals]
        elif how["method"] == "locf":
            filled, last = [], None
            for v in vals:
                last = v if v is not None else last
                filled.append(v if v is not None else last)
        else:  # linear
            filled = []
            for j, v in enumerate(vals):
                if v is not None:
                    filled.append(v)
                    continue
                prev = next_ = None
                for jj in range(j - 1, -1, -1):
                    if vals[jj] is not None:
                        prev = jj
                        break
                for jj in range(j + 1, len(vals)):
                    if vals[jj] is not None:
                        next_ = jj
                        break
                if prev is None or next_ is None:
                    filled.append(None)
                elif ks[next_] == ks[prev]:
                    filled.append(vals[prev])
                else:
                    filled.append(
                        vals[prev]
                        + (vals[next_] - vals[prev])
                        * (ks[j] - ks[prev])
                        / (ks[next_] - ks[prev])
                    )
        for i, v in zip(idxs, filled):
            out[i] = v
    return out


def _run(spark, output):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = aggregate(
        df,
        [{"$fill": {"partitionBy": "$g", "sortBy": {"k": 1}, "output": output}}],
    ).collect()
    return {(r["g"], r["k"]): r for r in got}


def _assert_matches(spark, output, ref_specs):
    got = _run(spark, output)
    assert len(got) == len(ROWS)
    for field, idx, how in ref_specs:
        want = _ref_fill(ROWS, idx, how)
        for row, w in zip(ROWS, want):
            g = got[(row[0], row[1])][field]
            if w is None:
                assert g is None, (field, row, g)
            else:
                assert g is not None and math.isclose(
                    g, w, rel_tol=1e-12, abs_tol=1e-12
                ), (field, row, g, w)


_HOW = st.sampled_from([
    {"method": "locf"},
    {"method": "linear"},
    {"value": -1.5, "__const": -1.5},
    # value is an EXPRESSION in Mongo: $add folds to 3.0
    {"value": {"$add": [1.0, 2.0]}, "__const": 3.0},
])


@settings(
    max_examples=fuzz_examples(40),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_HOW, _HOW)
def test_fill_matches_reference(spark, how_x, how_y):
    def clean(h):
        return {k: v for k, v in h.items() if k != "__const"}

    _assert_matches(
        spark,
        {"x": clean(how_x), "y": clean(how_y)},
        [("x", 2, how_x), ("y", 3, how_y)],
    )


def test_fill_locf_global_no_partition(spark):
    """sortBy without partitionBy: one global ordering (single partition —
    the mongod-fidelity small-data shape)."""
    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5.0), (3.0, None), (4.0, None)], "k double, x double"
    )
    got = aggregate(
        df, [{"$fill": {"sortBy": {"k": 1}, "output": {"x": {"method": "locf"}}}}]
    ).collect()
    assert {r["k"]: r["x"] for r in got} == {1.0: None, 2.0: 5.0, 3.0: 5.0, 4.0: 5.0}


def test_fill_linear_requires_single_ascending_sort(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="exactly one sortBy"):
        aggregate(df, [{"$fill": {
            "partitionBy": "$g", "sortBy": {"k": 1, "x": 1},
            "output": {"x": {"method": "linear"}}}}])
    with pytest.raises(ValueError, match="ascending"):
        aggregate(df, [{"$fill": {
            "partitionBy": "$g", "sortBy": {"k": -1},
            "output": {"x": {"method": "linear"}}}}])


def test_fill_locf_requires_sort(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="locf requires sortBy"):
        aggregate(df, [{"$fill": {"partitionBy": "$g",
                                  "output": {"x": {"method": "locf"}}}}])


def test_fill_scalar_output_spec_raises_clearly(spark):
    """{'x': 'locf'} (scalar instead of {'method': 'locf'}) must raise a
    direct type error, not iterate the string's characters into a confusing
    unknown-option list (ADVICE r10)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="must be a document"):
        aggregate(df, [{"$fill": {"partitionBy": "$g", "sortBy": {"k": 1},
                                  "output": {"x": "locf"}}}])


def test_fill_unknown_method_raises(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="unsupported \\$fill output"):
        aggregate(df, [{"$fill": {"partitionBy": "$g", "sortBy": {"k": 1},
                                  "output": {"x": {"method": "spline"}}}}])
