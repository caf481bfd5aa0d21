"""Property tests for the numeric $densify path (docstore/pipeline.py::
_apply_densify): random step / bounds-mode / partition combinations against
a Python spine reference over a corpus with on-grid collisions, off-grid
maxima, negative values, and a singleton partition.

Semantics pinned (Mongo $densify, numeric range):
- spine steps from the extent minimum by `step`; grid points colliding
  with an OBSERVED (partition, value) never duplicate (the observed doc
  passes through, the spine doc drops);
- bounds "partition": per-partition [min, max] extent; bounds "full":
  the GLOBAL extent replayed into every partition; explicit [lo, hi):
  literal extent with EXCLUSIVE upper bound, generated even for grid
  points no partition observes, while out-of-range observed docs still
  pass through untouched;
- added docs carry the partition fields + the densified field, all other
  columns null.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate
from conftest import fuzz_examples

# (p, v, tag): on-grid collision candidates, off-grid max in A (7),
# negative min in B, singleton partition C
ROWS = [
    ("A", 0, "a0"),
    ("A", 2, "a2"),
    ("A", 3, "a3"),
    ("A", 7, "a7"),
    ("B", -4, "b-4"),
    ("B", 0, "b0"),
    ("B", 5, "b5"),
    ("C", 10, "c10"),
]
SCHEMA = "p string, v long, tag string"


def _spine(lo, hi_inclusive, step):
    out, x = [], lo
    while x <= hi_inclusive:
        out.append(x)
        x += step
    return out


def _ref(rows, step, bounds, parts):
    """Expected (p, v, tag) multiset after densify."""
    out = [tuple(r) for r in rows]
    groups: dict = {}
    for p, v, _ in rows:
        groups.setdefault(p if parts else None, set()).add(v)
    if bounds == "partition":
        extents = {g: (min(vs), max(vs)) for g, vs in groups.items()}
        spines = {g: _spine(lo, hi, step) for g, (lo, hi) in extents.items()}
    elif bounds == "full":
        all_vs = [v for _, v, _ in rows]
        glob = _spine(min(all_vs), max(all_vs), step)
        spines = {g: list(glob) for g in groups}
    else:  # explicit [lo, hi)
        lo, hi = bounds
        pts = [x for x in _spine(lo, hi, step) if x < hi]
        spines = {g: list(pts) for g in groups}
    for g, pts in spines.items():
        seen = groups[g]
        for x in pts:
            if x not in seen:
                out.append((g, x, None))  # g is None in unpartitioned mode
    return sorted(out, key=repr)


def _got(spark, step, bounds, parts):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rng: dict = {"step": step, "bounds": bounds}
    if parts:
        rng["partitionByFields"] = ["p"]
    res = aggregate(df, [{"$densify": {"field": "v", "range": rng}}]).collect()
    # observed rows pass through with their real p even unpartitioned; only
    # spine-added docs carry null non-densified columns
    return sorted(((r["p"], r["v"], r["tag"]) for r in res), key=repr), res


@settings(
    max_examples=fuzz_examples(30),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.sampled_from([1, 2, 3, 5]),
    st.sampled_from(["partition", "full", (-2, 9), (0, 4), (11, 15)]),
)
def test_densify_matches_reference(spark, step, bounds):
    parts = True  # partitionByFields on all modes (required for "partition")
    b = list(bounds) if isinstance(bounds, tuple) else bounds
    got, raw = _got(spark, step, b, parts)
    want = _ref(ROWS, step, bounds, parts)
    got = sorted(got, key=repr)
    assert got == want, (step, bounds)
    # added docs: every non-partition, non-densified column is null
    for r in raw:
        if r["tag"] is None:
            assert r["v"] is not None and r["p"] is not None


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.sampled_from([1, 2, 4]), st.sampled_from(["full", (-3, 12)]))
def test_densify_unpartitioned_matches_reference(spark, step, bounds):
    b = list(bounds) if isinstance(bounds, tuple) else bounds
    got, _ = _got(spark, step, b, parts=False)
    want = _ref(ROWS, step, bounds, parts=False)
    assert sorted(got, key=repr) == want, (step, bounds)


def test_densify_partition_bounds_require_parts(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="partitionByFields"):
        aggregate(df, [{"$densify": {"field": "v",
                                     "range": {"step": 1, "bounds": "partition"}}}])


def test_densify_top_level_partition_by_fields(spark):
    """Mongo's documented $densify shape puts partitionByFields at the TOP
    level as a sibling of field/range (ADVICE r10); it must behave exactly
    like the legacy range-level placement."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    legacy = aggregate(
        df,
        [{"$densify": {"field": "v",
                       "range": {"step": 2, "bounds": "partition",
                                 "partitionByFields": ["p"]}}}],
    ).collect()
    mongo = aggregate(
        df,
        [{"$densify": {"field": "v", "partitionByFields": ["p"],
                       "range": {"step": 2, "bounds": "partition"}}}],
    ).collect()
    key = lambda r: (repr(r["p"]), repr(r["v"]), repr(r["tag"]))
    assert sorted(mongo, key=key) == sorted(legacy, key=key)


def test_densify_both_partition_placements_rejected(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="both at top level and inside"):
        aggregate(
            df,
            [{"$densify": {"field": "v", "partitionByFields": ["p"],
                           "range": {"step": 1, "bounds": "full",
                                     "partitionByFields": ["p"]}}}],
        )


def test_densify_explicit_bounds_on_empty_input_still_generates(spark):
    """mongod generates the full [lo, hi) spine even over an empty
    collection — the extent must not be seeded from input rows."""
    df = spark.createDataFrame([], SCHEMA)
    out = aggregate(
        df,
        [{"$densify": {"field": "v", "range": {"step": 2, "bounds": [0, 7]}}}],
    ).collect()
    assert sorted(r["v"] for r in out) == [0, 2, 4, 6]
    assert all(r["p"] is None and r["tag"] is None for r in out)
