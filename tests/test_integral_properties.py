"""Property tests for the $integral/$derivative window compiler — pinning
the r12 prefix-sum rewrite (docstore/pipeline.py, linear) against an
independent Python reference that evaluates the ORIGINAL fold semantics
(trapezoid terms over the frame, quantized to the 1e-6 grid, exact integer
accumulation, null inputs poisoning the frame).

Random series (duplicate sort keys excluded — frame membership under ties
is engine-arbitrary in BOTH the old fold and the rewrite), random null
placement, and every frame shape the compiler accepts: the default
whole-partition frame, the running ["unbounded","current"] frame, and
bounded sliding documents frames whose first row sits mid-partition (the
term-exclusion path a running frame never exercises).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate
from conftest import fuzz_examples


def _reference_integral(rows, lo, hi):
    """rows = [(t, v)] in sort order for ONE partition; frame = documents
    [lo, hi] offsets (None = unbounded).  Returns the fold semantics:
    quantized trapezoid terms between CONSECUTIVE frame members, summed
    exactly; any null term inside the frame (past its first row) → None;
    empty/single-row frame → 0.0."""
    n = len(rows)
    out = []
    for i in range(n):
        a = 0 if lo is None else max(0, i + lo)
        b = n - 1 if hi is None else min(n - 1, i + hi)
        if b < a:
            out.append(0.0)
            continue
        acc = 0
        poisoned = False
        for k in range(a + 1, b + 1):
            t1, v1 = rows[k - 1]
            t2, v2 = rows[k]
            if None in (t1, v1, t2, v2):
                poisoned = True
                break
            term = (t2 - t1) * (v2 + v1) / 2.0
            acc += math.floor(term * 1e6 + 0.5)
        out.append(None if poisoned else acc / 1e6)
    return out


_SERIES = st.lists(
    st.tuples(
        st.floats(min_value=-100, max_value=100, allow_nan=False) | st.none(),
    ),
    min_size=1,
    max_size=24,
).map(lambda vs: [v[0] for v in vs])

_FRAME = st.sampled_from([
    (None, None),   # whole partition (Mongo default)
    (None, 0),      # running
    (-1, 0), (-2, 0), (-1, 1), (-3, 2), (0, 2),
])


@settings(
    max_examples=fuzz_examples(40),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_SERIES, _SERIES, _FRAME)
def test_integral_matches_fold_reference(spark, vals_a, vals_b, frame):
    lo, hi = frame
    rows = []
    series = {}
    for g, vals in (("a", vals_a), ("b", vals_b)):
        # distinct integer sort keys (ties excluded: frame membership under
        # ties is engine-arbitrary either way); spacing varies so terms do
        ts = [float(3 * i + (i % 2)) for i in range(len(vals))]
        series[g] = list(zip(ts, vals))
        rows += [(g, t, v) for t, v in series[g]]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    out_spec = {"$integral": {"input": "$v"}}
    if (lo, hi) != (None, None):
        out_spec = {**out_spec, "window": {"documents": [
            "unbounded" if lo is None else lo,
            "current" if hi == 0 else hi,
        ]}}
    got_df = aggregate(df, [{"$setWindowFields": {
        "partitionBy": "$g", "sortBy": {"t": 1},
        "output": {"area": out_spec},
    }}])
    got = {(r["g"], r["t"]): r["area"] for r in got_df.collect()}
    for g, srs in series.items():
        expect = _reference_integral(srs, lo, hi)
        for (t, _v), e in zip(srs, expect):
            a = got[(g, t)]
            if e is None:
                assert a is None, (g, t, a, e, frame)
            else:
                assert a is not None and abs(a - e) < 1e-9, (g, t, a, e, frame)
