"""Property tests for the strict-order funnel (operators/events.py::
funnel_stages): random event sets — timestamp ties, repeated stages,
out-of-order arrivals, users skipping stages — against a greedy Python
reference.

The operator anchors each stage at the user's EARLIEST qualifying event
strictly after the previous anchor.  Greedy earliest-anchoring decides
"exists a strictly increasing stage chain" exactly (taking the earliest
feasible anchor can only enlarge the feasible set downstream), so the
reference replays the same greedy walk; equal timestamps never chain
(strict >), and later stages can never count more users than earlier ones
(monotone funnel property, asserted on every example).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import funnel_stages
from conftest import fuzz_examples

STAGES = ["view", "click", "buy"]

_EVENT = st.tuples(
    st.integers(min_value=1, max_value=5),           # user
    st.integers(min_value=0, max_value=9),           # ts (collisions likely)
    st.sampled_from(STAGES + ["noise"]),             # type
)


def _ref_counts(events):
    counts = []
    per_user: dict = {}
    for u, ts, ty in events:
        per_user.setdefault(u, []).append((ts, ty))
    anchors = {u: None for u in per_user}
    alive = set(per_user)
    for stage in STAGES:
        survivors = set()
        for u in alive:
            prev = anchors[u]
            qual = [
                ts for ts, ty in per_user[u]
                if ty == stage and (prev is None or ts > prev)
            ]
            if qual:
                anchors[u] = min(qual)
                survivors.add(u)
        alive = survivors
        counts.append(len(alive))
    return counts


@settings(
    max_examples=fuzz_examples(40),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_EVENT, min_size=0, max_size=40))
def test_funnel_matches_greedy_reference(spark, events):
    df = spark.createDataFrame(
        [(u, int(ts), ty) for u, ts, ty in events] or [(0, 0, "noise")],
        "user_id long, t long, event_type string",
    )
    rows = funnel_stages(df, "user_id", "t", "event_type", STAGES).collect()
    got = {r["stage"]: r["n_users"] for r in rows}
    want = _ref_counts(events if events else [])
    assert [got[i + 1] for i in range(len(STAGES))] == want, events
    assert [r["stage_name"] for r in sorted(rows, key=lambda r: r["stage"])] == STAGES
    # monotone funnel: each stage's population is a subset of the previous
    assert want[0] >= want[1] >= want[2]


def test_funnel_equal_timestamps_never_chain(spark):
    """view and click at the SAME instant do not form a chain (strict >)."""
    df = spark.createDataFrame(
        [(1, 5, "view"), (1, 5, "click"),        # tie: no chain
         (2, 5, "view"), (2, 6, "click")],       # strictly after: chains
        "user_id long, t long, event_type string",
    )
    rows = {r["stage_name"]: r["n_users"]
            for r in funnel_stages(df, "user_id", "t", "event_type",
                                   ["view", "click"]).collect()}
    assert rows == {"view": 2, "click": 1}


def test_funnel_greedy_anchor_is_existence_exact(spark):
    """The adversarial shape for naive min-anchoring variants: the earliest
    click precedes the earliest view, but a later click still chains —
    greedy must pick the post-view click, not give up."""
    df = spark.createDataFrame(
        [(1, 1, "click"), (1, 2, "view"), (1, 3, "click")],
        "user_id long, t long, event_type string",
    )
    rows = {r["stage_name"]: r["n_users"]
            for r in funnel_stages(df, "user_id", "t", "event_type",
                                   ["view", "click"]).collect()}
    assert rows == {"view": 1, "click": 1}
