"""Property-based tests for $graphLookup: random value graphs (cycles,
self-loops, null endpoints, fan-out) traversed by BOTH the frontier loop
and the pointer-doubling closure, compared against a Python BFS reference
implementing Mongo's semantics — shallowest-depth per reached doc,
visited-set cycle termination, maxDepth as a hop bound on connectFromField
follows, empty array for no-reach docs, one output row per INPUT doc
(including exact duplicates — the r9 row-identity contract).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate
from conftest import fuzz_examples

# local docs: duplicate pair, a null start, a start outside the graph
LOCAL = [
    {"who": "p", "start": 0},
    {"who": "p", "start": 0},
    {"who": "q", "start": 3},
    {"who": "r", "start": None},
    {"who": "s", "start": 99},
]
LOCAL_SCHEMA = "who string, start long"


def _bfs(edges, start, max_depth):
    """Mongo $graphLookup reference: seed = startWith VALUE, each round
    joins frontier values to connectToField (nid), collects those docs at
    the current depth, follows connectFromField (nxt).  Returns
    {(nid, nxt): depth} with the SHALLOWEST depth per foreign doc."""
    by_to: dict = {}
    for nid, nxt in edges:
        by_to.setdefault(nid, []).append((nid, nxt))
    reached: dict = {}
    frontier = {start}
    visited = set(frontier)
    depth = 0
    while frontier and (max_depth is None or depth <= max_depth):
        hits = [doc for v in frontier for doc in by_to.get(v, [])]
        for doc in hits:
            if doc not in reached:
                reached[doc] = depth
        nxts = {nxt for _, nxt in hits}
        frontier = nxts - visited
        visited |= frontier
        depth += 1
    return reached


_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.one_of(st.none(), st.integers(min_value=0, max_value=7)),
    ),
    min_size=0,
    max_size=14,
    unique=True,
)

_MAXDEPTH = st.sampled_from([None, 0, 1, 2, 5])


@settings(
    max_examples=fuzz_examples(35),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_EDGES, _MAXDEPTH, st.sampled_from(["frontier", "doubling"]))
def test_graph_lookup_matches_bfs_reference(spark, edges, max_depth, method):
    local = spark.createDataFrame(
        [(d["who"], d["start"]) for d in LOCAL], LOCAL_SCHEMA
    )
    graph = spark.createDataFrame(edges or [(0, None)], "nid long, nxt long")
    if not edges:
        graph = graph.filter("nid < 0")  # truly empty graph
    spec = {
        "from": graph,
        "startWith": "$start",
        "connectFromField": "nxt",
        "connectToField": "nid",
        "as": "reach",
        "depthField": "d",
        "method": method,
    }
    if max_depth is not None:
        spec["maxDepth"] = max_depth
    rows = aggregate(local, [{"$graphLookup": spec}]).collect()
    assert len(rows) == len(LOCAL)  # duplicates never collapse
    got = sorted(
        (
            (r["who"], r["start"],
             tuple(sorted(((e["nid"], e["nxt"], e["d"]) for e in r["reach"]),
                          key=repr)))
            for r in rows
        ),
        key=repr,
    )
    want = []
    for d in LOCAL:
        reached = _bfs(edges, d["start"], max_depth)
        want.append(
            (d["who"], d["start"],
             tuple(sorted(((nid, nxt, dep) for (nid, nxt), dep in reached.items()),
                          key=repr)))
        )
    assert got == sorted(want, key=repr)
