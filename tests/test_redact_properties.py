"""Property tests for the $redact compiler (docstore/pipeline.py::
_apply_redact): random per-level action mappings (level-tag →
$$KEEP/$$PRUNE/$$DESCEND, compiled into nested $cond chains) against a
recursive Python reference over documents with two struct depths, an
array-of-structs field, and null tags/subdocuments.

Semantics pinned (mongod's $redact contract, the _apply_redact docstring):
- the expression re-evaluates at EVERY level with field refs resolving
  RELATIVE to that level;
- root: PRUNE drops the row, KEEP short-circuits every nested rewrite,
  DESCEND recurses;
- struct field: KEEP = subtree as-is, PRUNE = null struct (typed-column
  "missing"), DESCEND = keep scalars + recurse into embedded structs;
- array<struct> field: PRUNE'd elements are REMOVED (array shrinks, never
  null-padded), survivors KEEP/DESCEND as structs do; a null array stays
  null, a null subdocument stays null (no decision applies).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate
from conftest import fuzz_examples

SCHEMA = (
    "rid long, level string, n long, "
    "sub struct<level: string, v: long, inner: struct<level: string, v: long>>, "
    "items array<struct<level: string, v: long>>"
)

ROWS = [
    (1, "a", 10, ("b", 1, ("c", 11)), [("a", 1), ("b", 2), ("c", 3)]),
    (2, "b", 20, ("a", 2, (None, 22)), [("b", 4)]),
    (3, "c", 30, (None, 3, ("a", 33)), []),
    (4, None, 40, ("c", 4, None), [(None, 5), ("a", 6)]),
    (5, "a", 50, None, None),
    (6, "b", 60, ("b", 6, ("b", 66)), [("c", 7), (None, 8)]),
]

ACTIONS = ["KEEP", "PRUNE", "DESCEND"]


def _spec(mapping, default):
    """{level-tag: action} → nested $cond chain over $level (relative ref)."""
    out = f"$${default}"
    for tag, action in sorted(mapping.items()):
        out = {"$cond": [{"$eq": ["$level", tag]}, f"$${action}", out]}
    return out


def _act(level, mapping, default):
    # $eq is total, but mapping keys are non-null strings, so a null level
    # always falls through to the default arm
    return mapping.get(level, default) if level is not None else default


def _ref_row(row, mapping, default):
    rid, level, n, sub, items = row
    a = _act(level, mapping, default)
    if a == "PRUNE":
        return None
    if a == "KEEP":
        return row
    # DESCEND: scalars stay; sub/items get their own decisions
    if sub is not None:
        sa = _act(sub[0], mapping, default)
        if sa == "PRUNE":
            sub = None
        elif sa == "DESCEND":
            inner = sub[2]
            if inner is not None:
                ia = _act(inner[0], mapping, default)
                if ia == "PRUNE":
                    inner = None
                # KEEP/DESCEND: no deeper structs -> unchanged
            sub = (sub[0], sub[1], inner)
        # KEEP: unchanged, inner NOT re-examined
    if items is not None:
        kept = []
        for el in items:
            ea = _act(el[0], mapping, default)
            if ea == "PRUNE":
                continue
            kept.append(el)  # KEEP/DESCEND: element has no nested structs
        items = kept
    return (rid, level, n, sub, items)


def _canon(rows):
    def c(v):
        if isinstance(v, (list, tuple)):
            return tuple(c(x) for x in v)
        return v

    return sorted((c(r) for r in rows), key=repr)


_MAPPING = st.fixed_dictionaries(
    {"a": st.sampled_from(ACTIONS), "b": st.sampled_from(ACTIONS),
     "c": st.sampled_from(ACTIONS)}
)


@settings(
    max_examples=fuzz_examples(40),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_MAPPING, st.sampled_from(ACTIONS))
def test_redact_matches_reference(spark, mapping, default):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = aggregate(df, [{"$redact": _spec(mapping, default)}]).collect()

    def row_tuple(r):
        sub = None
        if r["sub"] is not None:
            inner = None
            if r["sub"]["inner"] is not None:
                inner = (r["sub"]["inner"]["level"], r["sub"]["inner"]["v"])
            sub = (r["sub"]["level"], r["sub"]["v"], inner)
        items = None
        if r["items"] is not None:
            items = [(e["level"], e["v"]) for e in r["items"]]
        return (r["rid"], r["level"], r["n"], sub, items)

    want = [w for w in (_ref_row(r, mapping, default) for r in ROWS)
            if w is not None]
    assert _canon(row_tuple(r) for r in got) == _canon(want), (mapping, default)


def test_redact_root_keep_short_circuits_nested_prunes(spark):
    """A root-level KEEP keeps the WHOLE document even when nested levels
    would prune under re-evaluation."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    spec = {"$cond": [{"$eq": ["$level", "a"]}, "$$KEEP", "$$PRUNE"]}
    got = aggregate(df, [{"$redact": spec}]).collect()
    by_rid = {r["rid"]: r for r in got}
    # rows 1 and 5 (root level 'a') survive COMPLETE; row 1's sub has
    # level 'b' (would prune) yet stays because root KEEP short-circuits
    assert set(by_rid) == {1, 5}
    assert by_rid[1]["sub"]["level"] == "b"
    assert [e["level"] for e in by_rid[1]["items"]] == ["a", "b", "c"]
