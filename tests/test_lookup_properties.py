"""Property-based tests for the $lookup compiler (docstore/pipeline.py):
random specs across all three forms — equi (localField/foreignField),
correlated document pipeline ($match $expr + $project/$sort/$skip/$limit),
and aggregated (interior $group + $sort/$limit) — run through BOTH the
Catalyst compiler and a tiny Python reference evaluator implementing
Mongo's semantics, over corpora with null keys, null payloads, and an
EXACT DUPLICATE local document (the r9 row-identity contract: one output
row per INPUT doc, never a collapse).

Mongo semantics locked here:
- equi form: a null localField matches foreign docs whose foreignField is
  null/missing (null-safe equality — r9 fix), and a join miss yields [].
- $expr $eq is TOTAL over BSON order (null == null).
- $sort inside the sub-pipeline: asc places nulls first, desc last; with
  $skip/$limit the cut is over the sorted matches per local doc.
- aggregated form: keyed $group over zero matched docs emits [] (so does
  {_id: null}); $sum of no numeric values is 0, $avg/$min/$max are null.
- array ORDER is contractual only when the sub-pipeline ends in $sort
  (compared ordered there; as multisets otherwise).

Corpus sort keys are unique per foreign key group, so ordered comparisons
are deterministic.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate
from conftest import fuzz_examples

# exact duplicate first two rows; null key; key matching nothing (9)
LOCAL = [
    {"k": 1, "tag": "x", "w": 2.0},
    {"k": 1, "tag": "x", "w": 2.0},
    {"k": 2, "tag": "y", "w": None},
    {"k": None, "tag": "z", "w": 1.5},
    {"k": 3, "tag": None, "w": 0.5},
    {"k": 9, "tag": "w", "w": 4.0},
]
LOCAL_SCHEMA = "k long, tag string, w double"

# prices unique within each fk group (deterministic $sort cuts); null fk row
FOREIGN = [
    {"fk": 1, "status": "F", "price": 10.0},
    {"fk": 1, "status": "O", "price": 5.0},
    {"fk": 1, "status": "F", "price": 7.5},
    {"fk": 2, "status": "O", "price": 5.25},
    {"fk": 2, "status": "F", "price": None},
    {"fk": None, "status": "O", "price": 2.0},
    {"fk": 4, "status": "F", "price": 1.0},
]
FOREIGN_SCHEMA = "fk long, status string, price double"


# -- reference evaluator ------------------------------------------------------


def _total_eq(a, b):
    return a == b  # covers null == null (both None)


def _sorted_matches(matches, sort_spec):
    out = list(matches)
    for key, direction in reversed(list(sort_spec.items())):
        asc = direction >= 0
        # BSON: nulls lowest → first under asc, last under desc; keying on
        # (is not None, value) makes null the smallest in BOTH directions
        out.sort(
            key=lambda d: (d[key] is not None, d[key] if d[key] is not None else 0),
            reverse=not asc,
        )
    return out


def eval_equi(local_docs, foreign_docs):
    out = []
    for ld in local_docs:
        arr = [fd for fd in foreign_docs if _total_eq(ld["k"], fd["fk"])]
        out.append((ld, arr))
    return out


def eval_doc_form(local_docs, foreign_docs, sort_spec, skip_n, limit_n):
    out = []
    for ld in local_docs:
        arr = [fd for fd in foreign_docs if _total_eq(fd["fk"], ld["k"])]
        if sort_spec is not None:
            arr = _sorted_matches(arr, sort_spec)
            end = None if limit_n is None else skip_n + limit_n
            arr = arr[skip_n:end]
        out.append((ld, arr))
    return out


def eval_group_form(local_docs, foreign_docs, acc_name, acc_spec, sort_tail):
    out = []
    for ld in local_docs:
        matches = [fd for fd in foreign_docs if _total_eq(fd["fk"], ld["k"])]
        groups: dict = {}
        for fd in matches:
            groups.setdefault(fd["status"], []).append(fd)
        arr = []
        for gid, docs in groups.items():
            if acc_spec == "count":
                val = len(docs)
            else:
                nums = [d["price"] for d in docs if d["price"] is not None]
                if acc_spec == "sum":
                    val = sum(nums) if nums else 0
                elif acc_spec == "avg":
                    val = sum(nums) / len(nums) if nums else None
                elif acc_spec == "min":
                    val = min(nums) if nums else None
                else:
                    val = max(nums) if nums else None
            arr.append({"_id": gid, acc_name: val})
        if sort_tail:
            arr = _sorted_matches(arr, {"_id": 1})
        out.append((ld, arr))
    return out


# -- canonicalization ---------------------------------------------------------


def _canon_local(row):
    return (row["k"], row["tag"], row["w"])


def _canon_elem(e, fields):
    return tuple(e[f] for f in fields)


def _canon_pairs(pairs, fields, ordered):
    out = []
    for ld, arr in pairs:
        elems = [_canon_elem(e, fields) for e in arr]
        if not ordered:
            elems = sorted(elems, key=repr)
        out.append((_canon_local(ld), tuple(elems)))
    return sorted(out, key=repr)


_CACHE: dict = {}


def _frames(spark):
    if "l" not in _CACHE:
        l = spark.createDataFrame(
            [tuple(d[c] for c in ("k", "tag", "w")) for d in LOCAL], LOCAL_SCHEMA
        ).cache()
        f = spark.createDataFrame(
            [tuple(d[c] for c in ("fk", "status", "price")) for d in FOREIGN],
            FOREIGN_SCHEMA,
        ).cache()
        l.count(), f.count()
        _CACHE["l"], _CACHE["f"] = l, f
    return _CACHE["l"], _CACHE["f"]


def _spark_pairs(rows, alias, fields, ordered):
    pairs = [
        ({k: r[k] for k in ("k", "tag", "w")},
         [e.asDict() for e in (r[alias] or [])])
        for r in rows
    ]
    return _canon_pairs(pairs, fields, ordered)


# -- strategies ---------------------------------------------------------------

_DOC_TAILS = st.one_of(
    st.just([]),
    st.tuples(
        st.sampled_from([{"price": 1}, {"price": -1}]),
        st.sampled_from([None, 0, 1, 2]),      # skip
        st.sampled_from([None, 1, 2, 5]),      # limit
    ).map(
        lambda t: [{"$sort": t[0]}]
        + ([{"$skip": t[1]}] if t[1] else [])
        + ([{"$limit": t[2]}] if t[2] is not None else [])
    ),
)

_ACCS = st.sampled_from(
    [("n", "count"), ("t", "sum"), ("a", "avg"), ("lo", "min"), ("hi", "max")]
)


@settings(
    max_examples=fuzz_examples(40),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_DOC_TAILS)
def test_doc_form_matches_reference(spark, tail):
    l, f = _frames(spark)
    spec = {
        "from": f,
        "let": {"lk": "$k"},
        "pipeline": [{"$match": {"$expr": {"$eq": ["$fk", "$$lk"]}}}] + tail,
        "as": "m",
    }
    rows = aggregate(l, [{"$lookup": spec}]).collect()
    sort_spec = next((s["$sort"] for s in tail if "$sort" in s), None)
    skip_n = next((s["$skip"] for s in tail if "$skip" in s), 0)
    limit_n = next((s["$limit"] for s in tail if "$limit" in s), None)
    ordered = sort_spec is not None
    got = _spark_pairs(rows, "m", ("fk", "status", "price"), ordered)
    want = _canon_pairs(
        eval_doc_form(LOCAL, FOREIGN, sort_spec, skip_n, limit_n),
        ("fk", "status", "price"),
        ordered,
    )
    assert got == want
    assert len(rows) == len(LOCAL)  # duplicate local docs never collapse


@settings(
    max_examples=fuzz_examples(30),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_ACCS, st.booleans())
def test_group_form_matches_reference(spark, acc, sort_tail):
    name, kind = acc
    l, f = _frames(spark)
    acc_spec = (
        {name: {"$sum": 1}}
        if kind == "count"
        else {name: {f"${kind}": "$price"}}
    )
    pipe = [
        {"$match": {"$expr": {"$eq": ["$fk", "$$lk"]}}},
        {"$group": {"_id": "$status", **acc_spec}},
    ]
    if sort_tail:
        pipe.append({"$sort": {"_id": 1}})
    rows = aggregate(
        l, [{"$lookup": {"from": f, "let": {"lk": "$k"}, "pipeline": pipe, "as": "g"}}]
    ).collect()
    got = _spark_pairs(rows, "g", ("_id", name), ordered=sort_tail)
    want = _canon_pairs(
        eval_group_form(LOCAL, FOREIGN, name, kind, sort_tail),
        ("_id", name),
        ordered=sort_tail,
    )
    assert got == want
    assert len(rows) == len(LOCAL)


def test_equi_form_matches_reference_incl_null_keys(spark):
    l, f = _frames(spark)
    rows = aggregate(
        l,
        [{"$lookup": {"from": f, "localField": "k", "foreignField": "fk", "as": "m"}}],
    ).collect()
    got = _spark_pairs(rows, "m", ("fk", "status", "price"), ordered=False)
    want = _canon_pairs(
        eval_equi(LOCAL, FOREIGN), ("fk", "status", "price"), ordered=False
    )
    assert got == want
    assert len(rows) == len(LOCAL)
    # the null-key local doc matched the null-fk foreign doc (Mongo)
    null_row = next(r for r in rows if r["k"] is None)
    assert [e["status"] for e in null_row["m"]] == ["O"]


def test_doc_form_project_exclusion_mode(spark):
    """r9 fix: a 0/False value in the sub-pipeline $project EXCLUDES the
    field (Mongo) — it used to be silently treated as an include; mixing
    include and exclude (except _id) raises."""
    import pytest

    l, f = _frames(spark)
    rows = aggregate(
        l,
        [{"$lookup": {
            "from": f, "let": {"lk": "$k"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$fk", "$$lk"]}}},
                {"$project": {"price": 0}},
            ],
            "as": "m"}}],
    ).collect()
    one = next(r for r in rows if r["k"] == 1)
    elem = one["m"][0].asDict()
    assert set(elem) == {"fk", "status"}
    with pytest.raises(ValueError, match="mix include and exclude"):
        aggregate(
            l,
            [{"$lookup": {
                "from": f, "let": {"lk": "$k"},
                "pipeline": [
                    {"$match": {"$expr": {"$eq": ["$fk", "$$lk"]}}},
                    {"$project": {"price": 0, "status": 1}},
                ],
                "as": "m"}}],
        )


# -- Mongo 5.0 concise correlated form (r10, ADVICE r9 medium) ----------------


@settings(
    max_examples=fuzz_examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_DOC_TAILS)
def test_concise_correlated_matches_reference(spark, tail):
    """localField/foreignField + pipeline: the equality applies IN ADDITION
    to the pipeline (it used to be silently dropped — every local doc got
    every pipeline-passing foreign doc)."""
    l, f = _frames(spark)
    spec = {
        "from": f,
        "localField": "k",
        "foreignField": "fk",
        "pipeline": tail,
        "as": "m",
    }
    rows = aggregate(l, [{"$lookup": spec}]).collect()
    sort_spec = next((s["$sort"] for s in tail if "$sort" in s), None)
    skip_n = next((s["$skip"] for s in tail if "$skip" in s), 0)
    limit_n = next((s["$limit"] for s in tail if "$limit" in s), None)
    ordered = sort_spec is not None
    got = _spark_pairs(rows, "m", ("fk", "status", "price"), ordered)
    want = _canon_pairs(
        eval_doc_form(LOCAL, FOREIGN, sort_spec, skip_n, limit_n),
        ("fk", "status", "price"),
        ordered,
    )
    assert got == want
    assert len(rows) == len(LOCAL)


def test_concise_correlated_ands_extra_match(spark):
    """A leading $match $expr in the concise pipeline AND-merges with the
    equality instead of replacing it."""
    l, f = _frames(spark)
    rows = aggregate(
        l,
        [{"$lookup": {
            "from": f, "localField": "k", "foreignField": "fk",
            "pipeline": [{"$match": {"$expr": {"$eq": ["$status", "F"]}}}],
            "as": "m"}}],
    ).collect()
    want = _canon_pairs(
        [
            (ld, [fd for fd in FOREIGN
                  if _total_eq(fd["fk"], ld["k"]) and fd["status"] == "F"])
            for ld in LOCAL
        ],
        ("fk", "status", "price"),
        ordered=False,
    )
    got = _spark_pairs(rows, "m", ("fk", "status", "price"), ordered=False)
    assert got == want
    # over-match regression: local k=1 has 2 'F' foreign docs, not all 4 'F'
    one = next(r for r in rows if r["k"] == 1)
    assert len(one["m"]) == 2


def test_concise_correlated_respects_let_vars(spark):
    """User let-vars coexist with the desugared equality variable."""
    l, f = _frames(spark)
    rows = aggregate(
        l,
        [{"$lookup": {
            "from": f, "localField": "k", "foreignField": "fk",
            "let": {"lw": "$w"},
            "pipeline": [{"$match": {"$expr": {"$gt": ["$price", "$$lw"]}}}],
            "as": "m"}}],
    ).collect()
    # local k=1 (w=2.0) matches fk=1 docs with price > 2.0 — all three of
    # fk=1's docs qualify, but NOT fk=2's 5.25 (also > 2.0): the desugared
    # equality still constrains the join alongside the user's $$lw condition
    one = next(r for r in rows if r["k"] == 1)
    assert sorted(e["price"] for e in one["m"]) == [5.0, 7.5, 10.0]
    assert all(e["fk"] == 1 for e in one["m"])
    assert len(rows) == len(LOCAL)


def test_concise_correlated_requires_both_fields(spark):
    import pytest

    l, f = _frames(spark)
    for partial in ({"localField": "k"}, {"foreignField": "fk"}):
        with pytest.raises(ValueError, match="BOTH localField and foreignField"):
            aggregate(
                l,
                [{"$lookup": {"from": f, "pipeline": [], "as": "m", **partial}}],
            )


def test_concise_correlated_composes_with_group_form(spark):
    """The concise desugar feeds the aggregated-$lookup branch unchanged:
    equality + interior $group per local doc."""
    l, f = _frames(spark)
    rows = aggregate(
        l,
        [{"$lookup": {
            "from": f, "localField": "k", "foreignField": "fk",
            "pipeline": [
                {"$group": {"_id": "$status", "n": {"$sum": 1}}},
                {"$sort": {"_id": 1}},
            ],
            "as": "g"}}],
    ).collect()
    got = _spark_pairs(rows, "g", ("_id", "n"), ordered=True)
    want = _canon_pairs(
        eval_group_form(LOCAL, FOREIGN, "n", "count", sort_tail=True),
        ("_id", "n"),
        ordered=True,
    )
    assert got == want
    assert len(rows) == len(LOCAL)
