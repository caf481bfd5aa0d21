"""Hypothesis property tests for span dedup and snapshot diff: invariants a
driver-side reference can assert on arbitrary inputs.  Small deterministic
profiles (a Spark job per example); the properties carry the value."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import span_dedup
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.upsert import table_diff

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.sampled_from(["a", "b", "c", "d", "e"])
_para = st.lists(_word, min_size=1, max_size=4).map(" ".join)
_doc = st.lists(_para, min_size=0, max_size=5).map("\n\n".join)


@given(docs=st.lists(_doc, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_span_dedup_matches_sequential_reference(spark, docs):
    """First-occurrence span dedup == the obvious sequential algorithm."""
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.clean_text, r.n_spans, r.n_dropped)
        for r in span_dedup(df, "text", "doc_id", sep="\n\n").collect()
    }
    seen: set[str] = set()
    for i, d in enumerate(docs):
        paras = [p for p in d.split("\n\n") if p != ""]
        kept = []
        for p in paras:
            if p in seen:
                continue
            seen.add(p)
            kept.append(p)
        want = ("\n\n".join(kept), len(paras), len(paras) - len(kept))
        if paras:
            assert got[i] == want, (i, got[i], want)
        else:
            assert i not in got  # zero-span docs produce no span rows


_key = st.integers(min_value=0, max_value=15)
_val = st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))


@given(
    old=st.dictionaries(_key, _val, max_size=10),
    new=st.dictionaries(_key, _val, max_size=10),
)
@settings(**_SETTINGS)
def test_table_diff_matches_dict_reference(spark, old, new):
    schema = "k long, v string"
    old_df = spark.createDataFrame(list(old.items()), schema)
    new_df = spark.createDataFrame(list(new.items()), schema)
    if not old and not new:
        return
    got = {
        r.k: r.status for r in table_diff(old_df, new_df, ["k"], ["v"]).collect()
    }
    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        elif old[k] != new[k]:
            want[k] = "changed"
    assert got == want
