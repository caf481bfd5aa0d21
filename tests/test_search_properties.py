"""Hypothesis property tests for the newest operator families: BM25 ranking
against a driver-side reference, sequence packing invariants, and SCD2
episode reconstruction.  Small deterministic profiles (Spark jobs per
example are expensive); the properties, not the volume, carry the value."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.curation import (
    pack_sequences,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.search import (
    bm25_topk,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.upsert import (
    scd2_from_changes,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "query", "spark"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            s += math.floor(c * 1e6 + 0.5) / 1e6
        if s:
            out[i] = s
    return out


@given(texts=st.lists(_doc, min_size=2, max_size=10))
@settings(**_SETTINGS)
def test_bm25_matches_reference_on_random_corpora(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.id: r.score
        for r in bm25_topk(df, "text", "doc_id", ["query", "spark"], k=100).collect()
    }
    ref = _bm25_reference(docs, ["query", "spark"])
    assert set(got) == set(ref)
    for i, s in got.items():
        assert math.isclose(s, ref[i], rel_tol=1e-9, abs_tol=1e-9)


@given(
    lens=st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=20),
    budget=st.integers(min_value=2, max_value=12),
)
@settings(**_SETTINGS)
def test_pack_sequences_invariants(spark, lens, budget):
    docs = [(i, "w " * n) for i, n in enumerate(lens)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pack_sequences(df, "text", "doc_id", budget=budget, n_shards=4).collect()
    assert len(rows) == len(docs)  # every document assigned exactly once
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.id)
        # offsets are the exact running sum in id order; bins consistent
        acc = 0
        for r in shard_rows:
            assert r.tok_offset == acc
            assert r.bin == acc // budget
            acc += r.n_tok


@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # key
            st.integers(min_value=0, max_value=50),  # ts
            st.sampled_from(["A", "B", "C"]),  # value
        ),
        min_size=1,
        max_size=15,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_scd2_reconstructs_state_at_every_instant(spark, changes):
    rows = [(k, t, v, i) for i, (k, t, v) in enumerate(changes)]
    df = spark.createDataFrame(rows, "k long, t long, v string, tb long")
    episodes = scd2_from_changes(df, "k", "t", "v", "tb").collect()
    # reference: state of key k at time q = value of the last change with
    # (t, tb) <= (q-ordering); episodes must agree at every change instant
    by_key: dict[int, list] = {}
    for k, t, v, tb in rows:
        by_key.setdefault(k, []).append((t, tb, v))
    for k, evs in by_key.items():
        evs.sort()
        k_eps = sorted(
            [e for e in episodes if e.key == k], key=lambda e: e.valid_from
        )
        # intervals tile [first_change, inf): contiguous, last one open
        assert k_eps[0].valid_from == evs[0][0]
        for a, b in zip(k_eps, k_eps[1:]):
            assert a.valid_to == b.valid_from
        assert k_eps[-1].valid_to is None and k_eps[-1].is_current
        # no two consecutive episodes share a value (repeats collapsed)
        for a, b in zip(k_eps, k_eps[1:]):
            assert a.value != b.value
        # the final episode's value is the key's last-written state
        assert k_eps[-1].value == evs[-1][2]
