"""Physical-plan regression tests (SURVEY.md §4): the optimizations the
reference hand-rolls must actually fire in Catalyst — pushdown, pruning,
broadcast, top-k, partial aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import load_table
from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import (
    assert_plan,
    has_pushed_filters,
    has_top_k,
    pushed_filters,
    read_schema_columns,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.queries import QUERIES


def q(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def assert_only_subscan_roundrobin(plan: str, name: str = "") -> None:
    """Every Exchange in ``plan`` must be the r15 scan-rebalance: at most
    one ROUND-ROBIN repartition sitting BELOW every MapInPandas stage
    (``executedPlan().toString()`` prints parents before children, so a
    deeper operator has a larger string offset).  Payload/key shuffles
    (hash/range exchanges, or any exchange above a map stage) still fail."""
    # "ReusedExchange" contains the substring "Exchange" but reuses the
    # already-counted round-robin exchange — exclude it (ADVICE r15).
    n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_ex == plan.count("Exchange RoundRobinPartitioning"), (name, plan[:1500])
    assert n_ex <= 1, (name, plan[:1500])
    if n_ex and "MapInPandas" in plan:
        assert plan.rindex("MapInPandas") < plan.index(
            "Exchange RoundRobinPartitioning"
        ), (name, plan[:1500])


class TestPushdownAndPruning:
    def test_filter_reaches_parquet_scan(self, spark, sf_dir):
        df = q("find_building_customers", spark, sf_dir)
        # manual $match-first (05/most_common_city_name.py:12-14) is automatic
        assert has_pushed_filters(df, "c_mktsegment", "c_acctbal")

    def test_docstore_find_pushes_down(self, spark, sf_dir):
        # the Mongo-surface compiler emits plain predicates → same pushdown
        df = q("ds_find_machinery_customers", spark, sf_dir)
        assert has_pushed_filters(df, "c_mktsegment", "c_acctbal")

    def test_column_pruning_projection(self, spark, sf_dir):
        df = q("project_rename", spark, sf_dir)
        cols = read_schema_columns(df)
        assert cols == {"c_name", "c_acctbal"}  # not the whole customer table

    def test_agg_prunes_to_grouping_and_measure(self, spark, sf_dir):
        df = q("avg_balance_by_nation_segment", spark, sf_dir)
        assert read_schema_columns(df) == {"c_nationkey", "c_mktsegment", "c_acctbal"}

    def test_date_range_pushdown(self, spark, sf_dir):
        df = q("orders_in_range", spark, sf_dir)
        assert any("o_orderdate" in f for f in pushed_filters(df))


class TestJoinStrategies:
    def test_dim_joins_broadcast(self, spark, sf_dir):
        assert_plan(
            q("customers_per_region", spark, sf_dir),
            broadcast_join=True,
            partial_aggregation=True,
        )

    def test_topk_semi_join_broadcasts(self, spark, sf_dir):
        assert_plan(q("orders_of_top_customers", spark, sf_dir), broadcast_join=True)

    def test_upsert_broadcasts_update_side(self, spark, sf_dir):
        assert_plan(q("upsert_supplier_acctbal", spark, sf_dir), broadcast_join=True)


class TestAggregationAndTopK:
    def test_sort_limit_is_take_ordered(self, spark, sf_dir):
        # $sort+$limit → TakeOrderedAndProject, no full sort (T1)
        assert has_top_k(q("top_event_types", spark, sf_dir))
        assert has_top_k(q("ds_top_clickers", spark, sf_dir))

    def test_group_count_partial_agg(self, spark, sf_dir):
        assert_plan(q("top_event_types", spark, sf_dir), partial_aggregation=True)

    def test_quantized_sum_keeps_partial_agg(self, spark, sf_dir):
        # detagg's decimal accumulation must not break map-side combine
        assert_plan(q("pricing_summary", spark, sf_dir), partial_aggregation=True)

    def test_exact_dedup_is_single_aggregate_no_join(self, spark, sf_dir):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("dedup_exact_groups", spark, sf_dir))
        assert "Join" not in plan  # one hash-agg on the fingerprint


class TestTrainingDataPlans:
    def test_ivf_broadcasts_centroids_and_takes_ordered(self, spark, sf_dir):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ann_ivf_topk", spark, sf_dir))
        assert "Broadcast" in plan  # centroid sides never shuffle the corpus
        assert has_top_k(q("ann_ivf_topk", spark, sf_dir))

    def test_embedding_near_pairs_has_no_driver_materialization(self, spark, sf_dir):
        # the block-matrix plan keeps everything executor-side: block packing
        # (one aggregate), a triangular block-pair join, mapInPandas — the
        # round-1 driver-side collect() is structurally impossible to
        # reintroduce without this failing
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("dedup_embedding_cosine", spark, sf_dir))
        assert "MapInPandas" in plan
        assert "CollectLimit" not in plan

    def test_minhash_shingles_materialize_once(self, spark, sf_dir):
        # the shared shingle/signature front-end must materialize once and be
        # re-read by its consumers (signature agg + band self-join + both
        # verification sides) instead of recomputing per consumer — the
        # round-1 projection-collapse trap.  Reuse is structural now (the
        # operator persists the shared tables), so the executed plan must
        # read the cache at least twice; AQE ReusedExchange also counts.
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        d = load_table(spark, sf_dir, "documents")
        out = minhash_lsh_pairs(d, "text", "doc_id")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        cache_reads = plan.count("InMemoryTableScan") + plan.count("TableCacheQueryStage")
        assert cache_reads >= 2 or plan.count("ReusedExchange") >= 1, plan[:2000]


class TestScanShapes:
    def test_full_catalog_plan_invariants(self, spark, sf_dir):
        """ONE plan pass over the whole catalog asserting every global
        invariant (r16: three separate sweeps each rebuilt all ~170 plans —
        consolidated for the driver's pytest budget, identical coverage):

        - no CartesianProduct anywhere (the one join Catalyst can't save
          at 100 TB);
        - no RDD-backed scans outside the declared exceptions
          (streaming/pandas-udf/lsh/similarity/iterative localCheckpoint
          loops);
        - zero RoundRobinPartitioning exchanges outside the explicit
          scan-rebalance opt-in set (VERDICT r15 ask #2 — committed plan
          evidence must be reproducible from HEAD)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        opt_in = TestRound16Plans.ROUNDROBIN_OPT_IN  # defined below

        for name, entry in QUERIES.items():
            if "streaming" in entry.tags:
                continue
            plan = executed_plan(entry.fn(spark, sf_dir))
            assert "CartesianProduct" not in plan, name
            if not (
                {"pandas-udf", "lsh", "similarity", "iterative"} & set(entry.tags)
            ):
                assert "Scan ExistingRDD" not in plan, name
            if name not in opt_in:
                assert "RoundRobinPartitioning" not in plan, name

    def test_events_json_extraction_prunes(self, spark, sf_dir):
        df = q("events_with_large_k", spark, sf_dir)
        assert read_schema_columns(df) == {"event_type", "props"}


class TestPromotedQueryPruning:
    """The round-3 promoted driver queries must push column pruning to the
    scan: an audit that reads every supplier column for a name-only
    redaction (or a packer reading more than id+text) is wrong at 100 TB."""

    def test_pii_audit_reads_only_name_and_join_key(self, spark, sf_dir):
        df = q("pii_redaction_audit", spark, sf_dir)
        assert read_schema_columns(df) <= {"s_name", "s_nationkey", "n_name", "n_nationkey"}

    def test_pack_sequences_reads_only_id_and_text(self, spark, sf_dir):
        df = q("pack_training_sequences", spark, sf_dir)
        assert read_schema_columns(df) == {"doc_id", "text"}

    def test_bm25_reads_only_id_and_text(self, spark, sf_dir):
        df = q("bm25_keyword_topk", spark, sf_dir)
        assert read_schema_columns(df) == {"doc_id", "text"}


class TestRound3OperatorPlans:
    """Plan shapes for the round-3 additions: span dedup, PQ/IVF-PQ,
    SemDeDup."""

    def test_span_dedup_winner_is_hash_agg_not_window(self, spark, sf_dir):
        """The first-occurrence winner must be a partial-aggregable hash
        aggregate over (md5, id, pos) — a window row_number would shuffle
        and SORT every span row by content hash instead."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("span_dedup_documents", spark, sf_dir))
        assert "min(w" in plan or "partial_min" in plan.lower() or "HashAggregate" in plan
        # the dedup rank carries no Window operator (reassembly's collect_list
        # is an aggregate, not a window)
        assert "RunningWindowFunction" not in plan and "row_number" not in plan

    def test_ivfpq_distance_table_broadcasts(self, spark, sf_dir):
        """ADC must broadcast the tiny (nprobe·m·codes) distance table and
        never shuffle raw vectors to rank."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ann_ivfpq_topk", spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert has_top_k(QUERIES["ann_ivfpq_topk"].fn(spark, sf_dir))

    def test_semantic_dedup_packs_cells_single_scan(self, spark, sf_dir):
        """The default (sub_blocks=1) SemDeDup plan packs each cell once and
        multiplies it in an Arrow batch: ONE scan of the embeddings table,
        no pair join at all (the quadratic work never enters the plan), the
        only nested-loop being the broadcast cross against the tiny centroid
        table."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("semantic_dedup_embeddings", spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert plan.count("Scan parquet") == 1  # vectors read exactly once
        assert plan.count("BroadcastNestedLoopJoin") <= 1  # centroid assign only
        assert "MapInPandas" in plan  # packed-cell multiply
        # no per-pair join: the packed rows never meet in a join operator
        assert (
            plan.count("SortMergeJoin")
            + plan.count("ShuffledHashJoin")
            + plan.count("BroadcastHashJoin")
            == 0
        )

    def test_q3_broadcasts_filtered_dim_and_takes_topk(self, spark, sf_dir):
        """TPC-H Q3 shape: the filtered customer side must broadcast, the
        segment filter must reach the scan, and the top-10 must be a
        TakeOrderedAndProject, not a global sort."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        df = q("shipping_priority_top10", spark, sf_dir)
        plan = executed_plan(df)
        assert plan.count("BroadcastHashJoin") >= 1
        assert "TakeOrderedAndProject" in plan
        assert has_pushed_filters(df, "c_mktsegment")


class TestRound3AdditionPlans:
    """Shuffle-shape claims of the round-3 tier, pinned."""

    def test_gap_fill_locf_two_key_shuffles(self, spark, sf_dir):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("events_gap_filled_locf", spark, sf_dir))
        # spine agg + fill window share the key partitioning: the whole plan
        # needs at most 3 exchanges (obs agg, spine agg reuse, final window)
        # plus the r15 scan-rebalance round-robin, and never a cartesian
        # spine
        assert "CartesianProduct" not in plan
        assert plan.count("Exchange") - plan.count("Exchange RoundRobinPartitioning") <= 4
        assert "BroadcastNestedLoopJoin" not in plan

    def test_time_weighted_avg_single_window_plus_agg(self, spark, sf_dir):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("events_time_weighted_avg", spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert plan.count("Window") == 1  # one lead pass
        # key exchanges only — the r15 scan-rebalance round-robin is exempt
        assert plan.count("Exchange") - plan.count("Exchange RoundRobinPartitioning") <= 3

    def test_lc_distinct_shuffles_bits_not_keys(self, spark, sf_dir):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        df = q("lc_distinct_users", spark, sf_dir)
        plan = executed_plan(df)
        # distinct over bit ids then a global agg — no join machinery at all
        assert "Join" not in plan
        assert "HashAggregate" in plan

    def test_cms_build_partial_aggregates_before_exchange(self, spark, sf_dir):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("cms_token_counts", spark, sf_dir))
        # the grid build must partial-aggregate map-side (the sketch's whole
        # point: pre-shuffle state bounded by depth x width)
        assert plan.count("HashAggregate") >= 2
        assert "CartesianProduct" not in plan


class TestRound5Plans:
    def test_lookup_topn_single_exchange_broadcast_foreign(self, spark, sf_dir):
        """Per-doc $sort/$limit in $lookup: the window and BOTH aggregation
        passes must share ONE hash exchange; the foreign side broadcasts."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ds_lookup_topn", spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert plan.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in plan
        # the leading-$project variant (sort by a COMPUTED projected field)
        # must keep the exact same one-exchange shape
        plan2 = executed_plan(q("ds_lookup_proj_sort", spark, sf_dir))
        assert "BroadcastHashJoin" in plan2
        assert plan2.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in plan2

    def test_window_integral_two_inherent_exchanges(self, spark, sf_dir):
        """ds_window_integral: the (event_type, ts) dedup shuffles once,
        then the window and the final group SHARE the (event_type)
        exchange — two total, zero joins."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ds_window_integral", spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 2
        assert "Join" not in plan

    def test_media_decode_payloads_never_shuffle(self, spark, sf_dir):
        """Real codec decode: payload bytes must NEVER shuffle — the plan is
        scan → mapInPandas stages.  The r15 scan rebalance may add ONE
        round-robin exchange BELOW the synthesize stage (it carries only
        doc_id, before any payload exists); nothing above the map stages
        may shuffle."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        for name in ("multimodal_media_decode", "multimodal_bmp_resize",
                     "multimodal_wav_resample"):
            plan = executed_plan(q(name, spark, sf_dir))
            assert_only_subscan_roundrobin(plan, name)
            assert "Join" not in plan, name

    def test_fill_linear_single_partition_exchange(self, spark, sf_dir):
        """$fill linear: backward + forward frames compile into Window ops
        over ONE partition exchange — no self-joins."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ds_fill_linear", spark, sf_dir))
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") == 1

    def test_window_time_range_uses_range_frame(self, spark, sf_dir):
        """Time-unit windows must compile to a RANGE frame over the micros
        key, not a rows frame or a join."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ds_window_time_range", spark, sf_dir))
        assert "RangeFrame" in plan or "specifiedwindowframe(RangeFrame" in plan
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") == 1

    def test_union_with_no_shuffle_before_agg(self, spark, sf_dir):
        """$unionWith: two pruned scans union map-side; the only exchange
        is the final group-by's."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ds_union_with", spark, sf_dir))
        assert "Union" in plan
        assert plan.count("Exchange hashpartitioning") == 1


class TestRound7SessionPlans:
    def test_redact_is_projection_no_join_no_hash_shuffle(self, spark, sf_dir):
        """$redact compiles to a scan-level filter + projection: the nested
        rewrite must not introduce joins or UDFs; the trailing $sort's range
        exchange is the only shuffle."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ds_redact_nested", spark, sf_dir))
        assert "Join" not in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Python" not in plan  # no UDF escape hatch

    def test_regex_extract_single_group_exchange(self, spark, sf_dir):
        """$regexFindAll + $unwind + $group: the extraction is map-side
        (expression-only); the group-by's hash exchange and the final top-k
        are the only distribution steps."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ds_regex_extract", spark, sf_dir))
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") == 1
        assert "TakeOrderedAndProject" in plan

    def test_dsir_bucket_tables_broadcast(self, spark, sf_dir):
        """DSIR: the log-ratio table is n_buckets-bounded and must BROADCAST
        into the scoring join — the corpus never shuffles by token bucket
        for scoring (only the bounded bucket aggregations hash-shuffle)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("dsir_importance_weights", spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_bigram_logprob_broadcasts_vocab_and_ctx(self, spark, sf_dir):
        """Bigram LM: vocabulary/context/total tables broadcast; no
        cartesian products; the per-doc aggregation is the id shuffle."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("doc_bigram_logprob", spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_exact_substring_dedup_no_python_no_cartesian(self, spark, sf_dir):
        """ExactSubstr dedup: shingles hash map-side (only (h, id, pos)
        shuffles), duplicate sites come from a hash-aggregate, and the
        rebuild is HOF-only — no Python escape hatch, no cartesian product,
        and the token table scans once (persisted base reused by the
        shingle and rebuild branches)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("dedup_exact_substring", spark, sf_dir))
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "InMemoryRelation" in plan  # tokenize-once base

    def test_geo_near_single_scan_topk(self, spark, sf_dir):
        """$geoNear + limit: one scan, distance as a codegen'd expression,
        TakeOrderedAndProject top-k — no join, no hash shuffle, no UDF."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("geo_near_customers", spark, sf_dir))
        assert "TakeOrderedAndProject" in plan
        assert "Join" not in plan
        assert "Python" not in plan
        assert "Exchange hashpartitioning" not in plan

    def test_geo_radius_join_grid_never_cartesian(self, spark, sf_dir):
        """Grid-bucketed radius join: candidates come from an EQUI-join on
        the cell key (the x9 fan-out is map-side), never a cartesian or
        broadcast nested loop."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("geo_radius_join_pairs", spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Python" not in plan
        assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
            "ShuffledHashJoin" in plan
        )

    def test_nb_classifier_model_broadcasts(self, spark, sf_dir):
        """NB scoring: the bounded likelihood grid broadcasts into the token
        join (BroadcastHashJoin); the only nested-loop is the classes-x-docs
        prior attach (a broadcast of C rows); never a CartesianProduct."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("nb_lang_confusion", spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "Python" not in plan


class TestRound8Plans:
    def test_lookup_group_two_level_agg_broadcast_foreign(self, spark, sf_dir):
        """Aggregated correlated $lookup (interior $group): one broadcast
        join + exactly two hash exchanges — groupBy(local, key) computes
        accumulators with map-side partials, groupBy(local) assembles the
        array.  Never a per-document sub-pipeline, never a cartesian."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("ds_lookup_group", spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert plan.count("Exchange hashpartitioning") == 2
        # both aggregation levels partial-aggregate before their exchange
        assert plan.count("HashAggregate") >= 4
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_epoch_shuffle_one_exchange_no_global_sort(self, spark, sf_dir):
        """shuffle_into_shards: ONE hash exchange (the shard window), no
        range partitioning — a global orderBy(hash) would show
        'Exchange rangepartitioning'."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("shuffled_shard_manifest", spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange rangepartitioning" not in plan

    def test_gumbel_resample_is_top_k(self, spark, sf_dir):
        """gumbel_topk_sample: the k-row pick must be a
        TakeOrderedAndProject (per-partition top-k merge), never a global
        sort feeding a limit."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("dsir_gumbel_resample", spark, sf_dir))
        assert "TakeOrderedAndProject" in plan


class TestRound10Plans:
    """Plan pins for the round-10 compiler changes: the $merge null-safe key
    join must stay an EQUI join, and $bucketAuto's tie-coalescing peers
    frame must not add an exchange."""

    def test_null_safe_full_outer_join_is_equi(self, spark):
        """The exact join shape _apply_merge builds (eqNullSafe key
        condition on a full outer): Catalyst extracts EqualNullSafe as an
        equi-join key — (coalesce(k, 0), isnull(k)) — so the plan is a
        SortMergeJoin/ShuffledHashJoin, NEVER a BroadcastNestedLoopJoin.
        At 100 TB a BNLJ here would be fatal; this pin fails if a Spark
        upgrade or refactor ever drops the null-safe condition out of
        equi-key extraction."""
        import pyspark.sql.functions as F

        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        t = spark.range(1000).select(F.col("id").alias("k"), F.lit(True).alias("__tgt"))
        s = spark.range(500).select(F.col("id").alias("k"), F.lit(True).alias("__src"))
        j = t.alias("t").join(
            s.alias("s"), F.col("t.k").eqNullSafe(F.col("s.k")), "full_outer"
        )
        plan = executed_plan(j)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)

    def test_bucket_auto_exact_tie_coalesce_adds_no_exchange(self, spark):
        """r10's ties-never-split rewrite uses a peers-only RANGE frame over
        the SAME global sort as the ntile window — one single-partition
        exchange total, not a second hash exchange on the key."""
        import pyspark.sql.functions as F

        from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.pipeline import aggregate
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        df = spark.range(2000).select(((F.col("id") % 37) * 1.5).alias("price"))
        out = aggregate(
            df,
            [{"$bucketAuto": {"groupBy": "$price", "buckets": 4,
                              "scaleMode": "exact"}}],
        )
        plan = executed_plan(out)
        # exactly one data exchange: the single-partition window sort (the
        # final tiny groupBy on __b rides AQE's coalesced read of it)
        assert plan.count("Exchange hashpartitioning") <= 1, plan[:1500]
        assert plan.count("Exchange SinglePartition") <= 1, plan[:1500]

    def test_integral_has_no_per_row_fold(self, spark, sf_dir):
        """The r12 $integral rewrite: the physical plan must contain window
        SUM/lag expressions, and NO collect_list feeding an aggregate() HOF
        — the shape the zipf skew probe measured at O(n·w) per partition
        (>45× wall on a 206k-row hot user, PLANS.md §user-key-skew)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        df = q("ds_window_integral", spark, sf_dir)
        plan = executed_plan(df)
        assert "collect_list" not in plan, plan[:1500]
        assert "Window" in plan
        # one user exchange feeds every window stage: the dedup groupBy and
        # the integral windows all hash on the same key
        assert plan.count("Exchange hashpartitioning") <= 2, plan[:1500]


class TestRound16Plans:
    """r16 pins: scan-rebalance opt-in containment and the dedup-family
    broadcast gates."""

    # The complete opt-in set: queries whose plan may carry the r15
    # round-robin scan rebalance or an explicit keyless repartition
    # (etl_avro_roundtrip's encode rebalance).  Everything else must plan
    # ZERO RoundRobinPartitioning exchanges (VERDICT r15 ask #2 — the r15
    # evidence regression was 14 committed dumps carrying exchanges the
    # shipped tree cannot produce).
    ROUNDROBIN_OPT_IN = {
        "multimodal_png_decode",
        "multimodal_palette_decode",
        "multimodal_gif_frames",
        "multimodal_jpeg_decode",
        "multimodal_jpeg12_decode",
        "multimodal_jpeg_lossless_decode",
        "multimodal_png_variants",
        "multimodal_adpcm_decode",
        "multimodal_mp3_headers",
        "streaming_media_decode",
        "streaming_wav_decode",
        "etl_avro_roundtrip",
    }

    # the non-opted zero-RoundRobin sweep lives in
    # TestScanShapes::test_full_catalog_plan_invariants (one plan pass for
    # all catalog-wide invariants — pytest-budget consolidation)

    def test_ngram_df_broadcast_gate(self, spark, sf_dir, monkeypatch):
        """The footer-gated df-rank broadcast: ON at gate-passing sizes
        (freq table broadcasts into the rank join), OFF when the env knob
        zeroes the budget (shuffle plan, no broadcast of freq)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
            shingle_df_rank_auto,
        )

        assert shingle_df_rank_auto(1024) == "broadcast"
        assert shingle_df_rank_auto(None) == "shuffle"
        assert shingle_df_rank_auto(1 << 40) == "shuffle"
        monkeypatch.setenv("SPARK_GRAFT_SHINGLE_DF_BROADCAST_MAX_BYTES", "0")
        assert shingle_df_rank_auto(1024) == "shuffle"

    def test_band_broadcast_gate(self, monkeypatch):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
            band_join_broadcast_ok,
        )

        assert band_join_broadcast_ok(5000)
        assert not band_join_broadcast_ok(None)
        assert not band_join_broadcast_ok(10_000_000)
        monkeypatch.setenv("SPARK_GRAFT_BAND_BROADCAST_MAX_ROWS", "0")
        assert not band_join_broadcast_ok(5000)

    def test_minhash_band_broadcast_is_output_identical(self, spark, sf_dir):
        """Both band_join strategies must emit the same pair set (the gate
        only changes the join strategy, never the candidates)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import load_table
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        d = load_table(spark, sf_dir, "documents")
        rows = lambda bj: sorted(  # noqa: E731
            tuple(r)
            for r in minhash_lsh_pairs(
                d, "text", "doc_id", band_join=bj
            ).collect()
        )
        assert rows("broadcast") == rows("shuffle")

    def test_simhash_block_broadcast_is_output_identical(self, spark, sf_dir):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import load_table
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
            simhash_near_pairs,
        )

        d = load_table(spark, sf_dir, "documents")
        rows = lambda bj: sorted(  # noqa: E731
            tuple(r)
            for r in simhash_near_pairs(
                d, "text", "doc_id", max_hamming=3, block_join=bj
            ).collect()
        )
        assert rows("broadcast") == rows("shuffle")


class TestRound13Plans:
    """Shuffle-shape claims of the r13 tier, pinned."""

    def test_jpeg_decode_is_map_only(self, spark, sf_dir):
        """The JPEG synthesize→decode pipeline is two chained mapInPandas
        over the documents scan — binary payloads must never shuffle."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        plan = executed_plan(q("multimodal_jpeg_decode", spark, sf_dir))
        assert plan.count("MapInPandas") == 2, plan[:1500]
        assert_only_subscan_roundrobin(plan)

    def test_packed_assignment_is_one_arrow_pass(self, spark, sf_dir):
        """assign_to_centroids above the k threshold: one MapInPandas over
        the embedding scan — no broadcast nested-loop join, no per-pair
        expression evaluation (the r13 semdedup probe's find)."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.catalog import load_table
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.similarity import (
            _ASSIGN_PACKED_MIN_K,
            assign_to_centroids,
        )
        from data_wrangling_with_openstreetmap_and_mongodb_spark.plans import executed_plan

        e = load_table(spark, sf_dir, "embeddings")
        k = _ASSIGN_PACKED_MIN_K
        cents = [
            (i, [float((i + j) % 7) for j in range(64)]) for i in range(k)
        ]
        plan = executed_plan(assign_to_centroids(e, "embedding", "vec_id", cents))
        assert "MapInPandas" in plan, plan[:1500]
        assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
        assert_only_subscan_roundrobin(plan)
