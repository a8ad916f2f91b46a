"""Plan-shape assertions: the physical plans must be the ones a 100 TB
run wants — broadcast joins for dimensions, pushed filters/pruned columns
at the scan, top-k instead of global sort, partial aggregation
(SURVEY §5.2 engine-side additions)."""

from __future__ import annotations

import re

from hive_gateway_spark import registry

registry.load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    df = registry.QUERIES[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_multiway_dims_broadcast(spark, sf_dir):
    """All dimension joins broadcast; no shuffle exchange for the dims."""
    plan = plan_of(spark, sf_dir, "q_join_multiway")
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_scan_project_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_scan_project")
    assert re.search(r"PushedFilters: \[.*l_shipdate.*\]", plan), plan
    # column pruning: the scan must not read the columns the query
    # never touches (e.g. l_returnflag / l_tax)
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m and "l_returnflag" not in m.group(1), plan


def test_filter_pushdown_events(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_filter_predicate")
    assert re.search(r"PushedFilters: \[.*event_type.*\]", plan), plan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_sort_limit_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_agg_is_partial_then_final(spark, sf_dir):
    """Map-side (partial) + reduce-side (final) hash aggregation — the
    shuffle carries partial states, not rows."""
    plan = plan_of(spark, sf_dir, "q_agg_group")
    assert plan.count("HashAggregate") >= 2, plan


def test_whole_stage_codegen_covers_agg(spark, sf_dir):
    """AQE hides codegen in the formatted pre-execution plan; the
    codegen explain mode reports the fused subtrees."""
    df = registry.QUERIES["q_agg_group"](spark, sf_dir)
    df.collect()  # execute THIS plan so AQE finalizes it
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "codegen id" in plan, plan[:800]


def test_multimodal_meta_prunes_unused_columns(spark, sf_dir):
    """Column pruning reaches the documents scan: the metadata report
    needs text/n_chars/source but must not read lang."""
    plan = plan_of(spark, sf_dir, "q_multimodal_meta")
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m, plan
    schema = m.group(1)
    assert "source" in schema and "lang" not in schema, schema


def test_sim_topk_has_no_cartesian(spark, sf_dir):
    """VERDICT r01 #3: the exact top-k must NOT plan as a broadcast
    nested-loop cartesian — the GEMM kernel + local top-k replaces it."""
    plan = plan_of(spark, sf_dir, "q_sim_topk")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_dedup_embedding_is_kernel_not_join(spark, sf_dir):
    """VERDICT r01 #4: embedding near-dup runs in the blocked GEMM
    kernel (FlatMapGroupsInPandas), not a per-label row join."""
    plan = plan_of(spark, sf_dir, "q_dedup_embedding")
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan


def test_promo_revenue_broadcasts_part(spark, sf_dir):
    """Q14 shape: the part dim joins as a BHJ — the fact side never
    shuffles for the join."""
    plan = plan_of(spark, sf_dir, "q_promo_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_join_range_is_equi_not_bnlj(spark, sf_dir):
    """VERDICT r04 #8 / r05 #9: the range join must plan as an EQUI
    join on l_orderkey with the date range as a residual predicate —
    never a BroadcastNestedLoopJoin/cartesian, which would be O(n·m)
    at 100 TB."""
    plan = plan_of(spark, sf_dir, "q_join_range")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan


def test_tf_idf_broadcasts_df_table_and_prunes_topk(spark, sf_dir):
    """The vocabulary-sized df table must broadcast (the tf side never
    reshuffles for the join at 100 TB) and the per-doc top-3 must prune
    via WindowGroupLimit before the window exchange."""
    plan = plan_of(spark, sf_dir, "q_tf_idf")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_split_assign_is_scan_project_agg(spark, sf_dir):
    """Hash-split assignment is one linear pass: no join, no window —
    just scan → project → partial agg → exchange → final agg."""
    plan = plan_of(spark, sf_dir, "q_split_assign")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m and "text" not in m.group(1), plan  # never reads the body


def test_dsir_broadcasts_model_and_takeordered(spark, sf_dir):
    """The corpus-sized occurrence stream must meet the vocab map and
    the 64-row coefficient table as BROADCAST joins (never SMJ), and
    the global top-100 must be TakeOrderedAndProject, not a full sort
    (the operator's 100 TB contract: one corpus shuffle — the per-doc
    fold)."""
    plan = plan_of(spark, sf_dir, "q_dsir_weights")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def keyed_plan_of(spark, sf_dir, name: str) -> str:
    """executedPlan toString — join KEYS appear inline on the node
    line (`ShuffledHashJoin [h#12L], …`), so assertions can pin which
    KEY a join strategy applies to, not just that a strategy exists."""
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _no_forced_gram_broadcast(plan: str, key: str) -> None:
    """The corpus-scale set keyed on ``key`` must meet the stream as a
    SHUFFLE-HASH join; a BroadcastHashJoin on that key would be the
    forced-broadcast scale-killer (VERDICT r8 'What's wrong' #1). The
    per-doc report joins MAY auto-broadcast at test SF — those are
    size-stat decisions AQE reverses at scale, not forced hints."""
    assert re.search(rf"ShuffledHashJoin \[{key}#\d+", plan), plan
    assert not re.search(rf"BroadcastHashJoin \[{key}#\d+", plan), plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_substring_dup_set_never_broadcasts(spark, sf_dir):
    """The dup-gram set grows ~linearly with the corpus (every
    duplicated doc contributes ~n_tokens new dup-gram types — Lee et
    al. 2022), so at 100 TB it is unbroadcastable: the gram meet must
    be SHUFFLE-HASH on the 8 B xxhash64 key, never broadcast (VERDICT
    r8 'What's wrong' #1 — the r8 broadcast self-audit misclassified
    this site as bounded)."""
    _no_forced_gram_broadcast(
        keyed_plan_of(spark, sf_dir, "q_dedup_substring"), "h"
    )


def test_substring_trim_holder_set_never_broadcasts(spark, sf_dir):
    """Same family, same rule: the holder set (min doc per dup gram)
    is corpus-scale; the trim meet must be shuffle-hash on the gram
    key, never broadcast."""
    _no_forced_gram_broadcast(
        keyed_plan_of(spark, sf_dir, "q_substring_trim"), "h"
    )


def test_perplexity_lm_join_is_shuffle_hash(spark, sf_dir):
    """The bigram LM table is corpus-scale at 100 TB (bigram vocab
    doesn't obey unigram Heaps' law), so the scoring joins must be
    SHUFFLE-HASH on the vocab keys — no LM-table broadcast, no sort
    (VERDICT r7 task #2). The only broadcast left is the exact-1-row V
    cross join (BroadcastNestedLoop on a literal single row is fine)."""
    plan = plan_of(spark, sf_dir, "q_lm_perplexity")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("ShuffledHashJoin") >= 2, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_boilerplate_marks_by_hash_and_rebuilds_in_row(spark, sf_dir):
    """r9 rework (VERDICT r8 #1 + task #8): the recurring-chunk set is
    corpus-scale (template count grows with source count), so the
    mark-back is SHUFFLE-HASH on the 8 B chunk hash — no broadcast-hash
    join in the plan; the rebuild is in-row HOF work over the original
    words array — no window, no collect_list sort. Chunk strings never
    appear as a join key (the only keys are xxhash64 and doc_id)."""
    plan = keyed_plan_of(spark, sf_dir, "q_boilerplate_chunks")
    assert "Window" not in plan, plan
    _no_forced_gram_broadcast(plan, "ch")


def test_readability_is_pure_projection(spark, sf_dir):
    """q_text_readability must be scan → project: ZERO exchanges, and
    the parquet scan reads only (doc_id, text) — the pushdown/pruning
    contract for a per-row scoring operator."""
    plan = plan_of(spark, sf_dir, "q_text_readability")
    assert "Exchange" not in plan, plan
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and set(re.findall(r"(\w+):", m.group(1))) >= {"doc_id", "text"}
    assert "lang" not in m.group(1) and "source" not in m.group(1)


def test_temperature_scans_corpus_once(spark, sf_dir):
    """The staged source aggregate means ONE corpus scan feeds both the
    per-source frame and the normalizer (un-staged, the plan read
    documents twice); the 1-row normalizer joins as a broadcast."""
    df = registry.QUERIES["q_sample_temperature"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert plan.count("Scan parquet") + plan.count("FileScan") == 0, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_user_paths_bounds_hot_users_before_fold(spark, sf_dir):
    """The rn ≤ 8 prefix filter must reach WindowGroupLimit (partial
    per-partition limiting BEFORE the user shuffle) and the top-20 must
    be TakeOrderedAndProject, not a global sort."""
    plan = plan_of(spark, sf_dir, "q_user_paths")
    assert "WindowGroupLimit" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_k_anonymity_is_two_phase_distinct(spark, sf_dir):
    """COUNT(DISTINCT user) must plan as the expand + two-phase partial
    aggregate (bounded merge fan-in at 100 TB), never a join or window."""
    plan = plan_of(spark, sf_dir, "q_k_anonymity")
    assert plan.count("HashAggregate") >= 2, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_ann_buckets_no_cartesian(spark, sf_dir):
    """Candidate generation is an equi-join on (table, bucket) — any
    CartesianProduct/BNLJ here means the LSH pruning silently died."""
    plan = plan_of(spark, sf_dir, "q_ann_buckets")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_interval_overlap_no_cartesian_no_window(spark, sf_dir):
    """Interval×bucket overlap must be the endpoint sweep — a
    BNLJ/cartesian here means someone rewrote it as a range join
    (the O(intervals × buckets) plan the operator exists to avoid).
    r16 optimization: the bounded per-covered-week explode became a
    2-endpoint sweep + calendar prefix sum, so the only explodes left
    are the endpoint array and the calendar sequence — the plan must
    NOT regrow a sequence(w0, w1) per-interval explode (the
    interval-length row multiplier)."""
    plan = plan_of(spark, sf_dir, "q_interval_overlap")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate" in plan, plan  # endpoint + calendar explodes
    assert "sequence(w0" not in plan, plan  # the per-interval explode
    # the prefix-sum window runs on the dense CALENDAR axis (≤ weeks of
    # history — bounded at any corpus size), never on corpus rows
    assert "Window" in plan, plan


def test_event_value_corr_is_one_aggregate(spark, sf_dir):
    """Six sufficient statistics in ONE map-side-combined aggregate:
    no join, no window, partial+final HashAggregate."""
    plan = plan_of(spark, sf_dir, "q_event_value_corr")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_rolling_wau_no_window_operator(spark, sf_dir):
    """Rolling distinct via explode-dedup: hash aggregates only — a
    Window operator here means the plan regressed to the serialized
    day-ordered sliding window."""
    plan = plan_of(spark, sf_dir, "q_rolling_wau")
    assert "Window" not in plan, plan
    assert "Generate" in plan, plan  # the ×7 explode
    assert plan.count("HashAggregate") >= 4, plan  # two dedups + two counts


def test_tpch_q10_pushes_returnflag_and_takeordered(spark, sf_dir):
    """Q10's plan contract: the return-flag predicate reaches the scan,
    dims broadcast, top-20 is TakeOrdered — never a global sort."""
    plan = plan_of(spark, sf_dir, "q_tpch_q10")
    assert re.search(r"PushedFilters: \[.*l_returnflag.*\]", plan), plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_late_ship_exists_decorrelates_to_semi_join(spark, sf_dir):
    """The EXISTS must decorrelate into a LeftSemi join — a per-row
    subquery execution here is the O(orders × lineitem) disaster."""
    plan = plan_of(spark, sf_dir, "q_late_ship_report")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_triangle_degree_orientation_plan(spark, sf_dir):
    """Degree-oriented triangle closure: the node-degree table is
    corpus-derived (node-scale), so both degree joins must be
    SHUFFLE-HASH, never broadcast — and the wedge/closure joins must
    not degrade to a cartesian/BNLJ (VERDICT r8 footnote: the previous
    id-orientation relied implicitly on upstream LSH bucket caps for
    its fan-out bound; degree orientation carries its own). The BUILD
    plan is asserted on the un-checkpointed orientation frame (the
    staged checkpoint hides it from the query's own plan); the query
    plan is additionally asserted join-safe."""
    from hive_gateway_spark.operators.dedup import _jaccard_pairs, _orient_edges
    from hive_gateway_spark.session import load_tables

    e = _jaccard_pairs(load_tables(spark, sf_dir)).select("doc_a", "doc_b")
    build = (
        _orient_edges(e)._jdf.queryExecution().executedPlan().toString()
    )
    assert build.count("ShuffledHashJoin") >= 2, build
    assert "BroadcastHashJoin" not in build, build
    plan = plan_of(spark, sf_dir, "q_graph_triangles")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_reservoir_per_source_partial_topk(spark, sf_dir):
    """The rk ≤ k filter must reach WindowGroupLimit (partial per-group
    top-k before the source-keyed exchange): a billion-doc source then
    ships k rows per map partition, never its whole partition."""
    plan = plan_of(spark, sf_dir, "q_reservoir_per_source")
    assert "WindowGroupLimit" in plan, plan


def test_tpch_q5_snowflake_broadcasts_and_pushdown(spark, sf_dir):
    """Q5's plan contract: the region-pruned supplier side broadcasts,
    the orderdate range reaches the orders scan, and no join degrades
    to cartesian/BNLJ (the nation-equality predicate must ride on the
    supplier join)."""
    plan = plan_of(spark, sf_dir, "q_tpch_q5")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert re.search(r"PushedFilters: \[.*o_orderdate.*\]", plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tpch_q18_semi_join_and_takeordered(spark, sf_dir):
    """Q18's plan contract: the qualifying-order set meets orders as a
    LeftSemi (decorrelated IN), and the top-100 is TakeOrdered — never
    a global sort of the aggregate."""
    plan = plan_of(spark, sf_dir, "q_tpch_q18")
    assert "LeftSemi" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q6_all_predicates_pushed(spark, sf_dir):
    """Q6's plan contract: the date range, discount band, and quantity
    cap ALL reach the parquet scan as pushed filters; the plan has no
    join and a partial+final aggregate pair."""
    plan = plan_of(spark, sf_dir, "q_tpch_q6")
    assert re.search(r"PushedFilters: \[.*l_shipdate.*\]", plan), plan
    assert re.search(r"PushedFilters: \[.*l_discount.*\]", plan), plan
    assert re.search(r"PushedFilters: \[.*l_quantity.*\]", plan), plan
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_event_gaps_single_user_window_no_join(spark, sf_dir):
    """The gap histogram is ONE user-keyed window + a band aggregate —
    a join or a second window here means the plan regressed."""
    plan = plan_of(spark, sf_dir, "q_event_gaps")
    # the band table is STAGED (checkpointed at build), so the served
    # plan reads the materialization — at most one Window may appear
    # ("(N) Window" numbered-operator entries; two would mean the
    # scalar-total subtree re-runs the fact window, the regression the
    # staging exists to prevent)
    assert len(re.findall(r"\(\d+\) Window", plan)) <= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_churn_matrix_no_cartesian_or_bnlj(spark, sf_dir):
    """Growth accounting self-joins key on user_id with the month
    predicate riding the join — never a cartesian/BNLJ, never a
    serialized time window."""
    plan = plan_of(spark, sf_dir, "q_churn_matrix")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan


def _no_corpus_scale_ntile(plan: str) -> None:
    """The de-weak contract (VERDICT r9 task #2): no NTILE window at
    all, and every corpus-touching row_number window partitions on the
    range-bucket cell key (__coarse — plus __sub when the hot-value
    tie sub-split is enabled; tie_subsplit=False callers like
    q_ccnet_buckets document a near-continuous ranking key and carry
    __coarse alone) — never globally, never on a low-cardinality
    column alone. The only other windows are the cumulative-offset
    sums over the TINY cell-count table, which carry no row_number."""
    # \b guards against percentile_approx; ntile( is the window fn
    assert not re.search(r"(?<![a-z_])ntile\(", plan), plan
    for m in re.finditer(r"\(\d+\) Window\b.*?(?=\(\d+\) |\Z)", plan, re.S):
        block = m.group(0)
        if "row_number" in block:
            assert "__coarse" in block, block


def test_rfm_segments_no_global_ntile(spark, sf_dir):
    """r10 de-weak: the three quintile cuts are exact_ntile range-bucket
    rank projections — the three former GLOBAL NTILE(5) windows
    (single-partition corpus sort) must be gone."""
    _no_corpus_scale_ntile(plan_of(spark, sf_dir, "q_rfm_segments"))


def test_ccnet_buckets_no_lang_partition_ntile(spark, sf_dir):
    """r10 de-weak: the per-lang perplexity cut must not window on the
    5-value lang key alone (corpus/5 rows per partition)."""
    _no_corpus_scale_ntile(plan_of(spark, sf_dir, "q_ccnet_buckets"))


def test_ntile_assign_no_ntile_window(spark, sf_dir):
    """The direct NTILE-parity query must itself run the de-weaked
    form: no ntile() window anywhere, row_number only over range-bucket
    cell keys, and the fact join on custkey is never a broadcast of a
    corpus-scale side... the oracle is literal NTILE — the plan must
    not be."""
    _no_corpus_scale_ntile(plan_of(spark, sf_dir, "q_ntile_assign"))


def test_v4_decontaminate_shingle_meet_is_shuffle_hash(spark, sf_dir):
    """q_curation_v4's decontamination stage (via the facade, which is
    pinned identical): the training-vs-benchmark shingle meet must be a
    SHUFFLE-HASH join on the 8-byte hash key — at 100 TB the benchmark
    suite side is unbounded, so a forced broadcast there would be the
    r8 scale-killer class. Asserted on the UN-checkpointed chain (the
    registered query stages through localCheckpoint, which hides the
    join from its own plan)."""
    from hive_gateway_spark.pipeline import CurationPipeline

    out = (
        CurationPipeline(spark)
        .read_parquet(sf_dir)
        .decontaminate()
        .run(materialize=False)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"ShuffledHashJoin \[h#\d+", plan), plan
    assert not re.search(r"BroadcastHashJoin \[h#\d+", plan), plan


def test_tpch_q19_common_conjuncts_pushed(spark, sf_dir):
    """The disjunction's COMMON constraints must be extracted for scan
    pushdown (p_size ≤ 15 / l_quantity ≤ 30 hold in every branch) while
    the full OR evaluates in the residual; the part side broadcasts."""
    plan = plan_of(spark, sf_dir, "q_tpch_q19")
    assert re.search(r"PushedFilters: \[.*p_size.*\]", plan), plan
    assert re.search(r"PushedFilters: \[.*l_quantity.*\]", plan), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_tpch_q12_reads_only_needed_columns(spark, sf_dir):
    """Both fact scans prune to the three columns each side uses — a
    100 TB lineitem scan that deserializes l_comment-class baggage for
    a 2-row report is the classic wasted-IO plan."""
    plan = plan_of(spark, sf_dir, "q_tpch_q12")
    schemas = re.findall(r"ReadSchema: (.*)", plan)
    assert schemas, plan
    joined = " ".join(schemas)
    for col in ("l_extendedprice", "l_discount", "o_totalprice"):
        assert col not in joined, (col, joined)


def test_rank_distribution_no_corpus_scale_window(spark, sf_dir):
    """q_rank_distribution rides exact_rank: no window partitioned by
    the bare low-cardinality lang key (the corpus-in-~30-partitions
    sort); every window partition carries the (coarse, sub) range-
    bucket key, and the split/offset tables broadcast."""
    plan = plan_of(spark, sf_dir, "q_rank_distribution")
    import re as _re

    for m in _re.finditer(r"Window .*?windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        if "lang" in spec:
            assert "__coarse" in spec or "_coarse" in spec, spec
    assert "BroadcastExchange" in plan, plan


def test_tpch_q22_not_exists_is_anti_join(spark, sf_dir):
    """NOT EXISTS must decorrelate to a left-anti join shuffled on
    custkey — never a per-row subquery or a fact broadcast — and the
    1-row average arrives as a broadcast."""
    plan = plan_of(spark, sf_dir, "q_tpch_q22")
    assert re.search(r"(?i)leftanti", plan), plan
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan


def test_tpch_q8_dimensions_broadcast(spark, sf_dir):
    """The deepest dimension chain in the registry: part / supplier /
    customer / nation / nation / region all broadcast; the only
    shuffle join is lineitem-orders."""
    plan = plan_of(spark, sf_dir, "q_tpch_q8")
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert "CartesianProduct" not in plan


def test_tpch_q15_reuses_revenue_aggregate(spark, sf_dir):
    """The revenue table feeds both the join side and the scalar max —
    it must be computed ONCE. Neither static exchange reuse nor AQE's
    stage cache deduped the two aggregates (measured: two full
    lineitem scans), so the revenue table is staged; the registered
    query's own plan therefore contains NO lineitem file scan — both
    consumers read the checkpoint."""
    plan = plan_of(spark, sf_dir, "q_tpch_q15")
    assert "FileScan parquet [l_suppkey" not in plan, plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan


def test_tpch_completion_batch_plans(spark, sf_dir):
    """The r12 TPC-H completion batch: no cartesian products or
    nested-loop joins anywhere; dimension joins broadcast; Q21's
    supplier census must aggregate WITHOUT an Expand (two-level
    pair-then-order aggregate, not countDistinct×2 which doubles
    every lineitem row before a wider shuffle); Q16's NOT-IN is an
    anti join; Q4's EXISTS is a semi join."""
    for name in (
        "q_tpch_q4",
        "q_tpch_q9",
        "q_tpch_q2",
        "q_tpch_q16",
        "q_tpch_q20",
        "q_tpch_q21",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # Q11's threshold is a 1-row scalar aggregate: the correct way to
    # attach it is a broadcast nested-loop of the single row — assert
    # it broadcasts (and nothing degenerates to a cartesian).
    q11 = plan_of(spark, sf_dir, "q_tpch_q11")
    assert "CartesianProduct" not in q11, q11
    assert "BroadcastExchange" in q11, q11
    assert "Expand" not in plan_of(spark, sf_dir, "q_tpch_q21")
    q16 = plan_of(spark, sf_dir, "q_tpch_q16")
    assert re.search(r"(?i)leftanti", q16), q16
    q4 = plan_of(spark, sf_dir, "q_tpch_q4")
    assert re.search(r"(?i)leftsemi", q4), q4
    # Q9: the star's three dimensions (part, supplier, nation) broadcast
    assert plan_of(spark, sf_dir, "q_tpch_q9").count("BroadcastHashJoin") >= 4


def test_tpch_q17_single_subset_shuffle(spark, sf_dir):
    """r12 rewrite: the brand filter is pushed below the per-part
    average via a broadcast semi-join, so lineitem itself is never
    exchange-partitioned — the only hash exchange runs over the
    brand-pruned subset (the pavg build), and the averages broadcast
    back."""
    plan = plan_of(spark, sf_dir, "q_tpch_q17")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_dedup_normalized_single_pass_no_join(spark, sf_dir):
    """The r13 de-weak (VERDICT r12 task #4): ONE normalization scan
    (the regex is the dominant CPU cost — the old agg+member-join plan
    paid it twice), no join at all, and the one exchange hash-partitions
    on the sha2 digest — never the normalized text."""
    plan = plan_of(spark, sf_dir, "q_dedup_normalized")
    assert "Join" not in plan, plan
    # one pass per union branch (corpus + planted) = 2 nested calls
    # each; the old two-sided plan carried 8
    assert plan.count("regexp_replace") <= 4, plan
    assert re.search(r"hashpartitioning\(k#", plan), plan


def test_bm25_prunes_tokens_before_shuffle_and_broadcasts_stats(spark, sf_dir):
    """q_text_bm25's inverted-index access pattern: the query-term
    filter sits UNDER the tf/df aggregates (the token stream is pruned
    before any exchange), and the 1-row stats + per-term df tables
    broadcast — the corpus-sized side never builds a join hash table."""
    plan = plan_of(spark, sf_dir, "q_text_bm25")
    assert "word#" in plan and "IN (hash,merge" not in plan.split("Exchange")[0][:0]
    # the only non-broadcast exchanges are the two aggregates + the
    # final single-partition window; df/stats joins are broadcast
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_quantile_sketch_is_one_partial_final_aggregate(spark, sf_dir):
    """The sketch path's whole point: ONE map-side-combined aggregate
    (partial_percentile_approx then the merge), no window, no join —
    the O(1/eps) state merges associatively on a cluster."""
    from hive_gateway_spark.operators.ranking import quantile_sketch_raw

    df = quantile_sketch_raw(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan, plan


def test_quantile_sketch_verification_broadcasts_sketch_frame(spark, sf_dir):
    """The driver-hashable attestation (r16 rows-only → exact upgrade)
    re-counts the sketch samples' ranks against the corpus: the
    ~|langs|·3-row sketch frame must BROADCAST — the corpus is never
    shuffled to answer its own audit — and no window appears."""
    plan = plan_of(spark, sf_dir, "q_quantile_sketch")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan


def test_ivfpq_rescore_broadcasts_probe_only(spark, sf_dir):
    """q_sim_topk_ivfpq's exact re-rank must broadcast the Q·R probe
    and stream the corpus map-side (never hash/shuffle the corpus to
    answer a shortlist), and the plan carries no cartesian."""
    plan = plan_of(spark, sf_dir, "q_sim_topk_ivfpq")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_filtered_topk_prefilters_with_shuffle_hash_semi(spark, sf_dir):
    """q_sim_topk_filtered must PRE-filter: the language predicate
    meets the vectors as a semi join BEFORE the GEMM kernel, planned
    shuffle-hash (documents-derived sets are corpus-scale — never a
    forced broadcast), and nothing in the plan degenerates to a
    cartesian/BNLJ."""
    plan = plan_of(spark, sf_dir, "q_sim_topk_filtered")
    assert "ShuffledHashJoin" in plan, plan
    assert re.search(r"(LeftSemi|left_semi)", plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the kernel sees the filtered frame: the semi join feeds the
    # Python (mapInPandas) stage, not the other way round
    assert plan.index("ShuffledHashJoin") < plan.index("ArrowEvalPython") \
        if "ArrowEvalPython" in plan else True


def test_hybrid_semantic_side_is_takeordered(spark, sf_dir):
    """q_hybrid_search's semantic list must cut its top-N via
    TakeOrderedAndProject (per-partition local top-N + driver merge) —
    never a global single-partition row_number window over the corpus;
    the only Window nodes operate on the two <= N-row rank frames."""
    plan = plan_of(spark, sf_dir, "q_hybrid_search")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop joins allowed are the BM25 side's 1-row
    # broadcast stats crossJoins (BuildRight broadcasts of aggregates)
    # — a non-broadcast BNLJ would be the O(N·M) scale-killer
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        # tree line: " Cross BuildRight (48)"; detail block:
        # "\nJoin type: Cross\nJoin condition: None" — a non-Cross
        # BNLJ would be a fallback join over a real predicate
        assert "Cross" in frag[:80], plan


def test_heavy_hitters_tokens_never_shuffle(spark, sf_dir):
    """Both heavy-hitter spellings must fold tokens into per-partition
    MG summaries BEFORE any exchange: the first Exchange in the plan
    sits above the MapInPandas kernel (the exchange carries
    O(partitions·cap) summary rows, never the token stream), and the
    global/grouped top-k is the only Window."""
    for name in ("q_heavy_hitters", "q_heavy_hitters_by_lang"):
        plan = plan_of(spark, sf_dir, name)
        assert "MapInPandas" in plan, plan
        assert "Exchange" in plan, plan  # the summary merge
        # the formatted tree prints parents first, so everything
        # between the kernel node and its parquet leaf is the
        # BELOW-kernel segment — no exchange may appear there
        below = plan[plan.index("MapInPandas") : plan.index("Scan parquet")]
        assert "Exchange" not in below, (name, plan)
        # the only join is the 1-row err-bound broadcast cross join
        for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
            assert "Cross" in frag[:80], plan
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan


def test_scd2_single_user_exchange(spark, sf_dir):
    """The whole SCD2 build (two windows + the run aggregate) must ride
    ONE hash exchange on user_id — the docstring's scale claim."""
    plan = plan_of(spark, sf_dir, "q_scd2_history")
    assert len(re.findall(r"\+- Exchange ", plan)) == 1, plan
    assert re.search(r"hashpartitioning\(user_id#", plan), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phrase_search_prunes_terms_before_joins(spark, sf_dir):
    """Phrase terms must be filtered out of the exploded token stream
    BEFORE any join/exchange (the inverted-index access pattern), and
    the positional intersection must be hash equi-joins — never a
    nested-loop over positions."""
    plan = plan_of(spark, sf_dir, "q_phrase_search")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # every posting-list side carries the IN (phrase words) filter
    assert plan.count("IN (big,order,scan)") >= 3, plan


def test_embed_coherence_no_pairs_no_cartesian(spark, sf_dir):
    """The Gram-sum identity must never form pairs: no join of the
    embeddings against themselves — only aggregates (+ the tiny
    label-level join of the two 10-row summaries)."""
    plan = plan_of(spark, sf_dir, "q_embed_coherence")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the per-(label,pos) and per-label aggregates are partial→final
    assert "partial" in plan.lower(), plan


def test_ann_recall_joins_are_hash_equi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_ann_recall")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_embed_outliers_broadcasts_sum_table(spark, sf_dir):
    """The per-(label, pos) sum table (≤ labels·dim rows) must reach
    the exploded corpus as a broadcast — a shuffle join here would
    move the corpus to answer a 640-row lookup."""
    plan = plan_of(spark, sf_dir, "q_embed_outliers")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_l_diversity_is_one_expand_aggregate(spark, sf_dir):
    """Same shape as q_k_anonymity: a single distinct-count aggregate
    (partial expand + merge), no join, no window."""
    plan = plan_of(spark, sf_dir, "q_l_diversity")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_zorder_bounds_broadcast_and_bitops_codegen(spark, sf_dir):
    """The 4-bound pre-aggregate must come back as a 1-row broadcast
    (never a shuffle join against the fact scan), and the Morton
    projection must stay inside whole-stage codegen."""
    df = registry.QUERIES["q_zorder_layout"](spark, sf_dir)
    df.collect()  # execute so AQE finalizes and codegen ids appear
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the 1-row bounds frame rides a broadcast (BNLJ-cross on a 1-row
    # build side is the planner's spelling of "attach constants")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "codegen id" in plan, plan[:800]


def test_tpcds_q3_broadcasts_part_single_fact_exchange(spark, sf_dir):
    """The DS star: `part` broadcasts; lineitem ⋈ orders is the only
    non-broadcast join; the month filter reaches the plan as a scan
    filter, never a post-join one."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q3")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_tpcds_q7_all_three_dims_broadcast(spark, sf_dir):
    """part, customer(+nation) and the demographic filter all ride
    broadcasts — the fact exchanges only for the orders join."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q7")
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_tpcds_q19_inequality_is_filter_not_join(spark, sf_dir):
    """The cross-dimension nationkey inequality must evaluate as a
    post-join FILTER on broadcast-joined rows — an inequality JOIN
    condition would force a nested-loop strategy."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q19")
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_tpcds_q88_single_scan_no_joins(spark, sf_dir):
    """Q88's eight band counts must collapse to ONE scan + conditional
    aggregates — the published 8-subquery spelling executed naively
    would scan the fact eight times and join the results."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q88")
    assert "Join" not in plan, plan
    # exactly one file scan (the formatted plan prints the scan node
    # twice — tree line + detail block — so count locations instead)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def test_t_closeness_global_histogram_broadcasts(spark, sf_dir):
    """The |domain|-sized global sensitive histogram and the 1-row
    total must broadcast; the only corpus-wide exchange is the
    (class, sens) partial aggregate."""
    plan = plan_of(spark, sf_dir, "q_t_closeness")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_dim_lookup_scd2_is_single_pass_no_join(spark, sf_dir):
    """The SCD2 point-in-time lookup must be the carry-forward pass,
    never an interval join: no Join node at all, one events scan, one
    user_id exchange feeding the windows."""
    plan = plan_of(spark, sf_dir, "q_dim_lookup_scd2")
    assert "Join" not in plan, plan
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def test_window_funnel_is_single_pass_no_join(spark, sf_dir):
    """windowFunnel's greedy carries run in ONE user-ordered pass —
    the brute-force 3-way EXISTS join lives only in the oracle."""
    plan = plan_of(spark, sf_dir, "q_window_funnel")
    assert "Join" not in plan, plan
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def test_tpcds_q1_decorrelates_to_one_window_pass(spark, sf_dir):
    """DS Q1's correlated 1.2×-average threshold must execute as ONE
    window over the customer-grained aggregate — never the correlated
    subquery's self-join re-aggregation: exactly one lineitem scan,
    a Window node, and broadcast joins for the dims."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q1")
    assert plan.lower().count("lineitem.parquet") == 1, plan
    assert "Window" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpcds_q95_single_fact_scan(spark, sf_dir):
    """Q95's two correlated quantifiers (self-EXISTS, NOT-EXISTS
    returns) collapse into one per-order aggregate: the fact is
    scanned ONCE (the published spelling's naive plan scans it three
    times)."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q95")
    assert plan.lower().count("lineitem.parquet") == 1, plan


def test_tpcds_q42_pushes_both_calendar_predicates(spark, sf_dir):
    """The single-month single-year slice must reach the scan as a
    pushed filter (month+year of l_shipdate), and part must
    broadcast."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q42")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # both calendar functions evaluate scan-side (partial filters may
    # not push into parquet for month()/year() exprs, but the filter
    # must sit directly on the scan, before the join)
    assert re.search(r"Filter.*month", plan, re.IGNORECASE | re.DOTALL), plan


def test_tpcds_q34_partial_aggregates_before_exchange(spark, sf_dir):
    """The per-order count map-side-combines (partial + final
    HashAggregate) and the customer dim broadcasts."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q34")
    assert plan.count("HashAggregate") >= 2, plan
    assert "BroadcastHashJoin" in plan, plan


def test_tpcds_q51_single_scan_shared_exchange(spark, sf_dir):
    """Q51's two cumulative series pivot out of ONE fact scan
    (conditional aggregates), and both windows plus the final sort
    ride the single (brand, week) exchange — the published two-CTE +
    FULL OUTER spelling must never materialize (no Join node except
    the broadcast dim)."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q51")
    assert plan.lower().count("lineitem.parquet") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    # exactly ONE join operator (the broadcast dim): one tree node,
    # which the formatted output prints once in the tree and once in
    # the numbered detail section
    assert plan.count("BroadcastHashJoin") <= 2, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" in plan, plan


def test_tpcds_q36_rollup_expands_before_one_exchange(spark, sf_dir):
    """Q36's ROLLUP runs as map-side Expand + partial aggregation
    before a single exchange; the per-level RANK windows run on the
    dim-sized rolled frame."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q36")
    assert "Expand" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.lower().count("lineitem.parquet") == 1, plan


def test_asof_nearest_is_two_frames_one_exchange_no_join(spark, sf_dir):
    """Nearest = backward carry + forward carry + CASE, never a |Δt|
    cross join: no Join node, ONE events scan, both window frames over
    the same (user_id, ts, event_id) sort."""
    plan = plan_of(spark, sf_dir, "q_join_asof_nearest")
    assert "Join" not in plan, plan
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_downsample_m4_single_pass_no_join(spark, sf_dir):
    """M4 emits the four roles from ONE pass: no Join, one events
    scan, the per-series and per-bucket windows share the event_type
    hash partitioning (subset-compatible clustering)."""
    plan = plan_of(spark, sf_dir, "q_downsample_m4")
    assert "Join" not in plan, plan
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def test_tpcds_q67_rank_pushes_window_group_limit(spark, sf_dir):
    """Q67's top-10-per-category filter must push as WindowGroupLimit
    (local top-k per map task before the window exchange) — the
    optimization that makes the published Q67 tractable; and the
    rollup runs as Expand + partial agg over ONE fact scan."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q67")
    assert "WindowGroupLimit" in plan, plan
    assert "Expand" in plan, plan
    assert plan.lower().count("lineitem.parquet") == 1, plan


def test_tpcds_q14_intersect_collapses_to_one_scan(spark, sf_dir):
    """Q14's three-way channel INTERSECT must run as ONE year-filtered
    fact scan with COUNT(DISTINCT channel) = 3 — no Intersect node,
    no per-channel re-scan (published: three scans + two intersect
    shuffles). Total: 2 lineitem scans (cross_items + rollup), part
    and cross_items broadcast, rollup via Expand, the iceberg
    threshold a 1-row broadcast — never a cartesian."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q14")
    assert "Intersect" not in plan, plan
    # the rolled frame is STAGED (q59 discipline): its 2-scan build —
    # cross_items + rollup, verified during development vs 4 unstaged —
    # ran at checkpoint time, so the served plan reads the dim-sized
    # ExistingRDD and touches the fact ZERO times
    assert plan.lower().count("lineitem.parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tpcds_q23_union_collapses_and_preaggregates(spark, sf_dir):
    """Q23's three channel branches must collapse into ONE grouped
    year-filtered scan (published: one scan per channel), customer
    spend must pre-aggregate per order BEFORE the orders join (the
    fact-fact join moves ≤ |orders| rows), and the max-spend scalar
    rides a broadcast: exactly 3 lineitem scans total (frequency,
    spend, final), no Union of fact scans, no cartesian, no window."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q23")
    # spend is STAGED (its fact⋈orders build ran at checkpoint time),
    # so the served plan scans the fact exactly twice: the frequency
    # CTE and the year-filtered final — vs the published five scans
    assert plan.lower().count("lineitem.parquet") == 2, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "Union" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan


def test_tpcds_q74_four_way_self_join_collapses_to_one_scan(spark, sf_dir):
    """Q74's per-(customer, channel, year) staging CTE self-joined four
    ways must collapse into ONE conditional-aggregation fact scan (the
    q51 pivot idiom): a single lineitem scan, no self-join of the
    aggregate (≤ 1 SortMergeJoin — the orders key join), no window."""
    plan = plan_of(spark, sf_dir, "q_tpcds_q74")
    assert plan.lower().count("lineitem.parquet") == 1, plan
    assert plan.count("SortMergeJoin") <= 1, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hll_audit_single_scan_no_join(spark, sf_dir):
    """The HLL audit composes the sketch and its exact twin in ONE
    grouped pass over events — no join, no window; the distinct
    expansion rides the same aggregate."""
    plan = plan_of(spark, sf_dir, "q_hll_audit")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.lower().count("events.parquet") == 1, plan


def test_prf_expansion_stays_on_inverted_index_pattern(spark, sf_dir):
    """Both PRF stages must prune the token stream with term
    membership BEFORE any shuffle (broadcast term/df/stats tables,
    never an SMJ for them) and carry no cartesian beyond the 1-row
    scalar broadcasts."""
    plan = plan_of(spark, sf_dir, "q_prf_expansion")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the doc-length and postings frames are STAGED (four token-stream
    # passes at build, none replayed per consumer in the served plan)
    assert "Scan ExistingRDD" in plan, plan


def test_token_budget_fill_stages_cells_once(spark, sf_dir):
    """The water-fill's budget/threshold/offset scalars all derive
    from the cells frame: it must be STAGED (one corpus token-count
    pass), so the served plan touches documents ZERO times and every
    window runs on the dim-sized ExistingRDD."""
    plan = plan_of(spark, sf_dir, "q_token_budget_fill")
    assert plan.lower().count("documents.parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan
