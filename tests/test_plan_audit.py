"""Physical-plan audits: the properties that keep these queries viable
at 100 TB, asserted so a refactor can't silently regress them
(SURVEY §4 — pushdown/pruning/broadcast are 'free' only while the plan
stays declarative).
"""

from __future__ import annotations

import re

import pytest

from ods_v3_dbt_spark.plans import declared_queries as DQ

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = DQ.registry()[name].spark(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushed_to_scan(spark):
    """Window/filter predicates must reach the parquet scan."""
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_ns_window_pushed_to_raw_column(spark):
    """The events window must push to the raw ns-long column (the
    monotone-rewrite in load_events_windowed), not stop at the
    timestamp_micros conversion."""
    plan = _plan(spark, "count_window_probe")
    assert "GreaterThanOrEqual(ts," in plan and "LessThan(ts," in plan


def test_column_pruning(spark):
    """A 2-col aggregation must not read the full 16-col lineitem."""
    plan = _plan(spark, "count_window_probe")
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # events has 8+ columns; the count probe must scan only the cursor
    assert read_schema.count(",") == 0 and "ts" in read_schema


def test_dim_join_broadcasts(spark):
    """J1-style fact⋈dim joins must broadcast the dim, not shuffle the
    fact (revenue query: customer/nation dims)."""
    plan = _plan(spark, "revenue_by_customer")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims are all broadcast-sized here


def test_merge_is_single_shuffle(spark):
    """M3 freshness merge = one window over the union: exactly one
    hash exchange on the merge key, no join shuffles."""
    from ods_v3_dbt_spark.operators.merge import merge_upsert_fresh

    tgt = spark.createDataFrame(
        [(1, "a", 10.0)], "k int, v string, ts double"
    )
    src = spark.createDataFrame(
        [(1, "b", 11.0), (2, "c", 5.0)], "k int, v string, ts double"
    )
    merged = merge_upsert_fresh(tgt, src, ["k"], "ts", tie_update=False)
    plan = merged._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # window-over-union, not join-based


def test_partial_aggregation(spark):
    """groupBy aggregates must map-side combine (partial_ functions
    before the Exchange) — the difference between shuffling rows and
    shuffling partial states at 100 TB."""
    plan = _plan(spark, "pricing_summary")
    assert "partial_sum" in plan


def test_whole_stage_codegen_text(spark):
    """Text analytics stay JVM-side: no BatchEvalPython (row-at-a-time
    Python) anywhere in the scan→project pipeline."""
    for name in ("text_stats", "token_bpe_counts", "doc_fingerprint"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_topk_window_group_limit(spark):
    """rn<=k must compile to WindowGroupLimit: each map task keeps only
    k rows per group BEFORE the shuffle — at 100 TB this is the
    difference between shuffling k rows/user and the whole fact."""
    df = DQ.registry()["top_events_per_user"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1


def test_sharded_packing_has_no_global_sort(spark):
    """The per-shard packing/budget windows must plan a
    hash-partitioned exchange (num_shards-way parallel sort) — never
    the SinglePartition exchange a global Window.orderBy emits, which
    is the round-2 verdict's single-sort bottleneck. The unsharded
    originals keep their documented global sort; these are the scale
    twins."""
    for name in ("sequence_packing_sharded", "token_budget_sharded"):
        plan = _plan(spark, name)
        assert "SinglePartition" not in plan, name
        assert re.search(r"hashpartitioning\(shard", plan), name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_curate_corpus_packing_is_sharded(spark):
    """The end-to-end pipeline's packing stage must inherit the
    per-shard window — no SinglePartition exchange anywhere in the
    train DAG (the audit's scans are the pipeline's own)."""
    from ods_v3_dbt_spark.pipelines import curate_corpus

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ev = docs.filter("doc_id % 17 = 0")
    train, _, _ = curate_corpus(docs, ev)
    plan = train._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SinglePartition" not in plan
    assert re.search(r"hashpartitioning\(shard", plan)


def test_range_join_is_equi_join(spark):
    """The banded range join must compile to a hash equi-join on the
    bucket id — never BroadcastNestedLoopJoin or a cartesian product,
    which are what Spark emits for a raw inequality join and which are
    O(|A|·|B|) at scale."""
    for name in ("events_in_service_windows", "service_window_overlaps"):
        plan = _plan(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, name


def test_q5_dims_broadcast(spark):
    """Six-table Q5 shape: every dim join broadcasts; at most the
    orders⋈lineitem fact join shuffles."""
    plan = _plan(spark, "regional_supplier_volume")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1


def test_shared_window_spec_single_exchange(spark):
    """running sum + lag + row_number over the SAME partition/order
    must plan one exchange + one sort, not one per function."""
    df = DQ.registry()["running_customer_revenue"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert plan.count("Sort ") <= 1


def test_hash_split_and_unpivot_no_shuffle(spark):
    """Deterministic split/sample assignments and the stack-based
    unpivot are pure per-row maps — any Exchange here would be a
    100 TB-sized accident."""
    for name in ("train_test_hash_split", "stratified_sample_docs",
                 "unpivot_lineitem_measures"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name


def test_vocab_topk_no_global_sort(spark):
    """Top-k must be TakeOrderedAndProject (per-partition heaps),
    never a global sort of the full vocabulary."""
    df = DQ.registry()["token_vocab_topk"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_smallqty_broadcasts_part_dim(spark):
    """Q17 shape: the brand-filtered part dim must broadcast into the
    fact scan so the per-part aggregate runs over the brand slice."""
    plan = _plan(spark, "smallqty_part_revenue")
    assert "BroadcastHashJoin" in plan


def test_cdc_apply_single_shuffle(spark):
    """apply_cdc must be one window shuffle over base∪changes — a
    join-based rewrite would shuffle both sides plus the join."""
    df = DQ.registry()["cdc_apply_orders"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_exists_decorrelates_to_semi_join(spark):
    """The Q4-shape EXISTS must plan as a LEFT SEMI equi-join with the
    correlated inequality as residual — no Distinct, no nested-loop
    re-execution per probe row."""
    plan = _plan(spark, "exists_late_orders")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Deduplicate" not in plan and "Distinct" not in plan


def test_top_supplier_single_fact_scan(spark):
    """Q15 shape: the scalar MAX is taken over the aggregated view, so
    lineitem must appear exactly once in the plan (naive correlated
    rewrite scans it twice)."""
    plan = _plan(spark, "top_supplier_revenue")
    assert plan.count("lineitem.parquet") == 1


def test_q21_decorrelation_single_fact_scan(spark):
    """Q21 shape: the EXISTS + NOT EXISTS pair is decorrelated into
    one per-order aggregate — lineitem must appear exactly once in
    the plan (the textbook plan self-joins it three times)."""
    plan = _plan(spark, "lonely_late_supplier")
    assert plan.count("lineitem.parquet") == 1


def test_q19_single_scan_disjunction(spark):
    """Q19 shape: OR-of-ANDs stays one equi-join with residual —
    one fact scan, hash join, no union-of-three-joins and no
    nested-loop fallback."""
    plan = _plan(spark, "disjunctive_part_revenue")
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q11_single_fact_scan(spark):
    """Q11 shape: the global total is a window over the aggregated
    view — one lineitem scan, not one per comparison side."""
    plan = _plan(spark, "part_value_share")
    assert plan.count("lineitem.parquet") == 1


def test_funnel_chained_windows_share_exchange(spark):
    """The three stage-MIN windows partition by the same key, so the
    whole funnel must need only the user exchange plus the final
    distinct-count aggregation — no per-stage self-join (events must
    appear once) and no per-stage re-shuffle."""
    plan = _plan(spark, "funnel_view_click_purchase")
    assert plan.count("events.parquet") == 1
    df = DQ.registry()["funnel_view_click_purchase"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange hashpartitioning") <= 2
    assert phys.count("Sort ") <= 1


def test_linear_interp_single_sort(spark):
    """Both neighbor frames (backward last, forward first) share one
    partition+ordering — one exchange, one sort, no self-join."""
    df = DQ.registry()["linear_interp_event_values"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") == 1
    assert phys.count("Sort ") == 1
    assert "Join" not in phys


def test_mode_windows_aggregate_not_stream(spark):
    """Mode-per-user sorts the (user,type) aggregate, not the event
    stream: count-collapse first, then WindowGroupLimit on rn=1."""
    df = DQ.registry()["mode_event_type_per_user"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in phys


def test_q7_dims_broadcast(spark):
    """Q7 shape: customer/supplier/nation×2 broadcast; only the
    lineitem⋈orders fact join may shuffle."""
    plan = _plan(spark, "nation_pair_trade")
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1
    assert "CartesianProduct" not in plan


def test_snapshot_diff_single_join(spark):
    """The diff must be ONE full-outer join — not the 3-scan
    anti/anti/inner rewrite."""
    plan = _plan(spark, "snapshot_diff_orders")
    assert plan.count("SortMergeJoin FullOuter") == 1
    assert "LeftAnti" not in plan


def test_tfidf_topk_group_limit(spark):
    """Per-doc top-3 must hit WindowGroupLimit on the collapsed
    (doc,term) table."""
    df = DQ.registry()["tfidf_top_terms"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in phys


def test_bigram_pairing_stays_in_scan_stage(spark):
    """Bigrams are built by an array transform — no Window over an
    exploded token stream, no posexplode self-join."""
    df = DQ.registry()["bigram_collocations"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in phys
    assert "TakeOrderedAndProject" in phys


def test_topk_queries_use_heaps(spark):
    """Q3/Q10-shape top-k must be TakeOrderedAndProject (per-partition
    heaps), never a global sort of the aggregate."""
    for name in ("unshipped_order_revenue", "returned_item_customers"):
        df = DQ.registry()[name].spark(spark, SF)
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in phys, name


def test_q8_market_share_one_fact_pass(spark):
    """Q8 shape: the share is a conditional sum over ONE 7-table join
    pass — all dims broadcast, at most the lineitem⋈orders shuffle,
    one lineitem scan."""
    plan = _plan(spark, "nation_market_share")
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("BroadcastHashJoin") >= 5
    assert plan.count("SortMergeJoin") <= 1


def test_q20_semi_over_aggregate(spark):
    """Q20 shape: majority membership feeds a LEFT SEMI against the
    dim; the part total is a window on the aggregate, so lineitem is
    scanned once."""
    plan = _plan(spark, "dominant_part_suppliers")
    assert "LeftSemi" in plan
    assert plan.count("lineitem.parquet") == 1


def test_dq_rules_one_scan_per_table(spark):
    """N rules on a table must evaluate in ONE conditional-sum scan —
    adding a rule never adds a scan."""
    plan = _plan(spark, "dq_rule_violations")
    assert plan.count("orders.parquet") == 1
    assert plan.count("customer.parquet") == 1


def test_centroid_assign_jvm_side_group_limit(spark):
    """The IVF assignment kernel is integer lambdas in codegen (no
    Python eval) and the argmin is a WindowGroupLimit."""
    df = DQ.registry()["embedding_centroid_assign"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in phys
    assert "WindowGroupLimit" in phys


def test_grouping_sets_single_expand_pass(spark):
    """Custom GROUPING SETS must be one Expand over one scan — not
    two scans UNION ALLed."""
    plan = _plan(spark, "grouping_sets_event_stats")
    assert plan.count("events.parquet") == 1
    assert "Expand" in plan
    assert "Union" not in plan


def test_abc_single_fact_shuffle(spark):
    """Pareto classification windows run over the per-part aggregate:
    one lineitem scan, one hash shuffle for the agg."""
    plan = _plan(spark, "part_abc_classification")
    assert plan.count("lineitem.parquet") == 1


def test_rank_trio_single_sort(spark):
    """rank/dense_rank/row_number share one partition+order prefix —
    ONE exchange. Catalyst still emits a second Sort for the
    tiebreak-extended row_number spec (prefix-compatible, so it runs
    on already-partitioned nearly-sorted data, no re-shuffle) — pin
    that it never becomes a second exchange."""
    df = DQ.registry()["order_rank_trio"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange hashpartitioning") == 1
    assert phys.count("Sort ") <= 2


def test_bag_ops_no_row_identity_join(spark):
    """exceptAll/intersectAll must run as count-partial aggregates +
    generate — no join on row identity."""
    plan = _plan(spark, "order_lines_bag_ops")
    assert "Generate" in plan
    assert "SortMergeJoin" not in plan


def test_gap_stats_reuse_window_partitioning(spark):
    """The per-customer aggregate after the lag window shares the
    window's hash partitioning — one exchange total."""
    df = DQ.registry()["customer_order_gap_stats"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange hashpartitioning") == 1


def test_yoy_no_self_join(spark):
    """YoY must be conditional sums over ONE scan — no self-join."""
    plan = _plan(spark, "yoy_nation_revenue")
    assert plan.count("orders.parquet") == 1
    assert "SortMergeJoin" not in plan


def test_session_conversion_one_sort(spark):
    """Gap flag, session id, and the lag all share one user
    partitioning+ordering — one exchange+sort before the aggregates."""
    df = DQ.registry()["session_conversion_rate"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Sort ") <= 1
    assert phys.count("events.parquet") == 1


def test_multi_distinct_one_fact_pass(spark):
    """Three distinct aggregates must compile to one Expand over one
    fact scan — not a scan per distinct column."""
    plan = _plan(spark, "brand_distinct_buyers")
    assert plan.count("lineitem.parquet") == 1
    assert "Expand" in plan


def test_posexplode_no_shuffle(spark):
    """Positional explode is pure scan-stage Generate — any Exchange
    here would be an accident."""
    plan = _plan(spark, "token_positions_long")
    assert "Exchange" not in plan
    assert "Generate" in plan
    assert "Window" not in plan


def test_repetition_scores_zero_shuffle(spark):
    """Repetition scoring is all array lambdas — scan-only plan."""
    plan = _plan(spark, "doc_repetition_scores")
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode either — fully in-row


def test_chunking_zero_shuffle(spark):
    """Chunk explosion + array slicing happen inside the row — no
    shuffle, no window, no self-join."""
    plan = _plan(spark, "doc_chunking")
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_scd2_single_sort_spec(spark):
    """Both SCD-2 windows (lag change-points, lead intervals) must
    share one exchange+sort, not re-shuffle between phases."""
    df = DQ.registry()["scd2_user_event_history"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 2  # one physical sort, AQE may re-list it


def test_burst_dedup_single_exchange(spark):
    """All three windows + the head filter + the burst_n lead ride
    ONE (user, type) exchange — partitioning and sort survive the
    filter, so no re-shuffle and no third partitioning on burst_id."""
    df = DQ.registry()["event_burst_dedup"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange hashpartitioning") == 1


def test_hash_sample_group_limit(spark):
    """rn <= 10 must compile to WindowGroupLimit so map tasks forward
    ≤10 rows per source before the shuffle — never a full per-source
    sort at scale."""
    plan = _plan(spark, "per_source_hash_sample")
    assert "WindowGroupLimit" in plan


def test_shingle_overlap_reuses_distinct_exchange(spark):
    """Both self-join sides must probe the SAME distinct
    (source, shingle) exchange — the shingle stream is exploded and
    deduplicated once, not once per side. Exchange reuse is an AQE
    runtime decision, so assert on the executed plan."""
    df = DQ.registry()["source_shingle_overlap"].spark(spark, SF)
    df.collect()
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in phys


def test_trimmed_mean_one_fact_shuffle(spark):
    """Rank window, group-count window, and the surviving-rows
    aggregate all share the priority hash partitioning — one
    exchange of order rows total."""
    df = DQ.registry()["trimmed_mean_order_value"].spark(spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange hashpartitioning") == 1


def test_runtime_bloom_filter_injection(spark):
    """Catalyst's runtime bloom-filter join (semi-join reduction):
    with a selective build side, the optimizer injects a
    bloom_filter_agg on the dim and a might_contain filter on the
    fact scan side — the fact shuffle only carries rows that can
    match. Free at 100 TB (SURVEY §4 'built-in'), pinned here so a
    conf regression can't silently drop it. Thresholds are lowered
    only for this test; production relies on the defaults."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_returnflag")
            .count()
        )
        phys = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in phys.lower()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Round-2 additions
# ---------------------------------------------------------------------------


def test_domain_blocklist_zero_join_map_side(spark):
    """The blocklist gate is a scan-stage classifier + one partial
    aggregate — no join (the blocklist compiled to IN/ENDSWITH
    predicates), no second exchange."""
    plan = _plan(spark, "domain_blocklist_filter")
    assert "Join" not in plan
    assert plan.count(") Exchange") == 1


def test_ttr_single_token_shuffle(spark):
    """type_token_ratio: the (source, token) frequency aggregate and
    the per-source rollup must ride ONE token exchange + one source
    exchange — never a second pass over the corpus."""
    plan = _plan(spark, "type_token_ratio_by_source")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert plan.count(") Exchange") == 2


def test_band_stats_shares_signature_pipeline(spark):
    """minhash_band_stats: one doc_id shuffle (signatures), one
    (band_idx, band_key) shuffle (buckets), one band_idx shuffle
    (rollup) — and no join anywhere (diagnostics never pay the
    candidate join they predict)."""
    plan = _plan(spark, "minhash_band_stats")
    assert "Join" not in plan


def test_ivf_l2q_broadcast_probes_no_cartesian(spark):
    """Quantized IVF: query probes broadcast into the cell join; no
    nested-loop/cartesian product anywhere."""
    plan = _plan(spark, "embedding_ann_ivf")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_lsh_broadcast_bucket_join_single_topk_window(spark):
    """LSH ANN: bucket join broadcasts the query side; exactly one
    window (the per-query top-k) sorts the candidate set."""
    plan = _plan(spark, "embedding_ann_lsh")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan


def test_excel_coercion_zero_shuffle(spark):
    """The S10 coercion grid is pure scan-stage codegen — zero
    exchanges, one scan."""
    plan = _plan(spark, "excel_cell_coercion_grid")
    assert "Exchange" not in plan


def test_multimodal_meta_never_decodes(spark):
    """Metadata scan: JVM-only (no Python eval nodes) — the binary
    column may be read but no Arrow kernel runs."""
    plan = _plan(spark, "multimodal_meta")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_doc_len_histogram_map_side(spark):
    """Length histogram: one scan, one partial-agg exchange."""
    plan = _plan(spark, "doc_len_histogram_by_source")
    assert plan.count(") Exchange") == 1
    assert "Join" not in plan


def test_span_dedup_linear_no_cartesian(spark):
    """Duplicate-span removal must stay exact-dedup-shaped: span
    frequency via hash aggregation (map-side partials), the dup flag
    delivered by an equi-join on the span key — never a cartesian/
    nested-loop pair generator, never a global sort."""
    plan = _plan(spark, "duplicate_span_removal")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan  # map-side combine on span counts
    # final per-doc agg shuffles on doc_id
    assert re.search(r"hashpartitioning\(doc_id", plan)


def test_dsir_ratio_broadcasts_bounded_table(spark):
    """DSIR: the 256-bucket ratio table must BROADCAST into the
    gram probe (it is bounded regardless of corpus size); bucket
    counting must be map-side combined; no sort-merge join anywhere
    — the only corpus-sized exchange is the per-doc aggregation."""
    plan = _plan(spark, "dsir_importance_weights")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan
    assert re.search(r"hashpartitioning\(doc_id", plan)


def test_dedup_index_probe_corpus_side_bucketed_no_generate(spark):
    """The persisted-index probe (round-4 task 1): the corpus side
    must be BUCKETED FileScans of the precomputed index tables — no
    Exchange above them, no shingle regeneration. All Generates in
    the plan are the batch side's shingle explode."""
    plan = _plan(spark, "dedup_index_probe")
    # corpus shingles read in place from the bucketed table
    shingle_scan = next(
        b for b in plan.split("\n\n")
        if "Scan parquet" in b and "_shingles" in b and "ReadSchema" in b
    )
    assert "Bucketed: true" in shingle_scan
    assert "SelectedBucketsCount" in shingle_scan
    # the scan reads PRECOMPUTED (doc_id, sid) — proof the corpus is
    # never re-tokenized/re-shingled at probe time
    assert "ReadSchema: struct<doc_id:bigint,sid:bigint>" in shingle_scan
    # batch shingle explode is the plan's only Generate source; the
    # persisted batch shingle table appears at most twice textually
    # (intersection + sizes consumers of one InMemoryRelation)
    assert plan.count(") Generate") <= 2
    # no sort-merge machinery: fixture sides broadcast, corpus scans
    # carry their bucket layout
    assert "SortMergeJoin" not in plan


def test_multi_segment_probe_corpus_scans_stay_bucketed(spark):
    """Round-6 LSM criterion: with MULTIPLE live segments, the probe
    fans out into per-segment joins — and EVERY segment's corpus
    scan (shingles and sizes, for both flavors' probes) must still
    read its bucket layout in place. Audited with auto-broadcast
    off (the 100 TB shape): a scan the planner reports
    ``Bucketed: true`` satisfies the join's clustering without an
    Exchange; a union-then-join regression would instead shuffle
    the corpus side and the scans would report bucketing disabled.
    The returned plan also carries zero Generate — the corpus is
    never re-shingled no matter how many segments are live."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_append,
        dedup_index_write,
        neardup_probe,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} common tail tokens here") for i in range(20)],
        "doc_id long, text string",
    )
    idx = dedup_index_write(docs.filter(F.col("doc_id") < 10),
                            "t_seg_audit", num_buckets=2)
    dedup_index_append(idx, docs.filter(F.col("doc_id") >= 10))
    assert len(idx.resolve(spark).segments) == 2
    batch = spark.createDataFrame(
        [(99, "w3 x3 y3 z3 common tail tokens here")],
        "doc_id long, text string",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = neardup_probe(batch, idx, 500_000)
        plan = probe._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    blocks = plan.split("\n\n")
    for member in ("shingles", "sizes"):
        scans = [
            b for b in blocks
            if re.search(rf"Scan parquet \S*t_seg_audit__e\d+_{member}\b", b)
            and "ReadSchema" in b
        ]
        assert len(scans) == 2, (member, len(scans))  # one per segment
        for s in scans:
            assert "Bucketed: true" in s, (member, s)
    assert plan.count(") Generate") == 0
    # and the fan-out is semantically invisible: identical pairs to a
    # single-segment rebuild
    rebuilt = dedup_index_write(docs, "t_seg_audit_reb", num_buckets=2)
    a = {tuple(r) for r in probe.collect()}
    b = {tuple(r) for r in neardup_probe(batch, rebuilt, 500_000).collect()}
    assert a == b and a


def test_incremental_curation_plan_is_stage_truncated(spark):
    """The indexed decisions plan must stay shallow: round 3's inline
    composition carried 5,592 Exchange nodes; the checkpointed stage
    discipline keeps the returned plan under 10."""
    from ods_v3_dbt_spark.plans.planreport import plan_report

    df = DQ.registry()["incremental_curation_decisions"].spark(spark, SF)
    rep = plan_report(df)
    assert rep["exchanges"] <= 10, rep
    assert rep["generates"] == 0, rep  # every explode ran inside a stage


def test_semantic_curation_plan_is_stage_truncated(spark):
    """The round-7 semantic channel must not fatten the decisions
    plan: the IVF probe's corpus side is cell-pruned bucketed scans
    and the stage discipline checkpoints its verdict list like every
    other stage — same shallow budget as the text-only flavor, no
    Generate, no Python eval, no nested loop."""
    from ods_v3_dbt_spark.plans.planreport import plan_report

    df = DQ.registry()["incremental_curation_semantic_decisions"].spark(
        spark, SF
    )
    rep = plan_report(df)
    assert rep["exchanges"] <= 10, rep
    assert rep["generates"] == 0, rep
    assert rep["python_evals"] == 0, rep
    assert rep["nested_loop_joins"] == 0, rep


def test_pq_ivfadc_job_budget(spark):
    """Round-4 task 3 regression pin: the PQ/IVFADC operators were
    compile-bound multi-action chains (17 / 22 Spark jobs, 8-15 s at
    sf0.1). The collapsed shape — one explode into (vid, sub, sv)
    rows, per-row argmin against a single parsed codebook literal,
    fused seed collects — runs PQ in 3 actions and IVFADC in 4
    (seeds / Lloyd means / final; + the cell-Lloyd collect for
    IVFADC). AQE splits each action into a few stage-jobs; the
    budgets below bound that with headroom while failing loudly if a
    per-consumer recompute or extra materialization sneaks back in."""
    sc = spark.sparkContext
    # +1 each (round 13): similarity._scan_par_floor fans a narrow
    # single-file corpus scan out before the argmin-encode stages —
    # one deliberate extra exchange (= one AQE stage-job) at fixture
    # scale, a no-op on wide inputs; same-window A/B measured
    # embedding_ann_pq 4.8 → 2.7 s for that job
    budgets = {"embedding_ann_pq": 12, "embedding_ann_ivfadc": 16}
    for name, budget in budgets.items():
        group = f"jobbudget-{name}"
        sc.setJobGroup(group, "")
        try:
            DQ.registry()[name].spark(spark, SF).count()
        finally:
            sc.setJobGroup(None, None)
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        assert jobs <= budget, (name, jobs, budget)


def test_components_job_budget(spark):
    """Round-13 regression pin: connected_components fuses the
    fixed-point signature into each star round's checkpoint job via
    observe() — one action per round, not two. neardup_components at
    this fixture runs 29 jobs fused (35 with the separate per-round
    signature collect); the budget fails loudly if a second
    per-round action sneaks back in, with headroom for AQE stage-job
    variance."""
    sc = spark.sparkContext
    group = "jobbudget-neardup_components"
    sc.setJobGroup(group, "")
    try:
        DQ.registry()["neardup_components"].spark(spark, SF).count()
    finally:
        sc.setJobGroup(None, None)
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert jobs <= 32, jobs


def test_lsh_index_probe_band_join_bucketed(spark):
    """The LSH index probe: the corpus band table is bucketed on
    EXACTLY the candidate-join keys (band_idx, band_key) — a
    band_idx post-filter would be folded back into the join keys by
    Catalyst and defeat single-column bucketing (measured) — so the
    corpus side of the candidate join carries no exchange, and the
    corpus shingle table in the verify stage stays the precomputed
    (doc_id, sid) bucketed read — no corpus re-shingle anywhere.
    The candidate join is audited on its own subplan because the
    probe localCheckpoints it (the band scan runs inside that
    stage, not in the returned plan)."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.dedup import (
        _shingle_table,
        lsh_band_table,
        minhash_signatures,
    )
    from ods_v3_dbt_spark.operators.neardup_index import LshIndex

    # the declared query builds its fixture index on first touch
    full_plan = _plan(spark, "lsh_index_probe")
    shingle_scan = next(
        b for b in full_plan.split("\n\n")
        if "Scan parquet" in b and "_shingles" in b and "ReadSchema" in b
    )
    assert "ReadSchema: struct<doc_id:bigint,sid:bigint>" in shingle_scan

    from ods_v3_dbt_spark.plans.llm_queries import _lsh_fixture_name

    idx = LshIndex(_lsh_fixture_name(SF), 3, 16, 4, 8, "md5")
    assert idx.exists(spark)
    ridx = idx.resolve(spark)
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    bb = lsh_band_table(
        minhash_signatures(_shingle_table(batch, "text", "doc_id", 3), 16, "md5"),
        16, 4,
    )
    cb = ridx.band_tbl.read(spark).select(
        F.col("doc_id").alias("corpus_id"), "band_idx", "band_key"
    )
    # at fixture scale the batch side BROADCASTS (then Spark rightly
    # opts out of the bucketed scan — bucketing buys nothing under a
    # broadcast join); the 100 TB claim is the sort-merge shape, so
    # audit with broadcast off: corpus side bucketed + exchange-free,
    # batch side pays the single shuffle into the bucket layout
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bb.join(cb, ["band_idx", "band_key"])
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    band_scan = next(
        b for b in plan.split("\n\n")
        if "Scan parquet" in b and "_bands" in b and "ReadSchema" in b
    )
    assert "Bucketed: true" in band_scan
    # exactly one (band_idx, band_key) exchange: the batch side; none
    # above the corpus band scan (formatted mode spells exchanges as
    # "(n) Exchange" + "Arguments: hashpartitioning(...)")
    assert plan.count("hashpartitioning(band_idx") == 1


def test_bm25_plan_shape(spark):
    """BM25 (round 5): the corpus work must stay at three scan-stage
    passes (1-row stats, tf-with-dl, df) — no per-doc length join
    (the first cut shipped one plus a fourth scan), no sort-merge
    machinery (df/stats broadcast), and the tf (doc, term) count as
    the only corpus-keyed exchange family."""
    for name in ("bm25_topk_docs", "bm25_multiquery_topk"):
        df = DQ.registry()[name].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") <= 3, name
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name  # df joins broadcast
        # dl rides the tf rows: no join keyed on doc_id anywhere
        assert not re.search(r"Join \[doc_id", plan), name


def test_bm25_indexed_probe_bucket_pruned_postings(spark):
    """The persisted-BM25 probe (round-6 task 7): the corpus scan is
    GONE — every corpus-side read is a bucketed posting/df scan
    BUCKET-PRUNED to the query terms (SelectedBucketsCount below
    total, IN filter pushed to the scan), one per live segment (the
    fixture appends a quarter of the corpus as an LSM delta), and
    the plan tokenizes nothing (zero Generate: no corpus re-scan,
    no explode)."""
    plan = _plan(spark, "bm25_indexed_topk")
    post_scans = [
        b for b in plan.split("\n\n")
        if re.search(r"Scan parquet \S*bm25_idx\S*_postings\b", b)
        and "ReadSchema" in b
    ]
    assert len(post_scans) == 2          # base + appended delta segment
    for s in post_scans:
        assert "Bucketed: true" in s, s
        assert re.search(r"In\(term, \[", s), s
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", s)
        assert m and int(m.group(1)) < int(m.group(2)), s
    assert ") Generate" not in plan
    assert "documents.parquet" not in plan   # the corpus scan is gone


def test_ivf_indexed_probe_cell_pruned_lists(spark):
    """The persisted-IVF probe: the embeddings corpus scan is GONE
    from the probe plan — the only corpus-side reads are the assign
    (inverted-list) scans, one per live segment (the fixture appends
    a quarter as an LSM delta), each CELL-PRUNED (In(cell, ...)
    pushed to the bucketed scan). The embeddings source appears only
    for the QUERY vectors (vec_id < 10, filter pushed)."""
    plan = _plan(spark, "ivf_index_ann_topk")
    list_scans = [
        b for b in plan.split("\n\n")
        if re.search(r"Scan parquet \S*ivf_idx\S*_assign\b", b)
        and "ReadSchema" in b
    ]
    assert len(list_scans) == 2          # base + appended delta segment
    for s in list_scans:
        assert "Bucketed: true" in s, s
        assert re.search(r"In\(cell, \[", s), s
    # embeddings reads = query vectors only, never the corpus side.
    # Round 8: the probe table is localCheckpoint-ed (its quantize+
    # argmin subtree feeds both the probed-cells collect and the
    # scoring join — checkpointing computes it once), so the query
    # scan ran eagerly inside the checkpoint job and the returned
    # plan joins a batch-sized LogicalRDD; what matters is that NO
    # embeddings scan (i.e. no corpus-side vector read) remains.
    emb_scans = [
        b for b in plan.split("\n\n")
        if "embeddings.parquet" in b and "ReadSchema" in b
    ]
    assert not emb_scans, emb_scans
    # the checkpointed probe side (formatted plans print LogicalRDD
    # as an ExistingRDD scan)
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
