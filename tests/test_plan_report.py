"""Suite-WIDE plan hygiene: every declared query's physical plan is
summarized (plans/planreport.py) and the global invariants pinned —
the per-query audits in test_plan_audit.py catch local regressions,
this catches a bad pattern sneaking into any of the 125."""

from __future__ import annotations

from ods_v3_dbt_spark.plans.planreport import suite_report

SF = "/root/testdata/sf0.001"

# Python evaluation is allowed ONLY where a Python kernel is the
# design (Arrow-batched numpy/fake-decode paths) — never in a
# relational query.
PYTHON_KERNEL_QUERIES = {
    "embedding_ann_ivf",
    "embedding_cosine_neardup",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_png_decode",  # encode_png + decode_png Arrow kernels
    "multimodal_jpeg_decode",  # encode_jpeg + decode_jpeg Arrow kernels
    "multimodal_audio_decode",  # encode_wav + wav_stats Arrow kernels
    "multimodal_video_y4m",  # encode_y4m + y4m_stats Arrow kernels
    "multimodal_gif_decode",  # encode_gif + decode_gif Arrow kernels
    "warc_roundtrip_extract",  # build_warc + parse_warc Arrow kernels
    "wds_shard_roundtrip",  # build_tar_shard + parse_tar_samples Arrow kernels
    "html_text_extract",  # page-build + html.parser extraction Arrow kernels
    "crawl_funnel_extract",  # page→WARC build + parse/split/extract kernels
    "semantic_dedup_cells",  # within-cell pair gen = int64 numpy-gram kernel
    "semantic_dedup_cells_blocked",  # same kernel through _cell_blocks
    "knn_graph_topk",  # blocked self-join = int64 numpy-gram kernel
}

# Nested-loop joins are allowed ONLY as scalar/tiny-broadcast
# crossJoins (1-to-8-row build side carrying a global aggregate or
# seed set into the probe). Anything else is an accidental O(n·m).
SCALAR_BROADCAST_QUERIES = {
    "bigram_collocations",       # 1-row total-token count
    "bm25_topk_docs",             # 1-row (n_docs, total_len) stats
    "bm25_multiquery_topk",       # same 1-row stats crossJoin
    "bm25f_topk_docs",            # same 1-row stats crossJoin
    "bm25_window_topk",           # same 1-row stats crossJoin
    "bm25_indexed_topk",          # 1-row summed segment stats
    "bm25_indexed_delete_topk",   # same stats crossJoin, tomb-corrected
    "bm25_indexed_multiquery",    # same 1-row stats crossJoin
    "bm25_rm3_topk",              # same 1-row stats crossJoin (feedback
    #                               pass + weighted re-score, both
    #                               through _bm25_tf_stats)
    "embedding_ann_pq",           # 10-row query ADC-table broadcast
    "embedding_centroid_assign",  # 8-row centroid seed set
    "embedding_topk",             # small query-vector side
    "embedding_topk_filtered",    # same small query side, filtered corpus
    "events_day_spine_fill",      # day-spine × type dim (tiny × tiny)
    "fk_integrity_counts",        # per-edge 1-row counts unioned
    "hard_negative_mining",       # 10-row query-vector broadcast
    "hybrid_rrf_retrieval",       # BM25 1-row stats + small dense query side
    "hybrid_indexed_rrf",         # indexed-BM25 1-row summed segment stats
    "hybrid_indexed_rrf_pq",      # same 1-row BM25 stats crossJoin (dense
    #                               channel = cell-pruned PQ lists, no NL)
    "retrieval_eval_mrr",         # BM25 1-row stats + 1-row metric crossJoin
    "incremental_watermark",      # 1-row max-cursor scalar
    "join_key_skew_profile",      # 1-row (total, n_keys) pair
    "link_graph_pagerank",        # 1-row node-count scalar (edge gen)
    "order_lines_bag_ops",        # two 1-row counts crossed
    "rich_dormant_customers",     # 1-row (count,sum) avg pair
    "temperature_sampled_mixture",  # 1-row (total, wsum) pair
    "tfidf_top_terms",            # 1-row n_docs scalar
    "bigram_lm_surprisal",        # 1-row vocab-size (V) scalar
    "lsh_index_recall",           # three 1-row audit counts crossed
}


def test_suite_plan_invariants(spark):
    rep = suite_report(spark, SF)
    assert not [k for k, v in rep.items() if "error" in v]
    py = {k for k, v in rep.items() if v.get("python_evals", 0) > 0}
    assert py <= PYTHON_KERNEL_QUERIES, py - PYTHON_KERNEL_QUERIES
    nl = {k for k, v in rep.items() if v.get("nested_loop_joins", 0) > 0}
    assert nl <= SCALAR_BROADCAST_QUERIES, nl - SCALAR_BROADCAST_QUERIES
    # every query must read SOMETHING through the parquet scan path —
    # except audit-summary queries whose RETURNED frame is a driver-
    # assembled 1-row summary (their scans run eagerly inside; the
    # pipeline itself is plan-audited via its standalone stage queries)
    # bpe_learned_merges: the returned frame is the driver-side merge
    # list (5 rows) — its corpus scans run eagerly inside learn_bpe's
    # iteration loop; the training operators' plan hygiene is pinned
    # via bpe_tokenize_stats (which scans) and test_bpe.py.
    # semantic_dedup_cells: the returned frame reads the checkpointed
    # assignment (LogicalRDD — the corpus scan ran eagerly inside the
    # seed/Lloyd/assignment stages; checkpointing is also the
    # self-join-over-LogicalRDD dedup workaround documented in
    # operators/similarity.py).
    # link_graph_pagerank: the returned frame joins the final
    # power-iteration round's localCheckpoint (LogicalRDD — the
    # document scans ran eagerly inside the iteration chain, whose
    # per-round plan is the checkpoint-truncated join+agg).
    # incremental_curation_decisions: every stage is localCheckpoint-
    # materialized (the round-4 stage discipline that retired the
    # 5,592-Exchange composition), so the returned verdict union reads
    # LogicalRDDs; its scans ran eagerly inside the stages and the
    # probe path's scan/bucket hygiene is pinned via dedup_index_probe
    # in test_plan_audit.py.
    AUDIT_SUMMARY_QUERIES = {
        "curation_pipeline_audit",
        "bpe_learned_merges",
        "semantic_dedup_cells",
        "semantic_dedup_cells_blocked",  # same checkpointed-assignment shape
        "semantic_dedup_indexed_cells",  # same: within_cell_dedup checkpoints
        #   the (index-read) assignment, so the index member scans ran
        #   eagerly inside it; bucket/prune hygiene is pinned by the
        #   ivf_index_ann_topk plan audit on the same member tables
        "link_graph_pagerank",
        "personalized_pagerank",  # same checkpoint-truncated final round
        "incremental_curation_decisions",
        "store_audit_counts",  # driver-built storage-protocol receipt
        #   row — the fixture's corpus/index scans run eagerly inside
        #   the verb sequence; the audit itself is listing-only
    }
    scanless = {
        k for k, v in rep.items() if v.get("parquet_scans", 0) == 0
    } - AUDIT_SUMMARY_QUERIES
    assert not scanless, scanless
    # Suite-wide exchange budget: round 3's worst plan carried 5,592
    # Exchange nodes (a composition re-deriving its upstream subtree
    # per consumer); everything else sat at ≤24. With the stage
    # discipline in place NO query's returned plan may exceed 50 —
    # a composition that does is re-deriving, not reusing.
    fat = {
        k: v["exchanges"]
        for k, v in rep.items()
        if v.get("exchanges", 0) > 50
    }
    assert not fat, fat
    # Delete-probe family caps (round-8 verdict task 4): tombstone
    # suppression is ONE checkpointed broadcast side shared by every
    # segment (neardup_index._Resolved.tomb_max), so a delete probe
    # costs the base probe + one cheap BroadcastExchange per
    # (tomb-applicable segment × member) — these absolutes pin that
    # shape (the flatness-in-tombstone-count invariant is pinned
    # separately below).
    DELETE_PROBE_EXCHANGE_CAPS = {
        "lsh_index_delete_probe": 18,
        "dedup_index_delete_probe": 10,
        "dedup_index_delete_readd_probe": 13,
        "bm25_indexed_delete_topk": 9,
    }
    over = {
        k: rep[k]["exchanges"]
        for k, cap in DELETE_PROBE_EXCHANGE_CAPS.items()
        if rep[k].get("exchanges", 0) > cap
    }
    assert not over, over


def test_delete_probe_plan_flat_in_tombstone_count(spark, tmp_path):
    """The 100 TB contract behind the caps above: a probe's PLAN must
    not grow with the number of live tombstones. Nightly takedowns
    accumulate up to compact_after−1 tomb members between folds; the
    old shape unioned every applicable tombstone scan into every
    segment's visibility anti-join — O(segments × tombstones)
    Exchange nodes. Now all segments share one checkpointed
    (doc_id, max tomb epoch) broadcast side, so FOUR separate delete
    batches must yield the exact same probe plan as ONE."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_delete,
        dedup_index_write,
        lsh_index_delete,
        lsh_index_write,
        lsh_index_probe,
        neardup_probe,
    )
    from ods_v3_dbt_spark.plans.planreport import plan_report

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 3 == 0)
    )
    batch = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 3 == 1)
    )

    def ids(m):
        return docs.filter(F.col("doc_id") % 10 == m).select("doc_id")

    for kind, write, delete, probe in [
        ("exact", dedup_index_write, dedup_index_delete,
         lambda b, i: neardup_probe(b, i)),
        ("lsh", lsh_index_write, lsh_index_delete,
         lambda b, i: lsh_index_probe(b, i)),
    ]:
        idx = write(docs, f"tflat_{kind}_idx", num_buckets=4)
        delete(idx, ids(0))
        one = plan_report(probe(batch, idx))
        for m in (1, 2, 3):  # three MORE tomb members, no fold (< 8)
            delete(idx, ids(m))
        four = plan_report(probe(batch, idx))
        assert four["exchanges"] == one["exchanges"], (kind, one, four)
        assert four["broadcast_hash_joins"] == one["broadcast_hash_joins"]
