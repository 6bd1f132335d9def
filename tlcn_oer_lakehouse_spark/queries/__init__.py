"""Merged query registry — one QuerySpec per SURVEY §2 operator."""

from __future__ import annotations

from tlcn_oer_lakehouse_spark.queries.base import QuerySpec

_MODULES = (
    "tpch",
    "tpch_ext",
    "tpch_deep",
    "subqueries",
    "relational",
    "textops",
    "quality",
    "vectorops",
    "retrieval",
    "lakehouse",
    "chunking",
    "windows",
    "multimodal",
    "mlops",
    "traindata",
    "bpe",
    "mlstats",
    "serve",
)


# Driver-verified-green union across CORRECTNESS_r01..r05 (all
# hash_match=true rows; CORRECTNESS_r05 was 50/50 green, completing the
# rotation — 189/190 registry queries have driver-proven rows; the one
# holdout, td_bpe_merges_delta, rotates into this round's window below).
# Queries whose builder code changed materially in round 5/6 AFTER their
# green row re-enter the window via _REVERIFY_FIRST (green-set policy).
_DRIVER_GREEN = frozenset({
    "a1_grouped_multi_agg", "a5_distinct_dedup", "a6_collect_list_struct",
    "a_approx_count_distinct", "a_approx_percentile", "a_column_profile",
    "a_countmin_sketch", "a_cube", "a_exact_percentile", "a_grouping_sets",
    "a_hll_sketch", "a_kmv_distinct", "a_kmv_set_ops", "a_pivot",
    "a_rollup", "ann_ivf_topk", "ann_kmeans_assign", "ann_knn_join",
    "ann_pq_adc", "ann_recall_eval", "ann_sign_bucket",
    "chunk_char_budget", "chunk_hierarchical", "chunk_token_windows",
    "chunk_udtf", "dedup_clusters", "dedup_clusters_star",
    "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_recall_eval", "dedup_simhash",
    "dedup_soft_sample", "dq_expectations", "embed_and_rank",
    "embed_documents", "f_array_functions", "f_datetime_dim",
    "f_hash_identities", "f_null_handling", "f_url_extract",
    "g_jaccard_neighbors", "g_kcore", "g_label_propagation",
    "g_lpa_converged", "g_modularity", "g_pagerank",
    "g_pointer_doubling_depth", "g_triangle_count", "gold_bridge_weighted",
    "gold_dim_customer", "gold_fact_coverage", "ivm_incremental_aggregate",
    "j4_left_anti", "j5_broadcast_dim", "j8_fk_validation",
    "j_asof_event_order", "j_full_outer_reconcile", "j_fuzzy_deletion",
    "j_range_interval", "j_salted_hot_key", "j_semi_exists",
    "k1_merge_upsert", "k2_merge_delete", "knn_bruteforce",
    "match_subjects", "ml_auc_roc", "ml_chi2_features",
    "ml_confusion_metrics", "ml_covariance_block", "ml_feature_scaling",
    "ml_kaplan_meier", "ml_lift_gain", "ml_naive_bayes_langid",
    "ml_ols_regression", "ml_quantile_bucketize", "ml_welch_ttest",
    "mm_binary_metadata", "mm_frame_sample", "mm_gif_decode",
    "mm_image_decode", "mm_image_features", "mm_jpeg_decode",
    "mm_mp4_frames", "mm_pdf_hierarchical", "mm_pdf_pages", "mm_pdf_toc",
    "mm_phash_dedup", "mm_png_decode", "mm_video_frames", "mm_wav_decode",
    "mm_wav_quadrature", "mm_wav_windows", "o2_top1_limit",
    "o5_union_by_name", "o6_posexplode", "o7_intersect_except",
    "p2_derived_columns", "p3_nullsafe_incremental_filter",
    "p6_conditional_ladder", "pii_scrub", "q10_returned_items",
    "q11_important_parts", "q12_ship_priority",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_variety", "q17_small_quantity_revenue", "q18_big_orders",
    "q19_disjunctive_filter", "q1_bm25_topk", "q1_inverted_index",
    "q1_pricing_summary", "q20_heavy_shippers", "q21_waiting_suppliers",
    "q22_idle_customers", "q2_min_cost_supplier", "q3_hybrid_fusion",
    "q3_hybrid_lang_weighted", "q3_shipping_priority",
    "q4_keyword_extract", "q4_order_priority", "q5_context_rerank",
    "q5_local_supplier_volume", "q6_context_pack", "q6_forecast_revenue",
    "q7_index_diff", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "qual_boilerplate_strip", "qual_gopher_rules",
    "rec_item_item_cf", "s1_json_extraction", "s4_local_collection",
    "s6_range_source", "s8_inferred_reference", "semantic_match_subjects",
    "silver_normalize", "st_session_window", "st_sliding_window",
    "st_tumbling_window", "summarize_extractive", "td_bigram_surprisal",
    "td_bloom_contamination", "td_bpe_merges", "td_bpe_tokenize",
    "td_contamination_check", "td_corpus_mixing", "td_curriculum_order",
    "td_data_card", "td_domain_caps", "td_domain_caps_scalable",
    "td_hard_negatives", "td_pack_sequences", "td_pipeline_e2e",
    "td_repetition_quality", "td_stratified_sample",
    "td_temperature_mixing", "td_token_budget_shards",
    "td_token_budget_shards_scalable", "td_train_test_split",
    "td_unigram_segment", "td_unigram_surprisal", "td_vocab_coverage",
    "td_weighted_sample", "td_wordpiece_merges", "text_cdc_fingerprint",
    "text_quality_langid", "text_stats", "ts_holt_forecast",
    "ts_mad_anomalies", "ts_seasonal_decompose", "ts_subsequence_search",
    "w10_cooccurrence_pairs", "w11_rfm_segmentation",
    "w12_attribution_last_touch", "w13_conversion_time_quantiles",
    "w1_latest_record_dedup", "w2_topk_per_group", "w3_running_and_lag",
    "w4_distribution_ranks", "w5_funnel", "w6_cohort_retention",
    "w7_event_transitions", "w8_activity_streaks", "w9_max_concurrency",
})


# Queries whose green driver row predates a material round-6 code change
# — pinned to the very front of the window so round 6 produces a fresh
# row for each:
#
#   bm25_scores/_scored_docs gained a `terms` parameter (default
#   QUERY_TERMS, result-identical) — every BM25 consumer re-verifies:
#     q1_bm25_topk, td_hard_negatives, q3_hybrid_fusion,
#     q3_hybrid_lang_weighted, q5_context_rerank, q6_context_pack
#   prefix-sum width now reads spark.sql.shuffle.partitions:
#     td_token_budget_shards_scalable, ml_auc_roc
#   explicit F.broadcast on the NB class-totals grid:
#     ml_naive_bayes_langid
#   HIERARCHICAL_SQL refactored into a shared `chunks` CTE core:
#     chunk_hierarchical
#   mp4 reader hardening (count bounds, per-trak first-wins):
#     mm_mp4_frames
#   simhash widened 32→64 bits (sf1.0 sweep: 32 bits birthday-collides
#   at ≥50k docs) — result-changing, both engines updated:
#     dedup_simhash
#   graph-family oracle SQL gained MATERIALIZED CTE hints (sf1.0 sweep:
#   DuckDB re-inlined multi-referenced CTEs and filled the disk) —
#   result-identical, oracle text changed:
#     g_pagerank, g_triangle_count, g_modularity, g_jaccard_neighbors
#   k-core round budget 8→12 (sf1.0 needs 10; fixpoint-detected, so
#   result-identical at driver scale):
#     g_kcore
_REVERIFY_FIRST = (
    "q1_bm25_topk",
    "td_hard_negatives",
    "q3_hybrid_fusion",
    "q3_hybrid_lang_weighted",
    "q5_context_rerank",
    "q6_context_pack",
    "td_token_budget_shards_scalable",
    "ml_auc_roc",
    "ml_naive_bayes_langid",
    "chunk_hierarchical",
    "mm_mp4_frames",
    "dedup_simhash",
    "g_pagerank",
    "g_triangle_count",
    "g_modularity",
    "g_jaccard_neighbors",
    "g_kcore",
)


# Round-6 rotation: td_bpe_merges_delta (the deliberate round-5
# demotion) re-enters the window as never-sampled; with the round-6
# additions (q3_hybrid_recency, q_tiered_search, rag_serve_e2e,
# td_exact_substring_dedup) that is 17 re-verifies + 5 never-sampled =
# 22 slots, leaving ~28 for greens to re-rotate.  Greens sampled in
# ROUND 5 (CORRECTNESS_r05 keys) go to the very back so those ~28
# slots refresh the OLDEST driver rows (r1-r4 vintage) instead of
# re-proving last round's.
_SAMPLE_LAST: frozenset[str] = frozenset({
    "a_cube", "a_kmv_distinct", "a_kmv_set_ops", "ann_kmeans_assign",
    "ann_pq_adc", "dedup_clusters", "dedup_clusters_star",
    "dedup_recall_eval", "dq_expectations", "embed_and_rank",
    "embed_documents", "f_array_functions", "g_label_propagation",
    "g_lpa_converged", "g_pointer_doubling_depth",
    "ivm_incremental_aggregate", "j_salted_hot_key", "k1_merge_upsert",
    "k2_merge_delete", "ml_chi2_features", "ml_confusion_metrics",
    "ml_covariance_block", "ml_feature_scaling", "ml_kaplan_meier",
    "ml_lift_gain", "ml_ols_regression", "ml_quantile_bucketize",
    "ml_welch_ttest", "mm_phash_dedup", "mm_wav_quadrature",
    "qual_boilerplate_strip", "td_contamination_check", "td_data_card",
    "td_domain_caps_scalable", "td_unigram_segment",
    "text_quality_langid", "ts_holt_forecast", "ts_seasonal_decompose",
    "w12_attribution_last_touch", "w13_conversion_time_quantiles",
})



def _collect() -> dict[str, QuerySpec]:
    import importlib

    registry: dict[str, QuerySpec] = {}
    for mod_name in _MODULES:
        mod = importlib.import_module(f"tlcn_oer_lakehouse_spark.queries.{mod_name}")
        for spec in mod.SPECS:
            if spec.name in registry:
                raise ValueError(f"duplicate query name: {spec.name}")
            registry[spec.name] = spec
    order = list(registry)
    pinned = {n: i for i, n in enumerate(_REVERIFY_FIRST)}
    green = _DRIVER_GREEN

    def rank(n: str) -> tuple[int, int]:
        # 0: stale-changed queries needing fresh driver rows;
        # 1: never driver-sampled (rotations + new round-6 work);
        # 2: explicitly demoted below the window cut when over-subscribed;
        # 3: green on older-round rows — fill spare slots to refresh;
        # 4: green AND freshly sampled last round — very back.
        if n in pinned:
            return (0, pinned[n])
        if n not in green:
            return ((2, order.index(n)) if n in _SAMPLE_LAST
                    else (1, order.index(n)))
        return ((4, order.index(n)) if n in _SAMPLE_LAST
                else (3, order.index(n)))

    return {n: registry[n] for n in sorted(order, key=rank)}


REGISTRY: dict[str, QuerySpec] = _collect()
