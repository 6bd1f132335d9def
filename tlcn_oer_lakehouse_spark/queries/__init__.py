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
    "medallion",
)


# Driver-verified-green union across CORRECTNESS_r01..r06, keyed by the
# LATEST round each query's newest green row was produced in (its
# "vintage").  CORRECTNESS_r06 was 50/50 green, completing the union:
# all 194 round-6 registry queries have driver-proven rows.  The
# vintage drives the rank-3 ordering below so each round's spare window
# slots refresh the OLDEST driver rows first.  Round-7 window budget:
# 5 re-verifies + 4 new queries + 41 rank-3 slots = all 13 r1 rows and
# 28 of 29 r2 rows refresh THIS round; the remaining r2 row and the 18
# r3 rows are the oldest vintage left for the round-8 window.  Queries
# whose builder code changed materially in round 7 AFTER their green
# row re-enter the window via _REVERIFY_FIRST (green-set policy).
_GREEN_VINTAGE: dict[int, frozenset[str]] = {
    1: frozenset({
        "a5_distinct_dedup", "a_column_profile", "a_exact_percentile",
        "a_pivot", "a_rollup", "f_datetime_dim", "f_hash_identities",
        "o2_top1_limit", "o5_union_by_name", "o6_posexplode",
        "w1_latest_record_dedup", "w2_topk_per_group",
        "w3_running_and_lag"
    }),
    2: frozenset({
        "a6_collect_list_struct", "ann_ivf_topk", "ann_sign_bucket",
        "chunk_char_budget", "chunk_token_windows",
        "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "gold_bridge_weighted",
        "gold_dim_customer", "gold_fact_coverage", "knn_bruteforce",
        "match_subjects", "mm_binary_metadata", "mm_frame_sample",
        "mm_image_features", "mm_pdf_pages", "mm_pdf_toc",
        "q1_inverted_index", "q4_keyword_extract", "q7_index_diff",
        "summarize_extractive", "td_corpus_mixing",
        "td_stratified_sample", "td_train_test_split",
        "td_vocab_coverage", "text_cdc_fingerprint", "text_stats"
    }),
    3: frozenset({
        "a1_grouped_multi_agg", "a_approx_percentile", "j4_left_anti",
        "j5_broadcast_dim", "j8_fk_validation", "j_semi_exists",
        "mm_pdf_hierarchical", "o7_intersect_except",
        "p2_derived_columns", "p3_nullsafe_incremental_filter",
        "p6_conditional_ladder", "pii_scrub", "semantic_match_subjects",
        "td_pack_sequences", "td_repetition_quality",
        "td_token_budget_shards", "td_unigram_surprisal",
        "w4_distribution_ranks"
    }),
    4: frozenset({
        "a_countmin_sketch", "a_hll_sketch", "ann_knn_join",
        "ann_recall_eval", "chunk_udtf", "dedup_soft_sample",
        "f_null_handling", "f_url_extract", "j_full_outer_reconcile",
        "j_fuzzy_deletion", "j_range_interval", "mm_gif_decode",
        "mm_image_decode", "mm_jpeg_decode", "mm_png_decode",
        "mm_video_frames", "mm_wav_decode", "mm_wav_windows",
        "qual_gopher_rules", "rec_item_item_cf",
        "s8_inferred_reference", "silver_normalize",
        "st_session_window", "st_sliding_window", "st_tumbling_window",
        "td_bigram_surprisal", "td_bloom_contamination",
        "td_bpe_merges", "td_bpe_tokenize", "td_curriculum_order",
        "td_domain_caps", "td_pipeline_e2e", "td_temperature_mixing",
        "td_weighted_sample", "td_wordpiece_merges", "ts_mad_anomalies",
        "ts_subsequence_search", "w10_cooccurrence_pairs",
        "w11_rfm_segmentation", "w5_funnel", "w6_cohort_retention",
        "w7_event_transitions", "w8_activity_streaks",
        "w9_max_concurrency"
    }),
    5: frozenset({
        "a_cube", "a_kmv_distinct", "a_kmv_set_ops",
        "ann_kmeans_assign", "ann_pq_adc", "dedup_clusters",
        "dedup_clusters_star", "dedup_recall_eval", "dq_expectations",
        "embed_and_rank", "embed_documents", "f_array_functions",
        "g_label_propagation", "g_lpa_converged",
        "g_pointer_doubling_depth", "ivm_incremental_aggregate",
        "j_salted_hot_key", "k1_merge_upsert", "k2_merge_delete",
        "ml_chi2_features", "ml_confusion_metrics",
        "ml_covariance_block", "ml_feature_scaling", "ml_kaplan_meier",
        "ml_lift_gain", "ml_ols_regression", "ml_quantile_bucketize",
        "ml_welch_ttest", "mm_phash_dedup", "mm_wav_quadrature",
        "qual_boilerplate_strip", "td_contamination_check",
        "td_data_card", "td_domain_caps_scalable", "td_unigram_segment",
        "text_quality_langid", "ts_holt_forecast",
        "ts_seasonal_decompose", "w12_attribution_last_touch",
        "w13_conversion_time_quantiles"
    }),
    6: frozenset({
        "a_approx_count_distinct", "a_grouping_sets",
        "chunk_hierarchical", "dedup_simhash", "g_jaccard_neighbors",
        "g_kcore", "g_modularity", "g_pagerank", "g_triangle_count",
        "j_asof_event_order", "ml_auc_roc", "ml_naive_bayes_langid",
        "mm_mp4_frames", "q10_returned_items", "q11_important_parts",
        "q12_ship_priority", "q13_customer_distribution",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_variety",
        "q17_small_quantity_revenue", "q18_big_orders",
        "q19_disjunctive_filter", "q1_bm25_topk", "q1_pricing_summary",
        "q20_heavy_shippers", "q21_waiting_suppliers",
        "q22_idle_customers", "q2_min_cost_supplier",
        "q3_hybrid_fusion", "q3_hybrid_lang_weighted",
        "q3_hybrid_recency", "q3_shipping_priority",
        "q4_order_priority", "q5_context_rerank",
        "q5_local_supplier_volume", "q6_context_pack",
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "q_tiered_search", "rag_serve_e2e",
        "s1_json_extraction", "s4_local_collection", "s6_range_source",
        "td_bpe_merges_delta", "td_exact_substring_dedup",
        "td_hard_negatives", "td_token_budget_shards_scalable"
    }),
}

_DRIVER_GREEN = frozenset().union(*_GREEN_VINTAGE.values())

_VINTAGE_OF = {n: r for r, names in _GREEN_VINTAGE.items() for n in names}


# Queries whose green driver row predates a material round-7 code change
# — pinned to the very front of the window so round 7 produces a fresh
# row for each:
#
#   explicit F.broadcast on the 1-row estimate-vs-exact crossJoins
#   (fleet convention, VERDICT r6 nit #1) — result-identical:
#     a_hll_sketch, a_kmv_set_ops
#   mp4 stsc run-table contiguity validation (_expand_stsc now raises
#   on non-1-based/non-contiguous run tables instead of positionally
#   misplacing sample counts; well-formed files unchanged):
#     mm_mp4_frames
#   exact_substring_dedup refactored into the shared
#   _exact_substring_core (keep_one=False path, result-identical):
#     td_exact_substring_dedup
#   rag_serve Q5/Q6 tail extracted into the shared _pack_context
#   (result-identical; the ANN variant reuses it):
#     rag_serve_e2e
#   ivf_topk refactored onto the shared _probe_frame/_exact_cos_topk
#   helpers (result-identical; oracle text byte-identical):
#     ann_ivf_topk
_REVERIFY_FIRST = (
    "a_hll_sketch",
    "a_kmv_set_ops",
    "mm_mp4_frames",
    "td_exact_substring_dedup",
    "rag_serve_e2e",
    "ann_ivf_topk",
)


# Round-7 rotation: greens freshly sampled in ROUND 6 (CORRECTNESS_r06
# keys) go to the very back; never-sampled round-7 additions rank 1;
# the remaining slots refresh the oldest-vintage greens (r1 first).
_SAMPLE_LAST: frozenset[str] = _GREEN_VINTAGE[6]


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
        if n in _SAMPLE_LAST:
            return (4, order.index(n))
        # oldest driver rows first: vintage round, then registry order
        return (3, _VINTAGE_OF[n] * 10000 + order.index(n))

    return {n: registry[n] for n in sorted(order, key=rank)}


REGISTRY: dict[str, QuerySpec] = _collect()
