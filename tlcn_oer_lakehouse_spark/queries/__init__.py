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
)


# Queries the round-1 driver verified green (CORRECTNESS_r01.json,
# hash_match=true).  The driver's correctness gate stopped at exactly the
# first 50 registry entries in round 1, so ordering decides which queries
# get a driver-level CORRECTNESS row: entries NOT yet driver-verified (and
# everything changed since r01 — the three r01-red fixes plus any new
# query) are ordered FIRST; the already-proven-green, unchanged remainder
# goes last.  Union across rounds ⇒ full driver coverage.
_DRIVER_GREEN_R01 = frozenset({
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q4_order_priority",
    "q14_promo_revenue", "q18_big_orders", "j_asof_event_order",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q11_important_parts", "q12_ship_priority", "q13_customer_distribution",
    "q15_top_supplier", "q16_supplier_variety", "q20_heavy_shippers",
    "q21_waiting_suppliers", "q22_idle_customers", "q17_small_quantity_revenue",
    "q2_min_cost_supplier", "a_grouping_sets", "q19_disjunctive_filter",
    "s4_local_collection", "s6_range_source", "p2_derived_columns",
    "p3_nullsafe_incremental_filter", "p6_conditional_ladder", "j4_left_anti",
    "j_semi_exists", "j5_broadcast_dim", "a1_grouped_multi_agg",
    "a5_distinct_dedup", "a_rollup", "a_exact_percentile", "a_column_profile",
    "a_pivot", "w1_latest_record_dedup", "w2_topk_per_group",
    "w3_running_and_lag", "o2_top1_limit", "o5_union_by_name", "o6_posexplode",
    "f_hash_identities", "f_datetime_dim",
})


# Queries the round-2 driver verified green (CORRECTNESS_r02.json, all
# hash_match=true).  Union of r01+r02 greens goes to the back of the
# registry; everything never driver-sampled sorts to the front so the
# driver's 50-entry round-3 window finally covers it.
_DRIVER_GREEN_R02 = frozenset({
    "a_approx_count_distinct", "s1_json_extraction", "j8_fk_validation",
    "a6_collect_list_struct", "f_null_handling", "text_stats",
    "text_quality_langid", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "ann_ivf_topk", "knn_bruteforce",
    "ann_sign_bucket", "dedup_embedding_cosine", "q4_keyword_extract",
    "q5_context_rerank", "q7_index_diff", "q3_hybrid_lang_weighted",
    "q1_inverted_index", "text_cdc_fingerprint", "q1_bm25_topk",
    "q3_hybrid_fusion", "silver_normalize", "k1_merge_upsert",
    "k2_merge_delete", "gold_fact_coverage", "gold_dim_customer",
    "gold_bridge_weighted", "chunk_token_windows", "chunk_char_budget",
    "chunk_hierarchical", "summarize_extractive", "st_tumbling_window",
    "st_sliding_window", "st_session_window", "mm_binary_metadata",
    "mm_image_features", "mm_frame_sample", "mm_pdf_pages", "mm_pdf_toc",
    "match_subjects", "embed_documents", "embed_and_rank",
    "td_train_test_split", "td_stratified_sample", "td_corpus_mixing",
    "td_token_budget_shards_scalable", "td_vocab_coverage",
    "td_contamination_check",
})

# Queries the round-3 driver verified green (CORRECTNESS_r03.json,
# hash_match=true) beyond the r01/r02 unions — the previously
# never-sampled backlog plus fresh TPC-H re-samples.
_DRIVER_GREEN_R03 = frozenset({
    "mm_pdf_hierarchical", "pii_scrub", "dedup_clusters", "td_pack_sequences",
    "td_data_card", "td_repetition_quality", "td_unigram_surprisal",
    "td_token_budget_shards", "a_approx_percentile", "ann_kmeans_assign",
    "o7_intersect_except", "semantic_match_subjects", "w4_distribution_ranks",
})

# Round-4 priority window (VERDICT r3 "Next round" task 3): the 8
# events-dependent queries broken by the regenerated testdata's
# timestamp[us] encoding and repaired by the load_events dtype branch.
# They need fresh driver rows — their r01/r02 greens are stale and
# `j_range_interval` has NEVER had a green driver row (its only sample,
# round 3, hit the loader bug).
_REPAIRED_FIRST = (
    "j_range_interval",
    "j_asof_event_order",
    "s1_json_extraction",
    "f_null_handling",
    "silver_normalize",
    "st_tumbling_window",
    "st_sliding_window",
    "st_session_window",
)


# Never-sampled queries that may yield their 50-window slot when the
# new-query count exceeds the window: thin function-surface wideners
# whose semantics are fully pinned by the pytest parity sweep, demoted
# so flagship operators (BPE, video decode, dedup variants) keep
# guaranteed driver rows.
_SAMPLE_LAST = frozenset({
    "a_cube", "f_array_functions",
    # scalable twin of a windowed query: the exact-form twin holds the
    # window slot; this one's gate math is pinned by the parity sweep
    "td_domain_caps_scalable",
    # composition of two already-window-held queries (bm25 + window sum)
    "q6_context_pack",
    # result-identity with a plain equi-join is the whole claim; the
    # parity sweep + salted_join property test already pin it
    "j_salted_hot_key",
    # queries/mlstats.py family, added after the round-4 window was
    # already exactly full (8 repaired + 42 new) — demoted wholesale so
    # they don't displace the planned slots; they rotate into round 5's
    # window as never-sampled backlog.  All seven are pinned by the
    # pytest parity sweep at sf0.01 in the meantime.
    "ml_feature_scaling", "ml_quantile_bucketize", "ml_ols_regression",
    "ml_confusion_metrics", "ml_auc_roc", "a_kmv_distinct", "a_kmv_set_ops",
    "ml_naive_bayes_langid", "ml_chi2_features", "ml_welch_ttest",
    "dq_expectations", "mm_wav_quadrature", "ivm_incremental_aggregate",
    "g_kcore", "g_modularity", "w12_attribution_last_touch",
    "w13_conversion_time_quantiles", "td_unigram_segment",
    "dedup_clusters_star", "g_label_propagation", "ml_covariance_block",
    "ts_seasonal_decompose", "ml_kaplan_meier", "ts_holt_forecast",
    "ml_lift_gain",
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
    pinned = {n: i for i, n in enumerate(_REPAIRED_FIRST)}
    green = _DRIVER_GREEN_R01 | _DRIVER_GREEN_R02 | _DRIVER_GREEN_R03

    def rank(n: str) -> tuple[int, int]:
        # 0: repaired events-dependent queries needing fresh driver rows;
        # 1: brand-new round-4 queries (never sampled);
        # 2: new but demoted below the window cut when over-subscribed;
        # 3: already driver-green on current-valid rows — back of the line.
        if n in pinned:
            return (0, pinned[n])
        if n not in green:
            return ((2, order.index(n)) if n in _SAMPLE_LAST
                    else (1, order.index(n)))
        return (3, order.index(n))

    return {n: registry[n] for n in sorted(order, key=rank)}


REGISTRY: dict[str, QuerySpec] = _collect()
