"""Aggregated query registry — importing this module registers every
query/oracle pair from all tiers (driver contract entry point)."""

from .query_registry import QUERY_REGISTRY, QuerySpec, register  # noqa: F401
from . import queries_relational  # noqa: F401
from . import queries_windows  # noqa: F401
from . import queries_text  # noqa: F401
from . import queries_similarity  # noqa: F401
from . import queries_multimodal  # noqa: F401
from . import queries_training  # noqa: F401
from . import queries_streaming  # noqa: F401
from . import queries_extra  # noqa: F401
from . import queries_dashboard  # noqa: F401

#: Queries with a green row in CORRECTNESS_r01.json (driver round 1).
_R01_VERIFIED = (
    "pricing_summary", "top_gainers", "market_avg_by_date",
    "latest_event_per_user", "top_customers_by_revenue", "regional_revenue",
    "orders_in_range_by_priority", "parts_regex_filter", "priority_buckets",
    "customer_balance_health", "distinct_segments", "global_lineitem_stats",
    "multi_key_sorted_events", "top_events_by_value", "customers_with_orders",
    "customers_without_orders", "extreme_value_events_union",
    "finished_only_customers_except", "event_scalar_functions",
    "weekend_adjusted_days", "daily_pct_change", "lead_next_value",
    "three_day_trends", "ma_crossover_signals", "volatility_patterns",
    "sma_dual_semantics", "bollinger_bands", "rsi_indicator",
    "cumulative_user_totals", "top3_days_per_user", "prev_available_close",
    "asof_purchase_click", "merge_upsert_digest", "insert_if_absent_digest",
    "range_join_opening_window", "multi_resolution_rollup",
    "exact_dedup_docs", "token_stats_by_lang", "doc_quality_features",
    "language_id_counts", "fingerprint_uniqueness_by_source",
    "minhash_near_dup_pairs", "ngram_jaccard_near_dups", "doc_sentiment",
    "simhash_fingerprints", "blocked_jaccard_within_source", "top_trigrams",
    "knn_probe_top10", "knn_per_vector_top3", "embedding_stats_by_label",
)

#: Queries with a green row in CORRECTNESS_r02.json (driver round 2).
_R02_VERIFIED = (
    "late_shipment_priorities", "value_percentiles_by_type", "macd_indicator",
    "repetition_signals", "tfidf_top_terms", "unigram_logprob_score",
    "near_dup_clusters", "embedding_cosine_near_dup", "ivf_ann_probe_top5",
    "embedding_int8_quantization", "media_metadata_by_type",
    "media_decode_features", "media_frame_plan", "train_test_split_stats",
    "doc_length_quartiles_by_lang", "quality_cube_by_lang_source",
    "docs_with_embeddings_by_lang", "token_budget_shards",
    "cross_split_contamination", "cms_user_frequencies",
    "stratified_sample_by_lang", "fixed_window_packing", "heavy_hitter_users",
    "streaming_hourly_type_counts", "streaming_session_windows",
    "streaming_stateful_user_totals", "streaming_dedup_ingest",
    "streaming_sliding_counts", "streaming_click_attribution",
    "streaming_nation_enrichment", "regional_revenue_rollup",
    "event_type_pivot", "explode_user_event_types", "ema_indicator",
    "signal_price_correlation", "skew_salted_event_totals",
    "event_sessionization", "props_json_value_buckets",
    "type_dow_grouping_sets", "user_value_distribution_ranks",
    "orders_quality_expectations", "click_purchase_funnel", "top_losers",
    "high_volatility_top10", "latest_prediction_per_symbol",
    "company_news_latest5", "trading_patterns_top100", "company_list",
    "stock_history_range", "market_trends_latest",
)

_VERIFIED = _R01_VERIFIED + _R02_VERIFIED

#: Bump once per build round. Rotates which previously-green queries fill
#: the re-verification reserve of the driver's ~50-query window, so every
#: proven query cycles back through external verification over time
#: instead of being permanently excluded (regression insurance).
_ROUND = 3

#: How many window slots to spend re-verifying previously-green queries.
#: The rest of the window goes to never-verified / new entries.
_REVERIFY_RESERVE = 12


def _front_unverified() -> None:
    """Re-key QUERY_REGISTRY so the driver's bounded verification window
    is spent where it buys the most evidence:

    1. never-driver-verified entries with value oracles (fresh, oracle),
    2. never-driver-verified rows-only entries,
    3. a rotating slice of previously-green queries (re-verification
       reserve — regressions in proven queries get re-caught over time),
    4. the remaining proven queries, rotated so the reserve slice
       changes every round.

    Registration order is preserved within groups 1–2; groups 3–4 rotate
    deterministically by ``_ROUND`` so the subset re-verified each round
    walks the whole proven set."""
    verified = set(_VERIFIED)
    fresh_oracle = {
        n: s for n, s in QUERY_REGISTRY.items()
        if n not in verified and s.oracle is not None
    }
    fresh_rows_only = {
        n: s for n, s in QUERY_REGISTRY.items()
        if n not in verified and s.oracle is None
    }
    proven_names = [n for n in QUERY_REGISTRY if n in verified]
    unknown = verified - set(QUERY_REGISTRY)
    if unknown:  # a typo here would silently front the wrong set
        raise ValueError(
            f"ordering tuples name unregistered queries: {sorted(unknown)}")
    # Rotate the proven list so a different reserve-sized slice leads
    # each round; stride by the reserve so consecutive rounds don't overlap.
    if proven_names:
        off = (_ROUND * _REVERIFY_RESERVE) % len(proven_names)
        proven_names = proven_names[off:] + proven_names[:off]
    proven = {n: QUERY_REGISTRY[n] for n in proven_names}
    QUERY_REGISTRY.clear()
    QUERY_REGISTRY.update(fresh_oracle)
    QUERY_REGISTRY.update(fresh_rows_only)
    QUERY_REGISTRY.update(proven)


_front_unverified()
