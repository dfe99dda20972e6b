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
#: The driver verifies a bounded prefix of the registry, so queries without
#: a prior green row are fronted below — new and previously-unchecked
#: entries get driver evidence first; already-proven ones re-verify with
#: whatever window remains.
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


#: Oracle-backed but low-novelty entries that may wait a round when the
#: fresh group overflows the driver's ~50-query window: each composes
#: operator families (window frames, stack/ntile, chunk/entropy scalar
#: work) that already carry driver-green rows from round 1.
_DEFER_WHEN_WINDOW_FULL = (
    "doc_chunks", "doc_char_entropy", "daily_bars_unpivot",
    "user_value_quartiles", "on_balance_volume", "stochastic_oscillator",
    "max_drawdown_per_user", "calendar_week_range_avg",
    "window_value_positions", "promo_revenue_by_month",
    "large_quantity_orders", "dormant_rich_customers",
    "rolling_zscore_anomalies", "reservoir_sample_per_lang",
    "scd2_price_history", "user_market_beta",
)


def _front_unverified() -> None:
    """Re-key QUERY_REGISTRY so entries lacking round-1 driver evidence
    come first (registration order preserved within each group).

    Within the fresh group, oracle-backed entries precede rows-only ones
    (a value-hash row is worth more than a rows-only row), and entries in
    the explicit defer list go last: when fresh overflows the window,
    what waits a round is the low-novelty tail — compositions of operator
    families that already hold driver-green rows — never the queries the
    round's verdict asked for."""
    defer = set(_DEFER_WHEN_WINDOW_FULL)
    fresh_oracle = {
        n: s for n, s in QUERY_REGISTRY.items()
        if n not in _R01_VERIFIED and s.oracle is not None and n not in defer
    }
    fresh_deferred = {
        n: s for n, s in QUERY_REGISTRY.items()
        if n not in _R01_VERIFIED and s.oracle is not None and n in defer
    }
    fresh_rows_only = {
        n: s for n, s in QUERY_REGISTRY.items()
        if n not in _R01_VERIFIED and s.oracle is None
    }
    proven = {n: s for n, s in QUERY_REGISTRY.items() if n in _R01_VERIFIED}
    unknown = (set(_R01_VERIFIED) | defer) - set(QUERY_REGISTRY)
    if unknown:  # a typo here would silently front the wrong set
        raise ValueError(f"ordering tuples name unregistered queries: {sorted(unknown)}")
    QUERY_REGISTRY.clear()
    QUERY_REGISTRY.update(fresh_oracle)
    QUERY_REGISTRY.update(fresh_deferred)
    QUERY_REGISTRY.update(fresh_rows_only)
    QUERY_REGISTRY.update(proven)


_front_unverified()
