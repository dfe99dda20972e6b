"""Streaming windowed aggregation — tumbling and session windows.

Watermarks bound state and admit late data up to the horizon; with a
static source driven to completion (tests/oracle), no rows are late, so
the streaming result equals the batch/SQL equivalent — which is what makes
these operators oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hourly_counts(
    stream: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window: count + sum(value) per (window,
    event_type). Equivalent batch SQL: GROUP BY time_bucket(1h, ts),
    event_type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    stream: DataFrame,
    watermark: str = "2 hours",
    window: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """Sliding event-time window: each event contributes to
    ``window/slide`` overlapping buckets (here 2). State per key is
    bounded by the watermark; the overlap factor multiplies aggregate
    state, not input rows. Equivalent batch SQL: join each event to the
    grid of window starts covering it."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "total_value",
        )
    )


def session_aggregate(
    stream: DataFrame,
    key: str = "user_id",
    gap: str = "12 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Session windows: per-key activity bursts separated by > gap.

    Streaming uses the native ``session_window``; for complete (non-late)
    data this equals the batch islands construction — per key, start a new
    session when ``ts - lag(ts) > gap``, then aggregate islands — which is
    the SQL-oracle form.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col(key),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def hourly_ohlc(
    stream: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Streaming OHLC candles: tumbling event-time window per event_type
    with deterministic open/close via ``min_by``/``max_by`` on a
    (ts, event_id) struct ordering key — declarative aggregates (not
    window functions) so the state per (window, type) is six scalars and
    late data folds in until the watermark passes. The struct key orders
    correctly for ANY ts/event_id domain (the earlier zero-padded
    ``epoch_us|event_id`` string key silently mis-ordered negative
    timestamps or ids ≥ 10^12); SQL oracles that can't order by struct
    (DuckDB arg_min) keep the string form, whose domain is guaranteed by
    the testdata. The batch ``hourly_ohlc_candles`` computes the same
    candles with the same idiom over a batch aggregate."""
    # NULL rule stated on the engine lane (r10 adversarial relational
    # battery): DuckDB's min_by/max_by skip NULL args natively, Spark's
    # return the arg at the extreme key even when NULL — nulling the
    # KEY for NULL values makes open/close the first/last NON-NULL
    # value on both engines (a valueless tick is not a price).
    key = F.when(
        F.col("value").isNotNull(), F.struct(F.col("ts"), F.col("event_id"))
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type", "open", "high", "low", "close",
            "n_events", "total_value",
        )
    )
