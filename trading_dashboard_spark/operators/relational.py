"""Core relational operators the reference embeds as SQL idioms.

Each function is a composable DataFrame transform; Catalyst handles the
physical strategy (broadcast vs sort-merge, TakeOrderedAndProject for
top-k, partition pruning) — see SURVEY.md §4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def latest_per_key(df: DataFrame, keys: list[str], order_col: str, tiebreak: list[str] | None = None) -> DataFrame:
    """J4 — greatest-n-per-group, n=1 ("latest row per symbol").

    The reference joins the fact to ``(SELECT symbol, MAX(trade_date) ...
    GROUP BY symbol)`` (data_loader.py:144-148). The idiomatic Spark plan is
    a single window + filter: one shuffle on the key instead of two
    (aggregate + join), and AQE handles skew.

    ``tiebreak`` makes the survivor deterministic when `order_col` ties.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """O3 — ``ORDER BY ... LIMIT k``.

    Spark compiles orderBy+limit to TakeOrderedAndProject: each partition
    keeps a k-row heap, the driver merges — no global sort materializes.
    (Reference: data_loader.py:150,175,195,232.)
    """
    return df.orderBy(*order_cols).limit(k)


def top_k_per_key(df: DataFrame, keys: list[str], order_cols: list[Column], k: int) -> DataFrame:
    """Top-k within each group via ranked window (Spark-native rewrite of
    the reference's greatest-n-per-group join idiom)."""
    w = W.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def safe_div(num: Column, den: Column) -> Column:
    """P16 — divide with NULLIF(den, 0) guard.

    Mirrors ``x / NULLIF(y, 0)`` (full_stock_pipeline.py:478,481;
    analyze_news_stock_patterns.py:36,39): zero denominator yields NULL,
    never an error or Inf, independent of ANSI mode.
    """
    return num / F.when(den != 0, den)


def pct_change_expr(cur: Column, prev: Column) -> Column:
    """P18 — percent change ``(cur - prev) / prev * 100`` with zero guard
    (analyze_news_stock_patterns.py:34-39)."""
    return safe_div(cur - prev, prev) * 100.0


def weekend_adjust(d: Column) -> Column:
    """F8 — map a date to the most recent trading day.

    Reference: ``weekday()==5 -> -1 day; ==6 -> -2 days``
    (full_stock_pipeline.py:51-57, repeated at 160-166 and 242-247).
    Spark ``dayofweek``: 1=Sunday ... 7=Saturday.
    """
    dow = F.dayofweek(d)
    return (
        F.when(dow == 7, F.date_sub(d, 1))  # Saturday -> Friday
        .when(dow == 1, F.date_sub(d, 2))  # Sunday -> Friday
        .otherwise(F.to_date(d))
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot reconciliation: classify every key as ``added`` (only in
    ``b``), ``removed`` (only in ``a``), ``changed`` (present in both,
    any compared column differs, null-safely) or ``unchanged``.

    The data-engineering primitive behind CDC validation, restatement
    audits, and versioned-table regression checks (io/versioned time
    travel pairs naturally with it). One full outer join on the keys —
    a single co-partitioned shuffle per side; with both snapshots
    bucketed on the keys the exchanges disappear entirely (operators/
    scale.write_bucketed). Comparison is ``<=>`` (null-safe equality)
    per column, so NULL→value and value→NULL both count as changes.

    PRECONDITION: ``keys`` must be unique within each snapshot —
    duplicate keys fan out the outer join into multiple (possibly
    conflicting) diff rows per key. Snapshots produced by the engine's
    merge path already guarantee this (``dedup_by_key`` runs on every
    upsert); for foreign inputs, dedup first or the counts lie.

    Returns key columns + ``diff_status`` + each compared column from
    both sides as ``<col>_a`` / ``<col>_b``.
    """
    cols = compare_cols or [c for c in a.columns if c not in keys]
    la = a.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_a"),
        *[F.col(c).alias(f"{c}_a") for c in cols],
    )
    lb = b.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_b"),
        *[F.col(c).alias(f"{c}_b") for c in cols],
    )
    j = la.join(lb, on=keys, how="full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"{c}_a").eqNullSafe(F.col(f"{c}_b"))
    status = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.withColumn("diff_status", status).drop("__in_a", "__in_b")
