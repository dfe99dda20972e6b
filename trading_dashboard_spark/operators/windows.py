"""Window-tier operators — the analytical heart of the reference.

All reference analytics are ``PARTITION BY symbol ORDER BY trade_date``
windows (SURVEY.md §2.5): lag/lead, rolling frames, and a correlated
as-of fallback. On Spark each family is one window spec — a single
shuffle per partitioning key, reused across every frame defined on it.

Scale note: window state per key is bounded (rolling frames are fixed
length), so the operators scale with the number of keys, not rows; skewed
keys are handled by AQE. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, WindowSpec, functions as F

from .relational import pct_change_expr


def per_key_window(keys: list[str] | str, order: list[str] | str) -> WindowSpec:
    keys = [keys] if isinstance(keys, str) else keys
    order = [order] if isinstance(order, str) else order
    return W.partitionBy(*keys).orderBy(*order)


def with_lag_features(
    df: DataFrame,
    value_col: str,
    keys: list[str] | str,
    order: list[str] | str,
    lags: tuple[int, ...] = (1,),
    lead: bool = False,
    pct: bool = False,
) -> DataFrame:
    """W1/W2/W3/W9 — lag(n), lead(1), and pct_change over the key window.

    Reference sites: LAG previous close (full_stock_pipeline.py:396),
    chained lag(1)/lag(2) for 3-day trends (:434-443), lead for the ML
    target (analyze_news_stock_patterns.py:110-111), grouped pct_change
    (:96).
    """
    w = per_key_window(keys, order)
    v = F.col(value_col)
    for n in lags:
        df = df.withColumn(f"{value_col}_lag{n}", F.lag(v, n).over(w))
    if lead:
        df = df.withColumn(f"{value_col}_lead1", F.lead(v, 1).over(w))
    if pct:
        df = df.withColumn(
            f"{value_col}_pct_change",
            pct_change_expr(v, F.col(f"{value_col}_lag1")),
        )
    return df


def rolling(
    value: Column, w: WindowSpec, n: int, fn: str = "avg", min_periods: int | None = None
) -> Column:
    """W4/W5/W6 — fixed-length ROWS frame aggregate ending at CURRENT ROW.

    Two boundary semantics exist in the reference (SURVEY.md §7.4):
    - SQL partial mean: ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW``
      averages whatever rows exist (full_stock_pipeline.py:452-457).
    - pandas ``rolling(n)`` emits NaN until n rows exist
      (dashboard/components/indicators.py:3). Pass ``min_periods=n`` for
      that parity — implemented as a row-count guard over the same frame.
    """
    frame = w.rowsBetween(-(n - 1), 0)
    agg = getattr(F, fn)(value).over(frame)
    if min_periods is not None:
        return F.when(F.count(value).over(frame) >= min_periods, agg)
    return agg


def prev_available(value: Column, w: WindowSpec) -> Column:
    """W10 — previous *available* value: ``COALESCE(LAG(v), <as-of subquery>)``.

    The reference coalesces LAG with a correlated LIMIT-1 subquery to survive
    gaps (full_stock_pipeline.py:395-400). With a per-key ordered window,
    ``last(v, ignorenulls) over (rows unbounded preceding to -1)`` subsumes
    both terms: it is exactly "the most recent non-null value strictly
    before this row".
    """
    return F.last(value, ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    strict: bool = False,
    right_tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row at-or-before
    (``strict=False``) or strictly-before (``strict=True``) its timestamp.

    ``direction="forward"`` flips the search to the EARLIEST right row
    at-or-after (pandas ``merge_asof(direction='forward')``); the same
    union-tag plan runs with the time ordering reversed, so the cost is
    identical. ``tolerance_sec`` bounds staleness: matches farther than
    the tolerance (in seconds, measured in the search direction) are
    nulled, and the matched timestamp is exposed as ``asof_time`` —
    correct because the nearest match is unique, so if IT violates the
    tolerance no farther row can satisfy it.

    The reference expresses this as a correlated scalar subquery
    ``(SELECT closing_price ... WHERE trade_date < s.date ORDER BY
    trade_date DESC LIMIT 1)`` (full_stock_pipeline.py:397-399;
    analyze_news_stock_patterns.py:184-189) — a nested-loop per row in the
    worst case. The Spark-native plan is the union-tag rewrite:

    1. tag right rows (source) and left rows (probe) and union them,
    2. one window ``partitionBy(on).orderBy(time, is_probe)`` with
       ``last(value, ignorenulls)`` over unbounded-preceding rows,
    3. keep probe rows.

    One shuffle on the join key, linear in rows, no correlated subquery —
    this is the plan that survives 100 TB. Source rows sort before probe
    rows at equal timestamps (strict=False) or after (strict=True), which
    encodes the tie rule without a second pass. ``right_tiebreak`` makes
    the winner among same-timestamp source rows deterministic (greatest
    tiebreak wins, matching ``ORDER BY t DESC, tb DESC LIMIT 1``).
    """
    lcols = left.columns
    tb_type = dict(right.dtypes).get(right_tiebreak, "bigint") if right_tiebreak else "bigint"
    probe = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__probe"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.struct(*lcols).alias("__row"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    source = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__probe"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).cast(tb_type).alias("__tb"),
        F.lit(None).cast(probe.schema["__row"].dataType).alias("__row"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # At equal __t: non-strict wants the source visible to the probe
    # (source first), strict wants it hidden (probe first). Among sources
    # at equal __t the tiebreak orders so the winner sorts LAST (last()
    # wins): backward = greatest tiebreak (ORDER BY t DESC, tb DESC
    # LIMIT 1), forward = smallest (ORDER BY t ASC, tb ASC LIMIT 1).
    # Forward runs the identical plan on the reversed time order — the
    # row immediately preceding the probe in DESC order is the earliest
    # at-or-after match.
    backward = direction == "backward"
    order = [
        F.col("__t").asc() if backward else F.col("__t").desc(),
        F.col("__probe").asc() if not strict else F.col("__probe").desc(),
        F.col("__tb").asc_nulls_first() if backward else F.col("__tb").desc_nulls_first(),
    ]
    w = W.partitionBy("__k").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    tagged = probe.unionByName(source).withColumn(
        "__vt", F.when(F.col("__probe") == 0, F.col("__t"))
    )
    filled = tagged.select(
        "__probe",
        "__row",
        F.col("__t").alias("__pt"),
        F.last(F.col("__vt"), ignorenulls=True).over(w).alias("__asof_t"),
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    probe_rows = filled.filter(F.col("__probe") == 1)
    if tolerance_sec is not None:
        gap = (
            F.unix_micros(F.col("__pt")) - F.unix_micros(F.col("__asof_t"))
            if backward
            else F.unix_micros(F.col("__asof_t")) - F.unix_micros(F.col("__pt"))
        ) / F.lit(1_000_000.0)
        ok = F.col("__asof_t").isNotNull() & (gap <= F.lit(float(tolerance_sec)))
        return probe_rows.select(
            *[F.col("__row")[c].alias(c) for c in lcols],
            F.when(ok, F.col("__asof_t")).alias("asof_time"),
            *[
                F.when(ok, F.col(f"__asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    return probe_rows.select(
        *[F.col("__row")[c].alias(c) for c in lcols],
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
