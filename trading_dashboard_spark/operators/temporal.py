"""Temporal operators Spark lacks natively — bucketed range join and
multi-resolution (hypertable-style) rollups.

**Range join.** ``point BETWEEN interval_start AND interval_end`` is a
theta-join: Spark's only native strategy is BroadcastNestedLoop (O(n·m)
predicate evaluations, broadcast side must fit in memory). The standard
scale rewrite (what Databricks' range-join optimization and KDB window
joins do) is bucketing: quantize time into fixed buckets, explode each
interval to every bucket it covers, equi-join points to intervals on the
bucket id, then apply the exact BETWEEN as a residual filter. The
equi-join shuffles on a small int key, parallelizes like any hash join,
and evaluates the predicate only on per-bucket co-residents. Bucket width
tunes replication: intervals explode to ~(len/width + 1) rows, so pick
width at or above the typical interval length.

**Multi-resolution rollup.** Hypertable-style continuous aggregates keep
the same measure at several grains (hour/day/…). One explode of per-row
(resolution, bucket) pairs feeds a single partial-agg shuffle for ALL
grains — rows × |grains| map-side, one exchange, versus one job per
grain. The bucket function is epoch-floor (`unix_ts div width * width`),
which matches DuckDB/Timescale ``time_bucket`` for sub-week widths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def time_bucket(ts: Column, width_seconds: int) -> Column:
    """Epoch-aligned bucket start (timestamp) — `time_bucket(INTERVAL, ts)`
    semantics for hour/day-class widths."""
    secs = F.unix_timestamp(ts)
    return F.timestamp_seconds((secs - F.pmod(secs, F.lit(width_seconds))))


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval containing them (inclusive ends)
    via bucket equi-join + residual BETWEEN — never a nested loop.

    Column names must be disjoint apart from the join mechanics; the
    output carries all columns from both sides minus the bucket key.
    """
    p = points.withColumn(
        "__b", (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    )
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long"),
            )
        ),
    )
    joined = p.join(iv, "__b", how).filter(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__b")


def multi_resolution_rollup(
    df: DataFrame,
    ts_col: str,
    resolutions: dict[str, int],
    group_cols: list[str],
    agg_exprs: list[Column],
) -> DataFrame:
    """Aggregate the same measures at several time grains in one shuffle.

    Output: ``resolution`` (label), ``bucket_start`` (timestamp),
    ``group_cols``, then the aggregates. Map-side each row fans out to
    |resolutions| (resolution, bucket) pairs; a single partial-aggregated
    exchange produces every grain — the batch equivalent of maintaining a
    hypertable's continuous aggregates together.
    """
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(label).alias("resolution"),
                    time_bucket(F.col(ts_col), width).alias("bucket_start"),
                )
                for label, width in resolutions.items()
            ]
        )
    ).alias("r")
    keep = [c for c in df.columns if c != ts_col]
    exploded = df.select(*keep, pairs).select(
        F.col("r.resolution").alias("resolution"),
        F.col("r.bucket_start").alias("bucket_start"),
        *keep,
    )
    return exploded.groupBy("resolution", "bucket_start", *group_cols).agg(*agg_exprs)


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: rows of the same ``key`` whose
    consecutive timestamps are ≤ ``gap_seconds`` apart share a session.

    The classic two-window composition — ``lag`` marks session starts
    (gap strictly greater than the threshold, or first row), a running
    sum over the same (partition, order) turns the marks into dense
    per-key session ids. Both windows share one sort and one shuffle on
    ``key``; downstream ``groupBy(key, session_id)`` needs no further
    exchange (hash-partitioning on ``key`` already satisfies the
    clustering requirement for any key-prefixed grouping). Event-time
    ties land in the same session regardless of tiebreak order (their
    gap is 0), so the ``tiebreak`` column only pins ordering
    determinism for downstream first/last-in-session reads.

    Batch twin of ``streaming/windows.session_aggregate`` (the
    session-window streaming aggregation); the reference has no session
    concept — this is the scale-tier extension for event/clickstream
    tables.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(key).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    # gap in µs computed driver-side: a Column-side `lit(gap) * 1_000_000`
    # would multiply as INT32 and wrap negative for gaps ≥ ~36 min
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    is_start = (prev.isNull() | ((us - prev) > gap_us)).cast("long")
    running = F.sum(is_start).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return df.withColumn(out_col, running)


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, then
    for each day-offset 0..max_offset the count of cohort users active
    that day — the standard activation/retention analysis shape.

    Plan: one explicit repartition on user_id that BOTH the
    (user, activity_day) distinct and the per-user cohort-day window
    reuse — hash(user_id) clusters every (user_id, day) group, so the
    distinct's ClusteredDistribution is already satisfied and the window
    adds no exchange — then one aggregate to the (cohort_day, offset)
    matrix. No join: the cohort day travels with each activity row via
    the window. Two exchanges total over per-user-day data regardless of
    raw event volume (plan-tested).
    """
    days = (
        df.select(F.col(user_col).alias("user_id"), F.to_date(ts_col).alias("day"))
        .repartition("user_id")
        .distinct()
    )
    w = W.partitionBy("user_id")
    with_cohort = days.withColumn("cohort_day", F.min("day").over(w))
    return (
        with_cohort.withColumn("day_offset", F.datediff("day", "cohort_day"))
        .filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )
