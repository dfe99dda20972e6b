"""Stream-stream joins — watermarked interval attribution.

The one Structured Streaming operator family the engine had not yet
exercised: joining two *streams* requires watermarks on both sides plus a
time-range join condition so the state store can expire buffered rows —
without the range bound, each side would buffer forever waiting for
arbitrarily-late matches. With both bounds declared, Spark keeps only the
watermark-horizon window of each side in state: the 100 TB-stream-safe
shape.

Reference analog: attributing a purchase to the click that preceded it
(the funnel the batch as-of join answers retrospectively —
operators/windows.asof_union_tag — computed incrementally here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_attribution(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join right-stream rows to left-stream rows of the same key
    whose timestamp falls within [left_ts, left_ts + horizon].

    Both inputs must be streaming DataFrames; columns are expected to be
    pre-renamed to avoid collisions (the join keeps both sides' columns).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key + "_l") == F.col(key + "_r"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {horizon}"))
    )
    return lw.join(rw, cond, "inner")


def interval_left_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every left row emits —
    matched rows as they pair, UNMATCHED rows with null right columns
    once the watermark proves no in-horizon match can still arrive
    (Structured Streaming buffers the left row in state until
    ``left_ts + horizon`` falls behind the joint watermark, then
    null-emits in a no-data batch).

    The consequence callers MUST handle: left rows younger than
    ``horizon + watermark`` at end-of-stream are still awaiting their
    verdict and are NOT emitted as unmatched — a completeness cutoff
    (filter to mature rows) is required for batch-equivalent results;
    see `streaming_abandoned_clicks` for the canonical binding.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key + "_l") == F.col(key + "_r"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {horizon}"))
    )
    return lw.join(rw, cond, "left_outer")
