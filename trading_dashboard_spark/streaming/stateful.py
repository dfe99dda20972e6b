"""Custom stateful streaming operators — `applyInPandasWithState`.

The streaming tier's built-in operators (watermarked dedup, tumbling /
session windows) cover everything the reference's daily batch needs; this
module is the escape hatch for semantics Structured Streaming's built-ins
can't express: arbitrary per-key state carried across micro-batches,
updated by user code on each batch's rows (Arrow-batched, not per-row).

Design rules for stateful ops at scale:
- **State must be small and bounded per key** — here a fixed-width tuple
  of counters; state volume grows with distinct keys, never with events.
- **Updates must be order-insensitive within and across micro-batches**
  (count/sum/min/max-style), because a file/replayed source does not
  guarantee event-time ordering between batches. Order-sensitive state
  (e.g. streaming EMA) additionally needs event-time sorted sources or
  watermark-delayed emission.
- **Emission is monotone** — each batch emits the key's updated running
  totals; `n_events` strictly grows, so "the row with the max n_events
  per key" is the final state regardless of sink ordering. That makes the
  operator's end-state comparable against a plain batch aggregate, which
  is exactly how the oracle checks it.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("min_ts_us", T.LongType()),
        T.StructField("max_ts_us", T.LongType()),
    ]
)

RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mn_us", T.LongType()),
        T.StructField("mx_us", T.LongType()),
    ]
)


def _update_running_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, mn, mx = state.get if state.exists else (0, 0.0, None, None)
    for pdf in pdfs:
        if not len(pdf):
            continue
        # normalize to epoch micros regardless of the Arrow-side unit
        ts_us = pd.to_datetime(pdf["ts"]).values.astype("datetime64[us]").astype("int64")
        n += len(pdf)
        total += float(pdf["value"].sum())
        bmn, bmx = int(ts_us.min()), int(ts_us.max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, total, mn, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "min_ts_us": [mn],
            "max_ts_us": [mx],
        }
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, first/last event time) maintained in
    group state across micro-batches — the custom-stateful analog of the
    fact-table running totals the reference recomputes daily.

    State per user is 4 scalars; each micro-batch folds its Arrow chunk
    into state and emits the updated totals (update output mode). Keys
    shuffle once per batch to their state partition — state locality, the
    same partitioning every batch.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_state(updates: DataFrame, key: str = "user_id", monotone: str = "n_events") -> DataFrame:
    """Collapse an update-mode emission log to final state: the row with
    the max monotone counter per key (emission is monotone by contract, so
    this is exact and sink-order-independent)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(F.col(monotone).desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
