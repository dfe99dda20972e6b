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
        T.StructField("n_vals", T.LongType()),
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
    n, nv, total, mn, mx = (
        state.get if state.exists else (0, 0, 0.0, None, None)
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        # normalize to epoch micros regardless of the Arrow-side unit
        ts_us = pd.to_datetime(pdf["ts"]).values.astype("datetime64[us]").astype("int64")
        n += len(pdf)
        # SQL sum semantics: NULLs contribute nothing, and a key with NO
        # non-NULL values has a NULL total — pandas' all-NaN sum() is
        # 0.0, which silently diverged from every SQL engine on an
        # all-NULL-value user (r10 adversarial relational battery)
        nv += int(pdf["value"].notna().sum())
        total += float(pdf["value"].sum())
        bmn, bmx = int(ts_us.min()), int(ts_us.max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, nv, total, mn, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total if nv else None],
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


ANOMALY_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)

#: Welford running-statistics state: (n, mean, M2)
ANOMALY_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)


def _update_anomalies(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    min_history: int = 10,
    threshold: float = 3.0,
) -> Iterator[pd.DataFrame]:
    """Score each event against the Welford running mean/stddev of all
    PRIOR events of its key, emit |z| > threshold rows, fold the event
    into state. In-chunk rows sort by (ts, event_id) so the fold order is
    the event-time order regardless of Arrow chunk layout — the
    order-sensitivity rule from the module docstring, satisfied by
    sorting rather than by assuming source order."""
    import math

    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out_rows = []
    # a key's batch rows can span several Arrow chunks: buffer the whole
    # batch for this key, then ONE event-time sort over all of it (state
    # is per key per batch — bounded by the key's batch volume)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        ts_us = pd.to_datetime(pdf["ts"]).values.astype("datetime64[us]").astype("int64")
        for eid, t_us, x in zip(pdf["event_id"], ts_us, pdf["value"]):
            x = float(x)
            if n >= min_history:
                sd = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
                if sd > 0:
                    z = (x - mean) / sd
                    if abs(z) > threshold:
                        out_rows.append(
                            (int(key[0]), int(eid), int(t_us), x, z)
                        )
            n += 1
            delta = x - mean
            mean += delta / n
            m2 += delta * (x - mean)
    state.update((n, mean, m2))
    yield pd.DataFrame(
        out_rows, columns=["user_id", "event_id", "ts_us", "value", "z"]
    )


def streaming_anomalies(stream: DataFrame, ) -> DataFrame:
    """Per-key streaming anomaly detector: each event z-scored against
    the expanding history of its OWN key, maintained as Welford (n,
    mean, M2) state across micro-batches — constant state per key, one
    state-partition shuffle per batch. The batch-SQL equivalent is the
    expanding-window z-score (cumulative frame ending at 1 PRECEDING),
    which is exactly what the oracle runs."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_anomalies,
        outputStructType=ANOMALY_OUTPUT,
        stateStructType=ANOMALY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
