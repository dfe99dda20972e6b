"""Grouped sequential processing without per-group Arrow batches.

``groupBy().applyInPandas`` ships ONE Arrow batch and makes ONE Python
call PER GROUP. For a few large groups that's fine; for many small keys
(thousands of symbols × one row per trading day) the per-group round-trip
dominates — measured here, an *identity* grouped-map over 1,500 keys /
40k rows costs ~3 s while ``mapInPandas`` over the same rows costs 0.2 s.

``grouped_sorted_map`` gets the same per-key-sequential semantics from the
streaming lane: repartition by key (each key's rows land in exactly one
partition), sort within partitions by (key, order) (each group is a
contiguous sorted run), then ``mapInPandas`` over ~10k-row Arrow batches,
carrying the trailing partial group across batch boundaries so ``fn``
always sees whole groups. One shuffle + one sort — the same exchange the
grouped-map would pay — but thousands of groups per Python call instead
of one.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def grouped_sorted_map(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    fn: Callable,
    out_schema: str,
) -> DataFrame:
    """Apply ``fn(pdf) -> pdf`` to Arrow batches in which every key group
    is whole and sorted by ``order``; a batch holds MANY groups, so ``fn``
    must group internally (``pdf.groupby(keys, sort=False)`` — groups are
    contiguous and in partition order)."""
    parts = df.repartition(*keys).sortWithinPartitions(*keys, *order)

    def run(batches) -> Iterator:
        import pandas as pd

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # trailing rows of the last key may continue in the next batch;
            # keys are partition-contiguous, so the equality mask is a
            # single trailing run
            last = pdf[keys].iloc[-1]
            tail = (pdf[keys] == last).all(axis=1).values
            split = len(pdf) - int(tail.sum())
            emit, carry = pdf.iloc[:split], pdf.iloc[split:]
            if len(emit):
                yield fn(emit)
        if carry is not None and len(carry):
            yield fn(carry)

    return parts.mapInPandas(run, schema=out_schema)
