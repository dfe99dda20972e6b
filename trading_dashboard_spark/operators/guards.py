"""Scale guards — fail-fast checks for operators with known blow-up modes.

The engine ships exact all-pairs ground-truth operators (n-gram Jaccard,
cosine near-dup, per-vector kNN) as the recall oracles for their
LSH/blocked scale paths. They are O(n²) by design — correct at test
scale, a cluster-killer if someone points them at a corpus. The guard
makes that misuse a loud, immediate error instead of a runaway job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Unblocked all-pairs above this row count refuses to run. 20k rows is
#: ~2·10⁸ pairs — still minutes on a laptop, days at corpus scale.
MAX_UNBLOCKED_ROWS = 20_000


def guard_quadratic(
    df: DataFrame,
    blocked: bool,
    allow_quadratic: bool,
    op_name: str,
    max_rows: int = MAX_UNBLOCKED_ROWS,
) -> None:
    """Refuse an unblocked all-pairs run over more than ``max_rows`` rows.

    ``blocked`` (a block/bucket key is in play) or ``allow_quadratic=True``
    skips the check; otherwise one cheap ``count()`` decides — negligible
    next to the quadratic it prevents."""
    if blocked or allow_quadratic:
        return
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{op_name}: {n} unblocked rows is O(n^2) (~{n * (n - 1) // 2} "
            f"pairs). Pass block_col= (e.g. an LSH bucket or source key) to "
            f"bound the quadratic per block, or allow_quadratic=True for "
            f"deliberate test-scale ground-truth runs."
        )
