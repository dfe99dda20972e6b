"""Distributed Gram / covariance-matrix build — the big-data-small-model
kernel under PCA, whitening, and ridge normal equations.

The dim×dim second-moment matrix X'X is an aggregation whose STATE is tiny
(dim² doubles) but whose naive DataFrame form (posexplode i × posexplode j
→ dim² rows per vector → hash aggregate) pays row-materialization cost
proportional to n·dim² — correct, shuffle-bounded, but CPU-heavy. The
scale form here computes each PARTITION's Gram contribution with one BLAS
matmul over the Arrow batch (numpy ``X.T @ X``), emitting dim² partial
rows per partition, then one final (i, j) aggregate over
partitions × dim² rows: identical algebra, ~dim× less per-row overhead,
vectors never shuffled.

Both forms sum the same products in different association orders; callers
anchoring cross-engine equality should round the result (the 10dp anchor
used by the PCA query) exactly as with any distributed sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def gram_matrix(
    df: DataFrame, vec_col: str = "v", dim: int | None = None
) -> DataFrame:
    """Second-moment relation of a vector column: one row per (i, j) in
    1..dim × 1..dim with ``sum_xy`` = Σ v[i]·v[j] and ``n`` = row count
    (so mean products / covariance derive downstream). 1-based indices
    to match SQL array convention.

    mapInPandas partial Gram per Arrow batch (numpy matmul — one BLAS
    call), carried as dim² (i, j, partial) rows per batch; the final
    groupBy(i, j) aggregate sees ≤ batches × dim² rows regardless of
    corpus size.
    """
    import numpy as np
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("sum_xy", T.DoubleType()),
            T.StructField("n_part", T.LongType()),
        ]
    )

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            g = X.T @ X
            d = g.shape[0]
            ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1),
                                 indexing="ij")
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "sum_xy": g.ravel(),
                    "n_part": np.full(d * d, len(pdf), dtype="int64"),
                }
            )

    parts = df.select(F.col(vec_col).alias(vec_col)).mapInPandas(part, schema)
    return parts.groupBy("i", "j").agg(
        F.sum("sum_xy").alias("sum_xy"), F.sum("n_part").alias("n")
    )
