"""Approximate nearest neighbors — random-hyperplane (SimHash) LSH buckets.

The scale path for X3: bucket vectors by the sign pattern of a few fixed
random projections, then run exact cosine only within buckets. Recall is
tuned by (n_planes, n_tables); the exact `knn.py` path is the oracle for
measuring it.

Hyperplanes are generated driver-side from a fixed seed and enter the plan
as literal arrays — a few KB broadcast inside the serialized plan itself,
deterministic across runs and engines. The bucketing projection is
`aggregate`/`zip_with` column math (JVM-side); the within-bucket scoring
reuses `knn_all_pairs(block_col=...)`, so the quadratic term is bounded by
bucket size instead of corpus size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..functions import pround

from .knn import _as_double, dot, knn_all_pairs


def _planes(dim: int, n_planes: int, seed: int, table: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed + 7919 * table)
    return rng.normal(size=(n_planes, dim))


def random_hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    table: int = 0,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Attach an LSH bucket id: bit b = sign(<v, plane_b>), packed to a long."""
    planes = _planes(dim, n_planes, seed, table)
    v = _as_double(F.col(vec_col))
    bucket: Column = F.lit(0).cast("long")
    for b in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        bit = F.when(dot(v, plane) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket + F.shiftleft(bit, b)
    return df.withColumn(out_col, bucket)


def lsh_knn(
    df: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate per-vector top-k: union candidates from `n_tables`
    independent bucketings, dedup, exact-score, rank.

    Each table contributes an equi-join on its bucket id; more tables →
    higher recall, linearly more candidate pairs. All shuffles key on
    (table, bucket) — small fixed-width keys.
    """
    from pyspark.sql import Window as W

    from ..io.readers import spread

    df = spread(df, id_col)
    cands = None
    for t in range(n_tables):
        bucketed = random_hyperplane_buckets(
            df, dim, n_planes, seed, t, vec_col, "bucket"
        ).select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"), "bucket")
        a, b = bucketed.alias("a"), bucketed.alias("b")
        pairs = a.join(
            b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") != F.col("b.id"))
        ).select(F.col("a.id").alias("id"), F.col("b.id").alias("neighbor_id"),
                 F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.dropDuplicates(["id", "neighbor_id"])
    from .knn import cosine_sim

    scored = cands.select(
        "id", "neighbor_id", pround(cosine_sim(F.col("va"), F.col("vb")), 6).alias("cosine")
    )
    w = W.partitionBy("id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "neighbor_id", "cosine", "rnk")
    )
