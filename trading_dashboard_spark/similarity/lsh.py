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

    base = spread(df, id_col).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    # Candidate generation by bucket aggregation (collect ids per bucket,
    # expand directed pairs in-bucket), NOT a self-join: the candidate
    # shuffle carries (table, bucket, id) rows only — never vectors — and
    # avoids the identical-plan equi self-join shape that intermittently
    # lost rows under AQE (see text/dedup.minhash_near_dup_pairs). Bucket
    # arrays stay small when n_planes is sized so 2^n_planes tracks corpus
    # size; degenerate buckets would surface here as oversized arrays.
    cands = None
    for t in range(n_tables):
        bucketed = random_hyperplane_buckets(base, dim, n_planes, seed, t, "v", "bucket")
        buckets = (
            bucketed.groupBy("bucket")
            .agg(F.collect_list("id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        ids = F.array_sort(F.col("ids"))
        pair_structs = F.flatten(
            F.transform(
                ids,
                lambda x: F.transform(
                    F.filter(ids, lambda y: y != x),
                    lambda y: F.struct(x.alias("id"), y.alias("neighbor_id")),
                ),
            )
        )
        pairs = buckets.select(F.explode(pair_structs).alias("p")).select(
            F.col("p.id").alias("id"), F.col("p.neighbor_id").alias("neighbor_id")
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.dropDuplicates(["id", "neighbor_id"])
    from .knn import dot, l2_norm

    # Vectors re-attach to the deduplicated candidate set only; both joins
    # key on a single id column (sides structurally different — no reused
    # self-exchange). L2 norms are precomputed once per vector here — the
    # naive cosine recomputes both norms for every candidate pair, an
    # O(pairs·dim) tax that dwarfs the O(vectors·dim) it replaces.
    withn = base.select("id", "v", l2_norm(F.col("v")).alias("n"))
    va = withn.select(F.col("id"), F.col("v").alias("va"), F.col("n").alias("na"))
    vb = withn.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    den = F.col("na") * F.col("nb")
    scored = (
        cands.join(va, "id")
        .join(vb, "neighbor_id")
        .select(
            "id",
            "neighbor_id",
            pround(dot(F.col("va"), F.col("vb")) / F.when(den != 0.0, den), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "neighbor_id", "cosine", "rnk")
    )
