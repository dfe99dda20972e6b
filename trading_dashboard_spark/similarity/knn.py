"""Embedding similarity search — exact (brute-force) cosine kNN.

Extension tier (SURVEY.md §2.11 X3). The exact path is the correctness
baseline and the oracle for the approximate path (`lsh.py`). All vector
math runs through `aggregate`/`zip_with` higher-order functions on
`array<double>` — JVM-side, codegen'd, no UDF.

Scale design: `knn_to_probe` broadcasts the probe vector (a literal in the
plan) and is a single scan + TakeOrderedAndProject — embarrassingly
parallel. `knn_all_pairs` is O(n²) and exists for test-scale ground truth
and for *within-bucket* scoring after LSH blocking; never run it unblocked
on a large corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..functions import pround


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity with zero-norm guard (NULL, mirroring NULLIF
    semantics used throughout the reference for divide-by-zero)."""
    a, b = _as_double(a), _as_double(b)
    den = l2_norm(a) * l2_norm(b)
    return dot(a, b) / F.when(den != 0.0, den)


def embedding_norms(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """X5 — typed array-column plumbing: dimension, L2 norm, mean component."""
    v = _as_double(F.col(vec_col))
    return df.select(
        "*",
        F.size(F.col(vec_col)).alias("dim"),
        pround(l2_norm(v), 6).alias("l2_norm"),
        pround(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
            / F.size(F.col(vec_col)).cast("double"),
            6,
        ).alias("mean_component"),
    )


def knn_to_probe(
    df: DataFrame,
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k nearest to one probe vector by cosine — single scan, no shuffle
    beyond the k-row heap merge (TakeOrderedAndProject)."""
    p = F.array(*[F.lit(float(x)) for x in probe])
    sim = pround(cosine_sim(F.col(vec_col), p), 6)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (extension tier, X2/X3).

    Emits one row per unordered pair with cosine >= threshold, keyed so the
    smaller id is `keep_id` — the min-id-survives dedup convention shared
    with exact_dedup (text/dedup.py). Without `block_col` the pair space is
    O(n²) (test-scale / within-bucket use, size-guarded); with it (LSH
    bucket id from lsh.py) candidates are generated per bucket, which is
    the 100 TB path: shuffle on bucket id, quadratic only within buckets.
    """
    from ..io.readers import spread
    from ..operators.guards import guard_quadratic

    guard_quadratic(df, block_col is not None, allow_quadratic, "cosine_near_dup_pairs")

    sel = [F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")]
    if block_col:
        sel.append(F.col(block_col).alias("blk"))
    base = spread(df, id_col).select(*sel).withColumn("n", l2_norm(F.col("v")))
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    den = F.col("a.n") * F.col("b.n")
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("keep_id"),
            F.col("b.id").alias("drop_id"),
            pround(
                dot(F.col("a.v"), F.col("b.v")) / F.when(den != 0.0, den), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def knn_all_pairs(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Per-vector top-k neighbors by cosine (exact).

    Without `block_col` this is the O(n²) ground truth (size-guarded);
    with it (e.g. an LSH bucket id) the quadratic term is bounded per
    block — the scale path. Self-pairs excluded; ties broken by neighbor id.
    """
    from ..io.readers import spread
    from ..operators.guards import guard_quadratic

    guard_quadratic(df, block_col is not None, allow_quadratic, "knn_all_pairs")

    sel = [F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")]
    if block_col:
        sel.append(F.col(block_col).alias("blk"))
    # Norms precomputed per vector: cosine per pair then costs one dot
    # product, not one dot + two norms (O(pairs·dim) saved).
    base = spread(df, id_col).select(*sel).withColumn("n", l2_norm(F.col("v")))
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") != F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    den = F.col("a.n") * F.col("b.n")
    pairs = a.join(b, cond).select(
        F.col("a.id").alias("id"),
        F.col("b.id").alias("neighbor_id"),
        pround(dot(F.col("a.v"), F.col("b.v")) / F.when(den != 0.0, den), 6).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "neighbor_id", "cosine", "rnk")
    )
