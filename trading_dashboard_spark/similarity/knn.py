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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..functions import lit_doubles, pround


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


def cosine_sim_arrow(a: Column, b: Column, digits: int = 6) -> Column:
    """Arrow-batched pair cosine: one einsum + two norm calls per batch
    instead of interpreted per-element lambdas — the scoring kernel for
    scan-heavy paths (probe search, candidate scoring). Matches the
    expression form exactly at ``digits``: floor-based half-up rounding
    (``pround``) and NULL on zero norms."""
    from pyspark.sql.functions import pandas_udf

    factor = float(10**digits)

    @pandas_udf("double")
    def _cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        ma = np.array(sa.tolist(), dtype=np.float64)
        mb = np.array(sb.tolist(), dtype=np.float64)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        zero = den == 0
        res = (
            np.floor(
                np.einsum("ij,ij->i", ma, mb) / np.where(zero, 1.0, den) * factor
                + 0.5
            )
            / factor
        )
        out = pd.array(res, dtype="Float64")
        out[zero] = pd.NA
        return pd.Series(out)

    return _cos(a, b)


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
    vectorized: bool = True,
) -> DataFrame:
    """Top-k nearest to one probe vector by cosine — single scan, no shuffle
    beyond the k-row heap merge (TakeOrderedAndProject).

    ``vectorized=True`` (default) scores each Arrow batch with one BLAS
    matvec — higher-order-function array math is interpreted per element
    (outside whole-stage codegen), so at dim×corpus scale the batch path
    is ~5-10× faster. Rounding uses the same floor-based half-up as
    ``pround``, and zero-norm vectors yield NULL in both paths, so the two
    forms are value-identical (the oracle checks the vectorized one)."""
    if vectorized:
        from pyspark.sql.functions import pandas_udf

        p = np.asarray(probe, dtype=np.float64)
        pn = float(np.linalg.norm(p))

        @pandas_udf("double")
        def _probe_cos(v: pd.Series) -> pd.Series:
            m = np.array(v.tolist(), dtype=np.float64)
            den = np.linalg.norm(m, axis=1) * pn
            zero = den == 0
            res = np.floor((m @ p) / np.where(zero, 1.0, den) * 1e6 + 0.5) / 1e6
            out = pd.array(res, dtype="Float64")
            out[zero] = pd.NA
            return pd.Series(out)

        sim = _probe_cos(F.col(vec_col))
    else:
        parr = lit_doubles(probe)
        sim = pround(cosine_sim(F.col(vec_col), parr), 6)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_batch_probes(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "vec_id",
    probe_vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """X3 serving shape — BATCHED probe search: top-k neighbors for a
    caller-supplied set of query vectors in ONE corpus scan (the
    nearest-neighbor request batch a retrieval service actually issues;
    per-probe scans would multiply the scan cost by batch size).

    ``probes`` is any DataFrame of (probe_id, vector) — a filtered slice
    of the corpus, a lookup of request ids, or externally supplied query
    vectors. It must be KB-scale (batch × dim): the plan broadcasts it
    and fans each corpus row out to its probe pairs map-side, scoring
    with the Arrow batch kernel (cosine_sim_arrow — one BLAS pass per
    Arrow batch, ~10× the interpreted HOF fold). WindowGroupLimit prunes
    to the per-probe top-k before any full sort; corpus vectors never
    shuffle — only (probe_id, neighbor_id, score) triples do.

    ``exclude_self`` drops rows where neighbor_id == probe_id (the
    corpus-member-as-probe case).

    Returns (probe_id, neighbor_id, cosine, rnk), rnk 1..k per probe
    with (cosine DESC, neighbor_id) deterministic ordering.
    """
    from pyspark.sql import Window as W

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v")
    )
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        _as_double(F.col(probe_vec_col)).alias("pv"),
    )
    scored = c.crossJoin(F.broadcast(p))
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("probe_id"))
    scored = scored.select(
        "probe_id", "neighbor_id",
        cosine_sim_arrow(F.col("v"), F.col("pv")).alias("cosine"),
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    allow_quadratic: bool = False,
    lane: str = "auto",
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (extension tier, X2/X3).

    Emits one row per unordered pair with cosine >= threshold, keyed so the
    smaller id is `keep_id` — the min-id-survives dedup convention shared
    with exact_dedup (text/dedup.py). Without `block_col` the pair space is
    O(n²) (test-scale / within-bucket use, size-guarded); with it (LSH
    bucket id from lsh.py) candidates are generated per bucket, which is
    the 100 TB path: shuffle on bucket id, quadratic only within buckets.

    ``lane``: "auto" (default) scores blocked runs with the chunked-BLAS
    pair scan (:func:`_blocked_pair_scan` — pairs never materialize as
    shuffled rows); "join" forces the expression pair-join lane (the
    oracle-shaped reference path, also the only lane for unblocked runs).
    A lane-equality test asserts identical rows at test scale.
    """
    from ..io.readers import spread
    from ..operators.guards import guard_quadratic

    guard_quadratic(df, block_col is not None, allow_quadratic, "cosine_near_dup_pairs")

    if block_col and lane != "join":
        return _blocked_pair_scan(df, threshold, id_col, vec_col, block_col)

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


def _blocked_pair_scan(
    df: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    block_col: str,
) -> DataFrame:
    """Block-local threshold pair scan as chunked BLAS gram matrices.

    The join lane materializes every within-block candidate pair as a
    shuffled ROW carrying both vectors, then folds a per-pair interpreted
    dot product — O(block²) rows through the exchange. Here each block is
    one ``applyInPandas`` group: pairs never exist as rows, only as cells
    of a (chunk × block) gram product, and only the cells clearing the
    threshold are emitted (near-dup output is sparse by definition). The
    per-block flop count is identical; it just runs as BLAS instead of a
    pair shuffle — the same restructuring that took lsh_knn's bucket
    lane from 42 s to 1.4 s at the ×10 sweep. Measured on
    semantic_dedup_survivors' pair stage at ×10: 500 s (join lane, 16
    buckets × ~15k rows) → single-digit seconds.

    Semantics match the join lane cell-for-cell: cosine =
    ``floor(dot/(‖a‖·‖b‖)·1e6 + 0.5)/1e6`` (the ``pround`` primitive
    replayed in numpy), zero-norm rows drop out (NULL in the join lane,
    NaN here — both fail ``>= threshold``), each unordered pair emitted
    once with ``keep_id < drop_id``. Chunking bounds gram memory at
    512 × block rows, so a skewed block costs time, not heap.

    Determinism (ADVICE r7): BLAS uses blocked/pairwise summation while
    the join lane's ``F.aggregate`` fold accumulates LEFT TO RIGHT, so a
    raw cosine can differ by ~1 ULP between lanes — harmless except for
    a value sitting essentially ON a 6dp rounding boundary, where 1 ULP
    flips the rounded output. Summation-order drift for a dim-d dot of
    unit-scale vectors is bounded by ~d·eps ≈ 1.4e-14 absolute at d=64;
    cells whose pre-rounded value lies within 1e-12 of a boundary
    (1e-6 micro-units — two orders above that bound, vanishingly rare
    on real data) are therefore RECOMPUTED with the join lane's exact
    left-to-right accumulation (dot and both norms) before rounding,
    making the two lanes bit-equal by construction rather than
    empirically at one scale. Threshold comparison happens after
    rounding, so it inherits the same guarantee.
    """
    from ..io.readers import spread

    rows = spread(df, block_col).select(
        F.col(block_col).alias("blk"),
        F.col(id_col).cast("long").alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
    )

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(np.int64)
        n = len(ids)
        empty = pd.DataFrame(
            {"keep_id": pd.Series(dtype=np.int64),
             "drop_id": pd.Series(dtype=np.int64),
             "cosine": pd.Series(dtype=np.float64)}
        )
        if n < 2:
            return empty
        M = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(M, axis=1)

        def _fold_cosine(i: int, j: int) -> float:
            """The join lane's exact arithmetic: left-to-right fold for
            the dot and both squared norms (F.aggregate order)."""
            a, b = M[i], M[j]
            d = na = nb = 0.0
            for t in range(a.shape[0]):
                d += a[t] * b[t]
                na += a[t] * a[t]
                nb += b[t] * b[t]
            den = np.sqrt(na) * np.sqrt(nb)
            return d / den if den else np.nan

        out = []
        for lo in range(0, n, 512):
            hi = min(lo + 512, n)
            den = norms[lo:hi, None] * norms[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                C = M[lo:hi] @ M.T / den
            # re-fold cells within 1e-12 of a 6dp rounding boundary so
            # lane outputs are bit-equal (see docstring)
            frac = np.abs(np.mod(C * 1e6, 1.0) - 0.5)
            ri, rj = np.nonzero(frac < 1e-6)
            for i_, j_ in zip(ri, rj):
                C[i_, j_] = _fold_cosine(lo + i_, j_)
            C = np.floor(C * 1e6 + 0.5) / 1e6  # pround(x, 6)
            ii, jj = np.nonzero(C >= threshold)  # NaN (zero norm) fails
            a, b = ids[lo + ii], ids[jj]
            keep = a < b  # once per unordered pair, no self-pairs
            out.append((a[keep], b[keep], C[ii, jj][keep]))
        if not out:
            return empty
        return pd.DataFrame(
            {"keep_id": np.concatenate([o[0] for o in out]),
             "drop_id": np.concatenate([o[1] for o in out]),
             "cosine": np.concatenate([o[2] for o in out])}
        )

    return rows.groupBy("blk").applyInPandas(
        _scan, "keep_id long, drop_id long, cosine double"
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
