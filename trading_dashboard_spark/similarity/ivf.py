"""IVF (inverted-file) approximate nearest neighbors — coarse-quantizer
cells + probe-pruned exact search.

The second ANN family next to random-hyperplane LSH (lsh.py): vectors are
assigned to the nearest of ``n_cells`` coarse centroids (spherical
k-means); a query scores exactly only the ``nprobe`` cells nearest the
probe, cutting per-query work from O(n) to ~O(n * nprobe / n_cells) at the
cost of recall for vectors whose true neighbors fall in unprobed cells.

Scale design (100 TB):
- **Fit is sample-based.** k-means runs driver-side over a bounded,
  deterministic sample — the standard IVF recipe (train on a few hundred
  vectors per cell); the corpus itself never leaves the executors.
- **Assignment is map-only.** Nearest-centroid is an argmax over
  ``n_cells`` dot products built from plan-literal centroid arrays — no
  shuffle, expression form or a value-identical Arrow matmul kernel
  (``vectorized=True``). Centroids are unit vectors, so ``argmax dot ==
  argmax cosine`` and per-row norms cancel out of the assignment
  entirely.
- **The inverted file is the storage layout.** At rest the corpus is
  written ``partitionBy(cell)`` (see `write_inverted_file`), so a probe's
  cell filter prunes at the file listing — the scan reads nprobe/n_cells
  of the data before any executor runs.
- Dots are rounded to 6 dp before the argmax and ties break toward the
  smaller cell id, making assignment bit-reproducible across engines —
  the oracle SQL replays it with the same centroid literals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import lit_doubles, pround

from .knn import _as_double, cosine_sim, cosine_sim_arrow, dot


def _unit_rows(n: int, dim: int, seed: int) -> list[list[float]]:
    """Fixed-seed random unit vectors, rounded 6 dp (compact, cross-engine
    stable plan/SQL literals)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, dim))
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return [[round(float(x), 6) for x in row] for row in m]


def static_centroids(n_cells: int = 8, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Data-independent coarse quantizer (random unit centroids) — the
    zero-training configuration. Constant at query-build time, so queries
    over it are fully static-SQL oracle-checkable; `fit_centroids` is the
    quality path and is recall-tested against exact kNN instead."""
    return _unit_rows(n_cells, dim, seed)


def fit_centroids(
    df: DataFrame,
    n_cells: int = 8,
    iters: int = 10,
    seed: int = 42,
    sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means coarse quantizer fit on a bounded seeded sample.

    A Bernoulli ``df.sample(fraction, seed)`` feeds the fit — a plain
    filtered scan, no global ordering pass (``orderBy(id).limit(n)`` would
    heap-merge the whole corpus just to pick ids). The one ``count()``
    that sizes the fraction is metadata-cheap on parquet. The collected
    sample is id-sorted driver-side and truncated to ``sample_n``, so the
    fit is deterministic for a fixed data layout; the fit only needs a few
    hundred vectors per cell. Lloyd iterations on L2-normalized vectors
    with cosine assignment; empty cells keep their previous centroid.
    Components round to 6 dp so the fitted quantizer serializes to the
    same compact literal form as `static_centroids`.
    """
    import numpy as np

    sel = df.select(id_col, vec_col)
    total = df.count()
    if total > sample_n:
        # oversample ~30% so the post-truncation count reaches sample_n
        # with near-certainty; hard cap bounds the driver collect anyway
        frac = min(1.0, 1.3 * sample_n / total)
        sel = sel.sample(fraction=frac, seed=seed).limit(4 * sample_n)
    rows = sorted(sel.collect(), key=lambda r: r[0])[:sample_n]
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X = X / norms
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = (X @ cents.T).argmax(axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                s = members.sum(axis=0)
                n = np.linalg.norm(s)
                if n > 0:
                    cents[c] = s / n
    return [[round(float(x), 6) for x in c] for c in cents]


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
    vectorized: bool = False,
) -> DataFrame:
    """Attach the IVF cell id: argmax over centroid dot products.

    Map-only either way — no shuffle; at 100 TB this is a pass over the
    corpus that typically rides along with ingest. The expression form
    (struct array of (rounded dot, -cid), array_max → best dot with ties
    to the smallest cell id) is the bit-reproducible oracle-replayable
    path; ``vectorized=True`` computes the same assignment as one Arrow
    batch matmul + argmax (identical floor-rounding to 6 dp; numpy argmax
    takes the first maximum, which is the smallest cid) — ~n_cells×dim
    interpreted lambda steps per row collapse to one BLAS call per batch.
    """
    if vectorized:
        from pyspark.sql.functions import pandas_udf

        C = np.array(centroids, dtype=np.float64).T  # dim × cells

        @pandas_udf("int")
        def _assign(v: pd.Series) -> pd.Series:
            m = np.array(v.tolist(), dtype=np.float64)
            d = np.floor(m @ C * 1e6 + 0.5) / 1e6
            return pd.Series(np.argmax(d, axis=1).astype(np.int32))

        return df.withColumn(out_col, _assign(F.col(vec_col)))
    v = _as_double(F.col(vec_col))
    entries = [
        F.struct(
            pround(dot(v, lit_doubles(c)), 6).alias("d"),
            F.lit(-i).alias("negcid"),
        )
        for i, c in enumerate(centroids)
    ]
    best = F.array_max(F.array(*entries))
    return df.withColumn(out_col, (-best["negcid"]).cast("int"))


def write_inverted_file(
    df: DataFrame, centroids: list[list[float]], path: str, vec_col: str = "embedding"
) -> None:
    """Materialize the inverted file: corpus partitioned by cell id, so a
    probe's `cell IN (...)` filter becomes partition pruning (the scan
    lists only probed directories)."""
    assign_cells(df, centroids, vec_col).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)


def probe_cells(
    centroids: list[list[float]], probe: list[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` cells nearest the probe vector — computed driver-side
    from constants (centroids and probe are both query parameters), so the
    cell list enters the plan as an IN-literal the scan can prune on."""
    import numpy as np

    C = np.array(centroids, dtype=np.float64)
    p = np.array(probe, dtype=np.float64)
    d = np.round(C @ p, 6)
    order = np.lexsort((np.arange(len(C)), -d))
    return sorted(int(i) for i in order[:nprobe])


def ivf_search(
    df: DataFrame,
    centroids: list[list[float]],
    probe: list[float],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Probe-pruned top-k: filter to the probe's ``nprobe`` cells, exact
    cosine within them, TakeOrderedAndProject. Against a
    `write_inverted_file` layout the cell filter prunes partitions; here it
    composes with on-the-fly assignment so the operator also works over an
    unmaterialized corpus. ``vectorized`` routes assignment and scoring
    through the Arrow batch kernels (value-identical — see assign_cells /
    knn.cosine_sim_arrow)."""
    cells = probe_cells(centroids, probe, nprobe)
    assigned = assign_cells(df, centroids, vec_col, vectorized=vectorized)
    if vectorized:
        pcol = lit_doubles(probe)
        sim = cosine_sim_arrow(F.col(vec_col), pcol)
    else:
        pcol = lit_doubles(probe)
        sim = pround(cosine_sim(F.col(vec_col), pcol), 6)
    return (
        assigned.filter(F.col("cell").isin(cells))
        .select(F.col(id_col), F.col("cell"), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
