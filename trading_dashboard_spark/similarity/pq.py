"""Product quantization (PQ) — the billion-vector ANN compression tier.

Where SQ8 (similarity/quantize) stores one int8 per DIMENSION, PQ stores
one code per SUBSPACE: the vector splits into ``m`` contiguous
sub-vectors, each quantized to its nearest centroid from a per-subspace
codebook of ``ksub`` entries, so a dim-d float32 vector compresses to
``m`` uint8 codes (d·4 → m bytes; 64-dim → 8 bytes at m=8). Scoring a
query against a coded corpus is Asymmetric Distance Computation (ADC):
precompute the query's dot product against every codebook centroid once
(m × ksub table), then each corpus vector's approximate score is a pure
TABLE-LOOKUP SUM over its codes — no float vector is ever touched at
scan time. This is the FAISS IVFPQ payload layout; composed with the
IVF partition pruning (similarity/ivf) it is how billion-vector serving
actually works.

Spark-first shapes, mirroring the sibling modules' discipline:

- fit: bounded seeded sample (the ivf.fit_centroids pattern), per-
  subspace Lloyd k-means driver-side, codebooks rounded to 6 dp so they
  serialize as compact plan literals (oracle-replayable);
- encode: one Arrow batch pass (mapInPandas-free — a vectorized pandas
  UDF), map-only, emitting ``array<smallint>`` codes (Spark has no
  unsigned byte; ksub ≤ 256 fits smallint losslessly);
- ADC scoring: the m×ksub lookup table enters the plan as a broadcast
  literal array and the score is a JVM ``aggregate`` fold over the code
  array — whole corpus scan with zero Python in the hot path;
- rerank: exact dot products on the ADC top-``shortlist`` only (the
  SQ8 rerank pipeline's shape — similarity/quantize).

Reference parity note: the reference has no vector tier at all; this
extends SURVEY §2 X3 the same way IVF/LSH/SQ8 do (cited there).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import lit_double_matrix, lit_doubles, pround


def static_codebooks(
    m: int = 8, ksub: int = 16, dsub: int = 8, seed: int = 11
) -> list[list[list[float]]]:
    """Data-independent codebooks (random unit sub-vectors, 6 dp) — the
    zero-training configuration, mirroring ivf.static_centroids: constant
    at query-build time, so PQ queries over them are fully static-SQL
    oracle-checkable. `fit_codebooks` is the quality path and is
    recall-/unit-tested instead."""
    from .ivf import _unit_rows

    return [_unit_rows(ksub, dsub, seed + j) for j in range(m)]


def fit_codebooks(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
    seed: int = 42,
    sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks from a bounded seeded sample
    (same sampling discipline as ivf.fit_centroids: Bernoulli sample,
    id-sorted, truncated — deterministic for a fixed layout; the
    collect is bounded by ``sample_n``, never corpus size).

    Returns ``m`` codebooks of ``ksub`` centroids of dim/m components,
    rounded to 6 dp (plan-literal / oracle-serializable form).
    """
    sel = df.select(id_col, vec_col)
    total = df.count()
    if total > sample_n:
        frac = min(1.0, 1.3 * sample_n / total)
        sel = sel.sample(fraction=frac, seed=seed).limit(4 * sample_n)
    rows = sorted(sel.collect(), key=lambda r: r[0])[:sample_n]
    if len(rows) < ksub:
        raise ValueError(
            f"PQ codebook fit needs at least ksub={ksub} sample vectors; "
            f"got {len(rows)} (corpus or sample too small — lower ksub or "
            f"raise sample_n)")
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cents = S[rng.choice(len(S), size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                members = S[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([[round(float(x), 6) for x in c] for c in cents])
    return books


def encode_pq(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Map-only PQ encoding: each vector's ``m`` sub-vectors take the
    index of their nearest (L2) codebook centroid. One vectorized Arrow
    batch pass; codebooks ride the closure (KB-scale broadcast)."""
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]

    @pandas_udf("array<smallint>")
    def _enc(v: pd.Series) -> pd.Series:
        X = np.array(v.tolist(), dtype=np.float64)
        codes = np.empty((len(X), m), dtype=np.int16)
        for j, B in enumerate(books):
            S = X[:, j * dsub : (j + 1) * dsub]
            # ||s - b||^2 = ||s||^2 - 2 s·b + ||b||^2 ; argmin drops ||s||^2
            d = -2.0 * (S @ B.T) + (B * B).sum(axis=1)[None, :]
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(code_col, _enc(F.col(vec_col)))


def encode_pq_expr(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    vectorized: bool = True,
) -> DataFrame:
    """Oracle-replayable PQ encoding — value-identical to `encode_pq`'s
    layout but bit-reproducible across engines (the assign_cells
    discipline): per subspace the centroid score is the expanded-form
    L2 proxy ``-2·<s,b> + <b,b>`` with the ``<b,b>`` term a literal,
    FLOOR-ROUNDED to 6 dp BEFORE the argmin, ties to the smaller code —
    so a SQL oracle replays every code exactly.

    ``vectorized=True`` (default) computes the same rounded argmin as
    one Arrow batch matmul per subspace (numpy argmin takes the first
    minimum = the smallest code) — the interpreted higher-order-function
    fold form costs m×ksub per-element lambda steps per row and
    measured 9.6 s vs DuckDB's 0.2 s at the ×10 sweep; the Arrow kernel
    collapses that to a BLAS call per (batch, subspace). The rounding
    to 6 dp absorbs the matmul-vs-fold summation-order ulps exactly as
    `ivf.assign_cells(vectorized=True)` does (5 rounds hash-green on
    that precedent). ``vectorized=False`` keeps the pure-expression
    plan (no Python evaluator) for plan tests and environments without
    Arrow workers."""
    if vectorized:
        books = [np.array(b, dtype=np.float64) for b in codebooks]
        m = len(books)
        dsub = books[0].shape[1]

        @pandas_udf("array<smallint>")
        def _enc(v: pd.Series) -> pd.Series:
            X = np.array(v.tolist(), dtype=np.float64)
            codes = np.empty((len(X), m), dtype=np.int16)
            for j, B in enumerate(books):
                S = X[:, j * dsub : (j + 1) * dsub]
                d = -2.0 * (S @ B.T) + (B * B).sum(axis=1)[None, :]
                d = np.floor(d * 1e6 + 0.5) / 1e6
                codes[:, j] = d.argmin(axis=1)
            return pd.Series(list(codes))

        return df.withColumn(code_col, _enc(F.col(vec_col)))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for j, book in enumerate(codebooks):
        s = F.slice(v, j * dsub + 1, dsub)
        entries = []
        for c, cent in enumerate(book):
            b = lit_doubles(cent)
            bb = float(np.dot(np.asarray(cent), np.asarray(cent)))
            d = pround(
                F.lit(-2.0)
                * F.aggregate(
                    F.zip_with(s, b, lambda a, y: a * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                + F.lit(bb),
                6,
            )
            entries.append(F.struct(d.alias("d"), F.lit(c).alias("cid")))
        best = F.array_min(F.array(*entries))
        codes.append(best["cid"].cast("smallint"))
    return df.withColumn(code_col, F.array(*codes))


def adc_table(query: list[float], codebooks: list[list[list[float]]],
              digits: int = 6) -> list[list[float]]:
    """The query's dot-product lookup table: table[j][c] = <q_j, B_j[c]>,
    rounded so the same literals replay in a DuckDB oracle."""
    q = np.asarray(query, dtype=np.float64)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    out = []
    for j in range(m):
        qj = q[j * dsub : (j + 1) * dsub]
        B = np.array(codebooks[j], dtype=np.float64)
        out.append([round(float(x), digits) for x in (B @ qj)])
    return out


def adc_score(code_col: Column | str, table: list[list[float]]) -> Column:
    """JVM-side ADC: approximate <q, x> as the sum of per-subspace table
    lookups over the code array — a codegen-able ``aggregate`` fold with
    the lookup table as a nested array literal; no Python, no float
    vectors read. The fold carries (subspace index, acc) in a struct.

    With a string-name ``code_col`` the WHOLE scorer (table literals +
    fold lambda) is one parsed SQL expression: assembled from F.lit /
    Python lambdas it costs a py4j round trip per node, rebuilt on
    every query call — plan construction was ~half the measured ivfpq
    wall time at ×10. The Column form remains for composed exprs."""
    tbl_sql = ",".join(
        "array(" + ",".join(f"{float(v)!r}D" for v in row) + ")"
        for row in table
    )
    if isinstance(code_col, str):
        return F.expr(
            f"aggregate({code_col}, struct(0 as j, 0.0D as s), "
            f"(acc, c) -> struct(acc.j + 1 as j, acc.s + element_at("
            f"element_at(array({tbl_sql}), acc.j + 1), cast(c as int) + 1)"
            f" as s)).s"
        )
    tbl = lit_double_matrix(table)
    folded = F.aggregate(
        code_col,
        F.struct(F.lit(0).alias("j"), F.lit(0.0).alias("s")),
        lambda acc, c: F.struct(
            (acc["j"] + 1).alias("j"),
            (acc["s"]
             + F.element_at(F.element_at(tbl, acc["j"] + 1), c.cast("int") + 1)
             ).alias("s"),
        ),
    )
    return folded["s"]


def dot_literal(vec_col: str, values: list[float]) -> Column:
    """Exact ``<vec_col, values>`` as one parsed fold expression — the
    same left-to-right ``zip_with``+``aggregate`` sum the engine uses
    everywhere (identical summation order, identical doubles), minus
    the per-node py4j construction cost of the Python-lambda form."""
    vals = ",".join(f"{float(v)!r}D" for v in values)
    return F.expr(
        f"aggregate(zip_with({vec_col}, array({vals}), (a, b) -> a * b), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def pq_search(
    df: DataFrame,
    query: list[float],
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    rerank: bool = True,
) -> DataFrame:
    """ADC scan → top-``shortlist`` → exact rerank → top-``k``.

    The scan phase reads ONLY the code column (m smallints/vector); the
    exact phase touches float vectors for ``shortlist`` rows — the
    two-tier cost model that makes billion-vector serving affordable.
    With ``rerank=False`` returns the raw ADC top-k (the recall-eval
    path). Scores round to 6 dp before ranking with an id tiebreak
    (registry anchor discipline)."""
    table = adc_table(query, codebooks)
    coded = df if code_col in df.columns else encode_pq(
        df, codebooks, vec_col, code_col
    )
    approx = coded.withColumn(
        "adc_score", pround(adc_score(code_col, table), 6)
    )
    short = approx.orderBy(
        F.col("adc_score").desc(), F.col(id_col)
    ).limit(shortlist)
    if not rerank:
        return short.select(id_col, "adc_score").limit(k)
    exact = short.withColumn(
        "score", pround(dot_literal(vec_col, query), 6)
    )
    return (
        exact.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "score", "adc_score")
    )


def ivfpq_search(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    vectorized: bool = True,
) -> DataFrame:
    """IVF × PQ composition — the complete billion-vector serving shape
    (FAISS IVFPQ): the coarse quantizer prunes the scan to ``nprobe``
    cells (partition pruning against a `ivf.write_inverted_file`
    layout), the ADC table-lookup scores ONLY the m-byte codes inside
    those cells (no float vectors read), and the exact rerank touches
    full vectors for ``shortlist`` rows. Cost per query:
    cells/nprobe-th of the corpus in code bytes + shortlist float rows
    — the two prunings compose multiplicatively.

    Works over an unmaterialized corpus too (on-the-fly cell
    assignment + encode), which is the oracle-checkable form: cells,
    codebooks, and the ADC table are all plan literals."""
    from .ivf import assign_cells, probe_cells

    cells = probe_cells(centroids, query, nprobe)
    # vectorized=True routes assignment through the Arrow batch matmul
    # (value-identical — ivf.assign_cells' floor-rounded argmax); the
    # expression form costs n_cells×dim interpreted lambda steps per row
    assigned = assign_cells(df, centroids, vec_col, vectorized=vectorized)
    if code_col not in assigned.columns:
        assigned = encode_pq(assigned, codebooks, vec_col, code_col)
    table = adc_table(query, codebooks)
    pruned = assigned.filter(F.col("cell").isin(cells))
    approx = pruned.withColumn(
        "adc_score", pround(adc_score(code_col, table), 6)
    )
    short = approx.orderBy(
        F.col("adc_score").desc(), F.col(id_col)
    ).limit(shortlist)
    exact = short.withColumn(
        "score", pround(dot_literal(vec_col, query), 6)
    )
    return (
        exact.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "cell", "score", "adc_score")
    )
