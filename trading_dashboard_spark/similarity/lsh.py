"""Approximate nearest neighbors — random-hyperplane (SimHash) LSH buckets.

The scale path for X3: bucket vectors by the sign pattern of a few fixed
random projections, then run exact cosine only within buckets. Recall is
tuned by (n_planes, n_tables); the exact `knn.py` path is the oracle for
measuring it.

Hyperplanes are generated driver-side from a fixed seed — deterministic
across runs — and the projection/scoring math runs in vectorized Arrow
pandas UDFs (one BLAS matmul per batch). This is the documented exception
to the engine's JVM-expression-first rule: higher-order-function array
math is interpreted per element (outside whole-stage codegen), and at
64-dim × thousands of candidate pairs the Arrow batch path is ~5-10×
faster. The oracle-checked exact paths (`knn.py`) stay in expression form
— their left-fold accumulation order is what DuckDB replays bit-for-bit;
here results are rows-only-checked plus a recall floor in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import pround

from .knn import _as_double, dot, knn_all_pairs

#: resolved grid of the most recent `lsh_knn` call —
#: {"n_planes", "n_tables", "n_probes", "adaptive_engaged"} — the
#: runtime signal (ADVICE r7) that an `adaptive_planes=True` call
#: diverged from the static grid a registered SQL oracle replays.
#: Harness/tools can consult this instead of re-deriving the corpus
#: size; `lsh_knn` additionally emits a `warnings.warn` on divergence.
LAST_RESOLVED_GRID: dict | None = None


def _planes(dim: int, n_planes: int, seed: int, table: int = 0) -> np.ndarray:
    """Seeded Gaussian hyperplanes, components ROUNDED to 6dp — the
    rounding makes the planes exact decimal literals, so an oracle can
    embed the identical constants (the IVF `plan literals` discipline)
    and replay bucket assignment bit-for-bit."""
    rng = np.random.RandomState(seed + 7919 * table)
    return np.round(rng.normal(size=(n_planes, dim)), 6)


def lsh_plane_literals(
    dim: int, n_planes: int, seed: int, n_tables: int
) -> list[tuple[int, int, list[float]]]:
    """(table, plane_idx, components) rows for oracle-SQL generation —
    the exact constants `lsh_knn` projects with."""
    out = []
    for t in range(n_tables):
        p = _planes(dim, n_planes, seed, t)
        for b in range(n_planes):
            out.append((t, b, [float(x) for x in p[b]]))
    return out


def random_hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    table: int = 0,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Attach an LSH bucket id: bit b = sign(<v, plane_b>), packed to a long.

    One Arrow batch = one (B×dim)·(dim×planes) matmul + sign-pack — the
    projections for a whole batch cost one BLAS call instead of
    B×planes×dim interpreted lambda steps.
    """
    planes_t = _planes(dim, n_planes, seed, table).T.copy()  # dim × planes
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        m = np.array(v.tolist(), dtype=np.float64)
        # 9dp round before the sign test (the _all_buckets discipline):
        # with 6dp plane literals this makes bucket assignment exact
        # decimal arithmetic a SQL oracle replays bit-for-bit
        bits = (np.round(m @ planes_t, 9) >= 0).astype(np.int64)
        return pd.Series(bits @ weights)

    return df.withColumn(out_col, _bucket(F.col(vec_col)))


def lsh_knn(
    df: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = False,
    bucket_topk: bool = True,
    adaptive_planes: bool = False,
    n_probes: int = 0,
) -> DataFrame:
    """Approximate per-vector top-k: union candidates from `n_tables`
    independent bucketings, dedup, exact-score, rank.

    Each table contributes an equi-join on its bucket id; more tables →
    higher recall, linearly more candidate pairs. All shuffles key on
    (table, bucket) — small fixed-width keys.

    Bucketing projects the RAW vectors straight off `base`
    (sign(<v,p>) == sign(<u,p>) for positive ‖v‖, so hyperplane signs
    are invariant to normalization — and this matches the oracle, which
    buckets the stored vectors). Vectors are unit-normalized once for
    scoring only.

    ``bucket_topk=True`` (default) computes each bucket's LOCAL top-k
    with one chunked BLAS gram matrix per bucket and merges k·n_tables
    candidates per id globally — exactly the global ranking, because
    every global top-k neighbor shares ≥1 bucket with its probe and
    ranks ≤ k inside it. This replaces the O(n²/2^planes) candidate
    PAIR shuffle (measured 42 s at the ×10 sweep: ~700 M directed pairs
    through dropDuplicates + two vector re-attach joins) with an
    O(n·k·n_tables) merge — per-bucket scoring work is the same
    LSH-inherent cost, but it stays inside one Arrow stage as BLAS
    calls. Ties resolve EXACTLY like the join lane ((cosine desc,
    neighbor_id asc)) via an int64 composite key (rounded-cosine
    micro-units ≪ 32 | ~id) — exact for ids < 2^32; beyond that, raise
    planes or fall back to the join lane. ``bucket_topk=False`` keeps
    the pair-join lane (the oracle-shaped reference path, still used by
    plan tests).

    ``persist=True`` (join lane only) caches the normalized relation
    reused by the two scoring joins, scoped to this call.

    ``adaptive_planes=True`` raises ``n_planes`` with corpus size —
    ``max(n_planes, ⌈log2(n/512)⌉)``, one metadata-cheap count — so
    per-bucket population (the quadratic in-bucket scoring term) stays
    ~constant as the corpus grows instead of buckets fattening linearly
    under a fixed 2^planes grid (the semantic-dedup pattern, r7), AND
    compensates the S-curve recall loss by doubling ``n_tables`` per
    two extra planes (extra planes split moderate-cosine neighbors;
    extra independent tables re-catch them). Measured on the ×100
    replica (200k vectors, sampled-exact ground truth over 500 probes):
    the fixed 6-plane/2-table grid reads recall@3 0.18 at 63 s; raising
    planes alone (9/2) collapses recall to 0.05; the compensated point
    (9 planes/8 tables) holds 0.20 at 17.5 s — same recall as the
    static grid, ~3.6× cheaper, with per-bucket work still ~constant in
    corpus size. The plane floor keeps every driver-checked regime on
    the static grid the SQL oracle replays (sf0.01/sf0.1/×10 all
    resolve to the default 6 planes, 2 tables). The resolved grid is
    published through ``LAST_RESOLVED_GRID`` and a ``warnings.warn``
    fires whenever adaptivity diverges from the static literals (so a
    value-checked run at a larger SF gets a runtime signal, not a
    silent oracle mismatch — ADVICE r7).

    ``n_probes > 0`` enables query-directed MULTI-PROBE (Lv et al.,
    VLDB 2007): besides its resident bucket, each vector QUERIES the
    ``n_probes`` adjacent buckets per table reached by flipping the
    hyperplanes with the smallest projection margin — a near-boundary
    vector's most likely miss-assignments. Probe membership is
    query-side only (the database side of every bucket stays the
    resident set), so candidate volume grows ×(1+P) per table instead
    of the ×(1+P)² a symmetric expansion would cost, and the top-k
    semantics stay exact over the enlarged candidate set. Margin
    ranking uses the same 9dp-rounded projections as the sign test with
    (|margin|, plane_idx) ties — exact decimal arithmetic a SQL oracle
    replays bit-for-bit, so the multi-probe pipeline is VALUE-checkable
    end to end. Under ``adaptive_planes``, probes are the cheap recall
    lever: flipping low-margin planes recovers the S-curve loss of a
    finer grid at linear (not exponential-in-tables) cost — the
    measured ×100 frontier is in BENCHMARKS.md.
    """
    import math
    import warnings

    from pyspark.sql import Window as W

    from ..io.readers import spread

    static = (n_planes, n_tables, n_probes)
    if adaptive_planes:
        n = df.count()
        target = max(n_planes, math.ceil(math.log2(max(n, 2) / 512)))
        delta = target - n_planes
        if delta:
            n_tables *= 2 ** ((delta + 1) // 2)
            if n_probes:
                # multi-probe compensation on top of table doubling:
                # +2 probes per extra plane, capped at probing every
                # plane. Measured on the ×100 replica (200k vectors,
                # sampled-exact ground truth, tools/lsh_recall.py; r9
                # frontier extension): (9pl, 8tb) reads recall@3 0.211
                # at 8.5 s with no probes, 0.584 at 18.0 s with 4,
                # 0.659 at 19.2 s with 6, **0.703 at 23.1 s with 8**
                # (the resolved point), and 0.713 at 35.8 s probing
                # all 9 — the fixed merge/window stages dominate until
                # ~P=8, so probes are nearly free recall, and the
                # all-planes point is where candidate scoring finally
                # shows (diminishing returns). Probing INSTEAD of
                # doubling tables was measured and rejected in r8:
                # (9pl, 2tb, 5pr) reads 0.225 — barely the baseline.
                # An SQ8-coarse rerank stage was considered for the r8
                # verdict's ≥0.7 ask and REFUTED by measurement: plain
                # probe-widening reaches 0.703 within 1.3× of the r8
                # cost, so no rerank machinery is warranted.
                n_probes = min(n_planes + delta, n_probes + 2 * delta)
            n_planes = target
    if n_probes > n_planes:
        # each probe flips a distinct lowest-|margin| plane, so at most
        # n_planes probes exist; past that the UDF's reshape would fail
        # with an opaque numpy error at job time (ADVICE r8)
        raise ValueError(
            f"lsh_knn: n_probes={n_probes} exceeds the {n_planes} "
            "hyperplanes available to flip (resolved grid); "
            "lower n_probes or raise n_planes"
        )
    global LAST_RESOLVED_GRID
    LAST_RESOLVED_GRID = {
        "n_planes": n_planes, "n_tables": n_tables, "n_probes": n_probes,
        "adaptive_engaged": (n_planes, n_tables, n_probes) != static,
    }
    if LAST_RESOLVED_GRID["adaptive_engaged"]:
        warnings.warn(
            f"lsh_knn adaptive grid resolved to planes={n_planes}, "
            f"tables={n_tables}, probes={n_probes} (static {static}): "
            "results diverge from a static-grid SQL oracle at this "
            "corpus size", stacklevel=2,
        )

    base = spread(df, id_col).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )

    @pandas_udf("array<double>")
    def _unit(v: pd.Series) -> pd.Series:
        m = np.array(v.tolist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pd.Series(list(m / n))

    withn = base.select("id", _unit(F.col("v")).alias("u"))
    if persist:
        withn = withn.persist()
    # Candidate generation by bucket aggregation (collect ids per bucket,
    # expand directed pairs in-bucket), NOT a self-join: the candidate
    # shuffle carries (table, bucket, id) rows only — never vectors — and
    # avoids the identical-plan equi self-join shape that intermittently
    # lost rows under AQE (see text/dedup.minhash_near_dup_pairs). Bucket
    # arrays stay small when n_planes is sized so 2^n_planes tracks corpus
    # size; degenerate buckets would surface here as oversized arrays.
    #
    # All tables' projections happen in ONE Arrow pass (planes stacked into
    # a single dim × (tables·planes) matmul), and one posexplode + one
    # groupBy on (table, bucket) replaces per-table groupBys + union —
    # n_tables costs candidate volume, not extra stages.
    planes_t = np.concatenate(
        [_planes(dim, n_planes, seed, t) for t in range(n_tables)], axis=0
    ).T.copy()  # dim × (tables·planes)
    weights = np.int64(1) << np.arange(n_planes, dtype=np.int64)
    slot = 1 + n_probes  # buckets emitted per (vector, table)

    @pandas_udf("array<long>")
    def _all_buckets(v: pd.Series) -> pd.Series:
        m = np.array(v.tolist(), dtype=np.float64)
        B = len(m)
        # bucket bits from the RAW vector (sign(<v,p>) == sign(<u,p>)),
        # projection rounded to 9dp before the sign test: with 6dp plane
        # literals this makes bucket assignment an exact decimal
        # computation any SQL engine replays bit-for-bit
        proj = np.round(m @ planes_t, 9).reshape(B, n_tables, n_planes)
        bits = (proj >= 0).astype(np.int64)
        vals = bits @ weights  # B × tables — resident buckets
        if not n_probes:
            return pd.Series(list(vals))
        # multi-probe: flip the n_probes lowest-|margin| planes per
        # table — |projection| ties break on plane index (stable sort),
        # the exact (abs(val), plane) order the SQL oracle replays.
        # Layout is t-major, resident first: pos p ⇒ tbl = p div slot,
        # resident iff p % slot == 0 (decoded JVM-side — the UDF emits
        # one flat long array, no per-row Python struct building).
        order = np.argsort(np.abs(proj), axis=2, kind="stable")
        flips = vals[:, :, None] ^ (
            np.int64(1) << order[:, :, :n_probes].astype(np.int64)
        )  # B × tables × n_probes
        allb = np.concatenate([vals[:, :, None], flips], axis=2)
        return pd.Series(list(allb.reshape(B, n_tables * slot)))

    if bucket_topk:
        # Evaluate BOTH pandas UDFs before the posexplode: with the
        # generator in the same select, Catalyst placed _unit ABOVE the
        # Generate, normalizing each vector once per exploded bucket row
        # (tables·(1+probes) ≈ 6× the Python work and 6× the vector
        # bytes through Arrow — guide §4.4 class). Two independent UDFs
        # at one projection level fuse into a single ArrowEvalPython
        # node, so each vector now crosses the boundary once.
        rows = base.select(
            "id",
            _unit(F.col("v")).alias("u"),
            _all_buckets(F.col("v")).alias("bks"),
        ).select(
            "id", "u", F.posexplode("bks").alias("pos", "bucket")
        ).select(
            "id", "u", "bucket",
            F.expr(f"pos div {slot}").alias("tbl"),
            (F.col("pos") % slot == 0).alias("res"),
        )
        take_k = k

        def _local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"id": [], "neighbor_id": [], "cosine": []}
            ).astype({"id": np.int64, "neighbor_id": np.int64,
                      "cosine": np.float64})
            ids = pdf["id"].to_numpy(np.int64)
            res = pdf["res"].to_numpy(np.bool_)
            rids = ids[res]
            nr = len(rids)
            n = len(ids)
            if nr == 0 or n < 2:
                return empty
            if ids.min() < 0 or ids.max() >= (1 << 32):
                raise ValueError(
                    "lsh_knn bucket_topk composite key needs ids in "
                    "[0, 2^32); use bucket_topk=False for wider ids")
            M = np.asarray(pdf["u"].tolist(), dtype=np.float64)
            R = M[res]  # database side = residents only
            take = min(take_k, nr)
            # exact (cosine desc, id asc) total order as ONE int64 key:
            # rounded-cosine micro-units in the high bits, bit-inverted
            # id below — ties resolve identically to the join lane
            idkey = (np.int64(1) << 32) - 1 - rids
            out_id, out_nb, out_cos = [], [], []
            for lo in range(0, n, 512):  # chunk rows: bounds gram memory
                hi = min(lo + 512, n)
                qi = ids[lo:hi]
                G = np.round(M[lo:hi] @ R.T, 6)
                ci = np.rint(G * 1e6).astype(np.int64) + 1_000_000
                keys = (ci << 32) | idkey[None, :]
                keys[qi[:, None] == rids[None, :]] = -1  # self (key ≥ 0 else)
                part = np.argpartition(-keys, take - 1, axis=1)[:, :take]
                sel = np.take_along_axis(keys, part, axis=1)
                order = np.argsort(-sel, axis=1, kind="stable")
                top = np.take_along_axis(part, order, axis=1)
                keep = np.take_along_axis(sel, order, axis=1).ravel() >= 0
                out_id.append(np.repeat(qi, take)[keep])
                out_nb.append(rids[top].ravel()[keep])
                out_cos.append(
                    np.take_along_axis(G, top, axis=1).ravel()[keep]
                )
            return pd.DataFrame({
                "id": np.concatenate(out_id),
                "neighbor_id": np.concatenate(out_nb),
                "cosine": np.concatenate(out_cos),
            })

        local = rows.groupBy("tbl", "bucket").applyInPandas(
            _local_topk, "id long, neighbor_id long, cosine double"
        )
        # One exchange for dedup + ranking instead of two: hash(id)
        # satisfies the dedup aggregate's (id, neighbor_id) clustering
        # (subset rule) AND the ranking window's id partitioning, so
        # the explicit repartition is reused by both downstream ops
        # (guide §2.4 — two operations keyed the same way share one
        # exchange). Rows here are three fixed-width columns, k·tables·
        # (1+probes) per vector — the lost map-side partial aggregation
        # is noise next to a whole extra shuffle+sort of the relation.
        merged = local.repartition("id").dropDuplicates(["id", "neighbor_id"])
        w = W.partitionBy("id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            merged.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("id", "neighbor_id", "cosine", "rnk")
        )

    banded = base.select(
        "id", F.posexplode(_all_buckets(F.col("v"))).alias("pos", "bucket")
    ).select(
        "id", "bucket",
        F.expr(f"pos div {slot}").alias("tbl"),
        (F.col("pos") % slot == 0).alias("res"),
    )
    buckets = (
        banded.groupBy("tbl", "bucket")
        .agg(F.collect_list(F.struct("id", "res")).alias("ents"))
        .filter(F.size("ents") >= 2)
    )
    # query × resident expansion: every entry (resident or probe) takes
    # each RESIDENT other than itself as a directed candidate — with
    # n_probes=0 all entries are resident and this is the symmetric
    # all-pairs expansion of the original lane.
    ents = F.col("ents")
    pair_structs = F.flatten(
        F.transform(
            ents,
            lambda e: F.transform(
                F.filter(ents, lambda r: r["res"] & (r["id"] != e["id"])),
                lambda r: F.struct(
                    e["id"].alias("id"), r["id"].alias("neighbor_id")
                ),
            ),
        )
    )
    cands = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id").alias("id"), F.col("p.neighbor_id").alias("neighbor_id"))
        .dropDuplicates(["id", "neighbor_id"])
    )

    # Vectors re-attach to the deduplicated candidate set only; both joins
    # key on a single id column (sides structurally different — no reused
    # self-exchange). Scoring reuses the up-front unit normalization, so
    # per-pair cost is one Arrow-batched dot product — a single einsum per
    # batch instead of interpreted per-element lambdas over every pair.
    @pandas_udf("double")
    def _pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.array(a.tolist(), dtype=np.float64)
        mb = np.array(b.tolist(), dtype=np.float64)
        return pd.Series(np.round(np.einsum("ij,ij->i", ma, mb), 6))

    va = withn.select(F.col("id"), F.col("u").alias("ua"))
    vb = withn.select(F.col("id").alias("neighbor_id"), F.col("u").alias("ub"))
    scored = (
        cands.join(va, "id")
        .join(vb, "neighbor_id")
        .select("id", "neighbor_id", _pair_dot(F.col("ua"), F.col("ub")).alias("cosine"))
    )
    w = W.partitionBy("id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    out = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "neighbor_id", "cosine", "rnk")
    )
    if persist:
        # Scope the cache to this call: materialize the (small) top-k
        # result, then release the normalized-vector cache. Leaving it
        # persisted would hold executor memory for the session's lifetime
        # and silently rewrite later queries' plans through cache
        # substitution — a real hazard in a long-lived session running
        # many registry queries.
        out = out.localCheckpoint(eager=True)
        withn.unpersist()
    return out
