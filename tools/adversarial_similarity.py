#!/usr/bin/env python
"""Adversarial discovery sweep for the similarity family (the last
un-probed family after the r10 relational/streaming and r11
curation/media batteries): every embeddings-reading oracle lane —
kNN/LSH/IVF/PQ/SQ8 search + recall audits, quantization, centroids,
k-means/PCA iteratives, drift — run on Spark AND DuckDB over corpora
of the degenerate vector classes the family's semantics imply. The
r9 `test_adversarial_embeddings_battery` probed 5 lanes on one mixed
corpus; this sweeps ~25 lanes × 8 scenario corpora.

Scenario classes (each a standalone embeddings.parquet, 40×64-d
float32 unless noted):

- ``zero_probe``   — vec_id 0 (the probe the *_probe lanes anchor on)
  is the all-zero vector: every probe cosine is NULL/zero-guard
- ``all_dup``      — one nonzero vector, 40 ids: cosine 1.0 between
  every pair, tie storms in every top-k and recall audit
- ``collinear``    — scalar multiples (±) of one direction: cosine
  exactly ±1, ties at both poles, negative-cosine ordering
- ``one_hot``      — 40 distinct axes: all pairwise cosines exactly 0
  (tie storm at zero), per-dimension variance degenerate
- ``tiny``         — 3 vectors (k=3/5/10 over-ask, recall@k with
  fewer than k true neighbors, quartiles/codebooks over 3 points)
- ``single_label`` — all label 0 (centroid/drift/stratified lanes
  collapse to one group)
- ``extreme_mag``  — components at ±1e30 / ±1e-30 / mixed (float32
  inf after square, double-cast order sensitivity, subnormals).
  The two VARIANCE-SCALE lanes (pca eigval, pq avg_sq_err) are
  routed to ``dynamic_range`` instead: their unnormalized outputs
  anchor at fixed decimals, exact cross-engine only while
  |value| ≲ 5e11 (1e-16 relative accumulation drift under the
  rounding quantum) — at 1e60 the drift IS the ulp, a documented
  anchor-domain bound, not an engine defect.
- ``dynamic_range``— ±1e3 / ±1e-3 mixed components (12 orders of
  magnitude inside the variance-scale anchor domain) — ALL lanes
  run here, including pca/pq_distortion.
- ``invalid_payload`` — NULL components, NaN, ±Inf (true NaN via
  direct pyarrow construction — pandas would silently turn NaN
  into null). Out of the similarity family's input contract: only
  `embedding_validation_audit` runs on the dirty corpus (the
  ingest gate), then every lane runs on the VALIDATED corpus
  (audit-flagged rows quarantined) and must be hash-green there.

Usage: python tools/adversarial_similarity.py [scenario ...|query ...]
Writes corpora under $ADV_SIM_DIR (default /tmp/adv_similarity) and
prints one line per (scenario, query) plus a summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_embeddings(out_dir: str, vecs, labels) -> None:
    """Direct pyarrow construction — pandas' from_pandas would turn a
    float NaN inside a list into a NULL element, silently collapsing
    the NaN and NULL adversarial classes into one (the r11 battery's
    first run did exactly that)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    lists = [
        None if v is None
        else [None if x is None else float(x) for x in v]
        for v in vecs
    ]
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array(lists, type=pa.list_(pa.float32()),
                              from_pandas=False),
        "label": pa.array(labels, type=pa.int32()),
    })
    pq.write_table(t, f"{out_dir}/embeddings.parquet")


def build_scenarios(base_dir: str) -> dict[str, str]:
    """Write every scenario corpus; returns {scenario: dir}."""
    import numpy as np

    dirs: dict[str, str] = {}
    rng = np.random.RandomState(20260817)

    def reg(name, vecs, labels=None):
        labels = labels if labels is not None else [i % 5 for i in
                                                    range(len(vecs))]
        d = os.path.join(base_dir, name)
        _write_embeddings(d, vecs, labels)
        dirs[name] = d

    dim, n = 64, 40

    # zero_probe: the anchor vector is zero; rest normal
    vz = [np.zeros(dim, dtype=np.float32)]
    vz += [rng.randn(dim).astype(np.float32) for _ in range(n - 1)]
    reg("zero_probe", vz)

    # all_dup: one nonzero vector, n ids
    base = rng.randn(dim).astype(np.float32)
    reg("all_dup", [base.copy() for _ in range(n)])

    # collinear: c·base for c in ±{0.5,1,2,...}; cosine exactly ±1
    cs = [(0.5 + (i % 5)) * (1 if i % 2 == 0 else -1) for i in range(n)]
    reg("collinear", [(c * base).astype(np.float32) for c in cs])

    # one_hot: distinct axes — all pairwise cosines exactly 0
    eye = np.eye(dim, dtype=np.float32)
    reg("one_hot", [eye[i % dim] for i in range(n)])

    # tiny: 3 vectors
    reg("tiny", [rng.randn(dim).astype(np.float32) for _ in range(3)],
        labels=[0, 1, 2])

    # single_label
    reg("single_label",
        [rng.randn(dim).astype(np.float32) for _ in range(n)],
        labels=[0] * n)

    # extreme_mag: huge / tiny / mixed magnitudes
    vm = []
    for i in range(n):
        v = rng.randn(dim).astype(np.float32)
        if i % 4 == 0:
            v = (v * np.float32(1e30)).astype(np.float32)
        elif i % 4 == 1:
            v = (v * np.float32(1e-30)).astype(np.float32)
        elif i % 4 == 2:
            v[::2] *= np.float32(1e30)
            v[1::2] *= np.float32(1e-30)
        vm.append(v)
    reg("extreme_mag", vm)

    # dynamic_range: ±1e3 / ±1e-3 mixed — wide magnitude spread INSIDE
    # the variance-scale anchor domain (pca/pq run here, not at 1e30)
    vd = []
    for i in range(n):
        v = rng.randn(dim).astype(np.float32)
        if i % 4 == 0:
            v = (v * np.float32(1e3)).astype(np.float32)
        elif i % 4 == 1:
            v = (v * np.float32(1e-3)).astype(np.float32)
        elif i % 4 == 2:
            v[::2] *= np.float32(1e3)
            v[1::2] *= np.float32(1e-3)
        vd.append(v)
    reg("dynamic_range", vd)

    # invalid_payload: contract violations — NULL components, NaN,
    # ±Inf — interleaved with valid vectors (built as python lists so
    # the writer can distinguish None from NaN)
    vi = []
    for i in range(n):
        v = list(rng.randn(dim).astype(np.float32))
        if i % 8 == 0:
            v[i % dim] = None                  # NULL element
        elif i % 8 == 1:
            v[i % dim] = float("nan")
        elif i % 8 == 2:
            v[i % dim] = float("inf")
        elif i % 8 == 3:
            v[i % dim] = float("-inf")
        vi.append(v)
    reg("invalid_payload", vi)
    return dirs


#: variance-scale lanes whose unnormalized outputs anchor only while
#: |value| ≲ 5e11 — routed to dynamic_range instead of extreme_mag
VARIANCE_SCALE_LANES = {
    "pca_top_component_power_iteration", "pq_distortion_audit",
    "kmeans_embedding_clusters",   # avg_sq_dist is squared-distance scale
}


def write_validated(dirty_dir: str, out_dir: str) -> None:
    """Quarantine audit-flagged rows (NULL / non-finite components) —
    the ingest step the validation lane's contract prescribes."""
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(f"{dirty_dir}/embeddings.parquet")
    keep_vecs, keep_labels = [], []
    for vid, emb, lab in zip(
        t.column("vec_id").to_pylist(),
        t.column("embedding").to_pylist(),
        t.column("label").to_pylist(),
    ):
        if emb is None or any(
            x is None or math.isnan(x) or math.isinf(x) for x in emb
        ):
            continue
        keep_vecs.append(emb)
        keep_labels.append(lab)
    _write_embeddings(out_dir, keep_vecs, keep_labels)


def qualifying_queries(registry) -> list[str]:
    """Every oracle-backed lane that reads ONLY the embeddings table
    (hybrid/document joins belong to the text battery)."""
    names = []
    for name, ent in registry.items():
        o = ent.oracle
        if not o or "embeddings" not in o:
            continue
        if any(t in o for t in ("documents", "events", "lineitem",
                                "orders", "customer")):
            continue
        names.append(name)
    return sorted(names)


def main() -> None:
    import duckdb

    from trading_dashboard_spark.queries import QUERY_REGISTRY
    from trading_dashboard_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check_oracle import normalize  # noqa: E402

    base = os.environ.get("ADV_SIM_DIR", "/tmp/adv_similarity")
    dirs = build_scenarios(base)
    args = sys.argv[1:]
    scenarios = [a for a in args if a in dirs] or list(dirs)
    names = [a for a in args if a in QUERY_REGISTRY] or qualifying_queries(
        QUERY_REGISTRY
    )

    spark = get_spark("adv_similarity",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    # contract routing: the dirty invalid_payload corpus runs ONLY the
    # ingest gate; every other lane runs on its validated counterpart
    if "invalid_payload" in scenarios:
        vdir = os.path.join(base, "invalid_payload_validated")
        write_validated(dirs["invalid_payload"], vdir)
        dirs["invalid_payload_validated"] = vdir
        scenarios.insert(
            scenarios.index("invalid_payload") + 1, "invalid_payload_validated"
        )

    agree, diverge, errors = [], [], []
    for scen in scenarios:
        d = dirs[scen]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
        )
        scen_names = names
        if scen == "invalid_payload":
            scen_names = [n for n in names
                          if n == "embedding_validation_audit"]
        elif scen == "extreme_mag":
            scen_names = [n for n in names if n not in VARIANCE_SCALE_LANES]
        for name in scen_names:
            ent = QUERY_REGISTRY[name]
            tag = f"{scen}:{name}"
            try:
                got = normalize(ent.fn(spark, d).toPandas())
                exp = normalize(con.execute(ent.oracle).df())
                if list(got.columns) != list(exp.columns):
                    diverge.append((tag, "columns",
                                    list(got.columns), list(exp.columns)))
                elif len(got) != len(exp):
                    diverge.append((tag, "rowcount", len(got), len(exp)))
                elif not got.equals(exp):
                    neq = (got != exp) & ~(got.isna() & exp.isna())
                    cols = [c for c in got.columns if neq[c].any()]
                    diverge.append((tag, "values", cols,
                                    f"{int(neq.any(axis=1).sum())} rows"))
                else:
                    agree.append(tag)
            except Exception as exc:  # noqa: BLE001 — record, continue
                errors.append((tag, f"{type(exc).__name__}: {exc}"[:300]))
            status = ("ok" if tag in agree else "DIVERGE"
                      if any(x[0] == tag for x in diverge) else "ERROR")
            print(f"{status:8s} {tag}", flush=True)
        con.close()

    print(f"\n{len(agree)} agree, {len(diverge)} diverge, "
          f"{len(errors)} error")
    for x in diverge:
        print("DIVERGE", *x)
    for tag, msg in errors:
        print("ERROR", tag, msg)


if __name__ == "__main__":
    main()
