#!/usr/bin/env python
"""Measure lsh_knn recall@k + wall time on the ×100 replica (r7 verdict #3).

Ground truth is SAMPLED-EXACT: a deterministic slice of probe ids
(every 397th vec_id, capped at --gt-probes) brute-force-scored against
the FULL corpus (knn_batch_probes — one scan, probe batch broadcast),
cached as parquet per replica. Each candidate grid then runs the real
`lsh_knn` end to end (noop write for wall time, then a collect of the
probe slice for recall).

Usage:
  python tools/lsh_recall.py [--planes N] [--tables N] [--probes N]
                             [--adaptive] [--k K] [--grid "p,t,pr;..."]
Prints one JSON line per grid point.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GT_STRIDE = 397


def ground_truth(spark, data_dir: str, k: int, n_probes_gt: int, cache: str):
    from pyspark.sql import functions as F

    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.similarity.knn import knn_batch_probes

    if not os.path.exists(cache):
        emb = load_table(spark, "embeddings", data_dir)
        probes = (
            emb.filter(F.col("vec_id") % GT_STRIDE == 0)
            .orderBy("vec_id")
            .limit(n_probes_gt)
        )
        gt = knn_batch_probes(emb, probes, k=k)
        gt.select("probe_id", "neighbor_id").write.mode("overwrite").parquet(cache)
    return spark.read.parquet(cache)


def measure(spark, data_dir: str, gt, k: int, planes: int, tables: int,
            probes: int, adaptive: bool) -> dict:
    from pyspark.sql import functions as F

    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.similarity import lsh

    emb = load_table(spark, "embeddings", data_dir)
    t0 = time.time()
    res = lsh.lsh_knn(
        emb, dim=64, k=k, n_planes=planes, n_tables=tables, seed=42,
        n_probes=probes, adaptive_planes=adaptive,
    )
    res.write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    grid = dict(lsh.LAST_RESOLVED_GRID or {})
    # recall over the ground-truth probe slice only
    approx = res.join(
        gt.select("probe_id").distinct().withColumnRenamed("probe_id", "id"),
        "id",
    ).select(F.col("id").alias("probe_id"), "neighbor_id")
    hit = gt.join(approx, ["probe_id", "neighbor_id"]).count()
    total = gt.count()
    return {
        "planes": planes, "tables": tables, "probes": probes,
        "adaptive": adaptive, "resolved": grid,
        "recall": round(hit / total, 4), "spark_s": round(wall, 2),
        "gt_pairs": total,
    }


def main() -> None:
    args = sys.argv[1:]
    planes, tables, probes, k, gt_n = 6, 2, 0, 3, 500
    adaptive = False
    grid_pts: list[tuple[int, int, int]] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--planes":
            planes = int(args[i + 1]); i += 2
        elif a == "--tables":
            tables = int(args[i + 1]); i += 2
        elif a == "--probes":
            probes = int(args[i + 1]); i += 2
        elif a == "--k":
            k = int(args[i + 1]); i += 2
        elif a == "--gt-probes":
            gt_n = int(args[i + 1]); i += 2
        elif a == "--adaptive":
            adaptive = True; i += 1
        elif a == "--grid":
            for pt in args[i + 1].split(";"):
                p, t, pr = (int(x) for x in pt.split(","))
                grid_pts.append((p, t, pr))
            i += 2
        else:
            raise SystemExit(f"unknown arg {a}")

    from trading_dashboard_spark.session import get_spark

    from scale100 import build_replica  # noqa: E402 — same tools dir

    spark = get_spark(
        "lsh_recall", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    tmp = os.environ.get("SCALE_DIR", "/tmp/scale_x100")
    if not os.path.exists(f"{tmp}/documents.parquet"):
        os.makedirs(tmp, exist_ok=True)
        t0 = time.time()
        build_replica(spark, tmp, 100)
        print(f"built x100 replica in {time.time() - t0:.0f}s",
              file=sys.stderr)

    gt = ground_truth(
        spark, tmp, k, gt_n, f"{tmp}/_lsh_gt_k{k}_n{gt_n}.parquet"
    ).persist()
    gt.count()
    for p, t, pr in grid_pts or [(planes, tables, probes)]:
        out = measure(spark, tmp, gt, k, p, t, pr, adaptive)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
