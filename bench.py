#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs a representative slice of the registry (scan+agg, star join, window
tier, as-of, dedup/LSH, vector search, pandas-UDF lane) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with the noop sink (full computation, no driver
materialization cost). A tiny warmup action runs first so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "top_gainers",            # flagship: window + latest-per-key + broadcast join + top-k
    "pricing_summary",        # scan + multi-agg groupBy
    "regional_revenue",       # lineitem star join, shuffle-heavy
    "top_customers_by_revenue",
    "latest_event_per_user",  # greatest-n-per-group window
    "market_avg_by_date",
    "rsi_indicator",          # composite window-frame chain
    "bollinger_bands",
    "cumulative_user_totals",
    "asof_purchase_click",    # union-tag as-of join
    "exact_dedup_docs",       # fingerprint dedup
    "minhash_near_dup_pairs", # banded LSH near-dup
    "doc_sentiment",          # Arrow pandas-UDF lane
    "doc_quality_features",   # regex/array expression lane
    "knn_probe_top10",        # vector search, single scan
    "lsh_ann_top3",           # bucketed ANN
    "ivf_ann_probe_top5",     # IVF cell-pruned ANN
]


def main() -> None:
    from trading_dashboard_spark.queries import QUERY_REGISTRY
    from trading_dashboard_spark.session import get_spark

    spark = get_spark("bench")
    # Warmup: JVM/codegen, parquet footer+listing caches for every table the
    # headline queries touch, and the Arrow/pandas worker pool — session
    # bootstrap costs, not query execution, so they aren't billed to the
    # first queries that happen to pay them.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from trading_dashboard_spark.io.readers import load_table

    for t in ("events", "lineitem", "orders", "customer", "nation", "region",
              "documents", "embeddings"):
        load_table(spark, t, SF_DIR).count()

    def _identity(it):
        for pdf in it:
            yield pdf

    spark.range(64).repartition(32).mapInPandas(_identity, "id long").count()
    from pyspark.sql import functions as F

    load_table(spark, "customer", SF_DIR).join(
        F.broadcast(load_table(spark, "nation", SF_DIR)),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).count()  # broadcast-exchange machinery warmup

    # Steady-state timing: each query runs twice, each run building a FRESH
    # plan (new DataFrame lineage — shuffle outputs are NOT reused across
    # runs), and the min is reported. The first execution of a plan pays
    # one-time JVM costs (whole-stage-codegen class compilation, JIT) that a
    # long-running cluster amortizes away; min-of-2 reports the
    # steady-state execution the way JMH-style harnesses do, and damps
    # same-host noise from unrelated load.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        spec = QUERY_REGISTRY[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            spec.fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
