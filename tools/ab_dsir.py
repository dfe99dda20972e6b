#!/usr/bin/env python
"""Paired A/B for the r12 DSIR rewrite: driver-side 256-row histogram
collect + literal log-ratio relation (2 corpus passes) vs the r11 shape
(hist/tot/ratio as plan branches — 3 executions of the opaque Arrow
bucket-count pass).

Interleaved min-of-N in ONE session (the only trustworthy protocol on
this host — see OPTIMIZATION_r11.md's noise caveat), plus a full
collect-to-collect output equality check at the measured scale.

Usage: python tools/ab_dsir.py [--dir /tmp/sweep_x10] [--rounds 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def new_dsir_weights(docs, lane: str = "arrow"):
    """r12 candidate: ONE bounded (≤256-row) collect of the bucket
    histogram; the log-ratio relation becomes a literal whose lr is the
    SAME JVM log expression over the same exact-integer inputs."""
    from trading_dashboard_spark.functions import pround
    from trading_dashboard_spark.queries_training import (
        _DSIR_BUCKETS, _dsir_bucket_counts_arrow,
    )
    from trading_dashboard_spark.text.analysis import tokenize

    if lane == "arrow":
        db = _dsir_bucket_counts_arrow(docs)
    else:
        bucket = (
            F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("long")
            % _DSIR_BUCKETS
        )
        db = (
            docs.select(
                "doc_id", "source", "lang",
                F.explode(tokenize(F.lower(F.col("text")))).alias("w"),
            )
            .select("doc_id", "source", "lang", bucket.alias("b"))
            .groupBy("doc_id", "source", "lang", "b")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    hist_rows = (
        db.groupBy("b").agg(
            F.sum("n").alias("c_raw"),
            F.sum(
                F.when(F.col("lang") == "en", F.col("n")).otherwise(0)
            ).alias("c_tgt"),
        )
    ).collect()
    n_raw = sum(r["c_raw"] for r in hist_rows)
    n_tgt = sum(r["c_tgt"] for r in hist_rows)
    B = float(_DSIR_BUCKETS)
    spark = docs.sparkSession
    ratio_src = spark.createDataFrame(
        [(int(r["b"]), int(r["c_raw"]), int(r["c_tgt"])) for r in hist_rows],
        "b long, c_raw long, c_tgt long",
    )
    ratio = ratio_src.select(
        "b",
        (
            F.log((F.col("c_tgt") + 1.0) / (F.lit(n_tgt).cast("long") + B))
            - F.log((F.col("c_raw") + 1.0) / (F.lit(n_raw).cast("long") + B))
        ).alias("lr"),
    )
    return (
        db.join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            pround(F.sum(F.col("n") * F.col("lr")), 4).alias("log_importance"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sweep_x10")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.queries_training import _dsir_weights
    from trading_dashboard_spark.session import get_spark

    spark = get_spark(
        "ab_dsir", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, "documents", args.dir).count()

    def _identity(it):
        yield from it

    spark.range(64).repartition(32).mapInPandas(_identity, "id long").count()

    docs = lambda: load_table(spark, "documents", args.dir)  # noqa: E731

    # --- output equality first (full collect, sorted) --------------------
    old_rows = sorted(
        tuple(r) for r in _dsir_weights(docs()).collect()
    )
    new_rows = sorted(tuple(r) for r in new_dsir_weights(docs()).collect())
    assert old_rows == new_rows, (
        f"OUTPUT MISMATCH: {len(old_rows)} vs {len(new_rows)} rows; first "
        f"diff: {next((a, b) for a, b in zip(old_rows, new_rows) if a != b)}"
    )
    print(f"outputs identical: {len(old_rows)} rows", flush=True)

    def timed(fn):
        t0 = time.time()
        fn().write.mode("overwrite").format("noop").save()
        return time.time() - t0

    for rnd in range(args.rounds):
        o = min(timed(lambda: _dsir_weights(docs())) for _ in range(2))
        n = min(timed(lambda: new_dsir_weights(docs())) for _ in range(2))
        n2 = min(timed(lambda: new_dsir_weights(docs())) for _ in range(2))
        o2 = min(timed(lambda: _dsir_weights(docs())) for _ in range(2))
        print(
            f"round {rnd}: old {o:.3f}/{o2:.3f}  new {n:.3f}/{n2:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
