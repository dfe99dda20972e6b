#!/usr/bin/env python
"""Paired A/B for the r12 nb_source_classifier_eval rewrite: persist the
vocabulary-bounded (cls, w, c) train-count relation once and derive
ns/vocab/the matched-join broadcast from it (train tokenize passes 3→1),
and fold prior's two corpus scans into one groupBy + bounded collect.

Usage: python tools/ab_nb.py [--dir /tmp/sweep_x10] [--rounds 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window as W


def new_nb(spark, docs):
    from trading_dashboard_spark.functions import pround
    from trading_dashboard_spark.text.analysis import tokenize

    toks_t = docs.select(
        "doc_id",
        "source",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cd",
            "train",
        )
        .otherwise("eval")
        .alias("split"),
        tokenize(F.lower(F.col("text"))).alias("toks"),
    )
    words = toks_t.select(
        "doc_id", "source", "split", F.explode("toks").alias("w")
    )
    train_w = words.filter(F.col("split") == "train")
    cnt = (
        train_w.groupBy(F.col("source").alias("cls"), "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    cnt.count()  # cache barrier
    ns = cnt.groupBy("cls").agg(F.sum("c").alias("n_s"))
    vocab = cnt.agg(F.countDistinct("w").alias("v"))
    train_docs = toks_t.filter(F.col("split") == "train")
    n_train = train_docs.agg(F.count(F.lit(1)).alias("n_tr"))
    prior = (
        train_docs.groupBy(F.col("source").alias("cls"))
        .agg(F.count(F.lit(1)).alias("nd"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "cls", F.log(F.col("nd") / F.col("n_tr").cast("double")).alias("lp")
        )
    )
    testdocs = toks_t.filter(
        (F.col("split") == "eval") & (F.size("toks") > 0)
    ).select("doc_id", "source", F.size("toks").alias("tn"))
    matched = (
        words.filter(F.col("split") == "eval")
        .select("doc_id", "w")
        .join(F.broadcast(cnt), "w")
        .groupBy("doc_id", "cls")
        .agg(F.sum(F.log(F.col("c") + 1.0)).alias("msum"))
    )
    scored = (
        testdocs.crossJoin(F.broadcast(prior))
        .join(F.broadcast(ns), "cls")
        .crossJoin(F.broadcast(vocab))
        .join(matched, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            "source",
            "cls",
            (
                F.col("lp")
                + F.coalesce(F.col("msum"), F.lit(0.0))
                - F.col("tn") * F.log(F.col("n_s") + F.col("v"))
            ).alias("score"),
        )
    )
    pred = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(
                    pround(F.col("score"), 6).desc(), "cls"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("source", F.col("cls").alias("pred_source"))
    )
    out = pred.groupBy("source", "pred_source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).localCheckpoint(eager=True)
    cnt.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sweep_x10")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.queries import QUERY_REGISTRY
    from trading_dashboard_spark.session import get_spark

    spark = get_spark(
        "ab_nb", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, "documents", args.dir).count()

    docs = lambda: load_table(spark, "documents", args.dir)  # noqa: E731
    old_fn = QUERY_REGISTRY["nb_source_classifier_eval"].fn

    old_rows = sorted(tuple(r) for r in old_fn(spark, args.dir).collect())
    new_rows = sorted(tuple(r) for r in new_nb(spark, docs()).collect())
    assert old_rows == new_rows, (
        f"OUTPUT MISMATCH: {old_rows} vs {new_rows}"
    )
    print(f"outputs identical: {len(old_rows)} rows", flush=True)

    def timed(fn):
        t0 = time.time()
        fn().write.mode("overwrite").format("noop").save()
        return time.time() - t0

    for rnd in range(args.rounds):
        o = min(timed(lambda: old_fn(spark, args.dir)) for _ in range(2))
        n = min(timed(lambda: new_nb(spark, docs())) for _ in range(2))
        n2 = min(timed(lambda: new_nb(spark, docs())) for _ in range(2))
        o2 = min(timed(lambda: old_fn(spark, args.dir)) for _ in range(2))
        print(
            f"round {rnd}: old {o:.3f}/{o2:.3f}  new {n:.3f}/{n2:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
