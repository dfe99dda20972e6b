"""Scale-discipline tests — bucketed joins are exchange-free, salting
preserves semantics while spreading hot keys."""

from pyspark.sql import functions as F

from trading_dashboard_spark.io.readers import load_table
from trading_dashboard_spark.operators.scale import (
    bucketed_join_is_exchange_free,
    salted_agg,
    salted_join,
    with_salt,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the same key/count join without any shuffle —
    the scan satisfies the join's distribution requirement (the one-time
    layout cost that replaces a per-query 100 TB exchange)."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8,
                   sort_keys=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], n_buckets=8, sort_keys=["o_orderkey"],
    )
    assert bucketed_join_is_exchange_free(spark, "b_orders", "b_lineitem", ["o_orderkey"])
    # and the same join over plain parquet DOES exchange (the comparison
    # that proves bucketing is doing the work)
    plain = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert "Exchange" in _plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # correctness: bucketed join result matches plain join
    assert (
        spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey").count()
        == plain.count()
    )


def test_salt_is_deterministic_and_bounded(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    s1 = with_salt(ev, "event_id", 8).select("event_id", "__salt").toPandas()
    s2 = with_salt(ev, "event_id", 8).select("event_id", "__salt").toPandas()
    assert s1.sort_values("event_id").equals(s2.sort_values("event_id"))
    assert s1["__salt"].between(0, 7).all()
    assert s1["__salt"].nunique() > 1  # actually spreads


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting changes the shuffle layout, never the result — including a
    planted hot key (half the rows on one key)."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "k", F.when(F.col("event_id") % 2 == 0, F.lit(0)).otherwise(F.col("user_id"))
    )
    dim = (
        ev.select("k").distinct().withColumn("k_name", F.concat(F.lit("key_"), "k"))
    )
    plain = ev.join(dim, ["k"]).select("event_id", "k_name")
    salted = salted_join(ev, dim, ["k"], id_col="event_id", factor=8).select(
        "event_id", "k_name"
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.count("value").alias("count_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    salted = (
        salted_agg(
            ev, ["event_type"], {"value": "max"}, id_col="event_id", factor=8
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert (salted["max_value"] == plain["max_value"]).all()
    counts = salted_agg(ev, ["event_type"], {"value": "count"}, id_col="event_id")
    got = counts.toPandas().set_index("event_type").sort_index()
    assert (got["count_value"] == plain["count_value"]).all()


def test_salted_agg_count_skips_nulls(spark):
    """count semantics: count(col) (non-null), exactly the plain groupBy's
    F.count(col) — not count(*) — on nullable input."""
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 2.0), ("b", 4, None)],
        ["k", "id", "v"],
    )
    out = {
        r["k"]: r["count_v"]
        for r in salted_agg(df, ["k"], {"v": "count"}, id_col="id", factor=4).collect()
    }
    assert out == {"a": 2, "b": 0}


def test_quadratic_guard_raises_unblocked_oversized(spark):
    """All-pairs ground-truth ops refuse oversized unblocked inputs
    (operators/guards.guard_quadratic); blocking or the explicit override
    lifts the guard."""
    import pytest
    from pyspark.sql import functions as F

    from trading_dashboard_spark.similarity.knn import knn_all_pairs
    from trading_dashboard_spark.text.dedup import ngram_jaccard_pairs

    docs = spark.range(20_001).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta gamma delta").alias("text")
    )
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        ngram_jaccard_pairs(docs)
    vecs = spark.range(20_001).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        knn_all_pairs(vecs)
    # blocked construction is accepted (lazy — no execution here)
    ngram_jaccard_pairs(docs, block_col=F.lit(1))
    knn_all_pairs(vecs.withColumn("blk", F.lit(1)), block_col="blk")
    # explicit override is accepted
    ngram_jaccard_pairs(docs, allow_quadratic=True)


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    """The Bloom-prefiltered semi-join is row-identical to the plain
    semi-join (false positives removed by the exact join; false negatives
    impossible by construction)."""
    from trading_dashboard_spark.functions.bloom import bloom_semi_join

    orders = load_table(spark, "orders", sf_dir)
    rich = load_table(spark, "customer", sf_dir).filter(F.col("c_acctbal") > 9000)
    got = bloom_semi_join(orders, rich, "o_custkey", "c_custkey")
    want = orders.join(
        rich.select("c_custkey"), orders.o_custkey == rich.c_custkey, "left_semi"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_bloom_filter_no_false_negatives_and_low_fp(spark):
    """Every inserted key passes the probe; non-member false-positive rate
    stays near the designed ~1-2% at the default sizing."""
    from trading_dashboard_spark.functions.bloom import (
        bloom_bitset,
        bloom_probe_col,
    )

    members = spark.range(0, 2000).withColumnRenamed("id", "k")
    others = spark.range(100000, 110000).withColumnRenamed("id", "k")
    bits = bloom_bitset(members, F.col("k"))
    assert members.filter(~bloom_probe_col(F.col("k"), bits)).count() == 0
    fp = others.filter(bloom_probe_col(F.col("k"), bits)).count()
    assert fp / 10000.0 < 0.05, f"false-positive rate too high: {fp}/10000"


def test_bloom_probe_runs_in_scan_stage(spark, sf_dir):
    """The probe predicate is a plain Filter over the probe scan — no
    exchange between the parquet scan and the Bloom test (the map-side
    pruning that makes the pattern pay at 100 TB)."""
    from trading_dashboard_spark.functions.bloom import (
        bloom_bitset,
        bloom_probe_col,
    )

    orders = load_table(spark, "orders", sf_dir)
    rich = load_table(spark, "customer", sf_dir).filter(F.col("c_acctbal") > 9000)
    bits = bloom_bitset(rich, F.col("c_custkey"))
    pre = orders.filter(bloom_probe_col(F.col("o_custkey"), bits))
    plan = _plan(pre)
    assert "Exchange" not in plan, plan
