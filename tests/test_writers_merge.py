"""MERGE/upsert semantics tests — S14/S15 (SURVEY.md §7.4: exact ON
CONFLICT reproduction + idempotency)."""

from pyspark.sql import functions as F

from trading_dashboard_spark.io.writers import dedup_by_key, insert_if_absent, merge_upsert


def _digest(df):
    return {tuple(r) for r in df.collect()}


def test_merge_upsert_updates_and_inserts(spark):
    target = spark.createDataFrame(
        [("A", 1, 10.0), ("B", 1, 20.0)], ["k", "d", "v"]
    )
    updates = spark.createDataFrame(
        [("A", 1, 99.0), ("C", 1, 30.0)], ["k", "d", "v"]
    )
    out = merge_upsert(target, updates, ["k", "d"])
    assert _digest(out) == {("A", 1, 99.0), ("B", 1, 20.0), ("C", 1, 30.0)}


def test_merge_upsert_idempotent(spark):
    target = spark.createDataFrame([("A", 1, 10.0), ("B", 1, 20.0)], ["k", "d", "v"])
    updates = spark.createDataFrame([("A", 1, 99.0)], ["k", "d", "v"])
    once = merge_upsert(target, updates, ["k", "d"])
    twice = merge_upsert(once, updates, ["k", "d"])
    assert _digest(once) == _digest(twice)


def test_merge_upsert_duplicate_update_keys_deterministic(spark):
    target = spark.createDataFrame([("A", 1, 10.0)], ["k", "d", "v"])
    updates = spark.createDataFrame(
        [("A", 1, 5.0), ("A", 1, 7.0), ("A", 1, 6.0)], ["k", "d", "v"]
    )
    out = merge_upsert(target, updates, ["k", "d"]).collect()
    assert len(out) == 1 and out[0]["v"] == 7.0  # greatest non-key tuple wins


def test_insert_if_absent_keeps_existing(spark):
    target = spark.createDataFrame([("A", 1, 10.0)], ["k", "d", "v"])
    new = spark.createDataFrame([("A", 1, 99.0), ("B", 2, 5.0)], ["k", "d", "v"])
    out = insert_if_absent(target, new, ["k", "d"])
    assert _digest(out) == {("A", 1, 10.0), ("B", 2, 5.0)}  # existing row kept


def test_dedup_by_key_with_nulls(spark):
    df = spark.createDataFrame(
        [("A", None), ("A", 3.0), ("A", 1.0)], "k string, v double"
    )
    out = dedup_by_key(df, ["k"]).collect()
    assert len(out) == 1 and out[0]["v"] == 3.0  # nulls lose (desc_nulls_last)


def test_merge_empty_updates_is_noop(spark):
    target = spark.createDataFrame([("A", 1, 10.0)], ["k", "d", "v"])
    empty = spark.createDataFrame([], "k string, d bigint, v double")
    assert _digest(merge_upsert(target, empty, ["k", "d"])) == _digest(target)
