"""Scale-discipline operators — bucketed co-located joins and skew salting.

Neither changes query *semantics*; both change *physical* behavior in ways
that decide whether a plan survives 100 TB:

- **Bucketing** pre-shuffles a table once at write time (`bucketBy` on the
  join/agg key). Two tables bucketed on the same key with the same bucket
  count join with ZERO exchanges — the scan itself satisfies the join's
  distribution requirement. For a fact table joined on the same key by
  every downstream job, this converts a per-query 100 TB shuffle into a
  one-time layout cost.
- **Salting** splits a skewed key across ``factor`` synthetic sub-keys so
  one hot key (null ids, empty-text fingerprints, a viral doc) can't pin
  a single reducer. AQE's skew-join handles moderate skew adaptively
  (session.py enables it); explicit salting is for the pathological keys
  you know about — it composes with AQE, not competes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ optionally sorted) catalog table.

    Bucketing requires the catalog (``saveAsTable``) — pure-path parquet
    carries no bucket metadata. ``sortBy`` inside buckets additionally
    removes the join's Sort nodes (sort-merge join reads presorted files).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_keys:
        w = w.sortBy(*sort_keys)
    w.saveAsTable(table)


def bucketed_join_is_exchange_free(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> bool:
    """Plan probe: True iff sort-merge-joining two catalog tables on ``on``
    requires no shuffle Exchange (the co-location proof tests assert with).
    Broadcast is disabled for the probe — on small test tables Spark would
    otherwise pick a broadcast join and never consult the bucketing."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table(left)
            .join(spark.table(right), on)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return "Exchange hashpartitioning" not in plan and "SortMergeJoin" in plan


def with_salt(df: DataFrame, id_col: str, factor: int, out_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, factor): a hash of a unique id, never
    ``rand()`` — re-runs and retried tasks must land a row in the same
    sub-key or joins against it silently drop rows."""
    return df.withColumn(out_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(factor)).cast("int"))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: list[str],
    id_col: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the big side.

    The skewed side gets a deterministic per-row salt; the small side is
    replicated ``factor`` ways (explode of a literal range — rows × factor,
    acceptable because that side is small). The join key becomes
    (keys, salt), spreading each hot key over ``factor`` reducers.
    Semantics are exactly the plain join's; only the shuffle layout moves.
    """
    salted = with_salt(skewed, id_col, factor)
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = salted.join(replicated, keys + ["__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str | list[str]],
    id_col: str,
    factor: int = 8,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: partial agg on
    (keys, salt), final agg on keys. Only decomposable aggregates (sum /
    count / min / max) — the partial stage shrinks each hot key to
    ``factor`` rows before the final shuffle. (Spark's hash-agg already
    partial-aggregates map-side; explicit salting additionally bounds the
    *reduce-side* per-key row count when a single grouping key dominates.)

    ``aggs`` maps column -> aggregate name or list of names; output columns
    are ``{agg}_{col}``. ``count`` is ``count(col)`` — non-null count,
    exactly what the plain ``groupBy(...).agg(F.count(col))`` it replaces
    computes; pass a never-null column (e.g. the salt id) for ``count(*)``
    row-count semantics.
    """
    _partial = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    _final = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    pairs = [
        (c, a)
        for c, al in aggs.items()
        for a in ([al] if isinstance(al, str) else al)
    ]
    salted = with_salt(df, id_col, factor)
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[_partial[a](c).alias(f"__{a}_{c}") for c, a in pairs]
    )
    return stage1.groupBy(*keys).agg(
        *[_final[a](f"__{a}_{c}").alias(f"{a}_{c}") for c, a in pairs]
    )
