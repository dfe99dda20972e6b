"""Global ranking — exact single-window and scale-safe two-stage forms.

The ranking family (``ntile`` / ``percent_rank`` / ``cume_dist`` over an
unpartitioned ORDER BY) has no per-key parallelism: Spark plans it as an
``Exchange SinglePartition`` + one sorting task. Over a *per-key
aggregate* whose cardinality is bounded (150 users, a term vocabulary)
that is the right plan — but if key cardinality ever tracks corpus size
(10⁹ users), the one-task sort becomes the bottleneck the 100 TB design
must not contain.

``exact=False`` computes the SAME exact values with no
single-partition stage, classic two-pass distributed ranking:

1. ``repartitionByRange`` on the sort key (range partitioner: partition
   i's rows all sort before partition i+1's) + ``sortWithinPartitions``;
2. an Arrow ``mapInPandas`` pass stamps each row with its partition id
   and a within-partition row number (pure map work, batch-carry for the
   running counter);
3. per-partition row counts → prefix-sum offsets. The counts are
   collected to the driver — bounded by the PARTITION count (a cluster
   constant, like the IVF fit sample), never by row count — and enter
   the plan as a literal array indexed by partition id, so the final
   rank is ``offset[pid] + local_rank``: map-side, no join, no window.

The trade is one materialization of the ranked rows (an eager local
checkpoint that also pins the sampled range boundaries — see
``_with_global_rank``) plus range-partitioner sampling — all fully
parallel.
With a unique total order (callers must tie-break, e.g. ``(total,
user_id)``), ``percent_rank``/``cume_dist``/``ntile`` derived from the
global row number match the SQL window functions exactly, so the
``exact`` and ``distributed`` paths return identical rows and the same
DuckDB oracle checks both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql import Window as W


#: Adaptive global-ranking policy (round-4 verdict #9): callers whose
#: ranked relation is a per-key AGGREGATE count it (one cheap job over
#: already-aggregated rows) and keep the one-task window sort below
#: this threshold — a few-million-row sort in one task is faster than
#: the two-stage machinery's extra exchanges — switching to
#: ``exact=False`` above it, where the single sorting task would
#: become the straggler. 2M rows ≈ tens of MB sorted in well under a
#: second on one core.
NTILE_EXACT_MAX_ROWS = 2_000_000


def _with_global_rank(
    df: DataFrame,
    sort_cols: list[Column],
    rank_col: str,
    partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Two-stage exact global row_number; returns (df, total_rows)."""
    spark = df.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    rp = df.repartitionByRange(n_parts, *sort_cols).sortWithinPartitions(*sort_cols)

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("__pid", T.IntegerType(), False),
            T.StructField("__lrank", T.LongType(), False),
        ]
    )

    def stamp(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__pid"] = pid
            pdf["__lrank"] = range(seen + 1, seen + len(pdf) + 1)
            seen += len(pdf)
            yield pdf

    # Pin ONE physical partitioning before anything reads it:
    # repartitionByRange samples range boundaries per execution, so
    # without this the counts action and the returned plan could run
    # against DIFFERENT partitionings and the offsets would silently
    # misalign (duplicated/skipped global ranks). The eager local
    # checkpoint materializes the stamped rows once; both the counts
    # job and the final plan then read the same frozen partitions.
    stamped = rp.mapInPandas(stamp, out_schema).localCheckpoint(eager=True)
    # Driver-side prefix sum over per-partition counts: bounded by the
    # partition count, not the data (documented bounded-collect, same
    # class as similarity/ivf's fit sample).
    counts = {
        r["__pid"]: r["n"]
        for r in stamped.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in range(n_parts):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    arr = F.array(*[F.lit(int(o)) for o in offsets])
    ranked = stamped.withColumn(
        rank_col,
        (F.element_at(arr, F.col("__pid") + 1) + F.col("__lrank")).cast("long"),
    ).drop("__pid", "__lrank")
    return ranked, acc


def global_prefix_sum(
    df: DataFrame,
    sort_cols: list[Column],
    value_col: str,
    out_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running sum of ``value_col`` over a global total
    order, with no ``Exchange SinglePartition`` stage — the prefix-sum
    generalization of :func:`_with_global_rank` (a global row number is
    the prefix sum of 1s).

    Same two-stage shape: range-partition on ``sort_cols`` (partition
    i's rows all order before partition i+1's), stamp within-partition
    running sums in one Arrow pass, then lift per-partition totals to
    the driver (bounded by the PARTITION count, a cluster constant) and
    add the prefix offset as a plan literal indexed by partition id.
    ``sort_cols`` must be a unique total order for ties to resolve
    identically to the window form.

    Eagerly checkpoints the stamped relation (same reason as
    _with_global_rank: the range partitioner samples boundaries per
    execution, so the totals job and the returned plan must read ONE
    frozen partitioning).  The CALLER owns the cache lifetime — after
    materializing every derived output, call :func:`release_rank_cache`
    on the returned DataFrame."""
    spark = df.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    rp = df.repartitionByRange(n_parts, *sort_cols).sortWithinPartitions(*sort_cols)

    val_type = df.schema[value_col].dataType
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("__pid", T.IntegerType(), False),
            T.StructField("__lsum", val_type, False),
        ]
    )

    def stamp(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__pid"] = pid
            if len(pdf):
                cs = pdf[value_col].cumsum() + acc
                pdf["__lsum"] = cs
                acc = cs.iloc[-1]
            else:
                pdf["__lsum"] = pdf[value_col]
            yield pdf

    stamped = rp.mapInPandas(stamp, out_schema).localCheckpoint(eager=True)
    totals = {
        r["__pid"]: r["t"]
        for r in stamped.groupBy("__pid")
        .agg(F.sum(value_col).alias("t"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in range(n_parts):
        offsets.append(acc)
        acc += totals.get(pid, 0) or 0
    arr = F.array(*[F.lit(o).cast(val_type) for o in offsets])
    return stamped.withColumn(
        out_col,
        (F.element_at(arr, F.col("__pid") + 1) + F.col("__lsum")).cast(val_type),
    ).drop("__pid", "__lsum")


def release_rank_cache(df: DataFrame) -> bool:
    """Free the eager localCheckpoint blocks backing a two-stage rank
    result (``exact=False`` paths checkpoint the full stamped relation
    to pin one physical partitioning — see _with_global_rank).

    The checkpoint's lineage is CUT: call this only after every derived
    output has been materialized (collected, written, or itself
    checkpointed) — the ranked relation is not recomputable afterwards.
    Long-lived sessions that skip this accumulate checkpointed RDD
    blocks in executor storage, one per exact=False call (the same
    residue class text/dedup's scope_cache releases). The registered
    decile/quartile queries aggregate to tiny outputs, eagerly
    materialize those, then release here — callers with full-size
    outputs own the lifetime instead.

    Best-effort by design (walks the JVM logical plan for LogicalRDD
    nodes): returns True when at least one cached RDD was released."""
    try:
        def walk(node) -> bool:
            found = False
            if node.getClass().getSimpleName() == "LogicalRDD":
                node.rdd().unpersist(False)
                found = True
            ch = node.children()
            for i in range(ch.size()):
                if walk(ch.apply(i)):
                    found = True
            return found

        return walk(df._jdf.queryExecution().logical())
    except Exception:
        return False


def ntile_buckets(
    df: DataFrame,
    n: int,
    sort_cols: list[Column],
    bucket_col: str = "bucket",
    exact: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY sort_cols)`` — exact window form, or the
    two-stage scale-safe form (``exact=False``) deriving the bucket from
    the global row number with SQL ntile's uneven-split rule (the first
    ``N mod n`` buckets get the extra row). ``sort_cols`` must be a
    unique total order for the two paths to agree on ties.

    ``exact=False`` eagerly checkpoints the stamped relation (see
    _with_global_rank) — the CALLER owns that cache's lifetime: after
    materializing every derived output, call :func:`release_rank_cache`
    on the returned DataFrame, or the blocks persist for the session."""
    if exact:
        return df.withColumn(bucket_col, F.ntile(n).over(W.orderBy(*sort_cols)))
    ranked, total = _with_global_rank(df, sort_cols, "__grank", partitions)
    q, rem = divmod(total, n)
    big = (q + 1) * rem  # rows covered by the first `rem` (larger) buckets
    r = F.col("__grank")
    if q == 0:  # fewer rows than buckets: bucket i = row i
        bucket = r
    else:
        bucket = F.when(r <= big, ((r - 1) / (q + 1)).cast("long") + 1).otherwise(
            F.lit(rem) + ((r - big - 1) / q).cast("long") + 1
        )
    return ranked.withColumn(bucket_col, bucket.cast("int")).drop("__grank")


def distribution_ranks(
    df: DataFrame,
    sort_cols: list[Column],
    pct_col: str = "pct_rank",
    cume_col: str = "cum_dist",
    exact: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """``percent_rank`` + ``cume_dist`` over a global ORDER BY — exact
    window form, or the two-stage form (``exact=False``):
    ``(rank-1)/(N-1)`` and ``rank/N`` from the global row number, which
    equal the window functions whenever ``sort_cols`` is a unique total
    order (no ties, which callers guarantee by tie-breaking on a key).
    ``exact=False`` checkpoint lifetime is caller-owned — see
    :func:`release_rank_cache` / ntile_buckets docstring."""
    if exact:
        w = W.orderBy(*sort_cols)
        return df.withColumn(pct_col, F.percent_rank().over(w)).withColumn(
            cume_col, F.cume_dist().over(w)
        )
    ranked, total = _with_global_rank(df, sort_cols, "__grank", partitions)
    r = F.col("__grank")
    pct = (r - 1) / F.lit(total - 1) if total > 1 else F.lit(0.0)
    return (
        ranked.withColumn(pct_col, pct.cast("double"))
        .withColumn(cume_col, (r / F.lit(total)).cast("double"))
        .drop("__grank")
    )


def key_gaps(
    df: DataFrame,
    key_col: str,
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Missing ranges in a unique integer key sequence — distributed
    lag with NO raw-fact single-partition window (round-4 verdict #1:
    ``lag() OVER (ORDER BY key)`` funnels every row through one task).

    Deterministic VALUE bucketing replaces the global sort: every
    window partitions by ``floor(key / bucket_size)``, so each
    partition holds at most ``bucket_size`` keys BY CONSTRUCTION —
    no range-partitioner sampling to pin (contrast
    ``_with_global_rank``'s localCheckpoint), no skew case, and the
    per-partition lag finds every gap between keys in the same bucket.
    Cross-bucket gaps stitch from the per-bucket (min, max) summary:
    lagging max over bucket order spans any run of EMPTY buckets in
    one step, so the stitch relation has one row per NON-EMPTY bucket —
    ≤ rows/1 and ≤ keyspace/bucket_size. That summary lag is the one
    single-partition window, in the accepted aggregate-bounded class
    (cf. lorenz/rfm notes); for keyspaces past ~10⁹·bucket_size,
    re-bucket the summary a second level.

    Returns (gap_start, gap_end, gap_len) — one row per maximal run of
    missing keys strictly inside [min(key), max(key)].
    """
    k = F.col(key_col).cast("long")
    keyed = df.select(k.alias("k"), (k - (k % bucket_size)).alias("b"))
    wloc = W.partitionBy("b").orderBy("k")
    local = (
        keyed.select("k", F.lag("k").over(wloc).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("k") - F.col("prev") > 1))
    )
    summary = keyed.groupBy("b").agg(
        F.min("k").alias("mn"), F.max("k").alias("mx")
    )
    wb = W.orderBy("b")
    stitch = (
        summary.select(
            F.col("mn").alias("k"), F.lag("mx").over(wb).alias("prev")
        )
        .filter(F.col("prev").isNotNull() & (F.col("k") - F.col("prev") > 1))
    )
    gaps = local.select("k", "prev").unionByName(stitch.select("k", "prev"))
    return gaps.select(
        (F.col("prev") + 1).alias("gap_start"),
        (F.col("k") - 1).alias("gap_end"),
        (F.col("k") - F.col("prev") - 1).alias("gap_len"),
    )
