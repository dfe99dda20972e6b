"""Count-Min sketch — fixed-memory frequency estimation over unbounded keys.

The missing piece between exact `groupBy(key).count()` (state grows with
distinct keys — fine for bounded keys, fatal for, say, URL or n-gram keys
at corpus scale) and `approx_count_distinct` (cardinality, not per-key
frequency). A CMS is a depth×width counter matrix: each key increments one
bucket per depth row (independent hashes); a point estimate is the MIN over
its depth buckets — always an over-estimate, with error ≤ 2n/width at 95%
confidence for depth 4.

Spark construction: explode each row to ``depth`` (row, bucket) pairs and
count per (row, bucket) — ONE partial-aggregated shuffle whose state is at
most depth×width cells regardless of key cardinality. Hashes are fixed-seed
md5 slices (no RNG), so the whole sketch — build and probe — is
deterministic and replayable in any SQL engine; the oracle replicates it
verbatim, which makes this a rare *hash-checkable* sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def cms_bucket(key: Column, depth_idx: int, width: int) -> Column:
    """Bucket of ``key`` in depth row ``depth_idx``: first 8 hex chars of
    md5(depth:key) mod width — portable integer math in any engine."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{depth_idx}:"), key)), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(width))


def cms_build(
    df: DataFrame, key: Column, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: DataFrame of (depth_idx, bucket, cnt) — at most
    depth×width rows, independent of distinct-key count."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("depth_idx"),
                    cms_bucket(key, d, width).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("p")
    return (
        df.select(pairs)
        .select(F.col("p.depth_idx").alias("depth_idx"), F.col("p.bucket").alias("bucket"))
        .groupBy("depth_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key: Column, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each probe key: min over depth rows of its bucket
    count. The sketch is tiny (≤ depth×width rows) — it broadcasts; the
    probe side never shuffles."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("depth_idx"),
                    cms_bucket(key, d, width).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("p")
    probed = probes.select("*", pairs).select(
        *probes.columns,
        F.col("p.depth_idx").alias("depth_idx"),
        F.col("p.bucket").alias("bucket"),
    )
    joined = probed.join(F.broadcast(sketch), ["depth_idx", "bucket"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy(*probes.columns).agg(F.min("cnt").alias("est_count"))


def misra_gries_partition(col: str, capacity: int):
    """Partition-level Misra-Gries summary as a mapInPandas function:
    at most ``capacity`` (item, est) rows per partition, whatever the
    distinct-key cardinality.

    Classic decrement-compaction, batch-vectorized: fold each Arrow
    batch's exact value_counts into the running counters, and whenever
    the counter set exceeds capacity, subtract the (capacity+1)-th
    largest count from everything and drop the non-positive — the
    mergeable-summaries form (Agarwal et al.), so summing summaries
    across partitions is again a valid summary. Estimates UNDERCOUNT by
    at most n/(capacity+1) globally; any item with true frequency above
    that bound is guaranteed to survive.
    """

    def fn(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: n - cut for k, n in counters.items() if n - cut > 0
                }
        yield pd.DataFrame(
            {"item": list(counters), "est": list(counters.values())}
        )

    return fn


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, capacity: int = 64
) -> DataFrame:
    """Approximate top-k frequent items in bounded memory: per-partition
    Misra-Gries summaries (≤ capacity counters each), one aggregate to
    merge, top-k by estimate. Exact ``groupBy.count`` state grows with
    distinct keys; this never exceeds partitions × capacity rows in
    flight. When capacity exceeds the per-partition distinct count the
    estimates are exact — the regime the oracle query pins — and the
    compaction regime's error bound is unit-tested."""
    item_type = df.schema[col].dataType.simpleString()
    summaries = df.select(col).mapInPandas(
        misra_gries_partition(col, capacity), schema=f"item {item_type}, est long"
    )
    merged = summaries.groupBy("item").agg(F.sum("est").alias("est"))
    return merged.orderBy(F.col("est").desc(), F.col("item")).limit(k)


def misra_gries_grouped_partition(group: str, col: str, capacity: int):
    """Partition-level PER-GROUP Misra-Gries summaries as a mapInPandas
    function: at most ``capacity`` (item, est) rows per (partition,
    group). Same decrement-compaction and mergeability as
    :func:`misra_gries_partition`, applied to each group's counter set
    independently — the undercount bound becomes per-group:
    ≤ n_g/(capacity+1) for group size n_g."""

    def fn(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            vc = pdf.groupby([group, col], sort=False).size()
            touched = set()
            for (g, v), c in vc.items():
                d = counters.setdefault(g, {})
                d[v] = d.get(v, 0) + int(c)
                touched.add(g)
            for g in touched:
                d = counters[g]
                if len(d) > capacity:
                    cut = sorted(d.values(), reverse=True)[capacity]
                    counters[g] = {
                        k: n - cut for k, n in d.items() if n - cut > 0
                    }
        yield pd.DataFrame(
            [(g, v, n) for g, d in counters.items() for v, n in d.items()],
            columns=["grp", "item", "est"],
        )

    return fn


def grouped_heavy_hitters(
    df: DataFrame, group: str, col: str, k: int = 5, capacity: int = 64
) -> DataFrame:
    """Approximate top-k frequent items WITHIN EACH GROUP in bounded
    memory (the per-group form of :func:`heavy_hitters` — r6 candidate
    groundwork): per-partition per-group Misra-Gries summaries, one
    (group, item) merge aggregate, per-group top-k via the rank window
    (WindowGroupLimit prunes below the shuffle). In-flight state never
    exceeds partitions × groups-per-partition × capacity rows; exact
    ``groupBy(group, item)`` state grows with per-group distincts.
    When capacity exceeds every group's per-partition distinct count,
    estimates are exact."""
    from pyspark.sql import Window as W

    g_type = df.schema[group].dataType.simpleString()
    i_type = df.schema[col].dataType.simpleString()
    summaries = df.select(group, col).mapInPandas(
        misra_gries_grouped_partition(group, col, capacity),
        schema=f"grp {g_type}, item {i_type}, est long",
    )
    merged = summaries.groupBy("grp", "item").agg(F.sum("est").alias("est"))
    w = W.partitionBy("grp").orderBy(F.col("est").desc(), F.col("item"))
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(F.col("grp").alias(group), F.col("item").alias(col),
                "est", F.col("rk").cast("int").alias("rk"))
    )
