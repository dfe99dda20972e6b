"""Physical-plan quality tests — the 100 TB properties, pinned.

Correctness tests say the answer is right; these say the *plan* is the one
that survives a 1000-executor cluster: dims broadcast, rank pushdown
(WindowGroupLimit) for greatest-n-per-group, top-k as TakeOrderedAndProject,
filters reaching the parquet scan, no cartesian products, no join at all in
the union-tag as-of rewrite, and no silent plan regressions that would only
show up at scale.

Known engine-level limitation (documented, not a bug here): parquet
row-group pushdown does not cover timestamp_ntz predicates (Spark's
ParquetFilters has no TimestampNTZType case), so date-range filters on the
testdata's ntz columns evaluate post-scan. At rest, the engine's own tables
are written date-partitioned (io/writers.write_partitioned) and rely on
partition pruning — directory-level, type-independent — which is the
mechanism that matters at 100 TB.
"""

import re

import pytest

from trading_dashboard_spark.queries import QUERY_REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERY_REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _pushed(plan: str) -> list[str]:
    return [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m]


def test_flagship_plan_shape(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top_gainers")
    assert "BroadcastHashJoin" in plan          # dim join broadcasts (J1)
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan           # latest-per-key = rank pushdown
    assert "TakeOrderedAndProject" in plan      # top-10 never globally sorts
    assert any("IsNotNull" in p for p in _pushed(plan))


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 2  # region/nation never shuffle
    assert "CartesianProduct" not in plan
    assert any("IsNotNull" in p for p in _pushed(plan))


def test_greatest_n_per_group_uses_rank_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "latest_event_per_user")
    assert "WindowGroupLimit" in plan
    # rewrite is window-based, not aggregate+self-join
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top_events_by_value")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_asof_join_is_joinless(spark, sf_dir):
    """The union-tag as-of rewrite must contain NO join operator — one
    union, one window over (key, time), one filter. Linear, one shuffle."""
    plan = _plan(spark, sf_dir, "asof_purchase_click")
    assert "Join" not in plan
    assert "Window" in plan


def test_aggregations_are_partial(spark, sf_dir):
    """Map-side combine: every groupBy plans partial + final HashAggregate,
    so the shuffle carries partial states, not raw rows."""
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_minhash_plan_is_bounded(spark, sf_dir):
    """Near-dup dedup: no cartesian product anywhere, and with the
    registered query's ``persist=True`` every reference to the
    (id, shingles) relation is an InMemoryTableScan — the tokenize/
    shingle expansion executes once, not once per reference. (The
    executedPlan *text* repeats the cached relation's child plan under
    each InMemoryTableScan node, so FileScan counts are textual, not
    executions; the InMemoryTableScan count is the real property.)"""
    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.text.dedup import minhash_near_dup_pairs

    docs = load_table(spark, "documents", sf_dir)
    df = minhash_near_dup_pairs(docs, persist=True, scope_cache=False)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert plan.count("InMemoryTableScan") == 3
    finally:
        spark.catalog.clearCache()


def test_knn_probe_single_scan(spark, sf_dir):
    """Probe kNN is one corpus scan + broadcast of the 1-row probe +
    TakeOrderedAndProject — embarrassingly parallel, no shuffle of vectors."""
    plan = _plan(spark, sf_dir, "knn_probe_top10")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scalar_filters_reach_parquet_scan(spark, sf_dir):
    """Non-timestamp predicates must push to the scan (row-group skipping)."""
    from pyspark.sql import functions as F
    from trading_dashboard_spark.io.readers import load_table

    o = load_table(spark, "orders", sf_dir)
    plan = (
        o.filter((F.col("o_totalprice") > 1000.0) & F.col("o_orderstatus").isNotNull())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    joined = " ".join(_pushed(plan))
    assert "GreaterThan(o_totalprice" in joined
    assert "IsNotNull(o_orderstatus)" in joined


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A two-column projection must not read the full lineitem schema."""
    from trading_dashboard_spark.io.readers import load_table

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    plan = li._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_ivf_probe_is_scan_filter_topk(spark, sf_dir):
    """IVF probe search must stay map-only until the final top-k: cell
    assignment is a projection, the probe-cell filter is a Filter (no
    join, no aggregation), and the top-k is TakeOrderedAndProject — the
    only wide operation in the plan."""
    plan = _plan(spark, sf_dir, "ivf_ann_probe_top5")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_shard_packing_no_global_window(spark, sf_dir):
    """Shard packing's prefix sum must partition by source — a global
    (empty-partition) window would serialize the corpus through one task."""
    plan = _plan(spark, sf_dir, "token_budget_shards")
    assert "Window" in plan
    # Spark marks an unpartitioned window's exchange as SinglePartition
    assert "Exchange SinglePartition" not in plan


def test_salted_agg_is_two_stage(spark, sf_dir):
    """The salted aggregate must show both groupBys (partial on
    (keys, salt), final on keys) — collapsing them would re-concentrate
    the hot key on one reducer."""
    plan = _plan(spark, sf_dir, "skew_salted_event_totals")
    assert plan.count("HashAggregate") >= 4  # 2 logical stages x partial/final


def test_range_join_is_hash_join_not_nested_loop(spark, sf_dir):
    """The bucketed range join must plan as an equi hash join on the
    bucket key with a residual BETWEEN — BroadcastNestedLoopJoin is the
    O(n·m) shape the rewrite exists to avoid."""
    plan = _plan(spark, sf_dir, "range_join_opening_window")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_multi_resolution_rollup_single_exchange(spark, sf_dir):
    """All grains aggregate through ONE shuffle (explode feeds a single
    partial-agg exchange) — not one job per resolution."""
    plan = _plan(spark, sf_dir, "multi_resolution_rollup")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Union" not in plan


def test_sessionization_single_exchange(spark, sf_dir):
    """sessionize + both downstream rollups share ONE hash exchange: the
    window shuffles on user_id, and (user_id, session_id) grouping is
    satisfied by that same partitioning (key-prefix clustering)."""
    plan = _plan(spark, sf_dir, "event_sessionization")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_macd_is_jvm_single_shuffle(spark, sf_dir):
    """MACD's default lane (r5) is the collect_list fold: NO Python
    evaluator anywhere in the plan, and the whole indicator costs one
    aggregate exchange over the daily bars (the fold + zip_with +
    explode are narrow)."""
    plan = _plan(spark, sf_dir, "macd_indicator")
    assert "MapInPandas" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_gap_audit_no_raw_single_partition_window(spark, sf_dir):
    """orderkey_gap_audit (r5): the raw-fact lag partitions by the
    deterministic key bucket — the ONLY single-partition exchange
    feeds the bucket-summary stitch (aggregate-bounded, ≤ keyspace /
    bucket_size rows), never the orders scan."""
    plan = _plan(spark, sf_dir, "orderkey_gap_audit")
    assert "windowspecdefinition(b" in plan  # bucketed raw lag
    assert plan.count("Exchange SinglePartition") <= 1


def test_repetition_signals_map_only(spark, sf_dir):
    """Per-doc repetition metrics (incl. the mode count) are pure
    projection work — no exchange, no explode-shuffle."""
    plan = _plan(spark, sf_dir, "repetition_signals")
    assert "Exchange" not in plan


def test_late_shipment_semi_join(spark, sf_dir):
    """EXISTS with cross-side predicate compiles to a left-semi join,
    never a cartesian/nested-loop."""
    plan = _plan(spark, sf_dir, "late_shipment_priorities")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_label_centroids_broadcasts_centroids(spark, sf_dir):
    """The centroid scoring join must broadcast the (labels x dim)
    centroid relation — shuffling the vector side to join a
    kilobyte-scale table would be the classic 100 TB mistake."""
    plan = _plan(spark, sf_dir, "label_centroids")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_source_mixture_sampling_is_map_side(spark, sf_dir):
    """The sampling filter applies a broadcast plan to the corpus scan:
    no shuffle of document rows before the filter (only the reporting
    aggregates exchange)."""
    plan = _plan(spark, sf_dir, "source_mixture_plan")
    assert "BroadcastHashJoin" in plan


def test_cohort_retention_two_exchanges(spark, sf_dir):
    """One explicit user_id repartition serves the (user, day) distinct
    AND the cohort-day window (hash on a key subset clusters the full
    key); only the final matrix aggregate adds a second exchange."""
    plan = _plan(spark, sf_dir, "user_retention_cohorts")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange SinglePartition" not in plan


def test_ohlc_is_pure_hash_aggregate(spark, sf_dir):
    """OHLC resampling is ONE exchange feeding partial+final
    HashAggregate with ZERO Sort/Window operators: open/close come from
    min_by/max_by on a packed BIGINT ordering key, so the aggregation
    buffer stays primitive (a struct key demotes to SortAggregate; the
    old two opposed row_number windows cost two full sorts)."""
    plan = _plan(spark, sf_dir, "hourly_ohlc_candles")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2  # map-side partials
    assert "SortAggregate" not in plan
    assert "Sort " not in plan
    assert " Window" not in plan


def test_chunk_boilerplate_build_side_filtered(spark, sf_dir):
    """The chunk-repeat join-back must (a) cache the exploded chunk
    relation once for both consumers (2 InMemoryTableScan refs), and
    (b) pre-filter the repeat-count side to nd > 1 BEFORE the join, so
    the build side carries only repeated fingerprints (broadcastable at
    realistic dup rates) instead of the full chunk vocabulary."""
    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.text.analysis import chunk_boilerplate

    docs = load_table(spark, "documents", sf_dir)
    df = chunk_boilerplate(docs, persist=True, scope_cache=False)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") == 2
        assert re.search(r"Filter.*\(nd#\d+L? > 1\)", plan)
        assert "CartesianProduct" not in plan
    finally:
        spark.catalog.clearCache()


def test_tfidf_single_token_exchange(spark, sf_dir):
    """TF-IDF's token pipeline runs off doc-level exchanges only: the
    corpus-bytes doc repartition (×2 consumers) + the vocabulary-sized
    df aggregate = 3 hash exchanges, none of them token-level; the
    per-doc top-3 prunes via WindowGroupLimit."""
    plan = _plan(spark, sf_dir, "tfidf_top_terms")
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_q17_shape_broadcasts_dim_sides(spark, sf_dir):
    """The decorrelated Q17 shape: the brand-filtered part dim and the
    per-part average both join broadcast (AQE or static) — the fact
    table is never on a shuffled build side, and the brand filter is
    pushed to the part scan."""
    plan = _plan(spark, sf_dir, "small_quantity_part_revenue")
    assert "CartesianProduct" not in plan
    assert any("Brand" in p for p in _pushed(plan))


def test_nation_value_share_is_broadcast_only(spark, sf_dir):
    """Q11 shape: supplier/nation dims and the single-row global total
    all broadcast — zero SortMergeJoin; the only fact-scale exchange is
    the nationkey aggregate."""
    plan = _plan(spark, sf_dir, "important_nation_value_share")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bm25_has_no_token_explode(spark, sf_dir):
    """BM25 over a fixed query vocabulary never materializes token rows:
    per-term tf is a map-only array fold (zero Generate operators), the
    only aggregates are the single-row corpus stats, and the result is
    a TakeOrderedAndProject. The registered fn eagerly checkpoints its
    20-row result to scope the r8 persist (the checkpointed plan is an
    RDD scan); `_lazy=True` exposes the scoring plan this test reads."""
    from trading_dashboard_spark.queries_text import bm25_keyword_search

    df, base = bm25_keyword_search(spark, sf_dir, _lazy=True)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan, plan
        assert "TakeOrderedAndProject" in plan
        assert "InMemoryTableScan" in plan  # scoring reads the columnar cache
    finally:
        base.unpersist()


def test_sweep_line_windows_are_day_partitioned(spark, sf_dir):
    """The concurrency sweep's running sum is partitioned by day — no
    single-partition window anywhere in the plan."""
    plan = _plan(spark, sf_dir, "max_concurrent_events_per_day")
    assert "Exchange SinglePartition" not in plan


def test_pca_covariance_is_arrow_gram(spark, sf_dir):
    """PCA's corpus pass is the Arrow Gram kernel (mapInPandas), not a
    dim2 row explode; iterations join broadcast."""
    plan = _plan(spark, sf_dir, "pca_top_component_power_iteration")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_pq_search_is_codegen_scan_topk(spark, sf_dir):
    """The registered PQ search: encoding is ONE Arrow batch pass
    (ArrowEvalPython — the BLAS kernel; never row-at-a-time
    BatchEvalPython), ADC scoring and rerank stay JVM-side, and the
    shortlist resolves with TakeOrderedAndProject — a code-only scan,
    not a shuffle; the same holds for the IVFPQ composition, which adds
    only a cell Filter. The zero-Python expression lane is asserted
    separately on the at-rest coded table (test_similarity)."""
    # one Arrow kernel for the PQ encode; IVFPQ adds one more for the
    # vectorized cell assignment — never row-at-a-time evaluators
    for name, max_arrow in (("pq_search_top5", 1), ("ivfpq_search_top5", 2)):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert plan.count("ArrowEvalPython") <= max_arrow, name
        assert "TakeOrderedAndProject" in plan, name
        assert "HashAggregate" not in plan, name


def test_eval_decontamination_broadcasts_eval_windows(spark, sf_dir):
    """The eval slice's window-fp set is the structurally small side of
    the decontamination check: it must BROADCAST into the train-side
    explode (no shuffle of the exploded corpus windows for the join),
    with no cartesian product anywhere."""
    plan = _plan(spark, sf_dir, "eval_window_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivf_refresh_broadcasts_centroids(spark, sf_dir):
    """Codebook refresh: both the incumbent assignment and every Lloyd
    iteration are map-side passes over broadcast centroid relations —
    the corpus is never the build side and never cartesian-joined
    against anything its own size."""
    plan = _plan(spark, sf_dir, "ivf_codebook_refresh")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_winnowing_decon_splits_work_not_duplicates_it(spark, sf_dir):
    """The doc_id-only split predicate must push BELOW the winnow window
    (the train branch winnows only train docs), the eval side must be
    read from its call-scoped CACHE (materialized once, consumed by the
    fp broadcast AND the per-doc aggregate), and the train probe must
    be a BROADCAST left-semi — the 80%-of-corpus side is never shuffled
    on fp (the r10 rewrite that closed the ×100 2.12× reading). The
    registered fn eagerly checkpoints its ≤100-row result to scope the
    cache; `_lazy=True` exposes the plan this test reads."""
    from trading_dashboard_spark.queries_text import (
        winnowing_decontamination,
    )

    df, eval_sel = winnowing_decontamination(spark, sf_dir, _lazy=True)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the train branch's winnow Generate sits above an md5-filtered
        # scan (split predicate below the window)
        assert "Generate explode" in plan
        assert "substring(md5(cast(cast(doc_id" in plan
        # eval side reads the cache — twice (fp broadcast + per-doc agg)
        assert plan.count("InMemoryTableScan") >= 2
        # the train probe broadcasts the eval fp set (LeftSemi build)
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
    finally:
        eval_sel.unpersist()


def test_dsir_resample_is_topk_not_global_sort(spark, sf_dir):
    """The Gumbel resample must end in TakeOrderedAndProject — no
    global Sort, no single-partition exchange for the top-50."""
    plan = _plan(spark, sf_dir, "dsir_gumbel_resample")
    assert "TakeOrderedAndProject" in plan
    # the only SinglePartition exchange allowed is the 256-row histogram
    # total (KB-scale); the output key must never be globally sorted
    assert "Sort [gkey" not in plan
