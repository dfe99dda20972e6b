"""Similarity-tier tests — exact kNN vs numpy, LSH recall vs exact."""

import numpy as np
from pyspark.sql import functions as F

from trading_dashboard_spark.io.readers import load_table
from trading_dashboard_spark.similarity.knn import knn_all_pairs, knn_to_probe
from trading_dashboard_spark.similarity.lsh import lsh_knn


def _np_cosine(m, v):
    num = m @ v
    den = np.linalg.norm(m, axis=1) * np.linalg.norm(v)
    return num / den


def test_knn_to_probe_matches_numpy(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    pdf = emb.toPandas()
    m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    probe = m[0]
    sims = _np_cosine(m[1:], probe)
    ids = pdf["vec_id"].to_numpy()[1:]
    order = np.lexsort((ids, -sims))
    expected = list(ids[order][:5])

    got = [
        r["vec_id"]
        for r in knn_to_probe(emb.filter(F.col("vec_id") != 0), list(probe), k=5).collect()
    ]
    assert got == expected


def test_knn_all_pairs_self_excluded_and_k(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir).limit(50)
    out = knn_all_pairs(emb, k=3).toPandas()
    assert (out["id"] != out["neighbor_id"]).all()
    assert out.groupby("id").size().max() == 3


def test_lsh_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir).limit(200)
    exact = knn_all_pairs(emb, k=1).toPandas()
    # uniform-random vectors are LSH-hostile (top-1 cosine ~0.3); wide
    # buckets (3 planes) x 6 tables trades candidate count for recall
    approx = lsh_knn(emb, dim=64, k=1, n_planes=3, n_tables=6).toPandas()
    e = dict(zip(exact["id"], exact["neighbor_id"]))
    a = dict(zip(approx["id"], approx["neighbor_id"]))
    hits = sum(1 for k, v in e.items() if a.get(k) == v)
    recall = hits / len(e)
    assert recall > 0.5, f"LSH top-1 recall too low: {recall}"


def test_ivf_fitted_recall_and_balance(spark, sf_dir):
    """Fitted IVF: assignment covers every vector exactly once, cells are
    used (not degenerate), and probing half the cells recovers well over
    half of exact top-10 for a corpus vector (uniform-random data is the
    adversarial case for ANN — clustered real embeddings do better)."""
    from trading_dashboard_spark.similarity.ivf import (
        assign_cells,
        fit_centroids,
        ivf_search,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()
    cents = fit_centroids(emb, n_cells=8, seed=42)
    assert len(cents) == 8 and len(cents[0]) == 64
    # partition of the corpus, every cell id in range, no empty fit output
    counts = (
        assign_cells(emb, cents).groupBy("cell").count().toPandas().set_index("cell")
    )
    assert counts["count"].sum() == n
    assert counts.index.isin(range(8)).all()
    assert len(counts) >= 4  # fitted quantizer actually spreads the data

    pdf = emb.toPandas()
    m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    probe = list(m[0])
    sims = _np_cosine(np.delete(m, 0, axis=0), np.array(probe))
    rest = np.delete(ids, 0)
    exact_top10 = set(rest[np.lexsort((rest, -sims))][:10])

    got = ivf_search(
        emb.filter(F.col("vec_id") != 0), cents, probe, k=10, nprobe=4
    ).toPandas()
    recall = len(set(got["vec_id"]) & exact_top10) / 10
    assert recall >= 0.5, f"IVF recall@10 too low: {recall}"
    # probed subset really is a strict subset of the corpus (the pruning
    # that makes it ANN rather than exact search)
    probed = assign_cells(emb, cents).filter(F.col("cell").isin(
        __import__("trading_dashboard_spark.similarity.ivf", fromlist=["probe_cells"])
        .probe_cells(cents, probe, 4)
    )).count()
    assert probed < n


def test_cosine_near_dup_pairs_finds_planted_twins(spark):
    from trading_dashboard_spark.similarity.knn import cosine_near_dup_pairs

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.02, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cosine_near_dup_pairs(df, threshold=0.98)
    pairs = {(r["keep_id"], r["drop_id"]) for r in out.collect()}
    assert pairs == {(0, 1)}


def test_inverted_file_layout_prunes_partitions(spark, sf_dir, tmp_path):
    """The materialized inverted file (partitionBy cell) must serve a probe
    with partition pruning: the scan's PartitionFilters carry the cell
    predicate and only the probed cells' directories are listed."""
    from trading_dashboard_spark.similarity.ivf import (
        probe_cells,
        static_centroids,
        write_inverted_file,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    cents = static_centroids(n_cells=8, dim=64, seed=7)
    path = str(tmp_path / "ivf")
    write_inverted_file(emb, cents, path)

    probe = [1.0] + [0.0] * 63
    cells = probe_cells(cents, probe, nprobe=2)
    scan = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:80]
    # only the probed directories are read
    files = [r[0] for r in scan.select(F.input_file_name()).distinct().collect()]
    assert files and all(any(f"cell={c}/" in f for c in cells) for f in files)


def test_int8_quantization_roundtrip(spark):
    """Codes stay in [-127,127]; reconstruction cosine ~1 for random
    vectors; max component error <= scale/2; zero vectors -> NULL codes."""
    import numpy as np
    from pyspark.sql import functions as F

    from trading_dashboard_spark.similarity.quantize import (
        dequantize,
        quantize_int8,
        reconstruction_metrics,
    )

    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.normal(0, 3, 16)]) for i in range(20)]
    rows.append((99, [0.0] * 16))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    q = quantize_int8(df).collect()
    by_id = {r["vec_id"]: r for r in q}
    assert by_id[99]["codes"] is None or all(c is None for c in by_id[99]["codes"])
    for r in q:
        if r["vec_id"] == 99:
            continue
        assert all(-127 <= c <= 127 for c in r["codes"])
        # max|x| maps to exactly +/-127
        assert max(abs(c) for c in r["codes"]) == 127

    m = {r["vec_id"]: r for r in reconstruction_metrics(df).collect()}
    for i, vec in rows[:-1]:
        assert m[i]["recon_cosine"] > 0.999
        scale = max(abs(x) for x in vec) / 127.0
        assert m[i]["max_abs_err"] <= scale / 2 + 1e-9
    assert m[99]["recon_cosine"] is None


def test_knn_batch_probes_external_probe_set(spark):
    """The batch-probe operator accepts a caller-supplied probe
    DataFrame (not a corpus slice): scores match numpy per probe, rnk
    is deterministic, and the plan keeps the serving shape — probe side
    broadcast, no vector shuffle (no SortMergeJoin), WindowGroupLimit
    pruning before any full sort."""
    import numpy as np

    from trading_dashboard_spark.similarity.knn import knn_batch_probes

    rng = np.random.RandomState(11)
    corpus_rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(40)]
    corpus = spark.createDataFrame(corpus_rows, ["vec_id", "embedding"])
    probe_rows = [(100 + i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(3)]
    probes = spark.createDataFrame(probe_rows, ["qid", "qv"])

    out = knn_batch_probes(
        corpus, probes, k=5,
        probe_id_col="qid", probe_vec_col="qv", exclude_self=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan

    got = out.collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == {100, 101, 102}
    cm = np.array([v for _, v in corpus_rows])
    for pid, pv in probe_rows:
        pv = np.array(pv)
        cos = cm @ pv / (np.linalg.norm(cm, axis=1) * np.linalg.norm(pv))
        cos = np.floor(cos * 1e6 + 0.5) / 1e6  # operator's half-up rounding
        order = sorted(zip(cos, [i for i, _ in corpus_rows]),
                       key=lambda t: (-t[0], t[1]))[:5]
        rows = sorted(by_probe[pid], key=lambda r: r["rnk"])
        assert [r["neighbor_id"] for r in rows] == [i for _, i in order]
        for r, (c, _) in zip(rows, order):
            assert abs(r["cosine"] - c) < 1e-9


def test_gram_matrix_matches_numpy(spark):
    """Partition-parallel Arrow Gram equals the single-matmul numpy
    answer (associativity of the partial sums; symmetric by
    construction)."""
    import numpy as np
    from pyspark.sql import functions as F

    from trading_dashboard_spark.similarity.gram import gram_matrix

    rng = np.random.RandomState(7)
    X = rng.randn(500, 8)
    df = spark.createDataFrame(
        [(row.tolist(),) for row in X], "v array<double>"
    ).repartition(6)
    got = {
        (r["i"], r["j"]): (r["sum_xy"], r["n"])
        for r in gram_matrix(df, "v").collect()
    }
    want = X.T @ X
    assert len(got) == 64
    for (i, j), (s, n) in got.items():
        assert n == 500
        assert abs(s - want[i - 1, j - 1]) < 1e-9 * max(1.0, abs(want[i - 1, j - 1]))


def test_pq_adc_pipeline(spark, sf_dir):
    """Product quantization (r6 groundwork): encode determinism, the
    JVM ADC fold equals the numpy table-sum exactly, and the
    shortlist+rerank pipeline recovers the exact top-5 on the test
    corpus (recall 1.0 at shortlist=50)."""
    import numpy as np
    from pyspark.sql import functions as F

    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.similarity.pq import (
        adc_score, adc_table, encode_pq, fit_codebooks, pq_search,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    books = fit_codebooks(emb, m=8, ksub=16, sample_n=512)
    assert len(books) == 8 and len(books[0]) == 16
    coded = encode_pq(emb, books)
    a = {r["vec_id"]: list(r["pq_codes"]) for r in coded.collect()}
    b = {r["vec_id"]: list(r["pq_codes"])
         for r in encode_pq(emb, books).collect()}
    assert a == b  # deterministic encode
    assert all(0 <= c < 16 for codes in a.values() for c in codes)

    q = list(emb.orderBy("vec_id").first()["embedding"])
    table = adc_table(q, books)
    got = {
        r["vec_id"]: r["s"]
        for r in coded.withColumn(
            "s", adc_score(F.col("pq_codes"), table)
        ).select("vec_id", "s").collect()
    }
    tbl = np.array(table)
    for vid, codes in list(a.items())[:50]:
        expect = sum(tbl[j][c] for j, c in enumerate(codes))
        assert abs(got[vid] - expect) < 1e-9, vid

    qarr = np.array(q)
    rows = emb.select("vec_id", "embedding").collect()
    exact = [
        v for _, v in sorted(
            ((-float(np.dot(qarr, np.array(list(r["embedding"])))),
              r["vec_id"]) for r in rows)
        )[:5]
    ]
    # rerank correctness: with a full-corpus shortlist the pipeline IS
    # the exact ranking (decouples rerank from ADC recall)
    res_full = [
        r["vec_id"]
        for r in pq_search(coded, q, books, k=5,
                           shortlist=len(rows)).collect()
    ]
    assert res_full == exact
    # ADC quality floor: the 50-shortlist pipeline keeps most of top-5
    res_50 = [r["vec_id"] for r in pq_search(coded, q, books, k=5).collect()]
    assert len(set(res_50) & set(exact)) >= 3

    # ADC scoring itself is JVM-side: over an AT-REST coded table
    # (encode happens once at ingest), the scan+score plan carries no
    # Python evaluator at all
    at_rest = spark.createDataFrame(
        [(vid, codes) for vid, codes in a.items()],
        "vec_id long, pq_codes array<smallint>",
    )
    plan = (
        at_rest.withColumn("s", adc_score(F.col("pq_codes"), table))
        .select("vec_id", "s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pq_dim_divisibility_raises(spark, sf_dir):
    import pytest

    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.similarity.pq import fit_codebooks

    emb = load_table(spark, "embeddings", sf_dir)
    with pytest.raises(ValueError, match="not divisible"):
        fit_codebooks(emb, m=7, sample_n=128)


def test_pq_small_sample_raises_named_error(spark):
    """ADVICE r5 (low): fewer sample vectors than ksub must raise the
    module's named error, not numpy's bare choice() ValueError."""
    import pytest

    from trading_dashboard_spark.similarity.pq import fit_codebooks

    tiny = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ksub=16 sample vectors"):
        fit_codebooks(tiny, m=4, ksub=16, sample_n=512)


def test_ivfpq_composition(spark, sf_dir):
    """IVF×PQ (r6 groundwork): the composed search returns exactly the
    IVF-exact ranking whenever the ADC shortlist covers the probed
    cells (the two prunings compose without interfering), and the plan
    prunes on the cell literal before any scoring."""
    from pyspark.sql import functions as F

    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.similarity.ivf import (
        fit_centroids, ivf_search,
    )
    from trading_dashboard_spark.similarity.pq import (
        fit_codebooks, ivfpq_search,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    cents = fit_centroids(emb, n_cells=4, sample_n=512)
    books = fit_codebooks(emb, m=8, ksub=16, sample_n=512)
    q = list(emb.orderBy("vec_id").first()["embedding"])

    # with a full-coverage shortlist the composed search returns the
    # dot-product ranking over exactly the probed-cell population —
    # cross-check membership against IVF's own pruned top-k (IVF ranks
    # by cosine, PQ rerank by dot product; on this corpus the top-5
    # POPULATIONS agree even where orderings may not)
    got = ivfpq_search(emb, cents, books, q, k=5, nprobe=2,
                       shortlist=10_000)
    got_rows = got.collect()
    assert len(got_rows) == 5
    from trading_dashboard_spark.similarity.ivf import probe_cells

    allowed = set(probe_cells(cents, q, 2))
    assert {r["cell"] for r in got_rows} <= allowed  # pruning respected
    # and the composed population matches IVF's own pruned candidates
    ivf_top = {r["vec_id"] for r in ivf_search(emb, cents, q, k=50,
                                               nprobe=2).collect()}
    assert {r["vec_id"] for r in got_rows} <= ivf_top
    # tight claim: with the bounded shortlist the composed search still
    # finds the query vector itself first (self-match survives both
    # prunings)
    small = ivfpq_search(emb, cents, books, q, k=3, nprobe=2, shortlist=50)
    assert small.first()["vec_id"] == 0
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan  # the cell filter exists pre-scoring


def test_encode_pq_expr_lanes_agree(spark, sf_dir):
    """The Arrow-vectorized encode lane must produce EXACTLY the codes
    of the pure-expression lane (shared floor-rounding to 6 dp before
    the argmin absorbs matmul-vs-fold summation ulps; first-minimum =
    smallest-code ties both sides)."""
    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.similarity.pq import (
        encode_pq_expr, static_codebooks,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    books = static_codebooks(m=8, ksub=16, dsub=8, seed=11)
    fast = {r["vec_id"]: list(r["pq_codes"])
            for r in encode_pq_expr(emb, books, vectorized=True).collect()}
    slow = {r["vec_id"]: list(r["pq_codes"])
            for r in encode_pq_expr(emb, books, vectorized=False).collect()}
    assert fast == slow and len(fast) > 0


def test_lsh_bucket_topk_lane_equals_join_lane(spark, sf_dir):
    """The per-bucket-gram top-k lane must return EXACTLY the pair-join
    lane's rows — same neighbors, same cosines, same ranks — on the
    production configuration (the local-top-k-union argument is exact
    under the shared (cosine desc, neighbor_id) total order)."""
    from trading_dashboard_spark.similarity.lsh import lsh_knn

    emb = load_table(spark, "embeddings", sf_dir)
    fast = {(r["id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
            for r in lsh_knn(emb, dim=64, k=3, n_planes=6, n_tables=2,
                             seed=42, bucket_topk=True).collect()}
    slow = {(r["id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
            for r in lsh_knn(emb, dim=64, k=3, n_planes=6, n_tables=2,
                             seed=42, bucket_topk=False).collect()}
    assert len(fast) > 0 and fast == slow


def test_lsh_multi_probe_lanes_agree_and_raise_coverage(spark, sf_dir):
    """Multi-probe (n_probes>0): the asymmetric bucket kernel must equal
    the generalized query×resident join lane row-for-row, and probing
    must strictly enlarge the answered-id set / never worsen any
    vector's best cosine (candidates only grow)."""
    from trading_dashboard_spark.similarity.lsh import lsh_knn

    emb = load_table(spark, "embeddings", sf_dir)
    fast = {(r["id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
            for r in lsh_knn(emb, dim=64, k=3, n_planes=6, n_tables=2,
                             seed=42, n_probes=2, bucket_topk=True).collect()}
    slow = {(r["id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
            for r in lsh_knn(emb, dim=64, k=3, n_planes=6, n_tables=2,
                             seed=42, n_probes=2, bucket_topk=False).collect()}
    assert len(fast) > 0 and fast == slow

    base = {(r["id"], r["rnk"]): r["cosine"]
            for r in lsh_knn(emb, dim=64, k=3, n_planes=6, n_tables=2,
                             seed=42, n_probes=0).collect()}
    probed_best = {k[0]: v[1] for k, v in fast.items() if k[1] == 1}
    base_best = {k[0]: v for k, v in base.items() if k[1] == 1}
    assert set(base_best) <= set(probed_best)
    assert all(probed_best[i] >= base_best[i] for i in base_best)


def test_lsh_adaptive_grid_publishes_resolution_and_warns(spark, sf_dir):
    """ADVICE r7: an adaptive call must expose its resolved grid and
    emit a runtime warning when (and only when) it diverges from the
    static literals a SQL oracle would replay."""
    import warnings

    from trading_dashboard_spark.similarity import lsh

    emb = load_table(spark, "embeddings", sf_dir).limit(256)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        lsh.lsh_knn(emb, dim=64, k=3, n_planes=6, n_tables=2, seed=42,
                    n_probes=2, adaptive_planes=True)
        assert lsh.LAST_RESOLVED_GRID == {
            "n_planes": 6, "n_tables": 2, "n_probes": 2,
            "adaptive_engaged": False,
        }
        assert not [w for w in caught if "adaptive grid" in str(w.message)]

    big = emb.sparkSession.range(70_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.rand(seed=i) - F.lit(0.5)) for i in range(4)]).alias(
            "embedding"
        ),
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        lsh.lsh_knn(big, dim=4, k=1, n_planes=6, n_tables=2, seed=42,
                    n_probes=2, adaptive_planes=True)
        grid = lsh.LAST_RESOLVED_GRID
        assert grid["adaptive_engaged"] and grid["n_planes"] > 6
        assert [w for w in caught if "adaptive grid" in str(w.message)]


def test_pq_at_rest_coded_scan_prunes_columns(spark, sf_dir, tmp_path):
    """The serving layout: corpus encoded ONCE at ingest and written
    partitioned by IVF cell with the code column alongside. A probe's
    ADC scan must then (a) prune partitions on the cell literal and
    (b) read ONLY (id, codes) from parquet — never the float vectors —
    which is the whole point of the m-byte PQ payload."""
    from pyspark.sql import functions as F

    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.similarity.ivf import (
        assign_cells, probe_cells, static_centroids,
    )
    from trading_dashboard_spark.similarity.pq import (
        adc_score, adc_table, encode_pq_expr, static_codebooks,
    )
    from trading_dashboard_spark.similarity.ivf import _unit_rows

    emb = load_table(spark, "embeddings", sf_dir)
    cents = static_centroids(n_cells=8, dim=64, seed=7)
    books = static_codebooks(m=8, ksub=16, dsub=8, seed=11)
    coded = encode_pq_expr(assign_cells(emb, cents), books)
    path = str(tmp_path / "ivfpq")
    coded.write.mode("overwrite").partitionBy("cell").parquet(path)

    probe = _unit_rows(1, 64, seed=123)[0]
    cells = probe_cells(cents, probe, nprobe=2)
    table = adc_table(probe, books)
    at_rest = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    scan = at_rest.select(
        "vec_id", adc_score(F.col("pq_codes"), table).alias("adc")
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:80]
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "pq_codes" in rs and "embedding" not in rs  # column pruning
    assert "EvalPython" not in plan  # pure-JVM ADC over the codes
    # and the pruned scan really returns only probed-cell rows
    got = at_rest.select("cell").distinct().collect()
    assert {r["cell"] for r in got} <= set(cells)


def test_cosine_pair_scan_lane_equals_join_lane(spark, sf_dir):
    """The blocked chunked-BLAS pair scan must return EXACTLY the pair-join
    lane's rows — same pairs, same 6dp cosines — on the real embeddings
    bucketed by a production LSH grid (semantic_dedup_survivors' pair
    stage shape), including a chunk boundary (chunk=512 < corpus)."""
    from trading_dashboard_spark.similarity.knn import (
        _as_double, cosine_near_dup_pairs,
    )
    from trading_dashboard_spark.similarity.lsh import (
        random_hyperplane_buckets,
    )

    base = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    pert = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("v", 1) + F.lit(0.05)),
            F.expr("slice(v, 2, size(v) - 1)"),
        ).alias("v"),
    )  # the semantic_dedup twin corpus: every vector has a >=0.98 twin
    bucketed = random_hyperplane_buckets(
        base.unionByName(pert), dim=64, n_planes=2, seed=9, table=0,
        vec_col="v",
    )  # 4 buckets -> ~250-row blocks at sf0.01: many pairs per block
    kw = dict(threshold=0.98, id_col="vec_id", vec_col="v",
              block_col="bucket")
    scan = {(r["keep_id"], r["drop_id"], r["cosine"])
            for r in cosine_near_dup_pairs(bucketed, **kw).collect()}
    join = {(r["keep_id"], r["drop_id"], r["cosine"])
            for r in cosine_near_dup_pairs(bucketed, lane="join",
                                           **kw).collect()}
    assert scan == join
    assert len(scan) > 0  # non-vacuous: threshold low enough to emit


def test_lsh_knn_rejects_overflowing_probe_count(spark, sf_dir):
    """ADVICE r8: only n_planes distinct lowest-margin flips exist, so
    n_probes > n_planes must raise a clear ValueError at call time, not
    an opaque numpy reshape error inside the pandas UDF at job time.
    n_probes == n_planes (probe every plane) stays legal."""
    import pytest

    from trading_dashboard_spark.similarity.lsh import lsh_knn

    emb = load_table(spark, "embeddings", sf_dir).limit(64)
    with pytest.raises(ValueError, match="n_probes=4 exceeds the 3"):
        lsh_knn(emb, dim=64, k=1, n_planes=3, n_tables=2, n_probes=4)
    # boundary: flipping all planes is a valid (if exhaustive) probe set
    got = lsh_knn(
        emb, dim=64, k=1, n_planes=3, n_tables=2, n_probes=3
    ).collect()
    assert len(got) > 0
