"""Training-pipeline query tier — split determinism and sketch accuracy."""

from pyspark.sql import functions as F

from trading_dashboard_spark.io.readers import load_table
from trading_dashboard_spark.queries import QUERY_REGISTRY


def test_split_deterministic_and_disjoint(spark, sf_dir):
    out1 = {r.split: (r.n_docs, r.total_chars) for r in
            QUERY_REGISTRY["train_test_split_stats"].fn(spark, sf_dir).collect()}
    out2 = {r.split: (r.n_docs, r.total_chars) for r in
            QUERY_REGISTRY["train_test_split_stats"].fn(spark, sf_dir).collect()}
    assert out1 == out2
    n_total = load_table(spark, "documents", sf_dir).count()
    assert sum(v[0] for v in out1.values()) == n_total  # partition of corpus
    # ~80/10/10 with generous tolerance at tiny scale
    assert out1["train"][0] > out1["valid"][0]
    assert out1["train"][0] > out1["test"][0]


def test_sketches_track_exact_values(spark, sf_dir):
    """HLL++ distinct counts and GK median must land near the exact values
    computed by the oracle-checked queries (standard error ~2% for HLL at
    default rsd, generous bounds for tiny groups)."""
    docs = load_table(spark, "documents", sf_dir)
    exact = docs.groupBy("source").agg(
        F.countDistinct("text").alias("d"),
        F.expr("percentile(n_chars, 0.5)").alias("m"),
    )
    approx = QUERY_REGISTRY["corpus_sketch_profile"].fn(spark, sf_dir)
    j = {r.source: r for r in exact.collect()}
    for r in approx.collect():
        e = j[r.source]
        assert abs(r.approx_distinct_texts - e.d) <= max(3, 0.15 * e.d)
        assert abs(r.approx_median_chars - e.m) <= max(10, 0.25 * e.m)


def test_cms_overestimates_within_bound(spark, sf_dir):
    """CMS guarantees: est >= true for every key; with depth 4 / width 256
    the expected overshoot per key is ~2·n/width — assert a generous
    multiple of it."""
    ev = load_table(spark, "events", sf_dir)
    true = {r.user_id: r.cnt for r in
            ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    est = {r.user_id: r.est_count for r in
           QUERY_REGISTRY["cms_user_frequencies"].fn(spark, sf_dir).collect()}
    assert set(est) == set(true)
    n = sum(true.values())
    bound = max(4, 8 * n / 256)
    for uid, t in true.items():
        assert est[uid] >= t, f"CMS under-counted {uid}"
        assert est[uid] - t <= bound, f"CMS overshoot too large for {uid}"


def test_misra_gries_compaction_bound(spark):
    """Small-capacity regime: estimates undercount by at most
    n/(capacity+1), never overcount, and every item whose true frequency
    exceeds the bound survives compaction."""
    from trading_dashboard_spark.functions.sketches import heavy_hitters

    # skewed stream: item 0 dominates, long tail of singletons
    rows = [(0,)] * 400 + [(1,)] * 120 + [(2,)] * 60 + [(i,) for i in range(3, 103)]
    df = spark.createDataFrame(rows, "item long").repartition(4)
    n, cap = len(rows), 4
    got = {r.item: r.est for r in heavy_hitters(df, "item", k=10, capacity=cap).collect()}
    true = {0: 400, 1: 120, 2: 60}
    bound = n / (cap + 1)
    for item, t in true.items():
        if t > bound:
            assert item in got, f"heavy item {item} lost"
    for item, est in got.items():
        t = true.get(item, 1)
        assert est <= t, "MG must never overcount"
        assert t - est <= bound + 1e-9, "undercount exceeded n/(k+1)"


def test_heavy_hitters_exact_regime(spark):
    from trading_dashboard_spark.functions.sketches import heavy_hitters

    rows = [(i % 7,) for i in range(700)]
    df = spark.createDataFrame(rows, "item long").repartition(3)
    got = {r.item: r.est for r in heavy_hitters(df, "item", k=7, capacity=64).collect()}
    assert got == {i: 100 for i in range(7)}


def test_grouped_heavy_hitters_exact_and_bounded(spark, sf_dir):
    """Per-group Misra-Gries (r6 groundwork): in the exact regime
    (capacity > per-group distincts) the estimates equal groupBy
    counts; in the compaction regime every estimate undercounts by at
    most n_g/(capacity+1) and every item above that bound survives."""
    from pyspark.sql import functions as F

    from trading_dashboard_spark.functions.sketches import (
        grouped_heavy_hitters,
    )
    from trading_dashboard_spark.io.readers import load_table

    ev = load_table(spark, "events", sf_dir)
    # exact regime: event_type has ~5 distincts per user
    got = grouped_heavy_hitters(ev, "user_id", "event_type",
                                k=3, capacity=64)
    exact = (
        ev.groupBy("user_id", "event_type").count().collect()
    )
    truth = {}
    for r in exact:
        truth.setdefault(r["user_id"], {})[r["event_type"]] = r["count"]
    for r in got.collect():
        assert r["est"] == truth[r["user_id"]][r["event_type"]]
        top = sorted(truth[r["user_id"]].items(),
                     key=lambda kv: (-kv[1], kv[0]))
        assert r["event_type"] == top[r["rk"] - 1][0]

    # compaction regime: capacity 2 across 5 types per group
    small = grouped_heavy_hitters(ev, "user_id", "event_type",
                                  k=2, capacity=2)
    n_parts = ev.rdd.getNumPartitions()
    for r in small.collect():
        true_n = truth[r["user_id"]][r["event_type"]]
        n_g = sum(truth[r["user_id"]].values())
        assert r["est"] <= true_n
        # merged undercount: each partition loses <= its n_g share/(cap+1)
        assert true_n - r["est"] <= n_g / (2 + 1) + n_parts


def test_post_dedup_rebalance_shifts_weight_off_dup_heavy_source(spark, tmp_path):
    """r8 verdict #9b: a source whose volume is near-dup inflation loses
    mixture share after dedup; a clean source gains. Dup cluster keeps
    the longest member (cluster_survivor_selection policy), so the
    dup-heavy source retains exactly one survivor from its flood."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the band plays on")
    rows = []
    for i in range(6):  # near-identical flood, all in feedDup
        txt = base + (" encore" * (i == 5))  # one longest member -> survivor
        rows.append((100 + i, txt, "en", "feedDup", len(txt)))
    for i in range(4):  # distinct docs in feedClean
        txt = f"completely distinct document number {i} about topic_{i} " \
              f"with unique vocabulary item_{i} token_{i} thing_{i}"
        rows.append((200 + i, txt, "en", "feedClean", len(txt)))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(pa.Table.from_pandas(pdf),
                   str(tmp_path / "documents.parquet"))

    from trading_dashboard_spark.queries_training import (
        post_dedup_mixture_rebalance,
    )

    got = {r["source"]: r for r in
           post_dedup_mixture_rebalance(spark, str(tmp_path)).collect()}
    assert got["feedDup"]["n_raw"] == 6
    assert got["feedDup"]["n_dedup"] == 1          # flood -> one survivor
    assert got["feedClean"]["n_dedup"] == 4
    assert got["feedDup"]["weight_shift"] < 0      # loses share
    assert got["feedClean"]["weight_shift"] > 0    # gains share
    # weights are a distribution on both sides (6dp rounding tolerance)
    assert abs(sum(r["weight_raw"] for r in got.values()) - 1.0) < 1e-5
    assert abs(sum(r["weight_dedup"] for r in got.values()) - 1.0) < 1e-5


def _write_docs(tmp_path, rows):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(pa.Table.from_pandas(pdf),
                   str(tmp_path / "documents.parquet"))


def test_dsir_ranks_target_like_docs_above_pool_typical(spark, tmp_path):
    """DSIR sanity: documents written in the TARGET domain's vocabulary
    (lang='en' here) must score a strictly higher log importance weight
    than documents written in the pool-only vocabulary — that ordering
    is the entire point of importance resampling (target-like docs are
    upweighted when resampling the raw pool)."""
    rows = []
    tgt_text = "alpha beta gamma delta epsilon zeta eta theta"
    raw_text = "rock paper scissors lizard spock banana mango papaya"
    for i in range(10):  # target domain: en, vocab A
        rows.append((i, tgt_text, "en", "srcT", len(tgt_text)))
    for i in range(10, 30):  # pool-only domain: vocab B
        rows.append((i, raw_text, "xx", "srcR", len(raw_text)))
    # a fresh pool doc in target vocabulary, and one in pool vocabulary
    rows.append((100, tgt_text, "xx", "srcQ", len(tgt_text)))
    rows.append((101, raw_text, "xx", "srcQ", len(raw_text)))
    _write_docs(tmp_path, rows)

    from trading_dashboard_spark.queries_training import (
        dsir_importance_weights,
    )

    got = {r["doc_id"]: r for r in
           dsir_importance_weights(spark, str(tmp_path)).collect()}
    assert len(got) == 32
    assert got[100]["log_importance"] > got[101]["log_importance"]
    # target-vocab docs sit above every pool-vocab doc
    assert min(got[i]["log_importance"] for i in range(10)) > max(
        got[i]["log_importance"] for i in range(10, 30)
    )
    assert got[0]["n_tokens"] == 8


def test_nb_classifier_separates_disjoint_vocabularies(spark, tmp_path):
    """With two sources of fully disjoint vocabularies and dozens of
    training docs each, every held-out doc must be predicted to its own
    source — the confusion matrix is purely diagonal."""
    rows = []
    for i in range(80):
        if i % 2 == 0:
            t = f"apple orange pear plum cherry fig date apple_{i % 7}"
            rows.append((i, t, "en", "fruit", len(t)))
        else:
            t = f"bolt nut washer screw rivet flange gasket bolt_{i % 7}"
            rows.append((i, t, "en", "hardware", len(t)))
    _write_docs(tmp_path, rows)

    from trading_dashboard_spark.queries_training import (
        nb_source_classifier_eval,
    )

    out = nb_source_classifier_eval(spark, str(tmp_path)).collect()
    conf = {(r["source"], r["pred_source"]): r["n_docs"] for r in out}
    assert all(s == p for (s, p) in conf)  # no off-diagonal cell
    assert sum(conf.values()) > 0          # the eval split is non-empty


def test_dsir_lanes_agree(spark, sf_dir):
    """The Arrow bucket-count lane (registered) and the JVM explode lane
    (the form the SQL oracle replays) must produce identical rows —
    same discipline as the simhash lane-equality pin."""
    from trading_dashboard_spark.queries_training import (
        dsir_importance_weights,
    )

    a = {r["doc_id"]: (r["n_tokens"], r["log_importance"]) for r in
         dsir_importance_weights(spark, sf_dir, lane="arrow").collect()}
    j = {r["doc_id"]: (r["n_tokens"], r["log_importance"]) for r in
         dsir_importance_weights(spark, sf_dir, lane="jvm").collect()}
    assert a == j and len(a) > 0


def test_dsir_gumbel_key_replays_outside_spark(spark, sf_dir):
    """The resample key must be exactly round(lw + Gumbel(md5-uniform),
    6) — recomputed here with hashlib/math, no Spark — pinning the
    deterministic-noise contract (any engine or backfill replays the
    same draw)."""
    import hashlib
    import math

    from trading_dashboard_spark.queries_training import (
        dsir_gumbel_resample, dsir_importance_weights,
    )

    lw = {r["doc_id"]: r["log_importance"] for r in
          dsir_importance_weights(spark, sf_dir).collect()}
    out = dsir_gumbel_resample(spark, sf_dir).collect()
    assert len(out) == 50
    for r in out:
        u = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8],
                16) / 4294967296.0
        expect = round(lw[r["doc_id"]] - math.log(-math.log(max(u, 1e-12))),
                       6)
        assert abs(r["gkey"] - expect) < 1e-9


def test_pipeline_scores_on_survivors_not_raw_pool(spark, tmp_path):
    """Fit-after-dedup matters for SELECTION, not just the mixture law:
    a near-identical flood inflates its own buckets in the raw-pool
    histograms; after dedup the flood contributes one survivor, so the
    selected set comes from the survivor relation and removed flood
    members can never be drawn (they have no weight row at all)."""
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the band plays on")
    rows = []
    for i in range(6):  # flood: near-identical, one longest survivor
        txt = base + (" encore" * (i == 5))
        rows.append((100 + i, txt, "en", "feedDup", len(txt)))
    for i in range(4):
        txt = (f"completely distinct document number {i} about topic_{i} "
               f"with unique vocabulary item_{i} token_{i} thing_{i}")
        rows.append((200 + i, txt, "en", "feedClean", len(txt)))
    _write_docs(tmp_path, rows)

    from trading_dashboard_spark.queries_training import (
        dedup_dsir_curation_pipeline,
    )

    got = dedup_dsir_curation_pipeline(spark, str(tmp_path)).collect()
    picked = {r["doc_id"] for r in got}
    # exactly 5 candidates survive dedup (1 flood survivor + 4 clean),
    # so the top-50 draw returns all of them and nothing else
    assert len(got) == 5
    assert picked & set(range(100, 105)) == set()   # removed flood members
    assert 105 in picked                            # the longest survivor
    assert picked >= {200, 201, 202, 203}


def test_budgeted_manifest_binds_on_curated_survivors(spark, tmp_path):
    """The manifest ranks only PIPELINE SURVIVORS and the 8k budget must
    bind: with three tercile survivors of ~5.5k/~0.1k tokens the ranked
    prefix can never admit all of them, and admitted token volume stays
    within budget."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def text_of(prefix, n_words):
        ws = [f"{prefix}word{i:04d}" for i in range(n_words)]
        return " ".join(ws[:10] + ["the"] + ws[10:20] + ["of"] + ws[20:])

    rows = [
        (1, text_of("du", 60), "en", "dup", 300),   # 2-char prefix:
        (2, text_of("du", 60), "en", "dup", 300),   # 10-char words keep
        (3, text_of("du", 60), "en", "dup", 300),   # mean word len < 10
        (4, "too short text", "en", "bad", 20),
        (5, text_of("ga", 2000), "en", "good", 300),
        (6, text_of("gb", 2000), "en", "good", 300),
        (7, text_of("gc", 2000), "en", "good", 300),
        (8, text_of("gd", 2000), "en", "good", 300),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(pa.Table.from_pandas(pdf),
                   str(tmp_path / "documents.parquet"))

    from trading_dashboard_spark.queries_training import (
        budgeted_curation_manifest,
    )

    got = budgeted_curation_manifest(spark, str(tmp_path)).collect()
    n_docs = sum(r["n_docs"] for r in got)
    n_adm = sum(r["n_admitted"] for r in got)
    toks = sum(r["tokens_admitted"] for r in got)
    assert n_docs == 3            # tercile keeps floor(2*5/3) survivors
    assert 1 <= n_adm < n_docs    # the budget BINDS
    assert toks <= 8000
    assert all(r["source"] != "bad" for r in got)  # gate death upstream
