"""Randomized cross-engine contract batteries — seeded, deterministic.

Each test generates a few hundred adversarial cases (ties, negatives,
empty strings, equal timestamps) and asserts the engine lane and its
oracle/reference implementation agree bit-for-bit. They guard the
properties the per-query oracle checks rely on: if any of these drift,
dozens of registered queries would start hash-failing at once.
"""

import random

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_pround_matches_duckdb_portable_round_battery(spark):
    """pround (Spark) == the floor-form SQL rewrite (DuckDB) across
    digits -3..6 on values engineered to sit ON rounding boundaries —
    the exact ties both engines' native round() disagree about."""
    from trading_dashboard_spark.functions import portable_round_sql, pround

    rng = random.Random(42)
    vals = [0.0, -0.0, 1.5, -1.5, 2.5, 0.125, -0.125, 1e12 + 0.5]
    vals += [round(rng.uniform(-1e6, 1e6), rng.randint(0, 6)) for _ in range(200)]
    vals += [rng.randint(-10**9, 10**9) / 2**k for k in range(1, 10) for _ in [0]]
    # the long-overflow regime: Spark's floor() clamps at 2^63 while
    # DuckDB's stays a double — the magnitude guard must keep the lanes
    # bit-equal across the boundary (adversarial events battery find)
    vals += [7.050093e22, -7.050093e22, 9.3e18, -9.3e18, 2.0**53 + 1,
             2.0**62, 1e300, -1e300, 4.5e14, 9.2e14]
    digits = [-3, -1, 0, 1, 2, 4, 6]

    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    spark_out = df.select(
        *[pround(F.col("x"), n).alias(f"r{i}") for i, n in enumerate(digits)]
    ).collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS x", [vals])
    exprs = ", ".join(
        portable_round_sql(f"round(x, {n})") + f" AS r{i}"
        for i, n in enumerate(digits)
    )
    duck_out = con.execute(f"SELECT {exprs} FROM t").fetchall()
    for srow, drow, v in zip(spark_out, duck_out, vals):
        for i in range(len(digits)):
            s, d = srow[i], drow[i]
            assert (s == d) or (s != s and d != d), (v, digits[i], s, d)


def test_vader_matches_oracle_random_sentence_battery():
    """Python vader_score == generated DuckDB oracle on 300 random
    sentences drawn from lexicon words, negators, modifiers, caps
    variants, 'but', and punctuation runs — every rule family hit at
    random interleavings."""
    from trading_dashboard_spark.text.sentiment import vader_oracle_sql, vader_score
    from trading_dashboard_spark.text.vader_lexicon import (
        DAMPENERS, INTENSIFIERS, LEXICON, NEGATORS,
    )

    rng = random.Random(7)
    lex = sorted(LEXICON)
    neg = sorted(NEGATORS)
    mods = sorted(INTENSIFIERS | DAMPENERS)
    fillers = ["market", "report", "quarter", "the", "and", "of"]

    def word():
        r = rng.random()
        if r < 0.4:
            w = rng.choice(lex)
        elif r < 0.55:
            w = rng.choice(neg)
        elif r < 0.7:
            w = rng.choice(mods)
        elif r < 0.8:
            w = "but"
        else:
            w = rng.choice(fillers)
        c = rng.random()
        if c < 0.15:
            w = w.upper()
        elif c < 0.2:
            w = w.capitalize()
        return w

    def sentence():
        s = " ".join(word() for _ in range(rng.randint(0, 12)))
        punct = rng.random()
        if punct < 0.25:
            s += "!" * rng.randint(1, 6)
        elif punct < 0.5:
            s += "?" * rng.randint(1, 5)
        return s

    cases = [sentence() for _ in range(300)]
    df = pd.DataFrame({"doc_id": range(len(cases)), "text": cases})
    con = duckdb.connect()
    con.register("documents", df)
    got = dict(con.execute(vader_oracle_sql(digits=6)).fetchall())
    for i, t in enumerate(cases):
        assert abs(round(vader_score(t), 6) - got[i]) < 1e-9, repr(t)


def test_asof_join_matches_pandas_random_battery(spark):
    """as_of_join == pandas merge_asof on a random multi-key series with
    planted equal timestamps and sparse keys, both directions, with and
    without tolerance (pandas is the reference semantics for everything
    except same-timestamp source ties, which pandas leaves undefined and
    the operator pins via the tiebreak — ties excluded here)."""
    from trading_dashboard_spark.operators.windows import as_of_join

    rng = random.Random(99)
    # unique timestamps per key on the right side -> pandas is definitive
    def series(n, keys):
        rows = []
        seen = set()
        for _ in range(n):
            k = rng.choice(keys)
            t = rng.randint(0, 5000)
            while (k, t) in seen:
                t = rng.randint(0, 5000)
            seen.add((k, t))
            rows.append((k, t, round(rng.uniform(-100, 100), 3)))
        return rows

    left = series(150, [1, 2, 3, 4])
    right = series(200, [1, 2, 3, 5])
    # plant exact left==right timestamp collisions (at-or-before/after)
    for k, t, _v in right[:20]:
        left.append((k, t, 0.0))

    ldf = spark.createDataFrame(left, "k long, tsec long, lv double").withColumn(
        "t", F.timestamp_seconds("tsec")
    )
    rdf = spark.createDataFrame(right, "k long, tsec long, v double").withColumn(
        "t", F.timestamp_seconds("tsec")
    )
    lp = ldf.select("k", "t", "lv").toPandas().sort_values("t")
    rp = rdf.select("k", "t", "v").toPandas().sort_values("t")

    for direction in ("backward", "forward"):
        for tol in (None, 300.0):
            got = {
                (r["k"], r["t"]): r["asof_v"]
                for r in as_of_join(
                    ldf.select("k", "t", "lv"), rdf.select("k", "t", "v"),
                    "k", "k", "t", "t", ["v"],
                    direction=direction, tolerance_sec=tol,
                ).collect()
            }
            want_pdf = pd.merge_asof(
                lp, rp, on="t", by="k", direction=direction,
                tolerance=None if tol is None else pd.Timedelta(seconds=tol),
            )
            for _, row in want_pdf.iterrows():
                want = None if pd.isna(row["v"]) else row["v"]
                assert got[(row["k"], row["t"])] == want, (
                    direction, tol, row["k"], row["t"])


def test_floored_balance_reflection_identity_property():
    """Property (hypothesis): the reflection identity
    b_t = S_t − min(0, min_{k≤t} S_k) equals the clamped recurrence
    b_t = max(0, b_{t−1} + δ_t) for arbitrary real delta sequences —
    the algebra `floored_running_balance` relies on to stay a pure
    window program instead of a sequential lane."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1,
            max_size=60,
        )
    )
    def check(deltas):
        b = 0.0
        s = 0.0
        run_min = 0.0
        for d in deltas:
            b = max(0.0, b + d)
            s += d
            run_min = min(run_min, s)
            via_window = s - min(0.0, run_min)
            assert abs(b - via_window) < 1e-6 * max(1.0, abs(b))

    check()


def test_welford_equals_two_pass_property():
    """Property (hypothesis): the Welford fold used by the streaming
    anomaly state produces the same mean and sample variance as the
    two-pass definition, for arbitrary sequences — the state's
    correctness independent of Spark plumbing."""
    import math

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-1e4, max_value=1e4,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=2,
            max_size=80,
        )
    )
    def check(xs):
        n, mean, m2 = 0, 0.0, 0.0
        for x in xs:
            n += 1
            delta = x - mean
            mean += delta / n
            m2 += delta * (x - mean)
        mu = sum(xs) / len(xs)
        var = sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)
        assert abs(mean - mu) < 1e-7 * max(1.0, abs(mu))
        assert abs(m2 / (n - 1) - var) <= 1e-6 * max(1.0, var)

    check()


def test_lsh_bucket_topk_random_battery(spark):
    """The bucket-local top-k lane == the pair-join lane on random
    corpora engineered for ties: duplicated vectors (identical cosines
    force the id tiebreak), multiple k values, and bucket sizes around
    the chunk boundary. Guards the local-topk-union exactness argument
    under the shared (cosine desc, neighbor_id) total order."""
    from trading_dashboard_spark.similarity.lsh import lsh_knn

    rng = np.random.RandomState(23)
    for trial, (n, dim, k) in enumerate([(60, 8, 1), (120, 8, 3), (90, 8, 5)]):
        base = rng.normal(size=(n, dim))
        # plant exact duplicates: identical cosine to everything -> the
        # neighbor_id tiebreak decides, on both lanes
        base[1] = base[0]
        base[n // 2] = base[2]
        rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        fast = {(r["id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
                for r in lsh_knn(df, dim=dim, k=k, n_planes=3, n_tables=2,
                                 seed=trial, bucket_topk=True).collect()}
        slow = {(r["id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
                for r in lsh_knn(df, dim=dim, k=k, n_planes=3, n_tables=2,
                                 seed=trial, bucket_topk=False).collect()}
        assert fast == slow and len(fast) > 0, (trial, n, k)


def test_pq_encode_lanes_random_battery(spark):
    """Arrow-vectorized PQ encode == expression-form encode on random
    corpora including exact duplicate vectors and a vector equidistant
    to two centroids at the rounding grid (the smaller-code tie)."""
    from trading_dashboard_spark.similarity.pq import (
        encode_pq_expr, static_codebooks,
    )

    rng = np.random.RandomState(31)
    books = static_codebooks(m=4, ksub=8, dsub=4, seed=5)
    n = 80
    base = rng.normal(size=(n, 16))
    base[3] = base[0]
    # a vector exactly ON a centroid (distance 0 to it): argmin stable
    flat = [c for book in books for c in book]
    base[7] = np.array(flat[0] + flat[1] + flat[2] + flat[3])
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    fast = {r["vec_id"]: list(r["pq_codes"])
            for r in encode_pq_expr(df, books, vectorized=True).collect()}
    slow = {r["vec_id"]: list(r["pq_codes"])
            for r in encode_pq_expr(df, books, vectorized=False).collect()}
    assert fast == slow and len(fast) == n


def test_simhash_arrow_lane_random_battery(spark):
    """Arrow fingerprint lane == HOF expression lane on 200 adversarial
    texts: random token soups, duplicate-heavy docs, mixed case, runs of
    every ASCII whitespace the Java \\s class covers, leading/trailing
    separators, null/empty — the exact trim/split/lower semantics the
    SQL oracle replays. A drift here would hash-fail both
    simhash_hamming_pairs and simhash_dedup_clusters at once."""
    from trading_dashboard_spark.text.dedup import _simhash_parts_arrow, simhash64

    rng = random.Random(1234)
    words = ["alpha", "Beta", "GAMMA", "delta'", "x1", "Y2", "zzz", "a"]
    ws_chars = [" ", "\t", "\n", "\x0b", "\f", "\r"]
    rows = [(0, None), (1, ""), (2, "   "), (3, "".join(ws_chars))]
    for i in range(3, 200):
        n = rng.randint(1, 12)
        parts = []
        for _ in range(n):
            w = rng.choice(words)
            if rng.random() < 0.3:
                w = w * rng.randint(1, 2)
            parts.append(w)
            parts.append("".join(rng.choice(ws_chars) for _ in range(rng.randint(1, 3))))
        txt = "".join(parts)
        if rng.random() < 0.3:
            txt = rng.choice(ws_chars) + txt
        if rng.random() < 0.5:
            txt = txt.rstrip() if rng.random() < 0.5 else txt
        rows.append((i + 10, txt))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    p = _simhash_parts_arrow()(F.col("text"))
    arrow = {
        r["doc_id"]: (r["lo"], r["hi"])
        for r in df.select("doc_id", p["lo"].alias("lo"), p["hi"].alias("hi")).collect()
    }
    hof = {
        r["doc_id"]: (r["lo"], r["hi"])
        for r in df.select(
            "doc_id",
            simhash64(F.col("text")).alias("lo"),
            simhash64(F.col("text"), md5_offset=9).alias("hi"),
        ).collect()
    }
    assert arrow == hof


def test_connected_components_equals_union_find_random_battery(spark):
    """The min-label-propagation fixpoint == a reference union-find on
    random graphs spanning the shapes dedup emits: singleton pairs,
    chains (worst-case diameter), stars, dense cliques, and sparse
    random edges. Guards every cluster-family query at once (the four
    oracle checks only see the corpus's actual graph shapes)."""
    from trading_dashboard_spark.text.clusters import connected_components

    rng = random.Random(99)
    edges = []
    # chains: the diameter stressor
    base = 0
    for length in (2, 5, 9):
        edges += [(base + i, base + i + 1) for i in range(length)]
        base += length + 1
    # star
    edges += [(base, base + i) for i in range(1, 6)]
    base += 10
    # clique
    clique = list(range(base, base + 5))
    edges += [(a, b) for a in clique for b in clique if a < b]
    base += 10
    # random sparse edges over a fresh id range
    ids = list(range(base, base + 40))
    edges += [tuple(sorted(rng.sample(ids, 2))) for _ in range(25)]

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {}
    for a, b in edges:
        for x in (a, b):
            expected[x] = find(x)
    # normalize: component label = min member id
    comp_min: dict = {}
    for x, r in expected.items():
        comp_min.setdefault(r, x)
        comp_min[r] = min(comp_min[r], x)
    expected = {x: comp_min[r] for x, r in expected.items()}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iter=30).collect()
    }
    assert got == expected
    # r11: the size-gated driver union-find fast path and the
    # distributed label-propagation loop must be label-identical —
    # force the loop (gate 0) and compare against the default path
    # (which takes the driver lane at this size)
    looped = {
        r["id"]: r["component"]
        for r in connected_components(
            df, max_iter=30, driver_max_edge_rows=0
        ).collect()
    }
    assert looped == got == expected


def test_cluster_delta_driver_lane_matches_distributed(spark, sf_dir):
    """dedup_cluster_delta's batch-sized driver fast path (r11: one
    bounded collect + union_find_min replaces two CC passes, two
    enrichment joins and the final aggregate when the verified-edge
    count fits CC_DRIVER_MAX_EDGE_ROWS) must be row-identical to the
    distributed reconciliation it shortcuts — force the distributed
    lane with gate 0 and compare on the real corpus."""
    from trading_dashboard_spark.queries import QUERY_REGISTRY

    fn = QUERY_REGISTRY["dedup_cluster_delta"].fn
    fast = sorted(map(tuple, fn(spark, sf_dir).collect()))
    dist = sorted(
        map(tuple, fn(spark, sf_dir, _driver_max_edge_rows=0).collect())
    )
    assert fast == dist
    assert fast  # the sf corpora have near-dup mass; empty = broken gate


def test_oracle_tokenizer_class_matches_java_ws_battery(spark):
    """The shared _TOKS oracle fragment (explicit [ \\t\\n\\x0b\\f\\r]+
    class — ADVICE r8) == text/analysis.tokenize + lower on 200 texts
    saturated with every Java \\s character, INCLUDING vertical tab,
    which RE2's '\\s' excludes: a plain '\\s+' oracle would split
    '\\x0b'-joined words differently from every engine lane. Also pins
    the empty-doc guard (DuckDB splits '' to [''], tokenize() to [])."""
    from trading_dashboard_spark.queries_text import _TOKS
    from trading_dashboard_spark.text.analysis import tokenize

    rng = random.Random(99)
    words = ["Alpha", "beta", "GAMMA", "d'lta", "x1", "Y2"]
    ws_chars = [" ", "\t", "\n", "\x0b", "\f", "\r"]
    rows = [(0, None), (1, ""), (2, "   "), (3, "a\x0bb"), (4, "\x0b")]
    for i in range(5, 200):
        parts = []
        for _ in range(rng.randint(1, 10)):
            parts.append(rng.choice(words))
            parts.append(
                "".join(rng.choice(ws_chars) for _ in range(rng.randint(1, 3)))
            )
        txt = "".join(parts)
        if rng.random() < 0.5:
            txt = rng.choice(ws_chars) + txt
        rows.append((i, txt))

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    eng = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id",
            F.transform(tokenize(F.col("text")), F.lower).alias("toks"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck = {
        d: t for d, t in con.execute(
            f"SELECT doc_id, {_TOKS} AS toks FROM documents"
        ).fetchall()
    }
    assert eng == duck


def test_dsir_arrow_lane_random_battery(spark):
    """DSIR's Arrow bucket-count lane == the JVM explode lane on 150
    adversarial texts (whitespace soups covering the Java \\s class,
    duplicate-heavy docs, mixed case, null/empty) — the same
    trim/split/lower contract the simhash battery pins. A drift here
    would hash-fail dsir_importance_weights, dsir_gumbel_resample AND
    streaming_dsir_admission at once."""
    from trading_dashboard_spark.queries_training import (
        _DSIR_BUCKETS, _dsir_bucket_counts_arrow,
    )
    from trading_dashboard_spark.text.analysis import tokenize

    rng = random.Random(4321)
    words = ["alpha", "Beta", "GAMMA", "delta'", "x1", "Y2", "zzz", "a"]
    ws_chars = [" ", "\t", "\n", "\x0b", "\f", "\r"]
    rows = [(0, None), (1, ""), (2, "   "), (3, "".join(ws_chars))]
    for i in range(3, 150):
        n = rng.randint(1, 12)
        parts = []
        for _ in range(n):
            parts.append(rng.choice(words) * rng.randint(1, 2))
            parts.append("".join(
                rng.choice(ws_chars) for _ in range(rng.randint(1, 3))
            ))
        rows.append((i + 10, "".join(parts)))
    df = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id",
        F.lit("s").alias("source"),
        F.lit("en").alias("lang"),
        "text",
    )
    arrow = {
        (r["doc_id"], r["b"]): r["n"]
        for r in _dsir_bucket_counts_arrow(df).collect()
    }
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("long")
        % _DSIR_BUCKETS
    )
    jvm = {
        (r["doc_id"], r["b"]): r["n"]
        for r in df.select(
            "doc_id", F.explode(tokenize(F.lower(F.col("text")))).alias("w")
        )
        .select("doc_id", bucket.alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert arrow == jvm


def test_winnowing_density_matches_theory(spark):
    """Winnowing's published sampling rate: for random (tie-free) hash
    sequences the expected selected fraction is 2/(w+1) of positions
    (SIGMOD'03 §5). On 60 random 200-token docs the empirical density
    must straddle 0.4 (w=4) well away from 1.0 — the storage claim the
    decontamination audit's cost model rests on."""
    from trading_dashboard_spark.queries_text import _winnowed_sel

    rng = random.Random(7)
    rows = []
    for i in range(60):
        toks = [f"t{rng.randrange(10**9)}" for _ in range(200)]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sel = _winnowed_sel(df).groupBy("doc_id").count().collect()
    n_grams = 200 - 4 + 1
    densities = [r["count"] / n_grams for r in sel]
    avg = sum(densities) / len(densities)
    assert 0.3 < avg < 0.5          # theory: 2/(w+1) = 0.4
    assert all(d < 0.7 for d in densities)


def test_r9_curation_lanes_adversarial_corpus_battery(spark, tmp_path):
    """Full-query Spark↔DuckDB equality for the r9 curation lanes on a
    whitespace-adversarial corpus: empty / whitespace-only docs, \\x0B
    (in Java's \\s but not RE2's), tab/formfeed/CR runs, single-token
    and exactly-8-token docs, exact duplicates, repeated-token docs —
    the fixture classes that have historically split the engines'
    tokenizers. Guards the shared _TOKS/_removal/_gopher/_ccnet
    fragments end to end, not per-helper."""
    import random

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(909)
    words = [f"w{i:02d}" for i in range(30)] + ["the", "of", "and", "to"]
    seps = [" ", "  ", "\t", "\x0b", "\f", "\r", " \t "]

    def doc(n):
        return rng.choice(seps).join(
            rng.choice(words) for _ in range(n)
        )

    rows = []
    for i in range(36):
        n = rng.choice([0, 1, 2, 7, 8, 9, 20, 60, 80])
        t = {0: "", 1: "   ", 2: "\x0b\x0b"}.get(n) if n <= 2 else None
        if t is None:
            t = doc(n)
        rows.append(
            (i, t, rng.choice(["en", "fr"]), f"s{i % 3}", len(t))
        )
    rows.append((36, rows[20][1], "en", "s0", len(rows[20][1])))  # dup
    rows.append((37, "tok " * 50, "en", "s1", 200))  # repeated token
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(pa.Table.from_pandas(pdf),
                   str(tmp_path / "documents.parquet"))

    import duckdb

    from trading_dashboard_spark.queries import QUERY_REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )

    for name in (
        "ngram_novelty_by_source",
        "gopher_quality_rules",
        "ccnet_perplexity_buckets",
        "dedup_effect_on_heldout_lm",
        "published_curation_pipeline",
        "budgeted_curation_manifest",
        # the two the 84-query discovery sweep caught diverging on this
        # corpus (zero-shingle docs in the candidate/pair relations) —
        # pinned here so the no-evidence rule can't regress
        "blocked_jaccard_within_source",
        "minhash_banding_sweep",
    ):
        ent = QUERY_REGISTRY[name]
        got = ent.fn(spark, str(tmp_path)).toPandas()
        exp = con.execute(ent.oracle).df()
        got = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns), ignore_index=True
        )
        exp = exp[sorted(exp.columns)].sort_values(
            by=sorted(exp.columns), ignore_index=True
        )
        assert list(got.columns) == list(exp.columns), name
        assert len(got) == len(exp), (name, len(got), len(exp))
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype.kind == "f" or e.dtype.kind == "f":
                ok = (
                    (g.isna() & e.isna())
                    | (g.astype(float) == e.astype(float))
                )
            else:
                ok = (g.isna() & e.isna()) | (
                    g.astype(object) == e.astype(object)
                )
            assert ok.all(), (name, c, got[~ok], exp[~ok])


def test_adversarial_embeddings_battery(spark, tmp_path):
    """Full-query Spark↔DuckDB equality for the similarity lanes on a
    degenerate-vector corpus: zero-norm vectors (cosine 0/0), 1e-30
    subnormal-adjacent norms, one-hot axes, exact duplicates. The first
    run of this probe found three divergences: the LSH lane scored
    zero-norm pairs 0.0 (its zero→unit-vector normalization) while the
    oracle's NULL cosine sorted FIRST under DuckDB's DESC null order;
    and the int8/sq8 oracles built per-element-NULL dequantized lists
    that crash DuckDB's list_dot_product. Oracles now carry the
    zero-cosine convention / whole-list-NULL guards / NULLS LAST."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(1234)
    vecs, labels = [], []
    for i in range(40):
        kind = i % 8
        if kind == 0:
            v = np.zeros(64, dtype=np.float32)
        elif kind == 1:
            v = np.full(64, 1e-30, dtype=np.float32)
        elif kind == 2:
            v = np.eye(64, dtype=np.float32)[i % 64]
        elif kind == 3 and i > 8:
            v = vecs[i - 8].copy()
        else:
            v = rng.randn(64).astype(np.float32)
        vecs.append(v)
        labels.append(i % 5)
    pdf = pd.DataFrame(
        {"vec_id": range(40), "embedding": [v.tolist() for v in vecs],
         "label": labels}
    )
    t = pa.Table.from_pandas(pdf, schema=pa.schema([
        pa.field("vec_id", pa.int64()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("label", pa.int32()),
    ]))
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    import duckdb

    from trading_dashboard_spark.queries import QUERY_REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet'"
    )
    for name in (
        "lsh_ann_top3",
        "embedding_int8_quantization",
        "sq8_rerank_top5",
        "knn_per_vector_top3",
        "label_centroids",
    ):
        ent = QUERY_REGISTRY[name]
        got = ent.fn(spark, str(tmp_path)).toPandas()
        exp = con.execute(ent.oracle).df()
        got = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns), ignore_index=True
        )
        exp = exp[sorted(exp.columns)].sort_values(
            by=sorted(exp.columns), ignore_index=True
        )
        assert got.shape == exp.shape, (name, got.shape, exp.shape)
        for c in got.columns:
            g, e = got[c], exp[c]
            ok = (g.isna() & e.isna()) | (g == e)
            assert ok.all(), (name, c)


def test_adversarial_relational_battery(spark, tmp_path):
    """Full-query Spark↔DuckDB equality for the relational/window
    families on the r10 adversarial corpus (tools/adversarial_relational
    — duplicate timestamps, all-NULL value users, single-row groups,
    empty groups, referential breaks, rounding-boundary decimals,
    negative JSON fields, epoch-adjacent / far-future dates, sort-key
    ties). The discovery sweep over all 174 qualifying queries found 25
    divergences + 2 crashes on first run:

    - every `max_by(value, ts)` lane (15 queries) was tie-UNDETERMINED
      on duplicate timestamps AND null-divergent (DuckDB max_by skips
      NULL args, Spark's doesn't) → the canonical close is now the last
      NON-NULL value by the unique (ts, event_id) key on both lanes;
    - rolling_median_value crashed (element_at index 0) on an all-NULL
      window; ml_next_day_prediction crashed MLlib's summarizer on an
      empty train split — both now degrade to NULL like their oracles;
    - DuckDB integer `//` truncates toward zero where the engine floors
      (negative JSON k landed in different decades);
    - percent_rank/cume_dist shifted by one on a NULL total (Spark ASC
      orders NULLS FIRST, DuckDB defaults LAST) — oracle pins FIRST.

    This test pins the finds via one representative per fix family;
    the tool sweeps everything."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    from adversarial_relational import (
        RELATIONAL_TABLES,
        build_adversarial_relational,
    )

    from trading_dashboard_spark.queries import QUERY_REGISTRY

    out = str(tmp_path / "adv")
    build_adversarial_relational(out)
    con = duckdb.connect()
    for t in RELATIONAL_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet'")

    for name in (
        # the daily-close (ts, event_id)-key + non-NULL contract
        "daily_pct_change", "ema_indicator", "scd2_price_history",
        # inline OHLC lanes (hourly + candlestick pattern)
        "hourly_ohlc_candles", "bullish_engulfing_days",
        # crash guards
        "rolling_median_value", "ml_next_day_prediction",
        # floor-vs-truncate on negative JSON fields
        "props_json_value_buckets", "variant_props_stats",
        # NULL-total rank ordering
        "user_value_distribution_ranks",
        # representative untouched lanes (regression canaries)
        "top_gainers", "latest_event_per_user", "priority_buckets",
    ):
        ent = QUERY_REGISTRY[name]
        got = ent.fn(spark, out).toPandas()
        exp = con.execute(ent.oracle).df()
        got = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns), ignore_index=True
        )
        exp = exp[sorted(exp.columns)].sort_values(
            by=sorted(exp.columns), ignore_index=True
        )
        assert list(got.columns) == list(exp.columns), name
        assert len(got) == len(exp), (name, len(got), len(exp))
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype.kind == "f" or e.dtype.kind == "f":
                ok = (
                    (g.isna() & e.isna())
                    | (g.astype(float) == e.astype(float))
                )
            else:
                ok = (g.isna() & e.isna()) | (
                    g.astype(object) == e.astype(object)
                )
            assert ok.all(), (name, c, got[~ok], exp[~ok])


def test_adversarial_media_codec_battery():
    """Fourth adversarial battery (r10 verdict #4b): the full codec
    guard sweep — degenerate geometry roundtrips (1×1 … 64×1, black/
    white/gray/gradient, grayscale+RGB, 1..64-sample WAV), truncation
    at EVERY byte boundary, and seeded single-byte corruption — must
    produce ZERO findings: PNG roundtrips bit-exact and verifies chunk
    CRCs/framing/IEND, WAV validates declared sizes, JPEG requires EOI
    and raises only the named ValueError/NotImplementedError contract.
    The discovery sweep found unguarded zlib/struct/IndexError/KeyError/
    OverflowError crash classes, silent prefix decodes in all three
    formats, and missing PNG CRC verification — all fixed in
    multimodal/codecs.py; this pins them."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    from adversarial_media import sweep

    checks, findings = sweep(stride=1)
    assert checks > 150, checks  # the grid actually ran
    assert findings == [], findings


def test_adversarial_curation_scenarios_battery(spark, tmp_path):
    """Fourth battery, curation half (r10 verdict #4a): representative
    queries from the training/curation compositions on the degenerate
    scenario corpora (tools/adversarial_curation — single source, 100%
    duplication, identical-score tie storms, empty split sides, 3-doc
    corpus, single language), Spark vs DuckDB per query. The full
    discovery sweep runs every qualifying documents-only query over
    every scenario; this pins one composition per family × the
    scenarios that stress it."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    from adversarial_curation import build_scenarios

    from trading_dashboard_spark.queries import QUERY_REGISTRY

    dirs = build_scenarios(str(tmp_path / "adv"))
    picks = {
        # budget >> corpus, samplers over-ask, quartiles on <4 rows
        "tiny": ["budgeted_curation_manifest", "token_budget_selection",
                 "stratified_sample_by_lang", "doc_length_quartiles_by_lang"],
        # 100% duplication: removal closure, dedup-aware mixtures
        "all_dup": ["post_dedup_mixture_rebalance", "curation_funnel",
                    "exact_substring_removal"],
        # identical scores: tercile/ntile tie storms
        "uniform_score": ["ccnet_perplexity_buckets",
                          "token_budget_selection"],
        # empty split sides: decontamination and split stats
        "empty_eval": ["winnowing_decontamination",
                       "incremental_eval_decontamination",
                       "train_test_split_stats"],
        "empty_train": ["winnowing_decontamination",
                        "cross_split_contamination"],
        # one-stratum degeneracies
        "single_source": ["source_mixture_plan", "nb_source_classifier_eval"],
        "single_lang": ["stratified_sample_by_lang",
                        "doc_length_quartiles_by_lang"],
    }
    for scen, names in picks.items():
        d = dirs[scen]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        for name in names:
            ent = QUERY_REGISTRY[name]
            got = ent.fn(spark, d).toPandas()
            exp = con.execute(ent.oracle).df()
            got = got[sorted(got.columns)].sort_values(
                by=sorted(got.columns), ignore_index=True
            )
            exp = exp[sorted(exp.columns)].sort_values(
                by=sorted(exp.columns), ignore_index=True
            )
            tag = f"{scen}:{name}"
            assert list(got.columns) == list(exp.columns), tag
            assert len(got) == len(exp), (tag, len(got), len(exp))
            for c in got.columns:
                g, e = got[c], exp[c]
                if g.dtype.kind == "f" or e.dtype.kind == "f":
                    ok = (
                        (g.isna() & e.isna())
                        | (g.astype(float) == e.astype(float))
                    )
                else:
                    ok = (g.isna() & e.isna()) | (
                        g.astype(object) == e.astype(object)
                    )
                assert ok.all(), (tag, c, got[~ok], exp[~ok])
        con.close()


def test_adversarial_similarity_scenarios_battery(spark, tmp_path):
    """Fifth battery (r11): representative similarity lanes on the
    degenerate-vector scenario corpora (tools/adversarial_similarity —
    zero probe vector, 100% duplicate vectors, collinear ±cosine ties,
    one-hot tied eigenvalues, 3-vector over-ask, ±1e30 magnitudes,
    ±1e3 dynamic range, and the NULL/NaN/±Inf invalid-payload corpus
    routed through the `embedding_validation_audit` ingest gate).
    The full discovery sweep (223 scenario × lane combos) found and
    fixed: the PCA degenerate-iterate amplification (tied eigenvalues
    → 1e-18 iterate normalized into engine-dependent loadings — now
    NULLed below 1e-9), the variance-scale anchor-domain routing
    (eigval / avg_sq_err / avg_sq_dist exact only ≲ 5e11), and the
    NULL-component contract (DuckDB list_dot_product crashes; the
    engine's HOF and Arrow cosine lanes disagreed — the audit lane +
    quarantine is the pinned production answer)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    from adversarial_similarity import build_scenarios, write_validated

    from trading_dashboard_spark.queries import QUERY_REGISTRY

    dirs = build_scenarios(str(tmp_path / "adv"))
    vdir = str(tmp_path / "adv" / "invalid_payload_validated")
    write_validated(dirs["invalid_payload"], vdir)
    picks = {
        # zero probe: every probe cosine NULL / zero-guard
        "zero_probe": ["knn_probe_top10", "lsh_ann_top3"],
        # 100% duplicates: cosine-1.0 tie storms in top-k and recall
        "all_dup": ["knn_per_vector_top3", "lsh_recall_at_3",
                    "semantic_dedup_survivors"],
        # collinear ±1 cosines, negative-pole ordering
        "collinear": ["knn_per_vector_top3", "embedding_cosine_near_dup"],
        # tied eigenvalues → degenerate-iterate NULL convention
        "one_hot": ["pca_top_component_power_iteration",
                    "embedding_covariance_top_pairs"],
        # k over-ask on 3 vectors
        "tiny": ["knn_probe_top10", "ivf_recall_at_5", "pq_search_top5"],
        # float32-overflow magnitudes through the double-cast discipline
        "extreme_mag": ["knn_per_vector_top3", "embedding_int8_quantization"],
        # variance-scale lanes inside their anchor domain
        "dynamic_range": ["pca_top_component_power_iteration",
                          "pq_distortion_audit",
                          "kmeans_embedding_clusters"],
        # dirty corpus: ONLY the ingest gate
        "invalid_payload": ["embedding_validation_audit"],
    }
    # validated corpus: the quarantined lanes must be hash-green again
    dirs["invalid_payload_validated"] = vdir
    picks["invalid_payload_validated"] = [
        "embedding_validation_audit", "knn_per_vector_top3",
        "label_centroids",
    ]
    for scen, names in picks.items():
        d = dirs[scen]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
        )
        for name in names:
            ent = QUERY_REGISTRY[name]
            got = ent.fn(spark, d).toPandas()
            exp = con.execute(ent.oracle).df()
            got = got[sorted(got.columns)].sort_values(
                by=sorted(got.columns), ignore_index=True
            )
            exp = exp[sorted(exp.columns)].sort_values(
                by=sorted(exp.columns), ignore_index=True
            )
            tag = f"{scen}:{name}"
            assert list(got.columns) == list(exp.columns), tag
            assert len(got) == len(exp), (tag, len(got), len(exp))
            for c in got.columns:
                g, e = got[c], exp[c]
                if g.dtype.kind == "f" or e.dtype.kind == "f":
                    ok = (
                        (g.isna() & e.isna())
                        | (g.astype(float) == e.astype(float))
                    )
                else:
                    ok = (g.isna() & e.isna()) | (
                        g.astype(object) == e.astype(object)
                    )
                assert ok.all(), (tag, c, got[~ok], exp[~ok])
        con.close()
    # and the audit itself must COUNT the planted violations
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{dirs['invalid_payload']}/embeddings.parquet'"
    )
    row = con.execute(
        QUERY_REGISTRY["embedding_validation_audit"].oracle
    ).df().iloc[0]
    assert row["n_null_component"] == 5      # i % 8 == 0 of 40
    assert row["n_nonfinite"] == 15          # NaN + inf + -inf classes
    assert row["n_valid"] == 20
