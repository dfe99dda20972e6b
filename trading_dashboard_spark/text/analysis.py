"""Text-analysis operators over document tables.

Extension tier (SURVEY.md §2.11 X4): the operations a large-scale
training-data pipeline runs over raw text — tokenization, token counting,
quality scoring, language-ID, and document fingerprinting. Everything is
built from JVM-side `pyspark.sql.functions` (regex + string + hash), so the
hot path stays inside whole-stage codegen — no Python per row.

All functions are Column→Column (or DataFrame transforms) so they compose
into scans with full pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Tiny per-language stopword markers for the heuristic language scorer.
#: Deliberately small + deterministic (public common-word lists); real
#: deployments would swap in a fastText/CLD3 pandas UDF — the operator
#: shape (score per language, argmax) stays the same.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "es": ["el", "la", "que", "los", "es"],
    "fr": ["le", "la", "les", "est", "une"],
}

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"

#: The quality-scoring stopword set — ONE definition shared by
#: `quality_features` and every SQL oracle that restates its
#: stopword-ratio (doc_quality_features, token_budget_selection, the
#: budgeted manifest): ADVICE r9 found three hand-synced copies of the
#: literal list drifting apart was one edit away.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "is", "in", "it",
)


def stopwords_sql_list() -> str:
    """The `STOPWORDS` tuple as a SQL IN-list literal ('the','a',…)."""
    return ",".join(f"'{w}'" for w in STOPWORDS)


def tokenize(text: Column) -> Column:
    """Whitespace tokenization → array<string>; empty/null-safe."""
    t = F.trim(text)
    return F.when(
        (t.isNull()) | (F.length(t) == 0), F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish subword estimate ≈ chars/4 is also
    exposed by quality_features)."""
    return F.size(tokenize(text))


def quality_features(text: Column) -> dict[str, Column]:
    """Document quality signals: length, token stats, punctuation/stopword
    ratios, approximate BPE token estimate.

    Pure string/regex expressions — each is one codegen'd projection.
    """
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t)
    toks = tokenize(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    # stopword hits by literal-array membership — equivalent to matching
    # each token against ^(the|a|...)$ but without per-token regex
    # evaluation inside the interpreted lambda (HOFs are outside codegen;
    # the regex engine per element dominated this projection's cost)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    safe_tokens = F.when(n_tokens != 0, n_tokens)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_tokens_bpe_est": F.ceil(n_chars / F.lit(4.0)).cast("long"),
        "avg_token_len": (n_alpha / safe_tokens.cast("double")),
        "punct_ratio": n_punct / F.when(n_chars != 0, n_chars).cast("double"),
        "stopword_ratio": n_stop / safe_tokens.cast("double"),
        "_stopwords": stop_arr,  # exposed for tests
    }


def language_id(text: Column) -> Column:
    """Heuristic n-gram/stopword language scorer → best language code.

    Counts marker-word hits per language and takes the argmax ('und' =
    undetermined when nothing matches). Deterministic and SQL-expressible,
    so it is oracle-checkable; swap the scorer for a model UDF at will.
    """
    toks = F.transform(tokenize(text), lambda x: F.lower(x))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda x: F.array_contains(marker_arr, x)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of lower-cased,
    whitespace-collapsed text. Used for exact dedup at scale (hash is
    shuffled instead of full text) — X1/X4."""
    canon = F.regexp_replace(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+", " ")
    return F.md5(canon)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking — the corpus→context-window stage
    of a training pipeline (UDTF shape: one input doc → n chunk rows).

    Chunk i covers tokens [i·step, i·step + chunk_tokens) with
    step = chunk_tokens − overlap; the last chunk may be short; empty
    docs produce no chunks. Pure JVM array expressions (tokenize →
    sequence → slice → posexplode): the explode multiplies rows ~n_tokens/
    step ×, but each output row carries only its own window — no shuffle,
    no Python, scales as a map-side transform.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    # r11: the token array MATERIALIZES in its own projection before any
    # per-chunk expression touches it — the previous form captured the
    # tokenize() subtree inside the transform() lambda, and a captured
    # subexpression is re-evaluated per array ELEMENT during interpreted
    # HOF evaluation (the corpus was re-tokenized n_chunks× per doc; the
    # chunk_fingerprints fix, same idiom). The chunk loop is an index
    # EXPLODE + per-row slice: chunk_idx < n_chunks reproduces the old
    # slice(win, 1, n_chunks) trim exactly (sequence(0, greatest(nc,1)-1)
    # emits [0] for empty docs, which the filter drops — the old
    # descending-sequence guard's cases, row-wise).
    toked = df.select(
        F.col(id_col),
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("__tk"),
    )
    n = F.size(F.col("__tk"))
    n_chunks = F.when(n > 0, F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(chunk_tokens)) / F.lit(step)) + 1).cast("int"),
    )).otherwise(F.lit(0))
    ex = toked.select(
        id_col, "__tk", n_chunks.alias("__nc"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1)
        ).alias("chunk_idx"),
    ).filter(F.col("chunk_idx") < F.col("__nc"))
    i = F.col("chunk_idx")
    return ex.select(
        id_col,
        i.cast("int").alias("chunk_idx"),
        F.concat_ws(
            " ", F.slice(F.col("__tk"), i * step + 1, chunk_tokens)
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.size(F.col("__tk")) - i * step)
        .cast("int").alias("n_tokens"),
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-level Shannon entropy per document — a model-free
    perplexity proxy for quality filtering (gibberish and boilerplate
    both sit at distribution extremes).

    H = log2(T) − Σ c·log2(c) / T over per-character counts c, total T.
    Plan: explode to (doc, char) → count (map-side combine shrinks the
    shuffle to ≤ alphabet size per doc) → one aggregate. Scales as a
    standard two-stage aggregation keyed by doc.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "")).alias("ch"),
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double"))).alias("s"),
    )
    ent = F.log2(F.col("total").cast("double")) - F.col("s") / F.col("total")
    return df.select(id_col).join(
        per_doc.select(id_col, ent.alias("char_entropy")), id_col, "left"
    )


def repetition_signals(text: Column) -> dict[str, Column]:
    """Repetition-based quality signals (the Gopher/MassiveText filter
    family): type-token ratio, most-frequent-token share, duplicate
    word-bigram fraction.

    Everything runs as array expressions inside the projection — the
    most-frequent-token count is the longest run in the *sorted* token
    array, computed with one ``aggregate`` pass (struct accumulator), so
    no explode/shuffle is needed for a per-document mode count. Map-only
    at any corpus size.
    """
    ws = F.transform(tokenize(text), lambda x: F.lower(x))
    n = F.size(ws)
    safe_n = F.when(n > 0, n).cast("double")
    sorted_ws = F.array_sort(ws)
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_c = F.aggregate(sorted_ws, acc0, _step, lambda acc: acc["best"])
    # r11: bigrams via the shingles zip_with idiom — ws enters zip_with
    # as an ARGUMENT (evaluated once per row), where the previous
    # transform-over-sequence captured ws inside its lambda and
    # re-evaluated the tokenize+lower chain per element (2(n−1)
    # tokenizations per doc during interpreted HOF evaluation). Values
    # identical: zip_with pads the short side with NULL, concat_ws
    # skips NULLs, and the n−1 slice drops that trailing element anyway.
    bigrams = F.when(n >= 2, F.slice(
        F.zip_with(
            ws, F.slice(ws, 2, n), lambda a, b: F.concat_ws(" ", a, b)
        ), 1, n - 1,
    )).otherwise(F.array().cast("array<string>"))
    nb = F.size(bigrams)
    safe_nb = F.when(nb > 0, nb).cast("double")
    return {
        "n_words": n.cast("long"),
        "type_token_ratio": F.size(F.array_distinct(ws)) / safe_n,
        "top_word_frac": top_c / safe_n,
        "dup_bigram_frac": F.lit(1.0) - F.size(F.array_distinct(bigrams)) / safe_nb,
    }


#: PII patterns chosen from the regex subset Java (Spark) and RE2
#: (DuckDB) interpret identically: character classes, bounded repeats,
#: no lookaround/backrefs. Order matters — URLs before emails would eat
#: the '@' host forms; emails run first.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+[0-9][0-9\-]{7,14}[0-9]", "<PHONE>"),
)


def redact_pii(text: Column) -> dict[str, Column]:
    """Training-data PII scrubbing: replace emails, URLs and
    international-format phone numbers with typed placeholder tokens and
    count each family. Returns ``{"redacted", "n_email", "n_url",
    "n_phone"}`` columns — all JVM regexp expressions, map-only, and
    SQL-replicable pattern-for-pattern (the query tier renders the same
    PII_PATTERNS into the DuckDB oracle)."""
    src = F.coalesce(text, F.lit(""))
    out: dict[str, Column] = {}
    red = src
    for name, pat, token in PII_PATTERNS:
        out[f"n_{name}"] = F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, token)
    out["redacted"] = red
    return out


def chunk_fingerprints(
    df: DataFrame,
    chunk_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Non-overlapping token-window fingerprints — the unit of line/
    paragraph-level corpus dedup (CCNet/RefinedWeb-style boilerplate
    removal works on repeated *segments*, not whole documents).

    One row per (doc, chunk_idx) with a 64-bit xxhash64 of the chunk
    text: downstream stages group on the fingerprint (8-byte shuffle,
    never text) to find segments repeated across documents — the fp is
    an equality key that never surfaces in query output, so the engine
    uses the narrowest hash Spark evaluates natively (the oracle keeps
    md5; equivalence classes are identical modulo 2^-64 collisions).
    Map-only explode.
    """
    # r11: the token array MATERIALIZES in its own projection before any
    # per-chunk expression touches it. The previous form captured the
    # whole tokenize() subtree inside the transform() lambda, and a
    # captured subexpression is re-evaluated per array ELEMENT during
    # interpreted HOF evaluation — the corpus was re-tokenized
    # n_chunks× per document (measured 1.03 → 0.29 s at sf0.1). The
    # chunk loop is also an index EXPLODE + per-row slice now, not a
    # built-then-sliced struct array: same rows (chunk_idx < ceil(n/w)
    # reproduces slice(win, 1, n_chunks) exactly, including the
    # zero-token doc dropping out), same fp expression, one fewer
    # array materialization per document.
    toked = df.select(
        F.col(id_col),
        tokenize(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias("__tk"),
    )
    n = F.size(F.col("__tk"))
    n_chunks = F.ceil(n / F.lit(chunk_tokens)).cast("int")
    ex = toked.select(
        id_col, "__tk", n_chunks.alias("__nc"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1)
        ).alias("chunk_idx"),
    ).filter(F.col("chunk_idx") < F.col("__nc"))
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.xxhash64(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__tk"),
                    F.col("chunk_idx") * chunk_tokens + 1,
                    chunk_tokens,
                ),
            )
        ).alias("chunk_fp"),
    )


def chunk_boilerplate(
    df: DataFrame,
    chunk_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
    scope_cache: bool = True,
) -> DataFrame:
    """Per-document boilerplate score from chunk-level repetition — the
    CCNet/RefinedWeb segment-dedup signal composed end-to-end: chunk
    fingerprints (:func:`chunk_fingerprints`) → corpus-wide repeat counts
    → fraction of each doc's chunks that recur in OTHER docs.

    Scale shape (the properties the plan test pins):

    - the repeat-count relation is filtered to ``nd > 1`` BEFORE the
      join-back, so the join's build side is only the *repeated*
      fingerprints — a small fraction of all fingerprints at realistic
      dup rates — instead of the full corpus vocabulary; at that size
      AQE can broadcast it, turning the second fp shuffle into a
      map-side join. Non-repeated chunks fall out of the left join as
      NULL and count as unique.
    - ``persist=True`` caches the exploded (doc, chunk_fp) relation,
      which both consumers (repeat-count aggregate + join-back) need;
      without it the tokenize/chunk subtree executes twice. With the
      default ``scope_cache=True`` the per-doc result (corpus-doc-count
      rows, tiny) is eagerly materialized via ``localCheckpoint`` and
      the chunk cache released — call-scoped, no session residue (the
      text/dedup.minhash_near_dup_pairs convention). Pass
      ``scope_cache=False`` in plan tests to inspect the live plan;
      the CALLER then owns the cache lifetime.

    Returns (id_col, n_chunks, n_repeated, repeated_ratio) with
    repeated_ratio unrounded (query tier applies presentation rounding).
    """
    fps = chunk_fingerprints(
        df, chunk_tokens=chunk_tokens, text_col=text_col, id_col=id_col
    ).select(id_col, "chunk_fp")
    if persist:
        fps = fps.persist()
    rep = (
        fps.groupBy("chunk_fp")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") > 1)
    )
    is_rep = F.col("nd").isNotNull()
    out = (
        fps.join(rep, "chunk_fp", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(is_rep.cast("int")).cast("long").alias("n_repeated"),
            F.avg(F.when(is_rep, 1.0).otherwise(0.0)).alias("repeated_ratio"),
        )
    )
    if persist and scope_cache:
        out = out.localCheckpoint(eager=True)
        fps.unpersist()
    return out


def chunk_udtf():
    """The document-chunking operator as a Spark 4 Python UDTF — the
    SQL-surface form of :func:`chunk_documents`, registered so plain SQL
    can fan documents out to chunk rows via a LATERAL join:

        spark.udtf.register("chunk_doc", chunk_udtf())
        spark.sql(\"\"\"
            SELECT d.doc_id, c.chunk_idx, c.n_tokens
            FROM documents d, LATERAL chunk_doc(d.text, 64, 16) c
        \"\"\")

    Semantics match chunk_documents exactly (overlapping token windows,
    short tails, empty docs emit nothing) — pinned by a parity test. The
    expression form remains the hot path (JVM arrays, no Python); the
    UDTF is the API for SQL-first users and arbitrary-Python chunkers
    (sentence splitters, tokenizer-aware packing) that array expressions
    cannot express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class ChunkDoc:
        def eval(self, text: str, chunk_tokens: int, overlap: int):
            if overlap >= chunk_tokens:
                raise ValueError("overlap must be smaller than chunk_tokens")
            toks = (text or "").split()
            if not toks:
                return
            step = chunk_tokens - overlap
            n = len(toks)
            n_chunks = max(1, -(-(n - chunk_tokens) // step) + 1) if n > 0 else 0
            for i in range(n_chunks):
                win = toks[i * step : i * step + chunk_tokens]
                yield i, " ".join(win), len(win)

    return ChunkDoc
