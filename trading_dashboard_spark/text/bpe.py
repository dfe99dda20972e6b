"""Byte-pair encoding — learned subword vocabulary over a corpus.

The engine's text tier counts tokens with a BPE-ish regex
(text/analysis.token_count); this module learns an ACTUAL merge table
(Sennrich et al. 2016) and applies it — the tokenizer-training step of
an LLM data pipeline.

Scale shape: BPE training never iterates over the corpus. ONE
distributed pass builds the (word, freq) vocabulary — a relation bounded
by distinct-word count, further capped at ``max_vocab`` by frequency
(the standard practice; rank-(V+1) words contribute negligible pair
mass) — and the merge loop then runs driver-side on that bounded table,
exactly like ivf.fit_centroids' bounded-sample discipline (documented
bounded collect: ≤ max_vocab rows, never corpus rows). Application
(`apply_bpe`) is a map-only Arrow pass with per-batch word caching:
each DISTINCT word is encoded once per batch, so cost tracks the
vocabulary actually present, not token count.

Determinism: pair-count ties break lexicographically (fixed merge
order for a fixed vocabulary), so fitted merge tables are reproducible
and serializable as plan literals.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

#: end-of-word sentinel (distinguishes "est</w>" from "est" mid-word)
EOW = "</w>"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int = 50_000,
) -> list[tuple[str, int]]:
    """One corpus pass → top-``max_vocab`` (word, count) pairs,
    frequency-descending with a lexicographic tiebreak. Lowercased
    whitespace/letter tokenization matching text/analysis's convention."""
    toks = df.select(
        F.explode(
            F.expr(
                f"filter(split(lower(coalesce({text_col}, '')), "
                f"'[^a-z0-9\\']+'), t -> t <> '')"
            )
        ).alias("w")
    )
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    rows = (
        counts.orderBy(F.col("n").desc(), F.col("w"))
        .limit(max_vocab)
        .collect()
    )
    return [(r["w"], r["n"]) for r in rows]


def fit_bpe(
    vocab: list[tuple[str, int]], n_merges: int = 200
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a (word, freq) table —
    driver-side on the bounded vocabulary (the corpus is never touched
    again). Each iteration merges the most frequent adjacent symbol
    pair; ties break lexicographically for determinism."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], n) for w, n in vocab
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for i, (syms, n) in enumerate(words):
            if best[0] in syms:
                words[i] = (_merge_pass(syms, *best), n)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application to one word.

    Each iteration merges ALL occurrences of the selected lowest-rank
    pair, left to right (GPT-2 style), exactly as `fit_bpe`'s training
    loop rewrites its vocabulary — one-occurrence-per-iteration would
    let a merge that creates a lower-ranked pair pre-empt the remaining
    occurrences, so a training word could encode differently than it was
    segmented during training."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_pair, best_r = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_pair, best_r = pair, r
        if best_pair is None:
            break
        syms = _merge_pass(syms, *best_pair)
    return syms


def _merge_pass(syms: list[str], a: str, b: str) -> list[str]:
    """One left-to-right merge-all-occurrences pass of pair (a, b)."""
    out: list[str] = []
    j = 0
    while j < len(syms):
        if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
            out.append(a + b)
            j += 2
        else:
            out.append(syms[j])
            j += 1
    return out


def _encode_word_ordered(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Sequential rank-order merge application (the original Sennrich
    formulation): every rule applies once, in training order, merging
    all its occurrences — which replays fit_bpe's vocabulary rewrites
    verbatim, so a training word ALWAYS encodes to its training
    segmentation. Differs from the greedy form only when a later rule
    re-creates an occurrence of an earlier pair (which greedy would
    then merge); sequential order is the SQL-oracle-replayable form."""
    syms = list(word) + [EOW]
    for a, b in merges:
        if a in syms:
            syms = _merge_pass(syms, a, b)
    return syms


#: symbol-sequence sentinels: each symbol is stored as ``\x02sym\x03``
#: inside one state string per document. \x02/\x03 cannot occur in
#: symbols (tokens are lowercase [a-z0-9']+, phrase joins use ' '), so
#: symbol boundaries are unambiguous and a merge is a LITERAL string
#: replace: ``\x02a\x03\x02b\x03 → \x02a b\x03`` consumes exactly its
#: two symbols (no shared delimiter), and ``replace()``'s left-to-right
#: non-overlapping scan is precisely `_merge_pass`'s scan-with-skip
#: (``[a,a,a] → [a·a, a]``; ``[a,a,a,a] → [a·a, a·a]``).
_SO, _SC = "\x02", "\x03"

#: adjacent-pair stream of a symbol array (zip_with pads the sliced tail
#: with NULL; the filter drops that sentinel) — the distributed
#: trainer's count stage.
_ADJ_PAIRS = (
    "filter(zip_with(syms, slice(syms, 2, greatest(size(syms) - 1, 0)), "
    "(x, y) -> struct(x AS a, y AS b)), p -> p.b IS NOT NULL)"
)


def fit_bpe_sequences(
    df: DataFrame,
    n_merges: int = 256,
    text_col: str = "text",
    checkpoint_every: int = 32,
    sample_docs: int | None = None,
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Sequence-level (phrase) BPE: learn ``n_merges`` merge rules over
    each document's WORD sequence — the tokenizer-induction regime where
    the training state is the corpus itself, not a bounded vocabulary,
    so the merge loop must stay distributed (`fit_bpe`'s bounded-vocab
    collect is structurally impossible here).

    Per iteration: ONE Spark action — map-side-combined pair counts
    (shuffle rows are (a, b, partial_count), never document text) with a
    deterministic (count DESC, a, b) argmax; the selected merge is then
    applied lazily as a single LITERAL ``replace()`` on the sentinel-
    delimited state string (see ``_SO``/``_SC`` — plain JVM string op, no
    higher-order folds, whose nested-CaseWhen field extraction blew up
    super-linearly under Catalyst's ExtractValue pushdown in the first
    cut), so its cost rides the NEXT iteration's count pass.
    ``localCheckpoint`` every ``checkpoint_every`` rules bounds plan
    depth; the driver holds only the merge table (≤ ``n_merges`` pairs).
    At 100 TB this is the textbook full-pass-per-merge cost of sequence
    BPE — the corpus never leaves the executors and every shuffle is
    count-sized.

    Loop-scoped session confs (restored on exit): AQE off, one shuffle
    partition, whole-stage codegen off. Each of the 256 iterations is a
    DISTINCT tiny plan, so per-plan codegen compilation and AQE stage
    re-planning are pure overhead, and the pair-count aggregate output is
    vocabulary-bounded (map-side combine does the heavy lifting) so even
    at corpus scale a handful of reducers suffice — measured together
    these cut the sf0.01 loop 85 s → 57 s. NOTE these confs are
    SESSION-GLOBAL for the loop's duration (shuffle partitioning and AQE
    cannot be scoped per-plan): the trainer must own the SparkSession
    exclusively while fitting — a query planned concurrently on the same
    session would silently get one shuffle partition and no AQE
    (ADVICE r7; the registry runs queries sequentially, so the contract
    holds there by construction).

    ``sample_docs`` bounds the training input by a CONSTANT, not corpus
    size (r7 verdict #6): the ``sample_docs`` documents with the
    smallest ``(md5(id), id)`` — a deterministic corpus-stable slice any
    SQL oracle replays, selected by one TakeOrdered pass (top-N by
    16-byte hash: map-side heap, no full sort, nothing corpus-sized on
    the driver). Production tokenizers train on a bounded sample; at
    100 TB the unsampled loop's 256 full corpus passes are the textbook
    sequence-BPE cost, the sampled loop's are 256 passes over a
    fixed-size slice.

    Tokenization matches `word_frequencies` (lowercase ``[a-z0-9']+``);
    the loop stops early if no adjacent pair remains.

    SAMPLED path (r11 optimization): with ``sample_docs`` set the training
    state is a CONSTANT — ``sample_docs`` sentinel strings — so the merge
    loop runs DRIVER-LOCAL on the collected sample instead of issuing
    ``n_merges`` sequential Spark actions (64 tiny jobs ≈ 5-6 s of pure
    scheduling at any scale; measured r11:
    ``tokenizer_fertility_by_source`` ×10 10.3 s → encode-dominated).
    One bounded collect (the same TakeOrdered sample selection), then the
    identical algorithm: adjacent-pair counts over the unwrapped symbol
    sequences, argmax by (count DESC, a, b) — ASCII-only symbols, so
    Python string order == UTF8String binary order — and the same
    left-to-right non-overlapping literal replace. Merge tables are
    bit-identical (pinned by test_fit_bpe_sequences_local_matches_spark);
    the unsampled path keeps the distributed loop, which also means the
    loop-scoped session-conf mutation below never happens on the sampled
    path (removes the exclusive-session hazard for it)."""
    if sample_docs is not None:
        df = (
            df.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(sample_docs)
        )
    toks = F.expr(
        f"filter(split(lower(coalesce({text_col}, '')), "
        f"'[^a-z0-9\\']+'), t -> t <> '')"
    )
    state = (
        df.select(toks.alias("syms"))
        .filter(F.size("syms") > 1)
        .select(
            F.concat_ws(
                "",
                F.transform(
                    "syms",
                    lambda s: F.concat(F.lit(_SO), s, F.lit(_SC)),
                ),
            ).alias("seq")
        )
    )
    if sample_docs is not None:
        seqs = [r[0] for r in state.collect()]  # ≤ sample_docs strings
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for s in seqs:
                syms = s[1:-1].split(_SC + _SO)
                for pair in zip(syms, syms[1:]):
                    counts[pair] = counts.get(pair, 0) + 1
            if not counts:
                break
            a, b = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
            merges.append((a, b))
            pat = _SO + a + _SC + _SO + b + _SC
            rep = _SO + a + " " + b + _SC
            seqs = [s.replace(pat, rep) for s in seqs]
        return merges

    unwrap = F.split(
        F.expr("substring(seq, 2, length(seq) - 2)"), _SC + _SO
    )
    spark = df.sparkSession
    loop_confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.codegen.wholeStage": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in loop_confs}
    for k, v in loop_confs.items():
        spark.conf.set(k, v)
    merges: list[tuple[str, str]] = []
    try:
        for k in range(n_merges):
            if k % checkpoint_every == 0:
                state = state.localCheckpoint(eager=True)
            best = (
                state.withColumn("syms", unwrap)
                .select(F.explode(F.expr(_ADJ_PAIRS)).alias("p"))
                .groupBy("p.a", "p.b")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            state = state.withColumn(
                "seq",
                F.replace(
                    F.col("seq"),
                    F.lit(_SO + a + _SC + _SO + b + _SC),
                    F.lit(_SO + a + " " + b + _SC),
                ),
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return merges


def encode_bpe_sequences(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Map-only sequence-BPE ENCODE: apply a learned phrase-merge table
    (`fit_bpe_sequences`) to every document, in training order, and
    report per-document token accounting — the tokenizer-eval pass
    behind fertility/compression metrics.

    Adds three columns:
      ``n_words``  — pre-merge word count (the trainer's tokenization);
      ``n_chars``  — length of the space-joined tokenized text (for the
                     lowercase ``[a-z0-9']+`` alphabet this IS the byte
                     count);
      ``n_tokens`` — post-merge sequence length.

    The merge application is the trainer's own mechanism verbatim: the
    sentinel-delimited state string (``_SO``/``_SC``) with one literal
    left-to-right non-overlapping ``str.replace`` per rule — Python's
    ``str.replace`` scan is exactly the JVM ``replace()`` scan the
    trainer uses, so a training document always re-encodes to its
    training segmentation. Runs as ONE Arrow pandas pass (the 256-rule
    chain stays in the executor, one batch of docs at a time); the
    driver ships only the ≤n_merges rule table in the closure. Unlike
    the trainer this is a pure map — no shuffle, no session confs, safe
    to run concurrently."""
    rules = [
        (_SO + a + _SC + _SO + b + _SC, _SO + a + " " + b + _SC)
        for a, b in merges
    ]

    @pandas_udf("long")
    def _n_tokens(seqs: pd.Series) -> pd.Series:
        def enc(seq: str) -> int:
            if not seq:
                return 0
            for pat, rep in rules:
                if pat in seq:
                    seq = seq.replace(pat, rep)
            return seq.count(_SC)

        return seqs.map(enc)

    toks = F.expr(
        f"filter(split(lower(coalesce({text_col}, '')), "
        f"'[^a-z0-9\\']+'), t -> t <> '')"
    )
    seq = F.when(
        F.size("__syms") > 0,
        F.concat_ws(
            "",
            F.transform(
                "__syms", lambda s: F.concat(F.lit(_SO), s, F.lit(_SC))
            ),
        ),
    ).otherwise(F.lit(""))
    return (
        df.withColumn("__syms", toks)
        .withColumn("n_words", F.size("__syms").cast("long"))
        .withColumn(
            "n_chars", F.length(F.concat_ws(" ", F.col("__syms"))).cast("long")
        )
        .withColumn("n_tokens", _n_tokens(seq))
        .drop("__syms")
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    ordered: bool = False,
) -> DataFrame:
    """Map-only BPE encoding: documents → learned-subword arrays. One
    Arrow batch pass; each DISTINCT word in a batch is encoded once
    (memoized), so the per-row cost is amortized by Zipf reuse.

    ``ordered=False`` (default) is the GPT-2-style greedy
    lowest-rank-first encoder; ``ordered=True`` applies rules
    sequentially in training order (`_encode_word_ordered`) — the
    deterministic training replay the registered oracle checks."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    rules = [tuple(m) for m in merges]

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        import re

        cache: dict[str, list[str]] = {}
        word_re = re.compile(r"[a-z0-9']+")

        def enc(t):
            out: list[str] = []
            for w in word_re.findall((t or "").lower()):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = (
                        _encode_word_ordered(w, rules)
                        if ordered
                        else _encode_word(w, ranks)
                    )
                out.extend(got)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, _enc(F.col(text_col)))
