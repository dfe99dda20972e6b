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
