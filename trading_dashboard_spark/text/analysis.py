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

from pyspark.sql import Column, functions as F

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
    stopwords = ("the", "a", "an", "and", "or", "of", "to", "is", "in", "it")
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    # stopword hits by literal-array membership — equivalent to matching
    # each token against ^(the|a|...)$ but without per-token regex
    # evaluation inside the interpreted lambda (HOFs are outside codegen;
    # the regex engine per element dominated this projection's cost)
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
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
