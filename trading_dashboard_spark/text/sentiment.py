"""Sentiment scoring — the engine's replacement for the reference's VADER UDF.

Reference: NLTK VADER ``polarity_scores(headline + ' ' + summary)['compound']``
applied row-by-row in a pandas loop (fetch_transform_news.py:171-175).

The engine vendors the VADER *algorithm* (valence lexicon + rule-based
modifiers + compound normalization, Hutto & Gilbert ICWSM 2014) with the
curated lexicon in ``vader_lexicon.py``, executed as a vectorized
Arrow-batched pandas UDF. Implemented rules, in evaluation order per
valenced token:

1. degree modifiers: an intensifier/dampener within the 3 preceding
   tokens adds ``±B_INCR`` (decayed 1.0 / 0.95 / 0.9 by distance) to the
   token's magnitude;
2. negation: any negator within the 3 preceding tokens multiplies the
   modified valence by ``N_SCALAR`` (-0.74);
3. punctuation emphasis: each '!' (capped at 4) adds ``EP_AMPLIFY`` with
   the sign of the summed valence;
4. compound normalization ``s / sqrt(s*s + 15)`` onto [-1, 1].

Omitted VADER rules (documented divergence): ALL-CAPS emphasis, special
idioms/bigrams, the "but"-clause reweighting, and '?' emphasis.

Every rule is elementary arithmetic over a token window, so the scorer is
SQL-replicable: ``vader_oracle_sql()`` renders the *same* lexicon and
constants into a DuckDB query, which is how the driver hash-checks this
Python-UDF lane (queries_text.doc_sentiment).

Real NLTK VADER remains an explicit opt-in (``engine="nltk"``) rather
than an import-triggered default so the builtin path — the one the oracle
replicates — stays deterministic regardless of what is installed.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from .vader_lexicon import (
    B_INCR,
    DAMPENERS,
    DECAY_2,
    DECAY_3,
    EP_AMPLIFY,
    EP_CAP,
    INTENSIFIERS,
    LEXICON,
    NEGATORS,
    N_SCALAR,
)

#: lowercase words + inner apostrophes — mirrored by the oracle's regex.
_TOKEN_RE = re.compile(r"[a-z']+")


def _modifier(tok: str) -> float:
    if tok in INTENSIFIERS:
        return B_INCR
    if tok in DAMPENERS:
        return -B_INCR
    return 0.0


def vader_score(text: str | None) -> float:
    """Compound sentiment of one string on [-1, 1] (deterministic,
    SQL-replicable — see module docstring for the rule set)."""
    raw = text or ""
    toks = _TOKEN_RE.findall(raw.lower())
    s = 0.0
    for i, tok in enumerate(toks):
        v = LEXICON.get(tok)
        if v is None:
            continue
        b = (
            (_modifier(toks[i - 1]) if i >= 1 else 0.0)
            + (_modifier(toks[i - 2]) if i >= 2 else 0.0) * DECAY_2
            + (_modifier(toks[i - 3]) if i >= 3 else 0.0) * DECAY_3
        )
        if v > 0:
            val = v + b
        elif v < 0:
            val = v - b
        else:
            val = v
        if any(i > k and toks[i - 1 - k] in NEGATORS for k in range(3)):
            val *= N_SCALAR
        s += val
    n_excl = min(raw.count("!"), EP_CAP)
    if s > 0:
        s += n_excl * EP_AMPLIFY
    elif s < 0:
        s -= n_excl * EP_AMPLIFY
    return s / math.sqrt(s * s + 15.0)


@F.pandas_udf(T.DoubleType())
def _sentiment_udf(texts: pd.Series) -> pd.Series:
    return texts.map(vader_score)


def _nltk_udf():
    @F.pandas_udf(T.DoubleType())
    def udf(texts: pd.Series) -> pd.Series:
        from nltk.sentiment import SentimentIntensityAnalyzer  # type: ignore

        sia = SentimentIntensityAnalyzer()  # init once per executor batch
        return texts.fillna("").map(lambda t: sia.polarity_scores(t)["compound"])

    return udf


def sentiment_score(
    headline: Column, summary: Column | None = None, engine: str = "builtin"
) -> Column:
    """U1 — compound sentiment of ``headline + ' ' + summary`` (null-safe
    concat mirrors the reference's ``or ''`` fallback at :173).

    ``engine="builtin"`` (default) is the vendored deterministic VADER;
    ``engine="nltk"`` opts into real NLTK VADER where installed."""
    text = headline if summary is None else F.concat_ws(" ", headline, summary)
    if engine == "nltk":
        return _nltk_udf()(text)
    return _sentiment_udf(text)


def _sql_set(words) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))


def vader_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text", digits: int = 4) -> str:
    """DuckDB replication of :func:`vader_score` over ``table`` —
    generated from the same lexicon/constants so the two lanes cannot
    drift. Guarded list indexing (``i >= k``) avoids DuckDB's negative-
    index wraparound; per-doc sums re-round at ``digits`` to absorb
    accumulation-order ulps (registry discipline)."""
    lex_rows = ",\n      ".join(
        f"('{tok.replace(chr(39), chr(39) * 2)}', {val})"
        for tok, val in sorted(LEXICON.items())
    )

    def mod_case(idx: str) -> str:
        return (
            f"(CASE WHEN tks[{idx}] IN ({_sql_set(INTENSIFIERS)}) THEN {B_INCR} "
            f"WHEN tks[{idx}] IN ({_sql_set(DAMPENERS)}) THEN -{B_INCR} "
            f"ELSE 0.0 END)"
        )

    neg = _sql_set(NEGATORS)
    return f"""
    WITH lex(tok, v) AS (VALUES
      {lex_rows}
    ),
    docs AS (
      SELECT {id_col} AS doc_id,
             regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z'']+') AS tks,
             least(len(regexp_extract_all(coalesce({text_col}, ''), '!')), {EP_CAP}) AS n_excl
      FROM {table}
    ),
    flat AS (
      SELECT doc_id, tks,
             unnest(tks) AS tok,
             generate_subscripts(tks, 1) AS i
      FROM docs
    ),
    scored AS (
      SELECT f.doc_id,
             (CASE WHEN l.v > 0 THEN l.v + b WHEN l.v < 0 THEN l.v - b ELSE l.v END)
             * (CASE WHEN negated THEN {N_SCALAR} ELSE 1.0 END) AS val
      FROM (
        SELECT doc_id, tok,
               (CASE WHEN i >= 2 THEN {mod_case('i-1')} ELSE 0.0 END)
               + (CASE WHEN i >= 3 THEN {mod_case('i-2')} ELSE 0.0 END) * {DECAY_2}
               + (CASE WHEN i >= 4 THEN {mod_case('i-3')} ELSE 0.0 END) * {DECAY_3} AS b,
               ((i >= 2 AND tks[i-1] IN ({neg}))
                OR (i >= 3 AND tks[i-2] IN ({neg}))
                OR (i >= 4 AND tks[i-3] IN ({neg}))) AS negated
        FROM flat
      ) f JOIN lex l ON f.tok = l.tok
    ),
    agg AS (SELECT doc_id, sum(val) AS s FROM scored GROUP BY doc_id),
    emph AS (
      SELECT d.doc_id,
             CASE WHEN coalesce(a.s, 0.0) > 0 THEN a.s + d.n_excl * {EP_AMPLIFY}
                  WHEN coalesce(a.s, 0.0) < 0 THEN a.s - d.n_excl * {EP_AMPLIFY}
                  ELSE 0.0 END AS s
      FROM docs d LEFT JOIN agg a USING (doc_id)
    )
    SELECT doc_id, round(s / sqrt(s * s + 15.0), {digits}) AS sentiment
    FROM emph
    """
