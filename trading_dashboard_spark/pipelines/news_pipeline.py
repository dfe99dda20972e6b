"""News/sentiment pipeline — scoring + price-move correlation.

Reference: fetch_transform_news.py (VADER scoring :171-175, upsert
:184-194) and analyze_news_stock_patterns.py:17-74 (CTE joining 7-day news
sentiment to price changes with direction/volatility classification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..io.writers import insert_if_absent
from ..operators.relational import safe_div
from ..text.sentiment import sentiment_score


def score_news(news: DataFrame) -> DataFrame:
    """U1 — attach compound sentiment of headline + summary
    (fetch_transform_news.py:171-175); Arrow-batched, analyzer initialized
    once per executor."""
    return news.withColumn(
        "sentiment_score", sentiment_score(F.col("headline"), F.col("summary"))
    )


def upsert_news(target: DataFrame, scored: DataFrame) -> DataFrame:
    """Insert-if-absent on the reference's conflict key
    (symbol, headline, news_date) — fetch_transform_news.py:187."""
    return insert_if_absent(target, scored, ["symbol", "headline", "news_date"])


def correlate_signal_with_price(
    news_daily: DataFrame, price_daily: DataFrame
) -> DataFrame:
    """analyze_news_stock_patterns.py:17-74 as DataFrame ops:

    - A1: avg sentiment + count per (symbol, date),
    - J2: LEFT JOIN to price changes on both keys,
    - P14/P15/P16: direction CASE, COALESCE defaults, NULLIF guards.

    `news_daily`: (symbol, news_date, sentiment_score); `price_daily`:
    (symbol, trade_date, closing_price, previous_closing_price,
    highest_price, lowest_price).
    """
    agg = news_daily.groupBy("symbol", "news_date").agg(
        F.avg("sentiment_score").alias("avg_sentiment_score"),
        F.count(F.lit(1)).alias("news_count"),
    )
    pc = F.col("closing_price")
    prev = F.col("previous_closing_price")
    price = price_daily.select(
        F.col("symbol").alias("p_symbol"),
        F.col("trade_date"),
        (safe_div(pc - prev, prev) * 100.0).alias("price_change"),
        F.when(pc > prev, "Up").when(pc < prev, "Down").otherwise("Flat").alias(
            "price_direction"
        ),
        (safe_div(F.col("highest_price") - F.col("lowest_price"), F.col("lowest_price")) * 100.0).alias(
            "volatility_score"
        ),
    )
    joined = agg.join(
        price,
        (agg.symbol == price.p_symbol) & (agg.news_date == price.trade_date),
        "left",
    )
    return joined.select(
        "symbol",
        "news_date",
        F.coalesce("avg_sentiment_score", F.lit(0.0)).alias("avg_sentiment_score"),
        F.coalesce("price_change", F.lit(0.0)).alias("price_change"),
        F.coalesce("price_direction", F.lit("Unknown")).alias("price_direction"),
        F.coalesce("volatility_score", F.lit(0.0)).alias("volatility_score"),
        "news_count",
    )
