"""End-to-end pipeline tests — synthetic JSON landing → normalize → merge →
patterns (SURVEY.md §5 item 3), plus the news-correlation pipeline."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from trading_dashboard_spark.pipelines.news_pipeline import correlate_signal_with_price
from trading_dashboard_spark.pipelines.stock_pipeline import (
    derive_patterns,
    normalize_staging,
    run_stock_pipeline,
)


@pytest.fixture
def landing(tmp_path):
    """FIXTURES.md §1.3 raw-quote landing: one JSON list per (symbol, day),
    including a mismatched-date row to exercise the partition date filter
    (full_stock_pipeline.py:207)."""
    day = tmp_path / "landing" / "2024" / "01" / "08"
    day.mkdir(parents=True)
    rows_a = [
        {"symbol": "AAA", "date": "2024-01-08", "o": 10.0, "h": 12.0, "l": 9.0,
         "c": 11.0, "pc": 10.5, "d": 0.5, "dp": 4.7, "v": 1000},
        {"symbol": "AAA", "date": "2024-01-07", "o": 1.0, "h": 1.0, "l": 1.0,
         "c": 1.0, "pc": 1.0, "d": 0.0, "dp": 0.0, "v": 1},  # wrong date -> filtered
    ]
    rows_b = [
        {"symbol": "BBB", "date": "2024-01-08", "o": 5.0, "h": 5.6, "l": 4.0,
         "c": 5.5, "pc": None, "d": None, "dp": None, "v": None},  # null guards
    ]
    (day / "AAA_quote.json").write_text("\n".join(json.dumps(r) for r in rows_a))
    (day / "BBB_quote.json").write_text("\n".join(json.dumps(r) for r in rows_b))
    return str(tmp_path / "landing")


def test_stock_pipeline_end_to_end_and_idempotent(spark, landing, tmp_path):
    hist = str(tmp_path / "history")
    pats = str(tmp_path / "patterns")
    counts1 = run_stock_pipeline(spark, landing, hist, pats, "2024", "01", "08")
    assert counts1["staging_rows"] == 2  # mismatched date filtered out
    assert counts1["history_rows"] == 2

    history = spark.read.parquet(hist)
    row = {r["symbol"]: r for r in history.collect()}
    assert row["AAA"]["closing_price"] == 11.0
    assert row["AAA"]["previous_closing_price"] == 10.5  # feed fallback
    assert row["BBB"]["traded_volume"] == 0  # null -> 0 fill
    assert "year" in history.columns  # partition column (S16)

    # re-running the same day is a no-op (ON CONFLICT semantics)
    counts2 = run_stock_pipeline(spark, landing, hist, pats, "2024", "01", "08")
    assert counts2["history_rows"] == counts1["history_rows"]
    assert counts2["pattern_rows"] == counts1["pattern_rows"]


def test_derive_patterns_shapes(spark):
    rows = []
    # Bullish: 3 rising closes; volatility: (h-l)/l > 5%
    closes = [10.0, 11.0, 12.0, 13.0]
    for i, c in enumerate(closes):
        rows.append(("SYM", dt.date(2024, 1, 1 + i), c, c + 1.0, c - 0.1))
    df = spark.createDataFrame(
        rows, ["symbol", "trade_date", "closing_price", "highest_price", "lowest_price"]
    )
    out = derive_patterns(df)
    cats = {r["pattern"] for r in out.collect()}
    assert "Bullish Trend" in cats and "High Volatility" in cats


def test_correlate_signal_with_price_defaults(spark):
    news = spark.createDataFrame(
        [("A", dt.date(2024, 1, 2), 0.5), ("B", dt.date(2024, 1, 2), -0.5)],
        ["symbol", "news_date", "sentiment_score"],
    )
    price = spark.createDataFrame(
        [("A", dt.date(2024, 1, 2), 11.0, 10.0, 12.0, 9.0)],
        ["symbol", "trade_date", "closing_price", "previous_closing_price",
         "highest_price", "lowest_price"],
    )
    out = {r["symbol"]: r for r in correlate_signal_with_price(news, price).collect()}
    assert out["A"]["price_direction"] == "Up"
    assert abs(out["A"]["price_change"] - 10.0) < 1e-9
    # unmatched symbol gets COALESCE defaults (analyze_news_stock_patterns.py:34-44)
    assert out["B"]["price_direction"] == "Unknown"
    assert out["B"]["price_change"] == 0.0 and out["B"]["volatility_score"] == 0.0
