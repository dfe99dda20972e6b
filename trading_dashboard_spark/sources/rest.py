"""REST ingestion sources — the engine side of S1/S2/S3 (SURVEY.md §2.1).

The reference fetches Finnhub quotes/news symbol-by-symbol in a driver-side
loop with sleeps (full_stock_pipeline.py:83-129: 1.5 s/symbol, 60 s on
HTTP 429; fetch_transform_news.py:84-134: batches of 10, retry w/ backoff).
At 500 symbols that's fine; at millions of keys it is the bottleneck.

Engine shape: the symbol list is a DataFrame; fetching runs *inside the
cluster* via `mapInPandas` — each partition works through its batch with a
per-partition rate limiter, so aggregate throughput = partitions x
per-partition rate, and retries/backoff are local to the executor. The
HTTP transport is injected (`fetcher`), which keeps the operator testable
offline and decouples it from any specific API.

No network calls happen in this repo's tests — the default fetcher raises,
and tests inject a deterministic fake.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..schemas import RAW_QUOTE


@dataclass
class RateLimit:
    """Per-partition throttle mirroring the reference's pacing
    (full_stock_pipeline.py:116-121)."""

    sleep_s: float = 0.0
    retry_sleep_s: float = 5.0
    max_retries: int = 3


def _default_fetcher(symbol: str) -> dict:
    raise NotImplementedError(
        "no HTTP transport configured — inject fetcher=<callable> "
        "(network access is deliberately not assumed)"
    )


def fetch_quotes_distributed(
    symbols: DataFrame,
    fetcher: Callable[[str], dict] = _default_fetcher,
    rate: RateLimit | None = None,
    date: str | None = None,
) -> DataFrame:
    """S1 — per-symbol quote fetch as a distributed mapInPandas stage.

    ``symbols``: DataFrame with a `symbol` column. Returns RAW_QUOTE rows.
    Failed symbols (after retries) yield a row of nulls rather than killing
    the stage — the reference's per-symbol try/except (:113-129).
    """
    rate = rate or RateLimit()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_QUOTE.fields]
        for pdf in batches:
            rows = []
            for symbol in pdf["symbol"]:
                payload = None
                for attempt in range(rate.max_retries + 1):
                    try:
                        payload = fetcher(symbol)
                        break
                    except NotImplementedError:
                        raise  # misconfiguration (no transport) — fail fast
                    except Exception:
                        if attempt == rate.max_retries:
                            payload = None
                        else:
                            time.sleep(rate.retry_sleep_s * (attempt + 1))
                r = {c: None for c in cols}
                r["symbol"] = symbol
                r["date"] = date
                if payload:
                    for k in ("o", "h", "l", "c", "pc", "d", "dp", "v"):
                        r[k] = payload.get(k)
                rows.append(r)
                if rate.sleep_s:
                    time.sleep(rate.sleep_s)
            yield pd.DataFrame(rows, columns=cols)

    return symbols.select("symbol").mapInPandas(work, schema=RAW_QUOTE)
