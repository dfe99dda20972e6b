#!/usr/bin/env python
"""A/B the tie-safe close-contract order key: string vs decimal(38,0).

r10 verdict #6: the `event_order_key` string form costs ~0.15 s/query at
sf0.1 (priced by the r10 battery A/B); the suggested packed-LONG form
overflows int64 (epoch micros ~51 bits + id bits > 63), so the nearest
packed-numeric candidate is DECIMAL(38,0) = micros·10¹⁹ + id — exact
over the whole non-negative int64 id domain and ordering-identical to
the string. This script times the close-contract headline subset under
both forms, in BOTH run orders (fresh JVM per form, min-of-3 per query
— bench.py's protocol), and prints one JSON line per order.

Usage: python tools/ab_order_key.py
Adopt only if decimal wins both orders beyond noise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: headline queries whose plans run through `_daily_close` /
#: `event_order_key` (the max_by close contract)
QUERIES = [
    "top_gainers", "rsi_indicator", "bollinger_bands", "macd_indicator",
    "ma_crossover_signals", "daily_pct_change", "three_day_trends",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from trading_dashboard_spark.queries import QUERY_REGISTRY
from trading_dashboard_spark.session import get_spark

spark = get_spark("ab_order_key",
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.range(1_000_000).selectExpr("sum(id)").collect()
from trading_dashboard_spark.io.readers import load_table
for t in ("events", "customer", "nation"):
    load_table(spark, t, {sf_dir!r}).count()
out = {{}}
for name in {queries!r}:
    spec = QUERY_REGISTRY[name]
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        spec.fn(spark, {sf_dir!r}).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out), flush=True)
"""


def run_form(form: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_ORDER_KEY=form)
    code = _CHILD.format(repo=REPO, sf_dir=sf_dir, queries=QUERIES)
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=900,
    )
    for line in res.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no result for {form}: {res.stderr[-2000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for order in (("string", "decimal"), ("decimal", "string")):
        got = {form: run_form(form, sf_dir) for form in order}
        totals = {f: round(sum(v.values()), 3) for f, v in got.items()}
        print(json.dumps(
            {"order": list(order), "per_query": got, "totals": totals}
        ), flush=True)


if __name__ == "__main__":
    main()
