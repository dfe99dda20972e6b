"""Indicator parity tests — engine windows must equal the reference's pandas
implementations (dashboard/components/indicators.py:1-27) per symbol on a
seeded random walk (SURVEY.md §5 item 4)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from trading_dashboard_spark.operators.indicators import bollinger, ema, rsi, sma
from trading_dashboard_spark.operators.windows import per_key_window


@pytest.fixture(scope="module")
def walk(spark):
    rng = np.random.RandomState(7)
    rows = []
    for sym in ["A", "B"]:
        prices = 100 + np.cumsum(rng.normal(0, 2, size=60)).round(2)
        rows += [(sym, i, float(p)) for i, p in enumerate(prices)]
    # single-row partition edge case
    rows.append(("C", 0, 42.0))
    pdf = pd.DataFrame(rows, columns=["sym", "t", "close"])
    return spark.createDataFrame(pdf), pdf


def _pandas_indicators(pdf):
    """The reference's exact pandas formulas (indicators.py:1-27)."""
    out = {}
    for sym, g in pdf.groupby("sym"):
        g = g.sort_values("t")
        data = pd.DataFrame(index=g.index)
        data["sma"] = g["close"].rolling(window=14).mean()
        data["ema"] = g["close"].ewm(span=14, adjust=False).mean()
        delta = g["close"].diff(1)
        # exact reference expressions (indicators.py:14-15): `where` turns
        # the first row's NaN diff into 0, so RSI first emits at index n-1
        avg_gain = (delta.where(delta > 0, 0)).rolling(window=14).mean()
        avg_loss = (-delta.where(delta < 0, 0)).rolling(window=14).mean()
        rs = avg_gain / avg_loss
        data["rsi"] = 100 - (100 / (1 + rs))
        data["boll_mid"] = g["close"].rolling(window=20).mean()
        std = g["close"].rolling(window=20).std()
        data["boll_up"] = data["boll_mid"] + 2 * std
        data["boll_lo"] = data["boll_mid"] - 2 * std
        data["t"] = g["t"].values
        out[sym] = data
    return out


def test_indicators_match_pandas(spark, walk):
    sdf, pdf = walk
    w = per_key_window("sym", "t")
    c = F.col("close")
    mid, up, lo = bollinger(c, w, 20)
    got = (
        sdf.withColumn("sma", sma(c, w, 14))
        .withColumn("rsi", rsi(c, w, 14))
        .withColumn("boll_mid", mid)
        .withColumn("boll_up", up)
        .withColumn("boll_lo", lo)
    )
    got = ema(got, "close", "sym", "t", span=14, out_col="ema").toPandas()

    expected = _pandas_indicators(pdf)
    for sym, exp in expected.items():
        g = got[got.sym == sym].sort_values("t").reset_index(drop=True)
        e = exp.sort_values("t").reset_index(drop=True)
        for col in ["sma", "ema", "rsi", "boll_mid", "boll_up", "boll_lo"]:
            a, b = g[col].to_numpy(), e[col].to_numpy()
            mask = ~np.isnan(b)
            assert np.allclose(a[mask].astype(float), b[mask], atol=1e-9), (sym, col)
            assert np.isnan(a[~mask].astype(float)).all() or (a[~mask] == None).all()  # noqa: E711


def test_rsi_loss_zero_is_100(spark):
    # monotonically rising -> avg_loss = 0 -> RSI pegged at 100 (indicators.py:16-17)
    df = spark.createDataFrame(
        [("A", i, float(100 + i)) for i in range(20)], ["sym", "t", "close"]
    )
    w = per_key_window("sym", "t")
    out = df.withColumn("rsi", rsi(F.col("close"), w, 14)).orderBy("t").collect()
    assert all(r["rsi"] == 100.0 for r in out[14:])


def test_rsi_flat_is_null(spark):
    df = spark.createDataFrame(
        [("A", i, 50.0) for i in range(20)], ["sym", "t", "close"]
    )
    w = per_key_window("sym", "t")
    out = df.withColumn("rsi", rsi(F.col("close"), w, 14)).orderBy("t").collect()
    assert all(r["rsi"] is None for r in out)


# --- property-based: engine == pandas for ARBITRARY price series ---------
try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _series = st.lists(
        st.floats(
            min_value=0.01, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(prices=_series)
    def test_property_indicators_match_pandas(spark, prices):
        """For any positive price series — spikes, constants, fewer rows
        than the window — SMA/EMA/RSI must equal the reference's pandas
        formulas exactly (NaN positions included)."""
        pdf = pd.DataFrame(
            {"sym": "P", "t": range(len(prices)), "close": [float(p) for p in prices]}
        )
        sdf = spark.createDataFrame(pdf)
        w = per_key_window("sym", "t")
        c = F.col("close")
        got = sdf.withColumn("sma", sma(c, w, 14)).withColumn("rsi", rsi(c, w, 14))
        got = (
            ema(got, "close", "sym", "t", span=14, out_col="ema")
            .orderBy("t")
            .toPandas()
        )

        g = pdf.sort_values("t")
        exp_sma = g["close"].rolling(window=14).mean().to_numpy()
        exp_ema = g["close"].ewm(span=14, adjust=False).mean().to_numpy()
        delta = g["close"].diff(1)
        avg_gain = (delta.where(delta > 0, 0)).rolling(window=14).mean()
        avg_loss = (-delta.where(delta < 0, 0)).rolling(window=14).mean()
        exp_rsi = (100 - 100 / (1 + avg_gain / avg_loss)).to_numpy()

        for col, exp in [("sma", exp_sma), ("ema", exp_ema), ("rsi", exp_rsi)]:
            a = got[col].to_numpy(dtype=float)
            mask = ~np.isnan(exp)
            assert np.allclose(a[mask], exp[mask], rtol=1e-9, atol=1e-9), col
            assert np.isnan(a[~mask]).all(), col

except ImportError:  # pragma: no cover - hypothesis is in the base image
    pass


def test_holt_linear_matches_reference_recurrence(spark):
    """holt_linear equals the plain-python Holt recurrence (with the same
    8dp step anchors) on a known series, including the l1=x1, b1=0
    init."""
    import math

    from trading_dashboard_spark.operators.indicators import holt_linear

    xs = [10.0, 12.0, 11.0, 15.0, 14.5, 16.25]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "key string, t int, x double"
    )
    out = {
        r["t"]: (r["x_level"], r["x_trend"])
        for r in holt_linear(df, "x", ["key"], ["t"]).collect()
    }
    f = 1e8
    l, b = xs[0], 0.0
    assert out[0] == (l, b)
    for t in range(1, len(xs)):
        l_new = math.floor((0.3 * xs[t] + 0.7 * (l + b)) * f + 0.5) / f
        b = math.floor((0.1 * (l_new - l) + 0.9 * b) * f + 0.5) / f
        l = l_new
        assert out[t] == (l, b), t


def test_macd_three_lanes_agree(spark):
    """The three MACD lanes — grouped-map pandas (`macd`), collect_list
    fold (`macd_sql`, query default), segmented-scan windows
    (`macd_window`, the >10⁷-row form) — must agree with pandas ewm to
    float noise, including keys long enough to span multiple exponent
    blocks in the window lane."""
    import numpy as np
    import pandas as pd

    from trading_dashboard_spark.operators.indicators import (
        ema_window, macd, macd_sql, macd_window,
    )

    rng = np.random.default_rng(11)
    rows = []
    for k, n in (("a", 3), ("b", 40), ("c", 700)):
        for i, v in enumerate(rng.normal(100, 15, n)):
            rows.append((k, i, float(v)))
    pdf = pd.DataFrame(rows, columns=["sym", "t", "close"])
    sdf = spark.createDataFrame(pdf)

    g = pdf.groupby("sym")["close"]
    fast = g.transform(lambda s: s.ewm(span=12, adjust=False).mean())
    slow = g.transform(lambda s: s.ewm(span=26, adjust=False).mean())
    pdf["macd"] = fast - slow
    pdf["macd_signal"] = pdf.groupby("sym")["macd"].transform(
        lambda s: s.ewm(span=9, adjust=False).mean()
    )
    pdf["macd_hist"] = pdf["macd"] - pdf["macd_signal"]
    exp = pdf.sort_values(["sym", "t"]).reset_index(drop=True)

    lanes = {
        "grouped_map": macd(sdf, "close", "sym", "t"),
        "fold": macd_sql(sdf, "close", "sym", "t"),
        # block=64 forces the 700-row key through 11 carry blocks
        "window": None,
    }
    w1 = ema_window(sdf, "close", "sym", "t", 12, "_f", block=64)
    w2 = ema_window(w1, "close", "sym", "t", 26, "_s", block=64)
    w2 = w2.withColumn("macd", F.col("_f") - F.col("_s")).drop("_f", "_s")
    w3 = ema_window(w2, "macd", "sym", "t", 9, "macd_signal", block=64)
    lanes["window"] = w3.withColumn(
        "macd_hist", F.col("macd") - F.col("macd_signal")
    )

    for lane, df in lanes.items():
        got = df.toPandas().sort_values(["sym", "t"]).reset_index(drop=True)
        for col in ("macd", "macd_signal", "macd_hist"):
            assert np.allclose(
                got[col].to_numpy(float), exp[col].to_numpy(float), atol=1e-9
            ), (lane, col)


def test_macd_window_default_block_and_plan(spark):
    """`macd_window` with the default 512-row block: correct on a
    >512-row key (multi-block carry), and the per-row lane is pure
    window/join codegen — no Python evaluator in the plan."""
    import numpy as np
    import pandas as pd

    from trading_dashboard_spark.operators.indicators import macd_window

    rng = np.random.default_rng(3)
    n = 1300
    pdf = pd.DataFrame(
        {"sym": "x", "t": range(n), "close": rng.normal(50, 5, n)}
    )
    sdf = spark.createDataFrame(pdf)
    out = macd_window(sdf, "close", "sym", "t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan

    got = out.toPandas().sort_values("t").reset_index(drop=True)
    fast = pdf["close"].ewm(span=12, adjust=False).mean()
    slow = pdf["close"].ewm(span=26, adjust=False).mean()
    macd_e = fast - slow
    sig_e = macd_e.ewm(span=9, adjust=False).mean()
    assert np.allclose(got["macd"].to_numpy(float), macd_e, atol=1e-9)
    assert np.allclose(got["macd_signal"].to_numpy(float), sig_e, atol=1e-9)


def test_macd_auto_lane_switch(spark):
    """r5 verdict #3: `macd_auto` must pick the collect_list fold below
    both thresholds and the segmented-scan window lane above either —
    asserted on the PLAN (fold = sort_array(collect_list...); window
    lane = Window nodes, no collect_list) — and both choices return the
    same values and column set."""
    import numpy as np
    import pandas as pd

    from trading_dashboard_spark.operators.indicators import macd_auto

    rng = np.random.default_rng(7)
    rows = []
    for k, n in (("a", 30), ("b", 45)):
        for i, v in enumerate(rng.normal(100, 10, n)):
            rows.append((k, i, float(v)))
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["sym", "t", "close"])
    )

    # fold lane: one collect_list aggregate, NO window operator
    fold = macd_auto(sdf, "close", "sym", "t")
    plan = fold._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan and "Window" not in plan

    # tiny history threshold forces the segmented-scan window lane
    win = macd_auto(sdf, "close", "sym", "t", max_fold_history=10)
    plan = win._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # tiny total-rows threshold forces it too
    win2 = macd_auto(sdf, "close", "sym", "t", max_fold_rows=10)
    assert "Window" in (
        win2._jdf.queryExecution().executedPlan().toString()
    )

    a = fold.toPandas().sort_values(["sym", "t"]).reset_index(drop=True)
    b = win.toPandas().sort_values(["sym", "t"]).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    for col in ("macd", "macd_signal", "macd_hist"):
        assert np.allclose(
            a[col].to_numpy(float), b[col].to_numpy(float), atol=1e-9
        ), col
