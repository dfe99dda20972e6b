"""Window/as-of operator tests — gap handling, strict vs non-strict ties,
pandas merge_asof parity (SURVEY.md §7.4 hard parts)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from trading_dashboard_spark.operators.windows import (
    as_of_join,
    per_key_window,
    prev_available,
    rolling,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_prev_available_handles_gaps(spark):
    # history with a gap: prev value must be last *available*, not calendar-prev
    df = spark.createDataFrame(
        [("A", dt.date(2024, 1, 1), 1.0), ("A", dt.date(2024, 1, 2), 2.0),
         ("A", dt.date(2024, 1, 10), 3.0)],
        ["sym", "d", "v"],
    )
    w = per_key_window("sym", "d")
    out = df.withColumn("prev", prev_available(F.col("v"), w)).orderBy("d").collect()
    assert [r["prev"] for r in out] == [None, 1.0, 2.0]


def test_rolling_min_periods_vs_partial(spark):
    df = spark.createDataFrame(
        [("A", i, float(i)) for i in range(1, 6)], ["sym", "t", "v"]
    )
    w = per_key_window("sym", "t")
    out = (
        df.withColumn("partial", rolling(F.col("v"), w, 3))
        .withColumn("strict", rolling(F.col("v"), w, 3, min_periods=3))
        .orderBy("t")
        .collect()
    )
    assert [r["partial"] for r in out] == [1.0, 1.5, 2.0, 3.0, 4.0]
    assert [r["strict"] for r in out] == [None, None, 2.0, 3.0, 4.0]


def test_as_of_join_matches_pandas_merge_asof(spark, sf_dir):
    from trading_dashboard_spark.io.readers import load_table

    ev = load_table(spark, "events", sf_dir)
    probes = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    sources = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value", "event_id")
    out = as_of_join(
        probes, sources, "user_id", "user_id", "ts", "ts", ["value"],
        right_tiebreak="event_id",
    ).toPandas()

    lp = probes.toPandas().sort_values("ts")
    rp = sources.toPandas().sort_values(["ts", "event_id"]).rename(columns={"event_id": "src_id"})
    expected = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward", allow_exact_matches=True
    )
    merged = out.merge(
        expected.rename(columns={"value": "value_exp"}), on="event_id"
    )
    assert len(merged) == len(out) == len(lp)
    a = merged["asof_value"].fillna(-1).to_numpy()
    b = merged["value_exp"].fillna(-1).to_numpy()
    assert (a == b).all()


def test_as_of_join_strict_vs_nonstrict_ties(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"))], ["k", "t"])
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 99.0), (1, _ts("2023-12-31T00:00:00"), 1.0)],
        ["k", "t", "v"],
    )
    non_strict = as_of_join(left, right, "k", "k", "t", "t", ["v"]).collect()
    strict = as_of_join(left, right, "k", "k", "t", "t", ["v"], strict=True).collect()
    assert non_strict[0]["asof_v"] == 99.0  # same-instant row visible
    assert strict[0]["asof_v"] == 1.0  # hidden when strict


def test_as_of_join_no_match_yields_null(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"))], ["k", "t"])
    right = spark.createDataFrame(
        [(1, _ts("2024-06-01T00:00:00"), 5.0)], ["k", "t", "v"]
    )
    out = as_of_join(left, right, "k", "k", "t", "t", ["v"]).collect()
    assert out[0]["asof_v"] is None


def test_bucketed_range_join_matches_naive(spark):
    """Property check vs the naive theta-join: long intervals (spanning
    many buckets), inclusive boundaries, empty intervals, overlap."""
    import datetime as dt

    from pyspark.sql import functions as F

    from trading_dashboard_spark.operators.temporal import bucketed_range_join

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=i)) for i in range(0, 72, 1)], ["pid", "ts"]
    )
    ivs = spark.createDataFrame(
        [
            (1, base, base + dt.timedelta(hours=40)),          # spans many buckets
            (2, base + dt.timedelta(hours=5), base + dt.timedelta(hours=5)),  # point interval
            (3, base + dt.timedelta(hours=30), base + dt.timedelta(hours=50)),  # overlap
            (4, base + dt.timedelta(hours=100), base + dt.timedelta(hours=110)),  # empty
        ],
        ["iid", "w_start", "w_end"],
    )
    got = {
        (r.iid, r.pid)
        for r in bucketed_range_join(pts, ivs, "ts", "w_start", "w_end", 7200).collect()
    }
    naive = {
        (r.iid, r.pid)
        for r in pts.crossJoin(ivs)
        .filter(F.col("ts").between(F.col("w_start"), F.col("w_end")))
        .collect()
    }
    assert got == naive and len(got) > 0


def test_asof_join_forward_and_tolerance_match_pandas(spark):
    """Forward direction and tolerance must reproduce pandas
    merge_asof semantics on a hand-checkable series (plus the
    deterministic tiebreak pandas doesn't define)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from trading_dashboard_spark.operators.windows import as_of_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"),
         (2, "2024-01-01 10:30:00")],
        "k long, t string",
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 9.0), (1, "2024-01-01 10:00:00", 10.0),
         (1, "2024-01-01 11:30:00", 11.5), (2, "2024-01-01 12:00:00", 12.0)],
        "k long, t string, v double",
    ).withColumn("t", F.to_timestamp("t"))

    def run(**kw):
        out = as_of_join(left, right, "k", "k", "t", "t", ["v"], **kw)
        return {(r["k"], str(r["t"])): r["asof_v"] for r in out.collect()}

    # backward, no tolerance: at-or-before (10:00 matches itself)
    assert run() == {
        (1, "2024-01-01 10:00:00"): 10.0,
        (1, "2024-01-01 12:00:00"): 11.5,
        (2, "2024-01-01 10:30:00"): None,
    }
    # backward + 20min tolerance: 12:00's match (11:30) is 30min stale -> null
    assert run(tolerance_sec=1200.0) == {
        (1, "2024-01-01 10:00:00"): 10.0,
        (1, "2024-01-01 12:00:00"): None,
        (2, "2024-01-01 10:30:00"): None,
    }
    # forward: earliest at-or-after
    assert run(direction="forward") == {
        (1, "2024-01-01 10:00:00"): 10.0,
        (1, "2024-01-01 12:00:00"): None,
        (2, "2024-01-01 10:30:00"): 12.0,
    }
    # forward strict: equal timestamp hidden
    assert run(direction="forward", strict=True)[(1, "2024-01-01 10:00:00")] == 11.5
    # parity with pandas merge_asof on the same frames (backward+forward)
    lp = left.toPandas().sort_values("t")
    rp = right.toPandas().sort_values("t")
    for direction in ("backward", "forward"):
        pd_out = pd.merge_asof(lp, rp, on="t", by="k", direction=direction)
        got = run(direction=direction)
        for _, row in pd_out.iterrows():
            want = None if pd.isna(row["v"]) else row["v"]
            assert got[(row["k"], str(row["t"]))] == want, (direction, row)


def test_asof_forward_tiebreak_smallest_wins(spark):
    """Two right rows at the identical timestamp: forward picks the
    smallest tiebreak (ORDER BY t ASC, tb ASC LIMIT 1), backward the
    greatest."""
    from pyspark.sql import functions as F
    from trading_dashboard_spark.operators.windows import as_of_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, t string"
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100, 1.0), (1, "2024-01-01 10:00:00", 200, 2.0)],
        "k long, t string, eid long, v double",
    ).withColumn("t", F.to_timestamp("t"))
    fwd = as_of_join(left, right, "k", "k", "t", "t", ["v"],
                     right_tiebreak="eid", direction="forward").collect()
    bwd = as_of_join(left, right, "k", "k", "t", "t", ["v"],
                     right_tiebreak="eid").collect()
    assert fwd[0]["asof_v"] == 1.0
    assert bwd[0]["asof_v"] == 2.0
