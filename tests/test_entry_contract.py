"""Driver-contract smoke: every registered query runs at sf0.001 and
returns a well-formed DataFrame; oracle coverage is complete for
SQL-expressible queries."""

import pytest

import __spark_entry__ as contract


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"user_id", "pct_change"} <= set(df.columns)


def test_registry_shape():
    qs, oracles = contract.queries(), contract.oracle_sql()
    assert len(qs) >= 45
    assert set(oracles) <= set(qs)
    # rows-only queries are the documented non-SQL-expressible ones
    # (lsh_ann_top3 left this set in r4: plane-literal oracle)
    assert set(qs) - set(oracles) == {
        "ml_next_day_prediction",
        "corpus_sketch_profile",
    }


@pytest.mark.parametrize("name", sorted(contract.queries()))
def test_each_query_runs_smoke(spark, sf_dir, name):
    df = contract.queries()[name](spark, sf_dir)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # executes


def test_fn_segments_granularity():
    """Function-granular staleness: segments isolate each decorated
    function (decorator included, so oracle-SQL edits count), and the
    module-level remainder ignores blank-line churn."""
    from trading_dashboard_spark.queries import _fn_segments

    src_a = (
        "X = 1\n\n"
        "@register('q1', 'SELECT 1')\n"
        "def q1(spark, sf):\n"
        "    return 1\n\n\n"
        "def q2(spark, sf):\n"
        "    return 2\n"
    )
    fns_a, rest_a = _fn_segments(src_a)
    assert set(fns_a) == {"q1", "q2"}
    assert "@register('q1', 'SELECT 1')" in fns_a["q1"]

    # appending a new function leaves q1/q2 segments and remainder alone
    src_b = src_a + "\n\ndef q3(spark, sf):\n    return 3\n"
    fns_b, rest_b = _fn_segments(src_b)
    assert fns_b["q1"] == fns_a["q1"] and fns_b["q2"] == fns_a["q2"]
    assert rest_b == rest_a

    # editing only the oracle SQL in the decorator changes q1's segment
    src_c = src_a.replace("'SELECT 1'", "'SELECT 2'")
    fns_c, rest_c = _fn_segments(src_c)
    assert fns_c["q1"] != fns_a["q1"]
    assert fns_c["q2"] == fns_a["q2"] and rest_c == rest_a

    # editing module-level code changes only the remainder
    src_d = src_a.replace("X = 1", "X = 2")
    fns_d, rest_d = _fn_segments(src_d)
    assert fns_d == fns_a and rest_d != rest_a


def test_rotation_fronts_fresh_then_stale():
    """Never-verified queries lead the registry; queries whose source
    (or dependency closure) changed this round precede untouched proven
    ones, so the driver's bounded window re-attests fresh edits."""
    from trading_dashboard_spark.queries import (
        QUERY_REGISTRY, _verified_rounds,
    )

    names = list(QUERY_REGISTRY)
    verified = set(_verified_rounds())
    n_fresh = sum(1 for n in names if n not in verified)
    # every fresh query sits ahead of every proven one
    assert all(n not in verified for n in names[:n_fresh])
    assert all(n in verified for n in names[n_fresh:])
