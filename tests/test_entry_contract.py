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
    assert set(qs) - set(oracles) == {
        "lsh_ann_top3",
        "ml_next_day_prediction",
        "corpus_sketch_profile",
    }


@pytest.mark.parametrize("name", sorted(contract.queries()))
def test_each_query_runs_smoke(spark, sf_dir, name):
    df = contract.queries()[name](spark, sf_dir)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # executes
