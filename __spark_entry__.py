"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``trading_dashboard_spark.queries`` — one entry
per operator family from SURVEY.md §2 — and this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.2): the
    'top gainers' pipeline — scan → daily bars → window lag → latest-per-
    key → broadcast dim join → pct-change → top-k."""
    from trading_dashboard_spark.queries import QUERY_REGISTRY

    return QUERY_REGISTRY["top_gainers"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from trading_dashboard_spark.queries import QUERY_REGISTRY

    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for genuinely
    non-SQL-expressible operators → rows-only check)."""
    from trading_dashboard_spark.queries import QUERY_REGISTRY

    return {
        name: spec.oracle
        for name, spec in QUERY_REGISTRY.items()
        if spec.oracle is not None
    }
