"""Query registry core — registration plumbing shared by all query modules.

Each entry pairs a Spark DataFrame program (the engine path) with an ANSI /
DuckDB SQL string (the oracle path). The driver runs both at sf0.01 and
hash-compares row-count + schema + order-insensitive values
(CORRECTNESS_r{N}.json); entries without an oracle get a rows-only check.

Output discipline (hash-comparability):
- every computed column is aliased identically on both sides;
- DATE/TIMESTAMP outputs are rendered as canonical strings (``yyyy-MM-dd``
  / epoch seconds) so engine-side type representation can't skew hashes;
- every double is ``round()``-ed on both sides — both engines sum the same
  IEEE doubles, only accumulation order differs, so rounding absorbs the
  ulp-level divergence;
- top-k queries carry a unique tiebreak column in the sort.

The Spark side deliberately goes through the package operators
(`operators/`, `text/`, `similarity/`) — the registry doubles as the
integration test of the public API.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .functions import portable_round_sql, pround  # noqa: F401
from .io.readers import load_table
from .session import apply_runtime_confs


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn):
        wrapped = _with_confs(fn)
        sql = portable_round_sql(oracle) if oracle else oracle
        QUERY_REGISTRY[name] = QuerySpec(wrapped, sql, tags, doc or (fn.__doc__ or ""))
        return wrapped

    return deco




def _with_confs(fn):
    def inner(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
        apply_runtime_confs(spark)
        return fn(spark, sf_dir, **kw)

    inner.__doc__ = fn.__doc__
    inner.__name__ = getattr(fn, "__name__", "query")
    # the defining module, not this one — the change-aware verification
    # rotation (queries._stale_verified) maps queries to source files
    # through __module__
    inner.__module__ = getattr(fn, "__module__", inner.__module__)
    return inner


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _daily_close(spark, sf_dir) -> DataFrame:
    """Shared shape: events → per-(user, day) OHLC-ish bar.

    The engine's time-series unit, mirroring the reference's daily
    (symbol, trade_date) bars (stock_price_history): close = last value of
    the day, high/low/volume from the same group — one shuffle.
    """
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id"), F.to_date("ts").alias("d")
    ).agg(
        F.max_by("value", "ts").alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count(F.lit(1)).alias("n_events"),
    )


#: DuckDB CTE equivalent of `_daily_close` (shared across oracle strings).
DAILY_SQL = """
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         max_by(value, ts) AS close,
         max(value) AS high, min(value) AS low,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
"""

