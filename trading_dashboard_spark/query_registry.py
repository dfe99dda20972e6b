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

import os
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


#: key form for `event_order_key`: "decimal" (canonical since r11) or
#: "string" (the r10 original). A packed LONG is impossible: epoch
#: micros need ~51 bits and any useful id range ≥20 more — over
#: int64's 63 — so the packed-numeric form is DECIMAL(38,0):
#: micros · 10¹⁹ + id, exact for the full non-negative int64 id range
#: (≤ ~1.8e34 + 9.2e18, 35 digits), identical TOTAL ORDER to the
#: string (the key is only ever a max_by/min_by ordering argument —
#: its value never reaches output, so the oracle keeps the VARCHAR
#: twin). Adopted after tools/ab_order_key.py won BOTH run orders at
#: sf0.1 (6.40 vs 11.81 s and 6.02 vs 7.09 s over the 7 close-contract
#: headline queries — a 16-byte Decimal128 compare beats a 40-char
#: UTF8String compare in every hash-aggregate probe); recorded in
#: BENCHMARKS.md.
_ORDER_KEY_FORM = os.environ.get("SPARK_GRAFT_ORDER_KEY", "decimal")


def event_order_key(ts_col: str = "ts", id_col: str = "event_id"):
    """The canonical TOTAL order over events — microsecond epoch ‖
    event_id, packed into one sortable key. Duplicate
    timestamps are legal event data (the r10 adversarial relational
    battery planted 10 same-ts events and split the engines on every
    `max_by(value, ts)` lane), so every "last/first value" aggregate
    must order by a UNIQUE key both engines share. Non-negative domains
    by construction (events ≥ epoch; ids ≥ 0), so lexicographic string
    order == numeric order. (`_ORDER_KEY_FORM` selects the DECIMAL(38,0)
    packed form — canonical since the r11 A/B — or the original string;
    same total order either way.)"""
    if _ORDER_KEY_FORM == "decimal":
        # 10¹⁹ exceeds int64, so the literal must be born DECIMAL
        # (F.lit(10**19) dies in Python→Java long marshalling)
        return (
            F.unix_micros(F.col(ts_col)).cast("decimal(19,0)")
            * F.expr("CAST('10000000000000000000' AS DECIMAL(20,0))")
            + F.col(id_col).cast("decimal(19,0)")
        )
    return F.concat(
        F.lpad(F.unix_micros(F.col(ts_col)).cast("string"), 20, "0"),
        F.lpad(F.col(id_col).cast("string"), 20, "0"),
    )


#: SQL twin of `event_order_key` (DuckDB: epoch_us; max_by has no
#: struct-key overload, so the composite key is this VARCHAR).
EVENT_ORDER_KEY_SQL = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 20, '0')"
)


def day_scoped_order_key(ts_col: str = "ts", id_col: str = "event_id"):
    """`event_order_key` specialised to aggregates GROUPED BY
    ``(…, to_date(ts))`` — the daily-bar close/open contract sites.

    Within one UTC day, (micros-since-UTC-midnight, event_id) orders
    exactly like (micros-since-epoch, event_id): every row of a
    ``to_date(ts)`` group shares the same floor-day, so subtracting the
    (common) day start is order-preserving. That drops the key from 51+
    bits to 37, and 37 + 26 fits a plain LONG — `pmod(µs, 86 400 000 000)
    · 2²⁶ + event_id` ≤ 5.8e18 < 2⁶³ — so the hash aggregate compares
    one int64 where the general key needs Decimal(38) arithmetic
    (measured: the 4-function daily-close aggregate 0.41 → 0.28 s at
    sf0.1). Only the ARGMAX is consumed, never the key value, so the
    oracle keeps the general VARCHAR twin unchanged. Valid iff
    0 ≤ event_id < 2²⁶ (~67M — covers every sf/replica tier through
    ×300); outside that domain the minor term could carry into the
    micros term, so the bounds raise LOUDLY (the longest_wins_key
    discipline). ONLY safe under a day-aligned groupBy — anything else
    wraps at UTC midnight; use `event_order_key` there."""
    micros_in_day = F.pmod(
        F.unix_micros(F.col(ts_col)), F.lit(86_400_000_000)
    )
    in_domain = (F.col(id_col) >= 0) & (F.col(id_col) < F.lit(1 << 26))
    packed = micros_in_day * F.lit(1 << 26) + F.col(id_col)
    return F.when(in_domain, packed).otherwise(
        F.raise_error(
            F.lit("day_scoped_order_key: event_id outside [0, 2^26) — "
                  "the packed day-local key would mis-order; use "
                  "event_order_key (decimal form) for this domain")
        ).cast("long")
    )


def _daily_close(spark, sf_dir) -> DataFrame:
    """Shared shape: events → per-(user, day) OHLC-ish bar.

    The engine's time-series unit, mirroring the reference's daily
    (symbol, trade_date) bars (stock_price_history): close = last
    NON-NULL value of the day, high/low/volume from the same group —
    one shuffle. Two cross-engine subtleties pinned by the r10
    adversarial relational battery: the close orders by the UNIQUE
    (ts, event_id) key (`event_order_key` — plain ts leaves duplicate
    timestamps engine-ordered), and the NULL rule is stated on both
    lanes (DuckDB's max_by skips NULL args natively; Spark's returns
    the arg at the max key even when NULL, so the engine lane nulls
    the KEY for NULL values to match — a valueless tick is not a
    price)."""
    ev = _t(spark, sf_dir, "events")
    # day-aligned groupBy ⇒ the day-scoped packed-long key is exact
    # (see day_scoped_order_key — same argmax, one int64 compare)
    key = day_scoped_order_key()
    return ev.groupBy(
        F.col("user_id"), F.to_date("ts").alias("d")
    ).agg(
        F.max_by(
            "value", F.when(F.col("value").isNotNull(), key)
        ).alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count(F.lit(1)).alias("n_events"),
    )


#: DuckDB CTE equivalent of `_daily_close` (shared across oracle strings).
DAILY_SQL = f"""
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         max_by(value, {EVENT_ORDER_KEY_SQL}) AS close,
         max(value) AS high, min(value) AS low,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
"""

