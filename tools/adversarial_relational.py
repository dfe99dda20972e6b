#!/usr/bin/env python
"""Adversarial discovery sweep for the relational/window/streaming
families (r9 verdict #6): the documents-only and embeddings-only
batteries found six latent cross-engine divergences in r9; the
events/orders/lineitem families (~120 queries) had never seen an
adversarial corpus. Same method — generate a corpus of the fixture
classes that historically split engines, run EVERY registered query
whose oracle touches only these tables on Spark AND DuckDB, and report
value divergences.

Fixture classes: duplicate timestamps (window ordering ties), single-row
groups, users/customers with all-NULL value columns, empty groups
(customers without orders, orders without lineitems, an empty region),
referential breaks (lineitems of a missing order, an order of a missing
customer), extreme magnitudes (±1e15, 1e-15, −0.0), decimal rounding
boundaries (2.675, 0.005 — the banker's-vs-half-up class), epoch /
far-future dates, leap day, weekend dates, sort-key ties, regex
metacharacters in part names, empty strings in category columns,
malformed / null JSON props, key-space gaps.

Usage: python tools/adversarial_relational.py [query ...]
Writes the corpus to $ADV_DIR (default /tmp/adv_relational) and prints
one line per divergent query plus a summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datetime import datetime, timedelta  # noqa: E402

EPOCH = datetime(1970, 1, 1)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def build_adversarial_relational(out_dir: str) -> None:
    """Deterministic adversarial versions of the eight relational
    tables, one parquet file each (us-timestamps, the testdata form)."""
    import random

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(4242)
    os.makedirs(out_dir, exist_ok=True)

    def write(name, pdf, schema):
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            f"{out_dir}/{name}.parquet",
        )

    # ---- events -----------------------------------------------------
    ev = []
    eid = [0]

    def e(ts, user, etype, value, props):
        # non-contiguous event ids: deterministic gaps exercise the
        # key-gap lanes
        eid[0] += rng.choice([1, 1, 1, 7, 130])
        ev.append((eid[0], ts, user, etype, value, props))

    base = _ts("2024-01-15T12:00:00")
    for i in range(10):  # user 1: ten events at the SAME timestamp
        e(base, 1, "click", float(i + 1), '{"k": %d}' % i)
    for i in range(8):  # user 2: value all NULL
        e(base + timedelta(minutes=i), 2, "view", None, '{"k": 3}')
    e(base, 3, "purchase", 42.0, '{"k": 7}')  # single-event user
    for i in range(6):  # user 4: exact hour boundaries
        e(_ts("2024-01-15T00:00:00") + timedelta(hours=i), 4,
          rng.choice(["click", "view"]), float(i), '{"k": 1}')
    # user 5: extreme magnitudes (guards, NULLIF, overflow paths).
    # Capped at ±1e9 ON PURPOSE: mixed-sign 1e15 in one sum group makes
    # Σ ill-conditioned (|Σ| ≪ max|x|, ulp 0.125) and the two engines'
    # summation ORDERS legitimately differ beyond the 2dp output
    # rounding — measured 358.25 vs 358.36 on the first run of this
    # sweep. Cross-engine sum equality at condition numbers ≥ 1e13 is
    # not a contract any engine offers; 1e9 keeps the extreme-value
    # class while order-drift (~1e-7) stays far inside the rounding.
    for v in (1e9, -1e9, 1e-9, 0.0, -0.0):
        e(base + timedelta(seconds=len(ev)), 5, "purchase", v, '{"k": 9}')
    # user 6: degenerate strings/props
    e(base, 6, "", 1.0, None)
    e(base + timedelta(minutes=1), 6, "click", 2.0, "{")
    e(base + timedelta(minutes=2), 6, "click", 3.0, "{}")
    e(base + timedelta(minutes=3), 6, "click", 4.0, '{"k": null}')
    e(base + timedelta(minutes=4), 6, "click", 5.0, '{"k": -5}')
    for i in range(50):  # user 7: value ties across three days
        e(_ts("2024-01-14T06:00:00") + timedelta(minutes=37 * i), 7,
          rng.choice(["click", "view", "purchase", "signup", "error"]),
          float(i % 5), '{"k": %d}' % (i % 4))
    # epoch-ADJACENT, not exactly epoch: an event at unix time 0 equals
    # the initial watermark and dropDuplicatesWithinWatermark drops it
    # on arrival (measured — see streaming/ingest.dedup_stream's note);
    # that boundary is Spark's, not a query contract this sweep checks
    e(EPOCH + timedelta(seconds=1), 8, "signup", 0.5, '{"k": 0}')
    e(_ts("2099-12-31T23:59:59"), 8, "click", 0.5, '{"k": 0}')  # far future
    for _ in range(4):  # user 9: full duplicates (same ts AND value)
        e(base + timedelta(hours=2), 9, "view", 13.0, '{"k": 2}')
    for u in (10, 11, 12):  # regular-ish
        for i in range(12):
            e(_ts("2024-01-16T09:00:00") + timedelta(minutes=11 * i + u), u,
              rng.choice(["click", "view", "purchase"]),
              round(rng.uniform(0, 100), 2), '{"k": %d}' % rng.randint(0, 99))
    events = pd.DataFrame(
        ev, columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"])
    write("events", events, pa.schema([
        pa.field("event_id", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("user_id", pa.int64()),
        pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()),
        pa.field("props", pa.string()),
    ]))

    # ---- region / nation -------------------------------------------
    write("region", pd.DataFrame(
        {"r_regionkey": [0, 1, 2],
         "r_name": ["REGION_0", "REGION_1", "REGION_EMPTY"]}),
        pa.schema([pa.field("r_regionkey", pa.int32()),
                   pa.field("r_name", pa.string())]))
    write("nation", pd.DataFrame(
        {"n_nationkey": [0, 1, 2, 3, 4],
         "n_name": [f"NATION_{i}" for i in range(5)],
         "n_regionkey": [0, 0, 1, 1, 1]}),  # region 2 empty
        pa.schema([pa.field("n_nationkey", pa.int32()),
                   pa.field("n_name", pa.string()),
                   pa.field("n_regionkey", pa.int32())]))

    # ---- customer ---------------------------------------------------
    cust = pd.DataFrame({
        "c_custkey": list(range(1, 11)),
        "c_name": [f"Customer#{i}" for i in range(1, 11)],
        # nation 3 has no customers
        "c_nationkey": [0, 0, 1, 1, 2, 2, 4, 4, 0, 1],
        "c_acctbal": [100.5, 9999.99, None, 0.0, -450.25, 2.675,
                      1e12, 1e-15, 777.77, 777.77],
        "c_mktsegment": ["MACHINERY", "BUILDING", "AUTOMOBILE",
                         "AUTOMOBILE", "FURNITURE", "HOUSEHOLD",
                         "HOUSEHOLD", "HOUSEHOLD", "BUILDING",
                         "BUILDING"],
    })
    write("customer", cust, pa.schema([
        pa.field("c_custkey", pa.int64()),
        pa.field("c_name", pa.string()),
        pa.field("c_nationkey", pa.int32()),
        pa.field("c_acctbal", pa.float64()),
        pa.field("c_mktsegment", pa.string()),
    ]))

    # ---- orders -----------------------------------------------------
    od = []
    ok = [0]

    def o(cust_k, status, price, date, prio):
        ok[0] += 1
        od.append((ok[0], cust_k, status, price, date, prio))

    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    for i in range(40):  # regular spread over custkeys 2..10 (1 empty)
        o(2 + i % 9, rng.choice(["P", "O", "F"]),
          round(rng.uniform(100, 50000), 2),
          _ts("1995-03-01T00:00:00") + timedelta(days=17 * i),
          prios[i % 5])
    for i in range(50):  # cust 2 skew
        o(2, "O", 1000.0,  # 50 identical totalprice ties
          _ts("1996-06-01T00:00:00") + timedelta(days=i), prios[i % 5])
    o(3, "F", 2.675, _ts("1996-02-29T00:00:00"), "1-URGENT")  # leap day
    o(3, "F", 0.005, _ts("1996-03-02T00:00:00"), "1-URGENT")  # saturday
    o(3, "F", 0.005, _ts("1996-03-03T00:00:00"), "2-HIGH")    # sunday
    o(4, "P", -500.0, _ts("1995-12-31T00:00:00"), "5-LOW")    # negative
    o(4, "P", 1e12, _ts("1995-01-01T00:00:00"), "5-LOW")      # extreme
    o(4, "P", None, _ts("1995-07-04T00:00:00"), "3-MEDIUM")   # NULL price
    o(999, "O", 123.45, _ts("1997-01-01T00:00:00"), "2-HIGH")  # no customer
    orders = pd.DataFrame(od, columns=[
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"])
    write("orders", orders, pa.schema([
        pa.field("o_orderkey", pa.int64()),
        pa.field("o_custkey", pa.int64()),
        pa.field("o_orderstatus", pa.string()),
        pa.field("o_totalprice", pa.float64()),
        pa.field("o_orderdate", pa.timestamp("us")),
        pa.field("o_orderpriority", pa.string()),
    ]))

    # ---- lineitem ---------------------------------------------------
    li = []

    def l(okey, part, supp, ln, qty, price, disc, tax, rf, ls, ship):
        li.append((okey, part, supp, ln, qty, price, disc, tax, rf, ls,
                   ship))

    flags = [("A", "F"), ("N", "O"), ("R", "F"), ("N", "F"), ("R", "O"),
             ("A", "O")]
    for okey in range(1, 41):  # orders 41+ have no lineitems
        for ln in range(1, 1 + (okey % 5)):  # order 40 → 0 items too
            rf, ls = flags[(okey + ln) % 6]
            l(okey, 1 + (okey * ln) % 12, 1 + okey % 5, ln,
              float((okey + ln) % 7),  # includes qty 0
              round(rng.uniform(10, 9000), 2),
              [0.0, 0.05, 0.1, 1.0][ln % 4],  # discount 1.0 edge
              0.08, rf, ls,
              _ts("1995-04-01T00:00:00") + timedelta(days=13 * okey))
    # decimal rounding boundaries + extremes on one order
    l(1, 1, 1, 9, 1.0, 2.675, 0.0, 0.0, "A", "F",
      _ts("1995-04-14T00:00:00"))
    l(1, 2, 1, 10, 1.0, 0.005, 0.0, 0.0, "", "F",
      _ts("1995-04-14T00:00:00"))
    l(1, 3, 2, 11, 1.0, 1e12, 0.5, 0.0, "", "O",
      _ts("1995-04-14T00:00:00"))
    # lineitems of a MISSING order (referential break)
    l(888, 4, 3, 1, 2.0, 100.0, 0.1, 0.08, "N", "O",
      _ts("1995-05-05T00:00:00"))
    l(888, 5, 3, 2, 2.0, 100.0, 0.1, 0.08, "N", "O",
      _ts("1995-05-05T00:00:00"))
    lineitem = pd.DataFrame(li, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"])
    write("lineitem", lineitem, pa.schema([
        pa.field("l_orderkey", pa.int64()),
        pa.field("l_partkey", pa.int64()),
        pa.field("l_suppkey", pa.int64()),
        pa.field("l_linenumber", pa.int32()),
        pa.field("l_quantity", pa.float64()),
        pa.field("l_extendedprice", pa.float64()),
        pa.field("l_discount", pa.float64()),
        pa.field("l_tax", pa.float64()),
        pa.field("l_returnflag", pa.string()),
        pa.field("l_linestatus", pa.string()),
        pa.field("l_shipdate", pa.timestamp("us")),
    ]))

    # ---- part / supplier --------------------------------------------
    write("part", pd.DataFrame({
        "p_partkey": list(range(1, 13)),
        "p_name": ["red widget", "red.widget*", " padded name ", "",
                   "blue bolt", "blue bolt", "green ring (x)",
                   "UPPER CASE", "small ring", "tiny gear",
                   "plain nut", "odd [bracket]"],
        "p_brand": [f"Brand#{1 + i % 4}" for i in range(12)],
        "p_type": ["ECONOMY", "SMALL", "ECONOMY", "STANDARD", "SMALL",
                   "SMALL", "ECONOMY", "STANDARD", "ECONOMY", "SMALL",
                   "STANDARD", "ECONOMY"],
        "p_size": [0, -1, 5, 5, 7, 7, 50, 3, 1, 2, 9, 4],
        "p_retailprice": [0.0, 2.675, 99.99, 99.99, 1e9, 1e-9, 450.0,
                          450.0, 10.5, 10.5, 10.5, None],
    }), pa.schema([
        pa.field("p_partkey", pa.int64()),
        pa.field("p_name", pa.string()),
        pa.field("p_brand", pa.string()),
        pa.field("p_type", pa.string()),
        pa.field("p_size", pa.int32()),
        pa.field("p_retailprice", pa.float64()),
    ]))
    write("supplier", pd.DataFrame({
        "s_suppkey": [1, 2, 3, 4, 5],
        "s_name": [f"Supplier#{i}" for i in range(1, 6)],
        "s_nationkey": [0, 1, 2, 4, 4],
        "s_acctbal": [500.0, None, -20.0, 0.0, 500.0],
    }), pa.schema([
        pa.field("s_suppkey", pa.int64()),
        pa.field("s_name", pa.string()),
        pa.field("s_nationkey", pa.int32()),
        pa.field("s_acctbal", pa.float64()),
    ]))


RELATIONAL_TABLES = (
    "events", "orders", "lineitem", "customer", "supplier", "part",
    "nation", "region",
)


def qualifying_queries(registry) -> list[str]:
    """Every registered query whose oracle references at least one
    relational table and neither documents nor embeddings (those
    families have their own committed batteries)."""
    names = []
    for name, ent in registry.items():
        o = ent.oracle
        if not o:
            continue
        if "documents" in o or "embeddings" in o:
            continue
        if any(t in o for t in RELATIONAL_TABLES):
            names.append(name)
    return sorted(names)


def main() -> None:
    import duckdb

    sys.path.insert(0, "/root/repo")
    from trading_dashboard_spark.queries import QUERY_REGISTRY
    from trading_dashboard_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check_oracle import normalize  # noqa: E402

    out = os.environ.get("ADV_DIR", "/tmp/adv_relational")
    build_adversarial_relational(out)
    names = sys.argv[1:] or qualifying_queries(QUERY_REGISTRY)

    spark = get_spark("adv_relational",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in RELATIONAL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet'"
        )

    agree, diverge, errors = [], [], []
    for name in names:
        ent = QUERY_REGISTRY[name]
        try:
            got = normalize(ent.fn(spark, out).toPandas())
            exp = normalize(con.execute(ent.oracle).df())
            if list(got.columns) != list(exp.columns):
                diverge.append((name, "columns",
                                list(got.columns), list(exp.columns)))
            elif len(got) != len(exp):
                diverge.append((name, "rowcount", len(got), len(exp)))
            elif not got.equals(exp):
                neq = (got != exp) & ~(got.isna() & exp.isna())
                cols = [c for c in got.columns if neq[c].any()]
                diverge.append((name, "values", cols,
                                f"{int(neq.any(axis=1).sum())} rows"))
            else:
                agree.append(name)
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors.append((name, f"{type(exc).__name__}: {exc}"[:300]))
        status = ("ok" if name in agree else "DIVERGE"
                  if any(d[0] == name for d in diverge) else "ERROR")
        print(f"{status:8s} {name}", flush=True)

    print(f"\n{len(agree)} agree, {len(diverge)} diverge, "
          f"{len(errors)} error")
    for d in diverge:
        print("DIVERGE", *d)
    for name, msg in errors:
        print("ERROR", name, msg)


if __name__ == "__main__":
    main()
