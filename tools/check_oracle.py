#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` on Spark and its oracle
SQL on DuckDB (same parquet tables), then compares row-count, column
names/order-insensitive values. Exits non-zero on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(np.float64)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            sa, sb = a[c], b[c]
            if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
                both_nan = sa.isna() & sb.isna()
                eq = (sa == sb) | both_nan
                if not eq.all():
                    diffs = (sa - sb).abs()
                    problems.append(
                        f"col {c!r}: {int((~eq).sum())} value diffs, max abs diff {diffs.max()}"
                    )
            else:
                sa2 = sa.where(~sa.isna(), None)
                sb2 = sb.where(~sb.isna(), None)
                neq = ~(sa2.eq(sb2) | (sa.isna() & sb.isna()))
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(
                        f"col {c!r}: {int(neq.sum())} diffs, first at row {i}: "
                        f"spark={sa2.iloc[i]!r} duck={sb2.iloc[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as mod
    from trading_dashboard_spark.session import get_spark

    spark = get_spark("check_oracle", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = mod.queries(), mod.oracle_sql()
    failed = []
    import time

    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name} ({len(spark_pdf)} vs {len(duck_pdf)} rows):")
            for p in problems:
                print(f"     - {p}")
            failed.append(name)
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{ran - len(failed)}/{ran} queries pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
