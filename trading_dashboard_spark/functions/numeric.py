"""Numeric scalar functions shared engine-wide.

`pround` exists because engine-native ``round()`` implementations disagree
on exact .5 ties (Spark routes doubles through BigDecimal.valueOf's
shortest-string; DuckDB through C-library rounding) — and ties are common
in this engine's outputs, because averages over power-of-2-sized window
frames of 2-decimal inputs terminate exactly on boundary digits. Building
the rounding out of floor/multiply/add — each IEEE-deterministic and
identical in every engine — keeps engine and oracle bit-for-bit equal.
Semantics: half-up toward +∞.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def pround(c: Column | str, n: int) -> Column:
    """Portable rounding: ``floor(x·10ⁿ + 0.5) / 10ⁿ`` from primitive ops."""
    if isinstance(c, str):
        c = F.col(c)
    f = float(10**n)
    return F.floor(c * F.lit(f) + F.lit(0.5)) / F.lit(f)


def portable_round_sql(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in a SQL string to the portable
    ``floor((expr) * 10ⁿ + 0.5) / 10ⁿ`` form (recursive, paren-aware), so
    oracle SQL can be written with readable ``round()`` calls."""
    out: list[str] = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("round(", i)
        if j == -1:
            out.append(sql[i:])
            break
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i : j + 6])
            i = j + 6
            continue
        out.append(sql[i:j])
        k = j + 6
        depth = 1
        last_comma = -1
        while depth > 0:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                last_comma = k
            k += 1
        expr = portable_round_sql(sql[j + 6 : last_comma])
        n = int(sql[last_comma + 1 : k - 1].strip())
        f = 10**n
        out.append(f"floor(({expr}) * {f}.0 + 0.5) / {f}.0")
        i = k
    return "".join(out)
