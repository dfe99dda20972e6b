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


def lit_doubles(values) -> Column:
    """``array<double>`` literal built as ONE parsed SQL expression.

    ``F.array(*[F.lit(x) for x in values])`` costs a py4j round trip per
    element (~1-2 ms each under load); the ANN literal payloads — probe
    vectors (64 doubles), PQ codebooks (8×16×8), ADC tables (8×16) —
    rebuilt on every query invocation made plan CONSTRUCTION ~half the
    measured ivfpq query time at ×10. A single ``F.expr`` string is one
    round trip; ``repr`` emits the shortest digits that round-trip to
    the exact same IEEE double, and the ``D`` suffix forces DoubleType
    (a bare decimal literal parses as DECIMAL in Spark SQL)."""
    return F.expr(
        "array(" + ",".join(f"{float(v)!r}D" for v in values) + ")"
    )


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal as one parsed expression — the
    nested form of :func:`lit_doubles` for codebook / lookup tables."""
    inner = ",".join(
        "array(" + ",".join(f"{float(v)!r}D" for v in row) + ")"
        for row in rows
    )
    return F.expr(f"array({inner})")


def pround(c: Column | str, n: int) -> Column:
    """Portable rounding: ``floor(x·10ⁿ + 0.5) / 10ⁿ`` from primitive ops.

    Negative ``n`` rounds to tens/hundreds/... via the division form
    ``floor(x / 10⁻ⁿ + 0.5) · 10⁻ⁿ`` — multiplying by the inexact double
    0.1 and dividing back would not round-trip bit-for-bit.

    MAGNITUDE GUARD: Spark's ``floor`` returns LONG and silently clamps
    at ±2⁶³ (the adversarial events battery caught a 7.05e22 sum of
    squares collapsing to 9.223372e14 at 4dp), while DuckDB's ``floor``
    stays a double, where above 2⁵³ every value is an integer and floor
    is the identity. When the scaled value leaves the long range, this
    returns the SAME double arithmetic DuckDB's form reduces to —
    ``(x·f + 0.5) / f`` with no floor — so the lanes stay bit-equal on
    both sides of the boundary (below 2⁶³ the double add + long floor
    already match DuckDB's double floor exactly; rounding at these
    magnitudes is vacuous anyway, ulp ≥ 1024)."""
    if isinstance(c, str):
        c = F.col(c)
    lim = F.lit(9.223372036854776e18)  # 2^63
    if n < 0:
        p = float(10 ** (-n))
        y = c / F.lit(p) + F.lit(0.5)
        return F.when(F.abs(y) < lim, F.floor(y) * F.lit(p)).otherwise(
            y * F.lit(p)
        )
    f = float(10**n)
    y = c * F.lit(f) + F.lit(0.5)
    return F.when(F.abs(y) < lim, F.floor(y) / F.lit(f)).otherwise(
        y / F.lit(f)
    )


def _find_unquoted(sql: str, low: str, needle: str, start: int) -> int:
    """Index of the next ``needle`` in ``low`` from ``start`` that is not
    inside a single-quoted SQL string literal ('' escapes); -1 if none."""
    i, in_q = start, False
    while i < len(sql):
        ch = sql[i]
        if in_q:
            if ch == "'":
                if i + 1 < len(sql) and sql[i + 1] == "'":
                    i += 2
                    continue
                in_q = False
        elif ch == "'":
            in_q = True
        elif low.startswith(needle, i):
            return i
        i += 1
    return -1


def portable_round_sql(sql: str) -> str:
    """Rewrite every two-argument ``round(expr, n)`` in a SQL string to the
    portable ``floor((expr) * 10ⁿ + 0.5) / 10ⁿ`` form (recursive,
    paren- and quote-aware), so oracle SQL can be written with readable
    ``round()`` calls.

    Single-argument ``round(expr)`` passes through unchanged (nested
    rounds inside it are still rewritten); ``round(`` occurrences inside
    string literals are never touched; a non-integer-literal digit count
    raises with the offending snippet rather than garbling the SQL."""
    out: list[str] = []
    i = 0
    low = sql.lower()
    while True:
        j = _find_unquoted(sql, low, "round(", i)
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
        in_q = False
        while depth > 0:
            ch = sql[k]
            if in_q:
                if ch == "'":
                    if k + 1 < len(sql) and sql[k + 1] == "'":
                        k += 2
                        continue
                    in_q = False
            elif ch == "'":
                in_q = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                last_comma = k
            k += 1
        if last_comma == -1:
            inner = portable_round_sql(sql[j + 6 : k - 1])
            out.append(f"round({inner})")
            i = k
            continue
        expr = portable_round_sql(sql[j + 6 : last_comma])
        digits = sql[last_comma + 1 : k - 1].strip()
        try:
            n = int(digits)
        except ValueError:
            raise ValueError(
                f"portable_round_sql: round() digit count must be an integer "
                f"literal, got {digits!r} in: {sql[j:k]!r}"
            ) from None
        # The whole rewrite is parenthesized as ONE unit: emitted bare,
        # `a / round(b, n)` would expand to `a / floor(...) / f` and
        # left-associative division applies the trailing /f to the whole
        # ratio — silently dividing the result by 10^n.
        if n < 0:
            # division form, mirroring pround: 10**n as a Python float
            # would interpolate garbage SQL like "0.1.0"
            p = 10 ** (-n)
            out.append(f"(floor(({expr}) / {p}.0 + 0.5) * {p}.0)")
        else:
            f = 10**n
            out.append(f"(floor(({expr}) * {f}.0 + 0.5) / {f}.0)")
        i = k
    return "".join(out)
