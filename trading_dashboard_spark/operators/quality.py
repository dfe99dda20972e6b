"""Data-quality expectations — the pipeline admission gate.

The reference trusts its sources; a 100 TB ingest can't (the Delta
constraints / Great Expectations / dbt-test niche). ``expect`` evaluates a
set of named boolean rules over a table in ONE aggregate pass — every rule
becomes a conditional count inside the same partial aggregation, so a
50-rule suite costs exactly one scan and one single-row shuffle regardless
of table size — then unpivots to one row per rule.

A rule PASSES where its expression evaluates TRUE; NULL (three-valued SQL
surprise) counts as a violation — ``col > 0`` on a NULL is a data problem,
not a pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def expect(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level expectations; returns one row per rule:
    ``rule | n_rows | n_violations | violation_rate``."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(cond, 0).otherwise(1)).alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"),
    ).select(
        "rule",
        "n_rows",
        F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
        F.round(
            F.coalesce(F.col("n_violations"), F.lit(0))
            / F.when(F.col("n_rows") > 0, F.col("n_rows")).cast("double"),
            6,
        ).alias("violation_rate"),
    )
