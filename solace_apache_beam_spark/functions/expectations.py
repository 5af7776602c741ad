"""Declarative data-quality expectations (the Great-Expectations-style
validation gate a training pipeline runs before trusting an input
drop).

An expectation is (name, violation predicate Column); the report
aggregates every rule in ONE pass over the table — each rule is a
conditional count inside the same aggregation, so N rules cost one
scan + one tiny shuffle regardless of N. Uniqueness rules need their
own keyed aggregation (duplicate detection is inherently a groupBy),
still one scan each.

All outputs are integer counts + booleans — engine-exact."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(
    df: DataFrame,
    rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """``rules`` maps rule name -> VIOLATION predicate (true = row
    fails). ``unique_keys`` maps rule name -> key columns that must be
    unique (violations = rows beyond the first per duplicate key).
    Output: (rule, n_rows, n_violations, passed) — one row per rule."""
    if not rules and not unique_keys:
        raise ValueError("expectation_report needs at least one rule")
    # SUM over zero rows is NULL in SQL: without the coalesce an EMPTY
    # input drop (exactly what a validation gate must handle) reports
    # NULL n_violations and NULL passed — neither accepted nor
    # rejected by any boolean filter. Zero rows violate nothing.
    agg_cols = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(f"v_{i}")
        for i, pred in enumerate(rules.values())
    ]
    row = df.agg(*agg_cols)
    reports = [
        row.select(
            F.lit(name).alias("rule"),
            F.col("n_rows"),
            F.col(f"v_{i}").alias("n_violations"),
            (F.col(f"v_{i}") == 0).alias("passed"),
        )
        for i, name in enumerate(rules)
    ]
    for name, keys in (unique_keys or {}).items():
        dup = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
        reports.append(
            dup.agg(
                F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_rows"),
                F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            ).select(
                F.lit(name).alias("rule"),
                "n_rows",
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    return reduce(lambda a, b: a.union(b), reports)
