"""Data-quality expectation checks — the validation gate an ingest
pipeline runs before publishing a table.

``expect`` evaluates named boolean predicates ("violation when true")
in ONE scan with conditional counts (count_if per check) — no per-check
jobs, no shuffle beyond the single global aggregate. The same shape
works streaming via ``df.observe`` (pass the columns to observe) since
every check is an aggregate expression."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One row: total row count + violation count per named check.
    ``checks`` maps check name -> Column that is TRUE for violating
    rows."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count_if(cond).cast("long").alias(f"viol_{name}")
            for name, cond in sorted(checks.items())
        ],
    )


def expect_or_fail(df: DataFrame, checks: dict[str, Column]) -> None:
    """Raise if any check has violations (the CI-gate form)."""
    row = expect(df, checks).collect()[0]
    bad = {k: v for k, v in row.asDict().items() if k.startswith("viol_") and v}
    if bad:
        raise AssertionError(f"data-quality violations: {bad}")
