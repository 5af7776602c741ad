"""Relational operators beyond the reference's surface (SURVEY.md §2.8).

The reference has no joins, sort/limit, set ops, rollup/cube, or analytic
window functions — they "become trivially available" on Spark and the
engine ships them as first-class, scale-aware operators:

- dimension joins broadcast the small side explicitly (no shuffle of the
  fact table on dimension keys),
- top-k per group is window row_number + filter (one shuffle, no global
  sort),
- money aggregates are computed over DECIMAL casts so results are
  order-independent (double sums would vary with partitioning — both a
  correctness-gate and a reproducibility property at 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dec_sum(col: Column, scale_type: str = "decimal(28,10)") -> Column:
    """Order-independent sum of a double expression: cast each term to
    decimal first. Identical bit-for-bit across partitionings and in the
    DuckDB oracle."""
    return F.sum(col.cast(scale_type))


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Fact-to-dimension join with an explicit broadcast hint: at 100 TB
    the fact side never shuffles for a dimension lookup."""
    return fact.join(F.broadcast(dim), on, how)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number — single hash shuffle on the
    group keys, per-partition heap sort; no global orderBy. Explicit
    tiebreak keeps the pick deterministic (dropDuplicates-style arbitrary
    choice would not be oracle-checkable)."""
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    for t in tiebreak_cols or []:
        order.append(F.col(t).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
