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


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    tiebreak_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Exact per-group percentiles with linear interpolation, computed
    from explicit ranks so an independent engine reproduces them
    bit-for-bit (Spark's percentile / DuckDB's quantile_cont are
    internally-ordered float reductions — never cross-comparable).

    Continuous quantile q over n ranked values: pos = 1 + (n-1)*q,
    result = v_floor(pos) + (v_ceil(pos) - v_floor(pos)) * (pos -
    floor(pos)) — every term one IEEE op on identically-ranked doubles.

    Scale: one per-group rank (external sort) sharing its group
    exchange with the whole-partition count window, then one
    conditional aggregation — spill-safe throughout; no collects.

    Output: (group, n, p<q> per quantile e.g. p50, p95)."""
    # tiebreak NULLS LAST: Spark's ASC default is NULLS FIRST, SQL's is
    # NULLS LAST — at equal values a NULL-id row would otherwise rank
    # ahead only on the Spark side and shift interpolation endpoints
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(tiebreak_col).asc_nulls_last()
    )
    # NULL values are excluded (standard percentile semantics) — and
    # they must be: Spark ranks NULLS FIRST, DuckDB NULLS LAST, so a
    # NULL reaching the rank would silently shift every endpoint.
    # NULL GROUPS are excluded too (round 14, session 5): the former
    # count-aggregate + join-back shape dropped them implicitly (an
    # inner equi-join never matches NULL — the same semantics every
    # oracle's ranked-JOIN-n formulation keeps), but a window
    # PARTITION BY groups all NULLs into ONE partition and would emit
    # a percentile row for that synthetic group. The round-14 window
    # collapse changed that silently; the fuzz tier caught the
    # sibling divergence in orders_above_customer_avg and this is the
    # same class, fixed the same way — filter before the exchange.
    # The per-group size n is a whole-partition COUNT window riding the
    # SAME group exchange the rank needs (round 14 — the former
    # count-aggregate + join consumed this frame twice, recomputing the
    # scan+window subtree for each consumer, and exchanged the counts a
    # second time for the join; the window counts the identical value)
    j = (
        df.select(group_col, value_col, tiebreak_col)
        .filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
        )
    )

    def pos(q: float):
        return F.lit(1.0) + (F.col("n") - F.lit(1)) * F.lit(q)

    def pname(q: float) -> str:
        return f"p{q * 100:g}".replace(".", "_")

    aggs = [F.max("n").alias("n")]
    for q in quantiles:
        aggs.append(
            F.max(
                F.when(F.col("rn") == F.floor(pos(q)), F.col(value_col))
            ).alias(f"_lo_{pname(q)}")
        )
        aggs.append(
            F.max(
                F.when(F.col("rn") == F.ceil(pos(q)), F.col(value_col))
            ).alias(f"_hi_{pname(q)}")
        )
    a = j.groupBy(group_col).agg(*aggs)
    out_cols = [F.col(group_col), F.col("n")]
    for q in quantiles:
        lo, hi = F.col(f"_lo_{pname(q)}"), F.col(f"_hi_{pname(q)}")
        out_cols.append(
            (lo + (hi - lo) * (pos(q) - F.floor(pos(q)))).alias(pname(q))
        )
    return a.select(*out_cols)
