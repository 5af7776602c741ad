"""Deterministic distinct-count sketch (KMV / k-minimum-values).

Spark's approx_count_distinct (HLL++) and DuckDB's approx_count_distinct
use different sketch internals, so their estimates can never be compared
across engines. KMV over the portable md5-derived 60-bit hash is fully
deterministic: both engines hash identically, take the k smallest
distinct hash values, and estimate distinct = (k-1) * 2^60 / kth_min —
the classic bottom-k estimator (Bar-Yossef et al.), reproducible
bit-for-bit.

Scale: hashing is JVM-side; an Arrow map-side kernel then keeps only
each group's k smallest distinct hashes PER BATCH before anything
shuffles, so the shuffle carries <= k rows per group per Arrow batch
(vs every distinct (group, hash) row of a 100 TB table). The prefilter
is lossless: any hash among a group's global k smallest is among the k
smallest of whichever batch holds it (at most k-1 hashes are globally
smaller), and groups under k distinct values lose nothing, keeping the
exact-count fallback exact."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from solace_apache_beam_spark.functions.hashing import h64

HASH_SPACE = float(1 << 60)  # h64 = 15 hex chars = 60 bits


def _bottom_k_prefilter(group_by: str, k: int):
    """Map-side kernel: per Arrow batch, each group's k smallest
    distinct hashes. Bounded output, no shuffle."""

    def keep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield (
                pdf.drop_duplicates()
                .sort_values("h", kind="mergesort")
                .groupby(group_by, sort=False, dropna=False)
                .head(k)
            )

    return keep


def kmv_distinct(
    df: DataFrame, col: str, group_by: str, k: int = 128
) -> DataFrame:
    """Per-group distinct-count estimate: (group, est_distinct DOUBLE).
    Exact count is used when a group has fewer than k distinct values
    (the estimator is undefined there, and exact is free at that size)."""
    # NULL values don't count toward distinct (COUNT DISTINCT
    # semantics) — and the filter must run BEFORE the Arrow hop: a
    # nullable int64 column becomes float64 in pandas, and 60-bit
    # hashes exceed float64's 53-bit mantissa (silent corruption)
    hashed = df.select(
        F.col(group_by), h64(F.col(col).cast("string")).alias("h")
    ).filter(F.col("h").isNotNull())
    # ONE shuffle keyed by the group: the prefilter bounds each group's
    # contribution to k rows per Arrow batch, so collect_list is bounded;
    # dedup + sort + bottom-k all happen inside the aggregate. (This
    # replaces a distinct shuffle on (group, h) plus a row_number window
    # sort — two extra shuffles for the same answer.)
    prefiltered = hashed.mapInPandas(_bottom_k_prefilter(group_by, k), hashed.schema)
    per_group = prefiltered.groupBy(group_by).agg(
        F.slice(F.array_sort(F.array_distinct(F.collect_list("h"))), 1, k).alias(
            "bottom"
        )
    )
    return per_group.select(
        F.col(group_by),
        F.when(
            F.size("bottom") < k,
            # fewer than k distinct values survive the lossless prefilter
            # only when the group's TRUE distinct count is < k -> exact
            F.size("bottom").cast("double"),
        )
        .otherwise(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.element_at("bottom", k)
        )
        .alias("est_distinct"),
    )
