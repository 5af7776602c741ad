"""Embedding similarity search over an ``array<float>`` column.

Scale design:

- **Brute-force top-k** is the exact baseline: the (small) query set is
  broadcast against the corpus — the corpus never shuffles; per-row work
  is a codegen'd fold over the two arrays (no Python). O(|Q| * N * d).
- **LSH-bucketed ANN** is the scale path: random-hyperplane signs
  computed map-side put each vector in a bucket; search is brute force
  within the bucket only. Hyperplane coefficients are ±1 derived from
  the portable hash, so the DuckDB oracle reproduces the bucketing
  exactly. (An IVF variant = k-means centroids as the bucketer; same
  join shape.)
- Cosine values are rounded (1e-6) before ranking with an id tiebreak:
  ranking is then insensitive to float summation order across engines
  and partitionings.

All dot products cast float->double first (exact) and fold sequentially
left-to-right, matching the oracle's list_reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solace_apache_beam_spark.functions.hashing import h32


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("vnorm", _norm(F.col(vec_col)))


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector. The query set
    is broadcast; corpus scans stay put (no shuffle of N)."""
    q = with_norm(query_df, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("vnorm").alias("qnorm"),
    )
    c = with_norm(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col("vnorm").alias("cnorm"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    )


def lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", n_planes: int = 8
) -> DataFrame:
    """Random-hyperplane bucket id per vector (map-side). Plane p,
    dimension d coefficient = ±1 from the portable hash of "p:d" — fully
    deterministic and oracle-reproducible."""
    dim = F.size(F.col(vec_col))
    signs = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(
                    F.sequence(F.lit(0), dim - 1),
                    lambda d: (
                        h32(F.concat_ws(":", F.lit(p), d.cast("string")))
                        .bitwiseAND(F.lit(1))
                        * 2
                        - 1
                    ).cast("double"),
                ),
                lambda x, wcoef: x.cast("double") * wcoef,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        for p in range(n_planes)
    ]
    bucket = None
    for p, s in enumerate(signs):
        bit = F.when(F.round(s, 9) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.select(F.col(id_col), F.col(vec_col), bucket.cast("long").alias("bucket"))


def ann_lsh_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: brute force within each LSH bucket. The
    self-join shuffles on bucket id; per-bucket work is (N/2^planes)^2 —
    the planes knob trades recall for cost. IVF-style: swap the bucket
    expression for nearest-centroid."""
    b = lsh_bucket(df, vec_col, id_col, n_planes)
    withn = b.withColumn("vnorm", _norm(F.col(vec_col)))
    l = withn.select(
        F.col("bucket"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("vnorm").alias("qnorm"),
    )
    r = withn.select(
        F.col("bucket"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col("vnorm").alias("cnorm"),
    )
    pairs = l.join(r, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold (all
    pairs; at scale, route through lsh_bucket first — same verify step)."""
    withn = with_norm(df, vec_col)
    a = withn.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("vnorm").alias("na")
    )
    b = withn.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("vnorm").alias("nb")
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
            "cos_sim"
        ),
    )
    return scored.filter(F.col("cos_sim") >= threshold)
