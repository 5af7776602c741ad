"""Deduplication operators over a documents table.

Scale design (100 TB of text):

- **exact**: hash-groupBy on a 128-bit content hash — one shuffle keyed
  by the hash, perfectly balanced unless one document dominates.
- **MinHash + LSH**: the signature is computed entirely map-side with
  array higher-order functions (tokenize -> shingle -> k permuted mins ->
  band hashes); the only shuffles are the band-bucket self-join (keys are
  (band, band_hash) — collision groups, tiny by construction) and the
  final pair verification. No Python, no UDFs.
- **SimHash**: map-side 32-bit signature; near-dup = signature equality
  (or small hamming ball via band pivots).
- **n-gram Jaccard**: inverted shingle index self-join with a
  document-frequency cutoff (`max_df`) — the standard guard that keeps
  the candidate blow-up O(sum df^2) bounded when shingles are common.

All hashes are the md5-derived portable hash so the DuckDB oracle can
replay every step bit-for-bit (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solace_apache_beam_spark.functions.hashing import (
    MERSENNE_61,
    h32,
    h64,
    minhash_coeffs,
    shingles_expr,
    words_expr,
)


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest id
    (deterministic representative). Output one row per distinct content:
    (text_hash, keep_id, n_copies)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    words = words_expr(text_col)
    return df.select(
        F.col(id_col), shingles_expr(words, n).alias("shingles")
    ).filter(F.size("shingles") > 0)


def minhash_band_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    n_perm: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Map-side MinHash signature + LSH band hashes.

    Per doc: shingle-hash array -> for each of n_perm permutations the min
    of (a*h+b) mod 2^61-1 -> band hash = portable hash of each
    rows-per-band slice. Output exploded: (id, band, band_hash). Zero
    shuffles — the expensive part scales linearly and embarrassingly
    parallel."""
    assert n_perm % n_bands == 0
    rows_per_band = n_perm // n_bands
    sh = _doc_shingles(df, text_col, id_col, shingle_n)
    hashed = sh.select(
        id_col, F.transform(F.col("shingles"), lambda s: h32(s)).alias("hs")
    )
    sig = hashed.select(
        id_col,
        F.array(
            *[
                F.array_min(
                    F.transform(
                        F.col("hs"),
                        lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_61),
                    )
                )
                for a, b in minhash_coeffs(n_perm)
            ]
        ).alias("sig"),
    )
    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        h64(
                            F.concat_ws(
                                ",", F.slice("sig", bi * rows_per_band + 1, rows_per_band)
                            )
                        ).alias("band_hash"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bh"),
    )
    return bands.select(id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    n_perm: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs: band-bucket self-join produces
    candidates; candidates are verified with exact shingle-set Jaccard.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.

    The self-join shuffles only (band, band_hash) buckets; verification
    joins the two shingle arrays per surviving pair — at 100 TB the
    candidate set is ~linear in the number of true near-dup pairs."""
    bands = minhash_band_hashes(df, text_col, id_col, shingle_n, n_perm, n_bands)
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    sh = _doc_shingles(df, text_col, id_col, shingle_n)
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold)


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Map-side SimHash: per bit, sum +1/-1 over token hashes; bit set
    when the sum is positive. Output (id, simhash)."""
    words = words_expr(text_col)
    hashed = df.select(
        F.col(id_col), F.transform(words, lambda w: h32(w)).alias("hs")
    ).filter(F.size("hs") > 0)
    # SQL-expression form: the python shiftleft() wrapper only takes a
    # literal shift amount, the SQL function takes a column
    simhash = F.expr(
        f"""aggregate(sequence(0, {bits - 1}), 0L,
              (acc, b) -> acc + CASE WHEN
                aggregate(hs, 0L,
                  (s, h) -> s + IF(((h >> b) & 1) = 1, 1L, -1L)) > 0
              THEN shiftleft(1L, b) ELSE 0L END)"""
    )
    return hashed.select(id_col, simhash.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via an inverted shingle index:
    explode shingles, drop shingles with document frequency > max_df
    (candidate blow-up is O(sum df^2) — the cutoff is what keeps this
    tractable on common shingles at scale), self-join on shingle to count
    intersections, derive |union| = |A| + |B| - |A∩B|."""
    sh = _doc_shingles(df, text_col, id_col, shingle_n)
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("sz"))
    inv = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    df_counts = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    inv = inv.join(
        df_counts.filter(F.col("df") <= max_df).select("shingle"), "shingle"
    )
    a = inv.select(F.col(id_col).alias("doc_a"), "shingle")
    b = inv.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)
