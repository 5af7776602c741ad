"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible across runs and engines, (b) stable under
repartitioning, and (c) cheap. `df.sample()` satisfies none of these —
its RNG is seeded per partition, so the sample changes whenever the
partitioning does. Hashing the row key is the standard fix: membership
is a pure function of the key, identical on any engine (the DuckDB
oracle replays it) and at any parallelism.

All rates are in basis points (1/10000) so thresholds are exact
integers — no float comparison at the boundary."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solace_apache_beam_spark.functions.hashing import h64


def _bucket(id_col: str, salt: str, buckets: int) -> Column:
    # concat, NOT concat_ws: a NULL key must have NO hash identity —
    # concat propagates the NULL exactly like the oracles' `'salt:' ||
    # key`, so hash_sample/stratified_sample EXCLUDE null-key rows and
    # assign_splits sends them to the 'test' remainder on both engines.
    # concat_ws silently skipped the NULL, hashing the bare salt: every
    # null-key row then shared one bucket, and any rate above that
    # bucket's value (h64("strat")%10000 = 7699 for the stratified
    # default salt — masked at the registered rates, live at any rate
    # above it) would have included them only on the Spark side.
    return h64(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    ) % buckets


def hash_sample(
    df: DataFrame, id_col: str, rate_bp: int, salt: str = "sample"
) -> DataFrame:
    """Keep ~rate_bp/10000 of rows, deterministically by key hash."""
    return df.filter(_bucket(id_col, salt, 10_000) < rate_bp)


def assign_splits(
    df: DataFrame,
    id_col: str,
    train_bp: int = 8000,
    val_bp: int = 1000,
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column: train/val/test by hash bucket (test gets
    the remainder). Disjoint, exhaustive, reproducible."""
    b = _bucket(id_col, salt, 10_000)
    return df.withColumn(
        "split",
        F.when(b < train_bp, "train")
        .when(b < train_bp + val_bp, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, rates_bp: dict[str, int],
    default_bp: int = 0, salt: str = "strat",
) -> DataFrame:
    """Per-stratum sampling rates (basis points); strata not listed get
    default_bp. Deterministic per key, so repeated runs agree."""
    rate = None
    for stratum, bp in sorted(rates_bp.items()):
        cond = F.col(strata_col) == stratum
        rate = F.when(cond, bp) if rate is None else rate.when(cond, bp)
    rate = rate.otherwise(default_bp) if rate is not None else F.lit(default_bp)
    return df.filter(_bucket(id_col, salt, 10_000) < rate)


def training_shuffle(
    df: DataFrame, id_col: str, n_shards: int = 8, salt: str = "shuffle"
) -> DataFrame:
    """Deterministic pseudorandom global shuffle for training export:
    every row gets a (shard, pos) address that is a pure function of
    its key — the reading order `ORDER BY shard, pos` is a reproducible
    permutation of the dataset, identical across runs, engines, and
    partitionings (df.orderBy(rand()) is none of these).

    shard = h64(salt || id) % n_shards spreads rows uniformly; pos =
    rank of the row's hash within its shard (ties broken by id — h64
    collisions must not make the order ambiguous). Scale: one shuffle
    keyed by shard; the per-shard ordering is Spark's external
    spill-safe sort, and n_shards bounds what any reader must stream.

    NULL-id rows are EXCLUDED (like pack_sequences_canonical): a
    NULL key has no hash identity, so multiple NULL-id rows would all
    land in a NULL shard with a NULL h and row_number over (h, id)
    among them would be nondeterministic — the reproducible-permutation
    contract cannot hold for rows with no key (ADVICE r8).

    Output: (shard, pos, id)."""
    from pyspark.sql.window import Window

    h = h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col), h.alias("h"))
        .withColumn("shard", F.col("h") % n_shards)
        .select(
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
            F.col(id_col),
        )
    )
