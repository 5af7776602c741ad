"""Warehouse append sink (K3) and console/log sink (K4).

The reference appends rows to BigQuery with CREATE_IF_NEEDED /
WRITE_APPEND (SolaceBigQuery.java:198-202); the portable engine appends
to a parquet table via foreachBatch. Exactly-once note: parquet append
is at-least-once under retries — the epoch_id column makes replays
detectable/idempotent downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_warehouse_appender(table_path: str, partition_by: list[str] | None = None):
    def write(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_df.withColumn("_epoch_id", F.lit(epoch_id))
        writer = out.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(table_path)

    return write


def make_idempotent_appender(
    table_path: str, partition_by: list[str] | None = None
):
    """Exactly-once-effect warehouse append: each epoch writes into its
    own `_epoch_id=N` partition with dynamic partition overwrite, so a
    replayed microbatch (at-least-once foreachBatch contract) REPLACES
    its previous attempt instead of duplicating it. This is the standard
    idempotent-by-epoch pattern for non-transactional table formats;
    partition count grows by one per epoch (compact downstream)."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_df.withColumn("_epoch_id", F.lit(epoch_id))
        parts = ["_epoch_id"] + (partition_by or [])
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*parts)
            .parquet(table_path)
        )

    return write


def make_log_sink(logger=None):
    """Element -> log line (SolaceRecordTest.java:158-164).

    Dev/debug sink: collects the batch to the driver so the lines land
    in the DRIVER's log (what you want at a console). For production
    log shipping use :func:`make_distributed_log_sink` — this one is a
    driver bottleneck by design."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        for row in batch_df.collect():
            msg = f"epoch={epoch_id} {row.asDict()}"
            if logger:
                logger.info(msg)
            else:
                print(msg)

    return write


def make_distributed_log_sink(line_logger=None):
    """Scale-safe log sink: each EXECUTOR logs its own partition's rows
    (foreachPartition — nothing moves to the driver; lines appear in
    executor logs, or wherever ``line_logger`` ships them). Same
    element->line contract as make_log_sink; use this one when the
    stream is bigger than a debug session."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        def log_partition(rows) -> None:
            for row in rows:
                msg = f"epoch={epoch_id} {row.asDict()}"
                if line_logger:
                    line_logger(msg)
                else:
                    print(msg)

        batch_df.foreachPartition(log_partition)

    return write


def write_training_shards(
    df: DataFrame, path: str, id_col: str, n_shards: int = 8, salt: str = "shuffle"
) -> dict:
    """Training-export writer: rows land in `shard=K/` partition
    directories in the deterministic pseudorandom order of
    training_shuffle (ORDER BY pos within each shard) — a reader
    streaming shard files in row order replays the canonical
    permutation. One shuffle (partitionBy shard) + per-shard sort;
    every shard is written by exactly one task (repartition on the
    shard column), so file contents are run-to-run identical.

    Returns ``{"rows_written": N, "rows_dropped_null_id": M}`` so the
    NULL-id exclusion below is OBSERVABLE, not silent (ADVICE r9: an
    export sink losing rows with no metric is easy to miss). The counts
    ride the write job itself via ``DataFrame.observe`` — no second
    scan; if metric retrieval fails (very large AQE plans have a known
    row-conversion issue, see dedup telemetry), a column-pruned
    id-only count is the fallback. A nonzero drop count additionally
    emits a ``UserWarning``."""
    import warnings

    from pyspark.sql import Observation
    from pyspark.sql.window import Window

    from solace_apache_beam_spark.functions.hashing import h64

    # (shard, pos) computed INLINE on df — same formula as
    # training_shuffle (shard = h64(salt||id) % n_shards, pos = rank of
    # (h, id) within shard), but without materializing the address
    # frame and joining it back: the join re-scanned the full dataset
    # and shuffled every payload column a second time just to
    # re-attach rows to their own address — at training-export scale
    # that roughly doubled the job's I/O.
    # NULL-id rows excluded, mirroring training_shuffle exactly — the
    # written order must replay the canonical permutation, and rows
    # with no key identity have no deterministic position in it
    obs = Observation("write_training_shards")
    h = h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    out = (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(id_col).isNull().cast("long")).alias("n_null_id"),
        )
        .filter(F.col(id_col).isNotNull())
        .withColumn("h", h)
        .withColumn("shard", F.col("h") % n_shards)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("h")
    )
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    try:
        n_rows = int(obs.get["n_rows"] or 0)
        n_dropped = int(obs.get["n_null_id"] or 0)
    except Exception:
        # fallback: id-only scans — column-pruned, cheap vs the export
        n_dropped = df.filter(F.col(id_col).isNull()).count()
        n_rows = df.count()
    stats = {
        "rows_written": n_rows - n_dropped,
        "rows_dropped_null_id": n_dropped,
    }
    if n_dropped:
        warnings.warn(
            f"write_training_shards({path!r}): dropped {n_dropped} "
            f"NULL-{id_col} row(s) from the export (no deterministic "
            "position in the canonical permutation)",
            UserWarning,
            stacklevel=2,
        )
    return stats


COMPACTED_EPOCH = -1
"""Sentinel ``_epoch_id`` for compacted data. Stream epochs are
non-negative, so a replayed microbatch's dynamic partition overwrite
can never clobber the compacted partition."""


def _epoch_dirs(table_path: str, epoch_col: str = "_epoch_id") -> dict[str, str]:
    """name -> full path of the `<epoch_col>=N` partition dirs present."""
    try:
        names = os.listdir(table_path)
    except FileNotFoundError:
        return {}
    return {
        n: os.path.join(table_path, n)
        for n in names
        if n.startswith(f"{epoch_col}=")
    }


def _recover_compaction(table_path: str, epoch_col: str = "_epoch_id") -> None:
    """Roll a crashed compact_epochs forward or back from its on-disk
    breadcrumbs (the `<path>.compact.json` manifest written before the
    swap, and the `<path>.bak` backup). Every crash point is covered:

    - crash before the first rename: table untouched — drop the
      orphaned temp dir and manifest.
    - crash between the renames (published path ABSENT): restore the
      backup to the published path; the next run recompacts.
    - crash during late-epoch carry-over: resume it — the manifest
      lists exactly which epoch dirs were folded (present in the
      compacted partition), so everything else moves over and the
      backup drops, completing the original run.

    Without this, a leftover .bak made every later compaction die at
    os.rename with ENOTEMPTY, and the between-renames crash left the
    table absent until a human restored it. A .bak with NO manifest
    (pre-manifest vintage, or tampering) is not safely resolvable —
    folded epochs cannot be distinguished from late ones, and guessing
    would duplicate rows — so that one case raises for inspection."""
    import json
    import shutil

    bak = table_path.rstrip("/") + ".bak"
    mpath = table_path.rstrip("/") + ".compact.json"
    manifest = None
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    if os.path.exists(bak):
        if not os.path.exists(table_path):
            os.rename(bak, table_path)  # crash between renames: restore
        elif manifest is not None:
            folded = set(manifest["foldable"])
            for name, p in sorted(_epoch_dirs(bak, epoch_col).items()):
                dest = os.path.join(table_path, name)
                if name not in folded and not os.path.exists(dest):
                    os.rename(p, dest)
            shutil.rmtree(bak)
        else:
            raise RuntimeError(
                f"stale {bak} with no compaction manifest: cannot tell "
                "folded epochs from late ones — inspect and remove it "
                "manually"
            )
    if manifest is not None:
        tmp = manifest.get("tmp")
        if tmp and os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(mpath):
            os.remove(mpath)


def compact_epochs(
    spark,
    table_path: str,
    partition_by: list[str] | None = None,
    committed_through: int | None = None,
    epoch_col: str = "_epoch_id",
) -> None:
    """Compaction for make_idempotent_appender tables: fold the
    accumulated `_epoch_id=N` partitions into one equivalent
    `_epoch_id=-1` partition (the 'compact downstream' step its
    docstring promises). The table STAYS `_epoch_id`-partitioned, so a
    live appender keeps working across compactions and a replayed epoch
    still replaces only its own partition — readers drop `_epoch_id` if
    they don't want the provenance column.

    Replay safety: an epoch may only be folded once it can no longer be
    REPLAYED — a microbatch whose sink write landed but whose
    checkpoint commit didn't will re-run after restart, and a replay of
    an already-folded epoch would duplicate its rows (the fold removed
    the partition the dynamic overwrite would have replaced). Pass
    ``committed_through`` (the stream's last committed batch id, from
    its checkpoint commit log) to fold exactly the epochs known
    durable; by default the highest live epoch is left unfolded, which
    is sufficient for a single sequentially-committing stream (only its
    latest batch can be uncommitted).

    Concurrent-writer safety: only the epoch dirs present at snapshot
    time are compacted (explicit dir list, not a whole-table read), and
    after the swap any `_epoch_id=N` dirs that a concurrent appender
    COMMITTED between the snapshot and the rename are moved from the
    backup into the new table before the backup is dropped — committed
    NEW epochs are never lost. An appender mid-commit DURING the rename
    itself can still strand its in-flight temp files, and a rewrite of
    a snapshot epoch mid-compaction is superseded by the fold; pause
    writers around the swap for full safety in those cases.

    Swap protocol: write to a temp dir, write a `<path>.compact.json`
    manifest (folded epoch names + temp location), move the old table
    aside to `<path>.bak`, move the compacted data in, re-append late
    epochs, then drop the backup and the manifest. Plain-directory
    rename is NOT transactional — there is a brief window where the
    published path is absent (a concurrent reader can see not-found
    and should retry) — but a crash at ANY point leaves a complete
    copy of the data on disk AND enough breadcrumbs that the next run
    (or any compact_epochs call) rolls the crashed swap forward or
    back mechanically via ``_recover_compaction``. True atomic swap
    needs a table format with a metadata pointer (Delta/Iceberg).

    ``epoch_col`` names the epoch partition column — "_epoch_id" for
    make_idempotent_appender tables (default), "epoch" for the
    ingestion loops' grown-index tables (see
    ``streaming.ingestion.compact_grown_index``). The COMPACTED_EPOCH
    sentinel (-1) sorts below every live epoch under either name, so
    epoch-consistent readers (``epoch < current``) always see the
    compacted partition."""
    import json
    import shutil
    import tempfile

    def _epoch_of(name: str) -> int:
        return int(name.split("=", 1)[1])

    # roll any crashed prior compaction forward/back first — a stale
    # .bak would otherwise fail the swap below with ENOTEMPTY
    _recover_compaction(table_path, epoch_col)
    snapshot = _epoch_dirs(table_path, epoch_col)
    live = [n for n in snapshot if _epoch_of(n) != COMPACTED_EPOCH]
    if committed_through is not None:
        foldable = {
            n: p
            for n, p in snapshot.items()
            if _epoch_of(n) <= committed_through
        }
    else:
        # single-stream default: the highest live epoch may still be
        # uncommitted (replayable) — leave it as its own partition
        newest = max((_epoch_of(n) for n in live), default=None)
        foldable = {
            n: p for n, p in snapshot.items() if _epoch_of(n) != newest
        }
    if not any(_epoch_of(n) != COMPACTED_EPOCH for n in foldable):
        # nothing but the sentinel would fold: a rewrite would re-copy
        # the whole historical table (and expose the rename window)
        # for zero effect
        return
    df = (
        spark.read.option("basePath", table_path)
        .parquet(*foldable.values())
        .withColumn(epoch_col, F.lit(COMPACTED_EPOCH))
    )
    parent = os.path.dirname(table_path) or "."
    tmp = tempfile.mkdtemp(prefix="compact_", dir=parent)
    writer = (
        df.repartition(max(1, df.rdd.getNumPartitions() // 4))
        .write.mode("overwrite")
        .partitionBy(*([epoch_col] + (partition_by or [])))
    )
    writer.parquet(tmp)
    bak = table_path.rstrip("/") + ".bak"
    # manifest BEFORE the swap: it is what makes a crash at any later
    # point mechanically recoverable (which epochs are represented in
    # the compacted partition, and where the temp output lives)
    mpath = table_path.rstrip("/") + ".compact.json"
    mtmp = mpath + ".tmp"
    with open(mtmp, "w") as f:
        json.dump({"foldable": sorted(foldable), "tmp": tmp}, f)
    os.replace(mtmp, mpath)
    os.rename(table_path, bak)
    os.rename(tmp, table_path)
    # carry over everything that was NOT folded: epochs committed after
    # the snapshot AND the withheld still-replayable epochs (whose
    # latest committed content — possibly rewritten mid-compaction —
    # lives in bak). Whole-dir moves, no rewrite.
    for name, _ in sorted(_epoch_dirs(bak, epoch_col).items()):
        if name not in foldable:
            os.rename(os.path.join(bak, name), os.path.join(table_path, name))
    shutil.rmtree(bak)
    os.remove(mpath)
