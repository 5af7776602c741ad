"""WriteOneFilePerWindow twin (K1/K2).

The reference writes one text file per event-time window with names
``prefix-HH.mm-HH.mm-<shard>-of-<n>[.suffix]`` derived from the
IntervalWindow bounds (common/WriteOneFilePerWindow.java:95-112,
FileWriterPTransform.java:36-42). Documented divergence: Spark
microbatches have no Beam pane index, so panes never appear in names;
repeated triggers for the same window overwrite (update semantics) —
including removing the previous trigger's shard files first, so a
different shard count can never leave stale -of-N files beside the new
set. Reference-parity caveat: names carry HH.mm only (exactly the
reference's format), so two windows 24h apart collide — jobs spanning
days should write into per-date output dirs.

Used through ``writeStream.foreachBatch(make_window_file_writer(...))``.
Per batch the distinct-window list is tiny (bounded by the watermark),
so the per-window write loop is driver-side control flow over a handful
of windows, while each file's content is written by executors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fmt(ts) -> str:
    # HH.mm like the reference's DateTimeFormat "HH:mm" with ':' -> '.'
    return ts.strftime("%H.%M")


def write_window_files(
    df: DataFrame,
    output_dir: str,
    prefix: str = "output",
    suffix: str = "",
    shards: int = 1,
    value_col: str = "formatted",
    window_start_col: str = "window_start",
    window_end_col: str = "window_end",
) -> list[str]:
    """Write one text file set per distinct window in ``df``. Returns the
    paths written."""
    os.makedirs(output_dir, exist_ok=True)
    # the loop filters the SAME batch frame once per window — persist,
    # or the upstream lineage recomputes per window (W+1 jobs per batch)
    df = df.persist()
    windows = [
        (r[0], r[1])
        for r in df.select(window_start_col, window_end_col).distinct().collect()
    ]
    written: list[str] = []
    for start, end in sorted(windows):
        rows = (
            df.filter(
                (F.col(window_start_col) == start) & (F.col(window_end_col) == end)
            )
            .select(value_col)
            .coalesce(shards)
        )
        staging = os.path.join(
            output_dir, f".staging-{prefix}-{_fmt(start)}-{_fmt(end)}"
        )
        rows.write.mode("overwrite").text(staging)
        parts = sorted(
            f for f in os.listdir(staging) if f.startswith("part-")
        )
        n = len(parts)
        # drop the previous trigger's files for this window FIRST: a
        # re-trigger with a different part count would otherwise leave
        # stale -of-N shards beside the new set
        window_prefix = f"{prefix}-{_fmt(start)}-{_fmt(end)}-"
        for old in os.listdir(output_dir):
            if old.startswith(window_prefix):
                os.remove(os.path.join(output_dir, old))
        for shard, part in enumerate(parts):
            name = f"{prefix}-{_fmt(start)}-{_fmt(end)}-{shard:05d}-of-{n:05d}"
            if suffix:
                name += suffix
            os.replace(os.path.join(staging, part), os.path.join(output_dir, name))
            written.append(os.path.join(output_dir, name))
        for leftover in os.listdir(staging):
            os.remove(os.path.join(staging, leftover))
        os.rmdir(staging)
    df.unpersist()
    return written


def make_window_file_writer(output_dir: str, **kwargs):
    """foreachBatch hook: (batch_df, epoch_id) -> windowed text files."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        write_window_files(batch_df, output_dir, **kwargs)

    return write
