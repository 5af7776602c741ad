"""Release handles for DataFrames an operator persists INSIDE the plan
it returns.

Several operators persist an intermediate frame (shingle sets, packed
vector blocks, tf tables, stage frontiers) that is consumed by more
than one branch of the returned lazy plan — the persist is what makes
the expensive kernel run once instead of once per consumer. The cache
must stay registered until the caller materializes the result, so the
operator cannot unpersist before returning; without a handle, every
call leaks a MEMORY_AND_DISK cache for the session lifetime (the
pattern ADVICE r6 flagged on build_corpus_index and ADVICE r7 flagged
again on minhash_lsh_pairs_rescue — this module is the
once-and-for-all generalization).

Contract: an operator that persists internally attaches a
:class:`PlanCaches` to its result as ``out.plan_caches``; the caller
releases with ``out.plan_caches.unpersist()`` AFTER materializing
(collect / write). Unpersisting only drops the cache — the plan stays
valid and recomputes from lineage if re-executed. Short-lived sessions
(tests, the driver's per-round gate run) may ignore the handle; the
caches die with the session.

Checkpoint-backed results are the one case this contract cannot
cover: ``connected_components`` returns a frame whose storage IS its
lineage (localCheckpoint), so releasing kills the frame instead of
falling back to recompute. That operator exposes the sibling
``out.checkpoint_caches`` (``llm.dedup.CheckpointCaches``) with the
stricter release-only-when-done semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class PlanCaches:
    """Unpersist handle for the frames one operator call persisted
    (the generalization of ``CorpusIndex.unpersist``). Holds strong
    references to the persisted DataFrames; ``unpersist()`` releases
    every one, ``is_cached`` reports whether any is still registered
    at a storage level."""

    __slots__ = ("_frames",)

    def __init__(self, frames) -> None:
        self._frames = tuple(frames)

    def unpersist(self) -> "PlanCaches":
        for f in self._frames:
            f.unpersist()
        return self

    @property
    def is_cached(self) -> bool:
        return any(
            f.storageLevel.useMemory or f.storageLevel.useDisk
            for f in self._frames
        )


def attach_plan_caches(out: DataFrame, frames) -> DataFrame:
    """Attach ``out.plan_caches = PlanCaches(frames)`` and return
    ``out`` — an instance attribute rather than a DataFrame subclass so
    every existing caller keeps a plain DataFrame. ``frames`` that are
    not persisted are fine (unpersist is a no-op on them)."""
    out.plan_caches = PlanCaches(frames)
    return out
