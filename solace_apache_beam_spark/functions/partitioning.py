"""Scale-adaptive input spreading for expensive Arrow kernels.

A parquet file with few row groups yields fewer scan tasks than the
session has cores (a 1-row-group file is unsplittable no matter what
``spark.sql.files.minPartitionNum`` asks for), which serializes any
per-row-expensive Arrow kernel chained directly to the scan — at the
bench's scale factors the base tables are single-row-group files, so a
shingling/hashing kernel was running on ONE of the session's cores. At
100 TB a scan has orders of magnitude more splits than cores, so the
spread below is a structural no-op there; it exists for the small-input
regime and is derived from the session's parallelism, never a constant
(guide §2: make partitioning scale-adaptive; §2.6 idle capacity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# analyzed-plan node names that prove the frame is a narrow chain over a
# source with NO exchange in between — exactly the shape whose physical
# partitioning mirrors the scan's. Anything else (Join/Aggregate/Window/
# Repartition/...) either already has post-shuffle parallelism or would
# make the partition-count probe below unsafe: with AQE on, ``df.rdd``
# of a plan containing exchanges EXECUTES the upstream query stages to
# settle the final partitioning — a silent extra run of the subquery
# (observed live: an anti-join probed this way ran its whole build side).
_SCAN_NODES = (
    "Relation",
    "LogicalRDD",
    "LocalRelation",
    "Project",
    "Filter",
    "SubqueryAlias",
    "View",
)


def _scan_like(df: DataFrame) -> bool:
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # pragma: no cover - defensive (odd plan shapes)
        return False
    for line in plan.splitlines():
        node = line.lstrip("+-: ").split(" ", 1)[0].split("[", 1)[0]
        if node and not node.startswith(_SCAN_NODES):
            return False
    return True


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism — only when ``df`` is a pure scan-side chain (see
    ``_SCAN_NODES``) that plans fewer partitions.

    Call it on the NARROW projection feeding an expensive kernel (the
    exchange moves exactly the kernel's input columns once). The
    round-robin exchange is deterministic under task retry (Spark sorts
    before keyless repartition — ``spark.sql.execution.sortBeforeRepartition``),
    and per-row kernels are placement-independent, so results are
    unchanged. Frames that already plan at least ``defaultParallelism``
    partitions (cluster-scale scans) and frames with any exchange in
    their lineage (post-shuffle parallelism exists; probing them would
    trigger AQE stage execution) are returned untouched.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if not _scan_like(df):
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (odd plan shapes)
        return df
    if n >= target:
        return df
    return df.repartition(target)
