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


# floor for the JVM tokenize+explode call sites (extract_words,
# vocabulary, bm25): the serial split outruns the round-robin exchange
# only once the scan side is ~1 MB of estimated input — measured
# break-even between a 0.6 MB estimate (spread lost ~0.2 s) and a
# 1.2 MB estimate (spread won 2.7 s on vocabulary). Arrow kernel sites
# use 0: their per-row cost dominates at any input size.
TOKENIZE_SPREAD_MIN_BYTES = 1 << 20


def spread_scan(df: DataFrame, min_bytes: int = 0) -> DataFrame:
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

    ``min_bytes``: additionally skip the spread when the optimizer's
    size estimate for the frame is below this floor. Arrow kernels with
    heavy per-row work (md5-per-shingle) win the trade at ANY input
    size, so they use the 0 default; cheap-per-byte JVM work (the
    tokenizing split+explode) only outruns the exchange once the serial
    scan side is a few MB (measured: ~0.4 s/MB serial tokenize vs
    ~0.2 s + bytes for the exchange), so those sites pass a floor. The
    estimate is bytes-derived and scale-adaptive, never a row-count or
    core-count constant.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if not _scan_like(df):
        return df
    try:
        if min_bytes > 0:
            est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            if not isinstance(est, int):  # py4j BigInteger on some builds
                est = int(est.toString())
            if est < min_bytes:
                return df
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (odd plan shapes)
        return df
    if n >= target:
        return df
    return df.repartition(target)
