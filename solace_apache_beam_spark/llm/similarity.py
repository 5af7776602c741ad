"""Embedding similarity search over an ``array<float>`` column.

Scale design (100 TB of vectors):

- **Fixed-point quantization** first: every component is quantized to
  ``round(x * 2^20)`` held as an exact integer. Dot products and
  squared norms are then integer sums (|q| < 2^21, dim <= 512 keeps
  every partial under 2^53), so they are EXACT in float64 BLAS matmul —
  the result is identical under any summation order, SIMD width, or
  partitioning, and the DuckDB oracle replays it bit-for-bit with
  BIGINT arithmetic. This is what makes vectorized execution safe: a
  float32 cosine folded left-to-right and a BLAS matmul disagree in the
  last ulps; quantized integers never disagree.
- **Brute-force top-k** (exact baseline): corpus packed into per-block
  matrices (applyInPandas), query block broadcast, per-pair scores from
  one numpy matmul per block pair. The corpus never shuffles; work is
  O(|Q| * N * d) spread evenly over blocks.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signs over
  the quantized vectors (coefficients +-1 from md5("plane:dim") — fully
  deterministic) bucket each vector map-side; scoring is brute force
  within a bucket only (groupBy(bucket).applyInPandas). An IVF variant
  = k-means centroids as the bucketer; same join shape.
- **Near-dup pairs** (exact all-pairs): block-nested-loop over packed
  block pairs (blk_a <= blk_b) — O(B^2) block combinations, each one
  matmul; at corpus scale route through lsh_bucket first.

Raw cosines leave the Arrow stage unrounded; Spark's round(col, 6)
(BigDecimal HALF_UP — already proven to match DuckDB's round) produces
the reported value, and thresholds/ranks apply to the rounded value on
both engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solace_apache_beam_spark.functions.caching import attach_plan_caches
from solace_apache_beam_spark.functions.partitioning import (
    TOKENIZE_SPREAD_MIN_BYTES,
    spread_scan,
)

QUANT_BITS = 20
QUANT = 1 << QUANT_BITS

_PACKED_SCHEMA = "blk long, ids array<long>, mat array<array<double>>"

# Per-yield row cap for pair-scoring kernels. A pandas frame yielded
# from mapInPandas becomes ONE Arrow record batch on the Python->JVM
# stream — the JVM must allocate the whole batch in direct memory at
# once. An unsliced block-pair emission is up to block_size^2 rows
# (~400 MB); at 32 concurrent tasks that exhausted the direct-buffer
# pool and killed the executor at the 200k-vector stress point. 256k
# rows x 3 numeric cols ~= 6 MB per batch.
_EMIT_ROWS = 1 << 18


def _emit_sliced(frame: pd.DataFrame, cap: int | None = None):
    """Yield ``frame`` in slices of at most ``cap`` rows (module default
    ``_EMIT_ROWS``) so no single Arrow output batch is unbounded."""
    cap = cap or _EMIT_ROWS
    if len(frame) <= cap:
        yield frame
        return
    for s in range(0, len(frame), cap):
        yield frame.iloc[s : s + cap]


def _rowwise_topk_mask(scores: np.ndarray, valid: np.ndarray, k: int) -> np.ndarray:
    """Mask keeping, per row, every VALID entry that ties-or-beats the
    row's k-th largest valid score minus one 6-decimal quantum — a
    SUPERSET of the candidate set a global ``row_number() <= k`` window
    (ordering by Spark's F.round(cos, 6), ties broken elsewhere) can
    ever select from this block. Callers pass np.round(cos, 6) scores;
    the 2e-6 slack covers the two places numpy's scaled half-to-even
    rounding can land one quantum away from F.round's decimal HALF_UP
    (the entry's own rounding AND the k-th score's) — without it, a
    value that ties at window granularity but loses at numpy
    granularity could be pruned before the shuffle, changing which id
    wins the deterministic tie-break. The slack only ever ADMITS extra
    candidates (a few near-boundary rows per block); the final window
    still ranks exactly."""
    n_rows, n_cols = scores.shape
    if n_cols <= k:
        return valid
    masked = np.where(valid, scores, -np.inf)
    kth = -np.partition(-masked, k - 1, axis=1)[:, k - 1]
    return valid & (masked >= kth[:, None] - 2e-6)


def _quantize(mat: np.ndarray) -> np.ndarray:
    """round-half-away-from-zero(x * 2^20) as exact integers in float64.
    x*2^20 is exact for float32-origin values (power-of-two scale), and
    the same expression in SQL is CAST(round(CAST(x AS DOUBLE) *
    1048576) AS BIGINT) — DuckDB round() is also half-away-from-zero."""
    return np.floor(np.abs(mat) * QUANT + 0.5) * np.sign(mat)


def _to_matrix(vecs: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in vecs])


def _blk_expr(id_col: str, block_size: int):
    """Block assignment shared by the exact pack kernel and the
    auto-route counter — id-range blocks (id // block_size). The router
    MUST count THIS expression's population, not rows: a block holds at
    most ``block_size`` distinct ids, so the row count is only a LOWER
    bound on block count, and sparse/non-dense ids produce far more
    blocks than ceil(n/block_size) (ADVICE r9, medium)."""
    return (F.col(id_col) / F.lit(block_size)).cast("long")


def _pack_blocks(
    df: DataFrame, vec_col: str, id_col: str, block_size: int
) -> DataFrame:
    """Pack ~block_size vectors into one quantized matrix row per block
    (Arrow batch -> numpy, no driver collect)."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        q = _quantize(_to_matrix(pdf[vec_col]))
        return pd.DataFrame(
            {
                "blk": [int(pdf["_blk"].iloc[0])],
                "ids": [ids.tolist()],
                "mat": [q.tolist()],
            }
        )

    return (
        df.select(F.col(id_col), F.col(vec_col))
        .filter(F.col(vec_col).isNotNull())  # undecoded rows carry no vector
        .withColumn("_blk", _blk_expr(id_col, block_size))
        .groupBy("_blk")
        .applyInPandas(pack, _PACKED_SCHEMA)
    )


def _unpack(nested) -> np.ndarray:
    """Arrow hands array<array<double>> back as an object array of
    arrays — stack to a dense (n, d) float64 matrix."""
    return np.stack([np.asarray(x, dtype=np.float64) for x in nested])


def _block_scores(qa: np.ndarray, qb: np.ndarray) -> np.ndarray:
    """Exact cosine matrix between two quantized blocks. The matmul and
    row sums are integer-valued floats (< 2^53) — exact; sqrt/divide are
    elementwise IEEE ops identical to the oracle's scalar expression."""
    dots = qa @ qb.T
    na = np.sqrt((qa * qa).sum(axis=1))
    nb = np.sqrt((qb * qb).sum(axis=1))
    with np.errstate(divide="ignore", invalid="ignore"):
        return dots / (na[:, None] * nb[None, :])


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    block_size: int = 4096,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector. The (small)
    query set rides broadcast against packed corpus blocks; one matmul
    per block scores every (query, corpus) pair in that block."""
    corpus = _pack_blocks(df, vec_col, id_col, block_size)
    queries = _pack_blocks(
        query_df, vec_col, id_col, 1 << 62  # all queries in one packed block
    ).select(F.col("ids").alias("qids"), F.col("mat").alias("qmat"))

    def score(batches):
        # per-query partial top-k within each corpus block (on the
        # rounded cosine — window-granularity ties survive the cut) so
        # the emission is |Q| x ~k rows instead of |Q| x block_size;
        # see _bucketed_all_pairs_topk for the Arrow-batch rationale
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                qids = np.asarray(r.qids, dtype=np.int64)
                cids = np.asarray(r.ids, dtype=np.int64)
                cos = _block_scores(_unpack(r.qmat), _unpack(r.mat))
                valid = np.isfinite(cos) & (qids[:, None] != cids[None, :])
                mask = _rowwise_topk_mask(np.round(cos, 6), valid, k)
                ii, jj = np.nonzero(mask)
                yield from _emit_sliced(
                    pd.DataFrame(
                        {
                            "query_id": qids[ii],
                            "neighbor_id": cids[jj],
                            "cos_raw": cos[ii, jj],
                        }
                    )
                )

    scored = (
        corpus.join(F.broadcast(queries))
        .mapInPandas(score, "query_id long, neighbor_id long, cos_raw double")
        .select(
            "query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim")
        )
    )
    return _rank_topk(scored, k)


def _plane_coeffs(n_planes: int, dim: int, offset: int = 0) -> np.ndarray:
    """+-1 hyperplane coefficients from md5("plane:dim") — matches the
    oracle's ('0x' || substr(md5(p || ':' || d), 1, 8))::BIGINT & 1.
    ``offset`` shifts the global plane index: table t of a multi-table
    scheme uses planes [t*n_planes, (t+1)*n_planes) — independent
    hyperplane sets from the same deterministic stream."""
    c = np.empty((n_planes, dim))
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"{offset + p}:{d}".encode()).hexdigest()[:8], 16)
            c[p, d] = (h & 1) * 2 - 1
    return c


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    plane_offset: int = 0,
) -> DataFrame:
    """Random-hyperplane bucket id per vector (map-side, vectorized).
    Projections are integer-exact over the quantized vector, so the
    sign — hence the bucket — is deterministic on every engine. Output:
    (id, q array<double> of quantized components, bucket)."""

    def bucketize(batches):
        coeffs: dict[int, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = _quantize(_to_matrix(pdf[vec_col]))
            c = coeffs.setdefault(
                q.shape[1], _plane_coeffs(n_planes, q.shape[1], plane_offset)
            )
            proj = q @ c.T  # (n, planes) exact integers
            bucket = ((proj >= 0).astype(np.int64) << np.arange(n_planes)).sum(
                axis=1
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "q": list(q),
                    "bucket": bucket,
                }
            )

    return (
        df.select(F.col(id_col), F.col(vec_col))
        .filter(F.col(vec_col).isNotNull())  # undecoded rows carry no vector
        .mapInPandas(bucketize, f"{id_col} long, q array<double>, bucket long")
    )


def _derive_n_buckets(n_rows: int, target_bucket: int) -> int:
    """Buckets needed so the MEAN bucket holds ~target_bucket vectors.
    (Individual buckets still skew — the block-pair scorer bounds
    per-task memory regardless; this knob bounds total in-bucket
    O(bucket^2) work.)"""
    import math

    return max(1, math.ceil(n_rows / max(1, target_bucket)))


def _packed_bucket_blocks(
    frame: DataFrame,
    bucket_col: str,
    id_col: str,
    block_size: int,
    with_flags: bool = False,
) -> DataFrame:
    """Pack each bucket's members into dense ~block_size sub-blocks —
    the shared preamble of every bucketed pair/top-k kernel. The
    row_number window sort is Spark's external spill-safe sort (not a
    pandas frame), so a degenerate bucket of M vectors becomes
    M/block_size one-row packed blocks instead of one task holding an
    M x d matrix. Output columns: ``(bucket, blk, ids, [idx,] mat)``;
    ``with_flags=True`` additionally packs the frame's ``is_index``
    boolean column (the asymmetric threshold kernel's candidate
    marker)."""
    w = Window.partitionBy(bucket_col).orderBy(F.col(id_col))
    blocked = frame.withColumn(
        "_blk",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(block_size)).cast("long"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {
            "bucket": [int(pdf[bucket_col].iloc[0])],
            "blk": [int(pdf["_blk"].iloc[0])],
            "ids": [pdf[id_col].to_numpy(dtype=np.int64).tolist()],
        }
        if with_flags:
            out["idx"] = [pdf["is_index"].to_numpy(dtype=np.bool_).tolist()]
        out["mat"] = [_unpack(pdf["q"]).tolist()]
        return pd.DataFrame(out)

    schema = (
        "bucket long, blk long, ids array<long>, "
        + ("idx array<boolean>, " if with_flags else "")
        + "mat array<array<double>>"
    )
    return blocked.groupBy(bucket_col, "_blk").applyInPandas(pack, schema)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact final ranking shared by the top-k kernels: per-query
    row_number over (cos_sim desc, neighbor_id asc), keep rank <= k."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _bucketed_all_pairs_topk(
    b: DataFrame,
    bucket_col: str,
    id_col: str,
    k: int,
    block_size: int,
    dedup_pairs: bool = False,
) -> DataFrame:
    """All-pairs cosine within each bucket with BOUNDED per-task memory,
    merged to per-query top-k.

    Members of a bucket are packed into dense ~block_size sub-blocks
    (:func:`_packed_bucket_blocks`), then every sub-block pair of
    the same bucket is scored with one matmul. A skewed bucket of M
    vectors costs (M/block_size)^2 small tasks instead of one task
    holding an M x d matrix and an M x M cosine matrix — per-task memory
    is <= 2 * block_size * d + block_size^2 doubles no matter how
    degenerate the bucket. Emissions are likewise bounded: each task
    ships only per-query in-block top-k candidates in capped Arrow
    batches (see ``score``), never the raw block_size^2 pair matrix.
    Output is identical to a whole-bucket matmul: the same pairs are
    scored with the same integer-exact arithmetic and the same top-k
    window applies."""
    # both sides of the block-pair self-join read this — persist, or
    # the whole bucketize+window+pack pipeline (Python kernels
    # included) executes twice
    from pyspark.storagelevel import StorageLevel

    packed = _packed_bucket_blocks(b, bucket_col, id_col, block_size).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = packed.select(
        F.col("bucket").alias("abucket"),
        F.col("blk").alias("ablk"),
        F.col("ids").alias("aids"),
        F.col("mat").alias("amat"),
    )
    bb = packed.select(
        F.col("bucket").alias("bbucket"),
        F.col("blk").alias("bblk"),
        F.col("ids").alias("bids"),
        F.col("mat").alias("bmat"),
    )

    def score(batches):
        # Emissions are pruned to each query's in-block top-k BEFORE
        # they leave Python: the global window only ever selects from
        # per-block-pair winners (top-k of a union = top-k over the
        # union of per-part top-k sets), so shipping the losing
        # block_size^2-k pairs is pure Arrow/shuffle/sort waste — and a
        # single unsliced all-pairs frame (~400 MB as one Arrow batch)
        # exhausted the JVM direct-buffer pool at the 200k-vector
        # stress point. Selection runs on the ROUNDED cosine so the
        # boundary keeps every window-granularity tie; the id
        # tie-break stays with the window. With dedup_pairs, neighbor
        # ids within one block are distinct, so the per-direction
        # top-k set still contains every post-distinct winner.
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ia = np.asarray(r.aids, dtype=np.int64)
                ib = np.asarray(r.bids, dtype=np.int64)
                cos = _block_scores(_unpack(r.amat), _unpack(r.bmat))
                cos_r = np.round(cos, 6)
                valid = np.isfinite(cos) & (ia[:, None] != ib[None, :])
                fwd = _rowwise_topk_mask(cos_r, valid, k)
                ii, jj = np.nonzero(fwd)
                parts = [
                    {"query_id": ia[ii], "neighbor_id": ib[jj], "cos_raw": cos[ii, jj]}
                ]
                if r.ablk != r.bblk:
                    # distinct blocks are joined once (ablk < bblk) —
                    # the reverse direction scores from the transpose
                    rev = _rowwise_topk_mask(cos_r.T, valid.T, k)
                    ri, rj = np.nonzero(rev)
                    parts.append(
                        {
                            "query_id": ib[ri],
                            "neighbor_id": ia[rj],
                            "cos_raw": cos.T[ri, rj],
                        }
                    )
                for p in parts:
                    yield from _emit_sliced(pd.DataFrame(p))

    # both sides are packed corpus blocks — unbounded; the equi-key
    # (bucket) sort-merge join spills, where a misestimated broadcast
    # build of the packed matrices would OOM (see ngram-Jaccard 10x)
    scored = (
        a.join(
            bb.hint("merge"),
            (F.col("abucket") == F.col("bbucket")) & (F.col("ablk") <= F.col("bblk")),
        )
        .mapInPandas(score, "query_id long, neighbor_id long, cos_raw double")
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"))
    )
    if dedup_pairs:
        # multi-table OR-construction: the same pair can collide in
        # several tables; its cosine is identical everywhere, so a
        # distinct collapses the copies before ranking
        scored = scored.distinct()
    return attach_plan_caches(_rank_topk(scored, k), (packed,))


# n_tables -> recall@5 measured against brute-force truth at 200k
# vectors (scripts/measure_ann_recall.py, round 6) — matches the
# 1-(1-r)^L OR-construction model with per-table r ~ 0.952. Surfaced
# via ann_recall_info so the single-table default's ~5 % miss rate is
# visible at call sites (VERDICT r6 Next #5).
_ANN_MEASURED_RECALL = {1: 0.952, 2: 0.997, 4: 1.0}

# neardup_pairs_lsh presets: n_tables -> measured recall vs exact truth
# (scripts/measure_neardup_recall.py, round 9; threshold 0.4; full
# exact truth at 20k/200k, vec_id%100-sampled truth at 2M — estimator
# validated against full truth at 20k). Hyperplane LSH is ANGULAR:
# the dedup-actionable >=0.8-cosine band holds at every scale while
# boundary-band recall decays with the derived plane count exactly as
# 1-(1-p^planes)^L predicts. Keys: (n_tables, corpus) -> (overall,
# band_08_10). The full banded table lives in PLANS.md round 9.
_NEARDUP_MEASURED_RECALL = {
    (2, 20_000): (0.809, 0.9997),
    (4, 20_000): (0.941, 1.0),
    (2, 200_000): (0.272, 0.9978),
    (4, 200_000): (0.420, 1.0),
    (2, 2_000_000): (0.064, 0.9954),
    (4, 2_000_000): (0.117, 1.0),
}


def neardup_recall_info(n_tables: int = 4, n_vectors: int | None = None) -> dict:
    """Recall metadata for a ``neardup_pairs_lsh`` table count — the
    neardup sibling of :func:`ann_recall_info`, so the angular recall
    trade is programmatic at call sites instead of buried in PLANS.md.
    Returns the measured point nearest the given corpus size (measured
    at 20k / 200k / 2M vectors): overall recall at threshold 0.4 and
    recall on the >=0.8-cosine band (the pairs dedup acts on).
    Recall is monotone in L (OR-construction), so a table count above
    the largest measured L reports the largest measured L's numbers as
    a FLOOR; a count below the smallest measured L reports the
    smallest's as a CEILING — the direction is in the label either
    way, never silently wrong."""
    sizes = sorted({s for _, s in _NEARDUP_MEASURED_RECALL})
    n = n_vectors if n_vectors is not None else sizes[-1]
    nearest = min(sizes, key=lambda s: abs(s - n))
    ls = sorted({l for l, _ in _NEARDUP_MEASURED_RECALL})
    below = [l for l in ls if l <= n_tables]
    l_eff = max(below) if below else min(ls)
    overall, high = _NEARDUP_MEASURED_RECALL[(l_eff, nearest)]
    out = {
        "preset": f"{n_tables}-table",
        "measured_at": nearest,
        "recall_band_08_10": high,
        "recall_overall_t04": overall,
    }
    if l_eff != n_tables:
        bound = "floor" if below else "ceiling"
        out["preset"] += f" ({bound}: measured at L={l_eff}; monotone in L)"
    return out


def ann_recall_info(n_tables: int = 1) -> dict:
    """Recall metadata for an ``ann_lsh_topk`` table count: measured
    recall@k where the round-6 campaign measured it, else the
    OR-construction model 1-(1-r)^L extrapolated from the measured
    single-table r. Stamped into stress telemetry alongside the
    operator's timings."""
    if n_tables in _ANN_MEASURED_RECALL:
        return {
            "recall_preset": f"{n_tables}-table",
            "measured_recall": _ANN_MEASURED_RECALL[n_tables],
        }
    r = _ANN_MEASURED_RECALL[1]
    return {
        "recall_preset": f"{n_tables}-table (model)",
        "model_recall": round(1.0 - (1.0 - r) ** n_tables, 4),
    }


def ann_lsh_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int | None = None,
    k: int = 5,
    block_size: int = 4096,
    target_bucket: int = 4096,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: brute force within each LSH bucket. The bucket
    shuffle is the only shuffle of the corpus; the planes knob trades
    recall for cost, and ``n_tables`` is the recall lever: L
    independent hyperplane tables (OR-construction) each bucket the
    corpus, candidates are unioned and deduped — recall rises
    1-(1-r)^L for per-table recall r, at L x the scoring cost
    (measured: 95.2 / 99.7 / 100 % recall@5 at L=1/2/4; the default
    single table misses ~5 % — :func:`ann_recall_info` surfaces the
    trade at call sites). Two scale guards:

    - ``n_planes=None`` (the default) derives the plane count from the
      corpus size so the MEAN bucket holds ~``target_bucket`` vectors —
      a fixed plane count would leave N/2^planes vectors per bucket and
      O((N/2^planes)^2) work growing quadratically with the corpus.
      (Registered queries pin ``n_planes`` explicitly so their static
      oracles stay valid; the derivation costs one count() over ids.)
    - In-bucket scoring goes through sub-blocked block pairs
      (:func:`_bucketed_all_pairs_topk`), so per-task memory is bounded
      by ``block_size`` even when one degenerate bucket swallows the
      corpus — no single pandas frame ever holds a whole bucket.

    IVF-style: swap the bucket expression for nearest-centroid."""
    if n_planes is None:
        import math

        n_buckets = _derive_n_buckets(df.count(), target_bucket)
        n_planes = max(1, math.ceil(math.log2(n_buckets)))
    from functools import reduce

    tables = [
        lsh_bucket(df, vec_col, id_col, n_planes, plane_offset=t * n_planes)
        .withColumn("bucket", F.col("bucket") + F.lit(t * (1 << n_planes)))
        for t in range(n_tables)
    ]
    b = reduce(lambda x, y: x.union(y), tables)
    return _bucketed_all_pairs_topk(
        b, "bucket", id_col, k, block_size, dedup_pairs=n_tables > 1
    )


# neardup_pairs auto-route horizon: the exact block-nested-loop is the
# right plan while the block-pair count B*(B+1)/2 stays small — at 64
# blocks (262,144 vectors at the default block size IF ids are dense;
# the router counts the kernel's real id-range block population, so
# sparse ids hit the horizon at proportionally fewer rows) that is
# 2,080 matmul tasks, comfortably a single wide stage; at 10x the
# corpus it would be ~205k tasks growing quadratically from there
# (sf1.0 measured the family at 9.1x wall for 10x data — the suite's
# worst ratio).
NEARDUP_MAX_EXACT_BLOCKS = 64


def neardup_auto_route(
    n_blocks: int,
    max_exact_blocks: int = NEARDUP_MAX_EXACT_BLOCKS,
) -> str:
    """Route decision for :func:`neardup_pairs` — the EXECUTABLE form
    of the scale escape that was previously a docstring (VERDICT r8
    Next #1), mirroring ``simhash_auto_bands``: a pure function of the
    BLOCK population, pinned by tests at its switch points.

    ``n_blocks`` is the number of id-range blocks the exact kernel
    would actually materialize — ``countDistinct(id // block_size)``
    over the non-null-vector rows (:func:`neardup_corpus_stats`), NOT
    ceil(rows / block_size): rows only lower-bound blocks, and
    sparse/non-dense ids can pack 262k rows into thousands of
    near-empty blocks whose pairwise matmuls are exactly the quadratic
    blow-up the escape exists to avoid (ADVICE r9, medium).

    Returns ``"exact"`` while the corpus packs into at most
    ``max_exact_blocks`` blocks — the exact all-pairs plan costs
    B*(B+1)/2 block-pair matmuls, quadratic in the corpus, so it is
    only the right plan while that product is bounded (2,080 tasks at
    the 64-block default). Above the horizon returns ``"lsh"``: the
    same verify arithmetic runs inside LSH buckets only, so total work
    scales with sum(bucket_blocks^2) ~ N * bucket/block^2 instead of
    N^2, at a MEASURED recall (see ``neardup_pairs_lsh``).

    Reference contract being scaled: the dedup-by-content sample
    (SolaceRecordTest.java:143-147) — near-duplicate removal must stay
    runnable as the corpus grows past what exact pairing can touch."""
    return "exact" if n_blocks <= max_exact_blocks else "lsh"


def neardup_corpus_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_size: int = 4096,
) -> tuple[int, int]:
    """(n_vectors, n_blocks) for the auto route, in ONE aggregate job.
    ``n_blocks`` counts the exact kernel's own block expression
    (:func:`_blk_expr`) so routing can never diverge from what
    ``_pack_blocks`` materializes; countDistinct over the
    low-cardinality block id is a cheap partial-aggregated shuffle."""
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(_blk_expr(id_col, block_size)).alias("n_blocks"),
        )
        .first()
    )
    return int(row["n"]), int(row["n_blocks"])


def neardup_route_info(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_size: int = 4096,
    n_tables: int = 4,
) -> dict:
    """One-call observability for the auto route (the planner's
    ``EXPLAIN`` for near-dup): what ``neardup_pairs(route="auto")``
    will decide for THIS corpus, what the exact plan would cost in
    block-pair matmuls, and — on the LSH route — the measured angular
    recall contract the escape buys (:func:`neardup_recall_info`).
    Costs the same single aggregate job the auto route itself pays."""
    n, n_blocks = neardup_corpus_stats(df, vec_col, id_col, block_size)
    route = neardup_auto_route(n_blocks)
    info = {
        "n_vectors": n,
        "n_blocks": n_blocks,
        "route": route,
        "exact_block_pairs": n_blocks * (n_blocks + 1) // 2,
        "horizon_blocks": NEARDUP_MAX_EXACT_BLOCKS,
    }
    if route == "lsh":
        info["recall"] = neardup_recall_info(n_tables, n)
    return info


def neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    block_size: int = 4096,
    route: str = "exact",
    n_tables: int = 4,
    target_bucket: int = 8192,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold — exact
    all-pairs via block-nested-loop over packed blocks (blk_a <= blk_b;
    one matmul per block pair).

    ``route`` picks the plan: ``"exact"`` (the O(B^2) baseline, right
    for bounded batches), ``"lsh"`` (bucketed candidates — the corpus
    scale path, see :func:`neardup_pairs_lsh`), or ``"auto"``, which
    counts the BLOCK population once (the exact kernel's own
    ``id // block_size`` expression, so sparse ids route honestly —
    ADVICE r9) and switches at :func:`neardup_auto_route`'s 64-block
    horizon (262,144 vectors at the default block size when ids are
    dense; fewer rows suffice when ids are sparse). Below the horizon
    the auto route returns the exact path's output verbatim — the
    derivation is gate-provable against the exact oracle, the same
    contract ``dedup_simhash_pairs_auto`` pins for band derivation."""
    if route == "auto":
        n, n_blocks = neardup_corpus_stats(df, vec_col, id_col, block_size)
        route = neardup_auto_route(n_blocks)
        if route == "lsh":
            return neardup_pairs_lsh(
                df,
                vec_col,
                id_col,
                threshold,
                block_size,
                n_tables=n_tables,
                target_bucket=target_bucket,
                _n_vectors=n,
            )
    elif route == "lsh":
        return neardup_pairs_lsh(
            df,
            vec_col,
            id_col,
            threshold,
            block_size,
            n_tables=n_tables,
            target_bucket=target_bucket,
        )
    elif route != "exact":
        raise ValueError(f"route must be exact|lsh|auto, got {route!r}")
    from pyspark.storagelevel import StorageLevel

    # both sides of the blk_a <= blk_b self-join read this frame
    packed = _pack_blocks(df, vec_col, id_col, block_size).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = packed.select(
        F.col("blk").alias("ablk"),
        F.col("ids").alias("aids"),
        F.col("mat").alias("amat"),
    )
    b = packed.select(
        F.col("blk").alias("bblk"),
        F.col("ids").alias("bids"),
        F.col("mat").alias("bmat"),
    )

    def score(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ia = np.asarray(r.aids, dtype=np.int64)
                ib = np.asarray(r.bids, dtype=np.int64)
                cos = _block_scores(_unpack(r.amat), _unpack(r.bmat))
                # prefilter with margin: rounding moves a value < 5e-7
                mask = np.isfinite(cos) & (cos >= threshold - 1e-6)
                if r.ablk == r.bblk:
                    mask &= ia[:, None] < ib[None, :]
                ii, jj = np.nonzero(mask)
                # threshold prunes most of the block pair, but a
                # near-dup-dense diagonal block can still match
                # millions of pairs — slice so no emission becomes an
                # unbounded Arrow batch
                yield from _emit_sliced(
                    pd.DataFrame(
                        {"id_a": ia[ii], "id_b": ib[jj], "cos_raw": cos[ii, jj]}
                    )
                )

    # pure non-equi block pairing: only nested-loop shapes exist, and
    # one side WILL be broadcast — acceptable only because this is the
    # documented exact O(B^2) baseline for bounded batches; at corpus
    # scale route through lsh_bucket (equi-join, spillable) instead.
    # Repartition the PAIR frame before scoring: the nested-loop join
    # leaves all B(B+1)/2 pair rows in the streamed side's <= B
    # non-empty partitions, so tasks score up to B matmuls serially
    # (measured at sf1.0: 5 blocks -> 15 pairs in 5 tasks, 13-17 s
    # wall; with the pairs spread, wall tracks the SLOWEST single
    # matmul). The extra shuffle moves one (amat, bmat) row per pair —
    # megabytes per row against a ~1 s matmul per row, the right trade
    # for any block count, and hash-on-(ablk, bblk) keeps it even.
    sc = df.sparkSession.sparkContext
    raw = (
        a.join(b, F.col("ablk") <= F.col("bblk"))
        .repartition(sc.defaultParallelism, F.col("ablk"), F.col("bblk"))
        .mapInPandas(score, "id_a long, id_b long, cos_raw double")
    )
    return attach_plan_caches(
        raw.select(
            "id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim")
        ).filter(F.col("cos_sim") >= threshold),
        (packed,),
    )


def neardup_pairs_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    block_size: int = 4096,
    n_planes: int | None = None,
    n_tables: int = 4,
    target_bucket: int = 8192,
    _n_vectors: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via LSH-bucketed candidate generation — the
    corpus-scale route of :func:`neardup_pairs`. Each of ``n_tables``
    independent hyperplane tables buckets every vector map-side
    (:func:`lsh_bucket`, the same deterministic plane stream as
    ``ann_lsh_topk``); the EXACT verify arithmetic of the baseline
    (integer-quantized cosine, threshold on the rounded value) runs
    within each bucket only, sub-blocked so per-task memory is bounded
    regardless of bucket skew. Total work scales with
    sum_b(blocks_b^2) ~ N * target_bucket / block_size^2, not N^2, and
    the only corpus shuffle is the bucket grouping.

    Recall is the OR-construction over tables, 1-(1-p^planes)^L for
    per-plane collision p = 1 - angle/pi — angular, so HIGH-similarity
    pairs (the ones dedup acts on) are found with high probability
    while boundary-threshold pairs need more tables. Measured on the
    stress embedding corpus against the exact route (scripts/
    measure_neardup_recall.py, round 9) — see PLANS.md for the
    recall/cost table behind the ``n_tables`` presets; precision is 1.0
    by construction (every candidate is exact-verified).

    ``n_planes=None`` derives the plane count from the corpus size so
    the MEAN bucket holds ~``target_bucket`` vectors (the same guard as
    ``ann_lsh_topk``: a fixed plane count would leave N/2^planes
    vectors per bucket and quadratic in-bucket work). ``n_planes=0``
    degenerates to a single bucket per table — exact all-pairs, used by
    the equivalence tests."""
    import math
    from functools import reduce

    if n_planes is None:
        n = (
            _n_vectors
            if _n_vectors is not None
            else df.filter(F.col(vec_col).isNotNull()).count()
        )
        n_buckets = _derive_n_buckets(n, target_bucket)
        n_planes = max(1, math.ceil(math.log2(n_buckets))) if n_buckets > 1 else 0
    if n_planes == 0:
        # single-bucket degenerate form: one table IS exact all-pairs
        # (lsh_bucket with 0 planes maps every vector to bucket 0);
        # extra tables would only duplicate the identical work
        n_tables = 1
    tables = [
        lsh_bucket(df, vec_col, id_col, n_planes, plane_offset=t * n_planes)
        .withColumn("bucket", F.col("bucket") + F.lit(t << n_planes))
        for t in range(n_tables)
    ]
    b = reduce(lambda x, y: x.union(y), tables)
    return _bucketed_threshold_pairs(
        b, "bucket", id_col, threshold, block_size, dedup_pairs=len(tables) > 1
    )


def _bucketed_threshold_pairs(
    b: DataFrame,
    bucket_col: str,
    id_col: str,
    threshold: float,
    block_size: int,
    dedup_pairs: bool = False,
) -> DataFrame:
    """All pairs above a cosine threshold within each bucket, with the
    same bounded-memory sub-blocking as :func:`_bucketed_all_pairs_topk`
    (per-bucket row_number -> ~block_size sub-blocks -> one matmul per
    same-bucket block pair) and the same integer-exact arithmetic as
    the exact :func:`neardup_pairs` kernel. Blocks are slices of the
    id-ordered bucket, so for ablk < bblk every a-id precedes every
    b-id and the canonical ``id_a < id_b`` orientation is free; the
    diagonal block masks it explicitly."""
    from pyspark.storagelevel import StorageLevel

    # both sides of the block-pair self-join read this (see
    # _bucketed_all_pairs_topk for the persist rationale)
    packed = _packed_bucket_blocks(b, bucket_col, id_col, block_size).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = packed.select(
        F.col("bucket").alias("abucket"),
        F.col("blk").alias("ablk"),
        F.col("ids").alias("aids"),
        F.col("mat").alias("amat"),
    )
    bb = packed.select(
        F.col("bucket").alias("bbucket"),
        F.col("blk").alias("bblk"),
        F.col("ids").alias("bids"),
        F.col("mat").alias("bmat"),
    )

    def score(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ia = np.asarray(r.aids, dtype=np.int64)
                ib = np.asarray(r.bids, dtype=np.int64)
                cos = _block_scores(_unpack(r.amat), _unpack(r.bmat))
                # prefilter with margin, exactly like the exact kernel:
                # rounding moves a value < 5e-7
                mask = np.isfinite(cos) & (cos >= threshold - 1e-6)
                if r.ablk == r.bblk:
                    mask &= ia[:, None] < ib[None, :]
                ii, jj = np.nonzero(mask)
                yield from _emit_sliced(
                    pd.DataFrame(
                        {"id_a": ia[ii], "id_b": ib[jj], "cos_raw": cos[ii, jj]}
                    )
                )

    # equi-key (bucket) sort-merge join — spillable where the exact
    # route's pure non-equi pairing forces a broadcast nested loop
    scored = (
        a.join(
            bb.hint("merge"),
            (F.col("abucket") == F.col("bbucket")) & (F.col("ablk") <= F.col("bblk")),
        )
        .mapInPandas(score, "id_a long, id_b long, cos_raw double")
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    if dedup_pairs:
        # multi-table OR-construction: a pair colliding in several
        # tables recurs with an identical integer-exact cosine —
        # collapse the copies
        scored = scored.distinct()
    return attach_plan_caches(scored, (packed,))


def _quantized_vectors(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, qv array<double> of exact quantized integers) — map-side."""

    def k(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = _quantize(_to_matrix(pdf[vec_col]))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(dtype=np.int64), "qv": list(q)}
            )

    # NOT spread (round 14, session 5 — byte-floor spread tried here
    # and REVERTED): this frame is persisted and then re-read by MANY
    # small sequential training jobs (seed collect + one partial-sums
    # job per Lloyd/PQ iteration); spreading the one-task scan to 32
    # cached partitions multiplies every one of those jobs' task count
    # by 32, and the scheduling overhead swamps the kernel win —
    # measured semantic_dedup 4.67 -> 8.33 s, ann_ivf_pq_cosine
    # 3.11 -> 4.12 s at sf1.0 (in-process interleaved low-steal mins).
    # The sq8 sites below keep the spread: their outputs are consumed
    # once by a follow-up exchange, not by a job chain.
    return (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())  # undecoded rows carry no vector
        .mapInPandas(k, f"{id_col} long, qv array<double>")
    )


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.floor(np.abs(x) + 0.5) * np.sign(x)


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    n_iters: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic quantized Lloyd's k-means — real trained centroids
    for the IVF coarse quantizer (replacing the seed-vector stand-in).

    Engine-exact by construction, so a DuckDB oracle can replay the
    whole training loop bit-for-bit:

    - vectors and centroids are 2^20-quantized integers; every dot
      product / squared norm is an exact integer sum in float64
    - assignment = argmax cosine, ties to the smallest centroid id
      (numpy argmax takes the first maximum; centroid rows are kept
      id-sorted)
    - centroid update = elementwise mean re-quantized with
      round-half-away-from-zero: sum and count are exact integers, the
      division is one IEEE op, the rounding matches SQL round()
    - FIXED iteration count (no convergence epsilon — a float
      tolerance would be another cross-engine hazard); empty cells
      keep their previous centroid

    Scale: assignment is map-side (centroids ride the task closure,
    n_cells x dim ints); the update is one posexplode + groupBy(cell,
    pos) whose shuffle carries partial integer sums — the only driver
    traffic is the n_cells x dim aggregated sums per iteration.

    Returns (cids, cmat) as numpy arrays (id-sorted)."""
    qdf = _quantized_vectors(df, vec_col, id_col).persist()
    out = _kmeans_from_quantized(qdf, id_col, n_cells, n_iters)
    qdf.unpersist()
    if out is None:
        raise ValueError(
            f"k-means seeding found no vectors with {id_col} < {n_cells}; "
            "pass centroids explicitly or renumber ids"
        )
    return out


def _warn_if_seedless_nonempty(
    qdf: DataFrame, id_col: str, k: int, knob: str
) -> None:
    """ADVICE r14: an empty seed set is a legitimate zero-row outcome
    only when the corpus itself is empty (or every sub-``k`` id is
    NULL-vectored); a corpus whose ids merely start above ``k`` is a
    numbering mistake that would silently return empty frames from
    kmeans_assign / semantic_dedup / ivf_pq_topk / pq_encode. Runs one
    take(1) probe — on the degenerate empty-seed path only, never the
    hot path — and warns to stderr so the misuse is loud without
    changing any query's (empty) result."""
    import sys

    if qdf.limit(1).count() > 0:
        print(
            f"[solace-graft] WARNING: corpus is non-empty but has no "
            f"vectors with {id_col} < {knob}={k} — training seeds are "
            "empty, so this operator returns an EMPTY result. If the "
            "corpus is real, renumber ids to start at 0 or pass "
            "centroids/codebooks explicitly.",
            file=sys.stderr,
        )


def _kmeans_from_quantized(
    qdf: DataFrame, id_col: str, n_cells: int, n_iters: int
) -> "tuple[np.ndarray, np.ndarray] | None":
    """Lloyd loop over an (already persisted) quantized frame — cosine
    assignment (the IVF coarse quantizer; final assignment reuses
    :func:`_assign_cells`). PQ subquantizer training has its own
    one-pass trainer under squared-L2 (:func:`_pq_train`).

    Each update reads the corpus through :func:`_cell_update_sums`:
    the assignment kernel folds the per-(cell, pos) sums map-side, so
    only n_cells x dim partial rows per task cross back to the JVM —
    not the full corpus re-serialized through Arrow and posexploded to
    |V| x dim rows (the round-14-removed shape). Bit-identical: every
    accumulated value is an integer-valued float64 (quantized
    components and their partial sums stay < 2^53), so the sums are
    exact in any association order — the same argument that already
    made the JVM double sum engine-exact."""
    seed = sorted(
        (int(r[id_col]), np.asarray(r["qv"], dtype=np.float64))
        for r in qdf.filter(F.col(id_col) < n_cells).collect()
    )
    if not seed:
        # EMPTY seed set (every id < n_cells has a NULL vector, or the
        # corpus is empty): return None and let each query path emit
        # its empty frame — the DuckDB oracles' seed CTEs are empty on
        # such a corpus, so every centroid join collapses to zero rows
        # (the round-14 fuzz tier falsified the former unconditional
        # raise on exactly this corpus). The public kmeans_centroids
        # operator still raises — misuse stays loud there. ADVICE r14:
        # a NON-empty corpus whose ids simply start above n_cells would
        # otherwise look like a clean zero-row result — probe (one
        # take(1) job, on this degenerate path only) and warn loudly.
        _warn_if_seedless_nonempty(qdf, id_col, n_cells, "n_cells")
        return None
    cids = np.array([c for c, _ in seed], dtype=np.int64)
    cmat = np.stack([v for _, v in seed])

    for _ in range(n_iters):
        rows = (
            _cell_update_sums(qdf, cids, cmat)
            .groupBy("cell", "pos")
            .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
            .collect()
        )
        new = cmat.copy()
        for r in rows:
            i = int(np.searchsorted(cids, r["cell"]))
            new[i, int(r["pos"])] = _round_half_away(r["s"] / r["cnt"])
        cmat = new
    return cids, cmat


def _cell_update_sums(
    qdf: DataFrame, cids: np.ndarray, cmat: np.ndarray
) -> DataFrame:
    """Fused assign + per-(cell, pos) partial sums for one Lloyd
    update. The whole partition accumulates into an n_cells x dim
    float64 array (plus per-cell counts); only those partials are
    emitted. NaN components poison their cell's sum exactly as the
    former JVM double sum did (NaN + x = NaN in either engine), and a
    cell's cnt column repeats its vector count per position — the same
    value the former count-per-(cell, pos) group produced, since every
    assigned vector contributes one component at every position."""
    b_cids, b_cmat = cids.copy(), cmat.copy()

    def sums(batches):
        n_cells, dim = b_cmat.shape
        acc = np.zeros((n_cells, dim))
        cnt = np.zeros(n_cells, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = _unpack(pdf["qv"])
            cos = _block_scores(qm, b_cmat)
            # -inf only for the argmax (NaN would poison it) — the
            # same mask _assign_cells applies
            best = np.where(np.isnan(cos), -np.inf, cos).argmax(axis=1)
            np.add.at(acc, best, qm)
            np.add.at(cnt, best, 1)
        hot = np.flatnonzero(cnt)
        if len(hot):
            yield pd.DataFrame(
                {
                    "cell": np.repeat(b_cids[hot], dim),
                    "pos": np.tile(np.arange(dim, dtype=np.int32), len(hot)),
                    "s": acc[hot].ravel(),
                    "cnt": np.repeat(cnt[hot], dim),
                }
            )

    return qdf.mapInPandas(sums, "cell long, pos int, s double, cnt long")


def _assign_cells(
    qdf: DataFrame, id_col: str, cids: np.ndarray, cmat: np.ndarray
) -> DataFrame:
    """Map-side nearest-centroid assignment over quantized vectors."""
    b_cids, b_cmat = cids.copy(), cmat.copy()

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = _unpack(pdf["qv"])
            cos = _block_scores(qm, b_cmat)
            # -inf only for the argmax (NaN would poison it); the
            # REPORTED cosine keeps the original NaN — the oracle
            # likewise maps NaN to -inf inside ORDER BY only
            masked = np.where(np.isnan(cos), -np.inf, cos)
            best = masked.argmax(axis=1)  # first max -> smallest cid (sorted)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "qv": pdf["qv"],
                    "cell": b_cids[best],
                    "cos_raw": cos[np.arange(len(best)), best],
                }
            )

    return qdf.mapInPandas(
        assign, f"{id_col} long, qv array<double>, cell long, cos_raw double"
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    n_iters: int = 2,
) -> DataFrame:
    """Train quantized k-means centroids, then assign every vector to
    its cell: (id, cell, cos_sim rounded to 6). The trained centroids
    drop into ivf_topk's join shape unchanged — this is the 'swap in
    real centroids' point, implemented. One persisted quantized frame
    feeds both the training loop and the final assignment (the Arrow
    quantization kernel runs once). Empty corpus -> empty result."""
    qdf = _quantized_vectors(df, vec_col, id_col).persist()
    # no isEmpty() probe (round 15): an empty corpus has an empty seed
    # set, so the trained-None branch below already returns the
    # identical empty frame — the probe was one redundant sequential
    # driver job per call (VERDICT r14 Next #5)
    trained = _kmeans_from_quantized(qdf, id_col, n_cells, n_iters)
    if trained is None:
        # no trainable seeds (empty corpus, or every id < n_cells
        # NULL): the oracle's seed CTE is empty and its centroid join
        # yields zero rows
        qdf.unpersist()
        return attach_plan_caches(
            df.sparkSession.createDataFrame(
                [], f"{id_col} long, cell long, cos_sim double"
            ),
            (),
        )
    cids, cmat = trained
    return attach_plan_caches(
        _assign_cells(qdf, id_col, cids, cmat).select(
            F.col(id_col),
            "cell",
            F.round("cos_raw", 6).alias("cos_sim"),
        ),
        (qdf,),
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int | None = None,
    k: int = 5,
    block_size: int = 4096,
    target_bucket: int = 4096,
    centroids: "tuple[np.ndarray, np.ndarray] | None" = None,
) -> DataFrame:
    """IVF-style ANN: assign each vector to its highest-cosine centroid
    (quantized integer dots -> the argmax is deterministic; ties break
    to the smallest centroid id), then top-k search is brute force
    within the cell — identical shuffle profile to lsh_bucket: the
    corpus moves once, keyed by cell.

    The coarse quantizer is pluggable: pass ``centroids=(cids, cmat)``
    from :func:`kmeans_centroids` for trained cells; default is the
    deterministic seed sample (vectors with id < n_cells), which the
    registered query pins for its static oracle. Assignment is
    map-side either way — centroids ride the task closure
    (n_cells x dim ints, small by definition).

    Scale guards mirror :func:`ann_lsh_topk`: ``n_cells=None`` derives
    the cell count from the corpus size (mean cell ~``target_bucket``
    vectors), and in-cell scoring is sub-blocked so no task
    materializes a whole cell."""
    if centroids is None:
        if n_cells is None:
            n_cells = _derive_n_buckets(df.count(), target_bucket)
        seed = sorted(
            (int(r[id_col]), np.asarray(r["qv"], dtype=np.float64))
            for r in _quantized_vectors(
                df.filter(F.col(id_col) < n_cells), vec_col, id_col
            ).collect()
        )
        if not seed:
            # empty corpus (or no ids under n_cells): nothing to search
            return df.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cos_sim double, rank int"
            )
        centroids = (
            np.array([c for c, _ in seed], dtype=np.int64),
            np.stack([v for _, v in seed]),
        )
    cids, cmat = centroids
    qdf = _quantized_vectors(df, vec_col, id_col)
    assigned = _assign_cells(qdf, id_col, cids, cmat).select(
        id_col, F.col("qv").alias("q"), "cell"
    )
    return _bucketed_all_pairs_topk(assigned, "cell", id_col, k, block_size)


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int | None = 8,
    n_iters: int = 2,
    threshold: float = 0.7,
    block_size: int = 4096,
    target_bucket: int = 8192,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space with the
    engine-exact quantized Lloyd loop, then within each cluster mark a
    vector as a semantic duplicate iff some LOWER-ID cluster member has
    rounded cosine >= ``threshold`` with it (greedy keep-first — which
    vectors are marked duplicates is deterministic, and ``dup_of``
    reports the smallest lower-id same-cell member at or above the
    threshold).  NOTE: the rule is non-transitive, so ``dup_of`` may
    itself be a duplicate (chain A-B-C with cos(A,B) and cos(B,C) over
    the threshold but cos(A,C) under it marks both B and C, with C's
    ``dup_of`` = B) — consumers wanting a KEPT representative must
    follow ``dup_of`` links to a non-dup root, not read it directly.

    Output: ``(id, cell, is_dup boolean, dup_of nullable)`` — one row
    per vector with a non-NULL embedding.

    Engine-exactness: clustering is :func:`kmeans_centroids`'s loop
    (integer-quantized vectors, exact integer dots, fixed iteration
    count, round-half-away centroid updates), assignment ties break to
    the smallest centroid id, and the in-cluster cosines are the same
    integer-exact arithmetic as :func:`neardup_pairs` with the
    threshold applied to the 6-decimal ROUNDED value — so a DuckDB
    oracle can replay training, assignment, and pruning bit-for-bit.

    Scale (100 TB): this is the published corpus-curation shape —
    clustering caps the pairwise work at sum_c(|cell_c|^2) instead of
    N^2. ``n_cells=None`` derives the cell count so the MEAN cell
    holds ~``target_bucket`` vectors (the same guard as ``ivf_topk``);
    in-cell pairing runs through :func:`_bucketed_threshold_pairs`
    (sub-blocked, spillable sort-merge join — per-task memory bounded
    regardless of cell skew). Assignment is map-side (centroids ride
    the task closure); the only corpus shuffles are the Lloyd update's
    integer partial sums and the cell grouping. NaN cosines (zero-norm
    vectors) never qualify as duplicates — the kernel's isfinite mask;
    the oracle guards norms > 0.
    """
    from pyspark.storagelevel import StorageLevel

    # persist the quantized frame FIRST and derive n_cells from it
    # (same order as ivf_pq_topk) — deriving from the raw df would pay
    # one extra full corpus scan before the persisted frame exists
    qdf = _quantized_vectors(df, vec_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if n_cells is None:
        n_cells = _derive_n_buckets(qdf.count(), target_bucket)
    # no isEmpty() probe (round 15, VERDICT r14 Next #5): empty corpus
    # => empty seed => the trained-None branch returns the identical
    # empty frame, one sequential driver job cheaper
    trained = _kmeans_from_quantized(qdf, id_col, n_cells, n_iters)
    if trained is None:
        # no trainable seeds (or empty corpus): oracle parity — its
        # seed CTE is empty
        qdf.unpersist()
        return attach_plan_caches(
            df.sparkSession.createDataFrame(
                [], f"{id_col} long, cell long, is_dup boolean, dup_of long"
            ),
            (),
        )
    cids, cmat = trained
    # both the pair generation and the final per-vector join read the
    # assignment — persist it once (the kernel quantizes + assigns once)
    assigned = (
        _assign_cells(qdf, id_col, cids, cmat)
        .select(id_col, F.col("qv").alias("q"), "cell")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs = _bucketed_threshold_pairs(
        assigned, "cell", id_col, threshold, block_size
    )
    dups = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("dup_of")
    )
    out = (
        assigned.select(id_col, "cell")
        .join(dups, id_col, "left")
        .select(
            id_col,
            "cell",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
        )
    )
    return attach_plan_caches(
        out, (qdf, assigned, *pairs.plan_caches._frames)
    )


def pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 2,
    k_codes: int = 4,
    n_iters: int = 1,
    _qdf: DataFrame | None = None,
    empty_ok: bool = False,
) -> "list[tuple[np.ndarray, np.ndarray]] | None":
    """Train product-quantization codebooks: the quantized vector is
    split into ``m`` contiguous subspaces (dims [d*s div m,
    d*(s+1) div m) — deterministic under uneven splits) and all run the
    engine-exact Lloyd loop together under squared-L2 assignment
    (:func:`_pq_train`) with seeds = subvectors of ids < ``k_codes``.
    Returns ``m`` (cids, cmat) codebooks, id-sorted.

    Scale: each subspace's training shuffles only integer partial sums
    (k_codes x subdim per iteration reaches the driver); the corpus is
    read through one shared persisted quantized frame (``_qdf`` lets a
    caller that already holds one — ivf_pq_topk — pass it in instead of
    double-caching the identical plan)."""
    from pyspark.storagelevel import StorageLevel

    own = _qdf is None
    qdf = (
        _quantized_vectors(df, vec_col, id_col).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        if own
        else _qdf
    )
    try:
        books = _pq_train(qdf, id_col, m, k_codes, n_iters)
    finally:
        if own:
            qdf.unpersist()
    if books is None and not empty_ok:
        raise ValueError(
            f"PQ seeding found no vectors with {id_col} < {k_codes}; "
            "renumber ids or pass codebooks explicitly"
        )
    return books


def _pq_sub_d2(sub: np.ndarray, cmat: np.ndarray) -> np.ndarray:
    """Exact squared-L2 distances between quantized subvectors and a
    codebook — the PQ subquantizer metric (reconstruction error cares
    about magnitude, which cosine discards). Exact by the same argument
    as :func:`_block_scores`: components are integers < 2^21, so every
    term of d2 = ||x||^2 - 2*x.c + ||c||^2 is an integer-valued float
    < 2^53 — identical on every engine; DuckDB replays it with three
    list_inner_products. Callers take argmin axis=1 (first minimum =
    smallest code id over id-sorted rows — the oracle's ORDER BY d2,
    cid)."""
    return (
        (sub * sub).sum(axis=1)[:, None]
        - 2.0 * (sub @ cmat.T)
        + (cmat * cmat).sum(axis=1)[None, :]
    )


def _pq_train(
    qdf: DataFrame,
    id_col: str,
    m: int,
    k_codes: int,
    n_iters: int,
    seed_rows: "list[tuple[int, np.ndarray]] | None" = None,
) -> "list[tuple[np.ndarray, np.ndarray]] | None":
    """One-pass-per-iteration PQ training: all ``m`` subquantizers
    advance together, so each Lloyd iteration reads the corpus ONCE.
    (The naive per-subspace formulation scans the corpus m times per
    iteration — at 100 TB that is m redundant full IO passes.)

    Per iteration: a map-side kernel assigns every subvector to its
    nearest codebook entry (exact integer squared-L2, ties to the
    smallest code id) and folds the per-(subspace, cell, position)
    sums in the same pass — the whole partition accumulates into m
    k_codes x subdim arrays, and only those partials cross back to the
    JVM (the former shape re-serialized the full corpus through Arrow
    and posexploded it to |V| x dim rows per iteration). Bit-identical
    by the integer-in-float64 argument: components and partial sums
    stay exact integers < 2^53, so association order is irrelevant.
    One groupBy(s, cell, spos) merges the partials; only
    m * k_codes * subdim aggregated rows reach the driver.

    ``seed_rows`` (round 15, VERDICT r14 Next #5): a caller that can
    derive the sorted (id, vector) seed list WITHOUT a Spark job passes
    it in — the residual path computes seeds driver-side from the
    already-collected coarse seeds' assignment (tiny numpy op), which
    removes the full-corpus residual-kernel pass the seed collect used
    to trigger (the id filter cannot push below the Python kernel, so
    collecting seeds from the residual frame computed EVERY partition).
    None keeps the collect."""
    seed = (
        sorted(
            (int(r[id_col]), np.asarray(r["qv"], dtype=np.float64))
            for r in qdf.filter(F.col(id_col) < k_codes).collect()
        )
        if seed_rows is None
        else seed_rows
    )
    if not seed:
        # empty seed set: None, same contract as _kmeans_from_quantized
        # — the PQ oracles' seed CTEs are empty on such a corpus and
        # every downstream join yields zero rows; the public
        # pq_codebooks operator translates this back into the loud
        # ValueError for direct misuse. Same ADVICE-r14 probe+warn for
        # the mis-numbered-corpus case (degenerate path only); a caller
        # handing in precomputed (empty) seed_rows probes its own
        # source frame instead — qdf here may be an expensive
        # derived frame (the residual kernel) a probe would execute.
        if seed_rows is None:
            _warn_if_seedless_nonempty(qdf, id_col, k_codes, "k_codes")
        return None
    cids = np.array([c for c, _ in seed], dtype=np.int64)
    d = len(seed[0][1])
    books = [
        np.stack([v[d * s // m : d * (s + 1) // m] for _, v in seed])
        for s in range(m)
    ]

    for _ in range(n_iters):
        b_books = [b.copy() for b in books]
        b_cids = cids.copy()

        def sub_sums(batches):
            accs = [np.zeros_like(bm) for bm in b_books]
            cnts = np.zeros((m, len(b_cids)), dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qm = _unpack(pdf["qv"])
                dd = qm.shape[1]
                for s, bm in enumerate(b_books):
                    sub = qm[:, dd * s // m : dd * (s + 1) // m]
                    best = _pq_sub_d2(sub, bm).argmin(axis=1)
                    np.add.at(accs[s], best, sub)
                    np.add.at(cnts[s], best, 1)
            frames = []
            for s in range(m):
                hot = np.flatnonzero(cnts[s])
                if not len(hot):
                    continue
                subdim = accs[s].shape[1]
                frames.append(
                    pd.DataFrame(
                        {
                            "s": np.full(
                                len(hot) * subdim, s, dtype=np.int32
                            ),
                            "cell": np.repeat(b_cids[hot], subdim),
                            "spos": np.tile(
                                np.arange(subdim, dtype=np.int32), len(hot)
                            ),
                            "sm": accs[s][hot].ravel(),
                            "cnt": np.repeat(cnts[s][hot], subdim),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

        rows = (
            qdf.mapInPandas(
                sub_sums, "s int, cell long, spos int, sm double, cnt long"
            )
            .groupBy("s", "cell", "spos")
            .agg(F.sum("sm").alias("sm"), F.sum("cnt").alias("cnt"))
            .collect()
        )
        new = [b.copy() for b in books]
        for r in rows:
            j = int(np.searchsorted(cids, r["cell"]))
            new[int(r["s"])][j, int(r["spos"])] = _round_half_away(
                r["sm"] / r["cnt"]
            )
        books = new
    return [(cids.copy(), b) for b in books]


def pq_encode(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 2,
    k_codes: int = 4,
    n_iters: int = 1,
    books: "list[tuple[np.ndarray, np.ndarray]] | None" = None,
) -> DataFrame:
    """Product-quantization encoding: assign every subvector to its
    nearest (squared-L2) codebook centroid and emit the code vector
    plus the reconstruction (concatenated centroids, still at quantized
    integer scale). Output: ``(id, codes array<long>, recon
    array<double>)`` — one row per non-NULL vector.

    This is the 100 TB memory path for embedding search: a dim-d
    float32 vector (4d bytes) compresses to m * ceil(log2(k)) bits
    (m=16, k=256 -> 16 bytes for d=512, a 128x reduction), and the
    codes shuffle/store in place of the raw vectors. Encoding is
    map-side — codebooks ride the task closure (m * k * subdim ints).
    Ties in the L2 argmin break to the smallest code id, and every
    distance is exact integer arithmetic, so a DuckDB oracle replays
    training + encoding bit-for-bit.

    The result carries ``plan_caches`` (the shared quantized frame on
    the ``books=None`` path — release after materializing)."""
    from pyspark.storagelevel import StorageLevel

    out_schema = f"{id_col} long, codes array<long>, recon array<double>"
    caches: tuple = ()
    qdf = _quantized_vectors(df, vec_col, id_col)
    if books is None:
        # ONE persisted quantized frame serves the emptiness probe,
        # codebook training, and the encode pass (the default path
        # previously built the frame three independent times — three
        # full corpus scans for one encode)
        qdf = qdf.persist(StorageLevel.MEMORY_AND_DISK)
        caches = (qdf,)
        # no isEmpty() probe (round 15, VERDICT r14 Next #5): an empty
        # corpus (or all-NULL vectors) has an empty seed set, and the
        # books-None branch below returns the identical empty encoding
        # — the probe was one redundant sequential driver job per call
        books = pq_codebooks(
            df, vec_col, id_col, m, k_codes, n_iters, _qdf=qdf, empty_ok=True
        )
        if books is None:
            # no trainable seeds (empty corpus, or every id < k_codes
            # NULL): the oracle's seed CTE is empty and every codebook
            # join collapses to zero rows
            qdf.unpersist()
            return attach_plan_caches(
                df.sparkSession.createDataFrame([], out_schema), ()
            )
    b_books = [(cids.copy(), cmat.copy()) for cids, cmat in books]

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = _unpack(pdf["qv"])
            n, d = qm.shape
            codes = np.zeros((n, m), dtype=np.int64)
            recon = np.zeros_like(qm)
            for s, (cids, cmat) in enumerate(b_books):
                lo, hi = d * s // m, d * (s + 1) // m
                sub = qm[:, lo:hi]
                best = _pq_sub_d2(sub, cmat).argmin(axis=1)
                codes[:, s] = cids[best]
                recon[:, lo:hi] = cmat[best]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                    "recon": list(recon),
                }
            )

    return attach_plan_caches(qdf.mapInPandas(encode, out_schema), caches)


def pq_topk(
    df: DataFrame,
    query_df: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 2,
    k_codes: int = 4,
    n_iters: int = 1,
    k: int = 5,
    block_size: int = 4096,
) -> DataFrame:
    """PQ-compressed approximate top-k cosine search (asymmetric
    distance computation): queries keep their EXACT vectors; the corpus
    is replaced by its PQ reconstructions, so scores are
    cosine(query, reconstruction) — the ADC estimate. Reuses
    :func:`brute_force_topk` unchanged: reconstructions are integer
    vectors at quantized scale, and dividing by 2^20 before the packer
    re-quantizes them bit-exactly (power-of-two scaling is lossless in
    float64), so the whole pipeline stays integer-exact and
    oracle-replayable.

    Scale: the corpus-side memory is the win (codes instead of raw
    vectors — see :func:`pq_encode`); candidate pruning composes with
    the IVF cells (:func:`ivf_topk`) or LSH buckets the same way the
    exact kernels do, since the reconstruction frame drops into any of
    them as the corpus side."""
    enc = pq_encode(df, vec_col, id_col, m, k_codes, n_iters)
    corpus = enc.select(
        F.col(id_col),
        F.transform("recon", lambda x: x / F.lit(float(QUANT))).alias(vec_col),
    )
    if query_df is None:
        query_df = df
    out = brute_force_topk(corpus, query_df, vec_col, id_col, k, block_size)
    # propagate pq_encode's shared quantized-frame cache into the
    # returned handle so the caller's single unpersist releases it
    # (brute_force_topk itself persists nothing — its packed blocks are
    # consumed once by the single score join)
    return attach_plan_caches(out, enc.plan_caches._frames)


def _bucketed_asym_topk(
    qb: DataFrame,
    cb: DataFrame,
    bucket_col: str,
    id_col: str,
    k: int,
    block_size: int,
) -> DataFrame:
    """Per-query top-k over same-bucket (query, corpus) pairs where the
    two sides carry DIFFERENT vectors — the asymmetric sibling of
    :func:`_bucketed_all_pairs_topk` (exact query vectors vs PQ
    reconstructions, or any probe-vs-index split). Same bounded-memory
    design: each side's bucket members pack into ~block_size sub-blocks
    via a spill-safe window sort, every same-bucket (query-block,
    corpus-block) pair scores with one matmul, emissions are per-query
    in-block top-k candidates in capped Arrow batches, and the final
    window ranks exactly (cos_sim desc, neighbor id asc). Self-pairs
    (same id on both sides) and non-finite scores are excluded —
    mirroring :func:`brute_force_topk`."""
    qp = _packed_bucket_blocks(qb, bucket_col, id_col, block_size).select(
        F.col("bucket").alias("qbucket"),
        F.col("ids").alias("qids"),
        F.col("mat").alias("qmat"),
    )
    cp = _packed_bucket_blocks(cb, bucket_col, id_col, block_size).select(
        F.col("bucket").alias("cbucket"),
        F.col("ids").alias("cids"),
        F.col("mat").alias("cmat"),
    )

    def score(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                qi = np.asarray(r.qids, dtype=np.int64)
                ci = np.asarray(r.cids, dtype=np.int64)
                cos = _block_scores(_unpack(r.qmat), _unpack(r.cmat))
                valid = np.isfinite(cos) & (qi[:, None] != ci[None, :])
                mask = _rowwise_topk_mask(np.round(cos, 6), valid, k)
                ii, jj = np.nonzero(mask)
                yield from _emit_sliced(
                    pd.DataFrame(
                        {
                            "query_id": qi[ii],
                            "neighbor_id": ci[jj],
                            "cos_raw": cos[ii, jj],
                        }
                    )
                )

    # equi-key (bucket) join — spillable sort-merge; each packed side
    # appears exactly once in the plan, so no persist is needed
    scored = (
        qp.join(cp.hint("merge"), F.col("qbucket") == F.col("cbucket"))
        .mapInPandas(score, "query_id long, neighbor_id long, cos_raw double")
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"))
    )
    return _rank_topk(scored, k)


def ivf_pq_topk(
    df: DataFrame,
    query_df: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int | None = 8,
    n_iters: int = 2,
    m: int = 2,
    k_codes: int = 4,
    n_iters_pq: int = 1,
    k: int = 5,
    block_size: int = 4096,
    target_bucket: int = 8192,
    nprobe: int = 1,
    by_residual: bool = False,
) -> DataFrame:
    """IVF-PQ approximate nearest neighbors — the canonical 100 TB ANN
    architecture (coarse inverted cells + product-quantized in-cell
    scoring, the FAISS IndexIVFPQ shape with by_residual=false):

    1. train the coarse quantizer (engine-exact cosine Lloyd,
       :func:`_kmeans_from_quantized`) and assign every corpus vector
       to its cell;
    2. train PQ codebooks (:func:`pq_codebooks`) and replace each
       corpus vector by its reconstruction map-side — the stored/
       shuffled representation is m code ids, not the raw vector;
       with ``by_residual=True`` (the FAISS default) the codebooks
       train on and encode x - coarse_centroid, and reconstruction is
       centroid + pq(residual) — residuals of quantized integers stay
       exact integers, so the engine-exact contract is unchanged;
    3. each query probes its ``nprobe`` nearest cells (ordered by
       centroid cosine desc, ties to the smallest cell id — the
       recall/cost lever) and scores its EXACT vector against those
       cells' reconstructions (asymmetric distance computation),
       top-k per query across all probed cells.

    Every stage is integer-exact and deterministic (ties to smallest
    centroid/code/neighbor id), so a DuckDB oracle can replay coarse
    training, PQ training, encoding, cell routing, and the ranked
    search bit-for-bit.

    Scale: cell count derives from the corpus (``n_cells=None`` →
    mean cell ~``target_bucket``), assignment and encoding are
    map-side, the only corpus shuffle is the cell grouping, and
    in-cell work is sub-blocked (:func:`_bucketed_asym_topk`) so task
    memory is bounded under cell skew. Memory per stored vector is
    m*ceil(log2(k_codes)) bits + one cell id."""
    from pyspark.storagelevel import StorageLevel

    qdf = _quantized_vectors(df, vec_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # no isEmpty() probe (round 15, VERDICT r14 Next #5): an empty
    # corpus yields empty training seeds, and the trained/books-None
    # branches below return the identical empty frame — the probe was
    # one redundant sequential driver job ahead of both training chains
    if n_cells is None:
        n_cells = _derive_n_buckets(qdf.count(), target_bucket)
    if not by_residual:
        # the coarse quantizer and the PQ codebooks train on the SAME
        # persisted quantized frame and do not depend on each other
        # (PQ trains on raw vectors here; only the residual variant
        # needs the coarse assignment first) — but each training is a
        # chain of small sequential driver-coordinated jobs (seed
        # collect + one partial-sums job per Lloyd iteration), so run
        # the two chains CONCURRENTLY from a 2-thread pool (guide
        # §2.6: actions are only sequential because the driver calls
        # them sequentially; the scheduler back-fills the tail of one
        # chain's job with the other's tasks). Results are the exact
        # frames/arrays of the sequential order — only job submission
        # overlaps. Cache coherence: both chains materialize qdf's
        # blocks through BlockManager per-block locks, so partitions
        # compute once regardless of which chain's task arrives first.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_coarse = pool.submit(
                _kmeans_from_quantized, qdf, id_col, n_cells, n_iters
            )
            f_books = pool.submit(
                pq_codebooks,
                df,
                vec_col,
                id_col,
                m,
                k_codes,
                n_iters_pq,
                _qdf=qdf,
                empty_ok=True,
            )
            trained = f_coarse.result()
            books = f_books.result()
        if trained is None or books is None:
            # no trainable seeds in one of the chains (every id below
            # n_cells / k_codes has a NULL vector): every oracle seed
            # CTE is empty and the search yields zero rows
            qdf.unpersist()
            return attach_plan_caches(
                df.sparkSession.createDataFrame(
                    [],
                    "query_id long, neighbor_id long, cos_sim double, rank int",
                ),
                (),
            )
        cids, cmat = trained
    else:
        trained = _kmeans_from_quantized(qdf, id_col, n_cells, n_iters)
        if trained is None:
            qdf.unpersist()
            return attach_plan_caches(
                df.sparkSession.createDataFrame(
                    [],
                    "query_id long, neighbor_id long, cos_sim double, rank int",
                ),
                (),
            )
        cids, cmat = trained
    b_cids_c, b_cmat_c = cids.copy(), cmat.copy()
    assigned = _assign_cells(qdf, id_col, cids, cmat)
    if by_residual:
        # PQ codebooks train on the RESIDUAL x - coarse_centroid (the
        # FAISS default: residual magnitudes are smaller, so the same
        # codebook capacity spends its resolution where it matters).
        # Residuals of quantized integers are exact integers — the
        # whole contract survives unchanged.
        def residual(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qm = _unpack(pdf["qv"])
                j = np.searchsorted(
                    b_cids_c, pdf["cell"].to_numpy(dtype=np.int64)
                )
                res = qm - b_cmat_c[j]
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(dtype=np.int64),
                        "qv": list(res),
                        "cell": pdf["cell"].to_numpy(dtype=np.int64),
                    }
                )

        # PQ seeds DRIVER-SIDE (round 15, VERDICT r14 Next #5): the
        # seed residuals are qv - cmat[argmax cos(qv, cmat)] for ids <
        # k_codes — a tiny numpy op over rows collectable from the
        # ALREADY-MATERIALIZED qdf cache (one cache-read job), using
        # the exact _assign_cells arithmetic (_block_scores + NaN->-inf
        # + argmax => first max = smallest cid over the id-sorted
        # centroid rows), so the seed list is bit-identical to the one
        # _pq_train's collect over the residual frame produced. That
        # collect was a FULL corpus pass (the id filter cannot push
        # below the residual kernel); with it gone, and one training
        # iteration, the residual frame is consumed exactly once — so
        # the persist (a second full materialization cost) goes too.
        seed_q = sorted(
            (int(r[id_col]), np.asarray(r["qv"], dtype=np.float64))
            for r in qdf.filter(F.col(id_col) < k_codes).collect()
        )
        if seed_q:
            sm = np.stack([v for _, v in seed_q])
            cos = _block_scores(sm, cmat)
            best = np.where(np.isnan(cos), -np.inf, cos).argmax(axis=1)
            seed_res = [
                (i, v - cmat[best[j]]) for j, (i, v) in enumerate(seed_q)
            ]
        else:
            seed_res = []
            _warn_if_seedless_nonempty(qdf, id_col, k_codes, "k_codes")
        res_frame = assigned.mapInPandas(
            residual, f"{id_col} long, qv array<double>, cell long"
        )
        if n_iters_pq > 1:
            res_frame = res_frame.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            books = _pq_train(
                res_frame, id_col, m, k_codes, n_iters_pq, seed_rows=seed_res
            )
        finally:
            if n_iters_pq > 1:
                res_frame.unpersist()
        if books is None:
            # coarse seeds existed but no id < k_codes survived the
            # NULL filter — empty PQ seed CTE on the oracle side too
            qdf.unpersist()
            return attach_plan_caches(
                df.sparkSession.createDataFrame(
                    [],
                    "query_id long, neighbor_id long, cos_sim double, rank int",
                ),
                (),
            )
    encode_src = assigned
    b_books = [(bc.copy(), bm.copy()) for bc, bm in books]
    mm = m
    resid = by_residual

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = _unpack(pdf["qv"])
            n, d = qm.shape
            if resid:
                j = np.searchsorted(
                    b_cids_c, pdf["cell"].to_numpy(dtype=np.int64)
                )
                base = b_cmat_c[j]
                target = qm - base
            else:
                base = np.zeros_like(qm)
                target = qm
            recon = np.zeros_like(qm)
            for s, (bcids, bcmat) in enumerate(b_books):
                lo, hi = d * s // mm, d * (s + 1) // mm
                sub = target[:, lo:hi]
                recon[:, lo:hi] = bcmat[_pq_sub_d2(sub, bcmat).argmin(axis=1)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "q": list(base + recon),
                    "cell": pdf["cell"].to_numpy(dtype=np.int64),
                }
            )

    corpus = encode_src.mapInPandas(
        encode, f"{id_col} long, q array<double>, cell long"
    )
    if query_df is None:
        query_df = df
    queries = _assign_cells_topn(
        _quantized_vectors(query_df, vec_col, id_col),
        id_col,
        cids,
        cmat,
        nprobe,
    ).select(F.col(id_col), F.col("qv").alias("q"), "cell")
    out = _bucketed_asym_topk(queries, corpus, "cell", id_col, k, block_size)
    return attach_plan_caches(out, (qdf,))


def _assign_cells_topn(
    qdf: DataFrame, id_col: str, cids: np.ndarray, cmat: np.ndarray, n: int
) -> DataFrame:
    """Map-side top-``n`` cell assignment (the nprobe routing of
    :func:`ivf_pq_topk`): one exploded row per (vector, probed cell),
    ordered by centroid cosine desc with ties to the smallest cell id
    — stable argsort over cid-sorted columns, the oracle's
    ``ORDER BY cos DESC, cid`` with NaN ranked last. ``n=1`` emits
    exactly :func:`_assign_cells`'s routing."""
    b_cids, b_cmat = cids.copy(), cmat.copy()
    n = min(n, len(b_cids))

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = _unpack(pdf["qv"])
            cos = _block_scores(qm, b_cmat)
            masked = np.where(np.isnan(cos), -np.inf, cos)
            # stable sort: ties keep ascending column order = smallest cid
            top = np.argsort(-masked, axis=1, kind="stable")[:, :n]
            rows = np.repeat(np.arange(len(qm)), n)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64)[rows],
                    "qv": pdf["qv"].iloc[rows].to_numpy(),
                    "cell": b_cids[top.ravel()],
                }
            )

    return qdf.mapInPandas(
        assign, f"{id_col} long, qv array<double>, cell long"
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean embedding (class prototypes / dataset
    fingerprints — the grouped mean-pool a curation pipeline uses for
    label-centroid distances and drift checks). Output: one row per
    (label, pos) with the centroid component and the group size —
    scalar rows, every value engine-exact:

    components are quantized to 2^20 integers (the module contract),
    summed EXACTLY as integers (order-independent — a raw float sum
    would be partitioning-dependent), and the mean is ONE IEEE division
    of exact integers: sum_q / (n * 2^20). NULL vectors are excluded;
    NULL labels form their own group (both engines agree).

    Scale: posexplode + groupBy(label, pos) with map-side partial sums
    — the single shuffle carries |labels| * dim aggregated rows per map
    task, independent of corpus size."""
    q = F.expr(
        f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS LONG))"
    )
    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(label_col).alias("label"), F.posexplode(q).alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum("v").cast("double")
                / (F.count(F.lit(1)) * F.lit(float(QUANT)))
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


def _quant_expr(vec_col: str):
    """JVM-side quantization twin of :func:`_quantize` — same values,
    expressed as a whole-stage-codegen array transform."""
    return F.expr(
        f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS LONG))"
    )


def sq8_stats(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) of the quantized corpus — the affine
    range the SQ8 codec spans. One posexplode + groupBy(pos) with
    map-side partial min/max; only dim rows reach the driver."""
    # byte-floor spread: the explode + partial min/max is cheap-per-byte
    # JVM work chained to a (single-row-group at bench SFs) scan — same
    # floor class as the tokenize sites (#19)
    rows = (
        spread_scan(
            df.filter(F.col(vec_col).isNotNull()).select(vec_col),
            min_bytes=TOKENIZE_SPREAD_MIN_BYTES,
        )
        .select(F.posexplode(_quant_expr(vec_col)).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    if not rows:
        return np.zeros(0), np.zeros(0)
    d = max(r["pos"] for r in rows) + 1
    mn, mx = np.zeros(d), np.zeros(d)
    for r in rows:
        mn[r["pos"]], mx[r["pos"]] = float(r["mn"]), float(r["mx"])
    return mn, mx


def sq8_encode(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats: "tuple[np.ndarray, np.ndarray] | None" = None,
) -> DataFrame:
    """Scalar (int8) quantization — the practical 4x-compression codec
    (the FAISS SQ8 shape): per dimension, an affine map of the
    quantized component onto codes 0..255 spanning the corpus
    [min, max]; reconstruction re-rounds onto the integer grid so
    downstream cosine stays ENGINE-EXACT (an unrounded affine recon
    would be a non-integer double whose dot products depend on
    summation order). Output: (id, codes array<long>,
    recon array<double> of integer values).

    Everything here is whole-stage-codegen JVM expressions — no Python
    kernel anywhere: the per-dim stats ride as array literals
    (2 * dim doubles in the plan), and code/recon are elementwise
    array transforms. Constant-range dims (mx == mn) code to 0 and
    reconstruct to the constant."""
    if stats is None:
        stats = sq8_stats(df, vec_col, id_col)
    mn, mx = stats
    mn_lit = F.array(*[F.lit(float(x)) for x in mn])
    mx_lit = F.array(*[F.lit(float(x)) for x in mx])
    q = _quant_expr(vec_col)

    def _code(x, i):
        lo, hi = F.element_at(mn_lit, i + 1), F.element_at(mx_lit, i + 1)
        return F.when(
            hi > lo,
            F.round((x - lo) * F.lit(255.0) / (hi - lo), 0),
        ).otherwise(F.lit(0.0)).cast("long")

    def _recon(c, i):
        lo, hi = F.element_at(mn_lit, i + 1), F.element_at(mx_lit, i + 1)
        return lo + F.round(c * (hi - lo) / F.lit(255.0), 0)

    # byte-floor spread: two elementwise array transforms per row are
    # cheap-per-byte JVM work — same floor class as the tokenize sites
    return (
        spread_scan(
            df.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col),
            min_bytes=TOKENIZE_SPREAD_MIN_BYTES,
        )
        .select(F.col(id_col), F.transform(q, _code).alias("codes"))
        .select(
            F.col(id_col),
            "codes",
            F.transform("codes", _recon).alias("recon"),
        )
    )


def sq8_topk(
    df: DataFrame,
    query_df: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    block_size: int = 4096,
) -> DataFrame:
    """SQ8-compressed approximate top-k cosine search: exact query
    vectors against SQ8 reconstructions (asymmetric), reusing the
    packed-block brute kernel — recon/2^20 re-quantizes bit-exactly
    (power-of-two scaling, integer values). 4x memory at near-exact
    recall is the standard trade this codec buys; compose with IVF
    cells for candidate pruning exactly like :func:`ivf_pq_topk`."""
    enc = sq8_encode(df, vec_col, id_col)
    corpus = enc.select(
        F.col(id_col),
        F.transform("recon", lambda x: x / F.lit(float(QUANT))).alias(vec_col),
    )
    if query_df is None:
        query_df = df
    return brute_force_topk(corpus, query_df, vec_col, id_col, k, block_size)


def build_vector_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    n_tables: int = 2,
) -> DataFrame:
    """Persistable semantic-dedup index: every vector's quantized
    components plus its bucket in each of ``n_tables`` independent
    hyperplane tables (the same deterministic plane stream as
    ``neardup_pairs_lsh``; table t's buckets are offset by
    ``t << n_planes`` so they never collide). One row per (vector,
    table) — write it out partitioned however the warehouse likes; the
    quantized components are integer-valued doubles (parquet
    dictionary/RLE-friendly) so the screen never re-reads the raw
    corpus. The growing-corpus semantic screen
    (:func:`incremental_semantic_dedup`) joins candidates on the bucket
    column."""
    from functools import reduce

    tables = [
        lsh_bucket(df, vec_col, id_col, n_planes, plane_offset=t * n_planes)
        .withColumn("bucket", F.col("bucket") + F.lit(t << n_planes))
        for t in range(n_tables)
    ]
    return reduce(lambda x, y: x.unionByName(y), tables)


def _bucketed_asym_threshold_pairs(
    ab: DataFrame,
    bb: DataFrame,
    id_col: str,
    threshold: float,
    block_size: int,
) -> DataFrame:
    """Pairs above the rounded-cosine threshold between candidate side
    ``ab`` (columns id, q, bucket, is_index) and batch side ``bb``
    (id, q, bucket), within shared buckets only — the asymmetric
    sibling of :func:`_bucketed_threshold_pairs`. A pair qualifies when
    the candidate is an INDEXED vector (any id) or a batch-mate with a
    smaller id (the greedy keep-first rule inside one batch); self
    pairs are excluded. Sub-blocked packing and capped emissions as in
    every pair kernel; multi-table candidate collisions collapse via
    distinct on the integer-exact rounded cosine."""
    ap = _packed_bucket_blocks(
        ab, "bucket", id_col, block_size, with_flags=True
    ).select(
        F.col("bucket").alias("abucket"),
        F.col("ids").alias("aids"),
        F.col("idx").alias("aidx"),
        F.col("mat").alias("amat"),
    )
    bp = _packed_bucket_blocks(bb, "bucket", id_col, block_size).select(
        F.col("bucket").alias("bbucket"),
        F.col("ids").alias("bids"),
        F.col("mat").alias("bmat"),
    )

    def score(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ia = np.asarray(r.aids, dtype=np.int64)
                fl = np.asarray(r.aidx, dtype=np.bool_)
                ib = np.asarray(r.bids, dtype=np.int64)
                cos = _block_scores(_unpack(r.amat), _unpack(r.bmat))
                mask = (
                    np.isfinite(cos)
                    & (cos >= threshold - 1e-6)
                    & (fl[:, None] | (ia[:, None] < ib[None, :]))
                    & (ia[:, None] != ib[None, :])
                )
                ii, jj = np.nonzero(mask)
                yield from _emit_sliced(
                    pd.DataFrame(
                        {"id_a": ia[ii], "id_b": ib[jj], "cos_raw": cos[ii, jj]}
                    )
                )

    scored = (
        ap.join(bp.hint("merge"), F.col("abucket") == F.col("bbucket"))
        .mapInPandas(score, "id_a long, id_b long, cos_raw double")
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
    return scored


def incremental_semantic_dedup(
    batch_df: DataFrame,
    index_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 2,
    block_size: int = 4096,
) -> DataFrame:
    """Screen a batch of vectors against a persisted semantic index
    (:func:`build_vector_index`) — the embedding twin of
    ``llm.dedup.incremental_dedup``: a batch vector is a
    ``semantic_dup`` iff some INDEXED vector, or a batch-mate with a
    smaller id, shares an LSH bucket and has rounded cosine >=
    ``threshold``; ``match_id`` is the smallest such id. Rows with
    NULL vectors cannot be screened and come back ``unique`` with a
    NULL match (they are also never indexed). Output: (id, status,
    match_id) — one row per batch row.

    Parameters must match the index build (same planes/tables), and
    ids must be unique across index and batch (the documents-model
    invariant). Candidate recall is the LSH OR-construction — the same
    measured contract as ``neardup_pairs_lsh``; precision is 1.0
    (every candidate is exact-verified with the integer-exact cosine).

    Scale: the batch buckets map-side; the only joins are the
    bucket-keyed sort-merge between the (blocked) index slice and the
    batch — cost tracks the buckets the batch actually touches, never
    the full index."""
    from pyspark.storagelevel import StorageLevel

    b = build_vector_index(
        batch_df, vec_col, id_col, n_planes, n_tables
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ab = (
        index_df.select(id_col, "q", "bucket")
        .withColumn("is_index", F.lit(True))
        .unionByName(b.withColumn("is_index", F.lit(False)))
    )
    pairs = _bucketed_asym_threshold_pairs(
        ab, b, id_col, threshold, block_size
    )
    dups = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("match_id")
    )
    out = (
        batch_df.select(id_col)
        .join(dups, id_col, "left")
        .select(
            id_col,
            F.when(F.col("match_id").isNotNull(), F.lit("semantic_dup"))
            .otherwise(F.lit("unique"))
            .alias("status"),
            "match_id",
        )
    )
    out = attach_plan_caches(out, (b,))
    # expose the PERSISTED batch-side bucketed rows for downstream
    # index growth (streaming/ingestion.py): build_vector_index is
    # deterministic per vector, so subsetting this frame by the unique
    # ids reproduces build_vector_index(unique_docs) exactly without
    # re-running the quantize/plane-projection kernel. Valid until
    # plan_caches releases (recomputes from lineage afterwards).
    out.batch_index = b
    return out
