"""Deduplication operators over a documents table.

Scale design (100 TB of text):

- **exact**: hash-groupBy on a 128-bit content hash — one shuffle keyed
  by the hash, perfectly balanced unless one document dominates.
- **MinHash + LSH**: the signature is computed entirely map-side with
  array higher-order functions (tokenize -> shingle -> k permuted mins ->
  band hashes); the only shuffles are the band-bucket self-join (keys are
  (band, band_hash) — collision groups, tiny by construction) and the
  final pair verification. No Python, no UDFs.
- **SimHash**: map-side 60-bit signature (widest md5-prefix hash that
  stays non-negative in BIGINT on every engine); near-dup = signature
  equality (or small hamming ball via 15-bit band pivots).
- **n-gram Jaccard**: prefix-filtered similarity join (AllPairs/PPJoin)
  — each doc indexes only its |d|-ceil(t|d|)+1 rarest shingles, which
  is provably candidate-complete for J >= t; exact verification on the
  full shingle sets. Candidate mass tracks the true near-dup pairs, not
  O(sum df^2) over the whole shingle distribution.

All hashes are the md5-derived portable hash so the DuckDB oracle can
replay every step bit-for-bit (functions/hashing.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from solace_apache_beam_spark.functions.partitioning import spread_scan
from solace_apache_beam_spark.functions.caching import (
    PlanCaches,
    attach_plan_caches,
)
from solace_apache_beam_spark.functions.hashing import (
    MERSENNE_61,
    h64,
    minhash_coeffs,
    words_expr,
)

# MinHash-LSH parameter presets. Candidate probability at Jaccard J is
# 1 - (1 - J^r)^b with r = n_perm/n_bands rows per band, b = n_bands.
# Measured against exact-Jaccard>=0.5 truth (1,989,505 pairs) on the
# verified 100x stress corpus (500k docs), scripts/measure_recall.py,
# round 6:
#
#   preset          r  b   recall   wall (100x)
#   16 perm / 4  b  4  4   76.7 %   22.8 s   <- DEFAULT (cheap screen)
#   32 perm / 8  b  4  8   84.1 %   23.7 s
#   64 perm / 16 b  4 16   86.3 %   35.0 s
#   64 perm / 32 b  2 32   95.6 %   45.1 s   <- HIGH_RECALL
#
# Re-verified at 1000x (5M docs, 19.89M truth pairs): DEFAULT 76.7 %,
# HIGH_RECALL 95.7 % — recall is scale-stable (it is a property of the
# pair-J distribution and the s-curve, not corpus size). HIGH_RECALL's
# cost premium grows with scale (2.0x at 100x -> 4.2x at 1000x: r=2
# admits low-J candidate mass that outgrows the true pairs) — at web
# scale, screen with DEFAULT and rescue only the partition of interest
# with HIGH_RECALL.
#
# Widening b at fixed r=4 plateaus in the high-80s: the corpus's miss
# mass sits just above threshold (J 0.5-0.6) where P(J^4) stays small.
# Dropping to r=2 is the lever that moves boundary pairs — P(candidate)
# at J=0.5 goes 0.23 (default) -> 0.9999 — at the cost of more low-J
# false candidates, which the exact verification join rejects (2x
# wall-clock total at 100x). Usage:
#   minhash_lsh_pairs(df, **MINHASH_HIGH_RECALL)
MINHASH_DEFAULT = {"n_perm": 16, "n_bands": 4}
MINHASH_HIGH_RECALL = {"n_perm": 64, "n_bands": 32}

# (n_perm, n_bands) -> (preset label, recall measured against exact
# Jaccard>=0.5 truth at the 100x/1000x stress points — scale-stable,
# see the table above). Surfaced at call sites via minhash_recall_info
# so the DEFAULT's one-in-four boundary-pair miss rate is visible where
# the operator is used, not only in this file (VERDICT r6 Next #5).
_MINHASH_MEASURED_RECALL = {
    (16, 4): ("DEFAULT", 0.767),
    (32, 8): ("wide-8", 0.841),
    (64, 16): ("wide-16", 0.863),
    (64, 32): ("HIGH_RECALL", 0.956),
}


def minhash_recall_info(
    n_perm: int = 16, n_bands: int = 4, threshold: float = 0.5
) -> dict:
    """Recall metadata for a MinHash-LSH parameter choice: the preset
    label and MEASURED recall when (n_perm, n_bands) matches a preset
    from the table above AND the threshold is the 0.5 the recall
    campaign measured against (a preset's measured number describes
    J>=0.5 truth only — stamping it onto a different-threshold run
    would be authoritative-looking telemetry about a run that never
    happened). Otherwise the s-curve candidate probability
    1 - (1 - J^r)^b at J=threshold — the analytic LOWER bound on
    recall: every qualifying pair has J >= threshold, so its candidate
    probability is at least this value (for the DEFAULT preset the
    bound is 0.23 while measured recall is 0.767 — the gap is the
    above-threshold J mass). Stamped into stress telemetry
    (scripts/run_stress.py --bucket-stats) so the recall/cost trade is
    visible at the point of use."""
    # reject geometry the pairs operator itself cannot run — telemetry
    # for a run that could never happen is worse than an error (and
    # n_bands=0 would divide by zero; n_bands>n_perm would model r=0 as
    # candidate probability 1.0)
    if n_bands < 1 or n_perm % n_bands != 0:
        raise ValueError(
            f"n_perm={n_perm} must be a positive multiple of n_bands={n_bands}"
        )
    label_rec = _MINHASH_MEASURED_RECALL.get((n_perm, n_bands))
    if label_rec is not None and abs(threshold - 0.5) < 1e-12:
        return {"recall_preset": label_rec[0], "measured_recall": label_rec[1]}
    r = n_perm // n_bands
    p = 1.0 - (1.0 - float(threshold) ** r) ** n_bands
    return {
        "recall_preset": "custom",
        "candidate_prob_at_threshold": round(p, 4),
    }


def _segment_offsets(arrays: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a Series of int arrays -> (concat, segment start offsets).
    Callers guarantee every array is non-empty (reduceat contract)."""
    lens = np.fromiter((len(x) for x in arrays), dtype=np.int64, count=len(arrays))
    flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in arrays])
    offs = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    return flat, offs


def _sig_coeff_arrays(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    coeffs = minhash_coeffs(n_perm)
    A = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
    B = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]
    return A, B


def _sig_mins(hs: pd.Series, A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(n_perm, n_docs) MinHash mins over a Series of non-empty hash
    arrays. Integer-only (a < 2^31, h < 2^32: every intermediate fits
    int64), so the result is bit-identical to the BIGINT arithmetic the
    DuckDB oracle runs — vectorization never changes the answer, unlike
    float reductions."""
    flat, offs = _segment_offsets(hs)
    v = (A * flat[None, :] + B) % MERSENNE_61  # (n_perm, total)
    return np.minimum.reduceat(v, offs, axis=1)  # (n_perm, n_docs)


def _minhash_sig_udf(n_perm: int):
    """Arrow-vectorized MinHash signature: per doc, min((a*h+b) mod P)
    for each permutation (see _sig_mins for the exactness argument)."""
    A, B = _sig_coeff_arrays(n_perm)

    @pandas_udf("array<bigint>")
    def sig(hs: pd.Series) -> pd.Series:
        if len(hs) == 0:
            return pd.Series([], dtype=object)
        return pd.Series(list(_sig_mins(hs, A, B).T))

    return sig


def _band_hashes_of_rows(mins_rows, n_perm: int, n_bands: int) -> list:
    """Signature rows ((n_docs, n_perm) int64) -> per-doc LSH band-hash
    lists, byte-identical to the former JVM projection
    h64(concat_ws(",", slice(sig, b*r+1, r))): Long.toString == str()
    for int64, md5 over the same UTF-8 bytes, and digest()[:8] >> 4 ==
    int(hexdigest()[:15], 16) — the 60-bit portable hash. Replacing the
    n_bands-way array-of-struct md5/conv expression removes its
    codegen cliff (measured ~4 s first-run compile for the 32-band
    HIGH_RECALL shape) and the per-row conv() cost (the most expensive
    single op of the h64 chain, microbenched round 14)."""
    import hashlib

    md5 = hashlib.md5
    from_bytes = int.from_bytes
    r = n_perm // n_bands
    join = ",".join
    out = []
    for row in mins_rows:
        vals = [str(v) for v in row]
        out.append(
            [
                from_bytes(
                    md5(join(vals[b * r : (b + 1) * r]).encode()).digest()[:8],
                    "big",
                )
                >> 4
                for b in range(n_bands)
            ]
        )
    return out


def _sig_bands_udf(n_perm: int, n_bands: int):
    """Arrow-vectorized MinHash signature + LSH band hashes in one hop:
    hash array -> array of n_bands band hashes (the signature never
    leaves Python — callers only ever band it)."""
    A, B = _sig_coeff_arrays(n_perm)

    @pandas_udf("array<bigint>")
    def bands(hs: pd.Series) -> pd.Series:
        if len(hs) == 0:
            return pd.Series([], dtype=object)
        mins = _sig_mins(hs, A, B).T
        return pd.Series(_band_hashes_of_rows(mins, n_perm, n_bands))

    return bands


def _simhash_udf(bits: int):
    """Arrow-vectorized SimHash straight from the word arrays: md5 each
    token (Python hashlib — same bytes the oracle hashes), then per bit
    the sum of +/-1 over token hashes; bit set when positive. Pure
    integer sums — order-independent, exact.

    Token-hash width follows the signature width: <=32 bits uses the
    32-bit md5 prefix (digest()[:4] big-endian == int(hexdigest()[:8],
    16)); wider signatures use the 60-bit prefix (digest()[:8] >> 4 ==
    int(hexdigest()[:15], 16) — the same portable h64 the oracle
    replays). 60 is the max: it is the widest md5-hex-prefix integer
    that stays NON-NEGATIVE in int64/BIGINT on every engine (Spark,
    DuckDB, numpy), so no sign-extension or overflow case ever enters
    the shift/mask/popcount arithmetic."""
    import hashlib

    assert bits <= 60, "signature wider than the 60-bit portable hash"
    shifts = np.arange(bits, dtype=np.int64)[:, None]
    wide = bits > 32

    @pandas_udf("bigint")
    def sim(words: pd.Series) -> pd.Series:
        if len(words) == 0:
            return pd.Series([], dtype=np.int64)
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        # per-batch token memo: natural-language token frequency is
        # Zipfian, so distinct tokens are a small fraction of token
        # instances — most md5 calls become dict hits.
        memo: dict[str, int] = {}

        def tok_hash(w: str) -> int:
            h = memo.get(w)
            if h is None:
                d = md5(w.encode("utf-8")).digest()
                h = (
                    from_bytes(d[:8], "big") >> 4
                    if wide
                    else from_bytes(d[:4], "big")
                )
                memo[w] = h
            return h

        hs = pd.Series(
            [
                np.fromiter(
                    (tok_hash(w) for w in ws), dtype=np.int64, count=len(ws)
                )
                if ws is not None
                else np.empty(0, dtype=np.int64)
                for ws in words
            ]
        )
        # tokenless docs (including NULL text -> NULL words) -> NULL
        # (dropped by the caller's isNotNull — SimHash is undefined
        # there); computed on the non-empty subset so the reduceat
        # contract holds
        mask = np.fromiter(
            (len(x) > 0 for x in hs), dtype=bool, count=len(hs)
        )
        result: list = [None] * len(hs)
        if mask.any():
            flat, offs = _segment_offsets(hs[mask].reset_index(drop=True))
            signs = (((flat[None, :] >> shifts) & 1) * 2 - 1).astype(np.int64)
            sums = np.add.reduceat(signs, offs, axis=1)  # (bits, n_docs)
            out = ((sums > 0).astype(np.int64) << shifts).sum(axis=0)
            for pos, v in zip(np.flatnonzero(mask), out):
                result[pos] = int(v)
        return pd.Series(result, dtype=object)

    return sim


def _explode_sorted_pairs(
    buckets: DataFrame, ids_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """All ordered pairs (``_a`` before ``_b``) from each row's SORTED
    array — the bucket collision groups. Replaces a self-join (the
    upstream pipeline is computed once and shuffled once via groupBy),
    and generates through TWO chained generators: posexplode picks the
    left element, a per-row tail slice supplies the right candidates.

    The former single-expression form — explode(flatten(transform(...)))
    — materialized the ENTIRE C(|ids|,2) pair array per row before the
    explode: ~500k structs (tens of MB in one Tungsten allocation) for
    a df-cap-sized bucket of 1,000. Those humongous per-row allocations
    GC-locker-thrashed the JVM to death at the 100x (500k-doc) stress
    point. Chained generators emit the same pairs while each intermediate
    row holds at most one |ids|-element slice — KBs, GC-friendly, at
    identical total volume (pair volume is the operator's output, not
    an artifact). ``carry`` columns ride along unchanged (e.g. a
    multiplicity weight)."""
    return buckets.select(
        *carry, F.col(ids_col), F.posexplode(ids_col).alias("_i", "_a")
    ).select(
        *carry,
        "_a",
        F.explode(
            F.slice(F.col(ids_col), F.col("_i") + F.lit(2), F.size(ids_col))
        ).alias("_b"),
    )


def _sized_group_instances(
    inv: DataFrame,
    keys: list[str],
    max_size: int,
    observation=None,
) -> DataFrame:
    """Instances of ``inv`` whose key-group size is in [2, max_size],
    tagged with that size as ``_gsz`` — the memory-safe front half of
    every bucket-collect: group sizes come from a count aggregate
    (constant-memory partial agg, map-side combined) and the cap is
    applied BEFORE any ``collect_list``, so no aggregation buffer ever
    grows past ``max_size`` elements.

    The former collect-then-filter shape built the full postings array
    for every key — including degenerate stop-shingle keys with
    unbounded document frequency — and only then dropped the over-cap
    rows; at the 100x (500k-doc) stress point those buffers OOM'd an
    8g heap outright (GCLocker thrash then Java heap space) inside
    ngram-Jaccard's inverted index. Cost of the safe shape: one tiny
    count shuffle plus a merge join of ``inv`` against the retained
    keys (sort-merge: both sides spillable at any scale; the join's
    hash partitioning on ``keys`` is reused by the caller's follow-up
    groupBy, so no extra exchange of the instance stream).

    ``observation`` (a pyspark Observation) reports
    ``dropped_buckets`` (groups over the cap) and ``total_buckets``
    (all groups, singletons included) — identical values to the old
    post-collect observe, since counts has one row per group either
    way. Caveat: ``Observation.get`` can fail with a row-conversion
    AssertionError on very large AQE plans (observed at the 500k-doc
    stress point; fine at test scale). For scale telemetry, derive the
    same two numbers directly from a count-aggregate over the bucket
    keys — one cheap extra job, no observe node.

    Round 14, the hot path (observation=None): group sizes come from a
    whole-partition COUNT window over the ONE key-hash exchange the
    caller's follow-up groupBy needs anyway — the former
    count-agg + merge-join shape consumed ``inv`` twice (re-running
    the whole upstream signature pipeline, ArrowEvalPython included)
    and paid a second exchange of the instance stream plus the keep
    side's sort. The window buffers one key group at a time
    (ExternalAppendOnlyUnsafeRowArray — spills), so a degenerate
    bucket degrades to disk exactly like the join's sort did: the cap
    is still applied before any collect_list buffer exists. The
    telemetry path keeps the count-agg shape because a per-instance
    observe would multiply-count each group; the scale-guard tests
    exercise both paths and pin value equality."""
    if observation is None:
        w = Window.partitionBy(*keys)
        return inv.withColumn("_gsz", F.count(F.lit(1)).over(w)).filter(
            (F.col("_gsz") >= 2) & (F.col("_gsz") <= max_size)
        )
    # telemetry path: TWO consumers read inv (the count agg and the
    # join), so its upstream pipeline runs twice. Measured trade (sf0.1
    # and 100x): persisting inv here LOSES — cache materialization of
    # the instance stream costs more than recomputing it, because every
    # caller's pipeline is map-side work over an already-persisted
    # parent (sh / sig); ngram regressed 3.2->4.6 s under the persist.
    counts = inv.groupBy(*keys).agg(F.count(F.lit(1)).alias("_gsz"))
    counts = counts.observe(
        observation,
        F.count(F.when(F.col("_gsz") > max_size, 1)).alias(
            "dropped_buckets"
        ),
        F.count(F.lit(1)).alias("total_buckets"),
    )
    keep = counts.filter(
        (F.col("_gsz") >= 2) & (F.col("_gsz") <= max_size)
    )
    return inv.join(keep.hint("merge"), keys)


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


def _shingle_hash_udf(shingle_n: int):
    """Arrow-vectorized shingling: word array -> sorted distinct 32-bit
    md5 hashes of the word n-grams. One pass replaces three interpreted
    stages (slice/concat per position, array_distinct, per-element md5)
    — at ~12us per shingle interpreted vs ~1us here, this is the hot
    path of every shingle-based dedup. Dedup happens AFTER hashing on
    both engines (oracle: list_distinct over the hash list), so a hash
    collision merges the same pair everywhere."""
    import hashlib

    @pandas_udf("array<bigint>")
    def sh(words: pd.Series) -> pd.Series:
        return _shingle_hash_batch(words, shingle_n)

    return sh


def _shingle_hash_batch(words: pd.Series, shingle_n: int) -> pd.Series:
    """One Arrow batch of word arrays -> sorted distinct 32-bit shingle
    hash lists (the _shingle_hash_udf body, shared with the fused
    shingle+signature kernel)."""
    import hashlib

    md5 = hashlib.md5
    from_bytes = int.from_bytes
    # per-Arrow-batch memo: near-dup corpora repeat shingles heavily
    # across documents, so most md5 calls are cache hits; the dict is
    # bounded by the batch's distinct-shingle count and freed with it.
    # digest()[:4] big-endian == int(hexdigest()[:8], 16) — same value,
    # no hex round-trip.
    memo: dict[str, int] = {}
    out = []
    for w in words:
        if w is None:
            # NULL text -> NULL words array: no shingles, dropped by
            # the caller's size(hs)>0 filter (the former
            # size(words)>=n pre-filter dropped these rows before the
            # kernel; with the single-split shape the kernel must
            # tolerate them)
            out.append([])
            continue
        hs = set()
        for i in range(len(w) - shingle_n + 1):
            g = " ".join(w[i : i + shingle_n])
            h = memo.get(g)
            if h is None:
                h = from_bytes(md5(g.encode("utf-8")).digest()[:4], "big")
                memo[g] = h
            hs.add(h)
        out.append(sorted(hs))
    return pd.Series(out)


def _shingle_bands_udf(shingle_n: int, n_perm: int, n_bands: int):
    """Fused shingle + MinHash + LSH-banding kernel: word array ->
    struct(hs, bands) in ONE Python hop. Values are bit-identical to
    _shingle_hash_udf followed by _minhash_sig_udf followed by the
    former JVM band projection (see _band_hashes_of_rows) — the fusion
    only removes the extra JVM->Python round trips of the hash arrays
    and the JVM md5/conv band expression, it never changes a byte.
    Short/empty docs are masked inside the kernel (hs=[], bands=[])
    and dropped by the caller's size(hs)>0 post-filter."""
    A, B = _sig_coeff_arrays(n_perm)
    tag = f"bands{n_perm}x{n_bands}"

    @pandas_udf(f"struct<hs: array<bigint>, {tag}: array<bigint>>")
    def shbands(words: pd.Series) -> pd.DataFrame:
        if len(words) == 0:
            return pd.DataFrame({"hs": [], tag: []})
        hs = _shingle_hash_batch(words, shingle_n)
        # docs shorter than the shingle width yield hs=[] here and are
        # dropped by the caller's size(hs)>0 filter — the emptiness
        # test moved INTO the kernel so the JVM no longer evaluates the
        # tokenizing split twice (once for a size(words)>=n pre-filter,
        # once inlined into the Arrow input projection)
        mask = np.fromiter(
            (len(x) > 0 for x in hs), dtype=bool, count=len(hs)
        )
        bands: list = [[]] * len(hs)
        if mask.any():
            mins = _sig_mins(
                hs[mask].reset_index(drop=True), A, B
            ).T  # (n_nonempty, n_perm)
            for pos, row in zip(
                np.flatnonzero(mask),
                _band_hashes_of_rows(mins, n_perm, n_bands),
            ):
                bands[pos] = row
        return pd.DataFrame({"hs": hs, tag: pd.Series(bands)})

    return shbands


def _gram_strings_udf(n: int):
    """Arrow-vectorized positioned word n-grams: word array -> the
    ordered array of n-gram STRINGS (position i holds words[i:i+n]
    joined by one space — byte-identical to concat_ws(" ", slice(...))
    on every engine, so oracles replaying array_to_string(words[i:j],
    ' ') see the same grams). Since round 15 the span pipelines consume
    the HASHED twin below; this kernel stays as the reference
    implementation the differential test pins the hash values against
    (tests/test_properties_spans.py). One Python join per gram replaces the
    interpreted transform(sequence, slice, concat_ws) chain — the
    same ~12 us-per-slice interpreted overhead _shingle_hash_udf
    measured, vs ~1 us here (round 14: 4.5-5.7 s -> ~1 s for 2.36 M
    grams at sf1.0). Docs shorter than ``n`` words (and NULL-text docs)
    yield an EMPTY array — the caller's posexplode then emits no rows
    for them, exactly what the former ``size(words) >= n`` pre-filter
    achieved, without making the JVM evaluate the tokenizing split
    twice (the guide-§4.4 double-evaluation #8 removed from the
    shingle kernels)."""

    @pandas_udf("array<string>")
    def grams(words: pd.Series) -> pd.Series:
        join = " ".join
        return pd.Series(
            [
                []
                if w is None
                else [join(w[i : i + n]) for i in range(len(w) - n + 1)]
                for w in words
            ]
        )

    return grams


def _gram_hashes_udf(n: int):
    """Positioned word n-grams HASHED to the 60-bit portable md5 prefix
    (round 15, VERDICT r14 Next #7): word array -> ordered array of
    h64(" ".join(words[i:i+n])) — position i's value is the hash of the
    exact gram string _gram_strings_udf emits there, and the DuckDB
    oracles hash the same UTF-8 bytes with the same
    ('0x' || substr(md5(g), 1, 15))::BIGINT convention, so both engines
    see identical values AND identical collisions (the shingle
    pipelines' collision argument, at 60 bits instead of 32: a merged
    gram merges on every engine — never a cross-engine mismatch).
    Downstream of the kernel the gram column is an 8-byte BIGINT, so
    the ONE gram-keyed exchange duplicate_spans pays carries longs
    instead of n-word strings — at n=8 that is roughly an
    order-of-magnitude drop in shuffled key bytes, the first-order
    cost at 100 TB (guide §2.3). Per-batch memo as in
    _shingle_hash_batch: positioned grams repeat heavily within and
    across documents (boilerplate), so most md5 calls are dict hits.
    Docs shorter than ``n`` words (and NULL-text docs) yield [] — the
    caller's posexplode emits no rows for them."""
    import hashlib

    @pandas_udf("array<bigint>")
    def grams(words: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        join = " ".join
        memo: dict[str, int] = {}

        def gh(g: str) -> int:
            h = memo.get(g)
            if h is None:
                h = from_bytes(md5(g.encode("utf-8")).digest()[:8], "big") >> 4
                memo[g] = h
            return h

        return pd.Series(
            [
                []
                if w is None
                else [gh(join(w[i : i + n])) for i in range(len(w) - n + 1)]
                for w in words
            ]
        )

    return grams


def _doc_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    n_perm: int | None = None,
    n_bands: int | None = None,
    carry_hash: bool = False,
) -> DataFrame:
    """(id, hs): per-doc distinct shingle-hash set. Tokenization stays
    JVM-side (codegen'd split); shingle+hash is one Arrow UDF.

    ``n_perm``/``n_bands`` (round 14): additionally compute the MinHash
    signature AND its LSH band hashes for that geometry IN THE SAME
    Python hop, carried as a ``bands{n_perm}x{n_bands}`` column —
    callers that persist the shingle frame and then band it (every
    MinHash pipeline) save one whole ArrowEvalPython stage plus a
    second Arrow pass over the cached hash arrays, and banding becomes
    a pure posexplode (no JVM md5/conv, no n_bands-way codegen). The
    column is geometry-tagged so a pass with a DIFFERENT preset (e.g.
    the rescue preset over a screen-built frame) can never silently
    reuse the wrong bands — it just recomputes from ``hs`` via
    _sig_bands_udf.

    Short docs are dropped by size(hs) > 0 AFTER the kernel (identical
    doc set: len(words) >= n <=> at least one shingle) instead of a
    size(words) >= n pre-filter — the pre-filter made the JVM evaluate
    the tokenizing regex split TWICE per row (once in the filter, once
    inlined into the Arrow input projection after projection collapse).
    The post-filter sits on the kernel OUTPUT, so the split runs once;
    the filter cannot be pushed below the (deterministic) UDF and
    duplicate it because Catalyst only pushes filters over the UDF's
    INPUT columns, and size(hs) references its output.

    ``carry_hash`` (round 15): additionally carry ``md5(text)`` as
    ``_h``, computed in the SAME JVM scan projection that feeds the
    kernel, and KEEP empty-shingle rows (hs = []) — the frame can then
    also serve the exact-dedup content-hash artifact, so callers that
    need both (incremental_dedup's recompute path, build_corpus_index)
    read the corpus text column ONCE instead of twice (guide §1.2: a
    redundant full pass; at 100 TB the second text scan is a whole
    extra read of the heaviest column). On this path the caller
    filters ``size(hs) > 0`` itself for the shingle/band consumers;
    NULL-text rows keep ``_h`` NULL (md5(NULL)), exactly what the
    standalone hash projection produced."""
    words = words_expr(text_col)
    # spread_scan: small inputs plan the whole scan (and therefore this
    # kernel) into fewer tasks than cores — spread the narrow (id,
    # text) projection first; no-op when the scan already has >= cores
    # partitions (always, at scale)
    proj = [F.col(id_col), words.alias("words")]
    if carry_hash:
        proj.append(F.md5(F.col(text_col)).alias("_h"))
    base = spread_scan(df.select(F.col(id_col), F.col(text_col))).select(
        *proj
    )
    carry = [F.col("_h")] if carry_hash else []
    # asNondeterministic: WITHOUT it the optimizer pushes the size(hs)
    # filter below the (deterministic) UDF by COPYING the whole kernel
    # into the filter — two ArrowEvalPython nodes, every row shingled
    # twice (the exact guide-§4.4 duplication; observed in this plan
    # before the mark). The kernel IS deterministic; the mark only
    # forbids the optimizer to duplicate/reorder it.
    if n_perm is None:
        kern = _shingle_hash_udf(n).asNondeterministic()
        out = base.select(
            F.col(id_col), kern(F.col("words")).alias("hs"), *carry
        )
    else:
        assert n_bands is not None, "fused shingling needs the full geometry"
        tag = f"bands{n_perm}x{n_bands}"
        kern = _shingle_bands_udf(n, n_perm, n_bands).asNondeterministic()
        fused = base.select(
            F.col(id_col), kern(F.col("words")).alias("_ss"), *carry
        )
        out = fused.select(
            F.col(id_col),
            F.col("_ss.hs").alias("hs"),
            F.col(f"_ss.{tag}").alias(tag),
            *carry,
        )
    return out if carry_hash else out.filter(F.size("hs") > 0)


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
    parallel (and, round 14, runs in ONE fused Python hop — see
    _doc_shingles n_perm)."""
    sh = _doc_shingles(df, text_col, id_col, shingle_n, n_perm, n_bands)
    return _band_hashes_from_shingles(sh, id_col, n_perm, n_bands)


def _band_hashes_from_shingles(
    sh: DataFrame, id_col: str, n_perm: int, n_bands: int,
    with_size: bool = False,
) -> DataFrame:
    """(id, hs) -> exploded (id, band, band_hash). A frame built by
    _doc_shingles(..., n_perm=, n_bands=) already carries the matching
    ``bands{n_perm}x{n_bands}`` column — then banding is a pure
    posexplode (zero per-row hashing in the JVM); any other frame
    (e.g. the rescue preset over a screen-built frame) computes
    signature + bands from ``hs`` in one Arrow hop. Band-hash VALUES
    are identical in both paths and to the pre-round-14 JVM projection
    (_band_hashes_of_rows documents the byte-level argument).

    ``with_size`` additionally carries the doc's shingle-set size as
    ``_sz`` (map-side ``size(hs)``, 8 bytes per instance) — the pair
    pipelines feed it to the lossless Bayardo size filter before the
    verify joins; the band-hash QUERY output keeps the 3-column shape."""
    assert n_perm % n_bands == 0
    tag = f"bands{n_perm}x{n_bands}"
    carry = [F.size("hs").alias("_sz")] if with_size else []
    if tag in sh.columns:
        arr = sh.select(id_col, *carry, F.col(tag).alias("_bands"))
    else:
        kern = _sig_bands_udf(n_perm, n_bands).asNondeterministic()
        arr = sh.select(id_col, *carry, kern(F.col("hs")).alias("_bands"))
    return arr.select(
        id_col,
        *(["_sz"] if with_size else []),
        F.posexplode("_bands").alias("band", "band_hash"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    n_perm: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    observation=None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs: band-bucket self-join produces
    candidates; candidates are verified with exact shingle-set Jaccard.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.

    ``shingles`` (advanced): a precomputed, already-persisted
    (id_col, hs) frame covering EXACTLY the docs to pair — lets a
    caller running several passes over overlapping doc sets (e.g.
    :func:`minhash_lsh_pairs_rescue`) run the Arrow shingling kernel
    once instead of once per pass. When given, ``df`` is IGNORED
    entirely (the shingle frame alone defines the doc set — pairing a
    different set than df describes is the caller's responsibility,
    there is no cheap consistency check). When omitted the operator
    computes and persists its own from ``df``.

    RECALL IS A PARAMETER, NOT A GIVEN: the defaults are the cheap
    SCREEN preset — 76.7 % measured recall against exact truth (a
    one-in-four miss rate on boundary pairs; the full measured curve
    is the preset table at the top of this module, queryable at call
    sites via :func:`minhash_recall_info`). When completeness matters,
    pass ``**MINHASH_HIGH_RECALL`` (95.6 %) or compose the two with
    :func:`minhash_lsh_pairs_rescue`.

    The self-join shuffles only (band, band_hash) buckets. Buckets larger
    than ``max_bucket`` are dropped entirely (a degenerate band hash —
    boilerplate/empty docs — would otherwise concentrate O(n^2) pair
    expansion in one task); pass a ``pyspark.sql.Observation`` as
    ``observation`` to get the dropped-bucket count. Verification is a
    plain shuffle join keyed by doc id on both sides — candidates can be
    billions of rows at web scale (30-50 % near-dup corpora), so the
    joins are PINNED as sort-merge (fully spillable on both sides):
    Catalyst's static estimate for the candidate frame (a distinct over
    a generate over a cached relation) can come out tiny and plan a
    broadcast build that OOMs at scale — the failure mode observed live
    on ngram-Jaccard's analogous join at a 10x stress run."""
    # the shingle-hash set feeds the signature pipeline AND both
    # verification sides — persist it (spills to disk at scale) so the
    # Arrow shingling kernel runs once, not three times
    sh = (
        shingles
        if shingles is not None
        else _doc_shingles(df, text_col, id_col, shingle_n, n_perm, n_bands).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    bands = _band_hashes_from_shingles(
        sh, id_col, n_perm, n_bands, with_size=True
    )
    # bucket-collect pair generation: ONE pass over the signature
    # pipeline, vs a self-join that computes the (expensive) MinHash
    # side twice and shuffles it twice. Size-first cap: the bucket
    # population is counted before any array is collected, so a
    # degenerate band hash can never build an over-cap aggregation
    # buffer (see _sized_group_instances). Each posting carries its
    # doc's shingle-set size for the size filter below (struct sorts by
    # id-first field order, so the sorted-array pair invariant holds).
    buckets = (
        _sized_group_instances(bands, ["band", "band_hash"], max_bucket, observation)
        .groupBy("band", "band_hash")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col), F.col("_sz")))
            ).alias("ids")
        )
    )
    # a clique's bucket is IDENTICAL across all n_bands band hashes —
    # dedup the member arrays before pair explosion so each clique's
    # pairs are generated once, not n_bands times (the downstream
    # .distinct() collapses the same duplicates, but only after paying
    # an n_bands-x bigger pair-instance shuffle).
    #
    # SIZE FILTER (Bayardo et al. §3.1, the same lossless prune
    # ngram_jaccard_pairs carries): the output keeps only exact
    # J >= threshold pairs, and J(A,B) >= t forces
    # min_sz >= t * max_sz (|A∩B| <= min_sz, |A∪B| >= max_sz) — a
    # candidate failing it is provably below threshold, so pruning it
    # BEFORE the distinct and the two full-shingle-array verify joins
    # is value-identical and cuts the verify joins' array shuffle
    # volume. Downward-epsilon guard as everywhere: IEEE can round
    # t*max above the exact product and would drop exact-boundary
    # pairs; scaling by (1 - 1e-12) errs toward keeping, and
    # verification is exact.
    cand = (
        _explode_sorted_pairs(buckets.select("ids").distinct(), "ids")
        .filter(
            F.least(F.col("_a._sz"), F.col("_b._sz"))
            >= F.greatest(F.col("_a._sz"), F.col("_b._sz"))
            * F.lit(float(threshold))
            * F.lit(1.0 - 1e-12)
        )
        .select(
            F.col(f"_a.{id_col}").alias("doc_a"),
            F.col(f"_b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("hs").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("hs").alias("sh_b"))
    half = sa.join(cand.hint("merge"), "doc_a")
    verified = (
        sb.join(half.hint("merge"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    out = verified.filter(F.col("jaccard") >= threshold)
    if shingles is None:
        # this call owns the persist; a caller-provided shingle frame's
        # lifecycle belongs to the caller (e.g. the rescue composition)
        attach_plan_caches(out, (sh,))
    return out


class RescueCaches(PlanCaches):
    """Unpersist handle for the shingle frames one
    :func:`minhash_lsh_pairs_rescue` call persisted (the rescue mirror
    of :meth:`CorpusIndex.unpersist` — ADVICE r7: without a handle,
    repeated rescue calls in a long-lived session accumulate
    unreleasable MEMORY_AND_DISK shingle frames). The operator attaches
    an instance to its result as ``pairs.rescue_caches``; call
    ``.unpersist()`` once the pair frame is materialized (collected /
    written) — the plan stays valid afterwards (lineage recomputes),
    only the caching is released. Implementation lives in
    :class:`functions.caching.PlanCaches`, the round-8 generalization
    every internally-persisting operator now attaches as
    ``out.plan_caches``."""


def minhash_lsh_pairs_rescue(
    df: DataFrame,
    partition_filter,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    screen: dict | None = None,
    rescue: dict | None = None,
) -> DataFrame:
    """Screen-then-rescue MinHash dedup — the cost-bounded web-scale
    composition the round-6 preset table prescribed in prose (VERDICT
    r6 Next #2), as one operator:

    1. SCREEN: ``minhash_lsh_pairs`` at MINHASH_DEFAULT (76.7 %
       measured recall) over the WHOLE corpus — the cheap pass.
    2. RESCUE: the same operator at MINHASH_HIGH_RECALL (95.6 %) over
       only the rows matching ``partition_filter`` (a Column predicate
       selecting the partition of interest — the slice that will
       actually be kept/trained on), recovering the boundary pairs the
       screen's s-curve misses.

    Output: (doc_a, doc_b, jaccard, source) — the union, with
    provenance: 'screen' rows are the corpus-wide DEFAULT pairs;
    'rescue' rows are pairs ONLY the high-recall pass found (both
    endpoints inside the partition; jaccard identical in both passes —
    verification is exact — so overlapping pairs keep one row,
    attributed to the screen).

    Recall contract (measured, scripts/measure_rescue.py, mod-4
    partition): pairs with both endpoints in the rescue partition get
    HIGH_RECALL's level — 95.5 % at 100x / 95.7 % at 1000x; everything
    else keeps the screen's 76.7 %. Cost (measured after the
    shared-shingle rework, PLANS.md r7): **1.63x the screen alone at
    100x, 1.77x at 1000x**, vs 2.27x/3.57x for full-corpus HIGH_RECALL
    (r=2 admits low-J candidate mass that outgrows true pairs with
    scale, so the avoided premium GROWS) — the partition's HIGH_RECALL
    contract at roughly half the full-pass cost at 5M docs.

    Plan shape (round 15, VERDICT r14 Next #3): the corpus is shingled
    once for the SCREEN (with its fused band hashes); the RESCUE pass
    shingles the partition DIRECTLY with the rescue geometry fused into
    the kernel — one Python hop yields (hs, bands64x32), so the rescue
    banding is a pure posexplode with NO separate ArrowEvalPython
    re-banding stage. The former shape semi-joined the corpus shingle
    cache on the partition ids and re-banded from ``hs``: at bench
    scale that was measured slower (0.63 vs 0.49 s isolated), and at
    100 TB it moves the FULL corpus's shingle arrays through the
    semi-join exchange (part_ids outgrow any broadcast) just to avoid
    re-tokenizing the partition — exactly the heavy-payload-shuffle-
    for-a-light-decision shape guide §8 forbids. Re-shingling the
    partition reads only its (pruned, predicate-pushed) scan slice.
    The screen/rescue union is resolved by ONE (doc_a, doc_b) aggregation
    taking the screen row on overlap — pair frames are unbounded at
    web scale and their static estimates (distinct over generate over
    cached lineage) can read tiny, so an anti-join formulation would
    need a broadcast pin AND a persist of the screen side to avoid
    double execution; the aggregation needs neither (each pass is
    consumed exactly once, no persisted pair frame lingers).

    Cache lifecycle: the two persisted shingle frames (corpus +
    partition) are exposed on the result as ``pairs.rescue_caches``
    (:class:`RescueCaches`) — call ``pairs.rescue_caches.unpersist()``
    after materializing the pair frame, exactly like
    ``CorpusIndex.unpersist`` after writing the index artifacts."""
    common = dict(
        text_col=text_col,
        id_col=id_col,
        shingle_n=shingle_n,
        threshold=threshold,
        max_bucket=max_bucket,
    )

    # the per-pass dicts may override tuning knobs (n_perm / n_bands /
    # threshold / max_bucket) but NOT the structural columns or
    # shingle_n — the shared shingle frame below is built once with the
    # operator-level values, so a per-pass structural override would
    # silently disagree with it
    def _pass_params(params):
        clean = {
            k: v
            for k, v in params.items()
            if k not in ("text_col", "id_col", "shingle_n", "shingles")
        }
        return {**common, **clean}

    screen_params = _pass_params(MINHASH_DEFAULT if screen is None else screen)
    rescue_params = _pass_params(
        MINHASH_HIGH_RECALL if rescue is None else rescue
    )
    # the shared frame carries the SCREEN preset's fused band hashes
    # (the corpus-wide pass skips its ArrowEvalPython banding stage)
    sh = _doc_shingles(
        df,
        text_col,
        id_col,
        shingle_n,
        screen_params["n_perm"],
        screen_params["n_bands"],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # rescue shingles: the partition shingled DIRECTLY with the RESCUE
    # geometry fused into the same kernel (round 15 — see the Plan
    # shape note above; identical doc set: partition docs with >= 1
    # shingle, and band values bit-identical to _sig_bands_udf over
    # hs). Persisted: the rescue pass consumes it three times (band
    # pipeline + both verification sides). Bounded by the partition
    # fraction.
    sh_part = _doc_shingles(
        df.filter(partition_filter),
        text_col,
        id_col,
        shingle_n,
        # .get with minhash_lsh_pairs' own defaults so the fused tag
        # always matches the geometry the rescue pass will band with
        rescue_params.get("n_perm", 16),
        rescue_params.get("n_bands", 4),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    screened = minhash_lsh_pairs(df, **screen_params, shingles=sh)
    rescued = minhash_lsh_pairs(
        df.filter(partition_filter), **rescue_params, shingles=sh_part
    )
    tagged = screened.select(
        "doc_a",
        "doc_b",
        "jaccard",
        F.lit(0).alias("_prio"),
        F.lit("screen").alias("source"),
    ).unionByName(
        rescued.select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.lit(1).alias("_prio"),
            F.lit("rescue").alias("source"),
        )
    )
    # screen wins on overlap (_prio orders the struct; jaccard is the
    # same exact value in both passes, so the choice only sets `source`)
    out = (
        tagged.groupBy("doc_a", "doc_b")
        .agg(F.min(F.struct("_prio", "jaccard", "source")).alias("m"))
        .select(
            "doc_a",
            "doc_b",
            F.col("m.jaccard").alias("jaccard"),
            F.col("m.source").alias("source"),
        )
    )
    # release handle for the two persists above (ADVICE r7) — an
    # instance attribute, not a subclass, so the return type stays a
    # plain DataFrame for every existing caller; plan_caches is the
    # same handle under the uniform name every persisting operator uses
    out.rescue_caches = RescueCaches((sh, sh_part))
    out.plan_caches = out.rescue_caches
    return out


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60
) -> DataFrame:
    """Map-side SimHash: per bit, sum +1/-1 over token hashes; bit set
    when the sum is positive. Output (id, simhash).

    Default 60-bit (round 6, was 32): 32-bit signatures band into only
    256 buckets per 8-bit band, which saturates the max_bucket skew cap
    beyond ~256k docs (recall collapse — the scale cliff VERDICT r5
    ordered closed). 60 bits is the widest md5-prefix hash that stays
    non-negative in BIGINT on both engines (sign bit untouched), so the
    full shift/mask/XOR/popcount path is portable with zero overflow
    cases."""
    words = words_expr(text_col)
    # single evaluation of the tokenizing split: the kernel returns
    # NULL for tokenless docs and the filter sits on its OUTPUT (the
    # former size(words)>0 pre-filter made the JVM run the split twice
    # — filter + Arrow input projection); asNondeterministic stops the
    # optimizer copying the kernel below the filter (guide §4.4, same
    # mark as _doc_shingles)
    kern = _simhash_udf(bits).asNondeterministic()
    return (
        spread_scan(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), kern(words).alias("simhash"))
        .filter(F.col("simhash").isNotNull())
    )


def _ngram_prefix_instances(
    sh: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """(id, _sz, shingle) instances of each doc's PREFIX — the
    |d| - ceil(t*|d|) + 1 globally-smallest shingles under the
    (document-frequency asc, hash asc) total order, with the doc's full
    shingle-set size riding along (``_sz`` feeds the caller's size
    filter; it is already computed here for the prefix length). Shared
    by ngram_jaccard_pairs (candidate generation) and pair_bucket_stats
    (drop telemetry): both must see the identical bucket-key stream.

    Global document frequency comes from a whole-partition COUNT window
    over ONE (shingle) exchange of the instance stream (round 14 — the
    former count-agg + merge-join consumed ``inv`` twice, recomputing
    the explode over the cached shingle frame, and exchanged the
    instances a second time for the join; the window's per-key buffer
    spills, so a degenerate stop-shingle group degrades to disk exactly
    like the join's sort did). The per-doc prefix is then a window over
    ONE (id) partitioning — the ordered row_number — whose buffer
    spills the same way (ExternalAppendOnlyUnsafeRowArray): memory
    stays document-scale, never corpus-scale."""
    # _sz (per-doc set size) rides map-side from size(hs) — round 6
    # removed the unordered count-window that used to compute it, so
    # the (id) partitioning carries ONE window node (the ordered
    # row_number), not two passes over the sorted stream
    inv = sh.select(
        F.col(id_col), F.size("hs").alias("_sz"), F.explode("hs").alias("shingle")
    )
    ranked = inv.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    wo = Window.partitionBy(id_col).orderBy("_df", "shingle")
    # required overlap = ceil(t * |d|) — computed with a downward
    # epsilon guard: IEEE rounding can overshoot the exact product
    # (0.55 * 100 -> 55.000000000000007 -> ceil 56), which SHORTENS the
    # prefix and silently drops pairs whose Jaccard equals the
    # threshold exactly (ADVICE r5). The guard is RELATIVE (ADVICE r6):
    # IEEE rounding error scales as ~product * 2^-53, so an absolute
    # 1e-9 margin becomes vanishingly small relative to ulp beyond ~1e7
    # distinct shingles; scaling the product by (1 - 1e-12) keeps the
    # margin proportional at any document size while never lowering an
    # exactly-integer product below its integer. Errs toward a LONGER
    # prefix: completeness-safe, cost at most one extra indexed
    # shingle. Property-proven against exact rational arithmetic up to
    # sz=1e12 (tests/test_properties.py::
    # test_ngram_prefix_guard_exact_at_any_size).
    prefix_len = (
        F.col("_sz")
        - F.ceil(
            F.col("_sz") * F.lit(float(threshold)) * F.lit(1.0 - 1e-12)
        ).cast("int")
        + F.lit(1)
    )
    return (
        ranked.withColumn("_rn", F.row_number().over(wo))
        .filter(F.col("_rn") <= prefix_len)
        .select(F.col(id_col), F.col("_sz"), F.col("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    observation=None,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= ``threshold`` via PREFIX FILTERING
    (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07;
    Xiao et al., "Efficient Similarity Joins for Near Duplicate
    Detection", WWW'08): order every doc's shingles by a global
    (document-frequency asc, hash asc) order and index only the first
    ``|d| - ceil(t*|d|) + 1`` of them. Any pair with J >= t shares its
    globally-smallest common shingle inside BOTH prefixes (if A's
    prefix missed every shared shingle, the shared set would fit in
    A's suffix of ceil(t*|A|)-1 < t*|A| <= |A∩B| elements), so the
    prefix index is a COMPLETE candidate generator; candidates then
    pass the lossless SIZE FILTER (min set size >= t * max set size, a
    necessary condition for J >= t) before being verified with the
    exact intersect/union of the full shingle sets.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b — the TRUE
    full-universe Jaccard, no df-cutoff bias. The former
    inverted-index-count form was exact only over a df<=max_df
    universe AND paid sum_shingle C(df,2) pair instances — measured
    6.75 BILLION instances (~160 GB of shuffle) at the 100x stress
    point, because a family-duplicated corpus concentrates its mass in
    near-cap shingles. Rarest-first prefixes skip exactly those
    shingles: the candidate mass collapses to the near-dup pairs
    themselves plus a small false-candidate tail that verification
    rejects.

    ``max_bucket`` caps a single prefix-shingle bucket (size-first, see
    _sized_group_instances — no aggregation buffer exceeds it). A pair
    is lost only if its globally-SMALLEST shared shingle sits in an
    over-cap bucket — and the (df asc) order makes prefix buckets the
    rare end of the distribution, so at the default cap this is a
    degenerate-corpus guard, same contract as minhash_lsh_pairs — and
    the same ``observation`` reports dropped_buckets/total_buckets
    (for stress scale where Observation.get fails, use
    ``pair_bucket_stats`` — the count-aggregate fallback)."""
    # sh feeds the prefix ranking AND both verification sides — persist
    # so the Arrow shingle kernel runs once (small: one row per doc)
    sh = _doc_shingles(df, text_col, id_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pre = _ngram_prefix_instances(sh, id_col, threshold)
    # candidate buckets over prefix instances only, size-first capped;
    # identical postings arrays (a clique whose docs share the same
    # rare shingles) collapse to one row before pair explosion. Each
    # posting carries its doc's shingle-set size (struct sorts by
    # id-first field order, so the sorted-array pair invariant holds)
    buckets = (
        _sized_group_instances(pre, ["shingle"], max_bucket, observation)
        .groupBy("shingle")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col), F.col("_sz")))
            ).alias("ids")
        )
    )
    # SIZE FILTER (Bayardo et al. §3.1, carried inline — no extra join
    # or shuffle): J(A,B) >= t forces |A∩B| >= t*|A∪B|, and with
    # |A∩B| <= min_sz, max_sz <= |A∪B| that means min_sz >= t*max_sz —
    # a candidate failing it is provably below threshold, so pruning it
    # BEFORE the distinct and the verify joins is lossless. Measured:
    # 24 % of sf0.1 candidates pruned (-6 %/-11 % min/med on the
    # query); ~0 % on the 100x Zipf stress corpus (its near-dup cliques
    # are same-size by construction) with timing parity — the struct
    # carry costs nothing when the filter has nothing to prune, and
    # real corpora have varied doc lengths. Same downward-epsilon guard
    # as the prefix length: IEEE can round t*max above the exact
    # product and would drop exact-boundary pairs; scaling by
    # (1 - 1e-12) errs toward keeping, and verification is exact.
    cand = (
        _explode_sorted_pairs(buckets.select("ids").distinct(), "ids")
        .filter(
            F.least(F.col("_a._sz"), F.col("_b._sz"))
            >= F.greatest(F.col("_a._sz"), F.col("_b._sz"))
            * F.lit(float(threshold))
            * F.lit(1.0 - 1e-12)
        )
        .select(
            F.col(f"_a.{id_col}").alias("doc_a"),
            F.col(f"_b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    # exact verification on the full shingle sets — same merge-pinned
    # shape as minhash_lsh_pairs (candidates can be billions of rows at
    # web scale; a static broadcast build of either side would OOM)
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("hs").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("hs").alias("sh_b"))
    half = sa.join(cand.hint("merge"), "doc_a")
    verified = sb.join(half.hint("merge"), "doc_b").select(
        "doc_a",
        "doc_b",
        (
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b"))
        ).alias("jaccard"),
    )
    return attach_plan_caches(
        verified.filter(F.col("jaccard") >= threshold), (sh,)
    )


def _simhash_bands(
    sig: DataFrame, id_col: str, bits: int, n_bands: int
) -> DataFrame:
    """(id, simhash) -> exploded (id, simhash, band, val): the n_bands
    contiguous (bits/n_bands)-wide signature slices. Shared by
    simhash_hamming_pairs and pair_bucket_stats so telemetry counts the
    identical bucket keys the operator shuffles on. shiftright's sign
    extension is irrelevant: signatures never touch the sign bit
    (bits <= 60) and the mask keeps only the slice."""
    assert bits % n_bands == 0
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    return sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select(
        id_col,
        "simhash",
        F.col("bv.band").alias("band"),
        F.col("bv.val").alias("val"),
    )


def simhash_auto_bands(
    n_docs: int,
    bits: int = 60,
    max_bucket: int = 1000,
    preferred: int = 4,
    max_hamming: int = 3,
) -> int:
    """Derive the band count for ``simhash_hamming_pairs`` from corpus
    size — the EXECUTABLE form of the band-saturation escape the
    round-6 scale notes documented in prose (VERDICT r6 Next #1).

    Two regimes, because two different losses compete:

    - Widening bands ABOVE the completeness floor ``max_hamming + 1``
      is free (the pigeonhole guarantee — any pair with hamming <
      n_bands shares a band — still covers the full radius), so among
      floor-respecting divisors of ``bits`` the rule takes the largest
      band count whose mean bucket occupancy n_docs / 2^(bits/n_bands)
      keeps 4x headroom under ``max_bucket`` (Poisson mass above the
      cap at lambda <= B/4 is negligible; content skew is what the cap
      is FOR).
    - Widening BELOW the floor trades completeness for capacity: at
      n_bands = max_hamming the pigeonhole covers only hamming <
      n_bands, and e.g. 3 bands of 20 bits miss ~23 % of EXACTLY-
      hamming-3 pairs (20^3 / C(60,3) placements put one differing bit
      in each band). That trade only pays near wholesale bucket
      collapse, so the rule holds the floor until the floor config's
      MEAN occupancy exceeds the cap itself (lambda > max_bucket — the
      regime where most pairs die in dropped buckets and a bounded
      per-radius loss is strictly better), then proceeds
      radius-greedily: each successive band count is held until ITS
      mean occupancy exceeds the cap.

    At bits=60, max_bucket=1000, max_hamming=3 (floor 4): 4 bands
    (15-bit) to 32.77M docs (cap loss measured 0.23 % at 5M stays the
    better trade through moderate saturation), then 3 (20-bit, 1.05M
    buckets) to 1.05B docs, then 2 (30-bit). At max_hamming <= 2 the
    floor drops and widening starts at the 4x-headroom point instead
    (8.19M docs for 3 bands) because no radius is given up. Every
    returned value divides ``bits``; ValueError only if no divisor of
    bits in [2, preferred] exists. Beyond the widest band's own
    saturation point, shard by a content prefix."""
    floor = min(preferred, max_hamming + 1)
    divisors = [nb for nb in range(preferred, 1, -1) if bits % nb == 0]
    if not divisors:
        raise ValueError(f"no band count in [2, {preferred}] divides bits={bits}")
    # free regime: respect the completeness floor, take the largest
    # band count whose mean occupancy keeps 4x headroom under the cap
    for nb in divisors:
        if nb < floor:
            break
        if n_docs <= (1 << (bits // nb)) * max_bucket // 4:
            return nb
    # floor saturated: radius-greedy — hold each band count until its
    # MEAN occupancy exceeds the cap itself (the wholesale-collapse
    # regime where a bounded per-radius pigeonhole loss is strictly
    # better), then widen one step
    for nb in divisors:
        if n_docs <= (1 << (bits // nb)) * max_bucket:
            return nb
    # even the widest band saturates: the corpus needs sharding, but
    # the widest divisor is still the least-loss configuration
    return divisors[-1]


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    n_bands: int | str = 4,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    observation=None,
) -> DataFrame:
    """SimHash near-duplicate pairs: candidates share at least one of
    n_bands signature slices (pigeonhole: any pair within hamming
    distance < n_bands must agree on some band), verified with an exact
    popcount of the XOR. Same bucket-collect pair generation as
    MinHash-LSH — the signature pipeline is computed once, shuffled
    once on (band, slice-value). Buckets larger than ``max_bucket``
    (degenerate slice values concentrating O(n^2) pairs in one task) are
    dropped; an ``Observation`` reports the drop count.

    Scale note: band-value space is 2^(bits/n_bands). The round-6
    default — 60-bit signatures, 15-bit bands, 32,768 buckets per band
    — keeps mean occupancy under the max_bucket=1000 cap to ~33M
    RANDOM docs per corpus (the former 32-bit/8-bit-band default
    saturated at ~256k: the scale cliff VERDICT r5 ordered closed; the
    round-6 100x stress measures zero non-degenerate drops at the new
    default). For corpora beyond ~10^8 docs, lower n_bands to 3
    (20-bit bands, 1M buckets) or shard by a content prefix — both are
    parameters, the math is unchanged. 60 (not 64) because the md5
    15-hex-digit prefix is the widest portable hash that never touches
    the BIGINT sign bit on either engine.

    ``n_bands="auto"`` derives the band count from the SIGNATURE
    population via ``simhash_auto_bands`` (one count over the persisted
    signature frame, which the main job reuses): the preferred 4 bands
    while the completeness floor and occupancy rules allow (see the
    helper's docstring for the two-tier schedule). The registry/gate
    queries run the unchanged literal default."""
    sig = simhash_signatures(df, text_col, id_col, bits).persist()
    if n_bands == "auto":
        # count the SIGNATURE population, not df: rows that tokenize to
        # nothing produce no signature (and no bucket entry), so a
        # boilerplate-heavy corpus counted via df would overestimate
        # occupancy and widen bands — giving up pigeonhole radius —
        # earlier than the math warrants. The count also materializes
        # the persisted sig frame the main job reuses, so the extra job
        # does the work the pipeline pays anyway.
        n_bands = simhash_auto_bands(
            sig.count(), bits=bits, max_bucket=max_bucket, max_hamming=max_hamming
        )
    bands = _simhash_bands(sig, id_col, bits, n_bands)
    # size-first cap (see _sized_group_instances): bucket populations
    # are counted before any member array is collected, so a degenerate
    # slice value can never build an over-cap aggregation buffer
    buckets = (
        _sized_group_instances(bands, ["band", "val"], max_bucket, observation)
        .groupBy("band", "val")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("s"))
                )
            ).alias("members")
        )
    )
    pairs = (
        # same cross-band dedup as minhash_lsh_pairs: identical member
        # arrays recur once per band — collapse before pair explosion
        _explode_sorted_pairs(buckets.select("members").distinct(), "members")
        .select(
            F.col("_a.id").alias("doc_a"),
            F.col("_b.id").alias("doc_b"),
            F.col("_a.s").alias("sa"),
            F.col("_b.s").alias("sb"),
        )
        .distinct()
    )
    return attach_plan_caches(
        pairs.select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
            .cast("long")
            .alias("hamming"),
        ).filter(F.col("hamming") <= max_hamming),
        (sig,),
    )


def bucket_drop_stats(inv: DataFrame, keys: list[str], max_bucket: int) -> dict:
    """Count-aggregate bucket-drop telemetry: dropped_buckets (key
    groups over ``max_bucket``) and total_buckets over an instance
    frame — the SAME two numbers _sized_group_instances reports through
    an Observation, derived instead from a plain two-level aggregate.

    This is the production-scale path: ``Observation.get`` fails with a
    row-conversion AssertionError on very large AQE plans (observed at
    the 500k-doc stress point), which blinds the recall guard exactly
    where it matters. A count aggregate has no observe node — one cheap
    extra job (map-side-combined counts, then a scalar rollup)."""
    row = (
        inv.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_gsz"))
        .agg(
            F.count(F.when(F.col("_gsz") > max_bucket, 1)).alias(
                "dropped_buckets"
            ),
            F.count(F.lit(1)).alias("total_buckets"),
        )
        .collect()[0]
    )
    return {
        "dropped_buckets": row["dropped_buckets"],
        "total_buckets": row["total_buckets"],
    }


def pair_bucket_stats(
    df: DataFrame,
    family: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    n_perm: int = 16,
    n_bands: int = 4,
    bits: int = 60,
    simhash_bands: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> dict:
    """Bucket-drop telemetry for one pair family ('minhash', 'simhash',
    'ngram') at the operator's own defaults: rebuilds the identical
    bucket-key instance frame the pair operator shuffles on and reports
    dropped_buckets / total_buckets via the count-aggregate fallback
    (see bucket_drop_stats — Observation.get dies at stress scale).
    Recomputes the signature pipeline (telemetry is a diagnostic pass,
    not part of the query plan)."""
    if family == "minhash":
        inv = minhash_band_hashes(
            df, text_col, id_col, shingle_n, n_perm, n_bands
        )
        return bucket_drop_stats(inv, ["band", "band_hash"], max_bucket)
    if family == "simhash":
        sig = simhash_signatures(df, text_col, id_col, bits)
        inv = _simhash_bands(sig, id_col, bits, simhash_bands)
        return bucket_drop_stats(inv, ["band", "val"], max_bucket)
    if family == "ngram":
        # the prefix ranking reads the shingle frame twice (df counts +
        # instance join) — persist so the Arrow kernel runs once, same
        # discipline as the operator itself
        sh = _doc_shingles(df, text_col, id_col, shingle_n).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            inv = _ngram_prefix_instances(sh, id_col, threshold)
            return bucket_drop_stats(inv, ["shingle"], max_bucket)
        finally:
            sh.unpersist()
    raise ValueError(f"unknown pair family: {family!r}")


class CorpusIndex(dict):
    """The three corpus artifacts as a plain mapping (``hashes`` /
    ``shingles`` / ``bands`` — iterate, subscript, and write exactly
    like a dict of DataFrames), plus an ``unpersist()`` handle for the
    shingle cache the build persisted (ADVICE r6: the cache otherwise
    lingers for the session lifetime after the artifacts are written).
    Call it once the three frames are materialized to parquet."""

    def __init__(self, frames: dict, cached: DataFrame):
        super().__init__(frames)
        self._cached = cached

    def unpersist(self) -> "CorpusIndex":
        self._cached.unpersist()
        return self

    @property
    def is_cached(self) -> bool:
        lvl = self._cached.storageLevel
        return bool(lvl.useMemory or lvl.useDisk)


def build_corpus_index(
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    n_perm: int = 16,
    n_bands: int = 4,
) -> "CorpusIndex":
    """The three corpus-side artifacts incremental_dedup consumes,
    computed ONCE for persistence as tables — the production shape for
    a continuously-ingesting pipeline (per-run cost then touches only
    the incoming batch; the corpus's md5/shingle/MinHash work is
    amortized to zero across runs):

    - ``hashes``   (corp_id, h): content hashes for the exact stage
    - ``shingles`` (corp_id, hs): shingle-hash sets for verification
    - ``bands``    (corp_id, band, band_hash): the LSH band index

    Write each to parquet and hand the read-back frames to
    ``incremental_dedup(..., corpus_index=...)`` — output is identical
    to the recompute path (tests/test_incremental_dedup.py pins it).
    The index is parameter-bound: reruns must pass the same shingle_n /
    n_perm / n_bands the index was built with. The shingle frame is
    persisted during the build so the Arrow kernel runs once across
    the two frames derived from it; call ``.unpersist()`` on the
    returned index after materializing the artifacts to release it."""
    # ONE corpus text scan for all three artifacts (round 15): the
    # content hashes ride the shingle kernel's scan projection
    # (carry_hash), so building the index reads the text column once
    # instead of twice. The full frame keeps empty-shingle rows —
    # short/NULL-text docs must still appear in `hashes` (exact-stage
    # coverage); the shingle/band artifacts filter size(hs) > 0, the
    # identical doc set the former filtered frame produced.
    sh_full = _doc_shingles(
        corpus_df, text_col, id_col, shingle_n, n_perm, n_bands,
        carry_hash=True,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sh = sh_full.filter(F.size("hs") > 0)
    return CorpusIndex(
        {
            "hashes": sh_full.select(
                F.col(id_col).alias("corp_id"), F.col("_h").alias("h")
            ),
            "shingles": sh.select(F.col(id_col).alias("corp_id"), "hs"),
            "bands": _band_hashes_from_shingles(sh, id_col, n_perm, n_bands).select(
                F.col(id_col).alias("corp_id"), "band", "band_hash"
            ),
        },
        sh_full,
    )


def incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    n_perm: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    corpus_index: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Dedup an INCOMING batch against an EXISTING reference corpus —
    the shape every continuously-ingesting training pipeline needs
    (the full-corpus pair ops re-dedup everything; this touches only
    the new batch plus the corpus's precomputed index).

    Stages, all batch-vs-corpus (never corpus-vs-corpus):

    1. exact: content-hash anti-check — one join keyed on md5(text);
       matches become status='exact_dup' with the smallest matching
       corpus id.
    2. near: MinHash band hashes of the survivors joined against the
       corpus band-hash index on (band, band_hash). In production the
       corpus index is computed once (``build_corpus_index``), persisted
       as tables, and passed back via ``corpus_index`` — only the new
       batch's signatures are computed per run (measured: the corpus
       side is the dominant cost of the recompute path; PLANS.md
       round-6 entry records the saved work). Corpus buckets
       larger than ``max_bucket`` are skipped (same skew guard as
       minhash_lsh_pairs). Candidates are verified with exact
       shingle-set Jaccard; best match = highest jaccard, ties to the
       smallest corpus id. status='near_dup'.
    3. everything else: status='unique'.

    Output: (doc_id, status, match_id, jaccard) — one row per new doc;
    match_id/jaccard are NULL for 'unique', jaccard NULL for
    'exact_dup'. Shuffles: hash join + band join + verify join, each
    keyed and AQE-promotable; zero driver collects.

    Boundedness contract: the planner may broadcast BATCH-derived
    frames (hashes, bands, candidates) — an increment is bounded by the
    ingestion batch size by design. Corpus-derived frames must never
    build a broadcast: the band-index, bucket-filter, and shingle-set
    joins are pinned sort-merge (their estimates come from aggregates /
    unmaterialized Arrow lineage — the misestimate class that OOM'd
    ngram-Jaccard at a 10x stress run). The exact-hash join stays
    statistics-driven: corp_hash is a projection of the corpus scan
    with a realistic scan-proportional estimate, and the batch side is
    the legitimate broadcast candidate."""
    if (corpus_df is None) == (corpus_index is None):
        raise ValueError(
            "pass exactly one of corpus_df (recompute path) or "
            "corpus_index (precomputed-index path)"
        )
    # persists owned by THIS call (a corpus_index's cache lifecycle
    # belongs to CorpusIndex.unpersist); exposed as out.plan_caches
    own_caches: list[DataFrame] = []
    new_ids = new_df.select(F.col(id_col))
    new_hash = new_df.select(
        F.col(id_col).alias("new_id"), F.md5(F.col(text_col)).alias("h")
    )
    if corpus_index is not None:
        corp_hash = corpus_index["hashes"]
        bands_corp = corpus_index["bands"]
        sh_corp_c = corpus_index["shingles"].select(
            F.col("corp_id"), F.col("hs").alias("sh_c")
        )
    else:
        # NOT hash-carried (round 15 — tried and REVERTED): riding
        # md5(text) on the shingle kernel's scan (carry_hash, the shape
        # build_corpus_index keeps) removes the second corpus text scan
        # BUT makes the exact stage — the head of the whole batch-side
        # chain (remaining -> batch kernel -> everything) — depend on
        # the corpus kernel frame's materialization. The standalone
        # hash projection runs CONCURRENTLY with the corpus kernel
        # today, so the fused shape trades max(md5 scan, kernel) for
        # kernel-then-batch-chain: measured +20-30 % on the query at
        # sf0.1 (alternating-process min-of-3, new arm slower in 3/3
        # cycles) — the same critical-path-serialization mechanism as
        # the reverted corpus-side semi prefilter above. The saving is
        # real only where there is no concurrency to lose, which is
        # exactly build_corpus_index (a build-once batch job), where
        # the carry IS kept.
        corp_hash = corpus_df.select(
            F.col(id_col).alias("corp_id"), F.md5(F.col(text_col)).alias("h")
        )
        sh_corp = _doc_shingles(
            corpus_df, text_col, id_col, shingle_n, n_perm, n_bands
        ).persist(StorageLevel.MEMORY_AND_DISK)
        own_caches.append(sh_corp)
        bands_corp = _band_hashes_from_shingles(
            sh_corp, id_col, n_perm, n_bands
        ).select(F.col(id_col).alias("corp_id"), "band", "band_hash")
        sh_corp_c = sh_corp.select(
            F.col(id_col).alias("corp_id"), F.col("hs").alias("sh_c")
        )
    # consumed twice (remaining-exclusion + final union): persist so the
    # hash join runs once, not per consumer
    exact = (
        new_hash.join(corp_hash, "h")
        .groupBy("new_id")
        .agg(F.min("corp_id").alias("match_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    own_caches.append(exact)

    remaining = new_df.join(
        exact.select(F.col("new_id").alias(id_col)), id_col, "left_anti"
    )
    sh_new = _doc_shingles(
        remaining, text_col, id_col, shingle_n, n_perm, n_bands
    ).persist(StorageLevel.MEMORY_AND_DISK)
    own_caches.append(sh_new)
    # persisted too (batch-bounded: n_bands rows per surviving doc):
    # the candidate join consumes it here, and the ingestion loop's
    # grown-index build re-reads BOTH batch-side frames from cache —
    # without the exposure below, every epoch re-ran the tokenize/
    # shingle/MinHash Arrow kernels a second time over the unique docs
    # (measured 8-11 s of the 19 s epoch at 10k-doc epochs, round 13)
    bands_new = (
        _band_hashes_from_shingles(sh_new, id_col, n_perm, n_bands)
        .select(F.col(id_col).alias("new_id"), "band", "band_hash")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    own_caches.append(bands_new)
    # bucket-size guard via a window count over the SAME (band,
    # band_hash) exchange the candidate join needs — one shuffle of the
    # corpus band index total, vs the former groupBy-count + double join
    # that shuffled bands_corp twice and sorted ok_buckets separately.
    # Round 13: count populations only for buckets the BATCH touches —
    # the cap decision for untouched buckets is unobservable downstream
    # (they produce no candidates), each touched bucket's population is
    # still counted over its FULL corpus membership. Round 14 (ADVICE
    # r13): the broadcast side is PINNED to `touched` — it is
    # batch-bounded by design (<= n_bands rows per surviving doc), so
    # forcing it both guarantees the map-side corpus filter and removes
    # the misestimate risk of the OTHER side winning the broadcast
    # (bands_corp derives from unmaterialized Arrow-UDF lineage in the
    # corpus_df recompute path — exactly the tiny-static-estimate class
    # whose corpus-side broadcast this module pins sort-merge elsewhere).
    bucket_w = Window.partitionBy("band", "band_hash")
    touched = bands_new.select("band", "band_hash").distinct()
    bc_ok = (
        bands_corp.join(F.broadcast(touched), ["band", "band_hash"])
        .withColumn("n", F.count(F.lit(1)).over(bucket_w))
        .filter(F.col("n") <= max_bucket)
        .drop("n")
    )
    cand = (
        bands_new.join(bc_ok.hint("merge"), ["band", "band_hash"])
        .select("new_id", "corp_id")
        .distinct()
    )
    # NOT prefiltered (round 14, session 5 — tried and REVERTED): a
    # broadcast semi-join of the corpus shingle side on cand's distinct
    # corp_ids (guide §3.2) cuts the corpus-array exchange to matched
    # rows, but its build side is the LAST stage of the candidate
    # pipeline — the corpus-side scan, which the scheduler otherwise
    # runs CONCURRENTLY with candidate generation, then cannot start
    # until the whole candidate critical path finishes. Measured +34 %
    # on the query at sf0.1 (3.66 -> 4.91 s interleaved in-process
    # min); the serialization is structural at any scale (wall becomes
    # cand_path + corpus_path instead of max of the two), so the
    # shuffle-byte saving has to beat a full critical-path length to
    # win — it did not here and the shape was dropped.
    # join ORDER matters for the exchange count (round 14): corpus
    # shingles attach FIRST (keyed corp_id), batch shingles LAST (keyed
    # new_id) — whenever the planner takes the sort-merge path for the
    # batch-shingle join (corpus-scale batches; small batches may
    # legitimately broadcast the batch side instead), the verified
    # frame leaves that join already hash-partitioned on new_id, which
    # is exactly the best-match window's required distribution: the
    # window then needs a sort but NO exchange (inner joins commute;
    # output identical either way)
    verified = (
        cand.join(sh_corp_c.hint("merge"), "corp_id")
        .join(
            sh_new.select(F.col(id_col).alias("new_id"), F.col("hs").alias("sh_n")),
            "new_id",
        )
        .select(
            "new_id",
            "corp_id",
            (
                F.size(F.array_intersect("sh_n", "sh_c"))
                / F.size(F.array_union("sh_n", "sh_c"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("new_id").orderBy(
        F.col("jaccard").desc(), F.col("corp_id").asc()
    )
    # also consumed twice (near_out + unique exclusion)
    near = (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("new_id", F.col("corp_id").alias("match_id"), "jaccard")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    own_caches.append(near)

    exact_out = exact.select(
        F.col("new_id").alias(id_col),
        F.lit("exact_dup").alias("status"),
        "match_id",
        F.lit(None).cast("double").alias("jaccard"),
    )
    near_out = near.select(
        F.col("new_id").alias(id_col),
        F.lit("near_dup").alias("status"),
        "match_id",
        "jaccard",
    )
    matched = exact_out.select(id_col).union(near_out.select(id_col))
    unique_out = new_ids.join(matched, id_col, "left_anti").select(
        F.col(id_col),
        F.lit("unique").alias("status"),
        F.lit(None).cast("long").alias("match_id"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    out = attach_plan_caches(
        exact_out.union(near_out).union(unique_out), own_caches
    )
    # expose the PERSISTED batch-side artifacts for downstream index
    # growth (streaming/ingestion.py): shingle-hash sets and band
    # hashes of every exact-stage survivor — a superset of the unique
    # docs, deterministic per doc, so subsetting them by the unique ids
    # reproduces build_corpus_index(unique_docs) bit-identically
    # without re-running the Arrow kernels (pinned by
    # tests/test_incremental_dedup.py). Valid until plan_caches
    # releases (the frames recompute from lineage afterwards — slower,
    # not wrong).
    out.batch_shingles = sh_new  # (id_col, hs[, bands{n_perm}x{n_bands}])
    out.batch_bands = bands_new  # (new_id, band, band_hash)
    return out


def _local_checkpoint_rdd(df: DataFrame):
    """The checkpointed JVM RDD backing a ``localCheckpoint()``-ed
    frame, or None if the plan is not a LogicalRDD leaf."""
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() == "LogicalRDD":
        return plan.rdd()
    return None


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free the block-manager storage of a ``localCheckpoint()``-ed
    frame. ``DataFrame.unpersist()`` only removes CacheManager entries,
    and a checkpointed frame was never registered there — its blocks
    belong to the checkpointed RDD inside the plan's LogicalRDD leaf.
    After release the frame cannot be recomputed (lineage was
    truncated): only call on frames no round will read again."""
    rdd = _local_checkpoint_rdd(df)
    if rdd is not None:
        rdd.unpersist(False)


class CheckpointCaches:
    """Release handle for the TERMINAL localCheckpoint backing an
    operator's returned frame (``connected_components``' converged
    labels). Deliberately NOT a :class:`functions.caching.PlanCaches`:
    that contract promises the plan recomputes from lineage after
    release, but a checkpoint IS the lineage — after ``unpersist()``
    the returned frame is dead and must not be re-executed. Call only
    once the result is fully consumed (collected / written). The
    in-loop superseded rounds are still released eagerly inside the
    operator; this handle covers only the final frame, whose blocks
    otherwise linger for the session lifetime."""

    __slots__ = ("_frames",)

    def __init__(self, frames) -> None:
        self._frames = tuple(frames)

    def unpersist(self) -> "CheckpointCaches":
        for f in self._frames:
            _release_local_checkpoint(f)
        return self

    @property
    def is_cached(self) -> bool:
        for f in self._frames:
            rdd = _local_checkpoint_rdd(f)
            if rdd is not None:
                lvl = rdd.getStorageLevel()
                if lvl.useMemory() or lvl.useDisk():
                    return True
        return False


_CC_OBS_SEQ = [0]  # Observation names must be unique per session


def _observed_metrics(obs, timeout_s: float = 30.0):
    """``Observation.get`` with a BOUNDED wait: the metrics row or None.

    ``get`` blocks inside the JVM's ``getRow()`` until the observed
    dataset's first action delivers metrics — called after the action
    returned, that is normally instant, but the known failure mode is
    metrics simply never being delivered (listener dropped the event),
    in which case ``get`` blocks FOREVER and a try/except fallback is
    unreachable (ADVICE r13). Fetch from a daemon helper thread and
    give up after ``timeout_s`` so callers can fall back to a plain
    aggregation job instead of hanging."""
    import threading

    box: dict = {}

    def _fetch() -> None:
        try:
            box["row"] = obs.get
        except Exception as ex:  # noqa: BLE001 — surfaced as fallback
            box["err"] = ex

    t = threading.Thread(target=_fetch, daemon=True)
    t.start()
    t.join(timeout_s)
    return box.get("row")


def _checkpoint_with_sum(labels_df: DataFrame):
    """Eagerly localCheckpoint a (node, label) frame and return
    (checkpointed_frame, sum_of_labels) paying ONE Spark job: the
    convergence sum rides the checkpoint's materializing job as an
    Observation instead of a second agg job over the checkpointed
    blocks (round 13 — the loop runs 5+ rounds on long-chain corpora,
    so one job per round is material). Falls back to the plain agg if
    the observation doesn't populate — raised row-conversion errors
    AND the never-delivered-metrics mode, which blocks instead of
    raising and therefore rides a bounded-wait fetch (ADVICE r13)."""
    from pyspark.sql import Observation

    _CC_OBS_SEQ[0] += 1
    obs = Observation(f"cc_label_sum_{_CC_OBS_SEQ[0]}")
    ck = labels_df.observe(obs, F.sum("label").alias("s")).localCheckpoint()
    row = _observed_metrics(obs)
    if row is not None:
        return ck, row["s"]
    return ck, ck.agg(F.sum("label")).collect()[0][0]


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Dedup clustering: connected components over near-dup pairs by
    iterative min-label propagation with pointer jumping — each round
    every node takes the minimum label in its neighborhood, then chases
    one level of indirection (label := label(label)), so convergence is
    O(log diameter) rounds rather than O(diameter). Converged when the
    (monotonically non-increasing) label sum stops changing. Output:
    (node, cluster_rep = min id reachable).

    Driver-coordinated loop, but every step is a distributed
    join+groupBy — the only collects are scalar label sums. Each round's
    labels are localCheckpoint-ed: lineage is truncated so the plan tree
    (and task closure) stays constant-size regardless of iteration
    count. Raises RuntimeError if max_iters rounds pass without
    convergence — silent truncation would hand back wrong cluster
    representatives.

    Cache lifecycle: superseded rounds' checkpoints are released
    in-loop; the TERMINAL round's checkpoint backs the returned frame
    and is exposed as ``out.checkpoint_caches``
    (:class:`CheckpointCaches`) — release it once the labels are fully
    consumed. Unlike ``plan_caches``, the frame cannot be recomputed
    after release (the checkpoint is the lineage)."""
    # materialize the pair frame ONCE before the symmetrize union: the
    # two union branches are otherwise independent subplans, so a
    # caller handing in an unmaterialized pipeline (dedup_clusters
    # hands the full MinHash-LSH verify pipeline) pays for it TWICE in
    # the first action — measured 2.5 s of dedup_clusters' 7.0 s at
    # sf0.1 (round-13 profiling). localCheckpoint is eager; the blocks
    # are released when the loop ends (they back the persisted edge
    # frame's recompute lineage — see the NOTE below the init).
    src_pairs = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint()
    # symmetrize AND add self-loops in one persisted frame: with
    # (n, n) present, min over dst-labels of a node's incident edges IS
    # min(own label, neighbor labels) — so the loop needs a single
    # join+groupBy per round instead of the old two-step (neighbor-min
    # groupBy, then a second left-join back onto labels): one fewer
    # shuffle per round, bit-identical labels.
    nodes = (
        src_pairs.select("src")
        .union(src_pairs.select(F.col("dst").alias("src")))
        .distinct()
    )
    # CO-PARTITION the static side ONCE (round 14): the edge frame is
    # hash-partitioned AND sorted on dst before persisting, so every
    # round's sort-merge join against it needs NO exchange and NO sort
    # on the 2|E|+|V|-row side — the per-round shuffle volume drops
    # from O(|E|) + O(|V|) to O(|V|) on the join input (the groupBy
    # re-key of the joined rows remains, as it must). At 100 TB this
    # is the difference between re-shuffling the full symmetrized edge
    # set every round and shuffling only the label table. Partition
    # count matches the session's shuffle partitions so the labels
    # exchange aligns with the cached layout instead of forcing a
    # re-shuffle of the cached side.
    n_part = int(
        pairs.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    edges = (
        src_pairs.union(
            src_pairs.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .union(nodes.select("src", F.col("src").alias("dst")))
        .repartition(n_part, "dst")
        .sortWithinPartitions("dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # initialize straight to min over N(n) ∪ {n} (the self-loop row
    # carries the node's own id): exactly round one's neighbor-min
    # folded into the init groupBy — one fewer loop iteration (each
    # costs a join + two shuffles + a checkpoint job)
    labels, prev_sum = _checkpoint_with_sum(
        edges.groupBy("src")
        .agg(F.min("dst").alias("label"))
        .withColumnRenamed("src", "node")
    )
    # NOTE: src_pairs' checkpoint blocks stay alive until the loop
    # ends — the persisted edge frame's RECOMPUTE lineage roots on
    # them, and every round reads edges, so releasing early would
    # leave edges unrecoverable if an executor drops cache blocks
    # mid-loop (round-13 review finding; the storage cost is one pair
    # frame for the loop's duration).
    #
    # ROUND SHAPE (round 14): the checkpointed state is the PRE-jump
    # propagated labels p_k; the pointer jump (label := label(label))
    # is applied LAZILY to the previous checkpoint as part of the next
    # round's single job, so the final confirming round never executes
    # a jump at all (VERDICT r13 Next #1's sanctioned variant).
    # Exactness of the pre-jump convergence test: labels are pointwise
    # monotone non-increasing (p(x) <= x always, so jump never raises a
    # label and min-propagation only lowers them), hence sum-equal =>
    # pointwise-equal => p = propagate(jump(p)). At such a fixed point
    # every edge (a,b) forces p(a) <= jump(p)(b) <= p(b) and vice
    # versa, so p is constant per component; the constant is a member
    # node <= the component min, i.e. exactly the component min. The
    # oracle (recursive-CTE reachability) re-proves this bit-for-bit at
    # both gate SFs.
    converged = False
    n_rounds = 0
    for _ in range(max_iters):
        n_rounds += 1
        # pointer jump of the previous checkpoint: both branches read
        # the SAME checkpointed LogicalRDD (|V| rows), so the self-join
        # costs two small exchanges inside this round's job — and the
        # loop pays rounds-1 jumps total instead of rounds. Join
        # strategies stay STATISTICS-DRIVEN on purpose (measured: a
        # forced sort-merge pin cost ~1 s/round at sf1.0, round 14):
        # unlike the pair pipelines' Arrow-UDF lineage, the label
        # side's stats flow from the materialized edge cache through a
        # checkpoint, so they track real data — small-label rounds may
        # legitimately broadcast, and corpus-scale labels plan
        # sort-merge against the co-partitioned edge cache.
        # (A deeper per-round pointer chase — label := label^(k+1) via
        # k chained |V|-row self-joins — was tried and REVERTED this
        # round: it does cut rounds on long-chain graphs (256-node
        # path: 8 -> 6 at depth 2, 5 at depth 3), but near-dup
        # cluster graphs are shallow cliques whose round count is
        # already the convergence floor — measured n_rounds == 4 at
        # every depth on the sf1.0 corpus, so the extra joins were
        # pure overhead there and at any clique-shaped corpus.)
        lab = labels.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        jumped = labels.join(lab, labels.label == lab.jnode, "left").select(
            F.col("node"),
            F.coalesce(F.col("jlabel"), F.col("label")).alias("label"),
        )
        new_labels, new_sum = _checkpoint_with_sum(
            edges.join(jumped, edges.dst == jumped.node)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("src", "node")
        )
        # release the superseded round's checkpoint blocks — without
        # this every round's full labels frame stays in the block
        # manager for the query's lifetime (must go through the RDD:
        # DataFrame.unpersist() is a no-op for checkpointed frames)
        superseded = labels
        labels = new_labels
        _release_local_checkpoint(superseded)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    edges.unpersist()
    _release_local_checkpoint(src_pairs)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter too large?) — raise max_iters"
        )
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_rep")
    )
    # the terminal round's checkpoint backs the returned frame — expose
    # its release (checkpoint semantics: result is DEAD after release,
    # so this is checkpoint_caches, NOT the recompute-safe plan_caches)
    out.checkpoint_caches = CheckpointCaches((labels,))
    # loop rounds executed (incl. the confirming round, excl. the init
    # fold) — the skew/diameter arms pin the O(log diameter) contract
    # on this, so a future plan change that silently degrades to
    # O(diameter) rounds fails a test instead of a 100 TB run
    out.n_rounds = n_rounds
    return out


def decontaminate(
    train_df: DataFrame,
    holdout_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per TRAINING document, the fraction
    of its distinct word n-gram shingles that also appear anywhere in
    the HOLDOUT (benchmark/eval) corpus — the standard pre-training
    hygiene pass that catches test-set leakage verbatim or lightly
    edited.

    Scale: the holdout shingle set is benchmark-sized (tiny next to
    the corpus) — the join is keyed on the shingle hash and AQE
    broadcasts the holdout side when it fits. Round 14: the training
    side crosses that join ONCE as a LEFT join carrying a hit flag,
    and a single (doc)-keyed aggregation counts both rows (= the
    doc's shingle count — explode emits len(hs) rows and the distinct
    holdout side cannot fan them out) and hits. The former shape
    persisted the shingle frame to feed two consumers (the inner-join
    count and the per-doc size) and joined the counts BACK on doc_id —
    one more exchange, one persist, and a second pass over the frame,
    all for values one aggregation already had. Integer counts + one
    exact division (count(_hit) is 0 for an uncontaminated doc, so
    the former coalesce is subsumed).

    Output: (doc_id, n_shingles, n_contaminated, contamination) for
    every train doc with >= shingle_n words (docs below that emit no
    shingles and are filtered inside _doc_shingles, so every doc here
    has >= 1 exploded row)."""
    hold = (
        _doc_shingles(holdout_df, text_col, id_col, shingle_n)
        .select(F.explode("hs").alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    inv = _doc_shingles(train_df, text_col, id_col, shingle_n).select(
        F.col(id_col), F.explode("hs").alias("shingle")
    )
    return attach_plan_caches(
        inv.join(hold, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
        )
        .select(
            F.col(id_col),
            "n_shingles",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_shingles")).alias(
                "contamination"
            ),
        ),
        (),
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    with_match: bool = True,
) -> DataFrame:
    """Exact duplicated-span detection (the curation signal of Lee et
    al. 2021, arXiv:2107.06499 "Deduplicating Training Data Makes
    Language Models Better" — exact substring duplication, here at
    word-n-gram granularity): a SPAN is one positioned word n-gram,
    and it is duplicated iff the identical n-gram text occurs in at
    least one OTHER document. Per-doc output for docs with >= 1 span:

      (id, n_spans, n_dup_spans, dup_span_ratio,
       match_doc = smallest other doc sharing any duplicated span)

    distinct from dedup_ngram_jaccard (set similarity — unordered
    overlap fraction) and text_repetition (intra-doc only): this is
    POSITION-counted cross-document duplication, the memorization/
    boilerplate-share signal span-level dedup acts on.

    NULL ids are excluded (no identity => no match to report — same
    rationale as training_shuffle_manifest).

    Scale (100 TB): span generation is a map-side array expression
    (one row per position — the published algorithm's cost shape;
    tokens-in-corpus rows, like the wordcount chain). The gram table
    shuffles ONCE by gram for a window+aggregate that reuses the same
    partitioning (row_number and the (m1, m2, n_docs) rollup share one
    exchange), then the positioned spans join the per-gram stats on the
    equi-key — spillable sort-merge, pinned hint-free. The per-doc
    rollup is a map-side-combinable count/sum/min."""
    words = words_expr(text_col)
    # single evaluation of the tokenizing split (round 14, session 5 —
    # the #8 fix applied here too): the former size(words) >= n
    # pre-filter made the JVM run the regex split TWICE per row (once
    # in the filter, once inlined into the Arrow input projection
    # after projection collapse — the plan showed two split() calls, a
    # ~2 s/scan floor at sf1.0). The kernel now returns [] for short
    # or NULL-words docs and posexplode emits no rows for an empty
    # array — the identical doc set survives.
    base = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col), words.alias("words")
    )
    # gram construction is an Arrow kernel, not the interpreted
    # transform(sequence, slice, concat_ws) chain (round 14).
    # Measured honestly (same-session interleaved min-of-3 at sf1.0,
    # full operator): the kernel buys ~14-21% — smaller than the
    # shingle case because words_expr's regex split is a shared ~2 s
    # floor — and composes with the one-exchange reshape below to
    # 7.59 -> 5.86 s (-23%). Round 15 (VERDICT r14 Next #7): the kernel
    # emits the 60-bit md5-prefix HASH of each positioned gram instead
    # of the string — the gram key's only use is grouping/windowing (its
    # text never reaches the output), so the one gram exchange below
    # carries 8-byte longs instead of n-word strings; the oracles hash
    # the identical bytes, so collisions (if any) merge identically on
    # both engines. posexplode keeps the position semantics.
    grams = base.select(
        F.col(id_col),
        F.posexplode(_gram_hashes_udf(n)(F.col("words"))).alias(
            "pos0", "gram"
        ),
    ).select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "gram")
    # ONE exchange carries the gram keys (round 14; round 15 made the
    # key an 8-byte hash — see above). The former shape shuffled them
    # up to three times — gram_docs.distinct(), the stats groupBy's
    # re-exchange (distinct partitions on BOTH (gram, id)), and the
    # positioned-span join.
    # Repartition on gram once; then the per-(gram, doc) position
    # count (HashPartitioning(gram) satisfies the (gram, id)
    # clustering — subset rule) and the whole-partition window that
    # replaces the stats-aggregate-plus-join reuse that one exchange
    # (one sort, no data movement), and everything downstream carries
    # integers. At sf1.0 the local win is ~10% (NVMe hides shuffle
    # volume; interleaved A/B in PLANS round 14); at cluster scale
    # gram-string shuffle bytes are first-order, which is why the
    # shape, not the local number, is the point. Identical output:
    # positions are counted per (gram, doc) first and summed in the
    # rollup, so n_spans/n_dup_spans/ratio and the m1/m2 match-doc
    # derivation see the same values.
    per = (
        grams.repartition(F.col("gram"))
        .groupBy("gram", id_col)
        .agg(F.count(F.lit(1)).alias("k"))
    )
    if not with_match:
        # ratio-only consumers (curation_pipeline's span cap): n_docs
        # per gram via an unordered window over the SAME partitioning
        # (WindowExec sorts by gram once) — no stats frame, no join
        wg = Window.partitionBy("gram")
        spans = per.select(
            F.col(id_col),
            F.col("k"),
            (F.count(F.lit(1)).over(wg) >= 2).alias("dup"),
        )
        return spans.groupBy(id_col).agg(
            F.sum("k").alias("n_spans"),
            F.sum(F.when(F.col("dup"), F.col("k")).otherwise(0)).alias(
                "n_dup_spans"
            ),
            (
                F.sum(F.when(F.col("dup"), F.col("k")).otherwise(0))
                / F.sum("k")
            ).alias("dup_span_ratio"),
        )
    # n_docs / m1 / m2 in ONE whole-partition window pass (rows are
    # distinct (gram, id) after the agg, ordered by id, so first = min
    # id and nth_value(2) = second-smallest — exactly the old
    # rn == 1 / rn == 2 derivation without the stats aggregate and
    # the sort-merge join that re-sorted the gram strings twice)
    wall = (
        Window.partitionBy("gram")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    spans = per.select(
        F.col(id_col),
        F.col("k"),
        (F.count(F.lit(1)).over(wall) >= 2).alias("dup"),
        F.first(id_col).over(wall).alias("m1"),
        F.nth_value(id_col, 2).over(wall).alias("m2"),
    ).select(
        F.col(id_col),
        "k",
        "dup",
        F.when(F.col(id_col) != F.col("m1"), F.col("m1"))
        .otherwise(F.col("m2"))
        .alias("om"),
    )
    return spans.groupBy(id_col).agg(
        F.sum("k").alias("n_spans"),
        F.sum(F.when(F.col("dup"), F.col("k")).otherwise(0)).alias(
            "n_dup_spans"
        ),
        (
            F.sum(F.when(F.col("dup"), F.col("k")).otherwise(0))
            / F.sum("k")
        ).alias("dup_span_ratio"),
        F.min(F.when(F.col("dup"), F.col("om"))).alias("match_doc"),
    )
