"""Adversarial scale-guard tests: degenerate inputs that would melt a
single task at 100 TB must be survivable (and observable) at any size.

- LSH/SimHash bucket caps: 10k identical docs form one degenerate band
  bucket per band; without the `max_bucket` cutoff that is a 50M-pair
  explosion inside one task. The cap must drop those buckets (reported
  via Observation) while unrelated near-dup pairs still come through.
- ANN bucketed scoring: a corpus whose vectors all land in ONE bucket
  must still be scored through bounded sub-blocks, never one pandas
  frame per bucket.
- Plan shape: minhash_lsh_pairs must not force a broadcast of the
  shingle-array verification side (VERDICT r1: unbounded at web scale).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

N_DEGENERATE = 10_000


@pytest.fixture(scope="module")
def skew_docs(spark):
    """10k byte-identical docs + two (mutually identical) outliers."""
    common = "the quick brown fox jumps over the lazy dog again and again"
    rare = "completely different content about distributed query engines"
    base = spark.range(N_DEGENERATE).select(
        F.col("id").alias("doc_id"), F.lit(common).alias("text")
    )
    extra = spark.createDataFrame(
        [(N_DEGENERATE, rare), (N_DEGENERATE + 1, rare)], "doc_id long, text string"
    )
    return base.union(extra)


def test_minhash_lsh_bucket_cap_drops_degenerate(spark, skew_docs):
    from solace_apache_beam_spark.llm.dedup import minhash_lsh_pairs

    ob = Observation("lsh_buckets")
    out = minhash_lsh_pairs(skew_docs, observation=ob).collect()
    # the 10k-identical cluster is dropped wholesale (its buckets exceed
    # the cap); the small outlier pair survives
    assert [(r.doc_a, r.doc_b) for r in out] == [(N_DEGENERATE, N_DEGENERATE + 1)]
    assert out[0].jaccard == 1.0
    got = ob.get
    assert got["dropped_buckets"] >= 1
    assert got["total_buckets"] > got["dropped_buckets"]


def test_simhash_bucket_cap_drops_degenerate(spark, skew_docs):
    from solace_apache_beam_spark.llm.dedup import simhash_hamming_pairs

    ob = Observation("simhash_buckets")
    out = simhash_hamming_pairs(skew_docs, observation=ob).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(N_DEGENERATE, N_DEGENERATE + 1)]
    assert out[0].hamming == 0
    got = ob.get
    assert got["dropped_buckets"] >= 1


def test_ngram_prefix_bucket_cap_drops_degenerate(spark, skew_docs):
    """ADVICE r5: the prefix-filter join's max_bucket cap was the one
    pair family with no drop telemetry. Same contract as the other two:
    the 10k-identical clique's prefix shingles (df=10k, over cap) drop
    wholesale and OBSERVABLY; the rare outlier pair (df=2 shingles)
    survives with exact jaccard."""
    from solace_apache_beam_spark.llm.dedup import ngram_jaccard_pairs

    ob = Observation("ngram_prefix_buckets")
    out = ngram_jaccard_pairs(skew_docs, observation=ob).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(N_DEGENERATE, N_DEGENERATE + 1)]
    assert out[0].jaccard == 1.0
    got = ob.get
    assert got["dropped_buckets"] >= 1
    assert got["total_buckets"] > got["dropped_buckets"]


def test_pair_bucket_stats_fallback_matches_observation(spark, skew_docs):
    """The count-aggregate telemetry fallback (the production-scale
    path where Observation.get dies) must report the same counts the
    Observation does on the same corpus."""
    from solace_apache_beam_spark.llm.dedup import (
        minhash_lsh_pairs,
        pair_bucket_stats,
    )

    ob = Observation("lsh_buckets_vs_fallback")
    minhash_lsh_pairs(skew_docs, observation=ob).collect()
    via_ob = ob.get
    via_agg = pair_bucket_stats(skew_docs, "minhash")
    assert via_agg["dropped_buckets"] == via_ob["dropped_buckets"]
    assert via_agg["total_buckets"] == via_ob["total_buckets"]


def test_ann_lsh_single_degenerate_bucket_is_subblocked(spark):
    """300 identical vectors -> every vector in the same LSH bucket.
    With block_size=64 the bucket is scored as 5 sub-blocks (15 block
    pairs), each task bounded — and the merged top-k is exactly what a
    whole-bucket matmul would produce: all cosines 1.0, ties broken by
    ascending neighbor id."""
    from solace_apache_beam_spark.llm.similarity import ann_lsh_topk

    n = 300
    vec = [0.25, -0.5, 1.0, 0.125]
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x) for x in vec]).alias("embedding"),
    )
    out = ann_lsh_topk(df, n_planes=2, k=5, block_size=64).collect()
    assert len(out) == n * 5
    by_q = {}
    for r in out:
        assert r.cos_sim == 1.0
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for q, neigh in by_q.items():
        expected = [i for i in range(n) if i != q][:5]
        assert [nid for _, nid in sorted(neigh)] == expected


def test_ann_derived_plane_count_scales_with_corpus(spark):
    """n_planes=None derives the bucket count from the corpus size so
    mean bucket occupancy stays ~target_bucket."""
    from solace_apache_beam_spark.llm.similarity import _derive_n_buckets

    assert _derive_n_buckets(1_000, 4096) == 1
    assert _derive_n_buckets(1_000_000, 4096) == 245
    assert _derive_n_buckets(10_000_000_000, 4096) == 2441407


def test_kmv_bottom_k_prefilter_bounds_shuffle_and_keeps_estimate(spark):
    """The map-side bottom-k kernel must (a) cut the shuffled rows to
    <= k per group per batch and (b) be lossless: the estimate equals
    the full bottom-k estimator replayed in Python over the same md5
    hash."""
    import hashlib

    from solace_apache_beam_spark.functions.sketch import (
        HASH_SPACE,
        _bottom_k_prefilter,
        kmv_distinct,
    )

    n, k = 5000, 128
    df = spark.range(n).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )

    # (a) bound: one group, one partition -> one batch of n rows in, k out
    hashed = df.select(
        "grp",
        F.conv(F.substring(F.md5(F.col("val").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).coalesce(1)
    pruned = hashed.mapInPandas(_bottom_k_prefilter("grp", k), hashed.schema)
    assert pruned.count() == k

    # (b) losslessness vs a Python replay of the full estimator
    hs = sorted(
        {int(hashlib.md5(f"v{i}".encode()).hexdigest()[:15], 16) for i in range(n)}
    )
    expected = (k - 1) * HASH_SPACE / hs[k - 1]
    [row] = kmv_distinct(df, "val", "grp", k=k).collect()
    assert row.est_distinct == expected

    # small group: exact-count fallback unharmed by the prefilter
    small = spark.range(50).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("val")
    )
    [srow] = kmv_distinct(small, "val", "grp", k=k).collect()
    assert srow.est_distinct == 50.0


def test_minhash_lsh_no_broadcast_of_verification_sides(spark, sf_dir):
    """VERDICT r1 (strengthened round 3): the verification joins must
    never broadcast — the candidate and shingle sides are unbounded at
    web scale, and Catalyst's static estimate for the candidate frame
    (distinct over a generate over a cached relation) can read tiny and
    misplan a broadcast build that OOMs (observed live on the analogous
    ngram-Jaccard join at a 10x stress run). Merge hints now pin
    spillable sort-merge joins; the static physical plan must contain
    no broadcast operator at all."""
    import __spark_entry__ as e

    df = e.queries()["dedup_minhash_lsh"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan
    # and no broadcast FORCING either (merge hints are the only hints)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()


def test_rowwise_topk_mask_keeps_rounded_ties():
    """Unit contract of the kernel-side partial top-k: per row, every
    VALID entry tying-or-beating the k-th largest valid score survives;
    invalid entries never do, even on rows with < k valid entries."""
    import numpy as np

    from solace_apache_beam_spark.llm.similarity import _rowwise_topk_mask

    scores = np.array(
        [
            [0.9, 0.8, 0.8, 0.7],   # k=2 boundary tie: keep all three >= 0.8
            [0.5, 0.4, 0.3, 0.2],   # plain top-2
            [0.9, 0.1, 0.1, 0.1],   # only one valid entry (< k)
        ]
    )
    valid = np.array(
        [
            [True, True, True, True],
            [True, True, True, True],
            [True, False, False, False],
        ]
    )
    mask = _rowwise_topk_mask(scores, valid, 2)
    assert mask.tolist() == [
        [True, True, True, False],
        [True, True, False, False],
        [True, False, False, False],
    ]
    # k >= n_cols degenerates to the validity mask
    assert _rowwise_topk_mask(scores, valid, 4).tolist() == valid.tolist()


def test_emit_sliced_bounds_every_batch():
    import pandas as pd

    from solace_apache_beam_spark.llm.similarity import _emit_sliced

    frame = pd.DataFrame({"x": range(10)})
    parts = list(_emit_sliced(frame, cap=4))
    assert [len(p) for p in parts] == [4, 4, 2]
    assert pd.concat(parts)["x"].tolist() == list(range(10))
    # under-cap frames pass through unsliced
    assert len(list(_emit_sliced(frame, cap=100))) == 1


def test_topk_partial_prune_keeps_window_granularity_ties(spark):
    """The kernel prunes on the ROUNDED cosine — the granularity the
    final window orders by. Two neighbors whose raw cosines differ but
    round to the same 6-decimal value are a window tie resolved by
    ascending neighbor id; a raw-value prune at k=1 would ship only the
    raw-best (larger-id) neighbor and silently change the winner.

    Construction (quantization-exact: components are n/2^20 so the
    kernel's integer dots see exactly n): query [2^20, 0];
    id 10 -> [2^20, 1414]: cos = 1/sqrt(1+1999396/2^40) ~ 0.99999900
    id  5 -> [2^20, 1415]: cos ~ 0.99999900 (differs in the 9th place)
    both round to 0.999999 -> tie -> id 5 must win rank 1."""
    from solace_apache_beam_spark.llm.similarity import brute_force_topk

    q = 1 << 20

    def vec(a, b):
        return [a / q, b / q]

    corpus = spark.createDataFrame(
        [
            (10, vec(q, 1414)),   # raw-higher cosine, larger id
            (5, vec(q, 1415)),    # raw-lower cosine, smaller id
            (99, vec(1, 1)),      # clearly worse (cos ~ 0.707)
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1, vec(q, 0))], "vec_id long, embedding array<double>"
    )
    rows = brute_force_topk(corpus, queries, k=1).collect()
    assert len(rows) == 1
    assert rows[0].neighbor_id == 5
    assert rows[0].cos_sim == 0.999999


def test_ann_lsh_topk_matches_unpruned_bucket_reference(spark):
    """End-to-end parity of the pruned-emission path: ann_lsh_topk on a
    random clustered corpus must equal a numpy reference that scores
    each LSH bucket in FULL (no partial top-k, no slicing) and applies
    the same rounded-cosine / ascending-id window."""
    import numpy as np

    from solace_apache_beam_spark.llm.similarity import (
        _block_scores,
        _quantize,
        ann_lsh_topk,
        lsh_bucket,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, (8, 6))
    vecs = np.concatenate(
        [base[i] + rng.normal(0, 0.05, (10, 6)) for i in range(8)]
    )
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )
    k = 3
    out = ann_lsh_topk(df, n_planes=3, k=k, block_size=16)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim) for r in out.collect()
    }

    buckets = {}
    for r in lsh_bucket(df, n_planes=3).collect():
        buckets.setdefault(r.bucket, []).append(int(r.vec_id))
    expect = {}
    qm = _quantize(vecs.astype(np.float64))
    for members in buckets.values():
        ids = np.array(sorted(members))
        cos = np.round(_block_scores(qm[ids], qm[ids]), 6)
        for qi, qid in enumerate(ids):
            order = sorted(
                (
                    (-cos[qi, ni], nid)
                    for ni, nid in enumerate(ids)
                    if nid != qid and np.isfinite(cos[qi, ni])
                ),
            )[:k]
            for rank, (negc, nid) in enumerate(order, start=1):
                expect[(qid, rank)] = (nid, -negc)
    assert got == expect


def test_simhash_auto_bands_thresholds():
    """The executable saturation-escape rule (VERDICT r6 Next #1),
    two-tier so 'auto' can never silently shrink the complete hamming
    radius while the cap loss is still small: ABOVE the completeness
    floor max_hamming+1, widen freely at 4x occupancy headroom; AT the
    floor, hold until mean occupancy exceeds the cap itself (wholesale
    bucket collapse — where 3 bands' ~23% exactly-hamming-3 pigeonhole
    loss becomes strictly better than losing every radius class in
    dropped buckets), then widen radius-greedily. Switch points are
    exact integer arithmetic, so pin them exactly."""
    from solace_apache_beam_spark.llm.dedup import simhash_auto_bands

    import pytest as _pytest

    hold4 = (1 << 15) * 1000      # 32_768_000: floor-hold limit, 4 bands
    hold3 = (1 << 20) * 1000      # 1_048_576_000: radius-greedy, 3 bands
    assert simhash_auto_bands(1_000) == 4
    assert simhash_auto_bands(5_000_000) == 4      # the measured 1000x point
    assert simhash_auto_bands(8_192_000) == 4      # 4x-headroom edge
    assert simhash_auto_bands(8_192_001) == 4      # floor holds: radius first
    assert simhash_auto_bands(hold4) == 4
    assert simhash_auto_bands(hold4 + 1) == 3      # collapse regime: escape
    assert simhash_auto_bands(hold3) == 3
    assert simhash_auto_bands(hold3 + 1) == 2
    assert simhash_auto_bands(10**12) == 2         # widest divisor: shard
    # max_hamming<=2 drops the floor: widening is free (no radius given
    # up), so it starts at the 4x-headroom point instead of the cap
    assert simhash_auto_bands(8_192_001, max_hamming=2) == 3
    assert simhash_auto_bands(8_192_001, max_hamming=1) == 3
    # every return divides bits, even on the shard-regime fallthrough
    assert simhash_auto_bands(10**12, bits=45) == 3
    with _pytest.raises(ValueError):
        simhash_auto_bands(1_000, bits=7)          # no divisor in [2, 4]
    # non-default geometry: 12-bit sigs, cap 50 (the saturation test's)
    assert simhash_auto_bands(600, bits=12, max_bucket=50, max_hamming=1) == 2


def test_simhash_band_saturation_escape_restores_capped_pairs(spark):
    """The saturation REGIME itself, scaled down so a pytest can hold
    it: 12-bit signatures band into 8 buckets/band at the preferred 4
    bands, so ~600 random docs push every bucket far over a cap of 50
    and the cap drops nearly all true pairs. The auto-derived escape
    (2 bands -> 64 buckets, mean occupancy ~9) must restore the FULL
    brute-force truth set: with max_hamming=1 the 2-band pigeonhole is
    still complete (a 1-bit difference leaves one band identical), so
    any miss could only come from a capped bucket — asserting equality
    proves zero capped-pair loss exactly where the default measurably
    loses. Same mechanism as the 15-bit/20-bit move at 33M docs; the
    bit-width is scaled so the test runs in seconds."""
    from solace_apache_beam_spark.llm.dedup import (
        simhash_auto_bands,
        simhash_hamming_pairs,
        simhash_signatures,
    )

    rng = __import__("random").Random(7)
    # letters only: the tokenizer splits on [^\p{L}]+, so digit-bearing
    # vocab like "w123" would collapse to the single token "w".  NINE
    # (odd) tokens per doc: an even count lets the per-bit +/-1 sum hit
    # exactly 0, biasing every bit toward unset and skewing band values
    # onto a few hot buckets; an odd count makes each bit a fair coin,
    # so bucket occupancy matches the uniform math the escape rule uses.
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = [
        "".join(rng.choice(letters) for _ in range(6)) for _ in range(4000)
    ]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(9))) for i in range(600)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    sigs = {
        r.doc_id: r.simhash
        for r in simhash_signatures(df, bits=12).collect()
    }
    ids = sorted(sigs)
    truth = {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 1
    }
    assert len(truth) > 100  # dense enough to mean something

    def found(n_bands):
        out = simhash_hamming_pairs(
            df, bits=12, n_bands=n_bands, max_hamming=1, max_bucket=50
        ).collect()
        return {(r.doc_a, r.doc_b) for r in out}

    capped = found(4)
    assert capped <= truth
    assert len(capped) < len(truth) * 0.5  # the default measurably drops

    nb = simhash_auto_bands(df.count(), bits=12, max_bucket=50, max_hamming=1)
    assert nb == 2
    assert found("auto") == truth  # the escape restores every pair


def test_simhash_auto_counts_signature_population(spark, monkeypatch):
    """Round-7 self-review fix: n_bands="auto" must size bands from the
    SIGNATURE population, not df.count() — rows that tokenize to
    nothing produce no signature and no bucket entry, so counting them
    would overestimate occupancy and give up pigeonhole radius earlier
    than the math warrants."""
    from solace_apache_beam_spark.llm import dedup

    seen = {}
    real = dedup.simhash_auto_bands

    def spy(n_docs, **kw):
        seen["n_docs"] = n_docs
        return real(n_docs, **kw)

    monkeypatch.setattr(dedup, "simhash_auto_bands", spy)
    rows = [(i, "real words here to hash") for i in range(5)]
    rows += [(100 + i, "") for i in range(7)]  # tokenize to nothing
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dedup.simhash_hamming_pairs(df, n_bands="auto").collect()
    assert seen["n_docs"] == 5


def test_bm25_duplicate_doc_ids_fail_loudly(spark):
    """bm25_components' map-side doc_len is only correct when id_col is
    unique (one row per document). A duplicate id would make tf sum
    across rows while doc_len stays per-row — silently inconsistent
    output — so the in-plan guard (count(*) vs count distinct, riding
    the corpus aggregation the operator pays anyway) must fail the job
    loudly instead."""
    from solace_apache_beam_spark.llm.text_analysis import bm25_components

    ok = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    assert bm25_components(ok, min_df=1).count() > 0

    dup = spark.createDataFrame(
        [(1, "a b"), (1, "c d")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="unique"):
        bm25_components(dup, min_df=1).collect()


def test_neardup_auto_route_thresholds():
    """The executable route rule for neardup_pairs (VERDICT r8 Next #1
    — the last prose-only scale escape): exact while the corpus packs
    into <= 64 id-range blocks, LSH above. The input is the BLOCK
    population the kernel would materialize (ADVICE r9: rows only
    lower-bound blocks under sparse ids), so pin the switch points in
    block units."""
    from solace_apache_beam_spark.llm.similarity import neardup_auto_route

    assert neardup_auto_route(0) == "exact"
    assert neardup_auto_route(1) == "exact"      # gate scale (500 dense ids)
    assert neardup_auto_route(49) == "exact"     # 100x stress (200k dense)
    assert neardup_auto_route(64) == "exact"     # the horizon itself
    assert neardup_auto_route(65) == "lsh"
    assert neardup_auto_route(1221) == "lsh"     # 1000x stress (5M dense)
    # the horizon is configurable for kernels with other block budgets
    assert neardup_auto_route(75, max_exact_blocks=80) == "exact"
    assert neardup_auto_route(81, max_exact_blocks=80) == "lsh"


def test_neardup_corpus_stats_counts_real_blocks(spark):
    """ADVICE r9 (medium): the router must count the blocks the exact
    kernel ACTUALLY packs, not ceil(rows/block_size). Sparse ids — one
    id per block_size-wide range — make every row its own block, so a
    row count that says "1 block" hides a B^2 = rows^2 task explosion.
    Also pins that the counter ignores NULL-vector rows (they carry no
    vector, _pack_blocks filters them) and that the auto route flips to
    LSH on the sparse corpus while staying exact on the dense twin."""
    from solace_apache_beam_spark.llm.similarity import (
        neardup_auto_route,
        neardup_corpus_stats,
    )

    bs = 4096
    dense = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)]
        + [(100, None)],  # NULL vector: excluded from both counts
        "vec_id long, embedding array<double>",
    )
    n, blocks = neardup_corpus_stats(dense, block_size=bs)
    assert (n, blocks) == (100, 1)
    assert neardup_auto_route(blocks) == "exact"

    sparse = spark.createDataFrame(
        [(i * bs, [float(i), 1.0]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    n, blocks = neardup_corpus_stats(sparse, block_size=bs)
    assert (n, blocks) == (100, 100)  # rows bound says 1; reality is 100
    assert neardup_auto_route(blocks) == "lsh"


def _neardup_corpus(spark):
    """Small corpus with the adversarial shapes the exact kernel
    handles: duplicate vectors (cos exactly 1), a zero vector (norm 0,
    every pair dropped), near-dups above and below the threshold."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, (12, 8))
    rows = []
    vid = 0
    for i in range(12):
        for _ in range(3):  # 3 jittered variants per seed: near-dups
            rows.append((vid, (base[i] + rng.normal(0, 0.05, 8)).tolist()))
            vid += 1
    rows.append((vid, rows[0][1]))  # exact duplicate (cos = 1)
    rows.append((vid + 1, [0.0] * 8))  # zero vector
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_neardup_lsh_single_bucket_equals_exact(spark):
    """n_planes=0 degenerates the LSH route to one global bucket —
    the in-bucket verify then scores every pair, so the output must be
    IDENTICAL to the exact route (same integer-exact arithmetic, same
    rounding, same threshold boundary). This is the equivalence that
    makes the auto-gate meaningful: the two routes differ only in
    candidate generation."""
    from solace_apache_beam_spark.llm.similarity import (
        neardup_pairs,
        neardup_pairs_lsh,
    )

    df = _neardup_corpus(spark)
    exact = neardup_pairs(df, threshold=0.4)
    lsh = neardup_pairs_lsh(df, threshold=0.4, n_planes=0)
    e = sorted(map(tuple, exact.collect()))
    l = sorted(map(tuple, lsh.collect()))
    assert e == l and len(e) > 0
    exact.plan_caches.unpersist()
    lsh.plan_caches.unpersist()


def test_neardup_lsh_is_subset_with_identical_cosines(spark):
    """With real plane counts the LSH route may MISS pairs (bounded by
    the measured recall) but can never invent or mis-score one: every
    emitted pair must exist in the exact output with a bit-identical
    cosine (precision 1.0 — candidates are exact-verified), and the
    multi-table OR-construction must emit each pair once."""
    from solace_apache_beam_spark.llm.similarity import (
        neardup_pairs,
        neardup_pairs_lsh,
    )

    df = _neardup_corpus(spark)
    exact = neardup_pairs(df, threshold=0.4)
    lsh = neardup_pairs_lsh(df, threshold=0.4, n_planes=3, n_tables=2)
    e = {(r.id_a, r.id_b): r.cos_sim for r in exact.collect()}
    lrows = lsh.collect()
    l = {(r.id_a, r.id_b): r.cos_sim for r in lrows}
    assert len(lrows) == len(l), "duplicate pair escaped the OR-dedup"
    assert set(l) <= set(e)
    assert all(e[p] == c for p, c in l.items())
    # the jittered-variant cliques are high-cosine — the LSH route
    # must actually find pairs, not vacuously pass as empty
    assert len(l) > 0
    exact.plan_caches.unpersist()
    lsh.plan_caches.unpersist()


def test_neardup_auto_dispatches_both_sides_of_the_horizon(spark):
    """route='auto' END-TO-END across the horizon, scaled down so a
    pytest can hold it (the horizon is in BLOCKS, so a tiny block_size
    moves it into test range — the same trick the simhash saturation
    test uses with 12-bit signatures).

    Below: the default block size keeps the corpus at 1 block, so auto
    must reproduce the exact route verbatim — the contract the driver
    gate proves at sf0.01 against the shared oracle.

    Above: block_size=1 puts a 70-vector corpus at 70 blocks > 64, so
    auto must dispatch to the LSH route. With the default target_bucket
    (8192 > corpus) the derivation lands on n_planes=0 — one global
    bucket — so the LSH-side output is ALSO provably-exact here, and
    equality with the exact route verifies the dispatch end-to-end
    without recall noise."""
    import numpy as np

    from solace_apache_beam_spark.llm.similarity import neardup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (14, 8))
    rows = [
        (5 * i + j, (base[i] + rng.normal(0, 0.05, 8)).tolist())
        for i in range(14)
        for j in range(5)
    ]  # 70 vectors in 14 jittered cliques
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = neardup_pairs(df, threshold=0.4)
    below = neardup_pairs(df, threshold=0.4, route="auto")  # 1 block
    above = neardup_pairs(df, threshold=0.4, route="auto", block_size=1)
    e = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, below.collect()))
    a = sorted(map(tuple, above.collect()))
    assert e == b and e == a and len(e) > 0
    for h in (exact, below, above):
        h.plan_caches.unpersist()


def test_neardup_auto_routes_sparse_ids_to_lsh_end_to_end(spark):
    """The ADVICE r9 medium scenario, end-to-end: 70 vectors whose ids
    sit one per default-block-size range — the ROW count says 1 block
    (the old routing would stay exact and pack 70 near-empty blocks:
    2,485 matmul tasks for 70 vectors), the real block population is 70
    > 64, so auto must dispatch to LSH. The derived plane count at this
    corpus size is 0 (one global bucket), so the LSH-side output is
    provably exact and the dispatch verifies with no recall noise —
    including that _bucketed_threshold_pairs' row_number sub-blocking
    is indifferent to the sparse id domain."""
    import numpy as np

    from solace_apache_beam_spark.llm.similarity import neardup_pairs

    rng = np.random.default_rng(13)
    base = rng.normal(0, 1, (14, 8))
    rows = [
        ((5 * i + j) * 4096, (base[i] + rng.normal(0, 0.05, 8)).tolist())
        for i in range(14)
        for j in range(5)
    ]  # 70 vectors, ids 0, 4096, 8192, ... — one per id-range block
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = neardup_pairs(df, threshold=0.4)
    auto = neardup_pairs(df, threshold=0.4, route="auto")
    e = sorted(map(tuple, exact.collect()))
    a = sorted(map(tuple, auto.collect()))
    assert e == a and len(e) > 0
    exact.plan_caches.unpersist()
    auto.plan_caches.unpersist()


def test_neardup_recall_info_surfaces_measured_points():
    """The angular-recall trade must be programmatic at call sites
    (the ann_recall_info pattern): nearest measured corpus point,
    >=0.8-band recall (the dedup-actionable contract: 99.5-100 % at
    every measured scale), and an explicit floor marker when the table
    count has no measured point of its own."""
    from solace_apache_beam_spark.llm.similarity import neardup_recall_info

    r = neardup_recall_info(4, 150_000)
    assert r["measured_at"] == 200_000
    assert r["recall_band_08_10"] == 1.0
    assert r["recall_overall_t04"] == 0.420
    r2 = neardup_recall_info(2, 2_500_000)
    assert r2["measured_at"] == 2_000_000
    assert r2["recall_band_08_10"] == 0.9954
    # unmeasured L floors to the nearest measured L below (monotone)
    r3 = neardup_recall_info(8, 20_000)
    assert "floor" in r3["preset"] and r3["recall_band_08_10"] == 1.0


def test_neardup_recall_info_bounds_are_directional():
    """A table count OUTSIDE the measured L range must label the
    direction of the bound: below the smallest measured L the reported
    numbers are a CEILING (recall is monotone in L), above the largest
    a FLOOR — reporting L=2's recall for L=1 as a floor would overstate
    the single-table preset."""
    from solace_apache_beam_spark.llm.similarity import neardup_recall_info

    r1 = neardup_recall_info(1, 20_000)
    assert "ceiling" in r1["preset"] and "L=2" in r1["preset"]
    r8 = neardup_recall_info(8, 20_000)
    assert "floor" in r8["preset"] and "L=4" in r8["preset"]


def test_neardup_route_info_surfaces_decision_and_recall(spark):
    """The route's EXPLAIN surface: stats + decision + exact-plan cost,
    and on the LSH route the measured recall contract — programmatic at
    call sites like ann_recall_info / neardup_recall_info."""
    from solace_apache_beam_spark.llm.similarity import neardup_route_info

    bs = 4096
    dense = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    info = neardup_route_info(dense, block_size=bs)
    assert info["route"] == "exact" and info["n_blocks"] == 1
    assert info["exact_block_pairs"] == 1 and "recall" not in info

    sparse = spark.createDataFrame(
        [(i * bs, [1.0, float(i)]) for i in range(70)],
        "vec_id long, embedding array<double>",
    )
    info = neardup_route_info(sparse, block_size=bs, n_tables=4)
    assert info["route"] == "lsh" and info["n_blocks"] == 70
    assert info["exact_block_pairs"] == 70 * 71 // 2
    assert info["recall"]["recall_band_08_10"] >= 0.99


def test_connected_components_giant_component_hot_key(spark):
    """Adversarial skew arm (VERDICT r13 Next #1): ONE giant component
    whose min id becomes the hot key of every loop join at scale — the
    hub's neighborhood is a hot groupBy key in the propagate step, and
    once most nodes carry label 0 the pointer-jump join key is
    maximally skewed. 100 chains of 12 hung off hub 0 (diameter 24):
    labels must be bit-exact (everything reaches 0) and the round count
    must stay logarithmic in the diameter, not linear."""
    from solace_apache_beam_spark.llm.dedup import connected_components

    chains, length = 100, 12
    edges = []
    for c in range(chains):
        base = c * length
        edges.append((0, base + 1))
        edges += [(base + i, base + i + 1) for i in range(1, length)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(pairs)
    rows = out.collect()
    assert len(rows) == chains * length + 1
    assert {r.cluster_rep for r in rows} == {0}
    assert out.n_rounds <= 8  # ~log2(diameter 24) + confirm, with slack
    out.checkpoint_caches.unpersist()


def test_connected_components_long_chain_log_rounds(spark):
    """Adversarial diameter arm (VERDICT r13 Next #1): a 256-node path
    is the worst case for label propagation — O(diameter) rounds
    without pointer jumping. Labels must be exact (all reach node 1)
    and rounds must track log2(diameter): distance covered grows
    ~2^k per round, so 256 nodes need ~8 rounds + the confirming one.
    A plan change that silently drops the jump fails here long before
    it times out a 100 TB run."""
    from solace_apache_beam_spark.llm.dedup import connected_components

    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    out = connected_components(pairs)
    rows = out.collect()
    assert len(rows) == n - 1 + 1
    assert {r.cluster_rep for r in rows} == {1}
    assert out.n_rounds <= 10
    out.checkpoint_caches.unpersist()


def test_spread_scan_parallelizes_scan_and_never_probes_shuffled_frames(
    spark, tmp_path
):
    """spread_scan (round 14) must (a) spread a narrow single-split scan
    chain to the session's default parallelism without changing rows,
    and (b) return any frame with an exchange in its lineage UNTOUCHED
    (same object) — probing such a frame's partitioning under AQE
    executes its upstream query stages, i.e. silently runs the subquery
    an extra time."""
    from solace_apache_beam_spark.functions.partitioning import (
        _scan_like,
        spread_scan,
    )

    path = str(tmp_path / "one_group.parquet")
    spark.range(1000).select(
        F.col("id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    scan = spark.read.parquet(path).select("id", "text").filter(F.col("id") >= 0)

    assert _scan_like(scan)
    out = spread_scan(scan)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out.collect()) == list(range(1000))

    joined = scan.join(
        scan.groupBy("text").count().select(F.col("text")), "text", "left_anti"
    )
    assert not _scan_like(joined)
    assert spread_scan(joined) is joined


def test_spread_scan_byte_floor_skips_small_scans(spark, tmp_path):
    """min_bytes (the tokenize-site floor): a scan estimated below the
    floor must come back untouched; the same scan with floor 0 must
    spread. Keeps the sf0.1 bench shape stable while sf1.0+ inputs
    spread (the floor compares the optimizer's own size estimate, so
    it is bytes-derived, not a row/core-count constant)."""
    from solace_apache_beam_spark.functions.partitioning import spread_scan

    path = str(tmp_path / "small.parquet")
    spark.range(100).selectExpr("id", "repeat('x', 10) as text").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    scan = spark.read.parquet(path).select("id", "text")
    assert spread_scan(scan, min_bytes=1 << 30) is scan
    spread = spread_scan(scan, min_bytes=0)
    assert spread is not scan
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
