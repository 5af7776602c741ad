"""Property-based differential test for the exact brute-force cosine
top-k (llm/similarity.brute_force_topk) — previously covered only by
the fixed-embeddings oracle gate. The Python reference mirrors the
documented contract step by step:

  quantize  round-half-away-from-zero(x * 2^20) per component
  cosine    integer-exact dot / (norm * norm) in float64
  report    Spark F.round(cos, 6) = BigDecimal HALF_UP on the exact
            binary double (mirrored with decimal.Decimal, NOT
            numpy.round — scaled half-to-even differs in the last
            quantum)
  rank      per query: cos_sim desc, neighbor_id asc, row_number <= k
  exclude   self-pairs and non-finite scores (zero-norm vectors)

Randomized inputs deliberately include zero vectors (norm 0 — every
score involving them must vanish, not become NaN rows), duplicate
vectors (cos exactly 1.0 ties — the id tiebreak decides), and
same-score ties at the k boundary (the _rowwise_topk_mask slack must
admit every window-granularity tie)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._fuzz import n_examples

from solace_apache_beam_spark.llm.similarity import (
    QUANT,
    brute_force_topk,
    neardup_pairs,
    neardup_pairs_lsh,
    pq_encode,
    semantic_dedup,
)

SETTINGS = dict(
    max_examples=n_examples(8, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# components from a small exact grid (i/4 is exactly representable):
# ties and duplicate vectors must be COMMON
_component = st.integers(-8, 8).map(lambda i: i / 4.0)


def _round6_half_up(x: float) -> float:
    """Spark F.round(col, 6): BigDecimal(double) HALF_UP — exact mirror
    via Decimal from the exact binary double."""
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _reference_topk(vecs: dict[int, list[float]], k: int):
    ids = sorted(vecs)
    q = {
        i: np.floor(np.abs(np.array(vecs[i])) * QUANT + 0.5)
        * np.sign(np.array(vecs[i]))
        for i in ids
    }
    rows = set()
    for qi in ids:
        scored = []
        for ci in ids:
            if ci == qi:
                continue
            dot = float(q[qi] @ q[ci])
            denom = float(np.sqrt((q[qi] ** 2).sum()) * np.sqrt((q[ci] ** 2).sum()))
            if denom == 0.0:
                continue  # zero-norm: non-finite score, excluded
            cos = dot / denom
            if not np.isfinite(cos):
                continue
            scored.append((-_round6_half_up(cos), ci))
        scored.sort()
        for rank, (neg_cos, ci) in enumerate(scored[:k], start=1):
            rows.add((qi, ci, -neg_cos, rank))
    return rows


@settings(**SETTINGS)
@given(
    vec_lists=st.lists(
        st.lists(_component, min_size=3, max_size=3),
        min_size=2,
        max_size=12,
    ),
    k=st.sampled_from([1, 3]),
)
def test_brute_force_topk_matches_reference(spark, vec_lists, k):
    vecs = dict(enumerate(vec_lists))
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = brute_force_topk(df, df, "embedding", "vec_id", k=k)
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in out.collect()
    }
    assert got == _reference_topk(vecs, k)


def _reference_pairs(vecs: dict[int, list[float]], threshold: float):
    ids = sorted(vecs)
    q = {
        i: np.floor(np.abs(np.array(vecs[i])) * QUANT + 0.5)
        * np.sign(np.array(vecs[i]))
        for i in ids
    }
    rows = set()
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            denom = float(
                np.sqrt((q[a] ** 2).sum()) * np.sqrt((q[b] ** 2).sum())
            )
            if denom == 0.0:
                continue  # zero-norm: non-finite, excluded
            r = _round6_half_up(float(q[a] @ q[b]) / denom)
            if r >= threshold:
                rows.add((a, b, r))
    return rows


@settings(**SETTINGS)
@given(
    vec_lists=st.lists(
        st.lists(_component, min_size=3, max_size=3),
        min_size=2,
        max_size=12,
    ),
    route=st.sampled_from(["exact", "auto", "lsh0"]),
)
def test_neardup_pairs_matches_reference(spark, vec_lists, route):
    """Randomized differential for the near-dup family (round 10): the
    exact route, the auto route (dense small corpus -> provably exact),
    and the degenerate single-bucket LSH route must all emit exactly
    the reference pair set — same quantize/round mirrors as the top-k
    reference, fuzzing the 0.4 threshold boundary, zero vectors, and
    duplicate vectors (cos exactly 1)."""
    vecs = dict(enumerate(vec_lists))
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    if route == "lsh0":
        out = neardup_pairs_lsh(df, threshold=0.4, n_planes=0)
    else:
        out = neardup_pairs(df, threshold=0.4, route=route)
    got = {(r.id_a, r.id_b, r.cos_sim) for r in out.collect()}
    assert got == _reference_pairs(vecs, 0.4)
    out.plan_caches.unpersist()


def _quant_np(v):
    a = np.asarray(v, dtype=np.float64)
    return np.floor(np.abs(a) * QUANT + 0.5) * np.sign(a)


def _round_half_away_scalar(x: float) -> float:
    return float(np.floor(abs(x) + 0.5) * np.sign(x))


def _lloyd_reference(sub: dict[int, np.ndarray], k: int, iters: int, metric: str):
    """Engine-exact Lloyd reference: seeds = ids < k (id-sorted), fixed
    iteration count, integer-exact scoring, argbest ties to the
    smallest centroid id, empty cells keep their centroid, updates are
    per-component integer means rounded half-away-from-zero."""
    ids = sorted(sub)
    cids = [i for i in ids if i < k]
    cmat = [sub[i].copy() for i in cids]

    def best_cell(x):
        scores = []
        for j, c in enumerate(cmat):
            if metric == "l2":
                scores.append((float(((x - c) ** 2).sum()), j))
            else:
                denom = float(np.sqrt((x**2).sum()) * np.sqrt((c**2).sum()))
                cos = float(x @ c) / denom if denom != 0.0 else float("nan")
                scores.append((-cos if np.isfinite(cos) else np.inf, j))
        return min(scores)[1]

    for _ in range(iters):
        groups: dict[int, list[int]] = {}
        for i in ids:
            groups.setdefault(best_cell(sub[i]), []).append(i)
        new = [c.copy() for c in cmat]
        for j, members in groups.items():
            s = np.sum([sub[i] for i in members], axis=0)
            new[j] = np.array(
                [_round_half_away_scalar(x / len(members)) for x in s]
            )
        cmat = new
    return cids, cmat, best_cell


def _reference_pq(vecs: dict[int, list[float]], m: int, k: int, iters: int):
    ids = sorted(vecs)
    q = {i: _quant_np(vecs[i]) for i in ids}
    d = len(q[ids[0]])
    books = []
    for s in range(m):
        lo, hi = d * s // m, d * (s + 1) // m
        books.append(
            _lloyd_reference({i: q[i][lo:hi] for i in ids}, k, iters, "l2")
        )
    codes, recon = {}, {}
    for i in ids:
        cs, rec = [], []
        for s, (cids, cmat, best_cell) in enumerate(books):
            lo, hi = d * s // m, d * (s + 1) // m
            j = best_cell(q[i][lo:hi])
            cs.append(cids[j])
            rec.extend(cmat[j].tolist())
        codes[i] = tuple(cs)
        recon[i] = tuple(rec)
    return codes, recon


@settings(**SETTINGS)
@given(
    vec_lists=st.lists(
        st.lists(_component, min_size=3, max_size=3),
        min_size=2,
        max_size=12,
    ),
    m=st.sampled_from([1, 2]),
)
def test_pq_encode_matches_reference(spark, vec_lists, m):
    """Randomized differential for PQ training + encoding against a
    scalar Python replay of the documented contract (seeded L2 Lloyd,
    round-half-away updates, argmin-first ties, empty cells frozen).
    dim=3 with m=2 exercises the UNEVEN subspace split (1+2 dims) the
    fixed-corpus oracle (64 dims, m=4) never hits; duplicate and zero
    vectors land centroid ties and zero-distance cells."""
    vecs = dict(enumerate(vec_lists))
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = pq_encode(df, m=m, k_codes=2, n_iters=1)
    got_codes = {}
    got_recon = {}
    for r in out.collect():
        got_codes[r.vec_id] = tuple(r.codes)
        got_recon[r.vec_id] = tuple(r.recon)
    codes, recon = _reference_pq(vecs, m, 2, 1)
    assert got_codes == codes
    assert got_recon == recon


def _reference_pq_topk(
    vecs: dict[int, list[float]], m: int, k_codes: int, iters: int, k: int
):
    """Scalar replay of pq_topk's asymmetric-distance search: exact
    (quantized) query vectors scored against PQ reconstructions — the
    flat sibling of :func:`_reference_ivf_pq` (no coarse cells, no
    residual), sharing its exclusion rules: self-pairs out, zero-norm /
    non-finite scores out, rank on (round6 cos desc, neighbor asc)."""
    ids = sorted(vecs)
    q = {i: _quant_np(vecs[i]) for i in ids}
    _, recon = _reference_pq(vecs, m, k_codes, iters)
    rows = set()
    for qi in ids:
        scored = []
        for ci in ids:
            if ci == qi:
                continue
            r = np.array(recon[ci])
            denom = float(np.sqrt((q[qi] ** 2).sum()) * np.sqrt((r**2).sum()))
            if denom == 0.0:
                continue
            cos = float(q[qi] @ r) / denom
            if not np.isfinite(cos):
                continue
            scored.append((-_round6_half_up(cos), ci))
        scored.sort()
        for rank, (neg, ci) in enumerate(scored[:k], start=1):
            rows.add((qi, ci, -neg, rank))
    return rows


@settings(**SETTINGS)
@given(
    vec_lists=st.lists(
        st.lists(_component, min_size=3, max_size=3),
        min_size=2,
        max_size=12,
    ),
    m=st.sampled_from([1, 2]),
)
def test_pq_topk_matches_reference(spark, vec_lists, m):
    """Randomized differential for the FLAT PQ search (pq_topk): took
    over ann_pq_cosine's kernel coverage when that gate row was
    consolidated into ann_ivf_pq_cosine (round 13, VERDICT r12 Next #6)
    — training, encoding, reconstruction, and the ranked asymmetric
    search must all match the scalar replay. Duplicate vectors (score
    ties), zero vectors (zero-norm recon excluded) and the uneven
    dim-3/m-2 split are common under this grid."""
    from solace_apache_beam_spark.llm.similarity import pq_topk

    vecs = dict(enumerate(vec_lists))
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = pq_topk(df, m=m, k_codes=2, n_iters=1, k=3)
    got = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in out.collect()}
    out.plan_caches.unpersist()
    assert got == _reference_pq_topk(vecs, m, 2, 1, 3)


def _reference_semantic_dedup(
    vecs: dict[int, list[float]], n_cells: int, iters: int, tau: float
):
    ids = sorted(vecs)
    q = {i: _quant_np(vecs[i]) for i in ids}
    cids, cmat, best_cell = _lloyd_reference(q, n_cells, iters, "cos")
    cell = {i: cids[best_cell(q[i])] for i in ids}
    out = {}
    for x, b in enumerate(ids):
        dup_of = None
        for a in ids[:x]:
            if cell[a] != cell[b]:
                continue
            denom = float(np.sqrt((q[a] ** 2).sum()) * np.sqrt((q[b] ** 2).sum()))
            if denom == 0.0:
                continue  # zero-norm: non-finite, never a duplicate
            if _round6_half_up(float(q[a] @ q[b]) / denom) >= tau:
                dup_of = a if dup_of is None else min(dup_of, a)
        out[b] = (cell[b], dup_of is not None, dup_of)
    return out


@settings(**SETTINGS)
@given(
    vec_lists=st.lists(
        st.lists(_component, min_size=3, max_size=3),
        min_size=2,
        max_size=12,
    ),
)
def test_semantic_dedup_matches_reference(spark, vec_lists):
    """Randomized differential for SemDeDup against a scalar replay of
    the whole stack: cosine Lloyd training (NaN scores rank last, ties
    to the smallest centroid id), cell assignment, and the greedy
    keep-first prune on the 6-decimal rounded cosine. Zero vectors
    (NaN everywhere), duplicate vectors (cos exactly 1), and
    threshold-boundary ties are all common under this grid."""
    vecs = dict(enumerate(vec_lists))
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(df, n_cells=2, n_iters=1, threshold=0.4)
    got = {r.vec_id: (r.cell, r.is_dup, r.dup_of) for r in out.collect()}
    out.plan_caches.unpersist()
    assert got == _reference_semantic_dedup(vecs, 2, 1, 0.4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def _reference_ivf_pq(
    vecs: dict[int, list[float]],
    n_cells: int,
    n_iters: int,
    m: int,
    k_codes: int,
    n_iters_pq: int,
    k: int,
    nprobe: int,
    by_residual: bool,
):
    """Scalar replay of the full IVF-PQ pipeline: cosine-Lloyd coarse
    cells, (residual-)PQ codebooks, encoding, stable top-nprobe query
    routing, asymmetric scoring of exact queries against
    reconstructions, rank per query on the rounded cosine."""
    ids = sorted(vecs)
    q = {i: _quant_np(vecs[i]) for i in ids}
    d = len(q[ids[0]])
    cids, cmat, best_cell = _lloyd_reference(q, n_cells, n_iters, "cos")

    def cell_order(x):
        scored = []
        for j, c in enumerate(cmat):
            denom = float(np.sqrt((x**2).sum()) * np.sqrt((c**2).sum()))
            cos = float(x @ c) / denom if denom != 0.0 else float("nan")
            scored.append((-cos if np.isfinite(cos) else np.inf, j))
        scored.sort()
        return [cids[j] for _, j in scored]

    cell = {i: cell_order(q[i])[0] for i in ids}
    centroid = {cids[j]: cmat[j] for j in range(len(cids))}
    target = (
        {i: q[i] - centroid[cell[i]] for i in ids} if by_residual else q
    )
    books = []
    for s in range(m):
        lo, hi = d * s // m, d * (s + 1) // m
        books.append(
            _lloyd_reference(
                {i: target[i][lo:hi] for i in ids}, k_codes, n_iters_pq, "l2"
            )
        )
    recon = {}
    for i in ids:
        rec = []
        for s, (bcids, bcmat, bbest) in enumerate(books):
            lo, hi = d * s // m, d * (s + 1) // m
            rec.extend(bcmat[bbest(target[i][lo:hi])].tolist())
        base = centroid[cell[i]] if by_residual else np.zeros(d)
        recon[i] = base + np.array(rec)
    rows = set()
    for qi in ids:
        probed = set(cell_order(q[qi])[:nprobe])
        scored = []
        for ci in ids:
            if ci == qi or cell[ci] not in probed:
                continue
            denom = float(
                np.sqrt((q[qi] ** 2).sum()) * np.sqrt((recon[ci] ** 2).sum())
            )
            if denom == 0.0:
                continue
            cos = float(q[qi] @ recon[ci]) / denom
            if not np.isfinite(cos):
                continue
            scored.append((-_round6_half_up(cos), ci))
        scored.sort()
        for rank, (neg, ci) in enumerate(scored[:k], start=1):
            rows.add((qi, ci, -neg, rank))
    return rows


@settings(**SETTINGS)
@given(
    vec_lists=st.lists(
        st.lists(_component, min_size=3, max_size=3),
        min_size=2,
        max_size=10,
    ),
    nprobe=st.sampled_from([1, 2]),
    by_residual=st.booleans(),
)
def test_ivf_pq_topk_matches_reference(spark, vec_lists, nprobe, by_residual):
    """End-to-end randomized differential for IVF-PQ: coarse training,
    (residual) PQ, stable multi-probe routing and the ranked ADC search
    must all match the scalar replay — duplicate vectors (centroid and
    score ties), zero vectors (NaN routing ranks last, zero-norm recon
    excluded from scoring) and the uneven dim-3/m-2 split are common."""
    from solace_apache_beam_spark.llm.similarity import ivf_pq_topk

    vecs = dict(enumerate(vec_lists))
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = ivf_pq_topk(
        df,
        n_cells=2,
        n_iters=1,
        m=2,
        k_codes=2,
        n_iters_pq=1,
        k=3,
        nprobe=nprobe,
        by_residual=by_residual,
    )
    got = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in out.collect()}
    out.plan_caches.unpersist()
    assert got == _reference_ivf_pq(
        vecs, 2, 1, 2, 2, 1, 3, nprobe, by_residual
    )


def _reference_sq8(vecs: dict[int, list[float]]):
    ids = sorted(vecs)
    q = {i: _quant_np(vecs[i]) for i in ids}
    d = len(q[ids[0]])
    mn = np.array([min(q[i][j] for i in ids) for j in range(d)])
    mx = np.array([max(q[i][j] for i in ids) for j in range(d)])
    out = {}
    for i in ids:
        codes, recon = [], []
        for j in range(d):
            if mx[j] > mn[j]:
                # the scaled value is >= 0, so half-away == half-up
                c = float(
                    np.floor((q[i][j] - mn[j]) * 255.0 / (mx[j] - mn[j]) + 0.5)
                )
            else:
                c = 0.0
            r = mn[j] + _round_half_away_scalar(c * (mx[j] - mn[j]) / 255.0)
            codes.append(int(c))
            recon.append(float(r))
        out[i] = (tuple(codes), tuple(recon))
    return out


@settings(**SETTINGS)
@given(
    vec_lists=st.lists(
        st.lists(_component, min_size=3, max_size=3),
        min_size=1,
        max_size=10,
    ),
)
def test_sq8_encode_matches_reference(spark, vec_lists):
    """Randomized differential for the SQ8 codec: per-dim corpus
    [min, max] stats, affine 0..255 coding, integer-grid
    reconstruction. Constant dims (mx == mn -> code 0, recon = the
    constant), negative ranges, and rounding-boundary values are all
    common under the grid strategy."""
    from solace_apache_beam_spark.llm.similarity import sq8_encode

    vecs = dict(enumerate(vec_lists))
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        r.vec_id: (tuple(r.codes), tuple(r.recon))
        for r in sq8_encode(df).collect()
    }
    assert got == _reference_sq8(vecs)


def _reference_incremental_semantic(
    index_vecs: dict[int, list[float]],
    batch_vecs: dict[int, list[float]],
    threshold: float,
    n_planes: int,
    n_tables: int,
):
    """Scalar replay of incremental_semantic_dedup: md5-seeded
    hyperplane buckets per table, candidate = shares a bucket in ANY
    table AND (indexed, any id, OR batch-mate with smaller id),
    qualify on the rounded exact cosine; match = smallest qualifying
    id; NULL vectors are unique and never candidates."""
    import hashlib

    def quant(v):
        return _quant_np(v)

    def buckets(qv):
        out = []
        for t in range(n_tables):
            b = 0
            for p in range(n_planes):
                proj = 0.0
                for d in range(len(qv)):
                    h = int(
                        hashlib.md5(
                            f"{t * n_planes + p}:{d}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    proj += qv[d] * ((h & 1) * 2 - 1)
                if proj >= 0:
                    b |= 1 << p
            out.append(b + (t << n_planes))
        return set(out)

    cand = {}
    for i, v in index_vecs.items():
        if v is not None:
            cand[i] = (quant(v), buckets(quant(v)), True)
    for i, v in batch_vecs.items():
        if v is not None:
            cand[i] = (quant(v), buckets(quant(v)), False)
    out = {}
    for b, bv in batch_vecs.items():
        if bv is None:
            out[b] = ("unique", None)
            continue
        qb, bb, _ = cand[b]
        match = None
        for a, (qa, ba, is_idx) in cand.items():
            if a == b or not (is_idx or a < b):
                continue
            if not (ba & bb):
                continue
            denom = float(np.sqrt((qa**2).sum()) * np.sqrt((qb**2).sum()))
            if denom == 0.0:
                continue
            if _round6_half_up(float(qa @ qb) / denom) >= threshold:
                match = a if match is None else min(match, a)
        out[b] = (
            ("semantic_dup", match) if match is not None else ("unique", None)
        )
    return out


@settings(**SETTINGS)
@given(
    index_lists=st.lists(
        st.lists(_component, min_size=3, max_size=3), min_size=0, max_size=6
    ),
    batch_lists=st.lists(
        st.one_of(
            st.none(),
            st.lists(_component, min_size=3, max_size=3),
        ),
        min_size=1,
        max_size=6,
    ),
)
def test_incremental_semantic_dedup_matches_reference(
    spark, index_lists, batch_lists
):
    """Randomized differential for the semantic ingestion screen's
    batch operator: indexed candidates qualify at ANY id while
    batch-mates need a smaller id; multi-table bucket collisions
    collapse; zero vectors never qualify; NULL batch vectors come back
    unique. Index ids deliberately OVERLAP upward of batch ids so the
    is_index rule (not id order) is what the test pins."""
    from solace_apache_beam_spark.llm.similarity import (
        build_vector_index,
        incremental_semantic_dedup,
    )

    # index ids 100.. (ABOVE batch ids 0..): an indexed vector must
    # still match any batch vector
    index_vecs = {100 + i: v for i, v in enumerate(index_lists)}
    batch_vecs = dict(enumerate(batch_lists))
    idx_df = spark.createDataFrame(
        [(i, v) for i, v in index_vecs.items()] or [],
        "vec_id long, embedding array<double>",
    )
    idx = build_vector_index(idx_df, n_planes=3, n_tables=2)
    bdf = spark.createDataFrame(
        [(i, v) for i, v in batch_vecs.items()],
        "vec_id long, embedding array<double>",
    )
    out = incremental_semantic_dedup(
        bdf, idx, threshold=0.4, n_planes=3, n_tables=2
    )
    got = {r.vec_id: (r.status, r.match_id) for r in out.collect()}
    out.plan_caches.unpersist()
    assert got == _reference_incremental_semantic(
        index_vecs, batch_vecs, 0.4, 3, 2
    )


@settings(**SETTINGS)
@given(
    vec_lists=st.lists(
        st.lists(_component, min_size=4, max_size=4),
        min_size=2,
        max_size=12,
    ),
    n_cells=st.sampled_from([1, 2, 3]),
)
def test_cell_update_sums_matches_explode(spark, vec_lists, n_cells):
    """The round-14 fused Lloyd-update kernel (_cell_update_sums:
    whole-partition per-(cell, pos) partial sums inside the assignment
    Arrow kernel) must reproduce the former formulation exactly —
    _assign_cells + posexplode + JVM sum/count per (cell, pos). Both
    are exact-integer sums, so equality is bitwise, not approximate.
    Random inputs include duplicate vectors and zero vectors (NaN
    cosine rows: the -inf argmax mask sends them to the first cell)."""
    import pyspark.sql.functions as F

    from solace_apache_beam_spark.llm.similarity import (
        _assign_cells,
        _cell_update_sums,
        _quantized_vectors,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vec_lists)],
        "vec_id long, embedding array<double>",
    )
    qdf = _quantized_vectors(df, "embedding", "vec_id")
    seed = sorted(
        (int(r["vec_id"]), np.asarray(r["qv"], dtype=np.float64))
        for r in qdf.filter(F.col("vec_id") < n_cells).collect()
    )
    cids = np.array([c for c, _ in seed], dtype=np.int64)
    cmat = np.stack([v for _, v in seed])

    fused = {
        (r["cell"], r["pos"]): (r["s"], r["cnt"])
        for r in _cell_update_sums(qdf, cids, cmat)
        .groupBy("cell", "pos")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
        .collect()
    }
    exploded = {
        (r["cell"], r["pos"]): (r["s"], r["cnt"])
        for r in _assign_cells(qdf, "vec_id", cids, cmat)
        .select("cell", F.posexplode("qv").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert fused == exploded
