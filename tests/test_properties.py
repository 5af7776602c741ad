"""Property-based tests (hypothesis): the composed Spark operators are
compared against direct Python reference implementations on randomized
small inputs — the class of coverage the reference's suite lacks
(SURVEY.md §5: no property-based testing)."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._fuzz import n_examples
from pyspark.sql import functions as F

from solace_apache_beam_spark.functions.hashing import MERSENNE_61, minhash_coeffs

SETTINGS = dict(
    max_examples=n_examples(8, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EPOCH = dt.datetime(2024, 1, 1)


def _ts(n: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=int(n))


@settings(**SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
    ),
    right=st.dictionaries(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        st.integers(0, 99),
        max_size=12,
    ),
)
def test_asof_join_matches_reference(spark, left, right):
    from solace_apache_beam_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(
        [(i, f"k{k}", _ts(t)) for i, (k, t) in enumerate(left)],
        "event_id long, user_id string, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(f"k{k}", _ts(t), float(v)) for (k, t), v in right.items()],
        "user_id string, ts timestamp, rv double",
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(ldf, rdf, right_cols={"rv": "asof_value"}).collect()
    }
    for i, (k, t) in enumerate(left):
        matches = [(rt, v) for (rk, rt), v in right.items() if rk == k and rt <= t]
        expect = float(max(matches)[1]) if matches else None
        assert got[i] == expect, (i, k, t)


@settings(**SETTINGS)
@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 400), st.integers(1, 300)), min_size=1, max_size=8
    ),
    points=st.lists(st.integers(0, 800), min_size=1, max_size=15),
    bucket=st.sampled_from([7, 60, 300]),
)
def test_interval_point_join_matches_brute_force(spark, intervals, points, bucket):
    from solace_apache_beam_spark.operators.temporal import interval_point_join

    idf = spark.createDataFrame(
        [(i, _ts(s), _ts(s + d)) for i, (s, d) in enumerate(intervals)],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    pdf = spark.createDataFrame(
        [(j, _ts(p)) for j, p in enumerate(points)], "pid long, ts timestamp"
    )
    got = sorted(
        (r.iid, r.pid)
        for r in interval_point_join(idf, pdf, bucket_seconds=bucket).collect()
    )
    expect = sorted(
        (i, j)
        for i, (s, d) in enumerate(intervals)
        for j, p in enumerate(points)
        if s <= p < s + d
    )
    assert got == expect


def _h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _h64_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=4)


@settings(**SETTINGS)
@given(docs=st.lists(st.lists(WORD, min_size=3, max_size=20), min_size=1, max_size=5))
def test_minhash_bands_match_reference(spark, docs):
    from solace_apache_beam_spark.llm.dedup import minhash_band_hashes

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.band): r.band_hash
        for r in minhash_band_hashes(df, n_perm=16, n_bands=4).collect()
    }
    coeffs = minhash_coeffs(16)
    for i, ws in enumerate(docs):
        hs = sorted({_h32_py(" ".join(ws[j : j + 3])) for j in range(len(ws) - 2)})
        sig = [min((a * h + b) % MERSENNE_61 for h in hs) for a, b in coeffs]
        for band in range(4):
            chunk = ",".join(str(x) for x in sig[band * 4 : (band + 1) * 4])
            assert got[(i, band)] == _h64_py(chunk), (i, band)


@settings(**SETTINGS)
@given(docs=st.lists(st.lists(WORD, min_size=1, max_size=30), min_size=1, max_size=5))
def test_simhash_matches_reference(spark, docs):
    from solace_apache_beam_spark.llm.dedup import simhash_signatures

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    # 60-bit default (round 6): token hash is the 60-bit md5 prefix
    for i, ws in enumerate(docs):
        hs = [_h64_py(w) for w in ws]
        sim = 0
        for b in range(60):
            s = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if s > 0:
                sim |= 1 << b
        assert got[i] == sim, i


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(0, 500)),
        min_size=1,
        max_size=40,
    )
)
def test_kmv_exact_when_below_k(spark, rows):
    from solace_apache_beam_spark.functions.sketch import kmv_distinct

    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r.est_distinct for r in kmv_distinct(df, "v", "g", k=128).collect()}
    for g in {g for g, _ in rows}:
        exact = len({v for gg, v in rows if gg == g})
        assert got[g] == pytest.approx(exact)


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 4),   # user
            st.integers(0, 2),   # stage index into (view, click, purchase)
            st.integers(0, 20),  # ts seconds
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_matches_brute_force(spark, events):
    from solace_apache_beam_spark.operators.temporal import funnel_counts

    stages = ("view", "click", "purchase")
    rows = [
        (i, _ts(t), u, stages[s], 0.0) for i, (u, s, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        r.stage: r.n_users for r in funnel_counts(df, stages=stages).collect()
    }

    # brute force: greedy earliest qualifying (ts, id) per stage
    by_user: dict[int, list] = {}
    for i, (u, s, t) in enumerate(events):
        by_user.setdefault(u, []).append((t, i, s))
    expect = {s: 0 for s in stages}
    for evs in by_user.values():
        evs.sort()
        frontier = (-1, -1)
        for k, stage in enumerate(stages):
            nxt = min(
                ((t, i) for (t, i, s) in evs if s == k and (t, i) > frontier),
                default=None,
            )
            if nxt is None:
                break
            frontier = nxt
            expect[stage] += 1
    assert got == expect


@settings(**SETTINGS)
@given(
    values=st.lists(
        st.tuples(st.integers(0, 2), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=40,
    )
)
def test_exact_percentiles_match_numpy_linear(spark, values):
    import numpy as np

    from solace_apache_beam_spark.operators.relational import exact_percentiles

    df = spark.createDataFrame(
        [(i, f"g{g}", float(v)) for i, (g, v) in enumerate(values)],
        "event_id long, grp string, value double",
    )
    out = {
        r.grp: (r.n, r.p50, r.p95)
        for r in exact_percentiles(df, "value", "grp", "event_id").collect()
    }
    groups: dict[str, list[float]] = {}
    for _, (g, v) in enumerate(values):
        groups.setdefault(f"g{g}", []).append(float(v))
    for g, vs in groups.items():
        n, p50, p95 = out[g]
        assert n == len(vs)
        # numpy 'linear' interpolation is the same pos = 1+(n-1)q rule
        assert p50 == pytest.approx(np.percentile(vs, 50), abs=1e-9)
        assert p95 == pytest.approx(np.percentile(vs, 95), abs=1e-9)


@settings(**SETTINGS)
@given(payloads=st.lists(st.binary(min_size=0, max_size=50), max_size=8))
def test_resize_payload_matches_reference(spark, payloads):
    from solace_apache_beam_spark.llm.multimodal import resize_payload

    target = 4
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    got = {
        (r.doc_id, r.cell): r.value
        for r in resize_payload(df, target=target).collect()
    }
    expect = {}
    for i, p in enumerate(payloads):
        if not p:
            continue
        cells: dict[int, list[int]] = {}
        for j, byte in enumerate(p):
            cells.setdefault(j * target // len(p), []).append(byte)
        for c, bs in cells.items():
            expect[(i, c)] = sum(bs) / len(bs)
    assert got == expect


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_match_union_find(spark, edges):
    from solace_apache_beam_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.cluster_rep for r in connected_components(pairs).collect()
    }

    # reference union-find
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}
    assert got == expect


@settings(**SETTINGS)
@given(
    corpus=st.lists(st.integers(0, 4), min_size=1, max_size=8),
    batch=st.lists(st.integers(0, 4), min_size=1, max_size=6),
)
def test_incremental_dedup_exact_statuses_match_reference(spark, corpus, batch):
    """Exact-dup detection (the deterministic branch — near-dup
    candidacy is probabilistic and covered by its oracle): batch docs
    byte-identical to a corpus doc get exact_dup + the smallest
    matching corpus id."""
    from solace_apache_beam_spark.llm.dedup import incremental_dedup

    texts = [
        "alpha beta gamma delta", "epsilon zeta eta theta",
        "iota kappa lambda mu", "nu xi omicron pi", "rho sigma tau upsilon",
    ]
    corpus_rows = [(i, texts[t]) for i, t in enumerate(corpus)]
    batch_rows = [(100 + i, texts[t]) for i, t in enumerate(batch)]
    out = {
        r.doc_id: r
        for r in incremental_dedup(
            spark.createDataFrame(batch_rows, "doc_id long, text string"),
            spark.createDataFrame(corpus_rows, "doc_id long, text string"),
        ).collect()
    }
    assert set(out) == {100 + i for i in range(len(batch))}
    corpus_by_text: dict[str, int] = {}
    for i, t in enumerate(corpus):
        corpus_by_text.setdefault(texts[t], i)
    for i, t in enumerate(batch):
        row = out[100 + i]
        if texts[t] in corpus_by_text:
            assert row.status == "exact_dup"
            assert row.match_id == corpus_by_text[texts[t]]
        else:
            # the five texts share no trigram shingles, so a
            # non-identical batch doc can only be unique
            assert row.status == "unique" and row.match_id is None


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(WORD, min_size=3, max_size=12), min_size=2, max_size=8
    ),
    # 0.55 exercises the IEEE-ceil-overshoot direction (0.55 * n can
    # round UP past the exact product, shortening the prefix — the
    # ADVICE-r5 boundary bug the epsilon guard in _ngram_prefix_instances
    # fixes); 0.3/0.5/0.75/1.0 never hit that rounding direction.
    threshold=st.sampled_from([0.3, 0.5, 0.55, 0.75, 1.0]),
)
def test_ngram_jaccard_prefix_filter_matches_brute_force(spark, docs, threshold):
    """The prefix-filtered similarity join must return EXACTLY the pairs
    with full-set Jaccard >= t — the AllPairs prefix lemma implemented
    with ceil boundaries, tiny docs, duplicate docs, and t=1.0 edge
    cases all exercised here against an O(n^2) reference."""
    from solace_apache_beam_spark.llm.dedup import (
        _doc_shingles,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=threshold).collect()
    }
    # brute force over the same shingle-hash sets the operator uses
    sets = {
        r["doc_id"]: set(r["hs"])
        for r in _doc_shingles(df, "text", "doc_id", 3).collect()
    }
    expect = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                expect[(a, b)] = inter / union
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-12


def test_simhash_32bit_param_matches_reference(spark):
    """The narrow (bits<=32) token-hash path must stay correct after
    the 60-bit default switch — it is still a supported parameter (and
    the pre-round-6 signature definition)."""
    from solace_apache_beam_spark.llm.dedup import simhash_signatures

    docs = [["alpha", "beta", "gamma"], ["beta", "beta", "delta", "x"]]
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {r.doc_id: r.simhash for r in simhash_signatures(df, bits=32).collect()}
    for i, ws in enumerate(docs):
        hs = [_h32_py(w) for w in ws]
        sim = 0
        for b in range(32):
            if sum(1 if (h >> b) & 1 else -1 for h in hs) > 0:
                sim |= 1 << b
        assert got[i] == sim, i


@settings(**SETTINGS)
@given(docs=st.lists(st.lists(WORD, min_size=1, max_size=10), min_size=2, max_size=6))
def test_simhash_hamming_pairs_match_brute_force(spark, docs):
    """The banded candidate path must return EXACTLY the pairs within
    hamming <= 3 (pigeonhole over 4 bands is a completeness guarantee,
    not probabilistic) — checked against an O(n^2) popcount reference
    at the 60-bit defaults. Small repetitive word lists produce many
    identical/near-identical signatures, exercising equality, near-miss
    and over-distance pairs."""
    from solace_apache_beam_spark.llm.dedup import simhash_hamming_pairs

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs(df).collect()
    }
    sigs = {}
    for i, ws in enumerate(docs):
        hs = [_h64_py(w) for w in ws]
        sim = 0
        for b in range(60):
            if sum(1 if (h >> b) & 1 else -1 for h in hs) > 0:
                sim |= 1 << b
        sigs[i] = sim
    expect = {}
    ids = sorted(sigs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            h = bin(sigs[ids[x]] ^ sigs[ids[y]]).count("1")
            if h <= 3:
                expect[(ids[x], ids[y])] = h
    assert got == expect


def test_ngram_jaccard_exact_threshold_boundary(spark):
    """ADVICE-r5 repro, pinned deterministically: |A|=100 shingles,
    B ⊂ A with |B|=55, J = 55/100 = 0.55 exactly at threshold 0.55.
    0.55*100 floats to 55.000000000000007, so an unguarded ceil gives
    56 — a one-short prefix that drops this boundary pair while the
    final jaccard >= threshold filter accepts it. The epsilon guard
    must keep the pair."""
    from solace_apache_beam_spark.llm.dedup import ngram_jaccard_pairs

    words_a = [f"w{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(102)]
    df = spark.createDataFrame(
        [(0, " ".join(words_a)), (1, " ".join(words_a[:57]))],
        "doc_id long, text string",
    )
    got = ngram_jaccard_pairs(df, threshold=0.55).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(0, 1)]
    assert abs(got[0].jaccard - 0.55) < 1e-12


def test_minhash_size_filter_keeps_exact_boundary_pair(spark):
    """The round-14 Bayardo size filter in minhash_lsh_pairs prunes
    candidates with min_sz < t*max_sz BEFORE verification; this pins
    its epsilon guard at a boundary where IEEE genuinely overshoots
    (ADVICE r14: the former t=0.5, 4/8 instance had t*max = 4.0 exactly
    representable, so it passed even without the guard). Here A = 57
    words (55 trigram shingles), B = A + 45 more (100 shingles, A ⊂ B):
    J = 55/100 = 0.55 = min_sz/max_sz exactly at threshold 0.55, and
    0.55*100 floats to 55.00000000000001 — an unguarded
    min_sz >= t*max_sz comparison drops the pair the final
    jaccard >= threshold filter accepts. Words are letter-only (the
    tokenizer splits on [^\\p{{L}}]+, so digits would collapse every
    word to 'w'); the word-index offset (61) is chosen so the pair
    deterministically shares all 4 default-geometry bands (verified
    against the kernel's own hashes), so LSH surfaces the candidate
    and the size filter is the only gate under test."""
    from solace_apache_beam_spark.llm.dedup import minhash_lsh_pairs

    words = [  # 102 distinct letter-only words, offset 61
        "w" + chr(97 + i // 676) + chr(97 + (i // 26) % 26) + chr(97 + i % 26)
        for i in range(61, 163)
    ]
    df = spark.createDataFrame(
        [(0, " ".join(words[:57])), (1, " ".join(words))],
        "doc_id long, text string",
    )
    got = minhash_lsh_pairs(df, threshold=0.55).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(0, 1)]
    assert abs(got[0].jaccard - 0.55) < 1e-12


@settings(**SETTINGS)
@given(
    sz=st.integers(1, 10**12),
    thr=st.floats(0.05, 0.99, allow_nan=False, allow_infinity=False),
)
def test_ngram_prefix_guard_exact_at_any_size(sz, thr):
    """The relative epsilon guard (ADVICE r6) replayed in the same
    float arithmetic Spark executes, checked against EXACT rational
    arithmetic: the guarded ceil of t*|d| must never exceed the true
    required overlap ceil(t*|d|) (completeness: a higher value
    shortens the prefix and can drop threshold-boundary pairs), and
    must lose at most 1 (cost: at most one extra indexed shingle).
    The relative form keeps the safety margin proportional to the
    product, so both bounds hold at any document size (an absolute
    1e-9 margin becomes vanishingly small relative to ulp once the
    product passes ~1e7 — round-to-nearest cannot cross a representable
    integer from below, but the proportional margin makes the bound
    robust without relying on that representability argument)."""
    import math
    from fractions import Fraction

    true_m = math.ceil(Fraction(thr) * sz)  # exact value of the float thr
    guarded = math.ceil(sz * thr * (1.0 - 1e-12))
    assert guarded <= true_m, (sz, thr)
    assert guarded >= true_m - 1, (sz, thr)
