"""Property-based tests for the deterministic sampling / splitting /
shuffle family and the KMV estimator's above-k path — compared against
direct Python reference implementations on randomized inputs (the same
differential method as tests/test_properties.py; these families
previously had only oracle-gate coverage, which exercises one fixed
dataset).

The load-bearing property for every operator here is DETERMINISM AS A
PURE FUNCTION OF THE KEY: membership/order must be reproducible across
engines, runs, and partitionings (functions/sampling.py's contract).
Each test therefore (a) recomputes the expected result from the md5
hash definition in plain Python and (b) where cheap, re-runs the
operator under a different partitioning and asserts bit-identical
output.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._fuzz import n_examples

SETTINGS = dict(
    max_examples=n_examples(8, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

HASH_SPACE = 1 << 60


def _h64_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bucket_py(salt: str, key: int, buckets: int = 10_000) -> int:
    return _h64_py(f"{salt}:{key}") % buckets


# ---------------------------------------------------------------- KMV


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.one_of(st.none(), st.integers(0, 60))),
        min_size=1,
        max_size=80,
    ),
    k=st.sampled_from([4, 8]),
)
def test_kmv_estimate_matches_bottom_k_reference(spark, rows, k):
    """Above k distinct values the pipeline must reproduce the
    bottom-k estimate (k-1) * 2^60 / kth_min computed directly from the
    full distinct hash set — i.e. the Arrow prefilter, the distinct,
    and the rank must be jointly lossless for the kth minimum. Below k
    it must fall back to the exact distinct count. NULLs don't count
    (COUNT DISTINCT semantics). test_properties already pins the
    below-k exactness; this adds the estimator path."""
    from solace_apache_beam_spark.functions.sketch import kmv_distinct

    df = spark.createDataFrame(rows, "g long, v long")
    got = {
        r.g: r.est_distinct
        for r in kmv_distinct(df, "v", "g", k=k).collect()
    }
    expect: dict[int, float] = {}
    for g in {g for g, _ in rows}:
        hashes = sorted(
            {_h64_py(str(v)) for gg, v in rows if gg == g and v is not None}
        )
        if not hashes:
            continue  # all-NULL group: no non-null hash rows survive
        if len(hashes) < k:
            expect[g] = float(len(hashes))
        else:
            expect[g] = (k - 1) * float(HASH_SPACE) / hashes[k - 1]
    assert set(got) == set(expect)
    for g, e in expect.items():
        assert got[g] == e, (g, got[g], e)


# ------------------------------------------------- deterministic splits


@settings(**SETTINGS)
@given(ids=st.sets(st.integers(0, 10_000), min_size=1, max_size=60))
def test_hash_sample_and_splits_match_hash_reference(spark, ids):
    """hash_sample membership and assign_splits labels recomputed from
    the md5 definition in plain Python; splits are exhaustive and the
    sample is exactly the under-threshold bucket set (stable under a
    different partitioning by construction — pure key function)."""
    from solace_apache_beam_spark.functions.sampling import (
        assign_splits,
        hash_sample,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got_sample = {
        r.doc_id for r in hash_sample(df, "doc_id", 2_500).collect()
    }
    assert got_sample == {
        i for i in ids if _bucket_py("sample", i) < 2_500
    }

    got_splits = {
        r.doc_id: r.split for r in assign_splits(df, "doc_id").collect()
    }
    assert set(got_splits) == ids  # exhaustive: every row labeled
    for i in ids:
        b = _bucket_py("split", i)
        expect = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert got_splits[i] == expect, (i, b)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    )
)
def test_stratified_sample_matches_reference(spark, rows):
    """Per-stratum thresholds, unlisted and NULL strata falling to
    default_bp — NULL must not silently inherit a listed stratum's
    rate (the when-chain's NULL comparison falls through to
    otherwise)."""
    from solace_apache_beam_spark.functions.sampling import stratified_sample

    rates = {"a": 10_000, "b": 2_500}
    default_bp = 500
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r.doc_id
        for r in stratified_sample(
            df, "doc_id", "source", rates, default_bp=default_bp
        ).collect()
    }
    expect = {
        i
        for i, s in rows
        if _bucket_py("strat", i) < rates.get(s, default_bp)
    }
    assert got == expect


# --------------------------------------------------- training shuffle


@settings(**SETTINGS)
@given(ids=st.sets(st.integers(0, 100_000), min_size=1, max_size=60))
def test_training_shuffle_is_reference_permutation_and_partition_stable(
    spark, ids
):
    """(shard, pos) addresses recomputed from the hash definition:
    shard = h64('shuffle:'||id) % n, pos = 1-based rank of (h, id)
    within the shard. Also the partitioning-invariance contract the
    module header promises: a repartitioned input yields bit-identical
    addresses (df.orderBy(rand()) satisfies neither)."""
    from solace_apache_beam_spark.functions.sampling import training_shuffle

    n_shards = 4
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = sorted(
        (r.shard, r.pos, r.doc_id)
        for r in training_shuffle(df, "doc_id", n_shards=n_shards).collect()
    )

    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i in ids:
        h = _h64_py(f"shuffle:{i}")
        by_shard.setdefault(h % n_shards, []).append((h, i))
    expect = sorted(
        (shard, pos, i)
        for shard, members in by_shard.items()
        for pos, (_, i) in enumerate(sorted(members), start=1)
    )
    assert got == expect

    again = sorted(
        (r.shard, r.pos, r.doc_id)
        for r in training_shuffle(
            df.repartition(7), "doc_id", n_shards=n_shards
        ).collect()
    )
    assert again == got


# -------------------------------------------------- top-k per group


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9), st.integers(0, 999)),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[2],
    ),
    k=st.sampled_from([1, 3]),
    descending=st.booleans(),
)
def test_top_k_per_group_matches_sorted_reference(spark, rows, k, descending):
    """row_number top-k with explicit tiebreak vs a plain Python sort —
    ranks must be dense 1..min(k, group size) and the picked rows (with
    equal order values broken by the tiebreak column ascending) must
    match exactly in both sort directions."""
    from solace_apache_beam_spark.operators.relational import top_k_per_group

    df = spark.createDataFrame(rows, "g long, val long, id long")
    got = sorted(
        (r.g, r.rank, r.id)
        for r in top_k_per_group(
            df, ["g"], "val", k, descending=descending, tiebreak_cols=["id"]
        ).collect()
    )
    expect = []
    for g in {g for g, _, _ in rows}:
        members = [(v, i) for gg, v, i in rows if gg == g]
        members.sort(key=lambda t: ((-t[0] if descending else t[0]), t[1]))
        expect.extend((g, pos, i) for pos, (_, i) in enumerate(members[:k], 1))
    assert got == sorted(expect)


def test_null_key_has_no_hash_identity(spark):
    """A NULL sampling key must behave like the oracles' NULL-
    propagating `'salt:' || key`: hash_sample and stratified_sample
    EXCLUDE the row at EVERY rate (pre-fix, all null-key rows shared
    the bare-salt bucket — h64("strat") % 10000 = 7699 — so any rate
    above it included them only on the Spark side), assign_splits
    sends it to the 'test' remainder, and training_shuffle EXCLUDES it
    (ADVICE r8: multiple NULL-id rows would all share a NULL shard and
    NULL h, so row_number over (h, id) among them is nondeterministic —
    a row with no key identity has no place in a reproducible
    permutation)."""
    from solace_apache_beam_spark.functions.sampling import (
        assign_splits,
        hash_sample,
        stratified_sample,
        training_shuffle,
    )

    df = spark.createDataFrame(
        [(None, "a"), (1, "a"), (2, "b")], "id long, s string"
    )
    # rate 9999: virtually everything non-null passes; a null key never
    assert all(
        r.id is not None for r in hash_sample(df, "id", 9999).collect()
    )
    assert all(
        r.id is not None
        for r in stratified_sample(
            df, "id", "s", {"a": 9999, "b": 9999}
        ).collect()
    )
    splits = {r.id: r.split for r in assign_splits(df, "id").collect()}
    assert splits[None] == "test"
    shuf = {r.id: r.shard for r in training_shuffle(df, "id").collect()}
    assert None not in shuf and shuf[1] is not None and shuf[2] is not None
