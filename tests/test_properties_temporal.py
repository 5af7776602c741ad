"""Property-based differential tests for the temporal operator family
(asof join, interval range join, funnel, exact percentiles) — the same
randomized-input method as tests/test_properties_sampling.py, aimed at
the null/tie edge cases the fixed oracle datasets only sample.

The references are deliberately independent implementations:

- asof_join is compared against DuckDB's NATIVE ``ASOF LEFT JOIN`` —
  engine-vs-engine, not a hand-written SQL restatement of our own
  plan — on inputs dense in NULL keys/timestamps/values and in
  same-timestamp ties (the exact axes the round-7 null-semantics
  change touched).
- interval_point_join is checked against the brute-force nested loop
  across several bucket widths (the bucketization must be lossless at
  boundaries: start == point, point == end, zero-length intervals,
  spans ≫ bucket width).
- funnel_counts is replayed by a direct greedy frontier simulation of
  its documented (ts, id)-with-nulls rule.
- exact_percentiles is recomputed from the rank/interpolation formula
  in plain Python over the same IEEE doubles.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._fuzz import n_examples

from solace_apache_beam_spark.operators.relational import exact_percentiles
from solace_apache_beam_spark.operators.temporal import (
    asof_join,
    funnel_counts,
    interval_point_join,
)

SETTINGS = dict(
    max_examples=n_examples(8, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small domains on purpose: collisions (same key, same timestamp) and
# NULLs must be COMMON, not rare, for the edge cases to be exercised
_key = st.one_of(st.none(), st.integers(0, 2))
_ts = st.one_of(st.none(), st.integers(0, 12))


def _rows_sorted(rows):
    return sorted(tuple(str(x) for x in r) for r in rows)


# ------------------------------------------------------------- asof


@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=25),
    right=st.lists(
        st.tuples(_key, _ts, st.one_of(st.none(), st.integers(0, 99))),
        min_size=0,
        max_size=25,
        # the operator's contract: right rows unique per (by, on)
        unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_join_matches_duckdb_native_asof(spark, left, right):
    """On the non-NULL domain, our union-tag asof_join must return
    exactly what DuckDB's native ASOF LEFT JOIN returns: inclusive
    match (l.ts >= r.ts), matched NULL values staying NULL (no
    back-fill from an older right row), same-timestamp ties matched.

    NULL order/partition keys are pinned SEPARATELY against our
    documented comparison-semantics contract (they match nothing),
    because DuckDB 1.0's native ASOF is measurably inconsistent with
    its own comparison semantics there: it matches a NULL-ts right row
    to a NULL-ts left row, and a NULL-ts LEFT row to the LATEST
    non-null right row (sort-order-based matching where `NULL >= t`
    would be NULL in any predicate). Our operator follows the
    predicate semantics — the behavior a SQL `l.ts >= r.ts` rewrite
    produces — so DuckDB is the reference only where the two agree."""
    ldf = spark.createDataFrame(left, "user_id long, ts long")
    rdf = spark.createDataFrame(right, "user_id long, ts long, value long")
    got = _rows_sorted(
        asof_join(
            ldf, rdf, on="ts", by="user_id", right_cols={"value": "asof_value"}
        ).collect()
    )

    l_nn = [r for r in left if r[0] is not None and r[1] is not None]
    r_nn = [r for r in right if r[0] is not None and r[1] is not None]
    con = duckdb.connect()
    con.execute("CREATE TABLE l(user_id BIGINT, ts BIGINT)")
    if l_nn:
        con.executemany("INSERT INTO l VALUES (?, ?)", l_nn)
    con.execute("CREATE TABLE r(user_id BIGINT, ts BIGINT, value BIGINT)")
    if r_nn:
        con.executemany("INSERT INTO r VALUES (?, ?, ?)", r_nn)
    matched = con.execute(
        """
        SELECT l.user_id, l.ts, r.value AS asof_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        """
    ).fetchall()
    # documented contract: a left row with a NULL key or NULL ts is
    # kept (left join) and matches nothing
    null_left = [
        (u, t, None) for u, t in left if u is None or t is None
    ]
    want = _rows_sorted(matched + null_left)
    assert got == want


# ----------------------------------------------------- interval join


@settings(**SETTINGS)
@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 999), st.integers(0, 40), st.integers(0, 25)),
        min_size=0,
        max_size=15,
    ),
    points=st.lists(
        st.tuples(st.integers(0, 999), st.integers(0, 60)),
        min_size=0,
        max_size=20,
    ),
    bucket_seconds=st.sampled_from([1, 3, 7, 300]),
)
def test_interval_point_join_matches_bruteforce(
    spark, intervals, points, bucket_seconds
):
    """The bucketized equi-join must equal the nested-loop semantics
    start <= point < end for EVERY bucket width — exactly once per
    qualifying pair (no dedup pass exists to hide double-emits), and
    boundary cases (point == start, point == end, empty interval) land
    on the right side of the half-open contract."""
    iv = [(i, s, s + length) for i, s, length in intervals]
    idf = spark.createDataFrame(iv, "iv_id long, start_ts long, end_ts long")
    pdf = spark.createDataFrame(points, "p_id long, ts long")
    got = sorted(
        (r.iv_id, r.p_id)
        for r in interval_point_join(
            idf, pdf, "start_ts", "end_ts", "ts", bucket_seconds
        )
        .select("iv_id", "p_id")
        .collect()
    )
    want = sorted(
        (i, p)
        for i, s, e in iv
        for p, t in points
        if s <= t < e
    )
    assert got == want


# ------------------------------------------------------------ funnel


def _funnel_reference(events, stages):
    """Greedy frontier per the documented rule: stage k+1 needs an
    event of stages[k] strictly after the stage-k frontier by (ts, id),
    where a NULL id never beats anything at equal ts and, once frontier,
    is never beaten at equal ts; frontier pick is min(ts) with the
    smallest non-null id winning ties (nulls-last)."""
    by_user: dict = {}
    for user, typ, ts, eid in events:
        if user is None or ts is None:
            continue
        by_user.setdefault(user, []).append((typ, ts, eid))
    counts = [0] * len(stages)
    for evs in by_user.values():
        frontier = None  # (ts, id) of the previous stage's pick
        for idx, stage in enumerate(stages):
            qual = []
            for typ, ts, eid in evs:
                if typ != stage:
                    continue
                if frontier is not None:
                    ft, fi = frontier
                    later = ts > ft or (
                        ts == ft
                        and eid is not None
                        and fi is not None
                        and eid > fi
                    )
                    if not later:
                        continue
                qual.append((ts, eid))
            if not qual:
                break
            # min(struct(ts, id isnull, id)): earliest ts, nulls-last id
            frontier = min(
                qual, key=lambda q: (q[0], q[1] is None, q[1] if q[1] is not None else 0)
            )
            counts[idx] += 1
    return {
        (i + 1, stage, counts[i]) for i, stage in enumerate(stages) if True
    }


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            _key,
            st.sampled_from(["view", "click", "purchase", "other"]),
            _ts,
            st.one_of(st.none(), st.integers(0, 50)),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_funnel_counts_matches_greedy_reference(spark, events):
    df = spark.createDataFrame(
        events, "user_id long, event_type string, ts long, event_id long"
    )
    out = funnel_counts(df, ("view", "click", "purchase"))
    got = {(r.stage_idx, r.stage, r.n_users) for r in out.collect()}
    out.plan_caches.unpersist()
    want = _funnel_reference(events, ("view", "click", "purchase"))
    assert got == want


# ------------------------------------------------------- percentiles


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.one_of(st.none(), st.integers(0, 9)),
            st.integers(0, 999),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[2],
    )
)
def test_exact_percentiles_matches_interpolation_reference(spark, rows):
    """Per group the (n, p50, p95) triple must equal the explicit
    rank/linear-interpolation formula applied in plain Python to the
    same doubles — including single-value groups (pos lands on one
    rank), all-equal-value groups (tiebreak by id decides the rank
    order but not the interpolated value), and NULL values excluded."""
    data = [(g, float(v) if v is not None else None, i) for g, v, i in rows]
    df = spark.createDataFrame(data, "g long, v double, id long")
    got = {
        r.g: (r.n, r.p50, r.p95)
        for r in exact_percentiles(df, "v", "g", "id").collect()
    }

    by_group: dict = {}
    for g, v, i in data:
        if v is not None:
            by_group.setdefault(g, []).append((v, i))
    want = {}
    for g, vals in by_group.items():
        vals.sort()
        ordered = [v for v, _ in vals]
        n = len(ordered)
        out = []
        for q in (0.5, 0.95):
            pos = 1.0 + (n - 1) * q
            lo = ordered[math.floor(pos) - 1]
            hi = ordered[math.ceil(pos) - 1]
            out.append(lo + (hi - lo) * (pos - math.floor(pos)))
        want[g] = (n, out[0], out[1])
    assert got == want


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
