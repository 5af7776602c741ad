"""Unit semantics for the temporal operators (asof join, interval range
join, hypertable rollup, KMV sketch) — boundary conditions the oracle
gate exercises only statistically."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_semantics(spark):
    from solace_apache_beam_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "u", _ts(5), 1.0), (2, "u", _ts(10), 2.0), (3, "v", _ts(1), 3.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [("u", _ts(5), 50.0), ("u", _ts(7), 70.0), ("w", _ts(0), 99.0)],
        "user_id string, ts timestamp, rv double",
    )
    out = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in asof_join(
            left, right, right_cols={"rv": "asof_value", "ts": "asof_ts"}
        ).collect()
    }
    assert out[1] == (50.0, _ts(5))  # equal timestamp is inclusive
    assert out[2] == (70.0, _ts(7))  # greatest ts <= left.ts wins
    assert out[3] == (None, None)  # no prior right row -> nulls kept


def test_asof_join_null_right_values_stay_together(spark):
    """A NULL inside the matched right row must come through as NULL —
    not be back-filled from an older right row (true ASOF semantics:
    all output columns from the single matched row)."""
    from solace_apache_beam_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "u", _ts(8), 1.0)], "event_id long, user_id string, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [("u", _ts(5), 50.0), ("u", _ts(7), None)],
        "user_id string, ts timestamp, rv double",
    )
    row = asof_join(
        left, right, right_cols={"rv": "asof_value", "ts": "asof_ts"}
    ).collect()[0]
    # matched row is ts=7 whose rv is NULL: asof_ts from it, asof_value NULL
    assert row.asof_ts == _ts(7)
    assert row.asof_value is None


def test_interval_point_join_boundaries(spark):
    from solace_apache_beam_spark.operators.temporal import interval_point_join

    intervals = spark.createDataFrame(
        [(1, _ts(10), _ts(20))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    points = spark.createDataFrame(
        [(1, _ts(9, 59)), (2, _ts(10)), (3, _ts(19, 59)), (4, _ts(20))],
        "pid long, ts timestamp",
    )
    got = sorted(
        r.pid
        for r in interval_point_join(
            intervals, points, bucket_seconds=120  # interval spans 6 buckets
        ).collect()
    )
    assert got == [2, 3]  # start inclusive, end exclusive; no duplicates


def test_hypertable_rollup_hierarchy_exact(spark, sf_dir):
    """The re-aggregated daily level must equal a direct daily aggregate
    (DECIMAL sums make re-association exact)."""
    from solace_apache_beam_spark.operators.temporal import hypertable_rollup
    from solace_apache_beam_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = (
        hypertable_rollup(ev, "ts", "value")
        .filter(F.col("resolution") == "1 day")
        .select("bucket_start", "n", "total")
    )
    direct = (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n", "total")
    )
    assert sorted(map(tuple, daily.collect())) == sorted(map(tuple, direct.collect()))


def test_kmv_exact_below_k_and_estimate_error(spark, sf_dir):
    from solace_apache_beam_spark.functions.sketch import kmv_distinct
    from solace_apache_beam_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    # small k -> estimator path; compare against exact distinct counts
    est = {
        r[0]: r.est_distinct
        for r in kmv_distinct(li, "l_partkey", "l_returnflag", k=64).collect()
    }
    exact = {
        r[0]: r.nd
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("nd"))
        .collect()
    }
    for flag, nd in exact.items():
        if nd < 64:
            assert est[flag] == pytest.approx(nd)  # exact fallback
        else:
            # bottom-k standard error ~ 1/sqrt(k) ~ 12.5%; allow 4 sigma
            assert abs(est[flag] - nd) / nd < 0.5


def test_salted_join_equals_plain_join(spark):
    from solace_apache_beam_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, lv string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], "rk long, rv string")
    got = sorted(
        (r.k, r.lv, r.rv)
        for r in salted_join(left, right, "k", "rk", n_salts=4).collect()
    )
    assert got == [(1, "a", "X"), (1, "b", "X"), (2, "c", "Y")]


def test_connected_components_chain_and_islands(spark):
    from solace_apache_beam_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        r.doc_id: r.cluster_rep for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_releases_superseded_round_blocks(spark):
    """Each loop round's superseded labels checkpoint must actually
    leave the block manager (DataFrame.unpersist is a no-op for
    localCheckpoint-ed frames — the release goes through the RDD), so
    storage stays O(1) in rounds, not O(rounds)."""
    from solace_apache_beam_spark.llm.dedup import connected_components

    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    # a 32-node chain needs several pointer-jumping rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 32)], "doc_a long, doc_b long"
    )
    labels = connected_components(pairs)
    assert {r.cluster_rep for r in labels.collect()} == {1}
    # only the final labels checkpoint may remain cached
    assert len(jsc.getRDDStorageInfo()) <= before + 1


def test_connected_components_terminal_checkpoint_release(spark):
    """The converged labels frame is backed by the terminal round's
    localCheckpoint — out.checkpoint_caches releases it once the
    caller is done (round-8 review: without the handle every
    dedup_clusters call strands one full labels frame in the block
    manager for the session lifetime). Unlike plan_caches, release
    kills the frame (checkpoint == lineage), so the contract is
    release-after-fully-consumed; the test therefore collects FIRST."""
    from solace_apache_beam_spark.llm.dedup import (
        CheckpointCaches,
        connected_components,
    )

    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 32)], "doc_a long, doc_b long"
    )
    labels = connected_components(pairs)
    handle = labels.checkpoint_caches
    assert isinstance(handle, CheckpointCaches)
    assert {r.cluster_rep for r in labels.collect()} == {1}
    assert handle.is_cached
    handle.unpersist()
    assert not handle.is_cached
    # block-manager-level: nothing from this call may remain
    assert len(jsc.getRDDStorageInfo()) <= before


def test_funnel_excludes_null_timestamps(spark):
    """min(struct(ts, id)) sorts a NULL ts field FIRST, so without the
    explicit not-null filter a user whose only qualifying event has a
    null timestamp would enter the frontier — where the original
    min(ts)+equality-join form (and any SQL oracle, whose MIN ignores
    NULLs) excluded them (ADVICE r6). Pin the exclusion."""
    from solace_apache_beam_spark.operators.temporal import funnel_counts

    rows = [
        # user 1: full funnel, all timestamps present
        (1, "2024-01-01 00:00:01", 1, "view"),
        (2, "2024-01-01 00:00:02", 1, "click"),
        # user 2: only a NULL-ts view — must not count anywhere
        (3, None, 2, "view"),
        # user 3: NULL-ts view plus a real click: the click cannot
        # qualify (no stage-1 frontier), so user 3 counts nowhere
        (4, None, 3, "view"),
        (5, "2024-01-01 00:00:03", 3, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.stage: r.n_users
        for r in funnel_counts(df, stages=("view", "click")).collect()
    }
    assert got == {"view": 1, "click": 1}


_NULLABLE_FUNNEL_ROWS = [
    # (event_id, ts, user_id, event_type)
    # user 1: full funnel, all columns present
    (1, "2024-01-01 00:00:01", 1, "view"),
    (2, "2024-01-01 00:00:02", 1, "click"),
    # NULL user with otherwise-valid events: the oracle's frontier
    # equi-join drops the NULL group — must count nowhere
    (3, "2024-01-01 00:00:01", None, "view"),
    (4, "2024-01-01 00:00:02", None, "click"),
    # user 5's only view has a NULL event_id but a valid ts: SQL keeps
    # the row (only MIN over the tie-break id ignores the NULL), so
    # user 5 counts at view, and the strictly-later click qualifies
    (None, "2024-01-01 00:00:01", 5, "view"),
    (6, "2024-01-01 00:00:03", 5, "click"),
    # user 7: two views at the SAME ts, ids (NULL, 9) — the frontier
    # id must be 9 (nulls-last tie-break, like min(event_id)), so the
    # same-ts click with id 10 > 9 qualifies
    (None, "2024-01-01 00:00:05", 7, "view"),
    (9, "2024-01-01 00:00:05", 7, "view"),
    (10, "2024-01-01 00:00:05", 7, "click"),
    # user 8: same views, but the same-ts click id 5 < 9 does NOT
    # qualify (and NULL frontier comparisons never resurrect it)
    (None, "2024-01-01 00:00:05", 8, "view"),
    (9, "2024-01-01 00:00:05", 8, "view"),
    (5, "2024-01-01 00:00:05", 8, "click"),
]


def test_funnel_nullable_inputs_match_sql_semantics(spark):
    """Nullable columns must behave exactly as the SQL oracle does:
    NULL ts and NULL user_id rows are effectively excluded (MIN
    ignores / equi-join drops), but a NULL EVENT_ID row still
    qualifies by timestamp — only the tie-break ignores the null id
    (nulls-last in the frontier struct-min). Expected counts are
    hand-derived AND cross-checked against the registered DuckDB
    oracle on the same rows."""
    from solace_apache_beam_spark.operators.temporal import funnel_counts

    df = spark.createDataFrame(
        _NULLABLE_FUNNEL_ROWS,
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.stage: r.n_users
        for r in funnel_counts(df, stages=("view", "click")).collect()
    }
    # view: users 1, 5, 7, 8; click: 1 (later ts), 5 (later ts),
    # 7 (same-ts id 10 > frontier id 9); not 8 (id 5 < 9)
    assert got == {"view": 4, "click": 3}

    # the registered oracle on the SAME nullable rows must agree
    import duckdb
    import pandas as pd

    from solace_apache_beam_spark.queries_temporal import _funnel_stage_sql

    pdf = pd.DataFrame(
        _NULLABLE_FUNNEL_ROWS, columns=["event_id", "ts", "user_id", "event_type"]
    )
    pdf["event_id"] = pdf["event_id"].astype("Int64")
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT * FROM pdf")
    stages = ("view", "click")
    sql = (
        "WITH "
        + ",\n".join(_funnel_stage_sql(i, s) for i, s in enumerate(stages))
        + "\n"
        + "\nUNION ALL\n".join(
            f"SELECT '{s}' AS stage, count(*) AS n_users FROM s{i}"
            for i, s in enumerate(stages)
        )
    )
    oracle = {stage: n for stage, n in con.execute(sql).fetchall()}
    assert oracle == got
