"""Regression guard for the round-4 TIMESTAMP_NTZ breakage.

The driver regenerated /root/testdata between rounds: ``events.ts`` went
from parquet TIMESTAMP(NANOS) to plain ``timestamp[us]`` with no
timezone, which Spark 4 infers as TIMESTAMP_NTZ. That type rejects a
direct cast to BIGINT, so ``interval_point_join``'s epoch-seconds floor
raised AnalysisException (CORRECTNESS_r04: range_join_error_clicks).

Two-layer defense, both pinned here:

1. ``session.load_table`` normalizes every ``timestamp_ntz`` column to
   TimestampType at the read boundary (session TZ is UTC, so values are
   unchanged).
2. ``interval_point_join`` is type-robust on its own: the epoch lambda
   casts through ``timestamp`` first, so even an un-normalized NTZ frame
   works.

The fixture writes a REAL parquet file with ``timestamp[us]`` (the
current testdata vintage, verified by pyarrow) and drives every temporal
operator through it.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ntz_sf_dir(tmp_path_factory):
    """A miniature events table stored exactly like the current driver
    testdata: parquet timestamp[us], no timezone annotation."""
    d = tmp_path_factory.mktemp("ntz_events")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    types = ["view", "click", "error", "purchase"]
    for i in range(200):
        rows.append(
            {
                "event_id": i,
                "ts": base + dt.timedelta(seconds=37 * i),
                "user_id": i % 13,
                "event_type": types[i % 4],
                "value": float(i) / 4.0,
                "props": "{}",
            }
        )
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),  # no tz -> Spark reads NTZ
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    # belt-and-braces: the fixture must actually be tz-less micros, or
    # this whole module tests nothing
    assert str(pq.read_schema(os.path.join(str(d), "events.parquet")).field("ts").type) == "timestamp[us]"
    return str(d)


def test_load_table_normalizes_ntz_to_timestamp(spark, ntz_sf_dir):
    from solace_apache_beam_spark.session import load_table

    ev = load_table(spark, ntz_sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # values unchanged by the cast (UTC session TZ): wall clock survives
    first = ev.orderBy("event_id").select("ts").first()[0]
    assert first == dt.datetime(2024, 1, 1, 0, 0, 0)


def test_interval_point_join_accepts_raw_ntz(spark, ntz_sf_dir):
    """Layer 2: the operator itself must work on an UN-normalized NTZ
    frame (future operators may read parquet without load_table)."""
    from solace_apache_beam_spark.operators.temporal import interval_point_join

    raw = spark.read.parquet(os.path.join(ntz_sf_dir, "events.parquet"))
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
    intervals = (
        raw.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
        )
    )
    points = raw.filter(F.col("event_type") == "click").select("event_id", "ts")
    out = interval_point_join(intervals, points)
    # every returned pair satisfies the containment predicate
    bad = out.filter(
        (F.col("ts") < F.col("start_ts")) | (F.col("ts") >= F.col("end_ts"))
    ).count()
    assert bad == 0
    assert out.count() > 0


def _expected_pairs(rows):
    """Driver-side oracle: brute-force the range join on plain python."""
    errors = [r for r in rows if r["event_type"] == "error"]
    clicks = [r for r in rows if r["event_type"] == "click"]
    out = set()
    for e in errors:
        lo, hi = e["ts"], e["ts"] + dt.timedelta(minutes=5)
        for c in clicks:
            if lo <= c["ts"] < hi:
                out.add((e["event_id"], c["event_id"]))
    return out


def test_interval_point_join_values_match_brute_force(spark, ntz_sf_dir):
    from solace_apache_beam_spark.operators.temporal import interval_point_join
    from solace_apache_beam_spark.session import load_table

    ev = load_table(spark, ntz_sf_dir, "events")
    rows = [r.asDict() for r in ev.collect()]
    intervals = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
        )
    )
    points = ev.filter(F.col("event_type") == "click").select("event_id", "ts")
    got = {
        (r.error_id, r.event_id)
        for r in interval_point_join(intervals, points).collect()
    }
    assert got == _expected_pairs(rows)


def test_every_temporal_operator_runs_on_ntz_vintage(spark, ntz_sf_dir):
    """End-to-end: asof join, range join, hypertable rollup, funnel over
    a load_table read of the NTZ-vintage parquet all execute and return
    sane shapes."""
    from solace_apache_beam_spark.operators.temporal import (
        asof_join,
        funnel_counts,
        hypertable_rollup,
        interval_point_join,
    )
    from solace_apache_beam_spark.session import load_table

    ev = load_table(spark, ntz_sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    asof = asof_join(clicks, views, right_cols={"view_value": "last_view_value"})
    assert asof.count() == clicks.count()

    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
    )
    rj = interval_point_join(intervals, clicks.select("event_id", "ts"))
    assert rj.count() >= 0

    roll = hypertable_rollup(ev, "ts", "value")
    assert {r.resolution for r in roll.select("resolution").distinct().collect()} == {
        "1 hour",
        "1 day",
    }

    fun = funnel_counts(ev)
    counts = {r.stage: r.n_users for r in fun.collect()}
    assert set(counts) == {"view", "click", "purchase"}
    assert counts["view"] >= counts["click"] >= counts["purchase"]


def test_registered_temporal_queries_run_on_real_testdata(spark, sf_dir):
    """The actual gate queries against the CURRENT /root/testdata vintage
    — the exact surface that failed in round 4."""
    from solace_apache_beam_spark.registry import all_queries

    qs = all_queries()
    for name in ("asof_click_view", "range_join_error_clicks", "hypertable_rollup_events"):
        assert qs[name](spark, sf_dir).count() > 0, name
