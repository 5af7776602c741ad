"""Temporal / sketch queries: as-of join, interval range join,
hypertable rollup, KMV distinct sketch — the time-series operator
families a large-scale pipeline needs beyond the reference surface
(SURVEY.md §2.8 categories + the north-star extensions).

Every query has a DuckDB oracle replaying identical semantics (DuckDB's
native ASOF JOIN / inequality join / date_trunc validate our composed
implementations against an independent engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solace_apache_beam_spark.registry import query
from solace_apache_beam_spark.session import load_table


@query(
    "asof_click_view",
    oracle="""
    WITH v AS (SELECT user_id, ts, max(value) AS view_value
               FROM events WHERE event_type = 'view' GROUP BY 1, 2),
    c AS (SELECT event_id, user_id, ts, value
          FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.ts, c.value,
           v.view_value AS asof_value, v.ts AS asof_ts
    FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the user's most recent view at or
    before it. Union-tag + one keyed window — one shuffle total; the
    oracle is DuckDB's native ASOF JOIN."""
    from solace_apache_beam_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return asof_join(
        clicks,
        views,
        on="ts",
        by="user_id",
        right_cols={"view_value": "asof_value", "ts": "asof_ts"},
    )


@query(
    "range_join_error_clicks",
    oracle="""
    SELECT e.event_id AS error_id, c.event_id AS click_id, c.ts AS click_ts
    FROM events e JOIN events c
      ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 5 MINUTE
    WHERE e.event_type = 'error' AND c.event_type = 'click'
    """,
)
def range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: clicks landing within 5 minutes after each
    error. Bucketized equi-join (each pair meets in exactly one bucket)
    — no O(n*m) nested loop; the oracle is a plain inequality join."""
    from solace_apache_beam_spark.operators.temporal import interval_point_join

    ev = load_table(spark, sf_dir, "events")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("error_id"), F.col("ts").alias("start_ts"))
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts"
    )
    return interval_point_join(
        errors, clicks, "start_ts", "end_ts", "ts", bucket_seconds=300
    ).select("error_id", "click_id", F.col("ts").alias("click_ts"))


@query(
    "hypertable_rollup_events",
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS bucket_start, count(*) AS n,
             sum(CAST(value AS DECIMAL(18,4))) AS dec_total
      FROM events GROUP BY 1
    )
    SELECT '1 hour' AS resolution, bucket_start, n,
           CAST(dec_total AS DOUBLE) AS total
    FROM h
    UNION ALL
    SELECT '1 day', date_trunc('day', bucket_start),
           CAST(sum(n) AS BIGINT), CAST(sum(dec_total) AS DOUBLE)
    FROM h GROUP BY 2
    """,
)
def hypertable_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly buckets from the
    raw table, daily buckets re-aggregated FROM the hourly level
    (hierarchical — the raw table is scanned once). DECIMAL sums keep
    the hierarchy bit-identical to a direct aggregate."""
    from solace_apache_beam_spark.operators.temporal import hypertable_rollup

    ev = load_table(spark, sf_dir, "events")
    return hypertable_rollup(ev, "ts", "value", "1 hour", "1 day")


@query(
    "kmv_distinct_parts",
    oracle="""
    WITH h AS (SELECT DISTINCT l_returnflag,
                      ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
               FROM lineitem),
    r AS (SELECT l_returnflag, h,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
          FROM h),
    g AS (SELECT l_returnflag,
                 max(CASE WHEN rn = 128 THEN h END) AS kth,
                 count(*) AS nd
          FROM r GROUP BY 1)
    SELECT l_returnflag,
           CASE WHEN kth IS NULL THEN CAST(nd AS DOUBLE)
                ELSE 127.0 * 1152921504606846976.0 / kth END AS est_distinct
    FROM g
    """,
)
def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct-count sketch of l_partkey per return
    flag — the deterministic, engine-portable alternative to HLL (Spark
    and DuckDB HLLs can never agree; bottom-k over the shared md5 hash
    always does)."""
    from solace_apache_beam_spark.functions.sketch import kmv_distinct

    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct(li, "l_partkey", "l_returnflag", k=128)
