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
               FROM events WHERE event_type = 'view'
                 AND ts IS NOT NULL AND user_id IS NOT NULL
               GROUP BY 1, 2),
    c AS (SELECT event_id, user_id, ts, value
          FROM events WHERE event_type = 'click'),
    cm AS (SELECT * FROM c WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    cn AS (SELECT * FROM c WHERE ts IS NULL OR user_id IS NULL)
    SELECT cm.event_id, cm.user_id, cm.ts, cm.value,
           v.view_value AS asof_value, v.ts AS asof_ts
    FROM cm ASOF LEFT JOIN v ON cm.user_id = v.user_id AND cm.ts >= v.ts
    UNION ALL
    SELECT event_id, user_id, ts, value,
           CAST(NULL AS DOUBLE) AS asof_value,
           CAST(NULL AS TIMESTAMP) AS asof_ts
    FROM cn
    """,
)
def asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the user's most recent view at or
    before it. Union-tag + one keyed window — one shuffle total; the
    oracle is DuckDB's native ASOF JOIN, restricted to the non-NULL
    domain where its matching agrees with its own comparison
    semantics: measured on DuckDB 1.0, a bare ASOF matches a NULL-ts
    right row to a NULL-ts left row AND a NULL-ts left row to the
    latest right row (sort-order matching, where the predicate
    `l.ts >= r.ts` is NULL) — tests/test_properties_temporal.py pins
    both divergences. The oracle therefore drops NULL-key/ts view rows
    (like the operator), ASOF-joins the non-NULL clicks, and carries
    NULL-key/ts clicks through unmatched (the left-join contract); on
    the current NULL-free events data this is value-identical to the
    bare ASOF, and on any future vintage with NULLs it stays aligned
    with the predicate semantics instead of the quirk."""
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
      FROM events WHERE ts IS NOT NULL GROUP BY 1
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
    the hierarchy bit-identical to a direct aggregate. NULL ts rows
    are excluded explicitly on both engines: Spark's F.window injects
    an IsNotNull(ts) filter silently, while the oracle's date_trunc
    would keep a NULL bucket — the filter pins one semantics."""
    from solace_apache_beam_spark.operators.temporal import hypertable_rollup

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
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


def _funnel_stage_sql(idx: int, stage: str) -> str:
    """qual -> earliest-(ts, event_id) frontier for one stage."""
    if idx == 0:
        qual = f"""q0 AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = '{stage}')"""
    else:
        qual = f"""q{idx} AS (
          SELECT e.user_id, e.ts, e.event_id
          FROM events e JOIN s{idx - 1} p ON e.user_id = p.user_id
          WHERE e.event_type = '{stage}'
            AND (e.ts > p.t OR (e.ts = p.t AND e.event_id > p.i)))"""
    return f"""{qual},
    t{idx} AS (SELECT user_id, min(ts) AS t FROM q{idx} GROUP BY 1),
    s{idx} AS (SELECT q.user_id, q.ts AS t, min(q.event_id) AS i
               FROM q{idx} q JOIN t{idx} ON q.user_id = t{idx}.user_id
                                        AND q.ts = t{idx}.t
               GROUP BY 1, 2)"""


_FUNNEL_STAGES = ("view", "click", "purchase")

_FUNNEL_SQL = (
    "WITH "
    + ",\n".join(_funnel_stage_sql(i, s) for i, s in enumerate(_FUNNEL_STAGES))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS stage_idx, '{s}' AS stage, count(*) AS n_users FROM s{i}"
        for i, s in enumerate(_FUNNEL_STAGES)
    )
)


@query("funnel_view_click_purchase", oracle=_FUNNEL_SQL)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: users surviving each
    stage with strictly-later (ts, event_id) matches; greedy earliest
    match per stage (exact for existence). Counts only — no floats."""
    from solace_apache_beam_spark.operators.temporal import funnel_counts

    return funnel_counts(load_table(spark, sf_dir, "events"))


@query(
    "percentiles_event_value",
    oracle="""
    WITH nn AS (SELECT event_type, value, event_id FROM events
                WHERE value IS NOT NULL),
    ranked AS (
      SELECT event_type, value,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS BIGINT) AS rn
      FROM nn
    ),
    n AS (SELECT event_type, count(*) AS n FROM nn GROUP BY 1),
    j AS (SELECT r.event_type, r.value, r.rn, n.n
          FROM ranked r JOIN n ON r.event_type = n.event_type),
    a AS (
      SELECT event_type, max(n) AS n,
             max(CASE WHEN rn = CAST(floor(1.0::DOUBLE + (n - 1) * 0.5::DOUBLE) AS BIGINT)
                      THEN value END) AS lo50,
             max(CASE WHEN rn = CAST(ceil(1.0::DOUBLE + (n - 1) * 0.5::DOUBLE) AS BIGINT)
                      THEN value END) AS hi50,
             max(CASE WHEN rn = CAST(floor(1.0::DOUBLE + (n - 1) * 0.95::DOUBLE) AS BIGINT)
                      THEN value END) AS lo95,
             max(CASE WHEN rn = CAST(ceil(1.0::DOUBLE + (n - 1) * 0.95::DOUBLE) AS BIGINT)
                      THEN value END) AS hi95
      FROM j GROUP BY 1
    )
    SELECT event_type, n,
           lo50 + (hi50 - lo50)
             * ((1.0::DOUBLE + (n - 1) * 0.5::DOUBLE) - floor(1.0::DOUBLE + (n - 1) * 0.5::DOUBLE)) AS p50,
           lo95 + (hi95 - lo95)
             * ((1.0::DOUBLE + (n - 1) * 0.95::DOUBLE) - floor(1.0::DOUBLE + (n - 1) * 0.95::DOUBLE)) AS p95
    FROM a
    """,
)
def percentiles_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type p50/p95 of value via explicit ranks +
    linear interpolation — engine-reproducible, unlike built-in
    percentile/quantile_cont reductions."""
    from solace_apache_beam_spark.operators.relational import exact_percentiles

    return exact_percentiles(
        load_table(spark, sf_dir, "events"), "value", "event_type", "event_id"
    )


@query(
    "expectation_report_lineitem",
    oracle="""
    SELECT 'quantity_in_range' AS rule,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0 AS passed
    FROM lineitem
    UNION ALL
    SELECT 'discount_in_range', count(*),
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'price_positive', count(*),
           CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'line_key_unique', CAST(sum(c) AS BIGINT), CAST(sum(c - 1) AS BIGINT),
           sum(c - 1) = 0
    FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
    """,
)
def expectation_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over lineitem: range rules in one
    scan (N rules = N conditional counts in one aggregation) plus a
    key-uniqueness rule (its own keyed agg) — the validation report a
    pipeline checks before trusting an input drop."""
    from solace_apache_beam_spark.functions.expectations import expectation_report

    li = load_table(spark, sf_dir, "lineitem")
    return expectation_report(
        li,
        rules={
            "quantity_in_range": (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            "discount_in_range": (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
            "price_positive": F.col("l_extendedprice") <= 0,
        },
        unique_keys={"line_key_unique": ["l_orderkey", "l_linenumber"]},
    )
