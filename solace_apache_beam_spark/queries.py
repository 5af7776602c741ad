"""Registered queries (SURVEY.md §2 inventory -> ``queries()`` entries).

Each function is the Spark-native form of a reference operator; the
``oracle`` string is the same computation in DuckDB SQL for the driver's
side-by-side correctness gate. Column names are aliased identically on
both sides (driver hashes values under sorted column names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solace_apache_beam_spark.envelope import events_to_envelope
from solace_apache_beam_spark.operators.text import (
    extract_words,
    format_word_count,
    windowed_count_words,
)
from solace_apache_beam_spark.registry import query
from solace_apache_beam_spark.session import load_table

# Epoch seconds of 2024-01-01 00:00:00 UTC — base for deriving a
# deterministic event_time for the timestamp-less documents table.
_DOC_TS_BASE = 1704067200


def _doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as timestamped "message payload" lines: stand-in
    for the broker feed (one doc per second from 2024-01-01), mirroring
    the reference tests' synthetic publishes (SolaceIOIT.java:490-497)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.timestamp_seconds(F.lit(_DOC_TS_BASE) + F.col("doc_id")).alias("event_time"),
        F.col("text").alias("line"),
    )


_DOC_LINES_SQL = f"""
  SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 SECOND * doc_id AS event_time,
         text AS line
  FROM documents
"""


# --------------------------------------------------------------------------
# Flagship: windowed word count (WindowedWordCountSolace.java:114-168)
# --------------------------------------------------------------------------


@query(
    "windowed_wordcount",
    oracle=f"""
    WITH lines AS ({_DOC_LINES_SQL}),
    words AS (
      SELECT event_time,
             unnest(regexp_split_to_array(line, '[^\\p{{L}}]+')) AS word
      FROM lines
    ),
    counted AS (
      SELECT TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * (CAST(floor(epoch(event_time) / 10) AS BIGINT) * 10) AS window_start,
             TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * (CAST(floor(epoch(event_time) / 10) AS BIGINT) * 10 + 10) AS window_end,
             word,
             count(*) AS cnt
      FROM words WHERE word <> ''
      GROUP BY 1, 2, 3
    )
    SELECT window_start, window_end, word, cnt,
           printf('%s: %d', word, cnt) AS formatted
    FROM counted
    """,
)
def windowed_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: decode -> tokenize -> filter -> 10 s tumbling windowed
    count -> format (the full §3.2 chain, WindowedWordCountSolace.java:
    136-160). All built-in exprs; HashAggregate partial/final."""
    lines = _doc_lines(spark, sf_dir)
    counted = windowed_count_words(lines, "line", "event_time", "10 seconds")
    return format_word_count(counted)


@query(
    "wordcount_global",
    oracle=f"""
    WITH lines AS ({_DOC_LINES_SQL})
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(line, '[^\\p{{L}}]+')) AS word FROM lines)
    WHERE word <> ''
    GROUP BY word
    """,
)
def wordcount_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountWords without windowing (common/CountWords.java:25-67)."""
    lines = _doc_lines(spark, sf_dir)
    words = extract_words(lines, "line")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


# --------------------------------------------------------------------------
# Envelope / per-record transforms (SURVEY.md §2.2)
# --------------------------------------------------------------------------


@query(
    "envelope_project",
    oracle="""
    SELECT 'Q/' || event_type AS destination,
           event_id AS message_id,
           props AS payload,
           0 AS priority,
           false AS redelivered,
           CAST(NULL AS VARCHAR) AS reply_to,
           ts AS receive_timestamp,
           ts AS sender_timestamp,
           'user-' || CAST(user_id AS VARCHAR) AS sender_id,
           event_id AS sequence_number,
           CAST(0 AS BIGINT) AS expiration,
           CAST(0 AS BIGINT) AS ttl
    FROM events
    """,
)
def envelope_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SolaceTextRecord envelope projection (SolaceTextRecord.java:191-224;
    SURVEY.md P2). Map-typed properties are exercised in tests (DuckDB
    view compare can't hash Spark maps portably, so the oracle checks the
    scalar envelope)."""
    env = events_to_envelope(load_table(spark, sf_dir, "events"))
    return env.drop("properties")


@query(
    "payload_extract",
    oracle="SELECT props AS line FROM events",
)
def payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-extraction ParDo: SolaceTextRecord -> String payload
    (SolaceRecordTest.java:149-154; StringMessageMapper.java:16-30)."""
    env = events_to_envelope(load_table(spark, sf_dir, "events"))
    return env.select(F.col("payload").cast("string").alias("line"))


@query(
    "json_payload_parse",
    oracle="""
    SELECT event_id AS message_id,
           CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
                WHEN regexp_matches(trim(coalesce(json_extract_string(props, '$.k'), '')),
                                    '^[+-]?[0-9]+$')
                THEN TRY_CAST(trim(json_extract_string(props, '$.k')) AS BIGINT)
           END AS k,
           ts AS event_time
    FROM events
    """,
)
def json_payload_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parse into typed columns (SolaceBigQuery.java:180-196
    maps payload JSON to table rows; SURVEY.md P5). get_json_object keeps
    the parse JVM-side.

    try_cast, not cast: under Spark 4's default ANSI mode a plain cast
    THROWS on any non-integer `$.k` (a string, a float, an array...) —
    one poison message on a long-running feed would fail the job (found
    by probing for the randomized events differential); a bad value
    parses to NULL instead. The oracle mirrors the tolerant path
    exactly on VALID JSON (json_valid guard + integer-format gate +
    TRY_CAST covers missing keys, floats — Spark does NOT round '5.9'
    where a bare DuckDB TRY_CAST would — signed/padded ints, bools,
    nested values, and BIGINT overflow; verified diff-free over that
    domain). Malformed-JSON tolerance itself is parser-defined and NOT
    part of the parity contract: Spark's get_json_object accepts some
    garbage (e.g. trailing junk) that DuckDB's strict parser rejects —
    the operator's contract is Spark's lenient behavior, and the gate
    data carries valid JSON."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("message_id"),
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        F.col("ts").alias("event_time"),
    )


# --------------------------------------------------------------------------
# Aggregations & dedup (SURVEY.md §2.4)
# --------------------------------------------------------------------------


@query(
    "count_per_window_global",
    oracle="""
    SELECT TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * (CAST(floor(epoch(ts) / 600) AS BIGINT) * 600) AS window_start,
           count(*) AS cnt
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1
    """,
)
def count_per_window_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combine.globally(Count) per window withoutDefaults — global count
    per 10-min window, empty windows emit nothing
    (test/transform/CountMessagesPTransform.java:16-26).

    NULL event times are excluded EXPLICITLY on both engines: Spark's
    F.window silently injects an IsNotNull(ts) filter, while a plain
    SQL GROUP BY would keep a NULL bucket — the filter makes the
    semantics identical instead of data-dependent."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


@query(
    "dedup_by_representative_key",
    oracle="""
    SELECT event_id AS message_id, user_id, event_type, ts AS event_time
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_by_representative_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct.withRepresentativeValueFn — dedup keyed by a
    representative value (SolaceRecordTest.java:143-147;
    SolaceProtoBuffRecordTest.java:185-188). dropDuplicates keeps an
    arbitrary row, so for a checkable contract we keep the
    lowest-message-id row per key (row_number, deterministic).
    Single shuffle on the dedup key; at scale this is the same plan as
    dropDuplicates (hash partition + per-key reduce).

    The pick orders event_id NULLS LAST to match SQL's ASC default
    (Spark defaults to NULLS FIRST — a NULL-id row would silently win
    the representative pick only on the Spark side). A group whose ids
    are ALL NULL ties, and the tie resolves arbitrarily on both
    engines — same contract as the oracle's own ORDER BY."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("event_id").asc_nulls_last()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("event_id").alias("message_id"),
            "user_id",
            "event_type",
            F.col("ts").alias("event_time"),
        )
    )


@query(
    "observed_metrics",
    oracle="""
    WITH lines AS (SELECT text AS line FROM documents)
    SELECT count(*) FILTER (WHERE trim(line) = '') AS empty_lines,
           CAST(min(length(line)) AS BIGINT) AS min_line_len,
           CAST(max(length(line)) AS BIGINT) AS max_line_len,
           CAST(CAST(sum(CAST(length(line) AS BIGINT)) AS DOUBLE) / count(*) AS DOUBLE) AS avg_line_len
    FROM lines
    """,
)
def observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExtractWordsFn side metrics: emptyLines counter + line-length
    distribution (common/CountWords.java:33-41) as an aggregate query.
    (Streaming twin uses df.observe + QueryListener — see streaming/.)"""
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(F.col("text").alias("line"))
    return lines.agg(
        F.count_if(F.trim("line") == "").alias("empty_lines"),
        F.min(F.length("line")).cast("long").alias("min_line_len"),
        F.max(F.length("line")).cast("long").alias("max_line_len"),
        (
            F.sum(F.length("line").cast("long")).cast("double") / F.count(F.lit(1))
        ).alias("avg_line_len"),
    )


# --------------------------------------------------------------------------
# Windowing (SURVEY.md §2.5: W1 covered above; W7 sliding/session below)
# --------------------------------------------------------------------------


@query(
    "sliding_window_count",
    oracle="""
    WITH expanded AS (
      SELECT e.event_type,
             (CAST(floor(epoch(e.ts) / 600) AS BIGINT) - i.i) * 600 AS start_s
      FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS i) i
      WHERE e.ts IS NOT NULL
    )
    SELECT TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * start_s AS window_start,
           TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * (start_s + 1200) AS window_end,
           event_type, count(*) AS cnt
    FROM expanded
    GROUP BY 1, 2, 3
    """,
)
def sliding_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (20 min / 10 min) per event type — W7; Spark
    expands each row into duration/slide windows with a generator
    (no self-join). NULL ts excluded explicitly on both engines (see
    count_per_window_global)."""
    from solace_apache_beam_spark.operators.windows import sliding_count

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return sliding_count(ev, "ts", "20 minutes", "10 minutes", "event_type")


@query(
    "session_window_count",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             -- STRICTLY greater: Spark's session_window MERGES two
             -- events exactly `gap` apart (inclusive touch — measured;
             -- the randomized events differential caught the >= form
             -- splitting them), and streaming/stateful.sessionize
             -- encodes the same strict-> rule
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS cnt
    FROM sess
    GROUP BY user_id, sid
    """,
)
def session_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user, 30 min gap (W7): session_window merges
    rows while consecutive gaps are AT MOST gap (an event landing
    exactly on last_event + gap still merges — inclusive touch,
    measured; stateful.sessionize's strict-> split encodes the same
    boundary); end = last event + gap. The oracle reproduces the merge
    with lag + gap-flag cumsum. NULL ts excluded explicitly on both
    engines (see count_per_window_global; DuckDB would otherwise sort
    NULLs into a session)."""
    from solace_apache_beam_spark.operators.windows import session_count

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return session_count(ev, "ts", "30 minutes", "user_id")


# --------------------------------------------------------------------------
# Relational layer (SURVEY.md §2.8 — absent in the reference, first-class
# in the Spark engine)
# --------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary. Money sums go through DECIMAL so
    the result is independent of partitioning/order (double sums are
    not) — that makes it oracle-exact AND reproducible on a cluster.
    Shipdate filter is pushed to the parquet scan."""
    from solace_apache_beam_spark.operators.relational import dec_sum

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum(F.col("l_quantity"), "decimal(18,4)").cast("double").alias("sum_qty"),
        dec_sum(F.col("l_extendedprice"), "decimal(18,4)").cast("double").alias("sum_base_price"),
        dec_sum(disc_price, "decimal(24,4)").cast("double").alias("sum_disc_price"),
        dec_sum(charge, "decimal(24,6)").cast("double").alias("sum_charge"),
        (dec_sum(F.col("l_quantity"), "decimal(18,4)").cast("double") / n).alias("avg_qty"),
        (dec_sum(F.col("l_extendedprice"), "decimal(18,4)").cast("double") / n).alias("avg_price"),
        (dec_sum(F.col("l_discount"), "decimal(18,4)").cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "revenue_by_nation",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema enrichment join: fact lineitem joined through orders
    and customer to the nation->region dimensions. Only the
    CONSTANT-cardinality dimensions are statically broadcast (nation is
    25 rows and region 5 at EVERY scale factor); customer scales
    linearly with SF — billions of rows at the 100 TB point — so its
    join carries no hint and AQE promotes it to broadcast only when the
    side is genuinely small (it is at sf0.1). Same contract as
    tpch_q3_shipping_priority / top_customers_per_segment, pinned in
    tests/test_plans.py."""
    from solace_apache_beam_spark.operators.relational import (
        broadcast_dim_join,
        dec_sum,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    enriched = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .transform(lambda d: broadcast_dim_join(d, nation, [cust.c_nationkey == nation.n_nationkey]))
        .transform(lambda d: broadcast_dim_join(d, region, [nation.n_regionkey == region.r_regionkey]))
    )
    return enriched.groupBy("r_name", "n_name").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "decimal(24,4)")
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "top_customers_per_segment",
    oracle="""
    WITH totals AS (
      SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT c.c_mktsegment, c.c_custkey, c.c_name, t.total_spent,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY t.total_spent DESC, c.c_custkey) AS rank
      FROM totals t JOIN customer c ON t.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment, c_custkey, c_name, total_spent, rank
    FROM ranked WHERE rank <= 5
    """,
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (§2.8 ranking): aggregate then row_number ≤ k —
    one shuffle on the group key, no global sort. Deterministic tiebreak
    on c_custkey. The customer join carries NO broadcast hint: customer
    scales linearly with SF (billions of rows at the 100 TB point) and
    a static F.broadcast() would be honored regardless of size; AQE
    still promotes to broadcast at runtime when the side is genuinely
    small (it is at sf0.1)."""
    from solace_apache_beam_spark.operators.relational import (
        dec_sum,
        top_k_per_group,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    totals = orders.groupBy("o_custkey").agg(
        dec_sum(F.col("o_totalprice"), "decimal(18,4)").cast("double").alias("total_spent")
    )
    joined = totals.join(
        cust, totals.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "c_custkey", "c_name", "total_spent")
    return top_k_per_group(
        joined, ["c_mktsegment"], "total_spent", 5, tiebreak_cols=["c_custkey"]
    )


@query(
    "set_ops_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (§2.8): customers with both URGENT and HIGH orders
    but no LOW orders. intersect/except distinct-semantics,
    hash-partitioned on the key."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(high).subtract(low)


@query(
    "rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           count(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (§2.8 grouping sets): (flag, status), (flag),
    () subtotals in one pass."""
    from solace_apache_beam_spark.operators.relational import dec_sum

    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dec_sum(F.col("l_quantity"), "decimal(18,4)").cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "pivot_linestatus",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (§2.8): linestatus values to columns. Explicit value list —
    no extra distinct-values job at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@query(
    "analytic_user_running",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER w AS rn,
           lag(value) OVER w AS prev_value,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def analytic_user_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (§2.8): per-user row_number, lag and
    running sum. The running sum goes through DECIMAL: engines may fold
    window frames in different association orders (segment trees), so
    double accumulation would not be comparable.

    Ordering is NULLS LAST explicitly: Spark's ASC default is NULLS
    FIRST while SQL's (and DuckDB's) is NULLS LAST, so a NULL-ts row
    would otherwise take rank 1 only on the Spark side and shift every
    rank/lag/running value after it (found by the randomized
    events-table differential in tests/test_properties_queries.py;
    same alignment as dedup_by_representative_key and
    exact_percentiles)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(frame).cast("double").alias("running_value"),
    )


@query(
    "protobuf_roundtrip",
    oracle="SELECT doc_id, text AS test FROM documents",
)
def protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protobuf decode (P4, SolaceProtoBuffRecordTest.java:189-194):
    documents.text is proto2-encoded into a BINARY payload column and
    decoded back — descriptor-driven from_protobuf when the
    spark-protobuf jar is present, the Arrow-batched wire-format parser
    otherwise; the oracle checks the decode against the original
    text."""
    from solace_apache_beam_spark.operators.protobuf_ops import (
        decode_proto_test_auto,
        encode_proto_test,
    )

    docs = load_table(spark, sf_dir, "documents")
    encoded = docs.select("doc_id", encode_proto_test(F.col("text")).alias("payload"))
    return encoded.select(
        "doc_id", decode_proto_test_auto(spark, F.col("payload")).alias("test")
    )


@query(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all 4 grouping-set combinations in
    one pass (Catalyst expands to a single shuffle with grouping-id;
    §2.8 grouping-sets category). DECIMAL sums for oracle bit-parity."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left ANTI join (NOT EXISTS decorrelation, §2.8 join category):
    customers with no high-value order. The totalprice filter pushes
    into the right scan; one shuffle on the key; no payload columns
    from the right side ever move."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "suppliers_with_large_parts",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM part p
                  WHERE p.p_partkey % 100 = s.s_suppkey % 100 AND p.p_size >= 40)
    """,
)
def suppliers_with_large_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left SEMI join (EXISTS, §2.8): suppliers sharing a hash bucket
    with a large part — the filter pushes into the right scan before the
    semi join, so only qualifying part keys shuffle."""
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    return s.join(
        p.filter(F.col("p_size") >= 40),
        F.col("p_partkey") % 100 == F.col("s_suppkey") % 100,
        "left_semi",
    ).select("s_suppkey", "s_name")


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    Filters reach the scans (pushdown); the top-10 is a
    TakeOrderedAndProject, not a full sort. The customer side is NOT
    statically broadcast — it scales with SF (a fifth of billions of
    rows at 100 TB) and a forced hint would override AQE; at small SF
    AQE promotes the join to broadcast on its own."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "salted_revenue_by_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def salted_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate join (explicit skew mitigation — the hot key
    spreads over n_salts reducers) feeding an aggregate; the oracle is
    the plain join, proving the salt changes the distribution, never
    the result."""
    from solace_apache_beam_spark.operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(o, c, "o_custkey", "c_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "orders_above_customer_avg",
    oracle="""
    WITH a AS (SELECT o_custkey AS k, count(*) AS n,
                      sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
               FROM orders GROUP BY 1)
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o JOIN a ON o.o_custkey = a.k
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n > s
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each order vs its customer's own
    average), decorrelated as whole-partition COUNT/SUM windows over
    one customer-keyed exchange (round 14 — the former per-key
    aggregate + equi-join scanned and shuffled orders twice; the
    windows compute the identical per-customer count and decimal sum
    in a single pass). The avg comparison is multiplied through
    (price * n > sum) so the predicate is exact DECIMAL arithmetic on
    both engines — no division-rounding parity to depend on."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        # NULL custkeys are excluded BEFORE the window: the former (and
        # oracle's) inner equi-join drops them (NULL never matches),
        # but a window PARTITION BY groups all NULLs into ONE partition
        # and would let them qualify against the NULL-group average —
        # the round-14 fuzz tier caught exactly that divergence on a
        # NULL-custkey corpus (no driver SF has NULL custkeys, so only
        # the randomized differential sees it). Filtering first also
        # keeps the dropped rows out of the exchange.
        o.filter(F.col("o_custkey").isNotNull())
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).alias("s"),
        )
        .filter(F.col("o_totalprice").cast("decimal(18,2)") * F.col("n") > F.col("s"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "data_quality_events",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (event_id IS NULL) AS BIGINT) AS viol_null_event_id,
           CAST(count(*) FILTER (value < 0) AS BIGINT) AS viol_negative_value,
           CAST(count(*) FILTER (ts < TIMESTAMP '2024-01-01'
                                 OR ts >= TIMESTAMP '2024-02-01') AS BIGINT) AS viol_ts_out_of_range,
           CAST(count(*) FILTER (event_type NOT IN
                ('click', 'view', 'error', 'purchase', 'signup')) AS BIGINT) AS viol_unknown_type
    FROM events
    """,
)
def data_quality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation gate over the events table: one scan, conditional
    counts per named check (nulls, negative values, timestamp range,
    enum membership) — the pre-publish validation report."""
    from solace_apache_beam_spark.operators.validation import expect

    ev = load_table(spark, sf_dir, "events")
    return expect(
        ev,
        {
            "null_event_id": F.col("event_id").isNull(),
            "negative_value": F.col("value") < 0,
            "ts_out_of_range": (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
            | (F.col("ts") >= F.lit("2024-02-01").cast("timestamp")),
            "unknown_type": ~F.col("event_type").isin(
                "click", "view", "error", "purchase", "signup"
            ),
        },
    )
