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
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           ts AS event_time
    FROM events
    """,
)
def json_payload_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parse into typed columns (SolaceBigQuery.java:180-196
    maps payload JSON to table rows; SURVEY.md P5). get_json_object keeps
    the parse JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("message_id"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
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
    GROUP BY 1
    """,
)
def count_per_window_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combine.globally(Count) per window withoutDefaults — global count
    per 10-min window, empty windows emit nothing
    (test/transform/CountMessagesPTransform.java:16-26)."""
    ev = load_table(spark, sf_dir, "events")
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
    dropDuplicates (hash partition + per-key reduce)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
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
