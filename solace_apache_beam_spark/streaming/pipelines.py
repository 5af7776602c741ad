"""Streaming twins of the reference's sample pipelines.

- windowed_word_count: WindowedWordCountSolace (SURVEY.md §3.2) — the
  flagship chain with watermark + tumbling windows.
- count_messages: CountMessagesPTransform (test/transform/
  CountMessagesPTransform.java:16-26) — global per-window count,
  withoutDefaults (grouped streaming agg emits nothing for empty
  windows natively).
- dedup_stream: the SolaceRecordTest dedup
  (SolaceRecordTest.java:143-147) — dropDuplicatesWithinWatermark on the
  representative key; state is evicted once the watermark passes.
- ingest_to_warehouse: SolaceBigQuery (§3.3) — envelope -> JSON payload
  parse -> append sink.

All take the source DataFrame (built by ``open_stream``) so batch tests
can feed the same transformations with a static DataFrame — Structured
Streaming's unified model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solace_apache_beam_spark.operators.text import (
    TOKENIZER_PATTERN,
)


def open_stream(
    spark: SparkSession,
    broker_dir: str,
    queues: list[str],
    use_sender_timestamp: bool = True,
    max_records_per_batch: int | None = None,
    max_read_time_ms: int | None = None,
) -> DataFrame:
    from solace_apache_beam_spark.sources.solace import register

    register(spark)
    reader = (
        spark.readStream.format("solace")
        .option("path", broker_dir)
        .option("queues", ",".join(queues))
        .option("useSenderTimestamp", str(use_sender_timestamp).lower())
    )
    # `is not None`, not truthiness: 0 must reach the source and fail
    # its positive-value validation, not silently become "unlimited"
    if max_records_per_batch is not None:
        reader = reader.option("maxRecordsPerBatch", str(max_records_per_batch))
    if max_read_time_ms is not None:
        reader = reader.option("maxReadTimeMs", str(max_read_time_ms))
    return reader.load()


def read_bounded(
    spark: SparkSession,
    broker_dir: str,
    queues: list[str],
    max_records: int | None = None,
    use_sender_timestamp: bool = True,
) -> DataFrame:
    """Bounded mode (S15): batch DataFrame over the queues."""
    from solace_apache_beam_spark.sources.solace import register

    register(spark)
    reader = (
        spark.read.format("solace")
        .option("path", broker_dir)
        .option("queues", ",".join(queues))
        .option("useSenderTimestamp", str(use_sender_timestamp).lower())
    )
    if max_records is not None:
        reader = reader.option("maxRecords", str(max_records))
    return reader.load()


def windowed_word_count(
    source: DataFrame,
    window: str = "10 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """§3.2 flagship chain on a streaming envelope DataFrame."""
    words = (
        source.select("event_time", F.col("payload").alias("line"))
        .select(
            "event_time",
            F.explode(F.split("line", TOKENIZER_PATTERN)).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    counted = (
        words.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counted.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "word",
        "cnt",
        F.format_string("%s: %d", F.col("word"), F.col("cnt")).alias("formatted"),
    )


def count_messages(
    source: DataFrame, window: str = "10 seconds", watermark: str = "0 seconds"
) -> DataFrame:
    counted = (
        source.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counted.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "cnt",
    )


def dedup_stream(
    source: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Best-effort dedup by representative key within the watermark
    horizon — state-store backed, evicted as the watermark advances
    (bounded state at 100 TB; global dropDuplicates would grow without
    bound)."""
    # default includes destination: message_id is only unique PER
    # QUEUE (publish mints it as the per-queue line index), so keying
    # on it alone over a multi-queue stream silently drops distinct
    # messages that share an id across queues
    keys = keys or ["destination", "message_id"]
    return source.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def observed_word_metrics(source: DataFrame) -> DataFrame:
    """A4 metrics twin: emptyLines counter + line-length distribution via
    df.observe, surfaced in StreamingQueryProgress."""
    lines = source.select(F.col("payload").alias("line"), "event_time")
    return lines.observe(
        "word_metrics",
        F.count_if(F.trim("line") == "").alias("empty_lines"),
        F.min(F.length("line")).alias("min_line_len"),
        F.max(F.length("line")).alias("max_line_len"),
        F.avg(F.length("line")).alias("avg_line_len"),
    )


def parse_fx_payload(source: DataFrame) -> DataFrame:
    """§3.3 MapToTableRow twin: JSON payload -> typed columns (the FX
    market-data shape, README.md:176-179 / SolaceBigQuery.java:180-196)."""
    fx_schema = (
        "date STRING, sym STRING, time STRING, "
        "lowAskSize INT, highAskSize INT, lowBidSize INT, highBidSize INT, "
        "lowTradeSize INT, highTradeSize INT, "
        "lowBidPrice DOUBLE, highBidPrice DOUBLE, lowTradePrice DOUBLE, "
        "highTradePrice DOUBLE, lowAskPrice DOUBLE, highAskPrice DOUBLE, "
        "vwap DOUBLE"
    )
    parsed = source.select(
        "message_id",
        "event_time",
        F.explode(
            F.from_json(F.col("payload"), f"array<struct<{fx_schema}>>")
        ).alias("data"),
    )
    return parsed.select("message_id", "event_time", "data.*")


def ingest_to_warehouse(
    source: DataFrame,
    table_path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
):
    """§3.3 SolaceBigQuery twin end-to-end: envelope -> FX JSON payload
    parse -> warehouse append (CREATE_IF_NEEDED/WRITE_APPEND ≈ parquet
    append creating the table on first batch). Returns the started
    StreamingQuery."""
    from solace_apache_beam_spark.sinks.warehouse import make_warehouse_appender

    return (
        parse_fx_payload(source)
        .writeStream.foreachBatch(make_warehouse_appender(table_path, partition_by))
        .option("checkpointLocation", checkpoint)
        .start()
    )


def click_view_stream_join(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "10 seconds",
    join_horizon_seconds: int = 60,
) -> DataFrame:
    """Stream-stream inner join: clicks to the views of the same sender
    within the preceding horizon. Both sides carry watermarks and the
    join condition bounds event-time distance, so the state store
    evicts rows once the watermark passes the horizon — state is
    bounded by (rate x horizon), not stream length."""
    c = (
        clicks.select(
            F.col("sender_id").alias("c_sender"),
            F.col("message_id").alias("click_id"),
            F.col("event_time").alias("click_time"),
        ).withWatermark("click_time", watermark)
    )
    v = (
        views.select(
            F.col("sender_id").alias("v_sender"),
            F.col("message_id").alias("view_id"),
            F.col("event_time").alias("view_time"),
        ).withWatermark("view_time", watermark)
    )
    return c.join(
        v,
        (F.col("c_sender") == F.col("v_sender"))
        & (F.col("view_time") <= F.col("click_time"))
        & (
            F.col("view_time")
            >= F.col("click_time") - F.expr(f"INTERVAL {join_horizon_seconds} SECONDS")
        ),
    )


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "destination",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static join: per-microbatch enrichment of the envelope
    with a dimension table (queue metadata, tenant config...). The
    static side is re-resolved every batch — no stream state.

    ``broadcast=True`` (default) forces a broadcast build of the
    dimension — right for the typical queue/tenant-metadata dim that is
    small at every scale. Pass ``broadcast=False`` for a dimension that
    grows with the deployment (e.g. a per-user table): the join then
    stays planner-owned and can pick a shuffled strategy instead of
    OOMing every executor on an oversized broadcast (PLANS.md)."""
    return stream.join(F.broadcast(dim) if broadcast else dim, key, "left")
