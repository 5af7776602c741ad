"""Sink + pipeline tests: windowed-file naming (K1), warehouse append
(K3), streaming dedup (A3), FX JSON parse (§3.3), observed metrics (A4)."""

from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from solace_apache_beam_spark.sources import fake_broker
from solace_apache_beam_spark.streaming.pipelines import (
    dedup_stream,
    open_stream,
    parse_fx_payload,
    windowed_word_count,
)


@pytest.fixture()
def broker(tmp_path):
    broker_dir = str(tmp_path / "broker")
    fake_broker.create_queue(broker_dir, "q1")
    return broker_dir


def test_window_file_sink_naming(spark, broker, tmp_path):
    """Filenames are prefix-HH.mm-HH.mm-<shard>-of-<n>
    (WriteOneFilePerWindow.java:95-112; pane index documented as not
    reproduced)."""
    from solace_apache_beam_spark.sinks.window_files import make_window_file_writer

    fake_broker.publish(broker, "q1", ["alpha beta", "beta gamma"])
    out_dir = str(tmp_path / "out")
    stream = open_stream(spark, broker, ["q1"])
    q = (
        windowed_word_count(stream)
        .writeStream.foreachBatch(make_window_file_writer(out_dir, prefix="wordcount"))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    files = sorted(os.listdir(out_dir))
    assert files, "no window files written"
    pat = re.compile(r"^wordcount-\d{2}\.\d{2}-\d{2}\.\d{2}-\d{5}-of-\d{5}$")
    assert all(pat.match(f) for f in files), files
    lines = []
    for f in files:
        with open(os.path.join(out_dir, f)) as fh:
            lines += [ln.strip() for ln in fh if ln.strip()]
    assert sorted(lines) == ["alpha: 1", "beta: 2", "gamma: 1"]


def test_warehouse_append_sink(spark, broker, tmp_path):
    from solace_apache_beam_spark.sinks.warehouse import make_warehouse_appender

    fake_broker.publish(broker, "q1", ["m1", "m2", "m3"])
    table = str(tmp_path / "warehouse")
    stream = open_stream(spark, broker, ["q1"])
    q = (
        stream.writeStream.foreachBatch(make_warehouse_appender(table))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(table)
    assert sorted(r.payload for r in back.collect()) == ["m1", "m2", "m3"]
    assert "_epoch_id" in back.columns


def test_stream_dedup_within_watermark(spark, broker, tmp_path):
    """dropDuplicatesWithinWatermark on the representative key
    (SolaceRecordTest.java:143-147): duplicate message ids in one burst
    collapse to one."""
    # two publishes with overlapping message ids: simulate duplicate
    # delivery by pre-setting sequence ids via duplicate payload rows
    fake_broker.publish(broker, "q1", ["dup", "dup", "uniq"])
    stream = open_stream(spark, broker, ["q1"])
    deduped = dedup_stream(stream, keys=["payload"], watermark="10 seconds")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT payload FROM dedup").collect()
    assert sorted(r.payload for r in rows) == ["dup", "uniq"]


def test_fx_json_parse_stream(spark, broker, tmp_path):
    """FX market-data JSON payload -> typed columns
    (README.md:176-179, SolaceBigQuery.java:180-196)."""
    payload = json.dumps(
        [
            {
                "date": "2020-06-07",
                "sym": "DUMMY",
                "time": "22:58",
                "lowAskSize": 20,
                "highAskSize": 790,
                "lowBidPrice": 43.13057,
                "highBidPrice": 44.95833,
                "lowBidSize": 60,
                "highBidSize": 770,
                "lowTradePrice": 43.51274,
                "highTradePrice": 45.41246,
                "lowTradeSize": 0,
                "highTradeSize": 480,
                "lowAskPrice": 43.67592,
                "highAskPrice": 45.86658,
                "vwap": 238.0331,
            }
        ]
    )
    fake_broker.publish(broker, "q1", [payload])
    stream = open_stream(spark, broker, ["q1"])
    q = (
        parse_fx_payload(stream)
        .writeStream.format("memory")
        .queryName("fx")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    row = spark.sql("SELECT * FROM fx").collect()[0]
    assert row.sym == "DUMMY"
    assert row.lowAskSize == 20
    assert abs(row.vwap - 238.0331) < 1e-9


def test_observed_metrics_stream(spark, broker, tmp_path):
    """df.observe metrics surfaced per batch (Metrics.counter /
    distribution twin, common/CountWords.java:33-41)."""
    from solace_apache_beam_spark.streaming.pipelines import observed_word_metrics

    fake_broker.publish(broker, "q1", ["abc", "", "defgh"])
    stream = open_stream(spark, broker, ["q1"])
    observed = observed_word_metrics(stream)
    q = (
        observed.writeStream.format("memory")
        .queryName("obs")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    progress = q.recentProgress
    q.stop()
    metrics = [
        p["observedMetrics"]["word_metrics"]
        for p in progress
        if "word_metrics" in (p.get("observedMetrics") or {})
    ]
    assert metrics, "no observed metrics in progress"
    m = metrics[0]
    assert m["empty_lines"] == 1
    assert m["min_line_len"] == 0
    assert m["max_line_len"] == 5


def test_processing_time_trigger_incremental(spark, broker, tmp_path):
    """W2 twin (SolaceIOLifecycleDataflowIT.java:457-467): the
    reference's GlobalWindows + repeated processing-time trigger is
    Structured Streaming's native trigger(processingTime) + update
    output — content, not window labels, is what must match."""
    from solace_apache_beam_spark.streaming.pipelines import open_stream

    fake_broker.publish(broker, "q1", [f"m{i}" for i in range(6)])
    stream = open_stream(spark, broker, ["q1"], max_records_per_batch=2)
    q = (
        stream.groupBy("destination")
        .count()
        .writeStream.format("memory")
        .queryName("ptt")
        .outputMode("update")
        .trigger(processingTime="100 milliseconds")
        .option("checkpointLocation", str(tmp_path / "cp_ptt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # each 2-record pane updated the running count; the last pane holds
    # the full total (discarding-panes content equivalence)
    rows = spark.sql("SELECT max(count) c FROM ptt").collect()
    assert rows[0].c == 6


def test_idempotent_appender_replaces_replayed_epoch(spark, tmp_path):
    """A replayed microbatch overwrites its own epoch partition instead
    of appending duplicates (exactly-once effect under the at-least-once
    foreachBatch contract)."""
    from solace_apache_beam_spark.sinks.warehouse import make_idempotent_appender

    table = str(tmp_path / "idem")
    write = make_idempotent_appender(table)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write(b0, 0)
    write(spark.createDataFrame([(3, "c")], "id long, v string"), 1)
    # epoch 0 is retried with the same content — must not duplicate
    write(b0, 0)
    rows = sorted((r.id, r.v) for r in spark.read.parquet(table).collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_streaming_llm_ingest_dedup_normalize(spark, broker, tmp_path):
    """End-to-end training-data ingest: broker stream -> normalize ->
    content-hash dedup within watermark -> idempotent warehouse append.
    Duplicate payloads across waves inside the watermark horizon land
    exactly once."""
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.text_analysis import normalize_text
    from solace_apache_beam_spark.sinks.warehouse import make_idempotent_appender
    from solace_apache_beam_spark.streaming.pipelines import open_stream

    table = str(tmp_path / "corpus")
    fake_broker.publish(broker, "q1", ["Hello, World!", "hello   world", "Other doc."])
    stream = open_stream(spark, broker, ["q1"])
    normalized = normalize_text(
        stream.withColumn("doc_id", F.col("message_id")), text_col="payload"
    ).withColumn("event_time", F.expr("now()"))
    deduped = (
        normalized.withColumn("text_hash", F.md5("normalized"))
        .withWatermark("event_time", "10 minutes")
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
    q = (
        deduped.writeStream.foreachBatch(make_idempotent_appender(table))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_llm"))
        .start()
    )
    q.processAllAvailable()
    # second wave republishes a normalized-equal duplicate
    fake_broker.publish(broker, "q1", ["HELLO world", "new third doc"])
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(table).select("normalized").collect()
    got = sorted(r.normalized for r in rows)
    assert got == sorted(["hello world", "other doc", "new third doc"])


def test_progress_collector_surfaces_observed_metrics(spark, broker, tmp_path):
    """S14 surfacing: per-batch input rows + df.observe aggregates reach
    the StreamingQueryListener (the reference's periodic stats dump ->
    progress events)."""
    import time

    from solace_apache_beam_spark.streaming.metrics import ProgressCollector
    from solace_apache_beam_spark.streaming.pipelines import (
        observed_word_metrics,
        open_stream,
    )

    collector = ProgressCollector()
    spark.streams.addListener(collector)
    try:
        fake_broker.publish(broker, "q1", ["alpha beta", "", "gamma"])
        stream = open_stream(spark, broker, ["q1"])
        q = (
            observed_word_metrics(stream)
            .writeStream.format("memory")
            .queryName("obsq")
            .option("checkpointLocation", str(tmp_path / "cp_obs"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # listener events are delivered asynchronously
        for _ in range(50):
            if collector.totals("obsq")["num_input_rows"] >= 3:
                break
            time.sleep(0.1)
        totals = collector.totals("obsq")
        assert totals["num_input_rows"] == 3
        wm = totals["observed"]["word_metrics"]
        assert wm["empty_lines"] == 1
        assert wm["max_line_len"] == 10  # "alpha beta"
    finally:
        spark.streams.removeListener(collector)


def test_progress_collector_gauge_vs_counter_semantics():
    """totals() sums undeclared numeric metrics (counters) but keeps
    the LAST value for declared gauges — summing a current-size gauge
    across microbatches would silently inflate it (ADVICE r2). Pure
    listener-side logic: no Spark session needed."""
    from solace_apache_beam_spark.streaming.metrics import ProgressCollector

    c = ProgressCollector()
    for batch_id, (dropped, total) in enumerate([(2, 10), (1, 12)]):
        c.batches.append(
            {
                "name": "q",
                "batch_id": batch_id,
                "num_input_rows": 5,
                "observed": {
                    "buckets": {
                        "dropped_buckets": dropped,
                        "total_buckets": total,
                    }
                },
            }
        )
    summed = c.totals("q")["observed"]["buckets"]
    assert summed == {"dropped_buckets": 3, "total_buckets": 22}
    # bare-key and observation-qualified gauge declarations
    gauged = c.totals("q", gauges={"total_buckets"})["observed"]["buckets"]
    assert gauged == {"dropped_buckets": 3, "total_buckets": 12}
    gauged_q = c.totals("q", gauges={"buckets.total_buckets"})
    assert gauged_q["observed"]["buckets"]["total_buckets"] == 12
    assert gauged_q["num_input_rows"] == 10


def test_stream_stream_join_click_views(spark, broker, tmp_path):
    """Watermarked stream-stream join with an event-time horizon: each
    click matches same-sender views at-or-before it within 60 s."""
    from solace_apache_beam_spark.streaming.pipelines import (
        click_view_stream_join,
        open_stream,
    )

    base = 1_800_000_000_000_000
    fake_broker.create_queue(broker, "views")
    fake_broker.create_queue(broker, "clicks")
    fake_broker.publish(
        broker, "views", ["v0", "v1"],
        sender_id="alice",
        sender_timestamp_us=[base, base + 30_000_000],
    )
    fake_broker.publish(
        broker, "views", ["v2"], sender_id="bob", sender_timestamp_us=base
    )
    # alice clicks 40 s in: v0 (40 s before) and v1 (10 s before) match;
    # bob's view is another sender; a click 200 s later matches nothing
    fake_broker.publish(
        broker, "clicks", ["c0"], sender_id="alice",
        sender_timestamp_us=base + 40_000_000,
    )
    fake_broker.publish(
        broker, "clicks", ["c1"], sender_id="alice",
        sender_timestamp_us=base + 200_000_000,
    )
    joined = click_view_stream_join(
        open_stream(spark, broker, ["clicks"]),
        open_stream(spark, broker, ["views"]),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "cp_ssj"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT click_id, view_id FROM ssj").collect()
    assert sorted((r.click_id, r.view_id) for r in rows) == [(0, 0), (0, 1)]


def test_stream_static_enrichment(spark, broker, tmp_path):
    """Stream-static broadcast join: envelope enriched with a queue
    metadata dimension, no stream state."""
    from solace_apache_beam_spark.streaming.pipelines import (
        enrich_with_static,
        open_stream,
    )

    fake_broker.create_queue(broker, "q2")
    fake_broker.publish(broker, "q1", ["a"])
    fake_broker.publish(broker, "q2", ["b"])
    dim = spark.createDataFrame(
        [("q1", "tenant-x"), ("q2", "tenant-y")], "destination string, tenant string"
    )
    q = (
        enrich_with_static(open_stream(spark, broker, ["q1", "q2"]), dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "cp_en"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT payload, tenant FROM enriched").collect()
    assert {(r.payload, r.tenant) for r in rows} == {("a", "tenant-x"), ("b", "tenant-y")}


def test_enrich_with_static_broadcast_escape_hatch(spark):
    """broadcast=False must leave the dimension join planner-owned — no
    ResolvedHint in the analyzed plan — so a deployment-scale dimension
    (per-user config, say) can take a shuffled join instead of an
    executor-OOMing broadcast. Default stays hinted (queue-metadata dims
    are small at every scale). Checked on static frames: the join
    construction is identical for a streaming left side."""
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.streaming.pipelines import enrich_with_static

    stream = spark.range(100).select(
        F.concat(F.lit("q"), (F.col("id") % 3).cast("string")).alias("destination"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame(
        [("q0", "t0"), ("q1", "t1")], "destination string, tenant string"
    )
    hinted = enrich_with_static(stream, dim)
    unhinted = enrich_with_static(stream, dim, broadcast=False)
    plan = lambda df: df._jdf.queryExecution().analyzed().toString()  # noqa: E731
    assert "ResolvedHint" in plan(hinted)
    assert "ResolvedHint" not in plan(unhinted)
    # identical results either way (left join keeps unmatched q2 rows)
    a = sorted((r.destination, r.payload, r.tenant) for r in hinted.collect())
    b = sorted((r.destination, r.payload, r.tenant) for r in unhinted.collect())
    assert a == b and len(a) == 100


def test_distributed_log_sink_logs_all_rows_without_driver_collect(spark, tmp_path):
    """foreachPartition variant: every row becomes a line on the
    EXECUTOR side (here: one file per line via the injected logger) —
    no driver collect anywhere in the path."""
    from solace_apache_beam_spark.sinks.warehouse import make_distributed_log_sink

    out = tmp_path / "lines"
    out.mkdir()
    target = str(out)

    def line_logger(msg: str) -> None:
        import os
        import uuid

        with open(os.path.join(target, uuid.uuid4().hex), "w") as f:
            f.write(msg)

    sink = make_distributed_log_sink(line_logger)
    sink(spark.range(100).withColumnRenamed("id", "v"), 7)
    files = list(out.iterdir())
    assert len(files) == 100
    assert all("epoch=7" in f.read_text() for f in files)


def test_log_sink_driver_variant_logs_every_row(spark):
    """Collect-to-driver variant (dev/debug contract): every row lands
    as a line at the injected driver-side logger."""
    from solace_apache_beam_spark.sinks.warehouse import make_log_sink

    lines: list[str] = []

    class Logger:
        def info(self, msg: str) -> None:
            lines.append(msg)

    sink = make_log_sink(Logger())
    sink(spark.range(5).withColumnRenamed("id", "v"), 3)
    assert len(lines) == 5
    assert all(line.startswith("epoch=3 ") for line in lines)
    assert {f"epoch=3 {{'v': {i}}}" for i in range(5)} == set(lines)


def test_write_training_shards_canonical_order(spark, tmp_path):
    """The shard writer materializes exactly the training_shuffle
    permutation: shard=K directories, rows in pos order, content
    identical across runs."""
    from solace_apache_beam_spark.functions.sampling import training_shuffle
    from solace_apache_beam_spark.sinks.warehouse import write_training_shards

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7).alias("payload")
    )
    out = str(tmp_path / "shards")
    stats = write_training_shards(df, out, "doc_id", n_shards=4)
    assert stats == {"rows_written": 200, "rows_dropped_null_id": 0}

    import os

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) == 4
    manifest = {
        (r.shard, r.pos): r.doc_id
        for r in training_shuffle(df, "doc_id", 4).collect()
    }
    back = spark.read.parquet(out)
    got = {(r.shard, r.pos): r.doc_id for r in back.collect()}
    assert got == manifest
    assert back.count() == 200


def test_write_training_shards_null_drop_observable(spark, tmp_path):
    """ADVICE r9: the NULL-id exclusion must be observable — the writer
    returns written/dropped counts (measured on the write job itself,
    no second scan) and warns when rows were dropped."""
    import warnings

    from solace_apache_beam_spark.sinks.warehouse import write_training_shards

    df = spark.range(50).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("doc_id"),
        (F.col("id") * 7).alias("payload"),
    )
    out = str(tmp_path / "shards_null")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        stats = write_training_shards(df, out, "doc_id", n_shards=4)
    assert stats == {"rows_written": 45, "rows_dropped_null_id": 5}
    assert any("dropped 5" in str(w.message) for w in caught)
    assert spark.read.parquet(out).count() == 45


def test_compact_epochs_preserves_rows(spark, tmp_path):
    """Compaction folds _epoch_id partitions into one equivalent
    sentinel partition: same rows, table stays epoch-partitioned so a
    live appender keeps working after compaction."""
    import os

    from solace_apache_beam_spark.sinks.warehouse import (
        COMPACTED_EPOCH,
        compact_epochs,
        make_idempotent_appender,
    )

    table = str(tmp_path / "tbl")
    appender = make_idempotent_appender(table)
    appender(spark.range(10).withColumnRenamed("id", "v"), 0)
    appender(spark.range(10, 25).withColumnRenamed("id", "v"), 1)
    assert spark.read.parquet(table).count() == 25

    # committed_through=1: both epochs are known durable -> all folded
    compact_epochs(spark, table, committed_through=1)
    back = spark.read.parquet(table)
    assert sorted(back.columns) == ["_epoch_id", "v"]
    assert sorted(r.v for r in back.collect()) == list(range(25))
    assert {r._epoch_id for r in back.collect()} == {COMPACTED_EPOCH}
    epoch_dirs = [d for d in os.listdir(table) if d.startswith("_epoch_id=")]
    assert epoch_dirs == [f"_epoch_id={COMPACTED_EPOCH}"]

    # the appender still works against the compacted table, and a
    # replayed epoch replaces only its own partition
    appender(spark.range(25, 30).withColumnRenamed("id", "v"), 7)
    appender(spark.range(25, 30).withColumnRenamed("id", "v"), 7)
    assert sorted(
        r.v for r in spark.read.parquet(table).collect()
    ) == list(range(30))


def test_compact_epochs_withholds_replayable_epoch(spark, tmp_path):
    """Without committed_through, the highest live epoch — the only one
    a sequentially-committing stream can still replay — stays its own
    partition, so a post-compaction replay REPLACES it instead of
    duplicating rows already folded into the sentinel."""
    import os

    from solace_apache_beam_spark.sinks.warehouse import (
        COMPACTED_EPOCH,
        compact_epochs,
        make_idempotent_appender,
    )

    table = str(tmp_path / "tbl")
    appender = make_idempotent_appender(table)
    appender(spark.range(10).withColumnRenamed("id", "v"), 0)
    appender(spark.range(10, 25).withColumnRenamed("id", "v"), 1)

    compact_epochs(spark, table)
    dirs = sorted(d for d in os.listdir(table) if d.startswith("_epoch_id="))
    assert dirs == [f"_epoch_id={COMPACTED_EPOCH}", "_epoch_id=1"]

    # epoch 1 replays (sink write survived, commit log didn't): the
    # overwrite replaces its partition — no duplicates
    appender(spark.range(10, 25).withColumnRenamed("id", "v"), 1)
    assert sorted(
        r.v for r in spark.read.parquet(table).collect()
    ) == list(range(25))

    # a second compaction folds the now-superseded epoch 1 once a newer
    # epoch exists
    appender(spark.range(25, 30).withColumnRenamed("id", "v"), 2)
    compact_epochs(spark, table)
    dirs = sorted(d for d in os.listdir(table) if d.startswith("_epoch_id="))
    assert dirs == [f"_epoch_id={COMPACTED_EPOCH}", "_epoch_id=2"]
    assert sorted(
        r.v for r in spark.read.parquet(table).collect()
    ) == list(range(30))


def test_compact_epochs_keeps_epochs_committed_during_compaction(
    spark, tmp_path, monkeypatch
):
    """An _epoch_id partition committed AFTER compaction snapshots the
    table but BEFORE the directory swap is carried into the compacted
    table, not destroyed with the backup (ADVICE r2)."""
    import os

    from solace_apache_beam_spark.sinks import warehouse
    from solace_apache_beam_spark.sinks.warehouse import (
        compact_epochs,
        make_idempotent_appender,
    )

    table = str(tmp_path / "tbl")
    appender = make_idempotent_appender(table)
    appender(spark.range(10).withColumnRenamed("id", "v"), 0)
    appender(spark.range(10, 25).withColumnRenamed("id", "v"), 1)

    # interleave: first rename call is the table->bak swap; append a
    # new epoch just before it happens (after the snapshot was taken)
    real_rename = os.rename
    fired = {"done": False}

    def rename_with_race(src, dst):
        if not fired["done"] and src == table:
            fired["done"] = True
            appender(spark.range(25, 40).withColumnRenamed("id", "v"), 2)
        real_rename(src, dst)

    monkeypatch.setattr(warehouse.os, "rename", rename_with_race)
    compact_epochs(spark, table)

    assert fired["done"]
    back = spark.read.parquet(table)
    assert sorted(r.v for r in back.collect()) == list(range(40))
    assert not os.path.exists(table + ".bak")


def test_write_training_shards_observation_fallback(spark, tmp_path, monkeypatch):
    """The stats must survive Observation.get failing (the known
    large-AQE-plan row-conversion issue): the fallback recomputes both
    counts from column-pruned id-only scans and reports identically."""
    import pyspark.sql.observation as obs_mod

    from solace_apache_beam_spark.sinks.warehouse import write_training_shards

    monkeypatch.setattr(
        obs_mod.Observation,
        "get",
        property(lambda self: (_ for _ in ()).throw(AssertionError("boom"))),
    )
    df = spark.range(40).select(
        F.when(F.col("id") % 8 == 0, None).otherwise(F.col("id")).alias("doc_id"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path / "shards_fb")
    # the dropped-null-id UserWarning is part of the contract — assert
    # it rather than letting it print (suite keeps a clean warning log)
    with pytest.warns(UserWarning, match="dropped 5 NULL-doc_id"):
        stats = write_training_shards(df, out, "doc_id", n_shards=2)
    assert stats == {"rows_written": 35, "rows_dropped_null_id": 5}
    assert spark.read.parquet(out).count() == 35
