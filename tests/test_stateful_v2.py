"""transformWithState (state API v2) twin of the stateful operators —
same contracts as test_stateful.py's running_counts tests, on the new
primitives (typed ValueState + native MapState for the replay marks).

Requires the RocksDB state store provider; each test sets it on the
shared session and restores the previous value, so the rest of the
suite keeps the default provider.

The v2 Python runner needs google.protobuf (its state-server protocol).
conftest.py activates the repo's pure-python wire shim (vendor/pbshim)
when the real wheel is absent — so these tests RUN in this container;
the skip below only fires if neither the real runtime nor the shim can
import (an environment the repo doesn't claim)."""

from __future__ import annotations

from contextlib import contextmanager

import pytest

try:  # real wheel or the conftest-activated vendor/pbshim
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _HAVE_PROTOBUF = True
except ImportError:
    _HAVE_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAVE_PROTOBUF,
    reason="transformWithState runner needs google.protobuf and neither "
    "the real runtime nor vendor/pbshim could import",
)

from solace_apache_beam_spark.sources import fake_broker
from solace_apache_beam_spark.streaming.pipelines import open_stream
from solace_apache_beam_spark.streaming.stateful_v2 import (
    ROCKSDB_PROVIDER,
    running_counts_tws,
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@contextmanager
def rocksdb_provider(spark):
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)


@pytest.fixture()
def broker(tmp_path):
    broker_dir = str(tmp_path / "broker")
    for q in ("q1", "q2"):
        fake_broker.create_queue(broker_dir, q)
    return broker_dir


def test_tws_running_counts_accumulate_across_batches(spark, broker, tmp_path):
    """ValueState persists across microbatches — the v2 twin of the
    applyInPandasWithState accumulation test, byte-identical totals."""
    fake_broker.publish(broker, "q1", ["aa", "bbb"])
    fake_broker.publish(broker, "q2", ["cccc"])
    with rocksdb_provider(spark):
        stream = open_stream(spark, broker, ["q1", "q2"])
        q = (
            running_counts_tws(stream)
            .writeStream.format("memory")
            .queryName("rcounts_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .start()
        )
        q.processAllAvailable()
        fake_broker.publish(broker, "q1", ["ddddd"])
        q.processAllAvailable()
        q.stop()
    rows = spark.sql(
        "SELECT key, max(total_count) c, max(total_bytes) b"
        " FROM rcounts_tws GROUP BY key"
    ).collect()
    got = {r.key: (r.c, r.b) for r in rows}
    assert got["q1"] == (3, 10)
    assert got["q2"] == (1, 4)


def test_tws_running_counts_dedupe_survives_ack_lag_replay(
    spark, broker, tmp_path
):
    """The v1 replay recipe on v2 state: 12 messages drain in 4-message
    epochs, acks rewound to 4, restart from the same checkpoint — the
    redelivered committed-but-unacked range must be dropped by the
    MapState marks (raw mode overcounts, pinning the at-least-once
    semantic the marks exist for)."""
    import os as _os
    import time

    import duckdb

    from solace_apache_beam_spark.sinks.warehouse import make_idempotent_appender

    def run_once(cp, sink, queue, **kw):
        with rocksdb_provider(spark):
            stream = open_stream(
                spark, broker, [queue], max_records_per_batch=4
            )
            q = (
                running_counts_tws(stream, **kw)
                .writeStream.foreachBatch(make_idempotent_appender(sink))
                .outputMode("update")
                .option("checkpointLocation", cp)
                .start()
            )
            for _ in range(8):
                q.processAllAvailable()
                time.sleep(0.05)
            q.stop()

    def totals(sink):
        rows = duckdb.connect().execute(
            f"""SELECT key, max(total_count), max(total_bytes)
                FROM read_parquet('{sink}/*/*.parquet', hive_partitioning=1)
                GROUP BY key"""
        ).fetchall()
        return {r[0]: (r[1], r[2]) for r in rows}

    for mode, queue, kw in (
        ("raw", "q1", {}),
        ("hwm", "q2", {"dedupe_by": ("destination", "message_id")}),
    ):
        fake_broker.publish(broker, queue, [f"m{i}" for i in range(12)])
        cp = str(tmp_path / f"cp_{mode}")
        sink = str(tmp_path / f"sink_{mode}")
        run_once(cp, sink, queue, **kw)
        with open(
            _os.path.join(fake_broker.queue_dir(broker, queue), "acked"), "w"
        ) as f:
            f.write("4")
        run_once(cp, sink, queue, **kw)
        got = totals(sink)[queue]
        if mode == "raw":
            assert got[0] > 12, f"expected replay overcount, got {got}"
        else:
            assert got == (12, 26), f"MapState marks diverged: {got}"


def test_tws_sessionize_emits_on_watermark_close(spark, broker, tmp_path):
    """v2 timer path: the session closes when the watermark (advanced
    by later events on another key) passes last_event + gap and the
    registered event-time timer fires — the v2 twin of
    test_sessionize_emits_on_watermark_close, byte-identical bounds."""
    from solace_apache_beam_spark.streaming.stateful_v2 import sessionize_tws

    base_us = 1_700_000_000_000_000
    fake_broker.publish(
        broker,
        "q1",
        ["a", "b", "c"],
        sender_timestamp_us=[base_us, base_us + 1_000_000, base_us + 2_000_000],
    )
    with rocksdb_provider(spark):
        stream = open_stream(spark, broker, ["q1", "q2"])
        q = (
            sessionize_tws(stream, gap_seconds=30)
            .writeStream.format("memory")
            .queryName("sessions_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp_tws"))
            .start()
        )
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM sessions_tws").count() == 0
        fake_broker.publish(
            broker, "q2", ["later"], sender_timestamp_us=base_us + 3_600_000_000
        )
        q.processAllAvailable()
        fake_broker.publish(
            broker, "q2", ["later2"], sender_timestamp_us=base_us + 3_601_000_000
        )
        q.processAllAvailable()
        q.stop()
    rows = spark.sql(
        "SELECT key, session_start, session_end, n_events FROM sessions_tws"
        " WHERE key = 'q1'"
    ).collect()
    assert len(rows) == 1
    assert rows[0].n_events == 3
    assert (rows[0].session_end - rows[0].session_start).total_seconds() == 2.0


def test_tws_sessionize_differential_vs_v1(spark, broker, tmp_path):
    """The v1 and v2 sessionizers must emit IDENTICAL closed-session
    sets from the same broker log — bursts that split in-batch, a
    cross-batch extension, and a far-future closer event."""
    from solace_apache_beam_spark.streaming.stateful import sessionize
    from solace_apache_beam_spark.streaming.stateful_v2 import sessionize_tws

    base_us = 1_700_000_000_000_000
    hour = 3_600_000_000
    # each engine gets its OWN broker dir: the source acks on commit,
    # so a second run over one broker would read an empty queue
    brokers = {}
    for eng in ("v1", "v2"):
        bdir = str(tmp_path / f"broker_{eng}")
        for queue in ("q1", "q2"):
            fake_broker.create_queue(bdir, queue)
            fake_broker.publish(
                bdir,
                queue,
                ["a", "b", "c", "d", "e"],
                sender_timestamp_us=[
                    base_us,
                    base_us + 1_000_000,
                    base_us + hour,
                    base_us + hour + 2_000_000,
                    base_us + 2 * hour,
                ],
            )
        brokers[eng] = bdir

    def run(name, factory, use_rocks, bdir):
        import contextlib

        ctx = rocksdb_provider(spark) if use_rocks else contextlib.nullcontext()
        with ctx:
            stream = open_stream(spark, bdir, ["q1", "q2"])
            q = (
                factory(stream, gap_seconds=30)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / f"cp_{name}"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
        return sorted(
            (r.key, r.session_start, r.session_end, r.n_events)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )

    v1 = run("diff_v1", sessionize, False, brokers["v1"])
    v2 = run("diff_v2", sessionize_tws, True, brokers["v2"])
    assert v1 == v2
    assert len(v1) == 4  # two closed bursts per queue; the last stays open


def test_tws_sessionize_dedupe_survives_ack_lag_replay(spark, broker, tmp_path):
    """The v1 replay recipe on the v2 timer path: acks rewound to 4,
    restart from the same checkpoint, watermark delay 120 s so replayed
    events reach live state — raw mode inflates the closed session to
    16 events, MapState marks keep it exact at 12 (the same contract as
    test_sessionize_dedupe_by_survives_ack_lag_replay)."""
    import os as _os
    import time

    import duckdb

    from solace_apache_beam_spark.sinks.warehouse import make_idempotent_appender
    from solace_apache_beam_spark.streaming.stateful_v2 import sessionize_tws

    base_us = 1_700_000_000_000_000

    def run_once(cp, sink, queue, **kw):
        with rocksdb_provider(spark):
            stream = open_stream(spark, broker, [queue], max_records_per_batch=4)
            q = (
                sessionize_tws(
                    stream, gap_seconds=30, watermark="120 seconds", **kw
                )
                .writeStream.foreachBatch(make_idempotent_appender(sink))
                .outputMode("append")
                .option("checkpointLocation", cp)
                .start()
            )
            for _ in range(8):
                q.processAllAvailable()
                time.sleep(0.05)
            q.stop()

    def closed_counts(sink):
        rows = duckdb.connect().execute(
            f"""SELECT n_events FROM
                read_parquet('{sink}/*/*.parquet', hive_partitioning=1)
                ORDER BY session_start"""
        ).fetchall()
        return [r[0] for r in rows]

    for mode, queue, kw in (
        ("raw", "q1", {}),
        ("hwm", "q2", {"dedupe_by": ("destination", "message_id")}),
    ):
        fake_broker.publish(
            broker,
            queue,
            [f"m{i}" for i in range(12)],
            sender_timestamp_us=[base_us + i * 1_000_000 for i in range(12)],
        )
        cp = str(tmp_path / f"cp_tws_{mode}")
        sink = str(tmp_path / f"sink_tws_{mode}")
        run_once(cp, sink, queue, **kw)
        with open(
            _os.path.join(fake_broker.queue_dir(broker, queue), "acked"), "w"
        ) as f:
            f.write("4")
        fake_broker.publish(
            broker, queue, ["z"], sender_timestamp_us=[base_us + 100_000_000]
        )
        run_once(cp, sink, queue, **kw)
        got = closed_counts(sink)
        if mode == "raw":
            assert got == [16], f"expected raw replay overcount, got {got}"
        else:
            assert got == [12], f"MapState marks diverged: {got}"


def test_tws_funnel_differential_vs_v1(spark, broker, tmp_path):
    """v1 and v2 funnels must report IDENTICAL final stages per user
    from the same event log — in-order completion, out-of-order stage
    skipped, same-ts tie broken by id, cross-batch advance."""
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.streaming.stateful import funnel_progress
    from solace_apache_beam_spark.streaming.stateful_v2 import (
        funnel_progress_tws,
    )

    base_us = 1_700_000_000_000_000
    events = [
        ("u1:view", base_us),
        ("u1:click", base_us + 1_000_000),
        ("u2:click", base_us + 2_000_000),  # out of order: no advance
        ("u1:purchase", base_us + 3_000_000),
        ("u2:view", base_us + 4_000_000),
        ("u3:view", base_us + 5_000_000),
        ("u3:click", base_us + 5_000_000),  # same ts, later id -> counts
    ]
    brokers = {}
    for eng in ("v1", "v2"):
        bdir = str(tmp_path / f"broker_{eng}")
        fake_broker.create_queue(bdir, "q1")
        fake_broker.publish(
            bdir,
            "q1",
            [p for p, _ in events],
            sender_timestamp_us=[t for _, t in events],
        )
        brokers[eng] = bdir

    def run(name, factory, use_rocks, bdir):
        import contextlib

        ctx = rocksdb_provider(spark) if use_rocks else contextlib.nullcontext()
        with ctx:
            stream = open_stream(spark, bdir, ["q1"]).select(
                F.split("payload", ":")[0].alias("user"),
                F.split("payload", ":")[1].alias("stage_name"),
                "event_time",
                "message_id",
            )
            q = (
                factory(stream, ("view", "click", "purchase"), key_col="user")
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / f"cp_{name}"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
        return {
            r.key: r.s
            for r in spark.sql(
                f"SELECT key, max(stage_reached) s FROM {name} GROUP BY key"
            ).collect()
        }

    v1 = run("fdiff_v1", funnel_progress, False, brokers["v1"])
    v2 = run("fdiff_v2", funnel_progress_tws, True, brokers["v2"])
    assert v1 == v2 == {"u1": 3, "u2": 1, "u3": 2}


def test_tws_funnel_dedupe_survives_ack_lag_replay(spark, broker, tmp_path):
    """The v1 out-of-order replay corner on the v2 machine (the
    test_funnel_progress_replay_semantics anatomy): delivery order
    view@t2 (stage 1), purchase@t9 (skipped — click expected),
    click@t5 (stage 2, frontier t5). After an ack rewind the replayed
    suffix re-delivers purchase@t9, now the expected type above the
    frontier — the raw machine advances to 3 (the documented
    divergence), while MapState marks drop the replayed event and the
    machine holds at 2."""
    import os as _os
    import time

    import duckdb

    from pyspark.sql import functions as F

    from solace_apache_beam_spark.sinks.warehouse import make_idempotent_appender
    from solace_apache_beam_spark.streaming.stateful_v2 import (
        funnel_progress_tws,
    )

    base_us = 1_700_000_000_000_000

    def run_once(cp, sink, queue, **kw):
        with rocksdb_provider(spark):
            stream = open_stream(
                spark, broker, [queue], max_records_per_batch=1
            ).select(
                "destination",
                F.split("payload", ":")[0].alias("user"),
                F.split("payload", ":")[1].alias("stage_name"),
                "event_time",
                "message_id",
            )
            q = (
                funnel_progress_tws(
                    stream,
                    ("view", "click", "purchase"),
                    key_col="user",
                    **kw,
                )
                .writeStream.foreachBatch(make_idempotent_appender(sink))
                .outputMode("update")
                .option("checkpointLocation", cp)
                .start()
            )
            for _ in range(8):
                q.processAllAvailable()
                time.sleep(0.05)
            q.stop()

    def stages(sink):
        rows = duckdb.connect().execute(
            f"""SELECT key, max(stage_reached) FROM
                read_parquet('{sink}/*/*.parquet', hive_partitioning=1)
                GROUP BY key"""
        ).fetchall()
        return dict(rows)

    for mode, queue, kw in (
        ("raw", "q1", {}),
        ("hwm", "q2", {"dedupe_by": ("destination", "message_id")}),
    ):
        cp = str(tmp_path / f"cp_ftws_{mode}")
        sink = str(tmp_path / f"sink_ftws_{mode}")
        # one event per drain: each lands in its own committed epoch,
        # so the straggler sits in the replayed suffix after rewind
        for payload, ts in (
            ("u2:view", base_us + 2_000_000),
            ("u2:purchase", base_us + 9_000_000),
            ("u2:click", base_us + 5_000_000),
        ):
            fake_broker.publish(
                broker, queue, [payload], sender_timestamp_us=[ts]
            )
            run_once(cp, sink, queue, **kw)
        assert stages(sink)["u2"] == 2, f"{mode}: setup expectation"
        with open(
            _os.path.join(fake_broker.queue_dir(broker, queue), "acked"), "w"
        ) as f:
            f.write("0")
        run_once(cp, sink, queue, **kw)
        got = stages(sink)["u2"]
        if mode == "raw":
            assert got == 3, f"expected the raw replay divergence, got {got}"
        else:
            assert got == 2, f"MapState marks diverged: {got}"
