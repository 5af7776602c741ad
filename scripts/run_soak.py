"""Streaming soak: drain N messages across K queues through the
windowed word-count pipeline and report sustained throughput plus full
delivery accounting.

The committed throughput contract is the >=1,000 msg/s floor test
(tests/test_streaming_source.py::test_streaming_throughput_floor); this
script is the heavier, re-runnable version of the round-3 ad-hoc soak
recorded in BASELINE.md — 100k messages, 4 queues, one JVM, local[32].

    python scripts/run_soak.py [n_messages] [n_queues]

--kill-restart (VERDICT r5 Next #7) combines the soak with the
restart-from-checkpoint contract at full scale: the drain runs in a
child process group that is SIGKILL'd (unclean — JVM included) mid-
drain after a few committed epochs, then a second process resumes from
the same checkpoint and drains to completion. The sink is the
idempotent per-epoch appender, so replayed epochs REPLACE their
partition and broker-replayed unacked messages appear as new-epoch
duplicates that payload-level dedup removes. Asserted conservation law
(SolaceIOLifecycleDataflowIT.java:349-350 is the reference contract):

    distinct payloads at sink == published   (zero loss, zero
                                              dupes-after-dedup)
    remaining backlog        == 0
    acked                    == published

    python scripts/run_soak.py 100000 4 --kill-restart
"""
from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solace_apache_beam_spark.sources import fake_broker


def _publish(broker: str, queues: list[str], per_q: int) -> None:
    for q in queues:
        fake_broker.create_queue(broker, q)
        fake_broker.publish(
            broker, q, [f"tok{i % 97} {q} msg {i}" for i in range(per_q)]
        )


def classic_soak(n: int, k: int) -> None:
    from solace_apache_beam_spark.session import get_spark
    from solace_apache_beam_spark.streaming.pipelines import (
        open_stream,
        windowed_word_count,
    )

    queues = [f"q{i}" for i in range(1, k + 1)]
    per_q = n // k
    work = tempfile.mkdtemp(prefix="soak_")
    broker = os.path.join(work, "broker")
    _publish(broker, queues, per_q)

    spark = get_spark("soak")
    stream = open_stream(spark, broker, queues)
    query = (
        windowed_word_count(stream)
        .writeStream.format("memory")
        .queryName("soak")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "cp"))
        .start()
    )
    t0 = time.monotonic()
    query.processAllAvailable()
    elapsed = time.monotonic() - t0
    query.stop()

    consumed = sum(fake_broker.delivered_watermark(broker, q) for q in queues)
    leaked = len(spark.sparkContext._jsc.getPersistentRDDs())
    out = {
        "messages": per_q * k,
        "queues": k,
        "drain_s": round(elapsed, 2),
        "msg_per_s": round(per_q * k / elapsed),
        "consumed": consumed,
        "cached_rdds_at_shutdown": leaked,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


def drain_phase(work: str, k: int, max_per_batch: int) -> None:
    """Child process: drain the broker through the idempotent appender
    until every message is delivered, then write a DONE marker. May be
    SIGKILL'd at any point — the checkpoint + per-epoch sink carry the
    state.

    processAllAvailable alone is NOT a full drain here: after an
    unclean restart the acked watermark lags the checkpoint's committed
    offset, and the capped latestOffset can momentarily report no
    growth — so we loop until the delivered watermark reaches the
    published count. Acks for epoch N land only when epoch N+1 is
    planned (deferred client-ack), so after the data drain we publish
    one uniquely-tagged __flush__ sentinel per queue: planning that
    final epoch finalizes every real message's ack. The orchestrator
    excludes __flush__ payloads from the accounting."""
    import uuid

    from solace_apache_beam_spark.session import get_spark
    from solace_apache_beam_spark.sinks.warehouse import make_idempotent_appender
    from solace_apache_beam_spark.streaming.pipelines import open_stream

    queues = [f"q{i}" for i in range(1, k + 1)]
    broker_dir = os.path.join(work, "broker")
    spark = get_spark("soak_phase")
    stream = open_stream(
        spark, broker_dir, queues, max_records_per_batch=max_per_batch
    )
    q = (
        stream.writeStream.foreachBatch(
            make_idempotent_appender(os.path.join(work, "sink"))
        )
        .option("checkpointLocation", os.path.join(work, "cp"))
        .start()
    )

    def _undelivered() -> int:
        return sum(
            fake_broker.message_count(broker_dir, qq)
            - fake_broker.delivered_watermark(broker_dir, qq)
            for qq in queues
        )

    t0 = time.monotonic()
    q.processAllAvailable()
    while _undelivered() > 0:
        time.sleep(0.1)
        q.processAllAvailable()
    tag = uuid.uuid4().hex[:8]
    for qq in queues:
        fake_broker.publish(broker_dir, qq, [f"__flush__ {qq} {tag}"])
    q.processAllAvailable()
    while _undelivered() > 0:
        time.sleep(0.1)
        q.processAllAvailable()
    elapsed = time.monotonic() - t0
    q.stop()
    with open(os.path.join(work, "DONE"), "w") as f:
        f.write(str(round(elapsed, 2)))


def stateful_drain_phase(work: str, k: int, max_per_batch: int) -> None:
    """Child process for the STATEFUL soak (VERDICT r8 Next #6): the
    graph carries applyInPandasWithState (running_counts — lifetime
    per-key count+bytes) between the source and the idempotent
    appender, so the SIGKILL lands on live state-store versions, not
    just source offsets. Same drain/flush discipline as drain_phase."""
    import uuid

    from solace_apache_beam_spark.session import get_spark
    from solace_apache_beam_spark.sinks.warehouse import make_idempotent_appender
    from solace_apache_beam_spark.streaming.pipelines import open_stream
    from solace_apache_beam_spark.streaming.stateful import running_counts

    queues = [f"q{i}" for i in range(1, k + 1)]
    broker_dir = os.path.join(work, "broker")
    spark = get_spark("soak_stateful_phase")
    stream = open_stream(
        spark, broker_dir, queues, max_records_per_batch=max_per_batch
    )
    q = (
        # dedupe_by=message_id: the source is at-least-once across an
        # unclean restart (broker replays delivered-but-unacked
        # messages — S4/S6), so raw counting overcounts by exactly the
        # redelivered batch; the hwm state skips redeliveries (the
        # 500k soak found this — see running_counts' docstring)
        running_counts(stream, dedupe_by="message_id")
        .writeStream.outputMode("update")
        .foreachBatch(make_idempotent_appender(os.path.join(work, "sink")))
        .option("checkpointLocation", os.path.join(work, "cp"))
        .start()
    )

    def _undelivered() -> int:
        return sum(
            fake_broker.message_count(broker_dir, qq)
            - fake_broker.delivered_watermark(broker_dir, qq)
            for qq in queues
        )

    t0 = time.monotonic()
    q.processAllAvailable()
    while _undelivered() > 0:
        time.sleep(0.1)
        q.processAllAvailable()
    tag = uuid.uuid4().hex[:8]
    for qq in queues:
        fake_broker.publish(broker_dir, qq, [f"__flush__ {qq} {tag}"])
    q.processAllAvailable()
    while _undelivered() > 0:
        time.sleep(0.1)
        q.processAllAvailable()
    elapsed = time.monotonic() - t0
    q.stop()
    with open(os.path.join(work, "DONE"), "w") as f:
        f.write(str(round(elapsed, 2)))


def stateful_kill_restart_soak(n: int, k: int) -> None:
    """Kill-restart soak THROUGH the stateful operator. The evidence is
    stronger than delivery conservation alone: the final per-key
    lifetime totals must EXACTLY equal the broker log's ground truth
    (message count and payload byte sum per queue) — an unclean kill
    that lost state would undercount, a replayed batch applied twice to
    restored state would overcount, and either breaks the equality."""
    queues = [f"q{i}" for i in range(1, k + 1)]
    per_q = n // k
    work = tempfile.mkdtemp(prefix="soak_st_")
    broker = os.path.join(work, "broker")
    _publish(broker, queues, per_q)
    sink = os.path.join(work, "sink")
    max_per_batch = max(1, per_q // 25)

    def _spawn() -> subprocess.Popen:
        return subprocess.Popen(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--phase-stateful",
                work,
                str(k),
                str(max_per_batch),
            ],
            start_new_session=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def _epochs() -> int:
        try:
            return len(
                [d for d in os.listdir(sink) if d.startswith("_epoch_id=")]
            )
        except FileNotFoundError:
            return 0

    t_all = time.monotonic()
    p1 = _spawn()
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if os.path.exists(os.path.join(work, "DONE")):
            raise SystemExit(
                "drain finished before the kill — lower max_per_batch"
            )
        if _epochs() >= 3:
            break
        time.sleep(0.2)
    epochs_at_kill = _epochs()
    os.killpg(os.getpgid(p1.pid), signal.SIGKILL)
    p1.wait()

    p2 = _spawn()
    rc = p2.wait(timeout=600)
    assert rc == 0, f"restart phase failed rc={rc}"
    assert os.path.exists(os.path.join(work, "DONE"))
    total_s = time.monotonic() - t_all

    # ground truth straight from the broker's message log (includes
    # whatever flush sentinels were actually published)
    expected: dict[str, tuple[int, int]] = {}
    for qq in queues:
        cnt = nbytes = 0
        with open(
            os.path.join(fake_broker.queue_dir(broker, qq), "messages.jsonl")
        ) as f:
            for line in f:
                p = json.loads(line)["payload"]
                cnt += 1
                nbytes += len((p or "").encode("utf-8"))
        expected[qq] = (cnt, nbytes)

    # the LATEST emitted row per key is the lifetime total (update-mode
    # emission; per-key rows are monotone in epoch)
    import duckdb

    rows = (
        duckdb.connect()
        .execute(
            f"""
        SELECT key, total_count, total_bytes FROM (
          SELECT *, row_number() OVER (
            PARTITION BY key ORDER BY _epoch_id DESC) AS rn
          FROM read_parquet('{sink}/*/*.parquet', hive_partitioning=1)
        ) WHERE rn = 1
        """
        )
        .fetchall()
    )
    got = {r[0]: (r[1], r[2]) for r in rows}
    acked = sum(fake_broker.acked_count(broker, q) for q in queues)
    out = {
        "mode": "stateful",
        "messages": per_q * k,
        "queues": k,
        "epochs_at_kill": epochs_at_kill,
        "per_key_totals_exact": got == expected,
        "acked": acked,
        "total_s": round(total_s, 2),
        "msg_per_s": round(per_q * k / total_s),
    }
    assert got == expected, f"state diverged: got={got} expected={expected}"
    for q in queues:
        a = fake_broker.acked_count(broker, q)
        assert a >= per_q, f"{q}: only {a}/{per_q} real messages acked"
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


# sessionize soak constants — the session structure IS the ground
# truth, so both the publisher and the verifier derive from these
_SESS_BASE_US = 1_700_000_000_000_000
_SESS_G = 50  # events per session
_SESS_JUMP_S = 130  # inter-session jump (> gap 30 -> in-batch split)


def _sess_ts_us(i: int) -> int:
    """Event-time of the i-th message in a queue's session stream:
    1 s apart within a session, a 130 s jump between sessions."""
    return _SESS_BASE_US + (i + (i // _SESS_G) * _SESS_JUMP_S) * 1_000_000


def _publish_sessions(broker: str, queues: list[str], per_q: int) -> None:
    for q in queues:
        fake_broker.create_queue(broker, q)
        fake_broker.publish(
            broker,
            q,
            [f"{q} msg {i}" for i in range(per_q)],
            sender_timestamp_us=[_sess_ts_us(i) for i in range(per_q)],
        )


def sessionize_drain_phase(work: str, k: int, max_per_batch: int) -> None:
    """Child process for the SESSIONIZE soak (round 10): the graph
    carries the EventTimeTimeout sessionizer with the per-(key,queue)
    hwm map, at the nonzero watermark delay where broker replay
    actually reaches live state (see sessionize's docstring). Closed
    sessions flow append-mode to the idempotent sink."""
    import uuid

    from solace_apache_beam_spark.session import get_spark
    from solace_apache_beam_spark.sinks.warehouse import make_idempotent_appender
    from solace_apache_beam_spark.streaming.pipelines import open_stream
    from solace_apache_beam_spark.streaming.stateful import sessionize

    queues = [f"q{i}" for i in range(1, k + 1)]
    broker_dir = os.path.join(work, "broker")
    spark = get_spark("soak_sessionize_phase")
    stream = open_stream(
        spark, broker_dir, queues, max_records_per_batch=max_per_batch
    )
    q = (
        sessionize(
            stream,
            gap_seconds=30,
            watermark="120 seconds",
            dedupe_by=("destination", "message_id"),
        )
        .writeStream.outputMode("append")
        .foreachBatch(make_idempotent_appender(os.path.join(work, "sink")))
        .option("checkpointLocation", os.path.join(work, "cp"))
        .start()
    )

    def _undelivered() -> int:
        return sum(
            fake_broker.message_count(broker_dir, qq)
            - fake_broker.delivered_watermark(broker_dir, qq)
            for qq in queues
        )

    t0 = time.monotonic()
    q.processAllAvailable()
    while _undelivered() > 0:
        time.sleep(0.1)
        q.processAllAvailable()
    # flush far beyond the last session: closes it via in-batch split
    # AND finalizes the last data epoch's deferred acks
    tag = uuid.uuid4().hex[:8]
    per_q_published = fake_broker.message_count(broker_dir, queues[0])
    flush_us = _sess_ts_us(per_q_published) + 10_000 * 1_000_000
    for qq in queues:
        fake_broker.publish(
            broker_dir,
            qq,
            [f"__flush__ {qq} {tag}"],
            sender_timestamp_us=[flush_us],
        )
    q.processAllAvailable()
    while _undelivered() > 0:
        time.sleep(0.1)
        q.processAllAvailable()
    elapsed = time.monotonic() - t0
    q.stop()
    with open(os.path.join(work, "DONE"), "w") as f:
        f.write(str(round(elapsed, 2)))


def sessionize_kill_restart_soak(n: int, k: int) -> None:
    """Kill-restart soak THROUGH the hwm sessionizer. The evidence is
    session-level exactness: every queue's closed sessions must EXACTLY
    match the arithmetic session partition of its published stream —
    same starts, same ends, same n_events, no duplicates, no misses.
    A replayed range applied to live state would inflate n_events or
    resurrect a closed session; lost state would drop or fragment one.
    Runs at watermark delay 120 s, where the engine's late-row filter
    does NOT absorb the replay (the realistic late-data setting)."""
    queues = [f"q{i}" for i in range(1, k + 1)]
    per_q = n // k
    work = tempfile.mkdtemp(prefix="soak_sess_")
    broker = os.path.join(work, "broker")
    _publish_sessions(broker, queues, per_q)
    sink = os.path.join(work, "sink")
    max_per_batch = max(1, per_q // 25)

    def _spawn() -> subprocess.Popen:
        return subprocess.Popen(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--phase-sessionize",
                work,
                str(k),
                str(max_per_batch),
            ],
            start_new_session=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def _epochs() -> int:
        try:
            return len(
                [d for d in os.listdir(sink) if d.startswith("_epoch_id=")]
            )
        except FileNotFoundError:
            return 0

    t_all = time.monotonic()
    p1 = _spawn()
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if os.path.exists(os.path.join(work, "DONE")):
            raise SystemExit(
                "drain finished before the kill — lower max_per_batch"
            )
        if _epochs() >= 3:
            break
        time.sleep(0.2)
    epochs_at_kill = _epochs()
    os.killpg(os.getpgid(p1.pid), signal.SIGKILL)
    p1.wait()

    p2 = _spawn()
    rc = p2.wait(timeout=600)
    assert rc == 0, f"restart phase failed rc={rc}"
    assert os.path.exists(os.path.join(work, "DONE"))
    total_s = time.monotonic() - t_all

    # expected closed sessions per queue, from the publishing arithmetic
    # (the flush closes the last real session; the flush's own
    # 1-event session stays open and must NOT appear at the sink)
    n_sessions = (per_q + _SESS_G - 1) // _SESS_G
    expected = set()
    for qq in queues:
        for s in range(n_sessions):
            lo, hi = s * _SESS_G, min((s + 1) * _SESS_G, per_q)
            expected.add(
                (qq, _sess_ts_us(lo), _sess_ts_us(hi - 1), hi - lo)
            )

    import duckdb

    rows = (
        duckdb.connect()
        .execute(
            f"""SELECT key, CAST(epoch_us(session_start) AS BIGINT),
                       CAST(epoch_us(session_end) AS BIGINT),
                       CAST(n_events AS BIGINT), count(*) AS emitted
                FROM read_parquet('{sink}/*/*.parquet', hive_partitioning=1)
                GROUP BY 1, 2, 3, 4"""
        )
        .fetchall()
    )
    got = {tuple(r[:4]) for r in rows}
    dupes = [r for r in rows if r[4] > 1]
    acked = sum(fake_broker.acked_count(broker, qq) for qq in queues)
    out = {
        "mode": "sessionize",
        "messages": per_q * k,
        "queues": k,
        "epochs_at_kill": epochs_at_kill,
        "sessions_expected": len(expected),
        "sessions_at_sink": len(got),
        "duplicate_rows": len(dupes),
        "sessions_exact": got == expected,
        "acked": acked,
        "total_s": round(total_s, 2),
        "msg_per_s": round(per_q * k / total_s),
    }
    assert not dupes, f"duplicate session emissions: {dupes[:3]}"
    assert got == expected, (
        f"sessions diverged: missing={list(expected - got)[:3]} "
        f"extra={list(got - expected)[:3]}"
    )
    for qq in queues:
        a = fake_broker.acked_count(broker, qq)
        assert a >= per_q, f"{qq}: only {a}/{per_q} real messages acked"
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


# funnel soak constants: every user's event-TYPE sequence is one of two
# fixed patterns cycled (user parity picks it), so the expected final
# stage is a pure function of the pattern — computable without
# replicating batching. Delivery is in (ts, id) order per user, where
# the online monotone machine EQUALS greedy earliest-match (the batch
# oracle), so the ground truth is batching-independent.
_FUNNEL_STAGES = ("view", "click", "purchase")
_PATTERN_ODD = ("view", "click", "noise", "purchase")  # completes: stage 3
_PATTERN_EVEN = ("click", "view", "noise", "view")  # stalls: stage 1


def _funnel_expected(pattern: tuple[str, ...]) -> int:
    stage = 0
    for t in pattern:
        if stage < len(_FUNNEL_STAGES) and t == _FUNNEL_STAGES[stage]:
            stage += 1
    return stage


def _publish_funnel(broker: str, queues: list[str], per_q: int, users: int) -> None:
    base_us = 1_700_000_000_000_000
    for q in queues:
        fake_broker.create_queue(broker, q)
        fake_broker.publish(
            broker,
            q,
            [
                f"{q}_u{i % users}:"
                f"{(_PATTERN_ODD if (i % users) % 2 else _PATTERN_EVEN)[(i // users) % 4]}"
                for i in range(per_q)
            ],
            sender_timestamp_us=[base_us + i * 1_000_000 for i in range(per_q)],
        )


def funnel_drain_phase(work: str, k: int, max_per_batch: int) -> None:
    """Child process for the FUNNEL soak (round 10): the per-user stage
    machine with the per-(key,queue) hwm map sits between the source
    and the idempotent sink, so the SIGKILL lands on live funnel state
    across ~10k users."""
    import uuid

    from pyspark.sql import functions as F

    from solace_apache_beam_spark.session import get_spark
    from solace_apache_beam_spark.sinks.warehouse import make_idempotent_appender
    from solace_apache_beam_spark.streaming.pipelines import open_stream
    from solace_apache_beam_spark.streaming.stateful import funnel_progress

    queues = [f"q{i}" for i in range(1, k + 1)]
    broker_dir = os.path.join(work, "broker")
    spark = get_spark("soak_funnel_phase")
    stream = open_stream(
        spark, broker_dir, queues, max_records_per_batch=max_per_batch
    ).select(
        F.split("payload", ":")[0].alias("user"),
        F.split("payload", ":")[1].alias("stage_name"),
        "event_time",
        "message_id",
        "destination",
    )
    q = (
        funnel_progress(
            stream,
            _FUNNEL_STAGES,
            key_col="user",
            dedupe_by=("destination", "message_id"),
        )
        .writeStream.outputMode("update")
        .foreachBatch(make_idempotent_appender(os.path.join(work, "sink")))
        .option("checkpointLocation", os.path.join(work, "cp"))
        .start()
    )

    def _undelivered() -> int:
        return sum(
            fake_broker.message_count(broker_dir, qq)
            - fake_broker.delivered_watermark(broker_dir, qq)
            for qq in queues
        )

    t0 = time.monotonic()
    q.processAllAvailable()
    while _undelivered() > 0:
        time.sleep(0.1)
        q.processAllAvailable()
    tag = uuid.uuid4().hex[:8]
    for qq in queues:
        fake_broker.publish(broker_dir, qq, [f"__flush__{qq}:{tag}"])
    q.processAllAvailable()
    while _undelivered() > 0:
        time.sleep(0.1)
        q.processAllAvailable()
    elapsed = time.monotonic() - t0
    q.stop()
    with open(os.path.join(work, "DONE"), "w") as f:
        f.write(str(round(elapsed, 2)))


def funnel_kill_restart_soak(n: int, k: int) -> None:
    """Kill-restart soak THROUGH the funnel stage machine. Ground truth
    is per-user exact: user parity picks the event-type pattern, so
    every odd user must finish at stage 3 and every even user at stage
    1 — a lost state version undercounts a stage, a replay-advanced
    straggler or double-applied batch overcounts one, and with HALF the
    population pinned below the top stage an overcount is visible (an
    all-users-complete design would hide it at the cap)."""
    queues = [f"q{i}" for i in range(1, k + 1)]
    per_q = n // k
    users = max(2, per_q // 8)  # 8 events/user: two full pattern cycles
    work = tempfile.mkdtemp(prefix="soak_fun_")
    broker = os.path.join(work, "broker")
    _publish_funnel(broker, queues, per_q, users)
    sink = os.path.join(work, "sink")
    max_per_batch = max(1, per_q // 25)

    def _spawn() -> subprocess.Popen:
        return subprocess.Popen(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--phase-funnel",
                work,
                str(k),
                str(max_per_batch),
            ],
            start_new_session=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def _epochs() -> int:
        try:
            return len(
                [d for d in os.listdir(sink) if d.startswith("_epoch_id=")]
            )
        except FileNotFoundError:
            return 0

    t_all = time.monotonic()
    p1 = _spawn()
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if os.path.exists(os.path.join(work, "DONE")):
            raise SystemExit(
                "drain finished before the kill — lower max_per_batch"
            )
        if _epochs() >= 3:
            break
        time.sleep(0.2)
    epochs_at_kill = _epochs()
    os.killpg(os.getpgid(p1.pid), signal.SIGKILL)
    p1.wait()

    p2 = _spawn()
    rc = p2.wait(timeout=600)
    assert rc == 0, f"restart phase failed rc={rc}"
    assert os.path.exists(os.path.join(work, "DONE"))
    total_s = time.monotonic() - t_all

    # a user's event-type sequence is the pattern CYCLED (8 events =
    # 2 cycles), and later cycles can legitimately advance the machine
    # (the even pattern's second-cycle "click" follows a first-cycle
    # "view" -> stage 2) — replay the FULL sequence, not one cycle
    cycles = (per_q // users) // len(_PATTERN_ODD)
    exp_odd = _funnel_expected(_PATTERN_ODD * cycles)
    exp_even = _funnel_expected(_PATTERN_EVEN * cycles)
    assert exp_even < len(_FUNNEL_STAGES), (
        "ground-truth design: half the population must sit below the "
        "top stage or an overcount is invisible at the cap"
    )
    expected = {
        f"{q}_u{i}": (exp_odd if i % 2 else exp_even)
        for q in queues
        for i in range(users)
    }

    import duckdb

    rows = (
        duckdb.connect()
        .execute(
            f"""SELECT key, max(stage_reached)
                FROM read_parquet('{sink}/*/*.parquet', hive_partitioning=1)
                WHERE key NOT LIKE '__flush__%'
                GROUP BY key"""
        )
        .fetchall()
    )
    got = {r[0]: r[1] for r in rows}
    acked = sum(fake_broker.acked_count(broker, qq) for qq in queues)
    diverged = {
        u: (got.get(u), expected[u])
        for u in expected
        if got.get(u) != expected[u]
    }
    out = {
        "mode": "funnel",
        "messages": per_q * k,
        "queues": k,
        "users": users * k,
        "epochs_at_kill": epochs_at_kill,
        "stages_exact": not diverged,
        "n_diverged": len(diverged),
        "acked": acked,
        "total_s": round(total_s, 2),
        "msg_per_s": round(per_q * k / total_s),
    }
    assert not diverged, f"funnel diverged for {len(diverged)} users: " + str(
        dict(list(diverged.items())[:3])
    )
    for qq in queues:
        a = fake_broker.acked_count(broker, qq)
        assert a >= per_q, f"{qq}: only {a}/{per_q} real messages acked"
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


def kill_restart_soak(n: int, k: int) -> None:
    queues = [f"q{i}" for i in range(1, k + 1)]
    per_q = n // k
    work = tempfile.mkdtemp(prefix="soak_kr_")
    broker = os.path.join(work, "broker")
    _publish(broker, queues, per_q)
    sink = os.path.join(work, "sink")
    # ~25 epochs total: enough staggering that the kill lands mid-drain
    max_per_batch = max(1, per_q // 25)

    def _spawn() -> subprocess.Popen:
        return subprocess.Popen(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--phase",
                work,
                str(k),
                str(max_per_batch),
            ],
            start_new_session=True,  # own process group: the SIGKILL
            # must take the JVM down with the Python driver (a clean
            # JVM shutdown would be a polite stop, not a crash)
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def _epochs() -> int:
        try:
            return len(
                [d for d in os.listdir(sink) if d.startswith("_epoch_id=")]
            )
        except FileNotFoundError:
            return 0

    t_all = time.monotonic()
    p1 = _spawn()
    # kill once a few epochs are committed but the drain is not done
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if os.path.exists(os.path.join(work, "DONE")):
            raise SystemExit(
                "drain finished before the kill — lower max_per_batch"
            )
        if _epochs() >= 3:
            break
        time.sleep(0.2)
    epochs_at_kill = _epochs()
    os.killpg(os.getpgid(p1.pid), signal.SIGKILL)
    p1.wait()

    p2 = _spawn()
    rc = p2.wait(timeout=600)
    assert rc == 0, f"restart phase failed rc={rc}"
    assert os.path.exists(os.path.join(work, "DONE"))
    total_s = time.monotonic() - t_all

    # conservation accounting — pure-Python broker state + duckdb sink
    # read, no Spark in the orchestrator (pyarrow dataset discovery
    # would skip the `_epoch_id=N` dirs: underscore prefix = metadata)
    import duckdb

    payloads = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT payload FROM read_parquet('{sink}/*/*.parquet')")
        .fetchall()
    ]
    real = [p for p in payloads if not p.startswith("__flush__")]
    published = {
        f"tok{i % 97} {q} msg {i}" for q in queues for i in range(per_q)
    }
    distinct = set(real)
    acked = sum(fake_broker.acked_count(broker, q) for q in queues)
    delivered = sum(
        fake_broker.delivered_watermark(broker, q) for q in queues
    )
    total_published = sum(
        fake_broker.message_count(broker, q) for q in queues
    )  # includes the k flush sentinels
    out = {
        "messages": per_q * k,
        "queues": k,
        "epochs_at_kill": epochs_at_kill,
        "rows_at_sink": len(real),
        "distinct_payloads": len(distinct),
        "replay_duplicates": len(real) - len(distinct),
        "acked": acked,
        "delivered": delivered,
        "total_s": round(total_s, 2),
    }
    # the conservation law (SolaceIOLifecycleDataflowIT.java:349-350):
    # zero loss, zero invention, zero dupes-after-dedup; every real
    # message delivered AND acked (only the final flush-sentinel epoch
    # may still await its deferred ack)
    assert distinct == published, (
        f"loss or invention: {len(distinct)} distinct vs "
        f"{len(published)} published"
    )
    assert delivered == total_published, (
        f"not drained: delivered {delivered} of {total_published}"
    )
    for q in queues:
        a = fake_broker.acked_count(broker, q)
        assert a >= per_q, f"{q}: only {a}/{per_q} real messages acked"
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


def main() -> None:
    if "--phase" in sys.argv:
        i = sys.argv.index("--phase")
        drain_phase(sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3]))
        return
    if "--phase-stateful" in sys.argv:
        i = sys.argv.index("--phase-stateful")
        stateful_drain_phase(
            sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3])
        )
        return
    if "--phase-sessionize" in sys.argv:
        i = sys.argv.index("--phase-sessionize")
        sessionize_drain_phase(
            sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3])
        )
        return
    if "--phase-funnel" in sys.argv:
        i = sys.argv.index("--phase-funnel")
        funnel_drain_phase(
            sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3])
        )
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 100_000
    k = int(args[1]) if len(args) > 1 else 4
    if "--stateful" in sys.argv:
        stateful_kill_restart_soak(n, k)
    elif "--sessionize" in sys.argv:
        sessionize_kill_restart_soak(n, k)
    elif "--funnel" in sys.argv:
        funnel_kill_restart_soak(n, k)
    elif "--kill-restart" in sys.argv:
        kill_restart_soak(n, k)
    else:
        classic_soak(n, k)


if __name__ == "__main__":
    main()
