"""Pins for the round-7 full-package hardening review: broker offset
safety under concurrent/partial appends, empty-input expectation
reports, crash-recoverable epoch compaction, honest metric totals, and
the multi-queue dedup default."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from solace_apache_beam_spark.sources import fake_broker


@pytest.fixture()
def broker(tmp_path):
    broker_dir = str(tmp_path / "broker")
    for q in ("q1", "q2"):
        fake_broker.create_queue(broker_dir, q)
    return broker_dir


def test_partial_tail_is_not_a_message(broker):
    """A non-newline-terminated tail (a concurrent publisher's
    buffered write caught mid-flush, or a crashed append) must be
    INVISIBLE to message_count — counting it would admit an in-flight
    record into the offset range, deliver it as poison, and ack past
    it, losing the publish. It becomes a (sealed, poison) record only
    when the next publish seals it."""
    fake_broker.publish(broker, "q1", ["a", "b"])
    assert fake_broker.message_count(broker, "q1") == 2

    msg_path = os.path.join(fake_broker.queue_dir(broker, "q1"), "messages.jsonl")
    with open(msg_path, "a") as f:
        f.write('{"message_id": 2, "payl')  # torn: no newline
    assert fake_broker.message_count(broker, "q1") == 2  # still 2
    assert fake_broker.backlog_messages(broker, "q1") == 2

    # the next publish seals the torn tail as its own poison record,
    # keeping record i == line i alignment
    fake_broker.publish(broker, "q1", ["c"])
    assert fake_broker.message_count(broker, "q1") == 4
    msgs = fake_broker.read_messages(broker, "q1", 2, 4)
    assert msgs[0]["properties"].get("corrupt") == "true"
    assert msgs[1]["payload"] == "c"


def test_message_count_recount_after_recreate(tmp_path):
    """The incremental per-process line counter must not serve stale
    counts when a queue is deleted and recreated at the SAME path
    (fresh test dirs) — the inode guard forces a recount."""
    broker_dir = str(tmp_path / "broker")
    fake_broker.create_queue(broker_dir, "q1")
    fake_broker.publish(broker_dir, "q1", ["a", "b", "c"])
    assert fake_broker.message_count(broker_dir, "q1") == 3
    shutil.rmtree(broker_dir)
    fake_broker.create_queue(broker_dir, "q1")
    fake_broker.publish(broker_dir, "q1", ["x"])
    assert fake_broker.message_count(broker_dir, "q1") == 1


def test_message_count_recount_after_inode_reuse(tmp_path):
    """ADVICE r7: on Linux a deleted-and-recreated log can REUSE the
    freed inode, and once the new file reaches the cached offset the
    inode+size guard alone would serve a count mixing generations. The
    byte-at-offset generation check (the cached offset must sit one
    byte past a newline) forces the recount. Simulated by rewriting
    the SAME file in place (st_ino trivially unchanged) with content
    whose byte at the cached offset - 1 is not a newline."""
    broker_dir = str(tmp_path / "broker")
    fake_broker.create_queue(broker_dir, "q1")
    fake_broker.publish(broker_dir, "q1", ["aa", "bb", "cc"])
    assert fake_broker.message_count(broker_dir, "q1") == 3
    path = os.path.join(
        fake_broker.queue_dir(broker_dir, "q1"), "messages.jsonl"
    )
    cached_off = os.path.getsize(path)
    # a "new generation" long enough to reach past the cached offset,
    # with a record boundary that does NOT line up with the old one
    with open(path, "wb") as f:
        f.write(b"{" + b"x" * (cached_off - 1) + b"}\n")
        f.write(json.dumps({"message_id": 1, "payload": "y"}).encode() + b"\n")
    assert fake_broker.message_count(broker_dir, "q1") == 2


def test_read_messages_survives_invalid_utf8_tail(tmp_path):
    """ADVICE r7: a sealed torn line containing invalid UTF-8 (an
    EXTERNAL writer crashed mid-append; publish itself is
    ensure_ascii) must surface as a poison record through
    read_messages — the text-mode read path used to raise
    UnicodeDecodeError before json parsing could even run, crashing
    exactly the poison-record path _rebuild_bytes_idx_unlocked
    already survives."""
    broker_dir = str(tmp_path / "broker")
    fake_broker.create_queue(broker_dir, "q1")
    fake_broker.publish(broker_dir, "q1", ["good"])
    path = os.path.join(
        fake_broker.queue_dir(broker_dir, "q1"), "messages.jsonl"
    )
    with open(path, "ab") as f:
        f.write(b"\xff\xfe{torn\n")  # sealed torn garbage, bad UTF-8
    fake_broker.publish(broker_dir, "q1", ["after"])
    msgs = fake_broker.read_messages(broker_dir, "q1", 0, 3)
    assert [m["payload"] for m in msgs] == ["good", None, "after"]
    assert msgs[1]["properties"].get("corrupt") == "true"


def test_admissible_end_matches_reference_scan(broker):
    """The single-contiguous-read bisect must return exactly what the
    retired per-offset loop did, across starts/limits/budgets."""
    payloads = ["x" * n for n in (5, 1, 40, 0, 7, 7, 100, 3, 9, 2)]
    fake_broker.publish(broker, "q2", payloads)
    qdir = fake_broker.queue_dir(broker, "q2")
    idx_path = os.path.join(qdir, "bytes.idx")

    def reference(start, limit, max_bytes):
        base = fake_broker._last_cumsum(idx_path, start)
        end = start
        while end < limit:
            if (
                end > start
                and fake_broker._last_cumsum(idx_path, end + 1) - base > max_bytes
            ):
                break
            end += 1
        return end

    n = len(payloads)
    for start in range(n):
        for limit in (start, start + 1, start + 3, n):
            if limit > n:
                continue
            for max_bytes in (0, 1, 8, 50, 10_000):
                got = fake_broker.admissible_end(
                    broker, "q2", start, limit, max_bytes
                )
                assert got == reference(start, limit, max_bytes), (
                    start,
                    limit,
                    max_bytes,
                )


def test_expectation_report_empty_input_passes(spark):
    """SUM over zero rows is NULL in SQL: an empty input drop must
    report 0 violations / passed=True for every rule (both the
    predicate branch and the uniqueness branch), never NULL — a gate
    filtering on the boolean would otherwise see the drop as neither
    accepted nor rejected."""
    from solace_apache_beam_spark.functions.expectations import (
        expectation_report,
    )

    df = spark.createDataFrame([], "a long, b string")
    rows = {
        r.rule: r
        for r in expectation_report(
            df,
            {"a_not_null": F.col("a").isNull()},
            unique_keys={"a_unique": ["a"]},
        ).collect()
    }
    for rule in ("a_not_null", "a_unique"):
        assert rows[rule].n_rows == 0
        assert rows[rule].n_violations == 0
        assert rows[rule].passed is True


def test_progress_totals_keep_boolean_flags(spark):
    """isinstance(True, int) is True: boolean observed metrics must
    keep the latest value, never accumulate into a growing integer."""
    from solace_apache_beam_spark.streaming.metrics import ProgressCollector

    pc = ProgressCollector()
    for n in (2, 3):
        pc.batches.append(
            {
                "name": "x",
                "batch_id": n,
                "num_input_rows": 1,
                "observed": {"o": {"saw_null": True, "n": n}},
            }
        )
    t = pc.totals("x")
    assert t["observed"]["o"]["saw_null"] is True
    assert t["observed"]["o"]["n"] == 5


def _mk_epoch_table(spark, appender, n_epochs=3, rows_per=4):
    for e in range(n_epochs):
        df = spark.range(e * rows_per, (e + 1) * rows_per).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        appender(df, e)


def test_compact_recovers_from_crash_between_renames(spark, tmp_path):
    """Crash window: the old table was moved to .bak but the compacted
    data never moved in — the published path is ABSENT. The next
    compact_epochs call must restore the backup and complete a fresh
    compaction, preserving every row."""
    from solace_apache_beam_spark.sinks.warehouse import (
        compact_epochs,
        make_idempotent_appender,
    )

    table = str(tmp_path / "tbl")
    _mk_epoch_table(spark, make_idempotent_appender(table))
    expected = sorted(
        (r.id, r.v) for r in spark.read.parquet(table).select("id", "v").collect()
    )

    # simulate the crash: table aside, manifest present, no new table
    os.rename(table, table + ".bak")
    with open(table + ".compact.json", "w") as f:
        json.dump({"foldable": [], "tmp": str(tmp_path / "gone")}, f)

    compact_epochs(spark, table)
    got = sorted(
        (r.id, r.v) for r in spark.read.parquet(table).select("id", "v").collect()
    )
    assert got == expected
    assert not os.path.exists(table + ".bak")
    assert not os.path.exists(table + ".compact.json")


def test_compact_recovers_mid_carryover_and_rejects_unknown_bak(spark, tmp_path):
    """Crash window: the swap finished but late-epoch carry-over
    didn't — the manifest says which epochs were folded, so recovery
    moves ONLY the late dirs over (folded ones would duplicate rows)
    and drops the backup. A .bak with NO manifest is not safely
    resolvable and must raise, not guess."""
    from solace_apache_beam_spark.sinks.warehouse import (
        compact_epochs,
        make_idempotent_appender,
    )

    table = str(tmp_path / "tbl")
    _mk_epoch_table(spark, make_idempotent_appender(table))
    compact_epochs(spark, table, committed_through=2)
    n_before = spark.read.parquet(table).count()

    # simulate: a late epoch dir stranded in .bak plus an already-
    # folded epoch dir that must NOT come back
    bak = table + ".bak"
    os.makedirs(bak)
    folded_src = os.path.join(table, "_epoch_id=-1")
    shutil.copytree(folded_src, os.path.join(bak, "_epoch_id=0"))
    shutil.copytree(folded_src, os.path.join(bak, "_epoch_id=77"))
    with open(table + ".compact.json", "w") as f:
        json.dump({"foldable": ["_epoch_id=0"], "tmp": str(tmp_path / "gone")}, f)

    compact_epochs(spark, table)  # recovery runs at entry
    assert os.path.isdir(os.path.join(table, "_epoch_id=77"))
    assert not os.path.exists(bak)
    assert spark.read.parquet(table).count() == n_before * 2  # 77 == copy of fold

    # no-manifest case: fail loudly
    os.makedirs(os.path.join(bak, "_epoch_id=5"))
    with pytest.raises(RuntimeError, match="manifest"):
        compact_epochs(spark, table)
    shutil.rmtree(bak)


def test_dedup_stream_default_key_is_queue_scoped(spark, broker, tmp_path):
    """message_id is only unique PER QUEUE: the default dedup key must
    include the destination, or two distinct messages with id 0 on
    different queues collapse to one."""
    from solace_apache_beam_spark.streaming.pipelines import (
        dedup_stream,
        open_stream,
    )

    fake_broker.publish(broker, "q1", ["from-q1"])
    fake_broker.publish(broker, "q2", ["from-q2"])
    stream = open_stream(spark, broker, ["q1", "q2"])
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_default")
        .option("checkpointLocation", str(tmp_path / "cp_dd"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT payload FROM dedup_default").collect()
    assert sorted(r.payload for r in rows) == ["from-q1", "from-q2"]
