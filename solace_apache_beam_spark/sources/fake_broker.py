"""File-backed replayable message broker for tests.

Stands in for the Solace PubSub+ broker the reference binds to: messages
are durable (an append-only JSONL log per queue), consumption is
replayable from the last *acked* position — the broker, not the reader
checkpoint, is the replay log, exactly like the reference
(UnboundedSolaceSource.java:44-46: a prior checkpoint is deliberately
ignored; un-acked messages are redelivered on rebind,
UnboundedSolaceReaderIT.java:90-122).

Layout:  <dir>/<queue>/messages.jsonl   append-only message log
         <dir>/<queue>/acked           int: count of acked (deleted) msgs
         <dir>/<queue>/delivered       int: high-watermark of delivered msgs
                                       (drives the `redelivered` flag)
"""

from __future__ import annotations

import fcntl
import json
import os
import time
from contextlib import contextmanager


@contextmanager
def _locked(path: str):
    """flock-guarded critical section: read-max-write watermark updates
    are called concurrently from executor tasks reading slices of the
    same queue — without the lock, interleaving could leave a watermark
    at the lower value (under-reporting `redelivered` on replay)."""
    with open(path + ".lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def create_queue(broker_dir: str, queue: str, exclusive: bool = False) -> None:
    """``exclusive`` mirrors Solace exclusive queues: only one consumer
    receives messages; extra bindings connect but stay idle
    (SolaceIOIT.java:148-184)."""
    qdir = os.path.join(broker_dir, queue)
    os.makedirs(qdir, exist_ok=True)
    open(os.path.join(qdir, "messages.jsonl"), "a").close()
    if exclusive:
        with open(os.path.join(qdir, "access"), "w") as f:
            f.write("exclusive")


def is_exclusive(broker_dir: str, queue: str) -> bool:
    try:
        with open(os.path.join(queue_dir(broker_dir, queue), "access")) as f:
            return f.read().strip() == "exclusive"
    except FileNotFoundError:
        return False


def queue_dir(broker_dir: str, queue: str) -> str:
    return os.path.join(broker_dir, queue)


def publish(
    broker_dir: str,
    queue: str,
    payloads: list[str],
    properties: dict[str, str] | None = None,
    sender_id: str = "test-publisher",
    sender_timestamp_us: int | list[int] | None = None,
) -> None:
    """Append persistent messages (the tests' JCSMP producer twin,
    SolaceProtoBuffRecordTest.java:114-163). ``sender_timestamp_us``
    pins event time for deterministic event-time tests (int = all
    messages, list = per message)."""
    qdir = queue_dir(broker_dir, queue)
    if not os.path.isdir(qdir):
        raise ValueError(f"unknown queue: {queue}")
    path = os.path.join(qdir, "messages.jsonl")
    idx_path = os.path.join(qdir, "bytes.idx")
    now_us = int(time.time() * 1_000_000)
    # count-then-append under the queue lock: concurrent publishers
    # would otherwise read the same start and mint duplicate
    # message_id/sequence_number values
    with _locked(path):
        _seal_torn_tail(path)
        start = _count_lines(path)
        if _idx_len(idx_path) != start:
            # lost, partial, or OVER-LONG index (a crash between the
            # two file closes can flush the idx record but not the
            # message line): rebuild so record i matches message i
            _rebuild_bytes_idx_unlocked(path, idx_path)
        cum = _last_cumsum(idx_path, start)
        with open(path, "a") as f, open(idx_path, "a") as ix:
            for i, payload in enumerate(payloads):
                if isinstance(sender_timestamp_us, list):
                    ts_us = sender_timestamp_us[i]
                elif sender_timestamp_us is not None:
                    ts_us = sender_timestamp_us  # 0 = epoch, not "unset"
                else:
                    ts_us = now_us
                f.write(
                    json.dumps(
                        {
                            "message_id": start + i,
                            "payload": payload,
                            "properties": properties or {},
                            "priority": 0,
                            "reply_to": None,
                            "sender_id": sender_id,
                            "sender_timestamp_us": ts_us,
                            "sequence_number": start + i,
                            "expiration": 0,
                            "ttl": 0,
                        }
                    )
                    + "\n"
                )
                cum += len((payload or "").encode("utf-8"))
                ix.write(f"{cum:016d}\n")


def _seal_torn_tail(path: str) -> None:
    """A crash mid-append can leave a partial line without a trailing
    newline; appending after it would merge two records into one
    garbage line. Seal the torn tail as its own (poison) record before
    appending. Caller must hold the publish lock."""
    try:
        with open(path, "rb+") as f:
            f.seek(0, os.SEEK_END)
            if f.tell() == 0:
                return
            f.seek(-1, os.SEEK_END)
            if f.read(1) != b"\n":
                f.write(b"\n")
    except FileNotFoundError:
        pass


# per-process incremental line counter: (inode, terminated-byte
# offset, count, tail token) per path. The log is append-only, so each
# poll only scans the DELTA since the last poll — message_count is
# O(new bytes), not O(log size), in the latestOffset hot path (a
# multi-GB history is never re-read). The inode guard forces a recount
# when a file is recreated at the same path (fresh test dirs).
_COUNT_CACHE: dict[str, tuple[int, int, int, bytes]] = {}

# generation-token width: the last _TAIL_TOKEN bytes of counted history
# are re-verified on every poll (one O(1) read)
_TAIL_TOKEN = 24


def _count_lines(path: str) -> int:
    """Count newline-TERMINATED lines only. A concurrent publisher's
    buffered write can leave a partial tail visible mid-append;
    counting that fragment would admit an in-flight record into the
    offset range, deliver it as a poison record, and ack past it —
    silently losing the successfully-published message. The record
    becomes countable the instant its newline lands (or when
    _seal_torn_tail seals a crashed append's torn tail)."""
    try:
        st = os.stat(path)
    except FileNotFoundError:
        return 0
    ino, off, n, tail = _COUNT_CACHE.get(path, (st.st_ino, 0, 0, b""))
    if ino != st.st_ino or off > st.st_size:
        # recreated or truncated: recount
        ino, off, n, tail = st.st_ino, 0, 0, b""
    if st.st_size == off and off == 0:
        return 0
    with open(path, "rb") as f:
        if off > 0:
            # generation check beyond st_ino (ADVICE r7/r8): a
            # deleted-and-recreated log can REUSE the inode, and once
            # the new file grows past the cached offset the inode+size
            # guard alone would serve a count mixing old and new
            # content. The token is the last _TAIL_TOKEN bytes of
            # counted history (always ending in that generation's
            # newline) — re-read and compare them (one O(1) read per
            # poll); a mismatch means a different file history, so
            # recount from zero. The check is PROBABILISTIC, not
            # certain: a recreated same-inode file whose bytes at
            # [off - len(tail), off) happen to match the cached token
            # still slips through — but that now requires the new
            # generation to reproduce up to 24 bytes of the old one at
            # the same offset, not merely a newline at off-1.
            f.seek(max(0, off - len(tail)))
            if f.read(len(tail)) != tail:
                off, n, tail = 0, 0, b""
        if st.st_size == off:
            _COUNT_CACHE[path] = (ino, off, n, tail)
            return n
        f.seek(off)
        data = f.read(st.st_size - off)
    n += data.count(b"\n")
    last_nl = data.rfind(b"\n")
    if last_nl >= 0:
        off = off + last_nl + 1
        tail = (tail + data[: last_nl + 1])[-_TAIL_TOKEN:]
    _COUNT_CACHE[path] = (ino, off, n, tail)
    return n


def message_count(broker_dir: str, queue: str) -> int:
    return _count_lines(os.path.join(queue_dir(broker_dir, queue), "messages.jsonl"))


def _read_int(path: str) -> int:
    try:
        with open(path) as f:
            return int(f.read().strip() or 0)
    except FileNotFoundError:
        return 0


def _write_int(path: str, value: int) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(value))
    os.replace(tmp, path)


def acked_count(broker_dir: str, queue: str) -> int:
    return _read_int(os.path.join(queue_dir(broker_dir, queue), "acked"))


def ack_up_to(broker_dir: str, queue: str, n: int) -> None:
    """Ack (≈ delete from the broker) messages < n; monotone, atomic."""
    path = os.path.join(queue_dir(broker_dir, queue), "acked")
    with _locked(path):
        _write_int(path, max(n, _read_int(path)))


def delivered_watermark(broker_dir: str, queue: str) -> int:
    return _read_int(os.path.join(queue_dir(broker_dir, queue), "delivered"))


def advance_delivered(broker_dir: str, queue: str, n: int) -> None:
    """Monotone high-watermark advance; flock-atomic because executor
    tasks reading slices of one queue race on the same file."""
    path = os.path.join(queue_dir(broker_dir, queue), "delivered")
    with _locked(path):
        _write_int(path, max(n, _read_int(path)))


def backlog_messages(broker_dir: str, queue: str) -> int:
    """Un-acked backlog — the SEMP spool-usage query twin
    (UnboundedSolaceReader.java:305-340)."""
    return message_count(broker_dir, queue) - acked_count(broker_dir, queue)


_IDX_REC = 17  # 16 digits + newline: fixed-width -> O(1) seeks


def _last_cumsum(idx_path: str, n: int) -> int:
    """Cumulative payload bytes through message n-1 (0 for n=0)."""
    if n <= 0 or not os.path.exists(idx_path):
        return 0
    with open(idx_path, "rb") as f:
        f.seek((n - 1) * _IDX_REC)
        return int(f.read(16))


def _idx_len(idx_path: str) -> int:
    try:
        return os.path.getsize(idx_path) // _IDX_REC
    except FileNotFoundError:
        return 0


def _rebuild_bytes_idx_unlocked(msg_path: str, idx_path: str) -> None:
    """(Re)build the cumulative-bytes index from the message log.
    Caller must hold the queue's publish lock. Only newline-TERMINATED
    lines get an index record — _count_lines counts exactly those, so
    index record i aligns with line i and the index length equals the
    message count. A SEALED torn line (a crash mid-append, then
    _seal_torn_tail's newline) is terminated, parses as garbage, and
    counts as a zero-byte payload rather than wedging the queue; an
    UNSEALED torn tail is invisible to both the count and the index
    until the next publish seals it."""
    tmp = idx_path + ".rebuild"
    cum = 0
    with open(msg_path, "rb") as f, open(tmp, "w") as ix:
        for line in f:
            if not line.endswith(b"\n"):
                break  # unsealed torn tail: not a message yet
            try:
                payload = json.loads(line).get("payload") or ""
            except (json.JSONDecodeError, UnicodeDecodeError):
                payload = ""
            cum += len(payload.encode("utf-8")) if isinstance(payload, str) else 0
            ix.write(f"{cum:016d}\n")
    os.replace(tmp, idx_path)


def _rebuild_bytes_idx(qdir: str, idx_path: str) -> None:
    """Lazily (re)build the cumulative-bytes index from the message log
    — covers queue dirs populated before the index existed or with a
    lost/partial idx file. Runs under the publish lock so a concurrent
    publisher can't interleave appends mid-rebuild."""
    msg_path = os.path.join(qdir, "messages.jsonl")
    with _locked(msg_path):
        if _idx_len(idx_path) == _count_lines(msg_path):
            return  # another process rebuilt while we waited
        _rebuild_bytes_idx_unlocked(msg_path, idx_path)


def backlog_bytes(broker_dir: str, queue: str) -> int:
    """Un-acked backlog in payload bytes — getSplitBacklogBytes twin:
    `show queue ... current-spool-usage-in-bytes`
    (UnboundedSolaceReader.java:305-340, MsgBusSempUtil.java:112-147).
    Two O(1) seeks into the fixed-width cumulative-bytes index written
    at publish — the previous implementation JSON-parsed the whole
    backlog on every checkpoint commit. A missing or short index (queue
    dir populated before the index existed) is rebuilt lazily from the
    log instead of silently reporting 0."""
    qdir = queue_dir(broker_dir, queue)
    idx_path = os.path.join(qdir, "bytes.idx")
    total = message_count(broker_dir, queue)
    acked = acked_count(broker_dir, queue)
    if _idx_len(idx_path) != total:
        _rebuild_bytes_idx(qdir, idx_path)
    return _last_cumsum(idx_path, total) - _last_cumsum(idx_path, acked)


def read_messages(broker_dir: str, queue: str, start: int, end: int) -> list[dict]:
    path = os.path.join(queue_dir(broker_dir, queue), "messages.jsonl")
    out = []
    # binary, matching _rebuild_bytes_idx_unlocked (ADVICE r7): a
    # sealed torn line containing invalid UTF-8 (externally written —
    # publish itself is ensure_ascii) must surface as a poison record,
    # not crash the read path with UnicodeDecodeError in text decoding
    with open(path, "rb") as f:
        for idx, line in enumerate(f):
            if idx >= end:
                break
            if idx >= start:
                try:
                    out.append(json.loads(line))
                except (json.JSONDecodeError, UnicodeDecodeError):
                    # a sealed torn record (crash mid-append): surface
                    # it as a poison message rather than crashing the
                    # source — offset alignment must hold (record i =
                    # line i)
                    out.append(
                        {
                            "message_id": idx,
                            "payload": None,
                            "properties": {"corrupt": "true"},
                            "priority": 0,
                            "reply_to": None,
                            "sender_id": "",
                            "sender_timestamp_us": 0,
                            "sequence_number": idx,
                            "expiration": 0,
                            "ttl": 0,
                        }
                    )
    return out


def admissible_end(
    broker_dir: str, queue: str, start: int, limit: int, max_bytes: int
) -> int:
    """Largest end offset in [start, limit) whose cumulative payload
    bytes stay within max_bytes — always admits at least one message
    when any is available (progress guarantee). The real-broker
    equivalent is a SEMP spool metadata query. A lost/short index is
    rebuilt first — otherwise every cumsum reads 0 and the byte
    backpressure guard silently admits the whole backlog. The check is
    O(1) (index length vs ``limit``, not a log line-count — this runs
    on every micro-batch poll); a misaligned over-long index is
    repaired by the next publish, which does the full comparison."""
    qdir = queue_dir(broker_dir, queue)
    idx_path = os.path.join(qdir, "bytes.idx")
    if _idx_len(idx_path) < limit:
        _rebuild_bytes_idx(qdir, idx_path)
    if limit <= start:
        return start
    base = _last_cumsum(idx_path, start)
    # ONE contiguous read of the [start, limit) cumsum slice — bounded
    # by maxRecordsPerBatch * 17 bytes — then a bisect in memory. The
    # previous per-offset loop re-opened and seeked the index once per
    # candidate message on every poll (~10k open/seek/read cycles per
    # queue per micro-batch at the default batch cap).
    import bisect

    with open(idx_path, "rb") as f:
        f.seek(start * _IDX_REC)
        raw = f.read((limit - start) * _IDX_REC)
    cums = [
        int(raw[i * _IDX_REC : i * _IDX_REC + 16])
        for i in range(len(raw) // _IDX_REC)
    ]
    # largest k with cums[k-1] - base <= max_bytes; always admit one
    # message when any is available (progress guarantee)
    k = bisect.bisect_right(cums, base + max_bytes)
    return start + max(k, 1 if cums else 0)
