"""Custom stateful streaming operators (applyInPandasWithState — the
escape hatch for semantics built-in windowed aggs can't express,
SURVEY.md §2.5 W6).

- running_counts: per-key cumulative message count/bytes across the
  whole stream lifetime — the streaming twin of the reference's
  per-reader counters (SolaceReaderStats.java:19-30), but keyed and
  exactly-once per microbatch via the state store.
- sessionize: event-time sessionization with a gap timeout. Unlike
  session_window aggregation, the session row is emitted exactly once,
  when the watermark proves the session closed (EventTimeTimeout) —
  the pattern for any emit-on-close stateful logic.

State is per-key and lives in the state store (RocksDB/HDFS-backed on a
cluster): bounded by the number of live keys, evicted on timeout —
no unbounded driver or executor memory at 100 TB.

At-least-once caveat (found by the round-9 500k kill-restart soak):
the source deliberately replays from the broker's ACKED position after
a restart (S4 — JCSMP rebind; acks trail commits by up to an epoch),
so a committed-but-unacked range can be REDELIVERED into live state.
Stateful accumulations that must be replay-exact need an idempotence
key: ``running_counts(dedupe_by="message_id")`` shows the high-water-
mark pattern. The single-long hwm is sound ONLY because its state key
is the queue itself (message ids are monotone broker log positions
PER QUEUE — delivery order within a queue matches id order, so
"id <= hwm" exactly characterizes "already counted"). ``sessionize``'s
``n_events`` counter and ``funnel_progress``'s out-of-order corner
(a replayed straggler above the stage frontier) are replay-sensitive
the same way raw counting is, but their keys (user, session key) span
queues, where a single hwm is WRONG — a replayed q1 id can sit below a
hwm set by q2. Both operators therefore take
``dedupe_by=(queue_col, id_col)`` (round 10): the state tuple carries
a PER-QUEUE hwm map (JSON-encoded — queues per key are few, the map is
bytes), each batch is filtered against the PRE-batch map (same
chunk-ordering argument as running_counts), and the map advances once
after the batch. funnel state lives for the key's lifetime, so its map
does too; sessionize state is EVICTED on session close, so the close
leaves an hwm TOMBSTONE that survives ``dedupe_retention_seconds`` of
event time before final eviction — replay hits within the retention
window (acks trail commits by at most an epoch, i.e. seconds) are
dropped, and state stays bounded by live keys.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _payload_nbytes(payload: pd.Series) -> int:
    """UTF-8 byte length summed over non-null payloads. dropna-then-sum
    rather than fillna(0): fillna on the object-dtype result of
    .str.encode triggers pandas' object-downcasting FutureWarning and
    becomes a behavior change on pandas 3."""
    return int(payload.dropna().str.encode("utf-8").str.len().sum())


def _hwm_filter(
    pdf: pd.DataFrame,
    queue_col: str,
    id_col: str,
    hwm0: dict,
    hwm_new: dict,
    op: str,
) -> pd.DataFrame:
    """Drop rows at-or-below the PRE-batch per-queue high-water mark and
    advance ``hwm_new`` (mutated in place) to the batch's per-queue max.
    Filtering against ``hwm0`` — not the running map — is what makes
    unordered chunk arrival safe: all of a batch's ids are distinct (one
    contiguous log range per queue) and none were applied before, so
    the pre-batch mark is the only correct cut (see running_counts).
    NULL ids fail loudly: the id is a broker log position, a NULL means
    the stream is mis-wired and the row would otherwise be silently
    dropped (ADVICE r9). NULL queues fail for the symmetric reason —
    pandas' groupby silently drops NaN groups, so a NULL-queue row
    would BYPASS dedup entirely (kept, never filtered, never advancing
    any mark). The index is normalized at entry: ``keep.loc[grp.index]``
    is label-based, so duplicate labels (e.g. a caller concatenating
    Arrow chunks without ignore_index) would silently cross-corrupt
    groups instead of erroring (ADVICE r10)."""
    if not pdf.index.is_unique:
        pdf = pdf.reset_index(drop=True)
    ids = pdf[id_col]
    if ids.isna().any():
        raise ValueError(
            f"{op}(dedupe_by=({queue_col!r}, {id_col!r})): NULL id — the "
            "dedupe column is a broker log position and must be non-null"
        )
    if pdf[queue_col].isna().any():
        raise ValueError(
            f"{op}(dedupe_by=({queue_col!r}, {id_col!r})): NULL queue — "
            "the queue column names the broker log the id positions into "
            "and must be non-null"
        )
    keep = pd.Series(True, index=pdf.index)
    for q, grp in pdf.groupby(queue_col, sort=False):
        qk = str(q)
        keep.loc[grp.index] = grp[id_col] > hwm0.get(qk, -1)
        mx = int(grp[id_col].max())
        if mx > hwm_new.get(qk, -1):
            hwm_new[qk] = mx
    return pdf[keep]

_COUNTS_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("total_count", LongType()),
        StructField("total_bytes", LongType()),
    ]
)
_COUNTS_STATE = StructType(
    [StructField("count", LongType()), StructField("bytes", LongType())]
)
_COUNTS_STATE_HWM = StructType(
    [
        StructField("count", LongType()),
        StructField("bytes", LongType()),
        StructField("hwm", LongType()),
    ]
)


def running_counts(
    stream: DataFrame,
    key_col: str = "destination",
    dedupe_by: str | None = None,
) -> DataFrame:
    """Per-key lifetime (count, payload bytes) — one updated row per key
    per microbatch. Use outputMode('update').

    ``dedupe_by``: name of a per-key MONOTONE id column (the source's
    ``message_id`` — each queue's broker log position) that makes the
    counts effectively exactly-once over an AT-LEAST-ONCE source. The
    source deliberately replays delivered-but-unacked messages after an
    unclean restart (S4/S6: acks trail commits by one epoch, exactly
    like the JCSMP client contract) — the state store alone cannot see
    that a REDELIVERED message was already counted in a committed
    batch, because it arrives under a fresh offset. With ``dedupe_by``
    the state carries a high-water mark and counts only ids above it:
    a replayed uncommitted batch re-applies to the pre-batch state
    version (ids above the restored hwm — counted once), while
    broker-redelivered older messages fall at-or-below the hwm and are
    skipped. Found by the 500k kill-restart soak, where raw counting
    overcounted by exactly one batch of redeliveries; the fixed run's
    totals match the broker log exactly (PLANS.md round 9).

    The ``dedupe_by`` column must be NON-NULL on every row: it is a
    broker log position, so a NULL id means the stream is mis-wired,
    and a NULL would otherwise fail the ``> hwm`` comparison and
    silently drop the row from the counts (a divergence from raw mode
    that raw callers would never see — ADVICE r9). The updater raises
    on the first NULL id, failing the query loudly instead."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if dedupe_by is None:
            count, nbytes = state.get if state.exists else (0, 0)
            for pdf in pdfs:
                count += len(pdf)
                nbytes += _payload_nbytes(pdf["payload"])
            state.update((count, nbytes))
        else:
            count, nbytes, hwm0 = state.get if state.exists else (0, 0, -1)
            # filter every chunk against the PRE-BATCH hwm: chunks of
            # one batch arrive in no guaranteed order, and a running
            # hwm raised by an earlier chunk would wrongly skip a later
            # chunk's lower-id rows — all of a batch's ids are distinct
            # (one contiguous log range per queue) and none were
            # counted before, so the pre-batch mark is the only correct
            # filter; the mark advances once, after the batch
            hwm = hwm0
            for pdf in pdfs:
                ids = pdf[dedupe_by]
                if ids.isna().any():
                    raise ValueError(
                        f"running_counts(dedupe_by={dedupe_by!r}): NULL id "
                        f"for key {key[0]!r} — the dedupe column is a broker "
                        "log position and must be non-null; a NULL row would "
                        "be silently uncounted (diverging from raw mode)"
                    )
                fresh = pdf[ids > hwm0]
                if len(fresh) == 0:
                    continue
                count += len(fresh)
                nbytes += _payload_nbytes(fresh["payload"])
                hwm = max(hwm, int(fresh[dedupe_by].max()))
            state.update((count, nbytes, hwm))
        yield pd.DataFrame(
            {"key": [key[0]], "total_count": [count], "total_bytes": [nbytes]}
        )

    cols = [key_col, "payload"] + ([dedupe_by] if dedupe_by else [])
    return (
        stream.select(*cols)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            _COUNTS_OUT,
            _COUNTS_STATE if dedupe_by is None else _COUNTS_STATE_HWM,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


_SESSION_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)
_SESSION_STATE_HWM = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("hwm_json", StringType()),
    ]
)


def sessionize(
    stream: DataFrame,
    key_col: str = "destination",
    ts_col: str = "event_time",
    gap_seconds: int = 30,
    watermark: str = "0 seconds",
    dedupe_by: tuple[str, str] | None = None,
    dedupe_retention_seconds: int = 300,
) -> DataFrame:
    """Close a key's session once the watermark passes last_event + gap;
    emit the closed session exactly once. Use outputMode('append').

    Gap separation is enforced WITHIN a batch too: the batch's events
    are sorted and split wherever consecutive timestamps are more than
    the gap apart — two bursts landing in one microbatch close the
    first session immediately instead of fusing (the timeout alone can
    only separate sessions across batches). Null timestamps are
    dropped (a NaT would otherwise poison the bounds with the int64
    sentinel). Late events older than the open session merge into it
    (same tolerance the watermark grants).

    ``dedupe_by=(queue_col, id_col)`` makes the session exact over the
    AT-LEAST-ONCE source (module header): the state carries a per-queue
    hwm map; broker-replayed events (id at-or-below the queue's mark)
    are dropped before they can inflate ``n_events``, re-extend an open
    session, or resurrect a closed one. On session close the state
    degrades to an hwm TOMBSTONE (n=0) retained for
    ``dedupe_retention_seconds`` of event time, then evicted — replay
    exposure is bounded by the ack lag (<= one epoch), so a short
    retention covers it while state stays bounded by live keys.

    Interaction with the watermark (measured while pinning this): at
    the default 0-second delay the ENGINE's late-row filter already
    drops broker replay — replayed events are by construction at or
    below the restored max event time. Any nonzero ``watermark`` delay
    (the realistic late-data setting) reopens the window: replayed
    events within the delay pass the filter and reach live state, which
    is exactly where the hwm map catches them."""
    gap_us = gap_seconds * 1_000_000

    def _emit(sessions: list) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": pd.Series([s[3] for s in sessions], dtype=object),
                "session_start": pd.Series(
                    [pd.Timestamp(s[0], unit="us") for s in sessions],
                    dtype="datetime64[ns]",
                ),
                "session_end": pd.Series(
                    [pd.Timestamp(s[1], unit="us") for s in sessions],
                    dtype="datetime64[ns]",
                ),
                "n_events": pd.Series([s[2] for s in sessions], dtype="int64"),
            }
        )

    retention_ms = dedupe_retention_seconds * 1000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if dedupe_by is None:
                start_us, end_us, n = state.get
                state.remove()
                yield _emit([(start_us, end_us, n, key[0])])
                return
            start_us, end_us, n, hwm_json = state.get
            if n == 0:
                # the hwm tombstone's retention elapsed: final eviction
                state.remove()
                yield _emit([])
                return
            # close the session but RETAIN the hwm map as a tombstone —
            # a broker replay within the retention window must not
            # resurrect the session (module header). Clamp above the
            # watermark: by the time this timeout fires the watermark
            # may already sit past end+gap+retention, and Spark rejects
            # a timeout at-or-below it
            state.update((end_us, end_us, 0, hwm_json))
            state.setTimeoutTimestamp(
                max(
                    end_us // 1000 + gap_seconds * 1000 + retention_ms,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
            yield _emit([(start_us, end_us, n, key[0])])
            return
        ts_us: list[int] = []
        if dedupe_by is None:
            cur = list(state.get) if state.exists else None
            hwm0: dict = {}
            hwm = hwm0
            for pdf in pdfs:
                ts = pd.to_datetime(pdf[ts_col]).dropna()
                ts_us.extend((ts.astype("int64") // 1000).tolist())
        else:
            queue_col, id_col = dedupe_by
            prev_end_us = None
            if state.exists:
                start0, end0, n0, hwm_json = state.get
                cur = [start0, end0, n0] if n0 > 0 else None
                prev_end_us = end0
                hwm0 = json.loads(hwm_json)
            else:
                cur, hwm0 = None, {}
            hwm = dict(hwm0)
            for pdf in pdfs:
                fresh = _hwm_filter(
                    pdf, queue_col, id_col, hwm0, hwm, "sessionize"
                )
                ts = pd.to_datetime(fresh[ts_col]).dropna()
                ts_us.extend((ts.astype("int64") // 1000).tolist())
        closed: list = []
        if ts_us:
            ts_us.sort()
            for t in ts_us:
                if cur is None:
                    cur = [t, t, 1]
                elif t > cur[1] + gap_us:
                    closed.append((cur[0], cur[1], cur[2], key[0]))
                    cur = [t, t, 1]
                else:
                    cur[0] = min(cur[0], t)
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
        if dedupe_by is None:
            if ts_us:
                state.update((cur[0], cur[1], cur[2]))
                # event-time timeout: fires when watermark > end + gap
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
            elif state.exists:
                # defense-in-depth: GroupState's contract resets a
                # key's timeout on every invocation, so an invocation
                # with no usable timestamps (all-null ts) must
                # re-register it or the open session never closes.
                # Measured (test_sessionize_timeout_survives_null_ts_
                # batch): the engine's watermark filter already drops
                # null-ts rows before a WATERMARKED stateful operator
                # (the lateness predicate is NULL), so this branch is
                # unreachable through sessionize's own plan — kept
                # because the contract is per-invocation, not per-plan
                _, end0, _ = state.get
                state.setTimeoutTimestamp(
                    max(
                        end0 // 1000 + gap_seconds * 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        else:
            # state must be (re)written even when every row was a
            # replayed duplicate: the hwm map may have advanced, and an
            # EventTimeTimeout is cleared on each invocation unless
            # re-registered
            wm_ms = state.getCurrentWatermarkMs()
            if cur is not None:
                state.update((cur[0], cur[1], cur[2], json.dumps(hwm)))
                state.setTimeoutTimestamp(
                    max(cur[1] // 1000 + gap_seconds * 1000, wm_ms + 1)
                )
            else:
                # replayed-only (or all-null-ts) batch with no open
                # session: tombstone carrying the map. closed is
                # necessarily empty here (a close always leaves cur
                # open on the new session), so the base is the prior
                # tombstone's end, falling back to the watermark for a
                # brand-new key
                last_end_ms = (
                    prev_end_us // 1000 if prev_end_us is not None else wm_ms
                )
                state.update(
                    (last_end_ms * 1000, last_end_ms * 1000, 0, json.dumps(hwm))
                )
                state.setTimeoutTimestamp(
                    max(
                        last_end_ms + gap_seconds * 1000 + retention_ms,
                        wm_ms + 1,
                    )
                )
        yield _emit(closed)

    cols = list(
        dict.fromkeys([key_col, ts_col] + (list(dedupe_by) if dedupe_by else []))
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .select(*cols)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            _SESSION_OUT,
            _SESSION_STATE if dedupe_by is None else _SESSION_STATE_HWM,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


_FUNNEL_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("stage_reached", LongType()),
    ]
)
_FUNNEL_STATE = StructType(
    [
        StructField("stage", LongType()),
        StructField("ts_us", LongType()),
        StructField("last_id", LongType()),
    ]
)
_FUNNEL_STATE_HWM = StructType(
    [
        StructField("stage", LongType()),
        StructField("ts_us", LongType()),
        StructField("last_id", LongType()),
        StructField("hwm_json", StringType()),
    ]
)


def funnel_progress(
    stream: DataFrame,
    stages: tuple[str, ...],
    key_col: str = "user",
    type_col: str = "stage_name",
    ts_col: str = "event_time",
    id_col: str = "message_id",
    dedupe_by: tuple[str, str] | None = None,
) -> DataFrame:
    """Streaming funnel: per key, advance a stage machine as qualifying
    events arrive — stage k+1 requires an event of stages[k] strictly
    after the event that reached stage k (by (ts, id), same rule as the
    batch funnel_counts). Emits (key, stage_reached) per updated key
    per microbatch; use outputMode('update').

    State per key is three longs — bounded by live keys, no timeline
    retained. Events are processed in (ts, id) order WITHIN each batch;
    cross-batch stragglers older than the frontier are ignored (the
    batch funnel is the exact offline oracle; this is its
    monotone-progress online twin).

    Nullable inputs follow the batch funnel_counts exactly: null
    event-time and null key rows are filtered up front (a NaT
    timestamp's integer value would otherwise compare ABOVE the
    initial frontier sentinel and advance stage 1 on an event the
    oracle excludes; a null key would keep a group the oracle's
    frontier join drops). A null EVENT ID still qualifies — by
    strictly-later timestamp only — and once it is the frontier,
    same-ts events never beat it (SQL's `id > NULL` is NULL), encoded
    by storing the +inf frontier sentinel.

    ``dedupe_by=(queue_col, id_col)`` closes the documented replay
    divergence (module header; pinned by
    test_funnel_progress_replay_semantics): the state carries a
    per-queue hwm map and broker-replayed events are dropped before
    the stage machine, so a straggler that was rightly skipped when
    first delivered can never advance the machine on redelivery — the
    online funnel stays exact w.r.t. its own no-replay semantics. In
    dedupe mode NULL dedupe ids fail loudly (they are broker log
    positions); the FUNNEL id column's null contract above is
    unchanged when the two columns differ."""
    n_stages = len(stages)
    stage_of = {s: i for i, s in enumerate(stages)}
    # same-ts events never beat a null-id frontier (SQL: id > NULL is
    # NULL) -> store +inf for it; only a strictly later ts advances
    null_id_frontier = 1 << 62
    ev_cols = list(
        dict.fromkeys(
            [type_col, ts_col, id_col] + (list(dedupe_by) if dedupe_by else [])
        )
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if dedupe_by is None:
            stage, ts_us, last_id = (
                state.get if state.exists else (0, -(1 << 62), -1)
            )
            hwm: dict = {}
        else:
            stage, ts_us, last_id, hwm_json = (
                state.get if state.exists else (0, -(1 << 62), -1, "{}")
            )
            hwm = json.loads(hwm_json)
        parts = [pdf[ev_cols] for pdf in pdfs]
        # ignore_index: each Arrow chunk arrives with its own RangeIndex,
        # so a bare concat would carry duplicate labels into _hwm_filter's
        # label-based keep assignment — a later queue group could
        # overwrite an earlier group's flags at shared labels (ADVICE r10)
        ev = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(columns=ev_cols)
        )
        if dedupe_by is not None and len(ev):
            # one contiguous log range per queue per batch: the
            # concatenated frame can be cut against the pre-batch map
            # in one pass (hwm advances in place)
            ev = _hwm_filter(
                ev, dedupe_by[0], dedupe_by[1], dict(hwm), hwm, "funnel_progress"
            )
        if len(ev):
            # NaN ids sort LAST at equal ts (pandas default), matching
            # the batch frontier's nulls-last tie-break preference
            ev = ev.sort_values([ts_col, id_col])
            # project to the machine's three columns — ev may carry a
            # dedupe queue column the unpack must not see
            for typ, ts, mid in ev[[type_col, ts_col, id_col]].itertuples(
                index=False
            ):
                if stage >= n_stages or stage_of.get(typ) != stage:
                    continue
                t_us = pd.Timestamp(ts).value // 1000
                if pd.isna(mid):
                    # null id: qualifies by STRICTLY later ts only
                    # (the (ts = t AND id > i) disjunct is NULL in SQL)
                    if t_us > ts_us:
                        stage += 1
                        ts_us, last_id = t_us, null_id_frontier
                elif (t_us, int(mid)) > (ts_us, last_id):
                    stage += 1
                    ts_us, last_id = t_us, int(mid)
        if dedupe_by is None:
            state.update((stage, ts_us, last_id))
        else:
            state.update((stage, ts_us, last_id, json.dumps(hwm)))
        yield pd.DataFrame({"key": [key[0]], "stage_reached": [stage]})

    cols = list(
        dict.fromkeys(
            [key_col, type_col, ts_col, id_col]
            + (list(dedupe_by) if dedupe_by else [])
        )
    )
    return (
        stream.select(*cols)
        .filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            _FUNNEL_OUT,
            _FUNNEL_STATE if dedupe_by is None else _FUNNEL_STATE_HWM,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
