"""Stateful operators on the transformWithState API (Spark 4's
arbitrary-stateful-processing v2) — the forward-looking twin of
``streaming/stateful.py`` (SURVEY.md §2.5 W6).

``running_counts_tws`` reproduces ``running_counts``'s exact contract
— including the ``dedupe_by`` replay high-water marks the at-least-once
source requires (S4/S6: acks trail commits, redelivery after an unclean
restart) — on the v2 primitives; ``sessionize_tws`` is the emit-on-close
sessionizer on v2 EVENT-TIME TIMERS (registerTimer/handleExpiredTimer
instead of the v1 EventTimeTimeout — persistent timers, so the state
tuple carries the registered expiry and updates delete the superseded
timer), differential-tested to emit identical closed-session sets to
the v1 operator from the same broker log:

- totals live in a typed ``ValueState`` instead of a positional tuple;
- the per-queue replay marks live in a NATIVE ``MapState`` column
  family instead of the JSON-encoded map the v1 operators carry inside
  their state tuple — independently evolvable, point-readable, and
  TTL-capable;
- the filter kernel is the SAME ``_hwm_filter`` (property-tested
  exactly-once in tests/test_properties_streaming.py), so v1 and v2
  cannot drift on the replay algebra.

transformWithState requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` =
``...state.RocksDBStateStoreProvider``) — set it on the session before
starting the query; the HDFS-backed default provider rejects v2 state.

Verification status, stated exactly: the v2 Python runner talks to the
JVM state server over protobuf. This container does not ship the
protobuf wheel, so the repo carries a pure-python wire-format shim
(``vendor/pbshim`` — activated by tests/conftest.py when the real
package is absent), and the ENGINE path
(``transformWithStateInPandas`` + RocksDB state store + the state
server socket protocol) EXECUTES end-to-end in test_stateful_v2: batch
accumulation across microbatches AND the ack-lag replay dedupe with a
checkpoint restart. The processor's own code is additionally covered
in-process (test_stateful_v2_local: randomized replay + mid-sequence
restart against tuple-faithful handle fakes), and the replay algebra
is shared with v1 via ``_hwm_filter``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from solace_apache_beam_spark.streaming.stateful import (
    _COUNTS_OUT,
    _hwm_filter,
    _payload_nbytes,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class FunnelProcessor(StatefulProcessor):
    """Monotone stage machine on v2 primitives — the transformWithState
    twin of ``funnel_progress`` (same event ordering, same null-id
    frontier sentinel, same per-queue replay marks in a native
    MapState). No timers: funnel state lives for the key's lifetime."""

    _NULL_ID_FRONTIER = 1 << 62

    def __init__(
        self,
        stages: tuple,
        type_col: str,
        ts_col: str,
        id_col: str,
        dedupe_by: tuple[str, str] | None,
    ) -> None:
        self._stages = tuple(stages)
        self._stage_of = {s: i for i, s in enumerate(stages)}
        self._type_col = type_col
        self._ts_col = ts_col
        self._id_col = id_col
        self._dedupe_by = dedupe_by
        self._ev_cols = list(
            dict.fromkeys(
                [type_col, ts_col, id_col]
                + (list(dedupe_by) if dedupe_by else [])
            )
        )

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._machine = handle.getValueState(
            "machine", "stage long, ts_us long, last_id long"
        )
        if self._dedupe_by is not None:
            self._hwm = handle.getMapState("hwm", "queue string", "mark long")

    def handleInputRows(self, key: tuple, rows, timerValues):
        got = self._machine.get()
        stage, ts_us, last_id = (
            got if got is not None else (0, -(1 << 62), -1)
        )
        parts = [pdf[self._ev_cols] for pdf in rows]
        # ignore_index: same duplicate-label hazard as the v1 operator
        # (chunks arrive with their own RangeIndex — ADVICE r10)
        ev = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(columns=self._ev_cols)
        )
        if self._dedupe_by is not None:
            hwm0 = {k[0]: v[0] for k, v in self._hwm.iterator()}
            hwm_new = dict(hwm0)
            if len(ev):
                ev = _hwm_filter(
                    ev,
                    self._dedupe_by[0],
                    self._dedupe_by[1],
                    hwm0,
                    hwm_new,
                    "funnel_progress_tws",
                )
            for q, mark in hwm_new.items():
                if hwm0.get(q) != mark:
                    self._hwm.updateValue((q,), (mark,))
        if len(ev):
            ev = ev.sort_values([self._ts_col, self._id_col])
            for typ, ts, mid in ev[
                [self._type_col, self._ts_col, self._id_col]
            ].itertuples(index=False):
                if (
                    stage >= len(self._stages)
                    or self._stage_of.get(typ) != stage
                ):
                    continue
                t_us = pd.Timestamp(ts).value // 1000
                if pd.isna(mid):
                    if t_us > ts_us:
                        stage += 1
                        ts_us, last_id = t_us, self._NULL_ID_FRONTIER
                elif (t_us, int(mid)) > (ts_us, last_id):
                    stage += 1
                    ts_us, last_id = t_us, int(mid)
        self._machine.update((stage, ts_us, last_id))
        yield pd.DataFrame({"key": [key[0]], "stage_reached": [stage]})

    def close(self) -> None:
        pass


def funnel_progress_tws(
    stream: DataFrame,
    stages: tuple[str, ...],
    key_col: str = "user",
    type_col: str = "stage_name",
    ts_col: str = "event_time",
    id_col: str = "message_id",
    dedupe_by: tuple[str, str] | None = None,
) -> DataFrame:
    """transformWithState twin of ``funnel_progress`` — same output
    schema, same update-mode per-batch emission, same monotone-progress
    and replay-exactness contracts. Requires the RocksDB provider."""
    from solace_apache_beam_spark.streaming.stateful import _FUNNEL_OUT

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
        .transformWithStateInPandas(
            statefulProcessor=FunnelProcessor(
                stages, type_col, ts_col, id_col, dedupe_by
            ),
            outputStructType=_FUNNEL_OUT,
            outputMode="Update",
            timeMode="None",
        )
    )


class RunningCountsProcessor(StatefulProcessor):
    """Per-key lifetime (count, payload bytes); see module docstring."""

    def __init__(self, dedupe_by: tuple[str, str] | None = None) -> None:
        self._dedupe_by = dedupe_by

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "count long, nbytes long")
        if self._dedupe_by is not None:
            self._hwm = handle.getMapState("hwm", "queue string", "mark long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        got = self._totals.get()
        count, nbytes = got if got is not None else (0, 0)
        if self._dedupe_by is None:
            for pdf in rows:
                count += len(pdf)
                nbytes += _payload_nbytes(pdf["payload"])
        else:
            queue_col, id_col = self._dedupe_by
            # pre-batch marks: chunks of one batch arrive in no
            # guaranteed order (see running_counts), so every chunk
            # filters against the marks as of batch START; the map
            # advances once, after the batch
            hwm0 = {k[0]: v[0] for k, v in self._hwm.iterator()}
            hwm_new = dict(hwm0)
            for pdf in rows:
                fresh = _hwm_filter(
                    pdf, queue_col, id_col, hwm0, hwm_new, "running_counts_tws"
                )
                if len(fresh) == 0:
                    continue
                count += len(fresh)
                nbytes += _payload_nbytes(fresh["payload"])
            for q, mark in hwm_new.items():
                if hwm0.get(q) != mark:
                    self._hwm.updateValue((q,), (mark,))
        self._totals.update((count, nbytes))
        yield pd.DataFrame(
            {"key": [key[0]], "total_count": [count], "total_bytes": [nbytes]}
        )

    def close(self) -> None:
        pass


_SESS_STATE = "start_us long, end_us long, n long, timer_ms long"


def _emit_sessions(sessions: list) -> pd.DataFrame:
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


class SessionizeProcessor(StatefulProcessor):
    """Event-time sessionization on v2 primitives — the
    transformWithState twin of ``sessionize`` (same contract: emit a
    key's session exactly once, when the watermark proves it closed;
    in-batch gap splitting; optional per-queue replay marks with a
    retention tombstone). The structural difference from v1: v2 timers
    PERSIST until fired or deleted (EventTimeTimeout re-arms on every
    invocation), so the state tuple carries the registered expiry and
    each update deletes the superseded timer; a stale fire (an expiry
    the delete raced) is ignored by comparing against the stored
    expiry."""

    def __init__(
        self,
        gap_seconds: int,
        ts_col: str,
        dedupe_by: tuple[str, str] | None,
        retention_seconds: int,
    ) -> None:
        self._gap_us = gap_seconds * 1_000_000
        self._gap_ms = gap_seconds * 1000
        self._ts_col = ts_col
        self._dedupe_by = dedupe_by
        self._retention_ms = retention_seconds * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", _SESS_STATE)
        if self._dedupe_by is not None:
            self._hwm = handle.getMapState("hwm", "queue string", "mark long")

    def _move_timer(self, old_ms: int, new_ms: int) -> None:
        if old_ms == new_ms:
            return
        if old_ms > 0:
            self._handle.deleteTimer(old_ms)
        self._handle.registerTimer(new_ms)

    def handleInputRows(
        self, key: tuple, rows, timerValues
    ):
        got = self._sess.get()
        prev_timer = got[3] if got is not None else 0
        prev_end_us = got[1] if got is not None else None
        cur = list(got[:3]) if got is not None and got[2] > 0 else None

        ts_us: list[int] = []
        if self._dedupe_by is None:
            for pdf in rows:
                ts = pd.to_datetime(pdf[self._ts_col]).dropna()
                ts_us.extend((ts.astype("int64") // 1000).tolist())
        else:
            queue_col, id_col = self._dedupe_by
            hwm0 = {k[0]: v[0] for k, v in self._hwm.iterator()}
            hwm_new = dict(hwm0)
            for pdf in rows:
                fresh = _hwm_filter(
                    pdf, queue_col, id_col, hwm0, hwm_new, "sessionize_tws"
                )
                ts = pd.to_datetime(fresh[self._ts_col]).dropna()
                ts_us.extend((ts.astype("int64") // 1000).tolist())
            for q, mark in hwm_new.items():
                if hwm0.get(q) != mark:
                    self._hwm.updateValue((q,), (mark,))

        closed: list = []
        if ts_us:
            ts_us.sort()
            for t in ts_us:
                if cur is None:
                    cur = [t, t, 1]
                elif t > cur[1] + self._gap_us:
                    closed.append((cur[0], cur[1], cur[2], key[0]))
                    cur = [t, t, 1]
                else:
                    cur[0] = min(cur[0], t)
                    cur[1] = max(cur[1], t)
                    cur[2] += 1

        wm_ms = timerValues.getCurrentWatermarkInMs()
        if cur is not None:
            # open session: (re)arm the close timer at end + gap,
            # clamped above the watermark (a timer at-or-below it could
            # never fire "later")
            timer_ms = max(cur[1] // 1000 + self._gap_ms, wm_ms + 1)
            self._sess.update((cur[0], cur[1], cur[2], timer_ms))
            self._move_timer(prev_timer, timer_ms)
        elif self._dedupe_by is not None:
            # replayed-only (or all-null-ts) batch, no open session:
            # keep/refresh the hwm tombstone with a retention timer —
            # the marks must outlive the session by the replay window
            last_end_ms = (
                prev_end_us // 1000 if prev_end_us is not None else wm_ms
            )
            timer_ms = max(
                last_end_ms + self._gap_ms + self._retention_ms, wm_ms + 1
            )
            self._sess.update(
                (last_end_ms * 1000, last_end_ms * 1000, 0, timer_ms)
            )
            self._move_timer(prev_timer, timer_ms)
        yield _emit_sessions(closed)

    def handleExpiredTimer(self, key: tuple, timerValues, expiredTimerInfo):
        got = self._sess.get()
        if got is None:
            return
        start_us, end_us, n, timer_ms = got
        if expiredTimerInfo.getExpiryTimeInMs() != timer_ms:
            return  # superseded timer whose delete raced the fire
        if n == 0:
            # hwm tombstone retention elapsed: final eviction
            self._sess.clear()
            if self._dedupe_by is not None:
                self._hwm.clear()
            return
        if self._dedupe_by is None:
            self._sess.clear()
        else:
            # close but retain the marks as a tombstone (v1 contract)
            retention_ms = max(
                end_us // 1000 + self._gap_ms + self._retention_ms,
                timerValues.getCurrentWatermarkInMs() + 1,
            )
            self._sess.update((end_us, end_us, 0, retention_ms))
            self._handle.registerTimer(retention_ms)
        yield _emit_sessions([(start_us, end_us, n, key[0])])

    def close(self) -> None:
        pass


def sessionize_tws(
    stream: DataFrame,
    key_col: str = "destination",
    ts_col: str = "event_time",
    gap_seconds: int = 30,
    watermark: str = "0 seconds",
    dedupe_by: tuple[str, str] | None = None,
    dedupe_retention_seconds: int = 300,
) -> DataFrame:
    """transformWithState twin of ``sessionize`` — same output schema,
    same append-mode emit-on-close contract, same replay-exactness via
    ``dedupe_by``; event-time timers (timeMode='EventTime') instead of
    the v1 EventTimeTimeout. Requires the RocksDB provider."""
    from solace_apache_beam_spark.streaming.stateful import _SESSION_OUT

    cols = list(
        dict.fromkeys(
            [key_col, ts_col] + (list(dedupe_by) if dedupe_by else [])
        )
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .select(*cols)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=SessionizeProcessor(
                gap_seconds, ts_col, dedupe_by, dedupe_retention_seconds
            ),
            outputStructType=_SESSION_OUT,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def running_counts_tws(
    stream: DataFrame,
    key_col: str = "destination",
    dedupe_by: tuple[str, str] | None = None,
) -> DataFrame:
    """transformWithState twin of ``running_counts`` — same output
    schema, same update-mode emission, same replay-exactness contract
    (``dedupe_by=(queue_col, id_col)``). Use outputMode('update') and
    the RocksDB provider (module docstring)."""
    cols = list(
        dict.fromkeys(
            [key_col, "payload"] + (list(dedupe_by) if dedupe_by else [])
        )
    )
    return (
        stream.select(*cols)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=RunningCountsProcessor(dedupe_by),
            outputStructType=_COUNTS_OUT,
            outputMode="Update",
            timeMode="None",
        )
    )
