"""Stateful operators on the transformWithState API (Spark 4's
arbitrary-stateful-processing v2) — the forward-looking twin of
``streaming/stateful.py`` (SURVEY.md §2.5 W6).

``running_counts_tws`` reproduces ``running_counts``'s exact contract
— including the ``dedupe_by`` replay high-water marks the at-least-once
source requires (S4/S6: acks trail commits, redelivery after an unclean
restart) — on the v2 primitives:

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
