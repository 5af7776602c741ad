"""Randomized streaming-vs-batch differential: the streaming pipelines
must produce exactly what the batch operators produce on the same
messages — Structured Streaming's unified-model claim, exercised END
TO END through the source (publish -> fake broker -> solace
DataSource -> event-time assignment -> windowed aggregation -> memory
sink) rather than by feeding the transformation a static frame.

Event times are pinned per message (sender-timestamp mode) on a
10-second grid so window boundaries are dense; payloads come from a
small vocabulary so cross-message word collisions are common. One
microbatch per example (everything published before the stream
starts), so update-mode emissions are final values."""

from __future__ import annotations

import itertools
import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._fuzz import n_examples

from pyspark.sql import functions as F

from solace_apache_beam_spark.operators.text import (
    format_word_count,
    windowed_count_words,
)
from solace_apache_beam_spark.sources import fake_broker
from solace_apache_beam_spark.streaming.pipelines import (
    count_messages,
    open_stream,
    windowed_word_count,
)

SETTINGS = dict(
    max_examples=n_examples(5, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
_WORDS = ("alpha", "beta", "gamma", "δέλτα", "", "x y  z")

_msg = st.tuples(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=4).map(" ".join),
    st.integers(0, 6),  # event time: 10-second grid steps
)

_seq = itertools.count()


def _run_stream(spark, df, tmp: str):
    name = f"propstream_{next(_seq)}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp, "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


@settings(**SETTINGS)
@given(msgs=st.lists(_msg, min_size=1, max_size=25))
def test_streaming_windowed_wordcount_matches_batch(spark, msgs):
    tmp = tempfile.mkdtemp(prefix="propstream_")
    fake_broker.create_queue(tmp, "q1")
    fake_broker.publish(
        tmp,
        "q1",
        [m[0] for m in msgs],
        sender_timestamp_us=[_BASE_US + 10_000_000 * m[1] for m in msgs],
    )
    stream = open_stream(spark, tmp, ["q1"], use_sender_timestamp=True)
    got_df = _run_stream(spark, windowed_word_count(stream), tmp)
    got = sorted(
        (r.window_start, r.window_end, r.word, r.cnt, r.formatted)
        for r in got_df.collect()
    )

    batch = spark.createDataFrame(
        [(m[0], _BASE_US + 10_000_000 * m[1]) for m in msgs],
        "line string, us long",
    ).select("line", F.timestamp_micros(F.col("us")).alias("event_time"))
    want_df = format_word_count(
        windowed_count_words(batch, "line", "event_time", "10 seconds")
    )
    want = sorted(
        (r.window_start, r.window_end, r.word, r.cnt, r.formatted)
        for r in want_df.collect()
    )
    assert got == want


@settings(**SETTINGS)
@given(msgs=st.lists(_msg, min_size=1, max_size=25))
def test_streaming_count_messages_matches_batch(spark, msgs):
    tmp = tempfile.mkdtemp(prefix="propstream_")
    fake_broker.create_queue(tmp, "q1")
    fake_broker.publish(
        tmp,
        "q1",
        [m[0] for m in msgs],
        sender_timestamp_us=[_BASE_US + 10_000_000 * m[1] for m in msgs],
    )
    stream = open_stream(spark, tmp, ["q1"], use_sender_timestamp=True)
    got = sorted(
        (r.window_start, r.window_end, r.cnt)
        for r in _run_stream(spark, count_messages(stream), tmp).collect()
    )
    batch = spark.createDataFrame(
        [(_BASE_US + 10_000_000 * m[1],) for m in msgs], "us long"
    ).select(F.timestamp_micros(F.col("us")).alias("event_time"))
    want = sorted(
        (r.w.start, r.w.end, r.cnt)
        for r in batch.groupBy(F.window("event_time", "10 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    assert got == want


@settings(**SETTINGS)
@given(
    # duplicated message_ids across queues are the trap dedup_stream's
    # default (destination, message_id) key exists for: publish the
    # same per-queue line indexes on two queues
    n_q1=st.integers(1, 10),
    n_q2=st.integers(0, 10),
)
def test_streaming_dedup_matches_batch_distinct(spark, n_q1, n_q2):
    """dropDuplicatesWithinWatermark keyed (destination, message_id)
    must keep exactly one row per key — compared against the batch
    distinct over the same published messages, across two queues whose
    per-queue message ids collide by construction."""
    from solace_apache_beam_spark.streaming.pipelines import dedup_stream

    tmp = tempfile.mkdtemp(prefix="propstream_")
    for q, n in (("q1", n_q1), ("q2", n_q2)):
        fake_broker.create_queue(tmp, q)
        if n:
            fake_broker.publish(
                tmp, q, [f"m{i}" for i in range(n)],
                sender_timestamp_us=[_BASE_US + 1_000_000 * i for i in range(n)],
            )
    stream = open_stream(spark, tmp, ["q1", "q2"], use_sender_timestamp=True)
    out = _run_stream(
        spark, dedup_stream(stream).select("destination", "message_id"), tmp
    )
    got = sorted((r.destination, r.message_id) for r in out.collect())
    want = sorted(
        {("q1", i) for i in range(n_q1)} | {("q2", i) for i in range(n_q2)}
    )
    assert got == want


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


# ---------------------------------------------------------------------------
# Pure-pandas property: the per-(key,queue) hwm filter algebra (round 10)
# ---------------------------------------------------------------------------


@settings(
    max_examples=n_examples(200, 40),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.data())
def test_hwm_filter_exactly_once_under_replay_and_chunk_shuffle(data):
    """Model-checks the hwm-map algebra shared by running_counts /
    sessionize / funnel_progress (streaming/stateful._hwm_filter)
    against its exactly-once contract, with no Spark in the loop:

    per queue the broker delivers a monotone id log; epochs deliver
    contiguous ranges; a replay REWINDS the next delivery position to
    any earlier point (the ack-lag anatomy — redelivering a suffix of
    already-delivered ids before fresh ones); within an epoch the rows
    arrive as arbitrarily split, arbitrarily ORDERED chunks (the
    unordered-chunk property the pre-batch filter exists for). The
    filtered union must apply every delivered id EXACTLY once."""
    import pandas as pd

    from solace_apache_beam_spark.streaming.stateful import _hwm_filter

    rng = data.draw(st.randoms(use_true_random=False))
    queues = data.draw(st.integers(min_value=1, max_value=3))
    n_epochs = data.draw(st.integers(min_value=1, max_value=6))

    next_pos = {f"q{i}": 0 for i in range(queues)}
    hwm: dict = {}
    applied: dict[str, list[int]] = {f"q{i}": [] for i in range(queues)}

    for _ in range(n_epochs):
        # build this epoch's delivery: per queue, optionally rewind
        # (replay), then deliver a contiguous range from the position
        rows = []
        for q in next_pos:
            if next_pos[q] > 0 and data.draw(st.booleans()):
                start = data.draw(
                    st.integers(min_value=0, max_value=next_pos[q] - 1)
                )
            else:
                start = next_pos[q]
            count = data.draw(st.integers(min_value=0, max_value=8))
            end = max(next_pos[q], start + count)
            rows += [(q, i) for i in range(start, max(end, start))]
            next_pos[q] = end
        if not rows:
            continue
        # arbitrary chunk split + arbitrary chunk order
        rng.shuffle(rows)
        n_chunks = data.draw(st.integers(min_value=1, max_value=4))
        chunks = [rows[i::n_chunks] for i in range(n_chunks)]
        hwm0 = dict(hwm)
        hwm_new = dict(hwm0)
        if data.draw(st.booleans()):
            # funnel_progress-shaped misuse (ADVICE r10): concatenate the
            # chunks WITHOUT ignore_index so the frame carries duplicate
            # index labels — the kernel must normalize, not cross-corrupt
            frames = [
                pd.DataFrame(c, columns=["queue", "mid"]) for c in chunks if c
            ]
            calls = [pd.concat(frames)] if frames else []
        else:
            calls = [
                pd.DataFrame(c, columns=["queue", "mid"]) for c in chunks if c
            ]
        for pdf in calls:
            fresh = _hwm_filter(pdf, "queue", "mid", hwm0, hwm_new, "prop")
            for q, i in fresh.itertuples(index=False):
                applied[q].append(int(i))
        hwm = hwm_new

    for q, ids in applied.items():
        assert sorted(ids) == list(range(next_pos[q])), (
            f"{q}: applied {sorted(ids)} != exactly-once "
            f"[0, {next_pos[q]})"
        )
        assert hwm.get(q, -1) == next_pos[q] - 1


def test_hwm_filter_rejects_null_queue_and_null_id():
    """Both dedupe columns fail loudly on NULLs: a NULL id would be
    silently uncounted (ADVICE r9), and a NULL queue would silently
    BYPASS dedup (pandas groupby drops NaN groups — the row would stay
    kept, never filtered, never advancing any mark)."""
    import pandas as pd
    import pytest

    from solace_apache_beam_spark.streaming.stateful import _hwm_filter

    with pytest.raises(ValueError, match="NULL id"):
        _hwm_filter(
            pd.DataFrame({"q": ["a"], "mid": [None]}), "q", "mid", {}, {}, "t"
        )
    with pytest.raises(ValueError, match="NULL queue"):
        _hwm_filter(
            pd.DataFrame({"q": [None], "mid": [1]}), "q", "mid", {}, {}, "t"
        )


# ---------------------------------------------------------------------------
# Randomized sessionize differential vs a pure-Python gap partition
# ---------------------------------------------------------------------------


def _gap_partition(ts_list: list[int], gap: int) -> list[tuple[int, int, int]]:
    """Reference sessionization: (start, end, n) per session of a
    SORTED per-key timestamp list with the operator's gap rule
    (strictly more than `gap` seconds apart -> new session)."""
    out = []
    cur = None
    for t in sorted(ts_list):
        if cur is None:
            cur = [t, t, 1]
        elif t > cur[1] + gap:
            out.append(tuple(cur))
            cur = [t, t, 1]
        else:
            cur[1] = t
            cur[2] += 1
    if cur is not None:
        out.append(tuple(cur))
    return out


@settings(**SETTINGS)
@given(
    offsets=st.lists(
        st.tuples(
            st.sampled_from(["q1", "q2"]),  # key == queue (2 keys)
            st.integers(0, 300),  # event time, seconds
        ),
        min_size=1,
        max_size=24,
    ),
    dedupe=st.booleans(),
)
def test_streaming_sessionize_matches_gap_partition(spark, offsets, dedupe):
    """Randomized differential for sessionize (round 10): random event
    streams over two keys, delivered in per-key time order across TWO
    microbatches, against an independent pure-Python gap partition.

    The watermark delay (600 s) exceeds the whole event-time domain
    (300 s), which makes the comparison EXACT: the engine's late-row
    filter can never drop a cross-batch event (found by this very
    differential at delay 0 — a wave-2 event at ts == the restored
    watermark is engine-dropped before the operator sees it), and no
    timeout can fire (wm = max-600 < any end+gap), so the emitted set
    is precisely the split-closed sessions: every session of a key
    except its final one, with exact (start, end, n_events).

    `dedupe` runs the same stream through the hwm-map path — without
    replay the filter must be a provable no-op (same differential)."""
    from solace_apache_beam_spark.streaming.stateful import sessionize

    tmp = tempfile.mkdtemp(prefix="propsess_")
    per_key: dict[str, list[int]] = {"q1": [], "q2": []}
    for k, t in offsets:
        per_key[k].append(t)
    for k in per_key:
        per_key[k].sort()  # delivered in time order per key
        fake_broker.create_queue(tmp, k)

    # wave 1 = first half of each key's stream, wave 2 = the rest —
    # sessions must merge/split identically across the batch boundary
    def publish(wave: int) -> None:
        for k, ts in per_key.items():
            half = (len(ts) + 1) // 2
            chunk = ts[:half] if wave == 0 else ts[half:]
            if chunk:
                fake_broker.publish(
                    tmp,
                    k,
                    [f"m{t}" for t in chunk],
                    sender_timestamp_us=[
                        _BASE_US + t * 1_000_000 for t in chunk
                    ],
                )

    publish(0)
    stream = open_stream(spark, tmp, ["q1", "q2"], use_sender_timestamp=True)
    kw = {"dedupe_by": ("destination", "message_id")} if dedupe else {}
    name = f"propsess_{next(_seq)}"
    q = (
        sessionize(stream, gap_seconds=30, watermark="600 seconds", **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "cp"))
        .start()
    )
    q.processAllAvailable()
    publish(1)
    q.processAllAvailable()
    q.stop()

    rows = spark.sql(
        f"SELECT key, session_start, session_end, n_events FROM {name}"
    ).collect()
    emitted: dict[str, list[tuple[int, int, int]]] = {"q1": [], "q2": []}
    for r in rows:
        emitted[r.key].append(
            (
                int(r.session_start.timestamp() - _BASE_US / 1_000_000),
                int(r.session_end.timestamp() - _BASE_US / 1_000_000),
                r.n_events,
            )
        )
    for k, ts in per_key.items():
        want = _gap_partition(ts, 30)
        got = sorted(emitted[k])
        must_close = want[:-1]  # every non-final session splits closed
        assert got == must_close, (
            f"{k}: emitted {got}, expected exactly {must_close} (of {want})"
        )


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2", "u3"]),
            st.sampled_from(["view", "click", "purchase", "noise"]),
            st.integers(0, 120),
        ),
        min_size=1,
        max_size=24,
    ),
    dedupe=st.booleans(),
)
def test_streaming_funnel_matches_batch_funnel_in_order(spark, events, dedupe):
    """Randomized differential for funnel_progress vs the BATCH funnel
    (round 10): under globally (ts, id)-sorted delivery the online
    monotone machine IS greedy earliest-match — the first qualifying
    event encountered at each stage is the earliest one — so the
    per-stage user counts must equal funnel_counts' exactly. Delivery
    is split into two microbatches at the sorted midpoint (per-key
    monotone across the boundary, so the machine's frontier carries).
    `dedupe` routes the same stream through the per-(key,queue) hwm
    map, which must be a no-op without replay."""
    from solace_apache_beam_spark.operators.temporal import funnel_counts
    from solace_apache_beam_spark.streaming.stateful import funnel_progress

    stages = ("view", "click", "purchase")
    tmp = tempfile.mkdtemp(prefix="propfun_")
    fake_broker.create_queue(tmp, "q1")
    ordered = sorted(events, key=lambda e: e[2])

    half = (len(ordered) + 1) // 2
    for chunk in (ordered[:half], ordered[half:]):
        if chunk:
            fake_broker.publish(
                tmp,
                "q1",
                [f"{u}:{t}" for u, t, _ in chunk],
                sender_timestamp_us=[
                    _BASE_US + s * 1_000_000 for _, _, s in chunk
                ],
            )
    # publishing both waves up front still yields one batch; the
    # split-into-two-batches variant is covered by the sessionize
    # differential — here the batch boundary is exercised via the
    # broker's batch cap instead
    stream = open_stream(
        spark, tmp, ["q1"], use_sender_timestamp=True, max_records_per_batch=7
    ).select(
        F.split("payload", ":")[0].alias("user"),
        F.split("payload", ":")[1].alias("stage_name"),
        "event_time",
        "message_id",
        "destination",
    )
    kw = {"dedupe_by": ("destination", "message_id")} if dedupe else {}
    name = f"propfun_{next(_seq)}"
    q = (
        funnel_progress(stream, stages, key_col="user", **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp, "cp"))
        .start()
    )
    for _ in range(6):
        q.processAllAvailable()
    q.stop()

    final = {
        r.key: r.s
        for r in spark.sql(
            f"SELECT key, max(stage_reached) s FROM {name} GROUP BY key"
        ).collect()
    }
    got = {
        s: sum(1 for v in final.values() if v >= s) for s in (1, 2, 3)
    }

    batch = spark.createDataFrame(
        [
            (u, t, _BASE_US + s * 1_000_000, i)
            for i, (u, t, s) in enumerate(ordered)
        ],
        "user string, event_type string, us long, event_id long",
    ).select(
        "user",
        "event_type",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_id",
    )
    want = {
        r.stage_idx: r.n_users
        for r in funnel_counts(
            batch, stages, user_col="user", ts_col="ts",
            id_col="event_id", type_col="event_type",
        ).collect()
    }
    want = {s: want.get(s, 0) for s in (1, 2, 3)}
    assert got == want, f"streaming {got} != batch {want}"
