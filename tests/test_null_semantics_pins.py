"""Deterministic regression pins for the NULL/boundary semantics the
round-8 randomized harness uncovered (tests/test_properties_queries.py
found them; these fixed inputs make each one a permanent, fuzz-luck-
independent assertion). One pin per finding, each asserting the
SPARK-side behavior the restated oracles encode."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_analytic_window_ranks_null_ts_last(spark):
    """Finding 1: window order is explicitly NULLS LAST (SQL/DuckDB
    convention) — a NULL-ts event must rank AFTER every timed one."""
    import __spark_entry__ as e
    import datetime as dt
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="nullpin_")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1], pa.int64()),
                "ts": pa.array([None, dt.datetime(2024, 1, 1)], pa.timestamp("us")),
                "user_id": pa.array([7, 7], pa.int64()),
                "event_type": pa.array(["view", "view"], pa.string()),
                "value": pa.array([1.0, 2.0], pa.float64()),
                "props": pa.array(["{}", "{}"], pa.string()),
            }
        ),
        f"{tmp}/events.parquet",
    )
    rows = {r.event_id: r.rn for r in
            e.queries()["analytic_user_running"](spark, tmp).collect()}
    assert rows == {1: 1, 0: 2}  # timed row first, NULL-ts row last


def test_session_window_merges_exact_gap_touch(spark):
    """Finding 2: two events exactly `gap` apart MERGE (inclusive
    touch) — pinned directly on the operator."""
    import datetime as dt

    from solace_apache_beam_spark.operators.windows import session_count

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(minutes=30))], "user_id long, ts timestamp"
    )
    out = session_count(df, "ts", "30 minutes", "user_id").collect()
    assert len(out) == 1 and out[0].cnt == 2


def test_stop_score_and_subwords_null_text_stay_null(spark):
    """Findings 3-4: aggregates over a NULL word array are NULL (the
    oracle coalesces only EMPTY lists), never 0."""
    from solace_apache_beam_spark.llm.text_analysis import (
        quality_score,
        token_counts,
    )

    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    q = {r.doc_id: (r.n_stopwords, r.stopword_ratio) for r in
         quality_score(df).collect()}
    assert q[1] == (None, None) and q[2] == (0, 0.0)
    t = {r.doc_id: r.n_subword_est for r in token_counts(df).collect()}
    assert t[1] is None and t[2] == 0


def test_fingerprint_null_text_is_null_not_zero(spark):
    """Finding 5: NULL text -> NULL fingerprint (0 is the valid
    fingerprint of EMPTY text; the UDF must not crash or alias them)."""
    from solace_apache_beam_spark.llm.text_analysis import fingerprints

    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    fp = {r.doc_id: r.fingerprint for r in fingerprints(df).collect()}
    assert fp[1] is None and fp[2] == 0


def test_null_embedding_rows_carry_no_vector(spark):
    """Finding 6: undecoded (NULL-embedding) rows are filtered by every
    packer/bucketizer — no phantom zero vector may score."""
    from solace_apache_beam_spark.llm.similarity import brute_force_topk, lsh_bucket

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {(r.query_id, r.neighbor_id) for r in
           brute_force_topk(df, df, "embedding", "vec_id", k=2).collect()}
    assert got == {(1, 3), (3, 1)}  # vec 2 neither queries nor matches
    assert {r.vec_id for r in lsh_bucket(df, "embedding", "vec_id").collect()} == {1, 3}


def test_json_parse_poison_payloads_yield_null(spark):
    """Finding 7: non-integer $.k parses to NULL under ANSI mode
    instead of failing the task (try_cast)."""
    import __spark_entry__ as e
    import datetime as dt
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="nullpin_")
    props = ['{"k": 5}', '{"k": "x"}', '{"k": [1]}', "not json", None]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(5), pa.int64()),
                "ts": pa.array([dt.datetime(2024, 1, 1)] * 5, pa.timestamp("us")),
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_type": pa.array(["view"] * 5, pa.string()),
                "value": pa.array([1.0] * 5, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
        f"{tmp}/events.parquet",
    )
    ks = {r.message_id: r.k for r in
          e.queries()["json_payload_parse"](spark, tmp).collect()}
    assert ks == {0: 5, 1: None, 2: None, 3: None, 4: None}


def test_protobuf_non_utf8_payload_decodes_to_null(spark):
    """protobuf poison pin (review finding): structurally-valid record,
    non-UTF-8 payload bytes -> NULL through the Arrow UDF, not a task
    failure."""
    from solace_apache_beam_spark.operators.protobuf_ops import decode_proto_test

    df = spark.createDataFrame(
        [(1, b"\x0a\x02\xff\xfe"), (2, b"\x0a\x02ok")], "id long, payload binary"
    )
    got = {r.id: r.t for r in
           df.select("id", decode_proto_test(F.col("payload")).alias("t")).collect()}
    assert got == {1: None, 2: "ok"}
