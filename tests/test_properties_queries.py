"""Query-level randomized differential harness: for each hypothesis
example, a randomized ``events`` table (null-dense timestamps/users/
values, 10-minute-grid times so window and session-gap BOUNDARIES are
common, funnel-stage event types) is written as parquet; every
events-only registered query then runs through its real entry point
(``queries()[name](spark, tmp_dir)``) while its registry oracle runs
in DuckDB over the same file — the exact driver-gate comparison, but
on adversarial data instead of the fixed corpus.

Deliberate domain constraints (documented nondeterminism, not gaps):
``event_id`` is unique and non-null — a dedup group whose ids are ALL
NULL picks its representative arbitrarily on both engines (see
dedup_by_representative_key's docstring), and duplicate (ts, event_id)
order-by pairs make lag()/running sums order-ambiguous on both; both
are contracts, not comparable behavior.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._fuzz import n_examples

import __spark_entry__ as e

SETTINGS = dict(
    max_examples=n_examples(6, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = dt.datetime(2024, 1, 10, 0, 0, 0)


def _release(sdf) -> None:
    """Release every cache handle a query result may carry (the
    plan-cache contract, plus the stricter release-only-when-done
    checkpoint/rescue handles — safe here: the result is collected)."""
    for attr in ("plan_caches", "checkpoint_caches", "rescue_caches"):
        h = getattr(sdf, attr, None)
        if h is not None:
            h.unpersist()



# events-only queries whose oracles encode hand-written window/session/
# frontier/null semantics — the highest-risk restatements in the repo
QUERY_NAMES = (
    "count_per_window_global",
    "sliding_window_count",
    "session_window_count",
    "dedup_by_representative_key",
    "analytic_user_running",
    "data_quality_events",
    "hypertable_rollup_events",
    "percentiles_event_value",
    "funnel_view_click_purchase",
    "asof_click_view",
    "range_join_error_clicks",
    "json_payload_parse",
    "payload_extract",
    "envelope_project",
)

# props: VALID JSON only — malformed-JSON tolerance is parser-defined
# (Spark's get_json_object accepts garbage DuckDB's strict parser
# rejects) and documented out of the parity contract on
# json_payload_parse; $.k spans ints, overflow, floats (Spark must NOT
# round '5.9'), numeric/padded/alpha strings, bools, arrays, objects,
# null and missing
_props = st.one_of(
    st.none(),
    st.just("{}"),
    st.sampled_from(
        [
            '{"k": 5}', '{"k": -3}', '{"k": 0}', '{"k": 5.9}',
            '{"k": "7"}', '{"k": " 7 "}', '{"k": "007"}', '{"k": "x"}',
            '{"k": null}', '{"k": true}', '{"k": [1]}', '{"k": {"a": 1}}',
            '{"k": 123456789012345678901}', '{"j": 5}',
        ]
    ),
)

_row = st.tuples(
    st.one_of(st.none(), st.integers(0, 18)),  # ts: 10-min grid steps
    st.one_of(st.none(), st.integers(0, 2)),  # user_id
    st.sampled_from(["view", "click", "purchase", "error", "signup", "bogus"]),
    st.one_of(st.none(), st.integers(-3, 9).map(lambda i: i / 2.0)),  # value
    _props,
)


def _write_events(rows, dirpath: str) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [
                    None if r[0] is None else _BASE + dt.timedelta(minutes=10 * r[0])
                    for r in rows
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, f"{dirpath}/events.parquet")


@settings(**SETTINGS)
@given(rows=st.lists(_row, min_size=1, max_size=30))
def test_events_queries_match_oracles_on_random_data(spark, rows):
    qs, oracles = e.queries(), e.oracle_sql()
    tmp = tempfile.mkdtemp(prefix="propq_")
    try:
        _write_events(rows, tmp)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp}/events.parquet')"
        )
        for name in QUERY_NAMES:
            sdf = qs[name](spark, tmp)
            got = sorted(
                tuple(str(x) for x in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            )
            res = con.execute(oracles[name])
            cols = [d[0] for d in res.description]
            idx = sorted(range(len(cols)), key=lambda i: cols[i])
            want = sorted(
                tuple(str(r[i]) for i in idx) for r in res.fetchall()
            )
            assert got == want, f"{name}: spark={got[:4]}... oracle={want[:4]}..."
            _release(sdf)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -------------------------------------------------- documents harness

# small shared vocabulary: exact dups, near-dups, shared shingles and
# repeated tokens must be COMMON so the dedup/minhash/repetition paths
# light up; tokens carry unicode and in-token punctuation so the
# tokenizer split points matter
_VOCAB = (
    "the", "cat", "sat", "on", "mat", "el", "perro", "niño",
    "漢字", "42", "x!y", "a,b",
)
_doc_text = st.one_of(
    st.none(),
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(" ".join),
)

# documents-only registered queries with deterministic contracts; the
# multimodal family is NOT here — it gets its own arms below (wider
# unicode text than this vocab corpus, plus a raw-binary operator arm)
DOC_QUERY_NAMES = (
    "wordcount_global",
    "windowed_wordcount",
    "observed_metrics",
    "text_quality",
    "text_language_id",
    "text_token_counts",
    "text_fingerprint",
    "text_repetition",
    "vocab_top_words",
    "chunk_documents",
    "sequence_packing",
    "dedup_exact",
    "minhash_band_hashes",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_simhash_pairs_auto",
    "dedup_minhash_lsh",
    "dedup_minhash_rescue",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_rate_report",
    "incremental_dedup",
    "decontamination_report",
    "sample_documents_10pct",
    "split_train_val_test",
    "training_shuffle_manifest",
    "training_shard_stats",
    "training_data_pipeline",
    "bm25_components",
    "corpus_stats",
    "source_quality_gate",
)
# NOT in any arm: text_normalize / text_pii_redact (query-level
# random-text differential lives in test_properties_fragments) and
# protobuf_roundtrip (wire-level property tests in test_protobuf)


def _write_documents(rows, dirpath: str) -> None:
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[0] for r in rows], pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array(
                [None if r[0] is None else len(r[0]) for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, f"{dirpath}/documents.parquet")


@settings(max_examples=n_examples(5, 1), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            _doc_text,
            st.sampled_from(["en", "es", None]),
            st.sampled_from(["web", "book", None]),
        ),
        min_size=2,
        max_size=18,
    )
)
def test_documents_queries_match_oracles_on_random_data(spark, rows):
    qs, oracles = e.queries(), e.oracle_sql()
    tmp = tempfile.mkdtemp(prefix="propd_")
    try:
        _write_documents(rows, tmp)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp}/documents.parquet')"
        )
        for name in DOC_QUERY_NAMES:
            sdf = qs[name](spark, tmp)
            got = sorted(
                tuple(str(x) for x in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            )
            res = con.execute(oracles[name])
            cols = [d[0] for d in res.description]
            idx = sorted(range(len(cols)), key=lambda i: cols[i])
            want = sorted(
                tuple(str(r[i]) for i in idx) for r in res.fetchall()
            )
            assert got == want, f"{name}: spark={got[:4]}... oracle={want[:4]}..."
            _release(sdf)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ------------------------------------------------ multimodal harness

# round 9: the multimodal oracles were restated over hex(encode(text))
# — every UTF-8 BYTE is a hex pair on both engines — so the former
# pure-ASCII corpus contract is GONE and this arm fuzzes arbitrary
# unicode text (multi-byte UTF-8, combining marks, astral codepoints;
# surrogates excluded — they are not encodable strings on any engine).
# Long repeated runs so frame sampling and resize cells see multi-frame
# payloads; empty strings and NULLs exercise the absent-media paths.
_unicode_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.one_of(
            st.sampled_from("abcXYZ 0123456789 .,!?-_"),
            st.sampled_from("éñ漢字🙂́  "),
            st.characters(blacklist_categories=("Cs",)),
        ),
        min_size=0,
        max_size=200,
    ),
)

MM_QUERY_NAMES = (
    "multimodal_metadata",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
)


@settings(max_examples=n_examples(5, 2), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            _unicode_text,
            st.sampled_from(["en", None]),
            st.sampled_from(["web", None]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_multimodal_queries_match_oracles_on_unicode_data(spark, rows):
    qs, oracles = e.queries(), e.oracle_sql()
    tmp = tempfile.mkdtemp(prefix="propm_")
    try:
        _write_documents(rows, tmp)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp}/documents.parquet')"
        )
        for name in MM_QUERY_NAMES:
            sdf = qs[name](spark, tmp)
            got = sorted(
                tuple(str(x) for x in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            )
            res = con.execute(oracles[name])
            cols = [d[0] for d in res.description]
            idx = sorted(range(len(cols)), key=lambda i: cols[i])
            want = sorted(
                tuple(str(r[i]) for i in idx) for r in res.fetchall()
            )
            assert got == want, f"{name}: spark={got[:4]}... oracle={want[:4]}..."
            _release(sdf)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# true-binary arm (VERDICT r8 Next #5): the registered queries reach
# the operators through attach_binary_payload(text), which can only
# produce valid UTF-8 — but the operators' contract is ARBITRARY bytes
# (real media). This arm feeds raw random payloads (invalid-UTF-8
# sequences, lone 0x80-0xFF bytes, embedded NULs) straight into the
# operators and replays them in DuckDB over hex(payload) on a BLOB
# column — the same hex restatement the registered oracles use.
_payload = st.one_of(
    st.none(),
    st.binary(min_size=0, max_size=300),
    # guaranteed-invalid UTF-8 shapes: continuation bytes alone,
    # truncated multi-byte heads, overlong-ish sequences
    st.sampled_from(
        [b"\x80\x80", b"\xff\xfe\xfd", b"\xc3", b"a\x80b", b"\x00" * 70,
         b"\xe2\x82", b"\xf0\x9f\x98" * 30]
    ),
)

_MM_BINARY_ORACLES = {
    "features": """
    WITH d AS (SELECT doc_id, hex(payload) AS hx,
                      octet_length(payload) AS total
               FROM media WHERE payload IS NOT NULL),
    pos AS (SELECT doc_id, hx, total,
                   unnest(generate_series(1, total)) AS i FROM d),
    cnt AS (SELECT doc_id,
                   ('0x' || substr(hx, 2 * i - 1, 2))::INT % 16 AS bin,
                   count(*) AS c
            FROM pos GROUP BY 1, 2),
    bins AS (SELECT doc_id, total, unnest(generate_series(0, 15)) AS bin
             FROM d)
    SELECT bins.doc_id, CAST(bins.bin AS INT) AS bin,
           CASE WHEN bins.total = 0 THEN 0.0
                ELSE coalesce(cnt.c, 0) / CAST(bins.total AS DOUBLE) END AS value
    FROM bins LEFT JOIN cnt ON bins.doc_id = cnt.doc_id AND bins.bin = cnt.bin
    """,
    "resize": """
    WITH d AS (SELECT doc_id, hex(payload) AS hx,
                      octet_length(payload) AS n
               FROM media WHERE octet_length(payload) > 0),
    b AS (SELECT doc_id, n, unnest(generate_series(1, n)) AS i, hx FROM d),
    c AS (SELECT doc_id, CAST(((i - 1) * 8) // n AS INT) AS cell,
                 ('0x' || substr(hx, 2 * i - 1, 2))::INT AS v FROM b)
    SELECT doc_id, cell, sum(v) * 1.0 / count(*) AS value
    FROM c GROUP BY 1, 2
    """,
    "frames": """
    WITH d AS (SELECT doc_id, hex(payload) AS hx,
                      octet_length(payload) AS nb FROM media),
    f AS (SELECT doc_id, unnest(generate_series(0, nb // 64 - 1)) AS fi, hx
          FROM d)
    SELECT doc_id, CAST(fi AS INT) AS frame_idx,
           md5(substr(hx, fi * 128 + 1, 128)) AS frame_md5
    FROM f WHERE fi % 4 = 0
    """,
}


@settings(max_examples=n_examples(5, 2), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(payloads=st.lists(_payload, min_size=1, max_size=12))
def test_multimodal_operators_match_oracles_on_raw_binary(spark, payloads):
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.multimodal import (
        extract_features,
        frame_sample,
        resize_payload,
    )

    tmp = tempfile.mkdtemp(prefix="propb_")
    try:
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(payloads)), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
        pq.write_table(tbl, f"{tmp}/media.parquet")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW media AS SELECT * FROM read_parquet('{tmp}/media.parquet')"
        )
        media = spark.read.parquet(f"{tmp}/media.parquet")
        feats = extract_features(media).select(
            "doc_id", F.posexplode("features").alias("bin", "value")
        ).withColumn("bin", F.col("bin").cast("int"))
        frames = frame_sample(media).select(
            "doc_id", "frame_idx", F.md5(F.hex("frame")).alias("frame_md5")
        )
        for sdf, oracle in (
            (feats, _MM_BINARY_ORACLES["features"]),
            (resize_payload(media), _MM_BINARY_ORACLES["resize"]),
            (frames, _MM_BINARY_ORACLES["frames"]),
        ):
            got = sorted(
                tuple(str(x) for x in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            )
            res = con.execute(oracle)
            cols = [d[0] for d in res.description]
            idx = sorted(range(len(cols)), key=lambda i: cols[i])
            want = sorted(
                tuple(str(r[i]) for i in idx) for r in res.fetchall()
            )
            assert got == want, f"spark={got[:4]}... oracle={want[:4]}..."
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -------------------------------------------------- embeddings harness

# exact-grid float32 components (i/4): duplicate vectors, orthogonal
# pairs and ZERO vectors (norm 0 — every cosine involving one must be
# excluded, not NaN-ranked) are all common
_vec = st.one_of(
    st.none(),
    st.lists(st.integers(-8, 8).map(lambda i: i / 4.0), min_size=3, max_size=3),
)

EMB_QUERY_NAMES = (
    "knn_brute_cosine",
    "ann_lsh_cosine",
    "ann_ivf_cosine",
    "ivf_kmeans_assign",
    # embedding_neardup (fixed exact route) retired round 13 into
    # embedding_neardup_auto: same oracle verbatim, auto routes to the
    # exact kernel at every gate scale; the exact route keeps kernel
    # coverage in test_properties_similarity.test_neardup_pairs_
    # matches_reference(route="exact")
    "embedding_neardup_auto",
    "embedding_neardup_lsh",
    "embedding_coverage",
)


def _write_embeddings(vecs, dirpath: str) -> None:
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(vecs))], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{dirpath}/embeddings.parquet")


@settings(max_examples=n_examples(5, 1), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=st.lists(_vec, min_size=2, max_size=14))
def test_embeddings_queries_match_oracles_on_random_data(spark, vecs):
    qs, oracles = e.queries(), e.oracle_sql()
    tmp = tempfile.mkdtemp(prefix="prope_")
    try:
        _write_embeddings(vecs, tmp)
        # embedding_coverage joins documents: ids aligned with vec_ids
        _write_documents([("doc", "en", "web")] * len(vecs), tmp)
        con = duckdb.connect()
        for t in ("embeddings", "documents"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{t}.parquet')"
            )
        for name in EMB_QUERY_NAMES:
            sdf = qs[name](spark, tmp)
            got = sorted(
                tuple(str(x) for x in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            )
            res = con.execute(oracles[name])
            cols = [d[0] for d in res.description]
            idx = sorted(range(len(cols)), key=lambda i: cols[i])
            want = sorted(
                tuple(str(r[i]) for i in idx) for r in res.fetchall()
            )
            assert got == want, f"{name}: spark={got[:4]}... oracle={want[:4]}..."
            _release(sdf)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -------------------------------------------------- relational harness

REL_QUERY_NAMES = (
    "tpch_q1_pricing_summary",
    "revenue_by_nation",
    "top_customers_per_segment",
    "set_ops_custkeys",
    "rollup_pricing",
    "pivot_linestatus",
    "cube_order_stats",
    "customers_without_orders",
    "suppliers_with_large_parts",
    "tpch_q3_shipping_priority",
    "salted_revenue_by_segment",
    "orders_above_customer_avg",
    "expectation_report_lineitem",
    "stratified_sample_lineitem",
    "kmv_distinct_parts",
)

# Money/quantity on a <=2-fractional-decimal grid and discount/tax on
# the TPC-H 0.01 grid: the double->DECIMAL(_,4/6) casts then only
# NORMALIZE (the true product of 2dp x 2dp inputs fits 4dp; x another
# 2dp fits 6dp) and both engines agree bit-for-bit. This is the
# engines' decimal-cast parity CONTRACT, not a dodge: with a finer
# grid (measured with discount = i/400, extended fuzz r8) the product
# carries >4 true decimals and the cast must ROUND — Spark rounds the
# double's SHORTEST DECIMAL REPR half-up (BigDecimal.valueOf) while
# DuckDB rounds the BINARY value scaled, and at a repr-half boundary
# (e.g. 282006.5 * 0.9225 = 260150.99625 -> .9963 vs .9962) they
# differ by one last-place digit. The gate data is TPC-H-shaped (2dp
# money, 0.01-step discounts), inside the contract.
_money = st.one_of(st.none(), st.integers(0, 2_000_000).map(lambda i: i / 4.0))
_qty = st.one_of(st.none(), st.integers(0, 220).map(lambda i: i / 4.0))
_rate01 = st.one_of(st.none(), st.integers(0, 10).map(lambda i: i / 100.0))

_order = st.tuples(
    st.one_of(st.none(), st.integers(0, 5)),  # o_custkey (NULL FKs common)
    st.sampled_from(["O", "F", "P"]),
    _money,
    st.one_of(st.none(), st.integers(0, 2400)),  # orderdate: day offset
    st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
)
_line = st.tuples(
    st.one_of(st.none(), st.integers(0, 9)),  # l_orderkey (may dangle/NULL)
    st.integers(0, 6),  # l_partkey
    st.integers(0, 4),  # l_suppkey
    _qty,
    _money,
    _rate01,  # disc: 0.01 grid (see the decimal-cast contract above)
    _rate01,  # tax
    st.sampled_from(["A", "N", "R"]),
    st.sampled_from(["O", "F"]),
    st.one_of(st.none(), st.integers(0, 2400)),  # shipdate: day offset
)

_D0 = dt.datetime(1992, 1, 1)


def _write_relational(orders, lines, dirpath: str) -> None:
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["AMERICA", "ASIA"], pa.string()),
            }
        ),
        f"{dirpath}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2], pa.int32()),
                "n_name": pa.array(["US", "JP", "BR"], pa.string()),
                "n_regionkey": pa.array([0, 1, 0], pa.int32()),
            }
        ),
        f"{dirpath}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(6), pa.int64()),
                "c_name": pa.array([f"cust{i}" for i in range(6)], pa.string()),
                "c_nationkey": pa.array([0, 1, 2, 0, 1, 2], pa.int32()),
                "c_acctbal": pa.array([i * 10.25 for i in range(6)], pa.float64()),
                "c_mktsegment": pa.array(
                    ["BUILDING", "AUTO", None, "BUILDING", "MACHINERY", "AUTO"],
                    pa.string(),
                ),
            }
        ),
        f"{dirpath}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(5), pa.int64()),
                "s_name": pa.array([f"sup{i}" for i in range(5)], pa.string()),
                "s_nationkey": pa.array([0, 1, 2, 0, 1], pa.int32()),
                "s_acctbal": pa.array([i * 7.5 for i in range(5)], pa.float64()),
            }
        ),
        f"{dirpath}/supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(7), pa.int64()),
                "p_name": pa.array([f"part{i}" for i in range(7)], pa.string()),
                "p_brand": pa.array([f"B{i % 2}" for i in range(7)], pa.string()),
                "p_type": pa.array([f"T{i % 3}" for i in range(7)], pa.string()),
                "p_size": pa.array([i * 10 for i in range(7)], pa.int32()),
                "p_retailprice": pa.array([i * 99.25 for i in range(7)], pa.float64()),
            }
        ),
        f"{dirpath}/part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(orders)), pa.int64()),
                "o_custkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_orderstatus": pa.array([o[1] for o in orders], pa.string()),
                "o_totalprice": pa.array([o[2] for o in orders], pa.float64()),
                "o_orderdate": pa.array(
                    [
                        None if o[3] is None else _D0 + dt.timedelta(days=o[3])
                        for o in orders
                    ],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array([o[4] for o in orders], pa.string()),
            }
        ),
        f"{dirpath}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([ln[0] for ln in lines], pa.int64()),
                "l_partkey": pa.array([ln[1] for ln in lines], pa.int64()),
                "l_suppkey": pa.array([ln[2] for ln in lines], pa.int64()),
                "l_linenumber": pa.array(
                    list(range(1, len(lines) + 1)), pa.int32()
                ),
                "l_quantity": pa.array([ln[3] for ln in lines], pa.float64()),
                "l_extendedprice": pa.array([ln[4] for ln in lines], pa.float64()),
                "l_discount": pa.array([ln[5] for ln in lines], pa.float64()),
                "l_tax": pa.array([ln[6] for ln in lines], pa.float64()),
                "l_returnflag": pa.array([ln[7] for ln in lines], pa.string()),
                "l_linestatus": pa.array([ln[8] for ln in lines], pa.string()),
                "l_shipdate": pa.array(
                    [
                        None if ln[9] is None else _D0 + dt.timedelta(days=ln[9])
                        for ln in lines
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        f"{dirpath}/lineitem.parquet",
    )


@settings(max_examples=n_examples(5, 1), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    orders=st.lists(_order, min_size=1, max_size=14),
    lines=st.lists(_line, min_size=1, max_size=20),
)
def test_relational_queries_match_oracles_on_random_data(spark, orders, lines):
    qs, oracles = e.queries(), e.oracle_sql()
    tmp = tempfile.mkdtemp(prefix="propr_")
    try:
        _write_relational(orders, lines, tmp)
        con = duckdb.connect()
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{t}.parquet')"
            )
        for name in REL_QUERY_NAMES:
            sdf = qs[name](spark, tmp)
            got = sorted(
                tuple(str(x) for x in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            )
            res = con.execute(oracles[name])
            cols = [d[0] for d in res.description]
            idx = sorted(range(len(cols)), key=lambda i: cols[i])
            want = sorted(
                tuple(str(r[i]) for i in idx) for r in res.fetchall()
            )
            assert got == want, f"{name}: spark={got[:4]}... oracle={want[:4]}..."
            _release(sdf)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
