"""Degenerate-input sweep: every registered query must execute on
EMPTY tables (same schemas, zero rows) without crashing — the guard
for partition pruning / first-day deployments / filtered-to-nothing
upstreams at scale. Queries legitimately return zero (or aggregate
default) rows; what they must not do is throw."""

from __future__ import annotations

import os

import pytest

from solace_apache_beam_spark.registry import all_queries

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    """Zero-row copies of every table with the EXACT parquet schema of
    the source (pyarrow round-trip — a SQL `LIMIT 0` copy would rewrite
    events' TIMESTAMP(NANOS) column as plain timestamp and dodge the
    very read path being exercised)."""
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        schema = pq.read_schema(src)
        pq.write_table(schema.empty_table(), f"{out}/{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_survives_empty_tables(name, spark, empty_sf_dir):
    df = all_queries()[name](spark, empty_sf_dir)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def nullrow_sf_dir(tmp_path_factory, sf_dir):
    """One-row copies of every table: key (first) column = 0/epoch,
    every nullable non-key column NULL — the degenerate-record probe
    (undecodable payloads, missing embeddings, null text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("sf_nullrow")
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        schema = pq.read_schema(src)
        def zero_of(t):
            if pa.types.is_integer(t):
                return 0
            if pa.types.is_floating(t):
                return 0.0
            if pa.types.is_decimal(t):
                return 0
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                return ""
            if pa.types.is_binary(t) or pa.types.is_large_binary(t):
                return b""
            if pa.types.is_boolean(t):
                return False
            if pa.types.is_date(t):
                return 0
            if pa.types.is_list(t) or pa.types.is_large_list(t):
                return []
            raise AssertionError(f"no zero value for {t}")

        arrays = []
        for i, field in enumerate(schema):
            if i == 0:
                # key column: a real value (ids are int64 across tables)
                arrays.append(pa.array([0], type=field.type))
            elif pa.types.is_timestamp(field.type):
                # keep timestamps real — sources guarantee event time
                # (pyarrow converts the datetime into the field's unit)
                import datetime as _dt

                arrays.append(
                    pa.array([_dt.datetime(2023, 11, 14, 22, 13, 20)], type=field.type)
                )
            elif not field.nullable:
                # a required column can't carry NULL — use a zero value
                arrays.append(pa.array([zero_of(field.type)], type=field.type))
            else:
                arrays.append(pa.array([None], type=field.type))
        pq.write_table(pa.Table.from_arrays(arrays, schema=schema), f"{out}/{t}.parquet")
    return str(out)


# full tier (VERDICT r8 Next #4): the one-NULL-row sweep is strictly
# dominated per-round by the randomized harness arms, which fuzz
# NULL-dense texts/embeddings/timestamps/values through the same entry
# points on every default run — this fixed probe adds 74 more Spark
# executions (~30 s) for shapes the arms already cover, so it runs
# under SPARK_GRAFT_FUZZ_FULL=1 (scripts/preflight, round close). The
# EMPTY-table sweep above stays in the default tier: zero-row inputs
# are the one shape the arms' min_size bounds never produce.
@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FUZZ_FULL") != "1",
    reason="full tier: set SPARK_GRAFT_FUZZ_FULL=1 (preflight does)",
)
@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_survives_null_rows(name, spark, nullrow_sf_dir):
    df = all_queries()[name](spark, nullrow_sf_dir)
    assert df.count() >= 0


def test_round6_helpers_survive_empty_and_trivial_inputs(spark):
    """The round-6 non-registry APIs (corpus index, bucket telemetry)
    get the same empty/degenerate sweep the registry queries get from
    the fixtures above: empty corpora, unshingleable docs, all three
    telemetry families."""
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.dedup import (
        build_corpus_index,
        incremental_dedup,
        pair_bucket_stats,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    short = spark.createDataFrame([(1, "hi")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w q")],
        "doc_id long, text string",
    )

    for fam in ("minhash", "simhash", "ngram"):
        s = pair_bucket_stats(empty, fam)
        assert s == {"dropped_buckets": 0, "total_buckets": 0}, fam
        s = pair_bucket_stats(short, fam)
        assert s["dropped_buckets"] == 0, fam

    # empty corpus index: every new doc comes out unique
    idx = build_corpus_index(empty)
    out = {r.doc_id: r.status for r in incremental_dedup(docs, corpus_index=idx).collect()}
    assert out == {1: "unique", 2: "unique", 3: "unique"}

    # empty batch against a real index: zero rows, stable schema
    idx2 = build_corpus_index(docs)
    res = incremental_dedup(empty, corpus_index=idx2)
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == [
        "doc_id", "status", "match_id", "jaccard",
    ]


def test_round7_helpers_survive_empty_and_trivial_inputs(spark):
    """Round-7 non-registry APIs get the same degenerate sweep: the
    rescue composition and the auto-banded simhash path must come back
    empty with stable schemas on empty/unshingleable corpora, never
    raise."""
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.dedup import (
        minhash_lsh_pairs_rescue,
        simhash_auto_bands,
        simhash_hamming_pairs,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    short = spark.createDataFrame([(1, "hi")], "doc_id long, text string")
    part = F.col("doc_id") % 2 == 0

    for df in (empty, short):
        out = minhash_lsh_pairs_rescue(df, part)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "doc_a", "doc_b", "jaccard", "source",
        ]
        auto = simhash_hamming_pairs(df, n_bands="auto")
        assert auto.count() == 0
        assert [f.name for f in auto.schema.fields] == [
            "doc_a", "doc_b", "hamming",
        ]

    # n_docs=0 keeps the preferred band count
    assert simhash_auto_bands(0) == 4
