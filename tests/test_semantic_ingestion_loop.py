"""Batch-driven contract tests for the growing-corpus SEMANTIC dedup
screen (streaming/ingestion.make_semantic_ingestion_screen) — the
embedding twin of test_ingestion_loop.py, pinning the same three
restart guarantees on the vector path:

1. growth: a later epoch's copy (even a SCALED copy — cosine, not
   equality) of an earlier epoch's unique vector comes back
   semantic_dup with match_id = the earlier doc;
2. epoch re-execution: replaying an epoch leaves every sink unchanged;
3. replay marks: broker-replayed rows are dropped BEFORE the screen.

Vectors are orthogonal one-hots (cos exactly 0 between distinct docs,
exactly 1 for copies) so every status is forced, not probabilistic;
LSH bucket collisions between distinct one-hots are exact-verified
away by the in-bucket cosine."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from solace_apache_beam_spark.llm.similarity import build_vector_index
from solace_apache_beam_spark.streaming.ingestion import (
    make_semantic_ingestion_screen,
)

_DIM = 32
_PARAMS = dict(threshold=0.4, n_planes=4, n_tables=2)


def _vec(slot: int, scale: float = 1.0) -> list:
    v = [0.0] * _DIM
    v[slot % _DIM] = scale
    return v


def _statuses(status_dir: str) -> dict:
    rows = duckdb.connect().execute(
        f"""SELECT doc_id, status, match_id, CAST(_epoch_id AS BIGINT),
                   count(*)
            FROM read_parquet('{status_dir}/*/*.parquet',
                              hive_partitioning=1)
            GROUP BY 1, 2, 3, 4"""
    ).fetchall()
    assert all(r[4] == 1 for r in rows), f"duplicated rows: {rows}"
    return {r[0]: (r[1], r[2], r[3]) for r in rows}


@pytest.fixture(scope="module")
def base_index(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=c, embedding=_vec(c)) for c in range(20)]
    )
    return build_vector_index(
        corpus, "embedding", "doc_id",
        n_planes=_PARAMS["n_planes"], n_tables=_PARAMS["n_tables"],
    )


@pytest.fixture()
def loop(spark, base_index, tmp_path):
    dirs = {n: str(tmp_path / n) for n in ("status", "grown", "book")}
    screen = make_semantic_ingestion_screen(
        spark, base_index, dirs["status"], dirs["grown"], dirs["book"],
        doc_col="doc_id", vec_col="embedding", **_PARAMS,
    )
    yield spark, screen, dirs


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "destination string, message_id long, doc_id long, "
        "embedding array<double>",
    )


def test_semantic_growth_reexecution_and_replay_marks(loop):
    spark, screen, dirs = loop

    # epoch 0: a copy of base slot 3, two fresh slots, and an
    # intra-batch pair on slot 21 (greedy keep-first: the smaller id
    # keeps, the larger matches it)
    e0 = [
        ("q1", 0, 100, _vec(3)),
        ("q1", 1, 101, _vec(20)),
        ("q2", 0, 102, _vec(21)),
        ("q2", 1, 107, _vec(21)),
    ]
    screen(_batch(spark, e0), 0)
    got = _statuses(dirs["status"])
    assert got[100] == ("semantic_dup", 3, 0)
    assert got[101][0] == got[102][0] == "unique"
    assert got[107] == ("semantic_dup", 102, 0)

    # epoch 1: a copy of epoch-0's unique 101 -> must match the GROWN
    # index (101), not come back unique; plus a fresh unique
    e1 = [
        ("q1", 2, 103, _vec(20)),
        ("q2", 2, 104, _vec(22)),
    ]
    screen(_batch(spark, e1), 1)
    got = _statuses(dirs["status"])
    assert got[103] == ("semantic_dup", 101, 1), "the loop never grew"
    assert got[104][0] == "unique"

    # epoch-1 re-execution: every sink row REPLACED, not duplicated
    screen(_batch(spark, e1), 1)
    assert _statuses(dirs["status"]) == got

    # epoch 2: broker replay on q1 (ids <= committed mark 2) must be
    # dropped BEFORE the screen; a SCALED copy of grown 102 must match
    # on cosine (0.5 * e21 has cos exactly 1 with e21); a NULL vector
    # is unscreenable -> unique with NULL match, and never indexed
    e2 = [
        ("q1", 1, 101, _vec(20)),           # replayed
        ("q1", 2, 103, _vec(20)),           # replayed
        ("q1", 3, 105, _vec(23)),           # fresh unique
        ("q2", 3, 106, _vec(21, scale=0.5)),  # scaled copy of grown 102
        ("q2", 4, 108, None),               # NULL vector
    ]
    screen(_batch(spark, e2), 2)
    got = _statuses(dirs["status"])
    # replayed rows keep their original epoch rows, nothing re-screened
    assert got[101] == ("unique", None, 0)
    assert got[103] == ("semantic_dup", 101, 1)
    assert got[105][0] == "unique"
    assert got[106] == ("semantic_dup", 102, 2)
    assert got[108] == ("unique", None, 2)

    # epoch 3: a copy of the NULL-vector doc's slot can't match 108
    # (never indexed); a copy of 105's slot matches 105 (it was)
    e3 = [
        ("q1", 4, 109, _vec(23)),
        ("q2", 5, 110, _vec(24)),
    ]
    screen(_batch(spark, e3), 3)
    got = _statuses(dirs["status"])
    assert got[109] == ("semantic_dup", 105, 3)
    assert got[110][0] == "unique"


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FUZZ_FULL") != "1",
    reason="full tier: set SPARK_GRAFT_FUZZ_FULL=1 (preflight does)",
)
def test_semantic_screen_matches_sequential_fold(loop):
    """End-to-end exactness: the committed statuses equal a sequential
    fold of incremental_semantic_dedup over the same epochs, growing a
    reference index the same way — the same contract the minhash loop's
    soak pins, here at contract-test scale."""
    from solace_apache_beam_spark.llm.similarity import (
        incremental_semantic_dedup,
    )

    spark, screen, dirs = loop
    epochs = [
        [("q1", 3 * e + j, 200 + 3 * e + j, _vec((7 * e + 3 * j) % 12 + 15))
         for j in range(3)]
        for e in range(4)
    ]
    for e, rows in enumerate(epochs):
        screen(_batch(spark, rows), e)
    got = _statuses(dirs["status"])

    # reference fold with an independently grown index
    base = spark.createDataFrame(
        [Row(doc_id=c, embedding=_vec(c)) for c in range(20)]
    )
    idx = build_vector_index(
        base, "embedding", "doc_id",
        n_planes=_PARAMS["n_planes"], n_tables=_PARAMS["n_tables"],
    )
    want = {}
    for e, rows in enumerate(epochs):
        bdf = _batch(spark, rows).select("doc_id", "embedding")
        out = incremental_semantic_dedup(
            bdf, idx, "embedding", "doc_id",
            threshold=_PARAMS["threshold"],
            n_planes=_PARAMS["n_planes"], n_tables=_PARAMS["n_tables"],
        )
        res = out.collect()
        out.plan_caches.unpersist()
        for r in res:
            want[r.doc_id] = (r.status, r.match_id, e)
        keep = [r.doc_id for r in res if r.status == "unique"]
        grown = bdf.filter(F.col("doc_id").isin([int(i) for i in keep]))
        idx = idx.unionByName(
            build_vector_index(
                grown, "embedding", "doc_id",
                n_planes=_PARAMS["n_planes"], n_tables=_PARAMS["n_tables"],
            )
        )
    assert got == want



if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_semantic_compact_grown_index_preserves_growth(
    spark, base_index, tmp_path
):
    """compact_grown_index(semantic=True) folds the single-table vector
    index's epoch partitions into epoch=-1 without changing any later
    epoch's screen result (the scaled-copy growth match must still
    resolve against the folded entry), and a post-compaction epoch
    re-execution stays byte-identical."""
    from solace_apache_beam_spark.streaming.ingestion import (
        compact_grown_index,
    )

    dirs = {n: str(tmp_path / f"sc_{n}") for n in ("status", "grown", "book")}
    screen = make_semantic_ingestion_screen(
        spark, base_index, dirs["status"], dirs["grown"], dirs["book"],
        doc_col="doc_id", vec_col="embedding", **_PARAMS,
    )
    screen(_batch(spark, [("q1", 0, 400, _vec(25))]), 0)
    screen(_batch(spark, [("q1", 1, 401, _vec(26))]), 1)
    compact_grown_index(
        spark, dirs["grown"], committed_through=1, semantic=True
    )
    names = sorted(
        n for n in os.listdir(dirs["grown"]) if n.startswith("epoch=")
    )
    assert names == ["epoch=-1"], names
    # scaled copy of the FOLDED epoch-0 unique: cosine match via the
    # compacted index rows
    e2 = [("q2", 0, 402, _vec(25, 0.5))]
    screen(_batch(spark, e2), 2)
    got = _statuses(dirs["status"])
    assert got[402] == ("semantic_dup", 400, 2), "folded-epoch match lost"
    screen(_batch(spark, e2), 2)  # re-execution post-compaction
    assert _statuses(dirs["status"]) == got
