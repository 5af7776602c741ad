"""incremental_dedup: batch-vs-corpus statuses on crafted docs (the
registered query's oracle covers the real-table path; this pins each
status branch explicitly, including exact_dup which real data may not
contain)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def result(spark):
    from solace_apache_beam_spark.llm.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven eight"),
            (3, "totally unrelated corpus content here now"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # byte-identical to corpus doc 1 -> exact_dup
            (10, "alpha beta gamma delta epsilon zeta"),
            # punctuation-only difference from corpus doc 2: different
            # bytes (not exact) but identical token stream -> identical
            # shingles and signature, so candidacy is GUARANTEED (a
            # jaccard-0.7 doc would only collide probabilistically)
            (11, "one, two three four five six seven eight!"),
            # nothing in common -> unique
            (12, "completely novel text with fresh words only"),
            # too short to shingle (< 3 words) -> unique
            (13, "hi"),
        ],
        "doc_id long, text string",
    )
    return {
        r.doc_id: r for r in incremental_dedup(new, corpus).collect()
    }


def test_statuses(result):
    assert len(result) == 4
    assert result[10].status == "exact_dup" and result[10].match_id == 1
    assert result[10].jaccard is None
    assert result[11].status == "near_dup" and result[11].match_id == 2
    assert result[11].jaccard == 1.0  # same token stream, different bytes
    assert result[12].status == "unique" and result[12].match_id is None
    assert result[13].status == "unique"


def test_materialized_corpus_index_matches_recompute(spark, tmp_path):
    """The production shape the docstring promises (VERDICT r5 Next #6):
    build_corpus_index -> write the three artifacts to parquet -> rerun
    incremental_dedup reading them back. Output must be IDENTICAL to the
    recompute path — the batch side is the only work left per run."""
    from solace_apache_beam_spark.llm.dedup import (
        build_corpus_index,
        incremental_dedup,
    )
    from solace_apache_beam_spark.session import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    new = docs.filter(F.col("doc_id") % 4 == 0)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)

    baseline = sorted(
        map(tuple, incremental_dedup(new, corpus).collect())
    )

    idx = build_corpus_index(corpus)
    paths = {}
    for name, df in idx.items():
        paths[name] = str(tmp_path / f"idx_{name}.parquet")
        df.write.mode("overwrite").parquet(paths[name])
    # the build persisted the shingle frame; the returned handle must
    # actually release it once the artifacts are on disk (ADVICE r6)
    assert idx.is_cached
    idx.unpersist()
    assert not idx.is_cached
    stored = {name: spark.read.parquet(p) for name, p in paths.items()}

    got = sorted(
        map(tuple, incremental_dedup(new, corpus_index=stored).collect())
    )
    assert got == baseline
    assert any(r[1] == "near_dup" for r in got)  # non-trivial corpus hit


def test_batch_side_frames_match_build_corpus_index(spark):
    """ADVICE r13: the riskiest equivalence in the round-13 index-reuse
    change, asserted DIRECTLY (the ingestion-loop tests only exercise it
    behaviorally) — subsetting the exposed batch-side frames
    (out.batch_shingles / out.batch_bands) by the unique ids must
    reproduce build_corpus_index(unique_docs) row-for-row, because
    streaming/ingestion.py grows the persisted corpus index from exactly
    that subset."""
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.dedup import (
        build_corpus_index,
        incremental_dedup,
    )
    from solace_apache_beam_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    new = docs.filter(F.col("doc_id") % 4 == 0)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)

    out = incremental_dedup(new, corpus)
    uniq_ids = out.filter(F.col("status") == "unique").select("doc_id")
    got_sh = sorted(
        (r.doc_id, tuple(r.hs))
        for r in out.batch_shingles.join(uniq_ids, "doc_id").collect()
    )
    got_bands = sorted(
        map(
            tuple,
            out.batch_bands.withColumnRenamed("new_id", "doc_id")
            .join(uniq_ids, "doc_id")
            .collect(),
        )
    )

    idx = build_corpus_index(new.join(uniq_ids, "doc_id"))
    want_sh = sorted(
        (r.corp_id, tuple(r.hs)) for r in idx["shingles"].collect()
    )
    want_bands = sorted(map(tuple, idx["bands"].collect()))
    idx.unpersist()
    out.plan_caches.unpersist()

    assert len(got_sh) > 0 and len(got_bands) > 0
    assert got_sh == want_sh
    assert got_bands == want_bands


def test_batch_index_matches_build_vector_index(spark):
    """The semantic twin of the equivalence above (ADVICE r13):
    out.batch_index subsetted by the unique ids must reproduce
    build_vector_index(unique_vectors) — the frame the semantic
    ingestion screen appends to its grown index."""
    from pyspark.sql import functions as F

    from solace_apache_beam_spark.llm.similarity import (
        build_vector_index,
        incremental_semantic_dedup,
    )
    from solace_apache_beam_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    index = build_vector_index(emb.filter(F.col("vec_id") % 4 != 0))

    out = incremental_semantic_dedup(batch, index)
    uniq_ids = out.filter(F.col("status") == "unique").select("vec_id")
    got = sorted(
        (r.vec_id, tuple(r.q), r.bucket)
        for r in out.batch_index.join(uniq_ids, "vec_id").collect()
    )
    want = sorted(
        (r.vec_id, tuple(r.q), r.bucket)
        for r in build_vector_index(batch.join(uniq_ids, "vec_id")).collect()
    )
    out.plan_caches.unpersist()

    assert len(got) > 0
    assert got == want


def test_incremental_dedup_rejects_ambiguous_corpus(spark):
    import pytest as _pytest

    from solace_apache_beam_spark.llm.dedup import incremental_dedup

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="exactly one"):
        incremental_dedup(df)
    with _pytest.raises(ValueError, match="exactly one"):
        incremental_dedup(df, df, corpus_index={})
