"""Screen-then-rescue MinHash composition (VERDICT r6 Next #2): the
operator must equal the manually composed form row-for-row, and its
provenance column must mean what the docstring says."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    from solace_apache_beam_spark.session import load_table

    return load_table(spark, sf_dir, "documents")


def test_rescue_matches_manual_composition(spark, sf_dir):
    """Operator output == DEFAULT screen over the corpus, plus the
    HIGH_RECALL pairs over the partition that the screen missed —
    composed by hand from the public primitives."""
    from solace_apache_beam_spark.llm.dedup import (
        MINHASH_DEFAULT,
        MINHASH_HIGH_RECALL,
        minhash_lsh_pairs,
        minhash_lsh_pairs_rescue,
    )

    docs = _docs(spark, sf_dir)
    part = F.col("doc_id") % 2 == 0

    got = sorted(
        map(tuple, minhash_lsh_pairs_rescue(docs, part).collect())
    )

    screen = minhash_lsh_pairs(docs, **MINHASH_DEFAULT)
    high = minhash_lsh_pairs(docs.filter(part), **MINHASH_HIGH_RECALL)
    fresh = high.join(
        screen.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti"
    )
    manual = sorted(
        map(
            tuple,
            screen.withColumn("source", F.lit("screen"))
            .unionByName(fresh.withColumn("source", F.lit("rescue")))
            .collect(),
        )
    )
    assert got == manual
    assert len(got) > 0


def _boundary_corpus(spark):
    """Synthetic corpus with BOUNDARY pairs (Jaccard ~0.5-0.6): the
    testdata documents' near-dups all sit at high J where the DEFAULT
    s-curve already catches them, so a rescue test needs pairs in the
    miss band. Each even-id pair (10i, 10i+2) shares a 28-word prefix
    of a 40-word doc -> shingle Jaccard ~0.52, where the DEFAULT
    candidate probability is ~0.3 and HIGH_RECALL's is ~1.0. Odd-id
    singletons sit outside the partition of interest."""
    import random

    rng = random.Random(11)
    letters = "abcdefghijklmnopqrstuvwxyz"

    def word():
        return "".join(rng.choice(letters) for _ in range(6))

    rows = []
    for i in range(60):
        base = [word() for _ in range(40)]
        variant = base[:28] + [word() for _ in range(12)]
        rows.append((10 * i, " ".join(base)))
        rows.append((10 * i + 2, " ".join(variant)))
        rows.append((10 * i + 5, " ".join(word() for _ in range(40))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rescue_provenance_semantics(spark):
    """'screen' rows are EXACTLY the corpus-wide DEFAULT pairs; every
    'rescue' row has both endpoints inside the partition, is absent
    from the screen set, and carries an exact jaccard >= threshold."""
    from solace_apache_beam_spark.llm.dedup import (
        MINHASH_DEFAULT,
        minhash_lsh_pairs,
        minhash_lsh_pairs_rescue,
    )

    docs = _boundary_corpus(spark)
    part = F.col("doc_id") % 2 == 0
    rows = minhash_lsh_pairs_rescue(docs, part, threshold=0.5).collect()

    screen_rows = {
        (r.doc_a, r.doc_b)
        for r in rows
        if r.source == "screen"
    }
    rescue_rows = [r for r in rows if r.source == "rescue"]

    base = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, **MINHASH_DEFAULT).collect()
    }
    assert screen_rows == base

    for r in rescue_rows:
        assert r.doc_a % 2 == 0 and r.doc_b % 2 == 0
        assert (r.doc_a, r.doc_b) not in screen_rows
        assert r.jaccard >= 0.5
    # the high-recall pass must find boundary pairs the screen's
    # s-curve missed inside the partition — that is the operator's
    # entire reason to exist
    assert rescue_rows


def test_recall_info_tables():
    from solace_apache_beam_spark.llm.dedup import minhash_recall_info
    from solace_apache_beam_spark.llm.similarity import ann_recall_info

    assert minhash_recall_info(16, 4) == {
        "recall_preset": "DEFAULT",
        "measured_recall": 0.767,
    }
    assert minhash_recall_info(64, 32)["recall_preset"] == "HIGH_RECALL"
    # unmeasured parameters fall back to the s-curve candidate bound
    custom = minhash_recall_info(8, 4, threshold=0.5)
    assert custom["recall_preset"] == "custom"
    assert 0 < custom["candidate_prob_at_threshold"] < 1

    assert ann_recall_info(1) == {
        "recall_preset": "1-table",
        "measured_recall": 0.952,
    }
    assert ann_recall_info(3)["model_recall"] == round(1 - 0.048**3, 4)

    # geometry the pairs operator itself can't run must raise, not
    # fabricate authoritative-looking telemetry (or divide by zero)
    import pytest

    for bad in ((16, 0), (4, 16), (20, 8)):
        with pytest.raises(ValueError, match="multiple"):
            minhash_recall_info(*bad)


def test_rescue_empty_partition_degrades_to_screen(spark, sf_dir):
    """A partition_filter matching ZERO rows must degrade to exactly
    the screen pass (all rows source='screen'), exercising the empty
    side of the shared-shingle semi-join and an empty rescue pass."""
    from solace_apache_beam_spark.llm.dedup import (
        MINHASH_DEFAULT,
        minhash_lsh_pairs,
        minhash_lsh_pairs_rescue,
    )

    docs = _docs(spark, sf_dir)
    out = minhash_lsh_pairs_rescue(docs, F.lit(False)).collect()
    assert out and all(r.source == "screen" for r in out)
    base = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, **MINHASH_DEFAULT).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in out} == base


def test_rescue_accepts_full_preset_dicts(spark, sf_dir):
    """Round-7 self-review fix: the screen/rescue dicts merge with
    explicit precedence — tuning knobs (threshold, max_bucket, n_perm,
    n_bands) may override, structural keys (text_col, id_col,
    shingle_n, shingles) are stripped because the shared shingle frame
    is built once with the operator-level values. A dict that repeats
    an operator-level kwarg must NOT raise TypeError, and redundant
    defaults must not change the output."""
    from solace_apache_beam_spark.llm.dedup import (
        MINHASH_DEFAULT,
        MINHASH_HIGH_RECALL,
        minhash_lsh_pairs_rescue,
    )

    docs = _docs(spark, sf_dir)
    part = F.col("doc_id") % 2 == 0
    base = sorted(map(tuple, minhash_lsh_pairs_rescue(docs, part).collect()))
    # same presets spelled with overlapping/structural keys: identical
    got = sorted(
        map(
            tuple,
            minhash_lsh_pairs_rescue(
                docs,
                part,
                screen={**MINHASH_DEFAULT, "threshold": 0.5, "text_col": "bogus"},
                rescue={**MINHASH_HIGH_RECALL, "shingle_n": 99, "id_col": "nope"},
            ).collect(),
        )
    )
    assert got == base and len(base) > 0


def test_rescue_caches_handle_releases_persists(spark, sf_dir):
    """ADVICE r7: the two MEMORY_AND_DISK shingle frames a rescue call
    persists must be releasable by the caller — the result carries a
    RescueCaches handle (the rescue mirror of CorpusIndex.unpersist).
    After materializing and unpersisting, neither frame stays cached,
    and the returned frame is still recomputable from lineage."""
    from solace_apache_beam_spark.llm.dedup import (
        RescueCaches,
        minhash_lsh_pairs_rescue,
    )

    docs = _docs(spark, sf_dir)
    out = minhash_lsh_pairs_rescue(docs, F.col("doc_id") % 2 == 0)
    handle = out.rescue_caches
    assert isinstance(handle, RescueCaches)
    before = out.collect()
    assert handle.is_cached  # the collect materialized both persists
    handle.unpersist()
    assert not handle.is_cached
    # lineage intact: the frame recomputes identically without caches
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, before))
