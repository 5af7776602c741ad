"""Every operator that persists a frame INSIDE its returned plan must
expose a release handle (`out.plan_caches`, functions/caching.py) — the
round-8 generalization of the lingering-cache findings ADVICE r6 raised
on build_corpus_index and ADVICE r7 raised again on
minhash_lsh_pairs_rescue. The contract per operator:

1. the handle exists before any action runs;
2. after materializing, at least one held frame is cached;
3. unpersist() releases every one;
4. the frame still recomputes identically from lineage afterwards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solace_apache_beam_spark.functions.caching import PlanCaches
from solace_apache_beam_spark.session import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _minhash(spark, sf_dir):
    from solace_apache_beam_spark.llm.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir))


def _ngram(spark, sf_dir):
    from solace_apache_beam_spark.llm.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir))


def _simhash(spark, sf_dir):
    from solace_apache_beam_spark.llm.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(_docs(spark, sf_dir))


def _rescue(spark, sf_dir):
    from solace_apache_beam_spark.llm.dedup import minhash_lsh_pairs_rescue

    return minhash_lsh_pairs_rescue(
        _docs(spark, sf_dir), F.col("doc_id") % 2 == 0
    )


def _incremental(spark, sf_dir):
    from solace_apache_beam_spark.llm.dedup import incremental_dedup

    d = _docs(spark, sf_dir)
    return incremental_dedup(
        d.filter(F.col("doc_id") % 5 == 0), d.filter(F.col("doc_id") % 5 != 0)
    )


def _decontaminate(spark, sf_dir):
    from solace_apache_beam_spark.llm.dedup import decontaminate

    d = _docs(spark, sf_dir)
    return decontaminate(
        d.filter(F.col("doc_id") % 10 != 0), d.filter(F.col("doc_id") % 10 == 0)
    )


def _ann_lsh(spark, sf_dir):
    from solace_apache_beam_spark.llm.similarity import ann_lsh_topk

    return ann_lsh_topk(_emb(spark, sf_dir))


def _neardup(spark, sf_dir):
    from solace_apache_beam_spark.llm.similarity import neardup_pairs

    return neardup_pairs(_emb(spark, sf_dir))


def _neardup_lsh(spark, sf_dir):
    from solace_apache_beam_spark.llm.similarity import neardup_pairs_lsh

    return neardup_pairs_lsh(_emb(spark, sf_dir), n_planes=3, n_tables=2)


def _kmeans_assign(spark, sf_dir):
    from solace_apache_beam_spark.llm.similarity import kmeans_assign

    return kmeans_assign(_emb(spark, sf_dir))


def _ivf(spark, sf_dir):
    from solace_apache_beam_spark.llm.similarity import ivf_topk

    return ivf_topk(_emb(spark, sf_dir), n_cells=8)


def _bm25(spark, sf_dir):
    from solace_apache_beam_spark.llm.text_analysis import bm25_components

    return bm25_components(_docs(spark, sf_dir))


def _funnel(spark, sf_dir):
    from solace_apache_beam_spark.operators.temporal import funnel_counts

    return funnel_counts(load_table(spark, sf_dir, "events"))


def _semantic_dedup(spark, sf_dir):
    from solace_apache_beam_spark.llm.similarity import semantic_dedup

    return semantic_dedup(_emb(spark, sf_dir), n_cells=4, n_iters=1)


def _ivf_pq(spark, sf_dir):
    from solace_apache_beam_spark.llm.similarity import ivf_pq_topk

    return ivf_pq_topk(
        _emb(spark, sf_dir), n_cells=4, n_iters=1, m=2, k_codes=4, nprobe=2
    )


def _ivf_pq_residual(spark, sf_dir):
    from solace_apache_beam_spark.llm.similarity import ivf_pq_topk

    return ivf_pq_topk(
        _emb(spark, sf_dir), n_cells=4, n_iters=1, m=2, k_codes=4,
        by_residual=True,
    )


BUILDERS = {
    "semantic_dedup": _semantic_dedup,
    "ivf_pq_topk": _ivf_pq,
    "ivf_pq_topk_residual": _ivf_pq_residual,
    "minhash_lsh_pairs": _minhash,
    "ngram_jaccard_pairs": _ngram,
    "simhash_hamming_pairs": _simhash,
    "minhash_lsh_pairs_rescue": _rescue,
    "incremental_dedup": _incremental,
    "decontaminate": _decontaminate,
    "ann_lsh_topk": _ann_lsh,
    "neardup_pairs": _neardup,
    "neardup_pairs_lsh": _neardup_lsh,
    "kmeans_assign": _kmeans_assign,
    "ivf_topk": _ivf,
    "bm25_components": _bm25,
    "funnel_counts": _funnel,
}


def _cached_rdd_ids(spark):
    return {r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()}


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_plan_caches_release_cycle(name, spark, sf_dir):
    rdds_before = _cached_rdd_ids(spark)
    out = BUILDERS[name](spark, sf_dir)
    handle = getattr(out, "plan_caches", None)
    assert isinstance(handle, PlanCaches), f"{name} lost its plan_caches"
    before = sorted(map(tuple, out.collect()))
    # kmeans_assign/ivf_topk materialize their cache during TRAINING
    # (driver-side collects), which may precede this assertion — but
    # after the result collect the persisted frames must be live.
    # An EMPTY handle is legitimate (round 14: bm25_components' df
    # window made its tf frame single-consumer, so the operator no
    # longer persists anything) — the leak check below still proves no
    # persist escaped the handle.
    if handle._frames:
        assert handle.is_cached, f"{name}: nothing cached after materialize"
    handle.unpersist()
    assert not handle.is_cached, f"{name}: unpersist left a cache"
    # block-manager-level: the handle must cover EVERY frame the call
    # persisted — an operator persist omitted from the handle leaves a
    # cached RDD the handle checks above cannot see (the round-8
    # incremental_dedup `near` miss). unpersist(blocking=False) removes
    # the registry entry synchronously, so no retry loop is needed.
    leaked = _cached_rdd_ids(spark) - rdds_before
    assert not leaked, f"{name}: persisted frames outside the handle: {leaked}"
    # lineage intact: recompute without the cache, identical rows
    assert sorted(map(tuple, out.collect())) == before


def test_rescue_caches_alias_is_plan_caches(spark, sf_dir):
    """The committed rescue API (out.rescue_caches) and the uniform
    name are THE SAME handle — releasing through either releases
    both views."""
    out = _rescue(spark, sf_dir)
    assert out.rescue_caches is out.plan_caches


def test_minhash_caller_owned_shingles_not_attached(spark, sf_dir):
    """When the caller passes its own persisted shingle frame, the
    operator must NOT claim its lifecycle (the rescue composition
    owns the shared frame and releases it through ITS handle)."""
    from solace_apache_beam_spark.llm.dedup import (
        _doc_shingles,
        minhash_lsh_pairs,
    )

    sh = _doc_shingles(_docs(spark, sf_dir), "text", "doc_id", 3).persist()
    try:
        out = minhash_lsh_pairs(_docs(spark, sf_dir), shingles=sh)
        assert getattr(out, "plan_caches", None) is None
    finally:
        sh.unpersist()


def test_kmeans_assign_empty_corpus_releases_its_persist(spark):
    """The empty-corpus early return has no downstream consumer of the
    quantized frame — it must unpersist it immediately rather than
    strand a cache with no handle (round-8 self-review)."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from solace_apache_beam_spark.llm.similarity import kmeans_assign

    empty = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("embedding", ArrayType(DoubleType())),
                StructField("label", LongType()),
            ]
        ),
    )
    n_cached_before = len(
        [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    )
    out = kmeans_assign(empty)
    assert out.count() == 0
    n_cached_after = len(
        [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    )
    assert n_cached_after <= n_cached_before
