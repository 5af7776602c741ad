"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB-runnable ANSI-SQL
oracle (the driver's correctness gate — see ``__spark_entry__.py``).

Naming contract: every computed column is aliased identically in the
Spark plan and the oracle SQL so the driver's sorted-column value-hash
matches.

Determinism contract: aggregates over doubles that the oracle must
reproduce bit-for-bit are computed over DECIMAL casts (sum order then
cannot change the value); dedup picks are made deterministic with
row_number over an explicit ordering rather than dropDuplicates'
arbitrary row choice.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is DuckDB SQL over the pre-registered
    table views (region nation customer supplier part orders lineitem
    events documents embeddings). ``oracle=None`` => rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load() -> None:
    # imports for side effect: populate the registry
    from solace_apache_beam_spark import queries as _q  # noqa: F401
    from solace_apache_beam_spark import queries_llm as _ql  # noqa: F401
    from solace_apache_beam_spark import queries_temporal as _qt  # noqa: F401


# The driver's correctness snapshot records at most ~50 queries per round,
# enumerated in dict insertion order.  Rotation policy: the queries whose
# newest driver row is OLDEST enumerate first, so every query's gate row
# stays fresh across rounds.
#
# ROTATION-LOCKSTEP RULE (mechanical, VERDICT r7 Next #3 — the mirror of
# the oracle-lockstep rule in this module's header): any commit that
# changes a registered query's plan OR its oracle SQL must move that
# query's name into _PRIORITY's HEAD in the SAME commit.  A rotation set
# at round open and falsified by a later semantic change leaves the
# driver's newest gate row predating the code it vouches for (the
# round-7 process miss: five queries changed after the rotation comment
# declared "no re-pin entries follow").  Refresh this comment at round
# close so it states the rotation actually in force.
#
# REGISTRY-GROWTH POLICY (structural, VERDICT r11 Next #1): the driver's
# correctness snapshot records at most ~50 queries per round, so with 85
# registered queries a PERFECT two-round rotation (50 newest + 35
# one-round-old) is the only schedule that keeps every gate row <= 1
# round old.  There is ZERO slack for net growth: registering query #86
# makes a full refresh cycle three rounds, which violates the freshness
# rule by construction.  Therefore, from round 12 on, NET REGISTRY
# GROWTH IS FROZEN: a new query may be registered only if an existing
# query is retired or consolidated into it in the SAME commit (e.g. a
# superseded exact baseline folding into its routed successor).  If a
# future round genuinely needs net-new gates, the driver snapshot window
# must be raised first — do not register past 85 against a ~50-row
# window.  Retired queries keep their kernels and pytest coverage; only
# the driver-gate registration is consolidated.
#
# Round-14 rotation, refreshed at ROUND CLOSE (standing rule from
# VERDICT r8 Next #3: keep every gate row <= 1 round old; VERDICT r13
# Next #7 made the rotation a mechanical round-open step — the audit
# ran green at open AND close): set 1 is exactly the 33 queries whose
# newest driver row was r12 at round-14 open — the audit's stale set —
# alphabetical.  Set 0 is the round's lockstep re-pins, the six
# registered queries whose plans (one also its oracle) changed this
# round, each re-proven value-hash-equal vs DuckDB at sf0.01 AND
# sf0.1 in the same session as the change:
# - dedup_clusters: connected_components co-partitions+sorts the
#   static edge cache on dst (rounds join it with no exchange/sort)
#   and defers the pointer jump into the next round's job (the final
#   confirming round does none); labels bit-identical.
# - incremental_dedup: touched-bucket prefilter pins F.broadcast on
#   the batch-bounded side (ADVICE r13), and the verify joins are
#   reordered so the best-match window reuses the final join's new_id
#   partitioning on the sort-merge path.
# - multimodal_features: consolidated onto the REAL decode path
#   (bytes wrapped as actual BMPs, decoded by the pure-python codec,
#   decoded-pixel histogram) with a matching new hex-pair oracle.
# - embedding_neardup_auto: the exact route's block-pair frame is
#   repartitioned on (ablk, bblk) before scoring (one matmul per
#   task instead of up to B serial matmuls in <= B tasks).
# - duplicate_spans / curation_pipeline: gram construction is an
#   Arrow kernel and the span stats collapse into one whole-partition
#   window over a single gram-keyed exchange (strings cross one
#   shuffle, not three).
# - the MinHash/SimHash families (second session): fused
#   shingle+signature Arrow kernel (one Python hop instead of two),
#   bucket sizing via a whole-partition window (one exchange of the
#   band stream and ONE computation of the signature pipeline instead
#   of two), and the single-split shape (short/NULL-doc handling moved
#   into the kernels so the tokenizing regex runs once per row, with
#   asNondeterministic pinning the kernels against filter-pushdown
#   duplication).
# - text_repetition / text_language_id: all per-doc counts from one
#   zero-shuffle Arrow token pass (the former token explode +
#   two-level aggregate + merge join, resp. five interpreted
#   aggregate-HOF passes, are gone); fractions/argmax stay JVM
#   expressions over the returned integers.
# - bm25_components / dedup_ngram_jaccard: document frequency from a
#   whole-partition window over the one term/shingle exchange (the
#   former count-aggregate + merge join consumed the keyed frame
#   twice; bm25's tf persist disappears with its second consumer).
# 49 head entries <= the ~50-row snapshot window.
_PRIORITY: tuple[str, ...] = (
    # 0. lockstep re-pins (round-14 plan changes; multimodal_features
    #    also changed its oracle — the real-decode consolidation).
    "dedup_clusters",
    "incremental_dedup",
    "multimodal_features",
    "embedding_neardup_auto",
    "duplicate_spans",
    "curation_pipeline",
    "minhash_band_hashes",
    "dedup_minhash_lsh",
    "dedup_minhash_rescue",
    "dedup_ngram_jaccard",
    "training_data_pipeline",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_simhash_pairs_auto",
    "decontamination_report",
    "text_repetition",
    "text_language_id",
    "bm25_components",
    # 1. newest driver row: round 12 — refresh (alphabetical; the
    #    audit's stale set at round-14 open).
    "ann_ivf_cosine",
    "ann_lsh_cosine",
    "asof_click_view",
    "chunk_documents",
    "corpus_stats",
    "cube_order_stats",
    "customers_without_orders",
    "data_quality_events",
    "dedup_rate_report",
    # (dedup_simhash_pairs / dedup_simhash_pairs_auto moved to set 0 —
    #  second-session plan changes)
    # (embedding_neardup_auto moved to set 0 — round-14 plan change)
    "expectation_report_lineitem",
    "funnel_view_click_purchase",
    "hypertable_rollup_events",
    "kmv_distinct_parts",
    "knn_brute_cosine",
    "multimodal_frame_sample",
    "orders_above_customer_avg",
    "percentiles_event_value",
    "pq_code_assign",
    "protobuf_roundtrip",
    "salted_revenue_by_segment",
    "sample_documents_10pct",
    "semantic_dedup",
    "sequence_packing",
    "split_train_val_test",
    "stratified_sample_lineitem",
    "suppliers_with_large_parts",
    "text_normalize",
    "text_pii_redact",
    "tpch_q3_shipping_priority",
    "training_shard_stats",
)


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def all_queries() -> dict[str, QueryFn]:
    _load()
    # a _PRIORITY typo (or a renamed query) must fail LOUDLY: _ordered
    # would otherwise silently drop the name, the query would fall to
    # tail enumeration order, and its driver gate row would silently go
    # stale past the ~50-query snapshot cutoff
    # explicit raise, not assert: python -O strips asserts, which would
    # silently restore the exact silent-staleness failure this guards
    missing = [n for n in _PRIORITY if n not in _QUERIES]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return _ordered(_ORACLES)
