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
# Round-8 rotation (VERDICT r7 Next #1 + #2, plus the in-round
# lockstep additions):
#   0. the six queries whose oracle TEXT changed when the MinHash-pass
#      SQL was single-sourced through _minhash_fragments (round-8
#      review; semantics identical — generated fragments replace a
#      hand-written verbatim copy — but the lockstep rule is
#      mechanical: oracle changed => head, same commit);
#   1. the five queries whose semantics/oracles changed in round-7
#      commits AFTER the r7 rotation was set (their newest driver rows
#      are r06 and predate the code);
#   2. then the two newly gated round-7 operators (freeze lifted by
#      exactly two — minhash_lsh_pairs_rescue and the auto-banded
#      simhash pairs path);
#   3. then the remaining 16 queries whose newest driver row is r06.
_PRIORITY: tuple[str, ...] = (
    # 0a. plan changed post-close-out (lockstep): revenue_by_nation
    #     dropped the static broadcast of the SF-scaling customer side
    #     (constant-size nation/region keep theirs; AQE owns customer);
    #     protobuf_roundtrip's fallback wire-parser UDF now decodes
    #     non-UTF-8 poison payloads to NULL instead of raising
    "revenue_by_nation",
    "protobuf_roundtrip",
    #     analytic_user_running's window order went explicitly
    #     NULLS LAST (Spark ASC default is NULLS FIRST, DuckDB's is
    #     NULLS LAST — rank/lag/running diverged on NULL-ts rows,
    #     found by the randomized events differential);
    #     session_window_count's oracle gap split went strictly-> —
    #     Spark's session_window merges an exact-gap touch (same
    #     differential, boundary-dense 10-minute grid)
    "analytic_user_running",
    "session_window_count",
    #     _stop_sql's coalesce stopped swallowing NULL word lists (its
    #     oracle text changed in all four consumers: n_stopwords must
    #     be NULL on NULL text like every other feature — same
    #     differential, NULL-text documents; the fourth consumer,
    #     training_data_pipeline, already sits in set 0 above)
    "text_quality",
    "text_language_id",
    "source_quality_gate",
    "text_token_counts",
    #     text_fingerprint: NULL text now yields a NULL fingerprint on
    #     both engines (the UDF crashed on the None array; the oracle
    #     folded to 0, aliasing NULL with empty — same differential)
    "text_fingerprint",
    #     the _QE/_KM_SQL embedding fragments gained the undecoded-row
    #     filter the Spark packers always had (a NULL embedding's n2
    #     list_prepend-folded to 0 and scored as a phantom zero vector
    #     — found by the randomized embeddings differential); oracle
    #     text changed for the six consumers (ann_ivf_cosine,
    #     knn_brute_cosine, embedding_neardup, embedding_coverage and
    #     ann_lsh_cosine enumerate below / already in head)
    "ivf_kmeans_assign",
    "knn_brute_cosine",
    "ann_lsh_cosine",
    "embedding_neardup",
    "embedding_coverage",
    #     json_payload_parse: ANSI cast crashed on non-integer $.k
    #     (poison-record class) — now try_cast, with the oracle
    #     restated to mirror the tolerant path on valid JSON
    "json_payload_parse",
    #     the sampling-family hash went NULL-propagating (concat, not
    #     concat_ws — a NULL key has no hash identity, matching the
    #     oracles' 'salt:' || key); plan changed for every _bucket /
    #     training_shuffle consumer (the others — sample_documents_
    #     10pct, split_train_val_test, stratified_sample_lineitem,
    #     training_shard_stats, sequence_packing, embedding_coverage,
    #     training_data_pipeline — already sit in the head above)
    "training_shuffle_manifest",
    # 0. oracle text regenerated by the MinHash single-sourcing
    #    (dedup_minhash_rescue, also a consumer, is already in set 2)
    "dedup_minhash_lsh",
    "dedup_clusters",
    "incremental_dedup",
    "minhash_band_hashes",
    "training_data_pipeline",
    # 1. semantics/oracle changed post-rotation in r7 — re-pin first
    #    (dedup_ngram_jaccard ALSO changed plan in round 8: the inline
    #    Bayardo size filter — lockstep holds, it is already in head)
    "asof_click_view",
    "funnel_view_click_purchase",
    "hypertable_rollup_events",
    "dedup_ngram_jaccard",
    "expectation_report_lineitem",
    # 2. newly gated round-7 operators (first driver rows)
    "dedup_minhash_rescue",
    "dedup_simhash_pairs_auto",
    # 3. newest driver row: round 6 — refresh
    "ann_ivf_cosine",
    "chunk_documents",
    "corpus_stats",
    "dedup_rate_report",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "kmv_distinct_parts",
    "multimodal_frame_sample",
    "percentiles_event_value",
    "sample_documents_10pct",
    "sequence_packing",
    "split_train_val_test",
    "stratified_sample_lineitem",
    "text_normalize",
    "text_pii_redact",
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
