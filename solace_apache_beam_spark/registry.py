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
# Round-13 rotation at ROUND CLOSE (standing rule from VERDICT r8
# Next #3: keep every gate row <= 1 round old): set 1 is exactly the
# 35 queries whose newest driver row was r11 at round open — the
# audit's stale set — alphabetical; set 0 is the round's lockstep
# re-pin (dedup_clusters: connected_components rewritten — pair frame
# materialized once before the symmetrize union, self-loop edges fold
# the neighbor-min two-step into one join+groupBy per round; labels
# bit-identical, re-proven against the recursive-CTE oracle at sf0.01
# AND sf0.1 in the same session as the change).  The round's only
# other plan change to a registered query is incremental_dedup
# (touched-bucket prefilter before the cap window + persisted/exposed
# batch-side frames; outputs oracle-identical) — its lockstep slot is
# ALREADY in the head via the stale set below.  36 head entries <=
# the ~50-row snapshot window.  A full 83-query oracle-parity sweep
# passed at sf0.1 this round (PLANS.md) on top of the two gate SFs.
# Registry count 85 -> 83 this round under the growth freeze:
# embedding_neardup folded into embedding_neardup_auto (same oracle
# verbatim, auto routes exact at gate scale) and ann_pq_cosine folded
# into ann_ivf_pq_cosine (its oracle replays the same PQ brute arm
# inside probed cells); both kernels keep randomized-differential
# pytest coverage (test_properties_similarity:
# test_neardup_pairs_matches_reference, test_pq_topk_matches_reference).
_PRIORITY: tuple[str, ...] = (
    # 0. lockstep re-pin (round-13 plan change, oracle unchanged).
    "dedup_clusters",
    # 1. newest driver row: round 11 — refresh (alphabetical; the
    #    audit's stale set at round-13 open).
    "ann_ivf_pq_cosine",
    "ann_ivf_pq_residual",
    "ann_sq8_cosine",
    "bm25_components",
    "curation_pipeline",
    "decontamination_report",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_rescue",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "duplicate_spans",
    "embedding_centroids",
    "embedding_coverage",
    "embedding_neardup_lsh",
    "incremental_dedup",
    "ivf_kmeans_assign",
    "minhash_band_hashes",
    "multimodal_features",
    "multimodal_metadata",
    "multimodal_resize",
    "range_join_error_clicks",
    "rollup_pricing",
    "set_ops_custkeys",
    "source_quality_gate",
    "sq8_code_assign",
    "text_fingerprint",
    "text_language_id",
    "text_quality",
    "text_repetition",
    "text_token_counts",
    "top_customers_per_segment",
    "training_data_pipeline",
    "training_shuffle_manifest",
    "vocab_top_words",
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
