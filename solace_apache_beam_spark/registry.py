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
# Round-15 rotation, refreshed at ROUND CLOSE (standing rule from
# VERDICT r8 Next #3: keep every gate row <= 1 round old; the audit
# ran green after this refresh).  Set 1 is exactly the 33 queries
# whose newest driver row was r13 at round-15 open — the audit's stale
# set — alphabetical.  Set 0 is the round's lockstep re-pins, the
# registered queries whose plan or oracle SQL (or driver-side training
# path) changed this optimization round, each re-proven value-equal vs
# DuckDB at sf0.01 in the same session as the change:
# - dedup_minhash_rescue: the rescue pass shingles its partition
#   directly with the rescue geometry fused into the kernel (the
#   corpus-cache semi-join and the separate ArrowEvalPython re-banding
#   stage are gone); band values and the covered doc set unchanged.
# - duplicate_spans / curation_pipeline: the positioned-gram kernel
#   emits 60-bit md5-prefix HASHES instead of gram strings, and both
#   span oracles hash the identical bytes — the one gram exchange
#   carries longs; outputs value-identical (collisions, if any, merge
#   identically on both engines — the shingle contract).
# - ann_ivf_pq_residual: PQ training seeds are computed driver-side
#   from the quantized cache + coarse centroids (bit-identical seed
#   list; the physical plan is unchanged — this is a training-path
#   re-pin out of caution, its stale-set slot moved to the head).
# (The isEmpty-probe removals in kmeans_assign/semantic_dedup/
# ivf_pq_topk/pq_encode change neither plans nor values — no lockstep
# entry; their plan dumps are byte-identical, plans/r15/.)
# 36 head entries <= the ~50-row snapshot window.
_PRIORITY: tuple[str, ...] = (
    # 0. lockstep re-pins (round-15 plan/oracle/training changes).
    "dedup_minhash_rescue",
    "duplicate_spans",
    "curation_pipeline",
    "ann_ivf_pq_residual",
    # 1. newest driver row: round 13 — refresh (alphabetical; the
    #    audit's stale set at round-15 open; ann_ivf_pq_residual moved
    #    to set 0).
    "analytic_user_running",
    "ann_ivf_pq_cosine",
    "ann_sq8_cosine",
    "count_per_window_global",
    "dedup_by_representative_key",
    "dedup_exact",
    "embedding_centroids",
    "embedding_coverage",
    "embedding_neardup_lsh",
    "envelope_project",
    "ivf_kmeans_assign",
    "json_payload_parse",
    "multimodal_metadata",
    "multimodal_resize",
    "observed_metrics",
    "payload_extract",
    "pivot_linestatus",
    "range_join_error_clicks",
    "revenue_by_nation",
    "rollup_pricing",
    "session_window_count",
    "set_ops_custkeys",
    "sliding_window_count",
    "source_quality_gate",
    "sq8_code_assign",
    "text_fingerprint",
    "text_quality",
    "text_token_counts",
    "top_customers_per_segment",
    "tpch_q1_pricing_summary",
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
