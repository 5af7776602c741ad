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


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
