"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``solace_apache_beam_spark/``; queries register
themselves in ``solace_apache_beam_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the windowed word count
    chain from the reference's flagship sample
    (WindowedWordCountSolace.java:114-168)."""
    from solace_apache_beam_spark.queries import windowed_wordcount

    return windowed_wordcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from solace_apache_beam_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from solace_apache_beam_spark.registry import all_oracles

    return all_oracles()
