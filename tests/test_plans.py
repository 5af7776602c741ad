"""Physical-plan regression tests: the scale properties PLANS.md
documents (pushdown, pruning, broadcast, top-k, shuffle counts) are
asserted so a refactor can't silently lose them."""

from __future__ import annotations

import pytest

import __spark_entry__ as e


@pytest.fixture(scope="module")
def queries():
    return e.queries()


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_pushdown_and_pruning(spark, sf_dir, queries):
    plan = _plan(spark, queries["tpch_q1_pricing_summary"](spark, sf_dir))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("\n")[0]
    # column pruning: untouched wide columns never reach the scan
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_q3_broadcast_and_topk(spark, sf_dir, queries):
    plan = _plan(spark, queries["tpch_q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-10, never a full sort


def test_wordcount_single_shuffle(spark, sf_dir, queries):
    plan = queries["windowed_wordcount"](spark, sf_dir)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles == 1  # partial/final hash agg around one exchange


def test_minhash_lsh_no_self_join_recompute(spark, sf_dir, queries):
    """The pair generation must stay bucket-collect (one signature
    pipeline), not a self-join: exactly one Python shingle stage pair
    feeding the candidate side."""
    plan = _plan(spark, queries["dedup_minhash_lsh"](spark, sf_dir))
    assert "SortMergeJoin" not in plan.split("collect_list")[0]


def test_salted_join_spreads_key(spark, sf_dir, queries):
    plan = _plan(spark, queries["salted_revenue_by_segment"](spark, sf_dir))
    assert "_salt" in plan  # the salt is part of the join key
