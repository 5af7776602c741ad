"""Degenerate-input sweep: every registered query must execute on
EMPTY tables (same schemas, zero rows) without crashing — the guard
for partition pruning / first-day deployments / filtered-to-nothing
upstreams at scale. Queries legitimately return zero (or aggregate
default) rows; what they must not do is throw."""

from __future__ import annotations

import os

import pytest

from solace_apache_beam_spark.registry import all_queries

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    """Zero-row copies of every table with the EXACT parquet schema of
    the source (pyarrow round-trip — a SQL `LIMIT 0` copy would rewrite
    events' TIMESTAMP(NANOS) column as plain timestamp and dodge the
    very read path being exercised)."""
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        schema = pq.read_schema(src)
        pq.write_table(schema.empty_table(), f"{out}/{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_survives_empty_tables(name, spark, empty_sf_dir):
    df = all_queries()[name](spark, empty_sf_dir)
    assert df.count() >= 0
