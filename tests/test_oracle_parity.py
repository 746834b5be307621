"""Run every registered query against its DuckDB oracle — the local replica
of the driver's t2 correctness gate (sf0.01, same as the driver)."""

from __future__ import annotations

import pytest

from kafka_streams_rosetta_demo_spark.queries import load_all

from .oracle_check import compare

QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_correctness, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_correctness)
    if q.oracle is None:
        # driver does a weaker rows-only check for these
        assert df.count() >= 0
        return
    compare(df, q.oracle, sf_correctness)
