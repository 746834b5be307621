"""Bound the sketch query the oracle can't hash-match.

``agg_approx_count_distinct`` (HyperLogLog++, declared rsd 2%) has no DuckDB
value twin — sketches differ across engines — so without this pin it would
be the one query where a regression (wrong column, wrong rsd, wrong grouping)
could slip through as "merely runs".
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_rosetta_demo_spark.queries import load_all
from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

QUERIES = load_all()


def test_approx_count_distinct_within_rsd(spark, sf_correctness):
    approx = {
        r.l_returnflag: r.approx_orders
        for r in QUERIES["agg_approx_count_distinct"].fn(spark, sf_correctness).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in (
            load_table(spark, sf_correctness, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.countDistinct("l_orderkey").alias("n"))
            .collect()
        )
    }
    assert approx.keys() == exact.keys()
    for flag, n_exact in exact.items():
        rel_err = abs(approx[flag] - n_exact) / n_exact
        # declared rsd 0.02; 3-sigma bound so the test is a regression net,
        # not a coin flip on the sketch's tail
        assert rel_err <= 0.06, f"{flag}: approx={approx[flag]} exact={n_exact} err={rel_err:.4f}"
