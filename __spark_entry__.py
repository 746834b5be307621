"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`kafka_streams_rosetta_demo_spark`; this module
just adapts the registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_rosetta_demo_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 minimum end-to-end slice): hourly
    tumbling-window call aggregation left-joined to the customer dimension
    with formatted window bounds and null-coalesced defaults — the
    reference's two topologies fused."""
    from kafka_streams_rosetta_demo_spark.plans.rosetta import enriched_calls_plan
    from kafka_streams_rosetta_demo_spark.session import ensure_conf

    # Same conf pin the registry wrapper applies: window-bound strings must
    # not drift with the host timezone.
    ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    return enriched_calls_plan(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query (omitted for non-SQL-expressible ops)."""
    return _registry.oracle_sql()
