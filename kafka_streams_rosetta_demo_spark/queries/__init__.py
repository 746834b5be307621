"""Declared query registry — the driver-facing correctness surface.

Every implemented operator from SURVEY.md §2 (and every extension operator)
registers here as a named query: a ``(spark, sf_dir) -> DataFrame`` callable
plus, when SQL-expressible, an ANSI-SQL oracle string DuckDB runs on the same
parquet tables. ``__spark_entry__.py`` re-exports this registry verbatim.

Column-name contract: the driver compares Spark vs oracle after sorting
columns by name, so every computed column is aliased identically on both
sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_conf  # noqa: E402  (re-export for query modules)

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The caller (driver) owns the session; pin the one conf our
            # semantics depend on. DuckDB timestamps are UTC-naive, and the
            # reference's SimpleDateFormat rendering must not drift with the
            # host TZ (CallsCustomerJoiner renders in JVM-default TZ — a
            # portability bug we fix, not inherit). Check-then-set so a
            # correctly-configured session is never mutated mid-flight.
            ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__doc__ = fn.__doc__
        wrapped.__name__ = fn.__name__
        REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return the
    registry."""
    from . import (  # noqa: F401
        corpus_queries,
        dedup_queries,
        pipeline_queries,
        relational_queries,
        rosetta_queries,
        streaming_queries,
    )

    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
