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


# Rotation window for the external correctness gate, which samples the FIRST
# 50 registry entries in iteration order. Rounds 1-3 only ever sampled the
# first 50 of module-import order, so 34 queries (all streaming_*, the S2/S5
# rosetta parity queries, session/sliding windows, as-of/range joins, and the
# round-3 relational additions) never earned a driver-checked row. This list
# puts exactly those first, then new round-4 queries, then the stalest
# previously-checked rows (last seen round 1). Everything else follows in
# registration order.
#
# From round 5 on the rotation is automatic: _staleness_order() reads the
# committed CORRECTNESS_r*.json history and fronts never-checked queries,
# then least-recently-checked — so every new query and every aging row cycles
# back into the gate window with zero list maintenance. This static list is
# the fallback when the history files are absent (fresh clone without round
# artifacts).
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked through round 3 (34) ---
    "streaming_calls_window_agg",
    "streaming_ktable_latest",
    "streaming_enriched",
    "streaming_suppress_final",
    "streaming_dedup_events",
    "rosetta_ktable_latest",
    "rosetta_deser_policy",
    "window_session",
    "window_sliding",
    "window_session_dynamic",
    "join_asof",
    "join_range",
    "join_skew_salted",
    "join_null_safe",
    "timeseries_gap_fill",
    "funnel_stages",
    "retention_cohorts",
    "cdc_upsert_apply",
    "sql_lateral_topk",
    "sql_scalar_subquery",
    "sql_exists_correlated",
    "unnest_tokens",
    "window_distribution_ranks",
    "agg_listagg_ordered",
    "agg_stats_moments",
    "window_range_frame",
    "agg_histogram_bins",
    "scalar_regex_extract",
    "window_first_last",
    "agg_filtered_bool",
    "set_except_all",
    "set_intersect_all",
    "unpivot_metrics",
    "window_rolling_distinct",
    # --- new in round 4 ---
    "multimodal_resize",
    "kmeans_inertia",
    "kafka_wire_framing",
    # --- stalest previously-checked (last driver-green: round 1) ---
    "rosetta_select_key",
    "rosetta_rekey_customers",
    "rosetta_filter_not_null",
    "rosetta_enriched",
    "rosetta_null_defaults",
    "rosetta_calls_window_agg",
    "rosetta_date_format",
    "sql_in_subquery",
    "pivot_status_by_flag",
    "scalar_case_when",
    "scalar_strings",
    "scalar_math",
    "scalar_dates",
)


def _staleness_order(root=None) -> list[str] | None:
    """Order registry names by correctness-evidence staleness: queries whose
    MOST RECENT gate row failed (``err`` set, or any of
    rows/schema/hash_match false) first — a failed row is a reason to
    re-check immediately, not evidence to coast on — then never-checked,
    then ascending by the round a query last earned a gate row (ties keep
    registration order, which is deterministic). Reads the committed
    ``CORRECTNESS_r*.json`` round artifacts next to ``__spark_entry__.py``;
    returns None when none exist."""
    import json
    import re
    from pathlib import Path

    root = Path(root) if root is not None else Path(__file__).resolve().parents[2]
    # name -> (round of most recent row, did that row fail)
    last: dict[str, tuple[int, bool]] = {}
    found = False
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        found = True
        rnd = int(m.group(1))
        for name, row in rows.items():
            failed = False
            if isinstance(row, dict):
                failed = bool(row.get("err")) or not (
                    row.get("rows_match", True)
                    and row.get("schema_match", True)
                    and row.get("hash_match", True)
                )
            prev = last.get(name)
            if prev is None or rnd >= prev[0]:
                last[name] = (rnd, failed)
    if not found:
        return None
    names = list(REGISTRY)
    return sorted(
        names,
        key=lambda n: (
            not last.get(n, (0, False))[1],  # most-recent-row-failed first
            last.get(n, (-1, False))[0],  # then never-checked, then oldest
            names.index(n),
        ),
    )


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return the
    registry, ordered so the driver's first-50 correctness sample covers the
    queries with the least (or stalest) prior evidence."""
    from . import (  # noqa: F401
        corpus_queries,
        dedup_queries,
        graph_queries,
        pipeline_queries,
        preference_queries,
        relational_queries,
        rosetta_queries,
        sketch_queries,
        streaming_queries,
        tpch_queries,
    )

    priority = _staleness_order() or [
        n for n in _DRIVER_WINDOW_PRIORITY if n in REGISTRY
    ]
    ordered: dict[str, Query] = {}
    for name in priority:
        ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
