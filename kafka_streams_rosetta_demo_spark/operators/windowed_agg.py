"""Tumbling-window call aggregation (A1-A4).

Reference: ``CallsAggregationApp.java:53-85`` — ``groupByKey`` (A1) →
``windowedBy(TimeWindows.of(Duration.ofHours(1)))`` (A2) → custom
initializer/adder ``aggregate`` (A3) → ``toStream((w, v) -> w.key())`` (A4).

⚠ Intended-vs-as-written semantics (SURVEY.md §2.4): the reference's adder is
degenerate — it ignores the accumulator (count always 0 at :73, max compares
the new value with itself at :74, total double-adds at :75, avg always 0 at
:76). The golden test fixture (count=5, max=3, total=12, avg=2,
``CallsEnrichedAppTest.java:118-121``) pins the *intended* math: count / max /
sum / truncating integer average per (key, 1h window). This engine implements
the intended semantics; the divergence is documented here and encoded in the
DuckDB oracles.

Scale: expressed as built-in aggregate expressions, Spark runs this as
partial (map-side) aggregation + a single hash shuffle on (key, window) —
no UDAF, whole-stage codegen end to end, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_call_agg(
    calls: DataFrame,
    key: str = "id_telef_origen",
    duration: str = "duracion_origen",
    ts: str = "event_ts",
    window_duration: str = "1 hour",
) -> DataFrame:
    """A1+A2+A3: per (key, tumbling window) → count / max / sum / integer avg.

    The integer average truncates like Java long division
    (``total / count`` on longs), matching the golden fixture avg=2 for
    total=12 / count=5.
    """
    counts = F.count(F.lit(1))
    total = F.sum(duration)
    return calls.groupBy(F.window(ts, window_duration).alias("window"), F.col(key)).agg(
        counts.alias("calls_count"),
        F.max(duration).alias("max_duracion_origen"),
        total.alias("total_duracion_origen"),
        # truncating long division; inputs are non-negative durations so
        # floor == Java's truncate-toward-zero
        F.floor(total / counts).alias("avg_duracion_origen"),
    )


def unwrap_window(agg: DataFrame, key: str = "id_telef_origen") -> DataFrame:
    """A4: flatten the window struct back to plain columns.

    KS re-derives window bounds downstream from a carried ``WINDOW_START_TS``
    long (``callaggcust.avsc:6``, ``CallCustomerJoiner.java:32-40``); Spark
    keeps both bounds as ordinary columns so this is a projection.
    """
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.col(key),
        "calls_count",
        "max_duracion_origen",
        "total_duracion_origen",
        "avg_duracion_origen",
    )
