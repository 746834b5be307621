"""Rekey operators (P1/P2) and the null filter (P3).

Kafka Streams must materialize a rekey into a repartition topic before any
stateful op (``selectKey`` at ``CallsAggregationApp.java:54``, the explicit
through-topic at ``CallsEnrichedApp.java:56-58``). In Spark the *partitioning
requirement* is declared, not hand-built: Catalyst's ``EnsureRequirements``
inserts exactly one shuffle exchange in front of the stateful operator, so
``rekey`` here is a pure projection — no extra I/O round trip, which at 100 TB
removes an entire produce→broker→consume hop per stateful stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_key(df: DataFrame, key: Column | str, key_col: str = "key") -> DataFrame:
    """P1: ``selectKey((k, v) -> v.get("id_telef_origen"))``
    (``CallsAggregationApp.java:54,83``) — replace the record key with a value
    field, keeping the value intact."""
    key_expr = F.col(key) if isinstance(key, str) else key
    return df.withColumn(key_col, key_expr.cast("string"))


def rekey(df: DataFrame, key: Column | str, key_col: str = "key") -> DataFrame:
    """P2: ``map((k, v) -> new KeyValue<>(String.valueOf(v.getTELEFONO()), v))``
    (``CallsEnrichedApp.java:54,61``) — same projection; the String.valueOf
    cast is the ``cast("string")`` below."""
    return select_key(df, key, key_col)


def filter_not_null(df: DataFrame, col: Column | str) -> DataFrame:
    """P3: ``.filter((k, v) -> v != null)`` (``CallsAggregationApp.java:82``)."""
    c = F.col(col) if isinstance(col, str) else col
    return df.where(c.isNotNull())
