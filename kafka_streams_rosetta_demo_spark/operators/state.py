"""Stateful table semantics: KTable latest-value-per-key (S2).

``builder.table(topic)`` (``CallsEnrichedApp.java:58``) materializes a
changelog topic as its latest value per key. In Spark that state is an
aggregation, not a sort: ``max_by(struct(<row>), struct(ts, seq))`` — an
ordinary aggregate with map-side partial combine, so a 100 TB changelog
collapses per-partition before the single shuffle on the key (a
``row_number`` window would instead sort every partition's full history).
The (ts, seq) struct order makes the winner deterministic under
equal-timestamp updates, which Kafka resolves by offset — ``seq`` is the
offset stand-in.

The same expression runs unchanged under Structured Streaming in update mode
(see streaming/), which is exactly the KTable upsert semantics: each
micro-batch re-emits keys whose latest row changed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key: str | list[str],
    ts_col: str,
    seq_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Latest row per key, ordered by (ts, seq); emits ``last_<col>`` values."""
    keys = [key] if isinstance(key, str) else list(key)
    payload = F.struct(
        *[F.col(c).alias(f"last_{c}") for c in value_cols],
    )
    order: Column = F.struct(F.col(ts_col), F.col(seq_col))
    return (
        df.groupBy(*keys)
        .agg(F.max_by(payload, order).alias("_latest"))
        .select(*keys, "_latest.*")
    )
