"""Null-coalescing defaults (F3).

``CallCustomerJoiner.java:24-28``: when the customer side of the left join is
absent, string fields default to ``"Unknown"`` and int fields to ``0``. KS
coalesces only when the whole row is missing; per-column ``coalesce`` is
equivalent here because matched rows pass fields through untouched
(SURVEY.md F3 note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (column -> default) for the CustomerAggregate enrichment fields,
# CallCustomerJoiner.java:24-28.
customer_defaults: dict[str, object] = {
    "DOC_CLIENTE": "Unknown",
    "CLIENTE_ORANGE": 0,
    "DAYS_EXCLIENTE": 0,
    "OPERADOR_ACTUAL": "Unknown",
    "RIESGO": "Unknown",
}


def default_for(col: Column | str, default: object) -> Column:
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(default))


def with_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    out = df
    for name, default in defaults.items():
        out = out.withColumn(name, default_for(name, default))
    return out
