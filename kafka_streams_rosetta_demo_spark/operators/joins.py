"""Join operators.

Reference parity (J1/J2): the only join in the reference is an equi,
left-outer, N:1 stream-table lookup on a string key
(``calls.leftJoin(customers, joiner)``, ``CallsEnrichedApp.java:63``; the
projection body ``CallCustomerJoiner.java:15-30``). The manual
co-partitioning through-topic (``CallsEnrichedApp.java:56-58``) is
unnecessary here — the shuffle exchange (or a broadcast) co-partitions the
sides automatically (SURVEY.md J2).

Scale: a customer dimension is small relative to a 100 TB fact stream, so the
lookup is a *broadcast* hash join by default — zero shuffle of the big side.
If the dimension outgrows broadcast (multi-GB), drop ``broadcast_dim=False``
and AQE picks shuffle-hash / sort-merge with skew splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.nulls import customer_defaults


def stream_table_left_join(
    stream: DataFrame,
    table: DataFrame,
    stream_key: str,
    table_key: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1: for each stream event, look up the current table row by key; emit
    the event even when no row exists (null side handled by the caller's
    projection, as ``CallCustomerJoiner.java:24-28`` does)."""
    dim = F.broadcast(table) if broadcast_dim else table
    return stream.join(dim, on=stream[stream_key] == table[table_key], how="left")


def enrich_calls_with_customers(
    call_agg: DataFrame,
    customers: DataFrame,
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1 + P4 + F1-F3: the full ``CallsEnrichedApp`` topology body.

    Input ``call_agg`` is the unwrapped windowed aggregate (window_start /
    window_end timestamps + metrics); ``customers`` is the CustomerAggregate
    dimension keyed by TELEFONO. Output is the flat *CallAggregateCust* record
    (``callaggcust.avsc:14-31``): six call fields with formatted window
    bounds, five null-coalesced customer fields
    (``CallCustomerJoiner.java:15-30``).
    """
    from ..functions.datetime_fmt import ROSETTA_TS_FORMAT

    joined = stream_table_left_join(
        call_agg, customers, "id_telef_origen", "TELEFONO", broadcast_dim
    )
    d = customer_defaults
    return joined.select(
        F.col("id_telef_origen"),
        F.date_format("window_start", ROSETTA_TS_FORMAT).alias("window_start_ts"),
        F.date_format("window_end", ROSETTA_TS_FORMAT).alias("window_end_ts"),
        F.col("calls_count"),
        F.col("max_duracion_origen"),
        F.col("total_duracion_origen"),
        F.col("avg_duracion_origen"),
        F.coalesce("DOC_CLIENTE", F.lit(d["DOC_CLIENTE"])).alias("doc_cliente"),
        F.coalesce("CLIENTE_ORANGE", F.lit(d["CLIENTE_ORANGE"])).alias("cliente_orange"),
        F.coalesce("DAYS_EXCLIENTE", F.lit(d["DAYS_EXCLIENTE"])).alias("days_excliente"),
        F.coalesce("OPERADOR_ACTUAL", F.lit(d["OPERADOR_ACTUAL"])).alias("operador_actual"),
        F.coalesce("RIESGO", F.lit(d["RIESGO"])).alias("riesgo"),
    )


# ---------------------------------------------------------------------------
# Wider join surface (absent in the reference, SURVEY.md §2.8 — exposed so a
# reference user gains the full relational join set natively).
# ---------------------------------------------------------------------------


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """General equi/theta join; ``how`` ∈ inner/left/right/full/left_semi/
    left_anti/cross. ``broadcast_right`` hints the small side."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)
