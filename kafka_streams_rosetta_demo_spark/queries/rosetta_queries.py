"""Reference-parity queries (SURVEY.md §2.1-§2.6 inventory).

Each query probes one (or one cluster of) reference operators on the
testdata role mapping; the oracle encodes the *intended* reference semantics
(SURVEY.md §2.4 ⚠ — the as-written adder is degenerate).

The CTE shared by most oracles mirrors :func:`..sources.parquet.rosetta_calls`
/ :func:`..sources.parquet.rosetta_customers` exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rekey import filter_not_null, rekey, select_key
from ..plans.rosetta import calls_aggregation_plan, enriched_calls_plan
from ..sources.parquet import load_table, rosetta_calls, rosetta_customers
from . import register

# Shared oracle CTEs — the DuckDB twin of the testdata role mapping.
CALLS_CTE = """
calls AS (
    SELECT CAST(user_id AS VARCHAR) AS id_telef_origen,
           CAST(floor(value) AS BIGINT) AS duracion_origen,
           ts AS event_ts
    FROM events
)
"""

CUSTOMERS_CTE = """
customers AS (
    SELECT concat(CAST(c_custkey AS VARCHAR), '_', c_name) AS TELEF_Y_DOC,
           CAST(c_custkey AS VARCHAR) AS TELEFONO,
           c_name AS DOC_CLIENTE,
           CAST(c_nationkey AS INTEGER) AS CLIENTE_ORANGE,
           CAST(floor(c_acctbal) AS INTEGER) AS DAYS_EXCLIENTE,
           c_mktsegment AS OPERADOR_ACTUAL,
           CASE WHEN c_acctbal < 1000 THEN 'HIGH'
                WHEN c_acctbal < 5000 THEN 'MEDIUM'
                ELSE 'LOW' END AS RIESGO
    FROM customer
    WHERE c_acctbal >= 0
)
"""

CALL_AGG_CTE = f"""
{CALLS_CTE.rstrip().rstrip(',')},
call_agg AS (
    SELECT date_trunc('hour', event_ts) AS window_start,
           date_trunc('hour', event_ts) + INTERVAL 1 HOUR AS window_end,
           id_telef_origen,
           count(*) AS calls_count,
           max(duracion_origen) AS max_duracion_origen,
           CAST(sum(duracion_origen) AS BIGINT) AS total_duracion_origen,
           CAST(sum(duracion_origen) AS BIGINT) // count(*) AS avg_duracion_origen
    FROM calls
    GROUP BY 1, 2, 3
)
"""


@register(
    "rosetta_select_key",
    oracle=f"""
WITH {CALLS_CTE.strip()}
SELECT id_telef_origen AS key, id_telef_origen, duracion_origen, event_ts
FROM calls
""",
)
def rosetta_select_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: selectKey — rekey the CALLS stream by ``id_telef_origen``
    (``CallsAggregationApp.java:54``)."""
    return select_key(rosetta_calls(spark, sf_dir), "id_telef_origen")


@register(
    "rosetta_rekey_customers",
    oracle=f"""
WITH {CUSTOMERS_CTE.strip()}
SELECT TELEFONO AS key, TELEF_Y_DOC, TELEFONO, DOC_CLIENTE, CLIENTE_ORANGE,
       DAYS_EXCLIENTE, OPERADOR_ACTUAL, RIESGO
FROM customers
""",
)
def rosetta_rekey_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: map-rekey the customer table by TELEFONO
    (``CallsEnrichedApp.java:54``)."""
    return rekey(rosetta_customers(spark, sf_dir), "TELEFONO")


@register(
    "rosetta_filter_not_null",
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE value IS NOT NULL
""",
)
def rosetta_filter_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: drop null-valued records (``CallsAggregationApp.java:82``)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return filter_not_null(ev, "value")


@register(
    "rosetta_calls_window_agg",
    oracle=f"""
WITH {CALL_AGG_CTE.strip()}
SELECT * FROM call_agg
""",
)
def rosetta_calls_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4: pipeline 1 — 1h tumbling window count/max/sum/integer-avg per
    caller (``CallsAggregationApp.java:53-85``, intended semantics)."""
    return calls_aggregation_plan(spark, sf_dir)


@register(
    "rosetta_enriched",
    oracle=f"""
WITH {CALL_AGG_CTE.strip()},
{CUSTOMERS_CTE.strip()}
SELECT a.id_telef_origen,
       strftime(a.window_start, '%d/%m/%Y %H:%M') AS window_start_ts,
       strftime(a.window_end, '%d/%m/%Y %H:%M') AS window_end_ts,
       a.calls_count,
       a.max_duracion_origen,
       a.total_duracion_origen,
       a.avg_duracion_origen,
       coalesce(c.DOC_CLIENTE, 'Unknown') AS doc_cliente,
       coalesce(c.CLIENTE_ORANGE, 0) AS cliente_orange,
       coalesce(c.DAYS_EXCLIENTE, 0) AS days_excliente,
       coalesce(c.OPERADOR_ACTUAL, 'Unknown') AS operador_actual,
       coalesce(c.RIESGO, 'Unknown') AS riesgo
FROM call_agg a
LEFT JOIN customers c ON a.id_telef_origen = c.TELEFONO
""",
)
def rosetta_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: pipelines 1+2 fused — J1 stream-table left join + P4
    projection + F1-F3 scalars (``CallsEnrichedApp.java:45-68``,
    ``CallCustomerJoiner.java:15-41``)."""
    return enriched_calls_plan(spark, sf_dir)


@register(
    "rosetta_date_format",
    oracle="""
SELECT event_id,
       strftime(ts, '%d/%m/%Y %H:%M') AS fmt_ts,
       strftime(ts + INTERVAL 1 HOUR, '%d/%m/%Y %H:%M') AS fmt_ts_plus_1h
FROM events
""",
)
def rosetta_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: SimpleDateFormat-style rendering + add-hours
    (``CallCustomerJoiner.java:32-40``)."""
    from ..functions.datetime_fmt import ROSETTA_TS_FORMAT

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", ROSETTA_TS_FORMAT).alias("fmt_ts"),
        F.date_format(
            F.col("ts") + F.expr("INTERVAL 1 HOUR"), ROSETTA_TS_FORMAT
        ).alias("fmt_ts_plus_1h"),
    )


@register(
    "rosetta_null_defaults",
    oracle=f"""
WITH {CUSTOMERS_CTE.strip()},
all_keys AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS TELEFONO_ALL FROM customer)
SELECT k.TELEFONO_ALL AS telefono,
       coalesce(c.DOC_CLIENTE, 'Unknown') AS doc_cliente,
       coalesce(c.CLIENTE_ORANGE, 0) AS cliente_orange,
       coalesce(c.OPERADOR_ACTUAL, 'Unknown') AS operador_actual
FROM all_keys k LEFT JOIN customers c ON k.TELEFONO_ALL = c.TELEFONO
""",
)
def rosetta_null_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: null-coalescing defaults on the left join's null side
    (``CallCustomerJoiner.java:24-28``) — the case the reference never
    tests."""
    all_keys = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").cast("string").alias("TELEFONO_ALL"))
        .distinct()
    )
    customers = rosetta_customers(spark, sf_dir)
    joined = all_keys.join(
        F.broadcast(customers),
        all_keys["TELEFONO_ALL"] == customers["TELEFONO"],
        "left",
    )
    return joined.select(
        F.col("TELEFONO_ALL").alias("telefono"),
        F.coalesce("DOC_CLIENTE", F.lit("Unknown")).alias("doc_cliente"),
        F.coalesce("CLIENTE_ORANGE", F.lit(0)).alias("cliente_orange"),
        F.coalesce("OPERADOR_ACTUAL", F.lit("Unknown")).alias("operador_actual"),
    )
