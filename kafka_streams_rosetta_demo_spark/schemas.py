"""StructType equivalents of the reference's Avro schemas.

The reference's entire type surface (SURVEY.md §1) is three Avro records plus
one implied input schema; only primitives and nullable unions appear:

- *CallAggregate*   — ``calls_agg/src/main/resources/callagg.avsc:4-11`` (generic,
  string window_start_ts / int counters) and the authoritative long variant
  ``calls_enr_customers/src/main/resources/avro/callaggcust.avsc:2-13``.
- *CustomerAggregate* — ``callaggcust.avsc:32-44`` (all nullable unions).
- *CallAggregateCust* — ``callaggcust.avsc:14-31`` (enriched output; window
  bounds pre-formatted as strings per ``CallCustomerJoiner.java:32-40``).
- implied raw CALLS input — field accesses ``CallsAggregationApp.java:54,72,74-75``.

Avro ``["null", T]`` unions map to nullable StructFields; ``long`` epoch-ms
timestamps are modelled internally as TimestampType and re-exposed as epoch ms
only at the serialization edge (see :mod:`..streaming.kafka_io`).
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

# -- implied raw CALLS input (CallsAggregationApp.java:54,72,74-75): the Kafka
# record timestamp drives 1h tumbling windows (TimeWindows.of, :57).
CALLS_RAW = T.StructType(
    [
        T.StructField("id_telef_origen", T.StringType(), False),
        T.StructField("duracion_origen", T.LongType(), False),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)

# -- CallAggregate (callaggcust.avsc:2-13, long/SpecificRecord variant).
CALL_AGGREGATE = T.StructType(
    [
        T.StructField("WINDOW_START_TS", T.LongType(), False),  # epoch millis
        T.StructField("ID_TELEF_ORIGEN", T.StringType(), False),
        T.StructField("CALLS_COUNT", T.LongType(), False),
        T.StructField("MAX_DURACION_ORIGEN", T.LongType(), False),
        T.StructField("TOTAL_DURACION_ORIGEN", T.LongType(), False),
        T.StructField("AVG_DURACION_ORIGEN", T.LongType(), False),
    ]
)

# -- CustomerAggregate (callaggcust.avsc:32-44): every field ["null", T].
CUSTOMER_AGGREGATE = T.StructType(
    [
        T.StructField("TELEF_Y_DOC", T.StringType(), True),
        T.StructField("TELEFONO", T.StringType(), True),  # join key after rekey
        T.StructField("DOC_CLIENTE", T.StringType(), True),
        T.StructField("CLIENTE_ORANGE", T.IntegerType(), True),
        T.StructField("DAYS_EXCLIENTE", T.IntegerType(), True),
        T.StructField("OPERADOR_ACTUAL", T.StringType(), True),
        T.StructField("RIESGO", T.StringType(), True),
    ]
)

# -- CallAggregateCust (callaggcust.avsc:14-31): enriched output; window bounds
# are formatted strings (CallCustomerJoiner.java:32-40), customer side nullable.
CALL_AGGREGATE_CUST = T.StructType(
    [
        T.StructField("id_telef_origen", T.StringType(), False),
        T.StructField("window_start_ts", T.StringType(), False),
        T.StructField("window_end_ts", T.StringType(), False),
        T.StructField("calls_count", T.LongType(), False),
        T.StructField("max_duracion_origen", T.LongType(), False),
        T.StructField("total_duracion_origen", T.LongType(), False),
        T.StructField("avg_duracion_origen", T.LongType(), False),
        T.StructField("doc_cliente", T.StringType(), True),
        T.StructField("cliente_orange", T.IntegerType(), True),
        T.StructField("days_excliente", T.IntegerType(), True),
        T.StructField("operador_actual", T.StringType(), True),
        T.StructField("riesgo", T.StringType(), True),
    ]
)


def _spark_to_avro_field(field: T.StructField) -> dict:
    prim = {
        T.StringType(): "string",
        T.LongType(): "long",
        T.IntegerType(): "int",
        T.DoubleType(): "double",
        T.FloatType(): "float",
        T.BooleanType(): "boolean",
        T.BinaryType(): "bytes",
    }
    if isinstance(field.dataType, T.TimestampType):
        avro_t: object = {"type": "long", "logicalType": "timestamp-millis"}
    else:
        avro_t = prim[field.dataType]
    if field.nullable:
        return {"name": field.name, "type": ["null", avro_t], "default": None}
    return {"name": field.name, "type": avro_t}


def avro_schema_json(struct: T.StructType, name: str, namespace: str = "rosetta") -> str:
    """Writer-schema JSON for ``from_avro``/``to_avro`` at the Kafka edge.

    Mirrors the .avsc files the reference parses at startup
    (``CallsAggregationApp.java:43-47``) / compiles via avro-maven-plugin
    (``calls_enr_customers/pom.xml:136-153``).
    """
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "namespace": namespace,
            "fields": [_spark_to_avro_field(f) for f in struct.fields],
        }
    )
