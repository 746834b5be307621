"""Structured Streaming layer (SURVEY §2.1 sources/sinks, §2.6 semantics).

The reference *is* a streaming system: Kafka topics in and out
(``CallsAggregationApp.java:51,85``), a KTable state store
(``CallsEnrichedApp.java:58``), 1-hour windows with KS 2.6's default 24-hour
grace (``CallsAggregationApp.java:57``), continuous (update-mode) emission —
no ``suppress`` anywhere — and checkpointed RocksDB state
(``CallsAggregationApp.java:106``).

Layout:

- :mod:`.kafka_io`  — topic specs: Kafka reader/writer options +
  serialize/parse projections (``from_avro``/``to_avro`` when the spark-avro
  package is on the classpath, JSON serde otherwise — this environment ships
  no spark-avro jar and no broker, so the Avro path is construction-gated and
  the JSON path is what tests exercise).
- :mod:`.transforms` — the streaming forms of the batch operators:
  watermarked windowed aggregation (T1–T3), latest-per-key KTable state (S2),
  and the per-micro-batch broadcast-lookup enrichment join (J1).
- :mod:`.runner` — query start/stop with checkpointing (T4/T6) and the
  brokerless file-source pipelines the correctness gate runs end to end.
- :mod:`.stateful` — ``applyInPandasWithState`` custom per-key state
  machines (the Processor-API analogue).
- :mod:`.admin` — topic DDL from properties-style config (S4), client-gated.

Everything stateful reuses the *same* DataFrame functions as the batch path —
the streaming layer adds watermarks, output mode, and sinks, nothing else.
That is the design bet of this engine: one declarative plan, two execution
modes.
"""
