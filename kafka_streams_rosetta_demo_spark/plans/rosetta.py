"""The flagship Rosetta plan: the reference's two pipelines, fused.

Pipeline 1 (``CallsAggregationApp.createTopology``,
``CallsAggregationApp.java:36-88``): CALLS → selectKey → groupByKey →
1h tumbling window → count/max/sum/avg aggregate → unwrap window → filter.

Pipeline 2 (``CallsEnrichedApp.buildTopology``,
``CallsEnrichedApp.java:45-68``): rekey customers by TELEFONO → KTable →
left join call aggregates → ``CallCustomerJoiner`` projection
(formatted window bounds + null-coalesced customer attributes).

The reference chains them through the CALLS_AGG Kafka topic; in batch they
compose as one declarative plan, which lets Catalyst see through the boundary
(column pruning reaches the events scan; the dimension join is broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.joins import enrich_calls_with_customers
from ..operators.rekey import filter_not_null
from ..operators.windowed_agg import unwrap_window, windowed_call_agg
from ..sources.parquet import rosetta_calls, rosetta_customers


def calls_aggregation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline 1 on the testdata role mapping (events → CALLS)."""
    calls = rosetta_calls(spark, sf_dir)
    agg = windowed_call_agg(calls)
    flat = unwrap_window(agg)
    # P3: KS emits nulls for deleted aggregates; batch aggregates are never
    # null but the operator stays in the plan for topology parity.
    return filter_not_null(flat, "calls_count")


def enriched_calls_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipelines 1+2 fused — the flagship query (SURVEY.md §7)."""
    agg = calls_aggregation_plan(spark, sf_dir)
    customers = rosetta_customers(spark, sf_dir)
    return enrich_calls_with_customers(agg, customers)
