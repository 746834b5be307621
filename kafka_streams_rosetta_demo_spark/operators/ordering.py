"""Distributed total-order utilities: global rank without a global sort
bottleneck.

The naive Spark spelling of a corpus-wide rank —
``row_number().over(Window.orderBy(...))`` with no partition key — plans a
SINGLE-partition exchange: one task sorts the entire dataset, the one
shape guaranteed to fail at 100 TB. The scale-correct pattern (what RDD
``zipWithIndex`` does, expressed in DataFrame terms) is:

1. ``repartitionByRange`` on the sort key — each partition holds a
   contiguous, ordered key range (boundaries from a sample; WHERE a row
   lands can vary with the sample, its final rank cannot);
2. per-partition local ranks (a window partitioned by
   ``spark_partition_id()`` — parallel, partition-local sorts);
3. per-partition row counts → prefix-sum offsets (P-sized driver model
   state, like the kmeans centroids);
4. ``global_rank = offset[pid] + local_rank`` via one constant-folded
   CASE/map literal.

Two passes over the data, no single-task sort, exact total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    n_partitions: int = 32,
    rank_col: str = "global_rank",
) -> DataFrame:
    """Add a 1-based exact global rank by ``order_cols`` (which must be a
    total order — include a tiebreaker column) without ever sorting on a
    single task.

    The offsets collect is ``n_partitions`` longs — bounded model state.
    Rank determinism does NOT depend on the range sampler: whatever
    boundaries it picks, ranges are ordered and disjoint, so offset +
    local rank reproduces the unique total order.
    """
    parts = df.repartitionByRange(n_partitions, *order_cols).withColumn(
        "_gr_pid", F.spark_partition_id()
    )
    parts = parts.localCheckpoint()  # rank + count must see the SAME layout
    counts = {
        r._gr_pid: r.n
        for r in parts.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    w = Window.partitionBy("_gr_pid").orderBy(*order_cols)
    offset_expr = "CASE _gr_pid {} ELSE 0L END".format(
        " ".join(f"WHEN {pid} THEN {off}L" for pid, off in sorted(offsets.items()))
    )
    return (
        parts.withColumn("_gr_local", F.row_number().over(w).cast("long"))
        .withColumn(rank_col, F.expr(offset_expr) + F.col("_gr_local"))
        .drop("_gr_pid", "_gr_local")
    )
