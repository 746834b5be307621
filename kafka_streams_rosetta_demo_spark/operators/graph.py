"""Graph operators: connected components for dedup clustering.

Near-duplicate *pairs* (operators/textsim.py) are only half the dedup story
— a training pipeline must collapse each transitive group of near-dups to
one canonical document (A~B, B~C ⇒ {A,B,C} keep one). That grouping is
connected components over the pair graph.

Scale design: min-label propagation, the standard distributed CC. Each
iteration is one equi-join + one groupBy-min — plain shuffles on the node
id, no driver-side graph. Iteration count is bounded by the component
*diameter*, and near-dup components are shallow (near-duplication is close
to transitive), so a handful of rounds converge; the ``large-star /
small-star`` variant (Kiveris et al., "Connected Components in MapReduce
and Beyond") drops that to O(log d) for adversarially long chains and slots
into the same loop shape if ever needed. Per-iteration ``localCheckpoint``
truncates the lineage so the plan does not grow with iterations (the
classic iterative-algorithm failure mode on Spark).

The driver-side loop carries only a scalar convergence flag per round —
never node or edge data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the smallest node id
    in its component. Returns (id, component) — one row per distinct node.

    ``edges`` may be directed pairs; they are symmetrized here, so the
    result is components of the undirected graph.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        merged = labels.join(nbr_min, labels["id"] == nbr_min["id2"], "left").select(
            "id",
            F.col("component").alias("old_component"),
            F.least(
                F.col("component"), F.coalesce("nbr_component", "component")
            ).alias("component"),
        )
        merged = merged.localCheckpoint(eager=True)
        changed = merged.where(F.col("component") != F.col("old_component")).count()
        labels = merged.select("id", "component")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
