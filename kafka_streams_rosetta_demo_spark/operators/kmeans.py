"""Distributed Lloyd's KMeans over an ``array<float>`` embedding column.

The IVF index (operators/vectors.py) takes its centroid list as a model
parameter; this operator is the trainer that produces it. Production note
in pipeline_queries.knn_ann_ivf said "a production build would train them
with KMeans" — this is that trainer, DataFrame-native:

- **Assignment** is the same closed-form literal-matrix argmax the IVF
  index uses (``ivf_assign``): per-row expression, no join, no shuffle.
- **Update** recomputes each centroid as the element-wise mean of its
  cell: one ``posexplode`` + (cell, dim) groupBy — a single shuffle whose
  key space is k x dim (tiny), with map-side partial aggregation doing the
  heavy reduction. No vectors ever reach the driver; only the k x dim
  centroid matrix does (model state, same as the IVF literal).
- **Convergence** is measured by max centroid displacement, a k-row
  aggregate.

Iteration count is a fixed small budget (Lloyd converges fast in practice;
each round costs one scan + one k x dim shuffle). Empty cells keep their
previous centroid (the standard guard; re-seeding is a policy choice).

Determinism: given a fixed deterministic init (id-sampled vectors, like
knn_ann_ivf uses) and fixed iteration count, the trained centroids are
reproducible — sum order inside the mean is the only float nondeterminism,
and Spark's partial-sum order can vary across partitionings, so tests pin
against a numpy twin with a tolerance rather than bit equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .vectors import ivf_assign


def kmeans_train(
    vectors: DataFrame,
    init_centroids: list[tuple[int, list[float]]],
    n_iter: int = 5,
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Run ``n_iter`` Lloyd rounds from ``init_centroids``; returns the
    trained (cell_id, centroid) list, cell ids preserved."""
    centroids = list(init_centroids)
    dim = len(centroids[0][1])
    for _ in range(n_iter):
        assigned = ivf_assign(vectors, centroids, vec_col=vec_col)
        means = (
            assigned.select(
                "cell_id", F.posexplode(F.col(vec_col)).alias("dim", "x")
            )
            .groupBy("cell_id", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cell_id", F.col("dm.m").alias("centroid"))
            .collect()
        )
        new = {int(r["cell_id"]): [float(x) for x in r["centroid"]] for r in means}
        centroids = [
            (cid, new.get(cid, old)) for cid, old in centroids
        ]
        assert all(len(c) == dim for _, c in centroids)
    return centroids


def kmeans_inertia(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Sum of squared L2 distances to the assigned (nearest-cosine) centroid
    — the objective used to check training made progress."""
    from .vectors import const_matrix, multi_dot, norm

    assigned = ivf_assign(vectors, centroids, vec_col=vec_col)
    # squared distance to own centroid: |v|^2 - 2 v.c + |c|^2 via the
    # literal matrix (one pass), picking the assigned row
    m = [c for _, c in centroids]
    cid_index = {cid: i for i, (cid, _) in enumerate(centroids)}
    dots = multi_dot(F.col(vec_col), m)
    c_sq = F.lit([sum(x * x for x in c) for c in m])
    idx = F.coalesce(
        *[
            F.when(F.col("cell_id") == cid, F.lit(i))
            for cid, i in cid_index.items()
        ]
    )
    v_sq = norm(F.col(vec_col)) ** 2
    d2 = (
        v_sq
        - F.lit(2.0) * F.element_at(dots, idx + 1)
        + F.element_at(c_sq, idx + 1)
    )
    return assigned.select(F.sum(d2).alias("inertia")).collect()[0]["inertia"]
