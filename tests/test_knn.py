"""Similarity-search pins: brute-force exactness properties + IVF recall.

``knn_brute_force`` is oracle-checked by the driver; here we pin the
*relationship* between the exact and approximate paths, which no SQL oracle
can express: the IVF plan must stay a bucketed equi-join (no cartesian
product) and must keep recall@5 above a floor against the exact answer.
"""

from __future__ import annotations

from kafka_streams_rosetta_demo_spark.queries import load_all

QUERIES = load_all()

# Measured recall@5 on the synthetic near-orthogonal corpus: 0.9 (sf0.001) /
# 0.725 (sf0.01) with 32 cells x nprobe 8. Random data is the worst case for
# IVF (cell assignment barely correlates with neighborhood); the floor below
# catches parameter regressions without flaking on data this adversarial.
RECALL_FLOOR = 0.6


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ivf_recall_vs_brute_force(spark, sf_correctness):
    truth = _pairs(QUERIES["knn_brute_force"].fn(spark, sf_correctness))
    approx = _pairs(QUERIES["knn_ann_ivf"].fn(spark, sf_correctness))
    assert truth
    recall = len(truth & approx) / len(truth)
    assert recall >= RECALL_FLOOR, f"IVF recall@5 collapsed: {recall:.3f}"


def test_ann_plan_has_no_cartesian_product(spark, sf_correctness):
    plan = QUERIES["knn_ann_ivf"].fn(spark, sf_correctness)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # candidate generation must be an equi join on the cell id
    assert "cell_id" in plan


def test_brute_force_is_top5_per_query(spark, sf_smoke):
    out = QUERIES["knn_brute_force"].fn(spark, sf_smoke).toPandas()
    per_query = out.groupby("query_id").size()
    assert (per_query == 5).all()
    assert set(out["rank"].unique()) == {1, 2, 3, 4, 5}
    # self never appears as its own neighbor
    assert (out.query_id != out.neighbor_id).all()
