"""KMeans trainer pinned against a numpy twin running the identical
algorithm (cosine assignment to fixed-id centroids, element-wise mean
update, empty cells keep their centroid). Float sums cross partitions, so
the pin is a tight tolerance, not bit equality."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_streams_rosetta_demo_spark.operators.kmeans import kmeans_inertia, kmeans_train
from kafka_streams_rosetta_demo_spark.operators.vectors import ivf_assign
from kafka_streams_rosetta_demo_spark.sources.parquet import load_table


def _numpy_twin(vecs: dict[int, np.ndarray], init: list[tuple[int, np.ndarray]], n_iter: int):
    cents = {cid: c.astype(np.float64).copy() for cid, c in init}
    order = [cid for cid, _ in init]
    ids = sorted(vecs)
    X = np.stack([vecs[i] for i in ids]).astype(np.float64)
    for _ in range(n_iter):
        C = np.stack([cents[cid] for cid in order])
        sims = (X @ C.T) / (
            np.linalg.norm(X, axis=1, keepdims=True) * np.linalg.norm(C, axis=1)
        )
        # ties broken toward the max struct — cosine then cell id; argmax of
        # (sim, cid) pairs mirrors array_max over (score, cid) structs
        assign = np.array(
            [order[max(range(len(order)), key=lambda j: (sims[i, j], order[j]))]
             for i in range(len(ids))]
        )
        for cid in order:
            mask = assign == cid
            if mask.any():
                cents[cid] = X[mask].mean(axis=0)
    return [(cid, cents[cid]) for cid in order], {
        i: a for i, a in zip(ids, assign)
    }


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    rows = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding").collect()
    return {int(r["vec_id"]): np.array([float(x) for x in r["embedding"]]) for r in rows}


def test_kmeans_matches_numpy_twin(spark, sf_smoke, emb):
    vectors = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    init = [
        (int(vid), [float(x) for x in emb[vid]])
        for vid in sorted(emb)[:8]
    ]
    got = kmeans_train(vectors, init, n_iter=3)
    expected, exp_assign = _numpy_twin(
        emb, [(cid, np.array(c)) for cid, c in init], n_iter=3
    )
    assert [cid for cid, _ in got] == [cid for cid, _ in expected]
    for (_, g), (_, e) in zip(got, expected):
        np.testing.assert_allclose(np.array(g), e, rtol=0, atol=1e-9)

    # the trained centroids drive the same assignment as the twin
    assigned = {
        int(r["vec_id"]): int(r["cell_id"])
        for r in ivf_assign(vectors, got).select("vec_id", "cell_id").collect()
    }
    # recompute twin assignment against *trained* centroids
    _, final_assign = _numpy_twin(
        emb, [(cid, np.array(c)) for cid, c in got], n_iter=1
    )
    assert assigned == final_assign


def test_kmeans_training_reduces_inertia(spark, sf_smoke, emb):
    vectors = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    init = [(int(vid), [float(x) for x in emb[vid]]) for vid in sorted(emb)[:8]]
    before = kmeans_inertia(vectors, init)
    trained = kmeans_train(vectors, init, n_iter=3)
    after = kmeans_inertia(vectors, trained)
    assert after < before
