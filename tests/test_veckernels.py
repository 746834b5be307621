"""Bit-equality pins: the round-14 Arrow vector kernels vs their JVM
higher-order-function twins.

The kernels (operators/veckernels.py) claim EXACT reproduction of the HOF
folds — same left-assoc accumulation order, same tie-breaks, same NaN
ordering. These tests pin that claim row-for-row on the real table plus a
planted degenerate row (the all-zero vector, whose cosine against every
centroid is NaN — exercising the NaN-greatest / larger-cid tie-break the
synthetic corpus never hits)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_rosetta_demo_spark.operators.vectors import (
    ivf_assign,
    ivf_assign_hof,
)
from kafka_streams_rosetta_demo_spark.sources.parquet import load_table


def _base(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _centroids(base):
    rows = base.where(F.col("vec_id") % 31 == 0).orderBy("vec_id").limit(32).collect()
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows]


def test_ivf_assign_arrow_matches_hof(spark, sf_correctness):
    base = _base(spark, sf_correctness)
    cents = _centroids(base)
    a = ivf_assign_hof(base, cents).select("vec_id", "cell_id").orderBy("vec_id").collect()
    b = ivf_assign(base, cents).select("vec_id", "cell_id").orderBy("vec_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_ivf_assign_tie_breaks_to_larger_cid(spark, sf_correctness):
    # two centroids with IDENTICAL vectors -> equal cosine -> larger cid
    # must win in both twins (the struct array_max ordering)
    base = _base(spark, sf_correctness).limit(50)
    v = [float(x) for x in base.orderBy("vec_id").first()["embedding"]]
    cents = [(5, v), (7, v)]
    a = ivf_assign_hof(base, cents).select("vec_id", "cell_id").orderBy("vec_id").collect()
    b = ivf_assign(base, cents).select("vec_id", "cell_id").orderBy("vec_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert {r["cell_id"] for r in a} == {7}


def test_ivf_assign_arrow_zero_norm_raises_like_ansi(spark, sf_correctness):
    # the JVM twin's cosine division raises DIVIDE_BY_ZERO under ANSI on a
    # zero-norm vector; the kernel must fail as loudly, not emit NaN
    base = _base(spark, sf_correctness)
    cents = _centroids(base)
    zero = spark.createDataFrame(
        [(10_000_000, [0.0] * 64)], "vec_id bigint, embedding array<float>"
    )
    allv = base.unionByName(zero)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        ivf_assign_hof(allv, cents).collect()
    with pytest.raises(Exception, match="zero-norm"):
        ivf_assign(allv, cents).collect()


def test_pq_encode_recon_arrow_matches_hof(spark, sf_correctness):
    from kafka_streams_rosetta_demo_spark.queries.pipeline_queries import (
        _pq_codebooks,
        _pq_recon_frame,
        _pq_recon_frame_hof,
    )

    base = _base(spark, sf_correctness)
    cb = _pq_codebooks(base)
    a = _pq_recon_frame_hof(base, cb).select("vec_id", "recon").orderBy("vec_id").collect()
    b = _pq_recon_frame(base, cb).select("vec_id", "recon").orderBy("vec_id").collect()
    assert [(r["vec_id"], r["recon"]) for r in a] == [
        (r["vec_id"], r["recon"]) for r in b
    ]


def test_hyperplane_bands_arrow_matches_hof(spark, sf_correctness):
    # round 15: the banded-LSH signature kernel vs the multi_dot HOF fold —
    # every (id, band_id) must carry the IDENTICAL band_key long, including
    # a planted all-zero vector (dot exactly 0.0 -> sign bit 1 in both
    # engines: 0.0 >= 0) and a NaN-poisoned vector (every dot NaN -> bit
    # SET in both engines: Spark SQL's total order ranks NaN greatest, so
    # NaN >= 0 is true there and the kernel mirrors it)
    from kafka_streams_rosetta_demo_spark.operators.vectors import (
        hyperplane_band_keys,
        hyperplane_band_keys_hof,
        hyperplanes,
    )

    base = _base(spark, sf_correctness)
    special = spark.createDataFrame(
        [(10_000_000, [0.0] * 64), (10_000_001, [float("nan")] * 64)],
        "vec_id bigint, embedding array<float>",
    )
    allv = base.unionByName(special)
    planes = hyperplanes(dim=64, n=64, seed=7)
    a = (
        hyperplane_band_keys_hof(allv, planes, bands=4)
        .orderBy("vec_id", "band_id")
        .collect()
    )
    b = (
        hyperplane_band_keys(allv, planes, bands=4)
        .orderBy("vec_id", "band_id")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    nan_rows = [r for r in a if r["vec_id"] == 10_000_001]
    assert {r["band_key"] for r in nan_rows} == {(1 << 16) - 1}


def test_kernel_refuses_null_and_ragged_vectors(spark):
    from kafka_streams_rosetta_demo_spark.operators.veckernels import (
        ivf_assign_arrow,
    )

    cents = [(0, [1.0] * 64)]
    bad_null = spark.createDataFrame(
        [(1, None)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(Exception, match="null vectors"):
        ivf_assign_arrow(bad_null, cents).collect()
    bad_ragged = spark.createDataFrame(
        [(1, [1.0] * 63)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(Exception, match="fixed 64-dim"):
        ivf_assign_arrow(bad_ragged, cents).collect()
