"""§2.7 escape-hatch pins: the three Pandas-UDF shapes compute what their
pure-Python twins compute, through real Arrow batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_rosetta_demo_spark.functions.pandas_hatch import (
    _TOKEN_WEIGHTS,
    trimmed_mean,
    with_vocab_affinity,
    zscore_per_group,
)
from kafka_streams_rosetta_demo_spark.sources.parquet import load_table


def test_scalar_pandas_udf(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    out = {r.doc_id: (r.text, r.vocab_affinity) for r in with_vocab_affinity(docs).collect()}
    for doc_id, (text, got) in out.items():
        toks = text.split()
        want = round(sum(_TOKEN_WEIGHTS.get(w, 0.0) for w in toks) / len(toks), 6)
        assert got == pytest.approx(want, abs=1e-9), doc_id


def test_grouped_agg_pandas_udf(spark):
    df = spark.createDataFrame(
        [(1, float(v)) for v in range(1, 11)] + [(2, 5.0), (2, 100.0)],
        "k long, v double",
    )
    out = {
        r.k: r.tm
        for r in df.groupBy("k").agg(trimmed_mean("v").alias("tm")).collect()
    }
    # k=1: 10 values, trim 1 from each end -> mean(2..9) = 5.5
    assert out[1] == pytest.approx(5.5)
    # k=2: too few to trim -> plain mean
    assert out[2] == pytest.approx(52.5)


def test_grouped_map_applyinpandas(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select("user_id", "value")
    out = zscore_per_group(ev, "user_id", "value").toPandas()
    assert len(out) == ev.count()  # row-preserving
    # per-group zscores are standardized: mean ~ 0 (groups with >1 row)
    stats = out.groupby("user_id")["zscore"].agg(["mean", "count"])
    multi = stats[stats["count"] > 1]
    assert (multi["mean"].abs() < 1e-6).all()
