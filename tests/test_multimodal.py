"""Multimodal plumbing pins: binary schema, Arrow batch path, featurizer
math vs. a pure-Python twin, and the decode stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from kafka_streams_rosetta_demo_spark.operators.multimodal import (
    decode_media,
    documents_as_binary,
    expected_features,
)
from kafka_streams_rosetta_demo_spark.queries import load_all
from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

QUERIES = load_all()


def test_binary_asset_schema(spark, sf_smoke):
    assets = documents_as_binary(load_table(spark, sf_smoke, "documents"))
    schema = dict(zip(assets.schema.names, [f.dataType for f in assets.schema.fields]))
    assert isinstance(schema["content"], T.BinaryType)
    meta = schema["meta"]
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == ["codec", "n_bytes", "content_md5"]


def test_features_match_python_twin(spark, sf_smoke):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_smoke, "documents").limit(50).collect()
    }
    feats = (
        QUERIES["multimodal_features"]
        .fn(spark, sf_smoke)
        .where(f"doc_id IN ({','.join(map(str, docs))})")
        .toPandas()
        .set_index("doc_id")
    )
    assert len(feats) == len(docs)
    for doc_id, text in docs.items():
        n, mean, ent = expected_features(text.encode("utf-8"))
        row = feats.loc[doc_id]
        assert row.n_bytes == n
        assert row.byte_mean == pytest.approx(mean, abs=1e-6)
        assert row.byte_entropy == pytest.approx(ent, abs=1e-6)


def test_decode_stub_contract():
    assert decode_media("raw")(b"abc") == b"abc"
    with pytest.raises(NotImplementedError):
        decode_media("jpeg")
