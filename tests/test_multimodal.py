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


def test_frame_sample_matches_python_twin(spark, sf_smoke):
    from kafka_streams_rosetta_demo_spark.operators.multimodal import (
        expected_frames,
    )

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_smoke, "documents").limit(30).collect()
    }
    got = (
        QUERIES["multimodal_frame_sample"]
        .fn(spark, sf_smoke)
        .where(f"doc_id IN ({','.join(map(str, docs))})")
        .collect()
    )
    import hashlib

    expected = {}
    for doc_id, text in docs.items():
        for _, i, frame in expected_frames(doc_id, text.encode("utf-8")):
            expected[(doc_id, i)] = hashlib.md5(
                frame.hex().upper().encode()
            ).hexdigest()
    assert {(r.doc_id, r.frame_idx): r.frame_md5 for r in got} == expected


def test_resample_matches_python_twin(spark, sf_smoke):
    from kafka_streams_rosetta_demo_spark.operators.multimodal import (
        expected_resample,
    )

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_smoke, "documents").limit(30).collect()
    }
    got = (
        QUERIES["multimodal_resample"]
        .fn(spark, sf_smoke)
        .where(f"doc_id IN ({','.join(map(str, docs))})")
        .collect()
    )
    expected = {
        (doc_id, k): v
        for doc_id, text in docs.items()
        for k, v in expected_resample(text.encode("utf-8"))
    }
    assert {(r.doc_id, r.bucket): r.value for r in got} == expected


def test_resize_matches_python_twin(spark, sf_smoke):
    from kafka_streams_rosetta_demo_spark.operators.multimodal import (
        expected_resize,
        resize_images,
    )

    assets = documents_as_binary(load_table(spark, sf_smoke, "documents").limit(30))
    src = {r.doc_id: bytes(r.content) for r in assets.collect()}
    got = {r.doc_id: (r.side, bytes(r.pixels)) for r in resize_images(assets).collect()}
    expected = {
        doc_id: exp
        for doc_id, payload in src.items()
        if (exp := expected_resize(payload)) is not None
    }
    assert got == expected
