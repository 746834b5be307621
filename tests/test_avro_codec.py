"""Pin the pure-Python Avro codec against the JVM's own Avro implementation.

Spark 4.1 ships the Avro serde machinery inside ``spark-sql`` (only the
``from_avro``/``to_avro`` column functions live in the absent external
module), and ``org.apache.spark.sql.avro.AvroFileFormat`` is loadable by
fully-qualified class name. That gives a ground truth: bytes our codec
writes must be readable by Apache Avro's JVM reader and vice versa — if the
binary encoding drifted from the spec, these tests fail, not just a
self-consistent roundtrip.
"""

from __future__ import annotations

import glob
import json
from datetime import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_rosetta_demo_spark.streaming.avro_codec import (
    decode_record,
    encode_record,
    read_ocf,
    write_ocf,
)
from kafka_streams_rosetta_demo_spark.streaming.kafka_io import KafkaTopicSpec

AVRO_FQCN = "org.apache.spark.sql.avro.AvroFileFormat"

SCHEMA_JSON = json.dumps(
    {
        "type": "record",
        "name": "V",
        "namespace": "rosetta",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": ["null", "double"], "default": None},
            {"name": "flag", "type": "boolean"},
        ],
    }
)


def _records():
    return [
        {
            "id": i,
            "name": f"user_{i}_é✓",
            "score": (i * 1.5 if i % 3 == 0 else None),
            "flag": i % 2 == 0,
        }
        for i in range(200)
    ]


@pytest.mark.parametrize("compression", ["uncompressed", "deflate"])
def test_jvm_written_avro_decodes_with_python_codec(spark, tmp_path, compression):
    df = spark.range(200).select(
        F.col("id"),
        F.concat(
            F.lit("user_"), F.col("id").cast("string"), F.lit("_é✓")
        ).alias("name"),
        F.when(F.col("id") % 3 == 0, F.col("id").cast("double") * 1.5).alias("score"),
        (F.col("id") % 2 == 0).alias("flag"),
    )
    path = str(tmp_path / f"jvm_{compression}")
    df.coalesce(1).write.format(AVRO_FQCN).option("compression", compression).save(path)
    part = glob.glob(f"{path}/part-*.avro")[0]
    _, recs = read_ocf(part)
    got = sorted((r["id"], r["name"], r["score"], r["flag"]) for r in recs)
    want = sorted((r["id"], r["name"], r["score"], r["flag"]) for r in _records())
    assert got == want


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_python_written_avro_reads_back_in_jvm(spark, tmp_path, codec):
    d = tmp_path / f"py_{codec}"
    d.mkdir()
    write_ocf(str(d / "data.avro"), SCHEMA_JSON, _records(), codec=codec)
    back = spark.read.format(AVRO_FQCN).load(str(d)).collect()
    got = sorted((r.id, r.name, r.score, r.flag) for r in back)
    want = sorted((r["id"], r["name"], r["score"], r["flag"]) for r in _records())
    assert got == want


def test_record_roundtrip_with_timestamp_and_containers():
    schema = json.dumps(
        {
            "type": "record",
            "name": "T",
            "fields": [
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
                {"name": "tags", "type": {"type": "array", "items": "string"}},
                {"name": "attrs", "type": {"type": "map", "values": "long"}},
                {"name": "blob", "type": "bytes"},
                {"name": "ratio", "type": "float"},
            ],
        }
    )
    rec = {
        "ts": datetime(2026, 8, 14, 9, 30, 0, 250000),
        "tags": ["a", "b", ""],
        "attrs": {"x": -1, "y": 2**40},
        "blob": b"\x00\xff\x7f",
        "ratio": 0.25,
    }
    back = decode_record(schema, encode_record(schema, rec))
    assert back == rec


def test_corrupt_bodies_are_rejected_not_misparsed():
    body = encode_record(SCHEMA_JSON, _records()[7])
    with pytest.raises(ValueError):
        decode_record(SCHEMA_JSON, body[:-1])  # truncated
    with pytest.raises(ValueError):
        decode_record(SCHEMA_JSON, body + b"\x00")  # trailing garbage


def test_avro_py_serde_roundtrips_through_spark(spark):
    """End-to-end through the KafkaTopicSpec pandas-UDF serde: struct →
    framed Avro bytes → struct, with a mangled body counted as a drop."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    spec = KafkaTopicSpec(
        topic="t", value_schema=schema, serde="avro_py", wire_format="confluent"
    )
    df = spark.range(50).select(
        F.col("id").alias("event_id"), (F.col("id") * 0.5).alias("value")
    )
    framed = spec.encode_value(F.struct("event_id", "value"))
    # truncate every 10th body (header intact) — decoder must null it
    on_wire = F.when(F.col("event_id") % 10 == 0, F.substring(framed, 1, 8)).otherwise(
        framed
    )
    out = df.select(
        "event_id", spec.decode_value(on_wire).alias("v")
    ).collect()
    for r in out:
        if r.event_id % 10 == 0:
            assert r.v.event_id is None and r.v.value is None
        else:
            assert r.v.event_id == r.event_id
            assert r.v.value == r.event_id * 0.5


def test_jvm_written_containers_and_timestamps_decode_with_python_codec(
    spark, tmp_path
):
    """Array, map, and timestamp columns through the JVM writer (its schema
    converter emits nullable-union elements and timestamp-micros) must
    decode correctly with the standalone codec — the container/logical-type
    paths, cross-validated like the primitives."""
    df = spark.sql(
        """
        SELECT id,
               array(id, id * 2) AS arr,
               map(concat('k', id), id) AS m,
               timestamp_micros(CAST(1755100800000000 + id * 1000000 AS LONG)) AS ts
        FROM range(50)
        """
    )
    path = str(tmp_path / "jvm_containers")
    df.coalesce(1).write.format(AVRO_FQCN).option("compression", "uncompressed").save(
        path
    )
    part = glob.glob(f"{path}/part-*.avro")[0]
    _, recs = read_ocf(part)
    assert len(recs) == 50
    by_id = {r["id"]: r for r in recs}
    for row in df.collect():
        r = by_id[row.id]
        assert r["arr"] == list(row.arr)
        assert r["m"] == dict(row.m)
        # Spark writes timestamp-micros; the codec returns naive-UTC
        # datetimes and the session TZ is pinned UTC
        assert r["ts"] == row.ts, (r["ts"], row.ts)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=40),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=True)),
            st.booleans(),
        ),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
@pytest.mark.slow  # full-suite lane: r15 fast lane must fit the driver's verify window
def test_codec_roundtrip_property(rows):
    """Spec identity on arbitrary records: decode(encode(r)) == r for any
    long/unicode-string/nullable-double/boolean combination (negative
    zigzags, astral-plane text, +-inf)."""
    for i, (a, b, c, d) in enumerate(rows):
        rec = {"id": a, "name": b, "score": c, "flag": d}
        back = decode_record(SCHEMA_JSON, encode_record(SCHEMA_JSON, rec))
        assert back == rec, (i, rec, back)


def test_avro_py_bytes_are_real_avro():
    """Spot-pin the binary encoding itself (not just a roundtrip): zigzag
    varint for the first long field, union index for the null branch."""
    rec = {"id": 42, "name": "x", "score": None, "flag": True}
    body = encode_record(SCHEMA_JSON, rec)
    # long 42 zigzags to 84 = 0x54; record fields are untagged so byte 0 is id
    assert body[0] == 0x54
    # name: length 1 (zigzag 2) then 'x'; score: union branch 0 (null);
    # flag: 0x01
    assert body[1:] == b"\x02x\x00\x01"
    assert decode_record(SCHEMA_JSON, body) == rec
