"""Pure-Python Avro binary codec — the jar-less executable Avro serde.

The reference's topic values are Avro through Confluent serdes
(``CallsAggregationApp.java:33,40-41``; schemas ``callagg.avsc`` /
``callaggcust.avsc``). Spark's ``from_avro``/``to_avro`` column functions
live in the *external* ``spark-avro`` module, which is not on this
environment's classpath and cannot be fetched (no network), so the JVM path
raises ``AVRO_NOT_LOADED``. Rather than silently downgrading the wire format
to JSON, this module implements the Avro **binary encoding** directly from
the public Apache Avro 1.12 specification ("Binary Encoding" +
"Object Container Files" sections) for the subset the reference's value
schemas use: records of primitive fields, nullable ``["null", T]`` unions,
arrays, maps, and the ``timestamp-millis``/``timestamp-micros`` logical types.

Correctness is pinned against the JVM's own Avro implementation: Spark 4.1
ships the Avro *file format* classes inside ``spark-sql`` (only the column
functions are external), and ``org.apache.spark.sql.avro.AvroFileFormat``
is loadable by fully-qualified class name. ``tests/test_avro_codec.py``
round-trips data both directions through that file format — bytes this
module writes are read by the JVM, bytes the JVM writes are read here — so
the binary encoding is verified against Apache Avro itself, not just
self-consistent.

Scale note: at the Kafka edge this codec runs as an Arrow-batched pandas
UDF (``kafka_io.KafkaTopicSpec`` serde ``"avro_py"``). Per-record Python is
inherently slower than the JVM ``from_avro`` expression — on a real cluster
ship the ``spark-avro`` jar and the spec auto-selects the JVM path; this
codec is the executable fallback, not the preferred plan.
"""

from __future__ import annotations

import io
import json
import os
import struct as _struct
import zlib
from datetime import datetime, timezone

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# varint / zigzag (spec: int and long are zigzag + base-128 varint)
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag (Python ints are arbitrary precision)
    while (n & ~0x7F) != 0:
        out.write(bytes([(n & 0x7F) | 0x80]))
        n >>= 7
    out.write(bytes([n & 0x7F]))


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1), pos


# ---------------------------------------------------------------------------
# value encode / decode against a parsed schema (JSON dict / list / str)
# ---------------------------------------------------------------------------


def _schema_type(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _timestamp_micros_per_unit(schema) -> int | None:
    """1000 for timestamp-millis, 1 for timestamp-micros (what Spark's Avro
    writer emits), None for a plain long."""
    if isinstance(schema, dict) and schema.get("type") == "long":
        lt = schema.get("logicalType")
        if lt == "timestamp-millis":
            return 1000
        if lt == "timestamp-micros":
            return 1
    return None


def _to_epoch_units(v, us_per_unit: int) -> int:
    # pandas.Timestamp exposes .value (nanos) — integer-exact
    value_ns = getattr(v, "value", None)
    if value_ns is not None:
        return int(value_ns) // (1000 * us_per_unit)
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)  # session TZ is pinned UTC
        delta = v - _EPOCH
        us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        return us // us_per_unit
    return int(v)


def encode_value(schema, v, out: io.BytesIO) -> None:
    t = _schema_type(schema)
    if t == "union":
        # spec: long index of the branch, then the value
        if v is None:
            idx = next(
                (i for i, b in enumerate(schema) if _schema_type(b) == "null"), None
            )
            if idx is None:
                raise ValueError("null for non-nullable union")
            _write_long(out, idx)
            return
        idx = next(
            (i for i, b in enumerate(schema) if _schema_type(b) != "null"), None
        )
        if idx is None:
            raise ValueError("union has no non-null branch")
        _write_long(out, idx)
        encode_value(schema[idx], v, out)
    elif t == "null":
        if v is not None:
            raise ValueError("non-null for null type")
    elif t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        unit = _timestamp_micros_per_unit(schema)
        if unit is not None:
            _write_long(out, _to_epoch_units(v, unit))
        else:
            _write_long(out, int(v))
    elif t == "float":
        out.write(_struct.pack("<f", float(v)))
    elif t == "double":
        out.write(_struct.pack("<d", float(v)))
    elif t == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out.write(b)
    elif t == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out.write(b)
    elif t == "record":
        for f in schema["fields"]:
            try:
                fv = v[f["name"]] if not hasattr(v, "get") else v.get(f["name"])
            except (KeyError, IndexError, TypeError):
                fv = None
            encode_value(f["type"], fv, out)
    elif t == "array":
        items = list(v)
        if items:
            _write_long(out, len(items))
            for item in items:
                encode_value(schema["items"], item, out)
        _write_long(out, 0)
    elif t == "map":
        entries = list(v.items())
        if entries:
            _write_long(out, len(entries))
            for k, mv in entries:
                encode_value("string", k, out)
                encode_value(schema["values"], mv, out)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def decode_value(schema, buf: bytes, pos: int):
    t = _schema_type(schema)
    if t == "union":
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return decode_value(schema[idx], buf, pos)
    if t == "null":
        return None, pos
    if t == "boolean":
        if pos >= len(buf):
            raise ValueError("truncated boolean")
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        n, pos = _read_long(buf, pos)
        unit = _timestamp_micros_per_unit(schema)
        if unit is not None:
            from datetime import timedelta

            # naive UTC, integer-exact (no float epoch division)
            ts = _EPOCH.replace(tzinfo=None) + timedelta(microseconds=n * unit)
            return ts, pos
        return n, pos
    if t == "float":
        if pos + 4 > len(buf):
            raise ValueError("truncated float")
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        if pos + 8 > len(buf):
            raise ValueError("truncated double")
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("string", "bytes"):
        n, pos = _read_long(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("truncated string/bytes")
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = decode_value(f["type"], buf, pos)
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:  # spec: negative count is followed by a byte size
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                item, pos = decode_value(schema["items"], buf, pos)
                items.append(item)
        return items, pos
    if t == "map":
        m = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                k, pos = decode_value("string", buf, pos)
                m[k], pos = decode_value(schema["values"], buf, pos)
        return m, pos
    raise ValueError(f"unsupported Avro type: {t!r}")


# ---------------------------------------------------------------------------
# single-record surface (the Kafka value serde)
# ---------------------------------------------------------------------------


def parse_schema(schema_json: str):
    return json.loads(schema_json)


def encode_record(schema, record: dict) -> bytes:
    """One record → Avro binary body (what sits after the Confluent wire
    header on a reference topic)."""
    if isinstance(schema, str):
        schema = parse_schema(schema)
    out = io.BytesIO()
    encode_value(schema, record, out)
    return out.getvalue()


def decode_record(schema, data: bytes) -> dict:
    """Avro binary body → dict. Raises ValueError on corrupt/truncated input
    and on trailing garbage — the S5 drop condition."""
    if isinstance(schema, str):
        schema = parse_schema(schema)
    rec, pos = decode_value(schema, bytes(data), 0)
    if pos != len(data):
        raise ValueError(f"{len(data) - pos} trailing bytes after record")
    return rec


# ---------------------------------------------------------------------------
# Object Container Files (spec "Object Container Files" section) — used to
# cross-validate this codec against the JVM AvroFileFormat, and as a
# jar-less avro file reader/writer in its own right.
# ---------------------------------------------------------------------------


def write_ocf(path: str, schema_json: str, records, codec: str = "null") -> None:
    schema = parse_schema(schema_json)
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        encode_value("string", k, out)
        encode_value("bytes", v, out)
    _write_long(out, 0)  # end of metadata map
    out.write(sync)

    body = io.BytesIO()
    n = 0
    for rec in records:
        encode_value(schema, rec, body)
        n += 1
    data = body.getvalue()
    if codec == "deflate":
        data = zlib.compress(data)[2:-4]  # raw deflate: strip zlib hdr + adler
    elif codec != "null":
        raise ValueError(f"unsupported write codec {codec!r}")
    if n:
        _write_long(out, n)
        _write_long(out, len(data))
        out.write(data)
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def read_ocf(path: str) -> tuple[dict, list[dict]]:
    """Read one .avro container file → (writer schema, records). Supports
    the ``null`` and ``deflate`` codecs (snappy needs a native lib)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _read_long(buf, pos)
        for _ in range(n):
            k, pos = decode_value("string", buf, pos)
            meta[k], pos = decode_value("bytes", buf, pos)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        n, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        block = buf[pos : pos + size]
        pos += size
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported read codec {codec!r}")
        bpos = 0
        for _ in range(n):
            rec, bpos = decode_value(schema, block, bpos)
            records.append(rec)
        if bpos != len(block):
            raise ValueError("trailing bytes in OCF block")
        if buf[pos : pos + 16] != sync:
            raise ValueError("bad sync marker")
        pos += 16
    return schema, records
