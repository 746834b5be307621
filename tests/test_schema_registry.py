"""Schema-Registry client against a stub HTTP server speaking the public
Confluent REST contract — the brokerless-verifiable slice of the reference's
``schema.registry.url`` integration (``CallsAggregationApp.java:31,101``)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from kafka_streams_rosetta_demo_spark.streaming.schema_registry import (
    SchemaRegistryClient,
    SchemaRegistryError,
    SchemaRegistryUnavailable,
    resolve_spec_schema_id,
    schema_for_wire_value,
    topic_value_subject,
)

SCHEMA_A = json.dumps(
    {
        "type": "record",
        "name": "Value",
        "fields": [{"name": "event_id", "type": "long"}],
    }
)
SCHEMA_B = json.dumps(
    {
        "type": "record",
        "name": "Value",
        "fields": [{"name": "event_id", "type": "long"}, {"name": "v", "type": "double"}],
    }
)


class _StubRegistry:
    """In-memory registry: content-addressed ids, per-subject version lists —
    the observable behavior of the real service for the three endpoints the
    client uses."""

    def __init__(self):
        self.schemas_by_id: dict[int, str] = {}
        self.id_by_schema: dict[str, int] = {}
        self.subjects: dict[str, list[int]] = {}
        self.requests: list[tuple[str, str]] = []

    def register(self, subject: str, schema: str) -> int:
        if schema not in self.id_by_schema:
            sid = len(self.schemas_by_id) + 1
            self.id_by_schema[schema] = sid
            self.schemas_by_id[sid] = schema
        sid = self.id_by_schema[schema]
        versions = self.subjects.setdefault(subject, [])
        if sid not in versions:
            versions.append(sid)
        return sid


def _make_handler(reg: _StubRegistry):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _reply(self, code: int, body: dict):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            reg.requests.append(("GET", self.path))
            parts = self.path.strip("/").split("/")
            if parts[:2] == ["schemas", "ids"] and len(parts) == 3:
                sid = int(parts[2])
                if sid in reg.schemas_by_id:
                    return self._reply(200, {"schema": reg.schemas_by_id[sid]})
                return self._reply(
                    404, {"error_code": 40403, "message": f"Schema {sid} not found"}
                )
            if (
                len(parts) == 4
                and parts[0] == "subjects"
                and parts[2] == "versions"
                and parts[3] == "latest"
            ):
                subject = parts[1]
                versions = reg.subjects.get(subject)
                if not versions:
                    return self._reply(
                        404, {"error_code": 40401, "message": f"Subject {subject} not found"}
                    )
                sid = versions[-1]
                return self._reply(
                    200,
                    {
                        "subject": subject,
                        "version": len(versions),
                        "id": sid,
                        "schema": reg.schemas_by_id[sid],
                    },
                )
            return self._reply(404, {"error_code": 404, "message": "no route"})

        def do_POST(self):
            reg.requests.append(("POST", self.path))
            parts = self.path.strip("/").split("/")
            if len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n).decode())
                sid = reg.register(parts[1], body["schema"])
                return self._reply(200, {"id": sid})
            return self._reply(404, {"error_code": 404, "message": "no route"})

    return Handler


@pytest.fixture()
def stub_registry():
    reg = _StubRegistry()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(reg))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield reg, f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        server.server_close()


def test_register_then_fetch_roundtrip(stub_registry):
    reg, url = stub_registry
    client = SchemaRegistryClient(url)
    sid = client.register("EVENTS-value", SCHEMA_A)
    assert sid == 1
    # identical schema re-registers to the SAME id (registry dedup) and,
    # client-side, without another HTTP call (registration cache)
    n_before = len(reg.requests)
    assert client.register("EVENTS-value", SCHEMA_A) == sid
    assert len(reg.requests) == n_before
    # fetch resolves the registered schema; second fetch is a cache hit
    fresh = SchemaRegistryClient(url)
    assert json.loads(fresh.get_schema(sid)) == json.loads(SCHEMA_A)
    n_before = len(reg.requests)
    fresh.get_schema(sid)
    assert len(reg.requests) == n_before


def test_schema_evolution_versions(stub_registry):
    reg, url = stub_registry
    client = SchemaRegistryClient(url)
    id_a = client.register("EVENTS-value", SCHEMA_A)
    id_b = client.register("EVENTS-value", SCHEMA_B)
    assert id_b != id_a
    latest = client.latest_version("EVENTS-value")
    assert latest["id"] == id_b
    assert latest["version"] == 2
    assert json.loads(latest["schema"]) == json.loads(SCHEMA_B)


def test_registry_error_raises(stub_registry):
    _, url = stub_registry
    client = SchemaRegistryClient(url)
    with pytest.raises(SchemaRegistryError, match="not found"):
        client.get_schema(999)


def test_unreachable_registry_raises_unavailable():
    client = SchemaRegistryClient("http://127.0.0.1:9", timeout=0.3)  # discard port
    with pytest.raises(SchemaRegistryUnavailable):
        client.get_schema(1)


def test_spec_resolution_and_wire_header(stub_registry, spark):
    """Producer startup shape: the spec's Avro schema registers under
    <topic>-value, the assigned id lands in the wire header, and the
    consumer-side helper resolves that id back to the writer schema."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kafka_streams_rosetta_demo_spark.streaming.kafka_io import KafkaTopicSpec

    reg, url = stub_registry
    client = SchemaRegistryClient(url)
    # pre-register another subject so the assigned id is NOT the static default
    client.register("OTHER-value", SCHEMA_B)

    spec = KafkaTopicSpec(
        topic="EVENTS_SR",
        value_schema=T.StructType([T.StructField("event_id", T.LongType(), False)]),
        serde="avro_py",
        wire_format="confluent",
        schema_id=1,  # static offline default
    )
    resolved = resolve_spec_schema_id(spec, client)
    assert resolved.schema_id == 2  # registry-assigned, not the static 1
    assert topic_value_subject(spec.topic) in reg.subjects

    df = spark.range(3).select(F.col("id").alias("event_id"))
    wire = df.select(
        resolved.encode_value(F.struct("event_id")).alias("value")
    ).collect()
    raw = bytes(wire[0].value)
    assert raw[:1] == b"\x00" and int.from_bytes(raw[1:5], "big") == 2
    # consumer side: id in the header → writer schema (cached fetch)
    schema_json = schema_for_wire_value(raw, SchemaRegistryClient(url))
    assert json.loads(schema_json)["fields"][0]["name"] == "event_id"
    # and the frames round-trip through the spec's own decoder
    back = df.select(
        resolved.decode_value(
            resolved.encode_value(F.struct("event_id"))
        ).alias("v")
    ).select("v.event_id").collect()
    assert sorted(r.event_id for r in back) == [0, 1, 2]


def test_spec_resolution_offline_falls_back_to_static_id():
    from pyspark.sql import types as T

    from kafka_streams_rosetta_demo_spark.streaming.kafka_io import KafkaTopicSpec

    spec = KafkaTopicSpec(
        topic="EVENTS_SR",
        value_schema=T.StructType([T.StructField("event_id", T.LongType(), False)]),
        serde="json",
        wire_format="confluent",
        schema_id=7,
    )
    # no client at all → same spec object
    assert resolve_spec_schema_id(spec, None) is spec
    # unreachable registry → static id stands
    dead = SchemaRegistryClient("http://127.0.0.1:9", timeout=0.3)
    assert resolve_spec_schema_id(spec, dead).schema_id == 7


def test_malformed_wire_value_rejected(stub_registry):
    _, url = stub_registry
    client = SchemaRegistryClient(url)
    with pytest.raises(ValueError):
        schema_for_wire_value(b"\x01\x00\x00\x00\x01x", client)
    with pytest.raises(ValueError):
        schema_for_wire_value(b"\x00\x00", client)
