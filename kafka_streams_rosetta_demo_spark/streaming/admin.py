"""Topic DDL (S4): create topics from a properties-style config.

Reference: ``CallsEnrichedApp.createTopics`` builds ``NewTopic``s from
``configuration/dev.properties`` keys (``*.topic.name`` /
``*.topic.partitions`` / ``*.topic.replication.factor``,
``CallsEnrichedApp.java:81-110``, ``dev.properties:6-19``) and applies them
with an AdminClient before starting the streams.

This is setup tooling outside the query engine (SURVEY §2.1 S4): the config
parsing — the testable part — is pure Python; the broker call is gated
behind an optional kafka client import since neither a client library nor a
broker exists in this environment.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TopicDef:
    name: str
    partitions: int
    replication_factor: int


def parse_topic_defs(props: dict[str, str]) -> list[TopicDef]:
    """``{prefix}.topic.name/partitions/replication.factor`` triples → defs,
    mirroring the reference's key scheme (``dev.properties:6-19``)."""
    prefixes = sorted(
        k[: -len(".topic.name")] for k in props if k.endswith(".topic.name")
    )
    return [
        TopicDef(
            name=props[f"{p}.topic.name"],
            partitions=int(props.get(f"{p}.topic.partitions", "1")),
            replication_factor=int(props.get(f"{p}.topic.replication.factor", "1")),
        )
        for p in prefixes
    ]


def create_topics(props: dict[str, str], bootstrap_servers: str) -> list[TopicDef]:
    """Apply the topic defs with an AdminClient (requires a kafka client
    library and a reachable broker; both absent here, hence the gate)."""
    defs = parse_topic_defs(props)
    try:
        from confluent_kafka.admin import AdminClient, NewTopic  # type: ignore
    except ImportError as exc:
        raise RuntimeError(
            "Topic DDL needs the confluent-kafka package (not installed in "
            "this environment); parsed defs are returned by parse_topic_defs."
        ) from exc
    admin = AdminClient({"bootstrap.servers": bootstrap_servers})
    futures = admin.create_topics(
        [NewTopic(d.name, d.partitions, d.replication_factor) for d in defs]
    )
    for fut in futures.values():
        fut.result()
    return defs
