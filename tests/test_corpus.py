"""Corpus-curation family: connected-components clustering, packing,
sampling invariants. Oracle parity for every registered query lives in
test_oracle_parity.py; these tests pin the *semantic* properties an oracle
hash cannot express (graph-theoretic correctness of CC against a union-find
twin, packing bin invariants, sampling determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_rosetta_demo_spark.operators.graph import connected_components
from kafka_streams_rosetta_demo_spark.queries import load_all

QUERIES = load_all()


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    # chain, triangle, pair, and a star — covers diameter > 1 propagation
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21),
             (30, 31), (30, 32), (30, 33), (5, 4)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        r.id: r.component
        for r in connected_components(df, "src", "dst").collect()
    }
    assert got == _union_find_components(edges)


@pytest.mark.slow  # full-suite lane: r15 fast lane must fit the driver's verify window
def test_connected_components_long_chain_converges_logarithmically(spark):
    """A 400-node path graph has diameter 400 — plain neighbor-min label
    propagation would need 400 rounds (far past max_iter and a RuntimeError
    before round 5 added path halving). Pointer jumping must collapse it
    within the default 25-round budget, labeling every node with the chain
    head. Long boilerplate near-dup chains ARE this shape at corpus scale."""
    n = 400
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r.id: r.component for r in connected_components(df, "src", "dst").collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_keep_best_broadcast_guard_degrades_to_shuffle_join(spark):
    """Above the row cap the labels side must NOT broadcast (at 100 TB the
    duplicated fraction can be billions of rows — force-broadcast would OOM
    every executor); the join degrades to a shuffle join with identical
    results."""
    from kafka_streams_rosetta_demo_spark.operators.graph import keep_best_survivors

    labels = spark.createDataFrame(
        [(i, i // 3 * 3) for i in range(30)], "id long, component long"
    )
    quality = spark.createDataFrame(
        [(i, (i * 37) % 11) for i in range(30)], "doc_id long, n_chars long"
    )
    # Disable size-based auto-broadcast so the HINT (or its absence) alone
    # decides the strategy — on real data the sizes decide, but the fixture
    # is tiny and AQE would broadcast either side regardless.
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in old:
            spark.conf.set(k, "-1")
        small = keep_best_survivors(labels, quality)
        guarded = keep_best_survivors(labels, quality, max_broadcast_rows=0)
        assert (
            "BroadcastExchange"
            in small._jdf.queryExecution().executedPlan().toString()
        )
        assert (
            "BroadcastExchange"
            not in guarded._jdf.queryExecution().executedPlan().toString()
        )
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, guarded.collect())
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cluster_cc_labels_are_component_minima(spark, sf_correctness):
    out = QUERIES["dedup_cluster_cc"].fn(spark, sf_correctness)
    rows = out.collect()
    # every cluster id is a member of its own cluster (canonical survivor)
    members = {}
    for r in rows:
        members.setdefault(r.cluster_id, set()).add(r.doc_id)
    for cid, docs in members.items():
        assert cid in docs
        assert cid == min(docs)
        assert len(docs) >= 2  # only docs with >= 1 near-dup edge appear


def test_pack_sequences_bins_are_contiguous_and_ordered(spark, sf_correctness):
    out = QUERIES["pack_sequences"].fn(spark, sf_correctness).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    budget = 2048
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            assert r.bin_id == cum // budget  # running-sum chunk rule
            cum += r.n_tokens
        bins = [r.bin_id for r in rows]
        assert bins == sorted(bins)  # bins never decrease along doc order


def test_stratified_hash_sample_is_deterministic_and_stratified(spark, sf_correctness):
    q = QUERIES["sample_stratified_hash"].fn
    a = sorted(r.doc_id for r in q(spark, sf_correctness).collect())
    b = sorted(r.doc_id for r in q(spark, sf_correctness).collect())
    assert a == b  # same sample on every run — no RNG state

    out = q(spark, sf_correctness).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in out}
    # en is downsampled 3x harder than the rest; with ~200 en docs the
    # binomial spread cannot invert a 20%-vs-60% rate gap
    assert got["en"] < min(v for k, v in got.items() if k != "en") * 3
    assert set(got) == {"en", "de", "es", "fr", "zh"}


def test_chunking_covers_every_token_exactly(spark, sf_smoke):
    """Chunk windows on a 96 stride must cover position 1..n with the last
    chunk short iff n mod stride says so; per doc: contiguous chunk_idx from
    0, start_pos = 1 + 96*idx, and full chunks are exactly 128 tokens."""
    from collections import defaultdict

    from kafka_streams_rosetta_demo_spark.queries import load_all

    rows = load_all()["doc_chunk_overlap"].fn(spark, sf_smoke).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert by_doc
    for doc, ch in by_doc.items():
        ch.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in ch] == list(range(len(ch)))
        # doc length is recoverable from the last chunk: its window is
        # clipped at the end of the token array
        n = ch[-1].start_pos + ch[-1].n_tokens - 1
        for c in ch:
            assert c.start_pos == 1 + 96 * c.chunk_idx
            assert c.n_tokens == min(128, n - c.start_pos + 1)


def test_leakage_split_flags_only_train(spark, sf_smoke):
    from kafka_streams_rosetta_demo_spark.queries import load_all

    rows = load_all()["split_leakage_safe"].fn(spark, sf_smoke).collect()
    assert {r.split for r in rows} == {"train", "test"}
    for r in rows:
        if r.split == "test":
            assert r.leaked is False
        else:
            assert r.leaked == (r.n_shared_spans > 0)
