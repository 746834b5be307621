"""Pins for the link-analysis operators (operators/graph.py: pagerank,
triangle_counts) and the sketch/span additions, independent of the DuckDB
oracle parity sweep: tiny hand-checkable graphs and pure-Python integer
twins, so an operator bug can't hide behind an oracle that mirrors the same
mistake."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_rosetta_demo_spark.operators.graph import pagerank, triangle_counts
from kafka_streams_rosetta_demo_spark.queries import load_all

QUERIES = load_all()

SCALE = 1_000_000_000


def _pagerank_twin(edges, iterations=5, scale=SCALE, damping_pct=85):
    """Dict-based integer PageRank, same floor-division arithmetic."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    ranks = {n: scale for n in deg}
    base = (100 - damping_pct) * scale // 100
    for _ in range(iterations):
        summed = defaultdict(int)
        for s, d in edges:
            summed[d] += ranks[s] // deg[s]
        ranks = {n: base + (damping_pct * summed.get(n, 0)) // 100 for n in deg}
    return ranks


def test_pagerank_matches_integer_twin(spark):
    und = [(1, 2), (2, 3), (3, 4), (1, 3), (4, 5)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank_scaled for r in pagerank(df).collect()}
    assert got == _pagerank_twin(edges)


def test_pagerank_checkpoint_cadence_invariant(spark, monkeypatch):
    """The interval lineage truncation (optimization round 14) is a plan
    mechanic, not arithmetic: every cadence must produce bit-identical
    ranks, including an iteration count that is not a multiple of the
    interval (exercises the lazy tail)."""
    from kafka_streams_rosetta_demo_spark.operators import graph as G

    und = [(1, 2), (2, 3), (3, 4), (1, 3), (4, 5), (2, 5)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    results = []
    for cadence in (1, 2, 3):
        monkeypatch.setattr(G, "_PR_CKPT_EVERY", cadence)
        results.append(
            sorted((r.node, r.rank_scaled) for r in G.pagerank(df, iterations=7).collect())
        )
    assert results[0] == results[1] == results[2]
    assert results[0] == sorted(_pagerank_twin(edges, iterations=7).items())


def test_pagerank_total_mass_bounded(spark):
    """Integer floor-division only ever LOSES mass: total rank stays within
    N·scale and above the pure-teleport floor."""
    und = [(1, 2), (2, 3), (1, 3)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = [r.rank_scaled for r in pagerank(df).collect()]
    assert len(ranks) == 3
    assert sum(ranks) <= 3 * SCALE
    assert all(r >= 150_000_000 for r in ranks)


def test_triangle_counts_k4_plus_pendant(spark):
    """K4 has 4 triangles, every vertex in exactly 3; a pendant vertex is in
    none (and absent from the operator's output)."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    pairs = spark.createDataFrame(k4 + [(1, 5)], ["a", "b"])
    got = {r.node: r.n_triangles for r in triangle_counts(pairs).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_skewed_hub(spark):
    """A hub connected to 40 spokes with a single spoke-spoke edge has
    exactly one triangle — the degree-ordered orientation must not
    enumerate the hub's C(40,2) wedge pairs as candidates from the hub
    (orientation directs spoke→hub, so the hub has out-degree ≤ 1)."""
    star = [(0, i) for i in range(1, 41)]
    pairs = spark.createDataFrame(star + [(1, 2)], ["a", "b"])
    got = {r.node: r.n_triangles for r in triangle_counts(pairs).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_cms_estimate_never_undercounts(spark, sf_smoke):
    rows = QUERIES["sketch_cms_heavy_hitters"].fn(spark, sf_smoke).collect()
    assert len(rows) == 20
    assert all(r.cms_est >= r.exact_n for r in rows), "CMS must overcount only"


def test_span_duplicates_planted_excerpts_fully_covered(spark, sf_smoke):
    """Every planted half-doc excerpt's spans all exist in its source doc →
    dup_permille = 1000 for injected ids; and each corresponding source doc
    must itself show duplicated spans."""
    rows = QUERIES["dedup_span_duplicates"].fn(spark, sf_smoke).collect()
    injected = [r for r in rows if r.doc_id >= 3_000_000]
    assert injected, "no planted excerpts survived the min-length filter"
    assert all(r.dup_permille == 1000 for r in injected)
    sources = {r.doc_id - 3_000_000 for r in injected}
    by_id = {r.doc_id: r for r in rows}
    assert all(by_id[s].n_dup_spans > 0 for s in sources)
