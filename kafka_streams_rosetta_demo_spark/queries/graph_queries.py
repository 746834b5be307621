"""Graph-analytics queries (link analysis for corpus curation).

The reference has no graph operators; a web-scale training-data pipeline
does: page/domain importance (PageRank) is a standard quality-weighting
signal, and triangle/clustering structure flags link farms and mirror
clusters. Both run here over graphs derived from the TPC-H-ish testdata —
the customer↔supplier purchase graph and the supplier co-occurrence graph —
purely so the oracle can replay them; the operators
(``operators/graph.py``) take any edge list.

Determinism: PageRank uses integer-only arithmetic (see the operator
docstring), so the unrolled-iteration DuckDB oracle is hash-exact.
Triangle counts are exact integers by nature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank, triangle_counts
from ..sources.parquet import load_table
from . import register

_PR_SCALE = 1_000_000_000
_PR_BASE = 150_000_000  # (1 - 0.85) · scale
_PR_ITER = 5


def _pagerank_oracle() -> str:
    # Node encoding: customer c → 2c, supplier s → 2s+1 (disjoint longs).
    # 8-byte keys on every shuffle instead of 'c123'-style strings — the
    # standard web-graph trick (hash/encode URLs to ids before iterating).
    head = f"""
WITH e0 AS (
  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT)     AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg)"""
    iters = []
    for i in range(1, _PR_ITER + 1):
        iters.append(f""",
r{i} AS (
  SELECT d.node,
         CAST({_PR_BASE} + (85 * COALESCE(s.t, 0)) // 100 AS BIGINT) AS r
  FROM deg d
  LEFT JOIN (
    SELECT e.dst AS node, SUM(pr.r // dg.deg) AS t
    FROM edges e
    JOIN r{i - 1} pr ON pr.node = e.src
    JOIN deg dg ON dg.node = e.src
    GROUP BY e.dst
  ) s ON s.node = d.node
)""")
    return head + "".join(iters) + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       node // 2 AS entity_key,
       r AS rank_scaled
FROM r{_PR_ITER}"""


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration integer PageRank over the undirected customer↔supplier
    purchase graph (an edge per distinct customer/supplier trading pair).

    Scale: nodes are ENCODED LONGS (customer c → 2c, supplier s → 2s+1 —
    the id-encoding every web-graph pipeline applies before iterating, so
    each shuffle moves 8-byte keys, not id strings); the edge build is a
    fact-fact equi-join on the order key followed by a distinct — both
    shuffle on keys Spark hash-partitions evenly. The iteration itself
    shuffles only the 2-column rank table per round against a
    once-partitioned, checkpointed adjacency (see the operator). The
    oracle unrolls the same 5 integer iterations as CTEs, so values
    hash-match exactly; the readable (node_type, entity_key) pair is
    decoded only at output."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )
    sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(sym, iterations=_PR_ITER, scale=_PR_SCALE)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("entity_key"),
        "rank_scaled",
    )


_TRIANGLE_ORACLE = """
WITH los AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
  FROM lineitem WHERE l_quantity >= 45
),
pairs AS (
  SELECT DISTINCT x.sk AS a, y.sk AS b
  FROM los x JOIN los y ON x.ok = y.ok AND x.sk < y.sk
),
edges AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
deg AS (SELECT a AS node, count(*) AS deg FROM edges GROUP BY 1),
oriented AS (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND p.a < p.b)
              THEN p.a ELSE p.b END AS u,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND p.a < p.b)
              THEN p.b ELSE p.a END AS v
  FROM pairs p
  JOIN deg da ON da.node = p.a
  JOIN deg db ON db.node = p.b
),
tris AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM oriented e1
  JOIN oriented e2 ON e2.u = e1.v
  JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
),
pernode AS (
  SELECT node, count(*) AS n FROM (
    SELECT x AS node FROM tris
    UNION ALL SELECT y AS node FROM tris
    UNION ALL SELECT z AS node FROM tris
  ) GROUP BY node
)
SELECT s.s_suppkey, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_triangles
FROM supplier s LEFT JOIN pernode p ON p.node = s.s_suppkey
"""


@register("graph_triangles", oracle=_TRIANGLE_ORACLE)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle counts over the 'co-supplied a large-quantity
    line in the same order' graph (the quantity filter keeps the graph
    sparse at every scale — an unfiltered co-occurrence graph trends
    complete, where triangle counting is Θ(n³) by nature, not by plan).

    Scale: the pair build self-joins per order key, bounded by the ≤7
    lineitems an order has — no blowup. Triangle enumeration uses the
    degree-ordered orientation in ``operators/graph.py:triangle_counts``,
    bounding wedge candidates at O(|E|^1.5) even under degree skew."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    x = li.select(F.col("ok"), F.col("sk").alias("a"))
    y = li.select(F.col("ok"), F.col("sk").alias("b"))
    pairs = (
        x.join(y, "ok")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    tri = triangle_counts(pairs)
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    return sup.join(
        tri, sup["s_suppkey"] == tri["node"], "left"
    ).select(
        "s_suppkey",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
    )


# ---------------------------------------------------------------------------
# graph_label_propagation — metadata completion over the near-dup graph
# ---------------------------------------------------------------------------

_LP_ROUNDS = 3
_LP_SEED_MOD = 7


def _label_prop_oracle() -> str:
    from .dedup_queries import _jaccard_pairs_oracle

    head = f"""
WITH pr AS MATERIALIZED ({_jaccard_pairs_oracle(k=3, threshold=0.75)}),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pr
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pr
),
l0 AS MATERIALIZED (
  SELECT doc_id, lang AS label, CAST(0 AS BIGINT) AS labeled_round
  FROM documents WHERE doc_id % {_LP_SEED_MOD} = 0
)"""
    rounds = []
    for r in range(1, _LP_ROUNDS + 1):
        rounds.append(f""",
n{r} AS MATERIALIZED (
  SELECT e.dst AS doc_id, min(l.label) AS label,
         CAST({r} AS BIGINT) AS labeled_round
  FROM edges e
  JOIN l{r - 1} l ON l.doc_id = e.src
  WHERE e.dst NOT IN (SELECT doc_id FROM l{r - 1})
  GROUP BY e.dst
),
l{r} AS MATERIALIZED (
  SELECT * FROM l{r - 1} UNION ALL SELECT * FROM n{r}
)""")
    return head + "".join(rounds) + f"""
SELECT doc_id, label, labeled_round FROM l{_LP_ROUNDS}
"""


@register("graph_label_propagation", oracle=_label_prop_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata completion over the near-duplicate graph: documents whose
    id is ≡0 (mod 7) are SEEDS carrying a trusted label (their ``lang``);
    3 rounds of frontier propagation spread labels along verified
    Jaccard-0.75 near-dup edges — each round, an unlabeled doc with a
    labeled neighbor adopts the lexicographic MIN neighbor label (the
    deterministic tie-break, same discipline as the CC min-label collapse)
    and is frozen with the round it was labeled in. This is the standard
    trick for completing missing metadata (language, license, source tags)
    across mirror/boilerplate clusters in a web corpus.

    Scale: edges are the memoized ``jaccard_pairs_075`` artifact (the
    near-dup pair set — sparse by construction; the all-pairs form exists
    only inside the DuckDB oracle). Each round is one equi-join of the
    frontier against the edge list plus a map-side-combining MIN aggregate
    and an anti-join — all key-partitioned hash joins, rounds fixed at 3,
    labels monotonically frozen so the frontier can only shrink. The label
    table is ``localCheckpoint``-truncated per round (the pagerank/CC
    discipline): it feeds BOTH the frontier join and the anti-join, so an
    untruncated lineage would recompute every earlier round 2^r times —
    measured 51 exchanges in the naive plan vs a flat per-round cost
    truncated. The same shape runs at 100 TB because propagation touches
    only near-dup pairs, never the corpus cross product."""
    from .artifacts import jaccard_pairs_075

    pairs = jaccard_pairs_075(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    labels = docs.where(F.col("doc_id") % _LP_SEED_MOD == 0).select(
        "doc_id",
        F.col("lang").alias("label"),
        F.lit(0).cast("long").alias("labeled_round"),
    )
    for r in range(1, _LP_ROUNDS + 1):
        frontier = (
            edges.join(
                labels.select(F.col("doc_id").alias("src"), "label"), "src"
            )
            .join(
                labels.select(F.col("doc_id").alias("dst")), "dst", "left_anti"
            )
            .groupBy("dst")
            .agg(F.min("label").alias("label"))
            .select(
                F.col("dst").alias("doc_id"),
                "label",
                F.lit(r).cast("long").alias("labeled_round"),
            )
        )
        labels = labels.unionByName(frontier).localCheckpoint(eager=True)
    return labels
