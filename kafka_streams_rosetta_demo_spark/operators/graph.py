"""Graph operators: connected components for dedup clustering.

Near-duplicate *pairs* (operators/textsim.py) are only half the dedup story
— a training pipeline must collapse each transitive group of near-dups to
one canonical document (A~B, B~C ⇒ {A,B,C} keep one). That grouping is
connected components over the pair graph.

Scale design: min-label propagation, the standard distributed CC. Each
iteration is one equi-join + one groupBy-min — plain shuffles on the node
id, no driver-side graph. Near-dup components are shallow (near-duplication
is close to transitive), so a handful of neighbor-min rounds converge; for
adversarially long chains (sliding boilerplate near-dups) the loop adds
PATH HALVING from round 3 — label <- label(label), one extra equi-join of
the small label table — which bounds rounds at O(log diameter), the same
asymptotic the ``large-star / small-star`` variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond") buys with heavier
edge-rewriting rounds. A 400-node path graph is pinned converging inside
the default budget (``tests/test_corpus.py``). Per-iteration
``localCheckpoint`` truncates the lineage so the plan does not grow with
iterations (the classic iterative-algorithm failure mode on Spark).

The driver-side loop carries only a scalar convergence flag per round —
never node or edge data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the smallest node id
    in its component. Returns (id, component) — one row per distinct node.

    ``edges`` may be directed pairs; they are symmetrized here, so the
    result is components of the undirected graph.
    """
    # Materialize the edge input ONCE before anything references it: the
    # symmetrize union, the node extraction, and the initial labels each
    # re-evaluate `edges` otherwise — ruinous when the edges are themselves
    # an expensive similarity join (the dedup_cluster_cc caller).
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = sym.select(F.col("src").alias("id")).distinct()

    # Self-loops collapse the round to ONE join + ONE min-agg: min over
    # neighbors-including-self ≡ least(own label, neighbor minimum). The
    # adjacency is pre-partitioned on the join key and materialized once —
    # the checkpointed frame keeps its HashPartitioning, so every round
    # shuffles only the (much smaller) label table, not the edges.
    #
    # The partition count is SIZE-BASED: an explicit repartition is exempt
    # from AQE coalescing, so pinning it to the session shuffle setting
    # over-parallelizes small graphs into swarms of near-empty tasks whose
    # scheduling noise dominates the loop (measured: 2x wall-clock variance
    # at sf0.1). ~250k adjacency rows per partition, floored at 8, capped
    # at the session setting — a 100 TB edge set hits the cluster-sized cap,
    # a near-dup graph gets a handful of full partitions.
    n_edges = e.count()  # cheap: e is checkpointed
    try:
        # Non-numeric on platforms with auto-optimized shuffle ("auto") —
        # fall back to an uncapped size-based count rather than crash.
        conf_parts = int(sym.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        conf_parts = 2**31 - 1
    parts = max(8, min(conf_parts, (3 * n_edges) // 250_000 + 1))
    adj = (
        sym.unionByName(
            nodes.select(F.col("id").alias("src"), F.col("id").alias("dst"))
        )
        .distinct()
        .repartition(parts, "src")
        .localCheckpoint(eager=True)
    )
    labels = nodes.withColumn("component", F.col("id")).localCheckpoint(eager=True)

    prev_sum = None
    for i in range(max_iter):
        labels = (
            adj.join(labels, adj["src"] == labels["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("component"))
        )
        # PATH HALVING (pointer jumping): label <- label(label). Plain
        # neighbor-min needs diameter rounds — fine for shallow near-dup
        # graphs, fatal for a long chain (boilerplate sliding near-dups can
        # chain arbitrarily at corpus scale). Following the label's own
        # label halves remaining distance, so rounds drop to O(log d) —
        # the same acceleration large-star/small-star buys, for one extra
        # equi-join of the (node-sized, 2-column) label table, much
        # smaller than the adjacency join above. Correctness: every label
        # value is a node id of the same component (init = self, min over
        # neighbors preserves membership), so label(label) stays in the
        # component and the component min is still the unique fixpoint.
        # Skipped for the first two rounds: shallow graphs converge before
        # the extra join would pay for itself.
        if i >= 2:
            hop = labels.select(
                F.col("id").alias("h_id"), F.col("component").alias("h_comp")
            )
            labels = labels.join(
                hop, labels["component"] == hop["h_id"], "left"
            ).select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("h_comp", "component")
                ).alias("component"),
            )
        labels = labels.localCheckpoint(eager=True)
        # Labels are monotonically non-increasing (the self-loop keeps each
        # node's own label in the min), so the label sum strictly decreases
        # until the fixpoint — a scalar convergence flag with no join
        # against the previous round's labels.
        cur = labels.agg(F.sum("component")).first()[0]
        if cur == prev_sum:
            return labels
        prev_sum = cur
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


# Rank-table lineage is truncated every this-many iterations (see the loop
# comment in `pagerank`): plan depth stays bounded for ANY iteration count
# while half the per-iteration materialization jobs disappear.
_PR_CKPT_EVERY = 2


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 1_000_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank in pure integer arithmetic — the page-
    importance signal web-corpus curation uses as a quality weight (domain/
    URL rank filtering a la Common Crawl pipelines).

    All math is integer: ranks start at ``scale``, each round emits
    ``r div deg`` per out-edge and recombines as ``(1-d)·scale + d·sum``
    with floor division. Integer addition is associative, so the result is
    independent of partitioning and aggregation order — exactly
    reproducible across engines (a float PageRank is not), which is what
    makes the query's unrolled-SQL oracle hash-exact. Precision loss vs
    float is ≤ deg·iterations ulps of 1e-9 — noise at rank scale.

    Scale: the adjacency (with out-degrees attached) is partitioned on the
    join key and checkpointed ONCE; each round shuffles only the 2-column
    rank table (the CC pattern above). Driver holds nothing but the loop
    counter. Caller symmetrizes if the graph is undirected. At ~1e9+ nodes,
    lower ``scale`` (or widen to decimal(38,0)) so ``damping_pct · Σranks``
    stays inside int64.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    parts = _sized_partitions(e.sparkSession, e.count())
    adj = e.join(deg, "src").repartition(parts, "src").localCheckpoint(eager=True)
    nodes = deg.select(F.col("src").alias("node")).localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    base = (100 - damping_pct) * scale // 100
    for i in range(iterations):
        summed = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select("dst", F.expr("r div deg").alias("contrib"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("t"))
        )
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(t, CAST(0 AS BIGINT))) div 100")
            )
            .cast("long")
            .alias("r"),
        )
        # Lineage truncation on an INTERVAL, not every round (optimization
        # round 14, guide §5): an eager localCheckpoint is a full extra
        # job + materialization per call, while its only purpose here is
        # bounding plan growth. Two lazy rounds between truncations keep
        # the plan depth constant in `iterations` and let Catalyst/AQE
        # pipeline the pair of joins; the integer arithmetic is unchanged
        # (associative sums — result independent of plan shape; equality
        # across cadences pinned in tests/test_graph_ops.py). Measured
        # 6.0 -> 5.0 s median on the sf0.1 purchase graph.
        if (i + 1) % _PR_CKPT_EVERY == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def triangle_counts(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle participation counts over an undirected graph given
    as distinct pairs with ``a < b`` (each edge once). Returns (node,
    n_triangles) for every node in at least one triangle.

    The standard distributed shape: DEGREE-ORDERED ORIENTATION. Each edge is
    directed from the endpoint with the smaller (degree, id) to the larger,
    then triangles are two equi-joins of the oriented list (wedge at the
    lowest-ordered vertex + closing-edge check). Orientation bounds every
    vertex's out-degree by O(sqrt(|E|)), so the wedge join emits
    O(|E|^1.5) candidates worst-case instead of Σdeg² — the difference
    between feasible and not on a skewed 100 TB graph (a celebrity node with
    1e7 neighbors would otherwise generate 1e14 wedges). All joins are plain
    equi-joins; nothing is collected.
    """
    e = pairs.select(F.col(a).alias("a"), F.col(b).alias("b")).localCheckpoint(
        eager=True
    )
    both = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.col("a"),
            )
            .otherwise(F.col("b"))
            .alias("u"),
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.col("b"),
            )
            .otherwise(F.col("a"))
            .alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    e1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tris = e1.join(e2, "y").join(e3, ["x", "z"])
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def _sized_partitions(spark, n_rows: int, rows_per_part: int = 250_000) -> int:
    """Size-based partition count for iterative-join adjacencies: ~250k rows
    per partition, floored at 8, capped at the session shuffle setting (see
    connected_components for why pinning to the session setting alone
    over-parallelizes small graphs)."""
    try:
        conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        conf_parts = 2**31 - 1
    return max(8, min(conf_parts, n_rows // rows_per_part + 1))


def keep_best_survivors(
    labels: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    max_broadcast_rows: int = 10_000_000,
) -> DataFrame:
    """Per connected component, pick the canonical survivor: highest
    ``quality_col``, ties broken by smallest id. Returns one row per cluster:
    (cluster_id, n_members, keep_doc_id, keep_quality).

    ``labels`` is a (id, component) frame — typically the *materialized*
    output of :func:`connected_components`, so a pipeline that needs both the
    cluster table and the survivors runs the similarity join + label
    propagation ONCE and feeds this twice. ``quality`` is a (id_col,
    quality_col) projection of the corpus — the side that scales with data
    size, billions of rows at the 100 TB target.

    Scale: the labels frame holds only documents that HAVE a near-dup —
    usually small relative to the corpus — so it is the *preferred*
    broadcast side: the corpus quality projection then streams through a
    map-side hash join with no shuffle. But "documents with a near-dup" is
    tens of percent of a raw web corpus, which at the 100 TB target is
    billions of label rows — force-broadcasting that OOMs every executor.
    So the hint is size-guarded: labels broadcast only below
    ``max_broadcast_rows`` (a count — cheap, since callers pass the
    checkpointed output of :func:`connected_components`); above it the join
    degrades to a plain shuffle hash join on the id, which is the correct
    plan at that size. The argmax window then partitions by component: key
    cardinality = number of clusters, per-key size = cluster size (shallow
    and small for near-dup graphs), so no skew.
    """
    labels_ids = labels.select(F.col("id").alias(id_col), "component")
    if labels_ids.count() <= max_broadcast_rows:
        labels_ids = F.broadcast(labels_ids)
    members = quality.select(id_col, quality_col).join(labels_ids, id_col)
    w = Window.partitionBy("component").orderBy(F.col(quality_col).desc(), F.col(id_col))
    ranked = members.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.when(F.col("rn") == 1, F.col(id_col))).alias("keep_doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col(quality_col))).alias("keep_quality"),
    )
