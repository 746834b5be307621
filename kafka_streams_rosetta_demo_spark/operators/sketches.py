"""Distributed frequency sketches: count-min over arbitrary item streams.

The reference has no approximate aggregates at all (SURVEY §2.8), but a
100 TB corpus pipeline needs frequency estimates (heavy-hitter tokens,
hot keys for skew detection, vocabulary pruning) without materializing a
full per-item count table. Count-min (Cormode & Muthukrishnan 2005) is the
standard answer: ``depth`` hash rows × ``width`` buckets of counters,
``estimate(x) = min_d cells[d][h_d(x)]`` — always an overcount, bounded by
``eps·N`` with probability ``1 - delta`` for ``width = e/eps``,
``depth = ln(1/delta)``.

Spark shape: the sketch build is ONE aggregation with bounded state — each
executor's partial map holds at most ``depth × width`` cells regardless of
input size, and cell-wise merge is exactly the map-side-combine path Spark
already runs. The only data-sized move is the ``depth×`` explode feeding
the partial agg, which never leaves the mapper. Probing is a join of the
(tiny) key set against the (bounded, ``depth·width``-row) sketch.

Determinism: the bucket hashes derive from the repo-wide ``md5_long``
(first 60 bits of md5), which DuckDB computes bit-identically — so a
query's oracle can replay the *exact* sketch, making CMS estimates
hash-checkable rather than merely tolerance-checkable.

Hash family: Kirsch–Mitzenmacher double hashing — ``h_d(x) = (h1(x) +
d·h2(x)) mod width`` from two base hashes (md5 of the item and of the
item reversed). KM preserves the CMS/Bloom error guarantees while hashing
each item TWICE total instead of once per depth row — at 100 TB of
tokens, that halves-or-better the dominant per-row cost (md5 of a salted
string per depth) and explodes only small ints, not salted strings.
``h1 + d·h2 ≤ 4·2^60 < 2^63`` — no int64 overflow at depth ≤ 7.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textsim import md5_long

CMS_DEPTH = 4
CMS_WIDTH = 2048


def cms_bucket(item: Column, depth_idx: Column, width: int = CMS_WIDTH) -> Column:
    """Bucket of ``item`` under hash row ``depth_idx`` via KM double
    hashing. All terms non-negative, so ``%`` agrees with DuckDB."""
    h1 = md5_long(item)
    h2 = md5_long(F.reverse(item))
    return (h1 + depth_idx.cast("long") * h2) % F.lit(width)


def cms_build(
    items: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Aggregate an item stream into CMS cells: (d, bucket, c) with at most
    ``depth × width`` rows. The two KM base hashes are computed ONCE per
    item row, BEFORE the depth explode — the explode then fans out two
    longs, not strings, and each fanned row is pure integer arithmetic.
    Partial aggregation collapses each mapper's output to the bounded cell
    grid, so the shuffle moves ≤ depth·width rows per task — the whole
    point of sketching at 100 TB."""
    hashed = items.select(
        md5_long(F.col(col)).alias("h1"),
        md5_long(F.reverse(F.col(col))).alias("h2"),
    )
    return (
        hashed.select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"), "h1", "h2"
        )
        .select(
            "d",
            ((F.col("h1") + F.col("d").cast("long") * F.col("h2")) % F.lit(width)).alias(
                "bucket"
            ),
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: adds a ``cms_est``
    column (min over the ``depth`` hash rows). The sketch is bounded at
    depth·width rows by construction, so it broadcasts; the keys side can be
    arbitrarily large and streams map-side. Keys must occur in the sketched
    stream (their own occurrences guarantee the probed cells exist); probing
    truly-absent keys would need a left join with ``coalesce(c, 0)``."""
    probes = keys.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    ).withColumn("bucket", cms_bucket(F.col(col), F.col("d"), width))
    others = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(*others)
        .agg(F.min("c").alias("cms_est"))
    )
