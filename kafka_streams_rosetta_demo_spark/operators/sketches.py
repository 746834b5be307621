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


# ---------------------------------------------------------------------------
# Bloom filter (membership sketch) — semi-join pruning
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16  # 65,536 bits = 1,024 packed longs = 8 KiB
BLOOM_HASHES = 6


def bloom_positions(
    item: Column, n_hashes: int = BLOOM_HASHES, n_bits: int = BLOOM_BITS
) -> Column:
    """``n_hashes`` bit positions for ``item`` (``array<long>``), via the
    same Kirsch-Mitzenmacher double hashing as the CMS above: two md5-based
    base hashes per item TOTAL, then pure integer arithmetic per probe.
    Deterministic and DuckDB-replayable (``md5_long``), so tests can mirror
    the filter bit-for-bit."""
    h1 = md5_long(item)
    h2 = md5_long(F.reverse(item))
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda d: (h1 + d.cast("long") * h2) % F.lit(n_bits),
    )


def bloom_build_words(
    keys: DataFrame,
    col: str,
    n_hashes: int = BLOOM_HASHES,
    n_bits: int = BLOOM_BITS,
) -> list[int]:
    """Build the packed filter driver-side: one distributed pass computes the
    DISTINCT set bit positions (a partial-aggregated ``explode`` + group —
    at most ``n_bits`` rows cross the shuffle regardless of key count), the
    driver packs them into ``n_bits/64`` signed-64-bit words. Like the
    kmeans centroid collect, this is O(sketch) model state, never O(rows) —
    8 KiB here, ~128 MiB for a 1e9-key / 1% FP production filter, which is
    exactly the regime where the key set itself is too big to broadcast as
    a hash relation but its bloom still ships to every executor.
    """
    rows = (
        keys.select(F.explode(bloom_positions(F.col(col), n_hashes, n_bits)).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("p")
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in rows:
        words[r.p // 64] |= 1 << (r.p % 64)
    # two's-complement into signed range for a BIGINT SQL literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_words_literal(words: list[int]) -> Column:
    """The packed filter as ONE parsed SQL array literal (the repo-wide
    pattern for model-state literals — a per-element ``F.lit`` tree costs
    driver seconds at this width)."""
    return F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")


def bloom_prune(
    df: DataFrame,
    key: Column,
    words: list[int],
    n_hashes: int = BLOOM_HASHES,
    n_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Keep only rows whose ``key`` MIGHT be in the filter — all
    ``n_hashes`` probed bits set. Pure JVM integer expressions inside
    whole-stage codegen (no UDF): the two KM base hashes are materialized
    ONCE per row, then each probe is modular arithmetic + a packed-word
    ``element_at`` + a variable-amount ``shiftleft`` bit test (bit 63's
    sign wrap is harmless — both sides of ``!= 0`` see the same two's
    complement). False negatives are impossible by construction, so
    pruning with this predicate before an exact join keeps the join's
    result exact while cutting the shuffled probe volume to the matching
    fraction plus the filter's false-positive rate. The predicate sits in
    the scan stage, BEFORE the join exchange — that placement is the whole
    point, and ``tests/test_plans.py`` pins it."""
    probe = f"(_bloom_h1 + CAST(d AS BIGINT) * _bloom_h2) % {n_bits}"
    bit_ok = (
        f"(element_at(_bloom_words, CAST(({probe}) DIV 64 AS INT) + 1)"
        f" & shiftleft(1L, CAST(({probe}) % 64 AS INT))) != 0"
    )
    return (
        df.withColumn("_bloom_h1", md5_long(key))
        .withColumn("_bloom_h2", md5_long(F.reverse(key)))
        .withColumn("_bloom_words", bloom_words_literal(words))
        .where(F.expr(f"forall(sequence(0, {n_hashes - 1}), d -> {bit_ok})"))
        .drop("_bloom_h1", "_bloom_h2", "_bloom_words")
    )
