"""Frequency-sketch queries (SURVEY §2.8 "approximate sketches" family,
alongside the HLL / GK tolerance contracts in relational_queries).

The reference has no approximate aggregates; these are the heavy-hitter
half of the sketch story (HLL covers cardinality, GK covers quantiles):

- ``sketch_cms_heavy_hitters`` — a from-scratch, deterministic count-min
  sketch whose DuckDB oracle replays the exact same cells, so the
  *estimates themselves* hash-match (stronger than a tolerance flag).
- ``agg_approx_topk`` — Spark's built-in ``approx_top_k`` under the X80
  tolerance-contract pattern: capacity ≥ vocabulary ⇒ the space-saving
  sketch is exact, and the query proves it against its own exact counts.
- ``join_bloom_prune`` — membership sketch: an explicit KM-hashed Bloom
  filter built on the dim keys prunes the fact scan before the join
  shuffle; the exact join afterwards removes false positives, so the
  oracle is the plain join (the bloom is invisible in the answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    bloom_build_words,
    bloom_prune,
    bloom_size_bits,
    cms_build,
    cms_estimate,
)
from ..sources.parquet import load_table
from . import register


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens of the document corpus, empties dropped — mirrors
    ``string_split(text, ' ')`` + ``word <> ''`` in the oracles."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
    )


_CMS_HASH1 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"
_CMS_HASH2 = "CAST('0x' || substr(md5(reverse({x})), 1, 15) AS BIGINT)"

_CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
toks2 AS (SELECT word FROM toks WHERE word <> ''),
hashed AS (
  SELECT {_CMS_HASH1.format(x="word")} AS h1,
         {_CMS_HASH2.format(x="word")} AS h2
  FROM toks2
),
exact AS (SELECT word, count(*) AS exact_n FROM toks2 GROUP BY word),
top AS (
  SELECT word, exact_n FROM exact ORDER BY exact_n DESC, word LIMIT 20
),
depths AS (SELECT unnest(range(0, {CMS_DEPTH})) AS d),
cells AS (
  SELECT d, (h1 + d * h2) % {CMS_WIDTH} AS bucket, count(*) AS c
  FROM hashed CROSS JOIN depths
  GROUP BY 1, 2
)
SELECT t.word, t.exact_n, min(c.c) AS cms_est
FROM top t
CROSS JOIN depths dd
JOIN cells c
  ON c.d = dd.d
 AND c.bucket = ({_CMS_HASH1.format(x="t.word")}
                 + dd.d * {_CMS_HASH2.format(x="t.word")}) % {CMS_WIDTH}
GROUP BY t.word, t.exact_n
"""


@register("sketch_cms_heavy_hitters", oracle=_CMS_ORACLE)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter estimates over corpus tokens.

    The sketch (operators/sketches.py) is 4×2048 cells built in ONE bounded-
    state aggregation — at 100 TB the shuffle moves ≤ 8192 rows per task no
    matter the token count, where an exact per-word count table shuffles the
    vocabulary. The probe set here is the exact top-20 (the query also
    serves as the sketch's verification harness: ``cms_est ≥ exact_n``
    always, and both engines compute the identical estimate because the
    bucket hash is the shared md5_long — the oracle replays the sketch
    cell-for-cell, so this is hash-exact, not a tolerance check). In
    production only the sketch runs; candidate keys come from a prior pass
    or a stream of queries.
    """
    toks = _tokens(spark, sf_dir)
    exact = toks.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.col("exact_n").desc(), "word").limit(20)
    sketch = cms_build(toks, "word")
    return cms_estimate(sketch, top, "word").select("word", "exact_n", "cms_est")


_TOPK_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
toks2 AS (SELECT word FROM toks WHERE word <> ''),
exact AS (SELECT word, count(*) AS exact_n FROM toks2 GROUP BY word)
SELECT word, exact_n, TRUE AS within_tolerance
FROM exact ORDER BY exact_n DESC, word LIMIT 10
"""


@register("agg_approx_topk", oracle=_TOPK_ORACLE)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``approx_top_k`` (space-saving sketch) under the X80
    tolerance contract: the query computes its own exact top-10 AND probes
    the sketch output, emitting ``within_tolerance`` = the sketch's count
    for that word equals the exact count. The capacity (1e6 tracked items)
    exceeds any plausible corpus vocabulary here, and the space-saving
    sketch is provably exact while no eviction occurs — so the flag is
    deterministically TRUE, which is what the oracle asserts. At 100 TB the
    sketch runs with a smaller capacity and bounded error; the exact side
    here is the verification harness, not the operator. ``k`` is padded to
    200 so a tie at the sketch's own cut line cannot drop an exact-top-10
    word."""
    toks = _tokens(spark, sf_dir)
    exact10 = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "word")
        .limit(10)
    )
    sk = (
        toks.agg(F.expr("approx_top_k(word, 200, 1000000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("word"), F.col("e.count").alias("approx_n"))
    )
    return exact10.join(F.broadcast(sk), "word", "left").select(
        "word",
        "exact_n",
        (F.col("approx_n") == F.col("exact_n")).alias("within_tolerance"),
    )


# ---------------------------------------------------------------------------
# join_bloom_prune
# ---------------------------------------------------------------------------

_BLOOM_PRICE = 450_000.0

_BLOOM_ORACLE = f"""
SELECT o.o_orderkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > {_BLOOM_PRICE}
GROUP BY o.o_orderkey
"""


@register("join_bloom_prune", oracle=_BLOOM_ORACLE)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning: revenue per high-value order, with the
    fact side pre-filtered by a bloom filter built on the qualifying order
    keys BEFORE the join shuffle.

    This is the canonical 100 TB semi-join shape (the hand-rolled analogue
    of Spark's runtime ``bloom_filter_agg`` injection): the build side is
    too large to broadcast as a hash relation at scale (every qualifying
    key + payload), but its bloom — sized by the build-side count at
    ~14 bits/key (fp ~0.2% at k=6) — still ships to every executor as
    model state: tens of KiB here, ~170 MiB for 1e8 keys at 1%. The probe
    predicate is pure integer whole-stage codegen (xxhash64 KM double
    hashing, unrolled probes over a constant-folded word array) in the
    lineitem SCAN stage, so ~90% of the fact rows never reach the
    exchange; the exact equi-join afterwards removes the bloom's false
    positives, keeping the result exact (false negatives are impossible —
    same KM hash math on both sides). The DuckDB oracle is therefore the
    PLAIN join: the bloom is a pure pruning optimization, invisible in
    the answer. ``tests/test_sketches.py`` pins the prune rate and
    zero-loss recall; ``tests/test_plans.py`` pins the predicate's
    placement before the exchange.
    """
    orders = load_table(spark, sf_dir, "orders")
    build = (
        orders.where(F.col("o_totalprice") > _BLOOM_PRICE)
        .select("o_orderkey")
        .localCheckpoint()  # reused 3x: count, bloom build, verify join
    )
    n_bits = bloom_size_bits(build.count())  # size-by-n: the production step
    words = bloom_build_words(
        build.select(F.col("o_orderkey").cast("string").alias("k")), "k", n_bits=n_bits
    )
    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
    )
    pruned = bloom_prune(
        fact, F.col("l_orderkey").cast("string"), words, n_bits=n_bits
    )
    return (
        pruned.join(build, pruned.l_orderkey == build.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
