"""Deduplication queries over ``documents`` / ``embeddings`` (north-star
LLM-data-pipeline scope; the reference has no document operators).

Five dedup families, each oracle-backed:

- ``dedup_exact``          — content-hash grouping (canonical row per text).
- ``dedup_minhash_lsh``    — shingle → MinHash → LSH band join → exact verify.
- ``dedup_ngram_jaccard``  — prefix-filtered inverted-index join (exact recall).
- ``dedup_simhash``        — 60-bit SimHash + chunk banding, Hamming <= 3.
- ``dedup_embedding_cosine`` — hyperplane-LSH bucketed near-dup over vectors.

Oracle strategy: the banded/bucketed Spark plans are *approximate candidate
generators* followed by exact verification, so the DuckDB oracles compute the
exact brute-force answer (all qualifying pairs). The testdata's planted
near-duplicates sit at Jaccard >= 0.9 with background < 0.13, far above the
LSH S-curve knee, so candidate recall is 1 in practice — and the pytest suite
(tests/test_dedup.py) pins recall == 1 against the brute-force twin at sf0.01
so a parameter regression is caught before the driver gate. For SimHash the
oracle mirrors the *same* signature math bit-for-bit (via the shared
md5-prefix hash), so parity is definitional, not probabilistic.

The exact-dup and embedding queries inject deterministic duplicates (the
testdata has none): re-keyed copies of every 10th document, and 1.5x-scaled
copies of every 20th embedding. Scaling preserves hyperplane sign bits
exactly, so the embedding LSH has provable — not probabilistic — recall on
the injected pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import rebalance
from ..operators.textsim import (
    band_candidate_pairs,
    containment_filter_pairs,
    containment_verify,
    jaccard_verify,
    lsh_band_keys,
    simhash_near_pairs,
    simhash_signature,
    with_shingles,
)
from ..operators.vectors import banded_cosine_pairs, scaled_float32_injection
from ..sources.parquet import load_table
from . import register

# ---------------------------------------------------------------------------
# Shared oracle SQL fragments
# ---------------------------------------------------------------------------


def _shingle_cte(k: int) -> str:
    """Distinct word-``k``-gram shingles per doc (DuckDB).

    Mirrors :func:`..operators.textsim.word_shingles`: docs with fewer than
    ``k`` words are excluded on both sides.
    """
    return f"""
w AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents
  WHERE len(string_split(text, ' ')) >= {k}
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+{k - 1}], ' ') AS shingle
  FROM (SELECT doc_id, words, unnest(range(1, len(words) - {k - 2})) AS i FROM w)
)"""


def _jaccard_pairs_oracle(k: int, threshold: float) -> str:
    """Brute-force exact word-shingle Jaccard pairs >= threshold."""
    return f"""
WITH {_shingle_cte(k)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= {threshold}
"""


# ---------------------------------------------------------------------------
# dedup_exact
# ---------------------------------------------------------------------------

_EXACT_ORACLE = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text)    AS content_hash,
       min(doc_id)  AS canonical_doc_id,
       count(*)     AS n_copies
FROM all_docs
GROUP BY md5(text)
"""


@register("dedup_exact", oracle=_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one canonical (min doc_id) row per
    distinct text, with the duplicate count observable as ``n_copies``.

    The testdata has no byte-identical duplicates, so every 10th doc is
    re-injected under a shifted id — deterministically, on both engine and
    oracle — to make the collapse visible.

    Scale: md5 is computed map-side and the group-by is a partial-agg hash
    shuffle on the 128-bit digest — uniformly distributed keys, no skew; at
    100 TB this is the standard one-shuffle exact-dedup pass. (Equivalent to
    ``dropDuplicates`` on text, but grouping on the digest keeps the shuffle
    key 16 bytes instead of document-sized.)
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return (
        docs.unionByName(dups)
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_minhash_lsh
# ---------------------------------------------------------------------------


@register("dedup_minhash_lsh", oracle=_jaccard_pairs_oracle(k=3, threshold=0.8))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at word-3-shingle Jaccard >= 0.8 via MinHash + LSH.

    Plan: shingle (per-row) → 64-hash MinHash signature (one partial-agg
    shuffle) → 16x4 band keys → equi self-join on (band, key) → exact-Jaccard
    verification of the candidates. No crossJoin anywhere; the all-pairs
    work the oracle does brute-force is replaced by banding whose collision
    probability at J=0.8 is > 0.999 (and the planted dups sit at J >= 0.9).
    """
    # The shingled frame feeds the signature AND both verify sides —
    # materialized once per (application, sf_dir) and SHARED with the
    # whole dedup family (queries/artifacts.py). Materializing also stops
    # InferFiltersFromGenerate pushing `size(<shingle expr>)>0` below the
    # rebalance into the single-task scan stage. At cluster scale this is
    # the standard "signature table" materialization.
    from .artifacts import minhash_signatures, shingled_documents

    sh = shingled_documents(spark, sf_dir)
    # The 64-hash signature table is itself a memoized family artifact
    # (threshold- and banding-independent — any (bands, rows) factorization
    # slices it); this query charges its build per the bench cost policy,
    # reruns and other signature consumers ride it warm.
    sig = minhash_signatures(spark, sf_dir)
    bands = lsh_band_keys(sig, bands=16, rows=4)
    cand = band_candidate_pairs(bands)
    return jaccard_verify(cand, sh, threshold=0.8)


# ---------------------------------------------------------------------------
# dedup_ngram_jaccard
# ---------------------------------------------------------------------------


@register("dedup_ngram_jaccard", oracle=_jaccard_pairs_oracle(k=3, threshold=0.75))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs at word-3-gram Jaccard >= 0.75 via
    frequency-ordered prefix filtering (AllPairs/PPJoin).

    Unlike MinHash banding this path has *guaranteed* recall: only the first
    ``|S| - ceil(0.75|S|) + 1`` shingles — rarest first in global
    document-frequency order — enter the inverted index, and any pair with
    J >= 0.75 provably shares one. The candidate set is a small superset of
    the answer, then exact Jaccard filters. Scale: rarest-first prefixes
    keep posting lists short even on a skewed vocabulary (a random prefix
    order degenerates toward all-pairs on common shingles); residual hot
    shingles are AQE skew-join territory.
    """
    # This query's answer IS the family's terminal shared artifact
    # (queries/artifacts.py): the same verified pair set is the cluster
    # collapse's edge list and the incremental screen's match superset, so
    # building it here (bench charges the build to this query) makes both
    # downstream passes warm-artifact reads.
    from .artifacts import jaccard_pairs_075

    return jaccard_pairs_075(spark, sf_dir)


# ---------------------------------------------------------------------------
# dedup_simhash
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(60)
    )
    terms = " + ".join(f"CASE WHEN s{j} >= 0 THEN {1 << j} ELSE 0 END" for j in range(60))
    return f"""
WITH {_shingle_cte(3)},
h AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS hv FROM sh
),
bits AS (
  SELECT doc_id,
         {sums}
  FROM h GROUP BY doc_id
),
sig AS (SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM bits)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at SimHash Hamming distance <= 3 (60-bit signatures
    over word-3-shingles).

    The signature hash is the md5-prefix long both engines compute
    identically, so the oracle mirrors the signature math bit-for-bit — the
    only difference is the pairing strategy: the oracle goes all-pairs, the
    engine splits the signature into 4 15-bit chunks and equi-joins on
    (chunk, value); by pigeonhole any pair within 3 flips shares a chunk, so
    recall is exact. Scale: signatures are 8 bytes/doc; the chunk join is the
    only shuffle beyond the signature aggregate.
    """
    from .artifacts import shingled_documents

    sig = simhash_signature(shingled_documents(spark, sf_dir))
    return simhash_near_pairs(sig, max_hamming=3, chunks=4)


# ---------------------------------------------------------------------------
# dedup_embedding_cosine
# ---------------------------------------------------------------------------

_EMB_DUP_ORACLE = """
WITH all_vecs AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT)) AS embedding
  FROM embeddings WHERE vec_id % 20 = 0
),
norms AS (
  SELECT vec_id, embedding,
         sqrt((SELECT sum(CAST(embedding[s.i] AS DOUBLE) * CAST(embedding[s.i] AS DOUBLE))
               FROM (SELECT unnest(range(1, 65)) AS i) s)) AS nrm
  FROM all_vecs
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         (SELECT sum(CAST(a.embedding[s.i] AS DOUBLE) * CAST(b.embedding[s.i] AS DOUBLE))
          FROM (SELECT unnest(range(1, 65)) AS i) s) / (a.nrm * b.nrm) AS cos
  FROM norms a JOIN norms b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cos, 3) AS cosine
FROM pairs WHERE cos >= 0.95
"""


@register("dedup_embedding_cosine", oracle=_EMB_DUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at cosine >= 0.95 via hyperplane-LSH buckets.

    Every 20th vector is re-injected scaled by 1.5 (float32 rounding applied
    identically in the oracle), planting duplicate pairs at cosine ~ 1.0.
    Positive scaling preserves every hyperplane sign bit, so the injected
    pairs land in identical buckets in *all* 4 bands — recall on them is
    exactly 1, independent of the (deterministic, seeded) hyperplane draw.
    The corpus's natural pairs top out at cosine ~ 0.51 (measured), far below
    the 0.95 threshold, so engine and brute-force oracle agree on the exact
    pair set. Scale: 64 sign bits per vector map-side, equi join on band
    keys, exact cosine only on candidates — no crossJoin.
    """
    emb = rebalance(load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    inj = scaled_float32_injection(emb, mod=20, shift=1000000, factor=1.5)
    # materialized once: feeds the band-key path and both verify sides
    allv = emb.unionByName(inj).localCheckpoint(eager=True)
    return banded_cosine_pairs(allv, threshold=0.95)


# ---------------------------------------------------------------------------
# dedup_containment
# ---------------------------------------------------------------------------

# Asymmetric containment |A∩B|/|A| >= 0.9: finds docs quoted/excerpted by
# another, which Jaccard structurally misses (a paragraph inside a book has
# J ~ 0 but containment ~ 1). Every 50th doc is re-injected as its first
# half (word-wise) under a shifted id — a planted excerpt whose shingles
# are a strict subset of its source's, so containment = 1 in exactly one
# direction. The oracle goes brute-force on the shared-shingle join; the
# engine goes through the one-sided prefix filter.
_CONTAIN_ORACLE = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         array_to_string(
           (string_split(text, ' '))[1:CAST(len(string_split(text, ' ')) // 2 AS BIGINT)],
           ' ') AS text
  FROM documents WHERE doc_id % 50 = 0
),
w AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM all_docs
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, words, unnest(range(1, len(words) - 1)) AS i FROM w)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_in, b.doc_id AS doc_out, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_in, doc_out,
       round(CAST(c AS DOUBLE) / CAST(sa.n AS DOUBLE), 6) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = doc_in
WHERE CAST(c AS DOUBLE) / CAST(sa.n AS DOUBLE) >= 0.9
"""


@register("dedup_containment", oracle=_CONTAIN_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (engulfing/excerpt) detection at C(A,B) = |A∩B|/|A| >=
    0.9 over word-3-shingles — the dedup relation that catches documents
    quoted or wholly included in another, invisible to symmetric Jaccard.
    Planted excerpts (first half of every 50th doc) must surface with
    containment 1.0 toward their source and NOT the reverse.

    Plan: one-sided prefix filter (``containment_filter_pairs`` — the
    contained side indexes only its ``|A| - ceil(0.9|A|) + 1`` rarest
    shingles, the container side indexes all; exact recall by pigeonhole)
    → exact containment verify on candidates. Scale: the container-side
    posting lists are the inherent cost of asymmetric containment; the
    df-ordered prefixes keep them sparsely probed, and hot shingles are
    AQE skew territory — never an all-pairs product.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    excerpts = docs.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(words, F.lit(1), F.floor(F.size(words) / 2).cast("int"))
        ).alias("text"),
    )
    allv = rebalance(docs.unionByName(excerpts))
    # materialized once: feeds the df-order index (2x) and verify (2x)
    sh = with_shingles(allv, k=3).localCheckpoint(eager=True)
    cand = containment_filter_pairs(sh, threshold=0.9)
    return containment_verify(cand, sh, threshold=0.9)


# ---------------------------------------------------------------------------
# dedup_incremental_screen
# ---------------------------------------------------------------------------

# Batch = every 5th doc, corpus = the rest (deterministic split, both
# engines). A batch doc is dropped when ANY corpus doc sits at word-3-gram
# Jaccard >= 0.75; the oracle goes brute-force batch x corpus on shared
# shingles, the engine goes through the cross-set prefix filter.
_INCR_ORACLE = f"""
WITH {_shingle_cte(3)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
  GROUP BY 1, 2
),
dups AS (
  SELECT doc_a, count(*) AS n_corpus_dups
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.75
  GROUP BY doc_a
)
SELECT w.doc_id,
       COALESCE(d.n_corpus_dups, 0) AS n_corpus_dups,
       COALESCE(d.n_corpus_dups, 0) = 0 AS keep
FROM w LEFT JOIN dups d ON d.doc_a = w.doc_id
WHERE w.doc_id % 5 = 0
"""


@register("dedup_incremental_screen", oracle=_INCR_ORACLE)
def dedup_incremental_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: screen a new crawl batch (every 5th doc) against
    the existing corpus (the rest), dropping batch docs with a corpus
    near-dup at word-3-gram Jaccard >= 0.75 — the shape a continuously-fed
    training pipeline runs per ingest, where re-deduplicating the whole
    corpus per batch is unaffordable.

    Plan: cross-set prefix filter (``prefix_filter_pairs_cross`` — exact
    recall, the corpus never self-joins, and at scale its prefix index is a
    materialized artifact reused across batches) → exact-Jaccard verify on
    candidates → per-batch-doc match count as a left join, so kept docs
    surface with ``n_corpus_dups = 0`` rather than vanishing silently.
    """
    # Warm-artifact form: the batch/corpus halves partition the SAME corpus
    # the family's verified-pair artifact covers, so the screen's matches
    # are exactly the artifact pairs with one foot on each side — no index
    # build, no candidate join, no verification left to run. (The cross-set
    # prefix path — prefix_filter_pairs_cross with the shared ordered
    # artifact — remains the shape for a genuinely NEW batch not in the
    # corpus artifact; tests/test_dedup.py pins both forms equal here.)
    from .artifacts import jaccard_pairs_075, shingled_documents

    sh = shingled_documents(spark, sf_dir)
    batch = sh.where(F.col("doc_id") % 5 == 0)
    pairs = jaccard_pairs_075(spark, sf_dir)
    a_in = F.col("doc_a") % 5 == 0
    b_in = F.col("doc_b") % 5 == 0
    cross = pairs.where(a_in != b_in).select(
        F.when(a_in, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_id")
    )
    dups = cross.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dups"))
    return batch.select("doc_id").join(dups, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_dups", F.lit(0)).alias("n_corpus_dups"),
        (F.coalesce("n_dups", F.lit(0)) == 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# dedup_fuzzy_name
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 8
"""


@register("dedup_fuzzy_name", oracle=_FUZZY_ORACLE)
def dedup_fuzzy_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy matching: name pairs within edit distance 8,
    under attribute blocking — the record-linkage shape (dedupe a product or
    customer master) next to the document-level near-dup family.

    Plan: equi self-join on the blocking key (brand, size) — one shuffle,
    candidates bounded by block sizes instead of |R|² — then the O(L²)
    Levenshtein DP runs JVM-side on candidates only. Both engines implement
    classic unit-cost edit distance, so the scores compare exactly. At
    100 TB the blocking key gains a name-length band (|len_a − len_b| > d
    can never match) and hot blocks are AQE skew-join territory; the
    pair-generation never degenerates to a cross join.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    a = part.alias("a")
    b = part.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            on=[
                F.col("a.p_brand") == F.col("b.p_brand"),
                F.col("a.p_size") == F.col("b.p_size"),
                F.col("a.p_partkey") < F.col("b.p_partkey"),
            ],
        )
        .where(dist <= 8)
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            dist.cast("long").alias("edit_dist"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_span_duplicates
# ---------------------------------------------------------------------------

# Substring-level exact duplication (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): document-level dedup misses
# REPEATED PASSAGES — boilerplate, licenses, quoted blocks — inside
# otherwise-distinct documents. The suffix-array approach of the paper is
# inherently single-machine; the distributed equivalent is fixed-width
# token-window fingerprinting: every 15-word span is hashed, and a span
# occurring more than once corpus-wide marks all its occurrences as
# duplicated text. Every 25th doc is re-injected as its first half under a
# shifted id, planting cross-doc duplicated spans deterministically.
_SPAN_W = 15

_SPAN_ORACLE = f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         array_to_string(
           (string_split(text, ' '))[1:CAST(len(string_split(text, ' ')) // 2 AS BIGINT)],
           ' ') AS text
  FROM documents WHERE doc_id % 25 = 0
),
w AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM all_docs
  WHERE len(string_split(text, ' ')) >= {_SPAN_W}
),
sp AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(array_to_string(words[i:i+{_SPAN_W - 1}], ' ')), 1, 15)
              AS BIGINT) AS h
  FROM (SELECT doc_id, words, unnest(range(1, len(words) - {_SPAN_W - 2})) AS i FROM w)
),
occ AS (SELECT h FROM sp GROUP BY h HAVING count(*) > 1),
docdup AS (
  SELECT s.doc_id, count(*) AS n_dup
  FROM sp s JOIN occ o ON o.h = s.h
  GROUP BY s.doc_id
)
SELECT w.doc_id,
       CAST(len(w.words) - {_SPAN_W - 1} AS BIGINT) AS n_spans,
       COALESCE(d.n_dup, 0)                         AS n_dup_spans,
       (1000 * COALESCE(d.n_dup, 0)) // (len(w.words) - {_SPAN_W - 1}) AS dup_permille
FROM w LEFT JOIN docdup d ON d.doc_id = w.doc_id
"""


@register("dedup_span_duplicates", oracle=_SPAN_ORACLE)
def dedup_span_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicated-passage profile: per document, how many of
    its 15-word token windows occur anywhere else in the corpus (including
    the planted half-doc excerpts). The per-doc ``dup_permille`` is the
    quality signal a curation pipeline thresholds on — documents that are
    mostly boilerplate score high even when no whole-document near-dup
    exists.

    Plan: per-row span hashing (JVM ``transform`` over the token array —
    zero shuffle, and the hash is the shared 60-bit md5_long so the 8-byte
    key, not a 32-char string, is what shuffles); ONE groupBy on the span
    hash with map-side partial counts finds duplicated spans; one join back
    + per-doc count finishes. ``n_spans`` comes from the token count
    directly — no second pass. At 100 TB the duplicated-hash set is not
    assumed broadcastable (plain shuffle join; AQE downgrades it to
    broadcast when small). This is the distributed stand-in for the
    suffix-array pass of Lee et al. — exact for duplication at the window
    width, blind below it, which is the standard large-scale tradeoff.
    """
    from ..operators.textsim import md5_long

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words0 = F.split("text", " ")
    excerpts = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(words0, F.lit(1), F.floor(F.size(words0) / 2).cast("int"))
        ).alias("text"),
    )
    allv = rebalance(docs.unionByName(excerpts))
    wdf = (
        allv.select("doc_id", F.split("text", " ").alias("words"))
        .where(F.size("words") >= _SPAN_W)
        .localCheckpoint(eager=True)  # feeds spans AND the per-doc base
    )
    spans = wdf.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - F.lit(_SPAN_W - 1)),
                lambda i: md5_long(
                    F.concat_ws(" ", F.slice(F.col("words"), i, F.lit(_SPAN_W)))
                ),
            )
        ).alias("h"),
    )
    dup = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") > 1)
        .select("h")
    )
    docdup = spans.join(dup, "h").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup")
    )
    return (
        wdf.select(
            "doc_id", (F.size("words") - F.lit(_SPAN_W - 1)).cast("long").alias("n_spans")
        )
        .join(docdup, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.expr(
                f"(1000 * coalesce(n_dup, CAST(0 AS BIGINT))) div n_spans"
            ).alias("dup_permille"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_semantic_semdedup
# ---------------------------------------------------------------------------

# SemDeDup (Abbas et al. 2023): cluster the embedding space, then look for
# near-duplicate pairs only WITHIN each cluster — semantic dedup at corpus
# scale without any all-pairs stage. The clustering here is the same
# deterministic id-sampled 32-centroid assignment the IVF index uses
# (closed-form argmax, no join), so the oracle can replay the full path:
# centroid pick → cell assign → in-cell pairwise cosine → survivor rule.
# The injected 1.5x-scaled duplicates of every 20th vector land in their
# source's cell (cosine is scale-invariant), making in-cell recall on them
# structural, not probabilistic.

_SEMDEDUP_DOT = (
    "(SELECT sum(CAST({a}[s.i] AS DOUBLE) * CAST({b}[s.i] AS DOUBLE)) "
    "FROM (SELECT unnest(range(1, 65)) AS i) s)"
)

_SEMDEDUP_ORACLE = f"""
WITH all_vecs AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT)) AS embedding
  FROM embeddings WHERE vec_id % 20 = 0
),
norms AS (
  SELECT vec_id, embedding,
         sqrt({_SEMDEDUP_DOT.format(a="embedding", b="embedding")}) AS nrm
  FROM all_vecs
),
centroids AS (
  SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm
  FROM norms WHERE vec_id % 31 = 0 AND vec_id < 1000000
  ORDER BY vec_id LIMIT 32
),
assigned AS (
  SELECT vec_id, cell_id FROM (
    SELECT n.vec_id, c.cid AS cell_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY {_SEMDEDUP_DOT.format(a="n.embedding", b="c.cemb")} / (n.nrm * c.cnrm)
                      DESC, c.cid DESC) AS rn
    FROM norms n CROSS JOIN centroids c
  ) WHERE rn = 1
),
pairs AS (
  SELECT aa.vec_id AS va, bb.vec_id AS vb
  FROM assigned aa
  JOIN assigned bb ON aa.cell_id = bb.cell_id AND aa.vec_id < bb.vec_id
  JOIN norms a ON a.vec_id = aa.vec_id
  JOIN norms b ON b.vec_id = bb.vec_id
  WHERE {_SEMDEDUP_DOT.format(a="a.embedding", b="b.embedding")} / (a.nrm * b.nrm) >= 0.95
),
partners AS (
  SELECT va AS vec_id FROM pairs UNION ALL SELECT vb AS vec_id FROM pairs
),
cnt AS (SELECT vec_id, count(*) AS n FROM partners GROUP BY vec_id)
SELECT s.vec_id, s.cell_id,
       COALESCE(c.n, 0) AS n_cell_dups,
       s.vec_id NOT IN (SELECT vb FROM pairs) AS keep
FROM assigned s LEFT JOIN cnt c ON c.vec_id = s.vec_id
"""


@register("dedup_semantic_semdedup", oracle=_SEMDEDUP_ORACLE)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup: per-cell cosine near-dup screen with a
    min-id survivor rule. Emits every vector's cell, its in-cell duplicate
    count, and whether it survives (``keep`` = no in-cell partner with a
    smaller id at cosine >= 0.95).

    Scale: cell assignment is a closed-form literal-centroid argmax (zero
    join, the ``ivf_assign`` expression); the pairwise stage is an equi
    self-join ON THE CELL KEY — candidate pairs scale with sum(cell²), not
    corpus², and cells are capacity-bounded in a real index (re-shard hot
    cells; AQE skew-split covers the residual). Centroid collect is k×dim
    bounded model state. This is the semantic complement to
    ``dedup_embedding_cosine``'s hyperplane-LSH: clustering catches
    paraphrase-level near-dups whose token overlap is too low for MinHash,
    at the cost of per-cell locality (cross-cell pairs are structurally
    out of scope — the published SemDeDup tradeoff, deterministic here and
    replayed identically by the oracle).
    """
    from ..operators.vectors import cosine, ivf_assign, with_norm

    emb = rebalance(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    inj = emb.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * F.lit(1.5)).cast("float")
        ).alias("embedding"),
    )
    allv = with_norm(emb.unionByName(inj))
    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroid_rows = (
        base.where(F.col("vec_id") % 31 == 0).orderBy("vec_id").limit(32).collect()
    )
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in centroid_rows
    ]
    # materialized once: feeds both sides of the in-cell self-join AND the
    # final projection
    cells = ivf_assign(allv, centroids).localCheckpoint(eager=True)
    a = cells.select(
        F.col("cell_id"),
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = cells.select(
        F.col("cell_id"),
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "cell_id")
        .where(F.col("va") < F.col("vb"))
        .where(
            cosine(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")) >= 0.95
        )
        .select("va", "vb")
        .localCheckpoint(eager=True)  # feeds the count AND the keep flag
    )
    cnt = (
        pairs.select(F.col("va").alias("vec_id"))
        .unionByName(pairs.select(F.col("vb").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dominated = pairs.select(F.col("vb").alias("vec_id")).distinct()
    return (
        cells.select("vec_id", "cell_id")
        .join(cnt, "vec_id", "left")
        .join(dominated.withColumn("_dom", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cell_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_cell_dups"),
            F.coalesce(~F.col("_dom"), F.lit(True)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_lsh_recall_eval — banding recall as an oracle-gated query
# ---------------------------------------------------------------------------

_LSH_RECALL_FLOOR_PPM = 950_000
# Support gate for the floor flag: with very few ground-truth pairs (tiny
# scale factors), ONE deterministic banding miss swings recall below the
# floor and the sweep would report a failure indistinguishable from a
# correctness bug. Below this support the flag is vacuously TRUE on both
# sides — the gate only judges the index when the sample can support a
# 95% floor (20 pairs → one miss costs 50 000 ppm, exactly the margin).
_LSH_RECALL_MIN_SUPPORT = 20

_LSH_RECALL_ORACLE = f"""
SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
       CAST({_LSH_RECALL_FLOOR_PPM} AS BIGINT) AS recall_floor_ppm,
       TRUE AS recall_floor_met
FROM ({_jaccard_pairs_oracle(k=3, threshold=0.8)})
"""


@register("dedup_lsh_recall_eval", oracle=_LSH_RECALL_ORACLE)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH index quality as a first-class query — the text-side twin
    of ``knn_recall_eval``: how many of the EXACT Jaccard-0.8 pairs (ground
    truth via the PPJoin prefix path, whose recall is provable) the 16x4
    banding recovered. Sketch collisions differ across engines, so the
    contract is the sketch-accuracy one (the ``agg_approx_count_distinct``
    pattern): the query measures its own recall against its own exact
    truth and emits the floor flag; the oracle emits the brute-force truth
    count + TRUE. A pipeline reruns exactly this gate when it re-tunes
    bands/rows or the shingle width — index-trust before a 100 TB dedup.

    Scale: truth pairs ride the shared ordered-prefix artifact; the LSH
    side is the already-registered banding plan; both verify stages bound
    work to candidates. The overlap count is a semi-join of two
    near-dup-pair sets — tiny by definition."""
    from .artifacts import (
        minhash_signatures,
        ordered_shingles,
        shingled_documents,
    )
    from ..operators.textsim import prefix_filter_pairs

    sh = shingled_documents(spark, sf_dir)
    truth = jaccard_verify(
        prefix_filter_pairs(sh, threshold=0.8, ordered=ordered_shingles(spark, sf_dir)),
        sh,
        threshold=0.8,
    ).select("doc_a", "doc_b")
    bands = lsh_band_keys(minhash_signatures(spark, sf_dir), bands=16, rows=4)
    found = jaccard_verify(
        band_candidate_pairs(bands), sh, threshold=0.8
    ).select("doc_a", "doc_b", F.lit(1).alias("hit"))
    # one aggregation over truth-left-join-found: count(*) is the truth
    # count, count(hit) the recovered subset — no 1-row cross join needed
    return (
        truth.join(found, ["doc_a", "doc_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.count("hit").alias("_n_found"),
        )
        .select(
            "n_true_pairs",
            F.lit(_LSH_RECALL_FLOOR_PPM).cast("long").alias("recall_floor_ppm"),
            (
                (F.col("n_true_pairs") < _LSH_RECALL_MIN_SUPPORT)
                | (
                    F.expr("_n_found * 1000000L DIV greatest(n_true_pairs, 1L)")
                    >= _LSH_RECALL_FLOOR_PPM
                )
            ).alias("recall_floor_met"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_winnowing — MOSS-style sampled fingerprints with a match guarantee
# ---------------------------------------------------------------------------

_WIN_K = 3  # shingle width (words)
_WIN_W = 4  # winnowing window (shingle hashes per window)
# Pair-ranking precision heuristic for ``dedup_winnowing`` ONLY. Winnowing's
# theorem guarantees exactly ONE shared fingerprint for a w+k-1-word run (and
# even much longer runs can legitimately yield one distinct value when
# adjacent windows select the same minimum), so >= 2 trades guaranteed recall
# for precision in the ranked-pairs report. The SCREEN must not make that
# trade — it gates at _WIN_SCREEN_MIN_SHARED to inherit the theorem.
_WIN_MIN_SHARED = 2
# Per-ingest screen gate: >= 1 shared fingerprint = the winnowing guarantee
# itself (any >= w+k-1 = 6-word verbatim cross-set run MUST share one).
_WIN_SCREEN_MIN_SHARED = 1
_WIN_TOPK = 20

_WINNOW_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS words
  FROM documents WHERE len(string_split(text, ' ')) >= {_WIN_K + _WIN_W - 1}
),
hs AS (
  SELECT doc_id,
         list_transform(
           range(1, len(words) - {_WIN_K - 2}),
           i -> CAST('0x' || substr(md5(array_to_string(words[i:i+{_WIN_K - 1}], ' ')), 1, 15)
                AS BIGINT)) AS h
  FROM w
),
fp AS (
  SELECT DISTINCT doc_id, f
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(h) - {_WIN_W - 2}),
                                 i -> list_min(h[i:i+{_WIN_W - 1}]))) AS f
    FROM hs
  )
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b ON b.f = a.f AND b.doc_id > a.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {_WIN_MIN_SHARED}
ORDER BY n_shared DESC, doc_a, doc_b
LIMIT {_WIN_TOPK}
"""


@register("dedup_winnowing", oracle=_WINNOW_ORACLE)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer et al. 2003, the MOSS fingerprinter): per
    document, slide a w=4 window over the positional 3-gram hash sequence
    and keep each window's MINIMUM — a ~1/w sample of the hashes that
    still GUARANTEES any shared run of at least w+k-1 = 6 words between
    two documents shares a fingerprint (every length-6 match spans a full
    window on both sides, and both windows pick the same minimum). That
    guarantee is what separates winnowing from naive hash sampling, and
    the 1/w storage factor is the 100 TB argument: the fingerprint index
    is a quarter of `dedup_span_duplicates`' exact all-spans table, with
    provable (not probabilistic) recall for long matches AT THE INDEX
    LEVEL. The ranked-pairs report below additionally requires
    ``_WIN_MIN_SHARED = 2`` distinct shared fingerprints — an explicit
    precision heuristic that does NOT inherit the theorem (the theorem
    guarantees one shared fingerprint, and even long runs can yield a
    single distinct value when adjacent windows pick the same minimum);
    the recall-critical per-ingest gate is ``dedup_winnowing_screen``,
    which gates at >= 1 and does inherit it. The index-level guarantee
    is pinned mechanically in `tests/test_round7_ops.py`.

    Plan: fingerprint selection is entirely per-row JVM HOFs (transform /
    slice / array_min — one scan, no explode until the distinct
    fingerprint set, which is ≤ spans/w rows per doc; see
    ``operators/textsim.winnow_fingerprints``); the fingerprint table is
    the family's memoized ``winnowing_index`` artifact (r8 — this query
    charges its build per the bench cost policy;
    ``dedup_winnowing_screen`` rides it warm); candidate pairs come from
    the fingerprint inverted index (equi-self-join on the fingerprint
    value — posting-list bytes through the shuffle, Σ|posting|² candidate
    cost like every banding family member, never all-pairs); ranking is
    TakeOrderedAndProject."""
    from .artifacts import winnowing_index

    fps = winnowing_index(spark, sf_dir)
    a = fps.select(F.col("doc_id").alias("doc_a"), "f")
    b = fps.select(F.col("doc_id").alias("doc_b"), "f")
    return (
        a.join(b, "f")
        .where(F.col("doc_b") > F.col("doc_a"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= _WIN_MIN_SHARED)
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
        .limit(_WIN_TOPK)
    )


# ---------------------------------------------------------------------------
# dedup_winnowing_screen — new-batch-vs-corpus over the fingerprint index
# ---------------------------------------------------------------------------

_WINNOW_SCREEN_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS words
  FROM documents WHERE len(string_split(text, ' ')) >= {_WIN_K + _WIN_W - 1}
),
hs AS (
  SELECT doc_id,
         list_transform(
           range(1, len(words) - {_WIN_K - 2}),
           i -> CAST('0x' || substr(md5(array_to_string(words[i:i+{_WIN_K - 1}], ' ')), 1, 15)
                AS BIGINT)) AS h
  FROM w
),
fp AS (
  SELECT DISTINCT doc_id, f
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(h) - {_WIN_W - 2}),
                                 i -> list_min(h[i:i+{_WIN_W - 1}]))) AS f
    FROM hs
  )
),
dups AS (
  SELECT b.doc_id AS doc_id, count(DISTINCT c.doc_id) AS n
  FROM fp b JOIN fp c ON c.f = b.f
  WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_corpus_matches,
       COALESCE(n, 0) = 0 AS keep
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
LEFT JOIN dups USING (doc_id)
"""


@register("dedup_winnowing_screen", oracle=_WINNOW_SCREEN_ORACLE)
def dedup_winnowing_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental winnowing screen: check a new crawl batch (every 5th
    doc, the ``dedup_incremental_screen`` split) against the existing
    corpus fingerprint index, flagging batch docs that share ANY winnowing
    fingerprint with a corpus doc (``_WIN_SCREEN_MIN_SHARED = 1``) — the
    shape a 100 TB pipeline runs per ingest, where the corpus index is a
    materialized table and only the (tiny) batch is fingerprinted fresh.
    Gating at one shared fingerprint is what lets the screen inherit
    winnowing's theorem across the split: any batch doc sharing a run of
    >= w+k-1 = 6 words with a corpus doc is GUARANTEED to share at least
    one fingerprint (Schleimer et al. 2003), so long verbatim overlap
    cannot slip past. A stricter >= 2-distinct gate (as the ranked-pairs
    ``dedup_winnowing`` uses for precision) would forfeit that guarantee:
    the theorem promises only one shared value, and even longer runs can
    legitimately collapse to one distinct minimum.

    Plan: both sides slice the family's memoized ``winnowing_index``
    artifact (fingerprint selection is per-document, so the corpus-wide
    index restricts to each side exactly — same warm-artifact argument as
    ``dedup_incremental_screen``); the probe is an equi-join on the
    fingerprint value (batch posting lists against corpus posting lists,
    never all-pairs — candidate cost is posting-list-bounded); the match
    count is distinct corpus docs per batch doc (one aggregate, partial
    map-side combine), and every batch doc surfaces through the final
    left join (coverage guard: docs too short to fingerprint — no full
    hash window — carry through with ``n_corpus_matches = 0`` rather than
    vanishing, exactly the rows a screen must NOT silently drop)."""
    from .artifacts import winnowing_index

    fps = winnowing_index(spark, sf_dir)
    batch_fp = fps.where(F.col("doc_id") % 5 == 0)
    corpus_fp = fps.where(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("corpus_id"), "f"
    )
    dups = (
        batch_fp.join(corpus_fp, "f")
        .groupBy("doc_id")
        .agg(F.count_distinct("corpus_id").alias("n"))
    )
    batch_docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 5 == 0)
    )
    return batch_docs.join(dups, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_corpus_matches"),
        (F.coalesce("n", F.lit(0)) == 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# corpus_dedup_rate_curve — redundancy rate per ingest decile (X147)
# ---------------------------------------------------------------------------

_DEDUP_RATE_ORACLE = f"""
WITH pairs AS ({_jaccard_pairs_oracle(k=3, threshold=0.75)}),
dups AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
mx AS (SELECT max(doc_id) AS m FROM documents)
SELECT CAST(d.doc_id * 10 // (mx.m + 1) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN dups.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_redundant,
       CAST(sum(CASE WHEN dups.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS redundant_ppm
FROM documents d CROSS JOIN mx
LEFT JOIN dups ON dups.doc_id = d.doc_id
GROUP BY 1
"""


@register("corpus_dedup_rate_curve", oracle=_DEDUP_RATE_ORACLE)
def corpus_dedup_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redundancy-vs-corpus-growth curve: docs in ingest order (doc_id)
    split into 10 equal-width deciles; per decile, the fraction of docs
    that are near-duplicates (word-3-gram Jaccard >= 0.75) of ANY earlier
    document (a pair partner with a smaller doc_id). This is the crawl-
    budget observable a curation pipeline tracks across snapshots: a
    rising tail says each new crawl slice re-collects what the corpus
    already holds and the marginal token is getting more expensive —
    the per-slice aggregate view of what ``text_ngram_novelty`` measures
    per document.

    Scale: rides the family's memoized ``jaccard_pairs_075`` artifact
    (pairs are already oriented doc_a < doc_b, so "has an earlier
    partner" is just DISTINCT doc_b — no re-orientation pass); the decile
    width comes from a 1-row max(doc_id) frame broadcast onto the doc
    scan (the corpus_perplexity_buckets scalar pattern — constant-size
    IdentityBroadcastMode side, no hash exchange); the rollup is a 10-key
    aggregate with map-side combine. Integer bucket arithmetic and ppm
    division — order-free."""
    from .artifacts import jaccard_pairs_075

    dups = (
        jaccard_pairs_075(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    mx = docs.agg(F.max("doc_id").alias("m"))
    return (
        docs.crossJoin(F.broadcast(mx))
        .join(dups, "doc_id", "left")
        .groupBy(
            F.expr("CAST(doc_id * 10 DIV (m + 1) AS BIGINT)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("is_dup", F.lit(0))).cast("long").alias("n_redundant"),
            F.expr(
                "CAST(sum(coalesce(is_dup, 0)) * 1000000 DIV count(1) AS BIGINT)"
            ).alias("redundant_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_crosslingual_mirror — translation-mirror detection over embeddings
# ---------------------------------------------------------------------------

_XLM_ORACLE = """
WITH mirrors AS (
  SELECT vec_id + 2000000 AS vec_id,
         list_transform(embedding, x -> CAST(x * 1.1 AS FLOAT)) AS embedding
  FROM embeddings WHERE vec_id % 25 = 0
),
samelang AS (
  SELECT vec_id + 3000000 AS vec_id,
         list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT)) AS embedding
  FROM embeddings WHERE vec_id % 40 = 0
),
allv AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id, embedding FROM mirrors
  UNION ALL SELECT vec_id, embedding FROM samelang
),
langs AS (
  SELECT doc_id, lang FROM documents
  UNION ALL
  SELECT doc_id + 2000000, 'x-' || lang FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 3000000, lang FROM documents WHERE doc_id % 40 = 0
),
norms AS (
  SELECT vec_id, embedding,
         sqrt((SELECT sum(CAST(embedding[s.i] AS DOUBLE) * CAST(embedding[s.i] AS DOUBLE))
               FROM (SELECT unnest(range(1, 65)) AS i) s)) AS nrm
  FROM allv
),
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         (SELECT sum(CAST(a.embedding[s.i] AS DOUBLE) * CAST(b.embedding[s.i] AS DOUBLE))
          FROM (SELECT unnest(range(1, 65)) AS i) s) / (a.nrm * b.nrm) AS cos
  FROM norms a JOIN norms b ON a.vec_id < b.vec_id
)
SELECT p.doc_a, p.doc_b, round(p.cos, 3) AS cosine,
       la.lang AS lang_a, lb.lang AS lang_b
FROM pairs p
JOIN langs la ON la.doc_id = p.doc_a
JOIN langs lb ON lb.doc_id = p.doc_b
WHERE p.cos >= 0.95 AND la.lang <> lb.lang
"""


@register("dedup_crosslingual_mirror", oracle=_XLM_ORACLE)
def dedup_crosslingual_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Translation-mirror detection: embedding near-duplicate pairs whose
    documents DISAGREE on language metadata — the cross-lingual dedup pass
    a multilingual crawl pipeline runs (machine-translated mirror sites
    duplicate content across language tags; monolingual text dedup is
    structurally blind to them, but a multilingual embedding space puts a
    document and its translation nearly on top of each other).

    Observability (the planted-pair construction, both engines identical):
    every 25th document gains a 'translation' (embedding scaled 1.1,
    lang 'x-'||lang) and every 40th a SAME-language near-dup (scaled 1.5),
    so the result proves both halves of the predicate — the scaled pairs
    all clear cosine 0.95, but only the language-mismatched ones may
    appear, and the same-language injections must be filtered out. Recall
    on the planted pairs is exact (positive scaling preserves every
    hyperplane sign bit); the corpus's natural pairs top out near 0.51.

    Scale: sign-bit band keys map-side over the unioned corpus, banded
    equi-join candidates, exact cosine on candidates only, language
    metadata joined per matched pair (pair-count-sized, not corpus-sized)
    — no crossJoin anywhere; the all-pairs form exists only inside the
    DuckDB oracle."""
    emb = rebalance(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    allv = (
        emb.unionByName(scaled_float32_injection(emb, mod=25, shift=2000000, factor=1.1))
        .unionByName(scaled_float32_injection(emb, mod=40, shift=3000000, factor=1.5))
        .localCheckpoint(eager=True)  # feeds band keys + both verify sides
    )
    verified = banded_cosine_pairs(allv, threshold=0.95)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    langs = docs.unionByName(
        docs.where(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.lit("x-"), F.col("lang")).alias("lang"),
        )
    ).unionByName(
        docs.where(F.col("doc_id") % 40 == 0).select(
            (F.col("doc_id") + 3000000).alias("doc_id"), "lang"
        )
    )
    la = langs.select(F.col("doc_id").alias("vec_a"), F.col("lang").alias("lang_a"))
    lb = langs.select(F.col("doc_id").alias("vec_b"), F.col("lang").alias("lang_b"))
    return (
        verified.join(la, "vec_a")
        .join(lb, "vec_b")
        .where(F.col("lang_a") != F.col("lang_b"))
        .select(
            F.col("vec_a").alias("doc_a"),
            F.col("vec_b").alias("doc_b"),
            "cosine",
            "lang_a",
            "lang_b",
        )
    )
