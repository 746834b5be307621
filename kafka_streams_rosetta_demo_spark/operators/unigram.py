"""Unigram-LM (SentencePiece-style) tokenizer trainer — the standard
alternative to BPE (Kudo 2018, "Subword Regularization: Improving Neural
Network Translation Models with Multiple Subword Candidates"; the algorithm
SentencePiece's default `--model_type=unigram` implements). Where BPE GROWS
a vocabulary bottom-up by merging, unigram-LM SHRINKS one top-down: seed a
large candidate vocabulary (frequent substrings), alternate between
segmenting the corpus with the current vocabulary and re-estimating piece
scores from usage, and prune the weakest pieces until the target size.

Integer determinism contract (what makes the DuckDB oracle exact): the
published algorithm scores segmentations by float log-likelihood under EM —
transcendental math that no cross-engine replay can pin bit-for-bit. This
trainer runs the same seed → segment → re-count → prune loop on exact
integers by replacing soft-EM with HARD (Viterbi) EM under an MDL-style
objective:

- **Viterbi objective**: fewest pieces first (the description-length term
  that dominates the unigram likelihood when piece probabilities are
  within a few orders of magnitude), ties broken by the LARGEST sum of
  current piece counts (the frequency term), then by the smallest
  predecessor split position — a total order on integers, so both engines
  pick the identical segmentation for every word.
- **E-step counts** are plain weighted integer occurrence counts of each
  piece in the Viterbi segmentations (word frequency × uses).
- **Prune** keeps the top ``UNI_KEEP`` multi-char pieces by
  (count desc, piece asc) with count >= ``UNI_MIN_COUNT``; single
  characters are NEVER pruned (the coverage guarantee SentencePiece keeps
  via required_chars), so every word stays segmentable at every step.

The divergence from Kudo 2018 is declared, not hidden: hard-EM +
fewest-pieces is the integer-exact member of the same algorithm family
(Viterbi-EM is the standard hard variant; SentencePiece itself ships
Viterbi inference), chosen so the oracle can replay the ENTIRE training
trajectory — seed scoring, every per-word DP cell, every prune — as
unrolled MATERIALIZED CTEs (the bpe_oracle_with / Bradley–Terry replay
discipline).

Scale design (the text_bpe_train shape): the only corpus-wide pass is the
word-frequency aggregate (map-side combining, capped at VOCAB_CAP rows by
(count desc, word asc) — bounded model state); training itself is
driver-side pure-integer Python over that table. Words longer than
``UNI_MAX_WLEN`` chars are excluded from the trainer's bounded state in
BOTH engines (the documented bound that fixes the oracle's DP unroll
depth; segmentation/INFERENCE has no such bound).
"""

from __future__ import annotations

import pandas as pd

UNI_MAX_WLEN = 12  # trainer word-length bound = the oracle's DP unroll depth
UNI_SUB_MAX = 4  # seed substrings span 2..4 chars
UNI_SEEDS = 48  # multi-char candidates kept at seeding
UNI_KEEP = 32  # multi-char pieces kept per prune
UNI_MIN_COUNT = 2  # prune floor
UNI_ITERS = 3  # hard-EM rounds


def seed_vocab(word_counts: list[tuple[str, int]]) -> dict[str, int]:
    """Candidate vocabulary: every character (coverage, never pruned) plus
    the top ``UNI_SEEDS`` substrings of length 2..``UNI_SUB_MAX`` by
    (summed word frequency desc, substring asc)."""
    subs: dict[str, int] = {}
    chars: dict[str, int] = {}
    for w, c in word_counts:
        for i in range(len(w)):
            ch = w[i]
            chars[ch] = chars.get(ch, 0) + c
            for l in range(2, UNI_SUB_MAX + 1):
                if i + l <= len(w):
                    s = w[i : i + l]
                    subs[s] = subs.get(s, 0) + c
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_SEEDS]
    vocab = dict(top)
    vocab.update(chars)  # multi-char and single-char keys never collide
    return vocab


class UncoveredWord(ValueError):
    """A word whose characters are not all present in the vocabulary —
    impossible during training (single chars from the training table are
    never pruned) but reachable at INFERENCE when a corpus word outside the
    capped training table carries a character the cap excluded."""


def viterbi_segment(word: str, vocab: dict[str, int]) -> list[str]:
    """Best segmentation under the integer MDL objective: fewest pieces,
    then largest count sum, then smallest predecessor position at each DP
    cell — the exact comparator the oracle's ``ORDER BY n ASC, s + c DESC,
    i ASC`` window replays."""
    cells: list[tuple[int, int, list[str]] | None] = [None] * (len(word) + 1)
    cells[0] = (0, 0, [])
    for j in range(1, len(word) + 1):
        best_key = None
        best_path = None
        for i in range(j):
            cell = cells[i]
            if cell is None:
                continue
            piece = word[i:j]
            c = vocab.get(piece)
            if c is None:
                continue
            n, s, path = cell
            key = (n, -(s + c), i)
            if best_key is None or key < best_key:
                best_key = key
                best_path = path + [piece]
        if best_key is not None:
            cells[j] = (best_key[0] + 1, -best_key[1], best_path)
    final = cells[len(word)]
    if final is None:
        raise UncoveredWord(
            f"uncovered word (chars missing from vocab): {word!r}"
        )
    return final[2]


def train_unigram(
    word_counts: list[tuple[str, int]],
    iters: int = UNI_ITERS,
) -> dict[str, int]:
    """Run the hard-EM loop; returns the final piece -> count vocabulary
    (single chars always present, possibly with count 0)."""
    wc = [(w, c) for w, c in word_counts if 0 < len(w) <= UNI_MAX_WLEN]
    all_chars = {ch for w, _ in wc for ch in w}
    vocab = seed_vocab(wc)
    for _ in range(iters):
        counts: dict[str, int] = {}
        for w, c in wc:
            for piece in viterbi_segment(w, vocab):
                counts[piece] = counts.get(piece, 0) + c
        multi = [
            (p, n)
            for p, n in counts.items()
            if len(p) > 1 and n >= UNI_MIN_COUNT
        ]
        top = sorted(multi, key=lambda kv: (-kv[1], kv[0]))[:UNI_KEEP]
        vocab = dict(top)
        for ch in all_chars:
            vocab[ch] = counts.get(ch, 0)
    return vocab


# ---------------------------------------------------------------------------
# Oracle SQL generation — the unrolled training recurrence
# ---------------------------------------------------------------------------


def unigram_oracle_with(
    iters: int = UNI_ITERS,
    max_wlen: int = UNI_MAX_WLEN,
    cap: int | None = None,
) -> str:
    """WITH-clause body replaying unigram training in DuckDB SQL. Per
    hard-EM round ``t``: DP cells unroll position-by-position
    (``b{j}_t`` = best cell ending at position j, ``c{j}_t`` = all cells
    so far — MATERIALIZED, each is read twice), the final cell's carried
    piece list is the segmentation (no backtrace pass), usage counts
    aggregate over the unnested lists, and the prune window builds
    ``vocab{t+1}``. The final ``vocab{iters+1}`` is the trainer's output
    state."""
    if cap is None:
        from .bpe import VOCAB_CAP

        cap = VOCAB_CAP
    parts = [
        f"""wc0 AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
wt AS MATERIALIZED (
  SELECT word, cnt FROM (
    SELECT word, cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rk
    FROM wc0
  ) WHERE rk <= {cap} AND length(word) <= {max_wlen}
),
subs AS (
  SELECT substr(w.word, p.i, l.l) AS piece, CAST(sum(w.cnt) AS BIGINT) AS c
  FROM wt w
  CROSS JOIN (SELECT unnest(range(1, {max_wlen + 1})) AS i) p
  CROSS JOIN (SELECT unnest(range(2, {UNI_SUB_MAX + 1})) AS l) l
  WHERE p.i + l.l - 1 <= length(w.word)
  GROUP BY 1
),
chars AS MATERIALIZED (
  SELECT substr(w.word, p.i, 1) AS piece, CAST(sum(w.cnt) AS BIGINT) AS c
  FROM wt w
  CROSS JOIN (SELECT unnest(range(1, {max_wlen + 1})) AS i) p
  WHERE p.i <= length(w.word)
  GROUP BY 1
),
vocab1 AS MATERIALIZED (
  SELECT piece, c FROM (
    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece ASC) AS rk
    FROM subs
  ) WHERE rk <= {UNI_SEEDS}
  UNION ALL
  SELECT piece, c FROM chars
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""b0_{t} AS (
  SELECT word, cnt, 0 AS i, 0 AS n, CAST(0 AS BIGINT) AS s,
         CAST([] AS VARCHAR[]) AS path
  FROM wt
),
c0_{t} AS MATERIALIZED (SELECT * FROM b0_{t})"""
        )
        for j in range(1, max_wlen + 1):
            parts.append(
                f"""b{j}_{t} AS MATERIALIZED (
  SELECT word, cnt, {j} AS i, n, s, path FROM (
    SELECT c.word, c.cnt, c.n + 1 AS n, c.s + v.c AS s,
           list_append(c.path, v.piece) AS path,
           row_number() OVER (PARTITION BY c.word
                              ORDER BY c.n ASC, c.s + v.c DESC, c.i ASC)
             AS rn
    FROM c{j - 1}_{t} c
    JOIN vocab{t} v ON v.piece = substr(c.word, c.i + 1, {j} - c.i)
    WHERE length(c.word) >= {j}
  ) WHERE rn = 1
),
c{j}_{t} AS MATERIALIZED (
  SELECT * FROM c{j - 1}_{t} UNION ALL SELECT * FROM b{j}_{t}
)"""
            )
        parts.append(
            f"""cnts{t} AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, unnest(path) AS piece
    FROM c{max_wlen}_{t} WHERE i = length(word)
  ) GROUP BY piece
),
vocab{t + 1} AS MATERIALIZED (
  SELECT piece, c FROM (
    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece ASC) AS rk
    FROM cnts{t} WHERE length(piece) > 1 AND c >= {UNI_MIN_COUNT}
  ) WHERE rk <= {UNI_KEEP}
  UNION ALL
  SELECT ch.piece, coalesce(ct.c, CAST(0 AS BIGINT)) AS c
  FROM chars ch LEFT JOIN cnts{t} ct ON ct.piece = ch.piece
)"""
        )
    return ",\n".join(parts)


def unigram_oracle_vocab(iters: int = UNI_ITERS) -> str:
    """Full oracle query for the trained vocabulary table."""
    return f"""WITH {unigram_oracle_with(iters)}
SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len,
       c AS piece_count,
       CAST(row_number() OVER (ORDER BY c DESC, piece ASC) AS BIGINT)
         AS token_id,
       length(piece) = 1 AS is_char
FROM vocab{iters + 1}"""


def segment_count(word: str, vocab: dict[str, int]) -> int:
    """INFERENCE token count: Viterbi piece count for words the trainer
    could have seen (len <= UNI_MAX_WLEN), character count for longer words
    (the documented fallback — the trainer never saw them, and the bound is
    what fixes the oracle's DP unroll depth; a production deployment covers
    them with byte-fallback pieces the same way SentencePiece does).
    A <= UNI_MAX_WLEN word whose characters are not all vocabulary-covered
    (possible when the capped training table excluded every word carrying
    that character) takes the SAME character fallback — mirrored in the
    oracle's ``uwt`` uncovered branch so both engines agree on the failure
    mode instead of engine-crash vs oracle-silent-drop."""
    if len(word) > UNI_MAX_WLEN:
        return len(word)
    try:
        return len(viterbi_segment(word, vocab))
    except UncoveredWord:
        return len(word)


def unigram_token_count_udf(spark, vocab: dict[str, int]):
    """Arrow-batched (word -> unigram token count) surface: broadcast
    vocabulary, per-batch memo — the bpe_token_count_udf shape, applied
    once per DISTINCT word by the artifact builder, never per occurrence."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(dict(vocab))

    @pandas_udf("long")
    def n_unigram_tokens(words: pd.Series) -> pd.Series:
        v = bc.value
        memo: dict[str, int] = {}

        def enc(w: str) -> int:
            got = memo.get(w)
            if got is None:
                got = memo[w] = segment_count(w, v)
            return got

        return words.map(enc)

    return n_unigram_tokens


def unigram_oracle_infer_counts(
    iters: int = UNI_ITERS, max_wlen: int = UNI_MAX_WLEN
) -> str:
    """CTE chain segmenting EVERY distinct corpus word (``iw``) with the
    final trained vocabulary ``vocab{iters+1}`` — the inference twin of the
    training DP, without path lists (only the piece count travels). Words
    longer than ``max_wlen`` take the character fallback, closed-form, and
    so do short words whose DP never completes (a character the capped
    training table never covered) — the explicit uncovered branch that
    mirrors :func:`segment_count`'s fallback, so neither engine crashes or
    silently drops where the other doesn't. Append after
    :func:`unigram_oracle_with`; exposes ``uwt`` (word, n_toks)."""
    v = f"vocab{iters + 1}"
    parts = [
        """iw AS (
  SELECT DISTINCT w AS word
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)""",
        f"""g0 AS (
  SELECT word, 0 AS i, 0 AS n, CAST(0 AS BIGINT) AS s
  FROM iw WHERE length(word) <= {max_wlen}
)""",
    ]
    for j in range(1, max_wlen + 1):
        parts.append(
            f"""f{j} AS MATERIALIZED (
  SELECT word, {j} AS i, n, s FROM (
    SELECT c.word, c.n + 1 AS n, c.s + v.c AS s,
           row_number() OVER (PARTITION BY c.word
                              ORDER BY c.n ASC, c.s + v.c DESC, c.i ASC)
             AS rn
    FROM g{j - 1} c
    JOIN {v} v ON v.piece = substr(c.word, c.i + 1, {j} - c.i)
    WHERE length(c.word) >= {j}
  ) WHERE rn = 1
),
g{j} AS MATERIALIZED (
  SELECT * FROM g{j - 1} UNION ALL SELECT * FROM f{j}
)"""
        )
    parts.append(
        f"""uwt AS (
  SELECT word, CAST(n AS BIGINT) AS n_toks
  FROM g{max_wlen} WHERE i = length(word)
  UNION ALL
  SELECT word, CAST(length(word) AS BIGINT) AS n_toks
  FROM iw WHERE length(word) > {max_wlen}
  UNION ALL
  SELECT i2.word, CAST(length(i2.word) AS BIGINT) AS n_toks
  FROM iw i2
  WHERE length(i2.word) <= {max_wlen}
    AND NOT EXISTS (SELECT 1 FROM g{max_wlen} g
                    WHERE g.word = i2.word AND g.i = length(i2.word))
)"""
    )
    return ",\n".join(parts)
