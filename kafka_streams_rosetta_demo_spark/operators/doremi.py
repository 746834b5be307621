"""DoReMi-style learned domain mixture weights (Xie et al. 2023, "DoReMi:
Optimizing Data Mixtures Speeds Up Language Model Pretraining") — the
missing member of the mixing family next to the hand-rule weights (epoch
table, temperature, DSIR importance): an optimizer that *derives* per-domain
weights from a measured per-domain proxy-loss signal instead of taking them
as input.

Published algorithm: Group-DRO over domains — a proxy model trains while
domain weights update multiplicatively, ``alpha_t ∝ alpha_{t-1} *
exp(eta * excess_loss_d)``, then mix with uniform smoothing
``alpha = (1-c) * normalized + c * u``; excess loss is the per-domain gap
over a reference model, clamped at zero.

Integer determinism contract (the Bradley–Terry / BPE / unigram replay
discipline): no proxy model trains inside a query, and ``exp`` is
transcendental — so this fit replaces the two non-replayable pieces with
declared integer-exact members of the same family:

- **Loss signal**: the per-domain average bigram NLL in integer micro-nats
  under the corpus's OWN bigram LM (the ``text_lm_logprob`` signal,
  aggregated at source grain) — the proxy-loss stand-in that needs no
  external model. The reference loss is the corpus-wide average; excess is
  the zero-clamped gap, in micro-nats.
- **Multiplicative update**: the linear-payoff Hedge variant
  ``factor_d = 1e6 + (ETA_PPM * excess_d) // 1e6`` (first-order ``exp``,
  the standard multiplicative-weights linearization) so every update is an
  int64 product; normalization uses the overflow-safe two-stage ppm split
  (the ``_ppm_ratio_sql`` identity, which Python's arbitrary-precision
  ``raw * 1_000_000 // tot`` equals exactly), then uniform smoothing in ppm.

Both engines replay the IDENTICAL trajectory: the Spark query collects the
per-domain aggregate (bounded model state — |domains| rows), runs this fit
driver-side, and the DuckDB oracle unrolls the same ``DOREMI_ITERS``
iterations as MATERIALIZED CTEs.

Scale design: corpus work is the bigram explode + the two LM count tables +
ONE per-source aggregate; the fit itself is |domains|-sized model state.
Per-source micro-nat sums stay exact below ~6e11 bigrams per source
(9.2e18 / 15e6 micro-nats) ≈ 4 TB of text per source; past that, quantize
at doc grain first (text_lm_logprob) and aggregate its per-doc sums.
"""

from __future__ import annotations

DOREMI_ITERS = 5  # multiplicative-weight rounds (the unrolled CTE depth)
DOREMI_ETA_PPM = 2_000_000  # eta = 2.0 in ppm — the update step size
DOREMI_SMOOTH_PPM = 100_000  # c = 0.1 uniform smoothing in ppm
MAX_DOREMI_DOMAINS = 4096  # refuse truncated model state past this

# Oracle int64 envelope (ADVICE r13): the normalization CTE evaluates
# ``_ppm_ratio_sql(raw, tot)`` whose intermediates stay below ``tot * 1000``
# — int64-safe for ``tot`` up to ~9.2e15. The binding invariant is NOT the
# domain count: after it0 and after every normalize+smooth round,
# ``sum(w_ppm) <= 1e6`` (each round's weights are floors of ppm shares of a
# 1e6 total, then a convex ppm combination with the uniform table — both
# floor-sum to <= 1e6). Hence
#   tot = sum(w_d * f_d) <= max(f_d) * sum(w_d) <= f_max * 1e6,
# with f_d = 1e6 + ETA_PPM * excess_d // 1e6, so the envelope binds f_max
# <= 9.2e9, i.e. excess_micro <= (9.2e9 - 1e6) * 1e6 // ETA_PPM ~= 4.6e9
# micro-nats — INDEPENDENT of the 4096-domain cap, which therefore only
# bounds collected model state, not overflow. The guard below refuses at
# 4e9 (4000 nats); a real average bigram NLL excess cannot exceed
# ln(total_bigrams) nats (~41 nats even at 1e18 bigrams), so the refusal is
# unreachable on any actual corpus — it exists so that past the envelope
# the Python fit fails as LOUDLY as DuckDB's own int64 overflow error,
# never silently diverging from the oracle's replay.
DOREMI_EXCESS_SAFE_MICRO = 4_000_000_000

# Planted skew (the text_pii_scrub discipline): the synthetic corpus is
# uniform across sources, so both engines append a doc-unique rare-bigram
# tail (' zz zq<doc_id>') to every doc of the sources with number % 5 = 2 —
# 'zz' then conditions on a doc-unique continuation, a ~ln(n_planted_docs)
# micro-nat NLL hit per doc that makes those domains measurably
# high-excess. The fit must move weight toward them (pinned in tests).
DOREMI_SKEW_RESIDUE = 2
DOREMI_SKEW_SQL = (
    "{t} || CASE WHEN CAST(substr(source, 4) AS INT) % 5 = "
    f"{DOREMI_SKEW_RESIDUE}"
    # STRING: the one cast spelling BOTH parsers accept (Spark rejects
    # bare VARCHAR; DuckDB aliases STRING to VARCHAR)
    " THEN ' zz zq' || CAST(doc_id AS STRING) ELSE '' END"
)


def doremi_excess(
    domains: list[tuple[str, int, int]],
) -> tuple[dict[str, int], int, int]:
    """(source, n_bigrams, nll_sum_micro) rows -> (excess_micro per source,
    nll_ref_micro, uniform_ppm). All floor integer divisions on
    non-negative operands, so Spark/DuckDB/Python agree."""
    total_n = sum(n for _, n, _ in domains)
    total_s = sum(s for _, _, s in domains)
    nll_ref = total_s // total_n
    uniform = 1_000_000 // len(domains)
    excess = {src: max(0, s // n - nll_ref) for src, n, s in domains}
    return excess, nll_ref, uniform


def doremi_fit(domains: list[tuple[str, int, int]]) -> dict[str, int]:
    """Run the multiplicative-weights trajectory; returns the final
    source -> weight_ppm map. ``raw * 1_000_000 // tot`` in Python equals
    the SQL two-stage split exactly (the split is an algebraic
    decomposition of the same floor — see _ppm_ratio_sql's docstring)."""
    if len(domains) > MAX_DOREMI_DOMAINS:
        raise ValueError(
            f"domain table exceeds {MAX_DOREMI_DOMAINS} rows; "
            "bucket the domain key first"
        )
    excess, _, uniform = doremi_excess(domains)
    worst = max(excess.values())
    if worst > DOREMI_EXCESS_SAFE_MICRO:
        # mirror the oracle's failure mode: past the documented envelope
        # DuckDB's replay raises on int64 overflow — refuse loudly here too
        raise ValueError(
            f"excess_micro {worst} exceeds the oracle int64 envelope "
            f"({DOREMI_EXCESS_SAFE_MICRO}); quantize the loss signal first"
        )
    w = {src: uniform for src, _, _ in domains}
    for _ in range(DOREMI_ITERS):
        raw = {
            src: w[src]
            * (1_000_000 + DOREMI_ETA_PPM * excess[src] // 1_000_000)
            for src in w
        }
        tot = sum(raw.values())
        w = {
            src: (
                (1_000_000 - DOREMI_SMOOTH_PPM) * (raw[src] * 1_000_000 // tot)
                + DOREMI_SMOOTH_PPM * uniform
            )
            // 1_000_000
            for src in w
        }
    return w


def doremi_oracle_iters(iters: int = DOREMI_ITERS) -> str:
    """CTE chain replaying the fit: expects ``ex`` (source, n_bigrams,
    nll_micro, excess_micro, uniform_ppm) to exist; emits ``it{iters}``
    (source, w_ppm). Each round is two CTEs — the raw multiplicative
    update, then normalize (two-stage ppm split against the cross-joined
    total) + smooth."""
    from ..queries.corpus_queries import _ppm_ratio_sql

    parts = [
        """it0 AS MATERIALIZED (
  SELECT source, excess_micro, uniform_ppm,
         CAST(uniform_ppm AS BIGINT) AS w_ppm
  FROM ex
)"""
    ]
    for t in range(1, iters + 1):
        norm = _ppm_ratio_sql("raw", "tot")
        parts.append(
            f"""r{t} AS MATERIALIZED (
  SELECT source, excess_micro, uniform_ppm,
         w_ppm * (1000000 + {DOREMI_ETA_PPM} * excess_micro // 1000000)
           AS raw
  FROM it{t - 1}
),
it{t} AS MATERIALIZED (
  SELECT source, excess_micro, uniform_ppm,
         CAST(((1000000 - {DOREMI_SMOOTH_PPM}) * {norm}
               + {DOREMI_SMOOTH_PPM} * uniform_ppm) // 1000000 AS BIGINT)
           AS w_ppm
  FROM r{t} CROSS JOIN (SELECT sum(raw) AS tot FROM r{t}) t{t}
)"""
        )
    return ",\n".join(parts)
