"""Round-14 second-wave pins: the five new queries.

- ``text_line_dedup`` — C4-style global keep-first paragraph dedup: the
  cross-source footer collapses to ONE survivor per source, the doc-unique
  rare paragraph always survives, totals reconcile with the distinct
  paragraph space.
- ``text_gopher_quality`` — every one of the five named rules has live
  pass AND fail paths (no vacuous rule), and the first-failed verdict is
  consistent with the per-rule flags.
- ``annotator_fleiss_kappa`` — the integer-ppm kappa matches an
  independent float reference computed from the same md5 votes.
- ``streaming_url_dedup_screen`` / ``streaming_classifier_monitor`` —
  row-for-row parity with their batch twins (the screen-equals-batch
  discipline).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from .oracle_check import compare


# ---------------------------------------------------------------------------
# text_line_dedup
# ---------------------------------------------------------------------------


def test_line_dedup_matches_oracle(spark, sf_smoke):
    from kafka_streams_rosetta_demo_spark.queries import load_all

    q = load_all()["text_line_dedup"]
    compare(q.fn(spark, sf_smoke), q.oracle, sf_smoke)


def test_line_dedup_keep_first_structure(spark, sf_correctness):
    """The footer (planted in ~90% of docs, per-source text) must survive
    exactly ONCE per source that has any footer doc; the doc-unique rare
    paragraph must always survive; and the kept-paragraph total must equal
    the number of distinct paragraphs in the corpus (keep-first keeps one
    of each, by definition)."""
    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
        boilerplate_paras,
    )
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    docs = load_table(spark, sf_correctness, "documents").select(
        "doc_id", "source", "text"
    )
    out = load_all()["text_line_dedup"].fn(spark, sf_correctness).collect()

    # totals reconcile per doc
    for r in out:
        assert r["n_kept"] + r["n_dropped"] == r["n_paras"]
        assert r["rare_kept"] == (r["doc_id"] % 25 == 3)

    # one footer survivor per source that has >= 1 footer-carrying doc
    footer_sources = {
        r["source"]
        for r in docs.where("doc_id % 10 != 7").select("source").distinct().collect()
    }
    keepers = [r for r in out if r["footer_kept"]]
    assert len(keepers) == len(footer_sources)
    assert {r["source"] for r in keepers} == footer_sources
    # the survivor is the globally-earliest footer doc of its source
    first_footer = {
        r["source"]: r["lo"]
        for r in docs.where("doc_id % 10 != 7")
        .groupBy("source")
        .agg(F.min("doc_id").alias("lo"))
        .collect()
    }
    for r in keepers:
        assert r["doc_id"] == first_footer[r["source"]]

    # global conservation: kept == |distinct paragraph hashes|
    n_distinct = (
        boilerplate_paras(docs).select("ph").distinct().count()
    )
    assert sum(r["n_kept"] for r in out) == n_distinct
    assert sum(r["n_dropped"] for r in out) > 0  # the pass actually dropped


# ---------------------------------------------------------------------------
# text_gopher_quality
# ---------------------------------------------------------------------------

_GOPHER_RULES = (
    "r_word_count",
    "r_mean_word_len",
    "r_alpha_frac",
    "r_symbol_ratio",
    "r_stopwords",
)


def test_gopher_matches_oracle(spark, sf_smoke):
    from kafka_streams_rosetta_demo_spark.queries import load_all

    q = load_all()["text_gopher_quality"]
    compare(q.fn(spark, sf_smoke), q.oracle, sf_smoke)


def test_gopher_no_vacuous_rule(spark, sf_correctness):
    """Every rule must have at least one passing AND one failing document
    (the planted classes make the three synthetic-corpus-vacuous rules
    live), and the first-failed verdict must agree with the flags."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    rows = load_all()["text_gopher_quality"].fn(spark, sf_correctness).collect()
    for rule in _GOPHER_RULES:
        fails = [r for r in rows if not r[rule]]
        passes = [r for r in rows if r[rule]]
        assert fails and passes, f"{rule} is vacuous"
    order = {
        "r_word_count": "word_count",
        "r_mean_word_len": "mean_word_len",
        "r_alpha_frac": "alpha_frac",
        "r_symbol_ratio": "symbol_ratio",
        "r_stopwords": "stopwords",
    }
    for r in rows:
        assert r["keep"] == all(r[k] for k in _GOPHER_RULES)
        expected = next(
            (order[k] for k in _GOPHER_RULES if not r[k]), "none"
        )
        assert r["first_failed"] == expected
    # each planted class hits its targeted rule — pinned on docs in exactly
    # ONE class (overlap docs compose: e.g. the 'x' padding of % 17 = 9 is
    # alphabetic and can outweigh the numeric junk of % 11 = 4)
    hit = {"r_alpha_frac": 0, "r_mean_word_len": 0, "r_symbol_ratio": 0}
    for r in rows:
        classes = [r["doc_id"] % 11 == 4, r["doc_id"] % 17 == 9, r["doc_id"] % 13 == 6]
        if sum(classes) != 1:
            continue
        if classes[0]:
            assert not r["r_alpha_frac"]
            hit["r_alpha_frac"] += 1
        elif classes[1]:
            assert not r["r_mean_word_len"]
            hit["r_mean_word_len"] += 1
        else:
            assert not r["r_symbol_ratio"]
            hit["r_symbol_ratio"] += 1
    assert all(v > 0 for v in hit.values()), hit


# ---------------------------------------------------------------------------
# annotator_fleiss_kappa
# ---------------------------------------------------------------------------


def _python_votes(sf_dir: str):
    """Independent vote replay: same md5 residues, plain Python ints."""
    import duckdb

    from kafka_streams_rosetta_demo_spark.queries.pipeline_queries import (
        _FLEISS_FLIP_PCT_STEP,
        _FLEISS_RATERS,
    )

    rows = duckdb.connect().execute(
        f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    nl = max(label for _, label in rows) + 1
    votes = []
    for vec_id, label in rows:
        for k in range(_FLEISS_RATERS):
            h = int(hashlib.md5(f"{vec_id}:{k}".encode()).hexdigest()[:15], 16)
            if h % 100 < k * _FLEISS_FLIP_PCT_STEP:
                cat = (label + 1 + (h // 100) % (nl - 1)) % nl
            else:
                cat = label
            votes.append((vec_id, cat))
    return votes


def test_fleiss_matches_oracle(spark, sf_smoke):
    from kafka_streams_rosetta_demo_spark.queries import load_all

    q = load_all()["annotator_fleiss_kappa"]
    compare(q.fn(spark, sf_smoke), q.oracle, sf_smoke)


def test_fleiss_matches_float_reference(spark, sf_correctness):
    """The integer-ppm kappa must sit within quantization distance of the
    float Fleiss kappa computed from the same votes (the DoReMi
    float-Hedge-reference discipline), and the vote table must reconcile:
    sum of assignments == raters * items."""
    from collections import Counter, defaultdict

    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.queries.pipeline_queries import (
        _FLEISS_RATERS,
    )

    rows = load_all()["annotator_fleiss_kappa"].fn(spark, sf_correctness).collect()
    votes = _python_votes(sf_correctness)
    per_item = defaultdict(Counter)
    for vec_id, cat in votes:
        per_item[vec_id][cat] += 1
    n = _FLEISS_RATERS
    n_items = len(per_item)
    p_i = [
        (sum(c * c for c in cnt.values()) - n) / (n * (n - 1))
        for cnt in per_item.values()
    ]
    pbar = sum(p_i) / n_items
    totals = Counter()
    for cnt in per_item.values():
        totals.update(cnt)
    p_c = {c: v / (n * n_items) for c, v in totals.items()}
    pe = sum(v * v for v in p_c.values())
    kappa = (pbar - pe) / (1 - pe)

    assert len(rows) == len(totals)
    assert sum(r["n_assigned"] for r in rows) == n * n_items
    for r in rows:
        assert r["n_items"] == n_items
        assert r["n_assigned"] == totals[r["category"]]
        assert abs(r["kappa_ppm"] / 1e6 - kappa) < 2e-3
        assert abs(r["pbar_ppm"] / 1e6 - pbar) < 2e-3
        assert abs(r["pe_ppm"] / 1e6 - pe) < 2e-3
    # the panel is 0/15/30% noisy around a gold rater: agreement must be
    # real (far above chance), not accidental
    assert rows[0]["kappa_ppm"] > 400_000


# ---------------------------------------------------------------------------
# streaming twins: row-for-row parity with their batch sides
# ---------------------------------------------------------------------------


def test_url_screen_matches_batch_keepers(spark, sf_smoke):
    """The streaming survivors must BE the batch keeper set: one row per
    canonical URL, the original (pre-shift) doc id, never a re-crawl."""
    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
        URL_RECRAWL_SHIFT,
        url_canonicalize,
        url_crawl_frame,
    )
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    out = load_all()["streaming_url_dedup_screen"].fn(spark, sf_smoke).collect()
    assert out, "empty screen output"
    assert all(r["doc_id"] < URL_RECRAWL_SHIFT for r in out)

    docs = load_table(spark, sf_smoke, "documents")
    batch = (
        url_crawl_frame(docs)
        .select("doc_id", "domain", url_canonicalize(F.col("url")).alias("url"))
        .groupBy("url")
        .agg(F.min("doc_id").alias("doc_id"), F.min("domain").alias("domain"))
        .collect()
    )
    assert sorted((r["doc_id"], r["domain"], r["url"]) for r in out) == sorted(
        (r["doc_id"], r["domain"], r["url"]) for r in batch
    )


def test_classifier_monitor_matches_batch(spark, sf_smoke):
    """The continuous grade must equal the release grade row for row."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    mon = sorted(
        map(tuple, qs["streaming_classifier_monitor"].fn(spark, sf_smoke).collect())
    )
    batch = sorted(
        map(tuple, qs["classifier_confusion_eval"].fn(spark, sf_smoke).collect())
    )
    assert mon == batch


# ---------------------------------------------------------------------------
# fourth wave: PR curve, robots compliance, gopher ingest screen
# ---------------------------------------------------------------------------


def test_pr_curve_matches_oracle_and_reconciles(spark, sf_smoke):
    """Parity, plus cross-query reconciliation: the curve's final
    cumulative TP must equal the confusion eval's total positives
    (sum of tp+fn over languages — same 'good' definition), and recall
    must be monotone along descending cells ending at 1e6."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    q = qs["classifier_pr_curve"]
    compare(q.fn(spark, sf_smoke), q.oracle, sf_smoke)

    rows = sorted(q.fn(spark, sf_smoke).collect(), key=lambda r: -r["cell"])
    cm = qs["classifier_confusion_eval"].fn(spark, sf_smoke).collect()
    total_pos = sum(r["tp"] + r["fn"] for r in cm)
    assert rows[-1]["cum_tp"] == total_pos
    assert rows[-1]["recall_ppm"] == 1_000_000
    last = -1
    for r in rows:
        assert r["recall_ppm"] >= last
        last = r["recall_ppm"]
        assert r["cum_tp"] + r["cum_fp"] >= 1


def test_robots_compliance_structure(spark, sf_correctness):
    """site6's rule names a nonexistent source (zero-hit class), site0's
    Allow exception fires, and every domain's disallowed count reconciles
    with the planted rule: fetches of src{s+14} minus exceptions."""
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
        url_crawl_frame,
    )
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    q = load_all()["crawl_robots_compliance"]
    compare(q.fn(spark, sf_correctness), q.oracle, sf_correctness)
    out = {r["domain"]: r for r in q.fn(spark, sf_correctness).collect()}

    docs = load_table(spark, sf_correctness, "documents")
    frame = url_crawl_frame(docs)
    per = {
        (r["domain"], r["source"]): r["c"]
        for r in frame.withColumn(
            "source", F.regexp_extract("url", "/(src[0-9]+)/", 1)
        )
        .groupBy("domain", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    dom_totals = {}
    for (d, s), c in per.items():
        dom_totals[d] = dom_totals.get(d, 0) + c

    s6 = out["site6.example.com"]
    assert s6["n_disallowed"] == 0 and s6["n_exception_allowed"] == 0
    assert out["site0.example.com"]["n_exception_allowed"] > 0
    for s in range(6):
        d = f"site{s}.example.com"
        r = out[d]
        banned = per.get((d, f"src{s + 14}"), 0)
        assert r["n_disallowed"] == banned - r["n_exception_allowed"]
        assert r["n_fetches"] == dom_totals[d]
        assert (
            r["n_unmatched"]
            == r["n_fetches"] - r["n_disallowed"] - r["n_exception_allowed"]
        )
        assert r["violation_ppm"] == r["n_disallowed"] * 1_000_000 // r["n_fetches"]


def test_gopher_screen_matches_batch(spark, sf_smoke):
    """The ingest verdicts must equal the batch gate's row for row."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    mon = sorted(
        map(tuple, qs["streaming_gopher_screen"].fn(spark, sf_smoke).collect())
    )
    batch = sorted(
        map(tuple, qs["text_gopher_quality"].fn(spark, sf_smoke).collect())
    )
    assert mon == batch


# ---------------------------------------------------------------------------
# fifth wave: robots ingest screen, streaming ROC monitor
# ---------------------------------------------------------------------------


def test_robots_screen_matches_batch(spark, sf_smoke):
    """The continuous compliance table must equal the batch audit's row
    for row (same verdicts, same rollup)."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    mon = sorted(
        map(tuple, qs["streaming_robots_screen"].fn(spark, sf_smoke).collect())
    )
    batch = sorted(
        map(tuple, qs["crawl_robots_compliance"].fn(spark, sf_smoke).collect())
    )
    assert mon == batch


def test_roc_monitor_matches_batch(spark, sf_smoke):
    """The streaming-state AUC must equal the batch gate exactly — same
    cells, same Mann-Whitney arithmetic."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    mon = qs["streaming_roc_monitor"].fn(spark, sf_smoke).collect()
    batch = qs["classifier_roc_auc"].fn(spark, sf_smoke).collect()
    assert sorted(map(tuple, mon)) == sorted(map(tuple, batch))
    assert mon[0]["auc_ppm"] > 500_000  # ranking signal survives the stream
