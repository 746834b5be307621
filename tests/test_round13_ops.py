"""Round-13 additions: the C4 blocklist scrub's planted invariants, the
unigram streaming twin's batch-parity, the DoReMi mixture fit, and the
domain snapshot diff."""

from __future__ import annotations


# ---------------------------------------------------------------------------
# text_blocklist_scrub: planted hits provably flagged, clean docs pass
# ---------------------------------------------------------------------------


def test_blocklist_scrub_flags_planted_terms_only(spark, sf_smoke):
    """The done-criterion made executable: every planted residue doc is
    flagged with exactly its planted hit/term counts, every clean doc
    passes (keep=true, zero hits), and the never-planted term 'phish'
    never fires — word-grain exact matching, no substring false
    positives."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["text_blocklist_scrub"].fn(spark, sf_smoke).collect()
    assert out
    classes = {"clean": 0, "spam": 0, "gamble": 0, "multi": 0}
    for r in out:
        d = r["doc_id"]
        exp_hits, exp_terms = 0, []
        if d % 10 == 3:
            exp_hits += 2
            exp_terms.append("spam")
        if d % 10 == 7:
            exp_hits += 1
            exp_terms.append("gamble")
        if d % 100 == 23:
            exp_hits += 1
            exp_terms.append("exploit")
        assert r["n_hits"] == exp_hits, r
        assert r["n_terms"] == len(exp_terms), r
        assert r["terms_hit"] == ",".join(sorted(exp_terms)), r
        assert r["keep"] == (exp_hits == 0), r
        assert "phish" not in r["terms_hit"]
        if exp_hits == 0:
            classes["clean"] += 1
        elif d % 100 == 23:
            classes["multi"] += 1
        elif d % 10 == 3:
            classes["spam"] += 1
        else:
            classes["gamble"] += 1
    # non-vacuity: every planted class must actually occur in the corpus
    assert all(v > 0 for v in classes.values()), classes


# ---------------------------------------------------------------------------
# streaming_unigram_token_rate: the continuous path equals the batch table
# ---------------------------------------------------------------------------


def test_streaming_unigram_rate_matches_batch_fertility(spark, sf_smoke):
    """The streaming monitor's compacted totals must equal the batch
    fertility table row-for-row (same sources, same totals, same ppm
    splits) — the proof the micro-batch state fold computes the identical
    result, not merely a similar one."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    stream = {
        r["source"]: r
        for r in qs["streaming_unigram_token_rate"].fn(spark, sf_smoke).collect()
    }
    batch = {
        r["source"]: r
        for r in qs["text_unigram_fertility"].fn(spark, sf_smoke).collect()
    }
    assert set(stream) == set(batch) and stream
    for src, b in batch.items():
        s = stream[src]
        for c in (
            "n_words",
            "n_unigram_tokens",
            "fertility_ppm",
            "chars_per_token_ppm",
        ):
            assert s[c] == b[c], (src, c, s[c], b[c])


# ---------------------------------------------------------------------------
# corpus_mixture_doremi: learned weights move toward the planted skew
# ---------------------------------------------------------------------------


def test_doremi_weights_move_toward_high_excess_domains(spark, sf_smoke):
    """The done-criterion made executable: every planted-skew source
    (number % 5 = 2 — the rare-bigram tail raises its NLL) must end with
    positive excess and MORE than uniform weight; every clean source must
    end at-or-below uniform; the ppm weights stay a (sub-)distribution
    (normalization dust only ever loses mass)."""
    from kafka_streams_rosetta_demo_spark.operators.doremi import (
        DOREMI_SKEW_RESIDUE,
    )
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["corpus_mixture_doremi"].fn(spark, sf_smoke).collect()
    assert out
    planted = [
        r for r in out if int(r["source"][3:]) % 5 == DOREMI_SKEW_RESIDUE
    ]
    clean = [
        r for r in out if int(r["source"][3:]) % 5 != DOREMI_SKEW_RESIDUE
    ]
    assert planted and clean  # non-vacuity: both classes exist
    for r in planted:
        assert r["excess_micro"] > 0, r
        assert r["weight_ppm"] > r["uniform_ppm"], r
        assert r["delta_ppm"] == r["weight_ppm"] - r["uniform_ppm"]
    for r in clean:
        assert r["weight_ppm"] <= r["uniform_ppm"], r
    total = sum(r["weight_ppm"] for r in out)
    assert 900_000 <= total <= 1_000_000, total
    # the learned mix concentrates: planted mass strictly exceeds its
    # uniform share after 5 rounds
    planted_mass = sum(r["weight_ppm"] for r in planted)
    assert planted_mass > len(planted) * out[0]["uniform_ppm"]


# ---------------------------------------------------------------------------
# corpus_domain_snapshot_diff: the four CDC classes reconcile per domain
# ---------------------------------------------------------------------------


def test_domain_snapshot_diff_classes_reconcile(spark, sf_smoke):
    """Per domain: the four classes partition both snapshots
    (docs_a = removed + changed + unchanged, docs_b = added + changed +
    unchanged), every class is live somewhere (the residue construction
    plants all four), the token delta equals adds minus removals plus
    exactly 2 per changed doc, and churn is the exact ppm split."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["corpus_domain_snapshot_diff"].fn(spark, sf_smoke).collect()
    assert out
    for r in out:
        assert r["docs_a"] == (
            r["removed_docs"] + r["changed_docs"] + r["unchanged_docs"]
        ), r
        assert r["docs_b"] == (
            r["added_docs"] + r["changed_docs"] + r["unchanged_docs"]
        ), r
        assert r["token_delta"] == r["tokens_b"] - r["tokens_a"]
        churn = r["added_docs"] + r["removed_docs"] + r["changed_docs"]
        assert r["churn_ppm"] == churn * 1_000_000 // r["docs_a"]
    for c in ("added_docs", "removed_docs", "changed_docs", "unchanged_docs"):
        assert sum(r[c] for r in out) > 0, c


# ---------------------------------------------------------------------------
# sample_mixture_doremi: the learned weights actually reshape the mix
# ---------------------------------------------------------------------------


def test_doremi_sampler_applies_learned_rates(spark, sf_smoke):
    """The loop-closure pin: the most-upweighted source keeps everything
    (keep_permille = 1000 by the normalization), planted-skew sources keep
    at a strictly higher rate than clean ones on average (the learned mix
    moved toward them), every kept row satisfies its own hash gate, and
    no row escapes the rate table."""
    from kafka_streams_rosetta_demo_spark.operators.doremi import (
        DOREMI_SKEW_RESIDUE,
    )
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["sample_mixture_doremi"].fn(spark, sf_smoke).collect()
    assert out
    rates = {}
    for r in out:
        assert 0 <= r["hash_bucket"] < r["keep_permille"] <= 1000, r
        rates.setdefault(r["source"], r["keep_permille"])
        assert rates[r["source"]] == r["keep_permille"]  # one rate per source
    assert max(rates.values()) == 1000
    skewed = [v for s, v in rates.items() if int(s[3:]) % 5 == DOREMI_SKEW_RESIDUE]
    clean = [v for s, v in rates.items() if int(s[3:]) % 5 != DOREMI_SKEW_RESIDUE]
    assert skewed and clean
    assert sum(skewed) / len(skewed) > sum(clean) / len(clean)


# ---------------------------------------------------------------------------
# streaming_blocklist_screen: the continuous path equals the batch scrub
# ---------------------------------------------------------------------------


def test_streaming_blocklist_screen_matches_batch(spark, sf_smoke):
    """The ingest screen's compacted per-doc verdicts must equal the batch
    scrub row-for-row (shared frame transform, so a mismatch means the
    streaming machinery corrupted something, not the matcher)."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    stream = {
        r["doc_id"]: r
        for r in qs["streaming_blocklist_screen"].fn(spark, sf_smoke).collect()
    }
    batch = {
        r["doc_id"]: r
        for r in qs["text_blocklist_scrub"].fn(spark, sf_smoke).collect()
    }
    assert set(stream) == set(batch) and stream
    for did, b in batch.items():
        s = stream[did]
        for c in ("source", "n_words", "n_hits", "n_terms", "terms_hit", "keep"):
            assert s[c] == b[c], (did, c)


# ---------------------------------------------------------------------------
# streaming_mixture_monitor: the drift report reconciles and points right
# ---------------------------------------------------------------------------


def test_mixture_monitor_flags_underserved_skew_sources(spark, sf_smoke):
    """The raw ingest delivers the NATURAL mix while the learned target
    upweights the planted-skew sources — so every skewed source must
    report under-served (observed < target) and at least one clean source
    over-served; deviations reconcile per row and the observed shares are
    an exact ppm decomposition (sum within floor dust of 1e6)."""
    from kafka_streams_rosetta_demo_spark.operators.doremi import (
        DOREMI_SKEW_RESIDUE,
    )
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["streaming_mixture_monitor"].fn(spark, sf_smoke).collect()
    assert out
    for r in out:
        assert r["deviation_ppm"] == r["observed_ppm"] - r["target_ppm"], r
        assert r["over_served"] == (r["deviation_ppm"] > 0), r
    total_obs = sum(r["observed_ppm"] for r in out)
    assert 1_000_000 - len(out) <= total_obs <= 1_000_000
    skewed = [r for r in out if int(r["source"][3:]) % 5 == DOREMI_SKEW_RESIDUE]
    clean = [r for r in out if int(r["source"][3:]) % 5 != DOREMI_SKEW_RESIDUE]
    assert skewed and clean
    for r in skewed:
        assert not r["over_served"], r  # target moved above natural share
    assert any(r["over_served"] for r in clean)


# ---------------------------------------------------------------------------
# text_decontaminate: the removal decision matches the check, and reconciles
# ---------------------------------------------------------------------------


def test_decontaminate_reconciles_with_check(spark, sf_smoke):
    """Per source: kept + dropped = train docs, retained tokens never
    exceed train tokens, the ppm columns are the exact splits, and the
    TOTAL dropped count equals the number of contaminated non-benchmark
    docs the check itself flags — the remover and the screen can never
    disagree about what overlaps (shared frame)."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    out = qs["text_decontaminate"].fn(spark, sf_smoke).collect()
    assert out
    for r in out:
        assert r["n_kept"] + r["n_dropped"] == r["n_train_docs"], r
        assert 0 <= r["toks_kept"] <= r["toks_train"], r
        assert r["doc_drop_ppm"] == r["n_dropped"] * 1_000_000 // r["n_train_docs"]
        assert (
            r["token_retention_ppm"]
            == r["toks_kept"] * 1_000_000 // r["toks_train"]
        )
    check = qs["text_contamination_check"].fn(spark, sf_smoke).collect()
    flagged = sum(
        1 for c in check if c["contaminated"] and c["doc_id"] % 97 != 0
    )
    assert sum(r["n_dropped"] for r in out) == flagged
