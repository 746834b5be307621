"""Round-11 pins: the large-vocabulary mapInPandas BPE encode path, the
overflow-safe fertility ppm math, artifact persist/reload parity, and the
artifact-cache pin-eviction fix.

Each test pins a behavior a 100 TB deployment depends on: the two BPE
encode forms (vocabulary-join fast path vs per-document map fallback) must
be interchangeable; ppm ratios must stay exact past int64's naive-product
ceiling; written artifact indexes must reload byte-identical across
sessions; and corpus rewrites must not leak evicted artifacts' disk pins.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. doc_bpe_token_counts_map == the vocabulary-join path (VERDICT r10 task 1)
# ---------------------------------------------------------------------------


class TestMapInPandasBpeEncode:
    def test_map_encode_matches_vocab_join(self, spark, sf_smoke):
        """The per-document mapInPandas encode (no distinct stage, no join)
        must be row-identical to the production vocabulary-broadcast-join
        path — the module contract's interchangeability claim."""
        from kafka_streams_rosetta_demo_spark.operators.bpe import (
            corpus_words,
            doc_bpe_token_counts_map,
            word_token_counts,
        )
        from kafka_streams_rosetta_demo_spark.queries.artifacts import bpe_merges
        from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

        merges = list(bpe_merges(spark, sf_smoke))
        docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")

        via_map = {
            r.doc_id: r.n_bpe_tokens
            for r in doc_bpe_token_counts_map(docs, spark, merges).collect()
        }

        wt = word_token_counts(spark, sf_smoke, merges)
        d = corpus_words(spark, sf_smoke, "doc_id")
        sums = (
            d.join(F.broadcast(wt), d.w == wt.word)
            .groupBy("doc_id")
            .agg(F.sum("n_toks").cast("long").alias("n"))
        )
        via_join = {
            r.doc_id: r.n
            for r in docs.select("doc_id")
            .join(sums, "doc_id", "left")
            .select("doc_id", F.coalesce("n", F.lit(0)).alias("n"))
            .collect()
        }

        assert via_map == via_join
        assert len(via_map) == docs.count()  # every document exactly once

    def test_map_encode_counts_empty_docs_zero(self, spark, sf_smoke):
        """Empty / whitespace-only / null text counts 0, never drops the
        row — the left-join-coalesce semantics of the join path."""
        from kafka_streams_rosetta_demo_spark.operators.bpe import (
            doc_bpe_token_counts_map,
        )

        docs = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, None), (4, "a b")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.n_bpe_tokens
            for r in doc_bpe_token_counts_map(docs, spark, []).collect()
        }
        assert got == {1: 0, 2: 0, 3: 0, 4: 2}

    def test_map_encode_plan_has_no_shuffle(self, spark, sf_smoke):
        """The fallback's whole point: a pure map over the corpus's
        existing partitioning — zero exchanges in the physical plan."""
        from kafka_streams_rosetta_demo_spark.operators.bpe import (
            doc_bpe_token_counts_map,
        )
        from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

        docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
        plan = (
            doc_bpe_token_counts_map(docs, spark, [("a", "b")])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# 2. _ppm_ratio_sql exactness at 100 TB magnitudes (round-10 ADVICE, medium)
# ---------------------------------------------------------------------------


_PPM_CASES = [
    # (numerator, denominator) at magnitudes where num*1e6 wraps int64
    (9_200_000_000_000_000, 3_100_000_000_000_001),
    (3_100_000_000_000_001, 9_200_000_000_000_000),
    (10**13, 7),
    (7, 10**13),
    (1, 1),
    (9_223_372_036_854, 9_223_372_036_853),
]


class TestPpmRatioDecomposition:
    def test_spark_expr_exact_past_naive_overflow(self, spark):
        """Evaluate the engine-side decomposed expression on values where
        ``num * 1000000`` exceeds 2^63 and pin it to exact integer math."""
        from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
            _ppm_ratio_sql,
        )

        df = spark.createDataFrame(_PPM_CASES, "num long, den long")
        got = df.select(
            "num", "den", F.expr(_ppm_ratio_sql("num", "den", "DIV")).alias("ppm")
        ).collect()
        for r in got:
            assert r.ppm == r.num * 1_000_000 // r.den, (r.num, r.den)

    def test_duckdb_expr_matches_spark_spelling(self):
        """The `//` spelling the oracle uses computes the same values —
        the two engines' decompositions can never drift."""
        from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
            _ppm_ratio_sql,
        )

        con = duckdb.connect()
        for num, den in _PPM_CASES:
            expr = _ppm_ratio_sql(
                f"CAST({num} AS BIGINT)", f"CAST({den} AS BIGINT)"
            )
            (val,) = con.execute(f"SELECT {expr}").fetchone()
            assert val == num * 1_000_000 // den, (num, den)

    def test_intermediates_stay_under_int64(self):
        """Every term the decomposition materializes stays below 2^63 for
        denominators to ~9.2e15 — the documented envelope."""
        I64 = 1 << 63
        for num, den in _PPM_CASES:
            q, r = divmod(num, den)
            for term in (q * 1_000_000, r * 1000, (r * 1000 % den) * 1000):
                assert -I64 <= term < I64


# ---------------------------------------------------------------------------
# 3. Artifact-cache hygiene (round-10 ADVICE, low x2): eviction releases the
# evicted entry's DISK_ONLY pins; non-local fingerprints warn once.
# ---------------------------------------------------------------------------


class TestArtifactCacheHygiene:
    def test_eviction_unpersists_stale_disk_pins(self, spark, tmp_path, capfd):
        """A corpus rewritten in place mid-session must release the OLD
        fingerprint's DISK_ONLY artifact blocks at cache_insert time — not
        hold them until a bench-only clear_* helper runs."""
        import shutil
        import time

        from pyspark import StorageLevel

        from kafka_streams_rosetta_demo_spark.queries import artifacts

        sf = str(tmp_path)
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {i}", "s") for i in range(60)],
            "doc_id long, text string, source string",
        )
        docs.write.parquet(f"{sf}/documents.parquet")

        artifacts.clear_winnowing_artifacts()
        spark.conf.set(artifacts._BUDGET_CONF, "1")  # force DISK_ONLY
        try:
            artifacts.winnowing_index(spark, sf)
            (old_pins,) = artifacts._WINNOW_DISK_PINS.values()
            old_pinned = old_pins[0]
            assert old_pinned.storageLevel == StorageLevel.DISK_ONLY

            # rewrite the corpus in place (new mtime/fileset -> new key)
            time.sleep(0.05)
            shutil.rmtree(f"{sf}/documents.parquet")
            docs.limit(30).write.parquet(f"{sf}/documents.parquet")

            artifacts.winnowing_index(spark, sf)
            assert len(artifacts._WINNOW_DISK_PINS) == 1  # only the new key
            assert (
                old_pinned.storageLevel == StorageLevel.NONE
            ), "evicted entry's disk pin not released at insert time"
        finally:
            spark.conf.unset(artifacts._BUDGET_CONF)
            artifacts.clear_winnowing_artifacts()
            capfd.readouterr()

    def test_nonlocal_fingerprint_warns_once(self, capfd):
        """An os.stat-invisible (remote-scheme) sf_dir fingerprints empty —
        the staleness guard is off there — and says so exactly once."""
        from kafka_streams_rosetta_demo_spark.queries.artifacts import (
            corpus_fingerprint,
        )

        path = "s3://bucket-that-does-not-exist/sfX"
        assert corpus_fingerprint(path) == ()
        assert corpus_fingerprint(path) == ()
        err = capfd.readouterr().err
        assert err.count("corpus fingerprint unavailable") == 1

    def test_local_missing_path_stays_silent(self, tmp_path, capfd):
        """A missing LOCAL path is the normal does-not-exist case — no
        warning, just the empty fingerprint."""
        from kafka_streams_rosetta_demo_spark.queries.artifacts import (
            corpus_fingerprint,
        )

        assert corpus_fingerprint(str(tmp_path / "nope")) == ()
        assert "fingerprint unavailable" not in capfd.readouterr().err


# ---------------------------------------------------------------------------
# 4. Artifact persist/reload parity (VERDICT r10 task 2): written index ->
# cleared memos -> reload -> consumer queries hash-identical, with the
# builders BLOCKED so a silent rebuild cannot fake the parity.
# ---------------------------------------------------------------------------


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestArtifactPersistReload:
    def test_winnowing_index_reload_parity(self, spark, sf_smoke, tmp_path, monkeypatch):
        """dedup_winnowing_screen must answer identically whether the
        fingerprint index came from this session's build or from a written
        parquet index reloaded cold — with the builder raising, so the
        reload path is provably the one that served."""
        from kafka_streams_rosetta_demo_spark.operators import textsim
        from kafka_streams_rosetta_demo_spark.queries import artifacts
        from kafka_streams_rosetta_demo_spark.queries.dedup_queries import (
            dedup_winnowing_screen,
        )

        artifacts.clear_winnowing_artifacts()
        baseline = _rows(dedup_winnowing_screen(spark, sf_smoke))

        path = str(tmp_path / "winnow_idx")
        artifacts.save_artifact(spark, sf_smoke, "winnowing_index", path)
        artifacts.clear_winnowing_artifacts()  # simulate a fresh session

        def boom(*a, **k):
            raise AssertionError("builder ran — reload did not serve")

        monkeypatch.setattr(textsim, "winnow_fingerprints", boom)
        loaded = artifacts.load_artifact(spark, sf_smoke, "winnowing_index", path)
        assert loaded.columns == ["doc_id", "f"]
        assert _rows(dedup_winnowing_screen(spark, sf_smoke)) == baseline
        monkeypatch.undo()
        artifacts.clear_winnowing_artifacts()

    def test_bpe_reload_parity(self, spark, sf_smoke, tmp_path, monkeypatch):
        """The tokenizer's two artifacts (merge table + vocabulary map)
        round-trip through disk and serve text_bpe_fertility identically,
        with training and the vocabulary encode both blocked."""
        from kafka_streams_rosetta_demo_spark.operators import bpe as bpe_mod
        from kafka_streams_rosetta_demo_spark.queries import artifacts
        from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
            text_bpe_fertility,
        )

        artifacts.clear_bpe_artifacts()
        baseline = _rows(text_bpe_fertility(spark, sf_smoke))
        saved_merges = artifacts.bpe_merges(spark, sf_smoke)

        mpath = str(tmp_path / "bpe_merges")
        wpath = str(tmp_path / "bpe_word_tokens")
        artifacts.save_artifact(spark, sf_smoke, "bpe_merges", mpath)
        artifacts.save_artifact(spark, sf_smoke, "bpe_word_tokens", wpath)
        artifacts.clear_bpe_artifacts()

        def boom(*a, **k):
            raise AssertionError("builder ran — reload did not serve")

        monkeypatch.setattr(bpe_mod, "train_bpe", boom)
        monkeypatch.setattr(bpe_mod, "word_token_counts", boom)
        monkeypatch.setattr(bpe_mod, "corpus_word_counts", boom)
        merges = artifacts.load_artifact(spark, sf_smoke, "bpe_merges", mpath)
        assert merges == saved_merges  # rank order survives the round trip
        artifacts.load_artifact(spark, sf_smoke, "bpe_word_tokens", wpath)
        assert _rows(text_bpe_fertility(spark, sf_smoke)) == baseline
        monkeypatch.undo()
        artifacts.clear_bpe_artifacts()

    def test_stale_fingerprint_rejected_on_load(self, spark, tmp_path):
        """An index saved from one corpus snapshot must refuse to load
        against a rewritten snapshot of the same path — the silent-stale
        failure the sidecar gate exists to stop."""
        import shutil
        import time

        import pytest as _pytest

        from kafka_streams_rosetta_demo_spark.queries import artifacts

        sf = str(tmp_path / "corpus")
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma {i}", "s") for i in range(40)],
            "doc_id long, text string, source string",
        )
        docs.write.parquet(f"{sf}/documents.parquet")
        path = str(tmp_path / "idx")
        artifacts.save_artifact(spark, sf, "winnowing_index", path)

        time.sleep(0.05)
        shutil.rmtree(f"{sf}/documents.parquet")
        docs.limit(10).write.parquet(f"{sf}/documents.parquet")

        with _pytest.raises(ValueError, match="different snapshot"):
            artifacts.load_artifact(spark, sf, "winnowing_index", path)
        artifacts.clear_winnowing_artifacts()

    def test_append_extends_index_to_full_rebuild_parity(self, spark, tmp_path):
        """The incremental-maintenance path: index saved over 80% of a
        corpus, the remaining 20% ingested and APPENDED (only the batch is
        fingerprinted — no corpus rescan), reload against the post-ingest
        snapshot == the full-rebuild index row-for-row, for both
        per-document kinds."""
        import pytest as _pytest

        from pyspark.sql import functions as F

        from kafka_streams_rosetta_demo_spark.queries import artifacts

        sf = str(tmp_path / "corpus")
        all_docs = spark.createDataFrame(
            [(i, f"gamma delta epsilon zeta {i % 7} {i}", "s") for i in range(50)],
            "doc_id long, text string, source string",
        )
        base = all_docs.where(F.col("doc_id") % 5 != 0)
        batch = all_docs.where(F.col("doc_id") % 5 == 0)

        for kind in ("winnowing_index", "minhash_signatures"):
            path = str(tmp_path / f"idx_{kind}")
            base.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
            artifacts.clear_winnowing_artifacts()
            artifacts.clear_shingle_artifacts()
            artifacts.save_artifact(spark, sf, kind, path)

            # the ingest lands in the corpus table, then extends the index
            batch.write.mode("append").parquet(f"{sf}/documents.parquet")
            artifacts.append_artifact(spark, sf, kind, path, batch)

            artifacts.clear_winnowing_artifacts()
            artifacts.clear_shingle_artifacts()
            loaded = _rows(artifacts.load_artifact(spark, sf, kind, path))

            artifacts.clear_winnowing_artifacts()
            artifacts.clear_shingle_artifacts()
            builder = artifacts._artifact_specs()[kind][0]
            assert loaded == _rows(builder(spark, sf).select(
                *artifacts._artifact_specs()[kind][4]
            )), kind
        artifacts.clear_winnowing_artifacts()
        artifacts.clear_shingle_artifacts()

        # corpus-global kinds refuse the append path
        with _pytest.raises(ValueError, match="not per-document"):
            artifacts.append_artifact(
                spark, sf, "jaccard_pairs_075", str(tmp_path / "nope"), batch
            )


# ---------------------------------------------------------------------------
# 5. Streaming twin of the tokenizer fertility monitor (VERDICT r10 task 6)
# ---------------------------------------------------------------------------


class TestStreamingBpeTokenRate:
    def test_streaming_totals_match_batch(self, spark, sf_smoke):
        """Three genuine micro-batches through the streaming aggregation
        state must reproduce the batch fertility table exactly — the
        continuous path computes the identical per-source totals."""
        from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
            text_bpe_fertility,
        )
        from kafka_streams_rosetta_demo_spark.queries.streaming_queries import (
            streaming_bpe_token_rate,
        )

        batch = _rows(text_bpe_fertility(spark, sf_smoke))
        stream = _rows(streaming_bpe_token_rate(spark, sf_smoke))
        assert stream == batch

    def test_pairs_and_signatures_reload_parity(self, spark, sf_smoke, tmp_path, monkeypatch):
        """The remaining two registered artifact kinds — the PPJoin pair
        set and the MinHash signature table — also round-trip: their
        consumer queries answer identically off the reloaded indexes with
        the pair/signature builders blocked (shingling stays allowed —
        it is a separate artifact these two consume)."""
        from kafka_streams_rosetta_demo_spark.operators import textsim
        from kafka_streams_rosetta_demo_spark.queries import artifacts
        from kafka_streams_rosetta_demo_spark.queries.dedup_queries import (
            dedup_minhash_lsh,
            dedup_ngram_jaccard,
        )

        artifacts.clear_shingle_artifacts()
        pairs_baseline = _rows(dedup_ngram_jaccard(spark, sf_smoke))
        lsh_baseline = _rows(dedup_minhash_lsh(spark, sf_smoke))

        ppath = str(tmp_path / "pairs075")
        spath = str(tmp_path / "minhash_sigs")
        artifacts.save_artifact(spark, sf_smoke, "jaccard_pairs_075", ppath)
        artifacts.save_artifact(spark, sf_smoke, "minhash_signatures", spath)
        artifacts.clear_shingle_artifacts()

        def boom(*a, **k):
            raise AssertionError("builder ran — reload did not serve")

        monkeypatch.setattr(textsim, "prefix_filter_pairs", boom)
        monkeypatch.setattr(textsim, "minhash_signature", boom)
        artifacts.load_artifact(spark, sf_smoke, "jaccard_pairs_075", ppath)
        artifacts.load_artifact(spark, sf_smoke, "minhash_signatures", spath)
        assert _rows(dedup_ngram_jaccard(spark, sf_smoke)) == pairs_baseline
        assert _rows(dedup_minhash_lsh(spark, sf_smoke)) == lsh_baseline
        monkeypatch.undo()
        artifacts.clear_shingle_artifacts()


# ---------------------------------------------------------------------------
# 6. Tokenizer deliverables: vocabulary ids + the flat corpus encoding
# ---------------------------------------------------------------------------


class TestBpeTokenizerDeliverables:
    def test_vocab_is_bounded_model_state(self, spark, sf_smoke):
        """Every emitted token is a base character or a merge product, so
        |vocab| <= |alphabet| + N_MERGES — the bound the id window's
        single-partition sort rests on."""
        from kafka_streams_rosetta_demo_spark.operators.bpe import N_MERGES
        from kafka_streams_rosetta_demo_spark.queries.artifacts import bpe_merges
        from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
            text_bpe_vocab_ids,
        )

        rows = text_bpe_vocab_ids(spark, sf_smoke).collect()
        merged = {a + b for a, b in bpe_merges(spark, sf_smoke)}
        for r in rows:
            assert len(r.token) == 1 or r.token in merged, r.token
        alphabet = {t for r in rows for t in r.token}
        assert len(rows) <= len(alphabet) + N_MERGES
        # dense deterministic ids: 0..n-1, frequency-desc then token asc
        ids = sorted((r.token_id, -r.freq, r.token) for r in rows)
        assert [i for i, _, _ in ids] == list(range(len(rows)))
        assert ids == sorted(ids, key=lambda x: (x[1], x[2]))

    def test_encode_corpus_positions_are_dense_per_doc(self, spark, sf_smoke):
        """tok_idx runs 0..n_tokens-1 within each document with no gaps —
        the property sequence packing depends on — and per-doc totals
        agree with the count-only encode paths."""
        from collections import defaultdict

        from kafka_streams_rosetta_demo_spark.operators.bpe import (
            doc_bpe_token_counts_map,
        )
        from kafka_streams_rosetta_demo_spark.queries.artifacts import bpe_merges
        from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
            text_bpe_encode_corpus,
        )
        from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

        per_doc = defaultdict(list)
        for r in text_bpe_encode_corpus(spark, sf_smoke).collect():
            per_doc[r.doc_id].append(r.tok_idx)
        for doc_id, idxs in per_doc.items():
            assert sorted(idxs) == list(range(len(idxs))), doc_id

        docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
        counts = {
            r.doc_id: r.n_bpe_tokens
            for r in doc_bpe_token_counts_map(
                docs, spark, list(bpe_merges(spark, sf_smoke))
            ).collect()
            if r.n_bpe_tokens > 0
        }
        assert {d: len(v) for d, v in per_doc.items()} == counts
