"""Round-14 cross-engine failure-mode pins (the three r13 ADVICE items):

1. DoReMi oracle int64 envelope — past the documented excess bound, the
   Python fit must refuse as LOUDLY as DuckDB's replay overflows (never a
   silent success on one side).
2. sample_mixture_doremi weightless source — a source whose every doc is
   too short to enter the bigram fit must make BOTH engines refuse (the
   oracle used to silently drop it through the inner join).
3. share floor — a sub-ppm source must not divide the rate derivation by
   zero on either side.
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# DoReMi excess envelope: Python refuses, DuckDB overflows — both loud
# ---------------------------------------------------------------------------


def test_doremi_excess_envelope_python_refuses():
    from kafka_streams_rosetta_demo_spark.operators.doremi import (
        DOREMI_EXCESS_SAFE_MICRO,
        doremi_excess,
        doremi_fit,
    )

    # n=1 bigram each so nll_sum IS the per-bigram average: ref = 1e13,
    # excess_a = 1e13 — far past the 4e9 envelope
    domains = [("a", 1, 20_000_000_000_000), ("b", 1, 0)]
    excess, _, _ = doremi_excess(domains)
    assert excess["a"] > DOREMI_EXCESS_SAFE_MICRO
    with pytest.raises(ValueError, match="int64 envelope"):
        doremi_fit(domains)


def test_doremi_excess_envelope_duckdb_overflows():
    """The same planted excess makes the oracle's unrolled replay raise a
    DuckDB int64 overflow — the failure the Python-side refusal mirrors.
    (The arbitrary-precision fit would otherwise succeed silently.)"""
    import duckdb

    from kafka_streams_rosetta_demo_spark.operators.doremi import (
        doremi_oracle_iters,
    )

    sql = f"""
WITH ex AS (
  SELECT * FROM (VALUES
    ('a', CAST(1 AS BIGINT), CAST(20000000000000 AS BIGINT),
     CAST(10000000000000 AS BIGINT), CAST(500000 AS BIGINT)),
    ('b', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
     CAST(0 AS BIGINT), CAST(500000 AS BIGINT))
  ) t(source, n_bigrams, nll_micro, excess_micro, uniform_ppm)
),
{doremi_oracle_iters()}
SELECT * FROM it5
"""
    with pytest.raises(duckdb.Error, match="(?i)out of range|overflow"):
        duckdb.connect().execute(sql).fetchall()


def test_doremi_fit_inside_envelope_matches_oracle_at_extreme():
    """Just INSIDE the guard (excess = the 4e9 bound itself) both engines
    still replay the identical trajectory — the refusal is conservative,
    not load-bearing for correctness below it."""
    import duckdb

    from kafka_streams_rosetta_demo_spark.operators.doremi import (
        DOREMI_EXCESS_SAFE_MICRO,
        doremi_fit,
        doremi_oracle_iters,
    )

    e = DOREMI_EXCESS_SAFE_MICRO
    domains = [("a", 1, 2 * e), ("b", 1, 0)]  # ref = e, excess_a = e
    w = doremi_fit(domains)
    sql = f"""
WITH ex AS (
  SELECT * FROM (VALUES
    ('a', CAST(1 AS BIGINT), CAST({2 * e} AS BIGINT),
     CAST({e} AS BIGINT), CAST(500000 AS BIGINT)),
    ('b', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
     CAST(0 AS BIGINT), CAST(500000 AS BIGINT))
  ) t(source, n_bigrams, nll_micro, excess_micro, uniform_ppm)
),
{doremi_oracle_iters()}
SELECT source, w_ppm FROM it5 ORDER BY source
"""
    got = dict(duckdb.connect().execute(sql).fetchall())
    assert got == w


# ---------------------------------------------------------------------------
# sample_mixture_doremi: weightless source refuses in BOTH engines
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def weightless_sf_dir(spark, sf_smoke, tmp_path_factory):
    """An sf dir whose documents table adds a planted source ('src1001',
    residue 1 mod 5 so the skew injection leaves it alone) where EVERY doc
    is a single word — too short for the bigram fit, so the source has
    docs but no learned weight."""
    import duckdb

    out = tmp_path_factory.mktemp("weightless_sf")
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT * FROM '{sf_smoke}/documents.parquet'
  UNION ALL
  SELECT 9000000 + i AS doc_id, 'solo' AS text, 'en' AS lang,
         'src1001' AS source, CAST(4 AS BIGINT) AS n_chars
  FROM unnest(generate_series(1, 5)) t(i)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
"""
    )
    return str(out)


def test_smd_weightless_source_engine_refuses(spark, weightless_sf_dir):
    from kafka_streams_rosetta_demo_spark.queries import load_all

    fn = load_all()["sample_mixture_doremi"].fn
    with pytest.raises(ValueError, match="learned weight.*src1001"):
        fn(spark, weightless_sf_dir)


def test_smd_weightless_source_oracle_refuses(weightless_sf_dir):
    """The oracle's guard CTE must error() — never silently drop the
    weightless source's docs through the inner join (ADVICE r13)."""
    import duckdb

    from kafka_streams_rosetta_demo_spark.queries import load_all

    sql = load_all()["sample_mixture_doremi"].oracle
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{weightless_sf_dir}/documents.parquet'"
    )
    with pytest.raises(duckdb.Error, match="learned weight"):
        con.execute(sql).fetchall()


def test_smd_guard_passes_on_clean_corpus(sf_smoke):
    """On a corpus where every source enters the fit, the guard CTE is
    transparent: the oracle still returns rows (the refusal path must not
    leak into the happy path)."""
    import duckdb

    from kafka_streams_rosetta_demo_spark.queries import load_all

    sql = load_all()["sample_mixture_doremi"].oracle
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_smoke}/documents.parquet'"
    )
    assert len(con.execute(sql).fetchall()) > 0


# ---------------------------------------------------------------------------
# share floor: sub-ppm sources derive a rate instead of dividing by zero
# ---------------------------------------------------------------------------


def test_smd_keep_rates_floors_subppm_share():
    from kafka_streams_rosetta_demo_spark.queries.pipeline_queries import (
        smd_keep_rates,
    )

    # 'tiny' holds 1 doc of 3e6 -> exact share 0 ppm -> floored to 1
    cnts = {"big": 2_999_999, "tiny": 1}
    weights = {"big": 500_000, "tiny": 500_000}
    rates = dict(smd_keep_rates(cnts, weights))
    assert set(rates) == {"big", "tiny"}
    assert all(0 <= r <= 1000 for r in rates.values())
    # the tiny source is maximally under-represented -> it keeps everything
    assert rates["tiny"] == 1000


def test_smd_keep_rates_refuses_weightless():
    from kafka_streams_rosetta_demo_spark.queries.pipeline_queries import (
        smd_keep_rates,
    )

    with pytest.raises(ValueError, match="learned weight.*ghost"):
        smd_keep_rates({"a": 10, "ghost": 5}, {"a": 1_000_000})


# ---------------------------------------------------------------------------
# streaming_decontaminate_screen: ingest verdicts == the batch release review
# ---------------------------------------------------------------------------


def test_decontaminate_screen_matches_batch(spark, sf_smoke):
    """The ingest screen's per-doc verdicts must reconcile row-for-row with
    the batch side: every screened doc's drop_flag equals the check's
    contaminated flag (short docs: kept), and the per-source drop counts
    equal text_decontaminate's n_dropped — one overlap definition, no
    drift. Both verdict branches must be live at this SF."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    reg = load_all()
    screen = {
        r["doc_id"]: r
        for r in reg["streaming_decontaminate_screen"].fn(spark, sf_smoke).collect()
    }
    assert screen
    check = {
        r["doc_id"]: r
        for r in reg["text_contamination_check"].fn(spark, sf_smoke).collect()
    }
    # every non-benchmark doc with grams: screen verdict == check verdict
    n_overlap_rows = 0
    for doc_id, s in screen.items():
        assert doc_id % 97 != 0  # benchmark docs are not screened
        c = check.get(doc_id)
        if c is None:
            # too short to shingle -> kept by definition, zero counts
            assert not s["drop_flag"] and s["n_grams"] == 0 and s["n_hits"] == 0
            continue
        n_overlap_rows += 1
        assert (s["n_grams"], s["n_hits"]) == (c["n_grams"], c["n_hits"])
        assert s["drop_flag"] == bool(c["contaminated"])
    assert n_overlap_rows > 0
    # both branches live
    flags = {s["drop_flag"] for s in screen.values()}
    assert flags == {True, False}
    # per-source reconciliation with the batch removal audit
    audit = {
        r["source"]: r for r in reg["text_decontaminate"].fn(spark, sf_smoke).collect()
    }
    from collections import Counter

    dropped = Counter(s["source"] for s in screen.values() if s["drop_flag"])
    kept = Counter(s["source"] for s in screen.values() if not s["drop_flag"])
    for src, a in audit.items():
        assert dropped.get(src, 0) == a["n_dropped"], src
        assert kept.get(src, 0) == a["n_kept"], src


# ---------------------------------------------------------------------------
# streaming_mixture_sampler: ingest sample == batch sample, row for row
# ---------------------------------------------------------------------------


def test_mixture_sampler_matches_batch(spark, sf_smoke):
    """The ingest sampler must keep EXACTLY the batch sampler's rows — the
    shared smd_apply gate + shared rate derivation make drift impossible;
    this pin proves it end to end through the micro-batch path."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    reg = load_all()
    stream = reg["streaming_mixture_sampler"].fn(spark, sf_smoke)
    batch = reg["sample_mixture_doremi"].fn(spark, sf_smoke)
    assert stream.count() == batch.count() > 0
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


# ---------------------------------------------------------------------------
# dedup_url_canonical: the planted re-crawl construction behaves
# ---------------------------------------------------------------------------


def test_url_dedup_drops_exactly_the_recrawls(spark, sf_smoke):
    """Every dropped row is a re-crawl colliding with its own original
    (classes of size exactly 2, keep-min keeps the original), the totals
    reconcile with the slice size, and the www-strip axis is exercised."""
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
        URL_RECRAWL_MOD,
        URL_RECRAWL_RESIDUE,
        URL_RECRAWL_SHIFT,
        url_canonicalize,
        url_crawl_frame,
    )
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    docs = load_table(spark, sf_smoke, "documents")
    n_recrawl = docs.where(
        F.col("doc_id") % URL_RECRAWL_MOD == URL_RECRAWL_RESIDUE
    ).count()
    assert n_recrawl > 0

    out = load_all()["dedup_url_canonical"].fn(spark, sf_smoke).collect()
    assert sum(r["n_dropped"] for r in out) == n_recrawl
    for r in out:
        assert r["n_canonical"] == r["n_docs"] - r["n_dropped"]
        assert r["dup_ppm"] == r["n_dropped"] * 1_000_000 // r["n_docs"]

    # class structure: every canonical group has size 1 or 2; size-2 groups
    # pair an original (keeper, below the shift) with its re-crawl
    groups = (
        url_crawl_frame(docs)
        .select("doc_id", url_canonicalize(F.col("url")).alias("cu"))
        .groupBy("cu")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
        )
        .collect()
    )
    assert {g["c"] for g in groups} == {1, 2}
    www_pair = False
    for g in groups:
        if g["c"] == 2:
            assert g["lo"] < URL_RECRAWL_SHIFT <= g["hi"]
            assert g["hi"] - URL_RECRAWL_SHIFT == g["lo"]  # its OWN original
            if g["lo"] % 3 == 0:
                www_pair = True  # original carried the www. prefix
        else:
            # singletons: canonical urls never retain scheme/query/slash
            assert "://" not in g["cu"] and "?" not in g["cu"]
    assert www_pair, "www-strip axis never exercised"


# ---------------------------------------------------------------------------
# classifier_roc_auc: pair identities and a brute-force reference
# ---------------------------------------------------------------------------


def test_roc_auc_matches_bruteforce_reference(spark, sf_smoke):
    """The histogram-based AUC must equal the O(P*N) brute-force pair count
    on the same quantized cells, and carry real ranking signal (the scores
    are built to separate good docs, so AUC must beat coin-flip)."""
    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.queries.pipeline_queries import (
        _CAL_CLAMP,
        _ROC_CELL_MICRO,
        _clf_scored,
    )

    row = load_all()["classifier_roc_auc"].fn(spark, sf_smoke).collect()
    assert len(row) == 1
    r = row[0]
    # brute force on the driver (smoke scale only)
    cells = [
        (
            max(-_CAL_CLAMP, min(_CAL_CLAMP - 1, x["margin"])) + _CAL_CLAMP,
            x["good"],
        )
        for x in _clf_scored(spark, sf_smoke).collect()
    ]
    pos = sorted(c // _ROC_CELL_MICRO for c, g in cells if g)
    neg = sorted(c // _ROC_CELL_MICRO for c, g in cells if not g)
    conc = sum(1 for p in pos for n in neg if p > n)
    tied = sum(1 for p in pos for n in neg if p == n)
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert (r["concordant_pairs"], r["tied_pairs"]) == (conc, tied)
    assert r["auc_ppm"] == (2 * conc + tied) * 1_000_000 // (2 * len(pos) * len(neg))
    assert 500_000 < r["auc_ppm"] <= 1_000_000  # better than random


# ---------------------------------------------------------------------------
# privacy_t_closeness: reconciles with l-diversity, both branches live
# ---------------------------------------------------------------------------


def test_t_closeness_reconciles_with_l_diversity(spark, sf_correctness):
    """Same QI grain as the l-diversity audit: group sizes must match
    row-for-row; TVD is bounded in [0, 1e6]; at_risk is exactly the
    threshold predicate and both verdict branches are live at this SF."""
    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.queries.corpus_queries import (
        _T_CLOSE_PPM,
    )

    reg = load_all()
    tc = {
        (r["qi_source"], r["qi_len_bucket"]): r
        for r in reg["privacy_t_closeness"].fn(spark, sf_correctness).collect()
    }
    ld = {
        (r["qi_source"], r["qi_len_bucket"]): r
        for r in reg["privacy_l_diversity"].fn(spark, sf_correctness).collect()
    }
    assert set(tc) == set(ld)
    for k, r in tc.items():
        assert r["group_size"] == ld[k]["group_size"], k
        assert 0 <= r["t_tvd_ppm"] <= 1_000_000
        assert r["at_risk"] == (r["t_tvd_ppm"] > _T_CLOSE_PPM)
    flags = {r["at_risk"] for r in tc.values()}
    assert flags == {True, False}
    # a single-language group of a minority language must sit far from the
    # corpus distribution — the skewness attack the audit exists to catch
    one_lang = [r for r in tc.values() if r["group_size"] >= 3]
    assert one_lang
