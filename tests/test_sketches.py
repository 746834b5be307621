"""Pin the HLL sketch query's statistical contract.

``agg_approx_count_distinct`` (HyperLogLog++, declared rsd 2%) cannot
hash-match a DuckDB sketch — sketch values differ across engines — so the
driver-checkable contract is a ``within_tolerance`` flag (the query compares
Spark's own estimate to Spark's own exact count; the oracle emits the exact
count with TRUE). This file pins (a) that the flag is actually TRUE on real
data, and (b) the underlying 3-sigma bound computed independently of the
query, so a wrong rsd / wrong column / wrong grouping can't hide behind a
vacuously-true flag.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_rosetta_demo_spark.queries import load_all
from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

QUERIES = load_all()


def test_approx_count_distinct_flag_true_and_exact(spark, sf_correctness):
    rows = QUERIES["agg_approx_count_distinct"].fn(spark, sf_correctness).collect()
    exact = {
        r.l_returnflag: r.n
        for r in (
            load_table(spark, sf_correctness, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.countDistinct("l_orderkey").alias("n"))
            .collect()
        )
    }
    assert {r.l_returnflag for r in rows} == exact.keys()
    for r in rows:
        assert r.exact_orders == exact[r.l_returnflag]
        assert r.within_tolerance is True, (
            f"{r.l_returnflag}: sketch outside declared 6% (3-sigma) bound"
        )


def test_hll_mergeable_union_matches_flat_sketch(spark, sf_correctness):
    """Mergeability is the property the query claims: the union of per-month
    sketches must estimate the same cardinality (within the bound) as one
    flat sketch over the same rows — the partial-agg-then-merge contract a
    pipeline storing sketch columns relies on."""
    rows = QUERIES["agg_hll_mergeable"].fn(spark, sf_correctness).collect()
    assert rows
    for r in rows:
        assert r.within_tolerance is True, f"{r.l_returnflag}: merged HLL off-bound"
    li = load_table(spark, sf_correctness, "lineitem")
    flat = {
        r.l_returnflag: r.approx
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 12))").alias("approx"))
        .collect()
    }
    merged = {
        r.l_returnflag: r.approx
        for r in li.groupBy("l_returnflag", F.month("l_shipdate").alias("m"))
        .agg(F.expr("hll_sketch_agg(l_orderkey, 12)").alias("sk"))
        .groupBy("l_returnflag")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx"))
        .collect()
    }
    # same lgConfigK → the union is lossless: estimates agree closely
    for flag in flat:
        assert abs(flat[flag] - merged[flag]) <= max(1, 0.01 * flat[flag]), (
            flag,
            flat[flag],
            merged[flag],
        )


def test_approx_percentile_flag_true_and_exact_rank(spark, sf_correctness):
    rows = QUERIES["agg_approx_percentile"].fn(spark, sf_correctness).collect()
    assert rows
    for r in rows:
        assert r.within_tolerance is True, (
            f"{r.l_returnflag}: GK sketch rank outside n/accuracy bound"
        )


def test_approx_percentile_rank_error_bound(spark, sf_correctness):
    """Independent pin of the GK guarantee (rank error <= n/accuracy),
    computed outside the query: the sketch's p50 must sit within rank
    n/1000 (+1 for discreteness) of the true median position."""
    li = (
        load_table(spark, sf_correctness, "lineitem")
        .select(
            F.col("l_returnflag"),
            F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
    )
    sk = {
        r.l_returnflag: (r.n, r.ap)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("approx_percentile(cents, 0.5, 1000)").alias("ap"),
        )
        .collect()
    }
    for flag, (n, ap) in sk.items():
        rank = li.where(
            (F.col("l_returnflag") == flag) & (F.col("cents") <= ap)
        ).count()
        assert abs(rank - n * 0.5) <= n / 1000.0 + 1, (flag, n, ap, rank)


def test_approx_count_distinct_within_rsd(spark, sf_correctness):
    """Independent 3-sigma pin on the raw sketch (not via the query), so the
    bound itself — rsd 0.02 → 6% — is regression-tested even if the query's
    flag logic changes."""
    li = load_table(spark, sf_correctness, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r.approx - r.n) / r.n
        assert rel_err <= 0.06, (
            f"{r.l_returnflag}: approx={r.approx} exact={r.n} err={rel_err:.4f}"
        )


def test_hll_sketch_columns_survive_parquet_roundtrip(spark, sf_correctness, tmp_path):
    """The store-the-sketch pipeline shape end to end: per-month HLL sketch
    COLUMNS written to parquet, read back in a different frame, and
    union-merged — the merged estimate must be bit-identical to merging the
    never-persisted sketches (binary sketch columns are plain bytes to the
    writer). This is what lets a 100 TB pipeline answer distinct-count
    questions at any grain without re-scanning raw data."""
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    li = load_table(spark, sf_correctness, "lineitem")
    per_month = li.groupBy(
        "l_returnflag", F.month("l_shipdate").alias("m")
    ).agg(F.expr("hll_sketch_agg(l_orderkey, 12)").alias("sk"))
    direct = {
        r.l_returnflag: r.est
        for r in per_month.groupBy("l_returnflag")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()
    }
    path = str(tmp_path / "sketches.parquet")
    per_month.write.parquet(path)
    reread = {
        r.l_returnflag: r.est
        for r in spark.read.parquet(path)
        .groupBy("l_returnflag")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()
    }
    assert reread == direct


# ---------------------------------------------------------------------------
# Bloom filter (join_bloom_prune)
# ---------------------------------------------------------------------------


def test_bloom_prune_lossless_and_effective(spark, sf_correctness):
    """The two properties that make bloom pruning usable at 100 TB:
    (a) ZERO false negatives — every fact row whose key is genuinely in the
    build set survives the prune (same KM hash math on both sides makes
    this definitional, but a width/hash-count refactor could break it);
    (b) the prune actually prunes — non-matching rows mostly vanish before
    the join shuffle (matching fraction ~10% here, fp ~4e-6)."""
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.operators.sketches import (
        bloom_build_words,
        bloom_prune,
    )
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    orders = load_table(spark, sf_correctness, "orders")
    build = orders.where(F.col("o_totalprice") > 450_000.0).select("o_orderkey")
    words = bloom_build_words(
        build.select(F.col("o_orderkey").cast("string").alias("k")), "k"
    )
    fact = load_table(spark, sf_correctness, "lineitem").select("l_orderkey")
    total = fact.count()
    pruned = bloom_prune(fact, F.col("l_orderkey").cast("string"), words)
    n_pruned = pruned.count()
    n_true = fact.join(
        build.hint("broadcast"), fact.l_orderkey == build.o_orderkey, "left_semi"
    ).count()
    n_survive_true = pruned.join(
        build.hint("broadcast"), pruned.l_orderkey == build.o_orderkey, "left_semi"
    ).count()
    assert n_survive_true == n_true, "bloom dropped a true match (false negative)"
    assert n_pruned < 0.3 * total, (
        f"bloom barely pruned: {n_pruned}/{total} rows survived"
    )


def test_bloom_false_positive_rate_bounded(spark, sf_correctness):
    """Probing 20k keys that are definitely NOT in the filter must pass a
    vanishing fraction — pins the m/k parameterization (65,536 bits x 6
    hashes ~ 4e-6 at 1.5k keys; a silent width regression to e.g. 2^10
    would blow straight past 1%)."""
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.operators.sketches import (
        bloom_build_words,
        bloom_prune,
    )
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    orders = load_table(spark, sf_correctness, "orders")
    build = orders.where(F.col("o_totalprice") > 450_000.0).select("o_orderkey")
    words = bloom_build_words(
        build.select(F.col("o_orderkey").cast("string").alias("k")), "k"
    )
    absent = spark.range(20_000).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("k")
    )
    n_fp = bloom_prune(absent, F.col("k"), words).count()
    assert n_fp / 20_000 < 0.01, f"false-positive rate too high: {n_fp}/20000"


def test_hll_intersection_tolerance_holds_at_bench_scale(spark):
    """The inclusion-exclusion intersection's compounded-error budget (sum
    of the three sketches' 3-sigma bounds) must hold at sf0.1 too — the
    gate checks sf0.01; intersection error grows with the operand
    magnitudes, so the larger scale is the stress case."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    rows = (
        load_all()["agg_hll_intersection"]
        .fn(spark, "/root/testdata/sf0.1")
        .collect()
    )
    assert rows and all(r["within_tolerance"] for r in rows)
    assert all(r["exact_both"] >= 0 for r in rows)
