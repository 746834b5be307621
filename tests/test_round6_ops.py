"""Round-6 operator properties beyond oracle parity.

The parity sweep proves values; these tests pin the properties the designs
REST on — single emission for the bin-bucketed keyless join, live change
classes for the snapshot diff, stream-equals-batch for the streaming twin,
and the profiler's single-aggregation plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _q(name):
    from kafka_streams_rosetta_demo_spark.queries import load_all

    return load_all()[name].fn


def test_keyless_range_join_single_emission(spark, sf_correctness):
    # The bin trick's core claim: every (window, event) pair shares exactly
    # one bin, so the join emits each match once — no dedup pass exists in
    # the plan, so duplicates would corrupt the aggregate silently.
    pairs = _q("streaming_range_join_keyless")(spark, sf_correctness)
    total = pairs.count()
    distinct = pairs.select("win_id", "matched_event").distinct().count()
    assert total == distinct > 0


def test_keyless_range_join_batch_agg_consistent(spark, sf_correctness):
    # The batch query's per-window counts must equal a rollup of the
    # streaming twin's pair emission — same truth, two executions.
    agg = _q("join_range_keyless")(spark, sf_correctness)
    pairs = _q("streaming_range_join_keyless")(spark, sf_correctness)
    re_agg = pairs.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    assert agg.exceptAll(re_agg).count() == 0
    assert re_agg.exceptAll(agg).count() == 0


def test_snapshot_diff_all_classes_live(spark, sf_correctness):
    # A diff query that only ever says "changed" tests nothing; the window
    # choice must keep all four classes populated at gate scale.
    classes = {
        r["change_type"]
        for r in _q("cdc_snapshot_diff")(spark, sf_correctness)
        .select("change_type")
        .distinct()
        .collect()
    }
    assert classes == {"added", "removed", "changed", "unchanged"}


def test_profile_column_stats_single_aggregate(spark, sf_correctness):
    # One scan, one aggregation: the executed plan must contain exactly one
    # logical aggregation pipeline over ONE FileScan — N UNION'd scans (the
    # oracle's formulation) would show N scans.
    df = _q("profile_column_stats")(spark, sf_correctness)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_ohlc_endpoints_are_real_observations(spark, sf_correctness):
    # open/close must be actual values from the bucket (min_by/max_by), and
    # bounded by high/low.
    rows = _q("timeseries_downsample_ohlc")(spark, sf_correctness).collect()
    assert rows
    for r in rows:
        assert r["low_v"] <= r["open_v"] <= r["high_v"]
        assert r["low_v"] <= r["close_v"] <= r["high_v"]
        assert r["n"] >= 1
