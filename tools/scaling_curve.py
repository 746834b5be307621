"""Scale-factor sweep: how query wall-time grows as the data grows.

Runs a representative query basket at sf0.001 / sf0.01 / sf0.1 (100x data
range) in ONE session and reports, per query, the wall-time at each SF and
the 0.01→0.1 growth ratio against the 10x data growth. A ratio well under
10 means fixed overhead still dominates (the query has scale headroom); a
ratio near or above 10 is the first place to look when projecting to
cluster scale. Also checks plan-shape stability: the hash-exchange count
at sf0.1 vs sf0.01 (AQE may legitimately swap broadcast decisions; a
SHUFFLE-count change is worth reading).

Usage: python tools/scaling_curve.py   (writes a markdown table to stdout;
SCALING.md embeds the result — regenerate after plan-affecting changes).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
REPS = 3

# Cross-family representatives: scan-agg, broadcast join, window, dedup
# (LSH + exact), vector search, text ranking, curation, streaming-adjacent
# batch twins, and the two round-5 scale operators.
BASKET = [
    "agg_pricing_summary",
    "rosetta_enriched",
    "join_three_way_topk",
    "join_bloom_prune",
    "join_scd2_point_in_time",
    "window_moving_sum",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_brute_force",
    "text_tfidf_topk",
    "sample_stratified_hash",
    "agg_key_skew_profile",
]


def main() -> None:
    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.session import get_spark
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    registry = load_all()
    spark = get_spark(app_name="rosetta-scaling")
    spark.range(1000).selectExpr("sum(id)").collect()

    rows = []
    for name in BASKET:
        q = registry[name]
        per_sf: list[float] = []
        shuffles: list[int] = []
        for sf_dir in SFS:
            for t in ("events", "customer", "orders", "lineitem", "documents",
                      "embeddings"):
                try:
                    load_table(spark, sf_dir, t).count()
                except Exception:
                    pass
            reps = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                reps.append(time.perf_counter() - t0)
            per_sf.append(statistics.median(reps))
            plan = (
                q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            )
            shuffles.append(
                plan.count("Exchange hashpartitioning")
                + plan.count("Exchange rangepartitioning")
            )
        growth = per_sf[2] / per_sf[1] if per_sf[1] > 0 else float("inf")
        rows.append((name, per_sf, growth, shuffles))
        print(
            f"  {name}: {' '.join(f'{t:.2f}s' for t in per_sf)} "
            f"growth(0.01->0.1)={growth:.1f}x shuffles={shuffles}",
            file=sys.stderr,
        )

    print("| query | sf0.001 | sf0.01 | sf0.1 | 10x-data growth | shuffles (by sf) |")
    print("|---|---|---|---|---|---|")
    for name, per_sf, growth, shuffles in rows:
        print(
            f"| {name} | {per_sf[0]:.2f}s | {per_sf[1]:.2f}s | {per_sf[2]:.2f}s "
            f"| {growth:.1f}x | {'/'.join(map(str, shuffles))} |"
        )


if __name__ == "__main__":
    main()
