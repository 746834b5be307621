"""VERDICT r14 item 6: the graph_pagerank prep (orders⨝lineitem + distinct)
bucketed-layout experiment (guide §6).

Usage:  python tools/pagerank_prep_experiment.py [sf_dir] [reps]

Times three variants of the edge build through the noop sink, interleaved
rep-by-rep in ONE session (same-host comparison):

  plain     — the query's current build: join + distinct
  bucketed  — write both projections bucketed by the join key
              (saveAsTable, bucket count = session shuffle partitions),
              then join the bucketed tables + distinct. The WRITE IS TIMED:
              the no-precompute contract means a bucketed layout would have
              to be built inside the charged query, every run.
  prejoin   — plain, but lineitem pre-distinct'd on (l_orderkey, l_suppkey)
              before the join (strictly fewer join-input rows; the final
              (src,dst) distinct is unchanged).

Also prints each variant's Exchange count so the plan claim ("bucketed join
has no exchange") is checked in the same run.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def build_plain(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )


def build_prejoin(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )


def build_bucketed(spark, sf_dir, n_buckets):
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    spark.sql("DROP TABLE IF EXISTS pr_exp_orders")
    spark.sql("DROP TABLE IF EXISTS pr_exp_lineitem")
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .write.bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("pr_exp_orders")
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .write.bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("pr_exp_lineitem")
    )
    o = spark.table("pr_exp_orders")
    li = spark.table("pr_exp_lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )


def exchanges(df) -> int:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return plan.count("Exchange")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from kafka_streams_rosetta_demo_spark.session import get_spark

    spark = get_spark(app_name="pagerank-prep-exp")
    spark.sparkContext.setLogLevel("ERROR")
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for t in ("orders", "lineitem"):
        from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

        load_table(spark, sf_dir, t).count()  # scan warmup

    import json

    results = {"plain": [], "bucketed": [], "prejoin": []}
    for r in range(reps):
        for name, builder in (
            ("plain", lambda: build_plain(spark, sf_dir)),
            ("bucketed", lambda: build_bucketed(spark, sf_dir, n_buckets)),
            ("prejoin", lambda: build_prejoin(spark, sf_dir)),
        ):
            spark.sparkContext.setJobDescription(f"prexp:{name}:{r}")
            t0 = time.time()
            df = builder()  # bucketed: includes the two table writes
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            results[name].append(round(dt, 3))
            print(f"rep {r} {name:9s} {dt:7.3f}s", flush=True)
    for name in results:
        xs = sorted(results[name])
        print(f"{name:9s} median {xs[len(xs) // 2]:.3f}s  reps {results[name]}")
    print("exchange counts:")
    print("  plain   ", exchanges(build_plain(spark, sf_dir)))
    print("  prejoin ", exchanges(build_prejoin(spark, sf_dir)))
    print("  bucketed", exchanges(build_bucketed(spark, sf_dir, n_buckets)))
    print(json.dumps({k: v for k, v in results.items()}))
    spark.sql("DROP TABLE IF EXISTS pr_exp_orders")
    spark.sql("DROP TABLE IF EXISTS pr_exp_lineitem")


if __name__ == "__main__":
    main()
