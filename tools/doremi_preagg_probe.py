"""Round-15 wave D evidence probe: the DoReMi bigram pre-aggregation
(guide §2.3 "aggregate before you shuffle") vs the pre-round-15 shape.

The old shape shuffled the full |tokens|-row string-keyed bigram stream
three times (cb, cp, and the join probe); the new `_doremi_domain_rows`
collapses it to (source, prev, cur, c_s) first — every downstream number is
an exact integer function of the collapsed counts (row-sum == count-weighted
sum, since t_micro is constant within a (prev,cur) group). This probe keeps
the OLD implementation inline, asserts exact equality, and times both in
one session. Measured (sf0.1, quiet host): old median 1.52 s -> new 1.14 s
(0.75x); a §2.5 rebalance variant was also tried and REJECTED (+0.2 s —
shuffling raw text costs more than the single-partition explode saves).

Usage: python tools/doremi_preagg_probe.py [sf_dir] [reps]
"""

import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.queries.pipeline_queries import (
        DOREMI_SKEW_SQL,
        _doremi_domain_rows,
    )
    from kafka_streams_rosetta_demo_spark.session import get_spark
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    spark = get_spark(app_name="doremi-preagg-probe")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, sf, "documents").count()

    def old_rows():
        docs = load_table(spark, sf, "documents").select(
            "doc_id", "source", F.expr(DOREMI_SKEW_SQL.format(t="text")).alias("text")
        )
        words = F.split(F.lower("text"), " ")
        big = (
            docs.where(F.size(F.split("text", " ")) >= 2)
            .select("source", words.alias("words"))
            .select(
                "source",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(words) - 1),"
                        " i -> struct(words[i-1] AS prev, words[i] AS cur))"
                    )
                ).alias("b"),
            )
            .select("source", "b.prev", "b.cur")
        )
        cb = big.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
        cp = big.groupBy("prev").agg(F.count(F.lit(1)).alias("c1"))
        t_micro = F.floor(
            F.log(F.col("c2").cast("double") / F.col("c1")) * 1_000_000 + F.lit(0.5)
        ).cast("long")
        dom = (
            big.join(cb, ["prev", "cur"])
            .join(cp, "prev")
            .select("source", t_micro.alias("t_micro"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                (-F.sum("t_micro")).cast("long").alias("nll_sum"),
            )
        )
        return sorted(
            (r["source"], int(r["n_bigrams"]), int(r["nll_sum"]))
            for r in dom.collect()
        )

    def new_rows():
        return sorted(_doremi_domain_rows(spark, sf))

    o, n = old_rows(), new_rows()
    print("EQUAL:", o == n)
    assert o == n
    res = {"old": [], "preagg": []}
    for _ in range(reps):
        t0 = time.time()
        old_rows()
        res["old"].append(time.time() - t0)
        t0 = time.time()
        new_rows()
        res["preagg"].append(time.time() - t0)
    for k, v in res.items():
        print(f"{k:7s} median={statistics.median(v):.2f}s reps={[round(x, 2) for x in v]}")


if __name__ == "__main__":
    main()
