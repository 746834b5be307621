"""Bucketed-layout evidence: co-bucketed tables join without a shuffle.

SCALING.md's co-location story for repeated fact/fact joins at 100 TB is
bucketing: both sides pre-partitioned on the join key at write time, so
every subsequent join on that key skips the exchange entirely. This test
pins the claim with the actual plan — a sort-merge join over two
co-bucketed tables must contain ZERO shuffle exchanges, and its result
must equal the plain join's.
"""

from __future__ import annotations

from kafka_streams_rosetta_demo_spark.sources.parquet import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
    for name, df, key in (("t_li_bkt", li, "l_orderkey"), ("t_od_bkt", od, "o_orderkey")):
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    try:
        a = spark.table("t_li_bkt")
        b = spark.table("t_od_bkt")
        # hint("merge") pins sort-merge so the assertion is about the
        # bucketed layout, not the broadcast threshold at this tiny sf.
        joined = a.join(b.hint("merge"), a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == li.join(od, li.l_orderkey == od.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bkt")
        spark.sql("DROP TABLE IF EXISTS t_od_bkt")
