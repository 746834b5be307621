"""Physical-plan audit over every registered query.

Prints one line per query: shuffle-exchange count, broadcast-exchange
count, whether the parquet scan carries pushed filters, and the
whole-stage-codegen span count — the properties the 100 TB design story
rests on. Run:

    python tools/plan_audit.py [sf_dir]

Streaming queries are skipped (their plans are per-micro-batch; the
streaming tests pin their semantics instead).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, q in sorted(load_all().items()):
        if name.startswith("streaming_"):
            continue
        df = q.fn(spark, sf_dir)
        # Execute first so AQE finalizes: join strategies, coalesced
        # exchanges, and whole-stage-codegen spans are only real in the
        # final plan (the pre-execution string is an AQE placeholder).
        # Must run through the df's OWN queryExecution (collect), not a
        # write — a write wraps the plan in a new execution and leaves
        # this one untouched.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the adaptive plan string appends the pre-execution tree under
        # "== Initial Plan ==" — drop it or every exchange counts twice
        plan = plan.split("== Initial Plan ==")[0]
        shuffles = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        rebalances = plan.count("Exchange RoundRobinPartitioning")
        bcasts = plan.count("BroadcastExchange")
        reused = plan.count("ReusedExchange")
        pushed = "PushedFilters: [" in plan and "PushedFilters: []" not in plan
        wsc = plan.count("*(")
        rows.append((name, shuffles, rebalances, bcasts, reused, pushed, wsc))

    print(f"{'query':32s} shuffle rebal bcast reused pushed codegen")
    for name, sh, rb, bc, ru, pf, wsc in rows:
        print(
            f"{name:32s} {sh:7d} {rb:5d} {bc:5d} {ru:6d} {str(pf):6s} {wsc:7d}"
        )


if __name__ == "__main__":
    main()
