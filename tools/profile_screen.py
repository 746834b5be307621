"""Phase profiler for the multi-second streaming screens (VERDICT r14 item 3).

Usage:
    python tools/profile_screen.py <query> [sf_dir]

Runs ONE registered streaming query in this process with timing wrappers on
the chokepoints every screen shares, then prints a phase breakdown:

- `staged_write`  — the repartition(3) parquet write that stages the backlog
- `stream_run`    — awaitTermination of the availableNow query (includes the
                    per-batch foreachBatch work and changelog sink writes)
- `final_action`  — the noop-sink write of the returned frame (snapshot
                    compaction + any post-stream aggregate)
- `static_build`  — everything else before the stream starts (index builds,
                    localCheckpoints): total - the above

This is a diagnostic tool, not a bench: one process, one run, wall clock.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    query = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql.readwriter import DataFrameWriter
    from pyspark.sql.streaming.query import StreamingQuery

    phases: dict[str, float] = {}

    real_parquet = DataFrameWriter.parquet
    real_await = StreamingQuery.awaitTermination

    def timed_parquet(self, path, *a, **kw):
        t0 = time.time()
        try:
            return real_parquet(self, path, *a, **kw)
        finally:
            dt = time.time() - t0
            base = str(path).rsplit("/", 1)[-1] or str(path)
            key = (
                "staged_write"
                if any(
                    tag in str(path)
                    for tag in ("_ingest_", "staged", "redeliver", "landing")
                )
                else f"parquet:{base[:40]}"
            )
            phases[key] = phases.get(key, 0.0) + dt

    def timed_await(self, *a, **kw):
        t0 = time.time()
        try:
            return real_await(self, *a, **kw)
        finally:
            phases["stream_run"] = phases.get("stream_run", 0.0) + time.time() - t0

    DataFrameWriter.parquet = timed_parquet
    StreamingQuery.awaitTermination = timed_await

    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.session import get_spark

    spark = get_spark(app_name=f"profile-{query}")
    spark.sparkContext.setLogLevel("ERROR")
    # scan warmup, untimed (bench parity)
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    for t in ("events", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    q = load_all()[query]
    spark.sparkContext.setJobDescription(f"profile:{query}")
    t0 = time.time()
    df = q.fn(spark, sf_dir)
    t1 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.time()

    total = t2 - t0
    phases["final_action"] = t2 - t1
    # parquet:* writes into sink_/ckpt_ dirs happen INSIDE awaitTermination
    # (foreachBatch changelog) — they are sub-items of stream_run, not
    # additive phases; only the top-level phases enter the accounting.
    top = ("staged_write", "stream_run", "final_action")
    accounted = sum(phases.get(k, 0.0) for k in top)
    phases["static_build_and_rest"] = max(0.0, total - accounted)
    print(f"\n=== {query} @ {sf_dir}: total {total:.2f}s")
    for k in sorted(phases, key=phases.get, reverse=True):
        tag = "" if k in top or k == "static_build_and_rest" else "  (within stream_run)"
        print(f"  {phases[k]:7.2f}s  {k}{tag}")


if __name__ == "__main__":
    main()
