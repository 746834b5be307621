"""Core-scaling spot-check (VERDICT r14 item 8): 8 vs 32 cores on the
heaviest queries at a scale factor big enough for compute to dominate the
fixed overheads (sf0.1 could not demonstrate parallelism — every query ran
≤3 s, trigger/fsync-floor-bound).

Usage:
    python tools/scaling_cores.py <sf_dir> [reps] [query ...]

Per query, interleaves fresh-subprocess legs at SPARK_GRAFT_CPUS=8 and 32
(master local[N] AND shuffle partitions follow the env, exactly the
driver's own scaling methodology), reps each, and prints
median8 / median32 / ratio (ratio ≈ 4 = perfect core scaling; ≈ 1 =
overhead-bound).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

CHILD = r"""
import json, sys, time
query, sf_dir = sys.argv[1], sys.argv[2]
from kafka_streams_rosetta_demo_spark.session import get_spark
from kafka_streams_rosetta_demo_spark.queries import load_all
spark = get_spark(app_name=f"scale-{query}")
spark.sparkContext.setLogLevel("ERROR")
from kafka_streams_rosetta_demo_spark.sources.parquet import load_table
for t in ("events", "documents", "embeddings", "orders", "lineitem"):
    try:
        load_table(spark, sf_dir, t).count()
    except Exception:
        pass
q = load_all()[query]
t0 = time.time()
df = q.fn(spark, sf_dir)
df.write.format("noop").mode("overwrite").save()
print(json.dumps({"sec": round(time.time() - t0, 3)}))
"""

DEFAULT_QUERIES = [
    "streaming_ann_screen",
    "streaming_decontaminate_screen",
    "streaming_expectation_monitor",
    "streaming_mixture_sampler",
    "streaming_boilerplate_screen",
    "streaming_winnowing_screen",
    "corpus_source_similarity",
    "dedup_embedding_cosine",
    "dedup_containment",
    "graph_pagerank",
]


def leg(query: str, cpus: str, sf_dir: str) -> float:
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, query, sf_dir],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)["sec"]
        except Exception:
            continue
    sys.stderr.write(out.stderr[-3000:] + "\n")
    raise RuntimeError(f"leg failed: {query} cpus={cpus}")


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    queries = sys.argv[3:] or DEFAULT_QUERIES
    rows = []
    for q in queries:
        c8, c32 = [], []
        for _ in range(reps):
            c8.append(leg(q, "8", sf_dir))
            c32.append(leg(q, "32", sf_dir))
            print(f"{q}: c8={c8[-1]:.2f}s c32={c32[-1]:.2f}s", flush=True)
        m8, m32 = statistics.median(c8), statistics.median(c32)
        rows.append((q, m8, m32, round(m8 / m32, 2)))
        print(f"== {q}: median8={m8:.2f}s median32={m32:.2f}s ratio={m8 / m32:.2f}", flush=True)
    print(json.dumps([{"query": q, "sec_8": a, "sec_32": b, "ratio": r} for q, a, b, r in rows]))


if __name__ == "__main__":
    main()
