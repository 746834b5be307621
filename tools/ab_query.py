"""Interleaved same-host A/B harness for one registered query.

Usage:
    python tools/ab_query.py <query> <ENV_VAR> <rounds> [sf_dir]

Runs 2*rounds fresh subprocesses alternating ENV_VAR=0 (leg A, "off") and
ENV_VAR=1 (leg B, "on"); each subprocess builds its own session (bench
construction: local[$SPARK_GRAFT_CPUS]), warms the scan path, then times the
query through the noop sink (guide §1.4). Interleaving A/B/A/B on the same
host is the only trustworthy comparison on this sandbox's storm-prone shared
disk (OPTIMIZATION_r14.md method note); medians of each leg plus the paired
per-round ratios print at the end.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
query, sf_dir = sys.argv[1], sys.argv[2]
from kafka_streams_rosetta_demo_spark.session import get_spark
from kafka_streams_rosetta_demo_spark.queries import load_all
spark = get_spark(app_name=f"ab-{query}")
spark.sparkContext.setLogLevel("ERROR")
# scan-path warmup (untimed), same spirit as bench.py
from kafka_streams_rosetta_demo_spark.sources.parquet import load_table
for t in ("events", "documents", "embeddings", "orders", "lineitem", "customer"):
    try:
        load_table(spark, sf_dir, t).count()
    except Exception:
        pass
q = load_all()[query]
spark.sparkContext.setJobDescription(f"ab:{query}")
t0 = time.time()
df = q.fn(spark, sf_dir)
df.write.format("noop").mode("overwrite").save()
dt = time.time() - t0
print(json.dumps({"query": query, "sec": round(dt, 3)}))
"""


def run_leg(query: str, env_var: str, val: str, sf_dir: str) -> float:
    env = dict(os.environ, **{env_var: val})
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
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"leg failed: {query} {env_var}={val}")


def main() -> None:
    query = sys.argv[1]
    env_var = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    offs, ons = [], []
    for r in range(rounds):
        offs.append(run_leg(query, env_var, "0", sf_dir))
        ons.append(run_leg(query, env_var, "1", sf_dir))
        print(
            f"round {r}: off={offs[-1]:.3f}s on={ons[-1]:.3f}s "
            f"ratio={ons[-1] / offs[-1]:.3f}",
            flush=True,
        )
    print(
        json.dumps(
            {
                "query": query,
                "env": env_var,
                "off": offs,
                "on": ons,
                "median_off": statistics.median(offs),
                "median_on": statistics.median(ons),
                "ratio_of_medians": round(
                    statistics.median(ons) / statistics.median(offs), 3
                ),
                "paired_ratios": [round(o / f, 3) for f, o in zip(offs, ons)],
            }
        )
    )


if __name__ == "__main__":
    main()
