#!/usr/bin/env python
"""Generate a larger scale-factor dataset from sf0.1 for the scaling sweep.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only). Projecting to
cluster scale needs at least one measured leg BEYOND the bench SF, so this
tool synthesizes ``sf0.5`` as **5 disjoint shards of sf0.1**: each replica
shifts every key column by a replica-sized stride, so shard key spaces never
collide and per-shard distributions are exactly sf0.1's. Two columns need
more than a key shift to avoid DISTORTING the quantities the heavy queries
measure:

- ``documents.text`` — a verbatim copy would make every doc a near-dup of
  its 4 replicas (Jaccard ≈ 1), exploding pair counts quadratically for a
  reason unrelated to engine scaling. Replica i > 0 suffixes every WORD with
  ``_i``: word/shingle counts are preserved, within-replica dup structure is
  byte-for-byte isomorphic, cross-replica Jaccard is exactly 0 → pair
  counts grow exactly 5x (linear), which is what a 5x-bigger real corpus
  with the same dup rate does.
- ``embeddings.embedding`` — verbatim copies are exact cosine duplicates
  (cross-replica near-dup pairs, quadratic in-cell blowup for SemDeDup).
  Replica i > 0 flips the sign of dimension j where ``popcount(j & i)`` is
  odd — the Walsh-function sign pattern: norms are preserved (kNN/centroid
  math stays well-conditioned) while the product of any two distinct
  replicas' patterns is itself a non-trivial Walsh function, so
  cross-replica cosine collapses toward 0 for EVERY replica pair up to
  factor 64 (a single-bit scheme ``(j >> (i-1)) & 1`` goes degenerate past
  factor 7 on 64-dim vectors: bits >= 6 never flip, making replicas exact
  duplicates again).

Dimension tables (nation, region) copy once — they are fixed-size in TPC-H
semantics and every generator SF ships the same 25/5 rows.

Each table lands as a SINGLE parquet file named ``{table}.parquet`` (same
layout as the driver's testdata — the streaming file source glob-filters on
that exact file name).

Usage::

    python tools/gen_scaled_sf.py [--factor 5] \
        [--src /root/testdata/sf0.1] [--out /root/repo/.scale_test/sf0.5]

The output dir is gitignored: it is measurement scaffolding, regenerable,
and ~5x the sf0.1 footprint.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key columns to shift per table: {table: {column: stride_source_table}}
# stride is (max(key in stride_source_table's own key col) + 1), so shifted
# foreign keys keep referencing the matching shifted dimension rows.
KEYS = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
# which column defines each stride source
STRIDE_COL = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "events_user": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
COPY_ONCE = ["nation", "region"]


def write_single_file(df, dest: str) -> None:
    """Write a DataFrame as ONE parquet file at ``dest`` (driver layout)."""
    tmp = tempfile.mkdtemp(prefix="genout_", dir=os.path.dirname(dest))
    try:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, dest)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=5)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_test",
            "sf0.5",
        ),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.session import get_spark

    spark = get_spark(app_name="gen-scaled-sf")
    os.makedirs(args.out, exist_ok=True)

    strides: dict[str, int] = {}
    for name, col in STRIDE_COL.items():
        table = "events" if name == "events_user" else name
        df = spark.read.parquet(os.path.join(args.src, f"{table}.parquet"))
        strides[name] = int(df.agg(F.max(col)).collect()[0][0]) + 1

    for table in COPY_ONCE:
        shutil.copy(
            os.path.join(args.src, f"{table}.parquet"),
            os.path.join(args.out, f"{table}.parquet"),
        )
        print(f"  {table}: copied once (fixed dimension)")

    for table, shifts in KEYS.items():
        base = spark.read.parquet(os.path.join(args.src, f"{table}.parquet"))
        replicas = []
        for i in range(args.factor):
            rep = base
            for col, src in shifts.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(i * strides[src]))
            if i > 0 and table == "documents":
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w: F.concat(w, F.lit(f"_{i}")),
                        ),
                        " ",
                    ),
                )
                # The word-suffix rewrite lengthens the text; keep the
                # n_chars == length(text) column invariant on mutated
                # replicas so queries gating on n_chars while scanning text
                # measure a consistent distribution in the sweep.
                if "n_chars" in rep.columns:
                    rep = rep.withColumn(
                        "n_chars",
                        F.length("text").cast(dict(base.dtypes)["n_chars"]),
                    )
            if i > 0 and table == "embeddings":
                mask = i
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: F.when(
                            F.bit_count(j.bitwiseAND(F.lit(mask))) % 2 == 1, -x
                        ).otherwise(x),
                    ),
                )
            replicas.append(rep)
        out_df = replicas[0]
        for rep in replicas[1:]:
            out_df = out_df.unionByName(rep)
        dest = os.path.join(args.out, f"{table}.parquet")
        write_single_file(out_df, dest)
        print(f"  {table}: {args.factor}x -> {dest}")

    print(f"done: {args.out}")


if __name__ == "__main__":
    main()
