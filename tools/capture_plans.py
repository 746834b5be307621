"""Capture `.explain("formatted")` before/after files for touched queries.

Usage:
    python tools/capture_plans.py <round_dir> <suffix> <query> [query ...]

Writes plans/<round_dir>/<query>_<suffix>.txt for each BATCH query. For a
streaming query, the registered function cannot be explained statically, so
callers pass the query's charged static-build DataFrame via the special
form  <query>:build  handled per-query below (the micro-batch plan is pinned
by the streaming tests / progress metrics instead, as in r14).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def _explain_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def build_df(name: str, spark, sf_dir: str):
    """Static charged-build frames for streaming queries (the part a batch
    explain can see; the per-batch topology is covered by progress metrics)."""
    if name == "streaming_ann_screen:build":
        from kafka_streams_rosetta_demo_spark.operators.vectors import (
            hyperplane_band_keys,
            hyperplanes,
        )
        from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

        corpus = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        return hyperplane_band_keys(corpus, hyperplanes(dim=64, n=64, seed=7), bands=4)
    if name == "dedup_minhash_lsh:build":
        # the charged signature build (memoized behind a localCheckpoint pin,
        # so the consumer query's own plan shows Scan ExistingRDD — this is
        # the frame the kernel actually changes)
        from kafka_streams_rosetta_demo_spark.operators.textsim import (
            minhash_signature,
            with_shingles,
        )
        from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        return minhash_signature(with_shingles(docs, k=3))
    raise KeyError(name)


def main() -> None:
    round_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    os.makedirs(os.path.join("plans", round_dir), exist_ok=True)
    for name in names:
        if ":" in name:
            df = build_df(name, spark, sf_dir)
            fname = name.replace(":", "_")
        else:
            df = registry[name].fn(spark, sf_dir)
            fname = name
        out = os.path.join("plans", round_dir, f"{fname}_{suffix}.txt")
        with open(out, "w", encoding="utf-8") as fh:
            fh.write(_explain_str(df))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
