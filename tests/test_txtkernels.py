"""Bit-equality pins for the NumPy XXH64 / MinHash Arrow kernel (round 15)."""

from __future__ import annotations

import pytest


def test_numpy_xxh64_matches_jvm_all_tail_shapes(spark):
    # Direct pin of the NumPy XXH64 against Spark's xxhash64(lit(j), s) for
    # every byte-length residue class: 0 (empty), 1..7 (byte/4-byte tails),
    # 8/16/24 (word loop), 32/33/64/71 (stripe path + every tail after it),
    # plus multi-byte UTF-8 (hashes the UTF-8 bytes, not code points).
    import numpy as np

    from kafka_streams_rosetta_demo_spark.operators.txtkernels import (
        _prep_strings,
        _xxh64_bytes_batch,
        hash_int_scalar,
    )

    strings = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "abcde",
        "abcdef",
        "abcdefg",
        "abcdefgh",
        "0123456789abcdef",
        "0123456789abcdef01234567",
        "0123456789abcdef0123456789abcdef",  # exactly 32 -> one stripe
        "0123456789abcdef0123456789abcdef0",  # 33 -> stripe + byte tail
        "0123456789abcdef0123456789abcdef0123456789abcdef0123456789abcdef",
        "0123456789abcdef0123456789abcdef0123456"
        "789abcdef0123456789abcdef0123456",  # 71 -> 2 stripes + word + 4B + 3B
        "héllo wörld",  # multi-byte UTF-8
        "naïve café über",
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    for j in (0, 1, 63):
        expected = [
            r[0]
            for r in df.select(F.xxhash64(F.lit(j), F.col("s"))).collect()
        ]
        data = "".join(strings).encode("utf-8")
        lens = np.array([len(s.encode("utf-8")) for s in strings], dtype=np.int64)
        starts = np.zeros(len(strings), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        ctx = _prep_strings(starts, lens, np.frombuffer(data, dtype=np.uint8))
        got = (
            _xxh64_bytes_batch(ctx, hash_int_scalar(j, 42))
            .view(np.int64)
            .tolist()
        )
        assert got == expected, f"seed j={j}"


def test_minhash_kernel_matches_hof(spark, sf_correctness):
    # Row-for-row signature equality over the real corpus plus planted edge
    # docs: a doc whose only shingle exceeds 32 bytes (stripe path), a doc
    # with an empty shingle array (fold initializer row), and a null array
    # (the HOF's coalesce guard yields an empty array).
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.operators.textsim import (
        minhash_signature_hof,
        with_shingles,
    )
    from kafka_streams_rosetta_demo_spark.operators.txtkernels import (
        minhash_signature_arrow,
    )
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    docs = load_table(spark, sf_correctness, "documents").select("doc_id", "text")
    shingled = with_shingles(docs, k=3).select("doc_id", "shingles")
    special = spark.createDataFrame(
        [
            (10_000_000, ["supercalifragilisticexpialidocious hyperplane signature"]),
            (10_000_001, []),
            (10_000_002, None),
        ],
        "doc_id bigint, shingles array<string>",
    )
    allv = shingled.unionByName(special)
    a = minhash_signature_hof(allv).orderBy("doc_id").collect()
    b = minhash_signature_arrow(allv).orderBy("doc_id").collect()
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert (ra["doc_id"], ra["minhash"]) == (rb["doc_id"], rb["minhash"])
    by_id = {r["doc_id"]: r["minhash"] for r in b}
    assert by_id[10_000_001] == [1 << 62] * 64  # empty fold = initializer
    assert by_id[10_000_002] == []  # null -> coalesce guard


def test_minhash_kernel_env_opt_in(spark, monkeypatch):
    # the JVM fold is the measured default (the fold is not the bottleneck
    # at scan parallelism — OPTIMIZATION_r15.md); the kernel is the pinned
    # opt-in experiment
    from kafka_streams_rosetta_demo_spark.operators.textsim import minhash_signature

    df = spark.createDataFrame(
        [(1, ["a b c"])], "doc_id bigint, shingles array<string>"
    )
    monkeypatch.delenv("SPARK_GRAFT_MINHASH_KERNEL", raising=False)
    plan_default = minhash_signature(df)._jdf.queryExecution().executedPlan().toString()
    monkeypatch.setenv("SPARK_GRAFT_MINHASH_KERNEL", "1")
    plan_on = minhash_signature(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan_default
    assert "MapInArrow" in plan_on
