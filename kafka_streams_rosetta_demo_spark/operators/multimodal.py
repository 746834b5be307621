"""Multimodal (binary) column operators.

North-star scope: a 100 TB training-data pipeline carries images/audio/video
as opaque ``binary`` columns with typed metadata structs, and runs
decode / feature-extract steps as Arrow-batched Python over ``mapInPandas``.
The media codec libraries are not available in this environment, so the
*decode* step is stubbed behind :func:`decode_media` (clearly-marked
``NotImplementedError``), while everything Spark-side — schema, batching,
partition-preserving execution, the Pandas-UDF signature — is real and
tested, plus one genuinely computable featurizer (byte-level statistics) so
the Arrow path is exercised end to end.

Scale: ``mapInPandas`` streams Arrow record batches through Python with no
shuffle — featurization is embarrassingly parallel. Binary payloads stay in
Arrow buffers (no per-row Python object churn); at 100 TB the knob that
matters is ``spark.sql.execution.arrow.maxRecordsPerBatch`` vs. media size
so a batch of blobs fits executor memory.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_mean double, byte_entropy double"
)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Model the ``documents`` table as a multimodal asset table:
    ``(doc_id, content binary, meta struct<codec, n_bytes, content_md5>)``.

    The testdata has no real media, so the UTF-8 bytes of ``text`` stand in
    for the payload with codec tag ``'raw'`` — the schema and downstream
    plumbing are exactly what a jpeg/wav column would use.
    """
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        content.alias("content"),
        F.struct(
            F.lit("raw").alias("codec"),
            F.length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("content_md5"),
        ).alias("meta"),
    )


def decode_media(codec: str):
    """STUB — media decode requires codec libraries (Pillow/ffmpeg/...) not
    present in this environment. ``'raw'`` payloads pass through; anything
    else raises until a decoder is plugged in."""
    if codec == "raw":
        return lambda payload: payload
    raise NotImplementedError(
        f"decode_media({codec!r}): codec libraries are not available in this "
        "environment; plug a decoder in here (e.g. PIL.Image.open for jpeg)."
    )


def _round6(x: float) -> float:
    """floor(x*1e6 + 0.5)/1e6 — half-up quantize, identical in every engine.

    ``round(x, 6)`` is half-EVEN in Python but half-AWAY in DuckDB, and the
    two really do diverge on real data: byte means over power-of-two payload
    lengths are dyadic rationals (e.g. 11985/128 = 93.6328125) that hit the
    6-decimal half exactly. The floor form makes the tie-break explicit and
    engine-independent (values here are always >= 0).
    """
    return math.floor(x * 1e6 + 0.5) / 1e6


def byte_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch featurizer: per-payload byte mean and byte-entropy.

    This is the deterministic stand-in for an image/audio feature extractor —
    same signature, same batch shape, real math (numpy over the byte
    histogram), quantized to 6 decimals (:func:`_round6`) so results are
    engine-stable.
    """
    import numpy as np

    decode = decode_media("raw")
    for pdf in batches:
        n_bytes, means, ents = [], [], []
        for payload in pdf["content"]:
            buf = np.frombuffer(decode(bytes(payload)), dtype=np.uint8)
            n_bytes.append(len(buf))
            if len(buf) == 0:
                means.append(0.0)
                ents.append(0.0)
                continue
            means.append(_round6(float(buf.mean())))
            counts = np.bincount(buf, minlength=256)
            p = counts[counts > 0] / len(buf)
            ents.append(_round6(float(-(p * np.log2(p)).sum())))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "byte_mean": means,
                "byte_entropy": ents,
            }
        )


def extract_features(assets: DataFrame) -> DataFrame:
    """Run the featurizer over the binary column via ``mapInPandas``."""
    return assets.select("doc_id", "content").mapInPandas(
        byte_feature_batches, schema=FEATURE_SCHEMA
    )


def expected_features(payload: bytes) -> tuple[int, float, float]:
    """Pure-Python twin of :func:`byte_feature_batches` for tests."""
    n = len(payload)
    if n == 0:
        return 0, 0.0, 0.0
    mean = _round6(sum(payload) / n)
    counts: dict[int, int] = {}
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
    ent = _round6(-sum((c / n) * math.log2(c / n) for c in counts.values()))
    return n, mean, ent
