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
from pyspark.sql import types as T

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


# ---------------------------------------------------------------------------
# Frame sampling (video-shaped), resample (audio-shaped), resize (image-shaped)
# ---------------------------------------------------------------------------
#
# Real media would go through decode_media() first; here the 'raw' codec's
# deterministic byte layout stands in (fixed-size frames / a 1-D sample
# stream / a square grayscale plane), so every operator below is exact,
# engine-reproducible math over real Spark plumbing: Arrow batches through
# mapInPandas, including the 1->N row shape frame extraction needs.

FRAME_BYTES = 64
FRAME_EVERY_N = 3

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Split each payload into fixed 64-byte frames (dropping a partial
    tail frame, as a codec would) and keep every 3rd frame — the
    frame-sampling step of a video pipeline. Emits 0..N rows per input row:
    the mapInPandas contract is a batch iterator, not a row mapper, so
    fan-out costs nothing extra."""
    decode = decode_media("raw")
    for pdf in batches:
        doc_ids, idxs, frames = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            buf = decode(bytes(payload))
            for i in range(0, len(buf) // FRAME_BYTES):
                if i % FRAME_EVERY_N:
                    continue
                doc_ids.append(doc_id)
                idxs.append(i)
                frames.append(buf[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
        yield pd.DataFrame({"doc_id": doc_ids, "frame_idx": idxs, "frame": frames})


def sample_frames(assets: DataFrame) -> DataFrame:
    """Run the frame sampler over the binary column via ``mapInPandas``."""
    return assets.select("doc_id", "content").mapInPandas(
        frame_sample_batches, schema=FRAME_SCHEMA
    )


RESAMPLE_OUT = 16

RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("value", T.LongType()),
    ]
)


def resample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Downsample each payload's byte stream to 16 buckets (floor of the
    bucket mean — integer math, exact in every engine): the resample step
    of an audio pipeline. Byte j lands in bucket j*16 // n."""
    import numpy as np

    decode = decode_media("raw")
    for pdf in batches:
        doc_ids, buckets, values = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            buf = np.frombuffer(decode(bytes(payload)), dtype=np.uint8)
            n = len(buf)
            if n < RESAMPLE_OUT:
                continue
            idx = (np.arange(n, dtype=np.int64) * RESAMPLE_OUT) // n
            sums = np.bincount(idx, weights=buf, minlength=RESAMPLE_OUT)
            counts = np.bincount(idx, minlength=RESAMPLE_OUT)
            vals = (sums // counts).astype(np.int64)
            doc_ids.extend([doc_id] * RESAMPLE_OUT)
            buckets.extend(range(RESAMPLE_OUT))
            values.extend(int(v) for v in vals)
        yield pd.DataFrame({"doc_id": doc_ids, "bucket": buckets, "value": values})


def resample_audio(assets: DataFrame) -> DataFrame:
    """Run the resampler over the binary column via ``mapInPandas``."""
    return assets.select("doc_id", "content").mapInPandas(
        resample_batches, schema=RESAMPLE_SCHEMA
    )


RESIZE_OUT = 8

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("side", T.LongType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Treat each payload as a square grayscale plane (side = isqrt(len),
    tail truncated) and block-mean-pool it to 8x8 — the resize step of an
    image pipeline. Floor-of-mean integer math; pixel (i, j) pools into
    (i*8 // side, j*8 // side), so uneven blocks are handled exactly."""
    import numpy as np

    decode = decode_media("raw")
    for pdf in batches:
        doc_ids, sides, pix = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            buf = np.frombuffer(decode(bytes(payload)), dtype=np.uint8)
            side = math.isqrt(len(buf))
            if side < RESIZE_OUT:
                continue
            img = buf[: side * side].reshape(side, side).astype(np.int64)
            ri = (np.arange(side) * RESIZE_OUT) // side
            out = np.zeros((RESIZE_OUT, RESIZE_OUT), dtype=np.int64)
            cnt = np.zeros((RESIZE_OUT, RESIZE_OUT), dtype=np.int64)
            np.add.at(out, (ri[:, None].repeat(side, 1), ri[None, :].repeat(side, 0)), img)
            np.add.at(cnt, (ri[:, None].repeat(side, 1), ri[None, :].repeat(side, 0)), 1)
            doc_ids.append(doc_id)
            sides.append(side)
            pix.append(bytes((out // cnt).astype(np.uint8).ravel()))
        yield pd.DataFrame({"doc_id": doc_ids, "side": sides, "pixels": pix})


def resize_images(assets: DataFrame) -> DataFrame:
    """Run the resizer over the binary column via ``mapInPandas``."""
    return assets.select("doc_id", "content").mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA
    )


def expected_frames(doc_id: int, payload: bytes) -> list[tuple[int, int, bytes]]:
    """Pure-Python twin of :func:`frame_sample_batches` for tests."""
    return [
        (doc_id, i, payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
        for i in range(0, len(payload) // FRAME_BYTES)
        if i % FRAME_EVERY_N == 0
    ]


def expected_resample(payload: bytes) -> list[tuple[int, int]]:
    """Pure-Python twin of :func:`resample_batches` for tests."""
    n = len(payload)
    if n < RESAMPLE_OUT:
        return []
    sums = [0] * RESAMPLE_OUT
    counts = [0] * RESAMPLE_OUT
    for j, b in enumerate(payload):
        k = j * RESAMPLE_OUT // n
        sums[k] += b
        counts[k] += 1
    return [(k, sums[k] // counts[k]) for k in range(RESAMPLE_OUT)]


def expected_resize(payload: bytes) -> tuple[int, bytes] | None:
    """Pure-Python twin of :func:`resize_batches` for tests."""
    side = math.isqrt(len(payload))
    if side < RESIZE_OUT:
        return None
    sums = [[0] * RESIZE_OUT for _ in range(RESIZE_OUT)]
    counts = [[0] * RESIZE_OUT for _ in range(RESIZE_OUT)]
    for i in range(side):
        for j in range(side):
            r, c = i * RESIZE_OUT // side, j * RESIZE_OUT // side
            sums[r][c] += payload[i * side + j]
            counts[r][c] += 1
    return side, bytes(
        sums[r][c] // counts[r][c] for r in range(RESIZE_OUT) for c in range(RESIZE_OUT)
    )
