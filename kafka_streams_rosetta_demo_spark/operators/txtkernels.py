"""Arrow-vectorized kernels for the heaviest per-row TEXT hashing.

Optimization round 15 (guide §4.2), the text-side sibling of
:mod:`operators.veckernels`: the MinHash signature fold in
:mod:`operators.textsim` runs ``64 × |shingles|`` interpreted ``xxhash64``
evaluations per document plus a ``zip_with``/``least`` merge per shingle —
a ``CodegenFallback`` HOF whose per-step cost dwarfs the hash arithmetic.
This module reimplements Spark's exact XXH64 (the
``org.apache.spark.sql.catalyst.expressions.XXH64`` variant of xxHash64:
seed chaining across fields, specialized int/long paths, little-endian word
reads) in NumPy over whole Arrow batches, so the signature becomes a few
thousand vectorized array ops per batch instead of millions of interpreted
expression steps.

BIT-EXACTNESS CONTRACT: ``xxhash64(lit(j), s)`` in the JVM is
``hashUnsafeBytes(utf8(s), seed = hashInt(j, 42))``. Every round, rotation,
and prime multiply below reproduces that arithmetic in uint64 (NumPy's
unsigned wraparound == Java's two's-complement long wraparound); the final
per-document minimum is a SIGNED int64 min, exactly the JVM ``least`` fold,
clamped by the same ``1 << 62`` fold initializer. Equality is pinned
row-for-row against the HOF twin in tests/test_txtkernels.py (including a
>32-byte shingle that exercises the 32-byte stripe path, and 8/4/1-byte
tails), and every consuming query keeps its DuckDB oracle.

Scale story: a NARROW per-row map — no shuffle, no driver movement; only
(id, shingles) crosses the Arrow boundary (guide §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# xxHash64 primes — public constants of the algorithm
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_SPARK_SEED = 42  # XxHash64's fixed default seed
_FOLD_INIT = 1 << 62  # minhash_signature's running-minimum initializer


def _u64(x: int):
    import numpy as np

    return np.uint64(x & 0xFFFFFFFFFFFFFFFF)


def _rotl(x, r: int):
    import numpy as np

    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix64(h):
    import numpy as np

    h = h ^ (h >> np.uint64(33))
    h = h * _u64(_P2)
    h = h ^ (h >> np.uint64(29))
    h = h * _u64(_P3)
    h = h ^ (h >> np.uint64(32))
    return h


def hash_int_scalar(i: int, seed: int) -> int:
    """Spark XXH64.hashInt — the IntegerType field path (e.g. ``lit(j)``).
    Scalar: used only to derive the 64 per-position seeds."""
    import numpy as np

    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        h = _u64(seed) + _u64(_P5) + np.uint64(4)
        h = h ^ (_u64(i & 0xFFFFFFFF) * _u64(_P1))
        h = _rotl(h, 23) * _u64(_P2) + _u64(_P3)
        return int(_fmix64(h))


def _xxh64_bytes_batch(ctx: dict, seed: int):
    """XXH64 of every string in the prepared batch ``ctx`` under ``seed``,
    as an (n,) uint64 array. ``ctx`` comes from :func:`_prep_strings` and is
    shared across seeds — everything seed-independent (padded word matrix,
    per-word stripe inputs, precomputed tail terms) is computed once.
    """
    import numpy as np

    n = ctx["n"]
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = ctx["lens_u64"]
    np.seterr(over="ignore")  # uint64 wraparound IS the algorithm
    seed_u = _u64(seed)

    # --- 32-byte stripe prefix (rare for word shingles, exact when hit)
    n_stripes = ctx["n_stripes"]
    max_stripes = ctx["max_stripes"]
    if max_stripes:
        W = ctx["W"]
        v1 = np.full(n, seed_u + _u64(_P1) + _u64(_P2), dtype=np.uint64)
        v2 = np.full(n, seed_u + _u64(_P2), dtype=np.uint64)
        v3 = np.full(n, seed_u, dtype=np.uint64)
        v4 = np.full(n, seed_u - _u64(_P1), dtype=np.uint64)
        for s in range(max_stripes):
            m = n_stripes > s
            base = 4 * s
            v1 = np.where(m, _rotl(v1 + W[:, base] * _u64(_P2), 31) * _u64(_P1), v1)
            v2 = np.where(m, _rotl(v2 + W[:, base + 1] * _u64(_P2), 31) * _u64(_P1), v2)
            v3 = np.where(m, _rotl(v3 + W[:, base + 2] * _u64(_P2), 31) * _u64(_P1), v3)
            v4 = np.where(m, _rotl(v4 + W[:, base + 3] * _u64(_P2), 31) * _u64(_P1), v4)
        hs = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            hs = (hs ^ (_rotl(v * _u64(_P2), 31) * _u64(_P1))) * _u64(_P1) + _u64(_P4)
        h = np.where(n_stripes > 0, hs, seed_u + _u64(_P5))
    else:
        h = np.full(n, seed_u + _u64(_P5), dtype=np.uint64)

    h = h + lens

    # --- full 8-byte words after the stripes: h ^= rotl(k*P2,31)*P1 ; then
    # h = rotl(h,27)*P1 + P4. rotl(k*P2,31)*P1 is seed-independent -> ctx.
    K = ctx["K"]  # (n, max_words) precomputed word terms
    n_words = ctx["n_words"]
    first_word = 4 * n_stripes if max_stripes else ctx["zeros_i64"]
    for w in range(ctx["max_words"]):
        m = (w >= first_word) & (w < n_words)
        upd = _rotl(h ^ K[:, w], 27) * _u64(_P1) + _u64(_P4)
        h = np.where(m, upd, h)

    # --- 4-byte tail: h ^= (u32 * P1) ; h = rotl(h,23)*P2 + P3
    t4 = ctx["t4_term"]  # u32 * P1, garbage where absent
    upd = _rotl(h ^ t4, 23) * _u64(_P2) + _u64(_P3)
    h = np.where(ctx["has4"], upd, h)

    # --- byte tail (0..3 bytes): h ^= (b * P5) ; h = rotl(h,11)*P1
    for t in range(3):
        bt = ctx["byte_terms"][t]
        upd = _rotl(h ^ bt, 11) * _u64(_P1)
        h = np.where(t < ctx["n_tail_bytes"], upd, h)

    return _fmix64(h)


def _pad_strings(starts, lens, data):
    """Zero-padded (n, Lp) uint8 byte matrix of a flat UTF-8 string batch."""
    import numpy as np

    n = len(lens)
    maxlen = int(lens.max()) if n else 0
    Lp = max(8, ((maxlen + 7) // 8) * 8)
    pos = np.arange(Lp, dtype=np.int64)
    mask = pos[None, :] < lens[:, None]
    flat_idx = starts[:, None] + pos[None, :]
    B = np.zeros((n, Lp), dtype=np.uint8)
    B[mask] = data[flat_idx[mask]]
    return B


def _unique_strings(B, lens):
    """(unique_row_indices, inverse) over (len, padded bytes) rows — exact
    string identity (zero padding cannot collide once the length rides in
    the key). This is the batch-level work sharing the JVM per-row fold can
    never express: word shingles repeat heavily across documents (measured
    9.6× at sf0.1), so each distinct string is hashed ONCE per batch and
    per-document minima gather from the unique table."""
    import numpy as np

    n, Lp = B.shape
    key = np.empty((n, Lp + 8), dtype=np.uint8)
    key[:, :8] = lens.astype("<u8").view(np.uint8).reshape(n, 8)
    key[:, 8:] = B
    voids = np.ascontiguousarray(key).view(
        np.dtype((np.void, Lp + 8))
    ).reshape(n)
    _, first_idx, inverse = np.unique(voids, return_index=True, return_inverse=True)
    return first_idx, inverse


def _prep_strings(starts, lens, data):
    """Seed-independent preprocessing of a flat UTF-8 string batch:
    zero-padded little-endian word matrix plus precomputed tail terms."""
    if len(lens) == 0:
        return {"n": 0}
    return _prep_padded(_pad_strings(starts, lens, data), lens)


def _prep_padded(B, lens):
    import numpy as np

    n, Lp = B.shape
    ctx: dict = {"n": n}

    W = B.view("<u8").reshape(n, Lp // 8)  # little-endian, Platform.getLong
    n_words = (lens // 8).astype(np.int64)
    n_stripes = np.where(lens >= 32, lens // 32, 0).astype(np.int64)
    ctx["lens_u64"] = lens.astype(np.uint64)
    ctx["W"] = W
    ctx["K"] = _rotl(W * _u64(_P2), 31) * _u64(_P1)
    ctx["n_words"] = n_words
    ctx["max_words"] = int(n_words.max())
    ctx["n_stripes"] = n_stripes
    ctx["max_stripes"] = int(n_stripes.max())
    ctx["zeros_i64"] = np.zeros(n, dtype=np.int64)

    rows = np.arange(n)
    rem = lens % 8
    off4 = np.minimum(lens & ~np.int64(7), Lp - 4)
    t4 = (
        B[rows, off4].astype(np.uint64)
        | (B[rows, off4 + 1].astype(np.uint64) << np.uint64(8))
        | (B[rows, off4 + 2].astype(np.uint64) << np.uint64(16))
        | (B[rows, off4 + 3].astype(np.uint64) << np.uint64(24))
    )
    ctx["has4"] = rem >= 4
    ctx["t4_term"] = t4 * _u64(_P1)
    byte_start = (lens & ~np.int64(7)) + np.where(rem >= 4, 4, 0)
    ctx["n_tail_bytes"] = rem - np.where(rem >= 4, 4, 0)
    ctx["byte_terms"] = [
        B[rows, np.minimum(byte_start + t, Lp - 1)].astype(np.uint64) * _u64(_P5)
        for t in range(3)
    ]
    return ctx


def minhash_signature_arrow(
    shingled: DataFrame, id_col: str = "doc_id", n_hashes: int = 64
) -> DataFrame:
    """Arrow twin of :func:`operators.textsim.minhash_signature_hof`:
    ``minhash[j] = min over shingles of xxhash64(lit(j), shingle)`` as one
    ``array<long>`` column, computed by the NumPy XXH64 above. Null
    ``shingles`` mirror the HOF's coalesce guard (empty array out); an
    empty (non-null) array yields the untouched ``1 << 62`` initializer
    row, exactly the JVM fold over zero elements.
    """
    import numpy as np
    import pyarrow as pa

    seeds = [hash_int_scalar(j, _SPARK_SEED) for j in range(n_hashes)]

    def fn(batches):
        for b in batches:
            nd = len(b)
            if nd == 0:
                continue
            lst = b.column("shingles")
            if isinstance(lst, pa.ChunkedArray):  # defensive; batches are flat
                lst = lst.combine_chunks()
            null_doc = (
                np.asarray(lst.is_null()) if lst.null_count else np.zeros(nd, bool)
            )
            counts = np.asarray(
                pa.compute.list_value_length(lst).fill_null(0), dtype=np.int64
            )
            sf = lst.flatten()  # respects list offsets and nulls
            sbuf = sf.buffers()
            soff = np.frombuffer(sbuf[1], dtype=np.int32)[
                sf.offset : sf.offset + len(sf) + 1
            ].astype(np.int64)
            data = (
                np.frombuffer(sbuf[2], dtype=np.uint8)
                if sbuf[2] is not None
                else np.zeros(0, dtype=np.uint8)
            )
            starts, lens = soff[:-1], np.diff(soff)
            if len(lens):
                B = _pad_strings(starts, lens, data)
                first_idx, inverse = _unique_strings(B, lens)
                ctx = _prep_padded(B[first_idx], lens[first_idx])
            else:
                inverse = np.zeros(0, dtype=np.int64)
                ctx = {"n": 0}

            doc_starts = np.zeros(nd, dtype=np.int64)
            np.cumsum(counts[:-1], out=doc_starts[1:])
            out = np.full((nd, n_hashes), np.int64(_FOLD_INIT), dtype=np.int64)
            nonempty = counts > 0
            for j, seed in enumerate(seeds):
                hu = _xxh64_bytes_batch(ctx, seed).view(np.int64)  # SIGNED min
                if len(hu):
                    h = hu[inverse]  # scatter back to instance order
                    mins = np.minimum.reduceat(h, doc_starts)
                    out[nonempty, j] = np.minimum(
                        mins[nonempty], np.int64(_FOLD_INIT)
                    )
            # assemble list<int64>: 64 per doc, empty where shingles was null
            sizes = np.where(null_doc, 0, n_hashes)
            offsets = np.zeros(nd + 1, dtype=np.int32)
            np.cumsum(sizes, out=offsets[1:])
            values = out[~null_doc].reshape(-1)
            arr = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(values, type=pa.int64())
            )
            yield pa.record_batch([b.column(id_col), arr], names=[id_col, "minhash"])

    id_field = shingled.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("minhash", T.ArrayType(T.LongType(), False)),
        ]
    )
    return shingled.select(id_col, "shingles").mapInArrow(fn, schema)
