"""Arrow-vectorized kernels for the heaviest per-row vector math.

Why this module exists (optimization round 14, guide §4.2): the vector
operators in :mod:`operators.vectors` express dot products and squared-L2
distances as ``aggregate``/``zip_with`` higher-order functions. HOFs are
``CodegenFallback`` expressions — every element step runs interpreted with a
lambda closure and a per-step array allocation, so a shape like the PQ
encoder (8 subspaces × 16 codebook entries × 8-dim squared distances
= 128 folds per row) costs milliseconds PER ROW. Unrolling into explicit
arithmetic was measured and rejected: a 32-centroid argmax inlines into one
~2000-term expression, blows the 64 KB codegen method limit, and the
interpreted fallback is SLOWER than the HOFs (5.4 s vs 2.9 s on the assign
shape). The guide's §4.2 answer is the one that works: hand whole Arrow
batches to NumPy. Measured on the 2000-row sf0.1 embeddings table,
same-session A/B: PQ encode+reconstruct 6.34 s → 0.38 s, IVF assign
1.81 s → 1.09 s.

Scale story (unchanged from the JVM versions): every kernel is a NARROW map
over the corpus scan — no shuffle, no driver data movement; the model state
(centroid matrix, codebooks, capped query set) rides in the task closure
exactly as the literal arrays did. ``mapInArrow`` receives only the columns
the caller selected (guide §4.1: project before the Python boundary).

BIT-EXACTNESS CONTRACT: each kernel reproduces its JVM fold EXACTLY.
The folds accumulate left-to-right over the element index
(``acc = (acc + term_i)`` for i ascending, starting from 0.0); the kernels
run the same loop over the dim axis with float64 IEEE adds/multiplies,
vectorized across ROWS (which does not touch per-row operation order). The
float32 → float64 widening (``CAST(x AS DOUBLE)``) is exact in both
engines. Equality is pinned row-for-row against the HOF twins in
tests/test_veckernels.py, and every consuming query keeps its DuckDB
oracle, which replays the same sequential arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _as_f64_matrix(list_arr, n_rows: int, dim: int, what: str):
    """(n, dim) float64 matrix from an Arrow list array — exact widening.

    Refuses nulls/ragged rows loudly: the vector tables guarantee fixed
    ``dim`` non-null embeddings (the oracles hardcode the same bound), and
    a silent partial fold here could not match the JVM twin anyway.
    """
    import numpy as np

    if list_arr.null_count:
        raise ValueError(f"{what}: null vectors are not supported")
    flat = list_arr.flatten()
    vals = np.asarray(flat.to_numpy(zero_copy_only=False))
    if vals.size != n_rows * dim:
        raise ValueError(
            f"{what}: expected fixed {dim}-dim vectors, got {vals.size} values for {n_rows} rows"
        )
    return vals.astype(np.float64).reshape(n_rows, dim)


def _seq_l2(vec: list[float]) -> float:
    """sqrt of the left-assoc sum of squares — operators.vectors._l2."""
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def ivf_assign_arrow(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out: str = "cell_id",
) -> DataFrame:
    """Arrow twin of :func:`operators.vectors.ivf_assign_hof` — nearest
    centroid by cosine, ties to the LARGER cell id (Spark's struct
    ``array_max`` ordering), appended as an int64 column. All other input
    columns pass through unchanged. Zero-norm vectors/centroids raise, the
    same loud failure the JVM twin's ANSI division produces.
    """
    import numpy as np
    import pyarrow as pa

    cids = [int(cid) for cid, _ in centroids]
    cmat = np.array([c for _, c in centroids], dtype=np.float64)  # k x dim
    cnrm = np.array([_seq_l2(c) for _, c in centroids], dtype=np.float64)
    dim = cmat.shape[1]
    order = sorted(range(len(cids)), key=lambda j: cids[j])  # scan ascending cid

    if any(x == 0.0 for x in cnrm):
        raise ValueError(
            "ivf_assign_arrow: zero-norm centroid — cosine undefined "
            "(the JVM twin raises DIVIDE_BY_ZERO under ANSI)"
        )

    def fn(batches):
        for b in batches:
            n = len(b)
            if n == 0:
                continue
            vals = _as_f64_matrix(b.column(vec_col), n, dim, "ivf_assign_arrow")
            dots = np.zeros((n, len(cids)), dtype=np.float64)
            nsq = np.zeros(n, dtype=np.float64)
            for i in range(dim):  # ascending element order = the fold's order
                xi = vals[:, i]
                dots += xi[:, None] * cmat[:, i][None, :]
                nsq = nsq + xi * xi
            if np.any(nsq == 0.0):
                # failure-mode parity with the JVM twin: under ANSI the
                # cosine's division raises on a zero-norm vector — a silent
                # NaN here would be a cross-engine divergence
                raise ValueError(
                    "ivf_assign_arrow: zero-norm vector — cosine undefined "
                    "(the JVM twin raises DIVIDE_BY_ZERO under ANSI)"
                )
            cos = dots / (np.sqrt(nsq)[:, None] * cnrm[None, :])
            best = np.full(n, -np.inf)
            bestcid = np.zeros(n, dtype=np.int64)
            for j in order:  # ascending cid: later take = larger cid wins ties
                c = cos[:, j]
                take = (c > best) | (c == best)
                best = np.where(take, c, best)
                bestcid = np.where(take, cids[j], bestcid)
            yield pa.record_batch(
                [b.column(i) for i in range(b.num_columns)]
                + [pa.array(bestcid, type=pa.int64())],
                names=b.schema.names + [out],
            )

    schema = T.StructType(df.schema.fields + [T.StructField(out, T.LongType())])
    return df.mapInArrow(fn, schema)


def hyperplane_bands_arrow(
    df: DataFrame,
    planes: list[list[float]],
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow twin of :func:`operators.vectors.hyperplane_band_keys_hof` —
    sign-bit signatures over the literal hyperplane matrix, folded into
    ``bands`` integer band keys and exploded to (id, band_id, band_key)
    rows (``bands`` output rows per input row, band_id ascending — the
    JVM twin's ``explode(array(...))`` order).

    Optimization round 15 (guide §4.2): the 64-plane signature is the
    hottest remaining HOF fold — ``multi_dot`` runs |planes| × dim
    interpreted ``aggregate``/``zip_with`` steps per row (4096 at the
    64×64 shape) with a per-step array allocation. Round 14's first
    numpy probe saw "no win" because it timed a full query whose cost was
    elsewhere; measured on the charged band-index build itself the kernel
    is the same 3-5× the other veckernels showed (numbers in
    OPTIMIZATION_r15.md).

    BIT-EXACTNESS: the running-dots accumulator updates in ascending
    element order (``dots += x_i * P[:, i]``) — the identical
    left-associative float64 sequence as the JVM fold. The sign test
    mirrors Spark SQL's total ordering, where NaN is GREATER than every
    value (so ``NaN >= 0`` is true and a NaN dot sets its bit — unlike
    IEEE/numpy ``>=``): ``(dot >= 0) | isnan(dot)``. The band-key bit sum
    is integer, order-exact. Pinned row-for-row against the HOF twin in
    tests/test_veckernels.py, including a NaN-poisoned vector.
    """
    import numpy as np
    import pyarrow as pa

    pmat = np.array(planes, dtype=np.float64)  # n_planes x dim
    n_planes, dim = pmat.shape
    if n_planes % bands:
        raise ValueError(f"{n_planes} planes do not split into {bands} bands")
    rows_per_band = n_planes // bands
    if rows_per_band > 62:
        raise ValueError("band keys past 62 bits overflow the long bit sum")

    def fn(batches):
        for b in batches:
            n = len(b)
            if n == 0:
                continue
            vals = _as_f64_matrix(b.column(vec_col), n, dim, "hyperplane_bands_arrow")
            dots = np.zeros((n, n_planes), dtype=np.float64)
            for i in range(dim):  # ascending element order = the fold's order
                dots += vals[:, i][:, None] * pmat[:, i][None, :]
            # Spark SQL's NaN-greatest total order: NaN >= 0 is TRUE there
            bits = (dots >= 0.0) | np.isnan(dots)
            weights = (np.int64(1) << np.arange(rows_per_band, dtype=np.int64))
            # (n, bands): integer bit sums — order-exact regardless of assoc
            keys = (
                bits.reshape(n, bands, rows_per_band).astype(np.int64) * weights
            ).sum(axis=2)
            idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
            yield pa.record_batch(
                [
                    b.column(id_col).take(idx),
                    pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                    pa.array(keys.reshape(-1)),
                ],
                names=[id_col, "band_id", "band_key"],
            )

    id_field = df.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("band_id", T.IntegerType()),
            T.StructField("band_key", T.LongType()),
        ]
    )
    return df.select(id_col, vec_col).mapInArrow(fn, schema)


def pq_encode_recon_arrow(
    df: DataFrame, cb: list[list[list[float]]], vec_col: str = "embedding"
) -> DataFrame:
    """Arrow twin of the PQ encode+reconstruct projection
    (pipeline_queries._pq_recon_frame): per subspace, the nearest codebook
    entry by squared L2 (FIRST index on ties — ``array_position`` of
    ``array_min``), reconstruction = concatenated codebook entries.
    Output: the input columns plus ``recon array<double>``.
    """
    import numpy as np
    import pyarrow as pa

    cbm = np.array(cb, dtype=np.float64)  # m x k x sub_dim
    n_sub, _k, sub_dim = cbm.shape
    dim = n_sub * sub_dim

    def fn(batches):
        for b in batches:
            n = len(b)
            if n == 0:
                continue
            vals = _as_f64_matrix(b.column(vec_col), n, dim, "pq_encode_recon_arrow")
            recon = np.empty((n, dim), dtype=np.float64)
            for m in range(n_sub):
                sub = vals[:, m * sub_dim : (m + 1) * sub_dim]
                d = np.zeros((n, cbm.shape[1]), dtype=np.float64)
                for i in range(sub_dim):  # the fold's ascending element order
                    diff = sub[:, i][:, None] - cbm[m, :, i][None, :]
                    d += diff * diff
                idx = np.argmin(d, axis=1)  # first occurrence = smaller index
                recon[:, m * sub_dim : (m + 1) * sub_dim] = cbm[m][idx]
            offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
            recon_arr = pa.ListArray.from_arrays(offsets, pa.array(recon.reshape(-1)))
            yield pa.record_batch(
                [b.column(i) for i in range(b.num_columns)] + [recon_arr],
                names=b.schema.names + ["recon"],
            )

    schema = T.StructType(
        df.schema.fields + [T.StructField("recon", T.ArrayType(T.DoubleType()))]
    )
    return df.mapInArrow(fn, schema)
