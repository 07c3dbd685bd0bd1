"""Mergeable HyperLogLog count-distinct — the approximate scale path the
exact pair-partition count-distinct (driver_queries.e_daily_active)
documents.

Why a sketch: exact distinct over 10^12 rows must shuffle every distinct
key once; an HLL register array is a FIXED 2^p bytes per partial and
merges with an elementwise max — associative and commutative, so any
combine tree (per-batch → per-node → global) yields the identical
registers.  Standard estimator with the small-range linear-counting
correction (Flajolet et al. 2007, public algorithm).

Determinism: the 64-bit hash is pandas' stable row hash (stable across
processes, unlike Python's seeded ``hash``), so the same input always
produces the same registers and estimate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def hll_partial(values, p: int = 14) -> np.ndarray:
    """Register array (uint8[2^p]) for one batch of values (any dtype a
    pandas Series accepts).  Low ``p`` hash bits pick the register; the
    rank of the first set bit of the remaining ``64-p`` bits (from the
    top) is the register candidate."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    s = pd.Series(values)
    if not len(s):
        return regs
    h = pd.util.hash_pandas_object(s, index=False).to_numpy()
    bucket = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)  # 64-p ≤ 50 bits for p ≥ 14 → exact as float64
    nbits = 64 - p
    # rho = number of leading zeros of w (within nbits) + 1; w == 0 → nbits+1
    lz = np.full(len(w), nbits + 1, np.uint8)
    nz = w > 0
    lz[nz] = (nbits - np.floor(np.log2(w[nz].astype(np.float64)))) \
        .astype(np.uint8)
    np.maximum.at(regs, bucket, lz)
    return regs


def hll_merge(parts) -> np.ndarray:
    """Elementwise max of register arrays — the mergeable-combine step."""
    parts = list(parts)
    if not parts:
        return np.zeros(1 << 14, np.uint8)
    return np.maximum.reduce(parts)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with the linear-counting small-range
    correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, column: str, p: int = 14) -> int:
    """Approximate distinct count of ``column``: per-batch register
    partials (fixed 2^p bytes each) merged on the driver — the fixed-size
    narrow stream is the entire shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        col = b[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        regs = hll_partial(col.to_pandas(), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ray.get(ds.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True).to_arrow_refs())
    regs = hll_merge(np.frombuffer(blob, np.uint8)
                     for t in parts for blob in t["regs"].to_pylist())
    return int(round(hll_estimate(regs)))
