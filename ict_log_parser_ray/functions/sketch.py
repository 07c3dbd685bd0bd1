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
                                   zero_copy_batch=True).materialize().to_arrow_refs())
    regs = hll_merge(np.frombuffer(blob, np.uint8)
                     for t in parts for blob in t["regs"].to_pylist())
    return int(round(hll_estimate(regs)))


# ---------------------------------------------------------------------------
# DDSketch-style relative-error quantile sketch (Masson, Rim & Lee, VLDB'19 —
# public algorithm).  The approximate scale path that the exact
# histogram/grouped quantiles (functions/quantiles.py) document: an exact
# quantile over 10^12 CONTINUOUS values needs a shuffle bounded by distinct
# values; this sketch is a fixed small dict of log-bucket counts per partial
# and merges by summing counts — associative/commutative, so any combine
# tree yields identical buckets, and the answer carries a GUARANTEED
# relative-error bound alpha for nonzero values.
# ---------------------------------------------------------------------------

def dd_partial(values: np.ndarray, alpha: float = 0.01) -> dict:
    """Log-bucket counts for one batch: positive values to bucket
    ceil(log_gamma v) with gamma = (1+a)/(1-a); negatives mirrored into
    negative keys offset by a sign flag; zeros (and |v| below float-tiny)
    counted separately.  Returns {"pos": {idx: n}, "neg": {...}, "zero": n}
    — the partial is bounded by the number of OCCUPIED buckets
    (~log-range/alpha), not rows."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = np.log(gamma)
    v = np.asarray(values, np.float64)
    v = v[~np.isnan(v)]
    out = {"pos": {}, "neg": {}, "zero": 0, "n": int(len(v))}
    tiny = 1e-12
    zero = np.abs(v) <= tiny
    out["zero"] = int(zero.sum())
    for sign, key in ((1.0, "pos"), (-1.0, "neg")):
        side = v[(~zero) & ((v > 0) if sign > 0 else (v < 0))] * sign
        if not len(side):
            continue
        idx = np.ceil(np.log(side) / lg).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        out[key] = {int(i): int(n) for i, n in zip(u, c)}
    return out


def dd_merge(parts) -> dict:
    """Sum bucket counts — the mergeable-combine step."""
    out = {"pos": {}, "neg": {}, "zero": 0, "n": 0}
    for p in parts:
        out["zero"] += p["zero"]
        out["n"] += p["n"]
        for key in ("pos", "neg"):
            for i, n in p[key].items():
                out[key][i] = out[key].get(i, 0) + n
    return out


def dd_quantile(sk: dict, q: float, alpha: float = 0.01) -> float:
    """Value x with |x - x_true| <= alpha * |x_true| for nonzero answers
    (bucket midpoint in log space: 2·gamma^i/(gamma+1))."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    n = sk["n"]
    if n == 0:
        return float("nan")
    rank = q * (n - 1)
    # ascending order: negatives (most-negative first = largest idx), zeros,
    # positives (smallest idx first)
    acc = 0
    for i in sorted(sk["neg"], reverse=True):
        acc += sk["neg"][i]
        if acc > rank:
            return -2.0 * gamma ** i / (gamma + 1.0)
    acc += sk["zero"]
    if acc > rank:
        return 0.0
    for i in sorted(sk["pos"]):
        acc += sk["pos"][i]
        if acc > rank:
            return 2.0 * gamma ** i / (gamma + 1.0)
    return float("nan")


def approx_quantiles(ds, column: str, qs: dict[str, float],
                     alpha: float = 0.01) -> dict[str, float]:
    """Approximate quantiles of ``column``: per-batch log-bucket partials
    (size ∝ occupied buckets) merged on the driver; each answer within
    relative error ``alpha`` of the exact quantile for nonzero values."""
    import pickle

    def partial(b: pa.Table) -> pa.Table:
        col = b[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sk = dd_partial(col.to_numpy(zero_copy_only=False), alpha)
        return pa.table({"sk": pa.array([pickle.dumps(sk)], pa.binary())})

    parts = ray.get(ds.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize().to_arrow_refs())
    sk = dd_merge(pickle.loads(blob)
                  for t in parts for blob in t["sk"].to_pylist())
    return {name: dd_quantile(sk, q, alpha) for name, q in qs.items()}


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — the mergeable approximate top-k sketch
# (public algorithm: Misra & Gries '82; mergeability per Agarwal et al.,
# "Mergeable Summaries", PODS'12).  Completes the sketch family next to
# HLL (count-distinct) and the DDSketch-style quantiles: fixed m-entry
# summaries per batch, sum-merge + compress, and every reported count is
# within n/m of truth — any item with true count > n/m is GUARANTEED to
# survive.  Exact twin: functions/vocab.py::top_tokens.
# ---------------------------------------------------------------------------

def mg_compress(counts: dict, m: int) -> tuple[dict, int]:
    """Shrink to ≤ m entries: subtract the (m+1)-th largest count from
    every entry and drop non-positives.  Returns (summary, decrement) —
    the decrement accumulates into the sketch's error bound."""
    if len(counts) <= m:
        return counts, 0
    vals = sorted(counts.values(), reverse=True)
    d = vals[m]
    out = {k: c - d for k, c in counts.items() if c > d}
    return out, d


def mg_partial(tokens, m: int) -> tuple[dict, int]:
    """One batch → (m-entry summary, decrement).  Batch counts are exact
    before compression, so per-batch error is a single compress step."""
    from collections import Counter

    return mg_compress(dict(Counter(tokens)), m)


def mg_merge(parts, m: int) -> tuple[dict, int]:
    """Sum-merge summaries then compress once; total decrement ≤ n/m
    summed over merges (associative up to equivalent summaries — the
    BOUND holds for any merge tree, the canonical mergeable-summary
    property)."""
    total: dict = {}
    err = 0
    for counts, d in parts:
        err += d
        for k, c in counts.items():
            total[k] = total.get(k, 0) + c
    total, d = mg_compress(total, m)
    return total, err + d


def top_tokens_approx(ds, text_col: str, k: int = 20, m: int = 512):
    """Approximate global top-k whitespace tokens: per-batch Misra-Gries
    partials (fixed m entries each, never a token-universe shuffle), one
    driver merge.  Returns (token, est, err) pandas — true count is in
    [est, est + err] for every reported token, and any token with true
    count > n/m is guaranteed present.  Approximate by design →
    rows-only; d_top_tokens is the exact twin."""
    import pandas as pd
    import pyarrow as pa
    import ray

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df[text_col].fillna("").str.split().explode().dropna()
        counts, d = mg_partial(toks.tolist(), m)
        return pa.table({
            "token": pa.array(list(counts.keys()), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
            "dec": pa.array([d] + [0] * (len(counts) - 1) if counts
                            else [], pa.int64())})

    refs = ds.map_batches(partial, batch_format="pandas").materialize().to_arrow_refs()
    parts = []
    for t in ray.get(refs):
        if not isinstance(t, pa.Table) or "token" not in t.schema.names:
            continue
        counts = dict(zip(t["token"].to_pylist(), t["n"].to_pylist()))
        dec = int(t["dec"].to_numpy(zero_copy_only=False).sum()) \
            if t.num_rows else 0
        parts.append((counts, dec))
    summary, err = mg_merge(parts, m)
    top = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame({
        "token": [t for t, _ in top],
        "est": pd.array([c for _, c in top], dtype="int64"),
        "err": pd.array([err] * len(top), dtype="int64")})


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable point-query frequency estimates
# (Cormode & Muthukrishnan '05).  Third member of the sketch family:
# HLL answers |distinct|, Misra-Gries answers "who is heavy", count-min
# answers "how often is KEY x" for arbitrary x.  Fixed d×w int64 matrix
# per partial, elementwise-SUM merge (associative); estimates are always
# ≥ truth and ≤ truth + εn with probability 1-δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉.
# ---------------------------------------------------------------------------

_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def _cms_hash(keys: np.ndarray, seed: np.uint64, w: int) -> np.ndarray:
    x = keys.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= seed
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
    return (x % np.uint64(w)).astype(np.int64)


def cms_partial(keys: np.ndarray, w: int = 2048, d: int = 4) -> np.ndarray:
    """(d, w) int64 count matrix for one batch of int64 keys."""
    m = np.zeros((d, w), dtype=np.int64)
    if len(keys):
        for r in range(d):
            np.add.at(m[r], _cms_hash(np.asarray(keys), _CMS_SEEDS[r], w), 1)
    return m


def cms_merge(parts) -> np.ndarray:
    """Elementwise sum — associative, any combine tree is identical."""
    it = iter(parts)
    out = next(it).copy()
    for p in it:
        out += p
    return out


def cms_estimate(m: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Min over rows: always ≥ the true count (one-sided error)."""
    d, w = m.shape
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(d):
        est = np.minimum(est, m[r][_cms_hash(np.asarray(keys),
                                             _CMS_SEEDS[r], w)])
    return est
