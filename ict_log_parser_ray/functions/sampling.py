"""Weight-proportional sampling with EXACT integer priorities.

Training-data mixing needs "sample documents proportional to weight"
(length, quality score, source boost).  The classic weighted reservoir
(Efraimidis–Spirakis) ranks by u^(1/w) — IEEE pow/log floats, which the
repo's tfidf lesson shows can flip boundary rows against a SQL oracle.
This module uses sequential Poisson sampling (Ohlsson): priority
``q_i = u_i / w_i`` with the k smallest priorities selected — and makes
it integer-exact by

- ``u_i`` = the repo's 32-bit multiplicative id hash (deterministic,
  engine-reproducible), and
- ``q_i`` = ``(u_i << 32) // w_i`` computed in uint64 — fits because
  ``u_i < 2^32``; any SQL engine reproduces it with HUGEINT integer
  division, bit-for-bit.

Inclusion is weight-proportional in expectation for k ≪ n (sequential
Poisson is the standard survey-sampling approximation of probability-
proportional-to-size; the pytest pins the realized proportions).

Distribution shape: per-batch bottom-k partial (the global bottom-k is a
subset of the union of per-batch bottom-ks — the proven-subset property
the stratified sampler documents) + a driver re-cut bounded by
k × blocks.  At cluster scale swap the driver cut for a tournament
reduce; the partial stays the same.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MULT = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def weighted_priority(ids: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Exact uint64 sequential-Poisson priority: (hash32(id) << 32) // w.
    Weights are clamped to ≥ 1 (a zero/negative/null weight must not
    divide by zero — it degrades to weight 1, loudly documented in the
    oracle SQL's GREATEST/COALESCE mirror)."""
    with np.errstate(over="ignore"):
        h = (ids.astype(np.uint64) * _MULT) % _M32
    w = np.maximum(weights.astype(np.int64), 1).astype(np.uint64)
    return (h << np.uint64(32)) // w


def weighted_bottom_k(ds, id_col: str, weight_col: "str | None", k: int,
                      keep_cols: list[str] | None = None) -> pd.DataFrame:
    """k rows with the smallest integer priority (ties → smaller id),
    with a 1-based ``rn`` rank column.  Weight-proportional sample that
    any SQL engine reproduces exactly.  ``weight_col=None`` → unit
    weights: a deterministic fixed-size UNIFORM sample (the reservoir-
    sampling use case, hash-derandomized)."""
    import ray

    cols = list(dict.fromkeys(
        [id_col] + ([weight_col] if weight_col else [])
        + (keep_cols or [])))

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if weight_col is None:
            w = np.ones(len(ids), np.int64)
        else:
            w = pc.fill_null(t[weight_col], 1) \
                .to_numpy(zero_copy_only=False)
        q = weighted_priority(ids, w)
        kk = min(k, len(q))
        if kk < len(q):
            # bottom-k cut: argpartition then exact sort of the k kept
            idx = np.argpartition(q, kk - 1)[:kk]
        else:
            idx = np.arange(len(q))
        order = np.lexsort((ids[idx], q[idx]))
        idx = idx[order]
        t = t.take(pa.array(idx, pa.int64()))
        # uint64 end-to-end: priorities reach 2^64-1, an int64 cast would
        # wrap the top half negative and corrupt the driver re-cut
        return t.append_column("_q", pa.array(q[idx], pa.uint64()))

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).materialize().to_arrow_refs())
        if isinstance(t, pa.Table) and "_q" in t.schema.names]
    if not parts:
        # fully-empty input: carry the REAL column types, not assumed int64
        sch = ds.schema()
        tmap = dict(zip(sch.names, sch.types))
        base = pa.schema([(c, tmap.get(c, pa.int64())) for c in cols]
                         + [("rn", pa.int64())])
        return base.empty_table().to_pandas()
    cand = pa.concat_tables(parts).to_pandas()
    cand = cand.sort_values(["_q", id_col], kind="stable").head(k)
    cand["rn"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand.drop(columns=["_q"]).reset_index(drop=True)
