"""Distributed k-means (Lloyd) over an embedding column.

The iterative-algorithm pattern on Ray Data: each Lloyd round is ONE
streaming ``map_batches`` pass — assign every vector to its nearest
centroid with a batched matmul, and emit the round's sufficient
statistics (per-cluster vector sums + counts) as a single fixed-size
blob row per batch (k×d float64 + k int64, independent of batch size).
The driver sums the tiny partials, recomputes centroids, and re-ships
them via ``ray.put`` (one object per round, zero-copy read per task).
Nothing is ever materialized: at 100 TB each round costs one scan, and
the shipped state is O(k·d).

Contrast with `similarity.build_ivf`, which trains on a bounded
driver-side SAMPLE (the cheap path when approximate centroids suffice);
this module is the full-data trainer for when the sample isn't
representative.  Initialization is deterministic (seeded choice from a
bounded head sample), so results are reproducible run-to-run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(tbl: pa.Table, vec_col: str) -> np.ndarray:
    col = tbl[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not hasattr(col, "flatten"):
        # Ray's ArrowTensorArray extension (from_pandas ndarray columns):
        # to_numpy gives the (n, d) ndarray directly
        return np.asarray(col.to_numpy(zero_copy_only=False)) \
            .astype(np.float64, copy=False)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64, copy=False)


def kmeans_fit(ds, k: int, vec_col: str = "embedding", iters: int = 20,
               tol: float = 1e-6, seed: int = 42,
               init_sample_rows: int = 4096) -> np.ndarray:
    """Lloyd's algorithm → (k, d) centroid matrix.  One streaming pass
    per round; stops early when the max centroid shift drops below
    ``tol`` (L2)."""
    import ray

    head = pa.concat_tables(ray.get(
        ds.limit(init_sample_rows).materialize().to_arrow_refs()))
    sample = _batch_matrix(head, vec_col)
    if len(sample) < k:
        raise ValueError(f"need ≥{k} rows to init, got {len(sample)}")
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    d = centroids.shape[1]

    for _ in range(iters):
        cent_ref = ray.put(centroids)

        def stats(b: pa.Table, _c=cent_ref) -> pa.Table:
            c = ray.get(_c)
            m = _batch_matrix(b, vec_col)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; x-term constant per row
            a = np.argmin(m @ c.T * -2.0 + (c * c).sum(axis=1)[None, :],
                          axis=1)
            csum = np.zeros_like(c)
            np.add.at(csum, a, m)
            cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pa.table({
                "csum": pa.array([csum.tobytes()], pa.binary()),
                "cnt": pa.array([cnt.tobytes()], pa.binary())})

        parts = [t for t in ray.get(
            ds.map_batches(stats, batch_format="pyarrow",
                           zero_copy_batch=True).materialize().to_arrow_refs())
            if isinstance(t, pa.Table) and "csum" in t.schema.names]
        csum = np.zeros((k, d))
        cnt = np.zeros(k, dtype=np.int64)
        for t in parts:
            for blob, cb in zip(t["csum"].to_pylist(), t["cnt"].to_pylist()):
                csum += np.frombuffer(blob, np.float64).reshape(k, d)
                cnt += np.frombuffer(cb, np.int64)
        new = np.where(cnt[:, None] > 0, csum / np.maximum(cnt, 1)[:, None],
                       centroids)   # empty cluster keeps its centroid
        shift = float(np.sqrt(((new - centroids) ** 2).sum(axis=1)).max())
        centroids = new
        if shift < tol:
            break
    return centroids


def kmeans_cluster_sizes(ds, centroids: np.ndarray,
                         vec_col: str = "embedding"):
    """One labeled pass → (cluster, n) sizes via int count partials."""
    import pandas as pd
    import ray

    cent_ref = ray.put(centroids)

    def count(b: pa.Table, _c=cent_ref) -> pa.Table:
        c = ray.get(_c)
        m = _batch_matrix(b, vec_col)
        a = np.argmin(m @ c.T * -2.0 + (c * c).sum(axis=1)[None, :], axis=1)
        cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
        return pa.table({"cluster": pa.array(range(len(c)), pa.int32()),
                         "n": pa.array(cnt)})

    parts = [t for t in ray.get(
        ds.map_batches(count, batch_format="pyarrow",
                       zero_copy_batch=True).materialize().to_arrow_refs())
        if isinstance(t, pa.Table) and "cluster" in t.schema.names]
    if not parts:   # fully empty input: every cluster has zero members
        return pd.DataFrame({
            "cluster": pd.array(range(len(centroids)), dtype="int32"),
            "n": pd.array([0] * len(centroids), dtype="int64")})
    df = (pa.concat_tables(parts).to_pandas()
          .groupby("cluster", as_index=False)["n"].sum())
    df["n"] = df["n"].astype("int64")
    return df
