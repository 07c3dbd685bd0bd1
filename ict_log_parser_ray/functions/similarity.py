"""Similarity search over an embedding column (task brief: ANN).

- ``knn_bruteforce``: exact cosine top-k — numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, zero-copy plasma read per task),
  per-batch local top-k, tiny global merge.  The baseline and the oracle.
- ``knn_ivf``: IVF-flat scale path — deterministic seeded k-means (built once
  from a sample, broadcast), assign each row to its nearest centroid inside
  ``map_batches``, probe only the ``nprobe`` closest clusters at query time.
  At 100 TB the assignment pass is embarrassingly parallel and the probe
  reads only ``nprobe/nlist`` of the data (cluster-partitioned sink).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # list<float32> → (n, d) contiguous; zero-copy flatten where possible
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1).astype(np.float32, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_bruteforce(emb_ds, query: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k of one query vector: returns pa.Table
    (vec_id, cosine) sorted by cosine desc, vec_id asc tiebreak."""
    q = np.asarray(query, dtype=np.float32).reshape(-1)
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    def topk_batch(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ qv
        kk = min(k, len(sims))
        idx = np.argpartition(-sims, kk - 1)[:kk] if kk else np.array([], int)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[idx]
        return pa.table({id_col: pa.array(ids),
                         "cosine": pa.array(sims[idx].astype(np.float64))})

    cand = emb_ds.map_batches(topk_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    # global merge: candidates are ≤ k per block — tiny
    tbl = pa.concat_tables(
        ray.get(cand.materialize().to_arrow_refs())).combine_chunks()
    import pyarrow.compute as pc
    order = pc.sort_indices(tbl, sort_keys=[("cosine", "descending"),
                                            (id_col, "ascending")])
    return tbl.take(order[:k])


class _KMeans:
    """Deterministic seeded mini k-means (Lloyd, fixed iters)."""

    def __init__(self, sample: np.ndarray, nlist: int, seed: int = 42,
                 iters: int = 10):
        rng = np.random.default_rng(seed)
        n = len(sample)
        init = rng.choice(n, size=min(nlist, n), replace=False)
        self.centroids = sample[init].copy()
        for _ in range(iters):
            d = sample @ self.centroids.T
            assign = np.argmax(d, axis=1)
            for c in range(len(self.centroids)):
                m = sample[assign == c]
                if len(m):
                    v = m.mean(axis=0)
                    nv = np.linalg.norm(v)
                    if nv:
                        self.centroids[c] = v / nv

    def assign(self, m: np.ndarray) -> np.ndarray:
        return np.argmax(m @ self.centroids.T, axis=1)


def build_ivf(emb_ds, nlist: int = 16, sample_rows: int = 10_000,
              vec_col: str = "embedding", seed: int = 42):
    """Train centroids on a driver-side sample (small), return the model.
    The sample is a bounded limit() — never the full dataset."""
    sample_tbl = pa.concat_tables(ray.get(
        emb_ds.limit(sample_rows).materialize().to_arrow_refs()))
    m = _normalize(_batch_matrix(sample_tbl, vec_col))
    return _KMeans(m, nlist=nlist, seed=seed)


def ivf_assign(emb_ds, model: _KMeans, vec_col: str = "embedding"):
    """Add a ``cluster`` column (the IVF partition key for the sink)."""
    model_ref = ray.put(model)

    def assign(batch: pa.Table) -> pa.Table:
        km = ray.get(model_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        return batch.append_column("cluster",
                                   pa.array(km.assign(m).astype(np.int32)))

    return emb_ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)


def embedding_near_dup_pairs(emb_ds, threshold: float = 0.95, nlist: int = 16,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             model: "_KMeans | None" = None, cap: int = 2000):
    """Embedding-cosine near-duplicate detection (task brief dedup method).

    Candidate generation = IVF cluster co-membership (vectors in different
    clusters are far by construction at high thresholds); verification =
    exact pairwise cosine inside each cluster via one numpy matmul per
    group.  Returns Dataset(id_a, id_b, cosine) with cosine ≥ threshold.
    ``cap`` bounds the per-cluster pairwise matrix (degenerate-embedding
    guard, like the LSH bucket cap).
    """
    import pandas as pd

    if model is None:
        model = build_ivf(emb_ds, nlist=nlist, vec_col=vec_col)
    assigned = ivf_assign(emb_ds, model, vec_col=vec_col)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        n = min(len(g), cap)
        g = g.iloc[:n]
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g[vec_col]])
        m = _normalize(m)
        sims = m @ m.T
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(n, k=1)
        mask = sims[ia, ib] >= threshold
        a, b = ids[ia[mask]], ids[ib[mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi,
                             "cosine": sims[ia[mask], ib[mask]]})

    return assigned.groupby("cluster").map_groups(verify,
                                                  batch_format="pandas")


def knn_ivf(emb_ds, query: np.ndarray, k: int = 10, nlist: int = 16,
            nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
            model: _KMeans | None = None):
    """IVF-flat approximate top-k: probe only the nprobe closest clusters."""
    if model is None:
        model = build_ivf(emb_ds, nlist=nlist, vec_col=vec_col)
    q = np.asarray(query, dtype=np.float32).reshape(-1)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(model.centroids @ qn))[:nprobe].tolist())

    assigned = ivf_assign(emb_ds, model, vec_col=vec_col)

    import pyarrow.compute as pc

    def filt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["cluster"],
                                     value_set=pa.array(sorted(probe), pa.int32())))

    probed = assigned.map_batches(filt, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return knn_bruteforce(probed, query, k=k, id_col=id_col, vec_col=vec_col)
