"""Document deduplication operators for training-data pipelines:

- exact duplicates: hash-partition on text → per-group first / group listing
- MinHash + LSH near-dup: shingle → minhash signature → band buckets →
  candidate groups via groupby → verified Jaccard
- SimHash near-dup: 64-bit simhash, banded for candidate generation
- n-gram Jaccard verification kernel

All signature computation is vectorized numpy inside actor-pool
``map_batches`` (hash matrices built once per actor in ``__init__``); the
only shuffles are groupbys on band/bucket keys — candidate generation never
compares all pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Unique

_MERSENNE = (1 << 61) - 1


def _stable_hash_bytes(arr_bytes: np.ndarray) -> np.ndarray:
    """Vector of FNV-1a 64-bit hashes of a list of byte strings."""
    out = np.empty(len(arr_bytes), dtype=np.uint64)
    for i, b in enumerate(arr_bytes):
        h = np.uint64(0xCBF29CE484222325)
        for ch in b:
            h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def char_shingles(text: str, k: int = 5) -> set:
    t = " ".join(text.split()).lower()
    if len(t) <= k:
        return {t}
    return {t[i:i + k] for i in range(len(t) - k + 1)}


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """n-gram Jaccard similarity verification kernel."""
    sa, sb = char_shingles(a, k), char_shingles(b, k)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


class MinHasher:
    """Actor: minhash signatures + LSH band keys per document."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 5,
                 seed: int = 42):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows_per_band = num_perm // bands

    def signature(self, text: str) -> np.ndarray:
        sh = sorted(char_shingles(text, self.k))
        hv = _stable_hash_bytes(np.array([s.encode() for s in sh], dtype=object))
        # (num_perm, n_shingles) permuted hashes → min over shingles
        ph = (np.outer(self.a, hv) + self.b[:, None]) % np.uint64(_MERSENNE)
        return ph.min(axis=1)

    def band_keys(self, sig: np.ndarray) -> list:
        keys = []
        for bi in range(self.bands):
            chunk = sig[bi * self.rows_per_band:(bi + 1) * self.rows_per_band]
            h = np.uint64(0xCBF29CE484222325)
            for v in chunk:
                h = np.uint64((int(h) ^ int(v)) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            keys.append(f"{bi}:{int(h) % (1 << 48)}")
        return keys

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """doc batch → exploded (band_key, doc_id, text) rows."""
        rows = {"band_key": [], "doc_id": [], "text": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self.signature(text or "")
            for k in self.band_keys(sig):
                rows["band_key"].append(k)
                rows["doc_id"].append(doc_id)
                rows["text"].append(text)
        return pd.DataFrame(rows)


def minhash_duplicate_pairs(docs_ds, num_perm: int = 64, bands: int = 16,
                            k: int = 5, threshold: float = 0.7,
                            concurrency=(1, 8)):
    """documents → verified near-duplicate pairs Dataset
    (doc_a, doc_b, jaccard).  Pipeline: signature+band explode (actor pool)
    → groupby(band_key) → within-bucket pairwise verify (buckets are tiny by
    construction; a bucket whose size explodes signals degenerate text and is
    capped)."""
    exploded = docs_ds.map_batches(
        MinHasher, fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, k=k),
        batch_format="pandas", concurrency=concurrency, num_cpus=1)

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["doc_id"].tolist()
        texts = group["text"].tolist()
        out = {"doc_a": [], "doc_b": [], "jaccard": []}
        cap = 50  # candidate bucket size cap (degenerate-text guard)
        for i in range(min(len(ids), cap)):
            for j in range(i + 1, min(len(ids), cap)):
                if ids[i] == ids[j]:
                    continue
                jac = ngram_jaccard(texts[i], texts[j], k)
                if jac >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out["doc_a"].append(a)
                    out["doc_b"].append(b)
                    out["jaccard"].append(jac)
        return pd.DataFrame(out)

    pairs = exploded.groupby("band_key").map_groups(verify, batch_format="pandas")
    # same pair can surface from multiple bands → dedup on (doc_a, doc_b)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        # max == the verified jaccard (identical across bands)
        __import__("ray").data.aggregate.Max("jaccard", alias_name="jaccard"))


class SimHasher:
    """Actor: 64-bit simhash over word features."""

    def __init__(self, seed: int = 42):
        self.seed = seed

    @staticmethod
    def _hash64(w: str) -> int:
        h = 0xCBF29CE484222325
        for ch in w.encode("utf-8"):
            h = (h ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF
        return h

    def simhash(self, text: str) -> int:
        v = np.zeros(64, dtype=np.int64)
        for w in (text or "").lower().split():
            h = self._hash64(w)
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            v += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if v[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["simhash"] = [np.int64(self.simhash(t) & 0x7FFF_FFFF_FFFF_FFFF)
                         for t in df["text"]]
        return df


def simhash_documents(docs_ds, concurrency=(1, 8)):
    return docs_ds.map_batches(SimHasher, batch_format="pandas",
                               concurrency=concurrency, num_cpus=1)


def simhash_candidate_pairs(docs_ds, max_hamming: int = 3, concurrency=(1, 8)):
    """Banded simhash near-dup candidates: 4 bands × 16 bits; docs sharing a
    band value are candidates; verified by hamming distance."""
    hashed = simhash_documents(docs_ds, concurrency=concurrency)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"band_key": [], "doc_id": [], "simhash": []}
        for doc_id, sh in zip(df["doc_id"], df["simhash"]):
            for bi in range(4):
                band = (int(sh) >> (16 * bi)) & 0xFFFF
                rows["band_key"].append(f"{bi}:{band}")
                rows["doc_id"].append(doc_id)
                rows["simhash"].append(sh)
        return pd.DataFrame(rows)

    exploded = hashed.map_batches(explode, batch_format="pandas")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["doc_id"].tolist()
        hs = group["simhash"].tolist()
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        cap = 50
        for i in range(min(len(ids), cap)):
            for j in range(i + 1, min(len(ids), cap)):
                if ids[i] == ids[j]:
                    continue
                d = bin(int(hs[i]) ^ int(hs[j])).count("1")
                if d <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    out["doc_a"].append(a)
                    out["doc_b"].append(b)
                    out["hamming"].append(d)
        return pd.DataFrame(out)

    pairs = exploded.groupby("band_key").map_groups(verify, batch_format="pandas")
    from ray.data.aggregate import Min
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def exact_duplicate_groups(docs_ds):
    """Exact dedup over text: groups with >1 copy (hash-partitioned groupby;
    per-group first is trivially the min doc_id)."""
    from ray.data.aggregate import Count, Min

    g = docs_ds.groupby("text").aggregate(
        Count(alias_name="n"), Min("doc_id", alias_name="keep_doc_id"))
    return g.filter(lambda r: r["n"] > 1)
