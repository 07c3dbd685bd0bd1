"""Broadcast Bloom-filter semi-join — the shuffle-avoiding join pattern
for "filter a 100-TB fact table by a large key set".

A plain broadcast semi-join ships the full key set to every task; past
~10⁸ keys that broadcast is itself the bottleneck.  The Bloom pattern:

1. build a fixed-size bit array over the right-side keys — per-batch
   partial blooms (mergeable by OR) + a tree OR-merge, so the build is
   one streaming pass and the merge is O(log nblocks) tasks;
2. ``ray.put`` the bits ONCE (nbits/8 bytes regardless of key count) and
   prefilter the fact stream with k vectorized double-hash probes;
3. verify the (tiny) survivor stream exactly — here via the memoized
   khash probe against the exact key set (fits at test scale); at 100 TB
   the survivors are small enough for a shuffle semi-join or an indexed
   lookup, which is the documented scale path.

The exported result is EXACT (bloom false positives are removed by the
verify pass); the bloom only bounds how many rows reach the verify.

Hashing: splitmix64-style multiplicative mixes h1/h2 + double hashing
pos_i = (h1 + i·h2) mod nbits — pure numpy, no per-row Python.
"""

from __future__ import annotations
from ..blocks import ncpus as _ncpus

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _key64(col) -> np.ndarray:
    """uint64 key material for the bloom/partition hashes: integer
    columns bit-cast directly; string (or other) columns go through the
    polars 64-bit row hash (the same C-speed path `stages.join` uses).
    Callers mask validity separately — any value this returns for a null
    slot is ignored behind the caller's is_valid mask."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        # fill nulls FIRST: a null-bearing int column converts to float64
        # (NaN slots), silently rounding valid |v| > 2^53 keys — the two
        # sides would then hash the same key differently (bloom false
        # negatives the exact verify never re-checks).  The 0 fill value
        # itself is masked out by the caller's validity mask.
        return (pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
                .astype(np.uint64))
    from .join import _pl_hash64

    return _pl_hash64(col).astype(np.uint64)


def _mix(x: np.ndarray, mult: np.uint64) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= mult
        x ^= x >> np.uint64(27)
        x *= _M2
        x ^= x >> np.uint64(31)
    return x


def _positions(keys: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via double hashing."""
    h1 = _mix(keys, _M1)
    h2 = _mix(keys, _M2) | np.uint64(1)  # odd → all strides hit all bits
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(nbits))


def bloom_from_keys(keys: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """Bit array (uint8, nbits/8 bytes) with every key's k bits set."""
    bits = np.zeros(nbits // 8, dtype=np.uint8)
    if len(keys):
        pos = _positions(np.asarray(keys), nbits, k).ravel()
        np.bitwise_or.at(bits, pos >> np.uint64(3),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return bits


def bloom_probe(keys: np.ndarray, bits: np.ndarray, nbits: int,
                k: int) -> np.ndarray:
    """Bool mask: True where ALL k bits are set (key maybe-present)."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    pos = _positions(np.asarray(keys), nbits, k)
    byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
    got = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return got.all(axis=1)


@ray.remote
def _or_merge(*blooms: np.ndarray) -> np.ndarray:
    out = blooms[0].copy()
    for b in blooms[1:]:
        np.bitwise_or(out, b, out=out)
    return out


def build_bloom_distributed(ds, col: str, nbits: int = 1 << 23,
                            k: int = 5, fanin: int = 8):
    """Streaming bloom build over ``ds[col]`` (integer OR string keys —
    see `_key64`): per-batch partial blooms + tree OR-merge.  Returns an
    ObjectRef to the bits."""
    def partial(b: pa.Table) -> pa.Table:
        c = b[col]
        if c.null_count:
            c = c.drop_null() if not isinstance(c, pa.ChunkedArray) \
                else c.combine_chunks().drop_null()
        bits = bloom_from_keys(_key64(c), nbits, k)
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    refs = []
    for t in ray.get(parts.to_arrow_refs()):
        # zero-row input blocks skip the UDF and surface with the
        # ORIGINAL schema (no "bloom" column) — contribute nothing
        if "bloom" not in t.schema.names:
            continue
        for blob in t["bloom"].to_pylist():
            refs.append(ray.put(np.frombuffer(blob, dtype=np.uint8)))
    if not refs:
        return ray.put(np.zeros(nbits // 8, dtype=np.uint8))
    # tree OR-merge: O(log_{fanin} nblocks) rounds, each task ORs ≤fanin
    while len(refs) > 1:
        refs = [_or_merge.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    return refs[0]


def bloom_semi_join(left_ds, right_ds, left_on: str, right_on: str,
                    nbits: int = 1 << 23, k: int = 5):
    """EXACT semi-join: left rows whose ``left_on`` appears in
    ``right_ds[right_on]``.  Bloom prefilter + exact verify (broadcast
    khash probe over the survivors); rows with null join keys drop."""
    from .join import lookup_indices

    # one pass over the right side: materialize the key column once, feed
    # both the bloom build and the exact verify set from the pinned blocks
    right_mat = right_ds.select_columns([right_on]).materialize()
    bloom_ref = build_bloom_distributed(right_mat, right_on, nbits, k)
    keys_tbl = pa.concat_tables(
        ray.get(right_mat.to_arrow_refs())).combine_chunks()
    exact_ref = ray.put(pc.unique(keys_tbl[right_on]))
    token = exact_ref.hex()

    def probe(b: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        vals = b[left_on]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        maybe = bloom_probe(_key64(vals), bits, nbits, k)
        if vals.null_count:
            maybe &= pc.is_valid(vals).to_numpy(zero_copy_only=False)
        if not maybe.any():
            return b.slice(0, 0)
        survivors = b.filter(pa.array(maybe))
        # exact verify on the (bloom-small) survivor stream only
        sv = survivors[left_on]
        if isinstance(sv, pa.ChunkedArray):
            sv = sv.combine_chunks()
        idx = lookup_indices(sv, ray.get(exact_ref), memo_token=token)
        return survivors.filter(pc.is_valid(idx))

    return left_ds.map_batches(probe, batch_format="pyarrow",
                               zero_copy_batch=True)


def bloom_anti_join(left_ds, right_ds, left_on: str, right_on: str,
                    nbits: int = 1 << 23, k: int = 5):
    """EXACT anti-join: left rows whose non-null ``left_on`` does NOT
    appear in ``right_ds[right_on]``'s non-null keys (null left keys drop,
    mirroring the semi-join; the SQL twin is NOT EXISTS, since NOT IN
    over a null-bearing subquery three-valued-logics to empty).

    The bloom's one-sided error works FOR the anti-join: a bloom MISS is
    a definite absence — those rows pass straight through with no exact
    check; only the (few) bloom HITS need the exact probe to separate
    true members (drop) from false positives (keep).  The exact-probe
    volume is the same small survivor stream as the semi-join's."""
    from .join import lookup_indices

    right_mat = right_ds.select_columns([right_on]).materialize()
    bloom_ref = build_bloom_distributed(right_mat, right_on, nbits, k)
    keys_tbl = pa.concat_tables(
        ray.get(right_mat.to_arrow_refs())).combine_chunks()
    exact_ref = ray.put(pc.drop_null(pc.unique(keys_tbl[right_on])))
    token = exact_ref.hex()

    def probe(b: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        vals = b[left_on]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        maybe = bloom_probe(_key64(vals), bits, nbits, k)
        valid = np.ones(len(vals), dtype=bool) if not vals.null_count \
            else pc.is_valid(vals).to_numpy(zero_copy_only=False)
        keep = valid & ~maybe          # definite absences: no exact check
        check = valid & maybe
        if check.any():
            sus = b.filter(pa.array(check))
            sv = sus[left_on]
            if isinstance(sv, pa.ChunkedArray):
                sv = sv.combine_chunks()
            idx = lookup_indices(sv, ray.get(exact_ref), memo_token=token)
            fp = pc.is_null(idx).to_numpy(zero_copy_only=False)
            keep[np.flatnonzero(check)[fp]] = True  # false positives stay
        return b.filter(pa.array(keep))

    return left_ds.map_batches(probe, batch_format="pyarrow",
                               zero_copy_batch=True)


@ray.remote
def _shard_keys(p: int, key_refs, right_on: str):
    """Distinct keys of hash-partition p from the tagged right blocks."""
    ks = [t.filter(pc.equal(t["_part"], p))[right_on]
          for t in ray.get(key_refs) if "_part" in t.schema.names]
    ks = [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
          for k in ks]
    arrs = [c for k in ks for c in
            (k.chunks if isinstance(k, pa.ChunkedArray) else [k]) if len(c)]
    if not arrs:
        return pa.array([], pa.int64())
    return pc.unique(pa.concat_arrays(arrs))


def bloom_anti_join_partitioned(left_ds, right_ds, left_on: str,
                                right_on: str, nbits: int = 1 << 23,
                                k: int = 5, nparts: int | None = None):
    """Big-right-side anti-join that never broadcasts the key set AND
    never materializes the left side: fully streaming.

    The bloom's one-sided error means a MISS row is a definite absence —
    it flows straight to the output inside the same map task.  Only the
    (fp-bounded) bloom HITS need an exact membership check; their keys
    are hash-routed to per-partition key SHARDS built once from the
    right side, and each map task ``ray.get``s only the shards its
    current batch's hits actually touch (worker-memoized khash per
    shard, FIFO-capped residency).  Worker memory is bounded by shard
    size × memo capacity, not key count; the output is a streaming
    Dataset.  NOT EXISTS semantics as in `bloom_anti_join` (null left
    keys drop)."""
    from .join import lookup_indices

    if nparts is None:
        ncpu = _ncpus()
        nparts = max(4, min(ncpu, 32))

    right_mat = right_ds.select_columns([right_on]).materialize()
    bloom_ref = build_bloom_distributed(right_mat, right_on, nbits, k)

    def tag_right(b: pa.Table) -> pa.Table:
        col = b[right_on]
        if col.null_count:
            b = b.filter(pc.is_valid(col))
        return b.append_column("_part", _part_tag(b[right_on], nparts))

    key_refs = right_mat.map_batches(
        tag_right, batch_format="pyarrow", zero_copy_batch=True
    ).materialize().to_arrow_refs()
    shard_refs = [_shard_keys.remote(p, key_refs, right_on)
                  for p in range(nparts)]

    def probe(b: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        vals = b[left_on]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        maybe = bloom_probe(_key64(vals), bits, nbits, k)
        valid = np.ones(len(vals), dtype=bool) if not vals.null_count \
            else pc.is_valid(vals).to_numpy(zero_copy_only=False)
        keep = valid & ~maybe            # definite absences stream out
        check = valid & maybe
        if check.any():
            sus_idx = np.flatnonzero(check)
            sv = vals.take(pa.array(sus_idx, pa.int64()))
            sp = (_mix(_key64(sv), _M1) % np.uint64(nparts)).astype(np.int64)
            for p in np.unique(sp):
                # refs nested in the captured list are NOT auto-resolved;
                # this get is a zero-copy plasma read, and lookup_indices
                # memoizes the shard's khash per worker (FIFO-capped)
                shard = ray.get(shard_refs[int(p)])
                rows = sp == p
                if len(shard) == 0:     # empty shard: every hit is a fp
                    keep[sus_idx[rows]] = True
                    continue
                idx = lookup_indices(sv.take(pa.array(
                    np.flatnonzero(rows), pa.int64())), shard,
                    memo_token=shard_refs[int(p)].hex())
                fp = pc.is_null(idx).to_numpy(zero_copy_only=False)
                keep[sus_idx[rows][fp]] = True   # bloom fps stay
        return b.filter(pa.array(keep))

    return left_ds.map_batches(probe, batch_format="pyarrow",
                               zero_copy_batch=True)


@ray.remote
def _verify_part(p: int, surv_refs, key_refs, left_on: str, right_on: str):
    import pandas as pd

    surv = [t.filter(pc.equal(t["_part"], p)) for t in ray.get(surv_refs)
            if "_part" in t.schema.names]
    surv = [t for t in surv if t.num_rows]
    keys = [t.filter(pc.equal(t["_part"], p))[right_on]
            for t in ray.get(key_refs) if "_part" in t.schema.names]
    if not surv:
        return None
    s = pa.concat_tables(surv).combine_chunks()
    chunks = [c.to_numpy(zero_copy_only=False)
              for k in keys for c in (k.chunks if isinstance(k, pa.ChunkedArray)
                                      else [k])]
    if not chunks:  # no key blocks, or 0-row ChunkedArrays with 0 chunks
        return s.slice(0, 0).drop_columns(["_part"])
    kvals = np.concatenate(chunks)
    # khash probe needs a UNIQUE index (get_indexer raises on dupes)
    kset = pd.Index(np.unique(kvals))
    mask = kset.get_indexer(
        s[left_on].to_numpy(zero_copy_only=False)) >= 0
    return s.filter(pa.array(mask)).drop_columns(["_part"])


def _part_tag(col, nparts: int) -> pa.Array:
    return pa.array((_mix(_key64(col), _M1)
                     % np.uint64(nparts)).astype(np.int64))


def bloom_semi_join_partitioned(left_ds, right_ds, left_on: str,
                                right_on: str, nbits: int = 1 << 23,
                                k: int = 5, nparts: int | None = None):
    """The big-right-side scale path `bloom_semi_join` documents: the
    exact verify never broadcasts the key set.  Bloom prefilter as in the
    broadcast variant (constant-size), then the SURVIVORS (small by the
    bloom's fp bound) and the right keys are hash-tagged on the join key
    and verified per partition — each verify task sees one key shard, so
    memory is bounded by shard size, not key count.  Exact output; rows
    with null join keys drop (semi-join semantics)."""
    if nparts is None:
        ncpu = _ncpus()
        nparts = max(4, min(ncpu, 32))

    right_mat = right_ds.select_columns([right_on]).materialize()
    bloom_ref = build_bloom_distributed(right_mat, right_on, nbits, k)

    def tag_right(b: pa.Table) -> pa.Table:
        col = b[right_on]
        valid = pc.is_valid(col)
        b = b.filter(valid) if col.null_count else b
        return b.append_column("_part", _part_tag(b[right_on], nparts))

    key_refs = right_mat.map_batches(
        tag_right, batch_format="pyarrow", zero_copy_batch=True
    ).materialize().to_arrow_refs()

    def prefilter(b: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        vals = b[left_on]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        maybe = bloom_probe(_key64(vals), bits, nbits, k)
        if vals.null_count:
            maybe &= pc.is_valid(vals).to_numpy(zero_copy_only=False)
        surv = b.filter(pa.array(maybe))
        if surv.num_rows == 0:
            return surv.append_column("_part",
                                      pa.array([], pa.int64()))
        return surv.append_column("_part", _part_tag(surv[left_on], nparts))

    surv_refs = left_ds.map_batches(
        prefilter, batch_format="pyarrow", zero_copy_batch=True
    ).materialize().to_arrow_refs()

    import ray.data as rd
    out = ray.get([_verify_part.remote(p, surv_refs, key_refs,
                                       left_on, right_on)
                   for p in range(nparts)])
    out = [r for r in out if r is not None]
    if not out:
        # schema-preserving empty result
        return left_ds.limit(0)
    return rd.from_arrow_refs([ray.put(t) for t in out])
