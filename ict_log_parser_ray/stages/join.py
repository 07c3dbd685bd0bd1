"""Join strategies: broadcast lookup for small right sides, hash join for
large ones (SURVEY.md §2.4).

``attach_lookup(left_ds, right_ds, on)`` picks the strategy:

- **broadcast** (right side ≤ ``broadcast_threshold`` rows): materialize the
  right side once, ``ray.put`` it, and do a vectorized ``index_in``+``take``
  inside stateless ``map_batches`` tasks.  The task closure captures only the
  ObjectRef; ``ray.get`` inside the task is a zero-copy plasma read (the
  table ships to each node once via the object store, not per batch).  The
  left side streams; no shuffle.  Stateless tasks — not an actor pool — so
  the stage reserves no CPUs while idle and cannot deadlock small clusters.
- **hash join** (bigger): ``Dataset.join`` — hash-partitioned on the key on
  both sides.

Left-outer semantics in both paths: unmatched left keys get nulls.
"""

from __future__ import annotations
from ..blocks import ncpus as _ncpus

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray

# right-side size above which a memo_token switches lookup_indices to the
# worker-memoized probe.  Single-thread the paths tie at ~27k keys, but
# index_in re-BUILDS its value-set hash table per call and that build
# inflates ~4× under 16-core memory-bus contention while the read-only
# memo probe scales — env-tunable for interleaved A/B measurement.
_MEMO_MIN = int(os.environ.get("ICT_LOOKUP_MEMO_MIN", "50000"))


def _pl_hash64(arr: pa.Array) -> "object":
    """64-bit hash of a string array via polars hash_rows (C speed)."""
    import os
    import sys

    if "polars" not in sys.modules:
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    return (pl.from_arrow(pa.table({"k": arr})).hash_rows(seed=42)
            .to_numpy().astype("int64"))


def lookup_indices(values, right_keys: pa.Array, memo_token=None):
    """First-match indices of ``values`` in ``right_keys`` (pa.Int64Array
    with nulls for misses — drop-in for ``pc.index_in``).

    With ``memo_token``, uses a worker-memoized probe: polars 64-bit hash of
    both sides, an int64 pandas Index (khash) built ONCE per worker over the
    right side, a vectorized string-equality verification, and an exact
    ``index_in`` fallback for any hash-collision rows.  Measured 23 ms vs
    106 ms per 450k-row batch against 717k keys — and the probe is
    read-only, while ``index_in`` re-BUILDS its value-set hash table every
    call, which inflated 4× under 16-core memory-bus contention (p2prof).
    """
    import numpy as np

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if memo_token is None or len(right_keys) < _MEMO_MIN or values.null_count:
        return pc.index_in(values, value_set=right_keys)

    key = ("lkidx", memo_token)
    memo = _WORKER_MEMO.get(key)
    if memo is None:
        import pandas as pd

        rh = _pl_hash64(right_keys)
        uniq, first_pos = np.unique(rh, return_index=True)
        memo = _memo_put(key, (pd.Index(uniq), first_pos.astype(np.int64)))
    ix, first_pos = memo
    bh = _pl_hash64(values)
    pos = ix.get_indexer(bh)
    idx = np.where(pos >= 0, first_pos[np.maximum(pos, 0)], -1)
    # verify: a hash hit must also be a string match (collision safety)
    cand = pc.take(right_keys, pa.array(np.maximum(idx, 0), pa.int64()))
    ok = pc.equal(cand, values).to_numpy(zero_copy_only=False)
    bad = (idx >= 0) & (ok != True)  # noqa: E712 — ok may contain None
    if bad.any():
        sub = pc.index_in(values.take(pa.array(np.nonzero(bad)[0])),
                          value_set=right_keys)
        idx[bad] = (sub.fill_null(-1).to_numpy(zero_copy_only=False)
                    .astype(np.int64))
    return pa.array(idx, pa.int64(), mask=(idx < 0))


def _lookup_batch(batch: pa.Table, right: pa.Table, on: str,
                  memo_token=None) -> pa.Table:
    keys = right[on]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    idx = lookup_indices(batch[on], keys, memo_token)
    for name in right.column_names:
        if name == on:
            continue
        batch = batch.append_column(name, pc.take(right[name], idx))
    return batch


# worker-process-level memo: Ray reuses worker processes across map tasks,
# so state keyed by the broadcast ObjectRef builds ONCE per worker instead
# of once per batch.  (Measured: worth it for the SORTED dup-set probe
# below; NOT worth it for string-key lookups, where arrow index_in beats a
# memoized pandas Index probe 132 vs 308 ms / 262k keys.)
_WORKER_MEMO: dict = {}
_WORKER_MEMO_MAX = 16  # FIFO-evict: long sessions must not pin old tables


def _memo_put(key, val):
    if len(_WORKER_MEMO) >= _WORKER_MEMO_MAX:
        _WORKER_MEMO.pop(next(iter(_WORKER_MEMO)))
    _WORKER_MEMO[key] = val
    return val


def _memo_key(ref) -> str:
    try:
        return ref.hex()
    except AttributeError:
        return str(id(ref))


def isin_mask_memo(values: pa.Array, set_ref) -> "object":
    """Membership mask of int64 ``values`` in a broadcast int64 set: an
    int64 pandas Index (khash) built once per worker, probed per batch
    (pc.is_in rebuilds its hash set per call; a sorted-array searchsorted
    probe measured ~6× slower — random binary search thrashes the cache)."""
    import numpy as np
    import pandas as pd
    import ray

    key = ("isin", _memo_key(set_ref))
    ix = _WORKER_MEMO.get(key)
    if ix is None:
        ix = _memo_put(key, pd.Index(np.unique(ray.get(set_ref).to_numpy())))
    v = values.to_numpy()
    if not len(ix):
        return pa.array(np.zeros(len(v), bool))
    return pa.array(ix.get_indexer(v) >= 0)


def attach_lookup(left_ds, right_ds, on: str, broadcast_threshold: int = 2_000_000,
                  num_partitions: int = 32, empty_schema: pa.Schema | None = None):
    """Left-outer attach of right_ds's columns onto left_ds by key ``on``.

    ``empty_schema``: schema to assume when the right side comes back empty
    (an empty Dataset loses its schema after groupby/map stages) — the left
    side then gets all-null columns instead of a KeyError.
    """
    right = right_ds.materialize()
    n = right.count()
    if n <= broadcast_threshold:
        # zero-row pass-through blocks can surface with a different (even
        # empty) schema than the real blocks — they carry nothing, skip
        blocks = [t for t in ray.get(right.to_arrow_refs())
                  if isinstance(t, pa.Table) and on in t.schema.names]
        tbl = pa.concat_tables(blocks).combine_chunks() if blocks \
            else pa.table({})
        if (tbl.num_columns == 0 or on not in tbl.column_names) and empty_schema is not None:
            tbl = empty_schema.empty_table()
        ref = ray.put(tbl)

        token = _memo_key(ref)

        def lookup(batch: pa.Table) -> pa.Table:
            # big right side: memoized hash-probe (see lookup_indices);
            # small right side: plain index_in (hash build is cheap there)
            return _lookup_batch(batch, ray.get(ref), on, memo_token=token)

        return left_ds.map_batches(lookup, batch_format="pyarrow",
                                   zero_copy_batch=True)
    # Ray's hash join spawns num_partitions HashShuffleAggregator actors,
    # each reserving 0.125 CPU + ~1 GB logical memory.  A hard 32 reserves
    # ALL CPU on a small session (4 CPUs × 8 = 32 × 0.125) — two chained
    # attaches then DEADLOCK: the second join's aggregators and every map
    # task wait forever.  Cap at 2×CPU so one join reserves ≤ 1/4 of the
    # cluster; at real scale num_partitions should grow with DATA and the
    # cap (2×CPUs across the cluster) is far above any requested value.
    ncpu = _ncpus()
    nparts = max(2, min(num_partitions, 2 * ncpu))
    joined = left_ds.join(right, "left_outer", num_partitions=nparts,
                          on=(on,))
    # Ray's join emits a ZERO-COLUMN block for any partition that received
    # no shard on either side (JoinAggregator.finalize builds from an
    # empty ArrowBlockBuilder).  Feeding such a block into a SECOND join
    # crashes its finalize (acero: "No match or multiple matches for key
    # field ... on left side") — and since nparts tracks *available* CPUs,
    # whether an unhit partition exists varies run to run (flaky under a
    # busy session).  The join is a full barrier anyway (aggregators hold
    # every partition until finalize), so materializing costs no extra
    # memory high-water: drop the colless empties and re-wrap.
    import ray.data as rd

    refs = joined.materialize().to_arrow_refs()

    @ray.remote
    def _has_cols(t: pa.Table) -> bool:
        return isinstance(t, pa.Table) and t.num_columns > 0

    keep = [r for r, ok in
            zip(refs, ray.get([_has_cols.remote(r) for r in refs])) if ok]
    if keep:
        return rd.from_arrow_refs(keep)
    if empty_schema is not None:
        return rd.from_arrow(empty_schema.empty_table())
    return joined
