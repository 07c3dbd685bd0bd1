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

import pyarrow as pa
import pyarrow.compute as pc
import ray


def _lookup_batch(batch: pa.Table, right: pa.Table, on: str) -> pa.Table:
    keys = right[on]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    idx = pc.index_in(batch[on], value_set=keys)
    for name in right.column_names:
        if name == on:
            continue
        batch = batch.append_column(name, pc.take(right[name], idx))
    return batch


# worker-process-level memo: Ray reuses worker processes across map tasks,
# so state keyed by the broadcast ObjectRef builds ONCE per worker instead
# of once per batch.  pc.index_in/is_in rebuild their hash set on EVERY
# call — measured ~17s of a 140s pass-2 UDF budget at 557k lookup rows.
_WORKER_MEMO: dict = {}


def _memo_key(ref) -> str:
    try:
        return ref.hex()
    except AttributeError:
        return str(id(ref))


def lookup_batch_memo(batch: pa.Table, right_ref, on: str) -> pa.Table:
    """_lookup_batch against a broadcast ref, with the hash index built once
    per worker (pandas Index) and probed per batch."""
    import numpy as np
    import pandas as pd
    import ray

    key = ("lookup", _memo_key(right_ref), on)
    ent = _WORKER_MEMO.get(key)
    if ent is None:
        right = ray.get(right_ref)
        keys = right[on]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        pidx = pd.Index(keys.to_pandas())
        if not pidx.is_unique:
            pidx = None  # duplicate right keys: index_in (first match) path
        ent = (pidx, right)
        _WORKER_MEMO[key] = ent
    pidx, right = ent
    if pidx is None:
        return _lookup_batch(batch, right, on)
    col = batch[on]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pos = pidx.get_indexer(col.to_pandas())
    idx = pa.array(pos, pa.int64())
    idx = pc.if_else(pc.less(idx, 0), pa.scalar(None, pa.int64()), idx)
    for name in right.column_names:
        if name == on:
            continue
        batch = batch.append_column(name, pc.take(right[name], idx))
    return batch


def isin_mask_memo(values: pa.Array, set_ref) -> "object":
    """Membership mask of int64 ``values`` in a broadcast int64 set: the
    set is SORTED once per worker, probed with np.searchsorted per batch
    (pc.is_in rebuilds its hash set per call)."""
    import numpy as np
    import ray

    key = ("isin", _memo_key(set_ref))
    arr = _WORKER_MEMO.get(key)
    if arr is None:
        arr = np.sort(ray.get(set_ref).to_numpy())
        _WORKER_MEMO[key] = arr
    v = values.to_numpy()
    pos = np.searchsorted(arr, v)
    pos[pos == len(arr)] = max(len(arr) - 1, 0)
    return pa.array(arr[pos] == v if len(arr) else np.zeros(len(v), bool))


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
        tbl = pa.concat_tables(ray.get(right.to_arrow_refs())).combine_chunks()
        if (tbl.num_columns == 0 or on not in tbl.column_names) and empty_schema is not None:
            tbl = empty_schema.empty_table()
        ref = ray.put(tbl)

        def lookup(batch: pa.Table) -> pa.Table:
            return lookup_batch_memo(batch, ref, on)

        return left_ds.map_batches(lookup, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return left_ds.join(right, "left_outer", num_partitions=num_partitions,
                        on=(on,))
