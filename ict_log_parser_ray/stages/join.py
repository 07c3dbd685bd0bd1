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
            return _lookup_batch(batch, ray.get(ref), on)

        return left_ds.map_batches(lookup, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return left_ds.join(right, "left_outer", num_partitions=num_partitions,
                        on=(on,))
