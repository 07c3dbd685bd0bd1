"""Connected components over an edge list — duplicate-CLUSTER labeling.

Near-dup pair lists (MinHash/SimHash output) are edges; training-data
dedup needs the transitive closure: one canonical doc per connected
component.  This is distributed min-label propagation:

- the symmetrized edge list is parsed ONCE into pinned Arrow blocks;
  every iteration is a zero-copy ``map_batches`` scan over those blocks
  (read+parse-exactly-once, the repo's core rule);
- per iteration each edge block looks up its src labels (worker-memoized
  khash over the FIXED node array — built once per worker, only the
  label VECTOR ships per iteration) and emits per-batch arrow
  ``(dst, min incoming label)`` partials — bounded by the block's
  distinct dst count, never a Ray groupby at ~all-distinct keys;
- the driver min-combines the partials (O(nodes) numpy) and then
  POINTER-JUMPS the label table (labels are node ids, so label→label
  lookups compress chains): propagation alone needs O(diameter)
  distributed passes, with jumping the total is O(log n).

Scale contract: the NODE table (nodes appearing in any dup pair — a
small fraction of the corpus) fits the driver / one worker; the EDGE
list streams and may be arbitrarily large.  An all-nodes graph would
need a hash-partitioned label exchange instead — out of scope for the
dedup-cluster use case and documented here.

Public algorithm shape: label propagation / pointer jumping as in
"Connected Components in MapReduce and Beyond" (Kiveris et al., SoCC'14).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _pointer_jump(labels: np.ndarray) -> np.ndarray:
    """Compress label chains.  Labels are DENSE NODE CODES (positions
    into the sorted node array), so the chain step is plain array
    indexing ``labels[labels]`` — doubling per pass, O(log chain)."""
    while True:
        nxt = labels[labels]
        if (nxt == labels).all():
            return labels
        labels = nxt


def connected_components(edges_ds, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 64) -> pd.DataFrame:
    """→ (node, component) with component = min node id in the connected
    component; isolated nodes never appear (no edges → no row), matching
    the recursive-CTE SQL twin over the same edge list."""
    import ray

    from ..stages.join import lookup_indices

    def sym(b: pa.Table) -> pa.Table:
        a, bb = b[a_col], b[b_col]
        valid = pc.and_(pc.is_valid(a), pc.is_valid(bb))
        if not pc.all(valid).as_py():
            t = pa.table({"a": a, "b": bb}).filter(valid)
            a, bb = t["a"], t["b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.combine_chunks()
        return pa.table({
            "src": pa.concat_arrays([a, bb]),
            "dst": pa.concat_arrays([bb, a]),
        })

    edges = edges_ds.map_batches(sym, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()

    # node table: per-block uniques → driver unique (bounded by the
    # dup-graph node count, the documented scale contract above)
    # zero-row pass-through blocks can surface UNCONVERTED (pandas)
    # from to_arrow_refs — they carry nothing, skip non-arrow blocks too
    blocks = [t for t in ray.get(edges.to_arrow_refs())
              if isinstance(t, pa.Table) and "src" in t.schema.names
              and t.num_rows]
    if not blocks:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})
    # node table: SORTED ascending, so dense-code order == value order
    # and min-code labels ARE min-node labels — works for int AND string
    # (or any orderable) node ids
    uniqs = [pc.unique(t["src"].combine_chunks()
                       if isinstance(t["src"], pa.ChunkedArray)
                       else t["src"]) for t in blocks]
    nodes_arr = pc.unique(pa.concat_arrays(
        [u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
         for u in uniqs]))
    nodes_arr = nodes_arr.take(pc.sort_indices(nodes_arr))
    n = len(nodes_arr)
    labels = np.arange(n, dtype=np.int64)   # dense codes
    nodes_ref = ray.put(nodes_arr)       # fixed across iterations →
    token = nodes_ref.hex()              # khash memo builds once/worker
    idx_driver = pd.Index(nodes_arr.to_pandas())

    for _ in range(max_iters):
        lbl_ref = ray.put(labels)

        def step(b: pa.Table, _lbl=lbl_ref) -> pa.Table:
            lv = ray.get(_lbl)
            pos = lookup_indices(b["src"], ray.get(nodes_ref),
                                 memo_token=token)
            sl = lv[pos.to_numpy(zero_copy_only=False).astype(np.int64)]
            t = pa.table({"dst": b["dst"], "lbl": pa.array(sl, pa.int64())})
            return pa.TableGroupBy(t, "dst").aggregate([("lbl", "min")])

        parts = [t for t in ray.get(
            edges.map_batches(step, batch_format="pyarrow",
                              zero_copy_batch=True).materialize().to_arrow_refs())
            if isinstance(t, pa.Table) and "lbl_min" in t.schema.names]
        inc = pa.concat_tables(parts)
        dst = inc["dst"].to_numpy(zero_copy_only=False)
        lbl = inc["lbl_min"].to_numpy(zero_copy_only=False)
        new = labels.copy()
        np.minimum.at(new, idx_driver.get_indexer(dst), lbl)
        new = _pointer_jump(new)
        if (new == labels).all():
            break
        labels = new
    else:
        raise RuntimeError(f"no convergence in {max_iters} iterations")

    nodes_pd = nodes_arr.to_pandas()
    return pd.DataFrame({"node": nodes_pd.reset_index(drop=True),
                         "component": nodes_pd.iloc[labels]
                         .reset_index(drop=True)})
