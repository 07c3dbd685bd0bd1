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
list streams and may be arbitrarily large.  Past a node-count budget
(``ICT_CC_MAX_NODES``, default 5e7 — a cheap per-block distinct-count
upper bound, no collection) ``connected_components`` automatically
switches to ``connected_components_partitioned``: the alternating
large-star/small-star label EXCHANGE from Kiveris et al. (SoCC'14),
where no task and no driver ever holds more than one hash partition of
the pair set — the same auto-fallback pattern as
``stages.dedup.exact_dedup_sparse``.

Public algorithm shape: label propagation / pointer jumping and
large-star/small-star as in "Connected Components in MapReduce and
Beyond" (Kiveris et al., SoCC'14).
"""

from __future__ import annotations

import os

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
                         max_iters: int = 64,
                         node_budget: int | None = None) -> pd.DataFrame:
    """→ (node, component) with component = min node id in the connected
    component; isolated nodes never appear (no edges → no row), matching
    the recursive-CTE SQL twin over the same edge list.

    Past ``node_budget`` (env ``ICT_CC_MAX_NODES``, default 5e7 — checked
    with a per-block distinct-count UPPER BOUND before any block reaches
    the driver) integer-keyed graphs switch to the partitioned
    large-star/small-star exchange (``connected_components_partitioned``)
    and only the final (node, component) table is collected; callers
    that cannot hold even that should call the partitioned API directly
    and consume the Dataset."""
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
    erefs = edges.to_arrow_refs()

    # budget gate BEFORE any edge block reaches the driver: sum of
    # per-block distinct-src counts is a cheap node-count upper bound
    # (tiny int results; the blocks stay on the workers)
    if node_budget is None:
        node_budget = int(os.environ.get("ICT_CC_MAX_NODES", 50_000_000))

    @ray.remote
    def _distinct_bound(t) -> int:
        if not isinstance(t, pa.Table) or "src" not in t.schema.names \
                or not t.num_rows:
            return 0
        c = t["src"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return len(pc.unique(c))

    bound = int(sum(ray.get([_distinct_bound.remote(r) for r in erefs])))
    if bound > node_budget:
        sch = edges.schema()
        src_type = dict(zip(sch.names, sch.types))["src"]
        if not pa.types.is_integer(src_type):
            raise ValueError(
                f"node bound {bound} exceeds budget {node_budget} and the "
                "partitioned fallback needs integer node ids — relabel or "
                "raise ICT_CC_MAX_NODES")
        ds = connected_components_partitioned(edges, "src", "dst",
                                              max_rounds=2 * max_iters)
        df = ds.to_pandas()
        if not len(df.columns):   # empty Datasets lose their schema
            df = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                               "component": pd.Series([], dtype="int64")})
        return df.sort_values("node").reset_index(drop=True)

    # node table: per-block uniques → driver unique (bounded by the
    # dup-graph node count, the budget-checked scale contract above)
    # zero-row pass-through blocks can surface UNCONVERTED (pandas)
    # from to_arrow_refs — they carry nothing, skip non-arrow blocks too
    blocks = [t for t in ray.get(erefs)
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


_PAIR_SCHEMA = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
_CC_SCHEMA = pa.schema([("node", pa.int64()), ("component", pa.int64())])


def _pair_table(lo: np.ndarray, hi: np.ndarray) -> pa.Table:
    return pa.table({"lo": pa.array(lo, pa.int64()),
                     "hi": pa.array(hi, pa.int64())})


def _pair_tag(lo: np.ndarray, hi: np.ndarray, nparts: int) -> np.ndarray:
    from ..stages.bloom import _M1, _M2, _mix

    h = _mix(lo.astype(np.uint64) ^ _mix(hi.astype(np.uint64), _M2), _M1)
    return (h % np.uint64(nparts)).astype(np.int64)


def _sorted_dedup(lo: np.ndarray, hi: np.ndarray):
    """Sort pairs by (lo, hi) and drop duplicates — adjacent-compare
    after lexsort (the repo's measured dup-detection pattern; never
    np.unique with return_counts)."""
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    if lo.size:
        keep = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        lo, hi = lo[keep], hi[keep]
    return lo, hi


def connected_components_partitioned(edges_ds, a_col: str = "a",
                                     b_col: str = "b",
                                     nparts: int | None = None,
                                     max_rounds: int = 128):
    """→ Dataset (node, component), component = min node id — the
    over-budget fallback of ``connected_components`` (integer node ids).

    Alternating large-star / small-star (Kiveris et al., SoCC'14): each
    round is scatter (directed edges re-tagged by hash(src)) → star
    (per-src-partition group, emit contracted pairs tagged by pair hash)
    → gather (per-pair-partition sort + dedup + EXACT change check
    against the previous round's canonical partition — same length +
    array equality, not a probabilistic signature).  Convergence = two
    consecutive unchanged ops (stable under both maps), which is the
    min-rooted star fixed point; the result streams out as (child, root)
    rows plus one (root, root) row per component.  No task or driver
    heap ever holds more than one hash partition of the pair set; the
    driver sees only per-partition booleans per round."""
    import ray
    import ray.data as rd

    from ..blocks import ncpus, tagged_tables

    if nparts is None:
        nparts = max(4, min(2 * ncpus(), 64))

    def norm(b: pa.Table) -> pa.Table:
        # self-loop rows (a == b) ride along as lo == hi pairs: they are
        # NOT edges for the star rounds (init splits them out below) but
        # their nodes are singleton components the driver path emits —
        # semantics must match (a node with only a self-loop gets a row)
        a, bb = b[a_col], b[b_col]
        valid = pc.and_(pc.is_valid(a), pc.is_valid(bb))
        t = pa.table({"a": pc.cast(a, pa.int64()),
                      "b": pc.cast(bb, pa.int64())}).filter(valid)
        av = t["a"].to_numpy(zero_copy_only=False)
        bv = t["b"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(av, bv), np.maximum(av, bv)
        out = _pair_table(lo, hi)
        return out.append_column(
            "part", pa.array(_pair_tag(lo, hi, nparts), pa.int64()))

    tagged = edges_ds.map_batches(norm, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    trefs = tagged.to_arrow_refs()

    @ray.remote(num_returns=2)
    def _init_part(p: int):
        """→ (distinct real-edge pair table, distinct self-loop nodes)."""
        tbls = [t for t in tagged_tables(trefs, p) if t.num_rows]
        if not tbls:
            return _PAIR_SCHEMA.empty_table(), np.empty(0, np.int64)
        t = pa.concat_tables(tbls)
        lo, hi = _sorted_dedup(
            t["lo"].to_numpy(zero_copy_only=False),
            t["hi"].to_numpy(zero_copy_only=False))
        loop = lo == hi
        return _pair_table(lo[~loop], hi[~loop]), np.unique(lo[loop])

    @ray.remote
    def _scatter(tbl: pa.Table, large: bool, nparts: int):
        """Canonical pair partition → nparts directed-edge slices
        grouped by hash(src).  Large-star needs the full symmetric
        adjacency; small-star only edges directed larger → smaller."""
        from ..stages.bloom import _M1, _mix

        lo = tbl["lo"].to_numpy(zero_copy_only=False)
        hi = tbl["hi"].to_numpy(zero_copy_only=False)
        if large:
            src = np.concatenate([lo, hi])
            dst = np.concatenate([hi, lo])
        else:
            src, dst = hi, lo
        tag = (_mix(src.astype(np.uint64), _M1)
               % np.uint64(nparts)).astype(np.int64)
        return tuple(
            pa.table({"src": pa.array(src[tag == q], pa.int64()),
                      "dst": pa.array(dst[tag == q], pa.int64())})
            for q in range(nparts))

    @ray.remote
    def _star(slices, large: bool, nparts: int):
        """One src partition: group by src (lexsort — the first dst per
        group IS the min), emit the star-contracted pairs, tag by pair
        hash for the canonical gather."""
        tbls = [t for t in ray.get(slices) if t.num_rows]
        if not tbls:
            return tuple(_PAIR_SCHEMA.empty_table() for _ in range(nparts))
        t = pa.concat_tables(tbls)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        starts = np.r_[np.int64(0),
                       np.flatnonzero(src[1:] != src[:-1]) + 1]
        counts = np.diff(np.r_[starts, np.int64(src.size)])
        gsrc, gmin = src[starts], dst[starts]
        if large:
            # connect every strictly larger neighbor to
            # m = min(neighbors ∪ self)
            m_row = np.repeat(np.minimum(gmin, gsrc), counts)
            mask = dst > src
            lo_o, hi_o = m_row[mask], dst[mask]
        else:
            # connect self + every smaller neighbor to the min neighbor
            m = gmin                       # all dst < src here
            m_row = np.repeat(m, counts)
            mask = dst != m_row
            lo_o = np.concatenate([m_row[mask], m])
            hi_o = np.concatenate([dst[mask], gsrc])
        if lo_o.size == 0:
            return tuple(_PAIR_SCHEMA.empty_table() for _ in range(nparts))
        tag = _pair_tag(lo_o, hi_o, nparts)
        return tuple(_pair_table(lo_o[tag == q], hi_o[tag == q])
                     for q in range(nparts))

    @ray.remote(num_returns=2)
    def _gather(slices, prev: pa.Table):
        """Canonical pair partition for this round + EXACT changed flag
        vs the previous round (pair → partition is deterministic, so
        per-partition set equality is a local array compare)."""
        tbls = [t for t in ray.get(slices) if t.num_rows]
        if not tbls:
            lo = hi = np.empty(0, np.int64)
        else:
            t = pa.concat_tables(tbls)
            lo, hi = _sorted_dedup(
                t["lo"].to_numpy(zero_copy_only=False),
                t["hi"].to_numpy(zero_copy_only=False))
        plo = prev["lo"].to_numpy(zero_copy_only=False)
        phi = prev["hi"].to_numpy(zero_copy_only=False)
        changed = not (lo.size == plo.size and np.array_equal(lo, plo)
                       and np.array_equal(hi, phi))
        return _pair_table(lo, hi), changed

    inits = [_init_part.remote(p) for p in range(nparts)]
    cur = [i[0] for i in inits]
    loop_refs = [i[1] for i in inits]
    large = True
    stable = 0
    for _ in range(max_rounds):
        scat = [_scatter.options(num_returns=nparts).remote(
            cur[i], large, nparts) for i in range(nparts)]
        star = [_star.options(num_returns=nparts).remote(
            [s[p] for s in scat], large, nparts) for p in range(nparts)]
        out = [_gather.remote([st[q] for st in star], cur[q])
               for q in range(nparts)]
        nxt = [o[0] for o in out]
        changed = any(ray.get([o[1] for o in out]))
        cur = nxt
        stable = 0 if changed else stable + 1
        if stable >= 2:
            break
        large = not large
    else:
        raise RuntimeError(f"no convergence in {max_rounds} star rounds")

    @ray.remote
    def _children(tbl: pa.Table) -> pa.Table:
        return pa.table({"node": tbl["hi"], "component": tbl["lo"]})

    @ray.remote
    def _node_slices(tbl: pa.Table, col: str, nparts: int):
        """Distinct node ids of one pair-partition column, sliced by
        node hash (aligns roots/children/loops for the singles check)."""
        from ..stages.bloom import _M1, _mix

        r = np.unique(tbl[col].to_numpy(zero_copy_only=False))
        tag = (_mix(r.astype(np.uint64), _M1)
               % np.uint64(nparts)).astype(np.int64)
        return tuple(r[tag == q] for q in range(nparts))

    @ray.remote
    def _arr_slices(arr: np.ndarray, nparts: int):
        from ..stages.bloom import _M1, _mix

        tag = (_mix(arr.astype(np.uint64), _M1)
               % np.uint64(nparts)).astype(np.int64)
        return tuple(arr[tag == q] for q in range(nparts))

    @ray.remote
    def _roots(root_sl, child_sl, loop_sl) -> pa.Table:
        """One node-hash partition: (r, r) per distinct root, plus
        (x, x) for self-loop-only nodes — loop nodes already present as
        a root or child elsewhere in the pair set get no extra row
        (matches the driver path, where a self-loop is just an edge)."""
        def gather(slices):
            parts = [a for a in ray.get(slices) if len(a)]
            return np.unique(np.concatenate(parts)) if parts \
                else np.empty(0, np.int64)

        roots = gather(root_sl)
        singles = np.setdiff1d(
            gather(loop_sl), np.union1d(roots, gather(child_sl)))
        out = np.sort(np.concatenate([roots, singles]))
        if not out.size:
            return _CC_SCHEMA.empty_table()
        ra = pa.array(out, pa.int64())
        return pa.table({"node": ra, "component": ra})

    rsl = [_node_slices.options(num_returns=nparts).remote(c, "lo", nparts)
           for c in cur]
    csl = [_node_slices.options(num_returns=nparts).remote(c, "hi", nparts)
           for c in cur]
    lsl = [_arr_slices.options(num_returns=nparts).remote(l, nparts)
           for l in loop_refs]
    refs = ([_children.remote(c) for c in cur]
            + [_roots.remote([r[q] for r in rsl], [c[q] for c in csl],
                             [l[q] for l in lsl]) for q in range(nparts)])
    return rd.from_arrow_refs(refs)
