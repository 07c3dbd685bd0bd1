"""Temporal operators the Dataset API lacks (task brief: "as-of join,
range join, windowed aggregate"): implemented as compositions of
``map_batches`` + partition tasks per the brief's (a)/(b) guidance.

- ``asof_join_broadcast``: LEFT AS-OF join — each left row gets the right
  row with the greatest ``on`` ≤ its own, per ``by`` key.  Small right side:
  prepared ONCE driver-side (sorted per-key segments), ``ray.put`` once,
  probed with vectorized ``np.searchsorted`` per batch (stateless tasks, no
  shuffle — the left side streams).
- ``asof_join_partitioned``: the big-big scale path — both sides
  hash-partitioned by ``by`` through a narrow tagging pass, per-partition
  sort-merge with the same searchsorted kernel, result re-wrapped as a
  Dataset (``from_arrow_refs``) with no driver materialization.
- ``interval_join_broadcast``: INNER range join against a small broadcast
  interval table (possibly overlapping intervals) — per batch one sort of
  the probe column + two ``searchsorted`` calls per interval.
- ``interval_join_partitioned``: the big-big scale path — left rows
  tagged by time bucket, intervals exploded over covered buckets, both
  hash-partitioned by bucket; each pair meets in exactly one bucket (the
  left row's), so no dedup pass is needed.
- ``running_sum_partitioned``: per-key running aggregate (SQL
  ``SUM(v) OVER (PARTITION BY k ORDER BY ts, id ROWS UNBOUNDED
  PRECEDING)``).  The rows of one key must meet in one task, but a Ray
  groupby at ~all-distinct keys pays ~100 µs/group scheduling (CLAUDE.md
  measured rule), so: one narrow projection pass tags each row with
  ``hash(key) % nparts``, then ``nparts`` tasks each lexsort their
  partition and segment-cumsum with numpy — the same partition-task shape
  as the streaming flagship's rank finish.
"""

from __future__ import annotations
from ..blocks import ncpus as _ncpus

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _col_np(tbl: pa.Table, name: str) -> np.ndarray:
    arr = tbl[name]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = arr.to_numpy(zero_copy_only=False)
    if out.dtype.kind == "M":  # timestamp → epoch int64 (micros)
        out = out.astype("datetime64[us]").view("int64")
    return out


def _tagged(refs, p: int) -> list[pa.Table]:
    """Blocks of hash partition ``p`` — see ``blocks.tagged_tables``
    (the canonical zero-row-pass-through-guarded gather)."""
    from ..blocks import tagged_tables

    return tagged_tables(refs, p)


def prepare_asof_side(right: pa.Table, by: str, on: str) -> tuple:
    """Driver-side prep of the broadcast side: sort by (by, on), require
    unique (by, on) rows (dedupe upstream — ties would make the join
    nondeterministic), and return (key_index, seg_start, seg_end, ts,
    attach_table) ready for per-batch searchsorted probes."""
    order = pc.sort_indices(right, sort_keys=[(by, "ascending"),
                                              (on, "ascending")])
    right = right.take(order).combine_chunks()
    keys = _col_np(right, by)
    ts = _col_np(right, on)
    b = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    if len(right) > 1:
        ndup = int(((keys[1:] == keys[:-1]) & (ts[1:] == ts[:-1])).sum())
        if ndup:
            # ties would make "the" latest-≤ row nondeterministic
            raise ValueError(
                f"asof right side has {ndup} duplicate ({by}, {on}) "
                f"rows — aggregate them first (e.g. keep max id per ts)")
    seg_start = b
    seg_end = np.r_[b[1:], len(keys)]
    return (pd.Index(keys[b]), seg_start, seg_end, ts, right)


def _asof_probe(batch: pa.Table, side, by: str, on: str,
                attach: dict[str, str]) -> pa.Table:
    """Attach as-of matches from a prepared side (see prepare_asof_side)
    to one left batch — the shared kernel of the broadcast and the
    hash-partitioned variants."""
    key_ix, seg_start, seg_end, r_ts, r_tbl = side
    codes = key_ix.get_indexer(_col_np(batch, by))
    bts = _col_np(batch, on)
    out = np.full(len(batch), -1, np.int64)
    order = np.argsort(codes, kind="stable")
    sc = codes[order]
    uq, starts = np.unique(sc, return_index=True)
    bounds = np.r_[starts, len(sc)]
    for i, u in enumerate(uq):
        if u < 0:
            continue
        rows = order[bounds[i]:bounds[i + 1]]
        lo, hi = seg_start[u], seg_end[u]
        pos = np.searchsorted(r_ts[lo:hi], bts[rows], side="right") - 1
        ok = pos >= 0
        out[rows[ok]] = lo + pos[ok]
    idx = pa.array(out, pa.int64(), mask=(out < 0))
    for src, dst in attach.items():
        batch = batch.append_column(dst, pc.take(r_tbl[src], idx))
    return batch


def asof_join_broadcast(left_ds, right: pa.Table, by: str, on: str,
                        attach: dict[str, str]):
    """LEFT AS-OF: for each left row, attach ``attach`` columns (src→dst
    names) from the right row with max ``on`` ≤ left's ``on`` within the
    same ``by`` key; nulls when no such row.  Right side broadcast once."""
    side_ref = ray.put(prepare_asof_side(right, by, on))

    def probe(batch: pa.Table) -> pa.Table:
        return _asof_probe(batch, ray.get(side_ref), by, on, attach)

    return left_ds.map_batches(probe, batch_format="pyarrow",
                               zero_copy_batch=True)


@ray.remote
def _asof_part(p: int, left_refs, right_refs, by: str, on: str,
               attach: dict[str, str], out_schema: pa.Schema):
    """Sort-merge one hash partition of a big-big as-of join: every row of
    a ``by`` key lands in exactly one partition, so the per-partition
    result equals the global one.  Returns an ObjectRef-able table (the
    driver never sees the rows — from_arrow_refs re-wraps them).
    ``out_schema`` (driver-built from both input schemas) keeps every
    partition's output schema identical even when one side has no tagged
    blocks at all (fully-empty input)."""
    lt_b = [t.drop_columns(["part"]) for t in _tagged(left_refs, p)]
    rt_b = [t.drop_columns(["part"]) for t in _tagged(right_refs, p)]
    lt = pa.concat_tables(lt_b).combine_chunks() if lt_b else None
    rt = pa.concat_tables(rt_b).combine_chunks() if rt_b else None
    if lt is None or lt.num_rows == 0:
        return out_schema.empty_table()
    if rt is None or rt.num_rows == 0:
        # no right rows to match — all-null attach columns
        for src, dst in attach.items():
            lt = lt.append_column(
                dst, pa.nulls(lt.num_rows, out_schema.field(dst).type))
        return lt
    side = prepare_asof_side(rt, by, on)
    return _asof_probe(lt, side, by, on, attach)


def asof_join_partitioned(left_ds, right_ds, by: str, on: str,
                          attach: dict[str, str],
                          left_cols: list[str] | None = None,
                          nparts: int | None = None):
    """Big-big LEFT AS-OF join — the scale path the broadcast variant's
    docstring promises: BOTH sides stream through a narrow tagging pass
    (``hash(by) % nparts``), then ``nparts`` partition tasks each
    sort-merge their slice with the shared searchsorted kernel.  The
    result comes back as a Dataset over the partition tasks' output refs
    (``from_arrow_refs``) — no driver materialization.

    ``left_cols``: columns of the left side to carry through (default all;
    project to what you need — this is the shuffled payload).  Same
    partition-task shape as the streaming flagship's rank finish; at
    cluster scale the scan-and-filter becomes a real hash shuffle."""
    if nparts is None:
        ncpu = _ncpus()
        nparts = max(4, min(ncpu, 32))

    def tagger(cols):
        def tag(b: pa.Table) -> pa.Table:
            kv = _col_np(b, by)
            part = (pd.util.hash_pandas_object(
                pd.Series(kv), index=False).to_numpy()
                % np.uint64(nparts)).astype("int64")
            out = b.select(cols)
            return out.append_column("part", pa.array(part))
        return tag

    lcols = left_cols if left_cols is not None else left_ds.schema().names
    lcols = list(dict.fromkeys([by, on] + [c for c in lcols
                                           if c not in (by, on)]))
    rcols = list(dict.fromkeys([by, on] + list(attach)))
    lsch, rsch = left_ds.schema(), right_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in lcols]
        + [pa.field(dst, rtypes[src]) for src, dst in attach.items()])
    ln = left_ds.map_batches(tagger(lcols), batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    rn = right_ds.map_batches(tagger(rcols), batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    left_refs, right_refs = ln.to_arrow_refs(), rn.to_arrow_refs()
    import ray.data as rd
    refs = [_asof_part.remote(p, left_refs, right_refs, by, on, attach,
                              out_schema)
            for p in range(nparts)]
    return rd.from_arrow_refs(refs)


def interval_join_broadcast(left_ds, intervals: pa.Table, on: str,
                            start: str, end: str, attach: dict[str, str]):
    """INNER range/interval join: one output row per (left row, interval)
    pair with ``interval.start <= left.on < interval.end`` (half-open).
    Intervals may OVERLAP — a left row matching k intervals emits k rows.

    Small interval side (the broadcast case, per the task brief's (a)
    composition guidance): ``ray.put`` once; each batch sorts its ``on``
    column once and probes every interval with two ``np.searchsorted``
    calls — O(B log B + I log B) per batch instead of the O(I × B)
    per-interval mask scan, so thousands of intervals stay cheap.  The
    left side streams; no shuffle.  Big-big range joins need both sides
    bucketed by coarse time range (band the interval over its covered
    buckets) + a per-bucket probe; that variant is the documented scale
    path, not implemented until a caller needs it."""
    ivs = intervals.combine_chunks()
    s = _col_np(ivs, start)
    e = _col_np(ivs, end)
    side_ref = ray.put((s, e, ivs))

    def probe(batch: pa.Table) -> pa.Table:
        s, e, itbl = ray.get(side_ref)
        ts = _col_np(batch, on)
        order = np.argsort(ts, kind="stable")
        st = ts[order]
        lo = np.searchsorted(st, s, side="left")
        hi = np.searchsorted(st, e, side="left")
        # reversed/empty intervals (end <= start) match nothing — clamp,
        # matching interval_join_partitioned's explicit drop
        cnt = np.maximum(hi - lo, 0)
        total = int(cnt.sum())
        ii = np.repeat(np.arange(len(s), dtype=np.int64), cnt)
        offs = np.r_[np.int64(0), np.cumsum(cnt)[:-1]] if len(cnt) \
            else np.empty(0, np.int64)
        # concatenated ranges [lo_i, hi_i): global position minus its
        # group offset plus the group's lo, fully vectorized
        pos = np.arange(total, dtype=np.int64) + np.repeat(lo - offs, cnt)
        left_rows = order[pos]
        out = batch.take(pa.array(left_rows, pa.int64()))
        for src, dst in attach.items():
            out = out.append_column(
                dst, pc.take(itbl[src], pa.array(ii, pa.int64())))
        return out

    return left_ds.map_batches(probe, batch_format="pyarrow",
                               zero_copy_batch=True)


def sliding_window_count(ds, on: str, key: str, slide_us: int,
                         nwin: int = 4) -> pa.Table:
    """Sliding event-time window count (task-brief "streaming window"
    custom op): per (window_start, key) row counts for windows of width
    ``nwin × slide_us`` advancing every ``slide_us`` — width an exact
    multiple of the slide, so every event belongs to exactly ``nwin``
    windows and the explode factor is a constant, not data-dependent.

    Shape: per-batch vectorized window assignment (one int divide + nwin
    shifted copies) + per-batch arrow partial combine (≤ windows-per-batch
    × keys groups), then a driver finish over the tiny partial stream —
    the CLAUDE.md partial-combine rule; a Ray groupby here would shuffle
    every exploded row.  The finish is driver-side because the group
    count is (time-span / slide) × nwin × |keys| — small for coarse
    slides; a fine-slide/high-cardinality-key variant must swap the
    finish for the distributed groupby fallback like the other report
    finishes."""
    S = np.int64(slide_us)

    def partial(b: pa.Table) -> pa.Table:
        us = _col_np(b, on)
        base = us // S
        kcol = b[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        tiles = []
        for j in range(nwin):
            ws = (base - j) * S
            tiles.append(pa.table({"window_start": pa.array(ws, pa.int64()),
                                   key: kcol}))
        return pa.TableGroupBy(pa.concat_tables(tiles),
                               ["window_start", key]).aggregate(
            [([], "count_all")])

    from ..blocks import concat_shaped
    ktype = dict(zip(ds.schema().names, ds.schema().types)).get(
        key, pa.int64())
    parts = concat_shaped(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).materialize(),
        "window_start",
        empty_schema=pa.schema([("window_start", pa.int64()),
                                (key, ktype),
                                ("count_all", pa.int64())]))
    df = (parts.to_pandas().groupby(["window_start", key], as_index=False)
          ["count_all"].sum().rename(columns={"count_all": "n"}))
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


@ray.remote
def _ijoin_part(p: int, left_refs, right_refs, on: str,
                attach: dict[str, str], out_schema: pa.Schema) -> pa.Table:
    """Join one bucket-hash partition of a big-big interval join.  Each
    left row lives in exactly ONE bucket and an interval is probed only
    against the left segment of each bucket it covers, so every matched
    (row, interval) pair is emitted exactly once even though intervals
    explode across buckets.  ``out_schema`` (driver-built) keeps every
    partition's output identical even when a side has no tagged blocks
    (fully-empty input — zero-row blocks bypass the tagging UDF)."""
    lt_b = [t.drop_columns(["part"]) for t in _tagged(left_refs, p)]
    rt_b = [t.drop_columns(["part"]) for t in _tagged(right_refs, p)]
    empty = out_schema.empty_table()
    if not lt_b or not rt_b:
        return empty
    lt = pa.concat_tables(lt_b).combine_chunks()
    rt = pa.concat_tables(rt_b).combine_chunks()
    base = lt.drop_columns(["bucket"])
    if lt.num_rows == 0 or rt.num_rows == 0:
        return empty
    lb = _col_np(lt, "bucket")
    lts = _col_np(lt, on)
    order = np.lexsort((lts, lb))
    sb, st = lb[order], lts[order]
    uqb, seg_lo = np.unique(sb, return_index=True)
    seg_hi = np.r_[seg_lo[1:], len(sb)]

    rb = _col_np(rt, "bucket")
    rs = _col_np(rt, "__start")
    re_ = _col_np(rt, "__end")
    rorder = np.argsort(rb, kind="stable")

    lpos_parts, ipos_parts = [], []
    rbs = rb[rorder]
    grp_b = np.flatnonzero(np.r_[True, rbs[1:] != rbs[:-1]])
    grp_e = np.r_[grp_b[1:], len(rbs)]
    for gi in range(len(grp_b)):
        bkt = rbs[grp_b[gi]]
        si = np.searchsorted(uqb, bkt)
        if si >= len(uqb) or uqb[si] != bkt:
            continue  # no left rows in this bucket
        lo0, hi0 = seg_lo[si], seg_hi[si]
        seg_ts = st[lo0:hi0]
        ivs = rorder[grp_b[gi]:grp_e[gi]]
        lo = np.searchsorted(seg_ts, rs[ivs], side="left")
        hi = np.searchsorted(seg_ts, re_[ivs], side="left")
        cnt = hi - lo
        total = int(cnt.sum())
        if not total:
            continue
        offs = np.r_[np.int64(0), np.cumsum(cnt)[:-1]]
        pos = np.arange(total, dtype=np.int64) + np.repeat(lo - offs, cnt)
        lpos_parts.append(order[lo0 + pos])
        ipos_parts.append(np.repeat(ivs, cnt))
    if not lpos_parts:
        return empty
    lpos = np.concatenate(lpos_parts)
    ipos = np.concatenate(ipos_parts)
    out = base.take(pa.array(lpos, pa.int64()))
    for src, dst in attach.items():
        out = out.append_column(dst, pc.take(rt[src],
                                             pa.array(ipos, pa.int64())))
    return out


def interval_join_partitioned(left_ds, right_ds, on: str, start: str,
                              end: str, attach: dict[str, str],
                              bucket_us: int,
                              left_cols: list[str] | None = None,
                              nparts: int | None = None):
    """Big-big range/interval join — the time-bucket-banding scale path
    of ``interval_join_broadcast``: left rows are tagged with their time
    bucket (``on // bucket_us``), intervals are EXPLODED over every
    bucket they cover, both streams are hash-partitioned by bucket, and
    each partition task probes its buckets' left segments with the same
    searchsorted kernel.  Pick ``bucket_us`` near the typical interval
    width: the interval explode factor is ~(width / bucket_us) + 1.
    Returns a Dataset over the partition outputs (no driver
    materialization).  Same half-open [start, end) semantics; overlap
    allowed; each matched pair emitted exactly once."""
    if nparts is None:
        ncpu = _ncpus()
        nparts = max(4, min(ncpu, 32))
    W = np.int64(bucket_us)
    MULT = np.uint64(0x9E3779B97F4A7C15)  # decorrelate adjacent buckets

    def tag_left(b: pa.Table) -> pa.Table:
        cols = left_cols if left_cols is not None else \
            [c for c in b.column_names]
        cols = list(dict.fromkeys([on] + cols))
        ts = _col_np(b, on)
        bucket = ts // W
        part = ((bucket.astype(np.uint64) * MULT)
                % np.uint64(nparts)).astype("int64")
        out = b.select(cols)
        out = out.append_column("bucket", pa.array(bucket, pa.int64()))
        return out.append_column("part", pa.array(part))

    def explode_right(b: pa.Table) -> pa.Table:
        s = _col_np(b, start)
        e = _col_np(b, end)
        b0 = s // W
        b1 = np.maximum((e - 1) // W, b0)  # empty intervals explode once
        cnt = (b1 - b0 + 1).astype(np.int64)
        cnt[e <= s] = 0                    # ...and are then dropped
        total = int(cnt.sum())
        offs = np.r_[np.int64(0), np.cumsum(cnt)[:-1]] if len(cnt) \
            else np.empty(0, np.int64)
        rows = np.repeat(np.arange(len(s), dtype=np.int64), cnt)
        bucket = np.arange(total, dtype=np.int64) \
            + np.repeat(b0 - offs, cnt)
        part = ((bucket.astype(np.uint64) * MULT)
                % np.uint64(nparts)).astype("int64")
        idx = pa.array(rows, pa.int64())
        cols = {"part": pa.array(part),
                "bucket": pa.array(bucket, pa.int64()),
                "__start": pa.array(s[rows], pa.int64()),
                "__end": pa.array(e[rows], pa.int64())}
        for src in attach:
            cols[src] = pc.take(b[src], idx)
        return pa.table(cols)

    lsch, rsch = left_ds.schema(), right_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    out_cols = list(dict.fromkeys(
        [on] + (left_cols if left_cols is not None else list(lsch.names))))
    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in out_cols]
        + [pa.field(dst, rtypes[src]) for src, dst in attach.items()])
    ln = left_ds.map_batches(tag_left, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    rn = right_ds.map_batches(explode_right, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    left_refs, right_refs = ln.to_arrow_refs(), rn.to_arrow_refs()
    import ray.data as rd
    return rd.from_arrow_refs([
        _ijoin_part.remote(p, left_refs, right_refs, on, attach, out_schema)
        for p in range(nparts)])


def _narrow_tag_refs(ds, key: str, ts: str, idc: str, nparts: int,
                     val: str | None = None) -> list:
    """Shared scaffold of the per-key partitioned operators (sessionize /
    inter-arrival / running sum): one narrow (part, key, ts, id[, val])
    int64 tagging pass, materialized, returning the pinned block refs
    for the per-partition tasks to gather via ``_tagged``."""
    def tag(b: pa.Table) -> pa.Table:
        kv = _col_np(b, key)
        part = (kv.astype(np.uint64) % np.uint64(nparts)).astype(np.int64)
        cols = {
            "part": pa.array(part),
            key: pa.array(kv, pa.int64()),
            ts: pa.array(_col_np(b, ts), pa.int64()),
            idc: pa.array(_col_np(b, idc), pa.int64()),
        }
        if val is not None:
            cols[val] = pa.array(_col_np(b, val).astype(np.float64))
        return pa.table(cols)

    return ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True).materialize() \
        .to_arrow_refs()


@ray.remote
def _session_part(p: int, refs, key: str, ts: str, idc: str,
                  gap_us: int) -> pa.Table:
    """Sessionize one hash partition: lexsort (key, ts, id), flag rows
    whose gap to the previous same-key row exceeds ``gap_us``, segment by
    cumulative boundary count, and reduce each segment to one session
    row — all numpy, no per-row Python."""
    tbls = _tagged(refs, p)
    t = pa.concat_tables(tbls).combine_chunks() if tbls else None
    if t is None or t.num_rows == 0:
        return pa.table({key: pa.array([], pa.int64()),
                         "session_start": pa.array([], pa.int64()),
                         "session_end": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    k = _col_np(t, key)
    tsv = _col_np(t, ts)
    ids = _col_np(t, idc)
    order = np.lexsort((ids, tsv, k))
    k, tsv = k[order], tsv[order]
    new_key = np.r_[True, k[1:] != k[:-1]]
    gap = np.r_[np.int64(0), tsv[1:] - tsv[:-1]]
    boundary = new_key | (gap > gap_us)
    b = np.flatnonzero(boundary)
    ends = np.r_[b[1:], len(k)] - 1
    return pa.table({
        key: pa.array(k[b], pa.int64()),
        "session_start": pa.array(tsv[b], pa.int64()),
        "session_end": pa.array(tsv[ends], pa.int64()),
        "n_events": pa.array(np.diff(np.r_[b, len(k)]), pa.int64()),
    })


def sessionize_partitioned(ds, key: str, ts: str, idc: str,
                           gap_us: int, nparts: int | None = None):
    """Gap-based sessionization (the classic log-pipeline operator): split
    each key's event stream into sessions wherever the gap to the previous
    event exceeds ``gap_us``; emit one row per session with start/end and
    event count.  Ordering within a key is (ts, id) so ties are
    deterministic.

    Same shape as ``running_sum_partitioned`` (and the same int64-key
    restriction — hash string keys to int64 upstream): a narrow tagging
    pass (``hash(key) % nparts``) so every key's rows meet in exactly one
    partition task, then numpy lexsort + boundary-flag + segment reduce
    per partition.  Returns a Dataset over the partition outputs
    (``from_arrow_refs``) — session counts can rival event counts, so the
    result must not funnel through the driver."""
    if nparts is None:
        ncpu = _ncpus()
        nparts = max(4, min(ncpu, 32))

    refs = _narrow_tag_refs(ds, key, ts, idc, nparts)
    import ray.data as rd
    return rd.from_arrow_refs([
        _session_part.remote(p, refs, key, ts, idc, gap_us)
        for p in range(nparts)])


@ray.remote
def _gap_part(p: int, refs, key: str, ts: str, idc: str) -> pa.Table:
    """Inter-arrival stats for one hash partition: lexsort (key, ts, id),
    consecutive same-key deltas, segment count/sum/max per key — all
    numpy, no per-row Python."""
    empty = pa.table({key: pa.array([], pa.int64()),
                      "n_gaps": pa.array([], pa.int64()),
                      "sum_gap_us": pa.array([], pa.int64()),
                      "max_gap_us": pa.array([], pa.int64())})
    tbls = _tagged(refs, p)
    t = pa.concat_tables(tbls).combine_chunks() if tbls else None
    if t is None or t.num_rows == 0:
        return empty
    k = _col_np(t, key)
    tsv = _col_np(t, ts)
    ids = _col_np(t, idc)
    # null ts rows: _col_np renders NaT as int64-min, which would sort
    # first and fabricate a huge gap — SQL LAG yields NULL there and the
    # oracle's WHERE drops it, so drop the rows before computing gaps
    ok = tsv != np.iinfo(np.int64).min
    if not ok.all():
        k, tsv, ids = k[ok], tsv[ok], ids[ok]
        if k.size == 0:
            return empty
    order = np.lexsort((ids, tsv, k))
    k, tsv = k[order], tsv[order]
    same = k[1:] == k[:-1]
    if not same.any():
        return empty
    gaps = (tsv[1:] - tsv[:-1])[same]
    gk = k[1:][same]
    b = np.flatnonzero(np.r_[True, gk[1:] != gk[:-1]])
    return pa.table({
        key: pa.array(gk[b], pa.int64()),
        "n_gaps": pa.array(np.diff(np.r_[b, gk.size]).astype(np.int64)),
        "sum_gap_us": pa.array(np.add.reduceat(gaps, b), pa.int64()),
        "max_gap_us": pa.array(np.maximum.reduceat(gaps, b), pa.int64()),
    })


def interarrival_partitioned(ds, key: str, ts: str, idc: str,
                             nparts: int | None = None):
    """Per-key inter-arrival (lead/lag delta) statistics ordered by
    (ts, id): for each key with ≥2 events, the count, sum and max of
    consecutive time gaps.  Keys with one event emit nothing (they have
    no gap), matching SQL ``LAG ... WHERE gap IS NOT NULL``.

    Why the partitioned-sort shape: count and SUM of consecutive gaps
    are trivially mergeable (sum == last_ts − first_ts per key, count ==
    n − 1), but **max gap is not** — it needs every key's events ordered
    in one place, so this reuses the sessionize/running-sum machinery: a
    narrow (part, key, ts, id) tagging pass, then nparts partition tasks
    (lexsort + masked diff + segment reduceat).  Same int64-key
    restriction as its siblings; gaps are int64 epoch-microseconds so
    the SQL oracle comparison is hash-exact.  Returns a Dataset over the
    partition outputs (one row per key — can rival the key count, never
    driver-funneled)."""
    if nparts is None:
        ncpu = _ncpus()
        nparts = max(4, min(ncpu, 32))

    refs = _narrow_tag_refs(ds, key, ts, idc, nparts)
    import ray.data as rd
    return rd.from_arrow_refs([
        _gap_part.remote(p, refs, key, ts, idc)
        for p in range(nparts)])


@ray.remote
def _running_part(p: int, refs, key: str, ts: str, idc: str, val: str):
    tbls = _tagged(refs, p)
    t = pa.concat_tables(tbls).combine_chunks() if tbls else None
    if t is None or t.num_rows == 0:
        return pa.table({idc: pa.array([], pa.int64()),
                         key: pa.array([], pa.int64()),
                         "rn": pa.array([], pa.int64()),
                         "run_sum": pa.array([], pa.float64())})
    k = _col_np(t, key)
    tsv = _col_np(t, ts)
    ids = _col_np(t, idc)
    v = _col_np(t, val).astype(np.float64)
    order = np.lexsort((ids, tsv, k))
    k, ids, v = k[order], ids[order], v[order]
    cs = np.cumsum(v)
    b = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    seg = np.repeat(np.arange(len(b)), np.diff(np.r_[b, len(k)]))
    base = np.where(b > 0, cs[np.maximum(b - 1, 0)], 0.0)
    run = cs - base[seg]
    rn = np.arange(len(k)) - b[seg] + 1
    return pa.table({idc: pa.array(ids, pa.int64()),
                     key: pa.array(k, pa.int64()),
                     "rn": pa.array(rn, pa.int64()),
                     "run_sum": pa.array(np.round(run, 6), pa.float64())})


def running_sum_partitioned(ds, key: str, ts: str, idc: str, val: str,
                            nparts: int | None = None) -> pa.Table:
    """Per-key running sum + row number ordered by (ts, id): one narrow
    tagging pass, then nparts partition tasks (lexsort + segment cumsum).
    run_sum is rounded to 6 — cumulative float sums are association-
    sensitive across engines (DuckDB's window sum uses a segment tree)."""
    if nparts is None:
        ncpu = _ncpus()
        nparts = max(4, min(ncpu, 32))

    refs = _narrow_tag_refs(ds, key, ts, idc, nparts, val=val)
    parts = ray.get([_running_part.remote(p, refs, key, ts, idc, val)
                     for p in range(nparts)])
    return pa.concat_tables(parts)
