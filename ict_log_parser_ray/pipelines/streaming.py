"""Fully streaming flagship: NO intermediate materialization.

The materialized flagship (`flagship.build(materialize_intermediates=True)`)
pins the parsed stream in the object store so many consumers can fan out;
that copy is memory-bandwidth-bound and does not CPU-scale.  At 100 TB it
would also mean object-store spilling of the whole corpus.  This variant
trades one extra (narrow, specialized) read for zero big materializations:

- **pass 1** (read 4 columns → hash + header/END-only parse): emits only a
  narrow tagged stream of per-batch attempt partials + dedup key hashes
  (≈ 20 B/row), both pre-partitioned by a hash part id.  Pass 1 never runs
  the analog/digital regexes or the enrich lookup — only the ~5% of rows
  prefixed ``{@BTEST`` are parsed at all — so it costs a fraction of a full
  parse pass.  The finish is DISTRIBUTED (round-1 judged the driver-serial
  np.unique/rank finish the top scaling defect) and OVERLAPPED with pass 2
  (round 2): P reduce tasks each unique one hash partition (duplicate keys
  out), P combine tasks each reduce one conv-hash partition of the attempt
  partials, P rank tasks each rank one serial-hash bucket with the shared
  numpy kernel — all launched as ``num_cpus=0`` futures so pass 2 starts
  immediately and its first batch per worker blocks in-UDF until the
  dup/flags futures resolve, hiding the finish latency behind pass-2's
  read+parse.  Driver-side work is O(#parts) list plumbing + one concat of
  the (turns/40) ranked table after pass 2 completes.
- **pass 2** (read → parse → enrich → kh → flags → route → write): drops
  every copy of a duplicate key, writes the per-sink parquet as a map-task
  side effect, and returns per-batch turn metrics (fails pre-combined per
  batch).  The dropped collision rows travel back in the same return stream
  as arrow-IPC blobs (bounded by 2×dup-rate); the driver dedupes the
  keepers, routes them locally with the same code, appends one keeper file
  per sink, and merges their metrics before finishing.

Both passes stream under backpressure; peak memory is O(batch), not O(data).
Scale bound: the materialized narrow stream (hashes, attempt partials,
collision keepers) — each reduce task reads every narrow block and filters
its partition, so the narrow stream must fit the aggregate object store
(it is ~0.1% of the input).  Beyond that use the materialized build with
the distributed fallbacks, or the manifest-sharded run.
"""

from __future__ import annotations
from ..blocks import ncpus as _ncpus

import io
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..sources.transcripts import read_transcripts
from ..stages.attempts import (_RANKED_SCHEMA, _add_rank_bucket,
                               _attempt_rows_partial_raw,
                               _combine_attempt_partials, _rank_df)
from ..stages.dedup import _key_hash, add_key_hash_column
from ..stages.enrich import enrich_dataset
from ..stages.parse import parse_dataset
from ..stages.route import SINKS, add_sink_column, sink_array
from .reports import (_sink_part_name, finish_turn_metrics,
                      turn_partials_batch, write_sink_file)

_P1_SCHEMA = pa.schema([
    ("kind", pa.string()),       # 'hashes' | 'att'
    ("part", pa.int64()),        # hash partition (blob rows: key-hash part;
                                 #  att rows: conv-hash part)
    ("hash_blob", pa.binary()),  # raw int64 bytes of this part's key hashes
    ("conv_id", pa.string()),
    ("tool", pa.string()),
    ("start_ts", pa.int64()),
    ("hdr_pack", pa.string()),
    ("end_pack", pa.string()),
])


def _pass1_batch(b: pa.Table, nparts: int) -> pa.Table:
    """RAW transcript batch → attempt partial rows + per-part blob rows
    carrying the batch's key hashes as raw bytes (the reducers read blobs
    zero-copy with np.frombuffer; shipping hashes as 14M arrow ROWS cost
    ~15s of driver-side concat/filter in an earlier design).

    Everything is pre-partitioned here, in the embarrassingly parallel
    stage, so the reduce tasks only filter+concat their own part."""
    kh = np.asarray(_key_hash(b, ["conv_id", "turn_idx"]))
    part = (kh.astype(np.uint64) % np.uint64(nparts)).astype(np.int64)

    att = _attempt_rows_partial_raw(b)
    conv = att["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    from pandas.util import hash_pandas_object
    cpart = (hash_pandas_object(conv.to_pandas(), index=False).to_numpy()
             % np.uint64(nparts)).astype("int64")

    # one stable radix argsort over 1-byte part ids + offset slicing is
    # O(n) regardless of nparts (measured 0.30-0.36 ms/32k batch vs a
    # 0.9-1.7 ms per-part mask loop that grows with nparts — the loop
    # would dominate at the part counts a multi-node shuffle needs)
    order = np.argsort(part.astype(np.uint8) if nparts <= 256 else part,
                       kind="stable")
    skh = kh[order]
    counts = np.bincount(part, minlength=nparts)
    offs = np.concatenate([[0], np.cumsum(counts)])
    blob_parts, blobs = [], []
    for p in range(nparts):
        if counts[p]:
            blob_parts.append(p)
            # pre-SORT each blob here, in the embarrassingly parallel
            # stage: the finish task's np.sort over the concatenated
            # blobs then runs on presorted runs (~3× faster, measured
            # 0.057 vs 0.158 s/3.6M) — the finish chain's latency stalls
            # pass-2's first wave, so cycles moved out of it are the
            # cheapest cycles in the job
            blobs.append(np.sort(skh[offs[p]:offs[p + 1]]).tobytes())
    n_b, n_a = len(blobs), att.num_rows
    cols = {
        "kind": pa.concat_arrays([pa.array(["hashes"] * n_b, pa.string()),
                                  pa.array(["att"] * n_a, pa.string())]),
        "part": pa.concat_arrays([pa.array(blob_parts, pa.int64()),
                                  pa.array(cpart, pa.int64())]),
        "hash_blob": pa.concat_arrays([pa.array(blobs, pa.binary()),
                                       pa.nulls(n_a, pa.binary())]),
    }
    for f in _P1_SCHEMA:
        if f.name in ("kind", "part", "hash_blob"):
            continue
        col = att[f.name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.cast(col, f.type)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[f.name] = pa.concat_arrays([pa.nulls(n_b, f.type), col])
    return pa.table(cols, schema=_P1_SCHEMA)


# ---------------- distributed pass-1 finish (tree reduce) ----------------

@ray.remote(num_returns=2, num_cpus=0)
def _finish_part(p: int, nparts: int, refs):
    """ONE scan of the narrow blocks for partition p → (duplicate key
    hashes of key-hash-part p, combined+decoded attempts of conv-hash-part
    p tagged with their serial rank bucket).  Merging the dup and combine
    rounds halves the per-task block scans (each task reads every narrow
    block and filters its partition).  Two return objects so the rank
    tasks fetch only the attempt tables — the dup arrays go to the driver
    alone.

    The whole finish chain runs at ``num_cpus=0``: pass 2 starts BEFORE
    the finish completes (its first batch per worker blocks inside the UDF
    on the dup/flags futures, overlapping the finish latency with pass-2's
    read+parse), and a blocked map task does not release its CPU — 1-CPU
    finish tasks would deadlock behind a saturated map pool.  Measured:
    the overlap wins at the canonical low-occupancy scaling levels (+6% at
    4 CPUs) and is noise-neutral at 16 where oversubscription bites."""
    arrs = []
    subs = []
    for blk in ray.get(refs):
        pm = pc.equal(blk["part"], p)
        hm = pc.and_(pc.equal(blk["kind"], "hashes"), pm)
        for blob in blk.filter(hm)["hash_blob"].to_pylist():
            arrs.append(np.frombuffer(blob, dtype=np.int64))
        am = pc.and_(pc.equal(blk["kind"], "att"), pm)
        subs.append(blk.filter(am).select(
            ["conv_id", "tool", "start_ts", "hdr_pack", "end_pack"]))
    from ..stages.dedup import dup_values
    dups = dup_values(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
    dec = _combine_attempt_partials(pa.concat_tables(subs))
    return dups, _add_rank_bucket(dec, nparts)


@ray.remote(num_cpus=0)
def _rank_part(p: int, att_refs) -> pa.Table:
    """Rank the serial-bucket-p slice of the combined attempts with the
    shared numpy lexsort/segment kernel (a serial never spans buckets).
    num_cpus=0: overlapped finish chain (see _finish_part)."""
    subs = [t.filter(pc.equal(t["rank_bucket"], p)).drop_columns(
        ["rank_bucket"]) for t in ray.get(att_refs)]
    df = _rank_df(pa.concat_tables(subs).to_pandas())
    cols = {f.name: pa.array(df[f.name], f.type, from_pandas=True)
            for f in _RANKED_SCHEMA}
    return pa.table(cols)


@ray.remote(num_cpus=0)
def _concat_dups(*dup_parts) -> pa.Array:
    """Union of the per-partition duplicate-key-hash sets (possibly
    empty).  num_cpus=0: overlapped finish chain (see _finish_part)."""
    arrs = [d for d in dup_parts if len(d)]
    return pa.array(np.concatenate(arrs) if arrs else np.empty(0, np.int64),
                    pa.int64())


@ray.remote(num_cpus=0)
def _build_flags(*rank_parts) -> pa.Table:
    """conv_id → attempt-flag broadcast table from the rank parts.
    num_cpus=0: overlapped finish chain (see _finish_part)."""
    from ..stages.route import ATTEMPT_ATTACH_COLS

    ranked_tbl = pa.concat_tables(rank_parts).combine_chunks()
    flag_cols = {"conv_id": ranked_tbl["conv_id"]}
    for src, dst in ATTEMPT_ATTACH_COLS.items():
        flag_cols[dst] = ranked_tbl[src]
    return pa.table(flag_cols)


@ray.remote(num_cpus=0)
def _attempt_reports_task(*rank_parts) -> dict:
    """A1/A2/A4 small tables from the ranked attempts — launched with the
    finish chain so it overlaps pass 2 instead of adding a driver-serial
    tail."""
    from .reports import attempt_reports_from_table

    return attempt_reports_from_table(
        pa.concat_tables(rank_parts).combine_chunks())


def _sink_compression() -> str:
    """Sink parquet codec: lz4 (default; 45% less encode CPU than snappy
    at equal size) or none via ICT_SINK_COMPRESSION — an A/B knob for
    separating encode CPU from write bandwidth in scaling experiments
    (read at call time inside workers, so env_vars reach them)."""
    return os.environ.get("ICT_SINK_COMPRESSION", "lz4")


def _route_write(sb: pa.Table, out_dir: str) -> None:
    """Write one routed batch's per-sink parquet files (side effect;
    content-derived idempotent file names).

    ICT_SKIP_SINK_WRITE=1 skips the physical write — a measurement knob to
    separate compute scaling from sink-IO scaling in bench experiments."""
    if os.environ.get("ICT_SKIP_SINK_WRITE") == "1":
        return
    from .reports import _sink_part_name, write_sink_file

    col = sb["sink"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for s in pc.unique(col).to_pylist():
        part = sb.filter(pc.equal(sb["sink"], s)).drop_columns(["sink"])
        fn = os.path.join(out_dir, f"sink={s}", _sink_part_name(part))
        # lz4 + no dictionary + no column stats: measured 149 vs 268 ms per
        # 262k-row sink batch at equal size — sink files are bulk-scanned
        # (resume/export), not point-filtered, so stats buy nothing here
        write_sink_file(part, fn, compression=_sink_compression())


@ray.remote(num_cpus=0)
def _metric_rows(*blks: pa.Table) -> pa.Table:
    """Strip a group of pass-2 output blocks to their tiny metric rows.

    Runs as a remote task (blocks arrive as top-level ObjectRef varargs →
    auto-resolved, locality-scheduled) so the driver collects only metric
    rows — it never pulls the collision IPC blobs across the network.
    A driver-side ``ray.get`` of every block is the streaming pipeline's
    remaining driver-collect scale bound on a multi-node cluster, so this
    path engages past ICT_METRIC_COLLECT_BYTES (default 2 GiB) of pass-2
    output; below it the driver's zero-copy plasma read wins (remote
    tasks pay ~16 worker spawns ≈ 0.6 s, measured A/B interleaved).
    Grouped ~16 refs/task — one task per block cost ~1 s of dispatch at
    128 blocks; num_cpus=0 keeps the tasks off the CPU slots like the
    rest of the finish chain."""
    tbls = [b.filter(pc.invert(pc.equal(b["metric"], "collision")))
            .drop_columns(["part", "collision_ipc"]) for b in blks]
    return pa.concat_tables(tbls).combine_chunks()


@ray.remote
def _keeper_part(p: int, refs, flags_tbl: pa.Table, out_dir: str):
    """Dedup + route + write the collision keepers of kh-partition p.

    Collision rows (all copies of duplicated keys) come back from pass 2 as
    per-partition arrow-IPC blobs; each task handles one partition, so the
    keeper finish scales with nparts instead of being driver-serial."""
    from ..stages.join import _lookup_batch
    from .reports import turn_partials_batch

    colls = []
    for blk in ray.get(refs):
        m = pc.and_(pc.equal(blk["metric"], "collision"),
                    pc.equal(blk["part"], p))
        for blob in blk.filter(m)["collision_ipc"].to_pylist():
            with pa.ipc.open_stream(blob) as r:
                colls.append(r.read_all())
    if not colls:
        return None
    coll_all = pa.concat_tables(colls).combine_chunks()
    df = (coll_all.to_pandas()
          .sort_values(["conv_id", "turn_idx"], kind="stable")
          .drop_duplicates(subset=["conv_id", "turn_idx"], keep="first"))
    keepers = pa.Table.from_pandas(df, preserve_index=False,
                                   schema=coll_all.schema)
    keepers = keepers.drop_columns(["kh"])
    # flags_tbl arrives auto-resolved (top-level ObjectRef arg → zero-copy
    # plasma read, shipped once per node)
    keepers = _lookup_batch(keepers, flags_tbl, "conv_id")
    sk = add_sink_column(keepers)
    _route_write(sk, out_dir)
    return turn_partials_batch(sk)


def _build_source(transcripts_path, tool_meta, batch_size, num_blocks):
    ds = read_transcripts(transcripts_path, override_num_blocks=num_blocks)
    ds = parse_dataset(ds, batch_size=batch_size)
    if tool_meta is not None:
        ds = enrich_dataset(ds, tool_meta, batch_size=batch_size)
    return ds.map_batches(add_key_hash_column, batch_format="pyarrow",
                          zero_copy_batch=True)


def run_streaming(transcripts_path, tool_meta: pa.Table | None, out_dir: str,
                  batch_size: int = 32_768, num_blocks: int | None = None):
    """Two-pass streaming flagship → dict with ranked attempts (Dataset),
    sink dir, and the finished report tables.

    batch_size default 32768: sized so a batch's working set stays closer
    to cache when every core runs the fused parse→enrich→route chain —
    measured at sf2 the FASTEST high-parallelism setting (16 CPUs: 18.9s
    vs 23.6s at 65536; at 4 CPUs the per-batch fixed costs dominate instead
    and 65536 wins 56s vs 70s).  Tune for the large configuration — the
    target is a multi-node cluster, not a 4-core box."""
    import sys
    import time as _time
    _verbose = os.environ.get("ICT_BENCH_VERBOSE") == "1"

    def _tick(label, t0):
        if _verbose:
            print(f"[stream] {label}: {_time.time() - t0:.2f}s",
                  file=sys.stderr)
        return _time.time()

    _t = _time.time()
    ncpu = _ncpus()
    if num_blocks is None:
        num_blocks = max(64, ncpu * 4)
    # each reduce task scans every narrow block and filters its partition,
    # so total scan work is nparts × narrow-stream size (zero-copy plasma
    # reads — the filter, not the fetch, is the cost).  nparts follows the
    # CPU count so the finish phase isn't an Amdahl term at high
    # parallelism (a fixed nparts=8 left half of 16 cores idle for ~1.8s
    # flat at both scaling levels); the cap bounds scan amplification — at
    # cluster scale replace the scan-and-filter with a real hash shuffle
    # of the narrow stream.
    nparts = max(4, min(ncpu, 32))

    # -------- pass 1: narrow specialized scan (hashes + attempt partials)
    p1 = read_transcripts(transcripts_path,
                          columns=["conv_id", "turn_idx", "tool", "text"],
                          override_num_blocks=num_blocks)
    narrow = p1.map_batches(_pass1_batch, batch_format="pyarrow",
                            batch_size=batch_size, zero_copy_batch=True,
                            fn_kwargs={"nparts": nparts}).materialize()
    _t = _tick("pass1 (hash+attempt scan)", _t)

    # ---- distributed finish: dup set + combine + rank (launch only) ----
    # Pass 2 starts immediately; its first batch per worker blocks inside
    # the UDF on the dup/flags futures, hiding the finish latency (a flat
    # ~1.5-3 s at every CPU count) behind pass-2's read+parse.  The chain
    # runs at num_cpus=0 — see _finish_part for the deadlock reasoning.
    refs = narrow.to_arrow_refs()
    dup_futs, att_futs = zip(*(_finish_part.remote(p, nparts, refs)
                               for p in range(nparts)))
    b_futs = [_rank_part.remote(p, list(att_futs)) for p in range(nparts)]
    dup_ref = _concat_dups.remote(*dup_futs)
    flags_ref = _build_flags.remote(*b_futs)
    reports_fut = _attempt_reports_task.remote(*b_futs)
    _t = _tick("rank+dupset launch", _t)

    # ---------------- pass 2: route + write + metrics ----------------
    os.makedirs(out_dir, exist_ok=True)
    for s in SINKS:
        os.makedirs(os.path.join(out_dir, f"sink={s}"), exist_ok=True)

    from ..stages.join import _lookup_batch, isin_mask_memo

    flags_token = flags_ref.hex()
    _skip_write = os.environ.get("ICT_SKIP_SINK_WRITE") == "1"
    # columns turn_partials_batch actually reads — computing partials on
    # this text-free projection keeps the big payload out of its filters
    _NARROW = ["record_type", "status", "test_name", "att_serial",
               "is_first", "is_final", "lim_sig"]

    def _pass2_batch(b: pa.Table) -> pa.Table:
        import time as _t
        _prof = {}
        _c0 = _t.perf_counter()

        def _lap(name):
            nonlocal _c0
            now = _t.perf_counter()
            _prof[name] = _prof.get(name, 0.0) + (now - _c0)
            _c0 = now

        coll_blobs = []          # (part, ipc_bytes) for this batch
        keep = None              # pa bool mask of non-duplicate rows
        kh = b["kh"]
        if isinstance(kh, pa.ChunkedArray):
            kh = kh.combine_chunks()
        # first call per worker blocks here until the dup future resolves
        # (the intended overlap point); the set may be empty → all-False
        m = isin_mask_memo(kh, dup_ref)
        m_np = m.to_numpy(zero_copy_only=False)
        if m_np.any():
            # only the (rare) collision rows are copied out here; the
            # keep mask folds into the per-sink write filters below, so
            # the batch is never full-copied just to drop duplicates
            keep = pc.invert(m)
            coll = b.filter(m)
            khp = (coll["kh"].to_numpy().astype(np.uint64)
                   % np.uint64(nparts)).astype(np.int64)
            parts = pa.array(khp)
            for p in np.unique(khp):
                sub = coll.filter(pc.equal(parts, int(p)))
                sink = io.BytesIO()
                with pa.ipc.new_stream(sink, sub.schema) as w:
                    w.write_table(sub)
                coll_blobs.append((int(p), sink.getvalue()))
        _lap("dup")
        b = b.drop_columns(["kh"])
        b = _lookup_batch(b, ray.get(flags_ref), "conv_id",
                          memo_token=flags_token)
        _lap("flags")
        sink_arr = sink_array(b)
        _lap("sinkcol")
        if not _skip_write:
            for s in pc.unique(sink_arr).to_pylist():
                mask = pc.equal(sink_arr, s)
                if keep is not None:
                    mask = pc.and_(mask, keep)
                part = b.filter(mask)
                _lap("w_filt")
                if part.num_rows == 0:
                    continue
                fn = os.path.join(out_dir, f"sink={s}",
                                  _sink_part_name(part))
                _lap("w_name")
                write_sink_file(part, fn, compression=_sink_compression())
                _lap("w_io")
        _lap("write")
        narrow = b.select(_NARROW).append_column("sink", sink_arr)
        if keep is not None:
            narrow = narrow.filter(keep)
        out = turn_partials_batch(narrow)
        _lap("partials")
        out = out.append_column("part", pa.nulls(out.num_rows, pa.int64()))
        out = out.append_column("collision_ipc",
                                pa.nulls(out.num_rows, pa.binary()))
        if os.environ.get("ICT_P2_PROF") == "1":
            n_p = len(_prof)
            prows = pa.table({
                "metric": pa.array([f"prof:{k}" for k in _prof], pa.string()),
                "test_name": pa.nulls(n_p, pa.string()),
                "att_serial": pa.nulls(n_p, pa.string()),
                "is_first": pa.nulls(n_p, pa.bool_()),
                "is_final": pa.nulls(n_p, pa.bool_()),
                "lim_sig": pa.nulls(n_p, pa.string()),
                "sink": pa.nulls(n_p, pa.string()),
                "n": pa.array([int(v * 1e6) for v in _prof.values()],
                              pa.int64()),
                "part": pa.nulls(n_p, pa.int64()),
                "collision_ipc": pa.nulls(n_p, pa.binary()),
            })
            out = pa.concat_tables([out, prows])
        if coll_blobs:
            n_c = len(coll_blobs)
            extra = pa.table({
                "metric": pa.array(["collision"] * n_c, pa.string()),
                "test_name": pa.nulls(n_c, pa.string()),
                "att_serial": pa.nulls(n_c, pa.string()),
                "is_first": pa.nulls(n_c, pa.bool_()),
                "is_final": pa.nulls(n_c, pa.bool_()),
                "lim_sig": pa.nulls(n_c, pa.string()),
                "sink": pa.nulls(n_c, pa.string()),
                "n": pa.array([0] * n_c, pa.int64()),
                "part": pa.array([p for p, _ in coll_blobs], pa.int64()),
                "collision_ipc": pa.array([b_ for _, b_ in coll_blobs],
                                          pa.binary()),
            })
            out = pa.concat_tables([out, extra])
        return out

    p2 = _build_source(transcripts_path, tool_meta, batch_size, num_blocks)
    part = p2.map_batches(_pass2_batch, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    _t = _tick("pass2 (parse+route+write)", _t)

    # pass 2 is done, so the finish futures resolved long ago — assemble
    # the ranked attempt table for the caller
    ranked_tbl = pa.concat_tables(ray.get(list(b_futs))).combine_chunks()
    ranked = rd.from_arrow(ranked_tbl)
    _t = _tick("  ranked concat", _t)

    # ------- distributed keeper finish + driver metrics merge -------
    prefs = part.to_arrow_refs()
    keeper_futs = []
    if len(ray.get(dup_ref)):
        keeper_futs = [_keeper_part.remote(p, prefs, flags_ref, out_dir)
                       for p in range(nparts)]
    # metric rows are tiny; the collision blobs stay in plasma for the
    # keeper tasks — the driver collects only the remote-filtered metric
    # rows (tree-merge leaf step), never the blobs
    if part.size_bytes() <= int(os.environ.get(
            "ICT_METRIC_COLLECT_BYTES", 2 * 1024 ** 3)):
        # single-node / small case: the driver's plasma read is zero-copy
        # mmap, and remote tasks pay ~16 worker spawns (~0.6 s measured)
        mblocks = [blk.filter(pc.invert(pc.equal(blk["metric"],
                                                 "collision")))
                   .drop_columns(["part", "collision_ipc"])
                   for blk in ray.get(prefs)]
    else:
        ngrp = min(len(prefs), 16) or 1
        groups = [prefs[i::ngrp] for i in range(ngrp) if prefs[i::ngrp]]
        mblocks = ray.get([_metric_rows.remote(*g) for g in groups])
    _t = _tick("  metric collect", _t)
    mdf = pa.concat_tables(mblocks).combine_chunks().to_pandas()
    _t = _tick("  metric to_pandas", _t)
    if os.environ.get("ICT_P2_PROF") == "1":
        pm = mdf["metric"].str.startswith("prof:")
        agg = mdf[pm].groupby("metric")["n"].sum() / 1e6
        print("[p2prof] " + "  ".join(f"{k.split(':')[1]}={v:.1f}s"
                                      for k, v in agg.items()),
              file=sys.stderr)
        mdf = mdf[~pm]
    keeper_tables = [t for t in ray.get(keeper_futs) if t is not None]
    if keeper_tables:
        import pandas as pd
        mdf = pd.concat([mdf] + [t.to_pandas() for t in keeper_tables],
                        ignore_index=True)
    metrics = finish_turn_metrics(mdf)
    _t = _tick("keepers+metrics", _t)
    small = ray.get(reports_fut)
    _t = _tick("attempt reports", _t)

    return {
        "attempts": ranked,
        "sinks": out_dir,
        "reports": {
            "yields_sb": small["yields_sb"],
            "yields_mb": small["yields_mb"],
            "hourly": small["hourly"],
            "pareto_all": metrics["paretos"]["all"],
            "pareto_after_retest": metrics["paretos"]["after_retest"],
            "pareto_first_pass": metrics["paretos"]["first_pass"],
            "limit_changes": metrics["limit_changes"],
            "sink_counts": metrics["sink_counts"],
        },
    }
