"""Checkpoint manifest + resumable sharded run (ST4/W2; SURVEY.md §2.3, §4).

The reference's incremental AutoUpdate keeps a single mtime watermark and
re-pushes anything newer (/root/reference/src/main.rs:205-211,269-273),
re-running every aggregate afterwards (main.rs:691-694).  At 10^12-turn scale
the equivalent is a **per-shard manifest diff**:

- the input is a list of shards (parquet files); each completed shard has a
  manifest entry ``{shard_id, phase, status, rows_in, rows_out, sink_rows,
  lineage, wall_time_s}`` written atomically (tmp+rename, one JSON file per
  entry, so concurrent workers and crashes can never corrupt the manifest);
- a (re)run lists shards, subtracts the completed set, and processes only the
  remainder — resume-from-failure without reprocessing completed shards;
- re-processing a shard is idempotent: each shard writes to its own output
  subdirectory which is replaced wholesale on rewrite (W2: overlap is safe
  because sinks are overwritten per partition).

Three phases mirror the pipeline's data dependencies:

- ``parse``  (per shard, resumable): parse+enrich → ``records/shard=<id>/``.
  This is the expensive ~95% of the job and never re-runs for done shards.
- ``attempts`` (global, cheap): attempt table + ranks from the records
  output, reading only the header/end columns (columnar pruning) —
  recomputed on every run like the reference's update_stats, because attempt
  ranking is cross-shard state.
- ``route`` (per shard, resumable, keyed by the attempts-table fingerprint):
  records + broadcast attempt flags → ``sinks/shard=<id>/sink=<name>/``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid


class Manifest:
    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def entries(self) -> dict:
        out = {}
        for fn in sorted(os.listdir(self.dir)):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(self.dir, fn)) as f:
                e = json.load(f)
            out[(e["phase"], e["shard_id"])] = e
        return out

    def done(self, phase: str, shard_id: str, fingerprint: str | None = None) -> bool:
        e = self.entries().get((phase, shard_id))
        if e is None or e.get("status") != "done":
            return False
        return fingerprint is None or e.get("fingerprint") == fingerprint

    def record(self, phase: str, shard_id: str, **fields):
        e = dict(phase=phase, shard_id=shard_id, status="done",
                 recorded_at=time.time(), **fields)
        safe = shard_id.replace("/", "_")
        path = os.path.join(self.dir, f"{phase}__{safe}.json")
        tmp = path + f".tmp{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(e, f)
        os.replace(tmp, path)


def _replace_dir(path: str):
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


ATTEMPT_META_COLS = ["conv_id", "record_type", "serial", "panel_serial",
                     "board_index", "tool", "start_ts", "status"]


def file_fingerprint(path: str) -> str:
    """S5 changed-file detection (the reference's mtime watermark,
    main.rs:205-211): size + mtime_ns — a shard rewritten in place gets a
    new fingerprint and its parse entry stops validating."""
    st_ = os.stat(path)
    return f"file:{st_.st_size}:{st_.st_mtime_ns}"


def shard_id_for(path: str) -> str:
    """Stable shard id derived from the file PATH, not its list position —
    a watch-mode rescan that discovers new files must not shift existing
    ids (a positional id would invalidate every completed manifest entry
    whenever a new file sorts before an old one).  The sanitized basename
    is suffixed with a short hash of the ABSOLUTE path so two inputs that
    share a basename (dir1/part-0.parquet vs dir2/part-0.parquet) or
    collide under sanitization can never map to the same shard directory
    (which would silently overwrite each other's records)."""
    import hashlib
    import re

    base = re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.basename(path))
    tag = hashlib.blake2b(os.path.abspath(path).encode(),
                          digest_size=4).hexdigest()
    return f"{base}-{tag}"


def _attempts_fingerprint(ranked) -> str:
    """Content fingerprint of the attempt table: row count + XOR of per-row
    64-bit hashes over (conv_id, att_rank, att_status, n_attempts) —
    order-independent and associative, so it is computed per block and
    combined.  A row-count-only fingerprint (round 1) validated stale route
    shards when attempt content changed without changing cardinality."""
    import numpy as np
    import pyarrow as pa
    import ray

    cols = ["conv_id", "att_rank", "att_status", "n_attempts"]

    def _h(b: pa.Table) -> pa.Table:
        # hash_pandas_object directly — NOT stages.dedup._key_hash, whose
        # polars fast path silently falls back to pandas when polars is
        # unavailable: a fingerprint persisted across runs must not depend
        # on which library happened to import
        from pandas.util import hash_pandas_object

        hv = hash_pandas_object(b.select(cols).to_pandas(),
                                index=False).to_numpy().astype(np.uint64)
        x = np.bitwise_xor.reduce(hv) if len(hv) else np.uint64(0)
        return pa.table({"x": pa.array([int(x)], pa.uint64()),
                         "n": pa.array([len(hv)], pa.int64())})

    from ..blocks import concat_shaped
    parts = concat_shaped(
        ranked.map_batches(_h, batch_format="pyarrow",
                           zero_copy_batch=True).materialize(),
        "x", empty_schema=pa.schema([("x", pa.uint64()),
                                     ("n", pa.int64())]))
    x = np.uint64(0)
    for v in parts["x"].to_pylist():
        x ^= np.uint64(v)
    n = sum(parts["n"].to_pylist())
    return f"attempts:{n}:{int(x):016x}"


def run_resumable(transcripts_files: list[str], out_root: str, tool_meta,
                  fail_after_shards: int | None = None,
                  fail_after_route_shards: int | None = None):
    """Sharded, manifest-checkpointed parse→enrich→rank→route run.

    ``transcripts_files``: one shard per input parquet file.  Shards must be
    **conversation-disjoint** (one conversation's turns live in one shard —
    the natural transcript layout, and the analog of one logfile = one file
    in the reference): per-shard exact dedup then equals global dedup, and
    the manifest's processed-exactly-once guarantee is the file-level dedup
    of the reference (``push_from_file → false``, main.rs:293-296).  Board
    *attempts* may still span shards freely — attempt ranking is global
    (phase 2).

    ``fail_after_shards``: test hook — raise after N parse shards to simulate
    a crash; a subsequent call resumes from the manifest.
    ``fail_after_route_shards``: same, but during the ROUTE (sink-write)
    phase — the crash window the bench-scale resume test exercises: the
    attempts table is already committed, some sink shards are on disk,
    and the resume must re-route only the missing shards.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.attempts import ranked_attempts
    from ..stages.dedup import exact_dedup_sparse
    from ..stages.enrich import enrich_dataset
    from ..stages.parse import parse_dataset
    from ..stages.route import (attach_attempt_flags, route_dataset)

    man = Manifest(out_root)
    records_root = os.path.join(out_root, "records")
    sinks_root = os.path.join(out_root, "sinks")

    # ---- phase 1: parse/enrich per shard (resumable, group-parallel) ----
    # Pending shards are processed in GROUPS: one streaming Dataset pass per
    # group (all shards of the group read/parse/write concurrently — the
    # old one-Dataset-per-shard loop serialized the cluster), staged to a
    # scratch dir and committed per shard atomically, so a crash mid-group
    # loses only that group's work and granularity stays per-shard.
    group_size = max(1, int(fail_after_shards or fail_after_route_shards
                            or 8))
    pending = [(shard_id_for(p), p) for p in transcripts_files
               if not man.done("parse", shard_id_for(p),
                               fingerprint=file_fingerprint(p))]
    parsed_n = 0
    for g in range(0, len(pending), group_size):
        group = pending[g:g + group_size]
        t0 = time.time()
        paths = [p for _, p in group]
        sid_by_path = {os.path.abspath(p): sid for sid, p in group}
        ds = rd.read_parquet(paths, include_paths=True)

        def _shard_col(b):
            import pyarrow as pa
            sids = [sid_by_path[os.path.abspath(p)]
                    for p in b["path"].to_pylist()]
            return b.drop_columns(["path"]).append_column(
                "shard_id", pa.array(sids, pa.string()))

        ds = ds.map_batches(_shard_col, batch_format="pyarrow",
                            zero_copy_batch=True)
        rows_in_total = sum(pq.ParquetFile(p).metadata.num_rows
                            for p in paths)  # metadata only — no read pass
        # conversation-disjoint shards (documented precondition above) keep
        # every copy of a duplicate key inside this group, so the sparse
        # collision-only dedup applies: an 8-byte/row key-hash pre-scan
        # (column-pruned — pass A never touches text) + broadcast drop,
        # instead of hash-shuffling every byte of every row through the
        # object store (the round-1 design; judged a scale concern).
        key_ds = rd.read_parquet(paths, columns=["conv_id", "turn_idx"])
        ds = exact_dedup_sparse(ds, keys=("conv_id", "turn_idx"),
                                key_ds=key_ds)
        ds = parse_dataset(ds)
        if tool_meta is not None:
            ds = enrich_dataset(ds, tool_meta)
        staging = os.path.join(out_root, "_staging")
        _replace_dir(staging)
        ds.write_parquet(staging, partition_cols=["shard_id"])
        wall = round(time.time() - t0, 3)
        for sid, path in group:
            src = os.path.join(staging, f"shard_id={sid}")
            shard_dir = os.path.join(records_root, f"shard={sid}")
            _replace_dir(shard_dir)
            rows_out = 0
            if os.path.isdir(src):
                for f in os.listdir(src):
                    os.replace(os.path.join(src, f),
                               os.path.join(shard_dir, f))
                    rows_out += pq.ParquetFile(
                        os.path.join(shard_dir, f)).metadata.num_rows
            rows_in = pq.ParquetFile(path).metadata.num_rows
            man.record("parse", sid, input_path=path, rows_in=rows_in,
                       rows_out=rows_out, wall_time_s=wall,
                       group_rows_in=rows_in_total,
                       fingerprint=file_fingerprint(path),
                       lineage={"stage": "dedup|parse|enrich", "input": path})
            parsed_n += 1
            if fail_after_shards is not None and parsed_n >= fail_after_shards:
                shutil.rmtree(staging, ignore_errors=True)
                raise RuntimeError(f"simulated crash after {parsed_n} shards")
        shutil.rmtree(staging, ignore_errors=True)

    # ---- phase 2: global attempt table (cheap, always recomputed) ----
    t0 = time.time()
    records = rd.read_parquet(records_root)
    ranked = ranked_attempts(records).materialize()
    att_fp = _attempts_fingerprint(ranked)
    att_dir = os.path.join(out_root, "attempts")
    _replace_dir(att_dir)
    ranked.write_parquet(att_dir)
    man.record("attempts", "GLOBAL", rows_out=ranked.count(),
               wall_time_s=round(time.time() - t0, 3), fingerprint=att_fp)

    # ---- phase 3: route per shard (resumable under attempts fingerprint,
    #      group-parallel like phase 1) ----
    pending = [shard_id_for(p) for p in transcripts_files
               if not man.done("route", shard_id_for(p), fingerprint=att_fp)]
    routed_n = 0
    for g in range(0, len(pending), group_size):
        group = pending[g:g + group_size]
        t0 = time.time()
        rec_files = []
        for sid in group:
            sd = os.path.join(records_root, f"shard={sid}")
            if os.path.isdir(sd):
                rec_files.extend(os.path.join(sd, f) for f in os.listdir(sd)
                                 if f.endswith(".parquet"))
        recs = rd.read_parquet(rec_files, include_paths=True)

        def _shard_col3(b):
            import pyarrow as pa
            sids = [os.path.basename(os.path.dirname(p)).split("=", 1)[1]
                    for p in b["path"].to_pylist()]
            return b.drop_columns(["path"]).append_column(
                "shard_id", pa.array(sids, pa.string()))

        recs = recs.map_batches(_shard_col3, batch_format="pyarrow",
                                zero_copy_batch=True)
        flagged = attach_attempt_flags(recs, ranked)
        routed = route_dataset(flagged)
        staging = os.path.join(out_root, "_staging_route")
        _replace_dir(staging)
        routed.write_parquet(staging, partition_cols=["shard_id", "sink"])
        wall = round(time.time() - t0, 3)
        for sid in group:
            src = os.path.join(staging, f"shard_id={sid}")
            shard_dir = os.path.join(sinks_root, f"shard={sid}")
            _replace_dir(shard_dir)
            sink_rows = {}
            if os.path.isdir(src):
                for d in os.listdir(src):
                    os.replace(os.path.join(src, d),
                               os.path.join(shard_dir, d))
                    n = sum(pq.ParquetFile(
                        os.path.join(shard_dir, d, f)).metadata.num_rows
                        for f in os.listdir(os.path.join(shard_dir, d))
                        if f.endswith(".parquet"))
                    sink_rows[d.split("=", 1)[1]] = n
            man.record("route", sid, fingerprint=att_fp, sink_rows=sink_rows,
                       rows_out=sum(sink_rows.values()),
                       wall_time_s=wall,
                       lineage={"records": f"shard={sid}", "attempts": att_fp})
            routed_n += 1
            if fail_after_route_shards is not None \
                    and routed_n >= fail_after_route_shards:
                shutil.rmtree(staging, ignore_errors=True)
                raise RuntimeError(
                    f"simulated crash after {routed_n} route shards")
        shutil.rmtree(staging, ignore_errors=True)

    return {"manifest": man, "records": records_root, "sinks": sinks_root,
            "attempts": att_dir}


def run_watch(list_shards, out_root: str, tool_meta, interval_s: float = 30.0,
              max_cycles: int | None = None, sleep_fn=time.sleep,
              on_cycle=None):
    """Continuous watch mode — the reference's AutoUpdate loop analog
    (/root/reference/src/main.rs:247-310: poll every 30 s, push only new
    logs, report "Autoupdate done in {ms}, new logs: {n}").

    ``list_shards``: callable returning the CURRENT shard file list (or a
    glob pattern string).  Each cycle re-lists, runs ``run_resumable`` over
    the full list — the manifest skips every completed shard, so only new
    (or changed-fingerprint) work executes — and reports per-cycle stats.
    Shard ids are name-derived (``shard_id_for``), so discovering new files
    never invalidates completed entries.

    ``max_cycles``: stop after N cycles (None = run until interrupted).
    ``sleep_fn`` / ``on_cycle``: test hooks (inject shards between cycles,
    skip real sleeping).
    Returns the list of per-cycle stats dicts.
    """
    import glob as _glob

    if isinstance(list_shards, str):
        pattern = list_shards
        list_shards = lambda: sorted(_glob.glob(pattern))  # noqa: E731

    man = Manifest(out_root)
    cycles = []
    k = 0
    while True:
        shards = sorted(list_shards())
        before = {sid for (ph, sid), e in man.entries().items()
                  if ph == "parse" and e.get("status") == "done"}
        t0 = time.time()
        res = run_resumable(shards, out_root, tool_meta)
        after = {sid for (ph, sid), e in man.entries().items()
                 if ph == "parse" and e.get("status") == "done"}
        stat = {"cycle": k, "wall_ms": round((time.time() - t0) * 1000),
                "n_shards": len(shards),
                "new_shards": sorted(after - before),
                "result": res}
        cycles.append(stat)
        if on_cycle is not None:
            on_cycle(stat)
        k += 1
        if max_cycles is not None and k >= max_cycles:
            return cycles
        sleep_fn(interval_s)
