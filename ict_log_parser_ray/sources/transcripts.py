"""Transcript sources (SURVEY.md §2.1 S1-S5).

``read_transcripts`` wraps ``ray.data.read_parquet`` — recursive file
expansion, column pruning, and partition/predicate pushdown replace the
reference's hand-rolled directory scans (/root/reference/src/main.rs:39-137).
The incremental/watermark scan (S3) becomes a manifest diff — see
``state.manifest``.
"""

from __future__ import annotations

from datetime import datetime

import ray.data as rd

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(path, columns=None, window=None, override_num_blocks=None):
    """Read transcript shards.

    - ``columns``: prune at the read (defaults to the full transcript schema;
      pass fewer for column-pruned pipelines).
    - ``window``: optional (start, end) datetimes; rows with
      start <= ts < end are kept (M7; time-window predicate
      /root/reference/src/main.rs:86,449-465).  Applied as a vectorized
      filter; combine with date-partitioned layouts for pushdown (S2).
    """
    ds = rd.read_parquet(path, columns=columns or TRANSCRIPT_COLUMNS,
                         override_num_blocks=override_num_blocks)
    if window is not None:
        start, end = window
        import pyarrow.compute as pc

        def _win(t):
            m = pc.and_(pc.greater_equal(t["ts"], start), pc.less(t["ts"], end))
            return t.filter(m)

        ds = ds.map_batches(_win, batch_format="pyarrow", zero_copy_batch=True)
    return ds


_TABLE_META_CACHE: dict[str, tuple[int, int, int]] = {}


def _table_num_blocks(path: str) -> int:
    """Right-size the read split from the parquet footer: Ray's default
    splits even a sub-MB file into ~2×CPU blocks, and the per-task
    scheduling floor then dominates small-table queries (measured at
    sf0.1/32 CPUs: 64-block default 0.55 s vs 32 blocks 0.35 s vs 4
    blocks 0.19 s for a 5000-doc token count whose compute is 0.09 s).
    Rule: one block per ~8 MB on disk, floored at one block per CPU when
    the table is big enough to parallelize (≥4096 rows — downstream
    per-row compute like minhash signatures needs the full wave), capped
    at 4×CPU (the CLAUDE.md read rule) and at the row count."""
    import os

    import ray

    # validate by (size, mtime): a rewritten file at the same path must
    # not inherit the old file's block sizing (stat calls are ~free; the
    # cache only avoids the footer read)
    st = os.stat(path)
    cached = _TABLE_META_CACHE.get(path)
    if cached is None or cached[:2] != (st.st_size, st.st_mtime_ns):
        import pyarrow.parquet as pq

        cached = (st.st_size, st.st_mtime_ns,
                  pq.ParquetFile(path).metadata.num_rows)
        _TABLE_META_CACHE[path] = cached
    nbytes, rows = cached[0], cached[2]
    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    nb = max(1, -(-nbytes // (8 << 20)))
    if rows >= 4096:
        nb = max(nb, ncpu)
    return int(min(nb, 4 * ncpu, max(1, rows)))


def read_table(sf_dir: str, name: str, columns=None):
    """One of the driver's TPC-H-ish tables — a single ``name.parquet``
    file, or a sharded ``name/`` DIRECTORY of part files (the probe
    fixtures' layout for >GB tables: Ray reads a single parquet file as
    ONE serial task regardless of row groups — a measured 3.8-s floor on
    a 1.2 GB events table that capped 2→8 scaling at ~0.5 — while a
    directory gets one read task per file; see read_media)."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    if not os.path.exists(path):
        dpath = f"{sf_dir}/{name}"
        if os.path.isdir(dpath):
            nfiles = sum(1 for f in os.listdir(dpath)
                         if f.endswith(".parquet"))
            return rd.read_parquet(dpath, columns=columns,
                                   override_num_blocks=max(1, nfiles))
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=_table_num_blocks(path))


def read_media(fixture_dir: str, columns=None):
    """The sharded payload-scale media fixture (``fixtures.
    ensure_media_fixture``): a DIRECTORY of ~64 MB files, one read task
    per file — a single-file binary-payload table reads as ONE serial
    task (+SplitBlocks), a measured 1.9-s floor on 1.5 GB that caps
    scaling; per-file tasks parallelize the read.

    ``override_num_blocks`` is pinned to the FILE COUNT: without it Ray's
    ≥200-block default heuristic splits each file ~9 ways (216 tiny
    blocks for 48k rows), which both pays the per-task floor 216× AND
    inserts a SplitBlocks op that blocks read→map fusion — measured at
    2 CPUs the resulting two-operator pipeline halves effective
    parallelism (each operator holds half the CPU reservation): 20.5 s
    vs 10.5 s fused for the identical dispatch job."""
    import os

    path = f"{fixture_dir}/media"
    nfiles = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=max(1, nfiles))


def write_date_partitioned(ds, root: str):
    """Write transcripts hive-partitioned by day: ``root/dt=YYYY_MM_DD/``.

    The distributed analog of the reference's ``%Y_%m_%d`` archive subfolders
    (move_file_to_subdir, /root/reference/src/main.rs:95-106,128): the date
    lives in the PATH so date-range scans never open out-of-range files.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_dt(b: pa.Table) -> pa.Table:
        dt = pc.strftime(b["ts"], format="%Y_%m_%d")
        return b.append_column("dt", dt)

    ds.map_batches(add_dt, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        root, partition_cols=["dt"])


def read_transcripts_dates(root: str, start, end, columns=None):
    """S2 date-pruned scan over a ``dt=YYYY_MM_DD``-partitioned layout.

    Mirrors ``get_logs_in_path_t`` (/root/reference/src/main.rs:59-93):
    descend only into partitions whose name parses as a date within
    [start, end) — directory-level pruning, no data read outside the
    window — then apply the residual row-level ``ts`` filter.
    """
    import os
    from datetime import datetime

    import pyarrow.compute as pc

    from datetime import timedelta

    keep = []
    for d in sorted(os.listdir(root)):
        if not d.startswith("dt="):
            continue
        try:
            day = datetime.strptime(d.split("=", 1)[1], "%Y_%m_%d")
        except ValueError:
            continue  # is_dir_in_t: non-date dirs are skipped (main.rs:59-68)
        # keep iff the partition's day [day, day+1) intersects [start, end)
        if day + timedelta(days=1) > start and day < end:
            keep.append(os.path.join(root, d))
    files = []
    for kd in keep:
        files.extend(os.path.join(kd, f) for f in sorted(os.listdir(kd))
                     if f.endswith(".parquet"))
    if not files:
        import pyarrow as pa

        schema = pa.schema([
            ("conv_id", pa.string()), ("turn_idx", pa.int32()),
            ("role", pa.string()), ("text", pa.string()),
            ("tool", pa.string()), ("ts", pa.timestamp("us")),
        ])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table())
    ds = rd.read_parquet(files, columns=columns)

    def _win(t):
        m = pc.and_(pc.greater_equal(t["ts"], start), pc.less(t["ts"], end))
        return t.filter(m)

    return ds.map_batches(_win, batch_format="pyarrow", zero_copy_batch=True)
