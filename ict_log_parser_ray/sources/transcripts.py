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


def read_table(sf_dir: str, name: str, columns=None):
    """One of the driver's TPC-H-ish tables."""
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)
