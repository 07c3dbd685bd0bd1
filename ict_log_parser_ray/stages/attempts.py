"""Attempt-level metadata: the distributed replacement for the reference's
in-memory per-board attempt history (ST1/D2; /root/reference/src/main.rs:318,
first/last-attempt rules main.rs:712-748 and main.rs:1205).

One attempt = one conversation (``conv_id``) = one logfile in the reference.
Header and BTEST-END rows are a tiny fraction (~2 of ~40 turns) of each
conversation, so the attempt table is ~20× smaller than the turn table:

1. ``map_batches`` filter to header/btest_end rows (vectorized mask — prunes
   ~95% of rows before any shuffle);
2. ``groupby(conv_id)`` Min/Max aggregate → one row per attempt
   (duplicate-injected rows collapse here for free: exact dedup D1,
   main.rs:293-296);
3. rank attempts within a board serial WITHOUT per-group Python:
   ``groupby(serial)`` Min/Max over a sortable ``start_key`` →
   join flags back → ``is_first`` / ``is_final`` booleans.
   (The reference's first-pass yield reads the first attempt, the
   after-retest yield the last: main.rs:712-748, last-attempt-wins
   main.rs:1205.  Ordering key = (start_ts, conv_id) — deterministic
   tie-break, SURVEY.md §2.6 O2.)

Scale note: both shuffles here run over the attempt table (turns/40); keys
are ``conv_id`` and ``serial``.  A mega-conversation skews only step 1's
*input*, which is an embarrassingly parallel map — the groupbys see one row
per (conv, type) after the per-batch pre-filter, so skew never reaches a
shuffle with heavy groups.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min

from .join import attach_lookup

_TS = pa.timestamp("us")


def _attempt_rows(batch: pa.Table) -> pa.Table:
    """Project header/btest_end rows to the attempt-meta columns."""
    rt = batch["record_type"]
    mask = pc.or_(pc.equal(rt, "header"), pc.equal(rt, "btest_end"))
    b = batch.filter(mask)
    rt = b["record_type"]
    is_hdr = pc.equal(rt, "header")
    is_end = pc.equal(rt, "btest_end")
    null_s = pa.scalar(None, pa.string())
    null_i = pa.scalar(None, pa.int64())
    # timestamps carried as int64 epoch-micros through the shuffle: Ray's
    # groupby reduce handles None-mixed datetimes by falling back to pickled
    # object blocks (observed), and Min/Max silently downcast timestamp[us]
    # to [s]; int64 keeps blocks Arrow-native and lossless.
    ts_us = pc.cast(b["start_ts"], pa.int64())
    return pa.table(
        {
            "conv_id": b["conv_id"],
            "serial": b["serial"],
            "panel_serial": b["panel_serial"],
            "board_index": b["board_index"],
            "tool": b["tool"],
            "start_ts": pc.if_else(is_hdr, ts_us, null_i),
            "end_ts": pc.if_else(is_end, ts_us, null_i),
            "att_status": pc.if_else(is_end, b["status"], null_s),
            "hdr_status": pc.if_else(is_hdr, b["status"], null_s),
        }
    )


def attempts_from_parsed(parsed_ds):
    """parsed turns Dataset → attempts Dataset (one row per conv_id)."""
    rows = parsed_ds.map_batches(_attempt_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
    att = rows.groupby("conv_id").aggregate(
        Max("serial", alias_name="serial"),
        Max("panel_serial", alias_name="panel_serial"),
        Max("board_index", alias_name="board_index"),
        Max("tool", alias_name="tool"),
        Min("start_ts", alias_name="start_ts"),
        Max("end_ts", alias_name="end_ts"),
        Max("att_status", alias_name="att_status"),
        Max("hdr_status", alias_name="hdr_status"),
    )
    return att


def _add_start_key(batch: pa.Table) -> pa.Table:
    # sortable string key: zero-padded epoch micros + conv_id tie-break.
    # Null start_ts (headerless/unparseable-date attempts) becomes "" so the
    # key is never null (sorts first, matching the driver fast path's
    # nulls-first convention) and stays unique via the conv_id suffix.
    us = pc.fill_null(pc.cast(batch["start_ts"], pa.string()), "")
    padded = pc.utf8_lpad(us, 20, padding="0")
    key = pc.binary_join_element_wise(padded, batch["conv_id"], "|")
    return batch.append_column("start_key", key)


def _rank_batch(batch: pa.Table) -> pa.Table:
    """Ordinal attempt rank from the per-serial sorted key list.

    ``all_keys`` is the per-serial list of attempt start_keys (from the
    ``Unique`` aggregate); rank = position of this attempt's key in the
    sorted list.  Per-row Python over the attempt table (turns/40); the
    sorted list is cached per identical list so a serial with A attempts
    costs one sort + A bisects, not A sorts.
    Null guards: a null ``all_keys`` (serial missing from the lookup —
    conv with no header row) ranks as a singleton; keys themselves are
    never null (see _add_start_key).
    """
    import bisect

    import numpy as np

    keys = batch["start_key"].to_pylist()
    lists = batch["all_keys"].to_pylist()
    ranks = np.empty(len(keys), dtype=np.int32)
    n_att = np.empty(len(keys), dtype=np.int32)
    sorted_cache: dict = {}
    for i, (k, lst) in enumerate(zip(keys, lists)):
        k = "" if k is None else k
        if lst is None:
            ranks[i], n_att[i] = 0, 1
            continue
        ck = tuple(lst)
        slst = sorted_cache.get(ck)
        if slst is None:
            slst = sorted("" if v is None else v for v in lst)
            sorted_cache[ck] = slst
        ranks[i] = bisect.bisect_left(slst, k)
        n_att[i] = len(slst)
    batch = batch.append_column("att_rank", pa.array(ranks, pa.int32()))
    batch = batch.append_column("n_attempts", pa.array(n_att, pa.int32()))
    batch = batch.append_column("is_first", pc.equal(batch["att_rank"], 0))
    batch = batch.append_column(
        "is_final", pc.equal(batch["att_rank"], pc.subtract(batch["n_attempts"], 1))
    )
    return batch.drop_columns(["start_key", "all_keys"])


def rank_attempts(attempts_ds, broadcast_threshold: int = 2_000_000):
    """Attach ``att_rank`` / ``is_first`` / ``is_final`` / ``n_attempts``."""
    from ray.data.aggregate import Unique

    att = attempts_ds.map_batches(_add_start_key, batch_format="pyarrow",
                                  zero_copy_batch=True)
    # materialize the (small, turns/40) attempt table once: both the
    # per-serial aggregate and the join-back read it, and without pinning it
    # the whole upstream lineage (read→parse→…) executes twice
    att = att.materialize()
    per_serial = att.groupby("serial").aggregate(
        Unique("start_key", alias_name="all_keys"),
    )
    joined = attach_lookup(att, per_serial, on="serial",
                           broadcast_threshold=broadcast_threshold)
    return joined.map_batches(_rank_batch, batch_format="pyarrow",
                              zero_copy_batch=True)


def _attempt_rows_partial(batch: pa.Table) -> pa.Table:
    """_attempt_rows + per-batch combine: one row per conv_id IN THIS BATCH
    (arrow C++ hash aggregate).  A conversation spans ~1 batch, so the
    global combine sees ~#convs rows instead of 2×#convs header/end rows."""
    t = _attempt_rows(batch)
    g = pa.TableGroupBy(t, "conv_id").aggregate([
        ("serial", "max"), ("panel_serial", "max"), ("board_index", "max"),
        ("tool", "max"), ("start_ts", "min"), ("end_ts", "max"),
        ("att_status", "max"), ("hdr_status", "max"),
    ])
    # arrow names aggregates "<col>_<fn>"; strip the suffix, keep the key
    return g.rename_columns(
        [n if n == "conv_id" else n.rsplit("_", 1)[0]
         for n in g.column_names])


_RANKED_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("serial", pa.string()),
    ("panel_serial", pa.string()),
    ("board_index", pa.int64()),
    ("tool", pa.string()),
    ("start_ts", pa.int64()),
    ("end_ts", pa.int64()),
    ("att_status", pa.string()),
    ("hdr_status", pa.string()),
    ("att_rank", pa.int32()),
    ("n_attempts", pa.int32()),
    ("is_first", pa.bool_()),
    ("is_final", pa.bool_()),
])


def _finish_rank_pandas(tbl: pa.Table):
    """Driver-side finish: final per-conv combine (arrow C++ hash aggregate —
    null-safe for string columns, unlike pandas object max) + vectorized
    rank within serial.  Ordering key = (start_ts, conv_id) with nulls
    FIRST to match the distributed start_key="" convention.
    """
    g = pa.TableGroupBy(tbl, "conv_id").aggregate([
        ("serial", "max"), ("panel_serial", "max"), ("board_index", "max"),
        ("tool", "max"), ("start_ts", "min"), ("end_ts", "max"),
        ("att_status", "max"), ("hdr_status", "max"),
    ])
    g = g.rename_columns([n if n == "conv_id" else n.rsplit("_", 1)[0]
                          for n in g.column_names])
    agg = g.to_pandas()
    # rank within serial with pure numpy (pandas sort+cumcount measured ~3×
    # slower at 1M rows and this finish is driver-serial):
    # lexsort by (serial, start_ts, conv_id) with NaN/None first, then
    # segment boundaries → rank = position - segment_start
    import numpy as np

    serial = agg["serial"].fillna("").to_numpy(dtype=object)
    start = agg["start_ts"].fillna(-1).to_numpy(dtype="int64")
    conv = agg["conv_id"].to_numpy(dtype=object)
    order = np.lexsort((conv, start, serial))
    agg = agg.iloc[order].reset_index(drop=True)
    s_sorted = serial[order]
    new_seg = np.empty(len(s_sorted), dtype=bool)
    if len(s_sorted):
        new_seg[0] = True
        new_seg[1:] = s_sorted[1:] != s_sorted[:-1]
    seg_id = np.cumsum(new_seg) - 1
    seg_start = np.zeros(len(s_sorted), dtype=np.int64)
    starts_idx = np.flatnonzero(new_seg)
    seg_start[starts_idx] = starts_idx
    seg_start = np.maximum.accumulate(seg_start)
    rank = np.arange(len(s_sorted)) - seg_start
    seg_sizes = np.bincount(seg_id, minlength=seg_id[-1] + 1 if len(seg_id) else 0)
    n_att = seg_sizes[seg_id] if len(seg_id) else np.array([], np.int64)
    agg["att_rank"] = rank.astype("int32")
    agg["n_attempts"] = n_att.astype("int32")
    agg["is_first"] = agg["att_rank"] == 0
    agg["is_final"] = agg["att_rank"] == agg["n_attempts"] - 1
    return agg


def ranked_attempts(parsed_ds, broadcast_threshold: int = 2_000_000,
                    collect_threshold: int = 5_000_000):
    """parsed turns → ranked attempts.

    Fast path (attempt table ≤ collect_threshold rows): per-batch arrow
    partial combine → one driver-side vectorized finish — no Ray groupby,
    whose per-group reduce overhead dominates at ~all-distinct keys
    (measured 9.6s for 82k groups vs ~1.5s for this path).  Large scale:
    the distributed groupby + Unique-rank path below.
    """
    import ray
    import ray.data as rd

    partial = parsed_ds.map_batches(_attempt_rows_partial,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    n = partial.count()
    if n > collect_threshold:
        att = partial.groupby("conv_id").aggregate(
            Max("serial", alias_name="serial"),
            Max("panel_serial", alias_name="panel_serial"),
            Max("board_index", alias_name="board_index"),
            Max("tool", alias_name="tool"),
            Min("start_ts", alias_name="start_ts"),
            Max("end_ts", alias_name="end_ts"),
            Max("att_status", alias_name="att_status"),
            Max("hdr_status", alias_name="hdr_status"),
        )
        return rank_attempts(att, broadcast_threshold=broadcast_threshold)

    tbl = pa.concat_tables(ray.get(partial.to_arrow_refs())).combine_chunks()
    out = _finish_rank_pandas(tbl)
    cols = {}
    for f in _RANKED_SCHEMA:
        cols[f.name] = pa.array(out[f.name], f.type, from_pandas=True)
    return rd.from_arrow(pa.table(cols))
