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
   bucket by hash(serial), one shuffle, then the vectorized numpy
   lexsort/segment-rank kernel per bucket (or a single driver-side
   finish when the attempt table is small).
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
from ray.data.aggregate import Max, Min

_TS = pa.timestamp("us")


def _attempt_rows(batch: pa.Table) -> pa.Table:
    """Project header/btest_end rows to narrow attempt partials.

    Last-record-wins semantics (parity.py attempt loop; the reference app
    overwrites attempt fields as it reads a logfile top-to-bottom): the
    header fields (serial / panel_serial / board_index / hdr_status) come
    from the LAST header row of the conversation, att_status / end_ts from
    the LAST BTEST-END row, start_ts = MIN over headers.  Last-wins is made
    associative (safe for any combine tree: per-batch arrow partial, Ray
    groupby, driver finish) by packing each row's fields behind a
    zero-padded turn_idx prefix and taking the string MAX — the delimiter
    '|' cannot appear in any field (the parse regexes exclude it).
    """
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
    # width guard: a turn_idx outside [0, 10^12) would silently corrupt
    # the zero-padded MAX ordering (13 digits overflow the pad; a minus
    # sign sorts before digits).  Fail loudly instead (VERDICT r2 item 7).
    if b.num_rows:
        mx = pc.max(b["turn_idx"]).as_py()
        mn = pc.min(b["turn_idx"]).as_py()
        if mx is not None and (mx >= 10 ** 12 or mn < 0):
            raise ValueError(
                f"turn_idx out of packable range [0, 1e12): min={mn} "
                f"max={mx} — widen the pack in _attempt_rows")
    turn_pad = pc.utf8_lpad(pc.cast(b["turn_idx"], pa.string()), 12,
                            padding="0")

    def _s(col):
        return pc.fill_null(pc.cast(col, pa.string()), "")

    hdr_payload = pc.binary_join_element_wise(
        turn_pad, _s(b["serial"]), _s(b["panel_serial"]),
        _s(b["board_index"]), _s(b["status"]), "|")
    end_payload = pc.binary_join_element_wise(
        turn_pad, _s(ts_us), _s(b["status"]), "|")
    return pa.table(
        {
            "conv_id": b["conv_id"],
            "tool": b["tool"],
            "start_ts": pc.if_else(is_hdr, ts_us, null_i),
            "hdr_pack": pc.if_else(is_hdr, hdr_payload, null_s),
            "end_pack": pc.if_else(is_end, end_payload, null_s),
        }
    )


def _attempt_rows_raw(batch: pa.Table) -> pa.Table:
    """_attempt_rows straight from RAW transcript text.

    Only rows prefixed ``{@BTEST`` can be header or BTEST-END records (the
    anchored parse regexes), so prefix-filter first (~5% of turns survive)
    and run ONLY those two regexes — the analog/digital patterns, the
    limit projection and the enrich lookup never execute.  This makes the
    streaming pass 1 a fraction of a full parse pass.  Output and
    semantics are identical to ``_attempt_rows(parse_batch(batch))``."""
    from .parse import END_PAT, HEADER_PAT, _decode_status, _strptime12

    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    b = batch.filter(pc.starts_with(text, "{@BTEST"))
    text = b["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    hdr = pc.extract_regex(text, HEADER_PAT)
    end = pc.extract_regex(text, END_PAT)
    keep = pc.or_(pc.is_valid(hdr), pc.is_valid(end))
    b = b.filter(keep)
    hdr = hdr.filter(keep)
    end = end.filter(keep)
    is_hdr = pc.is_valid(hdr)

    def f(s, name):
        a = pc.struct_field(s, name)
        return pc.if_else(pc.equal(a, ""), pa.scalar(None, pa.string()), a)

    status = _decode_status(pc.coalesce(f(hdr, "hstatus"), f(end, "estatus")))
    ts_us = pc.cast(pc.if_else(is_hdr, _strptime12(f(hdr, "start")),
                               _strptime12(f(end, "end"))), pa.int64())
    turn_pad = pc.utf8_lpad(pc.cast(b["turn_idx"], pa.string()), 12,
                            padding="0")

    def _s(col):
        return pc.fill_null(pc.cast(col, pa.string()), "")

    hdr_payload = pc.binary_join_element_wise(
        turn_pad, _s(f(hdr, "serial")), _s(f(hdr, "panel_serial")),
        _s(f(hdr, "board_index")), _s(status), "|")
    end_payload = pc.binary_join_element_wise(turn_pad, _s(ts_us),
                                              _s(status), "|")
    null_s = pa.scalar(None, pa.string())
    null_i = pa.scalar(None, pa.int64())
    return pa.table({
        "conv_id": b["conv_id"],
        "tool": b["tool"],
        "start_ts": pc.if_else(is_hdr, ts_us, null_i),
        "hdr_pack": pc.if_else(is_hdr, hdr_payload, null_s),
        "end_pack": pc.if_else(is_hdr, null_s, end_payload),
    })


def _decode_attempt_packs(t: pa.Table) -> pa.Table:
    """(conv_id, tool, start_ts, hdr_pack, end_pack) → attempt columns.

    Vectorized: split on '|', take fields, '' → null.  Null packs (conv
    with no header / no END row) decode to all-null fields."""
    def _fld(lists, i):
        x = pc.list_element(lists, i)
        return pc.if_else(pc.equal(x, ""), pa.scalar(None, pa.string()), x)

    def _col(name):
        c = t[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    hs = pc.split_pattern(pc.fill_null(_col("hdr_pack"), "||||"), "|")
    es = pc.split_pattern(pc.fill_null(_col("end_pack"), "||"), "|")
    return pa.table({
        "conv_id": t["conv_id"],
        "serial": _fld(hs, 1),
        "panel_serial": _fld(hs, 2),
        "board_index": pc.cast(_fld(hs, 3), pa.int64()),
        "tool": t["tool"],
        "start_ts": pc.cast(t["start_ts"], pa.int64()),
        "end_ts": pc.cast(_fld(es, 1), pa.int64()),
        "att_status": _fld(es, 2),
        "hdr_status": _fld(hs, 4),
    })


def attempts_from_parsed(parsed_ds):
    """parsed turns Dataset → attempts Dataset (one row per conv_id)."""
    rows = parsed_ds.map_batches(_attempt_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
    att = rows.groupby("conv_id").aggregate(
        Max("tool", alias_name="tool"),
        Min("start_ts", alias_name="start_ts"),
        Max("hdr_pack", alias_name="hdr_pack"),
        Max("end_pack", alias_name="end_pack"),
    )
    return att.map_batches(_decode_attempt_packs, batch_format="pyarrow",
                           zero_copy_batch=True)


def _add_rank_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """hash(serial) % B — co-locates every attempt of a serial in one
    bucket; B bounds group count so the groupby shuffles buckets, never
    ~all-distinct serial keys (CLAUDE.md measured rule)."""
    import numpy as np
    from pandas.util import hash_pandas_object

    s = batch["serial"]
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    hv = hash_pandas_object(pc.fill_null(s, "").to_pandas(),
                            index=False).to_numpy()
    bucket = (hv % np.uint64(num_buckets)).astype("int64")
    return batch.append_column("rank_bucket", pa.array(bucket, pa.int64()))


def rank_attempts(attempts_ds, num_buckets: int = 64, **_compat):
    """Attach ``att_rank`` / ``is_first`` / ``is_final`` / ``n_attempts``.

    Distributed path: bucket by hash(serial), shuffle once, run the same
    vectorized numpy lexsort/segment-rank kernel as the driver fast path
    inside each bucket (a serial never spans buckets, so per-bucket ranking
    is exact)."""
    withb = attempts_ds.map_batches(
        _add_rank_bucket, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"num_buckets": num_buckets})

    def _rank_group(group: pa.Table) -> pa.Table:
        df = _rank_df(group.drop_columns(["rank_bucket"]).to_pandas())
        cols = {f.name: pa.array(df[f.name], f.type, from_pandas=True)
                for f in _RANKED_SCHEMA}
        return pa.table(cols)

    return withb.groupby("rank_bucket").map_groups(
        _rank_group, batch_format="pyarrow")


def _attempt_rows_partial(batch: pa.Table) -> pa.Table:
    """_attempt_rows + per-batch combine: one row per conv_id IN THIS BATCH
    (arrow C++ hash aggregate).  A conversation spans ~1 batch, so the
    global combine sees ~#convs rows instead of 2×#convs header/end rows."""
    return _partial_combine(_attempt_rows(batch))


def _attempt_rows_partial_raw(batch: pa.Table) -> pa.Table:
    """_attempt_rows_raw + the same per-batch arrow combine."""
    return _partial_combine(_attempt_rows_raw(batch))


def _partial_combine(t: pa.Table) -> pa.Table:
    g = pa.TableGroupBy(t, "conv_id").aggregate([
        ("tool", "max"), ("start_ts", "min"),
        ("hdr_pack", "max"), ("end_pack", "max"),
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


def _rank_df(agg):
    """Vectorized rank-within-serial over a decoded attempt DataFrame.

    Pure numpy (pandas sort+cumcount measured ~3× slower at 1M rows):
    lexsort by (serial, start_ts, conv_id) with NaN/None first, then
    segment boundaries → rank = position - segment_start.  Exact for any
    serial-complete subset (driver finish, per-bucket distributed rank).
    """
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


def _combine_attempt_partials(tbl: pa.Table) -> pa.Table:
    """Final per-conv combine of _attempt_rows(_partial) rows (arrow C++
    hash aggregate — associative with the per-batch partials) + pack
    decode → one decoded attempt row per conv_id."""
    g = pa.TableGroupBy(tbl, "conv_id").aggregate([
        ("tool", "max"), ("start_ts", "min"),
        ("hdr_pack", "max"), ("end_pack", "max"),
    ])
    g = g.rename_columns([n if n == "conv_id" else n.rsplit("_", 1)[0]
                          for n in g.column_names])
    return _decode_attempt_packs(g)


def _finish_rank_pandas(tbl: pa.Table):
    """Driver-side finish: per-conv combine + decode + vectorized rank
    within serial.  Ordering key = (start_ts, conv_id), nulls first."""
    return _rank_df(_combine_attempt_partials(tbl).to_pandas())


def ranked_attempts(parsed_ds, broadcast_threshold: int = 2_000_000,
                    collect_threshold: int = 5_000_000):
    """parsed turns → ranked attempts.

    Fast path (attempt table ≤ collect_threshold rows): per-batch arrow
    partial combine → one driver-side vectorized finish — no Ray groupby,
    whose per-group reduce overhead dominates at ~all-distinct keys
    (measured 9.6s for 82k groups vs ~1.5s for this path).  Large scale:
    the distributed groupby + bucketed-rank path below.
    """
    import ray
    import ray.data as rd

    partial = parsed_ds.map_batches(_attempt_rows_partial,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    n = partial.count()
    if n > collect_threshold:
        att = partial.groupby("conv_id").aggregate(
            Max("tool", alias_name="tool"),
            Min("start_ts", alias_name="start_ts"),
            Max("hdr_pack", alias_name="hdr_pack"),
            Max("end_pack", alias_name="end_pack"),
        ).map_batches(_decode_attempt_packs, batch_format="pyarrow",
                      zero_copy_batch=True)
        return rank_attempts(att)

    # zero-row input blocks skip the partial UDF and surface with the
    # upstream schema (no hdr_pack) — they carry nothing, drop them
    blocks = [t for t in ray.get(partial.to_arrow_refs())
              if isinstance(t, pa.Table) and "hdr_pack" in t.schema.names]
    empty_partial = pa.schema([
        ("conv_id", pa.string()), ("tool", pa.string()),
        ("start_ts", pa.int64()), ("hdr_pack", pa.string()),
        ("end_pack", pa.string())]).empty_table()
    tbl = pa.concat_tables(blocks).combine_chunks() if blocks \
        else empty_partial
    out = _finish_rank_pandas(tbl)
    cols = {}
    for f in _RANKED_SCHEMA:
        cols[f.name] = pa.array(out[f.name], f.type, from_pandas=True)
    return rd.from_arrow(pa.table(cols))
