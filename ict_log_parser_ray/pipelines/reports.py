"""Yield-report aggregates (SURVEY.md §2.5 A1-A10) as Ray Data jobs.

Inputs:
- ``ranked`` — the attempt-level Dataset from ``stages.attempts.ranked_attempts``
  (one row per conv_id, with att_rank / is_first / is_final / n_attempts)
- ``flagged`` — the turn-level parsed Dataset with attempt flags attached
  (``stages.route.attach_attempt_flags``)

All heavy lifting is pre-aggregated inside ``map_batches`` (partial sums /
per-batch masks) before any shuffle; the shuffles key on ``test_name``,
``hour_key``, ``panel_serial`` or ``conv_id`` — never on raw turns without a
prior reduction.  Results are small tables, safe to return as pyarrow.

Reference semantics being matched:
- A1 get_yields(): [first, final(after-retest), all] (OK, NOK) tallies —
  /root/reference/src/main.rs:421, row order proof main.rs:712-748
- A2 get_mb_yields(): panel OK iff all boards OK — main.rs:422
- A3 get_failures(FlSettings::{FirstPass,All,AfterRetest}) — main.rs:760-794
- A4 get_hourly_mb_stats() — main.rs:424, daily_yield.rs:91
- A5 get_mb_results() (last-attempt-wins rule main.rs:1205)
- A6 get_tests_w_limit_changes() — main.rs:426 (raw-string limit compare)
- A7 get_failed_boards() — daily_yield.rs:146-165
- A8 get_stats_for_test(id) — main.rs:350,1002,1014-1085
- A9 get_testlist() — main.rs:972
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum, Unique

from ..functions.timecodes import hour_key
from ..stages.join import attach_lookup



def _strcol(batch: pa.Table, name: str) -> pa.Array:
    """Column as string type even when it is all-null (pa.null() typed) —
    happens when e.g. no BTEST-END record exists anywhere (truncated logs)."""
    col = batch[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        col = pc.cast(col, pa.string())
    return col

def _pct(ok, nok):
    tot = ok + nok
    return round(100.0 * ok / tot, 4) if tot else 0.0


# ---------------------------------------------------------------- A1 / A2

def _yield_flags(batch: pa.Table) -> pa.Table:
    ok = pc.equal(pc.fill_null(_strcol(batch, "att_status"), "unknown"), "pass")
    i8 = pa.int64()
    c = pc.cast
    first = batch["is_first"]
    final = batch["is_final"]
    return pa.table({
        "first_ok": c(pc.and_(first, ok), i8),
        "first_nok": c(pc.and_(first, pc.invert(ok)), i8),
        "final_ok": c(pc.and_(final, ok), i8),
        "final_nok": c(pc.and_(final, pc.invert(ok)), i8),
        "all_ok": c(ok, i8),
        "all_nok": c(pc.invert(ok), i8),
    })


def yields_sb(ranked) -> pa.Table:
    """A1: single-board yields — 3 rows (phase, ok, nok, yield_pct)."""
    flags = ranked.map_batches(_yield_flags, batch_format="pyarrow",
                               zero_copy_batch=True)
    sums = flags.sum(["first_ok", "first_nok", "final_ok", "final_nok",
                      "all_ok", "all_nok"]) or {}
    rows = []
    for phase in ("first", "final", "all"):
        # Dataset.sum yields None per column on an empty input (e.g. a
        # day window with no attempts) — report zeros, don't crash
        ok = sums.get(f"sum({phase}_ok)") or 0
        nok = sums.get(f"sum({phase}_nok)") or 0
        rows.append({"phase": phase, "ok": ok, "nok": nok,
                     "yield_pct": _pct(ok, nok)})
    return pa.Table.from_pylist(rows)


def panel_runs(ranked):
    """Panel-run granularity: one row per (panel_serial, att_rank) with
    panel_ok iff every board attempt in that run passed (A2 precursor)."""
    def _prep(b: pa.Table) -> pa.Table:
        nok = pc.cast(
            pc.invert(pc.equal(pc.fill_null(_strcol(b, "att_status"), "unknown"), "pass")),
            pa.int64())
        return pa.table({
            "panel_serial": b["panel_serial"],
            "att_rank": b["att_rank"],
            "nok_boards": nok,
            "n_boards": pa.array([1] * b.num_rows, pa.int64()),
            "start_ts": b["start_ts"],
            "n_attempts": pc.cast(b["n_attempts"], pa.int64()),
        })

    pre = ranked.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    return pre.groupby(["panel_serial", "att_rank"]).aggregate(
        Sum("nok_boards", alias_name="nok_boards"),
        Sum("n_boards", alias_name="n_boards"),
        Min("start_ts", alias_name="start_ts"),
        Max("n_attempts", alias_name="n_runs"),
    )


def yields_mb(ranked) -> pa.Table:
    """A2: multiboard/panel yields — 3 rows (phase, ok, nok, yield_pct).

    A board that is never retested keeps its rank-0 result for later panel
    runs implicitly in the reference (the panel re-run logfile carries every
    board), and the fixture re-emits every board per run, so
    (panel_serial, att_rank) exactly identifies a panel run.
    """
    runs = panel_runs(ranked)

    def _flags(b: pa.Table) -> pa.Table:
        ok = pc.equal(b["nok_boards"], 0)
        first = pc.equal(b["att_rank"], 0)
        final = pc.equal(pc.cast(b["att_rank"], pa.int64()),
                         pc.subtract(pc.cast(b["n_runs"], pa.int64()), 1))
        c = pc.cast
        i8 = pa.int64()
        return pa.table({
            "first_ok": c(pc.and_(first, ok), i8),
            "first_nok": c(pc.and_(first, pc.invert(ok)), i8),
            "final_ok": c(pc.and_(final, ok), i8),
            "final_nok": c(pc.and_(final, pc.invert(ok)), i8),
            "all_ok": c(ok, i8),
            "all_nok": c(pc.invert(ok), i8),
        })

    flags = runs.map_batches(_flags, batch_format="pyarrow", zero_copy_batch=True)
    sums = flags.sum(["first_ok", "first_nok", "final_ok", "final_nok",
                      "all_ok", "all_nok"]) or {}
    rows = []
    for phase in ("first", "final", "all"):
        # Dataset.sum yields None per column on an empty input (e.g. a
        # day window with no attempts) — report zeros, don't crash
        ok = sums.get(f"sum({phase}_ok)") or 0
        nok = sums.get(f"sum({phase}_nok)") or 0
        rows.append({"phase": phase, "ok": ok, "nok": nok,
                     "yield_pct": _pct(ok, nok)})
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------- A3

FL_SETTINGS = ("first_pass", "all", "after_retest")


def failure_pareto(flagged, mode: str = "all"):
    """A3: failure Pareto per test under FlSettings mode.

    Returns Dataset(test_name, total, n_boards) sorted most-frequent-first
    (O3).  total = failing records; n_boards = distinct failing board serials.
    """
    assert mode in FL_SETTINGS

    def _fails(b: pa.Table) -> pa.Table:
        rt = b["record_type"]
        is_test = pc.or_(pc.equal(rt, "analog"), pc.equal(rt, "digital"))
        m = pc.and_(is_test, pc.equal(pc.fill_null(b["status"], "u"), "fail"))
        if mode == "first_pass":
            m = pc.and_(m, pc.fill_null(b["is_first"], False))
        elif mode == "after_retest":
            m = pc.and_(m, pc.fill_null(b["is_final"], False))
        t = b.filter(m)
        return t.select(["test_name", "att_serial"])

    fails = flagged.map_batches(_fails, batch_format="pyarrow",
                                zero_copy_batch=True)
    per_board = fails.groupby(["test_name", "att_serial"]).aggregate(
        Count(alias_name="n"))
    pareto = per_board.groupby("test_name").aggregate(
        Sum("n", alias_name="total"), Count(alias_name="n_boards"))
    return pareto.sort(["total", "test_name"], descending=[True, False])


def failure_pareto_all_modes(flagged) -> dict:
    """All three FlSettings Paretos from ONE scan of the turn stream.

    Extracts the failing test records (tiny fraction) once with their
    first/final flags, pins that small table, and runs the three mode
    aggregations off it — 1 full pass instead of 3.
    Returns {mode: pandas DataFrame sorted most-frequent-first}.
    """
    def _fails(b: pa.Table) -> pa.Table:
        rt = b["record_type"]
        is_test = pc.or_(pc.equal(rt, "analog"), pc.equal(rt, "digital"))
        m = pc.and_(is_test, pc.equal(pc.fill_null(b["status"], "u"), "fail"))
        t = b.filter(m)
        return pa.table({
            "test_name": t["test_name"],
            "att_serial": t["att_serial"],
            "is_first": pc.fill_null(t["is_first"], False),
            "is_final": pc.fill_null(t["is_final"], False),
        })

    fails = flagged.map_batches(_fails, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    out = {}
    for mode in FL_SETTINGS:
        sub = fails
        if mode == "first_pass":
            sub = fails.filter(lambda r: r["is_first"])
        elif mode == "after_retest":
            sub = fails.filter(lambda r: r["is_final"])
        per_board = sub.groupby(["test_name", "att_serial"]).aggregate(
            Count(alias_name="n"))
        pareto = per_board.groupby("test_name").aggregate(
            Sum("n", alias_name="total"), Count(alias_name="n_boards"))
        df = pareto.to_pandas()
        out[mode] = df.sort_values(["total", "test_name"],
                                   ascending=[False, True],
                                   kind="stable").reset_index(drop=True)
    return out


def failures_by_index(flagged, mode: str = "all"):
    """A3 by_index: failures per (test_name, panel position)."""
    assert mode in FL_SETTINGS

    def _fails(b: pa.Table) -> pa.Table:
        rt = b["record_type"]
        is_test = pc.or_(pc.equal(rt, "analog"), pc.equal(rt, "digital"))
        m = pc.and_(is_test, pc.equal(pc.fill_null(b["status"], "u"), "fail"))
        if mode == "first_pass":
            m = pc.and_(m, pc.fill_null(b["is_first"], False))
        elif mode == "after_retest":
            m = pc.and_(m, pc.fill_null(b["is_final"], False))
        return b.filter(m).select(["test_name", "att_board_index"])

    fails = flagged.map_batches(_fails, batch_format="pyarrow",
                                zero_copy_batch=True)
    return fails.groupby(["test_name", "att_board_index"]).aggregate(
        Count(alias_name="n")).sort(["test_name", "att_board_index"])


# ---------------------------------------------------------------- A4

def hourly_stats(ranked):
    """A4: per-hour panel-attempt throughput: (hour_key, ok, nok)."""
    def _prep(b: pa.Table) -> pa.Table:
        ok = pc.equal(pc.fill_null(_strcol(b, "att_status"), "unknown"), "pass")
        return pa.table({
            "hour_key": hour_key(pc.cast(b["start_ts"], pa.timestamp("us"))),
            "ok": pc.cast(ok, pa.int64()),
            "nok": pc.cast(pc.invert(ok), pa.int64()),
        })

    pre = ranked.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    return pre.groupby("hour_key").aggregate(
        Sum("ok", alias_name="ok"), Sum("nok", alias_name="nok")
    ).sort("hour_key")


def hourly_chain(ranked):
    """A4 full shape: per hour, the chronologically ordered chain of panel
    results ``(result, mmss, serial)`` alongside the OK/NOK tallies
    (reference daily_yield.rs:91 ``Vec<(time, ok, nok, Vec<(result, mmss,
    DMC)>)>``; consumption main.rs:1155-1187).

    The chain is a report-edge collection (bounded: one entry per attempt
    in the hour); the groupby keys on hour_key.
    """
    import pandas as pd

    def _prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["start_ts"], pa.timestamp("us"))
        status = pc.fill_null(_strcol(b, "att_status"), "unknown")
        mmss = pc.strftime(pc.cast(ts, pa.timestamp("s")), format="%M:%S")
        return pa.table({
            "hour_key": hour_key(ts),
            "start_ts": b["start_ts"],
            "serial": b["serial"],
            "att_status": status,
            "mmss": mmss,
        })

    pre = ranked.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    def _per_hour(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["start_ts", "serial"])
        ok = int((g["att_status"] == "pass").sum())
        chain = ";".join(f"{r.att_status},{r.mmss},{r.serial}"
                         for r in g.itertuples())
        return pd.DataFrame({
            "hour_key": [g["hour_key"].iloc[0]],
            "ok": [ok], "nok": [len(g) - ok],
            "chain": [chain],
        })

    return pre.groupby("hour_key").map_groups(
        _per_hour, batch_format="pandas").sort("hour_key")


# ---------------------------------------------------------------- A5

def _mb_results_df(df) -> "object":
    """A5 body, vectorized pandas over a ranked-attempt DataFrame: one row
    per (panel_serial, att_rank) with boards joined in (board_index,
    conv_id) order and the all-boards-OK panel result."""
    df = df.copy()
    df["att_status"] = df["att_status"].fillna("unknown")
    df = df.sort_values(["panel_serial", "att_rank", "board_index",
                         "conv_id"], kind="stable")
    g = df.groupby(["panel_serial", "att_rank"], dropna=False, sort=True)
    out = g.agg(start_ts=("start_ts", "min"),
                boards=("att_status", ",".join),
                n_ok=("att_status", lambda s: (s == "pass").sum()),
                n=("att_status", "size")).reset_index()
    out["panel_result"] = (out["n_ok"] == out["n"]).map(
        {True: "pass", False: "fail"})
    out["att_rank"] = out["att_rank"].astype("int64")
    return out[["panel_serial", "att_rank", "start_ts", "panel_result",
                "boards"]]


def mb_results(ranked, collect_threshold: int = 5_000_000,
               num_buckets: int = 64):
    """A5: per panel: chronological runs with per-board results.

    Dataset/DataFrame(panel_serial, att_rank, start_ts, panel_result,
    boards) where boards is the list of per-position statuses ordered by
    board_index and panel_result applies the all-boards-OK rule; the
    panel's *display* result is its final run's result (last-attempt-wins,
    main.rs:1205).

    Small attempt tables (≤ collect_threshold): one collect + vectorized
    pandas (round 1's 1-row-per-group Ray map_groups paid ~100µs/group of
    scheduling).  Larger: bucket by hash(panel_serial) and run the same
    vectorized body per bucket — groups shuffled are buckets, not
    ~all-distinct (panel_serial, att_rank) keys."""
    import pandas as pd
    import ray
    import ray.data as rd

    n = ranked.count()
    if n <= collect_threshold:
        tbl = pa.concat_tables(ray.get(ranked.materialize().to_arrow_refs()))
        out = _mb_results_df(tbl.to_pandas())
        return rd.from_pandas(out.reset_index(drop=True))

    def _bucket(b: pa.Table) -> pa.Table:
        from pandas.util import hash_pandas_object
        import numpy as np

        ps = b["panel_serial"]
        if isinstance(ps, pa.ChunkedArray):
            ps = ps.combine_chunks()
        hv = hash_pandas_object(pc.fill_null(ps, "").to_pandas(),
                                index=False).to_numpy()
        return b.append_column(
            "mb_bucket",
            pa.array((hv % np.uint64(num_buckets)).astype("int64")))

    withb = ranked.map_batches(_bucket, batch_format="pyarrow",
                               zero_copy_batch=True)

    def _per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _mb_results_df(g.drop(columns=["mb_bucket"]))

    return withb.groupby("mb_bucket").map_groups(
        _per_bucket, batch_format="pandas").sort(
        ["panel_serial", "att_rank"])


# ---------------------------------------------------------------- A6

def limit_changes(parsed):
    """A6: tests whose raw limit signature has >1 distinct value."""
    def _lims(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b["record_type"], "analog"),
                    pc.is_valid(b["lim_sig"]))
        t = b.filter(m).select(["test_name", "lim_sig"])
        # per-batch distinct (partial combine): a batch holds thousands of
        # records but only ~hundreds of distinct (test, sig) pairs — the
        # groupby then shuffles pairs, not records
        return pa.TableGroupBy(t, ["test_name", "lim_sig"]).aggregate([])

    lims = parsed.map_batches(_lims, batch_format="pyarrow", zero_copy_batch=True)
    per_sig = lims.groupby(["test_name", "lim_sig"]).aggregate(
        Count(alias_name="n"))
    per_test = per_sig.groupby("test_name").aggregate(
        Count(alias_name="n_limits"))
    return per_test.filter(lambda r: r["n_limits"] > 1).sort("test_name")


# ---------------------------------------------------------------- A7

def failed_boards(ranked, flagged, broadcast_threshold: int = 2_000_000):
    """A7: boards failing after retest: (serial, conv_id, end_ts, failed_tests).

    failed_tests = comma-joined sorted failing test names of the final
    attempt (daily_yield.rs:163 ``board.3.join(", ")``).
    """
    def _fail_names(b: pa.Table) -> pa.Table:
        rt = b["record_type"]
        is_test = pc.or_(pc.equal(rt, "analog"), pc.equal(rt, "digital"))
        m = pc.and_(pc.and_(is_test,
                            pc.equal(pc.fill_null(b["status"], "u"), "fail")),
                    pc.fill_null(b["is_final"], False))
        return b.filter(m).select(["conv_id", "test_name"])

    names = flagged.map_batches(_fail_names, batch_format="pyarrow",
                                zero_copy_batch=True)
    per_conv = names.groupby("conv_id").aggregate(
        Unique("test_name", alias_name="names"))

    def _join_names(b: pa.Table) -> pa.Table:
        joined = [",".join(sorted(x)) if x is not None else ""
                  for x in b["names"].to_pylist()]
        return b.drop_columns(["names"]).append_column(
            "failed_tests", pa.array(joined, pa.string()))

    per_conv = per_conv.map_batches(_join_names, batch_format="pyarrow")

    final_fail = ranked.filter(
        lambda r: r["is_final"] and r["att_status"] == "fail")
    out = attach_lookup(final_fail, per_conv, on="conv_id",
                        broadcast_threshold=broadcast_threshold)
    return out.map_batches(
        lambda t: t.select(["serial", "conv_id", "tool", "end_ts",
                            "att_status", "failed_tests"]),
        batch_format="pyarrow").sort(["serial", "conv_id"])


# ---------------------------------------------------------------- A8 / A9

_TURN_PARTIAL_SCHEMA = pa.schema([
    ("metric", pa.string()), ("test_name", pa.string()),
    ("att_serial", pa.string()), ("is_first", pa.bool_()),
    ("is_final", pa.bool_()), ("lim_sig", pa.string()),
    ("sink", pa.string()), ("n", pa.int64()),
])


def turn_partials_batch(b: pa.Table) -> pa.Table:
    """Per-batch partial metrics: fail records [A3], distinct lim pairs
    [A6], per-sink counts [routing] — tagged rows in one narrow table.
    Expects the ``sink`` column to be present (run after add_sink_column)."""
    import numpy as np

    rt = b["record_type"]
    is_test = pc.or_(pc.equal(rt, "analog"), pc.equal(rt, "digital"))
    fail = pc.and_(is_test,
                   pc.equal(pc.fill_null(b["status"], "u"), "fail"))
    f = b.filter(fail)
    # per-batch combine: a batch has many failing records but few distinct
    # (test, serial, flags) keys — ship counted keys, not records
    fg = pa.TableGroupBy(pa.table({
        "test_name": f["test_name"],
        "att_serial": f["att_serial"],
        "is_first": pc.fill_null(f["is_first"], False),
        "is_final": pc.fill_null(f["is_final"], False),
    }), ["test_name", "att_serial", "is_first", "is_final"]).aggregate([
        ([], "count_all")])
    fails = pa.table({
        "metric": pa.array(["fail"] * fg.num_rows, pa.string()),
        "test_name": fg["test_name"],
        "att_serial": fg["att_serial"],
        "is_first": fg["is_first"],
        "is_final": fg["is_final"],
        "lim_sig": pa.nulls(fg.num_rows, pa.string()),
        "sink": pa.nulls(fg.num_rows, pa.string()),
        "n": pc.cast(fg["count_all"], pa.int64()),
    })

    lm = pc.and_(pc.equal(rt, "analog"), pc.is_valid(b["lim_sig"]))
    lt = b.filter(lm).select(["test_name", "lim_sig"])
    lt = pa.TableGroupBy(lt, ["test_name", "lim_sig"]).aggregate([])
    lims = pa.table({
        "metric": pa.array(["lim"] * lt.num_rows, pa.string()),
        "test_name": lt["test_name"],
        "att_serial": pa.nulls(lt.num_rows, pa.string()),
        "is_first": pa.nulls(lt.num_rows, pa.bool_()),
        "is_final": pa.nulls(lt.num_rows, pa.bool_()),
        "lim_sig": lt["lim_sig"],
        "sink": pa.nulls(lt.num_rows, pa.string()),
        "n": pa.array(np.ones(lt.num_rows, np.int64)),
    })

    col = b["sink"]
    vc = pc.value_counts(col.combine_chunks()
                         if isinstance(col, pa.ChunkedArray) else col)
    sinks = pa.table({
        "metric": pa.array(["sink"] * len(vc), pa.string()),
        "test_name": pa.nulls(len(vc), pa.string()),
        "att_serial": pa.nulls(len(vc), pa.string()),
        "is_first": pa.nulls(len(vc), pa.bool_()),
        "is_final": pa.nulls(len(vc), pa.bool_()),
        "lim_sig": pa.nulls(len(vc), pa.string()),
        "sink": vc.field("values"),
        "n": pc.cast(vc.field("counts"), pa.int64()),
    })
    return pa.concat_tables([fails, lims, sinks])


def finish_turn_metrics(df) -> dict:
    """Driver-side finish of collected turn partials → paretos / limit
    changes / sink counts (tiny inputs, vectorized pandas)."""
    fails = df[df["metric"] == "fail"]
    paretos = {}
    for mode in FL_SETTINGS:
        sub = fails
        if mode == "first_pass":
            sub = fails[fails["is_first"].astype(bool)]
        elif mode == "after_retest":
            sub = fails[fails["is_final"].astype(bool)]
        tot = sub.groupby("test_name")["n"].sum().rename("total")
        # dropna=False: a truncated conv (no header) has null att_serial;
        # the distributed groupby counts that group as one board and this
        # path must agree (drop_duplicates keeps the NaN pair)
        nb = (sub.drop_duplicates(["test_name", "att_serial"])
              .groupby("test_name").size().rename("n_boards"))
        g = (tot.to_frame().join(nb).reset_index())
        g["total"] = g["total"].astype("int64")
        g["n_boards"] = g["n_boards"].astype("int64")
        paretos[mode] = g.sort_values(["total", "test_name"],
                                      ascending=[False, True],
                                      kind="stable").reset_index(drop=True)

    lims = df[df["metric"] == "lim"]
    nlim = (lims.drop_duplicates(["test_name", "lim_sig"])
            .groupby("test_name").size().rename("n_limits").reset_index())
    limit_changes_df = (nlim[nlim["n_limits"] > 1]
                        .sort_values("test_name").reset_index(drop=True))
    limit_changes_df["n_limits"] = limit_changes_df["n_limits"].astype("int64")

    sinks = df[df["metric"] == "sink"]
    sink_df = (sinks.groupby("sink")["n"].sum().rename("n").reset_index()
               .sort_values("sink").reset_index(drop=True))
    sink_df["n"] = sink_df["n"].astype("int64")

    return {"paretos": paretos, "limit_changes": limit_changes_df,
            "sink_counts": sink_df}


def turn_metrics_combined(flagged) -> dict:
    """ONE pass over the turn stream → A3 paretos (3 modes) + A6 limit
    changes + per-sink counts.  Per-batch partial combine; collected output
    is tiny (tagged partial rows), finished driver-side."""
    import ray

    from ..stages.route import add_sink_column

    def _partials(b: pa.Table) -> pa.Table:
        return turn_partials_batch(add_sink_column(b))

    part = flagged.map_batches(_partials, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    from ..blocks import concat_shaped
    tbl = concat_shaped(part, "metric",
                        empty_schema=_TURN_PARTIAL_SCHEMA).combine_chunks()
    return finish_turn_metrics(tbl.to_pandas())



def _sink_part_name(part: pa.Table) -> str:
    """Deterministic, content-derived sink file name: a Ray task retry (or
    lineage re-execution over the same block) rewrites the SAME file
    instead of adding a duplicate under a fresh uuid — per-task-retry
    idempotence for side-effect writes."""
    import hashlib

    h = hashlib.blake2b(digest_size=12)
    for col in ("conv_id", "turn_idx"):
        arr = part[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        for buf in arr.buffers():
            if buf is not None:
                h.update(buf)
    h.update(str(part.num_rows).encode())
    return f"part-{h.hexdigest()}.parquet"


def write_sink_file(part: pa.Table, fn: str, compression: str = "lz4") -> None:
    """One routed sink file, with the canonical write profile (lz4 + no
    dictionary + no column stats — sink files are bulk-scanned, not
    point-filtered; see CLAUDE.md for the measured codec A/Bs).

    Ensures the parent directory ON THE WORKER: the driver-side makedirs
    only covers the driver's node — on a multi-node cluster writing to
    node-local paths the parent wouldn't exist at all, and even
    single-node a vanished dir (observed once as a flaky ENOENT under
    /dev/shm mid-scaling-run) must not abort a 100-TB job.  The makedirs
    is ~µs against a parquet encode."""
    import os

    import pyarrow.parquet as _pq

    os.makedirs(os.path.dirname(fn), exist_ok=True)
    _pq.write_table(part, fn, compression=compression,
                    use_dictionary=False, write_statistics=False)

def write_sinks_with_metrics(flagged, out_dir: str) -> dict:
    """Fused single pass: route + hive-partitioned sink write + turn
    metrics.  Each map task writes its batch's per-sink parquet files as a
    side effect (unique file names; idempotent at the directory level —
    callers replace ``out_dir`` wholesale, as run_resumable does per shard)
    and RETURNS only the tiny partial-metrics table, so routing, writing
    and the A3/A6/sink aggregates cost one traversal of the turn stream.
    """
    import os

    import ray

    from ..stages.route import SINKS

    os.makedirs(out_dir, exist_ok=True)
    for s in SINKS:
        os.makedirs(os.path.join(out_dir, f"sink={s}"), exist_ok=True)

    from ..stages.route import sink_array

    narrow_cols = ["record_type", "status", "test_name", "att_serial",
                   "is_first", "is_final", "lim_sig"]

    def _write_and_partial(b: pa.Table) -> pa.Table:
        sink = sink_array(b)
        for s in pc.unique(sink).to_pylist():
            part = b.filter(pc.equal(sink, s))
            fn = os.path.join(out_dir, f"sink={s}", _sink_part_name(part))
            write_sink_file(part, fn)
        # partial metrics on a text-free projection (streaming.py idiom)
        return turn_partials_batch(
            b.select(narrow_cols).append_column("sink", sink))

    part = flagged.map_batches(_write_and_partial, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    from ..blocks import concat_shaped
    tbl = concat_shaped(part, "metric",
                        empty_schema=_TURN_PARTIAL_SCHEMA).combine_chunks()
    return finish_turn_metrics(tbl.to_pandas())


def attempts_report_tables(ranked, collect_threshold: int = 5_000_000) -> dict:
    """A1/A2/A4 from the attempt table in ONE collection when it is small.

    The attempt table is turns/40; below ``collect_threshold`` rows it is
    collected once and the three reports are computed with vectorized
    pandas — semantics identical to the distributed yields_sb / yields_mb /
    hourly_stats (tested against them).  Above the threshold the
    distributed versions run instead.
    """
    import ray

    n = ranked.count()
    if n > collect_threshold:
        return {"yields_sb": yields_sb(ranked), "yields_mb": yields_mb(ranked),
                "hourly": hourly_stats(ranked).to_pandas()}

    tbl = pa.concat_tables(ray.get(ranked.materialize().to_arrow_refs()))
    return attempt_reports_from_table(tbl)


def attempt_reports_from_table(tbl: pa.Table) -> dict:
    """attempts_report_tables body over an in-memory ranked-attempt table
    (streaming flagship already holds it — no second collect)."""
    import numpy as np
    import pandas as pd

    df = tbl.to_pandas()
    status_ok = df["att_status"].fillna("unknown") == "pass"
    first = df["att_rank"] == 0
    final = df["att_rank"] == df["n_attempts"] - 1

    def _y3(ok, first_m, final_m):
        rows = []
        all_m = np.ones(len(ok), bool)
        for phase, m in (("first", first_m), ("final", final_m),
                         ("all", all_m)):
            sel_ok = int((ok & m).sum())
            sel_nok = int((~ok & m).sum())
            rows.append({"phase": phase, "ok": sel_ok, "nok": sel_nok,
                         "yield_pct": _pct(sel_ok, sel_nok)})
        return pa.Table.from_pylist(rows)

    ys = _y3(status_ok.to_numpy(), first.to_numpy(), final.to_numpy())

    runs = (df.assign(nok_b=(~status_ok).astype(int))
            .groupby(["panel_serial", "att_rank"], as_index=False)
            .agg(nok_boards=("nok_b", "sum"), n_runs=("n_attempts", "max")))
    r_ok = (runs["nok_boards"] == 0).to_numpy()
    r_first = (runs["att_rank"] == 0).to_numpy()
    r_final = (runs["att_rank"] == runs["n_runs"] - 1).to_numpy()
    ym = _y3(r_ok, r_first, r_final)

    st = pd.to_datetime(df["start_ts"], unit="us")
    hk = ((st.dt.year % 100) * 1_000_000 + st.dt.month * 10_000
          + st.dt.day * 100 + st.dt.hour)
    # NaT start_ts (BTEST-END with no parseable header) → pd.NA hour_key,
    # kept as its own group (dropna=False) to match the distributed
    # hourly_stats twin, which groups null hour_key rows together.
    hdf = (pd.DataFrame({"hour_key": hk.astype("Int64"),
                         "ok": status_ok.astype(int),
                         "nok": (~status_ok).astype(int)})
           .groupby("hour_key", as_index=False, dropna=False)[["ok", "nok"]]
           .sum()
           .sort_values("hour_key").reset_index(drop=True))
    hdf["ok"] = hdf["ok"].astype("int64")
    hdf["nok"] = hdf["nok"].astype("int64")
    return {"yields_sb": ys, "yields_mb": ym, "hourly": hdf}


def test_series(parsed, test_name: str):
    """A8: full time-series of one test across boards, chronological."""
    def _sel(b: pa.Table) -> pa.Table:
        m = pc.equal(pc.fill_null(b["test_name"], ""), test_name)
        return b.filter(m).select(
            ["conv_id", "ts", "status", "measurement",
             "lim_nom", "lim_ul", "lim_ll", "ttype"])

    return parsed.map_batches(_sel, batch_format="pyarrow",
                              zero_copy_batch=True).sort(["ts", "conv_id"])


def testlist(parsed):
    """A9: distinct test names with record counts, name-ordered.

    This groupby ships raw test-record rows keyed by test_name — a SKEWED
    key (the seeded Pareto tests appear in ~every attempt), so it uses the
    salted two-phase aggregation (north_rule: salted repartition before the
    groupby shuffle)."""
    from ..stages.skew import salted_sum_counts

    def _sel(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b["test_name"])).select(
            ["test_name", "ttype"])

    t = parsed.map_batches(_sel, batch_format="pyarrow", zero_copy_batch=True)
    return salted_sum_counts(t, ["test_name"], max_cols=["ttype"]
                             ).sort("test_name")
