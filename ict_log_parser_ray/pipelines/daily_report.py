"""Daily Yield report (K2): the multi-product batch report.

Reference flow (/root/reference/src/daily_yield.rs:199-308): for each
product, discover logs in the report-day window (D 06:00 → D+1 06:00),
parse, then write hourly OK/NOK + totals, the failure Pareto with the
All ⋈ AfterRetest left-outer join (J2, daily_yield.rs:127-139), and the
failed-board detail (A7).

New engine: the per-product loop becomes a partition of the enriched
transcript table by ``product`` (from the tool_meta enrichment) — ONE Ray
pass computes every product's aggregates; the report assembly at the driver
edge formats the small result tables (A10 totals included).
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from ..functions.timecodes import day_window, hour_key
from . import reports


def _attempts_with_product(ranked, flagged=None):
    """Attempt table already carries tool; map tool→product via the enrich
    columns present on the flagged/parsed stream if available, else tool."""
    return ranked


def product_hourly(ranked, enrich_lookup: dict | None = None):
    """Per (product, hour): ok/nok panel-attempt counts + A10 totals.

    ``enrich_lookup``: tool → product (small dict from tool_meta); falls
    back to the raw tool id when missing (null-product tools stay visible).
    """
    lut = enrich_lookup or {}
    # vectorized dict lookup: index_in + take (stages/join.py idiom),
    # unmatched tools fall back to the raw tool id
    lut_keys = pa.array(list(lut.keys()), pa.string())
    lut_vals = pa.array(list(lut.values()), pa.string())

    def _prep(b: pa.Table) -> pa.Table:
        tool = b["tool"]
        if isinstance(tool, pa.ChunkedArray):
            tool = tool.combine_chunks()
        idx = pc.index_in(tool, value_set=lut_keys)
        prod = pc.coalesce(pc.take(lut_vals, idx), tool)
        status = b["att_status"]
        if isinstance(status, pa.ChunkedArray):
            status = status.combine_chunks()
        if pa.types.is_null(status.type):
            status = pc.cast(status, pa.string())
        ok = pc.equal(pc.fill_null(status, "unknown"), "pass")
        return pa.table({
            "product": prod,
            "hour_key": hour_key(pc.cast(b["start_ts"], pa.timestamp("us"))),
            "ok": pc.cast(ok, pa.int64()),
            "nok": pc.cast(pc.invert(ok), pa.int64()),
        })

    pre = ranked.map_batches(_prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    return pre.groupby(["product", "hour_key"]).aggregate(
        Sum("ok", alias_name="ok"), Sum("nok", alias_name="nok")
    ).sort(["product", "hour_key"])


def pareto_join(flagged) -> pd.DataFrame:
    """J2: All-failures ⋈ AfterRetest-failures on test name, left outer —
    missing after-retest entry shows blank (daily_yield.rs:127-139)."""
    all_p = reports.failure_pareto(flagged, "all").to_pandas()
    ar_p = reports.failure_pareto(flagged, "after_retest").to_pandas()
    ar_p = ar_p.rename(columns={"total": "after_retest_total",
                                "n_boards": "after_retest_boards"})
    out = all_p.merge(ar_p, on="test_name", how="left")
    return out.sort_values(["total", "test_name"],
                           ascending=[False, True]).reset_index(drop=True)


def daily_report(pipe, report_day: datetime, tool_meta: pa.Table | None = None,
                 window_filter: bool = True) -> dict:
    """Assemble the full K2 report from one pipeline pass.

    Returns dict of small pandas tables: hourly (per product, with totals),
    pareto (All⋈AfterRetest, per product), failed_boards (with product),
    yields.

    Windowing semantics (daily_yield.rs:250): the reference discovers and
    ranks logs ONLY inside the day window, so attempts are RE-RANKED within
    the windowed set — a board whose first run predates the window counts
    as first-pass here, exactly as the reference would see it — and the
    turn flags are re-attached from the re-ranked table (globally computed
    flags would leak pre-window rank state into the daily sections).
    """
    ranked = pipe["attempts"]
    flagged = pipe["flagged"]

    if window_filter:
        from ..stages.attempts import rank_attempts
        from ..stages.route import ATTEMPT_ATTACH_COLS, attach_attempt_flags

        start, end = day_window(report_day)
        # start_ts is naive epoch-micros aligned with the fixture's naive ts
        lo = int((start - datetime(1970, 1, 1)).total_seconds() * 1e6)
        hi = int((end - datetime(1970, 1, 1)).total_seconds() * 1e6)

        def _win(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(b["start_ts"], lo),
                        pc.less(b["start_ts"], hi))
            return b.filter(m)

        windowed = ranked.map_batches(_win, batch_format="pyarrow",
                                      zero_copy_batch=True)
        # re-rank within the window: recompute att_rank / n_attempts /
        # is_first / is_final over only the in-window attempts.
        # materialize: four consumers read it below (flag attach,
        # product_hourly, failed_boards, yields) — unpinned lineage would
        # re-run the window+bucket shuffle+rank per consumer
        ranked = rank_attempts(windowed.map_batches(
            lambda t: t.drop_columns(["att_rank", "n_attempts",
                                      "is_first", "is_final"]),
            batch_format="pyarrow", zero_copy_batch=True)).materialize()

        # turn stream: drop the stale global flags, re-attach the windowed
        # ranks, then keep only turns whose attempt is in the window
        def _strip(b: pa.Table) -> pa.Table:
            drop = [c for c in ATTEMPT_ATTACH_COLS.values()
                    if c in b.column_names]
            return b.drop_columns(drop)

        base = flagged.map_batches(_strip, batch_format="pyarrow",
                                   zero_copy_batch=True)
        flagged = attach_attempt_flags(base, ranked)

        def _win_flagged(b: pa.Table) -> pa.Table:
            st = pc.fill_null(b["att_start_ts"], -1)
            m = pc.and_(pc.greater_equal(st, lo), pc.less(st, hi))
            return b.filter(m)

        flagged = flagged.map_batches(_win_flagged, batch_format="pyarrow",
                                      zero_copy_batch=True)

    lut = {}
    if tool_meta is not None:
        lut = dict(zip(tool_meta["tool"].to_pylist(),
                       tool_meta["product"].to_pylist()))

    hourly = product_hourly(ranked, lut).to_pandas()
    if "product" not in hourly.columns:
        # a day window with zero in-range attempts: the empty Dataset loses
        # its schema after groupby — report an empty day, don't crash
        hourly = pd.DataFrame(columns=["product", "hour_key", "ok", "nok"])
    totals = (hourly.groupby("product", as_index=False)[["ok", "nok"]].sum()
              .assign(hour_key=-1))  # A10 totals row per product
    hourly_with_totals = pd.concat([hourly, totals], ignore_index=True)

    fb = reports.failed_boards(ranked, flagged).to_pandas()
    if "tool" not in fb.columns:  # empty day window (schema lost, as above)
        fb = pd.DataFrame(columns=["serial", "tool", "start_ts",
                                   "n_attempts", "final_status"])
    fb["product"] = fb["tool"].map(lambda t: lut.get(t, t))

    return {
        "hourly": hourly_with_totals,
        "pareto": pareto_join_by_product(flagged),
        "failed_boards": fb,
        "yields": reports.yields_sb(ranked).to_pandas(),
    }


def pareto_join_by_product(flagged) -> pd.DataFrame:
    """J2 per product: All ⋈ AfterRetest failure totals by test name.

    One scan: per-batch combine of (product, test_name, is_final) fail
    counts, small groupby, driver pivot."""
    from ray.data.aggregate import Sum

    def _fails(b: pa.Table) -> pa.Table:
        rt = b["record_type"]
        is_test = pc.or_(pc.equal(rt, "analog"), pc.equal(rt, "digital"))
        m = pc.and_(is_test, pc.equal(pc.fill_null(b["status"], "u"), "fail"))
        t = b.filter(m)
        prod = t["product"] if "product" in t.column_names else t["tool"]
        import numpy as np
        tt = pa.table({
            "product": pc.fill_null(prod, "(none)"),
            "test_name": t["test_name"],
            "is_final": pc.fill_null(t["is_final"], False),
            "n": pa.array(np.ones(t.num_rows, np.int64)),
        })
        g = pa.TableGroupBy(tt, ["product", "test_name",
                                 "is_final"]).aggregate([("n", "sum")])
        return g.rename_columns(["product", "test_name", "is_final", "n"])

    part = flagged.map_batches(_fails, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = part.groupby(["product", "test_name", "is_final"]).aggregate(
        Sum("n", alias_name="n")).to_pandas()
    if agg.empty:
        return pd.DataFrame(columns=["product", "test_name", "total",
                                     "after_retest_total"])
    tot = (agg.groupby(["product", "test_name"], as_index=False)["n"].sum()
           .rename(columns={"n": "total"}))
    ar = (agg[agg["is_final"]]
          .groupby(["product", "test_name"], as_index=False)["n"].sum()
          .rename(columns={"n": "after_retest_total"}))
    out = tot.merge(ar, on=["product", "test_name"], how="left")
    out["total"] = out["total"].astype("int64")
    return out.sort_values(["product", "total", "test_name"],
                           ascending=[True, False, True],
                           kind="stable").reset_index(drop=True)


def render_report(report: dict, report_day: datetime,
                  generated: datetime | None = None,
                  sw_version: str = "ict_log_parser_ray") -> str:
    """Lay out the K2 report as one human-readable text artifact mirroring
    the reference workbook (daily_yield.rs:56-169): header block, then per
    product — hourly OK/NOK with totals footer, Failed tests (All / After
    retest) with totals footer, and the failed-board detail with
    repeat-suppressed serials (blank cell when the DMC repeats,
    daily_yield.rs:154-158)."""
    from ..functions.timecodes import hour_key_to_str

    gen = generated or datetime.now()
    L = []
    L.append(f"report generated:\t{gen.strftime('%Y-%m-%d')}")
    L.append(f"day reported:\t{report_day.strftime('%Y-%m-%d')}")
    L.append(f"sw version:\t{sw_version}")
    L.append("")
    L.append("Product:")

    hourly = report["hourly"]
    pareto = report["pareto"]
    fb = report["failed_boards"]
    products = sorted(p for p in hourly["product"].unique())
    for prod in products:
        L.append("")
        L.append(f"=== {prod} " + "=" * max(1, 60 - len(str(prod))))
        L.append("")
        L.append("\tOK\tNOK")
        ph = hourly[(hourly["product"] == prod) & (hourly["hour_key"] >= 0)]
        for r in ph.sort_values("hour_key").itertuples():
            L.append(f"{hour_key_to_str(int(r.hour_key))}\t{int(r.ok)}"
                     f"\t{int(r.nok)}")
        pt = hourly[(hourly["product"] == prod) & (hourly["hour_key"] < 0)]
        tok = int(pt["ok"].sum())
        tnok = int(pt["nok"].sum())
        L.append(f"(total)\t{tok}\t{tnok}")
        L.append("")

        L.append("Failed tests\tAll\tAfter retest")
        pp = pareto[pareto["product"] == prod] if "product" in pareto else pareto
        t_all = 0
        t_ar = 0
        for r in pp.itertuples():
            ar = "" if pd.isna(r.after_retest_total) \
                else str(int(r.after_retest_total))
            t_ar += 0 if pd.isna(r.after_retest_total) \
                else int(r.after_retest_total)
            t_all += int(r.total)
            L.append(f"{r.test_name}\t{int(r.total)}\t{ar}")
        L.append(f"(total)\t{t_all}\t{t_ar}")
        L.append("")

        L.append("Failed boards\tTime\tResult\tFailed tests")
        pf = fb[fb["product"] == prod] if "product" in fb else fb
        last_serial = None
        for r in pf.sort_values(["serial", "conv_id"]).itertuples():
            cell = "" if r.serial == last_serial else str(r.serial)
            last_serial = r.serial
            end_s = ""
            if not pd.isna(r.end_ts):
                end_s = (pd.to_datetime(int(r.end_ts), unit="us")
                         .strftime("%y.%m.%d %H:%M:%S"))
            L.append(f"{cell}\t{end_s}\t{r.att_status}\t"
                     f"{str(r.failed_tests).replace(',', ', ')}")
    L.append("")
    return "\n".join(L)


def write_report(report: dict, out_dir: str, report_day: datetime = None,
                 generated: datetime | None = None):
    """Persist the report: per-table parquet + the laid-out text artifact
    (the XLSX-workbook analog — no xlsx writer in this environment)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, df in report.items():
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    if report_day is not None:
        txt = render_report(report, report_day, generated=generated)
        with open(os.path.join(out_dir, "daily_yield.txt"), "w") as f:
            f.write(txt)
