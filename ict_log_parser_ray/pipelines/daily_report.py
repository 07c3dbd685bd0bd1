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
from ray.data.aggregate import Count, Sum

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

    def _prep(b: pa.Table) -> pa.Table:
        tools = b["tool"].to_pylist()
        prod = pa.array([lut.get(t, t) for t in tools], pa.string())
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
    pareto (All⋈AfterRetest), failed_boards, yields.
    """
    ranked = pipe["attempts"]
    flagged = pipe["flagged"]

    if window_filter:
        start, end = day_window(report_day)
        # start_ts is naive epoch-micros aligned with the fixture's naive ts
        lo = int((start - datetime(1970, 1, 1)).total_seconds() * 1e6)
        hi = int((end - datetime(1970, 1, 1)).total_seconds() * 1e6)

        def _win(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(b["start_ts"], lo),
                        pc.less(b["start_ts"], hi))
            return b.filter(m)

        ranked = ranked.map_batches(_win, batch_format="pyarrow",
                                    zero_copy_batch=True)

        # the turn stream must be windowed too (by its attempt's start) or
        # the daily Pareto / failed-board sections would include failures
        # from outside the report day — the reference only discovers logs
        # inside the window (daily_yield.rs:250)
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
    totals = (hourly.groupby("product", as_index=False)[["ok", "nok"]].sum()
              .assign(hour_key=-1))  # A10 totals row per product
    hourly_with_totals = pd.concat([hourly, totals], ignore_index=True)

    return {
        "hourly": hourly_with_totals,
        "pareto": pareto_join(flagged),
        "failed_boards": reports.failed_boards(ranked, flagged).to_pandas(),
        "yields": reports.yields_sb(ranked).to_pandas(),
    }


def write_report(report: dict, out_dir: str):
    """Persist the report tables as parquet (the XLSX-workbook analog)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, df in report.items():
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
