"""Tests for K1 result-matrix export, K2 daily-yield report, J3 board
reports, A5 mb_results and A3 by_index."""

from datetime import datetime

import pytest


@pytest.fixture(scope="module")
def pipeline(fixture_sf0001):
    from ict_log_parser_ray.pipelines import flagship

    return flagship.build(
        f"{fixture_sf0001['dir']}/transcripts",
        tool_meta=fixture_sf0001["tool_meta"],
        materialize_intermediates=True,
    )


# ------------------------------------------------------------------- K1

def test_export_long_all(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.export import ExportSettings, export_long

    df = export_long(pipeline["flagged"], ExportSettings()).to_pandas()
    # one row per test record of every attempt
    golden = fixture_sf0001["golden"]
    n_test_records = sum(
        v["total"] for v in golden["paretos"]["all"].values())
    assert (df["status"] == "fail").sum() == n_test_records
    assert set(df.columns) == {"conv_id", "serial", "att_rank", "att_status",
                               "test_name", "status", "measurement"}


def test_export_long_failures_only(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.export import ExportSettings, export_long

    df = export_long(pipeline["flagged"],
                     ExportSettings(mode="failures_only")).to_pandas()
    assert (df["status"] == "fail").all()
    golden_total = sum(
        v["total"] for v in fixture_sf0001["golden"]["paretos"]["all"].values())
    assert len(df) == golden_total


def test_export_long_manual_and_final(pipeline):
    from ict_log_parser_ray.pipelines.export import (
        ExportSettings, export_long, parse_manual_test_list)

    tests = parse_manual_test_list("c613 r412 v605%ON")
    assert tests == ["c613", "r412", "v605%ON"]

    df_all = export_long(pipeline["flagged"], ExportSettings()).to_pandas()
    name = df_all["test_name"].iloc[0]
    df = export_long(
        pipeline["flagged"],
        ExportSettings(mode="manual", manual_tests=[name])).to_pandas()
    assert set(df["test_name"]) == {name}

    df_final = export_long(pipeline["flagged"],
                           ExportSettings(only_final_logs=True)).to_pandas()
    assert len(df_final) < len(df_all)


def test_export_matrix_pivot(pipeline):
    from ict_log_parser_ray.pipelines.export import ExportSettings, export_matrix

    wide = export_matrix(pipeline["flagged"],
                         ExportSettings(only_failed_panels=True))
    assert {"conv_id", "serial", "att_rank", "att_status"} <= set(wide.columns)
    # vertical: one row per failing attempt conv
    assert wide["conv_id"].is_unique
    assert (wide["att_status"] == "fail").all()


# ------------------------------------------------------------------- J3

def test_board_report(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.export import board_report, board_report_nok

    fb = fixture_sf0001["golden"]["failed_boards"]
    if not fb:
        pytest.skip("no failing boards in fixture")
    conv, info = next(iter(fb.items()))
    rep = board_report(pipeline["flagged"], info["serial"])
    assert info["serial"] in rep
    first_failed_test = info["failed_tests"].split(",")[0]
    assert first_failed_test in rep

    nok = board_report_nok(pipeline["flagged"], info["serial"])
    assert "failing attempt" in nok

    missing = board_report(pipeline["flagged"], "DMC-NOPE")
    assert "No logs" in missing


# ------------------------------------------------------------------- K2

def test_daily_report(pipeline, fixture_sf0001, tmp_path):
    from ict_log_parser_ray.pipelines.daily_report import (daily_report,
                                                           write_report)

    rep = daily_report(pipeline, datetime(2026, 1, 5),
                       tool_meta=fixture_sf0001["tool_meta"])
    hourly = rep["hourly"]
    assert {"product", "hour_key", "ok", "nok"} <= set(hourly.columns)
    # totals rows (hour_key == -1) exist per product and equal column sums
    for prod, g in hourly[hourly["hour_key"] != -1].groupby("product"):
        tot = hourly[(hourly["product"] == prod) & (hourly["hour_key"] == -1)]
        assert tot["ok"].iloc[0] == g["ok"].sum()
        assert tot["nok"].iloc[0] == g["nok"].sum()
    # the tool missing from tool_meta stays visible under its raw tool id
    assert "ict-05" in set(hourly["product"])

    # J2 join: after_retest columns present, blank (NaN) where no entry;
    # per-product rows aggregate back to the golden per-test Pareto
    pareto = rep["pareto"]
    assert "after_retest_total" in pareto.columns
    per_test = pareto.groupby("test_name")["total"].sum()
    golden = fixture_sf0001["golden"]["paretos"]["all"]
    assert len(per_test) == len(golden)

    write_report(rep, str(tmp_path / "report"), report_day=datetime(2026, 1, 5))
    assert (tmp_path / "report" / "hourly.parquet").exists()
    # laid-out artifact (K2 workbook analog): header block, per-product
    # sections, totals footers, repeat-suppressed failed-board serials
    txt = (tmp_path / "report" / "daily_yield.txt").read_text()
    assert "day reported:\t2026-01-05" in txt
    assert "Failed tests\tAll\tAfter retest" in txt
    assert "Failed boards\tTime\tResult\tFailed tests" in txt
    for prod in rep["hourly"]["product"].unique():
        assert f"=== {prod} " in txt
    assert "(total)\t" in txt
    # repeat suppression: a serial with >1 failed-board rows appears once
    fb = rep["failed_boards"]
    dup_serials = fb["serial"].value_counts()
    if (dup_serials > 1).any():
        s = dup_serials[dup_serials > 1].index[0]
        assert txt.count(f"\n{s}\t") == 1


def test_daily_report_window_excludes_out_of_day(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.daily_report import daily_report

    rep_day1 = daily_report(pipeline, datetime(2026, 1, 5),
                            tool_meta=fixture_sf0001["tool_meta"])
    rep_all = daily_report(pipeline, datetime(2026, 1, 5),
                           tool_meta=fixture_sf0001["tool_meta"],
                           window_filter=False)
    h1 = rep_day1["hourly"]
    ha = rep_all["hourly"]
    # fixture spans 30 h from 06:00 → day window drops the tail
    assert h1[h1["hour_key"] != -1]["hour_key"].max() <= 26010606
    assert (h1[h1["hour_key"] != -1]["ok"].sum()
            <= ha[ha["hour_key"] != -1]["ok"].sum())


def test_daily_report_empty_day(pipeline, fixture_sf0001):
    """A report day with zero in-window attempts yields empty tables, not a
    crash (empty Datasets lose their schema after groupby/map — the report
    assembly must tolerate that)."""
    from ict_log_parser_ray.pipelines.daily_report import daily_report

    rep = daily_report(pipeline, datetime(1999, 1, 1),
                       tool_meta=fixture_sf0001["tool_meta"])
    assert len(rep["hourly"]) == 0
    assert len(rep["pareto"]) == 0
    assert len(rep["failed_boards"]) == 0
    y = rep["yields"]
    assert len(y) == 3 and (y["ok"] == 0).all() and (y["nok"] == 0).all()


# ------------------------------------------------------------------- A5

def test_mb_results(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import mb_results

    rows = mb_results(pipeline["attempts"]).take_all()
    golden = fixture_sf0001["golden"]
    # number of (panel, run) combinations equals the golden MB 'all' total
    ym = golden["yields_mb"]["all"]
    assert len(rows) == ym[0] + ym[1]
    ok = sum(1 for r in rows if r["panel_result"] == "pass")
    assert ok == ym[0]
    # boards list is comma-joined statuses
    assert all("," in r["boards"] or r["boards"] in ("pass", "fail", "unknown")
               for r in rows)


# ------------------------------------------------------------------- A3 by_index

def test_failures_by_index(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import failures_by_index

    rows = failures_by_index(pipeline["flagged"], "all").take_all()
    total = sum(r["n"] for r in rows)
    golden_total = sum(
        v["total"] for v in fixture_sf0001["golden"]["paretos"]["all"].values())
    assert total == golden_total
    assert all(r["att_board_index"] >= 0 for r in rows)


# ------------------------------------------------------------------- A4 chain

def test_hourly_chain(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import hourly_chain

    rows = hourly_chain(pipeline["attempts"]).take_all()
    golden = fixture_sf0001["golden"]
    got = {r["hour_key"]: (r["ok"], r["nok"]) for r in rows}
    assert got == golden["hourly"]
    chains = {r["hour_key"]: r["chain"] for r in rows}
    assert chains == golden["hourly_chain"]


def test_board_report_w_index(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.export import board_report_w_index

    fb = fixture_sf0001["golden"]["failed_boards"]
    if not fb:
        pytest.skip("no failing boards in fixture")
    conv, info = next(iter(fb.items()))
    # board index is the 2-digit field inside conv B{panel}-{board}-{run}
    bidx = int(conv.split("-")[1])
    rep = board_report_w_index(pipeline["flagged"], info["serial"], bidx)
    assert info["serial"] in rep and f"position {bidx}" in rep
    missing = board_report_w_index(pipeline["flagged"], info["serial"], 99)
    assert "No logs" in missing


def test_export_matrix_chunks_no_truncation(ray_session):
    """>2000 distinct tests: chunked pivot covers every test (round 1
    truncated at max_tests)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.pipelines.export import (ExportSettings,
                                                     export_matrix,
                                                     export_matrix_chunks)

    n = 2500
    tbl = pa.table({
        "record_type": pa.array(["analog"] * n),
        "conv_id": pa.array(["conv1"] * n),
        "att_serial": pa.array(["SER1"] * n),
        "att_rank": pa.array([0] * n, pa.int32()),
        "att_status": pa.array(["pass"] * n),
        "is_final": pa.array([True] * n),
        "test_name": pa.array([f"t{i:05d}" for i in range(n)]),
        "status": pa.array(["pass"] * n),
        "measurement": pa.array(np.arange(n, dtype="float64")),
    })
    ds = rd.from_arrow(tbl)
    st = ExportSettings()
    wide = export_matrix(ds, st)
    assert wide.shape[1] == 4 + n  # every test present, no cap
    chunks = list(export_matrix_chunks(ds, st, chunk_size=1000))
    assert len(chunks) == 3
    covered = []
    for c in chunks:
        assert c.shape[1] <= 4 + 1000
        covered.extend(col for col in c.columns
                       if col not in ("conv_id", "serial", "att_rank",
                                      "att_status"))
    assert len(covered) == n and len(set(covered)) == n
