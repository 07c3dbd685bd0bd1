"""The fully streaming flagship must produce identical reports and sink
contents to the materialized flagship / parity reference."""

import os

import duckdb
import pytest


@pytest.fixture(scope="module")
def streamed(fixture_sf0001, tmp_path_factory):
    from ict_log_parser_ray.pipelines.streaming import run_streaming

    out = str(tmp_path_factory.mktemp("stream_sinks"))
    res = run_streaming(f"{fixture_sf0001['dir']}/transcripts",
                        fixture_sf0001["tool_meta"], out)
    return res


def test_streaming_sink_counts(streamed, fixture_sf0001):
    got = {r["sink"]: r["n"]
           for r in streamed["reports"]["sink_counts"].to_dict("records")}
    assert got == fixture_sf0001["golden"]["sink_counts"]


def test_streaming_yields_and_hourly(streamed, fixture_sf0001):
    golden = fixture_sf0001["golden"]
    ys = {r["phase"]: (r["ok"], r["nok"])
          for r in streamed["reports"]["yields_sb"].to_pylist()}
    assert ys == golden["yields_sb"]
    ym = {r["phase"]: (r["ok"], r["nok"])
          for r in streamed["reports"]["yields_mb"].to_pylist()}
    assert ym == golden["yields_mb"]
    hh = {r["hour_key"]: (r["ok"], r["nok"])
          for r in streamed["reports"]["hourly"].to_dict("records")}
    assert hh == golden["hourly"]


def test_streaming_paretos_and_limits(streamed, fixture_sf0001):
    golden = fixture_sf0001["golden"]
    for mode in ("all", "first_pass", "after_retest"):
        got = {r["test_name"]: {"total": r["total"], "n_boards": r["n_boards"]}
               for r in streamed["reports"][f"pareto_{mode}"].to_dict("records")}
        assert got == golden["paretos"][mode]
    assert (streamed["reports"]["limit_changes"]["test_name"].tolist()
            == golden["limit_changes"])


def test_streaming_sink_files_row_identical_to_materialized(
        streamed, fixture_sf0001, tmp_path_factory):
    """Written sink rows (keys + sink label) match the materialized
    flagship's routed output exactly."""
    from ict_log_parser_ray.pipelines import flagship
    from ict_log_parser_ray.pipelines.reports import write_sinks_with_metrics

    pipe = flagship.build(f"{fixture_sf0001['dir']}/transcripts",
                          tool_meta=fixture_sf0001["tool_meta"],
                          materialize_intermediates=True,
                          materialize_flagged=False)
    mat_out = str(tmp_path_factory.mktemp("mat_sinks"))
    write_sinks_with_metrics(pipe["flagged"], mat_out)

    con = duckdb.connect()
    q = ("SELECT conv_id, turn_idx, sink FROM parquet_scan('{}/**/*.parquet',"
         " hive_partitioning=1) ORDER BY conv_id, turn_idx, sink")
    a = con.sql(q.format(streamed["sinks"])).df()
    b = con.sql(q.format(mat_out)).df()
    con.close()
    assert a.equals(b)


def test_streaming_attempts_match_parity(streamed, fixture_sf0001):
    golden = fixture_sf0001["golden"]
    assert streamed["attempts"].count() == golden["n_attempts"]


def test_streaming_garbage_only_transcripts(ray_session, tmp_path):
    """No parseable record anywhere: the verify probe that found real bugs
    in the materialized path — every turn must route to parse_error, the
    attempt table must come back empty, and nothing may crash.  Covers the
    STREAMING flagship end-to-end (the materialized path is covered by the
    parity/fuzz suites)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.streaming import run_streaming

    n = 500
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    pq.write_table(pa.table({
        "conv_id": pa.array([f"c{i % 37}" for i in range(n)]),
        "turn_idx": pa.array([i % 29 for i in range(n)], pa.int32()),
        "role": pa.array(["tool"] * n),
        "text": pa.array([f"utter garbage {i} ###" for i in range(n)]),
        "tool": pa.array(["t0"] * n),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
    }), tdir / "part-0.parquet")

    out = tmp_path / "sinks"
    res = run_streaming(str(tdir), None, str(out))

    sc = {r["sink"]: r["n"]
          for r in res["reports"]["sink_counts"].to_dict("records")}
    # lcm(37, 29) > n, so every (conv_id, turn_idx) key is unique: all n
    # turns survive dedup and every one routes to parse_error
    assert sc == {"parse_error": n}
    assert res["attempts"].count() == 0
    ys = {r["phase"]: (r["ok"], r["nok"])
          for r in res["reports"]["yields_sb"].to_pylist()}
    assert ys == {"first": (0, 0), "final": (0, 0), "all": (0, 0)}
    for mode in ("all", "first_pass", "after_retest"):
        assert len(res["reports"][f"pareto_{mode}"]) == 0


def test_streaming_remote_metric_collect_path(fixture_sf0001, tmp_path,
                                              monkeypatch):
    """ICT_METRIC_COLLECT_BYTES=0 forces the grouped-remote metric-row
    collect (the multi-node path that keeps collision blobs off the
    driver) — reports must match the default driver-side collect."""
    from ict_log_parser_ray.pipelines.streaming import run_streaming

    monkeypatch.setenv("ICT_METRIC_COLLECT_BYTES", "0")
    res = run_streaming(f"{fixture_sf0001['dir']}/transcripts",
                        fixture_sf0001["tool_meta"], str(tmp_path / "s"))
    got = {r["sink"]: r["n"]
           for r in res["reports"]["sink_counts"].to_dict("records")}
    assert got == fixture_sf0001["golden"]["sink_counts"]
    assert {r["phase"]: (r["ok"], r["nok"])
            for r in res["reports"]["yields_sb"].to_pylist()} == \
        fixture_sf0001["golden"]["yields_sb"]


def test_write_sink_file_creates_missing_parent(tmp_path):
    """Sink writes must ensure their parent dir ON THE WORKER: the
    driver-side makedirs only covers the driver's node (multi-node
    node-local paths), and a vanished dir was observed once as a flaky
    mid-run ENOENT under /dev/shm — either way the write, not the job,
    owns the directory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.reports import write_sink_file

    t = pa.table({"conv_id": pa.array(["a", "b"]),
                  "turn_idx": pa.array([0, 1], pa.int64())})
    fn = tmp_path / "out" / "sink=pass" / "part-x.parquet"  # parents absent
    write_sink_file(t, str(fn))
    assert pq.read_table(str(fn)).num_rows == 2
