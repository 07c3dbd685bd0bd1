"""The single-pass / collected report fast paths must be value-identical to
the distributed report implementations (and hence to the parity golden)."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def pipeline(fixture_sf0001):
    from ict_log_parser_ray.pipelines import flagship

    return flagship.build(
        f"{fixture_sf0001['dir']}/transcripts",
        tool_meta=fixture_sf0001["tool_meta"],
        materialize_intermediates=True,
    )


def test_turn_metrics_combined_matches_distributed(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines import reports
    from ict_log_parser_ray.stages.route import sink_counts

    tm = reports.turn_metrics_combined(pipeline["flagged"])

    for mode in reports.FL_SETTINGS:
        dist = reports.failure_pareto(pipeline["flagged"], mode).to_pandas()
        fast = tm["paretos"][mode]
        pd.testing.assert_frame_equal(
            fast.sort_values(["test_name"]).reset_index(drop=True),
            dist.sort_values(["test_name"]).reset_index(drop=True),
            check_dtype=False)
        golden = fixture_sf0001["golden"]["paretos"][mode]
        got = {r["test_name"]: {"total": r["total"], "n_boards": r["n_boards"]}
               for r in fast.to_dict("records")}
        assert got == golden

    dist_lim = reports.limit_changes(pipeline["parsed"]).to_pandas()
    pd.testing.assert_frame_equal(
        tm["limit_changes"].reset_index(drop=True),
        dist_lim.reset_index(drop=True), check_dtype=False)

    dist_sink = (sink_counts(pipeline["routed"]).to_pandas()
                 .sort_values("sink").reset_index(drop=True))
    pd.testing.assert_frame_equal(tm["sink_counts"], dist_sink,
                                  check_dtype=False)
    assert {r["sink"]: r["n"] for r in tm["sink_counts"].to_dict("records")} \
        == fixture_sf0001["golden"]["sink_counts"]


def test_attempts_report_tables_matches_distributed(pipeline, fixture_sf0001):
    from ict_log_parser_ray.pipelines import reports

    fast = reports.attempts_report_tables(pipeline["attempts"])
    golden = fixture_sf0001["golden"]

    got_sb = {r["phase"]: (r["ok"], r["nok"])
              for r in fast["yields_sb"].to_pylist()}
    assert got_sb == golden["yields_sb"]
    got_mb = {r["phase"]: (r["ok"], r["nok"])
              for r in fast["yields_mb"].to_pylist()}
    assert got_mb == golden["yields_mb"]
    got_h = {r["hour_key"]: (r["ok"], r["nok"])
             for r in fast["hourly"].to_dict("records")}
    assert got_h == golden["hourly"]

    # the distributed versions agree too
    dist_sb = {r["phase"]: (r["ok"], r["nok"])
               for r in reports.yields_sb(pipeline["attempts"]).to_pylist()}
    assert dist_sb == got_sb
    dist_h = {r["hour_key"]: (r["ok"], r["nok"])
              for r in reports.hourly_stats(pipeline["attempts"]).take_all()}
    assert dist_h == got_h


def test_distributed_rank_path_matches_fast_path_on_fixture(fixture_sf0001,
                                                            ray_session):
    """Force the >threshold bucketed rank path over the whole fixture and
    require row-identical output to the driver fast path (VERDICT item:
    the distributed path must match the oracle-checked path)."""
    import ray.data as rd

    from ict_log_parser_ray.stages.attempts import ranked_attempts
    from ict_log_parser_ray.stages.parse import parse_dataset

    parsed = parse_dataset(rd.from_arrow(fixture_sf0001["table"]))
    fast = (ranked_attempts(parsed).to_pandas()
            .sort_values("conv_id").reset_index(drop=True))
    dist = (ranked_attempts(parsed, collect_threshold=0).to_pandas()
            .sort_values("conv_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist[fast.columns], check_dtype=False)


def test_attempts_report_tables_null_start_ts(ray_session):
    """ADVICE regression: the A1/A2/A4 pandas fast path must not raise
    IntCastingNaNError when an attempt has a null start_ts (header with an
    unparseable date / END-only conversation) — NaT becomes a null
    hour_key group, matching the distributed hourly_stats."""
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.pipelines import reports
    from ict_log_parser_ray.stages.attempts import ranked_attempts
    from ict_log_parser_ray.stages.parse import parse_dataset

    texts = [
        ("baddate", 0, "{@BTEST|DMCX|00|999999999999|0|PNL}"),
        ("baddate", 1, "{@BTEST-END|01|999999999999}"),
        ("good", 0, "{@BTEST|DMCG|00|260105080000|0|PNL}"),
        ("good", 1, "{@BTEST-END|00|260105080100}"),
    ]
    tbl = pa.table({
        "conv_id": pa.array([t[0] for t in texts]),
        "turn_idx": pa.array([t[1] for t in texts], pa.int32()),
        "role": pa.array(["x"] * len(texts)),
        "text": pa.array([t[2] for t in texts]),
        "tool": pa.array(["t"] * len(texts)),
        "ts": pa.array([0] * len(texts), pa.timestamp("us")),
    })
    ranked = ranked_attempts(parse_dataset(rd.from_arrow(tbl)))
    small = reports.attempts_report_tables(ranked)
    ys = {r["phase"]: (r["ok"], r["nok"])
          for r in small["yields_sb"].to_pylist()}
    # both convs count: good passes, baddate fails (last END status 01)
    assert ys["all"] == (1, 1)
    # the good conv lands in its hour; the NaT conv must not crash the path
    assert len(small["hourly"]) >= 1


def test_mb_results_bucketed_path_matches_collect_path(pipeline):
    """collect_threshold=0 forces the >5M-row BUCKETED mb_results path
    (hash(panel_serial) buckets, same vectorized body per bucket) — the
    branch production runs at scale but the fixture never reaches.
    Row-set equality vs the collect path."""
    import pandas as pd

    from ict_log_parser_ray.pipelines.reports import mb_results

    cols = ["panel_serial", "att_rank", "start_ts", "panel_result",
            "boards"]
    fast = (mb_results(pipeline["attempts"]).to_pandas()[cols]
            .sort_values(["panel_serial", "att_rank"])
            .reset_index(drop=True))
    dist = (mb_results(pipeline["attempts"], collect_threshold=0)
            .to_pandas()[cols]
            .sort_values(["panel_serial", "att_rank"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(dist, fast, check_dtype=False)
    assert len(fast) > 0
