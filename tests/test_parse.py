"""Unit tests for the vectorized parse stage (M1-M4, M10)."""

import pyarrow as pa
import pyarrow.compute as pc

from ict_log_parser_ray.stages.parse import parse_batch


def _mk(texts, roles=None):
    n = len(texts)
    return pa.table({
        "conv_id": pa.array(["c"] * n),
        "turn_idx": pa.array(range(n), pa.int32()),
        "role": pa.array(roles or ["x"] * n),
        "text": pa.array(texts),
        "tool": pa.array(["ict-00"] * n),
        "ts": pa.array([0] * n, pa.timestamp("us")),
    })


def test_header_record():
    out = parse_batch(_mk(["{@BTEST|DMC0000100|01|260105063000|2|PNL00001}"]))
    r = out.to_pylist()[0]
    assert r["record_type"] == "header"
    assert r["serial"] == "DMC0000100"
    assert r["status"] == "fail"
    assert r["board_index"] == 2
    assert r["panel_serial"] == "PNL00001"
    assert r["start_ts"].strftime("%y%m%d%H%M%S") == "260105063000"


def test_analog_lim3():
    out = parse_batch(_mk(
        ["{@A-RES|00|+1.2345E+03|r412}{@LIM3|+1.2000E+03|+1.3200E+03|+1.0800E+03}"]))
    r = out.to_pylist()[0]
    assert r["record_type"] == "analog"
    assert r["test_name"] == "r412"
    assert r["ttype"] == "RES"
    assert abs(r["measurement"] - 1234.5) < 1e-9
    assert abs(r["lim_nom"] - 1200.0) < 1e-9
    assert abs(r["lim_ul"] - 1320.0) < 1e-9
    assert abs(r["lim_ll"] - 1080.0) < 1e-9
    assert r["lim_sig"] == "+1.2000E+03|+1.3200E+03|+1.0800E+03"


def test_analog_lim2_and_nolim():
    out = parse_batch(_mk([
        "{@A-CAP|01|+4.0000E+01|c613}{@LIM2|+4.4000E+01|+3.6000E+01}",
        "{@A-JUM|00|+1.0000E-01|j17}",
    ]))
    r2, r0 = out.to_pylist()
    assert r2["lim_nom"] is None and abs(r2["lim_ul"] - 44.0) < 1e-9
    assert r2["status"] == "fail"
    assert r0["lim_sig"] is None and r0["lim_ul"] is None
    assert r0["record_type"] == "analog"


def test_digital_and_end():
    out = parse_batch(_mk([
        "{@D-T|00|d105}",
        "{@BTEST-END|01|260105064559}",
    ]))
    d, e = out.to_pylist()
    assert d["record_type"] == "digital" and d["ttype"] == "DIG"
    assert d["test_name"] == "d105" and d["status"] == "pass"
    assert e["record_type"] == "btest_end" and e["status"] == "fail"
    assert e["start_ts"].strftime("%y%m%d%H%M%S") == "260105064559"


def test_chatter_and_malformed():
    out = parse_batch(_mk([
        "operator note: fixture cleaned",
        "{@BTEST|missing|fields}",
        "{@A-RES|xx|notanumber|}",
    ]))
    assert [r["record_type"] for r in out.to_pylist()] == ["parse_error"] * 3
    assert all(r["status"] is None for r in out.to_pylist())


def test_unknown_status_code():
    out = parse_batch(_mk(["{@D-T|07|d105}"]))
    assert out.to_pylist()[0]["status"] == "unknown"


def test_parse_preserves_input_columns_and_rows(fixture_sf0001):
    tbl = fixture_sf0001["table"]
    out = parse_batch(tbl)
    assert out.num_rows == tbl.num_rows
    for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
        assert out[c].equals(tbl[c])


def test_parse_matches_parity_reference(fixture_sf0001):
    """Per-row record_type equality against the sequential reference parser."""
    from ict_log_parser_ray import parity

    tbl = fixture_sf0001["table"]
    out = parse_batch(tbl)
    got = out["record_type"].to_pylist()
    want = [parity.parse_row(t)["record_type"] for t in tbl["text"].to_pylist()]
    assert got == want


def test_distributed_rank_handles_null_serial_and_start(ray_session):
    """Regression (code review): the distributed rank path must not crash on
    attempts with null serial (no header) or null start_ts (bad date), and
    must agree with the driver fast path."""
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.attempts import ranked_attempts
    from ict_log_parser_ray.stages.parse import parse_dataset

    texts = [
        # conv with only a BTEST-END (null serial)
        ("lonely", 0, "{@BTEST-END|00|260105070000}"),
        # conv whose header has an unparseable date (null start_ts)
        ("baddate", 0, "{@BTEST|DMCX|00|999999999999|0|PNL}"),
        ("baddate", 1, "{@BTEST-END|01|999999999999}"),
        # normal conv
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
    parsed = parse_dataset(rd.from_arrow(tbl))
    for threshold in (0, 5_000_000):  # distributed path vs driver fast path
        ranked = {r["conv_id"]: r for r in
                  ranked_attempts(parsed,
                                  collect_threshold=threshold).take_all()}
        assert len(ranked) == 3
        assert ranked["good"]["att_rank"] == 0
        assert ranked["good"]["is_final"]
        assert ranked["baddate"]["n_attempts"] == 1
        assert ranked["lonely"]["is_first"] and ranked["lonely"]["is_final"]
