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


def test_parse_two_stage_equals_reference():
    """The MAIN+dictionary-TAIL analog parse must reproduce ANALOG_PAT's
    whole-string semantics exactly — including garbage tails (not
    analog), bare records (no limits), multibyte text, and nulls."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ict_log_parser_ray.stages.parse import ANALOG_PAT, parse_batch

    rows = [
        "{@A-RES|00|12.5|R1}{@LIM2|1.0|2.0}",
        "{@A-RES|00|12.5|R1}{@LIM3|1.5|1.0|2.0}",
        "{@A-CAP|01|3e-9|C7}",                      # no limits
        "{@A-RES|00|12.5|R1}{@LIM2|1.0|2.0}x",      # garbage after LIM
        "{@A-RES|00|12.5|R1}garbage",               # garbage tail
        "{@A-RES|00|12.5|R1}{@LIM2|1.0}",           # malformed LIM
        "{@A-RES|00|12.5|R1}{@LIM3|1|2}",           # LIM3 arity wrong
        "{@D-T|00|DTEST}",                          # digital, not analog
        "{@D-T|00|DTEST}{@LIM2|1|2}",               # digital + tail → err
        "not a record at all",
        "münchen ünïcode {@A-RES|00|1|R}",          # multibyte, no match
        "{@A-RES|00|1|R}{@LIM2|á|ß}",               # multibyte limits
        "",
        None,
        "{@BTEST|SN1|00|240101120000|1|P1}",        # header row
        "{@BTEST-END|00|240101120500}",
    ]
    batch = pa.table({
        "conv_id": pa.array(["c"] * len(rows)),
        "turn_idx": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string()),
    })
    out = parse_batch(batch)

    ref = pc.extract_regex(batch["text"].combine_chunks(), ANALOG_PAT)
    ref_ok = pc.is_valid(ref).to_pylist()
    got_analog = pc.equal(out["record_type"], "analog").to_pylist()
    assert got_analog == [bool(v) for v in ref_ok]

    def ref_field(name):
        a = pc.struct_field(ref, name)
        return [None if (v in ("", None) or not ok) else v
                for v, ok in zip(a.to_pylist(), ref_ok)]

    assert out["test_name"].to_pylist()[:7] == ref_field("test_name")[:7]
    got_ul = out["lim_ul"].to_pylist()
    want_ul = [None if (v in ("", None) or not ok) else v
               for v, ok in zip(pc.coalesce(pc.struct_field(ref, "ul2"),
                                            pc.struct_field(ref, "ul3"))
                                .to_pylist(), ref_ok)]
    # non-numeric limits cast to null on both paths; compare the numeric ones
    for g, w in zip(got_ul, want_ul):
        if w is not None:
            try:
                w = float(w)
            except ValueError:
                continue
            assert g == w


def test_tails_after_first_close_sliced_and_large_string():
    """The byte-gather must honor a nonzero array offset (sliced batch)
    and large_string offsets."""
    import pyarrow as pa

    from ict_log_parser_ray.stages.parse import _tails_after_first_close

    base = pa.array(["a}tail1", "no close", "}x", "münch}ütail", None, "}"])
    sliced = base.slice(2)        # offset-bearing view
    got = _tails_after_first_close(sliced)
    assert got.to_pylist() == ["x", "ütail", "", ""]

    big = pa.array(["a}t", None, "q}"], pa.large_string())
    assert _tails_after_first_close(big).to_pylist() == ["t", "", ""]

    only = pa.array([True, False, True])
    masked = _tails_after_first_close(pa.array(["a}x", "b}y", "c}z"]),
                                      only=only)
    assert masked.to_pylist() == ["x", "", "z"]
