"""Property-based fuzzing of the parse stage (hypothesis).

1. Round-trip: records GENERATED from the grammar parse back to exactly the
   fields they were built from (the vectorized arrow parser and the pure
   Python reference parser agree on every generated record).
2. Crash-resistance: arbitrary text never crashes the parser and never
   produces a record type other than the defined ones.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ict_log_parser_ray import parity
from ict_log_parser_ray.stages.parse import parse_batch

_name = st.from_regex(r"[a-z][a-z0-9%]{0,9}", fullmatch=True)
_serial = st.from_regex(r"[A-Z0-9\-]{1,16}", fullmatch=True)
_status = st.sampled_from(["00", "01", "07"])
_ts12 = st.datetimes(min_value=__import__("datetime").datetime(2000, 1, 1),
                     max_value=__import__("datetime").datetime(2068, 1, 1)
                     ).map(lambda d: d.strftime("%y%m%d%H%M%S"))
_meas = st.floats(min_value=1e-6, max_value=1e6, allow_nan=False
                  ).map(lambda v: f"{v:+1.4E}")
_kind = st.sampled_from(["RES", "CAP", "DIO", "IND", "JUM"])


def _mk_batch(texts):
    n = len(texts)
    return pa.table({
        "conv_id": pa.array(["c"] * n), "turn_idx": pa.array(range(n), pa.int32()),
        "role": pa.array(["x"] * n), "text": pa.array(texts),
        "tool": pa.array(["t"] * n), "ts": pa.array([0] * n, pa.timestamp("us")),
    })


@settings(max_examples=60, deadline=None)
@given(serial=_serial, status=_status, start=_ts12,
       bidx=st.integers(0, 99), panel=_serial)
def test_header_roundtrip(serial, status, start, bidx, panel):
    text = f"{{@BTEST|{serial}|{status}|{start}|{bidx}|{panel}}}"
    r = parse_batch(_mk_batch([text])).to_pylist()[0]
    assert r["record_type"] == "header"
    assert r["serial"] == serial
    assert r["panel_serial"] == panel
    assert r["board_index"] == bidx
    assert r["start_ts"].strftime("%y%m%d%H%M%S") == start
    assert r["status"] == {"00": "pass", "01": "fail"}.get(status, "unknown")
    # agrees with the sequential reference parser
    assert parity.parse_row(text)["serial"] == serial


@settings(max_examples=60, deadline=None)
@given(kind=_kind, status=_status, meas=_meas, name=_name,
       lim=st.sampled_from(["none", "lim2", "lim3"]),
       ul=_meas, ll=_meas, nom=_meas)
def test_analog_roundtrip(kind, status, meas, name, lim, ul, ll, nom):
    text = f"{{@A-{kind}|{status}|{meas}|{name}}}"
    if lim == "lim2":
        text += f"{{@LIM2|{ul}|{ll}}}"
    elif lim == "lim3":
        text += f"{{@LIM3|{nom}|{ul}|{ll}}}"
    r = parse_batch(_mk_batch([text])).to_pylist()[0]
    assert r["record_type"] == "analog"
    assert r["test_name"] == name
    assert r["ttype"] == kind
    assert abs(r["measurement"] - float(meas)) < 1e-9 * max(1, abs(float(meas)))
    if lim == "none":
        assert r["lim_sig"] is None
    elif lim == "lim2":
        assert r["lim_nom"] is None and r["lim_ul"] is not None
    else:
        assert r["lim_nom"] is not None and r["lim_ll"] is not None
    ref = parity.parse_row(text)
    assert ref["record_type"] == "analog" and ref["test_name"] == name


@settings(max_examples=100, deadline=None)
@given(text=st.text(max_size=120))
def test_arbitrary_text_never_crashes(text):
    r = parse_batch(_mk_batch([text])).to_pylist()[0]
    assert r["record_type"] in ("header", "analog", "digital", "btest_end",
                                "parse_error")
    # arrow parser and python reference classify identically
    assert r["record_type"] == parity.parse_row(text)["record_type"]


@settings(max_examples=50, deadline=None)
@given(prefix=st.sampled_from(["{@BTEST", "{@A-RES", "{@D-T", "{@BTEST-END"]),
       junk=st.text(alphabet="|}{0123456789abc", max_size=30))
def test_truncated_records_are_parse_errors_or_valid(prefix, junk):
    text = prefix + junk
    r = parse_batch(_mk_batch([text])).to_pylist()[0]
    assert r["record_type"] == parity.parse_row(text)["record_type"]
