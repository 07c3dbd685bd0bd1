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


@settings(max_examples=120, deadline=None)
@given(body=st.text(alphabet="|}{@LIMA23abc 0.+-", max_size=40),
       tail=st.text(alphabet="|}{@LIMA23abc 0.+-xyzáß", max_size=30))
def test_two_stage_analog_equals_reference_pattern(body, tail):
    """Adversarial fuzz of the two-stage analog parse (main + dictionary
    tail) against the single ANALOG_PAT reference: alphabet biased toward
    braces, pipes and LIM fragments so the generator hits partial-LIM
    and multi-'}' shapes constantly."""
    import pyarrow.compute as pc

    from ict_log_parser_ray.stages.parse import ANALOG_PAT

    texts = [f"{{@A-RES|00|1.5|t1}}{tail}", body,
             f"{body}}}{tail}", f"{{@A-CAP|01|{body}|n}}{tail}"]
    batch = _mk_batch(texts)
    out = parse_batch(batch)
    ref = pc.extract_regex(batch["text"].combine_chunks(), ANALOG_PAT)
    got = pc.equal(out["record_type"], "analog").to_pylist()
    want = [bool(v) for v in pc.is_valid(ref).to_pylist()]
    assert got == want
    # where both say analog, the extracted limit strings agree
    for i, ok in enumerate(want):
        if not ok:
            continue
        for g in ("ul2", "ll2", "nom", "ul3", "ll3"):
            rv = pc.struct_field(ref, g)[i].as_py()
            rv = None if rv in ("", None) else rv
            col = {"ul2": "lim_ul", "ll2": "lim_ll", "nom": "lim_nom",
                   "ul3": "lim_ul", "ll3": "lim_ll"}[g]
            if rv is not None:
                try:
                    fv = float(rv)
                except ValueError:
                    continue  # non-numeric limit casts to null on both
                assert out[col][i].as_py() == fv


@settings(max_examples=80, deadline=None)
@given(rows=st.lists(
    st.one_of(st.none(), st.text(alphabet="a}b{@cü|", max_size=25)),
    max_size=12))
def test_tails_fuzz_matches_python_reference(rows):
    """_tails_after_first_close == a per-row Python reference on
    arbitrary (null-bearing, multibyte) inputs."""
    from ict_log_parser_ray.stages.parse import _tails_after_first_close

    arr = pa.array(rows, pa.string())
    got = _tails_after_first_close(arr).to_pylist()
    want = []
    for r in rows:
        if r is None:
            want.append("")
        else:
            b = r.encode("utf-8")
            i = b.find(b"}")
            want.append(b[i + 1:].decode("utf-8") if i >= 0 else "")
    assert got == want
