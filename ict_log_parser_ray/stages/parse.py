"""Vectorized grok/regex parse stage (SURVEY.md §2.2 M1-M4, M10).

Re-expresses the reference's logfile record parser (the non-vendored
``ICT_logfile::push_from_file``; call sites /root/reference/src/main.rs:294 and
consumers main.rs:1014-1085) as a stateless ``map_batches`` transform over
zero-copy Arrow batches.  Each record family gets one anchored RE2 pattern run
once over the whole ``text`` column via ``pyarrow.compute.extract_regex``
(null struct on non-match); results are coalesced by match-validity masks —
no Python-per-row work anywhere.

Output columns appended to the input batch:

- ``record_type``  one of header | analog | digital | btest_end | parse_error
- ``serial``, ``panel_serial``, ``board_index`` (header rows)
- ``status``       pass | fail | unknown (decoded from the 2-digit code; M3)
- ``test_name``, ``ttype`` (analog KIND or DIG)
- ``measurement``  float64 (analog rows)
- ``lim_nom``, ``lim_ul``, ``lim_ll`` float64 — TLimit::Lim3(nom,ul,ll) /
  Lim2(ul,ll) projection (main.rs:1030-1085): ``lim_nom`` null ⇒ Lim2,
  all null ⇒ no limit
- ``lim_sig``      raw limit-string signature (A6 compares raw strings, not
  floats — SURVEY.md §7 "hard parts")
- ``start_ts``     timestamp[us] parsed from the packed YYMMDDHHMMSS field
  (header/btest_end rows; packed-time codec M10, main.rs:140-154)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

HEADER_PAT = (
    r"^\{@BTEST\|(?P<serial>[^|}]+)\|(?P<hstatus>\d{2})\|(?P<start>\d{12})\|"
    r"(?P<board_index>\d+)\|(?P<panel_serial>[^|}]+)\}"
)
ANALOG_PAT = (
    r"^\{@A-(?P<ttype>[A-Z]+)\|(?P<astatus>\d{2})\|(?P<measurement>[^|}]+)\|"
    r"(?P<test_name>[^|}]+)\}"
    r"(?:\{@LIM2\|(?P<ul2>[^|}]+)\|(?P<ll2>[^|}]+)\}"
    r"|\{@LIM3\|(?P<nom>[^|}]+)\|(?P<ul3>[^|}]+)\|(?P<ll3>[^|}]+)\})?$"
)
DIGITAL_PAT = r"^\{@D-T\|(?P<dstatus>\d{2})\|(?P<test_name>[^|}]+)\}$"
END_PAT = r"^\{@BTEST-END\|(?P<estatus>\d{2})\|(?P<end>\d{12})\}$"

_F64 = pa.float64()
_TS = pa.timestamp("us")


def _decode_status(code: pa.Array) -> pa.Array:
    """'00' → pass, '01' → fail, other non-null → unknown (M3; BResult decode,
    main.rs:1023, daily_yield.rs:162)."""
    return pc.if_else(
        pc.equal(code, "00"), pa.scalar("pass"),
        pc.if_else(pc.equal(code, "01"), pa.scalar("fail"),
                   pc.if_else(pc.is_valid(code), pa.scalar("unknown"),
                              pa.scalar(None, pa.string()))),
    )


def _cast_f64(arr: pa.Array) -> pa.Array:
    # arrow string→double handles sci notation; invalid → null rather than raise
    try:
        return pc.cast(arr, _F64)
    except pa.ArrowInvalid:
        # fall back to per-element safe cast only if malformed numerics appear
        import numpy as np
        vals = arr.to_pylist()
        out = []
        for v in vals:
            try:
                out.append(float(v) if v is not None else None)
            except ValueError:
                out.append(None)
        return pa.array(out, _F64)


def _strptime12(arr: pa.Array) -> pa.Array:
    """Packed YYMMDDHHMMSS string → timestamp[us] (M10)."""
    return pc.cast(
        pc.strptime(arr, format="%y%m%d%H%M%S", unit="us", error_is_null=True), _TS
    )


def parse_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    hdr = pc.extract_regex(text, HEADER_PAT)
    ana = pc.extract_regex(text, ANALOG_PAT)
    dig = pc.extract_regex(text, DIGITAL_PAT)
    end = pc.extract_regex(text, END_PAT)

    hdr_ok = pc.is_valid(hdr)
    ana_ok = pc.is_valid(ana)
    dig_ok = pc.is_valid(dig)
    end_ok = pc.is_valid(end)

    def f(s, name):
        # RE2 optional groups that did not participate extract as "" (not
        # null); nullify so coalesce/casts behave.
        a = pc.struct_field(s, name)
        return pc.if_else(pc.equal(a, ""), pa.scalar(None, pa.string()), a)

    record_type = pc.if_else(
        hdr_ok, pa.scalar("header"),
        pc.if_else(ana_ok, pa.scalar("analog"),
                   pc.if_else(dig_ok, pa.scalar("digital"),
                              pc.if_else(end_ok, pa.scalar("btest_end"),
                                         pa.scalar("parse_error")))),
    )

    status_code = pc.coalesce(
        f(hdr, "hstatus"), f(ana, "astatus"), f(dig, "dstatus"), f(end, "estatus")
    )
    status = _decode_status(status_code)

    test_name = pc.coalesce(f(ana, "test_name"), f(dig, "test_name"))
    ttype = pc.if_else(dig_ok, pa.scalar("DIG"), f(ana, "ttype"))

    measurement = _cast_f64(f(ana, "measurement"))

    nom_s = f(ana, "nom")
    ul_s = pc.coalesce(f(ana, "ul2"), f(ana, "ul3"))
    ll_s = pc.coalesce(f(ana, "ll2"), f(ana, "ll3"))
    lim_nom = _cast_f64(nom_s)
    lim_ul = _cast_f64(ul_s)
    lim_ll = _cast_f64(ll_s)
    # raw-string limit signature; null when the record carries no limits
    lim_sig = pc.binary_join_element_wise(
        pc.coalesce(nom_s, pa.scalar("")), pc.coalesce(ul_s, pa.scalar("")),
        pc.coalesce(ll_s, pa.scalar("")), "|",
    )
    lim_sig = pc.if_else(pc.or_(pc.is_valid(ul_s), pc.is_valid(nom_s)),
                         lim_sig, pa.scalar(None, pa.string()))

    start_ts = pc.if_else(
        hdr_ok, _strptime12(f(hdr, "start")),
        pc.if_else(end_ok, _strptime12(f(end, "end")), pa.scalar(None, _TS)),
    )
    board_index = pc.cast(f(hdr, "board_index"), pa.int32())

    cols = {
        "record_type": record_type,
        "serial": f(hdr, "serial"),
        "panel_serial": f(hdr, "panel_serial"),
        "board_index": board_index,
        "status": status,
        "test_name": test_name,
        "ttype": ttype,
        "measurement": measurement,
        "lim_nom": lim_nom,
        "lim_ul": lim_ul,
        "lim_ll": lim_ll,
        "lim_sig": lim_sig,
        "start_ts": start_ts,
    }
    for name, arr in cols.items():
        batch = batch.append_column(name, arr)
    return batch


def parse_dataset(ds, batch_size: int = 65_536):
    """read → parse: stateless tasks, zero-copy Arrow in/out (flagship S6)."""
    return ds.map_batches(
        parse_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
