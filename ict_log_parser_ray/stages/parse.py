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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HEADER_PAT = (
    r"^\{@BTEST\|(?P<serial>[^|}]+)\|(?P<hstatus>\d{2})\|(?P<start>\d{12})\|"
    r"(?P<board_index>\d+)\|(?P<panel_serial>[^|}]+)\}"
)
# The analog record is parsed in two stages (measured 1.22 s → 0.45 s
# single-threaded over 1.4M sf0.1 rows): the mandatory MAIN prefix, then
# the short post-'}' TAIL holding the optional LIM2/LIM3 record.  One
# combined optional-alternation regex (ANALOG_PAT, kept as the semantic
# reference and for the equivalence test) pays ~1 s in RE2 capture-group
# fallback; the tails are also massively repetitive (limits are per-test
# constants), so the tail regexes run once per DICTIONARY value.
ANALOG_PAT = (
    r"^\{@A-(?P<ttype>[A-Z]+)\|(?P<astatus>\d{2})\|(?P<measurement>[^|}]+)\|"
    r"(?P<test_name>[^|}]+)\}"
    r"(?:\{@LIM2\|(?P<ul2>[^|}]+)\|(?P<ll2>[^|}]+)\}"
    r"|\{@LIM3\|(?P<nom>[^|}]+)\|(?P<ul3>[^|}]+)\|(?P<ll3>[^|}]+)\})?$"
)
ANALOG_MAIN_PAT = (
    r"^\{@A-(?P<ttype>[A-Z]+)\|(?P<astatus>\d{2})\|(?P<measurement>[^|}]+)\|"
    r"(?P<test_name>[^|}]+)\}"
)
LIM2_PAT = r"^\{@LIM2\|(?P<ul2>[^|}]+)\|(?P<ll2>[^|}]+)\}$"
LIM3_PAT = r"^\{@LIM3\|(?P<nom>[^|}]+)\|(?P<ul3>[^|}]+)\|(?P<ll3>[^|}]+)\}$"
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


def _tails_after_first_close(text: pa.Array,
                             only: "pa.Array | None" = None) -> pa.Array:
    """Substring after the first ``'}'`` per row ('' when absent or the
    row is null) — a vectorized byte gather over the Arrow buffers.
    find_substring returns UTF-8 code-unit (= byte) offsets, so the
    arithmetic is exact for any input.  ``only`` (boolean mask): rows
    outside it get '' without paying the gather (callers that only need
    tails of candidate rows skip the garbage-row bytes)."""
    n = len(text)
    if n == 0:
        return pa.array([], pa.string())
    close = pc.fill_null(pc.find_substring(text, "}"), -1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    if only is not None:
        keep = pc.fill_null(only, False).to_numpy(zero_copy_only=False)
        close = np.where(keep, close, -1)
    off_dtype = np.int64 if pa.types.is_large_string(text.type) else np.int32
    bufs = text.buffers()
    offs = np.frombuffer(bufs[1], off_dtype)[
        text.offset: text.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    start = np.where(close >= 0, offs[:-1] + close + 1, offs[1:])
    tlen = np.where(close >= 0, offs[1:] - start, 0)
    total = int(tlen.sum())
    new_offs = np.zeros(n + 1, np.int32)
    np.cumsum(tlen, out=new_offs[1:])
    pos = np.arange(total, dtype=np.int64) + np.repeat(
        start - np.r_[np.int64(0), np.cumsum(tlen)[:-1]], tlen)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(new_offs.tobytes()),
        pa.py_buffer(data[pos].tobytes()))


def parse_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    hdr = pc.extract_regex(text, HEADER_PAT)
    dig = pc.extract_regex(text, DIGITAL_PAT)
    end = pc.extract_regex(text, END_PAT)

    # analog two-stage parse (see ANALOG_PAT comment): mandatory MAIN
    # prefix, then the short post-'}' tail matched once per dictionary
    # value (limits are per-test constants — ~10² uniques per 10⁶ rows).
    # Tails are gathered only for MAIN-matched rows (garbage rows can be
    # long); every tail-derived field is computed on the dictionary and
    # broadcast back with one take.
    ana = pc.extract_regex(text, ANALOG_MAIN_PAT)
    main_ok = pc.is_valid(ana)
    tails = _tails_after_first_close(text, only=main_ok)
    td = tails.dictionary_encode()
    d2 = pc.extract_regex(td.dictionary, LIM2_PAT)
    d3 = pc.extract_regex(td.dictionary, LIM3_PAT)

    hdr_ok = pc.is_valid(hdr)
    # a row is analog iff MAIN matches and the tail is empty or a full
    # LIM2/LIM3 record — exactly ANALOG_PAT's whole-string semantics
    # (equivalence pinned by test_parse_two_stage_equals_reference)
    d_tail_ok = pc.or_(pc.equal(td.dictionary, ""),
                       pc.or_(pc.is_valid(d2), pc.is_valid(d3)))
    ana_ok = pc.and_(main_ok, pc.take(d_tail_ok, td.indices))
    dig_ok = pc.is_valid(dig)
    end_ok = pc.is_valid(end)

    null_str = pa.scalar(None, pa.string())

    # Every group in the SPLIT patterns is mandatory ([^|}]+ / [A-Z]+ /
    # \d{2,12}), so a non-matching row's fields are null structs and the
    # round-2 ""-nullify pass (for the old combined pattern's optional
    # groups) is gone.  struct_field alone suffices; analog fields are
    # additionally masked by ana_ok (MAIN can match on a row whose
    # garbage tail disqualifies the record).
    def fm(name):
        return pc.if_else(ana_ok, pc.struct_field(ana, name), null_str)

    # record_type: one int8 code per row + a 5-element take — replaces 4
    # full-length nested if_else string passes
    _np_ok = [m.to_numpy(zero_copy_only=False)
              for m in (hdr_ok, ana_ok, dig_ok, end_ok)]
    code = np.where(_np_ok[0], 1, np.where(_np_ok[1], 2,
                    np.where(_np_ok[2], 3, np.where(_np_ok[3], 4, 0))))
    record_type = pc.take(
        pa.array(["parse_error", "header", "analog", "digital",
                  "btest_end"]), pa.array(code.astype(np.int8)))

    status_code = pc.coalesce(
        pc.struct_field(hdr, "hstatus"), fm("astatus"),
        pc.struct_field(dig, "dstatus"), pc.struct_field(end, "estatus")
    )
    # decode once per dictionary value (the code domain is ~3 strings)
    sd = status_code.dictionary_encode()
    status = pc.take(_decode_status(sd.dictionary), sd.indices)

    test_name = pc.coalesce(fm("test_name"),
                            pc.struct_field(dig, "test_name"))
    ttype = pc.if_else(dig_ok, pa.scalar("DIG"), fm("ttype"))

    measurement = _cast_f64(fm("measurement"))

    # limit fields + signature, computed once per tail dictionary value
    d_nom = pc.struct_field(d3, "nom")
    d_ul = pc.coalesce(pc.struct_field(d2, "ul2"),
                       pc.struct_field(d3, "ul3"))
    d_ll = pc.coalesce(pc.struct_field(d2, "ll2"),
                       pc.struct_field(d3, "ll3"))
    d_sig = pc.binary_join_element_wise(
        pc.coalesce(d_nom, pa.scalar("")), pc.coalesce(d_ul, pa.scalar("")),
        pc.coalesce(d_ll, pa.scalar("")), "|",
    )
    # raw-string limit signature; null when the record carries no limits
    d_sig = pc.if_else(pc.or_(pc.is_valid(d_ul), pc.is_valid(d_nom)),
                       d_sig, null_str)
    null_f64 = pa.scalar(None, _F64)

    def lim_take(d_arr, cast=True):
        full = pc.take(_cast_f64(d_arr) if cast else d_arr, td.indices)
        return pc.if_else(ana_ok, full, null_f64 if cast else null_str)

    lim_nom = lim_take(d_nom)
    lim_ul = lim_take(d_ul)
    lim_ll = lim_take(d_ll)
    lim_sig = lim_take(d_sig, cast=False)

    start_ts = pc.if_else(
        hdr_ok, _strptime12(pc.struct_field(hdr, "start")),
        pc.if_else(end_ok, _strptime12(pc.struct_field(end, "end")),
                   pa.scalar(None, _TS)),
    )
    board_index = pc.cast(pc.struct_field(hdr, "board_index"), pa.int32())

    cols = {
        "record_type": record_type,
        "serial": pc.struct_field(hdr, "serial"),
        "panel_serial": pc.struct_field(hdr, "panel_serial"),
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


def parse_dataset(ds, batch_size: "int | None" = None):
    """read → parse: stateless tasks, zero-copy Arrow in/out (flagship S6).

    ``batch_size=None`` (default) keeps the upstream BLOCK granularity:
    a fixed 65k batch size silently COALESCED the override_num_blocks
    read split back down (measured: 21 fused tasks from 128 read blocks
    at sf0.1 — a parallelism cap that cost ~0.2 s of a 1.1 s pass-1).
    Regex vectorization is already saturated at ~10⁴-row blocks."""
    return ds.map_batches(
        parse_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
