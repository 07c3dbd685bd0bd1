"""Sequential pure-Python parity reference (SURVEY.md §5.2).

Mirrors the reference application's sequential semantics — push file by file
into an in-memory store, first/last-attempt rules from
/root/reference/src/main.rs:712-748 and main.rs:1205 — in plain Python over
the same transcripts table.  The Ray pipeline must match this module exactly;
pytest compares them on the seeded fixture.  Only ever run at tiny scale.
"""

from __future__ import annotations

import re
from collections import defaultdict
from datetime import datetime

HEADER = re.compile(
    r"^\{@BTEST\|(?P<serial>[^|}]+)\|(?P<status>\d{2})\|(?P<start>\d{12})\|"
    r"(?P<board_index>\d+)\|(?P<panel_serial>[^|}]+)\}")
ANALOG = re.compile(
    r"^\{@A-(?P<ttype>[A-Z]+)\|(?P<status>\d{2})\|(?P<measurement>[^|}]+)\|"
    r"(?P<test_name>[^|}]+)\}"
    r"(?:\{@LIM2\|(?P<ul2>[^|}]+)\|(?P<ll2>[^|}]+)\}"
    r"|\{@LIM3\|(?P<nom>[^|}]+)\|(?P<ul3>[^|}]+)\|(?P<ll3>[^|}]+)\})?$")
DIGITAL = re.compile(r"^\{@D-T\|(?P<status>\d{2})\|(?P<test_name>[^|}]+)\}$")
END = re.compile(r"^\{@BTEST-END\|(?P<status>\d{2})\|(?P<end>\d{12})\}$")


def _status(code):
    return {"00": "pass", "01": "fail"}.get(code, "unknown")


def _ts12(s):
    return datetime.strptime(s, "%y%m%d%H%M%S")


def parse_row(text):
    m = HEADER.match(text)
    if m:
        return dict(record_type="header", serial=m["serial"],
                    status=_status(m["status"]), start=_ts12(m["start"]),
                    board_index=int(m["board_index"]),
                    panel_serial=m["panel_serial"])
    m = ANALOG.match(text)
    if m:
        nom, ul, ll = m["nom"], m["ul2"] or m["ul3"], m["ll2"] or m["ll3"]
        sig = None
        if ul is not None or nom is not None:
            sig = f"{nom or ''}|{ul or ''}|{ll or ''}"
        return dict(record_type="analog", status=_status(m["status"]),
                    test_name=m["test_name"], ttype=m["ttype"],
                    measurement=float(m["measurement"]),
                    lim_nom=float(nom) if nom else None,
                    lim_ul=float(ul) if ul else None,
                    lim_ll=float(ll) if ll else None, lim_sig=sig)
    m = DIGITAL.match(text)
    if m:
        return dict(record_type="digital", status=_status(m["status"]),
                    test_name=m["test_name"], ttype="DIG")
    m = END.match(text)
    if m:
        return dict(record_type="btest_end", status=_status(m["status"]),
                    end=_ts12(m["end"]))
    return dict(record_type="parse_error")


def run_reference(tbl) -> dict:
    """transcripts pyarrow.Table → all expected aggregates (plain dicts)."""
    rows = tbl.to_pylist()

    # D1 exact dedup, deterministic key-ordered first-wins
    seen, deduped = set(), []
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        k = (r["conv_id"], r["turn_idx"])
        if k in seen:
            continue
        seen.add(k)
        r = dict(r, **parse_row(r["text"]))
        deduped.append(r)

    # attempt metadata per conv
    convs = defaultdict(list)
    for r in deduped:
        convs[r["conv_id"]].append(r)
    attempts = {}
    for cid, rs in convs.items():
        a = dict(conv_id=cid, serial=None, panel_serial=None, board_index=None,
                 start=None, end=None, att_status=None, tool=rs[0]["tool"])
        for r in rs:
            if r["record_type"] == "header":
                a["serial"] = r["serial"]
                a["panel_serial"] = r["panel_serial"]
                a["board_index"] = r["board_index"]
                a["start"] = r["start"] if a["start"] is None else min(a["start"], r["start"])
            elif r["record_type"] == "btest_end":
                a["att_status"] = r["status"]
                a["end"] = r["end"]
        attempts[cid] = a

    # rank within serial by (start, conv_id)
    by_serial = defaultdict(list)
    for a in attempts.values():
        by_serial[a["serial"]].append(a)
    for serial, lst in by_serial.items():
        lst.sort(key=lambda a: (a["start"], a["conv_id"]))
        for i, a in enumerate(lst):
            a["att_rank"], a["n_attempts"] = i, len(lst)
            a["is_first"], a["is_final"] = i == 0, i == len(lst) - 1

    # sinks (route priority: parse_error > retest > fail > measurement > pass)
    sink_counts = defaultdict(int)
    for r in deduped:
        a = attempts[r["conv_id"]]
        if r["record_type"] == "parse_error":
            s = "parse_error"
        elif not a["is_first"]:
            s = "retest"
        elif r.get("status") == "fail":
            s = "fail"
        elif r["record_type"] == "analog":
            s = "measurement"
        else:
            s = "pass"
        sink_counts[s] += 1

    def yield3(items, ok_fn, first_fn, final_fn):
        out = {}
        for phase in ("first", "final", "all"):
            sel = [x for x in items
                   if (phase == "all") or (phase == "first" and first_fn(x))
                   or (phase == "final" and final_fn(x))]
            ok = sum(1 for x in sel if ok_fn(x))
            out[phase] = (ok, len(sel) - ok)
        return out

    # A1 single-board yields
    ys = yield3(list(attempts.values()),
                lambda a: a["att_status"] == "pass",
                lambda a: a["is_first"], lambda a: a["is_final"])

    # A2 panel yields: runs keyed (panel_serial, att_rank)
    runs = defaultdict(list)
    for a in attempts.values():
        runs[(a["panel_serial"], a["att_rank"])].append(a)
    run_items = []
    for (ps, rank), lst in runs.items():
        n_runs = max(a["n_attempts"] for a in lst)
        run_items.append(dict(
            panel_serial=ps, rank=rank,
            ok=all(a["att_status"] == "pass" for a in lst),
            is_first=rank == 0, is_final=rank == n_runs - 1))
    ym = yield3(run_items, lambda x: x["ok"],
                lambda x: x["is_first"], lambda x: x["is_final"])

    # A3 Pareto under 3 modes
    paretos = {}
    for mode in ("first_pass", "all", "after_retest"):
        per_test = defaultdict(lambda: [0, set()])
        for r in deduped:
            if r["record_type"] not in ("analog", "digital"):
                continue
            if r.get("status") != "fail":
                continue
            a = attempts[r["conv_id"]]
            if mode == "first_pass" and not a["is_first"]:
                continue
            if mode == "after_retest" and not a["is_final"]:
                continue
            e = per_test[r["test_name"]]
            e[0] += 1
            e[1].add(a["serial"])
        paretos[mode] = {
            t: {"total": v[0], "n_boards": len(v[1])}
            for t, v in per_test.items()}

    # A4 hourly (attempt granularity, keyed by packed YYMMDDHH of start)
    hourly = defaultdict(lambda: [0, 0])
    by_hour = defaultdict(list)
    for a in attempts.values():
        s = a["start"]
        key = (s.year % 100) * 1_000_000 + s.month * 10_000 + s.day * 100 + s.hour
        if a["att_status"] == "pass":
            hourly[key][0] += 1
        else:
            hourly[key][1] += 1
        by_hour[key].append(a)
    # A4 full shape: ordered per-hour result chain (daily_yield.rs:91)
    hourly_chain = {}
    for key, lst in by_hour.items():
        lst.sort(key=lambda a: (a["start"], a["serial"]))
        hourly_chain[key] = ";".join(
            f"{a['att_status'] or 'unknown'},{a['start'].strftime('%M:%S')},"
            f"{a['serial']}" for a in lst)

    # A6 limit changes (raw-string signatures)
    sigs = defaultdict(set)
    for r in deduped:
        if r["record_type"] == "analog" and r.get("lim_sig"):
            sigs[r["test_name"]].add(r["lim_sig"])
    limit_changes = sorted(t for t, s in sigs.items() if len(s) > 1)

    # A7 failed boards (final attempt failing): serial → failed test names
    failed_boards = {}
    for a in attempts.values():
        if a["is_final"] and a["att_status"] == "fail":
            names = sorted({r["test_name"] for r in convs[a["conv_id"]]
                            if r["record_type"] in ("analog", "digital")
                            and r.get("status") == "fail"})
            failed_boards[a["conv_id"]] = dict(
                serial=a["serial"], failed_tests=",".join(names))

    # A9 testlist
    testlist = sorted({r["test_name"] for r in deduped
                       if r["record_type"] in ("analog", "digital")})

    return dict(
        n_rows=len(rows), n_deduped=len(deduped),
        sink_counts=dict(sink_counts),
        yields_sb=ys, yields_mb=ym, paretos=paretos,
        hourly={k: tuple(v) for k, v in hourly.items()},
        hourly_chain=hourly_chain,
        limit_changes=limit_changes, failed_boards=failed_boards,
        testlist=testlist, n_attempts=len(attempts),
    )
