"""Packed-time codecs (M10; /root/reference/src/main.rs:140-154,
daily_yield.rs:10-17) and shift/day window derivation (M8/M9;
main.rs:561-596, daily_yield.rs:203-214).

The engine normalizes everything to ``timestamp[us]`` at parse time and
derives packed forms (``yymmddhh`` hour keys) only at aggregate/report
edges — SURVEY.md §1.2/§7.
"""

from __future__ import annotations

from datetime import datetime, time, timedelta

import pyarrow as pa
import pyarrow.compute as pc


def hour_key(ts: pa.Array) -> pa.Array:
    """timestamp[us] → packed int64 YYMMDDHH (u64_to_timeframe analog).

    Year digits are year % 100 (like strftime %y and the pandas fast
    path) — year-2000 would go negative for pre-2000 timestamps."""
    yr = pc.year(ts)
    y = pc.subtract(yr, pc.multiply(pc.divide(yr, 100), 100))
    out = pc.add(
        pc.add(pc.multiply(pc.cast(y, pa.int64()), 1_000_000),
               pc.multiply(pc.cast(pc.month(ts), pa.int64()), 10_000)),
        pc.add(pc.multiply(pc.cast(pc.day(ts), pa.int64()), 100),
               pc.cast(pc.hour(ts), pa.int64())),
    )
    return pc.if_else(pc.is_valid(ts), out, pa.scalar(None, pa.int64()))


def hour_key_to_str(key: int) -> str:
    """Packed YYMMDDHH → 'YY.MM.DD HH:00 - HH:00' display frame
    (u64_to_timeframe, main.rs:140-154)."""
    h = key % 100
    d = key // 100 % 100
    m = key // 10_000 % 100
    y = key // 1_000_000
    return f"{y:02}.{m:02}.{d:02} {h:02}:00 - {(h + 1) % 24:02}:00"


SHIFTS = ((time(6), time(14)), (time(14), time(22)), (time(22), time(6)))


def shift_window(now: datetime):
    """Current shift bounds 06-14 / 14-22 / 22-06, cross-midnight handled
    (M8; main.rs:561-596)."""
    t = now.time()
    if time(6) <= t < time(14):
        start = datetime.combine(now.date(), time(6))
        end = datetime.combine(now.date(), time(14))
    elif time(14) <= t < time(22):
        start = datetime.combine(now.date(), time(14))
        end = datetime.combine(now.date(), time(22))
    elif t >= time(22):
        start = datetime.combine(now.date(), time(22))
        end = datetime.combine(now.date() + timedelta(days=1), time(6))
    else:  # 00:00-06:00 → shift started yesterday 22:00
        start = datetime.combine(now.date() - timedelta(days=1), time(22))
        end = datetime.combine(now.date(), time(6))
    return start, end


def day_window(report_day: datetime):
    """Report day = D 06:00 → D+1 06:00 (M9; daily_yield.rs:203-214)."""
    start = datetime.combine(report_day.date(), time(6))
    return start, start + timedelta(days=1)
