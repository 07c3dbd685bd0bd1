"""Unit tests for packed-time codecs and shift/day windows (M8-M10)."""

from datetime import datetime

import pyarrow as pa

from ict_log_parser_ray.functions.timecodes import (day_window, hour_key,
                                                    hour_key_to_str,
                                                    shift_window)


def test_hour_key_packing():
    ts = pa.array([datetime(2026, 1, 5, 6, 46, 26),
                   datetime(2026, 12, 31, 23, 0, 0), None],
                  pa.timestamp("us"))
    assert hour_key(ts).to_pylist() == [26010506, 26123123, None]


def test_hour_key_to_str():
    assert hour_key_to_str(26010506) == "26.01.05 06:00 - 07:00"
    assert hour_key_to_str(26123123) == "26.12.31 23:00 - 00:00"


def test_shift_windows_cross_midnight():
    # morning shift
    s, e = shift_window(datetime(2026, 1, 5, 9, 30))
    assert (s, e) == (datetime(2026, 1, 5, 6), datetime(2026, 1, 5, 14))
    # afternoon shift
    s, e = shift_window(datetime(2026, 1, 5, 14, 0))
    assert (s, e) == (datetime(2026, 1, 5, 14), datetime(2026, 1, 5, 22))
    # night shift, before midnight
    s, e = shift_window(datetime(2026, 1, 5, 23, 0))
    assert (s, e) == (datetime(2026, 1, 5, 22), datetime(2026, 1, 6, 6))
    # night shift, after midnight → started yesterday 22:00
    s, e = shift_window(datetime(2026, 1, 6, 2, 0))
    assert (s, e) == (datetime(2026, 1, 5, 22), datetime(2026, 1, 6, 6))


def test_day_window():
    s, e = day_window(datetime(2026, 1, 5, 15, 0))
    assert (s, e) == (datetime(2026, 1, 5, 6), datetime(2026, 1, 6, 6))
