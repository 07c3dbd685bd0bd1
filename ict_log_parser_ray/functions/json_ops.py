"""Semi-structured (JSON) column extraction — vectorized, no row loops.

Log/event tables routinely carry a free-form JSON ``props`` column; the
pipeline-side primitive is "extract field X, typed, null on absent or
malformed" applied inside ``map_batches``.  polars' json_path_match is
a vectorized (Rust) JSONPath evaluator, so the hot path stays off the
Python interpreter; malformed JSON and missing paths yield null, never
an exception (SQL json_extract semantics).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc


def json_field(arr, path: str) -> pa.Array:
    """Extract JSONPath ``path`` (e.g. ``$.k``) from a string column →
    string array, null where the row is null/malformed/missing-path."""
    if "polars" not in sys.modules:
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pl.from_arrow(arr).str.json_path_match(path).to_arrow()
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return pc.cast(out, pa.string())


def json_int_field(arr, path: str) -> pa.Array:
    """`json_field` then a safe int64 cast (null on non-numeric).

    Fast path: one vectorized cast (valid for all-numeric batches, the
    overwhelmingly common shape).  A batch containing any non-numeric
    match falls back to nulling exactly the offending rows via a
    vectorized digit-pattern mask — still no Python row loop."""
    s = json_field(arr, path)
    try:
        return pc.cast(s, pa.int64())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        # bound the digit run to 18: a 19+-digit literal can overflow
        # int64 and the final cast would raise, breaking the null-on-
        # malformed contract.  (18 digits always fit; the few in-range
        # 19-digit values < 2^63 are nulled too — documented trade for a
        # loop-free exact bound.)
        ok = pc.match_substring_regex(s, r"^[+-]?\d{1,18}$")
        return pc.cast(pc.if_else(pc.fill_null(ok, False), s,
                                  pa.scalar(None, pa.string())),
                       pa.int64())
