"""Distributed exact quantiles over discrete-valued columns.

The scale-safe percentile shape for bounded-cardinality values (token
counts, lengths, ratings, bucketed latencies): each batch emits a
(value, count) histogram partial — bounded by the number of DISTINCT
values, not rows — and the driver merges the tiny partial stream and
reads the quantiles off the cumulative histogram.  100 TB of rows with
10^4 distinct values shuffles ~10^4-row partials per block and nothing
else.  For genuinely continuous columns use a fixed-width binned
histogram (approximate, same shape) or a mergeable sketch (t-digest);
the exact-histogram path is the oracle-checkable baseline.

Quantile semantics match DuckDB's ``quantile_disc``: the q-quantile of n
sorted values v[1..n] is v[ceil(q·n)] (1-indexed) — verified empirically
and pinned by the e2e oracle test.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def histogram_quantiles(ds, column: str, qs: dict[str, float]) -> pa.Table:
    """One-row table: ``n`` (count) + one int64 column per entry of
    ``qs`` (name → quantile in (0, 1]), computed exactly from merged
    per-batch value-count histograms.  ``column`` must be integer-valued
    (discrete); nulls are excluded from the population."""

    def partial(b: pa.Table) -> pa.Table:
        col = b[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(pc.drop_null(col))
        return pa.table({"v": pc.cast(vc.field("values"), pa.int64()),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    parts = pa.concat_tables(ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs()))
    hist = (parts.to_pandas().groupby("v", as_index=False)["c"].sum()
            .sort_values("v", kind="stable"))
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum().to_numpy()
    vals = hist["v"].to_numpy()
    out = {"n": pa.array([n], pa.int64())}
    for name, q in qs.items():
        if n == 0:
            out[name] = pa.nulls(1, pa.int64())
            continue
        rank = min(max(math.ceil(q * n), 1), n)
        out[name] = pa.array(
            [int(vals[int(np.searchsorted(cum, rank, side="left"))])],
            pa.int64())
    return pa.table(out)
