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
from ..blocks import ncpus as _ncpus

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


@ray.remote
def _gq_part(p: int, refs, key: str, val: str,
             qs: dict[str, float]) -> pa.Table:
    """Exact per-group disc quantiles for one hash partition: every row
    of a group lands here, so one lexsort + segment-offset indexing reads
    each group's quantiles off its sorted slice."""
    # zero-row input blocks skip the tagging UDF and surface with the
    # ORIGINAL schema (no "part" column) — or unconverted; drop them
    tbls = [t.filter(pc.equal(t["part"], p)) for t in ray.get(refs)
            if isinstance(t, pa.Table) and "part" in t.schema.names]
    t = pa.concat_tables(tbls).combine_chunks() if tbls else None
    cols = {key: pa.array([], t[key].type if t is not None and t.num_rows
                          else pa.string()),
            "n": pa.array([], pa.int64())}
    for name in qs:
        cols[name] = pa.array([], pa.float64())
    if t is None or t.num_rows == 0:
        return pa.table(cols)
    kdf = t.select([key, val]).to_pandas()
    codes, uniques = pd.factorize(kdf[key], sort=True)
    v = kdf[val].to_numpy().astype(np.float64)
    order = np.lexsort((v, codes))
    sc, sv = codes[order], v[order]
    b = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    n = np.diff(np.r_[b, len(sc)])
    out = {key: pa.array(uniques[sc[b]]),
           "n": pa.array(n, pa.int64())}
    for name, q in qs.items():
        rank = np.minimum(np.maximum(
            np.ceil(q * n).astype(np.int64), 1), n)
        out[name] = pa.array(sv[b + rank - 1], pa.float64())
    return pa.table(out)


def grouped_quantiles_partitioned(ds, key: str, val: str,
                                  qs: dict[str, float],
                                  nparts: int | None = None) -> pa.Table:
    """Exact per-group disc quantiles for CONTINUOUS values, where the
    histogram shape degenerates (distinct ≈ rows): hash-partition by
    group so each group's rows meet in one task, per-partition lexsort +
    segment indexing, tiny per-group result concat.  Quantile semantics
    match DuckDB ``quantile_disc`` (the returned number IS a data value,
    so the oracle comparison is exact — no float arithmetic).  Nulls in
    ``val`` are excluded, mirroring SQL aggregate semantics."""
    if nparts is None:
        ncpu = _ncpus()
        nparts = max(4, min(ncpu, 32))

    def tag(b: pa.Table) -> pa.Table:
        t = b.select([key, val]).combine_chunks()
        # drop null VALUES (SQL aggregate semantics) and null KEYS (a
        # null key would factorize to the -1 sentinel in _gq_part and
        # silently alias the last group; callers needing a null group
        # should fill_null to a sentinel key first)
        t = t.filter(pc.and_(pc.is_valid(t[val]), pc.is_valid(t[key])))
        kcol = t[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        part = (pd.util.hash_pandas_object(
            pd.Series(kcol.to_pandas()), index=False).to_numpy()
            % np.uint64(nparts)).astype("int64")
        return t.append_column("part", pa.array(part))

    narrow = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    refs = narrow.to_arrow_refs()
    parts = ray.get([_gq_part.remote(p, refs, key, val, qs)
                     for p in range(nparts)])
    parts = [t for t in parts if t.num_rows]
    if not parts:
        cols = {key: pa.array([], pa.string()),
                "n": pa.array([], pa.int64())}
        for name in qs:
            cols[name] = pa.array([], pa.float64())
        return pa.table(cols)
    return pa.concat_tables(parts).sort_by(key)


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

    from ..blocks import concat_shaped
    parts = concat_shaped(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).materialize(),
        "v", empty_schema=pa.schema([("v", pa.int64()),
                                     ("c", pa.int64())]))
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
