"""Multi-level grouped aggregation — GROUP BY ROLLUP / CUBE.

Per-batch arrow partials at the FINEST grouping only; every coarser
grouping set derives from the finest table in a driver finish (work ∝
grouping-set count × finest-group count — never a second pass over the
data, never one shuffle per level).  Measures must be int64-summable so
the level derivation is exact.

Scale shape: the stream reduces to |finest groups| rows before anything
leaves the workers, the same partial-combine contract as the report
aggregates (pipelines/reports.py).  A finest-group count too large for
the driver would switch to the distributed-groupby fallback documented
there; CUBE levels would then each be a groupby over the finest
Dataset — still never over the raw stream.
"""

from __future__ import annotations

from itertools import combinations

import pandas as pd
import pyarrow as pa


def _grouping_sets(keys: list[str], mode: str) -> list[tuple]:
    if mode == "rollup":
        return [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    if mode == "cube":
        out = []
        for r in range(len(keys), -1, -1):
            out += [tuple(c) for c in combinations(keys, r)]
        return out
    raise ValueError(f"mode must be rollup|cube, got {mode!r}")


def cube_aggregate(ds, keys: list[str], measures: list[str],
                   mode: str = "cube") -> pd.DataFrame:
    """SUM every ``measures`` column (int64) + row count ``n`` over every
    grouping set of ``keys`` (CUBE: all subsets; ROLLUP: prefixes), with
    non-grouped key columns NULL — row-for-row what SQL GROUP BY
    CUBE/ROLLUP emits (data-null keys group as values, dropna=False).
    """
    import ray

    mcols = [f"{m}_sum" for m in measures] + ["count_all"]

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(keys + measures)
        return pa.TableGroupBy(t, keys).aggregate(
            [(m, "sum") for m in measures] + [([], "count_all")])

    refs = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).materialize().to_arrow_refs()
    # zero-row input blocks skip the UDF and surface with the ORIGINAL
    # schema — they carry no partial columns and contribute nothing
    parts = [t for t in ray.get(refs)
             if isinstance(t, pa.Table) and "count_all" in t.schema.names]
    if not parts:   # fully empty input: emit only the all-NULL grand total
        return pd.DataFrame({**{k: [None] for k in keys},
                             **{m: pd.array([0], dtype="int64")
                                for m in measures},
                             "n": pd.array([0], dtype="int64")})
    df = pa.concat_tables(parts).to_pandas()
    finest = df.groupby(keys, as_index=False, dropna=False)[mcols].sum()

    levels = []
    for gs in _grouping_sets(keys, mode):
        if gs:
            sub = finest.groupby(list(gs), as_index=False,
                                 dropna=False)[mcols].sum()
        else:
            sub = finest[mcols].sum().to_frame().T
        for k in keys:
            if k not in gs:
                sub[k] = None
        levels.append(sub[keys + mcols])
    out = pd.concat(levels, ignore_index=True)
    out = out.rename(columns=dict(zip(mcols, measures + ["n"])))
    for m in measures + ["n"]:
        out[m] = out[m].astype("int64")
    return out
