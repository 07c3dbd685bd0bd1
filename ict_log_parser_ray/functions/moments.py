"""Grouped bivariate moments → exact Pearson correlation.

The moment vector (n, Σx, Σy, Σxy, Σx², Σy²) is the textbook mergeable
aggregation sketch: per-batch int64 partials (one arrow groupby per
batch, bounded by the group count), summed EXACTLY in the driver finish
with Python big ints — so the correlation is computed from exact sums,
not a float accumulation order.  corr is scale-invariant and |corr|≤1,
so a round-6 presentation reconciles with any SQL engine's streaming
double implementation (unlike variance, whose magnitude keeps ulp drift
above any fixed decimal rounding — don't oracle raw var/cov).

Caller contract: x and y are int64 columns small enough that per-batch
Σx², Σy², Σxy fit int64 (|x| ≤ 3e6 is safe for ≤ 500k-row batches);
overflow safety at 100 TB comes from the Python-int finish, not wider
per-batch types.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


_MOMS = ["n", "sx", "sy", "sxy", "sxx", "syy"]


def corr_partial_batch(b: pa.Table, key: str, xcol: str,
                       ycol: str) -> pa.Table:
    """Per-group moment partials for one batch (rows with a null x or y
    drop, matching SQL corr())."""
    valid = pc.and_(pc.is_valid(b[xcol]), pc.is_valid(b[ycol]))
    t = b.select([key, xcol, ycol])
    if not pc.all(valid).as_py():
        t = t.filter(valid)
    x = t[xcol].to_numpy(zero_copy_only=False).astype(np.int64)
    y = t[ycol].to_numpy(zero_copy_only=False).astype(np.int64)
    m = pa.table({
        key: t[key],
        "sx": pa.array(x), "sy": pa.array(y),
        "sxy": pa.array(x * y), "sxx": pa.array(x * x),
        "syy": pa.array(y * y),
    })
    return pa.TableGroupBy(m, key).aggregate(
        [(c, "sum") for c in _MOMS[1:]] + [([], "count_all")])


def corr_from_moments(n, sx, sy, sxy, sxx, syy) -> float | None:
    """Pearson r from EXACT (Python-int) sums; None when undefined."""
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if n < 2 or d1 <= 0 or d2 <= 0:
        return None
    return float(num) / math.sqrt(float(d1) * float(d2))


def grouped_corr(ds, key: str, xcol: str, ycol: str,
                 digits: int = 6) -> pd.DataFrame:
    """corr(x, y) per ``key`` group → (key, n, corr6) with corr rounded
    to ``digits``; groups where corr is undefined get NULL (SQL twin:
    round(corr(x, y), digits)).

    Contract edge: a group whose pairs are ALL null is omitted entirely
    (its rows never reach a partial), while SQL GROUP BY would emit
    (group, 0, NULL) — callers joining against a null-heavy column
    should outer-attach the group universe if they need those rows."""
    import ray

    refs = ds.map_batches(
        lambda b: corr_partial_batch(b, key, xcol, ycol),
        batch_format="pyarrow", zero_copy_batch=True).materialize().to_arrow_refs()
    parts = [t for t in ray.get(refs)
             if isinstance(t, pa.Table) and "count_all" in t.schema.names]
    if not parts:   # fully empty / all-null input: no groups
        return pd.DataFrame({key: pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             f"corr{digits}": pd.Series([],
                                                        dtype="float64")})
    df = pa.concat_tables(parts).to_pandas()
    sums = {c: f"{c}_sum" for c in _MOMS[1:]} | {"n": "count_all"}
    # object dtype → Python-int sums: EXACT regardless of magnitude
    for c in sums.values():
        df[c] = df[c].astype(object)
    fin = df.groupby(key, as_index=False, dropna=False)[
        list(sums.values())].sum()
    corr = [corr_from_moments(*(r[sums[c]] for c in _MOMS))
            for _, r in fin.iterrows()]
    return pd.DataFrame({
        key: fin[key],
        "n": fin["count_all"].astype("int64"),
        f"corr{digits}": pd.array(
            [math.nan if c is None else _round_half_away(c, digits)
             for c in corr], dtype="float64")})


def _round_half_away(x: float, digits: int) -> float:
    """SQL round() semantics (half away from zero); Python's round is
    half-even and would flip an exact .5 boundary vs a SQL oracle."""
    s = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s
