"""Top-k token vocabulary over a text column — the classic vocab-building
pass of a training-data pipeline.

Per-batch top-k partials are NOT sound here (a token just below k in
every batch can still be global top-k), so the exact shape is:

1. per-batch partial: split + count tokens (bounded by the batch's
   distinct-token vocabulary, not its rows), tag each token with
   ``hash(token) % nparts`` — the narrow stream ships (token, count,
   part) only;
2. ``nparts`` partition tasks: every occurrence of a token lands in
   exactly one partition, so a per-partition sum + top-k candidate cut
   is EXACT — each task returns only k rows;
3. driver finish: merge nparts × k candidates, final (count desc,
   token asc) sort, head(k).

At cluster scale step 2's scan-and-filter becomes a real hash shuffle of
the (token, count) stream; the candidate cut keeps the driver merge at
O(nparts × k) regardless of vocabulary size.
"""

from __future__ import annotations
from ..blocks import ncpus as _ncpus

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


@ray.remote
def _vocab_part(p: int, refs, k: int) -> pa.Table:
    # zero-row input blocks skip the partial UDF entirely and surface
    # here with the ORIGINAL dataset schema (no "part" column) — drop them
    tbls = [t.filter(pc.equal(t["part"], p)) for t in ray.get(refs)
            if "part" in t.schema.names]
    if not tbls:
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    t = pa.concat_tables(tbls).combine_chunks()
    if t.num_rows == 0:
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    df = (t.select(["token", "c"]).to_pandas()
          .groupby("token", as_index=False)["c"].sum()
          .rename(columns={"c": "n"}))
    df = df.sort_values(["n", "token"], ascending=[False, True],
                        kind="stable").head(k)
    return pa.table({"token": pa.array(df["token"], pa.string()),
                     "n": pa.array(df["n"].to_numpy(), pa.int64())})


def top_tokens(ds, text_col: str, k: int = 20,
               nparts: int | None = None) -> pd.DataFrame:
    """Exact global top-``k`` whitespace tokens by count, ties broken by
    token ascending.  Returns the small (k-row) result as pandas."""
    if nparts is None:
        ncpu = _ncpus()
        nparts = max(4, min(ncpu, 32))

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df[text_col].fillna("").str.split().explode().dropna()
        vc = toks.value_counts()
        tokens = vc.index.to_series().reset_index(drop=True)
        part = (pd.util.hash_pandas_object(tokens, index=False).to_numpy()
                % np.uint64(nparts)).astype("int64")
        # explicit arrow types: an all-empty/null-text block would
        # otherwise emit an OBJECT-dtype empty column that converts to
        # arrow `null` and breaks pa.concat_tables in _vocab_part
        return pa.table({"token": pa.array(tokens, pa.string()),
                         "c": pa.array(vc.to_numpy().astype("int64"),
                                       pa.int64()),
                         "part": pa.array(part, pa.int64())})

    narrow = ds.map_batches(partial, batch_format="pandas").materialize()
    refs = narrow.to_arrow_refs()
    cands = pa.concat_tables(ray.get(
        [_vocab_part.remote(p, refs, k) for p in range(nparts)]))
    out = (cands.to_pandas()
           .sort_values(["n", "token"], ascending=[False, True],
                        kind="stable").head(k).reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out
