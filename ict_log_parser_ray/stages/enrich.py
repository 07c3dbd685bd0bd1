"""Enrichment stage: tool → station/product/line broadcast lookup (ST2/J1).

The reference loads a small Product config once and consults it per run
(/root/reference/src/main.rs:31,364,627-629).  Here the small side is
broadcast: the driver ``ray.put``s the lookup table once; each actor in the
pool fetches it in ``__init__`` (once per actor, NOT per batch) and does a
vectorized ``index_in``+``take`` dictionary lookup per batch.  No shuffle.

Unknown tools (present in transcripts, absent from the lookup) yield nulls —
they must not fail the pipeline (FIXTURES.md §2).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

ENRICH_COLS = ("station", "product", "line")


class ToolMetaEnricher:
    """Actor-pool callable for ``map_batches(ToolMetaEnricher, ...)``."""

    def __init__(self, meta_ref):
        meta = ray.get(meta_ref) if isinstance(meta_ref, ray.ObjectRef) else meta_ref
        if isinstance(meta, pa.Table):
            tbl = meta.combine_chunks()
        else:  # dict of lists
            tbl = pa.table(meta)
        self._tools = tbl["tool"].combine_chunks() if isinstance(tbl["tool"], pa.ChunkedArray) else tbl["tool"]
        self._cols = {c: tbl[c] for c in ENRICH_COLS}

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["tool"], value_set=self._tools)
        for name in ENRICH_COLS:
            batch = batch.append_column(name, pc.take(self._cols[name], idx))
        return batch


def enrich_dataset(ds, tool_meta: pa.Table,
                   batch_size: "int | None" = None):
    """Attach station/product/line columns via a broadcast lookup inside
    STATELESS map tasks (``ray.put`` once; each task's ``ray.get`` is a
    zero-copy plasma read).

    This stage's only per-worker state is the broadcast table itself, so an
    actor pool buys nothing here and costs real things: per-actor process
    spawns at every pool grow step and a task/actor operator boundary that
    blocks whole-pipeline fusion (measured: the streaming pass-2 chain
    read→parse→enrich→route fused into one stateless operator runs with
    none of the actor-pool ramp-up stalls).  Stages with genuinely
    expensive ``__init__`` (model load, signature matrices — see
    functions/dedup_docs.py, functions/multimodal.py) stay actor pools.
    ``ToolMetaEnricher`` remains for callers that want the actor form.
    """
    tbl = tool_meta.combine_chunks()
    ref = ray.put(tbl)

    def _enrich(batch: pa.Table) -> pa.Table:
        meta = ray.get(ref)
        tools = meta["tool"]
        if isinstance(tools, pa.ChunkedArray):
            tools = tools.combine_chunks()
        idx = pc.index_in(batch["tool"], value_set=tools)
        for name in ENRICH_COLS:
            batch = batch.append_column(name, pc.take(meta[name], idx))
        return batch

    return ds.map_batches(_enrich, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)
