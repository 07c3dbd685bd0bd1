"""Flagship pipeline: read → parse → enrich → rank attempts → route → sinks
+ yield-report aggregates (SURVEY.md §3.1 re-expressed Ray-Data-first).

The reference runs steps 4-5 of its manual-load path as a sequential
file-by-file parse into a global in-memory store, then six aggregate methods
over that store (/root/reference/src/main.rs:482-502, 416-429).  Here the
same lifecycle is one lazy Dataset lineage executed by the streaming
executor, with the attempt-level shuffle factored out once and reused by
routing and every aggregate.
"""

from __future__ import annotations
from ..blocks import ncpus as _ncpus

import os

import pyarrow as pa

from ..fixtures import ensure_fixture
from ..sources.transcripts import read_transcripts
from ..stages.attempts import ranked_attempts
from ..stages.enrich import enrich_dataset
from ..stages.parse import parse_dataset
from ..stages.route import attach_attempt_flags, route_dataset, sink_counts
from . import reports


def _dedup_pinned(parsed_all, keys=("conv_id", "turn_idx")):
    """Exact dedup entirely over PINNED parsed blocks — zero extra source
    reads (the expensive read+parse ran exactly once to materialize).

    1. narrow key-hash scan of the pinned blocks → duplicate-hash set via
       one driver np.unique (8 B/row; see stages.dedup for the scale bound);
    2. no dups → stream through untouched;
    3. else: rows with unique keys pass a cheap membership filter that each
       consumer fuses into its first map task; the few collision rows are
       collected once, deduped vectorized (deterministic key-ordered
       first-wins; copies are exact duplicates), and unioned back.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    import numpy as np

    # duplicate-hash set from the precomputed kh column: zero-copy narrow
    # scan, one driver np.unique.  Zero-row input blocks skip every map
    # UDF (including parse/add_key_hash) and surface with the RAW source
    # schema — drop them before the concat.
    khs = parsed_all.map_batches(lambda b: b.select(["kh"]),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    from ..stages.dedup import dup_values
    kb = [t.select(["kh"]) for t in ray.get(khs.to_arrow_refs())
          if isinstance(t, pa.Table) and "kh" in t.schema.names]
    hv = pa.concat_tables(kb)["kh"].to_numpy() if kb \
        else np.empty(0, np.int64)
    dups = dup_values(hv)
    if len(dups) == 0:
        return parsed_all.map_batches(
            lambda b: b.drop_columns(["kh"]), batch_format="pyarrow",
            zero_copy_batch=True)
    dup_ref = ray.put(pa.array(dups, pa.int64()))

    keys = list(keys)

    def _clean(b: pa.Table) -> pa.Table:
        m = pc.invert(pc.is_in(b["kh"], value_set=ray.get(dup_ref)))
        return b.filter(m).drop_columns(["kh"])

    def _dups(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["kh"], value_set=ray.get(dup_ref))
                        ).drop_columns(["kh"])

    clean = parsed_all.map_batches(_clean, batch_format="pyarrow",
                                   zero_copy_batch=True)
    coll = parsed_all.map_batches(_dups, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    # same zero-row pass-through guard: keep only blocks the UDF shaped
    tbl = pa.concat_tables(
        [t for t in ray.get(coll.to_arrow_refs())
         if isinstance(t, pa.Table) and "record_type" in t.schema.names
         and "kh" not in t.schema.names]).combine_chunks()
    df = (tbl.to_pandas().sort_values(keys, kind="stable")
          .drop_duplicates(subset=keys, keep="first"))
    deduped = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False, schema=tbl.schema))
    return clean.union(deduped)


def build(transcripts_path, tool_meta: pa.Table | None = None,
          batch_size: "int | None" = None,
          broadcast_threshold: int = 2_000_000,
          enrich: bool = True, dedup: bool = True, dedup_buckets: int = 64,
          materialize_intermediates: bool = False,
          materialize_flagged: bool | None = None):
    """Construct the lazy pipeline pieces.

    Returns dict with Datasets: parsed, enriched, attempts (ranked),
    flagged (turns + attempt flags), routed (with sink column).
    Nothing is executed yet — consume what you need.

    ``materialize_intermediates=True`` pins the parsed turns and the (small)
    attempt table in the object store so several aggregates can fan out from
    them without re-running the upstream.  Use for multi-report runs at
    test/bench scale; at 100 TB prefer the single-pass
    ``run_to_sinks`` + aggregate-from-sinks flow instead.
    """
    import os as _os
    import sys as _sys
    import time as _time
    _verbose = _os.environ.get("ICT_BENCH_VERBOSE") == "1"

    def _tick(label, t0):
        if _verbose:
            print(f"[build] {label}: {_time.time() - t0:.2f}s",
                  file=_sys.stderr)
        return _time.time()

    _t = _time.time()
    # Split the read into ~1 block per CPU (Ray otherwise coalesces small
    # shard files into ~128MB read tasks, capping EVERY downstream fused
    # stage at that task count).  With batch_size=None each block is one
    # parse task AND one downstream block: the round-2 (4×CPU blocks,
    # 65k batch) setting silently re-coalesced 128 blocks into ~21 fused
    # tasks, and 128 pinned blocks made every downstream stage pay 4×
    # the task scheduling — interleaved A/B at sf0.1/32 CPUs: 1.7-2.0 s
    # vs 2.2-2.4 s full-pipeline wall.
    ncpu = _ncpus()
    num_blocks = max(32, ncpu)
    raw = read_transcripts(transcripts_path, override_num_blocks=num_blocks)
    if dedup and not materialize_intermediates:
        # streaming path: 3 source traversals, never holds collision rows on
        # the driver inside a lazy lineage
        from ..stages.dedup import exact_dedup_sparse
        key_ds = read_transcripts(transcripts_path,
                                  columns=["conv_id", "turn_idx"],
                                  override_num_blocks=num_blocks)
        raw = exact_dedup_sparse(raw, keys=("conv_id", "turn_idx"),
                                 key_ds=key_ds)
    parsed = parse_dataset(raw, batch_size=batch_size)
    if enrich and tool_meta is not None:
        parsed = enrich_dataset(parsed, tool_meta, batch_size=batch_size)
    if materialize_intermediates:
        # read+parse exactly ONCE; dedup runs afterwards as cheap scans of
        # the pinned blocks (parse/enrich over duplicate copies is harmless:
        # copies are exact and collapse in the split below).  The dedup key
        # hash is computed here, fused into the same pass.
        if dedup:
            from ..stages.dedup import add_key_hash_column
            parsed = parsed.map_batches(add_key_hash_column,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)
        parsed = parsed.materialize()
        _t = _tick("parse+enrich materialize", _t)
        if dedup:
            parsed = _dedup_pinned(parsed)
        _t = _tick("dedup over pinned blocks", _t)
    else:
        _t = _tick("parse+enrich (lazy)", _t)
    ranked = ranked_attempts(parsed, broadcast_threshold=broadcast_threshold)
    if materialize_intermediates:
        ranked = ranked.materialize()
    _t = _tick("attempts+rank", _t)
    flagged = attach_attempt_flags(parsed, ranked,
                                   broadcast_threshold=broadcast_threshold)
    if materialize_flagged is None:
        materialize_flagged = materialize_intermediates
    if materialize_flagged:
        flagged = flagged.materialize()
    routed = route_dataset(flagged)
    return {"parsed": parsed, "attempts": ranked, "flagged": flagged,
            "routed": routed}


def run_reports(pipe) -> dict:
    """Execute the six cached aggregates of the reference's update_stats
    (main.rs:416-429) over the pipeline.

    Two execution passes total: one collection of the (small) attempt table
    for A1/A2/A4, one combined scan of the turn stream for A3/A6/routing —
    semantics identical to the individual distributed reports (tested
    against them and the DuckDB oracles)."""
    small = reports.attempts_report_tables(pipe["attempts"])
    tm = reports.turn_metrics_combined(pipe["flagged"])
    return {
        "yields_sb": small["yields_sb"],
        "yields_mb": small["yields_mb"],
        "pareto_all": tm["paretos"]["all"],
        "pareto_after_retest": tm["paretos"]["after_retest"],
        "pareto_first_pass": tm["paretos"]["first_pass"],
        "hourly": small["hourly"],
        "limit_changes": tm["limit_changes"],
        "sink_counts": tm["sink_counts"],
    }


def flagship_for_sf(sf: float, seed: int = 42):
    """Fixture-backed flagship pipeline at a given scale factor."""
    import pyarrow.parquet as pq

    d = ensure_fixture(sf, seed)
    meta = pq.read_table(os.path.join(d, "tool_meta.parquet"))
    return build(os.path.join(d, "transcripts"), tool_meta=meta)
