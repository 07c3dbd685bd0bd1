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

import os

import pyarrow as pa

from ..fixtures import ensure_fixture
from ..sources.transcripts import read_transcripts
from ..stages.attempts import ranked_attempts
from ..stages.enrich import enrich_dataset
from ..stages.parse import parse_dataset
from ..stages.route import attach_attempt_flags, route_dataset, sink_counts
from . import reports


def _split_marked_dups(parsed_all):
    """Materialized parsed stream with ``is_dup_key`` marks → deduped stream.

    Rows with unique keys stream through a cheap zero-copy filter; the few
    collision rows (bounded like the dup-hash set) are collected once,
    deduped vectorized (deterministic key-ordered first-wins; copies are
    exact duplicates), and unioned back.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    def _clean(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(b["is_dup_key"])).drop_columns(["is_dup_key"])

    def _dups(b: pa.Table) -> pa.Table:
        return b.filter(b["is_dup_key"]).drop_columns(["is_dup_key"])

    clean = parsed_all.map_batches(_clean, batch_format="pyarrow",
                                   zero_copy_batch=True)
    coll = parsed_all.map_batches(_dups, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    tbl = pa.concat_tables(ray.get(coll.to_arrow_refs())).combine_chunks()
    df = (tbl.to_pandas().sort_values(["conv_id", "turn_idx"], kind="stable")
          .drop_duplicates(subset=["conv_id", "turn_idx"], keep="first"))
    deduped = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False, schema=tbl.schema))
    # no re-materialize: `clean` is a cheap filter over pinned blocks that
    # each consumer fuses into its own first map task
    return clean.union(deduped)


def build(transcripts_path, tool_meta: pa.Table | None = None,
          batch_size: int = 65_536, broadcast_threshold: int = 2_000_000,
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
    raw = read_transcripts(transcripts_path)
    dup_ref = None
    if dedup and materialize_intermediates:
        # marked-dedup fast path (2 source traversals total): pass A finds
        # duplicate key-hashes from a column-pruned read; the main pass just
        # MARKS rows (is_dup_key) so parse/enrich see every row once; the
        # split + collision dedup happens on the materialized output below.
        from ..stages.dedup import dup_hash_ref, mark_dup_keys
        key_ds = read_transcripts(transcripts_path,
                                  columns=["conv_id", "turn_idx"])
        dup_ref, _ndup = dup_hash_ref(key_ds, keys=("conv_id", "turn_idx"))
        if dup_ref is not None:
            raw = raw.map_batches(
                lambda b: mark_dup_keys(b, dup_ref, ("conv_id", "turn_idx")),
                batch_format="pyarrow", zero_copy_batch=True)
    elif dedup:
        # streaming path: 3 traversals, never holds collision rows on the
        # driver inside a lazy lineage
        from ..stages.dedup import exact_dedup_sparse
        key_ds = read_transcripts(transcripts_path,
                                  columns=["conv_id", "turn_idx"])
        raw = exact_dedup_sparse(raw, keys=("conv_id", "turn_idx"),
                                 num_buckets=dedup_buckets, key_ds=key_ds)
    _t = _tick("dedup pass A", _t)
    parsed = parse_dataset(raw, batch_size=batch_size)
    if enrich and tool_meta is not None:
        parsed = enrich_dataset(parsed, tool_meta, batch_size=batch_size)
    if materialize_intermediates:
        parsed = parsed.materialize()
        if dup_ref is not None:
            parsed = _split_marked_dups(parsed)
    _t = _tick("parse+enrich materialize", _t)
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
