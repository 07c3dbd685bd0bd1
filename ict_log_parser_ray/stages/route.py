"""Fan-out router: one parsed+ranked turn stream → per-sink Parquet outputs
(K1; reference export modes /root/reference/src/main.rs:1269-1319).

Sink assignment is a single-label partition of all rows (FIXTURES.md
invariant 1: sink counts sum to total rows), priority order:

1. ``parse_error`` — unparseable/chatter turns (never crash the parser)
2. ``retest``      — rows of attempts that are not the board's first attempt
                     (the reference distinguishes first test vs retest
                     throughout: main.rs:712-748)
3. ``fail``        — first-attempt rows whose record status is fail
                     (ExportMode::FailuresOnly analog, main.rs:1284-1298)
4. ``measurement`` — remaining first-attempt analog rows (carry a
                     measurement + limits; the per-test series source, A8)
5. ``pass``        — everything else (first-attempt passing records)

The routed output is written as hive-partitioned Parquet
(``.../sink=<name>/``) in ONE streaming pass — resumable per partition,
never one giant file.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .join import attach_lookup

SINKS = ("pass", "fail", "retest", "measurement", "parse_error")

ATTEMPT_ATTACH_COLS = {
    "serial": "att_serial",
    "panel_serial": "att_panel_serial",
    "board_index": "att_board_index",
    "att_status": "att_status",
    "start_ts": "att_start_ts",
    "att_rank": "att_rank",
    "is_first": "is_first",
    "is_final": "is_final",
    "n_attempts": "n_attempts",
}


def attach_attempt_flags(parsed_ds, ranked_attempts_ds,
                         broadcast_threshold: int = 2_000_000):
    """Join per-attempt metadata (serial, first/final flags) onto every turn.

    This is the one place turn-level routing depends on cross-conversation
    state; the right side is the attempt table (~turns/40).
    """
    keep = ["conv_id"] + list(ATTEMPT_ATTACH_COLS)
    right = ranked_attempts_ds.select_columns(keep).map_batches(
        lambda t: t.rename_columns(
            ["conv_id"] + [ATTEMPT_ATTACH_COLS[c] for c in ATTEMPT_ATTACH_COLS]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    empty_schema = pa.schema([
        ("conv_id", pa.string()),
        ("att_serial", pa.string()),
        ("att_panel_serial", pa.string()),
        ("att_board_index", pa.int32()),
        ("att_status", pa.string()),
        ("att_start_ts", pa.int64()),
        ("att_rank", pa.int32()),
        ("is_first", pa.bool_()),
        ("is_final", pa.bool_()),
        ("n_attempts", pa.int32()),
    ])
    return attach_lookup(parsed_ds, right, on="conv_id",
                         broadcast_threshold=broadcast_threshold,
                         empty_schema=empty_schema)


def sink_array(batch: pa.Table) -> pa.Array:
    """Per-row sink assignment (priority: parse_error > retest > fail >
    measurement > pass) as a standalone array — callers that split a batch
    by sink can mask on this without appending a column first."""
    rt = batch["record_type"]
    is_err = pc.equal(rt, "parse_error")
    is_retest = pc.and_kleene(
        pc.invert(pc.fill_null(batch["is_first"], True)), pc.invert(is_err)
    )
    is_fail = pc.equal(pc.fill_null(batch["status"], "unknown"), "fail")
    is_analog = pc.equal(rt, "analog")
    return pc.if_else(
        is_err, pa.scalar("parse_error"),
        pc.if_else(pc.fill_null(is_retest, False), pa.scalar("retest"),
                   pc.if_else(is_fail, pa.scalar("fail"),
                              pc.if_else(is_analog, pa.scalar("measurement"),
                                         pa.scalar("pass")))),
    )


def add_sink_column(batch: pa.Table) -> pa.Table:
    return batch.append_column("sink", sink_array(batch))


def route_dataset(flagged_ds):
    return flagged_ds.map_batches(add_sink_column, batch_format="pyarrow",
                                  zero_copy_batch=True)


def write_sinks(routed_ds, out_dir: str):
    """Single-pass hive-partitioned write: ``out_dir/sink=<name>/*.parquet``."""
    routed_ds.write_parquet(out_dir, partition_cols=["sink"])


def sink_counts(routed_ds):
    """Per-sink row counts (the driver-checked routing aggregate).

    Pre-aggregated: per-batch value_counts (5 rows/batch) → tiny groupby —
    never shuffles the turn stream by sink.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b["sink"].combine_chunks()
                             if isinstance(b["sink"], pa.ChunkedArray)
                             else b["sink"])
        return pa.table({"sink": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partial = routed_ds.map_batches(_partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return partial.groupby("sink").aggregate(Sum("n", alias_name="n"))
