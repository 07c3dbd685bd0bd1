"""Block-collection helpers around Ray's zero-row pass-through trap.

Ray passes ZERO-ROW input blocks through ``map_batches`` WITHOUT calling
the UDF, so a schema-reshaping stage's output can contain blocks that
still carry the UPSTREAM schema (or even arrive unconverted as pandas
when the source was ``from_pandas``).  Any driver-side
``pa.concat_tables(ray.get(...))`` over such output must drop those
blocks — they carry no rows by construction — or the concat raises on
the first tiny/filtered input whose forced block count exceeds its row
count.  (Measured repeatedly in rounds 2-3; see CLAUDE.md.)
"""

from __future__ import annotations

import pyarrow as pa


def ncpus(default: int = 8) -> int:
    """Total cluster CPUs — ``cluster_resources()``, NOT
    ``available_resources()``: the available figure fluctuates with
    in-flight work, so task/partition counts derived from it changed
    from run to run (measured: the chained-join unhit-partition
    flakiness came and went with transient load).  Work SHAPES must be
    deterministic per session — size from total capacity and let Ray
    queue the excess."""
    import ray

    if not ray.is_initialized():
        return default
    return int(ray.cluster_resources().get("CPU", default)) or default


def arrow_refs(ds) -> list:
    """``to_arrow_refs()`` without the lazy-Dataset DOUBLE EXECUTION:
    calling ``to_arrow_refs()`` on a lazy Dataset executes the plan and
    then runs a SECOND ``limit=1`` execution for the schema peek —
    measured re-running every map task on a 4-block input (and one full
    task wave on larger ones).  ``materialize()`` first; on an
    already-materialized Dataset this is a no-op and the refs come
    straight off the pinned blocks."""
    from ray.data.dataset import MaterializedDataset

    if not isinstance(ds, MaterializedDataset):
        ds = ds.materialize()
    return ds.to_arrow_refs()


def shaped_tables(refs_or_ds, required_col: str) -> list[pa.Table]:
    """ray.get + keep only blocks the UDF actually shaped (identified by
    ``required_col`` being present)."""
    import ray

    refs = refs_or_ds if isinstance(refs_or_ds, list) \
        else arrow_refs(refs_or_ds)
    return [t for t in ray.get(refs)
            if isinstance(t, pa.Table) and required_col in t.schema.names]


def tagged_tables(refs, p: int) -> list[pa.Table]:
    """Blocks of hash partition ``p`` from tagged block refs — the
    canonical gather for the narrow-tag + partition-task shape.  Ray
    passes ZERO-ROW input blocks through ``map_batches`` WITHOUT calling
    the tagging UDF (the documented trap above), so a block can surface
    with the ORIGINAL schema (no "part" column) — or even unconverted
    (pandas) when the source was ``from_pandas``.  Those carry no rows
    by construction; skip them instead of raising KeyError."""
    import pyarrow.compute as pc
    import ray

    return [t.filter(pc.equal(t["part"], p))
            for t in ray.get(refs)
            if isinstance(t, pa.Table) and "part" in t.schema.names]


def split_arrow_ds(df, min_rows_per_block: int = 8):
    """Driver-collected DataFrame → multi-block ARROW Dataset.

    Two measured traps motivate this helper (see CLAUDE.md):
    - a single ``from_pandas`` block SERIALIZES all downstream per-block
      work into one task (the minhash-verify lesson), so split into up
      to 2×CPU blocks but keep ≥ ``min_rows_per_block`` rows per block
      (tiny blocks pay more task scheduling than compute);
    - PANDAS blocks feeding Ray's native ``Dataset.join`` break when two
      joins chain lazily (HashShuffleAggregator.finalize raises
      ArrowInvalid "No match or multiple matches for key field" — Ray
      2.49.2, reproduced minimally), so emit ARROW blocks.
    """
    import ray
    import ray.data as rd
    import numpy as np

    ncpu = ncpus()
    nblk = max(1, min(2 * ncpu, -(-len(df) // min_rows_per_block)))
    return rd.from_arrow(
        [pa.Table.from_pandas(part, preserve_index=False)
         for part in np.array_split(df, nblk)])


def ensure_min_blocks(ds, rows_per_block: int = 512):
    """Materialize ``ds`` and split it so per-block work parallelizes —
    a single-block ``from_arrow`` input serializes every downstream map
    into one task (the minhash-verify lesson; measured again on the
    incremental probe: a 10k-doc single-block batch ran its signature
    explode serially at 2.8 s where the same work splits to ~0.3 s).
    Up to 2×CPU blocks, ≥ ``rows_per_block`` rows each.  Intended for
    BATCH-sized inputs (it pins the rows in the object store) — never
    call it on a full-corpus lineage."""
    import ray
    from ray.data.dataset import MaterializedDataset

    if not isinstance(ds, MaterializedDataset):
        ds = ds.materialize()
    nrows = ds.count()
    nblk = max(1, min(2 * ncpus(), -(-nrows // rows_per_block)))
    need = ds.num_blocks() < nblk
    if not need and nblk > 1:
        # block COUNT alone misses skew: ten blocks where one holds
        # ~all rows still serializes the downstream map on the fat
        # block — check the max block size too (tiny remote counts,
        # never pulls the tables to the driver)
        @ray.remote
        def _n(t) -> int:
            return t.num_rows if hasattr(t, "num_rows") else len(t)

        mx = max(ray.get([_n.remote(r) for r in ds.to_arrow_refs()]),
                 default=0)
        need = mx > 2 * -(-nrows // nblk)
    if need:
        ds = ds.repartition(nblk).materialize()
    return ds


def concat_shaped(refs_or_ds, required_col: str,
                  empty_schema: "pa.Schema | None" = None) -> pa.Table:
    """Concat of the shaped blocks; on a fully-empty input returns
    ``empty_schema.empty_table()`` (required then — a raise is better
    than a silent wrong-schema result)."""
    ts = shaped_tables(refs_or_ds, required_col)
    if ts:
        return pa.concat_tables(ts)
    if empty_schema is None:
        raise ValueError(
            f"no blocks carry column {required_col!r} (fully-empty "
            "input?) and no empty_schema fallback was provided")
    return empty_schema.empty_table()
