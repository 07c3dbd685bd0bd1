"""Exact dedup stage (D1; reference ``push_from_file → false`` for re-pushed
logfiles, /root/reference/src/main.rs:293-296).

Strategy: **hash-partition + per-partition first-wins** — the scalable exact
dedup.  A ``dedup_bucket = hash(key) % B`` column hash-co-locates all copies
of a key, ``groupby(dedup_bucket)`` shuffles once, and inside each bucket a
vectorized pandas ``drop_duplicates`` keeps the first row under a
deterministic ``(conv_id, turn_idx)`` order (SURVEY.md §2.6 O2: we standardize
the reference's newest-first-wins quirk to deterministic key-ordered
first-wins; duplicates in the fixture are exact row copies so the choice is
value-identical).

Bucket count B bounds per-group size (B ≈ 2× input blocks); the groups the
shuffle sees are buckets, not keys, so a hot key cannot create a straggler
group larger than its bucket.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _add_bucket(batch: pa.Table, keys, num_buckets: int) -> pa.Table:
    from pandas.util import hash_pandas_object

    df = batch.select(keys).to_pandas()
    hv = hash_pandas_object(df, index=False).to_numpy()
    bucket = (hv % num_buckets).astype("int64")
    return batch.append_column("dedup_bucket", pa.array(bucket, pa.int64()))


def exact_dedup(ds, keys=("conv_id", "turn_idx"), num_buckets: int = 64):
    keys = list(keys)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, keys, num_buckets)

    def drop_dups(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        df = df.sort_values(keys, kind="stable").drop_duplicates(
            subset=keys, keep="first")
        out = pa.Table.from_pandas(df, preserve_index=False,
                                   schema=group.schema)
        return out.drop_columns(["dedup_bucket"])

    withb = ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
    return withb.groupby("dedup_bucket").map_groups(
        drop_dups, batch_format="pyarrow")
