"""Salted repartition for skewed groupby keys (north_rule requirement).

A hot key (a test name present in every attempt, a mega conversation)
concentrates one shuffle group on one reducer. ``salted_sum_counts`` runs the
canonical two-phase fix: add ``salt = row_position % n_salt``, aggregate on
``(key, salt)`` — the hot key's rows now land on up to ``n_salt`` reducers —
then merge the (tiny) per-salt partials with a second groupby on the key
alone.

Most flagship shuffles avoid skew structurally (per-batch partial combine
means groups reaching a shuffle are already one-row-per-key-per-batch — see
``attempts.py``/``reports.py``); this helper is for the cases that do ship
raw skewed rows to a groupby, e.g. distinct-test listing where Pareto test
names appear in ~every attempt.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Max, Sum


def salted_sum_counts(ds, key_cols, n_salt: int = 16, max_cols=()):
    """Per-key row counts (+ optional Max columns) via salted two-phase
    aggregation.  Returns Dataset(key_cols..., n, *max_cols)."""
    key_cols = list(key_cols)
    max_cols = list(max_cols)

    def add_salt(b: pa.Table) -> pa.Table:
        salt = np.arange(b.num_rows, dtype=np.int64) % n_salt
        t = b.select(key_cols + max_cols)
        t = t.append_column("salt", pa.array(salt, pa.int64()))
        return t.append_column("n", pa.array(np.ones(b.num_rows, np.int64)))

    salted = ds.map_batches(add_salt, batch_format="pyarrow",
                            zero_copy_batch=True)
    phase1 = salted.groupby(key_cols + ["salt"]).aggregate(
        Sum("n", alias_name="n"),
        *[Max(c, alias_name=c) for c in max_cols])
    return phase1.groupby(key_cols).aggregate(
        Sum("n", alias_name="n"),
        *[Max(c, alias_name=c) for c in max_cols])
