"""Weight-proportional sampling with EXACT integer priorities.

Training-data mixing needs "sample documents proportional to weight"
(length, quality score, source boost).  The classic weighted reservoir
(Efraimidis–Spirakis) ranks by u^(1/w) — IEEE pow/log floats, which the
repo's tfidf lesson shows can flip boundary rows against a SQL oracle.
This module uses sequential Poisson sampling (Ohlsson): priority
``q_i = u_i / w_i`` with the k smallest priorities selected — and makes
it integer-exact by

- ``u_i`` = the repo's 32-bit multiplicative id hash (deterministic,
  engine-reproducible), and
- ``q_i`` = ``(u_i << 32) // w_i`` computed in uint64 — fits because
  ``u_i < 2^32``; any SQL engine reproduces it with HUGEINT integer
  division, bit-for-bit.

Inclusion is weight-proportional in expectation for k ≪ n (sequential
Poisson is the standard survey-sampling approximation of probability-
proportional-to-size; the pytest pins the realized proportions).

Distribution shape: per-batch bottom-k partial (the global bottom-k is a
subset of the union of per-batch bottom-ks — the proven-subset property
the stratified sampler documents) + a driver re-cut bounded by
k × blocks.  At cluster scale swap the driver cut for a tournament
reduce; the partial stays the same.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MULT = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def weighted_priority(ids: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Exact uint64 sequential-Poisson priority: (hash32(id) << 32) // w.
    Weights are clamped to ≥ 1 (a zero/negative/null weight must not
    divide by zero — it degrades to weight 1, loudly documented in the
    oracle SQL's GREATEST/COALESCE mirror)."""
    with np.errstate(over="ignore"):
        h = (ids.astype(np.uint64) * _MULT) % _M32
    w = np.maximum(weights.astype(np.int64), 1).astype(np.uint64)
    return (h << np.uint64(32)) // w


def weighted_bottom_k(ds, id_col: str, weight_col: "str | None", k: int,
                      keep_cols: list[str] | None = None) -> pd.DataFrame:
    """k rows with the smallest integer priority (ties → smaller id),
    with a 1-based ``rn`` rank column.  Weight-proportional sample that
    any SQL engine reproduces exactly.  ``weight_col=None`` → unit
    weights: a deterministic fixed-size UNIFORM sample (the reservoir-
    sampling use case, hash-derandomized)."""
    import ray

    cols = list(dict.fromkeys(
        [id_col] + ([weight_col] if weight_col else [])
        + (keep_cols or [])))

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if weight_col is None:
            w = np.ones(len(ids), np.int64)
        else:
            w = pc.fill_null(t[weight_col], 1) \
                .to_numpy(zero_copy_only=False)
        q = weighted_priority(ids, w)
        kk = min(k, len(q))
        if kk < len(q):
            # bottom-k cut: argpartition then exact sort of the k kept
            idx = np.argpartition(q, kk - 1)[:kk]
        else:
            idx = np.arange(len(q))
        order = np.lexsort((ids[idx], q[idx]))
        idx = idx[order]
        t = t.take(pa.array(idx, pa.int64()))
        # uint64 end-to-end: priorities reach 2^64-1, an int64 cast would
        # wrap the top half negative and corrupt the driver re-cut
        return t.append_column("_q", pa.array(q[idx], pa.uint64()))

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).materialize().to_arrow_refs())
        if isinstance(t, pa.Table) and "_q" in t.schema.names]
    if not parts:
        # fully-empty input: carry the REAL column types, not assumed int64
        sch = ds.schema()
        tmap = dict(zip(sch.names, sch.types))
        base = pa.schema([(c, tmap.get(c, pa.int64())) for c in cols]
                         + [("rn", pa.int64())])
        return base.empty_table().to_pandas()
    cand = pa.concat_tables(parts).to_pandas()
    cand = cand.sort_values(["_q", id_col], kind="stable").head(k)
    cand["rn"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand.drop(columns=["_q"]).reset_index(drop=True)


_ORD_SHIFT = 48  # doc ids must fit below the quality level in the sort key

BUDGET_SCHEMA = pa.schema([("doc_id", pa.int64()), ("q_int", pa.int64()),
                           ("n_tok", pa.int64()), ("cum_tok", pa.int64())])


def select_to_token_budget(ds, budget: int, *, id_col: str = "doc_id",
                           text_col: str = "text"):
    """Quality-ordered token-budget corpus selection — the "take the best
    documents until the training-token budget is spent" cut every
    LLM-data pipeline ends with.

    Order: integer quality ``q_int = 2·length_ok + punct_ok + stop_ok +
    wl_ok`` (the SAME four TextAnalyzer indicator comparisons the
    externally value-checked d_quality score is built from — integer so
    the ordering is float-free) DESCENDING, tie → ``doc_id`` ascending;
    keep every doc whose running token total over that order is
    ≤ ``budget`` (docs are never split — the chunk/pack operators handle
    splitting).

    Distribution shape — a GLOBAL ORDERED PREFIX-SUM CUT:

    1. one narrow per-block feature task → ``(doc_id, q_int, n_tok)``
       plus the composite int64 sort key ``(5 − q_int) << 48 | doc_id``
       (single-key ascending sort; no mixed-direction multi-key);
    2. Ray's range-partitioned ``Dataset.sort`` over that ~32 B/row
       table — the corpus TEXT never shuffles;
    3. per-block token sums → driver prefix offsets (O(#blocks)) →
       per-block intra-cumsum cut.  Blocks whose offset already exceeds
       the budget are dropped without launching a task (the running sum
       is monotone — n_tok ≥ 0).

    With a low-cardinality order key (6 quality levels) step 2 could
    collapse further to per-level token totals + a prefix scan of the
    single boundary level; the generic sort path is kept because it
    works for ANY integer ordering key at the cost of sorting a narrow
    projection.

    Returns a Ray Dataset ``(doc_id, q_int, n_tok, cum_tok)``, all
    int64, where ``cum_tok`` is the running total INCLUDING the row.
    Precondition: ``doc_id`` unique, in ``[0, 2^48)`` (checked per
    block).  Zero-token docs that sort at-or-before the boundary are
    kept (the running sum does not advance) — same as the SQL
    ``SUM() OVER`` twin."""
    import ray
    import ray.data as rd

    from ..blocks import arrow_refs
    from .text import TextAnalyzer

    if budget < 0:
        raise ValueError("budget must be >= 0")

    @ray.remote
    def feats(t: pa.Table) -> pa.Table:
        df = t.select([id_col, text_col]).to_pandas()
        an = TextAnalyzer()
        texts = df[text_col].fillna("")
        n_tok = an.token_count(texts).to_numpy()
        punct = an.punct_ratio(texts).to_numpy()
        stop = an.stopword_ratio(texts).to_numpy()
        mwl = an.mean_word_len(texts).to_numpy()
        q = (2 * ((n_tok >= 10) & (n_tok <= 100_000))
             + (punct < 0.3) + (stop > 0.01)
             + ((mwl > 2) & (mwl < 12))).astype(np.int64)
        ids = df[id_col].to_numpy().astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << _ORD_SHIFT):
            raise ValueError(f"{id_col} outside [0, 2^{_ORD_SHIFT})")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "q_int": pa.array(q, pa.int64()),
            "n_tok": pa.array(n_tok.astype(np.int64), pa.int64()),
            "ord_key": pa.array(((5 - q) << _ORD_SHIFT) | ids, pa.int64()),
        })

    # feature pass as explicit tasks over the input blocks (not
    # map_batches): zero-row blocks skip a map_batches UDF and would
    # reach the sort without the ord_key column
    feat_refs = [feats.remote(r) for r in arrow_refs(ds)]
    s = rd.from_arrow_refs(feat_refs).sort("ord_key").materialize()
    srefs = s.to_arrow_refs()

    @ray.remote
    def toksum(t: pa.Table) -> int:
        return int(pc.sum(t["n_tok"]).as_py() or 0)

    sums = ray.get([toksum.remote(r) for r in srefs])
    offsets = np.concatenate([[0], np.cumsum(sums, dtype=np.int64)])

    @ray.remote
    def cut(t: pa.Table, off: int) -> pa.Table:
        cum = off + np.cumsum(
            t["n_tok"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sub = t.filter(pa.array(cum <= budget))
        return pa.table({
            "doc_id": sub["doc_id"], "q_int": sub["q_int"],
            "n_tok": sub["n_tok"],
            "cum_tok": pa.array(cum[cum <= budget], pa.int64())})

    out = [cut.remote(r, int(off))
           for r, off in zip(srefs, offsets[:-1]) if off <= budget]
    if not out:  # zero blocks (empty input corpus)
        return rd.from_arrow(BUDGET_SCHEMA.empty_table())
    # NOTE: when the cut drops every row the result is a Dataset of
    # empty blocks, whose .to_pandas() loses the schema (Ray trap) —
    # collect via blocks.concat_shaped(..., empty_schema=BUDGET_SCHEMA)
    return rd.from_arrow_refs(out)
