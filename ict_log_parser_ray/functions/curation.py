"""Corpus-curation transforms: PII/term redaction, boilerplate-unit
removal, and fixed-size chunk explode.

Three ops every large-scale training-data pipeline runs over its text
corpus before anything else touches it:

- ``redact_documents`` — regex scrubbing (emails, phones, IPs, or any
  configured term set) with per-pattern match counts.  Vectorized RE2
  (`pyarrow.compute`) per batch; counts are over the ORIGINAL text so
  each pattern's count is independent of replacement order.
- ``remove_common_units`` — the C4/CCNet "remove boilerplate lines that
  repeat across many documents" shape, generalised over the unit
  separator (newline for real corpora; the driver query uses words
  because the synthetic fixture is single-line).  Distributed unit
  document-frequency map (per-batch partials → bounded driver finish /
  sharded tasks — never a Ray groupby at ~all-distinct unit keys), then
  a broadcast common-set filter with order-preserving reassembly in
  vectorized polars list kernels.
- ``chunk_documents`` — explode each doc into fixed-width character
  chunks on a stride (context-window packing's first step).  One
  repeat/arange explode plus a polars expression-offset ``str.slice``;
  no per-chunk Python loop.

All three stream: no stage materializes the corpus beyond the broadcast
common-unit set (bounded by ``max_units``, loudly logged if hit).
"""

from __future__ import annotations
from ..blocks import ncpus as _ncpus

import logging
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger(__name__)

# default scrub set — RE2 syntax (pyarrow and DuckDB share RE2, so the
# same strings work verbatim in the SQL oracle twin)
PII_PATTERNS: tuple = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def _pl():
    if "polars" not in sys.modules:
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl
    return pl


def redact_documents(docs_ds, patterns=PII_PATTERNS):
    """documents → (doc_id, n_<name>..., text_redacted) Dataset.

    ``patterns`` is a sequence of (name, re2_pattern, replacement).
    Replacements apply sequentially; counts are computed on the original
    text (each pattern counted independently), matching the SQL twin
    ``len(regexp_extract_all(text, pat))``.  Stateless zero-copy Arrow
    map — RE2 kernels, no Python row loop."""
    import pyarrow.compute as pc

    pats = list(patterns)

    def _redact(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        cols: dict = {"doc_id": t["doc_id"]}
        out = txt
        for name, pat, rep in pats:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64())
            out = pc.replace_substring_regex(out, pat, rep)
        cols["text_redacted"] = out
        return pa.table(cols)

    return docs_ds.map_batches(_redact, batch_format="pyarrow",
                               zero_copy_batch=True)


def _unit_df_map(docs_ds, sep: str, min_df: int = 1,
                 driver_finish_rows: int = 5_000_000):
    """Corpus-wide (unit, doc-frequency ≥ ``min_df``) pandas frame over
    STRING units.

    Per-batch partials (each doc contributes each of its unique units
    once), then a bounded driver merge under ``driver_finish_rows`` or
    ~2×CPU hash-sharded tasks beyond — the `_common_gram_df` shape, kept
    on strings (no hash) so the downstream common-set filter is exact
    with no collision caveat.  The ``min_df`` cut runs inside the shard
    tasks, so only qualifying (boilerplate-frequency) units ever reach
    the driver."""
    import ray
    from ray.data.dataset import MaterializedDataset

    def _part_pdf(texts) -> pd.DataFrame:
        s = pd.Series(texts).fillna("").astype(str).str.split(sep)
        if not len(s):
            return pd.DataFrame({"u": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64")})
        # per-doc unique units, then one batch-level value count
        uniq = [pd.unique(np.asarray(w, dtype=object)) for w in s]
        allu = pd.Series(np.concatenate(uniq)) if uniq else \
            pd.Series([], dtype=object)
        vc = allu.value_counts(sort=False)
        return pd.DataFrame({"u": vc.index.to_numpy(object),
                             "c": vc.to_numpy(np.int64)})

    if isinstance(docs_ds, MaterializedDataset):
        @ray.remote
        def _part_task(block: pa.Table) -> pa.Table:
            if not isinstance(block, pa.Table) or \
                    "text" not in block.schema.names or block.num_rows == 0:
                return pa.schema([("u", pa.string()),
                                  ("c", pa.int64())]).empty_table()
            return pa.Table.from_pandas(
                _part_pdf(block["text"].to_pandas()), preserve_index=False)

        prefs = [_part_task.remote(r) for r in docs_ds.to_arrow_refs()]
    else:
        parts = docs_ds.map_batches(
            lambda df: _part_pdf(df["text"]),
            batch_format="pandas").materialize()
        prefs = parts.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def _size(t) -> int:
        return t.num_rows if isinstance(t, pa.Table) and \
            "u" in t.schema.names else 0

    total = int(sum(ray.get([_size.remote(r) for r in prefs])))
    if total == 0:
        return pd.DataFrame({"u": pd.Series([], dtype=object),
                             "df": pd.Series([], dtype="int64")})
    if total <= driver_finish_rows:
        tbls = [t for t in ray.get(prefs)
                if isinstance(t, pa.Table) and "u" in t.schema.names
                and t.num_rows]
        df = pa.concat_tables(tbls).to_pandas()
        out = df.groupby("u", sort=False, as_index=False)["c"].sum()
        return out.rename(columns={"c": "df"})
    # sharded finish: hash-partition partial rows by unit into ~2×CPU
    # tasks, sum within each — mirrors _common_gram_df's fallback; the
    # partials stay in the object store (only each task's shard moves)
    ncpu = _ncpus()
    nparts = int(min(max(8, -(-total // 200_000)), 2 * ncpu, 64))

    @ray.remote
    def _shard(p: int) -> pa.Table:
        from pandas.util import hash_pandas_object
        subs = []
        for t in ray.get(prefs):
            if not isinstance(t, pa.Table) or \
                    "u" not in t.schema.names or t.num_rows == 0:
                continue
            u = t["u"].to_pandas()
            tag = (hash_pandas_object(u, index=False).to_numpy()
                   % np.uint64(nparts)).astype(np.int64)
            sub = t.filter(pa.array(tag == p))
            if sub.num_rows:
                subs.append(sub)
        if not subs:
            return pa.schema([("u", pa.string()),
                              ("c", pa.int64())]).empty_table()
        df = pa.concat_tables(subs).to_pandas()
        out = df.groupby("u", sort=False, as_index=False)["c"].sum()
        out = out.loc[out["c"] >= min_df]
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = [t for t in ray.get([_shard.remote(p) for p in range(nparts)])
             if t.num_rows]
    if not parts:
        return pd.DataFrame({"u": pd.Series([], dtype=object),
                             "df": pd.Series([], dtype="int64")})
    df = pa.concat_tables(parts).to_pandas()
    return df.rename(columns={"c": "df"})


def remove_common_units(docs_ds, sep: str = "\n",
                        min_doc_frac: float = 0.5,
                        min_docs: int | None = None,
                        max_units: int = 2_000_000,
                        pin_threshold: int = 2_000_000):
    """documents → (doc_id, text_clean, n_removed) Dataset: drop every
    unit (line/word/…) that appears in ≥ ``min_docs`` distinct documents
    (default ``ceil(min_doc_frac × ndocs)``), reassembling the survivors
    in their original order.

    The common-unit set is broadcast once (`ray.put`); the filter +
    rejoin runs as vectorized polars list kernels inside a stateless
    zero-copy map — no per-doc Python loop.  If the common set exceeds
    ``max_units`` the least-frequent overflow is kept (NOT removed) and
    logged loudly: semantics degrade to "remove the max_units most
    boilerplate units", never to silent corruption."""
    import ray

    ndocs = docs_ds.count()
    if ndocs == 0:
        return docs_ds
    # pin small corpora so the df pass and the clean pass share blocks;
    # past the threshold both passes stream the source independently
    # (the minhash/wordgram pin/stream contract)
    if ndocs <= pin_threshold:
        docs_ds = docs_ds.materialize()
    if min_docs is None:
        min_docs = int(np.ceil(min_doc_frac * ndocs))
    dfm = _unit_df_map(docs_ds, sep, min_df=min_docs)
    common = dfm.loc[dfm["df"] >= min_docs]
    if len(common) > max_units:
        logger.warning(
            "common-unit set %d > max_units %d — keeping only the "
            "most frequent %d (overflow units stay in the corpus)",
            len(common), max_units, max_units)
        common = common.nlargest(max_units, "df")
    cref = ray.put(common["u"].to_numpy(object).tolist())

    def _clean(df: pd.DataFrame) -> pd.DataFrame:
        pl = _pl()
        cset = ray.get(cref)
        d = pl.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "ws": pd.Series(df["text"]).fillna("").astype(str)
            .str.split(sep).to_list()})
        d = d.with_columns(kept=pl.col("ws").list.eval(
            pl.element().filter(~pl.element().is_in(cset))))
        d = d.with_columns(
            text_clean=pl.col("kept").list.join(sep),
            n_removed=(pl.col("ws").list.len()
                       - pl.col("kept").list.len()).cast(pl.Int64))
        return d.select(["doc_id", "text_clean", "n_removed"]).to_pandas()

    return docs_ds.map_batches(_clean, batch_format="pandas")


def repetition_stats(docs_ds, sep: str = " ", keep_cols: tuple = (),
                     batch_size: "int | None" = 4096):
    """documents → per-doc repetition metrics (doc_id, n_words,
    n_distinct, n_2grams, top2_count, keep) — the Gopher-style
    repetition quality filters (Rae et al. 2021 §A1.1: duplicate-word
    fraction, most-common-2-gram fraction).

    All outputs are INTEGERS (counts + an integer-arithmetic keep flag:
    dup_word_frac <= 0.3 as (nw-nd)*10 <= 3*nw, top-2-gram frac <= 0.2
    as top2*5 <= n_2grams) — never a rounded float ratio, because
    round-half tie-breaking differs between numpy (banker's) and SQL
    (half away from zero) and a nw=32 doc genuinely hits the tie
    (see the tfidf integer-score lesson).  Docs with < 2 words have
    n_2grams = 0 and pass the 2-gram rule vacuously.

    Purely per-batch (a doc's words never leave its block): one
    split + two pandas C groupbys, no shuffle.

    ``keep_cols``: input columns copied through to the output (e.g. the
    text itself, so a downstream filter needs no join back).

    ``batch_size`` bounds the Python-object word frame each ``_rep``
    call builds (str.split objects + a 3-object-key groupby): at 1M-doc
    scale Ray's default block-sized batches reach ~28k docs ≈ 2.2M
    word objects per call and allocator/GC churn goes superlinear —
    measured 49.9 s → 16.9 s at 1M docs / 32 CPUs with the 4096 cap.
    Outputs are strictly per-doc, so the split never changes results.
    (Tiny inputs: blocks smaller than ``batch_size`` get re-bundled
    into fewer tasks — the round-3 re-coalescing effect — which is
    the FAST direction for sub-4096-row tables.)"""

    def _rep(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series(df["text"]).fillna("").astype(str).str.split(sep)
        m = len(s)
        lens = (s.str.len().to_numpy(np.int64) if m
                else np.empty(0, np.int64))
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        if m == 0 or lens.sum() == 0:
            for c in ("n_words", "n_distinct", "n_2grams",
                      "top2_count", "keep"):
                out[c] = np.zeros(m, np.int64)
            for c in keep_cols:
                out[c] = df[c].to_numpy()
            return out
        doc = np.repeat(np.arange(m, dtype=np.int64), lens)
        words = np.concatenate([np.asarray(w, dtype=object) for w in s])
        pdf = pd.DataFrame({"d": doc, "w": words})
        nd = (pdf.groupby("d", sort=False)["w"].nunique()
              .reindex(range(m), fill_value=0).to_numpy(np.int64))
        same = doc[1:] == doc[:-1]
        n2g = np.maximum(lens - 1, 0)
        top2 = np.zeros(m, np.int64)
        if same.any():
            big = pd.DataFrame({"d": doc[:-1][same],
                                "a": words[:-1][same],
                                "b": words[1:][same]})
            mx = (big.groupby(["d", "a", "b"], sort=False).size()
                  .groupby(level=0).max())
            top2[mx.index.to_numpy(np.int64)] = mx.to_numpy(np.int64)
        keep = (((lens - nd) * 10 <= 3 * lens)
                & (top2 * 5 <= n2g)).astype(np.int64)
        out["n_words"] = lens
        out["n_distinct"] = nd
        out["n_2grams"] = n2g
        out["top2_count"] = top2
        out["keep"] = keep
        for c in keep_cols:
            out[c] = df[c].to_numpy()
        return out

    return docs_ds.map_batches(_rep, batch_format="pandas",
                               batch_size=batch_size)


def greedy_pack_indices(lens: np.ndarray, budget: int) -> np.ndarray:
    """Exact greedy first-fit-in-order sequence index per item —
    VECTORIZED (binary lifting), no per-item Python loop.

    Semantics (the training-data "sequence packing" rule): items join
    the current sequence while fill + len <= budget, else start a new
    one; an over-budget item always starts (and fills) its own
    sequence.  The greedy recurrence "next boundary = first prefix-sum
    past fill+budget" is solved for ALL items at once: one vectorized
    searchsorted gives next_start[i] for every potential start i, then
    pointer doubling over next_start yields each item's jump count from
    item 0 — its sequence index — in O(n log n) numpy passes.  A Python
    chain-walk would be O(#sequences) serial; at corpus scale that is
    billions of iterations.  Working memory is O(n log n) int64 (the
    lifting tables, ~8·log2(n) bytes/item) — size the caller's shard
    count so a shard fits a worker heap (pack_sequences' nparts is the
    knob)."""
    n = len(lens)
    if n == 0:
        return np.empty(0, np.int64)
    lens = np.asarray(lens, np.int64)
    cum = np.cumsum(lens)
    start_cum = cum - lens
    nxt = np.searchsorted(cum, start_cum + budget, side="right")
    nxt = np.maximum(nxt, np.arange(1, n + 1))   # over-budget: own seq
    # binary lifting: seq[i] = #jumps from 0 with pointer staying <= i
    nbits = max(1, int(np.ceil(np.log2(n + 1))))
    jumps = [nxt]
    for _ in range(nbits - 1):
        j = jumps[-1]
        jumps.append(np.where(j < n, j[np.minimum(j, n - 1)], n))
    pos = np.zeros(n, np.int64)
    seq = np.zeros(n, np.int64)
    idx = np.arange(n, dtype=np.int64)
    for k in range(nbits - 1, -1, -1):
        j = jumps[k]
        cand = np.where(pos < n, j[np.minimum(pos, n - 1)], n)
        ok = cand <= idx
        pos = np.where(ok, cand, pos)
        seq += ok.astype(np.int64) << k
    return seq


def pack_sequences(docs_ds, budget: int = 2000, nparts: int = 8,
                   len_col: str = "n_chars", id_col: str = "doc_id"):
    """documents → (doc_id, part, seq) Dataset: greedy first-fit
    packing of documents (in id order, never split) into training
    sequences of at most ``budget`` length units per hash partition.

    Greedy packing is order-serial, so the corpus is sharded by
    ``id % nparts`` and packed independently per shard — the documented
    partitioning assumption (sequences never span shards; ``nparts`` is
    a FIXED semantic parameter, not a cluster-size knob, so results are
    cluster-independent and SQL-checkable).  Only (id, len) columns move
    — the text never leaves storage — and each shard task runs the
    vectorized `greedy_pack_indices` kernel after one in-shard sort."""
    import ray
    import ray.data as rd

    proj = docs_ds.select_columns([id_col, len_col]).materialize()
    prefs = proj.to_arrow_refs()
    _schema = pa.schema([("doc_id", pa.int64()), ("part", pa.int64()),
                         ("seq", pa.int64())])

    @ray.remote
    def _pack_part(p: int) -> pa.Table:
        subs = []
        for t in ray.get(prefs):
            if not isinstance(t, pa.Table) or \
                    id_col not in t.schema.names or t.num_rows == 0:
                continue
            ids = t[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            tag = ids.to_numpy(zero_copy_only=False) % nparts
            sub = t.filter(pa.array(tag == p))
            if sub.num_rows:
                subs.append(sub)
        if not subs:
            return _schema.empty_table()
        tbl = pa.concat_tables(subs)
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = tbl[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, lens = ids[order], lens[order]
        seq = greedy_pack_indices(lens, budget)
        return pa.table({"doc_id": pa.array(ids),
                         "part": pa.array(np.full(len(ids), p, np.int64)),
                         "seq": pa.array(seq)})

    return rd.from_arrow_refs([_pack_part.remote(p) for p in range(nparts)])


def chunk_documents(docs_ds, size: int = 100, stride: int = 80):
    """documents → (doc_id, chunk_idx, chunk) Dataset: fixed-width
    character chunks of ``size`` every ``stride`` characters
    (overlap = size - stride).  A doc yields ceil(max(len, 1)/stride)
    chunks, so empty docs emit one empty chunk — mirroring the SQL twin
    ``substr(text, chunk_idx*stride+1, size)`` over
    ``range(0, ceil(greatest(length(text),1)/stride))``.

    Positions are Unicode code points on both sides (polars str.slice
    and DuckDB substr agree); the explode is repeat/arange + one polars
    expression-offset slice — no per-chunk Python loop."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def _chunks(df: pd.DataFrame) -> pd.DataFrame:
        pl = _pl()
        if not len(df):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_idx": pd.Series([], dtype="int64"),
                "chunk": pd.Series([], dtype=object)})
        txt = pd.Series(df["text"]).fillna("").astype(str)
        L = txt.str.len().to_numpy(np.int64)
        n = -(-np.maximum(L, 1) // stride)
        total = int(n.sum())
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(np.r_[np.int64(0), np.cumsum(n[:-1])], n))
        d = pl.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), n),
            "text": txt.to_numpy(object).repeat(n),
            "chunk_idx": idx})
        d = d.with_columns(chunk=pl.col("text").str.slice(
            pl.col("chunk_idx") * stride, size)).drop("text")
        return d.to_pandas()

    return docs_ds.map_batches(_chunks, batch_format="pandas")


def dedup_units(docs_ds, sep: str = " "):
    """documents → (doc_id, text_clean, n_removed) Dataset: drop
    repeated units (lines/sentences/words per ``sep``) WITHIN each
    document, keeping the first occurrence in order — the intra-doc
    sibling of ``remove_common_units``'s cross-doc boilerplate removal
    (real corpora repeat nav bars / footers many times inside one page).

    Purely per-batch — no shuffle, no broadcast, nothing driver-held:
    one polars split + ``list.unique(maintain_order=True)`` + rejoin,
    all vectorized.  ``n_removed`` is an exact int64 count so the SQL
    twin (ROW_NUMBER over (doc_id, unit) + ordered string_agg) is
    hash-exact."""

    def _clean(df: pd.DataFrame) -> pd.DataFrame:
        pl = _pl()
        d = pl.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "ws": pd.Series(df["text"]).fillna("").astype(str)
            .str.split(sep).to_list()})
        d = d.with_columns(u=pl.col("ws").list.unique(maintain_order=True))
        d = d.with_columns(
            text_clean=pl.col("u").list.join(sep),
            n_removed=(pl.col("ws").list.len()
                       - pl.col("u").list.len()).cast(pl.Int64))
        return d.select(["doc_id", "text_clean", "n_removed"]).to_pandas()

    return docs_ds.map_batches(_clean, batch_format="pandas")


_OVERLAP_SCHEMA = pa.schema([("doc_id", pa.int64()),
                             ("n_grams", pa.int64()),
                             ("n_overlap", pa.int64())])


def ngram_overlap(corpus_ds, bench_ds, n: int = 3,
                  max_broadcast_grams: int = 5_000_000,
                  nparts: int | None = None):
    """Fuzzy benchmark-decontamination score: for each corpus document,
    how many of its DISTINCT word-``n``-grams appear anywhere in the
    benchmark set (``d_contamination``'s exact-substring scan misses
    paraphrased/partial leaks; distinct-n-gram overlap is the standard
    fuzzy variant — e.g. the GPT-3/PaLM 13-gram decontamination rule).
    Returns ``(doc_id, n_grams, n_overlap)`` for docs with overlap > 0,
    all exact int64 so the SQL-twin comparison is hash-exact.

    Scale shape: a real benchmark side is tiny by construction (an eval
    suite is KBs-MBs); its distinct-gram union is reduced from per-batch
    partials and broadcast ONCE via ``ray.put``.  The corpus then
    streams through one vectorized membership probe per batch against a
    per-worker memoized khash index (``stages.join.isin_mask_memo`` —
    ``pc.is_in`` would rebuild its hash table every call, the measured
    4× trap), followed by a segment-sum of the mask per doc.  No
    shuffle, no join, corpus never materialized.  Grams are the same
    64-bit word-hash rolling combine the exact word-n-gram dedup family
    uses (``_word_gram_hash_list``), whose string-level SQL equivalence
    is value-checked by d_wordgram_pairs/d_cross_dedup.

    Past ``max_broadcast_grams`` (bench partial rows, an upper bound of
    the union) the probe switches to gram-hash-sharded tasks — see
    ``_ngram_overlap_sharded`` — the bench partials are pre-split into
    per-shard slices (one per-block task wave, ``num_returns=nparts``)
    so each shard task fetches ONLY its slice: no task heap and no
    single node's object store ever holds the full bench gram set; a
    forced-path pytest pins shard == broadcast equality."""
    import ray

    from ..blocks import concat_shaped
    from ..stages.join import isin_mask_memo
    from .dedup_docs import _word_gram_hash_list

    _g_schema = pa.schema([("g", pa.uint64())])

    def _bench_part(df: pd.DataFrame) -> pd.DataFrame:
        sets = [a for a in _word_gram_hash_list(df["text"], n) if len(a)]
        u = (np.unique(np.concatenate(sets)) if sets
             else np.empty(0, np.uint64))
        return pd.DataFrame({"g": u})

    bench_parts = bench_ds.map_batches(
        _bench_part, batch_format="pandas").materialize()
    if bench_parts.count() > max_broadcast_grams:
        return _ngram_overlap_sharded(corpus_ds, bench_parts, n, nparts)

    bench_tbl = concat_shaped(bench_parts, "g", empty_schema=_g_schema)
    bench = np.unique(bench_tbl["g"].to_numpy(zero_copy_only=False)
                      .astype(np.uint64))
    gref = ray.put(pa.array(bench, pa.uint64()))

    def _probe(df: pd.DataFrame) -> pd.DataFrame:
        sets = _word_gram_hash_list(df["text"], n)
        lens = np.fromiter((len(a) for a in sets), np.int64, len(sets))
        if lens.sum() == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_grams": pd.Series([], dtype="int64"),
                                 "n_overlap": pd.Series([], dtype="int64")})
        allg = np.concatenate([a for a in sets if len(a)])
        hit = isin_mask_memo(pa.array(allg, pa.uint64()), gref) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        nz = np.flatnonzero(lens)
        offs = np.r_[np.int64(0), np.cumsum(lens[nz])[:-1]]
        ov = np.add.reduceat(hit, offs)
        out = pd.DataFrame({
            "doc_id": np.asarray(df["doc_id"])[nz].astype(np.int64),
            "n_grams": lens[nz],
            "n_overlap": ov.astype(np.int64)})
        return out[out["n_overlap"] > 0]

    got = corpus_ds.map_batches(_probe, batch_format="pandas") \
        .materialize()
    return concat_shaped(got, "n_overlap", empty_schema=_OVERLAP_SCHEMA)


def _ngram_overlap_sharded(corpus_ds, bench_parts, n: int,
                           nparts: int | None):
    """Big-benchmark path of ``ngram_overlap``: nothing is broadcast.

    Both sides shard by gram hash: the corpus's (doc_id, gram) stream is
    tagged ``gram % nparts`` in one narrow pass, and the bench gram
    partials are pre-split ONCE by a per-block task wave
    (``num_returns=nparts`` — each split task reads one bench block
    only) so every shard task fetches exactly its partition plus its
    slice of the bench grams, probing with a per-task khash.  A gram
    lives in exactly one shard, and per-doc grams are globally unique,
    so the per-shard (doc, n_grams, n_overlap) counts are ADDITIVE — a
    second wave of doc-hash tasks sums them and applies the overlap>0
    cut.  Per-task memory AND per-task object-store traffic are one
    gram shard (~total/nparts), never the full set; the doc partials
    are bounded by docs × nparts rows."""
    import pyarrow.compute as pc
    import ray

    from .dedup_docs import _word_gram_hash_list

    if nparts is None:
        nparts = max(4, min(2 * _ncpus(), 64))
    bench_refs = bench_parts.to_arrow_refs()

    @ray.remote
    def _split_bench(blk, nparts: int):
        """One bench partial block → its nparts gram shard slices."""
        if not isinstance(blk, pa.Table) or "g" not in blk.schema.names:
            return tuple(np.empty(0, np.uint64) for _ in range(nparts))
        a = blk["g"].to_numpy(zero_copy_only=False).astype(
            np.uint64, copy=False)
        part = (a % np.uint64(nparts)).astype(np.int64)
        return tuple(a[part == p] for p in range(nparts))

    # splits[b][p]: block b's shard-p slice (nparts ≥ 4, so num_returns
    # always yields a list of refs)
    splits = [_split_bench.options(num_returns=nparts).remote(r, nparts)
              for r in bench_refs]

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        sets = _word_gram_hash_list(df["text"], n)
        lens = np.fromiter((len(a) for a in sets), np.int64, len(sets))
        if lens.sum() == 0:
            return pd.DataFrame({"part": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "g": pd.Series([], dtype="uint64")})
        allg = np.concatenate([a for a in sets if len(a)])
        ids = np.repeat(np.asarray(df["doc_id"]).astype(np.int64), lens)
        return pd.DataFrame({
            "part": (allg % np.uint64(nparts)).astype(np.int64),
            "doc_id": ids, "g": allg})

    narrow = corpus_ds.map_batches(tag, batch_format="pandas") \
        .materialize()
    refs = narrow.to_arrow_refs()

    @ray.remote
    def _shard(p: int, refs, slice_refs) -> pa.Table:
        from ..blocks import tagged_tables

        tbls = tagged_tables(refs, p)
        t = pa.concat_tables(tbls).combine_chunks() if tbls else None
        if t is None or t.num_rows == 0:
            return _OVERLAP_SCHEMA.empty_table()
        # slice_refs hold ONLY this shard's bench grams (pre-split by
        # _split_bench) — fetching them never pulls the full gram set
        bg = [a for a in ray.get(slice_refs) if len(a)]
        shard = np.unique(np.concatenate(bg)) if bg \
            else np.empty(0, np.uint64)
        g = t["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hit = (pd.Index(shard).get_indexer(g) >= 0).astype(np.int64) \
            if len(shard) else np.zeros(len(g), np.int64)
        order = np.argsort(ids, kind="stable")
        ids, hit = ids[order], hit[order]
        b = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        return pa.table({
            "doc_id": pa.array(ids[b], pa.int64()),
            "n_grams": pa.array(np.diff(np.r_[b, ids.size])
                                .astype(np.int64)),
            "n_overlap": pa.array(np.add.reduceat(hit, b), pa.int64())})

    srefs = [_shard.remote(p, refs, [s[p] for s in splits])
             for p in range(nparts)]

    # a doc's grams spread across shards, so its per-shard counts must
    # meet: one doc-hash task wave sums the (docs × nparts)-bounded
    # partials (refs nested in a list are NOT auto-resolved — ray.get
    # inside, the documented rule)
    @ray.remote
    def _doc_sum(q: int, srefs, nparts: int) -> pa.Table:
        tbls = []
        for t in ray.get(srefs):
            if not isinstance(t, pa.Table) or t.num_rows == 0:
                continue
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids.astype(np.uint64) % np.uint64(nparts)) == np.uint64(q)
            tbls.append(t.filter(pa.array(m)))
        t = pa.concat_tables(tbls).combine_chunks() if tbls else None
        if t is None or t.num_rows == 0:
            return _OVERLAP_SCHEMA.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ng = t["n_grams"].to_numpy(zero_copy_only=False)
        nov = t["n_overlap"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, ng, nov = ids[order], ng[order], nov[order]
        b = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        out = pa.table({
            "doc_id": pa.array(ids[b], pa.int64()),
            "n_grams": pa.array(np.add.reduceat(ng, b), pa.int64()),
            "n_overlap": pa.array(np.add.reduceat(nov, b), pa.int64())})
        return out.filter(pc.greater(out["n_overlap"], 0))

    parts = ray.get([_doc_sum.remote(q, srefs, nparts)
                     for q in range(nparts)])
    tbls = [t for t in parts if t.num_rows]
    return (pa.concat_tables(tbls) if tbls
            else _OVERLAP_SCHEMA.empty_table())
