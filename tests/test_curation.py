"""Curation ops (functions/curation.py) vs pure-Python references."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from ict_log_parser_ray.functions.curation import (
    PII_PATTERNS, chunk_documents, redact_documents, remove_common_units)


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


# ---------------------------------------------------------------- redact

PII_TEXTS = [
    "contact bob@example.com or alice.smith+x@mail.co.uk today",
    "call +1 (555) 123-4567 or 555 987 6543 now",
    "server at 10.0.0.1 and 192.168.100.255 responded",
    "ssn 123-45-6789 leaked; also email a@b.io and ip 8.8.8.8",
    "clean text with no sensitive content at all",
    None,
    "",
]


def test_redact_matches_python_re(ray_session):
    got = (redact_documents(_docs(PII_TEXTS)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(PII_TEXTS):
        t = t or ""
        out = t
        for name, pat, rep in PII_PATTERNS:
            assert got.loc[i, f"n_{name}"] == len(re.findall(pat, t)), \
                (i, name)
            out = re.sub(pat, rep, out)
        assert got.loc[i, "text_redacted"] == out, i


def test_redact_counts_are_independent_of_order(ray_session):
    # counts are over the ORIGINAL text: a phone inside an email's
    # domain-ish digits must not change after email replacement
    texts = ["mail me: x@y.com then dial 555-123-9876 ok"]
    got = redact_documents(_docs(texts)).to_pandas()
    assert got.loc[0, "n_email"] == 1
    assert got.loc[0, "n_phone"] == 1
    assert "<EMAIL>" in got.loc[0, "text_redacted"]
    assert "<PHONE>" in got.loc[0, "text_redacted"]


# ------------------------------------------------------- common units

def _boiler_ref(texts, sep, min_docs):
    split = [(t or "").split(sep) for t in texts]
    df = {}
    for ws in split:
        for u in set(ws):
            df[u] = df.get(u, 0) + 1
    common = {u for u, c in df.items() if c >= min_docs}
    out = []
    for ws in split:
        kept = [w for w in ws if w not in common]
        out.append((sep.join(kept), len(ws) - len(kept)))
    return out


@pytest.mark.parametrize("sep", ["\n", " "])
def test_remove_common_units_matches_reference(ray_session, sep):
    rng = np.random.default_rng(7)
    texts = []
    for i in range(40):
        units = ["shared-header"] if i % 2 == 0 else []
        units += ["only-%d-%d" % (i, j) for j in range(rng.integers(1, 4))]
        if i % 3 == 0:
            units.append("footer-common")
        texts.append(sep.join(units))
    texts += ["shared-header", "", None]   # fully-boilerplate / empty / null
    got = (remove_common_units(_docs(texts), sep=sep, min_docs=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _boiler_ref(texts, sep, 5)
    for i, (clean, nrm) in enumerate(want):
        assert got.loc[i, "text_clean"] == clean, i
        assert got.loc[i, "n_removed"] == nrm, i


def test_unit_df_map_sharded_path_matches_driver_finish(ray_session):
    """driver_finish_rows=0 forces the hash-sharded distributed finish —
    must produce the same (unit, df >= min_df) map as the driver merge."""
    from ict_log_parser_ray.functions.curation import _unit_df_map

    texts = [u for i in range(10)
             for u in ("a b c", "a b", "a x%d" % i)] + ["", None]
    docs = _docs(texts).materialize()
    drv = _unit_df_map(docs, " ", min_df=2).sort_values("u")
    shd = _unit_df_map(docs, " ", min_df=2,
                       driver_finish_rows=0).sort_values("u")
    drv = drv.loc[drv["df"] >= 2].reset_index(drop=True)
    shd = shd.reset_index(drop=True)
    pd.testing.assert_frame_equal(drv, shd)


def test_remove_common_units_frac_threshold(ray_session):
    texts = ["a x%d" % i for i in range(10)]   # 'a' in all 10 docs
    got = (remove_common_units(_docs(texts), sep=" ", min_doc_frac=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (got["text_clean"] == ["x%d" % i for i in range(10)]).all()
    assert (got["n_removed"] == 1).all()


# ------------------------------------------------------------- chunks

def _chunk_ref(texts, size, stride):
    out = []
    for i, t in enumerate(texts):
        t = t or ""
        n = -(-max(len(t), 1) // stride)
        for k in range(n):
            out.append((i, k, t[k * stride:k * stride + size]))
    return out


@pytest.mark.parametrize("size,stride", [(100, 80), (10, 10), (8, 5)])
def test_chunk_documents_matches_reference(ray_session, size, stride):
    rng = np.random.default_rng(11)
    texts = ["".join(rng.choice(list("abcdef "), rng.integers(0, 300)))
             for _ in range(30)] + ["", None, "short"]
    got = (chunk_documents(_docs(texts), size=size, stride=stride)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    want = _chunk_ref(texts, size, stride)
    assert len(got) == len(want)
    for row, (d, k, c) in zip(got.itertuples(index=False), want):
        assert (row.doc_id, row.chunk_idx, row.chunk) == (d, k, c)


def _pack_ref(lens, budget):
    seq, fill, cur = [], 0, -1
    for i, ln in enumerate(lens):
        if i == 0 or fill + ln > budget:
            cur += 1
            fill = ln
        else:
            fill += ln
        seq.append(cur)
    return seq


@pytest.mark.parametrize("budget", [1, 7, 50, 10_000])
def test_greedy_pack_indices_matches_loop_reference(ray_session, budget):
    from ict_log_parser_ray.functions.curation import greedy_pack_indices

    rng = np.random.default_rng(3)
    for n in [0, 1, 2, 17, 1000]:
        lens = rng.integers(0, 30, n)
        got = greedy_pack_indices(lens, budget)
        assert got.tolist() == _pack_ref(lens.tolist(), budget), (n, budget)
    # over-budget items own their sequence; zero-length rides along
    lens = [5, 100, 0, 3, 100, 100, 1]
    assert (greedy_pack_indices(np.array(lens), 10).tolist()
            == _pack_ref(lens, 10))


def test_pack_sequences_matches_per_part_reference(ray_session):
    from ict_log_parser_ray.functions.curation import pack_sequences

    rng = np.random.default_rng(5)
    n = 500
    lens = rng.integers(0, 400, n).astype("int64")
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array(lens, pa.int64())}))
    got = (pack_sequences(docs, budget=700, nparts=4, len_col="n_chars")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (got["part"] == got["doc_id"] % 4).all()
    for p in range(4):
        sub = got.loc[got["part"] == p].sort_values("doc_id")
        want = _pack_ref(lens[sub["doc_id"].to_numpy()].tolist(), 700)
        assert sub["seq"].tolist() == want, p


def _rep_ref(texts):
    out = []
    for t in texts:
        ws = (t or "").split(" ")
        nw, nd = len(ws), len(set(ws))
        bigrams = list(zip(ws, ws[1:]))
        n2g = max(nw - 1, 0)
        top2 = max([bigrams.count(b) for b in set(bigrams)], default=0)
        keep = int((nw - nd) * 10 <= 3 * nw and top2 * 5 <= n2g)
        out.append((nw, nd, n2g, top2, keep))
    return out


def test_repetition_stats_matches_reference(ray_session):
    from ict_log_parser_ray.functions.curation import repetition_stats

    texts = [
        "a b c d e f g h",                 # clean → keep
        "spam spam spam spam spam",        # dup words + dominant 2gram
        "x y x y x y x y x y",             # all-distinct-fail? nd=2
        "one two three two one four five six seven eight nine ten",
        "solo",                            # single word
        "", None,                          # empty / null
        " ".join("w%d" % (i % 32) for i in range(32)),  # nw=32 tie shape
    ]
    got = (repetition_stats(_docs(texts)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, (nw, nd, n2g, top2, keep) in enumerate(_rep_ref(texts)):
        row = got.iloc[i]
        assert (row["n_words"], row["n_distinct"], row["n_2grams"],
                row["top2_count"], row["keep"]) == (nw, nd, n2g, top2,
                                                    keep), i


def test_chunk_documents_rejects_bad_params(ray_session):
    with pytest.raises(ValueError):
        chunk_documents(_docs(["x"]), size=0, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(_docs(["x"]), size=5, stride=0)


# ----------------------------------------------------------- ngram overlap

def test_ngram_overlap_matches_reference(ray_session):
    from ict_log_parser_ray.functions.curation import ngram_overlap

    bench_texts = ["the quick brown fox jumps", "eval suite snippet here"]
    corpus_texts = [
        "the quick brown fox jumps over the lazy dog",  # shares grams
        "totally unrelated words in this one",          # no overlap
        "quick brown",                                  # <3 words, one gram
        "eval suite snippet here verbatim leak",        # shares grams
        "",                                             # empty → nothing
        None,                                           # null → nothing
        "the quick brown fox jumps",                    # identical to bench
    ]

    def grams(t, n=3):
        w = (t or "").lower().split()
        if not w:
            return set()
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bench_set = set().union(*[grams(t) for t in bench_texts])
    ref = {}
    for i, t in enumerate(corpus_texts):
        g = grams(t)
        ov = len(g & bench_set)
        if ov > 0:
            ref[i + 100] = (len(g), ov)

    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(bench_texts)), pa.int64()),
        "text": pa.array(bench_texts, pa.string())}))
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([i + 100 for i in range(len(corpus_texts))],
                           pa.int64()),
        "text": pa.array(corpus_texts, pa.string())}))
    out = ngram_overlap(corpus, bench, n=3).to_pandas()
    got = {int(r.doc_id): (int(r.n_grams), int(r.n_overlap))
           for r in out.itertuples(index=False)}
    assert got == ref


def test_ngram_overlap_empty_benchmark(ray_session):
    from ict_log_parser_ray.functions.curation import ngram_overlap

    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    corpus = _docs(["some words here that overlap nothing"])
    out = ngram_overlap(corpus, bench, n=3)
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "n_grams", "n_overlap"]


# ------------------------------------------------------------ unit dedup

def test_dedup_units_matches_reference(ray_session):
    from ict_log_parser_ray.functions.curation import dedup_units

    texts = [
        "a b a c b a",                 # repeats of a and b
        "home | nav | home | nav | x",
        "all unique words here",
        "x x x x",                     # collapses to one
        "",
        None,
        "trailing  double",            # split on ' ' yields an empty unit
    ]
    out = dedup_units(_docs(texts), sep=" ").to_pandas() \
        .set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        ws = (t or "").split(" ")
        kept = list(dict.fromkeys(ws))
        assert out.loc[i, "text_clean"] == " ".join(kept), texts[i]
        assert out.loc[i, "n_removed"] == len(ws) - len(kept)


def test_ngram_overlap_sharded_matches_broadcast(ray_session):
    from ict_log_parser_ray.functions.curation import ngram_overlap

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    bench_texts = [" ".join(rng.choice(vocab, 12)) for _ in range(6)]
    corpus_texts = [" ".join(rng.choice(vocab, 20)) for _ in range(60)]
    corpus_texts += [bench_texts[0] + " tail words here", "", None]
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(bench_texts)), pa.int64()),
        "text": pa.array(bench_texts, pa.string())}))
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([i + 1000 for i in range(len(corpus_texts))],
                           pa.int64()),
        "text": pa.array(corpus_texts, pa.string())}))
    want = ngram_overlap(corpus, bench, n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # max_broadcast_grams=1 forces the gram-hash-sharded path
    got = ngram_overlap(corpus, bench, n=3, max_broadcast_grams=1,
                        nparts=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0
