"""Text-analysis stages for training-data pipelines (task brief: language-ID,
quality scoring, token counting, document fingerprinting).

All implemented as a single stateful actor-pool stage (``TextAnalyzer``):
regexes compiled and tables built ONCE per actor in ``__init__``, per-batch
work fully vectorized in pandas/numpy.  Run over the ``documents`` table
(``doc_id, text, lang, source, n_chars``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on "
    "with as by at from not no".split())

# BPE-ish pre-tokenizer: word pieces or single non-space punctuation
TOKEN_RE = r"\w+|[^\w\s]"

# tiny deterministic char-trigram profiles for a handful of languages
_LANG_PROFILES = {
    "en": ("the", "and", "ing", "ion", "ent", "her", "for", "tha"),
    "de": ("der", "die", "und", "ein", "sch", "ich", "den", "cht"),
    "es": ("que", "ión", "los", "ado", "con", "ent", "una", "del"),
    "fr": ("les", "ent", "des", "que", "ion", "une", "eur", "ait"),
}


class TextAnalyzer:
    """map_batches(TextAnalyzer, batch_format='pandas', concurrency=N)."""

    def __init__(self):
        self.token_re = re.compile(TOKEN_RE, re.UNICODE)
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.punct_re = re.compile(r"[^\w\s]")
        self.space_re = re.compile(r"\s+")

    # ---- vectorized feature kernels ----

    def token_count(self, texts: pd.Series) -> pd.Series:
        return texts.str.count(TOKEN_RE).astype("int64")

    def whitespace_token_count(self, texts: pd.Series) -> pd.Series:
        return texts.str.split().str.len().fillna(0).astype("int64")

    def punct_ratio(self, texts: pd.Series) -> pd.Series:
        n = texts.str.len().clip(lower=1)
        return (texts.str.count(r"[^\w\s]") / n).astype("float64")

    def stopword_ratio(self, texts: pd.Series) -> pd.Series:
        def f(ws):
            if not ws:
                return 0.0
            return sum(1 for w in ws if w in STOPWORDS) / len(ws)
        return texts.str.lower().str.findall(r"[a-z]+").map(f).astype("float64")

    def mean_word_len(self, texts: pd.Series) -> pd.Series:
        def f(ws):
            return float(np.mean([len(w) for w in ws])) if ws else 0.0
        return texts.str.findall(r"\w+").map(f).astype("float64")

    def quality_score(self, df: pd.DataFrame) -> pd.Series:
        """Heuristic quality in [0,1]: length, punctuation sanity, stopword
        presence, word-length sanity (Gopher/C4-style filters, simplified)."""
        length_ok = ((df["n_tok"] >= 10) & (df["n_tok"] <= 100_000)).astype(float)
        punct_ok = (df["punct_ratio"] < 0.3).astype(float)
        stop_ok = (df["stopword_ratio"] > 0.01).astype(float)
        wl_ok = ((df["mean_word_len"] > 2) & (df["mean_word_len"] < 12)).astype(float)
        return (0.4 * length_ok + 0.2 * punct_ok + 0.2 * stop_ok + 0.2 * wl_ok)

    def lang_id(self, texts: pd.Series) -> pd.Series:
        """Char-trigram profile vote; deterministic."""
        lowered = texts.str.lower()
        scores = {}
        for lang, tris in _LANG_PROFILES.items():
            s = None
            for t in tris:
                c = lowered.str.count(re.escape(t))
                s = c if s is None else s + c
            scores[lang] = s
        m = pd.DataFrame(scores)
        best = m.idxmax(axis=1)
        best[m.max(axis=1) == 0] = "unk"
        return best

    def fingerprint(self, texts: pd.Series) -> pd.Series:
        """64-bit rolling (polynomial) hash over whitespace tokens —
        deterministic, order-sensitive document fingerprint.

        Fully vectorized (round 1 looped Python per word per doc): words
        hashed C-side in one call (pandas row hash — stable across
        processes, unlike ``hash()``), then the per-doc polynomial
        h = Σ hash(w_i)·B^(L−1−i) (mod 2^64) is one power-table lookup +
        one scatter-add over the exploded word stream."""
        from pandas.util import hash_pandas_object

        sw = texts.fillna("").str.split()
        lens = sw.str.len().fillna(0).astype(int).to_numpy()
        n = len(texts)
        out = np.zeros(n, np.uint64)
        if lens.sum():
            row = np.repeat(np.arange(n), lens)
            words = pd.Series(np.concatenate(
                [np.asarray(ws, dtype=object) for ws in sw if len(ws)]))
            hv = hash_pandas_object(words, index=False).to_numpy()
            starts = np.cumsum(lens) - lens
            idx_in_doc = np.arange(len(hv)) - np.repeat(starts, lens)
            p = np.repeat(lens, lens) - 1 - idx_in_doc
            B = np.uint64(1_000_003)
            with np.errstate(over="ignore"):
                pows = np.ones(int(p.max()) + 1, np.uint64)
                if len(pows) > 1:
                    pows[1:] = np.cumprod(
                        np.full(len(pows) - 1, B, np.uint64))
                contrib = hv * pows[p]
                np.add.at(out, row, contrib)
        return pd.Series((out & np.uint64(0x7FFF_FFFF_FFFF_FFFF))
                         .astype("int64"), index=texts.index)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        df = df.copy()
        df["n_tok"] = self.token_count(texts)
        df["n_ws_tok"] = self.whitespace_token_count(texts)
        df["punct_ratio"] = self.punct_ratio(texts)
        df["stopword_ratio"] = self.stopword_ratio(texts)
        df["mean_word_len"] = self.mean_word_len(texts)
        df["quality"] = self.quality_score(df)
        df["lang_pred"] = self.lang_id(texts)
        df["fingerprint"] = self.fingerprint(texts)
        return df


def analyze_documents(ds, concurrency=(1, 8), batch_size: int = 4096):
    return ds.map_batches(TextAnalyzer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def quality_table(ds, batch_size: int = 4096, keep_cols: list | None = None):
    """Lean SQL-expressible slice of the analyzer: token count, ratios,
    quality score and language-ID — no fingerprint (its pandas row hash has
    no SQL twin).  Stateless map: the kernels are pandas ``.str`` calls whose
    regex compile is cached process-wide, so an actor pool buys nothing.

    Float contract (driver value-hash oracle): every ratio is an exact
    IEEE division of two int-derived doubles and the quality score is the
    same left-to-right 0.4a+0.2b+0.2c+0.2d sum in both engines, so the
    round(6) values match DuckDB bitwise (verified on the sf0.01 table)."""
    an = TextAnalyzer()

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        out["n_tok"] = an.token_count(texts)
        punct = an.punct_ratio(texts)
        stop = an.stopword_ratio(texts)
        mwl = an.mean_word_len(texts)
        q = an.quality_score(pd.DataFrame({
            "n_tok": out["n_tok"], "punct_ratio": punct,
            "stopword_ratio": stop, "mean_word_len": mwl}))
        out["quality"] = q.round(6)
        out["lang_pred"] = an.lang_id(texts)
        out["punct_ratio"] = punct.round(6)
        out["stopword_ratio"] = stop.round(6)
        out["mean_word_len"] = mwl.round(6)
        for c in keep_cols or []:   # pass-through label/grouping columns
            out[c] = df[c].to_numpy()
        return out

    return ds.map_batches(feats, batch_format="pandas",
                          batch_size=batch_size)
