"""Tests for the training-data operators: text analysis, document dedup,
similarity search, multimodal plumbing."""

import re

import numpy as np
import pyarrow as pa
import pytest


# ------------------------------------------------------------------ text

def test_text_analyzer_features(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.functions.text import TOKEN_RE, analyze_documents

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = analyze_documents(docs).take(50)
    tok_re = re.compile(TOKEN_RE)
    for r in out:
        assert r["n_tok"] == len(tok_re.findall(r["text"]))
        assert r["n_ws_tok"] == len(r["text"].split())
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert r["lang_pred"] in ("en", "de", "es", "fr", "unk")
        assert isinstance(r["fingerprint"], int)


def test_fingerprint_deterministic_and_discriminative(ray_session):
    import pandas as pd

    from ict_log_parser_ray.functions.text import TextAnalyzer

    ta = TextAnalyzer()
    s = pd.Series(["the quick brown fox", "the quick brown fox", "another doc"])
    fp = ta.fingerprint(s)
    assert fp[0] == fp[1] != fp[2]
    # stable across instances/processes (FNV-based, not PYTHONHASHSEED)
    assert fp[0] == TextAnalyzer().fingerprint(pd.Series(["the quick brown fox"]))[0]


# ------------------------------------------------------------------ dedup

def _near_dup_docs():
    base = ("spark group query row data slow small filter customer line the "
            "batch value merge sort window hash scan join order table fast")
    docs = {
        0: base,
        1: base,                                 # exact dup of 0
        2: base.replace("customer", "client"),   # near dup of 0
        3: "completely different text about gardens flowers and rain",
        4: "unrelated short doc",
        5: base.replace("spark", "flink").replace("row", "column"),  # near dup
    }
    return pa.table({
        "doc_id": pa.array(list(docs.keys()), pa.int64()),
        "text": pa.array(list(docs.values())),
    })


def test_ngram_jaccard_kernel():
    from ict_log_parser_ray.functions.dedup_docs import ngram_jaccard

    assert ngram_jaccard("abcdef", "abcdef") == 1.0
    assert ngram_jaccard("abcdef", "zzzzzz") == 0.0
    mid = ngram_jaccard("the quick brown fox", "the quick brown cat")
    assert 0.3 < mid < 1.0


def test_exact_duplicate_groups(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import exact_duplicate_groups

    ds = rd.from_arrow(_near_dup_docs())
    groups = exact_duplicate_groups(ds).take_all()
    assert len(groups) == 1
    assert groups[0]["n"] == 2
    assert groups[0]["keep_doc_id"] == 0


def test_minhash_lsh_finds_planted_near_dups(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import minhash_duplicate_pairs

    ds = rd.from_arrow(_near_dup_docs())
    pairs = minhash_duplicate_pairs(ds, threshold=0.5).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in got            # exact dup
    assert (0, 2) in got or (1, 2) in got   # near dup
    assert not any(3 in p or 4 in p for p in got)  # unrelated stays out


def _wordgram_bruteforce(texts, n=3, threshold=0.5):
    """Exact all-pairs word-n-gram Jaccard >= threshold, pure Python."""
    sets = []
    for t in texts:
        w = (t or "").lower().split()
        if not w:
            sets.append(set())
        elif len(w) < n:
            sets.append({tuple(w)})     # short-doc convention: one gram
        else:
            sets.append({tuple(w[i:i + n]) for i in range(len(w) - n + 1)})
    out = []
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= threshold:
                out.append((a, b, jac))
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_word_ngram_pairs_match_bruteforce(ray_session, threshold):
    """Prefix-filter recall is provably 1.0, so the output must EQUAL the
    exact all-pairs threshold set — ids and Jaccard values — at any
    threshold, including short (<n words), empty, and null docs."""
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        word_ngram_duplicate_pairs)

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 12))))
             for _ in range(50)]
    texts += [texts[0], texts[1] + " extra tail words here",
              None, "", "one", "two words", "two words"]
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    got = (word_ngram_duplicate_pairs(rd.from_arrow(docs), n=3,
                                      threshold=threshold)
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    want = _wordgram_bruteforce(texts, 3, threshold)
    assert list(map(tuple, got[["doc_a", "doc_b"]].to_numpy())) == \
        [(a, b) for a, b, _ in want]
    np.testing.assert_allclose(got["jaccard"].to_numpy(),
                               [j for _, _, j in want], rtol=1e-12)


def test_word_ngram_pairs_oversized_bucket_stays_exact(ray_session):
    """A bucket with more members than the minhash star-overflow cap (50)
    must still emit ALL pairs — the exact join's guarantee; star pairs
    would lose C(60,2)-59 of them.  The length filter can't prune
    identical docs (equal gram counts), so this is the worst case."""
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        word_ngram_duplicate_pairs)

    texts = ["alpha beta gamma delta epsilon zeta"] * 60
    docs = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    got = word_ngram_duplicate_pairs(rd.from_arrow(docs), n=3,
                                     threshold=0.9).to_pandas()
    assert len(got) == 60 * 59 // 2
    assert (got["jaccard"] == 1.0).all()


def test_word_ngram_pairs_hash_join_path(ray_session):
    """broadcast_threshold=0 forces the big-corpus two-hash-join verify —
    must produce the same exact set as the broadcast path."""
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        word_ngram_duplicate_pairs)

    ds = rd.from_arrow(_near_dup_docs())
    big = (word_ngram_duplicate_pairs(ds, n=3, threshold=0.3,
                                      broadcast_threshold=0)
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    small = (word_ngram_duplicate_pairs(rd.from_arrow(_near_dup_docs()),
                                        n=3, threshold=0.3)
             .to_pandas().sort_values(["doc_a", "doc_b"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(big, small)
    assert (0, 1) in set(map(tuple, big[["doc_a", "doc_b"]].to_numpy()))


def test_word_ngram_cross_pairs_matches_filtered_selfjoin(ray_session):
    """Bipartite cross pairs == the union self-join's pairs filtered to
    cross-side, correctly ORIENTED (left_doc from the left side) — at a
    low threshold so within-side pairs exist and must be excluded."""
    import ray.data as rd

    import pyarrow.compute as pc

    docs = _near_dup_docs()
    left_ids = {0, 2, 4}            # includes one of the near-dup cluster
    lm = pa.array([i in left_ids for i in docs["doc_id"].to_pylist()])
    left = rd.from_arrow(docs.filter(lm))
    right = rd.from_arrow(docs.filter(pc.invert(lm)))

    from ict_log_parser_ray.functions.dedup_docs import (
        word_ngram_cross_pairs, word_ngram_duplicate_pairs)

    got = (word_ngram_cross_pairs(left, right, n=3, threshold=0.3)
           .to_pandas())
    got_set = {(int(r.left_doc), int(r.right_doc), round(r.jaccard, 9))
               for r in got.itertuples()}

    full = word_ngram_duplicate_pairs(rd.from_arrow(docs), n=3,
                                      threshold=0.3).to_pandas()
    want = set()
    for r in full.itertuples():
        a, b = int(r.doc_a), int(r.doc_b)
        if (a in left_ids) != (b in left_ids):
            l, rr = (a, b) if a in left_ids else (b, a)
            want.add((l, rr, round(r.jaccard, 9)))
    assert got_set == want and len(want) > 0
    # within-side near-dups exist in the fixture and must be absent
    assert len(full) > len(want)


def test_minhash_cross_pairs_matches_filtered_selfjoin(ray_session):
    """MinHash bipartite variant == the self-join filtered to cross-side
    and oriented — signatures are text-only, so candidate buckets have
    identical membership and the cross output is a deterministic subset."""
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        minhash_cross_pairs, minhash_duplicate_pairs)

    docs = _near_dup_docs()
    left_ids = {0, 2, 4}
    lm = pa.array([i in left_ids for i in docs["doc_id"].to_pylist()])
    import pyarrow.compute as pc
    left = rd.from_arrow(docs.filter(lm))
    right = rd.from_arrow(docs.filter(pc.invert(lm)))

    got = minhash_cross_pairs(left, right, threshold=0.3).to_pandas()
    got_set = {(int(r.left_doc), int(r.right_doc), round(r.jaccard, 9))
               for r in got.itertuples()}

    full = minhash_duplicate_pairs(rd.from_arrow(docs),
                                   threshold=0.3).to_pandas()
    want = set()
    for r in full.itertuples():
        a, b = int(r.doc_a), int(r.doc_b)
        if (a in left_ids) != (b in left_ids):
            l, rr = (a, b) if a in left_ids else (b, a)
            want.add((l, rr, round(r.jaccard, 9)))
    assert got_set == want and len(want) > 0
    assert len(full) > len(want)


def test_pair_dedup_distributed_branch_matches_driver_branch(ray_session):
    """collect_threshold=0 forces the >5M-pair DISTRIBUTED pair-dedup
    paths (minhash: groupby+Count; wordgram: groupby+Min×4 then the
    positional filter) — the branch production runs at scale but the
    fixture never reaches.  Must equal the driver-collect branch."""
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        minhash_duplicate_pairs, word_ngram_duplicate_pairs)

    for fn, kw in ((word_ngram_duplicate_pairs, {"n": 3}),
                   (minhash_duplicate_pairs, {})):
        small = (fn(rd.from_arrow(_near_dup_docs()), threshold=0.3, **kw)
                 .to_pandas().sort_values(["doc_a", "doc_b"])
                 .reset_index(drop=True))
        dist = (fn(rd.from_arrow(_near_dup_docs()), threshold=0.3,
                   collect_threshold=0, **kw)
                .to_pandas().sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            dist[["doc_a", "doc_b", "jaccard"]],
            small[["doc_a", "doc_b", "jaccard"]])
        assert len(small) > 0


def test_minhash_index_probe_matches_direct(ray_session, tmp_path):
    """Persisted band index: probing new docs against the written corpus
    index must equal the direct (recompute-everything) bipartite join —
    and must read ONLY the bucket partitions the new batch touches."""
    import os

    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        MinHasher, minhash_cross_pairs, minhash_cross_pairs_indexed,
        touched_bucket_dirs, write_minhash_index)

    docs = _near_dup_docs()
    left_ids = {0, 2, 4}
    lm = pa.array([i in left_ids for i in docs["doc_id"].to_pylist()])
    import pyarrow.compute as pc
    new = rd.from_arrow(docs.filter(lm))
    corpus = rd.from_arrow(docs.filter(pc.invert(lm)))

    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx, nbuckets=64)
    assert os.path.isfile(os.path.join(idx, "_SUCCESS"))

    got = (minhash_cross_pairs_indexed(new, idx, corpus, threshold=0.3)
           .to_pandas())
    want = minhash_cross_pairs(new, corpus, threshold=0.3).to_pandas()
    key = lambda df: sorted((int(r.left_doc), int(r.right_doc),
                             round(r.jaccard, 9))
                            for r in df.itertuples())
    assert key(got) == key(want) and len(want) > 0

    # pruning contract: one doc touches <= bands buckets, fewer than the
    # corpus occupies
    h = MinHasher()
    import pandas as pd
    bk = h(pd.DataFrame({"doc_id": [0],
                         "text": [docs["text"][0].as_py()]}))
    dirs = touched_bucket_dirs(idx, bk["band_key"].to_numpy(), 64)
    total = len([d for d in os.listdir(idx) if d.startswith("bucket=")])
    assert 0 < len(dirs) <= 16 < total


def test_minhash_index_auto_nbuckets_and_keyfilter(ray_session, tmp_path):
    """VERDICT r4 item 2: (a) nbuckets=None auto-sizes corpus-
    proportionally (~256 KB/bucket, power of two, 64..65536); (b) the
    probe-side band-key semi-join filter is exactness-preserving — the
    filtered (default) and forced-unfiltered (keyfilter_max=0) probes
    both equal the direct bipartite join."""
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        _auto_nbuckets, minhash_cross_pairs, minhash_cross_pairs_indexed,
        write_minhash_index)

    # sizing math: 1M docs x 16 bands x 16 B = 256 MB -> 1024 buckets
    assert _auto_nbuckets(1_000_000, 16) == 1024
    assert _auto_nbuckets(100, 16) == 64            # floor
    assert _auto_nbuckets(10_000_000_000, 16) == 65536   # cap
    assert _auto_nbuckets(2_000_000, 16) == 2048    # proportional

    docs = _near_dup_docs()
    left_ids = {0, 2, 4}
    lm = pa.array([i in left_ids for i in docs["doc_id"].to_pylist()])
    new = rd.from_arrow(docs.filter(lm))
    corpus = rd.from_arrow(docs.filter(pc.invert(lm)))

    idx = str(tmp_path / "mh_auto")
    write_minhash_index(corpus, idx)                # nbuckets=None: auto
    import json
    with open(os.path.join(idx, "_params.json")) as f:
        assert json.load(f)["nbuckets"] == 64       # tiny corpus -> floor

    want = minhash_cross_pairs(new, corpus, threshold=0.3).to_pandas()
    key = lambda df: sorted((int(r.left_doc), int(r.right_doc),
                             round(r.jaccard, 9)) for r in df.itertuples())
    filt = minhash_cross_pairs_indexed(new, idx, corpus,
                                       threshold=0.3).to_pandas()
    nofilt = minhash_cross_pairs_indexed(new, idx, corpus, threshold=0.3,
                                         keyfilter_max=0).to_pandas()
    assert key(filt) == key(nofilt) == key(want) and len(want) > 0


def test_minhash_index_incremental_cycle(ray_session, tmp_path):
    """Full incremental loop: build(corpus) → probe(batch1) →
    append(batch1) → probe(batch2) must equal the direct bipartite join
    of batch2 vs corpus ∪ batch1.  Also: probing a missing/incomplete
    index raises instead of silently returning nothing."""
    import os

    import pyarrow.compute as pc
    import pytest
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        append_minhash_index, minhash_cross_pairs,
        minhash_cross_pairs_indexed, write_minhash_index)

    docs = _near_dup_docs()
    ids = docs["doc_id"].to_pylist()
    m_corpus = pa.array([i in {1, 3} for i in ids])
    m_b1 = pa.array([i in {0, 4} for i in ids])        # 0 near-dups 1
    m_b2 = pa.array([i in {2, 5} for i in ids])        # 2,5 near-dup 0/1
    corpus = rd.from_arrow(docs.filter(m_corpus))
    b1 = rd.from_arrow(docs.filter(m_b1))
    b2 = rd.from_arrow(docs.filter(m_b2))

    idx = str(tmp_path / "mh_inc")
    with pytest.raises(FileNotFoundError):
        minhash_cross_pairs_indexed(b1, idx, corpus, threshold=0.3)
    write_minhash_index(corpus, idx, nbuckets=64)

    p1 = minhash_cross_pairs_indexed(b1, idx, corpus,
                                     threshold=0.3).to_pandas()
    w1 = minhash_cross_pairs(b1, corpus, threshold=0.3).to_pandas()
    key = lambda df: sorted((int(r.left_doc), int(r.right_doc),
                             round(r.jaccard, 9)) for r in df.itertuples())
    assert key(p1) == key(w1) and len(w1) > 0

    append_minhash_index(b1, idx)
    big_corpus = rd.from_arrow(docs.filter(pc.or_(m_corpus, m_b1)))
    p2 = minhash_cross_pairs_indexed(b2, idx, big_corpus,
                                     threshold=0.3).to_pandas()
    w2 = minhash_cross_pairs(b2, big_corpus, threshold=0.3).to_pandas()
    assert key(p2) == key(w2) and len(w2) > 0
    # batch2 must see BOTH generations: a corpus-built match and an
    # appended-batch1 match
    rights = {int(r) for r in p2["right_doc"]}
    assert rights & {1, 3} and rights & {0, 4}


def test_incremental_auto_compact(ray_session, tmp_path):
    """auto_compact_files keeps per-bucket file counts bounded across
    consecutive incremental_dedup_batch cycles without changing results
    (the steady-state loop measured ~+1 s/cycle of probe creep per
    append; single-writer steady state, so compaction here is safe)."""
    import glob
    import os

    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        incremental_dedup_batch, write_minhash_index)

    docs = _near_dup_docs()
    ids = docs["doc_id"].to_pylist()
    corpus = rd.from_arrow(docs.filter(pa.array([i in {1, 3} for i in ids])))
    idx_a = str(tmp_path / "auto_on")
    idx_b = str(tmp_path / "auto_off")
    write_minhash_index(corpus, idx_a, nbuckets=8)
    write_minhash_index(corpus, idx_b, nbuckets=8)

    def max_files(idx):
        return max(len(os.listdir(d))
                   for d in glob.glob(os.path.join(idx, "bucket=*")))

    kept_counts = []
    for cyc in range(4):
        m = pa.array([i in {(2 * cyc) % 6, (2 * cyc + 4) % 6}
                      for i in ids])
        bt = docs.filter(m)
        bt = bt.set_column(
            bt.schema.get_field_index("doc_id"), "doc_id",
            pa.array([100 + 10 * cyc + j for j in range(bt.num_rows)],
                     pa.int64()))
        batch = rd.from_arrow(bt)
        ka, _ = incremental_dedup_batch(batch, idx_a, corpus,
                                        threshold=0.3,
                                        auto_compact_files=2)
        kb, _ = incremental_dedup_batch(batch, idx_b, corpus,
                                        threshold=0.3,
                                        auto_compact_files=0)
        assert sorted(r["doc_id"] for r in ka.take_all()) == \
            sorted(r["doc_id"] for r in kb.take_all())
        kept_counts.append(ka.count())
    # compaction keeps the file count flat; the unmanaged index sprawls
    assert max_files(idx_a) <= 2 < max_files(idx_b)
    assert any(k > 0 for k in kept_counts)


def test_compact_minhash_index(ray_session, tmp_path):
    """Crash-retried append (same batch twice) → compact → probe results
    identical to a FRESH index build over corpus ∪ batch; duplicate rows
    gone; buckets that needed no work keep their original files."""
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        append_minhash_index, compact_minhash_index,
        minhash_cross_pairs_indexed, write_minhash_index)

    docs = _near_dup_docs()
    ids = docs["doc_id"].to_pylist()
    m_corpus = pa.array([i in {1, 3} for i in ids])
    m_b1 = pa.array([i in {0, 4} for i in ids])
    m_b2 = pa.array([i in {2, 5} for i in ids])
    corpus = rd.from_arrow(docs.filter(m_corpus))
    b1 = rd.from_arrow(docs.filter(m_b1))
    b2 = rd.from_arrow(docs.filter(m_b2))

    idx = str(tmp_path / "mh_compact")
    write_minhash_index(corpus, idx, nbuckets=64)
    append_minhash_index(b1, idx)
    append_minhash_index(b1, idx)            # the crash-retry duplicate

    def rows(d):
        fs = sorted(glob.glob(os.path.join(d, "bucket=*", "*.parquet")))
        return pa.concat_tables([pq.read_table(f) for f in fs])

    before = rows(idx)
    untouched = [d for d in sorted(glob.glob(os.path.join(idx, "bucket=*")))
                 if len(glob.glob(os.path.join(d, "*.parquet"))) == 1]
    keep_files = {d: glob.glob(os.path.join(d, "*.parquet"))
                  for d in untouched}

    stats = compact_minhash_index(idx)
    after = rows(idx)
    assert stats["rows_before"] == before.num_rows
    assert stats["rows_after"] == after.num_rows < before.num_rows
    # deduped exactly: distinct (band_key, doc_id) preserved
    key = lambda t: sorted(zip(t["band_key"].to_pylist(),
                               t["doc_id"].to_pylist()))
    assert key(after) == sorted(set(key(before)))
    # single-file clean buckets were not rewritten
    for d, fs in keep_files.items():
        assert glob.glob(os.path.join(d, "*.parquet")) == fs

    # probe equality vs a FRESH build over corpus ∪ b1
    big_corpus = rd.from_arrow(docs.filter(pc.or_(m_corpus, m_b1)))
    fresh = str(tmp_path / "mh_fresh")
    write_minhash_index(big_corpus, fresh, nbuckets=64)
    pkey = lambda df: sorted((int(r.left_doc), int(r.right_doc),
                              round(r.jaccard, 9)) for r in df.itertuples())
    got = minhash_cross_pairs_indexed(b2, idx, big_corpus,
                                      threshold=0.3).to_pandas()
    want = minhash_cross_pairs_indexed(b2, fresh, big_corpus,
                                       threshold=0.3).to_pandas()
    assert pkey(got) == pkey(want) and len(want) > 0
    # idempotent: a second compact is a no-op
    stats2 = compact_minhash_index(idx)
    assert stats2["rewritten"] == 0
    assert stats2["rows_after"] == stats["rows_after"]

    # crash window: compacted file landed but old files NOT yet removed
    # (simulated by duplicating a bucket's file) — rows only DUPLICATE,
    # never vanish: probe results unchanged, and the next compact heals
    import shutil
    victim = next(d for d in sorted(glob.glob(os.path.join(idx, "bucket=*")))
                  if glob.glob(os.path.join(d, "*.parquet")))
    f0 = glob.glob(os.path.join(victim, "*.parquet"))[0]
    shutil.copy(f0, os.path.join(victim, "crashleft-copy.parquet"))
    got_crash = minhash_cross_pairs_indexed(b2, idx, big_corpus,
                                            threshold=0.3).to_pandas()
    assert pkey(got_crash) == pkey(want)
    stats3 = compact_minhash_index(idx)
    assert stats3["rows_after"] == stats["rows_after"]
    assert len(glob.glob(os.path.join(victim, "*.parquet"))) == 1


def test_incremental_dedup_batch_cycle(ray_session, tmp_path):
    """The one-call cycle: batch1's corpus-dup is dropped and survivors
    appended, so batch2's dup-of-a-batch1-survivor is then dropped too;
    clean docs always pass."""
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        incremental_dedup_batch, write_minhash_index)

    docs = _near_dup_docs()
    ids = docs["doc_id"].to_pylist()

    def sub(keep):
        return rd.from_arrow(docs.filter(
            pa.array([i in keep for i in ids])))

    corpus = sub({1})                 # base corpus: one doc
    b1 = sub({0, 3})                  # 0 dups corpus-1; 3 is clean
    b2 = sub({2, 4})                  # 2 near-dups 0/1; 4 is clean

    idx = str(tmp_path / "mh_cycle")
    write_minhash_index(corpus, idx, nbuckets=64)

    kept1, dropped1 = incremental_dedup_batch(b1, idx, corpus,
                                              threshold=0.3)
    assert list(dropped1) == [0]
    assert sorted(r["doc_id"] for r in kept1.take_all()) == [3]

    corpus2 = sub({1, 3})             # corpus ∪ kept1
    kept2, dropped2 = incremental_dedup_batch(b2, idx, corpus2,
                                              threshold=0.3)
    assert list(dropped2) == [2]
    assert sorted(r["doc_id"] for r in kept2.take_all()) == [4]


def test_cross_pairs_empty_side(ray_session):
    """An empty new-batch (or corpus) side must yield zero pairs, not
    crash — the incremental-dedup steady state is often 'nothing new'."""
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        word_ngram_cross_pairs)

    docs = _near_dup_docs()
    empty = rd.from_arrow(docs.schema.empty_table())
    full = rd.from_arrow(docs)
    assert word_ngram_cross_pairs(empty, full,
                                  threshold=0.3).count() == 0
    assert word_ngram_cross_pairs(full, empty,
                                  threshold=0.3).count() == 0


def test_cross_star_overflow_keeps_both_orientations():
    """Bipartite star overflow must witness BOTH sides (one hub per
    side), and same-side-only buckets must emit nothing."""
    from ict_log_parser_ray.functions.dedup_docs import _bucket_pairs

    ids = [-1, -2, -3, 5, 6, 7]
    pairs = _bucket_pairs(ids, cap=3, what="t", band_key=0,
                          cross_sign_only=True)
    assert all((a < 0) != (b < 0) for a, b in pairs)
    lefts_hit = {a for a, b in pairs if a < 0} | \
        {b for a, b in pairs if b < 0}
    rights_hit = {b for a, b in pairs if b >= 0} | \
        {a for a, b in pairs if a >= 0}
    assert lefts_hit == {-1, -2, -3} and rights_hit == {5, 6, 7}
    assert _bucket_pairs([-1, -2, -3], cap=1, what="t", band_key=0,
                         cross_sign_only=True) == []
    assert _bucket_pairs([4, 5, 6], cap=1, what="t", band_key=0,
                         cross_sign_only=True) == []


def test_simhash_candidates(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        SimHasher, simhash_candidate_pairs)

    ds = rd.from_arrow(_near_dup_docs())
    pairs = simhash_candidate_pairs(ds, max_hamming=6).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in got
    # determinism of the hash itself
    sh = SimHasher()
    assert sh.simhash("hello world") == sh.simhash("hello world")
    assert sh.simhash("hello world") != sh.simhash("goodbye world")


def test_fnv1a_word_hash_matches_duckdb():
    """The d_simhash_pairs oracle recomputes the FNV-1a word hash with a
    recursive-CTE fold over codepoints — pin numpy == DuckDB bit-exactly
    on short/long/digit/non-ascii words (the whole oracle-equality
    argument rests on this fold)."""
    import duckdb
    import pandas as pd

    from ict_log_parser_ray.functions.dedup_docs import SimHasher

    words = ["a", "hello", "x" * 40, "1234", "naïve", "mixedCase",
             "punct.,;", "日本語"]
    got = SimHasher._fnv1a_words(pd.Series(words))
    con = duckdb.connect()
    want = dict(con.sql("""
WITH RECURSIVE fold(w, n, pos, h) AS (
  SELECT w, length(w), 0, CAST(14695981039346656037 AS UBIGINT)
  FROM (SELECT unnest(?) AS w) v
  UNION ALL
  SELECT w, n, pos + 1,
    CAST((CAST(xor(h, CAST(unicode(substr(w, pos + 1, 1)) AS UBIGINT))
          AS HUGEINT) * 1099511628211) % 18446744073709551616 AS UBIGINT)
  FROM fold WHERE pos < n
)
SELECT w, h FROM fold WHERE pos = n
""", params=[words]).fetchall())
    con.close()
    for w, g in zip(words, got):
        assert int(g) == int(want[w]), w


# ------------------------------------------------------------- similarity

def test_knn_bruteforce_matches_numpy(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.functions.similarity import knn_bruteforce

    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    tbl = pa.concat_tables([pa.Table.from_pylist(emb.take_all())])
    vecs = np.array([r for r in tbl["embedding"].to_pylist()], dtype=np.float32)
    ids = np.array(tbl["vec_id"].to_pylist())
    q = vecs[0]

    got = knn_bruteforce(emb, q, k=10)
    got_ids = got["vec_id"].to_pylist()

    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = vn @ qn
    order = np.lexsort((ids, -sims))[:10]
    want_ids = ids[order].tolist()
    assert got_ids == want_ids
    assert got_ids[0] == 0  # self is nearest


def test_knn_ivf_full_probe_equals_exact(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.functions.similarity import (build_ivf,
                                                         knn_bruteforce,
                                                         knn_ivf)

    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = np.array(emb.take(1)[0]["embedding"], dtype=np.float32)
    model = build_ivf(emb, nlist=8)
    exact = knn_bruteforce(emb, q, k=5)["vec_id"].to_pylist()
    approx_full = knn_ivf(emb, q, k=5, nlist=8, nprobe=8, model=model)["vec_id"].to_pylist()
    assert approx_full == exact     # probing all clusters == exact
    approx = knn_ivf(emb, q, k=5, nlist=8, nprobe=3, model=model)["vec_id"].to_pylist()
    assert len(set(approx) & set(exact)) >= 3  # decent recall at nprobe=3


def test_embedding_near_dup_pairs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.functions.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    # plant near-dups: vec 20 ≈ vec 0, vec 21 ≈ vec 1
    dups = np.vstack([base[0] + 0.01 * rng.normal(size=16),
                      base[1] + 0.01 * rng.normal(size=16)]).astype(np.float32)
    vecs = np.vstack([base, dups])
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    pairs = embedding_near_dup_pairs(rd.from_arrow(tbl), threshold=0.98,
                                     nlist=4).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 20) in got and (1, 21) in got
    assert all(r["cosine"] >= 0.98 for r in pairs)


# ------------------------------------------------------------- multimodal

def test_media_feature_plumbing(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.functions.multimodal import (
        MediaFeatureExtractor, extract_media_features, synth_media_table)

    tbl = synth_media_table(n=30)
    out = extract_media_features(rd.from_arrow(tbl)).take_all()
    assert len(out) == 30
    for r in out:
        assert "payload" not in r          # blobs dropped from feature table
        assert len(r["features"]) == 8
        assert r["payload_bytes"] > 0
    # deterministic features
    f1 = MediaFeatureExtractor()._fake_features(b"abc")
    f2 = MediaFeatureExtractor()._fake_features(b"abc")
    assert np.allclose(f1, f2)


def test_media_real_decode_unsupported_formats_raise():
    """Non-netpbm formats still raise at the exact point PIL/pyav would
    run — the real path is honest about what it can decode."""
    from ict_log_parser_ray.functions.multimodal import MediaFeatureExtractor

    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decode="real")._real_features(
            b"\x89PNG....", "image/png")


def test_netpbm_roundtrip_and_header_variants():
    """decode∘encode is the identity; the parser handles comments and
    multi-whitespace headers (the full binary-netpbm grammar)."""
    from ict_log_parser_ray.functions.multimodal import (decode_netpbm,
                                                         encode_netpbm)

    rng = np.random.default_rng(3)
    for shape in [(1, 1, 3), (5, 7, 3), (7, 5, 1), (64, 64, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_netpbm(encode_netpbm(img)), img)
    # comment + tabs/newlines in header
    raster = bytes(range(12))
    hdr = b"P6 # a comment\n# another\n 2\t2 \n255\n"
    assert np.array_equal(decode_netpbm(hdr + raster),
                          np.frombuffer(raster, np.uint8).reshape(2, 2, 3))
    with pytest.raises(NotImplementedError):
        decode_netpbm(b"P3\n1 1\n255\n0 0 0")    # ascii netpbm: not ours
    with pytest.raises(NotImplementedError):
        decode_netpbm(b"P6\n1 1\n65535\n" + bytes(6))  # 16-bit raster


def test_resize_box_golden():
    """Box-average golden values, integer and NON-integer ratios."""
    from ict_log_parser_ray.functions.multimodal import resize_box

    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = resize_box(img, 2, 2)
    # 2x2 boxes: mean([0,1,4,5])=2.5→round-half-even 2; ([2,3,6,7])=4.5→4
    assert out.shape == (2, 2, 1)
    assert out.reshape(-1).tolist() == [2, 4, 10, 12]
    # non-integer 3→2: rows [0], [1,2] per numpy edge arithmetic
    img3 = np.array([[[0]], [[30]], [[60]]], np.uint8)  # 3x1
    out3 = resize_box(img3, 1, 2)
    assert out3.reshape(-1).tolist() == [0, 45]
    # constant image stays constant at any ratio
    const = np.full((7, 5, 3), 123, np.uint8)
    assert (resize_box(const, 3, 2) == 123).all()


def test_media_real_resize_end_to_end(ray_session):
    """decode="real" drives REAL pixels through the actor-pool resize:
    output payload decodes to exactly resize_box(decode(input)) at the
    _target geometry; small images pass through byte-identical; audio
    rows untouched."""
    import ray.data as rd

    from ict_log_parser_ray.functions.multimodal import (
        MediaResizer, decode_netpbm, resize_box, resize_media,
        synth_media_table)

    full = synth_media_table(n=24, real_images=True)
    # real mode handles netpbm images + passes audio through; VIDEO rows
    # raise at the pyav point (asserted below) — filter them like a real
    # pipeline would route by kind
    tbl = full.filter(pa.compute.not_equal(full["kind"], "video"))
    out = resize_media(rd.from_arrow(tbl), max_side=32,
                       decode="real").take_all()
    by_id = {r["media_id"]: r for r in out}
    for src in tbl.to_pylist():
        got = by_id[src["media_id"]]
        if src["kind"] != "image":
            assert got["payload"] == src["payload"]
            continue
        img = decode_netpbm(src["payload"])
        ih, iw = img.shape[:2]
        tw, th = MediaResizer._target(iw, ih, 32)
        assert (got["width"], got["height"]) == (tw, th)
        want = img if (tw, th) == (iw, ih) else resize_box(img, tw, th)
        assert np.array_equal(decode_netpbm(got["payload"]), want)
    vids = full.filter(pa.compute.equal(full["kind"], "video"))
    with pytest.raises(Exception, match="video/mp4"):
        resize_media(rd.from_arrow(vids), max_side=32,
                     decode="real").take_all()


def test_media_real_features_end_to_end(ray_session):
    """decode="real" feature extraction computes pixel statistics from
    the actual raster (golden-checked on a constant image)."""
    import ray.data as rd

    from ict_log_parser_ray.functions.multimodal import (
        MediaFeatureExtractor, encode_netpbm, extract_media_features,
        synth_media_table)

    # golden: constant 100-valued 4x8 RGB image
    const = np.full((4, 8, 3), 100, np.uint8)
    f = MediaFeatureExtractor(decode="real")._real_features(
        encode_netpbm(const), "image/x-portable-pixmap")
    assert abs(f[0] - 100 / 255) < 1e-6 and f[1] == 0.0
    assert abs(f[4] - 8 / 4096) < 1e-9 and abs(f[5] - 4 / 4096) < 1e-9
    assert abs(f[6] - 2.0) < 1e-6 and f[7] == 0.0

    # end-to-end over the real-image synth table (images only)
    tbl = synth_media_table(n=24, real_images=True)
    imgs = tbl.filter(pa.compute.equal(tbl["kind"], "image"))
    out = extract_media_features(rd.from_arrow(imgs),
                                 decode="real").take_all()
    assert len(out) == imgs.num_rows
    for r in out:
        assert len(r["features"]) == 8
        assert all(np.isfinite(v) for v in r["features"])


# ------------------------------------------- round-2 scale-fix regressions

def test_ivf_index_reads_only_probed_partitions(ray_session, tmp_path):
    """knn over a persisted IVF index must touch only nprobe/nlist
    partition dirs, and its result must equal the in-stream probe path."""
    import os

    import ray.data as rd

    from ict_log_parser_ray.functions.similarity import (
        build_ivf, knn_ivf, probed_partition_dirs, write_ivf_index)

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(400, 16)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array([v.tolist() for v in emb],
                              pa.list_(pa.float32()))}))
    model = build_ivf(ds, nlist=8)
    idx = str(tmp_path / "ivf")
    write_ivf_index(ds, idx, nlist=8, model=model)
    q = emb[3]

    dirs = probed_partition_dirs(idx, q, nprobe=3)
    assert len(dirs) == 3
    all_parts = [d for d in os.listdir(idx) if d.startswith("cluster=")]
    assert len(all_parts) > 3  # the index really has more partitions

    top_idx = knn_ivf(None, q, k=5, nprobe=3, index_dir=idx)
    top_stream = knn_ivf(ds, q, k=5, nlist=8, nprobe=3, model=model)
    assert top_idx["vec_id"].to_pylist() == top_stream["vec_id"].to_pylist()

    # full probe over the index == exact brute force
    from ict_log_parser_ray.functions.similarity import knn_bruteforce
    full = knn_ivf(None, q, k=5, nprobe=8, index_dir=idx)
    exact = knn_bruteforce(ds, q, k=5)
    assert full["vec_id"].to_pylist() == exact["vec_id"].to_pylist()


def test_ivf_index_append_cycle(ray_session, tmp_path):
    """Incremental IVF: build(base) → append(new) → full-probe == exact
    brute force over base ∪ new (saved centroids re-used, no re-train).
    Appending to an incomplete index raises."""
    import pytest
    import ray.data as rd

    from ict_log_parser_ray.functions.similarity import (
        append_ivf_index, knn_bruteforce, knn_ivf, write_ivf_index)

    rng = np.random.default_rng(11)
    emb = rng.normal(size=(300, 16)).astype(np.float32)

    def mk(lo, hi):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(range(lo, hi), pa.int64()),
            "embedding": pa.array([v.tolist() for v in emb[lo:hi]],
                                  pa.list_(pa.float32()))}))

    base, new = mk(0, 200), mk(200, 300)
    idx = str(tmp_path / "ivf_inc")
    with pytest.raises(FileNotFoundError):
        append_ivf_index(new, idx)
    write_ivf_index(base, idx, nlist=8)
    append_ivf_index(new, idx)

    q = emb[250]                      # an appended vector must be findable
    full = knn_ivf(None, q, k=5, nprobe=8, index_dir=idx)
    exact = knn_bruteforce(mk(0, 300), q, k=5)
    assert full["vec_id"].to_pylist() == exact["vec_id"].to_pylist()
    assert 250 in full["vec_id"].to_pylist()


def test_embedding_near_dup_tiling_no_pair_loss(ray_session):
    """A cluster larger than the tile size must still yield every pair
    (round 1 truncated at a cap and silently dropped pairs)."""
    import ray.data as rd

    from ict_log_parser_ray.functions.similarity import \
        embedding_near_dup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(size=16).astype(np.float32)
    n = 20
    emb = np.stack([base + rng.normal(scale=1e-3, size=16).astype(np.float32)
                    for _ in range(n)])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in emb],
                              pa.list_(pa.float32()))}))
    pairs = embedding_near_dup_pairs(ds, threshold=0.99, nlist=1,
                                     tile=6).take_all()
    assert len(pairs) == n * (n - 1) // 2  # every pair, despite tile=6
    got = {(int(r["id_a"]), int(r["id_b"])) for r in pairs}
    assert len(got) == n * (n - 1) // 2


def test_minhash_star_pairs_on_overflow(ray_session):
    """Buckets past the cap emit star pairs: planted dups stay connected
    (same connected component), nothing is silently dropped."""
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import \
        minhash_duplicate_pairs

    n = 12
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["the same degenerate boilerplate text repeated"] * n),
    })
    pairs = minhash_duplicate_pairs(rd.from_arrow(docs), threshold=0.9,
                                    cap=5).take_all()
    # star topology: every doc connected to doc 0 at minimum
    import collections
    adj = collections.defaultdict(set)
    for r in pairs:
        adj[int(r["doc_a"])].add(int(r["doc_b"]))
        adj[int(r["doc_b"])].add(int(r["doc_a"]))
    seen, stack = set(), [0]
    while stack:
        v = stack.pop()
        if v in seen:
            continue
        seen.add(v)
        stack.extend(adj[v])
    assert seen == set(range(n))


def test_attempt_last_record_wins(ray_session):
    """parity.py semantics: multiple BTEST-END rows → LAST one's status/ts
    win (not alphabetic max); multiple headers → last header's fields win,
    start_ts = min across headers."""
    import ray.data as rd

    from ict_log_parser_ray.stages.attempts import ranked_attempts
    from ict_log_parser_ray.stages.parse import parse_dataset

    rows = pa.table({
        "conv_id": pa.array(["c1"] * 4 + ["c2"] * 2),
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1], pa.int32()),
        "role": pa.array(["tool"] * 6),
        "text": pa.array([
            "{@BTEST|SER_A|00|240101120000|1|PAN_A}",
            "{@BTEST-END|00|240101120500}",          # pass END (earlier)
            "{@BTEST|SER_B|01|240101130000|2|PAN_B}",  # later header
            "{@BTEST-END|01|240101130500}",          # fail END (last → wins)
            "{@BTEST|SER_C|00|240102120000|1|PAN_C}",
            "{@BTEST-END|00|240102120500}",
        ]),
        "tool": pa.array(["T1"] * 6),
        "ts": pa.array([0, 1, 2, 3, 0, 1], pa.timestamp("us")),
    })
    att = {r["conv_id"]: r
           for r in ranked_attempts(parse_dataset(rd.from_arrow(rows))).take_all()}
    a = att["c1"]
    assert a["att_status"] == "fail"      # last END wins ('pass' > 'fail' alphabetically!)
    assert a["serial"] == "SER_B"         # last header wins
    assert a["panel_serial"] == "PAN_B"
    assert a["board_index"] == 2
    import datetime as dt
    # start_ts = MIN over headers (parity keeps the earliest start)
    assert a["start_ts"] == int(dt.datetime(2024, 1, 1, 12, 0, 0).timestamp()
                                * 1_000_000)
    assert att["c2"]["att_status"] == "pass"


def test_minhash_pairs_golden_sf001(ray_session):
    """Golden lock of the verified near-dup PAIR SET over the driver's
    sf0.01 documents table (VERDICT: promote d_minhash_pairs beyond a
    rows-only check).  The jaccard values are exact (hash-set) and the
    pair set is deterministic given the seeded signature matrices."""
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        minhash_duplicate_pairs, ngram_jaccard)

    docs = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = minhash_duplicate_pairs(docs, threshold=0.7).to_pandas()
    got = sorted(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    assert got == [
        (8, 245), (26, 455), (31, 383), (44, 446), (45, 267), (45, 413),
        (58, 293), (61, 185), (70, 447), (72, 377), (87, 134), (92, 450),
        (98, 290), (107, 387), (120, 332), (152, 178), (166, 323),
        (267, 413), (285, 301), (295, 374), (310, 389), (326, 457),
        (393, 420), (435, 486), (458, 462)]
    # every reported jaccard equals an independent recomputation
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    for r in pairs.itertuples():
        expect = ngram_jaccard(texts[int(r.doc_a)], texts[int(r.doc_b)])
        assert abs(r.jaccard - expect) < 1e-12


# ------------------------------------------------- broadcast lookup probe

def test_lookup_indices_matches_index_in_and_survives_collisions(monkeypatch):
    """The memoized hash-probe lookup must agree with pc.index_in exactly —
    including under 64-bit hash COLLISIONS, which the string-verify +
    exact-fallback path handles.  Collisions are forced by substituting a
    deliberately weak hash (string length), so every same-length key
    collides; the probe runs in-process so the monkeypatch reaches it."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ict_log_parser_ray.stages import join

    rng = np.random.default_rng(7)
    right = pa.array([f"conv_{i:06d}" for i in range(60_000)]
                     + [f"x{i}" for i in range(5)])          # mixed lengths
    values = pc.take(right, pa.array(rng.integers(0, len(right), 10_000)))
    # misses + nulls-free batch
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    values = pa.concat_arrays([values,
                               pa.array(["nope", "conv_", "x999999"])])

    # index_in yields int32 indices; the probe yields int64 (safe past
    # 2^31 rows) — compare values, not storage type
    expected = pc.cast(pc.index_in(values, value_set=right), pa.int64())

    # real hash first
    got = join.lookup_indices(values, right, memo_token="t-real")
    assert got.equals(expected)

    # force collisions: hash = len(string) → 60k keys share one hash
    monkeypatch.setattr(join, "_pl_hash64",
                        lambda arr: np.asarray(pc.utf8_length(arr)
                                               .to_numpy(zero_copy_only=False)
                                               ).astype("int64"))
    got2 = join.lookup_indices(values, right, memo_token="t-weak")
    assert got2.equals(expected)


def test_chained_hash_join_attach_no_empty_partition_crash(ray_session):
    """Two CHAINED attach_lookup hash joins (broadcast_threshold=0) over a
    key set far smaller than num_partitions: Ray's JoinAggregator emits a
    ZERO-COLUMN block for any partition no shard hashed to, and feeding
    that into the second join crashed its finalize (acero "No match or
    multiple matches for key field").  attach_lookup now materializes and
    drops colless empties — this pins the chained shape directly (the
    wordgram/minhash big-corpus verify path)."""
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.stages.join import attach_lookup

    pairs = pa.table({"doc_a": pa.array([0, 0, 1], pa.int64()),
                      "doc_b": pa.array([1, 2, 2], pa.int64())})
    a_side = rd.from_arrow(pa.table({"doc_a": pa.array([0, 1], pa.int64()),
                                     "text_a": pa.array(["x", "y"])}))
    b_side = rd.from_arrow(pa.table({"doc_b": pa.array([1, 2], pa.int64()),
                                     "text_b": pa.array(["y", "z"])}))
    out = attach_lookup(
        attach_lookup(rd.from_arrow(pairs), a_side, on="doc_a",
                      broadcast_threshold=0, num_partitions=64),
        b_side, on="doc_b", broadcast_threshold=0,
        num_partitions=64).to_pandas().sort_values(
            ["doc_a", "doc_b"]).reset_index(drop=True)
    expect = pd.DataFrame({"doc_a": [0, 0, 1], "doc_b": [1, 2, 2],
                           "text_a": ["x", "x", "y"],
                           "text_b": ["y", "z", "z"]})
    pd.testing.assert_frame_equal(
        out[["doc_a", "doc_b", "text_a", "text_b"]], expect)


def test_histogram_quantiles_matches_duckdb_semantics(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.functions.quantiles import histogram_quantiles

    rng = np.random.default_rng(3)
    v = rng.integers(0, 40, 1777).astype("int64")
    ds = rd.from_arrow(pa.table({"v": pa.array(v, pa.int64())})).repartition(5)
    out = histogram_quantiles(ds, "v", {"q50": 0.5, "q90": 0.9,
                                        "q01": 0.01, "q100": 1.0}).to_pylist()[0]
    con = duckdb.connect()
    want = con.execute(
        "SELECT count(*), quantile_disc(x, 0.5), quantile_disc(x, 0.9),"
        " quantile_disc(x, 0.01), quantile_disc(x, 1.0)"
        " FROM (SELECT unnest($1) AS x)", [v.tolist()]).fetchone()
    con.close()
    assert (out["n"], out["q50"], out["q90"], out["q01"], out["q100"]) == want


def test_histogram_quantiles_nulls_and_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.functions.quantiles import histogram_quantiles

    ds = rd.from_arrow(pa.table({
        "v": pa.array([5, None, 7, None, 5], pa.int64())}))
    out = histogram_quantiles(ds, "v", {"q50": 0.5}).to_pylist()[0]
    # nulls excluded: population {5,5,7}, median = 5
    assert out == {"n": 3, "q50": 5}


def test_top_tokens_exact_vs_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.vocab import top_tokens

    rng = np.random.default_rng(5)
    words = [f"w{i:03d}" for i in range(120)]
    texts = [" ".join(rng.choice(words, rng.integers(0, 30)))
             for _ in range(400)]
    texts[7] = None  # null text must contribute nothing
    df = pd.DataFrame({"text": pd.array(texts, dtype="object")})
    ds = rd.from_pandas(df).repartition(6)
    got = top_tokens(ds, "text", k=15, nparts=5)

    all_toks = pd.Series([t for s in texts if s for t in s.split()])
    vc = all_toks.value_counts()
    ref = (pd.DataFrame({"token": vc.index, "n": vc.to_numpy()})
           .sort_values(["n", "token"], ascending=[False, True],
                        kind="stable").head(15).reset_index(drop=True))
    assert got["token"].tolist() == ref["token"].tolist()
    assert got["n"].tolist() == ref["n"].tolist()


def test_top_tokens_cross_partition_sum(ray_session):
    """A token frequent overall but never top-k within one batch must
    still win — the case per-batch top-k partials get wrong."""
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.vocab import top_tokens

    # 10 blocks; in each block 'rare_i' appears 3 times, 'steady' twice.
    # Per-block top-1 is rare_i, but globally steady (20) beats any
    # rare_i (3).
    rows = []
    for i in range(10):
        rows.append(" ".join([f"rare{i}"] * 3 + ["steady"] * 2))
    ds = rd.from_pandas(pd.DataFrame({"text": rows})).repartition(10)
    got = top_tokens(ds, "text", k=1, nparts=4)
    assert got["token"].tolist() == ["steady"]
    assert got["n"].tolist() == [20]


def test_top_tokens_empty_and_null_blocks(ray_session):
    """Zero-row blocks bypass the partial UDF and reach the partition
    tasks with the ORIGINAL dataset schema; all-null blocks emit empty
    typed partials.  Both must produce an empty/correct result, not a
    KeyError on the missing 'part' column."""
    import pandas as pd
    import ray.data as rd
    import pyarrow as pa

    from ict_log_parser_ray.functions.vocab import top_tokens

    all_null = rd.from_arrow(pa.table(
        {"text": pa.array([None, None], pa.string())})).repartition(3)
    assert top_tokens(all_null, "text", k=5).empty

    sparse = rd.from_arrow(pa.table(
        {"text": pa.array(["x y x", None], pa.string())})).repartition(4)
    got = top_tokens(sparse, "text", k=5)
    assert got["token"].tolist() == ["x", "y"]
    assert got["n"].tolist() == [2, 1]


def test_grouped_quantiles_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.quantiles import (
        grouped_quantiles_partitioned)

    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z", "w"], n),
        "v": rng.normal(size=n),
    })
    df.loc[5, "v"] = None  # null exclusion
    ds = rd.from_pandas(df).repartition(6)
    got = grouped_quantiles_partitioned(ds, key="g", val="v",
                                        qs={"q50": 0.5, "q90": 0.9},
                                        nparts=5).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        "SELECT g, count(v) AS n, quantile_disc(v, 0.5) AS q50,"
        " quantile_disc(v, 0.9) AS q90 FROM t GROUP BY g ORDER BY g").df()
    con.close()
    got = got.sort_values("g").reset_index(drop=True)
    want = want.sort_values("g").reset_index(drop=True)
    assert got["g"].tolist() == want["g"].tolist()
    assert got["n"].astype("int64").tolist() == want["n"].astype("int64").tolist()
    # disc quantiles are data values — exact equality expected
    assert got["q50"].tolist() == want["q50"].tolist()
    assert got["q90"].tolist() == want["q90"].tolist()


def test_hll_accuracy_and_mergeability(ray_session):
    import pandas as pd

    from ict_log_parser_ray.functions.sketch import (hll_estimate,
                                                     hll_merge, hll_partial)

    rng = np.random.default_rng(23)
    vals = rng.integers(0, 50_000, 200_000)  # ~49k distinct
    exact = len(np.unique(vals))

    whole = hll_partial(pd.Series(vals))
    est = hll_estimate(whole)
    assert abs(est - exact) / exact < 0.03  # p=14 → sigma ~0.8%

    # mergeability: partials over any split produce identical registers
    parts = [hll_partial(pd.Series(chunk))
             for chunk in np.array_split(vals, 7)]
    assert np.array_equal(hll_merge(parts), whole)
    # determinism across calls
    assert np.array_equal(hll_partial(pd.Series(vals)), whole)


def test_hll_small_range_linear_counting():
    import pandas as pd

    from ict_log_parser_ray.functions.sketch import (hll_estimate,
                                                     hll_partial)

    est = hll_estimate(hll_partial(pd.Series(np.arange(100))))
    assert abs(est - 100) <= 3

    assert hll_estimate(hll_partial(pd.Series([], dtype="int64"))) == 0


def test_approx_distinct_dataset(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.functions.sketch import approx_distinct

    rng = np.random.default_rng(29)
    vals = rng.integers(0, 5000, 40_000)
    exact = len(np.unique(vals))
    ds = rd.from_arrow(pa.table({"u": pa.array(vals, pa.int64())}))
    est = approx_distinct(ds.repartition(8), "u")
    assert abs(est - exact) / exact < 0.05


def test_grouped_quantiles_null_keys_excluded(ray_session):
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.quantiles import (
        grouped_quantiles_partitioned)

    df = pd.DataFrame({"g": ["a", None, "b", "a", None],
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = grouped_quantiles_partitioned(rd.from_pandas(df), key="g",
                                        val="v", qs={"q50": 0.5},
                                        nparts=4).to_pandas()
    # null keys dropped, NOT aliased into another group
    assert sorted(out["g"]) == ["a", "b"]
    assert out.set_index("g")["n"].to_dict() == {"a": 2, "b": 1}


# --------------------------- bloom semi-join ------------------------------

def test_bloom_kernel_no_false_negatives():
    import numpy as np

    from ict_log_parser_ray.stages.bloom import bloom_from_keys, bloom_probe

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**62, 50_000).astype(np.uint64)
    other = np.setdiff1d(
        rng.integers(0, 2**62, 50_000).astype(np.uint64), keys)
    bits = bloom_from_keys(keys, 1 << 20, 5)
    assert bloom_probe(keys, bits, 1 << 20, 5).all()   # never a false neg
    # ~21 bits/key, k=5 → theoretical fp ≈ 1e-3; assert an order above
    assert bloom_probe(other, bits, 1 << 20, 5).mean() < 0.01


def test_bloom_semi_join_exact_vs_isin(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.bloom import bloom_semi_join

    rng = np.random.default_rng(1)
    left = pa.table({"k": pa.array(rng.integers(0, 1000, 20000), pa.int64()),
                     "v": pa.array(rng.normal(size=20000))})
    right = pa.table({"rk": pa.array(rng.integers(0, 1000, 300), pa.int64())})
    got = bloom_semi_join(rd.from_arrow(left).repartition(6),
                          rd.from_arrow(right).repartition(3),
                          "k", "rk",
                          # tiny bloom → DENSE false positives, so this
                          # also proves the exact verify removes them
                          nbits=1 << 10, k=2).to_pandas()
    want = left.to_pandas()[
        left.to_pandas()["k"].isin(right["rk"].to_numpy())]
    assert len(got) == len(want)
    assert sorted(got["k"]) == sorted(want["k"])
    assert np.isclose(got["v"].sum(), want["v"].sum())


def test_bloom_semi_join_null_left_keys(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.bloom import bloom_semi_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, None, 2, 9], pa.int64())}))
    right = rd.from_arrow(pa.table({"rk": pa.array([1, 2], pa.int64())}))
    got = bloom_semi_join(left, right, "k", "rk",
                          nbits=1 << 12, k=3).to_pandas()
    assert sorted(got["k"]) == [1, 2]


def test_bloom_anti_join_exact_vs_isin(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.bloom import bloom_anti_join

    rng = np.random.default_rng(2)
    left = pa.table({"k": pa.array(rng.integers(0, 1000, 20000), pa.int64()),
                     "v": pa.array(rng.normal(size=20000))})
    right = pa.table({"rk": pa.array(rng.integers(0, 1000, 300), pa.int64())})
    got = bloom_anti_join(rd.from_arrow(left).repartition(6),
                          rd.from_arrow(right).repartition(3),
                          "k", "rk",
                          # tiny bloom → DENSE false positives, so this
                          # also proves the exact check KEEPS them
                          nbits=1 << 10, k=2).to_pandas()
    want = left.to_pandas()[
        ~left.to_pandas()["k"].isin(right["rk"].to_numpy())]
    assert len(got) == len(want)
    assert sorted(got["k"]) == sorted(want["k"])
    assert np.isclose(got["v"].sum(), want["v"].sum())


def test_bloom_anti_join_partitioned_equals_broadcast(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.bloom import (bloom_anti_join,
                                                 bloom_anti_join_partitioned)

    rng = np.random.default_rng(6)
    left = pa.table({"k": pa.array(rng.integers(0, 800, 15000), pa.int64()),
                     "v": pa.array(rng.normal(size=15000))})
    # dup + null right keys
    rk = rng.integers(0, 800, 400).astype(object)
    rk[::17] = None
    right = pa.table({"rk": pa.array(list(rk), pa.int64())})
    kw = dict(nbits=1 << 10, k=2)   # dense fps exercise the shard probes
    a = bloom_anti_join(rd.from_arrow(left).repartition(6),
                        rd.from_arrow(right).repartition(3),
                        "k", "rk", **kw).to_pandas()
    b = bloom_anti_join_partitioned(rd.from_arrow(left).repartition(6),
                                    rd.from_arrow(right).repartition(3),
                                    "k", "rk", nparts=5, **kw).to_pandas()
    assert sorted(a["k"]) == sorted(b["k"])
    assert np.isclose(a["v"].sum(), b["v"].sum())
    want = left.to_pandas()[~left.to_pandas()["k"].isin(
        [x for x in rk if x is not None])]
    assert sorted(b["k"]) == sorted(want["k"])


def test_bloom_anti_join_partitioned_empty_right(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.bloom import bloom_anti_join_partitioned

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, None], pa.int64())}))
    right = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    got = bloom_anti_join_partitioned(left, right, "k", "rk",
                                      nparts=4).to_pandas()
    assert sorted(got["k"]) == [1, 2]   # nulls drop, everything else kept


def test_bloom_anti_join_nulls_both_sides(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.bloom import bloom_anti_join

    left = rd.from_arrow(pa.table(
        {"k": pa.array([1, None, 2, 9, 7], pa.int64())}))
    right = rd.from_arrow(pa.table(
        {"rk": pa.array([1, None, 2], pa.int64())}))
    got = bloom_anti_join(left, right, "k", "rk",
                          nbits=1 << 12, k=3).to_pandas()
    # null left keys drop; right-side null never matches anything
    assert sorted(got["k"]) == [7, 9]


def test_misra_gries_bound_and_merge():
    from collections import Counter

    import numpy as np

    from ict_log_parser_ray.functions.sketch import (mg_compress, mg_merge,
                                                     mg_partial)

    rng = np.random.default_rng(12)
    # zipf-ish stream: few heavy tokens + long tail
    toks = [f"t{int(x)}" for x in rng.zipf(1.5, 20_000) if x < 10_000]
    m = 64
    true = Counter(toks)
    n = len(toks)
    # split into 7 "batches", build partials, merge
    chunks = np.array_split(np.array(toks), 7)
    parts = [mg_partial(list(c), m) for c in chunks]
    summary, err = mg_merge(parts, m)
    assert err <= n // m + len(parts) * (n // m)   # loose sanity ceiling
    for tok, est in summary.items():
        assert est <= true[tok] <= est + err       # the MG guarantee
    # any token with true count > n/m must be present
    for tok, c in true.items():
        if c > n / m * 2:                          # comfortably heavy
            assert tok in summary, tok


def test_top_tokens_approx_vs_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.sketch import top_tokens_approx
    from ict_log_parser_ray.functions.vocab import top_tokens

    rows = (["alpha beta common"] * 50 + ["beta common"] * 30 +
            [f"rare{i} common" for i in range(40)])
    df = pd.DataFrame({"text": rows})
    exact = top_tokens(rd.from_pandas(df).repartition(5), "text", k=5)
    approx = top_tokens_approx(rd.from_pandas(df).repartition(5), "text",
                               k=5, m=256)
    # m >> distinct tokens → zero compression → exact counts, same order
    assert list(approx["token"]) == list(exact["token"])
    assert list(approx["est"]) == list(exact["n"])
    assert (approx["err"] == 0).all()


def test_embedding_near_dup_multi_assign_recall(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.similarity import (
        embedding_near_dup_pairs, exact_near_dup_pairs)

    rng = np.random.default_rng(11)
    base = rng.normal(size=(400, 16)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # plant 12 mid-similarity pairs (cosine ~0.8): id 400+i pairs with i
    planted = []
    for i in range(12):
        v = base[i] + rng.normal(size=16).astype(np.float32) * 0.45
        planted.append(v / np.linalg.norm(v))
    vecs = np.concatenate([base, np.stack(planted)])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype=np.int64),
                       "embedding": [v for v in vecs]})
    mk = lambda: rd.from_pandas(df).repartition(4)
    ex = exact_near_dup_pairs(mk(), threshold=0.6).to_pandas()
    ex_set = set(zip(ex["id_a"], ex["id_b"]))
    assert len(ex_set) >= 10          # planting worked
    a1 = embedding_near_dup_pairs(mk(), threshold=0.6, nlist=8,
                                  nassign=1).to_pandas()
    a3 = embedding_near_dup_pairs(mk(), threshold=0.6, nlist=8,
                                  nassign=3).to_pandas()
    s1 = set(zip(a1["id_a"], a1["id_b"])) if len(a1) else set()
    s3 = set(zip(a3["id_a"], a3["id_b"])) if len(a3) else set()
    # approx is always a SUBSET of exact (verification is exact cosine)
    assert s1 <= ex_set and s3 <= ex_set
    # multi-assignment never loses pairs and strictly helps here
    assert s1 <= s3
    assert len(s3) > len(s1)


# ------------------------------ k-means -----------------------------------

def test_kmeans_recovers_planted_blobs(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.kmeans import (kmeans_cluster_sizes,
                                                     kmeans_fit)

    rng = np.random.default_rng(7)
    k, d, per = 4, 8, 500
    means = rng.normal(size=(k, d)) * 20          # well-separated blobs
    pts = np.concatenate([means[i] + rng.normal(size=(per, d)) * 0.5
                          for i in range(k)])
    order = rng.permutation(len(pts))
    df = pd.DataFrame({"embedding": [row.astype(np.float32)
                                     for row in pts[order]]})
    ds = rd.from_pandas(df).repartition(6)
    cent = kmeans_fit(ds, k=k, iters=25, init_sample_rows=2000, seed=1)
    # every true mean is within 0.3 of exactly one learned centroid
    dist = np.sqrt(((means[:, None, :] - cent[None, :, :]) ** 2).sum(-1))
    match = dist.argmin(axis=1)
    assert sorted(match) == list(range(k))
    assert (dist.min(axis=1) < 0.3).all()
    sizes = kmeans_cluster_sizes(ds, cent)
    assert sorted(sizes["n"]) == [per] * k        # perfect recovery


def test_kmeans_deterministic_across_partitionings(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.kmeans import kmeans_fit

    rng = np.random.default_rng(8)
    df = pd.DataFrame({"embedding": [r.astype(np.float32)
                                     for r in rng.normal(size=(600, 5))]})
    # identical limit() head + seed → identical init; assignment partials
    # are summed per-cluster so centroids agree to float tolerance
    c1 = kmeans_fit(rd.from_pandas(df).repartition(3), k=3, iters=5, seed=2)
    c2 = kmeans_fit(rd.from_pandas(df).repartition(7), k=3, iters=5, seed=2)
    assert np.allclose(c1, c2, atol=1e-8)


# ----------------------------- json extraction ----------------------------

def test_json_field_extraction():
    import pyarrow as pa

    from ict_log_parser_ray.functions.json_ops import (json_field,
                                                       json_int_field)

    arr = pa.array(['{"k": 69}', '{"k": -7}', None, 'not json',
                    '{"other": 1}', '{"k": "text"}', '{"k": 3.5}'])
    s = json_field(arr, "$.k")
    assert s.to_pylist() == ["69", "-7", None, None, None, "text", "3.5"]
    i = json_int_field(arr, "$.k")
    # non-integer matches null out, never raise
    assert i.to_pylist() == [69, -7, None, None, None, None, None]


def test_json_int_field_all_numeric_fast_path():
    import pyarrow as pa

    from ict_log_parser_ray.functions.json_ops import json_int_field

    arr = pa.array(['{"k": %d}' % i for i in range(100)])
    assert json_int_field(arr, "$.k").to_pylist() == list(range(100))


# --------------------------- cube / rollup --------------------------------

def test_cube_aggregate_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.rollup import cube_aggregate

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 5000),
        "b": rng.choice(["p", None, "q"], 5000),   # data-null group key
        "m": rng.integers(-100, 100, 5000)})
    for mode, sql in [("cube", "CUBE (a, b)"), ("rollup", "ROLLUP (a, b)")]:
        got = cube_aggregate(rd.from_pandas(df).repartition(5),
                             ["a", "b"], ["m"], mode=mode)
        want = duckdb.sql(
            f"SELECT a, b, CAST(sum(m) AS BIGINT) AS m, count(*) AS n "
            f"FROM df GROUP BY {sql}").df()
        key = ["a", "b"]
        g = got.fillna({"a": "∅", "b": "∅"}).sort_values(
            key + ["m"]).reset_index(drop=True)
        w = want.fillna({"a": "∅", "b": "∅"}).sort_values(
            key + ["m"]).reset_index(drop=True)
        assert len(g) == len(w), mode
        pd.testing.assert_frame_equal(
            g, w[g.columns], check_dtype=False), mode


def test_cube_rollup_grouping_sets():
    from ict_log_parser_ray.functions.rollup import _grouping_sets

    assert _grouping_sets(["a", "b"], "rollup") == [("a", "b"), ("a",), ()]
    assert set(_grouping_sets(["a", "b"], "cube")) == {
        ("a", "b"), ("a",), ("b",), ()}


# -------------------------- connected components --------------------------

def _uf_components(edges):
    """Pure-python union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_vs_union_find(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.components import connected_components

    rng = np.random.default_rng(5)
    # clustered random graph: nodes 0..999 in 50 latent groups + noise
    a = rng.integers(0, 1000, 600)
    b = (a // 20) * 20 + rng.integers(0, 20, 600)   # mostly intra-group
    edges = list(zip(a.tolist(), b.tolist()))
    df = pd.DataFrame({"a": a, "b": b})
    got = connected_components(rd.from_pandas(df).repartition(5), "a", "b")
    want = _uf_components(edges)
    # canonical min-labels: union-find with min-root merging gives min ids
    got_map = dict(zip(got["node"], got["component"]))
    assert got_map == want


def test_connected_components_long_chain(ray_session):
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.components import connected_components

    # a 4000-node path: O(diameter) propagation alone would need 4000
    # rounds — pointer jumping must converge way under max_iters=64
    n = 4000
    df = pd.DataFrame({"a": range(n - 1), "b": range(1, n)})
    got = connected_components(rd.from_pandas(df).repartition(8), "a", "b")
    assert (got["component"] == 0).all() and len(got) == n


def test_connected_components_empty(ray_session):
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.components import connected_components

    df = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                       "b": pd.Series([], dtype="int64")})
    got = connected_components(rd.from_pandas(df), "a", "b")
    assert len(got) == 0 and list(got.columns) == ["node", "component"]


def _clustered_random_edges(seed: int = 7) -> "pd.DataFrame":
    """Dup-graph-shaped test input: many small clusters + one long chain
    + one star hub + duplicate/reversed/self-loop edges."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    a, b = [], []
    base = 0
    for size in rng.integers(2, 9, 40):          # 40 random clusters
        nodes = base + rng.permutation(size)
        extra = rng.integers(0, size, size)      # random intra edges
        a.extend(nodes[:-1]); b.extend(nodes[1:])
        a.extend(nodes[extra]); b.extend(nodes[(extra + 1) % size])
        base += int(size) + 3                    # gaps → isolated ids unused
    chain = np.arange(base, base + 200)          # adversarial long chain
    a.extend(chain[:-1]); b.extend(chain[1:])
    hub = base + 300
    spokes = hub + 1 + np.arange(50)             # star
    a.extend([hub] * 50); b.extend(spokes)
    df = pd.DataFrame({"a": np.array(a, np.int64),
                       "b": np.array(b, np.int64)})
    rev = df.rename(columns={"a": "b", "b": "a"})
    loops = pd.DataFrame({"a": [5, hub], "b": [5, hub]})   # self-loops
    return pd.concat([df, rev, df.head(17), loops], ignore_index=True)


def test_connected_components_partitioned_parity(ray_session):
    """Forced-path parity (VERDICT r3 item 2): the large-star/small-star
    exchange must equal the driver pointer-jumping path on a clustered
    random graph, a long chain and a star, with dup/reversed/self-loop
    edges in the input."""
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.components import (
        connected_components, connected_components_partitioned)

    df = _clustered_random_edges()
    want = (connected_components(rd.from_pandas(df).repartition(4),
                                 "a", "b")
            .sort_values("node").reset_index(drop=True))
    got = (connected_components_partitioned(
        rd.from_pandas(df).repartition(4), "a", "b", nparts=5)
        .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_connected_components_budget_dispatch(ray_session):
    """node_budget=1 forces the partitioned fallback through the public
    connected_components API — result must be identical to the driver
    path (and come back as the same DataFrame shape)."""
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.components import connected_components

    df = _clustered_random_edges(seed=11)
    want = (connected_components(rd.from_pandas(df).repartition(3),
                                 "a", "b")
            .sort_values("node").reset_index(drop=True))
    got = (connected_components(rd.from_pandas(df).repartition(3),
                                "a", "b", node_budget=1)
           .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_connected_components_partitioned_degenerate(ray_session):
    """Empty input yields zero rows; self-loop-only nodes are singleton
    components — BOTH matching the driver path (whose property test
    requires lbl[a] to exist for (a, a) edges)."""
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.components import (
        connected_components, connected_components_partitioned)

    empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64")})
    assert len(connected_components_partitioned(
        rd.from_pandas(empty), "a", "b", nparts=4).to_pandas()) == 0
    # self-loops: alone, attached to a real component, and mixed
    df = pd.DataFrame({"a": [5, 9, 1, 1], "b": [5, 9, 2, 1]})
    want = (connected_components(rd.from_pandas(df), "a", "b")
            .sort_values("node").reset_index(drop=True))
    got = (connected_components_partitioned(
        rd.from_pandas(df), "a", "b", nparts=4)
        .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    assert set(got["node"]) == {1, 2, 5, 9}
    assert dict(zip(got["node"], got["component"])) == \
        {1: 1, 2: 1, 5: 5, 9: 9}


def test_connected_components_partitioned_long_chain(ray_session):
    """Star-convergence guard: a 2000-node path graph (the adversarial
    diameter case) must converge well inside max_rounds and label
    everything to component 0."""
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.components import (
        connected_components_partitioned)

    n = 2000
    df = pd.DataFrame({"a": range(n - 1), "b": range(1, n)})
    got = (connected_components_partitioned(
        rd.from_pandas(df).repartition(4), "a", "b", nparts=4)
        .to_pandas())
    assert len(got) == n and (got["component"] == 0).all()


def test_dedup_drop_filter_forced_partitioned(ray_session):
    """max_broadcast=0 forces the streaming bloom anti-join drop path —
    it must keep exactly the same ids as the broadcast path, for comp
    given as a labeling DataFrame, a raw drop array, and a Dataset."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import dedup_drop_filter

    ids = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
    comp = pd.DataFrame({
        "node": np.array([3, 4, 5, 100, 101, 500, 1999], np.int64),
        "component": np.array([3, 3, 3, 100, 100, 500, 500], np.int64)})
    docs = rd.from_pandas(ids).repartition(4)
    want = sorted(dedup_drop_filter(docs, comp)
                  .to_pandas()["doc_id"].tolist())
    assert 4 not in want and 5 not in want and 101 not in want \
        and 1999 not in want and 3 in want and 500 in want
    got_forced = sorted(dedup_drop_filter(docs, comp, max_broadcast=0)
                        .to_pandas()["doc_id"].tolist())
    assert got_forced == want
    drop = comp.loc[comp["node"] != comp["component"], "node"].to_numpy()
    got_arr = sorted(dedup_drop_filter(docs, drop, max_broadcast=0)
                     .to_pandas()["doc_id"].tolist())
    assert got_arr == want
    got_ds = sorted(dedup_drop_filter(docs, rd.from_pandas(comp))
                    .to_pandas()["doc_id"].tolist())
    assert got_ds == want


def test_dedup_best_drop_ds_matches_driver_argmax(ray_session):
    """The distributed keep-longest-per-cluster drop list must equal the
    driver argmax (d_dedup_best's logic) exactly: max n_chars, tie → min
    node, nodes missing meta never keep, all-missing components drop
    whole — and it must compose with dedup_drop_filter end-to-end."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (dedup_best_drop_ds,
                                                         dedup_drop_filter)

    rng = np.random.default_rng(13)
    # 60 clusters of 2-6 nodes + a tie cluster + an all-missing cluster
    nodes, comps = [], []
    base = 0
    for size in rng.integers(2, 7, 60):
        for j in range(int(size)):
            nodes.append(base + j)
            comps.append(base)
        base += int(size)
    comp = pd.DataFrame({"node": np.array(nodes, np.int64),
                         "component": np.array(comps, np.int64)})
    meta = pd.DataFrame({
        "doc_id": np.arange(base + 500, dtype=np.int64),   # superset
        "n_chars": rng.integers(10, 5000, base + 500).astype(np.int64)})
    # force exact length ties inside cluster 0, and strip meta from the
    # last cluster + one node of another
    meta.loc[meta["doc_id"].isin([0, 1]), "n_chars"] = 777
    last = comp["component"].iloc[-1]
    missing = set(comp.loc[comp["component"] == last, "node"]) | {2}
    meta = meta[~meta["doc_id"].isin(missing)]

    # driver reference (d_dedup_best's exact logic)
    j = comp.merge(meta, left_on="node", right_on="doc_id")
    j = j.sort_values(["component", "n_chars", "node"],
                      ascending=[True, False, True])
    keep = j.groupby("component", sort=False).head(1)["node"]
    want = np.setdiff1d(comp["node"].to_numpy(), keep.to_numpy())

    got_ds = dedup_best_drop_ds(rd.from_pandas(comp).repartition(3),
                                rd.from_pandas(meta).repartition(4),
                                nparts=5)
    got = np.sort(got_ds.to_pandas()["node"].to_numpy())
    assert np.array_equal(got, np.sort(want))

    # composes with dedup_drop_filter: corpus minus drop == keep ∪ unclustered
    corpus = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(base + 500, dtype=np.int64)})).repartition(4)
    kept = dedup_drop_filter(corpus, got_ds).to_pandas()["doc_id"]
    assert set(kept) == set(range(base + 500)) - set(want)


def test_connected_components_budget_string_nodes_raise(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from ict_log_parser_ray.functions.components import connected_components

    df = pd.DataFrame({"a": ["x", "y"], "b": ["y", "z"]})
    with pytest.raises(ValueError, match="integer node ids"):
        connected_components(rd.from_pandas(df), "a", "b", node_budget=1)


# ------------------------- grouped moments / corr -------------------------

def test_grouped_corr_vs_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.moments import grouped_corr

    rng = np.random.default_rng(4)
    n = 8000
    g = rng.choice(["u", "v", "w"], n)
    x = rng.integers(-10_000, 10_000, n)
    y = (x // 100 + rng.integers(-50, 50, n)).astype(np.int64)  # correlated
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    got = grouped_corr(rd.from_pandas(df).repartition(7), "g", "x", "y")
    got = got.sort_values("g").reset_index(drop=True)
    for i, grp in enumerate(["u", "v", "w"]):
        sub = df[df["g"] == grp]
        assert got.loc[i, "n"] == len(sub)
        ref = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(got.loc[i, "corr6"] - round(ref, 6)) <= 1e-6


def test_grouped_corr_null_pairs_and_degenerate(ray_session):
    import math

    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.moments import (corr_from_moments,
                                                      grouped_corr)

    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b"],
        "x": [1.0, 2.0, None, 5.0, 5.0],     # null x drops the pair
        "y": [10.0, 20.0, 30.0, 1.0, 2.0]})  # b: zero x-variance → NaN
    got = grouped_corr(rd.from_pandas(df), "g", "x", "y").set_index("g")
    assert got.loc["a", "n"] == 2 and got.loc["a", "corr6"] == 1.0
    assert got.loc["b", "n"] == 2 and math.isnan(got.loc["b", "corr6"])
    assert corr_from_moments(1, 5, 5, 25, 25, 25) is None


# ------------------------------ tf-idf ------------------------------------

def test_tfidf_top_terms_vs_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.tfidf import tfidf_top_terms

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["apple apple banana common",
                 "banana common common",
                 None,                      # null text → absent from output
                 "apple unique common"]})
    got = tfidf_top_terms(rd.from_pandas(docs).repartition(3),
                          k=2).to_pandas()
    n = 4

    rows = []
    tf = {}
    df_ = {}
    for _, r in docs.iterrows():
        toks = (r["text"] or "").split()
        for t in set(toks):
            df_[t] = df_.get(t, 0) + 1
        for t in toks:
            tf[(r["doc_id"], t)] = tf.get((r["doc_id"], t), 0) + 1
    for (d, t), f in tf.items():
        rows.append((d, t, f * 1_000_000 * (n + 1) // (df_[t] + 1)))
    ref = pd.DataFrame(rows, columns=["doc_id", "token", "score_e6"])
    ref = ref.sort_values(["score_e6", "token"],
                          ascending=[False, True], kind="stable")
    ref = ref.groupby("doc_id", sort=False).head(2)
    ref["rk"] = ref.groupby("doc_id", sort=False).cumcount() + 1
    ref = ref.sort_values(["doc_id", "rk"]).reset_index(drop=True)

    got = got.sort_values(["doc_id", "rk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "token", "score_e6", "rk"]].astype(
            {"doc_id": "int64", "score_e6": "int64", "rk": "int64"}),
        ref.astype({"doc_id": "int64", "score_e6": "int64", "rk": "int64"}))
    assert 2 not in set(got["doc_id"])  # null-text doc emits nothing


# --------------------------- ddsketch quantiles ---------------------------

def test_ddsketch_merge_and_error_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.sketch import (approx_quantiles,
                                                     dd_merge, dd_partial,
                                                     dd_quantile)

    rng = np.random.default_rng(0)
    vals = np.concatenate([rng.lognormal(3, 2, 60_000),
                           -rng.lognormal(1, 1, 15_000), np.zeros(500)])
    rng.shuffle(vals)

    # mergeability: chunked partials == single partial
    merged = dd_merge(dd_partial(c, 0.01) for c in np.array_split(vals, 9))
    single = dd_partial(vals, 0.01)
    assert merged["pos"] == single["pos"] and merged["neg"] == single["neg"]
    assert merged["zero"] == single["zero"] and merged["n"] == single["n"]

    # guaranteed alpha=1% relative error at every tested quantile
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        got = dd_quantile(merged, q, 0.01)
        want = np.quantile(vals, q)
        assert abs(got - want) <= 0.0101 * abs(want) + 1e-9

    # distributed path over a Dataset (nulls ignored)
    df = pd.DataFrame({"v": np.append(vals[:5000], [np.nan, np.nan])})
    out = approx_quantiles(rd.from_pandas(df).repartition(6), "v",
                           {"q50": 0.5, "q90": 0.9})
    ex = np.quantile(vals[:5000], [0.5, 0.9])
    assert abs(out["q50"] - ex[0]) <= 0.0101 * abs(ex[0])
    assert abs(out["q90"] - ex[1]) <= 0.0101 * abs(ex[1])


def test_bloom_semi_join_partitioned_matches_broadcast(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.bloom import (bloom_semi_join,
                                                 bloom_semi_join_partitioned)

    rng = np.random.default_rng(2)
    left = pa.table({"k": pa.array(rng.integers(0, 800, 15000), pa.int64()),
                     "v": pa.array(rng.normal(size=15000))})
    # duplicate AND null right keys — the verify shard must dedupe and
    # the tagger must drop nulls
    rk = np.concatenate([rng.integers(0, 800, 250),
                         rng.integers(0, 800, 250)])
    right = pa.table({"rk": pa.array(
        np.append(rk, [None] * 3), pa.int64())})
    lds = rd.from_arrow(left).repartition(5)
    rds = rd.from_arrow(right).repartition(3)
    a = bloom_semi_join(lds, rds, "k", "rk",
                        nbits=1 << 10, k=2).to_pandas()
    b = bloom_semi_join_partitioned(lds, rds, "k", "rk",
                                    nbits=1 << 10, k=2,
                                    nparts=5).to_pandas()
    want = left.to_pandas()[left.to_pandas()["k"].isin(rk)]
    assert len(a) == len(b) == len(want)
    assert sorted(b["k"]) == sorted(want["k"])
    assert np.isclose(b["v"].sum(), want["v"].sum())
    # empty right side → empty result through the zero-row-block path
    er = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    assert len(bloom_semi_join_partitioned(
        lds, er, "k", "rk", nparts=4).to_pandas()) == 0


def test_tfidf_sharded_df_path_matches_broadcast(ray_session):
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.tfidf import tfidf_top_terms

    rng = np.random.default_rng(3)
    words = [f"w{i:03d}" for i in range(150)]
    docs = pd.DataFrame({
        "doc_id": range(60),
        "text": [" ".join(rng.choice(words, rng.integers(1, 40)))
                 for _ in range(60)]})
    ds = rd.from_pandas(docs).repartition(5)
    a = (tfidf_top_terms(ds, k=3).to_pandas()
         .sort_values(["doc_id", "rk"]).reset_index(drop=True))
    # force the sharded-DF scale path (vocab threshold 0)
    b = (tfidf_top_terms(ds, k=3, max_broadcast_vocab=0, nparts=7)
         .to_pandas().sort_values(["doc_id", "rk"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    want_rows = sum(min(3, len(set(t.split()))) for t in docs["text"])
    assert len(a) == want_rows


# ----------------------- empty-input robustness ----------------------------

def test_new_aggregates_on_empty_input(ray_session):
    import math

    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.moments import grouped_corr
    from ict_log_parser_ray.functions.rollup import cube_aggregate
    from ict_log_parser_ray.functions.sketch import top_tokens_approx

    empty = pd.DataFrame({"a": pd.Series([], dtype="object"),
                          "b": pd.Series([], dtype="object"),
                          "m": pd.Series([], dtype="int64"),
                          "x": pd.Series([], dtype="int64"),
                          "y": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype="object")})
    ds = rd.from_pandas(empty)
    cube = cube_aggregate(ds, ["a", "b"], ["m"], mode="cube")
    assert len(cube) == 1 and cube["n"].iloc[0] == 0 \
        and cube["a"].iloc[0] is None          # SQL CUBE on empty: one
    corr = grouped_corr(rd.from_pandas(empty), "a", "x", "y")
    assert len(corr) == 0
    tok = top_tokens_approx(rd.from_pandas(empty), "text", k=5)
    assert len(tok) == 0


def test_funnel_ordering_adversarial(ray_session, tmp_path):
    """A click BEFORE the signup must not count; a later click after the
    signup must — exactly the case where min-per-type partials break."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.driver_queries import e_funnel

    rows = [
        # u1: click(1) BEFORE signup(2) is ignored; click(3) counts;
        # purchase(2.5) before that click is ignored → no purchase
        (1, "click", 1), (1, "signup", 2), (1, "purchase", 2),
        (1, "click", 3),
        # u2: full ordered chain
        (2, "signup", 1), (2, "click", 2), (2, "purchase", 3),
        # u3: signup only
        (3, "signup", 5),
        # u4: click/purchase but never signed up → stage 0
        (4, "click", 1), (4, "purchase", 2),
        # u5: equal timestamps do NOT advance (strict >)
        (5, "signup", 7), (5, "click", 7),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts_i"])
    df["ts"] = pd.to_datetime(df["ts_i"], unit="s")
    df["value"] = 0.0
    tbl = pa.Table.from_pandas(df[["user_id", "event_type", "ts"]],
                               preserve_index=False)
    d = tmp_path / "sfx"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    out = e_funnel(str(d)).set_index("stage")["n_users"].to_dict()
    assert out == {"signup": 4, "click": 2, "purchase": 1}


def test_funnel_vs_bruteforce_random(ray_session, tmp_path):
    """Greedy conditional-min chain == exists-ordered-chain, checked
    against an O(n³) brute force on a random event stream."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.driver_queries import e_funnel

    rng = np.random.default_rng(13)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 120, n),
        "event_type": rng.choice(
            ["signup", "click", "purchase", "view", "error"], n),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s")})
    d = tmp_path / "sfr"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))
    got = e_funnel(str(d)).set_index("stage")["n_users"].to_dict()

    want = {"signup": 0, "click": 0, "purchase": 0}
    for _, g in df.groupby("user_id"):
        ev = sorted(zip(g["ts"], g["event_type"]))
        # brute force: any signup < click < purchase chain
        s_ts = [t for t, e in ev if e == "signup"]
        if not s_ts:
            continue
        want["signup"] += 1
        c_ts = [t for t, e in ev if e == "click" and t > min(s_ts)]
        if not c_ts:
            continue
        want["click"] += 1
        if any(t > min(c_ts) for t, e in ev if e == "purchase"):
            want["purchase"] += 1
        # true exists-ordered-triple brute force must agree with the
        # greedy conditional-min chain (exchange argument)
        p_ts = [t for t, e in ev if e == "purchase"]
        triple = any(s < c < p for s in s_ts for c in
                     [t for t, e in ev if e == "click"] for p in p_ts)
        assert triple == (bool(c_ts) and
                          any(t > min(c_ts) for t in p_ts))
    assert got == want


def test_count_min_sketch_bounds_and_merge():
    import numpy as np

    from ict_log_parser_ray.functions.sketch import (cms_estimate, cms_merge,
                                                     cms_partial)

    rng = np.random.default_rng(14)
    keys = rng.zipf(1.4, 30_000)
    keys = keys[keys < 100_000].astype(np.int64)
    n = len(keys)
    chunks = np.array_split(keys, 6)
    merged = cms_merge([cms_partial(c, w=2048, d=4) for c in chunks])
    whole = cms_partial(keys, w=2048, d=4)
    assert (merged == whole).all()          # merge == single-pass build
    uniq, true = np.unique(keys, return_counts=True)
    est = cms_estimate(merged, uniq)
    assert (est >= true).all()              # one-sided error, always
    eps = np.e / 2048
    # ≤ true + eps*n for the vast majority (prob bound is per-query 1-δ)
    assert (est <= true + eps * n).mean() > 0.98
    # heavy keys are estimated nearly exactly
    heavy = true >= 500
    assert (est[heavy] - true[heavy]).max() <= eps * n


def test_bloom_anti_join_partitioned_string_keys(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.bloom import bloom_anti_join_partitioned

    rng = np.random.default_rng(15)
    lk = [f"key-{i:04d}" for i in rng.integers(0, 400, 5000)]
    rk = [f"key-{i:04d}" for i in rng.integers(0, 400, 150)]
    left = pa.table({"k": pa.array(lk), "v": pa.array(rng.normal(size=5000))})
    right = pa.table({"rk": pa.array(rk)})
    got = bloom_anti_join_partitioned(
        rd.from_arrow(left).repartition(4),
        rd.from_arrow(right).repartition(2), "k", "rk",
        nparts=3, nbits=1 << 10, k=2).to_pandas()  # dense fps on purpose
    want = left.to_pandas()[~left.to_pandas()["k"].isin(set(rk))]
    assert sorted(got["k"]) == sorted(want["k"])


def test_connected_components_string_nodes(ray_session):
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.functions.components import connected_components

    df = pd.DataFrame({"a": ["x", "y", "q", "m"],
                       "b": ["y", "z", "x", "m"]})
    got = connected_components(rd.from_pandas(df), "a", "b")
    lbl = dict(zip(got["node"], got["component"]))
    # {x,y,z,q} one component labeled by lexicographic min 'q'; {m} alone
    assert lbl == {"m": "m", "q": "q", "x": "q", "y": "q", "z": "q"}


def test_json_field_all_null_and_chunked():
    import pyarrow as pa

    from ict_log_parser_ray.functions.json_ops import (json_field,
                                                       json_int_field)

    allnull = pa.array([None, None], pa.string())
    assert json_field(allnull, "$.k").to_pylist() == [None, None]
    assert json_int_field(allnull, "$.k").to_pylist() == [None, None]
    chunked = pa.chunked_array([pa.array(['{"k": 1}']),
                                pa.array(['{"k": 2}', None])])
    assert json_int_field(chunked, "$.k").to_pylist() == [1, 2, None]
    empty = pa.array([], pa.string())
    assert len(json_int_field(empty, "$.k")) == 0


# ------------------- ADVICE r2 regression fixes ---------------------------

def test_bloom_key64_nulls_do_not_corrupt_big_int_keys():
    """A null-bearing int64 column must hash VALID |v| > 2^53 keys
    identically to a null-free column: to_numpy on a nullable int column
    yields float64, which rounds big ints before the uint64 cast (bloom
    false negatives the exact verify never re-checks)."""
    import numpy as np
    import pyarrow as pa

    from ict_log_parser_ray.stages.bloom import _key64

    big = (1 << 60) + 123456789  # not representable in float64
    with_null = pa.array([big, None, 7], pa.int64())
    no_null = pa.array([big, 0, 7], pa.int64())
    a, b = _key64(with_null), _key64(no_null)
    assert a.dtype == np.uint64
    assert a[0] == b[0] == np.uint64(big)
    assert a[2] == b[2] == np.uint64(7)


def test_bloom_semi_join_big_keys_with_nulls(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.stages.bloom import bloom_semi_join

    big = (1 << 60) + 123456789
    left = rd.from_arrow(pa.table(
        {"k": pa.array([big, None, big + 2, 5], pa.int64())}))
    right = rd.from_arrow(pa.table(
        {"rk": pa.array([big, 5], pa.int64())}))
    got = bloom_semi_join(left, right, "k", "rk",
                          nbits=1 << 12, k=3).to_pandas()
    assert sorted(got["k"]) == [5, big]


def test_json_int_field_overflow_is_null_not_exception():
    import pyarrow as pa

    from ict_log_parser_ray.functions.json_ops import json_int_field

    arr = pa.array(['{"k": 12345678901234567890123}',   # > int64, 23 digits
                    '{"k": 42}', '{"k": "xyz"}', None])
    out = json_int_field(arr, "$.k")
    assert out.to_pylist() == [None, 42, None, None]


def test_stratified_hash_unsigned_no_wrap():
    """e_stratified_sample's multiplicative hash must match the SQL
    oracle's exact (non-wrapping) arithmetic for ids big enough to wrap
    signed int64 multiplication (ADVICE r2)."""
    import numpy as np

    from ict_log_parser_ray.pipelines.driver_queries import _strat_hash

    ids = np.array([1, 3_500_000_000, 2**40], dtype=np.int64)
    got = _strat_hash(ids)
    # Python big-int reference = what DuckDB computes exactly
    want = [(int(i) * 2654435761) % (1 << 32) for i in ids]
    assert got.tolist() == want
    assert (got >= 0).all()


def test_minhash_signatures_batch_bit_exact():
    """signatures_batch (exploded-stream segment-min) must equal the
    per-document signature() loop bit-for-bit (VERDICT r2 item 4)."""
    import numpy as np

    from ict_log_parser_ray.functions.dedup_docs import MinHasher

    mh = MinHasher(num_perm=32, bands=8)
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumped over the lazy dog",
             "", "a", "completely different text about ray data",
             "  Whitespace   Normalized\ttext  ", "ab", None]
    got = mh.signatures_batch(texts)
    want = np.stack([mh.signature(t or "") for t in texts])
    assert got.dtype == np.uint64
    assert (got == want).all()


def test_simhash_partitioned_pairs_match_reference(ray_session):
    """The hash-partitioned pair-task rewrite must produce the same
    (pair, min-hamming) set as an independent single-process reference
    (VERDICT r2 item 2: no groupby(band_key).map_groups left)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        SimHasher, simhash_candidate_pairs)

    rng = np.random.default_rng(5)
    base = ["alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine ten",
            "lorem ipsum dolor sit amet consectetur adipiscing elit"]
    texts, ids = [], []
    for i in range(120):
        t = base[i % 3]
        words = t.split()
        if i % 4 == 0:  # perturb one word → near-dup
            words[rng.integers(0, len(words))] = f"w{i}"
        texts.append(" ".join(words))
        ids.append(i)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow([tbl.slice(0, 40), tbl.slice(40, 40),
                        tbl.slice(80, 40), tbl.slice(0, 0)])
    got = simhash_candidate_pairs(ds, max_hamming=8).to_pandas()
    got_set = {(a, b): h for a, b, h in
               zip(got["doc_a"], got["doc_b"], got["hamming"])}

    # independent reference: same banding + bucket-pair + hamming rules
    sh = SimHasher()
    sims = sh._simhash_batch(pd.Series(texts)) \
        & np.uint64(0x7FFF_FFFF_FFFF_FFFF)
    want = {}
    for band in range(4):
        buckets = {}
        for i, s in zip(ids, sims):
            bv = (int(s) >> (16 * band)) & 0xFFFF
            buckets.setdefault(bv, []).append(i)
        for members in buckets.values():
            ms = sorted(set(members))
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    d = bin(int(sims[ms[x]]) ^ int(sims[ms[y]])).count("1")
                    if d <= 8:
                        key = (ms[x], ms[y])
                        want[key] = min(want.get(key, 99), d)
    assert got_set == want


def test_simhash_wide_banded_equals_exact_allpairs(ray_session):
    """VERDICT r4 item 1: the 128-bit / 4×32-band width must keep the
    pigeonhole-exactness contract — the banded output at max_hamming<=3
    equals the brute-force all-pairs 128-bit hamming set on ANY data.
    Exact dups (hamming 0) + one-word perturbations of long texts give a
    non-empty qualifying set; unrelated texts give none."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ict_log_parser_ray.functions.dedup_docs import (
        SimHasher, simhash_candidate_pairs)

    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(400)]
    texts, ids = [], []
    for i in range(90):
        if i % 3 == 0:          # fresh 48-word base text
            base = list(rng.choice(vocab, size=48))
            texts.append(" ".join(base))
        elif i % 3 == 1:        # exact duplicate of the base
            texts.append(texts[-1])
        else:                   # one-word perturbation
            w = list(texts[-2].split())
            w[int(rng.integers(0, len(w)))] = f"uniq{i}"
            texts.append(" ".join(w))
        ids.append(i)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow([tbl.slice(0, 30), tbl.slice(30, 30),
                        tbl.slice(60, 30), tbl.slice(0, 0)])
    got = simhash_candidate_pairs(ds, max_hamming=3, nbits=128,
                                  cap=10**9).to_pandas()
    got_set = {(a, b): h for a, b, h in
               zip(got["doc_a"], got["doc_b"], got["hamming"])}

    # brute-force all-pairs truth at 128 bits (storage-masked halves,
    # exactly what the banded path verifies against)
    out = SimHasher(nbits=128)(pd.DataFrame({"doc_id": ids,
                                             "text": texts}))
    lo = out["simhash"].to_numpy(np.uint64)
    hi = out["simhash_hi"].to_numpy(np.uint64)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin(int(lo[x]) ^ int(lo[y])).count("1") \
                + bin(int(hi[x]) ^ int(hi[y])).count("1")
            if d <= 3:
                want[(ids[x], ids[y])] = d
    assert want, "fixture must plant qualifying pairs"
    assert any(h > 0 for h in want.values()) or len(want) > 20
    assert got_set == want

    # the wide width must kill random 16-bit band collisions: every
    # emitted pair is a true <=3 pair (no verify-rejected survivors)
    assert all(h <= 3 for h in got_set.values())


def test_simhash_hi_half_independent():
    """The 128-bit width's second half must come from an INDEPENDENT
    word hash for both word_hash engines — identical halves would make
    bands 2,3 redundant with 0,1 and silently halve the effective
    fingerprint."""
    import pandas as pd

    from ict_log_parser_ray.functions.dedup_docs import SimHasher

    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["alpha beta gamma delta epsilon zeta",
                                "one two three four five six seven"]})
    for engine in ("pandas", "fnv"):
        out = SimHasher(word_hash=engine, nbits=128)(df.copy())
        assert (out["simhash"] != out["simhash_hi"]).any(), engine
        again = SimHasher(word_hash=engine, nbits=128)(df.copy())
        assert (out["simhash_hi"] == again["simhash_hi"]).all(), engine
    # low half is bit-identical to the 64-bit hash (width widens, the
    # narrow fingerprint is preserved as a prefix)
    out64 = SimHasher(nbits=64)(df.copy())
    out128 = SimHasher(nbits=128)(df.copy())
    assert (out64["simhash"] == out128["simhash"]).all()


def test_embedding_near_dup_tile_tasks_bounded(ray_session):
    """VERDICT r2 item 3: the cluster verify must run as tile-pair tasks
    — no task gathers a whole cluster.  200 near-identical vectors in one
    cluster with tile=16 would previously put all 200 rows in one
    map_groups task; the max_task_rows hook makes any such gather raise.
    Also re-checks exact parity against the all-pairs baseline across the
    multi-block/multi-tile path."""
    import ray.data as rd

    from ict_log_parser_ray.functions.similarity import (
        embedding_near_dup_pairs, exact_near_dup_pairs)

    rng = np.random.default_rng(23)
    base = rng.normal(size=16).astype(np.float32)
    n = 200
    emb = np.stack([base + rng.normal(scale=1e-3, size=16).astype(np.float32)
                    for _ in range(n)])
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in emb],
                              pa.list_(pa.float32()))})
    # multiple input blocks so tiles straddle block boundaries
    ds = rd.from_arrow([tbl.slice(0, 70), tbl.slice(70, 70),
                        tbl.slice(140, 60)])
    tile = 16
    # hash tiles are ~binomial around n/T=tile; 2x headroom never trips
    # unless a task gathers the whole cluster
    pairs = embedding_near_dup_pairs(ds, threshold=0.99, nlist=1,
                                     tile=tile,
                                     max_task_rows=4 * tile).to_pandas()
    want = exact_near_dup_pairs(rd.from_arrow(tbl),
                                threshold=0.99).to_pandas()
    got_set = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    want_set = {(min(a, b), max(a, b))
                for a, b in zip(want["id_a"], want["id_b"])}
    assert got_set == want_set
    assert len(pairs) == len(got_set)  # single-assign: no dup pairs


def test_pack_width_guards_raise_on_oversized_ids(ray_session, tmp_path):
    """VERDICT r2 item 7: >12-digit (or negative) ids must fail loudly
    instead of silently mis-sorting the fixed-width packs."""
    import pandas as pd
    import pyarrow.parquet as pq
    import pytest

    from ict_log_parser_ray.pipelines.driver_queries import e_user_first_last
    from ict_log_parser_ray.stages.attempts import _attempt_rows

    # attempts pack: oversized turn_idx
    batch = pa.table({
        "conv_id": pa.array(["c1"]), "tool": pa.array(["t"]),
        "record_type": pa.array(["header"]),
        "turn_idx": pa.array([10 ** 12], pa.int64()),
        "serial": pa.array(["s"]), "panel_serial": pa.array(["p"]),
        "board_index": pa.array([1], pa.int64()),
        "status": pa.array(["0"]),
        "start_ts": pa.array([pd.Timestamp("2024-01-01")],
                             pa.timestamp("us")),
    })
    with pytest.raises(ValueError, match="turn_idx out of packable"):
        _attempt_rows(batch)

    # e_user_first_last pack: oversized event_id
    ev = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "event_id": pa.array([5, 10 ** 12], pa.int64()),
        "event_type": pa.array(["a", "b"]),
        "ts": pa.array(pd.to_datetime(["2024-01-01", "2024-01-02"]),
                       pa.timestamp("us")),
    })
    pq.write_table(ev, tmp_path / "events.parquet")
    with pytest.raises(Exception, match="event_id out of packable"):
        e_user_first_last(str(tmp_path))


def test_kmeans_fixed_seed_centroid_golden(ray_session):
    """VERDICT r2 item 8: a hardcoded fixed-seed centroid golden so a
    numeric drift in the blob partials (tobytes/frombuffer round trip,
    argmin tie-break, partial-sum order) cannot pass silently.  The
    column-sorted canonical form is layout-invariant (measured 0.0 diff
    across block splits)."""
    import ray.data as rd

    from ict_log_parser_ray.functions.kmeans import kmeans_fit

    rng = np.random.default_rng(99)
    centers = rng.normal(size=(3, 4)) * 5
    vecs = np.concatenate(
        [c + rng.normal(scale=0.1, size=(100, 4)) for c in centers])
    tbl = pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})
    ds = rd.from_arrow([tbl.slice(0, 120), tbl.slice(120, 120),
                        tbl.slice(240, 60)])
    got = np.sort(kmeans_fit(ds, k=3, iters=20, seed=42), axis=0)
    golden = np.array([
        [-8.793313274383545, -2.322971088886261, -2.2717682218551634,
         -2.984881327152252],
        [-5.236415810585022, 4.659409685134888, 0.2586518475040793,
         3.429577512741089],
        [0.3988670787960291, 8.428673343658447, 3.3754908633232117,
         6.223358845710754]])
    assert np.allclose(got, golden, atol=1e-9)


def test_weighted_sampling_is_weight_proportional(ray_session):
    """Sequential-Poisson weighted bottom-k: items with 9x the weight
    must occupy ~90% of the sample (weight-proportional inclusion for
    k << n), and the partial+re-cut must equal a single-process cut."""
    import ray.data as rd

    from ict_log_parser_ray.functions.sampling import (weighted_bottom_k,
                                                       weighted_priority)

    n, k = 20_000, 2_000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 2 == 0, 9, 1).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
    ds = rd.from_arrow([tbl.slice(0, 7000), tbl.slice(7000, 7000),
                        tbl.slice(14000, 6000), tbl.slice(0, 0)])
    got = weighted_bottom_k(ds, "doc_id", "n_chars", k=k)
    assert len(got) == k
    assert got["rn"].tolist() == list(range(1, k + 1))

    # single-process reference: same integer priorities, same ordering
    q = weighted_priority(ids, w)
    order = np.lexsort((ids, q))[:k]
    assert got["doc_id"].tolist() == ids[order].tolist()

    heavy_frac = (got["n_chars"] == 9).mean()
    # expected = 9/(9+1) = 0.9 of the sample; the hash acts pseudo-random
    assert 0.85 < heavy_frac < 0.95


def test_select_to_token_budget_vs_sequential_reference(ray_session):
    """Global ordered prefix-sum cut vs a single-process pandas
    reference (same TextAnalyzer features, sequential sort + cumsum) on
    a mixed corpus: good docs, punct-heavy docs, stopword-free docs,
    EMPTY docs (n_tok=0 — the running sum must not advance), across
    multiple blocks including a zero-row one.  Budgets cover 0, an
    EXACT boundary (budget == some row's cum_tok), mid-stream, and
    all-kept."""
    import pandas as pd
    import ray.data as rd

    from ict_log_parser_ray.blocks import concat_shaped
    from ict_log_parser_ray.functions.sampling import (BUDGET_SCHEMA,
                                                       select_to_token_budget)
    from ict_log_parser_ray.functions.text import TextAnalyzer

    texts = []
    for i in range(240):
        if i % 7 == 0:
            texts.append("")                       # n_tok = 0
        elif i % 5 == 0:
            texts.append("!!! ??? ;;; ***" * 3)    # punct-heavy, low q
        elif i % 3 == 0:
            texts.append(" ".join(f"w{j}" for j in range(i % 11 + 2)))
        else:
            texts.append(("the quick brown fox jumps over the lazy dog "
                          * (i % 4 + 1)).strip())
    ids = np.arange(240, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids),
                    "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow([tbl.slice(0, 90), tbl.slice(90, 90),
                        tbl.slice(180, 60), tbl.slice(0, 0)])

    # sequential reference
    an = TextAnalyzer()
    s = pd.Series(texts)
    n_tok = an.token_count(s).to_numpy()
    q = (2 * ((n_tok >= 10) & (n_tok <= 100_000))
         + (an.punct_ratio(s).to_numpy() < 0.3)
         + (an.stopword_ratio(s).to_numpy() > 0.01)
         + ((an.mean_word_len(s).to_numpy() > 2)
            & (an.mean_word_len(s).to_numpy() < 12))).astype(np.int64)
    ref = pd.DataFrame({"doc_id": ids, "q_int": q, "n_tok": n_tok})
    ref = ref.sort_values(["q_int", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    ref["cum_tok"] = ref["n_tok"].cumsum()
    assert ref["q_int"].nunique() >= 3   # the mix really is mixed
    assert (ref["n_tok"] == 0).any()

    total = int(ref["cum_tok"].iloc[-1])
    exact_boundary = int(ref["cum_tok"].iloc[len(ref) // 2])
    for budget in (0, exact_boundary, total // 3, total + 10):
        got = (concat_shaped(select_to_token_budget(ds, budget), "cum_tok",
                             empty_schema=BUDGET_SCHEMA).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = (ref[ref["cum_tok"] <= budget]
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got, want.astype("int64"), check_dtype=False)
        if budget == exact_boundary:   # the == row itself is kept
            assert (got["cum_tok"] == budget).any()
        if budget == total + 10:
            assert len(got) == len(ref)

    with pytest.raises(ValueError):
        select_to_token_budget(ds, -1)


def test_select_to_token_budget_rejects_out_of_range_ids(ray_session):
    """doc_id >= 2^48 would collide with the quality level in the
    composite sort key — must fail loudly, not mis-sort."""
    import ray
    import ray.data as rd

    from ict_log_parser_ray.functions.sampling import select_to_token_budget

    tbl = pa.table({"doc_id": pa.array([1 << 48], pa.int64()),
                    "text": pa.array(["hello world"], pa.string())})
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        select_to_token_budget(rd.from_arrow(tbl), 100).to_pandas()


def _force_tiny_blocks(monkeypatch, n=33):
    """Pin the read split ABOVE the tiny fixtures' row counts so the
    zero-row pass-through guards stay exercised: read_table's footer
    sizing gives a sub-MB test file exactly 1 block, which silently
    removed the forced-block coverage these tests document."""
    from ict_log_parser_ray.sources import transcripts as _tr
    monkeypatch.setattr(_tr, "_table_num_blocks", lambda path: n)


def test_percentile_filter_ties_nulls_tiny(ray_session, tmp_path, monkeypatch):
    """d_percentile_filter adversarial edges vs DuckDB on the SAME file:
    threshold ties kept (>=), null-lang rows dropped on both sides
    (inner-join semantics), single-doc language keeps its only doc, and
    a tiny input (rows << forced block count) exercises the zero-row
    pass-through schema path."""
    _force_tiny_blocks(monkeypatch)
    import duckdb
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.driver_queries import (
        build_oracles, d_percentile_filter)

    tbl = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "text": pa.array(["x"] * 12),
        "lang": pa.array(["en", "en", "en", "en", "de", "de", "de",
                          None, None, "fr", "en", "de"]),
        "source": pa.array(["s"] * 12),
        # en: [10,20,30,30,30] → p75 = 30 (ties AT threshold kept)
        # de: [5,5,5,100]      → p75 = 5? ceil(.75*4)=3 → sorted[3]=5
        # fr: [7]              → p75 = 7 (kept)
        "n_chars": pa.array([10, 20, 30, 30, 5, 5, 5,
                             999, 999, 7, 30, 100], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = (d_percentile_filter(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path / 'documents.parquet'}'")
    want = (con.sql(build_oracles()["d_percentile_filter"]).df()
            .sort_values("doc_id").reset_index(drop=True))
    con.close()

    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_chars"].tolist() == want["n_chars"].tolist()
    # null-lang rows (the two 999s) must be gone despite huge n_chars
    assert 7 not in got["doc_id"].tolist() and 8 not in got["doc_id"].tolist()
    # the singleton language survives its own p75
    assert 9 in got["doc_id"].tolist()


def test_contamination_probes_dups_nulls_tiny(ray_session, tmp_path, monkeypatch):
    """d_contamination adversarial edges vs DuckDB on the SAME file:
    multi-probe hits count correctly, duplicate probe texts dedup
    (DISTINCT semantics), sub-40-char seed docs contribute no probe,
    null text never matches, and the tiny input (rows << forced block
    count) exercises the zero-row pass-through concat guard."""
    _force_tiny_blocks(monkeypatch)
    import duckdb
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.driver_queries import (
        build_oracles, d_contamination)

    pa_ = "A" * 40 + "tail0"          # probe0 = 'A'*40 (doc 0)
    pb_ = "B" * 40 + "tail1"          # probe1 = 'B'*40 (doc 97)
    rows = {
        0:   pa_,                     # seed: contains probe0 → 1 hit
        97:  pb_,                     # seed: contains probe1 → 1 hit
        194: pa_,                     # seed DUP of probe0 → DISTINCT dedup
        1:   "x" + "A" * 40 + "y" + "B" * 40,   # both probes → 2 hits
        2:   "zz" + "A" * 40,         # probe0 only → 1 hit
        3:   "short, no match",       # clean → absent
        4:   None,                    # null text → absent both sides
        5:   "A" * 39,                # 39 As: not a probe, no 40-A run
    }
    tbl = pa.table({
        "doc_id": pa.array(list(rows), pa.int64()),
        "text": pa.array(list(rows.values()), pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([len(v) if v else 0 for v in rows.values()],
                            pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = d_contamination(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path / 'documents.parquet'}'")
    want = (con.sql(build_oracles()["d_contamination"]).df()
            .sort_values("doc_id").reset_index(drop=True))
    con.close()

    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_hits"].tolist() == want["n_hits"].astype("int64").tolist()
    hits = dict(zip(got["doc_id"], got["n_hits"]))
    assert hits[1] == 2 and hits[2] == 1 and hits[194] == 1
    assert 3 not in hits and 4 not in hits and 5 not in hits


def test_customer_order_counts_left_zero_orphan_tiny(ray_session, tmp_path, monkeypatch):
    """q_customer_order_counts LEFT-join edges vs DuckDB on the SAME
    files: zero-order customers appear with n_orders=0, orphan orders
    (custkey not in customer) are invisible, multi-order customers
    count exactly; tiny input → zero-row pass-through blocks."""
    _force_tiny_blocks(monkeypatch)
    import duckdb
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.driver_queries import (
        build_oracles, q_customer_order_counts)

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["a", "b", "c"]),
        "c_nationkey": pa.array([0, 0, 0], pa.int64()),
        "c_acctbal": pa.array([0.0, 0.0, 0.0]),
        "c_mktsegment": pa.array(["m", "m", "m"]),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 9, 9], pa.int64()),  # 9 = orphan
        "o_orderstatus": pa.array(["F"] * 5),
        "o_totalprice": pa.array([1.0] * 5),
        "o_orderdate": pa.array(["1995-01-01"] * 5),
        "o_orderpriority": pa.array(["1-URGENT"] * 5),
    }), tmp_path / "orders.parquet")

    got = q_customer_order_counts(str(tmp_path)).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{tmp_path / (t + '.parquet')}'")
    want = (con.sql(build_oracles()["q_customer_order_counts"]).df()
            .sort_values("c_custkey").reset_index(drop=True))
    con.close()

    assert got["c_custkey"].tolist() == want["c_custkey"].tolist() == [1, 2, 3]
    assert got["n_orders"].tolist() == \
        want["n_orders"].astype("int64").tolist() == [3, 0, 0]


def test_lang_mix_quota_edges_tiny(ray_session, tmp_path, monkeypatch):
    """d_lang_mix adversarial edges vs DuckDB on the SAME file: the
    dominant language is downsampled to its 4·⌊√c⌋ quota, a tail
    language smaller than its quota survives whole, a singleton keeps
    its one doc, null langs drop, and a perfect-square count (c=25)
    exercises the floor(sqrt) boundary both engines must agree on."""
    _force_tiny_blocks(monkeypatch)
    import duckdb
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.driver_queries import (
        build_oracles, d_lang_mix)

    ids, langs = [], []
    for i in range(25):                      # en: c=25 → quota 4*5=20
        ids.append(i); langs.append("en")
    for i in range(25, 28):                  # de: c=3 → quota min(3,4)=3
        ids.append(i); langs.append("de")
    ids.append(28); langs.append("fr")       # fr: c=1 → quota 1
    ids += [29, 30]; langs += [None, None]   # null langs drop

    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["x"] * len(ids)),
        "lang": pa.array(langs),
        "source": pa.array(["s"] * len(ids)),
        "n_chars": pa.array([1] * len(ids), pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = d_lang_mix(str(tmp_path)).sort_values(
        ["lang", "rn"]).reset_index(drop=True)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path / 'documents.parquet'}'")
    want = (con.sql(build_oracles()["d_lang_mix"]).df()
            .sort_values(["lang", "rn"]).reset_index(drop=True))
    con.close()

    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rn"].tolist() == want["rn"].astype("int64").tolist()
    sizes = got.groupby("lang")["doc_id"].count().to_dict()
    assert sizes == {"en": 20, "de": 3, "fr": 1}
    assert 29 not in got["doc_id"].tolist() and 30 not in got["doc_id"].tolist()


def test_new_queries_empty_and_all_null_inputs(ray_session, tmp_path, monkeypatch):
    """Empty orders / all-null-lang documents must yield empty-but-typed
    results, not a pa.concat_tables([]) raise (the zero-row pass-through
    family of traps — every driver-side concat needs an empty fallback)."""
    _force_tiny_blocks(monkeypatch)
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.driver_queries import (
        d_lang_mix, q_customer_order_counts)

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array([0, 0], pa.int64()),
        "c_acctbal": pa.array([0.0, 0.0]),
        "c_mktsegment": pa.array(["m", "m"]),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.string()), ("o_orderpriority", pa.string()),
    ]).empty_table(), tmp_path / "orders.parquet")

    got = q_customer_order_counts(str(tmp_path)).to_pandas() \
        .sort_values("c_custkey")
    assert got["n_orders"].tolist() == [0, 0]

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["x", "y"]),
        "lang": pa.array([None, None], pa.string()),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([1, 1], pa.int64()),
    }), tmp_path / "documents.parquet")
    out = d_lang_mix(str(tmp_path))
    assert len(out) == 0 and list(out.columns) == ["doc_id", "lang", "rn"]


def test_knn_lsh_full_probe_parity_and_recall(ray_session):
    """LSH-bucketed ANN: radius = nbits probes every bucket and must
    equal the exact scan's top-k (same cosine ordering + id tiebreak);
    at the production radius the approximate result keeps decent
    recall@10; an out-of-bucket query on a tiny corpus exercises the
    zero-row pass-through concat guard (no block emits candidates)."""
    import ray.data as rd

    from ict_log_parser_ray.functions.similarity import (knn_bruteforce,
                                                         knn_lsh)

    rng = np.random.default_rng(7)
    n, dim = 400, 32
    base = rng.standard_normal(dim).astype(np.float32)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    # plant 10 TRUE neighbors of the query — on pure-random data the
    # exact top-10 are near-orthogonal strangers and recall@10 measures
    # nothing; LSH's contract is about actual high-cosine neighbors
    m[:10] = base + rng.standard_normal((10, dim)).astype(np.float32) * 0.3
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([list(map(float, r)) for r in m],
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    q = base

    exact = knn_bruteforce(ds, q, k=10)
    full = knn_lsh(ds, q, k=10, nbits=8, radius=8)
    assert full["vec_id"].to_pylist() == exact["vec_id"].to_pylist()
    assert np.allclose(full["cosine"].to_numpy(), exact["cosine"].to_numpy())

    approx = knn_lsh(ds, q, k=10, nbits=8, radius=2)
    recall = len(set(approx["vec_id"].to_pylist())
                 & set(exact["vec_id"].to_pylist())) / 10
    assert recall >= 0.5, recall
    # the true nearest neighbor shares the query's bucket w.h.p.
    assert exact["vec_id"][0].as_py() in approx["vec_id"].to_pylist()

    # radius=0, antipodal query → likely zero candidates in some blocks;
    # must return an empty/short typed table, not raise on concat
    far = knn_lsh(ds, -q, k=10, nbits=8, radius=0)
    assert far.schema.names == ["vec_id", "cosine"]


def test_media_resize_geometry_and_passthrough(ray_session):
    """Resize stage: aspect ratio preserved with the longer side capped,
    no upscaling (small images untouched byte-identical), audio rows pass
    through, payload size tracks the area ratio, output deterministic."""
    import ray.data as rd

    from ict_log_parser_ray.functions.multimodal import (MediaResizer,
                                                         resize_media,
                                                         synth_media_table)

    assert MediaResizer._target(1000, 500, 256) == (256, 128)
    assert MediaResizer._target(500, 1000, 256) == (128, 256)
    assert MediaResizer._target(100, 50, 256) == (100, 50)   # no upscale
    assert MediaResizer._target(10000, 3, 256) == (256, 1)   # floor ≥ 1

    tbl = synth_media_table(n=24)
    out = (resize_media(rd.from_arrow(tbl), max_side=64)
           .to_pandas().set_index("media_id"))
    src = tbl.to_pandas().set_index("media_id")
    for mid, row in out.iterrows():
        s = src.loc[mid]
        if s["kind"] == "audio":
            assert row["payload"] == s["payload"]      # untouched
            continue
        assert max(row["width"], row["height"]) <= 64
        # aspect ratio preserved to floor precision
        if (s["width"], s["height"]) != (row["width"], row["height"]):
            assert len(row["payload"]) <= len(s["payload"])
    # deterministic across runs
    out2 = (resize_media(rd.from_arrow(tbl), max_side=64)
            .to_pandas().set_index("media_id"))
    assert (out["payload"] == out2["payload"]).all()


def test_media_frame_sampling_counts_and_timing(ray_session):
    """Frame-sample stage: one frame per every_ms starting at t=0,
    strictly below duration; non-video rows contribute nothing; frame
    payloads deterministic; row EXPANSION happens inside the batch fn."""
    import ray.data as rd

    from ict_log_parser_ray.functions.multimodal import (sample_frames,
                                                         synth_media_table)

    tbl = synth_media_table(n=24)
    fr = sample_frames(rd.from_arrow(tbl), every_ms=7000).to_pandas()
    src = tbl.to_pandas().set_index("media_id")
    vids = src[src["kind"] == "video"]
    assert set(fr["media_id"]) <= set(vids.index)
    for mid, g in fr.groupby("media_id"):
        dur = int(vids.loc[mid, "duration_ms"])
        want = len(range(0, dur, 7000))
        assert len(g) == want
        assert g["ts_ms"].tolist() == list(range(0, dur, 7000))
        assert g["frame_idx"].tolist() == list(range(want))
    assert (fr["payload"].str.len() == 32).all()   # sha256 frames


def test_knn_batch_matches_single_query_twin(ray_session):
    """Batched query-matrix kNN (one distributed pass, matrix broadcast
    once) must rank exactly like q independent single-vector
    knn_bruteforce/_knn_rank runs — float64 math both sides.  Also
    covers: k > corpus (all rows returned per query), the zero-row
    pass-through block regime (limit() leaves empty blocks), and the
    (q, d) / query_ids validation errors."""
    import numpy as np
    import pyarrow.parquet as pq

    from ict_log_parser_ray.functions.similarity import knn_batch
    from ict_log_parser_ray.pipelines.driver_queries import _knn_rank
    from ict_log_parser_ray.sources.transcripts import read_table

    sf = "/root/testdata/sf0.01"
    t = pq.read_table(sf + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    qm = np.stack([np.asarray(t["embedding"][i].as_py(), dtype=np.float32)
                   for i in range(3)])

    def _ds():
        return read_table(sf, "embeddings",
                          columns=["vec_id", "embedding"])

    res = knn_batch(_ds(), qm, k=10, query_ids=np.arange(3)).to_pandas()
    assert res.groupby("q_id").size().tolist() == [10, 10, 10]
    for qi in range(3):
        single = _knn_rank(_ds(), qm[qi], k=10).to_pandas()
        got = res[res.q_id == qi]["vec_id"].tolist()
        assert got == single["vec_id"].tolist()
    # within-query ordering: cosine desc
    for qi in range(3):
        c = res[res.q_id == qi]["cosine"].to_numpy()
        assert (np.diff(c) <= 1e-12).all()

    tiny = _ds().limit(3).materialize()        # forces empty blocks
    r2 = knn_batch(tiny, qm, k=10, query_ids=np.arange(3)).to_pandas()
    assert r2.groupby("q_id").size().tolist() == [3, 3, 3]

    with pytest.raises(ValueError):
        knn_batch(_ds(), qm[0], k=5)           # 1-D query
    with pytest.raises(ValueError):
        knn_batch(_ds(), qm, k=5, query_ids=np.arange(2))


def test_contamination_ac_path_matches_kernel_path(ray_session, tmp_path):
    """d_contamination's >256-probe Aho-Corasick branch (polars
    extract_many, overlapping+unique) must be value-identical to the
    small-probe arrow-kernel loop.  400 probe-eligible docs (all ids
    multiples of 97, ≥40 chars) force the AC branch; the reference
    n_hits is computed with the same per-probe substring logic the
    kernel branch uses.  Includes docs that embed OTHER probes'
    prefixes mid-text (the overlapping=True case) and a null text."""
    import pyarrow.parquet as pq

    from ict_log_parser_ray.pipelines.driver_queries import d_contamination

    n = 400
    ids = np.arange(n, dtype=np.int64) * 97
    texts = []
    for i in range(n):
        base = f"probe{i:04d} " + "x" * 40  # ≥ 40 chars, unique prefix
        texts.append(base)
    # doc 0 embeds doc 1's and doc 2's 40-char prefixes mid-text
    texts[0] = texts[0] + texts[1][:40] + texts[2][:40]
    tbl = pa.table({"doc_id": pa.array(ids),
                    "text": pa.array(texts[:-1] + [None], pa.string())})
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    got = d_contamination(str(d))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    got = dict(zip(got["doc_id"].astype(int), got["n_hits"].astype(int)))

    probes = sorted({t[:40] for t in texts[:-1] if len(t) >= 40})
    assert len(probes) > 256  # the AC branch really engaged
    want = {}
    for i, t in enumerate(texts[:-1]):
        h = sum(1 for p in probes if p in t)
        if h:
            want[int(ids[i])] = h
    assert got == want
    assert want[0] == 3  # self + the two embedded overlapping prefixes


def test_media_corpus_stats_one_pass_dispatch(ray_session):
    """Distributed one-pass kind dispatch == the single-process stage on
    the whole table (ints exact; the float feature checksum only to
    summation-order tolerance), including with forced zero-row
    pass-through blocks (repartition > rows)."""
    import ray.data as rd

    from ict_log_parser_ray.functions.multimodal import (
        MediaCorpusStatsStage, media_corpus_stats, synth_media_table)

    tbl = synth_media_table(n=96, seed=7, real_images=True)
    ref = (MediaCorpusStatsStage(max_side=48, every_ms=1000)(tbl)
           .to_pandas().groupby("kind", as_index=False).sum()
           .sort_values("kind").reset_index(drop=True))

    # stateless-task default AND the actor-pool path (kept for genuinely
    # expensive decoders), each with forced zero-row pass-through blocks
    for conc in (None, (1, 2)):
        for ds in (rd.from_arrow(tbl),
                   rd.from_arrow(tbl).repartition(150)):  # zero-row blocks
            df = media_corpus_stats(ds, max_side=48, every_ms=1000,
                                    concurrency=conc, batch_size=16)
            for col in ("n_rows", "n_frames", "in_bytes", "out_bytes"):
                assert df[col].tolist() == ref[col].tolist()
            assert np.allclose(df["feat0_sum"], ref["feat0_sum"])

    # semantic spot checks against first principles
    img_rows = tbl.to_pandas().query("kind == 'image'")
    assert int(ref.loc[ref["kind"] == "image", "in_bytes"].iloc[0]) == \
        int(img_rows["payload"].str.len().sum())
    vid = tbl.to_pandas().query("kind == 'video'")
    assert int(ref.loc[ref["kind"] == "video", "n_frames"].iloc[0]) == \
        int((-(-vid["duration_ms"] // 1000)).sum())

    # fully-empty input: empty stats frame, no zero-row crash
    assert len(media_corpus_stats(rd.from_arrow(tbl.slice(0, 0)),
                                  concurrency=(1, 2))) == 0


def test_media_fixture_deterministic_and_readable(ray_session, tmp_path):
    """ensure_media_fixture: chunk generation is deterministic and
    writer-batching-independent; the written file reads back through
    read_table into the dispatch pipeline with real decodable images."""
    import os

    from ict_log_parser_ray import fixtures as fx
    from ict_log_parser_ray.functions.multimodal import (decode_netpbm,
                                                         media_corpus_stats)
    from ict_log_parser_ray.sources.transcripts import read_media

    a = fx.generate_media_chunk(600, 0, seed=11)
    b = fx.generate_media_chunk(600, 0, seed=11)
    assert a.equals(b)
    assert not a.equals(fx.generate_media_chunk(600, 0, seed=12))

    d = fx.ensure_media_fixture(600, seed=11, root=str(tmp_path))
    assert fx.ensure_media_fixture(600, seed=11, root=str(tmp_path)) == d
    assert len(os.listdir(os.path.join(d, "media"))) == -(-600 // fx.MEDIA_CHUNK)

    ds = read_media(d)
    assert ds.count() == 600
    df = media_corpus_stats(ds, concurrency=(1, 2), batch_size=64)
    assert df["n_rows"].sum() == 600
    assert sorted(df["kind"]) == ["audio", "image", "video"]
    assert (df["in_bytes"] > 0).all()

    # image payloads are REAL netpbm: decode one and check metadata
    img = a.filter(pa.compute.equal(a["kind"], "image")).slice(0, 1)
    arr = decode_netpbm(img["payload"][0].as_py())
    assert arr.shape == (img["height"][0].as_py(),
                         img["width"][0].as_py(), 3)


def test_media_corpus_stats_null_payloads_dropped(ray_session):
    """NULL payload cells (fetch failures in a real crawl) are dropped —
    a missing cell is a data condition, not a decode bug; stats equal
    the same table with those rows removed, and an all-null batch yields
    an empty frame rather than a crash."""
    import ray.data as rd

    from ict_log_parser_ray.functions.multimodal import (
        MEDIA_SCHEMA, media_corpus_stats, synth_media_table)

    tbl = synth_media_table(n=48, seed=3, real_images=True)
    pay = tbl["payload"].to_pylist()
    nulled = [p if i % 4 else None for i, p in enumerate(pay)]
    tbl_n = tbl.set_column(tbl.schema.get_field_index("payload"),
                           "payload", pa.array(nulled, pa.binary()))

    got = media_corpus_stats(rd.from_arrow(tbl_n), batch_size=16)
    keep = [i for i in range(48) if i % 4]
    want = media_corpus_stats(rd.from_arrow(tbl.take(keep)), batch_size=16)
    for col in ("n_rows", "n_frames", "in_bytes", "out_bytes"):
        assert got[col].tolist() == want[col].tolist()

    all_null = tbl.set_column(
        tbl.schema.get_field_index("payload"), "payload",
        pa.array([None] * 48, pa.binary()))
    assert len(media_corpus_stats(rd.from_arrow(all_null))) == 0


def test_media_corpus_stats_unknown_kinds_counted(ray_session):
    """Rows with an unknown kind pass through under their own kind value
    (rows + bytes only) — a stats op must never silently drop rows."""
    import ray.data as rd

    from ict_log_parser_ray.functions.multimodal import (
        MEDIA_SCHEMA, media_corpus_stats, synth_media_table)

    tbl = synth_media_table(n=30, seed=9, real_images=True)
    kinds = tbl["kind"].to_pylist()
    kinds[4] = "pdf"
    kinds[7] = "pdf"
    kinds[10] = "pointcloud"
    kinds[13] = None  # null kind with a NON-null payload: must count
    kinds[16] = None  # under the "<null>" sentinel, never crash/drop
    tbl = tbl.set_column(tbl.schema.get_field_index("kind"), "kind",
                         pa.array(kinds, pa.string()))
    df = media_corpus_stats(rd.from_arrow(tbl), batch_size=8)
    assert df["n_rows"].sum() == 30
    row = df[df["kind"] == "pdf"].iloc[0]
    assert row["n_rows"] == 2 and row["n_frames"] == 0 \
        and row["out_bytes"] == 0
    pays = tbl.to_pandas()
    assert row["in_bytes"] == \
        int(pays[pays["kind"] == "pdf"]["payload"].str.len().sum())
    assert df[df["kind"] == "pointcloud"].iloc[0]["n_rows"] == 1
    nrow = df[df["kind"] == "<null>"].iloc[0]
    assert nrow["n_rows"] == 2 and nrow["out_bytes"] == 0
    assert nrow["in_bytes"] == \
        int(pays[pays["kind"].isna()]["payload"].str.len().sum())
