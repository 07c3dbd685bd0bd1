"""Deterministic synthetic `transcripts` fixture generator (FIXTURES.md §1-2).

The reference repo (Sha0S/ICT_log_parser) ships no test corpus, so the
conformance fixtures are defined here from scratch.  The grammar of the
``text`` column mirrors the Keysight i3070 datalog record families consumed by
the reference parser (reference call sites: /root/reference/src/main.rs:1014-1085
for measurement+limit records, main.rs:1195-1263 for panel/attempt structure):

- ``role=header``  ``{@BTEST|<serial>|<status>|<start YYMMDDHHMMSS>|<board_index>|<panel_serial>}``
- ``role=analog``  ``{@A-<KIND>|<status>|<measurement sci>|<test_name>}`` +
  optional ``{@LIM2|ul|ll}`` / ``{@LIM3|nom|ul|ll}`` suffix (TLimit::Lim2/Lim3,
  main.rs:1030-1085)
- ``role=digital`` ``{@D-T|<status>|<test_name>}``
- ``role=status``  ``{@BTEST-END|<status>|<end YYMMDDHHMMSS>}`` — attempt
  result = this status (last-attempt-wins, main.rs:1205)
- ``role=chatter`` free text without ``{@`` — must route to parse_error.

Everything is seeded and pure-function deterministic: same (seed, sf) →
identical tables.  Per-panel RNG streams (``default_rng([seed, panel])``) keep
panel content independent of panel count, so small sf tables are prefixes of
large ones in panel space.

One conversation (``conv_id``) = one logfile = one attempt of one board
position in one panel run.  A failing panel run is retested as a whole
(new run index, all boards re-emitted) — mirroring "one logfile = one test
run of one board/panel" in the reference (main.rs:294).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_VERSION = 4
DEFAULT_SEED = 42
DEFAULT_ROOT = "/tmp/ict_ray_fixtures"

N_TOOLS = 8
MISSING_META_TOOL = "ict-05"  # present in transcripts, absent from tool_meta
ANALOG_KINDS = [("RES", "r"), ("CAP", "c"), ("DIO", "v"), ("IND", "l"), ("JUM", "j")]
TS_BASE = datetime(2026, 1, 5, 6, 0, 0)  # spans 3 shifts and >24 h
SPREAD_US = int(30 * 3600 * 1e6)

FAIL_RATE = 0.10
RETEST_RATE = 0.45  # panel-level retest probability when a board failed
REFAIL_RATE = 0.30
CHATTER_RATE = 0.05
DUP_RATE = 0.01
MEGA_FACTOR = 60  # mega conversation: ~60x the median attempt length

CHATTER_WORDS = (
    "operator note fixture probe contact clean vacuum ok warn temp drift "
    "shift change pallet scan misread retry belt jam reseat"
).split()


def _build_testdefs(seed: int):
    """120 test definitions: 100 analog (typed, with limits) + 20 digital."""
    rng = np.random.default_rng([seed, 7001])
    defs = []
    for i in range(100):
        kind, prefix = ANALOG_KINDS[int(rng.integers(0, len(ANALOG_KINDS)))]
        name = f"{prefix}{100 + i}"
        if kind == "DIO" and rng.random() < 0.3:
            name += "%ON"
        nom = float(10.0 ** rng.uniform(0.0, 4.0))
        lim_kind = 3 if rng.random() < 0.8 else 2
        defs.append(
            dict(name=name, kind=kind, nom=nom, lim=lim_kind, digital=False)
        )
    for i in range(20):
        defs.append(dict(name=f"d{100 + i}", kind="DIG", digital=True))
    pareto_idx = [int(i) for i in rng.choice(100, size=10, replace=False)]
    limit_change_names = [defs[pareto_idx[0]]["name"], defs[pareto_idx[1]]["name"]]
    return defs, pareto_idx, limit_change_names


def _fmt_ts(t_us: int) -> str:
    return (TS_BASE + timedelta(microseconds=t_us)).strftime("%y%m%d%H%M%S")


def _abs_us(t_us: int) -> int:
    """Microseconds since unix epoch for the ts column (timestamp[us], naive)."""
    return int((TS_BASE - datetime(1970, 1, 1)).total_seconds() * 1e6) + t_us


class _Rows:
    __slots__ = ("conv_id", "turn_idx", "role", "text", "tool", "ts")

    def __init__(self):
        self.conv_id, self.turn_idx, self.role, self.text, self.tool, self.ts = (
            [], [], [], [], [], [],
        )

    def add(self, conv_id, turn_idx, role, text, tool, t_us):
        self.conv_id.append(conv_id)
        self.turn_idx.append(turn_idx)
        self.role.append(role)
        self.text.append(text)
        self.tool.append(tool)
        self.ts.append(_abs_us(t_us))


def _emit_attempt(rows, conv_id, serial, panel_serial, board_index, tool, t_us,
                  subset, fail_tests, attempt_pass, prng, defs,
                  limit_change_names, mid_us):
    status = "00" if attempt_pass else "01"
    turn = 0
    rows.add(conv_id, turn, "header",
             f"{{@BTEST|{serial}|{status}|{_fmt_ts(t_us)}|{board_index}|{panel_serial}}}",
             tool, t_us)
    turn += 1
    for ti in subset:
        t_us += int(prng.integers(50_000, 200_000))
        if prng.random() < CHATTER_RATE:
            words = " ".join(
                CHATTER_WORDS[int(w)]
                for w in prng.integers(0, len(CHATTER_WORDS), size=int(prng.integers(3, 8)))
            )
            rows.add(conv_id, turn, "chatter", words, tool, t_us)
            turn += 1
            t_us += int(prng.integers(10_000, 50_000))
        d = defs[ti]
        failed = d["name"] in fail_tests
        st = "01" if failed else "00"
        if d["digital"]:
            rows.add(conv_id, turn, "digital", f"{{@D-T|{st}|{d['name']}}}", tool, t_us)
        else:
            nom = d["nom"]
            if d["name"] in limit_change_names and t_us > mid_us:
                nom *= 1.05  # limit change mid-corpus (exercises A6)
            ul, ll = nom * 1.1, nom * 0.9
            if failed:
                meas = nom * (1.2 + prng.uniform(0.0, 0.5))
            else:
                meas = nom * (1.0 + prng.uniform(-0.08, 0.08))
            text = f"{{@A-{d['kind']}|{st}|{meas:+1.4E}|{d['name']}}}"
            if d["lim"] == 3:
                text += f"{{@LIM3|{nom:+1.4E}|{ul:+1.4E}|{ll:+1.4E}}}"
            else:
                text += f"{{@LIM2|{ul:+1.4E}|{ll:+1.4E}}}"
            rows.add(conv_id, turn, "analog", text, tool, t_us)
        turn += 1
    t_us += int(prng.integers(100_000, 400_000))
    rows.add(conv_id, turn, "status",
             f"{{@BTEST-END|{status}|{_fmt_ts(t_us)}}}", tool, t_us)
    return t_us


def n_panels_for_sf(sf: float) -> int:
    return max(8, int(round(50_000 * sf)))


def generate_transcripts_table(sf: float, seed: int = DEFAULT_SEED,
                               mega_factor: int = MEGA_FACTOR) -> pa.Table:
    defs, pareto_idx, limit_change_names = _build_testdefs(seed)
    pareto_names = [defs[i]["name"] for i in pareto_idx]
    n_panels = n_panels_for_sf(sf)
    mid_us = SPREAD_US // 2
    rows = _Rows()

    for p in range(n_panels):
        prng = np.random.default_rng([seed, p])
        boards = int(prng.integers(1, 9))
        tool = f"ict-{p % N_TOOLS:02d}"
        t_us = int(p * SPREAD_US / n_panels) + int(prng.integers(0, 3_600_000_000))
        n_t = int(prng.integers(20, 61))
        extra = prng.choice(len(defs), size=n_t, replace=False)
        subset = sorted(set(pareto_idx) | set(int(x) for x in extra))
        board_failed = {}
        run = 0
        while True:
            any_fail = False
            for b in range(boards):
                if run == 0:
                    fails = prng.random() < FAIL_RATE
                else:
                    fails = prng.random() < (REFAIL_RATE if board_failed[b] else 0.02)
                board_failed[b] = fails
                if fails:
                    k = int(prng.integers(1, 4))
                    fail_tests = set(
                        pareto_names[int(i)]
                        for i in prng.choice(len(pareto_names), size=k, replace=False)
                    )
                else:
                    fail_tests = set()
                mega = p == 0 and b == 0 and run == 0 and sf >= 0.0005
                sub = subset * mega_factor if mega else subset
                conv_id = f"B{p:04d}-{b:02d}-{run:02d}"
                serial = f"DMC{p:05d}{b:02d}"
                t_us = _emit_attempt(
                    rows, conv_id, serial, f"PNL{p:05d}", b, tool, t_us, sub,
                    fail_tests, not fails, prng, defs, limit_change_names, mid_us,
                )
                any_fail |= fails
            if any_fail and run < 3 and prng.random() < RETEST_RATE:
                run += 1
                t_us += int(prng.integers(300_000_000, 1_800_000_000))  # 5-30 min
                continue
            break

    n = len(rows.text)
    tbl = pa.table(
        {
            "conv_id": pa.array(rows.conv_id, pa.string()),
            "turn_idx": pa.array(rows.turn_idx, pa.int32()),
            "role": pa.array(rows.role, pa.string()),
            "text": pa.array(rows.text, pa.string()),
            "tool": pa.array(rows.tool, pa.string()),
            "ts": pa.array(rows.ts, pa.timestamp("us")),
        }
    )
    # Exact-duplicate injection (exercises dedup D1, reference main.rs:293-296).
    drng = np.random.default_rng([seed, 999_983])
    k = int(DUP_RATE * n)
    if k:
        idx = np.sort(drng.choice(n, size=k, replace=False))
        tbl = pa.concat_tables([tbl, tbl.take(pa.array(idx))]).combine_chunks()
    return tbl


def tool_meta_table(seed: int = DEFAULT_SEED) -> pa.Table:
    """Broadcast lookup side (ST2/J1; ICT_config Product analog, main.rs:364).

    Covers every transcript tool except MISSING_META_TOOL (enrich must emit
    nulls for it, not fail) plus one tool absent from transcripts.
    """
    tools, stations, products, lines = [], [], [], []
    for i in list(range(N_TOOLS)) + [99]:
        t = f"ict-{i:02d}"
        if t == MISSING_META_TOOL:
            continue
        tools.append(t)
        stations.append(f"ICT-LINE{i % 3 + 1}-{i:02d}")
        products.append(f"PROD-{'ABC'[i % 3]}")
        lines.append(f"L{i % 3 + 1}")
    return pa.table(
        {
            "tool": pa.array(tools, pa.string()),
            "station": pa.array(stations, pa.string()),
            "product": pa.array(products, pa.string()),
            "line": pa.array(lines, pa.string()),
        }
    )


def fixture_dir(sf: float, seed: int = DEFAULT_SEED, root: str = DEFAULT_ROOT) -> str:
    return os.path.join(root, f"sf{sf:g}_seed{seed}_v{FIXTURE_VERSION}")


def _write_fixture_dir(d: str, tbl: pa.Table, sf: float, seed: int,
                       extra_meta: dict | None = None) -> str:
    """Shard + write one fixture directory (transcripts/ + tool_meta +
    marker-last).  Sharded multi-file layout: conversation-disjoint shards
    split on panel boundaries — the natural transcript layout (one logfile
    per shard set, run_resumable's dedup contract) and enough input files
    that read_parquet feeds every core at 8 and 32 CPUs alike."""
    os.makedirs(d, exist_ok=True)
    shard_dir = os.path.join(d, "transcripts")
    os.makedirs(shard_dir, exist_ok=True)
    n_shards = max(8, min(64, int(round(320 * sf))))
    import pyarrow.compute as pc

    # conv_id prefix B{panel:04d} → panel number; shard = panel % n_shards
    panel = pc.cast(pc.utf8_slice_codeunits(tbl["conv_id"], 1, 5), pa.int64())
    shard = pc.cast(pc.subtract(panel, pc.multiply(
        pc.divide(panel, n_shards), n_shards)), pa.int32())
    for i in range(n_shards):
        part = tbl.filter(pc.equal(shard, i))
        pq.write_table(part, os.path.join(shard_dir, f"shard_{i:04d}.parquet"),
                       row_group_size=32_768)
    pq.write_table(tool_meta_table(seed), os.path.join(d, "tool_meta.parquet"))
    marker = os.path.join(d, "_DONE.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"sf": sf, "seed": seed, "rows": tbl.num_rows,
                   "version": FIXTURE_VERSION, **(extra_meta or {})}, f)
    os.replace(tmp, marker)
    return d


def ensure_fixture(sf: float, seed: int = DEFAULT_SEED, root: str = DEFAULT_ROOT) -> str:
    """Idempotently materialize transcripts/ shards + tool_meta.parquet.

    Returns the directory.  Safe to call from multiple entry points; a marker
    file written last makes partially-written dirs regenerate.
    """
    d = fixture_dir(sf, seed, root)
    if os.path.exists(os.path.join(d, "_DONE.json")):
        return d
    return _write_fixture_dir(d, generate_transcripts_table(sf, seed),
                              sf, seed)


def ensure_skew_fixture(sf: float, frac: float = 0.10,
                        seed: int = DEFAULT_SEED,
                        root: str = DEFAULT_ROOT) -> str:
    """Adversarially skewed fixture variant: ONE conversation holds
    ~``frac`` of all turns (the north-rule skew claim made measurable —
    a real transcript corpus has mega-conversations, and per-key
    partitioned stages must not serialize on them).

    The mega conversation's size scales linearly with ``mega_factor``
    (it repeats the test subset), so the needed factor is solved from
    the BASE fixture's mega row count: one cheap shard-0 read, no second
    full generation.  Cached like the base fixture; marker-last."""
    d = os.path.join(root, f"sf{sf:g}_seed{seed}_v{FIXTURE_VERSION}"
                           f"_skew{frac:g}")
    if os.path.exists(os.path.join(d, "_DONE.json")):
        return d
    import pyarrow.compute as pc

    base = ensure_fixture(sf, seed, root)
    total = json.load(open(os.path.join(base, "_DONE.json")))["rows"]
    s0 = pq.read_table(os.path.join(base, "transcripts",
                                    "shard_0000.parquet"),
                       columns=["conv_id"])
    m0 = pc.sum(pc.equal(s0["conv_id"], "B0000-00-00").cast(
        pa.int64())).as_py() or 0
    if not m0:
        raise RuntimeError("base fixture has no mega conversation "
                           "(sf too small for the skew variant)")
    per_factor = m0 / MEGA_FACTOR
    target = frac / (1.0 - frac) * (total - m0)
    factor = max(1, int(round(target / per_factor)))
    tbl = generate_transcripts_table(sf, seed, mega_factor=factor)
    return _write_fixture_dir(d, tbl, sf, seed,
                              {"skew_frac": frac, "mega_factor": factor})


def sf_from_dir(sf_dir: str, default: float = 0.01) -> float:
    """Map a driver sf dir like /root/testdata/sf0.01 to the fixture scale."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return default


# ---------------------------------------------------------------------------
# Scalable synthetic `documents` fixture (doc-family scaling benchmark)
# ---------------------------------------------------------------------------
# The driver testdata caps the documents table at sf0.1 (5,000 docs /
# ~1.5 MB of text) — too small for scaling evidence on the LLM-curation
# operator family (fixed executor-launch cost dominates).  This generator
# produces an arbitrarily large table with the SAME SCHEMA as
# /root/testdata/sf*/documents.parquet (doc_id, text, lang, source,
# n_chars) and, crucially, duplicate structure whose PAIR COUNT SCALES
# LINEARLY with n_docs: near/exact dups are planted as predecessor copies
# (cluster size 2), never replicas of one template (which would grow the
# pair output quadratically and turn a throughput benchmark into the
# adversarial-dup-density test).  Used by `bench.py --doc-scaling` only —
# correctness queries keep reading the driver testdata.

DOC_FIXTURE_VERSION = 2  # doc-fixture-local: bumping FIXTURE_VERSION would
#                          needlessly regenerate the big transcript fixtures
DOC_LANGS = ["en", "de", "es", "fr", "zh"]
DOC_NEAR_DUP_EVERY = 17   # doc i (i%17==1) = near-dup of doc i-1 (~6%)
DOC_EXACT_DUP_EVERY = 29  # doc i (i%29==2) = exact copy of doc i-2 (~3.4%)
DOC_NEAR_DUP_MUTATE = 0.04  # fraction of words replaced in the near-dup

_DOC_COMMON = (
    "batch part spark line column order small sort fast value scan slow "
    "hash group agg filter query big key window join merge shard block "
    "stream stage task actor store spill pipe read write plan probe build "
    "index token text model train corpus dedup near exact pair bucket "
    "band shingle signature sample quality language score clean route "
    "parse record field status limit board panel test retest yield hour "
    "shift daily report export lookup product station tool meta config "
    "count distinct rank first final attempt chain series word char doc"
).split()
# v2: ~4k-word vocab, zipf-like mixture (30% of draws from the 104 common
# words, 70% uniform over the tail).  The v1 150-word vocab gave unrelated
# docs baseline char-shingle Jaccard ~0.3-0.5 — right under the 16-band/
# 4-row LSH curve's knee — producing 1.59M candidate pairs for 9.7k true
# pairs at 100k docs (163× verify blow-up, candidates growing
# superlinearly).  Real crawl corpora have near-zero baseline J between
# unrelated docs; the wide vocab restores that, so --doc-scaling measures
# signature+shuffle+true-pair-verify throughput, not an adversarial FP
# regime (the >5M-pair candidate path keeps its own forced pytest).
_DOC_VOCAB = _DOC_COMMON + [f"w{i}" for i in range(4000)]
_DOC_COMMON_FRAC = 0.3


def generate_documents_table(n_docs: int, seed: int = DEFAULT_SEED) -> pa.Table:
    """Deterministic documents table: same (n_docs, seed) → identical
    bytes.  Word-salad text like the driver fixture's (40-120 words/doc,
    ~250-750 chars), 5-lang / 20-source categorical columns, planted
    near-dups (predecessor copy with ~4% of words replaced — char-shingle
    Jaccard ≥ ~0.8, well above the minhash queries' 0.6 threshold) and
    exact dups (byte-identical predecessor copies)."""
    rng = np.random.default_rng([seed, 777])
    vocab = np.array(_DOC_VOCAB)
    lens = rng.integers(40, 121, n_docs)
    total = int(lens.sum())
    # zipf-like mixture: 30% of word draws from the common head, the rest
    # uniform over the full vocab (see the _DOC_VOCAB comment)
    flat = rng.integers(0, len(vocab), total)
    head = rng.random(total) < _DOC_COMMON_FRAC
    flat[head] = rng.integers(0, len(_DOC_COMMON), int(head.sum()))
    offs = np.concatenate([[0], np.cumsum(lens)])
    idx = [flat[offs[i]:offs[i + 1]] for i in range(n_docs)]
    for i in range(n_docs):
        if i >= 1 and i % DOC_NEAR_DUP_EVERY == 1:
            w = idx[i - 1].copy()
            k = max(1, int(round(len(w) * DOC_NEAR_DUP_MUTATE)))
            pos = rng.choice(len(w), size=k, replace=False)
            w[pos] = rng.integers(0, len(vocab), k)
            idx[i] = w
        elif i >= 2 and i % DOC_EXACT_DUP_EVERY == 2:
            idx[i] = idx[i - 2]
    texts = [" ".join(vocab[w]) for w in idx]
    langs = rng.choice(np.array(DOC_LANGS), size=n_docs,
                       p=[0.4, 0.15, 0.15, 0.15, 0.15])
    src = rng.integers(0, 20, n_docs)
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{s}" for s in src], pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })


def ensure_doc_fixture(n_docs: int, seed: int = DEFAULT_SEED,
                       root: str = DEFAULT_ROOT) -> str:
    """Idempotently materialize ``documents.parquet`` for ``n_docs`` docs;
    returns the directory (readable via ``sources.read_table(d,
    "documents")``).  Small row groups (2,048 rows) so Ray's parquet
    reader can split the single file across every core; marker-last like
    the transcript fixtures."""
    d = os.path.join(root, f"docs_n{n_docs}_seed{seed}"
                           f"_v{FIXTURE_VERSION}.{DOC_FIXTURE_VERSION}")
    if os.path.exists(os.path.join(d, "_DONE.json")):
        return d
    os.makedirs(d, exist_ok=True)
    tbl = generate_documents_table(n_docs, seed)
    pq.write_table(tbl, os.path.join(d, "documents.parquet"),
                   row_group_size=2_048)
    marker = os.path.join(d, "_DONE.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_docs": n_docs, "seed": seed,
                   "version": FIXTURE_VERSION}, f)
    os.replace(tmp, marker)
    return d


EMB_DIM = 64
EMB_CLUSTERS = 10
EMB_FIXTURE_VERSION = 4  # v3: planted near-dups; v4: sharded embeddings/ dir (serial-read trap)
EMB_NEAR_DUP_EVERY = 17  # vec i (i%17==1) = near-copy of vec i-1


def generate_embeddings_table(n_vecs: int, seed: int = DEFAULT_SEED) -> pa.Table:
    """Deterministic embeddings table with the driver-testdata schema
    (vec_id int64, embedding list<float32> 64-d, label int32): 10 unit
    gaussian cluster centers, sigma 0.25 — separable clusters like the
    testdata's, arbitrary size for the embedding-family scaling
    benchmark (testdata caps embeddings at 2k rows).  v2 plants
    near-duplicate vectors the way the doc fixture plants near-dup
    texts: every 17th vector is its predecessor plus sigma-0.01 noise
    (cosine ≈ 0.999 ≫ any near-dup threshold), predecessor copies only
    — so the true pair count scales LINEARLY with n."""
    rng = np.random.default_rng([seed, 888])
    centers = rng.standard_normal((EMB_CLUSTERS, EMB_DIM),
                                  dtype=np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, EMB_CLUSTERS, n_vecs).astype(np.int32)
    vecs = centers[labels] + 0.25 * rng.standard_normal(
        (n_vecs, EMB_DIM), dtype=np.float32)
    dup = np.zeros(n_vecs, dtype=bool)
    dup[1::EMB_NEAR_DUP_EVERY] = True
    src = np.flatnonzero(dup) - 1
    vecs[dup] = vecs[src] + 0.01 * rng.standard_normal(
        (len(src), EMB_DIM), dtype=np.float32)
    labels[dup] = labels[src]
    offs = np.arange(0, (n_vecs + 1) * EMB_DIM, EMB_DIM, dtype=np.int32)
    emb = pa.ListArray.from_arrays(pa.array(offs),
                                   pa.array(vecs.ravel(), pa.float32()))
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
        "embedding": emb,
        "label": pa.array(labels, pa.int32()),
    })


def ensure_emb_fixture(n_vecs: int, seed: int = DEFAULT_SEED,
                       root: str = DEFAULT_ROOT) -> str:
    """Idempotently materialize a SHARDED ``embeddings/`` directory for
    ``n_vecs`` vectors — ~131k-row part files (≈67 MB at 64-d float64),
    because Ray reads a single parquet file as ONE serial task regardless
    of row groups (the events/media serial-read trap; ``read_table``
    resolves the directory layout).  Marker-last."""
    d = os.path.join(root, f"embs_n{n_vecs}_seed{seed}"
                           f"_v{FIXTURE_VERSION}.{EMB_FIXTURE_VERSION}")
    if os.path.exists(os.path.join(d, "_DONE.json")):
        return d
    os.makedirs(os.path.join(d, "embeddings"), exist_ok=True)
    tbl = generate_embeddings_table(n_vecs, seed)
    shard_rows = 131_072
    for i, off in enumerate(range(0, max(n_vecs, 1), shard_rows)):
        pq.write_table(tbl.slice(off, shard_rows),
                       os.path.join(d, "embeddings",
                                    f"part-{i:05d}.parquet"),
                       row_group_size=16_384)
    marker = os.path.join(d, "_DONE.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_vecs": n_vecs, "seed": seed,
                   "version": FIXTURE_VERSION}, f)
    os.replace(tmp, marker)
    return d


EVT_FIXTURE_VERSION = 2  # v2: sharded events/ dir (single-file serial-read trap)
EVT_TYPES = ["view", "click", "purchase", "signup", "error"]


def generate_events_table(n_events: int, seed: int = DEFAULT_SEED) -> pa.Table:
    """Deterministic events table with the driver-testdata schema
    (event_id int64, ts timestamp[us] GLOBALLY SORTED, user_id int64,
    event_type string uniform-5, value double, props json-string) for
    probing the temporal/sessionization family beyond the testdata's
    100k-row cap.  Users scale with n (≈ n/67 like the testdata's
    100k/1500), so events-per-user stays realistic instead of
    degenerating into per-user mega-streams."""
    rng = np.random.default_rng([seed, 999])
    n_users = max(10, n_events // 67)
    base = np.int64(1_704_067_200_000_000)          # 2024-01-01 epoch µs
    span = np.int64(30 * 86_400 * 1_000_000)
    ts = base + np.sort(rng.integers(0, span, n_events, dtype=np.int64))
    et = rng.integers(0, len(EVT_TYPES), n_events)
    k = rng.integers(0, 99, n_events)
    props = np.char.add(np.char.add('{"k": ',
                                    k.astype("U3")), "}")
    return pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_events,
                                         dtype=np.int64)),
        "event_type": pa.array(np.array(EVT_TYPES, dtype=object)[et],
                               pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 560, n_events), 2)),
        "props": pa.array(props.astype(object), pa.string()),
    })


def ensure_events_fixture(n_events: int, seed: int = DEFAULT_SEED,
                          root: str = DEFAULT_ROOT) -> str:
    """Idempotently materialize a SHARDED ``events/`` directory for
    ``n_events`` rows — ~2M-row part files (≈48 MB), because Ray reads a
    single parquet file as ONE serial task regardless of row groups (a
    measured 3.8-s floor on the 1.2 GB 50M-row table that capped 2→8
    scaling at ~0.5; ``read_table`` resolves the directory layout).
    Slicing the globally-ts-sorted table preserves order — each shard
    covers a contiguous time range.  Own version counter (the emb v4.2
    collision lesson)."""
    d = os.path.join(root, f"evts_n{n_events}_seed{seed}"
                           f"_v{FIXTURE_VERSION}.{EVT_FIXTURE_VERSION}")
    if os.path.exists(os.path.join(d, "_DONE.json")):
        return d
    os.makedirs(os.path.join(d, "events"), exist_ok=True)
    tbl = generate_events_table(n_events, seed)
    shard_rows = 2_000_000
    for i, off in enumerate(range(0, max(n_events, 1), shard_rows)):
        pq.write_table(tbl.slice(off, shard_rows),
                       os.path.join(d, "events", f"part-{i:05d}.parquet"),
                       row_group_size=65_536)
    marker = os.path.join(d, "_DONE.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_events": n_events, "seed": seed,
                   "version": FIXTURE_VERSION}, f)
    os.replace(tmp, marker)
    return d


TPC_FIXTURE_VERSION = 1


def generate_orders_lineitem(n_orders: int, seed: int = DEFAULT_SEED):
    """Deterministic (orders, lineitem) pair with the driver-testdata
    schemas/value domains (~4 lines per order like the testdata's
    600k/150k) for probing the big-big join family beyond the sf0.1
    cap.  Returns (orders_table, lineitem_table)."""
    rng = np.random.default_rng([seed, 1111])
    base = np.int64(788_918_400_000_000)            # 1995-01-01 epoch µs
    span = np.int64(7 * 365 * 86_400 * 1_000_000)
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                      "4-NOT SPECIFIED", "5-LOW"], dtype=object)
    stats = np.array(["O", "F", "P"], dtype=object)
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, max(1, n_orders // 10),
                                           n_orders, dtype=np.int64)),
        "o_orderstatus": pa.array(stats[rng.integers(0, 3, n_orders)],
                                  pa.string()),
        "o_totalprice": pa.array(np.round(
            rng.uniform(1_000, 500_000, n_orders), 2)),
        "o_orderdate": pa.array(base + rng.integers(0, span, n_orders,
                                                    dtype=np.int64),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, n_orders)],
                                    pa.string()),
    })
    nlines = rng.integers(1, 8, n_orders)           # mean ~4
    n_li = int(nlines.sum())
    lkey = np.repeat(np.arange(n_orders, dtype=np.int64), nlines)
    rflag = np.array(["N", "A", "R"], dtype=object)
    lstat = np.array(["O", "F"], dtype=object)
    lineitem = pa.table({
        "l_orderkey": pa.array(lkey),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(
            rng.uniform(900, 100_000, n_li), 2)),
        "l_discount": pa.array(np.round(
            rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(rflag[rng.integers(0, 3, n_li)],
                                 pa.string()),
        "l_linestatus": pa.array(lstat[rng.integers(0, 2, n_li)],
                                 pa.string()),
        "l_shipdate": pa.array(base + rng.integers(0, span, n_li,
                                                   dtype=np.int64),
                               pa.timestamp("us")),
    })
    return orders, lineitem


def ensure_tpc_fixture(n_orders: int, seed: int = DEFAULT_SEED,
                       root: str = DEFAULT_ROOT) -> str:
    """Idempotently materialize orders.parquet + lineitem.parquet for
    ``n_orders`` orders (own version counter)."""
    d = os.path.join(root, f"tpc_n{n_orders}_seed{seed}"
                           f"_v{FIXTURE_VERSION}.{TPC_FIXTURE_VERSION}")
    if os.path.exists(os.path.join(d, "_DONE.json")):
        return d
    os.makedirs(d, exist_ok=True)
    orders, lineitem = generate_orders_lineitem(n_orders, seed)
    pq.write_table(orders, os.path.join(d, "orders.parquet"),
                   row_group_size=65_536)
    pq.write_table(lineitem, os.path.join(d, "lineitem.parquet"),
                   row_group_size=65_536)
    marker = os.path.join(d, "_DONE.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_orders": n_orders, "seed": seed,
                   "version": FIXTURE_VERSION}, f)
    os.replace(tmp, marker)
    return d


MEDIA_FIXTURE_VERSION = 3  # v2: sharded directory (v1 single file read
#                            as ONE serial task); v3: 1024-row shards —
#                            24 ~64 MB files quantized 8 CPUs into exactly
#                            3 task waves (tail imbalance ~0.5 s of a 3.2 s
#                            wall); ~32 MB shards halve the wave tail
MEDIA_KINDS = ["image", "audio", "video"]
# generation-shape constant: rows are generated (and seeded) in fixed
# 1024-row chunks, one shard FILE per chunk (~32 MB of payload)
MEDIA_CHUNK = 1024


def generate_media_chunk(n_media: int, chunk_idx: int,
                         seed: int = DEFAULT_SEED) -> pa.Table:
    """Rows [chunk_idx*MEDIA_CHUNK, min((chunk_idx+1)*MEDIA_CHUNK, n)) of
    the deterministic payload-scale media corpus (schema =
    ``multimodal.MEDIA_SCHEMA``): kind cycles image/audio/video by row id;
    image rows carry REAL binary PPM payloads (32-223 px sides, ~49 KB
    mean) so the ``decode="real"`` netpbm path runs end-to-end at scale;
    audio/video payloads are opaque random bytes sized like compressed
    clips (2-16 KB / 8-64 KB).  Per-chunk rng keyed [seed, 31337, chunk]
    — same (n, seed) ⇒ identical bytes regardless of how many chunks a
    writer emits per file."""
    from ict_log_parser_ray.functions.multimodal import (MEDIA_SCHEMA,
                                                         NETPBM_MIMES,
                                                         encode_netpbm)

    lo = chunk_idx * MEDIA_CHUNK
    hi = min(lo + MEDIA_CHUNK, n_media)
    rng = np.random.default_rng([seed, 31_337, chunk_idx])
    rows = {f.name: [] for f in MEDIA_SCHEMA}
    for i in range(lo, hi):
        kind = MEDIA_KINDS[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        if kind == "image":
            w = int(rng.integers(32, 224))
            h = int(rng.integers(32, 224))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows["payload"].append(encode_netpbm(img))
            rows["mime"].append(NETPBM_MIMES[0])
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(None)
        elif kind == "audio":
            nb = int(rng.integers(2_000, 16_000))
            rows["payload"].append(
                rng.integers(0, 256, size=nb, dtype=np.uint8).tobytes())
            rows["mime"].append("audio/wav")
            rows["width"].append(None)
            rows["height"].append(None)
            rows["duration_ms"].append(int(rng.integers(1_000, 60_000)))
        else:
            nb = int(rng.integers(8_000, 64_000))
            rows["payload"].append(
                rng.integers(0, 256, size=nb, dtype=np.uint8).tobytes())
            rows["mime"].append("video/mp4")
            rows["width"].append(int(rng.integers(64, 1024)))
            rows["height"].append(int(rng.integers(64, 1024)))
            rows["duration_ms"].append(int(rng.integers(2_000, 30_000)))
    return pa.table(rows, schema=MEDIA_SCHEMA)


def ensure_media_fixture(n_media: int, seed: int = DEFAULT_SEED,
                         root: str = DEFAULT_ROOT) -> str:
    """Idempotently materialize a SHARDED ``media/`` directory for
    ``n_media`` rows (~31 KB mean payload ⇒ ~1.5 GB at 48k rows): one
    ~32 MB file per MEDIA_CHUNK-row (1024) generation chunk, because Ray's parquet
    reader makes read tasks per FILE — the v1 single-file layout read
    1.5 GB as ONE serial task (+SplitBlocks), a measured 1.9-s serial
    floor that capped 2→8 scaling at 0.42.  Small row groups (256 rows)
    keep batches payload-bounded; binary payloads are stored
    uncompressed (random bytes don't compress — snappy would just burn
    encode CPU).  Own version counter (the emb v4.2 collision lesson)."""
    d = os.path.join(root, f"media_n{n_media}_seed{seed}"
                           f"_v{FIXTURE_VERSION}.{MEDIA_FIXTURE_VERSION}")
    if os.path.exists(os.path.join(d, "_DONE.json")):
        return d
    os.makedirs(os.path.join(d, "media"), exist_ok=True)
    nchunks = -(-n_media // MEDIA_CHUNK)
    for c in range(nchunks):
        tbl = generate_media_chunk(n_media, c, seed)
        pq.write_table(tbl, os.path.join(d, "media", f"part-{c:05d}.parquet"),
                       row_group_size=256, compression="none")
    marker = os.path.join(d, "_DONE.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_media": n_media, "seed": seed,
                   "version": FIXTURE_VERSION}, f)
    os.replace(tmp, marker)
    return d
