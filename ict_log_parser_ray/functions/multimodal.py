"""Multimodal column stages (task brief): image/audio/video as opaque
``binary`` columns with typed metadata.

Decode kernels: ``decode="fake"`` runs a deterministic fake decoder so the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is testable without media libraries; ``decode="real"`` REALLY decodes
binary netpbm images (PPM ``P6`` / PGM ``P5`` — a self-describing format a
numpy ``frombuffer`` can parse, no external lib) and raises
``NotImplementedError`` for formats that need PIL/libav (PNG/JPEG/MP4…) at
the exact point those would be called.  The real path is golden-tested:
decode∘encode round-trips, box-average resize, per-channel moment features.

Scale notes baked in: binary payloads make rows heavy → small ``batch_size``
(default 64) and an actor pool (decoder init is expensive in the real world);
output keeps payloads OUT of the feature table (features only), so downstream
aggregates never reship the blobs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

NETPBM_MIMES = ("image/x-portable-pixmap", "image/x-portable-graymap")


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary netpbm (P6 = RGB, P5 = gray) → (H, W, C) uint8 array.

    Real parsing: magic, whitespace/``#``-comment tokens, dims, maxval,
    single whitespace, raw raster via ``np.frombuffer`` — the whole
    format, not a subset (maxval ≤ 255 only; 16-bit rasters raise)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise NotImplementedError(
            f"real decode supports binary netpbm (P5/P6) only, got "
            f"{payload[:2]!r} — PNG/JPEG need PIL, absent here")
    chans = 3 if payload[:2] == b"P6" else 1
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":        # comment to end of line
            nl = payload.index(b"\n", pos)
            pos = nl + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        tokens.append(int(payload[pos:end]))
        pos = end
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm rasters not supported")
    pos += 1                                      # single whitespace
    n = w * h * chans
    raster = np.frombuffer(payload, np.uint8, count=n, offset=pos)
    return raster.reshape(h, w, chans)


def encode_netpbm(img: np.ndarray) -> bytes:
    """(H, W, C) uint8 → binary netpbm bytes (P6 for C=3, P5 for C=1)."""
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + \
        np.ascontiguousarray(img, np.uint8).tobytes()


def resize_box(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Box-average downscale to exactly (th, tw) — pure numpy: pixel
    (i, j) averages the source box [i*h/th, (i+1)*h/th) × [j*w/tw, …).
    Handles non-integer ratios via edge-index arithmetic (no Python
    per-pixel loop; two reduceat passes)."""
    h, w, c = img.shape
    ye = (np.arange(th + 1) * h) // th
    xe = (np.arange(tw + 1) * w) // tw
    acc = np.add.reduceat(img.astype(np.float64), ye[:-1], axis=0)
    acc = np.add.reduceat(acc, xe[:-1], axis=1)
    area = (np.diff(ye)[:, None] * np.diff(xe)[None, :])[:, :, None]
    return np.clip(np.rint(acc / area), 0, 255).astype(np.uint8)

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),         # image | audio | video
    ("payload", pa.binary()),      # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),         # typed metadata (nullable for audio)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int = 64, seed: int = 42,
                      real_images: bool = False) -> pa.Table:
    """Deterministic fake media table for tests/benchmarks.

    ``real_images=True``: image rows carry REAL binary PPM payloads
    (random pixels, header/metadata consistent) so the ``decode="real"``
    netpbm path can be driven end-to-end; audio/video stay opaque."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        # NOTE: the default path's rng DRAW ORDER is frozen — the
        # media_digest oracle reads a persisted copy of this table by
        # absolute path, so any reordering breaks the value match.  The
        # real_images branch draws from an independent generator.
        if kind == "image" and real_images:
            irng = np.random.default_rng([seed, 7_654_321, i])
            w, h = int(irng.integers(8, 96)), int(irng.integers(8, 96))
            img = irng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload, mime = encode_netpbm(img), NETPBM_MIMES[0]
            rows["media_id"].append(i)
            rows["kind"].append(kind)
            rows["payload"].append(payload)
            rows["mime"].append(mime)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(None)
            continue
        payload = rng.integers(0, 256, size=int(rng.integers(256, 2048)),
                               dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(32, 1024)) if kind != "audio" else None)
        rows["height"].append(int(rng.integers(32, 1024)) if kind != "audio" else None)
        rows["duration_ms"].append(int(rng.integers(1000, 60000)) if kind != "image" else None)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaFeatureExtractor:
    """Actor-pool decode/feature stage.

    __init__ loads the decoder ONCE per actor; __call__ maps a
    small batch of payloads → fixed-width feature vectors + metadata, and
    DROPS the payload column from the output.
    """

    def __init__(self, decode: str = "fake", feature_dim: int = 8):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode
        self.feature_dim = feature_dim

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic digest → fixed-width pseudo-features
        d = hashlib.sha256(payload).digest()
        raw = np.frombuffer(d[: self.feature_dim * 4], dtype=np.uint32)
        return (raw % 10_000).astype(np.float32) / 10_000.0

    def _real_features(self, payload: bytes, mime: str) -> np.ndarray:
        """REAL pixel features for netpbm images (pure-numpy decode):
        [mean, std, first-channel mean, last-channel mean, w/4096,
        h/4096, aspect, mean |∂x|] — each in [0, ~1].  Non-netpbm mimes
        raise at the exact point PIL / torchaudio / pyav would run."""
        if mime not in NETPBM_MIMES:
            raise NotImplementedError(
                f"real feature extraction for {mime} requires media libs "
                "not present in this environment (netpbm images are "
                "decoded for real); use decode='fake'")
        img = decode_netpbm(payload)
        f = img.astype(np.float64)
        h, w, _ = img.shape
        dx = np.abs(np.diff(f, axis=1)).mean() / 255.0 if w > 1 else 0.0
        feats = np.array([f.mean() / 255.0, f.std() / 255.0,
                          f[:, :, 0].mean() / 255.0,
                          f[:, :, -1].mean() / 255.0,
                          w / 4096.0, h / 4096.0,
                          min(w / h, 8.0), dx], np.float32)
        out = np.zeros(self.feature_dim, np.float32)
        out[: min(len(feats), self.feature_dim)] = \
            feats[: self.feature_dim]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.decode == "real":
            mimes = batch["mime"].to_pylist()
            feats = np.stack([self._real_features(p, m)
                              for p, m in zip(payloads, mimes)])
        else:
            feats = np.stack([self._fake_features(p) for p in payloads])
        out = batch.drop_columns(["payload"])
        out = out.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float32())))
        out = out.append_column(
            "payload_bytes",
            pa.array([len(p) for p in payloads], pa.int64()))
        return out


def extract_media_features(media_ds, concurrency=(1, 4), batch_size: int = 64,
                           decode: str = "fake"):
    """Actor-pool map_batches with payload-appropriate small batches."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def persist_synth_media(path: str, n: int = 48, seed: int = 42,
                        real_images: bool = False) -> str:
    """Write the deterministic synthetic media table once (atomic rename) so
    a SQL oracle can read the identical payload bytes by absolute path."""
    import os

    import pyarrow.parquet as pq

    if not os.path.isfile(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(synth_media_table(n=n, seed=seed,
                                         real_images=real_images), tmp)
        os.replace(tmp, path)
    return path


def media_digest(media_ds, batch_size: int = 64):
    """SQL-checkable digest slice of the media stage: per payload, the
    first little-endian uint32 of sha256(upper-hex(payload)) mod 10000 —
    exactly what DuckDB's ``sha256(hex(payload))`` can re-derive (its
    ``sha256`` only accepts VARCHAR, hence digest-of-hex rather than
    digest-of-bytes).  Integer output → exact value-hash match; per-row
    hashing is inherent to binary payloads (C-side sha256, not a Python
    hot loop over scalars)."""

    def digest(batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        f0 = np.empty(len(payloads), np.int64)
        nbytes = np.empty(len(payloads), np.int64)
        for i, p in enumerate(payloads):
            d = hashlib.sha256(p.hex().upper().encode()).digest()
            f0[i] = int.from_bytes(d[:4], "little") % 10_000
            nbytes[i] = len(p)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload_bytes": pa.array(nbytes, pa.int64()),
            "f0": pa.array(f0, pa.int64()),
        })

    return media_ds.map_batches(digest, batch_format="pyarrow",
                                batch_size=batch_size)


class MediaResizer:
    """Actor-pool image/video RESIZE stage (task-brief op #3).

    The OUTPUT GEOMETRY is computed for real from the typed metadata (cap
    the longer side at ``max_side``, preserve aspect ratio, never
    upscale).  ``decode="fake"`` emits a deterministic payload (sha256 of
    the input payload + target geometry, length scaled by the area ratio
    — so payload size responds to the resize like a real re-encode
    would).  ``decode="real"`` REALLY decodes netpbm images (pure-numpy
    P5/P6 parse), box-average resizes, and re-encodes — golden-tested;
    non-netpbm formats raise at the exact point PIL/pyav would run.
    Audio rows pass through untouched either way.
    """

    def __init__(self, max_side: int = 256, decode: str = "fake"):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode
        self.max_side = max_side

    @staticmethod
    def _target(w: int, h: int, max_side: int) -> tuple[int, int]:
        long_side = max(w, h)
        if long_side <= max_side:
            return w, h
        # floor-scale, keep ≥1 — the geometry math is the REAL part
        if w >= h:
            return max_side, max(1, (h * max_side) // w)
        return max(1, (w * max_side) // h), max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kinds = batch["kind"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        out_w, out_h, out_p = [], [], []
        for kind, w, h, p, mime in zip(kinds, ws, hs, payloads, mimes):
            if kind == "audio" or w is None or h is None:
                out_w.append(w)
                out_h.append(h)
                out_p.append(p)
                continue
            if self.decode == "real":
                if mime not in NETPBM_MIMES:
                    raise NotImplementedError(
                        f"real resize for {mime} requires image/video "
                        "libs not present here (netpbm images resize for "
                        "real); use decode='fake'")
                img = decode_netpbm(p)
                ih, iw = img.shape[:2]       # trust pixels, not metadata
                tw, th = self._target(iw, ih, self.max_side)
                if (tw, th) == (iw, ih):
                    out_w.append(iw)
                    out_h.append(ih)
                    out_p.append(p)
                    continue
                out_p.append(encode_netpbm(resize_box(img, tw, th)))
                out_w.append(tw)
                out_h.append(th)
                continue
            tw, th = self._target(int(w), int(h), self.max_side)
            if (tw, th) == (w, h):
                out_w.append(w)
                out_h.append(h)
                out_p.append(p)
                continue
            seed = hashlib.sha256(
                p + f"|resize|{tw}x{th}".encode()).digest()
            # length ∝ area ratio, floored — a real re-encode shrinks
            # roughly with pixel count
            n = max(16, int(len(p) * (tw * th) / (int(w) * int(h))))
            reps = -(-n // len(seed))
            out_p.append((seed * reps)[:n])
            out_w.append(tw)
            out_h.append(th)
        out = batch.drop_columns(["payload", "width", "height"])
        out = out.append_column("payload", pa.array(out_p, pa.binary()))
        out = out.append_column("width", pa.array(
            [None if v is None else int(v) for v in out_w], pa.int32()))
        out = out.append_column("height", pa.array(
            [None if v is None else int(v) for v in out_h], pa.int32()))
        return out.select([f.name for f in MEDIA_SCHEMA])


def resize_media(media_ds, max_side: int = 256, concurrency=(1, 4),
                 batch_size: int = 64, decode: str = "fake"):
    """Actor-pool resize over binary media rows (small batches — payload
    rows are heavy; geometry math always real, pixels real for netpbm
    under decode="real", deterministic fake otherwise)."""
    return media_ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"max_side": max_side, "decode": decode},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


FRAME_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("frame_idx", pa.int64()),
    ("ts_ms", pa.int64()),
    ("payload", pa.binary()),
])


def sample_frames(media_ds, every_ms: int = 1000, batch_size: int = 64,
                  decode: str = "fake"):
    """Video FRAME-SAMPLE stage (task-brief op #4): one frame row per
    ``every_ms`` of duration — a row-EXPANDING map (flat_map semantics
    via a batch fn returning more rows than it got), so each output block
    stays payload-bounded by the small input ``batch_size``.

    Frame timing/count math is real (frames at t = 0, every_ms, …,
    < duration_ms; non-video rows contribute nothing); the pixel decode
    is the deterministic fake (sha256(payload | ts) bytes) — ``"real"``
    raises where pyav would seek+decode."""
    if decode not in ("fake", "real"):
        raise ValueError(decode)
    if decode == "real":
        raise NotImplementedError(
            "real frame sampling requires video libs not present in this "
            "environment; use decode='fake'")

    def frames(batch: pa.Table) -> pa.Table:
        ids, idxs, tss, pays = [], [], [], []
        kinds = batch["kind"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        payloads = batch["payload"].to_pylist()
        mids = batch["media_id"].to_pylist()
        for mid, kind, dur, p in zip(mids, kinds, durs, payloads):
            if kind != "video" or not dur:
                continue
            for j, t in enumerate(range(0, int(dur), every_ms)):
                ids.append(mid)
                idxs.append(j)
                tss.append(t)
                pays.append(hashlib.sha256(
                    p + f"|frame|{t}".encode()).digest())
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(idxs, pa.int64()),
                         "ts_ms": pa.array(tss, pa.int64()),
                         "payload": pa.array(pays, pa.binary())})

    return media_ds.map_batches(frames, batch_format="pyarrow",
                                batch_size=batch_size)


MEDIA_STATS_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("n_rows", pa.int64()),
    ("n_frames", pa.int64()),
    ("in_bytes", pa.int64()),
    ("out_bytes", pa.int64()),
    ("feat0_sum", pa.float64()),
])


class MediaCorpusStatsStage:
    """One-pass per-KIND dispatch at payload scale — the media analog of
    the transcript flagship's record-type dispatch (M1): a single
    actor-pool ``map_batches`` stage reads each payload exactly once and
    routes it by kind, so a mixed 100-TB media corpus is processed in ONE
    streaming pass with O(batch) memory instead of one filtered re-read
    per kind:

    - ``image`` → REAL netpbm decode → box-average resize (cap longer
      side at ``max_side``) → REAL pixel-moment features — the tested
      ``MediaResizer``/``MediaFeatureExtractor`` kernels composed
      actor-side, resized payloads never leaving the task;
    - ``video`` → frame sampling at ``every_ms`` (timing math real) with
      the deterministic per-frame digest standing in for the decode —
      each frame hashes the FULL clip payload, so per-frame cost tracks
      payload size like a real seek+decode would;
    - ``audio`` → per-payload digest.

    Output is a tiny PARTIAL row per kind per batch (counts + byte sums
    + a feature checksum) — the canonical partial-combine shape: the
    driver finish sums ~3 rows per batch, payloads never reach a
    shuffle.  __init__ builds the decode kernels ONCE per actor.

    NULL payload cells (fetch failures / stripped rows in a real crawl)
    are DROPPED, not crashed on — a missing cell is a data condition; a
    malformed non-null payload still raises loudly at the decode (the
    SQL twin matches with ``WHERE payload IS NOT NULL``).
    """

    def __init__(self, max_side: int = 96, every_ms: int = 1000,
                 feature_dim: int = 8):
        self.every_ms = every_ms
        self.resizer = MediaResizer(max_side=max_side, decode="real")
        self.extractor = MediaFeatureExtractor(decode="real",
                                               feature_dim=feature_dim)
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = {f.name: [] for f in MEDIA_STATS_SCHEMA}

        def emit(kind, n_rows, n_frames, in_bytes, out_bytes, feat0):
            out["kind"].append(kind)
            out["n_rows"].append(int(n_rows))
            out["n_frames"].append(int(n_frames))
            out["in_bytes"].append(int(in_bytes))
            out["out_bytes"].append(int(out_bytes))
            out["feat0_sum"].append(float(feat0))

        # null payloads (common in real crawl corpora: fetch failures,
        # stripped rows) are dropped here, not crashed on — decode bugs
        # still raise loudly, but a missing CELL is a data condition
        batch = batch.filter(pc.is_valid(batch["payload"]))

        imgs = batch.filter(pc.equal(batch["kind"], "image"))
        if imgs.num_rows:
            in_b = pc.sum(pc.binary_length(imgs["payload"])).as_py()
            feats = self.extractor(self.resizer(imgs))
            f0 = feats["features"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False)[0::self.feature_dim]
            out_b = pc.sum(feats["payload_bytes"]).as_py()
            emit("image", imgs.num_rows, 0, in_b, out_b, f0.sum())

        vids = batch.filter(pc.equal(batch["kind"], "video"))
        if vids.num_rows:
            in_b = pc.sum(pc.binary_length(vids["payload"])).as_py()
            nf, f0 = 0, 0.0
            for p, dur in zip(vids["payload"].to_pylist(),
                              vids["duration_ms"].to_pylist()):
                if not dur:
                    continue
                for t in range(0, int(dur), self.every_ms):
                    d = hashlib.sha256(p + f"|frame|{t}".encode()).digest()
                    nf += 1
                    f0 += d[0] / 255.0
            emit("video", vids.num_rows, nf, in_b, 32 * nf, f0)

        auds = batch.filter(pc.equal(batch["kind"], "audio"))
        if auds.num_rows:
            in_b = pc.sum(pc.binary_length(auds["payload"])).as_py()
            f0 = 0.0
            for p in auds["payload"].to_pylist():
                f0 += hashlib.sha256(p).digest()[0] / 255.0
            emit("audio", auds.num_rows, 0, in_b, 32 * auds.num_rows, f0)

        # UNKNOWN kinds pass through counted under their own kind value
        # (n_rows + in_bytes only) — a stats op must never silently drop
        # rows; at 100 TB a new modality showing up in the corpus should
        # surface in the output, not vanish
        # NULL kind must route here too: pc.is_in yields null (falsy
        # under filter) for null inputs, so invert alone would DROP the
        # row — coalesce the membership mask's nulls to false first,
        # then count null kinds under the "<null>" sentinel (pc.equal
        # against None is an all-null mask, so nulls need is_null).
        known = pc.fill_null(pc.is_in(
            batch["kind"], value_set=pa.array(["image", "audio", "video"])),
            False)
        rest = batch.filter(pc.invert(known))
        if rest.num_rows:
            for kt in pc.unique(rest["kind"]).to_pylist():
                if kt is None:
                    sub = rest.filter(pc.is_null(rest["kind"]))
                    kt = "<null>"
                else:
                    sub = rest.filter(pc.equal(rest["kind"], kt))
                in_b = pc.sum(pc.binary_length(sub["payload"])).as_py()
                emit(kt, sub.num_rows, 0, in_b or 0, 0, 0.0)

        return pa.table(out, schema=MEDIA_STATS_SCHEMA)


_STATS_STAGE_MEMO: dict = {}


def _stats_task(batch: pa.Table, max_side: int, every_ms: int,
                feature_dim: int) -> pa.Table:
    """Worker-memoized stateless-task form of the dispatch stage: the
    stage object is built once per WORKER PROCESS (module-global memo —
    workers import this module fresh), so the fused task path pays zero
    per-batch setup without reserving CPUs in an actor pool."""
    key = (max_side, every_ms, feature_dim)
    s = _STATS_STAGE_MEMO.get(key)
    if s is None:
        s = _STATS_STAGE_MEMO[key] = MediaCorpusStatsStage(
            max_side=max_side, every_ms=every_ms, feature_dim=feature_dim)
    return s(batch)


def media_corpus_stats(media_ds, max_side: int = 96, every_ms: int = 1000,
                       concurrency=None, batch_size: int = 64,
                       feature_dim: int = 8):
    """Payload-scale media-family stats: one dispatch pass (see
    ``MediaCorpusStatsStage``) + a driver finish over the tiny per-batch
    partials.  Returns a 3-row pandas DataFrame (kind, n_rows, n_frames,
    in_bytes, out_bytes, feat0_sum) sorted by kind.

    ``concurrency=None`` (default) runs STATELESS TASKS with a
    worker-memoized stage — the netpbm decode kernels have zero init
    cost, and the repo's measured rule applies (actor pools only where
    __init__ is genuinely expensive): at 48k rows / 8 CPUs the
    autoscaling pool's ramp + task/actor fusion boundary cost 6.8 s vs
    4.4 s for tasks on identical output.  Pass a ``(min, max)`` tuple to
    use the actor-pool path instead — the right call when a REAL decoder
    (model load, codec context) makes per-actor init expensive; never
    fix the pool at the full CPU count (a pool reserving every CPU
    starves the read tasks — measured deadlock)."""
    import functools

    from ict_log_parser_ray import blocks

    if concurrency is None:
        partials = media_ds.map_batches(
            functools.partial(_stats_task, max_side=max_side,
                              every_ms=every_ms, feature_dim=feature_dim),
            batch_format="pyarrow", batch_size=batch_size)
    else:
        partials = media_ds.map_batches(
            MediaCorpusStatsStage,
            fn_constructor_kwargs={"max_side": max_side,
                                   "every_ms": every_ms,
                                   "feature_dim": feature_dim},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1)
    t = blocks.concat_shaped(partials, "n_rows",
                             empty_schema=MEDIA_STATS_SCHEMA)
    df = t.to_pandas().groupby("kind", as_index=False).sum()
    return df.sort_values("kind").reset_index(drop=True)
