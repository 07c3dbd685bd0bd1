"""Multimodal column stages (task brief): image/audio/video as opaque
``binary`` columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
container): ``decode=\"fake\"`` runs a deterministic fake decoder so the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is real and tested; ``decode=\"real\"`` raises ``NotImplementedError`` at the
exact point where PIL/libav would be called.

Scale notes baked in: binary payloads make rows heavy → small ``batch_size``
(default 64) and an actor pool (decoder init is expensive in the real world);
output keeps payloads OUT of the feature table (features only), so downstream
aggregates never reship the blobs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),         # image | audio | video
    ("payload", pa.binary()),      # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),         # typed metadata (nullable for audio)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
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

    __init__ loads the decoder ONCE per actor (stubbed); __call__ maps a
    small batch of payloads → fixed-width feature vectors + metadata, and
    DROPS the payload column from the output.
    """

    def __init__(self, decode: str = "fake", feature_dim: int = 8):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode
        self.feature_dim = feature_dim
        if decode == "real":
            # point where PIL / torchaudio / pyav would be imported+loaded
            raise NotImplementedError(
                "real media decoding requires image/audio libs not present "
                "in this environment; use decode='fake'")

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic digest → fixed-width pseudo-features
        d = hashlib.sha256(payload).digest()
        raw = np.frombuffer(d[: self.feature_dim * 4], dtype=np.uint32)
        return (raw % 10_000).astype(np.float32) / 10_000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
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


def persist_synth_media(path: str, n: int = 48, seed: int = 42) -> str:
    """Write the deterministic synthetic media table once (atomic rename) so
    a SQL oracle can read the identical payload bytes by absolute path."""
    import os

    import pyarrow.parquet as pq

    if not os.path.isfile(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(synth_media_table(n=n, seed=seed), tmp)
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

    Real plumbing, stubbed pixel kernel: the OUTPUT GEOMETRY is computed
    for real from the typed metadata (cap the longer side at ``max_side``,
    preserve aspect ratio, never upscale), and ``decode="fake"`` emits a
    deterministic payload (sha256 of the input payload + target geometry,
    length scaled by the area ratio — so payload size responds to the
    resize like a real re-encode would).  ``decode="real"`` raises at the
    exact point PIL/pyav would run.  Audio rows pass through untouched.
    """

    def __init__(self, max_side: int = 256, decode: str = "fake"):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        if decode == "real":
            raise NotImplementedError(
                "real media resize requires image/video libs not present "
                "in this environment; use decode='fake'")
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
        out_w, out_h, out_p = [], [], []
        for kind, w, h, p in zip(kinds, ws, hs, payloads):
            if kind == "audio" or w is None or h is None:
                out_w.append(w)
                out_h.append(h)
                out_p.append(p)
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
    rows are heavy; geometry math real, pixel kernel stubbed)."""
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
