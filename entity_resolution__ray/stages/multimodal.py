"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode/feature libraries (PIL, torchvision, ffmpeg, librosa) are NOT in
this container. IMAGES still get a REAL path: a from-scratch pure-numpy PPM
(P6) codec — parse, pixel features, nearest-neighbor resize — so the image
pipeline is functional end to end without any library. Other encodings and
audio/video decode are STUBBED: ``DecodeMedia`` raises ``NotImplementedError``
in ``real`` mode for them and produces a deterministic fake decode in
``fake`` mode. Everything Ray-side is real and tested: the schema, the
actor-pool signature, per-actor setup, small-batch sizing for wide binary
rows, and the output layout.

Scale notes: binary payloads make rows wide — ``batch_size`` must be small
(32-256) so batch × concurrency fits worker heaps, and
``DataContext.target_max_block_size`` should be raised so Arrow doesn't split
blocks absurdly small. Media bytes stay zero-copy Arrow buffers end to end.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("kind", pa.string()),        # "image" | "audio" | "video"
        pa.field("media_ref", pa.string()),   # origin URI
        pa.field("payload", pa.binary()),     # opaque encoded bytes
        pa.field("width", pa.int32()),        # image/video metadata (0 if n/a)
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),  # audio/video metadata (0 if n/a)
    ]
)


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for tests/benchmarks."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            # real decodable payload: random RGB pixels as PPM(P6)
            w0, h0 = int(rng.randint(8, 32)), int(rng.randint(8, 32))
            payload = encode_ppm(rng.randint(0, 256, size=(h0, w0, 3), dtype=np.uint8).astype(np.uint8))
        else:
            payload = rng.bytes(256 + int(rng.randint(0, 512)))
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "kind": kind,
                "media_ref": f"media://fixture/{i}",
                "payload": payload,
                "width": w0 if kind == "image" else (int(rng.randint(16, 512)) if kind == "video" else 0),
                "height": h0 if kind == "image" else (int(rng.randint(16, 512)) if kind == "video" else 0),
                "duration_ms": int(rng.randint(100, 60000)) if kind != "image" else 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# real pure-numpy PPM (P6) codec — no image library required
# ---------------------------------------------------------------------------
def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → (h, w, 3) uint8 array. Raises
    ValueError on anything that is not a P6 stream."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM stream")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return data.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (pixel-center sampling)."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(target_h) + 0.5) * h / target_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(target_w) + 0.5) * w / target_w).astype(np.int64), w - 1)
    return arr[ys][:, xs]


def ppm_features(arr: np.ndarray) -> np.ndarray:
    """Real 8-dim image features: per-channel mean+std (scaled to [0,1]),
    aspect ratio, log-area."""
    f = arr.astype(np.float64) / 255.0
    mean = f.mean(axis=(0, 1))
    std = f.std(axis=(0, 1))
    h, w = arr.shape[:2]
    return np.concatenate([mean, std, [w / max(h, 1), np.log1p(h * w) / 20.0]])


class DecodeMedia:
    """Actor-pool batch fn: payload bytes → fixed-dim feature vector.

    mode="fake": deterministic features from a blake2b digest of the payload
    (stable across processes — exercises the full distributed plumbing).
    mode="real": PPM (P6) images decode for real (pure-numpy codec above,
    features = per-channel mean/std + geometry); every other encoding raises
    NotImplementedError — those decoders (PIL / torchaudio / ffmpeg) are not
    available in this environment; wire them here when they are. Setup
    (model load) belongs in ``__init__`` so it runs once per actor.
    """

    def __init__(self, mode: str = "fake", feature_dim: int = 8):
        self.mode = mode
        self.dim = feature_dim

    def _fake_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload or b"", digest_size=self.dim * 8).digest()
        vals = np.frombuffer(digest, dtype=np.uint64).astype(np.float64)
        return vals / np.float64(np.iinfo(np.uint64).max)

    def _real_features(self, payload: bytes) -> np.ndarray:
        if payload and payload.startswith(b"P6"):
            f = ppm_features(decode_ppm(payload))
            if len(f) < self.dim:
                f = np.pad(f, (0, self.dim - len(f)))
            return f[: self.dim]
        raise NotImplementedError(
            "real decode implemented only for PPM(P6) images in this container "
            "(PIL/torchaudio/ffmpeg absent)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        kernel = self._real_features if self.mode == "real" else self._fake_features
        feats = [kernel(p) for p in batch["payload"].to_pylist()]
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))
        )


def decode_media(
    media: Dataset,
    mode: str = "fake",
    feature_dim: int = 8,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> Dataset:
    """Media decode / feature-extraction stage (actor pool, small batches for
    wide binary rows)."""
    return media.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"mode": mode, "feature_dim": feature_dim},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeImageStub:
    """Image resize stage: REAL pixel work for PPM(P6) payloads (pure-numpy
    nearest-neighbor, payload re-encoded); other encodings pass through with
    only metadata rewritten (the stub behavior, libraries absent)."""

    def __init__(self, target_w: int = 224, target_h: int = 224):
        self.w = target_w
        self.h = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch["payload"].to_pylist()
        out_payloads = []
        for p in payloads:
            if p and p.startswith(b"P6"):
                out_payloads.append(encode_ppm(resize_nearest(decode_ppm(p), self.w, self.h)))
            else:
                out_payloads.append(p)
        batch = batch.drop_columns(
            [c for c in ("width", "height", "payload") if c in batch.column_names]
        )
        return (
            batch.append_column("payload", pa.array(out_payloads, type=pa.binary()))
            .append_column("width", pa.array([self.w] * n, type=pa.int32()))
            .append_column("height", pa.array([self.h] * n, type=pa.int32()))
        )


def frame_sample_stub(media: Dataset, every_ms: int = 1000) -> Dataset:
    """Video frame-sampling stub: emits one row per sampled timestamp with the
    parent video's id (real fan-out shape, fake frames)."""

    def emit(batch: pa.Table) -> pa.Table:
        ids, refs, ts = [], [], []
        for mid, ref, kind, dur in zip(
            batch["media_id"].to_pylist(),
            batch["media_ref"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if kind != "video":
                continue
            for t in range(0, max(int(dur), 1), every_ms):
                ids.append(mid)
                refs.append(ref)
                ts.append(t)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "media_ref": pa.array(refs, type=pa.string()),
                "frame_ts_ms": pa.array(ts, type=pa.int32()),
            }
        )

    return media.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=64)
