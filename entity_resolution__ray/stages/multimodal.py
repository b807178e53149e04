"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode/feature libraries (PIL, torchvision, ffmpeg, librosa) are NOT in
this container, so the decode kernels are STUBBED — ``DecodeMedia`` raises
``NotImplementedError`` in ``real`` mode and produces a deterministic fake
decode in ``fake`` mode. Everything Ray-side is real and tested: the schema,
the actor-pool signature, per-actor setup, small-batch sizing for wide binary
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
        payload = rng.bytes(256 + int(rng.randint(0, 512)))
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "kind": kind,
                "media_ref": f"media://fixture/{i}",
                "payload": payload,
                "width": int(rng.randint(16, 512)) if kind != "audio" else 0,
                "height": int(rng.randint(16, 512)) if kind != "audio" else 0,
                "duration_ms": int(rng.randint(100, 60000)) if kind != "image" else 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class DecodeMedia:
    """Actor-pool batch fn: payload bytes → fixed-dim feature vector.

    mode="fake": deterministic features from a blake2b digest of the payload
    (stable across processes — exercises the full distributed plumbing).
    mode="real": raises NotImplementedError — the decode libraries (PIL /
    torchaudio / ffmpeg) are not available in this environment; wire the
    actual decoder here when they are. Setup (model load) belongs in
    ``__init__`` so it runs once per actor.
    """

    def __init__(self, mode: str = "fake", feature_dim: int = 8):
        self.mode = mode
        self.dim = feature_dim
        if mode == "real":
            # e.g.: self.model = load_image_encoder(...)  # once per actor
            raise NotImplementedError(
                "real media decode requires PIL/torchvision/ffmpeg — not present in this container; "
                "use mode='fake' for plumbing tests"
            )

    def _fake_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload or b"", digest_size=self.dim * 8).digest()
        vals = np.frombuffer(digest, dtype=np.uint64).astype(np.float64)
        return vals / np.float64(np.iinfo(np.uint64).max)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._fake_features(p) for p in batch["payload"].to_pylist()]
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
    """Image resize stage stub: validates plumbing (metadata math is real,
    pixel work is fake — payload passes through untouched, width/height are
    rewritten)."""

    def __init__(self, target_w: int = 224, target_h: int = 224):
        self.w = target_w
        self.h = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.drop_columns([c for c in ("width", "height") if c in batch.column_names])
        return batch.append_column("width", pa.array([self.w] * n, type=pa.int32())).append_column(
            "height", pa.array([self.h] * n, type=pa.int32())
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
