"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode/feature libraries (PIL, torchvision, ffmpeg, librosa) are NOT in
this container. IMAGES and AUDIO still get REAL paths: from-scratch
pure-numpy codecs for PPM (P6) and uncompressed 24-bit BMP — parse, pixel
features, nearest-neighbor resize — and a stdlib-``wave`` PCM WAV decoder
with spectral/energy features, so those pipelines are functional end to end
without any library. Remaining encodings (PNG/JPEG/MP3/MP4…) are STUBBED:
``DecodeMedia`` raises ``NotImplementedError`` in ``real`` mode for them and
produces a deterministic fake decode in ``fake`` mode. Everything Ray-side is
real and tested: the schema, the actor-pool signature, per-actor setup,
small-batch sizing for wide binary rows, and the output layout.

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
            # real decodable payload: random RGB pixels, alternating between
            # the two from-scratch codecs (PPM P6 and 24-bit BMP)
            w0, h0 = int(rng.randint(8, 32)), int(rng.randint(8, 32))
            pixels = rng.randint(0, 256, size=(h0, w0, 3), dtype=np.uint8).astype(np.uint8)
            payload = encode_ppm(pixels) if (i // 3) % 2 == 0 else encode_bmp(pixels)
        elif kind == "audio":
            # real decodable payload: a short deterministic tone as PCM WAV
            rate = 8000
            t = np.arange(int(rate * (0.05 + rng.rand() * 0.2)))
            payload = encode_wav(0.5 * np.sin(2 * np.pi * (100 + rng.rand() * 400) * t / rate), rate)
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


# ---------------------------------------------------------------------------
# real pure-numpy BMP codec (uncompressed 24-bit BI_RGB) — no image library
# ---------------------------------------------------------------------------
def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) → (h, w, 3) RGB
    uint8. Raises ValueError for other BMP variants (palette, RLE, 32-bit)."""
    if not payload or not payload.startswith(b"BM"):
        raise ValueError("not a BMP stream")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP ({bpp}-bit, compression={comp}); only 24-bit BI_RGB")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("degenerate BMP dimensions")
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
    rows = data[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]  # bottom-up storage is the BMP default
    return rows[..., ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP bytes (bottom-up)."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    img[:, : w * 3] = np.ascontiguousarray(arr[::-1, :, ::-1], dtype=np.uint8).reshape(h, w * 3)
    pix = img.tobytes()
    header = (
        b"BM" + (54 + len(pix)).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") + (2835).to_bytes(4, "little")
        + (0).to_bytes(4, "little") + (0).to_bytes(4, "little")
    )
    return header + pix


# ---------------------------------------------------------------------------
# real WAV codec (stdlib ``wave`` + numpy) — no audio library
# ---------------------------------------------------------------------------
def decode_wav(payload: bytes):
    """PCM WAV → ((n_frames, channels) float64 in [-1, 1], sample_rate).
    Supports 8/16/32-bit integer PCM; raises ValueError on corrupt or
    non-PCM streams."""
    import io
    import wave

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            rate = wf.getframerate()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"corrupt WAV stream: {e}") from e
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    n = len(x) // max(nch, 1)
    return x[: n * nch].reshape(n, nch), rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float samples in [-1, 1] (1-D mono or (n, ch)) → 16-bit PCM WAV bytes."""
    import io
    import wave

    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = (np.clip(s, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.ascontiguousarray(pcm).tobytes())
    return buf.getvalue()


def wav_features(x: np.ndarray, rate: int) -> np.ndarray:
    """Real 8-dim audio features: clipped duration, RMS, mean |x|, peak,
    zero-crossing rate, low-band spectral fraction, channel count, rate."""
    mono = x.mean(axis=1) if x.size else np.zeros(0)
    n = len(mono)
    dur = n / max(rate, 1)
    rms = float(np.sqrt((mono ** 2).mean())) if n else 0.0
    zcr = float(np.mean(mono[1:] * mono[:-1] < 0)) if n > 1 else 0.0
    peak = float(np.abs(mono).max()) if n else 0.0
    mean_abs = float(np.abs(mono).mean()) if n else 0.0
    if n > 1:
        spec = np.abs(np.fft.rfft(mono))
        half = max(len(spec) // 2, 1)
        tot = float(spec.sum()) or 1.0
        lo_frac = float(spec[:half].sum()) / tot
    else:
        lo_frac = 0.0
    return np.array(
        [min(dur / 60.0, 1.0), rms, mean_abs, peak, zcr, lo_frac,
         min((x.shape[1] if x.ndim == 2 else 1) / 8.0, 1.0), min(rate / 48000.0, 1.0)]
    )


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
    mode="real": PPM (P6) and 24-bit BMP images decode for real (pure-numpy
    codecs above, features = per-channel mean/std + geometry), and PCM WAV
    audio decodes via stdlib ``wave`` (energy/spectral features); every other
    encoding raises NotImplementedError — those decoders (PIL / torchaudio /
    ffmpeg) are not available in this environment; wire them here when they
    are. Setup (model load) belongs in ``__init__`` so it runs once per actor.
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
        elif payload and payload.startswith(b"BM"):
            f = ppm_features(decode_bmp(payload))
        elif payload and len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            f = wav_features(*decode_wav(payload))
        else:
            raise NotImplementedError(
                "real decode implemented for PPM(P6)/BMP(24-bit) images and PCM "
                "WAV audio in this container; other formats (PNG/JPEG/MP3/MP4…) "
                "need PIL/torchaudio/ffmpeg — wire them here when available"
            )
        if len(f) < self.dim:
            f = np.pad(f, (0, self.dim - len(f)))
        return f[: self.dim]

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


def image_pixel_stats(
    media: Dataset,
    id_col: str = "media_id",
    batch_size: int = 64,
) -> Dataset:
    """Decode PPM(P6)/BMP images and emit INTEGER-EXACT per-image stats —
    (id, width, height, pixel_sum) with pixel_sum = Σ of all channel bytes
    as int64. Integer stats are what makes the media-decode path
    oracle-checkable end to end (float mean/std features are not exactly
    replicable in SQL): the ``mm_image_pixel_stats`` driver query feeds this
    stage payloads generated from a closed-form formula and the DuckDB
    oracle recomputes the same sums symbolically, so a single wrong byte
    anywhere in header parsing, row padding or pixel layout fails the hash
    compare. Decode is per-payload inside the batch fn (codecs parse one
    header at a time — the honest shape for real decoders); small
    ``batch_size`` for wide binary rows per the module scale notes."""

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        w, h, s = [], [], []
        for p in batch["payload"].to_pylist():
            if p and p.startswith(b"P6"):
                arr = decode_ppm(p)
            elif p and p.startswith(b"BM"):
                arr = decode_bmp(p)
            else:
                raise NotImplementedError(
                    "image_pixel_stats: PPM(P6)/BMP payloads only in this "
                    "container (PNG/JPEG need PIL — wire here when available)"
                )
            h.append(arr.shape[0])
            w.append(arr.shape[1])
            s.append(int(arr.astype(np.int64).sum()))
        return pa.table(
            {
                id_col: ids,
                "width": pa.array(w, pa.int64()),
                "height": pa.array(h, pa.int64()),
                "pixel_sum": pa.array(s, pa.int64()),
            }
        )

    return media.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
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
            elif p and p.startswith(b"BM"):
                out_payloads.append(encode_bmp(resize_nearest(decode_bmp(p), self.w, self.h)))
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
