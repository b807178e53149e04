"""Vectorized, process-stable 64-bit hashing.

This is the engine's shuffle/bucketing primitive. Everything that partitions
by key (hash joins, bucketed aggregates, hot-key salting, MinHash shingles,
SimHash tokens, LSH band keys) routes through here so the per-row Python
``hashlib`` calls of round 1 become a handful of numpy passes per batch.

Design: a polynomial rolling hash over the raw UTF-8 byte buffer of an Arrow
string array (zero-copy via ``Array.buffers()``), finalized with a
splitmix64-style avalanche mixer. All arithmetic is uint64 mod 2^64 —
deterministic across processes, machines and runs (unlike Python's salted
``hash``), with no per-row Python objects anywhere.

The rolling form also yields ALL char q-gram hashes of a batch in O(total
bytes): window hash = (prefix[i+q] - prefix[i]) * inv(P)^i, using the modular
inverse of the (odd) base mod 2^64.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_U64 = np.uint64
_P = _U64(0x100000001B3)  # odd base (FNV prime) — invertible mod 2^64
_GOLDEN = _U64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Finalizer of splitmix64 — full avalanche over uint64 (vectorized)."""
    x = (x + _GOLDEN).astype(_U64, copy=False)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _inv_u64(a: int) -> np.uint64:
    """Modular inverse of odd ``a`` mod 2^64 (Newton iteration)."""
    x = a
    for _ in range(6):  # doubles correct bits each step: 3→6→12→24→48→96
        x = (x * (2 - a * x)) % (1 << 64)
    return _U64(x)


_P_INV = _inv_u64(int(_P))


def _as_single_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    if isinstance(col, pa.ChunkedArray):  # zero-chunk edge case
        col = pa.array([], type=col.type)
    return col


def _string_buffer(col) -> Tuple[np.ndarray, np.ndarray]:
    """(data bytes, offsets int64 (n+1,) rebased to 0) of an Arrow string
    array; nulls are treated as empty strings."""
    arr = _as_single_array(col)
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = pc.cast(arr, pa.string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
        arr = _as_single_array(arr)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    start = offs[0] if len(offs) else 0
    offs = offs - start
    data = data[start : start + (offs[-1] if len(offs) else 0)]
    return data, offs


def _prefix_hash(data: np.ndarray) -> np.ndarray:
    """S[j] = sum_{i<j} (b[i]+1) * P^i  (mod 2^64), length len(data)+1."""
    n = data.size
    S = np.empty(n + 1, dtype=_U64)
    S[0] = 0
    if n:
        pw = np.empty(n, dtype=_U64)
        pw[0] = 1
        if n > 1:
            np.multiply.accumulate(np.full(n - 1, _P, dtype=_U64), out=pw[1:])
        np.add.accumulate((data.astype(_U64) + _U64(1)) * pw, out=S[1:])
    return S


def hash_strings(col, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash per element of an Arrow string array/chunked array.
    Nulls hash like empty strings. Fully vectorized."""
    data, offs = _string_buffer(col)
    n = len(offs) - 1
    if n <= 0:
        return np.empty(0, dtype=_U64)
    S = _prefix_hash(data)
    lengths = np.diff(offs)
    # window [offs[i], offs[i+1]) rebased: (S[end]-S[start]) * P^-start
    if data.size:
        pinv = np.empty(data.size + 1, dtype=_U64)
        pinv[0] = 1
        np.multiply.accumulate(np.full(data.size, _P_INV, dtype=_U64), out=pinv[1:])
        base = (S[offs[1:]] - S[offs[:-1]]) * pinv[offs[:-1]]
    else:
        base = np.zeros(n, dtype=_U64)
    h = _splitmix64(base ^ _splitmix64(lengths.astype(_U64) + _U64(seed & 0xFFFFFFFFFFFFFFFF)))
    return h


def md5_hash_strings(col) -> np.ndarray:
    """Per-string uint64 = first 8 bytes (big-endian) of md5 — the one hash an
    external SQL engine can replicate exactly (DuckDB ``md5()``), used where a
    query output must be oracle-checkable. Hashes UNIQUE strings only (md5 has
    no vectorized kernel) and gathers, so cost is O(distinct) not O(rows)."""
    arr = _as_single_array(col)
    if len(arr) == 0:
        return np.empty(0, dtype=_U64)
    vals = np.asarray(arr.to_pylist(), dtype=object)
    uniq, inv = np.unique(vals, return_inverse=True)
    hu = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big") for s in uniq),
        dtype=_U64, count=len(uniq),
    )
    return hu[inv]


def hash_ints(vals: np.ndarray, seed: int = 0) -> np.ndarray:
    x = vals.astype(np.int64, copy=False).view(_U64)
    return _splitmix64(x + _U64(seed & 0xFFFFFFFFFFFFFFFF))


def hash_column(col, seed: int = 0) -> np.ndarray:
    """Stable per-row uint64 hash of one Arrow column (string / int / float /
    bool; anything else is cast to string)."""
    arr = _as_single_array(col)
    t = arr.type
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        if arr.null_count:
            arr = pc.fill_null(arr, 0)
        vals = pc.cast(arr, pa.int64()).to_numpy(zero_copy_only=False)
        return hash_ints(vals, seed)
    if pa.types.is_floating(t):
        if arr.null_count:
            arr = pc.fill_null(arr, 0.0)
        vals = pc.cast(arr, pa.float64()).to_numpy(zero_copy_only=False)
        return _splitmix64(vals.view(_U64) + _U64(seed & 0xFFFFFFFFFFFFFFFF))
    return hash_strings(arr, seed)


def hash_columns(t: pa.Table, cols: Sequence[str], seed: int = 0) -> np.ndarray:
    """Combined per-row hash over several columns (order-sensitive)."""
    h = hash_column(t[cols[0]], seed)
    for i, c in enumerate(cols[1:], start=1):
        h = _splitmix64(h ^ (hash_column(t[c], seed + i) + _GOLDEN))
    return h


def bucket_ids(t: pa.Table, cols: Sequence[str], num_buckets: int, seed: int = 0) -> pa.Array:
    """int32 bucket id per row — the shuffle key for bucketed joins/aggregates."""
    return pa.array((hash_columns(t, cols, seed) % _U64(num_buckets)).astype(np.int32), type=pa.int32())


def hash_token_list(tokens: Sequence[str], seed: int = 0) -> np.ndarray:
    """Hash a Python list of strings (vectorized through one Arrow array).
    Matches :func:`hash_strings` exactly."""
    if len(tokens) == 0:
        return np.empty(0, dtype=_U64)
    return hash_strings(pa.array(list(tokens), type=pa.string()), seed)


def qgram_hashes_batch(col, q: int, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """All char q-gram hashes for every string of a batch, in one pass.

    Returns ``(gram_hashes, counts)``: ``counts[i]`` grams for row i, laid out
    consecutively in ``gram_hashes``. Rows shorter than ``q`` (but non-empty)
    contribute ONE gram — the whole string — matching
    ``blocking.char_qgrams``; empty rows contribute zero.
    """
    data, offs = _string_buffer(col)
    n = len(offs) - 1
    if n <= 0:
        return np.empty(0, dtype=_U64), np.empty(0, dtype=np.int64)
    lengths = np.diff(offs)
    counts = np.where(lengths >= q, lengths - q + 1, (lengths > 0).astype(np.int64))
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=_U64), counts
    S = _prefix_hash(data)
    pinv = np.empty(data.size + 1, dtype=_U64)
    pinv[0] = 1
    if data.size:
        np.multiply.accumulate(np.full(data.size, _P_INV, dtype=_U64), out=pinv[1:])
    # global start index of every gram: for row i, starts offs[i] .. offs[i]+counts[i]-1
    row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    first = np.repeat(offs[:-1], counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(counts) - counts, counts)
    starts = first + within
    glen = np.minimum(np.repeat(lengths, counts), q)  # short rows: whole string
    ends = starts + glen
    base = (S[ends] - S[starts]) * pinv[starts]
    return _splitmix64(base ^ _splitmix64(glen.astype(_U64) + _U64(seed & 0xFFFFFFFFFFFFFFFF))), counts


def minhash_signatures_batch(
    gram_hashes: np.ndarray, counts: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_rows, n_perm) MinHash signature matrix from a flat gram-hash layout.

    ``a``/``b`` are the affine permutation params (uint64, shape (n_perm,)).
    Rows with zero grams get the max-sentinel signature.
    """
    mersenne = _U64((1 << 61) - 1)
    n = len(counts)
    n_perm = len(a)
    out = np.full((n, n_perm), np.iinfo(np.uint64).max, dtype=_U64)
    if gram_hashes.size == 0:
        return out
    nz = counts > 0
    starts = (np.cumsum(counts) - counts)[nz]
    # one contiguous pass per permutation (numpy's broadcast-outer path is
    # ~100× slower than contiguous muladd; the loop is n_perm ≤ 64 iterations)
    mins = np.empty((n_perm, starts.size), dtype=_U64)
    for k in range(n_perm):
        h = (a[k] * gram_hashes + b[k]) % mersenne
        mins[k] = np.minimum.reduceat(h, starts)
    out[nz] = mins.T
    return out


def band_keys_batch(sigs: np.ndarray, n_bands: int, rows_per_band: int) -> np.ndarray:
    """(n_rows, n_bands) uint64 band keys — one combined hash per band chunk."""
    n = sigs.shape[0]
    out = np.empty((n, n_bands), dtype=_U64)
    for b_i in range(n_bands):
        chunk = sigs[:, b_i * rows_per_band : (b_i + 1) * rows_per_band]
        h = _splitmix64(chunk[:, 0] + _U64(b_i))
        for r in range(1, rows_per_band):
            h = _splitmix64(h ^ (chunk[:, r] + _GOLDEN))
        out[:, b_i] = h
    return out


def u64_to_hex_strings(vals: np.ndarray) -> np.ndarray:
    """uint64 → 16-char hex strings, vectorized (no per-row format calls)."""
    b = vals.astype(">u8").view(np.uint8).reshape(-1, 8)
    hexmap = np.array([format(i, "02x") for i in range(256)], dtype="U2")
    chars = hexmap[b]  # (n, 8) of 2-char strings
    out = chars[:, 0]
    for i in range(1, 8):
        out = np.char.add(out, chars[:, i])
    return out
