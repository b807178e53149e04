"""Mergeable cardinality sketches: HyperLogLog grouped approximate distinct.

The exact counterpart is ``curation.grouped_distinct_count`` (one shuffle of
distinct (key, val) pairs). That is the right answer while distinct pairs fit
a shuffle; at 100 TB with billions of distinct values per key the shuffle
itself becomes the bottleneck, and the classic engine answer is a FIXED-SIZE
mergeable sketch per (block, key) — ``2^p`` one-byte registers regardless of
cardinality — merged associatively in a tiny groupby. This is the
``approx_count_distinct`` every large-scale SQL engine ships (Flajolet et al.
2007 HyperLogLog, with the small-range linear-counting correction).

Scale shape: ``map_batches`` emits one (key, registers[2^p]) row per key per
batch (the combiner — registers, never values, enter the shuffle), a single
small ``groupby(key)`` merges by elementwise max (associative + commutative,
so any merge tree is exact), and the estimator runs on the merged registers.
Error is ~1.04/sqrt(2^p) ≈ 1.6% at p=12 (4 KiB per group)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import hash_column


def _hll_partial(keys: np.ndarray, hashes: np.ndarray, p: int):
    """Per-key register arrays from uint64 hashes (vectorized).

    Register index = top ``p`` bits; rank = 1 + leading zeros of the
    remaining 64-p bits (capped at 64-p+1)."""
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # leading zeros of the remaining bits = 64 - bit_length(rest). float64
    # log2 is only trustworthy for 32-bit magnitudes (2^-33 gap vs 1e-16
    # rounding), so split hi/lo
    hi = (rest >> np.uint64(32)).astype(np.float64)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl = np.zeros(len(rest), dtype=np.int64)
    hi_nz = hi != 0
    lo_nz = (~hi_nz) & (lo != 0)
    bl[hi_nz] = np.floor(np.log2(hi[hi_nz])).astype(np.int64) + 33
    bl[lo_nz] = np.floor(np.log2(lo[lo_nz])).astype(np.int64) + 1
    rank = np.minimum(64 - bl + 1, 64 - p + 1).astype(np.uint8)

    order = np.lexsort((rank, idx, keys))
    k_s, i_s, r_s = keys[order], idx[order], rank[order]
    # per (key, idx) keep max rank = last of each run (rank ascending in run)
    last = np.ones(len(k_s), dtype=bool)
    last[:-1] = (k_s[1:] != k_s[:-1]) | (i_s[1:] != i_s[:-1])
    k_u, i_u, r_u = k_s[last], i_s[last], r_s[last]
    key_start = np.ones(len(k_u), dtype=bool)
    key_start[1:] = k_u[1:] != k_u[:-1]
    key_ids = np.cumsum(key_start) - 1
    regs = np.zeros((int(key_ids[-1]) + 1 if len(key_ids) else 0, m), dtype=np.uint8)
    regs[key_ids, i_u] = r_u
    return k_u[key_start], regs


def _hll_estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    E = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if E <= 2.5 * m and zeros:
        E = m * np.log(m / zeros)  # linear counting (small-range correction)
    return float(E)


def hll_grouped_distinct(
    ds: Dataset,
    key_col: str,
    val_col: str,
    p: int = 12,
    out_col: str = "approx_distinct",
    seed: int = 0,
) -> Dataset:
    """Approximate COUNT(DISTINCT val) per key via per-batch HLL partials
    merged in one tiny groupby. Deterministic (splitmix64 hashing, no RNG).
    Output: (key_col, out_col: int64 — the rounded estimate)."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        key_t = t.schema.field(key_col).type
        if t.num_rows == 0:
            return pa.table({
                key_col: pa.array([], type=key_t),
                "__regs": pa.array([], type=pa.list_(pa.uint8(), m)),
            })
        karr = t[key_col].combine_chunks()
        kd = karr.dictionary_encode()
        kcodes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash_column(t[val_col], seed=seed)
        keys_u, regs = _hll_partial(kcodes, h, p)
        return pa.table({
            key_col: kd.dictionary.take(pa.array(keys_u)),
            "__regs": pa.FixedSizeListArray.from_arrays(
                pa.array(regs.reshape(-1), type=pa.uint8()), m),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        keys, ests = [], []
        for key, sub in g.groupby(key_col, sort=False):
            stacked = np.stack([np.asarray(r, dtype=np.uint8) for r in sub["__regs"]])
            merged = stacked.max(axis=0)
            keys.append(key)
            ests.append(int(round(_hll_estimate(merged, p))))
        return pd.DataFrame({key_col: keys, out_col: pd.Series(ests, dtype=np.int64)})

    from .blocking import bucketed_apply

    return bucketed_apply(partials, [key_col], merge, num_buckets=16)
