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

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import hash_column

logger = logging.getLogger(__name__)


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


def heavy_hitters(
    ds: Dataset,
    text_col: str = "text",
    theta: float = 0.005,
    capacity: int = 4096,
    num_buckets: int = 16,
    max_candidates: int = 262_144,
) -> Dataset:
    """EXACT frequent tokens: every token whose occurrence count is
    ``>= theta * N`` (N = total token occurrences), with its exact count —
    via a two-pass Misra-Gries sketch + recheck, never a full-vocabulary
    shuffle of raw occurrences.

    Pass 1 (one map over text): each batch counts its tokens exactly, then
    truncates to a Misra-Gries summary of ``capacity`` entries (subtract the
    (capacity+1)-th largest count from all, drop <= 0 — the classic decrement,
    done in one vectorized step). The per-batch subtracted amount is the
    batch's exact undercount bound; summaries and bounds merge by plain
    summation in one TINY shuffle (<= capacity rows per batch enter it,
    regardless of vocabulary size). Mergeable-summaries guarantee (Agarwal
    et al. 2012): true_count - merged_count <= total_subtracted, so
    ``merged_count + total_subtracted >= theta*N`` is a complete candidate
    filter — no true heavy hitter can be missed.

    Pass 2: the (small, broadcast) candidate set is counted EXACTLY in a
    second map + small groupby, and filtered at the true threshold. Choose
    ``capacity >> 1/theta`` so pass 1 prunes hard; candidates above
    ``max_candidates`` raise instead of silently broadcasting a huge set."""
    import ray
    import pyarrow.compute as pc

    from ..functions.text_norm import tokens_array
    from .blocking import bucketed_apply

    def batch_summary(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(tokens_array(t[text_col]))
        n = len(flat)
        if n == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        d = flat.combine_chunks().dictionary_encode()
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary)).astype(np.int64)
        sub = 0
        if len(cnt) > capacity:
            # (capacity+1)-th largest count = the MG decrement
            sub = int(np.partition(cnt, len(cnt) - capacity - 1)[len(cnt) - capacity - 1])
            cnt = cnt - sub
        keep = cnt > 0
        toks = d.dictionary.filter(pa.array(keep))
        rows = pa.table({"token": toks, "cnt": pa.array(cnt[keep])})
        # sentinel rows: '#' cannot occur in [a-z0-9]+ tokens
        sent = pa.table({"token": pa.array(["#TOTAL", "#SUB"]),
                         "cnt": pa.array([n, sub], type=pa.int64())})
        return pa.concat_tables([rows, sent])

    summaries = ds.map_batches(batch_summary, batch_format="pyarrow",
                               zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False).agg(cnt=("cnt", "sum"))

    merged = bucketed_apply(summaries, ["token"], merge, num_buckets=num_buckets)

    # the merged summary is sketch-sized; the sentinels and candidate list are
    # a bounded driver read (gated below), NOT a corpus materialization
    mdf = merged.to_pandas()
    total = int(mdf.loc[mdf["token"] == "#TOTAL", "cnt"].sum())
    slack = int(mdf.loc[mdf["token"] == "#SUB", "cnt"].sum())
    bar = theta * total
    if slack >= bar and total > 0:
        # COMPLETENESS GUARD: a token decremented out of every batch summary
        # has true count <= slack; if slack >= theta*N such a token could be
        # a heavy hitter the sketch never saw. Fall back to the exact
        # full-vocabulary count (what the sketch exists to avoid — the caller
        # should raise `capacity`; the fallback keeps the output exact at ANY
        # parameterization instead of silently dropping hitters).
        logger.warning(
            "heavy_hitters: undercount slack %d >= threshold bar %.1f — "
            "capacity=%d is too small for theta=%g on this corpus; falling "
            "back to the exact full-vocabulary count", slack, bar, capacity, theta)

        def full_count(t: pa.Table) -> pa.Table:
            flat = pc.list_flatten(tokens_array(t[text_col]))
            if len(flat) == 0:
                return pa.table({"token": pa.array([], type=pa.string()),
                                 "cnt": pa.array([], type=pa.int64())})
            d = flat.combine_chunks().dictionary_encode()
            cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                              minlength=len(d.dictionary)).astype(np.int64)
            return pa.table({"token": d.dictionary, "cnt": pa.array(cnt)})

        partials = ds.map_batches(full_count, batch_format="pyarrow",
                                  zero_copy_batch=True)
        exact = bucketed_apply(partials, ["token"], merge, num_buckets=num_buckets)
        return exact.map_batches(
            lambda t, b=bar: t.filter(pc.greater_equal(
                pc.cast(t["cnt"], pa.float64()), b)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    cand = mdf[(~mdf["token"].isin(["#TOTAL", "#SUB"])) & (mdf["cnt"] + slack >= bar)]
    if len(cand) > max_candidates:
        raise ValueError(
            f"heavy_hitters: {len(cand)} candidates exceed max_candidates="
            f"{max_candidates}; raise capacity (tighter sketch) or theta")
    logger.info("heavy_hitters: N=%d, slack=%d, %d candidates >= %.1f",
                total, slack, len(cand), bar)
    # broadcast the PREBUILT sorted Arrow array once — rebuilding it per
    # batch paid an O(C log C) sort on every pass-2 task
    cand_ref = ray.put(pa.array(sorted(cand["token"].tolist()), type=pa.string()))

    def exact_count(t: pa.Table) -> pa.Table:
        from ..state.worker_cache import cached_get

        cand_arr = cached_get(cand_ref)
        flat = pc.list_flatten(tokens_array(t[text_col]))
        mask = pc.is_in(flat, value_set=cand_arr)
        kept = flat.filter(mask)
        if len(kept) == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        d = kept.combine_chunks().dictionary_encode()
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary)).astype(np.int64)
        return pa.table({"token": d.dictionary, "cnt": pa.array(cnt)})

    partials = ds.map_batches(exact_count, batch_format="pyarrow", zero_copy_batch=True)
    exact = bucketed_apply(partials, ["token"], merge, num_buckets=num_buckets)
    return exact.map_batches(
        lambda t, b=bar: t.filter(pc.greater_equal(
            pc.cast(t["cnt"], pa.float64()), b)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def approx_grouped_quantiles(
    ds: Dataset,
    key_col: str,
    value_col: str,
    id_col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
    k: int = 4096,
    num_buckets: int = 16,
) -> Dataset:
    """Approximate per-key quantiles of a continuous column via DETERMINISTIC
    bottom-k sampling — the third mergeable sketch beside HLL (distinct) and
    Misra-Gries (frequency): ``curation.grouped_quantiles`` is exact but its
    exchange volume is the VALUE DOMAIN (right for discrete ints); for
    continuous doubles at 100 TB the histogram IS the data, and the engine
    answer is a fixed-size sample per key.

    Bottom-k by splitmix64(id) is a uniform sample of the key's rows that is
    exactly mergeable (bottom-k of a union == bottom-k of the parts' bottom-
    ks) and deterministic across runs, partitionings and cluster sizes — no
    RNG, no seed coordination. Rank error ~ O(1/sqrt(k)) (~1.6% at k=4096).
    Output: one row per (key, q) — (key_col, q, value)."""
    from .blocking import bucketed_apply
    from ..functions.hashing import hash_column

    def partial(t: pa.Table) -> pa.Table:
        key_t = t.schema.field(key_col).type
        if t.num_rows == 0:
            return pa.table({
                key_col: pa.array([], type=key_t),
                "__h": pa.array([], type=pa.uint64()),
                "__v": pa.array([], type=pa.float64()),
            })
        h = hash_column(t[id_col])
        kd = t[key_col].combine_chunks().dictionary_encode()
        codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        # per-key bottom-k: sort by (key, hash), keep first k of each key run
        order = np.lexsort((h, codes))
        c_s, h_s, v_s = codes[order], h[order], v[order]
        starts = np.ones(len(c_s), dtype=bool)
        starts[1:] = c_s[1:] != c_s[:-1]
        pos = np.arange(len(c_s)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(c_s)), 0))
        keep = pos < k
        return pa.table({
            key_col: kd.dictionary.take(pa.array(c_s[keep])),
            "__h": pa.array(h_s[keep], type=pa.uint64()),
            "__v": pa.array(v_s[keep]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in g.groupby(key_col, sort=True):
            sub = sub.nsmallest(k, "__h")
            vals = np.sort(sub["__v"].to_numpy())
            for q in qs:
                idx = min(int(np.ceil(q * len(vals))) - 1, len(vals) - 1)
                rows.append((key, float(q), float(vals[max(idx, 0)])))
        return pd.DataFrame(rows, columns=[key_col, "q", "value"])

    return bucketed_apply(parts, [key_col], merge, num_buckets=num_buckets)
