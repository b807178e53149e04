"""Exact substring deduplication: find document pairs sharing a long exact
byte run (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" — the ExactSubstr criterion, here at window granularity over a
document table rather than a global suffix array, which does not distribute).

  * window_fingerprints — every length-``window`` byte window of every doc,
    as a 64-bit polynomial rolling hash. Fully vectorized from the Arrow
    string buffers (zero copy: the batch's concatenated UTF-8 bytes + int64
    offsets), one cumprod/cumsum pass per batch — no per-row or per-window
    Python. With ``mod_p > 1`` only windows whose hash ≡ 0 (mod p) are
    emitted — CONTENT-DEFINED sampling, so a run shared by two docs selects
    the SAME windows in both (unlike stride sampling, which loses the
    guarantee to alignment): a shared run containing m windows survives with
    p(miss) = (1-1/p)^m, and the emitted volume drops to total_bytes/p — the
    10^12-doc knob.
  * substring_dup_pairs — distinct (id_left, id_right) doc pairs sharing at
    least one emitted window, via the same capped bucket-group pair emission
    as the LSH dedup (giant groups — boilerplate windows — fall back to star
    spokes with a logged count; exact triu otherwise).

Hash collisions (64-bit, content-defined) can in principle create a false
pair at ~n²/2⁶⁴ odds — the same class of accepted risk as the md5 devices
elsewhere in the engine; the sf-scale oracle compares against true substring
equality and passes. Windows are BYTE-indexed (the Arrow buffer); for ASCII
corpora (the test tables) byte and character windows coincide.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

logger = logging.getLogger(__name__)

from ..functions.arrays import excl_cumsum

_B = np.uint64(1099511628211)  # FNV-64 prime (odd → invertible mod 2^64)
_BINV = np.uint64(pow(1099511628211, -1, 2**64))


def _utf8_buffers(col) -> Tuple[np.ndarray, np.ndarray]:
    """(bytes, int64 offsets) of a string column, zero-copy from Arrow."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.cast(pc.fill_null(arr, ""), pa.large_string())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.empty(0, np.uint8)
    )
    return data, off


def _window_hashes(data: np.ndarray, off: np.ndarray, window: int) -> Tuple[np.ndarray, np.ndarray]:
    """(doc_index, uint64 hash) for every in-doc window start. One cumsum +
    two cumprods over the batch's byte buffer; H(i) = Σ c[i+k]·B^(w-1-k)
    computed as (S[i+w]-S[i])·B^(i+w-1) with S[t] = Σ_{u<t} c[u]·B^{-u}
    (all arithmetic wraps mod 2^64)."""
    n = len(data)
    doc_len = np.diff(off)
    m = np.maximum(doc_len - window + 1, 0)  # windows per doc
    total = int(m.sum())
    if total == 0 or n < window:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    c = data.astype(np.uint64)
    with np.errstate(over="ignore"):
        pwinv = np.concatenate([[np.uint64(1)], np.cumprod(np.full(n - 1, _BINV, np.uint64))])
        pwb = np.concatenate([[np.uint64(1)], np.cumprod(np.full(n - 1, _B, np.uint64))])
        S = np.concatenate([[np.uint64(0)], np.cumsum(c * pwinv)])
        doc_idx = np.repeat(np.arange(len(m), dtype=np.int64), m)
        starts = (
            np.arange(total, dtype=np.int64)
            - np.repeat(excl_cumsum(m), m)
            + np.repeat(off[:-1], m)
        )
        h = (S[starts + window] - S[starts]) * pwb[starts + window - 1]
    return doc_idx, h


def window_fingerprints(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    mod_p: int = 1,
) -> Dataset:
    """(band_key, doc_id) — the distinct window hashes of every doc."""
    if window < 2:
        raise ValueError("window must be >= 2")
    if mod_p < 1:
        raise ValueError("mod_p must be >= 1")

    def emit(t: pa.Table) -> pa.Table:
        data, off = _utf8_buffers(t[text_col])
        doc_idx, h = _window_hashes(data, off, window)
        if mod_p > 1 and len(h):
            keep = h % np.uint64(mod_p) == 0
            doc_idx, h = doc_idx[keep], h[keep]
        if len(h) == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             id_col: pa.array([], t.schema.field(id_col).type)})
        hi = h.view(np.int64)
        order = np.lexsort((hi, doc_idx))
        doc_idx, hi = doc_idx[order], hi[order]
        first = np.ones(len(hi), dtype=bool)
        first[1:] = (doc_idx[1:] != doc_idx[:-1]) | (hi[1:] != hi[:-1])
        return pa.table({
            "band_key": pa.array(hi[first]),
            id_col: t[id_col].combine_chunks().take(pa.array(doc_idx[first])),
        })

    return ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def probe_window_group_stats(keys: Dataset, sample_mod: int = 64) -> dict:
    """Estimate the window-group size distribution from a 1/``sample_mod``
    CONTENT-DEFINED sample of groups (``band_key & (sample_mod-1) == 0`` —
    whole groups are kept or dropped together, so sampled group sizes are
    exact, and the hash is uniform so the sample is unbiased over groups).
    Per-bucket partial stats reduce to one tiny driver-side row set: the
    driver never sees per-group data. Returns extrapolated
    ``{est_rows, est_pairs, max_group_size, sampled_groups}``.

    ``sample_mod`` must be a power of two (bit-mask sampling keeps the int64
    view of the uint64 hash sign-safe)."""
    if sample_mod & (sample_mod - 1):
        raise ValueError("sample_mod must be a power of two")
    from .blocking import bucketed_apply

    sampled = keys.map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t["band_key"], sample_mod - 1), 0)
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def bucket_stats(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64()),
                             "pairs": pa.array([], pa.int64()),
                             "max_size": pa.array([], pa.int64()),
                             "groups": pa.array([], pa.int64())})
        sizes = g.group_by("band_key").aggregate([("band_key", "count")])[
            "band_key_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "rows": pa.array([int(sizes.sum())]),
            "pairs": pa.array([int((sizes * (sizes - 1) // 2).sum())]),
            "max_size": pa.array([int(sizes.max())]),
            "groups": pa.array([len(sizes)]),
        })

    parts = bucketed_apply(sampled, ["band_key"], bucket_stats, num_buckets=32,
                           batch_format="pyarrow").take_all()
    rows = sum(p["rows"] for p in parts)
    pairs = sum(p["pairs"] for p in parts)
    return {
        "est_rows": rows * sample_mod,
        "est_pairs": pairs * sample_mod,
        "max_group_size": max((p["max_size"] for p in parts), default=0),
        "sampled_groups": sum(p["groups"] for p in parts),
    }


def substring_dup_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    mod_p: int = 1,
    max_group_size: Optional[int | str] = None,
    auto_star_cap: int = 16,
    auto_pair_factor: float = 8.0,
) -> Dataset:
    """Distinct doc pairs sharing ≥1 emitted window (module docstring).

    ``max_group_size=None`` (default) emits the FULL pair set — the stated
    contract. An integer caps boilerplate window groups to star spokes
    (min-id hub), which preserves group CONNECTIVITY — equivalent for
    CC-based dedup downstream, but an incomplete pair listing; unlike the
    LSH dedup there is no other band to recover dropped pairs, so the cap
    never engages silently in pairs mode. On dup-dense corpora it is the
    difference between exchange-bound and compute-bound (measured 11× at
    200k docs — BASELINE.md).

    ``max_group_size="auto"`` runs :func:`probe_window_group_stats` on the
    (materialized-once) fingerprint table and applies ``auto_star_cap`` only
    when the estimated full-triu pair volume exceeds ``auto_pair_factor`` ×
    the key rows — i.e. when the output would be exchange-bound, the
    dup-dense regime. The decision and estimated drop are logged; corpora
    with ordinary group-size distributions (every oracle fixture) take the
    exact full-triu path unchanged. This is the mode
    :func:`substring_dup_clusters` defaults to, where capping is
    semantics-EXACT (connectivity preserved)."""
    from .dedup import _pairs_from_band_groups

    keys = window_fingerprints(
        ds, text_col=text_col, id_col=id_col, window=window, mod_p=mod_p
    )
    if id_col != "doc_id":
        keys = keys.map_batches(
            lambda t: t.rename_columns(["band_key", "doc_id"]), batch_format="pyarrow"
        )
    if max_group_size == "auto":
        keys = keys.materialize()  # probe + pair emission: one execution
        stats = probe_window_group_stats(keys)
        dense = stats["est_pairs"] > auto_pair_factor * max(stats["est_rows"], 1)
        logger.info(
            "substring dedup probe: est %d pairs / %d key rows (max sampled "
            "group %d) -> %s",
            stats["est_pairs"], stats["est_rows"], stats["max_group_size"],
            f"star cap {auto_star_cap}" if dense else "full triu",
        )
        max_group_size = auto_star_cap if dense else None
    if max_group_size is None:
        max_group_size = 2**62  # never trips — full triu
    return _pairs_from_band_groups(keys, max_group_size=max_group_size)


def substring_dup_clusters(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    mod_p: int = 1,
    max_group_size: Optional[int | str] = "auto",
    num_partitions: int = 8,
) -> Dataset:
    """(doc_id, dup_group) for docs sharing an exact window run, dup_group =
    min doc id of the connected component. The downstream CC makes the star
    cap EXACT here (spokes preserve group connectivity, and components are
    all CC consumes), so ``max_group_size="auto"`` is the default: dup-dense
    corpora are capped by the probe, ordinary corpora run full triu — both
    yield identical components."""
    from .dedup import pairs_to_dup_groups
    from .joins import _arrow_schema

    pairs = substring_dup_pairs(
        ds, text_col=text_col, id_col=id_col, window=window, mod_p=mod_p,
        max_group_size=max_group_size,
    )
    id_type = _arrow_schema(ds).field(id_col).type
    return pairs_to_dup_groups(pairs, id_type, num_partitions=num_partitions)
