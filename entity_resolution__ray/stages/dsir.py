"""DSIR-style hashed n-gram importance weighting for data selection.

Implements the data-selection scheme of Xie et al. 2023 ("Data Selection for
Language Models via Importance Resampling"): documents are scored by how much
more likely their hashed n-gram features are under a small TARGET corpus
(e.g. a benchmark / high-quality seed set) than under the SOURCE corpus
being filtered; high scorers are kept / resampled.

  * features        — lowercase alnum unigrams + adjacent bigrams (the
    paper's hashed n-gram featurization), hashed into ``n_buckets`` via an
    md5-prefix bucket (exactly replicable in SQL — same arithmetic as
    curation.train_split).
  * bucket counts   — one vectorized pass per corpus: per-batch sparse
    partial counts (md5 touches only the DISTINCT features of a batch —
    vocabulary-bounded, the same discipline as the dedup gram store), then a
    tiny (bucket, count) shuffle; the final table is ≤ n_buckets rows.
  * log-ratio       — quantized to INTEGERS as
    ``floor(log2(ct+1)) - floor(log2(cs+1))`` per bucket. The published
    method uses real-valued ln ratios; the integer quantization (≈1-bit
    resolution) is deliberate so scores are EXACTLY reproducible across
    engines (IEEE ln differs by ulps between libms, and per-doc float sums
    are order-dependent — integer sums are not). Pass ``quantize=False``
    for the real-ln variant when cross-engine equality isn't required.
  * scoring         — the ≤ n_buckets λ table broadcasts once (``ray.put``);
    each batch re-extracts features, maps buckets → λ and bincount-sums per
    doc. Docs with no features score 0.

Scale shape: two feature passes over the corpus (count, score), two tiny
bounded shuffles, one broadcast — nothing quadratic, nothing driver-resident
beyond the n_buckets-sized tables.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def _feature_arrays(t: pa.Table, text_col: str) -> Tuple[np.ndarray, np.ndarray]:
    """(doc_index, feature_string) for every unigram + bigram occurrence."""
    texts = pc.fill_null(t[text_col].combine_chunks(), "")
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), pattern="[^a-z0-9]+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = flat != ""
    flat, doc = flat[keep], doc[keep]
    if len(flat) == 0:
        return doc, flat
    # bigrams: adjacent within the same doc (np.char = C-level concat)
    adj = doc[:-1] == doc[1:]
    if adj.any():
        lg = flat[:-1][adj].astype("U")
        rg = flat[1:][adj].astype("U")
        bi = np.char.add(np.char.add(lg, " "), rg).astype(object)
    else:
        bi = np.array([], dtype=object)
    return np.concatenate([doc, doc[:-1][adj]]), np.concatenate([flat, bi])


def _bucket_of(features: np.ndarray, n_buckets: int) -> np.ndarray:
    """md5-prefix bucket per feature — md5 runs once per DISTINCT feature."""
    codes, uniq = pd.factorize(features)
    ub = np.fromiter(
        (int(hashlib.md5(str(f).encode()).hexdigest()[:8], 16) % n_buckets for f in uniq),
        dtype=np.int64,
        count=len(uniq),
    )
    return ub[codes]


def bucket_counts(ds: Dataset, text_col: str = "text", n_buckets: int = 8191) -> np.ndarray:
    """Dense (n_buckets,) int64 occurrence counts of hashed features."""
    from .blocking import bucketed_apply

    def partial(t: pa.Table) -> pa.Table:
        _, feats = _feature_arrays(t, text_col)
        if len(feats) == 0:
            return pa.table({"b": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        b = _bucket_of(feats, n_buckets)
        cnt = np.bincount(b, minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"b": pa.array(nz), "c": pa.array(cnt[nz])})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # each batch emits ≤ n_buckets sketch rows; when n_buckets × input blocks
    # is driver-sized, summing the partials on the driver drops the shuffle
    # barrier entirely (the same sketch-to-driver shape as the Misra-Gries /
    # Lloyd reduces). Unknown or huge block counts keep the bucketed reduce.
    try:
        n_blocks = ds.num_blocks()
    except NotImplementedError:
        n_blocks = None
    out = np.zeros(n_buckets, dtype=np.int64)
    if n_blocks is not None and n_buckets * n_blocks <= 2_000_000:
        pdf = parts.to_pandas()
        if len(pdf):
            np.add.at(out, pdf["b"].to_numpy(), pdf["c"].to_numpy())
        return out
    tot = bucketed_apply(
        parts, ["b"],
        lambda df: df.groupby("b", sort=False, as_index=False)["c"].sum(),
        num_buckets=8,
    ).to_pandas()
    out[tot["b"].to_numpy()] = tot["c"].to_numpy()
    return out


def dsir_lambda(
    target_counts: np.ndarray, source_counts: np.ndarray, quantize: bool = True
) -> np.ndarray:
    """Per-bucket importance log-ratio of smoothed PROBABILITIES,
    λ(b) = log p_t(b) − log p_s(b) with p(b) = (c_b + 1)/(N + B) — the
    normalization constants matter (without them every score carries an
    O(doc-length) bias toward the larger corpus). Quantized mode computes
    the same expression from the four integer floor-log2 terms so it stays
    exactly SQL-replicable (module docstring)."""
    B = len(source_counts)
    nt = int(target_counts.sum()) + B
    ns = int(source_counts.sum()) + B
    if quantize:
        ql = lambda c: np.floor(np.log2(np.asarray(c, dtype=np.float64) + 1.0)).astype(np.int64)
        const = int(np.floor(np.log2(ns))) - int(np.floor(np.log2(nt)))
        return ql(target_counts) - ql(source_counts) + const
    return (
        np.log(target_counts + 1.0) - np.log(float(nt))
        - np.log(source_counts + 1.0) + np.log(float(ns))
    )


def dsir_scores(
    ds: Dataset,
    lam: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """(id, dsir_score) per document: Σ λ[bucket(f)] over feature occurrences."""
    n_buckets = len(lam)
    quantized = lam.dtype.kind in "iu"
    lref = ray.put(np.ascontiguousarray(lam))

    def score(t: pa.Table) -> pa.Table:
        from ..state.worker_cache import cached_get

        lam_ = cached_get(lref)
        doc, feats = _feature_arrays(t, text_col)
        n = t.num_rows
        if len(feats) == 0:
            s = np.zeros(n, dtype=np.int64 if quantized else np.float64)
        else:
            b = _bucket_of(feats, n_buckets)
            s = np.bincount(doc, weights=lam_[b].astype(np.float64), minlength=n)
            s = np.rint(s).astype(np.int64) if quantized else s
        return pa.table({id_col: t[id_col], "dsir_score": pa.array(s)})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def dsir_weights(
    source: Dataset,
    target: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8191,
    quantize: bool = True,
) -> Dataset:
    """End-to-end DSIR: count target + source buckets, build λ, score source."""
    ct = bucket_counts(target, text_col=text_col, n_buckets=n_buckets)
    cs = bucket_counts(source, text_col=text_col, n_buckets=n_buckets)
    lam = dsir_lambda(ct, cs, quantize=quantize)
    return dsir_scores(source, lam, text_col=text_col, id_col=id_col)
