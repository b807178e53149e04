"""Constraint filtering over scored edges (M8 + C1 + C2 + C3).

Reference analogues:
  * probability threshold — apply_constraints.py:40 (min_prob=0.45 at :79)
  * geo-mismatch prune — geo_constraints.py:112-152: prune iff BOTH sides
    mention ≥1 whitelisted country AND the sets are disjoint (conservative
    when either side is unknown, :143-145)
  * token-overlap prune — token_overlap_constraint.py:16-70: stopword-aware
    Jaccard < 0.20 prunes, but NEVER when stopword removal empties a side
  * composition + kept/dropped side outputs + stats — apply_constraints.py:15-67

Engine shape: instead of building driver-side prune *dicts* keyed by pair (the
reference's O(pairs) driver memory), each constraint is a vectorized
``map_batches`` verdict over the edge stream — edges gain ``keep`` +
``drop_reason`` columns; kept/dropped splits are cheap filters (run off a
Parquet checkpoint so the stream isn't recomputed twice). Countries are looked
up from the per-doc ``countries`` column (M6 — computed once per doc, not per
pair like the reference's geo_constraints.py:137-141).
"""

from __future__ import annotations

from typing import Optional, Set, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

DEFAULT_MIN_PROB = 0.45  # apply_constraints.py:79
TOKEN_OVERLAP_MIN_JACCARD = 0.20  # token_overlap_constraint.py:27


def threshold_filter(edges: Dataset, min_prob: float = DEFAULT_MIN_PROB) -> Dataset:
    """Keep edges with prob_match >= min_prob (M8)."""
    return edges.map_batches(
        lambda t, mp=min_prob: t.filter(pc.greater_equal(t["prob_match"], mp)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def drop_self_pairs(edges: Dataset) -> Dataset:
    """M9 — self-pairs are impossible for canonical pairs but kept as an
    explicit guard (run_blocking.py:51-52)."""
    return edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["id_left"], t["id_right"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _country_masks(a: pa.Array, b: pa.Array):
    """Per-row country bitmask matrices (n, n_words) uint64 for two
    list<string> columns over their joint batch-local vocabulary. Multi-word
    so any vocabulary size is exact; the whitelist is ≤ 20, so n_words == 1
    in practice and disjointness is one AND over the batch."""
    import pandas as pd

    n = len(a)
    la = pc.fill_null(pc.list_value_length(a), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    lb = pc.fill_null(pc.list_value_length(b), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    fa = pc.list_flatten(a).to_numpy(zero_copy_only=False)
    fb = pc.list_flatten(b).to_numpy(zero_copy_only=False)
    codes_all, vocab = pd.factorize(np.concatenate([fa, fb]))
    ca, cb = codes_all[: len(fa)], codes_all[len(fa):]
    n_words = max(1, (len(vocab) + 63) // 64)

    def build(lengths, codes):
        M = np.zeros((n, n_words), dtype=np.uint64)
        if len(codes):
            rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
            # null list elements factorize to -1 and would scatter a phantom
            # bit into word -1 / bit 63, making two null-bearing rows share a
            # fake country — drop them before the scatter
            valid = codes >= 0
            if not valid.all():
                rows, codes = rows[valid], codes[valid]
            np.bitwise_or.at(
                M, (rows, codes // 64), np.uint64(1) << (codes % 64).astype(np.uint64)
            )
        return M

    return build(la, ca), build(lb, cb)


def _token_jaccard_batch(a_col, b_col, stopwords: Set[str]):
    """Stopword-aware token-set Jaccard per row, fully vectorized and
    Arrow-native (split/flatten/is_in in Arrow kernels, token vocabulary via
    dictionary_encode — token strings are never materialized as Python
    objects; the old path round-tripped both text columns through pandas).
    Explode → joint encode → per-row dedup → merged-stream intersection (the
    same two-lexsort kernel as dedup.JaccardVerify). Returns
    (jaccard, |A|, |B|); jaccard is 0 where either side is empty (callers
    never prune those — token_overlap_constraint.py:63-65)."""
    n = len(a_col)
    stop_arr = pa.array(sorted(stopwords), type=pa.string()) if stopwords else None

    def toks_of(col):
        s = pc.fill_null(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, ""
        )
        lst = pc.split_pattern(s, " ")
        lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lst)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pc.not_equal(flat, "")
        if stop_arr is not None:
            keep = pc.and_(keep, pc.invert(pc.is_in(flat, value_set=stop_arr)))
        keep_np = keep.to_numpy(zero_copy_only=False)
        return rows[keep_np], flat.filter(keep)

    ra, va = toks_of(a_col)
    rb, vb = toks_of(b_col)
    joint = pa.concat_arrays([va, vb]).dictionary_encode()
    codes_all = joint.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    V = int(codes_all.max()) + 1 if len(codes_all) else 1
    ca = codes_all[: len(va)]
    cb = codes_all[len(va):]

    def dedupe(rows, codes):
        if len(rows) == 0:
            return rows, codes
        combo = np.unique(rows * V + codes)
        return combo // V, combo % V

    ura, uca = dedupe(ra, ca)
    urb, ucb = dedupe(rb, cb)
    na = np.bincount(ura, minlength=n).astype(np.int64)
    nb = np.bincount(urb, minlength=n).astype(np.int64)
    rows_all = np.concatenate([ura, urb])
    code_all = np.concatenate([uca, ucb])
    order = np.lexsort((code_all, rows_all))
    r_s, c_s = rows_all[order], code_all[order]
    dup = np.zeros(len(order), dtype=bool)
    dup[1:] = (r_s[1:] == r_s[:-1]) & (c_s[1:] == c_s[:-1])
    inter = np.bincount(r_s[dup], minlength=n).astype(np.float64)
    union = na + nb - inter
    jac = np.where((na > 0) & (nb > 0), inter / np.maximum(union, 1.0), 0.0)
    return jac, na, nb


class ConstraintVerdict:
    """Batch fn: edges with side columns → + keep:bool, drop_reason:string.

    Expects columns src_countries/cand_countries (geo) and/or
    src_text/cand_text (token overlap) to be attached (stages.joins).
    Runs on EVERY scored edge, so both constraints are Arrow/numpy-vectorized;
    reason strings are materialized only for the (few) dropped rows."""

    def __init__(
        self,
        use_geo: bool = True,
        use_token_overlap: bool = False,
        stopwords: Optional[Set[str]] = None,
        min_jaccard: float = TOKEN_OVERLAP_MIN_JACCARD,
    ):
        self.use_geo = use_geo
        self.use_token_overlap = use_token_overlap
        self.stopwords = stopwords or set()
        self.min_jaccard = min_jaccard

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keep = np.ones(n, dtype=bool)
        reason = np.full(n, "", dtype=object)

        if self.use_geo and n:
            a = batch["src_countries"].combine_chunks()
            b = batch["cand_countries"].combine_chunks()
            Ma, Mb = _country_masks(a, b)
            # conservative when either side unknown (geo_constraints.py:143-145)
            drop = Ma.any(axis=1) & Mb.any(axis=1) & ~(Ma & Mb).any(axis=1)
            if drop.any():
                keep[drop] = False
                idx = np.nonzero(drop)[0]
                ca_list = pc.take(a, pa.array(idx)).to_pylist()
                cb_list = pc.take(b, pa.array(idx)).to_pylist()
                for i, ca, cb in zip(idx, ca_list, cb_list):
                    # null list elements carry no geo signal (mirrors the
                    # codes>=0 filter in _country_masks)
                    sa = sorted({c for c in (ca or ()) if c is not None})
                    sb = sorted({c for c in (cb or ()) if c is not None})
                    reason[i] = f"geo_mismatch:{';'.join(sa)}|{';'.join(sb)}"

        if self.use_token_overlap and n:
            jac, na, nb = _token_jaccard_batch(
                batch["src_text"], batch["cand_text"], self.stopwords
            )
            # never prune when a side empties out (token_overlap_constraint.py:63-65)
            drop = keep & (na > 0) & (nb > 0) & (jac < self.min_jaccard)
            keep[drop] = False
            reason[drop] = f"token_overlap<{self.min_jaccard:.2f}"

        return batch.append_column("keep", pa.array(keep)).append_column(
            "drop_reason", pa.array(reason, type=pa.string())
        )


def apply_constraints(
    edges_with_sides: Dataset,
    min_prob: float = DEFAULT_MIN_PROB,
    use_geo: bool = True,
    use_token_overlap: bool = False,
    stopwords: Optional[Set[str]] = None,
    min_jaccard: float = TOKEN_OVERLAP_MIN_JACCARD,
) -> Dataset:
    """Threshold + constraint verdicts (C3). Returns the stream with
    keep/drop_reason columns; use :func:`split_kept_dropped` on a checkpointed
    copy for the two side outputs."""
    thresholded = threshold_filter(edges_with_sides, min_prob)
    verdict = ConstraintVerdict(
        use_geo=use_geo, use_token_overlap=use_token_overlap,
        stopwords=stopwords, min_jaccard=min_jaccard,
    )

    def apply_verdict(batch: pa.Table) -> pa.Table:
        return verdict(batch)

    return thresholded.map_batches(apply_verdict, batch_format="pyarrow", zero_copy_batch=True)


def split_kept_dropped(verdict_ds: Dataset) -> Tuple[Dataset, Dataset]:
    """kept rows / dropped rows (apply_constraints.py:59-65 side outputs)."""
    kept = verdict_ds.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], True)), batch_format="pyarrow", zero_copy_batch=True
    )
    dropped = verdict_ds.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], False)), batch_format="pyarrow", zero_copy_batch=True
    )
    return kept, dropped
