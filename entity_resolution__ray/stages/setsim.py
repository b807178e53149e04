"""Exact set-similarity self-join via prefix filtering (PPJoin-family).

Beyond the reference (its blocking is TF-IDF-kNN, approximate by design —
``src/blocking.py``): this operator returns EVERY pair of records whose
token-shingle sets have Jaccard ≥ t, with no LSH recall caveat. It is the
exact-join counterpart to ``dedup.minhash_lsh_candidates`` and shares its
verify machinery (``build_gram_set_refs`` / ``GramSetVerify``).

Algorithm (Chaudhuri et al. SSJoin / Xiao et al. PPJoin, public literature):
impose a GLOBAL total order on tokens; a pair with Jaccard ≥ t over sets A, B
must share at least one token among the first ``|X| - ceil(t*|X|) + 1``
tokens of each side's ordered set (prefix-filter theorem, proof sketch in
:func:`prefix_lengths`). So blocking on prefix tokens only is COMPLETE: every
qualifying pair collides in at least one prefix-token group.

Global order (``order=``): the published PPJoin order (Xiao et al.) is
ascending DOCUMENT FREQUENCY — prefixes then consist of each set's rarest
tokens, so prefix-token groups are maximally small and candidate volume
collapses on skewed vocabularies. ``order="df"`` (default) implements it
distributed: one partial-DF pass over the corpus (per-batch ``np.unique``
partials → one bucketed sum — the same shape as ``blocking.py``'s token-DF
fit), truncated to the ``max_vocab`` most frequent tokens, broadcast once via
``ray.put`` blocks and looked up per batch with a binary search; every token
outside the dictionary gets df=1. The composite key ``(df, hash64)`` is a
total order that is CONSISTENT across all docs, which is the only property
completeness needs — truncation degrades candidate-count optimality
gracefully, never correctness, and bounds the broadcast at 100 TB (12 bytes ×
max_vocab regardless of corpus size; only tokens with df ≥ 2 matter, and the
hot tokens the ordering exists to demote are by definition high-df, so they
are always retained). ``order="hash"`` keeps the zero-state pseudo-random
proxy (one fewer corpus pass; more candidates on skewed vocabularies, never
missed pairs).

Scale shape: one map over docs emits ≤ prefix-length rows per doc (key is a
uint64, no strings), one hash shuffle groups equal prefix tokens, pair
emission is the bucket-level vectorized triu (no per-key loop), a second
bucketed shuffle dedups pairs proposed by multiple prefix tokens BEFORE any
verification work, and verification gathers pre-hashed shingle sets from the
broadcast gram store (one hash pass over the corpus total, not per pair).
Skew caveat (documented, logged): completeness requires full triu emission
per token group, so a token shared by k prefixes costs O(k²) candidates —
unlike LSH dedup there is no star-cap escape that preserves JOIN semantics.
``order="df"`` is the structural fix (hot tokens leave the prefixes); if a
group is still hot, raise ``threshold`` (shorter prefixes) or pre-filter
boilerplate (``curation.remove_boilerplate``).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

logger = logging.getLogger(__name__)


def prefix_lengths(set_sizes: np.ndarray, threshold: float) -> np.ndarray:
    """Per-record prefix length ``p = n - ceil(t*n) + 1`` (0 for empty sets).

    Completeness: Jaccard(A,B) ≥ t implies |A∩B| ≥ t·|A∪B| ≥ ⌈t·max(|A|,|B|)⌉
    =: α. If the length-(|A|-α+1) prefixes of A and B (under one global total
    order) were disjoint, each side could contribute at most α-1 common
    tokens from its suffix — contradiction with |A∩B| ≥ α. Since
    p(X) = |X| - ⌈t·|X|⌉ + 1 ≥ |X| - α + 1, these (longer) prefixes must
    share a token too.
    """
    n = set_sizes.astype(np.int64)
    # epsilon guards the float ceil in the SAFE direction: IEEE can round
    # t*n a hair ABOVE the exact rational (e.g. 0.55*100 = 55.000000000000007
    # → ceil 56, exact 55), which would shorten the prefix below the
    # completeness bound and silently miss qualifying pairs. Underestimating
    # α only lengthens prefixes (a few extra candidates, never a miss).
    p = n - _safe_ceil(threshold * n) + 1
    return np.where(n > 0, np.maximum(p, 1), 0)


def _safe_ceil(x: np.ndarray) -> np.ndarray:
    """ceil that never exceeds the exact rational ceil despite float error
    (subtract 1e-9 first; exact integers are unaffected since
    ceil(k - 1e-9) = k). Used everywhere a TOO-LARGE ceil would break the
    prefix/positional filters' completeness proofs."""
    return np.ceil(np.asarray(x, dtype=np.float64) - 1e-9).astype(np.int64)


class PrefixFilterKeys:
    """Batch fn: text → (band_key: uint64, doc_id) prefix-token rows.

    Each doc's shingle set is hashed once (``shingle_hashes_batch``), deduped
    and sorted ascending per row (``_unique_per_row`` — ascending hash IS the
    global order), and the first ``prefix_lengths`` entries are emitted."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 threshold: float = 0.4, shingle: str = "word2"):
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.shingle = shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _unique_per_row, shingle_hashes_batch

        id_arr = batch[self.id_col]
        id_type = id_arr.type if not isinstance(id_arr, pa.ChunkedArray) else id_arr.type
        # the key is opaque — reinterpret the uint64 hash as int64 (the
        # bucket hasher and Arrow dictionary-encode take signed ints)
        empty = pa.table({
            "band_key": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=id_type),
            "set_size": pa.array([], type=pa.int32()),
            "ppos": pa.array([], type=pa.int32()),
        })
        if batch.num_rows == 0:
            return empty
        gh, counts = shingle_hashes_batch(batch[self.text_col], self.shingle)
        ur, uh, uc = _unique_per_row(gh, counts)
        if len(ur) == 0:
            return empty
        p = prefix_lengths(uc, self.threshold)
        starts = np.cumsum(uc) - uc
        pos = np.arange(len(ur), dtype=np.int64) - np.repeat(starts[uc > 0], uc[uc > 0])
        keep = pos < np.repeat(p[uc > 0], uc[uc > 0])
        # set_size + ppos ride with every prefix row so the bucket emitter can
        # apply the PPJoin length + positional prunes without a second lookup
        return pa.table({
            "band_key": pa.array(uh[keep].view(np.int64), type=pa.int64()),
            "doc_id": pc.take(id_arr, pa.array(ur[keep])),
            "set_size": pa.array(np.repeat(uc[uc > 0], uc[uc > 0])[keep].astype(np.int32)),
            "ppos": pa.array(pos[keep].astype(np.int32)),
        })


def _candidates_from_prefix_groups(
    keys: Dataset, threshold: float, num_buckets: int = 64, warn_group_size: int = 4096
) -> Dataset:
    """Prefix-token groups → canonical deduped candidate pairs, pruned by the
    PPJoin length + positional filters (both COMPLETE):

    * length: J(A,B) ≥ t needs |A∩B| ≥ t·max(|A|,|B|) and |A∩B| ≤ min(|A|,|B|),
      so min < ⌈t·max⌉ cannot qualify — safe to prune at EVERY collision.
    * positional (suffix bound): at the FIRST common prefix token w (0-indexed
      position i in A, j in B) the overlap is ≤ 1 + min(|A|-i-1, |B|-j-1);
      J ≥ t needs overlap ≥ α = ⌈t/(1+t)·(|A|+|B|)⌉ (the equivalent-overlap
      form of Jaccard). Applying the bound uniformly at every collision is
      still complete: a qualifying pair survives at its first-collision
      bucket (where the bound is valid), and candidate dedup keeps a pair if
      ANY bucket emits it — over-pruning at later collisions cannot lose it.

    Full (masked) triu per group — join semantics need every qualifying pair,
    no star cap; groups above ``warn_group_size`` are emitted anyway but
    logged as skew."""
    from .blocking import (bucketed_apply, group_bounds,
                           key_sorted_dedup_arrow, triu_pairs_by_size)

    def emit_bucket(g: pa.Table) -> pa.Table:
        id_type = g.schema.field("doc_id").type
        empty = pa.table(
            {"id_left": pa.array([], type=id_type), "id_right": pa.array([], type=id_type)}
        )
        if g.num_rows == 0:
            return empty
        kc, ids_np, take_idx, _ = key_sorted_dedup_arrow(g, "band_key", "doc_id")
        nsz = g["set_size"].combine_chunks().to_numpy(zero_copy_only=False)[take_idx]
        ppos = g["ppos"].combine_chunks().to_numpy(zero_copy_only=False)[take_idx]
        starts, sizes = group_bounds(kc, len(kc))
        big = sizes[sizes > warn_group_size]
        if len(big):
            logger.warning(
                "setsim: %d prefix-token groups over %d docs (max %d) — "
                "O(k²) emission required for join completeness; consider a "
                "higher threshold or boilerplate pre-filtering",
                len(big), warn_group_size, int(big.max()),
            )
        il, ir = triu_pairs_by_size(starts, sizes, np.ones(len(starts), dtype=bool))
        if len(il) == 0:
            return empty
        nl = nsz[il].astype(np.int64)
        nr = nsz[ir].astype(np.int64)
        mn = np.minimum(nl, nr)
        mx = np.maximum(nl, nr)
        keep = mn >= _safe_ceil(threshold * mx)
        alpha = _safe_ceil(threshold / (1.0 + threshold) * (nl + nr))
        ubound = 1 + np.minimum(nl - ppos[il] - 1, nr - ppos[ir] - 1)
        keep &= ubound >= alpha
        il, ir = il[keep], ir[keep]
        if len(il) == 0:
            return empty
        return pa.table(
            {"id_left": pa.array(ids_np[il], type=id_type),
             "id_right": pa.array(ids_np[ir], type=id_type)}
        )

    pairs = bucketed_apply(keys, ["band_key"], emit_bucket, num_buckets=num_buckets,
                           repartition=False, batch_format="pyarrow")
    # a qualifying pair collides in MANY prefix tokens — dedup before the
    # (gather + row-sort per pair) verification work, not after
    return bucketed_apply(
        pairs, ["id_left", "id_right"],
        lambda g: g.group_by(["id_left", "id_right"]).aggregate([]),
        num_buckets=num_buckets, batch_format="pyarrow",
    )


def set_similarity_join(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.4,
    shingle: str = "word2",
    num_buckets: int = 64,
) -> Dataset:
    """All (id_left, id_right, jaccard) pairs with shingle-set Jaccard ≥
    ``threshold`` (id_left < id_right), EXACT — prefix-filter candidates
    (complete by construction) verified against the broadcast pre-hashed
    gram store. ``jaccard`` is rounded to 4 decimals for stable comparison.

    Broadcast-path verification only: the gram store must fit the object
    store. Beyond that regime, swap the verifier for the distributed join
    attach used by ``dedup.near_dup_clusters(attach_mode="join")`` — the
    candidate generator is unchanged."""
    from .dedup import GramSetVerify, build_gram_set_refs

    keyer = PrefixFilterKeys(text_col=text_col, id_col=id_col,
                             threshold=threshold, shingle=shingle)
    keys = ds.map_batches(lambda t, k=keyer: k(t), batch_format="pyarrow",
                          zero_copy_batch=True)
    cands = _candidates_from_prefix_groups(keys, threshold, num_buckets=num_buckets)

    refs = build_gram_set_refs(ds, text_col=text_col, id_col=id_col, shingle=shingle)
    key = f"{refs[0].hex() if refs else 'empty'}:{len(refs)}:{shingle}"
    verifier = GramSetVerify(refs, key)

    def verify(t: pa.Table) -> pa.Table:
        out = verifier(t)
        out = out.filter(pc.greater_equal(out["jaccard"], threshold))
        return out.set_column(
            out.schema.get_field_index("jaccard"), "jaccard",
            # half_towards_infinity = DuckDB round() semantics (Arrow's
            # default half_to_even would diverge on exact .00005 halves)
            pc.round(out["jaccard"], ndigits=4, round_mode="half_towards_infinity"),
        )

    return cands.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
