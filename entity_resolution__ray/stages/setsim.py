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


def fit_shingle_df(ds: Dataset, text_col: str = "text", shingle: str = "word2",
                   min_df: int = 2, max_vocab: int = 1_000_000,
                   num_buckets: int = 64):
    """Distributed shingle document-frequency fit → broadcast-ready refs.

    One pass over the corpus: per-batch ``np.unique`` over the per-row-unique
    shingle hashes gives a partial (hash → #docs-in-batch) table; one bucketed
    shuffle sums partials exactly (same shape as the token-DF fit at
    ``blocking.fit_blocking_tfidf_distributed``). Tokens with df < ``min_df``
    are dropped (df=1 tokens cannot influence the ORDER of any collision —
    they appear in one doc), and the dictionary is truncated to the
    ``max_vocab`` highest-df entries (ties broken by hash) so the broadcast
    is bounded regardless of corpus size: the sort+limit costs O(vocab), not
    O(corpus), and the hot tokens the ordering exists to demote are by
    definition high-df, hence always retained.

    Returns ``(refs, key)``: Arrow block refs of (h:int64, df:int64) and a
    deterministic cache key for ``worker_cache.cached_build``.
    """
    from .dedup import _unique_per_row, shingle_hashes_batch

    def partial(t: pa.Table) -> pa.Table:
        gh, counts = shingle_hashes_batch(t[text_col], shingle)
        _, uh, _ = _unique_per_row(gh, counts)
        h, c = np.unique(uh, return_counts=True)
        return pa.table({
            "h": pa.array(h.view(np.int64), type=pa.int64()),
            "c": pa.array(c.astype(np.int64)),
        })

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return _vocab_refs(partials, min_df, max_vocab, num_buckets,
                       tag=f"{shingle}:{max_vocab}")


def fit_shingle_df_from_grams(grams_ds: Dataset, min_df: int = 2,
                              max_vocab: int = 1_000_000, num_buckets: int = 64):
    """DF fit over an already-materialized gram-set dataset (the
    (doc_id, grams: large_list<uint64>) layout of
    ``dedup.build_gram_set_refs``) — no text re-hashing: each row's grams are
    already unique, so a flat ``np.unique`` per batch IS the partial doc
    count. This is the fit :func:`set_similarity_join` uses, since it
    materializes gram refs for verification anyway."""

    def partial(t: pa.Table) -> pa.Table:
        col = t["grams"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.flatten().to_numpy(zero_copy_only=False)
        h, c = np.unique(v.view(np.uint64), return_counts=True)
        return pa.table({
            "h": pa.array(h.view(np.int64), type=pa.int64()),
            "c": pa.array(c.astype(np.int64)),
        })

    partials = grams_ds.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return _vocab_refs(partials, min_df, max_vocab, num_buckets, tag=str(max_vocab))


def _vocab_refs(partials: Dataset, min_df: int, max_vocab: int,
                num_buckets: int, tag: str):
    """(h, c) partials → exact bucketed DF sum → df ≥ min_df → top-max_vocab
    broadcast refs. The truncation sort runs ONLY when the vocabulary
    actually exceeds the cap (count on the materialized vocab is free) —
    typical corpora skip the extra barrier entirely."""
    from .blocking import bucketed_apply

    def sum_bucket(g: pa.Table) -> pa.Table:
        t = g.group_by("h").aggregate([("c", "sum")])
        t = t.filter(pc.greater_equal(t["c_sum"], min_df))
        return pa.table({"h": t["h"], "df": pc.cast(t["c_sum"], pa.int64())})

    vocab = bucketed_apply(partials, ["h"], sum_bucket, num_buckets=num_buckets,
                           batch_format="pyarrow").materialize()
    if vocab.count() > max_vocab:
        vocab = vocab.sort(["df", "h"], descending=[True, False]).limit(max_vocab)
    refs = vocab.to_arrow_refs()
    key = f"{refs[0].hex() if refs else 'empty'}:{len(refs)}:{tag}"
    return refs, key


def _df_lookup_from_refs(refs):
    """Worker-side decode of the broadcast DF dictionary → (sorted hashes,
    dfs aligned). ``.copy()`` moves buffers off plasma mmap (random-gather
    pattern — same rationale as ``dedup._gram_store_from_refs``)."""
    import ray

    # sort/limit emit empty blocks with EMPTY schemas — drop them before
    # concat (mixing schemas fails) and handle the all-empty vocabulary
    tbls = [t for t in ray.get(list(refs)) if t.num_rows and "h" in t.schema.names]
    if not tbls:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    tbl = pa.concat_tables(tbls).combine_chunks()
    h = tbl["h"].to_numpy(zero_copy_only=False).view(np.uint64)
    df = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    o = np.argsort(h, kind="stable")
    return h[o].copy(), df[o].copy()


class PrefixFilterKeys:
    """Batch fn: text → (band_key: uint64, doc_id) prefix-token rows.

    Each doc's shingle set is hashed once (``shingle_hashes_batch``) and
    deduped per row (``_unique_per_row``); the set is then ordered by the
    global total order — ``(df, hash)`` ascending when a DF dictionary from
    :func:`fit_shingle_df` is supplied (published PPJoin order), plain
    ascending hash otherwise — and the first ``prefix_lengths`` entries are
    emitted. ``ppos`` is the token's position in that order, which is what
    the positional filter's suffix bound needs."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 threshold: float = 0.4, shingle: str = "word2",
                 df_refs=None, df_key: str = ""):
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.shingle = shingle
        self.df_refs = df_refs
        self.df_key = df_key

    @staticmethod
    def _empty(id_type) -> pa.Table:
        # the key is opaque — reinterpret the uint64 hash as int64 (the
        # bucket hasher and Arrow dictionary-encode take signed ints)
        return pa.table({
            "band_key": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=id_type),
            "set_size": pa.array([], type=pa.int32()),
            "ppos": pa.array([], type=pa.int32()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _unique_per_row, shingle_hashes_batch

        id_arr = batch[self.id_col]
        if batch.num_rows == 0:
            return self._empty(id_arr.type)
        gh, counts = shingle_hashes_batch(batch[self.text_col], self.shingle)
        ur, uh, uc = _unique_per_row(gh, counts)
        return self._emit(id_arr, ur, uh, uc)

    def from_grams(self, batch: pa.Table) -> pa.Table:
        """Same emission over the (doc_id, grams) gram-set layout — each
        row's grams are already unique and hash-sorted, so no text pass."""
        id_arr = batch[self.id_col]
        if batch.num_rows == 0:
            return self._empty(id_arr.type)
        col = batch["grams"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        uh = col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
        uc = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        ur = np.repeat(np.arange(len(uc), dtype=np.int64), uc)
        return self._emit(id_arr, ur, uh, uc)

    def _emit(self, id_arr, ur: np.ndarray, uh: np.ndarray, uc: np.ndarray) -> pa.Table:
        if len(ur) == 0:
            return self._empty(id_arr.type)
        if self.df_refs is not None:
            from ..state.worker_cache import cached_build

            hs, dfs = cached_build(
                f"shingledf:{self.df_key}",
                lambda: _df_lookup_from_refs(self.df_refs),
            )
            if len(hs):
                idx = np.minimum(np.searchsorted(hs, uh), len(hs) - 1)
                found = hs[idx] == uh
                dfv = np.where(found, dfs[idx], 1)
            else:
                dfv = np.ones(len(uh), dtype=np.int64)
            # reorder WITHIN each row by (df asc, hash asc); rows stay
            # contiguous (ur is the primary lexsort key and already grouped)
            order = np.lexsort((uh, dfv, ur))
            uh = uh[order]
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
    order: str = "df",
    max_vocab: int = 1_000_000,
) -> Dataset:
    """All (id_left, id_right, jaccard) pairs with shingle-set Jaccard ≥
    ``threshold`` (id_left < id_right), EXACT — prefix-filter candidates
    (complete by construction) verified against the broadcast pre-hashed
    gram store. ``jaccard`` is rounded to 4 decimals for stable comparison.

    The corpus is shingle-hashed exactly ONCE (``build_gram_set_refs``); the
    prefix keyer, the DF fit, and the verifier all run over those
    materialized gram-set blocks. ``order="df"`` (default) orders prefixes by
    ascending document frequency — the published PPJoin order, fitted by one
    cheap pass over the uint64 gram lists; ``order="hash"`` skips the fit
    (module docstring discusses the trade).

    Broadcast-path verification only: the gram store must fit the object
    store. Beyond that regime, swap the verifier for the distributed join
    attach used by ``dedup.near_dup_clusters(attach_mode="join")`` — the
    candidate generator is unchanged."""
    import ray.data as rd

    from .dedup import GramSetVerify, build_gram_set_refs

    refs = build_gram_set_refs(ds, text_col=text_col, id_col=id_col, shingle=shingle)
    key = f"{refs[0].hex() if refs else 'empty'}:{len(refs)}:{shingle}"
    grams_ds = rd.from_arrow_refs(list(refs))

    df_refs, df_key = (None, "")
    if order == "df":
        df_refs, df_key = fit_shingle_df_from_grams(
            grams_ds, max_vocab=max_vocab, num_buckets=num_buckets
        )
    elif order != "hash":
        raise ValueError(f"order must be 'df' or 'hash', got {order!r}")

    keyer = PrefixFilterKeys(text_col=text_col, id_col=id_col,
                             threshold=threshold, shingle=shingle,
                             df_refs=df_refs, df_key=df_key)
    keys = grams_ds.map_batches(lambda t, k=keyer: k.from_grams(t),
                                batch_format="pyarrow", zero_copy_batch=True)
    cands = _candidates_from_prefix_groups(keys, threshold, num_buckets=num_buckets)

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
