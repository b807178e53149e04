"""Blocking: key generation + candidate-pair emission (the reference's TF-IDF
brute-kNN blocking re-expressed for scale).

Reference analogues:
  * T3/T4 — TF-IDF + brute cosine kNN over the whole corpus
    (/root/reference/scripts/run_blocking.py:14-37). O(N²) with the full
    matrix on one node; kept here only as ``knn_block_conformance`` for
    small-scale parity checks.
  * J2 — candidate generation (run_blocking.py:42-56)
  * A1/O2 — undirected collapse keep-max (run_blocking.py:59-67)
  * M10 — canonical min/max pair key (make_candidate_pairs.py:38-43)

Scale path (per BASELINE.json north_star): *standard* (token) and *q-gram
MinHash* blocking keys computed in ``map_batches`` over Arrow batches; candidate
pairs via ONE ``groupby(block_key)`` shuffle with explicit hot-key salting
(groups larger than ``max_group_size`` are deterministically split into
hash-salted sub-groups — dropped cross-salt pair counts are logged, never
silent); per-record fan-out bounded by ``per_doc_topk`` (the reference's k).
The undirected collapse is a second shuffle keyed on the canonical pair.

Partitioning assumptions: block keys are hash-partitioned; a single hot key
(e.g. token "university") is bounded by salting; the pair key
(id_left,id_right) is near-unique so the collapse shuffle is balanced.
"""

from __future__ import annotations

import logging
import re
from typing import List, Optional, Sequence, Set, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min

from ..functions.hashing import (
    band_keys_batch,
    bucket_ids,
    hash_token_list,
    minhash_signatures_batch,
    qgram_hashes_batch,
    u64_to_hex_strings,
)

logger = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# MinHash machinery (shared with dedup stages)
# ---------------------------------------------------------------------------
_MERSENNE = np.uint64((1 << 61) - 1)


def stable_token_hashes(tokens: Sequence[str]) -> np.ndarray:
    """Deterministic 64-bit hashes — stable across processes, unlike Python's
    salted ``hash``. Vectorized polynomial hash (functions/hashing.py)."""
    return hash_token_list(tokens)


def char_qgrams(text: str, q: int = 4) -> List[str]:
    if len(text) < q:
        return [text] if text else []
    return [text[i : i + q] for i in range(len(text) - q + 1)]


class MinHasher:
    """n_perm universal-hash MinHash over 64-bit element hashes. Seeded,
    deterministic, vectorized."""

    def __init__(self, n_perm: int = 8, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.n_perm = n_perm

    def signature(self, element_hashes: np.ndarray) -> np.ndarray:
        """(n_elements,) uint64 → (n_perm,) uint64 minhash signature."""
        if len(element_hashes) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = element_hashes[None, :]  # (1, n)
        h = (self.a[:, None] * x + self.b[:, None]) % _MERSENNE
        return h.min(axis=1)


# ---------------------------------------------------------------------------
# Blocking-key emission (map_batches — no shuffle)
# ---------------------------------------------------------------------------
class BlockKeyEmitter:
    """Per-doc blocking keys:

    * token keys  — each distinct normalized token with len ≥ min_token_len
      not in the broadcast stopword set (standard blocking);
    * q-gram keys — ``n_qgram_bands`` MinHash values over char-4-grams of
      norm_text (fuzzy blocking: docs within small edit distance collide with
      high probability).

    Emits (block_key, doc_id, norm_text) rows — norm_text rides along so the
    pair stage can score without a second join (documented write amplification
    = avg keys/doc, traded against a doc-table join per J1).
    """

    def __init__(
        self,
        min_token_len: int = 3,
        n_qgram_bands: int = 4,
        qgram_rows_per_band: int = 2,
        qgram_size: int = 4,
        stop_tokens: Optional[Set[str]] = None,
        use_token_keys: bool = True,
    ):
        self.min_token_len = min_token_len
        self.qgram_size = qgram_size
        self.n_bands = n_qgram_bands
        self.r = qgram_rows_per_band
        self.hasher = (
            MinHasher(n_perm=n_qgram_bands * qgram_rows_per_band, seed=1234) if n_qgram_bands > 0 else None
        )
        self.stop_tokens = stop_tokens or set()
        self.use_token_keys = use_token_keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        norm = pc.fill_null(batch["norm_text"], "")
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        key_arrays: List[pa.Array] = []
        row_arrays: List[np.ndarray] = []
        if self.use_token_keys and n:
            # distinct per-doc tokens via one Arrow explode + dictionary
            # encode — token strings never round-trip through pandas objects;
            # the "t:" prefix is applied to the (small) DICTIONARY only
            lst = pc.split_pattern(norm, " ")
            lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(lst)
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            keep = pc.greater_equal(pc.utf8_length(flat), self.min_token_len)
            if self.stop_tokens:
                keep = pc.and_(
                    keep,
                    pc.invert(pc.is_in(flat, value_set=pa.array(sorted(self.stop_tokens)))),
                )
            keep_np = keep.to_numpy(zero_copy_only=False)
            rows = rows[keep_np]
            denc = flat.filter(keep).dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(codes):
                V = len(denc.dictionary)
                combo = np.unique(rows * V + codes)  # distinct (row, token)
                prefixed = pc.binary_join_element_wise(
                    "t:", pc.cast(denc.dictionary, pa.string()), ""
                )
                key_arrays.append(pc.take(prefixed, pa.array(combo % V, type=pa.int64())))
                row_arrays.append(combo // V)
        if self.hasher is not None and n:
            gh, counts = qgram_hashes_batch(norm, self.qgram_size)
            sigs = minhash_signatures_batch(gh, counts, self.hasher.a, self.hasher.b)
            bands = band_keys_batch(sigs, self.n_bands, self.r)  # (n, n_bands)
            hexes = u64_to_hex_strings(bands.ravel()).reshape(n, self.n_bands)
            prefixes = np.array([f"q{b}:" for b in range(self.n_bands)], dtype="U4")
            key_arrays.append(
                pa.array(np.char.add(np.broadcast_to(prefixes, (n, self.n_bands)), hexes).ravel())
            )
            row_arrays.append(np.repeat(np.arange(n, dtype=np.int64), self.n_bands))
        if not key_arrays:
            return pa.table(
                {"block_key": pa.array([], type=pa.string()),
                 "doc_id": pa.array([], type=pa.string()),
                 "norm_text": pa.array([], type=pa.string())}
            )
        keys = pa.concat_arrays([pc.cast(a, pa.string()) for a in key_arrays])
        rows = np.concatenate(row_arrays)
        idx = pa.array(rows, type=pa.int64())
        return pa.table(
            {
                "block_key": keys,
                "doc_id": pc.take(batch["doc_id"], idx),
                "norm_text": pc.take(norm, idx),
            }
        )


def emit_block_keys(norm_docs: Dataset, **emitter_kwargs) -> Dataset:
    emitter = BlockKeyEmitter(**emitter_kwargs)  # pickled into tasks (small state)

    def emit(batch: pa.Table) -> pa.Table:
        return emitter(batch)

    return norm_docs.select_columns(["doc_id", "norm_text"]).map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Candidate-pair generation (shuffle #1: groupby block_key, salted)
# ---------------------------------------------------------------------------
def _salts_of(doc_ids: np.ndarray, n_sub: int) -> np.ndarray:
    """Deterministic sub-group assignment for hot-key salting (vectorized)."""
    return (hash_token_list([str(d) for d in doc_ids]) % np.uint64(n_sub)).astype(np.int64)


def group_bounds(keys_np: np.ndarray, n: int):
    """(starts, sizes) of equal-key runs in a key-sorted array."""
    new = np.ones(n, dtype=bool)
    new[1:] = keys_np[1:] != keys_np[:-1]
    starts = np.nonzero(new)[0]
    return starts, np.diff(np.append(starts, n))


def key_sorted_dedup_arrow(t: pa.Table, key_col: str, id_col: str):
    """Arrow-native analogue of ``DataFrame.drop_duplicates([key, id])
    .sort_values([key, id])`` for the bucket pair emitters: dictionary-encode
    the key column (per-row key STRINGS are never materialized as Python
    objects — the pandas conversion doing exactly that dominated pair
    emission at millions of rows), stably lexsort by (key code, id), and keep
    the first of each (key, id) run. Group contiguity and within-group id
    order — all that pair emission and top-k ranking depend on — are
    preserved; only the (irrelevant) relative order of different keys
    changes vs the old string sort.

    Returns ``(key_codes, ids_np, take_idx, key_dictionary)`` where
    ``take_idx`` indexes the ORIGINAL table rows (for gathering extra
    columns like texts/signatures/vectors)."""
    karr = t[key_col]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    denc = karr if pa.types.is_dictionary(karr.type) else karr.dictionary_encode()
    kcodes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    kdict = denc.dictionary
    idc = t[id_col]
    if isinstance(idc, pa.ChunkedArray):
        idc = idc.combine_chunks()
    ids_np = idc.to_numpy(zero_copy_only=False)
    order = np.lexsort((ids_np, kcodes))
    kc, idv = kcodes[order], ids_np[order]
    keep = np.ones(len(kc), dtype=bool)
    if len(kc) > 1:
        keep[1:] = (kc[1:] != kc[:-1]) | (idv[1:] != idv[:-1])
    return kc[keep], idv[keep], order[keep], kdict


def triu_pairs_by_size(starts: np.ndarray, sizes: np.ndarray, mask: np.ndarray):
    """Positional (il, ir) for all intra-group pairs of the masked groups,
    vectorized by size class: every group of size m shares one
    triu_indices(m) template, broadcast-added to the group starts. This is
    how per-key pair emission avoids a Python loop over (potentially
    millions of mostly-singleton) keys."""
    out_l, out_r = [], []
    for m in np.unique(sizes[(sizes >= 2) & mask]):
        s_m = starts[(sizes == m) & mask]
        ti, tj = np.triu_indices(int(m), 1)
        out_l.append((s_m[:, None] + ti).ravel())
        out_r.append((s_m[:, None] + tj).ravel())
    if not out_l:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy()
    return np.concatenate(out_l), np.concatenate(out_r)


def _jaccard_token_sim(texts: List[str], ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    sets = [frozenset(t.split(" ")) if t else frozenset() for t in texts]
    out = np.empty(len(ii), dtype=np.float64)
    for k in range(len(ii)):
        a, b = sets[ii[k]], sets[jj[k]]
        if not a and not b:
            out[k] = 1.0
        elif not a or not b:
            out[k] = 0.0
        else:
            inter = len(a & b)
            out[k] = inter / (len(a) + len(b) - inter)
    return out


class PairEmitter:
    """map_groups fn over one block_key group → canonical candidate pairs.

    * groups larger than ``max_group_size`` are hash-salted into
      ceil(g/max_group_size) sub-groups; cross-salt pairs are DROPPED and the
      count logged (north_rule: explicit skew handling, no silent truncation);
    * within each sub-group all pairs are scored with token-Jaccard and each
      doc keeps only its ``per_doc_topk`` best pairs (the reference's kNN k);
    * output is canonical: id_left < id_right (M10), self-pairs impossible.
    """

    def __init__(self, max_group_size: int = 256, per_doc_topk: int = 40):
        self.max_group_size = max_group_size
        self.per_doc_topk = per_doc_topk

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        # sort so ranking tie-breaks (rank method="first" below) are
        # independent of upstream partitioning / row arrival order
        group = group.drop_duplicates("doc_id").sort_values("doc_id", kind="mergesort")
        g = len(group)
        empty = pd.DataFrame(
            {"id_left": pd.Series(dtype=object), "id_right": pd.Series(dtype=object),
             "block_key": pd.Series(dtype=object), "sim": pd.Series(dtype=np.float64)}
        )
        if g < 2:
            return empty
        key = group["block_key"].iloc[0]
        ids = group["doc_id"].to_numpy(dtype=object)
        texts = group["norm_text"].tolist()

        if g > self.max_group_size:
            n_sub = -(-g // self.max_group_size)  # ceil
            salts = _salts_of(ids, n_sub)
            dropped = g * (g - 1) // 2
            parts_ii, parts_jj = [], []
            for s in range(n_sub):
                members = np.nonzero(salts == s)[0]
                m = len(members)
                if m < 2:
                    continue
                ti, tj = np.triu_indices(m, 1)
                parts_ii.append(members[ti])
                parts_jj.append(members[tj])
                dropped -= m * (m - 1) // 2
            logger.info(
                "blocking: hot key %r (%d docs) salted into %d sub-groups; %d cross-salt pairs dropped",
                key, g, n_sub, dropped,
            )
            if not parts_ii:
                return empty
            ii = np.concatenate(parts_ii)
            jj = np.concatenate(parts_jj)
        else:
            ii, jj = np.triu_indices(g, 1)

        sim = _jaccard_token_sim(texts, ii, jj)

        # per-doc top-k (kNN semantics): keep a pair if it ranks ≤ k for either endpoint
        if self.per_doc_topk and len(ii):
            df = pd.DataFrame({"i": ii, "j": jj, "sim": sim})
            long = pd.concat(
                [df[["i", "sim"]].rename(columns={"i": "d"}), df[["j", "sim"]].rename(columns={"j": "d"})]
            )
            long["pair"] = np.tile(np.arange(len(df)), 2)
            long["rank"] = long.groupby("d")["sim"].rank(method="first", ascending=False)
            keep_pairs = long.loc[long["rank"] <= self.per_doc_topk, "pair"].unique()
            df = df.iloc[np.sort(keep_pairs)]
            ii, jj, sim = df["i"].to_numpy(), df["j"].to_numpy(), df["sim"].to_numpy()

        a = ids[ii]
        b = ids[jj]
        lo = np.where(a < b, a, b)
        hi = np.where(a < b, b, a)
        return pd.DataFrame({"id_left": lo, "id_right": hi, "block_key": key, "sim": sim})


def _token_set_jaccard_pairs(texts: List[str], il: np.ndarray, ir: np.ndarray) -> np.ndarray:
    """Token-set Jaccard for positional pairs into ``texts``: per-doc
    frozensets built ONCE per bucket, then C-speed set intersection per pair
    (:func:`_jaccard_token_sim`). Measured against two vectorized
    alternatives on the sf0.1 blocking shape (445k pairs, ~8-token sides):
    the sorted-set scatter kernel (dedup._intersect_sorted_sets) spends 1.3s
    in its fancy-index fill vs 0.7s total here, and a bitset matrix is
    vocab-bounded memory. Set intersection is O(Σ min(|A|,|B|)) independent
    of vocabulary — for tiny per-doc sets the constant-factor winner."""
    return _jaccard_token_sim(texts, il, ir)


class PairEmitterBucket:
    """Bucket-level form of :class:`PairEmitter`: emits the IDENTICAL pairs,
    sims and per-doc top-k selections (tie-breaks included) for every
    block-key group in one hash bucket, without a Python loop over keys —
    keys are mostly small groups, and at corpus scale a per-key loop is
    millions of pandas sub-frames per bucket. Operates on Arrow tables
    (``bucketed_apply(batch_format="pyarrow")``): block keys stay
    dictionary-encoded codes end to end, so per-row key strings are never
    materialized as Python objects (texts/ids still are — the Jaccard set
    kernel and canonical min/max need them).

    Tie-break parity argument: positions are assigned by one
    (block_key, doc_id) mergesort, so within a group the size-class triu
    pairs sorted by (il, ir) are exactly the group's old triu order; salted
    giant groups keep their constructed per-salt order, appended after; and
    the top-k rank key is the POSITION (unique per key×doc), so ranking never
    pools across keys. Covered by an old-vs-new equality test."""

    def __init__(self, max_group_size: int = 256, per_doc_topk: int = 40):
        self.max_group_size = max_group_size
        self.per_doc_topk = per_doc_topk

    def __call__(self, g: pa.Table) -> pa.Table:
        id_type = g.schema.field("doc_id").type
        empty = pa.table(
            {"id_left": pa.array([], type=id_type), "id_right": pa.array([], type=id_type),
             "block_key": pa.array([], type=pa.string()), "sim": pa.array([], type=pa.float64())}
        )
        if g.num_rows == 0:
            return empty
        kc, ids, take_idx, kdict = key_sorted_dedup_arrow(g, "block_key", "doc_id")
        texts = pc.take(g["norm_text"], pa.array(take_idx)).to_pylist()
        starts, sizes = group_bounds(kc, len(kc))
        giant = sizes > self.max_group_size
        il, ir = triu_pairs_by_size(starts, sizes, ~giant)
        order = np.lexsort((ir, il))  # per-group triu order (rank-tie parity)
        parts_l, parts_r = [il[order]], [ir[order]]
        for gi in np.nonzero(giant)[0]:
            s, m = starts[gi], int(sizes[gi])
            n_sub = -(-m // self.max_group_size)
            salts = _salts_of(ids[s: s + m], n_sub)
            dropped = m * (m - 1) // 2
            pi, pj = [], []
            for sub in range(n_sub):
                mem = np.nonzero(salts == sub)[0]
                k = len(mem)
                if k < 2:
                    continue
                ti, tj = np.triu_indices(k, 1)
                pi.append(mem[ti])
                pj.append(mem[tj])
                dropped -= k * (k - 1) // 2
            logger.info(
                "blocking: hot key %r (%d docs) salted into %d sub-groups; %d cross-salt pairs dropped",
                kdict[int(kc[s])].as_py(), m, n_sub, dropped,
            )
            if pi:
                parts_l.append(s + np.concatenate(pi))
                parts_r.append(s + np.concatenate(pj))
        il = np.concatenate(parts_l)
        ir = np.concatenate(parts_r)
        if len(il) == 0:
            return empty
        sim = _token_set_jaccard_pairs(texts, il, ir)

        if self.per_doc_topk:
            # per-endpoint top-k in pure numpy (pandas groupby.rank was the
            # bucket's second hot spot): sort (endpoint, -sim, appearance)
            # — stable 'first'-rank semantics — and keep ranks < k
            n_pairs = len(il)
            d_all = np.concatenate([il, ir])
            sim_all = np.concatenate([sim, sim])
            pair_all = np.tile(np.arange(n_pairs), 2)
            appearance = np.arange(2 * n_pairs)
            order2 = np.lexsort((appearance, -sim_all, d_all))
            d_s = d_all[order2]
            starts_d = np.nonzero(np.r_[True, d_s[1:] != d_s[:-1]])[0]
            rank = np.arange(2 * n_pairs) - np.repeat(
                starts_d, np.diff(np.append(starts_d, 2 * n_pairs))
            )
            keep_mask = np.zeros(n_pairs, dtype=bool)
            keep_mask[pair_all[order2][rank < self.per_doc_topk]] = True
            il, ir, sim = il[keep_mask], ir[keep_mask], sim[keep_mask]

        a = ids[il]
        b = ids[ir]
        lo = np.where(a < b, a, b)
        hi = np.where(a < b, b, a)
        return pa.table(
            {
                "id_left": pa.array(lo, type=id_type),
                "id_right": pa.array(hi, type=id_type),
                # key strings come back only for EMITTED pairs, via one
                # dictionary take — never per input row
                "block_key": pc.take(kdict, pa.array(kc[il], type=pa.int64())),
                "sim": pa.array(sim, type=pa.float64()),
            }
        )


def bucketed_apply(
    ds: Dataset,
    key_cols: Sequence[str],
    bucket_fn,
    num_buckets: int = 64,
    batch_format: str = "pandas",
    repartition: Optional[bool] = None,
) -> Dataset:
    """Hash-bucket rows by key column(s), then run ONE vectorized function per
    bucket (a pandas DataFrame or, with ``batch_format="pyarrow"``, an Arrow
    table — string-heavy aggregations should use Arrow: the pandas conversion
    materializes every value as a Python object, which dominated the pair
    collapse at millions of rows).

    This is the engine's high-cardinality aggregation primitive: Ray's
    ``groupby(key).aggregate(...)`` runs a Python accumulator per GROUP, which
    collapses at millions of tiny groups (pair keys, node ids). Bucketing
    moves the same bytes through one shuffle but leaves the per-key work to a
    vectorized ``DataFrame.groupby`` / ``Table.group_by`` inside each of
    ``num_buckets`` tasks. Rows with equal keys always land in the same
    bucket, so any per-key computation is exact."""
    cols = list(key_cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__gb", bucket_ids(t, cols, num_buckets))

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    # Ray's sort-based groupby emits as many output blocks as it gets input
    # blocks, and map_groups parallelism follows — a narrow upstream (few
    # blocks) would run all buckets in 1-2 tasks no matter how many CPUs the
    # cluster has. Repartitioning to num_buckets pins the per-bucket work to
    # bucket-level parallelism — but only when the upstream is actually
    # narrow: for wide inputs the repartition just moves every byte twice.
    # ``repartition`` overrides (False for inputs KNOWN to be wide, e.g. the
    # output of a previous bucketed stage); the default asks a materialized
    # input for its real block count and assumes narrow for lazy inputs.
    if repartition is None:
        try:
            repartition = ds.num_blocks() < num_buckets
        except NotImplementedError:
            repartition = True
    if repartition:
        keyed = keyed.repartition(num_buckets)

    if batch_format == "pyarrow":

        def apply_bucket_arrow(g: pa.Table) -> pa.Table:
            return bucket_fn(g.drop_columns(["__gb"]))

        return keyed.groupby("__gb").map_groups(apply_bucket_arrow, batch_format="pyarrow")

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(g.drop(columns=["__gb"]))

    return keyed.groupby("__gb").map_groups(apply_bucket, batch_format="pandas")


def bucketed_group_apply(
    ds: Dataset,
    key_col: str,
    per_key_fn,
    num_buckets: int = 64,
    repartition: Optional[bool] = None,
) -> Dataset:
    """groupby(key).map_groups with per-KEY Ray overhead amortized: one
    bucketed shuffle, pandas sub-groupby + per-key fn inside each bucket.
    ``repartition=False`` skips the parallelism-widening repartition — pass
    it when the input is KNOWN to be at least cluster-wide already (the
    groupby shuffles by bucket id regardless, so the extra pass buys
    nothing)."""

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        outs = [per_key_fn(sub) for _, sub in g.groupby(key_col, sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return per_key_fn(g.head(0))
        return pd.concat(outs, ignore_index=True)

    return bucketed_apply(ds, [key_col], bucket_fn, num_buckets=num_buckets,
                          repartition=repartition)


def candidate_pairs(
    block_keys: Dataset,
    max_group_size: int = 256,
    per_doc_topk: int = 40,
    num_buckets: int = 64,
    repartition: Optional[bool] = None,
) -> Dataset:
    """block-key rows → canonical candidate pairs, undirected-collapsed.

    Two shuffles: bucketed groupby(block_key) for pair emission, groupby(pair)
    for the keep-max collapse (A1). The collapse keeps max sim across
    co-occurring blocks and the lexicographically-min block_key as the pair's
    representative key (deterministic). ``repartition=False``: see
    :func:`bucketed_group_apply` — pass when ``block_keys`` is already wide.

    Emission runs at BUCKET level (:class:`PairEmitterBucket` — vectorized
    over all keys in a bucket; :class:`PairEmitter` is the per-key ground
    truth it is equality-tested against)."""
    emitter = PairEmitterBucket(max_group_size=max_group_size, per_doc_topk=per_doc_topk)
    pairs = bucketed_apply(block_keys, ["block_key"], emitter,
                           num_buckets=num_buckets, repartition=repartition,
                           batch_format="pyarrow")

    def collapse(g: pa.Table) -> pa.Table:
        out = g.group_by(["id_left", "id_right"]).aggregate(
            [("sim", "max"), ("block_key", "min")]
        )
        out = out.rename_columns(["id_left", "id_right", "sim", "block_key"])
        # sorted output gives the downstream scorer id_left LOCALITY: a
        # scoring batch sees ~batch/topk distinct left docs, so doc-side
        # gathers from the bundle store drop ~k× on that side
        return out.sort_by([("id_left", "ascending"), ("id_right", "ascending")])

    # bucket by id_left ONLY (all copies of a pair share id_left, so the
    # keep-max collapse stays exact) — co-locating each left doc's pairs is
    # what makes the sort above effective across block boundaries
    return bucketed_apply(
        pairs, ["id_left"], collapse, num_buckets=num_buckets,
        batch_format="pyarrow",
        repartition=False,  # input is the emit stage's num_buckets-wide output
    )


# ---------------------------------------------------------------------------
# Dataset-derived stopwords (T7/A4: stopwords_extractor.py:10-22)
# ---------------------------------------------------------------------------
def dataset_stopwords(norm_docs: Dataset, freq_cutoff: float = 0.30) -> Set[str]:
    """Tokens whose document frequency ≥ freq_cutoff. Distributed DF aggregate:
    flat_map(distinct tokens per doc) → groupby(token).count(); only the small
    (token, df) result and N come to the driver."""
    n = norm_docs.count()
    if n == 0:
        return set()

    def distinct_tokens(batch: pa.Table) -> pa.Table:
        from ..functions.text_norm import distinct_tokens_flat

        col = pc.fill_null(batch["norm_text"].combine_chunks(), "")
        return pa.table({"token": distinct_tokens_flat(pc.split_pattern(col, " "))})

    df_counts = (
        norm_docs.select_columns(["norm_text"])
        .map_batches(distinct_tokens, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="df"))
    )
    cutoff = freq_cutoff * n
    small = df_counts.filter(expr=f"df >= {cutoff}").take_all()
    return {r["token"] for r in small}


# ---------------------------------------------------------------------------
# M12: acronym finder (visualize_k_value_for_blocking.py:33-43)
# ---------------------------------------------------------------------------
_ACRONYM_RE = re.compile(r"\b[A-Z0-9&\-]{2,}\b")


def acronyms_column(texts_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Uppercase-token acronym sets from raw text (feeds blocking-quality
    diagnostics)."""
    out = [sorted({m for m in _ACRONYM_RE.findall(t or "")}) for t in texts_col.to_pylist()]
    return pa.array(out, type=pa.list_(pa.string()))


def add_acronyms(docs: Dataset, text_col: str = "full_text") -> Dataset:
    return docs.map_batches(
        lambda t, c=text_col: t.append_column("acronyms", acronyms_column(t[c])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# A7: blocking-quality metrics (visualize_k_value_for_blocking.py:124-156)
# ---------------------------------------------------------------------------
def blocking_quality_metrics(
    pairs: "pd.DataFrame", n_docs: int, id_to_tokens: dict
) -> dict:
    """Mean token-Jaccard over emitted pairs + reduction ratio
    (1 − |pairs| / (N·(N−1)/2)) — the k-sweep diagnostics as scalars."""
    total_possible = n_docs * (n_docs - 1) / 2.0
    if len(pairs) == 0:
        return {"mean_pair_jaccard": 0.0, "reduction_ratio": 1.0, "n_pairs": 0}
    sims = []
    for a, b in zip(pairs["id_left"], pairs["id_right"]):
        ta = set(id_to_tokens.get(a, ()))
        tb = set(id_to_tokens.get(b, ()))
        if not ta and not tb:
            sims.append(1.0)
        elif not ta or not tb:
            sims.append(0.0)
        else:
            sims.append(len(ta & tb) / len(ta | tb))
    return {
        "mean_pair_jaccard": float(np.mean(sims)),
        "reduction_ratio": float(1.0 - len(pairs) / total_possible) if total_possible else 1.0,
        "n_pairs": int(len(pairs)),
    }


# ---------------------------------------------------------------------------
# Conformance mode: the reference's exact TF-IDF brute-kNN blocking (T4)
# ---------------------------------------------------------------------------
def knn_block_conformance(
    ids: List[str], texts: List[str], k: int = 40, min_sim: Optional[float] = None
) -> pd.DataFrame:
    """Driver-side brute-force cosine kNN over our from-scratch blocking TF-IDF
    (run_blocking.py:28-56 semantics: self excluded, undirected keep-max).
    O(N²) — small-scale parity checks ONLY; the scale path is candidate_pairs."""
    from ..functions.vectorizer import blocking_tfidf

    vec = blocking_tfidf().fit(texts)
    X = vec.transform_dense(texts)  # rows already l2-normalized
    sims = X @ X.T
    n = len(ids)
    k_eff = max(0, min(k, n - 1))
    rows: List[Tuple[str, str, float]] = []
    for i in range(n):
        # deterministic (-sim, position) tie-break — shared with the
        # distributed knn_block_topk so the two paths are comparable
        order = np.lexsort((np.arange(n), -sims[i]))
        picked = 0
        for j in order:
            if j == i:
                continue
            s = float(sims[i, j])
            if min_sim is not None and s < min_sim:
                continue
            rows.append((ids[i], ids[j], s))
            picked += 1
            if picked >= k_eff:
                break
    df = pd.DataFrame(rows, columns=["src_id", "cand_id", "cosine_sim"])
    if df.empty:
        return pd.DataFrame(columns=["id_left", "id_right", "sim"])
    lo = np.minimum(df["src_id"], df["cand_id"])
    hi = np.maximum(df["src_id"], df["cand_id"])
    out = pd.DataFrame({"id_left": lo, "id_right": hi, "sim": df["cosine_sim"]})
    return out.groupby(["id_left", "id_right"], as_index=False)["sim"].max()


# ---------------------------------------------------------------------------
# T4 scale path: DISTRIBUTED exact TF-IDF cosine kNN blocking
# ---------------------------------------------------------------------------
def fit_blocking_tfidf_distributed(norm_docs: Dataset, text_col: str = "norm_text"):
    """Distributed DF fit of the reference blocking TF-IDF
    (run_blocking.py:14-26 config): per-batch partial document-frequency maps
    in ``map_batches``, merged by a bucketed count; only the final (term, df)
    table reaches the driver."""
    from ..functions.vectorizer import blocking_tfidf

    vec = blocking_tfidf()
    ds = norm_docs.select_columns([text_col])
    n = ds.count()
    analyze = blocking_tfidf().analyze

    def partial_df(batch: pa.Table) -> pa.Table:
        counts: dict = {}
        for t in batch[text_col].to_pylist():
            for term in set(analyze(t or "")):
                counts[term] = counts.get(term, 0) + 1
        return pa.table({"term": pa.array(list(counts.keys()), type=pa.string()),
                         "df": pa.array(list(counts.values()), type=pa.int64())})

    partials = ds.map_batches(partial_df, batch_format="pyarrow", batch_size=4096)
    merged = bucketed_apply(
        partials, ["term"],
        lambda g: g.groupby("term", as_index=False).agg(df=("df", "sum")),
        num_buckets=32,
    )
    dfreq: dict = {}
    for b in merged.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for term, df in zip(b["term"].to_pylist(), b["df"].to_pylist()):
            dfreq[term] = df
    return vec.fit_from_document_frequencies(dfreq, n)


def _pack_inverted_index(tables: List[pa.Table]) -> dict:
    """Corpus blocks (doc_id, idx:list<int64>, val:list<float64>) → inverted
    index (term → postings) as flat numpy arrays + id mappings."""
    t = pa.concat_tables(tables).combine_chunks() if tables else None
    if t is None or t.num_rows == 0:
        return {"n": 0}
    # canonicalize to doc_id-sorted row order: streaming execution delivers
    # blocks in nondeterministic order, and tie-breaks key on row position —
    # sorting makes the index (and thus equal-sim tie winners) reproducible
    t = t.sort_by("doc_id")
    ids = t["doc_id"].to_pylist()
    la_i = t["idx"].combine_chunks()
    la_v = t["val"].combine_chunks()
    row_ptr = la_i.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_idx = la_i.values.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    flat_val = la_v.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    rows = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(row_ptr))
    # CSC: postings sorted by (term, doc row)
    order = np.lexsort((rows, flat_idx))
    terms_sorted = flat_idx[order]
    n_terms = int(terms_sorted[-1]) + 1 if len(terms_sorted) else 0
    term_ptr = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(np.bincount(terms_sorted, minlength=n_terms), out=term_ptr[1:])
    return {
        "n": len(ids),
        "ids": np.asarray(ids, dtype=object),
        "row_of": {d: i for i, d in enumerate(ids)},
        "term_ptr": term_ptr,
        "term_docs": rows[order].astype(np.int32),
        "term_vals": flat_val[order].astype(np.float32),
    }


def knn_block_topk(
    norm_docs: Dataset,
    k: int = 40,
    min_sim: Optional[float] = None,
    text_col: str = "norm_text",
    id_col: str = "doc_id",
    batch_size: int = 256,
    num_buckets: int = 64,
) -> Dataset:
    """Distributed EXACT TF-IDF cosine kNN blocking — the reference's
    run_blocking.py:28-67 semantics (self excluded, per-doc top-k, undirected
    keep-max collapse) without the driver-side N×N matrix.

    Shape: distributed DF fit → corpus transformed block-wise and packed into
    an inverted index in a Ray task (``ray.put`` ONCE, zero-copy plasma views
    in every scoring worker) → each scoring batch does term-at-a-time
    accumulation (one ``bincount`` per batch) into a (B × N) score block,
    takes its rows' top-k with a deterministic (-sim, row) tie-break → one
    bucketed shuffle collapses to canonical undirected pairs.

    Bounds: the inverted index holds corpus-nnz (int32 doc + float32 weight
    ≈ 8 bytes/nonzero) in the object store; each worker holds B×N float64
    scores (batch_size=256, N=10^6 → 2 GB — shrink B as N grows). Exact kNN
    is inherently corpus-× work: beyond ~10^6 docs per shard use
    ``candidate_pairs`` (key blocking, the 10^12 path) or IVF.
    """
    import ray as _ray

    vec = fit_blocking_tfidf_distributed(norm_docs, text_col=text_col)
    vec_ref = _ray.put(vec)

    def to_csr_blocks(batch: pa.Table, vec_ref=vec_ref) -> pa.Table:
        from ..state.worker_cache import cached_get

        v = cached_get(vec_ref)
        ptr, idx, val = v.transform([t or "" for t in batch[text_col].to_pylist()])
        off = ptr.astype(np.int64)
        return pa.table({
            "doc_id": batch[id_col],
            "idx": pa.ListArray.from_arrays(pa.array(off, type=pa.int64()), pa.array(idx, type=pa.int64())),
            "val": pa.ListArray.from_arrays(pa.array(off, type=pa.int64()), pa.array(val, type=pa.float64())),
        })

    refs = (
        norm_docs.select_columns([id_col, text_col])
        .map_batches(to_csr_blocks, batch_format="pyarrow", zero_copy_batch=True, batch_size=2048)
        .to_arrow_refs()
    )
    pack = _ray.remote(num_returns=1)(lambda *ts: _pack_inverted_index(list(ts)))
    index_ref = pack.remote(*refs)
    key = index_ref.hex()

    def score(batch: pa.Table, index_ref=index_ref, vec_ref=vec_ref, key=key) -> pa.Table:
        from ..state.worker_cache import cached_build, cached_get

        index = cached_build(f"knn_index:{key}", lambda: _ray.get(index_ref))
        n = index["n"]
        if n == 0 or batch.num_rows == 0:
            return pa.table({"src_id": pa.array([], type=pa.string()),
                             "cand_id": pa.array([], type=pa.string()),
                             "sim": pa.array([], type=pa.float64())})
        v = cached_get(vec_ref)
        texts = [t or "" for t in batch[text_col].to_pylist()]
        src_ids = batch[id_col].to_pylist()
        q_ptr, q_idx, q_val = v.transform(texts)
        B = len(texts)
        term_ptr, term_docs, term_vals = index["term_ptr"], index["term_docs"], index["term_vals"]
        qrow = np.repeat(np.arange(B, dtype=np.int64), np.diff(q_ptr))
        # terms beyond the index's max seen term have no postings
        n_terms = len(term_ptr) - 1
        in_vocab = q_idx < n_terms
        if not in_vocab.all():
            q_idx, q_val, qrow = q_idx[in_vocab], q_val[in_vocab], qrow[in_vocab]
        plen = term_ptr[q_idx + 1] - term_ptr[q_idx]
        total = int(plen.sum())
        scores = np.zeros(B * n, dtype=np.float64)
        if total:
            out_off = np.zeros(len(plen) + 1, dtype=np.int64)
            np.cumsum(plen, out=out_off[1:])
            gather = np.repeat(term_ptr[q_idx], plen) + (np.arange(total, dtype=np.int64)
                                                         - np.repeat(out_off[:-1], plen))
            docs = term_docs[gather].astype(np.int64)
            contrib = term_vals[gather].astype(np.float64) * np.repeat(q_val, plen)
            flat = np.repeat(qrow, plen) * n + docs
            scores = np.bincount(flat, weights=contrib, minlength=B * n)
        S = scores.reshape(B, n)
        row_of = index["row_of"]
        for i, d in enumerate(src_ids):
            r = row_of.get(d)
            if r is not None:
                S[i, r] = -np.inf
        k_eff = max(0, min(k, n - 1))
        if k_eff == 0:
            return pa.table({"src_id": pa.array([], type=pa.string()),
                             "cand_id": pa.array([], type=pa.string()),
                             "sim": pa.array([], type=pa.float64())})
        # full (-sim, row) sort BEFORE truncation: argpartition alone keeps
        # an arbitrary subset of an equal-sim group straddling the k
        # boundary (duplicate docs tie exactly), breaking determinism
        order = np.lexsort((np.broadcast_to(np.arange(n), S.shape), -S))
        sel = order[:, :k_eff]
        sel_s = np.take_along_axis(S, sel, axis=1)
        src = np.repeat(np.asarray(src_ids, dtype=object), k_eff)
        cand = index["ids"][sel.ravel()]
        sims = sel_s.ravel()
        keep = np.isfinite(sims)
        if min_sim is not None:
            keep &= sims >= min_sim
        return pa.table({
            "src_id": pa.array(src[keep].tolist(), type=pa.string()),
            "cand_id": pa.array(cand[keep].tolist(), type=pa.string()),
            "sim": pa.array(sims[keep], type=pa.float64()),
        })

    directed = norm_docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )

    def canonical(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["src_id"], t["cand_id"])
        hi = pc.max_element_wise(t["src_id"], t["cand_id"])
        return pa.table({"id_left": lo, "id_right": hi, "sim": t["sim"]})

    pairs = directed.map_batches(canonical, batch_format="pyarrow", zero_copy_batch=True)

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["id_left", "id_right"], as_index=False)["sim"].max()

    return bucketed_apply(pairs, ["id_left", "id_right"], collapse, num_buckets=num_buckets)
