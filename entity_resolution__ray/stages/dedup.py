"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's ER near-dedup (which *is* blocking → scoring →
clustering), these are the standard corpus-dedup primitives, each expressed
Ray-Data-first:

  * exact_dedup           — content hash → hash-partitioned groupby → keep
                            min-id row per group (deterministic)
  * minhash_lsh_candidates/ minhash_lsh_dedup
                          — shingle → MinHash signature → banded LSH keys →
                            groupby(band) → candidate pairs → exact-Jaccard
                            verify → connected components → dup_of table
  * simhash_dedup         — 64-bit SimHash, banded into 4×16-bit chunks →
                            candidates at Hamming distance ≤ k → verify
  * ngram_jaccard_dedup   — n-gram Jaccard verification over LSH candidates
  * embedding_near_dup    — random-hyperplane LSH over an embedding column →
                            within-bucket cosine ≥ threshold (vectors ride
                            with the band rows — nothing is collected to the
                            driver)

All hashing is the vectorized stable scheme in functions/hashing.py — no
per-row / per-shingle Python calls anywhere; deterministic under any
partitioning.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Max, Min

from ..functions.hashing import (
    _GOLDEN,
    _splitmix64,
    band_keys_batch,
    hash_strings,
    md5_hash_strings,
    minhash_signatures_batch,
    qgram_hashes_batch,
    u64_to_hex_strings,
)
from .blocking import MinHasher, char_qgrams, stable_token_hashes
from .clustering import connected_components
from .joins import _arrow_schema as _arrow_schema_of

logger = logging.getLogger(__name__)


def _content_hash_column(t: pa.Table, text_col: str) -> pa.Array:
    """128-bit stable content hash as hex (two independent 64-bit passes)."""
    col = t[text_col]
    lo = u64_to_hex_strings(hash_strings(col, seed=0))
    hi = u64_to_hex_strings(hash_strings(col, seed=0x5EED))
    return pa.array(np.char.add(lo, hi))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Keep one row per distinct ``text_col`` value — the row with the minimum
    id (deterministic). Shuffle key = 128-bit content hash."""

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column("__h", _content_hash_column(t, text_col))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    from .blocking import bucketed_apply

    def keep_min_per_hash(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).drop_duplicates("__h", keep="first").drop(columns=["__h"])

    return bucketed_apply(hashed, ["__h"], keep_min_per_hash, num_buckets=64)


# ---------------------------------------------------------------------------
# shingle hashing (batched, all modes)
# ---------------------------------------------------------------------------
def shingle_hashes_batch(col, shingle: str, token_hasher=None) -> Tuple[np.ndarray, np.ndarray]:
    """Flat 64-bit shingle hashes + per-row counts for a batch of texts.

    Modes: ``char4`` (char q-grams, fully buffer-level), ``word`` (whitespace
    tokens), ``wordN`` (N-token grams; rows with < N tokens fall back to
    single-token shingles — reference ``[...] or toks`` semantics).
    ``token_hasher`` overrides the per-token hash in ``word`` mode (e.g.
    ``md5_hash_strings`` so an external SQL oracle can replicate signatures).
    """
    if shingle.startswith("char"):
        q = int(shingle[4:]) if len(shingle) > 4 else 4
        return qgram_hashes_batch(col, q)
    n_rows = len(col)
    s = pd.Series(
        pc.fill_null(col, "").to_pandas() if hasattr(col, "to_pandas") else col, copy=False
    )
    toks = s.str.split().explode().dropna()
    rows = toks.index.to_numpy(dtype=np.int64)
    hasher = token_hasher or hash_strings
    h = hasher(pa.array(toks.to_numpy(dtype=object), type=pa.string()))
    counts = np.bincount(rows, minlength=n_rows).astype(np.int64)
    if shingle == "word":
        return h, counts
    n = int(shingle[4:])
    # N-gram counts: len-n+1 if len ≥ n else len (single-token fallback)
    g_counts = np.where(counts >= n, counts - n + 1, counts)
    total = int(g_counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), g_counts
    row_starts = np.cumsum(counts) - counts
    g_first = np.repeat(row_starts[g_counts > 0], g_counts[g_counts > 0])
    within = np.arange(total, dtype=np.int64) - np.repeat(
        (np.cumsum(g_counts) - g_counts)[g_counts > 0], g_counts[g_counts > 0]
    )
    starts = g_first + within
    width = np.repeat(np.where(counts >= n, n, 1)[g_counts > 0], g_counts[g_counts > 0])
    g = _splitmix64(h[starts])
    for k in range(1, n):
        mask = width > k
        g[mask] = _splitmix64(g[mask] ^ (h[starts[mask] + k] + _GOLDEN))
    return g, g_counts


# ---------------------------------------------------------------------------
# MinHash-LSH near-dedup
# ---------------------------------------------------------------------------
class MinHashLSHKeys:
    """Batch fn: text → (band_key, doc_id) rows, fully vectorized.

    signature length = bands × rows_per_band; docs with shingle-Jaccard ≥ t
    collide in ≥1 band with probability 1-(1-t^r)^b. Default (b=16, r=8) is
    tuned for char-4 shingles on natural-language text, whose BASELINE
    jaccard between unrelated docs is ~0.27 (measured): random-pair band
    collision = 0.27^8 ≈ 3e-5 while s=0.8 dups collide with p≈0.95 —
    candidate volume stays O(dups), not O(corpus²·0.1). r=4 floods the
    verify stage with ~10% of ALL pairs on such corpora."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_bands: int = 16,
        rows_per_band: int = 8,
        shingle: str = "char4",
        seed: int = 99,
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.n_bands = n_bands
        self.r = rows_per_band
        self.shingle = shingle
        self.hasher = MinHasher(n_perm=n_bands * rows_per_band, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"band_key": pa.array([], type=pa.string()), "doc_id": batch[self.id_col]})
        gh, counts = shingle_hashes_batch(batch[self.text_col], self.shingle)
        sigs = minhash_signatures_batch(gh, counts, self.hasher.a, self.hasher.b)
        bands = band_keys_batch(sigs, self.n_bands, self.r)
        hexes = u64_to_hex_strings(bands.ravel()).reshape(n, self.n_bands)
        prefixes = np.array([f"b{b}:" for b in range(self.n_bands)], dtype="U4")
        keys = np.char.add(np.broadcast_to(prefixes, (n, self.n_bands)), hexes).ravel()
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), self.n_bands))
        return pa.table({"band_key": pa.array(keys), "doc_id": pc.take(batch[self.id_col], idx)})


from .blocking import group_bounds as _group_bounds  # noqa: E402
from .blocking import key_sorted_dedup_arrow as _key_sorted_dedup  # noqa: E402
from .blocking import triu_pairs_by_size as _triu_pairs  # noqa: E402


def _pairs_from_band_groups(keys: Dataset, max_group_size: int = 64) -> Dataset:
    """band groups → canonical candidate pairs (deduped).

    Pair emission is vectorized at the BUCKET level: one sort per bucket
    finds group boundaries, then all groups of equal size m emit their
    triu-index pairs in one broadcasted add (band keys are mostly singletons
    — a per-key Python loop here was 23s of the sf0.1 dedup wall; this form
    is ~50×).

    Groups larger than ``max_group_size`` emit a STAR (every member → the
    group's min-id member, O(m) edges) instead of the full O(m²) triu. A
    band bucket that large is near-certainly one true near-dup cluster
    (random collision per band is t^r ≈ 3e-5; see MinHashLSHKeys), so the
    star's spokes verify and transitive closure recovers the exact cluster.
    Without this cap a dup-dense corpus is quadratic in cluster size: the
    500k-doc scale corpus (every doc in a ~100-200-replica cluster) emitted
    108.9M candidate pairs, and the verify join's text-attached stream
    (~30+ GB) ground a 32-CPU node into object-store backpressure. With the
    star cap candidate volume is O(docs-in-dup-clusters). Recall caveat
    (documented, logged): if a giant bucket mixes docs that are NOT near-dups
    of the min member, their spokes fail verification and any true pair among
    the non-members must be caught by another band (p ≈ 1-(1-t^r)^(b-1) per
    band set) — the standard LSH-dedup trade; exact triu is preserved for
    every group ≤ ``max_group_size``, which covers the oracle corpora."""

    def emit_bucket(g: pa.Table) -> pa.Table:
        id_type = g.schema.field("doc_id").type
        empty = pa.table(
            {"id_left": pa.array([], type=id_type), "id_right": pa.array([], type=id_type)}
        )
        if g.num_rows == 0:
            return empty
        kc, ids_np, _, _kdict = _key_sorted_dedup(g, "band_key", "doc_id")
        starts, sizes = _group_bounds(kc, len(kc))
        giant = sizes > max_group_size
        il, ir = _triu_pairs(starts, sizes, ~giant)
        out_l, out_r = [il], [ir]
        n_giants = int(np.count_nonzero(giant))
        if n_giants:
            # star: within-group ids are sorted ascending (key_sorted_dedup),
            # so position starts[gi] is the min id — spokes are canonical
            # (min, other) pairs already
            gs = starts[giant]
            gm = sizes[giant]
            centers = np.repeat(gs, gm - 1)
            offs = np.concatenate([np.arange(1, m, dtype=np.int64) for m in gm])
            out_l.append(centers)
            out_r.append(centers + offs)
            logger.info(
                "lsh: %d giant band groups (max %d docs) capped to star emission "
                "(%d spokes vs %d triu pairs)",
                n_giants, int(gm.max()), int((gm - 1).sum()),
                int((gm.astype(np.int64) * (gm - 1) // 2).sum()),
            )
        il = np.concatenate(out_l)
        ir = np.concatenate(out_r)
        if len(il) == 0:
            return empty
        return pa.table(
            {"id_left": pa.array(ids_np[il], type=id_type),
             "id_right": pa.array(ids_np[ir], type=id_type)}
        )

    from .blocking import bucketed_apply

    pairs = bucketed_apply(keys, ["band_key"], emit_bucket, num_buckets=64,
                           repartition=False, batch_format="pyarrow")
    return bucketed_apply(
        pairs, ["id_left", "id_right"],
        lambda g: g.group_by(["id_left", "id_right"]).aggregate([]),
        num_buckets=64, batch_format="pyarrow",
    )


def minhash_lsh_candidates(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 16,
    rows_per_band: int = 8,
    shingle: str = "char4",
) -> Dataset:
    emitter = MinHashLSHKeys(
        text_col=text_col, id_col=id_col, n_bands=n_bands,
        rows_per_band=rows_per_band, shingle=shingle,
    )  # small picklable state → elastic tasks, not a capped actor pool
    keys = ds.map_batches(
        lambda t, e=emitter: e(t), batch_format="pyarrow", zero_copy_batch=True
    )
    return _pairs_from_band_groups(keys)


def _unique_per_row(hashes: np.ndarray, counts: np.ndarray):
    """Distinct (row, hash) pairs from a flat per-row layout. Returns
    (rows, hashes) of the deduped pairs plus distinct-count per row."""
    n = len(counts)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((hashes, rows))
    r_s, h_s = rows[order], hashes[order]
    first = np.empty(len(order), dtype=bool)
    first[:1] = True
    first[1:] = (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])
    ur, uh = r_s[first], h_s[first]
    ucounts = np.bincount(ur, minlength=n)
    return ur, uh, ucounts


class JaccardVerify:
    """Batch fn over candidate pairs with src_text/cand_text → + jaccard.

    Exact shingle-Jaccard fully vectorized over the batch: both sides'
    shingle-hash sets are deduped per row with one lexsort, and the
    intersection sizes come from a second lexsort over the merged (row, hash)
    stream — zero per-pair Python. Hash collisions (2^-64) are the only
    divergence from string-set Jaccard."""

    def __init__(self, shingle: str = "char4"):
        self.shingle = shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("jaccard", pa.array([], type=pa.float64()))
        # near-dup workloads verify the SAME text pair many times (every copy
        # of a duplicated doc pairs with every other) — compute per unique
        # (src_text, cand_text) combo, then gather back to rows
        # null texts (e.g. join path with missing docs) must not become null
        # dictionary indices — they'd turn into garbage after astype(int64)
        sa = pc.dictionary_encode(pc.fill_null(batch["src_text"].combine_chunks(), ""))
        sb = pc.dictionary_encode(pc.fill_null(batch["cand_text"].combine_chunks(), ""))
        ia = sa.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ib = sb.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        da, db = sa.dictionary, sb.dictionary
        combo = ia * len(db) + ib
        uniq, inverse = np.unique(combo, return_inverse=True)
        u_a = (uniq // len(db)).astype(np.int64)
        u_b = (uniq % len(db)).astype(np.int64)
        jac = self._jaccard_arrays(
            pc.take(da, pa.array(u_a)), pc.take(db, pa.array(u_b)), len(uniq)
        )
        return batch.append_column("jaccard", pa.array(jac[inverse], type=pa.float64()))

    def _jaccard_arrays(self, texts_a, texts_b, n: int) -> np.ndarray:
        ha, ca = shingle_hashes_batch(texts_a, self.shingle)
        hb, cb = shingle_hashes_batch(texts_b, self.shingle)
        ra, ua, na = _unique_per_row(ha, ca)
        rb, ub, nb = _unique_per_row(hb, cb)
        # intersection per row: merge both deduped streams; a (row, hash)
        # appearing twice (once per side) is an intersection element
        rows_all = np.concatenate([ra, rb])
        hash_all = np.concatenate([ua, ub])
        order = np.lexsort((hash_all, rows_all))
        r_s, h_s = rows_all[order], hash_all[order]
        dup = np.zeros(len(order), dtype=bool)
        dup[1:] = (r_s[1:] == r_s[:-1]) & (h_s[1:] == h_s[:-1])
        inter = np.bincount(r_s[dup], minlength=n).astype(np.float64)
        union = na + nb - inter
        return np.where(
            (na == 0) & (nb == 0), 1.0,
            np.where((na == 0) | (nb == 0), 0.0, inter / np.maximum(union, 1.0)),
        )


def _gram_store_from_refs(refs):
    """Worker-side decode of broadcast gram-set blocks → (id index, flat
    uint64 values, int64 offsets). Built once per worker via cached_build."""
    import ray

    tbl = pa.concat_tables(ray.get(list(refs))).combine_chunks()
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    col = tbl["grams"].combine_chunks()
    # .copy(): move the buffers out of plasma-mmap'd memory into worker heap.
    # The verifier gathers RANDOMLY from these arrays; first-touch page faults
    # on the mmap under full-node concurrency cost ~77s/worker (measured at
    # 50k docs × 32 workers) vs ~0.1s for this sequential copy.
    values = col.values.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False).copy()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64, copy=False).copy()
    return pd.Index(ids.copy()), values, offs


def build_gram_set_refs(ds: Dataset, text_col: str, id_col: str, shingle: str):
    """One pass over docs → per-doc DEDUPED, SORTED shingle-hash sets as
    Arrow block refs (doc_id, grams:large_list<uint64>). Each text is hashed
    exactly once here, instead of once per candidate pair in the verifier
    (docs average tens of pairs each under LSH, so this is the difference
    between O(corpus) and O(pairs) hashing work)."""

    def per_doc(t: pa.Table) -> pa.Table:
        gh, counts = shingle_hashes_batch(t[text_col], shingle)
        _, uh, uc = _unique_per_row(gh, counts)
        offs = np.zeros(len(uc) + 1, dtype=np.int64)
        np.cumsum(uc, out=offs[1:])
        grams = pa.LargeListArray.from_arrays(pa.array(offs), pa.array(uh, type=pa.uint64()))
        return pa.table({"doc_id": t[id_col], "grams": grams})

    return ds.select_columns([id_col, text_col]).map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()


_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


# Per-worker reusable scratch matrices, keyed by size-class bound. Fresh
# large allocations are pathologically slow on this platform when 32 tasks
# fault pages concurrently (measured: np.full of 120 MiB = 20-40s inside a
# full-node wave vs ~50ms solo), so each worker allocates one ~16 MiB buffer
# per class ONCE and recycles its pages across every verify call.
_TARGET_CELLS = 1 << 21
_SCRATCH: dict = {}


def _scratch(class_bound: int) -> np.ndarray:
    buf = _SCRATCH.get(class_bound)
    if buf is None:
        rows = max(1, _TARGET_CELLS // class_bound)
        buf = np.empty((rows, class_bound), dtype=np.uint64)
        _SCRATCH[class_bound] = buf
    return buf


def _intersect_sorted_sets(values: np.ndarray, offs: np.ndarray,
                           ia: np.ndarray, ib: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """|A∩B|, |A|, |B| for index pairs into a flat sorted-set store,
    vectorized. Pairs are padded into a (chunk, W) scratch matrix per size
    class and row-sorted; adjacent equal non-sentinel values count the
    intersection (each side is a set, so a value repeats at most twice per
    row). Size classes bound the padding waste, the fixed scratch bounds
    per-call allocation; rows over the largest class fall back to per-row
    np.intersect1d (rare giants)."""
    wa = np.where(ia >= 0, offs[ia + 1] - offs[ia], 0).astype(np.int64)
    wb = np.where(ib >= 0, offs[ib + 1] - offs[ib], 0).astype(np.int64)
    tot = wa + wb
    inter = np.zeros(len(ia), dtype=np.int64)
    starts_a = np.where(ia >= 0, offs[np.maximum(ia, 0)], 0)
    starts_b = np.where(ib >= 0, offs[np.maximum(ib, 0)], 0)

    def fill(M, widths, starts, col_off):
        total = int(widths.sum())
        if total == 0:
            return
        rows = np.repeat(np.arange(len(widths), dtype=np.int64), widths)
        within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(widths) - widths, widths)
        M[rows, col_off[rows] + within] = values[np.repeat(starts, widths) + within]

    # 16/32 classes matter for token-set jaccard (blocking pair emission):
    # ~8-token sides would pad 4× into a 64-wide scratch otherwise
    bounds = (16, 32, 64, 256, 1024, 4096, 16384)
    lo = 0
    for hi in bounds + (None,):
        mask = (tot > lo) & (tot <= hi) if hi is not None else tot > lo
        lo = hi if hi is not None else lo
        sel = np.nonzero(mask)[0]
        if len(sel) == 0:
            continue
        if hi is None:
            for r in sel:  # pathological giants — per-row exact intersect
                a = values[starts_a[r]: starts_a[r] + wa[r]]
                b = values[starts_b[r]: starts_b[r] + wb[r]]
                inter[r] = len(np.intersect1d(a, b, assume_unique=True))
            continue
        buf = _scratch(hi)
        chunk = buf.shape[0]
        for i in range(0, len(sel), chunk):
            s = sel[i: i + chunk]
            W = int(tot[s].max())
            M = buf[: len(s), :W]
            M[...] = _SENTINEL
            zeros = np.zeros(len(s), dtype=np.int64)
            fill(M, wa[s], starts_a[s], zeros)
            fill(M, wb[s], starts_b[s], wa[s])
            M.sort(axis=1)
            eq = (M[:, 1:] == M[:, :-1]) & (M[:, 1:] != _SENTINEL)
            inter[s] = eq.sum(axis=1)
    return inter, wa, wb


class GramSetVerify:
    """Batch fn over candidate (id_left, id_right) pairs → + jaccard, via a
    per-worker broadcast store of pre-hashed per-doc shingle sets. Exact
    (same hash-collision caveat as JaccardVerify) but never re-hashes text:
    per pair it is one gather + one bounded row-sort. Broadcast-path only —
    the store must fit in worker heap; the join path keeps text-based
    verification for beyond-object-store corpora."""

    def __init__(self, refs, key: str):
        self.refs = refs
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("jaccard", pa.array([], type=pa.float64()))
        from ..state.worker_cache import cached_build

        index, values, offs = cached_build(
            f"gramstore:{self.key}", lambda: _gram_store_from_refs(self.refs)
        )
        ia = index.get_indexer(batch["id_left"].to_numpy(zero_copy_only=False))
        ib = index.get_indexer(batch["id_right"].to_numpy(zero_copy_only=False))
        inter, na, nb = _intersect_sorted_sets(values, offs, ia, ib)
        union = na + nb - inter
        jac = np.where(
            (na == 0) & (nb == 0), 1.0,
            np.where((na == 0) | (nb == 0), 0.0, inter / np.maximum(union, 1)),
        )
        # ids absent from the gram store are UNKNOWN, not empty — a pair of
        # two unknown ids must not ride the both-empty=1.0 rule into being
        # declared an exact near-duplicate
        jac[(ia < 0) | (ib < 0)] = 0.0
        return batch.append_column("jaccard", pa.array(jac, type=pa.float64()))


def _resolve_dedup_attach_mode(
    ds: Dataset,
    text_col: str,
    broadcast_max_fraction: float = 0.25,
    n_rows: int | None = None,
    mean_text: float | None = None,
) -> str:
    """Sizing probe for the verify path: the broadcast gram store holds one
    uint64 per distinct shingle per doc (≤ 8 B/char for char-4 grams, before
    per-doc dedup) plus the id index. Flip to the join path when that exceeds
    the object-store budget (same policy as er_pipeline.resolve_scale_paths).

    Callers that already know the corpus size pass ``n_rows``/``mean_text`` so
    the probe costs nothing; otherwise the count + sample each execute the
    (ideally already-materialized) upstream once."""
    import ray

    if n_rows is None:
        n_rows = ds.count()
    if mean_text is None:
        sample = ds.select_columns([text_col]).limit(1024).take_all()
        mean_text = float(np.mean([len(r[text_col] or "") for r in sample])) if sample else 0.0
    est = n_rows * (mean_text * 8.0 + 64.0)
    store = float(ray.cluster_resources().get("object_store_memory", 0.0)) or 2.0**31
    mode = "broadcast" if est <= broadcast_max_fraction * store else "join"
    logger.info(
        "dedup scale probe: %d docs × %.0f B/text → est gram store %.1f MiB vs budget %.1f MiB → %s",
        n_rows, mean_text, est / 2**20, broadcast_max_fraction * store / 2**20, mode,
    )
    return mode


def near_dup_clusters(
    ds: Dataset,
    candidates: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle: str = "char4",
    num_partitions: int = 8,
    attach_mode: str = "auto",
    probe_rows: int | None = None,
    probe_mean_text: float | None = None,
) -> Dataset:
    """Verify candidates by exact shingle-Jaccard ≥ threshold, close
    transitively, and emit (doc_id, dup_group, group_size); dup_group = min
    doc id of the near-dup cluster. ``attach_mode="broadcast"`` verifies
    against a per-worker store of pre-hashed doc shingle sets (each doc
    hashed once, not once per pair); ``attach_mode="join"`` is the
    beyond-object-store path (texts ride with pairs via distributed join);
    ``attach_mode="auto"`` (default) picks by the gram-store sizing probe.
    In auto mode a lazy ``ds`` is materialized ONCE before probing (the probe
    needs a count + sample and the verify stage re-reads docs — without this
    a lazy upstream would execute three times); pass ``probe_rows`` /
    ``probe_mean_text`` to skip both the probe executions and the
    materialization when the stats are already known."""
    if attach_mode == "auto":
        if probe_rows is None or probe_mean_text is None:
            ds = ds.materialize()
        attach_mode = _resolve_dedup_attach_mode(
            ds, text_col, n_rows=probe_rows, mean_text=probe_mean_text
        )
    if attach_mode == "broadcast":
        refs = build_gram_set_refs(ds, text_col=text_col, id_col=id_col, shingle=shingle)
        key = f"{refs[0].hex() if refs else 'empty'}:{len(refs)}:{shingle}"
        verifier = GramSetVerify(refs, key)
        verified = candidates.map_batches(
            lambda t, v=verifier: v(t), batch_format="pyarrow", zero_copy_batch=True,
        ).map_batches(lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold)), batch_format="pyarrow")
    else:
        from .joins import attach_doc_columns

        # Scale the attach-join bucket count with corpus size: each bucket is
        # one map_groups task whose output block carries candidate pairs with
        # BOTH texts attached, and the fused verify kernel inherits that task
        # granularity (see er_pipeline.resolve_scale_paths for the measured
        # failure mode at a fixed count). ~5k docs of pairs per bucket keeps
        # blocks tens-of-MiB; floored at cluster width.
        import ray as _ray

        if probe_rows is None:
            ds = ds.materialize()  # count + two downstream reads — one execution
            n_docs_est = ds.count()
        else:
            n_docs_est = probe_rows
        ncpu = int(_ray.cluster_resources().get("CPU", 8))
        attach_par = int(min(4096, max(num_partitions, ncpu, -(-n_docs_est // 5_000))))
        # Cut the streaming DAG at the candidate boundary. Left lazy, the LSH
        # band sort + pair-dedup shuffles fuse with the two attach joins, the
        # verify kernel and the CC contraction into ONE topology with ~8
        # all-to-all stages — at 500k docs the driver's scheduling loop spent
        # ~100% CPU on per-step bundle/metrics accounting over that operator
        # DAG and task dispatch starved (measured 3 tasks/min with 31 idle
        # cores; stack: streaming_executor._update_stats_metrics /
        # process_completed_tasks). The candidate table is ids-only
        # (~16 B/row), so this cut is cheap, and it is the same stage
        # boundary a resumable 100-TB run persists anyway.
        import time as _time

        _t0 = _time.time()
        candidates = candidates.materialize()
        logger.info(
            "dedup join path: %d candidate pairs materialized in %.1fs (attach_par=%d)",
            candidates.count(), _time.time() - _t0, attach_par,
        )
        docs_proj = ds.select_columns([id_col, text_col]).rename_columns({id_col: "doc_id", text_col: "norm_text"})
        # static schemas: the LSH candidate stream is a lazy pipeline — a
        # schema probe would execute its band sorts in full (see hash_join)
        ds_schema = _arrow_schema_of(ds)
        cand_id_t = ds_schema.field(id_col).type
        with_texts = attach_doc_columns(
            candidates, docs_proj, {"norm_text": ("src_text", "cand_text")}, mode=attach_mode,
            num_partitions=attach_par,
            pairs_schema=pa.schema([pa.field("id_left", cand_id_t), pa.field("id_right", cand_id_t)]),
            docs_schema=pa.schema([pa.field("doc_id", cand_id_t),
                                   pa.field("norm_text", ds_schema.field(text_col).type)]),
        )
        verifier = JaccardVerify(shingle=shingle)
        verified = with_texts.map_batches(
            lambda t, v=verifier: v(t), batch_format="pyarrow", zero_copy_batch=True,
        ).map_batches(lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold)), batch_format="pyarrow")
        # Second DAG cut before the contraction (same driver-overload failure
        # mode as above): the verified edge list is (id, id, jaccard) —
        # tiny relative to the text-carrying join stream it distills — and
        # its real size lets the CC bucket count scale with the graph
        # instead of inheriting a fixed default.
        _t0 = _time.time()
        verified = verified.materialize()
        n_edges = verified.count()
        num_partitions = int(min(4096, max(num_partitions, ncpu, -(-n_edges // 1_500_000))))
        logger.info(
            "dedup join path: %d verified edges materialized in %.1fs (cc_partitions=%d)",
            n_edges, _time.time() - _t0, num_partitions,
        )
    id_type = None
    for f_ in _arrow_schema_of(ds):
        if f_.name == id_col:
            id_type = f_.type
    return pairs_to_dup_groups(verified, id_type, num_partitions=num_partitions)


def pairs_to_dup_groups(pairs: Dataset, id_type, num_partitions: int = 8) -> Dataset:
    """(id_left, id_right) edge list → (doc_id, dup_group) via distributed CC;
    dup_group = min doc id of the component. CC operates on string node ids
    (its min-label sentinel is a string); numeric ids are zero-padded so
    lexicographic order == numeric order, then cast back on the way out."""
    numeric = id_type is not None and pa.types.is_integer(id_type)

    def to_str(t: pa.Table) -> pa.Table:
        if numeric:
            u = pa.array(np.char.zfill(
                t["id_left"].to_numpy(zero_copy_only=False).astype("U20"), 20))
            v_ = pa.array(np.char.zfill(
                t["id_right"].to_numpy(zero_copy_only=False).astype("U20"), 20))
        else:
            u = pc.cast(t["id_left"], pa.string())
            v_ = pc.cast(t["id_right"], pa.string())
        return pa.table({"u": u, "v": v_})

    edges = pairs.map_batches(to_str, batch_format="pyarrow", zero_copy_batch=True)
    labels = connected_components(edges, num_partitions=num_partitions)

    def from_str(t: pa.Table) -> pa.Table:
        node = t["node"]
        grp = t["label"]
        if numeric:
            node = pc.cast(node, id_type)
            grp = pc.cast(grp, id_type)
        return pa.table({"doc_id": node, "dup_group": grp})

    return labels.map_batches(from_str, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_bands: int = 16,
    rows_per_band: int = 8,
    shingle: str = "char4",
    attach_mode: str = "auto",
) -> Dataset:
    """Full MinHash-LSH near-dedup: (doc_id, dup_group) for docs that belong
    to a near-dup cluster (singletons omitted — they keep themselves).
    ``attach_mode`` threads through to the verify stage (see
    :func:`near_dup_clusters`); "join" is the beyond-object-store path."""
    cands = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col, n_bands=n_bands, rows_per_band=rows_per_band, shingle=shingle
    )
    return near_dup_clusters(
        ds, cands, text_col=text_col, id_col=id_col, threshold=threshold,
        shingle=shingle, attach_mode=attach_mode,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_batch(token_hashes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(n_rows,) uint64 SimHash from a flat token-hash layout (vectorized).

    Bit b of the output is set iff more than half the row's token hashes have
    bit b set (ties → unset, matching sign(v)>0 of the classic ±1 sum).
    Zero-token rows → 0."""
    n = len(counts)
    out = np.zeros(n, dtype=np.uint64)
    if token_hashes.size == 0:
        return out
    bits = np.unpackbits(token_hashes.view(np.uint8), bitorder="little").reshape(-1, 64)
    nz = counts > 0
    starts = (np.cumsum(counts) - counts)[nz]
    sums = np.add.reduceat(bits.astype(np.int64), starts, axis=0)  # (n_nz, 64)
    set_bits = (2 * sums) > counts[nz][:, None]
    packed = np.packbits(set_bits.astype(np.uint8), axis=1, bitorder="little")
    out[nz] = np.ascontiguousarray(packed).view(np.uint64).ravel()
    return out


def simhash64(tokens: List[str]) -> np.uint64:
    """Classic 64-bit SimHash over token hashes (unweighted)."""
    hs = stable_token_hashes(list(tokens))
    return simhash_batch(hs, np.array([len(tokens)], dtype=np.int64))[0]


class SimHashKeys:
    """Batch fn: text → simhash + 4×16-bit band keys (detects Hamming ≤ 3 by
    pigeonhole: at least one band is identical). Vectorized."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", hash_mode: str = "fast"):
        self.text_col = text_col
        self.id_col = id_col
        # "md5" makes signatures replicable by an external SQL oracle
        # (DuckDB md5()); "fast" is the vectorized polynomial hash.
        self.token_hasher = md5_hash_strings if hash_mode == "md5" else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"band_key": pa.array([], type=pa.string()), "doc_id": batch[self.id_col],
                 "simhash": pa.array([], type=pa.uint64())}
            )
        h, counts = shingle_hashes_batch(batch[self.text_col], "word", token_hasher=self.token_hasher)
        sigs = simhash_batch(h, counts)  # (n,)
        chunks = np.empty((n, 4), dtype=np.uint64)
        for b in range(4):
            chunks[:, b] = (sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        hex4 = u64_to_hex_strings(chunks.ravel()).reshape(n, 4)
        prefixes = np.array([f"s{b}:" for b in range(4)], dtype="U4")
        keys = np.char.add(np.broadcast_to(prefixes, (n, 4)), hex4).ravel()
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))
        return pa.table(
            {
                "band_key": pa.array(keys),
                "doc_id": pc.take(batch[self.id_col], idx),
                "simhash": pa.array(np.repeat(sigs, 4)),
            }
        )


def simhash_candidates(ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3, hash_mode: str = "fast") -> Dataset:
    """Candidate near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Recall is exact for max_hamming ≤ 3 (4×16-bit bands, pigeonhole), so with
    ``hash_mode="md5"`` the output is the deterministic set of ALL pairs at
    Hamming ≤ 3 — replicable by a SQL oracle computing md5-based simhashes.

    Exactness means pair volume is inherently O(Σ m²) over near-identical
    clusters of size m — on a dup-dense corpus (e.g. the ×100 replica scale
    corpus, m ≈ 100-200) that is quadratic per cluster BY CONTRACT. The
    emitted rows are ids+hamming only (no text riding), so the cost is a
    bounded shuffle, not an object-store blowup; for cluster-shaped dedup at
    that density use minhash_lsh_dedup, whose star cap is O(m) per giant
    group (see _pairs_from_band_groups)."""
    keyer = SimHashKeys(text_col=text_col, id_col=id_col, hash_mode=hash_mode)
    keys = ds.map_batches(lambda t, k=keyer: k(t), batch_format="pyarrow", zero_copy_batch=True)

    _POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)

    def emit_bucket(g: pa.Table) -> pa.Table:
        """All intra-band pairs of the bucket, vectorized (no per-key loop):
        one sort, size-class triu emission, one xor+popcount pass over every
        emitted pair. No salting — exact recall at Hamming ≤ 3 is the
        operator's contract (the SQL oracle replicates ALL such pairs)."""
        id_type = g.schema.field("doc_id").type
        empty = pa.table(
            {"id_left": pa.array([], type=id_type), "id_right": pa.array([], type=id_type),
             "hamming": pa.array([], type=pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        kc, ids, take_idx, _ = _key_sorted_dedup(g, "band_key", "doc_id")
        sigs = (
            pc.take(g["simhash"], pa.array(take_idx))
            .combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        starts, sizes = _group_bounds(kc, len(kc))
        il, ir = _triu_pairs(starts, sizes, np.ones(len(starts), dtype=bool))
        if len(il) == 0:
            return empty
        x = sigs[il] ^ sigs[ir]
        ham = _POPCNT[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {"id_left": pa.array(ids[il][keep], type=id_type),
             "id_right": pa.array(ids[ir][keep], type=id_type),
             "hamming": pa.array(ham[keep], type=pa.int64())}
        )

    from .blocking import bucketed_apply

    pairs = bucketed_apply(keys, ["band_key"], emit_bucket, num_buckets=64,
                           repartition=False, batch_format="pyarrow")

    def min_hamming(g: pa.Table) -> pa.Table:
        out = g.group_by(["id_left", "id_right"]).aggregate([("hamming", "min")])
        return out.rename_columns(["id_left", "id_right", "hamming"])

    return bucketed_apply(
        pairs, ["id_left", "id_right"], min_hamming, num_buckets=64,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------
class HyperplaneLSHKeys:
    """Random-hyperplane sign LSH over an embedding column: n_tables keys of
    n_bits sign bits each. The (normalized) vector RIDES WITH each band row so
    within-bucket verification needs no lookup table — write amplification is
    n_tables × vector, traded for zero driver-side state at any scale."""

    def __init__(self, dim: int, vec_col: str = "embedding", id_col: str = "vec_id",
                 n_tables: int = 4, n_bits: int = 8, seed: int = 11):
        if n_bits > 64:
            raise ValueError("n_bits must be <= 64 (keys pack into one uint64)")
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(n_tables, n_bits, dim)
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"band_key": pa.array([], type=pa.string()), "doc_id": batch[self.id_col],
                 "vec": pa.array([], type=pa.list_(pa.float64()))}
            )
        from .similarity import _vecs_from_list_column

        vecs = _vecs_from_list_column(batch[self.vec_col])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        vn = vecs / norms[:, None]
        n_tables, n_bits = self.planes.shape[0], self.planes.shape[1]
        out_key = []
        for t in range(n_tables):
            signs = (vecs @ self.planes[t].T) > 0  # (n, n_bits)
            # pack sign bits into one uint64 word, hex vectorized — no
            # per-row Python join
            padded = np.zeros((n, 64), dtype=np.uint8)
            padded[:, :n_bits] = signs
            words = np.ascontiguousarray(
                np.packbits(padded, axis=1, bitorder="little")
            ).view(np.uint64).ravel()
            out_key.append(np.char.add(f"h{t}:", u64_to_hex_strings(words)))
        keys = np.concatenate(out_key)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), n_tables))
        dim = vn.shape[1]
        vn_list = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32), type=pa.int32()),
            pa.array(vn.ravel(), type=pa.float64()),
        )
        return pa.table(
            {
                "band_key": pa.array(keys),
                "doc_id": pc.take(batch[self.id_col], idx),
                "vec": pc.take(vn_list, idx),
            }
        )


def embedding_near_dup(
    ds: Dataset,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_tables: int = 4,
    n_bits: int = 8,
    max_group_size: int = 2048,
) -> Dataset:
    """(id_left, id_right, cosine) pairs with cosine ≥ threshold found via
    hyperplane LSH buckets. Verification happens INSIDE each band group using
    the vectors co-located by the band shuffle — no whole-dataset driver
    collect; oversized buckets are truncated to ``max_group_size`` sorted ids
    with the dropped count logged."""
    keyer = HyperplaneLSHKeys(dim=dim, vec_col=vec_col, id_col=id_col,
                              n_tables=n_tables, n_bits=n_bits)
    keys = ds.map_batches(lambda t, k=keyer: k(t), batch_format="pyarrow", zero_copy_batch=True)

    def emit_bucket(g: pa.Table) -> pa.Table:
        """Vectorized per-bucket pair emission (no per-key loop): one sort,
        per-group head-truncation of oversized buckets (logged), size-class
        triu pairs, then a single row-gathered dot-product pass. Arrow-native:
        the vectors come out of the list column ZERO-COPY
        (similarity._vecs_from_list_column) instead of a per-row .tolist()."""
        id_type = g.schema.field("doc_id").type
        empty = pa.table(
            {"id_left": pa.array([], type=id_type), "id_right": pa.array([], type=id_type),
             "cosine": pa.array([], type=pa.float64())}
        )
        if g.num_rows == 0:
            return empty
        kc, ids, take_idx, _ = _key_sorted_dedup(g, "band_key", "doc_id")
        starts, sizes = _group_bounds(kc, len(kc))
        pos = np.arange(len(kc)) - np.repeat(starts, sizes)
        keep_rows = pos < max_group_size
        for gi in np.nonzero(sizes > max_group_size)[0]:
            logger.info(
                "embedding lsh: bucket of %d truncated to %d", sizes[gi], max_group_size
            )
        if not keep_rows.all():
            kc, ids, take_idx = kc[keep_rows], ids[keep_rows], take_idx[keep_rows]
            starts, sizes = _group_bounds(kc, len(kc))
        il, ir = _triu_pairs(starts, sizes, np.ones(len(starts), dtype=bool))
        if len(il) == 0:
            return empty
        from .similarity import _vecs_from_list_column

        Vn = _vecs_from_list_column(pc.take(g["vec"], pa.array(take_idx)))
        sims = np.einsum("ij,ij->i", Vn[il], Vn[ir])
        keep = sims >= threshold
        return pa.table(
            {"id_left": pa.array(ids[il][keep], type=id_type),
             "id_right": pa.array(ids[ir][keep], type=id_type),
             "cosine": pa.array(sims[keep], type=pa.float64())}
        )

    from .blocking import bucketed_apply

    pairs = bucketed_apply(keys, ["band_key"], emit_bucket, num_buckets=64,
                           repartition=False, batch_format="pyarrow")

    def max_cosine(g: pa.Table) -> pa.Table:
        out = g.group_by(["id_left", "id_right"]).aggregate([("cosine", "max")])
        return out.rename_columns(["id_left", "id_right", "cosine"])

    return bucketed_apply(
        pairs, ["id_left", "id_right"], max_cosine, num_buckets=64,
        batch_format="pyarrow",
    )
