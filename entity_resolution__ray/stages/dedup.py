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
                            within-bucket cosine ≥ threshold

All hash functions are seeded/stable across processes (blake2b + affine
permutations), so every stage is deterministic under any partitioning.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max, Min

from .blocking import MinHasher, char_qgrams, stable_token_hashes
from .clustering import connected_components
from .joins import _arrow_schema as _arrow_schema_of


def _content_hash_column(t: pa.Table, text_col: str) -> pa.Array:
    return pa.array(
        [hashlib.blake2b((s or "").encode(), digest_size=16).hexdigest() for s in t[text_col].to_pylist()],
        type=pa.string(),
    )


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
# MinHash-LSH near-dedup
# ---------------------------------------------------------------------------
class MinHashLSHKeys:
    """Batch fn: text → (band_key, doc_id) rows.

    signature length = bands × rows_per_band; docs with shingle-Jaccard ≥ t
    collide in ≥1 band with probability 1-(1-t^r)^b."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_bands: int = 16,
        rows_per_band: int = 4,
        shingle: str = "char4",
        seed: int = 99,
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.n_bands = n_bands
        self.r = rows_per_band
        self.shingle = shingle
        self.hasher = MinHasher(n_perm=n_bands * rows_per_band, seed=seed)

    def shingles(self, text: str) -> List[str]:
        if self.shingle == "char4":
            return char_qgrams(text, 4)
        if self.shingle == "word":
            return text.split()
        if self.shingle.startswith("word"):
            n = int(self.shingle[4:])
            toks = text.split()
            return [" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))] or toks
        raise ValueError(self.shingle)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_key, out_id = [], []
        for did, text in zip(ids, texts):
            sig = self.hasher.signature(stable_token_hashes(self.shingles(text or "")))
            for b in range(self.n_bands):
                chunk = sig[b * self.r : (b + 1) * self.r]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_key.append(f"b{b}:{h}")
                out_id.append(did)
        return pa.table({"band_key": pa.array(out_key, type=pa.string()), "doc_id": pa.array(out_id)})


def _pairs_from_band_groups(keys: Dataset, max_group_size: int = 512) -> Dataset:
    """band groups → canonical candidate pairs (deduped)."""

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        dtype = g["doc_id"].dtype  # keep id dtype stable so empty groups don't
        ids = sorted(set(g["doc_id"].tolist()))[:max_group_size]  # poison the shuffle
        if len(ids) < 2:
            return pd.DataFrame({"id_left": pd.Series(dtype=dtype), "id_right": pd.Series(dtype=dtype)})
        ii, jj = np.triu_indices(len(ids), 1)
        arr = np.array(ids, dtype=object)
        return pd.DataFrame(
            {"id_left": pd.Series(arr[ii], dtype=dtype), "id_right": pd.Series(arr[jj], dtype=dtype)}
        )

    from .blocking import bucketed_apply, bucketed_group_apply

    pairs = bucketed_group_apply(keys, "band_key", emit, num_buckets=64)
    return bucketed_apply(
        pairs, ["id_left", "id_right"],
        lambda g: g.drop_duplicates(["id_left", "id_right"]),
        num_buckets=64,
    )


def minhash_lsh_candidates(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 16,
    rows_per_band: int = 4,
    shingle: str = "char4",
) -> Dataset:
    keys = ds.map_batches(
        MinHashLSHKeys,
        fn_constructor_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "n_bands": n_bands,
            "rows_per_band": rows_per_band,
            "shingle": shingle,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return _pairs_from_band_groups(keys)


class JaccardVerify:
    """Batch fn over candidate pairs with src_text/cand_text → + jaccard; used
    by MinHash-LSH and n-gram dedup verify stages."""

    def __init__(self, shingle: str = "char4"):
        self.shingle = shingle

    def _set(self, text: str):
        if self.shingle == "char4":
            return set(char_qgrams(text or "", 4))
        if self.shingle == "word":
            return set((text or "").split())
        n = int(self.shingle[4:])
        toks = (text or "").split()
        return set(" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))) or set(toks)

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["src_text"].to_pylist()
        b = batch["cand_text"].to_pylist()
        out = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            sa, sb = self._set(a[i]), self._set(b[i])
            if not sa and not sb:
                out[i] = 1.0
            elif not sa or not sb:
                out[i] = 0.0
            else:
                inter = len(sa & sb)
                out[i] = inter / (len(sa) + len(sb) - inter)
        return batch.append_column("jaccard", pa.array(out, type=pa.float64()))


def near_dup_clusters(
    ds: Dataset,
    candidates: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle: str = "char4",
    num_partitions: int = 8,
) -> Dataset:
    """Verify candidates by exact shingle-Jaccard ≥ threshold, close
    transitively, and emit (doc_id, dup_group, group_size); dup_group = min
    doc id of the near-dup cluster."""
    import pyarrow.compute as pc

    from .joins import attach_doc_columns

    docs_proj = ds.select_columns([id_col, text_col]).rename_columns({id_col: "doc_id", text_col: "norm_text"})
    with_texts = attach_doc_columns(
        candidates, docs_proj, {"norm_text": ("src_text", "cand_text")}, mode="broadcast"
    )
    verified = with_texts.map_batches(
        JaccardVerify, fn_constructor_kwargs={"shingle": shingle},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    ).map_batches(lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold)), batch_format="pyarrow")
    # CC operates on string node ids (its min-label sentinel is a string);
    # numeric ids are zero-padded so lexicographic order == numeric order,
    # then cast back on the way out.
    id_type = None
    for f_ in _arrow_schema_of(ds):
        if f_.name == id_col:
            id_type = f_.type
    numeric = id_type is not None and pa.types.is_integer(id_type)

    def to_str(t: pa.Table) -> pa.Table:
        if numeric:
            u = pa.array([f"{v:020d}" for v in t["id_left"].to_pylist()], type=pa.string())
            v_ = pa.array([f"{v:020d}" for v in t["id_right"].to_pylist()], type=pa.string())
        else:
            u = pc.cast(t["id_left"], pa.string())
            v_ = pc.cast(t["id_right"], pa.string())
        return pa.table({"u": u, "v": v_})

    edges = verified.map_batches(to_str, batch_format="pyarrow", zero_copy_batch=True)
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
    rows_per_band: int = 4,
    shingle: str = "char4",
) -> Dataset:
    """Full MinHash-LSH near-dedup: (doc_id, dup_group) for docs that belong
    to a near-dup cluster (singletons omitted — they keep themselves)."""
    cands = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col, n_bands=n_bands, rows_per_band=rows_per_band, shingle=shingle
    )
    return near_dup_clusters(ds, cands, text_col=text_col, id_col=id_col, threshold=threshold, shingle=shingle)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash64(tokens: List[str]) -> np.uint64:
    """Classic 64-bit SimHash over token hashes (unweighted)."""
    if not tokens:
        return np.uint64(0)
    hs = stable_token_hashes(tokens)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for b in range(64):
        if v[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return out


class SimHashKeys:
    """Batch fn: text → simhash + 4×16-bit band keys (detects Hamming ≤ 3 by
    pigeonhole: at least one band is identical)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_key, out_id, out_sig = [], [], []
        for did, text in zip(ids, texts):
            sig = simhash64((text or "").split())
            for b in range(4):
                chunk = (int(sig) >> (16 * b)) & 0xFFFF
                out_key.append(f"s{b}:{chunk:04x}")
                out_id.append(did)
                out_sig.append(int(sig))
        return pa.table(
            {
                "band_key": pa.array(out_key, type=pa.string()),
                "doc_id": pa.array(out_id),
                "simhash": pa.array(out_sig, type=pa.uint64()),
            }
        )


def simhash_candidates(ds: Dataset, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3) -> Dataset:
    """Candidate near-dup pairs with Hamming(simhash) ≤ max_hamming."""
    keys = ds.map_batches(
        SimHashKeys,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        dtype = g["doc_id"].dtype
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame(
                {"id_left": pd.Series(dtype=dtype), "id_right": pd.Series(dtype=dtype),
                 "hamming": pd.Series(dtype=np.int64)}
            )
        ids = g["doc_id"].to_numpy(dtype=object)
        sigs = g["simhash"].to_numpy(dtype=np.uint64)
        ii, jj = np.triu_indices(n, 1)
        x = sigs[ii] ^ sigs[jj]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"id_left": pd.Series(ids[ii][keep], dtype=dtype),
             "id_right": pd.Series(ids[jj][keep], dtype=dtype),
             "hamming": ham[keep]}
        )

    from .blocking import bucketed_apply, bucketed_group_apply

    pairs = bucketed_group_apply(keys, "band_key", emit, num_buckets=64)
    return bucketed_apply(
        pairs, ["id_left", "id_right"],
        lambda g: g.groupby(["id_left", "id_right"], as_index=False).agg(hamming=("hamming", "min")),
        num_buckets=64,
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------
class HyperplaneLSHKeys:
    """Random-hyperplane sign LSH over an embedding column: n_tables keys of
    n_bits sign bits each."""

    def __init__(self, dim: int, vec_col: str = "embedding", id_col: str = "vec_id",
                 n_tables: int = 4, n_bits: int = 8, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(n_tables, n_bits, dim)
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        vecs = np.array(batch[self.vec_col].to_pylist(), dtype=np.float64)
        out_key, out_id = [], []
        if len(ids):
            for t in range(self.planes.shape[0]):
                signs = (vecs @ self.planes[t].T) > 0  # (n, n_bits)
                words = np.packbits(signs, axis=1)
                for i, did in enumerate(ids):
                    out_key.append(f"h{t}:{words[i].tobytes().hex()}")
                    out_id.append(did)
        return pa.table({"band_key": pa.array(out_key, type=pa.string()), "doc_id": pa.array(out_id)})


def embedding_near_dup(
    ds: Dataset,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_tables: int = 4,
    n_bits: int = 8,
) -> Dataset:
    """(id_left, id_right, cosine) pairs with cosine ≥ threshold found via
    hyperplane LSH buckets (scale path: no all-pairs compute)."""
    import ray

    keys = ds.map_batches(
        HyperplaneLSHKeys,
        fn_constructor_kwargs={"dim": dim, "vec_col": vec_col, "id_col": id_col,
                               "n_tables": n_tables, "n_bits": n_bits},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    # broadcast normalized vectors for within-bucket verification
    tbl = pa.concat_tables(
        list(ds.select_columns([id_col, vec_col]).iter_batches(batch_size=65536, batch_format="pyarrow"))
    )
    ids_all = tbl[id_col].to_pylist()
    V = np.array(tbl[vec_col].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    V = V / norms[:, None]
    lookup_ref = ray.put((dict(zip(ids_all, range(len(ids_all)))), V))

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        idx_map, Vn = ray.get(lookup_ref)
        ids = sorted(set(g["doc_id"].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"id_left": pd.Series(dtype=np.int64), "id_right": pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        rows = np.array([idx_map[i] for i in ids])
        sims = Vn[rows] @ Vn[rows].T
        ii, jj = np.triu_indices(len(ids), 1)
        keep = sims[ii, jj] >= threshold
        arr = np.array(ids)
        return pd.DataFrame({"id_left": arr[ii][keep], "id_right": arr[jj][keep], "cosine": sims[ii, jj][keep]})

    from .blocking import bucketed_apply, bucketed_group_apply

    pairs = bucketed_group_apply(keys, "band_key", emit, num_buckets=64)
    return bucketed_apply(
        pairs, ["id_left", "id_right"],
        lambda g: g.groupby(["id_left", "id_right"], as_index=False).agg(cosine=("cosine", "max")),
        num_buckets=64,
    )
