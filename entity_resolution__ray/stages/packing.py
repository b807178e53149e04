"""Training-sequence packing: greedy document packing into fixed token budgets.

The last mile of an LLM data pipeline: documents (with token counts) are
packed into sequences of at most ``budget`` tokens so the trainer sees dense
batches instead of one padded document per row. Exact bin packing is NP-hard
and needs global state; the engine shape is LOCAL packing — hash-bucket the
docs, first-fit-decreasing inside each bucket (vectorized preparation, one
linear pass over the bucket's docs) — which wastes at most one partial
sequence per bucket versus a global packer and needs exactly one shuffle.
Oversized documents are CHUNKED (split into ``ceil(n/budget)`` budget-sized
pieces) rather than dropped, so coverage is exact: every input token lands in
exactly one output sequence.

Determinism: bucket ids are splitmix64 hashes of the doc id, FFD ties break
by doc id, and sequence ids are ``bucket * 2^32 + local_index`` — stable
across runs and cluster sizes. No SQL oracle exists (greedy packing is not
relational); invariants (exact coverage, budget bound, determinism) are
pytest-gated and cheap to re-verify distributedly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _ffd_pack(sizes: np.ndarray, budget: int):
    """First-fit-decreasing over one bucket: returns an int64 array of
    sequence indices (0-based) per doc. Sizes must be <= budget.

    The fit loop is O(docs × open_bins) worst case but bins close as they
    fill; for training-data distributions (sizes ≪ budget) it is ~linear.
    A true per-doc Python loop is acceptable HERE because the outer unit is
    a bucket (one task of thousands), not the corpus."""
    order = np.argsort(-sizes, kind="stable")
    bins: list = []  # remaining capacity per open bin
    out = np.empty(len(sizes), dtype=np.int64)
    for i in order:
        s = int(sizes[i])
        for b, rem in enumerate(bins):
            if rem >= s:
                bins[b] = rem - s
                out[i] = b
                break
        else:
            bins.append(budget - s)
            out[i] = len(bins) - 1
    return out


def pack_sequences(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    num_buckets: int = 64,
) -> Dataset:
    """Pack documents into training sequences of <= ``budget`` whitespace
    tokens. Output rows: one per sequence —
    (seq_id: int64, doc_ids: list<id>, chunk_idxs: list<int32>,
    n_docs: int64, total_tokens: int64).

    ``chunk_idxs[i]`` is 0 for whole documents; oversized docs appear as
    multiple (doc_id, chunk) members, each chunk <= budget tokens."""
    from .blocking import bucketed_apply
    from ..functions.hashing import hash_column

    def count_and_chunk(t: pa.Table) -> pa.Table:
        id_t = t.schema.field(id_col).type
        empty = pa.table({
            id_col: pa.array([], type=id_t),
            "chunk_idx": pa.array([], type=pa.int32()),
            "n_tokens": pa.array([], type=pa.int64()),
            "__bkt": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        txt = pc.fill_null(t[text_col], "")
        n_tok = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), r"\s+")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.where(
            pc.equal(pc.utf8_trim_whitespace(txt), "").to_numpy(zero_copy_only=False),
            0, n_tok)
        # chunk oversized docs: ceil(n/budget) pieces, last piece gets the
        # remainder; zero-token docs still emit one (empty) member so
        # coverage stays exact
        n_chunks = np.maximum((n_tok + budget - 1) // budget, 1)
        rep = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_chunks)
        chunk = (np.arange(int(n_chunks.sum()), dtype=np.int64)
                 - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        sizes = np.minimum(n_tok[rep] - chunk * budget, budget)
        bkt = (hash_column(t[id_col]) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            id_col: pc.take(t[id_col], pa.array(rep)),
            "chunk_idx": pa.array(chunk.astype(np.int32)),
            "n_tokens": pa.array(sizes),
            "__bkt": pa.array(bkt[rep]),
        })

    members = docs.map_batches(count_and_chunk, batch_format="pyarrow",
                               zero_copy_batch=True)

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "seq_id": pd.Series(dtype=np.int64),
                "doc_ids": pd.Series(dtype=object),
                "chunk_idxs": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype=np.int64),
                "total_tokens": pd.Series(dtype=np.int64),
            })
        outs = []
        # one shuffle group can hold several __bkt values (the group key is a
        # re-hash) — pack each packing bucket independently so seq_id
        # prefixes never collide
        for bkt, sub in g.groupby("__bkt", sort=True):
            # deterministic member order before FFD's stable sort
            sub = sub.sort_values([id_col, "chunk_idx"], kind="mergesort").reset_index(drop=True)
            seq_local = _ffd_pack(sub["n_tokens"].to_numpy(np.int64), budget)
            sub = sub.assign(__seq=seq_local)
            agg = sub.groupby("__seq", sort=True).agg(
                doc_ids=(id_col, list),
                chunk_idxs=("chunk_idx", list),
                n_docs=(id_col, "size"),
                total_tokens=("n_tokens", "sum"),
            ).reset_index()
            if len(agg) > (1 << 32):
                raise ValueError(
                    f"pack_sequences: bucket {bkt} produced {len(agg)} "
                    "sequences, overflowing the 32-bit local id slot — raise "
                    "num_buckets so each bucket packs fewer docs")
            agg["seq_id"] = (int(bkt) << 32) + agg["__seq"].astype(np.int64)
            outs.append(agg[["seq_id", "doc_ids", "chunk_idxs", "n_docs", "total_tokens"]])
        return pd.concat(outs, ignore_index=True)

    return bucketed_apply(members, ["__bkt"], pack_bucket, num_buckets=num_buckets)
