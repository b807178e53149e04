"""Document chunking for RAG / training-sequence preparation.

``chunk_documents`` slices every document into overlapping fixed-size word
windows — the standard retrieval / context-window preparation step that sits
between curation and packing (stages/packing.py) in an LLM data pipeline.

Semantics (chosen to be exactly SQL-replicable, so the operator carries a
DuckDB oracle in ``__ray_entry__.oracle_sql``):

  * words   = whitespace split of ``trim(text)``; docs whose trimmed text is
    empty emit no chunks (the query/oracle filter them identically).
  * starts  = 1, 1+stride, 1+2·stride, … while start <= n_words — i.e.
    DuckDB's ``generate_series(1, len(w), stride)``; the final chunk may be
    shorter than ``chunk_words`` (down to 1 word) so no suffix is dropped.
  * chunk_text = words[start .. start+chunk_words-1] joined by a single
    space (whitespace runs inside the source text are collapsed).

Output columns: ``(id_col, chunk_start, n_chunk_words, chunk_text)`` with
``chunk_start`` the 1-based word index (stable chunk key within a doc).

Scale shape: doc-local → one ``map_batches`` pass, zero-copy Arrow in, no
shuffle, no state. The kernel is fully vectorized — the per-chunk word
gather is one ``take`` over the flattened word array driven by a
repeat/arange index, then one ``pc.binary_join``; no Python loop over rows
or chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.arrays import excl_cumsum


def chunk_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 64,
    stride_words: int = 48,
) -> pa.Table:
    """Vectorized per-batch chunking kernel (see module docstring)."""
    if chunk_words < 1 or stride_words < 1:
        raise ValueError("chunk_words and stride_words must be >= 1")
    texts = pc.fill_null(batch[text_col].combine_chunks(), "")
    trimmed = pc.utf8_trim_whitespace(texts)
    nonempty = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
    keep_idx = np.flatnonzero(nonempty)
    ids = batch[id_col].combine_chunks().take(pa.array(keep_idx))
    words = pc.split_pattern_regex(trimmed.take(pa.array(keep_idx)), pattern=r"\s+")

    n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    doc_off = excl_cumsum(n_words)  # start of each doc's words in `flat`

    # chunks per doc = ceil(n_words / stride)  (starts 0, s, 2s, … < n_words)
    n_chunks = -(-n_words // stride_words)
    total = int(n_chunks.sum())
    doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_chunks)
    ord_in_doc = np.arange(total, dtype=np.int64) - np.repeat(excl_cumsum(n_chunks), n_chunks)
    starts = ord_in_doc * stride_words  # 0-based word offset of each chunk
    lens = np.minimum(chunk_words, n_words[doc_idx] - starts)

    # one global gather: word index = doc_off + start + intra-chunk position
    gstart = doc_off[doc_idx] + starts
    widx = (
        np.arange(int(lens.sum()), dtype=np.int64)
        - np.repeat(excl_cumsum(lens), lens)
        + np.repeat(gstart, lens)
    )
    # int64 offsets + LargeList/large_string: a batch whose gathered
    # chunk-words (or their bytes) exceed 2^31 would silently wrap int32
    # offsets into a corrupt array (same discipline as bpe._to_symbol_table)
    chunk_offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lens, out=chunk_offsets[1:])
    gathered = pc.cast(flat, pa.large_string()).take(pa.array(widx))
    chunk_lists = pa.LargeListArray.from_arrays(pa.array(chunk_offsets), gathered)
    chunk_text = pc.binary_join(chunk_lists, pa.scalar(" ", pa.large_string()))

    return pa.table(
        {
            id_col: ids.take(pa.array(doc_idx)),
            "chunk_start": pa.array(starts + 1),  # 1-based, = SQL generate_series
            "n_chunk_words": pa.array(lens),
            "chunk_text": chunk_text,
        }
    )


def chunk_documents(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 64,
    stride_words: int = 48,
) -> Dataset:
    """Overlapping word-window chunks for every document (module docstring)."""
    return ds.map_batches(
        lambda t: chunk_batch(
            t,
            text_col=text_col,
            id_col=id_col,
            chunk_words=chunk_words,
            stride_words=stride_words,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def chunk_then_pack(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 64,
    stride_words: int | None = None,
    budget: int = 2048,
    num_buckets: int = 64,
) -> Dataset:
    """The composed RAG/pretraining prep path: chunk every document into word
    windows, then FFD-pack the chunks into ≤ ``budget``-token training
    sequences (stages/packing.pack_sequences) — the two stages a real
    pipeline runs back to back, composed as ONE streaming Dataset (chunking
    is doc-local map_batches; packing adds its single bucketed shuffle).

    ``stride_words`` defaults to ``chunk_words`` (non-overlapping windows),
    which makes token conservation EXACT across the whole composition:
    Σ sequence.total_tokens == Σ per-doc word counts — the driver self-gate.
    With overlap the identity still holds against the chunk table (every
    chunk's words land in exactly one sequence), just not against raw docs.

    Each chunk gets the synthetic int64 id ``doc_id·2³² + chunk_start``
    (requires integer doc ids < 2³¹ — the engine's id-renumbering contract),
    so sequences report exactly which (doc, offset) windows they contain."""
    stride = stride_words if stride_words is not None else chunk_words
    from .packing import pack_sequences

    chunks = chunk_documents(ds, text_col=text_col, id_col=id_col,
                             chunk_words=chunk_words, stride_words=stride)

    def add_uid(t: pa.Table) -> pa.Table:
        did = pc.cast(t[id_col], pa.int64())
        uid = pc.add(pc.multiply(did, pa.scalar(1 << 32, pa.int64())),
                     pc.cast(t["chunk_start"], pa.int64()))
        return t.append_column("chunk_uid", uid)

    keyed = chunks.map_batches(add_uid, batch_format="pyarrow", zero_copy_batch=True)
    return pack_sequences(keyed, text_col="chunk_text", id_col="chunk_uid",
                          budget=budget, num_buckets=num_buckets)
