"""Document-table sources (reference analogue: CSV readers at
run_blocking.py:83, run_NER_model.py:24, apply_transitivity.py:80-83).

Primary input per BASELINE.json ``input_hint`` is a Lance table of interleaved
text+media documents. The ``lance`` package is not installed in this container,
so ``read_docs`` uses ``ray.data.read_lance`` when available and otherwise a
Parquet mirror of the identical schema — the Dataset that comes out is the same
either way.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from ..schema import DOCS_SCHEMA  # noqa: F401  (documented contract)


def read_docs(path: str, columns: Optional[List[str]] = None, **kwargs) -> Dataset:
    """Read the docs table (doc_id, spans) from a Lance dataset directory or a
    Parquet file/directory. Column pruning is pushed to the read."""
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        try:
            return rd.read_lance(path, columns=columns, **kwargs)
        except ImportError:
            pass  # lance not installed — fall through to parquet mirror
    return rd.read_parquet(path, columns=columns, **kwargs)


def lift_documents_to_spans(batch: pa.Table) -> pa.Table:
    """Lift a flat text table (doc_id:int64|string, text:string) into the
    interleaved-span docs shape — deterministic, no randomness.

    Each document becomes: [text span(first half), media span, text span(rest)]
    when long enough (>= 64 bytes), else a single text span. Used to run the
    ER pipeline over the driver's ``documents.parquet`` tables.

    Fully vectorized over the Arrow string buffers (no per-row Python): the
    split point is the byte after the last space in the first half of the
    text, found with one ``maximum.accumulate`` over the batch's value buffer,
    and the two text-span children share the input data buffer zero-copy
    (their offset arrays are assembled in numpy). Length/half are measured in
    UTF-8 bytes rather than codepoints — identical for ASCII, and for
    multi-byte text the cut still lands on a character boundary (space, or a
    boundary-adjusted fallback), so concatenating the text spans always
    reproduces the input text byte-for-byte.
    """
    import pyarrow.compute as pc

    doc_ids = batch["doc_id"]
    if not pa.types.is_string(doc_ids.type):
        doc_ids = pc.cast(doc_ids, pa.string())
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()

    texts = pc.fill_null(batch["text"], "")
    if not pa.types.is_string(texts.type):
        texts = pc.cast(texts, pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()

    n = len(texts)
    spans_type = DOCS_SCHEMA.field("spans").type
    if n == 0:
        return pa.Table.from_arrays(
            [doc_ids, pa.array([], type=spans_type)], names=["doc_id", "spans"]
        )

    # Raw value offsets (absolute byte positions into the data buffer) and data.
    off = np.frombuffer(texts.buffers()[1], dtype=np.int32,
                        count=n + 1, offset=texts.offset * 4).astype(np.int64)
    data_buf = texts.buffers()[2]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.empty(0, dtype=np.uint8))
    starts, ends = off[:-1], off[1:]
    nbytes = ends - starts
    long_mask = nbytes >= 64
    n_long = int(long_mask.sum())

    # Per-position "last space index at or before here" / "last char boundary
    # at or before here" — one pass each over the batch's bytes.
    cut = np.empty(n, dtype=np.int64)
    if n_long:
        idx = np.arange(len(data), dtype=np.int64)
        last_space = np.maximum.accumulate(np.where(data == 0x20, idx, -1))
        half = starts + (nbytes >> 1)
        ls = last_space[np.maximum(half[long_mask] - 1, 0)]
        # mirror str.rfind semantics: a space at position 0 of the text does
        # not count (reference loop used `cut > 0`), else cut = half.
        has_space = ls > starts[long_mask]
        fallback = half[long_mask]
        if not has_space.all():
            # half may land mid-codepoint; step back to a UTF-8 boundary
            last_boundary = np.maximum.accumulate(
                np.where((data & 0xC0) != 0x80, idx, -1)
            )
            fb = fallback[~has_space]
            fallback = fallback.copy()
            fallback[~has_space] = np.maximum(
                last_boundary[np.minimum(fb, len(data) - 1)], starts[long_mask][~has_space]
            )
        cut_long = np.where(has_space, ls + 1, fallback)
        cut[long_mask] = cut_long
    cut[~long_mask] = starts[~long_mask]

    # Child span layout: long rows emit 3 spans, short rows 1.
    counts = np.where(long_mask, 3, 1).astype(np.int64)
    list_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=list_off[1:])
    total = int(list_off[-1])
    row_first = list_off[:-1].astype(np.int64)
    long_first = row_first[long_mask]

    # text child: slices of the ORIGINAL data buffer — offsets only.
    # long row r contributes offsets [start, cut, cut, (end == next start)];
    # short row contributes [start, (end == next start)].
    text_off = np.empty(total + 1, dtype=np.int32)
    text_off[row_first] = starts
    text_off[long_first + 1] = cut[long_mask]
    text_off[long_first + 2] = cut[long_mask]
    text_off[total] = ends[-1]
    text_child = pa.Array.from_buffers(
        pa.string(), total,
        [None, pa.py_buffer(text_off.tobytes()),
         data_buf if data_buf is not None else pa.py_buffer(b"")],
    )

    # kind / media_ref / offset children (tiny per-span scalars).
    kind_vals = np.full(total, "text", dtype=object)
    kind_vals[long_first + 1] = "media"
    media_vals = np.full(total, "", dtype=object)
    if n_long:
        ids_np = doc_ids.to_numpy(zero_copy_only=False).astype(object)
        media_vals[long_first + 1] = "media://" + ids_np[long_mask] + "/0"
    offset_vals = np.zeros(total, dtype=np.int32)
    offset_vals[long_first + 1] = 1
    offset_vals[long_first + 2] = 2

    struct = pa.StructArray.from_arrays(
        [pa.array(kind_vals, type=pa.string()), text_child,
         pa.array(media_vals, type=pa.string()), pa.array(offset_vals, type=pa.int32())],
        fields=list(spans_type.value_type),
    )
    spans = pa.ListArray.from_arrays(pa.array(list_off, type=pa.int32()), struct)
    return pa.Table.from_arrays([doc_ids, spans], names=["doc_id", "spans"])


def read_flat_documents_as_docs(sf_dir: str) -> Dataset:
    """documents.parquet (doc_id, text, …) → docs Dataset (doc_id, spans)."""
    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(lift_documents_to_spans, batch_format="pyarrow")
    )


def read_records_csv_as_docs(
    path: str, id_col: str = "id1", text_col: str = "affil1"
) -> Dataset:
    """Ingest the reference's record CSV shape (``id1,affil1`` —
    affiliationstrings_ids.csv; read at run_NER_model.py:24,
    apply_transitivity.py:80-83) straight into the docs Dataset: a reference
    user can point this engine at their existing corpus file unchanged."""
    import pyarrow.compute as pc

    def to_flat(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        texts = t[text_col]
        if not pa.types.is_string(texts.type):
            texts = pc.cast(texts, pa.string())
        return pa.table({"doc_id": ids, "text": pc.fill_null(texts, "")})

    return (
        rd.read_csv(path)
        .map_batches(to_flat, batch_format="pyarrow")
        .map_batches(lift_documents_to_spans, batch_format="pyarrow")
    )


def write_docs(ds: Dataset, path: str) -> str:
    """Persist a docs Dataset: Lance when the package is present (the
    ``input_hint`` format), else partitioned Parquet of the identical schema.
    Returns the path written."""
    try:
        import lance  # noqa: F401

        ds.write_lance(path)
    except ImportError:
        ds.write_parquet(path)
    return path
