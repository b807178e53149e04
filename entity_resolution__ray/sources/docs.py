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
    when long enough (>= 64 chars), else a single text span. Used to run the
    ER pipeline over the driver's ``documents.parquet`` tables.
    """
    doc_ids = batch["doc_id"]
    if not pa.types.is_string(doc_ids.type):
        import pyarrow.compute as pc

        doc_ids = pc.cast(doc_ids, pa.string())
    texts = batch["text"].to_pylist()
    ids = doc_ids.to_pylist()
    spans_col = []
    for did, text in zip(ids, texts):
        text = text or ""
        if len(text) >= 64:
            half = len(text) // 2
            # split on a space so token content is preserved
            cut = text.rfind(" ", 0, half)
            cut = cut + 1 if cut > 0 else half
            spans_col.append(
                [
                    {"kind": "text", "text": text[:cut], "media_ref": "", "offset": 0},
                    {"kind": "media", "text": "", "media_ref": f"media://{did}/0", "offset": 1},
                    {"kind": "text", "text": text[cut:], "media_ref": "", "offset": 2},
                ]
            )
        else:
            spans_col.append([{"kind": "text", "text": text, "media_ref": "", "offset": 0}])
    return pa.Table.from_arrays(
        [doc_ids.combine_chunks() if isinstance(doc_ids, pa.ChunkedArray) else doc_ids,
         pa.array(spans_col, type=DOCS_SCHEMA.field("spans").type)],
        names=["doc_id", "spans"],
    )


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
