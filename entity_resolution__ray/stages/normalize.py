"""Normalization stage: span flatten (M11) + text normalization (M1/M2/M7) +
per-document country extraction (M4-M6 hoisted from per-pair to per-doc).

Reference analogues:
  * span→text flatten — implied by BASELINE.json input_hint (the reference's
    flat ``affil1`` string equals the concatenation of kind=="text" spans in
    offset order); the ``spans`` column passes through BYTE-UNTOUCHED — the
    per-row span-sequence invariant (kind, text, media_ref, order).
  * tokenize/normalize — /root/reference/src/common_methods.py:7-18
  * country extraction — /root/reference/src/constraints/geo_constraints.py:72-110
    (computed once per record instead of per pair, SURVEY.md M6)

Ray shape: a single stateless-by-data, stateful-by-setup ``map_batches`` class
(actor pool) over zero-copy Arrow batches; regex compilation happens once per
actor in ``__init__``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.geo import CountryExtractor
from ..functions.text_norm import norm_text_array, tokens_array


def flatten_spans_to_text(spans: pa.ChunkedArray | pa.ListArray) -> pa.Array:
    """Vectorized M11: per row, concatenate kind=="text" span texts in offset
    order → full_text string array. Never mutates the spans column."""
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = len(spans)
    flat = spans.flatten()  # StructArray of all spans, row-major
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))

    is_text = pc.fill_null(pc.equal(flat.field("kind"), "text"), False) \
        .to_numpy(zero_copy_only=False).astype(bool)
    span_offset = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
    texts = flat.field("text")

    # order within each row by the span's own offset (the declared span order)
    order = np.lexsort((span_offset, row_idx))
    row_sorted = row_idx[order]
    keep = is_text[order]
    kept_rows = row_sorted[keep]
    kept_texts = texts.take(pa.array(order[keep]))

    counts = np.bincount(kept_rows, minlength=n)
    new_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=new_offsets[1:])
    lists = pa.ListArray.from_arrays(pa.array(new_offsets), kept_texts)
    return pc.binary_join(lists, "")


class NormalizeDocs:
    """Actor-pool batch fn: (doc_id, spans) → + full_text, norm_text, tokens,
    countries. Spans pass through untouched (span-sequence invariant)."""

    def __init__(self):
        self.country_extractor = CountryExtractor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        full_text = flatten_spans_to_text(batch["spans"])
        norm_text = norm_text_array(full_text)
        tokens = tokens_array(full_text)
        countries = pa.array(
            self.country_extractor.extract_batch(full_text.to_pylist()),
            type=pa.list_(pa.string()),
        )
        return (
            batch.append_column("full_text", full_text)
            .append_column("norm_text", norm_text)
            .append_column("tokens", tokens)
            .append_column("countries", countries)
        )


def _normalize_batch(batch: pa.Table, extract_countries: bool = True) -> pa.Table:
    """Task-based normalize: the compiled CountryExtractor is built once per
    worker process (state/worker_cache) — actor-pool amortization without a
    pool; tasks stay elastic across the cluster."""
    full_text = flatten_spans_to_text(batch["spans"])
    norm_text = norm_text_array(full_text)
    tokens = tokens_array(full_text)
    out = (
        batch.append_column("full_text", full_text)
        .append_column("norm_text", norm_text)
        .append_column("tokens", tokens)
    )
    if extract_countries:
        from ..state.worker_cache import cached_build

        extractor = cached_build("country_extractor", CountryExtractor)
        countries = pa.array(extractor.extract_batch(full_text.to_pylist()), type=pa.list_(pa.string()))
        out = out.append_column("countries", countries)
    return out


def normalize_docs(
    docs: Dataset,
    concurrency=None,
    batch_size: Optional[int] = None,
    extract_countries: bool = True,
) -> Dataset:
    """docs (doc_id, spans) → NORMALIZED_DOCS_SCHEMA.

    ``batch_size=None`` (default) keeps one task per input block: a fixed
    batch_size would COALESCE many small blocks into few tasks (observed: a
    32-block corpus collapsing to 2 normalize tasks, which then starves every
    downstream stage since Ray sort/groupby output block counts follow their
    input). Block size — set by the read or an upstream repartition — is the
    parallelism contract; this stage preserves it.

    ``extract_countries=False`` drops the regex country-detection pass (and
    the ``countries`` column) — it is ~90% of this stage's per-doc compute,
    pure waste when the pipeline runs with geo constraints off."""
    import functools

    return docs.map_batches(
        functools.partial(_normalize_batch, extract_countries=extract_countries),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
