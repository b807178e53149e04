"""Tests for the normalize stage: span flatten correctness + the per-row
span-sequence invariant (kind, text, media_ref, order) end-to-end."""

import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.normalize import NormalizeDocs, flatten_spans_to_text, normalize_docs
from entity_resolution__ray.testgen import full_text_of_spans, generate_corpus


def test_flatten_spans_matches_scalar_reference():
    docs, _, _ = generate_corpus(n_entities=20, seed=7)
    got = flatten_spans_to_text(docs["spans"]).to_pylist()
    want = [full_text_of_spans(s) for s in docs["spans"].to_pylist()]
    assert got == want


def test_flatten_respects_offset_order_not_list_order():
    # spans deliberately stored out of offset order → flatten must re-order
    spans_type = pa.list_(
        pa.struct(
            [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
        )
    )
    rows = [
        [
            {"kind": "text", "text": "world", "media_ref": "", "offset": 2},
            {"kind": "media", "text": "", "media_ref": "m://x", "offset": 1},
            {"kind": "text", "text": "hello ", "media_ref": "", "offset": 0},
        ],
        [],
    ]
    arr = pa.array(rows, type=spans_type)
    assert flatten_spans_to_text(arr).to_pylist() == ["hello world", ""]


def test_normalize_batch_fn_adds_columns_and_preserves_spans():
    docs, _, _ = generate_corpus(n_entities=10, seed=3)
    out = NormalizeDocs()(docs)
    assert out.column_names == ["doc_id", "spans", "full_text", "norm_text", "tokens", "countries"]
    # span-sequence invariant: byte-equality of the spans column
    assert out["spans"].combine_chunks().equals(docs["spans"].combine_chunks())
    row = out.to_pylist()[0]
    assert row["norm_text"] == " ".join(row["tokens"])


def test_normalize_docs_dataset_span_invariant(ray_session):
    docs, _, _ = generate_corpus(n_entities=15, seed=11)
    ds = rd.from_arrow(docs)
    out = normalize_docs(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(orig)
    for got, want in zip(out["spans"], orig["spans"]):
        got_seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got]
        want_seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want]
        assert got_seq == want_seq


def test_countries_extracted_per_doc():
    docs, _, _ = generate_corpus(n_entities=40, seed=5)
    out = NormalizeDocs()(docs).to_pylist()
    n_with_country = sum(1 for r in out if r["countries"])
    assert n_with_country > len(out) * 0.9  # corpus always renders a country form
