"""Unit tests for text normalization (reference: src/common_methods.py:7-18)."""

import pyarrow as pa
import pytest

from entity_resolution__ray.functions import text_norm as tn

CASES = [
    "Café, IBM Research! 42",
    "",
    "ÉÉÉ",
    "U.S.A.  déjà-vu",
    "IBM Almaden Research Center; CA; USA",
    "Universität München",
    "   spaces   everywhere   ",
    "123-456_789",
]


def test_strip_accents_scalar():
    assert tn.strip_accents("café") == "cafe"
    assert tn.strip_accents("Universität") == "Universitat"
    assert tn.strip_accents("naïve résumé") == "naive resume"


def test_tokenize_scalar_matches_reference_semantics():
    assert tn.tokenize("Café, IBM!") == ["cafe", "ibm"]
    assert tn.tokenize(None) == []
    assert tn.tokenize(123) == ["123"]
    assert tn.tokenize("") == []


def test_vectorized_tokens_match_scalar():
    arr = pa.array(CASES)
    vec = tn.tokens_array(arr).to_pylist()
    for text, got in zip(CASES, vec):
        assert got == tn.tokenize(text), text


def test_vectorized_norm_text_matches_scalar():
    arr = pa.array(CASES)
    vec = tn.norm_text_array(arr).to_pylist()
    for text, got in zip(CASES, vec):
        assert got == tn.normalize_text(text), text


def test_fill_str():
    arr = pa.array(["a", None, "b"])
    assert tn.fill_str(arr).to_pylist() == ["a", "", "b"]
    nums = pa.array([1, None, 3])
    assert tn.fill_str(nums).to_pylist() == ["1", "", "3"]


def test_distinct_tokens_flat_null_elements():
    # null list elements factorize to -1; before the fix they wrapped to the
    # LAST vocab token, emitting a phantom duplicate (ADVICE r3)
    col = pa.array([["a", None, "b"], [None], ["b", "b", ""]], type=pa.list_(pa.string()))
    out = sorted(tn.distinct_tokens_flat(col).to_pylist())
    assert out == ["a", "b", "b"]  # per-row distinct; no phantom extra 'b', no None/""


def test_distinct_tokens_flat_all_null_rows():
    col = pa.array([None, None], type=pa.list_(pa.string()))
    assert tn.distinct_tokens_flat(col).to_pylist() == []
