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
