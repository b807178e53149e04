"""Text normalization kernels (reference: /root/reference/src/common_methods.py:7-18).

Semantics pinned to the reference:
  * ``strip_accents``: NFKD-normalize then drop all non-ASCII bytes (é → e).
  * ``tokenize``: lowercase → strip accents → extract runs of ``[A-Za-z0-9]+``.

Two implementations are provided: scalar Python (unit-testable ground truth) and
vectorized pyarrow/numpy versions used inside ``map_batches`` hot paths.
"""

from __future__ import annotations

import re
import unicodedata
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
_NON_ASCII_RE = re.compile(r"[^\x00-\x7F]+")
_NON_ALNUM_RE = r"[^a-z0-9]+"


# ---------------------------------------------------------------------------
# scalar reference implementations (used in tests and tiny driver-side paths)
# ---------------------------------------------------------------------------
def strip_accents(s: str) -> str:
    """NFKD-normalize and drop non-ASCII (common_methods.py:10-11)."""
    return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")


def tokenize(text) -> List[str]:
    """Lowercase + accent-strip + extract alphanumeric runs (common_methods.py:14-18)."""
    if not isinstance(text, str):
        text = "" if text is None else str(text)
    return TOKEN_RE.findall(strip_accents(text.lower()))


def normalize_text(text) -> str:
    """Space-joined tokens — the 'norm' form the reference feeds every string
    kernel (feautre_extraction.py:131-132)."""
    return " ".join(tokenize(text))


# ---------------------------------------------------------------------------
# vectorized implementations (pyarrow.compute) — used in map_batches stages
# ---------------------------------------------------------------------------
def strip_accents_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized strip_accents over a string array.

    ``pc.utf8_normalize(form="NFKD")`` then a regex delete of non-ASCII runs —
    byte-equivalent to the scalar version for any unicode input because NFKD
    factors accents into combining marks which are all non-ASCII.
    """
    norm = pc.utf8_normalize(arr, form="NFKD")
    return pc.replace_substring_regex(norm, pattern=_NON_ASCII_RE.pattern, replacement="")


def tokens_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized tokenize: returns ``list<string>`` of alphanumeric tokens."""
    lowered = pc.utf8_lower(arr)
    ascii_ = strip_accents_array(lowered)
    spaced = pc.replace_substring_regex(ascii_, pattern=_NON_ALNUM_RE, replacement=" ")
    trimmed = pc.utf8_trim_whitespace(spaced)
    split = pc.split_pattern(trimmed, pattern=" ")
    # "" splits to [""] — turn those into empty lists
    empty = pc.equal(trimmed, "")
    return pc.if_else(empty, pa.scalar([], type=pa.list_(pa.string())), split)


def norm_text_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized normalize_text: space-joined token list."""
    toks = tokens_array(arr)
    return pc.binary_join(toks, " ")


def fill_str(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """``fillna("").astype(str)`` analogue (run_blocking.py:85)."""
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return pc.fill_null(arr, "")


def distinct_tokens_flat(tokens_list: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Flat string array of PER-ROW-DISTINCT non-empty tokens from a
    ``list<string>`` column, fully vectorized (explode → joint factorize →
    unique (row, code) combos) — no per-row Python set building."""
    import pandas as pd

    arr = tokens_list.combine_chunks() if isinstance(tokens_list, pa.ChunkedArray) else tokens_list
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.string())
    lens = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    codes, uniq = pd.factorize(flat)
    keep = np.array([u != "" for u in uniq], dtype=bool) if len(uniq) else np.zeros(0, dtype=bool)
    # null list elements factorize to -1, which would wrap to the LAST vocab
    # token under fancy indexing — exclude them explicitly
    mask = (codes >= 0) & keep[codes] if len(codes) else np.zeros(0, dtype=bool)
    rows, codes = rows[mask], codes[mask].astype(np.int64)
    if len(codes) == 0:
        return pa.array([], type=pa.string())
    V = len(uniq)
    combo = np.unique(rows * V + codes)
    return pa.array(uniq[combo % V], type=pa.string())


def token_sets(tokens_list: list[list[str]]) -> list[set]:
    """Per-row distinct-token sets (for Jaccard kernels)."""
    return [set(t) for t in tokens_list]


def np_object_strings(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """String array → numpy object array (for Python-level per-row kernels)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.asarray(arr.to_pylist(), dtype=object)
