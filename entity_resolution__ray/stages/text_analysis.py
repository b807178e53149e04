"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting. All vectorized
``map_batches`` stages; regexes/profiles compiled once per actor.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# ---------------------------------------------------------------------------
# language ID (n-gram/function-word heuristic)
# ---------------------------------------------------------------------------
_LANG_PROFILES: Dict[str, set] = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "des", "dans", "que", "pour", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "de", "en", "por"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "per", "non", "sono", "con", "del"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "op", "niet", "met", "zijn", "voor"},
}


class LanguageId:
    """Function-word-profile language classifier; 'und' (undetermined) when no
    profile scores or the text has CJK characters → 'zh' shortcut."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zA-Z']+")
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ]")

    def classify(self, text: str) -> str:
        text = text or ""
        if self.cjk_re.search(text):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        ws = words  # score on token stream (frequency-sensitive)
        best_lang, best = "und", 0
        for lang, prof in _LANG_PROFILES.items():
            score = sum(1 for w in ws if w in prof)
            if score > best:
                best, best_lang = score, lang
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


def language_id(ds: Dataset, text_col: str = "text", concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(
        LanguageId, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword / word-length signals)
# ---------------------------------------------------------------------------
_STOPWORDS_EN = sorted(_LANG_PROFILES["en"])


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized doc-quality signals, all derivable in SQL for the oracle:
    n_chars, n_tokens (whitespace), mean_token_len, punct_ratio (of chars),
    stop_ratio (EN stopword fraction of tokens), quality_score (bounded
    combination)."""
    texts = batch[text_col]
    n_chars = pc.utf8_length(texts)
    tokens = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), pattern=r"\s+")
    n_tokens = pc.list_value_length(tokens)
    n_tokens = pc.if_else(pc.equal(pc.utf8_trim_whitespace(texts), ""), 0, n_tokens)

    texts_py = texts.to_pylist()
    punct = np.array(
        [sum(1 for ch in (t or "") if not ch.isalnum() and not ch.isspace()) for t in texts_py],
        dtype=np.float64,
    )
    nch = np.maximum(np.asarray(n_chars.to_pylist() if hasattr(n_chars, "to_pylist") else n_chars, dtype=np.float64), 1.0)
    ntk_arr = np.asarray(n_tokens.to_pylist() if hasattr(n_tokens, "to_pylist") else n_tokens, dtype=np.float64)
    ntk = np.maximum(ntk_arr, 1.0)
    stop_set = set(_STOPWORDS_EN)
    stops = np.array(
        [sum(1 for w in (t or "").lower().split() if w in stop_set) for t in texts_py], dtype=np.float64
    )
    mean_tok_len = np.array(
        [float(np.mean([len(w) for w in (t or "").split()])) if (t or "").split() else 0.0 for t in texts_py]
    )
    punct_ratio = punct / nch
    stop_ratio = stops / ntk
    # bounded score: long-enough, low punctuation, some stopwords, sane word length
    score = (
        np.minimum(ntk_arr / 64.0, 1.0) * 0.4
        + (1.0 - np.minimum(punct_ratio * 4.0, 1.0)) * 0.3
        + np.minimum(stop_ratio * 5.0, 1.0) * 0.2
        + np.where((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), 1.0, 0.0) * 0.1
    )
    return (
        batch.append_column("n_tokens", pa.array(ntk_arr.astype(np.int64)))
        .append_column("mean_token_len", pa.array(mean_tok_len, type=pa.float64()))
        .append_column("punct_ratio", pa.array(punct_ratio, type=pa.float64()))
        .append_column("stop_ratio", pa.array(stop_ratio, type=pa.float64()))
        .append_column("quality_score", pa.array(score, type=pa.float64()))
    )


def quality_score(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        lambda t, c=text_col: quality_features(t, c), batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish subword estimate)
# ---------------------------------------------------------------------------
_BPE_RE = re.compile(r"\w+|[^\w\s]")


class TokenCount:
    """whitespace_tokens + bpe-ish count: words split into ceil(len/4) subword
    units plus standalone punctuation (a stand-in for a real tokenizer's
    token count, deterministic and vectorizable)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.re = _BPE_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ws = np.array([len((t or "").split()) for t in texts], dtype=np.int64)
        bpe = np.array(
            [sum(-(-len(m) // 4) for m in self.re.findall(t or "")) for t in texts], dtype=np.int64
        )
        return batch.append_column("ws_tokens", pa.array(ws)).append_column("bpe_tokens", pa.array(bpe))


def token_counts(ds: Dataset, text_col: str = "text", concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(
        TokenCount, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------
def fingerprints(ds: Dataset, text_col: str = "text") -> Dataset:
    """Two fingerprints per doc:
      * md5_fp      — md5 hex of the raw text (SQL-oracle-checkable)
      * rolling_fp  — 64-bit polynomial rolling hash over whitespace tokens
                      (order-sensitive content fingerprint)
    """

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        rolls = []
        B = 1000003
        M = (1 << 61) - 1
        for t in texts:
            h = 0
            for tok in (t or "").split():
                th = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
                h = (h * B + th) % M
            rolls.append(h)
        return batch.append_column("md5_fp", pa.array(md5s, type=pa.string())).append_column(
            "rolling_fp", pa.array(rolls, type=pa.uint64())
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
