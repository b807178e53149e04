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
        """Vectorized replica of :meth:`classify` over the batch: one regex
        split, one ``is_in`` pass per profile, argmax with dict-order
        tie-break (same semantics the SQL oracle replicates)."""
        arr = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        n = len(arr)
        if n == 0:
            return batch.append_column("lang_pred", pa.array([], type=pa.string()))
        cjk = pc.match_substring_regex(arr, "[一-鿿぀-ヿ]").to_numpy(zero_copy_only=False)
        words = pc.split_pattern_regex(pc.utf8_lower(arr), pattern="[^a-z']+")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        langs = list(_LANG_PROFILES)
        scores = np.zeros((n, len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            m = pc.is_in(flat, value_set=pa.array(sorted(_LANG_PROFILES[lang]))).to_numpy(
                zero_copy_only=False
            )
            scores[:, j] = np.bincount(rows[m], minlength=n)
        best = scores.argmax(axis=1)  # first max == profile-dict-order tie-break
        best_score = scores[np.arange(n), best]
        pred = np.where(best_score > 0, np.array(langs, dtype=object)[best], "und")
        pred = np.where(cjk, "zh", pred)
        return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


def language_id(ds: Dataset, text_col: str = "text", concurrency=None) -> Dataset:
    # tiny picklable state (compiled regexes) → elastic tasks by default;
    # pass concurrency to force an explicit actor pool
    fn = LanguageId(text_col=text_col)
    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(
        lambda t, f=fn: f(t), batch_format="pyarrow", zero_copy_batch=True, **kwargs
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
    n = batch.num_rows
    texts = pc.fill_null(batch[text_col].combine_chunks(), "")
    n_chars = pc.utf8_length(texts)
    trimmed = pc.utf8_trim_whitespace(texts)
    tokens = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    n_tokens = pc.list_value_length(tokens)
    n_tokens = pc.if_else(pc.equal(trimmed, ""), 0, n_tokens)

    # punct chars = chars outside [a-zA-Z0-9\s] — the exact definition the SQL
    # oracle uses (regexp_replace + length), one Arrow regex pass
    punct = pc.utf8_length(
        pc.replace_substring_regex(texts, pattern=r"[a-zA-Z0-9\s]", replacement="")
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    nch = np.maximum(n_chars.to_numpy(zero_copy_only=False).astype(np.float64), 1.0)
    ntk_arr = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    ntk = np.maximum(ntk_arr, 1.0)

    # token stream exploded once: stopword hits + length sums by bincount
    lens = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(tokens)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    is_stop = pc.is_in(pc.utf8_lower(flat), value_set=pa.array(_STOPWORDS_EN)).to_numpy(
        zero_copy_only=False
    )
    stops = np.bincount(rows[is_stop], minlength=n).astype(np.float64)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    sum_len = np.bincount(rows, weights=tok_len, minlength=n)
    mean_tok_len = np.where(ntk_arr > 0, sum_len / ntk, 0.0)
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
# repetition / Gopher-style quality filter
# ---------------------------------------------------------------------------
def _group_codes(rows: np.ndarray, arr: pa.Array):
    """Factorize ``arr`` and return (combined row×code keys, vocab size) so
    per-(doc, value) counting is one np.unique over int64 keys."""
    enc = pc.dictionary_encode(arr)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = int(codes.max()) + 1 if len(codes) else 1
    return rows * v + codes, v


def repetition_features(
    batch: pa.Table,
    text_col: str = "text",
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_top_word_frac: float = 0.2,
    min_words: int = 5,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
) -> pa.Table:
    """Gopher-style repetition/quality signals per document (Rae et al. 2021,
    'Scaling Language Models' §A1.1 repetition filters), fully vectorized and
    SQL-replicable for the oracle:

      n_lines             non-empty lines (split on \\n, trimmed)
      dup_line_frac       1 - distinct/total over those lines
      dup_line_char_frac  chars in repeat occurrences / chars in all lines
      top_word_frac       most frequent (lowercased) word / total words
      mean_word_len       mean character length of whitespace words
      keep                1 iff every signal is inside its Gopher bound

    Doc-local → embarrassingly parallel: one map_batches, no shuffle."""
    n = batch.num_rows
    texts = pc.fill_null(batch[text_col].combine_chunks(), "")

    # ---- line stats: explode once, count per (doc, line) via np.unique ----
    lines = pc.split_pattern(texts, "\n")
    llen = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), llen)
    flat = pc.utf8_trim_whitespace(pc.list_flatten(lines))
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    rows_ne, flat_ne = rows[ne], flat.filter(pa.array(ne))
    line_chars = pc.utf8_length(flat_ne).to_numpy(zero_copy_only=False).astype(np.int64)
    n_lines = np.bincount(rows_ne, minlength=n).astype(np.int64)
    if len(rows_ne):
        key, v = _group_codes(rows_ne, flat_ne)
        uniq, first_idx, cnt = np.unique(key, return_index=True, return_counts=True)
        doc_u = uniq // v
        n_distinct = np.bincount(doc_u, minlength=n).astype(np.int64)
        dup_chars = np.bincount(doc_u, weights=line_chars[first_idx] * (cnt - 1), minlength=n)
        tot_chars = np.bincount(rows_ne, weights=line_chars, minlength=n)
    else:
        n_distinct = np.zeros(n, dtype=np.int64)
        dup_chars = tot_chars = np.zeros(n, dtype=np.float64)
    dup_line_frac = (n_lines - n_distinct) / np.maximum(n_lines, 1)
    dup_line_char_frac = dup_chars / np.maximum(tot_chars, 1)

    # ---- word stats: whitespace split of the trimmed text, lowercased -----
    trimmed = pc.utf8_trim_whitespace(texts)
    words = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    wlen = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    wrows = np.repeat(np.arange(n, dtype=np.int64), wlen)
    wflat = pc.utf8_lower(pc.list_flatten(words))
    wne = pc.not_equal(wflat, "").to_numpy(zero_copy_only=False)  # trimmed=='' → ['']
    wrows, wflat = wrows[wne], wflat.filter(pa.array(wne))
    n_words = np.bincount(wrows, minlength=n).astype(np.int64)
    top_cnt = np.zeros(n, dtype=np.int64)
    if len(wrows):
        wkey, wv = _group_codes(wrows, wflat)
        wuniq, wcnt = np.unique(wkey, return_counts=True)
        np.maximum.at(top_cnt, wuniq // wv, wcnt)
    wchars = pc.utf8_length(wflat).to_numpy(zero_copy_only=False).astype(np.int64)
    sum_wlen = np.bincount(wrows, weights=wchars, minlength=n)
    top_word_frac = top_cnt / np.maximum(n_words, 1)
    mean_word_len = sum_wlen / np.maximum(n_words, 1)

    keep = (
        (dup_line_frac <= max_dup_line_frac)
        & (dup_line_char_frac <= max_dup_line_char_frac)
        & (top_word_frac <= max_top_word_frac)
        & (n_words >= min_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
    )
    return (
        batch.append_column("n_lines", pa.array(n_lines))
        .append_column("dup_line_frac", pa.array(np.round(dup_line_frac, 6)))
        .append_column("dup_line_char_frac", pa.array(np.round(dup_line_char_frac, 6)))
        .append_column("top_word_frac", pa.array(np.round(top_word_frac, 6)))
        .append_column("mean_word_len", pa.array(np.round(mean_word_len, 6)))
        .append_column("keep", pa.array(keep.astype(np.int64)))
    )


def repetition_filter(ds: Dataset, text_col: str = "text", **bounds) -> Dataset:
    """Attach Gopher repetition signals + keep flag (no rows dropped — the
    caller filters on ``keep`` so the dropped side stays inspectable)."""
    return ds.map_batches(
        lambda t, c=text_col, b=bounds: repetition_features(t, c, **b),
        batch_format="pyarrow",
        zero_copy_batch=True,
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
        """Vectorized: ``\\w+|[^\\w\\s]`` decomposes into word runs (each worth
        ceil(len/4) units) plus single non-word-non-space chars (1 unit each)
        — two Arrow regex passes instead of a per-row findall loop.

        INTENTIONAL semantics note: Arrow's regex engine is RE2, whose ``\\w``
        / ``\\W`` / ``\\s`` are ASCII (unlike Python ``re``'s unicode ``\\w``).
        A non-ASCII word like 'café' therefore counts as word+punct units here.
        This is deliberate oracle alignment: the DuckDB oracle
        (``oracle_sql()['token_counts']``) evaluates the SAME pattern under
        RE2/ASCII, so both sides agree byte-for-byte (same rationale as
        punct_ratio in quality_features)."""
        n = batch.num_rows
        texts = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        trimmed = pc.utf8_trim_whitespace(texts)
        ws_list = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        ws = pc.if_else(
            pc.equal(trimmed, ""), 0, pc.list_value_length(ws_list)
        ).to_numpy(zero_copy_only=False).astype(np.int64)

        words = pc.split_pattern_regex(texts, pattern=r"\W+")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        flat_len = pc.utf8_length(pc.list_flatten(words)).to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        word_units = np.bincount(rows, weights=(flat_len + 3) // 4, minlength=n).astype(np.int64)
        punct_units = pc.utf8_length(
            pc.replace_substring_regex(texts, pattern=r"[\w\s]", replacement="")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        bpe = word_units + punct_units
        return batch.append_column("ws_tokens", pa.array(ws)).append_column("bpe_tokens", pa.array(bpe))


def token_counts(ds: Dataset, text_col: str = "text", concurrency=None) -> Dataset:
    fn = TokenCount(text_col=text_col)
    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(
        lambda t, f=fn: f(t), batch_format="pyarrow", zero_copy_batch=True, **kwargs
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------
_FP_B = np.uint64(1000003)  # polynomial base (< 2^20 so the mulmod split fits)
_FP_M = np.uint64((1 << 61) - 1)  # Mersenne prime 2^61-1
_MASK29 = np.uint64((1 << 29) - 1)


def _mod_m(x: np.ndarray) -> np.ndarray:
    """x mod 2^61-1 for x < 2^63 (uint64), using 2^61 ≡ 1 (mod M)."""
    x = (x >> np.uint64(61)) + (x & _FP_M)
    return np.where(x >= _FP_M, x - _FP_M, x)


def _horner_step(h: np.ndarray, th: np.ndarray) -> np.ndarray:
    """(h * B + th) mod 2^61-1, vectorized without 128-bit overflow.

    h < M < 2^61, B < 2^20. Split h = hi·2^32 + lo: h·B = hi·B·2^32 + lo·B.
    With t = hi·B < 2^49 and 2^61 ≡ 1 (mod M):
    t·2^32 ≡ (t >> 29) + ((t & (2^29-1)) << 32). All addends < 2^61; the sum
    fits uint64 and one _mod_m pass reduces it."""
    hi = h >> np.uint64(32)
    lo = h & np.uint64(0xFFFFFFFF)
    t = hi * _FP_B
    part = _mod_m((t >> np.uint64(29)) + ((t & _MASK29) << np.uint64(32)))
    part = _mod_m(part + _mod_m(lo * _FP_B))
    return _mod_m(part + _mod_m(th))


def rolling_fp_batch(col) -> np.ndarray:
    """64-bit order-sensitive polynomial fingerprint per text, vectorized:
    tokens exploded once, hashed with functions.hashing.hash_strings (one
    buffer-level pass — no per-token hashlib), then a Horner chain over token
    POSITIONS (max-tokens-per-doc vectorized steps, not per-token Python)."""
    import pandas as pd

    from ..functions.hashing import hash_strings

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    s = pd.Series(pc.fill_null(arr, "").to_pandas(), copy=False)
    toks = s.str.split().explode().dropna()
    toks = toks[toks.ne("")]
    rows = toks.index.to_numpy(dtype=np.int64)
    counts = np.bincount(rows, minlength=n).astype(np.int64)
    h = np.zeros(n, dtype=np.uint64)
    if len(toks) == 0:
        return h
    th = hash_strings(pa.array(toks.to_numpy(dtype=object), type=pa.string()))
    starts = np.cumsum(counts) - counts
    for k in range(int(counts.max())):
        active = counts > k
        idx = starts[active] + k
        h[active] = _horner_step(h[active], th[idx])
    return h


def fingerprints(ds: Dataset, text_col: str = "text") -> Dataset:
    """Two fingerprints per doc:
      * md5_fp      — md5 hex of the raw text. Stays per-row ``hashlib.md5``
                      ON PURPOSE: the external SQL oracle (DuckDB ``md5()``)
                      must replicate it byte-for-byte (functions/hashing.py
                      md5_hash_strings carries the same rationale).
      * rolling_fp  — 64-bit polynomial rolling hash over whitespace tokens
                      (order-sensitive), fully vectorized.
    """

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        rolls = rolling_fp_batch(batch[text_col])
        return batch.append_column("md5_fp", pa.array(md5s, type=pa.string())).append_column(
            "rolling_fp", pa.array(rolls, type=pa.uint64())
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
