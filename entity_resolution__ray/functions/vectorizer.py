"""TF-IDF / bag-of-words vectorizers (sklearn is not available in this container).

Reimplements exactly the sklearn configurations the reference uses:

  * blocking TF-IDF  — word 1-2 grams, ``token_pattern=r"(?u)\\b\\w\\w+\\b"``,
    min_df=2, max_df=0.9, lowercase, unicode accent-strip, sublinear_tf,
    smooth idf, l2 norm (/root/reference/scripts/run_blocking.py:14-26)
  * pair word TF-IDF — word 1-2 grams, min_df=1, sublinear, lowercase=False
    (/root/reference/src/features/feautre_extraction.py:87-100)
  * pair char TF-IDF — char 3-5 grams, same flags
  * pair CountVectorizer — ``token_pattern=r"(?u)\\b\\w+\\b"``, lowercase=False,
    raw counts (/root/reference/src/features/feautre_extraction.py:79-84)

sklearn semantics pinned: smooth idf = ln((1+n)/(1+df)) + 1; sublinear tf =
1 + ln(tf); l2 row normalization after tf·idf; vocabulary sorted
lexicographically; min_df int = absolute count, max_df float = fraction.

A fitted vectorizer is a small picklable object (vocabulary dict + idf vector)
meant to be fit once (driver/sample or distributed document-frequency
aggregate) and broadcast via ``ray.put`` into scorer actors.
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .text_norm import strip_accents as _strip_accents

CSR = Tuple[np.ndarray, np.ndarray, np.ndarray]  # (indptr, indices, data)

WORD_2PLUS = r"(?u)\b\w\w+\b"  # sklearn default token_pattern
WORD_1PLUS = r"(?u)\b\w+\b"    # reference CountVectorizer pattern


class Vectorizer:
    """Unified Count/TF-IDF vectorizer with word or char n-gram analyzers."""

    def __init__(
        self,
        analyzer: str = "word",
        ngram_range: Tuple[int, int] = (1, 1),
        min_df: int | float = 1,
        max_df: int | float = 1.0,
        lowercase: bool = True,
        strip_accents: bool = False,
        sublinear_tf: bool = False,
        use_idf: bool = True,
        norm: Optional[str] = "l2",
        token_pattern: str = WORD_2PLUS,
    ):
        assert analyzer in ("word", "char")
        self.analyzer = analyzer
        self.ngram_range = ngram_range
        self.min_df = min_df
        self.max_df = max_df
        self.lowercase = lowercase
        self.strip_accents = strip_accents
        self.sublinear_tf = sublinear_tf
        self.use_idf = use_idf
        self.norm = norm
        self.token_re = re.compile(token_pattern)
        self.vocabulary_: Dict[str, int] = {}
        self.idf_: Optional[np.ndarray] = None

    # -- analysis ----------------------------------------------------------
    def _preprocess(self, text: str) -> str:
        if not isinstance(text, str):
            text = "" if text is None else str(text)
        if self.lowercase:
            text = text.lower()
        if self.strip_accents:
            text = _strip_accents(text)
        return text

    def analyze(self, text: str) -> List[str]:
        text = self._preprocess(text)
        lo, hi = self.ngram_range
        if self.analyzer == "word":
            tokens = self.token_re.findall(text)
            if lo == 1 and hi == 1:
                return tokens
            out: List[str] = []
            n = len(tokens)
            for size in range(lo, hi + 1):
                for i in range(n - size + 1):
                    out.append(" ".join(tokens[i : i + size]))
            return out
        # char analyzer: sklearn normalizes runs of whitespace to single spaces
        text = " ".join(text.split())
        out = []
        n = len(text)
        for size in range(lo, hi + 1):
            if n < size:
                continue
            for i in range(n - size + 1):
                out.append(text[i : i + size])
        return out

    # -- fitting -----------------------------------------------------------
    def fit(self, texts: Sequence[str]) -> "Vectorizer":
        dfreq: Dict[str, int] = {}
        n_docs = 0
        for t in texts:
            n_docs += 1
            for term in set(self.analyze(t)):
                dfreq[term] = dfreq.get(term, 0) + 1
        return self.fit_from_document_frequencies(dfreq, n_docs)

    def fit_from_document_frequencies(self, dfreq: Dict[str, int], n_docs: int) -> "Vectorizer":
        """Build vocabulary + idf from a {term: document_frequency} map.

        This is the distributed-fit hook: at scale the df map comes from a Ray
        ``flat_map(distinct terms) → groupby(term).count()`` aggregate instead
        of a driver-side pass.
        """
        min_df = self.min_df if isinstance(self.min_df, int) else int(math.ceil(self.min_df * n_docs))
        max_df = self.max_df if isinstance(self.max_df, int) else self.max_df * n_docs
        terms = sorted(t for t, c in dfreq.items() if c >= min_df and c <= max_df)
        self.vocabulary_ = {t: i for i, t in enumerate(terms)}
        if self.use_idf:
            df_arr = np.array([dfreq[t] for t in terms], dtype=np.float64)
            self.idf_ = np.log((1.0 + n_docs) / (1.0 + df_arr)) + 1.0
        else:
            self.idf_ = None
        return self

    @property
    def n_features(self) -> int:
        return len(self.vocabulary_)

    # -- transform ---------------------------------------------------------
    def transform(self, texts: Sequence[str]) -> CSR:
        """Texts → CSR triples (indptr, indices, data); rows are l2-normalized
        tf·idf (or raw counts when use_idf=False and norm=None)."""
        vocab = self.vocabulary_
        indptr = np.zeros(len(texts) + 1, dtype=np.int64)
        indices_parts: List[np.ndarray] = []
        data_parts: List[np.ndarray] = []
        for i, t in enumerate(texts):
            counts: Dict[int, float] = {}
            for term in self.analyze(t):
                j = vocab.get(term)
                if j is not None:
                    counts[j] = counts.get(j, 0.0) + 1.0
            if counts:
                idx = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
                val = np.fromiter(counts.values(), dtype=np.float64, count=len(counts))
                order = np.argsort(idx)
                idx, val = idx[order], val[order]
            else:
                idx = np.empty(0, dtype=np.int64)
                val = np.empty(0, dtype=np.float64)
            indices_parts.append(idx)
            data_parts.append(val)
            indptr[i + 1] = indptr[i] + len(idx)
        indices = np.concatenate(indices_parts) if indices_parts else np.empty(0, dtype=np.int64)
        data = np.concatenate(data_parts) if data_parts else np.empty(0, dtype=np.float64)

        if self.sublinear_tf and len(data):
            data = 1.0 + np.log(data)
        if self.use_idf and self.idf_ is not None and len(data):
            data = data * self.idf_[indices]
        if self.norm == "l2" and len(data):
            rows = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(indptr))
            norms = np.sqrt(np.bincount(rows, weights=data * data, minlength=len(texts)))
            norms[norms == 0.0] = 1.0
            data = data / norms[rows]
        return indptr, indices, data

    def transform_dense(self, texts: Sequence[str]) -> np.ndarray:
        """Dense matrix — only for small conformance-mode corpora (brute kNN)."""
        indptr, indices, data = self.transform(texts)
        out = np.zeros((len(texts), self.n_features), dtype=np.float64)
        rows = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(indptr))
        out[rows, indices] = data
        return out


def blocking_tfidf(ngram_min: int = 1, ngram_max: int = 2, min_df: int = 2, max_df: float = 0.9) -> Vectorizer:
    """The reference's blocking TF-IDF config (run_blocking.py:14-26)."""
    return Vectorizer(
        analyzer="word",
        ngram_range=(ngram_min, ngram_max),
        min_df=min_df,
        max_df=max_df,
        lowercase=True,
        strip_accents=True,
        sublinear_tf=True,
        use_idf=True,
        norm="l2",
        token_pattern=WORD_2PLUS,
    )


def pair_word_tfidf() -> Vectorizer:
    """Pair-feature word TF-IDF (feautre_extraction.py:87-100; input pre-normalized)."""
    return Vectorizer(
        analyzer="word",
        ngram_range=(1, 2),
        min_df=1,
        lowercase=False,
        strip_accents=True,
        sublinear_tf=True,
        use_idf=True,
        norm="l2",
        token_pattern=WORD_2PLUS,
    )


def pair_char_tfidf() -> Vectorizer:
    """Pair-feature char 3-5 gram TF-IDF (feautre_extraction.py:87-100)."""
    return Vectorizer(
        analyzer="char",
        ngram_range=(3, 5),
        min_df=1,
        lowercase=False,
        strip_accents=True,
        sublinear_tf=True,
        use_idf=True,
        norm="l2",
    )


def pair_count_vectorizer() -> Vectorizer:
    """Pair-feature CountVectorizer (feautre_extraction.py:79-84): raw counts,
    1+-char word tokens, no lowercase, no idf, no norm (cosine normalizes)."""
    return Vectorizer(
        analyzer="word",
        ngram_range=(1, 1),
        min_df=1,
        lowercase=False,
        strip_accents=False,
        sublinear_tf=False,
        use_idf=False,
        norm=None,
        token_pattern=WORD_1PLUS,
    )
