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

from .hashing import _GOLDEN, _P_INV, _U64, _prefix_hash, _splitmix64, hash_token_list
from .text_norm import strip_accents as _strip_accents

CSR = Tuple[np.ndarray, np.ndarray, np.ndarray]  # (indptr, indices, data)

WORD_2PLUS = r"(?u)\b\w\w+\b"  # sklearn default token_pattern
WORD_1PLUS = r"(?u)\b\w+\b"    # reference CountVectorizer pattern


# ---------------------------------------------------------------------------
# vectorized n-gram hashing helpers (the fast transform path)
# ---------------------------------------------------------------------------
def _cp_array(texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """All texts as one uint32 CODEPOINT array + int64 offsets (n+1,).
    Codepoints (not bytes) so char n-gram windows match the per-character
    analyzer exactly for non-ASCII input."""
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    offs = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(np.fromiter(map(len, texts), dtype=np.int64, count=len(texts)), out=offs[1:])
    return cp, offs


def _window_hash_state(cp: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(prefix polynomial S, P^-i powers) enabling O(1) hash of ANY window:
    h(start, length) = splitmix((S[start+len]-S[start]) * P^-start
                                 ^ splitmix(len))."""
    S = _prefix_hash(cp)
    pinv = np.empty(cp.size + 1, dtype=_U64)
    pinv[0] = 1
    if cp.size:
        np.multiply.accumulate(np.full(cp.size, _P_INV, dtype=_U64), out=pinv[1:])
    return S, pinv


def _window_hashes(S: np.ndarray, pinv: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    base = (S[starts + lens] - S[starts]) * pinv[starts]
    return _splitmix64(base ^ _splitmix64(lens.astype(_U64)))


def _fold_hashes(h: np.ndarray, starts: np.ndarray, size: int) -> np.ndarray:
    """Combined hash of ``size`` consecutive element hashes (word n-grams);
    mirror of hashing.hash_columns' fold so vocab-side and text-side agree."""
    out = h[starts]
    for j in range(1, size):
        out = _splitmix64(out ^ (h[starts + j] + _GOLDEN))
    return out


def _gram_starts(counts_per_row: np.ndarray, offs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(global start index, row id) of every gram when row i contributes
    ``counts_per_row[i]`` grams starting at offs[i], offs[i]+1, ..."""
    total = int(counts_per_row.sum())
    row_of = np.repeat(np.arange(len(counts_per_row), dtype=np.int64), counts_per_row)
    first = np.repeat(offs[:-1], counts_per_row)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts_per_row) - counts_per_row, counts_per_row
    )
    return first + within, row_of


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
        self.__dict__.pop("_ft", None)  # vocab changed — rebuild fast tables
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
        tf·idf (or raw counts when use_idf=False and norm=None).

        Hot path: vocabulary terms are hashed ONCE (cached per object, not
        pickled) into a sorted uint64 table; every n-gram of a batch is hashed
        vectorized (codepoint polynomial windows for char, token-hash folds
        for word) and matched by searchsorted — no per-gram Python objects or
        dict lookups. Falls back to the per-text dict path when the hashed
        vocab has an (astronomically unlikely) internal collision or the
        token pattern isn't one of the two whitespace-free patterns this repo
        uses. Output is IDENTICAL to the dict path (same counts, same
        ascending per-row index order, same float ops — parity-tested)."""
        tables = self._fast_tables()
        if tables is None:
            return self._transform_dict(texts)
        if self.analyzer == "char":
            indptr, indices, data = self._transform_char_fast(texts, tables)
        else:
            indptr, indices, data = self._transform_word_fast(texts, tables)
        return self._finalize_weights(indptr, indices, data, len(texts))

    def _transform_dict(self, texts: Sequence[str]) -> CSR:
        """Reference semantics (and collision fallback): per-text dict counting."""
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
        return self._finalize_weights(indptr, indices, data, len(texts))

    def _finalize_weights(self, indptr, indices, data, n_rows: int) -> CSR:
        if self.sublinear_tf and len(data):
            data = 1.0 + np.log(data)
        if self.use_idf and self.idf_ is not None and len(data):
            data = data * self.idf_[indices]
        if self.norm == "l2" and len(data):
            rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr))
            norms = np.sqrt(np.bincount(rows, weights=data * data, minlength=n_rows))
            norms[norms == 0.0] = 1.0
            data = data / norms[rows]
        return indptr, indices, data

    # -- fast-path internals -------------------------------------------------
    def _fast_tables(self):
        """(sorted vocab hashes, vocab ids in that order) or None → fallback.
        Built lazily once per object per process; dropped from pickles."""
        cached = getattr(self, "_ft", "unset")
        if cached != "unset":
            return cached
        tables = self._build_fast_tables()
        self._ft = tables
        return tables

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_ft", None)  # worker-local cache, rebuild after unpickle
        return state

    def _build_fast_tables(self):
        if self.analyzer == "word" and self.token_re.pattern not in (WORD_1PLUS, WORD_2PLUS):
            return None
        terms = sorted(self.vocabulary_, key=self.vocabulary_.get)
        if self.analyzer == "char":
            if terms:
                cp, offs = _cp_array(terms)
                S, pinv = _window_hash_state(cp)
                h = _window_hashes(S, pinv, offs[:-1], np.diff(offs))
            else:
                h = np.empty(0, dtype=_U64)
        else:
            # word n-gram term "a b" ≡ fold of part hashes — mirror of the
            # text side where grams are folds of consecutive token hashes
            parts_per_term = [t.split(" ") for t in terms]
            sizes = np.fromiter(map(len, parts_per_term), dtype=np.int64, count=len(terms))
            flat = [p for parts in parts_per_term for p in parts]
            ph = hash_token_list(flat)
            offs = np.zeros(len(terms) + 1, dtype=np.int64)
            np.cumsum(sizes, out=offs[1:])
            h = np.empty(len(terms), dtype=_U64)
            for s in np.unique(sizes):
                m = sizes == s
                h[m] = _fold_hashes(ph, offs[:-1][m], int(s))
        if len(np.unique(h)) != len(h):
            return None  # internal collision — keep exact dict semantics
        order = np.argsort(h)
        return h[order], np.arange(len(terms), dtype=np.int64)[order]

    def _lookup_csr(self, gram_hashes: np.ndarray, row_of: np.ndarray, n_rows: int, tables) -> CSR:
        vh, vid = tables
        if len(vh) and gram_hashes.size:
            pos = np.searchsorted(vh, gram_hashes)
            pos[pos == len(vh)] = 0
            ok = vh[pos] == gram_hashes
            rows, vids = row_of[ok], vid[pos[ok]]
        else:
            rows = np.empty(0, dtype=np.int64)
            vids = np.empty(0, dtype=np.int64)
        F = np.int64(max(len(vh), 1))
        key = rows * F + vids
        key.sort()
        if key.size:
            first = np.ones(key.size, dtype=bool)
            first[1:] = key[1:] != key[:-1]
            uniq = key[first]
            grp = np.cumsum(first) - 1
            counts = np.bincount(grp).astype(np.float64)
        else:
            uniq = key
            counts = np.empty(0, dtype=np.float64)
        indices = uniq % F
        indptr = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(np.bincount((uniq // F), minlength=n_rows), out=indptr[1:])
        return indptr, indices, counts

    def _transform_char_fast(self, texts: Sequence[str], tables) -> CSR:
        lo, hi = self.ngram_range
        norm_texts = [" ".join(self._preprocess(t).split()) for t in texts]
        cp, offs = _cp_array(norm_texts)
        S, pinv = _window_hash_state(cp)
        lengths = np.diff(offs)
        hash_parts: List[np.ndarray] = []
        row_parts: List[np.ndarray] = []
        for size in range(lo, hi + 1):
            counts = np.maximum(lengths - size + 1, 0)
            if not counts.any():
                continue
            starts, row_of = _gram_starts(counts, offs)
            hash_parts.append(_window_hashes(S, pinv, starts, np.full(starts.size, size, dtype=np.int64)))
            row_parts.append(row_of)
        gh = np.concatenate(hash_parts) if hash_parts else np.empty(0, dtype=_U64)
        rw = np.concatenate(row_parts) if row_parts else np.empty(0, dtype=np.int64)
        return self._lookup_csr(gh, rw, len(texts), tables)

    def _transform_word_fast(self, texts: Sequence[str], tables) -> CSR:
        lo, hi = self.ngram_range
        findall = self.token_re.findall
        token_lists = [findall(self._preprocess(t)) for t in texts]
        ntok = np.fromiter(map(len, token_lists), dtype=np.int64, count=len(texts))
        offs = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(ntok, out=offs[1:])
        th = hash_token_list([tok for lst in token_lists for tok in lst])
        hash_parts: List[np.ndarray] = []
        row_parts: List[np.ndarray] = []
        for size in range(lo, hi + 1):
            counts = np.maximum(ntok - size + 1, 0)
            if not counts.any():
                continue
            starts, row_of = _gram_starts(counts, offs)
            hash_parts.append(_fold_hashes(th, starts, size))
            row_parts.append(row_of)
        gh = np.concatenate(hash_parts) if hash_parts else np.empty(0, dtype=_U64)
        rw = np.concatenate(row_parts) if row_parts else np.empty(0, dtype=np.int64)
        return self._lookup_csr(gh, rw, len(texts), tables)

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
