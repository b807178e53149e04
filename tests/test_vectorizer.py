"""Unit tests for the from-scratch TF-IDF/Count vectorizers
(sklearn-semantics parity; reference configs at run_blocking.py:14-26 and
feautre_extraction.py:79-100)."""

import numpy as np
import pytest

from entity_resolution__ray.functions import strsim
from entity_resolution__ray.functions.vectorizer import (
    Vectorizer,
    blocking_tfidf,
    pair_char_tfidf,
    pair_count_vectorizer,
    pair_word_tfidf,
)

CORPUS = [
    "ibm almaden research center",
    "ibm research almaden",
    "stanford university",
    "university of chicago",
    "chicago research lab",
    "mit media lab",
]


def test_word_analyzer_sklearn_default_pattern_drops_single_chars():
    v = Vectorizer(analyzer="word", ngram_range=(1, 1))
    assert v.analyze("a bc def") == ["bc", "def"]  # \w\w+ needs 2+ chars


def test_word_bigrams():
    v = Vectorizer(analyzer="word", ngram_range=(1, 2))
    assert v.analyze("ab cd ef") == ["ab", "cd", "ef", "ab cd", "cd ef"]


def test_char_analyzer_ngrams():
    v = Vectorizer(analyzer="char", ngram_range=(3, 3), lowercase=False)
    assert v.analyze("abcd") == ["abc", "bcd"]
    # whitespace normalized to single spaces (sklearn char analyzer semantics)
    assert v.analyze("a  b") == ["a b"]


def test_min_df_filters_vocabulary():
    v = Vectorizer(analyzer="word", min_df=2).fit(CORPUS)
    vocab = set(v.vocabulary_)
    assert "ibm" in vocab and "research" in vocab and "university" in vocab
    assert "stanford" not in vocab  # df=1 < min_df=2


def test_max_df_filters_vocabulary():
    corpus = ["common alpha", "common beta", "common gamma", "common delta"]
    v = Vectorizer(analyzer="word", max_df=0.5).fit(corpus)
    assert "common" not in v.vocabulary_


def test_smooth_idf_formula():
    v = Vectorizer(analyzer="word", min_df=1).fit(CORPUS)
    n = len(CORPUS)
    j = v.vocabulary_["ibm"]  # df=2
    assert v.idf_[j] == pytest.approx(np.log((1 + n) / (1 + 2)) + 1)


def test_l2_norm_rows():
    v = Vectorizer(analyzer="word", min_df=1, sublinear_tf=True).fit(CORPUS)
    indptr, indices, data = v.transform(CORPUS)
    for i in range(len(CORPUS)):
        seg = data[indptr[i] : indptr[i + 1]]
        if len(seg):
            assert np.linalg.norm(seg) == pytest.approx(1.0)


def test_transform_dense_matches_sparse():
    v = blocking_tfidf().fit(CORPUS)
    dense = v.transform_dense(CORPUS)
    indptr, indices, data = v.transform(CORPUS)
    rows = np.repeat(np.arange(len(CORPUS)), np.diff(indptr))
    rebuilt = np.zeros_like(dense)
    rebuilt[rows, indices] = data
    np.testing.assert_allclose(dense, rebuilt)


def test_pair_cosines_sensible():
    src = ["ibm almaden research center", "stanford university"]
    cand = ["ibm research almaden", "university of tokyo"]
    cv = pair_count_vectorizer().fit(src + cand)
    ia, ja, da = cv.transform(src)
    ib, jb, db = cv.transform(cand)
    cos = strsim.rowwise_cosine_csr(ia, ja, da, ib, jb, db, 2, cv.n_features)
    assert cos[0] > 0.7  # near-duplicate orgs
    assert cos[0] > cos[1]


def test_identical_texts_have_cosine_one():
    t = ["ibm research"] * 2
    for vec in (pair_word_tfidf(), pair_char_tfidf(), pair_count_vectorizer()):
        v = vec.fit(t)
        ia, ja, da = v.transform([t[0]])
        cos = strsim.rowwise_cosine_csr(ia, ja, da, ia, ja, da, 1, v.n_features)
        assert cos[0] == pytest.approx(1.0)


def test_fit_from_document_frequencies_equals_fit():
    v1 = blocking_tfidf().fit(CORPUS)
    dfreq = {}
    for t in CORPUS:
        for term in set(blocking_tfidf().analyze(t)):
            dfreq[term] = dfreq.get(term, 0) + 1
    v2 = blocking_tfidf().fit_from_document_frequencies(dfreq, len(CORPUS))
    assert v1.vocabulary_ == v2.vocabulary_
    np.testing.assert_allclose(v1.idf_, v2.idf_)


def test_empty_text_transforms_to_empty_row():
    v = blocking_tfidf().fit(CORPUS)
    indptr, indices, data = v.transform([""])
    assert indptr.tolist() == [0, 0]


def test_fast_transform_parity_with_dict_path():
    """transform()'s hashed-ngram fast path must return the EXACT CSR the
    per-text dict path does — counts, per-row ascending index order, weights
    — including non-ASCII codepoints and whitespace-normalization edges."""
    import numpy as np

    texts = [
        "", "a", "ab", "abc def ghi", "the same the same the same",
        "café au lait — naïve déjà-vu", "ÅÄÖ åäö 北京 大学 Universität",
        "  runs   of    spaces  ", "x" * 300,
        "University of Novi Sad, Faculty of Sciences, SERBIA",
        "UNIV. OF NOVI SAD — FAC. OF SCI. (RS)",
    ] * 3
    for mk in (pair_char_tfidf, pair_word_tfidf, pair_count_vectorizer, blocking_tfidf):
        v = mk().fit(texts)
        assert v._fast_tables() is not None
        fast = v.transform(texts)
        slow = v._transform_dict(texts)
        for a, b, lab in zip(fast, slow, ("indptr", "indices", "data")):
            np.testing.assert_array_equal(a, b, err_msg=f"{mk.__name__}:{lab}")


def test_fast_tables_survive_pickle_and_refit():
    import pickle

    import numpy as np

    v = pair_char_tfidf().fit(["abc abd", "bcd ef"])
    before = v.transform(["abc x"])
    v2 = pickle.loads(pickle.dumps(v))
    assert "_ft" not in v2.__dict__  # cache not shipped in broadcasts
    after = v2.transform(["abc x"])
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    # refit must invalidate the cached table
    v2.fit(["zzz yyy", "zzz qqq"])
    assert "_ft" not in v2.__dict__
    assert v2.transform(["zzz"])[1].size > 0
