"""Unit tests for string-similarity kernels, pinning reference edge cases
(FIXTURES.md §5; /root/reference/src/features/feautre_extraction.py)."""

import duckdb
import numpy as np
import pytest

from entity_resolution__ray.functions import strsim


# --- jaccard (feautre_extraction.py:16-22) ---------------------------------
def test_jaccard_both_empty_is_one():
    assert strsim.jaccard(set(), set()) == 1.0


def test_jaccard_one_empty_is_zero():
    assert strsim.jaccard({"a"}, set()) == 0.0
    assert strsim.jaccard(set(), {"a"}) == 0.0


def test_jaccard_basic():
    assert strsim.jaccard({"a", "b"}, {"b", "c"}) == pytest.approx(1 / 3)
    assert strsim.jaccard({"a"}, {"a"}) == 1.0


# --- LCS (feautre_extraction.py:26-43) -------------------------------------
def _lcs_dp(a, b):
    la, lb = len(a), len(b)
    dp = [0] * (lb + 1)
    for i in range(1, la + 1):
        prev = 0
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = prev + 1 if ai == b[j - 1] else max(dp[j], dp[j - 1])
            prev = cur
    return dp[lb]


def test_lcs_matches_reference_dp():
    rng = np.random.RandomState(7)
    alphabet = "abcde "
    for _ in range(300):
        a = "".join(rng.choice(list(alphabet), rng.randint(0, 20)))
        b = "".join(rng.choice(list(alphabet), rng.randint(0, 20)))
        assert strsim.lcs_len(a, b) == _lcs_dp(a, b), (a, b)


def test_lcs_ratio_both_empty_is_one():
    assert strsim.lcs_ratio("", "") == 1.0


def test_lcs_is_subsequence_not_substring():
    # "axbxc" vs "abc": common subsequence abc (3), common substring only 1
    assert strsim.lcs_len("axbxc", "abc") == 3


# --- edit_ratio == rapidfuzz fuzz.ratio/100 (feautre_extraction.py:47-48) --
def test_edit_ratio_identical():
    assert strsim.edit_ratio("abc", "abc") == 1.0


def test_edit_ratio_both_empty():
    assert strsim.edit_ratio("", "") == 1.0


def test_edit_ratio_known_value():
    # indel: lcs("kitten","sitting")=4 → 2*4/13
    assert strsim.edit_ratio("kitten", "sitting") == pytest.approx(8 / 13)


def test_lcs_and_edit_batch_consistent():
    a = ["abc", "", "hello world", "xyz"]
    b = ["abd", "", "hello there", "abc"]
    lcs_r, edit_r = strsim.lcs_and_edit_batch(a, b)
    for i in range(len(a)):
        assert lcs_r[i] == pytest.approx(strsim.lcs_ratio(a[i], b[i]))
        assert edit_r[i] == pytest.approx(strsim.edit_ratio(a[i], b[i]))


# --- jaro-winkler: cross-check against DuckDB's implementation -------------
def test_jaro_winkler_matches_duckdb():
    cases = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("university of chicago", "univ of chicago"),
        ("abc", "abc"),
        ("a", "b"),
        ("ibm almaden research center", "ibm almaden research ctr ca"),
    ]
    con = duckdb.connect()
    for a, b in cases:
        expected = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert strsim.jaro_winkler(a, b) == pytest.approx(expected, abs=1e-12), (a, b)


def test_jaro_winkler_empty():
    assert strsim.jaro_winkler("", "") == 1.0
    assert strsim.jaro_winkler("a", "") == 0.0


# --- metaphone (published algorithm examples) ------------------------------
def test_metaphone_known_codes():
    assert strsim.metaphone("knight") == "NT"
    assert strsim.metaphone("school") == "SKL"
    assert strsim.metaphone("thompson") == "0MPSN"  # TH → theta ('0')
    assert strsim.metaphone("xavier") == "SFR"
    assert strsim.metaphone("philips") == "FLPS"
    assert strsim.metaphone("wright") == "RT"


def test_metaphone_phonetic_equivalences():
    # the property the dmetaphone_match feature relies on
    assert strsim.metaphone("smith") == strsim.metaphone("smyth")
    assert strsim.metaphone("catherine") == strsim.metaphone("katherine")


def test_dmetaphone_match_empty_is_zero():
    assert strsim.dmetaphone_match_first_token([], ["a"]) == 0
    assert strsim.dmetaphone_match_first_token(["a"], []) == 0
    assert strsim.dmetaphone_match_first_token(["smith"], ["smyth"]) == 1


# --- rowwise cosine (feautre_extraction.py:63-75) --------------------------
def _dense_to_csr(m):
    indptr = [0]
    indices = []
    data = []
    for row in m:
        nz = np.nonzero(row)[0]
        indices.extend(nz.tolist())
        data.extend(row[nz].tolist())
        indptr.append(len(indices))
    return (
        np.array(indptr, dtype=np.int64),
        np.array(indices, dtype=np.int64),
        np.array(data, dtype=np.float64),
    )


def test_rowwise_cosine_matches_dense():
    rng = np.random.RandomState(0)
    a = rng.rand(20, 15) * (rng.rand(20, 15) > 0.6)
    b = rng.rand(20, 15) * (rng.rand(20, 15) > 0.6)
    ia, ja, da = _dense_to_csr(a)
    ib, jb, db = _dense_to_csr(b)
    got = strsim.rowwise_cosine_csr(ia, ja, da, ib, jb, db, 20, 15)
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    den[den == 0.0] = 1.0
    np.testing.assert_allclose(got, num / den, atol=1e-12)


def test_rowwise_cosine_zero_rows_score_zero():
    a = np.array([[0.0, 0.0], [1.0, 0.0]])
    b = np.array([[1.0, 1.0], [0.0, 0.0]])
    ia, ja, da = _dense_to_csr(a)
    ib, jb, db = _dense_to_csr(b)
    got = strsim.rowwise_cosine_csr(ia, ja, da, ib, jb, db, 2, 2)
    np.testing.assert_allclose(got, [0.0, 0.0])
