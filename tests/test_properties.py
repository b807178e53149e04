"""Property-based tests (hypothesis) pinning kernel semantics against brute
force and invariance properties (SURVEY.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution__ray.functions import strsim
from entity_resolution__ray.functions.text_norm import normalize_text, tokenize

short_text = st.text(alphabet="abcde ÉéÜü.,;0123456789", max_size=30)
tokens = st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), max_size=8)


def _lcs_brute(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            dp[i][j] = dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1] else max(dp[i - 1][j], dp[i][j - 1])
    return dp[la][lb]


@given(short_text, short_text)
@settings(max_examples=200, deadline=None)
def test_lcs_matches_bruteforce(a, b):
    assert strsim.lcs_len(a, b) == _lcs_brute(a, b)


@given(short_text, short_text)
@settings(max_examples=200, deadline=None)
def test_similarity_bounds_and_symmetry(a, b):
    for fn in (strsim.edit_ratio, strsim.lcs_ratio, strsim.jaro_winkler):
        v = fn(a, b)
        assert -1e-12 <= v <= 1.0 + 1e-12
        assert abs(fn(a, b) - fn(b, a)) < 1e-12
    assert strsim.edit_ratio(a, a) == 1.0
    assert strsim.jaro_winkler(a, a) == 1.0


@given(tokens, tokens)
@settings(max_examples=200, deadline=None)
def test_jaccard_properties(ta, tb):
    a, b = set(ta), set(tb)
    v = strsim.jaccard(a, b)
    assert 0.0 <= v <= 1.0
    assert v == strsim.jaccard(b, a)
    assert strsim.jaccard(a, a) == 1.0


@given(short_text)
@settings(max_examples=200, deadline=None)
def test_tokenize_idempotent_on_normalized(t):
    """normalize(normalize(x)) == normalize(x)."""
    n = normalize_text(t)
    assert normalize_text(n) == n
    assert tokenize(n) == (n.split(" ") if n else [])


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=40))
@settings(max_examples=50, deadline=None)
def test_union_find_partition_invariance(pairs):
    """Driver-side check: min-label closure over any edge ORDER gives the same
    partition (the distributed CC relies on this order-independence)."""
    import networkx as nx

    edges = [(f"n{a}", f"n{b}") for a, b in pairs if a != b]
    g1 = nx.Graph()
    g1.add_edges_from(edges)
    g2 = nx.Graph()
    g2.add_edges_from(reversed([(b, a) for a, b in edges]))
    p1 = {frozenset(c) for c in nx.connected_components(g1)}
    p2 = {frozenset(c) for c in nx.connected_components(g2)}
    assert p1 == p2
