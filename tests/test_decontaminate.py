"""Benchmark-decontamination operator (stages/decontaminate.py)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution__ray.stages.decontaminate import (
    _gram_hashes,
    _hash_gram_strings,
    _tokenize_lower,
    collect_benchmark_grams,
    decontaminate,
)
from entity_resolution__ray.functions.hashing import hash_strings


def _brute_grams(text: str, n: int) -> set:
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _brute_flags(texts, bench_texts, n):
    bad = set()
    for t in bench_texts:
        bad |= _brute_grams(t, n)
    return [bool(_brute_grams(t, n) & bad) for t in texts]


CORPUS = [
    "The quick brown fox jumps over the lazy dog",      # contaminated (case-folded)
    "the QUICK brown fox sat down",                      # shares 'the quick brown'
    "a completely different document about rivers",      # clean
    "quick brown fox",                                   # exactly one 3-gram, contaminated
    "brown quick the",                                   # same tokens, wrong ORDER -> clean
    "thequick brown fox",                                # boundary: no token match -> clean
    "",                                                  # empty -> clean
    "two tokens",                                        # shorter than n -> clean
    "x the quick y brown fox z",                         # gram broken up -> clean
]
BENCH = ["THE Quick Brown fox ate", "unrelated benchmark text here okay"]
N = 3


def test_matches_brute_force():
    bench = rd.from_arrow(pa.table({"doc_id": list(range(len(BENCH))), "text": BENCH}))
    docs = rd.from_arrow(pa.table({"doc_id": list(range(len(CORPUS))), "text": CORPUS}))
    grams = collect_benchmark_grams(bench, n=N)
    assert grams == frozenset().union(*[_brute_grams(t, N) for t in BENCH])
    out = decontaminate(docs, grams, n=N).to_pandas().sort_values("doc_id")
    assert list(out["contaminated"]) == _brute_flags(CORPUS, BENCH, N)


def test_drop_action_removes_flagged():
    bench = rd.from_arrow(pa.table({"text": BENCH}))
    docs = rd.from_arrow(pa.table({"doc_id": list(range(len(CORPUS))), "text": CORPUS}))
    grams = collect_benchmark_grams(bench, n=N)
    kept = decontaminate(docs, grams, n=N, action="drop").to_pandas()
    expect = [i for i, f in enumerate(_brute_flags(CORPUS, BENCH, N)) if not f]
    assert sorted(kept["doc_id"]) == expect
    assert "contaminated" not in kept.columns


def test_empty_benchmark_flags_nothing():
    docs = rd.from_arrow(pa.table({"doc_id": [0, 1], "text": ["a b c d", "e f g"]}))
    out = decontaminate(docs, frozenset(), n=3).to_pandas()
    assert not out["contaminated"].any()


def test_gram_hash_parity_between_corpus_and_benchmark_paths():
    # the probe hashes corpus windows from exploded tokens; the benchmark side
    # hashes pre-joined gram strings — both must produce identical values
    texts = ["alpha beta gamma delta", "beta gamma delta epsilon zeta"]
    rows, flat = _tokenize_lower(pa.array(texts))
    _, _, gh = _gram_hashes(rows, hash_strings(flat), 3)
    grams = [g for t in texts for g in sorted(_brute_grams(t, 3))]
    via_strings = _hash_gram_strings(grams, 3)
    assert set(gh.tolist()) == set(via_strings.tolist())


def test_collect_gate_raises_on_oversized_benchmark():
    bench = rd.from_arrow(pa.table({"text": ["a b c d e f g h i j"]}))
    with pytest.raises(ValueError, match="max_grams"):
        collect_benchmark_grams(bench, n=2, max_grams=3)


def test_tokenize_lower_drops_empty_and_lowercases():
    rows, flat = _tokenize_lower(pa.array(["  A  b ", "", None, "\tCÉ d"]))
    assert flat.to_pylist() == ["a", "b", "cé", "d"]
    assert rows.tolist() == [0, 0, 3, 3]


def test_bad_action_raises():
    docs = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError, match="action"):
        decontaminate(docs, frozenset({"a b"}), n=2, action="nope")
