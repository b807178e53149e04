"""Unit tests for stages/bpe.py against a pure-Python Sennrich reference."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution__ray.stages.bpe import (
    END,
    _apply_merge,
    _leftmost_nonoverlap,
    bpe_encode,
    bpe_encode_words,
    bpe_train,
    word_counts,
)


def ref_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def ref_bpe(wc: dict, n_merges: int):
    """Sennrich 2016 algorithm 1, with (count desc, pair asc) tie-break."""
    vocab = {tuple(list(w) + [END]): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (a, b), _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        new = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def ref_encode(word, merges):
    sym = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
    "the lowest of the low",
    "",
    None,
    "New NEWER newest!  also: 42 42 42er",
]


def corpus_ds():
    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(CORPUS))), "text": CORPUS})
    ).repartition(3)


def test_word_counts(ray_session):
    out = word_counts(corpus_ds()).to_pandas()
    want = Counter(t for txt in CORPUS for t in ref_tokens(txt))
    got = dict(zip(out["word"], out["count"]))
    assert got == dict(want)


def test_leftmost_nonoverlap():
    assert _leftmost_nonoverlap(np.array([], dtype=np.int64)).tolist() == []
    assert _leftmost_nonoverlap(np.array([0, 1])).tolist() == [0]
    assert _leftmost_nonoverlap(np.array([0, 1, 2])).tolist() == [0, 2]
    assert _leftmost_nonoverlap(np.array([0, 1, 5, 7, 8, 9, 10])).tolist() == [0, 5, 7, 9]


def test_apply_merge_run_semantics():
    flat = np.array(["a", "a", "a", "a", END], dtype=object)
    lens = np.array([5], dtype=np.int64)
    nf, nl = _apply_merge(flat, lens, "a", "a")
    assert list(nf) == ["aa", "aa", END] and nl.tolist() == [3]
    # word boundary respected: (b,c) straddling two words must NOT merge
    flat = np.array(["b", "c", "b", "c"], dtype=object)
    lens = np.array([2, 2], dtype=np.int64)
    nf, nl = _apply_merge(flat, lens, "c", "b")
    assert list(nf) == ["b", "c", "b", "c"]


def test_bpe_train_matches_reference(ray_session):
    wc = Counter(t for txt in CORPUS for t in ref_tokens(txt))
    want = ref_bpe(dict(wc), n_merges=25)
    got = bpe_train(corpus_ds(), n_merges=25)
    assert got == want


def test_bpe_encode_words_matches_reference(ray_session):
    wc = Counter(t for txt in CORPUS for t in ref_tokens(txt))
    merges = ref_bpe(dict(wc), n_merges=15)
    words = ["lowest", "newest", "wide", "unseen", "x", "42er"]
    got = bpe_encode_words(words, merges)
    assert got == [ref_encode(w, merges) for w in words]


def test_bpe_encode_dataset_token_counts(ray_session):
    wc = Counter(t for txt in CORPUS for t in ref_tokens(txt))
    merges = ref_bpe(dict(wc), n_merges=20)
    out = bpe_encode(corpus_ds(), merges).to_pandas().sort_values("doc_id")
    want = [
        sum(len(ref_encode(w, merges)) for w in ref_tokens(txt)) for txt in CORPUS
    ]
    assert out["bpe_token_count"].tolist() == want


def test_bpe_train_min_count_prunes_tail(ray_session):
    wc = Counter(t for txt in CORPUS for t in ref_tokens(txt))
    pruned = {w: c for w, c in wc.items() if c >= 2}
    want = ref_bpe(pruned, n_merges=10)
    got = bpe_train(corpus_ds(), n_merges=10, min_count=2)
    assert got == want


def test_bpe_train_local_and_distributed_paths_agree(ray_session):
    """The probe-selected driver-local merge loop must produce EXACTLY the
    distributed loop's merges (and the reference's) — force each path via
    local_max_words."""
    wc = Counter(t for txt in CORPUS for t in ref_tokens(txt))
    want = ref_bpe(dict(wc), n_merges=18)
    local = bpe_train(corpus_ds(), n_merges=18, local_max_words=1 << 20)
    distributed = bpe_train(corpus_ds(), n_merges=18, local_max_words=0)
    assert local == want
    assert distributed == want
