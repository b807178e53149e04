"""Tests for dedup operators: exact, MinHash-LSH, SimHash, embedding LSH."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.dedup import (
    HyperplaneLSHKeys,
    MinHashLSHKeys,
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    simhash64,
    simhash_candidates,
)


def _docs():
    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base.replace("lazy", "sleepy")
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},             # exact dup of 1
        {"doc_id": 3, "text": near},             # near dup of 1
        {"doc_id": 4, "text": "completely different content about entirely other topics and things"},
        {"doc_id": 5, "text": "yet another unrelated document talking about databases and queries"},
    ]
    return rd.from_items(rows)


def test_exact_dedup_keeps_min_id(ray_session):
    out = exact_dedup(_docs()).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 3, 4, 5]  # doc 2 removed, rep = min id


def test_minhash_lsh_finds_near_dups(ray_session):
    cands = minhash_lsh_candidates(_docs()).to_pandas()
    pairs = set(zip(cands["id_left"], cands["id_right"]))
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs
    assert (4, 5) not in pairs


def test_minhash_lsh_dedup_clusters(ray_session):
    out = minhash_lsh_dedup(_docs(), threshold=0.7).to_pandas()
    groups = out.groupby("dup_group")["doc_id"].apply(set).tolist()
    assert {1, 2, 3} in groups  # all three close transitively
    flat = set().union(*groups) if groups else set()
    assert 4 not in flat and 5 not in flat


def test_simhash_identical_and_near(ray_session):
    a = simhash64("the quick brown fox".split())
    b = simhash64("the quick brown fox".split())
    assert a == b
    cands = simhash_candidates(_docs(), max_hamming=6).to_pandas()
    pairs = set(zip(cands["id_left"], cands["id_right"]))
    assert (1, 2) in pairs
    assert cands.loc[(cands["id_left"] == 1) & (cands["id_right"] == 2), "hamming"].iloc[0] == 0


def test_embedding_near_dup(ray_session):
    rng = np.random.RandomState(0)
    v = rng.randn(8)
    rows = [
        {"vec_id": 0, "embedding": v.tolist()},
        {"vec_id": 1, "embedding": (v + rng.randn(8) * 0.01).tolist()},  # near dup
        {"vec_id": 2, "embedding": rng.randn(8).tolist()},
        {"vec_id": 3, "embedding": (-v).tolist()},  # anti-parallel
    ]
    out = embedding_near_dup(rd.from_items(rows), dim=8, threshold=0.99).to_pandas()
    pairs = set(zip(out["id_left"], out["id_right"]))
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_minhash_keys_deterministic():
    t = pa.table({"doc_id": [1], "text": ["some text to hash deterministically"]})
    k1 = MinHashLSHKeys()(t).to_pylist()
    k2 = MinHashLSHKeys()(t).to_pylist()
    assert k1 == k2
