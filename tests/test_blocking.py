"""Tests for blocking: key emission, salted pair generation, undirected
collapse, stopword aggregate, and blocking recall on the fixture corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.blocking import (
    BlockKeyEmitter,
    MinHasher,
    PairEmitter,
    candidate_pairs,
    dataset_stopwords,
    emit_block_keys,
    knn_block_conformance,
    stable_token_hashes,
)
from entity_resolution__ray.stages.normalize import NormalizeDocs
from entity_resolution__ray.testgen import generate_corpus


def _norm_docs_table(n_entities=30, seed=42):
    docs, clusters, pairs = generate_corpus(n_entities=n_entities, seed=seed)
    return NormalizeDocs()(docs), clusters, pairs


def test_minhash_deterministic_and_similarity_sensitive():
    mh = MinHasher(n_perm=16, seed=7)
    a = stable_token_hashes(["ab", "bc", "cd", "de", "ef"])
    b = stable_token_hashes(["ab", "bc", "cd", "de", "xx"])
    c = stable_token_hashes(["zz", "yy", "ww", "vv", "uu"])
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    assert (sa == mh.signature(a)).all()
    assert (sa == sb).sum() > (sa == sc).sum()


def test_block_key_emitter_token_and_qgram_keys():
    batch = pa.table({"doc_id": ["d1", "d2"], "norm_text": ["ibm research usa", "ibm research usa"]})
    out = BlockKeyEmitter()(batch).to_pylist()
    d1_keys = {r["block_key"] for r in out if r["doc_id"] == "d1"}
    d2_keys = {r["block_key"] for r in out if r["doc_id"] == "d2"}
    assert d1_keys == d2_keys  # identical text → identical keys
    assert "t:ibm" in d1_keys and "t:research" in d1_keys and "t:usa" in d1_keys
    assert any(k.startswith("q0:") for k in d1_keys)


def test_pair_emitter_small_group_all_pairs_canonical():
    g = pd.DataFrame(
        {
            "block_key": ["t:x"] * 3,
            "doc_id": ["b", "a", "c"],
            "norm_text": ["ibm research", "ibm research lab", "something else"],
        }
    )
    out = PairEmitter()(g)
    assert len(out) == 3
    assert (out["id_left"] < out["id_right"]).all()
    pair_sims = dict(zip(zip(out["id_left"], out["id_right"]), out["sim"]))
    assert pair_sims[("a", "b")] == pytest.approx(2 / 3)


def test_pair_emitter_salting_caps_group():
    n = 60
    g = pd.DataFrame(
        {
            "block_key": ["t:hot"] * n,
            "doc_id": [f"d{i:03d}" for i in range(n)],
            "norm_text": [f"text {i}" for i in range(n)],
        }
    )
    out = PairEmitter(max_group_size=20, per_doc_topk=1000)(g)
    # salted: strictly fewer than all n*(n-1)/2 pairs, more than zero
    assert 0 < len(out) < n * (n - 1) // 2


def test_pair_emitter_per_doc_topk_bounds_fanout():
    n = 30
    g = pd.DataFrame(
        {
            "block_key": ["t:k"] * n,
            "doc_id": [f"d{i:03d}" for i in range(n)],
            "norm_text": ["shared common tokens here"] * n,
        }
    )
    out = PairEmitter(max_group_size=256, per_doc_topk=3)(g)
    fanout = pd.concat([out["id_left"], out["id_right"]]).value_counts()
    # each doc keeps its top-3 (union semantics can add a few more as the
    # partner side of another doc's top-k)
    assert fanout.min() >= 1
    assert len(out) <= n * 3


def test_candidate_pairs_end_to_end_recall(ray_session):
    norm, clusters, golden = _norm_docs_table(n_entities=30)
    ds = rd.from_arrow(norm)
    keys = emit_block_keys(ds)
    pairs = candidate_pairs(keys, max_group_size=256, per_doc_topk=40).to_pandas()
    assert (pairs["id_left"] < pairs["id_right"]).all()
    # no duplicate pairs after collapse
    assert not pairs.duplicated(["id_left", "id_right"]).any()
    # recall vs golden positive pairs
    got = set(zip(pairs["id_left"], pairs["id_right"]))
    g = golden.to_pandas()
    pos = set(zip(g.loc[g["label"] == 1, "id_left"], g.loc[g["label"] == 1, "id_right"]))
    recall = len(got & pos) / len(pos)
    assert recall > 0.95, f"blocking recall {recall:.3f}"


def test_dataset_stopwords(ray_session):
    tbl = pa.table(
        {"norm_text": ["university of chicago", "university of tokyo", "university lab", "other thing"]}
    )
    stops = dataset_stopwords(rd.from_arrow(tbl), freq_cutoff=0.6)
    assert "university" in stops
    assert "chicago" not in stops


def test_knn_conformance_mode_matches_reference_shape():
    norm, clusters, golden = _norm_docs_table(n_entities=15)
    ids = norm["doc_id"].to_pylist()
    texts = norm["full_text"].to_pylist()
    out = knn_block_conformance(ids, texts, k=5)
    assert set(out.columns) == {"id_left", "id_right", "sim"}
    assert (out["id_left"] < out["id_right"]).all()
    assert not out.duplicated(["id_left", "id_right"]).any()
    # k bounds directed fan-out: ≤ n*k undirected pairs
    assert len(out) <= len(ids) * 5
