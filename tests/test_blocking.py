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


def test_knn_block_topk_matches_conformance(ray_session):
    """The distributed exact-kNN blocking (inverted index + term-at-a-time
    scoring) reproduces the driver-side conformance implementation. min_sim
    excludes zero-similarity neighbors, whose pick order is arbitrary in
    both implementations."""
    from entity_resolution__ray.stages.blocking import knn_block_topk

    norm, _, _ = _norm_docs_table(n_entities=25, seed=7)
    ids = norm["doc_id"].to_pylist()
    # conformance mode fits on full_text; feed the same column
    texts = norm["full_text"].to_pylist()
    want = (
        knn_block_conformance(ids, texts, k=5, min_sim=1e-9)
        .sort_values(["id_left", "id_right"]).reset_index(drop=True)
    )
    ds = rd.from_arrow(pa.table({"doc_id": ids, "norm_text": texts}))
    got = (
        knn_block_topk(ds, k=5, min_sim=1e-9, batch_size=16)
        .to_pandas().sort_values(["id_left", "id_right"]).reset_index(drop=True)
    )
    # term-at-a-time accumulation differs from the dense matmul by ~1e-8,
    # which can swap EQUAL-sim candidates at the k boundary (the fixture has
    # exact duplicate texts). Compare tie-aware: large overlap, matched sims
    # bit-close, and every disagreement explained by an equal-sim swap.
    m = want.merge(got, on=["id_left", "id_right"], how="outer",
                   suffixes=("_w", "_g"), indicator=True)
    both = m[m["_merge"] == "both"]
    assert len(both) >= 0.98 * len(want)
    np.testing.assert_allclose(both["sim_w"].to_numpy(), both["sim_g"].to_numpy(), atol=1e-6)
    only_w = sorted(m.loc[m["_merge"] == "left_only", "sim_w"].round(6).tolist())
    only_g = sorted(m.loc[m["_merge"] == "right_only", "sim_g"].round(6).tolist())
    assert only_w == only_g  # each miss is a same-similarity swap, not a loss


def test_pipeline_knn_blocking_mode(ray_session):
    """blocking_mode="knn" runs the reference's exact kNN blocking inside the
    full pipeline and recovers the golden duplicate pairs."""
    from entity_resolution__ray.pipelines.er_pipeline import ERConfig, run_er_pipeline

    docs, clusters, golden = generate_corpus(n_entities=20, seed=11)
    out = run_er_pipeline(
        rd.from_arrow(docs),
        labeled_pairs=golden,
        config=ERConfig(blocking_mode="knn", per_doc_topk=40, use_geo=False,
                        run_cohort_transitivity=False, num_partitions=4),
    )
    pairs = out["candidate_pairs"].to_pandas()
    got = set(zip(pairs["id_left"], pairs["id_right"]))
    g = golden.to_pandas()
    pos = set(zip(g.loc[g["label"] == 1, "id_left"], g.loc[g["label"] == 1, "id_right"]))
    recall = len(got & pos) / max(len(pos), 1)
    assert recall >= 0.9, recall
    assert out["clusters_cc"].count() > 0


def test_pair_emitter_bucket_matches_per_key():
    """PairEmitterBucket (bucket-vectorized emission used by candidate_pairs)
    must equal the per-key PairEmitter ground truth — pairs, sims AND top-k
    tie-break selections — on a bucket mixing small keys, a key needing
    salting, shared docs across keys, and an empty-text doc."""
    import numpy as np
    import pandas as pd

    from entity_resolution__ray.stages.blocking import PairEmitter, PairEmitterBucket

    rng = np.random.RandomState(5)
    words = [f"w{i}" for i in range(30)]
    rows = []
    for key, n in [("ka", 5), ("kb", 2), ("kc", 1), ("kd", 40)]:
        for d in range(n):
            doc = int(rng.randint(0, 10_000))
            text = " ".join(rng.choice(words, size=rng.randint(0, 8), replace=False))
            rows.append({"block_key": key, "doc_id": doc, "norm_text": text})
    rows.append({"block_key": "ka", "doc_id": rows[0]["doc_id"], "norm_text": rows[0]["norm_text"]})
    g = pd.DataFrame(rows)

    kwargs = dict(max_group_size=16, per_doc_topk=3)  # kd (40 docs) gets salted
    old_parts = [
        PairEmitter(**kwargs)(sub) for _, sub in g.groupby("block_key", sort=False)
    ]
    old = pd.concat([p for p in old_parts if len(p)], ignore_index=True)
    import pyarrow as pa_

    new = PairEmitterBucket(**kwargs)(pa_.Table.from_pandas(g, preserve_index=False)).to_pandas()

    key_cols = ["block_key", "id_left", "id_right"]
    old_s = old.sort_values(key_cols).reset_index(drop=True)
    new_s = new.sort_values(key_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        old_s[key_cols + ["sim"]], new_s[key_cols + ["sim"]], check_dtype=False
    )
