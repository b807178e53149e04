"""Tests for pair feature extraction (reference: feautre_extraction.py:116-163)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.functions import strsim
from entity_resolution__ray.functions.vectorizer import pair_char_tfidf, pair_word_tfidf
from entity_resolution__ray.schema import FEATURE_COLS
from entity_resolution__ray.stages.features import (
    attach_texts,
    compute_pair_features,
    fit_pair_vectorizers,
    pair_features,
)
from entity_resolution__ray.stages.normalize import NormalizeDocs
from entity_resolution__ray.testgen import generate_corpus

CORPUS = [
    "ibm almaden research center san jose usa",
    "ibm almaden research ctr san jose us",
    "stanford university california",
    "university of tokyo japan",
    "",
]


def _fitted_vecs(corpus=CORPUS):
    return pair_word_tfidf().fit(corpus), pair_char_tfidf().fit(corpus)


def test_identical_pairs_score_one():
    vw, vc = _fitted_vecs()
    feats = compute_pair_features([CORPUS[0]], [CORPUS[0]], vw, vc)
    for col in ["edit_ratio", "jaro_winkler", "lcs_ratio", "token_jaccard",
                "token_cosine", "tfidf_word_cosine", "tfidf_char_cosine"]:
        assert feats[col][0] == pytest.approx(1.0), col
    assert feats["dmetaphone_match"][0] == 1.0


def test_empty_pair_edge_cases():
    vw, vc = _fitted_vecs()
    feats = compute_pair_features([""], [""], vw, vc)
    # reference semantics: both-empty jaccard/lcs/edit = 1.0, cosines 0.0, dmetaphone 0
    assert feats["token_jaccard"][0] == 1.0
    assert feats["lcs_ratio"][0] == 1.0
    assert feats["edit_ratio"][0] == 1.0
    assert feats["token_cosine"][0] == 0.0
    assert feats["tfidf_word_cosine"][0] == 0.0
    assert feats["dmetaphone_match"][0] == 0.0


def test_features_match_scalar_kernels():
    vw, vc = _fitted_vecs()
    a, b = CORPUS[0], CORPUS[1]
    feats = compute_pair_features([a], [b], vw, vc)
    assert feats["edit_ratio"][0] == pytest.approx(strsim.edit_ratio(a, b))
    assert feats["jaro_winkler"][0] == pytest.approx(strsim.jaro_winkler(a, b))
    assert feats["lcs_ratio"][0] == pytest.approx(strsim.lcs_ratio(a, b))
    assert feats["token_jaccard"][0] == pytest.approx(strsim.jaccard(set(a.split()), set(b.split())))
    assert feats["dmetaphone_match"][0] == strsim.dmetaphone_match_first_token(a.split(), b.split())


def test_near_pairs_beat_far_pairs():
    vw, vc = _fitted_vecs()
    feats = compute_pair_features([CORPUS[0], CORPUS[0]], [CORPUS[1], CORPUS[3]], vw, vc)
    for col in FEATURE_COLS:
        if col == "dmetaphone_match":
            continue
        assert feats[col][0] > feats[col][1], col


def test_attach_texts_broadcast_and_join(ray_session):
    docs, _, _ = generate_corpus(n_entities=10, seed=2)
    norm = rd.from_arrow(NormalizeDocs()(docs))
    lookup = {r["doc_id"]: r["norm_text"] for r in norm.select_columns(["doc_id", "norm_text"]).take_all()}
    ids = sorted(lookup)[:4]
    pairs = rd.from_items(
        [{"id_left": ids[0], "id_right": ids[1]}, {"id_left": ids[2], "id_right": ids[3]}]
    )
    for mode in ("broadcast", "join"):
        out = attach_texts(pairs, norm, mode=mode, num_partitions=2).to_pandas()
        assert len(out) == 2
        out = out.sort_values("id_left").reset_index(drop=True)
        for _, row in out.iterrows():
            assert row["src_text"] == lookup[row["id_left"]]
            assert row["cand_text"] == lookup[row["id_right"]]


def test_pair_features_dataset_stage(ray_session):
    docs, _, _ = generate_corpus(n_entities=10, seed=2)
    norm = rd.from_arrow(NormalizeDocs()(docs))
    vw, vc = fit_pair_vectorizers(norm)
    ids = [r["doc_id"] for r in norm.select_columns(["doc_id"]).take(4)]
    pairs = rd.from_items([{"id_left": ids[0], "id_right": ids[1]}])
    with_texts = attach_texts(pairs, norm, mode="broadcast")
    out = pair_features(with_texts, vw, vc).to_pandas()
    assert set(FEATURE_COLS).issubset(out.columns)
    assert len(out) == 1
    for col in FEATURE_COLS:
        assert -1e-9 <= out[col].iloc[0] <= 1.0 + 1e-9


def test_broadcast_attach_matches_join_attach(ray_session):
    """pair_features must produce identical features whether texts are
    attached by block-ref broadcast (small side) or by distributed hash join
    (the 10^12-doc path)."""
    import numpy as np

    from entity_resolution__ray.stages.features import pair_features_broadcast

    docs, _, _ = generate_corpus(n_entities=15, seed=4)
    norm_tbl = NormalizeDocs()(docs)
    norm = rd.from_arrow(norm_tbl)
    vw, vc = fit_pair_vectorizers(norm)
    ids = norm_tbl["doc_id"].to_pylist()
    pairs = rd.from_items(
        [{"id_left": ids[i], "id_right": ids[i + 1]} for i in range(0, 40, 2)],
        override_num_blocks=2,
    )
    via_join = (
        pair_features(attach_texts(pairs, norm, mode="join", num_partitions=4), vw, vc)
        .to_pandas().sort_values(["id_left", "id_right"]).reset_index(drop=True)
    )
    via_broadcast = (
        pair_features_broadcast(pairs, norm, vw, vc)
        .to_pandas().sort_values(["id_left", "id_right"]).reset_index(drop=True)
    )
    for col in FEATURE_COLS:
        # 1e-5: the broadcast store keeps TF-IDF weights as float32 (the
        # scoring kernels are DRAM-bandwidth-bound, so halving the bytes is
        # a direct win); cosines move by ~1e-7 vs the float64 join path
        np.testing.assert_allclose(
            via_broadcast[col].to_numpy(), via_join[col].to_numpy(), atol=1e-5, err_msg=col
        )
