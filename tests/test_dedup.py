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


def test_intersect_sorted_sets_classes_and_edges():
    """Exact |A∩B| across size classes, the giant fallback, empty sets and
    missing (-1) indices — the verify kernel the gram-set path rides on."""
    from entity_resolution__ray.stages.dedup import _intersect_sorted_sets

    rng = np.random.RandomState(3)
    sets = [
        np.array([], dtype=np.uint64),                                   # empty
        np.sort(rng.choice(2**20, 30, replace=False)).astype(np.uint64), # small
        np.sort(rng.choice(2**20, 700, replace=False)).astype(np.uint64),# mid class
        np.sort(rng.choice(2**22, 9000, replace=False)).astype(np.uint64),   # 16384 class
        np.sort(rng.choice(2**24, 20000, replace=False)).astype(np.uint64),  # giant fallback
    ]
    values = np.concatenate(sets)
    offs = np.zeros(len(sets) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets], out=offs[1:])

    ia, ib = [], []
    for i in range(len(sets)):
        for j in range(len(sets)):
            ia.append(i)
            ib.append(j)
    ia.append(-1)  # missing left
    ib.append(2)
    ia, ib = np.array(ia), np.array(ib)
    inter, na, nb = _intersect_sorted_sets(values, offs, ia, ib)
    for k in range(len(ia)):
        a = sets[ia[k]] if ia[k] >= 0 else np.array([], dtype=np.uint64)
        b = sets[ib[k]] if ib[k] >= 0 else np.array([], dtype=np.uint64)
        want = len(np.intersect1d(a, b, assume_unique=True))
        assert inter[k] == want, (k, ia[k], ib[k], inter[k], want)
        assert na[k] == len(a) and nb[k] == len(b)


def test_jaccard_verify_null_texts():
    """Join-path verify with missing docs: null texts must behave as empty
    strings, not crash or compute garbage (dictionary_encode null indices)."""
    from entity_resolution__ray.stages.dedup import JaccardVerify

    t = pa.table(
        {
            "id_left": [1, 2, 3],
            "id_right": [4, 5, 6],
            "src_text": ["same exact text here", None, None],
            "cand_text": ["same exact text here", "real text on one side", None],
        }
    )
    out = JaccardVerify()(t).to_pylist()
    assert out[0]["jaccard"] == 1.0
    assert out[1]["jaccard"] == 0.0  # empty vs non-empty
    assert out[2]["jaccard"] == 1.0  # both empty → 1.0 (reference rule)


def test_gram_set_verify_unknown_ids(ray_session):
    """Candidate pairs whose ids are absent from the gram store must verify
    to jaccard 0.0 (unknown ≠ empty) — not ride the both-empty=1.0 rule."""
    from entity_resolution__ray.stages.dedup import GramSetVerify, build_gram_set_refs

    docs = rd.from_items(
        [{"doc_id": 1, "text": "alpha beta gamma delta"}, {"doc_id": 2, "text": ""}]
    )
    refs = build_gram_set_refs(docs, text_col="text", id_col="doc_id", shingle="char4")
    v = GramSetVerify(refs, key="test-unknown-ids")
    out = v(
        pa.table({"id_left": [99, 1, 2], "id_right": [98, 99, 2]})
    ).to_pylist()
    assert out[0]["jaccard"] == 0.0  # both unknown
    assert out[1]["jaccard"] == 0.0  # one unknown
    assert out[2]["jaccard"] == 1.0  # both present, both genuinely empty


def test_near_dup_attach_mode_parity(ray_session):
    """broadcast (gram-store) and join (text-riding) verify paths must produce
    the identical dup-group partition — the same guarantee the ER pipeline's
    forced-join parity test gives, for the dedup scale path."""
    from entity_resolution__ray.stages.dedup import minhash_lsh_candidates, near_dup_clusters

    docs = _docs()
    cands = minhash_lsh_candidates(docs).materialize()

    def partition(ds):
        df = ds.to_pandas()
        return {frozenset(g) for _, g in df.groupby("dup_group")["doc_id"]}

    p_b = partition(near_dup_clusters(docs, cands, threshold=0.7, attach_mode="broadcast"))
    p_j = partition(near_dup_clusters(docs, cands, threshold=0.7, attach_mode="join"))
    assert p_b == p_j and len(p_b) > 0


def test_giant_band_group_star_emission(ray_session):
    """A band group larger than max_group_size emits a star (min-id member →
    every other member, O(m) edges) instead of the O(m²) triu, and the
    transitive closure still recovers the full cluster. 120 near-identical
    replicas (same base text + short suffix) all land in shared band groups;
    with max_group_size=64 the candidate count must be O(m·bands), far below
    C(120,2), and minhash_lsh_dedup must still cluster all 120 together."""
    from entity_resolution__ray.stages.dedup import _pairs_from_band_groups, near_dup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    rows = [{"doc_id": i, "text": f"{base} r{i}"} for i in range(120)]
    docs = rd.from_items(rows)

    keys = docs.map_batches(
        MinHashLSHKeys(), batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = _pairs_from_band_groups(keys, max_group_size=64).to_pandas()
    n_pairs = len(pairs)
    assert 119 <= n_pairs < 120 * 119 // 2  # star-bounded, not quadratic
    # every spoke is canonical (left < right)
    assert (pairs["id_left"] < pairs["id_right"]).all()

    out = minhash_lsh_dedup(docs, threshold=0.8).to_pandas()
    assert len(out) == 120
    assert out["dup_group"].nunique() == 1  # one cluster, all 120 members
    assert out["dup_group"].unique()[0] == 0  # labeled by min doc id
