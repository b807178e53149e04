"""Tests for similarity search: brute-force exact top-k + IVF approximate."""

import numpy as np
import pytest

import ray.data as rd

from entity_resolution__ray.stages.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_topk,
    ivf_topk_partitioned,
    ivf_write_partitioned,
    kmeans_fit,
)


def _vectors(n=200, d=16, seed=1):
    rng = np.random.RandomState(seed)
    V = rng.randn(n, d)
    rows = [{"vec_id": i, "embedding": V[i].tolist()} for i in range(n)]
    return rd.from_items(rows), V


def _exact_topk(V, q, k):
    Vn = V / np.linalg.norm(V, axis=1)[:, None]
    qn = q / np.linalg.norm(q)
    sims = Vn @ qn
    return list(np.argsort(-sims)[:k])


def test_brute_force_matches_numpy(ray_session):
    ds, V = _vectors()
    q = V[7] + 0.01  # near vector 7
    out = brute_force_topk(ds, np.array([q]), k=5).to_pandas()
    got = out.loc[out["query_idx"] == 0, "vec_id"].tolist()
    assert got == _exact_topk(V, q, 5)
    # cosines descending
    cos = out.loc[out["query_idx"] == 0, "cosine"].tolist()
    assert cos == sorted(cos, reverse=True)


def test_brute_force_multiple_queries(ray_session):
    ds, V = _vectors()
    Q = np.stack([V[3], V[50]])
    out = brute_force_topk(ds, Q, k=3).to_pandas()
    assert out.loc[out["query_idx"] == 0, "vec_id"].iloc[0] == 3
    assert out.loc[out["query_idx"] == 1, "vec_id"].iloc[0] == 50


def test_kmeans_deterministic():
    rng = np.random.RandomState(2)
    X = rng.randn(100, 8)
    c1 = kmeans_fit(X, 4, seed=3)
    c2 = kmeans_fit(X, 4, seed=3)
    np.testing.assert_allclose(c1, c2)


def test_ivf_topk_high_recall(ray_session):
    ds, V = _vectors(n=300)
    assigned, centers = ivf_build(ds, n_clusters=8, sample_size=300)
    assigned = assigned.materialize()
    Q = np.stack([V[11], V[123]])
    approx = ivf_topk(assigned, centers, Q, k=5, nprobe=4)
    got0 = [r["vec_id"] for r in approx.to_pylist() if r["query_idx"] == 0]
    # the query's own vector must be found (it lives in the top probed cell)
    assert 11 in got0
    exact0 = _exact_topk(V, V[11], 5)
    recall = len(set(got0) & set(exact0)) / 5
    assert recall >= 0.6


def test_ivf_partitioned_matches_inmemory(ray_session, tmp_path):
    ds, V = _vectors(n=300, seed=4)
    assigned, centers = ivf_build(ds, n_clusters=8, sample_size=300)
    assigned = assigned.materialize()
    Q = np.stack([V[11], V[123]])
    want = ivf_topk(assigned, centers, Q, k=5, nprobe=3).to_pandas()

    path = str(tmp_path / "ivf_layout")
    ivf_write_partitioned(assigned, path)
    # one hive directory per cell on disk
    import os

    cell_dirs = [d for d in os.listdir(path) if d.startswith("ivf_cell=")]
    assert len(cell_dirs) > 1

    got = ivf_topk_partitioned(path, centers, Q, k=5, nprobe=3).to_pandas()
    assert got["query_idx"].tolist() == want["query_idx"].tolist()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    # parquet roundtrip reorders the normalize/dot summation — 1-ULP drift
    np.testing.assert_allclose(got["cosine"].to_numpy(), want["cosine"].to_numpy(), atol=1e-12)
