"""Unit tests for stages/kmeans.py (distributed Lloyd's + SemDeDup)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution__ray.stages.kmeans import (
    _argmin_cells,
    kmeans_assign,
    kmeans_fit,
    semdedup,
)


def make_blobs(n_per=40, k=4, d=8, seed=11, scale=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 3.0
    X = np.concatenate([c + rng.normal(size=(n_per, d)) * scale for c in centers])
    ids = np.arange(len(X), dtype=np.int64)
    return ids, X


def ref_lloyd(X, k, n_iters):
    """Driver-side reference with the SAME deterministic init (k smallest ids
    = first k rows) and per-cell mean updates."""
    C = X[:k].astype(np.float64).copy()
    inertias = []
    for _ in range(n_iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cells = np.argmin(d2, axis=1)
        inertias.append(float(d2[np.arange(len(X)), cells].sum()))
        for c in range(k):
            m = cells == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return C, cells, inertias


def to_ds(ids, X):
    return rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": pa.array(list(X.astype(np.float64)))})
    ).repartition(5)


def test_kmeans_fit_matches_reference(ray_session):
    ids, X = make_blobs()
    C, inertias = kmeans_fit(to_ds(ids, X), k=4, n_iters=4)
    refC, _, ref_inertias = ref_lloyd(X, 4, 4)
    assert np.allclose(C, refC, atol=1e-8)
    assert np.allclose(inertias, ref_inertias, rtol=1e-9)
    assert all(b <= a * (1 + 1e-9) for a, b in zip(inertias, inertias[1:]))


def test_kmeans_assign_is_exact_argmin(ray_session):
    ids, X = make_blobs(seed=5)
    C = X[:4].astype(np.float64)
    out = kmeans_assign(to_ds(ids, X), C).to_pandas().sort_values("vec_id")
    want = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1)
    assert (out["cell"].to_numpy() == want).all()


def test_argmin_ties_go_to_lowest_cell():
    X = np.array([[0.0, 0.0]])
    C = np.array([[1.0, 0.0], [-1.0, 0.0]])  # equidistant
    cells, d2 = _argmin_cells(X, C)
    assert cells[0] == 0 and d2[0] == pytest.approx(1.0)


def test_kmeans_fit_k_too_large(ray_session):
    ids, X = make_blobs(n_per=1, k=2)
    with pytest.raises(ValueError):
        kmeans_fit(to_ds(ids, X), k=10)


def _dup_corpus(seed=3):
    """4 tight blobs; in each blob, rows come in near-identical pairs
    (cos ≥ 0.999) so SemDeDup must drop exactly one of each pair."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(4, 16)) * 5.0
    rows, dup_of = [], {}
    vid = 0
    for b in base:
        for _ in range(10):
            v = b + rng.normal(size=16) * 0.2
            rows.append(v)
            first = vid
            vid += 1
            rows.append(v + rng.normal(size=16) * 1e-4)  # near-exact dup
            dup_of[vid] = first
            vid += 1
    return np.arange(vid, dtype=np.int64), np.stack(rows), dup_of


def test_semdedup_drops_one_per_dup_pair(ray_session):
    ids, X, dup_of = _dup_corpus()
    out = semdedup(to_ds(ids, X), k=4, n_iters=3, threshold=0.999999).to_pandas()
    keep = dict(zip(out["vec_id"], out["keep"]))
    assert len(keep) == len(ids)
    for dup, first in dup_of.items():
        # lower-id member kept, its near-copy dropped
        assert keep[first] == 1, (first, dup)
        assert keep[dup] == 0, (first, dup)
    # nothing else dropped at this ultra-tight threshold
    assert sum(keep.values()) == len(ids) - len(dup_of)


def test_semdedup_giant_cell_split_still_dedups_within_subcell(ray_session):
    ids, X, dup_of = _dup_corpus(seed=9)
    # max_cell below every cell size forces the id-hash sub-split path:
    # cells of ~20 rows split into ceil(20/5)=4 sub-cells of ~5 rows
    out = semdedup(
        to_ds(ids, X), k=4, n_iters=2, threshold=0.999999, max_cell=5
    ).to_pandas()
    assert len(out) == len(ids)
    keep = dict(zip(out["vec_id"], out["keep"]))
    # the split may separate some pairs (documented recall loss) but must
    # never drop BOTH members of a pair...
    for dup, first in dup_of.items():
        assert keep[first] + keep[dup] >= 1
    # ...and dedup must NOT be silently disabled: sub-cells are ~max_cell
    # sized, so a meaningful fraction of the 40 dup pairs still co-land
    # (a fixed-width hash would shatter cells to singletons and drop nothing)
    n_dropped = sum(1 for dup, first in dup_of.items() if keep[dup] == 0)
    assert n_dropped >= len(dup_of) // 8, n_dropped
    # sub-cell sizes stay bounded: no more rows dropped than a same-sub dup
    # relationship can explain (sanity: at least SOME kept in every cell)
    assert out.groupby("cell")["keep"].sum().min() >= 1
