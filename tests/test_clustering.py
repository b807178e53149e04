"""Tests for distributed connected components + cohort transitivity
(reference: apply_transitivity.py, apply_clustering_algorithm.py).
Oracle: networkx connected_components."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.clustering import (
    cc_clusters,
    cohort_seed_edges,
    cohort_transitivity,
    clusters_from_labels,
    connected_components,
)


def _random_edges(n_nodes=60, n_edges=80, seed=3):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n_nodes, n_edges)
    v = rng.randint(0, n_nodes, n_edges)
    mask = u != v
    return [(f"n{a:03d}", f"n{b:03d}") for a, b in zip(u[mask], v[mask])]


def _nx_partition(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    return {frozenset(c) for c in nx.connected_components(g)}


def _labels_partition(rows):
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], set()).add(r["node"])
    return {frozenset(s) for s in by_label.values()}


def test_connected_components_matches_networkx(ray_session):
    edges = _random_edges()
    ds = rd.from_items([{"u": a, "v": b} for a, b in edges])
    labels = connected_components(ds, num_partitions=4)
    assert _labels_partition(labels.take_all()) == _nx_partition(edges)


def test_cc_chain_diameter(ray_session):
    # a long chain exercises multiple propagation iterations
    chain = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(12)]
    ds = rd.from_items([{"u": a, "v": b} for a, b in chain])
    labels = connected_components(ds, num_partitions=2)
    rows = labels.take_all()
    assert len({r["label"] for r in rows}) == 1
    assert {r["node"] for r in rows} == {f"c{i:02d}" for i in range(13)}


def test_cc_invariant_under_edge_order_and_direction(ray_session):
    edges = _random_edges(seed=9)
    flipped = [(b, a) for a, b in reversed(edges)]
    ds1 = rd.from_items([{"u": a, "v": b} for a, b in edges])
    ds2 = rd.from_items([{"u": a, "v": b} for a, b in flipped])
    p1 = _labels_partition(connected_components(ds1, num_partitions=3).take_all())
    p2 = _labels_partition(connected_components(ds2, num_partitions=5).take_all())
    assert p1 == p2


def test_clusters_from_labels_dense_renumber_and_sizes(ray_session):
    labels = rd.from_items(
        [
            {"node": "a", "label": "a"},
            {"node": "b", "label": "a"},
            {"node": "c", "label": "c"},
        ]
    )
    out = clusters_from_labels(labels).to_pandas()
    assert list(out.columns) == ["node_id", "cluster_id", "cluster_size"]
    assert out["cluster_id"].tolist() == [0, 0, 1]  # sorted by (cluster_id, node_id)
    assert out["node_id"].tolist() == ["a", "b", "c"]
    assert out["cluster_size"].tolist() == [2, 2, 1]


def test_cc_clusters_end_to_end(ray_session):
    edges = _random_edges(seed=5)
    ds = rd.from_items([{"id_left": a, "id_right": b} for a, b in edges])
    out = cc_clusters(ds, num_partitions=4).to_pandas()
    got = {frozenset(g["node_id"]) for _, g in out.groupby("cluster_id")}
    assert got == _nx_partition(edges)
    sizes = out.groupby("cluster_id")["node_id"].count()
    for cid, grp in out.groupby("cluster_id"):
        assert (grp["cluster_size"] == sizes[cid]).all()


def test_checkpoint_resume_mid_closure(ray_session, tmp_path):
    chain = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(14)]
    ds = rd.from_items([{"u": a, "v": b} for a, b in chain])
    ckpt = str(tmp_path / "cc")
    import os

    os.makedirs(ckpt, exist_ok=True)
    # run only 2 iterations (simulated kill), then resume to completion
    partial = connected_components(ds, checkpoint_dir=ckpt, num_partitions=2, max_iters=2)
    assert len({r["label"] for r in partial.take_all()}) > 1  # not yet converged
    resumed = connected_components(ds, checkpoint_dir=ckpt, num_partitions=2, max_iters=50)
    rows = resumed.take_all()
    assert len({r["label"] for r in rows}) == 1
    # direct run equals resumed run
    direct = connected_components(ds, num_partitions=2)
    assert _labels_partition(rows) == _labels_partition(direct.take_all())


def test_cohort_seed_edges_one_row_per_shared_country(ray_session):
    edges = rd.from_items(
        [
            {
                "id_left": "a",
                "id_right": "b",
                "prob_match": 0.9,
                "src_countries": ["france", "germany"],
                "cand_countries": ["germany", "france"],
            },
            {
                "id_left": "a",
                "id_right": "c",
                "prob_match": 0.9,
                "src_countries": ["france"],
                "cand_countries": ["japan"],
            },
            {
                "id_left": "b",
                "id_right": "c",
                "prob_match": 0.3,
                "src_countries": ["japan"],
                "cand_countries": ["japan"],
            },
        ]
    )
    seeds = cohort_seed_edges(edges, min_prob=0.6).to_pandas()
    # (a,b) shares 2 countries → 2 seed rows; (a,c) disjoint → 0; (b,c) weak → 0
    assert len(seeds) == 2
    assert sorted(seeds["cohort"]) == ["france", "germany"]


def test_cohort_transitivity_multi_cohort_node_has_two_rows(ray_session):
    # a-b strong in france; b-c strong in japan → b appears in both cohorts
    edges = rd.from_items(
        [
            {
                "id_left": "a",
                "id_right": "b",
                "prob_match": 0.9,
                "src_countries": ["france"],
                "cand_countries": ["france", "japan"],
            },
            {
                "id_left": "b",
                "id_right": "c",
                "prob_match": 0.9,
                "src_countries": ["france", "japan"],
                "cand_countries": ["japan"],
            },
        ]
    )
    out = cohort_transitivity(edges, min_prob=0.6).to_pandas()
    assert (out["node_id"] == "b").sum() == 2  # reference behavior reproduced
    # france cohort = {a,b}; japan cohort = {b,c}; distinct cluster ids
    assert out["cluster_id"].nunique() == 2
