"""Graph viz operators: BFS subgraph sampling (O5), Louvain (C9), GEXF (S3)."""

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.graph_viz import (
    louvain_communities,
    louvain_label_map,
    node_degrees,
    sample_subgraph,
    write_gexf,
)


def _edges(rows):
    return rd.from_items([{"u": u, "v": v, "weight": float(w)} for u, v, w in rows])


def _two_cliques(k=6, bridge_w=0.05):
    """Two dense cliques joined by one weak bridge edge."""
    rows = []
    for c, off in (("a", 0), ("b", 100)):
        for i in range(k):
            for j in range(i + 1, k):
                rows.append((f"n{off + i}", f"n{off + j}", 1.0))
    rows.append(("n0", "n100", bridge_w))
    return rows


def test_node_degrees(ray_session):
    ds = _edges([("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0), ("c", "d", 1.0)])
    deg = node_degrees(ds).to_pandas().set_index("node")["degree"].to_dict()
    assert deg == {"a": 2, "b": 2, "c": 3, "d": 1}


def test_louvain_two_communities():
    rows = _two_cliques()
    label = louvain_label_map(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows], seed=42
    )
    a = {label[f"n{i}"] for i in range(6)}
    b = {label[f"n{100 + i}"] for i in range(6)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_louvain_deterministic(ray_session):
    ds = _edges(_two_cliques())
    t1 = louvain_communities(ds, seed=7).to_pandas()
    t2 = louvain_communities(ds, seed=7).to_pandas()
    assert t1.equals(t2)
    assert set(t1.columns) == {"node", "community"}


def test_louvain_driver_gate(ray_session):
    ds = _edges([("a", "b", 1.0)])
    with pytest.raises(ValueError, match="driver gate"):
        louvain_communities(ds, max_driver_edges=0)


def test_sample_subgraph_small_graph_passthrough(ray_session):
    rows = [("a", "b", 1.0), ("b", "c", 2.0)]
    picked, induced = sample_subgraph(_edges(rows), max_nodes=10)
    assert picked == ["a", "b", "c"]
    assert induced.num_rows == 2


def test_sample_subgraph_hub_bfs(ray_session):
    # star around "hub" plus a far chain that BFS depth-2 from the hub never reaches
    rows = [("hub", f"s{i}", 1.0) for i in range(8)]
    rows += [("s0", "t0", 1.0), ("t0", "far1", 1.0), ("far1", "far2", 1.0)]
    picked, induced = sample_subgraph(_edges(rows), max_nodes=9, seed=1)
    assert len(picked) == 9
    assert "hub" in picked  # highest-degree node always sampled
    assert "far2" not in picked  # 4 hops from the hub
    # induced edges only touch picked nodes
    pset = set(picked)
    for u, v in zip(induced["u"].to_pylist(), induced["v"].to_pylist()):
        assert u in pset and v in pset


def test_write_gexf_roundtrip(ray_session, tmp_path):
    ds = _edges([("a", "b", 0.9), ("b", "c", 0.5)])
    comm = pa.table({"node": ["a", "b", "c"], "community": [0, 0, 1]})
    path = str(tmp_path / "g.gexf")
    n = write_gexf(ds, path, node_attrs=comm)
    assert n == 2
    root = ET.parse(path).getroot()
    ns = {"g": "http://www.gexf.net/1.2draft"}
    nodes = root.findall(".//g:node", ns)
    edges = root.findall(".//g:edge", ns)
    assert {e.get("id") for e in nodes} == {"a", "b", "c"}
    assert len(edges) == 2
    w = {(e.get("source"), e.get("target")): float(e.get("weight")) for e in edges}
    assert w[("a", "b")] == 0.9
    attrs = root.findall(".//g:attribute", ns)
    assert attrs[0].get("title") == "community" and attrs[0].get("type") == "long"
