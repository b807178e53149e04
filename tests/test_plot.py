"""Tests for the S4 PNG plot sink (reference: visualize_graph_utils.py:52-97
— spring-layout figure with degree-sized, cluster-colored nodes)."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.plot import encode_png, plot_graph_png, spring_layout


def _decode_png(data: bytes):
    """Minimal PNG reader for round-trip checks (8-bit RGB, filter 0)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    texts = {}
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"tEXt":
            k, v = payload.split(b"\x00", 1)
            texts[k.decode()] = v.decode()
        pos += 12 + ln
    raw = zlib.decompress(idat)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w * 3 + 1)
    assert (arr[:, 0] == 0).all()  # filter 0 scanlines
    return arr[:, 1:].reshape(h, w, 3), texts


def test_encode_png_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(31, 17, 3), dtype=np.uint8)
    rgb, texts = _decode_png(encode_png(img, {"Title": "t"}))
    assert (rgb == img).all()
    assert texts["Title"] == "t"


def test_spring_layout_deterministic_and_clustered():
    # two 4-cliques joined by one bridge edge: layout must separate them
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    edges += [(i, j) for i in range(4, 8) for j in range(i + 1, 8)]
    edges += [(0, 4)]
    ei = np.array([e[0] for e in edges])
    ej = np.array([e[1] for e in edges])
    w = np.ones(len(edges))
    p1 = spring_layout(8, ei, ej, w, seed=42)
    p2 = spring_layout(8, ei, ej, w, seed=42)
    assert np.allclose(p1, p2)
    c1, c2 = p1[:4].mean(axis=0), p1[4:].mean(axis=0)
    intra = max(np.linalg.norm(p1[:4] - c1, axis=1).max(),
                np.linalg.norm(p1[4:] - c2, axis=1).max())
    assert np.linalg.norm(c1 - c2) > intra  # cliques separated


def test_plot_graph_png_writes_valid_image(ray_session, tmp_path):
    edges = rd.from_items(
        [{"u": "a", "v": "b", "weight": 0.9}, {"u": "b", "v": "c", "weight": 0.7},
         {"u": "c", "v": "a", "weight": 0.8}, {"u": "d", "v": "e", "weight": 0.95}]
    )
    attrs = pa.table({"node": ["a", "b", "c", "d", "e"], "cluster_id": [0, 0, 0, 1, 1]})
    out = str(tmp_path / "g.png")
    n = plot_graph_png(edges, out, node_attrs=attrs, title="test graph", size=400)
    assert n == 5
    with open(out, "rb") as f:
        rgb, texts = _decode_png(f.read())
    assert rgb.shape == (400, 400, 3)
    assert texts["Title"] == "test graph"
    # something was actually drawn: non-white pixels exist, in >1 color
    nonwhite = rgb[(rgb != 255).any(axis=2)]
    assert len(nonwhite) > 200
    assert len(np.unique(nonwhite.reshape(-1, 3), axis=0)) > 2


def test_plot_graph_png_driver_gate(ray_session, tmp_path):
    edges = rd.from_items([{"u": str(i), "v": str(i + 1)} for i in range(50)])
    with pytest.raises(ValueError, match="sample the graph first"):
        plot_graph_png(edges, str(tmp_path / "x.png"), max_driver_edges=10)


def test_plot_graph_png_empty(ray_session, tmp_path):
    edges = rd.from_items([{"u": "a", "v": "b"}]).filter(lambda r: False)
    out = str(tmp_path / "e.png")
    assert plot_graph_png(edges, out, size=64) == 0
    with open(out, "rb") as f:
        rgb, _ = _decode_png(f.read())
    assert (rgb == 255).all()
