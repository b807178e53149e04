"""S4: PNG plot sink — the reference's matplotlib spring-layout graph figure
(``visualize_graph_utils.py:52-97``), reimplemented with NO plotting library:
a seeded Fruchterman-Reingold layout (numpy), a numpy rasterizer, and a
from-scratch PNG encoder over stdlib ``zlib``/``struct``.

Semantics mirrored from the reference:
  * spring layout, seed=42 (``nx.spring_layout(G, weight="weight", seed=42)``)
  * node size ∝ 200·(1+log1p(degree)) (:68)
  * node color = dense index of cluster/community id through a tab20-style
    20-color palette (:44-50, cmap="tab20")
  * edge width 0.5 + 3·minmax(weight), alpha 0.35 (:70-78)
  * node outline (:83-84); title text is NOT rendered (no font rasterizer —
    documented divergence; the title goes into a PNG ``tEXt`` chunk instead)

Like Louvain, this is a VISUALIZATION operator: it renders the (sampled,
thresholded) match graph, not the corpus — the edge collect is gated by
``max_driver_edges`` and raises rather than silently funneling an oversized
graph through the driver. Sample first with :func:`graph_viz.sample_subgraph`.
"""

from __future__ import annotations

import logging
import struct
import zlib
from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from ray.data import Dataset

logger = logging.getLogger(__name__)

# tab20-equivalent 20-color categorical palette (matplotlib's public tab20
# listed colors, RGB 0-255)
_TAB20 = np.array([
    (31, 119, 180), (174, 199, 232), (255, 127, 14), (255, 187, 120),
    (44, 160, 44), (152, 223, 138), (214, 39, 40), (255, 152, 150),
    (148, 103, 189), (197, 176, 213), (140, 86, 75), (196, 156, 148),
    (227, 119, 194), (247, 182, 210), (127, 127, 127), (199, 199, 199),
    (188, 189, 34), (219, 219, 141), (23, 190, 207), (158, 218, 229),
], dtype=np.float64)


# ---------------------------------------------------------------------------
# PNG encoder (stdlib only)
# ---------------------------------------------------------------------------
def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray, text: Optional[Dict[str, str]] = None) -> bytes:
    """(H, W, 3) uint8 → PNG bytes (8-bit RGB, filter 0, one IDAT)."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w = rgb.shape[:2]
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()  # filter byte 0 per scanline
    out = [b"\x89PNG\r\n\x1a\n"]
    out.append(_png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
    for k, v in (text or {}).items():
        out.append(_png_chunk(b"tEXt", k.encode("latin-1") + b"\x00" + v.encode("latin-1")))
    out.append(_png_chunk(b"IDAT", zlib.compress(raw, 6)))
    out.append(_png_chunk(b"IEND", b""))
    return b"".join(out)


# ---------------------------------------------------------------------------
# seeded spring layout (Fruchterman-Reingold, numpy)
# ---------------------------------------------------------------------------
def spring_layout(
    n: int,
    ei: np.ndarray,
    ej: np.ndarray,
    weight: np.ndarray,
    seed: int = 42,
    n_iter: int = 50,
) -> np.ndarray:
    """(n, 2) positions in [0,1]²: seeded random init, repulsion k²/d between
    all pairs, weighted attraction d²/k along edges, linearly cooling step —
    the classic FR scheme nx.spring_layout implements."""
    rng = np.random.RandomState(seed)
    pos = rng.rand(n, 2)
    if n <= 1:
        return pos
    k = 1.0 / np.sqrt(n)
    t = 0.1
    dt = t / (n_iter + 1)
    for _ in range(n_iter):
        delta = pos[:, None, :] - pos[None, :, :]  # (n, n, 2)
        dist = np.linalg.norm(delta, axis=-1)
        np.fill_diagonal(dist, 1.0)
        dist = np.maximum(dist, 1e-9)
        disp = (delta / dist[..., None]) * (k * k / dist)[..., None]
        force = disp.sum(axis=1)  # repulsion
        if len(ei):
            d = pos[ei] - pos[ej]
            dd = np.maximum(np.linalg.norm(d, axis=1), 1e-9)
            att = (d / dd[:, None]) * (dd * dd / k * weight)[:, None]
            np.subtract.at(force, ei, att)
            np.add.at(force, ej, att)
        flen = np.maximum(np.linalg.norm(force, axis=1), 1e-9)
        pos += (force / flen[:, None]) * np.minimum(flen, t)[:, None]
        t -= dt
    lo, hi = pos.min(axis=0), pos.max(axis=0)
    return (pos - lo) / np.maximum(hi - lo, 1e-9)


# ---------------------------------------------------------------------------
# rasterizer
# ---------------------------------------------------------------------------
def _blend_points(img: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                  color: np.ndarray, alpha: float) -> None:
    """Alpha-blend a flat point cloud into (H, W, 3) float image, deduping
    coincident samples so overlap within one primitive doesn't over-darken."""
    h, w = img.shape[:2]
    xs = np.clip(xs.astype(np.int64), 0, w - 1)
    ys = np.clip(ys.astype(np.int64), 0, h - 1)
    flat = np.unique(ys * w + xs)
    yy, xx = flat // w, flat % w
    img[yy, xx] = (1 - alpha) * img[yy, xx] + alpha * color


def _draw_lines(img: np.ndarray, p0: np.ndarray, p1: np.ndarray,
                widths: np.ndarray, alpha: float = 0.35) -> None:
    """Sample each segment at ~1px spacing, stamping a (width-dependent)
    small offset cross per sample — vectorized over all samples of a batch of
    edges."""
    if len(p0) == 0:
        return
    seg = p1 - p0
    lengths = np.linalg.norm(seg, axis=1)
    n_samp = np.maximum(lengths.astype(np.int64), 1) + 1
    total = int(n_samp.sum())
    e_idx = np.repeat(np.arange(len(p0)), n_samp)
    t_within = np.arange(total) - np.repeat(np.cumsum(n_samp) - n_samp, n_samp)
    t = t_within / np.maximum(n_samp[e_idx] - 1, 1)
    pts = p0[e_idx] + seg[e_idx] * t[:, None]
    # perpendicular offsets approximate stroke width
    perp = np.stack([-seg[:, 1], seg[:, 0]], axis=1)
    perp /= np.maximum(np.linalg.norm(perp, axis=1), 1e-9)[:, None]
    half = (widths / 2.0)[e_idx]
    color = np.zeros(3)
    _blend_points(img, pts[:, 0], pts[:, 1], color, alpha)  # centerline
    for off in (-1.0, 1.0, -0.5, 0.5):
        sel = np.abs(off) * 0.9 <= half  # wider strokes get more passes
        if not sel.any():
            continue
        q = pts[sel] + perp[e_idx[sel]] * (off * half[sel])[:, None]
        _blend_points(img, q[:, 0], q[:, 1], color, alpha)


def _draw_disks(img: np.ndarray, centers: np.ndarray, radii: np.ndarray,
                colors: np.ndarray) -> None:
    """Filled disks with a 1px dark outline, one bounding-box fill per node
    (node counts are gated ≤ max_nodes, so this loop is bounded and tiny)."""
    h, w = img.shape[:2]
    for (cx, cy), r, col in zip(centers, radii, colors):
        r = max(float(r), 1.0)
        x0, x1 = int(max(cx - r - 1, 0)), int(min(cx + r + 2, w))
        y0, y1 = int(max(cy - r - 1, 0)), int(min(cy + r + 2, h))
        if x0 >= x1 or y0 >= y1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        inside = d2 <= r * r
        ring = (d2 <= (r + 0.75) ** 2) & ~inside
        img[yy[inside], xx[inside]] = col
        img[yy[ring], xx[ring]] = (0.0, 0.0, 0.0)


def plot_graph_png(
    edges: Dataset,
    path: str,
    node_attrs: Optional[pa.Table] = None,
    color_col: str = "cluster_id",
    title: str = "ER Graph",
    size: int = 1200,
    seed: int = 42,
    max_driver_edges: int = 200_000,
) -> int:
    """Render the edge dataset as a spring-layout PNG. ``node_attrs`` (e.g.
    a clusters or Louvain communities table keyed by ``node``/``node_id``)
    supplies the categorical color column. Returns the node count drawn."""
    import pandas as pd

    df = edges.to_pandas()
    if len(df) > max_driver_edges:
        raise ValueError(
            f"plot_graph_png: {len(df)} edges exceeds the driver gate "
            f"({max_driver_edges}); sample the graph first (sample_subgraph) "
            "or raise max_driver_edges explicitly."
        )
    us = df["u"].astype(str) if len(df) else pd.Series(dtype=str)
    vs = df["v"].astype(str) if len(df) else pd.Series(dtype=str)
    nodes = pd.Index(sorted(set(us) | set(vs)))
    n = len(nodes)
    img = np.full((size, size, 3), 255.0)
    if n == 0:
        logger.info("plot: empty graph")
        with open(path, "wb") as f:
            f.write(encode_png(img.astype(np.uint8), {"Title": title}))
        return 0
    ei = nodes.get_indexer(us).astype(np.int64)
    ej = nodes.get_indexer(vs).astype(np.int64)
    wts = (
        df["weight"].to_numpy(dtype=np.float64)
        if "weight" in df.columns and len(df) else np.ones(len(ei))
    )
    pos = spring_layout(n, ei, ej, wts, seed=seed)
    margin = 0.06 * size
    xy = margin + pos * (size - 2 * margin)

    # degree-based node sizes (area ∝ 200·(1+log1p(deg)) → radius ∝ sqrt)
    deg = np.bincount(ei, minlength=n) + np.bincount(ej, minlength=n)
    area = 200.0 * (1.0 + np.log1p(deg.astype(np.float64)))
    radii = np.sqrt(area / np.pi) * (size / 1200.0)

    # categorical colors through the 20-color palette
    comm = np.zeros(n, dtype=np.int64)
    if node_attrs is not None:
        key_col = "node" if "node" in node_attrs.column_names else "node_id"
        keys = [str(x) for x in node_attrs[key_col].to_pylist()]
        vals = node_attrs[color_col].to_pylist()
        lookup = dict(zip(keys, vals))
        raw = np.array([lookup.get(nd, 0) for nd in nodes], dtype=object)
        _, comm = np.unique(raw.astype(str), return_inverse=True)
    colors = _TAB20[comm % len(_TAB20)]

    if len(ei):
        wmin, wmax = wts.min(), wts.max()
        widths = 0.5 + 3.0 * (wts - wmin) / (wmax - wmin + 1e-9)
        _draw_lines(img, xy[ei], xy[ej], widths * (size / 1200.0), alpha=0.35)
    _draw_disks(img, xy, radii, colors)

    with open(path, "wb") as f:
        f.write(encode_png(np.clip(img, 0, 255).astype(np.uint8), {"Title": title}))
    logger.info("plot: wrote %d nodes / %d edges -> %s", n, len(ei), path)
    return n
