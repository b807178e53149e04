"""Graph inspection operators: BFS-from-hub subgraph sampling (O5), Louvain
community detection (C9) and GEXF export (S3).

Reference semantics: ``/root/reference/src/graph/visualize_graph_utils.py``
  * ``sample_subgraph`` (:9-28) — BFS depth-2 layers from nodes in
    degree-descending order, each layer shuffled with a seeded RNG, nodes
    added until ``max_nodes``; the sample is the induced subgraph.
  * ``communities_louvain_or_cc`` (:30-42) — seeded Louvain over edge
    ``weight``; falls back to connected components.
  * ``export_for_gephi`` (:99-103) — ``nx.write_gexf``.

Ray-first shape: the graph lives as an EDGE DATASET (``u``, ``v``,
``weight``) — the same representation every clustering stage uses. Degrees
are a bucketed count aggregate; each BFS layer is one broadcast ``is_in``
filter pass over the edges (the frontier is ≤ ``max_nodes`` ids, tiny by
construction). Louvain itself runs driver-side on a collected edge list —
it is a VISUALIZATION operator whose input is the matched-pair graph
(thousands of edges after thresholding, not the corpus); the collect is
gated by ``max_driver_edges`` and raises rather than silently funneling an
oversized graph through the driver.

The spring-layout PNG sink (visualize_graph_utils.py:52-97) lives in
``stages/plot.py`` — a from-scratch seeded Fruchterman-Reingold layout,
numpy rasterizer and stdlib-zlib PNG encoder (matplotlib is absent from the
container); GEXF here carries the same graph to any external renderer.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# degrees (distributed)
# ---------------------------------------------------------------------------
def node_degrees(edges: Dataset, num_buckets: int = 64) -> Dataset:
    """(node, degree) from an undirected edge dataset — each endpoint of every
    edge counts once. One bucketed shuffle; per-bucket counting is a
    vectorized pandas ``value_counts``."""
    from .blocking import bucketed_apply

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["u"].combine_chunks().cast(pa.string()), t["v"].combine_chunks().cast(pa.string())]
        )})

    both = edges.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)

    def count(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["node"].value_counts()
        return pd.DataFrame({"node": vc.index, "degree": vc.to_numpy(dtype=np.int64)})

    return bucketed_apply(both, ["node"], count, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# O5: BFS-from-hub subgraph sampling
# ---------------------------------------------------------------------------
def _neighbors_of(edges: Dataset, frontier: Sequence[str]) -> List[str]:
    """All neighbors of the frontier set: ONE broadcast-filter pass over the
    edge dataset (the frontier rides in the closure — ≤ max_nodes ids)."""
    fset = pa.array(sorted(set(frontier)), type=pa.string())

    def hit(t: pa.Table) -> pa.Table:
        u = t["u"].cast(pa.string())
        v = t["v"].cast(pa.string())
        mu = pc.is_in(u, value_set=fset)
        mv = pc.is_in(v, value_set=fset)
        out = pa.concat_arrays([
            v.combine_chunks().filter(mu.combine_chunks()),
            u.combine_chunks().filter(mv.combine_chunks()),
        ])
        return pa.table({"node": out})

    hits = edges.map_batches(hit, batch_format="pyarrow", zero_copy_batch=True)
    seen: set = set()
    for b in hits.iter_batches(batch_size=65536, batch_format="pyarrow"):
        seen.update(b["node"].to_pylist())
    return sorted(seen)


def sample_subgraph(
    edges: Dataset,
    max_nodes: int = 400,
    depth: int = 2,
    seed: int = 42,
    max_hubs: int = 64,
) -> Tuple[List[str], pa.Table]:
    """BFS ``depth`` layers out from the highest-degree nodes, shuffling each
    hub's layer with a seeded RNG, until ``max_nodes`` nodes are picked
    (visualize_graph_utils.py:9-28). Returns (picked node ids, induced edge
    table ``u``/``v``/``weight``).

    Each BFS layer is one streaming filter pass over the edge dataset; the
    hub loop stops as soon as the sample is full (``max_hubs`` bounds the
    worst case of many tiny components), so the total work is
    O(hubs × depth) edge scans — never an adjacency materialization."""
    edges = edges.materialize()  # reused: degrees + per-layer scans + induce
    deg = node_degrees(edges).to_pandas()
    if len(deg) <= max_nodes:
        picked = sorted(deg["node"].tolist())
    else:
        deg = deg.sort_values(["degree", "node"], ascending=[False, True])
        hubs = deg["node"].tolist()
        rng = np.random.default_rng(seed)
        picked_set: set = set()
        picked: List[str] = []
        for hub in hubs[:max_hubs]:
            if len(picked) >= max_nodes:
                break
            if hub in picked_set:
                continue
            layer_nodes = [hub]
            frontier = [hub]
            for _ in range(depth):
                nxt = [n for n in _neighbors_of(edges, frontier) if n not in layer_nodes]
                if not nxt:
                    break
                layer_nodes.extend(nxt)
                frontier = nxt
            order = np.array(layer_nodes, dtype=object)
            rng.shuffle(order)
            for n in order:
                if n not in picked_set:
                    picked_set.add(n)
                    picked.append(n)
                if len(picked) >= max_nodes:
                    break

    pset = pa.array(sorted(picked), type=pa.string())

    def induce(t: pa.Table) -> pa.Table:
        u = t["u"].cast(pa.string())
        v = t["v"].cast(pa.string())
        m = pc.and_(pc.is_in(u, value_set=pset), pc.is_in(v, value_set=pset))
        kept = t.filter(m)
        w = kept["weight"] if "weight" in kept.column_names else pa.nulls(kept.num_rows, pa.float64())
        return pa.table({"u": kept["u"].cast(pa.string()), "v": kept["v"].cast(pa.string()),
                         "weight": pc.cast(w, pa.float64())})

    induced = edges.map_batches(induce, batch_format="pyarrow", zero_copy_batch=True)
    tbl = pa.Table.from_pandas(
        induced.to_pandas().sort_values(["u", "v"]).reset_index(drop=True), preserve_index=False
    )
    return picked, tbl


# ---------------------------------------------------------------------------
# C9: Louvain communities (from scratch — no networkx in the container)
# ---------------------------------------------------------------------------
def _louvain_local_move(
    adj: List[Dict[int, float]], degree: np.ndarray, two_m: float, rng
) -> Tuple[np.ndarray, bool]:
    """One Louvain phase-1: move nodes (seeded shuffled order) to the
    neighbor community with the highest positive modularity gain until a
    full sweep makes no move. Returns (community assignment, any_moved)."""
    n = len(adj)
    comm = np.arange(n)
    comm_tot = degree.astype(np.float64).copy()  # Σ degree per community
    moved_any = False
    order = np.arange(n)
    rng.shuffle(order)
    improved = True
    while improved:
        improved = False
        for i in order:
            ci = comm[i]
            ki = degree[i]
            # weights from i to each neighboring community
            w_to: Dict[int, float] = {}
            for j, w in adj[i].items():
                if j == i:
                    continue
                w_to[comm[j]] = w_to.get(comm[j], 0.0) + w
            comm_tot[ci] -= ki
            best_c, best_gain = ci, w_to.get(ci, 0.0) - comm_tot[ci] * ki / two_m
            for c, w in sorted(w_to.items()):
                gain = w - comm_tot[c] * ki / two_m
                if gain > best_gain + 1e-12:
                    best_gain, best_c = gain, c
            comm_tot[best_c] += ki
            if best_c != ci:
                comm[i] = best_c
                improved = True
                moved_any = True
    return comm, moved_any


def louvain_label_map(
    us: Sequence, vs: Sequence, ws: Sequence[float], seed: int = 42
) -> Dict[str, int]:
    """Driver-side seeded Louvain over an undirected weighted edge list.
    Standard two-phase loop (Blondel et al. 2008): local modularity moves,
    then community aggregation, until no move improves modularity."""
    nodes = sorted({str(x) for x in us} | {str(x) for x in vs})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj: List[Dict[int, float]] = [dict() for _ in range(n)]
    for u, v, w in zip(us, vs, ws):
        iu, iv = idx[str(u)], idx[str(v)]
        w = float(w) if w is not None else 1.0
        if iu == iv:
            adj[iu][iu] = adj[iu].get(iu, 0.0) + 2.0 * w  # self-loop counts twice in degree
        else:
            adj[iu][iv] = adj[iu].get(iv, 0.0) + w
            adj[iv][iu] = adj[iv].get(iu, 0.0) + w
    two_m = sum(sum(d.values()) for d in adj)
    if two_m == 0:
        return {node: i for i, node in enumerate(nodes)}

    rng = np.random.default_rng(seed)
    # node → current super-node through the aggregation levels
    membership = np.arange(n)
    level_adj = adj
    while True:
        degree = np.array([sum(d.values()) for d in level_adj])
        comm, moved = _louvain_local_move(level_adj, degree, two_m, rng)
        if not moved:
            break
        # renumber communities densely
        uniq, dense = np.unique(comm, return_inverse=True)
        membership = dense[membership]
        # aggregate: communities become nodes, weights summed
        m = len(uniq)
        agg: List[Dict[int, float]] = [dict() for _ in range(m)]
        for i, d in enumerate(level_adj):
            ci = dense[i]
            for j, w in d.items():
                cj = dense[j]
                agg[ci][cj] = agg[ci].get(cj, 0.0) + w
        if m == len(level_adj):
            break
        level_adj = agg

    uniq, dense = np.unique(membership, return_inverse=True)
    return {node: int(dense[i]) for i, node in enumerate(nodes)}


def louvain_communities(
    edges: Dataset, seed: int = 42, max_driver_edges: int = 2_000_000
) -> pa.Table:
    """(node, community) over the edge dataset via seeded Louvain
    (visualize_graph_utils.py:30-38). The matched-pair graph this runs on is
    small by construction (post-threshold edges), so the edge list is
    collected to the driver — gated by ``max_driver_edges``; an oversized
    graph raises instead of silently funneling through the driver."""
    df = edges.to_pandas()
    if len(df) > max_driver_edges:
        raise ValueError(
            f"louvain_communities: {len(df)} edges exceeds the driver gate "
            f"({max_driver_edges}); sample the graph first (sample_subgraph) "
            "or raise max_driver_edges explicitly."
        )
    ws = df["weight"] if "weight" in df.columns else pd.Series(1.0, index=df.index)
    label = louvain_label_map(df["u"].tolist(), df["v"].tolist(), ws.tolist(), seed=seed)
    items = sorted(label.items())
    return pa.table({
        "node": pa.array([k for k, _ in items], type=pa.string()),
        "community": pa.array([c for _, c in items], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# S3: GEXF sink
# ---------------------------------------------------------------------------
def write_gexf(
    edges: Dataset,
    path: str,
    node_attrs: Optional[pa.Table] = None,
    directed: bool = False,
) -> int:
    """Write the edge dataset (plus optional per-node attributes, e.g. the
    Louvain ``community`` table) as GEXF 1.2 (visualize_graph_utils.py:99-103,
    ``nx.write_gexf``). Edges stream through ``iter_batches``; the node
    section is derived from the same stream. Returns the edge count."""
    attr_cols: List[str] = []
    attr_of: Dict[str, list] = {}
    if node_attrs is not None:
        attr_cols = [c for c in node_attrs.column_names if c != "node"]
        keys = [str(x) for x in node_attrs["node"].to_pylist()]
        vals = [node_attrs[c].to_pylist() for c in attr_cols]
        attr_of = {k: [v[i] for v in vals] for i, k in enumerate(keys)}

    def gexf_type(col_idx: int) -> str:
        t = node_attrs.schema.field(attr_cols[col_idx]).type
        if pa.types.is_integer(t):
            return "long"
        if pa.types.is_floating(t):
            return "double"
        return "string"

    # materialize once (blocks live in the object store, which SPILLS — unlike
    # the old driver-side edge list, which pinned every edge in driver heap),
    # then two streamed passes: distinct nodes first (GEXF requires the node
    # section before edges), edges second.
    from .blocking import bucketed_apply

    edges = edges.materialize()

    def ends(t: pa.Table) -> pa.Table:
        u = pc.cast(t["u"], pa.string()).combine_chunks()
        v = pc.cast(t["v"], pa.string()).combine_chunks()
        return pa.table({"node": pa.concat_arrays([u, v])})

    node_ds = bucketed_apply(
        edges.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True),
        ["node"],
        lambda g: g.drop_duplicates("node"),
        num_buckets=16,
    ).sort("node")

    n_nodes = 0
    n_edges = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n')
        f.write(f'  <graph defaultedgetype={quoteattr("directed" if directed else "undirected")}>\n')
        if attr_cols:
            f.write('    <attributes class="node">\n')
            for i, c in enumerate(attr_cols):
                f.write(f'      <attribute id="{i}" title={quoteattr(c)} type="{gexf_type(i)}"/>\n')
            f.write('    </attributes>\n')
        f.write('    <nodes>\n')
        for b in node_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for nid in b["node"].to_pylist():
                n_nodes += 1
                q = quoteattr(nid)
                if nid in attr_of:
                    f.write(f'      <node id={q} label={q}>\n        <attvalues>\n')
                    for i, v in enumerate(attr_of[nid]):
                        f.write(f'          <attvalue for="{i}" value={quoteattr(escape(str(v)))}/>\n')
                    f.write('        </attvalues>\n      </node>\n')
                else:
                    f.write(f'      <node id={q} label={q}/>\n')
        f.write('    </nodes>\n    <edges>\n')
        for b in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
            us = [str(x) for x in b["u"].to_pylist()]
            vs = [str(x) for x in b["v"].to_pylist()]
            ws = b["weight"].to_pylist() if "weight" in b.column_names else [1.0] * len(us)
            for u, v, w in zip(us, vs, ws):
                f.write(
                    f'      <edge id="{n_edges}" source={quoteattr(u)} target={quoteattr(v)} '
                    f'weight="{float(w) if w is not None else 1.0}"/>\n'
                )
                n_edges += 1
        f.write('    </edges>\n  </graph>\n</gexf>\n')
    logger.info("gexf: wrote %d nodes / %d edges -> %s", n_nodes, n_edges, path)
    return n_edges
