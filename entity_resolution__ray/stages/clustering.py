"""Transitive closure / clustering (C4-C7): distributed connected components by
iterative min-label propagation, with per-iteration label checkpoints and
mid-run resume.

Reference analogues:
  * DSU union-find (apply_transitivity.py:21-45) — in-memory dicts; replaced by
    ``groupby(node).min(label)`` label propagation to fixpoint (scales as a
    sequence of keyed shuffles, one checkpoint per iteration).
  * cohort-partitioned transitivity (apply_transitivity.py:68-176): strong
    edges (prob ≥ 0.60, :188) sharing ≥1 country become per-country seed rows
    (:107-119); closure runs per (cohort, node) composite — a node in two
    cohorts yields TWO cluster rows, reproduced deliberately (:133-155).
  * flat CC clustering (apply_clustering_algorithm.py:9-21, threshold 0.45).
  * dense renumbering by sorted keys (apply_transitivity.py:149-163) — here
    clusters are renumbered by sorted min-node label; same partition of nodes,
    cluster-ID numbering order may differ from the reference's DSU-root order
    (documented divergence; conformance tests compare partitions, not ids).
  * cluster sizes + final sort (apply_transitivity.py:167-171).

Partitioning: every iteration shuffles messages by node id (hash). Convergence
in O(component diameter) iterations; entity-resolution components are
short-diameter so this is a handful of rounds. Labels are strings (min doc_id
lexicographically — canonical and deterministic under any partitioning).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from .joins import hash_join

DEFAULT_TRANSITIVITY_MIN_PROB = 0.60  # apply_transitivity.py:189


# ---------------------------------------------------------------------------
# distributed connected components
# ---------------------------------------------------------------------------
def _initial_labels(edges: Dataset, num_partitions: int) -> Dataset:
    from .blocking import bucketed_apply

    nodes = edges.map_batches(
        lambda t: pa.table(
            {"node": pa.chunked_array([t["u"].combine_chunks(), t["v"].combine_chunks()]).combine_chunks()}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    distinct = bucketed_apply(
        nodes, ["node"], lambda g: g.drop_duplicates("node"), num_buckets=num_partitions
    )
    return distinct.map_batches(
        lambda t: t.append_column("label", t["node"]), batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_partitions)


_SENTINEL = "\uffff"  # sorts above every real label
_ORD_SEP = "\x1f"


def _encode_id(s: str) -> str:
    """Length-first total order: lexicographic comparison of the encoded form
    equals (len, str) comparison, so numeric string ids order numerically.
    The choice of representative order is arbitrary for correctness, but
    length-lex makes min-label propagation converge in O(log n) rounds on
    numeric ids (plain lexicographic order scrambles the shortcuts and is
    ~2× slower empirically)."""
    return f"{len(s):06d}{_ORD_SEP}{s}"


def _decode_id(s: str) -> str:
    return s.split(_ORD_SEP, 1)[1]


def _encode_col(col) -> pa.Array:
    """Vectorized :func:`_encode_id` over an Arrow string column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.utf8_lpad(pc.cast(pc.utf8_length(col), pa.string()), 6, "0")
    return pc.binary_join_element_wise(lens, col, _ORD_SEP)


def _encode_only(edges: Dataset) -> Dataset:
    """Length-lex encode both endpoint columns."""

    def enc(t: pa.Table) -> pa.Table:
        return pa.table({"u": _encode_col(t["u"]), "v": _encode_col(t["v"])})

    return edges.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def _symmetrize(edges: Dataset) -> Dataset:
    """(u,v) ∪ (v,u) — one directed-message join per round then covers both
    directions (iterative propagation only; contraction treats edges as
    undirected already)."""

    def sym(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        return pa.table(
            {"u": pa.concat_arrays([u, v]), "v": pa.concat_arrays([v, u])}
        )

    return edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)


def _encode_edges(edges: Dataset) -> Dataset:
    """Encode ids and symmetrize (iterative-propagation input form)."""
    return _symmetrize(_encode_only(edges))


def _propagate_once(edges: Dataset, labels: Dataset, num_partitions: int) -> Dataset:
    """One round of min-label propagation with pointer jumping.

    ``edges`` is the symmetrized encoded edge set. The (node ↔ label)
    relation is unioned in both directions each round so a node also receives
    its label's label (shortcutting). ONE cogroup hash-join attaches the
    sender's label to every directed edge; messages (receiver, sender_label)
    union the current labels and reduce by a bucketed vectorized min.

    Output carries BOTH the new label and the node's previous label (old
    labels win Min over a max-sentinel from messages), so convergence
    detection is a scan of the already-materialized result — no extra join."""
    label_edges = labels.map_batches(
        lambda t: pa.table(
            {
                "u": pa.chunked_array([t["node"].combine_chunks(), t["label"].combine_chunks()]).combine_chunks(),
                "v": pa.chunked_array([t["label"].combine_chunks(), t["node"].combine_chunks()]).combine_chunks(),
            }
        ).filter(
            pc.not_equal(
                pa.chunked_array([t["node"].combine_chunks(), t["label"].combine_chunks()]).combine_chunks(),
                pa.chunked_array([t["label"].combine_chunks(), t["node"].combine_chunks()]).combine_chunks(),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    aug = edges.union(label_edges)
    lu = labels.rename_columns({"node": "u", "label": "lu"})
    e = hash_join(aug, lu, on=["u"], num_partitions=num_partitions)

    def emit_messages(t: pa.Table) -> pa.Table:
        sent = pa.array([_SENTINEL] * t.num_rows, type=pa.string())
        return pa.table({"node": t["v"], "label": t["lu"], "old_label": sent})

    msgs = e.map_batches(emit_messages, batch_format="pyarrow", zero_copy_batch=True)
    tagged = labels.map_batches(
        lambda t: t.append_column("old_label", t["label"]), batch_format="pyarrow", zero_copy_batch=True
    )

    from .blocking import bucketed_apply

    def min_per_node(g):
        return g.groupby("node", as_index=False).agg(label=("label", "min"), old_label=("old_label", "min"))

    agg = bucketed_apply(msgs.union(tagged), ["node"], min_per_node, num_buckets=num_partitions)
    # arrow blocks for downstream Project ops + repartition to CAP the block
    # count: groupby derives its partition count from input blocks, so without
    # this the per-iteration block count (and task count) grows without bound
    return agg.map_batches(lambda t: t, batch_format="pyarrow").repartition(num_partitions)


def _count_changed(agg: Dataset) -> int:
    """Changed nodes in a propagate result (scan, no shuffle)."""
    return agg.map_batches(
        lambda t: t.filter(pc.not_equal(t["label"], t["old_label"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).count()


def _driver_dsu_labels(edges: Dataset) -> Dataset:
    """Small-graph fast path: pull the (tiny) edge list to the driver, run
    union-find, return the same (node, label=min-member) table the
    distributed path yields. Representative = numeric-aware (length-lex) min,
    matching the distributed encoding."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for b in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for u, v in zip(b["u"].to_pylist(), b["v"].to_pylist()):
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
    members: dict = {}
    for node in parent:
        members.setdefault(find(node), []).append(node)
    rows = []
    for group in members.values():
        rep = min(group, key=lambda s: (len(s), s))
        rows.extend({"node": n, "label": rep} for n in group)
    if not rows:
        return rd.from_arrow(
            pa.table({"node": pa.array([], type=pa.string()), "label": pa.array([], type=pa.string())})
        )
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _dsu_rows(us, vs):
    """Union-find over one partition's edges → {node: root} with root = the
    length-lex min member of each local component."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(us, vs):
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # ids are length-lex encoded: plain string min == numeric-aware min
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {n: find(n) for n in parent}


def _contract_cc(edges: Dataset, num_partitions: int, quotient_max: int = 500_000) -> Dataset:
    """Connected components by LOCAL CONTRACTION — two bucketed shuffles
    instead of O(diameter) propagation rounds.

    1. Hash-partition EDGES; per partition a union-find contracts its local
       components → (node, local_root) rows. A component's global min node is
       always some partition's local root (the local root is the min of a
       subset containing it), so min-over-local-roots = the canonical label.
    2. Group (node, local_root) by node: a node seen with k distinct local
       roots links them — emit k-1 QUOTIENT edges (and the node's first root
       for final relabeling).
    3. The quotient graph is tiny (≤ #cross-partition boundary nodes): solve
       it with a driver DSU and broadcast {local_root: final_label}; if it
       exceeds ``quotient_max`` fall back to iterative propagation over it
       (geometrically smaller than the input).
    Expects length-lex ENCODED string edges; returns encoded (node, label).
    """
    import pandas as pd

    from .blocking import bucketed_apply

    def local_dsu(g: pd.DataFrame) -> pd.DataFrame:
        lab = _dsu_rows(g["u"].tolist(), g["v"].tolist())
        return pd.DataFrame({"node": list(lab.keys()), "root": list(lab.values())})

    node_root = bucketed_apply(edges, ["u", "v"], local_dsu, num_buckets=num_partitions)

    def per_node(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_a, out_b = [], [], []
        for node, sub in g.groupby("node", sort=False):
            roots = sorted(set(sub["root"]))
            out_k.append("n")
            out_a.append(node)
            out_b.append(roots[0])
            for i in range(1, len(roots)):
                out_k.append("q")
                out_a.append(roots[i - 1])
                out_b.append(roots[i])
        return pd.DataFrame({"kind": out_k, "a": out_a, "b": out_b})

    per_node_ds = bucketed_apply(node_root, ["node"], per_node, num_buckets=num_partitions).materialize()
    if per_node_ds.count() == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], type=pa.string()), "label": pa.array([], type=pa.string())})
        )
    quotient = per_node_ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "q")).select(["a", "b"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    assignments = per_node_ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "n")).select(["a", "b"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    n_quotient = quotient.count()
    if n_quotient <= quotient_max:
        qlab: dict = {}
        if n_quotient:
            qt = pa.concat_tables(list(quotient.iter_batches(batch_size=65536, batch_format="pyarrow")))
            qlab = _dsu_rows(qt["a"].to_pylist(), qt["b"].to_pylist())
        import ray as _ray

        qref = _ray.put(qlab)

        def relabel(t: pa.Table, qref=qref) -> pa.Table:
            from ..state.worker_cache import cached_get

            q = cached_get(qref)
            roots = t["b"].to_pylist()
            lab = [q.get(r, r) for r in roots]
            return pa.table({"node": t["a"], "label": pa.array(lab, type=pa.string())})

        return assignments.map_batches(relabel, batch_format="pyarrow", zero_copy_batch=True)
    # rare path: quotient still large — RECURSE on it (boundary graph shrinks
    # geometrically per level) and compose the mappings with one join
    qedges = quotient.rename_columns({"a": "u", "b": "v"})
    qlabels = _contract_cc(qedges, num_partitions, quotient_max=quotient_max).rename_columns(
        {"node": "b", "label": "qlabel"}
    )
    joined = hash_join(assignments.rename_columns({"a": "node"}), qlabels,
                       on=["b"], num_partitions=num_partitions, how="left")
    return joined.map_batches(
        lambda t: pa.table({"node": t["node"], "label": pc.coalesce(t["qlabel"], t["b"])}),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def connected_components(
    edges: Dataset,
    checkpoint_dir: Optional[str] = None,
    num_partitions: int = 16,
    max_iters: int = 50,
    driver_fallback_threshold: int = 0,
) -> Dataset:
    """edges (u:string, v:string) → labels (node:string, label:string = min
    node id of the component).

    With ``checkpoint_dir``, each iteration's label table is written to
    ``labels_iter_K/`` plus ``cc_state.json``; a rerun with the same dir
    resumes from the latest checkpoint (north_rule: resumable mid-closure).
    ``max_iters`` bounds one call — if the fixpoint isn't reached the state
    file records ``converged=false`` and a later call continues.
    """
    if driver_fallback_threshold and checkpoint_dir is None:
        raw = edges.materialize()
        if raw.count() <= driver_fallback_threshold:
            # tiny graph: a driver DSU beats log(n) distributed rounds of
            # shuffle latency; the distributed path below is the default and
            # the only path when checkpoint/resume is requested
            return _driver_dsu_labels(raw)
        edges = raw

    if checkpoint_dir is None:
        # non-resumable runs take the 2-shuffle contraction path; the
        # iterative loop below remains the checkpointed/resumable form
        return _decode_labels(_contract_cc(_encode_only(edges), num_partitions))

    edges = _encode_edges(edges).repartition(num_partitions).materialize()  # reused every iteration
    if edges.count() == 0:
        empty = pa.table({"node": pa.array([], type=pa.string()), "label": pa.array([], type=pa.string())})
        return rd.from_arrow(empty)
    start_iter = 0
    labels: Optional[Dataset] = None
    state_path = checkpoint_dir and os.path.join(checkpoint_dir, "cc_state.json")
    if checkpoint_dir and os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
        start_iter = state["iteration"]
        labels = rd.read_parquet(os.path.join(checkpoint_dir, f"labels_iter_{start_iter}"))
        if state.get("converged"):
            return _decode_labels(labels)
    if labels is None:
        # every iteration's label table is published to parquet and RE-READ:
        # the reload both makes the closure resumable and severs logical-plan
        # lineage (each iteration starts from a fresh read plan, so plan depth
        # stays O(1) across max_iters — no recursion-limit games), and keeps
        # the multi-consumer propagate plan (label_edges + join side + tagged)
        # off lazy label chains, which deadlock Ray's streaming executor
        labels = _initial_labels(edges, num_partitions)
        _checkpoint_labels(labels, checkpoint_dir, 0, converged=False)
        labels = rd.read_parquet(os.path.join(checkpoint_dir, "labels_iter_0"))

    it = start_iter
    converged = False
    for it in range(start_iter + 1, start_iter + 1 + max_iters):
        agg = _propagate_once(edges, labels, num_partitions).materialize()
        changed = _count_changed(agg)
        new_labels = agg.drop_columns(["old_label"])
        _checkpoint_labels(new_labels, checkpoint_dir, it, converged=False)
        labels = rd.read_parquet(os.path.join(checkpoint_dir, f"labels_iter_{it}"))
        if changed == 0:
            converged = True
            break
    with open(state_path, "w") as f:
        json.dump({"iteration": it, "converged": converged}, f)
    return _decode_labels(labels)


def _decode_labels(labels: Dataset) -> Dataset:
    def dec(t: pa.Table) -> pa.Table:
        # encoded form has a fixed 7-char prefix (6-digit length + separator)
        return pa.table(
            {
                "node": pc.utf8_slice_codeunits(t["node"], 7),
                "label": pc.utf8_slice_codeunits(t["label"], 7),
            }
        )

    return labels.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


def _checkpoint_labels(labels: Dataset, checkpoint_dir: str, iteration: int, converged: bool) -> None:
    import shutil

    out = os.path.join(checkpoint_dir, f"labels_iter_{iteration}")
    tmp = out + ".tmp"
    # a crash between parquet publish and cc_state.json write leaves state at
    # K-1 while labels_iter_K exists — clear both leftovers so the recompute's
    # write_parquet doesn't mix stale files into tmp and os.replace doesn't
    # hit ENOTEMPTY on the existing out dir
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    labels.write_parquet(tmp)
    os.replace(tmp, out)  # atomic publish
    with open(os.path.join(checkpoint_dir, "cc_state.json"), "w") as f:
        json.dump({"iteration": iteration, "converged": converged}, f)


# ---------------------------------------------------------------------------
# renumbering + sizes (O4 / J5 / A5 / O3)
# ---------------------------------------------------------------------------
def clusters_from_labels(
    labels: Dataset,
    renumber: str = "dense",
    num_partitions: int = 16,
) -> Dataset:
    """(node, label) → (node_id, cluster_id, cluster_size), sorted by
    (cluster_id, node_id) (apply_transitivity.py:149-171 semantics).

    renumber="dense": sorted distinct labels → 0..K-1; the per-cluster
    (ordinal, size) map lives on the driver and is broadcast — one small row
    per cluster, fine to ~10^8 clusters. No join needed: the same distinct
    aggregate yields both the ordering and the sizes (J5 collapsed into O4).
    renumber="hash": cluster_id = stable 63-bit hash of the label; sizes are
    attached by a distributed join keyed on label (the 10^12-scale path —
    cluster-id keyspace ≫ partitions, so hash partitions are never empty).
    """
    from .blocking import bucketed_apply

    sizes_ds = bucketed_apply(
        labels,
        ["label"],
        lambda g: g.groupby("label", as_index=False).size().rename(columns={"size": "cluster_size"}),
        num_buckets=num_partitions,
    ).map_batches(lambda t: t, batch_format="pyarrow")
    if renumber == "dense":
        rows = sizes_ds.take_all()
        rows.sort(key=lambda r: (len(r["label"]), r["label"]))  # length-lex = CC's representative order
        mapping = {r["label"]: (i, r["cluster_size"]) for i, r in enumerate(rows)}

        def assign(t: pa.Table) -> pa.Table:
            labs = t["label"].to_pylist()
            ids = pa.array([mapping[l][0] for l in labs], type=pa.int64())
            szs = pa.array([mapping[l][1] for l in labs], type=pa.int64())
            return pa.table({"node_id": t["node"], "cluster_id": ids, "cluster_size": szs})

        out = labels.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    else:
        from ..functions.hashing import hash_strings

        def hash_id(label_col) -> pa.Array:
            return pa.array(
                (hash_strings(label_col) >> np.uint64(1)).astype(np.int64), type=pa.int64()
            )

        joined = hash_join(labels, sizes_ds, on=["label"], num_partitions=num_partitions)

        def assign(t: pa.Table) -> pa.Table:
            return pa.table(
                {"node_id": t["node"], "cluster_id": hash_id(t["label"]), "cluster_size": t["cluster_size"]}
            )

        out = joined.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["cluster_id", "node_id"])


def cc_clusters(
    edges: Dataset,
    checkpoint_dir: Optional[str] = None,
    num_partitions: int = 16,
    renumber: str = "dense",
    driver_fallback_threshold: int = 0,
) -> Dataset:
    """Flat CC clustering (C7 / apply_clustering_algorithm.py): edges
    (id_left, id_right) → (node_id, cluster_id, cluster_size)."""
    # map_batches(pyarrow) rather than select/rename: coerces pandas-format
    # blocks (e.g. map_groups outputs) to arrow, which Project ops can't
    e = edges.map_batches(
        lambda t: pa.table({"u": t["id_left"], "v": t["id_right"]}), batch_format="pyarrow"
    )
    labels = connected_components(
        e, checkpoint_dir=checkpoint_dir, num_partitions=num_partitions,
        driver_fallback_threshold=driver_fallback_threshold,
    )
    return clusters_from_labels(labels, renumber=renumber, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# C8: re-wire clusters as chain or star graphs
# (build_graph_after_transitivity.py:5-41)
# ---------------------------------------------------------------------------
def cluster_graph_edges(clusters: Dataset, strategy: str = "chain") -> Dataset:
    """(node_id, cluster_id, …) → light edge list per cluster: consecutive
    sorted members (chain) or min-member hub (star), weight 1.0.

    One bucketed shuffle, then a fully vectorized kernel per bucket (sort by
    (cluster, member), run-boundary mask, two gathers) — no per-cluster
    Python; at millions of mostly-tiny clusters the per-group loop was the
    classic accumulator collapse this engine avoids everywhere else."""
    if strategy not in {"chain", "star"}:
        raise ValueError("strategy must be 'chain' or 'star'")
    from .blocking import bucketed_apply

    def wire_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.string()),
                          "v": pa.array([], pa.string()),
                          "weight": pa.array([], pa.float64())})
        if g.num_rows < 2:
            return empty
        tbl = pa.table({"c": pc.cast(g["cluster_id"], pa.string()),
                        "n": pc.cast(g["node_id"], pa.string())})
        idx = pc.sort_indices(tbl, sort_keys=[("c", "ascending"), ("n", "ascending")])
        c = tbl["c"].take(idx).combine_chunks().to_numpy(zero_copy_only=False)
        n = tbl["n"].take(idx).combine_chunks().to_numpy(zero_copy_only=False)
        breaks = np.ones(len(c), dtype=bool)
        breaks[1:] = c[1:] != c[:-1]
        if strategy == "chain":
            same = ~breaks[1:]
            us, vs = n[:-1][same], n[1:][same]
        else:
            run_id = np.cumsum(breaks) - 1
            run_start = np.flatnonzero(breaks)[run_id]
            mask = ~breaks
            us, vs = n[run_start[mask]], n[mask]
        if len(us) == 0:
            return empty
        return pa.table({"u": pa.array(us, pa.string()),
                         "v": pa.array(vs, pa.string()),
                         "weight": pa.array(np.full(len(us), 1.0))})

    return bucketed_apply(clusters.select_columns(["node_id", "cluster_id"]),
                          ["cluster_id"], wire_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# C6: edge list from predictions (build_graph_from_predictions.py:5-32)
# ---------------------------------------------------------------------------
def edges_from_predictions(edges: Dataset, keep_threshold: float = 0.45) -> Dataset:
    """Thresholded, self-loop-free, keep-max-weight undirected edge dataset —
    the reference's nx.Graph build as a composition (M8 + M9 + A2)."""
    from ray.data.aggregate import Max

    filtered = edges.map_batches(
        lambda t, th=keep_threshold: t.filter(
            pc.and_(pc.greater_equal(t["prob_match"], th), pc.not_equal(t["id_left"], t["id_right"]))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        filtered.select_columns(["id_left", "id_right", "prob_match"])
        .groupby(["id_left", "id_right"])
        .aggregate(Max("prob_match", alias_name="weight"))
    )


# ---------------------------------------------------------------------------
# cohort-partitioned transitivity (C5)
# ---------------------------------------------------------------------------
def cohort_seed_edges(edges_with_countries: Dataset, min_prob: float = DEFAULT_TRANSITIVITY_MIN_PROB) -> Dataset:
    """Strong edges sharing ≥1 country → one seed row per shared country
    (apply_transitivity.py:107-119). Expects src_countries/cand_countries."""

    def emit(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t["prob_match"], min_prob)
        t = t.filter(mask)
        us, vs, cohorts = [], [], []
        a_c = t["src_countries"].to_pylist()
        b_c = t["cand_countries"].to_pylist()
        ul = t["id_left"].to_pylist()
        vl = t["id_right"].to_pylist()
        for i in range(t.num_rows):
            inter = sorted(set(a_c[i] or ()) & set(b_c[i] or ()))
            for country in inter:
                us.append(ul[i])
                vs.append(vl[i])
                cohorts.append(country)
        return pa.table(
            {
                "u": pa.array(us, type=pa.string()),
                "v": pa.array(vs, type=pa.string()),
                "cohort": pa.array(cohorts, type=pa.string()),
            }
        )

    return edges_with_countries.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def cohort_transitivity(
    edges_with_countries: Dataset,
    min_prob: float = DEFAULT_TRANSITIVITY_MIN_PROB,
    checkpoint_dir: Optional[str] = None,
    num_partitions: int = 16,
    driver_fallback_threshold: int = 0,
) -> Dataset:
    """C5: per-cohort transitive closure → globally renumbered clusters.

    CC runs once over the composite node key ``cohort + '|' + node`` (a node
    active in two cohorts closes independently in each and yields two cluster
    rows — reference behavior reproduced, apply_transitivity.py:133-155).
    Output: (node_id, cluster_id, cluster_size) sorted by (cluster_id, node_id).
    """
    seeds = cohort_seed_edges(edges_with_countries, min_prob)

    def composite(t: pa.Table) -> pa.Table:
        sep = pa.scalar("|")
        cu = pc.binary_join_element_wise(t["cohort"], t["u"], sep)
        cv = pc.binary_join_element_wise(t["cohort"], t["v"], sep)
        return pa.table({"u": cu, "v": cv})

    comp_edges = seeds.map_batches(composite, batch_format="pyarrow", zero_copy_batch=True)
    labels = connected_components(
        comp_edges, checkpoint_dir=checkpoint_dir, num_partitions=num_partitions,
        driver_fallback_threshold=driver_fallback_threshold,
    )

    def split_composite(t: pa.Table) -> pa.Table:
        nodes = t["node"].to_pylist()
        labs = t["label"].to_pylist()
        node_ids = [n.split("|", 1)[1] for n in nodes]
        return pa.table(
            {
                "node_id": pa.array(node_ids, type=pa.string()),
                "label": pa.array(labs, type=pa.string()),  # cohort|min_node — sorts by (cohort, node)
            }
        )

    per_node = labels.map_batches(split_composite, batch_format="pyarrow", zero_copy_batch=True)
    return clusters_from_labels(
        per_node.rename_columns({"node_id": "node"}), renumber="dense", num_partitions=num_partitions
    )
