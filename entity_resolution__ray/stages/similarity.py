"""Similarity search over an embedding column (``list<float>``).

  * brute_force_topk — exact cosine top-k: the query matrix is broadcast once
    (``ray.put``), every batch computes a (Q × batch) matmul and keeps its
    local top-k, the driver merges the tiny per-batch heaps. Baseline path.
  * ivf_topk         — IVF index: k-means centroids fit on a sample
    (driver-side, numpy Lloyd iterations, seeded), vectors assigned to their
    nearest centroid in a ``map_batches`` pass; queries probe only the
    ``nprobe`` nearest centroid partitions. The 10^12-vector scale path.
"""

from __future__ import annotations

import heapq
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def _vecs_from_list_column(col) -> np.ndarray:
    """(n, dim) float64 matrix from a list/fixed_size_list column WITHOUT a
    to_pylist round-trip — reads the child values buffer (the per-row Python
    list materialization was most of knn's wall time at sf0.1)."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat.reshape(n, -1), dtype=np.float64)


class BatchTopK:
    """Batch fn: per-batch cosine top-k against the broadcast query matrix.
    Emits (query_idx, vec_id, cosine) — at most Q×k rows per batch. With
    ``cell_col`` set, the candidate's IVF cell rides along so the merge can
    apply per-query probe masks without any driver-side id→cell table.

    Holds only the ObjectRef (small picklable state → runs as ELASTIC TASKS,
    not a capped actor pool whose serial spin-up dominated this query); each
    worker resolves + normalizes the query matrix once via the worker cache."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str, cell_col: Optional[str] = None):
        self.qref = queries_ref
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.cell_col = cell_col

    @property
    def Q(self) -> np.ndarray:
        from ..state.worker_cache import cached_get

        return cached_get(
            self.qref, transform=lambda q: _normalize(np.asarray(q, dtype=np.float64))
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        V = _normalize(_vecs_from_list_column(batch[self.vec_col]))
        sims = self.Q @ V.T  # (Q, n)
        k = min(self.k, sims.shape[1])
        # order by (cosine DESC, vec_id ASC) BEFORE truncating so batch-local
        # top-k keeps exactly the candidates the global tie-break would —
        # argpartition alone drops an arbitrary subset of equal-cosine ties
        id_rank = np.argsort(np.argsort(ids, kind="stable"), kind="stable")
        order = np.lexsort((np.broadcast_to(id_rank, sims.shape), -sims))
        idx = order[:, :k]
        qi = np.repeat(np.arange(sims.shape[0]), k)
        vi = idx.ravel()
        cols = {
            "query_idx": pa.array(qi, type=pa.int64()),
            "vec_id": pa.array(ids[vi]),
            "cosine": pa.array(sims[qi, vi], type=pa.float64()),
        }
        if self.cell_col is not None:
            cells = batch[self.cell_col].to_numpy(zero_copy_only=False)
            cols["cell"] = pa.array(cells[vi], type=pa.int32())
        return pa.table(cols)


def brute_force_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k per query row. Returns (query_idx, vec_id, cosine)
    sorted by (query_idx, -cosine, vec_id); ties broken by vec_id for
    determinism."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    fn = BatchTopK(queries_ref=qref, k=k, vec_col=vec_col, id_col=id_col)
    partial = ds.map_batches(
        lambda t, f=fn: f(t), batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_topk(partial, k)


def _merge_topk(partial: Dataset, k: int, probe_sets: Optional[List[set]] = None) -> pa.Table:
    """Driver merge of the (small, ≤ Q×k per batch) partial top-k stream into
    per-query heaps. With ``probe_sets``, a candidate counts for a query only
    if its IVF cell is in that query's probe set (the cell rides with each
    partial row — no driver-side id→cell table at any scale)."""
    heaps: dict[int, list] = {}
    for b in partial.iter_batches(batch_size=65536, batch_format="pyarrow"):
        cells = b["cell"].to_pylist() if probe_sets is not None else [None] * len(b)
        for qi, vid, cos, cell in zip(
            b["query_idx"].to_pylist(), b["vec_id"].to_pylist(), b["cosine"].to_pylist(), cells
        ):
            if probe_sets is not None and cell not in probe_sets[qi]:
                continue
            h = heaps.setdefault(qi, [])
            item = (cos, _neg_id_key(vid), vid)
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    rows = []
    for qi in sorted(heaps):
        for cos, _, vid in sorted(heaps[qi], key=lambda x: (-x[0], x[2])):
            rows.append({"query_idx": qi, "vec_id": vid, "cosine": cos})
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"query_idx": pa.array([], type=pa.int64()), "vec_id": pa.array([], type=pa.int64()),
         "cosine": pa.array([], type=pa.float64())}
    )


def _neg_id_key(vid):
    """Order helper so equal-cosine ties prefer the SMALLER id in a max-heap
    comparison (ids may be ints or strings)."""
    if isinstance(vid, (int, np.integer)):
        return -int(vid)
    return tuple(-b for b in str(vid).encode())


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------
def kmeans_fit(sample: np.ndarray, n_clusters: int, n_iter: int = 10, seed: int = 0) -> np.ndarray:
    """Seeded Lloyd iterations on a driver-side sample (numpy only)."""
    rng = np.random.RandomState(seed)
    X = _normalize(np.asarray(sample, dtype=np.float64))
    centers = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(X @ centers.T, axis=1)
        for c in range(len(centers)):
            members = X[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
        centers = _normalize(centers)
    return centers


class IVFAssign:
    """Small picklable state (just the centers ref) → elastic tasks; centers
    resolved once per worker via the worker cache."""

    def __init__(self, centers_ref, vec_col: str, id_col: str):
        self.cref = centers_ref
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import cached_get

        centers = cached_get(self.cref)
        V = _normalize(_vecs_from_list_column(batch[self.vec_col]))
        assign = np.argmax(V @ centers.T, axis=1)
        return batch.append_column("ivf_cell", pa.array(assign, type=pa.int32()))


def ivf_build(
    ds: Dataset,
    n_clusters: int = 16,
    sample_size: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> Tuple[Dataset, np.ndarray]:
    """Fit centroids on a sample and assign every vector to its cell.
    Returns (assigned dataset with ivf_cell column, centroids)."""
    n = ds.count()
    frac = min(1.0, sample_size / max(n, 1))
    sample_rows = ds.select_columns([vec_col]).random_sample(frac, seed=seed).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    centers = kmeans_fit(sample, n_clusters, seed=seed)
    cref = ray.put(centers)
    fn = IVFAssign(centers_ref=cref, vec_col=vec_col, id_col=id_col)
    assigned = ds.map_batches(
        lambda t, f=fn: f(t), batch_format="pyarrow", zero_copy_batch=True
    )
    return assigned, centers


def ivf_topk(
    assigned: Dataset,
    centers: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate top-k: each query searches only its ``nprobe`` nearest IVF
    cells (filter pushed into the scan — on a partitioned-by-cell layout this
    prunes whole files)."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ centers.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    wanted_cells = sorted({int(c) for row in probe for c in row})
    import pyarrow.compute as pc

    sub = assigned.map_batches(
        lambda t, cells=wanted_cells: t.filter(pc.is_in(t["ivf_cell"], value_set=pa.array(cells, type=pa.int32()))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # per-query cell masks applied at merge time: a (query, vec) pair counts
    # only if the vec's cell is probed by that query. The cell rides with
    # every partial top-k row — no driver-side id→cell table at any scale.
    qref = ray.put(Q)
    fn = BatchTopK(queries_ref=qref, k=k, vec_col=vec_col, id_col=id_col, cell_col="ivf_cell")
    partial = sub.map_batches(
        lambda t, f=fn: f(t), batch_format="pyarrow", zero_copy_batch=True
    )
    probe_sets = [set(int(c) for c in row) for row in probe]
    return _merge_topk(partial, k, probe_sets=probe_sets)


def ivf_write_partitioned(assigned: Dataset, path: str) -> str:
    """Persist IVF-assigned vectors as hive-partitioned parquet — one
    directory per cell — so searches prune whole FILES at the read instead
    of post-scan filtering. This is the 100-TB layout: a query touching
    ``nprobe`` of C cells reads nprobe/C of the bytes."""
    assigned.write_parquet(path, partition_cols=["ivf_cell"])
    return path


def ivf_topk_partitioned(
    path: str,
    centers: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate top-k over the hive-partitioned IVF layout written by
    :func:`ivf_write_partitioned`. Cell pruning happens at file-listing time
    (``PathPartitionFilter``) — unprobed cells' files are never opened."""
    from ray.data.datasource.partitioning import PathPartitionFilter

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ centers.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    wanted_cells = {int(c) for row in probe for c in row}
    flt = PathPartitionFilter.of(lambda kv: int(kv["ivf_cell"]) in wanted_cells)
    sub = ray.data.read_parquet(path, partition_filter=flt, columns=[id_col, vec_col, "ivf_cell"])
    # hive partition values come back as strings — restore int32 for the merge
    import pyarrow.compute as pc

    sub = sub.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("ivf_cell"), "ivf_cell", pc.cast(t["ivf_cell"], pa.int32())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    qref = ray.put(Q)
    fn = BatchTopK(queries_ref=qref, k=k, vec_col=vec_col, id_col=id_col, cell_col="ivf_cell")
    partial = sub.map_batches(
        lambda t, f=fn: f(t), batch_format="pyarrow", zero_copy_batch=True
    )
    probe_sets = [set(int(c) for c in row) for row in probe]
    return _merge_topk(partial, k, probe_sets=probe_sets)
