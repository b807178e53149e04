"""Distributed k-means (Lloyd's) and SemDeDup-style semantic deduplication
over an embedding column (``list<float>``).

Unlike the driver-side sample fit inside stages/similarity.ivf_topk (which
only needs rough cells), ``kmeans_fit`` runs full Lloyd iterations over ALL
rows, distributed:

  * init        — the vectors of the ``k`` smallest ids (deterministic and
    SQL-replicable; no RNG), gathered by a per-block bottom-k + tiny driver
    merge — no sort, no shuffle.
  * each iter   — centroids broadcast once (``ray.put``); every batch
    computes argmin cells vectorized (float64 matmul expansion) and emits
    ONE partial row per (cell present in batch): sum-vector + count +
    inertia partial. A bucketed per-cell reduce then yields k total rows;
    only (cells-present × blocks) partial rows ever move — the vectors
    themselves never shuffle.
  * empty cells keep their previous centroid; inertia is tracked per iter
    and asserted non-increasing (Lloyd's invariant) as a built-in self-gate.

``kmeans_assign`` is the one-step assignment (broadcast centroids → argmin
per batch, ties to the lowest cell id) — with the deterministic seed init it
is exactly replicable in SQL (DuckDB ``list_distance`` + ``row_number``),
which is how the ``km_assign_cells`` driver query is oracle-checked.

``semdedup`` (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): fit k-means, assign every vector
to a cell, then WITHIN each cell drop any vector whose cosine similarity to
an earlier-kept (lower-id) vector is ≥ ``threshold``. Cells are the scale
device: the quadratic similarity check runs per cell inside a bucketed
shuffle, never across the corpus; oversized cells are split deterministically
by id-hash with a logged recall note (the same giant-group discipline as the
LSH band cap in stages/dedup.py).
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .similarity import _vecs_from_list_column

logger = logging.getLogger(__name__)


def _bottom_k_rows(ds: Dataset, id_col: str, vec_col: str, k: int) -> np.ndarray:
    """Vectors of the k smallest ids: per-block bottom-k partials (k rows per
    block), tiny driver merge. No global sort."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[take]), vec_col: t[vec_col].take(pa.array(take))})

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    parts = parts.sort_values(id_col, kind="stable").head(k)
    return np.ascontiguousarray(np.stack(parts[vec_col].to_numpy()), dtype=np.float64)


def _argmin_cells(X: np.ndarray, C: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized nearest-centroid: ||x-c||² = ||x||² - 2x·c + ||c||²; the
    ||x||² term is argmin-invariant so distances drop it (added back only for
    inertia). Ties go to the lowest cell id (np.argmin)."""
    d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
    cells = np.argmin(d2, axis=1)
    mind2 = d2[np.arange(len(X)), cells] + (X * X).sum(axis=1)
    return cells, np.maximum(mind2, 0.0)


class _PartialSums:
    """Batch fn for one Lloyd iteration: emits one row per cell present in
    the batch — (cell, count, inertia partial, sum-vector). Holds only the
    centroid ObjectRef → runs as elastic tasks; resolved once per worker."""

    def __init__(self, cref, vec_col: str):
        self.cref = cref
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import cached_get

        C = cached_get(self.cref)
        X = _vecs_from_list_column(batch[self.vec_col])
        if len(X) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "inertia": pa.array([], pa.float64()),
                             "vsum": pa.array([], pa.list_(pa.float64()))})
        cells, mind2 = _argmin_cells(X, C)
        present = np.unique(cells)
        remap = np.searchsorted(present, cells)
        sums = np.zeros((len(present), X.shape[1]), dtype=np.float64)
        np.add.at(sums, remap, X)
        n = np.bincount(remap, minlength=len(present)).astype(np.int64)
        inert = np.bincount(remap, weights=mind2, minlength=len(present))
        return pa.table({
            "cell": pa.array(present.astype(np.int64)),
            "n": pa.array(n),
            "inertia": pa.array(inert),
            "vsum": pa.array(list(sums)),
        })


def kmeans_fit(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iters: int = 5,
) -> Tuple[np.ndarray, List[float]]:
    """Full distributed Lloyd's (module docstring). Returns (centroids (k,d)
    float64, per-iteration inertia). Deterministic: seed init = k smallest
    ids, all reduces are exact per-cell sums."""
    from .blocking import bucketed_apply

    C = _bottom_k_rows(ds, id_col, vec_col, k)
    if len(C) < k:
        raise ValueError(f"kmeans_fit: k={k} but only {len(C)} rows")
    vecs = ds.select_columns([id_col, vec_col]).materialize()
    inertias: List[float] = []
    for it in range(n_iters):
        cref = ray.put(C)
        partial = vecs.map_batches(
            _PartialSums(cref, vec_col), batch_format="pyarrow", zero_copy_batch=True
        )

        # the partial table is ≤ k × blocks rows BY CONSTRUCTION (one row per
        # cell present per batch) — a sketch, not data. When that product is
        # driver-sized, reducing on the driver drops one all-to-all barrier
        # PER ITERATION (~0.3s/iter of pure fixed cost at fixture scale); the
        # driver holds k×d sums, never vectors. The guard includes the block
        # count: at 10^6 blocks even k=4096 partials are not driver-sized.
        if k * vecs.num_blocks() <= 2_000_000:
            pdf = partial.to_pandas()
            cells_np = pdf["cell"].to_numpy()
            uniq, remap = np.unique(cells_np, return_inverse=True)
            V = np.stack(pdf["vsum"].to_numpy()) if len(pdf) else np.zeros((0, C.shape[1]))
            sums_m = np.zeros((len(uniq), C.shape[1]), dtype=np.float64)
            np.add.at(sums_m, remap, V)
            totals = pd.DataFrame({
                "cell": uniq,
                "n": np.bincount(remap, weights=pdf["n"].to_numpy()).astype(np.int64),
                "inertia": np.bincount(remap, weights=pdf["inertia"].to_numpy()),
                "vsum": list(sums_m),
            })
        else:

            def reduce_cells(df: pd.DataFrame) -> pd.DataFrame:
                g = df.groupby("cell", sort=False)
                out = g.agg(n=("n", "sum"), inertia=("inertia", "sum")).reset_index()
                out["vsum"] = g["vsum"].apply(
                    lambda s: np.sum(np.stack(s.to_numpy()), axis=0)
                ).to_numpy()
                return out

            totals = bucketed_apply(partial, ["cell"], reduce_cells, num_buckets=8).to_pandas()
        newC = C.copy()  # empty cells keep their previous centroid
        cells = totals["cell"].to_numpy()
        counts = totals["n"].to_numpy().astype(np.float64)
        sums = np.stack(totals["vsum"].to_numpy())
        newC[cells] = sums / counts[:, None]
        inertia = float(totals["inertia"].sum())
        if inertias and inertia > inertias[-1] * (1.0 + 1e-9):
            raise AssertionError(
                f"kmeans_fit: inertia increased at iter {it} "
                f"({inertias[-1]:.6g} → {inertia:.6g}) — Lloyd invariant broken"
            )
        inertias.append(inertia)
        C = newC
    return C, inertias


def kmeans_assign(
    ds: Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """(id, cell) for every row — broadcast centroids, one map_batches pass."""
    cref = ray.put(np.ascontiguousarray(centroids, dtype=np.float64))

    class Assign:
        def __init__(self, cref, vec_col, id_col):
            self.cref, self.vec_col, self.id_col = cref, vec_col, id_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..state.worker_cache import cached_get

            C = cached_get(self.cref)
            X = _vecs_from_list_column(batch[self.vec_col])
            cells = (
                _argmin_cells(X, C)[0] if len(X) else np.array([], dtype=np.int64)
            )
            return pa.table({self.id_col: batch[self.id_col], "cell": pa.array(cells.astype(np.int64))})

    return ds.map_batches(Assign(cref, vec_col, id_col), batch_format="pyarrow", zero_copy_batch=True)


def semdedup(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iters: int = 3,
    threshold: float = 0.95,
    max_cell: int = 4096,
    num_buckets: int = 32,
) -> Dataset:
    """SemDeDup (module docstring): returns (id, cell, keep) for every row —
    keep=0 rows are semantic near-duplicates of an earlier-kept (lower-id)
    member of the same k-means cell with cosine ≥ threshold."""
    from .blocking import bucketed_apply

    C, _ = kmeans_fit(ds, vec_col=vec_col, id_col=id_col, k=k, n_iters=n_iters)
    cref = ray.put(C)

    class AssignCarry:
        """cell rides WITH the vector row so the per-cell pass needs no join."""

        def __init__(self, cref, vec_col, id_col):
            self.cref, self.vec_col, self.id_col = cref, vec_col, id_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..state.worker_cache import cached_get

            Cm = cached_get(self.cref)
            X = _vecs_from_list_column(batch[self.vec_col])
            cells = _argmin_cells(X, Cm)[0] if len(X) else np.array([], dtype=np.int64)
            cell = cells.astype(np.int64)
            # full-range WELL-MIXED deterministic id hash (splitmix64
            # finalizer — a bare multiplicative/golden-ratio hash is
            # low-discrepancy: consecutive ids would land in systematically
            # DIFFERENT sub-cells, never co-landing); the giant-split pass
            # reduces it mod ceil(cell_size / max_cell)
            sub = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64).copy()
            with np.errstate(over="ignore"):
                sub ^= sub >> np.uint64(30)
                sub *= np.uint64(0xBF58476D1CE4E5B9)
                sub ^= sub >> np.uint64(27)
                sub *= np.uint64(0x94D049BB133111EB)
                sub ^= sub >> np.uint64(31)
            return pa.table({
                self.id_col: batch[self.id_col],
                "cell": pa.array(cell),
                "__sub": pa.array(sub.view(np.int64)),
                self.vec_col: batch[self.vec_col],
            })

    assigned = ds.map_batches(
        AssignCarry(cref, vec_col, id_col), batch_format="pyarrow", zero_copy_batch=True
    )

    # count cells once to decide which need the deterministic sub-split
    cell_sizes = assigned.map_batches(
        lambda t: pa.table({"cell": t["cell"]}), batch_format="pyarrow"
    ).groupby("cell").count().to_pandas()
    big = cell_sizes.loc[cell_sizes["count()"] > max_cell]
    # sub-group count SCALES with the cell: ceil(size / max_cell) sub-cells of
    # ~max_cell rows each (a fixed-width hash would shatter giants into
    # singletons and silently disable dedup for exactly the dup-dense cells)
    n_sub = {
        int(c): int(-(-s // max_cell))
        for c, s in zip(big["cell"], big["count()"])
    }
    if n_sub:
        logger.warning(
            "semdedup: %d cell(s) over max_cell=%d split by id-hash into "
            "%s sub-cells — near-dups straddling sub-cells of a giant are "
            "not compared",
            len(n_sub), max_cell, sorted(n_sub.values(), reverse=True)[:5],
        )
    giants_ref = ray.put(n_sub)

    def key_giants(t: pa.Table) -> pa.Table:
        from ..state.worker_cache import cached_get

        g = cached_get(giants_ref)
        cells = t["cell"].to_numpy(zero_copy_only=False)
        sub = t["__sub"].to_numpy(zero_copy_only=False).view(np.uint64)
        div = np.ones(len(cells), dtype=np.uint64)
        for c, ns in g.items():
            div[cells == c] = ns
        eff = (sub % div).astype(np.int64)
        return t.set_column(t.schema.get_field_index("__sub"), "__sub", pa.array(eff))

    assigned = assigned.map_batches(key_giants, batch_format="pyarrow", zero_copy_batch=True)

    def dedup_cell(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (_, _), g in df.groupby(["cell", "__sub"], sort=False):
            g = g.sort_values(id_col, kind="stable")
            X = np.ascontiguousarray(np.stack(g[vec_col].to_numpy()), dtype=np.float64)
            norms = np.linalg.norm(X, axis=1)
            norms[norms == 0] = 1.0
            Xn = X / norms[:, None]
            m = len(g)
            # one m×m sim matrix per (sub-)cell — bounded by max_cell², then a
            # cheap greedy chain (keep i unless an earlier-KEPT j has sim ≥ th)
            S = Xn @ Xn.T
            keep = np.ones(m, dtype=bool)
            kept_rows: List[int] = [0] if m else []
            for i in range(1, m):
                if np.max(S[kept_rows, i]) >= threshold:
                    keep[i] = False
                else:
                    kept_rows.append(i)
            out.append(pd.DataFrame({
                id_col: g[id_col].to_numpy(),
                "cell": g["cell"].to_numpy(),
                "keep": keep.astype(np.int64),
            }))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {id_col: [], "cell": [], "keep": []}
        )

    return bucketed_apply(assigned, ["cell", "__sub"], dedup_cell, num_buckets=num_buckets)
