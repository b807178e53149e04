"""From-scratch histogram gradient-boosted trees (logistic loss).

xgboost is not available in this container, but the reference's committed
predictions are XGB (/root/reference/models/pairwise_classifier.py:268-278:
n_estimators=600, max_depth=6, learning_rate=0.05, subsample=0.9,
colsample_bytree=0.9, reg_lambda=1.0, tree_method="hist",
scale_pos_weight, random_state=42). This reimplements that algorithm in
numpy — 256-bin quantile histograms, level-wise growth, second-order gain
(G²/(H+λ)), seeded row/column subsampling — so the ``xgb`` model family is
available for parity runs. It is deterministic for a fixed seed; it is NOT
bit-identical to xgboost (different RNG streams, tie-breaks), but trains to
the same accuracy class on the reference's feature set.

Training is driver-side on the (small) labeled pair sample, exactly like the
reference; the fitted model is a picklable bundle of flat numpy arrays, cheap
to broadcast into distributed scoring tasks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


@dataclass
class _Tree:
    feat: np.ndarray      # (n_nodes,) int16, -1 = leaf
    thr_bin: np.ndarray   # (n_nodes,) int16 — go left if bin <= thr_bin
    value: np.ndarray     # (n_nodes,) float64 leaf values (already lr-scaled)


@dataclass
class HistGBT:
    n_estimators: int = 600
    max_depth: int = 6
    learning_rate: float = 0.05
    subsample: float = 0.9
    colsample_bytree: float = 0.9
    reg_lambda: float = 1.0
    scale_pos_weight: float = 1.0
    min_child_weight: float = 1.0
    n_bins: int = 256
    random_state: int = 42
    bin_edges_: List[np.ndarray] = field(default_factory=list)
    trees_: List[_Tree] = field(default_factory=list)

    # -- binning -----------------------------------------------------------
    def _fit_bins(self, X: np.ndarray) -> np.ndarray:
        self.bin_edges_ = []
        binned = np.empty(X.shape, dtype=np.uint8)
        qs = np.linspace(0, 1, self.n_bins + 1)[1:-1]
        for f in range(X.shape[1]):
            edges = np.unique(np.quantile(X[:, f], qs))
            self.bin_edges_.append(edges)
            binned[:, f] = np.searchsorted(edges, X[:, f], side="left").astype(np.uint8)
        return binned

    def _bin(self, X: np.ndarray) -> np.ndarray:
        binned = np.empty(X.shape, dtype=np.uint8)
        for f in range(X.shape[1]):
            binned[:, f] = np.searchsorted(self.bin_edges_[f], X[:, f], side="left").astype(np.uint8)
        return binned

    # -- training ----------------------------------------------------------
    def fit(self, X: np.ndarray, y: np.ndarray, sample_weight: Optional[np.ndarray] = None) -> "HistGBT":
        X = np.nan_to_num(np.asarray(X, dtype=np.float64), nan=0.0)
        y = np.asarray(y, dtype=np.float64)
        n, d = X.shape
        binned = self._fit_bins(X)
        w = np.ones(n) if sample_weight is None else np.asarray(sample_weight, dtype=np.float64).copy()
        w[y == 1] *= self.scale_pos_weight
        rng = np.random.RandomState(self.random_state)
        raw = np.zeros(n)  # base_score 0.5 → logit 0
        B = self.n_bins
        n_cols = max(1, int(round(self.colsample_bytree * d)))
        self.trees_ = []
        for _ in range(self.n_estimators):
            p = _sigmoid(raw)
            g = w * (p - y)
            h = w * p * (1.0 - p)
            if self.subsample < 1.0:
                rows = np.nonzero(rng.uniform(size=n) < self.subsample)[0]
            else:
                rows = np.arange(n)
            cols = np.sort(rng.choice(d, size=n_cols, replace=False)) if n_cols < d else np.arange(d)
            tree = self._build_tree(binned, g, h, rows, cols)
            self.trees_.append(tree)
            raw += self._predict_tree(tree, binned)
        return self

    def _build_tree(self, binned, g, h, rows, cols) -> _Tree:
        B = self.n_bins
        lam = self.reg_lambda
        max_nodes = 2 ** (self.max_depth + 1) - 1
        feat = np.full(max_nodes, -1, dtype=np.int16)
        thr = np.zeros(max_nodes, dtype=np.int16)
        value = np.zeros(max_nodes, dtype=np.float64)

        node_of = np.zeros(len(rows), dtype=np.int64)  # level-relative ids
        level_nodes = [0]  # absolute node ids at current level
        gr, hr = g[rows], h[rows]

        for depth in range(self.max_depth):
            L = len(level_nodes)
            if L == 0:
                break
            # histograms for all nodes at this level, per selected feature
            tot_g = np.bincount(node_of, weights=gr, minlength=L)
            tot_h = np.bincount(node_of, weights=hr, minlength=L)
            best_gain = np.full(L, 0.0)
            best_f = np.full(L, -1, dtype=np.int64)
            best_b = np.zeros(L, dtype=np.int64)
            parent_score = (tot_g ** 2) / (tot_h + lam)
            for f in cols:
                key = node_of * B + binned[rows, f]
                hg = np.bincount(key, weights=gr, minlength=L * B).reshape(L, B)
                hh = np.bincount(key, weights=hr, minlength=L * B).reshape(L, B)
                GL = np.cumsum(hg, axis=1)[:, :-1]
                HL = np.cumsum(hh, axis=1)[:, :-1]
                GR = tot_g[:, None] - GL
                HR = tot_h[:, None] - HL
                ok = (HL >= self.min_child_weight) & (HR >= self.min_child_weight)
                gain = np.where(
                    ok,
                    GL ** 2 / (HL + lam) + GR ** 2 / (HR + lam) - parent_score[:, None],
                    -np.inf,
                )
                fb = np.argmax(gain, axis=1)
                fg = gain[np.arange(L), fb]
                upd = fg > best_gain
                best_gain[upd] = fg[upd]
                best_f[upd] = f
                best_b[upd] = fb[upd]

            # apply splits; unsplit nodes become leaves
            split_mask = best_f >= 0
            next_nodes = []
            new_rel = np.full(L * 2, -1, dtype=np.int64)
            for li, abs_id in enumerate(level_nodes):
                if split_mask[li]:
                    feat[abs_id] = best_f[li]
                    thr[abs_id] = best_b[li]
                    for side in (0, 1):
                        new_rel[2 * li + side] = len(next_nodes)
                        next_nodes.append(2 * abs_id + 1 + side)
                else:
                    value[abs_id] = -self.learning_rate * (
                        tot_g[li] / (tot_h[li] + lam)
                    )
            if not next_nodes:
                return _Tree(feat, thr, value)
            # reassign rows
            li_of = node_of
            go_right = np.zeros(len(rows), dtype=np.int64)
            split_f = best_f[li_of]
            active = split_f >= 0
            if active.any():
                fb = binned[rows[active], split_f[active]]
                go_right[active] = (fb > best_b[li_of[active]]).astype(np.int64)
            keep = active
            node_of = new_rel[2 * li_of[keep] + go_right[keep]]
            rows = rows[keep]
            gr, hr = g[rows], h[rows]
            level_nodes = next_nodes
        # remaining nodes at max depth → leaves
        if len(level_nodes):
            L = len(level_nodes)
            tot_g = np.bincount(node_of, weights=gr, minlength=L)
            tot_h = np.bincount(node_of, weights=hr, minlength=L)
            for li, abs_id in enumerate(level_nodes):
                value[abs_id] = -self.learning_rate * (tot_g[li] / (tot_h[li] + self.reg_lambda))
        return _Tree(feat, thr, value)

    # -- prediction --------------------------------------------------------
    def _predict_tree(self, tree: _Tree, binned: np.ndarray) -> np.ndarray:
        node = np.zeros(binned.shape[0], dtype=np.int64)
        for _ in range(self.max_depth):
            f = tree.feat[node]
            internal = f >= 0
            if not internal.any():
                break
            idx = np.nonzero(internal)[0]
            fb = binned[idx, f[idx]]
            right = (fb > tree.thr_bin[node[idx]]).astype(np.int64)
            node[idx] = 2 * node[idx] + 1 + right
        return tree.value[node]

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        X = np.nan_to_num(np.asarray(X, dtype=np.float64), nan=0.0)
        binned = self._bin(X)
        raw = np.zeros(X.shape[0])
        for tree in self.trees_:
            raw += self._predict_tree(tree, binned)
        return raw

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return _sigmoid(self.decision_function(X))
