"""From-scratch random-forest classifier (histogram CART, Gini splits).

sklearn is not available in this container, but the reference's model family
is ``logreg | rf | xgb`` (/root/reference/models/pairwise_classifier.py:263-267:
RandomForestClassifier(n_estimators=400, max_depth=None, min_samples_split=2,
class_weight, random_state=42)). This reimplements that estimator in numpy:
bootstrap row sampling per tree, per-node feature subsampling
(``max_features="sqrt"``, sklearn's classifier default), weighted-Gini split
selection over 256-bin quantile histograms, leaf value = weighted class-1
fraction, forest prediction = mean of per-tree leaf probabilities. It is
deterministic for a fixed seed; it is NOT bit-identical to sklearn (different
RNG streams, midpoint-vs-bin thresholds), but trains to the same accuracy
class on the reference's 8-feature pair set.

Training is driver-side on the (small) labeled pair sample, exactly like the
reference; the fitted model is a picklable bundle of flat numpy arrays, cheap
to broadcast into distributed scoring tasks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class _Tree:
    feat: np.ndarray     # (n_nodes,) int32, -1 = leaf
    thr_bin: np.ndarray  # (n_nodes,) int16 — go left if bin <= thr_bin
    left: np.ndarray     # (n_nodes,) int32 child ids (-1 on leaves)
    right: np.ndarray
    value: np.ndarray    # (n_nodes,) float64 — weighted P(class=1) at leaf


@dataclass
class HistRandomForest:
    n_estimators: int = 400
    # the reference passes max_depth=None (unbounded); quantile-binned splits
    # exhaust distinct bins long before this cap on any real pair sample
    max_depth: int = 32
    min_samples_split: int = 2
    max_features: str = "sqrt"
    n_bins: int = 256
    random_state: int = 42
    bin_edges_: List[np.ndarray] = field(default_factory=list)
    trees_: List[_Tree] = field(default_factory=list)

    # -- binning (shared with the GBT family's scheme) ----------------------
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

    def _n_feats(self, d: int) -> int:
        if self.max_features == "sqrt":
            return max(1, int(np.sqrt(d)))
        return d

    # -- training -----------------------------------------------------------
    def fit(self, X: np.ndarray, y: np.ndarray, sample_weight: Optional[np.ndarray] = None) -> "HistRandomForest":
        X = np.nan_to_num(np.asarray(X, dtype=np.float64), nan=0.0)
        y = np.asarray(y, dtype=np.float64)
        n, d = X.shape
        binned = self._fit_bins(X)
        w = np.ones(n) if sample_weight is None else np.asarray(sample_weight, dtype=np.float64)
        rng = np.random.RandomState(self.random_state)
        self.trees_ = [
            self._build_tree(binned, y, w, rng.randint(0, n, size=n), rng, d)
            for _ in range(self.n_estimators)
        ]
        return self

    def _build_tree(self, binned, y, w, rows, rng, d) -> _Tree:
        B = self.n_bins
        m = self._n_feats(d)
        feat: List[int] = [-1]
        thr: List[int] = [0]
        left: List[int] = [-1]
        right: List[int] = [-1]
        value: List[float] = [0.0]

        node_of = np.zeros(len(rows), dtype=np.int64)  # level-relative ids
        level_nodes = [0]
        wr = w[rows]
        w1r = wr * y[rows]

        for depth in range(self.max_depth):
            L = len(level_nodes)
            if L == 0:
                break
            tot_w = np.bincount(node_of, weights=wr, minlength=L)
            tot_w1 = np.bincount(node_of, weights=w1r, minlength=L)
            tot_n = np.bincount(node_of, minlength=L)
            # parent purity score: (W1² + W0²)/W — maximizing the children's
            # sum of this is exactly minimizing weighted Gini impurity
            tot_w0 = tot_w - tot_w1
            parent_score = np.where(tot_w > 0, (tot_w1 ** 2 + tot_w0 ** 2) / np.maximum(tot_w, 1e-300), 0.0)

            # per-node feature subsets (sklearn samples per SPLIT; one draw
            # per node per level is the same granularity)
            subset = np.zeros((L, d), dtype=bool)
            for li in range(L):
                subset[li, rng.choice(d, size=m, replace=False)] = True

            best_gain = np.full(L, 1e-12)
            best_f = np.full(L, -1, dtype=np.int64)
            best_b = np.zeros(L, dtype=np.int64)
            for f in range(d):
                use = subset[:, f]
                if not use.any():
                    continue
                key = node_of * B + binned[rows, f]
                hw = np.bincount(key, weights=wr, minlength=L * B).reshape(L, B)
                hw1 = np.bincount(key, weights=w1r, minlength=L * B).reshape(L, B)
                WL = np.cumsum(hw, axis=1)[:, :-1]
                W1L = np.cumsum(hw1, axis=1)[:, :-1]
                WR = tot_w[:, None] - WL
                W1R = tot_w1[:, None] - W1L
                ok = (WL > 0) & (WR > 0)
                W0L = WL - W1L
                W0R = WR - W1R
                score = np.where(
                    ok,
                    (W1L ** 2 + W0L ** 2) / np.maximum(WL, 1e-300)
                    + (W1R ** 2 + W0R ** 2) / np.maximum(WR, 1e-300),
                    -np.inf,
                )
                fb = np.argmax(score, axis=1)
                fg = score[np.arange(L), fb] - parent_score
                upd = use & (fg > best_gain)
                best_gain[upd] = fg[upd]
                best_f[upd] = f
                best_b[upd] = fb[upd]

            splittable = (best_f >= 0) & (tot_n >= self.min_samples_split)
            next_nodes: List[int] = []
            new_rel = np.full(L * 2, -1, dtype=np.int64)
            for li, abs_id in enumerate(level_nodes):
                if splittable[li]:
                    feat[abs_id] = int(best_f[li])
                    thr[abs_id] = int(best_b[li])
                    for side, store in ((0, left), (1, right)):
                        new_rel[2 * li + side] = len(next_nodes)
                        next_nodes.append(len(feat))
                        store[abs_id] = len(feat)
                        feat.append(-1)
                        thr.append(0)
                        left.append(-1)
                        right.append(-1)
                        value.append(0.0)
                else:
                    value[abs_id] = float(tot_w1[li] / tot_w[li]) if tot_w[li] > 0 else 0.0
            if not next_nodes:
                break
            li_of = node_of
            active = splittable[li_of]
            go_right = np.zeros(len(rows), dtype=np.int64)
            if active.any():
                fb = binned[rows[active], best_f[li_of[active]]]
                go_right[active] = (fb > best_b[li_of[active]]).astype(np.int64)
            rows = rows[active]
            node_of = new_rel[2 * li_of[active] + go_right[active]]
            wr = w[rows]
            w1r = wr * y[rows]
            level_nodes = next_nodes
        else:
            # depth cap hit with open nodes → close them as leaves
            L = len(level_nodes)
            tot_w = np.bincount(node_of, weights=wr, minlength=L)
            tot_w1 = np.bincount(node_of, weights=w1r, minlength=L)
            for li, abs_id in enumerate(level_nodes):
                value[abs_id] = float(tot_w1[li] / tot_w[li]) if tot_w[li] > 0 else 0.0

        return _Tree(
            np.asarray(feat, dtype=np.int32),
            np.asarray(thr, dtype=np.int16),
            np.asarray(left, dtype=np.int32),
            np.asarray(right, dtype=np.int32),
            np.asarray(value, dtype=np.float64),
        )

    # -- prediction ---------------------------------------------------------
    def _predict_tree(self, tree: _Tree, binned: np.ndarray) -> np.ndarray:
        node = np.zeros(binned.shape[0], dtype=np.int64)
        while True:
            f = tree.feat[node]
            internal = f >= 0
            if not internal.any():
                break
            idx = np.nonzero(internal)[0]
            fb = binned[idx, f[idx]]
            go_right = fb > tree.thr_bin[node[idx]]
            node[idx] = np.where(go_right, tree.right[node[idx]], tree.left[node[idx]])
        return tree.value[node]

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = np.nan_to_num(np.asarray(X, dtype=np.float64), nan=0.0)
        binned = self._bin(X)
        acc = np.zeros(X.shape[0])
        for tree in self.trees_:
            acc += self._predict_tree(tree, binned)
        return acc / max(len(self.trees_), 1)
