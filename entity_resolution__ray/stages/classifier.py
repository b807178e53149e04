"""Pairwise match classifier — numpy logistic regression (no sklearn/xgboost
in this container) with the reference's training protocol.

Reference analogue: /root/reference/models/pairwise_classifier.py
  * StandardScaler on ALL features (:150, :188-190)
  * balanced class weights (:128-131)
  * StratifiedKFold(5, shuffle, seed 42) out-of-fold probabilities (:135-160)
  * global OOF F1-optimal threshold (:163-165)
  * refit on all data (:186-190)

The reference's pluggable model family is ``logreg | rf | xgb``
(pairwise_classifier.py:100-124); only ``logreg`` has no native dependency, so
it is the one implemented (IRLS/Newton — deterministic, converges in a handful
of iterations on 8 standardized features). Training is DRIVER-SIDE on the
(small) labeled pair sample, like the reference; inference is a distributed
actor-pool ``map_batches`` (``ScorerActor``) holding the broadcast model.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..schema import FEATURE_COLS


# ---------------------------------------------------------------------------
# metrics (sklearn-free)
# ---------------------------------------------------------------------------
def roc_auc(y: np.ndarray, p: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney U), ties averaged."""
    order = np.argsort(p, kind="mergesort")
    ranks = np.empty(len(p), dtype=np.float64)
    ranks[order] = np.arange(1, len(p) + 1)
    # average ranks for ties
    sorted_p = p[order]
    i = 0
    while i < len(sorted_p):
        j = i
        while j + 1 < len(sorted_p) and sorted_p[j + 1] == sorted_p[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + j + 2) / 2.0
        i = j + 1
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def average_precision(y: np.ndarray, p: np.ndarray) -> float:
    order = np.argsort(-p, kind="mergesort")
    y_sorted = y[order]
    tp = np.cumsum(y_sorted)
    prec = tp / np.arange(1, len(y) + 1)
    n_pos = y.sum()
    if n_pos == 0:
        return 0.0
    return float((prec * y_sorted).sum() / n_pos)


def select_threshold_by_f1(y: np.ndarray, p: np.ndarray) -> Tuple[float, Dict[str, float]]:
    """Probability threshold maximizing F1 (pairwise_classifier.py:60-78
    semantics: preds = p >= thr)."""
    order = np.argsort(-p, kind="mergesort")
    p_sorted = p[order]
    y_sorted = y[order].astype(np.float64)
    tp = np.cumsum(y_sorted)
    n_pred = np.arange(1, len(p) + 1, dtype=np.float64)
    n_pos = y_sorted.sum()
    if n_pos == 0 or len(p) == 0:
        return 0.5, {"f1": 0.0, "precision": 0.0, "recall": 0.0}
    # evaluate at the LAST index of each tie group (preds = p >= thr includes ties)
    last_of_tie = np.nonzero(np.append(np.diff(p_sorted) != 0, True))[0]
    prec = tp[last_of_tie] / n_pred[last_of_tie]
    rec = tp[last_of_tie] / n_pos
    denom = prec + rec
    f1 = np.where(denom > 0, 2 * prec * rec / np.where(denom > 0, denom, 1.0), 0.0)
    j = int(np.argmax(f1))
    thr = float(p_sorted[last_of_tie[j]])
    return thr, {"f1": float(f1[j]), "precision": float(prec[j]), "recall": float(rec[j])}


# ---------------------------------------------------------------------------
# scaler + logistic regression (IRLS)
# ---------------------------------------------------------------------------
@dataclass
class StandardScaler:
    mean_: np.ndarray = field(default_factory=lambda: np.zeros(0))
    scale_: np.ndarray = field(default_factory=lambda: np.zeros(0))

    def fit(self, X: np.ndarray) -> "StandardScaler":
        self.mean_ = X.mean(axis=0)
        std = X.std(axis=0)
        std[std == 0.0] = 1.0
        self.scale_ = std
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        return (X - self.mean_) / self.scale_


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def fit_logreg(
    X: np.ndarray,
    y: np.ndarray,
    sample_weight: np.ndarray,
    l2: float = 1e-4,
    max_iter: int = 50,
    tol: float = 1e-10,
) -> Tuple[np.ndarray, float]:
    """Weighted logistic regression via IRLS/Newton; returns (coef, intercept).
    Deterministic; intercept unpenalized."""
    n, d = X.shape
    Xb = np.hstack([X, np.ones((n, 1))])
    w = np.zeros(d + 1)
    reg = np.full(d + 1, l2)
    reg[-1] = 0.0
    for _ in range(max_iter):
        z = Xb @ w
        p = _sigmoid(z)
        g = Xb.T @ (sample_weight * (p - y)) + reg * w
        wdiag = sample_weight * p * (1.0 - p) + 1e-12
        H = (Xb * wdiag[:, None]).T @ Xb + np.diag(reg + 1e-12)
        step = np.linalg.solve(H, g)
        w -= step
        if np.abs(step).max() < tol:
            break
    return w[:-1], float(w[-1])


# ---------------------------------------------------------------------------
# trained matcher + training protocol
# ---------------------------------------------------------------------------
@dataclass
class TrainedMatcher:
    """Picklable trained matcher (broadcast to ScorerActor pools).

    ``gbt`` holds any tree-family model exposing ``predict_proba``
    (model_name="xgb" → functions/gbt.HistGBT, the reference's committed
    predictions are XGBoost, pairwise_classifier.py:268; model_name="rf" →
    functions/rf.HistRandomForest, pairwise_classifier.py:263); otherwise the
    linear coef/intercept path is used."""

    coef: np.ndarray
    intercept: float
    scaler: StandardScaler
    feature_cols: List[str]
    best_threshold: float
    metrics: Dict
    gbt: object = None

    def predict_proba_np(self, X: np.ndarray) -> np.ndarray:
        Xs = self.scaler.transform(np.nan_to_num(X.astype(np.float64), nan=0.0))
        if self.gbt is not None:
            return self.gbt.predict_proba(Xs)
        return _sigmoid(Xs @ self.coef + self.intercept)

    def predict_np(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba_np(X) >= self.best_threshold).astype(np.int8)


def _stratified_folds(y: np.ndarray, n_folds: int, seed: int) -> np.ndarray:
    """Deterministic stratified fold assignment (shuffle within class, seeded)."""
    rng = np.random.RandomState(seed)
    fold = np.empty(len(y), dtype=np.int64)
    for cls in np.unique(y):
        idx = np.nonzero(y == cls)[0]
        perm = rng.permutation(idx)
        fold[perm] = np.arange(len(perm)) % n_folds
    return fold


def train_pairwise_matcher(
    features: np.ndarray,
    labels: np.ndarray,
    feature_cols: List[str] = FEATURE_COLS,
    n_folds: int = 5,
    random_state: int = 42,
    model_name: str = "logreg",
    gbt_params: Optional[Dict] = None,
) -> TrainedMatcher:
    """The reference training protocol (pairwise_classifier.py:284-371):
    stratified OOF probabilities → global OOF-F1 threshold → refit on all.

    model_name: "logreg" (IRLS linear), "rf" (from-scratch histogram random
    forest mirroring the reference's RandomForestClassifier config —
    functions/rf.py) or "xgb" (from-scratch histogram GBT mirroring the
    reference's XGBClassifier config — functions/gbt.py). ``gbt_params``
    overrides HistGBT/HistRandomForest hyperparameters (e.g. fewer trees in
    tests)."""
    if model_name not in ("logreg", "rf", "xgb"):
        raise ValueError(f"Unknown model: {model_name}. Choose from: logreg | rf | xgb")
    X = np.nan_to_num(features.astype(np.float64), nan=0.0)
    y = labels.astype(np.float64)

    # balanced class weights (pairwise_classifier.py:128-131)
    n = len(y)
    n_pos = y.sum()
    n_neg = n - n_pos
    w_pos = n / (2.0 * max(n_pos, 1.0))
    w_neg = n / (2.0 * max(n_neg, 1.0))
    sample_weight = np.where(y == 1, w_pos, w_neg)

    def _fit_fold(Xs, ys, ws):
        if model_name == "xgb":
            from ..functions.gbt import HistGBT

            # scale_pos_weight = n_neg/n_pos (pairwise_classifier.py:133);
            # sample weights already balanced, so pass weight via fit
            m = HistGBT(random_state=random_state, **(gbt_params or {}))
            m.fit(Xs, ys, sample_weight=ws)
            return m
        if model_name == "rf":
            from ..functions.rf import HistRandomForest

            m = HistRandomForest(random_state=random_state, **(gbt_params or {}))
            m.fit(Xs, ys, sample_weight=ws)
            return m
        return fit_logreg(Xs, ys, ws)

    folds = _stratified_folds(y, n_folds, random_state)
    oof = np.zeros(n)
    fold_reports = []
    for f in range(n_folds):
        tr = folds != f
        va = ~tr
        scaler = StandardScaler().fit(X[tr])
        fitted = _fit_fold(scaler.transform(X[tr]), y[tr], sample_weight[tr])
        if model_name in ("xgb", "rf"):
            p_va = fitted.predict_proba(scaler.transform(X[va]))
        else:
            coef, b = fitted
            p_va = _sigmoid(scaler.transform(X[va]) @ coef + b)
        oof[va] = p_va
        thr, f1m = select_threshold_by_f1(y[va], p_va)
        fold_reports.append(
            {
                "fold": f + 1,
                "roc_auc": roc_auc(y[va], p_va),
                "pr_auc": average_precision(y[va], p_va),
                "best_thr": thr,
                "f1_at_best": f1m["f1"],
            }
        )

    best_thr, f1m = select_threshold_by_f1(y, oof)
    metrics = {
        "cv_folds": fold_reports,
        "oof_roc_auc": roc_auc(y, oof),
        "oof_pr_auc": average_precision(y, oof),
        "oof_best_thr": best_thr,
        "oof_f1_at_best": f1m["f1"],
        "oof_prec_at_best": f1m["precision"],
        "oof_rec_at_best": f1m["recall"],
        "pos_frac": float(y.mean()),
        "model": model_name,
        "features": list(feature_cols),
    }

    scaler = StandardScaler().fit(X)
    fitted = _fit_fold(scaler.transform(X), y, sample_weight)
    if model_name in ("xgb", "rf"):
        return TrainedMatcher(
            coef=np.zeros(X.shape[1]),
            intercept=0.0,
            scaler=scaler,
            feature_cols=list(feature_cols),
            best_threshold=best_thr,
            metrics=metrics,
            gbt=fitted,
        )
    coef, b = fitted
    return TrainedMatcher(
        coef=coef,
        intercept=b,
        scaler=scaler,
        feature_cols=list(feature_cols),
        best_threshold=best_thr,
        metrics=metrics,
    )


# ---------------------------------------------------------------------------
# distributed scoring (actor pool)
# ---------------------------------------------------------------------------
class ScorerActor:
    """Batch fn: feature columns → + prob_match, pred_match
    (train_classifier.py:24-30 made distributed)."""

    def __init__(self, model_ref):
        self.model: TrainedMatcher = ray.get(model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in self.model.feature_cols]
        )
        prob = self.model.predict_proba_np(X)
        pred = (prob >= self.model.best_threshold).astype(np.int8)
        return batch.append_column("prob_match", pa.array(prob, type=pa.float64())).append_column(
            "pred_match", pa.array(pred, type=pa.int8())
        )


def score_pairs(pair_features_ds: Dataset, model: TrainedMatcher, concurrency=None) -> Dataset:
    """Distributed scoring. Default: elastic tasks with the model fetched once
    per worker process (state/worker_cache). Pass ``concurrency`` to force an
    actor pool (ScorerActor) — useful to bound memory for large models."""
    model_ref = ray.put(model)
    if concurrency is not None:
        return pair_features_ds.map_batches(
            ScorerActor,
            fn_constructor_kwargs={"model_ref": model_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )

    def score(batch: pa.Table, model_ref=model_ref) -> pa.Table:
        from ..state.worker_cache import cached_get

        m: TrainedMatcher = cached_get(model_ref)
        X = np.column_stack([batch[c].to_numpy(zero_copy_only=False) for c in m.feature_cols])
        prob = m.predict_proba_np(X)
        pred = (prob >= m.best_threshold).astype(np.int8)
        return batch.append_column("prob_match", pa.array(prob, type=pa.float64())).append_column(
            "pred_match", pa.array(pred, type=pa.int8())
        )

    return pair_features_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
