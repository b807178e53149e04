"""Tests for the numpy pairwise classifier (reference protocol:
models/pairwise_classifier.py)."""

import numpy as np
import pytest

import ray.data as rd

from entity_resolution__ray.stages.classifier import (
    StandardScaler,
    TrainedMatcher,
    average_precision,
    fit_logreg,
    roc_auc,
    score_pairs,
    select_threshold_by_f1,
    train_pairwise_matcher,
)


def _toy_data(n=400, seed=0):
    rng = np.random.RandomState(seed)
    y = (rng.rand(n) < 0.3).astype(np.float64)
    # separable-ish features: positives high, negatives low, with noise
    X = rng.randn(n, 8) * 0.3 + y[:, None] * 1.5
    return X, y


def test_roc_auc_perfect_and_random():
    y = np.array([0, 0, 1, 1], dtype=float)
    assert roc_auc(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert roc_auc(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert roc_auc(y, np.array([0.5, 0.5, 0.5, 0.5])) == 0.5


def test_select_threshold_by_f1_perfect_separation():
    y = np.array([0, 0, 0, 1, 1], dtype=float)
    p = np.array([0.1, 0.2, 0.3, 0.8, 0.9])
    thr, m = select_threshold_by_f1(y, p)
    assert m["f1"] == 1.0
    assert 0.3 < thr <= 0.8


def test_select_threshold_handles_ties():
    y = np.array([0, 1, 1], dtype=float)
    p = np.array([0.5, 0.5, 0.9])
    thr, m = select_threshold_by_f1(y, p)
    assert 0 < thr <= 0.9
    preds = (p >= thr).astype(int)
    assert m["precision"] == pytest.approx(
        preds[y == 1].sum() / max(preds.sum(), 1)
    )


def test_scaler():
    X = np.array([[1.0, 2.0], [3.0, 2.0]])
    s = StandardScaler().fit(X)
    Xs = s.transform(X)
    np.testing.assert_allclose(Xs.mean(axis=0), 0.0, atol=1e-12)
    # constant column: scale forced to 1 → stays 0
    np.testing.assert_allclose(Xs[:, 1], 0.0)


def test_fit_logreg_separates():
    X, y = _toy_data()
    w = np.ones(len(y))
    coef, b = fit_logreg(X, y, w)
    p = 1 / (1 + np.exp(-(X @ coef + b)))
    assert roc_auc(y, p) > 0.95


def test_train_pairwise_matcher_protocol():
    X, y = _toy_data()
    tm = train_pairwise_matcher(X, y)
    assert tm.metrics["oof_roc_auc"] > 0.9
    assert 0.0 < tm.best_threshold < 1.0
    assert len(tm.metrics["cv_folds"]) == 5
    # determinism
    tm2 = train_pairwise_matcher(X, y)
    np.testing.assert_allclose(tm.coef, tm2.coef)
    assert tm.best_threshold == tm2.best_threshold


def test_train_is_noise_robust_on_separable_data():
    rng = np.random.RandomState(1)
    y = (rng.rand(600) < 0.5).astype(np.float64)
    X = y[:, None] * 2.0 + rng.randn(600, 8) * 0.1
    tm = train_pairwise_matcher(X, y)
    assert tm.metrics["oof_f1_at_best"] > 0.99


def test_scorer_actor_stage(ray_session):
    X, y = _toy_data(n=200)
    tm = train_pairwise_matcher(X, y)
    from entity_resolution__ray.schema import FEATURE_COLS

    rows = [{c: float(X[i, j]) for j, c in enumerate(FEATURE_COLS)} for i in range(50)]
    ds = rd.from_items(rows)
    out = score_pairs(ds, tm).to_pandas()
    assert "prob_match" in out and "pred_match" in out
    want = tm.predict_proba_np(X[:50])
    got = out["prob_match"].to_numpy()
    np.testing.assert_allclose(np.sort(got), np.sort(want), atol=1e-9)


def test_rf_family_trains_and_separates():
    X, y = _toy_data()
    tm = train_pairwise_matcher(
        X, y, model_name="rf", gbt_params={"n_estimators": 50, "max_depth": 8}
    )
    assert tm.gbt is not None
    assert tm.metrics["model"] == "rf"
    assert tm.metrics["oof_roc_auc"] > 0.9
    p = tm.predict_proba_np(X)
    assert roc_auc(y, p) > 0.95
    assert np.all((p >= 0.0) & (p <= 1.0))


def test_rf_deterministic_and_picklable():
    import pickle

    X, y = _toy_data(n=200, seed=3)
    tm1 = train_pairwise_matcher(X, y, model_name="rf", gbt_params={"n_estimators": 20})
    tm2 = train_pairwise_matcher(X, y, model_name="rf", gbt_params={"n_estimators": 20})
    np.testing.assert_allclose(tm1.predict_proba_np(X), tm2.predict_proba_np(X))
    rt = pickle.loads(pickle.dumps(tm1))
    np.testing.assert_allclose(rt.predict_proba_np(X), tm1.predict_proba_np(X))


def test_unknown_model_raises():
    X, y = _toy_data(n=100)
    with pytest.raises(ValueError, match="logreg | rf | xgb"):
        train_pairwise_matcher(X, y, model_name="svm")
