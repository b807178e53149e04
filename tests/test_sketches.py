"""HyperLogLog grouped distinct (stages/sketches) vs exact counts: estimator
accuracy across cardinality regimes, partial-merge associativity, and the
Dataset operator end to end."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from entity_resolution__ray.functions.hashing import hash_ints
from entity_resolution__ray.stages.sketches import (
    _hll_estimate, _hll_partial, hll_grouped_distinct)


def _regs_of(vals, p=12):
    keys = np.zeros(len(vals), dtype=np.int64)
    h = hash_ints(np.asarray(vals, dtype=np.int64))
    _, regs = _hll_partial(keys, h, p)
    return regs[0]


def test_hll_estimator_accuracy_across_regimes():
    p = 12
    for n in (10, 150, 3_000, 50_000, 400_000):
        est = _hll_estimate(_regs_of(np.arange(n)), p)
        rel = abs(est - n) / n
        # 1.04/sqrt(4096) ≈ 1.6% std error; 5σ bound with slack for the
        # linear-counting crossover
        assert rel < 0.09, (n, est)


def test_hll_duplicates_do_not_inflate():
    vals = np.repeat(np.arange(500), 50)  # 25k rows, 500 distinct
    est = _hll_estimate(_regs_of(vals), 12)
    assert abs(est - 500) / 500 < 0.05


def test_hll_partial_merge_is_exactly_batch_invariant():
    # the register array from one pass must equal the elementwise max of any
    # split's partials — merge associativity is what makes the shuffle exact
    vals = np.arange(10_000, dtype=np.int64)
    whole = _regs_of(vals)
    a, b, c = _regs_of(vals[:3000]), _regs_of(vals[3000:7000]), _regs_of(vals[7000:])
    merged = np.maximum(np.maximum(a, b), c)
    assert np.array_equal(whole, merged)


def test_hll_grouped_distinct_dataset(ray_session):
    rng = np.random.RandomState(9)
    n = 40_000
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], n),
        "user_id": rng.randint(0, 5_000, n).astype(np.int64),
    })
    out = hll_grouped_distinct(
        rd.from_pandas(df).repartition(8), "event_type", "user_id"
    ).to_pandas().set_index("event_type")["approx_distinct"]
    exact = df.groupby("event_type")["user_id"].nunique()
    for k in exact.index:
        rel = abs(int(out[k]) - int(exact[k])) / int(exact[k])
        assert rel < 0.06, (k, int(out[k]), int(exact[k]))


def test_heavy_hitters_exact_with_forced_truncation(ray_session):
    from entity_resolution__ray.stages.sketches import heavy_hitters

    # vocabulary far above capacity so the MG decrement actually fires,
    # with planted heavy tokens the sketch must never lose
    rng = np.random.RandomState(4)
    rows = []
    for i in range(400):
        toks = [f"n{rng.randint(0, 20_000)}" for _ in range(30)]
        if i % 3 == 0:
            toks += ["hot"] * 10
        if i % 5 == 0:
            toks += ["warm"] * 6
        rng.shuffle(toks)
        rows.append(" ".join(toks))
    ds = rd.from_pandas(pd.DataFrame({"text": rows})).repartition(8)
    out = heavy_hitters(ds, theta=0.02, capacity=256).to_pandas()
    got = dict(zip(out["token"], out["cnt"].astype(int)))

    # exact reference
    from collections import Counter
    import re
    c = Counter()
    for r in rows:
        c.update(re.findall(r"[a-z0-9]+", r.lower()))
    n = sum(c.values())
    want = {t: k for t, k in c.items() if k >= 0.02 * n}
    assert got == want
    assert "hot" in want  # the planted hitters actually qualify


def test_heavy_hitters_fallback_when_capacity_too_small(ray_session):
    from entity_resolution__ray.stages.sketches import heavy_hitters

    # one 'hot' occurrence per batch among hundreds of singletons: the MG
    # decrement erases it from EVERY batch summary, so only the
    # slack-vs-bar completeness guard (exact fallback) can recover it
    rng = np.random.RandomState(13)
    rows = []
    for b in range(64):
        toks = [f"u{b}x{i}" for i in range(600)] + ["hot"]
        rng.shuffle(toks)
        rows.append(" ".join(toks))
    ds = rd.from_pandas(pd.DataFrame({"text": rows})).repartition(64)
    out = heavy_hitters(ds, theta=0.0015, capacity=64).to_pandas()
    got = dict(zip(out["token"], out["cnt"].astype(int)))
    assert got.get("hot") == 64  # true count 64 >= bar ~57.7


def test_approx_grouped_quantiles_rank_error(ray_session):
    from entity_resolution__ray.stages.sketches import approx_grouped_quantiles

    rng = np.random.RandomState(17)
    n = 120_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b"], n),
        "value": rng.lognormal(0.0, 1.5, n),
    })
    out = approx_grouped_quantiles(
        rd.from_pandas(df).repartition(10), "event_type", "value", "event_id",
        qs=(0.25, 0.5, 0.9), k=4096,
    ).to_pandas()
    for key, sub in df.groupby("event_type"):
        vals = np.sort(sub["value"].to_numpy())
        for q in (0.25, 0.5, 0.9):
            est = float(out[(out["event_type"] == key) & (out["q"] == q)]["value"].iloc[0])
            # rank error: position of the estimate within the exact sorted
            # values must be within ~5 sigma of q (sigma ≈ sqrt(q(1-q)/k))
            rank = np.searchsorted(vals, est) / len(vals)
            tol = 5 * np.sqrt(q * (1 - q) / 4096) + 1e-3
            assert abs(rank - q) < tol, (key, q, rank)


def test_approx_grouped_quantiles_deterministic_and_mergeable(ray_session):
    from entity_resolution__ray.stages.sketches import approx_grouped_quantiles

    rng = np.random.RandomState(18)
    n = 20_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": np.repeat("x", n),
        "value": rng.randn(n),
    })
    a = approx_grouped_quantiles(
        rd.from_pandas(df).repartition(3), "event_type", "value", "event_id", k=512
    ).to_pandas().sort_values("q").reset_index(drop=True)
    b = approx_grouped_quantiles(
        rd.from_pandas(df).repartition(17), "event_type", "value", "event_id", k=512
    ).to_pandas().sort_values("q").reset_index(drop=True)
    # bottom-k by id hash is partitioning-invariant: results are IDENTICAL
    assert a["value"].tolist() == b["value"].tolist()
