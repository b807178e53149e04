"""Distributed interval join + running aggregate (stages/intervals) vs
brute-force references, including bin-edge and negative-value cases."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from entity_resolution__ray.stages.intervals import (
    _lex_rank_points, interval_join, running_aggregate)


def test_lex_rank_points_tie_rules():
    # points sorted under (k, ts): (0,5) (0,7) (1,5)
    pk = np.array([0, 0, 1]); pt = np.array([5, 7, 5])
    qk = np.array([0, 0, 0, 1, 1]); qt = np.array([5, 6, 8, 5, 9])
    ranks, order = _lex_rank_points((pk, pt), (qk, qt))
    # 'left' semantics: a point equal to the bound is NOT before it
    assert ranks.tolist() == [0, 1, 2, 2, 3]
    assert order.tolist() == [0, 1, 2]


def _brute_interval_join(idf, pdf, key, start, end, ts):
    rows = []
    for _, i in idf.iterrows():
        m = pdf[(pdf[key] == i[key]) & (pdf[ts] >= i[start]) & (pdf[ts] < i[end])]
        for _, p in m.iterrows():
            rows.append((i["anchor_id"], p["event_id"]))
    return sorted(rows)


def test_interval_join_matches_brute_force(ray_session):
    rng = np.random.RandomState(3)
    n_i, n_p = 120, 800
    H = 3_600_000_000
    idf = pd.DataFrame({
        "anchor_id": np.arange(n_i, dtype=np.int64),
        "user_id": rng.randint(0, 12, n_i).astype(np.int64),
        "start_us": rng.randint(0, 40 * H, n_i).astype(np.int64),
    })
    # spans from sub-bin to multi-bin
    idf["end_us"] = idf["start_us"] + rng.randint(1, 5 * H, n_i)
    pdf = pd.DataFrame({
        "event_id": np.arange(n_p, dtype=np.int64),
        "user_id": rng.randint(0, 12, n_p).astype(np.int64),
        "ts_us": rng.randint(0, 45 * H, n_p).astype(np.int64),
    })
    out = interval_join(
        rd.from_pandas(idf), rd.from_pandas(pdf),
        key_col="user_id", start_col="start_us", end_col="end_us", ts_col="ts_us",
        interval_cols=("anchor_id",), point_cols=("event_id",),
        bin_us=H, num_buckets=8,
    ).to_pandas()
    got = sorted(zip(out["anchor_id"].astype(int), out["event_id"].astype(int)))
    want = _brute_interval_join(idf, pdf, "user_id", "start_us", "end_us", "ts_us")
    assert got == want
    assert len(want) > 0


def test_interval_join_bin_edges(ray_session):
    H = 100
    # interval ending exactly on a bin edge must not match a point at the edge
    idf = pd.DataFrame({"anchor_id": [0, 1], "k": [1, 1],
                        "s": [0, 100], "e": [100, 250]})
    pdf = pd.DataFrame({"event_id": [10, 11, 12, 13], "k": [1, 1, 1, 2],
                        "t": [99, 100, 249, 150]})
    out = interval_join(
        rd.from_pandas(idf.astype(np.int64)), rd.from_pandas(pdf.astype(np.int64)),
        key_col="k", start_col="s", end_col="e", ts_col="t",
        interval_cols=("anchor_id",), point_cols=("event_id",),
        bin_us=H, num_buckets=4,
    ).to_pandas()
    got = sorted(zip(out["anchor_id"].astype(int), out["event_id"].astype(int)))
    # anchor 0: [0,100) → only t=99. anchor 1: [100,250) → t=100, 249.
    # key 2's t=150 never matches.
    assert got == [(0, 10), (1, 11), (1, 12)]


def test_running_aggregate_matches_window_sql(ray_session):
    rng = np.random.RandomState(5)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 9, n).astype(np.int64),
        "ts": rng.randint(0, 10_000, n).astype(np.int64),
        # negative values exercise the segmented-base path
        "value": np.round(rng.randn(n) * 10, 4),
    })
    out = running_aggregate(
        rd.from_pandas(df), key_col="user_id", ts_col="ts",
        value_col="value", order_col="event_id", num_buckets=8,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    want = df.sort_values(["user_id", "ts", "event_id"]).copy()
    want["running_sum"] = want.groupby("user_id")["value"].cumsum()
    want = want.sort_values("event_id").reset_index(drop=True)
    assert out["event_id"].tolist() == want["event_id"].tolist()
    assert np.allclose(out["running_sum"], want["running_sum"], atol=1e-6)


def test_interval_join_malformed_interval_matches_nothing(ray_session):
    # end < start must behave like SQL BETWEEN on an empty range (no crash)
    idf = pd.DataFrame({"anchor_id": [0, 1], "k": [1, 1],
                        "s": [100, 10], "e": [50, 60]}).astype(np.int64)
    pdf = pd.DataFrame({"event_id": [7, 8], "k": [1, 1],
                        "t": [70, 20]}).astype(np.int64)
    out = interval_join(
        rd.from_pandas(idf), rd.from_pandas(pdf),
        key_col="k", start_col="s", end_col="e", ts_col="t",
        interval_cols=("anchor_id",), point_cols=("event_id",),
        bin_us=1000, num_buckets=2,
    ).to_pandas()
    got = sorted(zip(out["anchor_id"].astype(int), out["event_id"].astype(int)))
    assert got == [(1, 8)]  # only the well-formed interval matches


def test_interval_join_preserves_int64_precision(ray_session):
    # nanosecond-epoch-scale int64 values (> 2^53) must not round through
    # float64: two points 1ns on either side of a bound
    base = 1_700_000_000_000_000_000
    idf = pd.DataFrame({"anchor_id": [0], "k": [1],
                        "s": [base], "e": [base + 2]}).astype(np.int64)
    pdf = pd.DataFrame({"event_id": [1, 2, 3], "k": [1, 1, 1],
                        "t": [base - 1, base, base + 2]}).astype(np.int64)
    out = interval_join(
        rd.from_pandas(idf), rd.from_pandas(pdf),
        key_col="k", start_col="s", end_col="e", ts_col="t",
        interval_cols=("anchor_id",), point_cols=("event_id",),
        bin_us=1_000_000, num_buckets=2,
    ).to_pandas()
    assert sorted(out["event_id"].astype(int)) == [2]
