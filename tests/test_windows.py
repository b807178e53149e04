"""Session-window operator: per-key gap-based sessionization."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from entity_resolution__ray.stages.windows import session_windows


def _events(rows):
    # rows: (event_id, user_id, ts_seconds, value)
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] * 1_000_000 for r in rows], type=pa.timestamp("us")),
        "value": pa.array([float(r[3]) for r in rows], type=pa.float64()),
    }))


def test_session_windows_gap_split(ray_session):
    rows = [
        (0, 1, 0, 1.0), (1, 1, 100, 2.0),        # session 1 of user 1
        (2, 1, 100 + 1801, 3.0),                  # gap > 1800s → session 2
        (3, 2, 50, 4.0),                          # user 2, one session
    ]
    out = (
        session_windows(_events(rows), gap_us=1_800_000_000)
        .to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    assert out[["user_id", "session_id", "n_events"]].values.tolist() == [
        [1, 1, 2], [1, 2, 1], [2, 1, 1]]
    assert out["sum_value"].tolist() == [3.0, 3.0, 4.0]
    assert out.loc[0, "session_start_us"] == 0
    assert out.loc[0, "session_end_us"] == 100_000_000


def test_session_windows_tie_determinism(ray_session):
    # equal timestamps order by event_id — session numbering stays stable
    rows = [(i, 7, 10, 1.0) for i in range(5)]
    out = session_windows(_events(rows)).to_pandas()
    assert len(out) == 1 and out.loc[0, "n_events"] == 5


def test_hopping_windows_membership_and_sums(ray_session):
    from entity_resolution__ray.stages.windows import hopping_windows

    # one event at t=125s with size=300/hop=60 → windows -120, -60, 0, 60, 120
    rows = [(0, 1, 125, 1.5)]
    ev = _events(rows).map_batches(
        lambda t: t.rename_columns(["event_id", "event_type", "ts", "value"]),
        batch_format="pyarrow",
    )
    out = hopping_windows(ev, size_s=300, hop_s=60, key_col="event_type").to_pandas()
    assert sorted(out["window_start"].tolist()) == [-120, -60, 0, 60, 120]
    assert (out["n_events"] == 1).all() and (out["sum_value"] == 1.5).all()


def test_hopping_windows_partial_aggregate_merges(ray_session):
    from entity_resolution__ray.stages.windows import hopping_windows

    # two events in the same hop slot + one in the next; window 60 must see
    # all three (overlap), window 120 only the later one
    rows = [(0, 1, 125, 1.0), (1, 1, 130, 2.0), (2, 1, 185, 4.0)]
    ev = _events(rows).map_batches(
        lambda t: t.rename_columns(["event_id", "event_type", "ts", "value"]),
        batch_format="pyarrow",
    )
    out = hopping_windows(ev, size_s=120, hop_s=60, key_col="event_type").to_pandas()
    w = out.set_index("window_start")
    assert w.loc[60, "n_events"] == 2 and w.loc[60, "sum_value"] == 3.0   # [60,180)
    assert w.loc[120, "n_events"] == 3 and w.loc[120, "sum_value"] == 7.0  # [120,240)
    assert w.loc[180, "n_events"] == 1 and w.loc[180, "sum_value"] == 4.0  # [180,300)


def test_hopping_windows_size_must_divide(ray_session):
    import pytest

    from entity_resolution__ray.stages.windows import hopping_windows

    with pytest.raises(ValueError):
        hopping_windows(_events([]), size_s=100, hop_s=60)


def test_asof_join_prior(ray_session):
    from entity_resolution__ray.stages.windows import asof_join_prior

    rows = [
        # user 1: views at t=10, t=30; purchases at t=5 (no prior), t=20
        # (matches view@10), t=30 (exact match allowed → view@30)
        {"event_id": 1, "user_id": 1, "ts": 10, "event_type": "view", "value": 1.0},
        {"event_id": 2, "user_id": 1, "ts": 30, "event_type": "view", "value": 2.0},
        {"event_id": 3, "user_id": 1, "ts": 5, "event_type": "purchase", "value": 9.0},
        {"event_id": 4, "user_id": 1, "ts": 20, "event_type": "purchase", "value": 8.0},
        {"event_id": 5, "user_id": 1, "ts": 30, "event_type": "purchase", "value": 7.0},
        # user 2's view must never match user 1's purchases
        {"event_id": 6, "user_id": 2, "ts": 1, "event_type": "view", "value": 5.0},
        {"event_id": 7, "user_id": 2, "ts": 9, "event_type": "purchase", "value": 4.0},
    ]
    import pyarrow as pa

    t = pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], type=pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], type=pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], type=pa.timestamp("us")),
        "event_type": [r["event_type"] for r in rows],
        "value": pa.array([r["value"] for r in rows], type=pa.float64()),
    })
    out = (
        asof_join_prior(rd.from_arrow(t), left_type="purchase", right_type="view")
        .to_pandas().set_index("event_id").sort_index()
    )
    assert len(out) == 4
    assert pd.isna(out.loc[3, "prior_event_id"])         # before any view
    assert out.loc[4, "prior_event_id"] == 1             # backward match
    assert out.loc[5, "prior_event_id"] == 2             # exact-ts match allowed
    assert out.loc[7, "prior_event_id"] == 6             # per-key isolation
    assert out.loc[7, "prior_value"] == 5.0


def test_asof_tie_on_right_ts_picks_max_event_id(ray_session):
    """Two right-type events at the SAME (user, ts): the prior must be the
    max event_id among the tied rows, regardless of block order."""
    import pandas as pd

    from entity_resolution__ray.stages.windows import asof_join_prior

    base = pd.Timestamp("2026-01-01 00:00:00")
    for order in ([10, 11], [11, 10]):  # both physical layouts
        df = pd.DataFrame({
            "event_id": order + [50],
            "user_id": [1, 1, 1],
            "ts": [base, base, base + pd.Timedelta(seconds=5)],
            "event_type": ["view", "view", "purchase"],
            "value": [0.1, 0.2, 9.9],
        })
        out = asof_join_prior(
            rd.from_pandas(df).repartition(2), "purchase", "view"
        ).to_pandas()
        assert out["prior_event_id"].tolist() == [11], order


def test_asof_bucket_with_no_left_rows_keeps_schema(ray_session):
    """A key whose bucket holds only right-type events must not produce a
    schema-mismatched empty block (hardcoded dtypes did, on any non-int64
    layout)."""
    import pandas as pd

    from entity_resolution__ray.stages.windows import asof_join_prior

    base = pd.Timestamp("2026-01-01")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 8, 8],             # user 8: views only
        "ts": [base, base + pd.Timedelta(seconds=1), base, base + pd.Timedelta(seconds=1)],
        "event_type": ["view", "purchase", "view", "view"],
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    out = asof_join_prior(rd.from_pandas(df).repartition(2), "purchase", "view").to_pandas()
    assert len(out) == 1 and out["prior_event_id"].tolist() == [1]
