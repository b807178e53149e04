"""Session-window operator: per-key gap-based sessionization."""

import numpy as np
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
