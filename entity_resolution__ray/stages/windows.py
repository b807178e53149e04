"""Windowed aggregation over event streams (beyond the reference — part of
the large-scale training-data toolkit; tumbling windows live in the w1 query).

Session windows: per-key event runs separated by gaps larger than
``gap_us``. The partitioning assumption is explicit: sessions never span
keys, so ONE hash shuffle on the key co-locates everything a session needs,
and the per-key work (sort by time, gap cumsum) is vectorized pandas inside
each bucket. Event-time ties are ordered by ``order_col`` so session
numbering is deterministic and matches the SQL gaps-and-islands oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def session_windows(
    events: Dataset,
    gap_us: int = 1_800_000_000,  # 30 min
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    num_buckets: int = 64,
) -> Dataset:
    """(key, session_id, session_start_us, session_end_us, n_events,
    sum_value): a new session starts when the gap to the previous event of
    the same key exceeds ``gap_us``. session_id is 1-based per key in time
    order."""
    from .blocking import bucketed_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                key_col: pd.Series(dtype=g[key_col].dtype if key_col in g else np.int64),
                "session_id": pd.Series(dtype=np.int64),
                "session_start_us": pd.Series(dtype=np.int64),
                "session_end_us": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
                "sum_value": pd.Series(dtype=np.float64),
            })
        g = g.sort_values([key_col, "ts_us", order_col], kind="mergesort")
        new_key = g[key_col].ne(g[key_col].shift())
        gap = g["ts_us"].diff()
        new_sess = (new_key | (gap > gap_us)).to_numpy()
        sess_global = np.cumsum(new_sess)
        g = g.assign(__sess=sess_global)
        # value is 2-decimal; sum in integer cents for float-stable parity
        g = g.assign(__cents=(g[value_col] * 100).round().astype("int64"))
        out = g.groupby([key_col, "__sess"], as_index=False, sort=False).agg(
            session_start_us=("ts_us", "min"),
            session_end_us=("ts_us", "max"),
            n_events=("ts_us", "size"),
            __cents=("__cents", "sum"),
        )
        out["sum_value"] = (out["__cents"] / 100.0).round(4)
        # renumber 1..k per key in time order
        out = out.sort_values([key_col, "session_start_us"], kind="mergesort")
        out["session_id"] = out.groupby(key_col, sort=False).cumcount() + 1
        return out[[key_col, "session_id", "session_start_us", "session_end_us",
                    "n_events", "sum_value"]]

    def to_us(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("ts_us", pc.cast(t[ts_col], pa.int64())).drop_columns([ts_col])

    prepared = events.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_apply(prepared, [key_col], per_bucket, num_buckets=num_buckets)
