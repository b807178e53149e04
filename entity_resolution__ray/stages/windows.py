"""Windowed aggregation over event streams (beyond the reference — part of
the large-scale training-data toolkit; tumbling windows live in the w1 query).

Session windows: per-key event runs separated by gaps larger than
``gap_us``. The partitioning assumption is explicit: sessions never span
keys, so ONE hash shuffle on the key co-locates everything a session needs,
and the per-key work (sort by time, gap cumsum) is vectorized pandas inside
each bucket. Event-time ties are ordered by ``order_col`` so session
numbering is deterministic and matches the SQL gaps-and-islands oracle.

As-of join: each left-type event matched to the most recent right-type event
at-or-before it for the same key — the temporal-join operator Ray Data has no
primitive for. Same partitioning assumption (matches never span keys → one
hash shuffle), and the per-bucket kernel is ``pd.merge_asof`` (a vectorized
galloping merge), not a per-event loop.
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


def hopping_windows(
    events: Dataset,
    size_s: int = 300,
    hop_s: int = 60,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    num_buckets: int = 32,
) -> Dataset:
    """Hopping (sliding) window aggregate: fixed ``size_s``-second windows
    advancing every ``hop_s`` seconds (``size_s`` must be a multiple of
    ``hop_s``), so each event lands in ``k = size_s // hop_s`` overlapping
    windows. Output: (key, window_start, n_events, sum_value) — the third
    window flavour next to tumbling (w1 query) and session windows.

    Scale shape: the k-fold window replication happens INSIDE each map batch
    as a numpy repeat and is immediately collapsed by a per-batch partial
    aggregate over (key, window_start) — the shuffle moves pre-combined
    partial rows (bounded by distinct key×window per batch), never k× the
    event stream. One bucketed shuffle then sums partials. Sums run in
    integer cents (value is 2-decimal) for float-stable oracle parity, as in
    session_windows."""
    if size_s % hop_s != 0:
        raise ValueError(f"size_s ({size_s}) must be a multiple of hop_s ({hop_s})")
    k = size_s // hop_s

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        key_arr = t[key_col]
        if n == 0:
            return pa.table({
                key_col: key_arr,
                "window_start": pa.array([], type=pa.int64()),
                "__n": pa.array([], type=pa.int64()),
                "__cents": pa.array([], type=pa.int64()),
            })
        ts_s = pc.divide(pc.cast(t[ts_col], pa.int64()), 1_000_000).to_numpy()
        base = (ts_s // hop_s) * hop_s
        # event at ts is inside window w iff w <= ts < w + size_s: exactly
        # the k starts base - i*hop for i in 0..k-1 (size_s = k*hop_s)
        win = (base[:, None] - np.arange(k, dtype=np.int64) * hop_s).ravel()
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        cents = np.rint(t[value_col].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        exploded = pa.table({
            key_col: pc.take(key_arr, pa.array(idx)),
            "window_start": pa.array(win, type=pa.int64()),
            "__cents": pa.array(cents[idx], type=pa.int64()),
        })
        out = exploded.group_by([key_col, "window_start"]).aggregate(
            [("__cents", "count"), ("__cents", "sum")]
        )
        return out.rename_columns([key_col, "window_start", "__n", "__cents"])

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([key_col, "window_start"], as_index=False).agg(
            __n=("__n", "sum"), __cents=("__cents", "sum")
        )
        out["n_events"] = out["__n"].astype("int64")
        out["sum_value"] = (out["__cents"] / 100.0).round(4)
        return out[[key_col, "window_start", "n_events", "sum_value"]]

    from .blocking import bucketed_apply

    partials = events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_apply(partials, [key_col, "window_start"], final, num_buckets=num_buckets)


def asof_join_prior(
    events: Dataset,
    left_type: str,
    right_type: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> Dataset:
    """For every ``left_type`` event, the most recent ``right_type`` event of
    the same key with ts ≤ the left ts (backward as-of, exact matches
    allowed). Output: (id, key, ts_us, value, prior_event_id, prior_ts_us,
    prior_value) with nulls where no prior event exists.

    One hash shuffle on ``key_col`` co-locates each key's history; inside a
    bucket ``pd.merge_asof(by=key)`` does the whole match as one galloping
    merge over the bucket's time-sorted rows. Skew note: a key's history must
    fit one bucket task — for planet-hot keys (one user = millions of events)
    pre-split by time range and stitch the boundary, as session_windows would.
    """
    from .blocking import bucketed_apply

    out_cols = [id_col, key_col, "ts_us", value_col,
                "prior_event_id", "prior_ts_us", "prior_value"]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # nullable counterpart keyed off the SOURCE dtype (after the merge
        # an unmatched int column is already float64-with-NaN, so the source
        # is the only reliable signal), keeping block schemas identical
        # whether a bucket had unmatched rows, no left rows, or neither
        id_nullable = pd.api.types.is_integer_dtype(g[id_col])

        def nullable(s: pd.Series, is_int: bool) -> pd.Series:
            return s.astype("Int64") if is_int else s

        left = g[g[type_col] == left_type]
        right = g[g[type_col] == right_type]
        if len(left) == 0:
            # dtypes derived from the ACTUAL columns — hardcoding int64/
            # float64 here produced schema-mismatched blocks whenever a
            # bucket held only right-type rows on non-int64 keyed tables
            return pd.DataFrame({
                id_col: left[id_col],
                key_col: left[key_col],
                "ts_us": left["ts_us"],
                value_col: left[value_col],
                "prior_event_id": nullable(left[id_col], id_nullable),
                "prior_ts_us": nullable(left["ts_us"], True),
                "prior_value": left[value_col],
            })[out_cols]
        left = left.sort_values("ts_us", kind="mergesort")
        # tie-break: among right rows sharing (key, ts), merge_asof keeps the
        # LAST sorted row — sorting by [ts_us, id] makes that the max id,
        # deterministically (block order otherwise decides, flakily)
        right = right.sort_values(["ts_us", id_col], kind="mergesort")[
            [key_col, "ts_us", id_col, value_col]
        ].rename(columns={
            id_col: "prior_event_id", "ts_us": "prior_ts_us", value_col: "prior_value",
        })
        out = pd.merge_asof(
            left[[id_col, key_col, "ts_us", value_col]],
            right,
            left_on="ts_us",
            right_on="prior_ts_us",
            by=key_col,
            direction="backward",
            allow_exact_matches=True,
        )
        out["prior_event_id"] = nullable(out["prior_event_id"], id_nullable)
        out["prior_ts_us"] = nullable(out["prior_ts_us"], True)
        return out[out_cols]

    def to_us(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("ts_us", pc.cast(t[ts_col], pa.int64())).drop_columns([ts_col])

    prepared = events.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_apply(prepared, [key_col], per_bucket, num_buckets=num_buckets)
