"""Distributed interval (range) join and per-key running aggregates.

Both are operators Ray Data has no primitive for (beyond the reference, whose
pipelines are single-table — part of the large-scale training-data toolkit
alongside ``windows.py``).

Interval join — ``points.ts ∈ [interval.start, interval.end)`` for equal
keys — has the classic distributed shape: pick a time-bin width ``W``, copy
each interval into every bin it overlaps (replication factor
``span/W + 1`` — pick ``W`` near the typical interval length; the factor is
logged), assign each point to exactly ONE bin (``floor(ts/W)``), and hash-
shuffle both sides on (key, bin). A point can only match interval copies in
its own bin, so no cross-copy duplicates exist and no dedup pass is needed.
Inside each bucket the match is a fully vectorized lexicographic-rank merge
(no per-key loop): rank every interval bound among the points under the
order (bin, key, ts) — the difference of the two ranks counts (and locates,
since the points are sorted in that same order) exactly the same-(bin,key)
points inside the bound pair.

Partitioning assumptions (documented per the north rule): matches never span
keys, and interval length is bounded (long intervals replicate to many bins;
at 100 TB pick ``bin_us`` so the p99 interval spans ≤ a few bins).

Running aggregate — ``SUM(value) OVER (PARTITION BY key ORDER BY ts, id)``
— needs one hash shuffle on the key (runs never span keys) and a per-bucket
sort + segmented cumulative sum, all numpy. Sums are taken in scaled int64
(value is ≤4-decimal in the events table) so results are exact and stable
against the SQL oracle's float accumulation.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

logger = logging.getLogger(__name__)


def _lex_rank_points(sort_keys_points, sort_keys_queries):
    """For each query, the number of points strictly lexicographically before
    it, with queries ordered BEFORE points on full ties (i.e. 'left' bound
    semantics: a point exactly equal to the query bound is NOT counted).

    ``sort_keys_*``: sequence of equal-length numpy arrays, MOST significant
    first. Returns (ranks, order_of_points) where ``order_of_points`` is the
    argsort of the points under the same lexicographic order — callers use it
    to map rank ranges back to point rows."""
    n_p = len(sort_keys_points[0])
    n_q = len(sort_keys_queries[0])
    tag = np.concatenate([np.ones(n_p, dtype=np.int8), np.zeros(n_q, dtype=np.int8)])
    merged = [np.concatenate([p, q]) for p, q in zip(sort_keys_points, sort_keys_queries)]
    # np.lexsort: LAST key is most significant; tie-break tag puts queries first
    order = np.lexsort((tag, *merged[::-1]))
    is_point = tag[order] == 1
    # rank of each merged position = points seen before it
    pts_before = np.cumsum(is_point) - is_point
    ranks = np.empty(n_q, dtype=np.int64)
    q_positions = order[~is_point] - n_p  # original query indices
    ranks[q_positions] = pts_before[~is_point]
    point_order = order[is_point]  # indices into the points arrays, lex-sorted
    return ranks, point_order


def interval_join(
    intervals: Dataset,
    points: Dataset,
    key_col: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    interval_cols: tuple = (),
    point_cols: tuple = (),
    bin_us: int = 3_600_000_000,  # 1 hour
    num_buckets: int = 64,
) -> Dataset:
    """Inner join: one output row per (interval, point) pair with equal
    ``key_col`` and ``start <= ts < end``. ``start/end/ts`` are int64
    microseconds (cast timestamps upstream). Output columns:
    ``interval_cols + point_cols`` (names must not collide).

    Scale shape: see module docstring. ``bin_us`` trades interval replication
    (long intervals, small bins) against bucket skew (short bins pack fewer
    points per (key, bin))."""
    from .blocking import bucketed_apply

    icols = [key_col, start_col, end_col, *interval_cols]
    pcols = [key_col, ts_col, *point_cols]

    def explode_intervals(t: pa.Table) -> pa.Table:
        t = t.select(icols)
        if t.num_rows == 0:
            return t.append_column("__bin", pa.array([], type=pa.int64()))
        s = t[start_col].combine_chunks().to_numpy(zero_copy_only=False)
        e = t[end_col].combine_chunks().to_numpy(zero_copy_only=False)
        b0 = s // bin_us
        # end is exclusive: an interval ending exactly on a bin edge does not
        # reach into that bin
        b1 = np.maximum((e - 1) // bin_us, b0)
        nbins = (b1 - b0 + 1).astype(np.int64)
        repl = float(nbins.mean()) if len(nbins) else 0.0
        if repl > 8.0:
            logger.warning(
                "interval_join: mean bin replication %.1f (max %d) — raise "
                "bin_us toward the typical interval length", repl, int(nbins.max()),
            )
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), nbins)
        offs = np.arange(int(nbins.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(nbins) - nbins, nbins)
        out = t.take(pa.array(idx))
        return out.append_column("__bin", pa.array(np.repeat(b0, nbins) + offs))

    def bin_points(t: pa.Table) -> pa.Table:
        t = t.select(pcols)
        ts = t[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("__bin", pa.array((ts // bin_us).astype(np.int64)))

    left = intervals.map_batches(explode_intervals, batch_format="pyarrow",
                                 zero_copy_batch=True)
    right = points.map_batches(bin_points, batch_format="pyarrow", zero_copy_batch=True)

    # union with a side tag; schemas are aligned by padding the other side's
    # payload columns with nulls
    def tag(side: int, schema_cols):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays, names = [], []
            for name, typ in schema_cols:
                if name in t.column_names:
                    arrays.append(t[name])
                else:
                    arrays.append(pa.nulls(n, type=typ))
                names.append(name)
            arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
            names.append("__side")
            return pa.table(dict(zip(names, arrays)))
        return fn

    l_schema = left.schema()
    r_schema = right.schema()
    all_cols = []
    seen = set()
    for sch in (l_schema, r_schema):
        for name, typ in zip(sch.names, sch.types):
            if name not in seen:
                seen.add(name)
                all_cols.append((name, typ))
    both = left.map_batches(tag(0, all_cols), batch_format="pyarrow").union(
        right.map_batches(tag(1, all_cols), batch_format="pyarrow"))

    out_names = [*interval_cols, *point_cols]

    def join_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({
            name: pa.array([], type=dict(all_cols)[name]) for name in out_names
        })
        if g.num_rows == 0:
            return empty
        side = g["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        keys = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        bins = g["__bin"].combine_chunks().to_numpy(zero_copy_only=False)
        is_p = side == 1
        if not is_p.any() or is_p.all():
            return empty
        p_idx = np.nonzero(is_p)[0]
        i_idx = np.nonzero(~is_p)[0]
        # slice each side's rows BEFORE to_numpy: the union pads the other
        # side's columns with nulls, and an int64 Arrow column WITH nulls
        # converts to float64 (silent precision loss above 2^53)
        def _side_ints(col_name, rows):
            arr = pc.take(g[col_name].combine_chunks(), pa.array(rows))
            return arr.to_numpy(zero_copy_only=False).astype(np.int64)

        p_ts = _side_ints(ts_col, p_idx)
        i_start = _side_ints(start_col, i_idx)
        i_end = _side_ints(end_col, i_idx)
        pk, pb = keys[p_idx], bins[p_idx]
        ik, ib = keys[i_idx], bins[i_idx]
        # rank BOTH bound sets in one merged lexsort (the points sort is the
        # dominant cost; two separate calls would pay it twice)
        n_i = len(i_idx)
        ranks, p_order = _lex_rank_points(
            (pb, pk, p_ts),
            (np.concatenate([ib, ib]), np.concatenate([ik, ik]),
             np.concatenate([i_start, i_end])))
        lo, hi = ranks[:n_i], ranks[n_i:]
        # malformed intervals (end < start) match nothing, like SQL BETWEEN
        cnt = np.maximum(hi - lo, 0)
        tot = int(cnt.sum())
        if tot == 0:
            return empty
        rep_i = np.repeat(np.arange(len(i_idx), dtype=np.int64), cnt)
        flat = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt) \
            + np.repeat(lo, cnt)
        rep_p = p_order[flat]  # positions within p_idx ordering? p_order indexes points arrays
        rows_i = pa.array(i_idx[rep_i])
        rows_p = pa.array(p_idx[rep_p])
        cols = {}
        for name in interval_cols:
            cols[name] = pc.take(g[name], rows_i)
        for name in point_cols:
            cols[name] = pc.take(g[name], rows_p)
        return pa.table(cols)

    return bucketed_apply(both, [key_col, "__bin"], join_bucket,
                          num_buckets=num_buckets, batch_format="pyarrow")


def running_aggregate(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    out_col: str = "running_sum",
    value_scale: int = 10_000,
    num_buckets: int = 64,
) -> Dataset:
    """Per-key running sum ordered by (ts, order_col) — the
    ``SUM(value) OVER (PARTITION BY key ORDER BY ts, id)`` window as one hash
    shuffle + vectorized segmented cumsum. Output: (order_col, key_col,
    out_col). ``value_scale`` is the decimal scaling for exact integer
    accumulation (10_000 for the 4-decimal events values)."""
    from .blocking import bucketed_apply

    def to_us(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            t = t.set_column(t.schema.get_field_index(ts_col), ts_col,
                             pc.cast(ts, pa.int64()))
        return t.select([key_col, ts_col, value_col, order_col])

    prepared = events.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(g: pa.Table) -> pa.Table:
        key_t = g.schema.field(key_col).type
        ord_t = g.schema.field(order_col).type
        if g.num_rows == 0:
            return pa.table({
                order_col: pa.array([], type=ord_t),
                key_col: pa.array([], type=key_t),
                out_col: pa.array([], type=pa.float64()),
            })
        keys = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        oid = g[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        val = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oid, ts, keys))
        k_s, v_s = keys[order], val[order]
        scaled = np.round(v_s * value_scale).astype(np.int64)
        csum = np.cumsum(scaled)
        seg_start = np.ones(len(k_s), dtype=bool)
        seg_start[1:] = k_s[1:] != k_s[:-1]
        starts = np.nonzero(seg_start)[0]
        sizes = np.diff(np.append(starts, len(k_s)))
        # subtract the cumulative total BEFORE each segment (explicit repeat —
        # values may be negative, so csum is not monotone)
        seg_base = np.zeros(len(starts), dtype=np.int64)
        seg_base[1:] = csum[starts[1:] - 1]
        run = csum - np.repeat(seg_base, sizes)
        return pa.table({
            order_col: pc.take(g[order_col], pa.array(order)),
            key_col: pc.take(g[key_col], pa.array(order)),
            out_col: pa.array(run / float(value_scale)),
        })

    return bucketed_apply(prepared, [key_col], per_bucket,
                          num_buckets=num_buckets, batch_format="pyarrow")
