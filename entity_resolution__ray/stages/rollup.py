"""Grouping-sets / ROLLUP aggregation as a pre-aggregated shuffle cascade.

``rollup_aggregate`` computes SQL ``GROUP BY ROLLUP(k1, k2, …)`` — the full
aggregate at every key prefix (finest → … → grand total, coarser levels
carrying NULL in the rolled-up key columns) — the standard warehouse shape
for hierarchical reports (nation → region → world, flag → status → all).

Scale shape: the raw rows are touched ONCE — a per-batch vectorized partial
aggregation at the finest grain inside ``map_batches`` — so the only
all-to-all moves (finest-key-domain × blocks) partial rows, never the fact
table. Every coarser level is then re-aggregated FROM the finest result
(bounded by the key domain, not by row count), so adding levels costs a
cascade of tiny shuffles, not extra passes over the data.

Metrics are summed as exact int64 so results are independent of block
boundaries and summation order (the same currency-cents discipline as
j1_revenue_by_nation in ``__ray_entry__``): callers pass ``sum_int_cols``
mapping output name → an int64-valued expression column they prepared
upstream; ``rollup_aggregate`` emits exact int64 sums plus a row count and
leaves any final /100 style rescale to the caller.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _agg_arrow(t: pa.Table, keys: list, sum_cols: list, count_col: str | None) -> pa.Table:
    """Vectorized partial aggregation via ``pa.Table.group_by`` — the fact
    rows never leave Arrow (a pandas conversion materializes every string
    key as a Python object). ``use_threads=False``: the batch runs inside a
    Ray task that already owns exactly one CPU slot. Null keys form their
    own group (Arrow default), matching ``GROUP BY`` / pandas
    ``dropna=False`` semantics."""
    aggs = [(c, "sum") for c in sum_cols]
    if count_col is not None:
        aggs.append(([], "count_all"))
    g = t.group_by(keys, use_threads=False).aggregate(aggs)
    cols = {k: g[k] for k in keys}
    for c in sum_cols:
        cols[c] = pc.cast(g[f"{c}_sum"], pa.int64())
    if count_col is not None:
        cols[count_col] = pc.cast(g["count_all"], pa.int64())
    return pa.table(cols)


def _key_types(ds: Dataset, keys: list) -> dict:
    """Arrow type of each key column, without executing the dataset. Parquet
    reads expose an Arrow base_schema; pandas-block datasets expose numpy
    dtypes (object → string, the only ambiguous case)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return {k: base.field(k).type for k in keys}
    dtypes = dict(zip(sch.names, getattr(base, "types", [])))

    def to_arrow(dt):
        try:
            return pa.from_numpy_dtype(dt)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    return {k: to_arrow(dtypes[k]) for k in keys}


def rollup_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    sum_int_cols: Sequence[str],
    count_col: str = "n_rows",
    num_buckets: int = 16,
) -> Dataset:
    """``GROUP BY ROLLUP(keys)`` over int64 metric columns (module docstring).

    Returns a Dataset with columns ``keys + sum_int_cols + [count_col]``;
    rolled-up key columns are NULL (typed to the input key type) and every
    level from the finest grain to the grand total is present.
    """
    keys = list(keys)
    sums = list(sum_int_cols)
    if not keys:
        raise ValueError("rollup_aggregate needs at least one key column")
    from .blocking import bucketed_apply

    key_types = _key_types(ds, keys)

    # ---- pass over the raw rows: finest-grain partial agg per batch -------
    partial = ds.map_batches(
        lambda t: _agg_arrow(t, keys, sums, count_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # sum-of-partials is the same re-aggregation shape at every level
    agg_cols = sums + [count_col]

    def combine(t: pa.Table, level_keys: list) -> pa.Table:
        return _agg_arrow(t, level_keys, agg_cols, None)

    # finest feeds every coarser level AND its own widen — materialize the
    # (key-domain-bounded, tiny) table once so the raw-row pass and its
    # shuffle don't lazily re-execute per consumer
    finest = bucketed_apply(
        partial, keys, lambda t: combine(t, keys), num_buckets=num_buckets,
        batch_format="pyarrow",
    ).materialize()

    def widen(level_keys: list):
        """Null-fill the rolled-up key columns so every level unions cleanly."""
        nulled = [k for k in keys if k not in level_keys]

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {k: t[k] for k in level_keys}
            for k in nulled:
                cols[k] = pa.nulls(n, type=key_types[k])
            for c in agg_cols:
                cols[c] = t[c]
            return pa.table({c: cols[c] for c in keys + agg_cols})

        return fn

    levels = [
        finest.map_batches(widen(keys), batch_format="pyarrow", zero_copy_batch=True)
    ]
    for i in range(len(keys) - 1, 0, -1):
        lk = keys[:i]
        lvl = bucketed_apply(
            finest, lk, lambda t, lk=lk: combine(t, lk), num_buckets=min(num_buckets, 8),
            batch_format="pyarrow",
        )
        levels.append(lvl.map_batches(widen(lk), batch_format="pyarrow", zero_copy_batch=True))

    # grand total: one global combine of the (tiny) finest table
    def grand(t: pa.Table) -> pa.Table:
        return pa.table({
            c: pa.array([pc.sum(t[c]).as_py() or 0], type=pa.int64()) for c in agg_cols
        })

    total = finest.map_batches(
        lambda t: t.select(agg_cols), batch_format="pyarrow", zero_copy_batch=True
    ).repartition(1).map_batches(grand, batch_format="pyarrow")
    levels.append(
        total.map_batches(widen([]), batch_format="pyarrow", zero_copy_batch=True)
    )

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def pivot_sum(
    ds: Dataset,
    row_key: str,
    col_key: str,
    value_col: str,
    col_values: Sequence,
    count_col: str = "n_rows",
    num_buckets: int = 16,
) -> Dataset:
    """PIVOT: one output row per ``row_key``, one int64 sum column per value
    of ``col_key`` (named ``{value_col}_{v}``), plus a row count. The column
    domain is EXPLICIT (``col_values``) — the honest contract for a
    distributed pivot, since a dynamic domain needs its own pass; values
    outside the list are ignored. Same shape as rollup_aggregate: vectorized
    finest partial per batch, one tiny (row_key) reduce — the fact rows are
    touched once and never re-shuffled."""
    vals = list(col_values)
    out_cols = [f"{value_col}_{v}" for v in vals]

    def partial(t: pa.Table) -> pa.Table:
        # pre-mask one column per pivot value (value where col_key == v else
        # 0), then ONE Arrow group_by over the fact rows — no pandas pass
        zero = pa.scalar(0, type=pa.int64())
        masked = {row_key: t[row_key]}
        for v, oc in zip(vals, out_cols):
            masked[oc] = pc.if_else(
                pc.equal(t[col_key], v), pc.cast(t[value_col], pa.int64()), zero
            )
        return _agg_arrow(pa.table(masked), [row_key], out_cols, count_col)

    from .blocking import bucketed_apply

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_apply(
        partials,
        [row_key],
        lambda t: _agg_arrow(t, [row_key], out_cols + [count_col], None),
        num_buckets=num_buckets,
        batch_format="pyarrow",
    )
