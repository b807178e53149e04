"""Pair-side lookups (J1): attach per-doc columns onto pair rows for both
endpoints.

Reference analogue: dict-based id→text mapping (common_methods.py:21-34,
run_blocking.py:71-76, apply_transitivity.py:99-105).

Two modes:
  * ``broadcast`` — ``ray.put`` one Arrow projection of the doc table; every
    actor builds a hash map once in ``__init__`` and looks up per batch. No
    shuffle. Right whenever the projection fits the object store (id→text of
    even 10^9 docs ≈ tens of GB — per-partition-pruned broadcast or join
    beyond that).
  * ``join`` — two distributed hash joins (``Dataset.join``) keyed on
    id_left / id_right. The 10^12-doc path; shuffles both sides.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..functions.hashing import bucket_ids


# ---------------------------------------------------------------------------
# bucketed hash join (union + groupby cogroup)
# ---------------------------------------------------------------------------
# ``Dataset.join`` in Ray 2.49 builds ZERO-COLUMN empty tables for hash
# partitions that receive no blocks (join.py finalize → ArrowBlockBuilder()
# .build() with no schema), so any join whose key space is sparse relative to
# num_partitions fails with "No match ... for key field". This engine instead
# expresses a distributed hash join as: tag both sides, bucket by key hash,
# union, groupby(bucket), Acero hash join inside each co-grouped bucket —
# the exact same shuffle movement, no empty-partition failure mode, and
# explicit control over bucket count (and bucket-level salting if a key is
# hot). Nested payload columns ride behind a row index (see merge()).
def _bucket_column(t: pa.Table, keys: Sequence[str], num_buckets: int) -> pa.Array:
    return bucket_ids(t, keys, num_buckets)


def _arrow_schema(ds: Dataset) -> pa.Schema:
    """Dataset schema as a real pyarrow.Schema (ray's wrapper may carry Python
    types for datasets created via from_items)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    # non-arrow (e.g. from_items) — infer from one real batch; such datasets
    # are already materialized so this does not re-execute a long pipeline
    sample = ds.take_batch(1, batch_format="pyarrow")
    return sample.schema


def hash_join_schema(lschema: pa.Schema, rschema: pa.Schema, on: Sequence[str]) -> pa.Schema:
    """Output schema of :func:`hash_join` for the given input schemas —
    lets callers chain joins over LAZY datasets without any schema probe."""
    keys = list(on)
    lonly = [c for c in lschema.names if c not in keys]
    ronly = [c for c in rschema.names if c not in keys]
    return pa.schema(
        [lschema.field(c) for c in keys]
        + [lschema.field(c) for c in lonly]
        + [rschema.field(c) for c in ronly]
    )


def hash_join(
    left: Dataset,
    right: Dataset,
    on: Sequence[str],
    num_partitions: int = 16,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> Dataset:
    """Distributed hash join on equally-named key columns. Non-key column
    names must be disjoint between the two sides.

    Pass ``left_schema`` / ``right_schema`` when an input is a LAZY pipeline:
    without them the schema probe (``ds.schema()``) executes the upstream
    plan — and any all-to-all stage in it (sort, groupby, repartition) runs
    in FULL just to type the columns, so a chain of two joins re-executes
    its upstream three times (measured 3× blocking passes in the forced-join
    er_clusters run). Declared column ORDER need not match the physical
    blocks — columns are aligned by name; only names and types matter."""
    keys = list(on)
    lschema = left_schema if left_schema is not None else _arrow_schema(left)
    rschema = right_schema if right_schema is not None else _arrow_schema(right)
    lonly = [c for c in lschema.names if c not in keys]
    ronly = [c for c in rschema.names if c not in keys]
    overlap = set(lonly) & set(ronly)
    if overlap:
        raise ValueError(f"non-key column collision: {overlap}")
    ltypes = {c: lschema.field(c).type for c in lonly}
    rtypes = {c: rschema.field(c).type for c in ronly}

    def pad_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__bucket", _bucket_column(t, keys, num_partitions))
        t = t.append_column("__side", pa.array([0] * t.num_rows, type=pa.int8()))
        for c in ronly:
            t = t.append_column(c, pa.nulls(t.num_rows, type=rtypes[c]))
        return t

    def pad_right(t: pa.Table) -> pa.Table:
        t = t.append_column("__bucket", _bucket_column(t, keys, num_partitions))
        t = t.append_column("__side", pa.array([1] * t.num_rows, type=pa.int8()))
        for c in lonly:
            t = t.append_column(c, pa.nulls(t.num_rows, type=ltypes[c]))
        return t

    col_order = keys + lonly + ronly + ["__bucket", "__side"]
    lt = left.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True).select_columns(col_order)
    rt = right.map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True).select_columns(col_order)
    u = lt.union(rt)

    out_schema = hash_join_schema(lschema, rschema, keys)

    join_type = {"inner": "inner", "left": "left outer", "right": "right outer",
                 "outer": "full outer"}[how]
    # Acero's hash join rejects nested payload types (list/struct) — nested
    # columns sit out of the join behind an int64 row index and are gathered
    # back afterwards (one `take` per nested column; null index → null row,
    # which is exactly the outer-join fill). Everything stays Arrow-native —
    # the previous pandas fallback materialized every list element as a
    # Python object.
    l_nested = [c for c in lonly if pa.types.is_nested(ltypes[c])]
    r_nested = [c for c in ronly if pa.types.is_nested(rtypes[c])]
    l_flat = [c for c in lonly if c not in l_nested]
    r_flat = [c for c in ronly if c not in r_nested]

    def merge(group: pa.Table) -> pa.Table:
        # Arrow-native per-bucket join (Acero hash join) — no pandas
        # object-materialization round trip for the string key/value columns
        lg = group.filter(pc.equal(group["__side"], 0)).select(keys + lonly)
        rg = group.filter(pc.equal(group["__side"], 1)).select(keys + ronly)
        if not l_nested and not r_nested:
            m = lg.join(rg, keys=keys, join_type=join_type)
        else:
            lj = lg.select(keys + l_flat).append_column(
                "__lidx", pa.array(np.arange(lg.num_rows, dtype=np.int64)))
            rj = rg.select(keys + r_flat).append_column(
                "__ridx", pa.array(np.arange(rg.num_rows, dtype=np.int64)))
            m = lj.join(rj, keys=keys, join_type=join_type)
            for c in l_nested:
                m = m.append_column(c, pc.take(lg[c].combine_chunks(), m["__lidx"]))
            for c in r_nested:
                m = m.append_column(c, pc.take(rg[c].combine_chunks(), m["__ridx"]))
            m = m.drop_columns(["__lidx", "__ridx"])
        # enforce the declared schema so every block (incl. empty buckets)
        # is arrow with identical types
        return m.select(out_schema.names).cast(out_schema)

    return u.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# J4: broadcast semi/anti join on a (small) key set
# ---------------------------------------------------------------------------
def broadcast_anti_join(ds: Dataset, keys: set, on: Sequence[str], semi: bool = False) -> Dataset:
    """Drop (anti) or keep (semi) rows whose key tuple is in the broadcast
    set — the reference's prune-dict filter (apply_constraints.py:44-53)
    without a driver-side mask loop. ``keys`` = set of tuples (or scalars for
    a single key column)."""
    import ray as _ray

    keys_ref = _ray.put(keys)
    cols = list(on)

    def filt(t: pa.Table, ref=keys_ref) -> pa.Table:
        import numpy as np
        import pandas as pd

        from ..state.worker_cache import cached_get

        keyset = cached_get(ref)
        if len(cols) == 1:
            col = pd.Series(t[cols[0]].to_numpy(zero_copy_only=False))
            hit = col.isin(keyset).to_numpy(dtype=bool)
        else:
            idx = pd.MultiIndex.from_arrays(
                [t[c].to_numpy(zero_copy_only=False) for c in cols]
            )
            hit = idx.isin(keyset)
        mask = hit if semi else ~hit
        return t.filter(pa.array(mask))

    # small picklable closure → elastic tasks (no pool spin-up); the key set
    # is resolved once per worker via the worker cache
    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def distributed_anti_join(
    left: Dataset,
    right: Dataset,
    on: Sequence[str],
    semi: bool = False,
    num_partitions: int = 32,
) -> Dataset:
    """Rows of ``left`` with no (anti) / at least one (semi) key match in
    ``right`` — the beyond-broadcast counterpart of
    :func:`broadcast_anti_join`: the right key set is NEVER collected to the
    driver. Both sides are pre-projected to distinct keys per batch (right)
    and hash-shuffled ONCE on the key; each bucket filters its left rows with
    one vectorized ``is_in`` against the bucket-local right keys. Equal keys
    always co-locate, so the filter is exact at any scale."""
    cols = list(on)
    lschema = _arrow_schema(left)
    ltypes = {c: lschema.field(c).type for c in lschema.names}

    def pad_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__bucket", _bucket_column(t, cols, num_partitions))
        return t.append_column("__side", pa.array([0] * t.num_rows, type=pa.int8()))

    def pad_right(t: pa.Table) -> pa.Table:
        # distinct keys per batch: bounds the shuffled right volume by
        # distinct keys per block, not right rows
        t = t.select(cols).group_by(cols).aggregate([])
        for c in lschema.names:
            if c not in cols:
                t = t.append_column(c, pa.nulls(t.num_rows, type=ltypes[c]))
        t = t.append_column("__bucket", _bucket_column(t, cols, num_partitions))
        return t.append_column("__side", pa.array([1] * t.num_rows, type=pa.int8()))

    col_order = lschema.names + ["__bucket", "__side"]
    lt = left.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True).select_columns(col_order)
    rt = right.map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True).select_columns(col_order)
    u = lt.union(rt)
    out_schema = pa.schema([lschema.field(c) for c in lschema.names])

    def filt(group: pa.Table) -> pa.Table:
        lg = group.filter(pc.equal(group["__side"], 0))
        rg = group.filter(pc.equal(group["__side"], 1))
        if len(cols) == 1:
            hit = pc.fill_null(
                pc.is_in(lg[cols[0]], value_set=rg[cols[0]].combine_chunks()), False
            )
            mask = hit if semi else pc.invert(hit)
        else:
            from ..functions.hashing import hash_columns

            lh = hash_columns(lg, cols)
            rh = hash_columns(rg, cols)
            hit = np.isin(lh, rh)
            mask = pa.array(hit if semi else ~hit)
        return lg.select(out_schema.names).filter(mask).cast(out_schema)

    return u.groupby("__bucket").map_groups(filt, batch_format="pyarrow")


def attach_doc_columns(
    pairs: Dataset,
    norm_docs: Dataset,
    columns: Dict[str, Tuple[str, str]],
    mode: str = "broadcast",
    num_partitions: int = 32,
    concurrency=(1, 8),
    pairs_schema: pa.Schema | None = None,
    docs_schema: pa.Schema | None = None,
) -> Dataset:
    """``columns`` maps doc-column → (name-for-left-side, name-for-right-side).

    e.g. {"norm_text": ("src_text", "cand_text"), "countries": ("src_countries", "cand_countries")}

    In ``mode="join"`` pass ``pairs_schema`` (and ``docs_schema``) when the
    pair stream is a lazy pipeline: the two chained hash joins otherwise each
    probe ``pairs.schema()``, and every probe executes the full lazy blocking
    upstream (its sorts are all-to-all — they can't run partially).
    """
    proj = norm_docs.select_columns(["doc_id"] + list(columns))
    if mode == "broadcast":
        # broadcast the projection's Arrow BLOCKS as refs — blocks move
        # object-store → worker directly; the driver never holds the table
        refs = proj.to_arrow_refs()
        key = refs[0].hex() if refs else "empty"

        def attach(batch: pa.Table, refs=refs, key=key, columns=columns) -> pa.Table:
            import numpy as np
            import pandas as pd

            from ..state.worker_cache import cached_build

            cols_key = ",".join(sorted(columns))

            def build():
                # worker store: pandas Index for vectorized id→row lookup +
                # the doc columns kept as ARROW arrays gathered with take()
                # (no per-row Python dict .get loops); a trailing null row is
                # the sentinel for ids missing from the doc table
                if refs:
                    tbl = pa.concat_tables(ray.get(list(refs))).combine_chunks()
                else:
                    tbl = pa.table({"doc_id": pa.array([], type=pa.int64()),
                                    **{c: pa.array([]) for c in columns}})
                index = pd.Index(tbl["doc_id"].to_numpy(zero_copy_only=False))
                cols = []
                for src, (left_name, right_name) in columns.items():
                    col = tbl[src].combine_chunks()
                    col = pa.concat_arrays([col, pa.array([None], type=col.type)])
                    cols.append((col, left_name, right_name))
                return index, cols, len(tbl)

            index, cols, n_docs = cached_build(f"attach:{key}:{len(refs)}:{cols_key}", build)
            il = index.get_indexer(batch["id_left"].to_numpy(zero_copy_only=False))
            ir = index.get_indexer(batch["id_right"].to_numpy(zero_copy_only=False))
            il = pa.array(np.where(il < 0, n_docs, il))
            ir = pa.array(np.where(ir < 0, n_docs, ir))
            for col, left_name, right_name in cols:
                batch = batch.append_column(left_name, col.take(il))
                batch = batch.append_column(right_name, col.take(ir))
            return batch

        return pairs.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
    left = proj.rename_columns({"doc_id": "id_left", **{c: names[0] for c, names in columns.items()}})
    right = proj.rename_columns({"doc_id": "id_right", **{c: names[1] for c, names in columns.items()}})
    dschema = docs_schema if docs_schema is not None else _arrow_schema(proj)
    id_type = dschema.field("doc_id").type
    lside_schema = pa.schema(
        [pa.field("id_left", id_type)]
        + [pa.field(names[0], dschema.field(c).type) for c, names in columns.items()]
    )
    rside_schema = pa.schema(
        [pa.field("id_right", id_type)]
        + [pa.field(names[1], dschema.field(c).type) for c, names in columns.items()]
    )
    pschema = pairs_schema if pairs_schema is not None else _arrow_schema(pairs)
    out = hash_join(
        pairs, left, on=["id_left"], num_partitions=num_partitions,
        left_schema=pschema, right_schema=lside_schema,
    )
    return hash_join(
        out, right, on=["id_right"], num_partitions=num_partitions,
        left_schema=hash_join_schema(pschema, lside_schema, ["id_left"]),
        right_schema=rside_schema,
    )


# ---------------------------------------------------------------------------
# Bloom-filter join pre-filter
# ---------------------------------------------------------------------------
def build_bloom_filter(
    ds: Dataset,
    on: Sequence[str],
    num_bits: int = 1 << 22,
    num_hashes: int = 4,
    max_partial_bytes: int = 1 << 30,
) -> np.ndarray:
    """Packed uint64 Bloom bitmap over ``ds``'s key tuples — the classic
    shuffle-volume reducer for joins with selective small sides: probe rows
    that cannot match are dropped BEFORE the join shuffle, and Bloom filters
    have no false negatives, so the join result is bit-identical.

    Mergeable-partial shape (like the HLL registers): each batch sets bits in
    a local bitmap (k splitmix64 hashes per row, one vectorized scatter), and
    partials OR together associatively — collected here in one bounded driver
    read (num_bits/8 bytes per block; gated by ``max_partial_bytes``). Size
    ``num_bits ≈ 10× expected distinct keys`` for ~1% false positives at
    k=4."""
    from ..functions.hashing import hash_columns

    words = num_bits // 64
    cols = list(on)

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        if t.num_rows:
            for i in range(num_hashes):
                h = hash_columns(t, cols, seed=i) % np.uint64(num_bits)
                np.bitwise_or.at(bm, (h >> np.uint64(6)).astype(np.int64),
                                 np.uint64(1) << (h & np.uint64(63)))
        return pa.table({"bm": pa.FixedSizeListArray.from_arrays(
            pa.array(bm, type=pa.uint64()), words)})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = parts.materialize()  # count + iter below must not re-run the build side
    n_blocks = parts.count()
    if n_blocks * words * 8 > max_partial_bytes:
        raise ValueError(
            f"build_bloom_filter: {n_blocks} partials × {words*8} B exceed "
            f"max_partial_bytes; reduce num_bits or pre-coalesce the build side")
    out = np.zeros(words, dtype=np.uint64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        flat = b["bm"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        merged = np.bitwise_or.reduce(flat.reshape(-1, words).astype(np.uint64), axis=0)
        np.bitwise_or(out, merged, out=out)
    return out


def bloom_prefilter(
    probe: Dataset,
    bitmap: np.ndarray,
    on: Sequence[str],
    num_hashes: int = 4,
) -> Dataset:
    """Drop probe rows whose key tuple cannot exist in the Bloom ``bitmap``
    (no false negatives — every true match survives; false positives are
    removed by the exact join that follows). One ray.put, vectorized bit
    probes per batch, no shuffle."""
    import ray as _ray

    num_bits = len(bitmap) * 64
    bm_ref = _ray.put(bitmap)
    cols = list(on)

    def filt(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_columns
        from ..state.worker_cache import cached_get

        if t.num_rows == 0:
            return t
        bm = cached_get(bm_ref)
        hit = np.ones(t.num_rows, dtype=bool)
        for i in range(num_hashes):
            h = hash_columns(t, cols, seed=i) % np.uint64(num_bits)
            word = bm[(h >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (h & np.uint64(63))) & np.uint64(1) != 0
        return t.filter(pa.array(hit))

    return probe.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
