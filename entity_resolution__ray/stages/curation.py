"""Dataset-curation operators for large-scale training-data pipelines
(beyond the reference — first-class toolkit members like stages/dedup.py).

  * stratified_sample — up to N docs per stratum (source, language, …),
    deterministically ranked by md5(doc_id) so the sample is stable across
    runs and cluster sizes, and reproducible in SQL
    (row_number() over (partition by key order by md5(id), id)).
  * canonical_docs — best-of-duplicates selection: one doc per exact-content
    group, preferring the longest then lowest-id member (the "keep the best
    copy" step that follows exact dedup in data curation).
  * group_rollup — per-key corpus statistics (docs, chars, whitespace
    tokens) as a pre-aggregated shuffle: partial sums inside map_batches,
    one tiny groupby at the end — no all-to-all on the raw rows.

All three are one-hash-shuffle operators: rows move once, per-group work is
vectorized pandas/Arrow inside buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _md5_hex(values) -> list:
    return [hashlib.md5(str(v).encode()).hexdigest() for v in values]


def stratified_sample(
    ds: Dataset,
    key_col: str,
    n_per_key: int,
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> Dataset:
    """Up to ``n_per_key`` rows per ``key_col`` value, picked by ascending
    (md5(id), id) — a deterministic uniform-ish draw that never moves more
    than the sampled rows to any single task."""
    from .blocking import bucketed_apply

    def add_rank(t: pa.Table) -> pa.Table:
        return t.append_column("__rk", pa.array(_md5_hex(t[id_col].to_pylist()), type=pa.string()))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow", zero_copy_batch=True)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__rk", id_col], kind="mergesort")
        out = g.groupby(key_col, sort=False).head(n_per_key)
        return out.drop(columns=["__rk"])

    return bucketed_apply(ranked, [key_col], pick, num_buckets=num_buckets)


def canonical_docs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    length_col: str = "n_chars",
    num_buckets: int = 64,
) -> Dataset:
    """One row per exact-content group: group on md5(text), keep the member
    with the greatest ``length_col`` then the smallest id. Content hashing
    happens batch-side so only (hash, id, length)-sized rows shuffle… the
    full row rides along here because the output IS the kept rows."""
    from .blocking import bucketed_apply

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__h", pa.array([hashlib.md5((x or "").encode()).hexdigest()
                             for x in t[text_col].to_pylist()], type=pa.string())
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    def keep_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([length_col, id_col], ascending=[False, True], kind="mergesort")
        out = g.drop_duplicates("__h", keep="first")
        return out.drop(columns=["__h"])

    return bucketed_apply(hashed, ["__h"], keep_best, num_buckets=num_buckets)


def group_rollup(
    ds: Dataset,
    key_col: str = "lang",
    text_col: str = "text",
    length_col: str = "n_chars",
) -> Dataset:
    """Per-key corpus stats: (key, n_docs, total_chars, total_ws_tokens).
    Partial aggregation inside every batch (the combiner), then one tiny
    groupby over (keys × blocks) partial rows — the pre-aggregate shape that
    avoids shuffling raw documents."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t[key_col].to_pylist(),
            "chars": np.asarray(t[length_col].to_pylist(), dtype=np.int64),
            "toks": [len(x.split()) if (x or "").strip() else 0 for x in t[text_col].to_pylist()],
        })
        agg = df.groupby("k", as_index=False).agg(
            n_docs=("chars", "size"), total_chars=("chars", "sum"), total_ws_tokens=("toks", "sum")
        )
        return pa.Table.from_pandas(agg.rename(columns={"k": key_col}), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"),
            total_ws_tokens=("total_ws_tokens", "sum"),
        )

    from .blocking import bucketed_apply

    return bucketed_apply(partials, [key_col], merge, num_buckets=16)
