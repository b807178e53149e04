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
  * grouped_topk — top-k rows per key (the row_number window pattern) as one
    hash shuffle + per-bucket vectorized head.
  * grouped_quantiles — EXACT per-key discrete quantiles via (key, value,
    count) histogram pre-aggregation: exchange volume bounded by the value
    domain, never by row count.
  * remove_boilerplate — corpus-global frequent-line removal (the C4/CCNet
    boilerplate pass): line → distinct-doc-frequency via a pre-aggregated
    hash shuffle, lines above ``min_df`` broadcast once with ``ray.put``,
    then a vectorized per-doc line filter. Two phases, one shuffle of
    (line, partial-df) rows only — the documents themselves never shuffle.

All are one-hash-shuffle operators: rows move once, per-group work is
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


def grouped_distinct_count(
    ds: Dataset,
    key_col: str,
    val_col: str,
    out_col: str = "n_distinct",
    num_buckets: int = 64,
) -> Dataset:
    """Exact COUNT(DISTINCT val) per key, scale-shaped: each batch first
    collapses to its distinct (key, val) pairs (the combiner — the shuffle
    moves distinct pairs per block, never raw rows), one hash shuffle on
    (key, val) co-locates equal pairs so each bucket's per-key distinct
    count is a disjoint PARTIAL, and a final tiny shuffle on key sums the
    partials. No sketch, no driver collect — exact at any cardinality."""
    from .blocking import bucketed_apply

    def partial_pairs(t: pa.Table) -> pa.Table:
        return t.select([key_col, val_col]).group_by([key_col, val_col]).aggregate([])

    pairs = ds.map_batches(partial_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_count(g: pa.Table) -> pa.Table:
        # distinct within the bucket, then count per key: disjoint partials
        # because the shuffle key is the full (key, val) pair
        d = g.group_by([key_col, val_col]).aggregate([])
        out = d.group_by([key_col]).aggregate([(val_col, "count")])
        return out.rename_columns([key_col, out_col])

    partials = bucketed_apply(pairs, [key_col, val_col], bucket_count,
                              num_buckets=num_buckets, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False).agg(**{out_col: (out_col, "sum")})

    return bucketed_apply(partials, [key_col], merge, num_buckets=16)


def grouped_topk(
    ds: Dataset,
    key_col: str,
    sort_col: str,
    k: int,
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> Dataset:
    """Top-``k`` rows per key by ``sort_col`` DESC (ties → lowest ``id_col``)
    — the window-function `row_number() OVER (PARTITION BY ...)` pattern as
    one hash shuffle + a vectorized per-bucket head."""
    from .blocking import bucketed_apply

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, sort_col, id_col],
                          ascending=[True, False, True], kind="mergesort")
        return g.groupby(key_col, sort=False).head(k)

    return bucketed_apply(ds, [key_col], pick, num_buckets=num_buckets)


def grouped_quantiles(
    ds: Dataset,
    key_col: str,
    value_col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
    num_buckets: int = 16,
) -> Dataset:
    """EXACT per-key discrete quantiles of an integer column without ever
    shuffling raw rows: each batch pre-aggregates a (key, value, count)
    histogram, histograms merge in one small hash shuffle, and the quantile
    is read off the cumulative counts — quantile_disc semantics (value at
    1-based rank ceil(q·n) of the sorted multiset), verified against DuckDB.

    The exchange volume is bounded by (#keys × #distinct values), not row
    count — the right shape for a 100 TB corpus whose value domain is small
    (lengths, scores, counts)."""
    from .blocking import bucketed_apply

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t[key_col].to_numpy(zero_copy_only=False),
            "v": t[value_col].to_numpy(zero_copy_only=False),
        })
        agg = df.groupby(["k", "v"], as_index=False).size().rename(columns={"size": "cnt"})
        return pa.table({
            key_col: pa.array(agg["k"]),
            value_col: pa.array(agg["v"]),
            "cnt": pa.array(agg["cnt"].to_numpy(dtype=np.int64)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    qcols = [f"q{int(round(q * 100)):02d}" for q in qs]

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([key_col, value_col], as_index=False).agg(cnt=("cnt", "sum"))
        g = g.sort_values([key_col, value_col], kind="mergesort")
        g["cum"] = g.groupby(key_col, sort=False)["cnt"].cumsum()
        n = g.groupby(key_col, sort=False)["cnt"].transform("sum")
        out = g[[key_col]].drop_duplicates().reset_index(drop=True)
        for q, name in zip(qs, qcols):
            rank = np.ceil(q * n.to_numpy()).astype(np.int64)
            hit = g[g["cum"].to_numpy() >= rank]
            out[name] = hit.groupby(key_col, sort=False)[value_col].first().reindex(
                out[key_col]).to_numpy()
        return out

    return bucketed_apply(partials, [key_col], per_key, num_buckets=num_buckets)


def boilerplate_lines(
    ds: Dataset,
    min_df: int,
    text_col: str = "text",
    num_buckets: int = 16,
) -> Dataset:
    """Phase 1 of :func:`remove_boilerplate`: (line, df) for every trimmed
    non-empty line appearing in ≥ ``min_df`` DISTINCT documents.

    Pre-aggregated: each batch emits its distinct (line → doc-count) partials
    (a document never spans batches, so within-batch per-doc dedupe is exact
    global dedupe), then one small hash shuffle on the line string merges
    them. Only (line, count) rows move — never document text."""

    def partial(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t[text_col].combine_chunks(), "")
        n = len(texts)
        lines = pc.split_pattern(texts, "\n")
        llen = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), llen)
        flat = pc.utf8_trim_whitespace(pc.list_flatten(lines))
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        rows, flat = rows[ne], flat.filter(pa.array(ne))
        if len(rows) == 0:
            return pa.table({"line": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        v = len(vocab)
        uniq = np.unique(rows * v + codes)  # distinct (doc, line)
        df = np.bincount(uniq % v, minlength=v).astype(np.int64)
        return pa.table({"line": vocab, "df": pa.array(df)})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("line", as_index=False).agg(df=("df", "sum"))
        return out[out["df"] >= min_df]

    from .blocking import bucketed_apply

    return bucketed_apply(partials, ["line"], merge, num_buckets=num_buckets)


def remove_boilerplate(
    ds: Dataset,
    min_df: int,
    text_col: str = "text",
    num_buckets: int = 16,
    max_boilerplate_lines: int = 100_000,
) -> Dataset:
    """Corpus-global boilerplate-line removal (the C4/CCNet curation pass):
    any trimmed line occurring in ≥ ``min_df`` distinct documents is deleted
    from every document; output keeps all input columns with ``text_col``
    rewritten and an ``n_removed`` count appended.

    Scale shape: phase 1 shuffles only (line, partial-df) rows; the filtered
    boilerplate set is by construction small (high-df lines) and is broadcast
    once via ``ray.put`` — guarded by ``max_boilerplate_lines`` (the
    louvain_communities driver-funnel pattern) so a pathological ``min_df``
    raises instead of OOMing the driver. ``ds`` is consumed twice (DF scan +
    rewrite); materialize upstream first if it is an expensive pipeline."""
    import ray as _ray

    from ..state.worker_cache import cached_get

    flagged = boilerplate_lines(ds, min_df, text_col=text_col, num_buckets=num_buckets)
    head = flagged.limit(max_boilerplate_lines + 1).take_all()
    if len(head) > max_boilerplate_lines:
        raise ValueError(
            f"remove_boilerplate: > {max_boilerplate_lines} lines at min_df={min_df}; "
            "raise min_df or max_boilerplate_lines"
        )
    bl = sorted(r["line"] for r in head)
    ref = _ray.put(bl)

    def clean(t: pa.Table, ref=ref, text_col=text_col) -> pa.Table:
        vs = pa.array(cached_get(ref), type=pa.string())
        texts = pc.fill_null(t[text_col].combine_chunks(), "")
        n = len(texts)
        lines = pc.split_pattern(texts, "\n")
        llen = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), llen)
        flat_raw = pc.list_flatten(lines)
        hit = pc.is_in(pc.utf8_trim_whitespace(flat_raw), value_set=vs).to_numpy(
            zero_copy_only=False
        )
        kept_flat = flat_raw.filter(pa.array(~hit))
        kept_per_row = np.bincount(rows[~hit], minlength=n).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(kept_per_row)]).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), kept_flat)
        cleaned = pc.fill_null(pc.binary_join(lst, "\n"), "")
        out = t.set_column(t.schema.get_field_index(text_col), text_col, cleaned)
        return out.append_column("n_removed", pa.array(llen - kept_per_row))

    return ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


def grouped_zscore(
    ds: Dataset,
    key_col: str,
    value_col: str,
    id_cols: tuple = (),
    out_col: str = "zscore",
    max_broadcast_keys: int = 1_000_000,
) -> Dataset:
    """Per-key z-score normalization ``(v - mean_key) / stddev_pop_key`` —
    the feature-scaling pass of a training pipeline, shaped as the classic
    two-pass broadcast pattern: pass 1 pre-aggregates (key, n, sum, sumsq)
    moments inside every batch (the combiner) and reduces them in one TINY
    groupby (exchange volume = #keys, never #rows); the per-key stats are
    broadcast once with ``ray.put`` and pass 2 is an embarrassingly parallel
    vectorized lookup + transform. Zero-variance keys emit 0.0 (the oracle
    coalesces identically).

    Partitioning assumption (documented): key cardinality is broadcast-sized
    (``max_broadcast_keys`` gate raises otherwise — beyond that, flip to a
    distributed join attach, same trade as dedup's attach_mode)."""
    import ray

    # numerically stable moments: per batch (n, mean, M2 = Σ(v-mean)²) — the
    # raw Σv² form cancels catastrophically for large-offset low-variance
    # keys (values ~1e6 with spread 0.01 lose the entire variance to float
    # error), which would also break the stddev_pop oracle compare
    def moments(t: pa.Table) -> pa.Table:
        key_t = t.schema.field(key_col).type
        if t.num_rows == 0:
            return pa.table({
                key_col: pa.array([], type=key_t),
                "n": pa.array([], type=pa.int64()),
                "m": pa.array([], type=pa.float64()),
                "m2": pa.array([], type=pa.float64()),
            })
        kd = t[key_col].combine_chunks().dictionary_encode()
        codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        nk = len(kd.dictionary)
        n = np.bincount(codes, minlength=nk).astype(np.int64)
        mean = np.bincount(codes, weights=v, minlength=nk) / np.maximum(n, 1)
        dev = v - mean[codes]
        m2 = np.bincount(codes, weights=dev * dev, minlength=nk)
        return pa.table({
            key_col: kd.dictionary,
            "n": pa.array(n),
            "m": pa.array(mean),
            "m2": pa.array(m2),
        })

    parts = ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)

    def reduce_moments(g: pd.DataFrame) -> pd.DataFrame:
        # closed-form parallel merge (Chan et al.): M2 = Σ M2_i + Σ n_i(m_i-m̄)²
        g = g.assign(nm=g["n"] * g["m"])
        agg = g.groupby(key_col, as_index=False).agg(
            n=("n", "sum"), nm=("nm", "sum"), m2=("m2", "sum"))
        agg["m"] = agg["nm"] / agg["n"]
        spread = g.merge(agg[[key_col, "m"]], on=key_col, suffixes=("", "_tot"))
        corr = (spread["n"] * (spread["m"] - spread["m_tot"]) ** 2).groupby(
            spread[key_col]).sum()
        agg["m2"] = agg["m2"] + agg[key_col].map(corr).fillna(0.0)
        return agg[[key_col, "n", "m", "m2"]]

    from .blocking import bucketed_apply

    stats = bucketed_apply(parts, [key_col], reduce_moments, num_buckets=16).to_pandas()
    if len(stats) > max_broadcast_keys:
        raise ValueError(
            f"grouped_zscore: {len(stats)} keys exceed max_broadcast_keys="
            f"{max_broadcast_keys}; use a join attach instead of broadcast")
    mean = stats["m"]
    var = (stats["m2"] / stats["n"]).clip(lower=0.0)
    lut_ref = ray.put({
        k: (float(m), float(np.sqrt(vv)))
        for k, m, vv in zip(stats[key_col], mean, var)
    })

    def transform(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        kd = t[key_col].combine_chunks().dictionary_encode()
        codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        mu = np.array([lut[k.as_py()][0] for k in kd.dictionary], dtype=np.float64)
        sd = np.array([lut[k.as_py()][1] for k in kd.dictionary], dtype=np.float64)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        z = np.where(sd[codes] > 0.0, (v - mu[codes]) / np.where(sd[codes] > 0, sd[codes], 1.0), 0.0)
        cols = {c: t[c] for c in (*id_cols, key_col, value_col)}
        cols[out_col] = pa.array(z)
        return pa.table(cols)

    return ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True)


def train_split(
    ds: Dataset,
    id_col: str = "doc_id",
    fractions: tuple = (0.8, 0.1, 0.1),
    names: tuple = ("train", "val", "test"),
) -> Dataset:
    """Deterministic train/val/test assignment: the first 8 hex digits of
    md5(id) map each row to a uniform [0,1) bucket, cut at the cumulative
    fractions. Embarrassingly parallel (no shuffle), stable across runs,
    cluster sizes AND dataset growth (a doc's split never changes when other
    docs arrive — the property random seeds cannot give), and SQL-replicable
    for the oracle (same md5-prefix arithmetic)."""
    if len(fractions) != len(names) or abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError("fractions must match names and sum to 1")
    cuts = np.cumsum(fractions)[:-1]

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("split", pa.array([], type=pa.string()))
        hexes = _md5_hex(t[id_col].to_pylist())
        u = np.array([int(h[:8], 16) for h in hexes], dtype=np.float64) / float(1 << 32)
        idx = np.searchsorted(cuts, u, side="right")
        return t.append_column(
            "split", pa.array([names[i] for i in idx], type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def grouped_sequence(
    ds: Dataset,
    key_col: str,
    value_col: str,
    order_cols: list,
    sep: str = ">",
    num_buckets: int = 64,
) -> Dataset:
    """Per-key ORDERED concatenation of ``value_col`` (the
    ``string_agg(... ORDER BY ...)`` window shape) — e.g. a user's
    time-ordered event-type sequence, the "behavior string" construction
    that turns an event log into training sequences. One hash shuffle on the
    key; the per-bucket sort+join is vectorized pandas. Output:
    (key, seq, n_items)."""
    from .blocking import bucketed_apply

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + list(order_cols), kind="mergesort")
        gb = g.groupby(key_col, sort=False)
        out = gb[value_col].agg(sep.join).reset_index()
        out.columns = [key_col, "seq"]
        out["n_items"] = gb.size().values
        return out

    return bucketed_apply(ds, [key_col], agg, num_buckets=num_buckets)


def grouped_ntile(
    ds: Dataset,
    key_col: str,
    value_col: str,
    n: int,
    id_col: str,
    num_buckets: int = 64,
) -> Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY value, id)`` — per-key
    equal-frequency tiles with the standard remainder rule (the first
    ``count mod n`` tiles get one extra row). One hash shuffle on the key;
    tile assignment is a closed-form vectorized expression of the in-key
    rank, no per-row loop."""
    from .blocking import bucketed_apply

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, value_col, id_col], kind="mergesort")
        m = g.groupby(key_col, sort=False)[id_col].transform("size").to_numpy()
        rank = g.groupby(key_col, sort=False).cumcount().to_numpy()
        q, r = m // n, m % n
        big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
        tile = np.where(
            rank < big,
            rank // np.maximum(q + 1, 1),
            r + (rank - big) // np.maximum(q, 1),
        ).astype(np.int64) + 1
        out = g[[key_col, id_col, value_col]].copy()
        out["tile"] = tile
        return out

    return bucketed_apply(ds, [key_col], tiles, num_buckets=num_buckets)
