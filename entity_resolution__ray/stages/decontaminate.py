"""Benchmark decontamination — flag/drop corpus docs that share any token
n-gram with a blocked "benchmark" document set.

The standard training-data hygiene step (13-gram overlap against eval
benchmarks, as published for GPT-3/PaLM/Llama data pipelines), absent from
the reference (which has no corpus-curation stages at all) but first-class
here alongside stages/dedup.py and stages/curation.py.

Scale design (100 TB corpus, small benchmark side):

  * The contamination side is an eval benchmark — MBs to low GBs BY
    DEFINITION. Its distinct token n-grams are collected once
    (``collect_benchmark_grams``: per-batch DISTINCT inside ``map_batches``,
    bounded driver union gated by ``max_grams`` — an oversized "benchmark"
    raises instead of OOMing the driver) and broadcast with ONE ``ray.put``
    per run: a sorted uint64 hash array for the probe plus a frozenset of
    gram strings for exact confirmation.
  * The corpus side STREAMS through ``map_batches``: tokens exploded once
    per batch (Arrow split, zero per-row Python), token hashes via
    ``functions.hashing.hash_strings`` (one buffer-level pass), gram hashes
    via an n-step vectorized Horner chain over token POSITIONS (reusing the
    mod-2^61-1 kernel from stages/text_analysis.py — no per-gram string is
    ever built for clean text), then a sorted-array membership probe
    (``np.searchsorted``).
  * EXACTNESS: gram strings are materialized ONLY at hash-hit positions and
    confirmed against the broadcast frozenset, so the output equals exact
    string n-gram intersection — a hash collision costs one confirmed lookup,
    never a false positive; identical hash construction on both sides means
    no false negatives. The confirm loop is per-HIT, documented as such: on a
    clean corpus it touches ~0 rows, and on a contaminated doc it
    short-circuits after the doc's first confirmed gram.

Tokenization contract (shared with the DuckDB oracle, RE2 semantics like
stages/text_analysis.py): lowercase, split on ``\\s+``, empty tokens dropped
— SQL replica ``list_filter(string_split_regex(lower(text),'\\s+'),
x -> x <> '')``.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.hashing import hash_strings
from .text_analysis import _horner_step


def _tokenize_lower(col) -> Tuple[np.ndarray, pa.Array]:
    """(row index per token, flat token array) for a string column:
    lowercase, RE2 ``\\s+`` split, empty tokens dropped. Vectorized."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    texts = pc.utf8_lower(pc.fill_null(arr, ""))
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), pattern=r"\s+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    if len(flat) and not pc.all(keep).as_py():
        rows = rows[keep.to_numpy(zero_copy_only=False)]
        flat = flat.filter(keep)
    return rows, flat


def _gram_hashes(rows: np.ndarray, th: np.ndarray, n: int):
    """Hashes of all n-token windows that stay inside one row.

    Returns (row index per gram, token start index per gram, gram hash).
    n vectorized Horner steps over window positions — no per-gram loop."""
    m = th.shape[0]
    num = m - n + 1
    if num <= 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=np.uint64)
    valid = rows[:num] == rows[n - 1:]
    h = np.zeros(num, dtype=np.uint64)
    for k in range(n):
        h = _horner_step(h, th[k:k + num])
    starts = np.arange(num, dtype=np.int64)[valid]
    return rows[:num][valid], starts, h[valid]


def _hash_gram_strings(grams: Iterable[str], n: int) -> np.ndarray:
    """Hash pre-joined gram strings (each exactly n space-joined tokens) with
    the SAME token-hash + Horner construction the corpus probe uses."""
    glist = list(grams)
    if not glist:
        return np.empty(0, dtype=np.uint64)
    toks = pa.array([t for g in glist for t in g.split(" ")], type=pa.string())
    if len(toks) != n * len(glist):
        raise ValueError("benchmark grams must be exactly n space-joined tokens")
    th = hash_strings(toks)
    h = np.zeros(len(glist), dtype=np.uint64)
    for k in range(n):
        h = _horner_step(h, th[k::n])
    return h


def collect_benchmark_grams(
    bench: Dataset,
    n: int = 13,
    text_col: str = "text",
    max_grams: int = 20_000_000,
) -> frozenset:
    """Distinct token n-grams of the (small) benchmark set, as strings.

    Per-batch DISTINCT runs inside ``map_batches``; the driver only unions
    the already-deduplicated per-batch sets, gated by ``max_grams`` so a
    mistakenly-huge "benchmark" raises instead of growing without bound."""

    def emit(t: pa.Table) -> pa.Table:
        rows, flat = _tokenize_lower(t[text_col])
        m = len(flat)
        num = m - n + 1
        if num <= 0:
            return pa.table({"g": pa.array([], type=pa.string())})
        valid = rows[:num] == rows[n - 1:]
        starts = np.arange(num, dtype=np.int64)[valid]
        if starts.size == 0:
            return pa.table({"g": pa.array([], type=pa.string())})
        idx = (starts[:, None] + np.arange(n, dtype=np.int64)).ravel()
        toks = flat.take(pa.array(idx))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(np.arange(starts.size + 1, dtype=np.int64) * n, type=pa.int32()),
                toks,
            ),
            " ",
        )
        return pa.table({"g": joined.unique()})

    out = bench.map_batches(emit, batch_format="pyarrow")
    grams: set = set()
    for b in out.iter_batches(batch_format="pyarrow"):
        grams.update(b["g"].to_pylist())
        if len(grams) > max_grams:
            raise ValueError(
                f"benchmark n-gram set exceeds max_grams={max_grams}; the "
                "contamination side must be benchmark-sized (broadcastable). "
                "Raise max_grams explicitly if the driver has the memory."
            )
    return frozenset(grams)


def decontaminate(
    ds: Dataset,
    benchmark_grams: frozenset,
    n: int = 13,
    text_col: str = "text",
    action: str = "flag",
) -> Dataset:
    """Mark (``action="flag"`` → boolean ``contaminated`` column) or remove
    (``action="drop"``) docs sharing any token n-gram with the benchmark set.

    One streaming ``map_batches`` pass over the corpus; the benchmark set is
    shipped once via ``ray.put`` (sorted hash array + confirm frozenset)."""
    import ray

    if action not in ("flag", "drop"):
        raise ValueError(f"action must be 'flag' or 'drop', got {action!r}")
    bad_hashes = np.unique(_hash_gram_strings(benchmark_grams, n))
    href = ray.put(bad_hashes)
    sref = ray.put(pa.array(sorted(benchmark_grams), type=pa.string()))

    def probe(t: pa.Table) -> pa.Table:
        from ..state.worker_cache import cached_get

        bh = cached_get(href)
        flagged = np.zeros(t.num_rows, dtype=bool)
        if bh.size:
            rows, flat = _tokenize_lower(t[text_col])
            grow, gstart, gh = _gram_hashes(rows, hash_strings(flat), n)
            pos = np.searchsorted(bh, gh)
            pos_ok = pos < bh.size
            cand = pos_ok & (bh[np.minimum(pos, bh.size - 1)] == gh)
            if cand.any():
                # exact confirm, vectorized: join the candidate windows'
                # tokens into gram strings (only hash-hit positions — clean
                # text never materializes a gram) and Arrow-is_in them
                # against the broadcast gram strings
                crow, cstart = grow[cand], gstart[cand]
                idx = (cstart[:, None] + np.arange(n, dtype=np.int64)).ravel()
                joined = pc.binary_join(
                    pa.ListArray.from_arrays(
                        pa.array(np.arange(crow.size + 1, dtype=np.int64) * n,
                                 type=pa.int32()),
                        flat.take(pa.array(idx)),
                    ),
                    " ",
                )
                ok = pc.is_in(joined, value_set=cached_get(sref)).to_numpy(
                    zero_copy_only=False
                )
                flagged[crow[ok]] = True
        flags = pa.array(flagged)
        if action == "drop":
            return t.filter(pc.invert(flags))
        return t.append_column("contaminated", flags)

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
