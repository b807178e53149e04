"""A7: k-sweep blocking diagnostics, distributed.

Reference semantics: ``src/blocking/visualize_k_value_for_blocking.py:109-156``
— for a grid of k values, over the TF-IDF cosine kNN graph of the corpus,
compute

  * overlap_purity@k  — mean fraction of a doc's top-k neighbors sharing at
                        least one "important" token with it (ref:135-145)
  * jaccard_purity@k  — ... with token-set Jaccard ≥ ``jaccard_min`` (ref:143)
  * avg_cosine@k      — mean cosine over all top-k edges (ref:152)
  * reduction_ratio@k — 1 − N·k / (N·(N−1)) (ref:154-156)

where "important" tokens are (tokens ∩ fitted vocab) − derived stopwords
∪ acronyms (ref:78-88), and stopwords are the low-IDF quantile ∪ high-DF
fraction of the fitted vocabulary (ref:61-75).

The reference is a single-process sklearn script (dense N×N cosine matrix).
Here every step is a Ray stage:

  1. vectorizer fit    — distributed partial document-frequency maps merged by
                         a bucketed aggregate; only the (term, df) vocab table
                         reaches the driver (same pattern as
                         features.fit_pair_vectorizers).
  2. kNN graph         — inverted-index sparse matmul: postings (term, doc, w)
                         → per-term pairwise partial products → sum per pair
                         = cosine (rows are l2-normalized) → per-source top-k.
                         Posting lists longer than ``df_cap`` are SKIPPED with
                         a logged count (high-df terms carry negligible
                         tf-idf weight); the reference, being dense, has no
                         cap — parity tests use a cap above every df.
  3. flags + metrics   — important sets hash-joined onto both pair endpoints,
                         per-edge flags vectorized per batch, then a tiny
                         per-rank partial-sum table (≤ batches × max_k rows)
                         is cumulated on the driver into the per-k grid.

Divergence from the reference (documented): the reference's dense argsort
pads a doc's neighbor list with arbitrary zero-similarity docs when fewer
than k neighbors have nonzero cosine, with unspecified tie order. Here
neighbors are exactly the nonzero-cosine docs, ranked by (-cosine, doc_id),
and purity denominators use the retrieved count — deterministic, and the
zero-sim pads carry no diagnostic signal.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions.text_norm import tokenize
from ..functions.vectorizer import Vectorizer, blocking_tfidf
from .blocking import bucketed_apply, bucketed_group_apply
from .joins import hash_join

logger = logging.getLogger(__name__)

DEFAULT_K_VALUES = (5, 10, 20, 30, 40, 50, 75, 100)  # ref:19
_ACRO_RE = __import__("re").compile(r"[A-Z0-9&\-]{2,}")   # ref:33
_NON_ALNUM_RE = __import__("re").compile(r"[^A-Za-z0-9]")  # ref:34


def fit_sweep_vectorizer(
    ds: Dataset, text_col: str = "text", num_buckets: int = 32
) -> Tuple[Vectorizer, Dict[str, int], int]:
    """Distributed fit of the blocking TF-IDF (ref build_tfidf, :46-57).
    Returns (fitted vectorizer, {term: df}, n_docs)."""
    vec = blocking_tfidf()
    analyzer = blocking_tfidf()  # stateless copy shipped to workers
    n = ds.count()

    def partial_df(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            for term in set(analyzer.analyze(t or "")):
                counts[term] = counts.get(term, 0) + 1
        return pa.table(
            {"term": pa.array(list(counts.keys()), type=pa.string()),
             "df": pa.array(list(counts.values()), type=pa.int64())}
        )

    partials = ds.select_columns([text_col]).map_batches(
        partial_df, batch_format="pyarrow", batch_size=4096
    )
    merged = bucketed_apply(
        partials, ["term"],
        lambda g: g.groupby("term", as_index=False).agg(df=("df", "sum")),
        num_buckets=num_buckets,
    )
    dfreq: Dict[str, int] = {}
    for b in merged.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for term, df in zip(b["term"].to_pylist(), b["df"].to_pylist()):
            dfreq[term] = df
    vec.fit_from_document_frequencies(dfreq, n)
    return vec, dfreq, n


def sweep_stopwords(
    vec: Vectorizer,
    dfreq: Dict[str, int],
    n_docs: int,
    low_idf_percentile: float = 0.20,   # ref:26
    high_df_percent: float = 0.20,      # ref:27
) -> Set[str]:
    """Derived stopwords = low-IDF(≤ percentile) ∪ high-DF(> percent) over the
    FITTED vocabulary (ref derive_stopwords_auto, :61-75)."""
    if not vec.vocabulary_:
        return set()
    terms = sorted(vec.vocabulary_, key=vec.vocabulary_.get)
    idf = vec.idf_
    idf_cut = np.quantile(idf, low_idf_percentile)
    df_frac = np.array([dfreq[t] for t in terms], dtype=np.float64) / max(n_docs, 1)
    mask = (idf <= idf_cut) | (df_frac > high_df_percent)
    return {t for t, m in zip(terms, mask) if m}


def _acronyms(raw: str) -> Set[str]:
    """ref find_acronyms (:37-43): cleaned, uppercase-checked, lowercased."""
    out: Set[str] = set()
    for w in _ACRO_RE.findall(raw or ""):
        cleaned = _NON_ALNUM_RE.sub("", w)
        if len(cleaned) >= 2 and cleaned.isupper():
            out.add(cleaned.lower())
    return out


def important_sets(
    ds: Dataset,
    vec_ref,
    stopwords: Set[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_acronyms: bool = True,
) -> Dataset:
    """(id, imp list<string>) per doc: (tokens ∩ vocab) − stopwords
    [∪ acronyms] (ref important_token_sets, :78-88). The fitted vectorizer is
    broadcast once (ray.put) and read per worker."""

    def to_sets(batch: pa.Table) -> pa.Table:
        vec = ray.get(vec_ref)
        vocab = set(vec.vocabulary_)
        out: List[List[str]] = []
        for raw in batch[text_col].to_pylist():
            imp = (set(tokenize(raw or "")) & vocab) - stopwords
            if keep_acronyms:
                imp |= _acronyms(raw or "")
            out.append(sorted(imp))
        return pa.table({id_col: batch[id_col], "imp": pa.array(out, type=pa.list_(pa.string()))})

    return ds.select_columns([id_col, text_col]).map_batches(
        to_sets, batch_format="pyarrow", zero_copy_batch=True
    )


def knn_pairs_inverted(
    ds: Dataset,
    vec_ref,
    dfreq: Dict[str, int],
    max_k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int = 1024,
    num_buckets: int = 32,
) -> Dataset:
    """Directed TF-IDF cosine top-``max_k`` neighbor edges
    (src_id, nb_id, cosine, rank) via inverted-index MapReduce:
    postings → per-term pairwise products → per-pair sum → per-src top-k.
    No dense matrix, no driver-side similarity state at any scale."""
    vec_local = ray.get(vec_ref)
    skip_terms = np.array(
        sorted(j for t, j in vec_local.vocabulary_.items() if dfreq.get(t, 0) > df_cap),
        dtype=np.int64,
    )
    if len(skip_terms):
        logger.info(
            "k-sweep: skipping %d/%d terms with df > %d in the kNN graph",
            len(skip_terms), len(vec_local.vocabulary_), df_cap,
        )

    def postings(batch: pa.Table) -> pa.Table:
        vec = ray.get(vec_ref)
        texts = batch[text_col].to_pylist()
        # keep the doc-id column's NATIVE Arrow type (string in the ER docs
        # model, int64 in the TPC-H-ish tables) — coercing to int64 here used
        # to make the downstream hash_join merge int64 pairs against string
        # important-token ids and fail inside the sort
        ids = batch[id_col].combine_chunks() if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
        indptr, indices, data = vec.transform(texts)
        rows = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(indptr))
        if len(skip_terms):
            keep = ~np.isin(indices, skip_terms)
            indices, data, rows = indices[keep], data[keep], rows[keep]
        return pa.table(
            {"term": pa.array(indices, type=pa.int64()),
             "doc": ids.take(pa.array(rows, type=pa.int64())),
             "w": pa.array(data, type=pa.float64())}
        )

    post = ds.select_columns([id_col, text_col]).map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True
    )

    def term_products(g: pd.DataFrame) -> pd.DataFrame:
        d = g["doc"].to_numpy()  # native dtype (int64 or object/str)
        w = g["w"].to_numpy(dtype=np.float64)
        L = len(d)
        if L < 2:
            # slice the input to keep the id dtype stable across blocks
            return pd.DataFrame({"src": d[:0], "nb": d[:0], "p": np.empty(0, np.float64)})
        order = np.argsort(d)
        d, w = d[order], w[order]
        iu, ju = np.triu_indices(L, 1)
        return pd.DataFrame({"src": d[iu], "nb": d[ju], "p": w[iu] * w[ju]})

    partials = bucketed_group_apply(post, "term", term_products, num_buckets=num_buckets)

    def pair_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["src", "nb"], as_index=False).agg(cosine=("p", "sum"))

    undirected = bucketed_apply(partials, ["src", "nb"], pair_sum, num_buckets=num_buckets)

    def both_directions(t: pa.Table) -> pa.Table:
        fwd = pa.table({"src_id": t["src"], "nb_id": t["nb"], "cosine": t["cosine"]})
        rev = pa.table({"src_id": t["nb"], "nb_id": t["src"], "cosine": t["cosine"]})
        return pa.concat_tables([fwd, rev])

    directed = undirected.map_batches(both_directions, batch_format="pyarrow", zero_copy_batch=True)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "nb_id"], ascending=[False, True], kind="mergesort").head(max_k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return bucketed_group_apply(directed, "src_id", topk, num_buckets=num_buckets)


def k_sweep_metrics(
    ds: Dataset,
    k_values: Sequence[int] = DEFAULT_K_VALUES,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_min: float = 0.30,   # ref:31
    df_cap: int = 1024,
    num_buckets: int = 32,
    num_join_partitions: int = 16,
) -> pd.DataFrame:
    """The full sweep (ref visualize_k_values, :109-156) as one distributed
    pipeline. Returns one row per k:
    (k, overlap_purity, jaccard_purity, avg_cosine, reduction_ratio)."""
    vec, dfreq, n = fit_sweep_vectorizer(ds, text_col=text_col, num_buckets=num_buckets)
    vec_ref = ray.put(vec)
    stop = sweep_stopwords(vec, dfreq, n)

    ks = sorted(k for k in k_values if k < max(n, 1))
    if not ks or n < 2:
        return pd.DataFrame(
            columns=["k", "overlap_purity", "jaccard_purity", "avg_cosine", "reduction_ratio"]
        )
    max_k = max(ks)

    pairs = knn_pairs_inverted(
        ds, vec_ref, dfreq, max_k, text_col=text_col, id_col=id_col,
        df_cap=df_cap, num_buckets=num_buckets,
    )
    imp = important_sets(ds, vec_ref, stop, text_col=text_col, id_col=id_col)

    imp_src = imp.map_batches(
        lambda t: pa.table({"src_id": t[id_col], "imp_src": t["imp"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    imp_nb = imp.map_batches(
        lambda t: pa.table({"nb_id": t[id_col], "imp_nb": t["imp"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = hash_join(
        hash_join(pairs, imp_src, on=["src_id"], num_partitions=num_join_partitions),
        imp_nb, on=["nb_id"], num_partitions=num_join_partitions,
    )

    def rank_partials(batch: pa.Table) -> pa.Table:
        """Per-batch partial sums keyed by rank — the only state that leaves
        the workers is ≤ max_k rows per batch."""
        rank = batch["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        cos = batch["cosine"].to_numpy(zero_copy_only=False).astype(np.float64)
        a_l = batch["imp_src"].to_pylist()
        b_l = batch["imp_nb"].to_pylist()
        share = np.empty(len(rank), dtype=np.float64)
        jacc = np.empty(len(rank), dtype=np.float64)
        for i, (al, bl) in enumerate(zip(a_l, b_l)):
            a, b = set(al or ()), set(bl or ())
            inter = len(a & b)
            share[i] = 1.0 if inter else 0.0
            # ref jaccard (:101-107): both-empty → 0.0 here (unlike F1's 1.0)
            jacc[i] = 1.0 if inter and inter / len(a | b) >= jaccard_min else 0.0
        mk = max_k
        return pa.table(
            {"rank": pa.array(np.arange(1, mk + 1, dtype=np.int64)),
             "n": pa.array(np.bincount(rank, minlength=mk + 1)[1:].astype(np.int64)),
             "share": pa.array(np.bincount(rank, weights=share, minlength=mk + 1)[1:]),
             "jacc": pa.array(np.bincount(rank, weights=jacc, minlength=mk + 1)[1:]),
             "cos": pa.array(np.bincount(rank, weights=cos, minlength=mk + 1)[1:])}
        )

    # stream the ≤ max_k-row partials and reduce into four fixed-size vectors
    # on the driver — O(max_k) driver memory regardless of corpus size (the
    # old .to_pandas() materialized blocks × max_k rows at once)
    acc = {c: np.zeros(max_k, dtype=np.float64) for c in ("n", "share", "jacc", "cos")}
    partials = joined.map_batches(rank_partials, batch_format="pyarrow", zero_copy_batch=True)
    for part in partials.iter_batches(batch_format="pyarrow"):
        idx = part["rank"].to_numpy(zero_copy_only=False).astype(np.int64) - 1
        for c in acc:
            np.add.at(acc[c], idx, part[c].to_numpy(zero_copy_only=False).astype(np.float64))
    cn = acc["n"].cumsum()
    cs = acc["share"].cumsum()
    cj = acc["jacc"].cumsum()
    cc = acc["cos"].cumsum()

    rows = []
    for k in ks:
        denom = max(cn[k - 1], 1.0)
        rows.append(
            {"k": k,
             "overlap_purity": cs[k - 1] / denom,
             "jaccard_purity": cj[k - 1] / denom,
             "avg_cosine": cc[k - 1] / denom,
             # ref:154-156 (directed definition)
             "reduction_ratio": 1.0 - (n * k) / (n * (n - 1)) if n > 1 else 1.0}
        )
    return pd.DataFrame(rows)
