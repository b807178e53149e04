"""Pairwise feature extraction — the 8-feature string-similarity kernel as a
stateful actor-pool ``map_batches`` stage.

Reference analogue: ``build_matching_features``
(/root/reference/src/features/feautre_extraction.py:116-163) producing
SELECTED_FEATURES (:104-113). Kernel edge-case semantics live in
``functions.strsim`` / ``functions.vectorizer``.

Fit-scope note (SURVEY.md §2.8 caveat): the reference fits the pair TF-IDF
vectorizers over the whole candidate file in one call (:139-141). At scale a
corpus-global fit is frozen once (driver/sample or distributed DF aggregate),
broadcast via ``ray.put`` and reused by every actor — same model inputs,
documented divergence from per-file fit. The bag-of-words count cosine is
fit-scope-INVARIANT (terms outside either side contribute nothing), so it is
fit per batch with no broadcast at all.

Text attachment (J1): pairs carry only ids; texts are attached either by
broadcasting the (small) id→norm_text table via ``ray.put`` and hash-lookup in
each actor, or — when the doc table is too large for one object — by two
distributed hash joins (``Dataset.join``) on id_left/id_right.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions import strsim
from ..functions.vectorizer import (
    WORD_1PLUS,
    Vectorizer,
    pair_char_tfidf,
    pair_count_vectorizer,
    pair_word_tfidf,
)
from ..schema import FEATURE_COLS


# ---------------------------------------------------------------------------
# fitting the global pair vectorizers (driver-side over an iterator of texts)
# ---------------------------------------------------------------------------
def fit_pair_vectorizers(
    norm_docs: Dataset, sample_limit: Optional[int] = None, distributed: bool = True
):
    """Fit the word- and char-TF-IDF pair vectorizers over the corpus's
    norm_text column. With ``sample_limit``, fit on a bounded sample — the
    scale path for 10^12 docs.

    distributed=True (default): per-batch partial document-frequency maps are
    computed in ``map_batches`` (the expensive char-3-5-gram analysis runs on
    workers), merged by a bucketed count, and only the final (term, df) table
    comes to the driver. distributed=False streams raw texts to the driver —
    kept for tiny inputs and as the semantics reference."""
    vw = pair_word_tfidf()
    vc = pair_char_tfidf()
    ds = norm_docs.select_columns(["norm_text"])
    if sample_limit is not None:
        ds = ds.limit(sample_limit)

    if distributed:
        import pandas as _pd

        from .blocking import bucketed_apply

        n = ds.count()
        vw_a = pair_word_tfidf()
        vc_a = pair_char_tfidf()

        def partial_df(batch: pa.Table) -> pa.Table:
            counts: Dict[tuple, int] = {}
            for t in batch["norm_text"].to_pylist():
                t = t or ""
                for term in set(vw_a.analyze(t)):
                    counts[("w", term)] = counts.get(("w", term), 0) + 1
                for term in set(vc_a.analyze(t)):
                    counts[("c", term)] = counts.get(("c", term), 0) + 1
            kinds = [k for k, _ in counts]
            terms = [t for _, t in counts]
            vals = list(counts.values())
            return pa.table(
                {"kind": pa.array(kinds, type=pa.string()), "term": pa.array(terms, type=pa.string()),
                 "df": pa.array(vals, type=pa.int64())}
            )

        partials = ds.map_batches(partial_df, batch_format="pyarrow", batch_size=4096)
        merged = bucketed_apply(
            partials, ["kind", "term"],
            lambda g: g.groupby(["kind", "term"], as_index=False).agg(df=("df", "sum")),
            num_buckets=32,
        )
        dfreq_w: Dict[str, int] = {}
        dfreq_c: Dict[str, int] = {}
        for b in merged.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for k, term, df in zip(b["kind"].to_pylist(), b["term"].to_pylist(), b["df"].to_pylist()):
                (dfreq_w if k == "w" else dfreq_c)[term] = df
        vw.fit_from_document_frequencies(dfreq_w, n)
        vc.fit_from_document_frequencies(dfreq_c, n)
        return vw, vc

    dfreq_w = {}
    dfreq_c = {}
    n = 0
    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for t in batch["norm_text"].to_pylist():
            t = t or ""
            n += 1
            for term in set(vw.analyze(t)):
                dfreq_w[term] = dfreq_w.get(term, 0) + 1
            for term in set(vc.analyze(t)):
                dfreq_c[term] = dfreq_c.get(term, 0) + 1
    vw.fit_from_document_frequencies(dfreq_w, n)
    vc.fit_from_document_frequencies(dfreq_c, n)
    return vw, vc


# ---------------------------------------------------------------------------
# text attachment (J1)
# ---------------------------------------------------------------------------
def broadcast_id_text(norm_docs: Dataset) -> "ray.ObjectRef":
    """Materialize (doc_id, norm_text) and ``ray.put`` it once; actors read it
    zero-copy from the object store. Small-side path only."""
    tbl = pa.concat_tables(
        list(norm_docs.select_columns(["doc_id", "norm_text"]).iter_batches(batch_size=65536, batch_format="pyarrow"))
    )
    return ray.put(tbl)


class AttachTexts:
    """Actor batch fn: add src_text/cand_text from the broadcast id→text table."""

    def __init__(self, id_text_ref):
        tbl = ray.get(id_text_ref)
        self.lookup = dict(zip(tbl["doc_id"].to_pylist(), tbl["norm_text"].to_pylist()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        lk = self.lookup
        src = pa.array([lk.get(d, "") for d in batch["id_left"].to_pylist()], type=pa.string())
        cand = pa.array([lk.get(d, "") for d in batch["id_right"].to_pylist()], type=pa.string())
        return batch.append_column("src_text", src).append_column("cand_text", cand)


def attach_texts(
    pairs: Dataset,
    norm_docs: Dataset,
    mode: str = "broadcast",
    num_partitions: int = 32,
) -> Dataset:
    """pairs(id_left,id_right,…) + docs(doc_id,norm_text) → + src_text, cand_text.

    mode="broadcast": ray.put the id→text table once, hash-lookup per batch
    (no shuffle; right-sized when the doc projection fits the object store).
    mode="join": two distributed hash joins — the 10^12-doc path.
    """
    if mode == "broadcast":
        ref = broadcast_id_text(norm_docs)
        return pairs.map_batches(
            AttachTexts,
            fn_constructor_kwargs={"id_text_ref": ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
    from .joins import hash_join

    docs_l = norm_docs.select_columns(["doc_id", "norm_text"]).rename_columns(
        {"doc_id": "id_left", "norm_text": "src_text"}
    )
    docs_r = norm_docs.select_columns(["doc_id", "norm_text"]).rename_columns(
        {"doc_id": "id_right", "norm_text": "cand_text"}
    )
    out = hash_join(pairs, docs_l, on=["id_left"], num_partitions=num_partitions)
    return hash_join(out, docs_r, on=["id_right"], num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# doc-side precomputation (each doc analyzed ONCE, not once per pair)
# ---------------------------------------------------------------------------
# A doc participates in ~k candidate pairs; analyzing its text per pair costs
# k× the work. Instead a distributed map computes, per doc: the fitted
# word/char TF-IDF rows, WORD_1PLUS token counts (for the scope-invariant
# count cosine), the token set/list, metaphone(first token) and the truncated
# string for the O(len²) kernels. Bundles are broadcast (ray.put) and the pair
# stage becomes pure per-pair arithmetic. Semantics identical to the text path
# (same fitted vectorizers, same kernels) — covered by the parity test.

_COUNT_TOKEN_RE = None


def _count_tokens(text: str):
    global _COUNT_TOKEN_RE
    if _COUNT_TOKEN_RE is None:
        import re

        _COUNT_TOKEN_RE = re.compile(WORD_1PLUS)
    return _COUNT_TOKEN_RE.findall(text)


class _BundleKernel:
    """Per-doc bundle computation (used by the task-based build_doc_bundles)."""

    def __init__(self, vw: Vectorizer, vc: Vectorizer, max_strlen: int = 128):
        self.vw = vw
        self.vc = vc
        self.max_strlen = max_strlen

    def bundle(self, text: str) -> tuple:
        from ..functions import strsim as _ss

        iw, jw_, dw = self.vw.transform([text])
        ic, jc, dc = self.vc.transform([text])
        counts: Dict[str, int] = {}
        toks = _count_tokens(text)
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        cnorm = float(np.sqrt(sum(v * v for v in counts.values())))
        tokens = text.split(" ") if text else []
        first_mp = _ss.metaphone(tokens[0]) if tokens else None
        return (
            jw_.astype(np.int64), dw.astype(np.float64), float(np.sqrt((dw * dw).sum())),
            jc.astype(np.int64), dc.astype(np.float64), float(np.sqrt((dc * dc).sum())),
            counts, cnorm,
            frozenset(tokens), first_mp, text[: self.max_strlen],
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pickle

        ids = batch["doc_id"].to_pylist()
        texts = [t or "" for t in batch["norm_text"].to_pylist()]
        blobs = [pickle.dumps(self.bundle(t)) for t in texts]
        return pa.table({"doc_id": pa.array(ids), "bundle": pa.array(blobs, type=pa.binary())})


def build_doc_bundles(
    norm_docs: Dataset, vec_word: Vectorizer, vec_char: Vectorizer, max_strlen: int = 128,
) -> "ray.ObjectRef":
    """Distributed doc-side analysis → broadcast {doc_id: pickled bundle}.
    Runs as elastic tasks; the fitted vectorizers are fetched once per worker
    process via the worker cache."""
    vw_ref = ray.put(vec_word)
    vc_ref = ray.put(vec_char)

    def build(batch: pa.Table, vw_ref=vw_ref, vc_ref=vc_ref, max_strlen=max_strlen) -> pa.Table:
        from ..state.worker_cache import cached_build, cached_get

        vw = cached_get(vw_ref)
        vc = cached_get(vc_ref)
        builder = cached_build(
            f"doc_bundle_builder:{id(vw)}:{max_strlen}",
            lambda: _BundleKernel(vw, vc, max_strlen),
        )
        import pickle

        ids = batch["doc_id"].to_pylist()
        texts = [t or "" for t in batch["norm_text"].to_pylist()]
        blobs = [pickle.dumps(builder.bundle(t)) for t in texts]
        return pa.table({"doc_id": pa.array(ids), "bundle": pa.array(blobs, type=pa.binary())})

    bundles = norm_docs.select_columns(["doc_id", "norm_text"]).map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True, batch_size=512
    )
    lookup: Dict = {}
    for b in bundles.iter_batches(batch_size=8192, batch_format="pyarrow"):
        lookup.update(zip(b["doc_id"].to_pylist(), b["bundle"].to_pylist()))
    return ray.put(lookup)


def _sparse_dot(ia, va, ib, vb) -> float:
    common, xa, xb = np.intersect1d(ia, ib, assume_unique=True, return_indices=True)
    if len(common) == 0:
        return 0.0
    return float(va[xa] @ vb[xb])


class PairFeaturesFromBundles:
    """Actor batch fn: (id_left, id_right, …) → + 8 feature columns, using
    broadcast doc bundles. The per-pair work is sparse dots + the truncated
    O(len²) string kernels — no text analysis in the pair path at all."""

    def __init__(self, bundles_ref):
        import pickle

        raw = ray.get(bundles_ref)
        self.docs = {k: pickle.loads(v) for k, v in raw.items()}
        self.empty = None

    def __init_from_dict__(self, decoded: Dict) -> "PairFeaturesFromBundles":
        self.docs = decoded
        self.empty = None
        return self

    def _get(self, doc_id):
        b = self.docs.get(doc_id)
        if b is None:
            if self.empty is None:
                import pickle

                z = np.empty(0, dtype=np.int64)
                zf = np.empty(0, dtype=np.float64)
                self.empty = (z, zf, 0.0, z, zf, 0.0, {}, 0.0, frozenset(), None, "")
            return self.empty
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import strsim as _ss

        lefts = batch["id_left"].to_pylist()
        rights = batch["id_right"].to_pylist()
        n = len(lefts)
        out = {c: np.empty(n, dtype=np.float64) for c in FEATURE_COLS}
        for i in range(n):
            a = self._get(lefts[i])
            b = self._get(rights[i])
            aw_i, aw_v, aw_n, ac_i, ac_v, ac_n, a_cnt, a_cn, a_set, a_mp, a_txt = a
            bw_i, bw_v, bw_n, bc_i, bc_v, bc_n, b_cnt, b_cn, b_set, b_mp, b_txt = b
            # tfidf cosines (zero-norm denominator forced to 1.0 → 0.0 score)
            dw = _sparse_dot(aw_i, aw_v, bw_i, bw_v)
            out["tfidf_word_cosine"][i] = dw / (aw_n * bw_n) if aw_n and bw_n else 0.0
            dc = _sparse_dot(ac_i, ac_v, bc_i, bc_v)
            out["tfidf_char_cosine"][i] = dc / (ac_n * bc_n) if ac_n and bc_n else 0.0
            # count cosine from token-count dicts (scope-invariant)
            if a_cn and b_cn:
                small, big = (a_cnt, b_cnt) if len(a_cnt) <= len(b_cnt) else (b_cnt, a_cnt)
                num = 0.0
                for t, v in small.items():
                    w = big.get(t)
                    if w:
                        num += v * w
                out["token_cosine"][i] = num / (a_cn * b_cn)
            else:
                out["token_cosine"][i] = 0.0
            out["token_jaccard"][i] = _ss.jaccard(a_set, b_set)
            out["dmetaphone_match"][i] = (
                0.0 if (a_mp is None or b_mp is None) else float(a_mp == b_mp)
            )
            if a_txt == b_txt:
                out["jaro_winkler"][i] = 1.0
                out["lcs_ratio"][i] = 1.0
                out["edit_ratio"][i] = 1.0
            else:
                out["jaro_winkler"][i] = _ss.jaro_winkler(a_txt, b_txt)
                l = _ss.lcs_len(a_txt, b_txt)
                mx = max(len(a_txt), len(b_txt))
                tot = len(a_txt) + len(b_txt)
                out["lcs_ratio"][i] = (l / mx) if mx else 1.0
                out["edit_ratio"][i] = (2.0 * l / tot) if tot else 1.0
        for c in FEATURE_COLS:
            batch = batch.append_column(c, pa.array(out[c], type=pa.float64()))
        return batch


def pair_features_broadcast(
    pairs: Dataset,
    norm_docs: Dataset,
    vec_word: Vectorizer,
    vec_char: Vectorizer,
    batch_size: int = 8192,
    concurrency=None,
    max_strlen: int = 128,
) -> Dataset:
    """Feature scoring with broadcast doc-side bundles: doc analysis runs once
    per DOC (distributed), pair scoring is pure arithmetic. Small-side path —
    the bundles dict must fit the object store (use the text-attach ``join``
    path + :func:`pair_features` beyond that). Task-based: the decoded bundle
    dict is built once per worker process."""
    bundles_ref = build_doc_bundles(norm_docs, vec_word, vec_char, max_strlen=max_strlen)

    def score(batch: pa.Table, bundles_ref=bundles_ref) -> pa.Table:
        from ..state.worker_cache import cached_get

        def decode(raw):
            import pickle

            return PairFeaturesFromBundles.__new__(PairFeaturesFromBundles).__init_from_dict__(
                {k: pickle.loads(v) for k, v in raw.items()}
            )

        kernel = cached_get(bundles_ref, transform=decode, key_suffix=":decoded")
        return kernel(batch)

    return pairs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


# ---------------------------------------------------------------------------
# the feature kernel
# ---------------------------------------------------------------------------
def _csr_take(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray, rows: np.ndarray):
    """Gather CSR rows by index (vectorized) — lets us transform only UNIQUE
    texts and fan results back out to pairs."""
    lens = np.diff(indptr)[rows]
    new_indptr = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=new_indptr[1:])
    total = int(new_indptr[-1])
    if total == 0:
        return new_indptr, np.empty(0, dtype=indices.dtype), np.empty(0, dtype=data.dtype)
    starts = indptr[rows]
    gather = np.repeat(starts, lens) + (np.arange(total) - np.repeat(new_indptr[:-1], lens))
    return new_indptr, indices[gather], data[gather]


def compute_pair_features(
    src_norm: List[str],
    cand_norm: List[str],
    vec_word: Vectorizer,
    vec_char: Vectorizer,
    max_strlen: int = 512,
) -> Dict[str, np.ndarray]:
    """8-feature kernel over paired normalized strings (feautre_extraction.py:116-163).

    Perf: vectorizer transforms run over the batch's UNIQUE texts only (each
    doc participates in ~k pairs, so this is a ~k× saving) and are gathered
    back to pair rows with a CSR row-take. The O(len²) character kernels
    (Jaro-Winkler / LCS) evaluate on texts truncated to ``max_strlen`` chars —
    a no-op for affiliation-length strings, a guard against quadratic blowup
    on document-length inputs."""
    n = len(src_norm)
    uniq, inv = np.unique(np.array(src_norm + cand_norm, dtype=object), return_inverse=True)
    uniq_list = uniq.tolist()
    src_idx = inv[:n]
    cand_idx = inv[n:]

    # vector-based sims — transform unique texts once
    cv = pair_count_vectorizer().fit(uniq_list)  # scope-invariant; per-batch fit
    u_cv = cv.transform(uniq_list)
    token_cos = strsim.rowwise_cosine_csr(
        *_csr_take(*u_cv, src_idx), *_csr_take(*u_cv, cand_idx), n, max(cv.n_features, 1)
    )
    u_w = vec_word.transform(uniq_list)
    tfidf_word_cos = strsim.rowwise_cosine_csr(
        *_csr_take(*u_w, src_idx), *_csr_take(*u_w, cand_idx), n, max(vec_word.n_features, 1)
    )
    u_c = vec_char.transform(uniq_list)
    tfidf_char_cos = strsim.rowwise_cosine_csr(
        *_csr_take(*u_c, src_idx), *_csr_take(*u_c, cand_idx), n, max(vec_char.n_features, 1)
    )

    # string-based sims (LCS shared between lcs_ratio and edit_ratio)
    uniq_trunc = [s[:max_strlen] for s in uniq_list]
    src_t = [uniq_trunc[i] for i in src_idx]
    cand_t = [uniq_trunc[i] for i in cand_idx]
    lcs_r, edit_r = strsim.lcs_and_edit_batch(src_t, cand_t)
    jw = strsim.jaro_winkler_batch(src_t, cand_t)

    uniq_tokens = [s.split(" ") if s else [] for s in uniq_list]
    uniq_sets = [set(t) for t in uniq_tokens]
    jacc = strsim.jaccard_batch([uniq_sets[i] for i in src_idx], [uniq_sets[i] for i in cand_idx])
    dm = strsim.dmetaphone_match_batch(
        [uniq_tokens[i] for i in src_idx], [uniq_tokens[i] for i in cand_idx]
    )
    return {
        "edit_ratio": edit_r,
        "jaro_winkler": jw,
        "lcs_ratio": lcs_r,
        "token_jaccard": jacc,
        "token_cosine": token_cos,
        "tfidf_word_cosine": tfidf_word_cos,
        "tfidf_char_cosine": tfidf_char_cos,
        "dmetaphone_match": dm,
    }


class FeatureActor:
    """Actor-pool batch fn: pairs with src_text/cand_text → + 8 feature columns.
    Fitted vectorizers are read from the object store once per actor."""

    def __init__(self, vec_word_ref, vec_char_ref, max_strlen: int = 128):
        self.vec_word: Vectorizer = ray.get(vec_word_ref)
        self.vec_char: Vectorizer = ray.get(vec_char_ref)
        self.max_strlen = max_strlen

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = [t or "" for t in batch["src_text"].to_pylist()]
        cand = [t or "" for t in batch["cand_text"].to_pylist()]
        feats = compute_pair_features(src, cand, self.vec_word, self.vec_char, max_strlen=self.max_strlen)
        for col in FEATURE_COLS:
            batch = batch.append_column(col, pa.array(feats[col], type=pa.float64()))
        return batch


def pair_features(
    pairs_with_texts: Dataset,
    vec_word: Vectorizer,
    vec_char: Vectorizer,
    batch_size: int = 2048,
    concurrency=None,
    max_strlen: int = 128,
) -> Dataset:
    """Score candidate pairs with the 8-feature kernel (actor pool).

    Default pool size = 75% of cluster CPUs (the feature kernel is the
    pipeline's dominant compute; the remaining CPUs keep the read/shuffle
    stages fed) — sized per cluster so throughput scales with cluster size."""
    if concurrency is None:
        total_cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(4, (total_cpus * 3) // 4))
    vec_word_ref = ray.put(vec_word)
    vec_char_ref = ray.put(vec_char)
    return pairs_with_texts.map_batches(
        FeatureActor,
        fn_constructor_kwargs={"vec_word_ref": vec_word_ref, "vec_char_ref": vec_char_ref,
                               "max_strlen": max_strlen},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
