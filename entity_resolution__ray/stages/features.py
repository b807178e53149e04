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
    workers) and summed on the driver — the vocabulary is a driver-held dict
    regardless and the input is sample-bounded at scale, so a shuffle merge
    would be a pure barrier. distributed=False streams raw texts to the
    driver — kept for tiny inputs and as the semantics reference."""
    vw = pair_word_tfidf()
    vc = pair_char_tfidf()
    ds = norm_docs.select_columns(["norm_text"])
    if sample_limit is not None:
        ds = ds.limit(sample_limit)

    if distributed:
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

        # batch_size bounds task parallelism (n_docs / batch_size tasks):
        # 4096 left a 5k-doc fit on two cores while 30 idled. 512 trades a
        # little partial-row duplication (terms recounted across batches)
        # for ~n/512-way analysis parallelism — the analyze() calls are the
        # compute; the duplicated rows are summed in one driver groupby.
        partials = ds.map_batches(partial_df, batch_format="pyarrow", batch_size=512)
        # merge the per-batch partials directly on the driver: the vocabulary
        # lands in a driver-side dict REGARDLESS (the fitted vectorizers are
        # broadcast objects), and the fit input is sample-bounded at scale
        # (ERConfig.vectorizer_sample_limit), so the bucketed shuffle was a
        # full barrier producing a table the driver re-read row by row anyway
        pdf = partials.to_pandas()
        agg = pdf.groupby(["kind", "term"], as_index=False, sort=False)["df"].sum()
        kinds = agg["kind"].to_numpy()
        terms = agg["term"].to_numpy()
        dfs = agg["df"].to_numpy()
        wmask = kinds == "w"
        dfreq_w: Dict[str, int] = dict(zip(terms[wmask], (int(x) for x in dfs[wmask])))
        dfreq_c: Dict[str, int] = dict(zip(terms[~wmask], (int(x) for x in dfs[~wmask])))
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
def attach_texts(
    pairs: Dataset,
    norm_docs: Dataset,
    mode: str = "broadcast",
    num_partitions: int = 32,
) -> Dataset:
    """pairs(id_left,id_right,…) + docs(doc_id,norm_text) → + src_text, cand_text.

    mode="broadcast": the (doc_id, norm_text) projection's Arrow BLOCKS are
    broadcast as object refs — blocks move object-store → worker directly,
    the driver never materializes the table; each worker process builds the
    hash map once (worker cache). Right whenever the projection fits the
    object store. mode="join": two distributed hash joins — the 10^12-doc path.
    """
    if mode == "broadcast":
        refs = norm_docs.select_columns(["doc_id", "norm_text"]).to_arrow_refs()
        key = refs[0].hex() if refs else "empty"

        def attach(batch: pa.Table, refs=refs, key=key) -> pa.Table:
            from ..state.worker_cache import cached_build

            def build():
                lk = {}
                for t in ray.get(list(refs)):
                    lk.update(zip(t["doc_id"].to_pylist(), t["norm_text"].to_pylist()))
                return lk

            lk = cached_build(f"id_text:{key}:{len(refs)}", build)
            src = pa.array([lk.get(d, "") for d in batch["id_left"].to_pylist()], type=pa.string())
            cand = pa.array([lk.get(d, "") for d in batch["id_right"].to_pylist()], type=pa.string())
            return batch.append_column("src_text", src).append_column("cand_text", cand)

        return pairs.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
    from .joins import attach_doc_columns

    return attach_doc_columns(
        pairs, norm_docs, {"norm_text": ("src_text", "cand_text")},
        mode="join", num_partitions=num_partitions,
    )


# ---------------------------------------------------------------------------
# doc-side precomputation (each doc analyzed ONCE, not once per pair)
# ---------------------------------------------------------------------------
# A doc participates in ~k candidate pairs; re-analyzing its text per pair
# costs k× the work (the word/char TF-IDF transforms dominate). The bundle
# DATASET holds per-doc: fitted word/char TF-IDF CSR rows, hashed token
# counts (count cosine is fit-scope invariant, and hashing tokens keeps the
# key space flat), hashed split-token sets (jaccard), metaphone(first token)
# and the truncated string for the O(len²) kernels. Bundles are broadcast as
# Arrow BLOCK REFS (no driver materialization); each worker builds one
# columnar store and the pair stage is pure vectorized arithmetic — no text
# analysis and no per-pair Python in the pair path.

_COUNT_TOKEN_RE = None


def _count_tokens(text: str):
    global _COUNT_TOKEN_RE
    if _COUNT_TOKEN_RE is None:
        import re

        _COUNT_TOKEN_RE = re.compile(WORD_1PLUS)
    return _COUNT_TOKEN_RE.findall(text)


def _hashed_rows(token_lists: List[List[str]], with_counts: bool):
    """Per-row token lists → (offsets int64, hashes int64[, counts float64])
    with per-row unique keys (counts aggregated)."""
    from ..functions.hashing import hash_token_list

    rows = np.repeat(np.arange(len(token_lists), dtype=np.int64),
                     [len(t) for t in token_lists])
    flat: List[str] = [t for lst in token_lists for t in lst]
    h = hash_token_list(flat).view(np.int64)
    order = np.lexsort((h, rows))
    r_s, h_s = rows[order], h[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])
    ur, uh = r_s[first], h_s[first]
    offsets = np.zeros(len(token_lists) + 1, dtype=np.int64)
    np.cumsum(np.bincount(ur, minlength=len(token_lists)), out=offsets[1:])
    if not with_counts:
        return offsets, uh
    grp = np.cumsum(first) - 1
    counts = np.bincount(grp, minlength=len(ur)).astype(np.float64)
    return offsets, uh, counts


def _list_arr(offsets: np.ndarray, values: np.ndarray, typ) -> pa.Array:
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()), pa.array(values, type=typ)
    )


def build_doc_bundles(
    norm_docs: Dataset, vec_word: Vectorizer, vec_char: Vectorizer, max_strlen: int = 128,
) -> List:
    """Distributed doc-side analysis → list of Arrow block refs of the bundle
    dataset (doc_id, CSR rows, hashed token sets, metaphone, truncated text)."""
    vw_ref = ray.put(vec_word)
    vc_ref = ray.put(vec_char)

    def build(batch: pa.Table, vw_ref=vw_ref, vc_ref=vc_ref, max_strlen=max_strlen) -> pa.Table:
        from ..functions import strsim as _ss
        from ..state.worker_cache import cached_get

        vw = cached_get(vw_ref)
        vc = cached_get(vc_ref)
        texts = [t or "" for t in batch["norm_text"].to_pylist()]
        w_ptr, w_idx, w_val = vw.transform(texts)
        c_ptr, c_idx, c_val = vc.transform(texts)
        tc_off, tc_h, tc_c = _hashed_rows([_count_tokens(t) for t in texts], with_counts=True)
        tj_off, tj_h = _hashed_rows([t.split(" ") if t else [] for t in texts], with_counts=False)
        first_toks = [(t.split(" ")[0] if t else None) for t in texts]
        mp = [(_ss.metaphone(ft) if ft is not None else "") for ft in first_toks]
        has_tok = [ft is not None for ft in first_toks]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "w_idx": _list_arr(w_ptr, w_idx, pa.int64()),
                "w_val": _list_arr(w_ptr, w_val, pa.float64()),
                "c_idx": _list_arr(c_ptr, c_idx, pa.int64()),
                "c_val": _list_arr(c_ptr, c_val, pa.float64()),
                "tc_h": _list_arr(tc_off, tc_h, pa.int64()),
                "tc_c": _list_arr(tc_off, tc_c, pa.float64()),
                "tj_h": _list_arr(tj_off, tj_h, pa.int64()),
                "mp": pa.array(mp, type=pa.string()),
                "has_tok": pa.array(has_tok, type=pa.bool_()),
                "txt": pa.array([t[:max_strlen] for t in texts], type=pa.string()),
            }
        )

    ds = norm_docs.select_columns(["doc_id", "norm_text"]).map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024
    )
    return ds.to_arrow_refs()


def _pack_store_arrays(tables: List[pa.Table]) -> Dict[str, object]:
    """Bundle blocks → one dict of CONTIGUOUS numpy arrays + a doc_id→row map.

    This runs ONCE (in a Ray task); the returned dict is ``ray.put`` into the
    object store and every scoring worker reads the numpy arrays as zero-copy
    read-only plasma views. The previous design had each worker process build
    its own store (concat + combine_chunks copies + to_pylist of every text)
    — ~1 GB of private heap per worker, which at 32 workers thrashed the
    allocator hard enough that the feature stage ran SLOWER at 32 CPUs than
    at 8 (measured: 228 s vs 97 s on 50k docs). Row n_docs is a synthetic
    EMPTY row for unknown doc ids."""
    t = pa.concat_tables(tables) if tables else None
    n = t.num_rows if t is not None else 0
    out: Dict[str, object] = {"n": n}
    out["row_of"] = {d: i for i, d in enumerate(t["doc_id"].to_pylist())} if n else {}

    def csr(idx_col, val_col=None, idx_dtype=np.int64, val_dtype=np.float64):
        if n == 0:
            ptr = np.zeros(2, dtype=np.int64)
            return (ptr, np.empty(0, idx_dtype)) if val_col is None else (
                ptr, np.empty(0, idx_dtype), np.empty(0, val_dtype))
        la = t[idx_col].combine_chunks()
        ptr = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ptr = np.append(ptr, ptr[-1])  # empty sentinel row
        idx = np.ascontiguousarray(la.values.to_numpy(zero_copy_only=False).astype(idx_dtype, copy=False))
        if val_col is None:
            return ptr, idx
        vals = np.ascontiguousarray(
            t[val_col].combine_chunks().values.to_numpy(zero_copy_only=False).astype(val_dtype, copy=False)
        )
        return ptr, idx, vals

    # vocab-indexed CSRs use int32 indices + float32 weights: the scoring
    # kernels are DRAM-bandwidth-bound (gathers dominate), so halving the
    # bytes is a direct throughput win; cosines move by ~1e-7 (the parity
    # test tolerance documents this). Hashed-key CSRs keep int64 (they ARE
    # 64-bit hashes); counts compress to float32 losslessly (integers < 2^24).
    out["w"] = csr("w_idx", "w_val", idx_dtype=np.int32, val_dtype=np.float32)
    out["c"] = csr("c_idx", "c_val", idx_dtype=np.int32, val_dtype=np.float32)
    out["tc"] = csr("tc_h", "tc_c", val_dtype=np.float32)
    out["tj"] = csr("tj_h")
    # feature-space widths, computed ONCE: scanning the CSR index arrays per
    # scoring batch made the kernel superlinear in corpus size
    out["w_n"] = int(out["w"][1].max(initial=0)) + 1
    out["c_n"] = int(out["c"][1].max(initial=0)) + 1
    # metaphone strings → int codes (only EQUALITY is ever tested); the
    # synthetic empty row is appended before encoding so it gets a valid code
    if n:
        mp_codes = pa.chunked_array([t["mp"].combine_chunks(), pa.array([""])]) \
            .dictionary_encode().combine_chunks().indices.to_numpy(zero_copy_only=False)
        out["mp_code"] = np.ascontiguousarray(mp_codes.astype(np.int32, copy=False))
        out["has_tok"] = np.append(
            t["has_tok"].combine_chunks().to_numpy(zero_copy_only=False), False
        )
        # texts as one utf8 byte blob + offsets; per batch only the UNIQUE
        # rows needed by the O(len²) kernels are decoded
        txt = (
            pa.chunked_array([t["txt"].combine_chunks(), pa.array([""])])
            .cast(pa.large_string()).combine_chunks()
        )
        off = np.frombuffer(txt.buffers()[1], dtype=np.int64)
        out["txt_off"] = off[txt.offset : txt.offset + len(txt) + 1].copy()
        out["txt_buf"] = np.frombuffer(txt.buffers()[2] or b"", dtype=np.uint8).copy()
    else:
        out["mp_code"] = np.zeros(1, dtype=np.int32)
        out["has_tok"] = np.zeros(1, dtype=bool)
        out["txt_off"] = np.zeros(2, dtype=np.int64)
        out["txt_buf"] = np.empty(0, dtype=np.uint8)
    return out


@ray.remote
def _pack_store_task(refs: List) -> Dict[str, object]:
    return _pack_store_arrays(ray.get(list(refs)))


class _BundleStore:
    """Thin view over the packed store dict — holds zero-copy plasma views,
    copies nothing."""

    def __init__(self, packed: Dict[str, object]):
        self.row_of = packed["row_of"]
        self.empty_row = packed["n"]
        self.w, self.c, self.tc, self.tj = packed["w"], packed["c"], packed["tc"], packed["tj"]
        self.w_n, self.c_n = packed["w_n"], packed["c_n"]
        self.mp_code = packed["mp_code"]
        self.has_tok = packed["has_tok"]
        self._txt_off = packed["txt_off"]
        self._txt_buf = packed["txt_buf"]

    def rows_for(self, ids) -> np.ndarray:
        er = self.empty_row
        ro = self.row_of
        return np.fromiter((ro.get(d, er) for d in ids), dtype=np.int64, count=len(ids))

    def texts_for(self, rows: np.ndarray) -> List[str]:
        off, buf = self._txt_off, self._txt_buf
        mv = memoryview(buf)
        return [str(mv[off[r]:off[r + 1]], "utf-8") for r in rows]


def _take2(csr3, rows: np.ndarray):
    """CSR row gather via the batch's UNIQUE rows: gather from the big store
    once per distinct doc, then fan out from the small cache-resident CSR.
    Pays off because candidate pairs arrive sorted by id_left (see
    blocking.candidate_pairs) — a batch holds ~batch/topk distinct left
    docs, so store traffic on that side drops ~topk×."""
    uniq, inv = np.unique(rows, return_inverse=True)
    if 2 * len(uniq) >= len(rows):
        return _csr_take(*csr3, rows)
    sub = _csr_take(*csr3, uniq)
    return _csr_take(*sub, inv)


def _take2_keys(indptr, indices, rows: np.ndarray):
    uniq, inv = np.unique(rows, return_inverse=True)
    if 2 * len(uniq) >= len(rows):
        return _csr_take_keys(indptr, indices, rows)
    sub_ptr, sub_idx = _csr_take_keys(indptr, indices, uniq)
    return _csr_take_keys(sub_ptr, sub_idx, inv)


def _features_from_store(batch: pa.Table, store: _BundleStore) -> pa.Table:
    rl = store.rows_for(batch["id_left"].to_pylist())
    rr = store.rows_for(batch["id_right"].to_pylist())
    n = len(rl)
    out: Dict[str, np.ndarray] = {}
    out["tfidf_word_cosine"] = strsim.rowwise_cosine_csr(
        *_take2(store.w, rl), *_take2(store.w, rr), n, max(store.w_n, 1)
    )
    out["tfidf_char_cosine"] = strsim.rowwise_cosine_csr(
        *_take2(store.c, rl), *_take2(store.c, rr), n, max(store.c_n, 1)
    )
    out["token_cosine"] = strsim.rowwise_cosine_hashed(
        *_take2(store.tc, rl), *_take2(store.tc, rr), n
    )
    ja_ptr, ja_keys = _take2_keys(store.tj[0], store.tj[1], rl)
    jb_ptr, jb_keys = _take2_keys(store.tj[0], store.tj[1], rr)
    out["token_jaccard"] = strsim.rowwise_jaccard_hashed(ja_ptr, ja_keys, jb_ptr, jb_keys, n)
    out["dmetaphone_match"] = np.where(
        store.has_tok[rl] & store.has_tok[rr],
        (store.mp_code[rl] == store.mp_code[rr]).astype(np.float64), 0.0,
    )
    # O(len²) kernels on unique (src_row, cand_row) combos only
    combo = rl * np.int64(store.empty_row + 1) + rr
    uniq, inverse = np.unique(combo, return_inverse=True)
    u_l = (uniq // np.int64(store.empty_row + 1)).astype(np.int64)
    u_r = (uniq % np.int64(store.empty_row + 1)).astype(np.int64)
    src_t = store.texts_for(u_l)
    cand_t = store.texts_for(u_r)
    lcs_u, edit_u = strsim.lcs_and_edit_batch(src_t, cand_t)
    jw_u = strsim.jaro_winkler_batch(src_t, cand_t)
    out["lcs_ratio"] = lcs_u[inverse]
    out["edit_ratio"] = edit_u[inverse]
    out["jaro_winkler"] = jw_u[inverse]
    for c in FEATURE_COLS:
        batch = batch.append_column(c, pa.array(out[c], type=pa.float64()))
    return batch


def pair_features_broadcast(
    pairs: Dataset,
    norm_docs: Dataset,
    vec_word: Vectorizer,
    vec_char: Vectorizer,
    # ~1k pairs × ~2k gathered nonzeros/pair keeps every kernel buffer in
    # the tens-of-MB range, where the allocator reuses arenas — large
    # batches page-fault 100MB+ temporaries per numpy op and run ~7× slower
    # under full-cluster parallelism (measured: 512→29.5s, 1024→26.9s,
    # 2048→36.2s for 3.03M pairs at 32 CPUs)
    batch_size: int = 1024,
    concurrency=None,
    max_strlen: int = 128,
) -> Dataset:
    """Feature scoring with a SHARED doc-side bundle store: doc analysis runs
    once per DOC (distributed tasks), the packed store is ray.put ONCE, and
    every scoring worker reads it as zero-copy plasma views — per-worker heap
    is O(batch), not O(corpus). Small-side path — the store must fit the
    object store (use attach_texts(mode="join") + :func:`pair_features`
    beyond that). Semantics identical to the text path (same fitted
    vectorizers, same kernels) — covered by the parity test."""
    refs = build_doc_bundles(norm_docs, vec_word, vec_char, max_strlen=max_strlen)
    packed_ref = _pack_store_task.remote(refs)
    key = packed_ref.hex()

    def score(batch: pa.Table, packed_ref=packed_ref, key=key) -> pa.Table:
        from ..state.worker_cache import cached_build

        store = cached_build(f"bundles:{key}", lambda: _BundleStore(ray.get(packed_ref)))
        return _features_from_store(batch, store)

    return pairs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


# ---------------------------------------------------------------------------
# the feature kernel
# ---------------------------------------------------------------------------
def _csr_take_keys(indptr: np.ndarray, indices: np.ndarray, rows: np.ndarray):
    """Keys-only CSR row gather (no value column)."""
    lens = np.diff(indptr)[rows]
    new_indptr = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=new_indptr[1:])
    total = int(new_indptr[-1])
    if total == 0:
        return new_indptr, np.empty(0, dtype=indices.dtype)
    starts = indptr[rows]
    gather = np.repeat(starts, lens) + (np.arange(total) - np.repeat(new_indptr[:-1], lens))
    return new_indptr, indices[gather]


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

    # token count cosine over HASHED token keys — identical cosine (collisions
    # aside, ~2^-64/pair) with no per-batch vocabulary fit; same construction
    # as the bundle-store path, so both feature paths agree exactly
    tc_off, tc_h, tc_c = _hashed_rows([_count_tokens(t) for t in uniq_list], with_counts=True)
    token_cos = strsim.rowwise_cosine_hashed(
        *_csr_take(tc_off, tc_h, tc_c, src_idx), *_csr_take(tc_off, tc_h, tc_c, cand_idx), n
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
    """Batch fn: pairs with src_text/cand_text → + 8 feature columns.
    Fitted vectorizers are read from the object store once per actor/worker."""

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
    """Score candidate pairs with the 8-feature kernel.

    Default: elastic tasks — the fitted vectorizers are fetched from the
    object store once per worker process (worker cache), so the stage uses
    every free CPU without pool sizing. Pass ``concurrency`` to force a
    bounded actor pool instead (memory-capped environments)."""
    vec_word_ref = ray.put(vec_word)
    vec_char_ref = ray.put(vec_char)
    if concurrency is not None:
        return pairs_with_texts.map_batches(
            FeatureActor,
            fn_constructor_kwargs={"vec_word_ref": vec_word_ref, "vec_char_ref": vec_char_ref,
                                   "max_strlen": max_strlen},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def score(batch: pa.Table, vw_ref=vec_word_ref, vc_ref=vec_char_ref, max_strlen=max_strlen) -> pa.Table:
        from ..state.worker_cache import cached_get

        vw = cached_get(vw_ref)
        vc = cached_get(vc_ref)
        src = [t or "" for t in batch["src_text"].to_pylist()]
        cand = [t or "" for t in batch["cand_text"].to_pylist()]
        feats = compute_pair_features(src, cand, vw, vc, max_strlen=max_strlen)
        for col in FEATURE_COLS:
            batch = batch.append_column(col, pa.array(feats[col], type=pa.float64()))
        return batch

    return pairs_with_texts.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )
