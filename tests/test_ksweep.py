"""A7 k-sweep diagnostics: distributed pipeline vs a driver-side numpy
reference implementing the same semantics (reference
visualize_k_value_for_blocking.py:109-156, with the documented divergence:
neighbors are the nonzero-cosine docs ranked by (-cosine, id), denominators
use retrieved counts)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from entity_resolution__ray.functions.text_norm import tokenize
from entity_resolution__ray.functions.vectorizer import blocking_tfidf
from entity_resolution__ray.stages.ksweep import (
    _acronyms,
    k_sweep_metrics,
    sweep_stopwords,
)

SF_DIR = "/root/testdata/sf0.001"


def _reference_sweep(ids, texts, k_values, jaccard_min=0.30):
    vec = blocking_tfidf().fit(texts)
    X = vec.transform_dense(texts)
    n = len(texts)
    terms = sorted(vec.vocabulary_, key=vec.vocabulary_.get)
    dfreq = {t: int(c) for t, c in zip(terms, (X > 0).sum(axis=0))}
    stop = sweep_stopwords(vec, dfreq, n)
    vocab = set(terms)
    imp = []
    for raw in texts:
        s = (set(tokenize(raw or "")) & vocab) - stop
        s |= _acronyms(raw or "")
        imp.append(s)

    sims = X @ X.T
    max_k = max(k_values)
    # per-rank accumulators, same cumulation as the stage
    cnt = np.zeros(max_k + 1)
    share = np.zeros(max_k + 1)
    jacc = np.zeros(max_k + 1)
    cos = np.zeros(max_k + 1)
    order_ids = np.asarray(ids)
    for i in range(n):
        nz = [(float(sims[i, j]), int(order_ids[j]), j) for j in range(n) if j != i and sims[i, j] > 0]
        nz.sort(key=lambda x: (-x[0], x[1]))
        for r, (s, _, j) in enumerate(nz[:max_k], start=1):
            cnt[r] += 1
            inter = len(imp[i] & imp[j])
            share[r] += 1.0 if inter else 0.0
            union = len(imp[i] | imp[j])
            jacc[r] += 1.0 if inter and union and inter / union >= jaccard_min else 0.0
            cos[r] += s
    rows = []
    cn, cs, cj, cc = cnt.cumsum(), share.cumsum(), jacc.cumsum(), cos.cumsum()
    for k in sorted(k for k in k_values if k < n):
        d = max(cn[k], 1.0)
        rows.append(
            {"k": k, "overlap_purity": cs[k] / d, "jaccard_purity": cj[k] / d,
             "avg_cosine": cc[k] / d,
             "reduction_ratio": 1.0 - (n * k) / (n * (n - 1))}
        )
    return pd.DataFrame(rows)


@pytest.mark.usefixtures("ray_session")
def test_k_sweep_matches_reference_impl():
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).limit(200)
    pdf = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    ks = [5, 10, 20]

    got = k_sweep_metrics(
        rd.from_pandas(pdf), k_values=ks, df_cap=10_000, num_buckets=8, num_join_partitions=4
    )
    want = _reference_sweep(pdf["doc_id"].tolist(), pdf["text"].tolist(), ks)

    assert got["k"].tolist() == want["k"].tolist()
    for col in ["overlap_purity", "jaccard_purity", "avg_cosine", "reduction_ratio"]:
        # float-sum order differs between dense matmul and inverted index;
        # equal-cosine rank flips move a metric by at most a few 1/(N*k)
        np.testing.assert_allclose(got[col], want[col], atol=5e-3, err_msg=col)


@pytest.mark.usefixtures("ray_session")
def test_k_sweep_monotone_reduction_and_bounds():
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).limit(120)
    out = k_sweep_metrics(docs, k_values=[5, 10, 40], df_cap=10_000, num_buckets=8)
    assert len(out) == 3
    rr = out["reduction_ratio"].to_numpy()
    assert (np.diff(rr) < 0).all()  # bigger k keeps more pairs
    for col in ["overlap_purity", "jaccard_purity"]:
        assert ((out[col] >= 0) & (out[col] <= 1)).all()
    # mean cosine over deeper neighbor lists cannot increase
    ac = out["avg_cosine"].to_numpy()
    assert (np.diff(ac) <= 1e-12).all()


@pytest.mark.usefixtures("ray_session")
def test_k_sweep_string_doc_ids():
    """The ER docs model has doc_id:string — the sweep must not coerce ids to
    int64 (regression: int64-coerced pairs joined against string important-token
    ids failed inside the hash-join sort). Zero-padded ids keep the lexical
    tie-break identical to the numeric one, so metrics must match exactly."""
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).limit(120)
    pdf = docs.to_pandas()
    ks = [5, 10]
    want = k_sweep_metrics(rd.from_pandas(pdf), k_values=ks, df_cap=10_000, num_buckets=8)
    spdf = pdf.assign(doc_id=pdf["doc_id"].map(lambda i: f"doc_{i:09d}"))
    got = k_sweep_metrics(rd.from_pandas(spdf), k_values=ks, df_cap=10_000, num_buckets=8)
    for col in ["overlap_purity", "jaccard_purity", "avg_cosine", "reduction_ratio"]:
        np.testing.assert_allclose(got[col], want[col], atol=1e-12, err_msg=col)
