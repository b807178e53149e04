"""Unit tests for stages/dsir.py (hashed n-gram importance weighting)."""

import hashlib
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from entity_resolution__ray.stages.dsir import (
    bucket_counts,
    dsir_lambda,
    dsir_scores,
    dsir_weights,
)

B = 127  # small bucket count so collisions are exercised


def ref_features(text):
    toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def ref_bucket(f):
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B


def ds_of(texts):
    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(3)


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "quantum flux capacitors resonate",
    "",
    None,
    "the the the",
]


def test_bucket_counts_match_reference(ray_session):
    got = bucket_counts(ds_of(TEXTS), n_buckets=B)
    want = np.zeros(B, dtype=np.int64)
    for txt in TEXTS:
        for f in ref_features(txt):
            want[ref_bucket(f)] += 1
    assert (got == want).all()


def test_dsir_scores_match_reference(ray_session):
    target = TEXTS[:2]
    cs = bucket_counts(ds_of(TEXTS), n_buckets=B)
    ct = bucket_counts(ds_of(target), n_buckets=B)
    lam = dsir_lambda(ct, cs)
    assert lam.dtype == np.int64
    got = dsir_scores(ds_of(TEXTS), lam).to_pandas().sort_values("doc_id")
    want = [
        sum(int(lam[ref_bucket(f)]) for f in ref_features(txt)) for txt in TEXTS
    ]
    assert got["dsir_score"].tolist() == want
    # empty / null docs score exactly 0
    assert got["dsir_score"].tolist()[3] == 0 and got["dsir_score"].tolist()[4] == 0


def test_dsir_end_to_end_ranks_target_like_docs_higher(ray_session):
    source = [
        "the cat sat on the mat",
        "cat on a mat the cat sat",
        "stochastic gradient descent converges slowly",
        "eigenvalue decomposition of sparse matrices",
    ]
    target = ["the cat sat on the mat", "cat on a mat"]
    out = (
        dsir_weights(ds_of(source), ds_of(target), n_buckets=1021, quantize=False)
        .to_pandas()
        .sort_values("doc_id")
    )
    scores = out["dsir_score"].tolist()
    assert min(scores[0], scores[1]) > max(scores[2], scores[3])


def test_dsir_unquantized_returns_floats(ray_session):
    cs = bucket_counts(ds_of(TEXTS), n_buckets=B)
    ct = bucket_counts(ds_of(TEXTS[:1]), n_buckets=B)
    lam = dsir_lambda(ct, cs, quantize=False)
    assert lam.dtype == np.float64
    out = dsir_scores(ds_of(TEXTS), lam).to_pandas()
    assert out["dsir_score"].dtype == np.float64
