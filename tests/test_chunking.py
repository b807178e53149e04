"""Unit tests for stages/chunking.py (overlapping word-window chunking)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution__ray.stages.chunking import chunk_batch, chunk_documents


def ref_chunks(rows, chunk_words, stride_words):
    """Row-at-a-time reference implementation of the documented semantics."""
    out = []
    for doc_id, text in rows:
        words = (text or "").split()  # ASCII-whitespace split of trimmed text
        for start in range(0, len(words), stride_words):
            piece = words[start : start + chunk_words]
            out.append((doc_id, start + 1, len(piece), " ".join(piece)))
    return sorted(out)


def got_chunks(table_out):
    df = table_out.to_pandas()
    return sorted(
        zip(df["doc_id"], df["chunk_start"].astype(int), df["n_chunk_words"].astype(int), df["chunk_text"])
    )


CASES = [
    (3, 2),   # overlap 1
    (4, 4),   # disjoint
    (2, 5),   # stride > chunk: gaps (words skipped is allowed semantics)
    (64, 48), # defaults-shaped
]


@pytest.mark.parametrize("chunk_words,stride_words", CASES)
def test_chunk_batch_matches_reference(chunk_words, stride_words):
    rows = [
        (1, "a b c d e f g"),
        (2, "  one   two\tthree  "),
        (3, ""),
        (4, "   \t  "),
        (5, "solo"),
        (6, None),
        (7, " ".join(f"w{i}" for i in range(137))),
    ]
    t = pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    out = chunk_batch(t, chunk_words=chunk_words, stride_words=stride_words)
    assert got_chunks(out) == ref_chunks(rows, chunk_words, stride_words)


def test_chunk_batch_whitespace_runs_collapse():
    t = pa.table({"doc_id": [1], "text": ["a\n\nb\t \tc"]})
    out = chunk_batch(t, chunk_words=2, stride_words=2)
    assert got_chunks(out) == [(1, 1, 2, "a b"), (1, 3, 1, "c")]


def test_chunk_batch_rejects_bad_params():
    t = pa.table({"doc_id": [1], "text": ["a"]})
    with pytest.raises(ValueError):
        chunk_batch(t, chunk_words=0, stride_words=1)
    with pytest.raises(ValueError):
        chunk_batch(t, chunk_words=1, stride_words=0)


def test_chunk_documents_dataset(ray_session):
    rng = np.random.default_rng(7)
    texts = [" ".join(f"t{rng.integers(0, 50)}" for _ in range(int(n))) for n in rng.integers(0, 40, size=60)]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(60)), "text": texts}))
    out = chunk_documents(ds, chunk_words=8, stride_words=5).to_pandas()
    want = ref_chunks(list(enumerate(texts)), 8, 5)
    got = sorted(zip(out["doc_id"], out["chunk_start"], out["n_chunk_words"], out["chunk_text"]))
    assert got == want
    # every chunk is non-empty and within bounds
    assert (out["n_chunk_words"] >= 1).all() and (out["n_chunk_words"] <= 8).all()


def test_chunk_then_pack_token_conservation(ray_session):
    """The composed chunk→pack pipeline: every source word lands in exactly
    one training sequence (stride = chunk_words), every sequence respects
    the budget, and the composition is deterministic."""
    from entity_resolution__ray.stages.chunking import chunk_then_pack

    rng = np.random.default_rng(11)
    texts = [" ".join(f"w{rng.integers(0, 99)}" for _ in range(int(n)))
             for n in rng.integers(0, 120, size=80)]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(80)), "text": texts}))

    out = chunk_then_pack(ds, chunk_words=16, budget=48, num_buckets=8).to_pandas()

    n_words = sum(len(t.split()) for t in texts)
    assert int(out["total_tokens"].sum()) == n_words  # exact conservation
    assert (out["total_tokens"] <= 48).all()          # budget bound
    assert int(out["n_docs"].sum()) == len(out["doc_ids"].explode().dropna())
    # each chunk appears in exactly one sequence
    uids = out["doc_ids"].explode().dropna()
    assert uids.is_unique
    # chunk uid decodes back to (doc_id, chunk_start) within range
    did = uids.to_numpy().astype(np.int64) >> 32
    assert np.isin(did, np.arange(80)).all()

    # determinism: identical result on a re-run
    out2 = chunk_then_pack(ds, chunk_words=16, budget=48, num_buckets=8).to_pandas()
    a = out.sort_values("seq_id").reset_index(drop=True)
    b = out2.sort_values("seq_id").reset_index(drop=True)
    assert a["seq_id"].tolist() == b["seq_id"].tolist()
    assert a["total_tokens"].tolist() == b["total_tokens"].tolist()
    assert [list(x) for x in a["doc_ids"]] == [list(x) for x in b["doc_ids"]]


def test_chunk_then_pack_overlap_conserves_chunk_words(ray_session):
    # with overlap, conservation holds against the CHUNK table
    from entity_resolution__ray.stages.chunking import chunk_documents, chunk_then_pack

    texts = [" ".join(f"x{i}_{j}" for j in range(30)) for i in range(20)]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(20)), "text": texts}))
    chunks = chunk_documents(ds, chunk_words=8, stride_words=5).to_pandas()
    out = chunk_then_pack(ds, chunk_words=8, stride_words=5, budget=32).to_pandas()
    assert int(out["total_tokens"].sum()) == int(chunks["n_chunk_words"].sum())
