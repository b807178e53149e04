"""Sequence packing (stages/packing): exact coverage, budget bound, chunking
of oversized docs, FFD behavior, determinism across partitionings."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from entity_resolution__ray.stages.packing import _ffd_pack, pack_sequences


def test_ffd_pack_respects_budget_and_covers_all():
    rng = np.random.RandomState(2)
    sizes = rng.randint(1, 900, 200)
    seq = _ffd_pack(sizes, 1000)
    df = pd.DataFrame({"s": sizes, "b": seq})
    per_bin = df.groupby("b")["s"].sum()
    assert (per_bin <= 1000).all()
    assert len(seq) == len(sizes)
    # FFD on sizes ≤ budget/2 wastes < 50%: crude sanity on bin count
    assert per_bin.count() <= int(np.ceil(sizes.sum() / 500))


def _mk_docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_pack_sequences_exact_coverage_and_budget(ray_session):
    rng = np.random.RandomState(6)
    texts = [" ".join(f"w{j}" for j in range(rng.randint(1, 120))) for _ in range(150)]
    texts += ["", "   "]  # degenerate docs must still be covered
    out = pack_sequences(_mk_docs(texts), budget=128, num_buckets=8).to_pandas()

    assert (out["total_tokens"] <= 128).all()
    members = [
        (int(d), int(c))
        for dl, cl in zip(out["doc_ids"], out["chunk_idxs"])
        for d, c in zip(dl, cl)
    ]
    # every doc exactly once (all are under budget → single chunk 0)
    assert sorted(members) == [(i, 0) for i in range(len(texts))]
    # totals conserve tokens
    n_tok = sum(len(t.split()) for t in texts)
    assert int(out["total_tokens"].sum()) == n_tok
    assert (out["n_docs"] == out["doc_ids"].map(len)).all()


def test_pack_sequences_chunks_oversized_docs(ray_session):
    big = " ".join(f"t{j}" for j in range(1000))  # 1000 tokens, budget 300
    texts = [big, "a b c"]
    out = pack_sequences(_mk_docs(texts), budget=300, num_buckets=4).to_pandas()
    members = [
        (int(d), int(c))
        for dl, cl in zip(out["doc_ids"], out["chunk_idxs"])
        for d, c in zip(dl, cl)
    ]
    # doc 0 split into ceil(1000/300)=4 chunks, each ≤ 300; doc 1 whole
    assert sorted(m for m in members if m[0] == 0) == [(0, 0), (0, 1), (0, 2), (0, 3)]
    assert (1, 0) in members
    assert (out["total_tokens"] <= 300).all()
    assert int(out["total_tokens"].sum()) == 1003


def test_pack_sequences_deterministic_across_partitioning(ray_session):
    rng = np.random.RandomState(8)
    texts = [" ".join(f"w{j}" for j in range(rng.randint(1, 60))) for _ in range(120)]
    a = pack_sequences(_mk_docs(texts).repartition(2), budget=100).to_pandas()
    b = pack_sequences(_mk_docs(texts).repartition(13), budget=100).to_pandas()
    a = a.sort_values("seq_id").reset_index(drop=True)
    b = b.sort_values("seq_id").reset_index(drop=True)
    assert a["seq_id"].tolist() == b["seq_id"].tolist()
    assert a["doc_ids"].map(list).tolist() == b["doc_ids"].map(list).tolist()
    assert a["total_tokens"].tolist() == b["total_tokens"].tolist()
