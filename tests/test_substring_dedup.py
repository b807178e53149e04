"""Unit tests for stages/substring_dedup.py (exact substring dedup)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution__ray.stages.substring_dedup import (
    _utf8_buffers,
    _window_hashes,
    substring_dup_pairs,
    window_fingerprints,
)


def naive_pairs(texts, window):
    wins = [
        {(t or "")[j : j + window] for j in range(max(0, len(t or "") - window + 1))}
        for t in texts
    ]
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if wins[i] & wins[j]:
                out.add((i, j))
    return out


def ds_of(texts):
    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(3)


RUN = "the quick brown fox jumps over the lazy dog again and again"
TEXTS = [
    "prefix one " + RUN + " suffix alpha",
    "prefix two " + RUN + " suffix beta",          # shares RUN with doc 0
    "totally unrelated content with no overlap at all whatsoever here",
    "another distinct document about graph algorithms and spectra",
    RUN,                                            # equals the shared run exactly
    "short",
    "",
    None,
]


def got_pairs(ds_out):
    df = ds_out.to_pandas()
    return set(zip(df["id_left"], df["id_right"]))


def test_pairs_match_naive_reference(ray_session):
    got = got_pairs(substring_dup_pairs(ds_of(TEXTS), window=24))
    assert got == naive_pairs(TEXTS, 24)
    assert (0, 1) in got and (0, 4) in got and (1, 4) in got


def test_window_hashes_cross_doc_boundary_never(ray_session):
    # two docs whose concatenation contains a window neither doc has
    texts = ["aaaa", "bbbb"]
    data, off = _utf8_buffers(pa.array(texts))
    doc, h = _window_hashes(data, off, 4)
    assert len(h) == 2 and doc.tolist() == [0, 1]
    assert h[0] != h[1]


def test_mod_p_sampling_is_content_defined(ray_session):
    full = got_pairs(substring_dup_pairs(ds_of(TEXTS), window=24, mod_p=1))
    sampled = got_pairs(substring_dup_pairs(ds_of(TEXTS), window=24, mod_p=4))
    # sampling only removes pairs, never invents them
    assert sampled <= full
    # the long shared run (37 windows at w=24) survives p=4 w.h.p. — and
    # deterministically for THIS fixture (content-defined selection is a
    # pure function of the bytes, so this assertion is stable)
    assert (0, 1) in sampled


def test_giant_group_star_cap(ray_session):
    # 6 docs all sharing one window → group size 6; cap at 4 → star spokes
    texts = [f"doc{i} " + "Z" * 40 for i in range(6)]
    full = got_pairs(substring_dup_pairs(ds_of(texts), window=32, max_group_size=100))
    star = got_pairs(substring_dup_pairs(ds_of(texts), window=32, max_group_size=4))
    assert len(full) == 15
    # star keeps every member attached to the group's min id (transitivity
    # for downstream CC preserved), but not the full clique
    assert star < full
    assert {(0, i) for i in range(1, 6)} <= star


def test_auto_cap_engages_only_on_dup_dense(ray_session):
    from entity_resolution__ray.stages.substring_dedup import (
        probe_window_group_stats, substring_dup_clusters)

    # dup-dense: 40 docs all sharing one 40-byte run → one group of 40
    # (full triu = 780 pairs ≫ 8 × 40 key rows) → auto must cap
    dense = [f"doc{i} " + "Q" * 40 for i in range(40)]
    n_full = substring_dup_pairs(ds_of(dense), window=32).count()
    n_auto = substring_dup_pairs(ds_of(dense), window=32, max_group_size="auto").count()
    assert n_full == 40 * 39 // 2
    assert n_auto < n_full  # star spokes, not the clique

    # ordinary corpus (TEXTS: one shared run between docs 0/1): auto must
    # take the exact full-triu path — identical pair set
    p_full = got_pairs(substring_dup_pairs(ds_of(TEXTS), window=32))
    p_auto = got_pairs(substring_dup_pairs(ds_of(TEXTS), window=32, max_group_size="auto"))
    assert p_auto == p_full

    # the probe itself: sample_mod=1 sees every group exactly
    keys = window_fingerprints(ds_of(dense), window=32)
    stats = probe_window_group_stats(keys, sample_mod=1)
    assert stats["max_group_size"] == 40
    assert stats["est_pairs"] >= 40 * 39 // 2

    # CC downstream: capped and uncapped give IDENTICAL components
    for mgs in ("auto", None):
        out = substring_dup_clusters(ds_of(dense), window=32, max_group_size=mgs).to_pandas()
        assert sorted(out["doc_id"]) == list(range(40))
        assert set(out["dup_group"]) == {0}


def test_rejects_bad_params(ray_session):
    with pytest.raises(ValueError):
        window_fingerprints(ds_of(["ab"]), window=1)
    with pytest.raises(ValueError):
        window_fingerprints(ds_of(["ab"]), mod_p=0)
