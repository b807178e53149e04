"""Exact set-similarity self-join (stages/setsim): prefix-filter
completeness against a brute-force reference, plus the prefix-length bound."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from entity_resolution__ray.stages.setsim import prefix_lengths, set_similarity_join


def _brute_force(texts, threshold, shingle="word2"):
    """Reference Jaccard over word-bigram sets (single-word fallback)."""
    def grams(t):
        ws = t.split()
        if not ws:
            return frozenset()
        if len(ws) < 2:
            return frozenset(ws)
        return frozenset(f"{a} {b}" for a, b in zip(ws, ws[1:]))

    sets = [grams(t) for t in texts]
    out = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                out[(i, j)] = jac
    return out


def _docs_ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_prefix_lengths_bound():
    n = np.array([0, 1, 2, 5, 10, 100])
    p = prefix_lengths(n, 0.4)
    # p = n - ceil(0.4 n) + 1, floored at 1 for non-empty, 0 for empty
    assert p.tolist() == [0, 1, 2, 4, 7, 61]
    # threshold 1.0 → prefix of exactly 1 token (identical sets must share
    # their first token)
    assert prefix_lengths(n, 1.0).tolist() == [0, 1, 1, 1, 1, 1]


def test_set_similarity_join_matches_brute_force(ray_session):
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 15))) for _ in range(60)]
    # plant near-duplicates: copies with one word changed
    for i in range(0, 20, 4):
        ws = texts[i].split()
        ws[len(ws) // 2] = "zz"
        texts.append(" ".join(ws))
    want = _brute_force(texts, 0.4)

    out = set_similarity_join(_docs_ds(texts), threshold=0.4).to_pandas()
    got = {(int(r.id_left), int(r.id_right)): float(r.jaccard) for r in out.itertuples()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-4
    assert len(want) > 0  # the planted dups actually qualify


def test_set_similarity_join_degenerate_rows(ray_session):
    # empty, whitespace-only, and single-word docs must not crash or pair up
    texts = ["", "   ", "hello", "hello", "a b c d", "a b c d"]
    out = set_similarity_join(_docs_ds(texts), threshold=0.5).to_pandas()
    got = {(int(r.id_left), int(r.id_right)) for r in out.itertuples()}
    # identical single-word docs share their 1-token shingle set (jaccard 1)
    assert (2, 3) in got and (4, 5) in got
    # empty-ish docs emit no prefix keys and never appear
    assert all(l not in (0, 1) and r not in (0, 1) for l, r in got)


def test_prefix_lengths_float_ceil_safe():
    # IEEE hazard: 0.55*100 rounds to 55.000000000000007 → naive ceil gives
    # 56, shortening the prefix below the completeness bound. The exact
    # rational ceil(55/100*100) is 55, so p must be 100-55+1 = 46.
    p = prefix_lengths(np.array([100]), 0.55)
    assert p.tolist() == [46]
    p = prefix_lengths(np.array([200, 220]), 0.55)
    assert p.tolist() == [200 - 110 + 1, 220 - 121 + 1]


def test_hash_order_path_matches_brute_force(ray_session):
    # order="hash" (zero-state proxy) must stay exact too
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(20)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 12))) for _ in range(50)]
    for i in range(0, 12, 3):
        texts.append(texts[i])
    want = _brute_force(texts, 0.5)
    out = set_similarity_join(_docs_ds(texts), threshold=0.5, order="hash").to_pandas()
    got = {(int(r.id_left), int(r.id_right)): float(r.jaccard) for r in out.itertuples()}
    assert set(got) == set(want)
    assert len(want) > 0


def test_df_order_reduces_candidates_on_skewed_vocab(ray_session):
    """Frequency-ordered prefixes demote corpus-hot tokens out of the prefix
    (the point of PPJoin's DF order): on a boilerplate-heavy corpus the
    candidate count must shrink vs hash order while the exact join result is
    unchanged."""
    from entity_resolution__ray.stages.setsim import (
        PrefixFilterKeys, _candidates_from_prefix_groups, fit_shingle_df)

    # heavy shared boilerplate prefix + a few unique tokens per doc
    hot = "terms of service apply all rights reserved contact us at"
    texts = [
        f"{hot} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h" for i in range(80)
    ]
    texts += [texts[0], texts[5]]  # two true dups
    ds = _docs_ds(texts)

    def n_cands(df_refs, df_key):
        keyer = PrefixFilterKeys(threshold=0.4, df_refs=df_refs, df_key=df_key)
        keys = ds.map_batches(lambda t, k=keyer: k(t), batch_format="pyarrow")
        return _candidates_from_prefix_groups(keys, 0.4).count()

    refs, key = fit_shingle_df(ds)
    n_hash = n_cands(None, "")
    n_df = n_cands(refs, key)
    assert n_df < n_hash, (n_df, n_hash)

    want = _brute_force(texts, 0.4)
    for order in ("df", "hash"):
        out = set_similarity_join(ds, threshold=0.4, order=order).to_pandas()
        got = {(int(r.id_left), int(r.id_right)) for r in out.itertuples()}
        assert got == set(want), order


def test_set_similarity_join_brute_force_at_filter_heavy_thresholds(ray_session):
    # exercise the length + positional prunes: wide spread of set sizes and
    # thresholds where the prunes fire (the brute force is the completeness
    # oracle — any over-pruning shows up as a missing pair)
    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab, size=s))
        for s in rng.randint(2, 40, size=80)
    ]
    # planted near-dups across very different lengths
    for i in range(0, 30, 5):
        ws = texts[i].split()
        texts.append(" ".join(ws + ["extra"]))
    for threshold in (0.4, 0.55, 0.7):
        want = _brute_force(texts, threshold)
        out = set_similarity_join(_docs_ds(texts), threshold=threshold).to_pandas()
        got = {(int(r.id_left), int(r.id_right)): float(r.jaccard) for r in out.itertuples()}
        assert set(got) == set(want), f"threshold {threshold}"
        assert len(want) > 0


def test_df_order_vocab_truncation_stays_exact(ray_session):
    # max_vocab smaller than the hot-token count: truncation may only degrade
    # candidate counts, never correctness (any consistent total order works)
    rng = np.random.RandomState(13)
    vocab = [f"v{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(4, 12))) for _ in range(40)]
    texts += [texts[1], texts[7]]
    want = _brute_force(texts, 0.5)
    out = set_similarity_join(_docs_ds(texts), threshold=0.5, order="df",
                              max_vocab=2).to_pandas()
    got = {(int(r.id_left), int(r.id_right)) for r in out.itertuples()}
    assert got == set(want)
    assert len(want) > 0
