"""Tests for the remaining SURVEY §2 operators: M12 acronyms, A7 blocking
quality, C6 edges-from-predictions, C8 cluster graph re-wiring, J4 anti-join."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.blocking import acronyms_column, blocking_quality_metrics
from entity_resolution__ray.stages.clustering import cluster_graph_edges, edges_from_predictions
from entity_resolution__ray.stages.joins import broadcast_anti_join


def test_acronyms_column():
    col = pa.array(["IBM and NASA visited the USA", "no acronyms here", ""])
    out = acronyms_column(col).to_pylist()
    assert out[0] == ["IBM", "NASA", "USA"]
    assert out[1] == []
    assert out[2] == []


def test_blocking_quality_metrics():
    pairs = pd.DataFrame({"id_left": ["a"], "id_right": ["b"]})
    toks = {"a": ["x", "y"], "b": ["y", "z"]}
    m = blocking_quality_metrics(pairs, n_docs=4, id_to_tokens=toks)
    assert m["n_pairs"] == 1
    assert m["mean_pair_jaccard"] == pytest.approx(1 / 3)
    assert m["reduction_ratio"] == pytest.approx(1 - 1 / 6)


def test_edges_from_predictions(ray_session):
    ds = rd.from_items(
        [
            {"id_left": "a", "id_right": "b", "prob_match": 0.5},
            {"id_left": "b", "id_right": "a", "prob_match": 0.7},  # same pair? no: (b,a) != (a,b) canonical
            {"id_left": "a", "id_right": "b", "prob_match": 0.6},  # dup pair keep max
            {"id_left": "c", "id_right": "c", "prob_match": 0.9},  # self loop dropped
            {"id_left": "d", "id_right": "e", "prob_match": 0.1},  # below threshold
        ],
        override_num_blocks=1,
    )
    out = edges_from_predictions(ds, keep_threshold=0.45).to_pandas()
    got = {(r.id_left, r.id_right): r.weight for r in out.itertuples()}
    assert got[("a", "b")] == 0.6
    assert got[("b", "a")] == 0.7
    assert ("c", "c") not in got and ("d", "e") not in got


def test_cluster_graph_edges_chain_and_star(ray_session):
    clusters = rd.from_items(
        [
            {"node_id": "a", "cluster_id": 0},
            {"node_id": "b", "cluster_id": 0},
            {"node_id": "c", "cluster_id": 0},
            {"node_id": "z", "cluster_id": 1},
        ],
        override_num_blocks=1,
    )
    chain = cluster_graph_edges(clusters, "chain").to_pandas()
    assert set(zip(chain["u"], chain["v"])) == {("a", "b"), ("b", "c")}
    star = cluster_graph_edges(clusters, "star").to_pandas()
    assert set(zip(star["u"], star["v"])) == {("a", "b"), ("a", "c")}
    assert (chain["weight"] == 1.0).all()


def test_broadcast_anti_and_semi_join(ray_session):
    ds = rd.from_items(
        [{"id_left": "a", "id_right": "b"}, {"id_left": "c", "id_right": "d"}],
        override_num_blocks=1,
    )
    pruned = broadcast_anti_join(ds, {("a", "b")}, on=["id_left", "id_right"]).to_pandas()
    assert pruned["id_left"].tolist() == ["c"]
    kept = broadcast_anti_join(ds, {("a", "b")}, on=["id_left", "id_right"], semi=True).to_pandas()
    assert kept["id_left"].tolist() == ["a"]


def test_distributed_anti_and_semi_join(ray_session):
    from entity_resolution__ray.stages.joins import distributed_anti_join

    left = rd.from_items(
        [{"k": i, "name": f"n{i}"} for i in range(10)], override_num_blocks=2
    )
    right = rd.from_items(
        [{"k": i} for i in [1, 3, 3, 5, 7, 9, 42]], override_num_blocks=2
    )
    anti = distributed_anti_join(left, right, on=["k"]).to_pandas()
    assert sorted(anti["k"].tolist()) == [0, 2, 4, 6, 8]
    assert set(anti.columns) == {"k", "name"}
    semi = distributed_anti_join(left, right, on=["k"], semi=True).to_pandas()
    assert sorted(semi["k"].tolist()) == [1, 3, 5, 7, 9]


def test_distributed_anti_join_multikey(ray_session):
    from entity_resolution__ray.stages.joins import distributed_anti_join

    left = rd.from_items(
        [{"a": "x", "b": 1, "v": 10}, {"a": "x", "b": 2, "v": 20}, {"a": "y", "b": 1, "v": 30}]
    )
    right = rd.from_items([{"a": "x", "b": 1}, {"a": "y", "b": 9}])
    anti = distributed_anti_join(left, right, on=["a", "b"]).to_pandas()
    assert sorted(anti["v"].tolist()) == [20, 30]
    semi = distributed_anti_join(left, right, on=["a", "b"], semi=True).to_pandas()
    assert semi["v"].tolist() == [10]


def test_bloom_prefilter_join_parity_and_selectivity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from entity_resolution__ray.stages.joins import (
        bloom_prefilter, build_bloom_filter, distributed_anti_join, hash_join)

    rng = np.random.RandomState(21)
    small = pd.DataFrame({"k": rng.choice(100_000, 300, replace=False).astype(np.int64)})
    small["v"] = small["k"] * 2
    large = pd.DataFrame({"k": rng.randint(0, 100_000, 20_000).astype(np.int64),
                          "payload": np.arange(20_000, dtype=np.int64)})

    bm = build_bloom_filter(rd.from_pandas(small), on=["k"], num_bits=1 << 14)
    pre = bloom_prefilter(rd.from_pandas(large), bm, on=["k"])

    # no false negatives: the exact join over the prefiltered probe equals
    # the exact join over the raw probe
    j_pre = hash_join(pre, rd.from_pandas(small), on=["k"]).to_pandas()
    j_raw = hash_join(rd.from_pandas(large), rd.from_pandas(small), on=["k"]).to_pandas()
    key = ["k", "payload"]
    assert (j_pre.sort_values(key).reset_index(drop=True)[["k", "payload", "v"]]
            .equals(j_raw.sort_values(key).reset_index(drop=True)[["k", "payload", "v"]]))

    # selectivity: ~0.3% true match rate; the prefilter must drop the bulk
    n_pre = pre.count()
    assert n_pre < 2_000, n_pre  # ≥90% dropped even with false positives

    # semi-join composition path (false positives removed by the exact step)
    semi = distributed_anti_join(pre, rd.from_pandas(small), on=["k"], semi=True).to_pandas()
    want = large[large["k"].isin(set(small["k"]))]
    assert sorted(semi["payload"]) == sorted(want["payload"])


def test_hash_join_nested_payload_arrow_native(ray_session):
    """List-typed payloads sit out of the Acero join behind a row index and
    are gathered back — inner and left-outer (null fill) must both be exact."""
    import pyarrow as pa
    import ray.data as rd

    from entity_resolution__ray.stages.joins import hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "vec": pa.array([[1.0, 2.0], [3.0], [], [4.0, 5.0]], pa.list_(pa.float64())),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 5], pa.int64()),
        "tags": pa.array([["a"], ["b", "c"], ["d"]], pa.list_(pa.string())),
        "w": pa.array([20, 30, 50], pa.int64()),
    }))

    inner = hash_join(left, right, on=["k"]).to_pandas().sort_values("k").reset_index(drop=True)
    assert inner["k"].tolist() == [2, 3]
    assert [list(x) for x in inner["vec"]] == [[3.0], []]
    assert [list(x) for x in inner["tags"]] == [["a"], ["b", "c"]]
    assert inner["w"].tolist() == [20, 30]

    louter = hash_join(left, right, on=["k"], how="left").to_pandas().sort_values("k").reset_index(drop=True)
    assert louter["k"].tolist() == [1, 2, 3, 4]
    assert [list(x) for x in louter["vec"]] == [[1.0, 2.0], [3.0], [], [4.0, 5.0]]
    assert louter["tags"].tolist()[0] is None and louter["tags"].tolist()[3] is None
    assert [list(x) for x in louter["tags"].tolist()[1:3]] == [["a"], ["b", "c"]]
