"""End-to-end ER pipeline tests (BASELINE.md targets):
  * pairwise F1 ≥ 0.99 on golden labeled pairs at matched blocking keys
  * per-row span-sequence invariant end to end
  * stage-checkpoint resume (workdir rerun skips finished stages)
"""

import os

import pyarrow.parquet as pq
import pytest

import ray.data as rd

from entity_resolution__ray.pipelines.er_pipeline import (
    ERConfig,
    evaluate_pairwise_f1,
    run_er_pipeline,
)


@pytest.fixture(scope="module")
def pipeline_run(ray_session, fixture_corpus, tmp_path_factory):
    docs = rd.read_parquet(fixture_corpus["docs"])
    golden_pairs = pq.read_table(fixture_corpus["golden_pairs"])
    workdir = str(tmp_path_factory.mktemp("er_wd"))
    out = run_er_pipeline(
        docs,
        labeled_pairs=golden_pairs,
        workdir=workdir,
        config=ERConfig(num_partitions=4),
    )
    return out, golden_pairs, workdir, fixture_corpus


def test_pairwise_f1_at_matched_blocking_keys(pipeline_run):
    out, golden_pairs, _, _ = pipeline_run
    m = evaluate_pairwise_f1(out["edges"], golden_pairs, out["candidate_pairs"])
    assert m["n_eval"] > 1000
    assert m["f1"] >= 0.99, m


def test_pairwise_f1_gate_raises_on_oversized_input(pipeline_run):
    # the eval collects pairs on the driver; an oversized run must raise
    # instead of OOM (VERDICT r3 #4)
    out, golden_pairs, _, _ = pipeline_run
    with pytest.raises(ValueError, match="max_driver_pairs"):
        evaluate_pairwise_f1(
            out["edges"], golden_pairs, out["candidate_pairs"], max_driver_pairs=10
        )


def test_span_sequence_invariant_end_to_end(pipeline_run):
    out, _, _, corpus = pipeline_run
    orig = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in pq.read_table(corpus["docs"]).to_pylist()
    }
    got_rows = out["normalized"].select_columns(["doc_id", "spans"]).take_all()
    assert len(got_rows) == len(orig)
    for r in got_rows:
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        assert got == orig[r["doc_id"]], r["doc_id"]


def test_clusters_mostly_pure_vs_golden(pipeline_run):
    out, _, _, corpus = pipeline_run
    golden = {r["doc_id"]: r["cluster_id"] for r in pq.read_table(corpus["golden_clusters"]).to_pylist()}
    rows = out["clusters_cc"].take_all()
    assert len(rows) > 0
    # purity: within each predicted cluster, fraction of nodes whose golden
    # entity equals the cluster's majority entity
    from collections import Counter, defaultdict

    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(golden[r["node_id"]])
    pure = sum(Counter(v).most_common(1)[0][1] for v in by_cluster.values())
    total = sum(len(v) for v in by_cluster.values())
    assert pure / total > 0.97, f"cluster purity {pure/total:.3f}"


def test_transitive_clusters_exist_and_sorted(pipeline_run):
    out, _, _, _ = pipeline_run
    df = out["clusters_transitive"].to_pandas()
    assert list(df.columns) == ["node_id", "cluster_id", "cluster_size"]
    assert (df.sort_values(["cluster_id", "node_id"]).reset_index(drop=True) == df).all().all()
    assert df["cluster_size"].ge(2).all()  # seeds require an edge → no singletons


def test_lineage_manifests_written(pipeline_run):
    _, _, workdir, _ = pipeline_run
    from entity_resolution__ray.pipelines.lineage import read_manifest

    for stage in ["01_normalized", "02_candidate_pairs", "03_pair_features", "04_edges",
                  "05_edge_verdicts", "06_edges_filtered", "08_clusters_cc"]:
        m = read_manifest(workdir, stage)
        assert m["rows_out"] > 0
        assert m["partitions"], stage
        assert m["wall_s"] >= 0
    # rows in/out/dropped are threaded between consecutive stages (north_rule:
    # per-partition lineage records drop counts) — the constraint stage drops
    m6 = read_manifest(workdir, "06_edges_filtered")
    assert m6["rows_in"] is not None
    assert m6["rows_dropped"] is not None and m6["rows_dropped"] >= 0
    m5 = read_manifest(workdir, "05_edge_verdicts")
    assert m5["rows_in"] is not None and m5["rows_dropped"] is not None


def test_rerun_skips_finished_stages(pipeline_run, fixture_corpus):
    out, golden_pairs, workdir, _ = pipeline_run
    docs = rd.read_parquet(fixture_corpus["docs"])
    import time

    t0 = time.time()
    out2 = run_er_pipeline(
        docs, labeled_pairs=golden_pairs, workdir=workdir, config=ERConfig(num_partitions=4)
    )
    resume_wall = time.time() - t0
    # all heavy stages skipped: clusters identical, and the rerun is fast
    df1 = out["clusters_cc"].to_pandas().sort_values(["cluster_id", "node_id"]).reset_index(drop=True)
    df2 = out2["clusters_cc"].to_pandas().sort_values(["cluster_id", "node_id"]).reset_index(drop=True)
    assert df1.equals(df2)
    assert resume_wall < 120


def test_model_name_threads_through_config(ray_session, fixture_corpus, tmp_path):
    """--model-name must reach the trainer: a run requesting xgb trains xgb
    (round-2 defect: run_pipeline accepted --model-name but always trained
    the logreg default)."""
    docs = rd.read_parquet(fixture_corpus["docs"])
    golden_pairs = pq.read_table(fixture_corpus["golden_pairs"])
    out = run_er_pipeline(
        docs,
        labeled_pairs=golden_pairs,
        workdir=None,
        config=ERConfig(
            num_partitions=4,
            model_name="xgb",
            gbt_params={"n_estimators": 20},
            run_cohort_transitivity=False,
        ),
    )
    assert out["model"].metrics["model"] == "xgb"
    assert out["clusters_cc"].count() > 0


def test_auto_scale_probe_and_forced_join_parity(ray_session, fixture_corpus):
    """The 100-TB path-selection gate: (a) the default auto probe keeps the
    broadcast/bundle/dense paths on a small corpus; (b) a tiny broadcast
    budget flips the SAME config to the beyond-object-store join/hash paths;
    (c) both runs produce the identical cluster partition."""
    docs = rd.read_parquet(fixture_corpus["docs"])
    golden_pairs = pq.read_table(fixture_corpus["golden_pairs"])

    base = run_er_pipeline(
        docs, labeled_pairs=golden_pairs, workdir=None,
        config=ERConfig(num_partitions=4),
    )
    sp = base["scale_paths"]
    assert sp["features_mode"] == "bundles"
    assert sp["attach_mode"] == "broadcast"
    assert sp["renumber"] == "dense"
    assert sp["probe"]["est_broadcast_bytes"] < sp["probe"]["budget_bytes"]

    forced = run_er_pipeline(
        docs, model=base["model"], workdir=None,
        config=ERConfig(
            num_partitions=4,
            broadcast_max_fraction=1e-12,   # nothing fits → join paths
            dense_renumber_max_rows=1,      # force hash renumbering too
        ),
    )
    spf = forced["scale_paths"]
    assert spf["features_mode"] == "texts"
    assert spf["attach_mode"] == "join"
    assert spf["renumber"] == "hash"

    def partition(ds):
        df = ds.to_pandas()
        return {frozenset(g) for _, g in df.groupby("cluster_id")["node_id"]}

    assert partition(base["clusters_cc"]) == partition(forced["clusters_cc"])
    assert partition(base["clusters_transitive"]) == partition(forced["clusters_transitive"])


def test_scale_probe_sizes_join_buckets(ray_session, fixture_corpus):
    """The probe must also size the attach-join bucket count: each bucket is
    one map_groups task whose output (pairs + both texts) feeds the fused
    feature/score stages, so bucket count == scoring parallelism AND block
    size. Small corpora floor at max(num_partitions, cluster CPUs); a large
    estimated pair volume must scale the count up (and stay capped)."""
    from entity_resolution__ray.pipelines.er_pipeline import ERConfig, resolve_scale_paths
    from entity_resolution__ray.stages.normalize import normalize_docs

    norm = normalize_docs(rd.read_parquet(fixture_corpus["docs"])).materialize()

    sp = resolve_scale_paths(norm, ERConfig(num_partitions=4))
    import ray as _ray

    floor = max(4, int(_ray.cluster_resources().get("CPU", 8)))
    assert sp["join_partitions"] == floor  # small corpus: floor only
    assert sp["cc_partitions"] == floor

    # inflate the estimated pair volume via per_doc_topk: est_pairs = n×topk
    big = resolve_scale_paths(norm, ERConfig(num_partitions=4, per_doc_topk=1_000_000))
    assert big["join_partitions"] > 4 * floor
    assert big["join_partitions"] <= 4096
    # CC rows are tiny — its bucket count scales far slower than the attach's
    assert big["cc_partitions"] <= big["join_partitions"]
