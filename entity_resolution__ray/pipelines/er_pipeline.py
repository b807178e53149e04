"""The end-to-end entity-resolution pipeline (EP1-EP3 of SURVEY.md §3, minus
the optional NER stage, as one streaming Ray Data dataflow):

    docs → normalize → block keys → candidate pairs → features → classifier
         → constraints → transitive clustering → entity clusters

Every stage boundary is a Parquet checkpoint with a lineage manifest
(pipelines.lineage); a rerun with the same ``workdir`` skips finished stages —
including mid-closure resume inside connected components.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..stages.blocking import candidate_pairs, emit_block_keys
from ..stages.classifier import TrainedMatcher, score_pairs, train_pairwise_matcher
from ..stages.clustering import cc_clusters, cohort_transitivity
from ..stages.constraints import apply_constraints, split_kept_dropped
from ..stages.features import fit_pair_vectorizers, pair_features
from ..stages.joins import attach_doc_columns
from ..stages.normalize import normalize_docs
from ..schema import FEATURE_COLS
from .lineage import checkpoint_stage

logger = logging.getLogger(__name__)


@dataclass
class ERConfig:
    """All thresholds/knobs in one typed config (the reference scatters them:
    run_blocking.py:103 k=40, apply_constraints.py:79 min_prob=0.45,
    apply_transitivity.py:189 min_prob=0.60)."""

    per_doc_topk: int = 40
    max_group_size: int = 256
    # "keys" (default): token + q-gram MinHash key blocking — the 10^12-doc
    # shuffle path. "knn": the reference's exact TF-IDF cosine kNN
    # (run_blocking.py), distributed via an inverted index — exact but
    # corpus-squared work; for corpora up to ~10^6 docs per shard.
    blocking_mode: str = "keys"
    use_token_keys: bool = True
    n_qgram_bands: int = 2
    min_token_len: int = 3
    # tokens with document frequency ≥ this are dropped from token blocking
    # keys (T7: dataset-derived stopwords — a df-1.0 token would otherwise be
    # one giant all-pairs block). None disables.
    blocking_stopword_df: Optional[float] = 0.3
    constraints_min_prob: float = 0.45
    transitivity_min_prob: float = 0.60
    use_geo: bool = True
    use_token_overlap: bool = False
    # the cohort transitivity stage is geo-derived; corpora with no country
    # signal (or geo-free runs) can skip the countries attach + cohort CC
    run_cohort_transitivity: bool = True
    # doc-column attach: "broadcast" (small side rides the object store once),
    # "join" (distributed hash join — the 10^12-doc path), or "auto" (default):
    # a sizing probe at pipeline start picks by estimated payload vs the
    # object store budget (see resolve_scale_paths)
    attach_mode: str = "auto"
    # matcher family trained from labeled pairs: "logreg" | "rf" | "xgb"
    # (reference's committed predictions are XGBoost — pairwise_classifier.py:268)
    model_name: str = "logreg"
    gbt_params: Optional[Dict] = None  # HistGBT/HistRandomForest overrides
    # "bundles": texts attached by block-ref broadcast, batched kernel over
    # unique texts. "texts": attach via attach_mode (join at 10^12-doc scale)
    # then the same kernel. "auto" (default): same sizing probe as attach_mode.
    features_mode: str = "auto"
    num_partitions: int = 16
    vectorizer_sample_limit: Optional[int] = 200_000  # pair-TFIDF fit sample (scale path)
    # cluster-id renumbering: "dense" (driver-held per-cluster map — fine to
    # ~10^8 clusters), "hash" (distributed join, any scale), "auto" (default:
    # dense below dense_renumber_max_rows corpus rows)
    renumber: str = "auto"
    # auto sizing-probe knobs: broadcast payloads (doc bundle store, attach
    # maps, gram stores) must fit within this fraction of the cluster's object
    # store, else the pipeline flips to the join/hash paths
    broadcast_max_fraction: float = 0.25
    dense_renumber_max_rows: int = 50_000_000
    # CC driver fast path for graphs below this edge count (0 = always
    # distributed); never applies to checkpointed (resumable) runs
    cc_driver_fallback: int = 0
    # benchmark mode: keep single-consumer stages LAZY (no per-stage
    # materialization) so the pipeline runs as one streaming execution;
    # requires workdir=None. Checkpointed runs always materialize per stage.
    lazy_stages: bool = False


# Measured on the fixture corpus (330 entities ≈ 2.4k docs): the packed
# bundle store (texts + token CSR + word/char TF-IDF CSRs + country codes)
# is ~5.3× the raw norm_text bytes; 6.0 adds headroom. The attach maps and
# gram stores are smaller, so one conservative factor covers all of them.
_BROADCAST_BYTES_PER_TEXT_BYTE = 6.0
_BROADCAST_ROW_OVERHEAD = 96.0  # ids, offsets, per-row index entries


def resolve_scale_paths(norm: Dataset, cfg: ERConfig) -> Dict[str, object]:
    """Resolve the "auto" path selectors by a sizing probe: estimate the
    bytes the broadcast-side paths would pin in the object store (and mirror
    into every worker heap) from the corpus row count × sampled mean text
    size, and flip to the join/hash paths when that exceeds
    ``broadcast_max_fraction`` of the cluster's object store.

    This closes the 100-TB gap the broadcast defaults had: at small/medium
    scale the probe keeps the (faster) broadcast/bundle/dense paths; beyond
    the object store it selects the distributed join paths automatically —
    both paths are parity-tested (tests/test_e2e.py forced-join run)."""
    resolved: Dict[str, object] = {
        "features_mode": cfg.features_mode,
        "attach_mode": cfg.attach_mode,
        "renumber": cfg.renumber,
    }
    # norm is always materialized, so count() is metadata and the 1024-row
    # sample reads one block — the probe is cheap even when every mode is
    # explicitly fixed (we still need it to size the join buckets below).
    n_rows = norm.count()
    sample = norm.select_columns(["norm_text"]).limit(1024).take_all()
    mean_text = float(np.mean([len(r["norm_text"] or "") for r in sample])) if sample else 0.0
    est_payload = n_rows * (mean_text * _BROADCAST_BYTES_PER_TEXT_BYTE + _BROADCAST_ROW_OVERHEAD)
    store_bytes = float(ray.cluster_resources().get("object_store_memory", 0.0)) or 2.0**31
    budget = cfg.broadcast_max_fraction * store_bytes
    fits = est_payload <= budget
    if resolved["features_mode"] == "auto":
        resolved["features_mode"] = "bundles" if fits else "texts"
    if resolved["attach_mode"] == "auto":
        resolved["attach_mode"] = "broadcast" if fits else "join"
    if resolved["renumber"] == "auto":
        resolved["renumber"] = "dense" if n_rows <= cfg.dense_renumber_max_rows else "hash"
    # Stage fusion flips off with the scale paths: fused, the blocking sorts,
    # both attach joins, the feature/score stages and the CC contraction run
    # as ONE streaming topology with ~8 all-to-all exchanges, and past ~100k
    # docs the driver's scheduling loop burns its core on per-step bundle/
    # metrics accounting over that operator DAG while task dispatch starves
    # (observed directly on the 500k dedup run: 3 tasks/min, 31 idle cores,
    # stack in streaming_executor._update_stats_metrics). Materializing each
    # stage bounds the live DAG — and is the checkpoint layout a resumable
    # 100-TB run wants anyway. Small corpora keep full fusion (lazy bench
    # mode), where per-stage barriers would dominate.
    resolved["fuse_stages"] = fits

    # Join-bucket sizing. The attach joins group by a hash bucket and each
    # bucket is ONE map_groups task whose output block carries the pairs
    # with both text columns attached — and the fused downstream feature/
    # score stages inherit that task granularity. With a fixed bucket count
    # a 500k-doc run put ~1.25M pairs (multi-GB with texts) in each of 16
    # tasks: scoring ran memory-backpressured at <half the cluster's CPUs
    # (measured 2,944s; see BASELINE.md round 4). Size bucket count so one
    # bucket's attached output is ~64 MiB, floored at cluster width.
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    est_pairs = n_rows * max(1, cfg.per_doc_topk)  # directed upper bound
    pair_bytes = 2.0 * mean_text + 128.0  # two texts + ids/key/sim/overhead
    rows_per_bucket = max(20_000.0, (64 * 2**20) / pair_bytes)
    floor = max(cfg.num_partitions, ncpu)
    resolved["join_partitions"] = int(min(4096, max(floor, -(-est_pairs // rows_per_bucket))))
    # CC rows are just (id, id, weight) — ~40 B — so buckets hold far more
    # rows; keep per-iteration task overhead low but never below cluster width
    resolved["cc_partitions"] = int(min(4096, max(floor, -(-est_pairs // 1_500_000))))
    resolved["probe"] = {
        "n_rows": n_rows,
        "mean_text_bytes": mean_text,
        "est_broadcast_bytes": est_payload,
        "object_store_bytes": store_bytes,
        "budget_bytes": budget,
    }
    logger.info(
        "scale probe: %d rows × %.0f B/text → est broadcast %.1f MiB vs budget %.1f MiB "
        "(%.0f%% of object store) → features_mode=%s attach_mode=%s renumber=%s "
        "join_partitions=%d cc_partitions=%d fuse_stages=%s",
        n_rows, mean_text, est_payload / 2**20, budget / 2**20,
        cfg.broadcast_max_fraction * 100, resolved["features_mode"],
        resolved["attach_mode"], resolved["renumber"],
        resolved["join_partitions"], resolved["cc_partitions"],
        resolved["fuse_stages"],
    )
    return resolved


def train_matcher_from_labels(
    features_ds: Dataset,
    labeled_pairs: pa.Table,
    model_name: str = "logreg",
    gbt_params: Optional[Dict] = None,
) -> TrainedMatcher:
    """Join the (small, driver-held) labeled pair table onto the distributed
    feature stream by broadcast semi-join, collect ONLY the labeled rows, and
    run the reference training protocol (driver-side, like the reference)."""
    want = {
        (l, r): int(lab)
        for l, r, lab in zip(
            labeled_pairs["id_left"].to_pylist(),
            labeled_pairs["id_right"].to_pylist(),
            labeled_pairs["label"].to_pylist(),
        )
    }
    want_ref = ray.put(want)

    def label_join(t: pa.Table, ref=want_ref) -> pa.Table:
        from ..state.worker_cache import cached_get

        want_map = cached_get(ref)
        keys = list(zip(t["id_left"].to_pylist(), t["id_right"].to_pylist()))
        mask = np.array([k in want_map for k in keys], dtype=bool)
        t = t.filter(pa.array(mask))
        labels = [want_map[k] for k, m in zip(keys, mask) if m]
        return t.append_column("label", pa.array(labels, type=pa.int8()))

    labeled = features_ds.map_batches(label_join, batch_format="pyarrow")
    tbl = pa.concat_tables(list(labeled.iter_batches(batch_size=65536, batch_format="pyarrow")))
    X = np.column_stack([tbl[c].to_numpy(zero_copy_only=False) for c in FEATURE_COLS])
    y = tbl["label"].to_numpy(zero_copy_only=False)
    return train_pairwise_matcher(X, y, model_name=model_name, gbt_params=gbt_params)


def run_er_pipeline(
    docs: Dataset,
    labeled_pairs: Optional[pa.Table] = None,
    model: Optional[TrainedMatcher] = None,
    workdir: Optional[str] = None,
    config: ERConfig = None,
) -> Dict[str, object]:
    """Run the full pipeline. Returns dict with datasets for every stage output
    plus the trained model. Either ``model`` or ``labeled_pairs`` must be given
    (labels train a fresh matcher exactly like train_classifier.py)."""
    cfg = config or ERConfig()

    def stage(ds, name, multi_consumer=False, rows_in_from: Optional[str] = None):
        """Checkpoint/materialize, or keep lazy single-consumer stages fused
        into one streaming execution in lazy benchmark mode. ``rows_in_from``
        names the upstream stage whose manifest rows_out is this stage's
        rows_in (manifests then record rows_dropped per stage)."""
        # fuse_stages is assigned after the scale probe below, before the
        # first stage() call — late closure binding picks it up; the probe
        # disables fusion in the join/scale regime (see resolve_scale_paths)
        if workdir is None and cfg.lazy_stages and fuse_stages and not multi_consumer:
            return ds
        rows_in = None
        if workdir is not None and rows_in_from is not None:
            from .lineage import read_manifest, stage_is_complete

            if stage_is_complete(workdir, rows_in_from):
                rows_in = read_manifest(workdir, rows_in_from).get("rows_out")
        return checkpoint_stage(ds, workdir, name, rows_in=rows_in)

    # Map-task parallelism follows BLOCK count; reads of small corpora (and
    # groupby outputs) otherwise collapse every stage to 1-2 tasks. One cheap
    # repartition up front sets the fan-out of normalize / key emission / the
    # pair shuffle to the cluster width. (At 100 TB the read itself yields
    # thousands of blocks and this is a near-no-op.)
    compute_par = max(cfg.num_partitions, int(ray.cluster_resources().get("CPU", 8)))
    docs = docs.repartition(compute_par)

    # 1. normalize (span flatten + tokens + countries); spans pass through
    # untouched. Always materialized: it feeds blocking keys, stopwords, the
    # vectorizer fit and both broadcast attaches.
    import time as _time

    need_geo = cfg.use_geo or cfg.run_cohort_transitivity
    _t0 = _time.time()
    norm = checkpoint_stage(
        normalize_docs(docs, extract_countries=need_geo), workdir, "01_normalized"
    )
    logger.info("phase normalize+materialize: %.1fs", _time.time() - _t0)

    # resolve "auto" path selectors from the corpus-size probe (norm is
    # materialized, so the probe costs one count + one 1k-row sample)
    paths = resolve_scale_paths(norm, cfg)
    features_mode = paths["features_mode"]
    attach_mode = paths["attach_mode"]
    renumber = paths["renumber"]
    join_par = int(paths.get("join_partitions", cfg.num_partitions))
    cc_par = int(paths.get("cc_partitions", cfg.num_partitions))
    fuse_stages = bool(paths.get("fuse_stages", True))

    # 2-3. blocking → candidate pairs
    if cfg.blocking_mode == "knn":
        from ..stages.blocking import knn_block_topk

        pairs = stage(
            knn_block_topk(norm, k=cfg.per_doc_topk)
            .map_batches(
                lambda t: t.select(["id_left", "id_right"]),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .repartition(compute_par),
            "02_candidate_pairs",
        )
    else:
        stop_tokens = None
        if cfg.blocking_stopword_df is not None and cfg.use_token_keys:
            from ..stages.blocking import dataset_stopwords

            _t0 = _time.time()
            stop_tokens = dataset_stopwords(norm, freq_cutoff=cfg.blocking_stopword_df)
            logger.info("phase dataset_stopwords: %.1fs", _time.time() - _t0)
        keys = emit_block_keys(
            norm,
            min_token_len=cfg.min_token_len,
            n_qgram_bands=cfg.n_qgram_bands,
            use_token_keys=cfg.use_token_keys,
            stop_tokens=stop_tokens,
        )
        pairs = stage(
            candidate_pairs(
                keys, max_group_size=cfg.max_group_size, per_doc_topk=cfg.per_doc_topk,
                # keys = map_batches over the materialized compute_par-wide
                # norm — already cluster-wide, skip the widening repartition
                repartition=False,
            ).repartition(compute_par),
            "02_candidate_pairs",
        )

    # static schemas for the join-mode attaches: pairs/edges are LAZY
    # pipelines in bench mode, and a hash-join schema probe on a lazy
    # dataset executes its all-to-all upstream in full (3× blocking passes
    # measured in the forced-join run before these were threaded through)
    from ..stages.joins import _arrow_schema

    norm_schema = _arrow_schema(norm)  # norm is always materialized — free
    id_t = norm_schema.field("doc_id").type
    if cfg.blocking_mode == "knn":
        pairs_schema = pa.schema([pa.field("id_left", id_t), pa.field("id_right", id_t)])
    else:
        pairs_schema = pa.schema(
            [pa.field("id_left", id_t), pa.field("id_right", id_t),
             pa.field("block_key", pa.string()), pa.field("sim", pa.float64())]
        )

    # 4-5. feature kernel (8 features, actor pool)
    _t0 = _time.time()
    vec_word, vec_char = fit_pair_vectorizers(norm, sample_limit=cfg.vectorizer_sample_limit)
    logger.info("phase fit_pair_vectorizers: %.1fs", _time.time() - _t0)
    training = model is None
    edges_fields = list(pairs_schema)
    if features_mode == "bundles":
        from ..stages.features import pair_features_broadcast

        feats_ds = pair_features_broadcast(pairs, norm, vec_word, vec_char)
    else:
        with_texts = attach_doc_columns(
            pairs, norm, {"norm_text": ("src_text", "cand_text")},
            mode=attach_mode, num_partitions=join_par,
            pairs_schema=pairs_schema, docs_schema=norm_schema,
        )
        feats_ds = pair_features(with_texts, vec_word, vec_char)
        if cfg.use_token_overlap:
            text_t = norm_schema.field("norm_text").type
            edges_fields += [pa.field("src_text", text_t), pa.field("cand_text", text_t)]
        else:
            # Drop the texts the moment the feature kernel has consumed them:
            # everything downstream of here (scoring, constraints, CC) works
            # on the 8 feature floats + ids, and in the un-fused scale regime
            # the 03/04 stage materializations would otherwise pin ~600 B/row
            # of text per pair in the object store (≈15 GB at 500k docs /
            # 20M pairs — measured as a 40 GB pending-spill pile-up that
            # throttled the whole run). The token-overlap constraint is the
            # only text consumer; when enabled the texts stay on the rows.
            feats_ds = feats_ds.map_batches(
                lambda t: t.drop_columns(["src_text", "cand_text"]),
                batch_format="pyarrow", zero_copy_batch=True,
            )
    edges_schema = pa.schema(
        edges_fields
        + [pa.field(c, pa.float64()) for c in FEATURE_COLS]
        + [pa.field("prob_match", pa.float64()), pa.field("pred_match", pa.int8())]
    )
    feats = stage(feats_ds, "03_pair_features", multi_consumer=training, rows_in_from="02_candidate_pairs")

    # 6. matcher: train on labeled pairs (driver-side protocol) or use given model
    if training:
        if labeled_pairs is None:
            raise ValueError("need labeled_pairs or a pre-trained model")
        model = train_matcher_from_labels(
            feats, labeled_pairs, model_name=cfg.model_name, gbt_params=cfg.gbt_params
        )

    # 7. score all pairs (actor pool)
    edges = stage(score_pairs(feats, model), "04_edges", rows_in_from="03_pair_features")

    # 8. constraints: threshold + geo (+ optional token overlap), kept/dropped splits
    # (in texts mode without token-overlap the texts were already dropped at
    # the feature kernel, so the kept/dropped edge schema is identical across
    # the broadcast and join feature paths)
    attach_cols = {}
    if cfg.use_geo or cfg.run_cohort_transitivity:
        attach_cols["countries"] = ("src_countries", "cand_countries")
    if cfg.use_token_overlap and "src_text" not in edges_schema.names:
        attach_cols["norm_text"] = ("src_text", "cand_text")
    if attach_cols:
        edges_sides = attach_doc_columns(
            edges, norm, attach_cols, mode=attach_mode, num_partitions=join_par,
            pairs_schema=edges_schema, docs_schema=norm_schema,
        )
    else:
        edges_sides = edges
    verdict = stage(
        apply_constraints(
            edges_sides,
            min_prob=cfg.constraints_min_prob,
            use_geo=cfg.use_geo,
            use_token_overlap=cfg.use_token_overlap,
        ),
        "05_edge_verdicts",
        rows_in_from="04_edges",
    )
    kept, dropped = split_kept_dropped(verdict)
    kept = stage(kept, "06_edges_filtered", multi_consumer=cfg.run_cohort_transitivity, rows_in_from="05_edge_verdicts")

    # 9. clustering: flat CC (C7) and cohort transitivity (C5), both resumable
    cc_dir = os.path.join(workdir, "07_cc") if workdir else None
    if cc_dir:
        os.makedirs(cc_dir, exist_ok=True)
    clusters_flat = stage(
        cc_clusters(
            kept, checkpoint_dir=cc_dir, num_partitions=cc_par, renumber=renumber,
            driver_fallback_threshold=cfg.cc_driver_fallback,
        ),
        "08_clusters_cc",
    )
    clusters_transitive = None
    if cfg.run_cohort_transitivity:
        coh_dir = os.path.join(workdir, "09_cc_cohort") if workdir else None
        if coh_dir:
            os.makedirs(coh_dir, exist_ok=True)
        clusters_transitive = stage(
            cohort_transitivity(
                kept, min_prob=cfg.transitivity_min_prob, checkpoint_dir=coh_dir,
                num_partitions=cc_par,
                driver_fallback_threshold=cfg.cc_driver_fallback,
            ),
            "10_clusters_transitive",
        )

    return {
        "normalized": norm,
        "candidate_pairs": pairs,
        "features": feats,
        "edges": edges,
        "edges_filtered": kept,
        "edges_dropped": dropped,
        "clusters_cc": clusters_flat,
        "clusters_transitive": clusters_transitive,
        "model": model,
        "scale_paths": paths,
    }


def evaluate_pairwise_f1(
    edges: Dataset,
    golden_pairs: pa.Table,
    candidate_pairs_ds: Dataset,
    max_driver_pairs: int = 5_000_000,
) -> Dict[str, float]:
    """Pairwise F1 on labeled pairs *at matched blocking keys* — i.e. restricted
    to golden pairs that co-occur in some block (BASELINE.json metric).

    Golden pairs never surfaced by blocking are excluded (they share no key, so
    no engine run could score them — 'evaluated at identical blocking keys').

    This is a fixture/conformance EVALUATION utility: it collects the
    candidate-pair and edge sets on the driver. ``max_driver_pairs`` raises
    instead of OOM-ing when a caller points it at a corpus-scale run (same
    gate pattern as graph_viz.louvain_communities); compute TP/FP via a
    distributed join on (id_left, id_right) at that scale instead."""
    # prune + materialize each input ONCE: counting a lazy dataset and then
    # collecting it re-executes its whole upstream plan (and per-column
    # take_all loops multiply that again)
    cand_mat = candidate_pairs_ds.select_columns(["id_left", "id_right"]).materialize()
    edges_mat = edges.select_columns(["id_left", "id_right", "pred_match"]).materialize()
    n_cand = cand_mat.count()
    n_edges = edges_mat.count()
    if n_cand > max_driver_pairs or n_edges > max_driver_pairs:
        raise ValueError(
            f"evaluate_pairwise_f1 collects pairs on the driver; got "
            f"{n_cand} candidates / {n_edges} edges > max_driver_pairs="
            f"{max_driver_pairs}. Evaluate on a sampled fixture, or raise "
            f"max_driver_pairs explicitly if the driver has the memory."
        )
    cand = {(r["id_left"], r["id_right"]) for r in cand_mat.take_all()}
    pred = {
        (r["id_left"], r["id_right"]): r["pred_match"] for r in edges_mat.take_all()
    }
    tp = fp = fn = tn = 0
    for l, r, lab in zip(
        golden_pairs["id_left"].to_pylist(),
        golden_pairs["id_right"].to_pylist(),
        golden_pairs["label"].to_pylist(),
    ):
        if (l, r) not in cand:
            continue
        p = pred.get((l, r), 0)
        if lab == 1 and p == 1:
            tp += 1
        elif lab == 1:
            fn += 1
        elif p == 1:
            fp += 1
        else:
            tn += 1
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return {"precision": prec, "recall": rec, "f1": f1, "tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "n_eval": tp + fp + fn + tn}
