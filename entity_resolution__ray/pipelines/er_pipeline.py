"""The end-to-end entity-resolution pipeline (EP1-EP3 of SURVEY.md §3, minus
the optional NER stage, as one streaming Ray Data dataflow):

    docs → normalize → block keys → candidate pairs → features → classifier
         → constraints → transitive clustering → entity clusters

Every stage boundary is a Parquet checkpoint with a lineage manifest
(pipelines.lineage); a rerun with the same ``workdir`` skips finished stages —
including mid-closure resume inside connected components.
"""

from __future__ import annotations

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
    attach_mode: str = "broadcast"  # "join" at 10^12-doc scale
    # "bundles" (small-side default): texts attached by block-ref broadcast,
    # batched kernel over unique texts. "texts": attach via cfg.attach_mode
    # (set attach_mode="join" for the 10^12-doc path) then the same kernel.
    features_mode: str = "bundles"
    num_partitions: int = 16
    vectorizer_sample_limit: Optional[int] = 200_000  # pair-TFIDF fit sample (scale path)
    renumber: str = "dense"
    # CC driver fast path for graphs below this edge count (0 = always
    # distributed); never applies to checkpointed (resumable) runs
    cc_driver_fallback: int = 0
    # benchmark mode: keep single-consumer stages LAZY (no per-stage
    # materialization) so the pipeline runs as one streaming execution;
    # requires workdir=None. Checkpointed runs always materialize per stage.
    lazy_stages: bool = False


def train_matcher_from_labels(
    features_ds: Dataset,
    labeled_pairs: pa.Table,
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

    class LabelJoin:
        def __init__(self, ref):
            self.want = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = list(zip(t["id_left"].to_pylist(), t["id_right"].to_pylist()))
            mask = np.array([k in self.want for k in keys], dtype=bool)
            t = t.filter(pa.array(mask))
            labels = [self.want[k] for k, m in zip(keys, mask) if m]
            return t.append_column("label", pa.array(labels, type=pa.int8()))

    labeled = features_ds.map_batches(
        LabelJoin, fn_constructor_kwargs={"ref": want_ref}, batch_format="pyarrow", concurrency=(1, 4)
    )
    tbl = pa.concat_tables(list(labeled.iter_batches(batch_size=65536, batch_format="pyarrow")))
    X = np.column_stack([tbl[c].to_numpy(zero_copy_only=False) for c in FEATURE_COLS])
    y = tbl["label"].to_numpy(zero_copy_only=False)
    return train_pairwise_matcher(X, y)


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
        if workdir is None and cfg.lazy_stages and not multi_consumer:
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
    need_geo = cfg.use_geo or cfg.run_cohort_transitivity
    norm = checkpoint_stage(
        normalize_docs(docs, extract_countries=need_geo), workdir, "01_normalized"
    )

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

            stop_tokens = dataset_stopwords(norm, freq_cutoff=cfg.blocking_stopword_df)
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

    # 4-5. feature kernel (8 features, actor pool)
    vec_word, vec_char = fit_pair_vectorizers(norm, sample_limit=cfg.vectorizer_sample_limit)
    training = model is None
    if cfg.features_mode == "bundles":
        from ..stages.features import pair_features_broadcast

        feats_ds = pair_features_broadcast(pairs, norm, vec_word, vec_char)
    else:
        with_texts = attach_doc_columns(
            pairs, norm, {"norm_text": ("src_text", "cand_text")},
            mode=cfg.attach_mode, num_partitions=cfg.num_partitions,
        )
        feats_ds = pair_features(with_texts, vec_word, vec_char)
    feats = stage(feats_ds, "03_pair_features", multi_consumer=training, rows_in_from="02_candidate_pairs")

    # 6. matcher: train on labeled pairs (driver-side protocol) or use given model
    if training:
        if labeled_pairs is None:
            raise ValueError("need labeled_pairs or a pre-trained model")
        model = train_matcher_from_labels(feats, labeled_pairs)

    # 7. score all pairs (actor pool)
    edges = stage(score_pairs(feats, model), "04_edges", rows_in_from="03_pair_features")

    # 8. constraints: threshold + geo (+ optional token overlap), kept/dropped splits
    attach_cols = {}
    if cfg.use_geo or cfg.run_cohort_transitivity:
        attach_cols["countries"] = ("src_countries", "cand_countries")
    if cfg.use_token_overlap and "src_text" not in (edges.schema().names or []):
        attach_cols["norm_text"] = ("src_text", "cand_text")
    if attach_cols:
        edges_sides = attach_doc_columns(
            edges, norm, attach_cols, mode=cfg.attach_mode, num_partitions=cfg.num_partitions
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
            kept, checkpoint_dir=cc_dir, num_partitions=cfg.num_partitions, renumber=cfg.renumber,
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
                num_partitions=cfg.num_partitions,
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
    }


def evaluate_pairwise_f1(
    edges: Dataset,
    golden_pairs: pa.Table,
    candidate_pairs_ds: Dataset,
) -> Dict[str, float]:
    """Pairwise F1 on labeled pairs *at matched blocking keys* — i.e. restricted
    to golden pairs that co-occur in some block (BASELINE.json metric).

    Golden pairs never surfaced by blocking are excluded (they share no key, so
    no engine run could score them — 'evaluated at identical blocking keys')."""
    cand = {
        (l, r)
        for l, r in zip(
            *(map(lambda c: [row[c] for row in candidate_pairs_ds.select_columns([c]).take_all()],
                  ("id_left", "id_right")))
        )
    }
    pred = {
        (r["id_left"], r["id_right"]): r["pred_match"]
        for r in edges.select_columns(["id_left", "id_right", "pred_match"]).take_all()
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
