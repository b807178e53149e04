#!/usr/bin/env python
"""ray-job-submittable ER pipeline driver (north_rule: "run via ray job
submit on a fixed-size multi-node Ray cluster").

On a real cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python scripts/run_pipeline.py \
           --input /data/docs.lance --workdir /data/er_run1 \
           --labels /data/labeled_pairs.parquet --model-name xgb

Locally (the sandbox / CI path — same code, local session):

    python scripts/run_pipeline.py --input /root/testdata/sf0.001 \
        --workdir /tmp/er_run --no-geo

The job is RESUMABLE: every stage checkpoints partitioned Parquet +
``manifest.json`` (per-partition rows/bytes, rows in/out/dropped, wall time)
under ``--workdir``; re-submitting the identical job skips completed stages
and the connected-components closure resumes from its last labels iteration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="docs table: .lance dir / parquet of (doc_id, spans), or an sf dir "
                         "containing documents.parquet (lifted to spans)")
    ap.add_argument("--workdir", required=True, help="checkpoint + output directory (resumable)")
    ap.add_argument("--labels", default=None,
                    help="parquet of labeled pairs (id_left, id_right, label) to train the matcher; "
                         "omit to use a model pickle")
    ap.add_argument("--model-pickle", default=None, help="pre-trained TrainedMatcher pickle path")
    ap.add_argument("--model-name", default="xgb", choices=["logreg", "rf", "xgb"])
    ap.add_argument("--topk", type=int, default=40, help="per-doc blocking fan-out (reference k=40)")
    ap.add_argument("--min-prob", type=float, default=0.45)
    ap.add_argument("--transitivity-min-prob", type=float, default=0.60)
    ap.add_argument("--no-geo", action="store_true")
    ap.add_argument("--num-partitions", type=int, default=0,
                    help="shuffle width; 0 = cluster CPU count")
    ap.add_argument("--attach-mode", default="auto", choices=["auto", "broadcast", "join"],
                    help="doc-column attach: auto (sizing probe, default), broadcast "
                         "(small corpus) or join (10^12-doc path)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # ray job submit gives the job a cluster; locally we init
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))

    import pyarrow.parquet as pq

    from entity_resolution__ray.pipelines.er_pipeline import ERConfig, run_er_pipeline
    from entity_resolution__ray.sources.docs import read_docs, read_flat_documents_as_docs

    if os.path.exists(os.path.join(args.input, "documents.parquet")):
        docs = read_flat_documents_as_docs(args.input)
    else:
        docs = read_docs(args.input)

    n_part = args.num_partitions or int(ray.cluster_resources().get("CPU", 8))
    cfg = ERConfig(
        per_doc_topk=args.topk,
        constraints_min_prob=args.min_prob,
        transitivity_min_prob=args.transitivity_min_prob,
        use_geo=not args.no_geo,
        run_cohort_transitivity=not args.no_geo,
        num_partitions=n_part,
        attach_mode=args.attach_mode,
        model_name=args.model_name,
    )

    model = None
    labeled = None
    if args.model_pickle:
        import pickle

        with open(args.model_pickle, "rb") as f:
            model = pickle.load(f)
    elif args.labels:
        labeled = pq.read_table(args.labels)
    else:
        ap.error("need --labels or --model-pickle")

    os.makedirs(args.workdir, exist_ok=True)
    out = run_er_pipeline(docs, labeled_pairs=labeled, model=model, workdir=args.workdir, config=cfg)

    summary = {"workdir": args.workdir, "num_partitions": n_part}
    for key in ("clusters_cc", "clusters_transitive"):
        ds = out.get(key)
        if ds is not None:
            summary[f"{key}_rows"] = ds.count()
    metrics = getattr(out.get("model"), "metrics", None)
    if metrics:
        summary["oof_f1"] = metrics.get("oof_f1_at_best")
        # report what actually trained, not what was requested
        summary["model"] = metrics.get("model")
    else:
        summary["model"] = "pretrained_pickle"
    with open(os.path.join(args.workdir, "job_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
