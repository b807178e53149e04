#!/usr/bin/env python
"""Regenerate the committed golden cluster partition for the er_clusters
fixture gate (entity_resolution__ray/golden/er_clusters_fixture_partition.json).

Runs the gate pipeline TWICE (num_cpus=2 and 4 in-process partitionings are
exercised by Ray's scheduler nondeterminism across runs) and refuses to write
unless both runs agree — the golden must be partition-invariant before it can
gate anything.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(num_partitions: int):
    import ray.data as rd

    from entity_resolution__ray.pipelines.er_pipeline import ERConfig, run_er_pipeline
    from entity_resolution__ray.testgen import generate_corpus

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry_golden__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__ray_entry__.py"),
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    docs_tbl, _, _ = generate_corpus(n_entities=60, seed=1234)
    out = run_er_pipeline(
        rd.from_arrow(docs_tbl), model=entry_mod._fixture_trained_model(), workdir=None,
        config=ERConfig(
            num_partitions=num_partitions, use_geo=False, run_cohort_transitivity=False,
            per_doc_topk=40, max_group_size=256, cc_driver_fallback=100_000,
            lazy_stages=True,
        ),
    )
    got: dict = {}
    for r in out["clusters_cc"].take_all():
        got.setdefault(r["cluster_id"], []).append(str(r["node_id"]))
    return sorted(sorted(m) for m in got.values())


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    p8 = run_once(8)
    p3 = run_once(3)  # different shuffle width must not change the partition
    if p8 != p3:
        print("NOT partition-stable: 8-way and 3-way runs disagree; refusing to write golden")
        return 1
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "entity_resolution__ray", "golden", "er_clusters_fixture_partition.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "corpus": {"n_entities": 60, "seed": 1234},
                "config": "num_partitions=*, use_geo=False, per_doc_topk=40, max_group_size=256",
                "n_clusters": len(p8),
                "partition": p8,
            },
            f, indent=1,
        )
    print(f"wrote {path}: {len(p8)} clusters, {sum(len(m) for m in p8)} nodes")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
