"""Join-mode scaling datapoint runner (round-5, VERDICT item 7).

Runs the er_clusters headline on a replicated corpus with
GRAFT_ER_FORCE_SCALE_PATHS=1 (the beyond-object-store join/hash paths engaged
end to end) at two parallelism levels in FRESH processes, repeated, and
prints per-run seconds plus the pairwise efficiency of the leg medians.

Usage: python scripts/scale_join_mode.py [replicas=60] [runs=2]
"""

import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import bench

    scale_dir = bench._build_scale_corpus("/root/testdata/sf0.1", replicas)
    print(f"[scale] corpus: {scale_dir} ({replicas * 5000} docs)", file=sys.stderr)

    results = {}
    for cpus in (32, 8):
        secs = []
        for i in range(runs):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(cpus),
                GRAFT_SF_DIR=scale_dir,
                GRAFT_BENCH_QUERIES="er_clusters",
                GRAFT_ER_FORCE_SCALE_PATHS="1",
                RAY_GRAFT_OBJECT_STORE_GB="60",
            )
            out = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "bench.py")],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            secs.append(r["value"])
            print(f"[scale] join-mode {cpus} cpus run {i + 1}/{runs}: "
                  f"{r['value']}s ({r['n_docs']} docs)", file=sys.stderr, flush=True)
        results[cpus] = {"secs": secs, "median": statistics.median(secs),
                         "n_docs": r["n_docs"]}

    n = results[32]["n_docs"]
    t32, t8 = results[32]["median"], results[8]["median"]
    eff = ((n / t32) / (n / t8)) / (32 / 8)
    print(json.dumps({
        "metric": "join_mode_scaling_efficiency",
        "value": round(eff, 3),
        "n_docs": n,
        "sec_8_runs": results[8]["secs"],
        "sec_32_runs": results[32]["secs"],
        "sec_8_median": t8,
        "sec_32_median": t32,
        "docs_per_sec_8": round(n / t8, 2),
        "docs_per_sec_32": round(n / t32, 2),
        "runs_per_leg": runs,
        "forced_scale_paths": True,
    }))


if __name__ == "__main__":
    main()
