"""Core-scaling spot-bench over a larger replica corpus (VERDICT r14 #8).

At sf0.1 the whole bench is overhead-bound (median t8/t32 was 0.92 in the
r14 driver run — the full suite ran FASTER on 8 cores), so per-query
parallelization claims are unmeasurable there. This probe runs the
heaviest queries against the 10× key-shifted replica
(tools/make_scale_replica.py) at two core counts via the UNCHANGED
bench.py contract (SPARK_GRAFT_SF_DIR + SPARK_GRAFT_CPUS + subset argv)
and writes the paired record.

Usage:
    python tools/make_scale_replica.py            # once, builds /tmp/spark_graft_sf1
    python tools/scaling_probe.py [replica_dir] [out_json]

The replica is a deterministic function of the driver's sf0.1 tables; it
lives outside /root/testdata (read-only) and is NOT oracle data — this
record measures core scaling only.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# heaviest structurally-parallel queries from the r15 baseline bench
QUERIES = [
    "corpus_prep_pipeline", "quality_prep_pipeline", "quality_prep_threshold",
    "doc_containment_dedup", "kmeans_lloyd3_det", "basket_triple_mining",
    "neardup_method_agreement", "neardup_dedup_keep", "neardup_components",
    "neardup_cluster_size_histogram", "orders_merkle_range_diff",
    "ivf_pq_residual_det", "hnsw_graph_search", "hnsw_recall_eval",
    "events_zone_map_pruning", "lsh_band_recall_curve",
    "events_aa_calibration_sweep", "events_quantile_treatment_effect",
    "lsh_minhash_neardup_pairs", "dsir_importance_threshold",
]


def run(cpus: int, sf_dir: str, here: str) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "bench.py"), *QUERIES],
        cwd=here, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        timeout=3600, text=True, check=True,
    )
    last = [ln for ln in proc.stdout.splitlines() if ln.strip()][-1]
    return json.loads(last)["queries"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "SCALING_r15.json"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t32 = run(32, sf_dir, here)
    t8 = run(8, sf_dir, here)
    ratios = {
        n: round(t8[n] / t32[n], 2)
        for n in QUERIES
        if t32.get(n, -1) > 0 and t8.get(n, -1) > 0
    }
    record = {
        "sf_dir": sf_dir,
        "note": "10x key-shifted replica of sf0.1 (tools/make_scale_replica.py); "
                "core-scaling probe only, not oracle data",
        "t32": t32,
        "t8": t8,
        "t8_over_t32": ratios,
        "median_ratio": sorted(ratios.values())[len(ratios) // 2] if ratios else None,
    }
    with open(os.path.join(here, out), "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps({"median_t8_over_t32": record["median_ratio"],
                      "n_queries": len(ratios)}))
    for n, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        print(f"# {n}: t32={t32[n]:.2f}s t8={t8[n]:.2f}s ratio={r}")


if __name__ == "__main__":
    main()
