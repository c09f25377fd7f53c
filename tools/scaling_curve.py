"""Scaling-curve audit: run a representative query subset at sf0.001 /
sf0.01 / sf0.1 (100× data spread) and report wall-time growth ratios.

The point is the SHAPE, not the absolute numbers: an operator whose
wall-time grows faster than the data between sf0.01 and sf0.1 (10× rows)
has a superlinear stage hiding somewhere — exactly the thing SCALE.md
claims none of the headline ops have. Fixed overhead (session, plan,
driver work) dominates at tiny SFs, so the informative ratio is
r_10x = t(sf0.1) / t(sf0.01); flag anything with r_10x > the data growth
(10) — sublinear is expected because overhead amortizes.

Usage:
    python tools/scaling_curve.py [query ...]   # default: headline subset

Prints one line per (query, sf) plus a final flag list; exits non-zero if
any query scales superlinearly.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    # one representative per family; cheap enough to run 3 SFs x 2 samples
    "q1_pricing_summary",
    "q3_shipping_priority",
    "knn_topk_l2sq",
    "knn_whitened_topk_fused",
    "neardup_minhash_lsh",
    "dedup_exact",
    "doc_tfidf_top_terms",
    "doc_bm25_search",
    "doc_unigram_kl_quality",
    "doc_more_like_this",
    "events_sessionize",
    "events_markov_transitions",
    "events_hourly_burst",
    "doc_weighted_reservoir_sample",
    "doc_rake_keyphrases",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
DATA_GROWTH = 10.0  # rows multiply ~10x between adjacent SFs


def main() -> int:
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("scaling-curve", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    # warm the JVM so sf0.001 doesn't absorb the session start
    REGISTRY["q1_pricing_summary"].fn(spark, SFS[0]).collect()

    times: dict[str, list[float]] = {}
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        row = []
        for sf in SFS:
            best = float("inf")
            for _ in range(2):  # min of 2 samples per point
                t0 = time.monotonic()
                spec.fn(spark, sf).collect()
                best = min(best, time.monotonic() - t0)
            row.append(best)
            print(f"{name:40s} {sf.rsplit('/', 1)[-1]:8s} {best:7.3f}s", flush=True)
        times[name] = row

    print()
    flagged = []
    for name, (t1, t2, t3) in times.items():
        r_mid = t2 / t1 if t1 > 0 else float("nan")
        r_big = t3 / t2 if t2 > 0 else float("nan")
        mark = ""
        if r_big > DATA_GROWTH:
            mark = "  << SUPERLINEAR"
            flagged.append(name)
        print(f"{name:40s} 10x→ {r_mid:5.2f}   100x→ {r_big:5.2f}{mark}")
    if flagged:
        print(f"\nFLAGGED superlinear: {flagged}")
        return 1
    print("\nall queries scale at or below data growth between sf0.01 and sf0.1")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
