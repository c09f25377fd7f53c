"""Reproduce SCALE.md's vector-index compression-ladder table in one run.

For each rung — float32 exact, SQ8, IVF+SQ8 persisted, flat PQ-ADC,
residual IVFADC — reports: bytes on disk for the scan payload (zstd),
recall@10 of the registry query vs exact kNN, and warm median query
seconds (3 runs, Spark cache cleared, trained state amortized — the same
convention as bench.py).

Usage: python tools/vector_ladder_report.py [sf_dir]
Prints a markdown table.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    import vectordb_hr_data_spark.queries as Q
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.pq import pq_codebook, pq_encode_arrow
    from vectordb_hr_data_spark.operators.quantize import fit_ranges, sq8_encode_arrow
    from vectordb_hr_data_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = "/tmp/vector_ladder_report"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("vector-ladder", cpus=16)

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    cb = pq_codebook(emb)
    payloads = {
        "float32 exact": emb.select("vec_id", "embedding"),
        "SQ8": emb.select("vec_id", sq8_encode_arrow("embedding", lo, hi).alias("codes")),
        "PQ / IVFADC": emb.select("vec_id", pq_encode_arrow("embedding", cb).alias("pqcodes")),
    }
    size = {}
    for name, df in payloads.items():
        p = f"{out}/{name.split()[0]}"
        df.write.mode("overwrite").option("compression", "zstd").parquet(p)
        size[name] = du(p)
    size["IVF+SQ8 persisted"] = size["SQ8"]  # same payload, partitioned
    size["residual IVFADC"] = size["PQ / IVFADC"]

    exact_ids = {r.vec_id for r in Q.REGISTRY["knn_topk_l2sq"].fn(spark, sf_dir).collect()}
    rungs = [
        ("float32 exact", "knn_topk_l2sq"),
        ("SQ8", "knn_sq8_rerank"),
        ("IVF+SQ8 persisted", "ivf_sq8_rerank_indexed"),
        ("PQ / IVFADC", "knn_pq_adc_rerank"),
        ("residual IVFADC", "ivf_pq_residual_rerank"),
    ]
    print(f"| rung | scan payload (zstd) | recall@10 | warm median s | query |  (sf={sf_dir})")
    print("|---|---|---|---|---|")
    for rung, qname in rungs:
        fn = Q.REGISTRY[qname].fn
        fn(spark, sf_dir).collect()  # train/build once
        times = []
        ids = set()
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            ids = {r.vec_id for r in fn(spark, sf_dir).collect()}
            times.append(time.time() - t0)
        recall = len(ids & exact_ids) / max(len(exact_ids), 1)
        med = sorted(times)[1]
        print(
            f"| {rung} | {size[rung]/1024:.0f} KB | {recall:.1f} | {med:.2f} | `{qname}` |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
