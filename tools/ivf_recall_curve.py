"""IVF probe-budget → recall curve (SCALE.md's documented knob).

For learned-KMeans centroids at a given sf, measures recall@k of
partition-pruned IVF search against exact brute-force top-k over a sample
of query vectors, at increasing probe budgets. The output row per
(n_probe) is: mean recall@10, mean fraction of corpus scanned (= the IO
saved at 100 TB where the scan is the cost), and wall time per query
batch.

Usage: python tools/ivf_recall_curve.py [sf_dir] [k_centroids] [n_queries]
Prints a markdown table ready for SCALE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.functions import vector as V
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.ivf import fit_centroids, ivf_assign
    from vectordb_hr_data_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k_cent = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    k = 10

    spark = get_spark("ivf-recall", cpus=16)
    emb = read_table(spark, sf_dir, "embeddings").cache()
    n_total = emb.count()
    print(f"corpus: {n_total} vectors, {k_cent} centroids, {n_q} queries", file=sys.stderr)

    cents = fit_centroids(emb, k=k_cent)
    assigned = ivf_assign(emb, cents).cache()
    assigned.count()
    sizes = {r.cid: r.n for r in assigned.groupBy("cid").count().withColumnRenamed("count", "n").collect()}
    crows = sorted(cents.collect(), key=lambda r: r.cid)

    queries = [list(r.embedding) for r in emb.orderBy("vec_id").limit(n_q).collect()]

    exact = {}
    for qi, q in enumerate(queries):
        ql = F.lit([float(x) for x in q])
        exact[qi] = [
            r.vec_id
            for r in emb.select("vec_id", V.l2sq(F.col("embedding"), ql).alias("d"))
            .orderBy(F.col("d").asc(), F.col("vec_id").asc())
            .limit(k)
            .collect()
        ]

    import numpy as np

    cmat = np.array([list(r.cvec) for r in crows])
    print("| n_probe | recall@10 | corpus scanned | s/query |")
    print("|---|---|---|---|")
    for n_probe in (1, 2, 4, 8, k_cent):
        recs, scanned, t0 = [], [], time.monotonic()
        for qi, q in enumerate(queries):
            qv = np.asarray(q, dtype=np.float64)
            d = ((cmat - qv) ** 2).sum(axis=1)
            probe = [crows[i].cid for i in np.argsort(d, kind="stable")[:n_probe]]
            ql = F.lit([float(x) for x in q])
            got = [
                r.vec_id
                for r in assigned.filter(F.col("cid").isin(probe))
                .select("vec_id", V.l2sq(F.col("embedding"), ql).alias("d"))
                .orderBy(F.col("d").asc(), F.col("vec_id").asc())
                .limit(k)
                .collect()
            ]
            recs.append(len(set(got) & set(exact[qi])) / k)
            scanned.append(sum(sizes[c] for c in probe) / n_total)
        dt = (time.monotonic() - t0) / len(queries)
        print(
            f"| {n_probe} | {sum(recs)/len(recs):.3f} | {sum(scanned)/len(scanned):.1%} | {dt:.3f} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
