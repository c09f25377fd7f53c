"""Headline benchmark: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vectordb_hr_data_spark.session import get_spark
    import vectordb_hr_data_spark.queries as Q

    spark = get_spark("bench", cpus=cpus)
    # JVM/codegen warm-up covering the machinery the first queries would
    # otherwise absorb: scan, broadcast join, shuffle agg, sort
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(20000)
    ss = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    (
        li.join(F.broadcast(ss), li.l_suppkey == ss.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("l_quantity").alias("q"))
        .orderBy(F.col("q").desc())
        .limit(5)
        .count()
    )

    timings: dict[str, float] = {}
    total = 0.0
    for name in sorted(Q.REGISTRY):
        fn = Q.REGISTRY[name].fn
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 3)
            total += dt
            print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        except Exception as e:  # keep benching the rest; surface the failure
            dt = time.perf_counter() - t0
            timings[name] = -1.0
            print(f"# {name}: FAILED after {dt:.3f}s: {e}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
