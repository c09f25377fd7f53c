"""Deterministic key-shifted replica of an sf dir, for SCALING probes only.

VERDICT r14 item 8: at sf0.1 every query is overhead-bound (the whole bench
runs FASTER on 8 cores than 32), so per-query parallelization claims need a
bigger input. The driver testdata is read-only and tops out at sf0.1, so
this tool synthesizes a FACTOR-times larger corpus by unioning key-shifted
copies:

- join keys (custkey, orderkey, partkey, suppkey, doc_id, vec_id, user_id,
  event_id) shift by ``i * (max_key + 1)`` per replica, so every FK keeps
  exactly its original fan-out — no join blows up quadratically;
- document TOKENS are suffixed ``_i`` per replica (and n_chars recomputed),
  so shingle/dedup structure replicates linearly instead of creating
  cross-replica duplicate families the original corpus does not have;
- region/nation (bounded dimensions) are copied as-is;
- everything is a deterministic pure function of the source rows — no rand().

The result is NOT oracle data (DuckDB parity untested and untargeted); it
exists so `bench.py <names>` with SPARK_GRAFT_SF_DIR=<dst> measures how the
heavy queries scale with cores when real data volume is present.

Usage: python tools/make_scale_replica.py [src=/root/testdata/sf0.1] \
           [dst=/tmp/spark_graft_sf1] [factor=10]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.session import get_spark

    spark = get_spark("scale-replica", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    os.makedirs(dst, exist_ok=True)

    # key domains: (table, column) -> offset unit = max+1 of the SOURCE
    def max_plus_one(table: str, col: str) -> int:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        return int(df.agg(F.max(col)).first()[0]) + 1

    units = {
        "custkey": max_plus_one("customer", "c_custkey"),
        "orderkey": max_plus_one("orders", "o_orderkey"),
        "partkey": max_plus_one("part", "p_partkey"),
        "suppkey": max_plus_one("supplier", "s_suppkey"),
        "doc_id": max_plus_one("documents", "doc_id"),
        "vec_id": max_plus_one("embeddings", "vec_id"),
        "user_id": max_plus_one("events", "user_id"),
        "event_id": max_plus_one("events", "event_id"),
    }
    shifts = {  # table -> {column: unit-name}
        "customer": {"c_custkey": "custkey"},
        "supplier": {"s_suppkey": "suppkey"},
        "part": {"p_partkey": "partkey"},
        "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
        "lineitem": {
            "l_orderkey": "orderkey",
            "l_partkey": "partkey",
            "l_suppkey": "suppkey",
        },
        "documents": {"doc_id": "doc_id"},
        "embeddings": {"vec_id": "vec_id"},
        "events": {"event_id": "event_id", "user_id": "user_id"},
    }

    for table in ["region", "nation"]:
        spark.read.parquet(f"{src}/{table}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{table}.parquet"
        )
        print(f"copied {table}")

    for table, cols in shifts.items():
        base = spark.read.parquet(f"{src}/{table}.parquet")
        parts = []
        for i in range(factor):
            rep = base
            for col, unit in cols.items():
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(i * units[unit])).cast("long")
                )
            if table == "documents" and i > 0:
                # disjoint token universes per replica: dedup/shingle
                # structure replicates linearly instead of inventing
                # cross-replica near-duplicate families
                rep = rep.withColumn(
                    "text",
                    F.concat(
                        F.regexp_replace(F.col("text"), " ", f"_{i} "), F.lit(f"_{i}")
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(16).write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        print(f"wrote {table} x{factor}")

    spark.stop()
    print(f"replica at {dst}")


if __name__ == "__main__":
    main()
