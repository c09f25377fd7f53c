"""SparkSession factory.

Local test posture: one JVM, ``local[N]`` threads. Cluster posture: the
same configs hold — AQE for runtime re-planning (skew joins, partition
coalescing), Arrow for the Python boundary, UTC so timestamps compare
bit-stable against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vectordb_hr_data_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned session.

    ``spark.sql.shuffle.partitions`` is sized to cores for local runs; on a
    real cluster this is superseded by AQE coalescing
    (``spark.sql.adaptive.coalescePartitions.enabled``), which sizes
    post-shuffle partitions from runtime statistics — the setting here is
    only the initial partition count.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UDF batch width — the Spark knob behind the reference's 5000-row
        # encode+upsert batching (reference config.py:24, SURVEY.md A13)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the driver's events.parquet stores ts as TIMESTAMP(NANOS), which
        # Spark only reads as raw int64; io.read_table converts to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
