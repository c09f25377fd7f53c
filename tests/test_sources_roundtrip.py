"""Source-format breadth: CSV and ORC round-trips preserve data and keep
pushdown working (parquet is the default; these are the alternates)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    from vectordb_hr_data_spark.io import read_csv, read_table

    src = read_table(spark, sf_dir, "customer")
    out = str(tmp_path / "customer_csv")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = read_csv(spark, out, src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from vectordb_hr_data_spark.io import read_orc, read_table

    src = read_table(spark, sf_dir, "part")
    out = str(tmp_path / "part_orc")
    src.write.mode("overwrite").orc(out)
    back = read_orc(spark, out)
    assert back.count() == src.count()
    filtered = back.filter(F.col("p_size") > 25).select("p_partkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "p_size" in plan.split("PushedFilters")[1][:200]
    want = src.filter(F.col("p_size") > 25).count()
    assert filtered.count() == want
