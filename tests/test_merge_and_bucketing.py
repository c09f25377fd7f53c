"""Incremental MERGE upsert and bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_upsert_last_wins(spark, tmp_path):
    from vectordb_hr_data_spark.io import merge_upsert

    path = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "id string, v int"
    )
    merge_upsert(spark, path, base)  # bootstrap (no existing dataset)
    updates = spark.createDataFrame([("b", 20), ("d", 40)], "id string, v int")
    merge_upsert(spark, path, updates)
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 20, "c": 3, "d": 40}
    # idempotence: re-applying the same updates changes nothing
    merge_upsert(spark, path, updates)
    got2 = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got2 == got


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with zero
    Exchange operators — the write-once-shuffle-never pattern for repeated
    fact-fact joins at scale."""
    import uuid

    from vectordb_hr_data_spark.io import read_table, write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        suffix = uuid.uuid4().hex[:8]
        li_t, o_t = f"li_b_{suffix}", f"o_b_{suffix}"
        write_bucketed_table(
            read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
            li_t,
            "l_orderkey",
            8,
            sort_col="l_orderkey",
        )
        write_bucketed_table(
            read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
            o_t,
            "o_orderkey",
            8,
            sort_col="o_orderkey",
        )
        li, o = spark.table(li_t), spark.table(o_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1500]}"
        # and the result is correct
        n = joined.count()
        plain = read_table(spark, sf_dir, "lineitem").join(
            read_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert n == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in (li_t, o_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
