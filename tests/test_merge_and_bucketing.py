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


def _file_state(root):
    """(relpath -> (size, sha256)) for every data file under root."""
    import hashlib
    import os

    state = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.startswith((".", "_")):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                state[os.path.relpath(p, root)] = (
                    os.path.getsize(p),
                    hashlib.sha256(fh.read()).hexdigest(),
                )
    return state


def test_merge_upsert_bucketed_rewrites_only_touched_partitions(spark, tmp_path):
    """A small merge must leave unchanged buckets' files byte-identical —
    the incremental-write property the full-rewrite emulation lacks
    (VERDICT r2 item 7)."""
    from vectordb_hr_data_spark.io import merge_upsert_bucketed

    path = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [(f"k{i}", i) for i in range(64)], "id string, v int"
    )
    merge_upsert_bucketed(spark, path, base, n_buckets=8)
    before = _file_state(path)

    updates = spark.createDataFrame([("k3", 300), ("k777", 777)], "id string, v int")
    touched = merge_upsert_bucketed(spark, path, updates, n_buckets=8)
    assert 0 < len(touched) <= 2
    after = _file_state(path)

    touched_dirs = {f"_kb={b}" for b in touched}
    for rel, sig in before.items():
        bucket_dir = rel.split("/")[0]
        if bucket_dir in touched_dirs:
            continue  # touched buckets legitimately rewrite
        assert after.get(rel) == sig, f"untouched partition file changed: {rel}"

    got = {r["id"]: r["v"] for r in spark.read.parquet(path).drop("_kb").collect()}
    expect = {f"k{i}": i for i in range(64)} | {"k3": 300, "k777": 777}
    assert got == expect
    # idempotence
    merge_upsert_bucketed(spark, path, updates, n_buckets=8)
    got2 = {r["id"]: r["v"] for r in spark.read.parquet(path).drop("_kb").collect()}
    assert got2 == expect


def test_merge_upsert_recovery_refuses_to_clobber(spark, tmp_path):
    """If only ._old exists (mid-swap crash), a failed rollback must raise,
    never fall through to overwriting with just the updates (ADVICE r02
    medium)."""
    import os

    from vectordb_hr_data_spark.io import merge_upsert

    path = str(tmp_path / "ds")
    base = spark.createDataFrame([("a", 1)], "id string, v int")
    merge_upsert(spark, path, base)
    # simulate a crash after the aside-rename: live dir gone, ._old holds data
    os.rename(path, path + "._old")
    updates = spark.createDataFrame([("b", 2)], "id string, v int")
    merge_upsert(spark, path, updates)  # rollback succeeds -> normal merge
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 2}


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
