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


def test_training_shards_write_reload_manifest(spark, sf_dir, tmp_path):
    """write_training_shards (r6, the B31 sink): write → reload must (a)
    preserve every doc exactly once, (b) lay out one directory per shard
    with the seeded within-shard order recoverable, (c) produce a manifest
    whose per-shard doc/token counts match the reloaded data exactly."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table, write_training_shards

    docs = read_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    manifest = {r.shard: (r.n_docs, r.n_tokens) for r in write_training_shards(docs, out, n_shards=4).collect()}

    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert sorted(int(d.split("=")[1]) for d in shard_dirs) == sorted(manifest)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(r.doc_id for r in back.select("doc_id").collect()) == set(
        r.doc_id for r in docs.select("doc_id").collect()
    )
    got = {
        r.shard: (r.n_docs, r.n_tokens)
        for r in back.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens"),
        )
        .collect()
    }
    assert got == manifest
    # shard assignment is the seeded hash — reproducible from doc_id alone
    for r in back.select("doc_id", "shard").collect():
        h = int(hashlib.md5(f"{r.doc_id}:shuffle:42".encode()).hexdigest()[:8], 16)
        assert r.shard == h % 4


def test_quantizer_state_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    """save/load_quantizer_state (r6): reloaded SQ ranges, PQ codebook and
    rotation must be bit-identical to the trained originals, and codes
    encoded from the RELOADED state must equal codes from the live state
    (the serving-session contract: no re-fit, no drift)."""
    from vectordb_hr_data_spark.io import (
        load_quantizer_state,
        read_table,
        save_quantizer_state,
    )
    from vectordb_hr_data_spark.operators.opq import seeded_rotation
    from vectordb_hr_data_spark.operators.pq import pq_codebook
    from vectordb_hr_data_spark.operators.quantize import (
        fit_ranges,
        sq4_encode_packed_arrow,
        sq8_encode_arrow,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    cb = pq_codebook(emb, dim=64, m=8, k=16)
    rot = seeded_rotation(16, seed=3)
    path = str(tmp_path / "qstate")
    save_quantizer_state(spark, path, sq_ranges=(lo, hi), pq_codebook=cb, rotation=rot)
    st = load_quantizer_state(spark, path)
    assert st["sq_ranges"] == (lo, hi)
    assert st["pq_codebook"] == [list(v) for v in cb]
    assert st["rotation"] == [list(r) for r in rot]

    live = {r.vec_id: (r.c8, r.c4) for r in emb.select(
        "vec_id",
        sq8_encode_arrow("embedding", lo, hi).alias("c8"),
        sq4_encode_packed_arrow("embedding", lo, hi).alias("c4"),
    ).collect()}
    lo2, hi2 = st["sq_ranges"]
    reloaded = {r.vec_id: (r.c8, r.c4) for r in emb.select(
        "vec_id",
        sq8_encode_arrow("embedding", lo2, hi2).alias("c8"),
        sq4_encode_packed_arrow("embedding", lo2, hi2).alias("c4"),
    ).collect()}
    assert live == reloaded
