"""Structured Streaming parity: the streaming tumbling-window aggregation
must reproduce the batch query's result when fed the same bounded input."""

from __future__ import annotations

import shutil

import pytest


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Copy the events parquet into a directory source (multiple files so
    maxFilesPerTrigger produces several micro-batches)."""
    out = tmp_path_factory.mktemp("events_stream")
    from vectordb_hr_data_spark.io import read_table

    # read_table normalizes the nanos ts; the rewritten copy is micros,
    # which the streaming reader's TimestampType schema handles directly
    df = read_table(spark, sf_dir, "events")
    df.repartition(4).write.mode("overwrite").parquet(str(out / "src"))
    yield str(out / "src")
    shutil.rmtree(out, ignore_errors=True)


def test_streaming_tumbling_matches_batch(spark, events_dir):
    from vectordb_hr_data_spark.querydefs.event_queries import tumbling_agg
    from vectordb_hr_data_spark.streaming.stream_ops import (
        read_events_stream,
        run_to_completion,
        windowed_counts_stream,
    )

    stream = read_events_stream(spark, events_dir)
    result = run_to_completion(windowed_counts_stream(stream), "tumbling_smoke")
    batch = tumbling_agg(spark.read.parquet(events_dir))
    got = sorted(map(tuple, result.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_stateful_running_totals(spark, events_dir):
    """applyInPandasWithState carries per-user state across micro-batches;
    the LAST emitted row per user must equal the batch per-user totals."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.streaming.stream_ops import (
        read_events_stream,
        run_to_completion,
        running_user_totals_stream,
    )

    stream = read_events_stream(spark, events_dir)
    out = run_to_completion(running_user_totals_stream(stream), "stateful_smoke", output_mode="update")
    # in update mode the sink accumulates one row per user per micro-batch
    # that touched them; the final state is the row with the max n_events
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in final.collect()}
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
    )
    want = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0]
        assert abs(got[uid][1] - want[uid][1]) < 0.05  # float accumulation tolerance


def test_stream_merge_into_parquet(spark, events_dir, tmp_path):
    """foreachBatch MERGE sink: the final dataset equals the batch per-user
    running totals — each micro-batch's update overwrote the previous one
    (last-wins upsert), with no duplicate keys."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.streaming.stream_ops import (
        read_events_stream,
        running_user_totals_stream,
        stream_merge_into,
    )

    target = str(tmp_path / "user_totals")
    stream = read_events_stream(spark, events_dir)
    stream_merge_into(running_user_totals_stream(stream), target, key="user_id")

    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in spark.read.parquet(target).collect()}
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
    )
    want = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0]
        assert abs(got[uid][1] - want[uid][1]) < 0.05


def test_stream_merge_into_bucketed_parquet(spark, events_dir, tmp_path):
    """The bucketed streaming MERGE sink must converge to the same final
    per-user totals as the full-rewrite sink, with the target laid out in
    key-hash bucket partitions."""
    import os

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.streaming.stream_ops import (
        read_events_stream,
        running_user_totals_stream,
        stream_merge_into,
    )

    target = str(tmp_path / "user_totals_bucketed")
    stream = read_events_stream(spark, events_dir)
    stream_merge_into(running_user_totals_stream(stream), target, key="user_id", bucketed=True, n_buckets=4)

    assert any(d.startswith("_kb=") for d in os.listdir(target))
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.read.parquet(target).drop("_kb").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
    )
    want = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0]
        assert abs(got[uid][1] - want[uid][1]) < 0.05


def test_streaming_dedup_drops_within_watermark_duplicates(spark, sf_dir, tmp_path):
    """Write the same events twice (two files → two micro-batches); the
    deduped stream must contain each event_id exactly once."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        dedup_stream,
        read_events_stream,
        run_to_completion,
    )

    src = str(tmp_path / "dup_src")
    ev = read_table(spark, sf_dir, "events").limit(500)
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # exact replay

    stream = read_events_stream(spark, src)
    out = run_to_completion(dedup_stream(stream), "dedup_smoke", output_mode="append")
    ids = [r.event_id for r in out.select("event_id").collect()]
    assert len(ids) == len(set(ids)) == ev.count()


def test_rate_source_windowed_counts_unbounded(spark):
    """The watermark/window builder must run against a source that never
    ends: drive a few rate-micro-batch triggers, then stop."""
    from vectordb_hr_data_spark.streaming.stream_ops import (
        read_rate_stream,
        run_n_batches,
        windowed_counts_stream,
    )

    stream = read_rate_stream(spark, rows_per_batch=100)
    out = run_n_batches(
        windowed_counts_stream(stream, width="1 minute", watermark="0 seconds"),
        "rate_smoke",
        n_batches=3,
        output_mode="update",
    )
    rows = out.collect()
    assert set(out.columns) == {"window_start", "event_type", "n_events", "total_value"}
    assert sum(r.n_events for r in rows) > 0


def test_watermark_evicts_late_data(spark, tmp_path):
    """End-to-end late-data eviction proof (VERDICT r2 item 8): an event
    arriving AFTER the watermark passed its window must be dropped — the
    finalized window's count excludes it. Replay-parity tests can't show
    this; here micro-batch order is forced by writing file 2 only after
    batch 1 is fully processed."""
    import datetime as dt

    from vectordb_hr_data_spark.streaming.stream_ops import (
        EVENTS_SCHEMA,
        read_events_stream,
        windowed_counts_stream,
    )

    def ev(eid, hh, mm):
        return (eid, dt.datetime(2026, 1, 1, hh, mm), 1, "click", 1.0, None)

    src = str(tmp_path / "late_src")
    # batch 1: three events in the 10:00 window + one at 14:00 that drives
    # the watermark (2h) to 12:00, past the 10:00 window's 11:00 end
    b1 = [ev(1, 10, 0), ev(2, 10, 10), ev(3, 10, 20), ev(4, 14, 0)]
    spark.createDataFrame(b1, EVENTS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)

    stream = read_events_stream(spark, src)
    q = (
        windowed_counts_stream(stream, width="1 hour", watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_drop_smoke")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 ingested; watermark now 12:00
        # batch 2: a LATE event inside the already-closed 10:00 window
        spark.createDataFrame([ev(5, 10, 30)], EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()  # must drop it and finalize the window
    finally:
        q.stop()

    rows = {r.window_start: r.n_events for r in spark.sql("SELECT * FROM late_drop_smoke").collect()}
    ten = dt.datetime(2026, 1, 1, 10, 0)
    two_pm = dt.datetime(2026, 1, 1, 14, 0)
    # the 10:00 window finalized with the 3 on-time events — the late 4th
    # was evicted, not merged
    assert rows.get(ten) == 3
    # the 14:00 window is still open (watermark hasn't passed 15:00), so
    # append mode must not have emitted it
    assert two_pm not in rows


def test_streaming_sessionize_runs(spark, events_dir):
    from vectordb_hr_data_spark.streaming.stream_ops import (
        read_events_stream,
        run_to_completion,
        sessionize_stream,
    )

    stream = read_events_stream(spark, events_dir)
    result = run_to_completion(sessionize_stream(stream), "session_smoke")
    rows = result.collect()
    assert len(rows) > 0
    assert {c for c in result.columns} == {"user_id", "session_start", "session_end", "n_events"}


def test_kafka_source_raises_clear_error_without_package(spark):
    """The local image has no Kafka jars: the builder must fail loudly at
    construction with the package name, not at the first micro-batch. (On
    a classpath WITH the package this test is vacuous — the builder then
    returns an events-shaped stream identical to the other sources.)"""
    from vectordb_hr_data_spark.streaming.stream_ops import read_kafka_stream

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "events")


def test_contamination_gate_stream_flags_superset_of_exact(spark, sf_dir, tmp_path):
    """The streaming Bloom ingest gate must flag every document the exact
    batch decontamination sweep flags (no false negatives), running as a
    stateless projection over a genuine unbounded-source API (file stream),
    with stream output identical to applying the same gate in batch."""
    import shutil

    import vectordb_hr_data_spark.queries as Q
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.pipeline_queries import _BLOOM_CACHE
    from vectordb_hr_data_spark.streaming.stream_ops import (
        contamination_gate_stream,
        run_n_batches,
    )

    # build the bloom (and the exact contaminated set) from the corpus
    bloom_df = Q.REGISTRY["doc_decontaminate_bloom"].fn(spark, sf_dir)
    exact_ids = {r.doc_id for r in bloom_df.collect()}
    bloom_df.shingle_cache.unpersist()
    bits, n_bits = _BLOOM_CACHE[sf_dir]

    docs = read_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_stream_src")
    shutil.copytree(f"{sf_dir}", src, ignore=shutil.ignore_patterns("*"))
    shutil.copy(f"{sf_dir}/documents.parquet", src + "/part-0.parquet")

    stream = spark.readStream.schema(docs.schema).parquet(src)
    gated = contamination_gate_stream(stream, bits, n_bits)
    out = run_n_batches(gated.select("doc_id", "contaminated"), "contamination_gate", n_batches=1)
    flagged = {r.doc_id for r in out.collect() if r.contaminated}
    total = out.count()
    assert total == docs.count()  # stateless: every row passes through once
    assert exact_ids <= flagged  # no false negatives vs the exact sweep

    # stream ≡ batch for the same Column logic
    batch_flagged = {
        r.doc_id
        for r in contamination_gate_stream(docs, bits, n_bits).collect()
        if r.contaminated
    }
    assert flagged == batch_flagged


def test_windowed_topk_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming per-window top-k must emit exactly the rows the identical
    expression produces in batch over the same events (unified model), with
    deterministic tie-breaks."""
    import os
    import shutil

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        run_to_completion,
        windowed_topk_stream,
    )

    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src + "/part-0.parquet")

    stream = spark.readStream.schema(events.schema).parquet(src)
    got = run_to_completion(
        windowed_topk_stream(stream), "windowed_topk", output_mode="complete"
    )
    want = windowed_topk_stream(events)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0
    # every (window, key) group has at most k rows
    from collections import Counter

    counts = Counter((r[0], r[1]) for r in g)
    assert max(counts.values()) <= 3


def test_running_topk_stream_bounded_state_matches_batch(spark, sf_dir, tmp_path):
    """The capped-state streaming top-k's FINAL emission per key must equal
    the batch top-k over all events, regardless of micro-batch arrival
    order — state never holds more than k rows per key."""
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        run_to_completion,
        running_topk_stream,
    )

    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_topk_src")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src + "/part-0.parquet")

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = run_to_completion(
        running_topk_stream(stream), "running_topk", output_mode="update"
    )
    # update mode re-emits per batch; keep the LAST emission per (key, rank)
    latest = {}
    for r in out.collect():
        latest[(r.event_type, r.rank)] = (r.value, r.event_id)

    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").asc())
    want = {
        (r.event_type, r.rn): (r.value, r.event_id)
        for r in events.filter(F.col("value").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .collect()
    }
    assert latest == want


def test_stream_ivf_sq8_append_equals_batch_build(spark, sf_dir, tmp_path):
    """An IVF+SQ8 index grown incrementally from a stream (2 micro-batches)
    must be row-identical (vec_id, cid, codes) to a from-scratch batch
    build over the same vectors with the same trained state, and a pruned
    probe query over either index returns identical top-k."""
    import glob
    import os

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.ivf import ivf_assign, ivf_topk_indexed
    from vectordb_hr_data_spark.operators.quantize import fit_ranges, sq8_encode_arrow
    from vectordb_hr_data_spark.streaming.stream_ops import stream_ivf_sq8_append

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    cents_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )
    centroid_rows = [(int(r.cid), [float(x) for x in r.cvec]) for r in cents_df.collect()]

    # batch reference build over ALL vectors
    ref_path = str(tmp_path / "idx_batch")
    assigned = ivf_assign(emb, cents_df)
    assigned.select(
        "vec_id", "embedding", sq8_encode_arrow("embedding", lo, hi).alias("codes"), "cid"
    ).write.partitionBy("cid").mode("overwrite").parquet(ref_path)

    # seed the streamed index with the first half, stream the second half
    # in two micro-batches (two source files, maxFilesPerTrigger=1)
    stream_path = str(tmp_path / "idx_stream")
    half = emb.filter(F.col("vec_id") < 250)
    rest = emb.filter(F.col("vec_id") >= 250)
    a1 = ivf_assign(half, cents_df)
    a1.select(
        "vec_id", "embedding", sq8_encode_arrow("embedding", lo, hi).alias("codes"), "cid"
    ).write.partitionBy("cid").mode("overwrite").parquet(stream_path)

    src = str(tmp_path / "vec_src")
    rest.filter(F.col("vec_id") % 2 == 0).write.parquet(src)
    rest.filter(F.col("vec_id") % 2 == 1).write.mode("append").parquet(src)
    assert len(glob.glob(src + "/*.parquet")) >= 2

    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_ivf_sq8_append(stream, stream_path, centroid_rows, lo, hi)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def snapshot(p):
        return sorted(
            (r.vec_id, r.cid, tuple(r.codes))
            for r in spark.read.parquet(p).select("vec_id", "cid", "codes").collect()
        )

    assert snapshot(stream_path) == snapshot(ref_path)

    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    got = sorted(map(tuple, ivf_topk_indexed(spark, stream_path, cents_df, qvec).collect()))
    want = sorted(map(tuple, ivf_topk_indexed(spark, ref_path, cents_df, qvec).collect()))
    assert got == want and len(got) == 10

    # VERDICT r4 #6: and through the REAL serving path — phase-1 over the
    # streamed codes column + exact re-rank — the incrementally-grown index
    # must return byte-identical results to the cold batch rebuild.
    from vectordb_hr_data_spark.operators.quantize import sq8_qdist_codes_arrow

    def two_phase(p):
        probe = [
            r.cid
            for r in cents_df.select(
                "cid",
                F.aggregate(
                    F.zip_with(
                        F.col("cvec"), F.lit(qvec), lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
            )
            .orderBy(F.col("d").asc(), F.col("cid").asc())
            .limit(4)
            .collect()
        ]
        scan = spark.read.parquet(p).filter(F.col("cid").isin(probe))
        qd = F.round(sq8_qdist_codes_arrow("codes", lo, hi, qvec), 4)
        cand = (
            scan.select("vec_id", qd.alias("qd"))
            .orderBy(F.col("qd").asc(), F.col("vec_id").asc())
            .limit(50)
            .select("vec_id")
        )
        surv = scan.join(F.broadcast(cand), "vec_id")
        dist = F.round(
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.lit(qvec),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        )
        return sorted(
            map(
                tuple,
                surv.select("vec_id", dist.alias("distance"))
                .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
                .limit(10)
                .collect(),
            )
        )

    assert two_phase(stream_path) == two_phase(ref_path)


def test_neardup_gate_stream_covers_lsh_candidates(spark, sf_dir, tmp_path):
    """The streaming band-key Bloom gate must flag every document that the
    batch LSH candidate stage pairs with ANOTHER corpus document (no false
    negatives — both docs of every candidate pair share a band key that is
    in the corpus set), and stream output must equal applying the gate in
    batch."""
    import os
    import shutil

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.dedup_queries import neardup_minhash_lsh
    from vectordb_hr_data_spark.streaming.stream_ops import (
        build_band_key_bloom,
        neardup_gate_stream,
        run_to_completion,
    )

    docs = read_table(spark, sf_dir, "documents")
    bits, n_bits = build_band_key_bloom(docs)

    src = str(tmp_path / "gate_src")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/documents.parquet", src + "/part-0.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = run_to_completion(
        neardup_gate_stream(stream, bits, n_bits).select("doc_id", "near_dup_candidate"),
        "neardup_gate",
        output_mode="append",
    )
    flagged = {r.doc_id for r in out.collect() if r.near_dup_candidate}
    assert out.count() == docs.count()

    pairs = neardup_minhash_lsh(spark, sf_dir).collect()
    in_pairs = {r.doc_id_1 for r in pairs} | {r.doc_id_2 for r in pairs}
    assert in_pairs <= flagged  # candidates always gate-flagged

    batch_flagged = {
        r.doc_id
        for r in neardup_gate_stream(docs, bits, n_bits).collect()
        if r.near_dup_candidate
    }
    assert flagged == batch_flagged


def test_needs_retune_contract():
    """VERDICT r5 #4, pure-function half: retune triggers exactly when the
    corpus exceeds k x rows_per_cell x tolerance; bad inputs raise."""
    import pytest as _pytest

    from vectordb_hr_data_spark.operators.ivf import ROWS_PER_CELL, needs_retune

    built = {"k": 4, "rows_per_cell": 50}
    assert not needs_retune(0, built)
    assert not needs_retune(400, built)  # exactly at 4*50*2.0 — not yet stale
    assert needs_retune(401, built)
    # tolerance is a knob
    assert needs_retune(201, built, growth_tolerance=1.0)
    assert not needs_retune(201, built, growth_tolerance=3.0)
    # rows_per_cell defaults to the module budget
    assert not needs_retune(2 * ROWS_PER_CELL, {"k": 1})
    assert needs_retune(2 * ROWS_PER_CELL + 1, {"k": 1})
    with _pytest.raises(ValueError):
        needs_retune(10, {"k": 0})
    with _pytest.raises(ValueError):
        needs_retune(-1, built)


def test_stream_append_triggers_retune_and_rebuild_meets_sla(spark, sf_dir, tmp_path):
    """VERDICT r5 #4, wired half: grow the streamed IVF index past its
    rows-per-cell budget -> the maintenance sink fires on_retune exactly
    once with the grown row count; re-suggesting params at the new scale
    and rebuilding delivers measured recall@10 >= the SLA (the "rebuilt
    index meets the SLA" leg, replayed numpy-exact like the tuning
    contract test)."""
    import glob

    import numpy as np
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.ivf import (
        fit_centroids,
        ivf_assign,
        suggest_ivf_params,
    )
    from vectordb_hr_data_spark.operators.quantize import fit_ranges, sq8_encode_arrow
    from vectordb_hr_data_spark.streaming.stream_ops import stream_ivf_sq8_append

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    cents_df = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )
    centroid_rows = [(int(r.cid), [float(x) for x in r.cvec]) for r in cents_df.collect()]

    # seed with 250 rows; built geometry budgets 4 cells x 50 rows x 2.0
    # tolerance = 400 rows, so the stream's +250 must cross it mid-growth
    stream_path = str(tmp_path / "idx_grow")
    half = emb.filter(F.col("vec_id") < 250)
    rest = emb.filter(F.col("vec_id") >= 250)
    a1 = ivf_assign(half, cents_df)
    a1.select(
        "vec_id", "embedding", sq8_encode_arrow("embedding", lo, hi).alias("codes"), "cid"
    ).write.partitionBy("cid").mode("overwrite").parquet(stream_path)

    src = str(tmp_path / "vec_src_grow")
    rest.filter(F.col("vec_id") % 2 == 0).write.parquet(src)
    rest.filter(F.col("vec_id") % 2 == 1).write.mode("append").parquet(src)
    assert len(glob.glob(src + "/*.parquet")) >= 2

    fired: list[int] = []
    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_ivf_sq8_append(
        stream,
        stream_path,
        centroid_rows,
        lo,
        hi,
        base_rows=250,
        on_retune=fired.append,
        rows_per_cell=50,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # fired exactly once, at the batch whose append crossed the 400-row
    # budget, and the final count matches the full corpus
    assert len(fired) == 1
    assert 400 < fired[0] <= 500
    n_now = spark.read.parquet(stream_path).count()
    assert n_now == 500

    # the retune leg: re-suggest at the grown scale and rebuild — measured
    # recall@10 must meet the SLA
    sla = 0.6
    k_new, n_probe = suggest_ivf_params(n_now, 64, sla, rows_per_cell=50)
    assert k_new > len(centroid_rows)  # geometry actually refreshed
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    C = np.array(
        [
            [float(x) for x in r.cvec]
            for r in sorted(fit_centroids(emb, k=k_new).collect(), key=lambda r: r.cid)
        ]
    )
    assign = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2).argmin(1)
    recs = []
    for qi in range(16):
        qv = X[qi]
        probe = set(np.argsort(((C - qv) ** 2).sum(1), kind="stable")[:n_probe])
        cand = np.where(np.isin(assign, list(probe)))[0]
        ex = ((X - qv) ** 2).sum(1)
        exact10 = set(np.argsort(ex, kind="stable")[:10])
        got10 = set(cand[np.argsort(ex[cand], kind="stable")[:10]])
        recs.append(len(got10 & exact10) / 10)
    assert float(np.mean(recs)) >= sla


def test_stream_scd2_dim_converges_to_batch_build(spark, sf_dir, tmp_path):
    """stream_scd2_dim (r7): four ts-ordered micro-batches folded through
    the foreachBatch SCD2 merge must produce a dimension EXACTLY equal to
    the one-shot batch build over all events; an out-of-order batch must
    raise (the in-order CDC contract is enforced, not assumed)."""
    import os
    import glob
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import scd2_build
    from vectordb_hr_data_spark.streaming.stream_ops import stream_scd2_dim

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    src = tmp_path / "scd2_src"
    src.mkdir()
    # four ts-range files with ascending mtimes so the file source (oldest
    # first) delivers them in stream order; ties on ts never split
    ts_sorted = [r.ts for r in ev.select("ts").distinct().orderBy("ts").collect()]
    cuts = [ts_sorted[len(ts_sorted) * i // 4] for i in (1, 2, 3)]
    lo = None
    for i in range(4):
        hi = cuts[i] if i < 3 else None
        part = ev
        if lo is not None:
            part = part.filter(F.col("ts") > lo)
        if hi is not None:
            part = part.filter(F.col("ts") <= hi)
        tdir = str(tmp_path / f"part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        lo = hi
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    target = str(tmp_path / "scd2_dim")
    stream_scd2_dim(stream, target)
    dim = spark.read.parquet(target)
    got = sorted(map(tuple, dim.drop("last_ts").collect()))
    want = sorted(map(tuple, scd2_build(ev).collect()))
    assert got == want and len(got) > 0

    # the last_ts bookkeeping column: present on every is_current row,
    # null on closed rows, and equal to the user's true newest event ts
    cur = dim.filter(F.col("is_current"))
    assert dim.filter(~F.col("is_current") & F.col("last_ts").isNotNull()).count() == 0
    true_last = ev.groupBy("user_id").agg(F.max("ts").alias("t_last"))
    assert (
        cur.join(true_last, "user_id")
        .filter((F.col("last_ts").isNull()) | (F.col("last_ts") != F.col("t_last")))
        .count()
        == 0
    )

    # out-of-order input: replaying the FIRST range against the final dim
    # trips the guard condition stream_scd2_dim raises on — assert the
    # scenario is real on this data (the guard predicate fires)
    early = ev.filter(F.col("ts") <= cuts[0])
    bmin = early.groupBy("user_id").agg(F.min("ts").alias("bmin"))
    viol = bmin.join(cur, "user_id").filter(F.col("bmin") < F.col("last_ts")).count()
    assert viol > 0  # the guard scenario is real on this data

    # the r7-ADVICE hole: an event INSIDE the open run's span (>= valid_from
    # but older than the newest folded event) slipped past a valid_from-only
    # guard; the last_ts guard must both FIRE on it and RAISE end-to-end
    victim = (
        cur.filter(F.col("last_ts") > F.col("valid_from"))
        .select("user_id", "valid_from", "last_ts", "event_type")
        .limit(1)
        .collect()[0]
    )
    late = spark.createDataFrame(
        [(victim.user_id, 999_999_999, victim.valid_from, victim.event_type)],
        ev.schema,
    )
    old_guard = (
        late.groupBy("user_id")
        .agg(F.min("ts").alias("bmin"))
        .join(cur, "user_id")
        .filter(F.col("bmin") < F.col("valid_from"))
        .count()
    )
    assert old_guard == 0  # valid_from alone would have let this through
    new_guard = (
        late.groupBy("user_id")
        .agg(F.min("ts").alias("bmin"))
        .join(cur, "user_id")
        .filter(F.col("bmin") < F.col("last_ts"))
        .count()
    )
    assert new_guard == 1
    src2 = tmp_path / "scd2_src_late"
    src2.mkdir()
    tdir = str(tmp_path / "late_part")
    late.coalesce(1).write.parquet(tdir)
    shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], str(src2 / "late.parquet"))
    stream2 = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src2))
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="out-of-order"):
        stream_scd2_dim(stream2, target)


def test_stream_zorder_append_compacts_on_trigger(spark, sf_dir, tmp_path):
    """stream_zorder_append (r8): five single-file micro-batches append
    Morton-keyed rows (one-plus small file each), the 5th batch trips the
    compaction trigger exactly once, the compacted dataset holds every
    input row with zvals equal to the batch layout query's integer
    contract, and the file count collapses below the append-era count."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import compact_clustered, read_table
    from vectordb_hr_data_spark.streaming.stream_ops import stream_zorder_append

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ext = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
        F.max("user_id").alias("umax"),
    ).first()
    n_in = ev.count()
    src = tmp_path / "z_src"
    src.mkdir()
    for i in range(5):
        part = ev.filter((F.col("event_id") % 5) == i)
        tdir = str(tmp_path / f"zpart{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    target = str(tmp_path / "z_target")
    fired = []

    def on_compact(p: str) -> None:
        fired.append(compact_clustered(spark, p, ["zval"], 1000))

    q = stream_zorder_append(
        stream,
        target,
        int(ext.t0),
        int(ext.t1),
        int(ext.umax),
        compact_every_batches=5,
        on_compact=on_compact,
    )
    q.processAllAvailable()
    q.stop()
    assert len(fired) == 1
    files_before, files_after = fired[0]
    assert files_before >= 5 and files_after < files_before
    out = spark.read.parquet(target)
    assert out.count() == n_in
    # zval contract: identical to the batch layout expression at the same
    # frozen extremes
    from vectordb_hr_data_spark.querydefs.event_queries import _ZVAL_SPARK

    span = int(ext.t1) - int(ext.t0) + 1
    want = ev.select(
        "event_id",
        F.expr(f"user_id * 256 div ({int(ext.umax)} + 1)").cast("long").alias("ub"),
        F.expr(f"(unix_micros(ts) - {int(ext.t0)}) * 256 div {span}").cast("long").alias("hb"),
    ).select("event_id", F.expr(_ZVAL_SPARK).cast("long").alias("zval"))
    got = out.select("event_id", "zval")
    assert (
        got.join(want, "event_id")
        .filter(got.zval != want.zval)
        .count()
        == 0
    )


def test_stream_zorder_append_replay_is_idempotent(spark, sf_dir, tmp_path):
    """ADVICE r8: foreachBatch is at-least-once — restarting the stream
    with a FRESH checkpoint redelivers every file with the same epoch ids.
    The per-epoch markers (sibling ._epochs dir) must make the replay a
    no-op: row count and file count unchanged, no duplicate rows, and no
    spurious compaction (marker count doesn't grow on skipped epochs)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import stream_zorder_append

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ext = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
        F.max("user_id").alias("umax"),
    ).first()
    n_in = ev.count()
    src = tmp_path / "zr_src"
    src.mkdir()
    for i in range(3):
        part = ev.filter((F.col("event_id") % 3) == i)
        tdir = str(tmp_path / f"zrpart{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    target = str(tmp_path / "zr_target")
    compactions = []

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_zorder_append(
            stream,
            target,
            int(ext.t0),
            int(ext.t1),
            int(ext.umax),
            compact_every_batches=100,  # never fires in this test
            on_compact=lambda p: compactions.append(p),
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    out1 = spark.read.parquet(target)
    assert out1.count() == n_in
    files1 = {f for f in os.listdir(target) if f.endswith(".parquet")}
    def _markers():
        # Hadoop's checksummed local FS writes .crc sidecars os.listdir
        # sees (fs.listStatus hides them, so the cadence count is clean)
        return {
            f
            for f in os.listdir(target.rstrip("/") + "._epochs")
            if f.startswith("epoch-")
        }

    markers1 = _markers()
    assert markers1 == {"epoch-0", "epoch-1", "epoch-2"}

    # fresh temp checkpoint → the engine redelivers all 3 files as epochs
    # 0..2 again; the markers must skip every one
    run_once()
    out2 = spark.read.parquet(target)
    assert out2.count() == n_in  # no duplicates
    assert {f for f in os.listdir(target) if f.endswith(".parquet")} == files1
    assert _markers() == markers1
    assert compactions == []
    # distinct event_ids still intact (belt and braces on the dedup claim)
    assert out2.select("event_id").distinct().count() == n_in


def test_stream_scd2_dim_backfills_missing_last_ts(spark, sf_dir, tmp_path):
    """ADVICE r8: a dimension written by the pre-last_ts build has no
    last_ts column; folding a new batch into it must degrade to the
    valid_from guard (not raise an unresolved-column error) and the
    rewrite must carry a correct last_ts from that batch onward."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import scd2_build
    from vectordb_hr_data_spark.streaming.stream_ops import stream_scd2_dim

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    cut = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    early = ev.filter(F.col("event_id") <= cut)
    # legacy dim: scd2_build output with NO last_ts column
    ts_cut = early.agg(F.max("ts")).first()[0]
    old = ev.filter(F.col("ts") <= ts_cut)
    new = ev.filter(F.col("ts") > ts_cut)
    assert new.count() > 0
    target = str(tmp_path / "legacy_dim")
    scd2_build(old).write.parquet(target)
    assert "last_ts" not in spark.read.parquet(target).columns

    src = tmp_path / "scd2_bf_src"
    src.mkdir()
    tdir = str(tmp_path / "bf_part")
    new.coalesce(1).write.parquet(tdir)
    shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], str(src / "f0.parquet"))
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    stream_scd2_dim(stream, target)  # must not raise AnalysisException
    dim = spark.read.parquet(target)
    assert "last_ts" in dim.columns
    got = sorted(map(tuple, dim.drop("last_ts").collect()))
    want = sorted(map(tuple, scd2_build(ev).collect()))
    assert got == want and len(got) > 0
    # last_ts on is_current rows reflects the STREAMED batch's max ts for
    # touched users (prior history had none to contribute)
    touched = new.groupBy("user_id").agg(F.max("ts").alias("t_last"))
    cur = dim.filter(F.col("is_current"))
    assert (
        cur.join(touched, "user_id")
        .filter((F.col("last_ts").isNull()) | (F.col("last_ts") != F.col("t_last")))
        .count()
        == 0
    )


def _ts_ordered_stream_files(spark, ev, tmp_path, tag, n_parts=4):
    """Split events into n ts-range files with ascending mtimes so the
    file source delivers them in stream order; ties on ts never split."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    src = tmp_path / f"{tag}_src"
    src.mkdir()
    ts_sorted = [r.ts for r in ev.select("ts").distinct().orderBy("ts").collect()]
    cuts = [ts_sorted[len(ts_sorted) * i // n_parts] for i in range(1, n_parts)]
    lo = None
    for i in range(n_parts):
        hi = cuts[i] if i < n_parts - 1 else None
        part = ev
        if lo is not None:
            part = part.filter(F.col("ts") > lo)
        if hi is not None:
            part = part.filter(F.col("ts") <= hi)
        tdir = str(tmp_path / f"{tag}_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        lo = hi
    return src


def test_stream_burst_state_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_burst_state (r9): four micro-batches of additive bucket
    merges + the state-side flag query must equal the one-shot
    events_hourly_burst over all events — including hour buckets whose
    events split across batches."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_hourly_burst
    from vectordb_hr_data_spark.streaming.stream_ops import (
        burst_flags_from_state,
        stream_burst_state,
    )

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    src = _ts_ordered_stream_files(spark, ev, tmp_path, "burst")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    state = str(tmp_path / "burst_state")
    stream_burst_state(stream, state)
    # at least one hour bucket straddles a batch cut (the merge is tested)
    got = sorted(map(tuple, burst_flags_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_hourly_burst(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_markov_state_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_markov_state (r9): per-batch internal transitions + the
    carried-last-event boundary stitch must reproduce the one-shot
    events_markov_transitions matrix exactly; an out-of-order replay
    must raise."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_markov_transitions
    from vectordb_hr_data_spark.streaming.stream_ops import (
        markov_matrix_from_state,
        stream_markov_state,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    src = _ts_ordered_stream_files(spark, ev, tmp_path, "markov")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    state = str(tmp_path / "markov_state")
    stream_markov_state(stream, state)
    got = sorted(map(tuple, markov_matrix_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_markov_transitions(spark, sf_dir).collect()))
    assert got == want and len(got) > 0
    # boundary stitching did real work: internal-only counts would be
    # short by (#users with events in 2+ batches) transitions
    n_total = sum(r[2] for r in got)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert n_total == n_events - n_users  # every adjacent pair counted once

    # out-of-order replay (the earliest file again) trips the guard
    early = ev.orderBy("ts").limit(100)
    src2 = tmp_path / "markov_late_src"
    src2.mkdir()
    tdir = str(tmp_path / "markov_late_part")
    early.coalesce(1).write.parquet(tdir)
    shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], str(src2 / "late.parquet"))
    stream2 = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src2))
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="out-of-order"):
        stream_markov_state(stream2, state)


def test_stream_slice_profile_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_slice_profile (r9): associative-merge state over 4
    micro-batches of documents must equal the one-shot
    source_slice_profile — including slices whose docs split across
    batches and the read-time-derived mean."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.pipeline_queries import source_slice_profile
    from vectordb_hr_data_spark.streaming.stream_ops import (
        slice_profile_from_state,
        stream_slice_profile,
    )

    docs = read_table(spark, sf_dir, "documents")
    src = tmp_path / "slice_src"
    src.mkdir()
    for i in range(4):
        part = docs.filter((F.col("doc_id") % 4) == i)
        tdir = str(tmp_path / f"slice_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    state = str(tmp_path / "slice_state")
    stream_slice_profile(stream, state)
    got = sorted(map(tuple, slice_profile_from_state(spark, state).collect()))
    want = sorted(map(tuple, source_slice_profile(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_sliding_distinct_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_sliding_distinct (late r9): (window, user)-keyed mergeable
    state over 4 micro-batches must equal the one-shot
    events_sliding_distinct_users — including users whose events split
    across batches (the case a naive per-batch distinct-count would
    double-count) and windows fed by multiple batches."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import (
        events_sliding_distinct_users,
    )
    from vectordb_hr_data_spark.streaming.stream_ops import (
        sliding_distinct_from_state,
        stream_sliding_distinct,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "slide_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"slide_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "slide_state")
    stream_sliding_distinct(stream, state)
    got = sorted(map(tuple, sliding_distinct_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_sliding_distinct_users(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_heavy_hitter_state_retains_true_hitters(spark, sf_dir, tmp_path):
    """stream_heavy_hitter_state (late r9): after 4 micro-batches the MG
    summary (a) never exceeds the counter bound, and (b) contains EVERY
    term the batch term_heavy_hitters op reports — the mergeable-summary
    pigeonhole guarantee (counters+1 > HH_K, so true hitters cannot be
    decremented away regardless of batch boundaries)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.text_queries import MG_COUNTERS, term_heavy_hitters
    from vectordb_hr_data_spark.streaming.stream_ops import (
        heavy_hitters_from_state,
        stream_heavy_hitter_state,
    )

    docs = read_table(spark, sf_dir, "documents")
    src = tmp_path / "hh_src"
    src.mkdir()
    for i in range(4):
        part = docs.filter((F.col("doc_id") % 4) == i)
        tdir = str(tmp_path / f"hh_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "hh_state")
    stream_heavy_hitter_state(stream, state, counters=MG_COUNTERS)
    kept = {r.term for r in heavy_hitters_from_state(spark, state).collect()}
    assert len(kept) <= MG_COUNTERS
    true_hitters = {r.term for r in term_heavy_hitters(spark, sf_dir).collect()}
    assert true_hitters, "corpus has no heavy hitters — guarantee not exercised"
    assert true_hitters <= kept, f"lost hitters: {true_hitters - kept}"


def test_stream_seasonal_counts_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_seasonal_counts (late r9): the streamed (type, day, hour)
    count grid over 4 micro-batches yields the EXACT batch B108 anomaly
    report — including cells whose counts accumulate across batches."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_seasonal_anomaly
    from vectordb_hr_data_spark.streaming.stream_ops import (
        seasonal_anomaly_from_state,
        stream_seasonal_counts,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "seas_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"seas_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "seas_state")
    stream_seasonal_counts(stream, state)
    # the converged count grid equals the batch grid exactly (non-empty
    # at every SF)...
    got_grid = sorted(
        map(tuple, spark.read.parquet(state).select("event_type", "day", "hod", "n").collect())
    )
    want_grid = sorted(
        map(
            tuple,
            ev.select(
                "event_type", F.to_date("ts").alias("day"), F.hour("ts").cast("int").alias("hod")
            )
            .groupBy("event_type", "day", "hod")
            .agg(F.count("*").cast("long").alias("n"))
            .collect(),
        )
    )
    assert got_grid == want_grid and len(got_grid) > 0
    # ...and the derived anomaly report matches the batch op row-for-row
    # (possibly empty at sf0.001 — the sparse-grid gate fires at sf0.01+)
    got = sorted(map(tuple, seasonal_anomaly_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_seasonal_anomaly(spark, sf_dir).collect()))
    assert got == want


def test_stream_user_rfm_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_user_rfm (late r9): RFM state folded over 4 micro-batches
    + read-time quintiles equals the one-shot events_user_rfm row for
    row — including users whose purchases split across batches."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_user_rfm
    from vectordb_hr_data_spark.streaming.stream_ops import (
        rfm_from_state,
        stream_user_rfm,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "rfm_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"rfm_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "rfm_state")
    stream_user_rfm(stream, state)
    max_us = ev.agg(F.max(F.unix_micros("ts"))).first()[0]
    got = sorted(map(tuple, rfm_from_state(spark, state, max_us).collect()))
    want = sorted(map(tuple, events_user_rfm(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_srm_state_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_srm_state (late r9): the (type, user, arm)-keyed mergeable
    state over 4 micro-batches must reproduce events_srm_check exactly —
    a user split across batches counts once per type, so the live SRM
    readout equals the batch chi-square."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_srm_check
    from vectordb_hr_data_spark.streaming.stream_ops import (
        srm_from_state,
        stream_srm_state,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "srm_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"srm_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "srm_state")
    stream_srm_state(stream, state)
    got = sorted(map(tuple, srm_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_srm_check(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_stickiness_state_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_stickiness_state (late r9): the two-grain (day + month)
    reach state over 4 micro-batches must reproduce
    events_user_stickiness exactly — the month bucket is the union of
    its day buckets, so batch boundaries cannot shift either distinct."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_user_stickiness
    from vectordb_hr_data_spark.streaming.stream_ops import (
        stickiness_from_state,
        stream_stickiness_state,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "stick_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"stick_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "stick_state")
    stream_stickiness_state(stream, state)
    got = sorted(map(tuple, stickiness_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_user_stickiness(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_slo_burn_state_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_slo_burn_state (late r9): summed window counts over 4
    micro-batches must reproduce events_slo_burn_rate exactly — counts
    are associative, the burn ratio derives at read time."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_slo_burn_rate
    from vectordb_hr_data_spark.streaming.stream_ops import (
        slo_burn_from_state,
        stream_slo_burn_state,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "slo_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"slo_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "slo_state")
    stream_slo_burn_state(stream, state)
    got = sorted(map(tuple, slo_burn_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_slo_burn_rate(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_stl_counts_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_stl_counts (r10): summed hourly counts over 4 micro-batches
    must reproduce events_stl_decompose exactly — the count series is the
    only state; trend/seasonal/residual are read-time algebra through the
    SAME stl_report_from_counts the batch query runs."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_stl_decompose
    from vectordb_hr_data_spark.streaming.stream_ops import (
        stl_from_state,
        stream_stl_counts,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "stl_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"stl_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "stl_state")
    stream_stl_counts(stream, state)
    got = sorted(map(tuple, stl_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_stl_decompose(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_cohort_ltv_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_cohort_ltv (r10): the (user_id, week) keyed state must
    reproduce events_cohort_ltv exactly even though a LATE batch lowers
    some users' first-seen week — cohort assignment derives at read time,
    so re-bucketing is automatic. The 4-way split is by event_id, which
    scatters each user's events across batches (the adversarial case:
    most users' earliest event does NOT arrive first)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_cohort_ltv
    from vectordb_hr_data_spark.streaming.stream_ops import (
        cohort_ltv_from_state,
        stream_cohort_ltv,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "ltv_src"
    src.mkdir()
    # reversed file order: the batch holding event_id % 4 == 3 (latest ids,
    # but containing many users' EARLIEST timestamps) lands first
    for i, tag in enumerate([3, 2, 1, 0]):
        part = ev.filter((F.col("event_id") % 4) == tag)
        tdir = str(tmp_path / f"ltv_part{tag}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "ltv_state")
    stream_cohort_ltv(stream, state)
    got = sorted(map(tuple, cohort_ltv_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_cohort_ltv(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_source_fingerprint_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_source_fingerprint (r10): count/xor/mod-sum folded over 4
    micro-batches must equal source_corpus_fingerprint exactly — the
    order-independence claim, exercised across batch boundaries."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.pipeline_queries import source_corpus_fingerprint
    from vectordb_hr_data_spark.streaming.stream_ops import (
        source_fingerprint_from_state,
        stream_source_fingerprint,
    )

    d = read_table(spark, sf_dir, "documents")
    src = tmp_path / "fp_src"
    src.mkdir()
    for i in range(4):
        part = d.filter((F.col("doc_id") % 4) == i)
        tdir = str(tmp_path / f"fp_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(d.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "fp_state")
    stream_source_fingerprint(stream, state)
    got = sorted(map(tuple, source_fingerprint_from_state(spark, state).collect()))
    want = sorted(map(tuple, source_corpus_fingerprint(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_kmv_sketch_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_kmv_sketch (r10): the K-smallest-hash state folded over 4
    micro-batches (with heavy cross-batch token duplication) must produce
    the SAME estimates as the batch kmv_distinct_sketch — K smallest of a
    union is associative and the merge's re-distinct absorbs cross-batch
    duplicates."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.dedup_queries import kmv_distinct_sketch
    from vectordb_hr_data_spark.streaming.stream_ops import (
        kmv_from_state,
        stream_kmv_sketch,
    )

    d = read_table(spark, sf_dir, "documents")
    src = tmp_path / "kmv_src"
    src.mkdir()
    for i in range(4):
        part = d.filter((F.col("doc_id") % 4) == i)
        tdir = str(tmp_path / f"kmv_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(d.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "kmv_state")
    stream_kmv_sketch(stream, state)
    got = {r.source: r.n_distinct_est for r in kmv_from_state(spark, state).collect()}
    want = {
        r.source: r.n_distinct_est for r in kmv_distinct_sketch(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_stream_user_type_entropy_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_user_type_counts (r10): summed (user, type) counts over 4
    micro-batches must reproduce events_user_type_entropy exactly — the
    entropy is read-time algebra over associative state."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_user_type_entropy
    from vectordb_hr_data_spark.streaming.stream_ops import (
        stream_user_type_counts,
        type_entropy_from_state,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "ent_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"ent_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "ent_state")
    stream_user_type_counts(stream, state)
    got = sorted(map(tuple, type_entropy_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_user_type_entropy(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_value_leaderboard_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_value_leaderboard (r10): top-k-of-union state folded over 4
    micro-batches must equal events_value_leaderboard exactly."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_value_leaderboard
    from vectordb_hr_data_spark.streaming.stream_ops import (
        leaderboard_from_state,
        stream_value_leaderboard,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "lb_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"lb_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "lb_state")
    stream_value_leaderboard(stream, state)
    got = sorted(map(tuple, leaderboard_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_value_leaderboard(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def _time_ordered_stream_dir(spark, sf_dir, tmp_path, tag):
    """Split events into 4 files by EVENT-TIME quartile so file-per-batch
    delivery is event-time ordered — the watermark contract the
    conversion-lag state op documents."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    qs = ev.approxQuantile("event_id", [0.25, 0.5, 0.75], 0.0)
    # quartiles by ts: rank via ntile over ts is overkill; order by ts and
    # slice with percent_rank-free boundaries from sorted timestamps
    bounds = [r.ts for r in ev.orderBy("ts").select("ts").collect()]
    n = len(bounds)
    cuts = [bounds[n // 4], bounds[n // 2], bounds[3 * n // 4]]
    parts = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter((F.col("ts") >= cuts[1]) & (F.col("ts") < cuts[2])),
        ev.filter(F.col("ts") >= cuts[2]),
    ]
    src = tmp_path / f"{tag}_src"
    src.mkdir()
    for i, part in enumerate(parts):
        tdir = str(tmp_path / f"{tag}_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return str(src), ev.schema


def test_stream_conversion_lag_converges_under_time_order(spark, sf_dir, tmp_path):
    """stream_conversion_lag_state (B136 twin): under event-time-ordered
    delivery (the documented watermark contract) the final per-user state
    bucketed through conversion_lag_report_from_state must equal
    events_conversion_lag exactly."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from vectordb_hr_data_spark.querydefs.event_queries import events_conversion_lag
    from vectordb_hr_data_spark.streaming.stream_ops import (
        conversion_lag_report_from_state,
        run_to_completion,
        stream_conversion_lag_state,
    )

    src, schema = _time_ordered_stream_dir(spark, sf_dir, tmp_path, "clag")
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    emitted = run_to_completion(
        stream_conversion_lag_state(stream), "clag_state", output_mode="update"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("batch_ord").desc())
    final = (
        emitted.withColumn("batch_ord", F.monotonically_increasing_id())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "s_us", "lag_us")
    )
    got = sorted(map(tuple, conversion_lag_report_from_state(final).collect()))
    want = sorted(map(tuple, events_conversion_lag(spark, sf_dir).collect()))
    assert got == want and len(got) == 6


def test_stream_conversion_lag_violation_diverges(spark, tmp_path):
    """The contract's other half, demonstrated: deliver a user's PURCHASE
    batch before the SIGNUP batch (event-time order violated beyond any
    watermark) and the two-number state misses the conversion the batch
    query finds — the documented reason this op is watermark-gated and
    the unbounded-correction path stays batch."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.streaming.stream_ops import (
        run_to_completion,
        stream_conversion_lag_state,
    )

    rows_late_signup = [(1, "2024-01-01 10:00:00", 7, "signup", None, "{}")]
    rows_purchase = [(2, "2024-01-01 12:00:00", 7, "purchase", 5.0, "{}")]
    schema = (
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    )
    src = tmp_path / "viol_src"
    src.mkdir()
    for i, rows in enumerate([rows_purchase, rows_late_signup]):  # purchase FIRST
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        tdir = str(tmp_path / f"viol_part{i}")
        df.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    ev_schema = spark.createDataFrame([], schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).schema
    stream = (
        spark.readStream.schema(ev_schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    emitted = run_to_completion(
        stream_conversion_lag_state(stream), "clag_viol", output_mode="update"
    ).collect()
    last = sorted(emitted, key=lambda r: (r.s_us, r.lag_us))[-1]
    # the signup lands (s_us set) but the earlier-delivered purchase is
    # lost: lag stays -1 even though batch semantics would find 2h
    assert last.s_us >= 0 and last.lag_us == -1


def test_stream_chunk_dedup_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_chunk_dedup_state (r10): chunk-hash counts folded over 4
    micro-batches must reproduce chunk_dedup_rate exactly — the chunker
    is deterministic and the count state is a plain associative sum."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.pipeline_queries import chunk_dedup_rate
    from vectordb_hr_data_spark.streaming.stream_ops import (
        chunk_dedup_from_state,
        stream_chunk_dedup_state,
    )

    d = read_table(spark, sf_dir, "documents")
    src = tmp_path / "cdd_src"
    src.mkdir()
    for i in range(4):
        part = d.filter((F.col("doc_id") % 4) == i)
        tdir = str(tmp_path / f"cdd_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(d.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "cdd_state")
    stream_chunk_dedup_state(stream, state)
    got = sorted(map(tuple, chunk_dedup_from_state(spark, state).collect()))
    want = sorted(map(tuple, chunk_dedup_rate(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_hnsw_append_converges_to_batch_build(spark, sf_dir, tmp_path):
    """stream_hnsw_append (B228): vectors folded over 4 micro-batches
    must converge the per-(node, layer) neighbor-list state to EXACTLY
    the batch-built graph — top-M of a union is associative (the KMV
    argument), and every unordered pair is generated once its later
    endpoint arrives."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.querydefs.vector_queries import hnsw_graph_build
    from vectordb_hr_data_spark.streaming.stream_ops import (
        hnsw_edges_from_state,
        stream_hnsw_append,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    src = tmp_path / "hnsw_src"
    src.mkdir()
    for i in range(4):
        part = emb.filter((F.col("vec_id") % 4) == i)
        tdir = str(tmp_path / f"hnsw_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "hnsw_state")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    stream_hnsw_append(stream, state, cents)

    got = sorted(map(tuple, hnsw_edges_from_state(spark, state).collect()))
    want = sorted(map(tuple, hnsw_graph_build(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_hnsw_retune_fires_once_and_rebuild_passes_recall_gate(
    spark, sf_dir, tmp_path
):
    """stream_hnsw_append's geometry-freshness trigger (VERDICT r11 item
    5, the stream_ivf_sq8_append occupancy contract on the graph sink):
    growing the streamed corpus past k * rows_per_cell * tolerance fires
    ``on_retune`` exactly ONCE with the grown row count, and the rebuild
    the callback schedules — a batch build over the streamed vector
    state — passes the B227 recall gate (mean recall@10 vs exact brute
    force >= 0.8, the hnsw_recall_eval floor)."""
    import glob
    import os
    import shutil

    import numpy as np
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.operators.hnsw import (
        build_hnsw_graph,
        hnsw_greedy_search,
    )
    from vectordb_hr_data_spark.streaming.stream_ops import stream_hnsw_append

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_total = emb.count()
    src = tmp_path / "hnsw_rt_src"
    src.mkdir()
    for i in range(4):
        part = emb.filter((F.col("vec_id") % 4) == i)
        tdir = str(tmp_path / f"hnsw_rt_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "hnsw_rt_state")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    fired: list[int] = []
    # budget 16 cells x 10 rows x 2.0 tolerance = 320 < n_total: the
    # trigger must fire on the batch that crosses it, then never again
    stream_hnsw_append(stream, state, cents, on_retune=fired.append, rows_per_cell=10)
    assert len(fired) == 1, fired
    assert 16 * 10 * 2.0 < fired[0] <= n_total, fired

    # the scheduled rebuild: batch-build over the streamed vector state
    vstate = spark.read.parquet(f"{state}/vectors").localCheckpoint(eager=True)
    assert vstate.count() == n_total
    g = build_hnsw_graph(vstate).localCheckpoint(eager=True)
    k = 10
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    res = hnsw_greedy_search(g, vstate, qs, cents, k=k)
    got = {}
    for r in res.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)

    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}
    hits = 0
    for qid in range(8):
        q = vecs[qid]
        scored = sorted(
            (round(float(((v - q) ** 2).sum()), 4), vid)
            for vid, v in vecs.items()
            if vid != qid
        )
        exact = {vid for _, vid in scored[:k]}
        hits += len(exact & got[qid])
    assert hits / (8 * k) >= 0.8, hits


def test_stream_delta_join_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_delta_join (B236 twin): a CDC-tagged union stream of orders
    and lineitem arrivals folded over 4 micro-batches must reproduce the
    one-shot join report EXACTLY — every joined pair lands once, at the
    batch where its later side arrives. Batches deliberately interleave
    the two sides on DIFFERENT split attributes so cross-batch delta
    terms are all non-empty."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.relational_queries import (
        orders_join_delta_maintenance,
    )
    from vectordb_hr_data_spark.streaming.stream_ops import (
        delta_join_report_from_view,
        stream_delta_join,
    )

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_returnflag"
    )
    o_cdc = o.select(
        F.lit("O").alias("side"),
        "o_orderkey",
        "o_orderpriority",
        F.lit(None).cast("long").alias("l_orderkey"),
        F.lit(None).cast("int").alias("l_linenumber"),
        F.lit(None).cast("double").alias("l_extendedprice"),
        F.lit(None).cast("double").alias("l_discount"),
        F.lit(None).cast("string").alias("l_returnflag"),
        (F.col("o_orderkey") % 4).cast("int").alias("bk"),
    )
    l_cdc = li.select(
        F.lit("L").alias("side"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        (F.col("l_linenumber") % 4).cast("int").alias("bk"),
    )
    cdc = o_cdc.unionByName(l_cdc)
    src = tmp_path / "dj_src"
    src.mkdir()
    for i in range(4):
        part = cdc.filter(F.col("bk") == i).drop("bk")
        tdir = str(tmp_path / f"dj_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    schema = cdc.drop("bk").schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    o_acc = str(tmp_path / "dj_o_acc")
    l_acc = str(tmp_path / "dj_l_acc")
    view = str(tmp_path / "dj_view")
    stream_delta_join(stream, o_acc, l_acc, view)
    got = sorted(map(tuple, delta_join_report_from_view(spark, view).collect()))
    want = sorted(map(tuple, orders_join_delta_maintenance(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_delta_join_rejects_unknown_side(spark, sf_dir, tmp_path):
    """The inserts-only CDC contract is enforced loudly: a row tagged with
    an unknown side ('U' — e.g. an update event) must raise, not be
    silently dropped or treated as an insert."""
    import glob
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import stream_delta_join

    o = read_table(spark, sf_dir, "orders").limit(10)
    bad = o.select(
        F.lit("U").alias("side"),
        "o_orderkey",
        "o_orderpriority",
        F.lit(None).cast("long").alias("l_orderkey"),
        F.lit(None).cast("int").alias("l_linenumber"),
        F.lit(None).cast("double").alias("l_extendedprice"),
        F.lit(None).cast("double").alias("l_discount"),
        F.lit(None).cast("string").alias("l_returnflag"),
    )
    src = tmp_path / "djx_src"
    src.mkdir()
    tdir = str(tmp_path / "djx_part")
    bad.coalesce(1).write.parquet(tdir)
    shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], str(src / "f0.parquet"))
    stream = spark.readStream.schema(bad.schema).parquet(str(src))
    with pytest.raises(Exception, match="inserts-only CDC contract"):
        stream_delta_join(
            stream,
            str(tmp_path / "djx_o"),
            str(tmp_path / "djx_l"),
            str(tmp_path / "djx_v"),
        )


def test_stream_value_hist_converges_to_batch_and_bounds_error(spark, sf_dir, tmp_path):
    """stream_value_hist (B239 twin): per-(type, day, bin) counts folded
    over 4 micro-batches must reproduce events_value_bands_hist EXACTLY
    (bin counts are associative sums), and the histogram bands must sit
    within one bin width of the exact B137 percentiles for every
    (type, day) — the sketch's error bound BY CONSTRUCTION."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import (
        VALUE_HIST_BIN_CENTS,
        events_daily_value_bands,
        events_value_bands_hist,
    )
    from vectordb_hr_data_spark.streaming.stream_ops import (
        stream_value_hist,
        value_bands_from_hist_state,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "vh_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"vh_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "vh_state")
    stream_value_hist(stream, state)
    got = sorted(map(tuple, value_bands_from_hist_state(spark, state).collect()))
    want = sorted(map(tuple, events_value_bands_hist(spark, sf_dir).collect()))
    assert got == want and len(got) > 0

    exact = {
        (r["event_type"], r["day_epoch_days"]): (r["p50_cents"], r["p95_cents"])
        for r in events_daily_value_bands(spark, sf_dir).collect()
    }
    for event_type, day, _n, p50_bin, p95_bin in got:
        e50, e95 = exact[(event_type, day)]
        assert abs(p50_bin - e50) <= VALUE_HIST_BIN_CENTS
        assert abs(p95_bin - e95) <= VALUE_HIST_BIN_CENTS


def test_stream_late_audit_counts_exactly_what_a_watermark_drops(spark, sf_dir, tmp_path):
    """stream_late_audit (B243): three hand-built micro-batches with known
    late rows — batch 2 carries two events older than (batch-1 max −
    watermark), batch 3 carries one. The ledger must report exactly
    those counts (Spark's previous-batch-max watermark rule), a zero
    late count for the first batch (no prior high-water mark), and the
    corpus loss share in ppm."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.streaming.stream_ops import (
        late_audit_from_state,
        stream_late_audit,
    )

    base = 1_700_000_000  # seconds
    wm_s = 3600
    batches = [
        # batch 0: ts at base+0h..+2h  -> max = base + 7200
        [base, base + 3600, base + 7200],
        # batch 1: wm = base+7200-3600 = base+3600; two rows BELOW it
        [base + 100, base + 3599, base + 9000, base + 10800],
        # batch 2: wm = base+10800-3600 = base+7200; one row below
        [base + 7100, base + 7200, base + 14400],
    ]
    src = tmp_path / "la_src"
    src.mkdir()
    for i, tss in enumerate(batches):
        df = spark.createDataFrame(
            [(j, t) for j, t in enumerate(tss)], "event_id long, ts_s long"
        ).select("event_id", F.timestamp_seconds(F.col("ts_s")).alias("ts"))
        tdir = str(tmp_path / f"la_part{i}")
        df.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    schema = "event_id long, ts timestamp"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "la_state")
    stream_late_audit(stream, state, watermark_s=wm_s)
    rows = {r["epoch_id"]: r for r in late_audit_from_state(spark, state).collect()}
    assert len(rows) == 3
    assert rows[0]["n_late"] == 0 and rows[0]["wm_us"] is None
    assert rows[1]["n_late"] == 2
    assert rows[1]["wm_us"] == (base + 7200 - wm_s) * 1_000_000
    assert rows[2]["n_late"] == 1
    assert rows[2]["wm_us"] == (base + 10800 - wm_s) * 1_000_000
    # 3 late of 10 total -> 300000 ppm
    assert rows[0]["corpus_late_ppm"] == 300_000


def test_stream_cdc_retraction_agg_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_cdc_retraction_agg (B245 twin): the three-step I/U/D CDC log
    replayed as micro-batches must converge to EXACTLY the batch fold —
    and, by the oracle identity, to the final-snapshot recompute. A second
    scenario re-splits the SAME log into different batch boundaries
    (deletes arriving in the same batch as unrelated inserts) to prove the
    signed fold is boundary-invariant."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.relational_queries import (
        orders_cdc_retraction_maintenance,
    )
    from vectordb_hr_data_spark.streaming.stream_ops import stream_cdc_retraction_agg

    base = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    upd_cond = (F.col("k") % 5 == 0) & (F.col("k") % 3 != 2)
    new_cents = F.expr("cents * 110 div 100")
    log = (
        base.filter(F.col("k") % 3 != 2)
        .select(
            F.lit(1).alias("step"), F.lit("I").alias("op"), "status",
            F.lit(None).cast("long").alias("before_cents"),
            F.col("cents").alias("after_cents"),
        )
        .unionByName(
            base.filter(F.col("k") % 3 == 2).select(
                F.lit(2).alias("step"), F.lit("I").alias("op"), "status",
                F.lit(None).cast("long").alias("before_cents"),
                F.col("cents").alias("after_cents"),
            )
        )
        .unionByName(
            base.filter(upd_cond).select(
                F.lit(2).alias("step"), F.lit("U").alias("op"), "status",
                F.col("cents").alias("before_cents"),
                new_cents.cast("long").alias("after_cents"),
            )
        )
        .unionByName(
            base.filter(F.col("prio") == "1-URGENT").select(
                F.lit(3).alias("step"), F.lit("D").alias("op"), "status",
                F.when(upd_cond, new_cents).otherwise(F.col("cents"))
                .cast("long")
                .alias("before_cents"),
                F.lit(None).cast("long").alias("after_cents"),
            )
        )
    )
    want = sorted(
        map(tuple, orders_cdc_retraction_maintenance(spark, sf_dir).collect())
    )

    def run(split_col, n_batches, tag):
        src = tmp_path / f"cdc_src_{tag}"
        src.mkdir()
        for i in range(n_batches):
            part = log.filter(split_col % n_batches == i).drop("step")
            tdir = str(tmp_path / f"cdc_part_{tag}{i}")
            part.coalesce(1).write.parquet(tdir)
            pf = glob.glob(f"{tdir}/part-*.parquet")[0]
            dst = str(src / f"f{i}.parquet")
            shutil.move(pf, dst)
            os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        schema = log.drop("step").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        state = str(tmp_path / f"cdc_state_{tag}")
        stream_cdc_retraction_agg(stream, state)
        return sorted(
            map(tuple, spark.read.parquet(state).orderBy("o_orderstatus").collect())
        )

    # scenario 1: batches = the CDC steps (in order)
    got_steps = run(F.col("step"), 3, "steps")
    assert got_steps == want and len(got_steps) > 0
    # scenario 2: the same log re-split on a hash of the status string —
    # deletes/updates land in arbitrary batches relative to their inserts;
    # the converged state must not move
    got_hash = run(F.abs(F.xxhash64("status", "op", "before_cents", "after_cents")), 4, "hash")
    assert got_hash == want


def test_stream_cdc_retraction_agg_rejects_malformed(spark, tmp_path):
    """An op outside I/U/D, or an update missing an image, must raise with
    the named error — a silently-dropped retraction corrupts the rollup
    forever."""
    import pytest as _pytest

    from vectordb_hr_data_spark.streaming.stream_ops import stream_cdc_retraction_agg

    bad = spark.createDataFrame(
        [("X", "O", None, 100)],
        "op string, status string, before_cents long, after_cents long",
    )
    src = tmp_path / "cdc_bad_src"
    src.mkdir()
    import glob
    import shutil

    tdir = str(tmp_path / "cdc_bad_part")
    bad.coalesce(1).write.parquet(tdir)
    shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], str(src / "f0.parquet"))
    stream = (
        spark.readStream.schema(bad.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    with _pytest.raises(Exception, match="malformed CDC"):
        stream_cdc_retraction_agg(stream, str(tmp_path / "cdc_bad_state"))


def test_stream_distinct_multiplicity_converges_and_naive_fold_fails(spark, sf_dir, tmp_path):
    """stream_distinct_multiplicity (B256 twin): the I/D CDC log replayed
    as micro-batches converges to the batch answer under two different
    batch splits — and the NAIVE per-batch distinct fold provably gives a
    different (wrong) answer on the same log, which is why the
    multiplicity state exists."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import (
        events_distinct_cdc_maintenance,
    )
    from vectordb_hr_data_spark.streaming.stream_ops import (
        distinct_report_from_state,
        stream_distinct_multiplicity,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    log = (
        ev.filter(F.col("event_id") % 3 != 2)
        .select(F.lit(1).alias("step"), F.lit("I").alias("op"), "user_id", "event_type")
        .unionByName(
            ev.filter(F.col("event_id") % 3 == 2).select(
                F.lit(2).alias("step"), F.lit("I").alias("op"), "user_id", "event_type"
            )
        )
        .unionByName(
            ev.filter(F.col("event_id") % 7 == 0).select(
                F.lit(3).alias("step"), F.lit("D").alias("op"), "user_id", "event_type"
            )
        )
    )
    want = sorted(map(tuple, events_distinct_cdc_maintenance(spark, sf_dir).collect()))

    def run(split_col, n_batches, tag):
        src = tmp_path / f"dm_src_{tag}"
        src.mkdir()
        for i in range(n_batches):
            part = log.filter(split_col % n_batches == i).drop("step")
            tdir = str(tmp_path / f"dm_part_{tag}{i}")
            part.coalesce(1).write.parquet(tdir)
            pf = glob.glob(f"{tdir}/part-*.parquet")[0]
            dst = str(src / f"f{i}.parquet")
            shutil.move(pf, dst)
            os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        schema = log.drop("step").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        state = str(tmp_path / f"dm_state_{tag}")
        stream_distinct_multiplicity(stream, state)
        return sorted(map(tuple, distinct_report_from_state(spark, state).collect()))

    got_steps = run(F.col("step"), 3, "steps")
    assert got_steps == want and len(got_steps) > 0
    got_hash = run(F.abs(F.xxhash64("op", "user_id", "event_type")), 4, "hash")
    assert got_hash == want

    # the negative contract: folding per-step DISTINCT deltas as a signed
    # sum (+distinct on I-batches, -distinct on D-batches) is WRONG on this
    # log — a deleted event's user usually survives through other events
    naive = None
    for step, sign in ((1, 1), (2, 1), (3, -1)):
        d = (
            log.filter(F.col("step") == step)
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("nd"))
            .collect()
        )
        cur = {r.event_type: sign * r.nd for r in d}
        naive = cur if naive is None else {
            k: naive.get(k, 0) + cur.get(k, 0) for k in set(naive) | set(cur)
        }
    want_map = {t: nd for t, _, nd in want}
    assert naive != want_map, "naive signed distinct fold should be wrong on this log"


def test_stream_compaction_ledger_plan_equals_batch(spark, sf_dir, tmp_path):
    """stream_compaction_ledger (B249 twin): the ledger folded over 4
    micro-batches must yield EXACTLY the batch compaction plan."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_compaction_plan
    from vectordb_hr_data_spark.streaming.stream_ops import (
        compaction_plan_from_state,
        stream_compaction_ledger,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
    src = tmp_path / "cl_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter(F.col("event_id") % 4 == i).drop("event_id")
        tdir = str(tmp_path / f"cl_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = (
        spark.readStream.schema(ev.drop("event_id").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = str(tmp_path / "cl_state")
    stream_compaction_ledger(stream, state)
    got = sorted(map(tuple, compaction_plan_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_compaction_plan(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_stream_sessionize_spans_batches_and_matches_batch(spark, sf_dir, tmp_path):
    """stream_sessionize: events replayed in 4 time-ordered micro-batches
    (sessions straddle the cuts) must reproduce the B7 batch sessionizer
    row-for-row after read-back renumbering; an out-of-order replay
    raises the named error."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_sessionize
    from vectordb_hr_data_spark.streaming.stream_ops import (
        sessionize_from_state,
        stream_sessionize,
    )

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    # global time-quartile cuts preserve per-user order and guarantee
    # sessions straddle batch boundaries
    qs = ev.approxQuantile("event_id", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf")] + qs + [float("inf")]
    ordered = ev.orderBy("ts", "event_id").withColumn(
        "rank_ts", F.col("ts").cast("double")
    )
    tq = ordered.approxQuantile("rank_ts", [0.25, 0.5, 0.75], 0.0)
    tb = [float("-inf")] + tq + [float("inf")]
    src = tmp_path / "ss_src"
    src.mkdir()
    for i in range(4):
        part = ordered.filter(
            (F.col("rank_ts") > tb[i]) & (F.col("rank_ts") <= tb[i + 1])
        ).drop("rank_ts")
        tdir = str(tmp_path / f"ss_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    state = str(tmp_path / "ss_state")
    stream_sessionize(stream, state)
    got = sorted(map(tuple, sessionize_from_state(spark, state).collect()))
    want = sorted(map(tuple, events_sessionize(spark, sf_dir).collect()))
    assert len(got) == len(want)
    assert got == want

    # out-of-order replay (batches reversed) must raise the named error
    src2 = tmp_path / "ss_src_rev"
    src2.mkdir()
    for i in range(4):
        shutil.copy(str(src / f"f{3 - i}.parquet"), str(src2 / f"f{i}.parquet"))
        os.utime(str(src2 / f"f{i}.parquet"), (1_700_009_000 + i * 60, 1_700_009_000 + i * 60))
    stream2 = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src2))
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="out-of-order|open session"):
        stream_sessionize(stream2, str(tmp_path / "ss_state_rev"))
