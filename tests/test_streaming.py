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
