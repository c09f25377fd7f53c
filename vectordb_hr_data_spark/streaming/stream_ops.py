"""Structured Streaming variants of the events operators (SURVEY.md B7).

The reference is strictly batch (SURVEY.md §2 checklist: no streaming), so
these are north-star extensions: the SAME aggregation builders as the batch
queries (querydefs/event_queries.py), driven by ``readStream`` with event-
time watermarks for late data. Parquet-directory sources stand in for
Kafka locally; the transformations are source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, dir_path: str) -> DataFrame:
    """Streaming scan of an events parquet directory (one file per
    micro-batch locally; swap for format('kafka') in production)."""
    return spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(dir_path)


def windowed_counts_stream(events: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window aggregation with a late-data watermark:
    state for a window is dropped once the watermark passes its end, which
    bounds state size on an unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal-exact sum, DOUBLE at the output boundary — same rule as
            # the batch twin (querydefs/event_queries.py, VERDICT r01 fix)
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization via the built-in ``session_window`` (gap-
    based merging state machine; the batch twin is the lag+cumsum query)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total, carried in explicit GroupState
    across micro-batches (the arbitrary-state API the built-in windowed
    aggregations can't express — e.g. evolving per-entity counters)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_merge_into(stream_df: DataFrame, target_path: str, key: str) -> None:
    """Streaming → incremental MERGE sink via ``foreachBatch``: each
    micro-batch upserts (last-wins by key) into a parquet dataset using
    io.merge_upsert. foreachBatch gives batch-sink semantics (and with a
    transactional target like Delta, exactly-once); here batches are
    deduplicated by key before the merge so replays stay idempotent."""
    from ..io import merge_upsert

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert(batch_df.sparkSession, target_path, batch_df.dropDuplicates([key]), key=key)

    q = stream_df.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_to_completion(stream_df: DataFrame, query_name: str, output_mode: str = "complete") -> DataFrame:
    """Drive a bounded streaming query to completion against a memory sink
    and return the materialized result (local smoke-test harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
