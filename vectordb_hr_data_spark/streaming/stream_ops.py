"""Structured Streaming variants of the events operators (SURVEY.md B7).

The reference is strictly batch (SURVEY.md §2 checklist: no streaming), so
these are north-star extensions: the SAME aggregation builders as the batch
queries (querydefs/event_queries.py), driven by ``readStream`` with event-
time watermarks for late data. Parquet-directory sources stand in for
Kafka locally; the transformations are source-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _read_state_or_none(spark: SparkSession, path: str, what: str) -> DataFrame | None:
    """First-batch bootstrap read of an accumulated-state parquet dir.

    Distinguishes "no prior state yet" (the path does not exist → None,
    the caller bootstraps) from a CORRUPTED state directory (exists but
    unreadable → raises a NAMED error). The old ``except Exception:
    pass`` form treated both the same, so a corrupted accumulator
    silently degraded a delta-join view to batch-only joins — exactly
    the divergence the loud CDC contracts exist to prevent (VERDICT r12
    item 4)."""
    if not os.path.isdir(path):
        return None
    # a dir holding only _SUCCESS/_committed markers (an empty append's
    # residue) is "no state yet", not corruption — only DATA files that
    # fail to read should raise
    if not any(not f.startswith(("_", ".")) for f in os.listdir(path)):
        return None
    try:
        return spark.read.parquet(path)
    except Exception as e:
        raise RuntimeError(
            f"{what}: accumulated state at {path} exists but is unreadable — "
            "refusing to silently degrade; repair or remove the state dir"
        ) from e

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


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka → events-shaped stream: JSON event payloads in ``value`` are
    parsed into EVENTS_SCHEMA, so every builder in this module (windowed
    counts, sessionization, stateful totals, watermark dedup, MERGE sink)
    runs unchanged on a real broker. Requires the spark-sql-kafka package
    on the classpath (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``);
    without it Spark raises its standard missing-data-source error at
    ``load()`` — surfaced here as a RuntimeError naming the package, so the
    local image (no Kafka jars) fails loudly, not at first micro-batch."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # AnalysisException: Failed to find data source: kafka
        raise RuntimeError(
            "Kafka source unavailable: add org.apache.spark:spark-sql-kafka-0-10 "
            "to the session's --packages/classpath"
        ) from e
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_SCHEMA).alias("e")
    )
    return parsed.select("e.*")


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


def dedup_stream(
    events: DataFrame, key_cols: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup — B1's dedup-on-ingest twin: keep the first
    occurrence of each key, with dedup state BOUNDED by the event-time
    watermark (``dropDuplicatesWithinWatermark``): a duplicate arriving
    within the watermark window is dropped, state for keys older than the
    watermark is evicted. That bound is what makes dedup-on-ingest viable
    on an unbounded 100 TB/day stream — plain ``dropDuplicates`` on a
    stream keeps ALL keys forever. Exactly-once ingest dedup composes with
    the content-hash batch dedup (``dedup_exact``) downstream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols or ["event_id"]
    )


def stream_ivf_sq8_append(
    vec_stream: DataFrame,
    path: str,
    centroid_rows: list,
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    base_rows: int = 0,
    on_retune=None,
    rows_per_cell: int | None = None,
):
    """Streaming maintenance of the persisted IVF+SQ8 index: every
    micro-batch of new vectors is centroid-assigned (map-side expression
    argmin) + SQ8-encoded (one Arrow pass) and APPENDED into the
    cid-partitioned parquet index via ``foreachBatch`` — each batch only
    touches the cid directories its vectors land in, the index stays
    queryable throughout, and because assignment/encode are deterministic
    given the trained state (centroids + ranges, both frozen at
    train time like any faiss index), the incrementally-grown index is
    row-identical to a from-scratch batch build over the same data
    (pytest-pinned). This is how a 100 TB index absorbs a firehose without
    rebuilds; compaction/exactly-once bookkeeping is what Delta's MERGE
    adds when its jars land (io.py:95 note).

    Index-geometry freshness (VERDICT r5 #4): the append keeps K frozen,
    so the sink ALSO tracks the grown row count (``base_rows`` + appended,
    a closure counter — no index re-count per batch) and checks
    ``ivf.needs_retune`` after every append; when the corpus outgrows the
    built rows-per-cell budget it calls ``on_retune(n_rows_now)`` ONCE
    (default: a loud warning). The callback is where production schedules
    the re-suggest + rebuild — retuning in-line inside a micro-batch would
    stall the stream for a full corpus pass.

    Returns the StreamingQuery; callers own its lifecycle."""
    import warnings

    from ..operators.ivf import ivf_assign, needs_retune
    from ..operators.quantize import sq8_encode_arrow

    built_params = {"k": len(centroid_rows)}
    if rows_per_cell is not None:
        built_params["rows_per_cell"] = rows_per_cell
    state = {"n_rows": int(base_rows), "retune_fired": False}
    if on_retune is None:

        def on_retune(n_now: int) -> None:
            warnings.warn(
                f"IVF index at {path} has outgrown its geometry "
                f"(k={built_params['k']}, rows now {n_now}): re-run "
                f"suggest_ivf_params and rebuild",
                stacklevel=2,
            )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cents = batch_df.sparkSession.createDataFrame(
            centroid_rows, "cid int, cvec array<double>"
        )
        assigned = ivf_assign(batch_df, cents, id_col=id_col, vec_col=vec_col)
        enc = assigned.select(
            id_col, vec_col, sq8_encode_arrow(vec_col, lo, hi).alias("codes"), "cid"
        ).localCheckpoint(eager=True)  # one compute: the write below reuses it
        enc.write.partitionBy("cid").mode("append").parquet(path)
        state["n_rows"] += enc.count()
        if not state["retune_fired"] and needs_retune(state["n_rows"], built_params):
            state["retune_fired"] = True
            # the geometry every memoized tuning curve was measured on is
            # now stale — flush BEFORE the callback so a rebuild scheduled
            # inside it re-advises on fresh curves (VERDICT r12 item 3)
            from ..operators.memo import invalidate_all

            invalidate_all()
            on_retune(state["n_rows"])

    return vec_stream.writeStream.foreachBatch(sink).start()


def running_topk_stream(events: DataFrame, key_col: str = "event_type", order_col: str = "value", k: int = 3) -> DataFrame:
    """Streaming per-key top-k with state CAPPED AT k rows per key —
    ``applyInPandasWithState`` carrying an explicit (values, ids) heap:
    each micro-batch merges its rows into the k-row state and re-emits the
    key's current top-k. This is the bounded-state form the windowed
    collect_list aggregation can't give you (its buffer grows with the
    window's row count): state size is O(|keys|·k) FOREVER, independent of
    stream volume — the property that makes a perpetual leaderboard viable
    on an unbounded 100 TB/day stream. Ties break on (value DESC, event_id
    ASC), deterministically across any batch arrival order
    (pytest-pinned against a batch recompute).

    Contract notes (ADVICE r4): NaN values are DROPPED at the door
    (``v == v``) — under Spark's NaN-greatest sort order a raw window
    ``row_number() OVER (ORDER BY value DESC)`` recompute would instead
    rank NaNs first, so any batch twin used for parity must apply the same
    ``NOT isnan(value)`` pre-filter (the pytest does). And the tie-break
    direction intentionally differs from ``windowed_topk_stream``: there
    the descending STRUCT sort implies (value DESC, event_id DESC) — a
    pure-JVM expression artifact; here the perpetual leaderboard prefers
    the EARLIEST event on ties (event_id ASC), the more natural
    first-to-reach-the-score semantics. Both are deterministic; they are
    different operators, not twins of each other."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField(order_col, T.DoubleType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("vals", T.ArrayType(T.DoubleType())),
            T.StructField("ids", T.ArrayType(T.LongType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        vals, ids = ([], []) if not state.exists else [list(x) for x in state.get]
        pairs = list(zip(vals, ids))
        for pdf in pdfs:
            pairs.extend(
                (float(v), int(i))
                for v, i in zip(pdf[order_col], pdf["event_id"])
                if v == v  # drop NaN values
            )
        pairs.sort(key=lambda p: (-p[0], p[1]))
        pairs = pairs[:k]
        state.update(([p[0] for p in pairs], [p[1] for p in pairs]))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(pairs),
                "rank": list(range(1, len(pairs) + 1)),
                order_col: [p[0] for p in pairs],
                "event_id": [p[1] for p in pairs],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def _minhash_band_keys(text_col: str):
    """(band_id, band_key) pairs for a text column — the same 16-hash /
    4-band expressions as the batch MinHash-LSH dedup, packaged for
    stream-side reuse."""
    from ..functions import texthash as H

    toks = F.expr(H.spark_tokens(text_col))
    sh = F.expr(H.spark_shingles("__toks"))
    hashes = F.expr(H.spark_hash_array("__sh"))
    sigs = [F.expr(e) for e in H.spark_minhash_sig("__hh")]
    bands = [
        F.concat_ws(
            ":", *[s.cast("string") for s in sigs[b * H.ROWS_PER_BAND : (b + 1) * H.ROWS_PER_BAND]]
        )
        for b in range(H.N_BANDS)
    ]
    return toks, sh, hashes, bands


def build_band_key_bloom(corpus: DataFrame, text_col: str = "text") -> tuple[list[int], int]:
    """Train step for ``neardup_gate_stream``: distinct corpus
    (band_id-prefixed) MinHash band keys → xxhash64 → packed Bloom bitset
    (~16 bits/key). Collected driver-side here (band keys are 4 short
    strings/doc — tiny next to the corpus); at 100 TB the same bits fall
    out of ``df.stat.bloomFilter`` without a driver key list. The second
    probe pre-reduces the full-range xxhash64 key below 2^31 exactly like
    the Column-side probe (ANSI long multiplication would overflow
    otherwise), so build and probe agree on every bit."""
    from ..querydefs.pipeline_queries import _BLOOM_MULT, _BLOOM_P

    ctoks, csh, chashes, cbands = _minhash_band_keys(text_col)
    tagged = [F.concat_ws("|", F.lit(str(b)), cbands[b]) for b in range(len(cbands))]
    keys = [
        r.k
        for r in corpus.withColumn("__toks", ctoks)
        .withColumn("__sh", csh)
        .withColumn("__hh", chashes)
        .select(F.explode(F.array(*[F.xxhash64(t) for t in tagged])).alias("k"))
        .distinct()
        .collect()
    ]
    n_bits = 64
    while n_bits < 16 * max(len(keys), 1):
        n_bits *= 2
    words = [0] * (n_bits // 64)
    for k in keys:
        for b in (k % n_bits, ((k % _BLOOM_P) * _BLOOM_MULT + 104729) % n_bits):
            words[b // 64] |= 1 << (b % 64)
    bits = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return bits, n_bits


def neardup_gate_stream(
    docs: DataFrame,
    bloom_bits: list[int],
    n_bits: int,
    text_col: str = "text",
    flag_col: str = "near_dup_candidate",
) -> DataFrame:
    """Streaming near-dup ingest gate (B2-on-ingest): flag every arriving
    document that shares ≥1 MinHash band key with the static corpus — the
    batch LSH dedup's candidate test applied at the door. The stream side
    computes the same 16-hash / 4-band signature per arriving doc and
    probes each band key (xxhash64, band-id-prefixed) against the corpus
    band-key Bloom bitset riding a 1-row stream-static broadcast join:
    stateless, no watermark, O(1) per probe, 4 probes per document.
    Bloom ⇒ NO false negatives w.r.t. the batch LSH candidate stage
    (pytest-pinned); false positives only send extra docs to the exact
    Jaccard verifier — the same candidates-then-verify discipline as the
    batch path."""
    from ..querydefs.pipeline_queries import _BLOOM_MULT, _bloom_might_contain

    toks, sh, hashes, bands = _minhash_band_keys(text_col)
    tagged = [F.concat_ws("|", F.lit(str(b)), bands[b]) for b in range(len(bands))]
    bitset = docs.sparkSession.createDataFrame([(bloom_bits,)], "__bloom_bits: array<long>")
    arr = F.col("__bloom_bits")
    hit = None
    for t in tagged:
        p = _bloom_might_contain(F.xxhash64(t), arr, n_bits)
        hit = p if hit is None else (hit | p)
    return (
        docs.withColumn("__toks", toks)
        .withColumn("__sh", sh)
        .withColumn("__hh", hashes)
        .crossJoin(F.broadcast(bitset))
        .withColumn(flag_col, hit)
        .drop("__toks", "__sh", "__hh", "__bloom_bits")
    )


def windowed_topk_stream(
    events: DataFrame,
    key_col: str = "event_type",
    order_col: str = "value",
    k: int = 3,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-window top-k (the leaderboard shape): for every
    (event-time window, key) keep the k rows with the highest
    ``order_col`` — ``slice(sort_array(collect_list(struct(...)), desc),
    1, k)`` as ONE streaming aggregation, the same pure-JVM expression
    family as the batch ``topk_per_key_expr`` twin, so stream and batch
    produce identical rows on identical data (pytest-pinned). Watermark
    bounds state lifetime to open windows; within a window the
    collect_list buffer holds that window's rows — fine for
    human-cardinality windows (leaderboards, per-hour maxima); if a single
    (window, key) cell can hold millions of rows, swap the buffer for an
    ``applyInPandasWithState`` heap that caps state at k, same output
    contract. Ties break by the struct's remaining fields (event_id),
    deterministically on both stream and batch."""
    packed = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col(key_col))
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct(F.col(order_col), F.col("event_id"))), asc=False
                ),
                1,
                k,
            ).alias("top")
        )
    )
    return packed.select("w", key_col, F.explode("top").alias("r")).select(
        F.col("w.start").alias("window_start"),
        key_col,
        F.col(f"r.{order_col}").alias(order_col),
        F.col("r.event_id").alias("event_id"),
    )


def contamination_gate_stream(
    docs: DataFrame,
    bloom_bits: list[int],
    n_bits: int,
    text_col: str = "text",
    flag_col: str = "contaminated",
) -> DataFrame:
    """Streaming ingest gate for training data (B9's on-ingest twin): flag
    every arriving document whose word 8-grams hit the eval-set Bloom
    bitset — the same hashed-shingle + two-probe bitset Column logic as the
    batch ``doc_decontaminate_bloom``, applied UNCHANGED to a stream
    (Structured Streaming's unified model: a stateless projection needs no
    watermark, no state store, and scales as a pure map over micro-batches).
    The bitset rides a 1-row STREAM-STATIC broadcast join — the same
    broadcast-relation form as the batch query, avoiding the
    literal-array-rematerialization cliff (a multi-thousand-element
    literal is rebuilt per evaluation inside codegen). A flagged doc
    carries ``True`` and is typically routed to quarantine by the sink;
    passing docs flow on. No false negatives — anything the exact batch
    sweep would catch is flagged here too; false positives (~fpp of the
    bitset) only over-quarantine."""
    from ..functions import texthash as H
    from ..querydefs.pipeline_queries import _BLOOM_MULT, DECON_N

    toks = F.expr(H.spark_tokens(text_col))
    th = F.expr(H.spark_hash_array("__toks"))
    sk = F.expr(H.spark_shingle_keys("__th", DECON_N))
    bitset = docs.sparkSession.createDataFrame([(bloom_bits,)], "__bloom_bits: array<long>")
    arr = F.col("__bloom_bits")

    def probe(b):
        word = F.element_at(arr, (b / 64).cast("int") + 1)
        return F.call_function("shiftright", word, (b % 64).cast("int")).bitwiseAND(1) == 1

    def hit(k):
        b1 = F.pmod(k, F.lit(n_bits))
        b2 = F.pmod(k * _BLOOM_MULT + 104729, F.lit(n_bits))
        return probe(b1) & probe(b2)

    return (
        docs.withColumn("__toks", toks)
        .withColumn("__th", th)
        .withColumn("__sk", sk)
        .crossJoin(F.broadcast(bitset))
        .withColumn(flag_col, F.exists(F.col("__sk"), hit))
        .drop("__toks", "__th", "__sk", "__bloom_bits")
    )


def read_rate_stream(spark: SparkSession, rows_per_batch: int = 200) -> DataFrame:
    """A genuinely unbounded source mapped into the events shape: the
    ``rate-micro-batch`` source emits ``rows_per_batch`` rows per trigger
    deterministically (value = monotonically increasing long). Used by the
    smoke test to prove the watermark/window builders run against a source
    that never ends (parquet-directory streams are bounded); swap for
    ``format('kafka')`` in production — every builder here is
    source-agnostic."""
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 10).alias("user_id"),
        F.concat(F.lit("type"), (F.col("value") % 3).cast("string")).alias("event_type"),
        (F.col("value") % 100).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )


def run_n_batches(stream_df: DataFrame, query_name: str, n_batches: int = 3,
                  output_mode: str = "append") -> DataFrame:
    """Drive an UNBOUNDED streaming query for a fixed number of micro-
    batches against a memory sink, then stop and return the materialized
    rows (processAllAvailable would never return on an endless source)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        import time

        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            progress = q.recentProgress
            if len(progress) >= n_batches:
                break
            time.sleep(0.2)
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def stream_merge_into(
    stream_df: DataFrame, target_path: str, key: str, bucketed: bool = False, n_buckets: int = 16
) -> None:
    """Streaming → incremental MERGE sink via ``foreachBatch``: each
    micro-batch upserts (last-wins by key) into a parquet dataset using
    io.merge_upsert. foreachBatch gives batch-sink semantics (and with a
    transactional target like Delta, exactly-once); here batches are
    deduplicated by key before the merge so replays stay idempotent.

    ``bucketed=True`` routes through ``io.merge_upsert_bucketed`` instead:
    the target is key-hash-partitioned and each micro-batch rewrites only
    the buckets it touches — the sustainable form for a long-lived stream
    into a large table (the plain merge rewrites the whole target every
    micro-batch)."""
    from ..io import merge_upsert, merge_upsert_bucketed

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.dropDuplicates([key])
        if bucketed:
            merge_upsert_bucketed(
                batch_df.sparkSession, target_path, batch, key=key, n_buckets=n_buckets
            )
        else:
            merge_upsert(batch_df.sparkSession, target_path, batch, key=key)

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


def stream_scd2_dim(event_stream: DataFrame, target_path: str) -> None:
    """Streaming SCD type-2 dimension maintenance (B48's streaming twin):
    every micro-batch of append-only CDC events folds into the persisted
    dimension via ``merge_scd2`` — per batch the work is the batch's own
    run collapse plus joins against only the AFFECTED users' open rows,
    never a rescan of the dimension's history rows (they pass through).

    In-order contract, enforced loudly: merge_scd2 is only sound when
    each affected user's batch events are no older than ANY event already
    folded (per-user append order — what a CDC log / Kafka key-partitioned
    topic provides). The open interval's start is NOT enough to check this
    (a late event can land inside the open run's span, newer than
    valid_from yet older than events already merged — it would silently
    interleave runs), so the persisted dimension carries a ``last_ts``
    bookkeeping column on each is_current row: the newest event timestamp
    folded for that user. A batch whose per-user min(ts) precedes it
    raises; true late-data handling needs the user's event history (a
    reprocess-from-log job), not the dimension alone.

    The rewrite materializes through localCheckpoint before overwriting
    (plain parquet cannot self-overwrite lazily); a transactional target
    (Delta MERGE) removes the rewrite entirely — io.py:118 note.
    """
    from pyspark.sql import functions as F

    from ..querydefs.event_queries import merge_scd2, scd2_build

    def _with_last_ts(dim_rows: DataFrame, batch_df: DataFrame, prev_last) -> DataFrame:
        # last_ts per user = newest folded event: batch max(ts) for users
        # the batch touched, the prior value for everyone else.
        bmax = batch_df.groupBy("user_id").agg(F.max("ts").alias("b_last"))
        if prev_last is not None:
            last = (
                prev_last.join(bmax, "user_id", "full")
                .select("user_id", F.greatest("b_last", "p_last").alias("last_ts"))
            )
        else:
            last = bmax.select("user_id", F.col("b_last").alias("last_ts"))
        out = dim_rows.join(last, "user_id", "left")
        return out.withColumn(
            "last_ts", F.when(F.col("is_current"), F.col("last_ts"))
        )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        dim = _read_state_or_none(spark, target_path, "stream_scd2_dim")
        if dim is None:
            out = _with_last_ts(scd2_build(batch_df), batch_df, None)
            out.write.mode("overwrite").parquet(target_path)
            return
        if "last_ts" not in dim.columns:
            # Dimension written by a pre-last_ts build: degrade gracefully
            # to the valid_from guard (the coalesce below) instead of an
            # unresolved-column AnalysisException; the rewrite this batch
            # produces carries the column from here on.
            dim = dim.withColumn("last_ts", F.lit(None).cast("timestamp"))
        open_rows = dim.filter(F.col("is_current"))
        viol = (
            batch_df.groupBy("user_id")
            .agg(F.min("ts").alias("bmin"))
            .join(open_rows, "user_id")
            .filter(F.col("bmin") < F.coalesce(F.col("last_ts"), F.col("valid_from")))
            .count()
        )
        if viol:
            raise ValueError(
                f"stream_scd2_dim: {viol} user(s) in epoch {epoch_id} have events "
                "older than their newest already-folded event — out-of-order CDC "
                "input; reprocess those users from the event log"
            )
        prev_last = open_rows.select("user_id", F.col("last_ts").alias("p_last"))
        merged = merge_scd2(dim.drop("last_ts"), batch_df)
        merged = _with_last_ts(merged, batch_df, prev_last).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(target_path)

    q = event_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def stream_zorder_append(
    event_stream: DataFrame,
    path: str,
    t0: int,
    t1: int,
    umax: int,
    rows_per_file: int = 1000,
    compact_every_batches: int = 5,
    on_compact=None,
):
    """Streaming maintenance of the Z-ordered events layout (B51's
    streaming twin — NEXT.md's 'compact_clustered on a trigger', the
    needs_retune pattern applied to LAYOUT freshness): every micro-batch
    is Morton-keyed with the SAME integer `div` quantization as
    ``events_zorder_layout`` against FROZEN corpus extremes (t0/t1/umax
    fixed at build time, exactly like IVF centroids or SQ ranges — new
    out-of-range rows clamp into the edge buckets rather than silently
    reshaping every prior key) and appended sorted-within-partition on
    zval. Appends keep the dataset queryable but shred the file layout —
    a firehose of micro-batches leaves one small file per batch
    partition, destroying both IO amortization and the 2-D skipping
    locality — so the sink counts batches and every
    ``compact_every_batches`` fires ``on_compact(path)`` (default: run
    ``io.compact_clustered(path, ['zval'], rows_per_file)`` inline;
    production passes a scheduler hook instead — a full-dataset rewrite
    inside a micro-batch stalls the stream, the same reasoning as
    stream_ivf_sq8_append's retune callback).

    Replay safety: foreachBatch is AT-LEAST-ONCE — after a failure the
    engine redelivers the in-flight epoch with the same epoch_id. The
    sink writes a per-epoch marker (in a ``._epochs`` SIBLING dir, so
    the compaction dir-swap can't erase it) AFTER the data append and
    skips any epoch whose marker already exists, which makes the common
    restart-redelivery path idempotent; the residual window (crash
    BETWEEN the append and the marker create) still duplicates — plain
    parquet has no transaction to close it, so exactly-once needs a
    transactional table format (Delta/Iceberg), mirroring
    compact_clustered's S3A note. Compaction cadence counts the epoch
    markers rather than an in-memory counter, so a restart no longer
    resets the cadence (markers survive restarts; compaction itself
    leaves the sibling dir untouched).

    Returns the StreamingQuery; callers own its lifecycle."""
    from ..io import _hadoop_fs, compact_clustered
    from ..querydefs.event_queries import _ZVAL_SPARK

    if on_compact is None:

        def on_compact(p: str) -> None:
            compact_clustered(
                event_stream.sparkSession, p, ["zval"], rows_per_file
            )

    span = t1 - t0 + 1
    marker_dir = path.rstrip("/") + "._epochs"

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fs, _live, jvm = _hadoop_fs(spark, path)
        mdir = jvm.org.apache.hadoop.fs.Path(marker_dir)
        marker = jvm.org.apache.hadoop.fs.Path(f"{marker_dir}/epoch-{epoch_id}")
        if fs.exists(marker):
            return  # redelivered epoch whose append already completed
        keyed = batch_df.select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            F.expr(
                f"least(greatest(user_id * 256 div ({umax} + 1), 0), 255)"
            )
            .cast("long")
            .alias("ub"),
            F.expr(
                f"least(greatest((unix_micros(ts) - {t0}) * 256 div {span}, 0), 255)"
            )
            .cast("long")
            .alias("hb"),
        )
        z = keyed.withColumn("zval", F.expr(_ZVAL_SPARK).cast("long"))
        z.sortWithinPartitions("zval").write.mode("append").parquet(path)
        fs.mkdirs(mdir)
        fs.create(marker, True).close()
        n_done = len(fs.listStatus(mdir))
        if n_done % compact_every_batches == 0:
            on_compact(path)

    return event_stream.writeStream.foreachBatch(sink).start()


def stream_burst_state(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B73 burst-detection state: every
    micro-batch's (user_id, hour) counts MERGE into the persisted bucket
    table by integer addition (counts are associative, so arrival order
    and batch boundaries — including an hour bucket split across batches
    — cannot change the converged state; no in-order contract needed,
    unlike stream_scd2_dim). The flag computation itself
    (``events_hourly_burst``'s z-score over the state) is a cheap batch
    query over the bounded bucket table, run on demand — the split
    mirrors stream_ivf_sq8_append's append-vs-retune separation: the
    per-batch work is O(|batch| distinct buckets), the corpus-sized scan
    never re-runs.

    The rewrite materializes through localCheckpoint before overwriting
    (plain parquet cannot self-overwrite lazily; a transactional target
    removes the rewrite — io.py:118 note)."""
    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        inc = batch_df.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
        ).agg(F.count("*").cast("long").alias("c"))
        state = _read_state_or_none(spark, state_path, "stream_burst_state")
        if state is None:
            inc.write.mode("overwrite").parquet(state_path)
            return
        merged = (
            state.unionByName(inc)
            .groupBy("user_id", "hour_ts")
            .agg(F.sum("c").cast("long").alias("c"))
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").parquet(state_path)

    q = event_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def burst_flags_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B73's z-score flags computed from the persisted bucket state —
    identical arithmetic to ``events_hourly_burst`` (integer micro mean,
    clamped variance, milli z, z >= 2 flag), so the streamed state
    converges to the batch query exactly."""
    from pyspark.sql import functions as F

    b = spark.read.parquet(state_path)
    n = F.count("*")
    s = F.sum("c")
    s2 = F.sum(F.col("c") * F.col("c"))
    st = b.groupBy("user_id").agg(
        F.floor(s * 1000000.0 / n + 0.5).cast("long").alias("mean_micro"),
        F.greatest(
            F.floor(
                F.sqrt(F.greatest(s2 * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n), F.lit(0.0)))
                * 1000000.0
                + 0.5
            ).cast("long"),
            F.lit(1).cast("long"),
        ).alias("sd_micro"),
    )
    z = F.floor(
        (F.col("c") * 1000000 - F.col("mean_micro")) * 1000.0 / F.col("sd_micro") + 0.5
    ).cast("long")
    return (
        b.join(F.broadcast(st), "user_id")
        .select(
            "user_id",
            "hour_ts",
            F.col("c").cast("long").alias("n_events"),
            z.alias("z_milli"),
        )
        .filter(F.col("z_milli") >= 2000)
        .orderBy("user_id", "hour_ts")
    )


def stream_markov_state(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B71 transition-count state with
    BOUNDARY STITCHING: a transition whose two events land in different
    micro-batches must still be counted, so the persisted state carries,
    per user, the LAST event seen (type + ts + event_id) alongside the
    (from, to) counts. Each batch: order its own events per user, count
    its internal transitions, stitch one extra transition from the
    carried last event to the batch's first event for every user with
    carried state, then advance the carry — the SCD2 open-row discipline
    applied to sequence state. In-order contract (same as
    stream_scd2_dim): each user's batch events must be no older than the
    carried last event; violated input raises rather than silently
    interleaving sequences.

    State size: transition counts are V² rows; the carry is one row per
    user — both bounded far below the event count; per-batch work is the
    batch's own window pass plus joins against only the AFFECTED users'
    carry rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts_path = state_path.rstrip("/") + "/counts"
    carry_path = state_path.rstrip("/") + "/carry"

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = batch_df.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.row_number().over(w).alias("rn"),
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc()))
            .alias("rn_last"),
        )
        internal = (
            seq.filter(F.col("prev_type").isNotNull())
            .groupBy(F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type"))
            .agg(F.count("*").cast("long").alias("c"))
        )
        carry = _read_state_or_none(spark, carry_path, "stream_markov_state(carry)")
        have_state = carry is not None
        if have_state:
            first = seq.filter(F.col("rn") == 1).select(
                "user_id", F.col("event_type").alias("first_type"), F.col("ts").alias("first_ts")
            )
            viol = (
                first.join(carry, "user_id")
                .filter(F.col("first_ts") < F.col("last_ts"))
                .count()
            )
            if viol:
                raise ValueError(
                    f"stream_markov_state: {viol} user(s) in epoch {epoch_id} have "
                    "events older than the carried last event — out-of-order input"
                )
            stitched = (
                first.join(carry, "user_id")
                .groupBy(
                    F.col("last_type").alias("from_type"),
                    F.col("first_type").alias("to_type"),
                )
                .agg(F.count("*").cast("long").alias("c"))
            )
            inc = internal.unionByName(stitched)
        else:
            inc = internal
        inc = inc.groupBy("from_type", "to_type").agg(F.sum("c").cast("long").alias("c"))
        counts = _read_state_or_none(spark, counts_path, "stream_markov_state(counts)")
        if counts is not None:
            merged = (
                counts.unionByName(inc)
                .groupBy("from_type", "to_type")
                .agg(F.sum("c").cast("long").alias("c"))
            )
        else:
            merged = inc
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(counts_path)

        batch_last = seq.filter(F.col("rn_last") == 1).select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("ts").alias("last_ts"),
        )
        if have_state:
            new_carry = (
                carry.join(batch_last.select("user_id"), "user_id", "left_anti")
                .unionByName(batch_last)
                .localCheckpoint(eager=True)
            )
        else:
            new_carry = batch_last.localCheckpoint(eager=True)
        new_carry.write.mode("overwrite").parquet(carry_path)

    q = event_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def markov_matrix_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B71's smoothed V×V matrix computed from the streamed transition
    counts — identical Laplace-ppm arithmetic to
    ``events_markov_transitions``, over the full type grid derived from
    the state (types = every type seen as a from/to endpoint or carried),
    so the streamed state converges to the batch query exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = spark.read.parquet(state_path.rstrip("/") + "/counts")
    carry = spark.read.parquet(state_path.rstrip("/") + "/carry")
    types = (
        counts.select(F.col("from_type").alias("t"))
        .unionByName(counts.select(F.col("to_type").alias("t")))
        .unionByName(carry.select(F.col("last_type").alias("t")))
        .distinct()
    )
    v = types.count()
    grid = types.select(F.col("t").alias("from_type")).crossJoin(
        types.select(F.col("t").alias("to_type"))
    )
    full = grid.join(F.broadcast(counts), ["from_type", "to_type"], "left").select(
        "from_type", "to_type", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("n_trans")
    )
    wt = Window.partitionBy("from_type")
    return (
        full.withColumn("row_total", F.sum("n_trans").over(wt))
        .select(
            "from_type",
            "to_type",
            "n_trans",
            F.expr(f"(n_trans + 1) * 1000000 div (row_total + {v})")
            .cast("long")
            .alias("prob_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


def stream_mergeable_agg(
    stream_df: DataFrame,
    state_path: str,
    key_cols: list[str],
    batch_agg,
    merge_agg,
    pre=None,
) -> None:
    """Generic associative-merge streaming sink (the shape behind
    stream_burst_state, generalized): per micro-batch, reduce the batch
    with ``batch_agg`` (a list of aggregate Columns over ``key_cols``),
    then fold into the persisted state by re-aggregating the union with
    ``merge_agg`` — sound exactly when every measure is associative and
    commutative (sum of sums, min of mins, count as a summed count), in
    which case batch boundaries, arrival order, and restarts cannot
    change the converged state and NO ordering contract is needed.
    Exactly-once caveat identical to stream_zorder_append's note: plain
    parquet gives at-least-once on crash-between-write-and-commit; wrap
    the state in a transactional table for exactly-once."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if pre is not None:
            # per-batch BATCH-LOCAL reshaping (e.g. per-doc scoring) —
            # runs inside foreachBatch, so joins/groupBys here are plain
            # batch plans, never cross-batch streaming state
            batch_df = pre(batch_df)
        inc = batch_df.groupBy(*key_cols).agg(*batch_agg)
        state = _read_state_or_none(spark, state_path, "stream_mergeable_agg")
        if state is None:
            inc.write.mode("overwrite").parquet(state_path)
            return
        merged = (
            state.unionByName(inc)
            .groupBy(*key_cols)
            .agg(*merge_agg)
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").parquet(state_path)

    q = stream_df.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def stream_slice_profile(doc_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B96 per-(lang, source) ingest slice
    profile via ``stream_mergeable_agg`` — counts/sums/min/max fold
    exactly; the derived mean is computed at READ time
    (``slice_profile_from_state``) because a mean is NOT associative."""
    from pyspark.sql import functions as F

    batch_agg = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    ]
    merge_agg = [
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_chars").cast("long").alias("sum_chars"),
        F.min("min_chars").cast("long").alias("min_chars"),
        F.max("max_chars").cast("long").alias("max_chars"),
    ]
    stream_mergeable_agg(doc_stream, state_path, ["lang", "source"], batch_agg, merge_agg)


def slice_profile_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B96's report computed from the streamed state — identical columns
    and integer arithmetic to ``source_slice_profile``."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(state_path)
        .select(
            "lang",
            "source",
            "n_docs",
            "sum_chars",
            "min_chars",
            "max_chars",
            F.expr("sum_chars div n_docs").cast("long").alias("mean_chars"),
        )
        .orderBy("lang", "source")
    )


def stream_sliding_distinct(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B100 sliding 1h/30m reach report via
    ``stream_mergeable_agg``: the 2x window replication runs per
    micro-batch (same integer floor(epoch/1800) arithmetic as the batch
    query), state is keyed (win_start_epoch, user_id) with a SUMMED event
    count — so the only merged measure is associative, and the exact
    distinct-user reach falls out at READ time as the per-window KEY
    count (``sliding_distinct_from_state``). 'Distinct' itself never has
    to merge — the state key absorbs it, the same trick a 100 TB
    deployment uses before swapping the key set for per-window HLL
    sketches."""
    from pyspark.sql import functions as F

    mapped = (
        event_stream.select(F.col("ts").cast("double").alias("sec"), "user_id")
        .select("sec", "user_id", F.explode(F.array(F.lit(0), F.lit(1800))).alias("o"))
        .select(
            (F.floor(F.col("sec") / 1800).cast("long") * 1800 - F.col("o")).alias(
                "win_start_epoch"
            ),
            "user_id",
        )
    )
    stream_mergeable_agg(
        mapped,
        state_path,
        ["win_start_epoch", "user_id"],
        [F.count("*").cast("long").alias("c")],
        [F.sum("c").cast("long").alias("c")],
    )


def sliding_distinct_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B100's report computed from the streamed state — identical columns
    and integer arithmetic to ``events_sliding_distinct_users``."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(state_path)
        .groupBy("win_start_epoch")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("c").cast("long").alias("n_events"),
        )
        .orderBy("win_start_epoch")
    )


def stream_heavy_hitter_state(
    doc_stream: DataFrame, state_path: str, counters: int | None = None
) -> None:
    """Streaming maintenance of a Misra-Gries heavy-hitter summary over
    the token stream (the streaming twin of ``term_heavy_hitters``'s
    pass-1). Per micro-batch: exact batch term counts (the batch is
    bounded), SUM-merge into the persisted summary, then one combined
    decrement round — subtract the (counters+1)-th largest count and
    drop non-positives (Agarwal et al., "Mergeable Summaries": MG
    summaries merge with the pigeonhole retention guarantee intact, so
    ANY term with true frequency > N/(counters+1) survives arbitrary
    batching/merge orders — no ordering contract, same reason
    stream_mergeable_agg needs none). The state is a candidate FILTER
    with bounded memory (≤ counters rows at rest), exactly what pass-2
    verifies with exact counts; at 100 TB/day the summary is a few KB
    regardless of stream volume."""
    from pyspark.sql import functions as F

    k = counters if counters is not None else _MG_DEFAULT_COUNTERS

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        inc = (
            batch_df.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("c"))
        )
        state = _read_state_or_none(spark, state_path, "stream_heavy_hitter_state")
        merged = inc if state is None else (
            state.unionByName(inc).groupBy("term").agg(F.sum("c").cast("long").alias("c"))
        )
        merged = merged.localCheckpoint(eager=True)
        if merged.count() > k:
            # (k+1)-th largest count — ONE tiny ordered head, driver scalar
            thresh = merged.orderBy(F.col("c").desc(), "term").limit(k + 1).collect()[-1].c
            merged = (
                merged.select("term", (F.col("c") - F.lit(thresh)).alias("c"))
                .filter(F.col("c") > 0)
                .localCheckpoint(eager=True)
            )
        merged.write.mode("overwrite").parquet(state_path)

    q = doc_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


_MG_DEFAULT_COUNTERS = 400  # = text_queries.MG_COUNTERS (2 * HH_K)


def heavy_hitters_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The streamed MG summary, largest residual counts first — the
    candidate set pass-2 verifies with exact counts."""
    from pyspark.sql import functions as F

    return spark.read.parquet(state_path).orderBy(F.col("c").desc(), "term")


def stream_seasonal_counts(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of B108/B116's (event_type, day, hour) count
    grid via ``stream_mergeable_agg`` — counts are the one associative
    measure the whole seasonal family (anomaly gate, forecast backtest)
    derives from, so the stream folds micro-batches into the persisted
    grid and the read path recomputes medians/gates from converged
    integers (medians are NOT associative; they never enter the state)."""
    from pyspark.sql import functions as F

    keyed = event_stream.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").cast("int").alias("hod"),
    )
    stream_mergeable_agg(
        keyed,
        state_path,
        ["event_type", "day", "hod"],
        [F.count("*").cast("long").alias("n")],
        [F.sum("n").cast("long").alias("n")],
    )


def seasonal_anomaly_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B108's anomaly report computed from the streamed count grid — the
    SAME ``seasonal_anomaly_report`` pipeline the batch query runs (one
    shared definition; densify/median/MAD/gate parity cannot drift)."""
    from ..querydefs.event_queries import seasonal_anomaly_report

    return seasonal_anomaly_report(spark.read.parquet(state_path))


def stream_user_rfm(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B113 RFM feature block via
    ``stream_mergeable_agg``: per user the raw features are ALL
    associative — recency = max(epoch_us), frequency = summed count,
    monetary = summed cents — so the state folds exactly with no
    ordering contract; the corpus max instant and the ntile quintile
    scores are read-time derivations (``rfm_from_state``), never state."""
    from pyspark.sql import functions as F

    keyed = event_stream.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    stream_mergeable_agg(
        keyed,
        state_path,
        ["user_id"],
        [
            F.max("t").cast("long").alias("last_t"),
            F.count("*").cast("long").alias("f_n"),
            F.sum("cents").cast("long").alias("m_cents"),
        ],
        [
            F.max("last_t").cast("long").alias("last_t"),
            F.sum("f_n").cast("long").alias("f_n"),
            F.sum("m_cents").cast("long").alias("m_cents"),
        ],
    )


def rfm_from_state(spark: SparkSession, state_path: str, corpus_max_us: int) -> DataFrame:
    """B113's report from the streamed state — identical integer and
    ntile arithmetic to ``events_user_rfm``. ``corpus_max_us`` is the
    stream-clock high-water mark (in batch parity tests: max(ts) of the
    corpus; in production: the watermark)."""
    from pyspark.sql import functions as F

    from ..querydefs.event_queries import rfm_quintile_scores

    u = spark.read.parquet(state_path).select(
        "user_id",
        F.expr(f"(CAST({corpus_max_us} AS BIGINT) - last_t) div 86400000000")
        .cast("long")
        .alias("r_days"),
        "f_n",
        "m_cents",
    )
    return rfm_quintile_scores(u)


def stream_srm_state(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B125 sample-ratio-mismatch input via
    ``stream_mergeable_agg``: arm assignment is the same seeded-md5
    map-side expression as ``events_srm_check``, state is keyed
    (event_type, user_id, arm) with a summed event count — 'distinct
    user per arm' never has to merge because the KEY absorbs it (the
    stream_sliding_distinct trick), so batch boundaries and replays
    cannot double-count a user, and the chi-square falls out at READ
    time over per-type key counts. This is how an experiment platform
    watches SRM live: the state grows with reach (users), not traffic."""
    from pyspark.sql import functions as F

    ua = event_stream.select(
        "event_type",
        "user_id",
        F.expr(
            "cast(conv(substring(md5(concat('srm:', cast(user_id as string))), 1, 8), 16, 10)"
            " as bigint) % 2"
        ).alias("arm"),
    )
    stream_mergeable_agg(
        ua,
        state_path,
        ["event_type", "user_id", "arm"],
        [F.count("*").cast("long").alias("c")],
        [F.sum("c").cast("long").alias("c")],
    )


def srm_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B125's report computed from the streamed state — identical columns
    and integer chi-square arithmetic to ``events_srm_check``."""
    from pyspark.sql import functions as F

    arms = (
        spark.read.parquet(state_path)
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("users_arm0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("users_arm1"),
        )
    )
    chi2 = F.expr(
        "(1000000 * (users_arm0 - users_arm1) * (users_arm0 - users_arm1))"
        " div (users_arm0 + users_arm1)"
    )
    return (
        arms.select(
            "event_type",
            "users_arm0",
            "users_arm1",
            chi2.cast("long").alias("chi2_micro"),
            F.when(chi2 > 3841459, 1).otherwise(0).cast("long").alias("srm_flag"),
        )
        .orderBy("event_type")
    )


def stream_stickiness_state(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B141 DAU/MAU input via
    ``stream_mergeable_agg``: each event lands in TWO reach buckets (its
    day and its calendar month — an explode, the sliding-window trick at
    a coarser grain), state is keyed (grain, bucket, user_id) with a
    summed count, so both distincts fall out at read time as per-bucket
    KEY counts and a user split across micro-batches counts once per
    bucket. The month bucket IS the union of its day buckets — the
    mergeable-state argument the batch op's docstring makes, running."""
    from pyspark.sql import functions as F

    mapped = (
        event_stream.select(
            "user_id",
            F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_b"),
            F.date_trunc("month", F.col("ts")).cast("long").alias("month_b"),
        )
        .select(
            "user_id",
            F.explode(
                F.array(
                    F.struct(F.lit("day").alias("grain"), F.col("day_b").alias("bucket")),
                    F.struct(F.lit("month").alias("grain"), F.col("month_b").alias("bucket")),
                )
            ).alias("gb"),
        )
        .select(F.col("gb.grain").alias("grain"), F.col("gb.bucket").alias("bucket"), "user_id")
    )
    stream_mergeable_agg(
        mapped,
        state_path,
        ["grain", "bucket", "user_id"],
        [F.count("*").cast("long").alias("c")],
        [F.sum("c").cast("long").alias("c")],
    )


def stickiness_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B141's report computed from the streamed state — identical columns
    and integer arithmetic to ``events_user_stickiness``."""
    from pyspark.sql import functions as F

    st = spark.read.parquet(state_path)
    dau = (
        st.filter(F.col("grain") == "day")
        .groupBy(F.col("bucket").alias("d"))
        .agg(
            F.count("*").cast("long").alias("dau"),
            F.sum("c").cast("long").alias("n_events"),
        )
    )
    mau = (
        st.filter(F.col("grain") == "month")
        .groupBy(F.col("bucket").alias("m"))
        .agg(F.count("*").cast("long").alias("mau"))
    )
    return (
        dau.join(
            F.broadcast(mau),
            F.date_trunc("month", F.timestamp_seconds(F.col("d") * 86400)).cast("long")
            == F.col("m"),
        )
        .select(
            F.col("d").alias("day_epoch_days"),
            "dau",
            "mau",
            "n_events",
            F.expr("dau * 1000000 div mau").cast("long").alias("stickiness_micro"),
        )
        .orderBy("day_epoch_days")
    )


def stream_slo_burn_state(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B148 SLO burn input via
    ``stream_mergeable_agg``: the 2x window replication runs per
    micro-batch, state is (win_start_epoch)-keyed total/error counts —
    both plain summed counts, so the merge is trivially associative and
    the burn ratio (a division) derives at READ time, never in state.
    This is the live error-budget dashboard: alerts fire off
    ``slo_burn_from_state`` between micro-batches."""
    from pyspark.sql import functions as F

    mapped = (
        event_stream.select(
            F.col("ts").cast("double").alias("sec"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
        )
        .select("sec", "is_err", F.explode(F.array(F.lit(0), F.lit(1800))).alias("o"))
        .select(
            (F.floor(F.col("sec") / 1800).cast("long") * 1800 - F.col("o")).alias(
                "win_start_epoch"
            ),
            "is_err",
        )
    )
    stream_mergeable_agg(
        mapped,
        state_path,
        ["win_start_epoch"],
        [
            F.count("*").cast("long").alias("n_events"),
            F.sum("is_err").cast("long").alias("n_errors"),
        ],
        [
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("n_errors").cast("long").alias("n_errors"),
        ],
    )


def slo_burn_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B148's report computed from the streamed state — identical columns
    and integer arithmetic to ``events_slo_burn_rate``."""
    from pyspark.sql import functions as F

    w = spark.read.parquet(state_path)
    burn = F.expr("n_errors * 50000000 div n_events")
    return (
        w.select(
            "win_start_epoch",
            "n_events",
            "n_errors",
            F.expr("n_errors * 1000000 div n_events").cast("long").alias("err_ppm"),
            burn.cast("long").alias("burn_micro"),
            F.when(burn >= 14400000, 1).otherwise(0).cast("long").alias("fast_burn"),
            F.when(burn >= 3000000, 1).otherwise(0).cast("long").alias("slow_burn"),
        )
        .orderBy("win_start_epoch")
    )


def stream_stl_counts(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B167 STL input via
    ``stream_mergeable_agg``: state is the hourly count series keyed by
    epoch-hour — a plain summed count, trivially associative — and the
    ENTIRE decomposition (centered 25h trend sum, per-hour-of-day
    exact-median seasonal, residual) is read-time algebra over that
    reduced grid (``stl_from_state`` calls the SAME
    ``stl_report_from_counts`` the batch query runs). State grows with
    |hours elapsed|, not traffic."""
    from pyspark.sql import functions as F

    keyed = event_stream.select(
        F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("h")
    )
    stream_mergeable_agg(
        keyed,
        state_path,
        ["h"],
        [F.count("*").cast("long").alias("c")],
        [F.sum("c").cast("long").alias("c")],
    )


def stl_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B167's decomposition from the streamed hourly-count state — one
    shared pipeline with ``events_stl_decompose``, so trend/seasonal/
    residual parity cannot drift."""
    from ..querydefs.event_queries import stl_report_from_counts

    return stl_report_from_counts(spark.read.parquet(state_path))


def stream_cohort_ltv(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B127 cohort-LTV input via
    ``stream_mergeable_agg``. The naive state — revenue keyed by
    (cohort_week, age_weeks) — is NOT mergeable: a late batch can LOWER
    a user's first-seen week and silently re-bucket every prior revenue
    row. The associative form keys state by (user_id, week) with three
    summed measures (all events, valued events, cents); cohort
    assignment (min week per user), age arithmetic, the activity
    distinct-count (the key absorbs distinctness: one state row per
    user-week), and the cumulative LTV window all derive at READ time
    (``cohort_ltv_from_state``), so batch boundaries, replays, and late
    cohort corrections converge exactly to the batch answer. State is
    bounded by |users| x |active weeks|."""
    from pyspark.sql import functions as F

    keyed = event_stream.select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 604800).cast("long").alias("week"),
        F.when(F.col("value").isNotNull(), 1).otherwise(0).alias("is_valued"),
        F.coalesce(F.round(F.col("value") * 100).cast("long"), F.lit(0)).alias("cents"),
    )
    stream_mergeable_agg(
        keyed,
        state_path,
        ["user_id", "week"],
        [
            F.count("*").cast("long").alias("n_events"),
            F.sum("is_valued").cast("long").alias("n_valued"),
            F.sum("cents").cast("long").alias("cents"),
        ],
        [
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("n_valued").cast("long").alias("n_valued"),
            F.sum("cents").cast("long").alias("cents"),
        ],
    )


def cohort_ltv_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B127's cohort-week x age-week revenue/LTV report from the streamed
    (user_id, week) state — identical columns and integer arithmetic to
    ``events_cohort_ltv``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    st = spark.read.parquet(state_path)
    firstw = st.groupBy("user_id").agg(F.min("week").cast("long").alias("cohort_week"))
    rev = (
        st.filter(F.col("n_valued") > 0)
        .join(firstw, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("long").alias("age_weeks"),
            "cents",
        )
    )
    # one state row per (user, week) -> count(*) IS the distinct-user count
    grid = rev.groupBy("cohort_week", "age_weeks").agg(
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.count("*").cast("long").alias("n_active_users"),
    )
    sized = firstw.groupBy("cohort_week").agg(F.count("*").cast("long").alias("cohort_users"))
    wc = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(F.broadcast(sized), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "cohort_users",
            "n_active_users",
            "revenue_cents",
            F.sum("revenue_cents").over(wc).cast("long").alias("cum_ltv_cents"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


def stream_source_fingerprint(doc_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B180 per-source corpus fingerprint via
    ``stream_mergeable_agg``: count sums, XOR folds through bit_xor, and
    the modular sum re-reduces as (a + b) mod M — all associative, so the
    fingerprint of the streamed corpus is bit-identical to the batch
    fingerprint regardless of batch boundaries or arrival order. The
    per-key merge sums two residues < M in decimal(38,0) before
    re-modding, so nothing overflows."""
    from pyspark.sql import functions as F

    from ..querydefs.pipeline_queries import FP_MOD

    keyed = doc_stream.select(
        "source",
        F.expr(
            "cast(conv(substring(md5(concat(cast(doc_id as string), '|', text)), 1, 15),"
            " 16, 10) as bigint)"
        ).alias("h60"),
    )
    stream_mergeable_agg(
        keyed,
        state_path,
        ["source"],
        [
            F.count("*").cast("long").alias("n_docs"),
            F.expr("bit_xor(h60)").cast("long").alias("fp_xor"),
            F.expr(f"cast(sum(cast(h60 as decimal(38,0))) % {FP_MOD} as bigint)").alias(
                "fp_sum_mod"
            ),
        ],
        [
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.expr("bit_xor(fp_xor)").cast("long").alias("fp_xor"),
            F.expr(
                f"cast(sum(cast(fp_sum_mod as decimal(38,0))) % {FP_MOD} as bigint)"
            ).alias("fp_sum_mod"),
        ],
    )


def source_fingerprint_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B180's report from the streamed state — already final-form; just
    ordered for presentation."""
    return spark.read.parquet(state_path).orderBy("source")


# KMV state layout version: 2 = K+1-smallest-hashes layout (the r11
# exact/estimate boundary fix). Bump whenever the persisted shape changes
# in a way the schema alone cannot reveal.
KMV_STATE_VER = 2


def stream_kmv_sketch(doc_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B190 KMV distinct sketch via
    ``stream_mergeable_agg`` — the first ARRAY-valued mergeable state:
    per source the state is the sorted array of the K smallest distinct
    token hashes. Batch reduce: per-batch distinct (source, token) →
    K smallest via sort+slice; merge: concatenate the two arrays,
    re-distinct, re-sort, re-slice — "K smallest of a union" is
    associative and idempotent, so replays and batch boundaries cannot
    move the sketch off the batch answer. The estimate derives at READ
    time (``kmv_from_state``). The in-batch distinct is per micro-batch
    only; duplicate tokens ACROSS batches are absorbed by the merge's
    re-distinct, exactly like a production KMV union.

    The state keeps K+1 (not K) smallest hashes: the batch query reports
    the EXACT count whenever nd <= K, and a K-capped state cannot tell
    "exactly K distinct" (exact branch) from "more than K" (estimate
    branch) — the ADVICE r10 boundary divergence. K+1 smallest of a
    union is equally associative/idempotent, and the read path still
    takes h_K = element_at(ks, K).

    The state carries a format-version column (``kmv_ver`` =
    ``KMV_STATE_VER``): the K→K+1 layout change is silent in the schema,
    and a pre-r11 K-capped state read by the new exact branch would
    report an overflowed sketch as an exact count of K (ADVICE r11).
    ``kmv_from_state`` refuses versionless/old states with a named error
    telling the operator to rebuild."""
    from pyspark.sql import functions as F

    from ..querydefs.dedup_queries import KMV_K

    keyed = (
        doc_stream.select(
            "source", F.explode(F.split("text", " ")).alias("t")
        )
        .filter(F.col("t") != "")
        .select(
            "source",
            F.expr("cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)").alias("hv"),
        )
    )
    k = KMV_K + 1
    stream_mergeable_agg(
        keyed,
        state_path,
        ["source"],
        [
            F.expr(f"slice(array_sort(collect_set(hv)), 1, {k})").alias("ks"),
            F.count("*").cast("long").alias("n_rows"),
            F.max(F.lit(KMV_STATE_VER)).cast("int").alias("kmv_ver"),
        ],
        [
            F.expr(
                f"slice(array_sort(array_distinct(flatten(collect_list(ks)))), 1, {k})"
            ).alias("ks"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min("kmv_ver").cast("int").alias("kmv_ver"),
        ],
    )


def kmv_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Distinct-count estimates from the streamed KMV state — the same
    (K−1)·M/h_K arithmetic as ``kmv_distinct_sketch``; sketches holding
    K or fewer values report their exact size (the batch ``nd <= K``
    branch — possible to distinguish from the estimate branch because
    the state keeps K+1 smallest, see ``stream_kmv_sketch``). Refuses a
    state directory whose ``kmv_ver`` is missing or older than
    ``KMV_STATE_VER`` (pre-r11 K-capped layouts would silently report an
    overflowed sketch as an exact count of K — ADVICE r11)."""
    from pyspark.sql import functions as F

    from ..querydefs.dedup_queries import KMV_K, KMV_M

    st = spark.read.parquet(state_path)
    if "kmv_ver" not in st.columns:
        raise RuntimeError(
            f"KMV state at {state_path} predates the K+1 layout (no kmv_ver"
            f" column, expected kmv_ver={KMV_STATE_VER}); rebuild the state"
            " by replaying the stream through stream_kmv_sketch"
        )
    min_ver = st.agg(F.min("kmv_ver")).first()[0]
    if min_ver is None or min_ver < KMV_STATE_VER:
        raise RuntimeError(
            f"KMV state at {state_path} has kmv_ver={min_ver}, expected"
            f" {KMV_STATE_VER}; rebuild the state by replaying the stream"
            " through stream_kmv_sketch"
        )
    nk = F.size("ks")
    est = (
        F.when(nk <= KMV_K, nk.cast("long"))
        .otherwise(F.floor((KMV_K - 1) * float(KMV_M) / F.element_at("ks", KMV_K)))
        .cast("long")
    )
    return st.select("source", est.alias("n_distinct_est")).orderBy("source")


def stream_user_type_counts(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B183 behavioral-entropy input via
    ``stream_mergeable_agg``: state is (user_id, event_type) summed
    counts — trivially associative — and the entropy (a function of the
    per-user count distribution) derives at READ time
    (``type_entropy_from_state``), so batch boundaries cannot move it."""
    from pyspark.sql import functions as F

    stream_mergeable_agg(
        event_stream.select("user_id", "event_type"),
        state_path,
        ["user_id", "event_type"],
        [F.count("*").cast("long").alias("n")],
        [F.sum("n").cast("long").alias("n")],
    )


def type_entropy_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B183's report from the streamed counts — identical integer
    micro-nat arithmetic to ``events_user_type_entropy``."""
    from pyspark.sql import functions as F

    ut = spark.read.parquet(state_path)
    tot = ut.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("nt"),
        F.count("*").cast("long").alias("n_types"),
    )
    return (
        ut.join(tot, "user_id")
        .groupBy("user_id", "nt", "n_types")
        .agg(
            F.expr(
                "sum(n * cast(round(-ln(n * 1.0 / nt) * 1000000) as bigint)) div nt"
            )
            .cast("long")
            .alias("entropy_micronat")
        )
        .select("user_id", F.col("nt").alias("n_events"), "n_types", "entropy_micronat")
        .orderBy("user_id")
    )


def stream_value_leaderboard(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B207 leaderboard via
    ``stream_mergeable_agg``: per event type the state is the top-K
    (cents desc, event_id asc) structs as a sorted array — top-k of a
    union is associative/idempotent (the B190 argument), so replays and
    batch boundaries converge to the batch leaderboard. Sort key: the
    struct sorts ascending, so rows carry (-cents, event_id) and the
    read path flips the sign back."""
    from pyspark.sql import functions as F

    from ..querydefs.event_queries import LEADERBOARD_K

    keyed = event_stream.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.struct(
            (-F.round(F.col("value") * 100).cast("long")).alias("neg_cents"),
            F.col("event_id").cast("long").alias("event_id"),
        ).alias("kv"),
    )
    k = LEADERBOARD_K
    stream_mergeable_agg(
        keyed,
        state_path,
        ["event_type"],
        [F.expr(f"slice(array_sort(collect_list(kv)), 1, {k})").alias("top")],
        [
            F.expr(
                f"slice(array_sort(array_distinct(flatten(collect_list(top)))), 1, {k})"
            ).alias("top")
        ],
    )


def leaderboard_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B207's report from the streamed state — identical columns to
    ``events_value_leaderboard``."""
    from pyspark.sql import functions as F

    st = spark.read.parquet(state_path)
    return (
        st.select("event_type", F.posexplode("top").alias("i", "kv"))
        .select(
            "event_type",
            (F.col("i") + 1).cast("long").alias("rk"),
            F.col("kv.event_id").alias("event_id"),
            (-F.col("kv.neg_cents")).cast("long").alias("cents"),
        )
        .orderBy("event_type", "rk")
    )


def stream_conversion_lag_state(event_stream: DataFrame):
    """Per-user signup→purchase conversion-lag maintenance via
    ``applyInPandasWithState`` (B136's streaming twin, previously parked
    — landed with its contract made explicit). State per user is two
    numbers: the first signup instant and the minimum post-signup
    purchase lag; each micro-batch sorts its rows by event time and
    folds them in.

    CONTRACT (the reason this is arbitrary-state, not a mergeable agg):
    min-purchase-after-signup is NOT associative when a later batch
    lowers the signup — a purchase discarded as pre-signup cannot be
    recovered from two-number state. The operator is exact whenever a
    user's signup is DELIVERED no later than any purchase that follows
    it in event time, i.e. under event-time-ordered delivery within the
    watermark; a signup arriving later than that bound silently loses
    the purchases in between (the violation pytest demonstrates exactly
    this divergence). Production deployments enforce the bound with
    ``withWatermark`` on the source; unboundedly-late corrections need
    the two-pass batch form (events_conversion_lag)."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("s_us", T.LongType()),
            T.StructField("lag_us", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("s_us", T.LongType()), T.StructField("lag_us", T.LongType())]
    )

    def update(key, pdfs, state: GroupState):
        s_us, lag_us = state.get if state.exists else (-1, -1)
        # A user's micro-batch rows can arrive split across several Arrow
        # chunks; sorting each chunk independently lets a purchase in an
        # early chunk fold before a smaller-ts signup in a later chunk,
        # silently dropping the conversion even though the documented
        # ordered-delivery contract holds at micro-batch granularity
        # (ADVICE r10). Collect ALL chunks, then fold once over the
        # globally time-sorted batch.
        rows = pd.concat(list(pdfs)).sort_values("ts")
        for ts, et in zip(rows["ts"], rows["event_type"]):
            t_us = int(pd.Timestamp(ts).value // 1000)
            if et == "signup" and (s_us < 0 or t_us < s_us):
                s_us = t_us
            elif et == "purchase" and s_us >= 0 and t_us >= s_us:
                cand = t_us - s_us
                if lag_us < 0 or cand < lag_us:
                    lag_us = cand
        state.update((s_us, lag_us))
        yield pd.DataFrame(
            {"user_id": [key[0]], "s_us": [s_us], "lag_us": [lag_us]}
        )

    return event_stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def conversion_lag_report_from_state(per_user: DataFrame) -> DataFrame:
    """B136's bucket histogram from the final per-user (s_us, lag_us)
    rows — identical bucket boundaries and share arithmetic to
    ``events_conversion_lag``."""
    from pyspark.sql import functions as F

    spark = per_user.sparkSession
    signed = per_user.filter(F.col("s_us") >= 0)
    lag_sec = F.expr("lag_us div 1000000")
    bucketed = signed.select(
        F.when(F.col("lag_us") < 0, 5)
        .when(lag_sec < 3600, 0)
        .when(lag_sec < 21600, 1)
        .when(lag_sec < 86400, 2)
        .when(lag_sec < 604800, 3)
        .otherwise(4)
        .alias("bucket_order")
    )
    counts = bucketed.groupBy("bucket_order").agg(F.count("*").cast("long").alias("n_users"))
    tot = counts.agg(F.coalesce(F.sum("n_users"), F.lit(0)).cast("long").alias("t"))
    grid = spark.createDataFrame([(i,) for i in range(6)], "bucket_order int")
    labels = (
        F.when(F.col("bucket_order") == 0, "lt_1h")
        .when(F.col("bucket_order") == 1, "1h_6h")
        .when(F.col("bucket_order") == 2, "6h_24h")
        .when(F.col("bucket_order") == 3, "1d_7d")
        .when(F.col("bucket_order") == 4, "ge_7d")
        .otherwise("never")
    )
    return (
        grid.join(counts, "bucket_order", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket_order").cast("long").alias("bucket_order"),
            labels.alias("bucket"),
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
            F.expr("coalesce(n_users, 0) * 1000000 div greatest(t, 1)")
            .cast("long")
            .alias("share_micro"),
        )
        .orderBy("bucket_order")
    )


def stream_chunk_dedup_state(doc_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B223 chunk-dedup input via
    ``stream_mergeable_agg``: documents chunk on ingest (the registered
    B16 stride/window constants), state is (source, chunk_md5) summed
    counts — the content-addressed embedding-cache index itself; the
    dedup-rate report derives at read time (``chunk_dedup_from_state``).
    A replayed document re-chunks identically (deterministic chunker),
    so the count state is where an exactly-once sink would dedupe."""
    from pyspark.sql import functions as F

    from ..querydefs.pipeline_queries import CHUNK_STRIDE, CHUNK_TOKENS

    t = doc_stream.select("source", F.split(F.col("text"), " ").alias("toks"))
    n = t.withColumn("n", F.size("toks"))
    n_chunks = 1 + F.ceil(
        F.greatest(F.col("n") - CHUNK_TOKENS, F.lit(0)).cast("double") / CHUNK_STRIDE
    ).cast("long")
    keyed = n.select(
        "source",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        "toks",
    ).select(
        "source",
        F.md5(
            F.expr(
                f"array_join(slice(toks, {CHUNK_STRIDE} * chunk_idx + 1, {CHUNK_TOKENS}), ' ')"
            )
        ).alias("chunk_md5"),
    )
    stream_mergeable_agg(
        keyed,
        state_path,
        ["source", "chunk_md5"],
        [F.count("*").cast("long").alias("n")],
        [F.sum("n").cast("long").alias("n")],
    )


def chunk_dedup_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B223's report from the streamed (source, chunk_md5) counts —
    identical columns and integer arithmetic to ``chunk_dedup_rate``."""
    from pyspark.sql import functions as F

    g = spark.read.parquet(state_path)
    return (
        g.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_chunks"),
            F.count("*").cast("long").alias("n_distinct_chunks"),
            F.sum(F.col("n") - 1).cast("long").alias("n_duplicate_chunks"),
            F.expr("sum(n - 1) * 1000000 div sum(n)").cast("long").alias("cache_hit_ppm"),
        )
        .orderBy("source")
    )


def stream_hnsw_append(
    vec_stream: DataFrame,
    state_dir: str,
    centroids: DataFrame,
    on_retune=None,
    rows_per_cell: int | None = None,
) -> None:
    """Streaming HNSW-graph ingest (B228, the index-lifecycle twin of the
    B224 batch build): as vector batches arrive, maintain (a) the
    append-only per-cell vector store and (b) per-(node, layer) neighbor
    lists as MERGEABLE top-M state — "the M closest of a union is the
    top-M of per-batch top-Ms" is the same associativity argument as the
    KMV sketch, so batch boundaries, arrival order, and replays cannot
    move the converged graph off the batch-built one (parity pytest).

    Per batch the candidate edges are (new × current cell members) in
    BOTH directions — every unordered pair is generated once the later
    endpoint arrives, duplicates absorbed by the merge's distinct — so
    per-batch cost is |batch| × |affected cells' members|, the
    ``neardup_incremental_probe`` contract, never a rebuild. Cell and
    level assignment reuse the batch build's deterministic contracts
    (broadcast centroid table, 4-decimal quantized assignment with cid
    tie-breaks, md5-prefix levels). ``centroids`` is the FIXED coarse
    quantizer (production: the trained table the index was built with).
    Exactly-once caveat as stream_mergeable_agg's.

    Index-geometry freshness (VERDICT r11 item 5, the
    ``stream_ivf_sq8_append`` occupancy contract applied to the graph):
    the cell count is frozen at build time, so a growing corpus silently
    fattens cells — and the BUILD cost of the batch graph is |cell|², so
    stale geometry hurts the graph quadratically where it hurt IVF probes
    linearly. After every batch the sink checks ``ivf.needs_retune``
    against the streamed vector-state row count and calls
    ``on_retune(n_rows_now)`` ONCE (default: a loud warning). The
    callback schedules the re-suggest + rebuild out-of-band — rebuilding
    in-line would stall the stream for a full corpus pass."""
    import warnings

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions import vector as V
    from ..operators.hnsw import HNSW_M, HNSW_MAX_LEVEL, hnsw_level_expr
    from ..operators.ivf import needs_retune

    vec_path = f"{state_dir.rstrip('/')}/vectors"
    edge_path = f"{state_dir.rstrip('/')}/edges"
    cap = f"CASE WHEN layer = 0 THEN {2 * HNSW_M} ELSE {HNSW_M} END"
    built_params = {"k": centroids.count()}
    if rows_per_cell is not None:
        built_params["rows_per_cell"] = rows_per_cell
    retune_state = {"fired": False}
    if on_retune is None:

        def on_retune(n_now: int) -> None:
            warnings.warn(
                f"HNSW graph state at {state_dir} has outgrown its cell "
                f"geometry (k={built_params['k']}, rows now {n_now}): "
                "re-run suggest_ivf_params and rebuild the graph",
                stacklevel=2,
            )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        wr = Window.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("cid").asc())
        newv = (
            batch_df.crossJoin(F.broadcast(centroids))
            .select(
                "vec_id",
                "embedding",
                "cid",
                F.round(V.l2sq("embedding", "cv"), 4).alias("d"),
            )
            .withColumn("__rn", F.row_number().over(wr))
            .filter(F.col("__rn") == 1)
            .select("vec_id", "embedding", "cid", hnsw_level_expr("vec_id").alias("level"))
        )
        vstate = _read_state_or_none(spark, vec_path, "stream_hnsw_append(vec)")
        allv = (
            vstate.unionByName(newv).dropDuplicates(["vec_id"])
            if vstate is not None
            else newv
        )
        allv = allv.localCheckpoint(eager=True)
        allv.write.mode("overwrite").parquet(vec_path)
        # occupancy freshness: allv is checkpointed, so the count is a
        # cached-partition pass, not a recompute
        n_now = allv.count()
        if not retune_state["fired"] and needs_retune(n_now, built_params):
            retune_state["fired"] = True
            # flush memoized tuning curves BEFORE the callback — a rebuild
            # it schedules must re-advise on fresh geometry (VERDICT r12
            # item 3)
            from ..operators.memo import invalidate_all

            invalidate_all()
            on_retune(n_now)
        newv = allv.join(newv.select("vec_id"), "vec_id", "left_semi")

        a = newv.select(
            F.col("vec_id").alias("na"),
            F.col("embedding").alias("va"),
            F.col("cid").alias("ca"),
            F.col("level").alias("la"),
        )
        b = allv.select(
            F.col("vec_id").alias("nb"),
            F.col("embedding").alias("vb"),
            F.col("cid").alias("cb"),
            F.col("level").alias("lb"),
        )
        raw = a.join(b, (F.col("ca") == F.col("cb")) & (F.col("na") != F.col("nb"))).select(
            "na",
            "nb",
            "la",
            "lb",
            F.round(F.round(V.l2sq("va", "vb"), 4) * 10000).cast("long").alias("d_q"),
        )
        both = raw.select(
            F.col("na").alias("vec_id"), F.col("nb").alias("neighbor_id"),
            "la", "lb", "d_q",
        ).unionByName(
            raw.select(
                F.col("nb").alias("vec_id"), F.col("na").alias("neighbor_id"),
                F.col("lb").alias("la"), F.col("la").alias("lb"), "d_q",
            )
        )
        edges = both.select(
            "vec_id",
            "neighbor_id",
            "d_q",
            F.explode(F.sequence(F.lit(0), F.least("la", "lb"))).alias("__l"),
        ).select(
            "vec_id", F.col("__l").cast("long").alias("layer"),
            F.struct(F.col("d_q"), F.col("neighbor_id")).alias("e"),
        )
        inc = edges.groupBy("vec_id", "layer").agg(
            F.expr(f"slice(array_sort(array_distinct(collect_list(e))), 1, {cap})").alias(
                "top"
            )
        )
        estate = _read_state_or_none(spark, edge_path, "stream_hnsw_append(edges)")
        if estate is None:
            inc.write.mode("overwrite").parquet(edge_path)
            return
        merged = (
            estate.unionByName(inc)
            .groupBy("vec_id", "layer")
            .agg(
                F.expr(
                    f"slice(array_sort(array_distinct(flatten(collect_list(top)))), 1, {cap})"
                ).alias("top")
            )
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").parquet(edge_path)

    q = vec_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def hnsw_edges_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The streamed graph in the batch build's row shape
    (vec_id, layer, rk, neighbor_id, d_q) — rk from the state array's
    position (the arrays are kept (d_q, neighbor_id)-sorted)."""
    from pyspark.sql import functions as F

    st = spark.read.parquet(f"{state_dir.rstrip('/')}/edges")
    return st.select(
        "vec_id", "layer", F.posexplode("top").alias("__p", "e")
    ).select(
        "vec_id",
        "layer",
        (F.col("__p") + 1).cast("long").alias("rk"),
        F.col("e.neighbor_id").alias("neighbor_id"),
        F.col("e.d_q").alias("d_q"),
    )


# ---------------------------------------------------------------------------
# B236 twin: streaming JOIN-view maintenance over a CDC-tagged union stream
# ---------------------------------------------------------------------------
def stream_delta_join(
    cdc_stream: DataFrame,
    o_acc_path: str,
    l_acc_path: str,
    view_path: str,
) -> None:
    """Streaming twin of ``orders_join_delta_maintenance`` (B236): the
    input is ONE CDC-style stream whose rows are tagged arrivals for
    either join side (``side`` ∈ {'O','L'} — the shape a Debezium/CDC
    topic union delivers); each micro-batch applies the delta-join
    identity against the persisted accumulators

        ΔV = ΔO ⋈ L_acc  ∪  O_acc ⋈ ΔL  ∪  ΔO ⋈ ΔL

    APPENDS the view increment, and only then appends the deltas to the
    accumulators. Exactness argument: every joined pair (o, l) lands
    exactly once — at the micro-batch where the LATER side arrives,
    because each accumulator holds strictly PRIOR batches when the
    increment is computed; no ordering contract is needed (inserts
    commute). Contract enforced loudly: inserts-only (an unknown ``side``
    tag raises — updates/deletes need a compacting MERGE sink, the
    stream_scd2_dim discipline). Exactly-once caveat identical to
    stream_zorder_append's: plain parquet appends are at-least-once on a
    crash between the view write and the accumulator write; wrap all
    three paths in a transactional table for exactly-once. At 100 TB the
    increment cost is |ΔO|⋈L (delta join keys bound the probe) +
    O⋈|ΔL| + |ΔO|⋈|ΔL| — never a re-scan of the view."""
    o_cols = ["o_orderkey", "o_orderpriority"]
    l_cols = ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_returnflag"]

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        bad = batch_df.filter(~F.col("side").isin("O", "L"))
        if not bad.isEmpty():
            raise ValueError(
                "stream_delta_join: inserts-only CDC contract violated — "
                f"unknown side tag(s): {[r['side'] for r in bad.select('side').distinct().collect()]}"
            )
        d_o = batch_df.filter(F.col("side") == "O").select(*o_cols).localCheckpoint(eager=True)
        d_l = batch_df.filter(F.col("side") == "L").select(*l_cols).localCheckpoint(eager=True)
        parts = [d_o.join(d_l, d_o["o_orderkey"] == d_l["l_orderkey"])]
        o_acc = _read_state_or_none(spark, o_acc_path, "stream_delta_join")
        if o_acc is not None:
            parts.append(o_acc.join(d_l, o_acc["o_orderkey"] == d_l["l_orderkey"]))
        l_acc = _read_state_or_none(spark, l_acc_path, "stream_delta_join")
        if l_acc is not None:
            parts.append(d_o.join(l_acc, d_o["o_orderkey"] == l_acc["l_orderkey"]))
        inc = parts[0]
        for p in parts[1:]:
            inc = inc.unionByName(p)
        inc.write.mode("append").parquet(view_path)
        d_o.write.mode("append").parquet(o_acc_path)
        d_l.write.mode("append").parquet(l_acc_path)

    q = cdc_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def delta_join_report_from_view(spark: SparkSession, view_path: str) -> DataFrame:
    """B236's report over the streamed view — the SAME shared aggregate
    as the batch query (`relational_queries.join_view_revenue_report`)."""
    from ..querydefs.relational_queries import join_view_revenue_report

    return join_view_revenue_report(spark.read.parquet(view_path))


# ---------------------------------------------------------------------------
# B239 twin: streaming fixed-bin value-histogram state
# ---------------------------------------------------------------------------
def stream_value_hist(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B239 per-(event_type, day, bin) value
    histogram via ``stream_mergeable_agg`` — bin counts are plain sums,
    so batch boundaries, arrival order, and restarts cannot move the
    converged state. The state is bounded by |types|·|days|·|occupied
    bins| regardless of event volume; quantiles are computed at READ
    time (``value_bands_from_hist_state``) because a quantile is not
    associative — the histogram is."""
    from ..querydefs.event_queries import VALUE_HIST_BIN_CENTS

    binned = event_stream.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("cast(floor(unix_timestamp(ts) / 86400) as bigint)").alias("d"),
        F.expr(
            "(cast(round(value * 100) as bigint)"
            f" - pmod(cast(round(value * 100) as bigint), {VALUE_HIST_BIN_CENTS}))"
            f" div {VALUE_HIST_BIN_CENTS}"
        ).alias("bin"),
    )
    batch_agg = [F.count("*").cast("long").alias("c")]
    merge_agg = [F.sum("c").cast("long").alias("c")]
    stream_mergeable_agg(binned, state_path, ["event_type", "d", "bin"], batch_agg, merge_agg)


def value_bands_from_hist_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B239's band report computed from the streamed histogram state — the
    SAME shared read-back as the batch audit twin
    (`event_queries.value_bands_from_hist`)."""
    from ..querydefs.event_queries import value_bands_from_hist

    return value_bands_from_hist(spark.read.parquet(state_path))


# ---------------------------------------------------------------------------
# B243: watermark late-data accounting — stream observability (r12)
# ---------------------------------------------------------------------------
def stream_late_audit(
    event_stream: DataFrame,
    state_path: str,
    watermark_s: int = 3600,
) -> None:
    """Late-data accounting for a watermarked pipeline (B243): per
    micro-batch, how many rows arrived LATE — event time older than
    (max event time of all PRIOR batches − watermark) — vs admitted.
    This is exactly the row set a watermarked stateful aggregation
    downstream would silently drop (Spark advances the watermark from
    the PREVIOUS batch's max event time), surfaced as an auditable
    per-batch ledger instead of silent loss: the first number an on-call
    engineer asks for when a streaming count diverges from the batch
    recompute. State rows: (epoch_id, n_rows, n_late, batch_max_us,
    wm_us) — the high-water mark is the running max over prior rows, so
    the audit itself is restart-safe (re-reading the ledger reconstructs
    the same watermark sequence). Scale: one count aggregate per batch;
    the ledger grows one row per micro-batch."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prior = _read_state_or_none(spark, state_path, "stream_late_audit")
        hwm = (
            prior.agg(F.max("batch_max_us").alias("m")).collect()[0]["m"]
            if prior is not None
            else None
        )
        wm_us = (hwm - watermark_s * 1_000_000) if hwm is not None else None
        ts_us = F.unix_micros(F.col("ts"))
        row = batch_df.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(
                F.when(ts_us < F.lit(wm_us), 1).otherwise(0)
                if wm_us is not None
                else F.lit(0)
            )
            .cast("long")
            .alias("n_late"),
            F.max(ts_us).cast("long").alias("batch_max_us"),
        ).select(
            F.lit(int(epoch_id)).cast("long").alias("epoch_id"),
            "n_rows",
            "n_late",
            "batch_max_us",
            F.lit(wm_us).cast("long").alias("wm_us"),
        )
        row.write.mode("append").parquet(state_path)

    q = event_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def late_audit_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The per-batch late-data ledger, ordered, plus cumulative loss share
    in ppm — the dashboard row the audit exists for."""
    df = spark.read.parquet(state_path).orderBy("epoch_id")
    tot = df.agg(
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.sum("n_late").cast("long").alias("total_late"),
    )
    return df.crossJoin(F.broadcast(tot)).select(
        "epoch_id",
        "n_rows",
        "n_late",
        "batch_max_us",
        "wm_us",
        F.expr("total_late * 1000000 div greatest(total_rows, 1)")
        .cast("long")
        .alias("corpus_late_ppm"),
    )


# ---------------------------------------------------------------------------
# B245 twin: streaming aggregate maintenance under FULL CDC (retractions)
# ---------------------------------------------------------------------------
def stream_cdc_retraction_agg(cdc_stream: DataFrame, state_path: str) -> None:
    """Maintain the B245 per-status (n_orders, revenue_cents) rollup from
    a Debezium-shaped CDC stream carrying INSERTS, UPDATES, AND DELETES —
    the retraction-capable sibling of the insert-only CDC sinks. Each
    micro-batch folds through the SAME signed algebra as the batch query
    (`querydefs.relational_queries.cdc_signed_fold`: I → (+1, +after),
    U → (0, after − before), D → (−1, −before)), then merges into the
    persisted state by summing — every measure is an associative signed
    sum, so batch boundaries, arrival order, and restarts cannot move the
    converged state and no ordering contract is needed (deletes may even
    arrive in an earlier micro-batch than their insert: the fold is a sum
    either way). Malformed rows fail LOUDLY: unknown op tags, U without
    both images, I/D without the image their sign reads — silently
    skipping a retraction would corrupt the rollup forever.
    """
    from ..querydefs.relational_queries import cdc_signed_fold

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # NULL-safe gate: `~op.isin(...)` is NULL for a NULL op, so the
        # row would slip past the filter yet hit the fold's
        # `.otherwise(-before_cents)` delete branch — the exact silent
        # corruption this contract exists to prevent (ADVICE r12 #1)
        bad = batch_df.filter(
            F.col("op").isNull()
            | ~F.col("op").isin("I", "U", "D")
            | ((F.col("op") == "I") & F.col("after_cents").isNull())
            | ((F.col("op") == "D") & F.col("before_cents").isNull())
            | (
                (F.col("op") == "U")
                & (F.col("before_cents").isNull() | F.col("after_cents").isNull())
            )
        )
        n_bad = bad.count()
        if n_bad:
            sample = [r.asDict() for r in bad.limit(3).collect()]
            raise RuntimeError(
                f"stream_cdc_retraction_agg: {n_bad} malformed CDC rows in epoch "
                f"{epoch_id} (op outside I/U/D or missing before/after image) — "
                f"skipping a retraction would corrupt the rollup; sample: {sample}"
            )
        inc = cdc_signed_fold(batch_df)
        state = _read_state_or_none(spark, state_path, "stream_cdc_retraction_agg")
        if state is None:
            inc.write.mode("overwrite").parquet(state_path)
            return
        merged = (
            state.unionByName(inc)
            .groupBy("o_orderstatus")
            .agg(
                F.sum("n_orders").cast("long").alias("n_orders"),
                F.sum("revenue_cents").cast("long").alias("revenue_cents"),
                F.sum("n_ins").cast("long").alias("n_ins"),
                F.sum("n_upd").cast("long").alias("n_upd"),
                F.sum("n_del").cast("long").alias("n_del"),
            )
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").parquet(state_path)

    q = cdc_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


# ---------------------------------------------------------------------------
# B256 twin: streaming DISTINCT-count maintenance via multiplicity state
# ---------------------------------------------------------------------------
def stream_distinct_multiplicity(cdc_stream: DataFrame, state_path: str) -> None:
    """Maintain per-type distinct-user counts from an I/D CDC stream via
    the B256 multiplicity state (`querydefs.event_queries.
    multiplicity_fold`): per micro-batch, fold the batch's ±1 support
    deltas and MERGE BY SUM into the persisted (event_type, user_id, net)
    state — the state itself is an associative signed sum, so batch
    boundaries, arrival order, and restarts cannot move it; the
    distinct-count read-back (`distinct_from_multiplicity`) is derived,
    never stored, because COUNT DISTINCT is not signed-sum-maintainable
    (the theorem B245 documents — its famous non-member). Unknown op tags
    raise loudly."""
    from ..querydefs.event_queries import multiplicity_fold

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # NULL op must raise like any other unknown tag (ADVICE r12 #1):
        # the bare ~isin gate is NULL for NULL, dropping the row from
        # `bad` while the fold's .otherwise(-1) treats it as a retraction
        n_bad = batch_df.filter(
            F.col("op").isNull() | ~F.col("op").isin("I", "D")
        ).count()
        if n_bad:
            raise RuntimeError(
                f"stream_distinct_multiplicity: {n_bad} rows with op outside I/D in "
                f"epoch {epoch_id} — a silently-dropped retraction corrupts the "
                "support counts forever"
            )
        inc = multiplicity_fold(batch_df).filter(F.col("net") != 0)
        state = _read_state_or_none(spark, state_path, "stream_distinct_multiplicity")
        if state is None:
            inc.write.mode("overwrite").parquet(state_path)
            return
        merged = (
            state.unionByName(inc)
            .groupBy("event_type", "user_id")
            .agg(F.sum("net").cast("long").alias("net"))
            # prune fully-retracted pairs: without this the state grows
            # with ALL-TIME pairs, not the active ones the docstring
            # promises — safe because the signed sum re-creates the row
            # on a later insert (ADVICE r12 #2)
            .filter(F.col("net") != 0)
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").parquet(state_path)

    q = cdc_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def distinct_report_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Read-back for stream_distinct_multiplicity — the shared B256
    derivation over the persisted multiplicity state."""
    from ..querydefs.event_queries import distinct_from_multiplicity

    return distinct_from_multiplicity(spark.read.parquet(state_path)).orderBy("event_type")


# ---------------------------------------------------------------------------
# B249 twin: streaming ingest-ledger maintenance for the compaction planner
# ---------------------------------------------------------------------------
def stream_compaction_ledger(event_stream: DataFrame, state_path: str) -> None:
    """Maintain the (day, hour, n_rows) file ledger the B249 compaction
    planner reads, from a streamed event feed: per micro-batch counts
    merge into the persisted state BY SUM (associative — boundary/order/
    restart-safe via the stream_mergeable_agg discipline). A maintenance
    job then calls `querydefs.event_queries.compaction_plan_from_files`
    on the state — the SAME planner as the batch query, so streamed and
    batch plans are identical by construction (pytest proves it on a
    4-batch replay)."""
    keyed = event_stream.select(
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("day"),
        F.hour("ts").cast("long").alias("hour"),
    )
    stream_mergeable_agg(
        keyed,
        state_path,
        ["day", "hour"],
        [F.count("*").cast("long").alias("n_rows")],
        [F.sum("n_rows").cast("long").alias("n_rows")],
    )


def compaction_plan_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Read-back for stream_compaction_ledger — the shared B249 planner
    over the persisted ledger."""
    from ..querydefs.event_queries import compaction_plan_from_files

    return compaction_plan_from_files(spark.read.parquet(state_path))


# ---------------------------------------------------------------------------
# B7 twin, completed: sessionization whose sessions SPAN micro-batches
# ---------------------------------------------------------------------------
def stream_sessionize(event_stream: DataFrame, state_dir: str) -> None:
    """Gap-based sessionization (the B7 batch query's 30-min rule) as a
    stateful stream: the hard case is a session STRADDLING a micro-batch
    boundary — the open session per user is the state. Per batch: run
    the same lag+cumsum sessionizer WITHIN the batch (user-partitioned
    window), then stitch at the seam — if the user's open session is
    within gap of the batch's first event, the batch's first session
    merges into it (counts/values sum, start stays); otherwise the open
    session closes. All but the user's last batch-session close; the
    last becomes the new open state. Value totals are carried in exact
    integer cents (the batch query's decimal discipline). Requires
    per-user in-order delivery (the key-partitioned-topic contract every
    stateful fold here documents); violations raise loudly, because a
    late event would belong to an already-closed session.
    ``sessionize_from_state`` re-numbers (closed ∪ open) sessions per
    user by start time — exactly the batch numbering — so the pytest can
    compare against ``events_sessionize`` row-for-row.
    """
    from pyspark.sql import Window

    from ..querydefs.event_queries import SESSION_GAP_SEC

    closed_path = f"{state_dir}/closed"
    open_path = f"{state_dir}/open"

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        state = _read_state_or_none(spark, open_path, "stream_sessionize(open)")
        has_state = state is not None
        if has_state:
            viol = (
                batch_df.groupBy("user_id")
                .agg(F.min("ts").alias("min_ts"))
                .join(state, "user_id")
                .filter(F.col("min_ts") < F.col("last_ts"))
                .count()
            )
            if viol:
                raise ValueError(
                    f"stream_sessionize: {viol} user(s) in epoch {epoch_id} have "
                    "events older than their open session's last event — "
                    "out-of-order delivery would assign them to a closed session; "
                    "replay the feed in per-user order"
                )
        order = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.col("ts").cast("double") - F.col("prev_ts").cast("double")
        sess = (
            batch_df.withColumn("prev_ts", F.lag("ts").over(order))
            .withColumn(
                "is_new",
                F.when(
                    F.col("prev_ts").isNull() | (gap > SESSION_GAP_SEC), 1
                ).otherwise(0),
            )
            .withColumn(
                "bsid",
                F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .groupBy("user_id", "bsid")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("last_ts"),
                F.count("*").cast("long").alias("n_events"),
                F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
                .cast("long")
                .alias("cents"),
            )
            .localCheckpoint(eager=True)
        )
        w_user = Window.partitionBy("user_id")
        first_flag = F.col("bsid") == F.min("bsid").over(w_user)
        last_flag = F.col("bsid") == F.max("bsid").over(w_user)
        sess = sess.select("*", first_flag.alias("is_first"), last_flag.alias("is_last"))
        if has_state:
            st = state.select(
                "user_id",
                F.col("session_start").alias("o_start"),
                F.col("last_ts").alias("o_last"),
                F.col("n_events").alias("o_n"),
                F.col("cents").alias("o_cents"),
            )
            sess = sess.join(st, "user_id", "left")
            merge_first = (
                F.col("is_first")
                & F.col("o_last").isNotNull()
                & (
                    F.col("session_start").cast("double") - F.col("o_last").cast("double")
                    <= SESSION_GAP_SEC
                )
            )
            stitched = sess.select(
                "user_id",
                "bsid",
                F.when(merge_first, F.col("o_start")).otherwise(F.col("session_start"))
                .alias("session_start"),
                "last_ts",
                (
                    F.col("n_events")
                    + F.when(merge_first, F.col("o_n")).otherwise(0)
                ).cast("long").alias("n_events"),
                (F.col("cents") + F.when(merge_first, F.col("o_cents")).otherwise(0))
                .cast("long")
                .alias("cents"),
                "is_last",
            )
            # open sessions NOT merged into (user absent from batch keeps
            # its state; user present but first batch session out of gap
            # closes the old open session)
            closing_old = (
                state.join(
                    sess.filter(F.col("is_first")).select(
                        "user_id", F.col("session_start").alias("b_start")
                    ),
                    "user_id",
                )
                .filter(
                    F.col("b_start").cast("double") - F.col("last_ts").cast("double")
                    > SESSION_GAP_SEC
                )
                .select("user_id", "session_start", "last_ts", "n_events", "cents")
            )
            untouched = state.join(
                sess.select("user_id").distinct(), "user_id", "left_anti"
            )
        else:
            stitched = sess.select(
                "user_id", "bsid", "session_start", "last_ts", "n_events", "cents", "is_last"
            )
            closing_old = None
            untouched = None
        new_closed = stitched.filter(~F.col("is_last")).select(
            "user_id", "session_start", "last_ts", "n_events", "cents"
        )
        if closing_old is not None:
            new_closed = new_closed.unionByName(closing_old)
        new_open = stitched.filter(F.col("is_last")).select(
            "user_id", "session_start", "last_ts", "n_events", "cents"
        )
        if untouched is not None:
            new_open = new_open.unionByName(untouched)
        new_closed = new_closed.localCheckpoint(eager=True)
        new_open = new_open.localCheckpoint(eager=True)
        new_closed.write.mode("append").parquet(closed_path)
        new_open.write.mode("overwrite").parquet(open_path)

    q = event_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def sessionize_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read-back for stream_sessionize: (closed ∪ open) sessions,
    re-numbered per user by start time — the batch query's numbering —
    with the cents total converted to the same double the batch emits."""
    from pyspark.sql import Window

    opened = spark.read.parquet(f"{state_dir}/open")
    # a stream where no session ever CLOSED (every user still in their
    # first session) may leave no readable parquet under closed/ — fall
    # back to the open state alone, mirroring the sinks' first-batch
    # bootstrap (ADVICE r12 #3); an existing-but-corrupt dir still raises
    closed = _read_state_or_none(spark, f"{state_dir}/closed", "sessionize_from_state")
    allp = closed.unionByName(opened) if closed is not None else opened
    w = Window.partitionBy("user_id").orderBy("session_start", "last_ts")
    return allp.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_id"),
        "session_start",
        F.col("last_ts").alias("session_end"),
        "n_events",
        (F.col("cents").cast("decimal(18,2)") / 100).cast("double").alias("total_value"),
    ).orderBy("user_id", "session_id")


# ---------------------------------------------------------------------------
# B277: streaming Bloom-filter maintenance (the B274 twin)
# ---------------------------------------------------------------------------
def stream_bloom_append(key_stream: DataFrame, state_path: str, key_col: str = "key") -> None:
    """Streaming maintenance of the B274 Bloom position table: per
    micro-batch the new keys' k seed positions merge into the persisted
    distinct-position state. Set union is the textbook associative-
    commutative-idempotent merge (a Bloom filter is an OR-fold), so
    batch boundaries, arrival order, replays, and duplicate deliveries
    cannot move the converged filter off the batch-built one — the
    strongest of the mergeable-state guarantees (even at-least-once
    redelivery is absorbed, where counting states need exactly-once).
    Deletion is deliberately unsupported: a plain Bloom cannot retract
    (that is the counting-filter variant's job); the filter only ever
    grows toward more permissive, never incorrect. Scale: per batch
    |batch|×k positions, distinct-merged into a ≤m-row state."""
    from ..querydefs.relational_queries import _BLOOM_K, _BLOOM_M

    from ..functions import texthash as _H

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        seeds = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("i"))
        pos = (
            batch_df.select(F.col(key_col).alias("key"))
            .crossJoin(F.broadcast(seeds))
            .select(
                F.expr(
                    _H.spark_str_hash_fast(
                        "concat('bf', cast(i as string), ':', cast(key as string))"
                    )
                    + f" % {_BLOOM_M}"
                ).alias("pos")
            )
            .distinct()
        )
        state = _read_state_or_none(spark, state_path, "stream_bloom_append")
        merged = pos if state is None else state.unionByName(pos).distinct()
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_path)

    q = key_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


# ---------------------------------------------------------------------------
# B283 twin: streaming counting-Bloom maintenance over a churning key CDC
# ---------------------------------------------------------------------------
def stream_counting_bloom(cdc_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B283 counting filter from an I/D-
    tagged key stream: per batch each key's k seed positions fold into
    (pos, net) state BY SIGNED SUM — associative and commutative, so
    batch boundaries, arrival order, and restarts cannot move the
    converged counters (the stream_distinct_multiplicity discipline on
    hash positions instead of pairs). Unknown or NULL op tags raise
    loudly; net=0 rows are pruned (state bounded by LIVE positions, ≤m
    rows). Unlike the plain-Bloom twin (B277) this one is NOT
    redelivery-idempotent — a replayed insert double-counts — which is
    exactly the counting filter's documented exactly-once requirement;
    the plain filter trades deletion away to buy that idempotence."""
    from ..querydefs.relational_queries import _BLOOM_K, _BLOOM_M

    from ..functions import texthash as _H

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        n_bad = batch_df.filter(
            F.col("op").isNull() | ~F.col("op").isin("I", "D")
        ).count()
        if n_bad:
            raise RuntimeError(
                f"stream_counting_bloom: {n_bad} rows with op outside I/D in epoch "
                f"{epoch_id} — a dropped retraction corrupts the counters forever"
            )
        seeds = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("i"))
        inc = (
            batch_df.crossJoin(F.broadcast(seeds))
            .groupBy(
                F.expr(
                    _H.spark_str_hash_fast(
                        "concat('bf', cast(i as string), ':', cast(key as string))"
                    )
                    + f" % {_BLOOM_M}"
                ).alias("pos")
            )
            .agg(
                F.sum(F.when(F.col("op") == "I", 1).otherwise(-1))
                .cast("long")
                .alias("net")
            )
            .filter(F.col("net") != 0)
        )
        state = _read_state_or_none(spark, state_path, "stream_counting_bloom")
        merged = inc if state is None else (
            state.unionByName(inc)
            .groupBy("pos")
            .agg(F.sum("net").cast("long").alias("net"))
            .filter(F.col("net") != 0)
        )
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_path)

    q = cdc_stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def stream_page_hinkley(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B288 Page-Hinkley input state: the
    day-count table folds by integer addition (counts are associative —
    batch boundaries, arrival order, and a day split across micro-batches
    cannot change the converged state), via the generic mergeable sink.
    The PH statistic itself is inherently SEQUENTIAL (running mean,
    running min), so it is NOT maintained incrementally: it recomputes
    over the ≤|days|-row state at read time (``page_hinkley_from_state``)
    — the same state/statistic split as stream_burst_state, with the
    sequential part confined to the bounded reduced table."""
    from pyspark.sql import functions as F

    stream_mergeable_agg(
        event_stream.select(
            F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("d")
        ),
        state_path,
        ["d"],
        [F.count("*").cast("long").alias("c")],
        [F.sum("c").cast("long").alias("c")],
    )


def page_hinkley_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B288's quantized Page-Hinkley columns computed from the streamed
    day-count state — identical arithmetic to ``events_page_hinkley_drift``
    (shared ``page_hinkley_over_daily`` builder), so the streamed state
    converges to the batch query exactly."""
    from ..querydefs.event_queries import page_hinkley_over_daily

    state = _read_state_or_none(spark, state_path, "page_hinkley_from_state")
    if state is None:
        raise FileNotFoundError(f"no page-hinkley state at {state_path}")
    return page_hinkley_over_daily(state)


def stream_watermark_lag(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B290 ingest-lag state: the (source,
    lag-second) count table folds by integer addition through the generic
    mergeable sink — the exact shape the op was designed around (bounded
    lag cardinality ⇒ bounded state), so the per-batch work is
    O(|batch| distinct lags) and the ledger recomputes over the bounded
    state at read time (``watermark_lag_from_state``)."""
    from pyspark.sql import functions as F

    from ..functions import texthash as _H

    lagd = event_stream.select(
        F.expr("CAST(user_id % 8 AS BIGINT)").alias("source"),
        F.expr(
            f"CAST({_H.spark_str_hash_fast('CAST(event_id AS STRING)')} % 1800"
            " + CASE WHEN event_id % 97 = 0 THEN 3600 ELSE 0 END AS BIGINT)"
        ).alias("lag_s"),
    )
    stream_mergeable_agg(
        lagd,
        state_path,
        ["source", "lag_s"],
        [F.count("*").cast("long").alias("c")],
        [F.sum("c").cast("long").alias("c")],
    )


def watermark_lag_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B290's per-source lag ledger computed from the streamed count
    state — identical arithmetic to ``events_ingest_watermark_lag``
    (shared ``watermark_lag_over_counts`` builder)."""
    from ..querydefs.event_queries import watermark_lag_over_counts

    state = _read_state_or_none(spark, state_path, "watermark_lag_from_state")
    if state is None:
        raise FileNotFoundError(f"no watermark-lag state at {state_path}")
    return watermark_lag_over_counts(state)


def stream_mannwhitney(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B294 rank-test state: the (cents,
    per-arm count) table folds by integer addition through the generic
    mergeable sink (bounded cents cardinality ⇒ bounded state — the same
    contract as stream_watermark_lag); the rank arithmetic, inherently a
    sorted cumulative walk, recomputes over the bounded state at read
    time (``mannwhitney_from_state``)."""
    from pyspark.sql import functions as F

    v = event_stream.filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    ).select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    stream_mergeable_agg(
        v,
        state_path,
        ["cents"],
        [
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("c1"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("c2"),
        ],
        [
            F.sum("c1").cast("long").alias("c1"),
            F.sum("c2").cast("long").alias("c2"),
        ],
    )


def mannwhitney_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B294's exact U/AUC ledger computed from the streamed count state —
    identical arithmetic to ``events_mannwhitney_test`` (shared
    ``mannwhitney_over_counts`` builder)."""
    from ..querydefs.event_queries import mannwhitney_over_counts

    state = _read_state_or_none(spark, state_path, "mannwhitney_from_state")
    if state is None:
        raise FileNotFoundError(f"no mann-whitney state at {state_path}")
    return mannwhitney_over_counts(state)


def stream_hll(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B314 HLL register state (B317): the
    (j, m_j) table folds by MAX through the generic mergeable sink. max()
    is associative AND idempotent, so replayed or duplicated users across
    micro-batches converge to exactly the batch registers — the classic
    sketch-union property, inherited rather than re-proven. State is ≤64
    rows by construction; the estimator recomputes over it at read time
    (``hll_from_state``)."""
    from pyspark.sql import functions as F

    h = event_stream.select(
        F.expr(
            "cast(conv(substring(md5(concat('hll:', cast(user_id as string))), 1, 12),"
            " 16, 10) as bigint)"
        ).alias("hv")
    ).select(
        F.expr("hv div 4398046511104").alias("j"),
        F.expr("hv % 4398046511104").alias("w"),
    )
    ranks = h.select(
        "j",
        F.when(F.col("w") == 0, 43)
        .otherwise(F.lit(43) - F.length(F.bin(F.col("w"))))
        .cast("long")
        .alias("m_j"),
    )
    stream_mergeable_agg(
        ranks,
        state_path,
        ["j"],
        [F.max("m_j").cast("long").alias("m_j")],
        [F.max("m_j").cast("long").alias("m_j")],
    )


def hll_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B314's estimator computed from the streamed register state —
    identical arithmetic to ``events_hll_register_audit``'s estimate
    columns (shared ``hll_estimate_over_registers`` builder)."""
    from ..querydefs.event_queries import hll_estimate_over_registers

    state = _read_state_or_none(spark, state_path, "hll_from_state")
    if state is None:
        raise FileNotFoundError(f"no hll state at {state_path}")
    return hll_estimate_over_registers(state.select("j", "m_j"))


def cvm_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B318's Cramér-von Mises T computed from the streamed Mann-Whitney
    count state (B324): the (cents, c1, c2) table stream_mannwhitney
    maintains is sufficient for BOTH rank tests, so a second read-time
    view is free — no second sink, no second state (shared
    ``cvm_over_counts`` builder)."""
    from ..querydefs.event_queries import cvm_over_counts

    state = _read_state_or_none(spark, state_path, "cvm_from_state")
    if state is None:
        raise FileNotFoundError(f"no mann-whitney state at {state_path}")
    return cvm_over_counts(state.select("cents", "c1", "c2"))


def stream_segment_counts(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the (event_type, dow, n, s) segment-count
    state (B337): plain integer-sum folding through the generic mergeable
    sink (bounded: event types × 7 dows). ONE state feeds TWO read-time
    views — the BH-FDR multiple-testing gate (``bh_fdr_from_state``) and
    the EB rate shrinkage (``eb_from_state``) — the one-state-many-views
    discipline B324 established for the rank tests, applied to the
    segment-rate shelf."""
    from pyspark.sql import functions as F

    seg = event_stream.select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.when(F.round(F.col("value") * 100).cast("long") >= 5000, 1)
        .otherwise(0)
        .alias("x"),
    )
    stream_mergeable_agg(
        seg,
        state_path,
        ["event_type", "dow"],
        [
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
        ],
        [
            F.sum("n").cast("long").alias("n"),
            F.sum("s").cast("long").alias("s"),
        ],
    )


def bh_fdr_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B312's BH step-up computed from the streamed segment counts
    (shared ``bh_fdr_over_counts`` builder)."""
    from ..querydefs.event_queries import bh_fdr_over_counts

    state = _read_state_or_none(spark, state_path, "bh_fdr_from_state")
    if state is None:
        raise FileNotFoundError(f"no segment-count state at {state_path}")
    return bh_fdr_over_counts(state.select("event_type", "dow", "n", "s"))


def eb_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B323's EB shrinkage computed from the streamed segment counts
    (shared ``eb_shrinkage_over_counts`` builder)."""
    from ..querydefs.event_queries import eb_shrinkage_over_counts

    state = _read_state_or_none(spark, state_path, "eb_from_state")
    if state is None:
        raise FileNotFoundError(f"no segment-count state at {state_path}")
    return eb_shrinkage_over_counts(state.select("event_type", "dow", "n", "s"))


def stream_score_support(doc_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the B326/B336 score-label state (B339):
    documents arrive whole, so the per-doc B35 classifier score is
    batch-local, and the (score, n_chars) count table folds by plain sum
    through the generic mergeable sink (per-entity-state shape, the SCD2
    precedent). The label median is NOT frozen at sink time — it
    re-derives at read time over the streamed char marginal, so the two
    read views (``gains_from_state``, ``youden_from_state``) equal their
    one-shot batches exactly at any prefix of the stream."""
    from pyspark.sql import functions as F

    from ..querydefs.text_queries import _clf_scores

    def make_pairs(df: DataFrame) -> DataFrame:
        # per-batch, BATCH-LOCAL: score each whole doc, pair with n_chars
        sc = _clf_scores(df)
        return sc.join(df.select("doc_id", "n_chars"), "doc_id").select("s", "n_chars")

    stream_mergeable_agg(
        doc_stream,
        state_path,
        ["s", "n_chars"],
        [F.count("*").cast("long").alias("c")],
        [F.sum("c").cast("long").alias("c")],
        pre=make_pairs,
    )


def gains_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B326's gains/lift deciles from the streamed (s, n_chars) state
    (shared ``gains_over_support`` + ``support_from_pairs`` builders)."""
    from ..querydefs.text_queries import gains_over_support, support_from_pairs

    state = _read_state_or_none(spark, state_path, "gains_from_state")
    if state is None:
        raise FileNotFoundError(f"no score-support state at {state_path}")
    return gains_over_support(support_from_pairs(state.select("s", "n_chars", "c")))


def youden_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B336's ROC/Youden table from the streamed (s, n_chars) state
    (shared ``youden_over_support`` + ``support_from_pairs`` builders)."""
    from ..querydefs.text_queries import support_from_pairs, youden_over_support

    state = _read_state_or_none(spark, state_path, "youden_from_state")
    if state is None:
        raise FileNotFoundError(f"no score-support state at {state_path}")
    return youden_over_support(support_from_pairs(state.select("s", "n_chars", "c")))


def stream_daily_counts(event_stream: DataFrame, state_path: str) -> None:
    """Streaming maintenance of the (day, n, s) daily-count state (B341):
    plain sum-folding through the generic mergeable sink, state bounded
    by the HORIZON in days. ONE state feeds THREE read-time views — the
    seasonal decomposition (``seasonal_from_state``), the residual runs
    test (``runs_from_state``), and the SPRT walk (``sprt_from_state``) —
    the widest application yet of the one-state-many-views discipline:
    every ordered/sequential statistic recomputes over the bounded state
    at read time, so only the trivially-associative count fold has to
    survive batch boundaries."""
    from pyspark.sql import functions as F

    daily = event_stream.select(
        F.expr("cast(floor(cast(ts as double)/86400) as bigint)").alias("d"),
        F.when(F.round(F.col("value") * 100).cast("long") >= 5000, 1)
        .otherwise(0)
        .alias("x"),
    )
    stream_mergeable_agg(
        daily,
        state_path,
        ["d"],
        [F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")],
        [F.sum("n").cast("long").alias("n"), F.sum("s").cast("long").alias("s")],
    )


def _daily_state(spark: SparkSession, state_path: str, caller: str) -> DataFrame:
    state = _read_state_or_none(spark, state_path, caller)
    if state is None:
        raise FileNotFoundError(f"no daily-count state at {state_path}")
    return state


def seasonal_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B327's decomposition from the streamed daily counts (shared
    ``seasonal_over_daily`` builder; y = n)."""
    from pyspark.sql import functions as F

    from ..querydefs.event_queries import seasonal_over_daily

    state = _daily_state(spark, state_path, "seasonal_from_state")
    return seasonal_over_daily(state.select("d", F.col("n").alias("y")))


def runs_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B328's runs test from the streamed daily counts (shared
    ``seasonal_over_daily`` + ``runs_over_decomposition`` builders)."""
    from pyspark.sql import functions as F

    from ..querydefs.event_queries import (
        runs_over_decomposition,
        seasonal_over_daily,
    )

    state = _daily_state(spark, state_path, "runs_from_state")
    return runs_over_decomposition(
        seasonal_over_daily(state.select("d", F.col("n").alias("y")))
    )


def sprt_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """B322's SPRT walk from the streamed daily counts (shared
    ``sprt_over_daily`` builder)."""
    from ..querydefs.event_queries import sprt_over_daily

    state = _daily_state(spark, state_path, "sprt_from_state")
    return sprt_over_daily(state.select("d", "n", "s"))
