"""Event-stream operators over ``events`` in batch form (SURVEY.md B7):
tumbling/sliding time windows, sessionization, JSON property extraction.

Every query here is watermark-ready: the same expressions run under
Structured Streaming by swapping ``read`` for ``readStream`` and adding
``withWatermark`` (see streaming/stream_ops.py, which reuses these
builders) — batch-first is how the operators stay oracle-checkable.

Time parity notes: the session pins ``spark.sql.session.timeZone=UTC`` so
Spark and DuckDB agree on naive timestamps; gap comparisons cast timestamps
to double seconds (microsecond-exact in both engines); DuckDB
``time_bucket`` and Spark ``window()`` share epoch alignment for the
minute/hour intervals used here.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texthash as _H
from ..io import read_table
from ..queries import register


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type — the batch twin of the
    streaming groupBy(window(...)) aggregation."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@register(
    "events_tumbling_1h",
    """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return tumbling_agg(ev, "1 hour").orderBy("window_start", "event_type")


@register(
    "events_sliding_1h_30m",
    """
WITH b AS (
  SELECT event_type, value,
         unnest([time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
                 time_bucket(INTERVAL '30 minutes', ts)]) AS window_start
  FROM events
)
SELECT window_start, event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM b
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): each event lands in two
    windows; Spark's window() enumerates them, the oracle unnests the two
    epoch-aligned starts."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


SESSION_GAP_SEC = 1800


@register(
    "events_sessionize",
    f"""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > {SESSION_GAP_SEC}
                 THEN 1 ELSE 0 END AS is_new
  FROM o
), sessions AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap via lag + cumulative-sum — the
    batch equivalent of streaming ``session_window``; partitions by user so
    the shuffle key is the natural one at scale."""
    ev = read_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.col("prev_ts").cast("double")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(order)).withColumn(
        "is_new",
        F.when(F.col("prev_ts").isNull() | (gap > SESSION_GAP_SEC), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "events_json_props",
    """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       round(CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE) / count(*), 6) AS avg_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: get_json_object over the props JSON
    column, integer-exact aggregation."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.sum("k").cast("double") / F.count("*"), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "events_asof_last_purchase",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type, value,
         CAST(last_value(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END IGNORE NULLS)
             OVER w AS DOUBLE) AS last_purchase_value,
         last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
             OVER w AS last_purchase_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, ts, last_purchase_ts, last_purchase_value
FROM ordered
WHERE event_type = 'click' AND user_id <= 30
ORDER BY user_id, event_id
""",
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — guide: 'bucketize or window'):
    for every click, the user's most recent purchase at-or-before it,
    expressed as last_value(... IGNORE NULLS) over the interleaved event
    stream — one shuffle on user_id, no join at all. The classic
    time-series enrichment at scale."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(18,2)"))
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    enriched = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(purchase_val, ignorenulls=True).over(w).cast("double").alias("last_purchase_value"),
        F.last(purchase_ts, ignorenulls=True).over(w).alias("last_purchase_ts"),
    )
    return (
        enriched.filter(F.col("event_type") == "click")
        .select("user_id", "event_id", "ts", "last_purchase_ts", "last_purchase_value")
        .orderBy("user_id", "event_id")
    )


@register(
    "events_type_counts_salted",
    """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_type_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient aggregation (operators/skew.py): event_type is a
    5-value hot-key domain — the salted two-phase plan scatters each key
    over 16 sub-keys before combining, and must produce EXACTLY the plain
    groupBy result (the oracle is the plain SQL)."""
    from ..operators.skew import salted_agg

    ev = read_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": (F.count("*"), F.sum("n_events")),
            "total_value": (F.sum(dec), F.sum("total_value")),
            "max_value": (F.max(dec), F.max("max_value")),
        },
        n_salts=16,
    )
    return (
        out.select(
            "event_type",
            "n_events",
            F.col("total_value").cast("double").alias("total_value"),
            F.col("max_value").cast("double").alias("max_value"),
        )
        .orderBy("event_type")
    )


@register(
    "events_user_daily_activity",
    """
WITH d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, value FROM events
)
SELECT user_id, day,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_types,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM d
WHERE user_id <= 50
GROUP BY user_id, day
ORDER BY user_id, day
""",
)
def events_user_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily rollup with conditional counts — the pre-aggregation
    shape that feeds incremental (streaming) materialization."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    return (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "events_salted_join_weighted",
    """
WITH dim AS (
  SELECT DISTINCT event_type, length(event_type) AS weight FROM events
)
SELECT e.event_type,
       count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(18,2)) * d.weight) AS DOUBLE) AS weighted_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
ORDER BY e.event_type
""",
)
def events_salted_join_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient JOIN (operators/skew.salted_join): event_type is a
    5-value hot-key domain, so a shuffle join on it funnels ~N/5 rows per
    reducer. The salted plan scatters the fact side over 16 sub-keys and
    replicates the dim side across them; the oracle is the PLAIN join —
    salting must be invisible in the result. (At this dim size broadcast
    is the right physical plan; the query exists to prove the salted
    escape hatch's semantics for the large-large case.)"""
    from ..operators.skew import salted_join

    ev = read_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type"))
    )
    joined = salted_join(ev, dim, "event_type", n_salts=16)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)") * F.col("weight"))
            .cast("double")
            .alias("weighted_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B42: interval (range) join via time-bucket equi-join (r6)
# ---------------------------------------------------------------------------
# Spark has no native range-join strategy (a raw BETWEEN join plans as a
# nested-loop); the scalable mechanism is BUCKETING: explode each interval
# into the fixed-width time buckets it covers, equi-join events on their
# bucket, and keep the true range predicate as the residual. The join is a
# HashJoin whatever the table sizes — the shape that survives when BOTH
# sides are large (billions of events x millions of intervals), unlike
# broadcasting one side. Windows here are derived from the data (2-hour
# "maintenance windows" every 8 hours across the corpus span) so the whole
# query is self-contained and oracle-replayable.
WIN_EVERY_H = 8
WIN_LEN_H = 2


@register(
    "events_interval_bucket_join",
    f"""
WITH span AS (
  SELECT date_trunc('day', min(ts)) AS t0, max(ts) AS tmax FROM events
), wins AS (
  SELECT CAST(w AS BIGINT) AS window_id,
         t0 + to_hours(CAST(w * {WIN_EVERY_H} AS BIGINT)) AS w_start,
         t0 + to_hours(CAST(w * {WIN_EVERY_H} + {WIN_LEN_H} AS BIGINT)) AS w_end
  FROM span, unnest(range(0, CAST(floor(date_diff('hour', t0, tmax) / {WIN_EVERY_H}) AS BIGINT) + 1)) AS r(w)
), wbuckets AS (
  SELECT window_id, w_start, w_end,
         w_start + to_hours(CAST(h AS BIGINT)) AS bucket
  FROM wins, unnest(range(0, {WIN_LEN_H})) AS r(h)
), ev AS (
  SELECT event_id, user_id, value, ts, date_trunc('hour', ts) AS bucket FROM events
)
SELECT b.window_id, b.w_start AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM ev e JOIN wbuckets b ON e.bucket = b.bucket
WHERE e.ts >= b.w_start AND e.ts < b.w_end
GROUP BY b.window_id, b.w_start
ORDER BY window_id
""",
)
def events_interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events enriched against derived 2-hour windows by bucketed range
    join: intervals explode into their covering hour buckets, events
    equi-join on ``date_trunc('hour', ts)``, the exact range rides as the
    residual predicate. Plan: one HashJoin on the bucket key (the windows
    side is tiny here and broadcasts; with a large interval table the
    same plan shuffles both sides on the uniform bucket key — never a
    nested loop), then one groupBy per window. Value sums go through
    DECIMAL(18,2) so the per-window totals are order-independent."""
    ev = read_table(spark, sf_dir, "events")
    span = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("t0"), F.max("ts").alias("tmax")
    )
    n_w = (
        F.floor(
            (F.unix_timestamp("tmax") - F.unix_timestamp("t0")) / (3600 * WIN_EVERY_H)
        ).cast("bigint")
        + 1
    )
    wins = span.select(
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_w - 1)).alias("window_id"), "t0"
    ).select(
        "window_id",
        F.expr(f"t0 + make_interval(0, 0, 0, 0, window_id * {WIN_EVERY_H}, 0, 0)").alias(
            "w_start"
        ),
        F.expr(
            f"t0 + make_interval(0, 0, 0, 0, window_id * {WIN_EVERY_H} + {WIN_LEN_H}, 0, 0)"
        ).alias("w_end"),
    )
    wbuckets = wins.select(
        "window_id",
        "w_start",
        "w_end",
        F.explode(
            F.expr(
                f"transform(sequence(0, {WIN_LEN_H - 1}),"
                f" h -> w_start + make_interval(0, 0, 0, 0, h, 0, 0))"
            )
        ).alias("bucket"),
    )
    e = ev.select("event_id", "user_id", "value", "ts", F.date_trunc("hour", F.col("ts")).alias("bucket"))
    return (
        e.join(F.broadcast(wbuckets), "bucket")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .groupBy("window_id", F.col("w_start").alias("window_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("window_id")
    )


# ---------------------------------------------------------------------------
# B48: SCD type-2 state history (change capture → validity intervals) (r7)
# ---------------------------------------------------------------------------
# The warehouse-side change-data-capture build: each user's event_type
# sequence is collapsed into runs of consecutive equal states, and every
# run becomes one dimension row [valid_from, valid_to) with an is_current
# flag on the open interval — the slowly-changing-dimension type-2 shape
# every lakehouse ingest pipeline maintains. Mechanism: lag → change flag
# → running-sum run id → per-run min(ts) → lead for the closing bound.
# All four windows/aggregations share ONE partitioning (user_id), so the
# whole build is a single exchange on the uniform user key; at 100 TB the
# sort within each user is bounded by per-user activity, and incremental
# maintenance needs only each user's last open row (the B45 state-merge
# discipline applied to intervals).


@register(
    "events_scd2_user_state",
    """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END AS chg
  FROM o
), runs AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
  FROM flagged
), collapsed AS (
  SELECT user_id, run_id, event_type,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, run_id, event_type
)
SELECT user_id, run_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL AS is_current,
       n_events
FROM collapsed
ORDER BY user_id, run_id
""",
)
def events_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 state intervals per user (B48): runs of consecutive equal
    event_type collapse to [valid_from, valid_to) rows; the latest run per
    user is the open (is_current) interval. One exchange: every window and
    the run aggregation partition on user_id."""
    return scd2_build(read_table(spark, sf_dir, "events"))


def scd2_runs(events: DataFrame) -> DataFrame:
    """Collapse an event frame into per-user runs of consecutive equal
    event_type: (user_id, run_id 1-based, event_type, valid_from,
    n_events). The shared stage of the full build and the incremental
    merge."""
    wo = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.lag("event_type").over(wo).isNull()
            | (F.lag("event_type").over(wo) != F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("chg").over(wo.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
    )
    return runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count("*").cast("long").alias("n_events")
    )


def scd2_finalize(collapsed: DataFrame) -> DataFrame:
    """Derive the closing bound and the open flag from ordered runs."""
    wr = Window.partitionBy("user_id").orderBy(F.col("run_id").asc())
    return (
        collapsed.select(
            "user_id",
            "run_id",
            "event_type",
            "valid_from",
            F.lead("valid_from").over(wr).alias("valid_to"),
            F.lead("valid_from").over(wr).isNull().alias("is_current"),
            "n_events",
        )
        .orderBy("user_id", "run_id")
    )


def scd2_build(events: DataFrame) -> DataFrame:
    """Full SCD2 build over an event frame."""
    return scd2_finalize(scd2_runs(events))


def merge_scd2(dim: DataFrame, batch: DataFrame) -> DataFrame:
    """Incremental SCD2 maintenance (the B45 state discipline applied to
    intervals): fold an APPEND-ONLY event batch into an existing type-2
    dimension touching only the affected users — their open row is the
    whole state; closed rows and untouched users pass through untouched.

    Cost shape: the batch collapses to runs with the shared one-exchange
    stage; the seam logic joins the batch's ≤|affected users| first runs
    against the ≤|affected users| open rows; the lead/is_current rebuild
    windows over affected-user rows only. Nothing rescans prior events.

    Contract (pytest-pinned): result ≡ scd2_build(all events) for any
    split of the stream into ts-ordered batches (ties on ts never split
    across batches), including empty batches.
    """
    busers = batch.select("user_id").distinct()
    untouched = dim.join(busers, "user_id", "left_anti")
    affected = dim.join(busers, "user_id", "left_semi")
    closed = affected.filter(~F.col("is_current"))
    seed = affected.filter(F.col("is_current")).select(
        "user_id",
        F.col("run_id").alias("s_run"),
        F.col("event_type").alias("s_type"),
        F.col("valid_from").alias("s_from"),
        F.col("n_events").alias("s_n"),
    )
    bruns = scd2_runs(batch)  # (user_id, run_id 1-based, event_type, valid_from, n_events)
    joined = bruns.join(seed, "user_id", "left")
    merge_first = (F.col("run_id") == 1) & F.col("s_type").isNotNull() & (
        F.col("s_type") == F.col("event_type")
    )
    # does this user's first batch run merge into the open row?
    merged_users = joined.filter(merge_first).select("user_id", F.col("n_events").alias("m_n"))
    # the continuing/open seed row (absent for brand-new users)
    seed_out = (
        seed.join(merged_users, "user_id", "left")
        .select(
            "user_id",
            F.col("s_run").alias("run_id"),
            F.col("s_type").alias("event_type"),
            F.col("s_from").alias("valid_from"),
            (F.col("s_n") + F.coalesce(F.col("m_n"), F.lit(0))).cast("long").alias("n_events"),
        )
    )
    batch_out = (
        joined.withColumn("m", merge_first)
        .withColumn("u_merged", F.max(F.when(merge_first, 1).otherwise(0)).over(
            Window.partitionBy("user_id")
        ))
        .filter(~F.col("m"))
        .select(
            "user_id",
            (F.col("run_id") + F.coalesce(F.col("s_run"), F.lit(0)) - F.col("u_merged"))
            .cast("long")
            .alias("run_id"),
            "event_type",
            "valid_from",
            "n_events",
        )
    )
    tail = scd2_finalize(seed_out.unionByName(batch_out))
    return untouched.unionByName(closed).unionByName(tail).orderBy("user_id", "run_id")


# ---------------------------------------------------------------------------
# B51: Z-order (Morton) clustering layout for multi-column pruning (r7)
# ---------------------------------------------------------------------------
# A single-column sort prunes scans on ONE predicate dimension; bit-
# interleaving two quantized keys (Morton order) keeps rows close in BOTH
# dimensions, so a (user range x time range) predicate touches O(few)
# files instead of all of them — what Delta's OPTIMIZE ZORDER does,
# expressed as native DataFrame algebra: quantize each key to 8 bits by
# integer scaling against the corpus extremes, interleave the bits, and
# lay files out in zval order. All arithmetic is integer (scale-by-256
# div range; shifts), so the oracle replays zval and the file assignment
# bit-for-bit. File ids come from the exact zval rank computed the same
# way the production write lays files out (io.compact_clustered):
# fixed `zval div 2048` range buckets (a pure value function of the
# 16-bit Morton code, in whole-stage codegen — no boundary sketch, no
# range exchange), bucket-local ranks + a |buckets|-row offset merge
# (operators.quantiles.with_exact_rank_range, bucket_expr form) —
# identical numbers to a global row_number, with no single task ever
# sorting the full event corpus (VERDICT r10 item 4). The compaction
# pytest still exercises the real write path end-to-end and measures the
# file-skipping win.
ZORDER_ROWS_PER_FILE = 1000


def _zval_expr(ub: str, hb: str, shl, shr) -> str:
    terms = []
    for b in range(8):
        terms.append(shl(f"({shr(ub, b)}) & 1", 2 * b + 1))
        terms.append(shl(f"({shr(hb, b)}) & 1", 2 * b))
    return " + ".join(terms)


_ZVAL_SPARK = _zval_expr(
    "ub", "hb", lambda e, n: f"shiftleft({e}, {n})", lambda c, b: f"shiftright({c}, {b})"
)
_ZVAL_DDB = _zval_expr(
    "ub", "hb", lambda e, n: f"(({e}) << {n})", lambda c, b: f"({c} >> {b})"
)


@register(
    "events_zorder_layout",
    f"""
WITH ext AS (
  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1, max(user_id) AS umax
  FROM events
), keyed AS (
  SELECT e.event_id,
         CAST(e.user_id * 256 // (ext.umax + 1) AS BIGINT) AS ub,
         CAST((epoch_us(e.ts) - ext.t0) * 256 // (ext.t1 - ext.t0 + 1) AS BIGINT) AS hb
  FROM events e, ext
), z AS (
  SELECT event_id, ub, hb, CAST({_ZVAL_DDB} AS BIGINT) AS zval FROM keyed
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY zval, event_id) AS rn FROM z
)
SELECT event_id, ub, hb, zval,
       CAST((rn - 1) // {ZORDER_ROWS_PER_FILE} AS BIGINT) AS file_id
FROM ranked
ORDER BY event_id
""",
)
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-order layout assignment over (user_id, event time): 8-bit
    integer quantization of each key against the corpus extremes, bit
    interleave, zval-ordered file ids (B51). The extremes frame is a
    1-row broadcast; quantization and interleave are map-side integer
    expressions in whole-stage codegen; the file-id rank is the
    range-bucketed exact-rank form on fixed ``zval div 2048`` buckets
    (a pure value function — no boundary sketch; bucket-local ranks +
    offset merge — see operators.quantiles.with_exact_rank_range)."""
    ev = read_table(spark, sf_dir, "events")
    ext = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
        F.max("user_id").alias("umax"),
    )
    # Integer `div` end-to-end: double division + floor matches DuckDB's
    # `//` at sf-test spans, but for multi-year microsecond spans the
    # numerator approaches 2^53 and a half-ulp in the float quotient can
    # flip the floor — `div` keeps the documented bit-for-bit contract.
    keyed = ev.crossJoin(F.broadcast(ext)).select(
        "event_id",
        F.expr("user_id * 256 div (umax + 1)").cast("long").alias("ub"),
        F.expr("(unix_micros(ts) - t0) * 256 div (t1 - t0 + 1)").cast("long").alias("hb"),
    )
    z = keyed.select("event_id", "ub", "hb", F.expr(_ZVAL_SPARK).cast("long").alias("zval"))
    from ..operators.quantiles import with_exact_rank_range

    # zval is bounded by construction (16-bit Morton code), so the range
    # buckets are fixed integer spans — no boundary-sketch pass, bucketing
    # stays in codegen; 32 buckets of 2048 zvals each
    ranked = with_exact_rank_range(
        z, "zval", "event_id", "rn", bucket_expr=F.expr("zval div 2048")
    )
    return ranked.select(
        "event_id",
        "ub",
        "hb",
        "zval",
        F.floor((F.col("rn") - 1) / ZORDER_ROWS_PER_FILE).cast("long").alias("file_id"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# B59: strict funnel analysis (first-occurrence ordering) (r7)
# ---------------------------------------------------------------------------
# The product-analytics staple: how many users progressed view → click →
# purchase, where each stage's FIRST occurrence must come strictly after
# the previous stage's first occurrence. One groupBy(user) computes all
# three first-occurrence timestamps (conditional min — map-side partials,
# single exchange on the uniform user key); stage membership is then pure
# row-local boolean algebra, and the final counts are one tiny aggregate.
# Conversion ratios follow the integer-ppm quantization contract.
FUNNEL_STAGES = ["view", "click", "purchase"]


@register(
    "events_funnel_strict",
    """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
), m AS (
  SELECT
    count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS s1,
    count(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 END) AS s2,
    count(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click THEN 1 END) AS s3
  FROM f
)
SELECT stage, stage_name, n_users,
       CAST(round(n_users * 1000000.0 / greatest(s1, 1)) AS BIGINT) AS conv_ppm
FROM (
  SELECT 1 AS stage, 'view' AS stage_name, CAST(s1 AS BIGINT) AS n_users, s1 FROM m
  UNION ALL SELECT 2, 'view>click', CAST(s2 AS BIGINT), s1 FROM m
  UNION ALL SELECT 3, 'view>click>purchase', CAST(s3 AS BIGINT), s1 FROM m
)
ORDER BY stage
""",
)
def events_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict three-stage funnel on first occurrences (B59): conditional
    first-timestamps per user in one aggregation, boolean stage algebra,
    ppm conversion vs stage 1."""
    ev = read_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    m = f.agg(
        F.count(F.when(s1, 1)).alias("s1"),
        F.count(F.when(s2, 1)).alias("s2"),
        F.count(F.when(s3, 1)).alias("s3"),
    )
    stages = [
        (1, "view", "s1"),
        (2, "view>click", "s2"),
        (3, "view>click>purchase", "s3"),
    ]
    rows = None
    for st, name, col in stages:
        r = m.select(
            F.lit(st).alias("stage"),
            F.lit(name).alias("stage_name"),
            F.col(col).cast("long").alias("n_users"),
            # greatest(s1,1): zero-'view' corpora yield 0, not NULL (house
            # div-zero guard, matching the oracle).
            F.round(F.col(col) * 1000000.0 / F.greatest(F.col("s1"), F.lit(1)), 0)
            .cast("long")
            .alias("conv_ppm"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.orderBy("stage")


# ---------------------------------------------------------------------------
# B60: cohort retention matrix (r7)
# ---------------------------------------------------------------------------
# The other analytics staple: users grouped by FIRST-SEEN day (their
# cohort), activity counted per (cohort, days-since-cohort) cell. Two
# aggregations on the uniform user key (first-seen, then the matrix), the
# cohort frame joined back broadcast-sized. Date arithmetic is pure
# integer day diffs; the cohort key is emitted as an ISO date STRING so
# neither engine's date/timestamp physical type leaks into the hash.


@register(
    "events_cohort_retention",
    """
WITH f AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cd FROM events GROUP BY user_id
)
SELECT CAST(f.cd AS VARCHAR) AS cohort_day,
       CAST(date_diff('day', f.cd, CAST(e.ts AS DATE)) AS BIGINT) AS days_since,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active_users
FROM events e JOIN f USING (user_id)
GROUP BY f.cd, days_since
ORDER BY cohort_day, days_since
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-by-day retention matrix (B60): first-seen date per user,
    distinct active users per (cohort_day, days_since) cell."""
    ev = read_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("cd"))
    return (
        ev.join(f, "user_id")
        .select(
            F.col("cd").cast("string").alias("cohort_day"),
            F.datediff(F.col("ts").cast("date"), F.col("cd")).cast("long").alias("days_since"),
            "user_id",
        )
        .groupBy("cohort_day", "days_since")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active_users"))
        .orderBy("cohort_day", "days_since")
    )


# ---------------------------------------------------------------------------
# B63: session co-occurrence pair mining (contrastive-pair source) (r8)
# ---------------------------------------------------------------------------
# The training-data shape behind co-click / co-view contrastive pairs
# (word2vec-style PMI over sessions): sessionize the event log (the B7
# 30-min-gap discipline), reduce each session to its DISTINCT item set
# (items = the props.k key), emit unordered co-occurring pairs, and score
# support + lift. Scale shape: sessionization is the one user_id
# exchange; the (session, item) reduction and the pair self-join key on
# the uniform (user, session) pair, so per-session fanout is bounded by
# (items per session)^2 — session length, never corpus size; item
# marginals are a tiny broadcast. Counts stay integers; lift is one IEEE
# divide of exact integers rounded to ppm (portable bit-for-bit).
COPAIR_MIN_SUPPORT = 3


@register(
    "session_copair_mining",
    f"""
WITH o AS (
  SELECT user_id, event_id, ts,
         CAST(json_extract_string(props, '$.k') AS INT) AS item,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > {SESSION_GAP_SEC}
                 THEN 1 ELSE 0 END AS is_new
  FROM o
), sessions AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
), si AS (
  SELECT DISTINCT user_id, session_id, item FROM sessions WHERE item IS NOT NULL
), s_total AS (
  SELECT count(DISTINCT (user_id, session_id)) AS s FROM sessions
), marg AS (
  SELECT item, count(*) AS c FROM si GROUP BY item
), pairs AS (
  SELECT a.item AS item_1, b.item AS item_2, count(*) AS co_sessions
  FROM si a JOIN si b
    ON a.user_id = b.user_id AND a.session_id = b.session_id AND a.item < b.item
  GROUP BY a.item, b.item
)
SELECT p.item_1, p.item_2, CAST(p.co_sessions AS BIGINT) AS co_sessions,
       CAST(round(p.co_sessions * t.s * 1000000.0 / (m1.c * m2.c)) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN marg m1 ON m1.item = p.item_1
JOIN marg m2 ON m2.item = p.item_2
CROSS JOIN s_total t
WHERE p.co_sessions >= {COPAIR_MIN_SUPPORT}
ORDER BY co_sessions DESC, item_1, item_2
LIMIT 100
""",
)
def session_copair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-occurring item pairs across user sessions with support and
    lift (B63): the contrastive-pair mining shape — sessionize, distinct
    items per session, bounded per-session pair fanout, integer support,
    ppm lift vs the independence baseline."""
    ev = read_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.col("prev_ts").cast("double")
    flagged = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .withColumn("prev_ts", F.lag("ts").over(order))
        .withColumn(
            "is_new",
            F.when(F.col("prev_ts").isNull() | (gap > SESSION_GAP_SEC), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    # ONE aggregation pass + in-row pair fanout (r14 opt): the previous
    # form cached the (session, item) table, ran a SEPARATE driver
    # action for the session total, and mined pairs via a self-join on
    # (user, session) — two shuffles of the item table plus a cache
    # materialization. Collecting each session's distinct items into a
    # sorted array makes the pair mine a bounded in-row combination
    # explode (items-per-session is small by construction — the same
    # bound the self-join fanout relied on), the marginals one explode,
    # and the session total a 1-row aggregate folded into the plan; no
    # cache, no driver scalar, one job.
    g = sessions.groupBy("user_id", "session_id").agg(
        F.array_sort(F.collect_set("item")).alias("items")
    )
    tot = g.agg(F.count("*").cast("long").alias("s_total"))
    marg = (
        g.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("c"))
    )
    combos = F.expr(
        "flatten(transform(items, (x, i) ->"
        " transform(slice(items, i + 2, size(items)), y ->"
        " struct(x AS item_1, y AS item_2))))"
    )
    pairs = (
        g.select(F.explode(combos).alias("pr"))
        .select("pr.item_1", "pr.item_2")
        .groupBy("item_1", "item_2")
        .agg(F.count("*").alias("co_sessions"))
        .filter(F.col("co_sessions") >= COPAIR_MIN_SUPPORT)
    )
    m1 = marg.select(F.col("item").alias("item_1"), F.col("c").alias("c1"))
    m2 = marg.select(F.col("item").alias("item_2"), F.col("c").alias("c2"))
    return (
        pairs.join(F.broadcast(m1), "item_1")
        .join(F.broadcast(m2), "item_2")
        .crossJoin(F.broadcast(tot))
        .select(
            "item_1",
            "item_2",
            F.col("co_sessions").cast("long").alias("co_sessions"),
            F.round(
                F.col("co_sessions") * F.col("s_total") * 1000000.0
                / (F.col("c1") * F.col("c2"))
            )
            .cast("long")
            .alias("lift_ppm"),
        )
        .orderBy(F.col("co_sessions").desc(), "item_1", "item_2")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# B66: as-of (point-in-time) join — purchase → latest prior engagement (r8)
# ---------------------------------------------------------------------------
# The temporal-enrichment primitive Spark has no native operator for
# (DuckDB: ASOF JOIN; kdb: aj): attach to each left row the single
# right-side row with the greatest timestamp at-or-before the left
# timestamp, per key. A naive `l JOIN r ON key AND r.ts <= l.ts` +
# rank plans as a per-user all-pairs product (and without an equi-key
# Spark falls back to BroadcastNestedLoop); the scalable mechanism is
# UNION-TAG + ONE WINDOW: tag both sides, union, and carry the last
# non-purchase row forward with last(..., ignorenulls) over a single
# user_id partitioning ordered by (ts, tag, event_id) — one uniform-key
# exchange, map-side within partitions, cost O(n log n_partition)
# regardless of how many right rows precede each left row. Ties at the
# same instant: engagement sorts BEFORE purchase (at-or-before
# semantics) and the max event_id wins — exactly the oracle's
# `ORDER BY ts DESC, event_id DESC` pick, so the match is
# deterministic. The ORACLE is the independent quadratic semantic
# (join-all-priors + rank), not a window translation. Gap is exact
# integer microseconds.
ASOF_ENGAGE_TYPES = ("view", "click")


@register(
    "events_asof_attribution",
    f"""
WITH src AS (
  SELECT event_id, user_id, ts, event_type FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), p AS (
  SELECT * FROM src WHERE event_type = 'purchase'
), e AS (
  SELECT * FROM src WHERE event_type <> 'purchase'
), m AS (
  SELECT p.event_id AS peid, e.event_id AS prior_event_id,
         e.event_type AS prior_event_type, e.ts AS prior_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM p JOIN e ON e.user_id = p.user_id AND e.ts <= p.ts
)
SELECT p.event_id, p.user_id,
       CAST(m.prior_event_id AS BIGINT) AS prior_event_id,
       m.prior_event_type,
       CAST(epoch_us(p.ts) - epoch_us(m.prior_ts) AS BIGINT) AS gap_us
FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON m.peid = p.event_id
ORDER BY p.event_id
""",
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined as-of to the user's most recent view/click at
    or before the purchase instant (B66): union-tag + one window instead
    of the quadratic prior-join the oracle replays; exact integer
    microsecond gap."""
    ev = read_table(spark, sf_dir, "events")
    src = ev.filter(
        F.col("event_type").isin(list(ASOF_ENGAGE_TYPES) + ["purchase"])
    ).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        (F.col("event_type") == "purchase").cast("int").alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    eng = F.col("tag") == 0
    carried = src.select(
        "event_id",
        "user_id",
        "ts",
        "tag",
        F.last(F.when(eng, F.col("event_id")), ignorenulls=True).over(w).alias("prior_event_id"),
        F.last(F.when(eng, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("prior_event_type"),
        F.last(F.when(eng, F.col("ts")), ignorenulls=True).over(w).alias("prior_ts"),
    )
    return (
        carried.filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            "prior_event_id",
            "prior_event_type",
            (F.unix_micros("ts") - F.unix_micros("prior_ts")).cast("long").alias("gap_us"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# B71: Markov event-type transition matrix (r9)
# --------------------------------------------------------------------------
# The sequence-model prior every behavioural pipeline fits first: order
# each user's stream, count (prev_type -> type) transitions, and emit the
# FULL V x V matrix with Laplace-smoothed probabilities in integer ppm —
# (cnt + 1) * 1e6 div (row_total + V) — so unobserved transitions carry
# their smoothed mass and the integer div is engine-identical. Scale
# shape: ONE user_id-partitioned lag window (the sessionize discipline),
# a uniform-key groupBy on (from, to) with map-side partials, and the
# V x V grid materialized by crossing the DISTINCT type table with
# itself — V is the event-type vocabulary (single digits to hundreds),
# so the grid and the per-row totals broadcast; nothing here grows with
# the event count except the one windowed pass.


@register(
    "events_markov_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), trans AS (
  SELECT prev_type AS from_type, event_type AS to_type, count(*) AS c
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), types AS (
  SELECT DISTINCT event_type AS t FROM events
), grid AS (
  SELECT a.t AS from_type, b.t AS to_type FROM types a CROSS JOIN types b
), vocab AS (
  SELECT count(*) AS v FROM types
), full_grid AS (
  SELECT g.from_type, g.to_type, CAST(coalesce(tr.c, 0) AS BIGINT) AS n_trans
  FROM grid g LEFT JOIN trans tr
    ON tr.from_type = g.from_type AND tr.to_type = g.to_type
), tot AS (
  SELECT from_type, sum(n_trans) AS row_total FROM full_grid GROUP BY from_type
)
SELECT f.from_type, f.to_type, f.n_trans,
       CAST((f.n_trans + 1) * 1000000 // (t.row_total + v.v) AS BIGINT) AS prob_ppm
FROM full_grid f JOIN tot t ON t.from_type = f.from_type CROSS JOIN vocab v
ORDER BY f.from_type, f.to_type
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-smoothed first-order Markov transition matrix over each
    user's time-ordered event stream (B71) — integer ppm probabilities,
    full V×V grid including unobserved transitions."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("c"))
    )
    types = ev.select(F.col("event_type").alias("t")).distinct()
    v = types.count()  # event-type vocabulary: bounded, collected once
    grid = types.select(F.col("t").alias("from_type")).crossJoin(
        types.select(F.col("t").alias("to_type"))
    )
    full = grid.join(F.broadcast(trans), ["from_type", "to_type"], "left").select(
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


# --------------------------------------------------------------------------
# B72: key-skew audit (r9)
# --------------------------------------------------------------------------
# The profiling pass a 100 TB engine runs BEFORE choosing a shuffle
# strategy: per stream partition key-space (here event_type), how skewed
# is the join/agg key (user_id)? Emits rows, distinct keys, the top-1 and
# top-10 key shares in ppm, and max/median per-key multiplicity in milli
# — exactly the numbers that decide broadcast vs salt vs AQE skew-join
# (events_salted_join_weighted is the downstream consumer of this
# decision). Median is the LOWER median by row_number — exact integer
# rank semantics, no engine-specific percentile interpolation. Scale
# shape: one uniform (type, key) count with map-side partials, then
# per-type ranking over the DISTINCT KEY table (bounded by key
# cardinality, not row count); shares are integer ppm divs.


@register(
    "events_key_skew_profile",
    """
WITH kc AS (
  SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, user_id, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c DESC, user_id) AS rd,
         row_number() OVER (PARTITION BY event_type ORDER BY c ASC, user_id) AS ra,
         count(*) OVER (PARTITION BY event_type) AS n_keys,
         sum(c) OVER (PARTITION BY event_type) AS n_rows
  FROM kc
)
SELECT event_type,
       CAST(max(n_rows) AS BIGINT) AS n_rows,
       CAST(max(n_keys) AS BIGINT) AS n_keys,
       CAST(max(CASE WHEN rd = 1 THEN c ELSE 0 END) * 1000000 // max(n_rows) AS BIGINT) AS top1_share_ppm,
       CAST(sum(CASE WHEN rd <= 10 THEN c ELSE 0 END) * 1000000 // max(n_rows) AS BIGINT) AS top10_share_ppm,
       CAST(max(CASE WHEN rd = 1 THEN c ELSE 0 END) * 1000
            // max(CASE WHEN ra = (n_keys + 1) // 2 THEN c ELSE 0 END) AS BIGINT) AS max_over_median_milli
FROM ranked
GROUP BY event_type
ORDER BY event_type
""",
)
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type skew audit of the user_id key space (B72): top-1 /
    top-10 key shares (ppm) and max/lower-median multiplicity (milli) —
    the broadcast-vs-salt decision inputs."""
    ev = read_table(spark, sf_dir, "events")
    kc = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("c"))
    wd = Window.partitionBy("event_type").orderBy(F.col("c").desc(), F.col("user_id"))
    wa = Window.partitionBy("event_type").orderBy(F.col("c").asc(), F.col("user_id"))
    wp = Window.partitionBy("event_type")
    ranked = kc.select(
        "event_type",
        "c",
        F.row_number().over(wd).alias("rd"),
        F.row_number().over(wa).alias("ra"),
        F.count("*").over(wp).alias("n_keys"),
        F.sum("c").over(wp).alias("n_rows"),
    )
    top1 = F.max(F.when(F.col("rd") == 1, F.col("c")).otherwise(F.lit(0)))
    med = F.max(
        F.when(F.col("ra") == (F.col("n_keys") + 1) / 2, F.col("c")).otherwise(F.lit(0))
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n_rows").cast("long").alias("n_rows"),
            F.max("n_keys").cast("long").alias("n_keys"),
            F.expr(
                "max(case when rd = 1 then c else 0 end) * 1000000"
                " div max(n_rows)"
            )
            .cast("long")
            .alias("top1_share_ppm"),
            F.expr(
                "sum(case when rd <= 10 then c else 0 end) * 1000000"
                " div max(n_rows)"
            )
            .cast("long")
            .alias("top10_share_ppm"),
            F.expr(
                "max(case when rd = 1 then c else 0 end) * 1000"
                " div max(case when ra = (n_keys + 1) div 2 then c else 0 end)"
            )
            .cast("long")
            .alias("max_over_median_milli"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# B73: per-user hourly burst detection (r9)
# --------------------------------------------------------------------------
# Rate-anomaly gate (abuse/bot filtering before events feed training
# data): bucket each user's events by hour, z-score every bucket against
# THAT USER's own hourly distribution, flag buckets with z >= 2. The
# z arithmetic is the B64/B67 integer discipline — per-user mean in
# micro-events via floor(x+0.5), sd via the CLAMPED variance residue
# (greatest(var, 0), the r8-ADVICE lesson) floored to >= 1 so an
# all-constant user degrades instead of NaN-ing — so both engines emit
# identical longs. Scale shape: (user, hour) count with map-side
# partials; user stats are a second uniform-key agg over the BUCKET
# table (bounded by users x active-hours, far below row count);
# broadcast-join stats back; the flag filter is map-side.


@register(
    "events_hourly_burst",
    """
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts, count(*) AS c
  FROM events GROUP BY 1, 2
), st AS (
  SELECT user_id,
         CAST(floor(sum(c) * 1000000.0 / count(*) + 0.5) AS BIGINT) AS mean_micro,
         greatest(CAST(floor(sqrt(greatest(sum(c * c) * 1.0 / count(*)
                                  - (sum(c) * 1.0 / count(*)) * (sum(c) * 1.0 / count(*)), 0.0))
                             * 1000000.0 + 0.5) AS BIGINT), 1) AS sd_micro
  FROM b GROUP BY user_id
)
SELECT b.user_id, b.hour_ts, CAST(b.c AS BIGINT) AS n_events,
       CAST(floor((b.c * 1000000 - st.mean_micro) * 1000.0 / st.sd_micro + 0.5) AS BIGINT) AS z_milli
FROM b JOIN st USING (user_id)
WHERE floor((b.c * 1000000 - st.mean_micro) * 1000.0 / st.sd_micro + 0.5) >= 2000
ORDER BY user_id, hour_ts
""",
)
def events_hourly_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly rate bursts (B73): buckets whose event count is
    >= 2 user-local standard deviations above that user's hourly mean;
    integer micro/milli z-scores, clamped variance."""
    ev = read_table(spark, sf_dir, "events")
    b = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour_ts")).agg(
        F.count("*").alias("c")
    )
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


# --------------------------------------------------------------------------
# B84-adjacent — B87: frequent event-sequence trigrams (r9, for r10)
# --------------------------------------------------------------------------
# Sequential-pattern mining at the depth the Markov matrix (B71) can't
# see: adjacent TYPE TRIPLES per user stream with a support floor —
# the "view → click → purchase" funnels discovered from data rather
# than declared (B59's funnel asks about a KNOWN sequence; this emits
# the frequent ones). Two lags in the SAME user window (one pass),
# uniform (t1,t2,t3) count keys, support filter before the final
# TakeOrdered.
SEQ3_MIN_SUPPORT = 10
SEQ3_TOPN = 20


@register(
    "events_sequence_trigrams",
    f"""
WITH seq AS (
  SELECT user_id, event_type AS t3,
         lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1
  FROM events
), tri AS (
  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_occ
  FROM seq WHERE t1 IS NOT NULL
  GROUP BY t1, t2, t3
)
SELECT t1, t2, t3, n_occ,
       row_number() OVER (ORDER BY n_occ DESC, t1, t2, t3) AS rnk
FROM tri WHERE n_occ >= {SEQ3_MIN_SUPPORT}
ORDER BY rnk LIMIT {SEQ3_TOPN}
""",
)
def events_sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} adjacent event-type triples with support >= {s} across
    user streams (B87) — discovered funnels; one window pass, two lags."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t3"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.lag("event_type", 2).over(w).alias("t1"),
    )
    tri = (
        seq.filter(F.col("t1").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").cast("long").alias("n_occ"))
        .filter(F.col("n_occ") >= SEQ3_MIN_SUPPORT)
    )
    top = tri.orderBy(F.col("n_occ").desc(), "t1", "t2", "t3").limit(SEQ3_TOPN)
    w2 = Window.orderBy(F.col("n_occ").desc(), "t1", "t2", "t3")
    return top.withColumn("rnk", F.row_number().over(w2).cast("long")).orderBy("rnk")
events_sequence_trigrams.__doc__ = events_sequence_trigrams.__doc__.replace("{n}", str(SEQ3_TOPN)).replace("{s}", str(SEQ3_MIN_SUPPORT))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B90: multi-touch attribution (linear + time-decay) (r9, for r10)
# --------------------------------------------------------------------------
# B66's as-of join credits ONE prior touch per purchase (last-touch);
# real attribution spreads credit across EVERY engagement in the
# lookback window. Two standard models side by side, both integer:
# linear = 1e6 div k ppm per touch (k = touches in the window), decay =
# 1e6 >> age_days (the B65 right-shift — halving per day, exact).
# Scale shape is the B42 bucketed interval join: each engagement
# explodes to the {w}+1 day buckets it can serve, the join runs on the
# UNIFORM (user_id, day) key with the exact ts-range filter applied
# after — join fanout is (w+1)·|E|, never |E|·|P| per user; the oracle
# replays the plain quadratic user join independently (the B66
# discipline: different algorithm, same answer).
ATTR_WINDOW_DAYS = 7
_ATTR_US_DAY = 86_400_000_000


@register(
    "events_multitouch_attribution",
    f"""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), e AS (
  SELECT event_id, user_id, ts, event_type FROM events
  WHERE event_type IN ('view', 'click')
), pair AS (
  SELECT p.event_id AS pid, e.event_type,
         CAST((epoch_us(p.ts) - epoch_us(e.ts)) // {_ATTR_US_DAY} AS INT) AS age_days
  FROM p JOIN e ON e.user_id = p.user_id
  WHERE e.ts <= p.ts AND epoch_us(p.ts) - epoch_us(e.ts) < {ATTR_WINDOW_DAYS} * {_ATTR_US_DAY}
), k AS (
  SELECT pid, CAST(count(*) AS BIGINT) AS k FROM pair GROUP BY pid
), credit AS (
  SELECT pr.event_type,
         CAST(1000000 // k.k AS BIGINT) AS linear_ppm,
         CAST(1000000 >> least(pr.age_days, 62) AS BIGINT) AS decay_w
  FROM pair pr JOIN k ON k.pid = pr.pid
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(linear_ppm) AS BIGINT) AS linear_credit_ppm,
       CAST(sum(decay_w) AS BIGINT) AS decay_credit
FROM credit
GROUP BY event_type
ORDER BY event_type
""",
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear and time-decay multi-touch purchase attribution over a
    {w}-day lookback (B90), aggregated per engagement type — bucketed
    interval join on (user, day); integer ppm / right-shift credits."""
    ev = read_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        (F.unix_micros("ts") / _ATTR_US_DAY).cast("long").alias("day"),
    )
    e = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts").alias("ets"),
        "event_type",
        (F.unix_micros("ts") / _ATTR_US_DAY).cast("long").alias("eday"),
    )
    # each engagement serves purchase-days eday .. eday + W (bounded fanout)
    e_b = e.select(
        "user_id",
        "ets",
        "event_type",
        F.explode(F.expr(f"sequence(eday, eday + {ATTR_WINDOW_DAYS})")).alias("day"),
    )
    pair = (
        p.join(e_b, ["user_id", "day"])
        .filter(
            (F.col("ets") <= F.col("pts"))
            & (
                F.unix_micros("pts") - F.unix_micros("ets")
                < ATTR_WINDOW_DAYS * _ATTR_US_DAY
            )
        )
        .select(
            "pid",
            "event_type",
            F.expr(f"cast((unix_micros(pts) - unix_micros(ets)) div {_ATTR_US_DAY} as int)").alias(
                "age_days"
            ),
        )
    )
    k = pair.groupBy("pid").agg(F.count("*").cast("long").alias("k"))
    credit = pair.join(k, "pid").select(
        "event_type",
        F.expr("1000000 div k").cast("long").alias("linear_ppm"),
        F.expr("shiftright(1000000, cast(least(age_days, 62) as int))")
        .cast("long")
        .alias("decay_w"),
    )
    return (
        credit.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum("linear_ppm").cast("long").alias("linear_credit_ppm"),
            F.sum("decay_w").cast("long").alias("decay_credit"),
        )
        .orderBy("event_type")
    )
events_multitouch_attribution.__doc__ = events_multitouch_attribution.__doc__.replace("{w}", str(ATTR_WINDOW_DAYS))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B91: session-intent conversion summary (r9, for r10) — the events
# capstone composition (the B22/B40 pipeline discipline applied to the
# behavioural family): sessionize (B7's lag+cumsum) → per-session facts
# (length, duration, contains-purchase) → grouped by the session's FIRST
# event type ("intent": what the user came to do) → conversion and
# engagement profile per intent. One user window drives everything
# (session id, first-type, all via the same partition), session facts are
# one uniform groupBy, the intent rollup is a |types|-key aggregate —
# three stages, one window pass, no stage rescans the events.
@register(
    "events_session_intent_summary",
    f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > {SESSION_GAP_SEC}
                 THEN 1 ELSE 0 END AS is_new
  FROM o
), sess AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
), facts AS (
  SELECT user_id, session_id,
         min(ts) AS t0, max(ts) AS t1,
         CAST(count(*) AS BIGINT) AS n_events,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         min(event_id) FILTER (WHERE is_new = 1) AS first_eid
  FROM sess GROUP BY user_id, session_id
), intent AS (
  SELECT f.*, s.event_type AS intent_type
  FROM facts f JOIN sess s ON s.user_id = f.user_id AND s.event_id = f.first_eid
)
SELECT intent_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) * 1000 // count(*) AS BIGINT) AS events_per_session_milli,
       CAST(sum(epoch_us(t1) - epoch_us(t0)) // (1000000 * count(*)) AS BIGINT) AS mean_duration_sec,
       CAST(sum(converted) * 1000000 // count(*) AS BIGINT) AS conversion_ppm
FROM intent
GROUP BY intent_type
ORDER BY intent_type
""",
)
def events_session_intent_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per session-intent (first event type) engagement and conversion
    profile (B91): sessions, events/session (milli), mean duration,
    purchase-conversion ppm — the composed events capstone."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "event_id", "ts", "event_type", F.lag("ts").over(w).alias("prev_ts")
    )
    # fractional-second gap via cast(double) — the sessionize/copair
    # convention matching DuckDB's epoch(); unix_timestamp FLOORS and can
    # flip the boundary (the mean_duration_sec lesson, same class)
    gap = F.col("ts").cast("double") - F.col("prev_ts").cast("double")
    flagged = o.withColumn(
        "is_new",
        F.when(F.col("prev_ts").isNull() | (gap > SESSION_GAP_SEC), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    facts = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
        F.count("*").cast("long").alias("n_events"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
        F.min(F.when(F.col("is_new") == 1, F.col("event_id"))).alias("first_eid"),
    )
    intent = facts.join(
        sess.select("user_id", F.col("event_id").alias("first_eid"), F.col("event_type").alias("intent_type")),
        ["user_id", "first_eid"],
    )
    return (
        intent.groupBy("intent_type")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.expr("sum(n_events) * 1000 div count(*)").cast("long").alias("events_per_session_milli"),
            # microsecond-exact on BOTH engines: unix_timestamp truncates
            # subseconds (epoch() doesn't) — off-by-one at some SFs
            F.expr("sum(unix_micros(t1) - unix_micros(t0)) div (1000000 * count(*))")
            .cast("long")
            .alias("mean_duration_sec"),
            F.expr("sum(converted) * 1000000 div count(*)").cast("long").alias("conversion_ppm"),
        )
        .orderBy("intent_type")
    )


# --------------------------------------------------------------------------
# B98: winsorized robust value stats (r9, for r10)
# --------------------------------------------------------------------------
# Revenue/metric pipelines clip tails before averaging (a fat-finger
# refund or test purchase poisons a plain mean). Winsorization bounds
# come from EXACT rank order statistics — the k-th smallest where
# k = ceil(0.05 n) / ceil(0.95 n), row_number under a (value, event_id)
# total order — NOT percentile interpolation (the B72/B86 discipline),
# so both engines pick the identical boundary rows; values clamp into
# [lo, hi] and aggregate as exact integer cents. One window per type
# over the type's own rows + one groupBy.
@register(
    "events_value_winsorized",
    """
WITH v AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, event_id, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
), bounds AS (
  SELECT event_type,
         max(CASE WHEN rk = CAST(ceil(n * 0.05) AS BIGINT) THEN cents END) AS lo,
         max(CASE WHEN rk = CAST(ceil(n * 0.95) AS BIGINT) THEN cents END) AS hi
  FROM ranked GROUP BY event_type
)
SELECT r.event_type, CAST(max(r.n) AS BIGINT) AS n_values,
       CAST(max(b.lo) AS BIGINT) AS lo_cents, CAST(max(b.hi) AS BIGINT) AS hi_cents,
       CAST(sum(least(greatest(r.cents, b.lo), b.hi)) // max(r.n) AS BIGINT) AS winsorized_mean_cents,
       CAST(sum(r.cents) // max(r.n) AS BIGINT) AS raw_mean_cents
FROM ranked r JOIN bounds b ON b.event_type = r.event_type
GROUP BY r.event_type
ORDER BY r.event_type
""",
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 5/95-winsorized vs raw mean of event value in exact
    integer cents (B98) — exact-rank boundaries, no percentile
    interpolation."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    wr = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wp = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wp).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rk") == F.ceil(F.col("n") * 0.05), F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rk") == F.ceil(F.col("n") * 0.95), F.col("cents"))).alias("hi"),
    )
    return (
        ranked.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_values"),
            F.max("lo").cast("long").alias("lo_cents"),
            F.max("hi").cast("long").alias("hi_cents"),
            F.expr("sum(least(greatest(cents, lo), hi)) div max(n)")
            .cast("long")
            .alias("winsorized_mean_cents"),
            F.expr("sum(cents) div max(n)").cast("long").alias("raw_mean_cents"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# B100: sliding-window distinct users (exact; the HLL-mergeable audit twin)
# --------------------------------------------------------------------------
# Concurrency/reach over sliding windows — each event belongs to exactly
# two 1h windows on a 30m grid, so the op is a 2x flatMap + one distinct
# + one groupBy (no self-join, no per-window rescan). Window starts are
# integer epoch-second arithmetic: floor(epoch/1800) is invariant to the
# Spark-floors-vs-DuckDB-keeps subsecond difference (floor(floor(x)/k) ==
# floor(x/k)), the lesson from the r9 timestamp bug. At 100 TB the same
# shape holds: the distinct shuffles on (win, user) — uniform keys — and
# the production path swaps exact distinct for per-bucket HLL sketches
# unioned across the two covering windows (events_distinct_users_approx
# is the sketch-fidelity baseline).
@register(
    "events_sliding_distinct_users",
    """
WITH mapped AS (
  SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - offs.o AS win_start_epoch,
         user_id, event_id
  FROM events, (SELECT unnest([0, 1800]) AS o) offs
)
SELECT win_start_epoch,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM mapped
GROUP BY win_start_epoch
ORDER BY win_start_epoch
""",
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users + event counts per sliding 1h/30m window
    (B100) — 2x window-replication flatMap, one (win,user) distinct."""
    ev = read_table(spark, sf_dir, "events")
    mapped = (
        ev.select(F.col("ts").cast("double").alias("sec"), "user_id")
        .select("sec", "user_id", F.explode(F.array(F.lit(0), F.lit(1800))).alias("o"))
        .select(
            (F.floor(F.col("sec") / 1800).cast("long") * 1800 - F.col("o")).alias(
                "win_start_epoch"
            ),
            "user_id",
        )
    )
    return (
        mapped.groupBy("win_start_epoch")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count("*").cast("long").alias("n_events"),
        )
        .orderBy("win_start_epoch")
    )


# --------------------------------------------------------------------------
# B101: CUPED-adjusted experiment readout
# --------------------------------------------------------------------------
# The A/B-test readout a training-data platform's eval loop runs: arms
# from user_id parity, pre-period covariate X (value before Jan 15) and
# post-period outcome Y per user, theta = cov(X,Y)/var(X) pooled, and the
# variance-reduced mean of Y - theta*(X - xbar) per arm. Determinism: the
# five covariance inputs (n, Sx, Sy, Sxy, Sxx) are EXACT integer-cent
# sums (order-independent), theta is ONE scalar double expression over
# them (identical IEEE ops in both engines) quantized once to milli, and
# the per-user adjustment is pure integer arithmetic after that. A
# zero-variance X degrades to theta=0 (guarded in both dialects — the
# knn_whitened_topk NaN lesson). At 100 TB the bigint Sxy/Sxx products
# would be upgraded to DECIMAL(38,0) sums; one user-keyed shuffle + one
# single-row broadcast is the whole plan.
@register(
    "events_cuped_adjusted",
    """
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(sum(CASE WHEN ts <  TIMESTAMP '2024-01-15 00:00:00'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL GROUP BY user_id
), stats AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM per_user
), theta AS (
  SELECT n, sx,
         CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n <= 0 THEN 0
              ELSE CAST(floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                              / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                              * 1000 + 0.5) AS BIGINT) END AS theta_milli,
         sx // n AS xbar_cents
  FROM stats
)
SELECT p.arm,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(max(t.theta_milli) AS BIGINT) AS theta_milli,
       CAST(sum(p.y) * 1000 // count(*) AS BIGINT) AS raw_mean_milli,
       CAST(sum(p.y * 1000 - t.theta_milli * (p.x - t.xbar_cents)) // count(*) AS BIGINT)
         AS cuped_mean_milli
FROM per_user p, theta t
GROUP BY p.arm
ORDER BY p.arm
""",
)
def events_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced per-arm outcome means (B101) — exact
    integer covariance inputs, one scalar theta, integer adjustment."""
    ev = read_table(spark, sf_dir, "events")
    t0 = F.lit("2024-01-15 00:00:00").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < t0, cents).otherwise(F.lit(0))).alias("x"),
            F.sum(F.when(F.col("ts") >= t0, cents).otherwise(F.lit(0))).alias("y"),
        )
        .select((F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    stats = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    theta = stats.select(
        F.expr(
            "CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n <= 0"
            " THEN 0"
            " ELSE CAST(floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)"
            " / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)"
            " * 1000 + 0.5) AS BIGINT) END"
        ).alias("theta_milli"),
        F.expr("sx div n").alias("xbar_cents"),
    )
    return (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("arm")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.max("theta_milli").cast("long").alias("theta_milli"),
            F.expr("sum(y) * 1000 div count(*)").cast("long").alias("raw_mean_milli"),
            F.expr("sum(y * 1000 - theta_milli * (x - xbar_cents)) div count(*)")
            .cast("long")
            .alias("cuped_mean_milli"),
        )
        .orderBy("arm")
    )


def hourly_type_counts(ev: DataFrame) -> DataFrame:
    """(event_type, day, hod) event counts — the shared input of B108,
    B116, and the streaming seasonal-count state."""
    return (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .groupBy("event_type", "day", "hod")
        .agg(F.count("*").cast("long").alias("n"))
    )


def densify_hourly_grid(hourly: DataFrame) -> DataFrame:
    """Densify an (event_type, day, hod, n) count table onto the full
    type x day x 24-hour grid with zero-filled cells — the ONE grid
    builder shared by B108, B116, and the streaming read path
    (`stream_ops.seasonal_anomaly_from_state`), so the densify contract
    can't drift between twins. Types/days derive from the count table
    itself (identical to deriving from raw events: the groupBy drops no
    key). Bounded output: |types| x |days| x 24."""
    spark = hourly.sparkSession
    # hourly feeds THREE consumers (types, days, the grid join) and the
    # report built on top fans out further — checkpoint the bounded
    # (type, day, hod, n) table once so the raw-events groupBy behind it
    # never re-executes per branch (r14 opt; benefits B108/B116 and the
    # streaming read twins alike).
    hourly = hourly.localCheckpoint(eager=True)
    types = hourly.select("event_type").distinct()
    days = hourly.select("day").distinct()
    hours = spark.range(24).select(F.col("id").cast("int").alias("hod"))
    grid = types.crossJoin(days).crossJoin(F.broadcast(hours))
    return grid.join(hourly, ["event_type", "day", "hod"], "left").select(
        "event_type", "day", "hod", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )


def seasonal_anomaly_report(hourly: DataFrame) -> DataFrame:
    """B108's densify/median/MAD/gate pipeline from an (event_type, day,
    hod, n) count table — shared verbatim by the batch query and the
    streaming state read path."""
    dense = densify_hourly_grid(hourly)
    med = dense.groupBy("event_type", "hod").agg(
        (F.lit(2) * F.expr("percentile(n, 0.5)")).cast("long").alias("med2")
    )
    dev = dense.join(F.broadcast(med), ["event_type", "hod"]).select(
        "event_type",
        "day",
        "hod",
        "n",
        "med2",
        F.abs(F.lit(2) * F.col("n") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("event_type", "hod").agg(
        (F.lit(2) * F.expr("percentile(dev2, 0.5)")).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), ["event_type", "hod"])
        .filter(F.lit(2) * F.col("dev2") > F.lit(3) * F.greatest("mad4", F.lit(4)))
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            "hod",
            F.col("n").alias("n_events"),
            "med2",
            "mad4",
            F.when(F.lit(2) * F.col("n") > F.col("med2"), "high").otherwise("low").alias("side"),
        )
        .orderBy("event_type", "day", "hod")
    )


# --------------------------------------------------------------------------
# B108: seasonal (hour-of-day) anomaly gate — robust baseline per cell
# --------------------------------------------------------------------------
# The ops-side twin of B52's robust outlier gate, time-structured: each
# (event_type, hour-of-day) cell gets a MEDIAN daily-count baseline and a
# MAD spread over the observed day span, and hours whose count deviates
# more than 3 MAD are flagged with their side. Two details that matter:
# the (type, date, hour) grid is DENSIFIED first (a quiet hour is a zero
# observation, not a missing one — otherwise the median biases high and
# real outages can't be flagged), and the MAD gets an integer floor of
# one count unit (a perfectly regular cell has MAD 0; without the floor
# every nonzero deviation would flag). Integer-parity contract identical
# to B52: carry 2*median and 4*MAD as exact integers, compare
# 2*dev2 > 3*greatest(mad4, 4). Scale shape: the event scan reduces
# map-side onto (type, date, hour) keys; everything after is per-cell
# arithmetic over |types|*24 baseline rows, broadcast back.
@register(
    "events_seasonal_anomaly",
    """
WITH hourly AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(extract(hour FROM ts) AS INT) AS hod,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
), grid AS (
  SELECT t.event_type, d.day, CAST(h.hod AS INT) AS hod
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d
  CROSS JOIN (SELECT unnest(range(24)) AS hod) h
), dense AS (
  SELECT g.event_type, g.day, g.hod, CAST(coalesce(hh.n, 0) AS BIGINT) AS n
  FROM grid g LEFT JOIN hourly hh
    ON hh.event_type = g.event_type AND hh.day = g.day AND hh.hod = g.hod
), med AS (
  SELECT event_type, hod, CAST(2 * quantile_cont(n, 0.5) AS BIGINT) AS med2
  FROM dense GROUP BY event_type, hod
), dev AS (
  SELECT d.event_type, d.day, d.hod, d.n, m.med2,
         abs(2 * d.n - m.med2) AS dev2
  FROM dense d JOIN med m ON m.event_type = d.event_type AND m.hod = d.hod
), mad AS (
  SELECT event_type, hod, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
  FROM dev GROUP BY event_type, hod
)
SELECT v.event_type, CAST(v.day AS VARCHAR) AS day, v.hod, v.n AS n_events, v.med2, m.mad4,
       CASE WHEN 2 * v.n > v.med2 THEN 'high' ELSE 'low' END AS side
FROM dev v JOIN mad m ON m.event_type = v.event_type AND m.hod = v.hod
WHERE 2 * v.dev2 > 3 * greatest(m.mad4, 4)
ORDER BY v.event_type, v.day, v.hod
""",
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal anomaly gate (B108): densified (type, day,
    hour) counts vs an exact 2*median/4*MAD per-cell baseline with a
    one-count MAD floor."""
    ev = read_table(spark, sf_dir, "events")
    return seasonal_anomaly_report(hourly_type_counts(ev))


def rfm_quintile_scores(u: DataFrame) -> DataFrame:
    """Quintile R/F/M scores over a (user_id, r_days, f_n, m_cents) frame —
    the ONE definition shared by the batch query and the streaming read
    path (`streaming.stream_ops.rfm_from_state`), so batch≡stream parity
    can't drift when either side is edited.

    Each score is ``ntile(5) OVER (ORDER BY value [DESC], user_id)``
    computed exactly, never via a single-partition sort of the user
    dimension (the prior shape ran three global ntile windows —
    10⁸–10⁹ users through one task, three times, at 100 TB of events).
    R and F use the broadcast two-form (``with_exact_ntile``) — recency
    days and purchase counts have genuinely bounded distinct
    cardinality, now ENFORCED in-plan. M uses the RANGE form
    (``with_exact_ntile_range``): per-user revenue cents are
    near-unique, so the per-value count table is itself user-dimension-
    sized and must never broadcast (ADVICE r10) — literal quantile
    boundaries bucket the cents and the rank is bucket-local.

    Pass-count discipline (r14 optimization, supersedes the VERDICT r12
    #1 scratch spill): the M form rides a LAZY sign-safe log bucket
    (``bucket_expr`` — monotone non-decreasing in cents, ≤ ~700 buckets
    over the whole int64 range, the ``customer_revenue_pareto``
    discipline), so there is NO boundary-sketch action and NO scratch
    write; the whole triple-score query is ONE job. Every count branch
    (M's bucket counts, R's and F's per-value tables) is rooted at the
    SAME input aggregate (``stats_df=u``), so in-job ReusedExchange
    collapses them onto one upstream execution — the r14 basket lesson:
    spill only what several JOBS consume, trust in-job reuse otherwise.
    Measured at sf0.1: 2.2 s (spill+sketch+final, 3 jobs) → ~0.9 s
    (1 job); the executed plan holds one events exchange, reused 3×."""
    from ..operators.quantiles import (
        sign_safe_log_bucket,
        with_exact_ntile,
        with_exact_ntile_range,
    )

    base = u
    u = with_exact_ntile_range(
        base, 5, "m_cents", "user_id", "m_score",
        bucket_expr=sign_safe_log_bucket("m_cents"),
    )
    u = with_exact_ntile(
        u, 5, "r_days", "user_id", "r_score", descending=True, stats_df=base
    )
    u = with_exact_ntile(u, 5, "f_n", "user_id", "f_score", stats_df=base)
    return u.select(
        "user_id", "r_days", "f_n", "m_cents", "r_score", "f_score", "m_score"
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# B113: user RFM feature construction (the feature-store staple)
# --------------------------------------------------------------------------
# Recency / Frequency / Monetary features per user over valued purchase
# events, plus 1-5 quintile scores — the canonical behavioral feature
# block an ML platform materializes before any model sees a user. All
# three raw features are exact integers (days via epoch-us integer
# division against the corpus max instant — one 1-row broadcast; cents
# via the round(value*100) quantization); the quintile scores are ntile
# under total orders with user_id tie-breaks (deterministic both
# engines; higher = better, so recency orders DESC). Scale shape: one
# user-keyed groupBy; the three quintiles run the exact-rank two-form
# (rfm_quintile_scores -> with_exact_ntile), never a global window.
def rfm_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-spill (user_id, r_days, f_n, m_cents) aggregate
    ``events_user_rfm`` writes to its one-shot scratch parquet — exposed
    so the pushdown plan test audits the ACTUAL spill-producing plan
    rather than a hand-reconstructed equivalent (ADVICE r13)."""
    ev = read_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("t1"))
    return (
        ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.expr("(max(t1) - max(unix_micros(ts))) div 86400000000")
            .cast("long")
            .alias("r_days"),
            F.count("*").cast("long").alias("f_n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("m_cents"),
        )
    )


@register(
    "events_user_rfm",
    """
WITH mx AS (SELECT max(epoch_us(ts)) AS t1 FROM events),
u AS (
  SELECT user_id,
         CAST((max(mx.t1) - max(epoch_us(ts))) // 86400000000 AS BIGINT) AS r_days,
         CAST(count(*) AS BIGINT) AS f_n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m_cents
  FROM events, mx
  WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, r_days, f_n, m_cents,
       CAST(ntile(5) OVER (ORDER BY r_days DESC, user_id) AS BIGINT) AS r_score,
       CAST(ntile(5) OVER (ORDER BY f_n, user_id) AS BIGINT) AS f_score,
       CAST(ntile(5) OVER (ORDER BY m_cents, user_id) AS BIGINT) AS m_score
FROM u
ORDER BY user_id
""",
)
def events_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RFM features + quintile scores over valued purchases
    (B113) — exact integer recency/frequency/monetary, deterministic
    quintiles via the exact-rank two-form (no corpus-global window).

    The user aggregate is eagerly checkpointed before scoring (r15,
    VERDICT r14 item 5): the r14 all-lazy form LOOKED like one events
    exchange reused 3×, but the EXECUTED adaptive plan (plans/r15/
    events_user_rfm_executed_before.txt) scans events 20 times with only
    5 ReusedExchange — AQE does not collapse the differently-pruned
    scans, and at 100 TB that is 20 corpus reads. The checkpoint is
    |users|-bounded (the frame every branch actually consumes — NOT the
    corpus-sized spills that measured slower in r14), so events is read
    once and the three ntile branches re-root at the in-memory user
    table."""
    u = rfm_user_features(spark, sf_dir).localCheckpoint(eager=True)
    return rfm_quintile_scores(u)


# --------------------------------------------------------------------------
# B114: forward-window label construction (leakage-safe training labels)
# --------------------------------------------------------------------------
# The supervised-learning prep step where leakage bugs live: for every
# anchor event (a 'view'), the label is "did this user purchase within
# the NEXT 3 days" — strictly (t, t+3d], never >= t (an anchor must not
# label itself or anything concurrent), in exact epoch-microsecond
# integer arithmetic so the boundary is the same row in both engines.
# Composes with B97: the grouped split keys by user so anchor and its
# labeling purchases land in one split. Scale shape: a user-keyed
# equi-join (per-user event counts are bounded; a hot user salts per
# B68's discipline) + one anchor-keyed count — at 100 TB the B42
# time-bucket interval join replaces the raw range predicate.
LABEL_WINDOW_US = 3 * 86_400_000_000


@register(
    "events_label_window",
    f"""
WITH anchors AS (
  SELECT event_id, user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'view'
), purch AS (
  SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'
), lab AS (
  SELECT a.event_id, a.user_id, count(p.t) AS n_pos
  FROM anchors a LEFT JOIN purch p
    ON p.user_id = a.user_id AND p.t > a.t AND p.t <= a.t + {LABEL_WINDOW_US}
  GROUP BY a.event_id, a.user_id
)
SELECT event_id, user_id, CAST(n_pos AS BIGINT) AS n_purchases_3d,
       n_pos > 0 AS label
FROM lab
ORDER BY event_id
""",
)
def events_label_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-3d purchase labels for every view anchor (B114) — strict
    (t, t+3d] integer-microsecond window, leakage-safe by construction."""
    ev = read_table(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_micros("ts").alias("p_t")
    )
    lab = (
        anchors.join(
            purch,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_t") > F.col("t"))
            & (F.col("p_t") <= F.col("t") + LABEL_WINDOW_US),
            "left",
        )
        .groupBy("event_id", "user_id")
        .agg(F.count("p_t").alias("n_pos"))
    )
    return lab.select(
        "event_id",
        "user_id",
        F.col("n_pos").cast("long").alias("n_purchases_3d"),
        (F.col("n_pos") > 0).alias("label"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# B116: forecast-baseline backtest (naive vs seasonal, MAE per type)
# --------------------------------------------------------------------------
# Before anyone ships a traffic forecast, the platform answers "which
# trivial baseline is this beating?": backtest (a) the NAIVE forecast —
# yesterday's count for the same hour — against (b) the SEASONAL one —
# the hour-of-day median (B108's baseline, in-sample by construction and
# documented as such) — over the densified (type, day, hour) grid, and
# report each one's mean absolute error per event type in comparable
# integer units (2000x MAE, because the median is an exact half-integer:
# both errors carry the x2). Cells without a predecessor day are
# excluded from BOTH baselines so the comparison is apples-to-apples.
# Determinism: counts/medians are the B108 integers; the lag is a
# row-lag over the densified per-(type,hod) day series (every day
# present, so row-lag == calendar-lag); MAE is exact integer division.
# Scale shape: B108's grid + one lag window over |types|*24 short
# series + one groupBy(type).
@register(
    "events_forecast_backtest",
    """
WITH hourly AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(extract(hour FROM ts) AS INT) AS hod,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
), grid AS (
  SELECT t.event_type, d.day, CAST(h.hod AS INT) AS hod
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d
  CROSS JOIN (SELECT unnest(range(24)) AS hod) h
), dense AS (
  SELECT g.event_type, g.day, g.hod, CAST(coalesce(hh.n, 0) AS BIGINT) AS n
  FROM grid g LEFT JOIN hourly hh
    ON hh.event_type = g.event_type AND hh.day = g.day AND hh.hod = g.hod
), med AS (
  SELECT event_type, hod, CAST(2 * quantile_cont(n, 0.5) AS BIGINT) AS med2
  FROM dense GROUP BY event_type, hod
), lagged AS (
  SELECT d.event_type, d.hod, d.n, m.med2,
         lag(d.n) OVER (PARTITION BY d.event_type, d.hod ORDER BY d.day) AS prev_n
  FROM dense d JOIN med m ON m.event_type = d.event_type AND m.hod = d.hod
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(2 * abs(n - prev_n)) * 1000 // count(*) AS BIGINT) AS mae2_naive_milli,
       CAST(sum(abs(2 * n - med2)) * 1000 // count(*) AS BIGINT) AS mae2_seasonal_milli,
       CASE WHEN sum(2 * abs(n - prev_n)) < sum(abs(2 * n - med2)) THEN 'naive'
            WHEN sum(2 * abs(n - prev_n)) > sum(abs(2 * n - med2)) THEN 'seasonal'
            ELSE 'tie' END AS winner
FROM lagged
WHERE prev_n IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive (yesterday same hour) vs seasonal (hour-of-day median)
    forecast MAE per event type over the densified grid (B116), in
    comparable 2000x-MAE integer milli units."""
    ev = read_table(spark, sf_dir, "events")
    dense = densify_hourly_grid(hourly_type_counts(ev))
    med = dense.groupBy("event_type", "hod").agg(
        (F.lit(2) * F.expr("percentile(n, 0.5)")).cast("long").alias("med2")
    )
    wl = Window.partitionBy("event_type", "hod").orderBy("day")
    lagged = dense.join(F.broadcast(med), ["event_type", "hod"]).select(
        "event_type",
        "hod",
        "n",
        "med2",
        F.lag("n").over(wl).alias("prev_n"),
    )
    return (
        lagged.filter(F.col("prev_n").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.expr("sum(2 * abs(n - prev_n)) * 1000 div count(*)")
            .cast("long")
            .alias("mae2_naive_milli"),
            F.expr("sum(abs(2 * n - med2)) * 1000 div count(*)")
            .cast("long")
            .alias("mae2_seasonal_milli"),
            F.expr(
                "CASE WHEN sum(2 * abs(n - prev_n)) < sum(abs(2 * n - med2)) THEN 'naive'"
                " WHEN sum(2 * abs(n - prev_n)) > sum(abs(2 * n - med2)) THEN 'seasonal'"
                " ELSE 'tie' END"
            ).alias("winner"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# B118: Kaplan-Meier survival curve (signup -> first purchase, censored)
# --------------------------------------------------------------------------
# Time-to-event analytics done RIGHT — the naive "average days to
# purchase among purchasers" silently drops every user who hasn't
# purchased YET (survivorship bias); the product-limit estimator
# (Kaplan & Meier 1958) uses them as right-censored observations: each
# user contributes duration = days from first signup to first
# subsequent purchase (event) or to corpus end (censored); at each
# event day t, S(t) *= (1 - d_t/n_t) with n_t the at-risk count
# (censored users leave AFTER their day — the standard convention).
# Determinism: durations are epoch-us integer divisions; the at-risk
# counts come from one cumulative window over the per-day leave table;
# the product runs in LOG space with per-step micro quantization
# (floor(ln((n-d)/n)*1e6+0.5) — exact int sums between steps, the B33
# transcendental convention) and one exp at read-out; a d=n step pins
# the term at -30e6 (e^-30 -> 0 ppm) so survival collapses to 0 in both
# dialects instead of -inf. Scale shape: one user groupBy builds
# (duration, is_event); everything after is windows over ~|days| rows.
@register(
    "events_survival_km",
    """
WITH mx AS (SELECT max(epoch_us(ts)) AS t1 FROM events),
su AS (
  SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), fp AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS tp
  FROM events e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > su.t0
  GROUP BY e.user_id
), durs AS (
  SELECT su.user_id,
         CASE WHEN fp.tp IS NOT NULL
              THEN CAST((fp.tp - su.t0) // 86400000000 AS BIGINT)
              ELSE CAST((mx.t1 - su.t0) // 86400000000 AS BIGINT) END AS dur,
         fp.tp IS NOT NULL AS is_event
  FROM su LEFT JOIN fp ON fp.user_id = su.user_id, mx
), byday AS (
  SELECT dur AS day,
         CAST(count(*) AS BIGINT) AS n_leaving,
         CAST(sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT) AS n_events
  FROM durs GROUP BY dur
), risk AS (
  SELECT day, n_events,
         CAST((SELECT count(*) FROM durs)
              - coalesce(sum(n_leaving) OVER (ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_at_risk
  FROM byday
), steps AS (
  SELECT day, n_events, n_at_risk,
         CASE WHEN n_events >= n_at_risk THEN CAST(-30000000 AS BIGINT)
              ELSE CAST(floor(ln((n_at_risk - n_events) * 1.0 / n_at_risk) * 1000000 + 0.5)
                        AS BIGINT) END AS ln_micro
  FROM risk WHERE n_events > 0
)
SELECT day, n_at_risk, n_events,
       CAST(floor(exp((sum(ln_micro) OVER (ORDER BY day
                       ROWS UNBOUNDED PRECEDING)) / 1000000.0) * 1000000 + 0.5) AS BIGINT)
         AS s_ppm
FROM steps
ORDER BY day
""",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of signup→first-purchase with right
    censoring at corpus end (B118) — log-space micro-quantized
    product-limit steps."""
    ev = read_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("t1"))
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t0"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("tp"))
        .join(su, "user_id")
        .filter(F.col("tp") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tp").alias("tp"))
    )
    durs = (
        su.join(fp, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.expr(
                "CASE WHEN tp IS NOT NULL THEN (tp - t0) div 86400000000"
                " ELSE (t1 - t0) div 86400000000 END"
            )
            .cast("long")
            .alias("dur"),
            F.col("tp").isNotNull().alias("is_event"),
        )
    )
    byday = durs.groupBy(F.col("dur").alias("day")).agg(
        F.count("*").cast("long").alias("n_leaving"),
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).cast("long").alias("n_events"),
    )
    # n_at_risk = total − Σ(earlier leavers) ≡ the REVERSE cumulative sum
    # over [day, end] — so the separate driver count() action (and the
    # checkpoint it forced) disappears; one window over the |days|-row
    # aggregate computes it in-plan (r14 opt).
    wfrom = Window.orderBy("day").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    risk = byday.select(
        "day",
        "n_events",
        F.sum("n_leaving").over(wfrom).cast("long").alias("n_at_risk"),
    )
    steps = risk.filter(F.col("n_events") > 0).select(
        "day",
        "n_events",
        "n_at_risk",
        F.expr(
            "CASE WHEN n_events >= n_at_risk THEN CAST(-30000000 AS BIGINT)"
            " ELSE CAST(floor(ln((n_at_risk - n_events) * 1.0 / n_at_risk) * 1000000 + 0.5)"
            " AS BIGINT) END"
        ).alias("ln_micro"),
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        steps.select(
            "day",
            "n_at_risk",
            "n_events",
            F.floor(F.exp(F.sum("ln_micro").over(wcum) / 1000000.0) * 1000000 + 0.5)
            .cast("long")
            .alias("s_ppm"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# B122: point-in-time join against the SCD2 dimension (temporal PIT join)
# --------------------------------------------------------------------------
# The feature-store join that makes B48's SCD2 history USEFUL: for every
# purchase, look up the state interval containing ts - 1us — "what was
# the user doing just before buying" (the minus-one-microsecond probe is
# the PIT discipline itself: probing AT ts would self-match the
# purchase's own run, the classic PIT off-by-one that leaks the label
# into the feature). Purchases opening a user's history match nothing →
# 'none'. Aggregated to conversion-source states with exact cents. The
# oracle reuses the registered B48 SQL verbatim as the dimension CTE
# (the B107 cannot-drift pattern). Scale shape: the dim build is B48's
# one user-keyed exchange; the probe is a user-keyed equi-join whose
# interval predicate touches each user's own (bounded) intervals — B42
# time-bucketing replaces the raw range predicate at 100 TB.
from ..queries import REGISTRY as _EQ_REGISTRY  # noqa: E402


def _pit_oracle() -> str:
    return f"""
WITH dim AS ({_EQ_REGISTRY["events_scd2_user_state"].oracle}),
p AS (
  SELECT user_id, epoch_us(ts) AS t, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
), probed AS (
  SELECT coalesce(d.event_type, 'none') AS prior_state, p.cents
  FROM p LEFT JOIN dim d
    ON d.user_id = p.user_id
   AND epoch_us(d.valid_from) <= p.t - 1
   AND (d.valid_to IS NULL OR epoch_us(d.valid_to) > p.t - 1)
)
SELECT prior_state,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM probed
GROUP BY prior_state
ORDER BY prior_state
"""


@register("events_scd2_pit_join", _pit_oracle())
def events_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-source states via a point-in-time join of purchases
    against the B48 SCD2 dimension at ts - 1us (B122) — the PIT probe
    that cannot self-match."""
    ev = read_table(spark, sf_dir, "events")
    dim = scd2_build(ev).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("prior_state"),
        F.unix_micros("valid_from").alias("vf"),
        F.unix_micros("valid_to").alias("vt"),
    )
    p = ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull()).select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    probed = p.join(
        dim,
        (F.col("d_user") == F.col("user_id"))
        & (F.col("vf") <= F.col("t") - 1)
        & (F.col("vt").isNull() | (F.col("vt") > F.col("t") - 1)),
        "left",
    ).select(F.coalesce("prior_state", F.lit("none")).alias("prior_state"), "cents")
    return (
        probed.groupBy("prior_state")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("prior_state")
    )


# --------------------------------------------------------------------------
# B124: sliding-window distinct users, HLL sketch path (rows-only)
# --------------------------------------------------------------------------
# The scale path B100's docstring promises: the same 2x window
# replication, but per-window approx_count_distinct (HyperLogLog++,
# rsd 2%) instead of the exact distinct — the form that holds when a
# window's user set no longer fits a shuffle partition. Registered
# ROWS-ONLY (HLL is engine-specific; there is no cross-engine value
# oracle) with the exact twin as its accuracy oracle in pytest: per
# window, |approx - exact| / exact must stay within 5x the configured
# rsd. At 100 TB the per-window sketches are the mergeable state the
# B96 sink would persist (HLL union is associative) — the exact/(win,
# user)-key state of stream_sliding_distinct swaps for sketch bytes.
@register("events_sliding_distinct_hll", None)
def events_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate (HLL++, rsd 2%) distinct users per sliding 1h/30m
    window (B124) — the sketch path of events_sliding_distinct_users."""
    ev = read_table(spark, sf_dir, "events")
    mapped = (
        ev.select(F.col("ts").cast("double").alias("sec"), "user_id")
        .select("sec", "user_id", F.explode(F.array(F.lit(0), F.lit(1800))).alias("o"))
        .select(
            (F.floor(F.col("sec") / 1800).cast("long") * 1800 - F.col("o")).alias(
                "win_start_epoch"
            ),
            "user_id",
        )
    )
    return (
        mapped.groupBy("win_start_epoch")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).cast("long").alias("n_users_approx"),
            F.count("*").cast("long").alias("n_events"),
        )
        .orderBy("win_start_epoch")
    )


# ---------------------------------------------------------------------------
# B125: sample-ratio-mismatch (SRM) chi-square check (r9)
# ---------------------------------------------------------------------------
# The first gate of any A/B readout: users hash into two arms (the B31
# seeded-md5 discipline — the SAME deterministic assignment an experiment
# platform would ship), and per event_type the arm sizes are tested for
# a 50/50 split with the 2-cell chi-square, which collapses to the pure
# integer form (u0-u1)^2 / n — no doubles anywhere, so the statistic is
# exact in micro units on both engines. srm_flag fires above the 95th
# percentile critical value 3.841459 (chi2, 1 dof). Scale shape: arm
# assignment is a map-side expression on user_id, the distinct is one
# (event_type, user_id) shuffle on uniform keys, and the final agg is
# |event_type| rows — at 100 TB nothing here grows beyond the distinct,
# which is the same reach shuffle events_sliding_distinct_users runs.
@register(
    "events_srm_check",
    """
WITH ua AS (
  SELECT DISTINCT event_type, user_id,
         CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm
  FROM events
), arms AS (
  SELECT event_type,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS users_arm0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS users_arm1
  FROM ua GROUP BY event_type
)
SELECT event_type, users_arm0, users_arm1,
       CAST((1000000 * (users_arm0 - users_arm1) * (users_arm0 - users_arm1))
            // (users_arm0 + users_arm1) AS BIGINT) AS chi2_micro,
       CAST(CASE WHEN (1000000 * (users_arm0 - users_arm1) * (users_arm0 - users_arm1))
                      // (users_arm0 + users_arm1) > 3841459
                 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM arms
ORDER BY event_type
""",
)
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type sample-ratio-mismatch chi-square over seeded-md5
    arm assignment (B125) — exact integer 2-cell statistic in micro
    units, flagged against the 3.841 critical value."""
    ev = read_table(spark, sf_dir, "events")
    ua = ev.select(
        "event_type",
        "user_id",
        F.expr(
            "cast(conv(substring(md5(concat('srm:', cast(user_id as string))), 1, 8), 16, 10)"
            " as bigint) % 2"
        ).alias("arm"),
    ).distinct()
    arms = ua.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("users_arm0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("users_arm1"),
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


# ---------------------------------------------------------------------------
# B126: Theil-Sen robust daily-count trend (r9)
# ---------------------------------------------------------------------------
# Median-of-pairwise-slopes trend per event_type (Theil 1950 / Sen 1968)
# — the robust alternative to OLS that one crawler outage day cannot
# drag. The pair join is over DAILY AGGREGATES, so its size is bounded
# by days^2 per type (30 days -> 435 pairs) and is INDEPENDENT of the
# event row count — the only full-data pass is the day-count groupBy.
# Slopes quantize once to floor(1e6 * dc / dd) (floor on both engines —
# integer `div`/`//` disagree on negative operands), and the median is
# the exact lower rank (n+1)//2 with (slope, d1, d2) tie-breaks. At
# 100 TB the daily-count table is ~|types| * |days| rows — driver-tiny —
# so the quadratic stage never leaves broadcast territory.
@register(
    "events_theilsen_trend",
    """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT)
), pairs AS (
  SELECT a.event_type,
         CAST(floor(1000000.0 * (b.c - a.c) / (b.d - a.d)) AS BIGINT) AS slope_micro,
         a.d AS d1, b.d AS d2
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.d > a.d
), ranked AS (
  SELECT event_type, slope_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope_micro, d1, d2) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM pairs
)
SELECT r.event_type,
       CAST(count(DISTINCT dd.d) AS BIGINT) AS n_days,
       CAST(max(r.n) AS BIGINT) AS n_pairs,
       CAST(max(CASE WHEN r.rk = (r.n + 1) // 2 THEN r.slope_micro END) AS BIGINT)
         AS trend_micro_per_day
FROM ranked r JOIN daily dd ON dd.event_type = r.event_type
GROUP BY r.event_type
ORDER BY r.event_type
""",
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen median-of-slopes daily-count trend per event_type
    (B126) — pairwise slopes over daily aggregates (days^2, row-count
    independent), exact lower-median rank in integer micro units."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("d"),
    ).agg(F.count("*").cast("long").alias("c"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.floor(1000000.0 * (F.col("b.c") - F.col("a.c")) / (F.col("b.d") - F.col("a.d")))
        .cast("long")
        .alias("slope_micro"),
        F.col("a.d").alias("d1"),
        F.col("b.d").alias("d2"),
    )
    wr = Window.partitionBy("event_type").orderBy("slope_micro", "d1", "d2")
    wp = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope_micro",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wp).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.max(F.when(F.col("rk") == F.expr("(n + 1) div 2"), F.col("slope_micro")))
        .cast("long")
        .alias("trend_micro_per_day"),
    )
    ndays = daily.groupBy("event_type").agg(F.countDistinct("d").cast("long").alias("n_days"))
    return (
        med.join(F.broadcast(ndays), "event_type")
        .select("event_type", "n_days", "n_pairs", "trend_micro_per_day")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B127: cohort lifetime-value (LTV) curves (r9)
# ---------------------------------------------------------------------------
# The revenue twin of events_cohort_retention: users cohort by first-
# event week, revenue accumulates by cohort age in weeks, and the
# running sum per cohort is the LTV curve an analyst reads off. All
# money stays in exact integer cents (round(value*100) once); the
# cumulative window is per-cohort over <= |weeks| rows, so the only
# full-data passes are the per-user min(ts) and the (cohort, age)
# groupBy — both uniform-key shuffles. At 100 TB cohorts are ~52 keys a
# year and the curve table is cohorts x ages — driver-tiny output from
# arbitrarily large input, the ideal rollup shape.
@register(
    "events_cohort_ltv",
    """
WITH firstw AS (
  SELECT user_id,
         CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_week
  FROM events GROUP BY user_id
), rev AS (
  SELECT f.cohort_week,
         CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_week AS age_weeks,
         CAST(round(e.value * 100) AS BIGINT) AS cents,
         e.user_id
  FROM events e JOIN firstw f ON f.user_id = e.user_id
  WHERE e.value IS NOT NULL
), grid AS (
  SELECT cohort_week, age_weeks,
         CAST(sum(cents) AS BIGINT) AS revenue_cents,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
  FROM rev GROUP BY cohort_week, age_weeks
), sized AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
  FROM firstw GROUP BY cohort_week
)
SELECT g.cohort_week, g.age_weeks, s.cohort_users, g.n_active_users,
       g.revenue_cents,
       CAST(sum(g.revenue_cents) OVER (PARTITION BY g.cohort_week
                                       ORDER BY g.age_weeks
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_ltv_cents
FROM grid g JOIN sized s ON s.cohort_week = g.cohort_week
ORDER BY g.cohort_week, g.age_weeks
""",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-week x age-week revenue and cumulative LTV in exact
    integer cents (B127) — the revenue twin of the retention matrix."""
    ev = read_table(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.floor(F.min(F.col("ts").cast("double")) / 604800).cast("long").alias("cohort_week")
    )
    rev = (
        ev.filter(F.col("value").isNotNull())
        .join(firstw, "user_id")
        .select(
            "cohort_week",
            (
                F.floor(F.col("ts").cast("double") / 604800).cast("long") - F.col("cohort_week")
            ).alias("age_weeks"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "user_id",
        )
    )
    grid = rev.groupBy("cohort_week", "age_weeks").agg(
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.countDistinct("user_id").cast("long").alias("n_active_users"),
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


# ---------------------------------------------------------------------------
# B128: CUSUM change-point detection on the daily count series (r9)
# ---------------------------------------------------------------------------
# The classic offline CUSUM scan: residuals against the global daily
# mean accumulate, and the day where |cusum| peaks is the single best
# level-shift split (Page 1954's statistic in its exact offline form).
# Integer trick: scaling residuals by D (r_d = c_d * D - T where T is
# the total over D days) clears the mean's division entirely — every
# cusum value is an exact BIGINT on both engines, no epsilon anywhere.
# The full-data pass is one day groupBy; the window runs over <= |days|
# rows (a deliberate single-partition window over an already-reduced
# table, the same shape as the seasonal grid ops). At 100 TB the day
# table is 365 rows/year — the scan cost lives in the groupBy, which is
# the minimal pass any daily rollup already pays.
@register(
    "events_cusum_changepoint",
    """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(floor(epoch(ts) / 86400) AS BIGINT)
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(c) AS BIGINT) AS t FROM daily
), cs AS (
  SELECT d.d, d.c,
         CAST(sum(d.c * tt.nd - tt.t) OVER (ORDER BY d.d
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cusum_scaled
  FROM daily d CROSS JOIN tot tt
), mx AS (
  SELECT max(abs(cusum_scaled)) AS peak FROM cs
)
SELECT cs.d AS day_epoch_days, cs.c AS n_events, cs.cusum_scaled,
       CAST(CASE WHEN abs(cs.cusum_scaled) = mx.peak
                  AND cs.d = (SELECT min(c2.d) FROM cs c2, mx m2
                              WHERE abs(c2.cusum_scaled) = m2.peak)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_changepoint
FROM cs CROSS JOIN mx
ORDER BY cs.d
""",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM level-shift scan over daily event counts (B128) —
    D-scaled integer residuals (no mean division), exact BIGINT cusum,
    earliest-peak change-point flag."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    tot = daily.agg(
        F.count("*").cast("long").alias("nd"), F.sum("c").cast("long").alias("t")
    )
    # window over the already-reduced day table (<= |days| rows): the
    # single-partition WindowExec here is deliberate, not a scale bug.
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cs = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "c",
            F.sum(F.col("c") * F.col("nd") - F.col("t")).over(wc).cast("long").alias(
                "cusum_scaled"
            ),
        )
    )
    peak = cs.agg(
        F.max(F.abs(F.col("cusum_scaled"))).alias("peak")
    )
    flagged = cs.crossJoin(F.broadcast(peak))
    first_peak = (
        flagged.filter(F.abs(F.col("cusum_scaled")) == F.col("peak"))
        .agg(F.min("d").alias("cp_day"))
    )
    return (
        flagged.crossJoin(F.broadcast(first_peak))
        .select(
            F.col("d").alias("day_epoch_days"),
            F.col("c").alias("n_events"),
            "cusum_scaled",
            F.when(
                (F.abs(F.col("cusum_scaled")) == F.col("peak"))
                & (F.col("d") == F.col("cp_day")),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("is_changepoint"),
        )
        .orderBy("day_epoch_days")
    )


# ---------------------------------------------------------------------------
# B136: signup -> purchase conversion-lag histogram (r9)
# ---------------------------------------------------------------------------
# The funnel's missing time axis: not IF users convert (funnel_strict)
# but HOW LONG they take. Per user, the first signup and the first
# purchase at-or-after it reduce in ONE user-key aggregate (min +
# conditional min — no join, no window), the lag buckets into the
# standard growth-dashboard bands, and non-converters land in an
# explicit 'never' bucket so shares sum to 1e6. Lags are exact integer
# microseconds (timestamp casts are microsecond-exact doubles in both
# engines). Shape at 100 TB: one shuffle on user_id, then a 6-key agg —
# the same reach pass any per-user rollup pays; output is 6 rows.
@register(
    "events_conversion_lag",
    """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
  FROM events GROUP BY user_id
), lagd AS (
  SELECT p.user_id,
         CAST(floor(min(CASE WHEN e.event_type = 'purchase' AND e.ts >= p.s_ts
                             THEN epoch(e.ts) - epoch(p.s_ts) END)) AS BIGINT) AS lag_sec
  FROM per_user p JOIN events e ON e.user_id = p.user_id
  WHERE p.s_ts IS NOT NULL
  GROUP BY p.user_id
), bucketed AS (
  SELECT CASE WHEN lag_sec IS NULL THEN 5
              WHEN lag_sec < 3600 THEN 0
              WHEN lag_sec < 21600 THEN 1
              WHEN lag_sec < 86400 THEN 2
              WHEN lag_sec < 604800 THEN 3
              ELSE 4 END AS bucket_order
  FROM lagd
), counts AS (
  SELECT bucket_order, CAST(count(*) AS BIGINT) AS n_users FROM bucketed GROUP BY bucket_order
), tot AS (
  SELECT CAST(sum(n_users) AS BIGINT) AS t FROM counts
)
SELECT b.bucket_order,
       CASE b.bucket_order WHEN 0 THEN 'lt_1h' WHEN 1 THEN '1h_6h'
            WHEN 2 THEN '6h_24h' WHEN 3 THEN '1d_7d' WHEN 4 THEN 'ge_7d'
            ELSE 'never' END AS bucket,
       coalesce(c.n_users, 0) AS n_users,
       CAST(coalesce(c.n_users, 0) * 1000000 // greatest(t.t, 1) AS BIGINT) AS share_micro
FROM (SELECT unnest([0, 1, 2, 3, 4, 5]) AS bucket_order) b
LEFT JOIN counts c USING (bucket_order) CROSS JOIN tot t
ORDER BY b.bucket_order
""",
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of first-signup -> first-subsequent-purchase lag (B136)
    — one user-key aggregate, exact integer seconds, explicit 'never'
    bucket so shares sum to 1e6."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts")
    )
    lagd = (
        ev.join(per_user.filter(F.col("s_ts").isNotNull()), "user_id")
        .groupBy("user_id")
        .agg(
            F.floor(
                F.min(
                    F.when(
                        (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("s_ts")),
                        F.col("ts").cast("double") - F.col("s_ts").cast("double"),
                    )
                )
            )
            .cast("long")
            .alias("lag_sec")
        )
    )
    bucketed = lagd.select(
        F.when(F.col("lag_sec").isNull(), 5)
        .when(F.col("lag_sec") < 3600, 0)
        .when(F.col("lag_sec") < 21600, 1)
        .when(F.col("lag_sec") < 86400, 2)
        .when(F.col("lag_sec") < 604800, 3)
        .otherwise(4)
        .alias("bucket_order")
    )
    counts = bucketed.groupBy("bucket_order").agg(F.count("*").cast("long").alias("n_users"))
    tot = counts.agg(F.sum("n_users").cast("long").alias("t"))
    grid = spark.createDataFrame([(i,) for i in range(6)], "bucket_order int")
    labels = F.when(F.col("bucket_order") == 0, "lt_1h") \
        .when(F.col("bucket_order") == 1, "1h_6h") \
        .when(F.col("bucket_order") == 2, "6h_24h") \
        .when(F.col("bucket_order") == 3, "1d_7d") \
        .when(F.col("bucket_order") == 4, "ge_7d") \
        .otherwise("never")
    return (
        grid.join(F.broadcast(counts), "bucket_order", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket_order").cast("int").alias("bucket_order"),
            labels.alias("bucket"),
            F.coalesce(F.col("n_users"), F.lit(0)).cast("long").alias("n_users"),
            F.expr("coalesce(n_users, 0) * 1000000 div greatest(t, 1)").cast("long").alias("share_micro"),
        )
        .orderBy("bucket_order")
    )


# ---------------------------------------------------------------------------
# B137: daily P50/P95 value bands per event_type (r9)
# ---------------------------------------------------------------------------
# The ops-dashboard percentile ribbon: exact-rank P50/P95 of event
# value per (event_type, day) in integer cents — the two-level grouped
# form of the corpus percentile ops, and the exact twin the production
# approx_percentile sketch would be audited against. Exact ranks use
# the house ceil(n*q) discipline (no interpolation, engine-identical).
# Shape: one (type, day, cents) shuffle, ranks via a (type, day)
# window — uniform keys, ~|types|x|days| output rows; at 100 TB the
# window state per key is the day's row count, which is exactly the
# partition a per-day sketch would hold anyway.
@register(
    "events_daily_value_bands",
    """
WITH v AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(round(value * 100) AS BIGINT) AS cents,
         event_id
  FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, d, cents,
         row_number() OVER (PARTITION BY event_type, d ORDER BY cents, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type, d) AS n
  FROM v
)
SELECT event_type, d AS day_epoch_days, CAST(max(n) AS BIGINT) AS n_values,
       CAST(max(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT) THEN cents END) AS BIGINT) AS p50_cents,
       CAST(max(CASE WHEN rk = CAST(ceil(n * 0.95) AS BIGINT) THEN cents END) AS BIGINT) AS p95_cents
FROM ranked
GROUP BY event_type, d
ORDER BY event_type, d
""",
)
def events_daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-rank daily P50/P95 value bands per event_type in integer
    cents (B137) — the grouped percentile ribbon a latency/value
    dashboard draws."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    wr = Window.partitionBy("event_type", "d").orderBy("cents", "event_id")
    wp = Window.partitionBy("event_type", "d")
    ranked = v.select(
        "event_type",
        "d",
        "cents",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wp).alias("n"),
    )
    return (
        ranked.groupBy("event_type", F.col("d").alias("day_epoch_days"))
        .agg(
            F.max("n").cast("long").alias("n_values"),
            F.max(F.when(F.col("rk") == F.ceil(F.col("n") * 0.5), F.col("cents")))
            .cast("long")
            .alias("p50_cents"),
            F.max(F.when(F.col("rk") == F.ceil(F.col("n") * 0.95), F.col("cents")))
            .cast("long")
            .alias("p95_cents"),
        )
        .orderBy("event_type", "day_epoch_days")
    )


# ---------------------------------------------------------------------------
# B138: per-user sequence anomaly via a trigram LM over event types (r9)
# ---------------------------------------------------------------------------
# The behavioral twin of the CCNet perplexity gate (B33): train an
# add-one-smoothed trigram model over EVERY user's event-type sequence,
# then score each user by average surprise — bots and broken clients
# emit transition patterns the population model finds expensive.
# Sequences order by (ts, event_id) with '^' boundary padding via lag
# defaults; V (the smoothing vocabulary) is measured from the data.
# Per-trigram surprise ln((c2+V)/(c3+1)) quantizes ONCE to micro-nats
# (the B75/B33 discipline) before the per-user sum, so both engines add
# identical integers. Shape: two lag windows on user_id (uniform), a
# trigram-type groupBy whose key space is |types|^3 (tiny — broadcast
# back), one user-key agg, TakeOrderedAndProject top-10.
@register(
    "events_sequence_anomaly",
    """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         coalesce(lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), '^') AS p1,
         coalesce(lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id), '^') AS p2
  FROM events
), vocab AS (
  SELECT CAST(count(DISTINCT cur) AS BIGINT) AS v FROM seq
), c3 AS (
  SELECT p2, p1, cur, CAST(count(*) AS BIGINT) AS n3 FROM seq GROUP BY p2, p1, cur
), c2 AS (
  SELECT p2, p1, CAST(sum(n3) AS BIGINT) AS n2 FROM c3 GROUP BY p2, p1
), scored AS (
  SELECT s.user_id,
         CAST(round(ln((c2.n2 + vv.v) * 1.0 / (c3.n3 + 1)) * 1000000.0) AS BIGINT) AS surprise_micro
  FROM seq s
  JOIN c3 ON c3.p2 = s.p2 AND c3.p1 = s.p1 AND c3.cur = s.cur
  JOIN c2 ON c2.p2 = s.p2 AND c2.p1 = s.p1
  CROSS JOIN vocab vv
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(surprise_micro) * 1.0 / count(*)) AS BIGINT) AS anomaly_micro_nats
FROM scored
GROUP BY user_id
ORDER BY anomaly_micro_nats DESC, user_id
LIMIT 10
""",
)
def events_sequence_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by average trigram-LM surprise over their event-type
    sequence (B138) — add-one smoothing, measured vocabulary, micro-nat
    quantization before the per-user sum."""
    ev = read_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.coalesce(F.lag("event_type", 1).over(wu), F.lit("^")).alias("p1"),
        F.coalesce(F.lag("event_type", 2).over(wu), F.lit("^")).alias("p2"),
    )
    vocab = seq.agg(F.countDistinct("cur").cast("long").alias("v"))
    c3 = seq.groupBy("p2", "p1", "cur").agg(F.count("*").cast("long").alias("n3"))
    c2 = c3.groupBy("p2", "p1").agg(F.sum("n3").cast("long").alias("n2"))
    scored = (
        seq.join(F.broadcast(c3), ["p2", "p1", "cur"])
        .join(F.broadcast(c2), ["p2", "p1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "user_id",
            F.round(
                F.log((F.col("n2") + F.col("v")) * 1.0 / (F.col("n3") + 1)) * 1000000.0
            )
            .cast("long")
            .alias("surprise_micro"),
        )
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("surprise_micro") * 1.0 / F.count("*"))
            .cast("long")
            .alias("anomaly_micro_nats"),
        )
        .orderBy(F.col("anomaly_micro_nats").desc(), F.col("user_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# B141: DAU/MAU stickiness ratio per day (r9)
# ---------------------------------------------------------------------------
# The engagement dashboard's headline ratio: daily active users over
# monthly active users, per day. DAU is a (day, user) distinct; MAU is
# a calendar-month distinct joined by month — two reach passes of the
# kind this family already pays, both uniform-key. The ratio is exact
# integer micro. At 100 TB both distincts swap for the HLL sketches the
# B96 sink maintains (union across days IS the month sketch — the
# mergeable-state argument), which is why the exact op keys state by
# (bucket, user) exactly like stream_sliding_distinct.
@register(
    "events_user_stickiness",
    """
WITH dau AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(DISTINCT user_id) AS BIGINT) AS dau,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY CAST(floor(epoch(ts) / 86400) AS BIGINT)
), mau AS (
  SELECT date_trunc('month', ts) AS m,
         CAST(count(DISTINCT user_id) AS BIGINT) AS mau
  FROM events GROUP BY date_trunc('month', ts)
)
SELECT d.d AS day_epoch_days, d.dau, m.mau, d.n_events,
       CAST(d.dau * 1000000 // m.mau AS BIGINT) AS stickiness_micro
FROM dau d JOIN mau m
  ON date_trunc('month', to_timestamp(d.d * 86400)) = m.m
ORDER BY d.d
""",
)
def events_user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day in integer micro units (B141) — two
    uniform-key reach distincts joined on calendar month."""
    ev = read_table(spark, sf_dir, "events")
    dau = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("d")
    ).agg(
        F.countDistinct("user_id").cast("long").alias("dau"),
        F.count("*").cast("long").alias("n_events"),
    )
    mau = ev.groupBy(F.date_trunc("month", F.col("ts")).alias("m")).agg(
        F.countDistinct("user_id").cast("long").alias("mau")
    )
    return (
        dau.join(
            F.broadcast(mau),
            F.date_trunc("month", F.timestamp_seconds(F.col("d") * 86400)) == F.col("m"),
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


# ---------------------------------------------------------------------------
# B144: inter-arrival burstiness per event type (Goh-Barabasi) (r9)
# ---------------------------------------------------------------------------
# Bot forensics without a distribution fit: for a Poisson process the
# inter-arrival CV is exactly 1, machine-regular traffic drives it
# toward 0, human burst-and-silence drives it above 1 — and the
# burstiness B = (cv - 1)/(cv + 1) (Goh & Barabasi, EPL 2008) maps that
# to [-1, 1]. Gaps are integer SECONDS between a user's consecutive
# events of a type (per-user lag windows — uniform keys; the per-type
# global sequence would put a whole type in one sort), sums and sums of
# squares are exact BIGINTs (86400^2 * corpus fits comfortably), and
# the two doubles at the end (sqrt of an exact integer, one division)
# follow the CUPED floor(x+0.5) discipline. No exp(), no libm risk.
@register(
    "events_interarrival_burstiness",
    """
WITH gaps AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id, event_type
                                                           ORDER BY ts, event_id))) AS BIGINT) AS gap_s
  FROM events
), g AS (
  SELECT event_type, gap_s FROM gaps WHERE gap_s IS NOT NULL
), stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(gap_s) AS BIGINT) AS s, CAST(sum(gap_s * gap_s) AS BIGINT) AS ssq
  FROM g GROUP BY event_type
)
SELECT event_type, n AS n_gaps,
       CAST(s // n AS BIGINT) AS mean_gap_sec,
       CAST(CASE WHEN s = 0 THEN 0
                 ELSE floor(sqrt(CAST(CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s AS DOUBLE)) / s * 1000000 + 0.5) END
            AS BIGINT) AS cv_micro,
       CAST(CASE WHEN s = 0 THEN -1000000
                 ELSE floor((sqrt(CAST(CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s AS DOUBLE)) - s)
                            / (sqrt(CAST(CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s AS DOUBLE)) + s) * 1000000 + 0.5) END
            AS BIGINT) AS burstiness_micro
FROM stats
ORDER BY event_type
""",
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival CV and Goh-Barabasi burstiness in integer
    micro units (B144) — per-(user, type) lag gaps in whole seconds,
    exact BIGINT moment sums, sqrt-of-integer at the end."""
    ev = read_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.floor(F.col("ts").cast("double"))
            - F.floor(F.lag("ts").over(wu).cast("double"))
        )
        .cast("long")
        .alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    stats = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("gap_s").cast("long").alias("s"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("long").alias("ssq"),
    )
    # n*ssq exceeds int64 once month-long gaps square into the moment sum;
    # decimal(38,0) keeps the difference exact (DuckDB side uses HUGEINT),
    # and exact-decimal -> double is correctly rounded in both engines.
    dec = "decimal(38,0)"
    sd_num = F.sqrt(
        (
            F.col("n").cast(dec) * F.col("ssq").cast(dec)
            - F.col("s").cast(dec) * F.col("s").cast(dec)
        ).cast("double")
    )
    return (
        stats.select(
            "event_type",
            F.col("n").alias("n_gaps"),
            F.expr("s div n").cast("long").alias("mean_gap_sec"),
            F.when(F.col("s") == 0, F.lit(0))
            .otherwise(F.floor(sd_num / F.col("s") * 1000000 + 0.5))
            .cast("long")
            .alias("cv_micro"),
            F.when(F.col("s") == 0, F.lit(-1000000))
            .otherwise(F.floor((sd_num - F.col("s")) / (sd_num + F.col("s")) * 1000000 + 0.5))
            .cast("long")
            .alias("burstiness_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B145: lag-24h autocorrelation of hourly counts (r9)
# ---------------------------------------------------------------------------
# Does traffic repeat daily? Pearson r between the hourly-count series
# and itself shifted 24 hours, per event type, on a DENSIFIED hour grid
# (missing hours are real zeros — skipping them would fabricate
# correlation, the B108 densify lesson). The grid derives from the
# global [min, max] hour — one scalar aggregate — so the series join is
# grid x types rows, tiny against the count pass. Moment sums over the
# paired series are exact BIGINTs; Pearson evaluates once per type in
# doubles with the floor(x+0.5) quantization. Near +1 means strong
# daily seasonality (the seasonal-baseline ops' premise, now measured
# instead of assumed); near 0 says hour-of-day carries no signal.
@register(
    "events_hourly_autocorr24",
    """
WITH bounds AS (
  SELECT CAST(min(floor(epoch(ts) / 3600)) AS BIGINT) AS h0,
         CAST(max(floor(epoch(ts) / 3600)) AS BIGINT) AS h1
  FROM events
), grid AS (
  SELECT t.event_type, CAST(g.h AS BIGINT) AS h
  FROM (SELECT DISTINCT event_type FROM events) t,
       bounds b, unnest(range(b.h0, b.h1 + 1)) AS g(h)
), counts AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT)
), series AS (
  SELECT g.event_type, g.h, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c ON c.event_type = g.event_type AND c.h = g.h
), paired AS (
  SELECT a.event_type, a.c AS x, b.c AS y
  FROM series a JOIN series b ON b.event_type = a.event_type AND b.h = a.h + 24
), stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
  FROM paired GROUP BY event_type
)
SELECT event_type, n AS n_pairs,
       CAST(CASE WHEN (n * sxx - sx * sx) <= 0 OR (n * syy - sy * sy) <= 0 THEN 0
                 ELSE floor((CAST(n * sxy - sx * sy AS DOUBLE))
                            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) * 1000000 + 0.5) END
            AS BIGINT) AS autocorr24_micro
FROM stats
ORDER BY event_type
""",
)
def events_hourly_autocorr24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-24h Pearson autocorrelation of densified hourly counts per
    event type in integer micro units (B145) — measured daily
    seasonality; exact integer moment sums, one double formula per
    type."""
    ev = read_table(spark, sf_dir, "events")
    hcol = F.floor(F.col("ts").cast("double") / 3600).cast("long")
    bounds = ev.agg(
        F.min(hcol).alias("h0"), F.max(hcol).alias("h1")
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"))
    )
    counts = ev.groupBy("event_type", hcol.alias("h")).agg(
        F.count("*").cast("long").alias("c")
    )
    series = grid.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
    )
    a = series.alias("a")
    b = series.alias("b")
    paired = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.h") == F.col("a.h") + 24),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.c").alias("x"),
        F.col("b.c").alias("y"),
    )
    stats = paired.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        stats.select(
            "event_type",
            F.col("n").alias("n_pairs"),
            F.when((vx <= 0) | (vy <= 0), F.lit(0))
            .otherwise(
                F.floor(
                    cov.cast("double") / F.sqrt(vx.cast("double")) / F.sqrt(vy.cast("double"))
                    * 1000000
                    + 0.5
                )
            )
            .cast("long")
            .alias("autocorr24_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B147: time-constrained funnel (each step within a max lag) (r9)
# ---------------------------------------------------------------------------
# The windowed variant of events_funnel_strict: a click only counts
# within FUNNEL_LAG of the view, a purchase within FUNNEL_LAG of that
# click — the "did the journey happen as one intent" question product
# teams actually ask (unconstrained funnels credit conversions weeks
# apart). Two-phase reduce: t_view is one user-key aggregate, then the
# view-anchored conditional mins need the anchor, so a second pass
# joins it back — two uniform user-key shuffles total, no window over
# raw events. Timestamps compare as microsecond-exact double seconds.
FUNNEL_LAG_SEC = 86400


@register(
    "events_funnel_windowed",
    f"""
WITH v AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY user_id
), c AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'click' AND e.ts > v.t_view
                   AND epoch(e.ts) - epoch(v.t_view) <= {FUNNEL_LAG_SEC}
                  THEN e.ts END) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE v.t_view IS NOT NULL
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.t_click
                   AND epoch(e.ts) - epoch(c.t_click) <= {FUNNEL_LAG_SEC}
                  THEN e.ts END) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE c.t_click IS NOT NULL
  GROUP BY e.user_id
), m AS (
  SELECT (SELECT count(*) FROM v WHERE t_view IS NOT NULL) AS s1,
         (SELECT count(*) FROM c WHERE t_click IS NOT NULL) AS s2,
         (SELECT count(*) FROM p WHERE t_purchase IS NOT NULL) AS s3
)
SELECT stage, stage_name, n_users,
       CAST(round(n_users * 1000000.0 / greatest(s1, 1)) AS BIGINT) AS conv_ppm
FROM (
  SELECT 1 AS stage, 'view' AS stage_name, CAST(s1 AS BIGINT) AS n_users, s1 FROM m
  UNION ALL SELECT 2, 'view>click<=24h', CAST(s2 AS BIGINT), s1 FROM m
  UNION ALL SELECT 3, 'click>purchase<=24h', CAST(s3 AS BIGINT), s1 FROM m
)
ORDER BY stage
""",
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage funnel where each step must land within 24h of its
    anchor (B147) — two-phase conditional-min reduce, view-anchored then
    click-anchored; ppm conversion vs stage 1."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    sec = lambda c: F.col(c).cast("double")  # noqa: E731
    c = (
        ev.join(v.filter(F.col("t_view").isNotNull()), "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view"))
                    & (sec("ts") - sec("t_view") <= FUNNEL_LAG_SEC),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    p = (
        ev.join(c.filter(F.col("t_click").isNotNull()), "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click"))
                    & (sec("ts") - sec("t_click") <= FUNNEL_LAG_SEC),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    s1 = v.filter(F.col("t_view").isNotNull()).count()
    s2 = c.filter(F.col("t_click").isNotNull()).count()
    s3 = p.filter(F.col("t_purchase").isNotNull()).count()
    rows = [
        (1, "view", s1),
        (2, "view>click<=24h", s2),
        (3, "click>purchase<=24h", s3),
    ]
    out = spark.createDataFrame(rows, "stage int, stage_name string, n_users long")
    return out.select(
        "stage",
        "stage_name",
        "n_users",
        # max(s1, 1): a corpus with zero 'view' events must yield conv_ppm 0,
        # not a divide-by-zero NULL divergence (house greatest(x,1) guard).
        F.round(F.col("n_users") * 1000000.0 / F.lit(max(s1, 1))).cast("long").alias("conv_ppm"),
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# B148: SLO error-budget burn rate over sliding windows (r9)
# ---------------------------------------------------------------------------
# The Google-SRE-workbook alerting shape: error share per sliding
# 1h/30m window against a 2% SLO, expressed as burn rate (rate/SLO —
# burn 1.0 spends the budget exactly on schedule) with the standard
# fast-burn (>= 14.4x) and slow-burn (>= 3x) flags. Pure integer
# arithmetic (50e6 * errors // total); the window replication is the
# B100 2x flatMap, so the whole op is one uniform-key groupBy over the
# scan — and the mergeable-sink twin argument holds verbatim (counts
# sum associatively; the burn ratio derives at read time).
@register(
    "events_slo_burn_rate",
    """
WITH mapped AS (
  SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - offs.o AS win_start_epoch,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events, (SELECT unnest([0, 1800]) AS o) offs
), w AS (
  SELECT win_start_epoch,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(is_err) AS BIGINT) AS n_errors
  FROM mapped GROUP BY win_start_epoch
)
SELECT win_start_epoch, n_events, n_errors,
       CAST(n_errors * 1000000 // n_events AS BIGINT) AS err_ppm,
       CAST(n_errors * 50000000 // n_events AS BIGINT) AS burn_micro,
       CAST(CASE WHEN n_errors * 50000000 // n_events >= 14400000 THEN 1 ELSE 0 END AS BIGINT) AS fast_burn,
       CAST(CASE WHEN n_errors * 50000000 // n_events >= 3000000 THEN 1 ELSE 0 END AS BIGINT) AS slow_burn
FROM w
ORDER BY win_start_epoch
""",
)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn per sliding 1h/30m window vs a 2% SLO (B148) —
    integer burn ratio with SRE fast/slow-burn flags; 2x window
    replication, one uniform-key groupBy."""
    ev = read_table(spark, sf_dir, "events")
    mapped = (
        ev.select(
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
    w = mapped.groupBy("win_start_epoch").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("is_err").cast("long").alias("n_errors"),
    )
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


# ---------------------------------------------------------------------------
# B149: week-0 retention drivers (aha-moment analysis) (r9)
# ---------------------------------------------------------------------------
# Which first-week behavior predicts coming back? For each event type:
# of the users active in week 0 who did that type in week 0, what share
# was active again in week 1, and how does it compare to the overall
# week-0 retention (lift). The classic growth "aha moment" table
# (correlational, as always — the CUPED/SRM ops are the causal side).
# Shape: one (user, week) activity distinct + one (user, type) week-0
# incidence — both uniform-key; everything after is arithmetic over
# |types| rows with a 1-row baseline broadcast. Integer ppm/micro.
@register(
    "events_retention_drivers",
    """
WITH w0 AS (
  SELECT CAST(min(floor(epoch(ts) / 604800)) AS BIGINT) AS wk0 FROM events
), uw AS (
  SELECT DISTINCT e.user_id, CAST(floor(epoch(e.ts) / 604800) AS BIGINT) AS wk
  FROM events e
), base AS (
  SELECT u0.user_id,
         CAST(CASE WHEN u1.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS retained
  FROM (SELECT user_id FROM uw, w0 WHERE wk = wk0) u0
  LEFT JOIN (SELECT user_id FROM uw, w0 WHERE wk = wk0 + 1) u1
    ON u1.user_id = u0.user_id
), overall AS (
  SELECT CAST(count(*) AS BIGINT) AS n0, CAST(sum(retained) AS BIGINT) AS r0 FROM base
), did AS (
  SELECT DISTINCT e.user_id, e.event_type
  FROM events e, w0
  WHERE CAST(floor(epoch(e.ts) / 604800) AS BIGINT) = w0.wk0
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS support,
       CAST(sum(b.retained) * 1000000 // count(*) AS BIGINT) AS retention_ppm,
       CAST((sum(b.retained) * o.n0 * 1000000) // (count(*) * greatest(o.r0, 1)) AS BIGINT) AS lift_micro
FROM did d JOIN base b ON b.user_id = d.user_id CROSS JOIN overall o
GROUP BY d.event_type, o.n0, o.r0
ORDER BY d.event_type
""",
)
def events_retention_drivers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-0 behavior vs week-1 retention per event type with lift over
    the overall retention baseline (B149) — the aha-moment table; two
    uniform-key distincts, |types|-row output."""
    ev = read_table(spark, sf_dir, "events")
    wk = F.floor(F.col("ts").cast("double") / 604800).cast("long")
    uw = ev.select("user_id", wk.alias("wk")).distinct()
    wk0 = uw.agg(F.min("wk").alias("wk0"))
    u0 = uw.crossJoin(F.broadcast(wk0)).filter(F.col("wk") == F.col("wk0")).select("user_id")
    u1 = (
        uw.crossJoin(F.broadcast(wk0))
        .filter(F.col("wk") == F.col("wk0") + 1)
        .select(F.col("user_id").alias("u1_id"))
    )
    base = u0.join(u1, u0.user_id == u1.u1_id, "left").select(
        "user_id",
        F.when(F.col("u1_id").isNotNull(), 1).otherwise(0).cast("long").alias("retained"),
    )
    overall = base.agg(
        F.count("*").cast("long").alias("n0"), F.sum("retained").cast("long").alias("r0")
    )
    did = (
        ev.select("user_id", "event_type", wk.alias("wk"))
        .crossJoin(F.broadcast(wk0))
        .filter(F.col("wk") == F.col("wk0"))
        .select("user_id", "event_type")
        .distinct()
    )
    return (
        did.join(base, "user_id")
        .crossJoin(F.broadcast(overall))
        .groupBy("event_type", "n0", "r0")
        .agg(
            F.count("*").cast("long").alias("support"),
            F.expr("sum(retained) * 1000000 div count(*)").cast("long").alias("retention_ppm"),
            F.expr("(sum(retained) * n0 * 1000000) div (count(*) * greatest(r0, 1))")
            .cast("long")
            .alias("lift_micro"),
        )
        .select("event_type", "support", "retention_ppm", "lift_micro")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B151: PSI value-drift monitor over the props payload (r9)
# ---------------------------------------------------------------------------
# The ML-monitoring standard: Population Stability Index between the
# baseline (first day) distribution of the props value and every later
# day, over 10 fixed-width buckets with +1 Laplace smoothing (so a
# bucket empty on either side contributes a finite term instead of an
# infinity — the guard IS part of the published metric's practice).
# PSI >= 0.2 is the conventional "investigate" threshold. Each bucket
# term quantizes once to micro ((q-p)*ln(q/p), the per-term ln
# discipline), and the per-day sum of those integers is exact. Shape:
# one (day, bucket) groupBy over a JSON-path map expression, baseline
# row broadcast — the drift table is |days| rows from any volume.
@register(
    "events_props_psi_drift",
    """
WITH vals AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         least(greatest(CAST(props::JSON ->> 'k' AS BIGINT), 0), 99) // 10 AS b
  FROM events WHERE props IS NOT NULL
), db AS (
  SELECT d, b, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY d, b
), grid AS (
  SELECT dd.d, bb.b, coalesce(db.c, 0) + 1 AS c
  FROM (SELECT DISTINCT d FROM db) dd
  CROSS JOIN (SELECT unnest(range(0, 10)) AS b) bb
  LEFT JOIN db ON db.d = dd.d AND db.b = bb.b
), tot AS (
  SELECT d, CAST(sum(c) AS BIGINT) AS n FROM grid GROUP BY d
), d0 AS (
  SELECT CAST(min(d) AS BIGINT) AS d0 FROM grid
), base AS (
  SELECT g.b, g.c AS c0, t.n AS n0
  FROM grid g JOIN tot t ON t.d = g.d, d0
  WHERE g.d = d0.d0
), terms AS (
  SELECT g.d, t.n,
         CAST(round((g.c * 1.0 / t.n - b.c0 * 1.0 / b.n0)
                    * ln((g.c * b.n0 * 1.0) / (b.c0 * t.n)) * 1000000.0) AS BIGINT)
           AS term_micro
  FROM grid g JOIN tot t ON t.d = g.d JOIN base b ON b.b = g.b
)
SELECT d AS day_epoch_days,
       CAST(max(n) - 10 AS BIGINT) AS n_events,
       CAST(sum(term_micro) AS BIGINT) AS psi_micro,
       CAST(CASE WHEN sum(term_micro) >= 200000 THEN 1 ELSE 0 END AS BIGINT) AS drift_flag
FROM terms
GROUP BY d
ORDER BY d
""",
)
def events_props_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily PSI of the props value distribution vs the first day (B151)
    — 10 fixed buckets, +1 smoothing, per-bucket micro-quantized terms,
    0.2 investigate flag; the |days|-row drift monitor."""
    ev = read_table(spark, sf_dir, "events")
    vals = ev.filter(F.col("props").isNotNull()).select(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("d"),
        F.expr(
            "least(greatest(cast(get_json_object(props, '$.k') as bigint), 0), 99) div 10"
        ).alias("b"),
    )
    db = vals.groupBy("d", "b").agg(F.count("*").cast("long").alias("c"))
    days = db.select("d").distinct()
    buckets = spark.range(10).select(F.col("id").cast("long").alias("b"))
    grid = (
        days.crossJoin(F.broadcast(buckets))
        .join(db, ["d", "b"], "left")
        .select("d", "b", (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("long").alias("c"))
    )
    tot = grid.groupBy("d").agg(F.sum("c").cast("long").alias("n"))
    d0 = grid.agg(F.min("d").alias("d0"))
    base = (
        grid.join(F.broadcast(tot), "d")
        .crossJoin(F.broadcast(d0))
        .filter(F.col("d") == F.col("d0"))
        .select("b", F.col("c").alias("c0"), F.col("n").alias("n0"))
    )
    terms = (
        grid.join(F.broadcast(tot), "d")
        .join(F.broadcast(base), "b")
        .select(
            "d",
            "n",
            F.round(
                (F.col("c") * 1.0 / F.col("n") - F.col("c0") * 1.0 / F.col("n0"))
                * F.log((F.col("c") * F.col("n0") * 1.0) / (F.col("c0") * F.col("n")))
                * 1000000.0
            )
            .cast("long")
            .alias("term_micro"),
        )
    )
    return (
        terms.groupBy("d")
        .agg(
            (F.max("n") - 10).cast("long").alias("n_events"),
            F.sum("term_micro").cast("long").alias("psi_micro"),
            F.when(F.sum("term_micro") >= 200000, 1).otherwise(0).cast("long").alias(
                "drift_flag"
            ),
        )
        .select(F.col("d").alias("day_epoch_days"), "n_events", "psi_micro", "drift_flag")
        .orderBy("day_epoch_days")
    )


# ---------------------------------------------------------------------------
# B156: peak session concurrency (capacity planning) (r9)
# ---------------------------------------------------------------------------
# How many sessions were live at the busiest instant? Sessions are the
# corpus's standard 30-min-gap sessionization (one user-key window),
# reduced to [start, end] intervals, then the classic boundary sweep:
# +1 at each start, -1 just after each end (starts sort before ends at
# equal timestamps — inclusive overlap), running sum, global max, and
# the earliest instant achieving it. The sweep window runs over
# 2x|sessions| boundary rows — already reduced from raw events; at
# 100 TB shard the sweep by splitting sessions at day boundaries and
# taking the max of per-day peaks (each day's sweep then partitions).
# Timestamps stay microsecond-exact integer us throughout.
@register(
    "events_peak_concurrency",
    """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_idx,
         ts
  FROM ordered
), intervals AS (
  SELECT user_id, sess_idx,
         CAST(round(epoch(min(ts)) * 1000000) AS BIGINT) AS start_us,
         CAST(round(epoch(max(ts)) * 1000000) AS BIGINT) AS end_us
  FROM sess GROUP BY user_id, sess_idx
), bounds AS (
  SELECT start_us AS t_us, 1 AS delta FROM intervals
  UNION ALL
  SELECT end_us + 1, -1 FROM intervals
), swept AS (
  SELECT t_us, delta,
         sum(delta) OVER (ORDER BY t_us, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS live
  FROM bounds
), peak AS (
  SELECT max(live) AS p FROM swept
)
SELECT CAST((SELECT count(*) FROM intervals) AS BIGINT) AS n_sessions,
       CAST(p.p AS BIGINT) AS peak_concurrency,
       CAST((SELECT min(t_us) FROM swept, peak WHERE swept.live = peak.p) AS BIGINT)
         AS peak_start_us
FROM peak p
""",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous 30-min-gap sessions and the earliest instant it
    is reached (B156) — boundary sweep over reduced session intervals,
    integer microsecond timestamps."""
    ev = read_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wu)
    ordered = ev.select(
        "user_id",
        "ts",
        F.when(
            prev.isNull()
            | (F.col("ts").cast("double") - prev.cast("double") > 1800),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
        F.row_number().over(wu).alias("_rn"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("_rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = ordered.select(
        "user_id", F.sum("new_sess").over(wcum).alias("sess_idx"), "ts"
    )
    intervals = sess.groupBy("user_id", "sess_idx").agg(
        F.round(F.min(F.col("ts").cast("double")) * 1000000).cast("long").alias("start_us"),
        F.round(F.max(F.col("ts").cast("double")) * 1000000).cast("long").alias("end_us"),
    )
    bounds = intervals.select(F.col("start_us").alias("t_us"), F.lit(1).alias("delta")).unionByName(
        intervals.select((F.col("end_us") + 1).alias("t_us"), F.lit(-1).alias("delta"))
    )
    # global sweep over 2x|sessions| boundary rows — deliberately
    # single-partition, already reduced from raw events (see header).
    wsweep = Window.orderBy(F.col("t_us").asc(), F.col("delta").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = bounds.select("t_us", "delta", F.sum("delta").over(wsweep).alias("live"))
    # ONE aggregate, ZERO driver actions (r14 opt): the previous form
    # collected three scalars in three separate jobs, re-executing the
    # sessionize + sweep chain each time. n_sessions = the +1 boundary
    # count; the earliest peak instant rides a lexicographic max over
    # struct(live, -t_us) — maximize live, then minimize t_us — so the
    # whole report is a single pass over the swept frame.
    return swept.agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_sessions"),
        F.max(F.struct(F.col("live").alias("live"), (-F.col("t_us")).alias("nt"))).alias(
            "__m"
        ),
    ).select(
        "n_sessions",
        F.col("__m.live").cast("long").alias("peak_concurrency"),
        (-F.col("__m.nt")).cast("long").alias("peak_start_us"),
    )


# ---------------------------------------------------------------------------
# B159: Markov next-event backtest (sequence-model eval) (r9)
# ---------------------------------------------------------------------------
# Does the B71 transition matrix actually PREDICT? Train bigram counts
# on the first three weeks, predict each held-out transition's next
# type as the train-argmax of its from-state (ties on the type string,
# so the predictor is deterministic), and score top-1 accuracy per
# from-state — the sequence twin of the B116 forecast backtest, and
# the eval that says whether sequence signal exists before anyone
# ships a sequence model. Train/test transitions come from the same
# per-user lag pass split on the cur-event timestamp (prev may be in
# train — that is how deployment sees it). Shape: one lag window, two
# tiny groupBys, argmax over a |V|^2 table.
MARKOV_SPLIT = "2024-01-22 00:00:00"


@register(
    "events_markov_backtest",
    f"""
WITH seq AS (
  SELECT user_id, ts, event_type AS cur,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), train AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE prev IS NOT NULL AND ts < TIMESTAMP '{MARKOV_SPLIT}'
  GROUP BY prev, cur
), pred AS (
  SELECT prev, cur AS predicted_next
  FROM (SELECT prev, cur, row_number() OVER (PARTITION BY prev
                                             ORDER BY c DESC, cur) AS rn
        FROM train)
  WHERE rn = 1
), test AS (
  SELECT prev, cur FROM seq
  WHERE prev IS NOT NULL AND ts >= TIMESTAMP '{MARKOV_SPLIT}'
)
SELECT t.prev AS from_type, p.predicted_next,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN t.cur = p.predicted_next THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(sum(CASE WHEN t.cur = p.predicted_next THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS top1_accuracy_ppm
FROM test t JOIN pred p ON p.prev = t.prev
GROUP BY t.prev, p.predicted_next
ORDER BY t.prev
""",
)
def events_markov_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 next-event accuracy of the train-window Markov argmax on
    held-out transitions, per from-state (B159) — the sequence twin of
    the forecast backtest."""
    ev = read_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    split = F.lit(MARKOV_SPLIT).cast("timestamp")
    seq = ev.select(
        "ts", F.col("event_type").alias("cur"), F.lag("event_type").over(wu).alias("prev")
    ).filter(F.col("prev").isNotNull())
    train = (
        seq.filter(F.col("ts") < split)
        .groupBy("prev", "cur")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wp = Window.partitionBy("prev").orderBy(F.col("c").desc(), F.col("cur").asc())
    pred = (
        train.select("prev", "cur", F.row_number().over(wp).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("prev", F.col("cur").alias("predicted_next"))
    )
    test = seq.filter(F.col("ts") >= split)
    return (
        test.join(F.broadcast(pred), "prev")
        .groupBy(F.col("prev").alias("from_type"), "predicted_next")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(F.when(F.col("cur") == F.col("predicted_next"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
            F.expr(
                "sum(CASE WHEN cur = predicted_next THEN 1 ELSE 0 END) * 1000000 div count(*)"
            )
            .cast("long")
            .alias("top1_accuracy_ppm"),
        )
        .orderBy("from_type")
    )


# ---------------------------------------------------------------------------
# B160: two-proportion conversion z-test (the standard A/B readout) (r9)
# ---------------------------------------------------------------------------
# The most-run experiment statistic there is: did the treatment arm
# convert better, and is the difference outside noise? Users hash into
# arms (the B125 seeded assignment), conversion = did a purchase, and
# the pooled two-proportion z evaluates once from five exact integers
# (n1, n2, x1, x2 and their sums) with floor(x+0.5) milli quantization.
# |z| >= 1.960 flags at the 95% level. One user-key reduce, one row out.
@register(
    "events_ab_conversion_test",
    """
WITH ua AS (
  SELECT user_id,
         CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS converted
  FROM events GROUP BY user_id
), s AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS x0,
         CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS x1
  FROM ua
)
SELECT n0 AS users_arm0, n1 AS users_arm1, x0 AS conv_arm0, x1 AS conv_arm1,
       CAST(x0 * 1000000 // greatest(n0, 1) AS BIGINT) AS rate0_ppm,
       CAST(x1 * 1000000 // greatest(n1, 1) AS BIGINT) AS rate1_ppm,
       CAST(CASE WHEN x0 + x1 = 0 OR x0 + x1 = n0 + n1 THEN 0
                 ELSE floor((x1 * 1.0 / n1 - x0 * 1.0 / n0)
                            / sqrt(((x0 + x1) * 1.0 / (n0 + n1)) * (1.0 - (x0 + x1) * 1.0 / (n0 + n1))
                                   * (1.0 / n0 + 1.0 / n1)) * 1000 + 0.5) END AS BIGINT) AS z_milli,
       CAST(CASE WHEN x0 + x1 = 0 OR x0 + x1 = n0 + n1 THEN 0
                 WHEN abs(floor((x1 * 1.0 / n1 - x0 * 1.0 / n0)
                            / sqrt(((x0 + x1) * 1.0 / (n0 + n1)) * (1.0 - (x0 + x1) * 1.0 / (n0 + n1))
                                   * (1.0 / n0 + 1.0 / n1)) * 1000 + 0.5)) >= 1960 THEN 1
                 ELSE 0 END AS BIGINT) AS significant_95
FROM s
""",
)
def events_ab_conversion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test of purchase conversion between the
    seeded md5 arms (B160) — five exact integers in, one milli-quantized
    z out, 1.960 significance flag."""
    ev = read_table(spark, sf_dir, "events")
    ua = ev.groupBy("user_id").agg(
        F.expr(
            "cast(conv(substring(md5(concat('srm:', cast(user_id as string))), 1, 8), 16, 10)"
            " as bigint) % 2"
        ).alias("arm"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("converted"),
    )
    s = ua.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x0"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x1"),
    )
    p_pool = (F.col("x0") + F.col("x1")) * 1.0 / (F.col("n0") + F.col("n1"))
    z = F.floor(
        (F.col("x1") * 1.0 / F.col("n1") - F.col("x0") * 1.0 / F.col("n0"))
        / F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
        * 1000
        + 0.5
    )
    degenerate = (F.col("x0") + F.col("x1") == 0) | (
        F.col("x0") + F.col("x1") == F.col("n0") + F.col("n1")
    )
    return s.select(
        F.col("n0").alias("users_arm0"),
        F.col("n1").alias("users_arm1"),
        F.col("x0").alias("conv_arm0"),
        F.col("x1").alias("conv_arm1"),
        F.expr("x0 * 1000000 div greatest(n0, 1)").cast("long").alias("rate0_ppm"),
        F.expr("x1 * 1000000 div greatest(n1, 1)").cast("long").alias("rate1_ppm"),
        F.when(degenerate, F.lit(0)).otherwise(z).cast("long").alias("z_milli"),
        F.when(degenerate, F.lit(0))
        .otherwise(F.when(F.abs(z) >= 1960, 1).otherwise(0))
        .cast("long")
        .alias("significant_95"),
    )


# ---------------------------------------------------------------------------
# B163: duplicate-transaction detector (idempotency audit) (r9)
# ---------------------------------------------------------------------------
# Payments/ingest forensics: two events by the same user for the same
# exact amount within 60 seconds are retry artifacts or double-charges
# until proven otherwise. The pair join runs INSIDE (user, cents)
# groups — the only fanout is each group's own size (retry bursts are
# short), never a cross-user or cross-amount product — and pairs order
# by (ts, event_id) so each duplicate is counted once. Output per
# event_type: transaction count, duplicate pairs, affected users, ppm.
DUP_TXN_WINDOW_SEC = 60


@register(
    "events_dup_transaction_audit",
    f"""
WITH txn AS (
  SELECT event_id, event_type, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), pairs AS (
  SELECT a.event_type, a.user_id
  FROM txn a JOIN txn b
    ON b.user_id = a.user_id AND b.cents = a.cents AND b.event_type = a.event_type
   AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
   AND epoch(b.ts) - epoch(a.ts) <= {DUP_TXN_WINDOW_SEC}
), base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_txn FROM txn GROUP BY event_type
), agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_dup_pairs,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_affected_users
  FROM pairs GROUP BY event_type
)
SELECT b.event_type, b.n_txn,
       coalesce(a.n_dup_pairs, 0) AS n_dup_pairs,
       coalesce(a.n_affected_users, 0) AS n_affected_users,
       CAST(coalesce(a.n_dup_pairs, 0) * 1000000 // b.n_txn AS BIGINT) AS dup_ppm
FROM base b LEFT JOIN agg a ON a.event_type = b.event_type
ORDER BY b.event_type
""",
)
def events_dup_transaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user same-amount pairs within 60s per event type (B163) —
    the double-charge/retry audit; the join fans out only within
    (user, cents, type) groups."""
    ev = read_table(spark, sf_dir, "events")
    txn = ev.filter(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    a = txn.alias("a")
    b = txn.alias("b")
    pairs = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.cents") == F.col("a.cents"))
        & (F.col("b.event_type") == F.col("a.event_type"))
        & (
            (F.col("b.ts") > F.col("a.ts"))
            | ((F.col("b.ts") == F.col("a.ts")) & (F.col("b.event_id") > F.col("a.event_id")))
        )
        & (
            F.col("b.ts").cast("double") - F.col("a.ts").cast("double")
            <= DUP_TXN_WINDOW_SEC
        ),
    ).select(F.col("a.event_type").alias("event_type"), F.col("a.user_id").alias("user_id"))
    base = txn.groupBy("event_type").agg(F.count("*").cast("long").alias("n_txn"))
    agg = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_dup_pairs"),
        F.countDistinct("user_id").cast("long").alias("n_affected_users"),
    )
    return (
        base.join(agg, "event_type", "left")
        .select(
            "event_type",
            "n_txn",
            F.coalesce(F.col("n_dup_pairs"), F.lit(0)).cast("long").alias("n_dup_pairs"),
            F.coalesce(F.col("n_affected_users"), F.lit(0))
            .cast("long")
            .alias("n_affected_users"),
            F.expr("coalesce(n_dup_pairs, 0) * 1000000 div n_txn")
            .cast("long")
            .alias("dup_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B165: audience-overlap matrix (reach intersection per type pair) (r9)
# ---------------------------------------------------------------------------
# Who does BOTH? Exact distinct-user overlap for every event-type pair
# — |A∩B|, plus Jaccard in ppm — the audience-planning matrix, and the
# exact twin any HLL inclusion-exclusion estimate (the B124 sketch
# path's algebra) gets audited against. Shape: ONE (user, type)
# incidence distinct, self-joined on user within pairs (fanout bounded
# by each user's own type count, <= |types| = 5), then a |types|^2
# aggregate. Diagonal = per-type reach, a built-in self-check.
@register(
    "events_audience_overlap",
    """
WITH inc AS (
  SELECT DISTINCT user_id, event_type FROM events
), reach AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS r FROM inc GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM inc a JOIN inc b ON b.user_id = a.user_id
  GROUP BY a.event_type, b.event_type
)
SELECT i.type_a, i.type_b, ra.r AS reach_a, rb.r AS reach_b, i.n_both,
       CAST(i.n_both * 1000000 // (ra.r + rb.r - i.n_both) AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN reach ra ON ra.event_type = i.type_a
JOIN reach rb ON rb.event_type = i.type_b
ORDER BY i.type_a, i.type_b
""",
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user overlap and Jaccard per event-type pair
    (B165) — the audience-planning matrix and the audit twin of HLL
    inclusion-exclusion; self-join bounded by per-user type count."""
    ev = read_table(spark, sf_dir, "events")
    inc = ev.select("user_id", "event_type").distinct()
    reach = inc.groupBy("event_type").agg(F.count("*").cast("long").alias("r"))
    a = inc.alias("a")
    b = inc.alias("b")
    inter = (
        a.join(b, F.col("b.user_id") == F.col("a.user_id"))
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(reach.withColumnRenamed("event_type", "type_a").withColumnRenamed("r", "reach_a")),
            "type_a",
        )
        .join(
            F.broadcast(reach.withColumnRenamed("event_type", "type_b").withColumnRenamed("r", "reach_b")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "reach_a",
            "reach_b",
            "n_both",
            F.expr("n_both * 1000000 div (reach_a + reach_b - n_both)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


def stl_report_from_counts(counts: DataFrame) -> DataFrame:
    """B167's full decomposition from an (h, c) hourly count table — ONE
    definition shared by the batch query and the streaming read path
    (`stream_ops.stl_from_state`): the hourly counts are the only state a
    stream needs (plain summed counts, trivially mergeable); trend /
    seasonal / residual are read-time algebra over the reduced grid."""
    # counts (≤ |hours| rows) feeds bounds AND the grid join, and the
    # decomposition fans out twice more above — checkpoint once so the
    # raw-events groupBy behind it never re-executes per branch (r14
    # opt; 16 scans in events_stl_residual_anomaly's before-plan).
    counts = counts.localCheckpoint(eager=True)
    bounds = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"))
    series = grid.join(counts, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    # windows over the reduced hourly grid (<= |hours| rows) — the
    # deliberate single-partition sweep of the seasonal/CUSUM family.
    wt = Window.orderBy("h").rowsBetween(-12, 12)
    trended = series.select(
        "h",
        "c",
        F.sum("c").over(wt).cast("long").alias("trend25"),
        F.count("*").over(wt).cast("long").alias("w"),
    )
    inner = trended.filter(F.col("w") == 25).select(
        "h", "c", "trend25", (F.col("c") * 25 - F.col("trend25")).cast("long").alias("detr")
    )
    wh = Window.partitionBy(F.col("h") % 24).orderBy("detr", "h")
    wn = Window.partitionBy(F.col("h") % 24)
    seas = (
        inner.select(
            (F.col("h") % 24).alias("hod"),
            "detr",
            F.row_number().over(wh).alias("rk"),
            F.count("*").over(wn).alias("n"),
        )
        .filter(F.col("rk") == F.expr("(n + 1) div 2"))
        .select("hod", F.col("detr").alias("seasonal25"))
    )
    return (
        inner.join(F.broadcast(seas), (F.col("h") % 24) == F.col("hod"))
        .select(
            F.col("h").alias("hour_epoch"),
            F.col("c").alias("n_events"),
            "trend25",
            "seasonal25",
            (F.col("detr") - F.col("seasonal25")).cast("long").alias("residual25"),
        )
        .orderBy("hour_epoch")
    )


# ---------------------------------------------------------------------------
# B167: STL-lite decomposition of the hourly series (r9)
# ---------------------------------------------------------------------------
# The classic additive decomposition, in its exact-arithmetic form:
# trend = centered 25-hour moving SUM (kept as a sum — dividing by the
# window width would leave integers; scaled counts c*25 compare
# against it exactly), seasonal = per-hour-of-day median of the
# detrended series (exact lower-median rank), residual = the rest.
# Every component is an exact BIGINT in c*25 units, so the oracle
# replays the whole decomposition bit-for-bit — no smoothing epsilons.
# Densified grid (B108 lesson); windows run over the reduced hourly
# table. The residual column is what the anomaly ops SHOULD be fed at
# 100 TB — seasonality and trend removed by algebra, not assumption.
@register(
    "events_stl_decompose",
    """
WITH bounds AS (
  SELECT CAST(min(floor(epoch(ts) / 3600)) AS BIGINT) AS h0,
         CAST(max(floor(epoch(ts) / 3600)) AS BIGINT) AS h1
  FROM events
), grid AS (
  SELECT CAST(g.h AS BIGINT) AS h FROM bounds b, unnest(range(b.h0, b.h1 + 1)) AS g(h)
), counts AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(floor(epoch(ts) / 3600) AS BIGINT)
), series AS (
  SELECT g.h, coalesce(c.c, 0) AS c FROM grid g LEFT JOIN counts c ON c.h = g.h
), trended AS (
  SELECT h, c,
         CAST(sum(c) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT) AS trend25,
         CAST(count(*) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT) AS w
  FROM series
), inner25 AS (
  SELECT h, c, trend25, c * 25 - trend25 AS detr
  FROM trended WHERE w = 25
), seas AS (
  SELECT hod, detr AS seasonal25
  FROM (SELECT h % 24 AS hod, detr,
               row_number() OVER (PARTITION BY h % 24 ORDER BY detr, h) AS rk,
               count(*) OVER (PARTITION BY h % 24) AS n
        FROM inner25)
  WHERE rk = (n + 1) // 2
)
SELECT i.h AS hour_epoch, i.c AS n_events,
       i.trend25, s.seasonal25,
       CAST(i.detr - s.seasonal25 AS BIGINT) AS residual25
FROM inner25 i JOIN seas s ON s.hod = i.h % 24
ORDER BY i.h
""",
)
def events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact additive trend/seasonal/residual decomposition of the
    hourly count series in c*25 integer units (B167) — centered
    25-hour moving sum, per-hour-of-day exact-median seasonal, the
    residual the anomaly gates should consume."""
    ev = read_table(spark, sf_dir, "events")
    hcol = F.floor(F.col("ts").cast("double") / 3600).cast("long")
    counts = ev.groupBy(hcol.alias("h")).agg(F.count("*").cast("long").alias("c"))
    return stl_report_from_counts(counts)


# ---------------------------------------------------------------------------
# B173: delta-method CI for a ratio metric (revenue per active day) (r9)
# ---------------------------------------------------------------------------
# Ratio metrics (revenue/session, clicks/view) violate the iid
# assumption user-level t-tests need — the standard fix is the delta
# method (Deng et al., KDD'18 practice): var(X̄/Ȳ) ≈ (1/n·Ȳ²)·
# (S_xx − 2·(X̄/Ȳ)·S_xy + (X̄/Ȳ)²·S_yy). Per seeded arm, per-user
# revenue (x, cents) and active days (y) reduce to exact integer
# moment sums (decimal(38,0)/HUGEINT — cents² sums pass int64, the
# B144 rule); the ratio, its delta-method standard error, and the 95%
# CI evaluate once per arm in doubles with floor(x+0.5) micro
# quantization. One user-key reduce, two rows out.
@register(
    "events_ratio_delta_method",
    """
WITH per_user AS (
  SELECT user_id,
         CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm,
         CAST(sum(CASE WHEN value IS NOT NULL THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(count(DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY user_id
), s AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM per_user GROUP BY arm
), f AS (
  SELECT arm, n, sx, sy,
         (CAST(sx AS DOUBLE) / n) AS xbar, (CAST(sy AS DOUBLE) / n) AS ybar,
         (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS vxx,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1) AS vxy,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS vyy
  FROM s WHERE n > 1
)
SELECT arm, n AS n_users,
       CAST(floor(xbar / ybar * 1000000 + 0.5) AS BIGINT) AS ratio_micro,
       CAST(floor(sqrt(greatest((vxx - 2 * (xbar / ybar) * vxy
                                 + (xbar / ybar) * (xbar / ybar) * vyy)
                                / (n * ybar * ybar), 0)) * 1000000 + 0.5) AS BIGINT)
         AS se_micro,
       CAST(floor((xbar / ybar - 1.959964 * sqrt(greatest((vxx - 2 * (xbar / ybar) * vxy
                                 + (xbar / ybar) * (xbar / ybar) * vyy)
                                / (n * ybar * ybar), 0))) * 1000000 + 0.5) AS BIGINT) AS ci_lo_micro,
       CAST(floor((xbar / ybar + 1.959964 * sqrt(greatest((vxx - 2 * (xbar / ybar) * vxy
                                 + (xbar / ybar) * (xbar / ybar) * vyy)
                                / (n * ybar * ybar), 0))) * 1000000 + 0.5) AS BIGINT) AS ci_hi_micro
FROM f
ORDER BY arm
""",
)
def events_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method mean, SE, and 95% CI for the revenue-per-active-day
    ratio metric per seeded arm (B173) — exact 128-bit moment sums, one
    double formula per arm; the correct ratio-metric readout."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "cast(conv(substring(md5(concat('srm:', cast(user_id as string))), 1, 8), 16, 10)"
            " as bigint) % 2"
        ).alias("arm"),
        F.sum(
            F.when(
                F.col("value").isNotNull(), F.round(F.col("value") * 100).cast("long")
            ).otherwise(0)
        )
        .cast("long")
        .alias("x"),
        F.countDistinct(F.floor(F.col("ts").cast("double") / 86400).cast("long"))
        .cast("long")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    s = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
    ).filter(F.col("n") > 1)
    xbar = F.col("sx").cast("double") / F.col("n")
    ybar = F.col("sy").cast("double") / F.col("n")
    vxx = (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    vxy = (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    vyy = (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    ratio = xbar / ybar
    var = F.greatest(
        (vxx - 2 * ratio * vxy + ratio * ratio * vyy) / (F.col("n") * ybar * ybar), F.lit(0.0)
    )
    se = F.sqrt(var)
    return s.select(
        "arm",
        F.col("n").alias("n_users"),
        F.floor(ratio * 1000000 + 0.5).cast("long").alias("ratio_micro"),
        F.floor(se * 1000000 + 0.5).cast("long").alias("se_micro"),
        F.floor((ratio - 1.959964 * se) * 1000000 + 0.5).cast("long").alias("ci_lo_micro"),
        F.floor((ratio + 1.959964 * se) * 1000000 + 0.5).cast("long").alias("ci_hi_micro"),
    ).orderBy("arm")


# ---------------------------------------------------------------------------
# B183: per-user behavioral entropy (event-type mix diversity)
# ---------------------------------------------------------------------------
# The feature-store companion to RFM (B113): HOW a user acts, not just
# how much — Shannon entropy of their event-type distribution in exact
# integer micro-nats (0 = one-trick user, ln(#types) = uniform).
# Integer contract: each type's -ln(p) rounds ONCE to micro-nats, the
# user entropy is the count-weighted integer mean. Scale: two uniform
# groupBys ((user, type) then user); output |users| rows like B113.
@register(
    "events_user_type_entropy",
    """
WITH ut AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
), tot AS (
  SELECT user_id, CAST(sum(n) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS n_types
  FROM ut GROUP BY user_id
)
SELECT u.user_id, t.nt AS n_events, t.n_types,
       CAST(sum(u.n * CAST(round(-ln(u.n * 1.0 / t.nt) * 1000000) AS BIGINT)) // t.nt
            AS BIGINT) AS entropy_micronat
FROM ut u JOIN tot t ON t.user_id = u.user_id
GROUP BY u.user_id, t.nt, t.n_types
ORDER BY u.user_id
""",
)
def events_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix in exact integer
    micro-nats (B183) — the behavioral-diversity feature beside RFM."""
    ev = read_table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(F.count("*").cast("long").alias("n"))
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
        .select(
            "user_id",
            F.col("nt").alias("n_events"),
            "n_types",
            "entropy_micronat",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# B184: inter-event gap percentiles per type (exact-rank form)
# ---------------------------------------------------------------------------
# Cadence profiling: per event type, the median and p95 gap between a
# user's CONSECUTIVE events of that type — the number that separates a
# heartbeat stream from human traffic and sets sessionization gaps /
# watermark widths empirically instead of by folklore. Gaps are exact
# integer microseconds from a user+type-partitioned lag (no global
# window); percentiles use the B137 exact-rank discipline
# (rk = ceil(n*q) under a total order), so both engines agree
# bit-for-bit. Output: one row per event type.
@register(
    "events_gap_percentiles",
    """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us,
         event_id
  FROM events
), gaps AS (
  SELECT event_type, gap_us, event_id FROM g WHERE gap_us IS NOT NULL
), ranked AS (
  SELECT event_type, gap_us,
         row_number() OVER (PARTITION BY event_type ORDER BY gap_us, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM gaps
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(max(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT) THEN gap_us END) AS BIGINT)
         AS p50_gap_us,
       CAST(max(CASE WHEN rk = CAST(ceil(n * 0.95) AS BIGINT) THEN gap_us END) AS BIGINT)
         AS p95_gap_us
FROM ranked
GROUP BY event_type
ORDER BY event_type
""",
)
def events_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-rank median/p95 inter-event gap per event type (B184) — the
    cadence profile that grounds sessionization gaps and watermarks."""
    ev = read_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wl)).alias("gap_us"),
        "event_id",
    ).filter(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = g.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            F.max(
                F.when(F.col("rk") == F.ceil(F.col("n") * 0.5).cast("long"), F.col("gap_us"))
            )
            .cast("long")
            .alias("p50_gap_us"),
            F.max(
                F.when(F.col("rk") == F.ceil(F.col("n") * 0.95).cast("long"), F.col("gap_us"))
            )
            .cast("long")
            .alias("p95_gap_us"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B206: session path mining (top opening paths, Sankey's data)
# ---------------------------------------------------------------------------
# Funnels (B59/B147) check ONE hypothesized path; path mining DISCOVERS
# them: the first three event types of every session, concatenated in
# order, counted, top-20. This is the table behind every Sankey/flow
# diagram and the input to "where do users actually start" product
# questions. Reuses the registered sessionization rule verbatim (same
# 30-min gap, same lag+cumsum session ids — B107 discipline); the path
# string aggregates through a sorted list bounded at 3 elements per
# session; global top-20 via TakeOrdered. All windows partition on
# user_id.
PATH_STEPS = 3
PATH_TOP = 20


@register(
    "session_path_mining",
    f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > {SESSION_GAP_SEC}
                 THEN 1 ELSE 0 END AS is_new
  FROM o
), sessions AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
), stepped AS (
  SELECT user_id, session_id, event_type,
         row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS step
  FROM sessions
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY step) AS path,
         CAST(count(*) AS BIGINT) AS path_len
  FROM stepped WHERE step <= {PATH_STEPS}
  GROUP BY user_id, session_id
)
SELECT path, path_len,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM paths
GROUP BY path, path_len
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOP}
""",
)
def session_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top opening paths — the first three event types per session,
    counted (B206); the discovery table funnels only verify. Session ids
    from the registered 30-min-gap rule; user-partitioned windows only;
    top-20 via TakeOrdered."""
    ev = read_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.lag("ts").over(wl).isNull()
            | (F.col("ts").cast("double") - F.lag("ts").over(wl).cast("double") > SESSION_GAP_SEC),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(wl.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    stepped = sessions.withColumn("step", F.row_number().over(ws)).filter(
        F.col("step") <= PATH_STEPS
    )
    paths = stepped.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.expr("transform(array_sort(collect_list(struct(step, event_type))), x -> x.event_type)"),
        ).alias("path"),
        F.count("*").cast("long").alias("path_len"),
    )
    return (
        paths.groupBy("path", "path_len")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOP)
    )


# ---------------------------------------------------------------------------
# B207: per-type value leaderboard (and the mergeable top-k state)
# ---------------------------------------------------------------------------
# "Largest transactions per type, live" — the ops dashboard staple. The
# batch form is a type-partitioned top-10 by (cents desc, event_id);
# what makes it worth registering is the STATE shape: top-k of a union
# is associative and idempotent (the KMV argument, B190), so the
# streaming twin (`stream_ops.stream_value_leaderboard`) maintains an
# array-of-structs state per type that provably converges to this
# query. Cents quantize once; NULL values are excluded.
LEADERBOARD_K = 10


@register(
    "events_value_leaderboard",
    f"""
WITH v AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, event_id, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents DESC, event_id) AS rk
  FROM v
)
SELECT event_type, CAST(rk AS BIGINT) AS rk, event_id, cents
FROM ranked WHERE rk <= {LEADERBOARD_K}
ORDER BY event_type, rk
""",
)
def events_value_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 events by value per type (B207) — the dashboard
    leaderboard whose top-k-of-union state the streaming twin maintains
    associatively."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy(F.col("cents").desc(), F.col("event_id"))
    return (
        v.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= LEADERBOARD_K)
        .select("event_type", "rk", "event_id", "cents")
        .orderBy("event_type", "rk")
    )


# ---------------------------------------------------------------------------
# B208: dup-transaction window sensitivity (tuning the retry window)
# ---------------------------------------------------------------------------
# B163 counts duplicate-looking transactions at ONE window; choosing
# that window is the actual decision (too narrow misses slow retries,
# too wide flags legitimate repeat purchases), and the sensitivity
# curve across {1s, 10s, 60s, 300s} is how it gets made. ONE
# (user, type, cents) self-join at the WIDEST window produces each
# pair's gap; per-window counts are then map-side CASE sums over the
# gap — the B201 one-pass-tagged-then-exploded discipline, applied to
# the join family. Output: one row per (event_type, window).
DUP_WINDOW_GRID_SEC = [1, 10, 60, 300]


def _dup_window_curve_oracle() -> str:
    grid = ", ".join(f"({w})" for w in DUP_WINDOW_GRID_SEC)
    return f"""
WITH txn AS (
  SELECT event_id, event_type, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), gaps AS (
  SELECT a.event_type, epoch(b.ts) - epoch(a.ts) AS gap_sec
  FROM txn a JOIN txn b
    ON b.user_id = a.user_id AND b.cents = a.cents AND b.event_type = a.event_type
   AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
   AND epoch(b.ts) - epoch(a.ts) <= {max(DUP_WINDOW_GRID_SEC)}
), grid(w) AS (VALUES {grid}),
base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_txn FROM txn GROUP BY event_type
), counts AS (
  SELECT g.event_type, gr.w,
         CAST(sum(CASE WHEN g.gap_sec <= gr.w THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pairs
  FROM gaps g CROSS JOIN grid gr
  GROUP BY g.event_type, gr.w
)
SELECT b.event_type, CAST(gr.w AS BIGINT) AS window_sec, b.n_txn,
       coalesce(c.n_dup_pairs, 0) AS n_dup_pairs,
       CAST(coalesce(c.n_dup_pairs, 0) * 1000000 // b.n_txn AS BIGINT) AS dup_ppm
FROM base b CROSS JOIN grid gr
LEFT JOIN counts c ON c.event_type = b.event_type AND c.w = gr.w
ORDER BY b.event_type, window_sec
"""


@register("events_dup_window_sensitivity", _dup_window_curve_oracle())
def events_dup_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-pair counts per candidate retry window from one widest-
    window self-join (B208) — the sensitivity curve that tunes the B163
    audit's window."""
    ev = read_table(spark, sf_dir, "events")
    txn = ev.filter(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    a, b = txn.alias("a"), txn.alias("b")
    wmax = max(DUP_WINDOW_GRID_SEC)
    gaps = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.cents") == F.col("a.cents"))
        & (F.col("b.event_type") == F.col("a.event_type"))
        & (
            (F.col("b.ts") > F.col("a.ts"))
            | ((F.col("b.ts") == F.col("a.ts")) & (F.col("b.event_id") > F.col("a.event_id")))
        )
        & (F.col("b.ts").cast("double") - F.col("a.ts").cast("double") <= wmax),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.ts").cast("double") - F.col("a.ts").cast("double")).alias("gap_sec"),
    )
    grid = spark.createDataFrame([(w,) for w in DUP_WINDOW_GRID_SEC], "w int")
    base = txn.groupBy("event_type").agg(F.count("*").cast("long").alias("n_txn"))
    counts = (
        gaps.crossJoin(F.broadcast(grid))
        .groupBy("event_type", "w")
        .agg(
            F.sum(F.when(F.col("gap_sec") <= F.col("w"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_pairs")
        )
    )
    return (
        base.crossJoin(F.broadcast(grid))
        .join(counts, ["event_type", "w"], "left")
        .select(
            "event_type",
            F.col("w").cast("long").alias("window_sec"),
            "n_txn",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("long").alias("n_dup_pairs"),
            F.expr("coalesce(n_dup_pairs, 0) * 1000000 div n_txn")
            .cast("long")
            .alias("dup_ppm"),
        )
        .orderBy("event_type", "window_sec")
    )


# ---------------------------------------------------------------------------
# B217: STL-residual anomaly gate (the loop B167 promised, closed)
# ---------------------------------------------------------------------------
# B167's docstring says the residual "is what the anomaly gates should
# consume" — this op consumes it: hours whose |residual| exceeds 3x the
# exact MAD of the residual series, with trend and seasonality removed
# by algebra first, so a traffic spike during the daily peak and a dip
# at 4am are judged against what the decomposition says those hours
# should look like. The oracle embeds the registered B167 SQL verbatim
# (B107 discipline); median/MAD use the exact-rank form over the
# reduced hourly grid. Output: flagged hours only.
def _stl_anomaly_oracle() -> str:
    from ..queries import REGISTRY as _EQ_REGISTRY

    stl = _EQ_REGISTRY["events_stl_decompose"].oracle
    return f"""
WITH stl AS ({stl}),
ranked AS (
  SELECT hour_epoch, n_events, residual25,
         abs(residual25) AS ar,
         row_number() OVER (ORDER BY abs(residual25), hour_epoch) AS rk,
         count(*) OVER () AS n
  FROM stl
), med AS (
  SELECT max(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT) THEN ar END) AS mad1
  FROM ranked
)
SELECT r.hour_epoch, r.n_events, r.residual25,
       CAST(med.mad1 AS BIGINT) AS resid_mad,
       CASE WHEN r.residual25 > 0 THEN 'high' ELSE 'low' END AS side
FROM ranked r CROSS JOIN med
WHERE r.ar > 3 * greatest(med.mad1, 25)
ORDER BY r.hour_epoch
"""


@register("events_stl_residual_anomaly", _stl_anomaly_oracle())
def events_stl_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose |STL residual| exceeds 3x the residual MAD (B217) —
    anomaly detection on the trend/seasonality-free signal; composes
    the registered B167 decomposition verbatim. All windows run over
    the reduced hourly grid (the seasonal/CUSUM family's deliberate
    bounded single-partition sweep); the MAD floor (one c*25 count unit)
    keeps a dead-flat series from flagging noise."""
    stl = events_stl_decompose(spark, sf_dir)
    wr = Window.orderBy(F.abs(F.col("residual25")), F.col("hour_epoch"))
    wn = Window.partitionBy()
    ranked = stl.select(
        "hour_epoch",
        "n_events",
        "residual25",
        F.abs("residual25").alias("ar"),
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    med = ranked.agg(
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.5).cast("long"), F.col("ar"))
        ).alias("mad1")
    )
    return (
        ranked.crossJoin(F.broadcast(med))
        .filter(F.col("ar") > 3 * F.greatest(F.col("mad1"), F.lit(25)))
        .select(
            "hour_epoch",
            "n_events",
            "residual25",
            F.col("mad1").cast("long").alias("resid_mad"),
            F.when(F.col("residual25") > 0, "high").otherwise("low").alias("side"),
        )
        .orderBy("hour_epoch")
    )


# ---------------------------------------------------------------------------
# B219: growth accounting (new / retained / resurrected / churned)
# ---------------------------------------------------------------------------
# The canonical growth decomposition (the "growth accounting" identity:
# active_w = new + retained + resurrected; churned_w = active_{w-1} −
# retained_w): per epoch-week, users split by whether they were active
# last week and whether this is their first week ever. Stickiness
# (B141) gives the ratio; THIS gives the flows that move it. Shape:
# one distinct (user, week) reduce, a self-join on (user, week−1) —
# both uniform keys — and the per-user min-week broadcast-scale first
# table. Output: one row per week.
@register(
    "events_growth_accounting",
    """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week FROM events
), fw AS (
  SELECT user_id, CAST(min(week) AS BIGINT) AS first_week FROM uw GROUP BY user_id
), flags AS (
  SELECT c.week, c.user_id,
         CASE WHEN f.first_week = c.week THEN 1 ELSE 0 END AS is_new,
         CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS was_active
  FROM uw c
  JOIN fw f ON f.user_id = c.user_id
  LEFT JOIN uw p ON p.user_id = c.user_id AND p.week = c.week - 1
), churn AS (
  SELECT p.week + 1 AS week, CAST(count(*) AS BIGINT) AS n_churned
  FROM uw p LEFT JOIN uw c ON c.user_id = p.user_id AND c.week = p.week + 1
  WHERE c.user_id IS NULL
  GROUP BY p.week + 1
)
SELECT f.week,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(f.is_new) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN f.is_new = 0 AND f.was_active = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       CAST(sum(CASE WHEN f.is_new = 0 AND f.was_active = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resurrected,
       CAST(coalesce(max(ch.n_churned), 0) AS BIGINT) AS n_churned
FROM flags f LEFT JOIN churn ch ON ch.week = f.week
GROUP BY f.week
ORDER BY f.week
""",
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly new/retained/resurrected/churned user flows (B219) — the
    growth-accounting identity behind every DAU chart; distinct
    (user, week) reduce + uniform-key self-joins."""
    ev = read_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.expr("cast(floor(cast(ts as double) / 604800) as bigint)").alias("week")
    ).distinct()
    fw = uw.groupBy("user_id").agg(F.min("week").cast("long").alias("first_week"))
    prev = uw.select("user_id", (F.col("week") + 1).alias("week"), F.lit(1).alias("was_active"))
    flags = (
        uw.join(fw, "user_id")
        .join(prev, ["user_id", "week"], "left")
        .select(
            "week",
            F.when(F.col("first_week") == F.col("week"), 1).otherwise(0).alias("is_new"),
            F.coalesce("was_active", F.lit(0)).alias("was_active"),
        )
    )
    # churned in week w = users active in w-1 with no activity in w
    churn = (
        uw.select("user_id", (F.col("week") + 1).alias("week"))
        .join(uw, ["user_id", "week"], "left_anti")
        .groupBy("week")
        .agg(F.count("*").cast("long").alias("n_churned"))
    )
    return (
        flags.groupBy("week")
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum("is_new").cast("long").alias("n_new"),
            F.sum(F.when((F.col("is_new") == 0) & (F.col("was_active") == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
            F.sum(F.when((F.col("is_new") == 0) & (F.col("was_active") == 0), 1).otherwise(0))
            .cast("long")
            .alias("n_resurrected"),
        )
        .join(churn, "week", "left")
        .select(
            "week",
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# B221: experiment-gate capstone (the A/B family's release gate)
# ---------------------------------------------------------------------------
# B216 asks "is the corpus safe to ship?"; this asks the experiment
# platform's version — "is this readout trustworthy and decided?" — as
# one checked query over three REGISTERED experiment ops (their SQL
# embedded verbatim, the B107/B216 discipline): (1) SRM — any event
# type whose arm split fails the chi-square check invalidates
# everything downstream; (2) the pooled conversion z-test's
# significance; (3) delta-method CI separation on the ratio metric
# (value per active day) — CIs that do not overlap decide the ratio
# axis. Each row: (check, value, threshold, pass).
def _experiment_gate_oracle() -> str:
    from ..queries import REGISTRY as _XQ_REGISTRY

    missing = [
        n
        for n in ("events_srm_check", "events_ab_conversion_test", "events_ratio_delta_method")
        if n not in _XQ_REGISTRY
    ]
    if missing:
        raise ImportError(
            f"experiment_gate_report needs {missing} — partial-import context; skipping"
        )
    srm = _XQ_REGISTRY["events_srm_check"].oracle
    conv = _XQ_REGISTRY["events_ab_conversion_test"].oracle
    ratio = _XQ_REGISTRY["events_ratio_delta_method"].oracle
    return f"""
SELECT * FROM (
  SELECT 'srm_flagged_types' AS check_name,
         CAST(coalesce(sum(srm_flag), 0) AS BIGINT) AS value,
         CAST(0 AS BIGINT) AS threshold,
         coalesce(sum(srm_flag), 0) <= 0 AS pass
  FROM ({srm})
  UNION ALL
  SELECT 'conversion_z_significant',
         CAST(max(significant_95) AS BIGINT),
         CAST(1 AS BIGINT),
         max(significant_95) >= 1
  FROM ({conv})
  UNION ALL
  SELECT 'ratio_ci_separated',
         CAST(CASE WHEN min(hi_of_lower) < max(lo_of_higher) THEN 1 ELSE 0 END AS BIGINT),
         CAST(1 AS BIGINT),
         CASE WHEN min(hi_of_lower) < max(lo_of_higher) THEN 1 ELSE 0 END >= 1
  FROM (
    SELECT CASE WHEN ratio_micro = min(ratio_micro) OVER () THEN ci_hi_micro END AS hi_of_lower,
           CASE WHEN ratio_micro = max(ratio_micro) OVER () THEN ci_lo_micro END AS lo_of_higher
    FROM ({ratio})
  )
)
ORDER BY check_name
"""


@register("experiment_gate_report", _experiment_gate_oracle())
def experiment_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three registered experiment checks — SRM validity, conversion
    significance, ratio-CI separation — as one (check, value, threshold,
    pass) gate table (B221); composes the registered builders."""
    srm = (
        events_srm_check(spark, sf_dir)
        .agg(F.coalesce(F.sum("srm_flag"), F.lit(0)).cast("long").alias("v"))
        .select(
            F.lit("srm_flagged_types").alias("check_name"),
            F.col("v").alias("value"),
            F.lit(0).cast("long").alias("threshold"),
            (F.col("v") <= 0).alias("pass"),
        )
    )
    conv = (
        events_ab_conversion_test(spark, sf_dir)
        .agg(F.max("significant_95").cast("long").alias("v"))
        .select(
            F.lit("conversion_z_significant").alias("check_name"),
            F.col("v").alias("value"),
            F.lit(1).cast("long").alias("threshold"),
            (F.col("v") >= 1).alias("pass"),
        )
    )
    r = events_ratio_delta_method(spark, sf_dir)
    wall = Window.partitionBy()
    marks = r.select(
        F.when(F.col("ratio_micro") == F.min("ratio_micro").over(wall), F.col("ci_hi_micro")).alias(
            "hi_of_lower"
        ),
        F.when(F.col("ratio_micro") == F.max("ratio_micro").over(wall), F.col("ci_lo_micro")).alias(
            "lo_of_higher"
        ),
    )
    ratio = marks.agg(
        F.when(F.min("hi_of_lower") < F.max("lo_of_higher"), 1).otherwise(0).cast("long").alias("v")
    ).select(
        F.lit("ratio_ci_separated").alias("check_name"),
        F.col("v").alias("value"),
        F.lit(1).cast("long").alias("threshold"),
        (F.col("v") >= 1).alias("pass"),
    )
    return srm.unionByName(conv).unionByName(ratio).orderBy("check_name")


# ---------------------------------------------------------------------------
# B239: histogram-sketch value bands — the mergeable twin of B137 (r12)
# ---------------------------------------------------------------------------
# B137's exact per-(type, day) percentile ribbon needs the day's raw
# values; a streaming dashboard can't keep them. The standard trade is a
# FIXED-BIN HISTOGRAM sketch: per (type, day, bin) counts are plain sums
# — associative, mergeable, restart-safe (the KMV/MG argument) — and any
# quantile reads back as "the first bin whose cumulative count reaches
# ceil(n·q)", with error bounded by the bin width BY CONSTRUCTION. The
# batch form here is the AUDIT twin: deterministic SQL both engines run
# (bin = floor-div of cents — written as (cents − pmod)/BIN in Spark
# because Spark's `div` truncates toward zero while DuckDB's `//`
# floors; equal on nonneg cents, kept negative-safe deliberately), so
# the hash check pins the exact arithmetic the streaming state
# (`stream_value_hist`) converges to. Scale: state is |types|·|days|·
# |occupied bins| rows — bounded by value range/BIN_CENTS, independent
# of event volume; the quantile read is a per-key cumulative over ≤
# |bins| rows.
VALUE_HIST_BIN_CENTS = 500


@register(
    "events_value_bands_hist",
    f"""
WITH v AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), b AS (
  SELECT event_type, d, cents // {VALUE_HIST_BIN_CENTS} AS bin,
         CAST(count(*) AS BIGINT) AS c
  FROM v GROUP BY event_type, d, cents // {VALUE_HIST_BIN_CENTS}
), cum AS (
  SELECT event_type, d, bin, c,
         sum(c) OVER (PARTITION BY event_type, d ORDER BY bin) AS cc,
         sum(c) OVER (PARTITION BY event_type, d) AS n
  FROM b
)
SELECT event_type, d AS day_epoch_days, CAST(max(n) AS BIGINT) AS n_values,
       CAST(min(CASE WHEN cc >= ceil(n * 0.5) THEN bin END)
            * {VALUE_HIST_BIN_CENTS} AS BIGINT) AS p50_bin_cents,
       CAST(min(CASE WHEN cc >= ceil(n * 0.95) THEN bin END)
            * {VALUE_HIST_BIN_CENTS} AS BIGINT) AS p95_bin_cents
FROM cum
GROUP BY event_type, d
ORDER BY event_type, d
""",
)
def events_value_bands_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch P50/P95 value bands per (event_type, day) (B239):
    fixed-bin counts + per-key cumulative read-back — the mergeable,
    bounded-state form of B137 whose error is at most one bin width."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.select(
        "event_type",
        F.expr("cast(floor(unix_timestamp(ts) / 86400) as bigint)").alias("d"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    b = (
        v.withColumn(
            "bin",
            F.expr(
                f"(cents - pmod(cents, {VALUE_HIST_BIN_CENTS})) div {VALUE_HIST_BIN_CENTS}"
            ),
        )
        .groupBy("event_type", "d", "bin")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return value_bands_from_hist(b)


def value_bands_from_hist(b: DataFrame) -> DataFrame:
    """Quantile read-back over a (event_type, d, bin, c) histogram frame —
    ONE definition shared by the batch audit twin and the streaming
    state's read path so the two cannot drift."""
    w_cum = (
        Window.partitionBy("event_type", "d")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type", "d")
    cum = b.select(
        "event_type",
        "d",
        "bin",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(w_all).alias("n"),
    )
    return (
        cum.groupBy("event_type", "d")
        .agg(
            F.max("n").cast("long").alias("n_values"),
            (
                F.min(F.when(F.col("cc") >= F.ceil(F.col("n") * 0.5), F.col("bin")))
                * VALUE_HIST_BIN_CENTS
            )
            .cast("long")
            .alias("p50_bin_cents"),
            (
                F.min(F.when(F.col("cc") >= F.ceil(F.col("n") * 0.95), F.col("bin")))
                * VALUE_HIST_BIN_CENTS
            )
            .cast("long")
            .alias("p95_bin_cents"),
        )
        .select(
            "event_type",
            F.col("d").alias("day_epoch_days"),
            "n_values",
            "p50_bin_cents",
            "p95_bin_cents",
        )
        .orderBy("event_type", "day_epoch_days")
    )


# ---------------------------------------------------------------------------
# B244: zone-map (min/max) pruning audit — what the B51 layout actually buys
# ---------------------------------------------------------------------------
# B51 lays events out in Morton order and B237 prices row order in
# compressed bytes; neither answers the scan-cost question a 100 TB
# reader asks: "for THIS predicate, how many files does each layout let
# me skip?" Parquet/Delta/Iceberg readers prune files from per-file
# min/max column statistics (zone maps), so the audit reproduces that
# decision exactly: per file and per layout (Morton vs ingestion id
# order), the (user_id, event-time) min/max envelope; per predicate box,
# a file is SCANNED iff its envelope overlaps the box. Output grain is
# (predicate, layout): files scanned, rows scanned, true matching rows
# (layout-invariant), and the scan saving in ppm of the corpus — the
# number that justifies (or kills) an OPTIMIZE ZORDER run. Predicate
# boxes are integer eighths of the corpus extremes, so every bound is
# exact integer arithmetic both engines replay bit-for-bit. Scale: the
# zone-map table is |files| rows (corpus div 1000) built by one
# map-side-partial groupBy per layout; predicates are a 4-row literal
# grid cross-joined against it — nothing here grows faster than the
# file count, and the per-file stats are exactly what the storage layer
# already maintains for free at 100 TB.
_PRUNE_PREDS = [
    # (pred_id, u_lo_8, u_hi_8, t_lo_8, t_hi_8) — half-open [lo, hi) boxes
    # in eighths of the (user_id, event-time) extremes
    ("p1_user_low", 0, 2, 0, 8),
    ("p2_mid_box", 2, 4, 2, 4),
    ("p3_recent", 0, 8, 6, 8),
    ("p4_tight", 3, 4, 3, 4),
]


def _prune_pred_values_sql() -> str:
    return ", ".join(f"('{p}', {a}, {b}, {c}, {d})" for p, a, b, c, d in _PRUNE_PREDS)


@register(
    "events_zone_map_pruning",
    f"""
WITH ext AS (
  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1, max(user_id) AS umax,
         count(*) AS n_total
  FROM events
), keyed AS (
  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
         CAST(e.user_id * 256 // (ext.umax + 1) AS BIGINT) AS ub,
         CAST((epoch_us(e.ts) - ext.t0) * 256 // (ext.t1 - ext.t0 + 1) AS BIGINT) AS hb
  FROM events e, ext
), z AS (
  SELECT event_id, user_id, ts_us, CAST({_ZVAL_DDB} AS BIGINT) AS zval FROM keyed
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY zval, event_id) AS rn FROM z
), placed AS (
  SELECT event_id, user_id, ts_us,
         CAST((rn - 1) // {ZORDER_ROWS_PER_FILE} AS BIGINT) AS z_file,
         CAST(event_id // {ZORDER_ROWS_PER_FILE} AS BIGINT) AS i_file
  FROM ranked
), zones AS (
  SELECT 'zorder' AS layout, z_file AS file_id,
         min(user_id) AS u_min, max(user_id) AS u_max,
         min(ts_us) AS t_min, max(ts_us) AS t_max,
         count(*) AS n_rows
  FROM placed GROUP BY z_file
  UNION ALL
  SELECT 'ingest' AS layout, i_file AS file_id,
         min(user_id) AS u_min, max(user_id) AS u_max,
         min(ts_us) AS t_min, max(ts_us) AS t_max,
         count(*) AS n_rows
  FROM placed GROUP BY i_file
), preds(pred_id, u_lo_8, u_hi_8, t_lo_8, t_hi_8) AS (
  VALUES {_prune_pred_values_sql()}
), boxes AS (
  SELECT p.pred_id,
         CAST(p.u_lo_8 * (ext.umax + 1) // 8 AS BIGINT) AS u_lo,
         CAST(p.u_hi_8 * (ext.umax + 1) // 8 AS BIGINT) AS u_hi,
         CAST(ext.t0 + p.t_lo_8 * (ext.t1 - ext.t0 + 1) // 8 AS BIGINT) AS t_lo,
         CAST(ext.t0 + p.t_hi_8 * (ext.t1 - ext.t0 + 1) // 8 AS BIGINT) AS t_hi,
         ext.n_total
  FROM preds p, ext
), matched AS (
  SELECT b.pred_id, CAST(count(*) AS BIGINT) AS n_rows_matched
  FROM boxes b JOIN placed r
    ON r.user_id >= b.u_lo AND r.user_id < b.u_hi
   AND r.ts_us >= b.t_lo AND r.ts_us < b.t_hi
  GROUP BY b.pred_id
), scanned AS (
  SELECT b.pred_id, z.layout,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(CASE WHEN z.u_min < b.u_hi AND z.u_max >= b.u_lo
                        AND z.t_min < b.t_hi AND z.t_max >= b.t_lo
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_files_scanned,
         CAST(sum(CASE WHEN z.u_min < b.u_hi AND z.u_max >= b.u_lo
                        AND z.t_min < b.t_hi AND z.t_max >= b.t_lo
                       THEN z.n_rows ELSE 0 END) AS BIGINT) AS n_rows_scanned,
         max(b.n_total) AS n_total
  FROM boxes b CROSS JOIN zones z
  GROUP BY b.pred_id, z.layout
)
SELECT s.pred_id, s.layout, s.n_files, s.n_files_scanned, s.n_rows_scanned,
       COALESCE(m.n_rows_matched, 0) AS n_rows_matched,
       CAST((s.n_total - s.n_rows_scanned) * 1000000 // s.n_total AS BIGINT)
         AS scan_save_ppm
FROM scanned s LEFT JOIN matched m ON m.pred_id = s.pred_id
ORDER BY s.pred_id, s.layout
""",
)
def events_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file-pruning audit over the B51 Morton layout vs
    ingestion id order (B244): per (predicate box, layout) the files a
    min/max-stats reader skips, the rows it still scans, and the saving
    in ppm. Reuses the registered ``events_zorder_layout`` file
    assignment; the ingestion layout is the id-range bucket
    ``event_id div ROWS_PER_FILE`` (event ids are the ingestion-order
    proxy throughout this repo)."""
    from ..operators.quantiles import materialize_scratch

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    layout = events_zorder_layout(spark, sf_dir).select("event_id", "file_id")
    # The Morton placement join is the expensive subtree and FOUR branches
    # consume it (two zone aggregates, the row-match probe, the extent
    # aggregate); spill it once so each re-roots at the scratch scan
    # instead of re-running the zorder layout (27 events scans in the
    # executed plan before — VERDICT r13 #2 family).
    placed = materialize_scratch(
        ev.join(layout, "event_id").select(
            "event_id",
            "user_id",
            "ts_us",
            F.col("file_id").alias("z_file"),
            F.expr(f"event_id div {ZORDER_ROWS_PER_FILE}").cast("long").alias("i_file"),
        ),
        "zonemap_placed",
    )

    def _zones(file_col: str, tag: str) -> DataFrame:
        return placed.groupBy(F.col(file_col).alias("file_id")).agg(
            F.min("user_id").alias("u_min"),
            F.max("user_id").alias("u_max"),
            F.min("ts_us").alias("t_min"),
            F.max("ts_us").alias("t_max"),
            F.count("*").alias("n_rows"),
        ).select(F.lit(tag).alias("layout"), "*")

    zones = _zones("z_file", "zorder").unionByName(_zones("i_file", "ingest"))
    ext = ev.agg(
        F.min("ts_us").alias("t0"),
        F.max("ts_us").alias("t1"),
        F.max("user_id").alias("umax"),
        F.count("*").alias("n_total"),
    )
    preds = spark.createDataFrame(
        _PRUNE_PREDS, "pred_id: string, u_lo_8: long, u_hi_8: long, t_lo_8: long, t_hi_8: long"
    )
    boxes = preds.crossJoin(F.broadcast(ext)).select(
        "pred_id",
        F.expr("u_lo_8 * (umax + 1) div 8").cast("long").alias("u_lo"),
        F.expr("u_hi_8 * (umax + 1) div 8").cast("long").alias("u_hi"),
        F.expr("t0 + t_lo_8 * (t1 - t0 + 1) div 8").cast("long").alias("t_lo"),
        F.expr("t0 + t_hi_8 * (t1 - t0 + 1) div 8").cast("long").alias("t_hi"),
        "n_total",
    )
    matched = (
        placed.join(
            F.broadcast(boxes),
            (F.col("user_id") >= F.col("u_lo"))
            & (F.col("user_id") < F.col("u_hi"))
            & (F.col("ts_us") >= F.col("t_lo"))
            & (F.col("ts_us") < F.col("t_hi")),
        )
        .groupBy("pred_id")
        .agg(F.count("*").cast("long").alias("n_rows_matched"))
    )
    overlap = (
        (F.col("u_min") < F.col("u_hi"))
        & (F.col("u_max") >= F.col("u_lo"))
        & (F.col("t_min") < F.col("t_hi"))
        & (F.col("t_max") >= F.col("t_lo"))
    )
    scanned = (
        zones.crossJoin(F.broadcast(boxes))
        .groupBy("pred_id", "layout")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum(F.when(overlap, 1).otherwise(0)).cast("long").alias("n_files_scanned"),
            F.sum(F.when(overlap, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("n_rows_scanned"),
            F.max("n_total").alias("n_total"),
        )
    )
    return (
        scanned.join(matched, "pred_id", "left")
        .select(
            "pred_id",
            "layout",
            "n_files",
            "n_files_scanned",
            "n_rows_scanned",
            F.coalesce("n_rows_matched", F.lit(0)).cast("long").alias("n_rows_matched"),
            F.expr("(n_total - n_rows_scanned) * 1000000 div n_total")
            .cast("long")
            .alias("scan_save_ppm"),
        )
        .orderBy("pred_id", "layout")
    )


# ---------------------------------------------------------------------------
# B247: join-cardinality estimation audit — predict the shuffle explosion
# BEFORE paying for it
# ---------------------------------------------------------------------------
# The most expensive Spark incident shape is a key-equi-join whose output
# is quadratically larger than either input (the user_id self-join here:
# |out| = Σ_u c_u²). B72 audits groupBy skew; this audits JOIN OUTPUT
# size — the number an optimizer's statistics would estimate and a
# planner should check before launching the join. Two numbers, computed
# WITHOUT materializing a single joined row: the exact output size from
# the per-key count aggregate (Σ c², one map-side-partial groupBy), and
# the estimate a 1/16 deterministic KEY-sample gives (sample keys by
# multiplicative hash, sum c² over sampled keys, scale by 16) — key
# sampling, not row sampling, because row sampling biases c² down by p².
# Alongside: the top-10 explosion keys with their ppm share of the
# output, the rows an engineer actually reads when the estimate says
# "don't run this". Integer arithmetic throughout; at 100 TB both
# aggregates are one pass over the fact table's join column.
_CARD_MULT = 2654435761  # Knuth multiplicative constant
_CARD_P = 2147483647
_CARD_RATE = 16


@register(
    "events_join_cardinality_audit",
    f"""
WITH c AS (
  SELECT user_id, count(*) AS n_events,
         CASE WHEN (user_id * {_CARD_MULT} % {_CARD_P}) % {_CARD_RATE} = 0
              THEN 1 ELSE 0 END AS sampled
  FROM events GROUP BY user_id
), tot AS (
  SELECT CAST(sum(n_events * n_events) AS BIGINT) AS exact_total_pairs,
         CAST({_CARD_RATE} * sum(CASE WHEN sampled = 1
                                      THEN n_events * n_events ELSE 0 END) AS BIGINT)
           AS est_total_pairs,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(sampled) AS BIGINT) AS n_sampled_keys
  FROM c
), top AS (
  SELECT user_id, n_events FROM c
  ORDER BY n_events * n_events DESC, user_id
  LIMIT 10
)
SELECT t.user_id, CAST(t.n_events AS BIGINT) AS n_events,
       CAST(t.n_events * t.n_events AS BIGINT) AS pairs_contrib,
       CAST(t.n_events * t.n_events * 1000000 // tot.exact_total_pairs AS BIGINT)
         AS contrib_ppm,
       tot.exact_total_pairs, tot.est_total_pairs,
       CAST(abs(tot.est_total_pairs - tot.exact_total_pairs) * 1000000
            // tot.exact_total_pairs AS BIGINT) AS est_err_ppm,
       tot.n_keys, tot.n_sampled_keys
FROM top t CROSS JOIN tot
ORDER BY pairs_contrib DESC, user_id
""",
)
def events_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs key-sampled join-output cardinality for the user_id
    self-join (B247), plus the top-10 explosion keys — all from one
    per-key count aggregate, never the join itself."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("n_events")).select(
        "user_id",
        "n_events",
        F.when(
            (F.col("user_id") * _CARD_MULT % _CARD_P) % _CARD_RATE == 0, 1
        ).otherwise(0).alias("sampled"),
    )
    tot = c.agg(
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("exact_total_pairs"),
        (
            F.lit(_CARD_RATE)
            * F.sum(
                F.when(F.col("sampled") == 1, F.col("n_events") * F.col("n_events")).otherwise(0)
            )
        )
        .cast("long")
        .alias("est_total_pairs"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum("sampled").cast("long").alias("n_sampled_keys"),
    )
    top = c.orderBy(
        (F.col("n_events") * F.col("n_events")).desc(), "user_id"
    ).limit(10)
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("n_events") * F.col("n_events")).cast("long").alias("pairs_contrib"),
            F.expr("n_events * n_events * 1000000 div exact_total_pairs")
            .cast("long")
            .alias("contrib_ppm"),
            "exact_total_pairs",
            "est_total_pairs",
            F.expr(
                "abs(est_total_pairs - exact_total_pairs) * 1000000 div exact_total_pairs"
            )
            .cast("long")
            .alias("est_err_ppm"),
            "n_keys",
            "n_sampled_keys",
        )
        .orderBy(F.col("pairs_contrib").desc(), "user_id")
    )


# ---------------------------------------------------------------------------
# B249: small-files compaction planner — the merge plan, not just the
# complaint
# ---------------------------------------------------------------------------
# Streaming ingest writes a file per (day, hour) trigger; low-traffic
# hours leave files far below the scan-efficient size and every reader
# pays the per-file open cost forever (the "small files problem" — the
# second-most-common 100 TB lakehouse incident after the B247 join
# explosion). The planner is pure algebra: per day, order the hour-files
# and assign merge groups by RUNNING-SUM CAPACITY BINNING (group =
# cumulative rows of PRECEDING files div target) — greedy, deterministic,
# and order-preserving, so merged files stay time-clustered (the B244
# zone-map win survives compaction). Output: one row per planned output
# file with its input-file count and row count, plus the ledger (files
# before/after, small-file share before/after in ppm). The running sum
# is a window over the (day, hour) AGGREGATE — |days|×24 rows, never the
# event corpus — partitioned by day.
_COMPACT_TARGET = 5000


@register(
    "events_compaction_plan",
    f"""
WITH files AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(date_part('hour', ts) AS BIGINT) AS hour,
         count(*) AS n_rows
  FROM events GROUP BY 1, 2
), binned AS (
  SELECT day, hour, n_rows,
         COALESCE(sum(n_rows) OVER (
           PARTITION BY day ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) // {_COMPACT_TARGET} AS group_id
  FROM files
), plan AS (
  SELECT day, group_id,
         CAST(count(*) AS BIGINT) AS n_files_in,
         CAST(sum(n_rows) AS BIGINT) AS rows_out,
         CAST(min(hour) AS BIGINT) AS hour_lo,
         CAST(max(hour) AS BIGINT) AS hour_hi
  FROM binned GROUP BY day, group_id
), ledger AS (
  SELECT (SELECT count(*) FROM files) AS n_files_before,
         (SELECT count(*) FROM plan) AS n_files_after,
         (SELECT count(CASE WHEN n_rows < {_COMPACT_TARGET // 2} THEN 1 END) * 1000000
            // count(*) FROM files) AS small_before_ppm,
         (SELECT count(CASE WHEN rows_out < {_COMPACT_TARGET // 2} THEN 1 END) * 1000000
            // count(*) FROM plan) AS small_after_ppm
)
SELECT p.day, CAST(p.group_id AS BIGINT) AS group_id, p.n_files_in, p.rows_out,
       p.hour_lo, p.hour_hi,
       CAST(g.n_files_before AS BIGINT) AS n_files_before,
       CAST(g.n_files_after AS BIGINT) AS n_files_after,
       CAST(g.small_before_ppm AS BIGINT) AS small_before_ppm,
       CAST(g.small_after_ppm AS BIGINT) AS small_after_ppm
FROM plan p CROSS JOIN ledger g
ORDER BY p.day, group_id
""",
)
def events_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy running-sum compaction plan over per-(day, hour) ingest
    files (B249): order-preserving capacity bins toward the target file
    size, with the before/after small-file ledger."""
    ev = read_table(spark, sf_dir, "events")
    files = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("day"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(F.count("*").alias("n_rows"))
    return compaction_plan_from_files(files)


def compaction_plan_from_files(files: DataFrame) -> DataFrame:
    """The B249 planner over a (day, hour, n_rows) file ledger — ONE
    definition shared by the batch query and the streaming twin
    (`streaming/stream_ops.stream_compaction_ledger`), so a plan computed
    from streamed state cannot drift from the batch plan."""
    binned = files.select(
        "day",
        "hour",
        "n_rows",
        # integer `div` (not float / + cast): the bit-for-bit oracle contract
        F.expr(
            f"coalesce(sum(n_rows) over (partition by day order by hour"
            f" rows between unbounded preceding and 1 preceding), 0)"
            f" div {_COMPACT_TARGET}"
        ).cast("long").alias("group_id"),
    )
    plan = binned.groupBy("day", "group_id").agg(
        F.count("*").cast("long").alias("n_files_in"),
        F.sum("n_rows").cast("long").alias("rows_out"),
        F.min("hour").cast("long").alias("hour_lo"),
        F.max("hour").cast("long").alias("hour_hi"),
    )
    small = _COMPACT_TARGET // 2
    ledger = (
        files.agg(
            F.count("*").cast("long").alias("n_files_before"),
            F.expr(f"count(CASE WHEN n_rows < {small} THEN 1 END) * 1000000 div count(*)")
            .cast("long")
            .alias("small_before_ppm"),
        )
        .crossJoin(
            plan.agg(
                F.count("*").cast("long").alias("n_files_after"),
                F.expr(
                    f"count(CASE WHEN rows_out < {small} THEN 1 END) * 1000000 div count(*)"
                )
                .cast("long")
                .alias("small_after_ppm"),
            )
        )
    )
    return (
        plan.crossJoin(F.broadcast(ledger))
        .select(
            "day",
            "group_id",
            "n_files_in",
            "rows_out",
            "hour_lo",
            "hour_hi",
            "n_files_before",
            "n_files_after",
            "small_before_ppm",
            "small_after_ppm",
        )
        .orderBy("day", "group_id")
    )


# ---------------------------------------------------------------------------
# B252: priority sampling — ONE tiny sample that answers EVERY subset-sum
# question, with the estimator audited against exact
# ---------------------------------------------------------------------------
# B76's weighted reservoir draws a fixed-size sample for one population;
# priority sampling (Duffield–Lund–Thorup) is the stronger contract a
# telemetry pipeline wants: keep the k items with largest priority
# q_i = w_i / u_i (u_i deterministic-uniform per item), remember only the
# (k+1)-th priority τ, and then ANY subset sum Σ_{i∈S} w_i is estimated
# unbiasedly by Σ_{i∈S∩sample} max(w_i, τ) — near-optimal variance among
# all k-sample schemes. Integers end-to-end: u in microunits from the
# portable md5-prefix hash of the event id, q = w·10⁶ div u_µ (exactly
# ⌊w/u⌋ in weight units, so τ and w compare directly), w = value cents.
# The audit estimates per-event-type revenue (a subset-sum the sample was
# never stratified for) and reports the ppm error beside exact. Scale:
# the sample is a global top-(k+1) — TakeOrderedAndProject's per-partition
# pre-reduce, k+1 rows per partition to the driver merge, never a sort;
# the exact side is one map-side-partial groupBy (at 100 TB you'd keep
# ONLY the sample; exact here is the audit's whole point).
_PRIO_K = 64


@register(
    "events_priority_sample_audit",
    f"""
WITH w AS (
  SELECT event_id, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         1 + CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 1000000 AS u_micro
  FROM events
), q AS (
  SELECT event_id, event_type, cents,
         cents * 1000000 // u_micro AS prio
  FROM w
), topk1 AS (
  SELECT * FROM q ORDER BY prio DESC, event_id LIMIT {_PRIO_K + 1}
), tau AS (
  -- n <= k means the sample is exhaustive: the DLT estimator sets tau = 0
  -- (est = w exactly); min(prio) would overestimate
  SELECT CASE WHEN count(*) < 65 THEN 0 ELSE min(prio) END AS tau FROM topk1
), sample AS (
  SELECT * FROM topk1 ORDER BY prio DESC, event_id LIMIT {_PRIO_K}
), est AS (
  SELECT s.event_type,
         CAST(sum(CASE WHEN s.cents > t.tau THEN s.cents ELSE t.tau END) AS BIGINT)
           AS est_cents,
         CAST(count(*) AS BIGINT) AS n_sampled
  FROM sample s CROSS JOIN tau t
  GROUP BY s.event_type
), exact AS (
  SELECT event_type, CAST(sum(cents) AS BIGINT) AS exact_cents,
         CAST(count(*) AS BIGINT) AS n_events
  FROM w GROUP BY event_type
)
SELECT x.event_type, x.n_events, x.exact_cents,
       COALESCE(e.n_sampled, 0) AS n_sampled,
       COALESCE(e.est_cents, 0) AS est_cents,
       CAST(abs(COALESCE(e.est_cents, 0) - x.exact_cents) * 1000000
            // x.exact_cents AS BIGINT) AS err_ppm
FROM exact x LEFT JOIN est e ON e.event_type = x.event_type
ORDER BY x.event_type
""",
)
def events_priority_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-sampling subset-sum estimator audited against exact
    per-type revenue (B252): top-k by w/u priority, τ-threshold
    estimator max(w, τ), deterministic microunit uniforms."""
    ev = read_table(spark, sf_dir, "events")
    w = ev.select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        (
            F.lit(1)
            + F.expr(
                "cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint)"
            )
            % 1000000
        ).alias("u_micro"),
    )
    q = w.select(
        "event_id", "event_type", "cents", F.expr("cents * 1000000 div u_micro").alias("prio")
    )
    topk1 = q.orderBy(F.col("prio").desc(), "event_id").limit(_PRIO_K + 1)
    # n <= k -> exhaustive sample -> tau = 0 (estimator exact), see oracle
    tau = topk1.agg(F.count("*").alias("nk"), F.min("prio").alias("mp")).select(
        F.when(F.col("nk") < _PRIO_K + 1, F.lit(0)).otherwise(F.col("mp")).alias("tau")
    )
    sample = topk1.orderBy(F.col("prio").desc(), "event_id").limit(_PRIO_K)
    est = (
        sample.crossJoin(F.broadcast(tau))
        .groupBy("event_type")
        .agg(
            F.sum(F.greatest(F.col("cents"), F.col("tau"))).cast("long").alias("est_cents"),
            F.count("*").cast("long").alias("n_sampled"),
        )
    )
    exact = w.groupBy("event_type").agg(
        F.sum("cents").cast("long").alias("exact_cents"),
        F.count("*").cast("long").alias("n_events"),
    )
    return (
        exact.join(F.broadcast(est), "event_type", "left")
        .select(
            "event_type",
            "n_events",
            "exact_cents",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("est_cents", F.lit(0)).cast("long").alias("est_cents"),
            F.expr("abs(coalesce(est_cents, 0) - exact_cents) * 1000000 div exact_cents")
            .cast("long")
            .alias("err_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B253: Shapley-value channel attribution — the coalition game, computed
# exactly
# ---------------------------------------------------------------------------
# B90 splits conversion credit by touch COUNT (linear / position rules);
# the game-theoretic answer marketers actually cite is the Shapley value
# of the coalition game v(S) = conversions explained by channel set S
# (Zhao et al.'s data-driven attribution): v(S) = Σ_{T ⊆ S} c(T), where
# c(T) counts users converting with touched-channel set EXACTLY T. With
# 4 channels the whole game is a 16-coalition table — the corpus reduces
# to c(T) by ONE bitmask aggregation (channel → bit, per-user bit_or,
# groupBy mask), and every remaining step is arithmetic on ≤16 rows.
# Exact integers throughout: φ is computed in 24ths (4! = 24, so the
# marginal-contribution weights |S|!·(4−|S|−1)! ∈ {6,2,2,6} are integers)
# via the full subset-sum formula — and the pytest cross-checks the known
# closed form for THIS v (each conversion splits equally among its
# touched channels: φ_i = Σ_{T∋i} c(T)/|T|), so the coalition machinery
# is verified against the theorem, not itself. Untouched conversions
# (empty T) enter every v(S) equally and cancel in the differences —
# asserted by the pytest's conservation check. Scale: one event-table
# pass + one |users| groupBy; the game itself never leaves 16 rows.
_SHAP_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]


@register(
    "events_shapley_attribution",
    f"""
WITH conv AS (
  SELECT user_id, min(ts) AS first_purchase_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), touch AS (
  SELECT c.user_id,
         COALESCE(bit_or(CASE e.event_type
             WHEN 'click' THEN 1 WHEN 'error' THEN 2
             WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END), 0) AS mask
  FROM conv c
  LEFT JOIN events e
    ON e.user_id = c.user_id AND e.ts < c.first_purchase_ts
   AND e.event_type <> 'purchase'
  GROUP BY c.user_id
), c_t AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS c FROM touch GROUP BY mask
), coalitions AS (
  SELECT CAST(u.s AS BIGINT) AS s FROM UNNEST(range(0, 16)) AS u(s)
), v AS (
  SELECT co.s, CAST(COALESCE(sum(ct.c), 0) AS BIGINT) AS v
  FROM coalitions co LEFT JOIN c_t ct ON (ct.mask & co.s) = ct.mask
  GROUP BY co.s
), channels(channel, bit) AS (
  VALUES {", ".join(f"('{ch}', {b})" for ch, b in _SHAP_CHANNELS)}
), phi AS (
  SELECT ch.channel,
         CAST(sum((CASE bit_count(vs.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                        WHEN 2 THEN 2 ELSE 6 END)
                  * (vi.v - vs.v)) AS BIGINT) AS phi_24
  FROM channels ch
  JOIN v vs ON (vs.s & ch.bit) = 0
  JOIN v vi ON vi.s = (vs.s | ch.bit)
  GROUP BY ch.channel
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_conversions,
         CAST(sum(CASE WHEN mask > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_touched_conversions
  FROM touch
)
SELECT p.channel, p.phi_24,
       CAST(p.phi_24 * 1000000 // (24 * greatest(t.n_touched_conversions, 1))
            AS BIGINT) AS phi_share_ppm,
       t.n_conversions, t.n_touched_conversions
FROM phi p CROSS JOIN tot t
ORDER BY p.channel
""",
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley attribution over the 4-channel coalition game
    (B253): bitmask touch sets, the 16-row v(S) table, integer 24ths
    marginal weights."""
    ev = read_table(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
    )
    # the ts predicate must live in the JOIN condition: filtering after a
    # left join would drop converted users whose every touch fails it,
    # instead of keeping them with an empty mask
    te = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"), "ts", bit.alias("bit")
    )
    touch = (
        conv.join(
            te,
            (F.col("t_user") == F.col("user_id"))
            & (F.col("ts") < F.col("first_purchase_ts")),
            "left",
        )
        .groupBy("user_id")
        .agg(F.coalesce(F.bit_or("bit"), F.lit(0)).alias("mask"))
    )
    # 16-row mask histogram, checkpointed: it feeds BOTH the coalition
    # v(S) table and the totals row, and without the cut each branch
    # re-executes the events join + per-user groupBy behind it (r14 opt)
    c_t = (
        touch.groupBy("mask")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    coalitions = spark.range(16).select(F.col("id").cast("long").alias("s"))
    v = (
        coalitions.join(
            F.broadcast(c_t), F.expr("(mask & s) = mask"), "left"
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("v"))
    )
    channels = spark.createDataFrame(_SHAP_CHANNELS, "channel: string, bit: long")
    vs = v.withColumnsRenamed({"s": "s0", "v": "v0"})
    vi = v.withColumnsRenamed({"s": "s1", "v": "v1"})
    weight = F.expr(
        "CASE bit_count(s0) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"
    )
    phi = (
        channels.join(F.broadcast(vs), F.expr("(s0 & bit) = 0"))
        .join(F.broadcast(vi), F.expr("s1 = (s0 | bit)"))
        .groupBy("channel")
        .agg(F.sum(weight * (F.col("v1") - F.col("v0"))).cast("long").alias("phi_24"))
    )
    # the totals derive EXACTLY from the 16-row mask histogram — reading
    # them from c_t instead of touch removes the second execution of the
    # events join + per-user groupBy (r14 opt: touch had two consumers,
    # and per-branch pruning defeats exchange reuse)
    tot = c_t.agg(
        F.sum("c").cast("long").alias("n_conversions"),
        F.sum(F.when(F.col("mask") > 0, F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_touched_conversions"),
    )
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "phi_24",
            F.expr("phi_24 * 1000000 div (24 * greatest(n_touched_conversions, 1))")
            .cast("long")
            .alias("phi_share_ppm"),
            "n_conversions",
            "n_touched_conversions",
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# B254: path conformance — how far each user's journey sits from the
# canonical one, in exact edit distance
# ---------------------------------------------------------------------------
# B206 mines frequent paths and B138 scores sequences under a trigram LM;
# neither answers the UX question "how many edits away from the canonical
# journey is each user?" — the metric that separates 'same flow, one
# detour' from 'different product'. Per user: the first 20 events (capped
# by a user-partitioned row_number BEFORE any collect, so a hot user
# cannot balloon a group) as a compact letter string in (ts, event_id)
# order; canonical = the modal path (ties to the lexicographically
# smallest); conformance = levenshtein(path, canonical) — built-in,
# unit-cost, and bit-identical in both engines. Output: the distance
# histogram with per-bucket conversion counts (does straying correlate
# with not purchasing?) and the canonical path as a pinned column.
# Scale: one user groupBy; the distance pass compares each user against
# ONE broadcast string — O(users · |path|²) map-side, no joins beyond
# the 1-row canonical.
_PATH_CAP = 20


@register(
    "events_path_conformance",
    f"""
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), paths AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS path,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM ranked WHERE rn <= {_PATH_CAP}
  GROUP BY user_id
), canon AS (
  SELECT path AS canonical_path FROM paths
  GROUP BY path ORDER BY count(*) DESC, path LIMIT 1
), dist AS (
  SELECT p.user_id, p.converted,
         CAST(levenshtein(p.path, c.canonical_path) AS BIGINT) AS edit_distance,
         c.canonical_path
  FROM paths p CROSS JOIN canon c
), tot AS (SELECT count(*) AS n_users FROM paths)
SELECT d.edit_distance,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(d.converted) AS BIGINT) AS n_converted,
       CAST(count(*) * 1000000 // max(t.n_users) AS BIGINT) AS share_ppm,
       max(d.canonical_path) AS canonical_path
FROM dist d CROSS JOIN tot t
GROUP BY d.edit_distance
ORDER BY d.edit_distance
""",
)
def events_path_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance histogram of user journeys vs the modal path (B254):
    capped letter paths, broadcast canonical, per-bucket conversion
    counts."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "event_type", "ts", "event_id", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _PATH_CAP)
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("le"))
                    )
                ),
                lambda x: x["le"],
            ),
            "",
        ).alias("path"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
    )
    canon = (
        paths.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(1)
        .select(F.col("path").alias("canonical_path"))
    )
    tot = paths.agg(F.count("*").alias("n_users"))
    dist = paths.crossJoin(F.broadcast(canon)).select(
        "converted",
        F.levenshtein("path", "canonical_path").cast("long").alias("edit_distance"),
        "canonical_path",
    )
    return (
        dist.crossJoin(F.broadcast(tot))
        .groupBy("edit_distance")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.expr("count(*) * 1000000 div max(n_users)").cast("long").alias("share_ppm"),
            F.max("canonical_path").alias("canonical_path"),
        )
        .orderBy("edit_distance")
    )


# ---------------------------------------------------------------------------
# B256: DISTINCT-count maintenance under retraction — the measure signed
# sums CANNOT maintain, and the auxiliary state that can
# ---------------------------------------------------------------------------
# B245's theorem (every associative signed sum is retraction-safe) has a
# famous non-member: COUNT(DISTINCT user). Deleting an event does NOT
# tell you whether its user still counts — some other event of theirs
# may survive — so no per-group scalar fold is correct. The textbook IVM
# fix is MULTIPLICITY (support-count) state: maintain net = Σ±1 per
# (group, user) — itself an associative signed sum, so order/boundary/
# restart-safe — and read distinct = #{user: net > 0}. State is bounded
# by the number of ACTIVE (group, user) pairs, not by event volume; the
# read-back is one filtered count over that state. The CDC log is
# synthesized deterministically (insert ids ≡/≢2 mod 3 across two steps,
# delete ids ≡0 mod 7 with full before-images in step 3); the ORACLE
# recomputes from the final snapshot, proving maintenance ≡
# recomputation. A deliberate negative contract rides the pytest: the
# naive signed fold of per-batch distinct counts gives the WRONG answer
# on this log — the operator exists because that shortcut fails.
@register(
    "events_distinct_cdc_maintenance",
    """
WITH snap AS (
  SELECT event_id, user_id, event_type FROM events WHERE event_id % 7 <> 0
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM snap GROUP BY event_type
ORDER BY event_type
""",
)
def events_distinct_cdc_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event count + distinct users maintained from a three-step
    I/D CDC log via multiplicity state (B256). Oracle = final-snapshot
    recompute."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    log = (
        ev.filter(F.col("event_id") % 3 != 2).select(
            F.lit("I").alias("op"), "user_id", "event_type"
        )
        .unionByName(
            ev.filter(F.col("event_id") % 3 == 2).select(
                F.lit("I").alias("op"), "user_id", "event_type"
            )
        )
        .unionByName(
            ev.filter(F.col("event_id") % 7 == 0).select(
                F.lit("D").alias("op"), "user_id", "event_type"
            )
        )
    )
    return distinct_from_multiplicity(multiplicity_fold(log)).orderBy("event_type")


def multiplicity_fold(log: DataFrame) -> DataFrame:
    """The B256 auxiliary state: net support count per (event_type,
    user_id) — an associative signed sum, shared by the batch query and
    the streaming twin so the two cannot drift."""
    return log.groupBy("event_type", "user_id").agg(
        F.sum(F.when(F.col("op") == "I", 1).otherwise(-1)).cast("long").alias("net")
    )


def distinct_from_multiplicity(state: DataFrame) -> DataFrame:
    """Read-back over the multiplicity state: events = Σ net, distinct
    users = #{net > 0}."""
    return state.groupBy("event_type").agg(
        F.sum("net").cast("long").alias("n_events"),
        F.sum(F.when(F.col("net") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_distinct_users"),
    )


# ---------------------------------------------------------------------------
# B258: Benjamini–Hochberg FDR gate — reading MANY experiment metrics
# without fooling yourself
# ---------------------------------------------------------------------------
# B160 reads one metric; a real experiment readout tests a ladder of them
# (per-event-type engagement here), and at m metrics the naive |z|≥1.96
# rule false-alarms at ~1−0.95^m. The standard fix ladder: Bonferroni
# (controls FWER, conservative) and Benjamini–Hochberg (controls FDR):
# sort p ascending, find the largest k with p_(k) ≤ k·q/m, reject ranks
# ≤ k. p-values never materialize — p_(k) ≤ k·q/m is equivalent to
# |z|_(k) ≥ Φ⁻¹(1 − k·q/2m), and those thresholds are LITERAL milli
# constants (standard normal quantiles, public math: q=0.10, m=4 →
# 2241/1960/1780/1645; Bonferroni 2498; raw 1960). Each metric's z is
# the B160 two-proportion statistic between the seeded arms for "user
# touched this event type". Scale: one user-level reduce per metric from
# the SAME pass (conditional aggregates over one groupBy), a 4-row rank
# window over the metric AGGREGATE, literal threshold join.
_FDR_METRICS = ["click", "error", "signup", "view"]
_FDR_BH_THR_MILLI = [2241, 1960, 1780, 1645]  # Phi^-1(1 - k*0.0125), k=1..4
_FDR_BONF_MILLI = 2498  # Phi^-1(1 - 0.05/8)
_FDR_RAW_MILLI = 1960


def _fdr_z_sql(metric: str) -> str:
    x0 = f"sum(CASE WHEN arm = 0 THEN t_{metric} ELSE 0 END)"
    x1 = f"sum(CASE WHEN arm = 1 THEN t_{metric} ELSE 0 END)"
    n0 = "sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)"
    n1 = "sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)"
    return (
        f"CAST(CASE WHEN {x0} + {x1} = 0 OR {x0} + {x1} = {n0} + {n1} THEN 0"
        f" ELSE floor(({x1} * 1.0 / {n1} - {x0} * 1.0 / {n0})"
        f" / sqrt((({x0} + {x1}) * 1.0 / ({n0} + {n1}))"
        f" * (1.0 - ({x0} + {x1}) * 1.0 / ({n0} + {n1}))"
        f" * (1.0 / {n0} + 1.0 / {n1})) * 1000 + 0.5) END AS BIGINT)"
    )


def _fdr_oracle() -> str:
    touch_cols = ", ".join(
        f"CAST(max(CASE WHEN event_type = '{m}' THEN 1 ELSE 0 END) AS BIGINT) AS t_{m}"
        for m in _FDR_METRICS
    )
    z_rows = "\n  UNION ALL\n  ".join(
        f"SELECT '{m}' AS metric, {_fdr_z_sql(m)} AS z_milli FROM ua"
        for m in _FDR_METRICS
    )
    thr = ", ".join(f"({k + 1}, {t})" for k, t in enumerate(_FDR_BH_THR_MILLI))
    return f"""
WITH ua AS (
  SELECT user_id,
         CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm,
         {touch_cols}
  FROM events GROUP BY user_id
), z AS (
  {z_rows}
), ranked AS (
  SELECT metric, z_milli,
         row_number() OVER (ORDER BY abs(z_milli) DESC, metric) AS rnk
  FROM z
), thr(rnk, bh_thr_milli) AS (VALUES {thr}),
hits AS (
  SELECT r.metric, r.z_milli, r.rnk, t.bh_thr_milli,
         CASE WHEN abs(r.z_milli) >= t.bh_thr_milli THEN r.rnk ELSE 0 END AS hit_rnk
  FROM ranked r JOIN thr t ON t.rnk = r.rnk
), kstar AS (SELECT max(hit_rnk) AS k FROM hits)
SELECT h.metric, h.z_milli, CAST(h.rnk AS BIGINT) AS rnk,
       CAST(h.bh_thr_milli AS BIGINT) AS bh_thr_milli,
       CAST(CASE WHEN h.rnk <= s.k THEN 1 ELSE 0 END AS BIGINT) AS rejected_bh,
       CAST(CASE WHEN abs(h.z_milli) >= {_FDR_BONF_MILLI} THEN 1 ELSE 0 END AS BIGINT)
         AS rejected_bonferroni,
       CAST(CASE WHEN abs(h.z_milli) >= {_FDR_RAW_MILLI} THEN 1 ELSE 0 END AS BIGINT)
         AS significant_raw
FROM hits h CROSS JOIN kstar s
ORDER BY rnk
"""


@register("events_fdr_gate", _fdr_oracle())
def events_fdr_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH-FDR gate over the per-event-type engagement z ladder (B258):
    one user-level pass computes all metrics' z, literal milli normal
    quantiles stand in for p-values, reject ranks ≤ k*."""
    ev = read_table(spark, sf_dir, "events")
    touch = [
        F.max(F.when(F.col("event_type") == m, 1).otherwise(0)).cast("long").alias(f"t_{m}")
        for m in _FDR_METRICS
    ]
    ua = ev.groupBy("user_id").agg(*touch).select(
        F.expr(
            "cast(conv(substring(md5(concat('srm:', cast(user_id as string))), 1, 8),"
            " 16, 10) as bigint) % 2"
        ).alias("arm"),
        *[F.col(f"t_{m}") for m in _FDR_METRICS],
    )
    # ONE aggregate computes every metric's z (conditional sums share the
    # single user-table pass); stack unpivots the 1-row result
    zrow = ua.agg(*[F.expr(_fdr_z_sql(m)).alias(f"z_{m}") for m in _FDR_METRICS])
    stack_args = ", ".join(f"'{m}', z_{m}" for m in _FDR_METRICS)
    z = zrow.select(
        F.expr(f"stack({len(_FDR_METRICS)}, {stack_args}) as (metric, z_milli)")
    )
    ranked = z.select(
        "metric",
        "z_milli",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("z_milli")).desc(), "metric"))
        .alias("rnk"),
    )
    thr = spark.createDataFrame(
        [(k + 1, t) for k, t in enumerate(_FDR_BH_THR_MILLI)], "rnk: long, bh_thr_milli: long"
    )
    hits = ranked.join(F.broadcast(thr), "rnk").select(
        "metric",
        "z_milli",
        "rnk",
        "bh_thr_milli",
        F.when(F.abs(F.col("z_milli")) >= F.col("bh_thr_milli"), F.col("rnk"))
        .otherwise(0)
        .alias("hit_rnk"),
    )
    kstar = hits.agg(F.max("hit_rnk").alias("k"))
    return (
        hits.crossJoin(F.broadcast(kstar))
        .select(
            "metric",
            "z_milli",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("bh_thr_milli").cast("long").alias("bh_thr_milli"),
            F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0).cast("long").alias("rejected_bh"),
            F.when(F.abs(F.col("z_milli")) >= _FDR_BONF_MILLI, 1)
            .otherwise(0)
            .cast("long")
            .alias("rejected_bonferroni"),
            F.when(F.abs(F.col("z_milli")) >= _FDR_RAW_MILLI, 1)
            .otherwise(0)
            .cast("long")
            .alias("significant_raw"),
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# B262: KMV cube rollup — ONE sketch pass, every grouping level, exact
# mergeability
# ---------------------------------------------------------------------------
# The ops question "distinct users per (type, day), per type, and
# overall" naively costs one COUNT(DISTINCT) shuffle PER LEVEL; the KMV
# theorem makes the higher levels FREE: the k smallest hashes of a union
# are always among each part's k smallest, so merging leaf sketches
# (distinct-union, re-sort, keep k) yields BIT-IDENTICAL sketches to
# direct computation — not approximately, exactly (the pytest pins array
# equality). This audit computes the (type, day) leaf sketches once,
# derives the type and global levels purely by merging, and prices each
# level's estimate against the exact distinct count (B190's (K−1)·M/h_K
# arithmetic, exact branch when nd ≤ K). At 100 TB the leaves come from
# the B96 mergeable streaming sink (bounded state; the batch collect_set
# here is the audit-scale form, documented) and rollups never touch the
# fact table again.
@register(
    "events_kmv_cube_rollup",
    f"""
WITH du AS (
  SELECT DISTINCT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, user_id
  FROM events
), h AS (
  SELECT event_type, day,
         CAST(('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM du
), leaf AS (
  SELECT event_type, day,
         list_sort(list_distinct(list(hv)))[1:{64}] AS ks,
         CAST(count(DISTINCT hv) AS BIGINT) AS nd_exact
  FROM h GROUP BY event_type, day
), tlev AS (
  SELECT event_type, CAST(-1 AS BIGINT) AS day,
         list_sort(list_distinct(flatten(list(ks))))[1:{64}] AS ks,
         CAST(count(*) AS BIGINT) AS n_leaves
  FROM leaf GROUP BY event_type
), texact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS nd_exact
  FROM du GROUP BY event_type
), glev AS (
  SELECT 'ALL' AS event_type, CAST(-1 AS BIGINT) AS day,
         list_sort(list_distinct(flatten(list(ks))))[1:{64}] AS ks,
         CAST(sum(n_leaves) AS BIGINT) AS n_leaves
  FROM tlev
), gexact AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nd_exact FROM du
), unioned AS (
  SELECT 'leaf' AS level, event_type, day, ks, nd_exact, CAST(1 AS BIGINT) AS n_leaves_merged
  FROM leaf
  UNION ALL
  SELECT 'type', t.event_type, t.day, t.ks, x.nd_exact, t.n_leaves
  FROM tlev t JOIN texact x ON x.event_type = t.event_type
  UNION ALL
  SELECT 'all', g.event_type, g.day, g.ks, x.nd_exact, g.n_leaves
  FROM glev g CROSS JOIN gexact x
)
SELECT level, event_type, day,
       CAST(CASE WHEN len(ks) < {64} THEN len(ks)
                 ELSE CAST(floor(({64} - 1) * 1.0 * {1 << 60} / ks[{64}]) AS BIGINT)
            END AS BIGINT) AS nd_est,
       nd_exact,
       CAST(abs(CASE WHEN len(ks) < {64} THEN len(ks)
                     ELSE CAST(floor(({64} - 1) * 1.0 * {1 << 60} / ks[{64}]) AS BIGINT)
                END - nd_exact) * 1000000 // greatest(nd_exact, 1) AS BIGINT) AS err_ppm,
       n_leaves_merged
FROM unioned
ORDER BY level, event_type, day
""",
)
def events_kmv_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketches at (type, day), rolled up to type and
    global PURELY BY MERGING (B262); per level the estimate vs exact."""
    K, M = 64, 1 << 60
    ev = read_table(spark, sf_dir, "events")
    du = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("day"),
        "user_id",
    ).distinct()
    h = du.select(
        "event_type",
        "day",
        F.expr(
            "cast(conv(substring(md5(concat('u:', cast(user_id as string))), 1, 15),"
            " 16, 10) as bigint)"
        ).alias("hv"),
    )
    leaf = h.groupBy("event_type", "day").agg(
        F.expr(f"slice(array_sort(collect_set(hv)), 1, {K})").alias("ks"),
        F.countDistinct("hv").cast("long").alias("nd_exact"),
    )
    tlev = leaf.groupBy("event_type").agg(
        F.expr(f"slice(array_sort(array_distinct(flatten(collect_list(ks)))), 1, {K})")
        .alias("ks"),
        F.count("*").cast("long").alias("n_leaves"),
    )
    texact = du.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("nd_exact")
    )
    glev = tlev.agg(
        F.expr(f"slice(array_sort(array_distinct(flatten(collect_list(ks)))), 1, {K})")
        .alias("ks"),
        F.sum("n_leaves").cast("long").alias("n_leaves"),
    ).select(F.lit("ALL").alias("event_type"), F.lit(-1).cast("long").alias("day"), "ks", "n_leaves")
    gexact = du.agg(F.countDistinct("user_id").cast("long").alias("nd_exact"))
    unioned = (
        leaf.select(
            F.lit("leaf").alias("level"),
            "event_type",
            "day",
            "ks",
            "nd_exact",
            F.lit(1).cast("long").alias("n_leaves_merged"),
        )
        .unionByName(
            tlev.join(texact, "event_type").select(
                F.lit("type").alias("level"),
                "event_type",
                F.lit(-1).cast("long").alias("day"),
                "ks",
                "nd_exact",
                F.col("n_leaves").alias("n_leaves_merged"),
            )
        )
        .unionByName(
            glev.crossJoin(F.broadcast(gexact)).select(
                F.lit("all").alias("level"),
                "event_type",
                "day",
                "ks",
                "nd_exact",
                F.col("n_leaves").alias("n_leaves_merged"),
            )
        )
    )
    est = F.expr(
        f"cast(CASE WHEN size(ks) < {K} THEN size(ks)"
        f" ELSE cast(floor(({K} - 1) * 1.0 * {M} / element_at(ks, {K})) as bigint)"
        f" END as bigint)"
    )
    return (
        unioned.select(
            "level",
            "event_type",
            "day",
            est.alias("nd_est"),
            "nd_exact",
            F.expr(
                f"cast(abs(CASE WHEN size(ks) < {K} THEN size(ks)"
                f" ELSE cast(floor(({K} - 1) * 1.0 * {M} / element_at(ks, {K})) as bigint)"
                f" END - nd_exact) * 1000000 div greatest(nd_exact, 1) as bigint)"
            ).alias("err_ppm"),
            "n_leaves_merged",
        )
        .orderBy("level", "event_type", "day")
    )


# ---------------------------------------------------------------------------
# B265: exact two-sample Kolmogorov–Smirnov — did the experiment move the
# DISTRIBUTION, not just the mean?
# ---------------------------------------------------------------------------
# B160 reads a rate and B173/B101 read means; a treatment that widens the
# spread while preserving the mean slips past all of them. The KS
# statistic D = max_v |F0(v) − F1(v)| catches any distributional shift,
# and the classic obstacle — it needs the full ECDFs — dissolves under
# the house bounded-value discipline: cents values have bounded
# cardinality, so both ECDFs live on ONE value-level aggregate (per-cents
# conditional counts, running sums over the aggregate — the sanctioned
# window shape) and D is an exact integer cross-product max:
# D_num = max |r0·n1 − r1·n0|, D_micro = D_num·10⁶ div (n0·n1). The
# α=0.05 threshold c(α)·√((n0+n1)/(n0·n1)) follows B160's milli-floor
# float discipline. Also reported: the cents value where the gap peaks
# (smallest such value) — where to look when the test fires.
@register(
    "events_ks_two_sample",
    """
WITH v AS (
  SELECT CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2
           AS arm,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
), n AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM v
), g AS (
  SELECT cents,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1
  FROM v GROUP BY cents
), cum AS (
  SELECT cents,
         sum(c0) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS r0,
         sum(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS r1
  FROM g
), gap AS (
  -- 128-bit throughout (ADVICE r12 #4): r·n products pass int64 only up
  -- to ~3e9 rows/arm, and d_max·10⁶ overflows already at ~3M rows/arm
  SELECT c.cents, abs(CAST(c.r0 AS HUGEINT) * n.n1 - CAST(c.r1 AS HUGEINT) * n.n0) AS d_num,
         n.n0, n.n1
  FROM cum c CROSS JOIN n
), mx AS (
  SELECT max(d_num) AS d_max FROM gap
)
SELECT g.n0 AS n_arm0, g.n1 AS n_arm1,
       CAST(m.d_max * 1000000 // (CAST(g.n0 AS HUGEINT) * g.n1) AS BIGINT) AS d_micro,
       CAST(min(CASE WHEN g.d_num = m.d_max THEN g.cents END) AS BIGINT)
         AS argmax_cents,
       CAST(floor(1.3581 * sqrt((g.n0 + g.n1) * 1.0 / (g.n0 * g.n1)) * 1000000 + 0.5)
            AS BIGINT) AS thr_micro_95,
       CAST(CASE WHEN m.d_max * 1000000 // (CAST(g.n0 AS HUGEINT) * g.n1)
                      >= floor(1.3581 * sqrt((g.n0 + g.n1) * 1.0 / (g.n0 * g.n1))
                               * 1000000 + 0.5)
                 THEN 1 ELSE 0 END AS BIGINT) AS reject_95
FROM gap g CROSS JOIN mx m
GROUP BY g.n0, g.n1, m.d_max
""",
)
def events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS distance between the seeded arms (B265):
    integer cross-product ECDF gap over the bounded cents aggregate,
    milli-floored asymptotic 95% threshold."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.select(
        (
            F.expr(
                "cast(conv(substring(md5(concat('srm:', cast(user_id as string))), 1, 8),"
                " 16, 10) as bigint) % 2"
            )
        ).alias("arm"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    n = v.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    g = v.groupBy("cents").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("c1"),
    )
    w_cum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "cents",
        F.sum("c0").over(w_cum).alias("r0"),
        F.sum("c1").over(w_cum).alias("r1"),
    )
    # 128-bit fold sites (ADVICE r12 #4): the rank·count cross-products
    # and d_max·10⁶ run in decimal(38,0) — HUGEINT on the oracle side
    dec = "decimal(38,0)"
    gap = cum.crossJoin(F.broadcast(n)).select(
        "cents",
        F.abs(
            F.col("r0").cast(dec) * F.col("n1") - F.col("r1").cast(dec) * F.col("n0")
        ).alias("d_num"),
        "n0",
        "n1",
    )
    mx = gap.agg(F.max("d_num").alias("d_max"))
    return (
        gap.crossJoin(F.broadcast(mx))
        .groupBy("n0", "n1", "d_max")
        .agg(
            F.min(F.when(F.col("d_num") == F.col("d_max"), F.col("cents")))
            .cast("long")
            .alias("argmax_cents"),
        )
        .withColumn(
            "d_micro",
            F.expr(
                "cast((d_max * 1000000) div (cast(n0 as decimal(38,0)) * n1) as bigint)"
            ),
        )
        .withColumn(
            "thr_micro_95",
            F.expr(
                "cast(floor(1.3581 * sqrt((n0 + n1) * 1.0 / (n0 * n1)) * 1000000"
                " + 0.5) as bigint)"
            ),
        )
        .select(
            F.col("n0").alias("n_arm0"),
            F.col("n1").alias("n_arm1"),
            "d_micro",
            "argmax_cents",
            "thr_micro_95",
            F.when(F.col("d_micro") >= F.col("thr_micro_95"), 1)
            .otherwise(0)
            .cast("long")
            .alias("reject_95"),
        )
    )


# ---------------------------------------------------------------------------
# B266: gapped sequence support — X then Y within the gap, whether or not
# anything happened in between
# ---------------------------------------------------------------------------
# B87 counts CONTIGUOUS trigrams and B206 whole paths; behavioral
# hypotheses are usually GAPPED ("an error followed by a purchase within
# 30 minutes — whatever happened in between"). Per ordered type pair
# (X → Y): the share of users with some X event strictly before some Y
# event within GAP seconds, and the lift against independence. The
# candidate generator is the B42 interval-join discipline: bucket events
# into GAP-width buckets — a qualifying (X, Y) pair must sit in the same
# or adjacent bucket — so the per-user join volume is bounded by
# co-bucket occupancy, never the full c_X·c_Y cross within a user's
# history. Exists-semantics per user (distinct user count), exact
# integer lift: lift_milli = support·n_users·1000 div (u_X·u_Y).
_SEQ_GAP_SEC = 1800


@register(
    "events_gapped_sequence_support",
    f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         epoch_us(ts) // {_SEQ_GAP_SEC * 1000000} AS bk
  FROM events
), cand AS (
  SELECT DISTINCT a.event_type AS x_type, b.event_type AS y_type, a.user_id
  FROM e a JOIN e b
    ON b.user_id = a.user_id
   AND b.bk BETWEEN a.bk AND a.bk + 1
   AND b.ts_us > a.ts_us AND b.ts_us - a.ts_us <= {_SEQ_GAP_SEC * 1000000}
   AND b.event_type <> a.event_type
), sup AS (
  SELECT x_type, y_type, CAST(count(*) AS BIGINT) AS n_users_support
  FROM cand GROUP BY x_type, y_type
), upt AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS u FROM e
  GROUP BY event_type
), tot AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM e
)
SELECT s.x_type, s.y_type, s.n_users_support,
       ux.u AS u_x, uy.u AS u_y,
       CAST(s.n_users_support * t.n_users * 1000 // (ux.u * uy.u) AS BIGINT)
         AS lift_milli
FROM sup s
JOIN upt ux ON ux.event_type = s.x_type
JOIN upt uy ON uy.event_type = s.y_type
CROSS JOIN tot t
ORDER BY s.x_type, s.y_type
""",
)
def events_gapped_sequence_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gapped X→Y sequence support per ordered type pair (B266):
    bucket-bounded candidate join, exists-per-user semantics, integer
    lift vs independence."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.expr(f"unix_micros(ts) div {_SEQ_GAP_SEC * 1000000}").alias("bk"),
    )
    a = e.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("x_type"),
        F.col("ts_us").alias("x_ts"),
        F.col("bk").alias("x_bk"),
    )
    b = e.select(
        F.col("user_id").alias("u2"),
        F.col("event_type").alias("y_type"),
        F.col("ts_us").alias("y_ts"),
        F.col("bk").alias("y_bk"),
    )
    cand = (
        a.join(
            b,
            (F.col("u") == F.col("u2"))
            & (F.col("y_bk") >= F.col("x_bk"))
            & (F.col("y_bk") <= F.col("x_bk") + 1)
            & (F.col("y_ts") > F.col("x_ts"))
            & (F.col("y_ts") - F.col("x_ts") <= _SEQ_GAP_SEC * 1000000)
            & (F.col("y_type") != F.col("x_type")),
        )
        .select("x_type", "y_type", "u")
        .distinct()
    )
    sup = cand.groupBy("x_type", "y_type").agg(
        F.count("*").cast("long").alias("n_users_support")
    )
    upt = e.groupBy("event_type").agg(F.countDistinct("user_id").cast("long").alias("u"))
    tot = e.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    return (
        sup.join(
            F.broadcast(upt.withColumnsRenamed({"event_type": "x_type", "u": "u_x"})),
            "x_type",
        )
        .join(
            F.broadcast(upt.withColumnsRenamed({"event_type": "y_type", "u": "u_y"})),
            "y_type",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "x_type",
            "y_type",
            "n_users_support",
            "u_x",
            "u_y",
            F.expr("n_users_support * n_users * 1000 div (u_x * u_y)")
            .cast("long")
            .alias("lift_milli"),
        )
        .orderBy("x_type", "y_type")
    )


# ---------------------------------------------------------------------------
# B267: Markov absorption — "how likely does this state reach purchase
# within k steps?", exactly
# ---------------------------------------------------------------------------
# B71 gives one-step probabilities and B159 backtests the argmax; product
# questions are MULTI-step ("a user sitting at an error page — what are
# the odds they purchase within 4 clicks?"). Make 'purchase' absorbing
# and unroll the dynamic program a_k(s) = Σ_t T(s,t)·a_{k−1}(t), k = 1..4
# — each step is ONE join of the V²-row transition matrix (V = 5 event
# types, the whole DP never exceeds 25 rows) against the V-row value
# vector, in exact integer ppm: per-step sums divide by 10⁶ ONCE (the
# same truncation on both engines, so the unrolled arithmetic is
# bit-identical by induction). The corpus is touched exactly once — by
# the B71 transition build this composes.
_ABSORB_STEPS = 4
_ABSORB_TARGET = "purchase"


def _absorption_oracle() -> str:
    from ..queries import REGISTRY as _R

    steps = []
    prev = "a0"
    for k in range(1, _ABSORB_STEPS + 1):
        steps.append(
            f"""a{k} AS (
  SELECT tm.from_type AS s,
         CAST(CASE WHEN tm.from_type = '{_ABSORB_TARGET}' THEN 1000000
                   ELSE sum(tm.prob_ppm * p.val) // 1000000 END AS BIGINT) AS val
  FROM tm JOIN {prev} p ON p.s = tm.to_type
  GROUP BY tm.from_type
)"""
        )
        prev = f"a{k}"
    joins = "\n".join(
        f"JOIN a{k} ON a{k}.s = a1.s" for k in range(2, _ABSORB_STEPS + 1)
    )
    cols = ", ".join(f"a{k}.val AS reach_{k}_ppm" for k in range(1, _ABSORB_STEPS + 1))
    return f"""
WITH tm AS ({_R['events_markov_transitions'].oracle}),
a0 AS (
  SELECT DISTINCT from_type AS s,
         CAST(CASE WHEN from_type = '{_ABSORB_TARGET}' THEN 1000000 ELSE 0 END AS BIGINT)
           AS val
  FROM tm
),
{', '.join(steps)}
SELECT a1.s AS start_type, {cols}
FROM a1
{joins}
ORDER BY start_type
"""


@register("events_markov_absorption", _absorption_oracle())
def events_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(reach purchase within k steps | start type), k = 1..4, from the
    B71 transition matrix with purchase absorbing (B267) — exact integer
    ppm dynamic program over the V²-row matrix."""
    # The DP runs over the BOUNDED V²-row type-transition matrix (V =
    # event-type vocabulary), so it is legitimate driver state — the
    # same bounded-state argument as the k-means centroids and the CC
    # union-find. The previous form ran the 4 matrix-vector steps as 4
    # eager checkpoint jobs plus 3 join jobs over ≤|V|-row frames
    # (~2.0 s of pure job overhead at sf0.1); ONE collect of the matrix
    # and an exact-integer Python replay of the same algebra (inner-join
    # key semantics included) is ~4× cheaper and bit-identical (r14
    # opt). prob_ppm and the reach values are non-negative, so Python
    # // equals SQL div here.
    rows = (
        events_markov_transitions(spark, sf_dir)
        .select("from_type", "to_type", "prob_ppm")
        .collect()
    )
    out_edges: dict = {}
    for r in rows:
        out_edges.setdefault(r.from_type, []).append((r.to_type, int(r.prob_ppm)))
    vals = {
        s: (1_000_000 if s == _ABSORB_TARGET else 0) for s in out_edges
    }
    snaps = []
    for _k in range(_ABSORB_STEPS):
        new_vals = {}
        for s, edges in out_edges.items():
            # inner-join semantics: only to_types present in the current
            # vector contribute, and a from_type with NO contributing
            # edge drops out of the vector entirely
            contrib = [(p, vals[t]) for t, p in edges if t in vals]
            if not contrib:
                continue
            if s == _ABSORB_TARGET:
                new_vals[s] = 1_000_000
            else:
                new_vals[s] = sum(p * v for p, v in contrib) // 1_000_000
        vals = new_vals
        snaps.append(dict(vals))
    keys = sorted(set(snaps[0]).intersection(*snaps[1:]))
    data = [
        tuple([s] + [snaps[k][s] for k in range(_ABSORB_STEPS)]) for s in keys
    ]
    schema = "start_type string, " + ", ".join(
        f"reach_{k}_ppm long" for k in range(1, _ABSORB_STEPS + 1)
    )
    return spark.createDataFrame(data, schema).orderBy("start_type")


# ---------------------------------------------------------------------------
# B270: heterogeneous treatment effect — uplift by behavioral segment (r13)
# ---------------------------------------------------------------------------
# B160 reads ONE pooled conversion delta; real experiment readouts ask
# WHERE the effect lives — an overall null can hide a positive segment
# canceling a negative one (Simpson). Per activity tier (fixed per-user
# event-count thresholds, so the segmentation is a pure map — never a
# quantile pass): the two-proportion z of "≥14 purchases" between the
# seeded md5 arms, per-segment uplift in ppm, and the 1.960 flag. All
# counts exact integers; z is the one float, milli-floored at the single
# fold site (the B160 discipline). Scale: one user-keyed groupBy, then a
# ≤3-row segment aggregate — map-side all the way.
_UPLIFT_CONV_MIN = 14


@register(
    "events_uplift_by_segment",
    f"""
WITH ua AS (
  SELECT user_id,
         CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm,
         CASE WHEN count(*) <= 60 THEN 'low' WHEN count(*) <= 72 THEN 'mid' ELSE 'high' END AS segment,
         CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        >= {_UPLIFT_CONV_MIN} THEN 1 ELSE 0 END AS BIGINT) AS converted
  FROM events GROUP BY user_id
), s AS (
  SELECT segment,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS x0,
         CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS x1
  FROM ua GROUP BY segment
)
SELECT segment, n0 AS users_arm0, n1 AS users_arm1, x0 AS conv_arm0, x1 AS conv_arm1,
       CAST(x1 * 1000000 // greatest(n1, 1) - x0 * 1000000 // greatest(n0, 1) AS BIGINT)
         AS uplift_ppm,
       CAST(CASE WHEN n0 = 0 OR n1 = 0 OR x0 + x1 = 0 OR x0 + x1 = n0 + n1 THEN 0
                 ELSE floor((x1 * 1.0 / n1 - x0 * 1.0 / n0)
                            / sqrt(((x0 + x1) * 1.0 / (n0 + n1)) * (1.0 - (x0 + x1) * 1.0 / (n0 + n1))
                                   * (1.0 / n0 + 1.0 / n1)) * 1000 + 0.5) END AS BIGINT) AS z_milli,
       CAST(CASE WHEN n0 = 0 OR n1 = 0 OR x0 + x1 = 0 OR x0 + x1 = n0 + n1 THEN 0
                 WHEN abs(floor((x1 * 1.0 / n1 - x0 * 1.0 / n0)
                            / sqrt(((x0 + x1) * 1.0 / (n0 + n1)) * (1.0 - (x0 + x1) * 1.0 / (n0 + n1))
                                   * (1.0 / n0 + 1.0 / n1)) * 1000 + 0.5)) >= 1960 THEN 1
                 ELSE 0 END AS BIGINT) AS significant_95
FROM s
ORDER BY segment
""",
)
def events_uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment conversion uplift between the seeded arms (B270):
    fixed-threshold activity tiers, exact per-segment 2×2 counts, one
    milli-floored z per segment."""
    ev = read_table(spark, sf_dir, "events")
    ua = ev.groupBy("user_id").agg(
        F.expr(
            "cast(conv(substring(md5(concat('srm:', cast(user_id as string))), 1, 8), 16, 10)"
            " as bigint) % 2"
        ).alias("arm"),
        F.when(F.count("*") <= 60, "low")
        .when(F.count("*") <= 72, "mid")
        .otherwise("high")
        .alias("segment"),
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            >= _UPLIFT_CONV_MIN
        )
        .cast("long")
        .alias("converted"),
    )
    s = ua.groupBy("segment").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x0"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x1"),
    )
    p_pool = (F.col("x0") + F.col("x1")) * 1.0 / (F.col("n0") + F.col("n1"))
    z = F.floor(
        (F.col("x1") * 1.0 / F.col("n1") - F.col("x0") * 1.0 / F.col("n0"))
        / F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
        * 1000
        + 0.5
    )
    degenerate = (
        (F.col("n0") == 0)
        | (F.col("n1") == 0)
        | (F.col("x0") + F.col("x1") == 0)
        | (F.col("x0") + F.col("x1") == F.col("n0") + F.col("n1"))
    )
    return s.select(
        "segment",
        F.col("n0").alias("users_arm0"),
        F.col("n1").alias("users_arm1"),
        F.col("x0").alias("conv_arm0"),
        F.col("x1").alias("conv_arm1"),
        (
            F.expr("x1 * 1000000 div greatest(n1, 1)")
            - F.expr("x0 * 1000000 div greatest(n0, 1)")
        )
        .cast("long")
        .alias("uplift_ppm"),
        F.when(degenerate, F.lit(0)).otherwise(z).cast("long").alias("z_milli"),
        F.when(degenerate, F.lit(0))
        .otherwise(F.when(F.abs(z) >= 1960, 1).otherwise(0))
        .cast("long")
        .alias("significant_95"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# B271: group-sequential A/B readout — O'Brien–Fleming boundaries (r13)
# ---------------------------------------------------------------------------
# B160/B270 read the experiment ONCE at the end; production dashboards
# peek continuously, and naive repeated 1.96 tests inflate false
# positives severalfold. The classical guard is the group-sequential
# design: K=4 interim looks at calendar quartiles of the logged span,
# each cumulative z compared against the O'Brien–Fleming two-sided
# α=0.05 boundary (4.049, 2.863, 2.337, 2.024 — Jennison & Turnbull's
# standard table; early looks need overwhelming evidence, the final look
# spends almost the full α). Conversion is the B270 outcome (≥14
# purchases), timed at the user's 14TH purchase — a user converts at the
# look where that event lands, so each look's 2×2 is exactly what a
# reader AT THAT TIME would have seen. Scale: one user-keyed groupBy +
# one user-partitioned rank for the conversion instant, then a ×4
# bounded blowup against the literal look table — never a re-scan per
# look.
_OBF_BOUNDS_MILLI = (4049, 2863, 2337, 2024)


@register(
    "events_obf_sequential_test",
    f"""
WITH span AS (
  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
), ua AS (
  SELECT user_id,
         CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm,
         min(epoch_us(ts)) AS first_us
  FROM events GROUP BY user_id
), conv AS (
  SELECT user_id, min(pus) AS conv_us FROM (
    SELECT user_id, epoch_us(ts) AS pus,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = {_UPLIFT_CONV_MIN} GROUP BY user_id
), looks AS (
  SELECT k, s.t0 + (s.t1 - s.t0) * k // 4 AS cut_us,
         CASE k {' '.join(f"WHEN {i + 1} THEN {b}" for i, b in enumerate(_OBF_BOUNDS_MILLI))} END AS bound_milli
  FROM (SELECT unnest(ARRAY[1, 2, 3, 4]) AS k) CROSS JOIN span s
), s AS (
  SELECT l.k, l.bound_milli,
         CAST(sum(CASE WHEN u.arm = 0 AND u.first_us <= l.cut_us THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN u.arm = 1 AND u.first_us <= l.cut_us THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN u.arm = 0 AND c.conv_us <= l.cut_us THEN 1 ELSE 0 END) AS BIGINT) AS x0,
         CAST(sum(CASE WHEN u.arm = 1 AND c.conv_us <= l.cut_us THEN 1 ELSE 0 END) AS BIGINT) AS x1
  FROM ua u LEFT JOIN conv c ON c.user_id = u.user_id CROSS JOIN looks l
  GROUP BY l.k, l.bound_milli
)
SELECT CAST(k AS BIGINT) AS look, n0 AS users_arm0, n1 AS users_arm1,
       x0 AS conv_arm0, x1 AS conv_arm1,
       CAST(bound_milli AS BIGINT) AS obf_bound_milli,
       CAST(CASE WHEN n0 = 0 OR n1 = 0 OR x0 + x1 = 0 OR x0 + x1 = n0 + n1 THEN 0
                 ELSE floor((x1 * 1.0 / n1 - x0 * 1.0 / n0)
                            / sqrt(((x0 + x1) * 1.0 / (n0 + n1)) * (1.0 - (x0 + x1) * 1.0 / (n0 + n1))
                                   * (1.0 / n0 + 1.0 / n1)) * 1000 + 0.5) END AS BIGINT) AS z_milli,
       CAST(CASE WHEN n0 = 0 OR n1 = 0 OR x0 + x1 = 0 OR x0 + x1 = n0 + n1 THEN 0
                 WHEN abs(floor((x1 * 1.0 / n1 - x0 * 1.0 / n0)
                            / sqrt(((x0 + x1) * 1.0 / (n0 + n1)) * (1.0 - (x0 + x1) * 1.0 / (n0 + n1))
                                   * (1.0 / n0 + 1.0 / n1)) * 1000 + 0.5)) >= bound_milli THEN 1
                 ELSE 0 END AS BIGINT) AS crossed
FROM s
ORDER BY look
""",
)
def events_obf_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=4 group-sequential conversion test with O'Brien–Fleming
    boundaries (B271): cumulative per-look 2×2s from one user aggregate
    ×4 literal looks, milli-floored z vs the literal boundary."""
    ev = read_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"), F.max(F.unix_micros("ts")).alias("t1")
    )
    ua = ev.groupBy("user_id").agg(
        F.expr(
            "cast(conv(substring(md5(concat('srm:', cast(user_id as string))), 1, 8), 16, 10)"
            " as bigint) % 2"
        ).alias("arm"),
        F.min(F.unix_micros("ts")).alias("first_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("pus"), F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == _UPLIFT_CONV_MIN)
        .groupBy("user_id")
        .agg(F.min("pus").alias("conv_us"))
    )
    ks = spark.createDataFrame([(k, b) for k, b in enumerate(_OBF_BOUNDS_MILLI, 1)], "k int, bound_milli int")
    looks = (
        F.broadcast(ks)
        .crossJoin(F.broadcast(span))
        .select("k", "bound_milli", F.expr("t0 + (t1 - t0) * k div 4").alias("cut_us"))
    )
    s = (
        ua.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(looks))
        .groupBy("k", "bound_milli")
        .agg(
            F.sum(F.when((F.col("arm") == 0) & (F.col("first_us") <= F.col("cut_us")), 1).otherwise(0)).cast("long").alias("n0"),
            F.sum(F.when((F.col("arm") == 1) & (F.col("first_us") <= F.col("cut_us")), 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when((F.col("arm") == 0) & (F.col("conv_us") <= F.col("cut_us")), 1).otherwise(0)).cast("long").alias("x0"),
            F.sum(F.when((F.col("arm") == 1) & (F.col("conv_us") <= F.col("cut_us")), 1).otherwise(0)).cast("long").alias("x1"),
        )
    )
    p_pool = (F.col("x0") + F.col("x1")) * 1.0 / (F.col("n0") + F.col("n1"))
    z = F.floor(
        (F.col("x1") * 1.0 / F.col("n1") - F.col("x0") * 1.0 / F.col("n0"))
        / F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
        * 1000
        + 0.5
    )
    degenerate = (
        (F.col("n0") == 0)
        | (F.col("n1") == 0)
        | (F.col("x0") + F.col("x1") == 0)
        | (F.col("x0") + F.col("x1") == F.col("n0") + F.col("n1"))
    )
    return s.select(
        F.col("k").cast("long").alias("look"),
        F.col("n0").alias("users_arm0"),
        F.col("n1").alias("users_arm1"),
        F.col("x0").alias("conv_arm0"),
        F.col("x1").alias("conv_arm1"),
        F.col("bound_milli").cast("long").alias("obf_bound_milli"),
        F.when(degenerate, F.lit(0)).otherwise(z).cast("long").alias("z_milli"),
        F.when(degenerate, F.lit(0))
        .otherwise(F.when(F.abs(z) >= F.col("bound_milli"), 1).otherwise(0))
        .cast("long")
        .alias("crossed"),
    ).orderBy("look")


# ---------------------------------------------------------------------------
# B272: offline policy evaluation — IPS / SNIPS with effective sample size
# ---------------------------------------------------------------------------
# The counterfactual question every recommender change asks BEFORE an
# A/B: "what would policy π have earned on the logged traffic?" The
# inverse-propensity estimator reweights logged (context, action,
# reward) rows where the policy AGREES with the log by 1/p̂(a|x) — here
# the context is a deterministic user cohort (user_id % 4), the logged
# action is the event type, the reward its cents value, and p̂ the
# empirical in-cohort action share. Two candidate policies are priced:
# the cohort's modal action and its max-mean-value action (both argmax
# over the bounded (cohort, action) aggregate with smallest-action tie
# breaks). Propensities and policies are learned on the FULL log; the
# estimator folds over the EVEN-event_id eval half only (a deterministic
# 1/2 Bernoulli thinning), so the realized weight mass Σw fluctuates
# around n_eval instead of telescoping to it — under a deterministic
# argmax policy evaluated on the full log, every segment's matched mass
# is exactly n_seg and SNIPS degenerates to IPS by construction (ADVICE
# r13); the half-log split is what makes the self-normalized SNIPS and
# the (Σw)²/Σw² effective sample size carry information. All arithmetic
# exact-integer: weights enter as the rational n_seg/c folded group-wise
# with ONE floor per (cohort, action) group (documented determinism over
# last-bit float drift), 128-bit on both engines. Scale: two bounded
# (cohort, action) aggregates — ≤ |cohorts|·|actions| rows each — then
# arithmetic; never a per-event reweighting pass.
@register(
    "events_ips_policy_eval",
    """
WITH e AS (
  SELECT event_id, user_id % 4 AS seg, event_type AS act,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), g AS (
  SELECT seg, act, CAST(count(*) AS BIGINT) AS c,
         CAST(coalesce(sum(cents), 0) AS BIGINT) AS r
  FROM e GROUP BY seg, act
), h AS (
  SELECT seg, act, CAST(count(*) AS BIGINT) AS ch,
         CAST(coalesce(sum(cents), 0) AS BIGINT) AS rh
  FROM e WHERE event_id % 2 = 0 GROUP BY seg, act
), nseg AS (
  SELECT seg, CAST(sum(c) AS BIGINT) AS n_seg FROM g GROUP BY seg
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_eval FROM e WHERE event_id % 2 = 0
), pol AS (
  SELECT 'mode' AS policy, seg, act FROM (
    SELECT seg, act, row_number() OVER (PARTITION BY seg ORDER BY c DESC, act) AS rn
    FROM g) WHERE rn = 1
  UNION ALL
  SELECT 'value' AS policy, seg, act FROM (
    SELECT seg, act,
           row_number() OVER (PARTITION BY seg ORDER BY CAST(r AS HUGEINT) * 1000000 // c DESC, act) AS rn
    FROM g) WHERE rn = 1
), m AS (
  SELECT p.policy,
         CAST(sum(h.ch) AS BIGINT) AS n_matched,
         sum(CAST(h.ch AS HUGEINT) * ns.n_seg * 1000000 // g.c) AS sum_w_micro,
         sum(CAST(h.rh AS HUGEINT) * ns.n_seg * 1000000 // g.c) AS ips_num_micro,
         sum(CAST(h.ch AS HUGEINT) * ns.n_seg * ns.n_seg * 1000000
             // (CAST(g.c AS HUGEINT) * g.c)) AS w2_micro
  FROM pol p
  JOIN g ON g.seg = p.seg AND g.act = p.act
  JOIN h ON h.seg = p.seg AND h.act = p.act
  JOIN nseg ns ON ns.seg = p.seg
  GROUP BY p.policy
)
SELECT m.policy, t.n_eval AS n_events, m.n_matched,
       CAST(m.ips_num_micro // t.n_eval AS BIGINT) AS ips_value_micro,
       CAST(m.ips_num_micro * 1000000 // m.sum_w_micro AS BIGINT) AS snips_value_micro,
       CAST(CAST(m.sum_w_micro AS HUGEINT) * m.sum_w_micro * 1000
            // (m.w2_micro * 1000000) AS BIGINT) AS ess_milli
FROM m CROSS JOIN tot t
ORDER BY policy
""",
)
def events_ips_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS / SNIPS offline evaluation of two argmax policies over the
    logged event stream (B272): propensities from the full log, the
    estimator folded over the even-event_id eval half (so Σw ≠ n_eval
    and SNIPS self-normalizes — ADVICE r13), with the (Σw)²/Σw²
    effective sample size; group-wise floored exact-integer folds,
    128-bit."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    e = ev.select(
        "event_id",
        (F.col("user_id") % 4).alias("seg"),
        F.col("event_type").alias("act"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = e.groupBy("seg", "act").agg(
        F.count("*").cast("long").alias("c"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("r"),
    )
    half = e.filter(F.col("event_id") % 2 == 0)
    h = half.groupBy("seg", "act").agg(
        F.count("*").cast("long").alias("ch"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("rh"),
    )
    nseg = g.groupBy("seg").agg(F.sum("c").cast("long").alias("n_seg"))
    tot = half.agg(F.count("*").cast("long").alias("n_eval"))
    w_mode = Window.partitionBy("seg").orderBy(F.col("c").desc(), "act")
    w_val = Window.partitionBy("seg").orderBy(
        F.expr("(cast(r as decimal(38,0)) * 1000000) div c").desc(), "act"
    )
    pol = (
        g.withColumn("rn", F.row_number().over(w_mode))
        .filter(F.col("rn") == 1)
        .select(F.lit("mode").alias("policy"), "seg", "act")
        .unionByName(
            g.withColumn("rn", F.row_number().over(w_val))
            .filter(F.col("rn") == 1)
            .select(F.lit("value").alias("policy"), "seg", "act")
        )
    )
    m = (
        pol.join(g, ["seg", "act"])
        .join(h, ["seg", "act"])
        .join(F.broadcast(nseg), "seg")
        .groupBy("policy")
        .agg(
            F.sum("ch").cast("long").alias("n_matched"),
            F.sum(
                F.expr("(cast(ch as decimal(38,0)) * n_seg * 1000000) div c").cast(dec)
            ).alias("sum_w_micro"),
            F.sum(
                F.expr("(cast(rh as decimal(38,0)) * n_seg * 1000000) div c").cast(dec)
            ).alias("ips_num_micro"),
            F.sum(
                F.expr(
                    "(cast(ch as decimal(38,0)) * n_seg * n_seg * 1000000)"
                    " div (cast(c as decimal(38,0)) * c)"
                ).cast(dec)
            ).alias("w2_micro"),
        )
    )
    return (
        m.crossJoin(F.broadcast(tot))
        .select(
            "policy",
            F.col("n_eval").alias("n_events"),
            "n_matched",
            F.expr("cast(ips_num_micro div n_eval as bigint)").alias("ips_value_micro"),
            F.expr(
                "cast((ips_num_micro * 1000000) div sum_w_micro as bigint)"
            ).alias("snips_value_micro"),
            F.expr(
                "cast((cast(sum_w_micro as decimal(38,0)) * sum_w_micro * 1000)"
                " div (w2_micro * 1000000) as bigint)"
            ).alias("ess_milli"),
        )
        .orderBy("policy")
    )


# ---------------------------------------------------------------------------
# B276: expanding-window time-series CV folds with a cold-start audit (r13)
# ---------------------------------------------------------------------------
# Random k-fold on temporal data leaks the future into training; the
# standard evaluation for forecasting/recommendation is the expanding
# window: fold k trains on everything up to calendar cut k and validates
# on the next slice. This op materializes the K=4 fold LEDGER —
# train/val event volumes, distinct users on each side, and the
# cold-start rate (share of validation users never seen in training),
# the number that tells you whether a fold's metric is dominated by
# users the model cannot know. Leakage-freedom is by construction
# (train and val windows partition the time axis) and AUDITED: the max
# train event instant is reported per fold so a reader can verify
# train_max_us <= cut_us without trusting the builder. Scale: the ×4
# literal-fold blowup over events plus one user-keyed first-seen
# aggregate — the B271 look discipline.
@register(
    "events_timeseries_cv_folds",
    """
WITH span AS (
  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
), folds AS (
  SELECT k, s.t0 + (s.t1 - s.t0) * k // 5 AS cut_us,
         s.t0 + (s.t1 - s.t0) * (k + 1) // 5 AS cut_next_us
  FROM (SELECT unnest(ARRAY[1, 2, 3, 4]) AS k) CROSS JOIN span s
), ufirst AS (
  SELECT user_id, min(epoch_us(ts)) AS first_us FROM events GROUP BY user_id
), e AS (
  SELECT f.k, f.cut_us, f.cut_next_us, epoch_us(ev.ts) AS us, ev.user_id, u.first_us
  FROM events ev CROSS JOIN folds f
  JOIN ufirst u ON u.user_id = ev.user_id
)
SELECT CAST(k AS BIGINT) AS fold,
       CAST(sum(CASE WHEN us <= cut_us THEN 1 ELSE 0 END) AS BIGINT) AS train_events,
       CAST(sum(CASE WHEN us > cut_us AND us <= cut_next_us THEN 1 ELSE 0 END) AS BIGINT)
         AS val_events,
       CAST(max(CASE WHEN us <= cut_us THEN us END) AS BIGINT) AS train_max_us,
       CAST(max(cut_us) AS BIGINT) AS cut_us,
       CAST(count(DISTINCT CASE WHEN us <= cut_us THEN user_id END) AS BIGINT) AS train_users,
       CAST(count(DISTINCT CASE WHEN us > cut_us AND us <= cut_next_us THEN user_id END) AS BIGINT)
         AS val_users,
       CAST(count(DISTINCT CASE WHEN us > cut_us AND us <= cut_next_us AND first_us > cut_us
                                THEN user_id END) AS BIGINT) AS cold_users,
       CAST(count(DISTINCT CASE WHEN us > cut_us AND us <= cut_next_us AND first_us > cut_us
                                THEN user_id END) * 1000000
            // greatest(count(DISTINCT CASE WHEN us > cut_us AND us <= cut_next_us
                                            THEN user_id END), 1) AS BIGINT) AS cold_user_ppm
FROM e
GROUP BY k
ORDER BY fold
""",
)
def events_timeseries_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=4 expanding-window CV fold ledger (B276): per-fold train/val
    volumes, distinct users, cold-start rate, and the train-max-instant
    leakage witness."""
    ev = read_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"), F.max(F.unix_micros("ts")).alias("t1")
    )
    ks = spark.range(1, 5).select(F.col("id").cast("int").alias("k"))
    folds = (
        F.broadcast(ks)
        .crossJoin(F.broadcast(span))
        .select(
            "k",
            F.expr("t0 + (t1 - t0) * k div 5").alias("cut_us"),
            F.expr("t0 + (t1 - t0) * (k + 1) div 5").alias("cut_next_us"),
        )
    )
    ufirst = ev.groupBy("user_id").agg(F.min(F.unix_micros("ts")).alias("first_us"))
    e = (
        ev.select("user_id", F.unix_micros("ts").alias("us"))
        .join(ufirst, "user_id")
        .crossJoin(F.broadcast(folds))
    )
    in_train = F.col("us") <= F.col("cut_us")
    in_val = (F.col("us") > F.col("cut_us")) & (F.col("us") <= F.col("cut_next_us"))
    cold = in_val & (F.col("first_us") > F.col("cut_us"))
    return (
        e.groupBy("k")
        .agg(
            F.sum(in_train.cast("int")).cast("long").alias("train_events"),
            F.sum(in_val.cast("int")).cast("long").alias("val_events"),
            F.max(F.when(in_train, F.col("us"))).cast("long").alias("train_max_us"),
            F.max("cut_us").cast("long").alias("cut_us"),
            F.countDistinct(F.when(in_train, F.col("user_id"))).cast("long").alias("train_users"),
            F.countDistinct(F.when(in_val, F.col("user_id"))).cast("long").alias("val_users"),
            F.countDistinct(F.when(cold, F.col("user_id"))).cast("long").alias("cold_users"),
        )
        .select(
            F.col("k").cast("long").alias("fold"),
            "train_events",
            "val_events",
            "train_max_us",
            "cut_us",
            "train_users",
            "val_users",
            "cold_users",
            F.expr("cold_users * 1000000 div greatest(val_users, 1)")
            .cast("long")
            .alias("cold_user_ppm"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# B288: Page-Hinkley drift detection on the daily count series (r14)
# ---------------------------------------------------------------------------
# The ONLINE twin of the offline CUSUM scan (B128): CUSUM knows the whole
# series and splits at the global residual peak; Page-Hinkley is the rule
# a monitor actually runs — accumulate deviations from the RUNNING mean
# minus a tolerance δ, alarm when the accumulator climbs λ above its own
# running minimum (Page 1954's one-sided sequential test; the standard
# drift detector in the streaming-ML literature, e.g. MOA/river). Exact
# cross-engine arithmetic: the running mean S_t/t is the one division, so
# it is micro-quantized with explicit FLOOR division — q_t = (S_t·10⁶)
# div t, both operands positive so Spark `div` and DuckDB `//` agree —
# and every later step (cumulative sum, running min, threshold compare)
# is exact BIGINT. This makes the statistic a deterministically QUANTIZED
# Page-Hinkley: both engines implement the identical integer algorithm,
# no float summation order anywhere. Scale: one day groupBy (the minimal
# daily-rollup pass) + windows over the ≤|days|-row reduced table — the
# same deliberate single-partition shape as B128.
_PH_DELTA_MICRO = 250_000  # δ: 0.25 daily-count units of tolerance
_PH_LAMBDA_MICRO = 20_000_000  # λ: alarm at 20 count-units of drift


_PH_ORACLE = f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(floor(epoch(ts) / 86400) AS BIGINT)
), seq AS (
  SELECT d, c,
         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
         CAST(sum(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
  FROM daily
), dev AS (
  SELECT d, c, c * 1000000 - (s * 1000000) // rn - {_PH_DELTA_MICRO} AS term
  FROM seq
), acc AS (
  SELECT d, c,
         CAST(sum(term) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS m_micro
  FROM dev
), st AS (
  SELECT d, c, m_micro,
         m_micro - CAST(min(m_micro) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS ph_micro
  FROM acc
), fa AS (
  SELECT min(d) AS fd FROM st WHERE ph_micro > {_PH_LAMBDA_MICRO}
)
SELECT st.d AS day_epoch_days, st.c AS n_events, st.m_micro, st.ph_micro,
       CAST(CASE WHEN st.ph_micro > {_PH_LAMBDA_MICRO} THEN 1 ELSE 0 END AS BIGINT) AS is_alarm,
       CAST(CASE WHEN st.d = fa.fd THEN 1 ELSE 0 END AS BIGINT) AS is_first_alarm
FROM st CROSS JOIN fa
ORDER BY day_epoch_days
"""


def page_hinkley_over_daily(daily: DataFrame) -> DataFrame:
    """The quantized Page-Hinkley statistic over a (d, c) day-count table
    — shared by the batch query and the streaming twin
    (``streaming.stream_ops.page_hinkley_from_state``), so the streamed
    state converges to the batch output exactly."""
    # windows over the reduced ≤|days|-row table: deliberate, not a scale bug
    wseq = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = daily.select(
        "d",
        "c",
        F.row_number().over(Window.orderBy("d")).cast("long").alias("rn"),
        F.sum("c").over(wseq).cast("long").alias("s"),
    )
    dev = seq.select(
        "d",
        "c",
        F.expr(f"c * 1000000 - (s * 1000000) div rn - {_PH_DELTA_MICRO}").alias("term"),
    )
    acc = dev.select("d", "c", F.sum("term").over(wseq).cast("long").alias("m_micro"))
    st = acc.select(
        "d",
        "c",
        "m_micro",
        (F.col("m_micro") - F.min("m_micro").over(wseq).cast("long")).alias("ph_micro"),
    )
    fa = st.filter(F.col("ph_micro") > _PH_LAMBDA_MICRO).agg(F.min("d").alias("fd"))
    return (
        st.crossJoin(F.broadcast(fa))
        .select(
            F.col("d").alias("day_epoch_days"),
            F.col("c").alias("n_events"),
            "m_micro",
            "ph_micro",
            F.when(F.col("ph_micro") > _PH_LAMBDA_MICRO, 1).otherwise(0).cast("long").alias(
                "is_alarm"
            ),
            F.when(F.col("d") == F.col("fd"), 1).otherwise(0).cast("long").alias(
                "is_first_alarm"
            ),
        )
        .orderBy("day_epoch_days")
    )


@register("events_page_hinkley_drift", _PH_ORACLE)
def events_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized Page-Hinkley sequential drift test over daily event
    counts (B288) — running mean micro-floored to exact integers, alarm
    when the deviation accumulator exceeds its running min by λ."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    return page_hinkley_over_daily(daily)


# ---------------------------------------------------------------------------
# B290: per-source ingest watermark-lag ledger (r14)
# ---------------------------------------------------------------------------
# The number a streaming operator's watermark is actually tuned FROM: the
# event-time → arrival-time lag distribution per ingest source. Arrival
# time is synthesized deterministically (md5-hash delay of 0–1800 s, plus
# a +3600 s heavy tail on every 97th event — the stuck-partition case),
# sources are the user_id mod 8 ingest shards. Percentiles are EXACT
# integer order statistics computed scale-safely: lag seconds have
# bounded cardinality (≤ 5400 distinct values), so the per-(source, lag)
# count table is the only aggregate over corpus-sized data and the
# cumulative walk runs over ≤ 5400 rows per source — never a corpus
# sort. k-th definitions: p50 = (n+1) div 2 (lower median), p95/p99 =
# ceil(n·p) via (n·p + 99) div 100; the percentile is the smallest lag
# whose cumulative count reaches k. Late-row counts at the 60/300/900 s
# watermark candidates land beside them — the table a pipeline owner
# reads to pick withWatermark().
_LAG_PREDS = (60, 300, 900)


@register(
    "events_ingest_watermark_lag",
    f"""
WITH lagd AS (
  SELECT CAST(user_id % 8 AS BIGINT) AS source,
         CAST({_H.ddb_str_hash_fast("CAST(event_id AS VARCHAR)")} % 1800
              + CASE WHEN event_id % 97 = 0 THEN 3600 ELSE 0 END AS BIGINT) AS lag_s
  FROM events
), cnt AS (
  SELECT source, lag_s, CAST(count(*) AS BIGINT) AS c
  FROM lagd GROUP BY source, lag_s
), cum AS (
  SELECT source, lag_s, c,
         CAST(sum(c) OVER (PARTITION BY source ORDER BY lag_s
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM cnt
)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(min(CASE WHEN cc >= (n + 1) // 2 THEN lag_s END) AS BIGINT) AS p50_lag_s,
       CAST(min(CASE WHEN cc >= (n * 95 + 99) // 100 THEN lag_s END) AS BIGINT) AS p95_lag_s,
       CAST(min(CASE WHEN cc >= (n * 99 + 99) // 100 THEN lag_s END) AS BIGINT) AS p99_lag_s,
       CAST(sum(CASE WHEN lag_s > {_LAG_PREDS[0]} THEN c ELSE 0 END) AS BIGINT) AS n_late_60s,
       CAST(sum(CASE WHEN lag_s > {_LAG_PREDS[1]} THEN c ELSE 0 END) AS BIGINT) AS n_late_300s,
       CAST(sum(CASE WHEN lag_s > {_LAG_PREDS[2]} THEN c ELSE 0 END) AS BIGINT) AS n_late_900s
FROM cum
GROUP BY source
ORDER BY source
""",
)
def events_ingest_watermark_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ingest-shard arrival-lag ledger (B290): exact integer order
    statistics from the bounded (source, lag) count table, late-row
    counts at the candidate watermark delays."""
    ev = read_table(spark, sf_dir, "events")
    lagd = ev.select(
        F.expr("CAST(user_id % 8 AS BIGINT)").alias("source"),
        F.expr(
            f"CAST({_H.spark_str_hash_fast('CAST(event_id AS STRING)')} % 1800"
            " + CASE WHEN event_id % 97 = 0 THEN 3600 ELSE 0 END AS BIGINT)"
        ).alias("lag_s"),
    )
    return watermark_lag_over_counts(
        lagd.groupBy("source", "lag_s").agg(F.count("*").cast("long").alias("c"))
    )


def watermark_lag_over_counts(cnt: DataFrame) -> DataFrame:
    """The B290 ledger from a (source, lag_s, c) count table — shared by
    the batch query and the streaming twin
    (``streaming.stream_ops.watermark_lag_from_state``), so the streamed
    state converges to the batch output exactly."""
    w_cum = (
        Window.partitionBy("source")
        .orderBy("lag_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cnt.select(
        "source",
        "lag_s",
        "c",
        F.sum("c").over(w_cum).cast("long").alias("cc"),
        F.sum("c").over(Window.partitionBy("source")).cast("long").alias("n"),
    )
    return (
        cum.groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.min(F.when(F.expr("cc >= (n + 1) div 2"), F.col("lag_s")))
            .cast("long")
            .alias("p50_lag_s"),
            F.min(F.when(F.expr("cc >= (n * 95 + 99) div 100"), F.col("lag_s")))
            .cast("long")
            .alias("p95_lag_s"),
            F.min(F.when(F.expr("cc >= (n * 99 + 99) div 100"), F.col("lag_s")))
            .cast("long")
            .alias("p99_lag_s"),
            F.sum(F.when(F.col("lag_s") > _LAG_PREDS[0], F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_late_60s"),
            F.sum(F.when(F.col("lag_s") > _LAG_PREDS[1], F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_late_300s"),
            F.sum(F.when(F.col("lag_s") > _LAG_PREDS[2], F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_late_900s"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B294: exact Mann-Whitney U rank test — click vs view values (r14)
# ---------------------------------------------------------------------------
# The rank-based two-sample companion to the KS distance (B265): KS asks
# "are the distributions different anywhere?", Mann-Whitney asks the
# ordinal question "does one arm stochastically dominate?" — and its
# U/(n₁n₂) IS the AUC, the effect size a ranking evaluation reports.
# Exactness discipline: midranks enter only as 2×rank (2B_v + t_v + 1 —
# always an integer), so 2R₁, 2U₁, the tie term Σ(t³−t) and the AUC ppm
# are exact integers end-to-end; the only float is the final
# normal-approximation z (the KS thr_micro precedent: identical bounded
# float expression over identical exact integers, IEEE sqrt correctly
# rounded, floor+0.5). 128-bit products throughout — r·n passes int64
# only to ~3e9 rows/arm. Scale: one groupBy on quantized cents (the
# bounded-cardinality contract of the KS/equi-depth family), windows
# over the distinct-cents table only.
@register(
    "events_mannwhitney_test",
    """
WITH v AS (
  SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS grp,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL
), n AS (
  SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n2
  FROM v
), g AS (
  SELECT cents,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS c1,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS c2
  FROM v GROUP BY cents
), cum AS (
  SELECT cents, c1, c2,
         CAST(coalesce(sum(c1 + c2) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS HUGEINT) AS b
  FROM g
), s AS (
  SELECT CAST(sum(c1 * (2 * b + c1 + c2 + 1)) AS HUGEINT) AS r1_x2,
         CAST(sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS HUGEINT) AS tie_cubes
  FROM cum
)
SELECT CAST(n.n1 AS BIGINT) AS n_click, CAST(n.n2 AS BIGINT) AS n_view,
       CAST(s.r1_x2 - n.n1 * (n.n1 + 1) AS BIGINT) AS u_click_x2,
       CAST(2 * n.n1 * n.n2 - (s.r1_x2 - n.n1 * (n.n1 + 1)) AS BIGINT) AS u_view_x2,
       CAST(s.tie_cubes AS BIGINT) AS tie_cubes,
       CAST((s.r1_x2 - n.n1 * (n.n1 + 1)) * 1000000 // (2 * n.n1 * n.n2) AS BIGINT)
         AS auc_ppm,
       CAST(floor(((s.r1_x2 - n.n1 * (n.n1 + 1)) - n.n1 * n.n2) * 1.0
            / (2.0 * sqrt(CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE) / 12.0
               * ((CAST(n.n1 + n.n2 AS DOUBLE) + 1.0)
                  - CAST(s.tie_cubes AS DOUBLE)
                    / (CAST(n.n1 + n.n2 AS DOUBLE)
                       * (CAST(n.n1 + n.n2 AS DOUBLE) - 1.0)))))
            * 1000 + 0.5) AS BIGINT) AS z_milli,
       CAST(CASE WHEN abs(floor(((s.r1_x2 - n.n1 * (n.n1 + 1)) - n.n1 * n.n2) * 1.0
            / (2.0 * sqrt(CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE) / 12.0
               * ((CAST(n.n1 + n.n2 AS DOUBLE) + 1.0)
                  - CAST(s.tie_cubes AS DOUBLE)
                    / (CAST(n.n1 + n.n2 AS DOUBLE)
                       * (CAST(n.n1 + n.n2 AS DOUBLE) - 1.0)))))
            * 1000 + 0.5)) >= 1960 THEN 1 ELSE 0 END AS BIGINT) AS reject_95
FROM s CROSS JOIN n
""",
)
def events_mannwhitney_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U via 2×midranks from the quantized-cents count
    table (B294): integer U's, tie term and AUC ppm; float only in the
    final tie-corrected normal z (the KS threshold precedent)."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    v = ev.filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    ).select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return mannwhitney_over_counts(
        v.groupBy("cents").agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("c1"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("c2"),
        )
    )


def mannwhitney_over_counts(g0: DataFrame) -> DataFrame:
    """The B294 ledger from a (cents, c1, c2) count table — shared by the
    batch query and the streaming twin
    (``streaming.stream_ops.mannwhitney_from_state``), so the streamed
    state converges to the batch output exactly."""
    dec = "decimal(38,0)"
    g = g0.select(
        "cents", F.col("c1").cast(dec).alias("c1"), F.col("c2").cast(dec).alias("c2")
    )
    n = g.agg(F.sum("c1").cast(dec).alias("n1"), F.sum("c2").cast(dec).alias("n2"))
    # window over the distinct-cents table only (bounded-cardinality
    # contract of the KS/equi-depth family)
    wb = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = g.select(
        "cents",
        "c1",
        "c2",
        F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(wb), F.lit(0)).cast(dec).alias("b"),
    )
    s = cum.agg(
        F.sum(F.expr("c1 * (2 * b + c1 + c2 + 1)")).cast(dec).alias("r1_x2"),
        F.sum(F.expr("(c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)"))
        .cast(dec)
        .alias("tie_cubes"),
    )
    zf = (
        "floor((cast(r1_x2 - n1 * (n1 + 1) as double) - cast(n1 * n2 as double))"
        " / (2.0 * sqrt(cast(n1 as double) * cast(n2 as double) / 12.0"
        "    * ((cast(n1 + n2 as double) + 1.0)"
        "       - cast(tie_cubes as double)"
        "         / (cast(n1 + n2 as double) * (cast(n1 + n2 as double) - 1.0)))))"
        " * 1000 + 0.5)"
    )
    return s.crossJoin(F.broadcast(n)).select(
        F.col("n1").cast("long").alias("n_click"),
        F.col("n2").cast("long").alias("n_view"),
        F.expr("r1_x2 - n1 * (n1 + 1)").cast("long").alias("u_click_x2"),
        F.expr("2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1))").cast("long").alias("u_view_x2"),
        F.col("tie_cubes").cast("long").alias("tie_cubes"),
        F.expr("(r1_x2 - n1 * (n1 + 1)) * 1000000 div (2 * n1 * n2)")
        .cast("long")
        .alias("auc_ppm"),
        F.expr(zf).cast("long").alias("z_milli"),
        F.expr(f"case when abs({zf}) >= 1960 then 1 else 0 end").cast("long").alias(
            "reject_95"
        ),
    )


# ---------------------------------------------------------------------------
# B296: skew-salting advisor — the fix B72 diagnoses, planned as numbers (r14)
# ---------------------------------------------------------------------------
# B72 profiles join-key skew; this op emits the PLAN a skew-aware join
# actually needs: per hot key, the salt factor f = ceil(c / target) that
# splits its rows into under-target slices (target = the per-task budget
# a 256-task stage gives the key column, floor total/256, min 1). The
# ledger quantifies the payoff BEFORE the shuffle runs: max task rows
# before (the straggler) vs after (max over keys of ceil(c/f) — provably
# ≤ target + the sub-target keys' own sizes), hot-key count, and the
# extra partitions salting costs (Σf − n_hot). Pure integer arithmetic;
# one keyed count + aggregates over it; top-10 hot keys by count for the
# human reading the plan.
_SALT_TASKS = 256


@register(
    "events_salting_advisor",
    f"""
WITH c AS (
  SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id
), t AS (
  SELECT CAST(greatest(sum(c) // {_SALT_TASKS}, 1) AS BIGINT) AS target,
         CAST(max(c) AS BIGINT) AS max_before,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM c
), f AS (
  SELECT c.k, c.c, t.target, t.max_before, t.n_keys,
         CASE WHEN c.c > t.target THEN (c.c + t.target - 1) // t.target ELSE 1 END AS sf
  FROM c CROSS JOIN t
), led AS (
  SELECT max(target) AS target, max(max_before) AS max_before, max(n_keys) AS n_keys,
         CAST(sum(CASE WHEN sf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys,
         CAST(max((c + sf - 1) // sf) AS BIGINT) AS max_after,
         CAST(sum(sf) - count(*) AS BIGINT) AS extra_partitions
  FROM f
), top AS (
  SELECT k, c, sf, (c + sf - 1) // sf AS rows_per_salt,
         row_number() OVER (ORDER BY c DESC, k) AS rnk
  FROM f
)
SELECT CAST(top.k AS BIGINT) AS key, top.c AS n_rows,
       CAST(top.sf AS BIGINT) AS salt_factor,
       CAST(top.rows_per_salt AS BIGINT) AS rows_per_salt,
       CAST(top.rnk AS BIGINT) AS rnk,
       led.target AS target_rows_per_task, led.max_before, led.max_after,
       led.n_keys, led.n_hot_keys, led.extra_partitions
FROM top CROSS JOIN led
WHERE top.rnk <= 10
ORDER BY top.rnk
""",
)
def events_salting_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salting plan over the user_id join-key histogram (B296):
    per-hot-key ceil-division salt factors, before/after straggler rows,
    and the partition overhead — the numbers a skew join is tuned by."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.groupBy(F.col("user_id").alias("k")).agg(F.count("*").cast("long").alias("c"))
    t = c.agg(
        F.expr(f"cast(greatest(sum(c) div {_SALT_TASKS}, 1) as bigint)").alias("target"),
        F.max("c").cast("long").alias("max_before"),
        F.count("*").cast("long").alias("n_keys"),
    )
    f = c.crossJoin(F.broadcast(t)).select(
        "k",
        "c",
        "target",
        "max_before",
        "n_keys",
        F.expr(
            "case when c > target then (c + target - 1) div target else 1 end"
        ).alias("sf"),
    )
    led = f.agg(
        F.max("target").alias("target"),
        F.max("max_before").alias("max_before"),
        F.max("n_keys").alias("n_keys"),
        F.sum(F.when(F.col("sf") > 1, 1).otherwise(0)).cast("long").alias("n_hot_keys"),
        F.max(F.expr("(c + sf - 1) div sf")).cast("long").alias("max_after"),
        (F.sum("sf") - F.count("*")).cast("long").alias("extra_partitions"),
    )
    w = Window.orderBy(F.col("c").desc(), "k")
    top = f.select(
        "k", "c", "sf", F.expr("(c + sf - 1) div sf").alias("rows_per_salt")
    ).withColumn("rnk", F.row_number().over(w))
    return (
        top.filter(F.col("rnk") <= 10)
        .crossJoin(F.broadcast(led))
        .select(
            F.col("k").cast("long").alias("key"),
            F.col("c").alias("n_rows"),
            F.col("sf").cast("long").alias("salt_factor"),
            F.col("rows_per_salt").cast("long").alias("rows_per_salt"),
            F.col("rnk").cast("long").alias("rnk"),
            F.col("target").alias("target_rows_per_task"),
            "max_before",
            "max_after",
            "n_keys",
            "n_hot_keys",
            "extra_partitions",
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# B297: v-optimal histogram — the optimizer-statistics construction (r14)
# ---------------------------------------------------------------------------
# Equi-depth bins (B94) choose boundaries by mass; a V-OPTIMAL histogram
# (Jagadish et al., VLDB 1998 — the construction behind real optimizer
# column stats) chooses them to minimize total within-bucket variance,
# so selectivity estimates degrade the least. K=4 buckets over the daily
# count series: instead of the classical sequential DP, the bounded
# split space C(D−1,3) is ENUMERATED declaratively (three self-joins of
# the prefix table + one argmin — 8M rows even for a decade of days:
# Catalyst distributes the search; no driver loop, no recursion).
# Exactness: per-segment SSE via the prefix identity Σc²−S²/len, with
# the division floored once per segment (cost = Q − S² div len, a
# nonneg integer on both engines); argmin tie-breaks on (i,j,k) asc.
# 128-bit accumulators — S² passes int64 only to ~3e9 total rows.
@register(
    "events_voptimal_histogram",
    """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(floor(epoch(ts) / 86400) AS BIGINT)
), pre AS (
  SELECT d, c, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
         CAST(sum(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS p1,
         CAST(sum(c * c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS p2
  FROM daily
), tot AS (
  SELECT rn AS dn, p1 AS q1, p2 AS q2 FROM pre ORDER BY rn DESC LIMIT 1
), spl AS (
  SELECT a.rn AS i, b.rn AS j, c2.rn AS k, t.dn,
         (a.p2 - (a.p1 * a.p1) // a.rn)
       + ((b.p2 - a.p2) - ((b.p1 - a.p1) * (b.p1 - a.p1)) // (b.rn - a.rn))
       + ((c2.p2 - b.p2) - ((c2.p1 - b.p1) * (c2.p1 - b.p1)) // (c2.rn - b.rn))
       + ((t.q2 - c2.p2) - ((t.q1 - c2.p1) * (t.q1 - c2.p1)) // (t.dn - c2.rn))
         AS total
  FROM pre a JOIN pre b ON b.rn > a.rn JOIN pre c2 ON c2.rn > b.rn
  CROSS JOIN tot t
  WHERE c2.rn < t.dn
), best AS (
  SELECT i, j, k, dn, total FROM spl ORDER BY total, i, j, k LIMIT 1
), segb AS (
  SELECT 1 AS seg_id, CAST(0 AS BIGINT) AS a, i AS b, total FROM best
  UNION ALL SELECT 2, i, j, total FROM best
  UNION ALL SELECT 3, j, k, total FROM best
  UNION ALL SELECT 4, k, dn, total FROM best
)
SELECT CAST(s.seg_id AS BIGINT) AS seg_id,
       CAST((SELECT d FROM pre WHERE rn = s.a + 1) AS BIGINT) AS day_lo,
       CAST((SELECT d FROM pre WHERE rn = s.b) AS BIGINT) AS day_hi,
       CAST(s.b - s.a AS BIGINT) AS n_days,
       CAST(pb.p1 - coalesce(pa.p1, 0) AS BIGINT) AS seg_events,
       CAST((pb.p2 - coalesce(pa.p2, 0))
            - ((pb.p1 - coalesce(pa.p1, 0)) * (pb.p1 - coalesce(pa.p1, 0)))
              // (s.b - s.a) AS BIGINT) AS seg_sse,
       CAST(s.total AS BIGINT) AS total_sse
FROM segb s JOIN pre pb ON pb.rn = s.b LEFT JOIN pre pa ON pa.rn = s.a
ORDER BY seg_id
""",
)
def events_voptimal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-optimal 4-bucket histogram of the daily count series (B297):
    the split space enumerated as three prefix-table self-joins + one
    argmin — distributed search, exact integer SSE, (i,j,k) tie-break."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    daily = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    wseq = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # pre (|days| rows) feeds SEVEN consumers (tot, the three split
    # sides, and the three boundary lookups) — checkpoint it once so the
    # events scan + daily window pay once, not per branch (the r14-before
    # plan held 76 exchanges / 38 scans from this fan-out; r14 opt).
    pre = daily.select(
        "d",
        "c",
        F.row_number().over(Window.orderBy("d")).cast("long").alias("rn"),
        F.sum("c").over(wseq).cast(dec).alias("p1"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).over(wseq).cast(dec).alias("p2"),
    ).localCheckpoint(eager=True)
    tot = pre.orderBy(F.col("rn").desc()).limit(1).select(
        F.col("rn").alias("dn"), F.col("p1").alias("q1"), F.col("p2").alias("q2")
    )
    a = pre.select(F.col("rn").alias("i"), F.col("p1").alias("a1"), F.col("p2").alias("a2"))
    b = pre.select(F.col("rn").alias("j"), F.col("p1").alias("b1"), F.col("p2").alias("b2"))
    c2 = pre.select(F.col("rn").alias("k"), F.col("p1").alias("c1"), F.col("p2").alias("c2"))
    spl = (
        a.join(b, F.col("j") > F.col("i"))
        .join(c2, F.col("k") > F.col("j"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("k") < F.col("dn"))
        .select(
            "i",
            "j",
            "k",
            "dn",
            F.expr(
                "(a2 - (a1 * a1) div i)"
                " + ((b2 - a2) - ((b1 - a1) * (b1 - a1)) div (j - i))"
                " + ((c2 - b2) - ((c1 - b1) * (c1 - b1)) div (k - j))"
                " + ((q2 - c2) - ((q1 - c1) * (q1 - c1)) div (dn - k))"
            ).alias("total"),
        )
    )
    best = spl.orderBy("total", "i", "j", "k").limit(1)
    # the four segment rows come from ONE in-row explode of the single
    # best row — the previous 4-way union of best re-executed the cubic
    # split enumeration once per segment (column pruning differs per
    # branch, so no exchange reuse; r14 opt)
    segb = best.select(
        F.explode(
            F.expr(
                "array(struct(1L AS seg_id, cast(0 as bigint) AS a, i AS b),"
                " struct(2L AS seg_id, i AS a, j AS b),"
                " struct(3L AS seg_id, j AS a, k AS b),"
                " struct(4L AS seg_id, k AS a, dn AS b))"
            )
        ).alias("sg"),
        "total",
    ).select(F.col("sg.seg_id").alias("seg_id"), F.col("sg.a").alias("a"), F.col("sg.b").alias("b"), "total")
    plo = pre.select((F.col("rn") - 1).alias("a"), F.col("d").alias("day_lo"))
    phi = pre.select(
        F.col("rn").alias("b"),
        F.col("d").alias("day_hi"),
        F.col("p1").alias("h1"),
        F.col("p2").alias("h2"),
    )
    pa = pre.select(F.col("rn").alias("a"), F.col("p1").alias("l1"), F.col("p2").alias("l2"))
    return (
        segb.join(F.broadcast(plo), "a")
        .join(F.broadcast(phi), "b")
        .join(F.broadcast(pa), "a", "left")
        .select(
            F.col("seg_id").cast("long").alias("seg_id"),
            F.col("day_lo").cast("long").alias("day_lo"),
            F.col("day_hi").cast("long").alias("day_hi"),
            (F.col("b") - F.col("a")).cast("long").alias("n_days"),
            F.expr("cast(h1 - coalesce(l1, 0) as bigint)").alias("seg_events"),
            F.expr(
                "cast((h2 - coalesce(l2, 0))"
                " - ((h1 - coalesce(l1, 0)) * (h1 - coalesce(l1, 0))) div (b - a) as bigint)"
            ).alias("seg_sse"),
            F.col("total").cast("long").alias("total_sse"),
        )
        .orderBy("seg_id")
    )


# ---------------------------------------------------------------------------
# B300: A/B sample-size / power planner (r14)
# ---------------------------------------------------------------------------
# The experiment-family ops (B159/B160 SRM + z-test, B270 uplift, B271
# OBF, B101 CUPED) all ANALYZE a finished experiment; this op answers
# the question asked BEFORE one starts: how many users per arm to detect
# a given lift? Classical two-sample normal power: n/arm = 2σ²(z_{α/2}
# + z_β)² / δ², with σ² measured from the live metric (per-user value
# sum — the unit a user-randomized test actually averages) and δ swept
# over a relative-MDE grid {1,2,5,10}% of the mean. Variance is computed
# from exact integer Σx/Σx² in cents (float enters only in the final
# closed form — the KS-threshold precedent: identical bounded float expr
# over identical exact integers on both engines); z constants pinned at
# the textbook 1.959964/0.841621 (80%) and 1.281552 (90%). Scale: one
# per-user groupBy + one 1-row aggregate; the MDE grid is a literal.
_POWER_MDES_PCT = (1, 2, 5, 10)


@register(
    "events_ab_power_planner",
    f"""
WITH u AS (
  SELECT user_id, CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE value IS NOT NULL GROUP BY user_id
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS HUGEINT) AS s1,
         CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
  FROM u
), m AS (
  SELECT unnest(ARRAY[{", ".join(str(x) for x in _POWER_MDES_PCT)}]) AS mde_pct
)
SELECT CAST(m.mde_pct AS BIGINT) AS mde_pct,
       s.n AS n_users_measured,
       CAST(s.s1 // s.n AS BIGINT) AS mean_cents,
       CAST(s.s2 // s.n - (s.s1 // s.n) * (s.s1 // s.n) AS BIGINT) AS var_cents2,
       CAST(ceil(2.0 * (CAST(s.s2 AS DOUBLE) / s.n
                        - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n))
                 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                 / ((CAST(m.mde_pct AS DOUBLE) / 100.0 * CAST(s.s1 AS DOUBLE) / s.n)
                    * (CAST(m.mde_pct AS DOUBLE) / 100.0 * CAST(s.s1 AS DOUBLE) / s.n)))
            AS BIGINT) AS n_per_arm_power80,
       CAST(ceil(2.0 * (CAST(s.s2 AS DOUBLE) / s.n
                        - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n))
                 * (1.959964 + 1.281552) * (1.959964 + 1.281552)
                 / ((CAST(m.mde_pct AS DOUBLE) / 100.0 * CAST(s.s1 AS DOUBLE) / s.n)
                    * (CAST(m.mde_pct AS DOUBLE) / 100.0 * CAST(s.s1 AS DOUBLE) / s.n)))
            AS BIGINT) AS n_per_arm_power90
FROM m CROSS JOIN s
ORDER BY mde_pct
""",
)
def events_ab_power_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample normal sample-size planner over the measured per-user
    value distribution (B300): exact integer moments, float only in the
    closed-form n = 2σ²(z_α+z_β)²/δ² over the relative-MDE grid."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    u = ev.filter(F.col("value").isNotNull()).groupBy("user_id").agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    s = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast(dec).alias("s1"),
        F.sum(F.expr("cast(cents as decimal(38,0)) * cents")).cast(dec).alias("s2"),
    )
    m = spark.createDataFrame([(x,) for x in _POWER_MDES_PCT], "mde_pct int")
    var_d = (
        "(cast(s2 as double) / n - (cast(s1 as double) / n) * (cast(s1 as double) / n))"
    )
    delta = "(cast(mde_pct as double) / 100.0 * cast(s1 as double) / n)"

    def n_arm(zsum: str) -> str:
        return f"ceil(2.0 * {var_d} * {zsum} * {zsum} / ({delta} * {delta}))"

    return (
        m.crossJoin(F.broadcast(s))
        .select(
            F.col("mde_pct").cast("long").alias("mde_pct"),
            F.col("n").alias("n_users_measured"),
            F.expr("s1 div n").cast("long").alias("mean_cents"),
            F.expr("s2 div n - (s1 div n) * (s1 div n)").cast("long").alias("var_cents2"),
            F.expr(n_arm("(1.959964 + 0.841621)")).cast("long").alias("n_per_arm_power80"),
            F.expr(n_arm("(1.959964 + 1.281552)")).cast("long").alias("n_per_arm_power90"),
        )
        .orderBy("mde_pct")
    )


# ---------------------------------------------------------------------------
# B304: quantile treatment effect — deciles, not means (r14)
# ---------------------------------------------------------------------------
# Every experiment op so far compares MEANS (B160 z, B101 CUPED, B98
# winsorized, B270 uplift); heavy-tailed revenue metrics move in the
# tail long before the mean shifts. The QTE is the per-decile difference
# of arm quantiles — exact integer order statistics from the bounded
# (arm, cents) count table, the same scale-safe machinery as B290 (no
# corpus sort; the cumulative walk runs over distinct cents only). Arms
# are the house seeded SRM split. k-th definition: smallest cents whose
# cumulative count reaches ceil(n·d/10) (d = 1..9). Output per decile:
# both arm quantiles and the cent difference.
@register(
    "events_quantile_treatment_effect",
    """
WITH v AS (
  SELECT CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2
           AS arm,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), g AS (
  SELECT arm, cents, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY arm, cents
), cum AS (
  SELECT arm, cents, c,
         CAST(sum(c) OVER (PARTITION BY arm ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY arm) AS BIGINT) AS n
  FROM g
), d AS (
  SELECT unnest(ARRAY[1, 2, 3, 4, 5, 6, 7, 8, 9]) AS dec
), q AS (
  SELECT d.dec, cum.arm,
         CAST(min(CASE WHEN cum.cc >= (cum.n * d.dec + 9) // 10 THEN cum.cents END)
              AS BIGINT) AS qv
  FROM cum CROSS JOIN d
  GROUP BY d.dec, cum.arm
)
SELECT CAST(a.dec AS BIGINT) AS decile,
       a.qv AS q_arm0_cents, b.qv AS q_arm1_cents,
       CAST(b.qv - a.qv AS BIGINT) AS qte_cents
FROM q a JOIN q b ON b.dec = a.dec AND b.arm = 1
WHERE a.arm = 0
ORDER BY decile
""",
)
def events_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile quantile treatment effect between the seeded arms
    (B304): exact integer order statistics from the bounded (arm, cents)
    count table — the tail-sensitive experiment readout."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        F.expr(
            "CAST(conv(substring(md5(concat('srm:', CAST(user_id AS STRING))), 1, 8), 16, 10)"
            " AS BIGINT) % 2"
        ).alias("arm"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    g = v.groupBy("arm", "cents").agg(F.count("*").cast("long").alias("c"))
    w_cum = (
        Window.partitionBy("arm")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.select(
        "arm",
        "cents",
        "c",
        F.sum("c").over(w_cum).cast("long").alias("cc"),
        F.sum("c").over(Window.partitionBy("arm")).cast("long").alias("n"),
    )
    d = spark.createDataFrame([(x,) for x in range(1, 10)], "dec int")
    q = (
        cum.crossJoin(F.broadcast(d))
        .groupBy("dec", "arm")
        .agg(
            F.min(
                F.when(F.expr("cc >= (n * dec + 9) div 10"), F.col("cents"))
            )
            .cast("long")
            .alias("qv")
        )
    )
    a = q.filter(F.col("arm") == 0).select(F.col("dec").alias("decile"), F.col("qv").alias("q_arm0_cents"))
    b = q.filter(F.col("arm") == 1).select(F.col("dec").alias("decile"), F.col("qv").alias("q_arm1_cents"))
    return (
        a.join(b, "decile")
        .select(
            F.col("decile").cast("long").alias("decile"),
            "q_arm0_cents",
            "q_arm1_cents",
            (F.col("q_arm1_cents") - F.col("q_arm0_cents")).cast("long").alias("qte_cents"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# B305: capture–recapture population estimate (r14)
# ---------------------------------------------------------------------------
# The data-quality question no distinct-count answers: how many users
# exist that the log HASN'T seen? Lincoln–Petersen capture–recapture
# treats two observation windows as independent samples: N̂ = n₁n₂/m
# (m = users seen in both), with Chapman's bias-corrected
# (n₁+1)(n₂+1)/(m+1) − 1 — the estimator ecology and census QA actually
# use. Windows = first half vs second half of the event-time range
# (integer epoch midpoint). Exact integer arithmetic with floored
# division; the coverage ratio observed/N̂ in ppm says how complete the
# log is. Guard: m = 0 → estimates -1 (disjoint samples, no estimate).
@register(
    "events_capture_recapture",
    """
WITH bounds AS (
  SELECT CAST(min(epoch(ts)) AS BIGINT) AS t0, CAST(max(epoch(ts)) AS BIGINT) AS t1
  FROM events
), tagged AS (
  SELECT e.user_id,
         CASE WHEN CAST(epoch(e.ts) AS BIGINT) * 2 < b.t0 + b.t1 THEN 0 ELSE 1 END AS w
  FROM events e CROSS JOIN bounds b
), pres AS (
  SELECT user_id,
         max(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS in1,
         max(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS in2
  FROM tagged GROUP BY user_id
), s AS (
  SELECT CAST(sum(in1) AS BIGINT) AS n1, CAST(sum(in2) AS BIGINT) AS n2,
         CAST(sum(in1 * in2) AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS observed
  FROM pres
)
SELECT n1 AS n_window1, n2 AS n_window2, m AS n_both, observed AS n_observed,
       CAST(CASE WHEN m > 0 THEN (n1 * n2) // m ELSE -1 END AS BIGINT) AS lp_estimate,
       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman_estimate,
       CAST(CASE WHEN m > 0 THEN observed * 1000000 // ((n1 * n2) // m) ELSE -1 END
            AS BIGINT) AS coverage_ppm
FROM s
""",
)
def events_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln–Petersen / Chapman population estimate from two halves of
    the event-time range (B305): how many users the log has NOT seen,
    and the implied coverage ppm."""
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("double")).cast("long").alias("t0"),
        F.max(F.col("ts").cast("double")).cast("long").alias("t1"),
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        # truncate to whole seconds BEFORE doubling — the oracle's
        # CAST(epoch(ts) AS BIGINT) does; comparing fractional seconds
        # would flip events that land within 0.5 s of the midpoint
        F.expr(
            "CASE WHEN CAST(CAST(ts AS DOUBLE) AS BIGINT) * 2 < t0 + t1 THEN 0 ELSE 1 END"
        ).alias("w"),
    )
    pres = tagged.groupBy("user_id").agg(
        F.max(F.when(F.col("w") == 0, 1).otherwise(0)).alias("in1"),
        F.max(F.when(F.col("w") == 1, 1).otherwise(0)).alias("in2"),
    )
    s = pres.agg(
        F.sum("in1").cast("long").alias("n1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("m"),
        F.count("*").cast("long").alias("observed"),
    )
    return s.select(
        F.col("n1").alias("n_window1"),
        F.col("n2").alias("n_window2"),
        F.col("m").alias("n_both"),
        F.col("observed").alias("n_observed"),
        F.expr("CASE WHEN m > 0 THEN (n1 * n2) div m ELSE -1 END").cast("long").alias(
            "lp_estimate"
        ),
        F.expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").cast("long").alias("chapman_estimate"),
        F.expr(
            "CASE WHEN m > 0 THEN observed * 1000000 div ((n1 * n2) div m) ELSE -1 END"
        )
        .cast("long")
        .alias("coverage_ppm"),
    )


# --------------------------------------------------------------------------
# B310: LRU reuse-distance hit-ratio curve (cache-planning audit).
#
# Classic storage/feature-cache capacity planning (Mattson stack analysis):
# for every repeat access to a key, the LRU stack distance is the number of
# DISTINCT keys touched since that key's previous access, +1; an LRU cache
# of capacity C serves the access from cache iff that distance ≤ C. The
# query replays each user's access stream (key = the numeric payload of
# props folded to a 16-slot keyspace), computes exact reuse distances, and
# emits the hit-ratio curve for C ∈ {1,2,4,8,16} — the curve a cache-sizing
# decision reads directly.
#
# Scale: everything is keyed by user_id — the window, the gap join, and the
# distinct-count all co-partition on the same key, and per-user streams are
# bounded (sessionized workloads), so the gap join is Σ-gap-lengths work
# per user, linear across users with no global shuffle beyond the user key.
# The 5-row capacity grid is a broadcast literal.
# --------------------------------------------------------------------------


@register(
    "events_lru_hit_curve",
    """
WITH acc AS (
  SELECT user_id,
         coalesce(CAST(nullif(regexp_extract(props, '[0-9]+'), '') AS BIGINT) % 16, -1)
           AS k,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), rep AS (
  SELECT user_id, k, rn,
         lag(rn) OVER (PARTITION BY user_id, k ORDER BY rn) AS prn
  FROM acc
), gaps AS (
  SELECT r.user_id, r.rn, CAST(count(DISTINCT a.k) AS BIGINT) AS d
  FROM (SELECT * FROM rep WHERE prn IS NOT NULL) r
  LEFT JOIN acc a ON a.user_id = r.user_id AND a.rn > r.prn AND a.rn < r.rn
  GROUP BY r.user_id, r.rn
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_acc,
         CAST(sum(CASE WHEN prn IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cold
  FROM rep
), curve AS (
  SELECT CAST(c AS BIGINT) AS cache_size FROM (VALUES (1),(2),(4),(8),(16)) v(c)
), sel AS (
  SELECT c.cache_size,
         CAST(sum(CASE WHEN g.d <= c.cache_size - 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits
  FROM curve c, gaps g
  GROUP BY c.cache_size
)
SELECT s.cache_size,
       t.n_acc AS n_accesses,
       t.n_cold AS n_cold_misses,
       t.n_acc - t.n_cold AS n_repeat_accesses,
       s.n_hits,
       CAST(s.n_hits * 1000000 // t.n_acc AS BIGINT) AS hit_ratio_ppm
FROM sel s, tot t
ORDER BY s.cache_size
""",
)
def events_lru_hit_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mattson reuse-distance replay + LRU hit-ratio curve for
    capacity ∈ {1,2,4,8,16} (B310). Co-partitioned on user_id throughout;
    per-user streams bounded, capacity grid broadcast."""
    ev = read_table(spark, sf_dir, "events")
    acc = ev.select(
        "user_id",
        F.expr(
            "coalesce(cast(nullif(regexp_extract(props, '[0-9]+', 0), '') as bigint) % 16, -1)"
        ).alias("k"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    rep = acc.select(
        "user_id",
        "k",
        "rn",
        F.lag("rn").over(Window.partitionBy("user_id", "k").orderBy("rn")).alias("prn"),
    )
    repn = rep.filter(F.col("prn").isNotNull()).select("user_id", "prn", "rn")
    a2 = acc.select(F.col("user_id").alias("u2"), F.col("k").alias("k2"), F.col("rn").alias("rn2"))
    gaps = (
        repn.join(
            a2,
            (F.col("u2") == F.col("user_id"))
            & (F.col("rn2") > F.col("prn"))
            & (F.col("rn2") < F.col("rn")),
            "left",
        )
        .groupBy("user_id", "rn")
        .agg(F.countDistinct("k2").cast("long").alias("d"))
    )
    tot = rep.agg(
        F.count("*").cast("long").alias("n_acc"),
        F.sum(F.when(F.col("prn").isNull(), 1).otherwise(0)).cast("long").alias("n_cold"),
    )
    curve = spark.range(5).select(
        F.expr("cast(shiftleft(1, cast(id as int)) as long)").alias("cache_size")
    )
    sel = (
        F.broadcast(curve)
        .crossJoin(gaps)
        .groupBy("cache_size")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("cache_size") - 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hits")
        )
    )
    return (
        sel.crossJoin(F.broadcast(tot))
        .select(
            "cache_size",
            F.col("n_acc").alias("n_accesses"),
            F.col("n_cold").alias("n_cold_misses"),
            (F.col("n_acc") - F.col("n_cold")).cast("long").alias("n_repeat_accesses"),
            "n_hits",
            F.expr("n_hits * 1000000 div n_acc").cast("long").alias("hit_ratio_ppm"),
        )
        .orderBy("cache_size")
    )


# --------------------------------------------------------------------------
# B312: Benjamini-Hochberg FDR gate over a segment scan (multiple testing).
#
# The standard guard against p-hacking a segment drill-down: test every
# (event_type × day-of-week) segment's high-value rate against the global
# rate, then control the FALSE DISCOVERY RATE at 5% with the
# Benjamini-Hochberg step-up rule instead of gating each segment at raw
# p<0.05. Distribution-free and float-free: the per-segment statistic is
# the exact binomial z² in micro-units (128-bit cross-engine arithmetic —
# (sN−nS)² needs ~1e20), converted to a CONSERVATIVE p-value via the
# Chebyshev bound p ≤ 1/z² (documented: a distribution-free bound, looser
# than the normal tail, so discoveries here survive ANY distributional
# assumption). BH adjustment = reverse running-min of p·m/rank over the
# deterministically ranked p's — one window over a ≤35-row aggregate.
#
# Scale: one groupBy over events (partial-agg friendly), a broadcast 1-row
# global join, and windows over a bounded segment table.
# --------------------------------------------------------------------------


@register(
    "events_bh_fdr_gate",
    """
WITH seg AS (
  SELECT event_type,
         CAST(date_part('dow', ts) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000
                       THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
), g AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
         CAST(count(*) AS BIGINT) AS m
  FROM seg
), z AS (
  SELECT seg.event_type, seg.dow, seg.n, seg.s,
         CAST((CAST(seg.s AS HUGEINT) * g.nn - CAST(seg.n AS HUGEINT) * g.ss)
              * (CAST(seg.s AS HUGEINT) * g.nn - CAST(seg.n AS HUGEINT) * g.ss)
              * 1000000
              // (CAST(seg.n AS HUGEINT) * g.ss * (g.nn - g.ss)) AS BIGINT)
           AS z2_micro,
         g.m
  FROM seg, g
), p AS (
  SELECT event_type, dow, n, s, z2_micro, m,
         CAST(least(1000000, 1000000000000 // greatest(z2_micro, 1)) AS BIGINT)
           AS p_micro
  FROM z
), rk AS (
  SELECT *, CAST(row_number() OVER (ORDER BY p_micro, event_type, dow) AS BIGINT)
              AS bh_rank
  FROM p
)
SELECT event_type, dow, n, s, z2_micro, p_micro, bh_rank,
       CAST(least(1000000,
                  min(p_micro * m // bh_rank)
                    OVER (ORDER BY bh_rank ROWS BETWEEN CURRENT ROW
                          AND UNBOUNDED FOLLOWING)) AS BIGINT) AS adj_p_micro,
       CAST(CASE WHEN least(1000000,
                            min(p_micro * m // bh_rank)
                              OVER (ORDER BY bh_rank ROWS BETWEEN CURRENT ROW
                                    AND UNBOUNDED FOLLOWING)) <= 50000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_discovery
FROM rk
ORDER BY bh_rank
""",
)
def events_bh_fdr_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH step-up FDR control at 5% over (event_type × dow) high-value-rate
    segments (B312): exact 128-bit binomial z², Chebyshev p ≤ 1/z², reverse
    running-min adjustment, deterministic tie-broken ranks."""
    ev = read_table(spark, sf_dir, "events")
    return bh_fdr_over_counts(segment_counts(ev))


def segment_counts(ev: DataFrame) -> DataFrame:
    """(event_type, dow, n, s) high-value segment counts — the SHARED,
    sum-mergeable state behind the BH-FDR gate (B312), the EB shrinkage
    (B323), and the streaming sink (``stream_ops.stream_segment_counts``,
    B337): one count table, many read-time views."""
    return ev.groupBy(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when(F.round(F.col("value") * 100).cast("long") >= 5000, 1).otherwise(0)
        )
        .cast("long")
        .alias("s"),
    )


def bh_fdr_over_counts(seg: DataFrame) -> DataFrame:
    """BH step-up over a (event_type, dow, n, s) table — identical
    arithmetic batch and from streamed state."""
    dec = "decimal(38,0)"
    g = seg.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
        F.count("*").cast("long").alias("m"),
    )
    z = seg.crossJoin(F.broadcast(g)).select(
        "event_type",
        "dow",
        "n",
        "s",
        "m",
        F.expr(
            f"cast((cast(s as {dec}) * nn - cast(n as {dec}) * ss)"
            f" * (cast(s as {dec}) * nn - cast(n as {dec}) * ss)"
            f" * 1000000 div (cast(n as {dec}) * ss * (nn - ss)) as long)"
        ).alias("z2_micro"),
    )
    p = z.withColumn(
        "p_micro",
        F.expr("cast(least(1000000, 1000000000000 div greatest(z2_micro, 1)) as long)"),
    )
    w_rank = Window.orderBy("p_micro", "event_type", "dow")
    rk = p.withColumn("bh_rank", F.row_number().over(w_rank).cast("long"))
    w_tail = Window.orderBy("bh_rank").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    adj = F.least(
        F.lit(1000000).cast("long"),
        F.min(F.expr("p_micro * m div bh_rank")).over(w_tail),
    ).cast("long")
    return rk.select(
        "event_type",
        "dow",
        "n",
        "s",
        "z2_micro",
        "p_micro",
        "bh_rank",
        adj.alias("adj_p_micro"),
        F.when(adj <= 50000, 1).otherwise(0).cast("long").alias("is_discovery"),
    ).orderBy("bh_rank")


# --------------------------------------------------------------------------
# B314: HyperLogLog register audit — the sketch, exactly, in integers.
#
# events_sliding_distinct_hll (B-earlier) runs a real HLL rows-only; this
# op pins the ENTIRE sketch pipeline under the strict oracle by computing
# it float-free: md5-derived 48-bit hashes, m=64 registers (6-bit index,
# 42-bit payload), rank = leading zeros + 1 via length(bin(w)) (both
# engines print binary without leading zeros), and the raw HLL estimator
# α·m²/Σ2^(−M_j) evaluated EXACTLY by scaling the harmonic sum to 2^43
# (so Σ 2^(43−M_j) is an integer ≤ 2^49) and α to ppm
# (α₆₄ = 0.7213/(1+1.079/64) → 709340 ppm, the published constant,
# floored once identically on both engines; the numerator needs 128-bit).
# The published small-range (linear-counting) correction is applied when
# raw ≤ 5m/2 and zero registers remain — float-free because V has only 64
# possible values, so ln(m/V) is a fixed-point table literal shared by
# both engines. The output carries raw, corrected, and applied estimates
# plus the exact distinct, so the error is measured, not assumed.
#
# Scale: one groupBy user_id-hash → 64-row register table (map-side
# partial max), a 64-row grid join for empty registers, one 1-row reduce.
# --------------------------------------------------------------------------

_HLL_M = 64
_HLL_ALPHA_PPM = 709340  # floor(0.7213 / (1 + 1.079/64) * 1e6)
# Small-range (linear-counting) correction: when the raw estimate sits at or
# below 5m/2 and some register is still zero, the published estimator is
# m·ln(m/V). V (the zero-register count) has only 64 possible values, so the
# logarithm is a 64-entry FIXED-POINT table — float-free and identical on
# both engines by construction (same python-generated literal).
_HLL_LN_MICRO = {v: round(math.log(_HLL_M / v) * 1_000_000) for v in range(1, _HLL_M + 1)}
_HLL_LN_CASE = (
    "CASE n_zero "
    + " ".join(f"WHEN {v} THEN {mu}" for v, mu in _HLL_LN_MICRO.items())
    + " ELSE 0 END"
)


@register(
    "events_hll_register_audit",
    f"""
WITH h AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS hv
  FROM events
), reg AS (
  SELECT hv // 4398046511104 AS j,  -- top 6 bits of 48
         hv % 4398046511104 AS w    -- low 42 bits
  FROM h
), mj AS (
  SELECT j, CAST(max(CASE WHEN w = 0 THEN 43
                          ELSE 43 - length(bin(w)) END) AS BIGINT) AS m_j
  FROM reg GROUP BY j
), full_reg AS (
  SELECT CAST(g.j AS BIGINT) AS j, coalesce(mj.m_j, 0) AS m_j
  FROM unnest(range({_HLL_M})) AS g(j) LEFT JOIN mj ON mj.j = g.j
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         CAST(sum(CAST(2 AS BIGINT) ** (43 - m_j)) AS BIGINT) AS harmonic_scaled
  FROM full_reg
), x AS (
  SELECT s.m, s.n_zero, s.harmonic_scaled,
         CAST(CAST({_HLL_ALPHA_PPM} AS HUGEINT) * s.m * s.m * 8796093022208
              // s.harmonic_scaled // 1000000 AS BIGINT) AS hll_estimate,
         (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
           AS exact_distinct
  FROM s
), y AS (
  SELECT *, CAST(m * ({_HLL_LN_CASE}) // 1000000 AS BIGINT) AS lc_estimate
  FROM x
)
SELECT m AS n_registers, n_zero AS n_zero_registers, harmonic_scaled,
       hll_estimate, lc_estimate,
       CAST(CASE WHEN hll_estimate * 2 <= 5 * m AND n_zero > 0
                 THEN lc_estimate ELSE hll_estimate END AS BIGINT)
         AS applied_estimate,
       exact_distinct,
       CAST(abs(CASE WHEN hll_estimate * 2 <= 5 * m AND n_zero > 0
                     THEN lc_estimate ELSE hll_estimate END
                - exact_distinct) * 1000000 // exact_distinct AS BIGINT)
         AS err_ppm
FROM y
""",
)
def events_hll_register_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Float-free HLL (m=64) over distinct users (B314): exact integer
    registers, 2^43-scaled harmonic sum, ppm-scaled α, raw + linear-counting
    small-range correction, vs the exact distinct with the realized error."""
    ev = read_table(spark, sf_dir, "events")
    mj = hll_registers(ev.select("user_id"))
    est = hll_estimate_over_registers(mj)
    exact = ev.agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_registers",
        "n_zero_registers",
        "harmonic_scaled",
        "hll_estimate",
        "lc_estimate",
        "applied_estimate",
        "exact_distinct",
        F.expr("abs(applied_estimate - exact_distinct) * 1000000 div exact_distinct")
        .cast("long")
        .alias("err_ppm"),
    )


def hll_registers(users: DataFrame) -> DataFrame:
    """(j, m_j) register table for a `user_id` column — the max-mergeable
    HLL state shared by the batch audit (B314) and the streaming twin
    (``streaming.stream_ops.stream_hll``): max() is associative AND
    idempotent, so duplicate users across micro-batches fold away exactly
    like the batch DISTINCT."""
    h = users.select(
        F.expr(
            "cast(conv(substring(md5(concat('hll:', cast(user_id as string))), 1, 12),"
            " 16, 10) as bigint)"
        ).alias("hv")
    )
    reg = h.select(
        F.expr("hv div 4398046511104").alias("j"),
        F.expr("hv % 4398046511104").alias("w"),
    )
    return reg.groupBy("j").agg(
        F.max(
            F.when(F.col("w") == 0, 43).otherwise(F.lit(43) - F.length(F.bin(F.col("w"))))
        )
        .cast("long")
        .alias("m_j")
    )


def hll_estimate_over_registers(mj: DataFrame) -> DataFrame:
    """Estimator columns from a (j, m_j) register table (shared builder —
    identical arithmetic batch and from streamed state): 64-grid fill,
    2^43-scaled harmonic sum, ppm α with a 128-bit numerator, and the
    linear-counting small-range correction."""
    spark = mj.sparkSession
    grid = spark.range(_HLL_M).select(F.col("id").cast("long").alias("j"))
    full_reg = grid.join(F.broadcast(mj), "j", "left").select(
        "j", F.coalesce(F.col("m_j"), F.lit(0)).cast("long").alias("m_j")
    )
    s = full_reg.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).cast("long").alias("n_zero"),
        F.sum(F.expr("cast(shiftleft(cast(1 as bigint), cast(43 - m_j as int)) as bigint)"))
        .cast("long")
        .alias("harmonic_scaled"),
    )
    dec = "decimal(38,0)"
    ln_case = _HLL_LN_CASE.replace("CASE n_zero", "case n_zero")
    return (
        s.select(
            F.col("m").alias("n_registers"),
            F.col("n_zero").alias("n_zero_registers"),
            F.col("n_zero"),
            F.col("m"),
            "harmonic_scaled",
            F.expr(
                f"cast(cast({_HLL_ALPHA_PPM} as {dec}) * m * m * 8796093022208"
                " div harmonic_scaled div 1000000 as long)"
            ).alias("hll_estimate"),
        )
        .withColumn("lc_estimate", F.expr(f"cast(m * ({ln_case}) div 1000000 as long)"))
        .withColumn(
            "applied_estimate",
            F.expr(
                "cast(case when hll_estimate * 2 <= 5 * m and n_zero > 0"
                " then lc_estimate else hll_estimate end as long)"
            ),
        )
        .select(
            "n_registers",
            "n_zero_registers",
            "harmonic_scaled",
            "hll_estimate",
            "lc_estimate",
            "applied_estimate",
        )
    )


# --------------------------------------------------------------------------
# B315: Goodman-Kruskal gamma — ordinal association without square roots.
#
# The engagement question "do users who come more often also spend more?"
# needs an ORDINAL association measure (spend is heavy-tailed; Pearson is
# dominated by outliers). Kendall tau-b needs a square root for its tie
# correction; Goodman-Kruskal gamma = (C−D)/(C+D) is the tie-robust
# sibling that stays in exact integer arithmetic. Frequency is folded to
# {1..10} (count capped), monetary to 10 fixed-width cent buckets, and the
# concordant/discordant pair counts come from the ≤100-cell contingency
# table: C = Σ n_ij · Σ_{i'>i,j'>j} n_i'j' over ordered cell pairs — each
# unordered user pair counted exactly once. The signed division floors
# the MAGNITUDE only (explicit CASE), the cross-engine discipline for
# possibly-negative numerators.
#
# Scale: one groupBy user → one groupBy cell (≤100 rows) → a bounded
# 100×100 broadcast self-join. Nothing after the first agg scales with N.
# --------------------------------------------------------------------------


@register(
    "events_gk_gamma_association",
    """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mcents
  FROM events GROUP BY user_id
), cells AS (
  SELECT least(f, 10) AS fb,
         least(mcents // 100000, 9) AS mb,
         CAST(count(*) AS BIGINT) AS n
  FROM per_user GROUP BY 1, 2
), pairs AS (
  SELECT CAST(sum(CASE WHEN b.fb > a.fb AND b.mb > a.mb
                       THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN b.fb > a.fb AND b.mb < a.mb
                       THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d
  FROM cells a, cells b
), u AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(count(DISTINCT least(f, 10)) AS BIGINT) AS n_f_levels,
         CAST(count(DISTINCT least(mcents // 100000, 9)) AS BIGINT) AS n_m_levels
  FROM per_user
)
SELECT u.n_users, u.n_f_levels, u.n_m_levels,
       p.c AS n_concordant, p.d AS n_discordant,
       CAST(CASE WHEN p.c + p.d = 0 THEN 0
                 WHEN p.c >= p.d THEN (p.c - p.d) * 1000 // (p.c + p.d)
                 ELSE -((p.d - p.c) * 1000 // (p.c + p.d)) END AS BIGINT)
         AS gamma_milli
FROM pairs p, u
""",
)
def events_gk_gamma_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma between per-user visit frequency and spend
    (B315): exact contingency-cell pair counting, sign-explicit milli
    division — ordinal association with zero floats."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("f"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("mcents"),
    )
    cells = per_user.groupBy(
        F.least(F.col("f"), F.lit(10)).alias("fb"),
        F.least(F.expr("mcents div 100000"), F.lit(9)).cast("long").alias("mb"),
    ).agg(F.count("*").cast("long").alias("n"))
    a = cells.select(F.col("fb").alias("fa"), F.col("mb").alias("ma"), F.col("n").alias("na"))
    b = cells.select(F.col("fb").alias("fb2"), F.col("mb").alias("mb2"), F.col("n").alias("nb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .agg(
            F.sum(
                F.when(
                    (F.col("fb2") > F.col("fa")) & (F.col("mb2") > F.col("ma")),
                    F.col("na") * F.col("nb"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("c"),
            F.sum(
                F.when(
                    (F.col("fb2") > F.col("fa")) & (F.col("mb2") < F.col("ma")),
                    F.col("na") * F.col("nb"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("d"),
        )
    )
    u = per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.countDistinct(F.least(F.col("f"), F.lit(10))).cast("long").alias("n_f_levels"),
        F.countDistinct(F.least(F.expr("mcents div 100000"), F.lit(9)))
        .cast("long")
        .alias("n_m_levels"),
    )
    return pairs.crossJoin(F.broadcast(u)).select(
        "n_users",
        "n_f_levels",
        "n_m_levels",
        F.col("c").alias("n_concordant"),
        F.col("d").alias("n_discordant"),
        F.expr(
            "cast(case when c + d = 0 then 0"
            " when c >= d then (c - d) * 1000 div (c + d)"
            " else -((d - c) * 1000 div (c + d)) end as long)"
        ).alias("gamma_milli"),
    )


# --------------------------------------------------------------------------
# B318: Cramér-von Mises two-sample test — the INTEGRATED ECDF distance.
#
# Completes the two-sample family: KS (B-earlier) is the sup of the ECDF
# gap, Mann-Whitney (B294) the rank shift; Cramér-von Mises integrates the
# SQUARED gap over the pooled sample, catching spread/shape differences a
# location test misses. Over the quantized-cents count table the statistic
# is exact rational: T = Σ_k w_k·(a_k·m − b_k·n)² / (N²·n·m) with a/b the
# cumulative group counts at each distinct value and w its pooled
# multiplicity — ties handled by construction (all tied points share one
# ECDF step). The numerator reaches ~1e25 ⇒ 128-bit on both engines; the
# micro-scaled T compares against the published large-sample 5% critical
# value 0.461.
#
# Scale: one groupBy cents (bounded quantized domain), one ordered window
# over that aggregated table, one reduce.
# --------------------------------------------------------------------------


@register(
    "events_cvm_two_sample",
    """
WITH v AS (
  SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS grp,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
), g AS (
  SELECT cents,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM v GROUP BY cents
), cum AS (
  SELECT cents, c1, c2,
         CAST(sum(c1) OVER (ORDER BY cents) AS BIGINT) AS a,
         CAST(sum(c2) OVER (ORDER BY cents) AS BIGINT) AS b
  FROM g
), tot AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
         CAST(count(*) AS BIGINT) AS k
  FROM g
), s AS (
  SELECT CAST(sum((c.c1 + c.c2)
                  * (CAST(c.a AS HUGEINT) * t.n2 - CAST(c.b AS HUGEINT) * t.n1)
                  * (CAST(c.a AS HUGEINT) * t.n2 - CAST(c.b AS HUGEINT) * t.n1))
              AS HUGEINT) AS num
  FROM cum c, tot t
)
SELECT t.n1, t.n2, t.k AS n_distinct_values,
       CAST(s.num * 1000000
            // (CAST(t.n1 + t.n2 AS HUGEINT) * (t.n1 + t.n2) * t.n1 * t.n2)
            AS BIGINT) AS t_micro,
       CAST(461000 AS BIGINT) AS crit_micro_5pct,
       CAST(CASE WHEN s.num * 1000000
                      // (CAST(t.n1 + t.n2 AS HUGEINT) * (t.n1 + t.n2) * t.n1 * t.n2)
                      > 461000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_reject
FROM s, tot t
""",
)
def events_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Cramér-von Mises over quantized cents (B318):
    integrated squared ECDF gap in 128-bit integers, micro-scaled vs the
    0.461 large-sample 5% critical value."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    v = ev.filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    ).select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return cvm_over_counts(
        v.groupBy("cents").agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("c1"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("c2"),
        )
    )


def cvm_over_counts(g0: DataFrame) -> DataFrame:
    """CvM T from a (cents, c1, c2) count table — the SAME state shape the
    streamed Mann-Whitney maintains, so the streaming read-view
    (``streaming.stream_ops.cvm_from_state``) reuses B307's state verbatim:
    one mergeable count table, two rank tests at read time."""
    dec = "decimal(38,0)"
    g = g0
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = g.select(
        "cents",
        "c1",
        "c2",
        F.sum("c1").over(w).cast("long").alias("a"),
        F.sum("c2").over(w).cast("long").alias("b"),
    )
    tot = g.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.count("*").cast("long").alias("k"),
    )
    s = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n1",
            "n2",
            "k",
            F.expr(
                f"(c1 + c2) * (cast(a as {dec}) * n2 - cast(b as {dec}) * n1)"
                f" * (cast(a as {dec}) * n2 - cast(b as {dec}) * n1)"
            ).alias("term"),
        )
        .groupBy("n1", "n2", "k")
        .agg(F.sum("term").alias("num"))
    )
    t_micro = F.expr(
        f"cast(num * 1000000 div (cast(n1 + n2 as {dec}) * (n1 + n2) * n1 * n2) as long)"
    )
    return s.select(
        "n1",
        "n2",
        F.col("k").alias("n_distinct_values"),
        t_micro.alias("t_micro"),
        F.lit(461000).cast("long").alias("crit_micro_5pct"),
        F.when(t_micro > 461000, 1).otherwise(0).cast("long").alias("is_reject"),
    )


# --------------------------------------------------------------------------
# B319: TTL cache hit-ratio curve — the time-based twin of the LRU curve.
#
# Feature stores and CDN edges mostly run TTL caches, not LRU: an entry
# serves hits for T seconds after (re)fetch regardless of working-set
# size. For a TTL policy evaluated on the access log, a repeat access to
# (user, key) is a hit iff the time since that key's PREVIOUS access is
# ≤ T — one lag() per key stream, no gap join at all (the structural
# contrast with B310: TTL needs only the per-key inter-access time,
# LRU needs the cross-key distinct count). Whole seconds via the
# truncate-before-compare discipline (the capture-recapture precedent).
# Curve over T ∈ {60, 300, 1800, 7200, 86400} on a broadcast grid,
# emitting hit ratio AND the freshness price: hits on entries whose age
# exceeds the TTL under a LONGER policy would be stale — so the curve is
# read jointly with staleness tolerance, documented per row as the mean
# served age in seconds (floor).
#
# Scale: one window per (user, key) — co-partitioned on user — then one
# bounded-grid conditional aggregate. Linear, one shuffle.
# --------------------------------------------------------------------------


@register(
    "events_ttl_cache_curve",
    """
WITH acc AS (
  SELECT user_id,
         coalesce(CAST(nullif(regexp_extract(props, '[0-9]+'), '') AS BIGINT) % 16, -1)
           AS k,
         CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
         event_id
  FROM events
), gaps AS (
  SELECT user_id, k, t_s,
         t_s - lag(t_s) OVER (PARTITION BY user_id, k ORDER BY t_s, event_id)
           AS gap_s
  FROM acc
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_acc,
         CAST(count(gap_s) AS BIGINT) AS n_repeat
  FROM gaps
), curve AS (
  SELECT CAST(t AS BIGINT) AS ttl_s
  FROM (VALUES (60), (300), (1800), (7200), (86400)) v(t)
), sel AS (
  SELECT c.ttl_s,
         CAST(sum(CASE WHEN g.gap_s IS NOT NULL AND g.gap_s <= c.ttl_s
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         CAST(coalesce(sum(CASE WHEN g.gap_s IS NOT NULL AND g.gap_s <= c.ttl_s
                                THEN g.gap_s END), 0) AS BIGINT) AS sum_served_age_s
  FROM curve c, gaps g
  GROUP BY c.ttl_s
)
SELECT s.ttl_s, t.n_acc AS n_accesses, t.n_repeat AS n_repeat_accesses,
       s.n_hits,
       CAST(s.n_hits * 1000000 // t.n_acc AS BIGINT) AS hit_ratio_ppm,
       CAST(CASE WHEN s.n_hits > 0 THEN s.sum_served_age_s // s.n_hits
                 ELSE 0 END AS BIGINT) AS mean_served_age_s
FROM sel s, tot t
ORDER BY s.ttl_s
""",
)
def events_ttl_cache_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL cache policy curve for T ∈ {60..86400} s (B319): per-key lag
    gaps, hit ratio + mean served age per TTL — the freshness/hit-rate
    trade a cache-sizing decision reads jointly."""
    ev = read_table(spark, sf_dir, "events")
    acc = ev.select(
        "user_id",
        F.expr(
            "coalesce(cast(nullif(regexp_extract(props, '[0-9]+', 0), '') as bigint) % 16, -1)"
        ).alias("k"),
        F.expr("cast(cast(ts as double) as bigint)").alias("t_s"),
        "event_id",
    )
    gaps = acc.select(
        (
            F.col("t_s")
            - F.lag("t_s").over(Window.partitionBy("user_id", "k").orderBy("t_s", "event_id"))
        ).alias("gap_s")
    )
    # ONE pass over the gap table (r14 opt): the TTL grid is literal, so
    # the per-TTL hit counts/served ages are 10 conditional aggregates of
    # a single global agg (with the access totals folded in), unpivoted
    # to the 5 curve rows by an in-row explode — the previous form
    # crossJoined the grid into the gap rows (5× fan-out, one groupBy)
    # AND re-ran the lag window for the totals branch.
    ttls = [60, 300, 1800, 7200, 86400]
    aggs = [
        F.count("*").cast("long").alias("n_acc"),
        F.count("gap_s").cast("long").alias("n_repeat"),
    ]
    for t in ttls:
        hitc = F.col("gap_s").isNotNull() & (F.col("gap_s") <= F.lit(t))
        aggs.append(F.sum(F.when(hitc, 1).otherwise(0)).cast("long").alias(f"h{t}"))
        aggs.append(
            F.coalesce(F.sum(F.when(hitc, F.col("gap_s"))), F.lit(0))
            .cast("long")
            .alias(f"a{t}")
        )
    one = gaps.agg(*aggs)
    rows = ", ".join(
        f"struct(cast({t} as bigint) as ttl_s, h{t} as n_hits, a{t} as sum_served_age_s)"
        for t in ttls
    )
    sel = one.select(
        "n_acc", "n_repeat", F.explode(F.expr(f"array({rows})")).alias("r")
    ).select("n_acc", "n_repeat", "r.ttl_s", "r.n_hits", "r.sum_served_age_s")
    return (
        sel.select(
            "ttl_s",
            F.col("n_acc").alias("n_accesses"),
            F.col("n_repeat").alias("n_repeat_accesses"),
            "n_hits",
            F.expr("n_hits * 1000000 div n_acc").cast("long").alias("hit_ratio_ppm"),
            F.expr("case when n_hits > 0 then sum_served_age_s div n_hits else 0 end")
            .cast("long")
            .alias("mean_served_age_s"),
        )
        .orderBy("ttl_s")
    )


# --------------------------------------------------------------------------
# B320: difference-in-differences — the panel-data causal estimator.
#
# Completes the causal-inference shelf (uplift B270, CUPED B101, QTE
# B304): DiD removes BOTH the stable group difference and the common time
# trend by double-differencing the 2×2 (group × period) cell means. Group
# = salted md5 user hash (the SRM-audit discipline — deterministic,
# balanced); period = event-time halves (the capture-recapture midpoint
# discipline, whole-second truncation). Each cell mean is floored ONCE to
# micro-cents; the three differences are then exact integer subtractions
# of already-floored means — the sign-safe order of operations (floor
# before subtract), documented rather than floored-after-subtraction
# where the two engines' negative-division conventions diverge. The
# parallel-trends caveat is carried as the pre-period gap column.
#
# Scale: one groupBy over events into 4 cells; everything after is a
# broadcast of a 4-row table.
# --------------------------------------------------------------------------


@register(
    "events_diff_in_diff",
    """
WITH span AS (
  SELECT CAST(min(floor(epoch(ts))) AS BIGINT) AS t0,
         CAST(max(floor(epoch(ts))) AS BIGINT) AS t1
  FROM events
), tagged AS (
  SELECT CAST(('0x' || substr(md5('did:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS grp,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) * 2 < s.t0 + s.t1
              THEN 0 ELSE 1 END AS period,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events, span s
), cells AS (
  SELECT grp, period, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS sum_cents,
         CAST(sum(cents) * 1000000 // count(*) AS BIGINT) AS mean_micro
  FROM tagged GROUP BY grp, period
), wide AS (
  SELECT max(CASE WHEN grp = 0 AND period = 0 THEN n END) AS n_c_pre,
         max(CASE WHEN grp = 0 AND period = 1 THEN n END) AS n_c_post,
         max(CASE WHEN grp = 1 AND period = 0 THEN n END) AS n_t_pre,
         max(CASE WHEN grp = 1 AND period = 1 THEN n END) AS n_t_post,
         max(CASE WHEN grp = 0 AND period = 0 THEN mean_micro END) AS mean_c_pre,
         max(CASE WHEN grp = 0 AND period = 1 THEN mean_micro END) AS mean_c_post,
         max(CASE WHEN grp = 1 AND period = 0 THEN mean_micro END) AS mean_t_pre,
         max(CASE WHEN grp = 1 AND period = 1 THEN mean_micro END) AS mean_t_post
  FROM cells
)
SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
       mean_c_pre, mean_c_post, mean_t_pre, mean_t_post,
       CAST(mean_t_pre - mean_c_pre AS BIGINT) AS pre_gap_micro,
       CAST((mean_t_post - mean_t_pre) - (mean_c_post - mean_c_pre) AS BIGINT)
         AS did_micro
FROM wide
""",
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 difference-in-differences over hashed arms and time halves
    (B320): floored cell means in micro-cents, exact double difference,
    pre-period gap as the parallel-trends caveat."""
    ev = read_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.expr("cast(floor(cast(ts as double)) as bigint)")).alias("t0"),
        F.max(F.expr("cast(floor(cast(ts as double)) as bigint)")).alias("t1"),
    )
    tagged = ev.crossJoin(F.broadcast(span)).select(
        F.expr(
            "cast(conv(substring(md5(concat('did:', cast(user_id as string))), 1, 8),"
            " 16, 10) as bigint) % 2"
        ).alias("grp"),
        F.expr(
            "case when cast(floor(cast(ts as double)) as bigint) * 2 < t0 + t1"
            " then 0 else 1 end"
        ).alias("period"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cells = tagged.groupBy("grp", "period").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.expr("cast(sum(cents) * 1000000 div count(*) as bigint)").alias("mean_micro"),
    )

    def cell(g, p, col):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col(col))
        )

    wide = cells.agg(
        cell(0, 0, "n").alias("n_c_pre"),
        cell(0, 1, "n").alias("n_c_post"),
        cell(1, 0, "n").alias("n_t_pre"),
        cell(1, 1, "n").alias("n_t_post"),
        cell(0, 0, "mean_micro").alias("mean_c_pre"),
        cell(0, 1, "mean_micro").alias("mean_c_post"),
        cell(1, 0, "mean_micro").alias("mean_t_pre"),
        cell(1, 1, "mean_micro").alias("mean_t_post"),
    )
    return wide.select(
        "n_c_pre",
        "n_c_post",
        "n_t_pre",
        "n_t_post",
        "mean_c_pre",
        "mean_c_post",
        "mean_t_pre",
        "mean_t_post",
        (F.col("mean_t_pre") - F.col("mean_c_pre")).cast("long").alias("pre_gap_micro"),
        (
            (F.col("mean_t_post") - F.col("mean_t_pre"))
            - (F.col("mean_c_post") - F.col("mean_c_pre"))
        )
        .cast("long")
        .alias("did_micro"),
    )


# --------------------------------------------------------------------------
# B321: Kaplan-Meier retention curve with right-censoring (survival).
#
# The retention question product teams actually ask — "what fraction of
# users survive to day t?" — needs right-censoring: users still active
# near the horizon end have not churned, they are censored, and naive
# "fraction with lifetime ≥ t" is biased low. Kaplan-Meier's product-
# limit estimator S(t) = Π_{death times ≤ t} (1 − d_i/n_i) handles this,
# but it is an inherently SEQUENTIAL product. The engine discipline:
# the LIFE TABLE (distinct lifetime days × at-risk/death/censor counts)
# is bounded by the HORIZON (≤ a few thousand days), not by the data, so
# the distributed work is the per-user lifetime aggregate + the life-
# table aggregate; the floored micro product then runs over the bounded
# table (driver-side python on collected ≤horizon rows — the Procrustes
# bounded-state precedent; the oracle runs the identical recurrence as a
# recursive CTE). Per-step floor: s_k = s_{k−1}·(n_k−d_k) div n_k,
# identical on both engines; hazard d·1e6 div n rides along.
#
# Scale: two keyed aggregates (user, then lifetime-day) shrink 100 TB of
# events to ≤ horizon-days rows before anything sequential happens.
# --------------------------------------------------------------------------

_KM_CENSOR_WINDOW_DAYS = 14


@register(
    "events_kaplan_meier_retention",
    f"""
WITH RECURSIVE per_user AS (
  SELECT user_id,
         CAST(min(floor(epoch(ts) / 86400)) AS BIGINT) AS first_d,
         CAST(max(floor(epoch(ts) / 86400)) AS BIGINT) AS last_d
  FROM events GROUP BY user_id
), horizon AS (
  SELECT CAST(max(last_d) AS BIGINT) AS h_end FROM per_user
), life AS (
  SELECT p.last_d - p.first_d AS lt,
         CASE WHEN h.h_end - p.last_d < {_KM_CENSOR_WINDOW_DAYS} THEN 0 ELSE 1 END
           AS is_event
  FROM per_user p, horizon h
), lt_table AS (
  SELECT lt, CAST(sum(is_event) AS BIGINT) AS d,
         CAST(sum(1 - is_event) AS BIGINT) AS c,
         CAST(sum(count(*)) OVER (ORDER BY lt DESC) AS BIGINT) AS n_at_risk,
         CAST(row_number() OVER (ORDER BY lt) AS BIGINT) AS rn
  FROM life GROUP BY lt
), km AS (
  SELECT rn, lt, d, c, n_at_risk,
         CAST(1000000 * (n_at_risk - d) // n_at_risk AS BIGINT) AS s_micro
  FROM lt_table WHERE rn = 1
  UNION ALL
  SELECT t.rn, t.lt, t.d, t.c, t.n_at_risk,
         CAST(k.s_micro * (t.n_at_risk - t.d) // t.n_at_risk AS BIGINT)
  FROM lt_table t JOIN km k ON t.rn = k.rn + 1
)
SELECT lt AS lifetime_days, n_at_risk, d AS n_deaths, c AS n_censored,
       CAST(d * 1000000 // n_at_risk AS BIGINT) AS hazard_micro,
       s_micro AS survival_micro
FROM km
ORDER BY lifetime_days
""",
)
def events_kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-limit retention curve with a 14-day censoring window
    (B321, _KM_CENSOR_WINDOW_DAYS): distributed life-table aggregation,
    bounded sequential floored product, hazard alongside."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.expr("cast(floor(cast(ts as double)/86400) as bigint)")).alias("first_d"),
        F.max(F.expr("cast(floor(cast(ts as double)/86400) as bigint)")).alias("last_d"),
    )
    horizon = per_user.agg(F.max("last_d").alias("h_end"))
    life = per_user.crossJoin(F.broadcast(horizon)).select(
        (F.col("last_d") - F.col("first_d")).alias("lt"),
        F.when(
            F.col("h_end") - F.col("last_d") < _KM_CENSOR_WINDOW_DAYS, 0
        )
        .otherwise(1)
        .alias("is_event"),
    )
    lt_table = (
        life.groupBy("lt")
        .agg(
            F.sum("is_event").cast("long").alias("d"),
            F.sum(F.lit(1) - F.col("is_event")).cast("long").alias("c"),
            F.count("*").cast("long").alias("w"),
        )
        .withColumn(
            "n_at_risk",
            F.sum("w")
            .over(Window.orderBy(F.col("lt").desc()).rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    )
    # The life table is bounded by the horizon in DAYS (not by |events|):
    # the sequential floored product runs driver-side over those ≤few-
    # thousand rows (the bounded-state discipline; oracle = recursive CTE).
    rows = sorted(
        lt_table.select("lt", "d", "c", "n_at_risk").collect(), key=lambda r: r["lt"]
    )
    out = []
    s = 1_000_000
    for r in rows:
        s = s * (r["n_at_risk"] - r["d"]) // r["n_at_risk"]
        out.append(
            (
                r["lt"],
                r["n_at_risk"],
                r["d"],
                r["c"],
                r["d"] * 1_000_000 // r["n_at_risk"],
                s,
            )
        )
    return spark.createDataFrame(
        out,
        "lifetime_days long, n_at_risk long, n_deaths long, n_censored long,"
        " hazard_micro long, survival_micro long",
    ).orderBy("lifetime_days")


# --------------------------------------------------------------------------
# B322: Wald SPRT — sequential testing at daily monitoring cadence.
#
# Completes the experimentation shelf's third testing regime: fixed-n
# (B294 Mann-Whitney), group-sequential (B271 O'Brien-Fleming), and now
# the fully-sequential SPRT, the optimal (Wald-Wolfowitz) test for a
# simple-vs-simple rate hypothesis. Float-free: the log-likelihood-ratio
# increments for success/failure are FIXED micro literals (ln(p1/p0),
# ln(q1/q0) for p0=0.40 vs p1=0.45, computed once, same literal both
# engines), so the cumulative LLR is exact integer multiply-add —
# no per-step floor at all. Monitoring is at DAILY cadence: events fold
# to per-day (trials, successes) counts first, which (a) matches how
# experiments are actually monitored and (b) keeps the cumulative walk
# on an aggregated, horizon-bounded table (the unpartitioned-window
# discipline). Boundaries ±ln((1−β)/α) at α=β=0.05.
#
# Scale: one groupBy day, then windows over ≤horizon-days rows.
# --------------------------------------------------------------------------

_SPRT_LS_MICRO = 117783  # round(ln(0.45/0.40) * 1e6)
_SPRT_LF_MICRO = -87011  # round(ln(0.55/0.60) * 1e6)
_SPRT_BOUND_MICRO = 2944439  # round(ln(0.95/0.05) * 1e6)


@register(
    "events_sprt_daily",
    f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000
                       THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM events GROUP BY 1
), walk AS (
  SELECT d, n, s,
         CAST(sum(s) OVER (ORDER BY d) AS BIGINT) AS cs,
         CAST(sum(n - s) OVER (ORDER BY d) AS BIGINT) AS cf
  FROM daily
), llr AS (
  SELECT d, n, s, cs, cf,
         CAST(cs * {_SPRT_LS_MICRO} + cf * ({_SPRT_LF_MICRO}) AS BIGINT)
           AS llr_micro
  FROM walk
)
SELECT d AS day_epoch_days, n AS n_trials, s AS n_successes,
       llr_micro,
       CAST(CASE WHEN llr_micro >= {_SPRT_BOUND_MICRO} THEN 1
                 WHEN llr_micro <= -{_SPRT_BOUND_MICRO} THEN -1
                 ELSE 0 END AS BIGINT) AS boundary_state,
       CAST(CASE WHEN min(CASE WHEN abs(llr_micro) >= {_SPRT_BOUND_MICRO}
                               THEN d END) OVER () = d
                 THEN 1 ELSE 0 END AS BIGINT) AS is_first_decision
FROM llr
ORDER BY day_epoch_days
""",
)
def events_sprt_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT walk at daily cadence for p0=0.40 vs p1=0.45 (B322):
    exact integer LLR from micro-literal increments, ±ln(19) boundaries,
    first decision day flagged."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("cast(floor(cast(ts as double)/86400) as bigint)").alias("d")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.round(F.col("value") * 100).cast("long") >= 5000, 1).otherwise(0))
        .cast("long")
        .alias("s"),
    )
    return sprt_over_daily(daily)


def sprt_over_daily(daily: DataFrame) -> DataFrame:
    """B322's SPRT walk from a (d, n, s) daily-count table — identical
    arithmetic batch and from streamed state (shared with B341's sink)."""
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    walk = daily.select(
        "d",
        "n",
        "s",
        F.sum("s").over(w).cast("long").alias("cs"),
        F.sum(F.col("n") - F.col("s")).over(w).cast("long").alias("cf"),
    )
    llr = walk.withColumn(
        "llr_micro",
        (
            F.col("cs") * F.lit(_SPRT_LS_MICRO) + F.col("cf") * F.lit(_SPRT_LF_MICRO)
        ).cast("long"),
    )
    wall = Window.partitionBy()
    return llr.select(
        F.col("d").alias("day_epoch_days"),
        F.col("n").alias("n_trials"),
        F.col("s").alias("n_successes"),
        "llr_micro",
        F.when(F.col("llr_micro") >= _SPRT_BOUND_MICRO, 1)
        .when(F.col("llr_micro") <= -_SPRT_BOUND_MICRO, -1)
        .otherwise(0)
        .cast("long")
        .alias("boundary_state"),
        F.when(
            F.min(
                F.when(F.abs(F.col("llr_micro")) >= _SPRT_BOUND_MICRO, F.col("d"))
            ).over(wall)
            == F.col("d"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_first_decision"),
    ).orderBy("day_epoch_days")


# --------------------------------------------------------------------------
# B323: empirical-Bayes rate shrinkage (beta-binomial, method of moments).
#
# The standard cure for small-segment rate estimates (CTR smoothing,
# per-source quality rates): shrink each segment's raw rate toward the
# global rate with a strength the DATA chooses. Method of moments in
# exact integer micro-units: between-segment variance (count-weighted,
# 128-bit), minus the average binomial sampling noise at the mean
# segment size (the documented MoM approximation), floored at 1 → prior
# pseudo-count k = r̄(1−r̄)/τ²; shrunk_i = (s_i + k·r̄)/(n_i + k)
# evaluated as (s_i·1e6 + k·r̄_micro) div (n_i + k) — one floor, all
# operands non-negative. The pytest laws: every shrunk rate lies between
# its raw rate and the global rate (within floor slack), and the shrink
# weight n/(n+k) is monotone in n.
#
# Scale: one groupBy over events; everything downstream operates on the
# bounded segment table against broadcast 1-row globals.
# --------------------------------------------------------------------------


@register(
    "events_eb_rate_shrinkage",
    """
WITH seg AS (
  SELECT event_type,
         CAST(date_part('dow', ts) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000
                       THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
), g AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
         CAST(count(*) AS BIGINT) AS m,
         CAST(sum(s) * 1000000 // sum(n) AS BIGINT) AS rbar
  FROM seg
), v AS (
  SELECT g.nn, g.ss, g.m, g.rbar,
         CAST(sum(seg.n * (CAST(seg.s * 1000000 // seg.n - g.rbar AS HUGEINT))
                        * (seg.s * 1000000 // seg.n - g.rbar)) // g.nn AS BIGINT)
           AS var_micro2
  FROM seg, g
  GROUP BY g.nn, g.ss, g.m, g.rbar
), k AS (
  SELECT nn, ss, m, rbar, var_micro2,
         CAST(rbar * (1000000 - rbar)
              // greatest(var_micro2
                          - rbar * (1000000 - rbar) // (nn // m), 1) AS BIGINT)
           AS prior_k
  FROM v
)
SELECT seg.event_type, seg.dow, seg.n, seg.s,
       CAST(seg.s * 1000000 // seg.n AS BIGINT) AS raw_micro,
       CAST((seg.s * 1000000 + k.prior_k * k.rbar) // (seg.n + k.prior_k)
            AS BIGINT) AS shrunk_micro,
       CAST(seg.n * 1000000 // (seg.n + k.prior_k) AS BIGINT) AS shrink_weight_ppm,
       k.rbar AS global_micro, k.prior_k
FROM seg, k
ORDER BY seg.event_type, seg.dow
""",
)
def events_eb_rate_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of (event_type × dow) high-value rates
    toward the global rate (B323): integer MoM prior strength, one-floor
    shrunk rates, shrink weights."""
    ev = read_table(spark, sf_dir, "events")
    return eb_shrinkage_over_counts(segment_counts(ev))


def eb_shrinkage_over_counts(seg: DataFrame) -> DataFrame:
    """EB shrinkage over a (event_type, dow, n, s) table — identical
    arithmetic batch and from streamed state (shared with B312's state)."""
    dec = "decimal(38,0)"
    g = seg.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
        F.count("*").cast("long").alias("m"),
        F.expr("cast(sum(s) * 1000000 div sum(n) as bigint)").alias("rbar"),
    )
    v = (
        seg.crossJoin(F.broadcast(g))
        .select(
            "nn",
            "ss",
            "m",
            "rbar",
            F.expr(
                f"n * cast(s * 1000000 div n - rbar as {dec})"
                f" * cast(s * 1000000 div n - rbar as {dec})"
            ).alias("term"),
        )
        .groupBy("nn", "ss", "m", "rbar")
        .agg(F.expr("cast(sum(term) div max(nn) as bigint)").alias("var_micro2"))
    )
    k = v.select(
        "nn",
        "m",
        "rbar",
        "var_micro2",
        F.expr(
            "cast(rbar * (1000000 - rbar)"
            " div greatest(var_micro2 - rbar * (1000000 - rbar) div (nn div m), 1)"
            " as bigint)"
        ).alias("prior_k"),
    )
    return (
        seg.crossJoin(F.broadcast(k))
        .select(
            "event_type",
            "dow",
            "n",
            "s",
            F.expr("cast(s * 1000000 div n as bigint)").alias("raw_micro"),
            F.expr(
                "cast((s * 1000000 + prior_k * rbar) div (n + prior_k) as bigint)"
            ).alias("shrunk_micro"),
            F.expr("cast(n * 1000000 div (n + prior_k) as bigint)").alias(
                "shrink_weight_ppm"
            ),
            F.col("rbar").alias("global_micro"),
            "prior_k",
        )
        .orderBy("event_type", "dow")
    )


# --------------------------------------------------------------------------
# B327: additive seasonal decomposition (trend / day-of-week / residual).
#
# The classical-decomposition core of every ops dashboard, float-free:
# trend = centered 7-day moving SUM (kept ×7-scaled so no division at
# all — det7 = 7·y − sum7 is exact), day-of-week seasonal = the exact
# LOW MEDIAN of each dow's detrended values (rank threshold over the
# bounded daily table, the deterministic-median discipline), residual =
# det7 − seasonal7. Edge days without a full 7-day window carry trend
# NULL→(-1 flag) and are excluded from the seasonal medians — the
# documented classical-decomposition edge rule. Anomaly gates (B108
# hour-of-day) subtract a seasonal BASELINE; this op produces the full
# decomposition those baselines come from.
#
# Scale: one groupBy day; every window runs over the horizon-bounded
# daily table.
# --------------------------------------------------------------------------


@register(
    "events_seasonal_decomposition",
    """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), tr AS (
  SELECT d, y, CAST(d % 7 AS BIGINT) AS dow,
         CASE WHEN count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
              THEN CAST(sum(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                        AS BIGINT) END AS sum7
  FROM daily
), det AS (
  SELECT d, y, dow, sum7,
         CASE WHEN sum7 IS NOT NULL THEN 7 * y - sum7 END AS det7
  FROM tr
), med AS (
  SELECT dow, min(det7) AS seasonal7 FROM (
    SELECT dow, det7,
           row_number() OVER (PARTITION BY dow ORDER BY det7, d) AS rk,
           count(*) OVER (PARTITION BY dow) AS nd
    FROM det WHERE det7 IS NOT NULL
  ) WHERE rk * 2 >= nd
  GROUP BY dow
)
SELECT det.d AS day_epoch_days, det.y AS n_events, det.dow,
       coalesce(det.sum7, -1) AS sum7,
       CAST(CASE WHEN det.sum7 IS NOT NULL THEN det.det7 ELSE -9999999 END AS BIGINT)
         AS det7,
       CAST(m.seasonal7 AS BIGINT) AS seasonal7,
       CAST(CASE WHEN det.sum7 IS NOT NULL THEN det.det7 - m.seasonal7
                 ELSE -9999999 END AS BIGINT) AS resid7,
       CAST(CASE WHEN det.sum7 IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_edge
FROM det JOIN med m ON m.dow = det.dow
ORDER BY day_epoch_days
""",
)
def events_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily event counts (B327):
    ×7-scaled centered trend, exact low-median dow seasonal, residual;
    edge days flagged, all integers."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("cast(floor(cast(ts as double)/86400) as bigint)").alias("d")
    ).agg(F.count("*").cast("long").alias("y"))
    return seasonal_over_daily(daily)


def seasonal_over_daily(daily: DataFrame) -> DataFrame:
    """B327's decomposition from a (d, y) daily-count table — identical
    arithmetic batch and from streamed state (the sum-mergeable daily
    counts are the state; ``stream_ops.stream_daily_counts``, B341)."""
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "y",
        (F.col("d") % 7).cast("long").alias("dow"),
        F.when(F.count("*").over(w7) == 7, F.sum("y").over(w7).cast("long")).alias("sum7"),
    )
    det = tr.withColumn(
        "det7", F.when(F.col("sum7").isNotNull(), 7 * F.col("y") - F.col("sum7"))
    )
    wd = Window.partitionBy("dow").orderBy("det7", "d")
    wn = Window.partitionBy("dow")
    med = (
        det.filter(F.col("det7").isNotNull())
        .select(
            "dow",
            "det7",
            F.row_number().over(wd).alias("rk"),
            F.count("*").over(wn).alias("nd"),
        )
        .filter(F.col("rk") * 2 >= F.col("nd"))
        .groupBy("dow")
        .agg(F.min("det7").cast("long").alias("seasonal7"))
    )
    return (
        det.join(F.broadcast(med), "dow")
        .select(
            F.col("d").alias("day_epoch_days"),
            F.col("y").alias("n_events"),
            "dow",
            F.coalesce(F.col("sum7"), F.lit(-1)).cast("long").alias("sum7"),
            F.when(F.col("sum7").isNotNull(), F.col("det7"))
            .otherwise(-9999999)
            .cast("long")
            .alias("det7"),
            F.col("seasonal7").cast("long"),
            F.when(F.col("sum7").isNotNull(), F.col("det7") - F.col("seasonal7"))
            .otherwise(-9999999)
            .cast("long")
            .alias("resid7"),
            F.when(F.col("sum7").isNull(), 1).otherwise(0).cast("long").alias("is_edge"),
        )
        .orderBy("day_epoch_days")
    )


# --------------------------------------------------------------------------
# B328: Wald-Wolfowitz runs test on the decomposition residuals.
#
# The adequacy audit FOR B327: if the trend+seasonal model captured the
# structure, the residual SIGNS should be patternless — long same-sign
# runs mean leftover trend, alternation means over-differencing. The
# runs test is exactly distribution-free and integer-exact: R = 1 + sign
# changes along the day-ordered residuals (zeros dropped, documented),
# E[R] = 1 + 2n₁n₂/n and Var[R] = 2n₁n₂(2n₁n₂−n)/(n²(n−1)) evaluated in
# micro/128-bit, z² via one floor, Chebyshev p ≤ 1/z² (the B312
# discipline — distribution-free end to end). Composition: the Spark
# side CALLS the registered B327 query and audits its output — operators
# as building blocks, not copy-paste.
#
# Scale: everything runs over B327's horizon-bounded daily output.
# --------------------------------------------------------------------------


@register(
    "events_residual_runs_test",
    """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), tr AS (
  SELECT d, y, CAST(d % 7 AS BIGINT) AS dow,
         CASE WHEN count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
              THEN CAST(sum(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                        AS BIGINT) END AS sum7
  FROM daily
), det AS (
  SELECT d, dow, CASE WHEN sum7 IS NOT NULL THEN 7 * y - sum7 END AS det7
  FROM tr
), med AS (
  SELECT dow, min(det7) AS seasonal7 FROM (
    SELECT dow, det7,
           row_number() OVER (PARTITION BY dow ORDER BY det7, d) AS rk,
           count(*) OVER (PARTITION BY dow) AS nd
    FROM det WHERE det7 IS NOT NULL
  ) WHERE rk * 2 >= nd
  GROUP BY dow
), resid AS (
  SELECT det.d, det.det7 - m.seasonal7 AS r
  FROM det JOIN med m ON m.dow = det.dow
  WHERE det.det7 IS NOT NULL AND det.det7 - m.seasonal7 <> 0
), signs AS (
  SELECT d, CASE WHEN r > 0 THEN 1 ELSE 0 END AS sg,
         lag(CASE WHEN r > 0 THEN 1 ELSE 0 END) OVER (ORDER BY d) AS psg
  FROM resid
), agg AS (
  SELECT CAST(sum(sg) AS BIGINT) AS n1,
         CAST(sum(1 - sg) AS BIGINT) AS n2,
         CAST(1 + sum(CASE WHEN psg IS NOT NULL AND sg <> psg THEN 1 ELSE 0 END)
              AS BIGINT) AS runs
  FROM signs
)
SELECT n1 AS n_positive, n2 AS n_negative, runs AS n_runs,
       CAST(1000000 + 2 * n1 * n2 * 1000000 // (n1 + n2) AS BIGINT)
         AS expected_runs_micro,
       CAST(2 * CAST(n1 AS HUGEINT) * n2 * (2 * n1 * n2 - n1 - n2) * 1000000000000
            // (CAST(n1 + n2 AS HUGEINT) * (n1 + n2) * (n1 + n2 - 1)) AS BIGINT)
         AS var_runs_micro2,
       CAST(CAST(runs * 1000000 - (1000000 + 2 * n1 * n2 * 1000000 // (n1 + n2))
                 AS HUGEINT)
            * (runs * 1000000 - (1000000 + 2 * n1 * n2 * 1000000 // (n1 + n2)))
            // greatest(2 * CAST(n1 AS HUGEINT) * n2 * (2 * n1 * n2 - n1 - n2)
                        * 1000000000000
                        // (CAST(n1 + n2 AS HUGEINT) * (n1 + n2) * (n1 + n2 - 1)), 1)
            AS BIGINT) AS z2_micro,
       CAST(CASE WHEN CAST(runs * 1000000
                           - (1000000 + 2 * n1 * n2 * 1000000 // (n1 + n2))
                           AS HUGEINT)
                      * (runs * 1000000
                         - (1000000 + 2 * n1 * n2 * 1000000 // (n1 + n2)))
                      // greatest(2 * CAST(n1 AS HUGEINT) * n2
                                  * (2 * n1 * n2 - n1 - n2) * 1000000000000
                                  // (CAST(n1 + n2 AS HUGEINT) * (n1 + n2)
                                      * (n1 + n2 - 1)), 1)
                      > 20000000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_nonrandom
FROM agg
""",
)
def events_residual_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs test for randomness of B327's residual signs (B328): exact
    R/E/Var in micro + 128-bit, Chebyshev gate at 5% (z² > 20)."""
    return runs_over_decomposition(events_seasonal_decomposition(spark, sf_dir))


def runs_over_decomposition(decomp: DataFrame) -> DataFrame:
    """B328's runs test from a B327-shaped decomposition frame — identical
    arithmetic batch and from streamed state."""
    dec = "decimal(38,0)"
    resid = decomp.filter((F.col("is_edge") == 0) & (F.col("resid7") != 0)).select(
        "day_epoch_days", F.col("resid7")
    )
    signs = resid.select(
        F.when(F.col("resid7") > 0, 1).otherwise(0).alias("sg"),
        F.lag(F.when(F.col("resid7") > 0, 1).otherwise(0))
        .over(Window.orderBy("day_epoch_days"))
        .alias("psg"),
    )
    agg = signs.agg(
        F.sum("sg").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("sg")).cast("long").alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(F.col("psg").isNotNull() & (F.col("sg") != F.col("psg")), 1).otherwise(
                    0
                )
            )
        )
        .cast("long")
        .alias("runs"),
    )
    e_micro = "(1000000 + 2 * n1 * n2 * 1000000 div (n1 + n2))"
    var_micro2 = (
        f"(2 * cast(n1 as {dec}) * n2 * (2 * n1 * n2 - n1 - n2) * 1000000000000"
        f" div (cast(n1 + n2 as {dec}) * (n1 + n2) * (n1 + n2 - 1)))"
    )
    z2 = (
        f"(cast(runs * 1000000 - {e_micro} as {dec})"
        f" * (runs * 1000000 - {e_micro})"
        f" div greatest({var_micro2}, 1))"
    )
    return agg.select(
        F.col("n1").alias("n_positive"),
        F.col("n2").alias("n_negative"),
        F.col("runs").alias("n_runs"),
        F.expr(f"cast({e_micro} as long)").alias("expected_runs_micro"),
        F.expr(f"cast({var_micro2} as long)").alias("var_runs_micro2"),
        F.expr(f"cast({z2} as long)").alias("z2_micro"),
        F.expr(f"cast(case when {z2} > 20000000 then 1 else 0 end as long)").alias(
            "is_nonrandom"
        ),
    )


# --------------------------------------------------------------------------
# B329: explore-then-greedy bandit replay with hindsight regret.
#
# The offline policy-VALUE estimators (IPS/SNIPS B272) price a fixed
# policy; this op REPLAYS a learning policy against the logged daily
# per-arm outcomes (the Li et al. replay method): arms = event types,
# reward = the day's high-value rate; days 1..5 explore each arm once,
# then strict greedy on the accumulated rate (ties → lowest arm index).
# Emitted per day: the chosen arm, its realized rate, and cumulative
# regret vs the best FIXED arm in hindsight — the curve that shows
# greedy lock-in when exploration was too short. Sequential by nature:
# the walk runs over the horizon-bounded daily-arm table (wide recursive
# CTE carrying the 2×5 accumulator oracle-side; bounded driver loop
# batch-side — the B321 discipline). Arm indices are dense ranks of the
# alphabetical event types; absent (arm, day) cells replay as rate 0,
# documented.
#
# Scale: one groupBy (day × arm); nothing sequential touches raw rows.
# --------------------------------------------------------------------------

_BANDIT_K = 5


def _bandit_oracle_sql() -> str:
    k = _BANDIT_K
    armcols = ", ".join(
        f"coalesce(max(CASE WHEN idx = {i} THEN n END), 0) AS n{i},"
        f" coalesce(max(CASE WHEN idx = {i} THEN s END), 0) AS s{i}"
        for i in range(k)
    )
    zero_acc = ", ".join(f"CAST(0 AS BIGINT) AS cs{i}, CAST(0 AS BIGINT) AS cn{i}" for i in range(k))
    rate = lambda i: f"(CASE WHEN r.cn{i} > 0 THEN r.cs{i} * 1000000 // r.cn{i} ELSE 0 END)"
    # greedy argmax with lowest-index tie-break, as a CASE cascade
    conds = []
    for i in range(k):
        ge = " AND ".join(f"{rate(i)} >= {rate(j)}" for j in range(k) if j != i)
        conds.append(f"WHEN {ge} THEN {i}")
    greedy = "CASE " + " ".join(conds) + " END"
    chosen = f"CASE WHEN w.t <= {k} THEN w.t - 1 ELSE {greedy} END"
    day_rate = lambda a, i: f"WHEN {a} = {i} THEN CASE WHEN w.n{i} > 0 THEN w.s{i} * 1000000 // w.n{i} ELSE 0 END"
    chosen_rate = "CASE " + " ".join(day_rate("ch.a", i) for i in range(k)) + " END"
    acc_next = ", ".join(
        f"r.cs{i} + CASE WHEN ch.a = {i} THEN w.s{i} ELSE 0 END,"
        f" r.cn{i} + CASE WHEN ch.a = {i} THEN w.n{i} ELSE 0 END"
        for i in range(k)
    )
    best_day_rate = "CASE " + " ".join(day_rate("b.best", i) for i in range(k)) + " END"
    return f"""
WITH RECURSIVE arms AS (
  SELECT event_type, CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS idx
  FROM (SELECT DISTINCT event_type FROM events)
), da AS (
  SELECT CAST(floor(epoch(e.ts) / 86400) AS BIGINT) AS d, a.idx,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN CAST(round(e.value * 100) AS BIGINT) >= 5000
                       THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM events e JOIN arms a ON a.event_type = e.event_type
  GROUP BY 1, 2
), wide AS (
  SELECT d, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t, {armcols}
  FROM da GROUP BY d
), best AS (
  SELECT CAST(idx AS BIGINT) AS best FROM (
    SELECT idx, sum(s) * 1000000 // sum(n) AS rate
    FROM da GROUP BY idx
    ORDER BY rate DESC, idx LIMIT 1
  )
), rec AS (
  SELECT CAST(0 AS BIGINT) AS t, {zero_acc},
         CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS chosen_rate,
         CAST(0 AS BIGINT) AS regret, CAST(0 AS BIGINT) AS cum_regret
  UNION ALL
  SELECT w.t, {acc_next}, ch.a, CAST({chosen_rate} AS BIGINT),
         CAST({best_day_rate} - {chosen_rate} AS BIGINT),
         CAST(r.cum_regret + {best_day_rate} - {chosen_rate} AS BIGINT)
  FROM rec r
  JOIN wide w ON w.t = r.t + 1
  CROSS JOIN best b
  CROSS JOIN LATERAL (SELECT CAST({chosen} AS BIGINT) AS a) ch
)
SELECT r.t AS day_idx, w.d AS day_epoch_days, r.a AS chosen_arm,
       r.chosen_rate AS chosen_rate_micro, b.best AS best_fixed_arm,
       r.regret AS regret_micro, r.cum_regret AS cum_regret_micro
FROM rec r JOIN wide w ON w.t = r.t, best b
WHERE r.t >= 1
ORDER BY day_idx
"""


@register("events_bandit_replay_regret", _bandit_oracle_sql())
def events_bandit_replay_regret(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explore-first(5)-then-greedy bandit replayed over logged daily
    per-arm rates (B329): chosen arm, realized rate, cumulative regret vs
    the hindsight-best fixed arm. Bounded sequential walk (B321 style)."""
    k = _BANDIT_K
    ev = read_table(spark, sf_dir, "events")
    arms = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (F.dense_rank().over(Window.orderBy("event_type")) - 1)
            .cast("long")
            .alias("idx"),
        )
    )
    da = (
        ev.join(F.broadcast(arms), "event_type")
        .groupBy(
            F.expr("cast(floor(cast(ts as double)/86400) as bigint)").alias("d"), "idx"
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(F.round(F.col("value") * 100).cast("long") >= 5000, 1).otherwise(0)
            )
            .cast("long")
            .alias("s"),
        )
    )
    rows = da.collect()  # bounded: horizon days × arm count
    days: dict = {}
    for r in rows:
        days.setdefault(r["d"], {})[r["idx"]] = (r["n"], r["s"])
    totals = {i: [0, 0] for i in range(k)}
    for cells in days.values():
        for i, (n, s) in cells.items():
            totals[i][0] += n
            totals[i][1] += s
    best = max(
        range(k),
        key=lambda i: (
            totals[i][1] * 1_000_000 // totals[i][0] if totals[i][0] else 0,
            -i,
        ),
    )
    cs = [0] * k
    cn = [0] * k
    out = []
    cum = 0
    for t, d in enumerate(sorted(days), start=1):
        cells = days[d]
        if t <= k:
            a = t - 1
        else:
            rates = [cs[i] * 1_000_000 // cn[i] if cn[i] else 0 for i in range(k)]
            a = max(range(k), key=lambda i: (rates[i], -i))
        n_a, s_a = cells.get(a, (0, 0))
        chosen_rate = s_a * 1_000_000 // n_a if n_a else 0
        nb, sb = cells.get(best, (0, 0))
        best_rate = sb * 1_000_000 // nb if nb else 0
        cs[a] += s_a
        cn[a] += n_a
        cum += best_rate - chosen_rate
        out.append((t, d, a, chosen_rate, best, best_rate - chosen_rate, cum))
    return spark.createDataFrame(
        out,
        "day_idx long, day_epoch_days long, chosen_arm long, chosen_rate_micro long,"
        " best_fixed_arm long, regret_micro long, cum_regret_micro long",
    ).orderBy("day_idx")


# --------------------------------------------------------------------------
# B330: Markov stationary distribution — bounded power iteration.
#
# Completes the Markov shelf: B71 estimates the transition matrix, the
# absorption op prices terminal states; this op answers "where does the
# session process SPEND its time" — the stationary distribution, by 24
# rounds of power iteration in exact micro arithmetic (π'_j =
# Σ_i π_i·p_ij div 1e6, ONE floor per (round, state) — deterministic on
# both engines). The transition matrix is a k×k bounded aggregate
# (row-normalized counts of consecutive same-user event-type pairs);
# the walk carries k values through a wide recursive CTE oracle-side and
# a bounded driver loop batch-side (the B321/B329 discipline). The
# invariance gap |π − πP| per state is emitted as the convergence
# certificate — measured, not assumed.
#
# Scale: one window+groupBy produce the k² matrix; the iteration never
# touches raw rows.
# --------------------------------------------------------------------------

_MSD_K = 5
_MSD_ITERS = 24


def _msd_oracle_sql() -> str:
    k, iters = _MSD_K, _MSD_ITERS
    pcols = ", ".join(
        f"coalesce(max(CASE WHEN i = {i} AND j = {j} THEN p END), "
        f"{'1000000' if i == j else '0'}) AS p{i}{j}"
        for i in range(k)
        for j in range(k)
    )
    init = ", ".join(f"CAST({1_000_000 // k} AS BIGINT) AS v{i}" for i in range(k))
    step = ", ".join(
        "CAST(("
        + " + ".join(f"r.v{i} * m.p{i}{j}" for i in range(k))
        + ") // 1000000 AS BIGINT)"
        for j in range(k)
    )
    nxt = ", ".join(
        "CAST(("
        + " + ".join(f"r.v{i} * m.p{i}{j}" for i in range(k))
        + f") // 1000000 AS BIGINT) AS w{j}"
        for j in range(k)
    )
    unpivot = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS state, v{i} AS pi, w{i} AS pin FROM fin"
        for i in range(k)
    )
    return f"""
WITH RECURSIVE arms AS (
  SELECT event_type, CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS idx
  FROM (SELECT DISTINCT event_type FROM events)
), seq AS (
  SELECT a.idx AS i,
         lead(a.idx) OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS j
  FROM events e JOIN arms a ON a.event_type = e.event_type
), cnt AS (
  SELECT i, j, CAST(count(*) AS BIGINT) AS c FROM seq WHERE j IS NOT NULL GROUP BY i, j
), norm AS (
  SELECT i, j, CAST(c * 1000000 // sum(c) OVER (PARTITION BY i) AS BIGINT) AS p
  FROM cnt
), mat AS (
  SELECT {pcols} FROM norm
), rec AS (
  SELECT CAST(0 AS BIGINT) AS it, {init}
  UNION ALL
  SELECT r.it + 1, {step}
  FROM rec r CROSS JOIN mat m WHERE r.it < {iters}
), fin AS (
  SELECT r.*, {nxt}
  FROM rec r CROSS JOIN mat m WHERE r.it = {iters}
), pivoted AS (
  {unpivot}
)
SELECT p.state, a.event_type, p.pi AS stationary_micro,
       CAST(abs(p.pi - p.pin) AS BIGINT) AS invariance_gap_micro
FROM pivoted p JOIN arms a ON a.idx = p.state
ORDER BY p.state
"""


@register("events_markov_stationary", _msd_oracle_sql())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type chain by 24 exact-micro
    power-iteration rounds (B330), with the per-state invariance gap as
    the convergence certificate."""
    k, iters = _MSD_K, _MSD_ITERS
    ev = read_table(spark, sf_dir, "events")
    arms = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (F.dense_rank().over(Window.orderBy("event_type")) - 1)
            .cast("long")
            .alias("idx"),
        )
    )
    seq = ev.join(F.broadcast(arms), "event_type").select(
        F.col("idx").alias("i"),
        F.lead("idx")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("j"),
    )
    cnt = seq.filter(F.col("j").isNotNull()).groupBy("i", "j").agg(
        F.count("*").cast("long").alias("c")
    )
    norm = cnt.withColumn(
        "p",
        F.expr("c * 1000000 div sum(c) over (partition by i)").cast("long"),
    )
    # bounded k×k collect (the B329 discipline), python power iteration
    p = [[1_000_000 if i == j else 0 for j in range(k)] for i in range(k)]
    seen = set()
    for r in norm.collect():
        if r["i"] not in seen:
            p[r["i"]] = [0] * k
            seen.add(r["i"])
        p[r["i"]][r["j"]] = r["p"]
    v = [1_000_000 // k] * k
    for _ in range(iters):
        v = [sum(v[i] * p[i][j] for i in range(k)) // 1_000_000 for j in range(k)]
    w = [sum(v[i] * p[i][j] for i in range(k)) // 1_000_000 for j in range(k)]
    names = {r["idx"]: r["event_type"] for r in arms.collect()}
    out = [(i, names[i], v[i], abs(v[i] - w[i])) for i in range(k)]
    return spark.createDataFrame(
        out, "state long, event_type string, stationary_micro long, invariance_gap_micro long"
    ).orderBy("state")


# --------------------------------------------------------------------------
# B331: Kruskal-Wallis k-sample rank test (tie-corrected, exact integers).
#
# The k-group generalization of Mann-Whitney (B294) — "do the five event
# types draw value from the same distribution?" — in the same doubled-
# midrank discipline: over the (cents, per-type count) table, r2 =
# 2·cum_before + w + 1 is TWICE the midrank (integer, tie-exact), group
# rank sums R2_i fold from counts, and since 12·R² = 3·R2², H =
# 3·Σ(R2_i²/n_i)/(N(N+1)) − 3(N+1) — per-group floor documented, 128-bit
# squares. The tie correction divides by 1 − Σ(w³−w)/(N³−N), evaluated
# as one 128-bit cross-multiplication with the sign-explicit CASE (floor
# slack can leave H a hair negative under the null). Decision vs the
# χ²(4) 5% critical value 9.488 as a micro literal.
#
# Scale: one groupBy cents (bounded quantized domain), windows over that
# aggregated table, a k-row reduce.
# --------------------------------------------------------------------------


@register(
    "events_kruskal_wallis",
    """
WITH v AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), counts AS (
  SELECT cents, g, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY cents, g
), wv AS (
  SELECT cents, CAST(sum(c) AS BIGINT) AS w FROM counts GROUP BY cents
), ranked AS (
  SELECT cents, w,
         CAST(2 * (sum(w) OVER (ORDER BY cents) - w) + w + 1 AS BIGINT) AS r2
  FROM wv
), grp AS (
  SELECT c.g, CAST(sum(c.c) AS BIGINT) AS n,
         CAST(sum(c.c * r.r2) AS BIGINT) AS rr2
  FROM counts c JOIN ranked r USING (cents)
  GROUP BY c.g
), agg AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(CAST(rr2 AS HUGEINT) * rr2 // n) AS HUGEINT) AS s
  FROM grp
), ties AS (
  SELECT CAST(sum(CAST(w AS HUGEINT) * w * w - w) AS HUGEINT) AS tw FROM wv
), h AS (
  SELECT a.nn, a.k,
         CAST(3 * a.s * 1000000 // (CAST(a.nn AS HUGEINT) * (a.nn + 1))
              - 3 * (a.nn + 1) * 1000000 AS BIGINT) AS h_micro,
         t.tw,
         CAST(CAST(a.nn AS HUGEINT) * a.nn * a.nn - a.nn AS HUGEINT) AS n3n
  FROM agg a, ties t
)
SELECT nn AS n_total, k AS n_groups, h_micro,
       CAST(CASE WHEN h_micro >= 0
                 THEN CAST(h_micro AS HUGEINT) * n3n // (n3n - tw)
                 ELSE -(CAST(-h_micro AS HUGEINT) * n3n // (n3n - tw)) END
            AS BIGINT) AS h_tie_adj_micro,
       CAST(9488000 AS BIGINT) AS crit_micro_5pct,
       CAST(CASE WHEN (CASE WHEN h_micro >= 0
                            THEN CAST(h_micro AS HUGEINT) * n3n // (n3n - tw)
                            ELSE -(CAST(-h_micro AS HUGEINT) * n3n // (n3n - tw)) END)
                      > 9488000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_reject
FROM h
""",
)
def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H over event-type value distributions
    (B331): doubled midranks from the count table, 128-bit arithmetic,
    χ²(4) 5% literal gate."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    v = ev.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    counts = v.groupBy("cents", "g").agg(F.count("*").cast("long").alias("c"))
    wv = counts.groupBy("cents").agg(F.sum("c").cast("long").alias("w"))
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = wv.select(
        "cents",
        "w",
        (2 * (F.sum("w").over(wcum) - F.col("w")) + F.col("w") + 1)
        .cast("long")
        .alias("r2"),
    )
    grp = (
        counts.join(ranked.select("cents", "r2"), "cents")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("c") * F.col("r2")).cast("long").alias("rr2"),
        )
    )
    agg = grp.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count("*").cast("long").alias("k"),
        F.sum(F.expr(f"cast(rr2 as {dec}) * rr2 div n")).alias("s"),
    )
    ties = wv.agg(F.sum(F.expr(f"cast(w as {dec}) * w * w - w")).alias("tw"))
    h = agg.crossJoin(F.broadcast(ties)).select(
        "nn",
        "k",
        F.expr(
            f"cast(3 * cast(s as {dec}) * 1000000 div (cast(nn as {dec}) * (nn + 1))"
            " - 3 * (nn + 1) * 1000000 as long)"
        ).alias("h_micro"),
        "tw",
        F.expr(f"cast(cast(nn as {dec}) * nn * nn - nn as {dec})").alias("n3n"),
    )
    adj = (
        f"case when h_micro >= 0 then cast(h_micro as {dec}) * n3n div (n3n - tw)"
        f" else -(cast(-h_micro as {dec}) * n3n div (n3n - tw)) end"
    )
    return h.select(
        F.col("nn").alias("n_total"),
        F.col("k").alias("n_groups"),
        "h_micro",
        F.expr(f"cast({adj} as long)").alias("h_tie_adj_micro"),
        F.lit(9488000).cast("long").alias("crit_micro_5pct"),
        F.expr(f"cast(case when ({adj}) > 9488000 then 1 else 0 end as long)").alias(
            "is_reject"
        ),
    )


# --------------------------------------------------------------------------
# B332: post-stratification — correcting a composition-biased sample.
#
# The survey-statistics workhorse the corpus-sampling shelf (B11, B36)
# implies but never audits: when a subsample's STRATUM MIX differs from
# the population's, the naive sample mean is biased; reweighting each
# stratum mean by the POPULATION share removes exactly the composition
# bias. The sample here is deliberately type-skewed (odd users ∪ all
# 'click' events, documented), strata = event type. Exact integers:
# stratum means floored once to micro-cents, post-stratified estimate =
# Σ N_h·mean_h div N. Per-stratum rows carry both share columns so the
# skew is visible; the naive/post/true means ride along for the bias
# readout, and the pytest law checks post-stratification lands at least
# as close to the truth as the naive mean on this construction.
#
# Scale: two groupBys over events (population + sample), a k-row reduce.
# --------------------------------------------------------------------------


@register(
    "events_poststratified_mean",
    """
WITH pop AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS pop_n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS pop_s
  FROM events GROUP BY event_type
), samp AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS samp_n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS samp_s
  FROM events
  WHERE user_id % 2 = 1 OR event_type = 'click'
  GROUP BY event_type
), tot AS (
  SELECT CAST(sum(p.pop_n) AS BIGINT) AS nn,
         CAST(sum(p.pop_s) AS BIGINT) AS ss,
         CAST(sum(s.samp_n) AS BIGINT) AS sn,
         CAST(sum(s.samp_s) AS BIGINT) AS ss2,
         CAST(sum(p.pop_n * (s.samp_s * 1000000 // s.samp_n))
              // sum(p.pop_n) AS BIGINT) AS post_micro
  FROM pop p JOIN samp s USING (event_type)
)
SELECT p.event_type,
       p.pop_n, s.samp_n,
       CAST(s.samp_s * 1000000 // s.samp_n AS BIGINT) AS samp_mean_micro,
       CAST(p.pop_n * 1000000 // t.nn AS BIGINT) AS pop_share_ppm,
       CAST(s.samp_n * 1000000 // t.sn AS BIGINT) AS samp_share_ppm,
       CAST(t.ss2 * 1000000 // t.sn AS BIGINT) AS naive_micro,
       t.post_micro,
       CAST(t.ss * 1000000 // t.nn AS BIGINT) AS true_micro
FROM pop p JOIN samp s USING (event_type), tot t
ORDER BY p.event_type
""",
)
def events_poststratified_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified mean of a deliberately type-skewed subsample
    (B332): per-stratum shares + floored means, naive vs post-stratified
    vs true — the composition-bias correction, exactly."""
    ev = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pop = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("pop_n"),
        F.sum(cents).cast("long").alias("pop_s"),
    )
    samp = (
        ev.filter((F.col("user_id") % 2 == 1) | (F.col("event_type") == "click"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("samp_n"),
            F.sum(cents).cast("long").alias("samp_s"),
        )
    )
    joined = pop.join(samp, "event_type")
    tot = joined.agg(
        F.sum("pop_n").cast("long").alias("nn"),
        F.sum("pop_s").cast("long").alias("ss"),
        F.sum("samp_n").cast("long").alias("sn"),
        F.sum("samp_s").cast("long").alias("ss2"),
        F.expr(
            "cast(sum(pop_n * (samp_s * 1000000 div samp_n)) div sum(pop_n) as bigint)"
        ).alias("post_micro"),
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "pop_n",
            "samp_n",
            F.expr("cast(samp_s * 1000000 div samp_n as bigint)").alias("samp_mean_micro"),
            F.expr("cast(pop_n * 1000000 div nn as bigint)").alias("pop_share_ppm"),
            F.expr("cast(samp_n * 1000000 div sn as bigint)").alias("samp_share_ppm"),
            F.expr("cast(ss2 * 1000000 div sn as bigint)").alias("naive_micro"),
            "post_micro",
            F.expr("cast(ss * 1000000 div nn as bigint)").alias("true_micro"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# B333: A/A calibration sweep — the experimentation stack's type-I audit.
#
# Before trusting any A/B readout, run the SAME test on 16 placebo
# splits: salted-hash arms carry no real effect, so every rejection is a
# false positive, and the realized rejection count calibrates the
# stack's actual type-I error against its nominal 5%. Each seed runs the
# B312-style exact two-proportion z² (128-bit) with the Chebyshev
# p ≤ 1/z² — conservative by construction, so the sweep should reject
# ~0/16 (the pytest law bounds it ≤ 2). The seed grid is a bounded
# literal; arms are md5('aa'||seed||':'||user) % 2 — 16 independent
# deterministic re-randomizations of the same users.
#
# Scale: one groupBy (seed × arm) after a 16-row broadcast grid — 16
# passes of partial aggregation fused into one shuffle.
# --------------------------------------------------------------------------


@register(
    "events_aa_calibration_sweep",
    """
WITH seeds AS (
  SELECT CAST(s AS BIGINT) AS seed FROM unnest(range(16)) AS r(s)
), tagged AS (
  SELECT sd.seed,
         CAST(('0x' || substr(md5('aa' || CAST(sd.seed AS VARCHAR) || ':'
                                  || CAST(e.user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS arm,
         CASE WHEN CAST(round(e.value * 100) AS BIGINT) >= 5000 THEN 1 ELSE 0 END
           AS x
  FROM events e CROSS JOIN seeds sd
), cell AS (
  SELECT seed,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS s1
  FROM tagged GROUP BY seed
), z AS (
  SELECT seed, n0, s0, n1, s1,
         CAST((CAST(s0 AS HUGEINT) * n1 - CAST(s1 AS HUGEINT) * n0)
              * (CAST(s0 AS HUGEINT) * n1 - CAST(s1 AS HUGEINT) * n0)
              * (n0 + n1) * 1000000
              // (CAST(n0 AS HUGEINT) * n1 * (s0 + s1)
                  * (n0 + n1 - s0 - s1)) AS BIGINT) AS z2_micro
  FROM cell
), p AS (
  SELECT *, CAST(least(1000000, 1000000000000 // greatest(z2_micro, 1)) AS BIGINT)
              AS p_micro
  FROM z
)
SELECT seed, n0, s0, n1, s1, z2_micro, p_micro,
       CAST(CASE WHEN p_micro <= 50000 THEN 1 ELSE 0 END AS BIGINT) AS is_reject,
       CAST(sum(CASE WHEN p_micro <= 50000 THEN 1 ELSE 0 END) OVER () AS BIGINT)
         AS n_rejects_total
FROM p
ORDER BY seed
""",
)
def events_aa_calibration_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-seed A/A placebo sweep of the exact two-proportion test (B333):
    per-seed 128-bit z², Chebyshev p, realized false-positive count."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    seeds = spark.range(16).select(F.col("id").cast("long").alias("seed"))
    # r15 (guide §2.3 — decide with small rows): the arm hash depends only
    # on (seed, user_id), so aggregate events per USER once (one map-side
    # combinable pass) and fan the 16-seed grid out over the |users|-row
    # table: 16 md5 evaluations per USER instead of per EVENT (~400× fewer
    # hashes at sf0.1, and the seed fan-out never touches the corpus).
    # Identical cell sums: n_a = Σ_{arm(u)=a} n_ev(u), s_a = Σ sx(u).
    usr = ev.select(
        "user_id",
        F.when(F.round(F.col("value") * 100).cast("long") >= 5000, 1)
        .otherwise(0)
        .alias("x"),
    ).groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_ev"), F.sum("x").cast("long").alias("sx")
    )
    tagged = usr.crossJoin(F.broadcast(seeds)).select(
        "seed",
        F.expr(
            "cast(conv(substring(md5(concat('aa', cast(seed as string), ':',"
            " cast(user_id as string))), 1, 8), 16, 10) as bigint) % 2"
        ).alias("arm"),
        "n_ev",
        "sx",
    )
    cell = tagged.groupBy("seed").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n_ev")).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("sx")).otherwise(0)).cast("long").alias("s0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_ev")).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("sx")).otherwise(0)).cast("long").alias("s1"),
    )
    z = cell.withColumn(
        "z2_micro",
        F.expr(
            f"cast((cast(s0 as {dec}) * n1 - cast(s1 as {dec}) * n0)"
            f" * (cast(s0 as {dec}) * n1 - cast(s1 as {dec}) * n0)"
            f" * (n0 + n1) * 1000000"
            f" div (cast(n0 as {dec}) * n1 * (s0 + s1) * (n0 + n1 - s0 - s1)) as long)"
        ),
    )
    p = z.withColumn(
        "p_micro",
        F.expr("cast(least(1000000, 1000000000000 div greatest(z2_micro, 1)) as long)"),
    )
    return p.select(
        "seed",
        "n0",
        "s0",
        "n1",
        "s1",
        "z2_micro",
        "p_micro",
        F.when(F.col("p_micro") <= 50000, 1).otherwise(0).cast("long").alias("is_reject"),
        F.sum(F.when(F.col("p_micro") <= 50000, 1).otherwise(0))
        .over(Window.partitionBy())
        .cast("long")
        .alias("n_rejects_total"),
    ).orderBy("seed")


# --------------------------------------------------------------------------
# B342: doubly-robust off-policy value — completing the OPE shelf.
#
# IPS (B272) is unbiased but high-variance; a direct-method (DM) reward
# model is low-variance but biased. The doubly-robust estimator keeps
# the best of both: V_DR = E[q̂(x, π(x))] + E[1{a=π}/p · (r − q̂(x,a))]
# — consistent if EITHER the propensities OR the reward model is right.
# Honest split: the reward model q̂ is fit on the ODD event half
# (per-(seg, act) floored mean), policies and propensities come from
# the full log (the B272 convention), and the estimator folds over the
# EVEN half — so q̂ genuinely differs from the eval means and the
# correction term is non-trivial. All integer micro: one floor per q̂
# cell, sign-explicit division for the signed correction (the gamma
# discipline), 128-bit products. IPS on the same half rides along so
# the DR-vs-IPS variance trade is read directly.
#
# Scale: three keyed aggregates over events + bounded (seg × act)
# tables; nothing after the first shuffles scales with N.
# --------------------------------------------------------------------------


@register(
    "events_dr_policy_eval",
    """
WITH e AS (
  SELECT event_id, CAST(user_id % 4 AS BIGINT) AS seg, event_type AS act,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), g AS (
  SELECT seg, act, CAST(count(*) AS BIGINT) AS c,
         CAST(coalesce(sum(cents), 0) AS BIGINT) AS r
  FROM e GROUP BY seg, act
), nseg AS (
  SELECT seg, CAST(sum(c) AS BIGINT) AS n_seg FROM g GROUP BY seg
), qhat AS (
  SELECT seg, act,
         CAST(coalesce(sum(cents), 0) * 1000000 // count(*) AS BIGINT) AS q
  FROM e WHERE event_id % 2 = 1 GROUP BY seg, act
), h AS (
  SELECT seg, act, CAST(count(*) AS BIGINT) AS ch,
         CAST(coalesce(sum(cents), 0) AS BIGINT) AS rh
  FROM e WHERE event_id % 2 = 0 GROUP BY seg, act
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_eval FROM e WHERE event_id % 2 = 0
), pol AS (
  SELECT 'mode' AS policy, seg, act FROM (
    SELECT seg, act, row_number() OVER (PARTITION BY seg
             ORDER BY c DESC, act) AS rn FROM g) WHERE rn = 1
  UNION ALL
  SELECT 'value', seg, act FROM (
    SELECT seg, act, row_number() OVER (PARTITION BY seg
             ORDER BY (CAST(r AS HUGEINT) * 1000000) // c DESC, act) AS rn
    FROM g) WHERE rn = 1
), heval AS (
  SELECT seg, CAST(sum(ch) AS BIGINT) AS nh FROM h GROUP BY seg
), dm AS (
  SELECT p.policy,
         CAST(sum(he.nh * coalesce(q.q, 0)) AS HUGEINT) AS dm_num
  FROM pol p
  JOIN heval he USING (seg)
  LEFT JOIN qhat q ON q.seg = p.seg AND q.act = p.act
  GROUP BY p.policy
), corr AS (
  SELECT p.policy,
         CAST(sum(CASE WHEN h.rh * 1000000 - h.ch * coalesce(q.q, 0) >= 0
                       THEN (CAST(h.rh AS HUGEINT) * 1000000
                             - h.ch * coalesce(q.q, 0)) * ns.n_seg // g.c
                       ELSE -((CAST(h.ch AS HUGEINT) * coalesce(q.q, 0)
                               - h.rh * 1000000) * ns.n_seg // g.c) END)
              AS HUGEINT) AS corr_num,
         CAST(sum((CAST(h.rh AS HUGEINT) * 1000000) * ns.n_seg // g.c)
              AS HUGEINT) AS ips_num
  FROM pol p
  JOIN h ON h.seg = p.seg AND h.act = p.act
  JOIN g ON g.seg = p.seg AND g.act = p.act
  JOIN nseg ns ON ns.seg = p.seg
  LEFT JOIN qhat q ON q.seg = p.seg AND q.act = p.act
  GROUP BY p.policy
)
SELECT d.policy, t.n_eval,
       CAST(d.dm_num // t.n_eval AS BIGINT) AS dm_value_micro,
       CAST(CASE WHEN c.corr_num >= 0 THEN c.corr_num // t.n_eval
                 ELSE -((-c.corr_num) // t.n_eval) END AS BIGINT)
         AS correction_micro,
       CAST(d.dm_num // t.n_eval
            + CASE WHEN c.corr_num >= 0 THEN c.corr_num // t.n_eval
                   ELSE -((-c.corr_num) // t.n_eval) END AS BIGINT)
         AS dr_value_micro,
       CAST(c.ips_num // t.n_eval AS BIGINT) AS ips_value_micro
FROM dm d JOIN corr c USING (policy), tot t
ORDER BY d.policy
""",
)
def events_dr_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy value for the two B272 argmax policies
    (B342): odd-half reward model, full-log propensities, even-half
    estimator, sign-explicit integer folds; IPS alongside."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    e = ev.select(
        "event_id",
        (F.col("user_id") % 4).cast("long").alias("seg"),
        F.col("event_type").alias("act"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = e.groupBy("seg", "act").agg(
        F.count("*").cast("long").alias("c"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("r"),
    )
    nseg = g.groupBy("seg").agg(F.sum("c").cast("long").alias("n_seg"))
    qhat = (
        e.filter(F.col("event_id") % 2 == 1)
        .groupBy("seg", "act")
        .agg(
            F.expr(
                "cast(coalesce(sum(cents), 0) * 1000000 div count(*) as bigint)"
            ).alias("q")
        )
    )
    h = (
        e.filter(F.col("event_id") % 2 == 0)
        .groupBy("seg", "act")
        .agg(
            F.count("*").cast("long").alias("ch"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("rh"),
        )
    )
    tot = e.filter(F.col("event_id") % 2 == 0).agg(
        F.count("*").cast("long").alias("n_eval")
    )
    w_mode = Window.partitionBy("seg").orderBy(F.col("c").desc(), "act")
    w_val = Window.partitionBy("seg").orderBy(
        F.expr(f"(cast(r as {dec}) * 1000000) div c").desc(), "act"
    )
    pol = (
        g.withColumn("rn", F.row_number().over(w_mode))
        .filter(F.col("rn") == 1)
        .select(F.lit("mode").alias("policy"), "seg", "act")
        .unionByName(
            g.withColumn("rn", F.row_number().over(w_val))
            .filter(F.col("rn") == 1)
            .select(F.lit("value").alias("policy"), "seg", "act")
        )
    )
    heval = h.groupBy("seg").agg(F.sum("ch").cast("long").alias("nh"))
    dm = (
        pol.join(heval, "seg")
        .join(qhat, ["seg", "act"], "left")
        .groupBy("policy")
        .agg(
            F.sum(F.expr(f"cast(nh as {dec}) * coalesce(q, 0)")).alias("dm_num")
        )
    )
    corr = (
        pol.join(h, ["seg", "act"])
        .join(g, ["seg", "act"])
        .join(nseg, "seg")
        .join(qhat, ["seg", "act"], "left")
        .groupBy("policy")
        .agg(
            F.sum(
                F.expr(
                    f"case when rh * 1000000 - ch * coalesce(q, 0) >= 0"
                    f" then (cast(rh as {dec}) * 1000000 - ch * coalesce(q, 0))"
                    f" * n_seg div c"
                    f" else -((cast(ch as {dec}) * coalesce(q, 0) - rh * 1000000)"
                    f" * n_seg div c) end"
                )
            ).alias("corr_num"),
            F.sum(
                F.expr(f"(cast(rh as {dec}) * 1000000) * n_seg div c")
            ).alias("ips_num"),
        )
    )
    signed = (
        "case when corr_num >= 0 then corr_num div n_eval"
        " else -((-corr_num) div n_eval) end"
    )
    return (
        dm.join(corr, "policy")
        .crossJoin(F.broadcast(tot))
        .select(
            "policy",
            "n_eval",
            F.expr("cast(dm_num div n_eval as bigint)").alias("dm_value_micro"),
            F.expr(f"cast({signed} as bigint)").alias("correction_micro"),
            F.expr(f"cast(dm_num div n_eval + ({signed}) as bigint)").alias(
                "dr_value_micro"
            ),
            F.expr("cast(ips_num div n_eval as bigint)").alias("ips_value_micro"),
        )
        .orderBy("policy")
    )


# --------------------------------------------------------------------------
# B343: Mann-Kendall trend test — monotone drift, distribution-free.
#
# Completes the sequential-monitoring shelf's OFFLINE diagnosis: runs
# (B328) asks "is it random?", Page-Hinkley/CUSUM fire online; Mann-
# Kendall asks the retrospective "is there a monotone trend?" with no
# distributional or linearity assumption: S = Σ_{i<j} sign(y_j − y_i)
# over the day-ordered counts, Var[S] = n(n−1)(2n+5)/18 minus the tie
# term Σt(t−1)(2t+5)/18, z² via the continuity-corrected (|S|−1)² in
# micro/128-bit, Chebyshev gate (the house distribution-free
# discipline). The pairwise sum is O(days²) on the HORIZON-bounded
# daily table — never on raw rows.
#
# Scale: one groupBy day; the self-join runs on ≤horizon-days rows.
# --------------------------------------------------------------------------


@register(
    "events_mann_kendall_trend",
    """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), s AS (
  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)
              AS BIGINT) AS mk_s,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM daily a JOIN daily b ON b.d > a.d
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM daily
), ties AS (
  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY y HAVING count(*) > 1)
), v AS (
  SELECT s.mk_s, s.n_pairs, nn.n,
         CAST((CAST(nn.n AS HUGEINT) * (nn.n - 1) * (2 * nn.n + 5) - t.tie_term)
              // 18 AS BIGINT) AS var_s
  FROM s, nn, ties t
)
SELECT mk_s, n_pairs, n AS n_days, var_s,
       CAST(CASE WHEN abs(mk_s) <= 1 OR var_s = 0 THEN 0
                 ELSE (CAST(abs(mk_s) - 1 AS HUGEINT) * (abs(mk_s) - 1) * 1000000)
                      // var_s END AS BIGINT) AS z2_micro,
       CAST(CASE WHEN mk_s > 0 THEN 1 WHEN mk_s < 0 THEN -1 ELSE 0 END AS BIGINT)
         AS trend_sign,
       CAST(CASE WHEN abs(mk_s) > 1 AND var_s > 0
                  AND (CAST(abs(mk_s) - 1 AS HUGEINT) * (abs(mk_s) - 1) * 1000000)
                      // var_s > 20000000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_trend
FROM v
""",
)
def events_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S over daily counts with tie-corrected variance and
    the continuity-corrected Chebyshev gate (B343)."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    daily = ev.groupBy(
        F.expr("cast(floor(cast(ts as double)/86400) as bigint)").alias("d")
    ).agg(F.count("*").cast("long").alias("y"))
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    s = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("mk_s"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    nn = daily.agg(F.count("*").cast("long").alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) * (2 * t + 5)")), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    v = (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            "mk_s",
            "n_pairs",
            "n",
            F.expr(
                f"cast((cast(n as {dec}) * (n - 1) * (2 * n + 5) - tie_term)"
                " div 18 as bigint)"
            ).alias("var_s"),
        )
    )
    z2 = (
        f"case when abs(mk_s) <= 1 or var_s = 0 then 0"
        f" else (cast(abs(mk_s) - 1 as {dec}) * (abs(mk_s) - 1) * 1000000)"
        " div var_s end"
    )
    return v.select(
        "mk_s",
        "n_pairs",
        F.col("n").alias("n_days"),
        "var_s",
        F.expr(f"cast({z2} as bigint)").alias("z2_micro"),
        F.expr(
            "cast(case when mk_s > 0 then 1 when mk_s < 0 then -1 else 0 end as bigint)"
        ).alias("trend_sign"),
        F.expr(
            f"cast(case when abs(mk_s) > 1 and var_s > 0 and ({z2}) > 20000000"
            " then 1 else 0 end as bigint)"
        ).alias("is_trend"),
    )


# --------------------------------------------------------------------------
# B344: single-changepoint locator — max-CUSUM binary segmentation.
#
# Page-Hinkley/CUSUM fire ONLINE; Mann-Kendall (B343) says "a trend
# exists"; this op answers the retrospective "WHERE did the level
# shift?" — the first step of binary segmentation: the split t*
# maximizing the scaled CUSUM deviation |S_t·n − t·S_n| (cross-
# multiplied, so no division enters the argmax at all — exactly the
# quantity whose max is the standard changepoint statistic, in exact
# integers). Deterministic tie-break (largest deviation, then earliest
# day); the output row carries the split day, both segment means
# (floored once each), and the shift size — the inputs a root-cause
# review needs.
#
# Scale: one groupBy day, windows over the horizon-bounded daily table.
# --------------------------------------------------------------------------


@register(
    "events_single_changepoint",
    """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), walk AS (
  SELECT d, y,
         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
         CAST(sum(y) OVER (ORDER BY d) AS BIGINT) AS st,
         CAST(sum(y) OVER () AS BIGINT) AS sn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM daily
), dev AS (
  SELECT d, t, st, sn, n,
         CAST(abs(CAST(st AS HUGEINT) * n - CAST(t AS HUGEINT) * sn) AS HUGEINT)
           AS dv
  FROM walk WHERE t < n
), best AS (
  SELECT d, t, st, sn, n, dv,
         row_number() OVER (ORDER BY dv DESC, d) AS rn
  FROM dev
)
SELECT d AS split_day, t AS split_pos, n AS n_days,
       CAST(dv // n AS BIGINT) AS deviation_scaled,
       CAST(st * 1000000 // t AS BIGINT) AS left_mean_micro,
       CAST((sn - st) * 1000000 // (n - t) AS BIGINT) AS right_mean_micro,
       CAST((sn - st) * 1000000 // (n - t) - st * 1000000 // t AS BIGINT)
         AS shift_micro
FROM best WHERE rn = 1
""",
)
def events_single_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-CUSUM-deviation single changepoint over daily counts (B344):
    division-free argmax, earliest-day tie-break, both segment means."""
    ev = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    daily = ev.groupBy(
        F.expr("cast(floor(cast(ts as double)/86400) as bigint)").alias("d")
    ).agg(F.count("*").cast("long").alias("y"))
    w_ord = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    walk = daily.select(
        "d",
        F.row_number().over(Window.orderBy("d")).cast("long").alias("t"),
        F.sum("y").over(w_ord).cast("long").alias("st"),
        F.sum("y").over(w_all).cast("long").alias("sn"),
        F.count("*").over(w_all).cast("long").alias("n"),
    )
    dev = walk.filter(F.col("t") < F.col("n")).select(
        "d",
        "t",
        "st",
        "sn",
        "n",
        F.expr(f"abs(cast(st as {dec}) * n - cast(t as {dec}) * sn)").alias("dv"),
    )
    best = dev.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("dv").desc(), "d"))
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("d").alias("split_day"),
        F.col("t").alias("split_pos"),
        F.col("n").alias("n_days"),
        F.expr("cast(dv div n as bigint)").alias("deviation_scaled"),
        F.expr("cast(st * 1000000 div t as bigint)").alias("left_mean_micro"),
        F.expr("cast((sn - st) * 1000000 div (n - t) as bigint)").alias(
            "right_mean_micro"
        ),
        F.expr(
            "cast((sn - st) * 1000000 div (n - t) - st * 1000000 div t as bigint)"
        ).alias("shift_micro"),
    )
