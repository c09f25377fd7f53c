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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_exact_ntile(
    df: DataFrame,
    n: int,
    value_col: str,
    tie_col: str,
    out_col: str,
    descending: bool = False,
) -> DataFrame:
    """Add ``out_col`` = ``ntile(n) OVER (ORDER BY value_col [DESC],
    tie_col)`` to ``df`` without a global single-partition sort.

    Contract: ``tie_col`` is unique per row (total order), ``value_col``
    has bounded distinct cardinality (its per-value count table is
    broadcast), and ``value_col`` contains no NULLs.
    """
    off_c, n_c = f"__{out_col}_off", f"__{out_col}_n"
    cnt = df.groupBy(value_col).agg(F.count("*").alias("__cnt"))
    order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    w_off = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    total = cnt.agg(F.sum("__cnt").cast("long").alias(n_c))
    off = (
        cnt.select(
            value_col,
            F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long").alias(off_c),
        )
        .crossJoin(F.broadcast(total))
    )
    w_rn = Window.partitionBy(value_col).orderBy(F.col(tie_col).asc())
    rank_c = f"__{out_col}_r"
    # integer `div` throughout — float division would mis-floor at extreme
    # rank magnitudes; q = floor(N/n), rem = N mod n, head = rows covered by
    # the rem over-full buckets.
    tile = F.expr(
        f"CAST(CASE WHEN {rank_c} <= ({n_c} % {n}) * ({n_c} div {n} + 1)"
        f" THEN ({rank_c} - 1) div ({n_c} div {n} + 1) + 1"
        f" ELSE {n_c} % {n}"
        f"  + ({rank_c} - ({n_c} % {n}) * ({n_c} div {n} + 1) - 1)"
        f"    div greatest({n_c} div {n}, 1) + 1"
        f" END AS BIGINT)"
    )
    return (
        df.join(F.broadcast(off), value_col)
        .withColumn(rank_c, (F.col(off_c) + F.row_number().over(w_rn)).cast("long"))
        .withColumn(out_col, tile)
        .drop(off_c, n_c, rank_c)
    )
