"""B45: incremental aggregate maintenance (materialized-view delta merge).

The production pattern behind every "don't recompute the dashboard over
100 TB nightly" requirement: a groupBy aggregate state S over corpus C and
a new batch ΔC merge as S' = merge(S, agg(ΔC)) — touching ONLY the delta
and the (group-key-sized) state, never C. Sound for any commutative
semigroup of partial aggregates; here the q1-style pricing summary keeps
(count, sum_qty, sum_base, sum_disc, sum_charge, sum_discount) per
(returnflag, linestatus), from which the averages derive at READ time —
the same partial/final split Spark's own partial aggregation uses, made
durable.

At 100 TB: agg(ΔC) is a map-side partial over the batch only; the merge
joins two group-key-sized frames (full outer on the uniform group key) —
cost independent of |C|. Exactness: sums carry DECIMAL(38, 4) end to end,
so merged state is bit-equal to a full recompute regardless of batch
split or order (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GROUP = ["l_returnflag", "l_linestatus"]
# scale 6 holds every q1 term exactly: qty/price at scale 2, disc_price at
# 4 (2+2), charge at 6 (2+2+2) — decimal sums are then EXACT and equal to
# the one-shot aggregate's regardless of batch split or order
_DEC = "decimal(38,6)"


def q1_state(batch: DataFrame) -> DataFrame:
    """Partial-aggregate state for a batch of lineitem rows."""
    def dec2(c):
        return F.col(c).cast("decimal(18,2)")

    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    charge = disc_price * (F.lit(1) + dec2("l_tax"))
    return batch.groupBy(*GROUP).agg(
        F.count("*").alias("n_rows"),
        F.sum(dec2("l_quantity")).cast(_DEC).alias("sum_qty"),
        F.sum(dec2("l_extendedprice")).cast(_DEC).alias("sum_base"),
        F.sum(disc_price).cast(_DEC).alias("sum_disc_price"),
        F.sum(charge).cast(_DEC).alias("sum_charge"),
        F.sum(dec2("l_discount")).cast(_DEC).alias("sum_discount"),
    )


def merge_q1_state(state: DataFrame, delta_state: DataFrame) -> DataFrame:
    """S' = S ⊕ agg(Δ): full outer join on the group key, null-safe adds.
    Both inputs are group-key-sized; the merge never reads base data."""
    s, d = state.alias("s"), delta_state.alias("d")
    merged = s.join(d, GROUP, "full_outer")

    def add(col: str):
        return (
            F.coalesce(F.col(f"s.{col}"), F.lit(0).cast(_DEC))
            + F.coalesce(F.col(f"d.{col}"), F.lit(0).cast(_DEC))
        ).cast(_DEC).alias(col)

    return merged.select(
        *GROUP,
        (
            F.coalesce(F.col("s.n_rows"), F.lit(0)) + F.coalesce(F.col("d.n_rows"), F.lit(0))
        ).alias("n_rows"),
        add("sum_qty"),
        add("sum_base"),
        add("sum_disc_price"),
        add("sum_charge"),
        add("sum_discount"),
    )


def q1_report(state: DataFrame) -> DataFrame:
    """Finalize the q1 report from state — the EXACT output expressions of
    `q1_pricing_summary` (double casts + round-6 averages), so the
    incrementally-maintained report hash-matches the one-shot oracle."""
    return state.select(
        *GROUP,
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base").cast("double").alias("sum_base_price"),
        F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
        F.col("sum_charge").cast("double").alias("sum_charge"),
        F.round(F.col("sum_qty").cast("double") / F.col("n_rows"), 6).alias("avg_qty"),
        F.round(F.col("sum_base").cast("double") / F.col("n_rows"), 6).alias("avg_price"),
        F.round(F.col("sum_discount").cast("double") / F.col("n_rows"), 6).alias("avg_disc"),
        F.col("n_rows").alias("count_order"),
    ).orderBy(*GROUP)
