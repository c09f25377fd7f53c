"""Skew-resilient aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (one language dominating a corpus, one
event_type dominating a stream) turn a single reducer into the job's
critical path. The classic fix: scatter each key across ``n_salts``
sub-keys (phase 1 partial agg), then combine the partials (phase 2 — at
most ``n_salts`` rows per key). AQE's skew-join handling covers joins;
this covers aggregations, where AQE does not re-split a hot reducer.

Results are identical to the plain groupBy (the oracle checks this), so
salting is purely a physical choice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation.

    ``aggs`` maps output column name -> (phase1 aggregate over input rows,
    phase2 aggregate over phase-1 partials). Example for count:
    ``{"n": (F.count("*"), F.sum("n"))}`` — phase 2 must reference the
    phase-1 output name. Only algebraic aggregates decompose this way
    (count/sum/min/max; avg = sum+count recombined by the caller).
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[comb.alias(name) for name, (_, comb) in aggs.items()]
    )
