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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with replicate-broadcast salting — the manual escape hatch
    for a skewed join key when AQE's skew-join split doesn't apply (e.g.
    the skewed side feeds from a co-partitioned upstream stage AQE won't
    re-split, or the engine predates runtime skew handling).

    The big side scatters each row into one of ``n_salts`` sub-keys; the
    small side replicates every row across ALL salts (explode ×n_salts).
    The join key becomes (key, salt), so a hot key's rows spread over
    ``n_salts`` reducers instead of one. Row-for-row identical to the
    plain equi-join for inner/left joins (replication is keyed, never
    duplicating matches). Cost: small side grows n_salts× — keep it the
    dimension side; if it fits in a broadcast, use ``F.broadcast`` instead
    and skip salting entirely.
    """
    keys = [key] if isinstance(key, str) else list(key)
    salt = (F.rand(seed=42) * n_salts).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [*keys, "_salt"], how).drop("_salt")


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
