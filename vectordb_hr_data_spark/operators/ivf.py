"""IVF (inverted-file) approximate nearest-neighbour search — the batch
scale path for kNN (SURVEY.md A19's approximate form; BASELINE.json: Spark
batch-builds the index, online serving is external).

Shape: assign every vector to its nearest centroid (one broadcast join —
centroids are tiny), partition the index by centroid id, and at query time
probe only the ``n_probe`` centroids closest to the query. At 100 TB this
converts a full-corpus scan into a partition-pruned scan of
``n_probe / n_centroids`` of the data; the centroid assignment is the
expensive (but embarrassingly parallel, map-only) build step.

Centroid choice here is deterministic (caller supplies them — tests use
fixed corpus rows, production would use MLlib KMeans ``fit`` output) so
results are exactly reproducible by the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``cid`` = nearest centroid (squared-L2, centroid-id tie-break).

    centroids: (cid int, cvec array) — small, broadcast; the argmin is a
    per-row window over the broadcast-joined candidates, so the plan is
    scan → broadcast join → window, no shuffle of the big side beyond the
    window's local sort.
    """
    joined = vectors.crossJoin(F.broadcast(centroids))
    dist = V.l2sq(F.col(vec_col), F.col("cvec"))
    w = Window.partitionBy(id_col).orderBy(dist.asc(), F.col("cid").asc())
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "cvec")
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Probe the n_probe nearest centroids, exact-score only their buckets.

    When ``assigned`` is persisted partitioned by ``cid``, the semi-join on
    probed cids becomes partition pruning — the 100 TB read shrinks by
    n_probe/n_centroids before any scoring happens.
    """
    q = F.lit([float(x) for x in query_vec])  # single array literal: ~4x faster to analyze/codegen than a wide F.array(...) tree
    probe = (
        centroids.select("cid", V.l2sq(F.col("cvec"), q).alias("cdist"))
        .orderBy(F.col("cdist").asc(), F.col("cid").asc())
        .limit(n_probe)
        .select("cid")
    )
    bucket = assigned.join(F.broadcast(probe), "cid", "left_semi")
    dist = V.l2sq(F.col(vec_col), q)
    if round_to is not None:
        dist = F.round(dist, round_to)
    return (
        bucket.select(id_col, dist.alias("distance"))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )
