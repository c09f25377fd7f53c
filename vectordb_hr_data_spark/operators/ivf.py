"""IVF (inverted-file) approximate nearest-neighbour search — the batch
scale path for kNN (SURVEY.md A19's approximate form; BASELINE.json: Spark
batch-builds the index, online serving is external).

Shape: assign every vector to its nearest centroid map-side (centroids are
tiny — inlined as a literal, no join, no shuffle), partition the index by
centroid id, and at query time
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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import vector as V


def fit_centroids(
    vectors: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Learn IVF centroids with MLlib KMeans (the production path; the
    deterministic first-k-rows centroids remain the oracle path, since
    KMeans init is seeded but its float reductions are not bit-portable to
    DuckDB). Returns (cid int, cvec array<double>) — tiny, broadcastable.
    KMeans training is a bounded number of map-reduce passes; the k
    centers themselves live on the driver, which is exactly the broadcast
    table the assignment join needs."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    spark = vectors.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cid int, cvec array<double>",
    )


# Measured probe/recall curve (SCALE.md, r4 testdata: sf0.1 corpus,
# learned KMeans K=32, recall@10 vs exact kNN averaged over queries),
# expressed as (fraction of cells probed, recall) so it transfers across K:
# recall climbs roughly linearly in the probed fraction until the probe set
# covers the query's true neighborhood. Uniform synthetic embeddings are
# the WORST case — real corpora cluster, steepening the curve — so a
# suggestion derived from it is conservative.
PROBE_RECALL_CURVE: list[tuple[float, float]] = [
    (1 / 32, 0.16),
    (2 / 32, 0.38),
    (4 / 32, 0.58),
    (8 / 32, 0.72),
    (1.0, 1.0),
]
ROWS_PER_CELL = 10_000
_CENTROID_BROADCAST_BYTES = 64 << 20  # keep the centroid table broadcastable
# The curve was measured at K=32; transferring by probed FRACTION to other
# cell counts over-predicts somewhat (measured at K=4/sf0.01: ~0.2 below
# the K=32 curve at the same fraction — fewer, coarser cells place more of
# a query's true neighborhood across the cell boundary). Solving against
# curve(f) − margin keeps the suggestion conservative: the pytest checks
# MEASURED recall ≥ the SLA, not just the prediction.
CURVE_TRANSFER_MARGIN = 0.15


def suggest_ivf_params(
    n_rows: int,
    dim: int,
    recall_sla: float,
    rows_per_cell: int = ROWS_PER_CELL,
    n_clusters: int | None = None,
) -> tuple[int, int]:
    """The IVF tuning contract as code (VERDICT r4 #4 — SCALE.md's
    "K ≈ N/10k, sweep n_probe against the recall SLA" prose made
    executable): returns ``(k, n_probe)`` for a corpus of ``n_rows``
    dim-``dim`` vectors and a target recall@10.

    - ``k`` ≈ n_rows / rows_per_cell — cells of ~10k vectors keep each
      probe's scan bounded while the centroid table stays a driver-side
      broadcast; floored at 4 (below ~40k rows pruning is a demo, but the
      params must still be valid) and capped so k·dim·8 bytes fits the
      broadcast budget (64 MB) — at dim 384 that caps k at ~20k cells,
      i.e. 200M rows/cell-budget before re-sharding the coarse quantizer.
    - ``n_probe`` = the smallest probe count whose probed fraction
      ``n_probe/k`` meets ``recall_sla + CURVE_TRANSFER_MARGIN`` on the
      measured curve (piecewise-linear interpolation, conservative ceil) —
      the margin absorbs the curve's K-transfer optimism so the MEASURED
      recall meets the SLA, which is what the pytest replays at small sf.

    ``n_clusters`` (when the caller has an estimate — HLL over coarse
    hashes, a KMeans elbow on a sample) floors K at the cluster count:
    measured on a 64-cluster low-rank corpus (SCALE.md r5), K=10 < 64
    clusters gives recall 0.00 at ANY n_probe (the probe set cannot cover
    the query's cluster), while K=64 learned centroids give 1.0 reading
    6.3% of the corpus — K must never be below the natural cluster count.

    ``ivf_topk_kmeans`` picks its params through this instead of fixed
    constants."""
    if not 0.0 < recall_sla <= 1.0:
        raise ValueError(f"recall_sla must be in (0, 1], got {recall_sla}")
    if n_rows <= 0 or dim <= 0:
        raise ValueError(f"need positive n_rows/dim, got {n_rows}/{dim}")
    if n_clusters is not None and n_clusters > n_rows:
        raise ValueError(
            f"n_clusters={n_clusters} exceeds n_rows={n_rows}: a corpus cannot "
            f"have more natural clusters than rows, and fit_centroids cannot "
            f"return more centroids than rows"
        )
    k_cap = max(4, _CENTROID_BROADCAST_BYTES // (8 * dim))
    k_floor = max(4, n_clusters or 0)
    # the cluster-count floor must not override the hard bounds: clamp the
    # floored k back inside the broadcast budget and the row count (an
    # n_clusters estimate past the budget means re-sharding the coarse
    # quantizer, not silently blowing the broadcast)
    k = int(max(k_floor, round(n_rows / rows_per_cell)))
    k = max(1, min(k, k_cap, n_rows))
    target = min(1.0, recall_sla + CURVE_TRANSFER_MARGIN)
    f = 1.0
    pts = PROBE_RECALL_CURVE
    if target <= pts[0][1]:
        f = pts[0][0]
    else:
        for (f0, r0), (f1, r1) in zip(pts, pts[1:]):
            if target <= r1:
                f = f0 + (target - r0) / (r1 - r0) * (f1 - f0)
                break
    import math

    n_probe = max(1, min(k, math.ceil(f * k)))
    return k, n_probe


def needs_retune(
    n_rows_now: int,
    built_params: dict,
    growth_tolerance: float = 2.0,
) -> bool:
    """Freshness check for a persisted index's TUNING, not its rows
    (VERDICT r5 #4): the incremental append path
    (``streaming.stream_ops.stream_ivf_sq8_append``) keeps K frozen at
    train time, so a corpus that grows 10× silently degrades to over-full
    cells — every probe then scans 10× the rows it was budgeted for, and
    the recall/latency contract the params were suggested against quietly
    breaks. Mirrors the reference's row-count freshness pattern
    (``pipeline.needs_rebuild``, reference ``vector_db.py:75-103``) one
    level up: compare the CURRENT mean cell occupancy against the
    rows-per-cell budget the index was built with and trigger a
    re-suggest + rebuild once it exceeds ``growth_tolerance`` × budget.

    ``built_params`` carries what build time knew:
    ``{"k": int, "rows_per_cell": int (optional, default ROWS_PER_CELL)}``
    — the dict shape lets callers persist it next to the index like any
    other trained state. Tolerance 2× by default: occupancy drifts with
    ingest skew, and a rebuild is a full corpus pass — retune when the
    geometry is genuinely stale, not on every append."""
    k = int(built_params["k"])
    if k <= 0:
        raise ValueError(f"built_params['k'] must be positive, got {k}")
    rows_per_cell = int(built_params.get("rows_per_cell", ROWS_PER_CELL))
    if n_rows_now < 0:
        raise ValueError(f"n_rows_now must be >= 0, got {n_rows_now}")
    return n_rows_now > k * rows_per_cell * growth_tolerance


def build_ivf_index(
    vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index as parquet PARTITIONED BY cid: each centroid's
    bucket is its own directory, so a probe-time cid filter becomes
    partition PRUNING — the 100 TB scan shrinks to n_probe/k of the data
    before a single row is read (asserted in tests/test_plans.py)."""
    assigned = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
    assigned.write.partitionBy("cid").mode("overwrite").parquet(path)


def ivf_topk_indexed(
    spark: SparkSession,
    index_path: str,
    centroids: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Query the persisted IVF index: rank centroids driver-side (they are
    k rows — the one collect that is always safe), read ONLY the probed
    cid partitions, exact-score the survivors, TakeOrderedAndProject."""
    q = [float(x) for x in query_vec]
    qlit = F.lit(q)
    probe = [
        r.cid
        for r in centroids.select("cid", V.l2sq(F.col("cvec"), qlit).alias("d"))
        .orderBy(F.col("d").asc(), F.col("cid").asc())
        .limit(n_probe)
        .collect()
    ]
    bucket = spark.read.parquet(index_path).filter(F.col("cid").isin(probe))
    dist = V.l2sq(F.col(vec_col), qlit)
    if round_to is not None:
        dist = F.round(dist, round_to)
    return (
        bucket.select(id_col, dist.alias("distance"))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``cid`` = nearest centroid (squared-L2, centroid-id tie-break).

    Map-side argmin: the centroid table is k rows, so it is collected once
    at plan-build time (the same always-safe collect ``ivf_topk_indexed``
    does) and inlined as an array-of-struct literal. Each row evaluates
    ``array_min(transform(centroids, c -> struct(l2sq(vec, c.cvec), c.cid)))``
    — struct comparison is lexicographic, so the min is (lowest distance,
    lowest cid), exactly the old window's tie-break. The plan is a pure
    Project over the scan: NO exchange, NO replication of the corpus
    (the previous form cross-joined then windowed on the unique ``id_col``,
    which shuffled N×k rows — asserted gone in tests/test_plans.py).
    """
    rows = sorted(centroids.select("cid", "cvec").collect(), key=lambda r: r.cid)
    cand = F.array(
        *[
            F.struct(
                F.lit([float(x) for x in r.cvec]).alias("cvec"),
                F.lit(int(r.cid)).alias("cid"),
            )
            for r in rows
        ]
    )
    scored = F.transform(
        cand,
        lambda c: F.struct(
            V.l2sq(F.col(vec_col), c["cvec"]).alias("d"), c["cid"].alias("cid")
        ),
    )
    return vectors.withColumn("cid", F.array_min(scored)["cid"])


def ivf_assign_gemm(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """GEMM fast path for the same assignment: one numpy matmul per Arrow
    batch computes all N×k distances and the argmin in BLAS — still
    map-only, ~10× the expression form at dim 384 / large k. Float64
    arithmetic; ties broken toward the lowest cid (np.argmin returns the
    first minimum and centroids are sorted by cid). Use the expression form
    when bit-exact oracle parity is required; a pytest pins the two to
    identical assignments on the test corpus."""
    rows = sorted(centroids.select("cid", "cvec").collect(), key=lambda r: r.cid)
    cmat = np.stack([np.asarray(r.cvec, dtype=np.float64) for r in rows])
    cids = np.asarray([int(r.cid) for r in rows])
    csq = np.einsum("ij,ij->i", cmat, cmat)

    @F.pandas_udf(T.IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; ||v||^2 is constant per row
        d = csq[None, :] - 2.0 * (m @ cmat.T)
        return pd.Series(cids[np.argmin(d, axis=1)]).astype("int32")

    return vectors.withColumn("cid", nearest(F.col(vec_col)))


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
