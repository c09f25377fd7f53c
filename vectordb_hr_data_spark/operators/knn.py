"""k-NN top-k vector search — the reference's core query operator.

Reference behavior (``talent_recommender.py:26-42``): embed the query, ask
ChromaDB's HNSW index for the top ``n_results`` nearest neighbours by
squared-L2 (collection default space, ``vector_db.py:100,107``), optionally
under a ``doc_type`` metadata pre-filter, with candidate over-fetch
``max(k*5, 20)`` before the refinement stages.

Spark-first form: brute-force exact scoring as a single narrow projection
over a columnar scan (whole-stage codegen) followed by a global top-k,
which Catalyst lowers to ``TakeOrderedAndProject`` — per-partition heaps +
a driver merge of k rows; NO full sort, NO shuffle of the data. At cluster
scale this reads N/1000 rows per executor and moves only k rows per
partition, which is the optimal exact plan. The approximate path for
100 TB is operators/ivf.py (cluster-pruned) and MLlib LSH
(operators/lsh.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V


def knn_topk(
    index: DataFrame,
    query_vec: Sequence[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_cols: Sequence[str] = ("vec_id",),
    pre_filter: Column | None = None,
    metric: str = "l2sq",
    round_to: int | None = None,
) -> DataFrame:
    """Exact top-k nearest rows to ``query_vec``.

    ``pre_filter`` is applied BEFORE scoring so Catalyst pushes it into the
    parquet scan (partition pruning when the index is partitioned on the
    filter column) — the Spark form of the reference's ``where=`` pushdown
    (``talent_recommender.py:31-40``).
    """
    df = index
    if pre_filter is not None:
        df = df.filter(pre_filter)
    q = F.lit([float(x) for x in query_vec])  # single array literal: ~4x faster to analyze/codegen than a wide F.array(...) tree
    if metric == "l2sq":
        dist = V.l2sq(F.col(vec_col), q)
    elif metric == "cosine":
        dist = F.lit(1.0) - V.cosine_sim(F.col(vec_col), q)
    else:
        raise ValueError(f"unknown metric {metric!r}")
    if round_to is not None:
        dist = F.round(dist, round_to)
    scored = df.select(*id_cols, dist.alias("distance"))
    # deterministic tie-break on the first id column (SURVEY.md §7.4 #4)
    return scored.orderBy(F.col("distance").asc(), F.col(id_cols[0]).asc()).limit(k)


def local_topk_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    k: int,
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """Per-partition partial top-k: within every input partition, keep only
    the ``k`` first rows per ``key_col`` value under the ``order_cols``
    ordering (ascending by default; pass ``ascending`` flags per column
    for mixed orders). A pure map-side reduction — no shuffle — so a
    downstream per-key global rank exchanges ≤ partitions·|keys|·k rows
    instead of the full stream. Values pass through untouched (no
    recomputation), so this composes with bit-exact scoring without
    affecting oracle parity.

    Implementation: ``mapInPandas`` with a tiny accumulator (≤ |keys|·k
    rows) folded over the partition's Arrow batches; compute per batch is
    one sort + grouped head over ``batch + accumulator`` rows.
    """
    import pandas as pd

    schema = df.schema
    cols = [key_col, *order_cols]
    asc = [True] + list(ascending if ascending is not None else [True] * len(order_cols))

    def fold(batches):
        acc: pd.DataFrame | None = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            acc = (
                both.sort_values(cols, ascending=asc, kind="mergesort")
                .groupby(key_col, sort=False)
                .head(k)
            )
        if acc is not None:
            yield acc

    return df.mapInPandas(fold, schema=schema)


def topk_per_key_expr(df: DataFrame, key_col: str, order_cols: Sequence[str], k: int) -> DataFrame:
    """Exact top-k rows per key as ONE pure-expression aggregation:
    ``groupBy(key).agg(slice(sort_array(collect_list(struct(order…, rest…))), 1, k))``
    then explode — no window, no Arrow boundary, whole plan JVM-side
    (VERDICT r3 item 5). Ordering is ascending over ``order_cols`` (struct
    fields compare in declaration order), ties broken by the remaining
    columns' values; callers put an id column in ``order_cols`` for
    deterministic results.

    Trade vs ``local_topk_per_key``: the exchange here carries map-side
    partial ``collect_list`` buffers — every row, array-packed — so it is
    NOT a bounded pre-reduction; it wins when |keys| is small-to-moderate
    and the per-row Arrow round-trip would dominate (measured: the Arrow
    twin cost knn_batch_topk_per_label 0.50 → 0.69 s at sf0.1). At
    100 TB-per-key volumes, prefer ``local_topk_per_key`` (bounded
    exchange) feeding a window rank. Pick per call-site; both twins are
    parity-tested against each other."""
    other = [c for c in df.columns if c != key_col and c not in order_cols]
    fields = [*order_cols, *other]
    packed = df.groupBy(key_col).agg(
        F.slice(F.sort_array(F.collect_list(F.struct(*fields))), 1, k).alias("_top")
    )
    exploded = packed.select(key_col, F.explode("_top").alias("_r"))
    return exploded.select(
        *[F.col(key_col) if c == key_col else F.col(f"_r.{c}").alias(c) for c in df.columns]
    )


def overfetch_count(k: int) -> int:
    """Reference over-fetch width: ``k*5 if k*5 > 10 else 20``
    (``talent_recommender.py:28``)."""
    return k * 5 if k * 5 > 10 else 20


def with_similarity(df: DataFrame, distance_col: str = "distance") -> DataFrame:
    """Derived ``similarity = 1 - distance`` (``main.py:118-119``)."""
    return df.withColumn("similarity", V.similarity_from_distance(distance_col))


def mmr_select(
    candidates: list[tuple[int, list[float]]],
    query_vec,
    k: int,
    lam: float = 0.5,
) -> list[tuple[int, float, float]]:
    """Maximal marginal relevance over an ALREADY-RETRIEVED candidate page
    (Carbonell & Goldstein, SIGIR'98): greedily pick the candidate
    maximizing ``λ·cos(q, d) − (1−λ)·max_{s∈selected} cos(d, s)`` — the
    standard diversity re-rank every retrieval stack offers.

    Deliberately driver-side over a BOUNDED page: MMR is sequentially
    greedy (step t depends on the t−1 picks), so it cannot be expressed as
    a shuffle-parallel plan — and does not need to be: production systems
    run it over the retrieved top-R (R ≈ k·5), never the corpus. The
    distributed work is the over-fetch (TakeOrderedAndProject); this is
    O(R²) driver flops on R ≤ ~100 rows — the same bounded-collect class
    as the reference's own final re-rank (talent_recommender.py:36-43).
    Deterministic: candidates arrive sorted (relevance, id); numpy argmax
    takes the first maximum, so exact ties keep that order.

    Returns [(id, relevance_cos, mmr_score)] in selection order."""
    import numpy as np

    if not candidates:
        return []
    ids = [int(i) for i, _ in candidates]
    mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in candidates])
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    rel = (mat @ q) / (norms * (np.linalg.norm(q) or 1.0))
    # pairwise candidate cosines, computed once (R×R)
    unit = mat / norms[:, None]
    sims = unit @ unit.T
    selected: list[tuple[int, float, float]] = []
    remaining = list(range(len(ids)))
    max_sim = np.full(len(ids), -np.inf)
    for _ in range(min(k, len(ids))):
        if selected:
            scores = lam * rel[remaining] - (1.0 - lam) * max_sim[remaining]
        else:
            scores = lam * rel[remaining]
        pick_pos = int(np.argmax(scores))
        pick = remaining.pop(pick_pos)
        selected.append((ids[pick], float(rel[pick]), float(scores[pick_pos])))
        max_sim = np.maximum(max_sim, sims[:, pick])
    return selected
