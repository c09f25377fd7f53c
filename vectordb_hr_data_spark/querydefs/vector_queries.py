"""Vector search queries over the ``embeddings`` table (dim-64 float32).

These are the testdata re-expression of the reference's ANN query path
(SURVEY.md A18-A21, A29-A30): squared-L2 (Chroma default space), metadata
pre-filter, over-fetch width, top-k with deterministic tie-break, and the
``1 - distance`` similarity derivation.

The query vector is the stored embedding of ``vec_id = 0`` — fully
reproducible on the oracle side as a scalar subquery, no model inference.
Distances are rounded to 4 decimals on BOTH sides so double-precision
summation-order jitter cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as V
from ..io import read_table
from ..operators.knn import knn_topk, overfetch_count
from ..queries import register

_ROUND = 4


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Driver-side fetch of the 1-row query vector — the reference also
    embeds the query on the driver (``talent_recommender.py:26``); a 64-float
    scalar is broadcast as a literal, never a shuffle."""
    row = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == vec_id).select("embedding").first()
    return list(row[0])


def _l2sq_oracle(where: str = "", k: int = 10) -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_sum(list_transform(range(1, len(e.embedding)+1),
             i -> power(CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE), 2))), {_ROUND}) AS distance
FROM embeddings e, q
{where}
ORDER BY distance, e.vec_id
LIMIT {k}
"""


@register("knn_topk_l2sq", _l2sq_oracle())
def knn_topk_l2sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19/A29: exact squared-L2 top-10 → TakeOrderedAndProject."""
    emb = read_table(spark, sf_dir, "embeddings")
    return knn_topk(emb, _query_vec(spark, sf_dir), k=10, round_to=_ROUND)


@register("knn_topk_prefiltered", _l2sq_oracle(where="WHERE e.label = 3", k=10))
def knn_topk_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21: metadata equality pre-filter pushed below scoring (the
    reference's ``where={'doc_type': t}``, here ``label = 3``)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return knn_topk(emb, _query_vec(spark, sf_dir), k=10, pre_filter=F.col("label") == 3, round_to=_ROUND)


@register(
    "knn_overfetch_similarity",
    f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         round(list_sum(list_transform(range(1, len(e.embedding)+1),
               i -> power(CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE), 2))), {_ROUND}) AS distance
  FROM embeddings e, q
  ORDER BY distance, e.vec_id
  LIMIT {overfetch_count(5)}
)
SELECT vec_id, distance, round(1.0 - distance, {_ROUND}) AS similarity
FROM scored ORDER BY distance, vec_id LIMIT 5
""",
)
def knn_overfetch_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20+A29+A30: two-phase over-fetch (k*5 ∨ 20) then final limit, with
    the reference's possibly-negative ``1 - distance`` similarity."""
    emb = read_table(spark, sf_dir, "embeddings")
    cand = knn_topk(emb, _query_vec(spark, sf_dir), k=overfetch_count(5), round_to=_ROUND)
    return (
        cand.withColumn("similarity", F.round(V.similarity_from_distance("distance"), _ROUND))
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(5)
    )


@register(
    "knn_topk_cosine",
    f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(1.0 - (
         list_sum(list_transform(range(1, len(e.embedding)+1),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(q.qv,       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
       ), {_ROUND}) + 0.0 AS distance
FROM embeddings e, q
ORDER BY distance, e.vec_id
LIMIT 10
""",
)
def knn_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-distance top-10 — the baseline metric for embedding near-dup
    (Layer B); brute-force exact, same TakeOrderedAndProject shape.

    The self-match distance is canonicalized with ``+ 0.0`` on BOTH sides:
    DuckDB's ``round(1.0 - 1.0, 4)`` yields ``-0.0`` while Spark yields
    ``0.0`` — same value, different bytes/str, hash mismatch (VERDICT r01)."""
    emb = read_table(spark, sf_dir, "embeddings")
    out = knn_topk(emb, _query_vec(spark, sf_dir), k=10, metric="cosine", round_to=_ROUND)
    return out.withColumn("distance", F.col("distance") + F.lit(0.0))


@register(
    "knn_batch_topk_per_label",
    f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.label,
         e.vec_id,
         round(list_sum(list_transform(range(1, len(e.embedding)+1),
               i -> power(CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE), 2))), {_ROUND}) AS distance
  FROM embeddings e, q
),
ranked AS (
  SELECT label, vec_id, distance,
         row_number() OVER (PARTITION BY label ORDER BY distance, vec_id) AS rn
  FROM scored
)
SELECT label, vec_id, distance FROM ranked WHERE rn <= 3
ORDER BY label, distance, vec_id
""",
)
def knn_batch_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 shape: top-k per group, pre-reduced map-side: each partition keeps
    its 3 best rows per label (``local_topk_per_key``, no shuffle) so the
    per-label window rank exchanges ≤ partitions·|labels|·3 rows — the
    full scored stream never shuffles (VERDICT r2 item 3 applied to the
    per-label variant too)."""
    from pyspark.sql import Window

    from ..operators.knn import local_topk_per_key

    emb = read_table(spark, sf_dir, "embeddings")
    q = F.lit([float(x) for x in _query_vec(spark, sf_dir)])  # single array literal: ~4x faster to analyze/codegen than a wide F.array(...) tree
    scored = emb.select(
        "label", "vec_id", F.round(V.l2sq(F.col("embedding"), q), _ROUND).alias("distance")
    )
    scored = local_topk_per_key(scored, "label", ("distance", "vec_id"), 3)
    w = Window.partitionBy("label").orderBy(F.col("distance").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("label", "distance", "vec_id")
    )


_SQ8_IDX = "CAST(i AS INT)"


@register(
    "knn_topk_sq8",
    f"""
WITH dims AS (
  SELECT i, min(CAST(embedding[{_SQ8_IDX}] AS DOUBLE)) AS lo,
            max(CAST(embedding[{_SQ8_IDX}] AS DOUBLE)) AS hi
  FROM embeddings, range(1, 65) AS t(i)
  GROUP BY i
), rng AS (
  SELECT list(lo ORDER BY i) AS lov, list(hi ORDER BY i) AS hiv FROM dims
), coded AS (
  SELECT e.vec_id,
         list_transform(range(1, 65), i ->
           CASE WHEN rng.hiv[{_SQ8_IDX}] = rng.lov[{_SQ8_IDX}] THEN -128
                ELSE CAST(round((CAST(e.embedding[{_SQ8_IDX}] AS DOUBLE) - rng.lov[{_SQ8_IDX}])
                     / (rng.hiv[{_SQ8_IDX}] - rng.lov[{_SQ8_IDX}]) * 255.0) AS INT) - 128 END) AS codes
  FROM embeddings e, rng
), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT c.vec_id,
       round(list_sum(list_transform(range(1, 65), i ->
         power(rng.lov[{_SQ8_IDX}]
               + (c.codes[{_SQ8_IDX}] + 128.0) / 255.0 * (rng.hiv[{_SQ8_IDX}] - rng.lov[{_SQ8_IDX}])
               - CAST(q.qv[{_SQ8_IDX}] AS DOUBLE), 2))), {_ROUND}) AS qdistance
FROM coded c, rng, q
ORDER BY qdistance, c.vec_id
LIMIT 10
""",
)
def knn_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8-quantized top-10 (operators/quantize.py): per-dim byte codes
    learned from one corpus aggregate, distances on the affine
    reconstruction. The scan side carries 1 byte/dim instead of 4 — the
    4× IO win that matters when a 100 TB index is scan-bound — and the
    deterministic integer arithmetic lets the oracle hash-check the
    quantized result itself, not just its recall."""
    from ..operators.quantize import fit_ranges, sq8_encode, sq8_reconstruct

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", dim=64)
    coded = emb.select("vec_id", sq8_encode("embedding", lo, hi).alias("codes"))
    q = _query_vec(spark, sf_dir)
    recon = sq8_reconstruct("codes", lo, hi)
    dist = V.l2sq(recon, F.lit([float(x) for x in q]))
    return (
        coded.select("vec_id", F.round(dist, _ROUND).alias("qdistance"))
        .orderBy(F.col("qdistance").asc(), F.col("vec_id").asc())
        .limit(10)
    )
