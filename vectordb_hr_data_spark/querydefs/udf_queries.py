"""Operators whose execution is genuinely non-SQL-expressible — real
pandas_udf / mapInPandas / MLlib-LSH paths. Registered WITHOUT oracle SQL,
so the driver records the weaker rows-only check (stable rowcount +
schema); their correctness is pinned instead by pytest against exact
operators (tests/test_similarity_scale.py) and deterministic seeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..queries import register


@register("embed_documents_sha256", None)
def embed_documents_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5/A12: the real Arrow-batched pandas_udf embedding path (sha256
    deterministic encoder, dim 16) — the exact plumbing the
    sentence-transformers encoder swaps into."""
    from ..embed import deterministic_embedder

    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", deterministic_embedder(16)(F.col("text")).alias("embedding"))
        .orderBy("doc_id")
    )


@register("lsh_brp_ann_topk", None)
def lsh_brp_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: MLlib BucketedRandomProjectionLSH approxNearestNeighbors
    (seeded → deterministic rows) for the vec_id=0 query vector."""
    from ..operators.lsh import brp_ann

    emb = read_table(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    return (
        brp_ann(emb, q, k=10)
        .select("vec_id", F.round(F.col("dist_l2"), 4).alias("dist_l2"))
        .orderBy("dist_l2", "vec_id")
    )


@register("lsh_minhash_neardup_pairs", None)
def lsh_minhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: MLlib MinHashLSH approxSimilarityJoin near-dup pairs (Jaccard
    distance ≤ 0.5 over 3-gram shingle sets), seeded."""
    from ..operators.lsh import minhash_similarity_join

    docs = read_table(spark, sf_dir, "documents")
    return (
        minhash_similarity_join(docs, threshold=0.5)
        .select("id_1", "id_2", F.round(F.col("jaccard_dist"), 4).alias("jaccard_dist"))
        .orderBy("id_1", "id_2")
    )


@register("multimodal_feature_extract", None)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: the mapInPandas binary decode/feature pipeline over synthetic
    media built from document bytes (deterministic fake decoder — real
    codecs are stubbed in this environment)."""
    from ..sources.multimodal import extract_features

    d = read_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return extract_features(media, fake_decode=True).orderBy("media_id")


@register("tfidf_top_terms", None)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: MLlib TF-IDF pipeline (RegexTokenizer → StopWordsRemover →
    CountVectorizer → IDF) + top-3 weighted terms per document for the
    first 50 docs (deterministic — no sampling anywhere)."""
    from ..operators.textml import fit_tfidf, top_terms_per_doc

    d = read_table(spark, sf_dir, "documents")
    model = fit_tfidf(d)
    return (
        top_terms_per_doc(d.filter(F.col("doc_id") < 50), model, k=3)
        .orderBy("doc_id", F.col("tfidf").desc(), "term")
    )
