"""End-to-end compositions of the reference's two pipelines (SURVEY.md §3).

``build_index``  = §3.2: entities → tagged union → validity filter →
metadata flatten → doc-text → embed → (optional) partitioned parquet sink.

``recommend``    = §3.3: the 8-stage query pipeline — score → over-fetch →
project → [department filter] → keyword scoring → [language filter] →
re-rank → limit. One lazy DataFrame; Catalyst fuses the filters into the
scan and serves the top-k with TakeOrderedAndProject.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import vector as V
from .operators import hr
from .operators.knn import overfetch_count


def build_index(
    employees: DataFrame,
    jobs: DataFrame,
    embedder=None,
    out_path: str | None = None,
) -> DataFrame:
    """Unified embedding index (reference ``setup_chromadb_collection``,
    ``vector_db.py:44-181``). Flattening happens per-entity BEFORE the
    union so the dual-typed ``education`` resolves to per-entity columns
    (employees: education_* strings; jobs: scalar education)."""
    e = hr.flatten_metadata(hr.with_employee_document(employees))
    j = hr.flatten_metadata(hr.with_job_document(jobs))
    unified = hr.validity_filter(hr.tagged_union(e, j))
    if embedder is not None:
        unified = unified.withColumn("embedding", embedder(F.col("document")))
    if out_path is not None:
        from .io import write_index

        write_index(unified, out_path)
    return unified


def needs_rebuild(spark, index_path: str, employees: DataFrame, jobs: DataFrame) -> bool:
    """The reference's freshness check (``vector_db.py:75-103``): rebuild
    iff the stored row count differs from the distinct source-id count
    (reference explicitly simplifies to count-compare, no id-set diff).
    A missing/unreadable index always rebuilds."""
    from pyspark.sql import functions as F

    try:
        stored = spark.read.parquet(index_path).count()
    except Exception:
        return True
    src_ids = (
        employees.select("id").unionByName(jobs.select("id")).filter(F.col("id").isNotNull())
    )
    return stored != src_ids.distinct().count()


def score_index(index: DataFrame, query_vec: Sequence[float], arrow: bool | None = None) -> DataFrame:
    """Distance column over the index. High dimensions (≥128) default to
    the Arrow/numpy scorer (~10× the expression form at dim 384); low
    dimensions stay JVM-side where the Python boundary isn't worth it."""
    if arrow is None:
        arrow = len(list(query_vec)) >= 128
    if arrow:
        return index.withColumn("distance", V.l2sq_arrow(query_vec)(F.col("embedding")))
    q = F.lit([float(x) for x in query_vec])  # single array literal: ~4x faster to analyze/codegen than a wide F.array(...) tree
    return index.withColumn("distance", V.l2sq(F.col("embedding"), q))


def recommend(
    index: DataFrame,
    query_vec: Sequence[float],
    query_text: str,
    num_results: int = 5,
    department_filter: str | None = None,
    required_languages: list[str] | None = None,
    target_doc_type: str | None = None,
) -> DataFrame:
    """The reference's ``recommend_talent_from_db``
    (``talent_recommender.py:12-150``) as one declarative plan."""
    df = index
    if target_doc_type in ("employee", "job"):
        # A21: pushed below scoring → partition pruning on doc_type
        df = df.filter(F.col("doc_type") == target_doc_type)

    scored = score_index(df, query_vec)
    # A20: two-phase over-fetch before refinement
    cand = scored.orderBy(F.col("distance").asc(), F.col("id").asc()).limit(
        overfetch_count(num_results)
    )
    cand = hr.project_candidates(cand)

    if department_filter:
        cand = hr.department_filter(cand, department_filter)
    cand = hr.keyword_score(cand, query_text)
    if required_languages:
        cand = hr.language_filter(cand, required_languages)

    out = hr.rerank(cand, num_results)
    # A30: rendered similarity (may go negative, reference main.py:118)
    return out.withColumn("similarity", F.lit(1.0) - F.col("distance"))
