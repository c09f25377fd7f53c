"""The reference's HR pipeline operators as DataFrame -> DataFrame
functions (SURVEY.md §2.A): tagged union, validity filter, metadata
flattening, document-text construction, and the 8-stage query-refinement
pipeline (§3.3).

Every function cites the reference behavior it reproduces; all logic is
pure Catalyst expressions — the only Python-boundary step in the whole HR
path is the embedding UDF (embed.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


# --------------------------------------------------------------------------
# A4 tagged union + A5 validity filter
# --------------------------------------------------------------------------

def tagged_union(employees: DataFrame, jobs: DataFrame) -> DataFrame:
    """Union both entity kinds under a ``doc_type`` discriminator
    (reference ``vector_db.py:56-60``); allowMissingColumns models the
    differing field sets (and the dual-typed ``education`` must be
    flattened *before* this union — see ``flatten_metadata``)."""
    e = employees.withColumn("doc_type", F.lit("employee"))
    j = jobs.withColumn("doc_type", F.lit("job"))
    return e.unionByName(j, allowMissingColumns=True)


def validity_filter(df: DataFrame, doc_col: str = "document") -> DataFrame:
    """Drop rows without an id and rows whose embed-text is empty
    (reference ``vector_db.py:119-121,129-131``)."""
    return df.filter(F.col("id").isNotNull() & (F.length(F.coalesce(F.col(doc_col), F.lit(""))) > 0))


# --------------------------------------------------------------------------
# A6-A8 metadata flattening (reference _process_metadata_for_db,
# vector_db.py:29-42): struct education → education_<k> strings; arrays →
# ", "-joined strings ([] → ""); scalars pass through.
# --------------------------------------------------------------------------

def flatten_metadata(df: DataFrame) -> DataFrame:
    from pyspark.sql import types as T

    cols: list[Column] = []
    for field in df.schema.fields:
        name, dtype = field.name, field.dataType
        if name == "education" and isinstance(dtype, T.StructType):
            for sub in dtype.fields:
                cols.append(F.col(f"education.{sub.name}").cast("string").alias(f"education_{sub.name}"))
        elif isinstance(dtype, T.ArrayType):
            cols.append(
                F.when(F.col(name).isNull(), F.lit(None).cast("string"))
                .otherwise(F.concat_ws(", ", F.col(name).cast("array<string>")))
                .alias(name)
            )
        elif isinstance(dtype, (T.StringType, T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.BooleanType)):
            cols.append(F.col(name))
        else:
            cols.append(F.col(name).cast("string").alias(name))
    return df.select(*cols)


# --------------------------------------------------------------------------
# A9/A10 document text (templates in functions/text.py)
# --------------------------------------------------------------------------

def with_employee_document(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "document",
        X.employee_doc_text(
            F.col("profile_summary"),
            F.col("position"),
            F.col("department"),
            F.col("skills"),
            F.col("projects"),
            F.col("education.degree"),
            F.col("education.school"),
            F.col("education.graduation_year"),
            F.col("languages"),
        ),
    )


def with_job_document(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "document",
        X.job_doc_text(
            F.col("title"),
            F.col("department"),
            F.col("location"),
            F.col("employment_type"),
            F.col("required_skills"),
            F.col("preferred_skills"),
            F.col("experience_years"),
            F.col("education"),
            F.col("responsibilities"),
            F.col("description"),
        ),
    )


# --------------------------------------------------------------------------
# A23 conditional candidate projection (talent_recommender.py:61-94)
# --------------------------------------------------------------------------

def project_candidates(scored: DataFrame) -> DataFrame:
    """Shape scored index rows into the reference's candidate schema. The
    flattened metadata columns are already ", "-joined strings."""
    is_emp = F.col("doc_type") == "employee"
    na = F.lit("N/A")
    return scored.select(
        "id",
        "doc_type",
        "distance",
        F.array().cast("array<string>").alias("reasoning"),
        F.when(is_emp, F.col("name")).otherwise(F.coalesce(F.col("title"), na)).alias("name_or_title"),
        F.coalesce(F.col("department"), na).alias("department"),
        F.when(is_emp, F.col("profile_summary")).otherwise(F.coalesce(F.col("description"), na)).alias(
            "profile_or_description"
        ),
        F.when(is_emp, F.col("skills")).otherwise(F.coalesce(F.col("required_skills"), na)).alias("skills_info"),
        # employee extras (null for jobs, as the reference omits the keys)
        F.when(is_emp, F.coalesce(F.col("position"), na)).alias("position"),
        F.when(is_emp, F.coalesce(F.col("projects"), F.lit(""))).alias("projects"),
        F.when(is_emp, F.coalesce(F.col("languages"), F.lit(""))).alias("languages"),
        # job extras
        F.when(~is_emp, F.coalesce(F.col("location"), na)).alias("location"),
        F.when(~is_emp, F.coalesce(F.col("employment_type"), na)).alias("employment_type"),
        F.when(~is_emp, F.coalesce(F.col("experience_years"), na)).alias("experience_years"),
        F.when(~is_emp, F.coalesce(F.col("responsibilities"), F.lit(""))).alias("responsibilities"),
    )


# --------------------------------------------------------------------------
# A24-A29 refinement stages (talent_recommender.py:96-150)
# --------------------------------------------------------------------------

def _append_reason(reasoning: Column, reason: Column) -> Column:
    return F.concat(reasoning, F.array(reason))


def department_filter(df: DataFrame, department: str) -> DataFrame:
    """Case-insensitive equality filter; matches gain the reasoning tag
    ``부서 일치: <dept>`` (talent_recommender.py:98-105)."""
    kept = df.filter(F.lower(F.col("department")) == department.lower())
    return kept.withColumn(
        "reasoning",
        _append_reason(F.col("reasoning"), F.concat(F.lit("부서 일치: "), F.col("department"))),
    )


def keyword_score(df: DataFrame, query: str) -> DataFrame:
    """Count query-keyword substring hits in projects (employee) or
    responsibilities + ' ' + description (job); >0 hits append
    ``프로젝트/업무 관련 키워드 N개 매칭`` (talent_recommender.py:107-119).
    Non-matching rows are kept — scoring, not filtering."""
    keywords = X.query_keywords(query)
    if not keywords:
        return df
    search_text = F.when(
        F.col("doc_type") == "employee", F.coalesce(F.col("projects"), F.lit(""))
    ).otherwise(
        F.concat_ws(" ", F.coalesce(F.col("responsibilities"), F.lit("")), F.coalesce(F.col("profile_or_description"), F.lit("")))
    )
    n = X.keyword_match_count(search_text, keywords)
    return df.withColumn(
        "reasoning",
        F.when(
            n > 0,
            _append_reason(
                F.col("reasoning"),
                F.concat(F.lit("프로젝트/업무 관련 키워드 "), n.cast("string"), F.lit("개 매칭")),
            ),
        ).otherwise(F.col("reasoning")),
    )


def language_filter(df: DataFrame, required_languages: list[str]) -> DataFrame:
    """Employees must contain EVERY required language as a substring of the
    joined languages string or be dropped (reasoning ``요구 언어 충족: …``);
    jobs pass untouched (talent_recommender.py:122-145)."""
    if not required_languages:
        return df
    is_emp = F.col("doc_type") == "employee"
    all_met = X.contains_all(F.coalesce(F.col("languages"), F.lit("")), required_languages)
    kept = df.filter(~is_emp | all_met)
    return kept.withColumn(
        "reasoning",
        F.when(
            is_emp,
            _append_reason(
                F.col("reasoning"),
                F.lit("요구 언어 충족: " + ", ".join(required_languages)),
            ),
        ).otherwise(F.col("reasoning")),
    )


def rerank(df: DataFrame, k: int) -> DataFrame:
    """Order by (reasoning count DESC, distance ASC) then limit k
    (talent_recommender.py:148-150); the id tie-break makes the Python
    stable-sort determinism explicit (SURVEY.md §7.4 #4). Catalyst lowers
    sort+limit to TakeOrderedAndProject — no global sort materializes."""
    return df.orderBy(
        F.size("reasoning").desc(), F.col("distance").asc(), F.col("id").asc()
    ).limit(k)
