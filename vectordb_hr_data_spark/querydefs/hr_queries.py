"""The reference's HR operators re-expressed over the driver testdata so the
DuckDB oracle can check them (SURVEY.md §2.C): tagged union + conditional
projection (A4/A23), count-based freshness (A16/A17), case-insensitive
equality filter (A24), keyword containment scoring (A25/A26), conjunctive
substring filter (A27), over-fetch + multi-key re-rank (A20/A28/A29), and
the doc-text construction expression family (A9/A10).

The HR-shaped fixtures themselves are covered byte-exactly in
tests/test_hr_pipeline.py; these queries prove the same operator shapes on
the shared tables the driver can verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..io import read_table
from ..queries import register


@register(
    "hr_tagged_union_projection",
    """
SELECT CAST(c_custkey AS VARCHAR) AS id, 'customer' AS doc_type,
       c_name AS name_or_title, c_acctbal AS acctbal
FROM customer
UNION ALL
SELECT CAST(s_suppkey AS VARCHAR) AS id, 'supplier' AS doc_type,
       s_name AS name_or_title, s_acctbal AS acctbal
FROM supplier
ORDER BY doc_type, id
""",
)
def hr_tagged_union_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 tagged union + A23 conditional projection: two entity kinds into
    one frame under a doc_type discriminator."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("id"),
        F.lit("customer").alias("doc_type"),
        F.col("c_name").alias("name_or_title"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("id"),
        F.lit("supplier").alias("doc_type"),
        F.col("s_name").alias("name_or_title"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s).orderBy("doc_type", "id")


@register(
    "hr_union_freshness_counts",
    """
WITH u AS (
  SELECT CAST(c_custkey AS VARCHAR) AS id, 'customer' AS doc_type FROM customer
  UNION ALL
  SELECT CAST(s_suppkey AS VARCHAR) AS id, 'supplier' AS doc_type FROM supplier
)
SELECT doc_type, count(*) AS n_rows, count(DISTINCT id) AS n_distinct_ids
FROM u GROUP BY doc_type ORDER BY doc_type
""",
)
def hr_union_freshness_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16/A17: the count + countDistinct pair behind the reference's
    rebuild-iff-count-changed freshness check (vector_db.py:75-103)."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("id"), F.lit("customer").alias("doc_type")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("id"), F.lit("supplier").alias("doc_type")
    )
    return (
        c.unionByName(s)
        .groupBy("doc_type")
        .agg(F.count("*").alias("n_rows"), F.countDistinct("id").alias("n_distinct_ids"))
        .orderBy("doc_type")
    )


@register(
    "hr_dept_filter_ci",
    """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE lower(c_mktsegment) = lower('Building')
ORDER BY c_custkey
""",
)
def hr_dept_filter_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24: case-insensitive equality filter (the department filter,
    talent_recommender.py:98-105)."""
    c = read_table(spark, sf_dir, "customer")
    return (
        c.filter(F.lower(F.col("c_mktsegment")) == "Building".lower())
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


_KEYWORDS = ["spark", "query", "join", "stream"]


@register(
    "hr_keyword_score",
    f"""
SELECT doc_id,
       len(list_filter({_KEYWORDS!r}, kw -> strpos(lower(text), kw) > 0)) AS n_matched,
       CASE WHEN len(list_filter({_KEYWORDS!r}, kw -> strpos(lower(text), kw) > 0)) > 0
            THEN '프로젝트/업무 관련 키워드 ' ||
                 CAST(len(list_filter({_KEYWORDS!r}, kw -> strpos(lower(text), kw) > 0)) AS VARCHAR)
                 || '개 매칭'
            ELSE NULL END AS reasoning
FROM documents
ORDER BY doc_id
""",
)
def hr_keyword_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A25/A26: substring keyword-containment scoring with the reference's
    reasoning string; non-matching rows kept (scoring, not filtering)."""
    d = read_table(spark, sf_dir, "documents")
    n = X.keyword_match_count(F.col("text"), _KEYWORDS)
    return (
        d.select(
            "doc_id",
            n.cast("long").alias("n_matched"),
            F.when(
                n > 0,
                F.concat(F.lit("프로젝트/업무 관련 키워드 "), n.cast("string"), F.lit("개 매칭")),
            ).alias("reasoning"),
        )
        .orderBy("doc_id")
    )


_REQUIRED = ["value", "table"]


@register(
    "hr_lang_all_match",
    f"""
SELECT doc_id, lang
FROM documents
WHERE len(list_filter({_REQUIRED!r}, t -> strpos(lower(text), t) > 0)) = {len(_REQUIRED)}
ORDER BY doc_id
""",
)
def hr_lang_all_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A27: conjunctive (forall) substring containment — the required-
    languages filter shape (talent_recommender.py:123-145)."""
    d = read_table(spark, sf_dir, "documents")
    return d.filter(X.contains_all(F.col("text"), _REQUIRED)).select("doc_id", "lang").orderBy("doc_id")


@register(
    "hr_overfetch_rerank",
    """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.label,
         round(list_sum(list_transform(range(1, len(e.embedding)+1),
               i -> power(CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE), 2))), 4) AS distance
  FROM embeddings e, q
  ORDER BY distance, e.vec_id
  LIMIT 25
)
SELECT vec_id, label, distance
FROM cand
ORDER BY label DESC, distance ASC, vec_id ASC
LIMIT 5
""",
)
def hr_overfetch_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20+A28+A29: two-phase retrieve-then-refine — over-fetch 25 by
    distance, multi-key re-rank (secondary key DESC, distance ASC, id
    tie-break), final limit. The exact shape of the reference's
    reasoning-count re-rank with label standing in for |reasoning|."""
    from ..operators.knn import knn_topk

    emb = read_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    cand = knn_topk(emb, list(row[0]), k=25, id_cols=("vec_id", "label"), round_to=4)
    return (
        cand.orderBy(F.col("label").desc(), F.col("distance").asc(), F.col("vec_id").asc())
        .limit(5)
    )


@register(
    "hr_metadata_flatten",
    """
SELECT doc_id,
       lang AS education_degree,
       substr(text, 1, 10) AS education_school,
       CAST(n_chars AS VARCHAR) AS education_graduation_year,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE array_to_string(string_split(text, ' '), ', ') END AS skills,
       n_chars AS len_chars,
       lang
FROM documents
ORDER BY doc_id
""",
)
def hr_metadata_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A7+A8 through the REAL ``operators.hr.flatten_metadata``
    (reference ``vector_db.py:29-42``): an hr-shaped frame is built from the
    shared ``documents`` table — a struct ``education`` column (flattened to
    prefixed strings incl. ``str(graduation_year)``), an array column with
    NULL rows (", "-joined, NULL preserved), and scalar passthrough — so the
    flatten rules get a full oracle hash check, not just pytest."""
    from ..operators.hr import flatten_metadata

    d = read_table(spark, sf_dir, "documents")
    hr_shaped = d.select(
        "doc_id",
        F.struct(
            F.col("lang").alias("degree"),
            F.substring("text", 1, 10).alias("school"),
            F.col("n_chars").alias("graduation_year"),
        ).alias("education"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("array<string>"))
        .otherwise(F.split(F.col("text"), " "))
        .alias("skills"),
        F.col("n_chars").alias("len_chars"),
        "lang",
    )
    return flatten_metadata(hr_shaped).orderBy("doc_id")


@register(
    "hr_doc_text_construction",
    """
SELECT CAST(c_custkey AS VARCHAR) AS id,
       trim('고객 유형. 이름: ' || coalesce(c_name, '') ||
            '. 세그먼트: ' || coalesce(c_mktsegment, '') ||
            '. 잔액: ' || coalesce(CAST(c_acctbal AS VARCHAR), '') || '.') AS document
FROM customer
ORDER BY id
""",
)
def hr_doc_text_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/A10 expression family: labeled concat with coalesce-to-empty
    missing-field tolerance and final trim — the doc-text template shape
    (embedding_utils.py:45-51) over a shared table."""
    c = read_table(spark, sf_dir, "customer")
    doc = F.trim(
        F.concat(
            F.lit("고객 유형. 이름: "),
            F.coalesce(F.col("c_name"), F.lit("")),
            F.lit(". 세그먼트: "),
            F.coalesce(F.col("c_mktsegment"), F.lit("")),
            F.lit(". 잔액: "),
            F.coalesce(F.col("c_acctbal").cast("string"), F.lit("")),
            F.lit("."),
        )
    )
    return c.select(F.col("c_custkey").cast("string").alias("id"), doc.alias("document")).orderBy("id")


@register("hr_recommend_scale", None)
def hr_recommend_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r5 #5: the reference's COMPOSED 8-stage recommend pipeline
    (load → doc-text → embed → union index → doc_type filter → over-fetch
    kNN → dept/keyword/language refinement → multi-key re-rank; reference
    ``pipeline.recommend`` ≙ ``talent_recommender.py:12-150``) exercised
    at the reference's real corpus SCALE — 10k employees + 84-job-shaped
    postings per reference ``data_loader.py`` — but synthesized with pure
    Spark expressions (``sources.hr_synth``) so row count is a dial, not a
    fixture file. Deterministic end to end (hash embedder), so the
    rows-only check is stable; the 100k-row dim-384 twin with plan
    assertions and the Python-oracle parity lives in
    tests/test_hr_pipeline.py (test_recommend_at_scale_*). ``sf_dir`` only
    scales rows: sf0.01 → 10k (reference-real), sf0.1 → 100k."""
    from ..embed import deterministic_embedder
    from ..pipeline import build_index, recommend
    from ..sources.hr_synth import synth_employees, synth_jobs

    n = 100_000 if sf_dir.rstrip("/").endswith("0.1") else 10_000
    emp = synth_employees(spark, n)
    job = synth_jobs(spark, max(84, n // 120))
    index = build_index(emp, job, embedder=deterministic_embedder(64))
    qvec = [0.0] * 64
    out = recommend(
        index,
        qvec,
        "서비스 개발 데이터 파이프라인",
        num_results=5,
        department_filter="it 개발팀",
        required_languages=["영어"],
        target_doc_type="employee",
    )
    return out.select(
        "id", F.size("reasoning").alias("n_reasons"), F.round("distance", 4).alias("distance")
    )
