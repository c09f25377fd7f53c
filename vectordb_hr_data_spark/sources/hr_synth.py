"""Deterministic hr_data-shaped corpus generator at arbitrary row counts
(VERDICT r5 #5): the reference ships one 10,084-record JSON file
(``data/hr_data.json`` — 10,000 employees + 84 jobs, reference
``data_loader.py:31-57``); its 8-stage recommend pipeline was parity-tested
only at ~20-row fixture scale. This module synthesizes schema-identical
frames with PURE Spark expressions — no driver-side row lists, no Python
UDFs — so a 100k-row (or 100M-row) corpus costs one ``spark.range`` and
the generation itself never becomes the bottleneck being measured.

Every field cycles deterministically off the row id, covering the
refinement stages the reference branches on: multiple departments
(case-insensitive filter hits a strict subset), keyword-bearing vs
keyword-free project lists, and language sets that pass/fail the
conjunctive language filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEPARTMENTS = ["IT 개발팀", "디자인팀", "운영팀", "데이터팀", "인프라팀"]
POSITIONS = ["시니어 개발자", "주니어 개발자", "데이터 엔지니어", "디자이너"]


def _cycle(col, values: list[str]):
    """values[id % len] as a JVM expression (element_at is 1-based)."""
    return F.element_at(
        F.array(*[F.lit(v) for v in values]), (col % len(values) + 1).cast("int")
    )


def synth_employees(spark: SparkSession, n: int) -> DataFrame:
    """n employees matching EMPLOYEE_SCHEMA's shape (schemas.py), fields
    cycling off the id like the reference's real data distributions:
    ~20 departments → 5 here, keyworded projects on even ids, the
    two-language set on 3 of 4 ids."""
    i = F.col("id")
    return spark.range(n).select(
        F.format_string("EMP%06d", i).alias("id"),
        F.concat(F.lit("직원"), i.cast("string")).alias("name"),
        _cycle(i, POSITIONS).alias("position"),
        _cycle(i, DEPARTMENTS).alias("department"),
        F.lit("2020-01-01").alias("join_date"),
        F.array(F.lit("Python"), F.concat(F.lit("Skill"), (i % 37).cast("string"))).alias(
            "skills"
        ),
        F.when(
            i % 2 == 0,
            F.array(
                F.concat(F.lit("서비스 개발 프로젝트 "), i.cast("string")),
                F.lit("데이터 파이프라인 구축"),
            ),
        )
        .otherwise(F.array(F.lit("사내 포털 운영")))
        .alias("projects"),
        F.struct(
            F.lit("컴퓨터공학 학사").alias("degree"),
            F.lit("한국대학교").alias("school"),
            F.lit(2018).cast("int").alias("graduation_year"),
        ).alias("education"),
        F.array(F.lit("정보처리기사")).alias("certifications"),
        F.when(i % 4 != 1, F.array(F.lit("한국어(원어민)"), F.lit("영어(중급)")))
        .otherwise(F.array(F.lit("한국어(원어민)")))
        .alias("languages"),
        F.concat(F.lit("다양한 웹 서비스 개발 경험 "), (i % 1000).cast("string")).alias(
            "profile_summary"
        ),
    )


def synth_jobs(spark: SparkSession, n: int) -> DataFrame:
    """n job postings matching JOB_SCHEMA (note: education is a STRING
    here — the dual-typed column the tagged union must resolve)."""
    i = F.col("id")
    return spark.range(n).select(
        F.format_string("JOB%05d", i).alias("id"),
        F.concat(F.lit("풀스택 개발자 "), i.cast("string")).alias("title"),
        _cycle(i, DEPARTMENTS).alias("department"),
        F.lit("부산").alias("location"),
        F.lit("정규직").alias("employment_type"),
        F.array(F.lit("TypeScript"), F.lit("Flask")).alias("required_skills"),
        F.array(F.lit("Flutter")).alias("preferred_skills"),
        F.lit("5년 이상").alias("experience_years"),
        F.lit("학사 이상").alias("education"),
        F.when(i % 2 == 0, F.array(F.lit("서비스 개발 업무"), F.lit("배포 자동화")))
        .otherwise(F.array(F.lit("고객 응대")))
        .alias("responsibilities"),
        F.concat(F.lit("IT 개발팀에서 함께할 개발자 "), i.cast("string")).alias("description"),
    )
