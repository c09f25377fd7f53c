"""Text column expressions: the reference's document-text construction and
query-refinement scoring primitives, as pure Catalyst expressions.

Templates reproduce the reference byte-for-byte (semantics from
``embedding_utils.py:31-76``): missing scalar fields render as ``''``,
arrays join with ``", "`` (skills/languages) or ``". "`` (projects/
responsibilities), employee education renders as
``"{degree} {school} ({graduation_year})"`` with a missing year shown as
``N/A`` (``embedding_utils.py:43``), and the whole string is ``strip()``-ed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _s(c: Column) -> Column:
    """Missing-field tolerance: the reference's ``dict.get(k, '')``."""
    return F.coalesce(c.cast("string"), F.lit(""))


def _join(c: Column, sep: str) -> Column:
    """``sep.join(list)`` with ``[]``/missing → ``''`` (``vector_db.py:36-37``)."""
    return F.coalesce(F.concat_ws(sep, c), F.lit(""))


def employee_doc_text(
    profile_summary: Column,
    position: Column,
    department: Column,
    skills: Column,
    projects: Column,
    education_degree: Column,
    education_school: Column,
    education_graduation_year: Column,
    languages: Column,
) -> Column:
    """Embedding text for an employee (``embedding_utils.py:31-52``)."""
    education_details = F.concat(
        _s(education_degree),
        F.lit(" "),
        _s(education_school),
        F.lit(" ("),
        F.coalesce(education_graduation_year.cast("string"), F.lit("N/A")),
        F.lit(")"),
    )
    text = F.concat(
        F.lit("직원 유형. 프로필: "), _s(profile_summary),
        F.lit(". 직무: "), _s(position),
        F.lit(". 부서: "), _s(department),
        F.lit(". 보유 기술: "), _join(skills, ", "),
        F.lit(". 수행 프로젝트: "), _join(projects, ". "),
        F.lit(". 학력: "), education_details,
        F.lit(". 사용 언어: "), _join(languages, ", "),
        F.lit("."),
    )
    return F.trim(text)


def job_doc_text(
    title: Column,
    department: Column,
    location: Column,
    employment_type: Column,
    required_skills: Column,
    preferred_skills: Column,
    experience_years: Column,
    education: Column,
    responsibilities: Column,
    description: Column,
) -> Column:
    """Embedding text for a job posting (``embedding_utils.py:54-76``)."""
    text = F.concat(
        F.lit("채용 공고 유형. 공고명: "), _s(title),
        F.lit(". 부서: "), _s(department),
        F.lit(". 근무지: "), _s(location),
        F.lit(". 고용 형태: "), _s(employment_type),
        F.lit(". 필수 기술: "), _join(required_skills, ", "),
        F.lit(". 우대 기술: "), _join(preferred_skills, ", "),
        F.lit(". 경력: "), _s(experience_years),
        F.lit(". 학력 조건: "), _s(education),
        F.lit(". 주요 업무: "), _join(responsibilities, ". "),
        F.lit(". 상세 설명: "), _s(description),
        F.lit("."),
    )
    return F.trim(text)


def query_keywords(query: str) -> list[str]:
    """Reference tokenization (``talent_recommender.py:108``): whitespace
    split, strip, keep tokens longer than 2 chars, lowercase. The query is a
    driver-side scalar, so plain Python is the right altitude."""
    return [t.strip().lower() for t in query.split() if len(t.strip()) > 2]


def keyword_match_count(search_text: Column, keywords: list[str]) -> Column:
    """Count of keywords contained (substring, case-insensitive) in
    ``search_text`` (``talent_recommender.py:110-119``). The keyword list is
    tiny → a literal array, evaluated JVM-side per row with no shuffle."""
    if not keywords:
        return F.lit(0)
    kw_arr = F.array(*[F.lit(k) for k in keywords])
    lowered = F.lower(search_text)
    return F.size(F.filter(kw_arr, lambda kw: F.instr(lowered, kw) > 0))


def parse_list_input(raw: str) -> list[str]:
    """Comma-split of user list input, dropping blanks (reference
    ``main.py:87-88``, SURVEY.md A31) — driver-side scalar parsing."""
    return [p.strip() for p in raw.split(",") if p.strip()]


def contains_all(haystack: Column, needles: list[str]) -> Column:
    """``forall`` substring containment — the reference's conjunctive
    language filter (``talent_recommender.py:123-139``)."""
    if not needles:
        return F.lit(True)
    lowered = F.lower(haystack)
    arr = F.array(*[F.lit(n.lower()) for n in needles])
    return F.forall(arr, lambda n: F.instr(lowered, n) > 0)
