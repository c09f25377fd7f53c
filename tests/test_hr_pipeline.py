"""Pipeline-fidelity tests on hr_data-shaped fixtures (SURVEY.md §5.2 layer 2):
doc-text byte-equality against the reference templates, metadata-flattening
rules, last-wins upsert, and the full 8-stage query pipeline against a plain
Python oracle implementing the reference semantics
(``talent_recommender.py:12-150``).
"""

from __future__ import annotations

import pytest

from vectordb_hr_data_spark.embed import _hash_vec

# the reference's own smoke fixtures (embedding_utils.py:95-111)
SAMPLE_EMPLOYEE = {
    "id": "EMP00001",
    "name": "홍길동",
    "position": "시니어 개발자",
    "department": "R&D팀",
    "join_date": "2018-03-01",
    "skills": ["Python", "Django", "AWS"],
    "projects": ["신규 서비스 개발", "레거시 시스템 개선"],
    "education": {"degree": "컴퓨터공학 석사", "school": "한국대학교", "graduation_year": 2018},
    "certifications": ["정보처리기사"],
    "languages": ["한국어(원어민)", "영어(업무 가능)"],
    "profile_summary": "다양한 웹 서비스 개발 경험을 가진 개발자입니다.",
}
SAMPLE_JOB = {
    "id": "JOB001",
    "title": "풀스택 개발자",
    "department": "IT 개발팀",
    "location": "부산",
    "employment_type": "프리랜서",
    "required_skills": ["Firebase", "TypeScript", "Flask"],
    "preferred_skills": ["C#", "Flutter"],
    "experience_years": "5년 이상",
    "education": "학사 이상",
    "responsibilities": ["API 개발 아키텍처 분석", "인증 시스템 환경 표준화"],
    "description": "IT 개발팀에서 함께할 5년 이상 풀스택 개발자을(를) 찾고 있습니다.",
}


def ref_employee_text(e: dict) -> str:
    """Reference template, embedding_utils.py:31-52 semantics."""
    edu = e.get("education", {}) or {}
    details = f"{edu.get('degree', '')} {edu.get('school', '')} ({edu.get('graduation_year', 'N/A')})"
    return (
        f"직원 유형. 프로필: {e.get('profile_summary', '')}. "
        f"직무: {e.get('position', '')}. "
        f"부서: {e.get('department', '')}. "
        f"보유 기술: {', '.join(e.get('skills', []) or [])}. "
        f"수행 프로젝트: {'. '.join(e.get('projects', []) or [])}. "
        f"학력: {details}. "
        f"사용 언어: {', '.join(e.get('languages', []) or [])}."
    ).strip()


def ref_job_text(j: dict) -> str:
    """Reference template, embedding_utils.py:54-76 semantics."""
    return (
        f"채용 공고 유형. 공고명: {j.get('title', '')}. "
        f"부서: {j.get('department', '')}. "
        f"근무지: {j.get('location', '')}. "
        f"고용 형태: {j.get('employment_type', '')}. "
        f"필수 기술: {', '.join(j.get('required_skills', []) or [])}. "
        f"우대 기술: {', '.join(j.get('preferred_skills', []) or [])}. "
        f"경력: {j.get('experience_years', '')}. "
        f"학력 조건: {j.get('education', '')}. "
        f"주요 업무: {'. '.join(j.get('responsibilities', []) or [])}. "
        f"상세 설명: {j.get('description', '')}."
    ).strip()


@pytest.fixture(scope="module")
def hr_frames(spark):
    from vectordb_hr_data_spark.schemas import EMPLOYEE_SCHEMA, JOB_SCHEMA

    edge_missing_year = dict(
        SAMPLE_EMPLOYEE,
        id="EMP00002",
        education={"degree": "학사", "school": "부산대학교", "graduation_year": None},
        skills=[],
        projects=[],
        languages=["일본어(초급)"],
    )
    edge_missing_id = dict(SAMPLE_EMPLOYEE, id=None)
    emp = spark.createDataFrame([SAMPLE_EMPLOYEE, edge_missing_year, edge_missing_id], EMPLOYEE_SCHEMA)
    job = spark.createDataFrame([SAMPLE_JOB], JOB_SCHEMA)
    return emp, job


def test_doc_text_byte_exact(spark, hr_frames):
    from vectordb_hr_data_spark.operators.hr import with_employee_document, with_job_document

    emp, job = hr_frames
    got = {r["id"]: r["document"] for r in with_employee_document(emp).collect()}
    assert got["EMP00001"] == ref_employee_text(SAMPLE_EMPLOYEE)
    # missing graduation_year renders as N/A; empty arrays render as ''
    assert "(N/A)" in got["EMP00002"]
    assert "보유 기술: . " in got["EMP00002"]
    jgot = with_job_document(job).collect()[0]["document"]
    assert jgot == ref_job_text(SAMPLE_JOB)


def test_flatten_metadata_rules(spark, hr_frames):
    from vectordb_hr_data_spark.operators.hr import flatten_metadata

    emp, job = hr_frames
    row = {r["id"]: r.asDict() for r in flatten_metadata(emp).collect()}["EMP00001"]
    # struct exploded to prefixed STRING columns (vector_db.py:33-35)
    assert row["education_degree"] == "컴퓨터공학 석사"
    assert row["education_graduation_year"] == "2018"  # str(int)
    # arrays joined with ", " (vector_db.py:36-37)
    assert row["skills"] == "Python, Django, AWS"
    assert row["projects"] == "신규 서비스 개발, 레거시 시스템 개선"
    # job keeps its scalar education untouched
    jrow = flatten_metadata(job).collect()[0].asDict()
    assert jrow["education"] == "학사 이상"
    assert "education_degree" not in jrow


def test_build_index_union_and_validity(spark, hr_frames):
    from vectordb_hr_data_spark.pipeline import build_index

    emp, job = hr_frames
    idx = build_index(emp, job)
    rows = idx.collect()
    # missing-id employee dropped (vector_db.py:119-121): 2 employees + 1 job
    assert len(rows) == 3
    assert {r["doc_type"] for r in rows} == {"employee", "job"}


def test_last_wins_upsert(spark, tmp_path):
    from vectordb_hr_data_spark.io import write_index

    df = spark.createDataFrame(
        [
            ("EMP1", "employee", "old", 1),
            ("EMP1", "employee", "new", 2),
            ("JOB1", "job", "j", 1),
        ],
        "id string, doc_type string, document string, _ingest_order int",
    )
    out = str(tmp_path / "idx")
    write_index(df, out)
    got = {r["id"]: r["document"] for r in spark.read.parquet(out).collect()}
    assert got == {"EMP1": "new", "JOB1": "j"}


# ---------------------------------------------------------------------------
# full 8-stage pipeline vs a Python oracle of the reference semantics
# ---------------------------------------------------------------------------

def _py_oracle(rows, qvec, query, k, dept, langs, target):
    """talent_recommender.py:12-150 re-implemented over candidate dicts."""
    cands = []
    for r in rows:
        if target and r["doc_type"] != target:
            continue
        dist = sum((a - b) ** 2 for a, b in zip(r["embedding"], qvec))
        cands.append(dict(r, distance=dist, reasoning=[]))
    cands.sort(key=lambda c: (c["distance"], c["id"]))
    cands = cands[: (k * 5 if k * 5 > 10 else 20)]
    if dept:
        kept = []
        for c in cands:
            if c["department"].lower() == dept.lower():
                c["reasoning"].append(f"부서 일치: {c['department']}")
                kept.append(c)
        cands = kept
    keywords = [w.strip().lower() for w in query.split() if len(w.strip()) > 2]
    for c in cands:
        text = (
            c["projects"].lower()
            if c["doc_type"] == "employee"
            else (c["responsibilities"] + " " + c["profile_or_description"]).lower()
        )
        n = sum(1 for kw in keywords if kw in text)
        if n > 0:
            c["reasoning"].append(f"프로젝트/업무 관련 키워드 {n}개 매칭")
    if langs:
        kept = []
        for c in cands:
            if c["doc_type"] == "employee":
                joined = c["languages"].lower()
                if all(lg.lower() in joined for lg in langs):
                    c["reasoning"].append(f"요구 언어 충족: {', '.join(langs)}")
                    kept.append(c)
            else:
                kept.append(c)
        cands = kept
    cands.sort(key=lambda c: (-len(c["reasoning"]), c["distance"], c["id"]))
    return [(c["id"], len(c["reasoning"])) for c in cands[:k]]


def _mk_corpus():
    """Deterministic mixed corpus exercising every refinement stage."""
    emps = []
    for i in range(1, 13):
        emps.append(
            dict(
                SAMPLE_EMPLOYEE,
                id=f"EMP{i:05d}",
                department="IT 개발팀" if i % 3 == 0 else "디자인팀",
                projects=[f"서비스 개발 프로젝트 {i}", "데이터 파이프라인 구축"] if i % 2 == 0 else ["사내 포털 운영"],
                languages=["한국어(원어민)", "영어(중급)"] if i % 4 != 1 else ["한국어(원어민)"],
            )
        )
    jobs = [
        dict(
            SAMPLE_JOB,
            id=f"JOB{i:03d}",
            department="IT 개발팀" if i % 2 == 0 else "운영팀",
            responsibilities=["서비스 개발 업무", "배포 자동화"] if i % 2 == 0 else ["고객 응대"],
        )
        for i in range(1, 7)
    ]
    return emps, jobs


@pytest.mark.parametrize(
    "dept,langs,target",
    [
        (None, None, None),
        ("it 개발팀", None, None),
        (None, ["영어"], None),
        ("IT 개발팀", ["영어", "한국어"], "employee"),
        (None, None, "job"),
    ],
)
def test_recommend_matches_reference_semantics(spark, dept, langs, target):
    from vectordb_hr_data_spark.embed import deterministic_embedder
    from vectordb_hr_data_spark.pipeline import build_index, recommend
    from vectordb_hr_data_spark.schemas import EMPLOYEE_SCHEMA, JOB_SCHEMA

    emps, jobs = _mk_corpus()
    emp = spark.createDataFrame(emps, EMPLOYEE_SCHEMA)
    job = spark.createDataFrame(jobs, JOB_SCHEMA)
    dim = 16
    index = build_index(emp, job, embedder=deterministic_embedder(dim)).cache()

    query = "서비스 개발 데이터 파이프라인"
    qvec = _hash_vec(query, dim)
    got = recommend(
        index,
        qvec,
        query,
        num_results=5,
        department_filter=dept,
        required_languages=langs,
        target_doc_type=target,
    ).collect()

    # python oracle over the same materialized candidates
    from vectordb_hr_data_spark.operators.hr import project_candidates

    base = project_candidates(index.withColumn("distance", F_lit0())).drop("distance")
    rows = []
    emb = {r["id"]: r["embedding"] for r in index.select("id", "embedding").collect()}
    for r in base.collect():
        d = r.asDict()
        d["embedding"] = emb[d["id"]]
        rows.append(d)
    want = _py_oracle(rows, qvec, query, 5, dept, langs, target)
    assert [(r["id"], len(r["reasoning"])) for r in got] == want


def F_lit0():
    from pyspark.sql import functions as F

    return F.lit(0.0)


def test_recommend_at_scale_plan_and_parity(spark, tmp_path):
    """VERDICT r5 #5: the composed 8-stage recommend at 100k rows and the
    reference's REAL dim (384, config.py:16) — not the ~20-row fixture.
    Three plan properties a 100 TB run stands on, asserted on the executed
    plan over a PERSISTED index: (a) the doc_type pre-filter becomes
    partition PRUNING on the scan (reference where={'doc_type': ...},
    talent_recommender.py:31-40), (b) the over-fetch top-k is a
    TakeOrderedAndProject (never a full sort), (c) no row-at-a-time
    BatchEvalPython anywhere — the only Python boundary is the Arrow
    scorer. And the ranked output must match the Python reference oracle
    (talent_recommender.py:12-150 semantics) at this scale, numpy-exact."""
    import re

    import numpy as np
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.embed import deterministic_embedder
    from vectordb_hr_data_spark.operators.hr import project_candidates
    from vectordb_hr_data_spark.pipeline import build_index, recommend
    from vectordb_hr_data_spark.sources.hr_synth import synth_employees, synth_jobs

    dim, n_emp, n_job, k = 384, 100_000, 840, 5
    emp = synth_employees(spark, n_emp)
    job = synth_jobs(spark, n_job)
    idx_path = str(tmp_path / "hr_idx_100k")
    build_index(emp, job, embedder=deterministic_embedder(dim), out_path=idx_path)
    index = spark.read.parquet(idx_path)

    query = "서비스 개발 데이터 파이프라인"
    qvec = _hash_vec(query, dim)
    out = recommend(
        index,
        qvec,
        query,
        num_results=k,
        department_filter="it 개발팀",
        required_languages=["영어"],
        target_doc_type="employee",
    )
    got = out.collect()

    plan = out._jdf.queryExecution().executedPlan().toString()
    # (a) doc_type reaches the scan as a partition filter (pruning, not a
    # post-scan Filter over all partitions)
    m = re.search(r"PartitionFilters: \[([^\]]*doc_type[^\]]*)\]", plan)
    assert m and "employee" in m.group(1), f"no doc_type partition pruning:\n{plan[:2000]}"
    # (b) bounded top-k, (c) Arrow-only Python boundary
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan

    # Python oracle at full scale: distances vectorized (numpy), then the
    # reference's exact overfetch -> dept -> keyword -> lang -> re-rank
    emb_pdf = index.filter(F.col("doc_type") == "employee").select("id", "embedding").toPandas()
    E = np.array([list(v) for v in emb_pdf["embedding"]], dtype=np.float64)
    d = ((E - np.asarray(qvec)) ** 2).sum(1)
    order = sorted(range(len(d)), key=lambda i: (d[i], emb_pdf["id"][i]))
    n_fetch = k * 5 if k * 5 > 10 else 20
    cand_ids = [emb_pdf["id"][i] for i in order[:n_fetch]]
    dist_by_id = {emb_pdf["id"][i]: d[i] for i in order[:n_fetch]}

    meta = {
        r["id"]: r.asDict()
        for r in project_candidates(index.withColumn("distance", F.lit(0.0)))
        .filter(F.col("id").isin(cand_ids))
        .collect()
    }
    rows = [dict(meta[i], distance=dist_by_id[i]) for i in cand_ids]
    # reference refinement, reusing the oracle's stage logic
    kept = []
    for c in rows:
        c["reasoning"] = []
        if c["department"].lower() == "it 개발팀":
            c["reasoning"].append(f"부서 일치: {c['department']}")
            kept.append(c)
    keywords = [w.strip().lower() for w in query.split() if len(w.strip()) > 2]
    for c in kept:
        n_kw = sum(1 for kw in keywords if kw in c["projects"].lower())
        if n_kw > 0:
            c["reasoning"].append(f"프로젝트/업무 관련 키워드 {n_kw}개 매칭")
    kept = [
        c
        for c in kept
        if all(lg.lower() in c["languages"].lower() for lg in ["영어"])
        and not c["reasoning"].append("요구 언어 충족: 영어")
    ]
    kept.sort(key=lambda c: (-len(c["reasoning"]), c["distance"], c["id"]))
    want = [(c["id"], len(c["reasoning"])) for c in kept[:k]]
    assert [(r["id"], len(r["reasoning"])) for r in got] == want
    assert len(got) > 0  # the filters must not have emptied the page
