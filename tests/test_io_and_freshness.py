"""JSON entity source (A1-A3), freshness check (A16-A17), list-input
parsing (A31)."""

from __future__ import annotations

import json


def _write_hr_json(tmp_path, employees, jobs):
    p = tmp_path / "hr_data.json"
    p.write_text(json.dumps({"employees": employees, "job_descriptions": jobs}, ensure_ascii=False))
    return str(p)


def test_read_hr_json_roundtrip(spark, tmp_path):
    from tests.test_hr_pipeline import SAMPLE_EMPLOYEE, SAMPLE_JOB
    from vectordb_hr_data_spark.io import read_hr_json
    from vectordb_hr_data_spark.schemas import EMPLOYEE_SCHEMA, JOB_SCHEMA

    path = _write_hr_json(tmp_path, [SAMPLE_EMPLOYEE], [SAMPLE_JOB])
    emp = read_hr_json(spark, path, "employees", EMPLOYEE_SCHEMA)
    job = read_hr_json(spark, path, "job_descriptions", JOB_SCHEMA)
    erow = emp.collect()[0]
    assert erow["id"] == "EMP00001" and erow["education"]["graduation_year"] == 2018
    assert job.collect()[0]["education"] == "학사 이상"  # scalar, not struct


def test_read_hr_json_missing_key_returns_empty(spark, tmp_path):
    """Missing key / malformed file → empty result, never raise
    (reference data_loader.py:24-49)."""
    from vectordb_hr_data_spark.io import read_hr_json
    from vectordb_hr_data_spark.schemas import EMPLOYEE_SCHEMA

    path = _write_hr_json(tmp_path, [], [])
    assert read_hr_json(spark, path, "employees", EMPLOYEE_SCHEMA).count() == 0

    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert read_hr_json(spark, str(bad), "employees", EMPLOYEE_SCHEMA).count() == 0


def test_freshness_check(spark, tmp_path):
    from tests.test_hr_pipeline import _mk_corpus
    from vectordb_hr_data_spark.pipeline import build_index, needs_rebuild
    from vectordb_hr_data_spark.schemas import EMPLOYEE_SCHEMA, JOB_SCHEMA

    emps, jobs = _mk_corpus()
    emp = spark.createDataFrame(emps, EMPLOYEE_SCHEMA)
    job = spark.createDataFrame(jobs, JOB_SCHEMA)
    out = str(tmp_path / "idx")

    assert needs_rebuild(spark, out, emp, job)  # no index yet
    build_index(emp, job, out_path=out)
    assert not needs_rebuild(spark, out, emp, job)  # counts equal → reuse
    more = spark.createDataFrame(jobs + [dict(jobs[0], id="JOB999")], JOB_SCHEMA)
    assert needs_rebuild(spark, out, emp, more)  # source grew → rebuild


def test_parse_list_input():
    from vectordb_hr_data_spark.functions.text import parse_list_input

    assert parse_list_input("영어, 일본어 , ,중국어") == ["영어", "일본어", "중국어"]
    assert parse_list_input("") == []
