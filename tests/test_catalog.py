"""Collection DDL analogues (SURVEY.md A15): register / query / drop."""

from __future__ import annotations


def test_register_query_drop_index_table(spark, tmp_path):
    from tests.test_hr_pipeline import _mk_corpus
    from vectordb_hr_data_spark.io import drop_index_table, register_index_table
    from vectordb_hr_data_spark.pipeline import build_index
    from vectordb_hr_data_spark.schemas import EMPLOYEE_SCHEMA, JOB_SCHEMA

    emps, jobs = _mk_corpus()
    out = str(tmp_path / "idx")
    build_index(
        spark.createDataFrame(emps, EMPLOYEE_SCHEMA),
        spark.createDataFrame(jobs, JOB_SCHEMA),
        out_path=out,
    )
    register_index_table(spark, "hr_index_v1", out)
    n = spark.sql("SELECT count(*) AS n FROM hr_index_v1 WHERE doc_type = 'employee'").collect()[0]["n"]
    assert n == 12
    assert drop_index_table(spark, "hr_index_v1") is True
    assert drop_index_table(spark, "hr_index_v1") is False  # idempotent delete
