"""Oracle-parity tests for the vector-search query family (SURVEY.md A18-A30)."""

from __future__ import annotations

import pytest

from tests.conftest import assert_matches_oracle

import vectordb_hr_data_spark.queries as Q


ALL_WITH_ORACLE = sorted(n for n, s in Q.REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ALL_WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    spec = Q.REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    assert_matches_oracle(sdf, ddb, spec.oracle)


def test_knn_topk_plan_is_take_ordered(spark, sf_dir):
    """The exact top-k must lower to TakeOrderedAndProject (per-partition
    heaps, no full sort/shuffle) — the plan we want at 100 TB."""
    from vectordb_hr_data_spark.querydefs.vector_queries import knn_topk_l2sq

    plan = knn_topk_l2sq(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_prefilter_pushdown(spark, sf_dir):
    """label=3 must reach the parquet scan as a pushed filter."""
    from vectordb_hr_data_spark.querydefs.vector_queries import knn_topk_prefiltered

    plan = knn_topk_prefiltered(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "label" in plan
