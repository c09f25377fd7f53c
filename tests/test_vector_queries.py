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


def test_sq8_codes_are_bytes_and_recall_holds(spark, sf_dir):
    """SQ8 codes must be genuine tinyint (1 byte/dim — the 4x scan win is
    real, not cosmetic) and quantized top-10 must recall >= 8 of the exact
    top-10 at dim 64."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.quantize import fit_ranges, sq8_encode, sq8_reconstruct
    from vectordb_hr_data_spark.querydefs.vector_queries import knn_topk_l2sq, knn_topk_sq8

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", dim=64)
    coded = emb.select(sq8_encode("embedding", lo, hi).alias("codes"))
    assert coded.schema["codes"].dataType.simpleString() == "array<tinyint>"

    exact = [r.vec_id for r in knn_topk_l2sq(spark, sf_dir).collect()]
    quant = [r.vec_id for r in knn_topk_sq8(spark, sf_dir).collect()]
    assert len(set(exact) & set(quant)) >= 8

    # reconstruction error is bounded by half a quantization step per dim
    err = (
        emb.select(
            F.aggregate(
                F.zip_with(
                    sq8_reconstruct(sq8_encode("embedding", lo, hi), lo, hi),
                    F.col("embedding"),
                    lambda a, b: F.abs(a - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ).alias("maxerr")
        )
        .agg(F.max("maxerr"))
        .collect()[0][0]
    )
    step = max((h - l) for l, h in zip(lo, hi)) / 255.0
    assert err <= step / 2 + 1e-12


def test_pq_adc_plan_and_recall_floor(spark, sf_dir):
    """PQ-ADC: the distance projection must be pure scalar JVM arithmetic
    (codegen stages present; the only Python node is the one-time encode),
    both phases lower to TakeOrderedAndProject, and the re-ranked result
    keeps a sane recall floor vs exact even with the deterministic toy
    codebook on structure-free synthetic vectors."""
    from vectordb_hr_data_spark.querydefs.vector_queries import (
        knn_pq_adc_rerank,
        knn_topk_l2sq,
    )

    df = knn_pq_adc_rerank(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") == 2
    assert plan.count("ArrowEvalPython") == 1  # encode only; ADC is JVM
    assert "*(" in plan
    exact = {r.vec_id for r in knn_topk_l2sq(spark, sf_dir).collect()}
    pq = {r.vec_id for r in df.collect()}
    assert len(exact & pq) >= 3


def test_residual_ivfadc_beats_flat_pq_recall(spark, sf_dir):
    """The residual form must deliver at least flat-PQ's recall@10 on this
    corpus DESPITE also pruning to n_probe/16 of the cells (the textbook
    IVFADC win: residual distributions are tighter, so the same 8-byte
    budget separates better), and must be deterministic across calls."""
    import vectordb_hr_data_spark.queries as Q

    exact = {r.vec_id for r in Q.REGISTRY["knn_topk_l2sq"].fn(spark, sf_dir).collect()}
    flat = {r.vec_id for r in Q.REGISTRY["knn_pq_adc_rerank"].fn(spark, sf_dir).collect()}
    res1 = [tuple(r) for r in Q.REGISTRY["ivf_pq_residual_rerank"].fn(spark, sf_dir).collect()]
    res2 = [tuple(r) for r in Q.REGISTRY["ivf_pq_residual_rerank"].fn(spark, sf_dir).collect()]
    assert res1 == res2 and len(res1) == 10
    res_ids = {v for v, _ in res1}
    assert len(res_ids & exact) >= len(flat & exact)
