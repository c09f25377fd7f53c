"""Binary sign-sketch retrieval (operators/bitsketch.py, B30): signature
packing parity between the JVM expression and the driver twin, Hamming
metric invariants, the JVM-only plan property of the phase-1 scan, and a
recall sanity floor on the fixture corpus."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F


def test_signature_jvm_matches_driver(spark):
    from vectordb_hr_data_spark.operators.bitsketch import (
        signature_half,
        signature_half_driver,
    )
    from vectordb_hr_data_spark.operators.opq import (
        rotate_fold_arrow,
        rotate_fold_driver,
        seeded_rotation,
    )

    rot = seeded_rotation(64, seed=7, decimals=9)
    rng = np.random.RandomState(21)
    vecs = [[float(x) for x in rng.randn(64).astype(np.float32)] for _ in range(50)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<float>"
    )
    got = {
        r.vec_id: (r.lo, r.hi)
        for r in df.select(
            "vec_id",
            signature_half(rotate_fold_arrow("embedding", rot), 0).alias("lo"),
            signature_half(rotate_fold_arrow("embedding", rot), 1).alias("hi"),
        ).collect()
    }
    for i, v in enumerate(vecs):
        rv = rotate_fold_driver(v, rot)
        assert got[i] == (signature_half_driver(rv, 0), signature_half_driver(rv, 1))


def test_hamming_invariants(spark):
    """hamming(x, x) = 0; hamming ≤ 64; equals the popcount of the bit
    diff computed in plain Python."""
    from vectordb_hr_data_spark.operators.bitsketch import hamming_distance

    rows = [(0, 0b1010, 0b0110), (1, 0, 0), (2, (1 << 32) - 1, 5)]
    df = spark.createDataFrame(rows, "vec_id int, sig_lo long, sig_hi long")
    qlo, qhi = 0b1010, 0b0110
    got = {
        r.vec_id: r.h
        for r in df.select(
            "vec_id", hamming_distance("sig_lo", "sig_hi", qlo, qhi).alias("h")
        ).collect()
    }
    for vid, lo, hi in rows:
        expect = bin((lo ^ qlo) & ((1 << 64) - 1)).count("1") + bin(
            (hi ^ qhi) & ((1 << 64) - 1)
        ).count("1")
        assert got[vid] == expect
    assert got[0] == 0


def test_bitsketch_phase1_is_jvm_only(spark, sf_dir):
    """The ranking scan must be integer codegen: exactly ONE Arrow node
    (the build-time rotate), and the Hamming expression (xor + bit_count)
    visible in the JVM plan — no per-row Python in the hot path."""
    from vectordb_hr_data_spark.queries import REGISTRY

    df = REGISTRY["knn_bitsketch_hamming_rerank"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan
    assert "bit_count" in plan
    assert "TakeOrderedAndProject" in plan


def test_bitsketch_recall_floor(spark, sf_dir):
    """64 sign bits + 200-wide over-fetch + exact re-rank on the fixture
    corpus: deterministic, so the measured overlap with exact top-10 is a
    stable floor, not a flake. (The sketch is the cheapest candidate
    generator, not a precision index — the floor is intentionally loose.)"""
    from vectordb_hr_data_spark.queries import REGISTRY

    exact = {r.vec_id for r in REGISTRY["knn_topk_l2sq"].fn(spark, sf_dir).collect()}
    got = {r.vec_id for r in REGISTRY["knn_bitsketch_hamming_rerank"].fn(spark, sf_dir).collect()}
    assert len(got & exact) >= 5, f"overlap {len(got & exact)}"
