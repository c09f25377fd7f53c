"""OPQ rotation-before-PQ (operators/opq.py, r6): determinism of the
seeded rotation, bit-parity of the left-fold kernels across Spark /
driver / DuckDB, the eigenvalue-allocation balance property, and the
headline recall claim — a learned PCA rotation rescues flat PQ on the
dense-mixing low-rank geometry where axis-aligned subspaces waste their
code budget (the "project first" escape hatch of SCALE.md's
tight-manifold bracket)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_seeded_rotation_is_orthonormal_and_deterministic():
    from vectordb_hr_data_spark.operators.opq import seeded_rotation

    r1 = np.asarray(seeded_rotation(64))
    r2 = np.asarray(seeded_rotation(64))
    assert np.array_equal(r1, r2)  # bit-stable across calls
    err = np.abs(r1 @ r1.T - np.eye(64)).max()
    assert err < 1e-6  # rounded at 9 decimals → orthonormal to ~1e-9·dim


def test_rotation_preserves_l2_distance():
    from vectordb_hr_data_spark.operators.opq import seeded_rotation

    r = np.asarray(seeded_rotation(32))
    rng = np.random.RandomState(3)
    a, b = rng.randn(32), rng.randn(32)
    d_raw = ((a - b) ** 2).sum()
    d_rot = ((r @ a - r @ b) ** 2).sum()
    # entries rounded at 9 decimals → isometry holds to ~1e-8 relative
    assert abs(d_raw - d_rot) < 1e-6 * max(1.0, d_raw)


def test_fold_kernels_bit_match_spark_driver_duckdb(spark):
    """The hash contract's foundation: the Arrow kernel, the driver fold,
    and DuckDB's sequential list_sum produce IDENTICAL doubles (numpy
    ``dot`` does not — pairwise tree summation differs in the last ulp)."""
    import duckdb

    from vectordb_hr_data_spark.operators.opq import (
        rotate_fold_arrow,
        rotate_fold_driver,
        seeded_rotation,
    )

    dim = 16
    rot = seeded_rotation(dim, seed=11)
    rng = np.random.RandomState(5)
    vecs = [[float(x) for x in rng.randn(dim).astype(np.float32)] for _ in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<float>"
    )
    got = {
        r.vec_id: list(r.rot)
        for r in df.select("vec_id", rotate_fold_arrow("embedding", rot).alias("rot")).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == rotate_fold_driver(v, rot)  # exact, not approx

    con = duckdb.connect()
    rm = "[" + ", ".join("[" + ", ".join(repr(x) for x in row) + "]" for row in rot) + "]"
    con.execute("CREATE TABLE t(vec_id INT, embedding FLOAT[])")
    for i, v in enumerate(vecs):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, v])
    rows = con.execute(
        f"""SELECT vec_id, list_transform(range(0, {dim}), i ->
              list_sum(list_transform(range(1, {dim + 1}), t ->
                CAST(embedding[CAST(t AS INT)] AS DOUBLE)
                * ({rm})[CAST(i+1 AS INT)][CAST(t AS INT)]))) FROM t"""
    ).fetchall()
    for vid, rv in rows:
        assert list(rv) == got[vid]
    con.close()


def test_eigenvalue_allocation_balances_products():
    """Ge et al.'s greedy allocation: eigvals (8,4,2,1) into m=2 buckets
    of 2 must land as {8,1} / {4,2} — equal variance products — never the
    naive split {8,4} / {2,1}."""
    from vectordb_hr_data_spark.operators.opq import eigenvalue_allocation

    eigvals = np.array([8.0, 4.0, 2.0, 1.0])
    eigvecs = np.eye(4)
    rot = eigenvalue_allocation(eigvals, eigvecs, m=2)
    # rows are unit basis vectors → recover which eigval went to which bucket
    picked = [int(np.argmax(np.abs(rot[i]))) for i in range(4)]
    prods = [eigvals[picked[0]] * eigvals[picked[1]], eigvals[picked[2]] * eigvals[picked[3]]]
    assert sorted(prods) == [8.0, 8.0]


def _recall_pq(spark, emb, X, codebook, rot, qn=8, k=10):
    """Top-k recall vs exact, running the REGISTRY kernels: (optionally
    rotated) encode → ADC rank → over-fetch 50 → exact re-rank in the
    original space."""
    from vectordb_hr_data_spark.operators.knn import overfetch_count
    from vectordb_hr_data_spark.operators.opq import project_arrow
    from vectordb_hr_data_spark.operators.pq import (
        pq_adc_distance,
        pq_adc_lut,
        pq_encode_arrow,
    )

    dim = X.shape[1]
    m = 8
    exact_d = ((X[None, :, :] - X[:qn, None, :]) ** 2).sum(2)
    exact = [set(np.argsort(exact_d[qi], kind="stable")[:k]) for qi in range(qn)]

    vec_col = (
        project_arrow("embedding", rot).alias("v") if rot is not None else F.col("embedding").alias("v")
    )
    coded = emb.select(
        "vec_id", "embedding", pq_encode_arrow(vec_col, codebook, dim=dim, m=m).alias("pqcodes")
    ).localCheckpoint(eager=True)

    hits = 0
    rmat = np.asarray(rot) if rot is not None else None
    for qi in range(qn):
        q = X[qi] if rmat is None else rmat @ X[qi]
        lut = pq_adc_lut(codebook, [float(x) for x in q], dim=dim, m=m)
        cand = (
            coded.select("vec_id", "embedding", pq_adc_distance("pqcodes", lut).alias("qd"))
            .orderBy(F.col("qd").asc(), F.col("vec_id").asc())
            .limit(overfetch_count(k))
        )
        qlit = F.lit([float(x) for x in X[qi]])
        from vectordb_hr_data_spark.functions import vector as V

        top = (
            cand.select("vec_id", V.l2sq(F.col("embedding"), qlit).alias("d"))
            .orderBy(F.col("d").asc(), F.col("vec_id").asc())
            .limit(k)
            .collect()
        )
        hits += len({r.vec_id for r in top} & exact[qi])
    return hits / (qn * k)


def _fit_codebook_np(Xs: np.ndarray, m: int, k: int, seed: int = 7) -> list[list[float]]:
    """Per-subspace seeded Lloyd's on a sample — the learned-codebook path
    (same fit for raw and rotated spaces so the comparison is fair)."""
    from vectordb_hr_data_spark.operators.opq import _kmeans_np

    dim = Xs.shape[1]
    sub = dim // m
    cbs = [_kmeans_np(Xs[:, j * sub : (j + 1) * sub], k, seed + j) for j in range(m)]
    return [[float(v) for j in range(m) for v in cbs[j][c]] for c in range(k)]


@pytest.fixture(scope="module")
def mixed_lowrank(spark):
    """The geometry where axis-aligned PQ wastes its budget: 4 latent dims
    DENSELY mixed into all 32 ambient dims (every subspace sees correlated
    energy), plus small isotropic noise. PCA compacts the signal into 4
    directions which eigenvalue allocation then spreads one-per-subspace."""
    rng = np.random.RandomState(13)
    n, dim, latent = 1536, 32, 4
    B = rng.randn(latent, dim)  # dense mixing — NOT axis-aligned
    Z = rng.randn(n, latent)
    X = Z @ B + rng.randn(n, dim) * 0.05
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)
    return emb, X


def test_pca_rotation_rescues_flat_pq_on_mixed_lowrank(spark, mixed_lowrank):
    """The headline claim: same learned per-subspace codebooks (k=16),
    same ADC/over-fetch/re-rank path — the eigen-allocated PCA rotation
    must beat the raw axis-aligned split, because post-rotation each
    subspace carries one compact signal direction instead of a dense mix
    of all four."""
    from vectordb_hr_data_spark.operators.opq import pca_rotation_fit

    emb, X = mixed_lowrank
    m, k = 8, 16
    rot = pca_rotation_fit(emb, dim=32, m=m, sample_n=1024)
    rmat = np.asarray(rot)

    cb_raw = _fit_codebook_np(X[:1024], m, k)
    cb_rot = _fit_codebook_np(X[:1024] @ rmat.T, m, k)

    rec_raw = _recall_pq(spark, emb, X, cb_raw, rot=None)
    rec_rot = _recall_pq(spark, emb, X, cb_rot, rot=rot)
    assert rec_rot > rec_raw, f"rotated {rec_rot} vs raw {rec_raw}"
    assert rec_rot >= 0.8, f"rotated recall {rec_rot}"


def test_opq_refine_reduces_sample_quant_error(spark, mixed_lowrank):
    """Non-parametric OPQ (alternating codebook / Procrustes steps) must
    not increase the sample reconstruction error vs the PCA init, and the
    returned rotation must stay orthonormal."""
    from vectordb_hr_data_spark.operators.opq import opq_refine, pca_rotation_fit

    emb, X = mixed_lowrank
    m, k = 8, 16
    rot0 = pca_rotation_fit(emb, dim=32, m=m, sample_n=1024)

    def quant_err(rot, cb):
        rmat = np.asarray(rot)
        cbm = np.asarray(cb)
        xr = X[:1024] @ rmat.T
        sub = 32 // m
        err = 0.0
        for j in range(m):
            seg = xr[:, j * sub : (j + 1) * sub]
            cseg = cbm[:, j * sub : (j + 1) * sub]
            d = ((seg[:, None, :] - cseg[None, :, :]) ** 2).sum(2)
            err += d.min(axis=1).sum()
        return err

    _, cb0 = opq_refine(emb, rot0, dim=32, m=m, k=k, iters=1, sample_n=1024)
    rot5, cb5 = opq_refine(emb, rot0, dim=32, m=m, k=k, iters=5, sample_n=1024)
    r5 = np.asarray(rot5)
    assert np.abs(r5 @ r5.T - np.eye(32)).max() < 1e-8
    assert quant_err(rot5, cb5) <= quant_err(rot0, cb0) * 1.001


def test_opq_refine_returns_consistent_rotation_codebook_pair(spark, mixed_lowrank):
    """Regression (ADVICE r6): the returned codebook must be the one fit
    UNDER the returned rotation — the old loop re-solved the Procrustes
    rotation once more after the final codebook fit, so encoding with the
    returned pair silently used a stale codebook. Refit the per-subspace
    kmeans under the returned rotation with the same seeds: the result
    must be bit-identical to the returned codebook."""
    from vectordb_hr_data_spark.operators.opq import (
        _collect_sample,
        _kmeans_np,
        opq_refine,
        pca_rotation_fit,
    )

    emb, _ = mixed_lowrank
    m, k, seed = 8, 16, 7
    rot0 = pca_rotation_fit(emb, dim=32, m=m, sample_n=1024)
    rot, cb = opq_refine(emb, rot0, dim=32, m=m, k=k, iters=4, sample_n=1024, seed=seed)
    x = _collect_sample(emb, "embedding", "vec_id", 1024)
    xr = x @ np.asarray(rot, dtype=np.float64).T
    sub = 32 // m
    cbm = np.asarray(cb, dtype=np.float64)
    for j in range(m):
        expect = _kmeans_np(xr[:, j * sub : (j + 1) * sub], k, seed + j)
        assert np.array_equal(cbm[:, j * sub : (j + 1) * sub], expect), j
