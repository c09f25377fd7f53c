"""Rotation / projection ahead of product quantization — the "project
first" escape hatch SCALE.md's tight-manifold bracket prescribes (r6):
when within-cluster structure is low-rank or axis-misaligned, a plain
per-subspace PQ wastes code budget on correlated dims; an orthonormal
transform applied BEFORE the subspace split re-distributes variance so
each subspace carries comparable (and compact) energy.

Three transforms, in increasing training cost:

- ``seeded_rotation`` — a data-independent random orthonormal matrix
  (QR of a seeded Gaussian, entries rounded so the matrix is literally
  re-representable in oracle SQL). Random rotation is the classic
  variance-balancing baseline (it decorrelates subspace energy in
  expectation) and, being deterministic and data-free, it anchors the
  hash-checked registry query ``knn_opq_rotated_adc``.
- ``pca_rotation_fit`` — learned: PCA on a bounded driver-side sample +
  the eigenvalue-allocation heuristic (assign principal directions to
  the m subspaces balancing the per-subspace variance product — the
  OPQ initialization of Ge et al., "Optimized Product Quantization",
  CVPR 2013, also faiss's ``OPQMatrix`` init).
- ``opq_refine`` — optional alternating minimization on the same
  sample: fit per-subspace codebooks under the current rotation, then
  re-solve the rotation as an orthogonal-Procrustes step against the
  quantized reconstruction (Ge et al. §4, "non-parametric" OPQ).

Scale: training state is one dim×dim matrix (384² doubles = 1.2 MB)
learned from a bounded sample — PQ-family training has never needed the
full corpus. Applying the rotation is one GEMM per Arrow batch
(``project_arrow``), the same batch economics as the SQ8/PQ encode
kernels; distances are rotation-invariant so the exact re-rank stage is
untouched.

Determinism contract for the oracle path: ``rotate_fold_arrow`` folds
the matmul LEFT-TO-RIGHT over input dims in float64 — bit-identical to
DuckDB's sequential ``list_sum(list_transform(...))`` — so rotated
values, PQ codes, LUTs, and ADC ranks all reproduce exactly (verified:
DuckDB list_sum is a sequential left-fold; numpy ``dot`` is NOT, hence
the explicit fold). ``project_arrow`` is the fast BLAS twin for paths
that re-rank exactly anyway (ladder, learned variants).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def seeded_rotation(dim: int, seed: int = 7, decimals: int = 9) -> list[list[float]]:
    """Data-independent orthonormal rotation: QR of a seeded Gaussian with
    the sign convention diag(R) > 0 (makes Q unique, hence reproducible
    across numpy versions), entries rounded to ``decimals`` so the SAME
    finite-decimal literals appear in Spark code and oracle SQL. Rounding
    perturbs orthonormality at ~1e-9 — irrelevant for quantization, and
    both engines use the identical rounded matrix so the hash contract
    never sees the perturbation."""
    rng = np.random.RandomState(seed)
    q, r = np.linalg.qr(rng.randn(dim, dim))
    q = q * np.sign(np.diag(r))[None, :]
    return [[float(x) for x in row] for row in np.round(q.T, decimals)]


def rotate_fold_driver(vec, rotation: list[list[float]]) -> list[float]:
    """Driver-side rotate with the oracle's exact left-fold order — for
    query vectors and codebook rows (bounded, k·dim scalars)."""
    v = [float(x) for x in vec]
    out = []
    for row in rotation:
        acc = 0.0
        for t in range(len(v)):
            acc = acc + v[t] * row[t]
        out.append(acc)
    return out


def rotate_fold_arrow(vec_col: str | Column, rotation: list[list[float]]) -> Column:
    """array<double> of the rotated vector, one Arrow pass, accumulating
    LEFT-TO-RIGHT over input dims (``acc = acc + v[t]·R[i,t]`` — per
    output element the same IEEE order as the SQL oracle's list_sum), so
    the rotated corpus is bit-identical to the DuckDB CTE and everything
    downstream (PQ codes, ADC ranks) stays hash-checkable."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    rmat = np.asarray(rotation, dtype=np.float64)  # (dim_out, dim_in)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def rot(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim_in)
        acc = np.zeros((len(mat), rmat.shape[0]), dtype=np.float64)
        for t in range(rmat.shape[1]):
            acc = acc + mat[:, t, None] * rmat[None, :, t]
        return pd.Series(list(acc))

    return rot(v)


def project_arrow(vec_col: str | Column, rotation: list[list[float]]) -> Column:
    """Fast BLAS twin of ``rotate_fold_arrow`` — one ``mat @ R.T`` GEMM per
    Arrow batch. Use wherever bit-parity with the SQL fold is not needed
    (learned rotations are float-reduction-ordered anyway, and the exact
    re-rank runs in the ORIGINAL space, which rotation never touches)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    rmat = np.asarray(rotation, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def proj(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(list(mat @ rmat.T))

    return proj(v)


def _collect_sample(
    df: DataFrame, vec_col: str, id_col: str, sample_n: int
) -> np.ndarray:
    """Deterministic bounded sample: the ``sample_n`` lowest ids — the
    same always-safe collect convention as ``pq_codebook`` (trained state
    is driver scalars; PQ/OPQ training needs ~1e4-1e5 rows regardless of
    corpus size)."""
    rows = (
        df.filter(F.col(id_col) < sample_n)
        .select(vec_col)
        .orderBy(F.col(id_col))
        .collect()
    )
    if not rows:
        raise ValueError("opq: empty training sample")
    return np.asarray([[float(x) for x in r[0]] for r in rows], dtype=np.float64)


def eigenvalue_allocation(eigvals: np.ndarray, eigvecs: np.ndarray, m: int) -> np.ndarray:
    """Order principal directions into m buckets of dim/m each, greedily
    assigning the next-largest eigenvalue to the unfilled bucket with the
    smallest running log-variance product (Ge et al. CVPR'13 §5; faiss
    OPQMatrix init). Returns the (dim × dim) rotation whose row block
    j·sub..(j+1)·sub is bucket j's directions — i.e. subspace j of the
    ROTATED vector sees a balanced share of the spectrum."""
    dim = len(eigvals)
    sub = dim // m
    order = np.argsort(eigvals)[::-1]
    buckets: list[list[int]] = [[] for _ in range(m)]
    logsum = np.zeros(m)
    for idx in order:
        j = min(
            (b for b in range(m) if len(buckets[b]) < sub),
            key=lambda b: (logsum[b], b),
        )
        buckets[j].append(int(idx))
        logsum[j] += float(np.log(max(eigvals[idx], 1e-12)))
    rows = [eigvecs[:, i] for b in buckets for i in b]
    return np.asarray(rows, dtype=np.float64)


def pca_rotation_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    sample_n: int = 20_000,
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Learned OPQ-init rotation: PCA eigenbasis of a bounded sample's
    covariance, permuted by eigenvalue allocation so the m subspaces carry
    balanced variance. One (dim×dim) eigendecomposition on the driver —
    384² covariance is microscopic next to any corpus scan."""
    x = _collect_sample(df, vec_col, id_col, sample_n)
    cov = np.cov(x, rowvar=False)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    rot = eigenvalue_allocation(eigvals, eigvecs, m)
    return [[float(v) for v in row] for row in rot]


def _kmeans_np(x: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Tiny seeded Lloyd's on a driver sample (per-subspace codebook fit
    inside ``opq_refine`` — numpy only, no MLlib round-trips for a
    ≤1e5-row sample). Empty clusters re-seed to the farthest points."""
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    if len(cents) < k:  # degenerate tiny sample: pad with jitter
        pad = cents[rng.randint(0, len(cents), k - len(cents))] + rng.randn(
            k - len(cents), x.shape[1]
        ) * 1e-6
        cents = np.vstack([cents, pad])
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cents[c] = x[mask].mean(axis=0)
            else:
                cents[c] = x[d.min(axis=1).argmax()]
    return cents


def opq_refine(
    df: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    sample_n: int = 20_000,
    id_col: str = "vec_id",
    seed: int = 7,
) -> tuple[list[list[float]], list[list[float]]]:
    """Non-parametric OPQ (Ge et al. §4): alternate (a) per-subspace
    codebook fit under the current rotation with (b) an orthogonal-
    Procrustes re-solve of the rotation against the quantized
    reconstruction. Entirely driver-side numpy on the bounded sample;
    returns ``(rotation, codebook)`` where the codebook rows are full
    rotated-space vectors (the ``pq_codebook`` shape, drop-in for
    ``pq_encode_arrow`` / ``pq_adc_lut`` over the rotated column)."""
    x = _collect_sample(df, vec_col, id_col, sample_n)
    r = np.asarray(rotation, dtype=np.float64)
    sub = dim // m
    cbs: list[np.ndarray] = []
    # The codebooks must be fit under the rotation that is RETURNED: solve
    # the Procrustes rotation only between iterations (never after the
    # final codebook fit), otherwise the returned pair is mismatched — the
    # codebook would correspond to the previous rotation and encoding with
    # the pair silently uses a stale codebook (ADVICE r6).
    for it in range(max(1, iters)):
        xr = x @ r.T
        cbs = [
            _kmeans_np(xr[:, j * sub : (j + 1) * sub], k, seed + j) for j in range(m)
        ]
        if it == max(1, iters) - 1:
            break
        recon = np.empty_like(xr)
        for j in range(m):
            seg = xr[:, j * sub : (j + 1) * sub]
            d = ((seg[:, None, :] - cbs[j][None, :, :]) ** 2).sum(axis=2)
            recon[:, j * sub : (j + 1) * sub] = cbs[j][d.argmin(axis=1)]
        u, _, vt = np.linalg.svd(x.T @ recon)
        r = (u @ vt).T  # argmin_R ||X Rᵀ − X̂||_F over orthogonal R
    codebook = [
        [float(v) for j in range(m) for v in cbs[j][c]] for c in range(len(cbs[0]))
    ]
    return [[float(v) for v in row] for row in r], codebook
