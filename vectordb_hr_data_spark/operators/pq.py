"""Product quantization (PQ) with asymmetric-distance (ADC) lookup — the
compression step past SQ8 (faiss ``PQ8x4``-style): split each dim-64 vector
into m=8 contiguous 8-dim subvectors, quantize every subvector to the id of
its nearest codeword in a per-subspace codebook of k=16 entries, and store
only the m code bytes — 8 bytes/vector vs 64 for SQ8 and 256 for float32.

Query-time ADC: the query is NOT quantized; per subspace a lookup table
LUT[j][c] = ||q_j − codeword_{j,c}||² is computed once (m·k = 128 doubles),
and every stored vector's approximate distance is the sum of m table
lookups — no float math per row at all, which is why PQ scans dominate
billion-scale ANN (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

Determinism contract (what makes the whole thing hash-checkable): the
codebook is the subvectors of the first k corpus vectors (the same
first-k convention as the IVF centroids; production would use per-subspace
k-means, which is a drop-in — only the codebook input changes), encode
ties break toward the LOWEST codeword id, and every distance is an IEEE
left-fold in float64, so the DuckDB oracle reproduces codes, LUTs, and ADC
distances bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

M_SUBSPACES = 8
K_CODEWORDS = 16


def _code_offset(k: int) -> int:
    """Codes are stored as ``array<tinyint>`` (signed int8, 1 B/subspace).
    Up to k=128 the raw codeword id fits; for the faiss-standard 8-bit
    codebook (k=256, the dim-384 production geometry — SCALE.md r5) the
    stored byte is ``code − 128``, the same offset convention SQ8 uses.
    The offset is derived from the codebook length everywhere (encode and
    both decode paths), so callers never pass it and k≤128 codebooks —
    including every hash-checked oracle — are byte-identical to before."""
    if k > 256:
        raise ValueError(f"PQ codebook larger than 256 needs >1 byte/code (got k={k})")
    return 128 if k > 128 else 0


def pq_codebook(
    vectors: DataFrame,
    dim: int = 64,
    m: int = M_SUBSPACES,
    k: int = K_CODEWORDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic codebook: the full vectors of the k lowest ids (one
    driver collect of k rows — the always-safe collect). ``cb[c]`` is the
    c-th codeword's FULL dim-vector; subspace j uses slice
    ``cb[c][j*sub:(j+1)*sub]``."""
    rows = (
        vectors.filter(F.col(id_col) < k)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    if len(rows) != k:
        raise ValueError(f"expected {k} codebook rows, got {len(rows)}")
    return [[float(x) for x in r[1]] for r in rows]


def pq_codebook_kmeans(
    vectors: DataFrame,
    dim: int = 64,
    m: int = M_SUBSPACES,
    k: int = K_CODEWORDS,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """LEARNED per-subspace codebook — the production path the deterministic
    first-k convention stands in for (VERDICT r4 #1): one seeded MLlib
    KMeans fit per subspace over that subspace's ``sub``-dim slices, so
    codewords sit at the actual density centers instead of at arbitrary
    corpus rows. Returns the same ``cb[c] = full dim-vector`` shape as
    ``pq_codebook`` (subspace j reads slice ``cb[c][j*sub:(j+1)*sub]``), so
    every downstream consumer — ``pq_encode_arrow``, ``pq_adc_lut``, the
    residual forms — takes it as a drop-in.

    Scale: training is m bounded map-reduce passes over an (optionally
    sampled) corpus; at 100 TB you fit on a ``sample_fraction`` in the
    low-1e-4 range — k·m codewords are driver scalars either way, and PQ
    training has never needed the full corpus (faiss trains on ~1e5-1e6
    samples regardless of index size). Per-subspace center lists are
    sorted lexicographically before stitching so the (seeded, but
    float-reduction-ordered) KMeans output maps to ONE canonical codebook
    per process — results are deterministic across calls, which the pytest
    pins. Not bit-portable to DuckDB (KMeans reductions), hence the
    consuming registry query is rows-only; the flat deterministic siblings
    keep the hash-checked oracles for the ADC math itself."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sub = dim // m
    if sample_fraction is not None:
        vectors = vectors.sample(fraction=sample_fraction, seed=seed)
    base = vectors.select(F.col(vec_col).cast("array<double>").alias("v")).localCheckpoint(
        eager=True
    )  # one corpus materialization shared by all m fits

    def _fit(j: int) -> list[list[float]]:
        feats = base.select(array_to_vector(F.slice("v", j * sub + 1, sub)).alias("features"))
        model = KMeans(k=k, seed=seed + j, maxIter=max_iter).fit(feats)
        centers = sorted([float(x) for x in c] for c in model.clusterCenters())
        if len(centers) != k:
            # MLlib can collapse to fewer centers on a degenerate /
            # low-cardinality corpus; the stitch below indexes [c] for c in
            # range(k), so fail with a diagnostic instead of an IndexError
            raise ValueError(
                f"pq_codebook_kmeans: subspace {j} trained only "
                f"{len(centers)} distinct centers (need k={k}) — corpus "
                f"slice has too few distinct values; lower k or widen the "
                f"training sample"
            )
        return centers

    # The m fits are independent and each is a chain of tiny jobs dominated
    # by per-job scheduling overhead, not data — submit them concurrently so
    # the scheduler interleaves them (~4× faster wall-clock than sequential;
    # training the 8 subspaces costs one fit's wall time, not eight).
    # materialize_concurrently adds fail-fast sibling cancellation and
    # job-group inheritance (ADVICE r14).
    from .concurrency import materialize_concurrently

    per_sub = materialize_concurrently(
        vectors.sparkSession, *[(lambda j=j: _fit(j)) for j in range(m)]
    )
    return [[x for j in range(m) for x in per_sub[j][c]] for c in range(k)]


def pq_encode_arrow(vec_col: str | Column, codebook: list[list[float]], dim: int = 64, m: int = M_SUBSPACES) -> Column:
    """array<tinyint> of m per-subspace codeword ids, one Arrow pass: for
    each subspace an (n×k) distance matrix via a left-fold over the sub
    dims (IEEE order matches the SQL oracle's ``list_sum(list_transform)``)
    and an argmin whose first-minimum semantics IS the lowest-id tie-break."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    cb = np.asarray(codebook, dtype=np.float64)  # (k, dim)
    sub = dim // m
    off = _code_offset(cb.shape[0])

    @F.pandas_udf(T.ArrayType(T.ByteType()))
    def encode(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        n = len(mat)
        codes = np.empty((n, m), dtype=np.int8)
        for j in range(m):
            lo = j * sub
            # left-fold the squared diffs over the sub dims, codeword-major
            d = np.zeros((n, cb.shape[0]), dtype=np.float64)
            for t in range(sub):
                diff = mat[:, lo + t, None] - cb[None, :, lo + t]
                d = d + diff * diff
            codes[:, j] = (np.argmin(d, axis=1) - off).astype(np.int8)  # first min = lowest c
        return pd.Series(list(codes))

    return encode(v)


def pq_adc_lut(codebook: list[list[float]], query_vec, dim: int = 64, m: int = M_SUBSPACES) -> list[list[float]]:
    """LUT[j][c] = ||q_j − codeword_{j,c}||², computed driver-side with the
    same sequential left-fold the SQL oracle uses, so both engines rank
    candidates on identical doubles."""
    q = [float(x) for x in query_vec]
    sub = dim // m
    lut: list[list[float]] = []
    for j in range(m):
        row = []
        for c in range(len(codebook)):
            acc = 0.0
            for t in range(sub):
                diff = q[j * sub + t] - codebook[c][j * sub + t]
                acc = acc + diff * diff
            row.append(acc)
        lut.append(row)
    return lut


def pq_encode_residual_arrow(
    vec_col: str | Column,
    cid_col: str | Column,
    centroids: dict[int, list[float]],
    codebook: list[list[float]],
    dim: int = 64,
    m: int = M_SUBSPACES,
) -> Column:
    """Residual PQ encode (Jégou et al. IVFADC, the form faiss's IVF,PQ
    actually runs): quantize ``v − centroid(cid)`` instead of ``v`` — the
    residual distribution is tighter than the raw space, so the same code
    budget buys materially better recall. One Arrow pass over
    (vector, cid); first-minimum argmin = lowest-codeword-id tie-break."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    c = F.col(cid_col) if isinstance(cid_col, str) else cid_col
    cids = sorted(centroids)
    cmat = np.asarray([centroids[i] for i in cids], dtype=np.float64)
    cindex = {cid: i for i, cid in enumerate(cids)}
    cb = np.asarray(codebook, dtype=np.float64)
    sub = dim // m
    off = _code_offset(cb.shape[0])

    @F.pandas_udf(T.ArrayType(T.ByteType()))
    def encode(vecs: pd.Series, vcids: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        rows = np.asarray([cindex[int(x)] for x in vcids])
        res = mat - cmat[rows]
        n = len(mat)
        codes = np.empty((n, m), dtype=np.int8)
        for j in range(m):
            lo = j * sub
            d = np.zeros((n, cb.shape[0]), dtype=np.float64)
            for t in range(sub):
                diff = res[:, lo + t, None] - cb[None, :, lo + t]
                d = d + diff * diff
            codes[:, j] = (np.argmin(d, axis=1) - off).astype(np.int8)
        return pd.Series(list(codes))

    return encode(v, c)


def pq_residual_qdist_arrow(
    codes_col: str | Column,
    cid_col: str | Column,
    centroids: dict[int, list[float]],
    codebook: list[list[float]],
    query_vec,
    dim: int = 64,
    m: int = M_SUBSPACES,
) -> Column:
    """Residual-ADC distance: per probed centroid a LUT over the QUERY'S
    residual ``q − centroid(cid)`` (one 8×16 table per probed cid, built
    once per batch), per row m lookups into its cid's table. The per-cid
    tables are the only difference from flat ADC — state is
    n_probe·m·k doubles, still trivially broadcastable."""
    ccodes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    c = F.col(cid_col) if isinstance(cid_col, str) else cid_col
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    cb = np.asarray(codebook, dtype=np.float64)
    sub = dim // m
    luts = {}
    for cid, cvec in centroids.items():
        qr = q - np.asarray(cvec, dtype=np.float64)
        t = np.empty((m, cb.shape[0]), dtype=np.float64)
        for j in range(m):
            lo = j * sub
            d = np.zeros(cb.shape[0], dtype=np.float64)
            for s in range(sub):
                diff = qr[lo + s] - cb[:, lo + s]
                d = d + diff * diff
            t[j] = d
        luts[cid] = t

    @F.pandas_udf(T.DoubleType())
    def qdist(codes: pd.Series, vcids: pd.Series) -> pd.Series:
        cmat = np.stack(codes.to_numpy()).astype(np.int64) + _code_offset(cb.shape[0])
        # +inf, not empty: a row whose cid has no LUT (caller passed rows
        # outside the probed set) must sort last, never rank as a candidate.
        out = np.full(len(cmat), np.inf, dtype=np.float64)
        for cid, t in luts.items():
            mask = (vcids == cid).to_numpy()
            if mask.any():
                sel = cmat[mask]
                # sequential left-fold over the m subspaces (NOT .sum(axis=1),
                # whose pairwise-tree order differs in the last ulp) — the
                # same IEEE order as the oracle's list_sum, so the det twin
                # is hash-checkable
                acc = t[0, sel[:, 0]]
                for j in range(1, m):
                    acc = acc + t[j, sel[:, j]]
                out[mask] = acc
        return pd.Series(out)

    return qdist(ccodes, c)


def pq_adc_distance(codes_col: str | Column, lut: list[list[float]], m: int = M_SUBSPACES) -> Column:
    """Approximate distance as m scalar table lookups — an unrolled sum of
    ``element_at(LUT_j, code_j + 1)`` terms over small (k-entry) literal
    arrays: pure JVM arithmetic inside whole-stage codegen, zero float ops
    per row beyond the m adds."""
    c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    off = _code_offset(len(lut[0]))
    dist: Column | None = None
    for j in range(m):
        term = F.element_at(F.lit(lut[j]), F.element_at(c, j + 1).cast("int") + (off + 1))
        dist = term if dist is None else dist + term
    return dist
