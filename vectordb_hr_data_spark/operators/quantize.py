"""Scalar quantization (SQ8) for the embedding index — the FAISS-style
``IndexIVF..,SQ8`` memory/scan trade re-expressed as DataFrame algebra.

A float32 embedding column costs 4 bytes/dim on disk and in shuffle; at
100 TB the index scan is IO-bound, so byte-coding the vectors is a direct
4× scan-time win. SQ8: per-dimension affine quantization into one signed
byte — ``code_i = round((v_i - lo_i) / (hi_i - lo_i) * 255) - 128`` with
the per-dimension [lo, hi] range learned by one corpus aggregate (the
"train" step of faiss.ScalarQuantizer). Reconstruction is the affine
inverse; distances on reconstructed vectors approximate exact distances
with ≲ 1e-2 relative error at dim 64, enough to over-fetch + re-rank
exactly (the same two-phase shape as operators/knn.overfetch).

Everything is deterministic integer/float64 arithmetic (round-half-up on
non-negative values), so the DuckDB oracle reproduces codes bit-exactly —
the quantized kNN query is hash-checked, not just recall-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fit_ranges(vectors: DataFrame, vec_col: str = "embedding", dim: int = 64) -> tuple[list[float], list[float]]:
    """Per-dimension [lo, hi] over the corpus — one aggregate pass emitting
    2·dim scalars to the driver (the always-safe collect: output size is
    O(dim), independent of corpus size). min/max of floats is exact, so
    the oracle recomputes identical ranges."""
    aggs = []
    for i in range(dim):
        e = F.element_at(F.col(vec_col), i + 1).cast("double")
        aggs += [F.min(e).alias(f"lo{i}"), F.max(e).alias(f"hi{i}")]
    row = vectors.agg(*aggs).collect()[0]
    lo = [row[f"lo{i}"] for i in range(dim)]
    hi = [row[f"hi{i}"] for i in range(dim)]
    return lo, hi


def sq8_encode(vec_col: str | Column, lo: list[float], hi: list[float]) -> Column:
    """array<tinyint> of per-dimension affine byte codes (1 byte/dim vs 4
    for float32). Constant dimensions (hi == lo) code to -128. The range
    arrays inline as literals — the broadcast-tiny-table pattern, same as
    IVF centroids."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    lov, hiv = F.lit([float(x) for x in lo]), F.lit([float(x) for x in hi])
    idx = F.sequence(F.lit(1), F.lit(len(lo)))
    code = lambda i: F.when(
        F.element_at(hiv, i) == F.element_at(lov, i), F.lit(0)
    ).otherwise(
        F.round(
            (F.element_at(v, i).cast("double") - F.element_at(lov, i))
            / (F.element_at(hiv, i) - F.element_at(lov, i))
            * 255.0
        ).cast("int")
    )
    return F.transform(idx, lambda i: (code(i) - 128).cast("tinyint"))


def sq8_reconstruct(code_col: str | Column, lo: list[float], hi: list[float]) -> Column:
    """array<double> affine reconstruction ``lo_i + (code_i+128)/255 * span_i``."""
    c = F.col(code_col) if isinstance(code_col, str) else code_col
    lov, hiv = F.lit([float(x) for x in lo]), F.lit([float(x) for x in hi])
    idx = F.sequence(F.lit(1), F.lit(len(lo)))
    return F.transform(
        idx,
        lambda i: F.element_at(lov, i)
        + (F.element_at(c, i).cast("double") + 128.0)
        / 255.0
        * (F.element_at(hiv, i) - F.element_at(lov, i)),
    )
