"""Binary sign sketch + Hamming ranking — the rung BELOW product
quantization on the compression ladder: 1 bit/dim (8 B/vector at
dim 64, 48 B at dim 384 — like PQ) but with a phase-1 distance that is
TWO xors + TWO popcounts of machine words, pure JVM integer arithmetic
inside whole-stage codegen. No lookup table, no Arrow boundary, no float
ops in the scan at all — the cheapest possible candidate generator, the
sketch behind SimHash-style retrieval (Charikar STOC'02: sign of random
projections; P[bit differs] = angle/π, so Hamming distance is an
unbiased angular-distance estimator).

The projections are the rows of the SAME seeded orthonormal rotation the
OPQ anchor uses (`operators/opq.seeded_rotation`) — orthogonal
hyperplanes estimate angles with lower variance than i.i.d. Gaussian
ones (the super-bit observation), and reusing the matrix means the
rotated corpus is computed once at build time for both sketches.

Packing: bits 0..31 and 32..63 go into TWO bigint halves (each built
with shifts ≤ 31, so no sign-bit edge cases on either engine) —
``hamming = bit_count(lo⊕qlo) + bit_count(hi⊕qhi)``. Determinism: the
rotated values are bit-identical across Spark/driver/DuckDB (left-fold
contract, operators/opq.py), so every sign bit — and therefore every
signature and Hamming distance — reproduces exactly in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS_PER_HALF = 32


def signature_half(rot_col: str | Column, half: int) -> Column:
    """BIGINT packing sign bits ``half*32 .. half*32+31`` of the rotated
    vector: an unrolled sum of 32 CASE terms — pure JVM, codegen-friendly
    (the same unrolled-literal discipline as ``pq_adc_distance``)."""
    r = F.col(rot_col) if isinstance(rot_col, str) else rot_col
    acc: Column | None = None
    for i in range(BITS_PER_HALF):
        bit = F.when(
            F.element_at(r, half * BITS_PER_HALF + i + 1) >= 0.0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        acc = bit if acc is None else acc + bit
    return acc


def signature_half_driver(rotated_vec, half: int) -> int:
    """Driver-side twin for the query vector's signature."""
    acc = 0
    for i in range(BITS_PER_HALF):
        if float(rotated_vec[half * BITS_PER_HALF + i]) >= 0.0:
            acc += 1 << i
    return acc


def hamming_distance(lo_col: str | Column, hi_col: str | Column, qlo: int, qhi: int) -> Column:
    """xor + popcount per half — two machine-word ops each, the entire
    phase-1 scan cost per row."""
    lo = F.col(lo_col) if isinstance(lo_col, str) else lo_col
    hi = F.col(hi_col) if isinstance(hi_col, str) else hi_col
    return (
        F.bit_count(lo.bitwiseXOR(F.lit(qlo).cast("long")))
        + F.bit_count(hi.bitwiseXOR(F.lit(qhi).cast("long")))
    ).cast("int")


def hamming_distance_n(half_cols: list[Column | str], qsigs: list[int]) -> Column:
    """Arbitrary-width variant for dim > 64 (dim/32 packed halves — 12 at
    dim 384): still one xor + one popcount per machine word."""
    acc: Column | None = None
    for col, q in zip(half_cols, qsigs):
        c = F.col(col) if isinstance(col, str) else col
        term = F.bit_count(c.bitwiseXOR(F.lit(q).cast("long")))
        acc = term if acc is None else acc + term
    return acc.cast("int")
