"""Vector math as pure Column expressions (JVM-side, whole-stage codegen).

Distance semantics follow the reference's ChromaDB collection, which uses
the default HNSW space ``l2`` = **squared** Euclidean (no ``hnsw:space``
passed at creation, reference ``vector_db.py:100,107``; SURVEY.md §4.2), and
its rendered "similarity" ``1 - distance`` (reference ``main.py:118``).

All arithmetic is done in DOUBLE after an explicit cast from the stored
float32 so results are bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(c: Column) -> Column:
    return c.cast("double")


def l2sq(a: Column | str, b: Column | str) -> Column:
    """Squared-L2 distance between two array<float|double> columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(a, b, lambda x, y: F.pow(_as_double(x) - _as_double(y), F.lit(2)))
    return F.aggregate(diffs, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y))
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """Euclidean norm of an array column."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + _as_double(v) * _as_double(v))
    return F.sqrt(sq)


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0 when either vector has zero norm."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(d / denom)


def l2sq_arrow(query_vec) -> Column:
    """Arrow-vectorized squared-L2 against a fixed query vector: a
    pandas_udf that stacks each Arrow batch into one numpy matrix and does
    a single vectorized norm — for high dimensions this beats the
    per-element expression form (~10× at dim 384) because the work runs in
    BLAS instead of per-row lambda evaluation. Float64 accumulation, same
    math as ``l2sq`` to ~1 ulp; use the expression form when bit-exact
    oracle parity is required."""
    q = np.asarray(list(query_vec), dtype=np.float64)

    @F.pandas_udf(T.DoubleType())
    def score(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        d = m - q
        return pd.Series(np.einsum("ij,ij->i", d, d))

    return score


def similarity_from_distance(distance: Column | str) -> Column:
    """The reference's rendered score ``1 - distance`` (may go negative;
    reference ``main.py:118-119`` displays it regardless — SURVEY.md §7.4)."""
    c = F.col(distance) if isinstance(distance, str) else distance
    return F.lit(1.0) - c
