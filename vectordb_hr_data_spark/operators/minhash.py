"""Arrow-vectorized MinHash signatures — the throughput twin of the
expression-form ``functions.texthash.spark_minhash_sig``.

The expression form evaluates N_HASHES interpreted ``array_min(transform(
...))`` folds per row — exact, oracle-portable, and fast enough while the
shingle/explode stages dominate. When corpora grow to the point where the
signature stage itself dominates (hundreds of shingles × 16+ hash
functions per document), this path computes ALL signatures in one numpy
pass per Arrow batch: flatten every row's token-hash array into one
vector, broadcast-multiply by the (N_HASHES,) coefficient columns, and
``np.minimum.reduceat`` the per-row segment minima — no per-row Python,
no per-hash-function expression tree.

Arithmetic parity is EXACT, not approximate: the minhash family is pure
int64 math ((a·h + b) mod P with a·h < 2⁵³ ≪ 2⁶³), so numpy int64
produces bit-identical signatures to the Spark expression and the DuckDB
oracle — pinned by tests/test_similarity_scale.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import texthash as H


def minhash_sig_arrow(hashes_col: str | Column) -> Column:
    """array<bigint> column of the N_HASHES minhash values over a token/
    shingle hash array column. Drop-in for the 16 expression folds:
    ``df.withColumn("sig", minhash_sig_arrow("hashes"))`` equals
    ``F.array(*[F.expr(e) for e in spark_minhash_sig("hashes")])``."""
    A = np.asarray(H.MINHASH_A, dtype=np.int64)[:, None]
    B = np.asarray(H.MINHASH_B, dtype=np.int64)[:, None]

    @F.pandas_udf("array<bigint>")
    def sig(hashes: pd.Series) -> pd.Series:
        arrs = [np.asarray(h, dtype=np.int64) for h in hashes]
        lens = np.asarray([a.size for a in arrs])
        if len(arrs) == 0:
            return pd.Series([], dtype=object)
        if (lens == 0).any():
            # reduceat cannot express empty segments; emit NULL for them
            # (shingle builders guarantee ≥1 element, so this is defensive)
            out = [
                ((A * a[None, :] + B) % H.P).min(axis=1) if a.size else None
                for a in arrs
            ]
            return pd.Series(out)
        flat = np.concatenate(arrs)
        starts = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        vals = (A * flat[None, :] + B) % H.P  # (N_HASHES, total)
        mins = np.minimum.reduceat(vals, starts, axis=1)  # (N_HASHES, rows)
        return pd.Series(list(mins.T))

    return sig(F.col(hashes_col) if isinstance(hashes_col, str) else hashes_col)
