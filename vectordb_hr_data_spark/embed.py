"""Embedding encoders (SURVEY.md A11-A12, B5).

Two encoders behind one interface:

- ``deterministic_embedder`` — seeded hash-based text → float32[dim]
  (per-dimension sha256 of ``text:i`` scaled to [-1, 1], FIXTURES.md §3).
  Used by all tests and oracle-adjacent paths: reproducible everywhere,
  no model download, no nondeterminism across library versions
  (SURVEY.md §7.4 #5).
- ``sentence_transformer_embedder`` — the reference's real model
  (``all-MiniLM-L6-v2``, reference ``config.py:16``) behind an import-try;
  lazily loaded once per executor (the broadcast-once pattern for model
  weights), Arrow-batched.

Both are pandas UDFs: the Spark-idiomatic form of the reference's batched
``model.encode(batch)`` loop (reference ``vector_db.py:145-160``) — batch
size governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` instead
of the reference's hand-rolled 5000-row slicing.
"""

from __future__ import annotations

import hashlib


import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash_vec(text: str, dim: int) -> list[float]:
    """Per-dimension: first 4 bytes of sha256(f"{text}:{i}") as uint32,
    scaled to [-1, 1]. Pure function of the text — rebuilding the index is
    idempotent (the property the reference's freshness check approximates,
    reference ``vector_db.py:85-103``)."""
    # hot loop (dim sha256 calls per ROW): encode the text once, format
    # the suffix as bytes, slice-to-int without struct — byte-identical
    # digests, ~2× less Python overhead (r14 opt; guide §4.2)
    sha = hashlib.sha256
    tb = text.encode("utf-8")
    return [
        (int.from_bytes(sha(tb + b":%d" % i).digest()[:4], "big") / 2147483647.5) - 1.0
        for i in range(dim)
    ]


def deterministic_embedder(dim: int = 64):
    """pandas_udf: pd.Series[str] -> pd.Series[list[float]] (dim-d)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _hash_vec(t if t is not None else "", dim))

    return embed


def sentence_transformer_embedder(model_name: str = "all-MiniLM-L6-v2", encode_fn=None):
    """Real-model encoder (384-dim for the reference model). The model
    loads lazily once per Python worker; raises cleanly if
    sentence-transformers isn't installed (it is not in this container).

    ``encode_fn`` (``list[str] -> sequence of float vectors``) replaces the
    model's ``encode`` when given — the seam the contract test uses to pin
    this UDF's schema, null handling, and Arrow batching to
    ``deterministic_embedder`` without the model present (the same seam a
    GPU-service client would plug into). Everything around the call —
    fillna, float coercion, batch shape — is the code the real model runs
    through."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        fn = encode_fn
        if fn is None:
            try:
                model = globals().get("_ST_MODEL")  # one load per worker
                if model is None:
                    from sentence_transformers import SentenceTransformer

                    model = SentenceTransformer(model_name)
                    globals()["_ST_MODEL"] = model
            except ImportError as e:  # pragma: no cover - not installed here
                raise NotImplementedError(
                    "sentence-transformers is not available in this environment; "
                    "use deterministic_embedder for tests"
                ) from e
            fn = lambda batch: model.encode(batch, convert_to_tensor=False)
        vecs = fn(texts.fillna("").tolist())
        return pd.Series([list(map(float, v)) for v in vecs])

    return embed
