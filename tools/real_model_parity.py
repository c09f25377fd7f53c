"""Real-model parity harness (optional; guards the embedder swap-in).

The repo's correctness surface runs on ``deterministic_embedder`` — fully
reproducible, oracle-checkable, no model download. Production swaps in
``sentence_transformer_embedder`` (the reference model all-MiniLM-L6-v2,
reference config.py:16). This job validates that swap on an environment
where sentence-transformers IS installed (it is not in the build sandbox):

1. contract — the real UDF returns the same Spark schema
   (array<float>), same row count, no NULL vectors, fixed dim (384);
2. determinism — two runs over the same corpus produce identical top-k
   neighbour rankings (model inference is deterministic on CPU);
3. pipeline — doc-text construction → embed → cosine top-k runs end to
   end on the HR fixture tables, and per-query top-k ids are reported
   next to the hash embedder's, with their rank overlap. The overlap is
   REPORTED, not asserted: the hash embedder is a content-hash stand-in,
   not a semantic model — the contract is plumbing-equivalence, and
   semantic result quality belongs to the model, not the engine.

Usage:  python tools/real_model_parity.py [sf_dir]
Exits 0 with "SKIP" when sentence-transformers is unavailable, non-zero on
any contract violation when it is.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        print("SKIP: sentence-transformers not installed; nothing to validate")
        return 0

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.embed import (
        deterministic_embedder,
        sentence_transformer_embedder,
    )
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("real-model-parity", cpus=8)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)

    real = docs.withColumn("emb", sentence_transformer_embedder()(F.col("text")))
    det = docs.withColumn("emb", deterministic_embedder(dim=384)(F.col("text")))

    # 1. contract: schema, counts, no NULLs, fixed dim
    assert real.schema["emb"].dataType.simpleString() == det.schema["emb"].dataType.simpleString(), "schema drift"
    r = real.select(
        F.count("*").alias("n"),
        F.count(F.when(F.col("emb").isNull(), 1)).alias("nulls"),
        F.countDistinct(F.size("emb")).alias("dims"),
        F.first(F.size("emb")).alias("dim"),
    ).collect()[0]
    assert r.nulls == 0, f"{r.nulls} NULL vectors"
    assert r.dims == 1 and r.dim == 384, f"ragged/unexpected dim: {r.dim} ({r.dims} distinct)"
    print(f"contract ok: {r.n} rows, dim={r.dim}, no NULLs")

    # 2. determinism: identical top-k across two independent runs
    def topk(df, k=10):
        q = df.limit(1).select("emb").collect()[0].emb
        dot = F.aggregate(
            F.zip_with("emb", F.lit([float(x) for x in q]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return [
            row.doc_id
            for row in df.select("doc_id", dot.alias("s"))
            .orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(k)
            .collect()
        ]

    run1, run2 = topk(real), topk(real)
    assert run1 == run2, f"nondeterministic top-k: {run1} vs {run2}"
    print(f"determinism ok: top-10 stable ({run1[:3]}...)")

    # 3. report rank overlap vs the hash embedder (informational)
    overlap = len(set(run1) & set(topk(det))) / 10.0
    print(f"rank overlap with hash embedder (informational): {overlap:.0%}")
    spark.stop()
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
