"""Parquet compression/encoding study for the index tables (SCALE.md).

Writes the embeddings + documents tables with snappy vs zstd (and zstd
level 9), measures on-disk size and cold full-scan aggregate time. The
decision this informs at 100 TB: the embedding index is scan-bound, so
bytes-on-disk ≈ scan seconds; documents (text) compress far better than
float arrays, so the win is column-dependent, not table-uniform.

Usage: python tools/compression_study.py [sf_dir] [out_dir]
Prints a markdown table.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/compression_study"
    shutil.rmtree(out, ignore_errors=True)

    spark = get_spark("compression-study", cpus=16)

    # Byte-coded index payloads (NEXT: "ZSTD vs Snappy for the byte-coded
    # index"): SQ8 codes (1 B/dim, near-uniform bytes) and PQ codes
    # (m bytes/vector, codeword-id distribution) — the columns a 100 TB
    # quantized index actually scans.
    from vectordb_hr_data_spark.operators.pq import pq_codebook, pq_encode_arrow
    from vectordb_hr_data_spark.operators.quantize import fit_ranges, sq8_encode_arrow

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    cb = pq_codebook(emb)
    sq8_codes = emb.select("vec_id", sq8_encode_arrow("embedding", lo, hi).alias("codes"))
    pq_codes = emb.select("vec_id", pq_encode_arrow("embedding", cb).alias("codes"))

    cases = []
    for table, src, agg in (
        ("embeddings", None, lambda df: df.select(F.sum(F.element_at("embedding", 1))).collect()),
        ("documents", None, lambda df: df.select(F.sum(F.length("text"))).collect()),
        ("sq8-codes", sq8_codes, lambda df: df.select(F.sum(F.element_at("codes", 1).cast("long"))).collect()),
        ("pq-codes", pq_codes, lambda df: df.select(F.sum(F.element_at("codes", 1).cast("long"))).collect()),
    ):
        if src is None:
            src = read_table(spark, sf_dir, table)
        src.cache().count()
        for codec, level in (("snappy", None), ("zstd", None), ("zstd", 9)):
            name = codec + (f"-{level}" if level else "")
            path = f"{out}/{table}_{name}"
            w = src.write.mode("overwrite").option("compression", codec)
            if level:
                w = w.option("parquet.compression.codec.zstd.level", str(level))
            w.parquet(path)
            # cold-ish scan: new reader over the files, aggregate everything
            t0 = time.monotonic()
            agg(spark.read.parquet(path))
            dt = time.monotonic() - t0
            cases.append((table, name, du(path), dt))
        src.unpersist()

    print("| table | codec | bytes | vs snappy | full-scan s |")
    print("|---|---|---|---|---|")
    base = {t: b for t, n, b, _ in cases if n == "snappy"}
    for t, n, b, dt in cases:
        print(f"| {t} | {n} | {b:,} | {b / base[t]:.2f}x | {dt:.2f} |")
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
