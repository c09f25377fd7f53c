"""Deterministic text hashing primitives with exact Spark/DuckDB parity.

Everything here is pure 64-bit integer arithmetic over code points, so the
Spark expression and the generated DuckDB oracle SQL produce bit-identical
values — no engine-specific hash (murmur/xxhash) is ever exposed to a
correctness check. These primitives back the dedup family (SURVEY.md §2.B:
MinHash-LSH, SimHash, n-gram Jaccard) the way public LLM-corpus pipelines
build them, but as portable SQL integer math.

Core hash: polynomial rolling hash ``acc = (acc*31 + codepoint) % (2^31-1)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 2147483647  # 2^31 - 1
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
# fixed odd multipliers / offsets for the minhash family (a_j * h + b_j) % P
MINHASH_A = [1442695 + 2 * j * 40503 + 1 for j in range(N_HASHES)]
MINHASH_B = [1013904223 + j * 69069 for j in range(N_HASHES)]


# ---------------------------------------------------------------------------
# Spark-side expressions (Spark SQL dialect via F.expr for exact arithmetic)
# ---------------------------------------------------------------------------

def spark_str_hash(col_sql: str) -> str:
    """SQL expr: polynomial hash of a string column/expression."""
    return (
        f"aggregate(transform(sequence(1, length({col_sql})), i -> ascii(substring({col_sql}, i, 1))),"
        f" cast(0 as bigint), (acc, c) -> (acc * 31 + c) % {P})"
    )


def spark_tokens(col_sql: str) -> str:
    return f"split({col_sql}, ' ')"


def spark_shingles(col_sql: str, n: int = 3) -> str:
    """Distinct word n-gram shingles of a space-separated text column."""
    toks = spark_tokens(col_sql)
    return (
        f"array_distinct(transform(sequence(1, greatest(size({toks}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({toks}, i, {n}))))"
    )


def spark_hash_array(arr_sql: str) -> str:
    """Hash every element of a string array."""
    return f"transform({arr_sql}, t -> {spark_str_hash('t')})"


def spark_minhash_sig(hashes_sql: str) -> list[str]:
    """One min-hash expression per hash function."""
    return [
        f"array_min(transform({hashes_sql}, h -> ({a} * h + {b}) % {P}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


def spark_simhash(hashes_sql: str, bits: int = 32) -> str:
    """SimHash over a pre-hashed token array: sign of per-bit vote sums."""
    vote = (
        f"aggregate({hashes_sql}, cast(0 as bigint),"
        f" (acc, h) -> acc + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END)"
    )
    return (
        f"aggregate(transform(sequence(0, {bits - 1}), b -> CASE WHEN {vote} > 0"
        f" THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END),"
        f" cast(0 as bigint), (acc, v) -> acc + v)"
    )


# ---------------------------------------------------------------------------
# DuckDB-side SQL generators (same arithmetic, DuckDB dialect)
# ---------------------------------------------------------------------------

def ddb_str_hash(col_sql: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, len({col_sql})+1),"
        f" i -> CAST(ascii(substr({col_sql}, CAST(i AS INT), 1)) AS BIGINT))),"
        f" (acc, c) -> (acc * 31 + c) % {P})"
    )


def ddb_tokens(col_sql: str) -> str:
    return f"string_split({col_sql}, ' ')"


def ddb_shingles(col_sql: str, n: int = 3) -> str:
    toks = ddb_tokens(col_sql)
    parts = " || ' ' || ".join(f"s[CAST(i AS INT) + {k}]" for k in range(n))
    return (
        f"(SELECT list_distinct(list_transform(range(1, greatest(len(s) - {n - 1}, 1) + 1),"
        f" i -> {parts})) FROM (SELECT {toks} AS s))"
    )


def ddb_hash_array(arr_sql: str) -> str:
    return f"list_transform({arr_sql}, t -> {ddb_str_hash('t')})"


def ddb_minhash_sig(hashes_sql: str) -> list[str]:
    return [
        f"list_min(list_transform({hashes_sql}, h -> ({a} * h + {b}) % {P}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


def ddb_simhash(hashes_sql: str, bits: int = 32) -> str:
    vote = (
        f"list_sum(list_transform({hashes_sql},"
        f" h -> CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END))"
    )
    return (
        f"list_sum(list_transform(range(0, {bits}), b -> CASE WHEN {vote} > 0"
        f" THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END))"
    )


def jaccard_sql_spark(a: str, b: str) -> str:
    """Exact Jaccard of two (distinct-element) arrays, Spark dialect."""
    inter = f"size(array_intersect({a}, {b}))"
    return f"CAST({inter} AS DOUBLE) / (size({a}) + size({b}) - {inter})"


def jaccard_sql_ddb(a: str, b: str) -> str:
    inter = f"len(list_intersect({a}, {b}))"
    return f"CAST({inter} AS DOUBLE) / (len({a}) + len({b}) - {inter})"
