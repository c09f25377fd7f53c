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


def spark_str_hash_fast(col_sql: str) -> str:
    """SQL expr: first 8 hex chars of md5 as a bigint — same value as
    DuckDB's hex cast and Python's ``int(md5(t)[:8], 16)``. Fully native
    (codegen'd md5 + conv) vs the interpreted per-char lambda above; use
    this for hot paths (minhash/simhash), the polynomial form for the
    rolling-hash operator itself."""
    return f"cast(conv(substring(md5({col_sql}), 1, 8), 16, 10) as bigint)"


def spark_tokens(col_sql: str) -> str:
    return f"split({col_sql}, ' ')"


def spark_shingles(tok_col: str, n: int = 3) -> str:
    """Distinct word n-gram shingles over a MATERIALIZED token-array column.

    ``tok_col`` must be a plain column reference (evaluate ``split`` into a
    column first): a bound attribute is computed once per row, while
    embedding the split expression here would re-evaluate it per lambda
    element. Indexed ``try_element_at`` is O(1) per token; the earlier
    ``slice``-per-position form was O(len²) per document (measured 3×
    slower at sf0.1).

    Documents with < n tokens emit their whole text as the single shingle
    — an explicit CASE mirrored in ``ddb_shingles``, because the engines'
    NULL-concat semantics diverge (Spark concat_ws skips NULLs, DuckDB
    ``||`` nulls the shingle) and must never be reached (ADVICE r01)."""
    parts = ", ".join(f"try_element_at({tok_col}, i + {k})" for k in range(n))
    return (
        f"CASE WHEN size({tok_col}) >= {n} THEN"
        f" array_distinct(transform(sequence(1, size({tok_col}) - {n - 1}),"
        f" i -> concat_ws(' ', {parts})))"
        f" ELSE array(concat_ws(' ', {tok_col})) END"
    )


def spark_shingle_keys(th_col: str, n: int) -> str:
    """Distinct word n-gram shingle KEYS as bigints over a MATERIALIZED
    token-hash array column (``spark_hash_array`` of the tokens, evaluated
    into its own column first — the same bound-attribute discipline as
    ``spark_shingles``): fold n consecutive token hashes with the 31-poly
    combine ``acc = (acc*31 + h) % P``. Equality-only shingling for
    join-heavy ops (decontamination): building no strings is ~10× cheaper
    than ``spark_shingles`` and the join key is 8 bytes instead of a
    ~50-char string. Max intermediate is P·31 + 2³² < 2³⁷ — safely int64.
    Documents with < n tokens fold ALL their token hashes into one key
    (same short-document CASE discipline as ``spark_shingles``)."""
    fold = f"try_element_at({th_col}, i + 0)"
    for k in range(1, n):
        fold = f"(({fold}) * 31 + try_element_at({th_col}, i + {k})) % {P}"
    whole = f"aggregate({th_col}, cast(0 as bigint), (acc, h) -> (acc * 31 + h) % {P})"
    return (
        f"CASE WHEN size({th_col}) >= {n} THEN"
        f" array_distinct(transform(sequence(1, size({th_col}) - {n - 1}), i -> {fold}))"
        f" ELSE array({whole}) END"
    )


def ddb_shingle_keys(th_col: str, n: int) -> str:
    """DuckDB twin of ``spark_shingle_keys`` — identical integer results
    over a token-hash list column materialized in a prior CTE."""
    fold = f"{th_col}[CAST(i AS INT) + 0]"
    for k in range(1, n):
        fold = f"(({fold}) * 31 + {th_col}[CAST(i AS INT) + {k}]) % {P}"
    whole = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {th_col}),"
        f" (acc, h) -> (acc * 31 + h) % {P})"
    )
    return (
        f"CASE WHEN len({th_col}) >= {n} THEN"
        f" list_distinct(list_transform(range(1, len({th_col}) - {n - 1} + 1), i -> {fold}))"
        f" ELSE [{whole}] END"
    )


def spark_hash_array(arr_sql: str) -> str:
    """Hash every element of a string array (fast md5-prefix hash)."""
    return f"transform({arr_sql}, t -> {spark_str_hash_fast('t')})"


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


def ddb_str_hash_fast(col_sql: str) -> str:
    return f"CAST(('0x' || substr(md5({col_sql}), 1, 8)) AS BIGINT)"


def ddb_tokens(col_sql: str) -> str:
    return f"string_split({col_sql}, ' ')"


def ddb_shingles(tok_col: str, n: int = 3) -> str:
    """DuckDB twin over a materialized token-list column (use a CTE that
    computes ``string_split`` first). Same short-document CASE as
    ``spark_shingles`` — whole text as the single shingle below n tokens."""
    parts = " || ' ' || ".join(f"{tok_col}[CAST(i AS INT) + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({tok_col}) >= {n} THEN"
        f" list_distinct(list_transform(range(1, len({tok_col}) - {n - 1} + 1),"
        f" i -> {parts}))"
        f" ELSE [array_to_string({tok_col}, ' ')] END"
    )


def ddb_hash_array(arr_sql: str) -> str:
    return f"list_transform({arr_sql}, t -> {ddb_str_hash_fast('t')})"


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


def jaccard_round4_spark(a: str, b: str) -> str:
    """4-decimal Jaccard via integer quantization: inter*10000/union is
    rounded to an INTEGER then exactly divided. Rounding the float ratio
    to 4 decimals instead diverges between engines when inter/union
    terminates at exactly 5 decimals (e.g. union 160, inter odd): Java
    rounds the double's shortest decimal repr, DuckDB multiplies by 1e4
    first, and within an ulp of the midpoint they disagree. A
    round-to-integer has no scaling multiply, so both engines agree even
    at exact midpoints."""
    inter = f"size(array_intersect({a}, {b}))"
    union = f"(size({a}) + size({b}) - {inter})"
    return f"cast(round({inter} * 1e4 / {union}) as bigint) / 1e4"


def jaccard_round4_ddb(a: str, b: str) -> str:
    inter = f"len(list_intersect({a}, {b}))"
    union = f"(len({a}) + len({b}) - {inter})"
    return f"CAST(round({inter} * 10000.0 / {union}) AS BIGINT) / 10000.0"
