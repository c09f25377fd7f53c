"""Training-data-pipeline operators beyond the reference's surface: eval-set
decontamination, repetition-based quality filtering, deterministic stratified
sampling, sequence packing, corpus length percentiles, and cluster-blocked
semantic dedup. Each is the standard large-corpus preprocessing step
re-expressed as declarative Spark with a bit-exact DuckDB oracle.

Scale notes are per-operator; the common theme is that every candidate set is
bucketed (hash split, lang stratum, shard, centroid cluster) before any
pairwise or ranked work, so no step is O(corpus²) and every shuffle key is
chosen for uniformity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texthash as H
from ..io import read_table
from ..operators.cachescope import scope_caches
from ..queries import register

# ---------------------------------------------------------------------------
# decontamination: train docs sharing any 8-gram with the held-out test split
# ---------------------------------------------------------------------------
DECON_N = 8  # word n-gram size; 8 is the published PaLM/Llama-style choice

_BUCKET_DDB = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT) % 100"
)
_BUCKET_SPARK = (
    "cast(conv(substring(md5(concat(cast(doc_id as string), ':split')), 1, 8), 16, 10) as bigint) % 100"
)


@register(
    "doc_decontaminate",
    f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, {_BUCKET_DDB} AS bucket
  FROM documents
), h AS (
  SELECT doc_id, bucket, {H.ddb_hash_array('toks')} AS th FROM t
), s AS (
  SELECT doc_id, bucket, {H.ddb_shingle_keys('th', DECON_N)} AS sk FROM h
), ex AS (
  SELECT doc_id, bucket, unnest(sk) AS k FROM s
), test_sh AS (
  SELECT DISTINCT k FROM ex WHERE bucket >= 90
), hits AS (
  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM ex e JOIN test_sh USING (k)
  WHERE e.bucket < 80
  GROUP BY e.doc_id
), sizes AS (
  SELECT doc_id, CAST(len(sk) AS BIGINT) AS n_shingles FROM s
)
SELECT hits.doc_id, n_overlap, n_shingles,
       round(CAST(n_overlap AS DOUBLE) / n_shingles, 6) AS overlap_frac
FROM hits JOIN sizes USING (doc_id)
ORDER BY doc_id
""",
)
def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag TRAIN-split documents that share any
    distinct word 8-gram with the TEST split (the deterministic hash split
    of ``doc_hash_split``). The published pipeline step (GPT-3 13-gram,
    PaLM/Llama 8-gram) as a shingle equi-join.

    Scale shape: test sets are orders of magnitude smaller than train, so
    the distinct test-shingle set broadcasts; the train side is a map-only
    explode → broadcast-hash semi-match → per-doc count. Nothing is ever
    joined all-pairs, and with a huge eval set the same plan degrades
    gracefully to a uniform hash-shuffle join on the shingle string.

    Two engineering rules keep it fast (both measured, both generalize):
    shingles are integer KEYS, not strings — per-token md5-prefix hashes
    folded 8-at-a-time with 31-poly arithmetic (``texthash.spark_shingle_
    keys``), so no ~50-char join keys are ever built (string shingling
    cost 5 s at sf0.1; hashed keys ~0.5 s) — and the shingle frame is
    cached before the explode because it feeds two consumers and nothing
    expensive may be projected past a Generate (Spark re-evaluates
    generator-adjacent expressions per OUTPUT row: carrying ``size(sh)``
    through the explode measured 43 s vs 0.3 s). The per-doc shingle count
    joins onto the (tiny) contaminated set at the end instead.

    Hashed keys admit ~|shingles|²/2P false-positive collisions (a dozen
    docs per few hundred thousand shingles at P = 2³¹−1) — benign for
    contamination FLAGGING, where false positives only send a doc to
    review; the DuckDB oracle uses the identical arithmetic, so results
    stay bit-equal."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.expr(H.spark_tokens("text")).alias("toks"),
        F.expr(_BUCKET_SPARK).alias("bucket"),
    )
    h = t.select("doc_id", "bucket", F.expr(H.spark_hash_array("toks")).alias("th"))
    # two consumers (explode stream + per-doc sizes); the cache is scoped to
    # the result frame's lifetime (scope_caches below) so repeated calls in
    # a long-lived session no longer accumulate storage memory (ADVICE r02)
    s = h.select(
        "doc_id", "bucket", F.expr(H.spark_shingle_keys("th", DECON_N)).alias("sk")
    ).cache()
    ex = s.select("doc_id", "bucket", F.explode("sk").alias("k"))
    test_sh = ex.filter(F.col("bucket") >= 90).select("k").distinct()
    hits = (
        ex.filter(F.col("bucket") < 80)
        .join(F.broadcast(test_sh), "k")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    sizes = s.select("doc_id", F.size("sk").cast("long").alias("n_shingles"))
    out = (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_overlap",
            "n_shingles",
            F.round(
                F.col("n_overlap").cast("double") / F.col("n_shingles"), 6
            ).alias("overlap_frac"),
        )
        .orderBy("doc_id")
    )
    out.shingle_cache = s  # back-compat handle for callers that sweep early
    return scope_caches(out, s)


def _decon_oracle() -> str:
    """The exact decontamination oracle, shared verbatim by the join form
    and the bloom-pruned form (no false negatives → identical results)."""
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, {_BUCKET_DDB} AS bucket
  FROM documents
), h AS (
  SELECT doc_id, bucket, {H.ddb_hash_array('toks')} AS th FROM t
), s AS (
  SELECT doc_id, bucket, {H.ddb_shingle_keys('th', DECON_N)} AS sk FROM h
), ex AS (
  SELECT doc_id, bucket, unnest(sk) AS k FROM s
), test_sh AS (
  SELECT DISTINCT k FROM ex WHERE bucket >= 90
), hits AS (
  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM ex e JOIN test_sh USING (k)
  WHERE e.bucket < 80
  GROUP BY e.doc_id
), sizes AS (
  SELECT doc_id, CAST(len(sk) AS BIGINT) AS n_shingles FROM s
)
SELECT hits.doc_id, n_overlap, n_shingles,
       round(CAST(n_overlap AS DOUBLE) / n_shingles, 6) AS overlap_frac
FROM hits JOIN sizes USING (doc_id)
ORDER BY doc_id
"""


_BLOOM_MULT = 2654435761  # Knuth multiplicative constant for the 2nd probe
_BLOOM_P = 2147483647  # pre-reduce keys below 2^31 so key*MULT can't overflow int64 (ANSI mode throws)
_BLOOM_CACHE: dict[str, tuple[list[int], int]] = {}


def _bloom_might_contain(key: Column, arr: Column, n_bits: int) -> Column:
    """Two-probe Bloom membership as a pure Column expression — JVM-side,
    codegen-able, no Python in the probe. ``arr`` is the packed bitset as
    an array<long> COLUMN (from a 1-row broadcast relation, NOT a literal:
    a multi-thousand-element array literal is a CreateArray re-materialized
    on every evaluation inside codegen — measured 4.5 s vs 0.6 s over 250k
    probes at 8k words — while a broadcast row materializes once per
    executor and element_at reads it in place)."""
    b1 = F.pmod(key, F.lit(n_bits))
    # pmod-reduce before the multiply: full-range int64 keys (xxhash64)
    # would overflow ANSI long multiplication; for keys already < 2^31
    # (hashed shingles) the reduction is the identity, so existing bit
    # layouts are unchanged
    b2 = F.pmod(F.pmod(key, F.lit(_BLOOM_P)) * _BLOOM_MULT + 104729, F.lit(n_bits))
    def probe(b: Column) -> Column:
        word = F.element_at(arr, (b / 64).cast("int") + 1)
        # call_function: the SQL shiftright accepts a column shift amount
        # (the PySpark wrapper insists on an int literal)
        return F.call_function("shiftright", word, (b % 64).cast("int")).bitwiseAND(1) == 1
    return probe(b1) & probe(b2)


@register("doc_decontaminate_bloom", _decon_oracle())
def doc_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``doc_decontaminate`` with a Bloom-bitset MAP-SIDE PRUNE in front of
    the exact join — the 100 TB form: when the eval-shingle set outgrows a
    comfortable broadcast hash relation, a Bloom filter over it stays small
    (~10 bits/key at 1% fpp vs ~40+ bytes/key for the exact set) and
    eliminates ~99% of train shingles BEFORE any join machinery touches
    them. Bloom filters have NO false negatives, so the surviving ~1% still
    exact-joins against the test set and the result — and therefore the
    oracle — is IDENTICAL to the exact query (a pytest pins the equality).

    The probe is two multiplicative hashes into a literal long-array bitset
    evaluated as pure Column arithmetic (shiftright + bitwiseAND) — inside
    whole-stage codegen, no Python, no extra exchange (plan-tested). The
    bitset here is built from a driver collect of the (small by
    construction) test-shingle keys; on a cluster the same bits fall out of
    ``df.stat.bloomFilter`` (one tree-aggregated pass) without any
    driver-side key list."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.expr(H.spark_tokens("text")).alias("toks"),
        F.expr(_BUCKET_SPARK).alias("bucket"),
    )
    h = t.select("doc_id", "bucket", F.expr(H.spark_hash_array("toks")).alias("th"))
    s = h.select(
        "doc_id", "bucket", F.expr(H.spark_shingle_keys("th", DECON_N)).alias("sk")
    ).cache()
    ex = s.select("doc_id", "bucket", F.explode("sk").alias("k"))
    test_sh = ex.filter(F.col("bucket") >= 90).select("k").distinct()

    # The Bloom bits are EVAL-SET STATE, not per-query work (the published
    # pipelines build the contamination filter once per benchmark suite and
    # sweep every training shard through it) — build once per corpus per
    # process, like the trained SQ8 ranges.
    if sf_dir in _BLOOM_CACHE:
        bits, n_bits = _BLOOM_CACHE[sf_dir]
    else:
        keys = [r.k for r in test_sh.collect()]
        n_bits = 64
        while n_bits < 16 * max(len(keys), 1):
            n_bits *= 2
        words = [0] * (n_bits // 64)
        for k in keys:
            for b in (k % n_bits, ((k % _BLOOM_P) * _BLOOM_MULT + 104729) % n_bits):
                words[b // 64] |= 1 << (b % 64)
        # pack to signed int64 (Spark long) — bit patterns preserved
        bits = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
        _BLOOM_CACHE[sf_dir] = (bits, n_bits)
    bitset = spark.createDataFrame([(bits,)], "bloom_bits: array<long>")

    pruned = (
        ex.filter(F.col("bucket") < 80)
        .crossJoin(F.broadcast(bitset))
        .filter(_bloom_might_contain(F.col("k"), F.col("bloom_bits"), n_bits))
        .drop("bloom_bits")
    )
    hits = (
        pruned.join(F.broadcast(test_sh), "k")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    sizes = s.select("doc_id", F.size("sk").cast("long").alias("n_shingles"))
    out = (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_overlap",
            "n_shingles",
            F.round(
                F.col("n_overlap").cast("double") / F.col("n_shingles"), 6
            ).alias("overlap_frac"),
        )
        .orderBy("doc_id")
    )
    out.shingle_cache = s  # back-compat handle for callers that sweep early
    return scope_caches(out, s)


@register("doc_length_percentiles_approx", None)
def doc_length_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``doc_length_percentiles``'s 100 TB form: ``percentile_approx``
    (t-digest-style mergeable sketch, fixed memory per group, NO per-group
    sort) instead of the exact interpolating percentile. Same output shape
    and columns; rows-only by construction (sketch internals aren't
    portable to DuckDB) — a pytest bounds every approx value against the
    exact twin. This is the swap the exact query's docstring promises."""
    d = read_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.percentile_approx(n, 0.5, 10000).cast("double"), 4).alias("p50"),
            F.round(F.percentile_approx(n, 0.9, 10000).cast("double"), 4).alias("p90"),
            F.round(F.percentile_approx(n, 0.99, 10000).cast("double"), 4).alias("p99"),
        )
        .orderBy("lang")
    )


@register("events_distinct_users_approx", None)
def events_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via HyperLogLog++
    (``approx_count_distinct``, rsd=2%) — the fixed-memory, mergeable
    sketch that replaces exact COUNT(DISTINCT)'s full shuffle of every
    distinct key at 100 TB (partials are ~kB registers regardless of
    cardinality). Rows-only (HLL internals differ across engines); pytest
    bounds the relative error against the exact count."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).cast("long").alias("approx_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# repetition-ratio quality filter (Gopher-style repetition rules)
# ---------------------------------------------------------------------------
DUP_TOKEN_MAX = 0.60  # flag when > 60% of tokens are repeats
TOP_BIGRAM_MAX = 0.08  # flag when the most common bigram is > 8% of bigrams


@register(
    "doc_repetition_ratio",
    f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), stats AS (
  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct FROM t
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])) AS b
  FROM t
), topbg AS (
  SELECT doc_id, max(n) AS max_bg FROM (
    SELECT doc_id, b, count(*) AS n FROM bg WHERE b IS NOT NULL GROUP BY doc_id, b
  ) GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       round(1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_tokens, 6) AS dup_token_frac,
       round(CAST(t.max_bg AS DOUBLE) / greatest(s.n_tokens - 1, 1), 6) AS top_bigram_frac,
       (1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_tokens > {DUP_TOKEN_MAX}
        OR CAST(t.max_bg AS DOUBLE) / greatest(s.n_tokens - 1, 1) > {TOP_BIGRAM_MAX}) AS flagged
FROM stats s JOIN topbg t USING (doc_id)
ORDER BY doc_id
""",
)
def doc_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-token fraction and
    the mass of the single most frequent bigram, plus the boolean filter
    verdict. Two map-side passes (token stats are per-row expressions; the
    bigram mode is explode → two-level partial-agg groupBy keyed by doc_id,
    a uniform key) — no cross-document work at all, so the operator is
    embarrassingly parallel at any corpus size."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    stats = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 1, 1)),"
                " i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1)))"
            )
        ).alias("b"),
    ).filter(F.col("b").isNotNull())
    topbg = (
        bg.groupBy("doc_id", "b").agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("max_bg"))
    )
    dup = 1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens")
    top = F.col("max_bg").cast("double") / F.greatest(F.col("n_tokens") - 1, F.lit(1))
    return (
        stats.join(topbg, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round(dup, 6).alias("dup_token_frac"),
            F.round(top, 6).alias("top_bigram_frac"),
            ((dup > DUP_TOKEN_MAX) | (top > TOP_BIGRAM_MAX)).alias("flagged"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling (per-language exact-fraction)
# ---------------------------------------------------------------------------
SAMPLE_FRAC = 0.2


@register(
    "stratified_sample_by_lang",
    f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM documents
)
SELECT lang, doc_id, rn, n_lang
FROM r
WHERE rn <= ceil({SAMPLE_FRAC} * n_lang)
ORDER BY lang, rn
""",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly ⌈20%⌉ of every language
    stratum, chosen by ranking on a content-stable md5 key — reproducible
    across runs and engines (``df.sample`` is seed- and partitioning-
    dependent, so it can never be oracle-checked; rank-on-hash is the
    portable form).

    SMALL-SF TWIN ONLY: the per-stratum window funnels each stratum through
    one task's sort — an English-dominated 100 TB corpus would push ~half
    the data through a single partition. The scale form is
    ``stratified_sample_threshold`` below (map-only, no window, exact
    fraction in expectation); use this exact-⌈frac·n⌉ form when strata are
    known-small or an exact count is contractually required (then via the
    two-phase range-partitioned rank, not this single-window one)."""
    d = read_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":strat")))
    w = Window.partitionBy("lang")
    r = d.select(
        "lang",
        "doc_id",
        F.row_number().over(w.orderBy(key.asc(), F.col("doc_id").asc())).cast("long").alias("rn"),
        F.count("*").over(w).alias("n_lang"),
    )
    return (
        r.filter(F.col("rn") <= F.ceil(SAMPLE_FRAC * F.col("n_lang")))
        .orderBy("lang", "rn")
    )


# map-only threshold variant: the 100 TB form of the same sampler
_STRAT_U_DDB = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 8)) AS BIGINT)"
    " / 4294967296.0"
)
_STRAT_U_SPARK = (
    "cast(conv(substring(md5(concat(cast(doc_id as string), ':strat')), 1, 8), 16, 10)"
    " as double) / 4294967296.0"
)


@register(
    "stratified_sample_threshold",
    f"""
SELECT lang, doc_id, round({_STRAT_U_DDB}, 8) AS u
FROM documents
WHERE {_STRAT_U_DDB} < {SAMPLE_FRAC}
ORDER BY lang, doc_id
""",
)
def stratified_sample_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe stratified sampling: keep a row iff its content-stable
    hash, mapped to a uniform u ∈ [0,1), is below the stratum's fraction.
    Map-only — no window, no shuffle, no state; every partition decides its
    own rows independently, so the plan is a pure Filter over the scan at
    any corpus size and any stratum skew (the failure mode of the exact-rank
    twin above). The sample is exact-fraction in expectation per stratum
    (binomial, |error| ~ 1/√n) and deterministic across runs, engines, and
    partitionings because u is a pure function of the row key. Per-stratum
    fractions generalize by joining/mapping a frac column instead of the
    constant."""
    d = read_table(spark, sf_dir, "documents")
    u = F.expr(_STRAT_U_SPARK)
    return (
        d.select("lang", "doc_id", F.round(u, 8).alias("u"))
        .filter(u < SAMPLE_FRAC)
        .orderBy("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# sequence packing: fill fixed token-budget bins shard-by-shard
# ---------------------------------------------------------------------------
PACK_BUDGET = 2048
PACK_SHARDS = 8


@register(
    "pack_sequences",
    f"""
WITH t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), c AS (
  SELECT shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT shard,
       CAST(floor(CAST(cum - n_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       round(CAST(sum(n_tokens) AS DOUBLE) / {PACK_BUDGET}, 6) AS utilization
FROM c
GROUP BY shard, bin
ORDER BY shard, bin
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: assign documents to
    fixed-token-budget bins (2048 tokens) by contiguous prefix-sum order
    within a hash shard — the streaming "chunked" packing used in practice
    (a doc starts in the bin its running total falls in; boundary docs
    overflow rather than split, so utilization can exceed 1.0 by at most
    one document).

    Sharding first is what makes this scale: packing is inherently
    sequential (a running total), but only *within* a bin stream — so the
    corpus hash-partitions into independent shards and each shard packs in
    parallel with one window cumsum. 1000 executors ⇒ ≥1000 shards, zero
    coordination."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.groupBy(
            "shard",
            F.floor((F.col("cum") - F.col("n_tokens")).cast("double") / PACK_BUDGET)
            .cast("long")
            .alias("bin"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.round(F.sum("n_tokens").cast("double") / PACK_BUDGET, 6).alias("utilization"),
        )
        .orderBy("shard", "bin")
    )


# weighted corpus mixing: per-source sampling rates in one map-only pass
MIX_WEIGHTS = {"en": 0.5, "fr": 0.3, "es": 0.2, "de": 0.1, "zh": 0.05}


def _mix_case_ddb() -> str:
    arms = " ".join(f"WHEN '{k}' THEN {w}" for k, w in sorted(MIX_WEIGHTS.items()))
    return f"CASE lang {arms} ELSE 0.0 END"


@register(
    "corpus_weighted_mix",
    f"""
SELECT lang, doc_id, round({_STRAT_U_DDB}, 8) AS u
FROM documents
WHERE {_STRAT_U_DDB} < ({_mix_case_ddb()})
ORDER BY lang, doc_id
""",
)
def corpus_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalancing: each source/language keeps its own target
    fraction (upsample-by-epoch / downsample-by-rate mixing, the per-source
    weights every LLM data recipe publishes) in ONE map-only pass — the
    per-stratum generalization of ``stratified_sample_threshold``: same
    content-stable u, compared against a per-stratum weight instead of a
    constant. The weight table is a literal CASE (a broadcast join for
    thousands of sources); plan stays a Filter on the scan — no shuffle,
    no skew sensitivity, deterministic across engines and runs."""
    d = read_table(spark, sf_dir, "documents")
    u = F.expr(_STRAT_U_SPARK)
    w = None
    for k, wt in sorted(MIX_WEIGHTS.items()):
        w = (F.when if w is None else w.when)(F.col("lang") == k, F.lit(wt))
    w = w.otherwise(F.lit(0.0))
    return (
        d.select("lang", "doc_id", F.round(u, 8).alias("u"))
        .filter(u < w)
        .orderBy("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# fixed-token chunking with overlap (embedding / context-window prep)
# ---------------------------------------------------------------------------
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # = CHUNK_TOKENS - overlap(8)


@register(
    "doc_chunk_fixed_tokens",
    f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), n AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), c AS (
  SELECT doc_id, toks, n,
         unnest(range(0, 1 + CAST(ceil(CAST(greatest(n - {CHUNK_TOKENS}, 0) AS DOUBLE) / {CHUNK_STRIDE}) AS BIGINT))) AS chunk_idx
  FROM n
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST({CHUNK_STRIDE} * chunk_idx AS BIGINT) AS start_tok,
       CAST(len(toks[{CHUNK_STRIDE} * CAST(chunk_idx AS INT) + 1 : {CHUNK_STRIDE} * CAST(chunk_idx AS INT) + {CHUNK_TOKENS}]) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(toks[{CHUNK_STRIDE} * CAST(chunk_idx AS INT) + 1 : {CHUNK_STRIDE} * CAST(chunk_idx AS INT) + {CHUNK_TOKENS}], ' ')) AS chunk_md5
FROM c
ORDER BY doc_id, chunk_idx
""",
)
def doc_chunk_fixed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunking with overlap — the prep step every
    embedding/RAG/context-window pipeline runs before encoding: chunk i
    covers tokens [i·stride, i·stride + chunk); the last chunk is short
    rather than padded; every doc yields ≥ 1 chunk. Map-only explode whose
    fan-out is ~n/stride per doc — no shuffle, no state, linear at any
    corpus size; the chunk identity is (doc_id, chunk_idx) and the md5 of
    the reconstructed chunk text is the content key downstream dedup or
    caching joins on."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    n = t.withColumn("n", F.size("toks"))
    n_chunks = 1 + F.ceil(
        F.greatest(F.col("n") - CHUNK_TOKENS, F.lit(0)).cast("double") / CHUNK_STRIDE
    ).cast("long")
    c = n.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
    )
    ctoks = F.slice(
        F.col("toks"), F.col("chunk_idx").cast("int") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return (
        c.select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * CHUNK_STRIDE).alias("start_tok"),
            F.size(ctoks).cast("long").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", ctoks)).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# corpus length percentiles (exact, per stratum)
# ---------------------------------------------------------------------------
@register(
    "doc_length_percentiles",
    """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(len(string_split(text, ' ')), 0.5), 4) AS p50,
       round(quantile_cont(len(string_split(text, ' ')), 0.9), 4) AS p90,
       round(quantile_cont(len(string_split(text, ' ')), 0.99), 4) AS p99
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language token-length percentiles (linear interpolation —
    Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    definition). Exact percentiles sort each group; at 100 TB swap in
    ``percentile_approx`` (t-digest, mergeable partial aggs, no sort) —
    the operator signature and plan shape stay identical, which is why the
    exact form is the oracle here."""
    d = read_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.percentile(n, F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile(n, F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile(n, F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# semantic dedup: centroid-blocked within-cluster cosine pairs
# ---------------------------------------------------------------------------
SEM_CENTROIDS = 16
SEM_THRESHOLD = 0.45

_L2SQ_DDB = (
    "list_sum(list_transform(range(1, len({a})+1),"
    " i -> power(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE), 2)))"
)
_DOT_DDB = (
    "list_sum(list_transform(range(1, len({a})+1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


@register(
    "semantic_dedup_clusters",
    f"""
WITH cent AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding AS cvec
  FROM embeddings WHERE vec_id < {SEM_CENTROIDS}
), asg AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_L2SQ_DDB.format(a='e.embedding', b='c.cvec')}, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c
), a AS (
  SELECT vec_id, embedding, cid,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM asg WHERE rn = 1
)
SELECT x.cid AS cid, x.vec_id AS vec_id_1, y.vec_id AS vec_id_2,
       round({_DOT_DDB.format(a='x.embedding', b='y.embedding')} / (x.nrm * y.nrm), 4) AS cosine
FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
WHERE {_DOT_DDB.format(a='x.embedding', b='y.embedding')} / (x.nrm * y.nrm) >= {SEM_THRESHOLD}
ORDER BY cid, vec_id_1, vec_id_2
""",
)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup, cluster-blocked: assign every
    vector to its nearest of 16 deterministic centroids (map-side BLAS
    argmin — same build as the IVF index, no shuffle), then emit cosine
    ≥ 0.45 pairs WITHIN each
    cluster only. The SemDeDup-style recipe: clustering caps the candidate
    set at Σ|cluster|² instead of N², trading the few cross-cluster dup
    pairs (recall baselined by the exact ``neardup_embedding_cosine``) for
    a candidate volume that stays linear when centroids scale with corpus
    size. Scoring is one numpy GEMM per cluster via ``applyInPandas``
    (``similarity.grouped_pairs_cosine``) — the shuffle key is cid, and
    with real K-means (K ~ N/10k, MLlib ``KMeans`` drop-in for the
    deterministic centroids) cluster sizes stay bounded so no key is hot
    and every group fits its Arrow batch."""
    from ..operators.ivf import ivf_assign_gemm
    from ..operators.similarity import grouped_pairs_cosine

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < SEM_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    a = ivf_assign_gemm(emb, centroids)
    return (
        grouped_pairs_cosine(a, "cid", "vec_id", "embedding", SEM_THRESHOLD, round_to=4)
        .select(
            F.col("grp").alias("cid"),
            F.col("id1").alias("vec_id_1"),
            F.col("id2").alias("vec_id_2"),
            "cosine",
        )
        .orderBy("cid", "vec_id_1", "vec_id_2")
    )


# ---------------------------------------------------------------------------
# the composed LLM corpus-prep pipeline: every stage above, end to end
# ---------------------------------------------------------------------------
def _corpus_prep_oracle() -> str:
    from .dedup_queries import JACCARD_THRESHOLD

    return f"""
WITH RECURSIVE
keep1 AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
d1 AS (
  SELECT d.* FROM documents d JOIN keep1 USING (doc_id)
),
jt AS (SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM d1),
jsh AS (SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM jt),
blocked AS (SELECT doc_id, shingles, list_min(shingles) AS block_key FROM jsh),
pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM blocked a JOIN blocked b
    ON a.block_key = b.block_key AND a.doc_id < b.doc_id
  WHERE {H.jaccard_sql_ddb('a.shingles', 'b.shingles')} >= {JACCARD_THRESHOLD}
),
sym AS (SELECT src AS a, dst AS b FROM pairs UNION SELECT dst, src FROM pairs),
reach AS (
  SELECT a, a AS b FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
labels AS (SELECT a AS node, min(b) AS comp FROM reach GROUP BY a),
d2 AS (
  SELECT d.* FROM d1 d
  WHERE d.doc_id NOT IN (SELECT node FROM labels WHERE node <> comp)
),
ft AS (
  SELECT doc_id, string_split(text, ' ') AS toks, {_BUCKET_DDB} AS bucket
  FROM documents
),
fh AS (SELECT doc_id, bucket, {H.ddb_hash_array('toks')} AS th FROM ft),
fs AS (SELECT doc_id, bucket, {H.ddb_shingle_keys('th', DECON_N)} AS sk FROM fh),
fex AS (SELECT doc_id, bucket, unnest(sk) AS k FROM fs),
test_sh AS (SELECT DISTINCT k FROM fex WHERE bucket >= 90),
contaminated AS (
  SELECT DISTINCT e.doc_id FROM fex e JOIN test_sh USING (k) WHERE e.bucket < 80
),
d3 AS (
  SELECT d.doc_id, d.text FROM d2 d JOIN ft USING (doc_id)
  WHERE ft.bucket < 80 AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
rt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d3),
rstats AS (
  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct FROM rt
),
rbg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])) AS b
  FROM rt
),
rtop AS (
  SELECT doc_id, max(n) AS max_bg FROM (
    SELECT doc_id, b, count(*) AS n FROM rbg WHERE b IS NOT NULL GROUP BY doc_id, b
  ) GROUP BY doc_id
),
d4 AS (
  SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens
  FROM rstats s JOIN rtop t USING (doc_id)
  WHERE NOT (1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_tokens > {DUP_TOKEN_MAX}
             OR CAST(t.max_bg AS DOUBLE) / greatest(s.n_tokens - 1, 1) > {TOP_BIGRAM_MAX})
),
d5 AS (
  SELECT doc_id, n_tokens FROM d4 WHERE {_STRAT_U_DDB} < {SAMPLE_FRAC}
),
c AS (
  SELECT doc_id % {PACK_SHARDS} AS shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY doc_id % {PACK_SHARDS} ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d5
)
SELECT shard,
       CAST(floor(CAST(cum - n_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       round(CAST(sum(n_tokens) AS DOUBLE) / {PACK_BUDGET}, 6) AS utilization
FROM c
GROUP BY shard, bin
ORDER BY shard, bin
"""


@register("corpus_prep_pipeline", _corpus_prep_oracle())
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end LLM training-corpus preparation pipeline (VERDICT r4
    #3) — every individually-green stage composed into ONE query, in the
    published-recipe order:

      exact dedup (md5 keep-min) → near-dup keep-canonical (3-gram
      Jaccard pairs → connected components → anti-join losers) →
      eval-set decontamination (train split only, hashed-8-gram hit
      against the test split) → Gopher repetition filter (dup-token +
      top-bigram mass) → deterministic stratified sample (hash-threshold
      u < 0.2) → sequence packing (2048-token bins over 8 hash shards).

    Composed-plan shape (SCALE.md): stages 1-2 shuffle once each on a
    uniform key (content hash, block key) plus the CC rounds on the tiny
    pair graph; stage 3 is map-only + one broadcast probe; stage 4 is one
    uniform groupBy; stage 5 is a pure filter; stage 6 is a window over
    8 shard streams + final agg. The corpus itself never joins all-pairs
    anywhere, and the only per-row state (shingle sets, bigram counts)
    lives behind bucketed keys — so the composition inherits each stage's
    100 TB story unchanged. Every stage is SQL-expressible; the oracle
    replays the whole chain (including the CC recursive CTE) bit-exactly."""
    from ..operators.components import dedup_keep_canonical
    from .dedup_queries import jaccard_pairs

    d = read_table(spark, sf_dir, "documents")
    # Materialization discipline: the composed DAG fans out at three stage
    # boundaries (d1 feeds the pair chain AND the keep anti-join; fs feeds
    # the test-shingle AND the train-probe branches; d3 feeds the two
    # repetition branches). Without cutting lineage there, Spark recomputes
    # the ENTIRE upstream chain once per branch — measured 205 s vs ~8 s at
    # sf0.1 — so each boundary localCheckpoints (eager, like the CC edge
    # list): same per-stage plans as the standalone queries, paid once.
    # stage 1+2 (dedup chain) and stage 3's shingle table are INDEPENDENT
    # subgraphs that were serialized by their eager materializations; the
    # r14 optimization overlaps them (guide §2.6): two driver threads
    # submit both chains, the scheduler back-fills the tail of either
    # with the other's tasks (~1 s at sf0.1; the win grows with the
    # straggler tail at scale). Frames produced are identical.
    ft = d.select(
        "doc_id",
        F.expr(H.spark_tokens("text")).alias("toks"),
        F.expr(_BUCKET_SPARK).alias("bucket"),
    )

    def _dedup_chain() -> DataFrame:
        # stage 1: exact dedup — keep the min doc_id per content-hash group
        keep1 = (
            d.groupBy(F.md5(F.col("text"))).agg(F.min("doc_id").alias("doc_id")).select("doc_id")
        )
        d1 = d.join(keep1, "doc_id", "left_semi").localCheckpoint(eager=True)
        # stage 2: near-dup keep-canonical over the exact-dedup survivors
        pairs = jaccard_pairs(d1).select("doc_id_1", "doc_id_2")
        return dedup_keep_canonical(d1, pairs, id_col="doc_id")

    def _shingle_chain() -> DataFrame:
        # stage 3 input: test shingles come from the FULL corpus (the
        # eval split exists regardless of what dedup kept)
        fh = ft.select("doc_id", "bucket", F.expr(H.spark_hash_array("toks")).alias("th"))
        return fh.select(
            "doc_id", "bucket", F.expr(H.spark_shingle_keys("th", DECON_N)).alias("sk")
        ).localCheckpoint(eager=True)  # expensive HOF under a Generate, 2 consumers

    from ..operators.concurrency import materialize_concurrently

    d2, fs = materialize_concurrently(spark, _dedup_chain, _shingle_chain)
    fex = fs.select("doc_id", "bucket", F.explode("sk").alias("k"))
    test_sh = fex.filter(F.col("bucket") >= 90).select("k").distinct()
    contaminated = (
        fex.filter(F.col("bucket") < 80)
        .join(F.broadcast(test_sh), "k")
        .select("doc_id")
        .distinct()
    )
    train_ids = ft.filter(F.col("bucket") < 80).select("doc_id")
    d3 = (
        d2.join(train_ids, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)  # everything upstream, paid exactly once
    )
    # stage 4: repetition/quality filter — keep only unflagged docs
    rt = d3.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    rstats = rt.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    rbg = rt.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 1, 1)),"
                " i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1)))"
            )
        ).alias("b"),
    ).filter(F.col("b").isNotNull())
    rtop = (
        rbg.groupBy("doc_id", "b").agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("max_bg"))
    )
    dup = 1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens")
    top = F.col("max_bg").cast("double") / F.greatest(F.col("n_tokens") - 1, F.lit(1))
    d4 = (
        rstats.join(rtop, "doc_id")
        .filter(~((dup > DUP_TOKEN_MAX) | (top > TOP_BIGRAM_MAX)))
        .select("doc_id", "n_tokens")
    )
    # stage 5: deterministic stratified-threshold sample
    d5 = d4.filter(F.expr(_STRAT_U_SPARK) < SAMPLE_FRAC)
    # stage 6: pack into fixed-token-budget bins per hash shard
    t = d5.select("doc_id", (F.col("doc_id") % PACK_SHARDS).alias("shard"), "n_tokens")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.groupBy(
            "shard",
            F.floor((F.col("cum") - F.col("n_tokens")).cast("double") / PACK_BUDGET)
            .cast("long")
            .alias("bin"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.round(F.sum("n_tokens").cast("double") / PACK_BUDGET, 6).alias("utilization"),
        )
        .orderBy("shard", "bin")
    )


# ---------------------------------------------------------------------------
# seeded corpus shuffle + sharding: the data-loader handoff step (r6)
# ---------------------------------------------------------------------------
SHUF_SHARDS = 8
SHUF_SEED = "42"

_SHUF_KEY_DDB = f"md5(CAST(doc_id AS VARCHAR) || ':shuffle:' || '{SHUF_SEED}')"
_SHUF_SHARD_DDB = (
    f"CAST(CAST(('0x' || substr({_SHUF_KEY_DDB}, 1, 8)) AS BIGINT) % {SHUF_SHARDS} AS INT)"
)


@register(
    "corpus_shuffle_shards",
    f"""
WITH keyed AS (
  SELECT doc_id, {_SHUF_KEY_DDB} AS skey, {_SHUF_SHARD_DDB} AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS BIGINT) AS pos
FROM keyed
ORDER BY shard, pos
""",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle + sharding — the step between corpus prep and
    the training data loader: every epoch-0 pipeline (GPT-3 §2.2,
    Llama-style recipes) randomizes document order and splits the corpus
    into fixed shards for parallel loaders. Deterministic re-expression:
    the 'randomness' IS a hash — sort key = md5(doc_id:shuffle:seed),
    shard = first-8-hex-digits % SHUF_SHARDS, within-shard position =
    rank on the key. Changing the seed re-deals the whole corpus;
    re-running never does.

    Scale shape: key+shard are map-only projections; the only exchange is
    the per-shard window, keyed on a uniform md5-derived shard id (the
    same uniformity argument as ``doc_hash_split``), so at 100 TB this is
    one balanced repartition + per-partition sort — exactly the shuffle a
    sharded tfrecord/webdataset writer performs, with ``.write.
    partitionBy(shard)`` as the sink. Hash-checked: md5 hex strings and
    ASCII ordering agree across engines."""
    docs = read_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":shuffle:{SHUF_SEED}")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % SHUF_SHARDS
    ).cast("int")
    keyed = docs.select("doc_id", key.alias("skey"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        keyed.select("doc_id", "shard", F.row_number().over(w).cast("bigint").alias("pos"))
        .orderBy("shard", "pos")
    )


# ---------------------------------------------------------------------------
# B34: cross-document duplicated n-gram coverage (exact-substring-dedup metric)
# ---------------------------------------------------------------------------
# Lee et al. ACL'22 ("Deduplicating Training Data Makes Language Models
# Better") and RefinedWeb measure, per document, the fraction of content
# covered by n-gram spans that occur more than once in the corpus — the
# signal behind exact-substring dedup. doc_repetition_ratio is the
# WITHIN-document sibling; this is the cross-document one.
DUPSPAN_N = 8  # span length in tokens; long enough to not saturate


@register(
    "doc_dup_ngram_coverage",
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), spans AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         array_to_string(t[CAST(i AS INT):CAST(i AS INT) + {DUPSPAN_N} - 1], ' ') AS g
  FROM toks, unnest(range(1, len(t) - {DUPSPAN_N} + 2)) AS r(i)
), dupg AS (
  SELECT g FROM spans GROUP BY g HAVING count(*) > 1
), covered AS (
  SELECT DISTINCT s.doc_id, s.i + CAST(o AS BIGINT) AS pos
  FROM spans s JOIN dupg USING (g), unnest(range(0, {DUPSPAN_N})) AS u(o)
), cov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_positions FROM covered GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       COALESCE(c.n_dup_positions, 0) AS n_dup_positions,
       CAST(round(COALESCE(c.n_dup_positions, 0) * 1000000.0 / len(t.t)) AS BIGINT) / 1000000.0 AS dup_frac
FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id
ORDER BY t.doc_id
""",
)
def doc_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each document's token positions covered by {n}-gram
    spans that occur more than once ANYWHERE in the corpus (self-matches
    included, per the exact-substring-dedup definition).

    Scale shape: spans reduce to per-gram corpus counts (uniform key —
    8-gram strings; at 100 TB swap the join key for the 8-byte
    spark_shingle_keys polynomial to shrink the shuffle), duplicated
    grams join back to spans (only DUPLICATED spans fan out into covered
    positions, so the explode factor is bounded by the corpus's actual
    duplication), and the interval union is a per-document distinct —
    never cross-document. Documents shorter than the span length have no
    spans and report 0 coverage via the left join.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    spans = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                # sequence(1, 0) is DESCENDING [1, 0] in Spark (step -1
                # when start > stop), so a greatest(..., 0) bound still
                # feeds slice() a start of 0 and crashes on short docs —
                # guard with an explicit CASE like the bigram explodes.
                f"CASE WHEN size(t) >= {DUPSPAN_N} THEN"
                f" transform(sequence(1, size(t) - {DUPSPAN_N} + 1),"
                f" i -> concat_ws(' ', slice(t, i, {DUPSPAN_N})))"
                f" ELSE array() END"
            )
        ).alias("p0", "g"),
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("i"), "g")
    dupg = spans.groupBy("g").agg(F.count("*").alias("cnt")).filter(F.col("cnt") > 1).select("g")
    covered = (
        spans.join(dupg, "g")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {DUPSPAN_N} - 1)")).alias("pos"),
        )
        .distinct()
    )
    cov = covered.groupBy("doc_id").agg(F.count("*").alias("n_dup_positions"))
    return (
        toks.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_dup_positions"), F.lit(0)).cast("long").alias("n_dup_positions"),
            # ppm quantization then exact division (midpoint hazard of
            # rounding exact integer ratios, see doc_quality_classifier)
            (
                F.round(
                    F.coalesce(F.col("n_dup_positions"), F.lit(0))
                    * 1000000.0
                    / F.size("t"),
                    0,
                ).cast("long")
                / 1000000.0
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )
doc_dup_ngram_coverage.__doc__ = doc_dup_ngram_coverage.__doc__.replace("{n}", str(DUPSPAN_N))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B36: DSIR-style hashed-n-gram importance resampling
# ---------------------------------------------------------------------------
# Data Selection via Importance Resampling (Xie et al. NeurIPS'23): score
# every raw document by the log-likelihood ratio of its hashed-bigram
# features under a TARGET distribution vs the RAW corpus distribution, then
# keep the highest-ratio head. Here target = the lang='en' slice (stand-in
# for "looks like Wikipedia"); features = bigrams hashed into a fixed
# bucket space so both distributions are D-dimensional count vectors.
DSIR_BUCKETS = 4096
DSIR_ALPHA = 0.5
DSIR_KEEP_FRAC = 0.25


def _dsir_bucket(w1: str, w2: str, dialect: str) -> str:
    if dialect == "spark":
        h = H.spark_str_hash_fast(f"concat({w1}, ' ', {w2})")
    else:
        h = H.ddb_str_hash_fast(f"{w1} || ' ' || {w2}")
    return f"({h}) % {DSIR_BUCKETS}"


_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
), bi AS (
  SELECT doc_id, lang,
         {_dsir_bucket("t[CAST(i AS INT)]", "t[CAST(i AS INT) + 1]", "ddb")} AS b
  FROM toks, unnest(range(1, len(t))) AS r(i)
), db AS (
  SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY doc_id, lang, b
), tgt AS (
  SELECT b, CAST(sum(n) AS BIGINT) AS ct FROM db WHERE lang = 'en' GROUP BY b
), raw AS (
  SELECT b, CAST(sum(n) AS BIGINT) AS cr FROM db GROUP BY b
), tot AS (
  SELECT (SELECT sum(ct) FROM tgt) AS nt, (SELECT sum(cr) FROM raw) AS nr
), scored AS (
  SELECT d.doc_id, d.n,
         CAST(round(ln(((COALESCE(t.ct, 0) + {DSIR_ALPHA}) / (tot.nt + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                     / ((r.cr + {DSIR_ALPHA}) / (tot.nr + {DSIR_ALPHA} * {DSIR_BUCKETS}))) * 1000000.0)
              AS BIGINT) AS lw
  FROM db d
  LEFT JOIN tgt t ON t.b = d.b
  JOIN raw r ON r.b = d.b
  CROSS JOIN tot
), agg AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams, CAST(sum(n * lw) AS BIGINT) AS s
  FROM scored GROUP BY doc_id
), ranked AS (
  SELECT doc_id, n_bigrams,
         CAST(round(s * 1.0 / n_bigrams) AS BIGINT) / 1000000.0 AS log_ratio,
         row_number() OVER (ORDER BY CAST(s AS DOUBLE) / n_bigrams DESC, doc_id) AS rnk,
         count(*) OVER () AS n_total
  FROM agg
)
SELECT doc_id, n_bigrams, log_ratio, CAST(rnk AS BIGINT) AS rnk,
       rnk <= CAST(ceil({DSIR_KEEP_FRAC} * n_total) AS BIGINT) AS selected
FROM ranked
ORDER BY doc_id
"""


def _dsir_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared DSIR scoring (B36): per-(doc, bucket) hashed-bigram counts,
    broadcast target/raw distributions, integer micro-nat log-ratio
    weights, exact integer per-doc sums — everything UP TO the selection
    cut, which the two registered forms make differently
    (``dsir_importance_resample``: exact rank; ``dsir_importance_threshold``:
    approx-quantile cutoff). Returns (doc_id, n_bigrams, s)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", F.split(F.col("text"), " ").alias("t"))
    bi = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN"
                " transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
                " ELSE array() END"
            )
        ).alias("g"),
    ).select("doc_id", "lang", F.expr(_dsir_bucket("g.w1", "g.w2", "spark")).alias("b"))
    # db feeds FOUR consumers (tgt, raw, their totals, the scored join);
    # per-branch column pruning defeats exchange reuse, so without a cut
    # the corpus bigram explode re-executes per branch (52 exchanges /
    # 20 scans in the r14-before plan). One eager localCheckpoint of the
    # per-(doc, bucket) count table — the same boundary _quality_prep
    # already cuts — pays the explode once (r14 opt).
    db = (
        bi.groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    tgt = db.filter(F.col("lang") == "en").groupBy("b").agg(F.sum("n").alias("ct"))
    raw = db.groupBy("b").agg(F.sum("n").alias("cr"))
    tot = tgt.agg(F.sum("ct").alias("nt")).crossJoin(raw.agg(F.sum("cr").alias("nr")))
    pt = (F.coalesce(F.col("ct"), F.lit(0)) + DSIR_ALPHA) / (
        F.col("nt") + DSIR_ALPHA * DSIR_BUCKETS
    )
    pr = (F.col("cr") + DSIR_ALPHA) / (F.col("nr") + DSIR_ALPHA * DSIR_BUCKETS)
    scored = (
        db.join(F.broadcast(tgt), "b", "left")
        .join(F.broadcast(raw), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n",
            F.round(F.log(pt / pr) * 1000000.0, 0).cast("long").alias("lw"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.sum(F.col("n") * F.col("lw")).cast("long").alias("s"),
    )


@register("dsir_importance_resample", _DSIR_SQL)
def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: per-document mean hashed-bigram importance
    log-ratio ln(p_target/p_raw), ranked, with the top 25% selected.

    Determinism contract: each bucket's log-ratio is quantized once to
    integer micro-nats, per-document scores are exact integer sums, and
    the selection rank breaks ties on doc_id — so the kept set is
    identical across engines and partitionings. (The rank sorts on the
    exact ratio s/n rather than the rounded display column.)

    Scale shape: bigram instances reduce map-side to per-(doc, bucket)
    counts; the target/raw distributions are D-sized (broadcast); the
    only corpus-wide ordering is the final rank over one row per doc —
    the registered 100 TB twin ``dsir_importance_threshold`` swaps it
    for the approx-quantile cutoff form."""
    agg = _dsir_doc_scores(spark, sf_dir)
    w = Window.orderBy(
        (F.col("s").cast("double") / F.col("n_bigrams")).desc(), F.col("doc_id").asc()
    )
    ranked = agg.select(
        "doc_id",
        "n_bigrams",
        # micro-nat integer quantization then exact division — never a
        # float round of an integer ratio (midpoint hazard, see
        # doc_quality_classifier)
        (
            F.round(F.col("s") * 1.0 / F.col("n_bigrams"), 0).cast("long") / 1000000.0
        ).alias("log_ratio"),
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count("*").over(Window.partitionBy()).alias("n_total"),
    )
    return ranked.select(
        "doc_id",
        "n_bigrams",
        "log_ratio",
        "rnk",
        (F.col("rnk") <= F.ceil(DSIR_KEEP_FRAC * F.col("n_total")).cast("long")).alias(
            "selected"
        ),
    ).orderBy("doc_id")


@register("dsir_importance_threshold", None)
def dsir_importance_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the DSIR selection (VERDICT r10 item 5): same
    shared scoring (``_dsir_doc_scores``), but instead of the exact rank
    (an unpartitioned window over one row per doc — still the corpus
    dimension at scale) the cut point is ``approx_percentile`` of the
    integer micro-nat mean score at 1-KEEP_FRAC — a sketch aggregate
    with map-side partials — and selection is a map-only filter against
    that broadcast scalar, the ``doc_lm_perplexity_threshold`` pattern.
    Rows-only registry entry (approx_percentile's sketch is engine-
    specific); the pytest bounds its disagreement with the exact rank
    form to the cut boundary."""
    agg = _dsir_doc_scores(spark, sf_dir)
    scored = agg.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("s") * 1.0 / F.col("n_bigrams"), 0).cast("long").alias("score_micro"),
    )
    cut = scored.agg(
        F.expr(
            f"approx_percentile(score_micro, {1.0 - DSIR_KEEP_FRAC}, 10000)"
        ).alias("cut")
    )
    return (
        scored.crossJoin(F.broadcast(cut))
        .filter(F.col("score_micro") >= F.col("cut"))
        .select("doc_id", "n_bigrams", (F.col("score_micro") / 1000000.0).alias("log_ratio"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B37: per-domain token-budget sampling (data-mixing at token granularity)
# ---------------------------------------------------------------------------
# The Pile/Llama-style mixing step: each domain (source) contributes
# documents until its TOKEN budget is exhausted, selection order seeded so
# the draw is reproducible. corpus_weighted_mix is the document-count
# sibling; training recipes budget tokens, not documents.
TOKEN_BUDGET_PER_SOURCE = 800


@register(
    "source_token_budget_sample",
    f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || ':budget') AS ord_key
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY ord_key, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens,
       cum_tokens <= {TOKEN_BUDGET_PER_SOURCE} AS kept
FROM c
ORDER BY doc_id
""",
)
def source_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget sampling per source domain: documents are
    drawn in seeded-hash order until the running token total exceeds the
    domain budget; ``kept`` marks the prefix that fits entirely.

    Scale shape: one window partitioned by source on the seeded key — a
    single shuffle on the domain key with per-partition running sums.
    Domains are few and bounded, so the window partitions are the domain
    sizes; a skewed mega-domain pays exactly its own scan (the running
    sum is sequential per domain by definition — same bound as any
    cumulative-budget semantics). The seeded md5 order makes the draw
    reproducible and re-drawable by changing the seed literal."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":budget"))).alias("ord_key"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("ord_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.select(
            "doc_id",
            "source",
            "n_tokens",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        )
        .withColumn("kept", F.col("cum_tokens") <= TOKEN_BUDGET_PER_SOURCE)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B40: composed QUALITY pipeline over the r6 signals (one oracle query)
# ---------------------------------------------------------------------------
# The model-quality side of corpus prep, composed in published-recipe order
# (corpus_prep_pipeline is the dedup/decontamination side):
#   Gopher repetition gate → hashed linear classifier gate → bigram-LM
#   perplexity trained on the SURVIVORS with a rank cut (keep best 75%) →
#   DSIR importance selection (top 50% toward the lang='en' target) →
#   per-source token-budget mix. Every stage reuses the standalone
#   operator's exact arithmetic (integer micro-nats / milli-weights / ppm),
#   so the composition is hash-checkable end to end.
QPP_PPL_KEEP = 0.75
QPP_DSIR_KEEP = 0.5


def _qpp_oracle() -> str:
    from .text_queries import CLF_BUCKETS, LM_ALPHA, _clf_weight_ddb

    clf_bucket = H.ddb_str_hash_fast("t") + f" % {CLF_BUCKETS}"
    return f"""
WITH base AS (
  SELECT doc_id, source, lang, string_split(text, ' ') AS toks FROM documents
), rep AS (
  SELECT b.doc_id,
         1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dupf,
         CAST((SELECT max(n) FROM (
            SELECT count(*) AS n FROM (
              SELECT unnest(list_transform(range(1, greatest(len(b.toks) - 1, 1) + 1),
                     i -> b.toks[CAST(i AS INT)] || ' ' || b.toks[CAST(i AS INT) + 1])) AS bg
            ) GROUP BY bg
         )) AS DOUBLE) / greatest(len(toks) - 1, 1) AS topbg
  FROM base b
), clf AS (
  SELECT doc_id, CAST(sum(n * wi) AS BIGINT) AS s FROM (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
           {_clf_weight_ddb(clf_bucket)} AS wi
    FROM (SELECT doc_id, unnest(toks) AS t FROM base)
    GROUP BY doc_id, t
  ) GROUP BY doc_id
), surv1 AS (
  SELECT b.* FROM base b JOIN rep r ON r.doc_id = b.doc_id JOIN clf c ON c.doc_id = b.doc_id
  WHERE NOT (r.dupf > {DUP_TOKEN_MAX} OR r.topbg > {TOP_BIGRAM_MAX}) AND c.s > 0
), uni AS (
  SELECT count(DISTINCT u) AS v FROM (SELECT unnest(toks) AS u FROM surv1)
), bi AS (
  SELECT doc_id, lang, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM surv1, unnest(range(1, len(toks))) AS r(i)
), db AS (
  SELECT doc_id, lang, w1, w2, CAST(count(*) AS BIGINT) AS n_b FROM bi GROUP BY ALL
), c2 AS (SELECT w1, w2, CAST(sum(n_b) AS BIGINT) AS c2 FROM db GROUP BY ALL
), c1 AS (SELECT w1, CAST(sum(n_b) AS BIGINT) AS c1 FROM db GROUP BY w1
), lm AS (
  SELECT doc_id, CAST(round(sum(n_b * nl) * 1.0 / sum(n_b)) AS BIGINT) AS ce_micro FROM (
    SELECT d.doc_id, d.n_b,
           CAST(round(-ln((c2.c2 + {LM_ALPHA}) / (c1.c1 + {LM_ALPHA} * uni.v)) * 1000000.0)
                AS BIGINT) AS nl
    FROM db d JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
    JOIN c1 ON c1.w1 = d.w1 CROSS JOIN uni
  ) GROUP BY doc_id
), lmranked AS (
  SELECT doc_id, ce_micro,
         row_number() OVER (ORDER BY ce_micro, doc_id) AS rnk,
         count(*) OVER () AS n FROM lm
), surv2 AS (
  SELECT s.*, l.ce_micro FROM surv1 s JOIN lmranked l ON l.doc_id = s.doc_id
  WHERE l.rnk <= CAST(ceil({QPP_PPL_KEEP} * l.n) AS BIGINT)
), bib AS (
  SELECT doc_id, lang,
         {_dsir_bucket("toks[CAST(i AS INT)]", "toks[CAST(i AS INT) + 1]", "ddb")} AS b
  FROM surv2, unnest(range(1, len(toks))) AS r(i)
), dbb AS (
  SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS n FROM bib GROUP BY ALL
), tgt AS (SELECT b, CAST(sum(n) AS BIGINT) AS ct FROM dbb WHERE lang = 'en' GROUP BY b
), raw AS (SELECT b, CAST(sum(n) AS BIGINT) AS cr FROM dbb GROUP BY b
), tot AS (SELECT (SELECT sum(ct) FROM tgt) AS nt, (SELECT sum(cr) FROM raw) AS nr
), dsir AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS nb, CAST(sum(n * lw) AS BIGINT) AS s FROM (
    SELECT d.doc_id, d.n,
           CAST(round(ln(((COALESCE(t.ct, 0) + {DSIR_ALPHA}) / (tot.nt + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                       / ((r.cr + {DSIR_ALPHA}) / (tot.nr + {DSIR_ALPHA} * {DSIR_BUCKETS}))) * 1000000.0)
                AS BIGINT) AS lw
    FROM dbb d LEFT JOIN tgt t ON t.b = d.b JOIN raw r ON r.b = d.b CROSS JOIN tot
  ) GROUP BY doc_id
), dsirranked AS (
  SELECT doc_id, nb, s,
         row_number() OVER (ORDER BY CAST(s AS DOUBLE) / nb DESC, doc_id) AS rnk,
         count(*) OVER () AS n FROM dsir
), surv3 AS (
  SELECT s2.*, d.s AS dsir_s, d.nb AS dsir_nb FROM surv2 s2 JOIN dsirranked d ON d.doc_id = s2.doc_id
  WHERE d.rnk <= CAST(ceil({QPP_DSIR_KEEP} * d.n) AS BIGINT)
), budget AS (
  SELECT doc_id, source, lang, ce_micro, dsir_s, dsir_nb,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(sum(len(toks)) OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR) || ':budget'), doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM surv3
)
SELECT doc_id, source, lang, n_tokens, cum_tokens,
       round(exp(ce_micro / 1000000.0), 4) AS ppl,
       CAST(round(dsir_s * 1.0 / dsir_nb) AS BIGINT) / 1000000.0 AS log_ratio
FROM budget
WHERE cum_tokens <= {TOKEN_BUDGET_PER_SOURCE}
ORDER BY doc_id
"""


def _quality_prep(
    spark: SparkSession, sf_dir: str, threshold_cuts: bool = False
) -> DataFrame:
    """The composed quality-selection pipeline (B40): five r6 stages in one
    query, sharing one tokenization —

      Gopher repetition gate → hashed-classifier gate (integer dot > 0) →
      bigram LM TRAINED ON THE SURVIVORS, keep the best {p}% by
      cross-entropy rank → DSIR importance selection toward lang='en'
      (top {q}%) → per-source token-budget mix (seeded order).

    Composed-plan shape: stages 1-2 are map-only expression work plus two
    uniform-key groupBys; the LM/DSIR count tables are vocabulary/bucket-
    sized broadcasts; the only global orderings are the two one-row-per-doc
    rank windows (threshold form at 100 TB — see SCALE.md) and the final
    per-source budget window. The corpus never joins all-pairs; the two
    fan-out boundaries (survivor frames feeding both the count tables and
    the scoring joins) are localCheckpointed like corpus_prep_pipeline's.
    All stage arithmetic is the standalone operators' (integer micro-nat /
    milli-weight / rank tie-breaks on doc_id), so the full composition
    hash-matches the DuckDB replay."""
    from .text_queries import CLF_BUCKETS, LM_ALPHA, _clf_weight_spark

    d = read_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", "lang", F.split(F.col("text"), " ").alias("toks"))
    # stage 1: repetition signals (map-only + one uniform groupBy).
    # r15 negative result (kept deliberately): folding ALL of stage 1+2
    # in-row (sorted-run dupf/topbg + an aggregate-HOF classifier fold, the
    # doc_char_entropy_gate trick) was measured 3.4-4.0 s vs 1.2-1.6 s for
    # this exploded form at sf0.1 — the interpreted per-element md5 inside
    # the HOF costs more than the shuffles it removes (the simhash lesson:
    # hash in codegen'd exploded form, not interpreted lambdas).
    stats = base.select(
        "doc_id",
        (1.0 - F.size(F.array_distinct("toks")).cast("double") / F.size("toks")).alias("dupf"),
        F.size("toks").alias("n_toks"),
    )
    bg = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 1, 1)),"
                " i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1)))"
            )
        ).alias("b"),
    ).filter(F.col("b").isNotNull())
    topbg = (
        bg.groupBy("doc_id", "b").agg(F.count("*").alias("n"))
        .groupBy("doc_id").agg(F.max("n").alias("max_bg"))
    )
    rep = stats.join(topbg, "doc_id").select(
        "doc_id",
        "dupf",
        (F.col("max_bg").cast("double") / F.greatest(F.col("n_toks") - 1, F.lit(1))).alias("topbg"),
    )
    # stage 2: classifier integer dot product
    bucket = f"({H.spark_str_hash_fast('t')}) % {CLF_BUCKETS}"
    clf = (
        base.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t").agg(F.count("*").alias("n"))
        .select("doc_id", "n", F.expr(_clf_weight_spark(bucket)).alias("wi"))
        .groupBy("doc_id").agg(F.sum(F.col("n") * F.col("wi")).cast("long").alias("s"))
    )
    surv1 = (
        base.join(rep, "doc_id").join(clf, "doc_id")
        .filter(~((F.col("dupf") > DUP_TOKEN_MAX) | (F.col("topbg") > TOP_BIGRAM_MAX)) & (F.col("s") > 0))
        .select("doc_id", "source", "lang", "toks")
        .localCheckpoint(eager=True)
    )
    # stage 3: bigram LM on survivors, rank-keep best 75%
    bi = surv1.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN"
                " transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
                " ELSE array() END"
            )
        ).alias("g"),
    ).select("doc_id", "lang", "g.w1", "g.w2")
    db = bi.groupBy("doc_id", "lang", "w1", "w2").agg(F.count("*").alias("n_b")).localCheckpoint(
        eager=True
    )
    c2 = db.groupBy("w1", "w2").agg(F.sum("n_b").alias("c2"))
    c1 = db.groupBy("w1").agg(F.sum("n_b").alias("c1"))
    v = surv1.select(F.explode("toks").alias("u")).agg(F.countDistinct("u").alias("v"))
    p = (F.col("c2") + LM_ALPHA) / (F.col("c1") + LM_ALPHA * F.col("v"))
    lm = (
        db.join(F.broadcast(c2), ["w1", "w2"]).join(F.broadcast(c1), ["w1"])
        .crossJoin(F.broadcast(v))
        .select("doc_id", "n_b", F.round(-F.log(p) * 1000000.0, 0).cast("long").alias("nl"))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("n_b") * F.col("nl")) * 1.0 / F.sum("n_b"), 0).cast("long").alias("ce_micro"))
    )
    if threshold_cuts:
        lm_cut = lm.agg(
            F.expr(f"approx_percentile(ce_micro, {QPP_PPL_KEEP}, 10000)").alias("__cut")
        )
        lm_keep = (
            lm.crossJoin(F.broadcast(lm_cut))
            .filter(F.col("ce_micro") <= F.col("__cut"))
            .select("doc_id", "ce_micro")
        )
    else:
        w_lm = Window.orderBy(F.col("ce_micro").asc(), F.col("doc_id").asc())
        lmranked = lm.select(
            "doc_id", "ce_micro",
            F.row_number().over(w_lm).alias("rnk"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        lm_keep = lmranked.filter(
            F.col("rnk") <= F.ceil(QPP_PPL_KEEP * F.col("n")).cast("long")
        )
    surv2 = (
        surv1.join(lm_keep, "doc_id")
        .select("doc_id", "source", "lang", "toks", "ce_micro")
        .localCheckpoint(eager=True)
    )
    # stage 4: DSIR selection on the LM survivors. The per-(doc, bucket)
    # counts are a pure rollup of stage 3's per-(doc, bigram-type) table —
    # Σ_{(w1,w2)→b} n_b — so derive dbb from the already-checkpointed db
    # (restricted to LM survivors) instead of re-exploding every bigram
    # POSITION of surv2 a second time (r15 opt, guide §2.3: aggregate the
    # compact proxy you already paid for, don't rescan the payload).
    dbb = (
        db.join(surv2.select("doc_id"), "doc_id", "left_semi")
        .select(
            "doc_id", "lang", F.expr(_dsir_bucket("w1", "w2", "spark")).alias("b"), "n_b"
        )
        .groupBy("doc_id", "lang", "b")
        .agg(F.sum("n_b").alias("n"))
        .localCheckpoint(eager=True)
    )
    tgt = dbb.filter(F.col("lang") == "en").groupBy("b").agg(F.sum("n").alias("ct"))
    raw = dbb.groupBy("b").agg(F.sum("n").alias("cr"))
    tot = tgt.agg(F.sum("ct").alias("nt")).crossJoin(raw.agg(F.sum("cr").alias("nr")))
    pt = (F.coalesce(F.col("ct"), F.lit(0)) + DSIR_ALPHA) / (F.col("nt") + DSIR_ALPHA * DSIR_BUCKETS)
    pr = (F.col("cr") + DSIR_ALPHA) / (F.col("nr") + DSIR_ALPHA * DSIR_BUCKETS)
    dsir = (
        dbb.join(F.broadcast(tgt), "b", "left").join(F.broadcast(raw), "b")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "n", F.round(F.log(pt / pr) * 1000000.0, 0).cast("long").alias("lw"))
        .groupBy("doc_id")
        .agg(F.sum("n").cast("long").alias("nb"), F.sum(F.col("n") * F.col("lw")).cast("long").alias("s"))
    )
    if threshold_cuts:
        ds_scored = dsir.withColumn(
            "__score_micro", F.round(F.col("s") * 1.0 / F.col("nb"), 0).cast("long")
        )
        ds_cut = ds_scored.agg(
            F.expr(
                f"approx_percentile(__score_micro, {1.0 - QPP_DSIR_KEEP}, 10000)"
            ).alias("__cut")
        )
        ds_keep = (
            ds_scored.crossJoin(F.broadcast(ds_cut))
            .filter(F.col("__score_micro") >= F.col("__cut"))
            .select("doc_id", "nb", "s")
        )
    else:
        w_ds = Window.orderBy(
            (F.col("s").cast("double") / F.col("nb")).desc(), F.col("doc_id").asc()
        )
        dsirranked = dsir.select(
            "doc_id", "nb", "s",
            F.row_number().over(w_ds).alias("rnk"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        ds_keep = dsirranked.filter(
            F.col("rnk") <= F.ceil(QPP_DSIR_KEEP * F.col("n")).cast("long")
        )
    surv3 = surv2.join(ds_keep, "doc_id").select(
        "doc_id", "source", "lang", "toks", "ce_micro", "s", "nb"
    )
    # stage 5: per-source token-budget mix
    w_b = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":budget"))), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        surv3.select(
            "doc_id", "source", "lang",
            F.size("toks").cast("long").alias("n_tokens"),
            F.sum(F.size("toks")).over(w_b).cast("long").alias("cum_tokens"),
            F.round(F.exp(F.col("ce_micro") / 1000000.0), 4).alias("ppl"),
            (F.round(F.col("s") * 1.0 / F.col("nb"), 0).cast("long") / 1000000.0).alias("log_ratio"),
        )
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_SOURCE)
        .orderBy("doc_id")
    )
_quality_prep.__doc__ = _quality_prep.__doc__.replace("{p}", "75").replace("{q}", "50")  # template scale constants into the (real) docstring


@register("quality_prep_pipeline", _qpp_oracle())
def quality_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed quality-selection pipeline (B40) with EXACT rank cuts
    — full-oracle checkable; see ``_quality_prep`` for the five stages.
    The registered 100 TB twin is ``quality_prep_threshold``."""
    return _quality_prep(spark, sf_dir, threshold_cuts=False)


@register("quality_prep_threshold", None)
def quality_prep_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the composed quality pipeline (VERDICT r10
    item 5): the SAME five stages and arithmetic as
    ``quality_prep_pipeline`` — same builder, one flag — but both
    selection cuts (LM cross-entropy keep-75%, DSIR keep-50%) run as
    ``approx_percentile`` threshold filters against broadcast scalars
    instead of exact-rank windows over the per-doc (corpus-dimension)
    frames. Rows-only registry entry (the sketch cut is engine-
    specific); the pytest bounds its divergence from the exact form to
    the cut boundaries."""
    return _quality_prep(spark, sf_dir, threshold_cuts=True)


# ---------------------------------------------------------------------------
# B43: exact-substring dedup REMOVAL (the action to B34's metric)
# ---------------------------------------------------------------------------
# Lee et al. ACL'22 exact-substring dedup, keep-first flavor: every
# instance of a duplicated n-gram span EXCEPT the globally-first one
# (min (doc_id, position)) is removed; surviving tokens reassemble in
# order. Deterministic keep rule ⇒ fully SQL-expressible.


@register(
    "doc_dup_span_removal",
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), spans AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         array_to_string(t[CAST(i AS INT):CAST(i AS INT) + {DUPSPAN_N} - 1], ' ') AS g
  FROM toks, unnest(range(1, len(t) - {DUPSPAN_N} + 2)) AS r(i)
), dupg AS (
  SELECT g FROM spans GROUP BY g HAVING count(*) > 1
), inst AS (
  SELECT s.doc_id, s.i, s.g,
         row_number() OVER (PARTITION BY s.g ORDER BY s.doc_id, s.i) AS rn
  FROM spans s JOIN dupg USING (g)
), removed AS (
  SELECT DISTINCT doc_id, i + CAST(o AS BIGINT) AS pos
  FROM inst, unnest(range(0, {DUPSPAN_N})) AS u(o)
  WHERE rn > 1
), kepttok AS (
  SELECT tk.doc_id, tk.pos, tk.tok
  FROM (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, t[CAST(i AS INT)] AS tok
    FROM toks, unnest(range(1, len(t) + 1)) AS r(i)
  ) tk
  LEFT JOIN removed rm ON rm.doc_id = tk.doc_id AND rm.pos = tk.pos
  WHERE rm.doc_id IS NULL
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(k.cleaned, '') AS cleaned_text
FROM toks t
LEFT JOIN (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned
  FROM kepttok GROUP BY doc_id
) k ON k.doc_id = t.doc_id
ORDER BY t.doc_id
""",
)
def doc_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned corpus under keep-first exact-substring dedup: tokens
    covered by a non-first instance of any duplicated {n}-gram are
    dropped; the rest reassemble in position order (docs losing every
    token emit the empty string, matching the oracle's COALESCE).

    Scale shape on top of B34's: the extra work is one rank window
    PARTITIONED BY GRAM (uniform key — a gram with f instances costs
    f log f within its partition, never corpus-wide), and the reassembly
    is a per-doc ordered aggregation on the uniform doc_id key. The
    removed-position frame explodes only DUPLICATED instances, bounded by
    actual corpus duplication. At 100 TB the gram key again swaps for the
    8-byte polynomial (`spark_shingle_keys`)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    spans = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                # sequence(1, 0) is DESCENDING [1, 0] in Spark (step -1
                # when start > stop), so a greatest(..., 0) bound still
                # feeds slice() a start of 0 and crashes on short docs —
                # guard with an explicit CASE like the bigram explodes.
                f"CASE WHEN size(t) >= {DUPSPAN_N} THEN"
                f" transform(sequence(1, size(t) - {DUPSPAN_N} + 1),"
                f" i -> concat_ws(' ', slice(t, i, {DUPSPAN_N})))"
                f" ELSE array() END"
            )
        ).alias("p0", "g"),
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("i"), "g")
    dupg = spans.groupBy("g").agg(F.count("*").alias("cnt")).filter(F.col("cnt") > 1).select("g")
    w = Window.partitionBy("g").orderBy(F.col("doc_id").asc(), F.col("i").asc())
    inst = spans.join(dupg, "g").withColumn("rn", F.row_number().over(w))
    removed = (
        inst.filter(F.col("rn") > 1)
        .select("doc_id", F.explode(F.expr(f"sequence(i, i + {DUPSPAN_N} - 1)")).alias("pos"))
        .distinct()
    )
    alltok = toks.select(
        "doc_id", F.posexplode("t").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "tok")
    kept = alltok.join(removed, ["doc_id", "pos"], "left_anti")
    reasm = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("tok")))),
                lambda s: s["tok"],
            ),
        ).alias("cleaned"),
    )
    return (
        toks.join(reasm, "doc_id", "left")
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            (F.size("t") - F.coalesce(F.col("n_kept"), F.lit(0))).cast("long").alias("n_removed"),
            F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )
doc_dup_span_removal.__doc__ = doc_dup_span_removal.__doc__.replace("{n}", str(DUPSPAN_N))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B44: corpus profiling — the data-quality report every ingest runs first
# ---------------------------------------------------------------------------
@register(
    "corpus_profile",
    """
SELECT 'doc_id' AS column_name,
       CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
       CAST(min(doc_id) AS VARCHAR) AS min_value,
       CAST(max(doc_id) AS VARCHAR) AS max_value
FROM documents
UNION ALL
SELECT 'lang', CAST(count(*) - count(lang) AS BIGINT),
       CAST(count(DISTINCT lang) AS BIGINT), min(lang), max(lang) FROM documents
UNION ALL
SELECT 'source', CAST(count(*) - count(source) AS BIGINT),
       CAST(count(DISTINCT source) AS BIGINT), min(source), max(source) FROM documents
UNION ALL
SELECT 'n_chars', CAST(count(*) - count(n_chars) AS BIGINT),
       CAST(count(DISTINCT n_chars) AS BIGINT),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
UNION ALL
SELECT 'text_len', CAST(count(*) - count(text) AS BIGINT),
       CAST(count(DISTINCT len(text)) AS BIGINT),
       CAST(min(len(text)) AS VARCHAR), CAST(max(len(text)) AS VARCHAR) FROM documents
ORDER BY column_name
""",
)
def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the documents table (null counts, distincts,
    min/max) — the ingest-time data-quality report. ONE pass over the
    scan: all columns' aggregates compute in a single Aggregate node
    (stringified min/max so heterogeneous columns stack), then unpivot to
    the (column, stats) report shape. At 100 TB this is the same single
    scan + map-side partial aggregation any count(*) costs; the exact
    distincts swap for approx_count_distinct when the report tolerates
    ±2% (the HLL twin `events_distinct_users_approx` documents that
    form)."""
    d = read_table(spark, sf_dir, "documents")
    cols = {
        "doc_id": F.col("doc_id").cast("string"),
        "lang": F.col("lang"),
        "source": F.col("source"),
        "n_chars": F.col("n_chars").cast("string"),
        "text_len": F.length("text").cast("string"),
    }
    # numeric min/max must compare numerically, then render as strings
    order_expr = {
        "doc_id": F.col("doc_id"),
        "lang": F.col("lang"),
        "source": F.col("source"),
        "n_chars": F.col("n_chars"),
        "text_len": F.length("text"),
    }
    aggs = []
    for name in cols:
        aggs += [
            (F.count("*") - F.count(order_expr[name])).cast("long").alias(f"{name}__nulls"),
            F.countDistinct(order_expr[name]).cast("long").alias(f"{name}__distinct"),
            F.min(order_expr[name]).cast("string").alias(f"{name}__min"),
            F.max(order_expr[name]).cast("string").alias(f"{name}__max"),
        ]
    wide = d.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.col(f"{name}__nulls").alias("n_nulls"),
                F.col(f"{name}__distinct").alias("n_distinct"),
                F.col(f"{name}__min").alias("min_value"),
                F.col(f"{name}__max").alias("max_value"),
            )
            for name in cols
        ]
    )
    return (
        wide.select(F.explode(rows).alias("r"))
        .select("r.column_name", "r.n_nulls", "r.n_distinct", "r.min_value", "r.max_value")
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# B45: incremental aggregate maintenance — registered against q1's OWN oracle
# ---------------------------------------------------------------------------
@register(
    "q1_incremental_maintenance",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance (operators/incremental.py): the q1
    pricing summary maintained over THREE deterministic ingest batches —
    state = per-group decimal partial aggregates, each batch folds in via
    a group-key-sized full-outer merge that never re-reads prior data —
    then finalized with q1's exact output expressions. The ORACLE IS
    PLAIN ONE-SHOT q1: the hash check proves the incremental path is
    indistinguishable from full recomputation (decimal partials are
    exact, so split/order cannot move a bit). At 100 TB each refresh
    costs agg(batch) + a merge of two group-cardinality frames."""
    from ..operators.incremental import merge_q1_state, q1_report, q1_state

    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    state = None
    for k in range(3):
        batch_state = q1_state(li.filter(F.col("l_orderkey") % 3 == k))
        state = batch_state if state is None else merge_q1_state(state, batch_state)
    return q1_report(state)


# ---------------------------------------------------------------------------
# B52: robust per-source outlier gate (median / MAD) (r7)
# ---------------------------------------------------------------------------
# Length-outlier filtering with ROBUST statistics: mean/stddev move with
# the outliers they're supposed to catch, median/MAD don't (50% breakdown
# point). Flag docs with |len − median| > 3·MAD within their source.
# Engine-parity contract: medians of integers are exact halves, so both
# sides carry 2·median and 4·MAD as INTEGERS (cast after the exact
# interpolated percentile) and the gate compares 2·dev2 > 3·mad4 — pure
# integer arithmetic, no float threshold anywhere.


@register(
    "source_length_mad_outliers",
    """
WITH med AS (
  SELECT source, CAST(2 * quantile_cont(n_chars, 0.5) AS BIGINT) AS med2
  FROM documents GROUP BY source
), dev AS (
  SELECT d.doc_id, d.source, d.n_chars, m.med2,
         abs(2 * d.n_chars - m.med2) AS dev2
  FROM documents d JOIN med m USING (source)
), mad AS (
  SELECT source, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
  FROM dev GROUP BY source
)
SELECT v.doc_id, v.source, v.n_chars, v.med2, m.mad4,
       2 * v.dev2 > 3 * m.mad4 AS is_outlier
FROM dev v JOIN mad m USING (source)
ORDER BY v.doc_id
""",
)
def source_length_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust length outliers (B52): two exact-percentile
    aggregations on the uniform source key, each joined back broadcast
    (per-source stats are a handful of rows at any corpus size); the gate
    itself is a map-side integer comparison. At 100 TB swap the exact
    percentile for approx_percentile exactly as doc_length_percentiles
    documents — the gate shape is unchanged."""
    d = read_table(spark, sf_dir, "documents")
    med = d.groupBy("source").agg(
        (F.lit(2) * F.expr("percentile(n_chars, 0.5)")).cast("long").alias("med2")
    )
    dev = d.join(F.broadcast(med), "source").select(
        "doc_id",
        "source",
        "n_chars",
        "med2",
        F.abs(F.lit(2) * F.col("n_chars") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("source").agg(
        (F.lit(2) * F.expr("percentile(dev2, 0.5)")).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            "med2",
            "mad4",
            (F.lit(2) * F.col("dev2") > F.lit(3) * F.col("mad4")).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B65: recency-decayed document popularity → sampling weights (r8)
# ---------------------------------------------------------------------------
# Freshness-weighted sampling for training mixes: engagement events decay
# with a weekly half-life, documents inherit their item's decayed mass,
# and the output is a ppm sampling weight — the "prefer what users touch
# NOW" signal composed with the B11/B36/B37 sampling family. All decay
# arithmetic is integer (age buckets by integer division from the corpus
# max instant; halving is a right shift), so the oracle replays it
# bit-for-bit; the only float op is the final single IEEE divide for the
# ppm share. Scale shape: the event scan reduces map-side onto ≤100
# uniform item keys before one tiny exchange; the doc join is a
# broadcast of that item table; the corpus max instant is a 1-row
# broadcast — no corpus-sized shuffle anywhere.
POPULARITY_HALF_LIFE_DAYS = 7
POPULARITY_TOPN = 100
_US_PER_DAY = 86_400_000_000


@register(
    "doc_popularity_decayed",
    f"""
WITH mx AS (
  SELECT max(epoch_us(ts)) AS t1 FROM events
), w AS (
  SELECT CAST(json_extract_string(e.props, '$.k') AS INT) AS item,
         1000000 >> CAST(least((mx.t1 - epoch_us(e.ts)) // {_US_PER_DAY}
                               // {POPULARITY_HALF_LIFE_DAYS}, 62) AS INT) AS wt
  FROM events e, mx
  WHERE CAST(json_extract_string(e.props, '$.k') AS INT) IS NOT NULL
), pop AS (
  SELECT item, CAST(sum(wt) AS BIGINT) AS pop FROM w GROUP BY item
), tot AS (
  SELECT sum(pop) AS tp FROM pop
)
SELECT d.doc_id, p.item, p.pop,
       CAST(round(p.pop * 1000000.0 / t.tp) AS BIGINT) AS weight_ppm
FROM documents d
JOIN pop p ON p.item = CAST(d.doc_id % 100 AS INT)
CROSS JOIN tot t
ORDER BY p.pop DESC, d.doc_id
LIMIT {POPULARITY_TOPN}
""",
)
def doc_popularity_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} documents by recency-decayed engagement (B65): weekly
    half-life as an integer right shift from exact day buckets, item mass
    one 100-key aggregate, docs inherit via broadcast join, ppm weights
    from one IEEE divide."""
    ev = read_table(spark, sf_dir, "events")
    d = read_table(spark, sf_dir, "documents")
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("t1"))
    w = (
        ev.crossJoin(F.broadcast(mx))
        .select(
            F.get_json_object("props", "$.k").cast("int").alias("item"),
            F.expr(
                f"shiftright(cast(1000000 as bigint), cast(least((t1 - unix_micros(ts)) div {_US_PER_DAY} div {POPULARITY_HALF_LIFE_DAYS}, 62) as int))"
            ).alias("wt"),
        )
        .filter(F.col("item").isNotNull())
    )
    pop = w.groupBy("item").agg(F.sum("wt").cast("long").alias("pop"))
    tot = pop.agg(F.sum("pop").alias("tp"))
    return (
        d.select("doc_id", (F.col("doc_id") % 100).cast("int").alias("item"))
        .join(F.broadcast(pop), "item")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "item",
            "pop",
            F.round(F.col("pop") * 1000000.0 / F.col("tp"), 0).cast("long").alias("weight_ppm"),
        )
        .orderBy(F.col("pop").desc(), F.col("doc_id").asc())
        .limit(POPULARITY_TOPN)
    )
doc_popularity_decayed.__doc__ = doc_popularity_decayed.__doc__.replace("{n}", str(POPULARITY_TOPN))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B76: deterministic weighted reservoir sampling (A-ES) (r9)
# ---------------------------------------------------------------------------
# Weighted sampling without replacement at stream/corpus scale — the
# Efraimidis-Spirakis exponential-jumps scheme (A-ES): each item draws
# u ~ U(0,1] and ranks by u^(1/w); the top-k by that key IS an exact
# weighted sample without replacement. Here u is a SEEDED md5 hash
# (B31's discipline: u = (h32 + 1) / 2^32, never 0), the rank key is the
# log form ln(u)/w (monotone in u^(1/w), numerically flat), quantized to
# integer pico-units with doc_id tie-break — ln is transcendental, so
# per the repo's rounding contract its quantization boundaries have
# measure ~0 and both engines agree. Weights = n_chars (sample long docs
# proportionally more — the token-budget sampling companion to B37).
# Scale shape: the key is computed map-side from (doc_id, n_chars)
# alone; selection is one TakeOrderedAndProject — a global top-k, no
# shuffle of the corpus, no reservoir state; restarting or resharding
# the corpus cannot change the sample (content-keyed, the B11 property).
WRS_K = 50


@register(
    "doc_weighted_reservoir_sample",
    f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         CAST(round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wrs'), 1, 8)) AS BIGINT) + 1)
                       / 4294967296.0) / n_chars * 1000000000000.0) AS BIGINT) AS key_pico
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, key_pico,
       row_number() OVER (ORDER BY key_pico DESC, doc_id) AS rnk
FROM keyed
ORDER BY rnk LIMIT {WRS_K}
""",
)
def doc_weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sample without replacement of {k} documents,
    weight = n_chars (B76, Efraimidis-Spirakis A-ES): seeded-hash
    uniform, rank by ln(u)/w in integer pico-units, top-k."""
    d = read_table(spark, sf_dir, "documents")
    h = F.expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), ':wrs')), 1, 8), 16, 10) as bigint)"
    )
    key = F.round(F.log((h + 1) / F.lit(4294967296.0)) / F.col("n_chars") * 1e12).cast("long")
    keyed = d.filter(F.col("n_chars") > 0).select(
        "doc_id", "n_chars", key.alias("key_pico")
    )
    # TakeOrderedAndProject: the top-k is a per-partition heap + one
    # k-row merge on the driver — no global window over the corpus
    top = keyed.orderBy(F.col("key_pico").desc(), F.col("doc_id")).limit(WRS_K)
    w = Window.orderBy(F.col("key_pico").desc(), F.col("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).orderBy("rnk")
doc_weighted_reservoir_sample.__doc__ = doc_weighted_reservoir_sample.__doc__.replace("{k}", str(WRS_K))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B86: equi-depth histogram binning (r9, below-fold for r10)
# ---------------------------------------------------------------------------
# The feature-bucketing primitive (quantile binning for feature
# engineering / curriculum tiers): assign every document to one of K
# equal-population bins by length and profile each bin. ntile is the
# SQL-standard equal-split (first n mod K bins take the extra row) and
# both engines implement exactly that, so with a total order under the
# window (n_chars, doc_id) the assignment is deterministic — no
# percentile interpolation anywhere (the B72 median lesson). Scale
# shape: a global ntile needs a total sort — correct for the ≤million-
# bin-boundary profile emitted here; at 100 TB the same contract runs
# as repartitionByRange(n_chars) + per-partition rank arithmetic, which
# is what Spark's sort does anyway.
DEPTH_BINS = 10


@register(
    "doc_equidepth_bins",
    f"""
WITH binned AS (
  SELECT doc_id, n_chars,
         ntile({DEPTH_BINS}) OVER (ORDER BY n_chars, doc_id) AS bin
  FROM documents
)
SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS lo_chars,
       CAST(max(n_chars) AS BIGINT) AS hi_chars,
       CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars
FROM binned GROUP BY bin ORDER BY bin
""",
)
def doc_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k} equal-population document-length bins with per-bin bounds and
    integer mean (B86) — deterministic ntile under a total order, computed
    with the exact-rank two-form (`with_exact_ntile`: bounded per-length
    counts + partitioned row_number) so no corpus-global window runs."""
    from vectordb_hr_data_spark.operators.quantiles import with_exact_ntile

    d = read_table(spark, sf_dir, "documents")
    binned = with_exact_ntile(
        d.select("doc_id", "n_chars"), DEPTH_BINS, "n_chars", "doc_id", "bin"
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("lo_chars"),
            F.max("n_chars").cast("long").alias("hi_chars"),
            F.expr("sum(n_chars) div count(*)").cast("long").alias("mean_chars"),
        )
        .orderBy("bin")
    )
doc_equidepth_bins.__doc__ = doc_equidepth_bins.__doc__.replace("{k}", str(DEPTH_BINS))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B96: per-slice ingest profile (r9, below-fold for r10)
# ---------------------------------------------------------------------------
# The (lang, source) slice report every ingest pipeline tracks: volume,
# length sum/min/max per slice — ALL associative measures, chosen so the
# streaming twin (`streaming.stream_ops.stream_slice_profile`) can fold
# micro-batches into persisted state by pure re-aggregation (sum of
# sums, min of mins) with no ordering contract and exact convergence to
# this batch query. One uniform (lang, source) groupBy with map-side
# partials; output bounded by the slice grid.
@register(
    "source_slice_profile",
    """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
)
def source_slice_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) ingest slice profile (B96): counts and length
    stats from associative measures only — the streaming twin folds
    micro-batches into identical state."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.expr("sum(n_chars) div count(*)").cast("long").alias("mean_chars"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# B99: corpus length-inequality (Gini) audit (r9, for r10)
# ---------------------------------------------------------------------------
# One number for "how unevenly are tokens spread across documents" — the
# partitioning/packing planner's input (a high-Gini corpus needs
# length-aware packing (B12) and skew-aware shuffles far more than a
# uniform one). Exact integer formula over the sorted ranks:
# G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i), emitted in ppm via integer
# div; ranks from ONE total-order window (n_chars, doc_id tie-break).
@register(
    "doc_length_gini",
    """
WITH ranked AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS i
  FROM documents
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s,
         CAST(sum(i * n_chars) AS BIGINT) AS si
  FROM ranked
)
SELECT n AS n_docs, s AS total_chars,
       CAST((2 * si - (n + 1) * s) * 1000000 // (n * s) AS BIGINT) AS gini_ppm
FROM agg
""",
)
def doc_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document lengths in integer ppm (B99) — the
    packing/skew planning input; exact rank formula, one window."""
    d = read_table(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    ranked = d.select("n_chars", F.row_number().over(w).alias("i"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.expr(
            "(2 * sum(i * n_chars) - (count(*) + 1) * sum(n_chars)) * 1000000"
            " div (count(*) * sum(n_chars))"
        )
        .cast("long")
        .alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# B102: curriculum ordering (easy-to-hard, source-interleaved)
# ---------------------------------------------------------------------------
# The training-order planner: stage docs easy-to-hard (difficulty proxy =
# n_chars; any scored column — perplexity, quality — plugs into the same
# shape), then round-robin sources WITHIN each stage so no stage is a
# single-source run (curriculum learning + source-mixing in one pass).
# Three windows over one total order; at 100 TB the global ntile becomes
# exact-quantile stage boundaries (B72 discipline) + a per-stage
# repartition, and the round-robin rank keys the final write order.
@register(
    "source_curriculum_order",
    """
WITH staged AS (
  SELECT doc_id, source, n_chars,
         ntile(4) OVER (ORDER BY n_chars, doc_id) AS stage
  FROM documents
), rr AS (
  SELECT doc_id, source, n_chars, stage,
         row_number() OVER (PARTITION BY stage, source ORDER BY doc_id) AS rank_in_source
  FROM staged
)
SELECT CAST(row_number() OVER (ORDER BY stage, rank_in_source, source, doc_id) AS BIGINT)
         AS curriculum_rank,
       doc_id, CAST(stage AS BIGINT) AS stage, source
FROM rr
QUALIFY curriculum_rank <= 1000
ORDER BY curriculum_rank
""",
)
def source_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Easy-to-hard, source-interleaved curriculum order (B102) — quartile
    stages on the difficulty proxy via the exact-rank two-form (no
    corpus-global ntile window), round-robin across sources within a
    stage; first 1000 positions via TakeOrdered, with the final rank
    assigned over that bounded 1000-row frame only."""
    from vectordb_hr_data_spark.operators.quantiles import with_exact_ntile

    d = read_table(spark, sf_dir, "documents")
    staged = with_exact_ntile(
        d.select("doc_id", "source", "n_chars"), 4, "n_chars", "doc_id", "stage"
    )
    rr = staged.withColumn(
        "rank_in_source",
        F.row_number().over(Window.partitionBy("stage", "source").orderBy("doc_id")),
    )
    top = rr.orderBy("stage", "rank_in_source", "source", "doc_id").limit(1000)
    return (
        top.withColumn(
            "curriculum_rank",
            F.row_number()
            .over(Window.orderBy("stage", "rank_in_source", "source", "doc_id"))
            .cast("long"),
        )
        .select("curriculum_rank", "doc_id", F.col("stage").cast("long").alias("stage"), "source")
        .orderBy("curriculum_rank")
    )


# ---------------------------------------------------------------------------
# B103: Zipf-slope corpus audit
# ---------------------------------------------------------------------------
# Does the corpus LOOK like natural language? Natural text follows Zipf
# (log-log slope ~ -1); a synthetic or template-heavy mix shows up as a
# flat or cliffed head. One number per corpus: the least-squares slope of
# ln(count) on ln(rank) over the top-100 terms. Determinism: ln values
# are micro-quantized PER TERM (exact-int sums are order-independent;
# transcendental quantization is the accepted measure-0 convention), the
# slope is one scalar double expression over five exact ints. The top-100
# head comes from orderBy().limit() (TakeOrderedAndProject — no global
# window), the r5 rank-column rule.
@register(
    "doc_zipf_slope",
    """
WITH terms AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term FROM documents
), counted AS (
  SELECT term, count(*) AS cnt FROM terms WHERE term <> '' GROUP BY term
), head AS (
  SELECT cnt FROM counted ORDER BY cnt DESC, term LIMIT 100
), ranked AS (
  SELECT CAST(floor(ln(row_number() OVER (ORDER BY cnt DESC)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(cnt) * 1000000 + 0.5) AS BIGINT) AS y
  FROM head
), s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_head_terms,
       CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE))
                  / (CAST(n * sxx - sx * sx AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         AS zipf_slope_micro
FROM s
""",
)
def doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf log-log slope of the top-100 term head (B103) — the
    natural-language shape audit for a corpus mix."""
    d = read_table(spark, sf_dir, "documents")
    counted = (
        d.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    head = counted.orderBy(F.col("cnt").desc(), "term").limit(100)
    ranked = head.select(
        F.expr("CAST(floor(ln(row_number() OVER (ORDER BY cnt DESC)) * 1000000 + 0.5) AS BIGINT)")
        .alias("x"),
        F.expr("CAST(floor(ln(cnt) * 1000000 + 0.5) AS BIGINT)").alias("y"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_head_terms"),
        F.expr(
            "CAST(floor((CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE))"
            " / (CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)) * 1000000 + 0.5)"
            " AS BIGINT)"
        ).alias("zipf_slope_micro"),
    )


# ---------------------------------------------------------------------------
# B109: curriculum x token-budget training schedule (B102 ∘ B37)
# ---------------------------------------------------------------------------
# The materialized training ORDER a run actually consumes: stage docs
# easy-to-hard (B102's ntile on the difficulty proxy), give every
# (source, stage) cell a TOKEN budget drawn in seeded-hash order (B37's
# reproducible draw, budgets per cell so no stage exhausts a source for
# the later stages), then round-robin the kept docs across sources
# within each stage. Three composed disciplines, one plan, no new
# primitives — the point of building operators as algebra. Scale shape:
# the stage assignment is the B102 note (exact-quantile boundaries at
# 100 TB), the budget window shuffles once on the (source) key with
# per-cell running sums, the final rank orders kept rows only.
CURRICULUM_STAGE_BUDGET = 400


@register(
    "curriculum_token_budget",
    f"""
WITH staged AS (
  SELECT doc_id, source, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ntile(4) OVER (ORDER BY n_chars, doc_id) AS stage,
         md5(CAST(doc_id AS VARCHAR) || ':curriculum') AS ord_key
  FROM documents
), budgeted AS (
  SELECT doc_id, source, stage, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source, stage ORDER BY ord_key, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM staged
), kept AS (
  SELECT doc_id, source, stage, n_tokens, cum_tokens,
         row_number() OVER (PARTITION BY stage, source ORDER BY cum_tokens, doc_id)
           AS rank_in_source
  FROM budgeted WHERE cum_tokens <= {CURRICULUM_STAGE_BUDGET}
)
SELECT CAST(row_number() OVER (ORDER BY stage, rank_in_source, source, doc_id) AS BIGINT)
         AS schedule_rank,
       doc_id, CAST(stage AS BIGINT) AS stage, source, n_tokens, cum_tokens
FROM kept
ORDER BY schedule_rank
""",
)
def curriculum_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Easy-to-hard, source-interleaved, token-budgeted training schedule
    (B109 = B102 ∘ B37): per-(source, stage) seeded budget draw, then
    round-robin interleave of the kept docs."""
    from vectordb_hr_data_spark.operators.quantiles import with_exact_ntile

    d = read_table(spark, sf_dir, "documents")
    # quartile stage via the exact-rank two-form — no corpus-global ntile;
    # the FINAL schedule_rank window below is bounded by the token budget
    # (4 stages x |sources| x budget rows), not by corpus size.
    staged = with_exact_ntile(
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":curriculum"))).alias(
                "ord_key"
            ),
        ),
        4,
        "n_chars",
        "doc_id",
        "stage",
    )
    wb = (
        Window.partitionBy("source", "stage")
        .orderBy("ord_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budgeted = staged.select(
        "doc_id",
        "source",
        "stage",
        "n_tokens",
        F.sum("n_tokens").over(wb).cast("long").alias("cum_tokens"),
    )
    kept = budgeted.filter(F.col("cum_tokens") <= CURRICULUM_STAGE_BUDGET).withColumn(
        "rank_in_source",
        F.row_number().over(Window.partitionBy("stage", "source").orderBy("cum_tokens", "doc_id")),
    )
    return (
        kept.withColumn(
            "schedule_rank",
            F.row_number()
            .over(Window.orderBy("stage", "rank_in_source", "source", "doc_id"))
            .cast("long"),
        )
        .select(
            "schedule_rank",
            "doc_id",
            F.col("stage").cast("long").alias("stage"),
            "source",
            "n_tokens",
            "cum_tokens",
        )
        .orderBy("schedule_rank")
    )


# ---------------------------------------------------------------------------
# B117: deterministic Poisson-bootstrap CI for the corpus median
# ---------------------------------------------------------------------------
# Uncertainty quantification in ONE distributed pass: the classic
# Poisson bootstrap (each row joins resample b with an independent
# ~Poisson(1) weight — the only bootstrap that needs no global resample
# shuffle) made engine-exact by drawing the weight from md5(doc:b) % 16
# against the integer pmf [0]*6 [1]*6 [2]*3 [3]*1 (≈ .375/.375/.1875/
# .0625, matching Poisson(1)'s .368/.368/.184/.061 to ~2%). 32 resamples
# → 32 exact lower weighted medians (cum-weight rank discipline, never
# interpolation) → the CI is the 2nd/31st order statistic, the point
# estimate the 16th (lower median of medians). Everything is integer
# rank arithmetic, so the full bootstrap replays in SQL. Scale shape:
# docs×32 replicas partition by resample id (32 uniform window
# partitions); at 100 TB the per-resample median swaps to the exact-rank
# two-pass like every median here, weights unchanged.
BOOT_RESAMPLES = 32
_BOOT_PMF = "CASE WHEN hw < 6 THEN 0 WHEN hw < 12 THEN 1 WHEN hw < 15 THEN 2 ELSE 3 END"


@register(
    "doc_length_median_ci",
    f"""
WITH reps AS (
  SELECT CAST(unnest(range({BOOT_RESAMPLES})) AS INT) AS b
), weighted AS (
  SELECT r.b, d.n_chars,
         {_BOOT_PMF.replace("hw", "CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':boot:' || CAST(r.b AS VARCHAR)), 1, 8)) AS BIGINT) % 16")} AS w
  FROM documents d, reps r
), nz AS (
  SELECT b, n_chars, w,
         sum(w) OVER (PARTITION BY b ORDER BY n_chars, w
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(w) OVER (PARTITION BY b) AS totw
  FROM weighted WHERE w > 0
), meds AS (
  SELECT b, min(n_chars) AS med
  FROM nz WHERE cumw * 2 >= totw + (totw % 2)
  GROUP BY b
), ranked AS (
  SELECT med, row_number() OVER (ORDER BY med, b) AS rk FROM meds
)
SELECT CAST(count(*) AS BIGINT) AS n_resamples,
       CAST(max(CASE WHEN rk = 2 THEN med END) AS BIGINT) AS ci_lo,
       CAST(max(CASE WHEN rk = {BOOT_RESAMPLES // 2} THEN med END) AS BIGINT) AS point_median,
       CAST(max(CASE WHEN rk = {BOOT_RESAMPLES - 1} THEN med END) AS BIGINT) AS ci_hi
FROM ranked
""",
)
def doc_length_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 32-resample Poisson-bootstrap CI for the corpus
    median length (B117) — seeded integer weights, exact weighted-median
    ranks, order-statistic CI."""
    reps = spark.range(BOOT_RESAMPLES).select(F.col("id").cast("int").alias("b"))
    d = read_table(spark, sf_dir, "documents")
    hw = (
        "cast(conv(substring(md5(concat(cast(doc_id as string), ':boot:',"
        " cast(b as string))), 1, 8), 16, 10) as bigint) % 16"
    )
    weighted = d.crossJoin(F.broadcast(reps)).select(
        "b", "n_chars", F.expr(_BOOT_PMF.replace("hw", hw)).alias("w")
    )
    nz = weighted.filter(F.col("w") > 0)
    wc = (
        Window.partitionBy("b")
        .orderBy("n_chars", "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("b")
    cum = nz.select(
        "b",
        "n_chars",
        F.sum("w").over(wc).alias("cumw"),
        F.sum("w").over(wt).alias("totw"),
    )
    meds = (
        cum.filter(F.col("cumw") * 2 >= F.col("totw") + F.col("totw") % 2)
        .groupBy("b")
        .agg(F.min("n_chars").alias("med"))
    )
    ranked = meds.select(
        "med", "b", F.row_number().over(Window.orderBy("med", "b")).alias("rk")
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_resamples"),
        F.max(F.when(F.col("rk") == 2, F.col("med"))).cast("long").alias("ci_lo"),
        F.max(F.when(F.col("rk") == BOOT_RESAMPLES // 2, F.col("med")))
        .cast("long")
        .alias("point_median"),
        F.max(F.when(F.col("rk") == BOOT_RESAMPLES - 1, F.col("med")))
        .cast("long")
        .alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# B134: semantic decontamination against a held-out eval set (r9)
# ---------------------------------------------------------------------------
# The third rung of the decontamination ladder: doc_decontaminate
# catches exact matches, the Bloom form scales the membership test,
# and THIS op catches paraphrases — training docs whose EMBEDDING sits
# too close to any eval item survive text-level checks but still leak
# the benchmark (Lee et al.'s deduplication-and-contamination lesson at
# the semantic level). The eval set (deterministic doc_id % 41 slice
# here; benchmark embeddings in production) is small by construction,
# so the scan shape is the ideal one: eval vectors BROADCAST, one
# map-side cosine per (corpus row x eval row) fused into a per-row max
# — no shuffle at all until the |corpus| flag rows aggregate, and the
# 100 TB cost is exactly one pass over the embedding column. Cosines
# round to 4 decimals before the max/argmax so both engines pick the
# same nearest eval id (ties break on the smaller eval_id).
SEM_DECON_MOD = 41
SEM_DECON_THRESH = 0.95


@register(
    "semantic_decontaminate",
    f"""
WITH ev AS (
  SELECT vec_id AS eval_id, embedding AS ev_emb FROM embeddings
  WHERE vec_id % {SEM_DECON_MOD} = 0
), corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % {SEM_DECON_MOD} <> 0
), sims AS (
  SELECT c.vec_id, e.eval_id,
         round(
           list_sum(list_transform(range(1, len(c.embedding)+1),
               i -> CAST(c.embedding[i] AS DOUBLE) * CAST(e.ev_emb[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(e.ev_emb,    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           4) AS sim
  FROM corpus c CROSS JOIN ev e
), best AS (
  SELECT vec_id, sim AS max_sim, eval_id AS nearest_eval_id
  FROM (SELECT vec_id, sim, eval_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, eval_id) AS rn
        FROM sims)
  WHERE rn = 1
)
SELECT vec_id, max_sim + 0.0 AS max_sim, nearest_eval_id,
       CAST(CASE WHEN max_sim >= {SEM_DECON_THRESH} THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM best
ORDER BY vec_id
""",
)
def semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level decontamination vs a broadcast eval set (B134) —
    per-corpus-row max cosine + nearest eval id, flagged at
    SEM_DECON_THRESH; the paraphrase-catching rung above the exact and
    Bloom decontaminate ops."""
    from ..functions import vector as V

    emb = read_table(spark, sf_dir, "embeddings")
    # norms factor OUT of the pair loop: cosine = dot/(na*nb) evaluates
    # the SAME double product whether na/nb are inlined or precomputed
    # (identical fold, identical multiply order), so hoisting them costs
    # nothing in parity and cuts the interpreted HOF work per pair from
    # three folds to one — the dominant cost of a HOF (CodegenFallback)
    # cross score. Corpus norm: once per row; eval norms: once per eval
    # inside the broadcast.
    ev = emb.filter(F.col("vec_id") % SEM_DECON_MOD == 0).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("ev_emb"),
        V.norm(F.col("embedding")).alias("ev_norm"),
    )
    corpus = emb.filter(F.col("vec_id") % SEM_DECON_MOD != 0).select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("c_norm")
    )
    denom = F.col("c_norm") * F.col("ev_norm")
    sims = corpus.crossJoin(F.broadcast(ev)).select(
        "vec_id",
        "eval_id",
        F.round(
            F.when(denom == 0, F.lit(0.0)).otherwise(
                V.dot(F.col("embedding"), F.col("ev_emb")) / denom
            ),
            4,
        ).alias("sim"),
    )
    wr = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("eval_id").asc())
    best = sims.select(
        "vec_id", "sim", "eval_id", F.row_number().over(wr).alias("rn")
    ).filter(F.col("rn") == 1)
    return best.select(
        "vec_id",
        (F.col("sim") + F.lit(0.0)).alias("max_sim"),
        F.col("eval_id").alias("nearest_eval_id"),
        F.when(F.col("sim") >= SEM_DECON_THRESH, 1).otherwise(0).cast("long").alias(
            "contaminated"
        ),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# B139: n-gram novelty by ingestion position (r9)
# ---------------------------------------------------------------------------
# The memorization-side complement of dup-ngram coverage: instead of
# "how much of this doc is duplicated anywhere", this measures "how
# much of this doc was NEW when it arrived" — per document, the share
# of its distinct trigrams whose first corpus occurrence (min doc_id,
# doc_id standing in for ingestion order) is this document. Plotted
# against doc_id this is the novelty-decay curve every crawl exhibits,
# and the quantity data-mixing decisions weight fresh sources by.
# Shape: distinct (doc, gram) incidence, one gram-key min-aggregate
# (uniform keys — trigram strings; swap for the 8-byte polynomial at
# 100 TB like the dup-coverage op documents), join back on gram, one
# doc-key count. Nothing quadratic; the gram table is the same one the
# dedup family already builds.
NOVELTY_N = 3


@register(
    "doc_ngram_novelty",
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[CAST(i AS INT):CAST(i AS INT) + {NOVELTY_N} - 1], ' ') AS g
  FROM toks, unnest(range(1, len(t) - {NOVELTY_N} + 2)) AS r(i)
), own AS (
  SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc FROM grams GROUP BY g
)
SELECT gr.doc_id,
       CAST(count(*) AS BIGINT) AS n_distinct_grams,
       CAST(sum(CASE WHEN o.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(sum(CASE WHEN o.first_doc = gr.doc_id THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS novelty_micro
FROM grams gr JOIN own o USING (g)
GROUP BY gr.doc_id
ORDER BY gr.doc_id
""",
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of each doc's distinct trigrams first seen (by min doc_id)
    in that doc (B139) — the novelty-decay curve by ingestion position;
    gram-key min-agg + join back, never cross-document pairs."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    grams = (
        toks.select(
            "doc_id",
            # Docs shorter than N tokens yield no grams. The guard matters:
            # without it sequence(0, -1) auto-steps DOWN to [0, -1] and
            # slice(t, 0+1=...start 0) throws INVALID_PARAMETER_VALUE.START;
            # the oracle's range(1, len-1) simply emits nothing.
            F.explode(
                F.expr(
                    f"CASE WHEN size(t) >= {NOVELTY_N} THEN"
                    f" transform(sequence(0, size(t) - {NOVELTY_N}),"
                    f" i -> array_join(slice(t, i + 1, {NOVELTY_N}), ' '))"
                    " ELSE array() END"
                )
            ).alias("g"),
        )
        .distinct()
    )
    own = grams.groupBy("g").agg(F.min("doc_id").cast("long").alias("first_doc"))
    return (
        grams.join(own, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_distinct_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
            F.expr(
                "sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000000 div count(*)"
            )
            .cast("long")
            .alias("novelty_micro"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B150: per-source percentile-normalized quality gate (r9)
# ---------------------------------------------------------------------------
# The curation fix for source bias: a GLOBAL quality threshold lets a
# verbose source crowd out a terse one because raw scores are not
# comparable across sources — the standard remedy ranks WITHIN source
# and gates on the per-source percentile (keep the top half here),
# then reports how differently the global gate would have treated each
# source. Scores are the B6 quality signals quantized once to integer
# e6; ranks are exact with (score desc, doc_id) tie-breaks; both gates
# use the house ceil(n/2) rank cut. Shape: one map pass for scores,
# one window per source (uniform keys) and one global-median scalar
# broadcast — the output is |sources| rows.
@register(
    "source_quality_percentile_gate",
    """
WITH m AS (
  SELECT doc_id, source,
         string_split(text, ' ') AS toks
  FROM documents
), s AS (
  SELECT doc_id, source,
         CAST(round((0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
              + 0.3 * least(len(toks) / 100.0, 1.0)
              + 0.3 * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','de','le','el'], x))) AS DOUBLE) / len(toks))) * 1000000.0) AS BIGINT) AS q_e6
  FROM m
), ranked AS (
  SELECT doc_id, source, q_e6,
         row_number() OVER (PARTITION BY source ORDER BY q_e6 DESC, doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM s
), grank AS (
  SELECT doc_id, q_e6,
         row_number() OVER (ORDER BY q_e6 DESC, doc_id) AS grk,
         count(*) OVER () AS gn
  FROM s
), gcut AS (
  SELECT min(q_e6) AS g_boundary FROM grank WHERE grk <= CAST(ceil(gn * 0.5) AS BIGINT)
)
SELECT r.source,
       CAST(max(r.n) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN r.rk <= CAST(ceil(r.n * 0.5) AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept_source_norm,
       CAST(sum(CASE WHEN r.q_e6 >= g.g_boundary THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept_global,
       CAST(min(CASE WHEN r.rk <= CAST(ceil(r.n * 0.5) AS BIGINT) THEN r.q_e6 END) AS BIGINT)
         AS boundary_q_e6
FROM ranked r CROSS JOIN gcut g
GROUP BY r.source
ORDER BY r.source
""",
)
def source_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-half quality gate vs the global-median gate (B150)
    — exact percentile ranks within source, integer e6 scores; the
    table showing how much a global threshold would bias each source."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in ["the", "a", "de", "le", "el"]])
    s = d.select(
        "doc_id",
        "source",
        F.round(
            (
                0.4 * (F.size(F.array_distinct(toks)).cast("double") / F.size(toks))
                + 0.3 * F.least(F.size(toks) / 100.0, F.lit(1.0))
                + 0.3
                * (
                    1.0
                    - F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast(
                        "double"
                    )
                    / F.size(toks)
                )
            )
            * 1000000.0
        )
        .cast("long")
        .alias("q_e6"),
    )
    wr = Window.partitionBy("source").orderBy(F.col("q_e6").desc(), F.col("doc_id").asc())
    wp = Window.partitionBy("source")
    ranked = s.select(
        "source",
        "q_e6",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wp).alias("n"),
    )
    # global cut: the deliberate single-partition window runs over the
    # score column only; at 100 TB swap for approx_percentile + the
    # exact-rank audit (the B13 two-form pattern).
    wg = Window.orderBy(F.col("q_e6").desc(), F.col("doc_id").asc())
    grank = s.select(
        "q_e6", F.row_number().over(wg).alias("grk"), F.count("*").over(Window.partitionBy()).alias("gn")
    )
    gcut = grank.filter(F.col("grk") <= F.ceil(F.col("gn") * 0.5)).agg(
        F.min("q_e6").alias("g_boundary")
    )
    return (
        ranked.crossJoin(F.broadcast(gcut))
        .groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("rk") <= F.ceil(F.col("n") * 0.5), 1).otherwise(0))
            .cast("long")
            .alias("n_kept_source_norm"),
            F.sum(F.when(F.col("q_e6") >= F.col("g_boundary"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept_global"),
            F.min(F.when(F.col("rk") <= F.ceil(F.col("n") * 0.5), F.col("q_e6")))
            .cast("long")
            .alias("boundary_q_e6"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B166: corpus snapshot diff (release changelog) (r9)
# ---------------------------------------------------------------------------
# What changed between corpus releases? The previous snapshot here is
# the deterministic doc_id % 50 != 0 slice (a stand-in with the exact
# shape of a real prior release table); the diff is ONE full-outer
# join on doc_id with md5(text) deciding changed-vs-unchanged, rolled
# up per source into added/removed/changed/unchanged counts plus a
# churn rate. This is the release gate a training-data pipeline prints
# before promoting a snapshot. Shape: one uniform-key full-outer join,
# |sources| output rows; content hashes compare without moving text.
SNAPSHOT_MOD = 50


@register(
    "corpus_snapshot_diff",
    f"""
WITH prev AS (
  SELECT doc_id, source, md5(text) AS h FROM documents WHERE doc_id % {SNAPSHOT_MOD} <> 0
), cur AS (
  SELECT doc_id, source, md5(text || CASE WHEN doc_id % 7 = 0 THEN ' v2' ELSE '' END) AS h
  FROM documents
), d AS (
  SELECT coalesce(c.source, p.source) AS source,
         CASE WHEN p.doc_id IS NULL THEN 'added'
              WHEN c.doc_id IS NULL THEN 'removed'
              WHEN c.h <> p.h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM cur c FULL OUTER JOIN prev p ON p.doc_id = c.doc_id
)
SELECT source,
       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       CAST(sum(CASE WHEN status <> 'unchanged' THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS churn_ppm
FROM d
GROUP BY source
ORDER BY source
""",
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source added/removed/changed/unchanged counts between two
    corpus snapshots via content-hash full-outer join (B166) — the
    release changelog gate; a deterministic prior-slice stand-in keeps
    the op oracle-checked while a real deployment feeds two tables."""
    d = read_table(spark, sf_dir, "documents")
    prev = d.filter(F.col("doc_id") % SNAPSHOT_MOD != 0).select(
        F.col("doc_id").alias("p_id"), F.col("source").alias("p_source"), F.md5("text").alias("p_h")
    )
    cur = d.select(
        F.col("doc_id").alias("c_id"),
        F.col("source").alias("c_source"),
        F.md5(
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 7 == 0, F.lit(" v2")).otherwise(F.lit("")),
            )
        ).alias("c_h"),
    )
    # Classify on ROW presence (p_id/c_id NULL through the full-outer join),
    # exactly like the oracle's `p.doc_id IS NULL` — not on hash NULL-ness:
    # a present row with NULL text hashes to NULL and would otherwise be
    # misclassified as added/removed on this side only.
    diff = cur.join(prev, F.col("c_id") == F.col("p_id"), "full_outer").select(
        F.coalesce(F.col("c_source"), F.col("p_source")).alias("source"),
        F.when(F.col("p_id").isNull(), "added")
        .when(F.col("c_id").isNull(), "removed")
        .when(F.col("c_h") != F.col("p_h"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        diff.groupBy("source")
        .agg(
            F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).cast("long").alias("n_added"),
            F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).cast("long").alias("n_removed"),
            F.sum(F.when(F.col("status") == "changed", 1).otherwise(0)).cast("long").alias("n_changed"),
            F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0)).cast("long").alias("n_unchanged"),
            F.expr(
                "sum(CASE WHEN status <> 'unchanged' THEN 1 ELSE 0 END) * 1000000 div count(*)"
            )
            .cast("long")
            .alias("churn_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B168: Heaps'-law vocabulary growth fit (r9)
# ---------------------------------------------------------------------------
# The scaling law data planning actually uses: V(n) ~ K * n^beta —
# how fast vocabulary grows with corpus size decides tokenizer vocab
# budgets and dedup dividends at 10x the data. Cumulative token and
# vocab counts by ingestion order come from the SAME first-occurrence
# table the novelty curve builds (min doc_id per term), the log-log
# points quantize once to integer micro (the B103 Zipf discipline),
# and the OLS slope is beta. Moment sums ride decimal(38,0)/HUGEINT —
# at 5e3 points of ~1.3e7-micro logs the x*y sum brushes int64 (the
# B144 128-bit rule, applied proactively). Cumulative windows run
# over the doc-level table (already reduced from tokens).
@register(
    "doc_heaps_law_fit",
    """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), td AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS t FROM toks WHERE term <> '' GROUP BY doc_id
), firstd AS (
  SELECT term, CAST(min(doc_id) AS BIGINT) AS fd FROM toks WHERE term <> '' GROUP BY term
), newv AS (
  SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS nv FROM firstd GROUP BY fd
), cum AS (
  SELECT d.doc_id,
         CAST(sum(d.t) OVER (ORDER BY d.doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
         CAST(sum(coalesce(n.nv, 0)) OVER (ORDER BY d.doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
  FROM td d LEFT JOIN newv n ON n.doc_id = d.doc_id
), pts AS (
  SELECT CAST(floor(ln(cum_tokens) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(cum_vocab) * 1000000 + 0.5) AS BIGINT) AS y
  FROM cum WHERE cum_tokens > 0 AND cum_vocab > 0
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_points,
       CAST((SELECT max(cum_tokens) FROM cum) AS BIGINT) AS total_tokens,
       CAST((SELECT max(cum_vocab) FROM cum) AS BIGINT) AS total_vocab,
       CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE))
                  / (CAST(n * sxx - sx * sx AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         AS heaps_beta_micro
FROM s
""",
)
def doc_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent from cumulative vocab-vs-tokens by ingestion
    order (B168) — first-occurrence table, micro-quantized log-log
    points, 128-bit moment sums; the vocabulary-growth planning
    number."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")).filter(
        F.col("term") != ""
    )
    td = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("t"))
    firstd = toks.groupBy("term").agg(F.min("doc_id").cast("long").alias("fd"))
    newv = firstd.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count("*").cast("long").alias("nv")
    )
    # cumulative window over the doc-level table — already reduced from
    # the token stream; the deliberate single-partition sweep.
    wc = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        td.join(newv, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("t").over(wc).cast("long").alias("cum_tokens"),
            F.sum(F.coalesce("nv", F.lit(0))).over(wc).cast("long").alias("cum_vocab"),
        )
    )
    pts = cum.filter((F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)).select(
        F.expr("CAST(floor(ln(cum_tokens) * 1000000 + 0.5) AS BIGINT)").alias("x"),
        F.expr("CAST(floor(ln(cum_vocab) * 1000000 + 0.5) AS BIGINT)").alias("y"),
    )
    dec = "decimal(38,0)"
    s = pts.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
    )
    tot = cum.agg(
        F.max("cum_tokens").cast("long").alias("total_tokens"),
        F.max("cum_vocab").cast("long").alias("total_vocab"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("long").alias("n_points"),
        "total_tokens",
        "total_vocab",
        F.floor(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("heaps_beta_micro"),
    )


# ---------------------------------------------------------------------------
# B172: greedy submodular coverage selection (r9)
# ---------------------------------------------------------------------------
# The data-subset-selection classic (facility-location/set-cover form,
# Wei et al. ICML'15): pick K documents one at a time, each maximizing
# the count of vocabulary terms NOT yet covered — the greedy that
# carries the (1 - 1/e) guarantee. Iteration state is the covered-term
# set (vocabulary-bounded); the argmax packs (gain, doc_id-tiebreak)
# into one max() integer — the B61 recursive-CTE trick — so the DuckDB
# oracle replays the greedy loop exactly. Spark side: K rounds of a
# distributed marginal-gain scan against the broadcast covered set
# (at 100 TB the set travels as term hashes; the scan per round is the
# map pass any coverage metric pays), argmax via TakeOrdered(1).
COVER_K = 5
_PACK = 8388608  # 2^23 — packs gain*M + (M-1-doc_id) for the argmax trick


@register(
    "doc_greedy_coverage_select",
    f"""
WITH RECURSIVE dt AS (
  SELECT doc_id, list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS ts
  FROM documents
), sel AS (
  SELECT * FROM (
    SELECT CAST(1 AS BIGINT) AS rnk, doc_id,
           CAST(len(ts) AS BIGINT) AS gain,
           list_sort(ts) AS covered,
           [doc_id] AS sel_ids
    FROM dt ORDER BY len(ts) DESC, doc_id LIMIT 1
  )
  UNION ALL
  SELECT t.rnk, c.doc_id,
         CAST(t.e // {_PACK} AS BIGINT) AS gain,
         list_sort(list_distinct(list_concat(t.covered, c.ts))) AS covered,
         list_append(t.sel_ids, c.doc_id) AS sel_ids
  FROM (
    SELECT s.rnk + 1 AS rnk, any_value(s.covered) AS covered,
           any_value(s.sel_ids) AS sel_ids,
           max(CAST(len(list_filter(d.ts, x -> NOT list_contains(s.covered, x))) AS BIGINT)
               * {_PACK} + ({_PACK} - 1 - d.doc_id)) AS e
    FROM sel s, dt d
    WHERE s.rnk < {COVER_K} AND NOT list_contains(s.sel_ids, d.doc_id)
    GROUP BY s.rnk + 1
  ) t
  JOIN dt c ON c.doc_id = {_PACK} - 1 - (t.e % {_PACK})
)
SELECT rnk, doc_id, gain,
       CAST(len(covered) AS BIGINT) AS covered_after
FROM sel ORDER BY rnk
""",
)
def doc_greedy_coverage_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy K=5 max-coverage document selection over distinct terms
    (B172) — the submodular subset-selection classic; packed-argmax
    recursive oracle, K distributed marginal-gain rounds on the Spark
    side."""
    d = read_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id",
        F.expr("array_distinct(filter(split(text, ' '), x -> x <> ''))").alias("ts"),
    )
    covered: set[str] = set()
    picked: list[tuple[int, int, int, int]] = []
    chosen: set[int] = set()
    for step in range(1, COVER_K + 1):
        cov_arr = F.array(*[F.lit(x) for x in sorted(covered)]) if covered else F.array()
        # the covered set rides as a literal broadcast column
        gains = (
            dt.filter(~F.col("doc_id").isin(list(chosen)) if chosen else F.lit(True))
            .withColumn("cov", cov_arr)
            .select(
                "doc_id",
                F.size(F.filter(F.col("ts"), lambda x: ~F.array_contains(F.col("cov"), x)))
                .cast("long")
                .alias("g"),
                "ts",
            )
        )
        top = gains.orderBy(F.col("g").desc(), F.col("doc_id").asc()).limit(1).collect()[0]
        covered |= set(top.ts)
        chosen.add(top.doc_id)
        picked.append((step, int(top.doc_id), int(top.g), len(covered)))
    return spark.createDataFrame(
        picked, "rnk long, doc_id long, gain long, covered_after long"
    ).orderBy("rnk")


# ---------------------------------------------------------------------------
# B175: canary-string detection (eval-set watermark scan) (r9)
# ---------------------------------------------------------------------------
# Benchmark suites embed canary GUIDs precisely so training pipelines
# can prove they filtered them (the BIG-bench practice); a corpus
# release that cannot show a canary scan ran is not decontaminated.
# The scan is a map-side multi-literal containment pass per source —
# canaries here are deterministic corpus substrings so the op has
# non-trivial output to hash-check; a real deployment swaps the
# literal list. Per source: docs scanned, docs flagged, per-canary
# hit counts as a stable pivoted layout. The 100 TB cost is the scan
# every release audit already pays; at large canary sets the literal
# OR-chain swaps for an Aho-Corasick UDF, plumbing unchanged.
CANARIES = ["spark join", "window batch", "hash merge"]


@register(
    "doc_canary_detection",
    f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN {" OR ".join(f"contains(text, '{c}')" for c in CANARIES)}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       {", ".join(f"CAST(sum(CASE WHEN contains(text, '{c}') THEN 1 ELSE 0 END) AS BIGINT) AS hits_{i}" for i, c in enumerate(CANARIES))},
       CAST(sum(CASE WHEN {" OR ".join(f"contains(text, '{c}')" for c in CANARIES)}
                     THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS flagged_ppm
FROM documents
GROUP BY source
ORDER BY source
""",
)
def doc_canary_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source canary-substring scan (B175) — the release audit that
    proves eval watermarks were filtered; map-side multi-literal
    containment, per-canary hit columns."""
    d = read_table(spark, sf_dir, "documents")
    any_hit = None
    for c in CANARIES:
        h = F.col("text").contains(c)
        any_hit = h if any_hit is None else (any_hit | h)
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(any_hit, 1).otherwise(0)).cast("long").alias("n_flagged"),
            *[
                F.sum(F.when(F.col("text").contains(c), 1).otherwise(0))
                .cast("long")
                .alias(f"hits_{i}")
                for i, c in enumerate(CANARIES)
            ],
            F.expr(
                "sum(CASE WHEN "
                + " OR ".join(f"contains(text, '{c}')" for c in CANARIES)
                + " THEN 1 ELSE 0 END) * 1000000 div count(*)"
            )
            .cast("long")
            .alias("flagged_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B176: token-weighted dedup impact (r9)
# ---------------------------------------------------------------------------
# Doc-level dedup rates undersell the win: training compute is spent
# per TOKEN, so the number a pipeline owner needs is "what share of
# TOKENS sits in redundant copies". Exact-dup groups (md5 text, the B1
# definition) weight by whitespace token counts; per source: total
# tokens, redundant tokens (every copy beyond each group's keeper),
# doc- vs token-level dedup rates side by side — divergence between
# the two columns means duplication concentrates in long or short
# docs. One md5 groupBy + one source rollup; token counts ride the
# same expression as B6.
@register(
    "dedup_token_impact",
    """
WITH t AS (
  SELECT doc_id, source, md5(text) AS h,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
), g AS (
  SELECT source, h,
         CAST(count(*) AS BIGINT) AS n_copies,
         CAST(sum(n_tok) AS BIGINT) AS tok_all,
         CAST(min(n_tok) AS BIGINT) AS tok_keep
  FROM t GROUP BY source, h
)
SELECT source,
       CAST(sum(n_copies) AS BIGINT) AS n_docs,
       CAST(sum(n_copies) - count(*) AS BIGINT) AS n_redundant_docs,
       CAST(sum(tok_all) AS BIGINT) AS total_tokens,
       CAST(sum(tok_all - tok_keep) AS BIGINT) AS redundant_tokens,
       CAST((sum(n_copies) - count(*)) * 1000000 // sum(n_copies) AS BIGINT) AS doc_dedup_ppm,
       CAST(sum(tok_all - tok_keep) * 1000000 // greatest(sum(tok_all), 1) AS BIGINT)
         AS token_dedup_ppm
FROM g
GROUP BY source
ORDER BY source
""",
)
def dedup_token_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level vs TOKEN-level exact-dup rates per source (B176) — the
    compute-weighted dedup dividend; every copy beyond each md5 group's
    keeper counts as redundant tokens."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        F.md5("text").alias("h"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    g = t.groupBy("source", "h").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.sum("n_tok").cast("long").alias("tok_all"),
        F.min("n_tok").cast("long").alias("tok_keep"),
    )
    return (
        g.groupBy("source")
        .agg(
            F.sum("n_copies").cast("long").alias("n_docs"),
            (F.sum("n_copies") - F.count("*")).cast("long").alias("n_redundant_docs"),
            F.sum("tok_all").cast("long").alias("total_tokens"),
            F.sum(F.col("tok_all") - F.col("tok_keep")).cast("long").alias("redundant_tokens"),
            F.expr("(sum(n_copies) - count(*)) * 1000000 div sum(n_copies)")
            .cast("long")
            .alias("doc_dedup_ppm"),
            F.expr("sum(tok_all - tok_keep) * 1000000 div greatest(sum(tok_all), 1)")
            .cast("long")
            .alias("token_dedup_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B180: order-independent per-source corpus fingerprint (release identity)
# ---------------------------------------------------------------------------
# "Is the corpus you trained on the corpus I audited?" needs an identity
# that is cheap, deterministic, and ORDER-INDEPENDENT — a Merkle chain
# over file order breaks the moment a shuffle-shard writer reorders
# rows. This fingerprint is three associative reductions over per-doc
# 60-bit content hashes (md5 prefix over doc_id||text): count, XOR, and
# modular sum (mod 2^61−1, summed in decimal(38,0)/HUGEINT so no
# intermediate overflows int64). Any single changed/added/dropped doc
# flips the triple with overwhelming probability; any row order or
# partitioning yields the SAME triple — which also makes it free to
# maintain under streaming ingest (stream_source_fingerprint folds
# micro-batches through the same algebra; 4-batch parity pytest).
FP_MOD = (1 << 61) - 1


@register(
    "source_corpus_fingerprint",
    f"""
WITH h AS (
  SELECT source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15)) AS BIGINT)
           AS h60
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(bit_xor(h60) AS BIGINT) AS fp_xor,
       CAST(sum(h60) % {FP_MOD} AS BIGINT) AS fp_sum_mod
FROM h
GROUP BY source
ORDER BY source
""",
)
def source_corpus_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (count, xor, modular-sum) content fingerprint over
    60-bit doc hashes (B180) — order/partitioning-independent corpus
    identity, mergeable under streaming ingest."""
    d = read_table(spark, sf_dir, "documents")
    h = d.select(
        "source",
        F.expr(
            "cast(conv(substring(md5(concat(cast(doc_id as string), '|', text)), 1, 15),"
            " 16, 10) as bigint)"
        ).alias("h60"),
    )
    return (
        h.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("bit_xor(h60)").cast("long").alias("fp_xor"),
            F.expr(f"cast(sum(cast(h60 as decimal(38,0))) % {FP_MOD} as bigint)").alias(
                "fp_sum_mod"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B182: temperature-scaled mixture weights (the multilingual sampling law)
# ---------------------------------------------------------------------------
# B17 APPLIES per-source weights; this op COMPUTES them the way the
# multilingual-corpus papers do (mT5/XLM-R practice): raw token shares
# p_i are flattened through a temperature, q_i ∝ p_i^(1/T), so
# high-resource sources are downsampled and the tail is boosted — T=1
# is proportional sampling, T→∞ uniform. Emits, per (source, T) over
# the published temperature grid: the raw share, the scaled weight, and
# the expected token draw from a fixed per-epoch budget. One bounded
# groupBy(source) + a literal temperature grid; pow/round(.,6) is the
# one float step (both engines' IEEE pow agrees, then everything is
# rounded once).
MIX_TEMPS_CENTI = [100, 200, 333, 500]  # T = 1.0, 2.0, 3.33, 5.0
MIX_EPOCH_BUDGET = 1_000_000  # tokens per epoch in the planning readout


def _temp_mix_oracle() -> str:
    temps = ", ".join(f"({t})" for t in MIX_TEMPS_CENTI)
    return f"""
WITH tok AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
  FROM (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
  GROUP BY source
), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS nt FROM tok),
temps(t_centi) AS (VALUES {temps}),
scaled AS (
  SELECT k.source, k.n_tokens, tp.t_centi,
         CAST(round(power(k.n_tokens * 1.0 / tot.nt, 100.0 / tp.t_centi) * 1000000)
              AS BIGINT) AS q_micro
  FROM tok k CROSS JOIN tot CROSS JOIN temps tp
), z AS (
  SELECT t_centi, CAST(sum(q_micro) AS BIGINT) AS zt FROM scaled GROUP BY t_centi
)
SELECT s.source, s.n_tokens, CAST(s.t_centi AS BIGINT) AS t_centi,
       CAST(round(s.q_micro * 1000000.0 / z.zt) AS BIGINT) AS w_micro,
       CAST(round(s.q_micro * {MIX_EPOCH_BUDGET}.0 / z.zt) AS BIGINT) AS epoch_tokens
FROM scaled s JOIN z ON z.t_centi = s.t_centi
ORDER BY s.source, s.t_centi
"""


@register("corpus_temperature_mix", _temp_mix_oracle())
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled per-source sampling weights q_i ∝ p_i^(1/T)
    over the published temperature grid (B182) — the mixing weights B17
    applies, computed instead of assumed, with the per-epoch token draw
    each (source, T) implies."""
    d = read_table(spark, sf_dir, "documents")
    tok = (
        d.select("source", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_tokens"))
    )
    tot = tok.agg(F.sum("n_tokens").cast("long").alias("nt"))
    temps = spark.createDataFrame([(t,) for t in MIX_TEMPS_CENTI], "t_centi long")
    scaled = (
        tok.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(temps))
        .select(
            "source",
            "n_tokens",
            "t_centi",
            # quantize the one float step (pow) to integer micro IMMEDIATELY:
            # the normalizer is then an exact integer sum, immune to float
            # addition order across partitions.
            F.round(
                F.pow(F.col("n_tokens") / F.col("nt"), 100.0 / F.col("t_centi")) * 1000000
            )
            .cast("long")
            .alias("q_micro"),
        )
    )
    z = scaled.groupBy("t_centi").agg(F.sum("q_micro").cast("long").alias("zt"))
    return (
        scaled.join(F.broadcast(z), "t_centi")
        .select(
            "source",
            "n_tokens",
            "t_centi",
            F.round(F.col("q_micro") * 1000000.0 / F.col("zt")).cast("long").alias("w_micro"),
            F.round(F.col("q_micro") * float(MIX_EPOCH_BUDGET) / F.col("zt"))
            .cast("long")
            .alias("epoch_tokens"),
        )
        .orderBy("source", "t_centi")
    )


# ---------------------------------------------------------------------------
# B187: chunk-stitching integrity audit (self-verifying pipeline step)
# ---------------------------------------------------------------------------
# If the B16 chunker and a downstream consumer disagree about stride or
# boundary handling, documents silently lose or duplicate tokens at
# chunk seams. This audit RECONSTRUCTS each document from its chunks —
# every chunk contributes its non-overlapping head (first stride
# tokens), the final chunk contributes everything it has — stitches
# them in chunk order through a sorted aggregation, and compares the
# md5 of the reconstruction against the original text's md5. A false
# stitch_ok is precisely a seam bug. Shape: the B16 explode, one
# doc-key sorted-list aggregation (fan-in = chunks per doc, bounded by
# doc length), no global window.
@register(
    "chunk_stitch_audit",
    f"""
WITH t AS (
  SELECT doc_id, md5(text) AS orig_md5, string_split(text, ' ') AS toks FROM documents
), n AS (
  SELECT doc_id, orig_md5, toks, len(toks) AS n FROM t
), c AS (
  SELECT doc_id, orig_md5, toks, n,
         unnest(range(0, 1 + CAST(ceil(CAST(greatest(n - {CHUNK_TOKENS}, 0) AS DOUBLE)
                                       / {CHUNK_STRIDE}) AS BIGINT))) AS chunk_idx,
         1 + CAST(ceil(CAST(greatest(n - {CHUNK_TOKENS}, 0) AS DOUBLE)
                       / {CHUNK_STRIDE}) AS BIGINT) AS n_chunks
  FROM n
), pieces AS (
  SELECT doc_id, orig_md5, chunk_idx, n_chunks,
         CASE WHEN chunk_idx = n_chunks - 1
              THEN array_to_string(toks[{CHUNK_STRIDE} * CAST(chunk_idx AS INT) + 1 :
                                        {CHUNK_STRIDE} * CAST(chunk_idx AS INT) + {CHUNK_TOKENS}], ' ')
              ELSE array_to_string(toks[{CHUNK_STRIDE} * CAST(chunk_idx AS INT) + 1 :
                                        {CHUNK_STRIDE} * CAST(chunk_idx AS INT) + {CHUNK_STRIDE}], ' ')
         END AS piece
  FROM c
), stitched AS (
  SELECT doc_id, CAST(max(n_chunks) AS BIGINT) AS n_chunks,
         max(orig_md5) AS orig_md5,
         md5(string_agg(piece, ' ' ORDER BY chunk_idx)) AS stitched_md5
  FROM pieces GROUP BY doc_id
)
SELECT doc_id, n_chunks, stitched_md5 = orig_md5 AS stitch_ok
FROM stitched
ORDER BY doc_id
""",
)
def chunk_stitch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct every document from its B16 chunks (non-overlapping
    heads + full final chunk) and hash-compare against the original
    (B187) — the seam-bug detector chunked pipelines should ship with."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.md5("text").alias("orig_md5"), F.split(F.col("text"), " ").alias("toks")
    )
    n = t.withColumn("n", F.size("toks"))
    n_chunks = (
        1
        + F.ceil(
            F.greatest(F.col("n") - CHUNK_TOKENS, F.lit(0)).cast("double") / CHUNK_STRIDE
        ).cast("long")
    )
    c = n.select(
        "doc_id",
        "orig_md5",
        "toks",
        n_chunks.alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    head = F.expr(
        f"array_join(slice(toks, {CHUNK_STRIDE} * chunk_idx + 1, {CHUNK_STRIDE}), ' ')"
    )
    last = F.expr(
        f"array_join(slice(toks, {CHUNK_STRIDE} * chunk_idx + 1, {CHUNK_TOKENS}), ' ')"
    )
    pieces = c.select(
        "doc_id",
        "orig_md5",
        "n_chunks",
        "chunk_idx",
        F.when(F.col("chunk_idx") == F.col("n_chunks") - 1, last).otherwise(head).alias("piece"),
    )
    stitched = pieces.groupBy("doc_id").agg(
        F.max("n_chunks").cast("long").alias("n_chunks"),
        F.max("orig_md5").alias("orig_md5"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr("transform(array_sort(collect_list(struct(chunk_idx, piece))), x -> x.piece)"),
            )
        ).alias("stitched_md5"),
    )
    return stitched.select(
        "doc_id",
        "n_chunks",
        (F.col("stitched_md5") == F.col("orig_md5")).alias("stitch_ok"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# B193: fixed-k per-stratum eval sampler (the held-out set builder)
# ---------------------------------------------------------------------------
# Eval sets need exactly-k examples per cell of the (lang, source)
# grid — proportional sampling (B11) starves small cells, global
# reservoirs (B76) ignore strata entirely. This op ranks docs inside
# each stratum by the house content-stable uniform (same u as B11/B17,
# so membership never churns under reordering or re-partitioning) and
# keeps the k smallest — a deterministic per-stratum reservoir. The
# window partitions on the stratum key (bounded fan-in per cell), never
# globally; adding a corpus only changes a cell's sample if a new doc's
# u beats the k-th — the stability property eval sets require.
EVAL_SAMPLE_K = 3


@register(
    "eval_stratified_fixed_k",
    f"""
WITH u AS (
  SELECT lang, source, doc_id, round({_STRAT_U_DDB}, 8) AS u FROM documents
), ranked AS (
  SELECT lang, source, doc_id, u,
         row_number() OVER (PARTITION BY lang, source ORDER BY u, doc_id) AS rk
  FROM u
)
SELECT lang, source, CAST(rk AS BIGINT) AS rk, doc_id, u
FROM ranked WHERE rk <= {EVAL_SAMPLE_K}
ORDER BY lang, source, rk
""",
)
def eval_stratified_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-(lang, source) deterministic eval sample (B193) —
    content-stable u ranks inside each stratum; membership is stable
    under reordering and corpus growth except true k-th displacement."""
    d = read_table(spark, sf_dir, "documents")
    u = d.select("lang", "source", "doc_id", F.round(F.expr(_STRAT_U_SPARK), 8).alias("u"))
    w = Window.partitionBy("lang", "source").orderBy("u", "doc_id")
    return (
        u.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= EVAL_SAMPLE_K)
        .select("lang", "source", "rk", "doc_id", "u")
        .orderBy("lang", "source", "rk")
    )


# ---------------------------------------------------------------------------
# B194: packing-efficiency audit (how much compute the packer wastes)
# ---------------------------------------------------------------------------
# B12 packs; this op grades the packing: bins bucketed into under-full
# (<0.9), on-target (0.9-1.0], and overflow (>1.0) utilization bands
# with doc/token counts and each band's share of bins — the number that
# says whether the token budget, shard count, or ordering needs tuning
# before a training run burns idle accelerator time on padding. The
# oracle embeds the REGISTERED B12 SQL verbatim as its CTE (B107
# discipline: the audit cannot drift from the op it audits); the Spark
# side composes the registered builder the same way. Utilization
# quantizes once to micro; the band reduce is a <=3-row table.
from ..queries import REGISTRY as _PQ_REGISTRY  # noqa: E402


def _pack_efficiency_oracle() -> str:
    return f"""
WITH bins AS ({_PQ_REGISTRY["pack_sequences"].oracle})
, banded AS (
  SELECT CASE WHEN CAST(round(utilization * 1000000) AS BIGINT) < 900000 THEN 'under'
              WHEN CAST(round(utilization * 1000000) AS BIGINT) <= 1000000 THEN 'target'
              ELSE 'overflow' END AS band,
         n_docs, sum_tokens,
         CAST(round(utilization * 1000000) AS BIGINT) AS util_micro
  FROM bins
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(sum_tokens) AS BIGINT) AS sum_tokens,
       CAST(sum(util_micro) // count(*) AS BIGINT) AS mean_util_micro,
       CAST(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT) AS bin_share_ppm
FROM banded
GROUP BY band
ORDER BY band
"""


@register("pack_efficiency_audit", _pack_efficiency_oracle())
def pack_efficiency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Utilization-band readout over the B12 packing (B194): under-full /
    on-target / overflow bin counts, docs, tokens, mean utilization —
    the padding-waste gate before a training run."""
    bins = pack_sequences(spark, sf_dir)
    banded = bins.select(
        F.when(F.round(F.col("utilization") * 1000000).cast("long") < 900000, "under")
        .when(F.round(F.col("utilization") * 1000000).cast("long") <= 1000000, "target")
        .otherwise("overflow")
        .alias("band"),
        "n_docs",
        "sum_tokens",
        F.round(F.col("utilization") * 1000000).cast("long").alias("util_micro"),
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_bins"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sum_tokens").cast("long").alias("sum_tokens"),
            F.expr("sum(util_micro) div count(*)").cast("long").alias("mean_util_micro"),
        )
        .select(
            "band",
            "n_bins",
            "n_docs",
            "sum_tokens",
            "mean_util_micro",
            F.expr("n_bins * 1000000 div sum(n_bins) OVER ()")
            .cast("long")
            .alias("bin_share_ppm"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# B200: quality rank fusion (Borda over decile ranks, scale-safe)
# ---------------------------------------------------------------------------
# Curation rarely trusts ONE signal: the robust selector fuses ranks
# across independent quality axes (Borda count), which is immune to the
# signals' incomparable scales. The scale trap is that ranking a corpus
# per signal is a global sort per signal — so this op fuses DECILES
# instead, each computed with the exact-rank two-form
# (`with_exact_ntile`: bounded per-value counts + partitioned
# row_number, no corpus-global window), over three house signals:
# length (n_chars), the B35 classifier score, and distinct-token ratio
# (the B10 repetition axis, inverted so higher = better). Fused score =
# Σ deciles (3..30); top-50 docs by (fused desc, doc_id) via
# TakeOrdered. The oracle keeps the readable ntile windows — bit-equal
# by the B120/B113 equivalence.
FUSION_TOP = 50


def _rank_fusion_oracle() -> str:
    from .text_queries import CLF_BUCKETS
    from ..functions import texthash as _H

    from .text_queries import _clf_weight_ddb

    w_expr = _clf_weight_ddb(_H.ddb_str_hash_fast("t") + f" % {CLF_BUCKETS}")
    return f"""
WITH toks AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS tk FROM documents
), rep AS (
  SELECT doc_id, n_chars,
         CAST(len(list_distinct(tk)) * 1000000 // greatest(len(tk), 1) AS BIGINT)
           AS distinct_micro
  FROM toks
), clf AS (
  SELECT doc_id, CAST(sum(n * wi) AS BIGINT) AS s FROM (
    SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n, {w_expr} AS wi
    FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY doc_id, t
  ) GROUP BY doc_id
), sig AS (
  SELECT r.doc_id, r.n_chars, r.distinct_micro, c.s
  FROM rep r JOIN clf c ON c.doc_id = r.doc_id
), decs AS (
  SELECT doc_id,
         CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS d_len,
         CAST(ntile(10) OVER (ORDER BY s, doc_id) AS BIGINT) AS d_clf,
         CAST(ntile(10) OVER (ORDER BY distinct_micro, doc_id) AS BIGINT) AS d_rep
  FROM sig
)
SELECT doc_id, d_len, d_clf, d_rep,
       d_len + d_clf + d_rep AS fused_score
FROM decs
ORDER BY fused_score DESC, doc_id
LIMIT {FUSION_TOP}
"""


@register("quality_rank_fusion", _rank_fusion_oracle())
def quality_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda fusion of three quality-signal deciles — length, classifier
    score, distinct-token ratio — via the exact-rank two-form (B200);
    top-50 docs by fused score with no corpus-global window."""
    from vectordb_hr_data_spark.functions import texthash as _H
    from vectordb_hr_data_spark.operators.quantiles import with_exact_ntile
    from .text_queries import CLF_BUCKETS, _clf_weight_spark

    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "n_chars", F.split("text", " ").alias("tk"))
    rep = toks.select(
        "doc_id",
        "n_chars",
        F.expr("size(array_distinct(tk)) * 1000000 div greatest(size(tk), 1)")
        .cast("long")
        .alias("distinct_micro"),
    )
    clf = (
        toks.select("doc_id", F.explode("tk").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "doc_id",
            "n",
            F.expr(_clf_weight_spark(_H.spark_str_hash_fast("t") + f" % {CLF_BUCKETS}")).alias(
                "wi"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.col("wi")).cast("long").alias("s"))
    )
    # every decile's per-value count branch roots at the SAME base join
    # (stats_df) instead of the previous decile's window stack — the
    # chained form re-planned the tokenize/explode classifier subtree
    # once per branch (108 parquet scans in the r14-before plan, 28
    # after). Measured: a materialize_scratch spill of the base is
    # SLOWER here (2.39 s vs 1.93 s at sf0.1) — the write job costs more
    # than the residual in-job recompute; the r14 basket lesson again
    base = rep.join(clf, "doc_id")
    sig = with_exact_ntile(base, 10, "n_chars", "doc_id", "d_len", stats_df=base)
    sig = with_exact_ntile(sig, 10, "s", "doc_id", "d_clf", stats_df=base)
    sig = with_exact_ntile(sig, 10, "distinct_micro", "doc_id", "d_rep", stats_df=base)
    return (
        sig.select(
            "doc_id",
            "d_len",
            "d_clf",
            "d_rep",
            (F.col("d_len") + F.col("d_clf") + F.col("d_rep")).cast("long").alias("fused_score"),
        )
        .orderBy(F.col("fused_score").desc(), "doc_id")
        .limit(FUSION_TOP)
    )


# ---------------------------------------------------------------------------
# B212: rank-fusion selection-bias audit (who does the gate favor?)
# ---------------------------------------------------------------------------
# Any curation gate reshapes the source mix; the responsible release
# reports HOW: each source's share among the B200-selected documents vs
# its corpus share, and the lift between them — the number that shows a
# "quality" gate quietly down-weighting a source (compare B197, which
# audits the classifier's length axis; this audits the fused gate's
# source axis). The oracle embeds the registered B200 SQL verbatim as
# its selection CTE (B107 discipline). Output is |sources| rows; the
# selection is already bounded (top-50).
def _fusion_bias_oracle() -> str:
    sel = _PQ_REGISTRY["quality_rank_fusion"].oracle
    return f"""
WITH RECURSIVE sel AS ({sel})
, pick AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_sel
  FROM sel s JOIN documents d ON d.doc_id = s.doc_id
  GROUP BY d.source
), corpus AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(n_sel) AS BIGINT) AS ns FROM pick
), tot2 AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS nd FROM corpus
)
SELECT c.source, c.n_docs, coalesce(p.n_sel, 0) AS n_selected,
       CAST(coalesce(p.n_sel, 0) * 1000000 // tot.ns AS BIGINT) AS sel_share_ppm,
       CAST(c.n_docs * 1000000 // tot2.nd AS BIGINT) AS corpus_share_ppm,
       CAST(coalesce(p.n_sel, 0) * tot2.nd * 1000
            // (c.n_docs * tot.ns) AS BIGINT) AS lift_milli
FROM corpus c
LEFT JOIN pick p ON p.source = c.source
CROSS JOIN tot CROSS JOIN tot2
ORDER BY c.source
"""


@register("fusion_source_bias", _fusion_bias_oracle())
def fusion_source_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source selection share of the B200 fused gate vs corpus share,
    with the lift (B212) — the source-axis bias report a curation
    release ships."""
    d = read_table(spark, sf_dir, "documents")
    sel = quality_rank_fusion(spark, sf_dir).select("doc_id")
    pick = (
        sel.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_sel"))
    )
    corpus = d.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    tot = pick.agg(F.sum("n_sel").cast("long").alias("ns"))
    tot2 = corpus.agg(F.sum("n_docs").cast("long").alias("nd"))
    return (
        corpus.join(pick, "source", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tot2))
        .select(
            "source",
            "n_docs",
            F.coalesce("n_sel", F.lit(0)).cast("long").alias("n_selected"),
            F.expr("coalesce(n_sel, 0) * 1000000 div ns").cast("long").alias("sel_share_ppm"),
            F.expr("n_docs * 1000000 div nd").cast("long").alias("corpus_share_ppm"),
            F.expr("coalesce(n_sel, 0) * nd * 1000 div (n_docs * ns)")
            .cast("long")
            .alias("lift_milli"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B213: per-source length QQ audit (distribution shift, quantile form)
# ---------------------------------------------------------------------------
# PSI (B151) monitors drift on event values; corpora drift in SHAPE —
# a source whose length distribution diverges from the corpus needs
# different chunking/packing than the rest, and the quantile-quantile
# table is the diagnosis: per (source, decile), the source's decile
# boundary vs the corpus's, and the signed gap. Source deciles come
# from source-PARTITIONED ntile (bounded per-partition); the corpus
# deciles from the exact-rank two-form (no global window). Output:
# |sources| x 10 rows.
@register(
    "source_length_qq",
    """
WITH s AS (
  SELECT source, n_chars,
         ntile(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS dec
  FROM documents
), g AS (
  SELECT n_chars,
         ntile(10) OVER (ORDER BY n_chars, doc_id) AS dec
  FROM documents
), sb AS (
  SELECT source, CAST(dec AS BIGINT) AS decile, CAST(max(n_chars) AS BIGINT) AS src_hi
  FROM s GROUP BY source, dec
), gb AS (
  SELECT CAST(dec AS BIGINT) AS decile, CAST(max(n_chars) AS BIGINT) AS corpus_hi
  FROM g GROUP BY dec
)
SELECT sb.source, sb.decile, sb.src_hi, gb.corpus_hi,
       sb.src_hi - gb.corpus_hi AS gap_chars
FROM sb JOIN gb ON gb.decile = sb.decile
ORDER BY sb.source, sb.decile
""",
)
def source_length_qq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source decile boundaries of document length vs the corpus's,
    with signed gaps (B213) — the quantile-quantile shape-drift table;
    source deciles partition on source, corpus deciles ride the
    exact-rank two-form."""
    from vectordb_hr_data_spark.operators.quantiles import with_exact_ntile

    d = read_table(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    sb = (
        d.select("source", "n_chars", F.ntile(10).over(ws).cast("long").alias("decile"))
        .groupBy("source", "decile")
        .agg(F.max("n_chars").cast("long").alias("src_hi"))
    )
    gb = (
        with_exact_ntile(d.select("doc_id", "n_chars"), 10, "n_chars", "doc_id", "decile")
        .groupBy("decile")
        .agg(F.max("n_chars").cast("long").alias("corpus_hi"))
    )
    return (
        sb.join(F.broadcast(gb), "decile")
        .select(
            "source",
            "decile",
            "src_hi",
            "corpus_hi",
            (F.col("src_hi") - F.col("corpus_hi")).cast("long").alias("gap_chars"),
        )
        .orderBy("source", "decile")
    )


# ---------------------------------------------------------------------------
# B223: chunk-level dedup rate (the embedding-cache economics)
# ---------------------------------------------------------------------------
# Document-level dedup (B1) misses what RAG pipelines actually pay for:
# EMBEDDING COMPUTE is spent per chunk, and duplicated chunks (shared
# boilerplate, overlap windows, templated sections) are cache hits a
# content-addressed embedding store never recomputes. This op groups
# the registered B16 chunk table by chunk content hash and reports, per
# source: chunks, distinct chunks, the duplicate share, and the implied
# embedding-compute saving in ppm. Oracle embeds the registered B16 SQL
# verbatim (chunk identity = its chunk_md5 column — the audit and the
# chunker cannot drift). One uniform hash groupBy over the chunk fan-out.
def _chunk_dedup_oracle() -> str:
    chunks = _PQ_REGISTRY["doc_chunk_fixed_tokens"].oracle
    return f"""
WITH chunks AS ({chunks})
, j AS (
  SELECT d.source, c.chunk_md5 FROM chunks c JOIN documents d ON d.doc_id = c.doc_id
), g AS (
  SELECT source, chunk_md5, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY source, chunk_md5
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct_chunks,
       CAST(sum(n - 1) AS BIGINT) AS n_duplicate_chunks,
       CAST(sum(n - 1) * 1000000 // sum(n) AS BIGINT) AS cache_hit_ppm
FROM g
GROUP BY source
ORDER BY source
"""


@register("chunk_dedup_rate", _chunk_dedup_oracle())
def chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-chunk share per source over the registered B16 chunk
    table (B223) — the content-addressed embedding-cache hit rate; what
    chunk-level dedup saves that document-level dedup cannot see."""
    d = read_table(spark, sf_dir, "documents")
    chunks = doc_chunk_fixed_tokens(spark, sf_dir).select("doc_id", "chunk_md5")
    g = (
        chunks.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source", "chunk_md5")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        g.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_chunks"),
            F.count("*").cast("long").alias("n_distinct_chunks"),
            F.sum(F.col("n") - 1).cast("long").alias("n_duplicate_chunks"),
            F.expr("sum(n - 1) * 1000000 div sum(n)").cast("long").alias("cache_hit_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B237: compression-locality layout audit (r12)
# ---------------------------------------------------------------------------
# At 100 TB the bytes-on-disk bill is set as much by ROW ORDER as by the
# codec: dictionary/zstd pages compress duplicated values, and a corpus
# written in ingestion order scatters near-identical documents across
# files. Ordering by a locality key (here: lang, then the min-shingle —
# the same single-hash MinHash the near-dup blocker uses, so similar docs
# sort adjacently with the MinHash collision guarantee) concentrates
# repeated shingles into the same file. The audit prices the layout
# WITHOUT writing it twice: assign docs to FILE_ROWS-sized files under
# (a) the similarity order and (b) doc_id ingestion order, then per file
# measure the duplicated-shingle share (1 − distinct/total — the direct
# proxy for what a dictionary page deduplicates), and report per lang the
# mean file dup-share under each layout and the gain. Pure integers:
# dup_milli = 1000·(inst − distinct) div inst, means are sum div count.
# Scale shape: shingle keys are 8-byte ints (B9's equality-only
# shingling); the per-(lang, file) distinct is a keyed aggregate. The
# per-lang row_number here is the AUDIT harness; the production layout
# path is repartitionByRange(lang, sig) + sortWithinPartitions + write
# (no global window), and at 100 TB the audit runs on a range-sample of
# files, not the full corpus.
LAYOUT_FILE_ROWS = 100


def _layout_audit_oracle() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, lang, {H.ddb_tokens('text')} AS toks FROM documents
), th AS (
  SELECT doc_id, lang, {H.ddb_hash_array('toks')} AS thash FROM t
), sh AS (
  SELECT doc_id, lang, {H.ddb_shingle_keys('thash', 3)} AS keys FROM th
), sig AS (
  SELECT doc_id, lang, keys, list_min(keys) AS sig FROM sh
), pos AS (
  SELECT doc_id, lang, keys,
         row_number() OVER (PARTITION BY lang ORDER BY sig, doc_id) AS pos_sim,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS pos_id
  FROM sig
), ex AS (
  SELECT lang,
         CAST((pos_sim - 1) // {LAYOUT_FILE_ROWS} AS BIGINT) AS file_sim,
         CAST((pos_id - 1) // {LAYOUT_FILE_ROWS} AS BIGINT) AS file_id,
         unnest(keys) AS k
  FROM pos
), by_sim AS (
  SELECT lang, file_sim,
         1000 * (count(*) - count(DISTINCT k)) // count(*) AS dup_milli
  FROM ex GROUP BY lang, file_sim
), by_id AS (
  SELECT lang, file_id,
         1000 * (count(*) - count(DISTINCT k)) // count(*) AS dup_milli
  FROM ex GROUP BY lang, file_id
), s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(dup_milli) // count(*) AS BIGINT) AS dup_sim_milli
  FROM by_sim GROUP BY lang
), i AS (
  SELECT lang, CAST(sum(dup_milli) // count(*) AS BIGINT) AS dup_id_milli
  FROM by_id GROUP BY lang
), nd AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
)
SELECT nd.lang, nd.n_docs, s.n_files, s.dup_sim_milli, i.dup_id_milli,
       s.dup_sim_milli - i.dup_id_milli AS gain_milli
FROM nd JOIN s ON s.lang = nd.lang JOIN i ON i.lang = nd.lang
ORDER BY nd.lang
"""


@register("doc_layout_compression_audit", _layout_audit_oracle())
def doc_layout_compression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-locality layout audit (B237): duplicated-shingle share
    per FILE_ROWS-sized file under the (lang, min-shingle) similarity
    order vs doc_id ingestion order — the measured dividend of writing
    similar documents adjacently."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = d.select("doc_id", "lang", F.expr(H.spark_tokens("text")).alias("toks"))
    th = toks.select("doc_id", "lang", F.expr(H.spark_hash_array("toks")).alias("thash"))
    sh = th.select("doc_id", "lang", F.expr(H.spark_shingle_keys("thash", 3)).alias("keys"))
    sig = sh.select("doc_id", "lang", "keys", F.array_min("keys").alias("sig"))
    w_sim = Window.partitionBy("lang").orderBy("sig", "doc_id")
    w_id = Window.partitionBy("lang").orderBy("doc_id")
    pos = sig.select(
        "lang",
        "keys",
        F.row_number().over(w_sim).alias("pos_sim"),
        F.row_number().over(w_id).alias("pos_id"),
    )
    ex = pos.select(
        "lang",
        ((F.col("pos_sim") - 1) / LAYOUT_FILE_ROWS).cast("long").alias("file_sim"),
        ((F.col("pos_id") - 1) / LAYOUT_FILE_ROWS).cast("long").alias("file_id"),
        F.explode("keys").alias("k"),
    ).localCheckpoint(eager=True)

    def per_file(file_col: str) -> DataFrame:
        return ex.groupBy("lang", file_col).agg(
            (
                (F.lit(1000) * (F.count("*") - F.countDistinct("k")))
                / F.count("*")
            )
            .cast("long")
            .alias("dup_milli")
        )

    s = per_file("file_sim").groupBy("lang").agg(
        F.count("*").cast("long").alias("n_files"),
        F.expr("sum(dup_milli) div count(*)").cast("long").alias("dup_sim_milli"),
    )
    i = per_file("file_id").groupBy("lang").agg(
        F.expr("sum(dup_milli) div count(*)").cast("long").alias("dup_id_milli")
    )
    nd = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    return (
        nd.join(s, "lang")
        .join(i, "lang")
        .select(
            "lang",
            "n_docs",
            "n_files",
            "dup_sim_milli",
            "dup_id_milli",
            (F.col("dup_sim_milli") - F.col("dup_id_milli")).alias("gain_milli"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# B257: Neyman allocation — the OPTIMAL stratified sample design, priced
# against proportional
# ---------------------------------------------------------------------------
# B11/B193 draw stratified samples with FIXED designs; survey theory says
# the variance-optimal split of a budget n across strata is Neyman
# allocation n_h ∝ N_h·σ_h — more samples where the stratum is big AND
# noisy. Exact integers throughout via one identity: N_h·σ_h =
# √(N_h·Σx² − (Σx)²) =: s_h, so the weights need ONE integer sqrt per
# stratum (float sqrt + a ±1 Newton correction makes the floor exact),
# and the estimator variance Σ N_h²σ_h²/n_h = Σ s_h²/n_h needs no sqrt
# at all. The moment products run in decimal(38,0)/HUGEINT — the
# documented 128-bit moment-sum rule: (Σx)² overflows int64 already at
# sf0.1 — and the REPORTED uncertainty is the integer-cents standard
# error (√variance, back in int64 range at any corpus size). Budget
# rounding is largest-remainder (deterministic, ties by stratum name);
# the Neyman-vs-proportional variance ratio in ppm is ≤ 10⁶ BY THE
# OPTIMALITY THEOREM, which the pytest asserts. Scale: one groupBy for
# the moments; everything after is a |strata|-row computation.
_NEYMAN_BUDGET = 200


def _isqrt_correct(y: str, x: str, big: str) -> str:
    """±1 Newton correction making floor(sqrt(double)) exact; compares in
    the 128-bit type given by ``big`` (HUGEINT / decimal(19,0))."""
    return (
        f"(CASE WHEN (CAST({y} + 1 AS {big})) * ({y} + 1) <= {x} THEN {y} + 1"
        f" WHEN (CAST({y} AS {big})) * {y} > {x} THEN {y} - 1 ELSE {y} END)"
    )


def _isqrt_sql(x: str, big: str) -> str:
    y = f"CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    return _isqrt_correct(y, x, big)


@register(
    "events_neyman_allocation_audit",
    f"""
WITH m AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n_pop,
         sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)) AS sx,
         sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
             * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sxx
  FROM events GROUP BY event_type
), s AS (
  SELECT event_type, CAST(n_pop AS BIGINT) AS n_pop,
         {_isqrt_sql('(n_pop * sxx - sx * sx)', 'HUGEINT')} AS s_h
  FROM m
), fl AS (
  SELECT event_type, n_pop, s_h,
         {_NEYMAN_BUDGET} * s_h // sum(s_h) OVER () AS ney_fl,
         ({_NEYMAN_BUDGET} * s_h) % (sum(s_h) OVER ()) AS ney_rem,
         {_NEYMAN_BUDGET} * n_pop // sum(n_pop) OVER () AS prop_fl,
         ({_NEYMAN_BUDGET} * n_pop) % (sum(n_pop) OVER ()) AS prop_rem
  FROM s
), alloc AS (
  SELECT event_type, n_pop, s_h,
         ney_fl + CASE WHEN row_number() OVER (ORDER BY ney_rem DESC, event_type)
                       <= {_NEYMAN_BUDGET} - sum(ney_fl) OVER () THEN 1 ELSE 0 END
           AS n_neyman,
         prop_fl + CASE WHEN row_number() OVER (ORDER BY prop_rem DESC, event_type)
                        <= {_NEYMAN_BUDGET} - sum(prop_fl) OVER () THEN 1 ELSE 0 END
           AS n_prop
  FROM fl
), var AS (
  SELECT sum(CAST(s_h AS HUGEINT) * s_h // greatest(n_neyman, 1)) AS var_neyman,
         sum(CAST(s_h AS HUGEINT) * s_h // greatest(n_prop, 1)) AS var_prop
  FROM alloc
)
SELECT a.event_type, CAST(a.n_pop AS BIGINT) AS n_pop,
       CAST(a.s_h AS BIGINT) AS nh_sigma,
       CAST(a.n_prop AS BIGINT) AS n_prop, CAST(a.n_neyman AS BIGINT) AS n_neyman,
       CAST({_isqrt_sql('v.var_prop', 'HUGEINT')} AS BIGINT) AS se_prop_cents,
       CAST({_isqrt_sql('v.var_neyman', 'HUGEINT')} AS BIGINT) AS se_neyman_cents,
       CAST(v.var_neyman * 1000000 // greatest(v.var_prop, 1) AS BIGINT)
         AS neyman_vs_prop_ppm
FROM alloc a CROSS JOIN var v
ORDER BY a.event_type
""",
)
def events_neyman_allocation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman vs proportional stratified allocation (B257): exact integer
    N_h·σ_h weights (128-bit moments), largest-remainder budget rounding,
    integer-cents standard errors and the optimality gain in ppm."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n_pop"),
        F.sum(cents.cast("decimal(19,0)")).cast("decimal(38,0)").alias("sx"),
        F.sum((cents.cast("decimal(19,0)") * cents).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    mom = (
        "(cast(n_pop as decimal(19,0)) * sxx - sx * sx)"
    )
    s = m.select(
        "event_type",
        F.col("n_pop").cast("long").alias("n_pop"),
        F.expr(_isqrt_sql(mom, "decimal(19,0)")).cast("long").alias("s_h"),
    )
    budget = _NEYMAN_BUDGET
    fl = s.select(
        "event_type",
        "n_pop",
        "s_h",
        F.expr(f"{budget} * s_h div (sum(s_h) over ())").alias("ney_fl"),
        F.expr(f"({budget} * s_h) % (sum(s_h) over ())").alias("ney_rem"),
        F.expr(f"{budget} * n_pop div (sum(n_pop) over ())").alias("prop_fl"),
        F.expr(f"({budget} * n_pop) % (sum(n_pop) over ())").alias("prop_rem"),
    )
    w_all = Window.partitionBy()
    alloc = fl.select(
        "event_type",
        "n_pop",
        "s_h",
        (
            F.col("ney_fl")
            + F.when(
                F.row_number().over(Window.orderBy(F.col("ney_rem").desc(), "event_type"))
                <= budget - F.sum("ney_fl").over(w_all),
                1,
            ).otherwise(0)
        ).alias("n_neyman"),
        (
            F.col("prop_fl")
            + F.when(
                F.row_number().over(Window.orderBy(F.col("prop_rem").desc(), "event_type"))
                <= budget - F.sum("prop_fl").over(w_all),
                1,
            ).otherwise(0)
        ).alias("n_prop"),
    )
    # Spark's `div` coerces to LONG (overflows at sf0.1); floor(/) keeps
    # the quotient in decimal(38,0) — exact here because the operands are
    # integers well inside the 38-digit significand
    var = alloc.agg(
        F.expr(
            "cast(sum(cast(floor((cast(s_h as decimal(19,0)) * s_h)"
            " / greatest(n_neyman, 1)) as decimal(38,0))) as decimal(38,0))"
        ).alias("var_neyman"),
        F.expr(
            "cast(sum(cast(floor((cast(s_h as decimal(19,0)) * s_h)"
            " / greatest(n_prop, 1)) as decimal(38,0))) as decimal(38,0))"
        ).alias("var_prop"),
    )
    return (
        alloc.crossJoin(F.broadcast(var))
        .withColumn(
            "q0",
            F.expr(
                "cast(floor(var_neyman * 1000000 / greatest(var_prop, 1))"
                " as decimal(38,0))"
            ),
        )
        .select(
            "event_type",
            F.col("n_pop").cast("long").alias("n_pop"),
            F.col("s_h").cast("long").alias("nh_sigma"),
            F.col("n_prop").cast("long").alias("n_prop"),
            F.col("n_neyman").cast("long").alias("n_neyman"),
            F.expr(_isqrt_sql("var_prop", "decimal(19,0)"))
            .cast("long")
            .alias("se_prop_cents"),
            F.expr(_isqrt_sql("var_neyman", "decimal(19,0)"))
            .cast("long")
            .alias("se_neyman_cents"),
            # Spark decimal `/` rounds HALF_UP at scale 6; the ±1 remainder
            # correction restores the exact floor the oracle's HUGEINT //
            # computes
            F.expr(
                "cast((CASE WHEN q0 * greatest(var_prop, 1) > var_neyman * 1000000"
                " THEN q0 - 1"
                " WHEN (q0 + 1) * greatest(var_prop, 1) <= var_neyman * 1000000"
                " THEN q0 + 1 ELSE q0 END) as bigint)"
            ).alias("neyman_vs_prop_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B268: consistent-hashing rebalance audit — what fraction of the corpus
# MOVES when the cluster grows a shard?
# ---------------------------------------------------------------------------
# Every sharded store (the IVF cells here, a feature store, a cache
# tier) eventually adds capacity, and the sharding function decides the
# bill: mod-N reassigns ~(N)/(N+1) of ALL keys (a full-corpus reshuffle
# at 100 TB), a consistent hash ring reassigns ~1/(N+1). This audit
# measures both, exactly, for 16 → 17 shards over the user-key
# population: 64 vnodes per shard hash onto a 48-bit ring (md5-prefix
# positions), ownership = highest ring position ≤ key hash (predecessor
# convention, wrap to the max node), and the key→interval lookup is the
# B42 interval-join discipline — ring intervals exploded over fixed-width
# hash-space buckets (bounded: |vnodes| + |buckets| rows), keys equi-join
# their bucket, one range filter. Outputs per strategy: keys moved (ppm)
# and the max-shard load share before/after — the balance cost the ring
# pays for its stability. All arithmetic integer, both engines replay the
# md5 positions bit-for-bit.
_RING_VNODES = 64
_RING_BUCKETS = 4096
_RING_SPACE = 1 << 48


def _ring_sql_ddb(n_shards: int, tag: str) -> str:
    """DuckDB CTE body: vnode ring for n_shards as (pos, shard)."""
    return f"""
  SELECT CAST(('0x' || substr(md5('shard:' || CAST(s.i AS VARCHAR) || ':'
                               || CAST(v.i AS VARCHAR)), 1, 12)) AS BIGINT) AS pos,
         CAST(s.i AS BIGINT) AS shard
  FROM UNNEST(range(0, {n_shards})) AS s(i)
  CROSS JOIN UNNEST(range(0, {_RING_VNODES})) AS v(i)
"""


@register(
    "shard_rebalance_audit",
    f"""
WITH keys AS (
  SELECT DISTINCT user_id,
         CAST(('0x' || substr(md5('key:' || CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)
           AS h
  FROM events
), ring16 AS ({_ring_sql_ddb(16, 'r16')}),
ring17 AS ({_ring_sql_ddb(17, 'r17')}),
iv16 AS (
  SELECT pos AS lo,
         COALESCE(lead(pos) OVER (ORDER BY pos), {_RING_SPACE}) AS hi, shard
  FROM ring16
), iv17 AS (
  SELECT pos AS lo,
         COALESCE(lead(pos) OVER (ORDER BY pos), {_RING_SPACE}) AS hi, shard
  FROM ring17
), wrap16 AS (
  SELECT 0 AS lo, (SELECT min(lo) FROM iv16) AS hi,
         (SELECT shard FROM iv16 ORDER BY lo DESC LIMIT 1) AS shard
  UNION ALL SELECT lo, hi, shard FROM iv16
), wrap17 AS (
  SELECT 0 AS lo, (SELECT min(lo) FROM iv17) AS hi,
         (SELECT shard FROM iv17 ORDER BY lo DESC LIMIT 1) AS shard
  UNION ALL SELECT lo, hi, shard FROM iv17
), bx16 AS (
  SELECT w.lo, w.hi, w.shard, b.i AS bk
  FROM wrap16 w JOIN UNNEST(range(0, {_RING_BUCKETS})) AS b(i)
    ON b.i BETWEEN w.lo // {_RING_SPACE // _RING_BUCKETS}
               AND (w.hi - 1) // {_RING_SPACE // _RING_BUCKETS}
), bx17 AS (
  SELECT w.lo, w.hi, w.shard, b.i AS bk
  FROM wrap17 w JOIN UNNEST(range(0, {_RING_BUCKETS})) AS b(i)
    ON b.i BETWEEN w.lo // {_RING_SPACE // _RING_BUCKETS}
               AND (w.hi - 1) // {_RING_SPACE // _RING_BUCKETS}
), own AS (
  SELECT k.user_id,
         max(CASE WHEN k.h >= b16.lo AND k.h < b16.hi THEN b16.shard END) AS ring_s16,
         CAST(k.h % 16 AS BIGINT) AS mod_s16,
         CAST(k.h % 17 AS BIGINT) AS mod_s17
  FROM keys k JOIN bx16 b16 ON b16.bk = k.h // {_RING_SPACE // _RING_BUCKETS}
  GROUP BY k.user_id, k.h
), own2 AS (
  SELECT o.user_id, o.ring_s16, o.mod_s16, o.mod_s17,
         max(CASE WHEN k.h >= b17.lo AND k.h < b17.hi THEN b17.shard END) AS ring_s17
  FROM own o JOIN keys k ON k.user_id = o.user_id
  JOIN bx17 b17 ON b17.bk = k.h // {_RING_SPACE // _RING_BUCKETS}
  GROUP BY o.user_id, o.ring_s16, o.mod_s16, o.mod_s17
), stats AS (
  SELECT 'mod' AS strategy, CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN mod_s16 <> mod_s17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
         CAST(max(c16) * 16000 // count(*) AS BIGINT) AS max_load_milli_16,
         CAST(max(c17) * 17000 // count(*) AS BIGINT) AS max_load_milli_17
  FROM (
    SELECT *, count(*) OVER (PARTITION BY mod_s16) AS c16,
           count(*) OVER (PARTITION BY mod_s17) AS c17
    FROM own2
  )
  UNION ALL
  SELECT 'ring', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN ring_s16 <> ring_s17 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(max(c16) * 16000 // count(*) AS BIGINT),
         CAST(max(c17) * 17000 // count(*) AS BIGINT)
  FROM (
    SELECT *, count(*) OVER (PARTITION BY ring_s16) AS c16,
           count(*) OVER (PARTITION BY ring_s17) AS c17
    FROM own2
  )
)
SELECT strategy, n_keys, n_moved,
       CAST(n_moved * 1000000 // n_keys AS BIGINT) AS moved_ppm,
       max_load_milli_16, max_load_milli_17
FROM stats
ORDER BY strategy
""",
)
def shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mod-N vs consistent-ring reassignment cost for 16 → 17 shards over
    the user-key population (B268): exact moved shares and max-shard load
    (milli, normalized so 1000 = perfectly even)."""
    ev = read_table(spark, sf_dir, "events")
    keys = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.expr(
                "cast(conv(substring(md5(concat('key:', cast(user_id as string))), 1, 12),"
                " 16, 10) as bigint)"
            ).alias("h"),
        )
    )
    bw = _RING_SPACE // _RING_BUCKETS

    def ring(n_shards: int) -> DataFrame:
        shards = spark.range(n_shards).select(F.col("id").alias("s"))
        vnodes = spark.range(_RING_VNODES).select(F.col("id").alias("v"))
        r = shards.crossJoin(vnodes).select(
            F.expr(
                "cast(conv(substring(md5(concat('shard:', cast(s as string), ':',"
                " cast(v as string))), 1, 12), 16, 10) as bigint)"
            ).alias("pos"),
            F.col("s").cast("long").alias("shard"),
        )
        w = Window.orderBy("pos")
        iv = r.select(
            F.col("pos").alias("lo"),
            F.coalesce(F.lead("pos").over(w), F.lit(_RING_SPACE)).alias("hi"),
            "shard",
        )
        wrap = iv.agg(
            F.min("lo").alias("hi"), F.max_by("shard", "lo").alias("shard")
        ).select(F.lit(0).cast("long").alias("lo"), "hi", "shard")
        full = iv.unionByName(wrap)
        return full.select(
            "lo",
            "hi",
            "shard",
            F.explode(
                F.sequence(F.expr(f"lo div {bw}"), F.expr(f"(hi - 1) div {bw}"))
            ).alias("bk"),
        )

    bx16 = F.broadcast(ring(16).withColumnsRenamed({"shard": "s16"}))
    bx17 = F.broadcast(
        ring(17).withColumnsRenamed({"shard": "s17", "lo": "lo7", "hi": "hi7"})
    )
    own = (
        keys.withColumn("bk", F.expr(f"h div {bw}"))
        .join(bx16, "bk")
        .filter((F.col("h") >= F.col("lo")) & (F.col("h") < F.col("hi")))
        .select("user_id", "h", F.col("s16").alias("ring_s16"))
        .withColumn("bk", F.expr(f"h div {bw}"))
        .join(bx17, "bk")
        .filter((F.col("h") >= F.col("lo7")) & (F.col("h") < F.col("hi7")))
        .select(
            "user_id",
            F.col("ring_s16"),
            F.col("s17").alias("ring_s17"),
            (F.col("h") % 16).cast("long").alias("mod_s16"),
            (F.col("h") % 17).cast("long").alias("mod_s17"),
        )
        .localCheckpoint(eager=True)
    )

    def stats(tag: str, c16: str, c17: str) -> DataFrame:
        loads16 = own.groupBy(c16).agg(F.count("*").alias("n")).agg(
            F.max("n").alias("m16")
        )
        loads17 = own.groupBy(c17).agg(F.count("*").alias("n")).agg(
            F.max("n").alias("m17")
        )
        return (
            own.agg(
                F.count("*").cast("long").alias("n_keys"),
                F.sum(F.when(F.col(c16) != F.col(c17), 1).otherwise(0))
                .cast("long")
                .alias("n_moved"),
            )
            .crossJoin(F.broadcast(loads16))
            .crossJoin(F.broadcast(loads17))
            .select(
                F.lit(tag).alias("strategy"),
                "n_keys",
                "n_moved",
                F.expr("n_moved * 1000000 div n_keys").cast("long").alias("moved_ppm"),
                F.expr("m16 * 16000 div n_keys").cast("long").alias("max_load_milli_16"),
                F.expr("m17 * 17000 div n_keys").cast("long").alias("max_load_milli_17"),
            )
        )

    return (
        stats("mod", "mod_s16", "mod_s17")
        .unionByName(stats("ring", "ring_s16", "ring_s17"))
        .orderBy("strategy")
    )


# ---------------------------------------------------------------------------
# B275: leakage-safe group k-fold with a stratification-balance audit (r13)
# ---------------------------------------------------------------------------
# Cross-validation on a deduplicated-but-not-perfectly corpus leaks:
# byte-identical duplicates split across folds let the model grade
# itself on memorized training rows (the B97 grouped-split finding,
# k-fold form). The fix is structural — the fold is a function of the
# CONTENT hash, not the doc id, so every member of an exact-dup group
# lands in the SAME fold by construction (no cluster table, no join: a
# pure map). The audit half reports what hashing costs you: per
# (fold, lang) doc share vs the corpus share — max deviation tells you
# whether stratification survived the group constraint, BEFORE a skewed
# fold quietly biases a validation metric. Scale: one map-side fold
# assignment + two bounded aggregates (5 folds × |langs|).
KFOLD_K = 5


@register(
    "doc_group_kfold",
    f"""
WITH f AS (
  SELECT CAST(('0x' || substr(md5('kf:' || md5(text)), 1, 8)) AS BIGINT) % {KFOLD_K} AS fold,
         lang, doc_id, md5(text) AS chash
  FROM documents
), corpus AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang,
         CAST(sum(count(*)) OVER () AS BIGINT) AS n_all
  FROM f GROUP BY lang
), folds AS (
  SELECT fold, lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT chash) AS BIGINT) AS n_groups,
         CAST(sum(count(*)) OVER (PARTITION BY fold) AS BIGINT) AS n_fold
  FROM f GROUP BY fold, lang
)
SELECT fo.fold, fo.lang, fo.n_docs, fo.n_groups,
       CAST(fo.n_docs * 1000000 // fo.n_fold AS BIGINT) AS fold_share_ppm,
       CAST(c.n_lang * 1000000 // c.n_all AS BIGINT) AS corpus_share_ppm,
       CAST(abs(fo.n_docs * 1000000 // fo.n_fold - c.n_lang * 1000000 // c.n_all)
            AS BIGINT) AS dev_ppm
FROM folds fo JOIN corpus c ON c.lang = fo.lang
ORDER BY fo.fold, fo.lang
""",
)
def doc_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold assignment keyed on the content hash (B275) — exact
    duplicates cannot straddle folds — with the per-(fold, lang)
    stratification-deviation audit."""
    d = read_table(spark, sf_dir, "documents")
    f = d.select(
        F.expr(
            f"cast(conv(substring(md5(concat('kf:', md5(text))), 1, 8), 16, 10) as bigint)"
            f" % {KFOLD_K}"
        ).alias("fold"),
        "lang",
        "doc_id",
        F.md5("text").alias("chash"),
    )
    w_all = Window.partitionBy()
    corpus = (
        f.groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_lang"))
        .withColumn("n_all", F.sum("n_lang").over(w_all).cast("long"))
    )
    w_fold = Window.partitionBy("fold")
    folds = (
        f.groupBy("fold", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("chash").cast("long").alias("n_groups"),
        )
        .withColumn("n_fold", F.sum("n_docs").over(w_fold).cast("long"))
    )
    return (
        folds.join(F.broadcast(corpus), "lang")
        .select(
            "fold",
            "lang",
            "n_docs",
            "n_groups",
            F.expr("n_docs * 1000000 div n_fold").cast("long").alias("fold_share_ppm"),
            F.expr("n_lang * 1000000 div n_all").cast("long").alias("corpus_share_ppm"),
            F.expr(
                "abs(n_docs * 1000000 div n_fold - n_lang * 1000000 div n_all)"
            )
            .cast("long")
            .alias("dev_ppm"),
        )
        .orderBy("fold", "lang")
    )


# ---------------------------------------------------------------------------
# B281: context-length packing advisor (the B12 algebra priced on a grid)
# ---------------------------------------------------------------------------
# Choosing a training context length is a measured decision, not a
# default: at 1k the long docs overflow every bin, at 8k short-doc
# corpora train on padding. This op replays the EXACT B12 packing
# algebra (shard → prefix-sum → bin = floor((cum−n)/B)) across the
# budget grid {1024, 2048, 4096, 8192} from ONE cumulative pass — the
# running total is budget-independent, so the grid is a 4× explode of
# the already-cumsum'd frame, never four corpus passes. Per budget:
# bins, mean utilization, overflow bins/tokens (the boundary-doc spill
# B12 documents), and the advised flag on the budget whose mean
# utilization lands closest to 1.0 (tie → smaller context, cheaper
# attention). The B238 advisor discipline: compose measured curves,
# recommend mechanically. Scale: one windowed cumsum per shard + a
# 4-budget bounded aggregate.
PACK_ADVISOR_BUDGETS = (1024, 2048, 4096, 8192)


@register(
    "pack_config_advisor",
    f"""
WITH t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), c AS (
  SELECT shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
), grid AS (
  SELECT unnest(ARRAY[{", ".join(str(b) for b in PACK_ADVISOR_BUDGETS)}]) AS b
), bins AS (
  SELECT g.b, c.shard,
         CAST(floor(CAST(c.cum - c.n_tokens AS DOUBLE) / g.b) AS BIGINT) AS bin,
         CAST(sum(c.n_tokens) AS BIGINT) AS sum_tokens
  FROM c CROSS JOIN grid g
  GROUP BY g.b, c.shard, bin
), per AS (
  SELECT b,
         CAST(count(*) AS BIGINT) AS n_bins,
         CAST(sum(sum_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN sum_tokens > b THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow_bins,
         CAST(sum(CASE WHEN sum_tokens > b THEN sum_tokens - b ELSE 0 END) AS BIGINT)
           AS overflow_tokens,
         CAST(sum(sum_tokens) * 1000000 // (count(*) * b) AS BIGINT) AS mean_util_micro
  FROM bins GROUP BY b
)
SELECT CAST(b AS BIGINT) AS budget, n_bins, total_tokens, n_overflow_bins, overflow_tokens,
       mean_util_micro,
       CAST(CASE WHEN row_number() OVER (ORDER BY abs(mean_util_micro - 1000000), b) = 1
                 THEN 1 ELSE 0 END AS BIGINT) AS advised
FROM per
ORDER BY budget
""",
)
def pack_config_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency curve over the context-length grid (B281) from
    one budget-independent cumsum; advises the budget closest to full
    utilization."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    grid = spark.createDataFrame([(b,) for b in PACK_ADVISOR_BUDGETS], "b int")
    bins = (
        c.crossJoin(F.broadcast(grid))
        .groupBy(
            "b",
            "shard",
            F.floor((F.col("cum") - F.col("n_tokens")).cast("double") / F.col("b"))
            .cast("long")
            .alias("bin"),
        )
        .agg(F.sum("n_tokens").cast("long").alias("sum_tokens"))
    )
    per = bins.groupBy("b").agg(
        F.count("*").cast("long").alias("n_bins"),
        F.sum("sum_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("sum_tokens") > F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n_overflow_bins"),
        F.sum(
            F.when(F.col("sum_tokens") > F.col("b"), F.col("sum_tokens") - F.col("b")).otherwise(0)
        )
        .cast("long")
        .alias("overflow_tokens"),
        F.expr("sum(sum_tokens) * 1000000 div (count(*) * b)")
        .cast("long")
        .alias("mean_util_micro"),
    )
    w_adv = Window.orderBy(F.abs(F.col("mean_util_micro") - 1000000), "b")
    return (
        per.withColumn(
            "advised",
            F.when(F.row_number().over(w_adv) == 1, 1).otherwise(0).cast("long"),
        )
        .select(
            F.col("b").cast("long").alias("budget"),
            "n_bins",
            "total_tokens",
            "n_overflow_bins",
            "overflow_tokens",
            "mean_util_micro",
            "advised",
        )
        .orderBy("budget")
    )


# ---------------------------------------------------------------------------
# B292: span-corruption masking plan (T5-style pretraining prep) (r14)
# ---------------------------------------------------------------------------
# Span-corruption pretraining (Raffel et al. 2020) masks contiguous token
# spans at a fixed corruption budget; the PLAN — which spans, what
# realized mask rate — must be deterministic so a re-run regenerates the
# identical dataset. Deterministic block layout: token stream cut into
# 20-token blocks, each full block masks ONE 3-token span (exactly 15%)
# whose offset is the md5 hash of (doc_id, block) mod 18; the tail block
# masks a span only when it can hold one (≥3 tokens), at offset mod
# (tail−2). Per doc: token/span/mask counts, the REALIZED mask-rate ppm
# — tails round the budget BOTH ways (a 1-2 token tail undershoots
# 150 000; a 3-19 token tail overshoots, since it takes a full 3-token
# span; pytest pins both directions) — and the span-start-index
# checksum that pins the exact layout cross-engine. Scale: one bounded explode (n_tokens/20 rows per
# doc), map-side groupBy, no windows.
_SPAN_BLOCK = 20
_SPAN_LEN = 3


@register(
    "doc_span_corruption_plan",
    f"""
WITH tok AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents
), blk AS (
  SELECT t.doc_id, t.nt, CAST(b AS BIGINT) AS b,
         CASE WHEN b < t.nt // {_SPAN_BLOCK} THEN {_SPAN_BLOCK} ELSE t.nt % {_SPAN_BLOCK} END AS bs
  FROM tok t, unnest(range(0, t.nt // {_SPAN_BLOCK}
       + CASE WHEN t.nt % {_SPAN_BLOCK} >= {_SPAN_LEN} THEN 1 ELSE 0 END)) AS u(b)
), sp AS (
  SELECT doc_id, b * {_SPAN_BLOCK}
         + {{h}} % (CASE WHEN bs >= {_SPAN_BLOCK} THEN {_SPAN_BLOCK - _SPAN_LEN + 1}
                         ELSE bs - {_SPAN_LEN - 1} END) AS st
  FROM blk
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, CAST(sum(st) AS BIGINT) AS st_sum
  FROM sp GROUP BY doc_id
)
SELECT t.doc_id, t.nt AS n_tokens,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.n_spans, 0) * {_SPAN_LEN} AS BIGINT) AS n_masked,
       CAST(coalesce(a.n_spans, 0) * {_SPAN_LEN} * 1000000 // t.nt AS BIGINT) AS mask_rate_ppm,
       CAST(coalesce(a.st_sum, 0) AS BIGINT) AS span_start_sum
FROM tok t LEFT JOIN agg a ON a.doc_id = t.doc_id
ORDER BY t.doc_id
""".replace(
        "{h}",
        __import__("vectordb_hr_data_spark.functions.texthash", fromlist=["x"]).ddb_str_hash_fast(
            "'sc:' || CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)"
        ),
    ),
)
def doc_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5-style span-corruption layout (B292): one hashed
    3-token span per 20-token block, realized mask-rate ppm and the
    span-start checksum per doc."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.expr("cast(size(split(text, ' ')) as bigint)").alias("nt")
    )
    nb = (
        f"nt div {_SPAN_BLOCK}"
        f" + (case when nt % {_SPAN_BLOCK} >= {_SPAN_LEN} then 1 else 0 end)"
    )
    # guard the sequence: zero blocks would make sequence(0, -1) DESCEND
    # (the ADVICE r13 doc_char_entropy_gate hazard) — emit an empty array
    blk = tok.select(
        "doc_id",
        "nt",
        F.explode(
            F.expr(
                f"case when {nb} >= 1 then sequence(0, {nb} - 1)"
                " else array() end"
            )
        ).alias("b0"),
    ).withColumn("b", F.col("b0").cast("long")).withColumn(
        "bs",
        F.expr(
            f"case when b < nt div {_SPAN_BLOCK} then {_SPAN_BLOCK}"
            f" else nt % {_SPAN_BLOCK} end"
        ),
    )
    h = H.spark_str_hash_fast("concat('sc:', cast(doc_id as string), ':', cast(b as string))")
    sp = blk.select(
        "doc_id",
        F.expr(
            f"b * {_SPAN_BLOCK} + {h} % (case when bs >= {_SPAN_BLOCK}"
            f" then {_SPAN_BLOCK - _SPAN_LEN + 1} else bs - {_SPAN_LEN - 1} end)"
        ).alias("st"),
    )
    agg = sp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("st").cast("long").alias("st_sum"),
    )
    return (
        tok.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("nt").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            (F.coalesce("n_spans", F.lit(0)) * _SPAN_LEN).cast("long").alias("n_masked"),
            F.expr(f"coalesce(n_spans, 0) * {_SPAN_LEN} * 1000000 div nt")
            .cast("long")
            .alias("mask_rate_ppm"),
            F.coalesce("st_sum", F.lit(0)).cast("long").alias("span_start_sum"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B295: largest-remainder sample apportionment (Hamilton method) (r14)
# ---------------------------------------------------------------------------
# The exact-seats counterpart of the rate-based samplers (B11/B17): when
# a sampling job must hit an EXACT total budget (eval-set assembly,
# labeling quotas), per-stratum rates round away from it. Hamilton's
# method fixes that deterministically: floor the proportional quota per
# (lang, source) stratum, then grant the leftover seats to the largest
# remainders (tie → stratum key asc). Guarantees (pytest): Σ final_alloc
# = budget exactly, and every allocation is within one seat of its exact
# quota (the quota property). Budget = 10% of the corpus, data-derived,
# so every stratum allocation ≤ its stratum size. Scale: one stratum
# groupBy; windows run over the bounded strata table only.
@register(
    "sample_apportionment_plan",
    """
WITH s AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang, source
), t AS (
  SELECT CAST(sum(n) AS BIGINT) AS tot, CAST(sum(n) // 10 AS BIGINT) AS budget FROM s
), q AS (
  SELECT s.lang, s.source, s.n, t.tot, t.budget,
         (t.budget * s.n) // t.tot AS base,
         (t.budget * s.n) % t.tot AS rem
  FROM s CROSS JOIN t
), r AS (
  SELECT lang, source, n, tot, budget, base, rem,
         CAST(row_number() OVER (ORDER BY rem DESC, lang, source) AS BIGINT) AS rr,
         CAST(budget - sum(base) OVER () AS BIGINT) AS leftover
  FROM q
)
SELECT lang, source, n AS n_docs,
       CAST((budget * n * 1000000) // tot AS BIGINT) AS quota_microseats,
       CAST(base AS BIGINT) AS base_alloc,
       CAST(CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra_seat,
       CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS final_alloc
FROM r
ORDER BY lang, source
""",
)
def sample_apportionment_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment of a 10% sample budget
    across (lang, source) strata (B295): exact-total integer seats,
    remainder ranking with deterministic tie-breaks."""
    d = read_table(spark, sf_dir, "documents")
    s = d.groupBy("lang", "source").agg(F.count("*").cast("long").alias("n"))
    t = s.agg(
        F.sum("n").cast("long").alias("tot"),
        F.expr("sum(n) div 10").cast("long").alias("budget"),
    )
    q = s.crossJoin(F.broadcast(t)).select(
        "lang",
        "source",
        "n",
        "tot",
        "budget",
        F.expr("(budget * n) div tot").alias("base"),
        F.expr("(budget * n) % tot").alias("rem"),
    )
    # windows over the bounded strata table only
    r = q.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "lang", "source"))
        .cast("long")
        .alias("rr"),
        (F.col("budget") - F.sum("base").over(Window.partitionBy())).cast("long").alias(
            "leftover"
        ),
    )
    return r.select(
        "lang",
        "source",
        F.col("n").alias("n_docs"),
        F.expr("(budget * n * 1000000) div tot").cast("long").alias("quota_microseats"),
        F.col("base").cast("long").alias("base_alloc"),
        F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0).cast("long").alias(
            "extra_seat"
        ),
        (F.col("base") + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0))
        .cast("long")
        .alias("final_alloc"),
    ).orderBy("lang", "source")


# --------------------------------------------------------------------------
# B313: consistent-hash ring rebalance audit (placement planning).
#
# The placement question every sharded serving tier asks before scaling
# out: if the corpus is placed on an N-server consistent-hash ring (16
# virtual nodes per server, 32-bit md5 positions), how much data moves
# when server N+1 joins? Consistent hashing's contract is that adding a
# server only STEALS keys for the newcomer — no doc may move between two
# old servers (the pytest theorem) — and the stolen share concentrates
# near 1/(N+1). The query assigns every document under both the 8-server
# and 9-server rings and emits the per-server before/after/inbound counts
# plus the global moved fraction.
#
# Scale: the ring is a ≤144-row broadcast literal; assignment is one
# crossJoin + per-doc argmin (window partitioned BY doc_id), so the work
# is rows × 144 with no shuffle beyond the doc key — linear in documents.
# --------------------------------------------------------------------------

_B313_VNODES = 16
_B313_N_A = 8  # before
_B313_N_B = 9  # after (adds server s8)


@register(
    "doc_ring_rebalance_audit",
    f"""
WITH ring AS (
  SELECT CAST(s AS BIGINT) AS srv, CAST(v AS BIGINT) AS vn,
         CAST(('0x' || substr(md5('ring:' || CAST(s AS VARCHAR) || ':'
                                  || CAST(v AS VARCHAR)), 1, 8)) AS BIGINT) AS pos
  FROM unnest(range({_B313_N_B})) AS rs(s), unnest(range({_B313_VNODES})) AS rv(v)
), d AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM documents
), asg AS (
  SELECT n_srv, doc_id, srv FROM (
    SELECT cfg.n_srv, d.doc_id, r.srv,
           row_number() OVER (
             PARTITION BY cfg.n_srv, d.doc_id
             ORDER BY (r.pos - d.h + 4294967296) % 4294967296, r.srv, r.vn
           ) AS rn
    FROM (VALUES ({_B313_N_A}), ({_B313_N_B})) cfg(n_srv)
    CROSS JOIN d
    JOIN ring r ON r.srv < cfg.n_srv
  ) t WHERE rn = 1
), moved AS (
  SELECT a.doc_id, a.srv AS srv_a, b.srv AS srv_b
  FROM (SELECT doc_id, srv FROM asg WHERE n_srv = {_B313_N_A}) a
  JOIN (SELECT doc_id, srv FROM asg WHERE n_srv = {_B313_N_B}) b USING (doc_id)
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN srv_a <> srv_b THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
  FROM moved
)
SELECT CAST(s AS BIGINT) AS server,
       CAST(count(CASE WHEN m.srv_a = s THEN 1 END) AS BIGINT) AS n_docs_before,
       CAST(count(CASE WHEN m.srv_b = s THEN 1 END) AS BIGINT) AS n_docs_after,
       CAST(count(CASE WHEN m.srv_b = s AND m.srv_a <> s THEN 1 END) AS BIGINT)
         AS n_inbound,
       t.n_moved AS total_moved,
       CAST(t.n_moved * 1000000 // t.n_docs AS BIGINT) AS moved_ppm
FROM unnest(range({_B313_N_B})) AS g(s), moved m, tot t
GROUP BY s, t.n_moved, t.n_docs
ORDER BY server
""",
)
def doc_ring_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash placement under the 8- and 9-server rings (B313):
    per-server before/after/inbound counts + global moved fraction. The
    no-reshuffle theorem (old→old moves = 0) is the pytest law."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "cast(conv(substring(md5(concat('doc:', cast(doc_id as string))), 1, 8), 16, 10)"
            " as bigint)"
        ).alias("h"),
    )
    ring = (
        spark.range(_B313_N_B)
        .select(F.col("id").cast("long").alias("srv"))
        .crossJoin(spark.range(_B313_VNODES).select(F.col("id").cast("long").alias("vn")))
        .select(
            "srv",
            "vn",
            F.expr(
                "cast(conv(substring(md5(concat('ring:', cast(srv as string), ':',"
                " cast(vn as string))), 1, 8), 16, 10) as bigint)"
            ).alias("pos"),
        )
    )
    cfg = spark.createDataFrame([(_B313_N_A,), (_B313_N_B,)], "n_srv long")
    cand = (
        docs.crossJoin(F.broadcast(cfg))
        .join(F.broadcast(ring), F.col("srv") < F.col("n_srv"))
        .select(
            "n_srv",
            "doc_id",
            "srv",
            "vn",
            F.expr("(pos - h + 4294967296) % 4294967296").alias("rd"),
        )
    )
    # argmin by (rd, srv, vn) as a MIN over a struct (lexicographic
    # struct comparison == the previous window's ORDER BY) — a map-side-
    # combinable aggregate, so the docs × servers × vnodes candidate
    # fan-out (≈22M rows at sf0.1) partial-reduces in the scan stage
    # instead of shuffling through a row_number sort (r14 opt; guide
    # §2.3 "aggregate before you shuffle").
    asg = (
        cand.groupBy("n_srv", "doc_id")
        .agg(F.min(F.struct("rd", "srv", "vn")).alias("__m"))
        .select("n_srv", "doc_id", F.col("__m.srv").alias("srv"))
    )
    a = asg.filter(F.col("n_srv") == _B313_N_A).select("doc_id", F.col("srv").alias("srv_a"))
    b = asg.filter(F.col("n_srv") == _B313_N_B).select("doc_id", F.col("srv").alias("srv_b"))
    moved = a.join(b, "doc_id")
    tot = moved.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("srv_a") != F.col("srv_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved"),
    )
    grid = spark.range(_B313_N_B).select(F.col("id").cast("long").alias("server"))
    return (
        F.broadcast(grid)
        .crossJoin(moved)
        .groupBy("server")
        .agg(
            F.sum(F.when(F.col("srv_a") == F.col("server"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_before"),
            F.sum(F.when(F.col("srv_b") == F.col("server"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_after"),
            F.sum(
                F.when(
                    (F.col("srv_b") == F.col("server")) & (F.col("srv_a") != F.col("server")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_inbound"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "server",
            "n_docs_before",
            "n_docs_after",
            "n_inbound",
            F.col("n_moved").alias("total_moved"),
            F.expr("n_moved * 1000000 div n_docs").cast("long").alias("moved_ppm"),
        )
        .orderBy("server")
    )
