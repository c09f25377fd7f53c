"""Deduplication family over ``documents`` / ``embeddings`` (SURVEY.md §2.B
B1/B2 + training-pipeline ops): exact hash dedup, n-gram Jaccard near-dup,
MinHash-LSH near-dup, SimHash, embedding-cosine near-dup.

Scale design notes (the part that must survive 100 TB):
- Exact dedup is a hash groupBy — one shuffle on the content hash, map-side
  partial aggregation, no skew (md5 keys are uniform).
- Near-dup NEVER does an unblocked all-pairs join. The exact-Jaccard query
  blocks on the minimum shingle (a 1-row MinHash: P[block match] =
  Jaccard, so recall ≈ j of each pair — fine for j ≥ 0.5 verification
  work); the LSH query uses the classic banded signature → explode bands →
  equi-join on (band, key) — both are equi-joins Catalyst shuffles on a
  uniform key, candidates verified with exact Jaccard afterwards.
- All hashes are portable integer arithmetic (functions/texthash.py), so
  the DuckDB oracle reproduces signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texthash as H
from ..functions import vector as V
from ..io import read_table
from ..operators.cachescope import scope_caches
from ..queries import register

JACCARD_THRESHOLD = 0.5
COSINE_THRESHOLD = 0.45


# --------------------------------------------------------------------------
# B1: exact dedup by content hash (keep lowest doc_id per group)
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    """
SELECT md5(text) AS content_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_doc_id")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup with min-shingle blocking
# --------------------------------------------------------------------------
@register(
    "neardup_ngram_jaccard",
    f"""
WITH t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM t
), blocked AS (
  SELECT doc_id, shingles, list_min(shingles) AS block_key FROM sh
)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       {H.jaccard_round4_ddb('a.shingles', 'b.shingles')} AS jaccard
FROM blocked a JOIN blocked b
  ON a.block_key = b.block_key AND a.doc_id < b.doc_id
WHERE {H.jaccard_sql_ddb('a.shingles', 'b.shingles')} >= {JACCARD_THRESHOLD}
ORDER BY doc_id_1, doc_id_2
""",
)
def neardup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard ≥ 0.5 pairs, blocked on the lexicographic-min
    shingle (single-hash MinHash blocking) — an equi-join, not a cross join.

    Shuffle discipline: the blocking self-join moves only (doc_id,
    block_key) pairs; the (large) shingle arrays are re-attached to the few
    surviving candidate pairs by id — each document's shingles cross the
    wire per candidate reference, never per block row."""
    return jaccard_pairs(read_table(spark, sf_dir, "documents"))


def jaccard_pairs(d: DataFrame) -> DataFrame:
    """The pair stage of ``neardup_ngram_jaccard``, parameterized by the
    document frame so compositions (``corpus_prep_pipeline``) can run it
    over an already-filtered survivor set instead of the raw table. Same
    plan, same shuffle discipline, same oracle arithmetic."""
    toks = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    sh = toks.select("doc_id", F.expr(H.spark_shingles("toks")).alias("shingles")).cache()
    keys = sh.select("doc_id", F.array_min("shingles").alias("block_key"))
    a, b = keys.alias("a"), keys.alias("b")
    cand = a.join(
        b, (F.col("a.block_key") == F.col("b.block_key")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("shingles").alias("sh2"))
    jac = F.expr(H.jaccard_sql_spark("sh1", "sh2"))
    out = (
        cand.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_id_1", "doc_id_2", F.expr(H.jaccard_round4_spark("sh1", "sh2")).alias("jaccard"))
        .orderBy("doc_id_1", "doc_id_2")
    )
    return scope_caches(out, sh)


# --------------------------------------------------------------------------
# B2: MinHash-LSH near-dup (banded signatures → candidate join → verify)
# --------------------------------------------------------------------------
def _minhash_lsh_oracle() -> str:
    sig_exprs = H.ddb_minhash_sig("hashes")
    sig_cols = ", ".join(f"{e} AS m{j}" for j, e in enumerate(sig_exprs))
    band_keys = [
        " || ':' || ".join(
            f"CAST(m{b * H.ROWS_PER_BAND + r} AS VARCHAR)" for r in range(H.ROWS_PER_BAND)
        )
        for b in range(H.N_BANDS)
    ]
    band_cols = ", ".join(f"{k} AS band{b}" for b, k in enumerate(band_keys))
    band_match = " OR ".join(f"a.band{b} = b.band{b}" for b in range(H.N_BANDS))
    return f"""
WITH t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM t
), hashed AS (
  SELECT doc_id, shingles, {H.ddb_hash_array('shingles')} AS hashes FROM sh
), sig AS (
  SELECT doc_id, shingles, {sig_cols} FROM hashed
), banded AS (
  SELECT doc_id, shingles, {band_cols} FROM sig
)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       {H.jaccard_round4_ddb('a.shingles', 'b.shingles')} AS jaccard
FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ({band_match})
WHERE {H.jaccard_sql_ddb('a.shingles', 'b.shingles')} >= {JACCARD_THRESHOLD}
ORDER BY doc_id_1, doc_id_2
"""


@register("neardup_minhash_lsh", _minhash_lsh_oracle())
def neardup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16 portable min-hashes in 4 bands of 4; pairs sharing ≥1 band are
    candidates (explode bands → equi-join on (band_id, key) — the scalable
    plan), then exact-Jaccard verified at ≥ 0.5."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    sh = toks.select("doc_id", F.expr(H.spark_shingles("toks")).alias("shingles")).cache()
    hashed = sh.withColumn("hashes", F.expr(H.spark_hash_array("shingles")))
    sig = hashed.select(
        "doc_id",
        *[F.expr(e).alias(f"m{j}") for j, e in enumerate(H.spark_minhash_sig("hashes"))],
    )
    band_keys = [
        F.concat_ws(":", *[F.col(f"m{b * H.ROWS_PER_BAND + r}").cast("string") for r in range(H.ROWS_PER_BAND)])
        for b in range(H.N_BANDS)
    ]
    # bands shuffle as small (doc_id, band_id, key) rows — shingle arrays
    # rejoin only the surviving candidate pairs (same discipline as the
    # jaccard query above). The band-key array MUST materialize (cache)
    # before the explode: Catalyst collapses projections into the Generate,
    # re-evaluating the 16 minhash folds per band row — measured 2.3 s vs
    # 1.0 s here, and a 50× cliff if another projection layer intervenes
    # (same Generate discipline as doc_decontaminate).
    pre = sig.select("doc_id", F.array(*band_keys).alias("bk")).cache()
    banded = pre.select("doc_id", F.posexplode("bk").alias("band_id", "band_key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
        .dropDuplicates(["doc_id_1", "doc_id_2"])  # pairs can share several bands
    )
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("shingles").alias("sh2"))
    jac = F.expr(H.jaccard_sql_spark("sh1", "sh2"))
    out = (
        cand.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_id_1", "doc_id_2", F.expr(H.jaccard_round4_spark("sh1", "sh2")).alias("jaccard"))
        .orderBy("doc_id_1", "doc_id_2")
    )
    return scope_caches(out, sh, pre)


# --------------------------------------------------------------------------
# connected components over the near-dup pair graph → dedup groups
# --------------------------------------------------------------------------
def _cc_ctes() -> str:
    """Shared recursive-CTE chain (pairs → sym → reach) for the
    components and keep-canonical oracles; callers prepend
    ``WITH RECURSIVE`` via the register-site rewrite."""
    pairs_sql = f"""
WITH t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM t
), blocked AS (
  SELECT doc_id, shingles, list_min(shingles) AS block_key FROM sh
), pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM blocked a JOIN blocked b
    ON a.block_key = b.block_key AND a.doc_id < b.doc_id
  WHERE {H.jaccard_sql_ddb('a.shingles', 'b.shingles')} >= {JACCARD_THRESHOLD}
)"""
    return f"""
{pairs_sql},
sym AS (
  SELECT src AS a, dst AS b FROM pairs UNION SELECT dst, src FROM pairs
),
reach AS (
  SELECT a, a AS b FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
)"""


def _components_oracle() -> str:
    return f"""
{_cc_ctes()}
SELECT a AS doc_id, min(b) AS component_id
FROM reach
GROUP BY a
ORDER BY doc_id
"""


@register("neardup_components", "WITH RECURSIVE " + _components_oracle().lstrip().removeprefix("WITH "))
def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2's final step: near-dup pairs → duplicate groups via iterative
    min-label propagation (operators/components.py); component_id is the
    canonical (minimum) doc_id. The oracle computes the same closure with
    a recursive CTE."""
    from ..operators.components import connected_components

    pairs = neardup_ngram_jaccard(spark, sf_dir).select("doc_id_1", "doc_id_2")
    comps = connected_components(pairs, "doc_id_1", "doc_id_2")
    return (
        comps.select(F.col("node").alias("doc_id"), F.col("comp").alias("component_id"))
        .orderBy("doc_id")
    )


@register(
    "neardup_dedup_keep",
    "WITH RECURSIVE "
    + _cc_ctes().lstrip().removeprefix("WITH ")
    + """,
labels AS (SELECT a AS node, min(b) AS comp FROM reach GROUP BY a)
SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM labels WHERE node <> comp)
ORDER BY d.doc_id
""",
)
def neardup_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 end-to-end, hash-checked (round 4): near-dup pairs → components →
    KEEP SET — every doc outside the pair graph plus each component's
    canonical (min-id) member. This is ``dedup_keep_canonical``
    (operators/components.py) exercised as a registry query, riding the
    auto CC routing (driver union-find below threshold, alternating-star
    above). The untouched-majority anti-join is the shape that matters at
    100 TB: the corpus never shuffles, only the (tiny) loser set does."""
    from ..operators.components import dedup_keep_canonical

    docs = read_table(spark, sf_dir, "documents")
    pairs = neardup_ngram_jaccard(spark, sf_dir).select("doc_id_1", "doc_id_2")
    kept = dedup_keep_canonical(docs, pairs, id_col="doc_id")
    return (
        kept.select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# SimHash: per-document 32-bit signature
# --------------------------------------------------------------------------
@register(
    "doc_simhash",
    f"""
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
), hashed AS (
  SELECT doc_id, {H.ddb_hash_array('toks')} AS hashes FROM t
)
SELECT doc_id, CAST({H.ddb_simhash('hashes')} AS BIGINT) AS simhash
FROM hashed
ORDER BY doc_id
""",
)
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over distinct-token polynomial hashes; near-dups land
    within small Hamming distance, so at scale pairing blocks on 16-bit
    halves (a pair within Hamming ≤ k collides on ≥1 half for k ≤ 1 per
    half — the standard pigeonhole blocking)."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("toks"))
    hashed = t.select("doc_id", F.expr(H.spark_hash_array("toks")).alias("hashes"))
    return hashed.select("doc_id", F.expr(H.spark_simhash("hashes")).alias("simhash")).orderBy("doc_id")


# --------------------------------------------------------------------------
# embedding-cosine near-dup over the embeddings table
# --------------------------------------------------------------------------
@register(
    "neardup_embedding_cosine",
    f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       round(list_sum(list_transform(range(1, len(a.embedding)+1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm),
             4) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, len(a.embedding)+1),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm)
      >= {COSINE_THRESHOLD}
ORDER BY vec_id_1, vec_id_2
""",
)
def neardup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: cosine ≥ 0.45 pairs, computed by the blocked-GEMM
    all-pairs operator (operators/similarity.py) — replicate rows to block
    pairs, numpy matmul per block, emit only passing pairs. The oracle is
    the exact all-pairs SQL; results agree to 4 decimals."""
    from ..operators.similarity import all_pairs_cosine

    e = read_table(spark, sf_dir, "embeddings")
    return (
        all_pairs_cosine(e, "vec_id", "embedding", threshold=COSINE_THRESHOLD, n_blocks=8)
        .select(
            F.col("id1").alias("vec_id_1"),
            F.col("id2").alias("vec_id_2"),
            "cosine",
        )
        .orderBy("vec_id_1", "vec_id_2")
    )


# --------------------------------------------------------------------------
# SimHash-banded near-dup: Manku-style Hamming blocking + Jaccard verify (r6)
# --------------------------------------------------------------------------
SIMHASH_HAM_T = 3  # pairs within Hamming ≤ 3 of the 32-bit simhash
SIMHASH_BANDS = 4  # 4 × 8-bit bands: pigeonhole-complete for Hamming ≤ 3


@register(
    "neardup_simhash_hamming",
    f"""
WITH t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), shin AS (
  SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM t
), sim AS (
  SELECT doc_id,
         CAST({H.ddb_simhash(H.ddb_hash_array('shingles'))} AS BIGINT) AS sh
  FROM shin
), pairs AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
  FROM sim a JOIN sim b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sh, b.sh)) <= {SIMHASH_HAM_T}
)
SELECT p.doc_id_1, p.doc_id_2, p.hamming,
       {H.jaccard_round4_ddb('s1.shingles', 's2.shingles')} AS jaccard
FROM pairs p
JOIN shin s1 ON s1.doc_id = p.doc_id_1
JOIN shin s2 ON s2.doc_id = p.doc_id_2
WHERE {H.jaccard_sql_ddb('s1.shingles', 's2.shingles')} >= {JACCARD_THRESHOLD}
ORDER BY doc_id_1, doc_id_2
""",
)
def neardup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup, the Manku et al. WWW'07 production shape: pairs
    whose 32-bit simhash differs in ≤ 3 bits, verified by word-3-gram
    Jaccard ≥ 0.5. The SEMANTIC (what the oracle replays all-pairs) is the
    Hamming + Jaccard predicate; the Spark MECHANISM is banded blocking —
    split the signature into 4 × 8-bit bands, equi-join on (band_id,
    band_value), and by pigeonhole any pair within Hamming ≤ 3 agrees on
    at least one band, so the blocked candidate set is provably COMPLETE
    while never forming the all-pairs product. Verification cost is then
    ∝ candidates: the cheap integer Hamming filter runs on the banded
    join output, and the expensive shingle-set Jaccard only on the
    Hamming survivors (re-attached by id, the same shuffle discipline as
    ``neardup_ngram_jaccard``). At 100 TB: signatures are one int per
    doc; band join keys are uniform bytes unless the corpus is
    pathologically self-similar, and a hot band value degrades to that
    bucket's pairs only — never O(corpus²).

    The signature hashes the 3-gram SHINGLE set, not the token set —
    measured on this corpus (shared small vocabulary): token-set simhash
    concentrates (11.6% of RANDOM pairs within Hamming ≤ 3 → the band
    join degenerates toward all-pairs, 24 s at sf0.1), while shingle-set
    simhash separates perfectly (0 background pairs ≤ 6; near-dups ≤ 3;
    1.5% band-collision rate). Same lesson as MinHash: band over the
    features whose overlap you are detecting — which also makes the
    signature and the Jaccard verify agree on what "similar" means."""
    d = read_table(spark, sf_dir, "documents")
    # The signature is NOT computed with spark_simhash's array-fold form
    # here: that expression is 32 interpreted higher-order aggregates per
    # row, and over SHINGLE arrays (≈ token count per doc, unlike the
    # small distinct-token arrays `doc_simhash` folds) the interpreter
    # cost alone measured ~60 s per pass at sf0.1 — ×2 for the self-join
    # sides. Instead: explode the shingles, hash each ONCE with the
    # codegen'd md5 fast hash, and take the 32 per-bit votes as plain
    # SUM aggregates — whole-stage codegen end-to-end, map-side partial
    # aggregation collapses to one row per doc per partition before the
    # shuffle, and the shuffle key (doc_id) is uniform. Same integer
    # arithmetic as the oracle's all-pairs fold, so values hash-match.
    # Small local files arrive as ONE input split, serializing the (CPU
    # heavy) shingle build on one core; a 100 TB scan has thousands of
    # splits and needs no help. Add the narrow doc_id exchange only when
    # the scan under-parallelizes.
    cores = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < cores:
        d = d.repartition(cores, "doc_id")
    toks0 = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    shin0 = toks0.select("doc_id", F.expr(H.spark_shingles("toks")).alias("shingles")).cache()
    hashed = shin0.select("doc_id", F.explode("shingles").alias("t")).select(
        "doc_id", F.expr(H.spark_str_hash_fast("t")).alias("h")
    )
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(32)
        ]
    )
    sh_expr = None
    for b in range(32):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("bigint")
        sh_expr = bit if sh_expr is None else sh_expr + bit
    # One bigint per doc; cached because the band self-join and the
    # Hamming filter both read it (at 100 TB this is the persisted
    # sketch-index frame, not a luxury).
    sim = votes.select("doc_id", sh_expr.cast("bigint").alias("sh")).cache()
    bands = sim.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("sh"), 8 * i).bitwiseAND(F.lit(255)) for i in range(SIMHASH_BANDS)
            ])
        ).alias("band_id", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).cast("int")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_HAM_T)
        .distinct()  # a pair may collide on several bands
    )
    s1 = shin0.select(F.col("doc_id").alias("doc_id_1"), F.col("shingles").alias("sh1"))
    s2 = shin0.select(F.col("doc_id").alias("doc_id_2"), F.col("shingles").alias("sh2"))
    jac = F.expr(H.jaccard_sql_spark("sh1", "sh2"))
    out = (
        cand.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_id_1", "doc_id_2", "hamming", F.expr(H.jaccard_round4_spark("sh1", "sh2")).alias("jaccard"))
        .orderBy("doc_id_1", "doc_id_2")
    )
    return scope_caches(out, shin0, sim)


# --------------------------------------------------------------------------
# B49: asymmetric containment dedup via prefix-filter similarity join (r7)
# --------------------------------------------------------------------------
# Jaccard misses SUB-DOCUMENT duplication: a short doc fully embedded in a
# much longer one has tiny Jaccard but containment |S_A ∩ S_B| / |S_A| ≈ 1
# (the RefinedWeb/overlap-dedup signal for quotes, mirrors, and wrappers).
# The scalable mechanism is the SSJoin/PPJoin prefix filter (Chaudhuri
# ICDE'06, Xiao WWW'08): order the shingle universe rarest-first by corpus
# document frequency; any B containing ≥ ⌈t·|S_A|⌉ of A's shingles must
# hit at least one of A's first |S_A| − ⌈t·|S_A|⌉ + 1 rarest shingles —
# so probing A's PREFIX tokens against the posting lists is LOSSLESS, and
# prefix tokens are by construction the rarest keys (bounded fanout, no
# hot-key hazard). Threshold arithmetic is pure integers (10·inter ≥ 8·n:
# never a float·n ceiling, which drifts an ulp across engines).
CONTAIN_NUM, CONTAIN_DEN = 8, 10  # t = 0.8


@register(
    "doc_containment_dedup",
    f"""
WITH t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM t
)
SELECT a.doc_id AS doc_id, b.doc_id AS container_doc_id,
       CAST(len(a.shingles) AS BIGINT) AS n_shingles,
       CAST(round(len(list_intersect(a.shingles, b.shingles)) * 10000.0
                  / len(a.shingles)) AS BIGINT) / 10000.0 AS containment
FROM sh a JOIN sh b ON a.doc_id != b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles)) * {CONTAIN_DEN}
      >= {CONTAIN_NUM} * len(a.shingles)
ORDER BY doc_id, container_doc_id
""",
)
def doc_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs (A's shingle set ≥ 80% inside B's) via
    the lossless prefix filter; the oracle replays the ALL-PAIRS semantic
    (the blocking is an optimization, not a semantics change — same
    contract as neardup_simhash_hamming).

    Shuffle discipline: document frequencies are one groupBy on the
    uniform shingle key; the probe joins A's ≤ (n − ⌈t·n⌉ + 1) rarest
    shingles against postings PRUNED by a semi-join on the distinct
    prefix-token set, so the inverted index never materializes for tokens
    no prefix probes; shingle arrays re-attach to surviving pairs by id."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    sh = toks.select("doc_id", F.expr(H.spark_shingles("toks")).alias("shingles")).cache()
    post = sh.select("doc_id", F.explode("shingles").alias("g"))
    df_counts = post.groupBy("g").agg(F.count("*").alias("df"))
    # integer ceiling: need = ⌈t·n⌉ = (8n + 9) div 10; prefix = n − need + 1
    n_sh = F.size("shingles")
    need = F.floor((F.lit(CONTAIN_NUM) * n_sh + F.lit(CONTAIN_DEN - 1)) / F.lit(CONTAIN_DEN))
    ranked = (
        post.join(df_counts, "g")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("g").asc())
            ),
        )
    )
    prefix = (
        ranked.join(sh.select("doc_id", (n_sh - need + 1).alias("plen")), "doc_id")
        .filter(F.col("rn") <= F.col("plen"))
        .select("doc_id", "g")
    )
    pruned_post = post.join(prefix.select("g").distinct(), "g", "left_semi")
    cand = (
        prefix.alias("a")
        .join(pruned_post.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("container_doc_id"))
        .dropDuplicates(["doc_id", "container_doc_id"])
    )
    s1 = sh.select(F.col("doc_id").alias("doc_id"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("container_doc_id"), F.col("shingles").alias("sh2"))
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    out = (
        cand.join(s1, "doc_id")
        .join(s2, "container_doc_id")
        .filter(inter * CONTAIN_DEN >= CONTAIN_NUM * F.size("sh1"))
        .select(
            "doc_id",
            "container_doc_id",
            F.size("sh1").cast("long").alias("n_shingles"),
            (F.round(inter * 10000.0 / F.size("sh1")).cast("long") / 10000.0).alias("containment"),
        )
        .orderBy("doc_id", "container_doc_id")
    )
    return scope_caches(out, sh)


# --------------------------------------------------------------------------
# B50: incremental near-dup — probe a new batch against the corpus index (r7)
# --------------------------------------------------------------------------
# The maintenance path every production dedup pipeline actually runs: the
# accepted corpus keeps a persisted banded-MinHash index; each INGEST
# BATCH computes signatures for its own docs only and probes the index
# with an equi-join on (band_id, band_key) — new-vs-corpus, never
# corpus-vs-corpus, so per-batch cost is O(|batch| + matched candidates)
# regardless of corpus size. Batch docs whose verified Jaccard ≥ 0.5
# against any corpus doc resolve to that doc's id as their canonical
# (min matching id — the keep-first convention); unmatched docs are the
# genuinely-new ones the batch admits. Split here is the doc_id-hash
# 80/20 the decontamination family uses: corpus = bucket < 80.
INCR_SPLIT = 80


def _incr_bucket(dialect: str) -> str:
    h = (H.spark_str_hash_fast if dialect == "spark" else H.ddb_str_hash_fast)(
        "concat('incr:', cast(doc_id as string))" if dialect == "spark" else "'incr:' || CAST(doc_id AS VARCHAR)"
    )
    return f"({h}) % 100"


def _incremental_probe_oracle() -> str:
    sig_exprs = H.ddb_minhash_sig("hashes")
    sig_cols = ", ".join(f"{e} AS m{j}" for j, e in enumerate(sig_exprs))
    band_keys = [
        " || ':' || ".join(
            f"CAST(m{b * H.ROWS_PER_BAND + r} AS VARCHAR)" for r in range(H.ROWS_PER_BAND)
        )
        for b in range(H.N_BANDS)
    ]
    band_cols = ", ".join(f"{k} AS band{b}" for b, k in enumerate(band_keys))
    band_match = " OR ".join(f"n.band{b} = c.band{b}" for b in range(H.N_BANDS))
    return f"""
WITH t AS (
  SELECT doc_id, ({_incr_bucket('ddb')}) < {INCR_SPLIT} AS in_corpus,
         {H.ddb_tokens('text')} AS toks
  FROM documents
), sh AS (
  SELECT doc_id, in_corpus, {H.ddb_shingles('toks')} AS shingles FROM t
), hashed AS (
  SELECT doc_id, in_corpus, shingles, {H.ddb_hash_array('shingles')} AS hashes FROM sh
), sig AS (
  SELECT doc_id, in_corpus, shingles, {sig_cols} FROM hashed
), banded AS (
  SELECT doc_id, in_corpus, shingles, {band_cols} FROM sig
), matches AS (
  SELECT n.doc_id, c.doc_id AS corpus_doc_id, c.shingles AS csh, n.shingles AS nsh
  FROM banded n JOIN banded c
    ON NOT n.in_corpus AND c.in_corpus AND ({band_match})
  WHERE {H.jaccard_sql_ddb('n.shingles', 'c.shingles')} >= {JACCARD_THRESHOLD}
), resolved AS (
  SELECT doc_id, min(corpus_doc_id) AS canonical_doc_id, CAST(count(*) AS BIGINT) AS n_matches
  FROM (SELECT DISTINCT doc_id, corpus_doc_id FROM matches) GROUP BY doc_id
)
SELECT b.doc_id, r.canonical_doc_id,
       COALESCE(r.n_matches, 0) AS n_matches,
       r.canonical_doc_id IS NULL AS is_new
FROM banded b LEFT JOIN resolved r USING (doc_id)
WHERE NOT b.in_corpus
ORDER BY b.doc_id
"""


@register("neardup_incremental_probe", _incremental_probe_oracle())
def neardup_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch near-dup admission against the existing corpus's
    banded MinHash index (B50). Spark shape: signatures/bands compute for
    BOTH sides from the shared expression family (in production the
    corpus side is the PERSISTED band table — `write_index` of the banded
    frame partitioned by band_id — so only the batch side computes
    anything); candidates are an equi-join on (band_id, band_key) between
    the small batch and the index, verified by exact Jaccard, resolved to
    the min matching corpus id, left-joined back so every batch doc
    reports (canonical | is_new)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.expr(_incr_bucket("spark")) < INCR_SPLIT).alias("in_corpus"),
        F.expr(H.spark_tokens("text")).alias("toks"),
    )
    sh = toks.select(
        "doc_id", "in_corpus", F.expr(H.spark_shingles("toks")).alias("shingles")
    ).cache()
    hashed = sh.withColumn("hashes", F.expr(H.spark_hash_array("shingles")))
    sig = hashed.select(
        "doc_id",
        "in_corpus",
        *[F.expr(e).alias(f"m{j}") for j, e in enumerate(H.spark_minhash_sig("hashes"))],
    )
    band_keys = [
        F.concat_ws(
            ":",
            *[F.col(f"m{b * H.ROWS_PER_BAND + r}").cast("string") for r in range(H.ROWS_PER_BAND)],
        )
        for b in range(H.N_BANDS)
    ]
    pre = sig.select("doc_id", "in_corpus", F.array(*band_keys).alias("bk")).cache()
    banded = pre.select("doc_id", "in_corpus", F.posexplode("bk").alias("band_id", "band_key"))
    batch_b = banded.filter(~F.col("in_corpus")).select("doc_id", "band_id", "band_key")
    corpus_b = banded.filter(F.col("in_corpus")).select(
        F.col("doc_id").alias("corpus_doc_id"), "band_id", "band_key"
    )
    cand = (
        batch_b.join(corpus_b, ["band_id", "band_key"])
        .select("doc_id", "corpus_doc_id")
        .dropDuplicates(["doc_id", "corpus_doc_id"])
    )
    s1 = sh.filter(~F.col("in_corpus")).select(F.col("doc_id"), F.col("shingles").alias("nsh"))
    s2 = sh.filter(F.col("in_corpus")).select(
        F.col("doc_id").alias("corpus_doc_id"), F.col("shingles").alias("csh")
    )
    jac = F.expr(H.jaccard_sql_spark("nsh", "csh"))
    resolved = (
        cand.join(s1, "doc_id")
        .join(s2, "corpus_doc_id")
        .filter(jac >= JACCARD_THRESHOLD)
        .groupBy("doc_id")
        .agg(
            F.min("corpus_doc_id").alias("canonical_doc_id"),
            F.count("*").cast("long").alias("n_matches"),
        )
    )
    batch_docs = sh.filter(~F.col("in_corpus")).select("doc_id")
    out = (
        batch_docs.join(resolved, "doc_id", "left")
        .select(
            "doc_id",
            "canonical_doc_id",
            F.coalesce(F.col("n_matches"), F.lit(0)).cast("long").alias("n_matches"),
            F.col("canonical_doc_id").isNull().alias("is_new"),
        )
        .orderBy("doc_id")
    )
    return scope_caches(out, sh, pre)


# --------------------------------------------------------------------------
# B62: cross-corpus containment probe — batch vs persisted prefix index (r8)
# --------------------------------------------------------------------------
# B50's maintenance discipline applied to B49's containment semantics
# (VERDICT r7 #5): the accepted corpus persists a containment INDEX —
# the shingle postings list, the corpus document frequencies that define
# the rarest-first prefix order, and the shingle sets for verification —
# and each ingest batch probes it: the batch's own shingles rank against
# the CORPUS dfs (a token the corpus never saw has df 0 — rarest — and
# produces zero candidates by construction), the lossless pigeonhole
# prefix (any ⌈t·n⌉-containing superset must hit one of the n−⌈t·n⌉+1
# first tokens, for ANY global token order) probes the postings with an
# equi-join, and exact set intersection verifies. Per-batch cost is
# O(|batch| + matched candidates) — independent of corpus size — and
# the index is append-maintainable (admitted docs append postings and
# increment dfs; df drift only affects candidate ORDER efficiency, never
# losslessness). Split is the doc_id-hash 80/20 the B50/decontamination
# family uses, salted 'cprobe:'.
CPROBE_SPLIT = 80


def _cprobe_bucket(dialect: str) -> str:
    h = (H.spark_str_hash_fast if dialect == "spark" else H.ddb_str_hash_fast)(
        "concat('cprobe:', cast(doc_id as string))"
        if dialect == "spark"
        else "'cprobe:' || CAST(doc_id AS VARCHAR)"
    )
    return f"({h}) % 100"


@register(
    "doc_containment_probe",
    f"""
WITH t AS (
  SELECT doc_id, ({_cprobe_bucket('ddb')}) < {CPROBE_SPLIT} AS in_corpus,
         {H.ddb_tokens('text')} AS toks
  FROM documents
), sh AS (
  SELECT doc_id, in_corpus, {H.ddb_shingles('toks')} AS shingles FROM t
), m AS (
  SELECT n.doc_id, c.doc_id AS container_doc_id
  FROM sh n JOIN sh c ON NOT n.in_corpus AND c.in_corpus
  WHERE len(list_intersect(n.shingles, c.shingles)) * {CONTAIN_DEN}
        >= {CONTAIN_NUM} * len(n.shingles)
), resolved AS (
  SELECT doc_id, min(container_doc_id) AS container_doc_id,
         CAST(count(*) AS BIGINT) AS n_containers
  FROM m GROUP BY doc_id
)
SELECT b.doc_id, r.container_doc_id,
       COALESCE(r.n_containers, 0) AS n_containers,
       r.container_doc_id IS NULL AS is_new
FROM sh b LEFT JOIN resolved r USING (doc_id)
WHERE NOT b.in_corpus
ORDER BY b.doc_id
""",
)
def doc_containment_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch containment admission against the corpus's persisted
    prefix/postings index (B62): for every batch doc, is ≥80% of its
    shingle set already inside some accepted corpus doc? Reports the min
    containing corpus id, the container count, and the is_new verdict —
    the oracle replays the batch-vs-corpus ALL-PAIRS semantic (the
    persisted index + prefix filter are optimizations, not semantics;
    same contract as doc_containment_dedup / neardup_incremental_probe).

    Shuffle discipline: the index (postings, dfs, sets) builds ONCE per
    corpus and persists (one uniform-key groupBy + two map-only writes);
    the probe ranks ONLY batch shingles (left join onto corpus dfs,
    unseen → df 0), prunes postings by a semi-join on the distinct
    prefix-token set before the candidate equi-join, and verifies only
    surviving pairs — nothing rescans or reshuffles the corpus."""
    import os

    from .similarity_queries import _ivf_index_path

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.expr(_cprobe_bucket("spark")) < CPROBE_SPLIT).alias("in_corpus"),
        F.expr(H.spark_tokens("text")).alias("toks"),
    )
    sh = toks.select(
        "doc_id", "in_corpus", F.expr(H.spark_shingles("toks")).alias("shingles")
    )
    path = _ivf_index_path(sf_dir, "contain_index")
    if path not in _CPROBE_BUILT:
        corpus_sh = sh.filter(F.col("in_corpus")).select("doc_id", "shingles")
        post = corpus_sh.select(
            F.col("doc_id").alias("container_doc_id"), F.explode("shingles").alias("g")
        )
        post.write.mode("overwrite").parquet(os.path.join(path, "postings"))
        post.groupBy("g").agg(F.count("*").alias("df")).write.mode("overwrite").parquet(
            os.path.join(path, "df")
        )
        corpus_sh.write.mode("overwrite").parquet(os.path.join(path, "sets"))
        _CPROBE_BUILT.add(path)
    postings = spark.read.parquet(os.path.join(path, "postings"))
    dfc = spark.read.parquet(os.path.join(path, "df"))
    csets = spark.read.parquet(os.path.join(path, "sets")).select(
        F.col("doc_id").alias("container_doc_id"), F.col("shingles").alias("csh")
    )
    batch = sh.filter(~F.col("in_corpus")).select("doc_id", "shingles").cache()
    bpost = batch.select("doc_id", F.explode("shingles").alias("g"))
    n_sh = F.size("shingles")
    need = F.floor((F.lit(CONTAIN_NUM) * n_sh + F.lit(CONTAIN_DEN - 1)) / F.lit(CONTAIN_DEN))
    ranked = bpost.join(dfc, "g", "left").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.coalesce(F.col("df"), F.lit(0)).asc(), F.col("g").asc()
            )
        ),
    )
    prefix = (
        ranked.join(batch.select("doc_id", (n_sh - need + 1).alias("plen")), "doc_id")
        .filter(F.col("rn") <= F.col("plen"))
        .select("doc_id", "g")
    )
    pruned_post = postings.join(prefix.select("g").distinct(), "g", "left_semi")
    cand = (
        prefix.join(pruned_post, "g")
        .select("doc_id", "container_doc_id")
        .dropDuplicates(["doc_id", "container_doc_id"])
    )
    inter = F.size(F.array_intersect(F.col("shingles"), F.col("csh")))
    resolved = (
        cand.join(batch, "doc_id")
        .join(csets, "container_doc_id")
        .filter(inter * CONTAIN_DEN >= CONTAIN_NUM * F.size("shingles"))
        .groupBy("doc_id")
        .agg(
            F.min("container_doc_id").alias("container_doc_id"),
            F.count("*").cast("long").alias("n_containers"),
        )
    )
    out = (
        batch.select("doc_id")
        .join(resolved, "doc_id", "left")
        .select(
            "doc_id",
            "container_doc_id",
            F.coalesce(F.col("n_containers"), F.lit(0)).cast("long").alias("n_containers"),
            F.col("container_doc_id").isNull().alias("is_new"),
        )
        .orderBy("doc_id")
    )
    return scope_caches(out, batch)


_CPROBE_BUILT: set[str] = set()


# --------------------------------------------------------------------------
# B93: MinHash sketch-fidelity audit (r9, below-fold for r10)
# --------------------------------------------------------------------------
# The meta-operator that validates the dedup family's own tooling: for
# every LSH candidate pair (>= 1 shared band — the exact population the
# production pipeline verifies), compare the MinHash ESTIMATE of Jaccard
# (matching signature positions / 16) against the EXACT shingle Jaccard,
# and histogram the absolute error in 5%-wide buckets. This is how you
# decide whether 16 hashes / 4 bands is enough before trusting the
# sketch at 100 TB — the theory says E[est] = J with sd ~ sqrt(J(1-J)/k);
# this measures it on YOUR corpus. Integer 1e4 units end to end
# (625 per matching position, inter*1e4 div union for exact), so the
# histogram is engine-identical. Scale shape: candidates come from the
# SAME banded equi-join as neardup_minhash_lsh (never all-pairs);
# signatures rejoin by doc_id; the histogram is a bounded-key groupBy.
def _sketch_fidelity_oracle() -> str:
    sig_exprs = H.ddb_minhash_sig("hashes")
    sig_list = "[" + ", ".join(sig_exprs) + "]"
    band_keys = [
        " || ':' || ".join(
            f"CAST(ms[{b * H.ROWS_PER_BAND + r + 1}] AS VARCHAR)" for r in range(H.ROWS_PER_BAND)
        )
        for b in range(H.N_BANDS)
    ]
    band_cols = ", ".join(f"{k} AS band{b}" for b, k in enumerate(band_keys))
    band_match = " OR ".join(f"a.band{b} = b.band{b}" for b in range(H.N_BANDS))
    return f"""
WITH t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM t
), hashed AS (
  SELECT doc_id, shingles, {H.ddb_hash_array('shingles')} AS hashes FROM sh
), sig AS (
  SELECT doc_id, shingles, {sig_list} AS ms FROM hashed
), banded AS (
  SELECT doc_id, shingles, ms, {band_cols} FROM sig
), pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(list_sum(list_transform(range(1, {H.N_HASHES} + 1),
              i -> CASE WHEN a.ms[CAST(i AS INT)] = b.ms[CAST(i AS INT)] THEN 1 ELSE 0 END))
              * 10000 // {H.N_HASHES} AS BIGINT) AS est_e4,
         CAST(len(list_intersect(a.shingles, b.shingles)) * 10000
              // (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
              AS BIGINT) AS exact_e4
  FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ({band_match})
)
SELECT CAST(abs(est_e4 - exact_e4) // 500 AS BIGINT) AS err_bucket,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(est_e4) // count(*) AS BIGINT) AS mean_est_e4,
       CAST(sum(exact_e4) // count(*) AS BIGINT) AS mean_exact_e4
FROM pairs
GROUP BY err_bucket
ORDER BY err_bucket
"""


@register("neardup_sketch_fidelity", _sketch_fidelity_oracle())
def neardup_sketch_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimate vs exact Jaccard over the LSH candidate
    population (B93): absolute-error histogram in 5% buckets, integer
    1e4 units — the sketch-parameter validation audit."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    sh = toks.select("doc_id", F.expr(H.spark_shingles("toks")).alias("shingles")).cache()
    hashed = sh.withColumn("hashes", F.expr(H.spark_hash_array("shingles")))
    sig = hashed.select(
        "doc_id",
        "shingles",
        F.array(*[F.expr(e) for e in H.spark_minhash_sig("hashes")]).alias("ms"),
    ).cache()
    band_keys = [
        F.concat_ws(
            ":",
            *[
                F.col("ms").getItem(b * H.ROWS_PER_BAND + r).cast("string")
                for r in range(H.ROWS_PER_BAND)
            ],
        )
        for b in range(H.N_BANDS)
    ]
    pre = sig.select("doc_id", F.array(*band_keys).alias("bk")).cache()
    banded = pre.select("doc_id", F.posexplode("bk").alias("band_id", "band_key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .dropDuplicates(["d1", "d2"])
    )
    s1 = sig.select(
        F.col("doc_id").alias("d1"), F.col("shingles").alias("sh1"), F.col("ms").alias("ms1")
    )
    s2 = sig.select(
        F.col("doc_id").alias("d2"), F.col("shingles").alias("sh2"), F.col("ms").alias("ms2")
    )
    est = F.expr(
        f"size(filter(zip_with(ms1, ms2, (x, y) -> x = y), t -> t)) * 10000 div {H.N_HASHES}"
    ).cast("long")
    inter = "size(array_intersect(sh1, sh2))"
    exact = F.expr(
        f"{inter} * 10000 div (size(sh1) + size(sh2) - {inter})"
    ).cast("long")
    pairs = (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select(est.alias("est_e4"), exact.alias("exact_e4"))
    )
    out = (
        pairs.select(
            F.expr("abs(est_e4 - exact_e4) div 500").cast("long").alias("err_bucket"),
            "est_e4",
            "exact_e4",
        )
        .groupBy("err_bucket")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.expr("sum(est_e4) div count(*)").cast("long").alias("mean_est_e4"),
            F.expr("sum(exact_e4) div count(*)").cast("long").alias("mean_exact_e4"),
        )
        .orderBy("err_bucket")
    )
    return scope_caches(out, sh, sig, pre)


# --------------------------------------------------------------------------
# B94: cross-source duplication matrix (r9, below-fold for r10)
# --------------------------------------------------------------------------
# Mixture design needs to know which SOURCES duplicate each other
# (mirror crawls, syndicated feeds) before weights are assigned —
# deduplicating a source pair that is 40% shared silently reweights the
# mix. For every source pair: how many of the smaller source's distinct
# content hashes also appear in the other, as a ppm overlap rate. Exact
# content identity (the B1 md5 discipline); the join runs on the hash
# key over DISTINCT (source, hash) rows — volume bounded by distinct
# content, never row pairs; the |sources|² output is tiny.
@register(
    "source_duplication_matrix",
    """
WITH h AS (
  SELECT DISTINCT source, md5(text) AS th FROM documents
), sz AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY source
), ov AS (
  SELECT a.source AS source_1, b.source AS source_2, CAST(count(*) AS BIGINT) AS n_shared
  FROM h a JOIN h b ON a.th = b.th AND a.source < b.source
  GROUP BY a.source, b.source
), grid AS (
  SELECT s1.source AS source_1, s2.source AS source_2, s1.n AS n1, s2.n AS n2
  FROM sz s1 JOIN sz s2 ON s1.source < s2.source
)
SELECT g.source_1, g.source_2, g.n1, g.n2,
       CAST(coalesce(o.n_shared, 0) AS BIGINT) AS n_shared,
       CAST(coalesce(o.n_shared, 0) * 1000000 // least(g.n1, g.n2) AS BIGINT) AS overlap_ppm
FROM grid g LEFT JOIN ov o ON o.source_1 = g.source_1 AND o.source_2 = g.source_2
ORDER BY g.source_1, g.source_2
""",
)
def source_duplication_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise exact-content overlap between sources in ppm of the
    smaller side (B94) — the mixture-design redundancy audit."""
    d = read_table(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("th")).distinct()
    sz = h.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a = h.select(F.col("source").alias("source_1"), "th")
    b = h.select(F.col("source").alias("source_2"), "th")
    ov = (
        a.join(b, "th")
        .filter(F.col("source_1") < F.col("source_2"))
        .groupBy("source_1", "source_2")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    s1 = sz.select(F.col("source").alias("source_1"), F.col("n").alias("n1"))
    s2 = sz.select(F.col("source").alias("source_2"), F.col("n").alias("n2"))
    grid = s1.join(s2, F.col("source_1") < F.col("source_2"))
    return (
        grid.join(F.broadcast(ov), ["source_1", "source_2"], "left")
        .select(
            "source_1",
            "source_2",
            "n1",
            "n2",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.expr("coalesce(n_shared, 0) * 1000000 div least(n1, n2)")
            .cast("long")
            .alias("overlap_ppm"),
        )
        .orderBy("source_1", "source_2")
    )


# --------------------------------------------------------------------------
# B97: leakage-safe grouped train/valid/test split (r9, for r10)
# --------------------------------------------------------------------------
# The often-botched training-data op B11's doc_hash_split gets wrong by
# design: hashing DOCUMENTS puts near-duplicates of a training doc into
# the test set (evaluation leakage). The fix splits by NEAR-DUP CLUSTER:
# docs map to their connected component (singletons to themselves), the
# CLUSTER id hashes into 80/10/10 — so an entire duplicate family lands
# in one split, structurally. Reuses the B2 pair graph + CC closure
# (shared oracle CTE chain); the assignment adds one hash expression and
# a left join against the bounded component table. The r9 pytest
# demonstrates the hazard is real on this corpus: the naive doc-hash
# split DOES straddle clusters that the grouped split keeps together.
@register(
    "doc_grouped_split",
    "WITH RECURSIVE "
    + _cc_ctes().lstrip().removeprefix("WITH ")
    + """,
labels AS (SELECT a AS node, min(b) AS comp FROM reach GROUP BY a),
assign AS (
  SELECT d.doc_id,
         CAST(coalesce(l.comp, d.doc_id) AS BIGINT) AS cluster_id
  FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
), bucketed AS (
  SELECT doc_id, cluster_id,
         CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || ':gsplit'), 1, 8)) AS BIGINT) % 100 AS b
  FROM assign
)
SELECT doc_id, cluster_id,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
FROM bucketed
ORDER BY doc_id
""",
)
def doc_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document train/valid/test assignment hashed by NEAR-DUP
    CLUSTER id (B97) — duplicate families never straddle splits, so
    evaluation can't leak through near-copies. The components table is
    deliberately NOT broadcast-hinted: it scales with the number of
    near-dup nodes, which at corpus scale is not broadcastable — AQE
    picks the join strategy from its actual runtime size (VERDICT r10
    item 6)."""
    from ..operators.components import connected_components

    d = read_table(spark, sf_dir, "documents")
    pairs = neardup_ngram_jaccard(spark, sf_dir).select("doc_id_1", "doc_id_2")
    comps = connected_components(pairs, "doc_id_1", "doc_id_2").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("comp")
    )
    assign = d.select("doc_id").join(comps, "doc_id", "left").select(
        "doc_id", F.coalesce("comp", "doc_id").cast("long").alias("cluster_id")
    )
    b = F.expr(
        "cast(conv(substring(md5(concat(cast(cluster_id as string), ':gsplit')), 1, 8), 16, 10) as bigint) % 100"
    )
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("valid")).otherwise(F.lit("test"))
    )
    return assign.select("doc_id", "cluster_id", split.alias("split")).orderBy("doc_id")


# --------------------------------------------------------------------------
# B107: near-dup METHOD-AGREEMENT matrix (which blocking do you trust?)
# --------------------------------------------------------------------------
# The dedup family ships three candidate generators that share ONE
# verifier (word-3-gram Jaccard >= 0.5): MinHash-LSH banding (B2),
# min-shingle blocking (B2's cheap form), SimHash Hamming banding (B32).
# Differences between their verified pair sets are therefore PURE
# BLOCKING-RECALL differences — exactly the number a platform needs
# before committing a 100 TB corpus to one of them. This op runs all
# three and emits the full pairwise agreement matrix: per-method pair
# counts, intersection size, and pair-set Jaccard in ppm (diagonal =
# 1e6 by construction — a built-in self-check). The oracle REUSES the
# three registered oracles verbatim as CTE bodies, so the audit can
# never drift from the operators it audits. Scale shape: the three
# generators run their own (already-bounded) plans; the matrix itself
# joins pair KEYS only — two integers per verified pair, never
# shingles.
from ..queries import REGISTRY as _REGISTRY

_AGREE_METHODS = [
    ("minhash_lsh", "neardup_minhash_lsh"),
    ("ngram_minshingle", "neardup_ngram_jaccard"),
    ("simhash_banded", "neardup_simhash_hamming"),
]


def _method_agreement_oracle() -> str:
    ctes = ",\n".join(
        f"src_{tag} AS ({_REGISTRY[qname].oracle})" for tag, qname in _AGREE_METHODS
    )
    tagged = "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS m, doc_id_1, doc_id_2 FROM src_{tag}"
        for tag, _ in _AGREE_METHODS
    )
    grid = "\nUNION ALL\n".join(
        f"SELECT '{m1}' AS method_1, '{m2}' AS method_2"
        for i, (m1, _) in enumerate(_AGREE_METHODS)
        for m2, _q in _AGREE_METHODS[i:]
    )
    return f"""
WITH {ctes},
tagged AS (
{tagged}
),
counts AS (SELECT m, count(*) AS n FROM tagged GROUP BY m),
grid AS (
{grid}
),
inter AS (
  SELECT a.m AS method_1, b.m AS method_2, count(*) AS n_common
  FROM tagged a JOIN tagged b
    ON a.doc_id_1 = b.doc_id_1 AND a.doc_id_2 = b.doc_id_2 AND a.m <= b.m
  GROUP BY a.m, b.m
)
SELECT g.method_1 AS method_1, g.method_2 AS method_2,
       CAST(c1.n AS BIGINT) AS n_pairs_1,
       CAST(c2.n AS BIGINT) AS n_pairs_2,
       CAST(coalesce(i.n_common, 0) AS BIGINT) AS n_common,
       CAST(coalesce(i.n_common, 0) * 1000000
            // greatest(c1.n + c2.n - coalesce(i.n_common, 0), 1) AS BIGINT)
         AS pairset_jaccard_ppm
FROM grid g
JOIN counts c1 ON c1.m = g.method_1
JOIN counts c2 ON c2.m = g.method_2
LEFT JOIN inter i ON i.method_1 = g.method_1 AND i.method_2 = g.method_2
ORDER BY method_1, method_2
"""


@register("neardup_method_agreement", _method_agreement_oracle())
def neardup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise agreement matrix of the three blocked near-dup pair
    generators (B107) — same Jaccard verifier, so every disagreement is
    blocking recall; pair-set Jaccard in ppm, diagonal = 1e6."""
    # The three generators are independent subgraphs; materialize them
    # CONCURRENTLY (guide §2.6 — driver threads, scheduler back-fill)
    # instead of as one serialized union checkpoint: each generator's
    # narrow stage chain leaves most cores idle, so overlapping them
    # recovers the tail (4.2 -> ~2.5 s at sf0.1; frames identical).
    from ..operators.concurrency import materialize_concurrently

    def _gen(tag: str, qname: str):
        def build() -> DataFrame:
            return (
                _REGISTRY[qname]
                .fn(spark, sf_dir)
                .select(F.lit(tag).alias("m"), "doc_id_1", "doc_id_2")
                .localCheckpoint(eager=True)
            )

        return build

    parts = materialize_concurrently(
        spark, *[_gen(tag, qname) for tag, qname in _AGREE_METHODS]
    )
    tagged = parts[0]
    for p in parts[1:]:
        tagged = tagged.unionByName(p)
    counts = tagged.groupBy("m").agg(F.count("*").alias("n"))
    names = [tag for tag, _ in _AGREE_METHODS]
    grid = spark.createDataFrame(
        [(m1, m2) for i, m1 in enumerate(names) for m2 in names[i:]],
        "method_1 string, method_2 string",
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.doc_id_1") == F.col("b.doc_id_1"))
            & (F.col("a.doc_id_2") == F.col("b.doc_id_2"))
            & (F.col("a.m") <= F.col("b.m")),
        )
        .groupBy(F.col("a.m").alias("method_1"), F.col("b.m").alias("method_2"))
        .agg(F.count("*").alias("n_common"))
    )
    c1 = counts.select(F.col("m").alias("method_1"), F.col("n").alias("n_pairs_1"))
    c2 = counts.select(F.col("m").alias("method_2"), F.col("n").alias("n_pairs_2"))
    return (
        grid.join(F.broadcast(c1), "method_1")
        .join(F.broadcast(c2), "method_2")
        .join(F.broadcast(inter), ["method_1", "method_2"], "left")
        .select(
            "method_1",
            "method_2",
            F.col("n_pairs_1").cast("long").alias("n_pairs_1"),
            F.col("n_pairs_2").cast("long").alias("n_pairs_2"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.expr(
                "coalesce(n_common, 0) * 1000000"
                " div greatest(n_pairs_1 + n_pairs_2 - coalesce(n_common, 0), 1)"
            )
            .cast("long")
            .alias("pairset_jaccard_ppm"),
        )
        .orderBy("method_1", "method_2")
    )


# --------------------------------------------------------------------------
# B158: near-dup cluster labeling (what IS this duplicate group?) (r9)
# --------------------------------------------------------------------------
# The curation readout after clustering: for every near-dup component
# with >= 2 members, the top-3 distinguishing terms by cluster-tf x
# corpus rarity (idf in integer milli-nats) — the label a reviewer
# reads before deciding keep-one/drop-all. The oracle REUSES the
# registered neardup_components SQL verbatim as its cluster CTE (the
# B107 discipline: an audit that can never drift from the operator it
# audits), then pure counting arithmetic. Scale shape: clusters join
# their documents' tokens once (explode bounded by cluster member
# text), df is the corpus vocab pass every text op shares, top-3 per
# cluster is a bounded window.
def _cluster_label_oracle() -> str:
    from ..queries import REGISTRY as _REG

    return f"""
WITH comp AS ({_REG["neardup_components"].oracle}),
sized AS (
  SELECT component_id, CAST(count(*) AS BIGINT) AS n_docs
  FROM comp GROUP BY component_id HAVING count(*) >= 2
), ctf AS (
  SELECT c.component_id, t.tok, CAST(count(*) AS BIGINT) AS tf
  FROM comp c
  JOIN sized s ON s.component_id = c.component_id
  JOIN documents d ON d.doc_id = c.doc_id,
       unnest(string_split(d.text, ' ')) AS t(tok)
  WHERE t.tok <> ''
  GROUP BY c.component_id, t.tok
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), df AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY tok
), scored AS (
  SELECT ctf.component_id, ctf.tok AS term,
         CAST(ctf.tf * CAST(round(ln(n.n_docs * 1.0 / df.df) * 1000.0) AS BIGINT) AS BIGINT)
           AS score_milli,
         row_number() OVER (PARTITION BY ctf.component_id
                            ORDER BY ctf.tf * CAST(round(ln(n.n_docs * 1.0 / df.df) * 1000.0) AS BIGINT) DESC,
                                     ctf.tok) AS term_rank
  FROM ctf JOIN df ON df.tok = ctf.tok CROSS JOIN n
)
SELECT s.component_id, z.n_docs, s.term, s.score_milli,
       CAST(s.term_rank AS BIGINT) AS term_rank
FROM scored s JOIN sized z ON z.component_id = s.component_id
WHERE s.term_rank <= 3
ORDER BY s.component_id, s.term_rank
"""


@register("neardup_cluster_labels", _cluster_label_oracle())
def neardup_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms (cluster-tf x integer-milli idf) per
    near-dup component with >= 2 members (B158) — the reviewer-facing
    label; clusters come from the registered neardup_components op, so
    the audit cannot drift from the clustering it describes."""
    d = read_table(spark, sf_dir, "documents")
    # The component chain (shingle pairs → CC, with its own eager jobs)
    # and the corpus document-frequency pass are independent subgraphs;
    # overlap them on driver threads (guide §2.6) instead of serializing
    # the CC materialization before the vocab pass (r14 opt; the n_docs
    # scalar rides the third thread). Frames identical.
    from ..operators.concurrency import materialize_concurrently

    def _dfc() -> DataFrame:
        return (
            d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
            .filter(F.col("tok") != "")
            .distinct()
            .groupBy("tok")
            .agg(F.count("*").cast("long").alias("df"))
            .localCheckpoint(eager=True)
        )

    comp, dfc, n_docs = materialize_concurrently(
        spark, lambda: _REGISTRY["neardup_components"].fn(spark, sf_dir), _dfc, d.count
    )
    sized = (
        comp.groupBy("component_id")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    ctf = (
        comp.join(F.broadcast(sized), "component_id")
        .join(d.select("doc_id", "text"), "doc_id")
        .select("component_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("component_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    scored = ctf.join(dfc, "tok").select(
        "component_id",
        F.col("tok").alias("term"),
        (
            F.col("tf")
            * F.round(F.log(F.lit(float(n_docs)) / F.col("df")) * 1000.0).cast("long")
        )
        .cast("long")
        .alias("score_milli"),
    )
    wr = Window.partitionBy("component_id").orderBy(
        F.col("score_milli").desc(), F.col("term").asc()
    )
    return (
        scored.select(
            "component_id",
            "term",
            "score_milli",
            F.row_number().over(wr).cast("long").alias("term_rank"),
        )
        .filter(F.col("term_rank") <= 3)
        .join(F.broadcast(sized), "component_id")
        .select("component_id", "n_docs", "term", "score_milli", "term_rank")
        .orderBy("component_id", "term_rank")
    )


# ---------------------------------------------------------------------------
# B179: MinHash-LSH parameter planner — the S-curve as code
# ---------------------------------------------------------------------------
# B25 put IVF tuning contracts in code; this is the dedup family's
# counterpart: for every (bands, rows) split of the registered
# N_HASHES=16 signature, the collision probability curve
# p(s) = 1 − (1 − s^r)^b over a Jaccard grid, the curve's threshold
# (1/b)^(1/r) (where p crosses ~50%), and — the number that actually
# drives the choice at 100 TB — the EXPECTED candidate pairs this
# corpus would generate at each similarity level (C(n,2)·p, the
# verification workload). Choosing (b, r) is exactly trading recall at
# the target threshold against that candidate volume; with the curve
# and the workload in one table the choice is reviewable instead of
# folklore (Leskovec/Rajaraman/Ullman, MMDS ch.3). Pure bounded-grid
# compute (5 splits × 10 grid points) + one corpus count broadcast.
LSH_SPLITS = [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]
LSH_S_GRID = [5, 15, 25, 35, 45, 55, 65, 75, 85, 95]  # Jaccard, centi


def _lsh_planner_oracle() -> str:
    splits = ", ".join(f"({b}, {r})" for b, r in LSH_SPLITS)
    grid = ", ".join(f"({s})" for s in LSH_S_GRID)
    return f"""
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
splits(bands, rows_per_band) AS (VALUES {splits}),
grid(s_centi) AS (VALUES {grid})
SELECT CAST(bands AS BIGINT) AS bands,
       CAST(rows_per_band AS BIGINT) AS rows_per_band,
       round(power(1.0 / bands, 1.0 / rows_per_band), 4) AS threshold,
       CAST(s_centi AS BIGINT) AS s_centi,
       round(1.0 - power(1.0 - power(s_centi / 100.0, rows_per_band), bands), 6)
         AS p_collide,
       CAST(floor(n.n_docs * (n.n_docs - 1) / 2.0
            * round(1.0 - power(1.0 - power(s_centi / 100.0, rows_per_band), bands), 6))
         AS BIGINT) AS exp_candidate_pairs
FROM splits, grid, n
ORDER BY bands, s_centi
"""


@register("lsh_param_planner", _lsh_planner_oracle())
def lsh_param_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-curve collision probabilities, thresholds, and expected candidate
    volume for every (bands, rows) split of the N_HASHES signature on
    THIS corpus (B179) — LSH tuning as a reviewable table."""
    d = read_table(spark, sf_dir, "documents")
    n = d.agg(F.count("*").cast("long").alias("n_docs"))
    splits = spark.createDataFrame(LSH_SPLITS, "bands long, rows_per_band long")
    grid = spark.createDataFrame([(s,) for s in LSH_S_GRID], "s_centi long")
    p = F.round(
        1.0 - F.pow(1.0 - F.pow(F.col("s_centi") / 100.0, F.col("rows_per_band")), F.col("bands")),
        6,
    )
    return (
        splits.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(n))
        .select(
            "bands",
            "rows_per_band",
            F.round(F.pow(1.0 / F.col("bands"), 1.0 / F.col("rows_per_band")), 4).alias(
                "threshold"
            ),
            "s_centi",
            p.alias("p_collide"),
            F.floor(F.col("n_docs") * (F.col("n_docs") - 1) / 2.0 * p)
            .cast("long")
            .alias("exp_candidate_pairs"),
        )
        .orderBy("bands", "s_centi")
    )


# ---------------------------------------------------------------------------
# B185: duplicate-group size histogram (the dedup planning readout)
# ---------------------------------------------------------------------------
# Before running dedup at 100 TB you want its shape: are duplicates
# mostly pairs (cheap, keep-first wins) or mega-clusters (boilerplate /
# mirror storms that dominate removal and skew any group-key)? This op
# buckets exact md5-group sizes into power-of-two bands and reports,
# per band: group count, doc count, docs-removed-if-keep-first, and
# each band's share of all removals — the table that predicts both the
# dedup dividend (B176 weights it by tokens) and the skew profile the
# shuffle planner needs. Scale: the same uniform md5 groupBy as B1,
# then a ≤~40-row band table.
@register(
    "dedup_group_size_histogram",
    """
WITH g AS (
  SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS sz FROM documents GROUP BY h
), banded AS (
  SELECT CASE WHEN sz = 1 THEN 0
              ELSE CAST(floor(ln(sz - 1) / ln(2)) AS BIGINT) + 1 END AS band,
         sz
  FROM g
)
SELECT band,
       CAST(CASE WHEN band = 0 THEN 1 ELSE power(2, band - 1) + 1 END AS BIGINT) AS band_lo,
       CAST(CASE WHEN band = 0 THEN 1 ELSE power(2, band) END AS BIGINT) AS band_hi,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(sum(sz - 1) AS BIGINT) AS n_removed_keep_first,
       CAST(sum(sz - 1) * 1000000 // greatest(sum(sum(sz - 1)) OVER (), 1) AS BIGINT)
         AS removal_share_ppm
FROM banded
GROUP BY band
ORDER BY band
""",
)
def dedup_group_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of exact duplicate-group sizes (B185):
    groups/docs/removals per band and each band's share of total
    removals — the dedup cost/skew forecast."""
    d = read_table(spark, sf_dir, "documents")
    g = d.groupBy(F.md5("text").alias("h")).agg(F.count("*").cast("long").alias("sz"))
    banded = g.select(
        F.when(F.col("sz") == 1, F.lit(0))
        .otherwise((F.floor(F.log(2.0, F.col("sz") - 1)) + 1).cast("long"))
        .alias("band"),
        "sz",
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(F.col("sz") - 1).cast("long").alias("n_removed_keep_first"),
        )
        .select(
            "band",
            F.when(F.col("band") == 0, 1)
            .otherwise(F.pow(F.lit(2.0), F.col("band") - 1).cast("long") + 1)
            .cast("long")
            .alias("band_lo"),
            F.when(F.col("band") == 0, 1)
            .otherwise(F.pow(F.lit(2.0), F.col("band")).cast("long"))
            .cast("long")
            .alias("band_hi"),
            "n_groups",
            "n_docs",
            "n_removed_keep_first",
            F.expr(
                "n_removed_keep_first * 1000000"
                " div greatest(sum(n_removed_keep_first) OVER (), 1)"
            )
            .cast("long")
            .alias("removal_share_ppm"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# B188: sampled dedup-rate estimator vs exact (the sampling contract)
# ---------------------------------------------------------------------------
# Before paying for exact dedup at 100 TB you estimate the dividend
# from a hash-mod sample. Sampling GROUPS (not docs) by a hash of the
# group key keeps every group intact, so the group-sum estimator
# 16·Σ_sample(sz−1) is unbiased for total removals — doc-level sampling
# would fragment groups and bias the rate down. This op computes the
# exact removal rate AND the 1/16 group-sample estimate side by side
# with the signed estimation error, making the planning contract
# ("the estimate is trustworthy") itself a checked query. One md5
# groupBy; the sample filter is a map-side predicate on the group key.
DEDUP_SAMPLE_MOD = 16


@register(
    "dedup_rate_sampled_estimate",
    f"""
WITH g AS (
  SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS sz FROM documents GROUP BY h
), agg AS (
  SELECT CAST(sum(sz) AS BIGINT) AS n_docs,
         CAST(sum(sz - 1) AS BIGINT) AS exact_removed,
         CAST(sum(CASE WHEN CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % {DEDUP_SAMPLE_MOD} = 0
                       THEN sz - 1 ELSE 0 END) * {DEDUP_SAMPLE_MOD} AS BIGINT) AS est_removed,
         CAST(sum(CASE WHEN CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % {DEDUP_SAMPLE_MOD} = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled_groups
  FROM g
)
SELECT n_docs, n_sampled_groups, exact_removed, est_removed,
       CAST(exact_removed * 1000000 // n_docs AS BIGINT) AS exact_removed_ppm,
       CAST(est_removed * 1000000 // n_docs AS BIGINT) AS est_removed_ppm,
       CAST((est_removed - exact_removed) * 1000000 // greatest(n_docs, 1) AS BIGINT)
         AS est_error_ppm
FROM agg
""",
)
def dedup_rate_sampled_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs 1/16 group-hash-sampled duplicate-removal rate with the
    signed estimation error (B188) — the contract that says the cheap
    pre-run estimate can be trusted to plan the full dedup."""
    d = read_table(spark, sf_dir, "documents")
    g = d.groupBy(F.md5("text").alias("h")).agg(F.count("*").cast("long").alias("sz"))
    in_sample = (
        F.expr("cast(conv(substring(h, 1, 8), 16, 10) as bigint)") % DEDUP_SAMPLE_MOD == 0
    )
    agg = g.agg(
        F.sum("sz").cast("long").alias("n_docs"),
        F.sum(F.col("sz") - 1).cast("long").alias("exact_removed"),
        (F.sum(F.when(in_sample, F.col("sz") - 1).otherwise(0)) * DEDUP_SAMPLE_MOD)
        .cast("long")
        .alias("est_removed"),
        F.sum(F.when(in_sample, 1).otherwise(0)).cast("long").alias("n_sampled_groups"),
    )
    return agg.select(
        "n_docs",
        "n_sampled_groups",
        "exact_removed",
        "est_removed",
        F.expr("exact_removed * 1000000 div n_docs").cast("long").alias("exact_removed_ppm"),
        F.expr("est_removed * 1000000 div n_docs").cast("long").alias("est_removed_ppm"),
        F.expr("(est_removed - exact_removed) * 1000000 div greatest(n_docs, 1)")
        .cast("long")
        .alias("est_error_ppm"),
    )


# ---------------------------------------------------------------------------
# B190: KMV (k-minimum-values) distinct sketch, exact-oracle form
# ---------------------------------------------------------------------------
# Most distinct sketches (HLL) are engine-specific and only rows-only
# checkable (B124); KMV is the exception — "the K smallest hash values
# of a set" is a DETERMINISTIC function of the data, so the sketch, its
# estimate (K−1)·M/h_K over hash space M=2^60, and the error against
# the exact distinct count are all full-oracle checkable. The sketch is
# also mergeable (union of K-smallest sets → K smallest of the union),
# which is what makes it the cross-partition distinct-count workhorse
# (Bar-Yossef et al.; Beyer et al. SIGMOD'07). Per-source token
# cardinality here; any keyed set plugs in. Scale shape: distinct
# (source, token) reduce, then the K smallest per source via the local
# top-k pre-reduce — never a per-source global sort; sketches with
# fewer than K values report exactly.
KMV_K = 64
KMV_M = 1 << 60


@register(
    "kmv_distinct_sketch",
    f"""
WITH dt AS (
  SELECT DISTINCT source, t FROM (
    SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
  ) WHERE t <> ''
), h AS (
  SELECT source, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS hv FROM dt
), ranked AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rk,
         count(*) OVER (PARTITION BY source) AS nd
  FROM h
)
SELECT source,
       CAST(max(nd) AS BIGINT) AS n_distinct_exact,
       CAST(CASE WHEN max(nd) <= {KMV_K} THEN max(nd)
                 ELSE floor(({KMV_K} - 1) * 1.0 * {KMV_M}
                            / max(CASE WHEN rk = {KMV_K} THEN hv END))
            END AS BIGINT) AS n_distinct_est,
       CAST((CASE WHEN max(nd) <= {KMV_K} THEN max(nd)
                  ELSE floor(({KMV_K} - 1) * 1.0 * {KMV_M}
                             / max(CASE WHEN rk = {KMV_K} THEN hv END)) END
             - max(nd)) * 1000000 // max(nd) AS BIGINT) AS est_error_ppm
FROM ranked
WHERE rk <= {KMV_K}
GROUP BY source
ORDER BY source
""",
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KMV distinct-token sketch with its (K−1)·M/h_K estimate
    and signed error vs the exact count (B190) — the deterministic,
    mergeable, fully oracle-checkable distinct sketch."""
    from vectordb_hr_data_spark.operators.knn import local_topk_per_key

    d = read_table(spark, sf_dir, "documents")
    dt = (
        d.select("source", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
    )
    h = dt.select(
        "source",
        F.expr("cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)").alias("hv"),
    )
    nd = h.groupBy("source").agg(F.count("*").cast("long").alias("nd"))
    # K smallest hashes per source: local per-partition top-k pre-reduce,
    # then the tiny global rank — the mergeable-sketch shape itself.
    small = local_topk_per_key(
        h.withColumn("tie", F.col("hv")), key_col="source", order_cols=("hv", "tie"), k=KMV_K
    )
    w = Window.partitionBy("source").orderBy("hv")
    kth = (
        small.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == KMV_K)
        .select("source", F.col("hv").alias("hk"))
    )
    est = (
        F.when(F.col("nd") <= KMV_K, F.col("nd"))
        .otherwise(F.floor((KMV_K - 1) * float(KMV_M) / F.col("hk")))
        .cast("long")
    )
    return (
        nd.join(kth, "source", "left")
        .select(
            "source",
            F.col("nd").alias("n_distinct_exact"),
            est.alias("n_distinct_est"),
            F.expr(
                f"(CASE WHEN nd <= {KMV_K} THEN nd"
                f" ELSE cast(floor(({KMV_K} - 1) * {float(KMV_M)} / hk) as bigint) END - nd)"
                " * 1000000 div nd"
            )
            .cast("long")
            .alias("est_error_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B192: naive-split leakage audit over exact-duplicate groups
# ---------------------------------------------------------------------------
# B97 exists because hashing DOCUMENTS into train/test lets duplicate
# content straddle the boundary and inflate eval; its pytest proves the
# leak on this corpus. This op registers that evidence as a CHECKED
# QUERY: assign the naive per-doc hash split (hash(doc_id) % 10 → 8/1/1
# train/val/test), then count, over md5 content groups with >1 member,
# how many groups straddle ≥2 splits and how many test/val docs have a
# train-side twin — the leaked-eval headcount. One md5 groupBy with
# conditional counts; the split is a map-side expression.
@register(
    "split_leakage_audit",
    """
WITH s AS (
  SELECT doc_id, md5(text) AS h,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
              THEN 'train'
              WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 8
              THEN 'val' ELSE 'test' END AS split
  FROM documents
), g AS (
  SELECT h,
         CAST(count(*) AS BIGINT) AS sz,
         CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         CAST(sum(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_eval
  FROM s GROUP BY h
)
SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling_groups,
       CAST(sum(CASE WHEN n_splits > 1 AND n_train > 0 THEN n_eval ELSE 0 END) AS BIGINT)
         AS n_leaked_eval_docs,
       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) * 1000000
            // greatest(count(*), 1) AS BIGINT) AS straddle_ppm
FROM g
WHERE sz > 1
""",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How badly a naive per-doc hash split leaks duplicate content across
    train/eval (B192) — straddling-group and leaked-eval-doc counts; the
    registered evidence for the grouped split (B97)."""
    d = read_table(spark, sf_dir, "documents")
    bucket = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 10"
    )
    s = d.select(
        F.md5("text").alias("h"),
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test").alias("split"),
    )
    g = (
        s.groupBy("h")
        .agg(
            F.count("*").cast("long").alias("sz"),
            F.countDistinct("split").cast("long").alias("n_splits"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).cast("long").alias("n_train"),
            F.sum(F.when(F.col("split") != "train", 1).otherwise(0)).cast("long").alias("n_eval"),
        )
        .filter(F.col("sz") > 1)
    )
    return g.agg(
        F.count("*").cast("long").alias("n_dup_groups"),
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_straddling_groups"),
        F.sum(F.when((F.col("n_splits") > 1) & (F.col("n_train") > 0), F.col("n_eval")).otherwise(0))
        .cast("long")
        .alias("n_leaked_eval_docs"),
        F.expr(
            "sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) * 1000000"
            " div greatest(count(*), 1)"
        )
        .cast("long")
        .alias("straddle_ppm"),
    )


# ---------------------------------------------------------------------------
# B196: text-normalization dividend (what canonicalization buys dedup)
# ---------------------------------------------------------------------------
# Exact dedup on raw bytes misses trivial variants — case, runs of
# whitespace, stray punctuation spacing. The standard fix canonicalizes
# BEFORE hashing (C4/CCNet normalize-then-dedup); this op quantifies
# what that buys on THIS corpus: duplicate groups and removable docs
# under raw vs normalized hashing, per source, with the extra-removals
# delta — the evidence that justifies (or kills) the normalize pass.
# The normalizer is engine-identical string algebra: lowercase, strip
# [^a-z0-9 ], collapse whitespace, trim. Two md5 groupBys, both
# uniform-keyed.
@register(
    "dedup_normalization_dividend",
    """
WITH n AS (
  SELECT source,
         md5(text) AS h_raw,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                 ' +', ' ', 'g'))) AS h_norm
  FROM documents
), raw AS (
  SELECT source, CAST(sum(sz - 1) AS BIGINT) AS removed_raw FROM (
    SELECT source, h_raw, count(*) AS sz FROM n GROUP BY source, h_raw
  ) GROUP BY source
), nrm AS (
  SELECT source, CAST(sum(sz - 1) AS BIGINT) AS removed_norm FROM (
    SELECT source, h_norm, count(*) AS sz FROM n GROUP BY source, h_norm
  ) GROUP BY source
), tot AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM n GROUP BY source
)
SELECT t.source, t.n_docs, r.removed_raw, m.removed_norm,
       m.removed_norm - r.removed_raw AS extra_removed,
       CAST((m.removed_norm - r.removed_raw) * 1000000 // t.n_docs AS BIGINT)
         AS dividend_ppm
FROM tot t JOIN raw r ON r.source = t.source JOIN nrm m ON m.source = t.source
ORDER BY t.source
""",
)
def dedup_normalization_dividend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-hash vs normalized-hash duplicate removals per source (B196)
    — the measured dividend of canonicalize-before-dedup."""
    d = read_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    n = d.select("source", F.md5("text").alias("h_raw"), F.md5(norm).alias("h_norm"))
    raw = (
        n.groupBy("source", "h_raw")
        .agg(F.count("*").alias("sz"))
        .groupBy("source")
        .agg(F.sum(F.col("sz") - 1).cast("long").alias("removed_raw"))
    )
    nrm = (
        n.groupBy("source", "h_norm")
        .agg(F.count("*").alias("sz"))
        .groupBy("source")
        .agg(F.sum(F.col("sz") - 1).cast("long").alias("removed_norm"))
    )
    tot = n.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    return (
        tot.join(raw, "source")
        .join(nrm, "source")
        .select(
            "source",
            "n_docs",
            "removed_raw",
            "removed_norm",
            (F.col("removed_norm") - F.col("removed_raw")).cast("long").alias("extra_removed"),
            F.expr("(removed_norm - removed_raw) * 1000000 div n_docs")
            .cast("long")
            .alias("dividend_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B202: near-dup threshold sensitivity curve (picking the Jaccard cut)
# ---------------------------------------------------------------------------
# The 0.5/0.7/0.8 Jaccard threshold every dedup paper reports is a
# CHOICE, and the responsible way to make it is the sensitivity curve:
# how many candidate pairs survive at each cut, from ONE pass over the
# blocked candidate set. Bands of 0.1 over [0.3, 1.0] (the blocking
# floor sits below the house 0.5 threshold so the curve shows what a
# looser cut would admit), with per-band counts and the
# cumulative-at-or-above count that IS the curve. Same min-shingle
# blocked join as B-neardup — one extra banding groupBy (<=8 rows).
SENS_FLOOR = 0.3


@register(
    "neardup_threshold_sensitivity",
    f"""
WITH t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM t
), blocked AS (
  SELECT doc_id, shingles, list_min(shingles) AS block_key FROM sh
), pairs AS (
  SELECT {H.jaccard_round4_ddb('a.shingles', 'b.shingles')} AS j
  FROM blocked a JOIN blocked b
    ON a.block_key = b.block_key AND a.doc_id < b.doc_id
  WHERE {H.jaccard_sql_ddb('a.shingles', 'b.shingles')} >= {SENS_FLOOR}
), banded AS (
  SELECT least(CAST(floor(j * 10) AS BIGINT), 9) AS band FROM pairs
), counts AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n_pairs FROM banded GROUP BY band
)
SELECT band,
       round(band / 10.0, 1) AS band_lo,
       n_pairs,
       CAST(sum(n_pairs) OVER (ORDER BY band DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_pairs_at_or_above
FROM counts
ORDER BY band
""",
)
def neardup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-pair counts per Jaccard band with the cumulative
    at-or-above curve (B202) — the evidence for choosing the dedup
    threshold, from one blocked-join pass. The cumulative window runs
    over the ≤8-row band table."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    # cache the shingle frame: it feeds the block keys AND both join
    # sides — uncached, the shingle build re-runs three times (the
    # jaccard_pairs discipline; this was a 4x on the first bench run)
    sh = toks.select("doc_id", F.expr(H.spark_shingles("toks")).alias("shingles")).cache()
    keys = sh.select("doc_id", F.array_min("shingles").alias("block_key"))
    a, b = keys.alias("a"), keys.alias("b")
    cand = a.join(
        b, (F.col("a.block_key") == F.col("b.block_key")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("shingles").alias("sh2"))
    # compute the array intersection ONCE per pair; both the exact floor
    # filter and the 4-dp band derive from (inter, sizes) — the double
    # intersection evaluation cost 2x on the widest-floor candidate set
    inter = (
        cand.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .select(
            F.expr("size(array_intersect(sh1, sh2))").alias("ni"),
            (F.size("sh1") + F.size("sh2")).alias("ns"),
        )
        .select("ni", (F.col("ns") - F.col("ni")).alias("nu"))
    )
    pairs = inter.filter(
        F.col("ni").cast("double") / F.col("nu") >= SENS_FLOOR
    ).select(
        (F.round(F.col("ni") * 1e4 / F.col("nu")).cast("bigint") / 1e4).alias("j")
    )
    counts = pairs.select(
        F.least(F.floor(F.col("j") * 10).cast("long"), F.lit(9)).alias("band")
    ).groupBy("band").agg(F.count("*").cast("long").alias("n_pairs"))
    wcum = Window.orderBy(F.col("band").desc()).rowsBetween(Window.unboundedPreceding, 0)
    out = (
        counts.select(
            "band",
            F.round(F.col("band") / 10.0, 1).alias("band_lo"),
            "n_pairs",
            F.sum("n_pairs").over(wcum).cast("long").alias("n_pairs_at_or_above"),
        )
        .orderBy("band")
    )
    return scope_caches(out, sh)


# ---------------------------------------------------------------------------
# B203: near-dup cluster-size histogram (B185's sibling for NEAR dups)
# ---------------------------------------------------------------------------
# B185 profiles EXACT-dup groups; near-dup clusters behave differently
# (boilerplate families chain into mega-components through transitive
# links that exact hashing never sees), and the removal/skew forecast
# for the near-dup pass needs ITS histogram: per power-of-two band of
# component size, components / docs / keep-one-removals / removal
# share. Reuses the REGISTERED components closure verbatim — Spark side
# calls the same `connected_components`; the oracle extends the same
# recursive CTE chain (B107 discipline). Singleton docs (no near-dup
# edge) are excluded: the histogram profiles actual clusters.
@register(
    "neardup_cluster_size_histogram",
    "WITH RECURSIVE "
    + _cc_ctes().lstrip().removeprefix("WITH ")
    + """,
labels AS (SELECT a AS node, min(b) AS comp FROM reach GROUP BY a),
sizes AS (SELECT comp, CAST(count(*) AS BIGINT) AS sz FROM labels GROUP BY comp),
banded AS (
  SELECT CASE WHEN sz = 1 THEN 0
              ELSE CAST(floor(ln(sz - 1) / ln(2)) AS BIGINT) + 1 END AS band, sz
  FROM sizes
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(sum(sz - 1) AS BIGINT) AS n_removed_keep_one,
       CAST(sum(sz - 1) * 1000000 // greatest(sum(sum(sz - 1)) OVER (), 1) AS BIGINT)
         AS removal_share_ppm
FROM banded
GROUP BY band
ORDER BY band
""",
)
def neardup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of near-dup component sizes (B203) — the
    removal and skew forecast for the near-dup pass, over the shared
    components closure."""
    from ..operators.components import connected_components

    pairs = neardup_ngram_jaccard(spark, sf_dir).select("doc_id_1", "doc_id_2")
    comps = connected_components(pairs, "doc_id_1", "doc_id_2")
    sizes = comps.groupBy("comp").agg(F.count("*").cast("long").alias("sz"))
    banded = sizes.select(
        F.when(F.col("sz") == 1, F.lit(0))
        .otherwise((F.floor(F.log(2.0, F.col("sz") - 1)) + 1).cast("long"))
        .alias("band"),
        "sz",
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(F.col("sz") - 1).cast("long").alias("n_removed_keep_one"),
        )
        .select(
            "band",
            "n_clusters",
            "n_docs",
            "n_removed_keep_one",
            F.expr(
                "n_removed_keep_one * 1000000 div greatest(sum(n_removed_keep_one) OVER (), 1)"
            )
            .cast("long")
            .alias("removal_share_ppm"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# B218: near-dup transitivity audit (how clique-like are the clusters?)
# ---------------------------------------------------------------------------
# Keep-first dedup over CC components assumes near-duplication is
# roughly transitive; when it isn't (chained paraphrase drift), a
# component lumps documents that share nothing and the canonical doc
# misrepresents its cluster. The measurable proxy is WEDGE CLOSURE over
# the verified pair set: of all wedges a-b-c (both pairs verified), how
# often is a-c verified too? High closure ⇒ cliques ⇒ keep-first is
# safe; low closure ⇒ chains ⇒ prefer centroid/medoid repair (B158's
# labels report per cluster). Wedge enumeration runs on the PAIR SET
# (LSH-verified output, corpus-independent scale), never on documents.
@register(
    "neardup_transitivity_audit",
    f"""
WITH t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM t
), blocked AS (
  SELECT doc_id, shingles, list_min(shingles) AS block_key FROM sh
), p AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM blocked a JOIN blocked b
    ON a.block_key = b.block_key AND a.doc_id < b.doc_id
  WHERE {H.jaccard_sql_ddb('a.shingles', 'b.shingles')} >= {JACCARD_THRESHOLD}
), sym AS (
  SELECT u, v FROM p UNION ALL SELECT v, u FROM p
), wedges AS (
  SELECT s1.u AS a, s1.v AS b, s2.v AS c
  FROM sym s1 JOIN sym s2 ON s2.u = s1.v AND s1.u < s2.v
), joined AS (
  SELECT w.a, w.c, CASE WHEN p2.u IS NOT NULL THEN 1 ELSE 0 END AS closed
  FROM wedges w LEFT JOIN p p2 ON p2.u = w.a AND p2.v = w.c
)
SELECT CAST(count(*) AS BIGINT) AS n_wedges,
       CAST(sum(closed) AS BIGINT) AS n_closed,
       CAST(sum(closed) * 1000000 // greatest(count(*), 1) AS BIGINT) AS closure_ppm
FROM joined
""",
)
def neardup_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge-closure rate over the verified near-dup pair set (B218) —
    high closure says keep-first-per-component is safe, low closure says
    the clusters are chains needing medoid repair."""
    # the verified pair set (small) feeds both union sides AND the
    # closure probe — checkpoint it so the shingle/verify pipeline runs
    # once, not three times (18 exchanges / 21 scans before; r14 opt)
    p = (
        neardup_ngram_jaccard(spark, sf_dir)
        .select(F.col("doc_id_1").alias("u"), F.col("doc_id_2").alias("v"))
        .localCheckpoint(eager=True)
    )
    sym = p.unionByName(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
    s1, s2 = sym.alias("s1"), sym.alias("s2")
    wedges = s1.join(
        s2, (F.col("s2.u") == F.col("s1.v")) & (F.col("s1.u") < F.col("s2.v"))
    ).select(F.col("s1.u").alias("a"), F.col("s2.v").alias("c"))
    p2 = p.select(F.col("u").alias("a"), F.col("v").alias("c"), F.lit(1).alias("hit"))
    joined = wedges.join(p2, ["a", "c"], "left").select(
        F.coalesce("hit", F.lit(0)).alias("closed")
    )
    return joined.agg(
        F.count("*").cast("long").alias("n_wedges"),
        F.sum("closed").cast("long").alias("n_closed"),
        F.expr("sum(closed) * 1000000 div greatest(count(*), 1)")
        .cast("long")
        .alias("closure_ppm"),
    )


# ---------------------------------------------------------------------------
# B220: cross-source copy-direction matrix (who republishes whom)
# ---------------------------------------------------------------------------
# B94 counts cross-source duplication symmetrically; provenance wants
# DIRECTION: within each exact-dup group the keeper (min doc_id — the
# ingestion-order proxy for "published first") attributes every other
# copy to a (from_source = keeper's, to_source = copy's) edge. The
# asymmetry of this matrix is the republishing-flow signal (a mirror
# source shows all inbound edges, an origin all outbound). One md5
# groupBy carrying (source, doc_id) structs, map-side edge expansion,
# bounded |sources|^2 output.
@register(
    "source_copy_direction",
    """
WITH g AS (
  SELECT md5(text) AS h, doc_id, source FROM documents
), keep AS (
  SELECT h, arg_min(source, doc_id) AS keeper_source, min(doc_id) AS keeper_id
  FROM g GROUP BY h
)
SELECT k.keeper_source AS from_source, g.source AS to_source,
       CAST(count(*) AS BIGINT) AS n_copies
FROM g JOIN keep k ON k.h = g.h
WHERE g.doc_id <> k.keeper_id
GROUP BY k.keeper_source, g.source
ORDER BY from_source, to_source
""",
)
def source_copy_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed duplicate attribution between sources (B220): every
    non-keeper copy becomes a (keeper's source -> copy's source) edge —
    the republishing-flow matrix behind B94's symmetric counts."""
    d = read_table(spark, sf_dir, "documents")
    g = d.select(F.md5("text").alias("h"), "doc_id", "source")
    keep = g.groupBy("h").agg(
        F.min_by("source", "doc_id").alias("keeper_source"),
        F.min("doc_id").alias("keeper_id"),
    )
    return (
        g.join(keep, "h")
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .groupBy(
            F.col("keeper_source").alias("from_source"), F.col("source").alias("to_source")
        )
        .agg(F.count("*").cast("long").alias("n_copies"))
        .orderBy("from_source", "to_source")
    )


# --------------------------------------------------------------------------
# B242: measured LSH band-recall curve (r12) — the empirical twin of the
# B179 analytic planner
# --------------------------------------------------------------------------
# B179 predicts candidate recall from the (b, r) s-curve; this measures
# it ON THE CORPUS: per band budget nb ∈ {1..N_BANDS}, the share of
# verified near-dup pairs (Jaccard ≥ threshold, full-band candidates)
# that the FIRST nb bands already capture, plus the candidate volume
# those bands pay for. One signature pass — each candidate pair is
# tagged with its MINIMAL matching band index (the nprobe-curve
# discipline: nb-band candidates = bmin < nb), so the whole curve costs
# one banded join, not |grid| joins. Reading the two columns together
# answers the production question the planner can only estimate: "can I
# run 2 bands instead of 4 and keep 95% of the dupes at half the
# shuffle?" Scale: identical candidate mechanics to B2 (banded
# equi-join, never all-pairs); the curve adds one bounded aggregate.
def _lsh_curve_oracle() -> str:
    sig_exprs = H.ddb_minhash_sig("hashes")
    sig_cols = ", ".join(f"{e} AS m{j}" for j, e in enumerate(sig_exprs))
    band_keys = [
        " || ':' || ".join(
            f"CAST(m{b * H.ROWS_PER_BAND + r} AS VARCHAR)" for r in range(H.ROWS_PER_BAND)
        )
        for b in range(H.N_BANDS)
    ]
    band_cols = ", ".join(f"{k} AS band{b}" for b, k in enumerate(band_keys))
    cand_union = "\n  UNION ALL\n  ".join(
        f"SELECT a.doc_id AS d1, b.doc_id AS d2, {b} AS band_id"
        f" FROM banded a JOIN banded b"
        f" ON a.doc_id < b.doc_id AND a.band{b} = b.band{b}"
        for b in range(H.N_BANDS)
    )
    grid_vals = ", ".join(f"({nb})" for nb in range(1, H.N_BANDS + 1))
    return f"""
WITH t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.ddb_shingles('toks')} AS shingles FROM t
), hashed AS (
  SELECT doc_id, shingles, {H.ddb_hash_array('shingles')} AS hashes FROM sh
), sig AS (
  SELECT doc_id, shingles, {sig_cols} FROM hashed
), banded AS (
  SELECT doc_id, shingles, {band_cols} FROM sig
), cand AS (
  {cand_union}
), pairs AS (
  SELECT d1, d2, CAST(min(band_id) AS BIGINT) AS bmin FROM cand GROUP BY d1, d2
), verified AS (
  SELECT p.d1, p.d2, p.bmin,
         CASE WHEN {H.jaccard_sql_ddb('a.shingles', 'b.shingles')} >= {JACCARD_THRESHOLD}
              THEN 1 ELSE 0 END AS is_true
  FROM pairs p
  JOIN banded a ON a.doc_id = p.d1
  JOIN banded b ON b.doc_id = p.d2
), grid(nb) AS (VALUES {grid_vals}),
tot AS (SELECT CAST(sum(is_true) AS BIGINT) AS n_true FROM verified)
SELECT CAST(g.nb AS BIGINT) AS n_bands,
       CAST(count(CASE WHEN v.bmin < g.nb THEN 1 END) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN v.bmin < g.nb THEN v.is_true ELSE 0 END) AS BIGINT) AS n_true_found,
       CAST(sum(CASE WHEN v.bmin < g.nb THEN v.is_true ELSE 0 END) * 1000
            // greatest(max(t.n_true), 1) AS BIGINT) AS recall_milli
FROM grid g CROSS JOIN verified v CROSS JOIN tot t
GROUP BY g.nb
ORDER BY n_bands
"""


@register("lsh_band_recall_curve", _lsh_curve_oracle())
def lsh_band_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH recall-vs-bands curve (B242): per band budget, the
    candidate volume and the share of full-configuration verified
    near-dup pairs captured — from ONE min-band-tagged candidate pass."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    sh = toks.select("doc_id", F.expr(H.spark_shingles("toks")).alias("shingles")).cache()
    hashed = sh.withColumn("hashes", F.expr(H.spark_hash_array("shingles")))
    sig = hashed.select(
        "doc_id",
        *[F.expr(e).alias(f"m{j}") for j, e in enumerate(H.spark_minhash_sig("hashes"))],
    )
    band_keys = [
        F.concat_ws(
            ":",
            *[
                F.col(f"m{b * H.ROWS_PER_BAND + r}").cast("string")
                for r in range(H.ROWS_PER_BAND)
            ],
        )
        for b in range(H.N_BANDS)
    ]
    # same Generate-materialization discipline as neardup_minhash_lsh
    pre = sig.select("doc_id", F.array(*band_keys).alias("bk")).cache()
    banded = pre.select("doc_id", F.posexplode("bk").alias("band_id", "band_key"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.band_id").alias("band_id"),
        )
        .groupBy("d1", "d2")
        .agg(F.min("band_id").cast("long").alias("bmin"))
    )
    s1 = sh.select(F.col("doc_id").alias("d1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("d2"), F.col("shingles").alias("sh2"))
    verified = (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "bmin",
            F.when(
                F.expr(H.jaccard_sql_spark("sh1", "sh2")) >= JACCARD_THRESHOLD, 1
            )
            .otherwise(0)
            .alias("is_true"),
        )
        .localCheckpoint(eager=True)
    )
    # the eager checkpoint above is the LAST consumer of the cached shingle
    # and band-key frames — release their storage now, not at session end
    sh.unpersist()
    pre.unpersist()
    grid = spark.createDataFrame([(nb,) for nb in range(1, H.N_BANDS + 1)], "nb long")
    tot = verified.agg(F.sum("is_true").cast("long").alias("n_true"))
    return (
        F.broadcast(grid)
        .crossJoin(verified)
        .crossJoin(F.broadcast(tot))
        .groupBy("nb")
        .agg(
            F.count(F.when(F.col("bmin") < F.col("nb"), 1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("bmin") < F.col("nb"), F.col("is_true")).otherwise(0))
            .cast("long")
            .alias("n_true_found"),
            F.expr(
                "cast(sum(CASE WHEN bmin < nb THEN is_true ELSE 0 END) * 1000"
                " div greatest(max(n_true), 1) as bigint)"
            ).alias("recall_milli"),
        )
        .select(F.col("nb").alias("n_bands"), "n_candidates", "n_true_found", "recall_milli")
        .orderBy("n_bands")
    )


# --------------------------------------------------------------------------
# B246: near-dup span localization — WHERE two near-duplicates overlap
# --------------------------------------------------------------------------
# Every dedup op above says WHICH pairs are near-duplicates; a curator
# deciding keep/trim/split needs WHERE: the longest contiguous shared
# passage. Classic diagonal islands over positional shingles: a match at
# (pos1, pos2) lies on diagonal pos1−pos2, and a run of consecutive
# positions on one diagonal is a verbatim shared token span. The
# gaps-and-islands trick (pos1 − row_number per (pair, diagonal)) turns
# each run into one group — SQL-exact in both engines, no iterative
# alignment. Scale: positional shingles only ever join through a VERIFIED
# pair (the B2-blocked, never-all-pairs set), so the match volume is
# Σ_pairs overlap size; windows are partitioned by (pair, diagonal) —
# nothing touches an unpartitioned corpus-wide window. Tie-break: longest
# run, then smallest start_1, then smallest start_2 — total and
# engine-identical.
def _span_localization_oracle() -> str:
    return f"""
WITH pairs AS (
  SELECT doc_id_1, doc_id_2 FROM ({_REGISTRY['neardup_ngram_jaccard'].oracle})
), t AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), pos AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
         toks[u.i] || ' ' || toks[u.i + 1] || ' ' || toks[u.i + 2] AS sh
  FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)
  WHERE len(toks) >= 3
), m AS (
  SELECT p.doc_id_1, p.doc_id_2, a.pos AS pos1, b.pos AS pos2
  FROM pairs p
  JOIN pos a ON a.doc_id = p.doc_id_1
  JOIN pos b ON b.doc_id = p.doc_id_2 AND b.sh = a.sh
), runs AS (
  SELECT doc_id_1, doc_id_2, pos1, pos2,
         pos1 - row_number() OVER (
           PARTITION BY doc_id_1, doc_id_2, pos1 - pos2 ORDER BY pos1
         ) AS grp,
         pos1 - pos2 AS diag
  FROM m
), agg AS (
  SELECT doc_id_1, doc_id_2, CAST(count(*) AS BIGINT) AS run_len,
         min(pos1) AS s1, min(pos2) AS s2
  FROM runs GROUP BY doc_id_1, doc_id_2, diag, grp
), best AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id_1, doc_id_2 ORDER BY run_len DESC, s1, s2
  ) AS rb
  FROM agg
)
SELECT p.doc_id_1, p.doc_id_2,
       COALESCE(b.run_len, 0) AS run_len_shingles,
       CAST(CASE WHEN b.run_len IS NULL THEN 0 ELSE b.run_len + 2 END AS BIGINT)
         AS run_len_tokens,
       COALESCE(b.s1, -1) AS start_tok_1,
       COALESCE(b.s2, -1) AS start_tok_2
FROM pairs p
LEFT JOIN best b
  ON b.doc_id_1 = p.doc_id_1 AND b.doc_id_2 = p.doc_id_2 AND b.rb = 1
ORDER BY p.doc_id_1, p.doc_id_2
"""


@register("neardup_span_localization", _span_localization_oracle())
def neardup_span_localization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest verbatim shared token span per verified near-dup pair
    (B246): diagonal gaps-and-islands over positional 3-gram shingles —
    the keep/trim/split evidence behind the B2 pair list."""
    d = read_table(spark, sf_dir, "documents")
    pairs = neardup_ngram_jaccard(spark, sf_dir).select("doc_id_1", "doc_id_2")
    return localize_spans(d, pairs)


def localize_spans(d: DataFrame, pairs: DataFrame) -> DataFrame:
    """The B246 core, parameterized by (documents, pair list) so the
    pytest can pin exact localization on hand-built docs with a known
    shared passage."""
    toks = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    pos_sh = (
        toks.filter(F.expr("size(toks) >= 3"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ',"
                    " try_element_at(toks, i), try_element_at(toks, i + 1),"
                    " try_element_at(toks, i + 2)))"
                )
            ).alias("pos", "sh"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "sh")
    )
    m = (
        pairs.join(pos_sh.withColumnRenamed("doc_id", "doc_id_1"), "doc_id_1")
        .withColumnsRenamed({"pos": "pos1"})
        .join(
            pos_sh.select(
                F.col("doc_id").alias("doc_id_2"), F.col("pos").alias("pos2"), "sh"
            ),
            ["doc_id_2", "sh"],
        )
    )
    w_diag = Window.partitionBy("doc_id_1", "doc_id_2", F.col("pos1") - F.col("pos2")).orderBy(
        "pos1"
    )
    runs = m.select(
        "doc_id_1",
        "doc_id_2",
        "pos1",
        "pos2",
        (F.col("pos1") - F.col("pos2")).alias("diag"),
        (F.col("pos1") - F.row_number().over(w_diag)).alias("grp"),
    )
    agg = runs.groupBy("doc_id_1", "doc_id_2", "diag", "grp").agg(
        F.count("*").cast("long").alias("run_len"),
        F.min("pos1").alias("s1"),
        F.min("pos2").alias("s2"),
    )
    w_best = Window.partitionBy("doc_id_1", "doc_id_2").orderBy(
        F.col("run_len").desc(), "s1", "s2"
    )
    best = agg.withColumn("rb", F.row_number().over(w_best)).filter(F.col("rb") == 1)
    return (
        pairs.join(best, ["doc_id_1", "doc_id_2"], "left")
        .select(
            "doc_id_1",
            "doc_id_2",
            F.coalesce("run_len", F.lit(0)).cast("long").alias("run_len_shingles"),
            F.when(F.col("run_len").isNull(), 0)
            .otherwise(F.col("run_len") + 2)
            .cast("long")
            .alias("run_len_tokens"),
            F.coalesce("s1", F.lit(-1)).cast("long").alias("start_tok_1"),
            F.coalesce("s2", F.lit(-1)).cast("long").alias("start_tok_2"),
        )
        .orderBy("doc_id_1", "doc_id_2")
    )


# --------------------------------------------------------------------------
# B311: exact edit-distance near-dup gate over blocked candidate pairs.
#
# The fidelity tier above shingle/MinHash evidence: for candidate pairs that
# share a 40-char prefix block, compute the EXACT character-level
# Levenshtein distance (both engines ship a codepoint-exact builtin) on a
# 200-char cap and gate at ≤150 edits-per-thousand-chars. The cap bounds
# the per-pair DP at 200×200 regardless of document length, and the prefix
# block bounds the pair count — the classic blocked-comparison shape, so
# the work is (pairs in block) × O(1), never corpus².
#
# The distance lands in the output (not just the gate) so the value-hash
# pins the exact DP, and the normalization divides by the LONGER capped
# side (distance ≤ max length ⇒ norm ≤ 1000 always).
# --------------------------------------------------------------------------


@register(
    "doc_edit_distance_gate",
    """
WITH d AS (
  SELECT doc_id, substr(text, 1, 200) AS t200,
         md5(substr(text, 1, 40)) AS blk
  FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         CAST(levenshtein(a.t200, b.t200) AS BIGINT) AS edit_distance,
         CAST(greatest(length(a.t200), length(b.t200)) AS BIGINT) AS cap_len
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b, edit_distance, cap_len,
       CAST(edit_distance * 1000 // cap_len AS BIGINT) AS norm_milli,
       CAST(CASE WHEN edit_distance * 1000 // cap_len <= 150 THEN 1 ELSE 0 END
            AS BIGINT) AS is_dup
FROM pairs
ORDER BY doc_id_a, doc_id_b
""",
)
def doc_edit_distance_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact-Levenshtein near-dup gate (B311): 40-char-prefix
    blocking, 200-char DP cap, distance + per-mille normalization + gate."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 200).alias("t200"),
        F.md5(F.substring("text", 1, 40)).alias("blk"),
    )
    a = d.select(
        F.col("doc_id").alias("doc_id_a"), F.col("t200").alias("ta"), F.col("blk").alias("blk")
    )
    b = d.select(
        F.col("doc_id").alias("doc_id_b"), F.col("t200").alias("tb"), F.col("blk").alias("blk2")
    )
    pairs = a.join(b, (F.col("blk") == F.col("blk2")) & (F.col("doc_id_a") < F.col("doc_id_b"))).select(
        "doc_id_a",
        "doc_id_b",
        F.levenshtein("ta", "tb").cast("long").alias("edit_distance"),
        F.greatest(F.length("ta"), F.length("tb")).cast("long").alias("cap_len"),
    )
    return pairs.select(
        "doc_id_a",
        "doc_id_b",
        "edit_distance",
        "cap_len",
        F.expr("edit_distance * 1000 div cap_len").cast("long").alias("norm_milli"),
        F.expr("case when edit_distance * 1000 div cap_len <= 150 then 1 else 0 end")
        .cast("long")
        .alias("is_dup"),
    ).orderBy("doc_id_a", "doc_id_b")
