"""Scale-path similarity queries (SURVEY.md §2.B B3-B5): IVF-bucketed ANN,
many-query batch top-k, and a SQL-expressible embedding pipeline — each
with a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texthash as H
from ..functions import vector as V
from ..io import read_table
from ..operators.knn import local_topk_per_key
from ..queries import register

_ROUND = 4
N_CENTROIDS = 16
N_PROBE = 4


def _l2sq_ddb(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a})+1),"
        f" i -> power(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE), 2)))"
    )


# --------------------------------------------------------------------------
# IVF ANN: deterministic centroids (first N_CENTROIDS corpus vectors)
# --------------------------------------------------------------------------
_IVF_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cent AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
assigned AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_l2sq_ddb('e.embedding', 'c.cvec')}, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c
),
probe AS (
  SELECT c.cid FROM cent c, q
  ORDER BY {_l2sq_ddb('c.cvec', 'q.qv')}, c.cid
  LIMIT {N_PROBE}
)
SELECT a.vec_id, round({_l2sq_ddb('a.embedding', 'q.qv')}, {_ROUND}) AS distance
FROM assigned a JOIN probe p ON a.cid = p.cid, q
WHERE a.rn = 1
ORDER BY distance, a.vec_id
LIMIT 10
"""


@register("ivf_topk_l2sq", _IVF_ORACLE)
def ivf_topk_l2sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via IVF: assign to nearest of 16 deterministic centroids,
    probe the 4 closest buckets — the partition-pruned scale path whose
    recall the exact knn_topk_l2sq query baselines. Assignment is the
    map-side BLAS argmin (``ivf_assign_gemm``, ~4× the expression form at
    dim 64); ``ivf_assign`` is its bit-exact oracle twin and a pytest pins
    the two to identical assignments (tests/test_plans.py)."""
    from ..operators.ivf import ivf_assign_gemm, ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    assigned = ivf_assign_gemm(emb, centroids)
    return ivf_topk(assigned, centroids, qvec, k=10, n_probe=N_PROBE, round_to=_ROUND)


_IVF_FILTERED_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cent AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
assigned AS (
  SELECT e.vec_id, e.embedding, e.label, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_l2sq_ddb('e.embedding', 'c.cvec')}, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c
),
probe AS (
  SELECT c.cid FROM cent c, q
  ORDER BY {_l2sq_ddb('c.cvec', 'q.qv')}, c.cid
  LIMIT {N_PROBE}
)
SELECT a.vec_id, round({_l2sq_ddb('a.embedding', 'q.qv')}, {_ROUND}) AS distance
FROM assigned a JOIN probe p ON a.cid = p.cid, q
WHERE a.rn = 1 AND a.label = 3
ORDER BY distance, a.vec_id
LIMIT 10
"""


@register("ivf_topk_prefiltered", _IVF_FILTERED_ORACLE)
def ivf_topk_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN over the persisted IVF index — the single most common
    production vector-DB query (the reference's ``where={'doc_type': t}``
    metadata pre-filter, A21, composed with the partition-pruned index
    path instead of the brute-force scan): rank centroids driver-side,
    read only the ``n_probe`` probed cid directories AND only rows passing
    the metadata predicate — the label equality reaches the parquet
    row-group level as a pushed filter INSIDE the pruned partitions
    (PartitionFilters × PushedFilters, plan-tested), so the scan does
    partition pruning and predicate pushdown simultaneously. Exact score,
    TakeOrderedAndProject. Post-filtering (the only option an opaque ANN
    library gives you) would over-fetch and re-filter; expressing the
    index as a TABLE makes the filter free."""
    from ..operators.ivf import build_ivf_index

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    path = _ivf_index_path(sf_dir, "embeddings")
    if path not in _IVF_BUILT:
        build_ivf_index(emb, centroids, path)
        _IVF_BUILT.add(path)
    qvec = F.lit([float(x) for x in _query_vec_emb(spark, sf_dir)])
    probe = [
        r.cid
        for r in centroids.select("cid", V.l2sq(F.col("cvec"), qvec).alias("d"))
        .orderBy(F.col("d").asc(), F.col("cid").asc())
        .limit(N_PROBE)
        .collect()
    ]
    bucket = (
        spark.read.parquet(path)
        .filter(F.col("cid").isin(probe))
        .filter(F.col("label") == 3)
    )
    dist = F.round(V.l2sq(F.col("embedding"), qvec), _ROUND)
    return (
        bucket.select("vec_id", dist.alias("distance"))
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(10)
    )


def _query_vec_emb(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


# Constants the ivf_topk_suggested oracle bakes in: suggest_ivf_params
# returns (4, 2) for any corpus under ~45k rows at IVF_RECALL_SLA=0.6 —
# true for every driver/bench sf (500–2000 rows). The Spark side asserts
# the live suggestion still matches so a scale change fails loudly instead
# of hash-mismatching.
_SUGGESTED_K = 4
_SUGGESTED_PROBE = 2

_IVF_SUGGESTED_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (SELECT CAST(count(*) // {_SUGGESTED_K} AS BIGINT) AS stride FROM embeddings),
cent AS (
  SELECT CAST(vec_id // s.stride AS INT) AS cid, embedding AS cvec
  FROM embeddings, s
  WHERE vec_id % s.stride = 0 AND vec_id // s.stride < {_SUGGESTED_K}
),
assigned AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_l2sq_ddb('e.embedding', 'c.cvec')}, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c
),
probe AS (
  SELECT c.cid FROM cent c, q
  ORDER BY {_l2sq_ddb('c.cvec', 'q.qv')}, c.cid
  LIMIT {_SUGGESTED_PROBE}
)
SELECT a.vec_id, round({_l2sq_ddb('a.embedding', 'q.qv')}, {_ROUND}) AS distance
FROM assigned a JOIN probe p ON a.cid = p.cid, q
WHERE a.rn = 1
ORDER BY distance, a.vec_id
LIMIT 10
"""


@register("ivf_topk_suggested", _IVF_SUGGESTED_ORACLE)
def ivf_topk_suggested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 whose (k, n_probe) come from ``suggest_ivf_params``
    (VERDICT r4 #4+#7): the tuning contract's output drives a HASH-CHECKED
    query, not just the rows-only KMeans form. Centroids are deterministic
    but SPREAD — every (n_rows/k)-th vector by id — so unlike the first-16
    convention the cells are corpus-wide and the probe prunes for real;
    being id-arithmetic, the same centroid set is reproducible in SQL
    (stride = count/k), which first-k proved and KMeans never can. Uses the
    expression-form assignment for bit-parity. The oracle bakes the
    suggestion's (4, 2) — valid for any corpus under ~45k rows at
    SLA 0.6; the guard raises loudly if a future scale drifts the
    suggestion away from the baked constants."""
    from ..operators.ivf import ivf_assign, ivf_topk, suggest_ivf_params

    emb = read_table(spark, sf_dir, "embeddings")
    n_rows = emb.count()
    dim = len(emb.select("embedding").first()[0])
    k, n_probe = suggest_ivf_params(n_rows, dim, IVF_RECALL_SLA)
    if (k, n_probe) != (_SUGGESTED_K, _SUGGESTED_PROBE):
        # explicit raise, not assert: under python -O an assert is stripped
        # and the drift would surface as an opaque oracle hash mismatch
        raise RuntimeError(
            f"suggest_ivf_params({n_rows}, {dim}, {IVF_RECALL_SLA}) -> ({k}, {n_probe}) "
            f"no longer matches the oracle's baked ({_SUGGESTED_K}, {_SUGGESTED_PROBE})"
        )
    stride = n_rows // k
    cents = emb.filter(
        (F.col("vec_id") % stride == 0) & (F.expr(f"vec_id div {stride}") < k)
    ).select(
        F.expr(f"vec_id div {stride}").cast("int").alias("cid"),
        F.col("embedding").alias("cvec"),
    )
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    assigned = ivf_assign(emb, cents)
    return ivf_topk(assigned, cents, qvec, k=10, n_probe=n_probe, round_to=_ROUND)


# --------------------------------------------------------------------------
# IVF over a PERSISTED index: build once per process, probe via partition
# pruning — the on-disk path ivf.build_ivf_index/ivf_topk_indexed implement
# (VERDICT r3 item 7: the prune correctness-checked end to end, not just
# asserted on a plan string)
# --------------------------------------------------------------------------
_IVF_BUILT: set[str] = set()


def _ivf_index_path(sf_dir: str, name: str) -> str:
    """Per-corpus, PER-PROCESS index location: the pid component means a
    concurrently-running driver/bench/test process can never overwrite an
    index another process is mid-read on (plain parquet has no transaction
    log to make that safe), at the cost of a rebuild per process — the
    rebuild is one map-only pass, and the build-once memo (_IVF_BUILT)
    still amortizes it within a process."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), "spark_graft_ivf", f"{name}-{tag}-{os.getpid()}")


@register("ivf_topk_indexed", _IVF_ORACLE)
def ivf_topk_indexed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index form of ``ivf_topk_l2sq`` — identical result
    (same oracle), different physical path: the index is WRITTEN to parquet
    ``PARTITIONED BY (cid)`` once per process (``build_ivf_index``, exact
    expression assignment), and the probe READS BACK only the ``n_probe``
    pruned cid directories (``ivf_topk_indexed``). At 100 TB this is the
    real deployment shape — the build cost is amortized over every query,
    and each query's IO is n_probe/n_centroids of the corpus. The scan's
    PartitionFilters + the read file set are pytest-asserted to touch only
    probed cids."""
    from ..operators.ivf import build_ivf_index, ivf_topk_indexed

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    path = _ivf_index_path(sf_dir, "embeddings")
    if path not in _IVF_BUILT:
        build_ivf_index(emb, centroids, path)
        _IVF_BUILT.add(path)
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    return ivf_topk_indexed(
        spark, path, centroids, qvec, k=10, n_probe=N_PROBE, round_to=_ROUND
    )


# --------------------------------------------------------------------------
# B3: many-query batch top-k (broadcast queries, per-query window rank)
# --------------------------------------------------------------------------
N_QUERIES = 10
TOPK_PER_QUERY = 3


@register(
    "batch_topk_many_queries",
    f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT qs.query_id, e.vec_id,
         round({_l2sq_ddb('e.embedding', 'qs.qv')}, {_ROUND}) AS distance,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY round({_l2sq_ddb('e.embedding', 'qs.qv')}, {_ROUND}), e.vec_id) AS rn
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id != qs.query_id
)
SELECT query_id, vec_id, distance, rn
FROM scored WHERE rn <= {TOPK_PER_QUERY}
ORDER BY query_id, rn
""",
)
def batch_topk_many_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbours for each of 10 query vectors in ONE pass: broadcast
    the query set, score every (row, query) pair map-side, then reduce to a
    per-partition local top-k BEFORE the per-query global rank.

    The r2 form window-ranked the full N×Q scored stream, exchanging every
    scored row into Q partitions — per-query partitions explode at 100 TB.
    Here each input partition keeps only its k best rows per query (a
    pass-through accumulator over already-rounded distances — no float is
    recomputed, so oracle parity is untouched), and the exchange carries
    ≤ partitions·Q·k rows; the final window is over that tiny set. Local
    top-k ⊇ global top-k per query, so results are identical."""
    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), _ROUND).alias("distance"),
        )
    )
    partial = local_topk_per_key(
        scored, key_col="query_id", order_cols=("distance", "vec_id"), k=TOPK_PER_QUERY
    )
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("vec_id").asc())
    return (
        partial.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOPK_PER_QUERY)
        .orderBy("query_id", "rn")
    )


# --------------------------------------------------------------------------
# B5: embedding pipeline with a portable (SQL-expressible) encoder
# --------------------------------------------------------------------------
EMBED_DIM = 8


def _poly_embed_oracle() -> str:
    dims = ", ".join(
        f"round((CAST((h * {a} + {b}) % {H.P} AS DOUBLE) / {H.P}) * 2 - 1, 6) AS dim_{j}"
        for j, (a, b) in enumerate(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]))
    )
    return f"""
WITH h AS (SELECT doc_id, {H.ddb_str_hash_fast('text')} AS h FROM documents)
SELECT doc_id, {dims}
FROM h
ORDER BY doc_id
"""


@register("embed_documents_poly", _poly_embed_oracle())
def embed_documents_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document → fixed-dim embedding as a pure-expression pipeline (the
    oracle-checkable twin of the sha256 pandas_udf embedder in embed.py:
    same plumbing — text in, per-dimension floats out — with portable
    integer arithmetic so DuckDB reproduces every value)."""
    d = read_table(spark, sf_dir, "documents")
    h = d.select("doc_id", F.expr(H.spark_str_hash_fast("text")).alias("h"))
    dims = [
        F.round(
            (((F.col("h") * a + b) % H.P).cast("double") / H.P) * 2 - 1, 6
        ).alias(f"dim_{j}")
        for j, (a, b) in enumerate(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]))
    ]
    return h.select("doc_id", *dims).orderBy("doc_id")


# --------------------------------------------------------------------------
# flagship composite: text query → portable embedding → kNN over embedded
# documents — the reference's whole query path (A9→A12→A18→A19→A29→A30) as
# one oracle-checked pipeline
# --------------------------------------------------------------------------
QUERY_TEXT = "spark join query stream"


def _poly_hash_py(text: str) -> int:
    """Driver-side twin of texthash's fast md5-prefix hash."""
    import hashlib

    return int(hashlib.md5(text.encode("utf-8")).hexdigest()[:8], 16)


def _poly_dims_py(text: str) -> list[float]:
    h = _poly_hash_py(text)
    return [
        (((h * a + b) % H.P) / H.P) * 2 - 1
        for a, b in zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM])
    ]


def _ann_text_oracle() -> str:
    q = _poly_dims_py(QUERY_TEXT)
    terms = " + ".join(
        f"power((CAST((h * {a} + {b}) % {H.P} AS DOUBLE) / {H.P}) * 2 - 1 - ({qj!r}), 2)"
        for (a, b), qj in zip(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]), q)
    )
    return f"""
WITH h AS (SELECT doc_id, {H.ddb_str_hash_fast('text')} AS h FROM documents)
SELECT doc_id, round({terms}, {_ROUND}) AS distance,
       round(1.0 - ({terms}), {_ROUND}) AS similarity
FROM h
ORDER BY distance, doc_id
LIMIT 10
"""


RRF_K = 60  # the standard reciprocal-rank-fusion constant (Cormack et al.)
RRF_DEPTH = 50  # per-side candidate depth (k·5, the reference's over-fetch)


def _hybrid_rrf_oracle() -> str:
    q = _poly_dims_py(QUERY_TEXT)
    terms = " + ".join(
        f"power((CAST((h * {a} + {b}) % {H.P} AS DOUBLE) / {H.P}) * 2 - 1 - ({qj!r}), 2)"
        for (a, b), qj in zip(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]), q)
    )
    kw_terms = " + ".join(
        f"CASE WHEN contains(lower(text), '{w}') THEN 1 ELSE 0 END"
        for w in QUERY_TEXT.split()
    )
    return f"""
WITH kw AS (
  SELECT doc_id, ({kw_terms}) AS kw_score FROM documents
), kwr AS (
  SELECT doc_id, row_number() OVER (ORDER BY kw_score DESC, doc_id) AS kw_rank
  FROM kw ORDER BY kw_score DESC, doc_id LIMIT {RRF_DEPTH}
), h AS (
  SELECT doc_id, {H.ddb_str_hash_fast('text')} AS h FROM documents
), vd AS (
  SELECT doc_id, round({terms}, {_ROUND}) AS distance FROM h
), vr AS (
  SELECT doc_id, row_number() OVER (ORDER BY distance, doc_id) AS vec_rank
  FROM vd ORDER BY distance, doc_id LIMIT {RRF_DEPTH}
)
SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id,
       round(COALESCE(1.0 / ({RRF_K} + k.kw_rank), 0.0)
             + COALESCE(1.0 / ({RRF_K} + v.vec_rank), 0.0), 6) AS rrf_score
FROM kwr k FULL OUTER JOIN vr v ON k.doc_id = v.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT 10
"""


@register("hybrid_rrf_search", _hybrid_rrf_oracle())
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID search — keyword matching fused with vector similarity by
    reciprocal-rank fusion (RRF, the industry-standard fusion in
    Elasticsearch/Vespa/Qdrant hybrid modes): the modern form of the
    reference's keyword-score + similarity re-rank combination (A25-A28 +
    A19). Built the way it scales, not the way it reads in a paper:

    - each side produces its TOP-``RRF_DEPTH`` candidates via
      ``orderBy().limit()`` → TakeOrderedAndProject (per-partition heaps);
      a doc's global rank among the top-R IS its rank within that R-row
      set, so NO global-rank window ever runs over the corpus (a bare
      ``row_number() OVER (ORDER BY ...)`` funnels 100 TB through one
      task — the skew cliff this shape exists to avoid);
    - ranks are assigned by a window over the ≤R-row candidate sets
      (driver-scale), the two lists FULL-OUTER join on doc_id, and a doc
      missing from one list contributes only its present term (standard
      RRF semantics);
    - rrf = Σ 1/(60 + rank), deterministic end-to-end (integer keyword
      scores and 4-dec-rounded distances tie-break by doc_id), so the
      whole fusion is hash-checked against the oracle."""
    d = read_table(spark, sf_dir, "documents")
    kw_score = None
    for w in QUERY_TEXT.split():
        t = F.when(F.lower(F.col("text")).contains(w), 1).otherwise(0)
        kw_score = t if kw_score is None else kw_score + t
    kw_top = (
        d.select("doc_id", kw_score.alias("kw_score"))
        .orderBy(F.col("kw_score").desc(), F.col("doc_id").asc())
        .limit(RRF_DEPTH)
    )
    wk = Window.orderBy(F.col("kw_score").desc(), F.col("doc_id").asc())
    kwr = kw_top.select("doc_id", F.row_number().over(wk).alias("kw_rank"))

    q = _poly_dims_py(QUERY_TEXT)
    h = d.select("doc_id", F.expr(H.spark_str_hash_fast("text")).alias("h"))
    dist = None
    for (a, b), qj in zip(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]), q):
        term = ((((F.col("h") * a + b) % H.P).cast("double") / H.P) * 2 - 1 - qj) ** 2
        dist = term if dist is None else dist + term
    vec_top = (
        h.select("doc_id", F.round(dist, _ROUND).alias("distance"))
        .orderBy(F.col("distance").asc(), F.col("doc_id").asc())
        .limit(RRF_DEPTH)
    )
    wv = Window.orderBy(F.col("distance").asc(), F.col("doc_id").asc())
    vr = vec_top.select("doc_id", F.row_number().over(wv).alias("vec_rank"))

    fused = kwr.join(vr, "doc_id", "full_outer")
    rrf = F.round(
        F.coalesce(1.0 / (RRF_K + F.col("kw_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K + F.col("vec_rank")), F.lit(0.0)),
        6,
    )
    return (
        fused.select("doc_id", rrf.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


@register("ann_text_search", _ann_text_oracle())
def ann_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end text similarity search: embed the corpus (portable
    text→vector pipeline), embed the query driver-side with the identical
    arithmetic (the reference also encodes the query on the driver,
    talent_recommender.py:26), exact top-10 + the reference's 1-distance
    similarity. One narrow map over the scan + TakeOrderedAndProject."""
    d = read_table(spark, sf_dir, "documents")
    h = d.select("doc_id", F.expr(H.spark_str_hash_fast("text")).alias("h"))
    q = _poly_dims_py(QUERY_TEXT)
    dist = None
    for (a, b), qj in zip(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]), q):
        dim = (((F.col("h") * a + b) % H.P).cast("double") / H.P) * 2 - 1
        term = F.pow(dim - qj, F.lit(2))
        dist = term if dist is None else dist + term
    return (
        h.select(
            "doc_id",
            F.round(dist, _ROUND).alias("distance"),
            F.round(F.lit(1.0) - dist, _ROUND).alias("similarity"),
        )
        .orderBy(F.col("distance").asc(), F.col("doc_id").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# chunk-granular retrieval: chunk → embed → top-k (the RAG indexing shape)
# --------------------------------------------------------------------------
def _chunk_ann_oracle() -> str:
    from .pipeline_queries import CHUNK_STRIDE, CHUNK_TOKENS

    q = _poly_dims_py(QUERY_TEXT)
    terms = " + ".join(
        f"power((CAST((h * {a} + {b}) % {H.P} AS DOUBLE) / {H.P}) * 2 - 1 - ({qj!r}), 2)"
        for (a, b), qj in zip(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]), q)
    )
    sl = f"toks[{CHUNK_STRIDE} * CAST(chunk_idx AS INT) + 1 : {CHUNK_STRIDE} * CAST(chunk_idx AS INT) + {CHUNK_TOKENS}]"
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), n AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), c AS (
  SELECT doc_id, toks,
         unnest(range(0, 1 + CAST(ceil(CAST(greatest(n - {CHUNK_TOKENS}, 0) AS DOUBLE) / {CHUNK_STRIDE}) AS BIGINT))) AS chunk_idx
  FROM n
), hashed AS (
  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         {H.ddb_str_hash_fast(f"array_to_string({sl}, ' ')")} AS h
  FROM c
)
SELECT doc_id, chunk_idx, round({terms}, {_ROUND}) AS distance
FROM hashed
ORDER BY distance, doc_id, chunk_idx
LIMIT 10
"""


@register("chunk_ann_search", _chunk_ann_oracle())
def chunk_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granular retrieval end to end — the RAG indexing shape: split
    every document into overlapping fixed-token windows (same rule as
    ``doc_chunk_fixed_tokens``), embed each chunk with the portable
    text→vector pipeline, exact top-10 chunks for the query. One map-only
    explode + narrow projection + TakeOrderedAndProject: no shuffle at any
    corpus size, and the chunk granularity is what makes long-document
    retrieval work (a relevant passage is not diluted by its document).
    The scale path composes the same chunk stream into the IVF index
    build instead of the exact scorer."""
    from .pipeline_queries import CHUNK_STRIDE, CHUNK_TOKENS

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
    ctext = (
        f"concat_ws(' ', slice(toks, cast(chunk_idx as int) * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS}))"
    )
    hashed = c.select(
        "doc_id", "chunk_idx", F.expr(H.spark_str_hash_fast(ctext)).alias("h")
    )
    q = _poly_dims_py(QUERY_TEXT)
    dist = None
    for (a, b), qj in zip(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]), q):
        dim = (((F.col("h") * a + b) % H.P).cast("double") / H.P) * 2 - 1
        term = F.pow(dim - qj, F.lit(2))
        dist = term if dist is None else dist + term
    return (
        hashed.select("doc_id", "chunk_idx", F.round(dist, _ROUND).alias("distance"))
        .orderBy(F.col("distance").asc(), F.col("doc_id").asc(), F.col("chunk_idx").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# IVF with LEARNED centroids (MLlib KMeans) — the production coarse
# quantizer; rows-only because KMeans' float reductions are not
# bit-portable to DuckDB (the deterministic first-k form above is the
# oracle twin of the same plan shape)
# --------------------------------------------------------------------------
_KMEANS_CENTS: dict[str, tuple[int, int, list]] = {}

# The declared retrieval SLA the suggestion is solved against — one knob,
# visible in one place, instead of two baked-in magic constants.
IVF_RECALL_SLA = 0.6


@register("ivf_topk_kmeans", None)
def ivf_topk_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ivf_topk_l2sq`` with centroids LEARNED by seeded MLlib KMeans
    (``fit_centroids``) instead of the deterministic first-16 rows — the
    production coarse quantizer. Training is a bounded number of map-reduce
    passes whose k centers live on the driver (exactly the broadcast table
    the assignment needs) and is cached per corpus per process like every
    other trained-index state. (k, n_probe) are no longer fixed constants:
    they come from ``suggest_ivf_params`` (VERDICT r4 #4) solved for
    ``IVF_RECALL_SLA`` against the measured probe/recall curve, so the
    same call-site self-tunes from the sf0.01 demo corpus to a 100 TB
    index (where K ≈ N/10k and the curve picks the probe budget). Plan
    shape is identical to the oracle twin: map-side GEMM assignment (zero
    Exchange), probe the suggested centroids, exact score,
    TakeOrderedAndProject. Rows-only check by construction; pytests pin
    recall@10 floors and that the suggestion meets the SLA's curve
    prediction on this corpus."""
    from ..operators.ivf import fit_centroids, ivf_assign_gemm, ivf_topk, suggest_ivf_params

    emb = read_table(spark, sf_dir, "embeddings")
    if sf_dir not in _KMEANS_CENTS:
        n_rows = emb.count()
        dim = len(emb.select("embedding").first()[0])
        k, n_probe = suggest_ivf_params(n_rows, dim, IVF_RECALL_SLA)
        _KMEANS_CENTS[sf_dir] = (
            k,
            n_probe,
            [
                (int(r.cid), [float(x) for x in r.cvec])
                for r in fit_centroids(emb, k=k).collect()
            ],
        )
    k, n_probe, rows = _KMEANS_CENTS[sf_dir]
    cents = spark.createDataFrame(rows, "cid int, cvec array<double>")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    assigned = ivf_assign_gemm(emb, cents)
    return ivf_topk(assigned, cents, qvec, k=10, n_probe=n_probe, round_to=_ROUND)


# --------------------------------------------------------------------------
# chunk → embed → IVF: the RAG index AT SCALE (VERDICT r3 item 6) — the
# exact scorer above swapped for a persisted, partition-pruned IVF index
# --------------------------------------------------------------------------
def _poly_list_ddb(hcol: str) -> str:
    """DuckDB list literal of the 8 rounded poly dims derived from ``hcol``
    — the SQL twin of ``_chunk_embed_df``'s array column."""
    dims = ", ".join(
        f"round((CAST(({hcol} * {a} + {b}) % {H.P} AS DOUBLE) / {H.P}) * 2 - 1, 6)"
        for a, b in zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM])
    )
    return f"[{dims}]"


def _chunk_ivf_oracle() -> str:
    from .pipeline_queries import CHUNK_STRIDE, CHUNK_TOKENS

    qpy = [round(x, 6) for x in _poly_dims_py(QUERY_TEXT)]
    qlist = "[" + ", ".join(repr(x) for x in qpy) + "]"
    sl = f"toks[{CHUNK_STRIDE} * CAST(chunk_idx AS INT) + 1 : {CHUNK_STRIDE} * CAST(chunk_idx AS INT) + {CHUNK_TOKENS}]"
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), n AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), c AS (
  SELECT doc_id, toks,
         unnest(range(0, 1 + CAST(ceil(CAST(greatest(n - {CHUNK_TOKENS}, 0) AS DOUBLE) / {CHUNK_STRIDE}) AS BIGINT))) AS chunk_idx
  FROM n
), hashed AS (
  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         {H.ddb_str_hash_fast(f"array_to_string({sl}, ' ')")} AS h
  FROM c
), emb AS (
  SELECT doc_id, chunk_idx, {_poly_list_ddb('h')} AS v FROM hashed
), cent AS (
  SELECT CAST(doc_id AS INT) AS cid, v AS cvec FROM emb
  WHERE chunk_idx = 0 AND doc_id < {N_CENTROIDS}
), q AS (SELECT {qlist} AS qv),
assigned AS (
  SELECT e.doc_id, e.chunk_idx, e.v, ct.cid,
         row_number() OVER (PARTITION BY e.doc_id, e.chunk_idx
                            ORDER BY {_l2sq_ddb('e.v', 'ct.cvec')}, ct.cid) AS rn
  FROM emb e CROSS JOIN cent ct
),
probe AS (
  SELECT ct.cid FROM cent ct, q
  ORDER BY {_l2sq_ddb('ct.cvec', 'q.qv')}, ct.cid
  LIMIT {N_PROBE}
)
SELECT a.doc_id, a.chunk_idx, round({_l2sq_ddb('a.v', 'q.qv')}, {_ROUND}) AS distance
FROM assigned a JOIN probe p ON a.cid = p.cid, q
WHERE a.rn = 1
ORDER BY distance, a.doc_id, a.chunk_idx
LIMIT 10
"""


def _chunk_embed_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, v array<double>) — every document chunked with
    the ``doc_chunk_fixed_tokens`` rule and each chunk embedded with the
    portable poly encoder (dims rounded to 6 like embed_documents_poly, so
    the DuckDB twin reproduces every coordinate). Map-only: split → explode
    → hash → 8 narrow arithmetic columns; no shuffle at any corpus size."""
    from .pipeline_queries import CHUNK_STRIDE, CHUNK_TOKENS

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
    ctext = (
        f"concat_ws(' ', slice(toks, cast(chunk_idx as int) * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS}))"
    )
    hashed = c.select("doc_id", "chunk_idx", F.expr(H.spark_str_hash_fast(ctext)).alias("h"))
    dims = [
        F.round((((F.col("h") * a + b) % H.P).cast("double") / H.P) * 2 - 1, 6)
        for a, b in zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM])
    ]
    return hashed.select("doc_id", "chunk_idx", F.array(*dims).alias("v"))


@register("chunk_embed_ivf_search", _chunk_ivf_oracle())
def chunk_embed_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG index at scale, end to end (VERDICT r3 item 6): chunk every
    document (map-only explode) → embed each chunk (portable encoder) →
    build an IVF index over the chunk vectors PERSISTED partitioned by
    centroid id (once per process) → probe the query against the n_probe
    nearest centroid partitions only. Everything before the write is
    map-only (plan-tested: zero Exchange); the probe read touches only
    n_probe/n_centroids of the index files (pytest asserts the read file
    set). Centroids are the chunk-0 vectors of the first 16 docs —
    deterministic, so the whole composition is hash-checked against the
    DuckDB oracle, not just recall-tested."""
    from ..operators.ivf import build_ivf_index, ivf_topk_indexed

    chunks = _chunk_embed_df(spark, sf_dir)
    cents = chunks.filter((F.col("chunk_idx") == 0) & (F.col("doc_id") < N_CENTROIDS)).select(
        F.col("doc_id").cast("int").alias("cid"), F.col("v").alias("cvec")
    )
    path = _ivf_index_path(sf_dir, "chunks")
    if path not in _IVF_BUILT:
        build_ivf_index(chunks, cents, path, id_col="doc_id", vec_col="v")
        _IVF_BUILT.add(path)
    qvec = [round(x, 6) for x in _poly_dims_py(QUERY_TEXT)]
    qlit = F.lit(qvec)
    probe = [
        r.cid
        for r in cents.select("cid", V.l2sq(F.col("cvec"), qlit).alias("d"))
        .orderBy(F.col("d").asc(), F.col("cid").asc())
        .limit(N_PROBE)
        .collect()
    ]
    bucket = spark.read.parquet(path).filter(F.col("cid").isin(probe))
    dist = F.round(V.l2sq(F.col("v"), qlit), _ROUND)
    return (
        bucket.select("doc_id", "chunk_idx", dist.alias("distance"))
        .orderBy(F.col("distance").asc(), F.col("doc_id").asc(), F.col("chunk_idx").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# multimodal plumbing: binary payload + typed metadata (B8)
# --------------------------------------------------------------------------
@register(
    "multimodal_binary_metadata",
    """
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS payload_bytes,
       md5(text) AS payload_md5,
       lang AS modality_tag
FROM documents
ORDER BY doc_id
""",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column pattern (B8): payload as binary + typed
    metadata columns; the decode/feature UDF plumbing over such columns
    lives in sources/multimodal.py (tested in pytest — real codecs are
    stubbed per environment constraints)."""
    d = read_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return (
        d.select(
            "doc_id",
            F.length(payload).cast("long").alias("payload_bytes"),
            F.md5(F.col("text")).alias("payload_md5"),
            F.col("lang").alias("modality_tag"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# B41: hard-negative mining for contrastive training (r6)
# --------------------------------------------------------------------------
# The embedding-training data op (DPR / SBERT recipes): for each query
# vector, the most-similar candidates that are NOT near-duplicates — the
# "hard negative" band. Near-dups (cosine >= the dedup threshold) would be
# false negatives; easy negatives (random) teach nothing. Same batched
# one-pass shape as batch_topk_many_queries: broadcast the query set,
# score map-side, local top-k per (query) before the per-query rank.
HARDNEG_N_QUERIES = 5
HARDNEG_TOPK = 5
HARDNEG_DUP_COSINE = 0.45  # = dedup_queries.COSINE_THRESHOLD: above -> dup

_COS_DDB = (
    "list_sum(list_transform(range(1, len({a})+1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


@register(
    "mine_hard_negatives",
    f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {HARDNEG_N_QUERIES}
), scored AS (
  SELECT qs.query_id, e.vec_id,
         round({_COS_DDB.format(a='e.embedding', b='qs.qv')}, 4) AS cosine
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id != qs.query_id
), banded AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored WHERE cosine < {HARDNEG_DUP_COSINE}
)
SELECT query_id, vec_id, cosine, rn
FROM banded WHERE rn <= {HARDNEG_TOPK}
ORDER BY query_id, rn
""",
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} hard negatives per query: highest-cosine candidates BELOW
    the near-dup threshold (ties on vec_id after 4-decimal rounding, so
    the mined set is deterministic and the oracle replays it).

    Scale shape: queries broadcast; scoring is map-side; the near-dup
    band filter runs BEFORE the rank so duplicates never occupy top-k
    slots; local top-k per partition bounds the exchange at
    partitions x queries x k rows (the batch_topk discipline). At 100 TB
    with a large query set, the same plan shards the query set and unions
    — still never an unblocked all-pairs."""
    from ..operators.knn import local_topk_per_key

    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < HARDNEG_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.cosine_sim(F.col("embedding"), F.col("qv")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") < HARDNEG_DUP_COSINE)
    )
    partial = local_topk_per_key(
        scored, key_col="query_id", order_cols=("cosine", "vec_id"), k=HARDNEG_TOPK,
        ascending=(False, True),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        partial.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= HARDNEG_TOPK)
        .orderBy("query_id", "rn")
    )
mine_hard_negatives.__doc__ = mine_hard_negatives.__doc__.replace("{k}", str(HARDNEG_TOPK))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B46: PageRank centrality over the kNN similarity graph (r6)
# --------------------------------------------------------------------------
# Graph-centrality data selection: build the directed top-3 similarity
# graph over the embedding corpus, run K power-iteration rounds, keep the
# most central documents (coreset/representative selection). The rank
# arithmetic is INTEGER micro-units end to end — each node starts at 1e6,
# every edge forwards round(0.85·r/outdeg) = (r·170 + 300) div 600 (outdeg
# is fixed at 3), plus a 0.15e6 teleport — so the iteration is exactly
# deterministic, order-independent, and replayable by a DuckDB RECURSIVE
# CTE: a FULL oracle for an iterative graph algorithm. Self-loop sentinel
# edges (weight 0) keep sink-free bookkeeping: every node appears as a
# destination every round, so the recursive step emits one row per node
# per iteration with a single reference to the recursive table.
PAGERANK_ITERS = 8
PAGERANK_DEG = 3
PAGERANK_TOPN = 20


@register(
    "doc_pagerank_centrality",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), edges AS (
  SELECT src, dst, 1 AS w FROM scored WHERE rn <= {PAGERANK_DEG}
  UNION ALL
  SELECT vec_id, vec_id, 0 FROM embeddings
), pr AS (
  SELECT 0 AS iter, vec_id AS node, CAST(1000000 AS BIGINT) AS r FROM embeddings
  UNION ALL
  SELECT p.iter + 1, e.dst,
         CAST(150000 + sum(CASE WHEN e.w = 1 THEN (p.r * 170 + 300) // 600 ELSE 0 END) AS BIGINT)
  FROM pr p JOIN edges e ON e.src = p.node
  WHERE p.iter < {PAGERANK_ITERS}
  GROUP BY p.iter, e.dst
)
SELECT node AS vec_id, r AS rank_micro,
       row_number() OVER (ORDER BY r DESC, node) AS rnk
FROM pr WHERE iter = {PAGERANK_ITERS}
ORDER BY rnk LIMIT {PAGERANK_TOPN}
""",
)
def doc_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} most central embedding rows after {k} integer power
    iterations over the directed top-{d} cosine-similarity graph.

    Scale shape: edge build is the batch_topk discipline (broadcast query
    side, map-side cosine, per-partition local top-k before the per-src
    rank — never an unblocked cartesian product on the Spark side); each
    iteration is one join of the rank frame with the edge list on the
    uniform src key + one groupBy(dst) with map-side partial sums —
    the Kiveris CC round discipline applied to weighted propagation,
    localCheckpointed per round. Integer contributions make every round
    exactly portable: the oracle's recursive CTE replays all {k} rounds
    bit-for-bit."""
    emb = read_table(spark, sf_dir, "embeddings")
    # Edge build + iteration via the shared graph helpers (see the
    # "shared kNN-graph machinery" section below): fold-cosine edge
    # determinism (ADVICE r6) lives in _fold_cosine_block, the bounded
    # driver-closure guard in _graph_fold_state, the memo shares the one
    # O(n²·d) edge build with doc_label_communities /
    # graph_coreset_select. Routing mirrors connected_components /
    # bpe_train: driver integer rounds under 100k nodes, distributed
    # join+groupBy rounds (localCheckpointed) above.
    if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "doc_pagerank_centrality")
        r_map = _pagerank_scores_driver(out_edges, PAGERANK_ITERS)
        top = sorted(((-rv, v) for v, rv in r_map.items()))[:PAGERANK_TOPN]
        return spark.createDataFrame(
            [(v, -nr, i + 1) for i, (nr, v) in enumerate(top)],
            "vec_id long, rank_micro long, rnk long",
        ).orderBy("rnk")
    real = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "doc_pagerank_centrality")
    r = _pagerank_rounds_df(emb, real, PAGERANK_ITERS)
    return (
        r.select(F.col("node").alias("vec_id"), F.col("r").alias("rank_micro"))
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("rank_micro").desc(), F.col("vec_id").asc()))
            .cast("long"),
        )
        .filter(F.col("rnk") <= PAGERANK_TOPN)
        .orderBy("rnk")
    )
doc_pagerank_centrality.__doc__ = doc_pagerank_centrality.__doc__.replace("{n}", str(PAGERANK_TOPN)).replace("{k}", str(PAGERANK_ITERS)).replace("{d}", str(PAGERANK_DEG))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B53: batched multi-query probe over the persisted IVF index (r7)
# --------------------------------------------------------------------------
# The serving-shape composition of B3 (batch top-k) with B19 (persisted
# partition-pruned index): Q queries rank the centroid table once each
# (k rows — driver scalars), their probe sets UNION into one partition
# filter, and the index is read in a SINGLE scan that touches only
# ∪ probed cids; each surviving row fans out in memory to just the
# queries that probed its cell (a broadcast equi-join on cid), is scored
# map-side, locally pre-reduced, then ranked per query. Q queries cost
# one pruned scan + one bounded exchange — not Q scans, not a corpus
# shuffle. At 100 TB this is how an offline batch-inference job (embed a
# request log, retrieve neighbors for training) amortizes index IO.
IVF_BATCH_QUERIES = 8
IVF_BATCH_K = 3


@register(
    "ivf_batch_topk_indexed",
    f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {IVF_BATCH_QUERIES}
),
cent AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
assigned AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_l2sq_ddb('e.embedding', 'c.cvec')}, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c
),
probe AS (
  SELECT qs.query_id, c.cid,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY {_l2sq_ddb('c.cvec', 'qs.qv')}, c.cid) AS prn
  FROM cent c CROSS JOIN qs
),
scored AS (
  SELECT p.query_id, a.vec_id,
         round({_l2sq_ddb('a.embedding', 'qs.qv')}, {_ROUND}) AS distance,
         row_number() OVER (PARTITION BY p.query_id
                            ORDER BY round({_l2sq_ddb('a.embedding', 'qs.qv')}, {_ROUND}), a.vec_id) AS rn
  FROM assigned a
  JOIN (SELECT query_id, cid FROM probe WHERE prn <= {N_PROBE}) p ON a.cid = p.cid
  JOIN qs ON qs.query_id = p.query_id
  WHERE a.rn = 1 AND a.vec_id != p.query_id
)
SELECT query_id, vec_id, distance, rn
FROM scored WHERE rn <= {IVF_BATCH_K}
ORDER BY query_id, rn
""",
)
def ivf_batch_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} ANN neighbours for {q} queries in ONE pruned index scan
    (B53): per-query probe sets come from one tiny queries×centroids
    rank, the scan filter is their union (partition pruning still
    applies — only probed cid directories are read), the per-(row,query)
    fanout is a broadcast join on cid, and the per-query rank consumes a
    local pre-reduce, never the full scored stream."""
    from ..operators.ivf import build_ivf_index
    from ..operators.knn import local_topk_per_key

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    path = _ivf_index_path(sf_dir, "embeddings")
    if path not in _IVF_BUILT:
        build_ivf_index(emb, centroids, path)
        _IVF_BUILT.add(path)
    qs = emb.filter(F.col("vec_id") < IVF_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cd").asc(), F.col("cid").asc())
    probe_pairs = (
        centroids.crossJoin(F.broadcast(qs))
        .select("query_id", "cid", V.l2sq(F.col("cvec"), F.col("qv")).alias("cd"))
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= N_PROBE)
        .select("query_id", "cid")
    )
    pairs = probe_pairs.collect()  # Q·n_probe rows — bounded driver state
    union_cids = sorted({r.cid for r in pairs})
    pair_df = spark.createDataFrame(pairs, "query_id long, cid int")
    bucket = spark.read.parquet(path).filter(F.col("cid").isin(union_cids))
    scored = (
        bucket.join(F.broadcast(pair_df), "cid")
        .join(F.broadcast(qs), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), _ROUND).alias("distance"),
        )
    )
    partial = local_topk_per_key(
        scored, key_col="query_id", order_cols=("distance", "vec_id"), k=IVF_BATCH_K
    )
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("vec_id").asc())
    return (
        partial.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= IVF_BATCH_K)
        .orderBy("query_id", "rn")
    )
ivf_batch_topk_indexed.__doc__ = ivf_batch_topk_indexed.__doc__.replace( "{k}", str(IVF_BATCH_K) ).replace("{q}", str(IVF_BATCH_QUERIES))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B54: label-propagation communities over the kNN graph (r7)
# --------------------------------------------------------------------------
# Community detection for corpus organization / diversity sampling
# (Raghavan et al. PRE'07), made EXACTLY portable the way B46 made
# PageRank portable: synchronous rounds, and the per-node update is an
# integer ARGMAX — each node adopts the most frequent label among its
# (undirected) kNN neighbours, ties to the smallest label; isolated-vote
# bookkeeping via weight-0 self-loops so every node appears as a
# destination every round. The argmax itself is encoded as one integer
# max — enc = cnt·2³² + (2³²−1−lab), max(enc) ⇔ (max cnt, min lab) — so
# each round is join + two groupBys with NO window, and a DuckDB
# recursive CTE replays all rounds bit-for-bit: a full oracle for a
# second iterative graph algorithm. Same CC/BPE/PageRank auto-routing:
# driver rounds under 100k nodes, distributed join+groupBy rounds above.
LP_ITERS = 5
LP_DEG = PAGERANK_DEG
_LP_ENC = 4294967296  # 2^32; labels are vec_ids < 2^32


@register(
    "doc_label_communities",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), dir AS (
  SELECT src, dst FROM scored WHERE rn <= {LP_DEG}
), edges AS (
  SELECT src, dst, 1 AS w FROM (SELECT src, dst FROM dir UNION SELECT dst, src FROM dir)
  UNION ALL
  SELECT vec_id, vec_id, 0 FROM embeddings
), lp AS (
  SELECT 0 AS iter, vec_id AS node, CAST(vec_id AS BIGINT) AS lab FROM embeddings
  UNION ALL
  SELECT iter1, dst, CAST({_LP_ENC - 1} - (max(enc) % {_LP_ENC}) AS BIGINT)
  FROM (
    SELECT p.iter + 1 AS iter1, e.dst, p.lab,
           sum(e.w) * {_LP_ENC} + ({_LP_ENC - 1} - p.lab) AS enc
    FROM lp p JOIN edges e ON e.src = p.node
    WHERE p.iter < {LP_ITERS}
    GROUP BY p.iter + 1, e.dst, p.lab
  ) agg
  GROUP BY iter1, dst
)
SELECT node AS vec_id, lab AS community_id
FROM lp WHERE iter = {LP_ITERS}
ORDER BY vec_id
""",
)
def doc_label_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous min-tie label propagation, {k} rounds, over the
    undirected top-{d} cosine kNN graph (B54). Edge build shares B46's
    fold-cosine determinism contract (sequential left-fold dot,
    dot-then-divide, half-away-from-zero round-4) so the oracle's edge
    set is bit-identical; each round is one join on the uniform src key
    plus two groupBys (label counts, then the integer-encoded argmax) —
    map-side partials on both, no window, no skewed key (a hub's votes
    spread across its label groups)."""
    emb = read_table(spark, sf_dir, "embeddings")
    if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
        ids_all, _, _ = _graph_state_memo(sf_dir, emb, "doc_label_communities")
        out_edges = _out_edges_memo(sf_dir, emb, LP_DEG, "doc_label_communities")
        nbrs: dict[int, set[int]] = {int(v): set() for v in ids_all}
        for src, dsts in out_edges.items():
            for d in dsts:
                nbrs[src].add(d)
                nbrs[d].add(src)
        lab = _lp_labels_driver(nbrs, LP_ITERS)
        return spark.createDataFrame(
            sorted(lab.items()), "vec_id long, community_id long"
        ).orderBy("vec_id")
    dir_e = _graph_dir_edges(sf_dir, emb, LP_DEG, "doc_label_communities")
    labels = _lp_rounds_df(emb, dir_e, LP_ITERS)
    return labels.select(
        F.col("node").alias("vec_id"), F.col("lab").alias("community_id")
    ).orderBy("vec_id")
doc_label_communities.__doc__ = doc_label_communities.__doc__.replace("{k}", str(LP_ITERS)).replace( "{d}", str(LP_DEG) )  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# shared kNN-graph machinery (B46 PageRank / B54 communities / B55 coreset)
# --------------------------------------------------------------------------
# One determinism contract for every graph op: edges come from round-4
# fold-cosine ranks (sequential left-fold dot and norms, dot-then-divide,
# half-away-from-zero rounding — bit-identical to the oracles' list_sum
# SQL), and iterations are pure integer arithmetic. The helpers carry the
# two execution routes the individual queries established: bounded driver
# iteration (the corpus matrix is already the GEMM closure) and
# distributed join+groupBy rounds.


# Edge-source routing thresholds shared by B46/B54/B55: driver-memory
# integer rounds below GRAPH_DRIVER_MAX; exact distributed GEMM (oracle-
# parity fold-cosine edges) up to GRAPH_EXACT_MAX — the corpus matrix is
# the kernel closure, bounded to ~3 GB at the cap; above that the IVF-
# probe ANN candidate source (_knn_edges_ann_df) takes over: no full-
# matrix broadcast anywhere, only a bounded centroid table.
GRAPH_DRIVER_MAX = 100_000
GRAPH_EXACT_MAX = 1_000_000


def _graph_fold_state(emb: DataFrame, op_name: str):
    """Collect (ids, matrix, fold-order norms) for the exact-GEMM edge
    builds. Only the ≤GRAPH_EXACT_MAX routes call this (the router
    _graph_dir_edges switches to the ANN candidate source above it)."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids_all = np.asarray([r.vec_id for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    corpus_sq = np.zeros(len(mat), dtype=np.float64)
    for t in range(mat.shape[1]):
        corpus_sq = corpus_sq + mat[:, t] * mat[:, t]
    return ids_all, mat, np.sqrt(corpus_sq)


def _fold_cosine_block(qm, q_norm, mat, corpus_norm):
    """Round-4 cosine of a row block against the corpus, in the oracle's
    exact IEEE order (see doc_pagerank_centrality's ADVICE-r6 note).
    The per-dim products go through a preallocated buffer and an IN-PLACE
    add — elementwise the identical `acc = acc + q[t]·c[t]` sequence as
    the naive form (np.add(out=acc) performs the same single IEEE add),
    but without allocating an n×m temporary per dimension (measured ~2×
    on the 5000² sf0.1 block)."""
    import numpy as np

    dots = np.zeros((len(qm), mat.shape[0]), dtype=np.float64)
    tmp = np.empty_like(dots)
    for t in range(mat.shape[1]):
        np.multiply(qm[:, t, None], mat[None, :, t], out=tmp)
        np.add(dots, tmp, out=dots)
    x = dots / (corpus_norm[None, :] * q_norm[:, None])
    return np.copysign(np.floor(np.abs(x) * 1e4 + 0.5), x) / 1e4


def _knn_out_edges_driver(ids_all, mat, corpus_norm, deg: int) -> dict:
    """Directed top-deg neighbour lists for every node, driver route."""
    import numpy as np

    sims = _fold_cosine_block(mat, corpus_norm, mat, corpus_norm)
    out = {}
    for i, vid in enumerate(ids_all):
        order = np.lexsort((ids_all, -sims[i]))
        out[int(vid)] = [int(ids_all[j]) for j in order if ids_all[j] != vid][:deg]
    return out


def _knn_edges_df(emb: DataFrame, ids_all, mat, corpus_norm, deg: int) -> DataFrame:
    """Directed top-deg edges as a DataFrame via the blocked Arrow kernel
    (the distributed route — each batch scores against the broadcast
    corpus matrix and emits its own neighbour list inside the kernel)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    def _topd(vec_ids, vecs):
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        q_sq = np.zeros(len(m), dtype=np.float64)
        for t in range(m.shape[1]):
            q_sq = q_sq + m[:, t] * m[:, t]
        sims = _fold_cosine_block(m, np.sqrt(q_sq), mat, corpus_norm)
        out = []
        for i, vid in enumerate(vec_ids.to_numpy()):
            order = np.lexsort((ids_all, -sims[i]))
            out.append([int(ids_all[j]) for j in order if ids_all[j] != vid][:deg])
        return pd.Series(out)

    _topd.__annotations__ = {"vec_ids": pd.Series, "vecs": pd.Series, "return": pd.Series}
    topd = F.pandas_udf(_topd, T.ArrayType(T.LongType()))
    return emb.select("vec_id", topd("vec_id", "embedding").alias("dsts")).select(
        F.col("vec_id").alias("src"), F.explode("dsts").alias("dst")
    )


# IVF-probe ANN edge source (the >GRAPH_EXACT_MAX route): cells probed per
# query node, cells each row is INDEXED under (multi-assignment "spill" —
# a row near a cell boundary appears in its GRAPH_ANN_ASSIGN nearest
# cells, which recovers the boundary neighbours probing alone misses:
# measured edge recall 0.65 → 0.93 → 0.99 on the sf corpora for
# (probe, assign) = (8,1) → (8,3) → (10,4), with untrained seeded-sample
# centroids and no training pass), and the centroid-count bound.
# probe > deg so a node whose true neighbours straddle cell boundaries
# still fills its degree. The graph route runs HOTTER than one-shot
# search (probe 10, assign 4): PageRank/communities/triangles COMPOUND
# edge errors across iterations, so edge recall is held near-exact at a
# ~30% candidate-row cost the shuffle shape absorbs (still rows, never
# pairs).
GRAPH_ANN_PROBE = 10
GRAPH_ANN_ASSIGN = 4
GRAPH_ANN_MAX_CELLS = 16_384


def _knn_edges_ann_df(emb: DataFrame, deg: int, n_corpus: int) -> DataFrame:
    """Directed top-``deg`` cosine edges via IVF-probe candidate
    generation — the edge source for corpora too large to broadcast as a
    matrix (B53's batched-probe discipline with the WHOLE corpus as the
    query set).

    Shape, built for 100 TB: a bounded centroid table (~√N capped at
    {cells}, ≤50 MB at the cap) is the ONLY broadcast state; one
    mapInPandas pass GEMMs each Arrow batch against it and emits every
    row fanned out to its {probe} nearest cells (the first
    GRAPH_ANN_ASSIGN of which also index the row as a cell MEMBER — the
    multi-assignment spill); candidates are then scored cell-locally — a
    cogrouped applyInPandas on the cell key GEMMs each cell's probing
    queries against its member matrix and emits only per-(query, cell)
    top-deg — so the shuffle carries N·probe query rows + N·assign
    member rows, never candidate PAIRS (the pair work stays inside
    BLAS); a (src, dst) pair reachable through several shared cells is
    deduped by one (src, dst) max-agg over the pre-reduced ≤N·probe·deg
    tiny rows before the global per-src rank. No step's memory grows
    with corpus size: cell population ~assign·N/√N rows.

    Approximate by construction (recall floored by the pytest recall
    gate, tunable via GRAPH_ANN_PROBE / GRAPH_ANN_ASSIGN); the exact
    fold-cosine build remains the oracle-parity source below
    GRAPH_EXACT_MAX.
    """
    import math

    import numpy as np
    import pandas as pd

    k_cells = int(max(16, min(GRAPH_ANN_MAX_CELLS, math.isqrt(n_corpus))))
    n_probe = min(GRAPH_ANN_PROBE, k_cells)
    # deterministic bounded centroid set: a SEEDED-HASH top-K (B31's
    # md5-order discipline), not the first-k vec_ids — ingestion order
    # correlates with content in real corpora (crawls arrive by domain),
    # so first-k centroids cluster geometrically and skew cell occupancy
    # at scale; the hash order is a uniform sample yet fully
    # deterministic. Still a top-K (TakeOrdered), never a full sort.
    cent = (
        emb.select("vec_id", "embedding")
        .withColumn(
            "_h",
            F.md5(F.concat_ws(":", F.lit("graph-ann-centroids-v1"), F.col("vec_id").cast("string"))),
        )
        .orderBy("_h", "vec_id")
        .limit(k_cells)
        .collect()
    )
    cmat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in cent])
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cnorm[cnorm == 0] = 1.0
    bc = emb.sparkSession.sparkContext.broadcast((cmat, cnorm))
    elem_t = emb.schema["embedding"].dataType.elementType.simpleString()

    def probe_cells(batches):
        cm, cn = bc.value
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qn = np.sqrt((m * m).sum(axis=1))
            qn[qn == 0] = 1.0
            sims = (m @ cm.T) / (cn[None, :] * qn[:, None])
            # quantize before ranking so the probed cell set can't shift
            # with Arrow batch shape (ulp-level GEMM differences); stable
            # argsort then tie-breaks by cell index
            sims = np.copysign(np.floor(np.abs(sims) * 1e4 + 0.5), sims) / 1e4
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            rep = np.repeat(np.arange(n), n_probe)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[rep],
                    "embedding": pdf["embedding"].to_numpy()[rep],
                    "cell": order.ravel().astype(np.int32),
                    "prn": np.tile(np.arange(n_probe, dtype=np.int32), n),
                }
            )

    probed = emb.select("vec_id", "embedding").mapInPandas(
        probe_cells, f"vec_id long, embedding array<{elem_t}>, cell int, prn int"
    )
    members = probed.filter(F.col("prn") < min(GRAPH_ANN_ASSIGN, n_probe)).select(
        "cell", F.col("vec_id").alias("dst"), F.col("embedding").alias("dvec")
    )
    queries = probed.select("cell", F.col("vec_id").alias("src"), F.col("embedding").alias("svec"))

    def cell_topk(qpdf: pd.DataFrame, mpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(mpdf):
            return pd.DataFrame({"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64"), "sim": pd.Series(dtype="float64")})
        qm = np.stack(qpdf["svec"].to_numpy()).astype(np.float64)
        mm = np.stack(mpdf["dvec"].to_numpy()).astype(np.float64)
        qn = np.sqrt((qm * qm).sum(axis=1))
        qn[qn == 0] = 1.0
        mn = np.sqrt((mm * mm).sum(axis=1))
        mn[mn == 0] = 1.0
        sims = (qm @ mm.T) / (mn[None, :] * qn[:, None])
        # run-determinism (ADVICE r8): the same (src, dst) pair scored in
        # different cells goes through differently-shaped GEMMs and can
        # differ by ulps, and argpartition picks arbitrarily among
        # boundary ties — quantize to 4 decimals (the _fold_cosine_block
        # convention) and rank each row by (sim desc, dst asc) with a
        # full lexsort, so the selected edge set is identical across runs
        # and cells. The row sort is O(m log m) on the cell's member
        # count — dominated by the O(q·m·d) GEMM it follows.
        sims = np.copysign(np.floor(np.abs(sims) * 1e4 + 0.5), sims) / 1e4
        src_ids = qpdf["src"].to_numpy()
        dst_ids = mpdf["dst"].to_numpy()
        sims[src_ids[:, None] == dst_ids[None, :]] = -np.inf  # no self edges
        kk = min(deg, sims.shape[1])
        rows = []
        for i in range(len(src_ids)):
            order = np.lexsort((dst_ids, -sims[i]))[:kk]
            for j in order:
                if np.isfinite(sims[i, j]):
                    rows.append((int(src_ids[i]), int(dst_ids[j]), float(sims[i, j])))
        return pd.DataFrame(rows, columns=["src", "dst", "sim"]) if rows else pd.DataFrame(
            {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64"), "sim": pd.Series(dtype="float64")}
        )

    per_cell = (
        queries.groupby("cell")
        .cogroup(members.groupby("cell"))
        .applyInPandas(cell_topk, "src long, dst long, sim double")
    )
    # pre-reduce keeps deg·assign rows per src: a (src, dst) pair can
    # recur via at most `assign` shared cells, so the distinct top-deg
    # always survives the partial even if duplicates land in one partition
    partial = local_topk_per_key(
        per_cell,
        key_col="src",
        order_cols=("sim", "dst"),
        k=deg * min(GRAPH_ANN_ASSIGN, n_probe),
        ascending=(False, True),
    )
    dedup = partial.groupBy("src", "dst").agg(F.max("sim").alias("sim"))
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(), F.col("dst").asc())
    return (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= deg)
        .select("src", "dst")
    )


def _graph_dir_edges(sf_dir: str, emb: DataFrame, deg: int, op_name: str) -> DataFrame:
    """Distributed-route edge source router for B46/B54/B55: exact
    fold-cosine GEMM (oracle parity, corpus matrix in the kernel closure)
    up to GRAPH_EXACT_MAX rows, IVF-probe ANN candidates above — no
    size ceiling, no full-matrix broadcast."""
    n_corpus = _corpus_count_memo(sf_dir, emb)
    # the edge TABLE is memoized per (sf_dir, deg) via operators.memo: a
    # dozen graph queries (B46/B54/B55/B68/.../B240) share one edge build
    # per process instead of re-running the GEMM each — safe because the
    # edge weights are round-4-quantized by the determinism contract, so
    # the parquet round-trip is bit-exact
    from ..operators.memo import memo_table

    if n_corpus <= GRAPH_EXACT_MAX:
        def _build() -> DataFrame:
            ids_all, mat, corpus_norm = _graph_state_memo(sf_dir, emb, op_name)
            return _knn_edges_df(emb, ids_all, mat, corpus_norm, deg)

        return memo_table(emb.sparkSession, sf_dir, f"graph_edges_d{deg}", _build)
    return memo_table(
        emb.sparkSession,
        sf_dir,
        f"graph_edges_ann_d{deg}",
        lambda: _knn_edges_ann_df(emb, deg, n_corpus),
    )


def _pagerank_scores_driver(out_edges: dict, iters: int) -> dict:
    """Integer micro-unit power iteration over ALL nodes, driver route —
    the exact arithmetic of doc_pagerank_centrality."""
    r_map = {v: 1_000_000 for v in out_edges}
    for _ in range(iters):
        nxt = {v: 150_000 for v in r_map}
        for src, dsts in out_edges.items():
            cb = (r_map[src] * 170 + 300) // 600
            for dd in dsts:
                nxt[dd] += cb
        r_map = nxt
    return r_map


def _lp_labels_driver(nbrs: dict, iters: int) -> dict:
    """Synchronous min-tie label propagation, driver route — the exact
    arithmetic of doc_label_communities."""
    lab = {v: v for v in nbrs}
    for _ in range(iters):
        nxt = {}
        for v, ns in nbrs.items():
            if not ns:
                nxt[v] = lab[v]
                continue
            cnt: dict[int, int] = {}
            for u in ns:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            nxt[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        lab = nxt
    return lab


def _lp_rounds_df(emb: DataFrame, dir_edges: DataFrame, iters: int) -> DataFrame:
    """Distributed label-propagation rounds: symmetrize the directed edge
    frame, add weight-0 self-loops, then per round one join + two
    groupBys (label counts, integer-encoded argmax)."""
    sym = (
        dir_edges.select("src", "dst")
        .unionByName(dir_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .withColumn("w", F.lit(1))
    )
    sentinel = emb.select(
        F.col("vec_id").alias("src"), F.col("vec_id").alias("dst"), F.lit(0).alias("w")
    )
    edges = sym.unionByName(sentinel).localCheckpoint(eager=True)
    labels = emb.select(
        F.col("vec_id").alias("node"), F.col("vec_id").cast("long").alias("lab")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst", "lab")
            .agg(F.sum("w").alias("cnt"))
            .select(
                "dst",
                (F.col("cnt") * _LP_ENC + (F.lit(_LP_ENC - 1) - F.col("lab"))).alias("enc"),
            )
            .groupBy("dst")
            .agg(F.max("enc").alias("me"))
        )
        labels = votes.select(
            F.col("dst").alias("node"),
            (F.lit(_LP_ENC - 1) - (F.col("me") % _LP_ENC)).cast("long").alias("lab"),
        ).localCheckpoint(eager=True)
    return labels


def _pagerank_rounds_df(emb: DataFrame, dir_edges: DataFrame, iters: int) -> DataFrame:
    """Distributed power-iteration rounds returning EVERY node's final
    integer rank (doc_pagerank_centrality's loop, full frame)."""
    real = dir_edges.withColumn("w", F.lit(1))
    sentinel = emb.select(
        F.col("vec_id").alias("src"), F.col("vec_id").alias("dst"), F.lit(0).alias("w")
    )
    edges = real.unionByName(sentinel).localCheckpoint(eager=True)
    r = emb.select(
        F.col("vec_id").alias("node"), F.lit(1000000).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            edges.join(r, edges.src == r.node)
            .select(
                "dst",
                F.when(F.col("w") == 1, F.expr("(r * 170 + 300) div 600"))
                .otherwise(F.lit(0))
                .alias("cb"),
            )
            .groupBy("dst")
            .agg(F.sum("cb").alias("s"))
        )
        r = contrib.select(
            F.col("dst").alias("node"), (F.lit(150000) + F.col("s")).cast("long").alias("r")
        ).localCheckpoint(eager=True)
    return r


# --------------------------------------------------------------------------
# B55: graph coreset selection — most central doc per community (r7)
# --------------------------------------------------------------------------
# The composed representative-selection op (the B22/B40 composition
# discipline on the graph side): communities give COVERAGE (every region
# of the similarity manifold appears), centrality gives SALIENCE (the
# best exemplar inside each region) — together the classic coreset /
# few-shot-example / dedup-canonical pick. Both constituents share ONE
# edge build and both are the integer-deterministic forms, so the whole
# composition has a full oracle: a single DuckDB WITH RECURSIVE replays
# the 8 PageRank rounds AND the 5 label-propagation rounds and joins
# them. Selection per community is the same integer-argmax-as-max
# encoding as the LP rounds (enc = rank·2³² + (2³²−1−id)).
_CORESET_ENC = _LP_ENC


@register(
    "graph_coreset_select",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), dir AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), edges AS (
  SELECT src, dst, 1 AS w FROM dir
  UNION ALL
  SELECT vec_id, vec_id, 0 FROM embeddings
), pr AS (
  SELECT 0 AS iter, vec_id AS node, CAST(1000000 AS BIGINT) AS r FROM embeddings
  UNION ALL
  SELECT p.iter + 1, e.dst,
         CAST(150000 + sum(CASE WHEN e.w = 1 THEN (p.r * 170 + 300) // 600 ELSE 0 END) AS BIGINT)
  FROM pr p JOIN edges e ON e.src = p.node
  WHERE p.iter < {PAGERANK_ITERS}
  GROUP BY p.iter, e.dst
), edges_lp AS (
  SELECT src, dst, 1 AS w FROM (SELECT src, dst FROM dir UNION SELECT dst, src FROM dir)
  UNION ALL
  SELECT vec_id, vec_id, 0 FROM embeddings
), lp AS (
  SELECT 0 AS iter, vec_id AS node, CAST(vec_id AS BIGINT) AS lab FROM embeddings
  UNION ALL
  SELECT iter1, dst, CAST({_LP_ENC - 1} - (max(enc) % {_LP_ENC}) AS BIGINT)
  FROM (
    SELECT p.iter + 1 AS iter1, e.dst, p.lab,
           sum(e.w) * {_LP_ENC} + ({_LP_ENC - 1} - p.lab) AS enc
    FROM lp p JOIN edges_lp e ON e.src = p.node
    WHERE p.iter < {LP_ITERS}
    GROUP BY p.iter + 1, e.dst, p.lab
  ) agg
  GROUP BY iter1, dst
), final AS (
  SELECT l.node, l.lab AS community_id, p.r AS rank_micro
  FROM lp l JOIN pr p ON p.node = l.node AND p.iter = {PAGERANK_ITERS}
  WHERE l.iter = {LP_ITERS}
)
SELECT community_id,
       CAST(count(*) AS BIGINT) AS community_size,
       CAST({_CORESET_ENC - 1} - (max(rank_micro * {_CORESET_ENC} + ({_CORESET_ENC - 1} - node)) % {_CORESET_ENC}) AS BIGINT) AS rep_vec_id,
       CAST(max(rank_micro * {_CORESET_ENC} + ({_CORESET_ENC - 1} - node)) // {_CORESET_ENC} AS BIGINT) AS rep_rank_micro
FROM final
GROUP BY community_id
ORDER BY community_id
""",
)
def graph_coreset_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One representative per similarity community (B55): label
    propagation partitions the kNN graph, PageRank scores salience, the
    per-community pick is max rank (ties min id) — all over ONE shared
    edge build. Driver route under 100k nodes computes the fold-cosine
    matrix once and runs both integer iterations in memory; above, the
    edge frame localCheckpoints once and both distributed round loops
    (join + groupBy, no windows) consume it, the final pick being one
    groupBy(community) integer argmax."""
    emb = read_table(spark, sf_dir, "embeddings")
    if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
        ids_all, _, _ = _graph_state_memo(sf_dir, emb, "graph_coreset_select")
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_coreset_select")
        ranks = _pagerank_scores_driver(out_edges, PAGERANK_ITERS)
        nbrs: dict[int, set[int]] = {int(v): set() for v in ids_all}
        for src, dsts in out_edges.items():
            for d in dsts:
                nbrs[src].add(d)
                nbrs[d].add(src)
        lab = _lp_labels_driver(nbrs, LP_ITERS)
        agg: dict[int, list] = {}
        for v, c in lab.items():
            cur = agg.setdefault(c, [0, None, None])
            cur[0] += 1
            key = (ranks[v], -v)
            if cur[1] is None or key > cur[1]:
                cur[1], cur[2] = key, v
        rows = [
            (c, n, rep, ranks[rep]) for c, (n, _, rep) in sorted(agg.items())
        ]
        return spark.createDataFrame(
            rows, "community_id long, community_size long, rep_vec_id long, rep_rank_micro long"
        ).orderBy("community_id")
    dir_e = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_coreset_select").localCheckpoint(
        eager=True
    )
    ranks = _pagerank_rounds_df(emb, dir_e, PAGERANK_ITERS)
    labels = _lp_rounds_df(emb, dir_e, LP_ITERS)
    final = labels.join(ranks, "node").select(
        "node", F.col("lab").alias("community_id"), F.col("r").alias("rank_micro")
    )
    enc = F.col("rank_micro") * _CORESET_ENC + (F.lit(_CORESET_ENC - 1) - F.col("node"))
    return (
        final.groupBy("community_id")
        .agg(F.count("*").cast("long").alias("community_size"), F.max(enc).alias("e"))
        .select(
            "community_id",
            "community_size",
            (F.lit(_CORESET_ENC - 1) - (F.col("e") % _CORESET_ENC)).cast("long").alias("rep_vec_id"),
            F.expr(f"e div {_CORESET_ENC}").cast("long").alias("rep_rank_micro"),
        )
        .orderBy("community_id")
    )


# Per-process memo for the graph state and the driver-route edge lists:
# the fold-cosine edge build is a pure function of the corpus, and three
# registry queries (PageRank, communities, coreset) share the same graph
# — one O(n²·d) fold instead of three. Keyed by sf_dir (the testdata is
# immutable per process, the same convention as _IVF_BUILT).
_GRAPH_STATE_MEMO: dict = {}
_OUT_EDGES_MEMO: dict = {}
_CORPUS_COUNT_MEMO: dict = {}


def _corpus_count_memo(sf_dir: str, emb: DataFrame) -> int:
    """Corpus row count for edge-source routing (parquet metadata count —
    cheap — memoized per sf_dir like the graph state)."""
    if sf_dir not in _CORPUS_COUNT_MEMO:
        _CORPUS_COUNT_MEMO[sf_dir] = emb.count()
    return _CORPUS_COUNT_MEMO[sf_dir]


def _graph_state_memo(sf_dir: str, emb: DataFrame, op_name: str):
    if sf_dir not in _GRAPH_STATE_MEMO:
        _GRAPH_STATE_MEMO[sf_dir] = _graph_fold_state(emb, op_name)
    return _GRAPH_STATE_MEMO[sf_dir]


def _out_edges_memo(sf_dir: str, emb: DataFrame, deg: int, op_name: str) -> dict:
    key = (sf_dir, deg)
    if key not in _OUT_EDGES_MEMO:
        ids_all, mat, corpus_norm = _graph_state_memo(sf_dir, emb, op_name)
        _OUT_EDGES_MEMO[key] = _knn_out_edges_driver(ids_all, mat, corpus_norm, deg)
    return _OUT_EDGES_MEMO[key]


# --------------------------------------------------------------------------
# B57: frame sampling over multimodal media — hash-checked plumbing (r7)
# --------------------------------------------------------------------------
# Upgrades B8's frame-sample path from pytest-only to ORACLE-CHECKED: the
# media frame is synthesized from documents with typed metadata (modality
# by id, duration only for video), exploded one-row-per-sampled-frame by
# the REAL Arrow mapInPandas operator (sources/multimodal.sample_frames —
# the exact batch shape a GPU video decoder consumes), and each frame
# carries a portable content key sha256(payload ‖ ts_be32) — the same
# frame's content+timestamp identity (text ‖ ':' ‖ ts — a VARCHAR key,
# DuckDB's sha256 is string-only). The explode arithmetic (n_frames =
# duration div stride + 1 for video, 1 otherwise; ts = idx·stride) and
# the key are replayed bit-for-bit by DuckDB. Floats stay out of the
# oracle (the float32 feature vector — the stub decoder's digest of
# payload ‖ ts_be32 — is pytest-pinned instead; engine float32 repr is
# not a portable hash surface).
FRAME_STRIDE_MS = 10_000


@register(
    "multimodal_frame_sample",
    f"""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         CAST(text AS BLOB) AS payload,
         CASE WHEN doc_id % 3 = 2 THEN CAST(n_chars * 40 AS INT) ELSE NULL END AS duration_ms
  FROM documents
), frames AS (
  SELECT media_id, modality, payload,
         CAST(u AS INT) AS frame_idx,
         CAST(u * {FRAME_STRIDE_MS} AS INT) AS frame_ts_ms
  FROM media, unnest(range(0, CASE WHEN modality = 'video' AND coalesce(duration_ms, 0) > 0
                                   THEN duration_ms // {FRAME_STRIDE_MS} + 1 ELSE 1 END)) AS t(u)
)
SELECT media_id, modality, frame_idx, frame_ts_ms,
       sha256(CAST(payload AS VARCHAR) || ':' || CAST(frame_ts_ms AS VARCHAR)) AS frame_key
FROM frames
ORDER BY media_id, frame_idx
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per sampled frame via the real Arrow frame-explode operator
    (B57): media synthesized from documents (image/audio/video by id,
    duration for video only), ``sample_frames`` performs the vectorized
    repeat/cumcount explode inside the kernel, and the portable
    sha256(text ‖ ':' ‖ ts) identity key is a JVM expression over the
    joined payload — plumbing exercised for real, result hash-checked."""
    from ..sources.multimodal import sample_frames

    d = read_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("app/octet").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 2, (F.col("n_chars") * 40).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("duration_ms"),
    )
    frames = sample_frames(media, stride_ms=FRAME_STRIDE_MS, fake_decode=True)
    key = F.sha2(
        F.concat(
            F.col("payload").cast("string"),
            F.lit(":"),
            F.col("frame_ts_ms").cast("string"),
        ),
        256,
    )
    return (
        frames.join(media.select("media_id", "modality", "payload"), "media_id")
        .select(
            "media_id",
            "modality",
            "frame_idx",
            "frame_ts_ms",
            key.alias("frame_key"),
        )
        .orderBy("media_id", "frame_idx")
    )


# --------------------------------------------------------------------------
# B68: triangle count + local clustering coefficient over the kNN graph (r8)
# --------------------------------------------------------------------------
# The third (non-iterative) member of the graph-analytics family: how
# CLIQUISH is each document's neighborhood? Nodes whose neighbors are
# also mutual neighbors sit inside tight semantic clusters (redundant —
# dedup/coreset candidates); high-degree nodes with coefficient ~0 are
# hubs bridging topics (high-value diverse picks). Graph = the shared
# undirected top-3 round-4 fold-cosine build (same memo as B46/B54/B55,
# so the edge set is bit-identical to their oracles'). Mechanism =
# node-iterator triangle join: und(a,b) ⋈ und(b,c) ⋈ und(a,c) with
# a<b<c by canonical-pair construction, so each triangle materializes
# exactly once and each corner is counted via one union+groupBy. Scale
# shape: a top-k graph has bounded degree ≤ 2k, so the per-node join
# fanout is ≤ (2k)² — skew-free by construction — and every join/agg
# key is a uniform vec_id; no N² product anywhere. Coefficient =
# 2·tri/(deg·(deg−1)) in ppm via the floor(x+0.5) IEEE contract (B67).
TRI_DEG = 3
TRI_TOPN = 50


@register(
    "graph_triangle_coefficient",
    f"""
WITH scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), dir AS (
  SELECT src, dst FROM scored WHERE rn <= {TRI_DEG}
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dir
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
  GROUP BY node
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), corner AS (
  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
), tcnt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corner GROUP BY node
)
SELECT d.node AS vec_id, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
       CASE WHEN d.deg >= 2
            THEN CAST(floor(COALESCE(t.n_tri, 0) * 2000000.0 / (d.deg * (d.deg - 1)) + 0.5) AS BIGINT)
            ELSE 0 END AS coeff_ppm
FROM deg d LEFT JOIN tcnt t ON t.node = d.node
ORDER BY n_tri DESC, vec_id
LIMIT {TRI_TOPN}
""",
)
def graph_triangle_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} nodes by triangle count with degree and local clustering
    coefficient (B68) over the shared undirected top-{d} cosine graph:
    node-iterator triangle join on canonical pairs (each triangle once),
    ppm coefficient under the floor(x+0.5) IEEE contract."""
    emb = read_table(spark, sf_dir, "embeddings")
    if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
        import math

        out_edges = _out_edges_memo(sf_dir, emb, TRI_DEG, "graph_triangle_coefficient")
        und: set[tuple[int, int]] = set()
        for s, ds in out_edges.items():
            for d in ds:
                und.add((min(s, d), max(s, d)))
        adj: dict[int, set[int]] = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tri = {v: 0 for v in adj}
        for a, b in und:
            for c in adj[a] & adj[b]:
                tri[c] += 1
        rows = []
        for v in adj:
            dg = len(adj[v])
            nt = tri[v]
            coeff = int(math.floor(nt * 2000000.0 / (dg * (dg - 1)) + 0.5)) if dg >= 2 else 0
            rows.append((v, dg, nt, coeff))
        rows.sort(key=lambda r: (-r[2], r[0]))
        return spark.createDataFrame(
            rows[:TRI_TOPN], "vec_id long, deg long, n_tri long, coeff_ppm long"
        ).orderBy(F.col("n_tri").desc(), "vec_id")
    dir_e = _graph_dir_edges(sf_dir, emb, TRI_DEG, "graph_triangle_coefficient")
    und_df = (
        dir_e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ).distinct()
    ).localCheckpoint()
    deg = (
        und_df.select(F.col("a").alias("node"))
        .unionAll(und_df.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    e1 = und_df.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und_df.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und_df.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    corner = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    tcnt = corner.groupBy("node").agg(F.count("*").cast("long").alias("n_tri"))
    return (
        deg.join(tcnt, "node", "left")
        .select(
            F.col("node").alias("vec_id"),
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("deg") >= 2,
                F.floor(
                    F.coalesce(F.col("n_tri"), F.lit(0))
                    * 2000000.0
                    / (F.col("deg") * (F.col("deg") - 1))
                    + 0.5
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("coeff_ppm"),
        )
        .orderBy(F.col("n_tri").desc(), "vec_id")
        .limit(TRI_TOPN)
    )
graph_triangle_coefficient.__doc__ = graph_triangle_coefficient.__doc__.replace( "{n}", str(TRI_TOPN) ).replace("{d}", str(TRI_DEG))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B77: HITS hubs & authorities over the kNN graph (r9)
# --------------------------------------------------------------------------
# The second classic eigenvector centrality next to PageRank (Kleinberg
# JACM'99): hubs point AT authorities, authorities are pointed TO — on a
# kNN similarity graph, high-authority documents are the ones many other
# documents consider a near neighbour (cluster cores), high-hub rows sit
# near many cores (bridges). The iteration is integer micro-units end to
# end: a := A^T h, h := A a, each half-step renormalized by
# x * 1e6 div max(x) (integer div, max clamped >= 1) — deterministic,
# order-independent, replayable by the oracle's recursive CTE (nested
# CTEs give the two half-steps inside one recursive term). Shares the
# ONE memoized top-3 edge build with PageRank / LP / coreset /
# triangles; above the driver tier each round is two edge joins + two
# uniform groupBys + a 1-row max broadcast, localCheckpointed — the
# _pagerank_rounds_df discipline exactly.
HITS_ITERS = 5
HITS_TOPN = 20


def _hits_scores_driver(out_edges: dict, iters: int) -> tuple[dict, dict]:
    """Integer HITS half-steps over ALL nodes, driver route."""
    h = {v: 1_000_000 for v in out_edges}
    a = dict(h)
    for _ in range(iters):
        a_raw = {v: 0 for v in h}
        for u, dsts in out_edges.items():
            for v in dsts:
                a_raw[v] += h[u]
        ma = max(max(a_raw.values()), 1)
        a = {v: x * 1_000_000 // ma for v, x in a_raw.items()}
        h_raw = {v: sum(a[w] for w in out_edges[v]) for v in h}
        mh = max(max(h_raw.values()), 1)
        h = {v: x * 1_000_000 // mh for v, x in h_raw.items()}
    return h, a


def _hits_rounds_df(emb: DataFrame, dir_edges: DataFrame, iters: int) -> DataFrame:
    """Distributed HITS rounds returning every node's final (h, a)."""
    edges = dir_edges.localCheckpoint(eager=True)
    nodes = emb.select(F.col("vec_id").alias("node")).localCheckpoint(eager=True)
    h = nodes.select("node", F.lit(1_000_000).cast("long").alias("h")).localCheckpoint(
        eager=True
    )
    a = None
    for _ in range(iters):
        raw_a = (
            edges.join(h, edges.src == h.node)
            .groupBy("dst")
            .agg(F.sum("h").alias("x"))
        )
        a_full = (
            nodes.join(raw_a, nodes.node == raw_a.dst, "left")
            .select("node", F.coalesce("x", F.lit(0)).cast("long").alias("x"))
        )
        ma = a_full.agg(F.greatest(F.max("x"), F.lit(1).cast("long")).alias("m"))
        a = (
            a_full.crossJoin(F.broadcast(ma))
            .select("node", F.expr("x * 1000000 div m").cast("long").alias("a"))
            .localCheckpoint(eager=True)
        )
        raw_h = (
            edges.join(a, edges.dst == a.node)
            .groupBy("src")
            .agg(F.sum("a").alias("x"))
        )
        h_full = (
            nodes.join(raw_h, nodes.node == raw_h.src, "left")
            .select("node", F.coalesce("x", F.lit(0)).cast("long").alias("x"))
        )
        mh = h_full.agg(F.greatest(F.max("x"), F.lit(1).cast("long")).alias("m"))
        h = (
            h_full.crossJoin(F.broadcast(mh))
            .select("node", F.expr("x * 1000000 div m").cast("long").alias("h"))
            .localCheckpoint(eager=True)
        )
    return h.join(a, "node")


@register(
    "graph_hits_scores",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), edges AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), hits AS (
  SELECT 0 AS iter, vec_id AS node, CAST(1000000 AS BIGINT) AS h, CAST(1000000 AS BIGINT) AS a
  FROM embeddings
  UNION ALL
  (WITH prev AS (SELECT * FROM hits WHERE iter < {HITS_ITERS}),
   a_raw AS (
     SELECT p.iter + 1 AS iter, p.node, CAST(coalesce(s.x, 0) AS BIGINT) AS x
     FROM prev p LEFT JOIN (
       SELECT e.dst AS node, sum(p2.h) AS x
       FROM prev p2 JOIN edges e ON e.src = p2.node
       GROUP BY e.dst
     ) s ON s.node = p.node
   ),
   a_norm AS (
     SELECT iter, node,
            CAST(x * 1000000 // greatest(max(x) OVER (), 1) AS BIGINT) AS a
     FROM a_raw
   ),
   h_raw AS (
     SELECT q.iter, q.node, CAST(coalesce(s2.x, 0) AS BIGINT) AS x
     FROM a_norm q LEFT JOIN (
       SELECT e.src AS node, sum(an2.a) AS x
       FROM a_norm an2 JOIN edges e ON e.dst = an2.node
       GROUP BY e.src
     ) s2 ON s2.node = q.node
   ),
   h_norm AS (
     SELECT iter, node,
            CAST(x * 1000000 // greatest(max(x) OVER (), 1) AS BIGINT) AS h
     FROM h_raw
   )
   SELECT hn.iter, hn.node, hn.h, an.a
   FROM h_norm hn JOIN a_norm an ON an.node = hn.node AND an.iter = hn.iter)
)
SELECT node AS vec_id, a AS auth_micro, h AS hub_micro,
       row_number() OVER (ORDER BY a DESC, node) AS rnk
FROM hits WHERE iter = {HITS_ITERS}
ORDER BY rnk LIMIT {HITS_TOPN}
""",
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} authorities (with hub scores) after {k} integer HITS
    half-step pairs over the directed top-{d} cosine graph (B77) —
    max-normalized micro-unit arithmetic, full recursive-CTE oracle."""
    emb = read_table(spark, sf_dir, "embeddings")
    if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_hits_scores")
        h, a = _hits_scores_driver(out_edges, HITS_ITERS)
        top = sorted(((-av, v) for v, av in a.items()))[:HITS_TOPN]
        return spark.createDataFrame(
            [(v, -na, h[v], i + 1) for i, (na, v) in enumerate(top)],
            "vec_id long, auth_micro long, hub_micro long, rnk long",
        ).orderBy("rnk")
    dir_edges = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_hits_scores")
    ha = _hits_rounds_df(emb, dir_edges, HITS_ITERS)
    return (
        ha.select(
            F.col("node").alias("vec_id"),
            F.col("a").alias("auth_micro"),
            F.col("h").alias("hub_micro"),
        )
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("auth_micro").desc(), F.col("vec_id").asc()))
            .cast("long"),
        )
        .filter(F.col("rnk") <= HITS_TOPN)
        .orderBy("rnk")
    )
graph_hits_scores.__doc__ = graph_hits_scores.__doc__.replace("{n}", str(HITS_TOPN)).replace("{k}", str(HITS_ITERS)).replace("{d}", str(PAGERANK_DEG))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B78: k-core decomposition of the kNN graph (r9)
# --------------------------------------------------------------------------
# Density-based selection: the K-core is the maximal subgraph where every
# node keeps >= K neighbours INSIDE the subgraph — peeling low-degree
# nodes iteratively strips manifold outliers and leaves the dense
# regions (the standard coreset/anomaly complement to centrality).
# Undirected edges = the MUTUAL-kNN graph (u-v kept only when u picks v
# AND v picks u — the reciprocal filter standard in density clustering;
# the one-directional top-k graph has min degree pinned at k, which
# makes every k-core trivial: K<=3 keeps all, K>=4 cascades to empty,
# while the mutual graph's degrees vary 0..k and K=2 keeps the dense
# ~58% of this corpus). The peel
# runs a FIXED {r} rounds on both engines (idempotent once converged, so
# fixed-round replay is exact whether or not the peel has stabilized —
# no convergence flag has to cross engines). Scale shape: each round is
# two semi-joins of the edge frame against the survivor frame (uniform
# keys, survivors only shrink) + one uniform groupBy; at 100 TB the
# round count stays the fixed constant and each round's volume is
# bounded by the remaining edge count — no step holds the graph in one
# task.
KCORE_K = 2
KCORE_ROUNDS = 12


def _kcore_driver(out_edges: dict, k: int, rounds: int) -> dict:
    """Fixed-round peel, driver route: survivor -> in-core degree."""
    und: dict = {v: set() for v in out_edges}
    for u, dsts in out_edges.items():
        for v in dsts:
            if u in out_edges.get(v, ()):  # mutual-kNN: reciprocal only
                und[u].add(v)
                und.setdefault(v, set()).add(u)
    alive = set(und)
    for _ in range(rounds):
        alive = {v for v in alive if len(und[v] & alive) >= k}
    return {v: len(und[v] & alive) for v in alive}


def _kcore_rounds_df(emb: DataFrame, dir_edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Distributed fixed-round peel returning (node, core_deg)."""
    fwd = dir_edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev = dir_edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    # mutual-kNN: keep a-b only when both directions exist (semi-join on
    # the uniform pair key); result is symmetric by construction
    und = fwd.join(rev, ["a", "b"], "left_semi").localCheckpoint(eager=True)
    alive = emb.select(F.col("vec_id").alias("node")).localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = (
            und.join(alive.withColumnRenamed("node", "a"), "a")
            .join(alive.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.count("*").alias("d"))
        )
        alive = (
            deg.filter(F.col("d") >= k).select(F.col("a").alias("node")).localCheckpoint(eager=True)
        )
    return (
        und.join(alive.withColumnRenamed("node", "a"), "a")
        .join(alive.withColumnRenamed("node", "b"), "b")
        .groupBy("a")
        .agg(F.count("*").cast("long").alias("core_deg"))
        .select(F.col("a").alias("vec_id"), "core_deg")
    )


@register(
    "graph_kcore_members",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), de AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), ue AS (
  SELECT d1.src AS a, d1.dst AS b
  FROM de d1 JOIN de d2 ON d2.src = d1.dst AND d2.dst = d1.src
), core AS (
  SELECT 0 AS r, vec_id AS node FROM embeddings
  UNION ALL
  (WITH prev AS (SELECT * FROM core WHERE r < {KCORE_ROUNDS}),
   deg AS (
     SELECT p.r, e.a AS node, count(*) AS d
     FROM ue e
     JOIN prev p ON p.node = e.a
     JOIN prev p2 ON p2.node = e.b AND p2.r = p.r
     GROUP BY p.r, e.a
   )
   SELECT r + 1, node FROM deg WHERE d >= {KCORE_K})
), surv AS (
  SELECT node FROM core WHERE r = {KCORE_ROUNDS}
)
SELECT s.node AS vec_id, CAST(count(*) AS BIGINT) AS core_deg
FROM surv s JOIN ue e ON e.a = s.node JOIN surv s2 ON s2.node = e.b
GROUP BY s.node
ORDER BY vec_id
""",
)
def graph_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Members of the {k}-core of the MUTUAL-kNN graph (reciprocal top-3
    edges) with their in-core degree (B78) — fixed {r}-round peel, full
    recursive-CTE oracle."""
    emb = read_table(spark, sf_dir, "embeddings")
    if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_kcore_members")
        core = _kcore_driver(out_edges, KCORE_K, KCORE_ROUNDS)
        return spark.createDataFrame(
            sorted(core.items()), "vec_id long, core_deg long"
        ).orderBy("vec_id")
    dir_edges = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_kcore_members")
    return _kcore_rounds_df(emb, dir_edges, KCORE_K, KCORE_ROUNDS).orderBy("vec_id")
graph_kcore_members.__doc__ = graph_kcore_members.__doc__.replace("{k}", str(KCORE_K)).replace("{r}", str(KCORE_ROUNDS))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B82: pivot-sampled harmonic closeness centrality (r9, below-fold for r10)
# --------------------------------------------------------------------------
# The third centrality family member (after eigenvector PageRank/HITS):
# how CLOSE a node sits to the rest of the graph. Exact closeness needs
# all-pairs shortest paths (O(N·E) — off the table at corpus scale);
# the standard estimator samples pivots and sums over them only
# (Eppstein-Wang). Pivots are a seeded-md5 top-K (the B31/B76
# discipline — deterministic, distribution-fair); distances come from a
# fixed {r}-round multi-source BFS over the symmetrized top-3 graph
# (fixed rounds on both engines — the k-core lesson — so truncation at
# radius {r} is part of the contract, not drift); the score is HARMONIC
# (sum of 1e6 div d, integer) so unreachable/truncated pairs contribute
# 0 instead of poisoning a mean. Scale shape: BFS frontier rounds are
# frontier⋈edges joins on uniform keys with min-dist dedup per round,
# localCheckpointed; state is (pivot, node, dist) — bounded by
# |pivots|·N, and |pivots| is a constant.
CLOSENESS_PIVOTS = 4
CLOSENESS_ROUNDS = 8
CLOSENESS_TOPN = 20


def _closeness_driver(out_edges: dict, pivots: list, rounds: int) -> dict:
    """Multi-source truncated BFS + harmonic sum, driver route."""
    und: dict = {v: set() for v in out_edges}
    for u, dsts in out_edges.items():
        for v in dsts:
            und[u].add(v)
            und.setdefault(v, set()).add(u)
    score = {v: 0 for v in und}
    for p in pivots:
        dist = {p: 0}
        frontier = {p}
        for d in range(1, rounds + 1):
            nxt = set()
            for u in frontier:
                for v in und[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.add(v)
            frontier = nxt
            if not frontier:
                break
        for v, d in dist.items():
            if d > 0:
                score[v] += 1_000_000 // d
    return score


def _closeness_rounds_df(emb: DataFrame, dir_edges: DataFrame, pivots: list, rounds: int) -> DataFrame:
    """Distributed truncated multi-source BFS returning (node, harmonic)."""
    fwd = dir_edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev = dir_edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    und = fwd.unionByName(rev).distinct().localCheckpoint(eager=True)
    spark = emb.sparkSession
    dist = spark.createDataFrame(
        [(int(p), int(p), 0) for p in pivots], "pivot long, node long, d int"
    ).localCheckpoint(eager=True)
    frontier = dist
    for d in range(1, rounds + 1):
        cand = (
            frontier.join(und, frontier.node == und.a)
            .select("pivot", F.col("b").alias("node"), F.lit(d).alias("d"))
            .distinct()
        )
        frontier = cand.join(dist, ["pivot", "node"], "left_anti").localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        dist = dist.unionByName(frontier).localCheckpoint(eager=True)
    scored = (
        dist.filter(F.col("d") > 0)
        .groupBy("node")
        .agg(F.sum(F.expr("1000000 div d")).cast("long").alias("harmonic_micro"))
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    return nodes.join(scored, "node", "left").select(
        "node", F.coalesce("harmonic_micro", F.lit(0)).cast("long").alias("harmonic_micro")
    )


@register(
    "graph_closeness_pivots",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), de AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), ue AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM de UNION ALL SELECT dst, src FROM de
  )
), pivots AS (
  SELECT vec_id AS p FROM embeddings
  ORDER BY md5('closeness-pivots-v1:' || CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {CLOSENESS_PIVOTS}
), bfs AS (
  SELECT p AS pv, p AS node, 0 AS d FROM pivots
  UNION
  SELECT b.pv, e.b AS node, b.d + 1 AS d
  FROM bfs b JOIN ue e ON e.a = b.node
  WHERE b.d < {CLOSENESS_ROUNDS}
), dist AS (
  SELECT pv, node, min(d) AS d FROM bfs GROUP BY pv, node
), harm AS (
  SELECT n.vec_id,
         CAST(coalesce(sum(CASE WHEN dd.d > 0 THEN 1000000 // dd.d END), 0) AS BIGINT) AS harmonic_micro
  FROM embeddings n LEFT JOIN dist dd ON dd.node = n.vec_id
  GROUP BY n.vec_id
)
SELECT vec_id, harmonic_micro,
       row_number() OVER (ORDER BY harmonic_micro DESC, vec_id) AS rnk
FROM harm ORDER BY rnk LIMIT {CLOSENESS_TOPN}
""",
)
def graph_closeness_pivots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} nodes by pivot-sampled harmonic closeness over the
    symmetrized kNN graph (B82): {p} seeded pivots, {r}-round truncated
    BFS, integer 1e6 div d harmonic sums."""
    import hashlib

    emb = read_table(spark, sf_dir, "embeddings")
    if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_closeness_pivots")
        pivots = sorted(
            out_edges,
            key=lambda v: (hashlib.md5(f"closeness-pivots-v1:{v}".encode()).hexdigest(), v),
        )[:CLOSENESS_PIVOTS]
        score = _closeness_driver(out_edges, pivots, CLOSENESS_ROUNDS)
        top = sorted(((-sc, v) for v, sc in score.items()))[:CLOSENESS_TOPN]
        return spark.createDataFrame(
            [(v, -ns, i + 1) for i, (ns, v) in enumerate(top)],
            "vec_id long, harmonic_micro long, rnk long",
        ).orderBy("rnk")
    dir_edges = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_closeness_pivots")
    pivots = [
        r.vec_id
        for r in emb.select("vec_id")
        .withColumn(
            "_h",
            F.md5(F.concat_ws(":", F.lit("closeness-pivots-v1"), F.col("vec_id").cast("string"))),
        )
        .orderBy("_h", "vec_id")
        .limit(CLOSENESS_PIVOTS)
        .collect()
    ]
    harm = _closeness_rounds_df(emb, dir_edges, pivots, CLOSENESS_ROUNDS)
    return (
        harm.select(F.col("node").alias("vec_id"), "harmonic_micro")
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("harmonic_micro").desc(), F.col("vec_id").asc()))
            .cast("long"),
        )
        .filter(F.col("rnk") <= CLOSENESS_TOPN)
        .orderBy("rnk")
    )
graph_closeness_pivots.__doc__ = graph_closeness_pivots.__doc__.replace("{n}", str(CLOSENESS_TOPN)).replace("{p}", str(CLOSENESS_PIVOTS)).replace("{r}", str(CLOSENESS_ROUNDS))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B83: degree-distribution profile of the kNN graph (r9, below-fold for r10)
# --------------------------------------------------------------------------
# The graph-health audit the other graph ops assume: the in-degree
# distribution of the directed top-k graph (out-degree is pinned at k by
# construction; IN-degree is the free quantity — a heavy tail means hub
# rows that will skew any dst-keyed shuffle, the graph-side analogue of
# B72's key-skew audit). Emits one row per observed in-degree with node
# count plus each degree's share in ppm. Zero-in-degree nodes (nobody's
# neighbour — isolation candidates) are counted via the left join.
@register(
    "graph_indegree_profile",
    f"""
WITH scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), de AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), ind AS (
  SELECT n.vec_id, CAST(coalesce(cnt.c, 0) AS BIGINT) AS indeg
  FROM embeddings n LEFT JOIN (
    SELECT dst, count(*) AS c FROM de GROUP BY dst
  ) cnt ON cnt.dst = n.vec_id
), tot AS (SELECT count(*) AS n FROM ind)
SELECT i.indeg, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(count(*) * 1000000 // t.n AS BIGINT) AS share_ppm
FROM ind i CROSS JOIN tot t
GROUP BY i.indeg, t.n
ORDER BY i.indeg
""",
)
def graph_indegree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree histogram of the directed top-3 kNN graph (B83) with
    ppm shares — the hub/skew audit the dst-keyed graph shuffles need;
    zero-in-degree isolates included."""
    emb = read_table(spark, sf_dir, "embeddings")
    n_corpus = _corpus_count_memo(sf_dir, emb)
    if n_corpus <= GRAPH_DRIVER_MAX:
        # share the memoized driver-route edge build with the rest of the
        # graph family (PageRank/LP/HITS/... have usually built it already)
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_indegree_profile")
        indeg: dict[int, int] = {v: 0 for v in out_edges}
        for dsts in out_edges.values():
            for v in dsts:
                indeg[v] += 1
        hist: dict[int, int] = {}
        for d in indeg.values():
            hist[d] = hist.get(d, 0) + 1
        return spark.createDataFrame(
            [(d, c, c * 1_000_000 // n_corpus) for d, c in sorted(hist.items())],
            "indeg long, n_nodes long, share_ppm long",
        ).orderBy("indeg")
    dir_edges = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_indegree_profile")
    cnt = dir_edges.groupBy("dst").agg(F.count("*").alias("c"))
    ind = (
        emb.select(F.col("vec_id"))
        .join(cnt, emb.vec_id == cnt.dst, "left")
        .select(F.coalesce("c", F.lit(0)).cast("long").alias("indeg"))
    )
    return (
        ind.groupBy("indeg")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.expr(f"count(*) * 1000000 div {n_corpus}").cast("long").alias("share_ppm"),
        )
        .orderBy("indeg")
    )


# --------------------------------------------------------------------------
# B92: graph node profile — the graph-family capstone (r9, for r10)
# --------------------------------------------------------------------------
# One row per top-PageRank node joining EVERYTHING the family computes
# from the ONE shared edge build: eigenvector centrality (B46),
# community (B54), degree + triangles + clustering coefficient (B68),
# and mutual-kNN 2-core membership (B78) — the per-document "graph
# passport" a curation pipeline reads to pick diverse-but-central,
# dense-region representatives. The oracle is the family's thesis made
# executable: ONE recursive SQL replays the PageRank rounds, the LP
# rounds, the triangle join, AND the k-core peel off the SAME edge CTE
# and joins them — four algorithms, one edge list, bit-for-bit.
PROFILE_TOPN = 20


@register(
    "graph_node_profile",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), dir AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), pr_edges AS (
  SELECT src, dst, 1 AS w FROM dir
  UNION ALL
  SELECT vec_id, vec_id, 0 FROM embeddings
), pr AS (
  SELECT 0 AS iter, vec_id AS node, CAST(1000000 AS BIGINT) AS r FROM embeddings
  UNION ALL
  SELECT p.iter + 1, e.dst,
         CAST(150000 + sum(CASE WHEN e.w = 1 THEN (p.r * 170 + 300) // 600 ELSE 0 END) AS BIGINT)
  FROM pr p JOIN pr_edges e ON e.src = p.node
  WHERE p.iter < {PAGERANK_ITERS}
  GROUP BY p.iter, e.dst
), lp_edges AS (
  SELECT src, dst, 1 AS w FROM (SELECT src, dst FROM dir UNION SELECT dst, src FROM dir)
  UNION ALL
  SELECT vec_id, vec_id, 0 FROM embeddings
), lp AS (
  SELECT 0 AS iter, vec_id AS node, CAST(vec_id AS BIGINT) AS lab FROM embeddings
  UNION ALL
  SELECT iter1, dst, CAST({_LP_ENC - 1} - (max(enc) % {_LP_ENC}) AS BIGINT)
  FROM (
    SELECT p.iter + 1 AS iter1, e.dst, p.lab,
           sum(e.w) * {_LP_ENC} + ({_LP_ENC - 1} - p.lab) AS enc
    FROM lp p JOIN lp_edges e ON e.src = p.node
    WHERE p.iter < {LP_ITERS}
    GROUP BY p.iter + 1, e.dst, p.lab
  ) agg
  GROUP BY iter1, dst
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dir
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
  GROUP BY node
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), corner AS (
  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
), tcnt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corner GROUP BY node
), mue AS (
  SELECT d1.src AS a, d1.dst AS b
  FROM dir d1 JOIN dir d2 ON d2.src = d1.dst AND d2.dst = d1.src
), core AS (
  SELECT 0 AS r, vec_id AS node FROM embeddings
  UNION ALL
  (WITH prev AS (SELECT * FROM core WHERE r < {KCORE_ROUNDS}),
   cdeg AS (
     SELECT p.r, e.a AS node, count(*) AS d
     FROM mue e
     JOIN prev p ON p.node = e.a
     JOIN prev p2 ON p2.node = e.b AND p2.r = p.r
     GROUP BY p.r, e.a
   )
   SELECT r + 1, node FROM cdeg WHERE d >= {KCORE_K})
), surv AS (
  SELECT node FROM core WHERE r = {KCORE_ROUNDS}
), top AS (
  SELECT node, r AS rank_micro,
         row_number() OVER (ORDER BY r DESC, node) AS rnk
  FROM pr WHERE iter = {PAGERANK_ITERS}
)
SELECT t.node AS vec_id, t.rank_micro, t.rnk,
       l.lab AS community_id,
       COALESCE(d.deg, 0) AS deg,
       COALESCE(tc.n_tri, 0) AS n_tri,
       CASE WHEN COALESCE(d.deg, 0) >= 2
            THEN CAST(floor(COALESCE(tc.n_tri, 0) * 2000000.0 / (d.deg * (d.deg - 1)) + 0.5) AS BIGINT)
            ELSE 0 END AS coeff_ppm,
       CAST(CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_core
FROM top t
JOIN (SELECT node, lab FROM lp WHERE iter = {LP_ITERS}) l ON l.node = t.node
LEFT JOIN deg d ON d.node = t.node
LEFT JOIN tcnt tc ON tc.node = t.node
LEFT JOIN surv s ON s.node = t.node
WHERE t.rnk <= {PROFILE_TOPN}
ORDER BY t.rnk
""",
)
def graph_node_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph passport for the top-{n} PageRank nodes (B92): centrality,
    community, degree, triangles, clustering coefficient, and mutual-kNN
    {k}-core membership — every graph-family signal off the ONE shared
    edge build, with a single recursive-CTE oracle replaying all four
    algorithms."""
    import math

    emb = read_table(spark, sf_dir, "embeddings")
    if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_node_profile")
        r_map = _pagerank_scores_driver(out_edges, PAGERANK_ITERS)
        nbrs: dict[int, set[int]] = {v: set() for v in out_edges}
        for u, ds in out_edges.items():
            for v in ds:
                nbrs[u].add(v)
                nbrs.setdefault(v, set()).add(u)
        labels = _lp_labels_driver(nbrs, LP_ITERS)
        und: set[tuple[int, int]] = set()
        for u, ds in out_edges.items():
            for v in ds:
                und.add((min(u, v), max(u, v)))
        tri = {v: 0 for v in nbrs}
        for a, b in und:
            for c in nbrs[a] & nbrs[b]:
                tri[c] += 1
        core = _kcore_driver(out_edges, KCORE_K, KCORE_ROUNDS)
        top = sorted(((-rv, v) for v, rv in r_map.items()))[:PROFILE_TOPN]
        rows = []
        for i, (nr, v) in enumerate(top):
            dg = len(nbrs[v])
            nt = tri.get(v, 0)
            coeff = int(math.floor(nt * 2000000.0 / (dg * (dg - 1)) + 0.5)) if dg >= 2 else 0
            rows.append((v, -nr, i + 1, labels[v], dg, nt, coeff, 1 if v in core else 0))
        return spark.createDataFrame(
            rows,
            "vec_id long, rank_micro long, rnk long, community_id long,"
            " deg long, n_tri long, coeff_ppm long, in_core long",
        ).orderBy("rnk")
    # distributed route: the family's DF helpers over the SHARED edge frame
    dir_e = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_node_profile")
    pr = _pagerank_rounds_df(emb, dir_e, PAGERANK_ITERS)
    lp = _lp_rounds_df(emb, dir_e, LP_ITERS).select(
        F.col("node"), F.col("lab").alias("community_id")
    )
    und_df = dir_e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct().localCheckpoint(eager=True)
    deg = (
        und_df.select(F.col("a").alias("node"))
        .unionByName(und_df.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    e2 = und_df.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und_df.select(F.col("a").alias("x2"), F.col("b").alias("z2"))
    tri = (
        und_df.join(e2, und_df.b == e2.y)
        .join(e3, (F.col("a") == F.col("x2")) & (F.col("z") == F.col("z2")))
        .select("a", "b", "z")
    )
    corner = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    tcnt = corner.groupBy("node").agg(F.count("*").cast("long").alias("n_tri"))
    core = _kcore_rounds_df(emb, dir_e, KCORE_K, KCORE_ROUNDS).select(
        F.col("vec_id").alias("node"), F.lit(1).cast("long").alias("in_core")
    )
    top = (
        pr.select("node", F.col("r").alias("rank_micro"))
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("rank_micro").desc(), F.col("node").asc()))
            .cast("long"),
        )
        .filter(F.col("rnk") <= PROFILE_TOPN)
    )
    coeff = F.when(
        F.coalesce(F.col("deg"), F.lit(0)) >= 2,
        F.floor(
            F.coalesce(F.col("n_tri"), F.lit(0))
            * 2000000.0
            / (F.col("deg") * (F.col("deg") - 1))
            + 0.5
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        top.join(lp, "node")
        .join(deg, "node", "left")
        .join(tcnt, "node", "left")
        .join(core, "node", "left")
        .select(
            F.col("node").alias("vec_id"),
            "rank_micro",
            "rnk",
            "community_id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            coeff.alias("coeff_ppm"),
            F.coalesce("in_core", F.lit(0)).cast("long").alias("in_core"),
        )
        .orderBy("rnk")
    )
graph_node_profile.__doc__ = graph_node_profile.__doc__.replace("{n}", str(PROFILE_TOPN)).replace("{k}", str(KCORE_K))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B104: ANN recall@k eval harness (index-quality gate)
# --------------------------------------------------------------------------
# The number a retrieval platform checks after every index rebuild/retune:
# recall@10 of the IVF probe path against exact brute force, per query and
# in one plan. Both sides rank round(d,4) with vec_id tie-breaks (the r4
# determinism contract), so the comparison is itself exact and fully
# oracle-able — the eval harness is a first-class operator, not offline
# tooling. Scale shape: the exact side is the one-pass broadcast-queries
# scan with per-partition local top-k pre-reduce; the IVF side scores only
# the probed union (at 100 TB: the partition-pruned index read of
# ivf_batch_topk_indexed); the final compare joins two Q*k-row sets.
EVAL_QUERIES = 8
EVAL_K = 10


@register(
    "ann_recall_eval",
    f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {EVAL_QUERIES}
),
cent AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
exact AS (
  SELECT qs.query_id, e.vec_id,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY round({_l2sq_ddb('e.embedding', 'qs.qv')}, {_ROUND}), e.vec_id) AS rn
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id != qs.query_id
),
assigned AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_l2sq_ddb('e.embedding', 'c.cvec')}, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c
),
probe AS (
  SELECT qs.query_id, c.cid,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY {_l2sq_ddb('c.cvec', 'qs.qv')}, c.cid) AS prn
  FROM cent c CROSS JOIN qs
),
approx AS (
  SELECT p.query_id, a.vec_id,
         row_number() OVER (PARTITION BY p.query_id
                            ORDER BY round({_l2sq_ddb('a.embedding', 'qs.qv')}, {_ROUND}), a.vec_id) AS rn
  FROM assigned a
  JOIN (SELECT query_id, cid FROM probe WHERE prn <= {N_PROBE}) p ON a.cid = p.cid
  JOIN qs ON qs.query_id = p.query_id
  WHERE a.rn = 1 AND a.vec_id != p.query_id
)
SELECT q.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) * 1000 // {EVAL_K} AS BIGINT) AS recall_milli
FROM qs q LEFT JOIN (
  SELECT x.query_id, count(*) AS n_hits
  FROM (SELECT query_id, vec_id FROM exact WHERE rn <= {EVAL_K}) x
  JOIN (SELECT query_id, vec_id FROM approx WHERE rn <= {EVAL_K}) a
    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
  GROUP BY x.query_id
) h ON h.query_id = q.query_id
ORDER BY q.query_id
""",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF probe path vs exact brute force for 8 queries
    (B104) — the index-quality gate as one oracle-checked plan."""
    from ..operators.ivf import ivf_assign_gemm

    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("vec_id").asc())

    scored_exact = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), _ROUND).alias("distance"),
        )
    )
    exact = (
        local_topk_per_key(
            scored_exact, key_col="query_id", order_cols=("distance", "vec_id"), k=EVAL_K
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EVAL_K)
        .select("query_id", "vec_id")
    )

    assigned = ivf_assign_gemm(emb, centroids)
    wq = Window.partitionBy("query_id").orderBy(F.col("cd").asc(), F.col("cid").asc())
    probe = (
        centroids.crossJoin(F.broadcast(qs))
        .select("query_id", "cid", V.l2sq(F.col("cvec"), F.col("qv")).alias("cd"))
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= N_PROBE)
        .select("query_id", "cid")
    )
    scored_ivf = (
        assigned.join(F.broadcast(probe), "cid")
        .join(F.broadcast(qs), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), _ROUND).alias("distance"),
        )
    )
    approx = (
        local_topk_per_key(
            scored_ivf, key_col="query_id", order_cols=("distance", "vec_id"), k=EVAL_K
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EVAL_K)
        .select("query_id", "vec_id")
    )

    hits = exact.join(approx, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").alias("n_hits")
    )
    return (
        qs.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(f"coalesce(n_hits, 0) * 1000 div {EVAL_K}").cast("long").alias("recall_milli"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# B105: NDCG@10 retrieval-quality eval (graded label relevance)
# --------------------------------------------------------------------------
# The ranking-quality twin of B104's set-overlap recall: graded relevance
# from labels (2 = exact label match, 1 = same label mod 5 "category",
# 0 = miss), DCG with the standard (2^rel - 1)/log2(rank + 1) gain over
# the exact top-10, and per-query NDCG against the ideal reordering OF
# THE RETRIEVED SET (the reranker-gain convention — documented, not
# hidden). Determinism: each gain term is micro-quantized BEFORE the sum
# (exact-int adds; transcendental quantization is the measure-0
# convention), ideal ranks tie-break on retrieval rank, and the final
# ratio is integer milli division — no float round.
@register(
    "eval_retrieval_ndcg",
    f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < {EVAL_QUERIES}
),
exact AS (
  SELECT qs.query_id, qs.qlabel, e.label,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY round({_l2sq_ddb('e.embedding', 'qs.qv')}, {_ROUND}), e.vec_id) AS rn
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id != qs.query_id
),
topk AS (
  SELECT query_id,
         CASE WHEN label = qlabel THEN 3
              WHEN label % 5 = qlabel % 5 THEN 1 ELSE 0 END AS gain,
         rn
  FROM exact WHERE rn <= {EVAL_K}
),
terms AS (
  SELECT query_id,
         CAST(floor(gain / log2(rn + 1) * 1000000 + 0.5) AS BIGINT) AS dcg_term,
         CAST(floor(gain / log2((row_number() OVER (PARTITION BY query_id
                                                    ORDER BY gain DESC, rn)) + 1)
                    * 1000000 + 0.5) AS BIGINT) AS idcg_term
  FROM topk
)
SELECT query_id,
       CAST(sum(dcg_term) AS BIGINT) AS dcg_micro,
       CAST(sum(idcg_term) AS BIGINT) AS idcg_micro,
       CAST(CASE WHEN sum(idcg_term) = 0 THEN 0
                 ELSE sum(dcg_term) * 1000 // sum(idcg_term) END AS BIGINT) AS ndcg_milli
FROM terms
GROUP BY query_id
ORDER BY query_id
""",
)
def eval_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of exact retrieval under graded label relevance (B105) —
    per-term micro-quantized DCG vs the ideal reordering of the
    retrieved set."""
    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "qlabel",
            "label",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), _ROUND).alias("distance"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("vec_id").asc())
    topk = (
        local_topk_per_key(
            scored, key_col="query_id", order_cols=("distance", "vec_id"), k=EVAL_K
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EVAL_K)
        .select(
            "query_id",
            F.expr(
                "CASE WHEN label = qlabel THEN 3"
                " WHEN label % 5 = qlabel % 5 THEN 1 ELSE 0 END"
            ).alias("gain"),
            "rn",
        )
    )
    wi = Window.partitionBy("query_id").orderBy(F.col("gain").desc(), F.col("rn").asc())
    terms = topk.select(
        "query_id",
        F.expr("CAST(floor(gain / log2(rn + 1) * 1000000 + 0.5) AS BIGINT)").alias("dcg_term"),
        F.floor(
            F.col("gain") / F.log2(F.row_number().over(wi) + 1) * 1000000 + 0.5
        ).cast("long").alias("idcg_term"),
    )
    return (
        terms.groupBy("query_id")
        .agg(
            F.sum("dcg_term").cast("long").alias("dcg_micro"),
            F.sum("idcg_term").cast("long").alias("idcg_micro"),
            F.expr(
                "CAST(CASE WHEN sum(idcg_term) = 0 THEN 0"
                " ELSE sum(dcg_term) * 1000 div sum(idcg_term) END AS BIGINT)"
            ).alias("ndcg_milli"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# B106: pivot-sampled betweenness centrality (Brandes over the kNN graph)
# --------------------------------------------------------------------------
# The bridge-detector the centrality family was missing: closeness (B82)
# finds nodes NEAR everything, PageRank (B46) finds nodes POINTED AT —
# betweenness finds nodes PATHS RUN THROUGH (corpus "connector" docs,
# cut vertices between topic clusters). Brandes (J.Math.Soc. 2001) from
# K seeded pivots, truncated at R rounds (the B82 pivot/truncation
# discipline): forward BFS carries EXACT integer shortest-path counts
# sigma (sum over predecessors — order-independent), the backward pass
# accumulates dependencies level-by-level with ONE integer-div
# quantization per (edge, level) step — delta_micro(v) = sum over
# successors w of (sigma_v * (1e6 + delta_micro_w)) div sigma_w — so
# both engines replay identical integers (the fixed-round r6 contract;
# no float ever enters). Oracle = TWO chained recursive CTEs (forward
# then backward — the B92 multi-CTE replay pattern) with carried state
# per iteration. Scale shape: per-round frontier⋈edges joins + one
# groupBy, state bounded by K·N; backward adds R level-local joins; same
# auto-routing as every graph op (driver loop under 100k nodes, exact
# GEMM edges under GRAPH_EXACT_MAX, ANN candidates above).
BETWEENNESS_PIVOTS = 4
BETWEENNESS_ROUNDS = 8
BETWEENNESS_TOPN = 20


def _betweenness_driver(out_edges: dict, pivots: list, rounds: int) -> dict:
    """Truncated integer Brandes, driver route — the exact arithmetic of
    the recursive-CTE oracle."""
    und: dict = {v: set() for v in out_edges}
    for u, dsts in out_edges.items():
        for v in dsts:
            und[u].add(v)
            und.setdefault(v, set()).add(u)
    bw = {v: 0 for v in und}
    for s in pivots:
        dist = {s: 0}
        sigma = {s: 1}
        frontier = [s]
        for d in range(1, rounds + 1):
            nxt = set()
            for u in frontier:
                for v in und[u]:
                    if v not in dist:
                        nxt.add(v)
            if not nxt:
                break
            for v in nxt:
                dist[v] = d
            for v in nxt:
                sigma[v] = sum(sigma[u] for u in und[v] if dist.get(u) == d - 1)
            frontier = sorted(nxt)
        delta = {v: 0 for v in dist}
        for lvl in range(rounds - 1, -1, -1):
            for v in dist:
                if dist[v] != lvl:
                    continue
                c = 0
                hit = False
                for w in und[v]:
                    if dist.get(w) == lvl + 1:
                        hit = True
                        c += (sigma[v] * (1_000_000 + delta[w])) // sigma[w]
                if hit:
                    delta[v] = c
        for v in dist:
            if v != s:
                bw[v] += delta[v]
    return bw


def _betweenness_rounds_df(
    emb: DataFrame, dir_edges: DataFrame, pivots: list, rounds: int
) -> DataFrame:
    """Distributed truncated Brandes returning (node, betweenness_micro)."""
    spark = emb.sparkSession
    fwd_e = dir_edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev_e = dir_edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    und = fwd_e.unionByName(rev_e).distinct().localCheckpoint(eager=True)
    state = spark.createDataFrame(
        [(int(p), int(p), 0, 1) for p in pivots],
        "pivot long, node long, dist int, sigma long",
    ).localCheckpoint(eager=True)
    frontier = state
    for d in range(1, rounds + 1):
        cand = (
            frontier.join(und, frontier.node == und.a)
            .groupBy("pivot", F.col("b").alias("node"))
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .select("pivot", "node", F.lit(d).alias("dist"), "sigma")
        )
        fresh = cand.join(state, ["pivot", "node"], "left_anti").localCheckpoint(eager=True)
        if fresh.isEmpty():
            break
        state = state.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh
    cur = state.withColumn("delta", F.lit(0).cast("long"))
    for lvl in range(rounds - 1, -1, -1):
        upd = (
            cur.filter(F.col("dist") == lvl)
            .alias("v")
            .join(und.alias("e"), F.col("v.node") == F.col("e.a"))
            .join(
                cur.filter(F.col("dist") == lvl + 1).alias("w"),
                (F.col("w.pivot") == F.col("v.pivot")) & (F.col("w.node") == F.col("e.b")),
            )
            .groupBy(F.col("v.pivot").alias("pivot"), F.col("v.node").alias("node"))
            .agg(
                F.sum(F.expr("(v.sigma * (1000000 + w.delta)) div w.sigma"))
                .cast("long")
                .alias("c")
            )
        )
        cur = (
            cur.join(upd, ["pivot", "node"], "left")
            .select(
                "pivot",
                "node",
                "dist",
                "sigma",
                F.coalesce("c", "delta").cast("long").alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
    scored = (
        cur.filter(F.col("node") != F.col("pivot"))
        .groupBy("node")
        .agg(F.sum("delta").cast("long").alias("betweenness_micro"))
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    return nodes.join(scored, "node", "left").select(
        "node",
        F.coalesce("betweenness_micro", F.lit(0)).cast("long").alias("betweenness_micro"),
    )


@register(
    "graph_betweenness_pivots",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), de AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), ue AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM de UNION ALL SELECT dst, src FROM de
  )
), pivots AS (
  SELECT vec_id AS p FROM embeddings
  ORDER BY md5('betweenness-pivots-v1:' || CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {BETWEENNESS_PIVOTS}
), fwd AS (
  SELECT 0 AS it, p AS pv, p AS node, 0 AS dist, CAST(1 AS BIGINT) AS sigma FROM pivots
  UNION ALL
  (WITH prev AS (SELECT * FROM fwd WHERE it < {BETWEENNESS_ROUNDS}),
   nxt AS (
     SELECT v.it + 1 AS it, v.pv, e.b AS node, v.dist + 1 AS dist,
            CAST(sum(v.sigma) AS BIGINT) AS sigma
     FROM prev v JOIN ue e ON e.a = v.node
     WHERE v.dist = v.it
     GROUP BY v.it + 1, v.pv, e.b, v.dist + 1
   ),
   fresh AS (
     SELECT n.* FROM nxt n ANTI JOIN prev d ON d.pv = n.pv AND d.node = n.node
   )
   SELECT p.it + 1, p.pv, p.node, p.dist, p.sigma FROM prev p
   UNION ALL
   SELECT * FROM fresh)
), bwd AS (
  SELECT 0 AS it, pv, node, dist, sigma, CAST(0 AS BIGINT) AS delta
  FROM fwd WHERE it = {BETWEENNESS_ROUNDS}
  UNION ALL
  (WITH prev AS (SELECT * FROM bwd WHERE it < {BETWEENNESS_ROUNDS}),
   upd AS (
     SELECT v.pv, v.node,
            CAST(sum((v.sigma * (1000000 + w.delta)) // w.sigma) AS BIGINT) AS c
     FROM prev v
     JOIN ue e ON e.a = v.node
     JOIN prev w ON w.pv = v.pv AND w.node = e.b AND w.dist = v.dist + 1
     WHERE v.dist = {BETWEENNESS_ROUNDS} - (v.it + 1)
     GROUP BY v.pv, v.node
   )
   SELECT p.it + 1 AS it, p.pv, p.node, p.dist, p.sigma,
          CAST(coalesce(u.c, p.delta) AS BIGINT) AS delta
   FROM prev p LEFT JOIN upd u ON u.pv = p.pv AND u.node = p.node)
), bw AS (
  SELECT node, CAST(sum(delta) AS BIGINT) AS b
  FROM bwd WHERE it = {BETWEENNESS_ROUNDS} AND node != pv
  GROUP BY node
), allnodes AS (
  SELECT e.vec_id, CAST(coalesce(b.b, 0) AS BIGINT) AS betweenness_micro
  FROM embeddings e LEFT JOIN bw b ON b.node = e.vec_id
)
SELECT vec_id, betweenness_micro,
       row_number() OVER (ORDER BY betweenness_micro DESC, vec_id) AS rnk
FROM allnodes ORDER BY rnk LIMIT {BETWEENNESS_TOPN}
""",
)
def graph_betweenness_pivots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} nodes by pivot-sampled truncated Brandes betweenness over
    the symmetrized kNN graph (B106): {p} seeded pivots, {r}-round BFS
    with exact integer path counts, integer-quantized dependency
    accumulation."""
    import hashlib

    emb = read_table(spark, sf_dir, "embeddings")
    if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_betweenness_pivots")
        pivots = sorted(
            out_edges,
            key=lambda v: (hashlib.md5(f"betweenness-pivots-v1:{v}".encode()).hexdigest(), v),
        )[:BETWEENNESS_PIVOTS]
        bw = _betweenness_driver(out_edges, pivots, BETWEENNESS_ROUNDS)
        top = sorted(((-sc, v) for v, sc in bw.items()))[:BETWEENNESS_TOPN]
        return spark.createDataFrame(
            [(v, -ns, i + 1) for i, (ns, v) in enumerate(top)],
            "vec_id long, betweenness_micro long, rnk long",
        ).orderBy("rnk")
    dir_edges = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_betweenness_pivots")
    pivots = [
        r.vec_id
        for r in emb.select("vec_id")
        .withColumn(
            "_h",
            F.md5(
                F.concat_ws(":", F.lit("betweenness-pivots-v1"), F.col("vec_id").cast("string"))
            ),
        )
        .orderBy("_h", "vec_id")
        .limit(BETWEENNESS_PIVOTS)
        .collect()
    ]
    bw = _betweenness_rounds_df(emb, dir_edges, pivots, BETWEENNESS_ROUNDS)
    return (
        bw.select(F.col("node").alias("vec_id"), "betweenness_micro")
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("betweenness_micro").desc(), F.col("vec_id").asc()))
            .cast("long"),
        )
        .filter(F.col("rnk") <= BETWEENNESS_TOPN)
        .orderBy("rnk")
    )
graph_betweenness_pivots.__doc__ = graph_betweenness_pivots.__doc__.replace("{n}", str(BETWEENNESS_TOPN)).replace("{p}", str(BETWEENNESS_PIVOTS)).replace("{r}", str(BETWEENNESS_ROUNDS))  # template scale constants into the (real) docstring


# --------------------------------------------------------------------------
# B123: pivot-variance audit for sampled betweenness (is K enough?)
# --------------------------------------------------------------------------
# Every pivot-sampled estimate (B82 closeness, B106 betweenness) has a
# sampling question nobody answers by staring at one run: how much does
# the TOP-K SET move when you draw a different pivot sample? This audit
# runs the full B106 machinery under two DISJOINT seeded pivot sets
# (v1 = B106's own; v2 from an independent md5 stream, minus any v1
# member) and reports top-20 agreement: intersection size, pair-set
# Jaccard ppm, and the worst rank displacement among common members.
# High agreement → K=4 pivots already ranks YOUR graph stably; low →
# double K before trusting it at 100 TB (the linear-cost knob the B106
# docstring promises). Oracle: the forward/backward recursive-CTE pair
# GENERATED TWICE by one builder (prefixed CTE names), so the audited
# arithmetic and the audit cannot drift. Scale: exactly 2x B106.
def _bw_cte_pair(p: str, seed: str, exclude_cte: str | None = None) -> str:
    """Forward+backward Brandes CTE pair over the shared `ue` edges,
    prefixed `p`, pivots seeded by `seed` (optionally excluding the
    members of another pivot CTE)."""
    excl = f"AND vec_id NOT IN (SELECT p FROM {exclude_cte})" if exclude_cte else ""
    R = BETWEENNESS_ROUNDS
    return f"""{p}pivots AS (
  SELECT vec_id AS p FROM embeddings
  WHERE TRUE {excl}
  ORDER BY md5('{seed}:' || CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {BETWEENNESS_PIVOTS}
), {p}fwd AS (
  SELECT 0 AS it, p AS pv, p AS node, 0 AS dist, CAST(1 AS BIGINT) AS sigma FROM {p}pivots
  UNION ALL
  (WITH prev AS (SELECT * FROM {p}fwd WHERE it < {R}),
   nxt AS (
     SELECT v.it + 1 AS it, v.pv, e.b AS node, v.dist + 1 AS dist,
            CAST(sum(v.sigma) AS BIGINT) AS sigma
     FROM prev v JOIN ue e ON e.a = v.node
     WHERE v.dist = v.it
     GROUP BY v.it + 1, v.pv, e.b, v.dist + 1
   ),
   fresh AS (
     SELECT n.* FROM nxt n ANTI JOIN prev d ON d.pv = n.pv AND d.node = n.node
   )
   SELECT p.it + 1, p.pv, p.node, p.dist, p.sigma FROM prev p
   UNION ALL
   SELECT * FROM fresh)
), {p}bwd AS (
  SELECT 0 AS it, pv, node, dist, sigma, CAST(0 AS BIGINT) AS delta
  FROM {p}fwd WHERE it = {R}
  UNION ALL
  (WITH prev AS (SELECT * FROM {p}bwd WHERE it < {R}),
   upd AS (
     SELECT v.pv, v.node,
            CAST(sum((v.sigma * (1000000 + w.delta)) // w.sigma) AS BIGINT) AS c
     FROM prev v
     JOIN ue e ON e.a = v.node
     JOIN prev w ON w.pv = v.pv AND w.node = e.b AND w.dist = v.dist + 1
     WHERE v.dist = {R} - (v.it + 1)
     GROUP BY v.pv, v.node
   )
   SELECT p.it + 1 AS it, p.pv, p.node, p.dist, p.sigma,
          CAST(coalesce(u.c, p.delta) AS BIGINT) AS delta
   FROM prev p LEFT JOIN upd u ON u.pv = p.pv AND u.node = p.node)
), {p}top AS (
  SELECT vec_id, betweenness_micro,
         row_number() OVER (ORDER BY betweenness_micro DESC, vec_id) AS rnk
  FROM (
    SELECT e.vec_id, CAST(coalesce(b.bsum, 0) AS BIGINT) AS betweenness_micro
    FROM embeddings e LEFT JOIN (
      SELECT node, CAST(sum(delta) AS BIGINT) AS bsum
      FROM {p}bwd WHERE it = {R} AND node != pv GROUP BY node
    ) b ON b.node = e.vec_id
  ) scored_{p}
  ORDER BY rnk LIMIT {BETWEENNESS_TOPN}
)"""


def _bw_variance_oracle() -> str:
    return f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), de AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), ue AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM de UNION ALL SELECT dst, src FROM de
  )
), {_bw_cte_pair("x_", "betweenness-pivots-v1")},
{_bw_cte_pair("y_", "betweenness-pivots-v2", exclude_cte="x_pivots")},
common AS (
  SELECT x.vec_id, x.rnk AS rnk_a, y.rnk AS rnk_b
  FROM x_top x JOIN y_top y ON y.vec_id = x.vec_id
)
SELECT CAST({BETWEENNESS_TOPN} AS BIGINT) AS n_top,
       CAST((SELECT count(*) FROM common) AS BIGINT) AS n_common,
       CAST((SELECT count(*) FROM common) * 1000000
            // (2 * {BETWEENNESS_TOPN} - (SELECT count(*) FROM common)) AS BIGINT)
         AS topk_jaccard_ppm,
       CAST(coalesce((SELECT max(abs(rnk_a - rnk_b)) FROM common), -1) AS BIGINT)
         AS max_rank_shift
"""


@register("graph_betweenness_variance", _bw_variance_oracle())
def graph_betweenness_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 agreement of B106 under two disjoint pivot samples (B123)
    — the is-K-enough audit: set Jaccard ppm + worst common-member rank
    displacement."""
    import hashlib

    emb = read_table(spark, sf_dir, "embeddings")

    def _pivots(seed: str, exclude: set) -> list:
        if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
            out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_betweenness_variance")
            pool = [v for v in out_edges if v not in exclude]
            return sorted(
                pool,
                key=lambda v: (hashlib.md5(f"{seed}:{v}".encode()).hexdigest(), v),
            )[:BETWEENNESS_PIVOTS]
        df = emb.select("vec_id").filter(~F.col("vec_id").isin(list(exclude)) if exclude else F.lit(True))
        return [
            r.vec_id
            for r in df.withColumn(
                "_h", F.md5(F.concat_ws(":", F.lit(seed), F.col("vec_id").cast("string")))
            )
            .orderBy("_h", "vec_id")
            .limit(BETWEENNESS_PIVOTS)
            .collect()
        ]

    def _top(pivots: list) -> list:
        if _corpus_count_memo(sf_dir, emb) <= GRAPH_DRIVER_MAX:
            out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_betweenness_variance")
            bw = _betweenness_driver(out_edges, pivots, BETWEENNESS_ROUNDS)
            top = sorted(((-sc, v) for v, sc in bw.items()))[:BETWEENNESS_TOPN]
            return [(v, i + 1) for i, (_ns, v) in enumerate(top)]
        dir_edges = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_betweenness_variance")
        bw = _betweenness_rounds_df(emb, dir_edges, pivots, BETWEENNESS_ROUNDS)
        rows = (
            bw.select(F.col("node").alias("vec_id"), "betweenness_micro")
            .withColumn(
                "rnk",
                F.row_number().over(
                    Window.orderBy(F.col("betweenness_micro").desc(), F.col("vec_id").asc())
                ),
            )
            .filter(F.col("rnk") <= BETWEENNESS_TOPN)
            .collect()
        )
        return [(r.vec_id, r.rnk) for r in rows]

    pa = _pivots("betweenness-pivots-v1", set())
    pb = _pivots("betweenness-pivots-v2", set(pa))
    ta, tb = dict(_top(pa)), dict(_top(pb))
    common = set(ta) & set(tb)
    n_common = len(common)
    jacc = n_common * 1_000_000 // (2 * BETWEENNESS_TOPN - n_common)
    shift = max((abs(ta[v] - tb[v]) for v in common), default=-1)
    return spark.createDataFrame(
        [(BETWEENNESS_TOPN, n_common, jacc, shift)],
        "n_top long, n_common long, topk_jaccard_ppm long, max_rank_shift long",
    )


# --------------------------------------------------------------------------
# B133: two-stage retrieve -> cross-encoder re-rank (r9)
# --------------------------------------------------------------------------
# The production RAG ranking stack: a cheap retriever over-fetches
# CE_DEPTH candidates, then an expensive pairwise (query, doc) scorer
# re-ranks just those. The deterministic stand-in scorer is IDF-weighted
# distinct-token overlap — the exact arithmetic a lexical cross-scorer
# computes, fully SQL-expressible, so the WHOLE two-stage pipeline is
# oracle-checked end to end (retrieval cutoff, tie-breaks, re-rank
# order). A real model drops in through the ``scorer`` seam (pandas UDF
# over the CE_DEPTH candidate texts ONLY — the whole point of the
# architecture is that model cost is O(depth), not O(corpus)), mirroring
# embed.py's encode_fn seam; sentence-transformers CrossEncoder is the
# documented public implementation when the package lands.
# Scale shape: stage 1 is the ann_text_search map + TakeOrderedAndProject
# (no shuffle beyond top-k); the IDF table is |query tokens| rows built
# in one corpus pass and broadcast; stage 2 touches CE_DEPTH rows.
CE_DEPTH = 50


def _cross_encoder_oracle() -> str:
    q = _poly_dims_py(QUERY_TEXT)
    terms = " + ".join(
        f"power((CAST((h * {a} + {b}) % {H.P} AS DOUBLE) / {H.P}) * 2 - 1 - ({qj!r}), 2)"
        for (a, b), qj in zip(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]), q)
    )
    toklist = "[" + ", ".join(f"'{w}'" for w in QUERY_TEXT.split()) + "]"
    return f"""
WITH h AS (
  SELECT doc_id, {H.ddb_str_hash_fast('text')} AS h FROM documents
), cand AS (
  SELECT doc_id, round({terms}, {_ROUND}) AS retriever_distance
  FROM h ORDER BY retriever_distance, doc_id LIMIT {CE_DEPTH}
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), dfc AS (
  SELECT qt.tok, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT unnest({toklist}) AS tok) qt
  JOIN documents d ON list_contains(string_split(d.text, ' '), qt.tok)
  GROUP BY qt.tok
), idf AS (
  SELECT tok, CAST(round(ln(n.n_docs * 1.0 / df) * 1000000.0) AS BIGINT) AS idf_micro
  FROM dfc CROSS JOIN n
), scored AS (
  SELECT c.doc_id, c.retriever_distance,
         CAST(coalesce(sum(CASE WHEN list_contains(string_split(d.text, ' '), i.tok)
                                THEN i.idf_micro END), 0) AS BIGINT) AS ce_score_micro
  FROM cand c JOIN documents d USING (doc_id) CROSS JOIN idf i
  GROUP BY c.doc_id, c.retriever_distance
)
SELECT doc_id, retriever_distance, ce_score_micro,
       CAST(row_number() OVER (ORDER BY ce_score_micro DESC, retriever_distance, doc_id)
            AS BIGINT) AS ce_rank
FROM scored
ORDER BY ce_rank
LIMIT 10
"""


@register("cross_encoder_rerank", _cross_encoder_oracle())
def cross_encoder_rerank(spark: SparkSession, sf_dir: str, scorer=None) -> DataFrame:
    """Two-stage retrieval: poly-hash ANN over-fetch (CE_DEPTH) then a
    cross-scorer re-rank of just the candidates (B133). The default
    scorer is deterministic IDF-weighted token overlap (oracle-exact);
    pass ``scorer(query: pd.Series, text: pd.Series) -> pd.Series`` to
    swap in a real cross-encoder — it sees CE_DEPTH rows, never the
    corpus."""
    d = read_table(spark, sf_dir, "documents")
    h = d.select("doc_id", F.expr(H.spark_str_hash_fast("text")).alias("h"))
    q = _poly_dims_py(QUERY_TEXT)
    dist = None
    for (a, b), qj in zip(zip(H.MINHASH_A[:EMBED_DIM], H.MINHASH_B[:EMBED_DIM]), q):
        dim = (((F.col("h") * a + b) % H.P).cast("double") / H.P) * 2 - 1
        term = F.pow(dim - qj, F.lit(2))
        dist = term if dist is None else dist + term
    cand = (
        h.select("doc_id", F.round(dist, _ROUND).alias("retriever_distance"))
        .orderBy(F.col("retriever_distance").asc(), F.col("doc_id").asc())
        .limit(CE_DEPTH)
    )
    with_text = cand.join(d.select("doc_id", "text"), "doc_id")
    if scorer is not None:
        # real-model seam: Arrow-batched pairwise scoring of the
        # CE_DEPTH candidates only (public cross-encoder drop-in).
        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _score(text):
            import pandas as pd

            return scorer(pd.Series([QUERY_TEXT] * len(text)), text)

        scored = with_text.select(
            "doc_id",
            "retriever_distance",
            F.round(_score(F.col("text")) * 1000000).cast("long").alias("ce_score_micro"),
        )
    else:
        toks = [w for w in QUERY_TEXT.split()]
        n_docs = d.count()
        qt = spark.createDataFrame([(w,) for w in toks], "tok string")
        dfc = (
            d.select(F.split(F.col("text"), " ").alias("dt"))
            .crossJoin(F.broadcast(qt))
            .filter(F.array_contains(F.col("dt"), F.col("tok")))
            .groupBy("tok")
            .agg(F.count("*").cast("long").alias("df"))
        )
        idf = dfc.select(
            "tok",
            F.round(F.log(F.lit(float(n_docs)) / F.col("df")) * 1000000.0)
            .cast("long")
            .alias("idf_micro"),
        )
        scored = (
            with_text.select("doc_id", "retriever_distance", F.split("text", " ").alias("dt"))
            .crossJoin(F.broadcast(idf))
            .groupBy("doc_id", "retriever_distance")
            .agg(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.array_contains(F.col("dt"), F.col("tok")), F.col("idf_micro")
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("ce_score_micro")
            )
        )
    wr = Window.orderBy(
        F.col("ce_score_micro").desc(), F.col("retriever_distance").asc(), F.col("doc_id").asc()
    )
    return (
        scored.select(
            "doc_id",
            "retriever_distance",
            "ce_score_micro",
            F.row_number().over(wr).cast("long").alias("ce_rank"),
        )
        .orderBy("ce_rank")
        .limit(10)
    )


# --------------------------------------------------------------------------
# B155: degree assortativity of the kNN graph (r9)
# --------------------------------------------------------------------------
# Do hubs link to hubs? Pearson correlation between total degree
# (out-degree is k by construction, so total = k + in-degree) of the
# two endpoints over every directed edge — negative in kNN graphs when
# popular neighbours attach to sparse regions (Newman 2002's
# disassortativity). Rides the SAME memoized edge build as the rest of
# the graph family; moment sums over edge pairs are exact BIGINTs and
# Pearson evaluates once, floor(x+0.5)-quantized to micro (the B145
# discipline). Output is one row; the cost is the edge build the other
# graph ops already paid.
@register(
    "graph_assortativity",
    f"""
WITH scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), de AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), deg AS (
  SELECT n.vec_id,
         CAST({PAGERANK_DEG} + coalesce(cnt.c, 0) AS BIGINT) AS d
  FROM embeddings n LEFT JOIN (
    SELECT dst, count(*) AS c FROM de GROUP BY dst
  ) cnt ON cnt.dst = n.vec_id
), pairs AS (
  SELECT ds.d AS x, dd.d AS y
  FROM de JOIN deg ds ON ds.vec_id = de.src JOIN deg dd ON dd.vec_id = de.dst
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs
)
SELECT n AS n_edges,
       CAST(CASE WHEN (n * sxx - sx * sx) <= 0 OR (n * syy - sy * sy) <= 0 THEN 0
                 ELSE floor((CAST(n * sxy - sx * sy AS DOUBLE))
                            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) * 1000000 + 0.5) END
            AS BIGINT) AS assortativity_micro
FROM stats
""",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the directed top-k kNN graph
    (B155) — Pearson over (deg(src), deg(dst)) edge pairs, exact
    integer moments, one output row; shares the family's memoized edge
    build."""
    emb = read_table(spark, sf_dir, "embeddings")
    n_corpus = _corpus_count_memo(sf_dir, emb)
    if n_corpus <= GRAPH_DRIVER_MAX:
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_assortativity")
        indeg: dict[int, int] = {v: 0 for v in out_edges}
        for dsts in out_edges.values():
            for v in dsts:
                indeg[v] += 1
        deg = {v: PAGERANK_DEG + indeg[v] for v in out_edges}
        n = sx = sy = sxy = sxx = syy = 0
        for s, dsts in out_edges.items():
            for t in dsts:
                x, y = deg[s], deg[t]
                n += 1
                sx += x
                sy += y
                sxy += x * y
                sxx += x * x
                syy += y * y
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        import math

        r = (
            0
            if vx <= 0 or vy <= 0
            else int(math.floor((n * sxy - sx * sy) / math.sqrt(vx) / math.sqrt(vy) * 1000000 + 0.5))
        )
        return spark.createDataFrame([(n, r)], "n_edges long, assortativity_micro long")
    de = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_assortativity")
    cnt = de.groupBy("dst").agg(F.count("*").alias("c"))
    deg = (
        emb.select("vec_id")
        .join(cnt, emb.vec_id == cnt.dst, "left")
        .select(
            "vec_id",
            (F.lit(PAGERANK_DEG) + F.coalesce("c", F.lit(0))).cast("long").alias("d"),
        )
    )
    pairs = (
        de.join(deg.withColumnRenamed("vec_id", "src").withColumnRenamed("d", "x"), "src")
        .join(deg.withColumnRenamed("vec_id", "dst").withColumnRenamed("d", "y"), "dst")
        .select("x", "y")
    )
    stats = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return stats.select(
        F.col("n").alias("n_edges"),
        F.when((vx <= 0) | (vy <= 0), F.lit(0))
        .otherwise(
            F.floor(
                cov.cast("double") / F.sqrt(vx.cast("double")) / F.sqrt(vy.cast("double"))
                * 1000000
                + 0.5
            )
        )
        .cast("long")
        .alias("assortativity_micro"),
    )


# --------------------------------------------------------------------------
# B154: recommendation coverage + intra-list diversity eval (r9)
# --------------------------------------------------------------------------
# The third axis of retrieval eval next to recall@k (B104) and NDCG
# (B105): a recommender that always serves the same popular items has
# perfect recall on them and zero catalog value. Catalog coverage =
# distinct items recommended across the query batch over the catalog;
# intra-list diversity (ILD) = mean pairwise distance WITHIN each
# top-k list (Ziegler et al. WWW'05), averaged over queries. Lists are
# exact l2sq top-k (the B3 batch shape); the ILD pair join is k^2 per
# query — bounded by the RESULT size, never the corpus. Per-list ILD
# quantizes once to integer micro, the batch mean is exact integer
# arithmetic. One summary row.
REC_EVAL_QUERIES = 10
REC_EVAL_K = 10


def _rec_eval_oracle() -> str:
    l2 = (
        "list_sum(list_transform(range(1, len({a})+1),"
        " i -> power(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE), 2)))"
    )
    return f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {REC_EVAL_QUERIES}
), scored AS (
  SELECT qs.query_id, e.vec_id, e.embedding,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY round({l2.format(a='e.embedding', b='qs.qv')}, 4), e.vec_id) AS rn
  FROM embeddings e JOIN qs ON e.vec_id != qs.query_id
), recs AS (
  SELECT query_id, vec_id, embedding FROM scored WHERE rn <= {REC_EVAL_K}
), ild AS (
  SELECT a.query_id,
         CAST(round(avg(round({l2.format(a='a.embedding', b='b.embedding')}, 4)) * 1000000.0) AS BIGINT)
           AS ild_micro
  FROM recs a JOIN recs b ON b.query_id = a.query_id AND b.vec_id > a.vec_id
  GROUP BY a.query_id
), cat AS (
  SELECT CAST(count(*) AS BIGINT) AS catalog_size FROM embeddings
)
SELECT CAST({REC_EVAL_QUERIES} AS BIGINT) AS n_queries,
       CAST((SELECT count(*) FROM recs) AS BIGINT) AS n_recs_total,
       CAST((SELECT count(DISTINCT vec_id) FROM recs) AS BIGINT) AS n_distinct_items,
       c.catalog_size,
       CAST((SELECT count(DISTINCT vec_id) FROM recs) * 1000000 // c.catalog_size AS BIGINT)
         AS coverage_ppm,
       CAST((SELECT sum(ild_micro) // count(*) FROM ild) AS BIGINT) AS mean_ild_micro
FROM cat c
"""


@register("rec_coverage_diversity", _rec_eval_oracle())
def rec_coverage_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog coverage and mean intra-list diversity of exact top-k
    recommendation lists over a query batch (B154) — the popularity-
    bias axis of retrieval eval; ILD pair join bounded by k^2 per
    query."""
    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < REC_EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "embedding",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), 4).alias("d"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("vec_id").asc())
    recs = (
        scored.select("query_id", "vec_id", "embedding", F.row_number().over(wr).alias("rn"))
        .filter(F.col("rn") <= REC_EVAL_K)
        .select("query_id", "vec_id", "embedding")
    )
    # the Q·k rec lists feed BOTH the coverage counts and the ILD pair
    # join — checkpoint the (tiny, Q·k-row) frame so the broadcast NN
    # scoring pass runs once, and fold every scalar into ONE final plan
    # (r14 opt: the previous form ran FOUR driver actions — recs.count,
    # distinct count, emb.count, ild collect — re-executing the scored
    # pass each time; 2.2 -> ~0.9 s at sf0.1). A degenerate catalog
    # (no intra-list pairs) yields SQL NULL mean_ild_micro from the
    # empty aggregate — same as the oracle's scalar subquery.
    recs = recs.localCheckpoint(eager=True)
    a = recs.alias("a")
    b = recs.alias("b")
    ild = (
        a.join(
            b,
            (F.col("b.query_id") == F.col("a.query_id"))
            & (F.col("b.vec_id") > F.col("a.vec_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.round(V.l2sq(F.col("a.embedding"), F.col("b.embedding")), 4).alias("pd"),
        )
        .groupBy("query_id")
        .agg(F.round(F.avg("pd") * 1000000.0).cast("long").alias("ild_micro"))
    )
    rstats = recs.agg(
        F.count("*").cast("long").alias("n_recs_total"),
        F.countDistinct("vec_id").cast("long").alias("n_distinct_items"),
    )
    cat = emb.agg(F.count("*").cast("long").alias("catalog_size"))
    ild_m = ild.agg(
        F.expr("sum(ild_micro) div count(*)").cast("long").alias("mean_ild_micro")
    )
    return (
        rstats.crossJoin(F.broadcast(cat))
        .crossJoin(F.broadcast(ild_m))
        .select(
            F.lit(REC_EVAL_QUERIES).cast("long").alias("n_queries"),
            "n_recs_total",
            "n_distinct_items",
            "catalog_size",
            F.expr("n_distinct_items * 1000000 div catalog_size")
            .cast("long")
            .alias("coverage_ppm"),
            "mean_ild_micro",
        )
    )


# --------------------------------------------------------------------------
# B157: personalized PageRank from a seed set (r9)
# --------------------------------------------------------------------------
# Recommendation by graph proximity: the B46 integer power iteration
# with the teleport redirected to a SEED set (label-0 vectors here; a
# user's history in production) — the restart mass lands only on
# seeds, so rank flows outward from them and the top non-seed nodes
# are the recommendation. Same integer contract as B46 (seeds restart
# at 150000, edges forward (r*170+300) div 600 over out-degree-3,
# self-loop sentinels keep sinks visible), so the DuckDB RECURSIVE CTE
# replays every round bit-for-bit. Routing and the memoized edge build
# are shared with the rest of the graph family.
PPR_SEED_LABEL = 0


@register(
    "graph_personalized_pagerank",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), edges AS (
  SELECT src, dst, 1 AS w FROM scored WHERE rn <= {PAGERANK_DEG}
  UNION ALL
  SELECT vec_id, vec_id, 0 FROM embeddings
), seeds AS (
  SELECT vec_id, CASE WHEN label = {PPR_SEED_LABEL} THEN 1 ELSE 0 END AS is_seed
  FROM embeddings
), pr AS (
  SELECT 0 AS iter, s.vec_id AS node,
         CAST(CASE WHEN s.is_seed = 1 THEN 1000000 ELSE 0 END AS BIGINT) AS r
  FROM seeds s
  UNION ALL
  SELECT p.iter + 1, e.dst,
         CAST(max(CASE WHEN sd.is_seed = 1 THEN 150000 ELSE 0 END)
              + sum(CASE WHEN e.w = 1 THEN (p.r * 170 + 300) // 600 ELSE 0 END) AS BIGINT)
  FROM pr p
  JOIN edges e ON e.src = p.node
  JOIN seeds sd ON sd.vec_id = e.dst
  WHERE p.iter < {PAGERANK_ITERS}
  GROUP BY p.iter, e.dst
)
SELECT p.node AS vec_id, s.is_seed = 1 AS is_seed, p.r AS rank_micro,
       row_number() OVER (ORDER BY p.r DESC, p.node) AS rnk
FROM pr p JOIN seeds s ON s.vec_id = p.node
WHERE p.iter = {PAGERANK_ITERS}
ORDER BY rnk LIMIT {PAGERANK_TOPN}
""",
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by seed-restarted integer PageRank (B157) — the
    teleport lands only on label-0 seeds, rank flows outward, and the
    recursive oracle replays all rounds exactly; shares the family's
    memoized edge build."""
    emb = read_table(spark, sf_dir, "embeddings")
    seeds = {
        int(r.vec_id)
        for r in emb.filter(F.col("label") == PPR_SEED_LABEL).select("vec_id").collect()
    }
    n_corpus = _corpus_count_memo(sf_dir, emb)
    if n_corpus <= GRAPH_DRIVER_MAX:
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_personalized_pagerank")
        r_map = {v: (1000000 if v in seeds else 0) for v in out_edges}
        for _ in range(PAGERANK_ITERS):
            nxt = {v: (150000 if v in seeds else 0) for v in out_edges}
            for s, dsts in out_edges.items():
                fwd = (r_map[s] * 170 + 300) // 600
                for t in dsts:
                    nxt[t] += fwd
            r_map = nxt
        top = sorted(((-rv, v) for v, rv in r_map.items()))[:PAGERANK_TOPN]
        return spark.createDataFrame(
            [(v, v in seeds, -nr, i + 1) for i, (nr, v) in enumerate(top)],
            "vec_id long, is_seed boolean, rank_micro long, rnk long",
        ).orderBy("rnk")
    de = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_personalized_pagerank")
    seed_df = emb.select(
        "vec_id", (F.col("label") == PPR_SEED_LABEL).alias("is_seed")
    )
    r = seed_df.select(
        F.col("vec_id").alias("node"),
        F.when(F.col("is_seed"), F.lit(1000000)).otherwise(0).cast("long").alias("r"),
    )
    bonus = seed_df.select(
        F.col("vec_id").alias("node"),
        F.when(F.col("is_seed"), F.lit(150000)).otherwise(0).cast("long").alias("b"),
    )
    for _ in range(PAGERANK_ITERS):
        contrib = (
            r.join(de, r.node == de.src)
            .select(F.col("dst").alias("node"), F.expr("(r * 170 + 300) div 600").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        r = (
            bonus.join(contrib, "node", "left")
            .select(
                "node",
                (F.col("b") + F.coalesce(F.col("csum"), F.lit(0))).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    wr = Window.orderBy(F.col("r").desc(), F.col("node").asc())
    return (
        r.join(seed_df, r.node == seed_df.vec_id)
        .select(
            F.col("node").alias("vec_id"),
            "is_seed",
            F.col("r").alias("rank_micro"),
            F.row_number().over(wr).cast("long").alias("rnk"),
        )
        .orderBy("rnk")
        .limit(PAGERANK_TOPN)
    )


# --------------------------------------------------------------------------
# B174: kNN-graph reciprocity (r9)
# --------------------------------------------------------------------------
# What share of "a's neighbor is b" is mutual? Reciprocity separates
# hub-dominated similarity graphs (low — everyone points AT the hub,
# it points back at almost nobody) from cluster-dominated ones (high),
# and it is the quantity the mutual-kNN k-core (B78) implicitly
# thresholds. One self-join of the edge list on the reversed pair —
# both sides keyed (src, dst), uniform — over the family's shared
# memoized edge build; one summary row.
@register(
    "graph_reciprocity",
    f"""
WITH scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), de AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
)
SELECT CAST((SELECT count(*) FROM de) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM de e JOIN de r ON r.src = e.dst AND r.dst = e.src) AS BIGINT)
         AS n_mutual,
       CAST((SELECT count(*) FROM de e JOIN de r ON r.src = e.dst AND r.dst = e.src) * 1000000
            // (SELECT count(*) FROM de) AS BIGINT) AS reciprocity_ppm
""",
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of directed kNN edges whose reverse edge also exists
    (B174) — the hub-vs-cluster diagnostic the mutual-kNN k-core
    thresholds; one reversed-pair self-join over the shared edge
    build."""
    emb = read_table(spark, sf_dir, "embeddings")
    n_corpus = _corpus_count_memo(sf_dir, emb)
    if n_corpus <= GRAPH_DRIVER_MAX:
        out_edges = _out_edges_memo(sf_dir, emb, PAGERANK_DEG, "graph_reciprocity")
        eset = {(s, t) for s, dsts in out_edges.items() for t in dsts}
        n_mutual = sum(1 for (s, t) in eset if (t, s) in eset)
        n_edges = len(eset)
        return spark.createDataFrame(
            [(n_edges, n_mutual, n_mutual * 1_000_000 // n_edges)],
            "n_edges long, n_mutual long, reciprocity_ppm long",
        )
    de = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_reciprocity")
    rev = de.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_edges = de.count()
    n_mutual = de.join(rev, ["src", "dst"]).count()
    return spark.createDataFrame(
        [(n_edges, n_mutual, n_mutual * 1_000_000 // n_edges)],
        "n_edges long, n_mutual long, reciprocity_ppm long",
    )


# --------------------------------------------------------------------------
# B181: query performance prediction (QPP) over the top-k score lists
# --------------------------------------------------------------------------
# Retrieval systems route queries BEFORE seeing relevance judgments by
# predicting which will retrieve badly — the classic unsupervised QPP
# signals are score-list statistics (Cronen-Townsend et al. SIGIR'02
# clarity; He & Ounis' simplified variants): a query whose best
# neighbour barely beats its k-th has an ambiguous neighbourhood and is
# the one to re-rank harder, expand (B143), or escalate to the
# cross-encoder (B133). Emits, per query: best / k-th / integer-mean
# distance over the exact top-QPP_K list, the absolute spread, and the
# relative spread in ppm of the k-th distance — the routing signal.
# Arithmetic: distances round once to 4 dp, then scale to exact e4
# integers; every statistic after is integer algebra. Scale: one
# broadcast-query scored pass with the local-top-k pre-reduce (the B3
# shape) — the stats add one tiny per-query aggregate.
QPP_STATS_K = 10


def _qpp_stats_oracle() -> str:
    return f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT qs.query_id,
         CAST(round(round({_l2sq_ddb('e.embedding', 'qs.qv')}, {_ROUND}) * 10000) AS BIGINT)
           AS d_e4,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY round({_l2sq_ddb('e.embedding', 'qs.qv')}, {_ROUND}),
                                     e.vec_id) AS rn
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id != qs.query_id
), topk AS (
  SELECT query_id, d_e4, rn FROM scored WHERE rn <= {QPP_STATS_K}
)
SELECT query_id,
       CAST(min(d_e4) AS BIGINT) AS d_best_e4,
       CAST(max(d_e4) AS BIGINT) AS d_kth_e4,
       CAST(sum(d_e4) // count(*) AS BIGINT) AS d_mean_e4,
       CAST(max(d_e4) - min(d_e4) AS BIGINT) AS spread_e4,
       CAST((max(d_e4) - min(d_e4)) * 1000000 // greatest(max(d_e4), 1) AS BIGINT)
         AS spread_ppm
FROM topk
GROUP BY query_id
ORDER BY query_id
"""


@register("ann_qpp_stats", _qpp_stats_oracle())
def ann_qpp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised query-performance-prediction statistics per query
    (B181): best/k-th/mean distance and absolute+relative spread over the
    exact top-k list — the ambiguity signal that routes queries to
    heavier re-ranking."""
    from vectordb_hr_data_spark.operators.knn import local_topk_per_key

    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), _ROUND).alias("distance"),
        )
    )
    partial = local_topk_per_key(
        scored, key_col="query_id", order_cols=("distance", "vec_id"), k=QPP_STATS_K
    )
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("vec_id").asc())
    topk = (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QPP_STATS_K)
        .select(
            "query_id",
            F.round(F.col("distance") * 10000).cast("long").alias("d_e4"),
        )
    )
    return (
        topk.groupBy("query_id")
        .agg(
            F.min("d_e4").cast("long").alias("d_best_e4"),
            F.max("d_e4").cast("long").alias("d_kth_e4"),
            F.expr("sum(d_e4) div count(*)").cast("long").alias("d_mean_e4"),
            (F.max("d_e4") - F.min("d_e4")).cast("long").alias("spread_e4"),
            F.expr(
                "(max(d_e4) - min(d_e4)) * 1000000 div greatest(max(d_e4), 1)"
            )
            .cast("long")
            .alias("spread_ppm"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# B198: multimodal payload-integrity audit (verify-on-read for blobs)
# --------------------------------------------------------------------------
# Binary media moves through object stores, caches, and shuffles that
# text never survives unverified — every serious blob pipeline stores a
# checksum WITH the payload and verifies on read. This audit runs that
# verification at corpus scale: recompute each payload's md5 and compare
# to its stored manifest checksum, reporting per modality the corrupt
# count, rate, and byte volumes. The fixture synthesizes the manifest
# column deterministically WITH an injected fault class (every 37th
# doc's stored checksum is from a truncated payload — simulated partial
# write), so the audit provably catches what it claims to. Map-side
# regex-free string arithmetic only; one bounded groupBy(modality).
@register(
    "multimodal_payload_integrity",
    """
WITH m AS (
  SELECT doc_id, lang AS modality_tag,
         octet_length(CAST(text AS BLOB)) AS payload_bytes,
         md5(text) AS actual_md5,
         CASE WHEN doc_id % 37 = 0 THEN md5(substr(text, 1, greatest(len(text) - 1, 0)))
              ELSE md5(text) END AS stored_md5
  FROM documents
)
SELECT modality_tag,
       CAST(count(*) AS BIGINT) AS n_payloads,
       CAST(sum(payload_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(CASE WHEN actual_md5 <> stored_md5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corrupt,
       CAST(sum(CASE WHEN actual_md5 <> stored_md5 THEN payload_bytes ELSE 0 END) AS BIGINT)
         AS corrupt_bytes,
       CAST(sum(CASE WHEN actual_md5 <> stored_md5 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS corrupt_ppm
FROM m
GROUP BY modality_tag
ORDER BY modality_tag
""",
)
def multimodal_payload_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recompute-and-compare checksum verification over the binary payload
    column (B198): per modality, corrupt counts/bytes/rates against the
    stored manifest checksum, with an injected truncated-write fault
    class proving the audit catches real corruption."""
    d = read_table(spark, sf_dir, "documents")
    stored = F.when(
        F.col("doc_id") % 37 == 0,
        F.md5(F.expr("substring(text, 1, greatest(length(text) - 1, 0))")),
    ).otherwise(F.md5("text"))
    m = d.select(
        F.col("lang").alias("modality_tag"),
        F.length(F.col("text").cast("binary")).cast("long").alias("payload_bytes"),
        F.md5("text").alias("actual_md5"),
        stored.alias("stored_md5"),
    )
    bad = F.col("actual_md5") != F.col("stored_md5")
    return (
        m.groupBy("modality_tag")
        .agg(
            F.count("*").cast("long").alias("n_payloads"),
            F.sum("payload_bytes").cast("long").alias("total_bytes"),
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_corrupt"),
            F.sum(F.when(bad, F.col("payload_bytes")).otherwise(0))
            .cast("long")
            .alias("corrupt_bytes"),
            F.expr(
                "sum(CASE WHEN actual_md5 <> stored_md5 THEN 1 ELSE 0 END) * 1000000"
                " div count(*)"
            )
            .cast("long")
            .alias("corrupt_ppm"),
        )
        .orderBy("modality_tag")
    )


# --------------------------------------------------------------------------
# B201: IVF nprobe-recall curve (the tuning readout behind B25/B104)
# --------------------------------------------------------------------------
# B104 checks recall at THE configured probe count; tuning needs the
# CURVE — recall@10 as nprobe sweeps 1..8 — because the knee of that
# curve IS the nprobe decision (faiss's standard tuning plot). One
# scored pass at the maximum probe depth tagged with each cell's probe
# rank, exploded over the nprobe grid and re-ranked per (query, nprobe);
# the exact side is computed once and shared. Emits per nprobe the
# mean/min recall across the query batch — the two numbers that pick
# the operating point (average quality and worst-case query).
NPROBE_GRID = [1, 2, 4, 8]


def _nprobe_curve_oracle() -> str:
    grid = ", ".join(f"({p})" for p in NPROBE_GRID)
    return f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {EVAL_QUERIES}
),
cent AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
grid(np) AS (VALUES {grid}),
exact AS (
  SELECT qs.query_id, e.vec_id,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY round({_l2sq_ddb('e.embedding', 'qs.qv')}, {_ROUND}), e.vec_id) AS rn
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id != qs.query_id
),
assigned AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_l2sq_ddb('e.embedding', 'c.cvec')}, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c
),
probe AS (
  SELECT qs.query_id, c.cid,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY {_l2sq_ddb('c.cvec', 'qs.qv')}, c.cid) AS prn
  FROM cent c CROSS JOIN qs
),
approx AS (
  SELECT g.np, p.query_id, a.vec_id,
         row_number() OVER (PARTITION BY g.np, p.query_id
                            ORDER BY round({_l2sq_ddb('a.embedding', 'qs.qv')}, {_ROUND}), a.vec_id) AS rn
  FROM assigned a
  JOIN probe p ON a.cid = p.cid
  JOIN grid g ON p.prn <= g.np
  JOIN qs ON qs.query_id = p.query_id
  WHERE a.rn = 1 AND a.vec_id != p.query_id
),
hits AS (
  SELECT a.np, x.query_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM (SELECT query_id, vec_id FROM exact WHERE rn <= {EVAL_K}) x
  JOIN (SELECT np, query_id, vec_id FROM approx WHERE rn <= {EVAL_K}) a
    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
  GROUP BY a.np, x.query_id
),
filled AS (
  SELECT g.np, q.query_id, coalesce(h.n_hits, 0) AS n_hits
  FROM grid g CROSS JOIN qs q
  LEFT JOIN hits h ON h.np = g.np AND h.query_id = q.query_id
)
SELECT CAST(np AS BIGINT) AS nprobe,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(n_hits) * 1000 // (count(*) * {EVAL_K}) AS BIGINT) AS mean_recall_milli,
       CAST(min(n_hits) * 1000 // {EVAL_K} AS BIGINT) AS min_recall_milli
FROM filled
GROUP BY np
ORDER BY nprobe
"""


@register("ivf_nprobe_recall_curve", _nprobe_curve_oracle())
def ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 vs nprobe over the query batch (B201) — the tuning curve
    whose knee picks the probe count; one scored pass at max depth,
    exploded over the grid, exact side shared. Result memoized per
    process (operators.memo) so compositions (B238) read a table."""
    from ..operators.memo import memo_table

    return memo_table(
        spark, sf_dir, "ivf_curve", lambda: _ivf_nprobe_curve_compute(spark, sf_dir)
    ).orderBy("nprobe")


def _ivf_nprobe_curve_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivf import ivf_assign_gemm
    from ..operators.knn import local_topk_per_key

    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("vec_id").asc())
    scored_exact = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), _ROUND).alias("distance"),
        )
    )
    exact = (
        local_topk_per_key(
            scored_exact, key_col="query_id", order_cols=("distance", "vec_id"), k=EVAL_K
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EVAL_K)
        .select("query_id", "vec_id")
    )
    assigned = ivf_assign_gemm(emb, centroids)
    wq = Window.partitionBy("query_id").orderBy(F.col("cd").asc(), F.col("cid").asc())
    max_np = max(NPROBE_GRID)
    probe = (
        centroids.crossJoin(F.broadcast(qs))
        .select("query_id", "cid", V.l2sq(F.col("cvec"), F.col("qv")).alias("cd"))
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= max_np)
        .select("query_id", "cid", "prn")
    )
    grid = spark.createDataFrame([(p,) for p in NPROBE_GRID], "np int")
    scored_ivf = (
        assigned.join(F.broadcast(probe), "cid")
        .join(F.broadcast(qs), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "prn",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), _ROUND).alias("distance"),
        )
        .join(F.broadcast(grid), F.col("prn") <= F.col("np"))
    )
    wnp = Window.partitionBy("np", "query_id").orderBy(
        F.col("distance").asc(), F.col("vec_id").asc()
    )
    approx = (
        scored_ivf.withColumn("rn", F.row_number().over(wnp))
        .filter(F.col("rn") <= EVAL_K)
        .select("np", "query_id", "vec_id")
    )
    hits = (
        exact.join(approx, ["query_id", "vec_id"])
        .groupBy("np", "query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    full = (
        grid.crossJoin(qs.select("query_id"))
        .join(hits, ["np", "query_id"], "left")
        .select("np", "query_id", F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
    )
    return (
        full.groupBy("np")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.expr(f"sum(n_hits) * 1000 div (count(*) * {EVAL_K})")
            .cast("long")
            .alias("mean_recall_milli"),
            F.expr(f"min(n_hits) * 1000 div {EVAL_K}").cast("long").alias("min_recall_milli"),
        )
        .select(
            F.col("np").cast("long").alias("nprobe"),
            "n_queries",
            "mean_recall_milli",
            "min_recall_milli",
        )
        .orderBy("nprobe")
    )


# --------------------------------------------------------------------------
# B209: distance-metric agreement (cosine vs L2 top-k overlap)
# --------------------------------------------------------------------------
# "Which metric should this index use" has an empirical answer before it
# has a philosophical one: if cosine and L2 retrieve nearly the same
# top-k on YOUR embedding distribution (common when vectors are nearly
# norm-uniform), the cheaper/better-supported one wins; if they diverge,
# the choice is load-bearing and needs an eval. Per query: |top-10_cos
# ∩ top-10_l2| and the overlap in milli, plus the corpus mean. Both
# rankings come from the same one-pass broadcast-queries scan (two
# rounded distance columns, two local top-k reduces).
@register(
    "metric_agreement_topk",
    f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {EVAL_QUERIES}
),
scored AS (
  SELECT qs.query_id, e.vec_id,
         round({_l2sq_ddb('e.embedding', 'qs.qv')}, {_ROUND}) AS d_l2,
         round(1.0 - list_sum(list_transform(range(1, len(e.embedding)+1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qs.qv[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
                        i -> power(CAST(e.embedding[i] AS DOUBLE), 2))))
                  * sqrt(list_sum(list_transform(range(1, len(qs.qv)+1),
                        i -> power(CAST(qs.qv[i] AS DOUBLE), 2))))), {_ROUND}) AS d_cos
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id != qs.query_id
),
l2 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d_l2, vec_id) AS rn
    FROM scored
  ) WHERE rn <= {EVAL_K}
),
cos AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY d_cos, vec_id) AS rn
    FROM scored
  ) WHERE rn <= {EVAL_K}
)
SELECT q.query_id,
       CAST(coalesce(o.n_common, 0) AS BIGINT) AS n_common,
       CAST(coalesce(o.n_common, 0) * 1000 // {EVAL_K} AS BIGINT) AS overlap_milli
FROM qs q LEFT JOIN (
  SELECT l2.query_id, count(*) AS n_common
  FROM l2 JOIN cos ON cos.query_id = l2.query_id AND cos.vec_id = l2.vec_id
  GROUP BY l2.query_id
) o ON o.query_id = q.query_id
ORDER BY q.query_id
""",
)
def metric_agreement_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 overlap between cosine and L2 rankings per query (B209) —
    the empirical evidence behind the index's metric choice; one scored
    pass, two local top-k reduces."""
    from ..operators.knn import local_topk_per_key

    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.l2sq(F.col("embedding"), F.col("qv")), _ROUND).alias("d_l2"),
            F.round(1.0 - V.cosine_sim(F.col("embedding"), F.col("qv")), _ROUND).alias("d_cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("d_l2").asc(), F.col("vec_id").asc())
    wc = Window.partitionBy("query_id").orderBy(F.col("d_cos").asc(), F.col("vec_id").asc())
    l2 = (
        local_topk_per_key(scored, key_col="query_id", order_cols=("d_l2", "vec_id"), k=EVAL_K)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= EVAL_K)
        .select("query_id", "vec_id")
    )
    cos = (
        local_topk_per_key(scored, key_col="query_id", order_cols=("d_cos", "vec_id"), k=EVAL_K)
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= EVAL_K)
        .select("query_id", "vec_id")
    )
    common = l2.join(cos, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").alias("n_common")
    )
    return (
        qs.select("query_id")
        .join(common, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.expr(f"coalesce(n_common, 0) * 1000 div {EVAL_K}")
            .cast("long")
            .alias("overlap_milli"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# B235: link prediction over the kNN graph (Adamic-Adar) (r12)
# --------------------------------------------------------------------------
# The similarity graph's MISSING edges are a product: "you may also like"
# candidates, near-dup suspects below the kNN cut, weak-supervision pairs
# for contrastive training. The classic unsupervised scores (Liben-Nowell
# & Kleinberg, CIKM'03) rank non-adjacent pairs by their common
# neighborhood; Adamic-Adar weights each shared neighbor w by 1/ln(deg w)
# so promiscuous hubs certify less than selective nodes. Arithmetic
# contract: per-term round(10⁶/ln(d+1)) then INTEGER sum — order-free,
# bit-equal in both engines (the l-diversity ln-rounding precedent).
# Scale shape: candidate pairs come from ONE self-join of the undirected
# edge list on the shared middle node — volume Σ_w deg(w)², NEVER
# all-pairs — and the hub cap bounds the per-node fan-out: a middle node
# with deg > HUB_CAP is excluded (its AA term is the smallest by
# construction, and in production link prediction hub exclusion is the
# standard volume guard; both engines apply the same cap so exactness is
# by construction). Output: top-N new pairs, deterministic total order.
GRAPH_LINKPRED_HUB_CAP = 64
LINKPRED_TOPN = 50


def _linkpred_oracle() -> str:
    return f"""
WITH scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), de AS (
  SELECT src, dst FROM scored WHERE rn <= {PAGERANK_DEG}
), und AS (
  SELECT src, dst FROM de UNION SELECT dst, src FROM de
), deg AS (
  SELECT src AS w, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY src
), cand AS (
  SELECT a.src AS u, b.src AS v, g.d
  FROM und a JOIN und b ON a.dst = b.dst AND a.src < b.src
  JOIN deg g ON g.w = a.dst
  WHERE g.d <= {GRAPH_LINKPRED_HUB_CAP}
), pairs AS (
  SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(CAST(round(1000000.0 / ln(d + 1)) AS BIGINT)) AS BIGINT) AS aa_micro
  FROM cand GROUP BY u, v
)
SELECT u, v, n_common, aa_micro
FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.src = p.u AND e.dst = p.v)
ORDER BY aa_micro DESC, u, v
LIMIT {LINKPRED_TOPN}
"""


@register("graph_link_prediction", _linkpred_oracle())
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the mutual family's directed kNN
    edges (B235): symmetrize, self-join on the shared middle node
    (hub-capped), integer AA score, anti-join existing edges, exact
    top-N. Every join is keyed; the final order is a
    TakeOrderedAndProject."""
    emb = read_table(spark, sf_dir, "embeddings")
    de = _graph_dir_edges(sf_dir, emb, PAGERANK_DEG, "graph_link_prediction")
    und = (
        de.select("src", "dst")
        .unionByName(de.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy(F.col("src").alias("w")).agg(F.count("*").cast("long").alias("d"))
    a = und.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    b = und.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    cand = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .join(deg, "w")
        .filter(F.col("d") <= GRAPH_LINKPRED_HUB_CAP)
    )
    pairs = cand.groupBy("u", "v").agg(
        F.count("*").cast("long").alias("n_common"),
        F.sum(F.round(F.lit(1000000.0) / F.log(F.col("d") + 1)).cast("long"))
        .cast("long")
        .alias("aa_micro"),
    )
    newp = pairs.join(
        und, (pairs["u"] == und["src"]) & (pairs["v"] == und["dst"]), "left_anti"
    )
    return newp.orderBy(F.col("aa_micro").desc(), "u", "v").limit(LINKPRED_TOPN)


# --------------------------------------------------------------------------
# B238: ANN index advisor (r12) — the capstone over the tuning curves
# --------------------------------------------------------------------------
# The operational question the curve family (B201 IVF, B231 HNSW, B233
# multi-cell HNSW) exists to answer: "I need recall ≥ R — which index, at
# which probe depth?" The advisor unions the three measured curves and,
# per recall target, picks each family's MINIMAL nprobe whose mean
# recall@10 meets the target (families that never reach a target emit no
# row — an honest 'cannot serve this SLA' instead of a padded one). The
# oracle is the three registered curve oracles composed verbatim (the
# capstone discipline: every number in the advisor is a number an
# already-checked query produced). Scale: the inputs are |grid|-row
# frames; the advisor itself is arithmetic on a dozen rows. The Spark
# path reuses the builder functions — and therefore the persisted
# build-once indexes — so advising costs three curve reads, not three
# index builds.
ADVISOR_TARGETS_MILLI = (800, 900, 950)


def _index_advisor_oracle() -> str:
    from .vector_queries import HNSW_MULTI_ASSIGN, _hnsw_curve_oracle

    targets = ", ".join(f"({t})" for t in ADVISOR_TARGETS_MILLI)
    return f"""
WITH ivf_curve AS ({_nprobe_curve_oracle()}),
hnsw_curve AS ({_hnsw_curve_oracle()}),
mc_curve AS ({_hnsw_curve_oracle(assign_cells=HNSW_MULTI_ASSIGN)}),
unioned AS (
  SELECT 'ivf' AS family, nprobe, mean_recall_milli FROM ivf_curve
  UNION ALL
  SELECT 'hnsw' AS family, nprobe, mean_recall_milli FROM hnsw_curve
  UNION ALL
  SELECT 'hnsw_multicell' AS family, nprobe, mean_recall_milli FROM mc_curve
),
targets(target_milli) AS (VALUES {targets}),
feasible AS (
  SELECT t.target_milli, u.family, u.nprobe, u.mean_recall_milli
  FROM targets t JOIN unioned u ON u.mean_recall_milli >= t.target_milli
),
best AS (
  SELECT target_milli, family, CAST(min(nprobe) AS BIGINT) AS min_nprobe
  FROM feasible GROUP BY target_milli, family
)
SELECT CAST(b.target_milli AS BIGINT) AS target_milli, b.family AS family,
       b.min_nprobe,
       CAST(u.mean_recall_milli AS BIGINT) AS achieved_recall_milli
FROM best b JOIN unioned u ON u.family = b.family AND u.nprobe = b.min_nprobe
ORDER BY target_milli, family
"""


@register("ann_index_advisor", _index_advisor_oracle())
def ann_index_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index advisor (B238): per recall target, each family's minimal
    nprobe meeting it, from the three registered tuning curves (B201 /
    B231 / B233) — composed, not recomputed: the curve builders read
    their persisted indexes."""
    from .vector_queries import hnsw_multicell_recall_curve, hnsw_nprobe_recall_curve

    curves = (
        ivf_nprobe_recall_curve(spark, sf_dir)
        .select(F.lit("ivf").alias("family"), "nprobe", "mean_recall_milli")
        .unionByName(
            hnsw_nprobe_recall_curve(spark, sf_dir).select(
                F.lit("hnsw").alias("family"), "nprobe", "mean_recall_milli"
            )
        )
        .unionByName(
            hnsw_multicell_recall_curve(spark, sf_dir).select(
                F.lit("hnsw_multicell").alias("family"), "nprobe", "mean_recall_milli"
            )
        )
        .localCheckpoint(eager=True)
    )
    targets = spark.createDataFrame(
        [(t,) for t in ADVISOR_TARGETS_MILLI], "target_milli long"
    )
    feasible = F.broadcast(targets).crossJoin(curves).filter(
        F.col("mean_recall_milli") >= F.col("target_milli")
    )
    best = feasible.groupBy("target_milli", "family").agg(
        F.min("nprobe").cast("long").alias("min_nprobe")
    )
    achieved = curves.select(
        F.col("family").alias("ach_family"),
        F.col("nprobe").alias("ach_nprobe"),
        F.col("mean_recall_milli").cast("long").alias("achieved_recall_milli"),
    )
    return (
        best.join(
            achieved,
            (best["family"] == achieved["ach_family"])
            & (best["min_nprobe"] == achieved["ach_nprobe"]),
        )
        .select("target_milli", "family", "min_nprobe", "achieved_recall_milli")
        .orderBy("target_milli", "family")
    )


# --------------------------------------------------------------------------
# B240: community-quality gate — Newman modularity of the LP partition (r12)
# --------------------------------------------------------------------------
# B54 produces a partition; nothing yet says whether it's a GOOD one.
# Newman-Girvan modularity Q = Σ_c [e_c/m − (d_c/2m)²] is the standard
# gate (Q near 0 → the partition is no better than random wiring; the
# signal that triggers a re-cluster before anyone samples "diverse"
# batches from noise communities). Exact rational arithmetic: with
# twice-counted intra edges e2_c, twice-total m2 = 2m and degree sums
# d_c, Q = Σ_c (e2_c·m2 − d_c²) / m2² — one signed numerator, one floor
# division to ppm at the end, written FLOOR-parity on both engines
# (DuckDB // floors; Spark div truncates, so the Spark side uses the
# (a − pmod(a, b)) div b form — Q can be negative on anti-community
# partitions and truncation would diverge exactly there). 128-bit sums
# (decimal(38,0)/HUGEINT) since d_c² reaches (2m)². Scale: two keyed
# label joins over the edge list + community-sized aggregates; the LP
# labels and the edge build are the registered B54 artifacts.
@register(
    "graph_community_modularity",
    f"""
WITH RECURSIVE scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_COS_DDB.format(a='b.embedding', b='a.embedding')}, 4) DESC,
                                     b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
), dir AS (
  SELECT src, dst FROM scored WHERE rn <= {LP_DEG}
), edges AS (
  SELECT src, dst, 1 AS w FROM (SELECT src, dst FROM dir UNION SELECT dst, src FROM dir)
  UNION ALL
  SELECT vec_id, vec_id, 0 FROM embeddings
), lp AS (
  SELECT 0 AS iter, vec_id AS node, CAST(vec_id AS BIGINT) AS lab FROM embeddings
  UNION ALL
  SELECT iter1, dst, CAST({_LP_ENC - 1} - (max(enc) % {_LP_ENC}) AS BIGINT)
  FROM (
    SELECT p.iter + 1 AS iter1, e.dst, p.lab,
           sum(e.w) * {_LP_ENC} + ({_LP_ENC - 1} - p.lab) AS enc
    FROM lp p JOIN edges e ON e.src = p.node
    WHERE p.iter < {LP_ITERS}
    GROUP BY p.iter + 1, e.dst, p.lab
  ) agg
  GROUP BY iter1, dst
), labels AS (
  SELECT node AS vec_id, lab AS community_id FROM lp WHERE iter = {LP_ITERS}
), und AS (
  -- NOT a bare UNION: inside a WITH RECURSIVE list DuckDB treats a
  -- top-level UNION CTE as a recursive iteration and skips the
  -- cross-branch dedup (observed: 3000 rows instead of 1970)
  SELECT DISTINCT src, dst
  FROM (SELECT src, dst FROM dir UNION ALL SELECT dst, src FROM dir) t
), m2t AS (
  SELECT CAST(count(*) AS BIGINT) AS m2 FROM und
), deg AS (
  SELECT src AS v, CAST(count(*) AS BIGINT) AS dv FROM und GROUP BY src
), intra AS (
  SELECT la.community_id AS c, CAST(count(*) AS BIGINT) AS e2
  FROM und u
  JOIN labels la ON la.vec_id = u.src
  JOIN labels lb ON lb.vec_id = u.dst
  WHERE la.community_id = lb.community_id
  GROUP BY la.community_id
), degsum AS (
  SELECT l.community_id AS c, CAST(sum(d.dv) AS BIGINT) AS dc
  FROM labels l JOIN deg d ON d.v = l.vec_id
  GROUP BY l.community_id
), comm AS (
  SELECT ds.c, COALESCE(i.e2, 0) AS e2, ds.dc
  FROM degsum ds LEFT JOIN intra i ON i.c = ds.c
), num AS (
  SELECT CAST(sum(CAST(e2 AS HUGEINT) * m.m2 - CAST(dc AS HUGEINT) * dc) AS HUGEINT) AS n
  FROM comm CROSS JOIN m2t m
)
SELECT CAST((SELECT count(*) FROM labels) AS BIGINT) AS n_nodes,
       CAST(m.m2 // 2 AS BIGINT) AS n_edges,
       CAST((SELECT count(DISTINCT community_id) FROM labels) AS BIGINT) AS n_communities,
       CAST((num.n * 1000000) // (CAST(m.m2 AS HUGEINT) * m.m2) AS BIGINT) AS q_ppm
FROM num CROSS JOIN m2t m
""",
)
def graph_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the B54 label-propagation partition (B240):
    exact integer Q in ppm over the shared edge build — the
    partition-quality gate beside the partition itself."""
    emb = read_table(spark, sf_dir, "embeddings")
    labels = doc_label_communities(spark, sf_dir).localCheckpoint(eager=True)
    de = _graph_dir_edges(sf_dir, emb, LP_DEG, "graph_community_modularity")
    und = (
        de.select("src", "dst")
        .unionByName(de.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m2 = und.count()
    n_nodes = labels.count()
    n_comm = labels.select("community_id").distinct().count()
    la = labels.select(F.col("vec_id").alias("src"), F.col("community_id").alias("ca"))
    lb = labels.select(F.col("vec_id").alias("dst"), F.col("community_id").alias("cb"))
    intra = (
        und.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count("*").cast("long").alias("e2"))
    )
    deg = und.groupBy(F.col("src").alias("v")).agg(F.count("*").cast("long").alias("dv"))
    degsum = (
        labels.join(deg, labels["vec_id"] == deg["v"])
        .groupBy(F.col("community_id").alias("c"))
        .agg(F.sum("dv").cast("long").alias("dc"))
    )
    comm = degsum.join(intra, "c", "left").select(
        "c", F.coalesce(F.col("e2"), F.lit(0)).cast("long").alias("e2"), "dc"
    )
    num_row = comm.agg(
        F.sum(
            F.col("e2").cast("decimal(38,0)") * F.lit(m2)
            - F.col("dc").cast("decimal(38,0)") * F.col("dc")
        ).alias("n")
    )
    return num_row.select(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(m2 // 2).cast("long").alias("n_edges"),
        F.lit(n_comm).cast("long").alias("n_communities"),
        F.expr(
            f"cast((n * 1000000 - pmod(n * 1000000, cast({m2} as decimal(38,0)) * {m2}))"
            f" div (cast({m2} as decimal(38,0)) * {m2}) as bigint)"
        ).alias("q_ppm"),
    )


# --------------------------------------------------------------------------
# B241: contrastive training-pair export (r12) — the capstone artifact an
# embedding trainer actually consumes
# --------------------------------------------------------------------------
# Contrastive fine-tuning (InfoNCE / triplet) needs (anchor, positive,
# hard negative) triplets. The pipeline already mines both halves: the
# positive is the anchor's nearest neighbor (the near-dup signal the
# dedup family thresholds), the negatives are B41's hard negatives —
# highest-cosine candidates BELOW the near-dup band, exactly the
# "confusable but not duplicate" rows a trainer wants. The export JOINS
# the two registered shapes per anchor and emits the triplet table with
# integer-milli cosines and the pos-vs-neg margin (the signal that
# flags label noise: a margin near zero means the 'positive' is barely
# closer than a known negative — triage before training, not after).
# Scale: both halves are the broadcast-query scored pass with local
# top-k pre-reduce; the join is per-anchor, K_neg rows each.
TRIPLET_N_NEG = 3


@register(
    "contrastive_pair_export",
    f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {HARDNEG_N_QUERIES}
), scored AS (
  SELECT qs.query_id, e.vec_id,
         round({_COS_DDB.format(a='e.embedding', b='qs.qv')}, 4) AS cosine
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id != qs.query_id
), pos AS (
  SELECT query_id, vec_id AS positive_id, cosine AS pos_cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
), negs AS (
  SELECT query_id, vec_id AS negative_id, cosine AS neg_cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored WHERE cosine < {HARDNEG_DUP_COSINE}
)
SELECT p.query_id AS anchor_id, p.positive_id, n.negative_id,
       CAST(n.rn AS BIGINT) AS neg_rank,
       CAST(round(p.pos_cos * 1000) AS BIGINT) AS pos_cos_milli,
       CAST(round(n.neg_cos * 1000) AS BIGINT) AS neg_cos_milli,
       CAST(round(p.pos_cos * 1000) - round(n.neg_cos * 1000) AS BIGINT) AS margin_milli
FROM pos p JOIN negs n ON n.query_id = p.query_id
WHERE p.rn = 1 AND n.rn <= {TRIPLET_N_NEG}
ORDER BY anchor_id, neg_rank
""",
)
def contrastive_pair_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet export (B241): per anchor, the top-1 neighbor
    as positive joined with B41's top hard negatives, with integer-milli
    cosines and the pos-neg margin — the training-pair artifact plus its
    built-in label-noise triage column."""
    from ..operators.knn import local_topk_per_key

    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < HARDNEG_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(V.cosine_sim(F.col("embedding"), F.col("qv")), 4).alias("cosine"),
        )
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    pos = (
        local_topk_per_key(
            scored, key_col="query_id", order_cols=("cosine", "vec_id"), k=1,
            ascending=(False, True),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("positive_id"),
            F.col("cosine").alias("pos_cos"),
        )
    )
    negs = (
        local_topk_per_key(
            scored.filter(F.col("cosine") < HARDNEG_DUP_COSINE),
            key_col="query_id", order_cols=("cosine", "vec_id"), k=TRIPLET_N_NEG,
            ascending=(False, True),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TRIPLET_N_NEG)
        .select(
            "query_id",
            F.col("vec_id").alias("negative_id"),
            F.col("cosine").alias("neg_cos"),
            F.col("rn").cast("long").alias("neg_rank"),
        )
    )
    return (
        pos.join(negs, "query_id")
        .select(
            F.col("query_id").alias("anchor_id"),
            "positive_id",
            "negative_id",
            "neg_rank",
            F.round(F.col("pos_cos") * 1000).cast("long").alias("pos_cos_milli"),
            F.round(F.col("neg_cos") * 1000).cast("long").alias("neg_cos_milli"),
            (F.round(F.col("pos_cos") * 1000) - F.round(F.col("neg_cos") * 1000))
            .cast("long")
            .alias("margin_milli"),
        )
        .orderBy("anchor_id", "neg_rank")
    )


# ---------------------------------------------------------------------------
# B279: audio-style frame/hop windowing over an opaque sample stream (r13)
# ---------------------------------------------------------------------------
# The multimodal family (B8/B57/B198) treats payloads as opaque binary +
# typed metadata; the missing DSP primitive is FRAMING — the w-sample
# window sliding by hop samples that every audio feature (RMS energy,
# MFCC, VAD) starts from. The Spark-side shape is the real contract
# (per-doc bounded frame explode + a within-doc range join, never a
# corpus-wide window); the sample decode is the documented deterministic
# stand-in (code points of the text payload — the multimodal_* decode
# seam, since audio codecs aren't in this container). Per frame: sample
# count, integer-exact micro RMS (sqrt of the exact Σcode² mean), and
# peak — the loudness ladder a silence-trim or VAD gate reads. Frames
# per doc are capped (first 8) so the output is a bounded per-doc
# ledger, the B57 frame-sample discipline. Scale: explode ≤ 288
# positions + ≤ 8 frames per doc, join keyed on doc_id — co-partitioned,
# no shuffle wider than the doc key.
_FRAME_W = 64
_FRAME_HOP = 32
_FRAME_MAX = 8


@register(
    "multimodal_audio_frame_rms",
    f"""
WITH pos AS (
  SELECT doc_id, CAST(i AS INT) AS p,
         CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS code
  FROM documents, unnest(range(1, least(length(text), {_FRAME_W + (_FRAME_MAX - 1) * _FRAME_HOP}) + 1)) AS t(i)
  WHERE length(text) > 0
), fr AS (
  SELECT doc_id, CAST(f AS INT) AS frame_idx
  FROM documents,
       unnest(range(0, least(greatest((length(text) - {_FRAME_W}) // {_FRAME_HOP} + 1, 1), {_FRAME_MAX}))) AS t(f)
  WHERE length(text) > 0
)
SELECT fr.doc_id, CAST(fr.frame_idx AS BIGINT) AS frame_idx,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(floor(sqrt(sum(pos.code * pos.code) * 1.0 / count(*)) * 1000000 + 0.5) AS BIGINT)
         AS rms_micro,
       CAST(max(pos.code) AS BIGINT) AS peak_code
FROM fr JOIN pos ON pos.doc_id = fr.doc_id
          AND pos.p >= fr.frame_idx * {_FRAME_HOP} + 1
          AND pos.p <= fr.frame_idx * {_FRAME_HOP} + {_FRAME_W}
GROUP BY fr.doc_id, fr.frame_idx
ORDER BY fr.doc_id, frame_idx
""",
)
def multimodal_audio_frame_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/hop windowed RMS + peak over the deterministic sample
    stand-in (B279) — the bounded per-doc framing explode every audio
    feature extractor starts from."""
    # empty text guard: Spark sequence(1, 0) yields a DESCENDING [1, 0]
    # (default step -1) where the DuckDB range() is empty — filter both
    # engines so empty docs emit no frames (ADVICE r13)
    d = read_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    pos = d.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(1, least(length(text), {_FRAME_W + (_FRAME_MAX - 1) * _FRAME_HOP}))")
        ).alias("p"),
        "text",
    ).select(
        "doc_id", "p", F.expr("cast(ascii(substring(text, p, 1)) as bigint)").alias("code")
    )
    fr = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"sequence(0, least(greatest((length(text) - {_FRAME_W}) div {_FRAME_HOP} + 1, 1),"
                f" {_FRAME_MAX}) - 1)"
            )
        ).alias("frame_idx"),
    )
    return (
        fr.join(
            pos,
            (fr["doc_id"] == pos["doc_id"])
            & (F.col("p") >= F.col("frame_idx") * _FRAME_HOP + 1)
            & (F.col("p") <= F.col("frame_idx") * _FRAME_HOP + _FRAME_W),
        )
        .groupBy(fr["doc_id"].alias("doc_id"), "frame_idx")
        .agg(
            F.count("*").cast("long").alias("n_samples"),
            F.expr("cast(floor(sqrt(sum(code * code) * 1.0 / count(*)) * 1000000 + 0.5) as bigint)")
            .alias("rms_micro"),
            F.max("code").cast("long").alias("peak_code"),
        )
        .select(
            "doc_id", F.col("frame_idx").cast("long").alias("frame_idx"),
            "n_samples", "rms_micro", "peak_code",
        )
        .orderBy("doc_id", "frame_idx")
    )


# --------------------------------------------------------------------------
# B299: ViT patch-grid plan over image metadata (r14)
# --------------------------------------------------------------------------
# The image twin of the span-corruption plan (B292) and the audio frame
# grid (B280): before a vision encoder sees a byte, the PLAN — resize,
# pad-to-patch-multiple, token count — is pure integer arithmetic over
# typed metadata, and it decides the GPU bill. Per image (dims
# synthesized deterministically from doc_id — the B8 opaque-payload
# discipline; real decoders stay stubbed per environment): scale the
# long side to ≤ 896 px (integer floor division, aspect preserved),
# round each side UP to the 14-px patch grid, report the patch counts,
# the token count, and the padding waste ppm the round-up costs. The
# budget theorem (pytest): the plan never exceeds ⌈896/14⌉² = 4096
# patches. Scale: map-only — one projection, no shuffle at all.
_PATCH_PX = 14
_PATCH_MAX_SIDE = 896


@register(
    "multimodal_patch_plan",
    f"""
WITH dims AS (
  SELECT doc_id,
         CAST(320 + {H.ddb_str_hash_fast("'w:' || CAST(doc_id AS VARCHAR)")} % 1600 AS BIGINT)
           AS width,
         CAST(240 + {H.ddb_str_hash_fast("'h:' || CAST(doc_id AS VARCHAR)")} % 1080 AS BIGINT)
           AS height
  FROM documents
), t AS (
  SELECT doc_id, width, height,
         CASE WHEN greatest(width, height) > {_PATCH_MAX_SIDE}
              THEN (width * {_PATCH_MAX_SIDE}) // greatest(width, height)
              ELSE width END AS tw,
         CASE WHEN greatest(width, height) > {_PATCH_MAX_SIDE}
              THEN (height * {_PATCH_MAX_SIDE}) // greatest(width, height)
              ELSE height END AS th
  FROM dims
), g AS (
  SELECT doc_id, width, height, tw, th,
         (tw + {_PATCH_PX - 1}) // {_PATCH_PX} AS px,
         (th + {_PATCH_PX - 1}) // {_PATCH_PX} AS py
  FROM t
)
SELECT doc_id, width, height,
       CAST(tw AS BIGINT) AS target_w, CAST(th AS BIGINT) AS target_h,
       CAST(px AS BIGINT) AS patches_x, CAST(py AS BIGINT) AS patches_y,
       CAST(px * py AS BIGINT) AS n_patches,
       CAST((px * {_PATCH_PX} * py * {_PATCH_PX} - tw * th) * 1000000
            // (px * {_PATCH_PX} * py * {_PATCH_PX}) AS BIGINT) AS pad_waste_ppm
FROM g
ORDER BY doc_id
""",
)
def multimodal_patch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch-grid plan (B299): aspect-preserving integer resize
    to the 896-px long side, pad-up to the 14-px grid, token count and
    padding-waste ppm — map-only over typed image metadata."""
    d = read_table(spark, sf_dir, "documents")
    wh = d.select(
        "doc_id",
        F.expr(
            f"CAST(320 + {H.spark_str_hash_fast(chr(39) + 'w:' + chr(39) + ' || CAST(doc_id AS STRING)')} % 1600 AS BIGINT)"
        ).alias("width"),
        F.expr(
            f"CAST(240 + {H.spark_str_hash_fast(chr(39) + 'h:' + chr(39) + ' || CAST(doc_id AS STRING)')} % 1080 AS BIGINT)"
        ).alias("height"),
    )
    t = wh.select(
        "doc_id",
        "width",
        "height",
        F.expr(
            f"CASE WHEN greatest(width, height) > {_PATCH_MAX_SIDE}"
            f" THEN (width * {_PATCH_MAX_SIDE}) div greatest(width, height)"
            " ELSE width END"
        ).alias("tw"),
        F.expr(
            f"CASE WHEN greatest(width, height) > {_PATCH_MAX_SIDE}"
            f" THEN (height * {_PATCH_MAX_SIDE}) div greatest(width, height)"
            " ELSE height END"
        ).alias("th"),
    )
    g = t.select(
        "*",
        F.expr(f"(tw + {_PATCH_PX - 1}) div {_PATCH_PX}").alias("px"),
        F.expr(f"(th + {_PATCH_PX - 1}) div {_PATCH_PX}").alias("py"),
    )
    return g.select(
        "doc_id",
        "width",
        "height",
        F.col("tw").cast("long").alias("target_w"),
        F.col("th").cast("long").alias("target_h"),
        F.col("px").cast("long").alias("patches_x"),
        F.col("py").cast("long").alias("patches_y"),
        F.expr("px * py").cast("long").alias("n_patches"),
        F.expr(
            f"(px * {_PATCH_PX} * py * {_PATCH_PX} - tw * th) * 1000000"
            f" div (px * {_PATCH_PX} * py * {_PATCH_PX})"
        )
        .cast("long")
        .alias("pad_waste_ppm"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# B301: shot-boundary detection over frame signatures (r14)
# --------------------------------------------------------------------------
# The video twin of the audio frame grid (B280) and the patch plan
# (B299): real pipelines cut videos into SHOTS before sampling frames
# for captioning/embedding, and the standard cheap detector is a
# hamming-distance threshold between consecutive frame signatures
# (perceptual hashes). Frames are synthesized with PLANTED shot
# structure (every 8th frame hash starts a new shot; each shot carries a
# deterministic 64-bit signature split over two 32-bit hash columns), so
# two theorems hold and the pytest pins both: within a shot consecutive
# distances are exactly 0 (⇒ NO false boundaries, ever), and distinct
# shots differ by ~32 of 64 bits (⇒ a miss needs a ≤16-bit hash
# collision, odds ~1e-5 per cut). Per video: detected shot count, mean/
# max shot length, first cut. Scale: bounded per-video frame explode
# (≤120), windows PARTITION BY video only.
_SHOT_THR = 16


@register(
    "multimodal_shot_boundaries",
    f"""
WITH vids AS (
  SELECT doc_id,
         CAST(24 + {H.ddb_str_hash_fast("'nf:' || CAST(doc_id AS VARCHAR)")} % 96 AS BIGINT)
           AS n_frames
  FROM documents
), fr AS (
  SELECT v.doc_id, v.n_frames, CAST(f AS BIGINT) AS f,
         CASE WHEN f > 0 AND {H.ddb_str_hash_fast("'b:' || CAST(v.doc_id AS VARCHAR) || ':' || CAST(f AS VARCHAR)")} % 8 = 0
              THEN 1 ELSE 0 END AS cut
  FROM vids v, unnest(range(0, v.n_frames)) AS t(f)
), sh AS (
  SELECT doc_id, n_frames, f,
         CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY f
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS shot
  FROM fr
), sg AS (
  SELECT doc_id, n_frames, f,
         {H.ddb_str_hash_fast("'s1:' || CAST(doc_id AS VARCHAR) || ':' || CAST(shot AS VARCHAR)")} AS g1,
         {H.ddb_str_hash_fast("'s2:' || CAST(doc_id AS VARCHAR) || ':' || CAST(shot AS VARCHAR)")} AS g2
  FROM sh
), d AS (
  SELECT doc_id, n_frames, f,
         CASE WHEN f = 0 THEN 0
              WHEN bit_count(xor(g1, lag(g1) OVER (PARTITION BY doc_id ORDER BY f)))
                 + bit_count(xor(g2, lag(g2) OVER (PARTITION BY doc_id ORDER BY f)))
                 >= {_SHOT_THR} THEN 1 ELSE 0 END AS det
  FROM sg
), seg AS (
  SELECT doc_id, n_frames, f, det,
         CAST(sum(det) OVER (PARTITION BY doc_id ORDER BY f
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS dseg
  FROM d
), lens AS (
  SELECT doc_id, n_frames, dseg, CAST(count(*) AS BIGINT) AS seg_len
  FROM seg GROUP BY doc_id, n_frames, dseg
)
SELECT l.doc_id, l.n_frames,
       CAST(count(*) AS BIGINT) AS n_shots,
       CAST(l.n_frames * 1000 // count(*) AS BIGINT) AS mean_shot_len_milli,
       CAST(max(l.seg_len) AS BIGINT) AS max_shot_len,
       CAST(coalesce(fb.first_cut, -1) AS BIGINT) AS first_cut_frame
FROM lens l
LEFT JOIN (SELECT doc_id, min(f) AS first_cut FROM d WHERE det = 1 GROUP BY doc_id) fb
  ON fb.doc_id = l.doc_id
GROUP BY l.doc_id, l.n_frames, fb.first_cut
ORDER BY l.doc_id
""",
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-threshold shot-boundary detection over planted 64-bit
    frame signatures (B301): per video the detected shot count, mean/max
    shot length and first cut; windows partition by video only."""
    docs = read_table(spark, sf_dir, "documents")
    h = H.spark_str_hash_fast
    vids = docs.select(
        "doc_id",
        F.expr(
            f"CAST(24 + {h(chr(39) + 'nf:' + chr(39) + ' || CAST(doc_id AS STRING)')} % 96 AS BIGINT)"
        ).alias("n_frames"),
    )
    fr = vids.select(
        "doc_id",
        "n_frames",
        F.explode(F.expr("sequence(0, n_frames - 1)")).alias("f0"),
    ).select(
        "doc_id",
        "n_frames",
        F.col("f0").cast("long").alias("f"),
        F.expr(
            "CASE WHEN f0 > 0 AND "
            + h("'b:' || CAST(doc_id AS STRING) || ':' || CAST(f0 AS STRING)")
            + " % 8 = 0 THEN 1 ELSE 0 END"
        ).alias("cut"),
    )
    wseq = (
        Window.partitionBy("doc_id")
        .orderBy("f")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sh = fr.select(
        "doc_id", "n_frames", "f", F.sum("cut").over(wseq).cast("long").alias("shot")
    )
    sg = sh.select(
        "doc_id",
        "n_frames",
        "f",
        F.expr(h("'s1:' || CAST(doc_id AS STRING) || ':' || CAST(shot AS STRING)")).alias("g1"),
        F.expr(h("'s2:' || CAST(doc_id AS STRING) || ':' || CAST(shot AS STRING)")).alias("g2"),
    )
    wlag = Window.partitionBy("doc_id").orderBy("f")
    d = sg.select(
        "doc_id",
        "n_frames",
        "f",
        F.when(F.col("f") == 0, 0)
        .when(
            F.bit_count(F.expr("g1").bitwiseXOR(F.lag("g1").over(wlag)))
            + F.bit_count(F.expr("g2").bitwiseXOR(F.lag("g2").over(wlag)))
            >= _SHOT_THR,
            1,
        )
        .otherwise(0)
        .alias("det"),
    )
    seg = d.select(
        "doc_id", "n_frames", "f", "det", F.sum("det").over(wseq).cast("long").alias("dseg")
    )
    lens = seg.groupBy("doc_id", "n_frames", "dseg").agg(
        F.count("*").cast("long").alias("seg_len")
    )
    fb = d.filter(F.col("det") == 1).groupBy("doc_id").agg(F.min("f").alias("first_cut"))
    return (
        lens.groupBy("doc_id", "n_frames")
        .agg(
            F.count("*").cast("long").alias("n_shots"),
            F.expr("max(n_frames) * 1000 div count(*)").cast("long").alias(
                "mean_shot_len_milli"
            ),
            F.max("seg_len").cast("long").alias("max_shot_len"),
        )
        .join(fb, "doc_id", "left")
        .select(
            "doc_id",
            "n_frames",
            "n_shots",
            "mean_shot_len_milli",
            "max_shot_len",
            F.coalesce("first_cut", F.lit(-1)).cast("long").alias("first_cut_frame"),
        )
        .orderBy("doc_id")
    )
