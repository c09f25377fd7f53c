"""Text-analysis operators over ``documents`` (SURVEY.md §2.B B6 + the
training-data-pipeline text ops): token counting, language-ID heuristic,
quality scoring, content fingerprinting.

All are pure column expressions (whole-stage codegen, no UDF, no shuffle
except the final presentation sort) — at 100 TB these are map-only passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texthash as H
from ..io import read_table
from ..queries import register

# language marker tokens for the n-gram/stopword language-ID heuristic.
# (The synthetic corpus shares one vocabulary, so the heuristic's value here
# is determinism, not accuracy — the operator shape is what scales.)
LANG_MARKERS = {
    "en": ["the", "a", "value", "fast"],
    "fr": ["le", "la", "et", "un"],
    "es": ["el", "la", "y", "un"],
    "de": ["der", "die", "und", "ein"],
    "zh": ["de", "shi", "le", "he"],
}


@register(
    "doc_token_count",
    """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct_tokens,
       n_chars
FROM documents
ORDER BY doc_id
""",
)
def doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + distinct-token count (B6; generalizes the
    reference's query tokenizer, ``talent_recommender.py:108``)."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
            "n_chars",
        )
        .orderBy("doc_id")
    )


# BPE-style pretokenizer (ASCII form of the GPT-2 pattern, lookahead-free
# so RE2/Java regex agree byte-for-byte): runs of letters, runs of digits,
# runs of other non-space symbols. Whitespace separates, never tokenizes.
_BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"


@register(
    "doc_token_count_bpe",
    f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_PAT}'))) AS BIGINT) AS n_distinct_bpe,
       n_chars
FROM documents
ORDER BY doc_id
""",
)
def doc_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6's second tokenizer: a BPE-style pretokenization count (the
    letters/digits/symbol-runs split every GPT-family tokenizer applies
    before merges — the standard proxy for 'model tokens' when the real
    vocab isn't in the pipeline). Pure JVM regex over the scan, one narrow
    projection; the ASCII, lookahead-free pattern evaluates identically
    under Java regex and DuckDB's RE2, so counts are oracle-exact."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), F.lit(0))
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_bpe_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_bpe"),
            "n_chars",
        )
        .orderBy("doc_id")
    )


def _lang_score_spark(markers: list[str]) -> F.Column:
    toks = F.array_distinct(F.split(F.col("text"), " "))
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(toks, arr))


def _lang_id_oracle() -> str:
    score = lambda ms: (
        "len(list_intersect(list_distinct(string_split(text, ' ')), "
        + "[" + ", ".join(f"'{m}'" for m in ms) + "]))"
    )
    cases = " ".join(
        f"WHEN {score(ms)} >= GREATEST({', '.join(score(m2) for m2 in LANG_MARKERS.values())}) "
        f"AND {score(ms)} > 0 THEN '{lang}'"
        for lang, ms in LANG_MARKERS.items()
    )
    sel = ", ".join(f"{score(ms)} AS score_{lang}" for lang, ms in LANG_MARKERS.items())
    return f"""
SELECT doc_id, {sel},
       CASE {cases} ELSE 'unknown' END AS predicted_lang,
       lang
FROM documents
ORDER BY doc_id
"""


@register("doc_lang_id", _lang_id_oracle())
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic: score per language, first-wins
    argmax in declaration order (en, fr, es, de, zh), 'unknown' on all-zero."""
    d = read_table(spark, sf_dir, "documents")
    scores = {lang: _lang_score_spark(ms) for lang, ms in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in reversed(list(LANG_MARKERS)):  # build CASE chain, first lang wins
        pred = F.when((scores[lang] >= best) & (scores[lang] > 0), F.lit(lang)).otherwise(pred)
    return (
        d.select(
            "doc_id",
            *[scores[lang].cast("long").alias(f"score_{lang}") for lang in LANG_MARKERS],
            pred.alias("predicted_lang"),
            "lang",
        )
        .orderBy("doc_id")
    )


_STOPWORDS = ["the", "a", "of", "and"]


@register(
    "doc_quality_score",
    f"""
WITH t AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, n_chars,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         len(list_filter(toks, x -> list_contains({_STOPWORDS!r}, x))) AS n_stop,
         list_sum(list_transform(toks, x -> len(x))) AS sum_len
  FROM t
)
SELECT doc_id, n_tokens,
       round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
       round(CAST(sum_len AS DOUBLE) / n_tokens, 6) AS avg_token_len,
       round(0.4 * (CAST(n_distinct AS DOUBLE) / n_tokens)
           + 0.3 * least(n_tokens / 100.0, 1.0)
           + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens), 6) AS quality_score
FROM m
ORDER BY doc_id
""",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from length/diversity/stopword signals — the standard
    cheap pre-filter in LLM training-data pipelines."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    m = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).alias("n_stop"),
        F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, v: a + v).alias("sum_len"),
    )
    dr = F.col("n_distinct").cast("double") / F.col("n_tokens")
    sr = F.col("n_stop").cast("double") / F.col("n_tokens")
    return (
        m.select(
            "doc_id",
            "n_tokens",
            F.round(dr, 6).alias("distinct_ratio"),
            F.round(sr, 6).alias("stopword_ratio"),
            F.round(F.col("sum_len").cast("double") / F.col("n_tokens"), 6).alias("avg_token_len"),
            F.round(
                0.4 * dr + 0.3 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) + 0.3 * (1.0 - sr), 6
            ).alias("quality_score"),
        )
        .orderBy("doc_id")
    )


@register(
    "top_bigrams_per_lang",
    """
WITH t AS (
  SELECT lang, string_split(text, ' ') AS toks FROM documents
), grams AS (
  SELECT lang, unnest(list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
         i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])) AS bigram
  FROM t
), counted AS (
  SELECT lang, bigram, count(*) AS n FROM grams WHERE bigram IS NOT NULL GROUP BY lang, bigram
), ranked AS (
  SELECT lang, bigram, n, row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
  FROM counted
)
SELECT lang, bigram, n, rn FROM ranked WHERE rn <= 5
ORDER BY lang, rn
""",
)
def top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 n-gram analytics: explode word bigrams, count per (lang, bigram),
    top-5 per language via window rank. At scale the groupBy is a uniform
    hash shuffle with map-side partial counts; the window works on the
    already-tiny counted relation.

    Dialect note: Spark's try_element_at past the end yields NULL and
    concat_ws('x', NULL, NULL) = 'x'-joined non-nulls, while DuckDB's ||
    propagates NULL — so the last-position bigram is built with explicit
    concat semantics (NULL when either side is NULL) to agree with the
    oracle."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.split(F.col("text"), " ").alias("toks"))
    grams = toks.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 1, 1)),"
                " i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1)))"
            )
        ).alias("bigram"),
    ).filter(F.col("bigram").isNotNull())
    counted = grams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    # pre-reduce: each partition keeps its 5 best bigrams per lang before
    # the per-lang rank — with a handful of languages the window exchange
    # would otherwise funnel the whole counted relation into |langs|
    # partitions (the same skew cliff as the exact-rank sampler)
    from pyspark.sql import Window

    from ..operators.knn import local_topk_per_key

    partial = local_topk_per_key(counted, "lang", ("n", "bigram"), 5, ascending=(False, True))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        partial.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .orderBy("lang", "rn")
    )


@register(
    "doc_hash_split",
    """
WITH s AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
       count(*) AS n_docs,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM s
GROUP BY 1
ORDER BY split
""",
)
def doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test splitting by content-stable hash
    (80/10/10) — the reproducible-split primitive every training-data
    pipeline needs; rows never migrate between splits as the corpus grows
    because the bucket depends only on the row key."""
    d = read_table(spark, sf_dir, "documents")
    bucket = (
        F.expr("cast(conv(substring(md5(concat(cast(doc_id as string), ':split')), 1, 8), 16, 10) as bigint)")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test").alias("split")
    )
    return (
        d.select(split, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


TFIDF_TOPK = 3


@register(
    "doc_tfidf_top_terms",
    f"""
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tfc AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tf GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(*) AS df FROM tfc GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT t.doc_id, t.term, t.tf,
         round(t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)), 6) AS tfidf
  FROM tfc t JOIN dfc d USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, tfidf, rn FROM ranked WHERE rn <= {TFIDF_TOPK}
ORDER BY doc_id, rn
""",
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top terms per document as pure DataFrame algebra (the
    oracle-checkable twin of the MLlib pipeline in operators/textml.py,
    which stays registered rows-only as the feature-engineering path).

    idf = ln((N+1)/(df+1)) — MLlib's ``IDF`` formula — so the two paths
    rank identically. Scale shape: explode → per-(doc,term) count (uniform
    shuffle key with map-side partial counts) → per-term doc-freq (the term
    relation is vocabulary-sized, tiny) joined back BROADCAST → per-doc
    window for top-k. No driver-side vocabulary fit, no vector
    materialization, no size cap: where the MLlib path collects a
    vocabSize-bounded vocabulary to the driver, this never leaves the
    cluster — the better 100 TB form."""
    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    # pre-reduce map-side: each partition keeps its top-3 terms per doc
    # (pass-through of already-rounded scores), so the per-doc rank
    # exchanges ~k/terms-per-doc of the scored stream (r2 item 3 pattern)
    from ..operators.knn import local_topk_per_key

    partial = local_topk_per_key(
        scored, "doc_id", ("tfidf", "term"), TFIDF_TOPK, ascending=(False, True)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        partial.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TFIDF_TOPK)
        .orderBy("doc_id", "rn")
    )


@register(
    "doc_fingerprint",
    f"""
SELECT doc_id,
       md5(text) AS md5_fp,
       {H.ddb_str_hash('text')} AS poly_fp
FROM documents
ORDER BY doc_id
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 (exact-dedup key) + 31-polynomial rolling
    hash (engine-portable integer hash, basis of the MinHash family)."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5(F.col("text")).alias("md5_fp"),
            F.expr(H.spark_str_hash("text")).alias("poly_fp"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B33: bigram-LM perplexity quality filter (CCNet-style)
# ---------------------------------------------------------------------------
# CCNet (Wenzek et al. LREC'20) ranks web documents by the perplexity of a
# language model and keeps the low-perplexity head. Here the LM is an
# add-alpha-smoothed bigram model trained on the corpus itself (the
# distributed twin of its KenLM stage): training = two groupBy counts,
# scoring = a join from bigram instances back to the count tables.
LM_ALPHA = 0.5  # add-alpha smoothing


@register(
    "doc_lm_perplexity",
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), uni AS (
  SELECT count(DISTINCT u) AS v FROM (SELECT unnest(t) AS u FROM toks)
), bi AS (
  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS r(i)
), db AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS n_b FROM bi GROUP BY doc_id, w1, w2
), c2 AS (
  SELECT w1, w2, CAST(sum(n_b) AS BIGINT) AS c2 FROM db GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(sum(n_b) AS BIGINT) AS c1 FROM db GROUP BY w1
), scored AS (
  SELECT d.doc_id, d.n_b,
         CAST(round(-ln((c2.c2 + {LM_ALPHA}) / (c1.c1 + {LM_ALPHA} * uni.v)) * 1000000.0)
              AS BIGINT) AS nl
  FROM db d
  JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
  JOIN c1 ON c1.w1 = d.w1
  CROSS JOIN uni
)
SELECT doc_id, n_bigrams,
       ce_micro / 1000000.0 AS cross_entropy,
       round(exp(ce_micro / 1000000.0), 4) AS ppl
FROM (
  SELECT doc_id,
         CAST(sum(n_b) AS BIGINT) AS n_bigrams,
         CAST(round(sum(n_b * nl) * 1.0 / sum(n_b)) AS BIGINT) AS ce_micro
  FROM scored GROUP BY doc_id
)
ORDER BY doc_id
""",
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an add-alpha bigram LM trained on the
    corpus (the CCNet quality-filter signal, Wenzek et al. LREC'20).

    Determinism contract: each distinct bigram's -ln P is quantized ONCE
    to integer micro-nats (round(-ln p * 1e6)), so the per-document
    aggregation is an exact integer sum — order-independent across
    partitions and bit-identical between Spark and DuckDB regardless of
    how either engine schedules the group aggregation. Only the final
    cross-entropy/perplexity are floats, derived from the integer sums by
    the same expression on both engines.

    Scale shape: bigram instances reduce map-side to per-(doc, bigram)
    counts before any shuffle; the count tables c2/c1 are
    vocabulary-sized (broadcast here; for a web-scale vocabulary the same
    plan holds with a shuffle join on the uniform (w1, w2) key). Training
    and scoring are the same two passes at any corpus size — no driver
    state, unlike a KenLM fit. Documents with fewer than 2 tokens have no
    bigrams and drop out (both engines)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN"
                " transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
                " ELSE array() END"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    # db feeds THREE consumers (c2, c1, the scored join); an eager
    # localCheckpoint here was MEASURED SLOWER at sf0.1 (1.47 -> 2.05 s:
    # the per-(doc, bigram) table is corpus-sized, so materializing it
    # costs more than the duplicated explode) — unlike the dsir twin,
    # whose per-(doc, BUCKET) table is 4096-bounded per doc and does
    # benefit. Left uncut deliberately (r14 opt note).
    db = bi.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n_b"))
    c2 = db.groupBy("w1", "w2").agg(F.sum("n_b").alias("c2"))
    c1 = db.groupBy("w1").agg(F.sum("n_b").alias("c1"))
    v = (
        toks.select(F.explode("t").alias("u"))
        .agg(F.countDistinct("u").alias("v"))
    )
    p = (F.col("c2") + LM_ALPHA) / (F.col("c1") + LM_ALPHA * F.col("v"))
    scored = (
        db.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), ["w1"])
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "n_b",
            F.round(-F.log(p) * 1000000.0, 0).cast("long").alias("nl"),
        )
    )
    # per-doc cross-entropy is itself quantized to integer micro-nats
    # (round-to-INTEGER is midpoint-consistent across engines because no
    # scaling multiply is involved); the display float is derived by an
    # exact division, never by rounding a float — the same terminating-
    # decimal midpoint hazard doc_quality_classifier documents
    ce_micro = F.round(
        F.sum(F.col("n_b") * F.col("nl")) * 1.0 / F.sum("n_b"), 0
    ).cast("long")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("n_b").cast("long").alias("n_bigrams"),
            ce_micro.alias("ce_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("ce_micro") / 1000000.0).alias("cross_entropy"),
            F.round(F.exp(F.col("ce_micro") / 1000000.0), 4).alias("ppl"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B35: hashing-trick linear quality classifier (fastText-style scoring)
# ---------------------------------------------------------------------------
# GPT-3/CCNet-style corpora keep documents a linear classifier scores as
# "high quality". This operator is the SCORING side of that filter as pure
# DataFrame algebra: bag-of-words → hashing trick into a fixed bucket
# space (Weinberger et al. ICML'09) → dot product with a weight vector →
# sigmoid. The weights here are derived deterministically from the bucket
# id (a seeded stand-in for trained parameters, same plumbing either way:
# a trained model would broadcast a D-sized weight array instead).
CLF_BUCKETS = 4096
CLF_W_SCALE = 1000  # weights are integers in [-1000, 1000] (milli-units)


def _clf_weight_ddb(bucket_sql: str) -> str:
    h = H.ddb_str_hash_fast(f"'w:' || CAST({bucket_sql} AS VARCHAR)")
    return f"(({h}) % {2 * CLF_W_SCALE + 1}) - {CLF_W_SCALE}"


def _clf_weight_spark(bucket_sql: str) -> str:
    h = H.spark_str_hash_fast(f"concat('w:', cast({bucket_sql} as string))")
    return f"(({h}) % {2 * CLF_W_SCALE + 1}) - {CLF_W_SCALE}"


@register(
    "doc_quality_classifier",
    f"""
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), dtf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n FROM tf GROUP BY doc_id, t
), wt AS (
  SELECT doc_id, n,
         {_clf_weight_ddb(H.ddb_str_hash_fast('t') + f" % {CLF_BUCKETS}")} AS wi
  FROM dtf
), agg AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens, CAST(sum(n * wi) AS BIGINT) AS s
  FROM wt GROUP BY doc_id
)
SELECT doc_id, n_tokens, s AS dot_milli,
       round(1.0 / (1.0 + exp(-(s / {CLF_W_SCALE}.0 / n_tokens))), 4) AS score,
       s > 0 AS keep
FROM agg
ORDER BY doc_id
""",
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality score per document: mean hashed-bucket weight
    over token instances, squashed by a sigmoid; ``keep`` is the
    score > 0.5 verdict.

    Determinism contract: weights are INTEGERS (milli-units), so the
    per-document dot product is an exact integer sum — order-independent
    and engine-portable; only the final sigmoid score is a float derived
    from it. The keep verdict compares the integer sum against zero
    (exactly score > 0.5), never a float against a threshold.

    Scale shape: explode → map-side-reduced per-(doc, token) counts →
    per-row weight arithmetic (md5 + conv, whole-stage codegen) → one
    groupBy on the uniform doc_id key. No weight table is materialized
    because weights derive from the bucket id; a trained model swaps in a
    broadcast D-sized array lookup — same plan otherwise."""
    d = read_table(spark, sf_dir, "documents")
    dtf = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("n"))
    )
    bucket = f"({H.spark_str_hash_fast('t')}) % {CLF_BUCKETS}"
    wt = dtf.select("doc_id", "n", F.expr(_clf_weight_spark(bucket)).alias("wi"))
    agg = wt.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.col("n") * F.col("wi")).cast("long").alias("s"),
    )
    logit = F.col("s") / float(CLF_W_SCALE) / F.col("n_tokens")
    return agg.select(
        "doc_id",
        "n_tokens",
        # the raw integer dot product, NOT a rounded logit: s/(1000*n) can
        # terminate exactly on a round-6 midpoint (e.g. 1037/16000 =
        # 0.0648125), where Java's repr-based HALF_UP and DuckDB's
        # multiply-based round legitimately disagree — integers can't
        F.col("s").alias("dot_milli"),
        F.round(1.0 / (1.0 + F.exp(-logit)), 4).alias("score"),
        (F.col("s") > 0).alias("keep"),
    ).orderBy("doc_id")


@register("doc_lm_perplexity_threshold", None)
def doc_lm_perplexity_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the perplexity gate (the threshold variant
    SCALE.md prescribes where `quality_prep_pipeline` uses an exact rank):
    instead of a global row_number window (one task sorts every doc), the
    cut point is ``approx_percentile(ce_micro, 0.75)`` — a sketch
    aggregate with map-side partials — and the gate is a map-only filter
    against that broadcast scalar. Rows-only registry entry
    (approx_percentile's sketch is engine-specific); the pytest bounds
    its disagreement with the exact rank cut."""
    d = read_table(spark, sf_dir, "documents")
    lm = doc_lm_perplexity(spark, sf_dir).select(
        "doc_id",
        # recover the exact integer micro-nats from the display float:
        # (ce/1e6)*1e6 is within an ulp of the integer but not equal to
        # it, and a bare long cast truncates toward zero — round first so
        # the reconstruction is exact (ADVICE r6)
        F.round(F.col("cross_entropy") * 1000000.0, 0).cast("long").alias("ce_micro"),
    ).localCheckpoint(eager=True)
    # ^ the PER-DOC score table (|docs| rows of two ints) feeds both the
    # cut aggregate and the gate filter — without the cut the entire
    # bigram-LM chain (corpus explode + three count branches) executed
    # twice (38 exchanges / 16 scans in the r14-before plan). Unlike the
    # per-(doc, bigram) table (measured slower to checkpoint), this one
    # is reduced-dimension — the profitable boundary (r14 opt).
    cut = lm.agg(
        F.expr("approx_percentile(ce_micro, 0.75, 10000)").alias("cut")
    )
    return (
        lm.crossJoin(F.broadcast(cut))
        .filter(F.col("ce_micro") <= F.col("cut"))
        .select("doc_id", "ce_micro")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B56: exact heavy hitters via bounded-memory candidates (Misra-Gries) (r7)
# ---------------------------------------------------------------------------
# "Terms with frequency > N/k" WITHOUT shuffling the full term universe:
# pass 1 runs a Misra-Gries summary (Misra & Gries '82) with k' = 2k
# counters INSIDE each partition — O(k') memory, no exchange — whose
# union is a provable superset of every global heavy hitter (pigeonhole:
# cnt(x) > N/k ⇒ some partition has local frequency > |P|/k ≥ |P|/(k'+1),
# which MG always retains); pass 2 exact-counts ONLY the ≤ partitions·k'
# candidates via a broadcast semi-join, so the single groupBy's key
# domain is the candidate set, not the vocabulary. At 100 TB the full
# term groupBy shuffles billions of distinct keys; this shape shuffles
# thousands. Completeness is pytest-proven against brute force; the
# oracle replays the exact SEMANTIC (count everything, filter) — the
# bounded-memory pass is an optimization, not a semantics change.
HH_K = 200  # heavy = frequency > N/200
MG_COUNTERS = 2 * HH_K


def _mg_candidates(batches):
    """Pass-1 Misra-Gries kernel, vectorized (VERDICT r7 #4): per Arrow
    batch ONE ``value_counts`` (C path) builds a weighted summary;
    summaries accumulate and merge lazily (concat + grouped sum, also C)
    every ~8·MG_COUNTERS distinct terms, and each merge performs ALL of
    classic MG's decrement rounds at once by subtracting the
    (MG_COUNTERS+1)-th largest value and dropping non-positives. The
    retention guarantee is unchanged — every elementary decrement still
    hits ≥ MG_COUNTERS+1 positive counters, so an item's total decrement
    ≤ |P|/(MG_COUNTERS+1) (pigeonhole) — while interpreter work drops
    ~2× vs the per-token dict loop (measured on an 8M-token stream);
    working memory stays O(MG_COUNTERS + batch distinct)."""
    import pandas as pd

    def _flush(acc, pend):
        parts = ([acc] if acc is not None else []) + pend
        merged = pd.concat(parts)
        if merged.index.has_duplicates:
            merged = merged.groupby(level=0).sum()
        if len(merged) > MG_COUNTERS:
            thresh = merged.nlargest(MG_COUNTERS + 1).iloc[-1]
            merged = merged - thresh
            merged = merged[merged > 0]
        return merged

    acc: pd.Series | None = None
    pend: list = []
    pend_n = 0
    for pdf in batches:
        if not len(pdf):
            continue
        vc = pdf["term"].value_counts()
        pend.append(vc)
        pend_n += len(vc)
        if pend_n >= 8 * MG_COUNTERS:
            acc = _flush(acc, pend)
            pend, pend_n = [], 0
    if pend:
        acc = _flush(acc, pend)
    if acc is not None and len(acc):
        yield pd.DataFrame({"term": acc.index})


@register(
    "term_heavy_hitters",
    f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
), n AS (
  SELECT count(*) AS n FROM toks
), c AS (
  SELECT term, count(*) AS cnt FROM toks GROUP BY term
)
SELECT c.term, CAST(c.cnt AS BIGINT) AS cnt,
       CAST(round(c.cnt * 1000000.0 / n.n) AS BIGINT) AS freq_ppm
FROM c, n
WHERE c.cnt * {HH_K} > n.n
ORDER BY cnt DESC, term
""",
)
def term_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact terms above the N/{k} frequency threshold, found with the
    two-pass bounded-memory mechanism (B56): per-partition Misra-Gries
    candidates (map-only, {kp} counters), then exact counts of the
    candidates alone."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    cands = toks.mapInPandas(_mg_candidates, schema="term string").distinct()
    n = toks.agg(F.count("*").alias("n"))
    exact = (
        toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * HH_K > F.col("n"))
        .select(
            "term",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.col("cnt") * 1000000.0 / F.col("n"), 0).cast("long").alias("freq_ppm"),
        )
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
    )
term_heavy_hitters.__doc__ = term_heavy_hitters.__doc__.replace("{k}", str(HH_K)).replace("{kp}", str(MG_COUNTERS))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B69: BM25 ranked retrieval (Robertson-Walker-Jones Okapi) (r8)
# ---------------------------------------------------------------------------
# The lexical-retrieval counterpart to the vector ladder and the keyword
# half hybrid RRF deserves: full Okapi BM25 (k1 = 1.2, b = 0.75, the
# ln(1 + (N−df+0.5)/(df+0.5)) idf) over the documents table for a fixed
# term query. Determinism contract: each (doc, term) CONTRIBUTION is
# computed from exact-integer inputs (tf, df, dl, N, sum_dl) through an
# identical double expression on both engines and quantized ONCE to
# integer micro via floor(x+0.5) (the B67 IEEE contract); the per-doc
# score is then an exact INTEGER sum — order-independent across
# partitions, which a raw float sum is not (the B33 micro-nat lesson
# applied to retrieval scoring). Scale shape: ZERO shuffles — per-term
# tf is a row-local size(filter(toks, ...)) (a BM25 query is a handful
# of terms, so the pivoted-by-term form needs no explode and no
# (doc, term) groupBy), corpus stats (N, Σdl, per-term df) are ONE
# 1-row broadcast aggregate, scoring is whole-stage-codegen column
# algebra, and top-20 is TakeOrderedAndProject. ln parity:
# Java Math.log and DuckDB ln agree on these inputs (the B33 precedent);
# micro quantization bounds any ulp wobble away from rank flips.
BM25_QUERY_TERMS = ("spark", "join", "window", "stream")
BM25_TOPN = 20


@register(
    "doc_bm25_search",
    f"""
WITH toks AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), dl AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
), hits AS (
  SELECT doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
  FROM toks, unnest(toks) AS u(tok)
  JOIN (SELECT unnest({list(BM25_QUERY_TERMS)!r}) AS term) t ON u.tok = t.term
  GROUP BY doc_id, t.term
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY term
), contrib AS (
  SELECT h.doc_id,
         CAST(floor(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                    * (h.tf * 2.2 / (h.tf + 1.2 * (0.25 + 0.75 * d.dl / (s.sum_dl * 1.0 / s.n_docs))))
                    * 1000000.0 + 0.5) AS BIGINT) AS c_micro
  FROM hits h
  JOIN df f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS bm25_micro,
       row_number() OVER (ORDER BY sum(c_micro) DESC, doc_id) AS rnk
FROM contrib GROUP BY doc_id
ORDER BY rnk LIMIT {BM25_TOPN}
""",
)
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-{n} for the fixed query {q} (B69): integer-micro
    per-term contributions (floor(x+0.5)) summed exactly per doc — the
    order-independent form of float relevance scoring.

    ZERO-SHUFFLE plan: because a BM25 query is a handful of terms, each
    term's tf is a row-local ``size(filter(toks, ...))`` — no explode,
    no (doc, term) groupBy at all — and corpus stats (N, Σdl, per-term
    df) are ONE 1-row aggregate broadcast back. Scoring and the per-doc
    sum are then pure row-local column algebra in whole-stage codegen,
    and the only data movement in the whole query is the 1-row stats
    broadcast plus the top-{n} TakeOrderedAndProject. (A dynamic query
    SET would bring back the exploded (doc, term ∈ q) form — still
    pruned before any aggregation.)"""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    base = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        *[
            F.expr(f"size(filter(toks, x -> x = '{t}'))").cast("long").alias(f"tf_{i}")
            for i, t in enumerate(BM25_QUERY_TERMS)
        ],
    )
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).cast("long").alias(f"df_{i}")
            for i in range(len(BM25_QUERY_TERMS))
        ],
    )
    avgdl = F.col("sum_dl") * 1.0 / F.col("n_docs")
    contribs = []
    for i in range(len(BM25_QUERY_TERMS)):
        tf = F.col(f"tf_{i}")
        df_c = F.col(f"df_{i}")
        idf = F.log(1.0 + (F.col("n_docs") - df_c + 0.5) / (df_c + 0.5))
        tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl))
        contribs.append(
            F.when(tf > 0, F.floor(idf * tfn * 1000000.0 + 0.5).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    scored = (
        base.crossJoin(F.broadcast(stats))
        .withColumn("bm25_micro", score.cast("long"))
        .filter(
            sum(
                (F.col(f"tf_{i}") for i in range(1, len(BM25_QUERY_TERMS))),
                F.col("tf_0"),
            )
            > 0
        )
    )
    top = scored.select("doc_id", "bm25_micro").orderBy(
        F.col("bm25_micro").desc(), "doc_id"
    ).limit(BM25_TOPN)
    return top.select(
        "doc_id",
        "bm25_micro",
        F.row_number()
        .over(Window.orderBy(F.col("bm25_micro").desc(), "doc_id"))
        .cast("long")
        .alias("rnk"),
    ).orderBy("rnk")
doc_bm25_search.__doc__ = doc_bm25_search.__doc__.replace( "{n}", str(BM25_TOPN) ).replace("{q}", repr(BM25_QUERY_TERMS))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B74: conjunctive keyword search (AND-postings intersection) (r9)
# ---------------------------------------------------------------------------
# The boolean-retrieval primitive next to BM25's ranked form: documents
# containing ALL query terms, ranked by total term frequency. Same
# zero-shuffle shape as doc_bm25_search — per-term tf is row-local
# `size(filter(tokens, t -> t = term))`, the AND is a conjunction of
# tf > 0 predicates evaluated in the SAME map pass (a scan + filter +
# TakeOrderedAndProject plan; no posting-list join materializes), and at
# 100 TB the filter's selectivity (product of the terms' df ratios) is
# exactly what a postings-intersection would buy, for free, inside
# whole-stage codegen. The multi-query/persistent-index form is B15's
# postings discipline; this is the one-shot serving shape.
CONJ_TERMS = ("vector", "hash", "merge")
CONJ_TOPN = 20


@register(
    "doc_conjunctive_search",
    f"""
WITH tf AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x = '{CONJ_TERMS[0]}')) AS tf0,
         len(list_filter(string_split(text, ' '), x -> x = '{CONJ_TERMS[1]}')) AS tf1,
         len(list_filter(string_split(text, ' '), x -> x = '{CONJ_TERMS[2]}')) AS tf2
  FROM documents
)
SELECT doc_id, CAST(tf0 + tf1 + tf2 AS BIGINT) AS tf_total,
       row_number() OVER (ORDER BY tf0 + tf1 + tf2 DESC, doc_id) AS rnk
FROM tf WHERE tf0 > 0 AND tf1 > 0 AND tf2 > 0
ORDER BY rnk LIMIT {CONJ_TOPN}
""",
)
def doc_conjunctive_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} documents containing ALL of {t}, ranked by summed term
    frequency (B74) — boolean AND retrieval as one map-side pass +
    TakeOrderedAndProject, no postings join, no shuffle."""
    d = read_table(spark, sf_dir, "documents")
    tfs = [
        F.size(F.expr(f"filter(split(text, ' '), x -> x = '{t}')")).alias(f"tf{i}")
        for i, t in enumerate(CONJ_TERMS)
    ]
    tf = d.select("doc_id", *tfs)
    total = sum(F.col(f"tf{i}") for i in range(len(CONJ_TERMS)))
    hit = tf.filter(
        (F.col("tf0") > 0) & (F.col("tf1") > 0) & (F.col("tf2") > 0)
    ).select("doc_id", total.cast("long").alias("tf_total"))
    # TakeOrderedAndProject first (no global-window shuffle of the hit
    # set); the row_number then runs on the <= CONJ_TOPN-row frame
    top = hit.orderBy(F.col("tf_total").desc(), F.col("doc_id")).limit(CONJ_TOPN)
    w = Window.orderBy(F.col("tf_total").desc(), F.col("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).orderBy("rnk")
doc_conjunctive_search.__doc__ = doc_conjunctive_search.__doc__.replace("{n}", str(CONJ_TOPN)).replace("{t}", str(CONJ_TERMS))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B75: unigram KL-divergence quality score (r9)
# ---------------------------------------------------------------------------
# The distribution-shift quality signal (the unigram core of DSIR's
# importance weights, Xie et al. NeurIPS'23, and the classic LM-ratio
# web filter): KL(P_doc || P_corpus) — how far each document's unigram
# distribution sits from the corpus-wide distribution. Near-zero =
# corpus-typical text; large = topical outlier or degenerate repetition.
# Determinism: the B33 micro-nat contract — each distinct (doc, word)'s
# ln((n_dw * C) / (N_d * C_w)) quantizes ONCE to integer micro-nats,
# per-doc aggregation is the exact integer sum round(sum(n_dw * t) / N_d)
# — order-independent and engine-identical; only the display float
# derives from the integer. Scale shape: per-(doc, word) counts reduce
# map-side; the corpus count table is vocabulary-sized (broadcast; at
# web scale the same plan holds with a uniform shuffle join on word);
# one uniform-key groupBy(doc_id) finishes it.


@register(
    "doc_unigram_kl_quality",
    """
WITH dw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), dcount AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS n_dw FROM dw GROUP BY doc_id, w
), dtot AS (
  SELECT doc_id, CAST(sum(n_dw) AS BIGINT) AS n_d FROM dcount GROUP BY doc_id
), ccount AS (
  SELECT w, CAST(sum(n_dw) AS BIGINT) AS c_w FROM dcount GROUP BY w
), ctot AS (
  SELECT CAST(sum(c_w) AS BIGINT) AS c FROM ccount
), terms AS (
  SELECT d.doc_id, d.n_dw,
         CAST(round(ln((d.n_dw * ct.c) * 1.0 / (dt.n_d * cc.c_w)) * 1000000.0) AS BIGINT) AS t_micro
  FROM dcount d
  JOIN dtot dt USING (doc_id)
  JOIN ccount cc USING (w)
  CROSS JOIN ctot ct
)
SELECT t.doc_id, dt.n_d AS n_tokens,
       CAST(round(sum(t.n_dw * t.t_micro) * 1.0 / dt.n_d) AS BIGINT) AS kl_micro,
       CAST(round(sum(t.n_dw * t.t_micro) * 1.0 / dt.n_d) AS BIGINT) / 1000000.0 AS kl_nats
FROM terms t JOIN dtot dt USING (doc_id)
GROUP BY t.doc_id, dt.n_d
ORDER BY t.doc_id
""",
)
def doc_unigram_kl_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document KL(P_doc || P_corpus) over unigrams in integer
    micro-nats (B75) — the distribution-shift quality gate; large values
    flag topical outliers and degenerate repetition."""
    d = read_table(spark, sf_dir, "documents")
    dw = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    dcount = dw.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("n_dw"))
    dtot = dcount.groupBy("doc_id").agg(F.sum("n_dw").cast("long").alias("n_d"))
    ccount = dcount.groupBy("w").agg(F.sum("n_dw").cast("long").alias("c_w"))
    ctot = ccount.agg(F.sum("c_w").cast("long").alias("c"))
    terms = (
        dcount.join(F.broadcast(dtot), "doc_id")
        .join(F.broadcast(ccount), "w")
        .crossJoin(F.broadcast(ctot))
        .select(
            "doc_id",
            "n_dw",
            "n_d",
            F.round(
                F.log((F.col("n_dw") * F.col("c")) * 1.0 / (F.col("n_d") * F.col("c_w")))
                * 1000000.0
            )
            .cast("long")
            .alias("t_micro"),
        )
    )
    agg = terms.groupBy("doc_id", "n_d").agg(
        F.round(F.sum(F.col("n_dw") * F.col("t_micro")) * 1.0 / F.first("n_d"))
        .cast("long")
        .alias("kl_micro")
    )
    return agg.select(
        "doc_id",
        F.col("n_d").alias("n_tokens"),
        "kl_micro",
        (F.col("kl_micro") / 1000000.0).alias("kl_nats"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# B79: RAKE keyphrase extraction (r9)
# ---------------------------------------------------------------------------
# Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
# phrases are the maximal token runs between stopword/delimiter breaks
# (gaps-and-islands: island id = running count of stopwords), each
# word scores degree/frequency over the candidate set (degree = summed
# length of the phrases it appears in — co-occurrence favours words that
# live inside longer collocations), and a phrase scores the sum of its
# words' scores. Determinism: word scores quantize ONCE to integer
# milli (deg * 1000 div freq), phrase scores are exact integer sums,
# ties break on the phrase string. Phrases longer than {m} words are
# dropped (the standard practical cap; unbounded RAKE drowns in
# one-off mega-phrases). Scale shape: positions explode map-side, the
# island id is ONE per-doc window cumsum (the sessionize discipline),
# word stats reduce to vocabulary size (broadcast back), and only the
# bounded candidate set ever shuffles — document count never rides a
# join.
RAKE_STOPWORDS = ("a", "the")
RAKE_MAX_WORDS = 4
RAKE_TOPN = 20


def _rake_stop_sql(col: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    return f"CASE WHEN {col} IN ({inlist}) THEN 1 ELSE 0 END"


@register(
    "doc_rake_keyphrases",
    f"""
WITH pos AS (
  SELECT doc_id, t[CAST(i AS INT)] AS w, CAST(i AS INT) AS i,
         {_rake_stop_sql("t[CAST(i AS INT)]")} AS stop
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       unnest(range(1, len(t) + 1)) AS r(i)
), isl AS (
  SELECT doc_id, w, i, stop,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM pos
), inst AS (
  SELECT doc_id, island,
         array_to_string(list(w ORDER BY i), ' ') AS phrase,
         CAST(count(*) AS BIGINT) AS plen
  FROM isl WHERE stop = 0
  GROUP BY doc_id, island
  HAVING count(*) <= {RAKE_MAX_WORDS}
), words AS (
  SELECT doc_id, island, unnest(string_split(phrase, ' ')) AS w, plen, phrase
  FROM inst
), wstat AS (
  SELECT w, CAST(sum(plen) * 1000 // count(*) AS BIGINT) AS w_score_milli
  FROM words GROUP BY w
), pscore AS (
  SELECT wd.doc_id, wd.island, wd.phrase, wd.plen,
         CAST(sum(ws.w_score_milli) AS BIGINT) AS score_milli
  FROM words wd JOIN wstat ws ON ws.w = wd.w
  GROUP BY wd.doc_id, wd.island, wd.phrase, wd.plen
)
SELECT phrase, CAST(max(plen) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       max(score_milli) AS score_milli,
       row_number() OVER (ORDER BY max(score_milli) DESC, phrase) AS rnk
FROM pscore
GROUP BY phrase
ORDER BY rnk LIMIT {RAKE_TOPN}
""",
)
def doc_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} RAKE keyphrases over the corpus (B79): stopword-delimited
    candidate runs (<= {m} words), degree/frequency word scores in
    integer milli, summed per phrase."""
    d = read_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in RAKE_STOPWORDS])
    pos = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("i0", "w")
    ).select(
        "doc_id",
        "w",
        (F.col("i0") + 1).alias("i"),
        F.array_contains(stop_arr, F.col("w")).cast("int").alias("stop"),
    )
    wi = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = pos.withColumn("island", F.sum("stop").over(wi))
    inst = (
        isl.filter(F.col("stop") == 0)
        .groupBy("doc_id", "island")
        .agg(
            F.concat_ws(
                " ",
                F.expr("transform(sort_array(collect_list(struct(i, w))), s -> s.w)"),
            ).alias("phrase"),
            F.count("*").cast("long").alias("plen"),
        )
        .filter(F.col("plen") <= RAKE_MAX_WORDS)
    )
    words = inst.select(
        "doc_id", "island", "phrase", "plen", F.explode(F.split("phrase", " ")).alias("w")
    )
    wstat = words.groupBy("w").agg(
        F.expr("sum(plen) * 1000 div count(*)").cast("long").alias("w_score_milli")
    )
    pscore = (
        words.join(F.broadcast(wstat), "w")
        .groupBy("doc_id", "island", "phrase", "plen")
        .agg(F.sum("w_score_milli").cast("long").alias("score_milli"))
    )
    agg = pscore.groupBy("phrase").agg(
        F.max("plen").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_occurrences"),
        F.max("score_milli").alias("score_milli"),
    )
    top = agg.orderBy(F.col("score_milli").desc(), F.col("phrase")).limit(RAKE_TOPN)
    wr = Window.orderBy(F.col("score_milli").desc(), F.col("phrase"))
    return top.withColumn("rnk", F.row_number().over(wr).cast("long")).orderBy("rnk")
doc_rake_keyphrases.__doc__ = doc_rake_keyphrases.__doc__.replace("{n}", str(RAKE_TOPN)).replace("{m}", str(RAKE_MAX_WORDS))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B84: collocation mining by pointwise mutual information (r9, for r10)
# ---------------------------------------------------------------------------
# The classic collocation detector (Church & Hanks 1990): adjacent
# bigrams whose observed frequency beats the independence expectation —
# PMI = ln(c12 · T_uni² / (T_bi · c1 · c2)) — with a minimum support so
# rare accidents don't dominate (PMI's known low-frequency bias). The
# B33 micro-nat contract: each surviving bigram's PMI quantizes once to
# integer micro-nats from EXACT integer counts; ranking ties break on
# the words. Scale shape: bigram instances reduce map-side to counts,
# unigram/bigram totals are two 1-row aggregates broadcast back, the
# support filter prunes BEFORE the join to unigram counts, and the
# final rank is TakeOrdered over the bounded survivor set.
PMI_MIN_SUPPORT = 30
PMI_TOPN = 20


@register(
    "doc_collocations_pmi",
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), uni AS (
  SELECT u AS w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS u FROM toks) GROUP BY u
), tu AS (SELECT CAST(sum(c) AS BIGINT) AS t_uni FROM uni),
bi AS (
  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2, CAST(count(*) AS BIGINT) AS c12
  FROM toks, unnest(range(1, len(t))) AS r(i)
  GROUP BY 1, 2
), tb AS (SELECT CAST(sum(c12) AS BIGINT) AS t_bi FROM bi),
scored AS (
  SELECT b.w1, b.w2, b.c12,
         CAST(round(ln(b.c12 * 1.0 * tu.t_uni * tu.t_uni / (tb.t_bi * 1.0 * u1.c * u2.c)) * 1000000.0) AS BIGINT) AS pmi_micro
  FROM bi b
  JOIN uni u1 ON u1.w = b.w1
  JOIN uni u2 ON u2.w = b.w2
  CROSS JOIN tu CROSS JOIN tb
  WHERE b.c12 >= {PMI_MIN_SUPPORT}
)
SELECT w1, w2, c12, pmi_micro,
       row_number() OVER (ORDER BY pmi_micro DESC, w1, w2) AS rnk
FROM scored ORDER BY rnk LIMIT {PMI_TOPN}
""",
)
def doc_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} adjacent-bigram collocations by integer micro-nat PMI with
    support >= {s} (B84) — observed-vs-independence ratio from exact
    corpus counts."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    t_uni = uni.agg(F.sum("c").cast("long").alias("t_uni"))
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                    " (x, y) -> struct(x as w1, y as w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
    )
    t_bi = bi.agg(F.sum("c12").cast("long").alias("t_bi"))
    scored = (
        bi.filter(F.col("c12") >= PMI_MIN_SUPPORT)
        .join(F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2")), "w2")
        .crossJoin(F.broadcast(t_uni))
        .crossJoin(F.broadcast(t_bi))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    F.col("c12") * 1.0 * F.col("t_uni") * F.col("t_uni")
                    / (F.col("t_bi") * 1.0 * F.col("c1") * F.col("c2"))
                )
                * 1000000.0
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )
    top = scored.orderBy(F.col("pmi_micro").desc(), "w1", "w2").limit(PMI_TOPN)
    w = Window.orderBy(F.col("pmi_micro").desc(), "w1", "w2")
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).orderBy("rnk")
doc_collocations_pmi.__doc__ = doc_collocations_pmi.__doc__.replace("{n}", str(PMI_TOPN)).replace("{s}", str(PMI_MIN_SUPPORT))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B85: more-like-this — shingle-Jaccard similarity search (r9, for r10)
# ---------------------------------------------------------------------------
# The query-time complement to the dedup family: given ONE query
# document, rank the corpus by exact 3-token-shingle Jaccard. The dedup
# ops (B2/B32/B49) answer "what is duplicated" corpus-wide; this
# answers a user's "find me documents like this one" without building
# pair infrastructure. Mechanism: the query's distinct shingle set
# broadcasts; intersection counts come from one semi-filtered
# explode-groupBy (docs sharing zero shingles never aggregate); union =
# |A| + |B| − inter from per-doc distinct counts; Jaccard quantizes to
# integer 1e4 units with doc_id tie-break. At 100 TB the broadcast is
# the query's shingles (KBs) and the scan is map-side — the inverted
# postings variant (B15's discipline) takes over when the query set is
# a batch, exactly the B3-vs-A19 split.
MLT_QUERY_DOC = 0
MLT_TOPN = 10


@register(
    "doc_more_like_this",
    f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' ' || t[CAST(i AS INT) + 2])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
), q AS (
  SELECT s AS qs, len(s) AS qn FROM sh WHERE doc_id = {MLT_QUERY_DOC}
), scored AS (
  SELECT sh.doc_id,
         CAST(len(list_intersect(sh.s, q.qs)) AS BIGINT) AS inter,
         CAST(len(sh.s) AS BIGINT) AS n_sh
  FROM sh CROSS JOIN q
  WHERE sh.doc_id != {MLT_QUERY_DOC}
)
SELECT doc_id, inter, n_sh,
       CAST(inter * 10000 // (n_sh + (SELECT qn FROM q) - inter) AS BIGINT) AS jaccard_e4,
       row_number() OVER (ORDER BY inter * 10000 // (n_sh + (SELECT qn FROM q) - inter) DESC, doc_id) AS rnk
FROM scored
WHERE inter > 0
ORDER BY rnk LIMIT {MLT_TOPN}
""",
)
def doc_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} documents most similar to doc {q} by exact 3-shingle
    Jaccard (B85) — the query-time more-like-this search; integer 1e4
    Jaccard, query shingles broadcast, map-side scoring."""
    d = read_table(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            # zip_with over SHIFTED SLICES, not transform with a captured
            # outer-array index (t[i+1] inside the lambda re-touches the
            # whole array per element — measured 5x slower at sf0.1)
            F.array_distinct(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 2),"
                    " zip_with(slice(t, 2, size(t) - 2), slice(t, 3, size(t) - 2),"
                    " (a, b) -> concat(a, ' ', b)),"
                    " (x, y) -> concat(x, ' ', y))"
                )
            ).alias("s"),
        )
    )
    qrow = sh.filter(F.col("doc_id") == MLT_QUERY_DOC).select("s").first()
    qs = list(qrow[0])
    qn = len(qs)
    # broadcast the query's shingle set as a RELATION, not a literal array
    # expression — a multi-thousand-literal array bloats the expression
    # tree and costs seconds of codegen/eval (measured 2.7 s -> sub-second)
    qdf = spark.createDataFrame([(x,) for x in qs], "qsh string")
    ex = sh.filter(F.col("doc_id") != MLT_QUERY_DOC).select(
        "doc_id", F.size("s").cast("long").alias("n_sh"), F.explode("s").alias("qsh")
    )
    scored = (
        ex.join(F.broadcast(qdf), "qsh")
        .groupBy("doc_id", "n_sh")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    j = F.expr(f"inter * 10000 div (n_sh + {qn} - inter)").cast("long")
    hit = scored.select("doc_id", "inter", "n_sh", j.alias("jaccard_e4"))
    top = hit.orderBy(F.col("jaccard_e4").desc(), "doc_id").limit(MLT_TOPN)
    w = Window.orderBy(F.col("jaccard_e4").desc(), "doc_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).orderBy("rnk")
doc_more_like_this.__doc__ = doc_more_like_this.__doc__.replace("{n}", str(MLT_TOPN)).replace("{q}", str(MLT_QUERY_DOC))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B95: vocabulary head-coverage curve (r9, below-fold for r10)
# ---------------------------------------------------------------------------
# The Zipf audit behind every vocabulary-size decision (tokenizer vocab,
# embedding table, stopword cut): rank words by frequency and emit the
# cumulative corpus share at each head rank — "the top k types cover X%
# of all tokens". Determinism: ties rank by the word; shares are integer
# ppm of the exact total. Scale shape: one vocabulary-sized aggregate
# (map-side combined), the ranking runs over TYPES not tokens, and the
# output is the top-{n} head only.
VOCAB_CURVE_TOPN = 20


@register(
    "doc_vocab_coverage_curve",
    f"""
WITH uni AS (
  SELECT u AS w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS u FROM documents) GROUP BY u
), tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
ranked AS (
  SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rk,
         sum(c) OVER (ORDER BY c DESC, w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM uni
)
SELECT r.rk, r.w, r.c,
       CAST(r.cum * 1000000 // t.t AS BIGINT) AS cum_share_ppm
FROM ranked r CROSS JOIN tot t
WHERE r.rk <= {VOCAB_CURVE_TOPN}
ORDER BY r.rk
""",
)
def doc_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{n} vocabulary head with cumulative corpus-share ppm (B95) —
    the Zipf curve behind vocabulary-size decisions."""
    d = read_table(spark, sf_dir, "documents")
    uni = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    t = uni.agg(F.sum("c").cast("long").alias("t"))
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w"))
    ranked = uni.select(
        "w",
        "c",
        F.row_number().over(w_rank).cast("long").alias("rk"),
        F.sum("c").over(w_rank.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    ).filter(F.col("rk") <= VOCAB_CURVE_TOPN)
    return (
        ranked.crossJoin(F.broadcast(t))
        .select("rk", "w", "c", F.expr("cum * 1000000 div t").cast("long").alias("cum_share_ppm"))
        .orderBy("rk")
    )
doc_vocab_coverage_curve.__doc__ = doc_vocab_coverage_curve.__doc__.replace("{n}", str(VOCAB_CURVE_TOPN))  # template scale constants into the (real) docstring


# ---------------------------------------------------------------------------
# B112: count-min sketch audit (the over-estimating sibling of B56's MG)
# ---------------------------------------------------------------------------
# The second classic frequency sketch, audited the way B93 audits
# MinHash: build a 4x64 count-min sketch over the token stream (seeded
# md5 row hashes — fully deterministic, so the sketch itself is
# oracle-able), then report estimate vs exact for the top-20 head terms
# in ppm. CMS guarantees est >= exact (pure overcount from bucket
# collisions) while B56's Misra-Gries guarantees candidates with
# residual UNDERcounts — running both brackets the truth, and this audit
# measures the overcount side on YOUR corpus before trusting width 64 at
# scale. Scale shape: the sketch is one (depth, bucket) groupBy over
# 4x-replicated tokens reducing map-side to 256 cells; the probe joins
# 20x4 rows against those 256 — the audit is free next to the scan.
CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_PROBE_TOPN = 20


@register(
    "term_countmin_audit",
    f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
), ds AS (
  SELECT CAST(unnest(range({CMS_DEPTH})) AS INT) AS d
), cells AS (
  SELECT ds.d,
         CAST({H.ddb_str_hash_fast("term || ':cms' || CAST(ds.d AS VARCHAR)")} % {CMS_WIDTH} AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM toks, ds GROUP BY 1, 2
), head AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY term
  ORDER BY cnt DESC, term LIMIT {CMS_PROBE_TOPN}
), probe AS (
  SELECT h.term, h.cnt, ds.d,
         CAST({H.ddb_str_hash_fast("h.term || ':cms' || CAST(ds.d AS VARCHAR)")} % {CMS_WIDTH} AS INT) AS bucket
  FROM head h, ds
), est AS (
  SELECT p.term, max(p.cnt) AS exact_cnt, min(c.c) AS cms_cnt
  FROM probe p JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
  GROUP BY p.term
)
SELECT term, CAST(exact_cnt AS BIGINT) AS exact_cnt, CAST(cms_cnt AS BIGINT) AS cms_cnt,
       CAST((cms_cnt - exact_cnt) * 1000000 // exact_cnt AS BIGINT) AS over_ppm
FROM est
ORDER BY exact_cnt DESC, term
""",
)
def term_countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (4x64, seeded rows) estimate-vs-exact audit over
    the top-20 term head (B112) — overcount in ppm, est >= exact by
    construction."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    depth = spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("d"))
    _salted = "concat(term, ':cms', CAST(d AS STRING))"
    bucket_expr = f"CAST(({H.spark_str_hash_fast(_salted)}) % {CMS_WIDTH} AS INT)"
    # one exact term-frequency pass, then sketch cells from the WEIGHTED
    # vocab (|vocab| x depth rows through the cell groupBy, not |tokens| x
    # depth — same counts, 4x less hashed/shuffled volume; measured 2.1 s
    # -> sub-second at sf0.1)
    tf = toks.groupBy("term").agg(F.count("*").cast("long").alias("cnt"))
    cells = (
        tf.crossJoin(F.broadcast(depth))
        .select("d", F.expr(bucket_expr).alias("bucket"), "cnt")
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )
    head = tf.orderBy(F.col("cnt").desc(), "term").limit(CMS_PROBE_TOPN)
    probe = head.crossJoin(F.broadcast(depth)).select(
        "term", "cnt", "d", F.expr(bucket_expr).alias("bucket")
    )
    est = (
        probe.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("term")
        .agg(F.max("cnt").alias("exact_cnt"), F.min("c").alias("cms_cnt"))
    )
    return est.select(
        "term",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cms_cnt").cast("long").alias("cms_cnt"),
        F.expr("(cms_cnt - exact_cnt) * 1000000 div exact_cnt").cast("long").alias("over_ppm"),
    ).orderBy(F.col("exact_cnt").desc(), "term")


# ---------------------------------------------------------------------------
# B119: language-ID confusion matrix (eval the heuristic against labels)
# ---------------------------------------------------------------------------
# The eval-family treatment for B6's marker-token language ID: the corpus
# carries ground-truth `lang`, so the classifier gets a real confusion
# matrix — per (true, predicted) cell count and row share in ppm — the
# artifact that decides whether the heuristic is safe to gate a 100 TB
# ingest or needs the fastText upgrade (the seam is the same: any
# (doc_id, predicted_lang) frame drops in). Oracle reuses the registered
# doc_lang_id SQL verbatim as a CTE (the B107 cannot-drift pattern).
# Scale shape: the classifier's map-only pass + one (true, pred) groupBy
# over |langs|² cells.
from ..queries import REGISTRY as _TQ_REGISTRY


def _langid_confusion_oracle() -> str:
    return f"""
WITH pred AS ({_TQ_REGISTRY["doc_lang_id"].oracle})
SELECT lang AS true_lang, predicted_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) * 1000000 // sum(count(*)) OVER (PARTITION BY lang) AS BIGINT)
         AS row_share_ppm
FROM pred
GROUP BY lang, predicted_lang
ORDER BY true_lang, predicted_lang
"""


@register("doc_langid_confusion", _langid_confusion_oracle())
def doc_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the B6 language-ID heuristic vs ground truth
    (B119) — per (true, predicted) counts and row share ppm."""
    pred = doc_lang_id(spark, sf_dir).select("lang", "predicted_lang")
    counts = pred.groupBy(
        F.col("lang").alias("true_lang"), "predicted_lang"
    ).agg(F.count("*").cast("long").alias("n_docs"))
    wr = Window.partitionBy("true_lang")
    return counts.select(
        "true_lang",
        "predicted_lang",
        "n_docs",
        F.expr("n_docs * 1000000 div sum(n_docs) OVER (PARTITION BY true_lang)")
        .cast("long")
        .alias("row_share_ppm"),
    ).orderBy("true_lang", "predicted_lang")


# ---------------------------------------------------------------------------
# B131: tokenizer fertility audit by language (r9)
# ---------------------------------------------------------------------------
# Fertility — model tokens emitted per unit of raw text — is the number
# that decides how a fixed token budget splits across languages: a lang
# whose fertility is 2x pays 2x the compute for the same bytes of data,
# and vocabulary decisions are made off exactly this table. Both
# tokenizations reuse the corpus's canonical splitters (the \\s+ word
# split and the GPT-style _BPE_PAT pretokenizer), so the audit stays
# consistent with doc_token_count / doc_token_count_bpe and the BPE
# ops. All ratios are integer micro-units (tokens * 1e6 div chars) —
# no doubles. One map-side tokenize + one |lang|-key groupBy: at 100 TB
# the cost is the scan, the exchange carries |langs| rows.
@register(
    "lang_tokenizer_fertility",
    f"""
WITH per_doc AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT) AS bpe_tokens,
         n_chars
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       CAST((sum(ws_tokens) * 1000000) // greatest(sum(n_chars), 1) AS BIGINT) AS ws_fertility_micro,
       CAST((sum(bpe_tokens) * 1000000) // greatest(sum(n_chars), 1) AS BIGINT) AS bpe_fertility_micro,
       CAST((sum(bpe_tokens) * 1000000) // greatest(sum(ws_tokens), 1) AS BIGINT) AS bpe_per_word_micro
FROM per_doc
GROUP BY lang
ORDER BY lang
""",
)
def lang_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility audit (B131) — whitespace vs
    BPE-pretokenizer tokens per char in integer micro-units; the table a
    token-budget split across languages is planned from."""
    d = read_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), F.lit(0))
    per_doc = d.select(
        "lang",
        F.size(ws).cast("long").alias("ws_tokens"),
        F.size(bpe).cast("long").alias("bpe_tokens"),
        "n_chars",
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("ws_tokens").cast("long").alias("total_ws_tokens"),
            F.sum("bpe_tokens").cast("long").alias("total_bpe_tokens"),
            F.expr("(sum(ws_tokens) * 1000000) div greatest(sum(n_chars), 1)")
            .cast("long")
            .alias("ws_fertility_micro"),
            F.expr("(sum(bpe_tokens) * 1000000) div greatest(sum(n_chars), 1)")
            .cast("long")
            .alias("bpe_fertility_micro"),
            F.expr("(sum(bpe_tokens) * 1000000) div greatest(sum(ws_tokens), 1)")
            .cast("long")
            .alias("bpe_per_word_micro"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# B132: per-source diversity indices (r9)
# ---------------------------------------------------------------------------
# Corpus-design audit: how concentrated is each source's language mix?
# Two standard indices side by side — Simpson (probability two random
# docs share a lang; EXACT rational c*(c-1)/(n*(n-1)) in integer micro
# units, zero float ops) and Shannon entropy in micro-nats (the one
# place a log appears, quantized per-term with the B75 KL discipline:
# round(ln(n/c) * 1e6) BEFORE the weighted sum, so both engines add the
# same integers). Effective lang count = 1e6^2 // simpson_micro — the
# "how many equally-sized languages would look like this" readout.
# Shape: one (source, lang) groupBy, then a |sources|-key rollup — the
# exchange after the first agg carries sources x langs rows, trivial at
# any corpus size.
@register(
    "source_lang_diversity",
    """
WITH sl AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang
), st AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sl GROUP BY source
), terms AS (
  SELECT sl.source, sl.c, st.n,
         CAST(round(ln(st.n * 1.0 / sl.c) * 1000000.0) AS BIGINT) AS surprise_micro
  FROM sl JOIN st USING (source)
)
SELECT t.source,
       CAST(max(t.n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_langs,
       CAST(CASE WHEN max(t.n) > 1
                 THEN (1000000 * sum(t.c * (t.c - 1))) // (max(t.n) * (max(t.n) - 1))
                 ELSE 1000000 END AS BIGINT) AS simpson_micro,
       CAST(round(sum(t.c * t.surprise_micro) * 1.0 / max(t.n)) AS BIGINT) AS shannon_micro_nats
FROM terms t
GROUP BY t.source
ORDER BY t.source
""",
)
def source_lang_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Simpson concentration (exact integer rational) and
    Shannon entropy (micro-nats, per-term quantized) over the language
    mix (B132) — the corpus-design diversity audit."""
    d = read_table(spark, sf_dir, "documents")
    sl = d.groupBy("source", "lang").agg(F.count("*").cast("long").alias("c"))
    st = sl.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    terms = sl.join(F.broadcast(st), "source").select(
        "source",
        "c",
        "n",
        F.round(F.log(F.col("n") * 1.0 / F.col("c")) * 1000000.0)
        .cast("long")
        .alias("surprise_micro"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_langs"),
            F.when(
                F.max("n") > 1,
                F.expr("(1000000 * sum(c * (c - 1))) div (max(n) * (max(n) - 1))"),
            )
            .otherwise(F.lit(1000000))
            .cast("long")
            .alias("simpson_micro"),
            F.round(F.expr("sum(c * surprise_micro) * 1.0 / max(n)"))
            .cast("long")
            .alias("shannon_micro_nats"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B135: prefix autocomplete top-k over the corpus vocabulary (r9)
# ---------------------------------------------------------------------------
# The serving-side twin of the vocabulary analytics: for every term
# prefix of length 1-3, the top-3 completions by corpus frequency —
# the table an autocomplete endpoint loads. Shape: term frequencies
# are one map-side-combined groupBy over the token explode (the same
# first pass every vocab op here pays), the prefix explode adds <= 3
# rows per DISTINCT TERM (vocabulary-sized, not corpus-sized), and the
# per-prefix top-3 is a window over prefix keys whose fanout is capped
# by the completion rank. At 100 TB the vocab table is millions of
# rows against trillions of tokens — the prefix stage costs nothing
# compared to the count pass, and the output is bounded by
# 3 x |prefixes|.
@register(
    "term_prefix_autocomplete",
    """
WITH tf AS (
  SELECT w AS term, CAST(count(*) AS BIGINT) AS term_count
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
  GROUP BY w
), pref AS (
  SELECT substr(term, 1, plen) AS prefix, term, term_count
  FROM tf CROSS JOIN (SELECT unnest([1, 2, 3]) AS plen) p
  WHERE len(term) >= plen
), ranked AS (
  SELECT prefix, term, term_count,
         CAST(row_number() OVER (PARTITION BY prefix
                                 ORDER BY term_count DESC, term) AS BIGINT)
           AS completion_rank
  FROM pref
)
SELECT prefix, term, term_count, completion_rank
FROM ranked WHERE completion_rank <= 3
ORDER BY prefix, completion_rank
""",
)
def term_prefix_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 completions per 1-3 char term prefix by corpus frequency
    (B135) — vocab-sized prefix explode over the standard token-count
    pass; the autocomplete serving table."""
    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy(F.col("w").alias("term"))
        .agg(F.count("*").cast("long").alias("term_count"))
    )
    pref = (
        tf.select(
            "term", "term_count", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("plen")
        )
        .filter(F.length("term") >= F.col("plen"))
        .select(
            F.expr("substring(term, 1, plen)").alias("prefix"), "term", "term_count"
        )
    )
    wr = Window.partitionBy("prefix").orderBy(F.col("term_count").desc(), F.col("term").asc())
    return (
        pref.select(
            "prefix",
            "term",
            "term_count",
            F.row_number().over(wr).cast("long").alias("completion_rank"),
        )
        .filter(F.col("completion_rank") <= 3)
        .orderBy("prefix", "completion_rank")
    )


# ---------------------------------------------------------------------------
# B143: PMI query expansion -> weighted BM25 (composed capstone, r9)
# ---------------------------------------------------------------------------
# The classic pseudo-relevance trick, composed from two disciplines the
# repo already proves separately: each query term recruits its top-1
# PMI collocate from doc-level co-occurrence (the B83 collocation
# arithmetic — micro-nat quantized ln, c_uv >= 2 support floor, ties on
# the collocate string), then Okapi BM25 (the B69 integer-micro
# contribution form) scores the UNION of terms with original terms at
# weight 2 and expansions at weight 1, all in exact integer arithmetic.
# The expansion set is data-dependent, so the Spark side collects it —
# O(|query|) rows, the bounded-collect convention centroids already
# use — and scoring runs the exploded (doc, term) BM25 form that
# doc_bm25_search documents as the dynamic-set fallback: incidence
# joins a BROADCAST term list, so the only shuffles are the (doc, term)
# hit groupBy and the final TakeOrderedAndProject. Expansion stats
# reduce over doc-level incidence (distinct tok per doc), and the
# co-occurrence join fans out only from docs CONTAINING a query term.
QEXP_WEIGHT_ORIG = 2
QEXP_WEIGHT_EXP = 1


def _qexp_oracle() -> str:
    terms = list(BM25_QUERY_TERMS)
    toklist = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    return f"""
WITH inc AS (
  SELECT DISTINCT doc_id, unnest({H.ddb_tokens('text')}) AS tok FROM documents
  WHERE text <> ''
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), cu AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM inc GROUP BY tok
), qinc AS (
  SELECT i.doc_id, i.tok AS q FROM inc i
  WHERE i.tok IN (SELECT unnest({toklist}))
), pairs AS (
  SELECT q.q, i.tok AS v, CAST(count(*) AS BIGINT) AS c_uv
  FROM qinc q JOIN inc i ON i.doc_id = q.doc_id
  WHERE i.tok <> q.q AND i.tok NOT IN (SELECT unnest({toklist}))
  GROUP BY q.q, i.tok HAVING count(*) >= 2
), pmi AS (
  SELECT p.q, p.v,
         CAST(round(ln((n.n_docs * p.c_uv) * 1.0 / (u.c * w.c)) * 1000000.0) AS BIGINT)
           AS pmi_micro,
         row_number() OVER (PARTITION BY p.q
                            ORDER BY round(ln((n.n_docs * p.c_uv) * 1.0 / (u.c * w.c)) * 1000000.0) DESC,
                                     p.v) AS rn
  FROM pairs p JOIN cu u ON u.tok = p.q JOIN cu w ON w.tok = p.v CROSS JOIN n
), termset AS (
  SELECT tok AS term, CAST({QEXP_WEIGHT_ORIG} AS BIGINT) AS w
  FROM (SELECT unnest({toklist}) AS tok)
  UNION
  SELECT v AS term, CAST({QEXP_WEIGHT_EXP} AS BIGINT) AS w FROM pmi WHERE rn = 1
), tw AS (
  SELECT term, CAST(max(w) AS BIGINT) AS w FROM termset GROUP BY term
), toks AS (
  SELECT doc_id, {H.ddb_tokens('text')} AS toks FROM documents
), dl AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
), hits AS (
  SELECT t.doc_id, u.tok AS term, CAST(count(*) AS BIGINT) AS tf
  FROM toks t, unnest(t.toks) AS u(tok)
  WHERE u.tok IN (SELECT term FROM tw)
  GROUP BY t.doc_id, u.tok
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY term
), contrib AS (
  SELECT h.doc_id,
         w.w * CAST(floor(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                    * (h.tf * 2.2 / (h.tf + 1.2 * (0.25 + 0.75 * d.dl / (s.sum_dl * 1.0 / s.n_docs))))
                    * 1000000.0 + 0.5) AS BIGINT) AS c_micro
  FROM hits h
  JOIN tw w ON w.term = h.term
  JOIN df f ON f.term = h.term
  JOIN dl d ON d.doc_id = h.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro,
       CAST(row_number() OVER (ORDER BY sum(c_micro) DESC, doc_id) AS BIGINT) AS rnk
FROM contrib GROUP BY doc_id
ORDER BY rnk LIMIT {BM25_TOPN}
"""


@register("query_expansion_search", _qexp_oracle())
def query_expansion_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-expanded weighted BM25 (B143): each query term recruits its
    top-1 PMI collocate (doc-level co-occurrence, micro-nat quantized),
    then integer-micro Okapi contributions score the expanded term set
    with original terms at weight 2, expansions at weight 1."""
    d = read_table(spark, sf_dir, "documents")
    qterms = list(BM25_QUERY_TERMS)
    # r15 (guide §2.3/§2.4; supersedes the r14 checkpoint-was-slower note):
    # the old form built a corpus-wide DISTINCT (doc, token) incidence
    # table and consumed it three times inside one action — three
    # explode+distinct shuffles — plus a doc_id SELF-JOIN to pair query
    # terms with co-occurring tokens. Doc-level co-occurrence is a pure
    # function of each doc's DISTINCT-TOKEN ARRAY, so pair generation now
    # happens IN-ROW (explode q × v from the array, query-doc rows only),
    # and the only remaining shuffles are the vocabulary count and the
    # small (q, v) aggregate. Same (q, v, c_uv) multiset, same cu counts.
    qarr = F.array(*[F.lit(t) for t in qterms])
    dt = d.filter(F.col("text") != "").select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("dtoks")
    )
    n_docs = d.count()
    cu = (
        dt.select(F.explode("dtoks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pairs = (
        dt.filter(F.arrays_overlap("dtoks", qarr))
        .select(
            F.explode(F.array_intersect("dtoks", qarr)).alias("q"),
            F.filter(F.col("dtoks"), lambda x: ~F.array_contains(qarr, x)).alias("vs"),
        )
        .select("q", F.explode("vs").alias("v"))
        .groupBy("q", "v")
        .agg(F.count("*").cast("long").alias("c_uv"))
        .filter(F.col("c_uv") >= 2)
    )
    pmi = (
        pairs.join(F.broadcast(cu.withColumnRenamed("tok", "q")), "q")
        .withColumnRenamed("c", "c_u")
        .join(F.broadcast(cu.withColumnRenamed("tok", "v")), "v")
        .withColumnRenamed("c", "c_v")
        .select(
            "q",
            "v",
            F.round(
                F.log((F.lit(n_docs) * F.col("c_uv")) * 1.0 / (F.col("c_u") * F.col("c_v")))
                * 1000000.0
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )
    wq = Window.partitionBy("q").orderBy(F.col("pmi_micro").desc(), F.col("v").asc())
    top1 = pmi.select("q", "v", F.row_number().over(wq).alias("rn")).filter(F.col("rn") == 1)
    # bounded collect: O(|query terms|) expansion rows, the centroid
    # convention — the term set must become a broadcast literal.
    expansions = sorted({r.v for r in top1.collect()} - set(qterms))
    weights = {t: QEXP_WEIGHT_ORIG for t in qterms}
    for v in expansions:
        weights[v] = QEXP_WEIGHT_EXP
    tw = spark.createDataFrame(sorted(weights.items()), "term string, w long")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"), F.sum("dl").cast("long").alias("sum_dl")
    )
    # prune BEFORE the explode: the expanded term set is a driver-side
    # literal by this point, so a row-local filter keeps only matching
    # tokens (multiplicity preserved — array_intersect would dedup and
    # break tf) and the explode emits hits instead of the whole corpus
    # token stream. Identical (doc, term, tf) rows, ~|terms|/|vocab| of
    # the explode volume.
    term_arr = F.array(*[F.lit(t) for t in sorted(weights)])
    hits = (
        toks.select(
            "doc_id",
            F.explode(F.filter(F.col("toks"), lambda x: F.array_contains(term_arr, x))).alias(
                "term"
            ),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfc = hits.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    contrib = (
        hits.join(F.broadcast(tw), "term")
        .join(F.broadcast(dfc), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("w")
                * F.floor(
                    F.log(
                        1.0
                        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    )
                    * (
                        (F.col("tf") * 2.2)
                        / (
                            F.col("tf")
                            + 1.2
                            * (0.25 + 0.75 * F.col("dl") / (F.col("sum_dl") * 1.0 / F.col("n_docs")))
                        )
                    )
                    * 1000000.0
                    + 0.5
                ).cast("long")
            ).alias("c_micro"),
        )
    )
    wr = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("c_micro").cast("long").alias("score_micro"))
        .select("doc_id", "score_micro", F.row_number().over(wr).cast("long").alias("rnk"))
        .orderBy("rnk")
        .limit(BM25_TOPN)
    )


# ---------------------------------------------------------------------------
# B146: language-ID confidence margin (mixed-language detector) (r9)
# ---------------------------------------------------------------------------
# doc_lang_id picks an argmax; THIS op reports how contested the pick
# was. Best and runner-up marker scores come from one sorted 5-element
# array per doc (no window, no unpivot — a row-local sort of a
# constant-width array), the margin is their integer difference, and a
# doc flags ambiguous when nothing scored or two languages tied — the
# rows a code-switching / mixed-language corpus routes to a heavier
# classifier. Map-only over the scan; the same shape at any corpus
# size.
@register(
    "doc_langid_margin",
    f"""
WITH s AS (
  SELECT doc_id,
         list_sort([{", ".join("len(list_intersect(list_distinct(string_split(text, ' ')), ["
                               + ", ".join(f"''{m}''".replace("''", chr(39)) for m in ms)
                               + "]))" for ms in LANG_MARKERS.values())}], 'DESC') AS sc
  FROM documents
)
SELECT doc_id,
       CAST(sc[1] AS BIGINT) AS best_score,
       CAST(sc[2] AS BIGINT) AS second_score,
       CAST(sc[1] - sc[2] AS BIGINT) AS margin,
       CAST(CASE WHEN sc[1] = 0 OR sc[1] = sc[2] THEN 1 ELSE 0 END AS BIGINT) AS ambiguous
FROM s
ORDER BY doc_id
""",
)
def doc_langid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-vs-runner-up language marker scores per doc (B146) — the
    confidence margin behind doc_lang_id's argmax; ambiguous rows are
    the mixed-language routing set."""
    d = read_table(spark, sf_dir, "documents")
    scores = [
        _lang_score_spark(ms).cast("long") for ms in LANG_MARKERS.values()
    ]
    sc = F.sort_array(F.array(*scores), asc=False)
    return (
        d.select(
            "doc_id",
            sc.getItem(0).cast("long").alias("best_score"),
            sc.getItem(1).cast("long").alias("second_score"),
            (sc.getItem(0) - sc.getItem(1)).cast("long").alias("margin"),
            F.when((sc.getItem(0) == 0) | (sc.getItem(0) == sc.getItem(1)), 1)
            .otherwise(0)
            .cast("long")
            .alias("ambiguous"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B161: TextRank corpus keywords (r9)
# ---------------------------------------------------------------------------
# The graph-based sibling of RAKE (Mihalcea & Tarau 2004): words vote
# for the words they co-occur with. Edges are ADJACENT-token pairs
# (window 2) with co-occurrence weights; the rank iteration is the B46
# integer discipline generalized to weighted variable-degree nodes —
# each round node s forwards (r_s * 17 * w_st) // (20 * W_s) to
# neighbor t (0.85 damping as 17/20, W_s = s's total edge mass, floor
# division INSIDE the per-edge term so the recursive CTE replays the
# exact integers), plus the 150000 teleport. State is VOCABULARY-sized
# — the corpus pass builds counts once, the iteration never touches
# documents again; at 100 TB the word graph still fits anywhere.
TEXTRANK_ITERS = 8
TEXTRANK_TOPN = 20


@register(
    "doc_textrank_terms",
    f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), adj AS (
  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS r(i)
  WHERE t[CAST(i AS INT)] <> '' AND t[CAST(i AS INT) + 1] <> ''
), und AS (
  SELECT w1 AS s, w2 AS d FROM adj WHERE w1 <> w2
  UNION ALL
  SELECT w2, w1 FROM adj WHERE w1 <> w2
), edges AS (
  SELECT s, d, CAST(count(*) AS BIGINT) AS w FROM und GROUP BY s, d
), mass AS (
  SELECT s, CAST(sum(w) AS BIGINT) AS ws FROM edges GROUP BY s
), nodes AS (
  SELECT DISTINCT s AS node FROM edges
), tr AS (
  SELECT 0 AS iter, node, CAST(1000000 AS BIGINT) AS r FROM nodes
  UNION ALL
  SELECT p.iter + 1, e.d,
         CAST(150000 + sum((p.r * 17 * e.w) // (20 * m.ws)) AS BIGINT)
  FROM tr p
  JOIN edges e ON e.s = p.node
  JOIN mass m ON m.s = p.node
  WHERE p.iter < {TEXTRANK_ITERS}
  GROUP BY p.iter, e.d
)
SELECT node AS term, r AS rank_micro,
       CAST(row_number() OVER (ORDER BY r DESC, node) AS BIGINT) AS rnk
FROM tr WHERE iter = {TEXTRANK_ITERS}
ORDER BY rnk LIMIT {TEXTRANK_TOPN}
""",
)
def doc_textrank_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus keywords by weighted integer TextRank over the
    adjacent-token co-occurrence graph (B161) — vocabulary-sized state,
    exact recursive-CTE replay of every round."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("t"))
    adj = toks.select(
        F.explode(
            F.expr(
                "filter(transform(sequence(1, greatest(size(t) - 1, 0)),"
                " i -> struct(t[i-1] as w1, t[i] as w2)),"
                " p -> p.w1 <> '' AND p.w2 <> '' AND p.w1 <> p.w2)"
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    und = adj.select(F.col("w1").alias("s"), F.col("w2").alias("d")).unionByName(
        adj.select(F.col("w2").alias("s"), F.col("w1").alias("d"))
    )
    edges = und.groupBy("s", "d").agg(F.count("*").cast("long").alias("w"))
    # vocabulary-sized graph: collect to the driver and iterate exactly
    # (the graph-family driver route; the distributed join+groupBy loop
    # from B157 applies verbatim if a vocabulary ever outgrows this).
    e_rows = edges.collect()
    ws: dict[str, int] = {}
    out: dict[str, list] = {}
    for r0 in e_rows:
        ws[r0.s] = ws.get(r0.s, 0) + r0.w
        out.setdefault(r0.s, []).append((r0.d, r0.w))
    r_map = {v: 1000000 for v in out}
    for _ in range(TEXTRANK_ITERS):
        nxt = {v: 150000 for v in out}
        for s, nbrs in out.items():
            rs = r_map[s]
            wsum = ws[s]
            for t, w in nbrs:
                if t in nxt:
                    nxt[t] += (rs * 17 * w) // (20 * wsum)
        r_map = nxt
    top = sorted(((-rv, v) for v, rv in r_map.items()))[:TEXTRANK_TOPN]
    return spark.createDataFrame(
        [(v, -nr, i + 1) for i, (nr, v) in enumerate(top)],
        "term string, rank_micro long, rnk long",
    ).orderBy("rnk")


# ---------------------------------------------------------------------------
# B170: language x source chi-square independence test (r9)
# ---------------------------------------------------------------------------
# Is language independent of source? The formal test behind the B132
# diversity table: contingency counts, expected under independence,
# and the chi-square statistic in exact integer arithmetic — each cell
# term is (c*N - rt*ct)^2 * 1e6 // (rt*ct*N) with 128-bit
# intermediates (c*N squares brush int64 — the B144 rule). Rejection
# compares against the 95th-percentile critical value for the
# measured dof, entered as a micro LITERAL for the (5-1)x(20-1)=76 dof
# this corpus has (97.351; a general deployment tabulates the same
# way). One (lang, source) groupBy; everything after is arithmetic on
# langs x sources rows.
@register(
    "lang_source_independence",
    """
WITH cont AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang, source
), rt AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS r FROM cont GROUP BY lang
), ct AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS s FROM cont GROUP BY source
), n AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM cont
), grid AS (
  SELECT rt.lang, ct.source, coalesce(cont.c, 0) AS c, rt.r, ct.s, n.n
  FROM rt CROSS JOIN ct CROSS JOIN n
  LEFT JOIN cont ON cont.lang = rt.lang AND cont.source = ct.source
), terms AS (
  SELECT CAST((CAST(c AS HUGEINT) * n - CAST(r AS HUGEINT) * s)
              * (CAST(c AS HUGEINT) * n - CAST(r AS HUGEINT) * s) * 1000000
              // (CAST(r AS HUGEINT) * s * n) AS BIGINT) AS t_micro
  FROM grid
)
SELECT (SELECT n FROM n) AS n_docs,
       CAST((SELECT count(*) FROM rt) AS BIGINT) AS n_langs,
       CAST((SELECT count(*) FROM ct) AS BIGINT) AS n_sources,
       CAST(((SELECT count(*) FROM rt) - 1) * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof,
       CAST(sum(t_micro) AS BIGINT) AS chi2_micro,
       CAST(CASE WHEN sum(t_micro) > 97351000 THEN 1 ELSE 0 END AS BIGINT) AS independence_rejected
FROM terms
""",
)
def lang_source_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of language vs source (B170) —
    exact integer cell terms with 128-bit intermediates, dof measured
    from the data, 95% critical value for dof=76 as a literal."""
    d = read_table(spark, sf_dir, "documents")
    cont = d.groupBy("lang", "source").agg(F.count("*").cast("long").alias("c"))
    rt = cont.groupBy("lang").agg(F.sum("c").cast("long").alias("r"))
    ct = cont.groupBy("source").agg(F.sum("c").cast("long").alias("s"))
    n = cont.agg(F.sum("c").cast("long").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(cont, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
            "r",
            "s",
            "n",
        )
    )
    # decimal `div` gives the exact floor the oracle's HUGEINT // computes
    # (decimal / would round, not truncate)
    terms = grid.select(
        F.expr(
            "cast((cast(c as decimal(38,0)) * n - cast(r as decimal(38,0)) * s)"
            " * (cast(c as decimal(38,0)) * n - cast(r as decimal(38,0)) * s) * 1000000"
            " div (cast(r as decimal(38,0)) * s * n) as long)"
        ).alias("t_micro")
    )
    stats = terms.agg(F.sum("t_micro").cast("long").alias("chi2_micro"))
    dims = (
        rt.agg(F.count("*").cast("long").alias("n_langs"))
        .crossJoin(ct.agg(F.count("*").cast("long").alias("n_sources")))
        .crossJoin(n)
    )
    return (
        stats.crossJoin(F.broadcast(dims))
        .select(
            F.col("n").alias("n_docs"),
            "n_langs",
            "n_sources",
            ((F.col("n_langs") - 1) * (F.col("n_sources") - 1)).cast("long").alias("dof"),
            "chi2_micro",
            F.when(F.col("chi2_micro") > 97351000, 1).otherwise(0).cast("long").alias(
                "independence_rejected"
            ),
        )
    )


# ---------------------------------------------------------------------------
# B171: holdout-split LM perplexity (the CCNet-faithful form) (r9)
# ---------------------------------------------------------------------------
# B33 trains and scores on the same corpus — fine as a repetition
# gate, but CCNet's actual recipe trains the LM on a REFERENCE corpus
# and scores the candidate one. This op is that shape: the bigram LM
# trains on the doc_id % 5 != 0 slice, scores the held-out % 5 == 0
# docs, and bigrams never seen in training fall through the add-alpha
# smoothing via left joins (c2, then c1, then V — all TRAIN-side
# quantities; coalesce 0 keeps the probability finite exactly as the
# smoothing intends). Same per-bigram micro-nat quantization, same
# two-pass scale shape; held-out scores are what a cross-domain
# quality gate actually thresholds.
@register(
    "doc_lm_holdout_perplexity",
    f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), train_bi AS (
  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS r(i)
  WHERE doc_id % 5 <> 0
), uni AS (
  SELECT CAST(count(DISTINCT u) AS BIGINT) AS v
  FROM (SELECT unnest(t) AS u FROM toks WHERE doc_id % 5 <> 0)
), c2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM train_bi GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM train_bi GROUP BY w1
), test_bi AS (
  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS r(i)
  WHERE doc_id % 5 = 0
), db AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS n_b FROM test_bi GROUP BY doc_id, w1, w2
), scored AS (
  SELECT d.doc_id, d.n_b,
         CAST(round(-ln((coalesce(c2.c2, 0) + {LM_ALPHA})
                        / (coalesce(c1.c1, 0) + {LM_ALPHA} * uni.v)) * 1000000.0)
              AS BIGINT) AS nl
  FROM db d
  LEFT JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
  LEFT JOIN c1 ON c1.w1 = d.w1
  CROSS JOIN uni
)
SELECT doc_id, n_bigrams,
       ce_micro / 1000000.0 AS cross_entropy,
       round(exp(ce_micro / 1000000.0), 4) AS ppl
FROM (
  SELECT doc_id,
         CAST(sum(n_b) AS BIGINT) AS n_bigrams,
         CAST(round(sum(n_b * nl) * 1.0 / sum(n_b)) AS BIGINT) AS ce_micro
  FROM scored GROUP BY doc_id
)
ORDER BY doc_id
""",
)
def doc_lm_holdout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity: bigram LM trained on the doc_id % 5 != 0
    slice scores the % 5 == 0 docs (B171) — CCNet's actual
    reference-model shape; unseen bigrams ride the smoothing through
    left joins, per-bigram micro-nat quantization unchanged."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    bi_expr = F.explode(
        F.expr(
            "CASE WHEN size(t) >= 2 THEN"
            " transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))"
            " ELSE array() END"
        )
    ).alias("b")
    train_bi = toks.filter(F.col("doc_id") % 5 != 0).select(bi_expr).select(
        F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    v = (
        toks.filter(F.col("doc_id") % 5 != 0)
        .select(F.explode("t").alias("u"))
        .agg(F.countDistinct("u").cast("long").alias("v"))
    )
    c2 = train_bi.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
    c1 = train_bi.groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
    db = (
        toks.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", bi_expr)
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("n_b"))
    )
    scored = (
        db.join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "n_b",
            F.round(
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + LM_ALPHA)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + LM_ALPHA * F.col("v"))
                )
                * 1000000.0
            )
            .cast("long")
            .alias("nl"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("n_b").cast("long").alias("n_bigrams"),
        F.round(F.sum(F.col("n_b") * F.col("nl")) * 1.0 / F.sum("n_b"))
        .cast("long")
        .alias("ce_micro"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        (F.col("ce_micro") / 1000000.0).alias("cross_entropy"),
        F.round(F.exp(F.col("ce_micro") / 1000000.0), 4).alias("ppl"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# B178: classifier calibration audit — reliability bins + ECE
# ---------------------------------------------------------------------------
# A quality classifier that gates a corpus must be CALIBRATED, not just
# discriminative: "score 0.8" should mean ~80% of such docs are actually
# good, or every downstream threshold is mislabeled. This op bins the
# B35 classifier's sigmoid scores into 10 confidence bins and compares
# mean predicted probability against the empirical positive rate per
# bin (the reliability diagram), then folds the gaps into the standard
# Expected Calibration Error (Guo et al., ICML'17): ECE = Σ n_b/N ·
# |acc_b − conf_b|. The outcome label here is a deterministic fixture
# stand-in (doc length ≥ 200 chars); a production run joins real labels
# through the same seam. Arithmetic: ONE rounded sigmoid per doc
# (micro), everything after is integer — both engines replay the bins
# and the ECE bit-for-bit. Scale: doc-key groupBy → ≤10-row bin table;
# the ECE window runs over those 10 rows.
CAL_LABEL_MIN_CHARS = 200


@register(
    "clf_calibration_ece",
    f"""
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), dtf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n FROM tf GROUP BY doc_id, t
), wt AS (
  SELECT doc_id, n,
         {_clf_weight_ddb(H.ddb_str_hash_fast('t') + f" % {CLF_BUCKETS}")} AS wi
  FROM dtf
), agg AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens, CAST(sum(n * wi) AS BIGINT) AS s
  FROM wt GROUP BY doc_id
), scored AS (
  SELECT a.doc_id,
         CAST(round(1000000.0 / (1.0 + exp(-(a.s / {CLF_W_SCALE}.0 / a.n_tokens)))) AS BIGINT)
           AS smicro,
         CASE WHEN d.n_chars >= {CAL_LABEL_MIN_CHARS} THEN 1 ELSE 0 END AS y
  FROM agg a JOIN documents d ON d.doc_id = a.doc_id
), bins AS (
  SELECT least(smicro * 10 // 1000000, 9) AS bin,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(smicro) // count(*) AS BIGINT) AS mean_conf_micro,
         CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS emp_pos_micro
  FROM scored GROUP BY bin
)
SELECT CAST(bin AS BIGINT) AS bin, n_docs, mean_conf_micro, emp_pos_micro,
       abs(mean_conf_micro - emp_pos_micro) AS gap_micro,
       CAST(sum(n_docs * abs(mean_conf_micro - emp_pos_micro)) OVER ()
            // sum(n_docs) OVER () AS BIGINT) AS ece_micro
FROM bins
ORDER BY bin
""",
)
def clf_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins + expected calibration error for the B35 quality
    classifier (B178) — one rounded sigmoid per doc, integer bins/gaps,
    the ECE window over the ≤10-row bin table."""
    d = read_table(spark, sf_dir, "documents")
    dtf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wt = dtf.select(
        "doc_id",
        "n",
        F.expr(_clf_weight_spark(H.spark_str_hash_fast("t") + f" % {CLF_BUCKETS}")).alias("wi"),
    )
    agg = wt.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.col("n") * F.col("wi")).cast("long").alias("s"),
    )
    scored = agg.join(d.select("doc_id", "n_chars"), "doc_id").select(
        F.round(
            1000000.0 / (1.0 + F.exp(-(F.col("s") / float(CLF_W_SCALE) / F.col("n_tokens"))))
        )
        .cast("long")
        .alias("smicro"),
        F.when(F.col("n_chars") >= CAL_LABEL_MIN_CHARS, 1).otherwise(0).alias("y"),
    )
    bins = (
        scored.groupBy(
            F.least(F.expr("smicro * 10 div 1000000"), F.lit(9)).cast("long").alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("sum(smicro) div count(*)").cast("long").alias("mean_conf_micro"),
            F.expr("sum(y) * 1000000 div count(*)").cast("long").alias("emp_pos_micro"),
        )
    )
    gap = F.abs(F.col("mean_conf_micro") - F.col("emp_pos_micro"))
    return (
        bins.select(
            "bin",
            "n_docs",
            "mean_conf_micro",
            "emp_pos_micro",
            gap.alias("gap_micro"),
            # integer div, not float /: bit-parity with the oracle's `//`
            F.expr(
                "sum(n_docs * abs(mean_conf_micro - emp_pos_micro)) OVER ()"
                " div sum(n_docs) OVER ()"
            )
            .cast("long")
            .alias("ece_micro"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# B189: per-source language-mismatch audit (ingest QA view of B119)
# ---------------------------------------------------------------------------
# The global confusion matrix (B119) says how the lang-ID heuristic
# behaves; an ingest pipeline needs the view per SOURCE: which feed is
# delivering documents whose detected language disagrees with its
# declared metadata — the signal that a crawler's lang tag is broken or
# a source changed underneath you. Reuses the registered B6 predictions
# verbatim (oracle embeds doc_lang_id's SQL as a CTE — the B107
# discipline, so this audit cannot drift from the op it audits).
def _source_lang_mismatch_oracle() -> str:
    return f"""
WITH pred AS ({_TQ_REGISTRY["doc_lang_id"].oracle})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN p.predicted_lang <> p.lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mismatch,
       CAST(sum(CASE WHEN p.predicted_lang = 'unknown' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unknown,
       CAST(sum(CASE WHEN p.predicted_lang <> p.lang THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS mismatch_ppm
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.source
ORDER BY d.source
"""


@register("source_lang_mismatch", _source_lang_mismatch_oracle())
def source_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source declared-vs-detected language disagreement rate (B189)
    — the feed-health alarm built on the registered B6 predictions."""
    d = read_table(spark, sf_dir, "documents")
    pred = doc_lang_id(spark, sf_dir).select("doc_id", "predicted_lang", "lang")
    return (
        pred.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("predicted_lang") != F.col("lang"), 1).otherwise(0))
            .cast("long")
            .alias("n_mismatch"),
            F.sum(F.when(F.col("predicted_lang") == "unknown", 1).otherwise(0))
            .cast("long")
            .alias("n_unknown"),
            F.expr(
                "sum(CASE WHEN predicted_lang <> lang THEN 1 ELSE 0 END) * 1000000"
                " div count(*)"
            )
            .cast("long")
            .alias("mismatch_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B191: boilerplate shingle hotlist (the crawl-cleaning review queue)
# ---------------------------------------------------------------------------
# Headers, footers, cookie banners, licence blurbs — boilerplate shows
# up as the SAME shingle in an implausible number of documents, and the
# cleaning recipe starts from exactly this table: the highest-document-
# frequency trigram shingles, how many sources each spans (one source →
# a template; many sources → web-wide boilerplate), and their corpus
# share. Top-20 by document frequency with deterministic tie-breaks.
# Scale: distinct (doc, shingle) incidence (the B34/B139 gram table),
# one uniform shingle-key count, global top-20 via TakeOrdered — no
# full sort.
HOTLIST_N = 3
HOTLIST_TOP = 20


@register(
    "boilerplate_shingle_hotlist",
    f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(t[CAST(i AS INT):CAST(i AS INT) + {HOTLIST_N} - 1], ' ') AS g
  FROM toks, unnest(range(1, len(t) - {HOTLIST_N} + 2)) AS r(i)
  WHERE len(t) >= {HOTLIST_N}
), df AS (
  SELECT g, CAST(count(*) AS BIGINT) AS doc_freq,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM grams GROUP BY g
), tot AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
SELECT g AS shingle, doc_freq, n_sources,
       CAST(doc_freq * 1000000 // tot.nd AS BIGINT) AS doc_share_ppm
FROM df CROSS JOIN tot
ORDER BY doc_freq DESC, shingle
LIMIT {HOTLIST_TOP}
""",
)
def boilerplate_shingle_hotlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top document-frequency trigram shingles with source spread (B191)
    — the boilerplate review queue crawl cleaning starts from."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.split("text", " ").alias("t"))
    grams = (
        toks.filter(F.size("t") >= HOTLIST_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {HOTLIST_N}),"
                    f" i -> array_join(slice(t, i + 1, {HOTLIST_N}), ' '))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    df_ = grams.groupBy("g").agg(
        F.count("*").cast("long").alias("doc_freq"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    tot = d.agg(F.count("*").cast("long").alias("nd"))
    return (
        df_.crossJoin(F.broadcast(tot))
        .select(
            F.col("g").alias("shingle"),
            "doc_freq",
            "n_sources",
            F.expr("doc_freq * 1000000 div nd").cast("long").alias("doc_share_ppm"),
        )
        .orderBy(F.col("doc_freq").desc(), "shingle")
        .limit(HOTLIST_TOP)
    )


# ---------------------------------------------------------------------------
# B197: classifier length-bias audit (Pearson r of score vs length)
# ---------------------------------------------------------------------------
# The classic silent failure of quality classifiers: they learn LENGTH,
# not quality, and the corpus they gate skews long. The audit is the
# exact Pearson correlation between the B35 score and document length —
# |r| near 1 means the "quality" signal is mostly length and the gate
# needs length-normalized features. Moment sums ride decimal(38,0)/
# HUGEINT (the B144 128-bit rule: Σxy at 1e9 docs × 1e10 per-doc
# product brushes int64); the single sqrt runs once over exact integer
# moments, so both engines emit the same r_milli.
def _clf_length_bias_oracle() -> str:
    return f"""
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), dtf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n FROM tf GROUP BY doc_id, t
), wt AS (
  SELECT doc_id, n,
         {_clf_weight_ddb(H.ddb_str_hash_fast('t') + f" % {CLF_BUCKETS}")} AS wi
  FROM dtf
), agg AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens, CAST(sum(n * wi) AS BIGINT) AS s
  FROM wt GROUP BY doc_id
), xy AS (
  SELECT CAST(d.n_chars AS HUGEINT) AS x,
         CAST(CAST(round(1000000.0 / (1.0 + exp(-(a.s / {CLF_W_SCALE}.0 / a.n_tokens))))
              AS BIGINT) AS HUGEINT) AS y
  FROM agg a JOIN documents d ON d.doc_id = a.doc_id
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(round((CAST(n * sxy - sx * sy AS DOUBLE))
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) * 1000) AS BIGINT)
         AS pearson_r_milli
FROM m
"""


@register("clf_length_bias_audit", _clf_length_bias_oracle())
def clf_length_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation of the B35 quality score against document
    length in milli units (B197) — |r| near 1 says the gate learned
    length, not quality."""
    d = read_table(spark, sf_dir, "documents")
    dtf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wt = dtf.select(
        "doc_id",
        "n",
        F.expr(_clf_weight_spark(H.spark_str_hash_fast("t") + f" % {CLF_BUCKETS}")).alias("wi"),
    )
    agg = wt.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.col("n") * F.col("wi")).cast("long").alias("s"),
    )
    xy = agg.join(d.select("doc_id", "n_chars"), "doc_id").select(
        F.col("n_chars").cast("decimal(38,0)").alias("x"),
        F.round(
            1000000.0 / (1.0 + F.exp(-(F.col("s") / float(CLF_W_SCALE) / F.col("n_tokens"))))
        )
        .cast("long")
        .cast("decimal(38,0)")
        .alias("y"),
    )
    m = xy.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
            / F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
            * 1000
        )
        .cast("long")
        .alias("pearson_r_milli"),
    )


# ---------------------------------------------------------------------------
# B205: code-switching (mixed-language) document detector
# ---------------------------------------------------------------------------
# Language-ID (B6) gives ONE label per document; mixed-language content
# — boilerplate in English wrapping body text in another language, or
# genuine code-switching — is precisely what a single label hides, and
# it poisons both per-language corpora and tokenizer statistics. A doc
# counts as mixed when MARKERS FROM 2+ LANGUAGES fire (shared-marker
# aliasing, e.g. fr/es 'la'/'un' and zh's romanized 'de'/'le', is
# deliberately visible: the summary is the ingest alarm, the per-doc
# flags feed a human review). Per source: mixed-doc count/rate and the
# mean number of firing languages in micro units. One map pass over
# the same marker scores as B6 + a bounded source groupBy.
@register(
    "doc_code_switch_summary",
    f"""
WITH s AS (
  SELECT doc_id, source,
         { " + ".join(
             "CASE WHEN len(list_intersect(list_distinct(string_split(text, ' ')), ["
             + ", ".join(f"''{m}''" for m in ms).replace("''", "'")
             + "])) > 0 THEN 1 ELSE 0 END"
             for ms in LANG_MARKERS.values()
         ) } AS n_langs_hit
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_langs_hit >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
       CAST(sum(CASE WHEN n_langs_hit >= 2 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS mixed_ppm,
       CAST(sum(n_langs_hit) * 1000000 // count(*) AS BIGINT) AS mean_langs_micro
FROM s
GROUP BY source
ORDER BY source
""",
)
def doc_code_switch_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixed-language (code-switching) rates from the B6
    marker scores (B205) — docs where markers of 2+ languages fire; the
    single-label blind spot, surfaced."""
    d = read_table(spark, sf_dir, "documents")
    hit = None
    for ms in LANG_MARKERS.values():
        h = F.when(_lang_score_spark(ms) > 0, 1).otherwise(0)
        hit = h if hit is None else hit + h
    s = d.select("source", hit.alias("n_langs_hit"))
    return (
        s.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_langs_hit") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_mixed"),
            F.expr(
                "sum(CASE WHEN n_langs_hit >= 2 THEN 1 ELSE 0 END) * 1000000 div count(*)"
            )
            .cast("long")
            .alias("mixed_ppm"),
            F.expr("sum(n_langs_hit) * 1000000 div count(*)")
            .cast("long")
            .alias("mean_langs_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B250: conformal novelty detection — distribution-free anomaly gates with
# a finite-sample guarantee
# ---------------------------------------------------------------------------
# Every threshold-based quality gate above picks its cutoff by eye; split
# conformal inference picks it with a THEOREM: score a clean calibration
# set, and flag a new doc when its conformal p-value
#   p = (1 + #{cal nonconformity >= s}) / (n_cal + 1)
# is <= alpha — then the false-alarm rate on exchangeable data is <= alpha
# BY CONSTRUCTION, no distributional assumption. Nonconformity here is
# the inverted integer-micro quality score (low quality = anomalous),
# QUANTIZED TO MILLI so its cardinality is bounded by construction
# (<= 1001 values — the house bounded-two-form discipline): the
# calibration set reduces to a <= 1001-row histogram with a reverse
# running count (window over the AGGREGATE), and every scored doc reads
# #{cal >= s} from that broadcast — at 100 TB the calibration pass is one
# map-side-partial groupBy and scoring is a broadcast-hash lookup, no
# sort, no per-doc rank join. Calibration = even-id English docs; audited
# populations: the odd-id English holdout (the VALIDITY check — flag rate
# must respect alpha) and the non-English pool (the shift detector the
# gate exists for). Everything integer: p-decision is
#   (1 + cnt_ge) * 1_000_000 <= alpha_ppm * (n_cal + 1).
_CONF_ALPHAS_PPM = [10000, 50000, 100000]  # 1%, 5%, 10%

_QMICRO_SQL = (
    "(400000 * n_distinct // n_tokens"
    " + 300000 * least(n_tokens, 100) // 100"
    " + 300000 * (n_tokens - n_stop) // n_tokens)"
)
_QMICRO_SPARK = (
    "(400000 * n_distinct div n_tokens"
    " + 300000 * least(n_tokens, 100) div 100"
    " + 300000 * (n_tokens - n_stop) div n_tokens)"
)


@register(
    "doc_conformal_novelty_audit",
    f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, lang, len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         len(list_filter(toks, x -> list_contains({_STOPWORDS!r}, x))) AS n_stop
  FROM t
), scored AS (
  SELECT doc_id, lang, (1000000 - {_QMICRO_SQL}) // 1000 AS s_milli FROM m
), cal AS (
  SELECT s_milli FROM scored WHERE lang = 'en' AND doc_id % 2 = 0
), cal_hist AS (
  SELECT s_milli, count(*) AS c FROM cal GROUP BY s_milli
), cal_cum AS (
  SELECT s_milli,
         sum(c) OVER (ORDER BY s_milli DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt_ge
  FROM cal_hist
), n_cal AS (
  SELECT count(*) AS n FROM cal
), pops AS (
  SELECT CASE WHEN lang = 'en' THEN 'good_holdout' ELSE 'shifted' END AS population,
         s_milli
  FROM scored WHERE NOT (lang = 'en' AND doc_id % 2 = 0)
), pvals AS (
  SELECT p.population, p.s_milli,
         1 + COALESCE((SELECT max(cnt_ge) FROM cal_cum c
                       WHERE c.s_milli >= p.s_milli), 0) AS p_num
  FROM pops p
), alphas(alpha_ppm) AS (VALUES {", ".join(f"({a})" for a in _CONF_ALPHAS_PPM)})
SELECT CAST(a.alpha_ppm AS BIGINT) AS alpha_ppm, v.population,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN v.p_num * 1000000 <= a.alpha_ppm * (n.n + 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(sum(CASE WHEN v.p_num * 1000000 <= a.alpha_ppm * (n.n + 1)
                     THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS flag_rate_ppm,
       CAST(max(n.n) AS BIGINT) AS n_cal
FROM pvals v CROSS JOIN n_cal n CROSS JOIN alphas a
GROUP BY a.alpha_ppm, v.population
ORDER BY alpha_ppm, population
""",
)
def doc_conformal_novelty_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal novelty gate (B250): exact integer conformal
    p-values from a bounded milli-quantized nonconformity histogram;
    per (alpha, population) the flag rate — validity on the English
    holdout, power on the shifted pool."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    m = d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )
    scored = m.select(
        "doc_id",
        "lang",
        F.expr(f"(1000000 - {_QMICRO_SPARK}) div 1000").cast("long").alias("s_milli"),
    )
    cal = scored.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
    cal_hist = cal.groupBy("s_milli").agg(F.count("*").alias("c"))
    w_ge = Window.orderBy(F.col("s_milli").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cal_cum = cal_hist.select("s_milli", F.sum("c").over(w_ge).alias("cnt_ge"))
    n_cal = cal.agg(F.count("*").alias("n"))
    pops = scored.filter(~((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))).select(
        F.when(F.col("lang") == "en", "good_holdout").otherwise("shifted").alias("population"),
        "s_milli",
    )
    # reduce the scored pool to its own bounded (population, s_milli)
    # histogram FIRST (so n_at counts docs, and the range join below is
    # histogram x histogram — <= 1001 x 1001 rows, never per-doc), then
    # read #{cal >= s} as the max reverse-cumulative count over cal
    # levels >= s
    pop_hist = pops.groupBy("population", "s_milli").agg(F.count("*").alias("n_at"))
    pvals = (
        pop_hist.join(
            F.broadcast(cal_cum.withColumnsRenamed({"s_milli": "cal_s"})),
            F.col("cal_s") >= F.col("s_milli"),
            "left",
        )
        .groupBy("population", "s_milli", "n_at")
        .agg((F.lit(1) + F.coalesce(F.max("cnt_ge"), F.lit(0))).alias("p_num"))
    )
    alphas = spark.createDataFrame([(a,) for a in _CONF_ALPHAS_PPM], "alpha_ppm: long")
    flagged = F.when(
        F.col("p_num") * 1000000 <= F.col("alpha_ppm") * (F.col("n") + 1), F.col("n_at")
    ).otherwise(0)
    return (
        pvals.crossJoin(F.broadcast(n_cal))
        .crossJoin(F.broadcast(alphas))
        .groupBy("alpha_ppm", "population")
        .agg(
            F.sum("n_at").cast("long").alias("n_docs"),
            F.sum(flagged).cast("long").alias("n_flagged"),
            F.expr(
                "sum(CASE WHEN p_num * 1000000 <= alpha_ppm * (n + 1) THEN n_at ELSE 0 END)"
                " * 1000000 div sum(n_at)"
            )
            .cast("long")
            .alias("flag_rate_ppm"),
            F.max("n").cast("long").alias("n_cal"),
        )
        .orderBy("alpha_ppm", "population")
    )


# ---------------------------------------------------------------------------
# B251: Pareto skyline — the (length, quality) frontier as an operator
# ---------------------------------------------------------------------------
# "Give me the documents no other document beats on BOTH length and
# quality" — the skyline / Pareto-frontier operator classic in multi-
# criteria curation (pick exemplars per length budget without collapsing
# the two axes into one weighted score, as B102's curriculum must). The
# naive semantics is an all-pairs dominance anti-join; the 2-D
# scale-correct form factors through the bounded token-length axis: per
# distinct length the max quality (one map-side-partial groupBy), then a
# running max over STRICTLY LONGER lengths on that aggregate (an
# unpartitioned window, but over the <= |distinct lengths| aggregate —
# the plan-rule-sanctioned shape), and a length is on the frontier iff
# its best quality strictly beats every longer length's (ties lose to
# the longer doc: dominance needs one strict axis, and length provides
# it). Frontier docs = docs at a frontier length holding exactly its max
# quality; equal (length, quality) twins are mutually non-dominating and
# all kept. Quality is the B250 integer micro score — exact in both
# engines.
@register(
    "doc_pareto_skyline",
    f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         len(list_filter(toks, x -> list_contains({_STOPWORDS!r}, x))) AS n_stop
  FROM t
), q AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST({_QMICRO_SQL} AS BIGINT) AS quality_micro
  FROM m
), lv AS (
  SELECT n_tokens, max(quality_micro) AS best_q FROM q GROUP BY n_tokens
), sky AS (
  SELECT n_tokens, best_q,
         COALESCE(max(best_q) OVER (ORDER BY n_tokens DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS max_longer
  FROM lv
)
SELECT d.doc_id, d.n_tokens, d.quality_micro
FROM q d JOIN sky s ON s.n_tokens = d.n_tokens AND d.quality_micro = s.best_q
WHERE s.best_q > s.max_longer
ORDER BY d.n_tokens DESC, d.doc_id
""",
)
def doc_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier documents over (token length, integer quality)
    (B251): per-length max quality + a running max over longer lengths —
    the bounded-axis factorization of the dominance anti-join."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    m = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )
    q = m.select(
        "doc_id", "n_tokens", F.expr(_QMICRO_SPARK).cast("long").alias("quality_micro")
    )
    lv = q.groupBy("n_tokens").agg(F.max("quality_micro").alias("best_q"))
    w_longer = Window.orderBy(F.col("n_tokens").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = lv.select(
        "n_tokens",
        "best_q",
        F.coalesce(F.max("best_q").over(w_longer), F.lit(-1)).alias("max_longer"),
    ).filter(F.col("best_q") > F.col("max_longer"))
    return (
        q.join(F.broadcast(sky), "n_tokens")
        .filter(F.col("quality_micro") == F.col("best_q"))
        .select("doc_id", "n_tokens", "quality_micro")
        .orderBy(F.col("n_tokens").desc(), "doc_id")
    )


# ---------------------------------------------------------------------------
# B273: isotonic recalibration of the quality classifier (PAV) (r13)
# ---------------------------------------------------------------------------
# B178 MEASURES miscalibration (ECE); this op FIXES it: the standard
# remedy is isotonic regression — the monotone step function closest in
# weighted L2 to the per-bin empirical rates (Zadrozny & Elkan, KDD'02),
# classically fit with the sequential pool-adjacent-violators pass.
# Sequential is fine: PAV runs on the ≤20-row BIN AGGREGATE, never the
# corpus — but a sequential stack is awkward to replay in SQL, so both
# engines use the closed-form minimax identity instead:
#
#   fitted[k] = max_{i<=k} min_{j>=k} weightedMean(bins i..j)
#
# (Robertson-Wright-Dykstra, "Order Restricted Statistical Inference").
# All (i, j) interval means come from one cumulative pass over the bin
# table (<=210 pairs at 20 bins); the micro-FLOORED minimax equals
# floor(exact PAV) because floor is monotone and so commutes with both
# min and max over finite sets — the integer result is bit-exact on
# both engines AND provably the floored real PAV fit (pytest pins this
# against an exact-Fraction pool-adjacent-violators replay, plus the
# monotonicity and weighted-mean-preservation laws). Scale: one doc
# aggregate -> 20-bin table -> O(bins³) driver-free arithmetic on
# broadcast frames.
ISO_BINS = 20


def _iso_scored_ddb() -> str:
    return f"""
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), dtf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n FROM tf GROUP BY doc_id, t
), wt AS (
  SELECT doc_id, n,
         {_clf_weight_ddb(H.ddb_str_hash_fast('t') + f" % {CLF_BUCKETS}")} AS wi
  FROM dtf
), agg AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens, CAST(sum(n * wi) AS BIGINT) AS s
  FROM wt GROUP BY doc_id
), scored AS (
  SELECT a.doc_id,
         CAST(round(1000000.0 / (1.0 + exp(-(a.s / {CLF_W_SCALE}.0 / a.n_tokens)))) AS BIGINT)
           AS smicro,
         CASE WHEN d.n_chars >= {CAL_LABEL_MIN_CHARS} THEN 1 ELSE 0 END AS y
  FROM agg a JOIN documents d ON d.doc_id = a.doc_id
"""


@register(
    "clf_isotonic_calibration",
    f"""
WITH tf AS ({_iso_scored_ddb()}), bins AS (
  SELECT least(smicro * {ISO_BINS} // 1000000, {ISO_BINS - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(smicro) // count(*) AS BIGINT) AS mean_conf_micro,
         CAST(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY bin
), cum AS (
  SELECT bin, n_docs, mean_conf_micro, pos,
         sum(n_docs) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn,
         sum(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cp
  FROM bins
), pairs AS (
  SELECT i.bin AS bi, j.bin AS bj,
         (j.cp - (i.cp - i.pos)) * 1000000 // (j.cn - (i.cn - i.n_docs)) AS mean_micro
  FROM cum i JOIN cum j ON i.bin <= j.bin
), mk AS (
  SELECT k.bin AS bin, p.bi, min(p.mean_micro) AS mn
  FROM cum k JOIN pairs p ON p.bi <= k.bin AND p.bj >= k.bin
  GROUP BY k.bin, p.bi
), fit AS (
  SELECT bin, CAST(max(mn) AS BIGINT) AS iso_fit_micro FROM mk GROUP BY bin
)
SELECT CAST(b.bin AS BIGINT) AS bin, b.n_docs, b.mean_conf_micro,
       CAST(b.pos * 1000000 // b.n_docs AS BIGINT) AS emp_pos_micro,
       f.iso_fit_micro
FROM bins b JOIN fit f ON f.bin = b.bin
ORDER BY b.bin
""",
)
def clf_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) recalibration map for the B35 classifier (B273):
    minimax closed form over the 20-bin reliability aggregate; the
    floored fit is exactly floor(real PAV) by monotonicity of floor."""
    d = read_table(spark, sf_dir, "documents")
    dtf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wt = dtf.select(
        "doc_id",
        "n",
        F.expr(_clf_weight_spark(H.spark_str_hash_fast("t") + f" % {CLF_BUCKETS}")).alias("wi"),
    )
    agg = wt.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.col("n") * F.col("wi")).cast("long").alias("s"),
    )
    scored = agg.join(d.select("doc_id", "n_chars"), "doc_id").select(
        F.round(
            1000000.0 / (1.0 + F.exp(-(F.col("s") / float(CLF_W_SCALE) / F.col("n_tokens"))))
        )
        .cast("long")
        .alias("smicro"),
        F.when(F.col("n_chars") >= CAL_LABEL_MIN_CHARS, 1).otherwise(0).alias("y"),
    )
    bins = scored.groupBy(
        F.least(F.expr(f"smicro * {ISO_BINS} div 1000000"), F.lit(ISO_BINS - 1))
        .cast("long")
        .alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("sum(smicro) div count(*)").cast("long").alias("mean_conf_micro"),
        F.sum("y").cast("long").alias("pos"),
    ).localCheckpoint(eager=True)
    # ^ the 20-row reliability table feeds the cumulative view, the PAV
    # pair grid, and the final join — without the cut each branch
    # re-executes the corpus classifier chain behind it (30 exchanges /
    # 16 scans in the r14-before plan; r14 opt)
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "n_docs",
        "mean_conf_micro",
        "pos",
        F.sum("n_docs").over(w_cum).alias("cn"),
        F.sum("pos").over(w_cum).alias("cp"),
    )
    ci = cum.select(
        F.col("bin").alias("bi"),
        (F.col("cp") - F.col("pos")).alias("cp0"),
        (F.col("cn") - F.col("n_docs")).alias("cn0"),
    )
    pairs = (
        F.broadcast(ci)
        .join(F.broadcast(cum.select(F.col("bin").alias("bj"), F.col("cp").alias("cpj"), F.col("cn").alias("cnj"))), F.col("bi") <= F.col("bj"))
        .select(
            "bi",
            "bj",
            F.expr("(cpj - cp0) * 1000000 div (cnj - cn0)").alias("mean_micro"),
        )
    )
    mk = (
        F.broadcast(cum.select(F.col("bin")))
        .join(
            F.broadcast(pairs),
            (F.col("bi") <= F.col("bin")) & (F.col("bj") >= F.col("bin")),
        )
        .groupBy("bin", "bi")
        .agg(F.min("mean_micro").alias("mn"))
    )
    fit = mk.groupBy("bin").agg(F.max("mn").cast("long").alias("iso_fit_micro"))
    return (
        bins.join(F.broadcast(fit), "bin")
        .select(
            "bin",
            "n_docs",
            "mean_conf_micro",
            F.expr("pos * 1000000 div n_docs").cast("long").alias("emp_pos_micro"),
            "iso_fit_micro",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# B280: character-entropy quality gate (r13)
# ---------------------------------------------------------------------------
# The cheapest junk detector there is: keyboard-mash, base64 blobs, and
# single-character padding all sit at the character-distribution
# extremes that token-level gates (B10 repetition, B33 perplexity) are
# too coarse to see. Shannon entropy of the per-doc character histogram
# over the first 2000 chars (quality gates read prefixes — the corpus
# profiling sampling discipline), in the exact B183 integer contract:
# each char's −ln(p) rounds ONCE to micro-nats, the doc entropy is the
# count-weighted integer mean, so both engines replay it bit-for-bit.
# Gate: < 2.0 nats flags pathologically-concentrated text (natural
# language sits ~3-4.3 nats/char). Scale: a bounded per-doc char
# explode + two uniform groupBys — map-side, output |docs| rows.
_ENTROPY_PREFIX_CHARS = 2000
_ENTROPY_GATE_MICRONAT = 2_000_000


@register(
    "doc_char_entropy_gate",
    f"""
WITH ch AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
  FROM documents, unnest(range(1, least(length(text), {_ENTROPY_PREFIX_CHARS}) + 1)) AS t(i)
  WHERE length(text) > 0
), dc AS (
  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY doc_id, c
), tot AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS n_distinct
  FROM dc GROUP BY doc_id
)
SELECT d.doc_id, t.nt AS n_chars_counted, t.n_distinct AS n_distinct_chars,
       CAST(sum(d.n * CAST(round(-ln(d.n * 1.0 / t.nt) * 1000000) AS BIGINT)) // t.nt
            AS BIGINT) AS entropy_micronat,
       CAST(CASE WHEN sum(d.n * CAST(round(-ln(d.n * 1.0 / t.nt) * 1000000) AS BIGINT)) // t.nt
                      < {_ENTROPY_GATE_MICRONAT} THEN 1 ELSE 0 END AS BIGINT) AS low_entropy_flag
FROM dc d JOIN tot t ON t.doc_id = d.doc_id
GROUP BY d.doc_id, t.nt, t.n_distinct
ORDER BY d.doc_id
""",
)
def doc_char_entropy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc character-distribution Shannon entropy in exact integer
    micro-nats with the < 2-nat junk gate (B280)."""
    d = read_table(spark, sf_dir, "documents")
    # empty text guard: Spark sequence(1, 0) defaults to step=-1 and yields
    # [1, 0] while the DuckDB range() is empty — filter on both engines.
    #
    # r14 opt: the per-character histogram is computed IN-ROW (sort the
    # prefix's char array, take run lengths at the sorted boundaries)
    # instead of exploding ≤2000 rows per document through two shuffled
    # groupBys and a join — the same exact integer counts, zero
    # exchanges before the final ORDER BY (2.2 → ~0.6 s at sf0.1).
    # try_element_at (not element_at): ANSI mode throws on the j+1
    # lookahead past the array end.
    expr = f"""
    transform(
      array(array_sort(split(substring(text, 1, {_ENTROPY_PREFIX_CHARS}), ''))),
      s -> named_struct(
        'nt', size(s),
        'starts', filter(sequence(1, size(s)),
                         i -> i = 1 OR element_at(s, i) != element_at(s, i - 1))
      )
    )[0]
    """
    base = d.where(F.length("text") > 0).select(
        "doc_id", F.expr(expr).alias("h")
    )
    runs = (
        "transform(sequence(1, size(h.starts)),"
        " j -> coalesce(try_element_at(h.starts, j + 1), h.nt + 1)"
        "      - element_at(h.starts, j))"
    )
    ent_sum = (
        f"aggregate({runs}, cast(0 as bigint),"
        " (acc, r) -> acc + r * cast(round(-ln(r * 1.0 / h.nt) * 1000000) as bigint))"
    )
    ent = F.expr(f"({ent_sum}) div h.nt").cast("long")
    return base.select(
        "doc_id",
        F.expr("cast(h.nt as bigint)").alias("n_chars_counted"),
        F.expr("cast(size(h.starts) as bigint)").alias("n_distinct_chars"),
        ent.alias("entropy_micronat"),
        F.when(ent < _ENTROPY_GATE_MICRONAT, 1)
        .otherwise(0)
        .cast("long")
        .alias("low_entropy_flag"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# B284: repeated-substring profile — rolling-hash window dedup per doc
# ---------------------------------------------------------------------------
# B10 counts repeated LINES and B34 repeated token n-grams; copy-paste
# and templating artifacts live at the CHARACTER level and at many
# lengths at once. The suffix-array answer (THE longest repeated
# substring) is inherently sequential, but its decision version is not:
# "does the doc repeat any window of length L?" is a hash-groupBy over
# the doc's L-windows — so a FIXED GRID of L ∈ {8,16,32,64,128} over
# the 2000-char prefix gives the repetition-by-scale profile (the
# binary-search levels, evaluated together), and max L with a duplicate
# brackets the true longest repeat within 2×. Window identity is the
# md5 of the window text (the house content-hash discipline — exact,
# collision-odds negligible at 2000 windows/doc). Per (doc, L):
# windows, distinct windows, duplicated-window share. Scale: bounded
# per-doc explode (≤5·2000 windows), map-side groupBy — the corpus is
# touched once.
_REPEAT_LS = (8, 16, 32, 64, 128)
_REPEAT_PREFIX = 2000


@register(
    "doc_repeat_span_profile",
    f"""
WITH ls AS (
  SELECT unnest(ARRAY[{", ".join(str(x) for x in _REPEAT_LS)}]) AS l
), w AS (
  SELECT d.doc_id, ls.l, md5(substr(d.text, CAST(i AS INT), ls.l)) AS wh
  FROM documents d
  CROSS JOIN ls
  CROSS JOIN unnest(range(1, greatest(least(length(d.text), {_REPEAT_PREFIX}) - ls.l + 1, 0) + 1)) AS t(i)
  WHERE length(d.text) >= ls.l
), g AS (
  SELECT doc_id, l, wh, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY doc_id, l, wh
)
SELECT doc_id, CAST(l AS BIGINT) AS win_len,
       CAST(sum(n) AS BIGINT) AS n_windows,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_windows,
       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000 // sum(n) AS BIGINT)
         AS dup_share_ppm
FROM g
GROUP BY doc_id, l
ORDER BY doc_id, win_len
""",
)
def doc_repeat_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-window repetition profile per doc across the length
    grid (B284) — the decision version of longest-repeated-substring as
    one bounded hash-groupBy; max duplicated L brackets the true
    longest repeat within 2×."""
    d = read_table(spark, sf_dir, "documents")
    ls = spark.createDataFrame([(x,) for x in _REPEAT_LS], "l int")
    w = (
        d.crossJoin(F.broadcast(ls))
        .filter(F.length("text") >= F.col("l"))
        .select(
            "doc_id",
            "l",
            F.explode(
                F.expr(
                    f"sequence(1, greatest(least(length(text), {_REPEAT_PREFIX}) - l + 1, 0))"
                )
            ).alias("i"),
            "text",
        )
        .select("doc_id", "l", F.expr("md5(substring(text, i, l))").alias("wh"))
    )
    g = w.groupBy("doc_id", "l", "wh").agg(F.count("*").cast("long").alias("n"))
    return (
        g.groupBy("doc_id", F.col("l").cast("long").alias("win_len"))
        .agg(
            F.sum("n").cast("long").alias("n_windows"),
            F.count("*").cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.expr("sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000 div sum(n)")
            .cast("long")
            .alias("dup_share_ppm"),
        )
        .orderBy("doc_id", "win_len")
    )


# ---------------------------------------------------------------------------
# B286: negative-sampling table (unigram^0.75) with integer sampling ranges
# ---------------------------------------------------------------------------
# Contrastive training (word2vec negatives, hard-negative mixing,
# retrieval pre-training) samples from the smoothed unigram U(w)^0.75 —
# the classical temper that up-weights the tail without letting the
# head dominate. This op materializes the sampling TABLE: top-200
# vocabulary with the smoothed weight, its ppm share, and CUMULATIVE
# integer ranges [cum_lo, cum_hi) so a sampler draws one uniform
# integer and binary-searches a 200-row broadcast table — no float RNG
# in the hot path, reproducible by construction. Determinism across
# engines: c^0.75 = sqrt(sqrt(c³)) using only IEEE-correctly-rounded
# ops (sqrt is exact-rounded by the standard; pow/exp are NOT), rounded
# ONCE. Scale: one token count, one top-k, windows over the 200-row
# aggregate.
NEG_SAMPLE_VOCAB = 200


@register(
    "doc_negative_sampling_table",
    f"""
WITH tf AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
), cnt AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c FROM tf WHERE t <> '' GROUP BY t
), top AS (
  SELECT t, c FROM (
    SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS rn FROM cnt
  ) WHERE rn <= {NEG_SAMPLE_VOCAB}
), w AS (
  SELECT t, c,
         CAST(round(sqrt(sqrt(CAST(c AS DOUBLE) * c * c))) AS BIGINT) AS w75
  FROM top
), s AS (
  SELECT t, c, w75,
         CAST(sum(w75) OVER () AS BIGINT) AS tot,
         CAST(coalesce(sum(w75) OVER (ORDER BY c DESC, t
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_lo
  FROM w
)
SELECT t AS token, c AS cnt, w75,
       CAST(w75 * 1000000 // tot AS BIGINT) AS weight_ppm,
       cum_lo, CAST(cum_lo + w75 AS BIGINT) AS cum_hi
FROM s
ORDER BY cnt DESC, token
""",
)
def doc_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram^0.75 negative-sampling table with exact integer
    cumulative ranges (B286) — sqrt(sqrt(c³)) keeps the smoothing
    engine-deterministic where pow() is not."""
    d = read_table(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w_top = Window.orderBy(F.col("c").desc(), "t")
    top = cnt.withColumn("rn", F.row_number().over(w_top)).filter(
        F.col("rn") <= NEG_SAMPLE_VOCAB
    )
    w = top.select(
        "t",
        "c",
        F.round(F.sqrt(F.sqrt(F.col("c").cast("double") * F.col("c") * F.col("c"))))
        .cast("long")
        .alias("w75"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy(F.col("c").desc(), "t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        w.withColumn("tot", F.sum("w75").over(w_all).cast("long"))
        .withColumn("cum_lo", F.coalesce(F.sum("w75").over(w_cum), F.lit(0)).cast("long"))
        .select(
            F.col("t").alias("token"),
            F.col("c").alias("cnt"),
            "w75",
            F.expr("w75 * 1000000 div tot").cast("long").alias("weight_ppm"),
            "cum_lo",
            (F.col("cum_lo") + F.col("w75")).cast("long").alias("cum_hi"),
        )
        .orderBy(F.col("cnt").desc(), "token")
    )

# ---------------------------------------------------------------------------
# B291: exact longest repeated substring via rolling binary search (r14)
# ---------------------------------------------------------------------------
# B284 brackets the longest repeat within 2× on a fixed L-grid; this op
# REFINES the bracket to the exact maximum with the classic rolling-hash
# + binary-search construction (Karp–Rabin): "∃ a doc whose prefix
# repeats some L-window" is MONOTONE in L (equal length-L windows at
# distinct positions imply equal length-(L−1) prefixes at those same
# positions), so ⌈log₂ 256⌉ = 8 hash-groupBy decision jobs pin the true
# max over the 256-char prefix. Driver state is two integers (lo/hi) —
# the documented bounded-driver-loop shape (the hnsw/kmeans discipline);
# every decision job is one distributed explode + groupBy, never a
# collect of rows. Window identity is the md5 of the window text (the
# B284 house discipline). The DuckDB oracle cannot replay a data-
# dependent search path, so it pays the FULL L-grid (Σ_L windows ≈
# len²/2 per doc — fine at oracle scale, exactly the cost the binary
# search exists to avoid at corpus scale) and reads off the same max.
_LRS_PREFIX = 256


@register(
    "doc_longest_repeat_exact",
    f"""
WITH w AS (
  SELECT d.doc_id, CAST(t2.l AS BIGINT) AS l,
         md5(substr(d.text, CAST(i AS INT), CAST(t2.l AS INT))) AS wh
  FROM documents d
  CROSS JOIN unnest(range(1, {_LRS_PREFIX})) AS t2(l)
  CROSS JOIN unnest(range(1, greatest(least(length(d.text), {_LRS_PREFIX}) - t2.l + 1, 0) + 1)) AS t(i)
), dup AS (
  SELECT doc_id, l FROM w GROUP BY doc_id, l, wh HAVING count(*) > 1
), byl AS (
  SELECT l, doc_id FROM dup GROUP BY l, doc_id
), mx AS (
  SELECT coalesce(max(l), 0) AS ml FROM byl
)
SELECT CAST(mx.ml AS BIGINT) AS max_repeat_len,
       CAST(coalesce((SELECT count(*) FROM byl WHERE byl.l = mx.ml), 0) AS BIGINT)
         AS n_docs_at_max,
       CAST(coalesce((SELECT min(b.doc_id) FROM byl b WHERE b.l = mx.ml), -1) AS BIGINT)
         AS min_doc_id
FROM mx
""",
)
def doc_longest_repeat_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-max repeated-window length over 256-char prefixes
    (B291): per-doc binary search on the monotone dup-at-L decision,
    run INSIDE one Arrow kernel (a per-record sequential algorithm is
    exactly the mapInPandas case — the r14 first cut ran the search as
    8 driver-coordinated whole-corpus jobs and paid ~2.5 s of fixed
    job overhead per round); one corpus pass + a 1-row agg. Ties
    resolved to the smallest doc_id; exact substring comparison, no
    hash in the decision at all."""
    # few-file corpus at test scale → spread the python workers; the
    # kernel is consumed by two passes (corpus max, then stats at the
    # max), so 32-way parallelism is what bounds the wall clock
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(f"substring(text, 1, {_LRS_PREFIX})").alias("p"))
        .repartition(32)
    )

    def _lrs_kernel(batches):
        import pandas as pd_

        for pdf in batches:
            out = []
            for doc_id, s in zip(pdf["doc_id"], pdf["p"]):
                n = len(s)

                def has_dup(ln: int) -> bool:
                    seen = set()
                    for i in range(n - ln + 1):
                        w = s[i : i + ln]
                        if w in seen:
                            return True
                        seen.add(w)
                    return False

                # invariant: dup at lo (L=0 sentinel), none at hi
                # (a single full-length window cannot repeat)
                lo, hi = 0, n
                while hi - lo > 1:
                    mid = (lo + hi) // 2
                    if has_dup(mid):
                        lo = mid
                    else:
                        hi = mid
                out.append((doc_id, lo))
            yield pd_.DataFrame(out, columns=["doc_id", "lrs"])

    per = d.mapInPandas(_lrs_kernel, "doc_id long, lrs long")
    mx = per.agg(F.max("lrs").alias("ml"))
    stats = (
        per.crossJoin(F.broadcast(mx))
        .filter((F.col("lrs") == F.col("ml")) & (F.col("ml") > 0))
        .agg(F.count("*").cast("long").alias("nd"), F.min("doc_id").alias("md"))
    )
    return mx.crossJoin(F.broadcast(stats)).select(
        F.col("ml").cast("long").alias("max_repeat_len"),
        F.coalesce("nd", F.lit(0)).cast("long").alias("n_docs_at_max"),
        F.coalesce("md", F.lit(-1)).cast("long").alias("min_doc_id"),
    )


# ---------------------------------------------------------------------------
# B303: inverted-index posting-list planner (r14)
# ---------------------------------------------------------------------------
# The BM25 family (B29 search, B15 TF-IDF) assumes an inverted index
# exists; this op PLANS it — the sizing pass a search-index build runs
# first. Per distinct term: document frequency, posting bytes (df × 8 —
# docid+freq pairs), skip-block count at the classical 128-entry block
# size. The ledger states the stopword decision as measured numbers:
# terms with df > 20% of the corpus are cut, and the rows report how
# many postings/bytes the cut saves vs how many terms it costs — the
# trade every index config makes blind. Top-15 terms by df (the cut
# candidates) + ledger columns on every row. One token-explode +
# groupBy; windows over the distinct-term table only.
_POST_BLOCK = 128


@register(
    "term_posting_plan",
    f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), df AS (
  SELECT t, CAST(count(*) AS BIGINT) AS df FROM toks WHERE t <> '' GROUP BY t
), nd AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents
), led AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(df.df) AS BIGINT) AS total_postings,
         CAST(sum(df.df * 8) AS BIGINT) AS total_bytes,
         CAST(sum(CASE WHEN df.df * 5 > n.n_docs THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stopwords,
         CAST(sum(CASE WHEN df.df * 5 > n.n_docs THEN df.df ELSE 0 END) AS BIGINT)
           AS postings_cut,
         CAST(sum(CASE WHEN df.df * 5 > n.n_docs THEN df.df * 8 ELSE 0 END) AS BIGINT)
           AS bytes_cut
  FROM df CROSS JOIN nd n
), top AS (
  SELECT t, df, row_number() OVER (ORDER BY df DESC, t) AS rnk FROM df
)
SELECT top.t AS term, top.df,
       CAST(top.df * 8 AS BIGINT) AS posting_bytes,
       CAST((top.df + {_POST_BLOCK - 1}) // {_POST_BLOCK} AS BIGINT) AS skip_blocks,
       CAST(CASE WHEN top.df * 5 > n.n_docs THEN 1 ELSE 0 END AS BIGINT) AS is_stopword,
       CAST(top.rnk AS BIGINT) AS rnk,
       n.n_docs, led.n_terms, led.total_postings, led.total_bytes,
       led.n_stopwords, led.postings_cut, led.bytes_cut
FROM top CROSS JOIN nd n CROSS JOIN led
WHERE top.rnk <= 15
ORDER BY rnk
""",
)
def term_posting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index sizing plan (B303): per-term df/bytes/skip-blocks,
    the 20%-df stopword cut as measured savings, top-15 cut candidates."""
    d = read_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
    )
    df = toks.groupBy("t").agg(F.count("*").cast("long").alias("df"))
    nd = d.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    led = df.crossJoin(F.broadcast(nd)).agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("total_postings"),
        F.sum(F.col("df") * 8).cast("long").alias("total_bytes"),
        F.sum(F.when(F.col("df") * 5 > F.col("n_docs"), 1).otherwise(0))
        .cast("long")
        .alias("n_stopwords"),
        F.sum(F.when(F.col("df") * 5 > F.col("n_docs"), F.col("df")).otherwise(0))
        .cast("long")
        .alias("postings_cut"),
        F.sum(F.when(F.col("df") * 5 > F.col("n_docs"), F.col("df") * 8).otherwise(0))
        .cast("long")
        .alias("bytes_cut"),
    )
    top = df.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("df").desc(), "t"))
    ).filter(F.col("rnk") <= 15)
    return (
        top.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(led))
        .select(
            F.col("t").alias("term"),
            "df",
            (F.col("df") * 8).cast("long").alias("posting_bytes"),
            F.expr(f"(df + {_POST_BLOCK - 1}) div {_POST_BLOCK}").cast("long").alias(
                "skip_blocks"
            ),
            F.when(F.col("df") * 5 > F.col("n_docs"), 1).otherwise(0).cast("long").alias(
                "is_stopword"
            ),
            F.col("rnk").cast("long").alias("rnk"),
            "n_docs",
            "n_terms",
            "total_postings",
            "total_bytes",
            "n_stopwords",
            "postings_cut",
            "bytes_cut",
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# B306: Good-Turing unseen-vocabulary mass (r14)
# ---------------------------------------------------------------------------
# Heaps' law (B131) fits how vocabulary GROWS; Good-Turing answers the
# sharper question a tokenizer/coverage decision needs: how much
# probability mass belongs to types the corpus has NEVER seen? The
# estimator is frequency-of-frequencies arithmetic — P(unseen) = N₁/N
# (singleton share), adjusted frequency-1 count r* = 2N₂/N₁ — all exact
# integers/ppm from two groupBys (token counts, then count-of-counts;
# the second table is tiny: distinct frequencies). Also reported: the
# head of the frequency-of-frequencies table (r = 1..5) — the smoothing
# input any SGT implementation starts from.
@register(
    "doc_good_turing_unseen",
    """
WITH tf AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS t FROM documents
  ) WHERE t <> '' GROUP BY t
), ff AS (
  SELECT c AS r, CAST(count(*) AS BIGINT) AS nr FROM tf GROUP BY c
), s AS (
  SELECT CAST(sum(r * nr) AS BIGINT) AS n_tokens,
         CAST(sum(nr) AS BIGINT) AS n_types,
         CAST(coalesce(max(CASE WHEN r = 1 THEN nr END), 0) AS BIGINT) AS n1,
         CAST(coalesce(max(CASE WHEN r = 2 THEN nr END), 0) AS BIGINT) AS n2
  FROM ff
), grid AS (
  SELECT unnest(ARRAY[1, 2, 3, 4, 5]) AS r
)
SELECT CAST(g.r AS BIGINT) AS r,
       CAST(coalesce(f.nr, 0) AS BIGINT) AS n_r,
       s.n_tokens, s.n_types, s.n1, s.n2,
       CAST(s.n1 * 1000000 // s.n_tokens AS BIGINT) AS unseen_mass_ppm,
       CAST(CASE WHEN s.n1 > 0 THEN 2 * s.n2 * 1000 // s.n1 ELSE -1 END AS BIGINT)
         AS r1_star_milli
FROM grid g LEFT JOIN ff f ON f.r = g.r CROSS JOIN s
ORDER BY r
""",
)
def doc_good_turing_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-mass estimate from the frequency-of-frequencies
    table (B306): P(unseen) = N₁/N ppm, adjusted r*=2N₂/N₁, and the
    r = 1..5 smoothing head."""
    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ff = tf.groupBy(F.col("c").alias("r")).agg(F.count("*").cast("long").alias("nr"))
    s = ff.agg(
        F.sum(F.col("r") * F.col("nr")).cast("long").alias("n_tokens"),
        F.sum("nr").cast("long").alias("n_types"),
        F.coalesce(F.max(F.when(F.col("r") == 1, F.col("nr"))), F.lit(0))
        .cast("long")
        .alias("n1"),
        F.coalesce(F.max(F.when(F.col("r") == 2, F.col("nr"))), F.lit(0))
        .cast("long")
        .alias("n2"),
    )
    grid = spark.createDataFrame([(x,) for x in range(1, 6)], "r int")
    return (
        grid.join(F.broadcast(ff), grid.r == ff.r, "left")
        .select(grid.r.cast("long").alias("r"), F.coalesce("nr", F.lit(0)).cast("long").alias("n_r"))
        .crossJoin(F.broadcast(s))
        .select(
            "r",
            "n_r",
            "n_tokens",
            "n_types",
            "n1",
            "n2",
            F.expr("n1 * 1000000 div n_tokens").cast("long").alias("unseen_mass_ppm"),
            F.expr("CASE WHEN n1 > 0 THEN 2 * n2 * 1000 div n1 ELSE -1 END")
            .cast("long")
            .alias("r1_star_milli"),
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# B308: Flesch readability gate (r14)
# ---------------------------------------------------------------------------
# The oldest quality score still in every text-prep stack: Flesch
# reading ease = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
# word). The classic cheap syllable proxy is VOWEL-GROUP counting
# ('[aeiouy]+' runs — spaces break runs, so one regexp over the whole
# text equals the per-word sum), sentences are '[.!?]+' runs (min 1).
# Exact integer milli quantization: each term floors ONCE —
# 206835 − (1015·W) div S − (84600·V) div W — so both engines compute
# the identical BIGINT, and the grade bucket is a CASE over it. The
# corpus-quality use: a milli-scored gate column a filter pipeline can
# threshold without floats. Map-only + two regexp counts per doc.
@register(
    "doc_readability_score",
    """
WITH m AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS v
  FROM documents
)
SELECT doc_id, w AS n_words, s AS n_sentences, v AS n_vowel_groups,
       CAST(206835 - (1015 * w) // s - (84600 * v) // w AS BIGINT) AS flesch_milli,
       CASE WHEN 206835 - (1015 * w) // s - (84600 * v) // w >= 90000 THEN 'very_easy'
            WHEN 206835 - (1015 * w) // s - (84600 * v) // w >= 60000 THEN 'standard'
            WHEN 206835 - (1015 * w) // s - (84600 * v) // w >= 30000 THEN 'difficult'
            ELSE 'very_difficult' END AS grade
FROM m
ORDER BY doc_id
""",
)
def doc_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease in exact integer milli (B308): vowel-group
    syllable proxy, sentence-run counting, one floored division per
    term — a float-free quality gate column."""
    d = read_table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.expr("CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)").alias("w"),
        F.expr(
            "CAST(greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1) AS BIGINT)"
        ).alias("s"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT)"
        ).alias("v"),
    )
    fl = "206835 - (1015 * w) div s - (84600 * v) div w"
    return m.select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sentences"),
        F.col("v").alias("n_vowel_groups"),
        F.expr(f"CAST({fl} AS BIGINT)").alias("flesch_milli"),
        F.expr(
            f"CASE WHEN {fl} >= 90000 THEN 'very_easy'"
            f" WHEN {fl} >= 60000 THEN 'standard'"
            f" WHEN {fl} >= 30000 THEN 'difficult'"
            " ELSE 'very_difficult' END"
        ).alias("grade"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# B326: cumulative-gains / lift table — the ranking-model readout.
#
# The eval every targeting/triage model ships with: rank the corpus by
# model score, cut into deciles, and read how concentrated the positives
# are at the top (gains) and how much better than random each prefix is
# (lift). Score = the B35 hashed classifier's exact integer dot product;
# positive = "long document" (n_chars ≥ the exact low median — itself a
# count-threshold scan, no global sort). The sweep-safe decile assignment:
# group BY DISTINCT SCORE first (aggregated, bounded by score support),
# cumulative-walk that table descending, and assign each whole tie-group
# to decile floor(10·cum_before/N) — ties never straddle a decile
# boundary (documented; decile sizes are approximate under ties, the
# price of determinism). Lift in ppm via 128-bit cross-multiplication.
#
# Scale: explode→two keyed aggs (the B35 shape), then windows strictly
# over aggregated score-support rows.
# --------------------------------------------------------------------------


@register(
    "doc_gains_lift_table",
    f"""
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), dtf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n FROM tf GROUP BY doc_id, t
), wt AS (
  SELECT doc_id, n,
         {_clf_weight_ddb(H.ddb_str_hash_fast('t') + f" % {CLF_BUCKETS}")} AS wi
  FROM dtf
), sc AS (
  SELECT doc_id, CAST(sum(n * wi) AS BIGINT) AS s FROM wt GROUP BY doc_id
), med AS (
  SELECT min(n_chars) AS m FROM (
    SELECT n_chars,
           CAST(sum(count(*)) OVER (ORDER BY n_chars) AS BIGINT) AS cum,
           (SELECT CAST(count(*) AS BIGINT) FROM documents) AS tot
    FROM documents GROUP BY n_chars
  ) WHERE cum * 2 >= tot
), lab AS (
  SELECT sc.s, CASE WHEN d.n_chars >= m.m THEN 1 ELSE 0 END AS pos
  FROM sc JOIN documents d USING (doc_id), med m
), support AS (
  SELECT s, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(pos) AS BIGINT) AS np
  FROM lab GROUP BY s
), walk AS (
  SELECT s, cnt, np,
         CAST(sum(cnt) OVER (ORDER BY s DESC) - cnt AS BIGINT) AS cum_before,
         CAST(sum(cnt) OVER () AS BIGINT) AS tot_n,
         CAST(sum(np) OVER () AS BIGINT) AS tot_p
  FROM support
), dec AS (
  SELECT CAST(least(cum_before * 10 // tot_n, 9) AS BIGINT) AS decile,
         cnt, np, tot_n, tot_p
  FROM walk
), per AS (
  SELECT decile, CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(np) AS BIGINT) AS n_pos,
         max(tot_n) AS tot_n, max(tot_p) AS tot_p
  FROM dec GROUP BY decile
)
SELECT decile, n, n_pos,
       CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
       CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
       CAST(sum(n_pos) OVER (ORDER BY decile) * 1000000 // tot_p AS BIGINT)
         AS gains_ppm,
       CAST(CAST(sum(n_pos) OVER (ORDER BY decile) AS HUGEINT) * tot_n * 1000000
            // (sum(n) OVER (ORDER BY decile) * tot_p) AS BIGINT) AS lift_ppm
FROM per
ORDER BY decile
""",
)
def doc_gains_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table for the hashed classifier score against the
    long-document label (B326): tie-safe aggregated-support deciles, exact
    integer gains and 128-bit lift ppm."""
    support = score_label_support(read_table(spark, sf_dir, "documents"))
    return gains_over_support(support)


def score_label_support(d: DataFrame) -> DataFrame:
    """(score, cnt, np) support table for the B35 classifier score vs the
    long-doc label — the sum-mergeable state shared by the gains table
    (B326), the Youden threshold (B336), and the streaming sink
    (``stream_ops.stream_score_support``, B339). Documents arrive whole,
    so per-doc scores are batch-local; the streamed state keeps the
    (score, n_chars) count table — one row per distinct pair, the
    per-entity-state shape of the SCD2 precedent — so the label median
    re-derives at read time over ALL streamed docs, exactly like batch
    (``support_from_pairs``)."""
    sc = _clf_scores(d)
    med = _low_median_chars(d)
    lab = (
        sc.join(d.select("doc_id", "n_chars"), "doc_id")
        .crossJoin(F.broadcast(med))
        .select(
            "s",
            F.when(F.col("n_chars") >= F.col("m"), 1).otherwise(0).alias("pos"),
        )
    )
    return lab.groupBy("s").agg(
        F.count("*").cast("long").alias("cnt"), F.sum("pos").cast("long").alias("np")
    )


def _clf_scores(d: DataFrame) -> DataFrame:
    """Per-doc exact integer classifier dot product (the B35 arithmetic)."""
    dtf = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("n"))
    )
    bucket = f"({H.spark_str_hash_fast('t')}) % {CLF_BUCKETS}"
    return (
        dtf.select("doc_id", "n", F.expr(_clf_weight_spark(bucket)).alias("wi"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.col("wi")).cast("long").alias("s"))
    )


def _low_median_chars(d: DataFrame) -> DataFrame:
    """Exact low median of n_chars via the count-threshold scan."""
    tot = d.agg(F.count("*").cast("long").alias("tot"))
    return (
        d.groupBy("n_chars")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "cum",
            F.sum("c")
            .over(Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") * 2 >= F.col("tot"))
        .agg(F.min("n_chars").alias("m"))
    )


def gains_over_support(support: DataFrame) -> DataFrame:
    """Gains/lift deciles from a (s, cnt, np) support table — identical
    arithmetic batch and from streamed state."""
    dec128 = "decimal(38,0)"
    w_desc = Window.orderBy(F.col("s").desc()).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    walk = support.select(
        "s",
        "cnt",
        "np",
        (F.sum("cnt").over(w_desc) - F.col("cnt")).cast("long").alias("cum_before"),
        F.sum("cnt").over(w_all).cast("long").alias("tot_n"),
        F.sum("np").over(w_all).cast("long").alias("tot_p"),
    )
    per = (
        walk.select(
            F.least(F.expr("cum_before * 10 div tot_n"), F.lit(9))
            .cast("long")
            .alias("decile"),
            "cnt",
            "np",
            "tot_n",
            "tot_p",
        )
        .groupBy("decile")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum("np").cast("long").alias("n_pos"),
            F.max("tot_n").alias("tot_n"),
            F.max("tot_p").alias("tot_p"),
        )
    )
    w_dec = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w_dec).cast("long").alias("cum_n"),
        F.sum("n_pos").over(w_dec).cast("long").alias("cum_pos"),
        F.expr(
            "cast(sum(n_pos) over (order by decile rows between unbounded preceding"
            " and current row) * 1000000 div tot_p as bigint)"
        ).alias("gains_ppm"),
        F.expr(
            f"cast(cast(sum(n_pos) over (order by decile rows between unbounded"
            f" preceding and current row) as {dec128}) * tot_n * 1000000"
            " div (sum(n) over (order by decile rows between unbounded preceding"
            " and current row) * tot_p) as bigint)"
        ).alias("lift_ppm"),
    ).orderBy("decile")


# --------------------------------------------------------------------------
# B336: Youden-J optimal threshold — turning a score into a decision.
#
# B326 reads the ranking (gains/lift); this op picks the OPERATING POINT:
# for every distinct classifier score as a candidate cut (predict
# positive iff score ≥ cut), exact TP/FP from one descending cumulative
# walk over the aggregated score support, TPR/FPR in ppm (floored once
# each), and Youden's J = TPR − FPR — the balanced-accuracy criterion
# that is threshold-free of class priors. The argmax row is flagged with
# the deterministic tie-break (highest J, then LOWEST cut = the more
# permissive threshold). The full ROC support table is emitted, so the
# consumer can re-gate at any other criterion without re-scanning.
#
# Scale: the B35 score aggregates + windows strictly over score support.
# --------------------------------------------------------------------------


@register(
    "doc_youden_threshold",
    f"""
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), dtf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n FROM tf GROUP BY doc_id, t
), wt AS (
  SELECT doc_id, n,
         {_clf_weight_ddb(H.ddb_str_hash_fast('t') + f" % {CLF_BUCKETS}")} AS wi
  FROM dtf
), sc AS (
  SELECT doc_id, CAST(sum(n * wi) AS BIGINT) AS s FROM wt GROUP BY doc_id
), med AS (
  SELECT min(n_chars) AS m FROM (
    SELECT n_chars,
           CAST(sum(count(*)) OVER (ORDER BY n_chars) AS BIGINT) AS cum,
           (SELECT CAST(count(*) AS BIGINT) FROM documents) AS tot
    FROM documents GROUP BY n_chars
  ) WHERE cum * 2 >= tot
), lab AS (
  SELECT sc.s, CASE WHEN d.n_chars >= m.m THEN 1 ELSE 0 END AS pos
  FROM sc JOIN documents d USING (doc_id), med m
), support AS (
  SELECT s, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(pos) AS BIGINT) AS np
  FROM lab GROUP BY s
), walk AS (
  SELECT s, cnt, np,
         CAST(sum(np) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
         CAST(sum(cnt - np) OVER (ORDER BY s DESC) AS BIGINT) AS fp,
         CAST(sum(np) OVER () AS BIGINT) AS p,
         CAST(sum(cnt - np) OVER () AS BIGINT) AS neg
  FROM support
), j AS (
  SELECT s AS cut_milli, tp, fp,
         CAST(tp * 1000000 // p AS BIGINT) AS tpr_ppm,
         CAST(fp * 1000000 // neg AS BIGINT) AS fpr_ppm,
         CAST(tp * 1000000 // p - fp * 1000000 // neg AS BIGINT) AS j_micro
  FROM walk
)
SELECT cut_milli, tp, fp, tpr_ppm, fpr_ppm, j_micro,
       CAST(CASE WHEN (j_micro, -cut_milli) = (SELECT (max(j_micro),
                       -min(CASE WHEN j_micro = (SELECT max(j_micro) FROM j)
                                 THEN cut_milli END)) FROM j)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_best
FROM j
ORDER BY cut_milli DESC
""",
)
def doc_youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC support table + Youden-J argmax threshold for the B35 score vs
    the long-doc label (B336): exact TP/FP cumulative walk, deterministic
    tie-break (max J, then lowest cut)."""
    support = score_label_support(read_table(spark, sf_dir, "documents"))
    return youden_over_support(support)


def youden_over_support(support: DataFrame) -> DataFrame:
    """ROC walk + Youden argmax from a (s, cnt, np) support table —
    identical arithmetic batch and from streamed state."""
    w_desc = Window.orderBy(F.col("s").desc()).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    walk = support.select(
        "s",
        F.sum("np").over(w_desc).cast("long").alias("tp"),
        F.sum(F.col("cnt") - F.col("np")).over(w_desc).cast("long").alias("fp"),
        F.sum("np").over(w_all).cast("long").alias("p"),
        F.sum(F.col("cnt") - F.col("np")).over(w_all).cast("long").alias("neg"),
    )
    j = walk.select(
        F.col("s").alias("cut_milli"),
        "tp",
        "fp",
        F.expr("cast(tp * 1000000 div p as bigint)").alias("tpr_ppm"),
        F.expr("cast(fp * 1000000 div neg as bigint)").alias("fpr_ppm"),
        F.expr("cast(tp * 1000000 div p - fp * 1000000 div neg as bigint)").alias(
            "j_micro"
        ),
    )
    w_best = Window.partitionBy()
    best = j.select(
        "*",
        F.max("j_micro").over(w_best).alias("_jmax"),
    ).select(
        "*",
        F.min(F.when(F.col("j_micro") == F.col("_jmax"), F.col("cut_milli"))).over(
            w_best
        ).alias("_cbest"),
    )
    return best.select(
        "cut_milli",
        "tp",
        "fp",
        "tpr_ppm",
        "fpr_ppm",
        "j_micro",
        F.when(
            (F.col("j_micro") == F.col("_jmax")) & (F.col("cut_milli") == F.col("_cbest")), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("is_best"),
    ).orderBy(F.col("cut_milli").desc())


# --------------------------------------------------------------------------
# B338: Simpson diversity / effective vocabulary per source.
#
# The order-2 Hill number — "how many tokens does this source EFFECTIVELY
# use?" — is the diversity readout that, unlike Shannon entropy, needs no
# logarithm: the unbiased Simpson repeat-rate is Σc(c−1)/(N(N−1)) (the
# probability two draws without replacement collide), and its inverse is
# the effective vocabulary. Exact integers end to end: repeat ppm floored
# once, effective vocab as the reciprocal cross-division in milli (128-bit
# numerator, N(N−1)·1000 ~ 1e13·… at corpus scale). Emitted per source
# beside the raw vocab so head-heaviness (eff ≪ vocab) is read directly —
# the mixing-weight signal the B17 corpus mixer consumes.
#
# Scale: explode → two keyed aggregates (token counts, then per-source
# moments) — the TF shape, all map-side combinable.
# --------------------------------------------------------------------------


@register(
    "doc_source_simpson_diversity",
    """
WITH tf AS (
  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
), tc AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c
  FROM tf WHERE t <> '' GROUP BY source, t
), mo AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_vocab,
         CAST(sum(c * (c - 1)) AS BIGINT) AS coll
  FROM tc GROUP BY source
)
SELECT source, n_tokens, n_vocab,
       CAST(coll * 1000000 // (n_tokens * (n_tokens - 1)) AS BIGINT)
         AS simpson_repeat_ppm,
       CAST(CASE WHEN coll > 0
                 THEN CAST(n_tokens AS HUGEINT) * (n_tokens - 1) * 1000 // coll
                 ELSE n_vocab * 1000 END AS BIGINT) AS effective_vocab_milli
FROM mo
ORDER BY source
""",
)
def doc_source_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased Simpson repeat-rate + inverse-Simpson effective vocabulary
    per source (B338) — the log-free diversity readout."""
    d = read_table(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    tc = (
        d.select("source", F.explode(F.split(F.col("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("source", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    mo = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_vocab"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("coll"),
    )
    return mo.select(
        "source",
        "n_tokens",
        "n_vocab",
        F.expr("cast(coll * 1000000 div (n_tokens * (n_tokens - 1)) as bigint)").alias(
            "simpson_repeat_ppm"
        ),
        F.expr(
            f"cast(case when coll > 0"
            f" then cast(n_tokens as {dec}) * (n_tokens - 1) * 1000 div coll"
            " else n_vocab * 1000 end as bigint)"
        ).alias("effective_vocab_milli"),
    ).orderBy("source")


def support_from_pairs(pairs: DataFrame) -> DataFrame:
    """(s, cnt, np) support from a streamed (s, n_chars, c) count state
    (B339): re-derive the low median over the streamed char marginal,
    label, and fold — byte-identical to the batch ``score_label_support``
    because both run the same arithmetic over the same totals."""
    marg = pairs.groupBy("n_chars").agg(F.sum("c").cast("long").alias("c"))
    tot = marg.agg(F.sum("c").cast("long").alias("tot"))
    med = (
        marg.withColumn(
            "cum",
            F.sum("c")
            .over(Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") * 2 >= F.col("tot"))
        .agg(F.min("n_chars").alias("m"))
    )
    return (
        pairs.crossJoin(F.broadcast(med))
        .groupBy("s")
        .agg(
            F.sum("c").cast("long").alias("cnt"),
            F.sum(F.when(F.col("n_chars") >= F.col("m"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("np"),
        )
    )


# --------------------------------------------------------------------------
# B345: Borda-count rank fusion — the voting-theory sibling of RRF.
#
# B24 fuses rankings with reciprocal-rank (nonlinear, top-heavy); Borda
# is the linear positional rule — each list awards (N − rank) points —
# and is the right fusion when mid-list positions still carry signal.
# Tie handling follows the Mann-Whitney doubled-midrank discipline: both
# rankings (B35 classifier score; document length) derive DOUBLED
# midranks from their aggregated score-support tables (integer-exact
# under ties, no per-doc window over base rows), and the fused score is
# the doubled Borda sum 4(N+1) − r2_A − r2_B. Top-20 via orderBy+limit
# (TakeOrderedAndProject — the knn discipline, no global sort).
#
# Scale: two support aggregates + broadcast joins back on score value.
# --------------------------------------------------------------------------


@register(
    "doc_borda_fusion",
    f"""
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), dtf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n FROM tf GROUP BY doc_id, t
), wt AS (
  SELECT doc_id, n,
         {_clf_weight_ddb(H.ddb_str_hash_fast('t') + f" % {CLF_BUCKETS}")} AS wi
  FROM dtf
), sc AS (
  SELECT doc_id, CAST(sum(n * wi) AS BIGINT) AS s FROM wt GROUP BY doc_id
), sup_a AS (
  SELECT s, CAST(count(*) AS BIGINT) AS w FROM sc GROUP BY s
), r_a AS (
  SELECT s, CAST(2 * (sum(w) OVER (ORDER BY s DESC) - w) + w + 1 AS BIGINT) AS r2
  FROM sup_a
), sup_b AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS w FROM documents GROUP BY n_chars
), r_b AS (
  SELECT n_chars, CAST(2 * (sum(w) OVER (ORDER BY n_chars DESC) - w) + w + 1
                       AS BIGINT) AS r2
  FROM sup_b
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
)
SELECT d.doc_id, sc.s AS dot_milli, d.n_chars,
       ra.r2 AS r2_score, rb.r2 AS r2_length,
       CAST(4 * (nn.n + 1) - ra.r2 - rb.r2 AS BIGINT) AS borda2
FROM documents d
JOIN sc USING (doc_id)
JOIN r_a ra ON ra.s = sc.s
JOIN r_b rb ON rb.n_chars = d.n_chars
CROSS JOIN nn
ORDER BY borda2 DESC, d.doc_id
LIMIT 20
""",
)
def doc_borda_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubled-midrank Borda fusion of the classifier and length rankings
    (B345): tie-exact positional points, top-20 via orderBy+limit."""
    d = read_table(spark, sf_dir, "documents")
    sc = _clf_scores(d)
    sup_a = sc.groupBy("s").agg(F.count("*").cast("long").alias("w"))
    w_a = Window.orderBy(F.col("s").desc()).rowsBetween(Window.unboundedPreceding, 0)
    r_a = sup_a.select(
        "s",
        (2 * (F.sum("w").over(w_a) - F.col("w")) + F.col("w") + 1)
        .cast("long")
        .alias("r2_score"),
    )
    sup_b = d.groupBy("n_chars").agg(F.count("*").cast("long").alias("w"))
    w_b = Window.orderBy(F.col("n_chars").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    r_b = sup_b.select(
        "n_chars",
        (2 * (F.sum("w").over(w_b) - F.col("w")) + F.col("w") + 1)
        .cast("long")
        .alias("r2_length"),
    )
    nn = d.agg(F.count("*").cast("long").alias("n"))
    return (
        d.select("doc_id", "n_chars")
        .join(sc, "doc_id")
        .join(F.broadcast(r_a), "s")
        .join(F.broadcast(r_b), "n_chars")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            F.col("s").alias("dot_milli"),
            "n_chars",
            "r2_score",
            "r2_length",
            F.expr("cast(4 * (n + 1) - r2_score - r2_length as bigint)").alias("borda2"),
        )
        .orderBy(F.col("borda2").desc(), "doc_id")
        .limit(20)
    )
