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
