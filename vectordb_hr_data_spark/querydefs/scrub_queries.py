"""Corpus-hygiene operators: PII scrubbing and URL canonicalization dedup —
two standard crawl-pipeline preprocessing steps (C4/CCNet-style) expressed
as pure string algebra so both engines hash-match the scrubbed output
itself, not a summary of it.

The synthetic documents table carries no natural PII or URLs, so each query
first SYNTHESIZES the sensitive column deterministically from (doc_id,
source, lang) — the operator under test is the scrub/normalize expression,
which is written against any string column; the synthesis is fixture
construction, identical in both dialects.

Regex dialect note: patterns here use only character classes, anchors, and
bounded quantifiers that Java (Spark) and RE2 (DuckDB) interpret
identically; no backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..queries import register

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

# deterministic PII synthesis: one email + one phone per document
_PII_SPARK = (
    "concat(text, ' contact user', cast(doc_id as string), '@Mail.Example.com'"
    ", ' call +1-555-', lpad(cast(doc_id % 10000 as string), 4, '0'))"
)
_PII_DDB = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@Mail.Example.com'"
    " || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "doc_pii_scrub",
    f"""
WITH aug AS (
  SELECT doc_id, {_PII_DDB} AS text FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed
FROM aug
ORDER BY doc_id
""",
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: regex-match emails and phone numbers, count them, and
    replace with typed placeholder tokens. Pure map over the scan — no
    shuffle, embarrassingly parallel, whole-stage codegen (Java regex is
    JVM-side; no Python in the path). The count columns are the audit
    signal a redaction pipeline reports per shard."""
    d = read_table(spark, sf_dir, "documents")
    aug = d.select("doc_id", F.expr(_PII_SPARK).alias("text"))
    return (
        aug.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
            F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
            F.regexp_replace(
                F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ).alias("scrubbed"),
        )
        .orderBy("doc_id")
    )


# messy-URL synthesis: scheme case, WWW prefix, host case, trailing slash
# variant, and a tracking query string — all of which canonicalization
# must erase. doc_id % 40 gives ~12.5 docs per (source, slot) at sf0.01.
_URL_SPARK = (
    "concat(case when doc_id % 3 = 0 then 'HTTPS://' else 'https://' end,"
    " case when doc_id % 2 = 0 then 'WWW.' else '' end,"
    " source, '.Example.COM/docs/', cast(doc_id % 40 as string),"
    " case when doc_id % 5 = 0 then '/' else '' end,"
    " '?utm_source=', lang, '&id=', cast(doc_id as string))"
)
_URL_DDB = (
    "(CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END)"
    " || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)"
    " || source || '.Example.COM/docs/' || CAST(doc_id % 40 AS VARCHAR)"
    " || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)"
    " || '?utm_source=' || lang || '&id=' || CAST(doc_id AS VARCHAR)"
)

_CANON_STEPS = [
    (r"^[A-Za-z]+://", ""),  # scheme
    (r"\?.*$", ""),          # query string (tracking params)
    (r"^www\.", ""),         # www prefix (applied after lowercasing)
    (r"/$", ""),             # trailing slash
]


def canonical_url(col: F.Column | str) -> F.Column:
    """Lowercase + strip scheme, query string, www. prefix, trailing slash.
    The standard crawl-dedup canonicalization (strip-tracking variant)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _CANON_STEPS[0][0], _CANON_STEPS[0][1])
    c = F.regexp_replace(c, _CANON_STEPS[1][0], _CANON_STEPS[1][1])
    c = F.lower(c)
    c = F.regexp_replace(c, _CANON_STEPS[2][0], _CANON_STEPS[2][1])
    c = F.regexp_replace(c, _CANON_STEPS[3][0], _CANON_STEPS[3][1])
    return c


def _canon_ddb(expr: str) -> str:
    out = f"regexp_replace({expr}, '^[A-Za-z]+://', '')"
    out = f"regexp_replace({out}, '\\?.*$', '')"
    out = f"lower({out})"
    out = f"regexp_replace({out}, '^www\\.', '')"
    out = f"regexp_replace({out}, '/$', '')"
    return out


@register(
    "url_normalize_dedup",
    f"""
WITH u AS (
  SELECT doc_id, {_URL_DDB} AS url FROM documents
), c AS (
  SELECT doc_id, {_canon_ddb('url')} AS canonical FROM u
)
SELECT canonical, count(*) AS n_docs, min(doc_id) AS keeper_id
FROM c
GROUP BY canonical
HAVING count(*) > 1
ORDER BY canonical
""",
)
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup: normalize scheme/case/www/tracking-params/
    trailing-slash variants to one canonical form, group, keep the min
    doc_id. The groupBy key is the canonical URL — uniform hash
    distribution at corpus scale (hot hosts spread across paths); the
    HAVING>1 filter returns only actual duplicate groups, which is the
    audit view a crawl-dedup run reports."""
    d = read_table(spark, sf_dir, "documents")
    u = d.select("doc_id", F.expr(_URL_SPARK).alias("url"))
    c = u.select("doc_id", canonical_url("url").alias("canonical"))
    return (
        c.groupBy("canonical")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("canonical")
    )


# ---------------------------------------------------------------------------
# B120: k-anonymity audit (the privacy gate before a corpus release)
# ---------------------------------------------------------------------------
# Before releasing a training corpus, the privacy question is not "did
# the PII scrub run" (B-scrub) but "can a row be re-identified from its
# QUASI-IDENTIFIERS": group by the released quasi-identifier tuple
# (lang, source, length decile) and flag every equivalence class whose
# size is below k=5 — those rows are re-identifiable by joining public
# metadata. Deciles come from the deterministic ntile discipline (B86);
# the audit emits per-class sizes, the flag, and the class share in ppm.
# Scale shape: one groupBy on the quasi-identifier tuple (bounded
# cardinality: |langs|·|sources|·10); the decile is the B102 note at
# 100 TB (exact-quantile cutoffs, map-side assignment).
K_ANON = 5


@register(
    "doc_k_anonymity_audit",
    f"""
WITH binned AS (
  SELECT lang, source, ntile(10) OVER (ORDER BY n_chars, doc_id) AS len_decile
  FROM documents
), classes AS (
  SELECT lang, source, CAST(len_decile AS BIGINT) AS len_decile,
         CAST(count(*) AS BIGINT) AS class_size
  FROM binned GROUP BY lang, source, len_decile
)
SELECT lang, source, len_decile, class_size,
       class_size < {K_ANON} AS below_k,
       CAST(class_size * 1000000 // sum(class_size) OVER () AS BIGINT) AS share_ppm
FROM classes
ORDER BY lang, source, len_decile
""",
)
def doc_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over (lang, source, length-decile) quasi-
    identifiers (B120) — equivalence-class sizes, below-k flags, shares.

    The length decile is the exact-rank two-form (`with_exact_ntile`),
    NOT a corpus-global ntile window: per-length counts (bounded by
    |distinct n_chars|) + partitioned row_number give every doc its exact
    rank map-side, so the oracle keeps the readable ntile form while the
    Spark plan has no single-partition sort of the corpus. The remaining
    unbounded-frame window (share_ppm) runs over the |langs|·|sources|·10
    class table."""
    from vectordb_hr_data_spark.operators.quantiles import with_exact_ntile

    d = read_table(spark, sf_dir, "documents")
    binned = with_exact_ntile(
        d.select("lang", "source", "n_chars", "doc_id"),
        10,
        "n_chars",
        "doc_id",
        "len_decile",
    ).select("lang", "source", "len_decile")
    classes = binned.groupBy(
        "lang", "source", F.col("len_decile").cast("long").alias("len_decile")
    ).agg(F.count("*").cast("long").alias("class_size"))
    return classes.select(
        "lang",
        "source",
        "len_decile",
        "class_size",
        (F.col("class_size") < K_ANON).alias("below_k"),
        F.expr("class_size * 1000000 div sum(class_size) OVER ()")
        .cast("long")
        .alias("share_ppm"),
    ).orderBy("lang", "source", "len_decile")


# ---------------------------------------------------------------------------
# B121: differentially-private release counts (seeded Laplace plumbing)
# ---------------------------------------------------------------------------
# The other half of the release gate: B120 audits re-identifiability of
# the rows you keep, DP noise protects the AGGREGATES you publish. This
# op implements the epsilon=1 Laplace mechanism over per-type event
# counts with the noise drawn by inverse-CDF from a SEEDED md5 uniform —
# u on the half-open 2^20 grid (never exactly 0, 1/2, or 1, so the ln is
# always finite), noise = -sign(v) * ln(1 - 2|v|) for v = u - 1/2,
# quantized once to milli. SEEDED noise is deterministic by design here
# (it is what makes the op oracle-able and replayable); a real DP
# release swaps the seed for a one-shot secret draw — the mechanism,
# sensitivity (count queries, sensitivity 1), and quantization are
# exactly this plumbing. Scale: one groupBy; noise is per-GROUP, free.
DP_EPSILON_INV_MILLI = 1000  # b = 1/epsilon = 1.0, in milli units


@register(
    "events_dp_noisy_counts",
    """
WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS true_count FROM events GROUP BY event_type
), u AS (
  SELECT event_type, true_count,
         ((CAST(('0x' || substr(md5(event_type || ':dp-v1'), 1, 8)) AS BIGINT) % 1048575) + 0.5)
           / 1048576.0 - 0.5 AS v
  FROM c
)
SELECT event_type, true_count,
       CAST(floor((CASE WHEN v >= 0 THEN -1.0 ELSE 1.0 END) * ln(1.0 - 2.0 * abs(v)) * 1000
                  + 0.5) AS BIGINT) AS noise_milli,
       CAST(true_count * 1000
            + floor((CASE WHEN v >= 0 THEN -1.0 ELSE 1.0 END) * ln(1.0 - 2.0 * abs(v)) * 1000
                    + 0.5) AS BIGINT) AS noisy_count_milli
FROM u
ORDER BY event_type
""",
)
def events_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace(1/eps=1) noisy per-type counts via seeded inverse-CDF
    (B121) — the DP release mechanism's plumbing, oracle-replayable."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("true_count"))
    v = (
        "((cast(conv(substring(md5(concat(event_type, ':dp-v1')), 1, 8), 16, 10) as bigint)"
        " % 1048575) + 0.5) / 1048576.0 - 0.5"
    )
    noise = (
        f"CAST(floor((CASE WHEN ({v}) >= 0 THEN -1.0 ELSE 1.0 END)"
        f" * ln(1.0 - 2.0 * abs({v})) * 1000 + 0.5) AS BIGINT)"
    )
    return c.select(
        "event_type",
        "true_count",
        F.expr(noise).alias("noise_milli"),
        (F.col("true_count") * 1000 + F.expr(noise)).cast("long").alias("noisy_count_milli"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# B177: per-source PII scrub-coverage audit (the release gate's evidence)
# ---------------------------------------------------------------------------
# B-scrub redacts; THIS op proves it, per source: how many documents
# carried each PII type, how many instances were replaced, and — the
# actual gate — how many matches REMAIN after the scrub (must be 0 for
# these pattern classes by construction; a nonzero residual means the
# redaction regex and the detection regex drifted apart, which is
# exactly the bug class a privacy review looks for). Same deterministic
# PII synthesis as doc_pii_scrub (the fixture carries no natural PII).
# Scale shape: one regex map pass + one bounded groupBy(source).
@register(
    "source_pii_coverage",
    f"""
WITH aug AS (
  SELECT doc_id, source, {_PII_DDB} AS text FROM documents
), m AS (
  SELECT source,
         len(regexp_extract_all(text, '{EMAIL_RE}')) AS ne,
         len(regexp_extract_all(text, '{PHONE_RE}')) AS np,
         len(regexp_extract_all(
           regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g'),
           '{EMAIL_RE}')) +
         len(regexp_extract_all(
           regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g'),
           '{PHONE_RE}')) AS resid
  FROM aug
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
       CAST(sum(ne) AS BIGINT) AS n_emails,
       CAST(sum(np) AS BIGINT) AS n_phones,
       CAST(sum(resid) AS BIGINT) AS n_residual,
       CAST(sum(CASE WHEN ne + np > 0 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS pii_doc_ppm
FROM m
GROUP BY source
ORDER BY source
""",
)
def source_pii_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII detection counts plus the post-scrub residual-match
    audit (B177) — n_residual must be 0 when the scrub and detector use
    the same patterns; a nonzero value is the drift bug a privacy review
    gates on."""
    d = read_table(spark, sf_dir, "documents")
    aug = d.select("source", F.expr(_PII_SPARK).alias("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    m = aug.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0))).alias("ne"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), F.lit(0))).alias("np"),
        (
            F.size(F.regexp_extract_all(scrubbed, F.lit(EMAIL_RE), F.lit(0)))
            + F.size(F.regexp_extract_all(scrubbed, F.lit(PHONE_RE), F.lit(0)))
        ).alias("resid"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("ne") > 0, 1).otherwise(0)).cast("long").alias("docs_with_email"),
            F.sum(F.when(F.col("np") > 0, 1).otherwise(0)).cast("long").alias("docs_with_phone"),
            F.sum("ne").cast("long").alias("n_emails"),
            F.sum("np").cast("long").alias("n_phones"),
            F.sum("resid").cast("long").alias("n_residual"),
            F.expr(
                "sum(CASE WHEN ne + np > 0 THEN 1 ELSE 0 END) * 1000000 div count(*)"
            )
            .cast("long")
            .alias("pii_doc_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# B216: release-gate capstone (one checked report over five audits)
# ---------------------------------------------------------------------------
# The round's governance operators exist to answer ONE question — "is
# this corpus safe to ship?" — and this capstone asks it as a single
# checked query: canary contamination (B175), PII scrub residual
# (B177), k-anonymity violations (B120), snapshot churn (B166), and
# split leakage (B192), each summarized to (check, value, threshold,
# pass). Every number comes from the REGISTERED audit's SQL embedded
# verbatim (the graph_node_profile capstone discipline applied to the
# release family), so the gate can never drift from the audits it
# fronts. The Spark side composes the same registered builders.
RELEASE_CHURN_MAX_PPM = 200_000


def _release_gate_oracle() -> str:
    from ..queries import REGISTRY as _SQ_REGISTRY

    # Python WORKERS re-import this package with whatever module a UDF
    # lives in as the entry point; mid-cycle, sibling modules are partial
    # and the registry may not hold the audits yet (the module loop in
    # queries.py skips partially-importable siblings via ImportError —
    # long-standing behavior that is harmless on workers, which only need
    # the UDF function itself, never an oracle). Degrade to the SAME
    # skip instead of a KeyError that would crash the worker.
    missing = [
        n
        for n in (
            "doc_canary_detection",
            "source_pii_coverage",
            "doc_k_anonymity_audit",
            "corpus_snapshot_diff",
            "split_leakage_audit",
        )
        if n not in _SQ_REGISTRY
    ]
    if missing:
        raise ImportError(
            f"release_gate_report needs registered audits {missing} — "
            "partial-import context (Python worker re-import); skipping module"
        )
    canary = _SQ_REGISTRY["doc_canary_detection"].oracle
    pii = _SQ_REGISTRY["source_pii_coverage"].oracle
    kanon = _SQ_REGISTRY["doc_k_anonymity_audit"].oracle
    snap = _SQ_REGISTRY["corpus_snapshot_diff"].oracle
    leak = _SQ_REGISTRY["split_leakage_audit"].oracle
    return f"""
SELECT * FROM (
  SELECT 'canary_flagged_docs' AS check_name,
         CAST(coalesce(sum(n_flagged), 0) AS BIGINT) AS value,
         CAST(0 AS BIGINT) AS threshold,
         coalesce(sum(n_flagged), 0) <= 0 AS pass
  FROM ({canary})
  UNION ALL
  SELECT 'pii_scrub_residual', CAST(coalesce(sum(n_residual), 0) AS BIGINT),
         CAST(0 AS BIGINT), coalesce(sum(n_residual), 0) <= 0
  FROM ({pii})
  UNION ALL
  SELECT 'k_anonymity_below_k_classes',
         CAST(coalesce(sum(CASE WHEN below_k THEN 1 ELSE 0 END), 0) AS BIGINT),
         CAST(0 AS BIGINT),
         coalesce(sum(CASE WHEN below_k THEN 1 ELSE 0 END), 0) <= 0
  FROM ({kanon})
  UNION ALL
  SELECT 'snapshot_churn_docs_ppm',
         CAST(sum(n_added + n_removed + n_changed) * 1000000
              // sum(n_added + n_removed + n_changed + n_unchanged) AS BIGINT),
         CAST({RELEASE_CHURN_MAX_PPM} AS BIGINT),
         sum(n_added + n_removed + n_changed) * 1000000
           // sum(n_added + n_removed + n_changed + n_unchanged)
           <= {RELEASE_CHURN_MAX_PPM}
  FROM ({snap})
  UNION ALL
  SELECT 'split_leaked_eval_docs', CAST(coalesce(sum(n_leaked_eval_docs), 0) AS BIGINT),
         CAST(0 AS BIGINT), coalesce(sum(n_leaked_eval_docs), 0) <= 0
  FROM ({leak})
)
ORDER BY check_name
"""


@register("release_gate_report", _release_gate_oracle())
def release_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five registered release audits summarized to one
    (check, value, threshold, pass) gate table (B216) — the question the
    governance family exists to answer, asked as a single checked plan."""
    from .dedup_queries import split_leakage_audit
    from .pipeline_queries import corpus_snapshot_diff, doc_canary_detection

    canary = (
        doc_canary_detection(spark, sf_dir)
        .agg(F.coalesce(F.sum("n_flagged"), F.lit(0)).cast("long").alias("v"))
        .select(
            F.lit("canary_flagged_docs").alias("check_name"),
            F.col("v").alias("value"),
            F.lit(0).cast("long").alias("threshold"),
            (F.col("v") <= 0).alias("pass"),
        )
    )
    pii = (
        source_pii_coverage(spark, sf_dir)
        .agg(F.coalesce(F.sum("n_residual"), F.lit(0)).cast("long").alias("v"))
        .select(
            F.lit("pii_scrub_residual").alias("check_name"),
            F.col("v").alias("value"),
            F.lit(0).cast("long").alias("threshold"),
            (F.col("v") <= 0).alias("pass"),
        )
    )
    kanon = (
        doc_k_anonymity_audit(spark, sf_dir)
        .agg(
            F.coalesce(F.sum(F.when(F.col("below_k"), 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias("v")
        )
        .select(
            F.lit("k_anonymity_below_k_classes").alias("check_name"),
            F.col("v").alias("value"),
            F.lit(0).cast("long").alias("threshold"),
            (F.col("v") <= 0).alias("pass"),
        )
    )
    snap = (
        corpus_snapshot_diff(spark, sf_dir)
        .agg(
            F.expr(
                "sum(n_added + n_removed + n_changed) * 1000000"
                " div sum(n_added + n_removed + n_changed + n_unchanged)"
            )
            .cast("long")
            .alias("v")
        )
        .select(
            F.lit("snapshot_churn_docs_ppm").alias("check_name"),
            F.col("v").alias("value"),
            F.lit(RELEASE_CHURN_MAX_PPM).cast("long").alias("threshold"),
            (F.col("v") <= RELEASE_CHURN_MAX_PPM).alias("pass"),
        )
    )
    leak = (
        split_leakage_audit(spark, sf_dir)
        .agg(F.coalesce(F.sum("n_leaked_eval_docs"), F.lit(0)).cast("long").alias("v"))
        .select(
            F.lit("split_leaked_eval_docs").alias("check_name"),
            F.col("v").alias("value"),
            F.lit(0).cast("long").alias("threshold"),
            (F.col("v") <= 0).alias("pass"),
        )
    )
    return (
        canary.unionByName(pii)
        .unionByName(kanon)
        .unionByName(snap)
        .unionByName(leak)
        .orderBy("check_name")
    )


# ---------------------------------------------------------------------------
# B229: l-diversity audit (attribute disclosure, the gate k-anonymity misses)
# ---------------------------------------------------------------------------
# k-anonymity (B120) bounds RE-IDENTIFICATION: every quasi-identifier
# class has >= k rows. It says nothing about ATTRIBUTE DISCLOSURE — a
# class of 50 rows that all share one sensitive value leaks that value
# for every member without identifying any of them. l-diversity
# (Machanavajjhala et al., ICDE'06) closes that: every class must carry
# >= l distinct sensitive values, and the entropy variant requires the
# value DISTRIBUTION to be diverse, not just its support. Same QI tuple
# as B120 (lang, source, length decile via the exact-ntile discipline);
# the sensitive attribute is synthesized deterministically (a topic
# bucket from the document's leading token — the fixture carries no
# natural sensitive column; the audit is written against any value
# column). Entropy follows the B183 integer micro-nat contract. Scale
# shape: one groupBy on (QI, topic) then one on QI — both bounded
# cardinality; nothing corpus-wide but the decile assignment.
L_DIVERSITY = 3
TOPIC_BUCKETS = 8

_TOPIC_SPARK = (
    "cast(conv(substring(md5(concat(split(text, ' ')[0], ':topic')), 1, 8), 16, 10)"
    f" as bigint) % {TOPIC_BUCKETS}"
)
_TOPIC_DDB = (
    "CAST(('0x' || substr(md5(string_split(text, ' ')[1] || ':topic'), 1, 8)) AS BIGINT)"
    f" % {TOPIC_BUCKETS}"
)


@register(
    "doc_l_diversity_audit",
    f"""
WITH binned AS (
  SELECT lang, source, {_TOPIC_DDB} AS topic,
         ntile(10) OVER (ORDER BY n_chars, doc_id) AS len_decile
  FROM documents
), cells AS (
  SELECT lang, source, CAST(len_decile AS BIGINT) AS len_decile, topic,
         CAST(count(*) AS BIGINT) AS n
  FROM binned GROUP BY lang, source, len_decile, topic
), tot AS (
  SELECT lang, source, len_decile, CAST(sum(n) AS BIGINT) AS nt
  FROM cells GROUP BY lang, source, len_decile
), classes AS (
  SELECT c.lang, c.source, c.len_decile,
         CAST(max(t.nt) AS BIGINT) AS class_size,
         CAST(count(*) AS BIGINT) AS n_topics,
         CAST(sum(c.n * CAST(round(-ln(c.n * 1.0 / t.nt) * 1000000) AS BIGINT))
              // max(t.nt) AS BIGINT) AS entropy_micronat
  FROM cells c JOIN tot t
    ON t.lang = c.lang AND t.source = c.source AND t.len_decile = c.len_decile
  GROUP BY c.lang, c.source, c.len_decile
)
SELECT lang, source, len_decile, class_size, n_topics,
       n_topics < {L_DIVERSITY} AS below_l,
       entropy_micronat
FROM classes
ORDER BY lang, source, len_decile
""",
)
def doc_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the B120 quasi-identifier classes (B229):
    per-class distinct sensitive-topic count, below-l flag, and the
    exact integer micro-nat entropy of the topic distribution — the
    attribute-disclosure gate beside the re-identification one."""
    from ..operators.quantiles import with_exact_ntile

    d = read_table(spark, sf_dir, "documents")
    binned = with_exact_ntile(
        d.select("lang", "source", "n_chars", "doc_id", F.expr(_TOPIC_SPARK).alias("topic")),
        10,
        "n_chars",
        "doc_id",
        "len_decile",
    ).select("lang", "source", F.col("len_decile").cast("long").alias("len_decile"), "topic")
    cells = binned.groupBy("lang", "source", "len_decile", "topic").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = cells.groupBy("lang", "source", "len_decile").agg(
        F.sum("n").cast("long").alias("nt")
    )
    return (
        cells.join(tot, ["lang", "source", "len_decile"])
        .groupBy("lang", "source", "len_decile")
        .agg(
            F.max("nt").cast("long").alias("class_size"),
            F.count("*").cast("long").alias("n_topics"),
            F.expr(
                "sum(n * cast(round(-ln(n * 1.0 / nt) * 1000000) as bigint)) div max(nt)"
            )
            .cast("long")
            .alias("entropy_micronat"),
        )
        .select(
            "lang",
            "source",
            "len_decile",
            "class_size",
            "n_topics",
            (F.col("n_topics") < L_DIVERSITY).alias("below_l"),
            "entropy_micronat",
        )
        .orderBy("lang", "source", "len_decile")
    )


# ---------------------------------------------------------------------------
# B234: t-closeness audit (r12) — the third leg of the disclosure triad
# ---------------------------------------------------------------------------
# k-anonymity (B120) bounds RE-IDENTIFICATION, l-diversity (B229) bounds
# attribute disclosure by COUNT of sensitive values — but a class whose 3
# distinct topics are split 98/1/1 still leaks. t-closeness (Li, Li &
# Venkatasubramanian, ICDE'07) bounds the DISTANCE between each class's
# sensitive-value distribution and the global one. For the categorical
# topic column the distance is total variation: TVD = ½ Σ_i |p_i − q_i|.
# Engine parity is EXACT RATIONAL arithmetic, not floats: with class
# counts n_i (class total nt) and global counts g_i (total gt),
#   tvd_ppm = 10⁶ · Σ_i |n_i·gt − g_i·nt| div (2·nt·gt)
# — pure integers, one floor division at the end, identical in both
# dialects. Scale shape: the class table is the bounded B120 QI
# cardinality, the global topic table is TOPIC_BUCKETS rows (broadcast);
# the grid join is |classes| × TOPIC_BUCKETS — nothing corpus-wide but
# the shared decile assignment. The |n_i·gt| products are summed through
# decimal(38,0)/HUGEINT (the documented 128-bit moment-sum rule) so the
# audit survives 10¹²-document corpora where n·gt overflows 64 bits.
T_CLOSENESS_PPM = 300_000


@register(
    "doc_t_closeness_audit",
    f"""
WITH binned AS (
  SELECT lang, source, {_TOPIC_DDB} AS topic,
         ntile(10) OVER (ORDER BY n_chars, doc_id) AS len_decile
  FROM documents
), cells AS (
  SELECT lang, source, CAST(len_decile AS BIGINT) AS len_decile, topic,
         CAST(count(*) AS BIGINT) AS n
  FROM binned GROUP BY lang, source, len_decile, topic
), tot AS (
  SELECT lang, source, len_decile, CAST(sum(n) AS BIGINT) AS nt
  FROM cells GROUP BY lang, source, len_decile
), gdist AS (
  SELECT topic, CAST(sum(n) AS BIGINT) AS g FROM cells GROUP BY topic
), gtot AS (
  SELECT CAST(sum(g) AS BIGINT) AS gt FROM gdist
), grid AS (
  SELECT t.lang, t.source, t.len_decile, t.nt, gl.topic, gl.g, gt.gt
  FROM tot t CROSS JOIN gdist gl CROSS JOIN gtot gt
), scored AS (
  SELECT gr.lang, gr.source, gr.len_decile, gr.nt, gr.gt,
         sum(abs(CAST(COALESCE(c.n, 0) AS HUGEINT) * gr.gt
                 - CAST(gr.g AS HUGEINT) * gr.nt)) AS num
  FROM grid gr LEFT JOIN cells c
    ON c.lang = gr.lang AND c.source = gr.source
   AND c.len_decile = gr.len_decile AND c.topic = gr.topic
  GROUP BY gr.lang, gr.source, gr.len_decile, gr.nt, gr.gt
)
SELECT lang, source, len_decile, nt AS class_size,
       CAST(num * 1000000 // (2 * CAST(nt AS HUGEINT) * gt) AS BIGINT) AS tvd_ppm,
       CAST(num * 1000000 // (2 * CAST(nt AS HUGEINT) * gt) AS BIGINT)
         > {T_CLOSENESS_PPM} AS above_t
FROM scored
ORDER BY lang, source, len_decile
""",
)
def doc_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the B120 quasi-identifier classes (B234):
    exact integer total-variation distance between each class's topic
    distribution and the global one, in ppm, with the above-t flag.
    Completes the disclosure triad (B120 k-anonymity, B229 l-diversity).
    """
    from ..operators.quantiles import with_exact_ntile

    d = read_table(spark, sf_dir, "documents")
    binned = with_exact_ntile(
        d.select("lang", "source", "n_chars", "doc_id", F.expr(_TOPIC_SPARK).alias("topic")),
        10,
        "n_chars",
        "doc_id",
        "len_decile",
    ).select("lang", "source", F.col("len_decile").cast("long").alias("len_decile"), "topic")
    cells = binned.groupBy("lang", "source", "len_decile", "topic").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = cells.groupBy("lang", "source", "len_decile").agg(
        F.sum("n").cast("long").alias("nt")
    )
    glob = cells.groupBy("topic").agg(F.sum("n").cast("long").alias("g"))
    gt = glob.agg(F.sum("g").cast("long").alias("gt"))
    grid = tot.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(gt))
    scored = (
        grid.join(cells, ["lang", "source", "len_decile", "topic"], "left")
        .withColumn("n0", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
        .groupBy("lang", "source", "len_decile", "nt", "gt")
        .agg(
            F.sum(
                F.abs(
                    F.col("n0").cast("decimal(38,0)") * F.col("gt")
                    - F.col("g").cast("decimal(38,0)") * F.col("nt")
                )
            ).alias("num")
        )
    )
    return (
        scored.select(
            "lang",
            "source",
            "len_decile",
            F.col("nt").alias("class_size"),
            F.expr(
                "cast((num * 1000000) div (2 * cast(nt as decimal(38,0)) * gt) as bigint)"
            ).alias("tvd_ppm"),
        )
        .withColumn("above_t", F.col("tvd_ppm") > T_CLOSENESS_PPM)
        .orderBy("lang", "source", "len_decile")
    )


# ---------------------------------------------------------------------------
# B263: complementary cell suppression — publishing a contingency table
# without leaking through the margins
# ---------------------------------------------------------------------------
# k-anonymity (B120) gates ROW releases; publishing an aggregate TABLE
# has a subtler failure: suppressing one small cell is useless when the
# row and column margins are published too — margin minus the visible
# cells reconstructs it exactly. Statistical disclosure control's answer
# is COMPLEMENTARY suppression: any line (row or column) with exactly
# one primary-suppressed cell must hide a second cell, classically the
# smallest surviving one. Full optimal SDC is NP-hard; this implements
# the standard one-round heuristic (rows first, then columns over the
# row result — deterministic tie-breaks on count then name, the pass
# order documented) over the (mktsegment × region) customer grid with
# the conventional k = 5. One round does NOT guarantee closure (the
# column pass can hand a clean row exactly one hidden cell), so the
# operator is SELF-AUDITING: residual_leaks counts lines left with
# exactly one hidden cell — 0 means the publication is margin-safe,
# anything else tells the publisher to iterate; the pytest pins 0 on
# this grid.
# Scale: the corpus reduces to the |segments|×|regions| grid by one
# groupBy; suppression logic runs on ≤ 25 rows. At larger SFs every
# cell clears k and the flags are honestly all zero — the audit's grid,
# margins, and verdict still publish.
_SUPPRESS_K = 5


@register(
    "customer_cell_suppression",
    f"""
WITH grid AS (
  SELECT c.c_mktsegment AS segment, r.r_name AS region,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY c.c_mktsegment, r.r_name
), prim AS (
  SELECT *, CASE WHEN n_customers < {_SUPPRESS_K} THEN 1 ELSE 0 END AS prim_sup
  FROM grid
), rowstep AS (
  SELECT *,
         CASE WHEN sum(prim_sup) OVER (PARTITION BY segment) = 1 AND prim_sup = 0
               AND row_number() OVER (
                 PARTITION BY segment, prim_sup ORDER BY n_customers, region) = 1
              THEN 1 ELSE 0 END AS comp_row
  FROM prim
), colstep AS (
  SELECT *,
         CASE WHEN sum(prim_sup + comp_row) OVER (PARTITION BY region) = 1
               AND prim_sup = 0 AND comp_row = 0
               AND row_number() OVER (
                 PARTITION BY region, prim_sup + comp_row
                 ORDER BY n_customers, segment) = 1
              THEN 1 ELSE 0 END AS comp_col
  FROM rowstep
), final AS (
  SELECT *, prim_sup + comp_row + comp_col AS hidden FROM colstep
), leaks AS (
  SELECT CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS residual_leaks
  FROM (
    SELECT sum(hidden) AS h FROM final GROUP BY segment
    UNION ALL
    SELECT sum(hidden) AS h FROM final GROUP BY region
  )
)
SELECT f.segment, f.region, f.n_customers,
       CAST(f.prim_sup AS BIGINT) AS prim_sup,
       CAST(f.comp_row AS BIGINT) AS comp_row,
       CAST(f.comp_col AS BIGINT) AS comp_col,
       CAST(CASE WHEN f.hidden > 0 THEN -1 ELSE f.n_customers END AS BIGINT)
         AS published_count,
       l.residual_leaks
FROM final f CROSS JOIN leaks l
ORDER BY f.segment, f.region
""",
)
def customer_cell_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-round complementary cell suppression over the segment×region
    customer grid (B263): primary k<5 suppression, then row- and
    column-complementary hides so margins cannot reconstruct a cell."""
    from pyspark.sql import Window

    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    grid = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("r_name").alias("region"))
        .agg(F.count("*").cast("long").alias("n_customers"))
    )
    prim = grid.withColumn(
        "prim_sup", F.when(F.col("n_customers") < _SUPPRESS_K, 1).otherwise(0)
    )
    w_row_sum = Window.partitionBy("segment")
    w_row_rank = Window.partitionBy("segment", "prim_sup").orderBy("n_customers", "region")
    rowstep = prim.withColumn(
        "comp_row",
        F.when(
            (F.sum("prim_sup").over(w_row_sum) == 1)
            & (F.col("prim_sup") == 0)
            & (F.row_number().over(w_row_rank) == 1),
            1,
        ).otherwise(0),
    )
    w_col_sum = Window.partitionBy("region")
    w_col_rank = Window.partitionBy(
        "region", (F.col("prim_sup") + F.col("comp_row"))
    ).orderBy("n_customers", "segment")
    colstep = rowstep.withColumn(
        "comp_col",
        F.when(
            (F.sum(F.col("prim_sup") + F.col("comp_row")).over(w_col_sum) == 1)
            & (F.col("prim_sup") == 0)
            & (F.col("comp_row") == 0)
            & (F.row_number().over(w_col_rank) == 1),
            1,
        ).otherwise(0),
    )
    final = colstep.withColumn(
        "hidden", F.col("prim_sup") + F.col("comp_row") + F.col("comp_col")
    ).localCheckpoint(eager=True)
    leaks = (
        final.groupBy("segment").agg(F.sum("hidden").alias("h")).select("h")
        .unionByName(final.groupBy("region").agg(F.sum("hidden").alias("h")).select("h"))
        .agg(
            F.sum(F.when(F.col("h") == 1, 1).otherwise(0))
            .cast("long")
            .alias("residual_leaks")
        )
    )
    return (
        final.crossJoin(F.broadcast(leaks))
        .select(
            "segment",
            "region",
            "n_customers",
            F.col("prim_sup").cast("long").alias("prim_sup"),
            F.col("comp_row").cast("long").alias("comp_row"),
            F.col("comp_col").cast("long").alias("comp_col"),
            F.when(F.col("hidden") > 0, -1)
            .otherwise(F.col("n_customers"))
            .cast("long")
            .alias("published_count"),
            "residual_leaks",
        )
        .orderBy("segment", "region")
    )
