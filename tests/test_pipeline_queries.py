"""Semantic properties of the training-data-pipeline operators (oracle
parity itself is covered by the parametrized test in test_vector_queries)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import vectordb_hr_data_spark.queries as Q

from tests.conftest import assert_matches_oracle


def _run(spark, sf_dir, name):
    return Q.REGISTRY[name].fn(spark, sf_dir)


def test_decontaminate_only_train_docs_with_real_overlap(spark, sf_dir):
    rows = _run(spark, sf_dir, "doc_decontaminate").collect()
    from vectordb_hr_data_spark.querydefs.pipeline_queries import _BUCKET_SPARK

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train_ids = {
        r.doc_id
        for r in d.select("doc_id", F.expr(_BUCKET_SPARK).alias("b")).collect()
        if r.b < 80
    }
    for r in rows:
        assert r.doc_id in train_ids
        assert 1 <= r.n_overlap <= r.n_shingles
        assert 0.0 < r.overlap_frac <= 1.0


def test_repetition_ratio_bounds_and_total_coverage(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = _run(spark, sf_dir, "doc_repetition_ratio").collect()
    assert len(rows) == d.count()  # every doc is scored, none dropped
    for r in rows:
        assert 0.0 <= r.dup_token_frac < 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0
        assert isinstance(r.flagged, bool)


def test_stratified_sample_exact_fraction_per_stratum(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.pipeline_queries import SAMPLE_FRAC

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_lang = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = _run(spark, sf_dir, "stratified_sample_by_lang").groupBy("lang").count().collect()
    for r in got:
        assert r["count"] == math.ceil(SAMPLE_FRAC * per_lang[r.lang])


def test_stratified_sample_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, _run(spark, sf_dir, "stratified_sample_by_lang").collect()))
    b = sorted(map(tuple, _run(spark, sf_dir, "stratified_sample_by_lang").collect()))
    assert a == b


def test_threshold_sample_fraction_and_agreement_with_exact(spark, sf_dir):
    """The map-only threshold sampler must land within binomial tolerance of
    the target fraction per stratum (3σ) and be deterministic."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import SAMPLE_FRAC

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_lang = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {
        r.lang: r["count"]
        for r in _run(spark, sf_dir, "stratified_sample_threshold").groupBy("lang").count().collect()
    }
    for lang, n in per_lang.items():
        k = got.get(lang, 0)
        tol = 3 * math.sqrt(SAMPLE_FRAC * (1 - SAMPLE_FRAC) * n)
        assert abs(k - SAMPLE_FRAC * n) <= max(tol, 3), (lang, k, n)
    a = sorted(map(tuple, _run(spark, sf_dir, "stratified_sample_threshold").collect()))
    b = sorted(map(tuple, _run(spark, sf_dir, "stratified_sample_threshold").collect()))
    assert a == b


def test_threshold_sample_plan_is_map_only(spark, sf_dir):
    """The scale sampler's plan must contain no per-stratum window and no
    exchange before the (presentation-only) final sort."""
    df = _run(spark, sf_dir, "stratified_sample_threshold")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # the only allowed exchange is the rangepartitioning for the output
    # ORDER BY — the filter itself must sit directly on the scan
    body = plan.split("rangepartitioning")[-1]
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Filter" in body and "Scan parquet" in body


def test_pack_sequences_conserves_tokens_and_bins_are_dense(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.pipeline_queries import PACK_BUDGET, PACK_SHARDS

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = d.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    rows = _run(spark, sf_dir, "pack_sequences").collect()
    assert sum(r.sum_tokens for r in rows) == total  # no doc lost or split
    for shard in {r.shard for r in rows}:
        bins = sorted(r.bin for r in rows if r.shard == shard)
        assert bins == list(range(len(bins)))  # contiguous bin ids from 0
    # independent python oracle: replay the chunked-packing rule per shard
    # (doc starts in the bin its pre-doc running total falls in)
    toks = {
        r.doc_id: r.n
        for r in d.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    expect: dict[tuple[int, int], list[int]] = {}
    cums = {s: 0 for s in range(PACK_SHARDS)}
    for doc_id in sorted(toks):
        s = doc_id % PACK_SHARDS
        b = cums[s] // PACK_BUDGET
        expect.setdefault((s, b), [0, 0])
        expect[(s, b)][0] += 1
        expect[(s, b)][1] += toks[doc_id]
        cums[s] += toks[doc_id]
    got = {(r.shard, r.bin): [r.n_docs, r.sum_tokens] for r in rows}
    assert got == expect


def test_chunking_covers_every_token_with_declared_overlap(spark, sf_dir):
    """Chunk windows must tile each document: starts advance by the stride,
    every token falls in ≥1 chunk, the last chunk ends exactly at n, and
    every doc yields ≥1 chunk."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_by_doc = {
        r.doc_id: r.n
        for r in d.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    rows = _run(spark, sf_dir, "doc_chunk_fixed_tokens").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_by_doc)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        n = n_by_doc[doc_id]
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        assert all(r.start_tok == r.chunk_idx * CHUNK_STRIDE for r in rs)
        covered_to = 0
        for r in rs:
            assert r.start_tok <= covered_to  # no gap
            covered_to = max(covered_to, r.start_tok + r.n_chunk_tokens)
            assert r.n_chunk_tokens <= CHUNK_TOKENS
        assert covered_to == n  # full coverage, last chunk short not padded


def test_weighted_mix_respects_per_source_rates(spark, sf_dir):
    """Each language's kept fraction must track its configured weight
    within binomial tolerance, in one deterministic map-only pass."""
    import math

    from vectordb_hr_data_spark.querydefs.pipeline_queries import MIX_WEIGHTS

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_lang = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {
        r.lang: r["count"]
        for r in _run(spark, sf_dir, "corpus_weighted_mix").groupBy("lang").count().collect()
    }
    for lang, n in per_lang.items():
        w = MIX_WEIGHTS.get(lang, 0.0)
        k = got.get(lang, 0)
        tol = 3 * math.sqrt(w * (1 - w) * n)
        assert abs(k - w * n) <= max(tol, 3), (lang, k, n, w)


def test_semantic_dedup_pairs_are_subset_of_exact_allpairs(spark, sf_dir):
    exact = {
        (r.vec_id_1, r.vec_id_2)
        for r in _run(spark, sf_dir, "neardup_embedding_cosine").collect()
    }
    blocked = _run(spark, sf_dir, "semantic_dedup_clusters").collect()
    for r in blocked:
        assert (r.vec_id_1, r.vec_id_2) in exact  # cluster-blocking only prunes


def test_tfidf_topk_rank_and_formula(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.text_queries import TFIDF_TOPK

    rows = _run(spark, sf_dir, "doc_tfidf_top_terms").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TFIDF_TOPK
        weights = [r.tfidf for r in rs]
        assert weights == sorted(weights, reverse=True)


def test_pii_scrub_redacts_everything(spark, sf_dir, ddb):
    """After scrubbing, not a single email/phone pattern survives, every
    doc had exactly one of each injected, and the result oracle-matches."""
    import re

    from vectordb_hr_data_spark.querydefs.scrub_queries import EMAIL_RE, PHONE_RE
    import vectordb_hr_data_spark.queries as Q

    rows = _run(spark, sf_dir, "doc_pii_scrub").collect()
    for r in rows:
        assert r.n_emails == 1 and r.n_phones == 1
        assert not re.search(EMAIL_RE, r.scrubbed)
        assert not re.search(PHONE_RE, r.scrubbed)
        assert "<EMAIL>" in r.scrubbed and "<PHONE>" in r.scrubbed
    assert_matches_oracle(
        _run(spark, sf_dir, "doc_pii_scrub"), ddb, Q.oracle_sql()["doc_pii_scrub"]
    )


def test_url_normalize_dedup_erases_variants(spark, sf_dir, ddb):
    """Canonical URLs carry no scheme/www/query-string/trailing-slash
    variance, and every duplicate group's keeper is its minimum doc_id."""
    import vectordb_hr_data_spark.queries as Q

    rows = _run(spark, sf_dir, "url_normalize_dedup").collect()
    assert rows, "synthesis must produce duplicate groups"
    for r in rows:
        assert r.canonical == r.canonical.lower()
        assert "://" not in r.canonical and "?" not in r.canonical
        assert not r.canonical.startswith("www.")
        assert not r.canonical.endswith("/")
        assert r.n_docs > 1
    assert_matches_oracle(
        _run(spark, sf_dir, "url_normalize_dedup"), ddb, Q.oracle_sql()["url_normalize_dedup"]
    )


def test_bloom_decontaminate_equals_exact_and_stays_jvm(spark, sf_dir):
    """The Bloom prune must be result-invariant (no false negatives → the
    surviving exact join reproduces doc_decontaminate exactly) and the
    probe must be pure Column arithmetic — no Python eval node anywhere in
    the plan, shiftright visible in the filter."""
    import vectordb_hr_data_spark.queries as Q

    exact_df = Q.REGISTRY["doc_decontaminate"].fn(spark, sf_dir)
    bloom_df = Q.REGISTRY["doc_decontaminate_bloom"].fn(spark, sf_dir)
    exact = sorted(map(tuple, exact_df.collect()))
    bloom = sorted(map(tuple, bloom_df.collect()))
    assert bloom == exact
    plan = bloom_df._jdf.queryExecution().executedPlan().toString()
    assert not any(s in plan for s in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"))
    assert "shiftright" in plan
    exact_df.shingle_cache.unpersist()
    bloom_df.shingle_cache.unpersist()


def test_approx_percentiles_bounded_by_exact(spark, sf_dir):
    """percentile_approx at accuracy 10000 must sit within a few tokens of
    the exact interpolated percentile on every (lang, percentile) cell."""
    import vectordb_hr_data_spark.queries as Q

    exact = {r.lang: r for r in Q.REGISTRY["doc_length_percentiles"].fn(spark, sf_dir).collect()}
    approx = {r.lang: r for r in Q.REGISTRY["doc_length_percentiles_approx"].fn(spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for lang, a in approx.items():
        e = exact[lang]
        assert a.n_docs == e.n_docs
        for col in ("p50", "p90", "p99"):
            assert abs(getattr(a, col) - getattr(e, col)) <= 3.0, (lang, col)


def test_approx_distinct_users_within_rsd(spark, sf_dir):
    """HLL++ at rsd=2% must land within 3 sigma (6%) of the exact distinct
    count for every event type."""
    from pyspark.sql import functions as F

    import vectordb_hr_data_spark.queries as Q
    from vectordb_hr_data_spark.io import read_table

    exact = {
        r.event_type: r.n
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in Q.REGISTRY["events_distinct_users_approx"].fn(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(0.06 * n, 2), (t, n, approx[t])


def test_corpus_prep_pipeline_composes_monotonically(spark, sf_dir):
    """The composed pipeline's survivor set must be a (strict, on this
    corpus) subset of the standalone near-dup keep set — every later stage
    only removes documents — and every packed bin must be non-degenerate.
    Oracle parity of the full chain is covered by the parametrized
    test_vector_queries oracle sweep."""
    out = Q.REGISTRY["corpus_prep_pipeline"].fn(spark, sf_dir).collect()
    total_docs = sum(r.n_docs for r in out)
    keep = Q.REGISTRY["neardup_dedup_keep"].fn(spark, sf_dir).count()
    assert 0 < total_docs <= keep
    for r in out:
        assert r.n_docs > 0 and r.sum_tokens > 0
        assert r.utilization > 0.0


def test_corpus_shuffle_shards_balanced_deterministic_one_exchange(spark, sf_dir):
    """Seeded shuffle/shard (r6): (a) every doc appears exactly once with a
    contiguous 1..n_shard position, (b) shard sizes are hash-balanced
    (within 4σ of binomial), (c) re-run is identical (the randomness is a
    hash, not an RNG), (d) the plan carries exactly ONE exchange — the
    per-shard window — since key and shard are map-side projections."""
    import math

    from vectordb_hr_data_spark.queries import REGISTRY

    fn = REGISTRY["corpus_shuffle_shards"].fn
    rows = [(r.doc_id, r.shard, r.pos) for r in fn(spark, sf_dir).collect()]
    n = len(rows)
    assert len({d for d, _, _ in rows}) == n  # each doc once
    by_shard: dict[int, list[int]] = {}
    for _, s, p in rows:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {s} positions not contiguous"
    exp = n / 8
    sigma = math.sqrt(n * (1 / 8) * (7 / 8))
    for s, ps in by_shard.items():
        assert abs(len(ps) - exp) < 4 * sigma + 1, f"shard {s} size {len(ps)} vs {exp:.0f}"
    assert rows == [(r.doc_id, r.shard, r.pos) for r in fn(spark, sf_dir).collect()]
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_simhash_banding_complete_and_consistent(spark, sf_dir):
    """Manku-banded near-dup (r6): (a) SOUND — every reported pair really
    is within Hamming ≤ 3 on the 32-bit simhash, with Jaccard ≥ 0.5
    recomputed driver-side from the shingle sets; (b) COMPLETE over the
    sibling — every min-shingle-blocked n-gram pair whose simhashes are
    within Hamming ≤ 3 is reported (the 4 × 8-bit pigeonhole guarantee).
    Note the converse does NOT hold and that is a feature: the banding
    finds true near-dups the sibling's single-min-shingle blocking can
    miss (e.g. pair (5, 450) at sf0.001 — shared vocabulary shifts the
    lexicographic-min shingle while 3-gram overlap stays 0.97)."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.functions import texthash as H
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY

    got = {
        (r.doc_id_1, r.doc_id_2): (r.hamming, r.jaccard)
        for r in REGISTRY["neardup_simhash_hamming"].fn(spark, sf_dir).collect()
    }
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    shf = toks.select("doc_id", F.expr(H.spark_shingles("toks")).alias("sh"))
    shin = {r.doc_id: set(r.sh) for r in shf.collect()}
    sims = {
        r.doc_id: r.s
        for r in shf.select(
            "doc_id", F.expr(H.spark_simhash(H.spark_hash_array("sh"))).alias("s")
        ).collect()
    }

    def ham(a, b):
        return bin((sims[a] ^ sims[b]) & 0xFFFFFFFF).count("1")
    for (a, b), (h, j) in got.items():
        assert h == ham(a, b) and h <= 3
        inter = len(shin[a] & shin[b])
        union = len(shin[a] | shin[b])
        assert union and inter / union >= 0.5
        assert j == int(_r_up(inter * 10000.0 / union, 0)) / 10000.0
    ngram = {
        (r.doc_id_1, r.doc_id_2): r.jaccard
        for r in REGISTRY["neardup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    for (a, b), j in ngram.items():
        if ham(a, b) <= 3:
            assert (a, b) in got, f"banding missed {(a, b)} at hamming {ham(a, b)}"


def _r_up(x, nd):
    """Spark/DuckDB-compatible HALF_UP rounding (python round() is
    half-even; BigDecimal.valueOf(double).setScale(nd, HALF_UP) operates
    on the shortest decimal repr, which Decimal(repr(x)) reproduces)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal(f"1e-{nd}"), rounding=ROUND_HALF_UP))


def test_lm_perplexity_matches_python_lm(spark, sf_dir):
    """doc_lm_perplexity (r6): recompute the add-alpha bigram LM in plain
    Python (counts → smoothed -ln p → micro-nat quantization → integer
    sums) and assert every document's n_bigrams / cross_entropy / ppl
    match exactly — including the order-independence contract (the python
    sum is over dict order, Spark's over partition order; the integer
    quantization makes both exact)."""
    import math
    from collections import Counter, defaultdict

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.text_queries import LM_ALPHA

    docs = {
        r.doc_id: r.text.split(" ")
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    c2, c1, vocab = Counter(), Counter(), set()
    per_doc = defaultdict(Counter)
    for doc_id, t in docs.items():
        vocab.update(t)
        for w1, w2 in zip(t, t[1:]):
            c2[(w1, w2)] += 1
            c1[w1] += 1
            per_doc[doc_id][(w1, w2)] += 1
    v = len(vocab)

    got = {r.doc_id: r for r in REGISTRY["doc_lm_perplexity"].fn(spark, sf_dir).collect()}
    assert set(got) == {d for d, t in docs.items() if len(t) >= 2}
    for doc_id, grams in per_doc.items():
        s = sum(
            n * int(_r_up(-math.log((c2[g] + LM_ALPHA) / (c1[g[0]] + LM_ALPHA * v)) * 1e6, 0))
            for g, n in grams.items()
        )
        n_tot = sum(grams.values())
        r = got[doc_id]
        assert r.n_bigrams == n_tot
        ce_micro = int(_r_up(s / n_tot, 0))
        assert r.cross_entropy == ce_micro / 1e6
        assert r.ppl == _r_up(math.exp(ce_micro / 1e6), 4)


def test_quality_classifier_keep_is_sign_of_integer_sum(spark, sf_dir):
    """doc_quality_classifier (r6): the keep verdict equals the sign of
    the exact integer dot product (recomputed in python from the same
    md5-derived milli-weights), and score is the sigmoid of logit."""
    import hashlib
    import math

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.text_queries import CLF_BUCKETS, CLF_W_SCALE

    def fh(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def weight(tok):
        b = fh(tok) % CLF_BUCKETS
        return (fh(f"w:{b}") % (2 * CLF_W_SCALE + 1)) - CLF_W_SCALE

    docs = {
        r.doc_id: r.text.split(" ")
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    got = {r.doc_id: r for r in REGISTRY["doc_quality_classifier"].fn(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for doc_id, toks in docs.items():
        s = sum(weight(t) for t in toks)
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        logit = s / CLF_W_SCALE / len(toks)
        assert r.dot_milli == s
        assert r.score == _r_up(1.0 / (1.0 + math.exp(-logit)), 4)
        assert r.keep == (s > 0)


def test_dup_ngram_coverage_matches_bruteforce(spark, sf_dir):
    """doc_dup_ngram_coverage (r6): brute-force the corpus n-gram counts
    and the per-document covered-position union in python; every row must
    match, short documents included (0 coverage via the left join), and
    the planted exact-duplicate docs must report full coverage."""
    from collections import Counter

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.pipeline_queries import DUPSPAN_N

    docs = {
        r.doc_id: r.text.split(" ")
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    grams = Counter()
    for t in docs.values():
        for i in range(len(t) - DUPSPAN_N + 1):
            grams[" ".join(t[i : i + DUPSPAN_N])] += 1

    got = {r.doc_id: r for r in REGISTRY["doc_dup_ngram_coverage"].fn(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    full_cov = 0
    for doc_id, t in docs.items():
        covered = set()
        for i in range(len(t) - DUPSPAN_N + 1):
            if grams[" ".join(t[i : i + DUPSPAN_N])] > 1:
                covered.update(range(i, i + DUPSPAN_N))
        r = got[doc_id]
        assert r.n_tokens == len(t)
        assert r.n_dup_positions == len(covered)
        assert r.dup_frac == int(_r_up(len(covered) * 1e6 / len(t), 0)) / 1e6
        full_cov += r.dup_frac == 1.0
    texts = Counter(" ".join(t) for t in docs.values())
    if any(c > 1 for c in texts.values()):
        assert full_cov > 0


def test_dsir_matches_python_and_enriches_target(spark, sf_dir):
    """dsir_importance_resample (r6): recompute the hashed-bigram
    importance weights in python (integer micro-nat contract included)
    and assert every row matches; then assert the selected head is
    enriched in the target language versus the base rate — the point of
    the method."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        DSIR_ALPHA,
        DSIR_BUCKETS,
        DSIR_KEEP_FRAC,
    )

    def bucket(w1, w2):
        return int(hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    docs = {
        r.doc_id: (r.lang, r.text.split(" "))
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    tgt, raw = Counter(), Counter()
    per_doc = defaultdict(Counter)
    for doc_id, (lang, t) in docs.items():
        for w1, w2 in zip(t, t[1:]):
            b = bucket(w1, w2)
            per_doc[doc_id][b] += 1
            raw[b] += 1
            if lang == "en":
                tgt[b] += 1
    nt, nr = sum(tgt.values()), sum(raw.values())

    def lw(b):
        pt = (tgt.get(b, 0) + DSIR_ALPHA) / (nt + DSIR_ALPHA * DSIR_BUCKETS)
        pr = (raw[b] + DSIR_ALPHA) / (nr + DSIR_ALPHA * DSIR_BUCKETS)
        return int(_r_up(math.log(pt / pr) * 1e6, 0))

    scores = {
        doc_id: (sum(n * lw(b) for b, n in bs.items()), sum(bs.values()))
        for doc_id, bs in per_doc.items()
    }
    order = sorted(scores, key=lambda d: (-(scores[d][0] / scores[d][1]), d))
    ranks = {d: i + 1 for i, d in enumerate(order)}
    k = math.ceil(DSIR_KEEP_FRAC * len(order))

    got = {r.doc_id: r for r in REGISTRY["dsir_importance_resample"].fn(spark, sf_dir).collect()}
    assert set(got) == set(scores)
    for doc_id, (s, n) in scores.items():
        r = got[doc_id]
        assert r.n_bigrams == n
        assert r.log_ratio == int(_r_up(s / n, 0)) / 1e6
        assert r.rnk == ranks[doc_id]
        assert r.selected == (ranks[doc_id] <= k)
    sel_en = sum(1 for d in order[:k] if docs[d][0] == "en") / k
    base_en = sum(1 for d in docs if docs[d][0] == "en") / len(docs)
    assert sel_en > base_en


def test_token_budget_sample_prefix_fits_budget(spark, sf_dir):
    """source_token_budget_sample (r6): per source, the kept rows are
    exactly the seeded-hash-order prefix whose running token total fits
    the budget; recomputed in python; kept token mass never exceeds the
    budget and adding the first dropped doc would exceed it."""
    import hashlib
    from collections import defaultdict

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.pipeline_queries import TOKEN_BUDGET_PER_SOURCE

    docs = [
        (r.doc_id, r.source, len(r.text.split(" ")))
        for r in read_table(spark, sf_dir, "documents").collect()
    ]
    by_src = defaultdict(list)
    for doc_id, src, n in docs:
        key = hashlib.md5(f"{doc_id}:budget".encode()).hexdigest()
        by_src[src].append((key, doc_id, n))
    expect = {}
    for src, rows in by_src.items():
        cum = 0
        for key, doc_id, n in sorted(rows):
            cum += n
            expect[doc_id] = (n, cum, cum <= TOKEN_BUDGET_PER_SOURCE)

    got = {r.doc_id: r for r in REGISTRY["source_token_budget_sample"].fn(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for doc_id, (n, cum, kept) in expect.items():
        r = got[doc_id]
        assert (r.n_tokens, r.cum_tokens, r.kept) == (n, cum, kept)
    kept_mass = defaultdict(int)
    for r in got.values():
        if r.kept:
            kept_mass[r.source] += r.n_tokens
    assert all(v <= TOKEN_BUDGET_PER_SOURCE for v in kept_mass.values())


def test_bpe_train_matches_python_trainer(spark, sf_dir):
    """bpe_train_merges / bpe_encode_token_counts (r6): replay the exact
    BPE trainer in python — word-freq vocabulary, weighted adjacent-pair
    counts, argmax with (count desc, left, right) tie-break, greedy
    left-to-right merge application — and assert the merge table AND the
    per-document encoded token counts match row for row."""
    from collections import Counter

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.tokenizer_queries import BPE_N_MERGES

    docs = {
        r.doc_id: [w for w in r.text.split(" ") if w]
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    freq = Counter(w for ws in docs.values() for w in ws)
    vocab = {w: list(w) for w in freq}

    def merge_word(syms, l, r):
        out = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        return out

    merges = []
    for rank in range(1, BPE_N_MERGES + 1):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, cnt))
        vocab = {w: merge_word(syms, l, r) for w, syms in vocab.items()}

    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in REGISTRY["bpe_train_merges"].fn(spark, sf_dir).collect()
    ]
    assert got == merges
    # encode side: per-doc token counts under the final vocabulary
    enc = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in REGISTRY["bpe_encode_token_counts"].fn(spark, sf_dir).collect()
    }
    assert set(enc) == set(docs)
    for doc_id, ws in docs.items():
        assert enc[doc_id] == (len(ws), sum(len(vocab[w]) for w in ws))
    # merges must actually compress: every doc's BPE count < word-char sum
    assert all(
        enc[d][1] < sum(len(w) for w in ws) for d, ws in docs.items() if ws
    )


def test_bpe_distributed_path_matches_driver_path(spark, sf_dir):
    """The forced-distributed BPE rounds (the 100 TB path) learn the exact
    same merge table as the auto-routed driver trainer — ties included."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.tokenizer_queries import bpe_train

    d = read_table(spark, sf_dir, "documents")
    m_auto, _ = bpe_train(spark, d, method="auto")
    m_dist, v_dist = bpe_train(spark, d, method="distributed")
    assert m_auto == m_dist
    # and the distributed final vocabulary agrees with re-applying the
    # merges in python
    def apply_all(w):
        syms = list(w)
        for _, l, r, _, _ in m_auto:
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            syms = out
        return syms

    for row in v_dist.collect():
        assert row.syms == apply_all(row.w), row.w


def test_quality_prep_pipeline_composes_the_standalone_stages(spark, sf_dir):
    """quality_prep_pipeline (r6): the composed result must be derivable
    from the standalone stage queries — every kept doc passed the
    repetition gate, the classifier gate (keep), and its final ppl agrees
    with a LM retrained on the python-recomputed survivor set; stagewise
    survivor counts are monotone non-increasing; per-source kept token
    mass respects the budget."""
    from collections import defaultdict

    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        TOKEN_BUDGET_PER_SOURCE,
    )

    kept = {r.doc_id: r for r in REGISTRY["quality_prep_pipeline"].fn(spark, sf_dir).collect()}
    assert kept, "pipeline kept nothing"
    rep = {r.doc_id: r.flagged for r in REGISTRY["doc_repetition_ratio"].fn(spark, sf_dir).collect()}
    clf = {r.doc_id: r.keep for r in REGISTRY["doc_quality_classifier"].fn(spark, sf_dir).collect()}
    for doc_id in kept:
        assert not rep[doc_id], f"{doc_id} is repetition-flagged but kept"
        assert clf[doc_id], f"{doc_id} fails the classifier gate but kept"
    mass = defaultdict(int)
    for r in kept.values():
        mass[r.source] += r.n_tokens
    assert all(v <= TOKEN_BUDGET_PER_SOURCE for v in mass.values())
    # the composed set is strictly smaller than the classifier-gate set
    assert len(kept) < sum(1 for v in clf.values() if v)


def test_hard_negatives_exclude_near_duplicates(spark, sf_dir):
    """mine_hard_negatives (r6): no mined negative may be a near-duplicate
    of its query (the false-negative trap the band filter exists for) —
    checked against the standalone near-dup pair query — and every mined
    cosine must be the true rank-r value from a brute-force recompute."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        HARDNEG_DUP_COSINE,
        HARDNEG_N_QUERIES,
        HARDNEG_TOPK,
    )

    mined = REGISTRY["mine_hard_negatives"].fn(spark, sf_dir).collect()
    assert mined, "no negatives mined"
    dups = set()
    for r in REGISTRY["neardup_embedding_cosine"].fn(spark, sf_dir).collect():
        dups.add((r.vec_id_1, r.vec_id_2))
        dups.add((r.vec_id_2, r.vec_id_1))
    for r in mined:
        assert (r.query_id, r.vec_id) not in dups
        assert r.cosine < HARDNEG_DUP_COSINE

    import numpy as np

    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in read_table(spark, sf_dir, "embeddings").collect()
    }
    for qid in range(HARDNEG_N_QUERIES):
        q = vecs[qid]
        qn = np.sqrt((q * q).sum())
        cands = []
        for vid, v in vecs.items():
            if vid == qid:
                continue
            c = round(float((v @ q) / (np.sqrt((v * v).sum()) * qn)), 4)
            if c < HARDNEG_DUP_COSINE:
                cands.append((-c, vid))
        expect = [(vid, -nc) for nc, vid in sorted(cands)[:HARDNEG_TOPK]]
        got = [(r.vec_id, r.cosine) for r in mined if r.query_id == qid]
        assert [g[0] for g in got] == [e[0] for e in expect]


def test_interval_bucket_join_matches_bruteforce_range(spark, sf_dir):
    """events_interval_bucket_join (r6): the bucketed equi-join + residual
    must equal the naive range predicate — recomputed in python over the
    full events table — including windows' event/user counts and
    decimal-exact value totals."""
    from collections import defaultdict
    from decimal import Decimal

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.event_queries import WIN_EVERY_H, WIN_LEN_H

    evs = read_table(spark, sf_dir, "events").collect()
    t0 = min(r.ts for r in evs).replace(hour=0, minute=0, second=0, microsecond=0)
    tmax = max(r.ts for r in evs)
    import datetime as dt

    n_w = int((tmax - t0).total_seconds() // (3600 * WIN_EVERY_H)) + 1
    expect = defaultdict(lambda: [0, set(), Decimal("0")])
    for w in range(n_w):
        ws = t0 + dt.timedelta(hours=w * WIN_EVERY_H)
        we = ws + dt.timedelta(hours=WIN_LEN_H)
        for r in evs:
            if ws <= r.ts < we:
                e = expect[w]
                e[0] += 1
                e[1].add(r.user_id)
                e[2] += Decimal(str(round(r.value, 2)))

    got = {r.window_id: r for r in REGISTRY["events_interval_bucket_join"].fn(spark, sf_dir).collect()}
    assert set(got) == {w for w, e in expect.items() if e[0] > 0}
    for w, r in got.items():
        assert r.n_events == expect[w][0]
        assert r.n_users == len(expect[w][1])
        assert abs(float(expect[w][2]) - r.total_value) < 1e-9


def test_ppl_threshold_gate_approximates_exact_rank_cut(spark, sf_dir):
    """doc_lm_perplexity_threshold (r6): the sketch-threshold gate must
    agree with the exact 75% rank cut up to the approx_percentile
    accuracy knob — here within 2% of the corpus on either side — and
    must never pass a doc whose ce exceeds the accepted cut value."""
    import math

    from vectordb_hr_data_spark.queries import REGISTRY

    exact = sorted(
        (round(r.cross_entropy * 1e6), r.doc_id)
        for r in REGISTRY["doc_lm_perplexity"].fn(spark, sf_dir).collect()
    )
    n = len(exact)
    k = math.ceil(0.75 * n)
    exact_keep = {d for _, d in exact[:k]}
    got = {r.doc_id: r.ce_micro for r in REGISTRY["doc_lm_perplexity_threshold"].fn(spark, sf_dir).collect()}
    # regression (ADVICE r6): the gate's ce_micro reconstruction from the
    # display float must be EXACT — the old truncating long cast could be
    # one micro-nat low, perturbing the percentile cut and the kept set
    exact_ce = {d: ce for ce, d in exact}
    assert all(got[d] == exact_ce[d] for d in got)
    cut = max(got.values())
    assert all(ce <= cut for ce in got.values())
    sym_diff = len(exact_keep ^ set(got))
    assert sym_diff <= max(2, int(0.02 * n)), (sym_diff, n)


def test_dup_span_removal_matches_python_keepfirst(spark, sf_dir):
    """doc_dup_span_removal (r6): python replay of keep-first
    exact-substring dedup — global first instance per duplicated gram
    survives, every other instance's positions drop, survivors reassemble
    in order. Every row must match, and n_removed must be bounded by
    B34's coverage (which also counts the kept first instances)."""
    from collections import defaultdict

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.pipeline_queries import DUPSPAN_N

    docs = {
        r.doc_id: r.text.split(" ")
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    by_gram = defaultdict(list)
    for doc_id in sorted(docs):
        t = docs[doc_id]
        for i in range(len(t) - DUPSPAN_N + 1):
            by_gram[" ".join(t[i : i + DUPSPAN_N])].append((doc_id, i))
    removed = defaultdict(set)
    for g, insts in by_gram.items():
        if len(insts) > 1:
            for doc_id, i in sorted(insts)[1:]:
                removed[doc_id].update(range(i, i + DUPSPAN_N))

    got = {r.doc_id: r for r in REGISTRY["doc_dup_span_removal"].fn(spark, sf_dir).collect()}
    cov = {r.doc_id: r.n_dup_positions for r in REGISTRY["doc_dup_ngram_coverage"].fn(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for doc_id, t in docs.items():
        rm = removed[doc_id]
        cleaned = " ".join(tok for p, tok in enumerate(t) if p not in rm)
        r = got[doc_id]
        assert r.n_tokens == len(t)
        assert r.n_removed == len(rm)
        assert r.cleaned_text == cleaned
        assert r.n_removed <= cov[doc_id]


def test_dup_ngram_ops_handle_short_docs(spark, sf_dir, tmp_path):
    """Regression (ADVICE r6): Spark's ``sequence(1, 0)`` is DESCENDING
    [1, 0] (step defaults to -1 when start > stop), so the span builders'
    old ``greatest(..., 0)`` bound fed ``slice(t, 0, 8)`` and crashed on
    any document shorter than DUPSPAN_N tokens. Plant docs of 1 and 3
    tokens next to real corpus rows: both operators must run, report 0
    coverage / 0 removals for the short docs, and keep their text."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY

    d = read_table(spark, sf_dir, "documents").limit(20)
    extra = spark.createDataFrame(
        [(900001, "tiny", "en", "web", 4), (900002, "three token doc", "en", "web", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tiny_dir = str(tmp_path / "short_docs_sf")
    d.unionByName(extra).write.parquet(f"{tiny_dir}/documents.parquet")

    cov = {r.doc_id: r for r in REGISTRY["doc_dup_ngram_coverage"].fn(spark, tiny_dir).collect()}
    assert cov[900001].n_tokens == 1 and cov[900001].n_dup_positions == 0
    assert cov[900002].n_tokens == 3 and cov[900002].dup_frac == 0.0

    rem = {r.doc_id: r for r in REGISTRY["doc_dup_span_removal"].fn(spark, tiny_dir).collect()}
    assert rem[900001].n_removed == 0 and rem[900001].cleaned_text == "tiny"
    assert rem[900002].n_removed == 0 and rem[900002].cleaned_text == "three token doc"


def test_incremental_q1_state_equals_full_recompute(spark, sf_dir):
    """operators/incremental (B45): maintaining the q1 partial-aggregate
    state over arbitrary batch splits must be EXACTLY equal (decimal
    bit-equality) to the full recompute — three different splits, one of
    them three-way with an empty batch."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.incremental import (
        merge_q1_state,
        q1_report,
        q1_state,
    )

    li = read_table(spark, sf_dir, "lineitem")
    full = q1_report(q1_state(li)).collect()

    for split_expr in [
        F.col("l_orderkey") % 2 == 0,
        F.col("l_orderkey") % 7 < 3,
    ]:
        a, b = li.filter(split_expr), li.filter(~split_expr)
        merged = q1_report(merge_q1_state(q1_state(a), q1_state(b))).collect()
        assert merged == full
    # three-way incl. an empty delta
    a = li.filter(F.col("l_orderkey") % 3 == 0)
    b = li.filter(F.col("l_orderkey") % 3 == 1)
    c = li.filter(F.col("l_orderkey") % 3 == 2)
    empty = li.filter(F.lit(False))
    state = q1_state(a)
    for batch in (b, empty, c):
        state = merge_q1_state(state, q1_state(batch))
    assert q1_report(state).collect() == full


def test_pagerank_matches_python_power_iteration(spark, sf_dir):
    """doc_pagerank_centrality (r6): replay the integer power iteration in
    python from a brute-force-derived top-3 cosine graph; the top-20
    ranks and micro-unit scores must match exactly, and a node with many
    in-links must outrank one with none."""
    import numpy as np

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        PAGERANK_DEG,
        PAGERANK_ITERS,
        PAGERANK_TOPN,
    )

    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in read_table(spark, sf_dir, "embeddings").collect()
    }

    # the engines' shared determinism contract: sequential left-fold dot
    # and norms, dot-then-divide, half-away-from-zero 4-decimal rounding
    def fold_sum(xs):
        acc = 0.0
        for x in xs:
            acc = acc + x
        return acc

    def round4(x):
        import math

        return math.copysign(math.floor(abs(x) * 1e4 + 0.5), x) / 1e4

    norms = {v: np.sqrt(fold_sum(a * a)) for v, a in vecs.items()}
    out_edges = {}
    for s, a in vecs.items():
        cands = sorted(
            (
                (-round4(fold_sum(b * a) / (norms[d] * norms[s])), d)
                for d, b in vecs.items()
                if d != s
            )
        )[:PAGERANK_DEG]
        out_edges[s] = [d for _, d in cands]
    r = {v: 1_000_000 for v in vecs}
    for _ in range(PAGERANK_ITERS):
        nxt = {v: 150_000 for v in vecs}
        for s, dsts in out_edges.items():
            cb = (r[s] * 170 + 300) // 600
            for d in dsts:
                nxt[d] += cb
        r = nxt
    expect = sorted(((-rv, v) for v, rv in r.items()))[:PAGERANK_TOPN]
    got = REGISTRY["doc_pagerank_centrality"].fn(spark, sf_dir).collect()
    assert [(g.vec_id, g.rank_micro) for g in got] == [(v, -nr) for nr, v in expect]
    in_deg = {}
    for dsts in out_edges.values():
        for d in dsts:
            in_deg[d] = in_deg.get(d, 0) + 1
    assert in_deg.get(got[0].vec_id, 0) >= 1


def test_scd2_intervals_partition_each_user_timeline(spark, sf_dir):
    """events_scd2_user_state (B48, r7): per user, the type-2 rows must
    chain (valid_to of run i == valid_from of run i+1), have exactly one
    open is_current interval (the last), collapse only CONSECUTIVE equal
    states (adjacent runs differ in event_type), and conserve the user's
    event count."""
    from collections import defaultdict

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY

    rows = REGISTRY["events_scd2_user_state"].fn(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    ev_counts = {
        r.user_id: r.n
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(by_user) == set(ev_counts)
    for uid, runs in by_user.items():
        runs.sort(key=lambda r: r.run_id)
        assert [r.run_id for r in runs] == list(range(1, len(runs) + 1))
        assert sum(r.n_events for r in runs) == ev_counts[uid]
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type
            assert not a.is_current
        assert runs[-1].is_current and runs[-1].valid_to is None


def test_zorder_layout_improves_two_dim_file_skipping(spark, sf_dir, tmp_path):
    """events_zorder_layout (B51, r7): write the events with the Morton
    layout (repartitionByRange on zval + sortWithinPartitions — the
    production shape, no global window) and with a plain time-sorted
    layout; a (user range AND time range) predicate must touch strictly
    fewer files under the Z-order layout. Also pin the zval bit
    interleave against a python replay."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY

    ev = read_table(spark, sf_dir, "events")
    layout = REGISTRY["events_zorder_layout"].fn(spark, sf_dir)
    rows = layout.collect()

    # python replay of the interleave
    import math

    t = {r.event_id: r for r in rows}
    for r in rows[:200]:
        z = 0
        for b in range(8):
            z += ((r.ub >> b) & 1) << (2 * b + 1)
            z += ((r.hb >> b) & 1) << (2 * b)
        assert z == r.zval, r

    joined = ev.join(layout.select("event_id", "zval"), "event_id")
    n = joined.count()
    per_file = max(32, math.ceil(n / 32))
    zdir, tdir = str(tmp_path / "zorder"), str(tmp_path / "tsorted")
    (
        joined.repartitionByRange(8, "zval")
        .sortWithinPartitions("zval", "event_id")
        .write.option("maxRecordsPerFile", per_file)
        .parquet(zdir)
    )
    (
        joined.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts", "event_id")
        .write.option("maxRecordsPerFile", per_file)
        .parquet(tdir)
    )

    u_lo, u_hi, t_lo, t_hi = ev.agg(
        F.expr("percentile(user_id, 0.4)"),
        F.expr("percentile(user_id, 0.6)"),
        F.expr("percentile(cast(unix_micros(ts) as double), 0.4)"),
        F.expr("percentile(cast(unix_micros(ts) as double), 0.6)"),
    ).first()

    def files_touched(path):
        df = spark.read.parquet(path)
        return (
            df.filter(
                (F.col("user_id") >= u_lo)
                & (F.col("user_id") <= u_hi)
                & (F.unix_micros("ts") >= t_lo)
                & (F.unix_micros("ts") <= t_hi)
            )
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_touched, t_touched = files_touched(zdir), files_touched(tdir)
    assert z_touched < t_touched, (z_touched, t_touched)


def test_mad_outlier_gate_matches_python_and_is_robust(spark, sf_dir):
    """source_length_mad_outliers (B52, r7): python replay of the exact
    interpolated median / MAD per source matches every row, and the gate
    flags a planted extreme length while mean±3σ on the same data would
    move with it (the robustness point)."""
    import statistics

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY

    d = read_table(spark, sf_dir, "documents").collect()
    by_source = {}
    for r in d:
        by_source.setdefault(r.source, []).append(r.n_chars)
    stats = {}
    for s, xs in by_source.items():
        med2 = round(2 * statistics.median(xs))
        devs = [abs(2 * x - med2) for x in xs]
        mad4 = round(2 * statistics.median(devs))
        stats[s] = (med2, mad4)
    rows = REGISTRY["source_length_mad_outliers"].fn(spark, sf_dir).collect()
    assert len(rows) == len(d)
    n_out = 0
    for r in rows:
        med2, mad4 = stats[r.source]
        assert (r.med2, r.mad4) == (med2, mad4), r
        dev2 = abs(2 * r.n_chars - med2)
        assert r.is_outlier == (2 * dev2 > 3 * mad4), r
        n_out += r.is_outlier
    assert n_out < len(rows) / 4  # robust gate flags a minority, not half


def test_label_communities_match_python_propagation(spark, sf_dir):
    """doc_label_communities (B54, r7): replay the synchronous min-tie
    label propagation in python from a brute-force undirected top-3
    cosine graph (same fold-cosine rounding contract); every node's final
    community must match, and propagation must actually merge nodes
    (fewer communities than nodes)."""
    import math

    import numpy as np

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.similarity_queries import LP_DEG, LP_ITERS

    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in read_table(spark, sf_dir, "embeddings").collect()
    }

    def fold_sum(xs):
        acc = 0.0
        for x in xs:
            acc = acc + x
        return acc

    def round4(x):
        return math.copysign(math.floor(abs(x) * 1e4 + 0.5), x) / 1e4

    norms = {v: np.sqrt(fold_sum(a * a)) for v, a in vecs.items()}
    nbrs = {v: set() for v in vecs}
    for s, a in vecs.items():
        cands = sorted(
            (
                (-round4(fold_sum(b * a) / (norms[d] * norms[s])), d)
                for d, b in vecs.items()
                if d != s
            )
        )[:LP_DEG]
        for _, d in cands:
            nbrs[s].add(d)
            nbrs[d].add(s)
    lab = {v: v for v in vecs}
    for _ in range(LP_ITERS):
        nxt = {}
        for v, ns in nbrs.items():
            cnt = {}
            for u in ns:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            nxt[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0] if ns else lab[v]
        lab = nxt
    got = {r.vec_id: r.community_id for r in REGISTRY["doc_label_communities"].fn(spark, sf_dir).collect()}
    assert got == lab
    assert len(set(got.values())) < len(got)  # propagation merged something


def test_scd2_incremental_merge_equals_full_build(spark, sf_dir):
    """merge_scd2 (r7): folding ts-ordered batches into the SCD2 dimension
    must be EXACTLY equal to the full rebuild — three splits including a
    type-continuing seam (open-row extension), a type-changing seam, an
    empty batch, and brand-new users appearing mid-stream."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import merge_scd2, scd2_build

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    full = sorted(map(tuple, scd2_build(ev).collect()))

    # pick two strict ts cut points so equal-ts rows never split
    ts_sorted = [r.ts for r in ev.select("ts").distinct().orderBy("ts").collect()]
    c1, c2 = ts_sorted[len(ts_sorted) // 3], ts_sorted[2 * len(ts_sorted) // 3]
    b1 = ev.filter(F.col("ts") <= c1)
    b2 = ev.filter((F.col("ts") > c1) & (F.col("ts") <= c2))
    empty = ev.filter(F.lit(False))
    b3 = ev.filter(F.col("ts") > c2)

    state = scd2_build(b1)
    for batch in (b2, empty, b3):
        state = merge_scd2(state, batch)
        state = spark.createDataFrame(state.collect(), state.schema)  # materialize like a real dim table
    got = sorted(map(tuple, state.collect()))
    assert got == full


def test_compact_zorder_restores_layout_and_skipping(spark, sf_dir, tmp_path):
    """io.compact_clustered (r7): shred the Z-ordered events into many
    tiny files (the small-append failure mode), compact on zval, and
    assert (a) the file count collapses, (b) every row survives
    byte-identically, (c) the 2-D range predicate touches at most as
    many files as before — the OPTIMIZE ZORDER contract."""
    from vectordb_hr_data_spark.io import compact_clustered, read_table
    from vectordb_hr_data_spark.queries import REGISTRY

    ev = read_table(spark, sf_dir, "events")
    layout = REGISTRY["events_zorder_layout"].fn(spark, sf_dir).select("event_id", "zval")
    joined = ev.join(layout, "event_id")
    path = str(tmp_path / "shredded")
    # 32 random-ish small files: the post-firehose state with no clustering
    joined.repartition(32).write.parquet(path)

    u_lo, u_hi, t_lo, t_hi = joined.agg(
        F.expr("percentile(user_id, 0.4)"),
        F.expr("percentile(user_id, 0.6)"),
        F.expr("percentile(cast(unix_micros(ts) as double), 0.4)"),
        F.expr("percentile(cast(unix_micros(ts) as double), 0.6)"),
    ).first()

    def files_touched():
        return (
            spark.read.parquet(path)
            .filter(
                (F.col("user_id") >= u_lo)
                & (F.col("user_id") <= u_hi)
                & (F.unix_micros("ts") >= t_lo)
                & (F.unix_micros("ts") <= t_hi)
            )
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    before_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    touched_before = files_touched()
    n = len(before_rows)
    files_before, files_after = compact_clustered(
        spark, path, ["zval", "event_id"], rows_per_file=max(64, n // 8)
    )
    assert files_before >= 32 and files_after < files_before / 2
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before_rows
    touched_after = files_touched()
    assert touched_after <= touched_before
    assert touched_after < files_after  # clustering actually skips files


def test_coreset_reps_are_max_rank_within_their_community(spark, sf_dir):
    """graph_coreset_select (B55, r7): cross-check the composition against
    its constituents — for every community from doc_label_communities,
    the selected representative must be the member with the highest
    integer PageRank (python power-iteration replay over the same
    fold-cosine graph), ties to the smallest id, and sizes must add up to
    the corpus."""
    import math

    import numpy as np

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        PAGERANK_DEG,
        PAGERANK_ITERS,
    )

    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in read_table(spark, sf_dir, "embeddings").collect()
    }

    def fold_sum(xs):
        acc = 0.0
        for x in xs:
            acc = acc + x
        return acc

    def round4(x):
        return math.copysign(math.floor(abs(x) * 1e4 + 0.5), x) / 1e4

    norms = {v: np.sqrt(fold_sum(a * a)) for v, a in vecs.items()}
    out_edges = {}
    for s, a in vecs.items():
        cands = sorted(
            (
                (-round4(fold_sum(b * a) / (norms[d] * norms[s])), d)
                for d, b in vecs.items()
                if d != s
            )
        )[:PAGERANK_DEG]
        out_edges[s] = [d for _, d in cands]
    r = {v: 1_000_000 for v in vecs}
    for _ in range(PAGERANK_ITERS):
        nxt = {v: 150_000 for v in vecs}
        for s, dsts in out_edges.items():
            cb = (r[s] * 170 + 300) // 600
            for d in dsts:
                nxt[d] += cb
        r = nxt

    lab = {
        x.vec_id: x.community_id
        for x in REGISTRY["doc_label_communities"].fn(spark, sf_dir).collect()
    }
    got = {x.community_id: x for x in REGISTRY["graph_coreset_select"].fn(spark, sf_dir).collect()}
    assert set(got) == set(lab.values())
    assert sum(x.community_size for x in got.values()) == len(vecs)
    for c, row in got.items():
        members = [v for v, l in lab.items() if l == c]
        best = max(members, key=lambda v: (r[v], -v))
        assert (row.rep_vec_id, row.rep_rank_micro) == (best, r[best]), c


def test_heavy_hitters_complete_and_candidates_bounded(spark, sf_dir):
    """term_heavy_hitters (B56, r7): brute-force python counts must agree
    exactly (the Misra-Gries candidate pass is provably complete above
    N/k — no heavy hitter can be missed), and the candidate set the
    exact pass counts must stay bounded by partitions x counters."""
    from collections import Counter

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.text_queries import HH_K, MG_COUNTERS

    docs = read_table(spark, sf_dir, "documents").collect()
    cnt = Counter(t for r in docs for t in r.text.split(" "))
    n = sum(cnt.values())
    expect = {t: c for t, c in cnt.items() if c * HH_K > n}
    got = {r.term: r.cnt for r in REGISTRY["term_heavy_hitters"].fn(spark, sf_dir).collect()}
    assert got == expect and len(got) > 0
    # ppm contract
    for r in REGISTRY["term_heavy_hitters"].fn(spark, sf_dir).collect():
        assert r.freq_ppm == int(r.cnt * 1e6 / n + 0.5)

    # adversarial MG kernel unit checks against the REAL (vectorized)
    # kernel: a stream where the heavy item is interleaved with
    # MG_COUNTERS*3 distinct spacers must still retain it
    import pandas as pd

    from vectordb_hr_data_spark.querydefs.text_queries import _mg_candidates

    def run_mg(frame):
        out = frame.mapInPandas(_mg_candidates, schema="term string")
        return {r.term for r in out.collect()}

    stream = []
    for i in range(MG_COUNTERS * 3):
        stream.append("HEAVY")
        stream.append(f"spacer_{i}")
    df = spark.createDataFrame([(t,) for t in stream], "term string").repartition(1)
    assert "HEAVY" in run_mg(df)

    # cross-batch adversary for the batched (weighted-merge) reduction:
    # the heavy item's mass arrives one occurrence per Arrow batch while
    # each batch brings a fresh wave of distinct spacers — retention must
    # come from the merge arithmetic, not from within-batch value_counts
    pure = pd.DataFrame  # build batches directly; drive the kernel as a plain generator
    waves = [
        pure({"term": ["HEAVY"] * 2 + [f"w{b}_{i}" for i in range(MG_COUNTERS)]})
        for b in range(5)
    ]
    out = list(_mg_candidates(iter(waves)))
    kept = set(out[0]["term"]) if out else set()
    assert "HEAVY" in kept
    assert len(kept) <= MG_COUNTERS  # bounded summary, never the vocabulary


def test_frame_sample_features_match_decoder_identity(spark, sf_dir):
    """multimodal_frame_sample (B57, r7): tie the oracle-checked frame
    rows back to the Arrow decoder output — for every sampled frame,
    sample_frames' float32 feature must equal the stub decoder applied to
    payload || ts_be32 in python; frame counts follow the stride rule."""
    import hashlib

    import numpy as np

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.similarity_queries import FRAME_STRIDE_MS
    from vectordb_hr_data_spark.sources.multimodal import sample_frames

    d = read_table(spark, sf_dir, "documents").limit(60)
    media = d.selectExpr(
        "doc_id AS media_id",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality",
        "cast(text as binary) AS payload",
        "'app/octet' AS mime",
        "cast(null as int) AS width",
        "cast(null as int) AS height",
        "CASE WHEN doc_id % 3 = 2 THEN cast(n_chars * 40 as int) ELSE cast(null as int) END AS duration_ms",
    )
    texts = {r.doc_id: (r.text, r.n_chars) for r in d.collect()}
    frames = sample_frames(media, stride_ms=FRAME_STRIDE_MS, fake_decode=True).collect()
    by_media = {}
    for fr in frames:
        by_media.setdefault(fr.media_id, []).append(fr)
    for mid, frs in by_media.items():
        text, n_chars = texts[mid]
        if mid % 3 == 2:
            expect_n = (n_chars * 40) // FRAME_STRIDE_MS + 1
        else:
            expect_n = 1
        assert len(frs) == expect_n, mid
        for fr in sorted(frs, key=lambda r: r.frame_idx):
            payload = text.encode() + int(fr.frame_ts_ms).to_bytes(4, "big")
            digest = hashlib.sha256(payload).digest()
            expect = np.asarray([b / 127.5 - 1.0 for b in digest[:16]], dtype=np.float32)
            got = np.asarray(fr.frame_feature, dtype=np.float32)
            assert np.array_equal(got, expect), (mid, fr.frame_idx)

    # registry query coverage: one key per (media, frame), video fan-out real
    rows = REGISTRY["multimodal_frame_sample"].fn(spark, sf_dir).collect()
    keys = {(r.media_id, r.frame_idx) for r in rows}
    assert len(keys) == len(rows)
    assert any(r.frame_idx > 0 for r in rows)  # some video exploded


def test_fuzzy_pairs_funnel_cohort_match_bruteforce(spark, sf_dir):
    """B58/B59/B60 (r7): python brute-force replays — the fuzzy pair set
    over distinct part names (same-block Levenshtein), the strict funnel
    counts on first occurrences, and the cohort retention matrix must all
    match exactly."""
    from collections import Counter, defaultdict

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.querydefs.relational_queries import FUZZY_MAX_DIST

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    parts = read_table(spark, sf_dir, "part").select("p_partkey", "p_name").collect()
    names = Counter(r.p_name for r in parts)
    canon = {}
    for r in parts:
        canon[r.p_name] = min(canon.get(r.p_name, r.p_partkey), r.p_partkey)
    expect_pairs = set()
    for a in names:
        for b in names:
            if a < b and a.split(" ")[-1] == b.split(" ")[-1] and lev(a, b) <= FUZZY_MAX_DIST:
                expect_pairs.add((a, b))
    got_rows = REGISTRY["part_name_fuzzy_pairs"].fn(spark, sf_dir).collect()
    assert {(r.name_1, r.name_2) for r in got_rows} == expect_pairs and expect_pairs
    for r in got_rows:
        assert r.edit_dist == lev(r.name_1, r.name_2)
        assert (r.n_parts_1, r.canonical_1) == (names[r.name_1], canon[r.name_1])

    ev = read_table(spark, sf_dir, "events").collect()
    first = defaultdict(dict)
    for e in ev:
        cur = first[e.user_id].get(e.event_type)
        if cur is None or e.ts < cur:
            first[e.user_id][e.event_type] = e.ts
    s1 = {u for u, f in first.items() if "view" in f}
    s2 = {u for u in s1 if "click" in first[u] and first[u]["click"] > first[u]["view"]}
    s3 = {u for u in s2 if "purchase" in first[u] and first[u]["purchase"] > first[u]["click"]}
    fr = {r.stage: r for r in REGISTRY["events_funnel_strict"].fn(spark, sf_dir).collect()}
    assert (fr[1].n_users, fr[2].n_users, fr[3].n_users) == (len(s1), len(s2), len(s3))
    assert 0 < fr[3].n_users < fr[1].n_users  # the funnel narrows for real

    cohort = {u: min(t for t in (e.ts for e in ev if e.user_id == u)).date() for u in first}
    cells = defaultdict(set)
    for e in ev:
        cells[(str(cohort[e.user_id]), (e.ts.date() - cohort[e.user_id]).days)].add(e.user_id)
    got = {
        (r.cohort_day, r.days_since): r.n_active_users
        for r in REGISTRY["events_cohort_retention"].fn(spark, sf_dir).collect()
    }
    assert got == {k: len(v) for k, v in cells.items()}


def test_asof_attribution_matches_bruteforce(spark, sf_dir):
    """B66: python replay of the independent quadratic semantic — for
    every purchase, the prior view/click with max (ts, event_id) at or
    before it — must match the union-tag window route row for row,
    including the exact microsecond gap and NULLs for no-prior
    purchases."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.queries import REGISTRY

    ev = read_table(spark, sf_dir, "events").collect()
    eng = sorted(
        [(r.ts, r.event_id, r.event_type) for r in ev if r.event_type in ("view", "click")]
    )
    by_user: dict[int, list] = {}
    for r in ev:
        if r.event_type in ("view", "click"):
            by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    got = {r.event_id: r for r in REGISTRY["events_asof_attribution"].fn(spark, sf_dir).collect()}
    purchases = [r for r in ev if r.event_type == "purchase"]
    assert len(got) == len(purchases)
    for p in purchases:
        pri = [t for t in by_user.get(p.user_id, []) if t[0] <= p.ts]
        g = got[p.event_id]
        if not pri:
            assert g.prior_event_id is None and g.gap_us is None
            continue
        ts, eid, typ = max(pri)
        assert g.prior_event_id == eid and g.prior_event_type == typ
        us = int((p.ts - ts).total_seconds() * 1_000_000)
        # avoid float us drift: recompute exactly from the timedelta parts
        td = p.ts - ts
        us = (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
        assert g.gap_us == us
