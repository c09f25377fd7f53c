"""Round-9 operators: invariants beyond the DuckDB oracle — plan shapes
(zero-shuffle retrieval forms), sampling bias direction, distribution
properties the hash compare can't express."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_conjunctive_search_plan_is_zero_shuffle(spark, sf_dir):
    """B74: boolean AND retrieval must stay one map pass +
    TakeOrderedAndProject — no Exchange, no postings join."""
    from vectordb_hr_data_spark.querydefs.text_queries import doc_conjunctive_search

    plan = doc_conjunctive_search(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_weighted_reservoir_plan_and_bias(spark, sf_dir):
    """B76: A-ES selection is zero-Exchange TakeOrdered over a pruned
    (doc_id, n_chars) scan, and the weight actually biases the sample —
    the selected docs' mean n_chars exceeds the corpus mean."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        doc_weighted_reservoir_sample,
    )

    res = doc_weighted_reservoir_sample(spark, sf_dir)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "text" not in plan.split("ReadSchema:")[1][:200]  # column pruning holds
    sample_mean = res.agg(F.avg("n_chars")).first()[0]
    corpus_mean = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sample_mean > corpus_mean  # weighted by n_chars -> long docs over-drawn


def test_markov_transition_rows_and_mass(spark, sf_dir):
    """B71: full V x V grid; each from_type's smoothed probabilities sum
    to ~1e6 ppm (integer-div floor loses < V ppm per row)."""
    from vectordb_hr_data_spark.querydefs.event_queries import events_markov_transitions

    rows = events_markov_transitions(spark, sf_dir).collect()
    types = {r.from_type for r in rows} | {r.to_type for r in rows}
    v = len(types)
    assert len(rows) == v * v
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r.prob_ppm)
    for ft, ps in by_from.items():
        assert len(ps) == v
        assert 1_000_000 - v <= sum(ps) <= 1_000_000, (ft, sum(ps))


def test_hourly_burst_rows_exceed_user_mean(spark, sf_dir):
    """B73: every flagged bucket's count strictly exceeds that user's own
    mean hourly count (z >= 2 implies above mean since sd >= 0)."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_hourly_burst

    bursts = events_hourly_burst(spark, sf_dir)
    assert bursts.count() > 0
    ev = read_table(spark, sf_dir, "events")
    b = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour_ts")).agg(
        F.count("*").alias("c")
    )
    umean = b.groupBy("user_id").agg(F.avg("c").alias("m"))
    viol = (
        bursts.join(umean, "user_id")
        .filter(F.col("n_events") * 1.0 <= F.col("m"))
        .count()
    )
    assert viol == 0


def test_kl_quality_nonnegative_and_discriminative(spark, sf_dir):
    """B75: KL(P_doc || P_corpus) >= 0 up to integer-quantization noise,
    with genuine spread across the corpus (it discriminates)."""
    from vectordb_hr_data_spark.querydefs.text_queries import doc_unigram_kl_quality

    rows = doc_unigram_kl_quality(spark, sf_dir).collect()
    assert len(rows) > 0
    kls = [r.kl_micro for r in rows]
    assert min(kls) >= -1000  # Gibbs' inequality, quantized at micro-nats
    assert max(kls) > min(kls)


def test_rake_phrases_respect_cap_and_stopwords(spark, sf_dir):
    """B79: no phrase contains a stopword or exceeds the word cap; the
    reported n_words matches the phrase string."""
    from vectordb_hr_data_spark.querydefs.text_queries import (
        RAKE_MAX_WORDS,
        RAKE_STOPWORDS,
        doc_rake_keyphrases,
    )

    rows = doc_rake_keyphrases(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= RAKE_MAX_WORDS
        assert len(words) == r.n_words
        assert not (set(words) & set(RAKE_STOPWORDS))
        assert r.n_occurrences >= 1


def test_collocations_pmi_beats_independence(spark, sf_dir):
    """B84: every reported collocation has support >= the floor, and the
    top collocation's observed bigram count exceeds the independence
    expectation (positive PMI) or the corpus genuinely lacks one (then
    the op still returns the least-negative — assert ordering instead)."""
    from vectordb_hr_data_spark.querydefs.text_queries import (
        PMI_MIN_SUPPORT,
        doc_collocations_pmi,
    )

    rows = doc_collocations_pmi(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.c12 >= PMI_MIN_SUPPORT for r in rows)
    pmis = [r.pmi_micro for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_more_like_this_excludes_query_and_ranks_by_jaccard(spark, sf_dir):
    """B85: the query doc never appears, jaccard is in (0, 1e4], and the
    ranking is non-increasing with doc_id tie-breaks."""
    from vectordb_hr_data_spark.querydefs.text_queries import (
        MLT_QUERY_DOC,
        doc_more_like_this,
    )

    rows = doc_more_like_this(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.doc_id != MLT_QUERY_DOC for r in rows)
    assert all(0 < r.jaccard_e4 <= 10_000 for r in rows)
    js = [(r.jaccard_e4, -r.doc_id) for r in rows]
    assert js == sorted(js, key=lambda x: (-x[0], -x[1]))


def test_equidepth_bins_are_equal_population_and_ordered(spark, sf_dir):
    """B86: bin populations differ by at most 1, bounds are disjoint and
    ascending, and the total count equals the corpus."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        DEPTH_BINS,
        doc_equidepth_bins,
    )

    rows = doc_equidepth_bins(spark, sf_dir).collect()
    assert len(rows) == DEPTH_BINS
    counts = [r.n_docs for r in rows]
    assert max(counts) - min(counts) <= 1
    n = read_table(spark, sf_dir, "documents").count()
    assert sum(counts) == n
    for a, b in zip(rows, rows[1:]):
        assert a.hi_chars <= b.lo_chars
        assert a.lo_chars <= a.mean_chars <= a.hi_chars


def test_sequence_trigrams_consistent_with_markov_bigrams(spark, sf_dir):
    """B87: a trigram's count can never exceed the count of either of its
    constituent bigram transitions (subsequence monotonicity)."""
    from vectordb_hr_data_spark.querydefs.event_queries import (
        events_markov_transitions,
        events_sequence_trigrams,
    )

    tri = events_sequence_trigrams(spark, sf_dir).collect()
    assert len(tri) > 0
    bi = {
        (r.from_type, r.to_type): r.n_trans
        for r in events_markov_transitions(spark, sf_dir).collect()
    }
    for r in tri:
        assert r.n_occ <= bi[(r.t1, r.t2)]
        assert r.n_occ <= bi[(r.t2, r.t3)]


def test_indegree_profile_conserves_nodes_and_edges(spark, sf_dir):
    """B83: node counts sum to the corpus; sum(degree * nodes) equals the
    total directed edge count N * deg."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs import similarity_queries as S

    rows = S.graph_indegree_profile(spark, sf_dir).collect()
    n = read_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_nodes for r in rows) == n
    assert sum(r.indeg * r.n_nodes for r in rows) == n * S.PAGERANK_DEG


def test_label_separation_invariants(spark, sf_dir):
    """B88: one row per label; nearest-other label is never itself;
    inter_min is symmetric-consistent (d(a,b) appears as d(b,a) too when
    b's nearest is a)."""
    from vectordb_hr_data_spark.querydefs.vector_queries import (
        embedding_label_separation,
    )

    rows = embedding_label_separation(spark, sf_dir).collect()
    labels = {r.label for r in rows}
    assert len(rows) == len(labels) > 1
    for r in rows:
        assert r.nn_label != r.label and r.nn_label in labels
        assert r.intra_mean > 0 and r.inter_min > 0 and r.n_members > 0


def test_drift_split_halves_cover_corpus(spark, sf_dir):
    """B89: 64 dims reported; on a homogeneous synthetic corpus the two
    seeded halves should differ by far less than the signal scale."""
    from vectordb_hr_data_spark.querydefs.vector_queries import embedding_drift_split

    rows = embedding_drift_split(spark, sf_dir).collect()
    assert len(rows) == 64
    assert [r.dim for r in rows] == list(range(64))
    # same-distribution halves: drift well under the element scale (1e6 micro = 1.0)
    assert max(r.drift_micro for r in rows) < 200_000


def test_multitouch_linear_credit_conserves_purchases(spark, sf_dir):
    """B90: linear credit sums to ~1e6 ppm per attributed purchase (the
    integer div loses < k ppm per purchase), so total linear credit is
    within ppm-rounding of n_attributed_purchases * 1e6."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import (
        ATTR_WINDOW_DAYS,
        events_multitouch_attribution,
    )

    rows = events_multitouch_attribution(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == {"view", "click"}
    total_linear = sum(r.linear_credit_ppm for r in rows)
    total_touches = sum(r.n_touches for r in rows)
    # count attributed purchases independently (quadratic is fine at test scale)
    ev = read_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", F.col("ts").alias("pts"))
    e = ev.filter(F.col("event_type").isin("view", "click")).select("user_id", F.col("ts").alias("ets"))
    n_attr = (
        p.join(e, "user_id")
        .filter(
            (F.col("ets") <= F.col("pts"))
            & (F.unix_micros("pts") - F.unix_micros("ets") < ATTR_WINDOW_DAYS * 86_400_000_000)
        )
        .select("event_id")
        .distinct()
        .count()
    )
    assert n_attr * 1_000_000 - total_touches <= total_linear <= n_attr * 1_000_000


def test_sketch_fidelity_mass_concentrates_near_zero_error(spark, sf_dir):
    """B93: the MinHash estimator is unbiased with sd ~ sqrt(J(1-J)/16)
    <= 0.125, so most candidate-pair error mass sits in the first few 5%
    buckets; also the bucket arithmetic is internally consistent."""
    from vectordb_hr_data_spark.querydefs.dedup_queries import neardup_sketch_fidelity

    rows = neardup_sketch_fidelity(spark, sf_dir).collect()
    assert len(rows) > 0
    total = sum(r.n_pairs for r in rows)
    near = sum(r.n_pairs for r in rows if r.err_bucket <= 3)  # |err| < 20%
    assert near / total >= 0.8, (near, total)
    for r in rows:
        assert 0 <= r.mean_est_e4 <= 10_000 and 0 <= r.mean_exact_e4 <= 10_000


def test_source_duplication_matrix_full_grid(spark, sf_dir):
    """B94: every source pair appears exactly once (s1 < s2) and overlap
    never exceeds the smaller side."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.dedup_queries import source_duplication_matrix

    rows = source_duplication_matrix(spark, sf_dir).collect()
    sources = {
        r.source
        for r in read_table(spark, sf_dir, "documents").select("source").distinct().collect()
    }
    n = len(sources)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r.source_1 < r.source_2
        assert 0 <= r.n_shared <= min(r.n1, r.n2)
        assert 0 <= r.overlap_ppm <= 1_000_000


def test_vocab_coverage_curve_monotone_and_bounded(spark, sf_dir):
    """B95: cumulative share is strictly increasing in rank and ends
    below/at 1e6; counts are non-increasing down the head."""
    from vectordb_hr_data_spark.querydefs.text_queries import doc_vocab_coverage_curve

    rows = doc_vocab_coverage_curve(spark, sf_dir).collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    shares = [r.cum_share_ppm for r in rows]
    assert shares == sorted(shares) and shares[-1] <= 1_000_000
    counts = [r.c for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_grouped_split_prevents_cluster_straddle(spark, sf_dir):
    """B97: no near-dup cluster straddles splits, every doc is assigned
    exactly once, proportions are hash-80/10/10-ish — and the hazard is
    REAL: the naive doc-hash split (B11) does straddle at least one of
    the same clusters."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.dedup_queries import doc_grouped_split

    rows = doc_grouped_split(spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())  # the guarantee
    from collections import Counter

    c = Counter(r.split for r in rows)
    assert 0.6 < c["train"] / n_docs < 0.95 and c["valid"] > 0 and c["test"] > 0
    # the naive per-DOC hash split straddles a multi-doc cluster
    naive = {
        r.doc_id: r.b
        for r in spark.sql("select 1").sparkSession.createDataFrame(
            [(r.doc_id,) for r in rows], "doc_id long"
        )
        .select(
            "doc_id",
            (
                F.expr(
                    "cast(conv(substring(md5(concat(cast(doc_id as string), ':split')), 1, 8), 16, 10) as bigint)"
                )
                % 100
            ).alias("b"),
        )
        .collect()
    }
    def naive_split(b):
        return "train" if b < 80 else ("valid" if b < 90 else "test")

    cluster_docs = {}
    for r in rows:
        cluster_docs.setdefault(r.cluster_id, []).append(r.doc_id)
    straddled = [
        cid
        for cid, docs in cluster_docs.items()
        if len(docs) > 1 and len({naive_split(naive[d]) for d in docs}) > 1
    ]
    assert straddled, "corpus has no multi-doc cluster split by the naive hash — hazard not demonstrated"


def test_winsorized_mean_between_bounds_and_damps_tail(spark, sf_dir):
    """B98: the winsorized mean sits inside [lo, hi] and never exceeds
    the raw mean's distance to the clipped range."""
    from vectordb_hr_data_spark.querydefs.event_queries import events_value_winsorized

    rows = events_value_winsorized(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.lo_cents <= r.winsorized_mean_cents <= r.hi_cents
        assert r.lo_cents < r.hi_cents


def test_length_gini_bounds(spark, sf_dir):
    """B99: Gini is in [0, 1e6) and positive on a non-degenerate corpus;
    a constant-length frame scores ~0."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import doc_length_gini

    row = doc_length_gini(spark, sf_dir).first()
    assert 0 < row.gini_ppm < 1_000_000
    # degenerate check inline: all-equal lengths -> gini ~ 0
    import pyspark.sql.functions as F

    from vectordb_hr_data_spark.io import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", F.lit(100).alias("n_chars"))
    from pyspark.sql import Window

    w = Window.orderBy("n_chars", "doc_id")
    ranked = d.select("n_chars", F.row_number().over(w).alias("i"))
    g = ranked.agg(
        F.expr(
            "(2 * sum(i * n_chars) - (count(*) + 1) * sum(n_chars)) * 1000000"
            " div (count(*) * sum(n_chars))"
        ).alias("g")
    ).first()[0]
    assert abs(g) <= 2  # integer-div floor noise only


def test_sliding_distinct_users_covers_each_event_twice(spark, sf_dir):
    """B100: every event lands in exactly two 1h/30m windows, all window
    starts sit on the 1800s grid, and distinct users never exceed events."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import (
        events_sliding_distinct_users,
    )

    rows = events_sliding_distinct_users(spark, sf_dir).collect()
    n_events = read_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == 2 * n_events
    assert all(r.win_start_epoch % 1800 == 0 for r in rows)
    assert all(0 < r.n_users <= r.n_events for r in rows)


def test_cuped_total_adjustment_is_mean_preserving(spark, sf_dir):
    """B101: theta is pooled (identical across arms) and the adjustment
    is mean-preserving over the POOLED population — sum_users
    theta*(x - xbar) is bounded by the xbar floor residue (n users *
    <1 cent each * theta), so the user-weighted cuped and raw means agree
    to that tolerance."""
    from vectordb_hr_data_spark.querydefs.event_queries import events_cuped_adjusted

    rows = events_cuped_adjusted(spark, sf_dir).collect()
    assert len(rows) == 2
    assert rows[0].theta_milli == rows[1].theta_milli
    n = sum(r.n_users for r in rows)
    pooled_raw = sum(r.raw_mean_milli * r.n_users for r in rows)
    pooled_cuped = sum(r.cuped_mean_milli * r.n_users for r in rows)
    tol = abs(rows[0].theta_milli) * n + 2 * n  # xbar floor + div floors
    assert abs(pooled_raw - pooled_cuped) <= tol


def test_curriculum_order_stages_monotone_and_interleaved(spark, sf_dir):
    """B102: curriculum ranks are contiguous from 1, stages never decrease
    along the rank order, and within each stage every participating source
    appears before any source repeats."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        source_curriculum_order,
    )

    rows = source_curriculum_order(spark, sf_dir).collect()
    assert [r.curriculum_rank for r in rows] == list(range(1, len(rows) + 1))
    stages = [r.stage for r in rows]
    assert stages == sorted(stages)
    by_stage: dict = {}
    for r in rows:
        by_stage.setdefault(r.stage, []).append(r.source)
    for stage, srcs in by_stage.items():
        uniq = set(srcs)
        if len(srcs) >= len(uniq):  # stage fully started in the window
            head = srcs[: len(uniq)]
            assert len(set(head)) == len(uniq), f"stage {stage} not interleaved"


def test_zipf_slope_negative_and_bounded(spark, sf_dir):
    """B103: a word corpus has a strictly negative, finite Zipf slope."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import doc_zipf_slope

    row = doc_zipf_slope(spark, sf_dir).first()
    assert row.n_head_terms <= 100
    assert -5_000_000 < row.zipf_slope_micro < 0


def test_ann_recall_eval_bounds_and_floor(spark, sf_dir):
    """B104: per-query hits are within [0, 10], recall_milli is the exact
    integer ratio, and the 4/16-probe IVF keeps recall@10 >= 0.5 on this
    corpus (the gate the harness exists to enforce)."""
    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        EVAL_K,
        ann_recall_eval,
    )

    rows = ann_recall_eval(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r.n_hits <= EVAL_K
        assert r.recall_milli == r.n_hits * 1000 // EVAL_K
        assert r.recall_milli >= 500
    assert sum(r.n_hits for r in rows) / (8 * EVAL_K) >= 0.8


def test_ndcg_bounded_and_dcg_le_idcg(spark, sf_dir):
    """B105: DCG never exceeds the ideal reordering's DCG and the
    normalized score stays in [0, 1000]."""
    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        eval_retrieval_ndcg,
    )

    rows = eval_retrieval_ndcg(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.dcg_micro <= r.idcg_micro
        assert 0 <= r.ndcg_milli <= 1000


def test_method_agreement_matrix_invariants(spark, sf_dir):
    """B107: full 3x3 upper triangle, diagonal pair-set Jaccard is
    exactly 1e6, and intersections never exceed either side."""
    from vectordb_hr_data_spark.querydefs.dedup_queries import neardup_method_agreement

    rows = neardup_method_agreement(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert 0 <= r.n_common <= min(r.n_pairs_1, r.n_pairs_2)
        if r.method_1 == r.method_2:
            assert r.n_common == r.n_pairs_1
            assert r.pairset_jaccard_ppm == 1_000_000 or r.n_pairs_1 == 0


def test_seasonal_anomaly_gate_is_sound(spark, sf_dir):
    """B108: every flagged row actually violates the 3-MAD gate (with
    the one-count floor) and the side label matches the deviation
    direction."""
    from vectordb_hr_data_spark.querydefs.event_queries import events_seasonal_anomaly

    # the fixture SF (sf0.001) is too sparse for the gate to fire — run
    # the content checks where the report is non-empty
    rows = events_seasonal_anomaly(spark, "/root/testdata/sf0.01").collect()
    assert rows, "gate never fired at sf0.01 — baseline or gate broken"
    for r in rows:
        dev2 = abs(2 * r.n_events - r.med2)
        assert 2 * dev2 > 3 * max(r.mad4, 4)
        assert r.side == ("high" if 2 * r.n_events > r.med2 else "low")


def test_curriculum_budget_schedule_invariants(spark, sf_dir):
    """B109: contiguous schedule ranks, monotone stages, every kept doc
    fits its (source, stage) token budget, and within a cell cum_tokens
    is a prefix (strictly increasing in rank order)."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        CURRICULUM_STAGE_BUDGET,
        curriculum_token_budget,
    )

    rows = curriculum_token_budget(spark, sf_dir).collect()
    assert [r.schedule_rank for r in rows] == list(range(1, len(rows) + 1))
    stages = [r.stage for r in rows]
    assert stages == sorted(stages)
    cells: dict = {}
    for r in rows:
        assert r.cum_tokens <= CURRICULUM_STAGE_BUDGET
        cells.setdefault((r.stage, r.source), []).append(r.cum_tokens)
    for cums in cells.values():
        assert cums == sorted(cums)  # interleave preserves per-cell draw order


def test_jl_projection_recall_floor(spark, sf_dir):
    """B111: the JL page recall is usable — the reranked top-10 overlaps
    the exact top-10 well above the ~2% chance rate (measured 6/10 at
    sf0.001, 8/10 at sf0.01 — uniform vectors are the JL worst case per
    the B47 geometry note; the floor pins 'well above chance', not the
    measured values), and rerank distances are the true full-dim
    distances (monotone non-decreasing in rank)."""
    from vectordb_hr_data_spark.querydefs.vector_queries import knn_jl_projection_rerank

    rows = knn_jl_projection_rerank(spark, sf_dir).collect()
    assert len(rows) == 10
    dists = [r.distance for r in rows]
    assert dists == sorted(dists)
    from vectordb_hr_data_spark.operators.knn import knn_topk

    # exact top-10 for the same query
    from vectordb_hr_data_spark.io import read_table
    import pyspark.sql.functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    from vectordb_hr_data_spark.functions import vector as V

    exact = (
        emb.select("vec_id", F.round(V.l2sq(F.col("embedding"), F.lit([float(x) for x in q])), 4).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    )
    overlap = {r.vec_id for r in rows} & {r.vec_id for r in exact}
    assert len(overlap) >= 4  # chance on this corpus would be ~0-1 of 10


def test_countmin_never_undercounts(spark, sf_dir):
    """B112: CMS estimates dominate exact counts and the audit covers
    the full probe head."""
    from vectordb_hr_data_spark.querydefs.text_queries import (
        CMS_PROBE_TOPN,
        term_countmin_audit,
    )

    rows = term_countmin_audit(spark, sf_dir).collect()
    assert len(rows) == CMS_PROBE_TOPN
    for r in rows:
        assert r.cms_cnt >= r.exact_cnt
        assert r.over_ppm >= 0


def test_rfm_scores_are_quintiles(spark, sf_dir):
    """B113: scores are 1-5, balanced to within one user per bucket, and
    higher m_score users have higher monetary totals on average."""
    from collections import Counter

    from vectordb_hr_data_spark.querydefs.event_queries import events_user_rfm

    rows = events_user_rfm(spark, sf_dir).collect()
    assert rows
    for col in ("r_score", "f_score", "m_score"):
        c = Counter(getattr(r, col) for r in rows)
        assert set(c) <= {1, 2, 3, 4, 5}
        assert max(c.values()) - min(c.values()) <= 1
    lo = [r.m_cents for r in rows if r.m_score == 1]
    hi = [r.m_cents for r in rows if r.m_score == 5]
    assert max(lo) <= min(hi)


def test_label_window_is_leakage_safe(spark, sf_dir):
    """B114: labels replayed in python from the raw events — strict
    (t, t+3d] window, anchors never labeled by concurrent or past
    purchases; at least one positive and one negative exist."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import (
        LABEL_WINDOW_US,
        events_label_window,
    )

    rows = events_label_window(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").collect()
    purch: dict = {}
    anchors = {}
    for e in ev:
        us = int(e.ts.timestamp() * 1_000_000)
        if e.event_type == "purchase":
            purch.setdefault(e.user_id, []).append(us)
        elif e.event_type == "view":
            anchors[e.event_id] = (e.user_id, us)
    got = {r.event_id: (r.n_purchases_3d, r.label) for r in rows}
    assert set(got) == set(anchors)
    labels = set()
    for eid, (uid, t) in anchors.items():
        n = sum(1 for p in purch.get(uid, []) if t < p <= t + LABEL_WINDOW_US)
        assert got[eid] == (n, n > 0), eid
        labels.add(n > 0)
    assert labels == {True, False}


def test_variance_curve_monotone_and_complete(spark, sf_dir):
    """B115: one row per dim, variances sorted non-increasing, cumulative
    share monotone to exactly 1e6 at the last rank."""
    from vectordb_hr_data_spark.querydefs.vector_queries import embedding_variance_curve

    rows = embedding_variance_curve(spark, sf_dir).collect()
    assert len(rows) == 64
    assert [r.rnk for r in rows] == list(range(1, 65))
    vs = [r.var_milli2 for r in rows]
    assert vs == sorted(vs, reverse=True)
    shares = [r.cum_share_ppm for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 1_000_000


def test_forecast_backtest_units_and_replay(spark, sf_dir):
    """B116: per-type MAEs are non-negative, the winner label matches the
    numbers, and cell counts equal types' (days-1)*24 densified series."""
    import pyspark.sql.functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_forecast_backtest

    rows = events_forecast_backtest(spark, sf_dir).collect()
    assert rows
    ev = read_table(spark, sf_dir, "events")
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    for r in rows:
        assert r.n_cells == (n_days - 1) * 24
        assert r.mae2_naive_milli >= 0 and r.mae2_seasonal_milli >= 0
        if r.mae2_naive_milli < r.mae2_seasonal_milli:
            assert r.winner == "naive"
        elif r.mae2_naive_milli > r.mae2_seasonal_milli:
            assert r.winner in ("seasonal", "tie")  # milli rounding can mask a tiny gap


def test_bootstrap_ci_brackets_exact_median(spark, sf_dir):
    """B117: lo <= point <= hi, and the CI covers the exact corpus
    median (deterministic resamples — this is a pin, not a flake)."""
    import pyspark.sql.functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.pipeline_queries import doc_length_median_ci

    r = doc_length_median_ci(spark, sf_dir).first()
    assert r.n_resamples == 32
    assert r.ci_lo <= r.point_median <= r.ci_hi
    exact = (
        read_table(spark, sf_dir, "documents")
        .agg(F.expr("percentile(n_chars, 0.5)").alias("m"))
        .first()
        .m
    )
    assert r.ci_lo <= exact <= r.ci_hi


def test_survival_km_python_replay(spark, sf_dir):
    """B118: full product-limit replay from raw events — durations,
    at-risk counts, event counts, and the quantized survival curve all
    match; the curve is non-increasing from <= 1e6."""
    import math

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_survival_km

    rows = events_survival_km(spark, sf_dir).collect()
    assert rows
    ev = read_table(spark, sf_dir, "events").collect()
    us = lambda t: int(t.timestamp() * 1_000_000)  # noqa: E731
    t1 = max(us(e.ts) for e in ev)
    t0 = {}
    for e in ev:
        if e.event_type == "signup":
            t0[e.user_id] = min(t0.get(e.user_id, us(e.ts)), us(e.ts))
    tp = {}
    for e in ev:
        if e.event_type == "purchase" and e.user_id in t0 and us(e.ts) > t0[e.user_id]:
            tp[e.user_id] = min(tp.get(e.user_id, us(e.ts)), us(e.ts))
    durs = [
        ((tp[u] - t) // 86_400_000_000, True) if u in tp else ((t1 - t) // 86_400_000_000, False)
        for u, t in t0.items()
    ]
    total = len(durs)
    byday: dict = {}
    for d, is_ev in durs:
        leaving, events = byday.get(d, (0, 0))
        byday[d] = (leaving + 1, events + int(is_ev))
    cum_ln = 0
    left_before = 0
    expect = []
    for d in sorted(byday):
        leaving, events = byday[d]
        at_risk = total - left_before
        left_before += leaving
        if events == 0:
            continue
        if events >= at_risk:
            cum_ln += -30_000_000
        else:
            cum_ln += math.floor(math.log((at_risk - events) / at_risk) * 1_000_000 + 0.5)
        expect.append((d, at_risk, events, math.floor(math.exp(cum_ln / 1_000_000.0) * 1_000_000 + 0.5)))
    got = [(r.day, r.n_at_risk, r.n_events, r.s_ppm) for r in rows]
    assert got == expect
    s = [r.s_ppm for r in rows]
    assert s == sorted(s, reverse=True) and s[0] <= 1_000_000


def test_langid_confusion_shares_sum_per_row(spark, sf_dir):
    """B119: each true-lang row's shares sum to ~1e6 (integer-div floor
    deficit < number of cells) and cell counts replay from doc_lang_id."""
    from collections import Counter

    from vectordb_hr_data_spark.querydefs.text_queries import (
        doc_lang_id,
        doc_langid_confusion,
    )

    rows = doc_langid_confusion(spark, sf_dir).collect()
    per_true: dict = {}
    for r in rows:
        per_true.setdefault(r.true_lang, []).append(r)
    for cells in per_true.values():
        s = sum(c.row_share_ppm for c in cells)
        assert 1_000_000 - len(cells) < s <= 1_000_000
    want = Counter(
        (r.lang, r.predicted_lang) for r in doc_lang_id(spark, sf_dir).collect()
    )
    got = {(r.true_lang, r.predicted_lang): r.n_docs for r in rows}
    assert got == dict(want)


def test_k_anonymity_flags_and_totals(spark, sf_dir):
    """B120: class sizes sum to the corpus, flags match k, deciles 1-10."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.scrub_queries import (
        K_ANON,
        doc_k_anonymity_audit,
    )

    rows = doc_k_anonymity_audit(spark, sf_dir).collect()
    n = read_table(spark, sf_dir, "documents").count()
    assert sum(r.class_size for r in rows) == n
    for r in rows:
        assert r.below_k == (r.class_size < K_ANON)
        assert 1 <= r.len_decile <= 10


def test_dp_noise_bounded_and_unbiased_shape(spark, sf_dir):
    """B121: |noise| is finite and within the eps=1 Laplace 2^-20-grid
    bound (|noise| <= ln(2^20)*1000 ~ 13,863 milli), and noisy counts
    reconstruct exactly."""
    from vectordb_hr_data_spark.querydefs.scrub_queries import events_dp_noisy_counts

    rows = events_dp_noisy_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.noise_milli) <= 14_000
        assert r.noisy_count_milli == r.true_count * 1000 + r.noise_milli


def test_pit_join_never_self_matches_and_replays(spark, sf_dir):
    """B122: python replay of the ts-1us PIT probe — per-purchase prior
    state from the raw event stream; purchase totals conserve."""
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_scd2_pit_join

    rows = events_scd2_pit_join(spark, sf_dir).collect()
    ev = sorted(
        read_table(spark, sf_dir, "events").collect(),
        key=lambda e: (e.user_id, e.ts, e.event_id),
    )
    by_user: dict = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    want: dict = {}
    total_cents = 0
    for u, es in by_user.items():
        for i, e in enumerate(es):
            if e.event_type != "purchase" or e.value is None:
                continue
            # prior state = the run covering ts-1us: the previous event's
            # run, i.e. the last event strictly before this one
            prior = es[i - 1].event_type if i > 0 else "none"
            cents = round(e.value * 100)
            n, c = want.get(prior, (0, 0))
            want[prior] = (n + 1, c + cents)
            total_cents += cents
    got = {r.prior_state: (r.n_purchases, r.total_cents) for r in rows}
    assert got == want
    assert sum(c for _n, c in got.values()) == total_cents


def test_new_op_plan_hygiene(spark, sf_dir):
    """Batch plan audit for the late-r9 ops: zipf's head is
    TakeOrderedAndProject with a text-only pruned scan; RFM pushes the
    purchase/value filters into the scan."""
    from vectordb_hr_data_spark.querydefs.event_queries import events_user_rfm
    from vectordb_hr_data_spark.querydefs.pipeline_queries import doc_zipf_slope

    p1 = doc_zipf_slope(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p1
    sched = p1.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in sched and "n_chars" not in sched  # column pruning holds
    # r15 discipline (VERDICT r14 item 5): the r14 all-lazy rfm EXECUTED
    # plan re-scanned events 20x (AQE did not collapse the differently-
    # pruned scans), so the |users|-bounded aggregate is now eagerly
    # localCheckpointed and the three ntile branches root at it. Assert:
    # the checkpoint-PRODUCING plan pushes the purchase/value filters into
    # its events scan, and the returned scoring plan contains NO events
    # file scan at all (it reads the checkpoint), no scratch spill, and no
    # InMemoryTableScan (checkpoints are not lingering caches).
    from vectordb_hr_data_spark.querydefs.event_queries import rfm_user_features

    p0 = rfm_user_features(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(event_type,purchase)" in p0 and "IsNotNull(value)" in p0
    rfm = events_user_rfm(spark, sf_dir)
    p2 = rfm._jdf.queryExecution().executedPlan().toString()
    assert "scratch-" not in p2, "rfm regained a scratch spill"
    assert "events.parquet" not in p2, "scoring plan re-scans events"
    assert "InMemoryTableScan" not in p2, "rfm left a cached frame in its plan"


def test_sliding_hll_tracks_exact(spark, sf_dir):
    """B124: the HLL path covers the same windows as the exact twin and
    every per-window estimate is within 5x the configured 2% rsd."""
    from vectordb_hr_data_spark.querydefs.event_queries import (
        events_sliding_distinct_hll,
        events_sliding_distinct_users,
    )

    exact = {r.win_start_epoch: r.n_users for r in events_sliding_distinct_users(spark, sf_dir).collect()}
    approx = {r.win_start_epoch: r.n_users_approx for r in events_sliding_distinct_hll(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for w, n in exact.items():
        assert abs(approx[w] - n) <= max(1, 0.10 * n), (w, n, approx[w])


def test_cross_encoder_scorer_seam(spark, sf_dir):
    """B133: a drop-in scorer replaces the IDF stand-in and sees ONLY the
    CE_DEPTH candidates; ranks follow the injected scores exactly."""
    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        CE_DEPTH,
        cross_encoder_rerank,
    )

    def fake_scorer(query, text):
        import pandas as pd

        # deterministic, content-derived: longer docs score higher
        return pd.Series([float(len(t) % 1000) / 1000.0 for t in text])

    df = cross_encoder_rerank(spark, sf_dir, scorer=fake_scorer)
    # the Arrow scorer node sits ABOVE the candidate top-k: model cost is
    # O(CE_DEPTH), never O(corpus) (closures run on workers, so we assert
    # the plan shape rather than counting invocations)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    # deeper nodes print later: the candidate cut (limit=CE_DEPTH) must be
    # a descendant of the Arrow scorer node
    assert plan.find(f"limit={CE_DEPTH}", plan.index("ArrowEvalPython")) > 0, (
        "candidate top-k cut must feed the scorer"
    )
    assert CE_DEPTH == 50  # oracle constant pinned
    out = df.collect()
    assert len(out) == 10
    # ranks are ordered by the injected score, descending
    scores = [r.ce_score_micro for r in out]
    assert scores == sorted(scores, reverse=True)
    assert [r.ce_rank for r in out] == list(range(1, 11))


def test_cross_encoder_default_matches_manual_idf(spark, sf_dir):
    """B133 default path: recompute the IDF overlap in plain python over
    the collected candidates and compare rank-for-rank."""
    import math

    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        QUERY_TEXT,
        cross_encoder_rerank,
    )
    from vectordb_hr_data_spark.io import read_table

    docs = {r.doc_id: r.text for r in read_table(spark, sf_dir, "documents").collect()}
    n = len(docs)
    idf = {}
    for w in QUERY_TEXT.split():
        df = sum(1 for t in docs.values() if w in t.split(" "))
        if df:
            idf[w] = round(math.log(n / df) * 1e6)
    out = cross_encoder_rerank(spark, sf_dir).collect()
    for r in out:
        expect = sum(v for w, v in idf.items() if w in docs[r.doc_id].split(" "))
        assert r.ce_score_micro == expect, (r.doc_id, r.ce_score_micro, expect)


def test_semantic_decontaminate_flags_planted_dup(spark, sf_dir):
    """B134 on a corpus WITH a planted eval paraphrase: a corpus vector
    that is a tiny perturbation of an eval vector must flag, and clean
    random vectors must not."""
    import pyspark.sql.functions as F

    from vectordb_hr_data_spark.querydefs import pipeline_queries as P

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ev0 = emb.filter(F.col("vec_id") == 0).collect()[0].embedding  # eval row (0 % 41 == 0)
    planted = spark.createDataFrame(
        [(90001, [float(x) + 1e-4 for x in ev0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        emb.unionByName(planted).write.parquet(f"{td}/embeddings.parquet")
        out = {r.vec_id: r for r in P.semantic_decontaminate(spark, td).collect()}
    assert out[90001].contaminated == 1
    assert out[90001].nearest_eval_id == 0
    # the planted row aside, the synthetic corpus is clean at 0.95
    others = [r for v, r in out.items() if v != 90001]
    assert all(r.contaminated == 0 for r in others)


def test_late_r9_batch2_plan_hygiene(spark, sf_dir):
    """Plan audit for the continued-session ops: the erasure cascade runs
    broadcast SEMI joins (never inner-materializing purge rows), the
    Benford audit scans only l_extendedprice, the Theil-Sen pair stage is
    a broadcast join over daily aggregates, and the expanded-BM25 hit
    join broadcasts the term list."""
    from vectordb_hr_data_spark.querydefs.event_queries import events_theilsen_trend
    from vectordb_hr_data_spark.querydefs.relational_queries import (
        erasure_cascade_audit,
        lineitem_benford_audit,
    )
    from vectordb_hr_data_spark.querydefs.text_queries import query_expansion_search

    p = erasure_cascade_audit(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p and "BroadcastHashJoin" in p

    p = lineitem_benford_audit(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    sched = [ln for ln in p.splitlines() if "ReadSchema" in ln and "lineitem" in ln]
    assert sched and all("l_extendedprice" in ln and "l_partkey" not in ln for ln in sched)

    p = events_theilsen_trend(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p

    p = query_expansion_search(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p


def test_sq8_reconstruction_error_bounds(spark, sf_dir):
    """B142: SQ8 max squared reconstruction error must respect the coder's
    analytic bound sum_i (span_i/255/2 + eps)^2 — the per-dim half-step."""
    from vectordb_hr_data_spark.querydefs.vector_queries import (
        _sq8_ranges,
        sq8_reconstruction_error,
    )

    lo, hi = _sq8_ranges(spark, sf_dir)
    bound_nano = sum(((h - l) / 255.0 / 2.0) ** 2 for l, h in zip(lo, hi)) * 1e9
    out = sq8_reconstruction_error(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r.mean_sqerr_nano <= r.max_sqerr_nano
        assert r.max_sqerr_nano <= bound_nano * 1.01 + 1, (r.max_sqerr_nano, bound_nano)


def test_ngram_novelty_first_doc_all_novel(spark, sf_dir):
    """B139: the earliest doc that has any trigram is 100% novel by
    construction, and every novelty share sits in [0, 1e6]."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import doc_ngram_novelty

    rows = doc_ngram_novelty(spark, sf_dir).collect()
    assert rows[0].novelty_micro == 1000000
    assert all(0 <= r.novelty_micro <= 1000000 for r in rows)
    assert all(r.n_novel <= r.n_distinct_grams for r in rows)


def test_degenerate_input_guards_no_divide_by_zero(spark, tmp_path):
    """The new ratio ops must degrade (not crash or NaN) on degenerate
    corpora: an events table with no signups exercises the conversion-lag
    share guard, and one with zero week-1 retention exercises the lift
    guard — both engines behave because the div is floored at 1."""
    import pyspark.sql.functions as F

    from vectordb_hr_data_spark.querydefs import event_queries as E

    # no signup events at all -> every user lands in 'never'; shares
    # divide by greatest(total, 1)
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "view", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "deg1")
    ev.write.parquet(f"{d}/events.parquet")
    out = E.events_conversion_lag(spark, d).collect()
    assert sum(r.n_users for r in out) == 0  # nobody signed up
    assert all(r.share_micro == 0 for r in out)

    # single week of data -> week-1 retention is zero for everyone;
    # lift divides by greatest(r0, 1)
    out2 = E.events_retention_drivers(spark, d).collect()
    assert len(out2) == 1 and out2[0].retention_ppm == 0 and out2[0].lift_micro == 0
