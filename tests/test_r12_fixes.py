"""Regression tests for the r12 fixes: the four ADVICE r11 items
(with_exact_rank_range's eager double-execution of the upstream plan, the
non-integer shuffle-partitions conf, the KMV state-format version marker,
the z-order comment drift — the last is prose-only) and the VERDICT r11
registry-size guard (finding #2: the loader's deliberate ImportError
swallow must never silently shrink the checked surface on the driver)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# VERDICT r11 finding #2: the registry loader swallows ImportError for UDF
# workers; on the DRIVER a broken querydef module would silently shrink the
# registry. This pins both the module set and the exact registry size —
# update EXPECTED_REGISTRY_SIZE whenever queries are added.
# ---------------------------------------------------------------------------

EXPECTED_MODULES = {
    "vector_queries",
    "relational_queries",
    "text_queries",
    "dedup_queries",
    "event_queries",
    "hr_queries",
    "similarity_queries",
    "udf_queries",
    "subquery_queries",
    "tpch_more_queries",
    "pipeline_queries",
    "scrub_queries",
    "tokenizer_queries",
}
EXPECTED_REGISTRY_SIZE = 419


def test_registry_all_modules_loaded_and_full_size():
    from vectordb_hr_data_spark import queries as q

    loaded = {m.__name__.rsplit(".", 1)[-1] for m in q._MODULES}
    assert loaded == EXPECTED_MODULES, (
        f"querydef modules silently dropped: {EXPECTED_MODULES - loaded}"
    )
    assert len(q.REGISTRY) == EXPECTED_REGISTRY_SIZE, (
        f"registry holds {len(q.REGISTRY)} queries, expected"
        f" {EXPECTED_REGISTRY_SIZE} — a querydef import broke (the loader"
        " tolerates ImportError for UDF workers) or a query was added"
        " without bumping EXPECTED_REGISTRY_SIZE"
    )
    # every PRIORITY name resolves (the _ordered() invariant, asserted
    # here too so a rename fails THIS test with a readable message)
    missing = [n for n in q.PRIORITY if n not in q.REGISTRY]
    assert not missing, f"PRIORITY names not registered: {missing}"


# ---------------------------------------------------------------------------
# ADVICE r11 #1: the boundary sketch must not re-execute the upstream plan
# — the input is persisted, so sketch + count-branch + rank-branch share
# ONE computation.
# ---------------------------------------------------------------------------


def test_rank_range_sketch_single_upstream_pass(spark):
    from pyspark.sql.functions import pandas_udf

    from vectordb_hr_data_spark.operators.quantiles import with_exact_rank_range

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("long")
    def traced(s):
        acc.add(int(len(s)))
        return s

    n = 500
    base = spark.range(n).select(
        traced(F.col("id")).alias("v"), F.col("id").alias("tid")
    )
    ranked = with_exact_rank_range(base, "v", "tid", "rn", num_parts=8)
    got = {r.tid: r.rn for r in ranked.collect()}
    assert got == {i: i + 1 for i in range(n)}
    # pre-fix this was 3n: the sketch pass, the bucket-count branch, and
    # the rank branch each re-ran the upstream plan
    assert acc.value == n, f"upstream executed {acc.value / n:.1f}x, want 1x"


# ---------------------------------------------------------------------------
# ADVICE r11 #2: a non-integer spark.sql.shuffle.partitions ("auto" under
# some AQE managers) must fall back to defaultParallelism, not raise.
# ---------------------------------------------------------------------------


def test_rank_range_non_integer_shuffle_conf(spark, monkeypatch):
    from vectordb_hr_data_spark.operators.quantiles import with_exact_rank_range

    conf_obj = spark.conf
    assert spark.conf is conf_obj  # the property is cached; patching sticks
    orig_get = conf_obj.get

    def fake_get(key, default=None):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return orig_get(key) if default is None else orig_get(key, default)

    monkeypatch.setattr(conf_obj, "get", fake_get)
    base = spark.range(100).select(F.col("id").alias("v"), F.col("id").alias("tid"))
    ranked = with_exact_rank_range(base, "v", "tid", "rn")
    got = {r.tid: r.rn for r in ranked.collect()}
    assert got == {i: i + 1 for i in range(100)}


# ---------------------------------------------------------------------------
# ADVICE r11 #3: KMV state format version — pre-r11 K-capped states (no
# kmv_ver column) and any stale version must be refused with a named error,
# never silently read as "exact count of K".
# ---------------------------------------------------------------------------


def test_kmv_state_version_guard(spark, tmp_path):
    from vectordb_hr_data_spark.streaming.stream_ops import (
        KMV_STATE_VER,
        kmv_from_state,
    )

    versionless = spark.createDataFrame(
        [("s", [1, 2, 3], 3)], "source string, ks array<bigint>, n_rows long"
    )
    p0 = str(tmp_path / "kmv_versionless")
    versionless.write.parquet(p0)
    with pytest.raises(RuntimeError, match="kmv_ver"):
        kmv_from_state(spark, p0)

    stale = spark.createDataFrame(
        [("s", [1, 2, 3], 3, KMV_STATE_VER - 1)],
        "source string, ks array<bigint>, n_rows long, kmv_ver int",
    )
    p1 = str(tmp_path / "kmv_stale")
    stale.write.parquet(p1)
    with pytest.raises(RuntimeError, match="rebuild"):
        kmv_from_state(spark, p1)

    current = spark.createDataFrame(
        [("s", [10, 20, 30], 3, KMV_STATE_VER)],
        "source string, ks array<bigint>, n_rows long, kmv_ver int",
    )
    p2 = str(tmp_path / "kmv_current")
    current.write.parquet(p2)
    got = {r.source: r.n_distinct_est for r in kmv_from_state(spark, p2).collect()}
    assert got == {"s": 3}  # nd <= K exact branch


# ---------------------------------------------------------------------------
# VERDICT r11 item 4: the multi-cell assignment knob must BUY recall at the
# same nprobe — the priced-mitigation contract for cross-cell edge loss.
# ---------------------------------------------------------------------------


def test_hnsw_multicell_raises_recall_at_same_nprobe(spark, sf_dir):
    """At every shared nprobe grid point the top-2-assigned graph's
    recall@10 must be >= the single-assign graph's, strictly higher at
    nprobe=4 and above 0.90 (measured: 900 -> 1000 milli at sf0.001 and
    sf0.01); the price is a larger candidate set, asserted too so a
    regression that 'wins' recall by accident cannot hide a free lunch."""
    from vectordb_hr_data_spark.querydefs.vector_queries import (
        hnsw_multicell_recall_curve,
        hnsw_nprobe_recall_curve,
    )

    single = {
        r.nprobe: (r.mean_recall_milli, r.mean_candidates)
        for r in hnsw_nprobe_recall_curve(spark, sf_dir).collect()
    }
    multi = {
        r.nprobe: (r.mean_recall_milli, r.mean_candidates)
        for r in hnsw_multicell_recall_curve(spark, sf_dir).collect()
    }
    assert set(single) == set(multi)
    for np_ in single:
        assert multi[np_][0] >= single[np_][0], (np_, single[np_], multi[np_])
        assert multi[np_][1] >= single[np_][1], (np_, single[np_], multi[np_])
    assert multi[4][0] > single[4][0], (single[4], multi[4])
    assert multi[4][0] >= 900, multi[4]


# ---------------------------------------------------------------------------
# B244: zone-map pruning audit — soundness + the layout trade it exists to
# measure.
# ---------------------------------------------------------------------------


def test_zone_map_pruning_sound_and_zorder_wins_user_dim(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.event_queries import events_zone_map_pruning

    rows = {(r.pred_id, r.layout): r for r in events_zone_map_pruning(spark, sf_dir).collect()}
    assert len(rows) == 8  # 4 predicates x 2 layouts
    for (pred, layout), r in rows.items():
        # zone-map pruning is SOUND: a skipped file can hold no matching
        # row, so scanned rows always cover the matches
        assert r.n_rows_scanned >= r.n_rows_matched, (pred, layout)
        assert 0 <= r.n_files_scanned <= r.n_files
    # matched counts are layout-invariant (the layout moves rows, never
    # drops them)
    for pred in {"p1_user_low", "p2_mid_box", "p3_recent", "p4_tight"}:
        assert rows[(pred, "zorder")].n_rows_matched == rows[(pred, "ingest")].n_rows_matched


def test_zone_map_pruning_zorder_wins_user_dim_multi_file(spark):
    # sf0.001 holds a single 1000-row file (nothing prunable); the layout
    # trade needs multiple files, so this runs at sf0.01 (10 files): the
    # audit exists to show ingestion order is ~time order — a pure
    # user-dimension box prunes NOTHING under it while Morton order skips
    # files.
    from vectordb_hr_data_spark.querydefs.event_queries import events_zone_map_pruning

    rows = {
        (r.pred_id, r.layout): r
        for r in events_zone_map_pruning(spark, "/root/testdata/sf0.01").collect()
    }
    assert rows[("p1_user_low", "ingest")].n_files > 1
    assert rows[("p1_user_low", "ingest")].scan_save_ppm == 0
    assert (
        rows[("p1_user_low", "zorder")].scan_save_ppm
        > rows[("p1_user_low", "ingest")].scan_save_ppm
    )


# ---------------------------------------------------------------------------
# B246: span localization — exact answer on hand-built documents with a
# known shared passage.
# ---------------------------------------------------------------------------


def test_span_localization_exact_on_known_overlap(spark):
    from vectordb_hr_data_spark.querydefs.dedup_queries import localize_spans

    # doc 1: w0..w19; doc 2: ten decoys, then w5..w12 verbatim (8 tokens =
    # 6 shingles), then more decoys; plus a SHORTER second shared run
    # (w0 w1 w2 -> 1 shingle) that must lose the tie.
    d1 = " ".join(f"w{i}" for i in range(20))
    d2 = (
        " ".join(f"x{i}" for i in range(10))
        + " "
        + " ".join(f"w{i}" for i in range(5, 13))
        + " y0 y1 w0 w1 w2 z0"
    )
    docs = spark.createDataFrame([(1, d1), (2, d2)], "doc_id: long, text: string")
    pairs = spark.createDataFrame([(1, 2)], "doc_id_1: long, doc_id_2: long")
    row = localize_spans(docs, pairs).collect()[0]
    assert row.run_len_shingles == 6
    assert row.run_len_tokens == 8
    assert row.start_tok_1 == 5  # w5 at position 5 in doc 1
    assert row.start_tok_2 == 10  # after the ten decoys in doc 2
    # a pair with no positional match still reports (total contract)
    lonely = spark.createDataFrame([(1, 3)], "doc_id_1: long, doc_id_2: long")
    docs3 = docs.unionByName(
        spark.createDataFrame([(3, "a b c d e")], "doc_id: long, text: string")
    )
    r3 = localize_spans(docs3, lonely).collect()[0]
    assert (r3.run_len_shingles, r3.run_len_tokens, r3.start_tok_1, r3.start_tok_2) == (
        0, 0, -1, -1,
    )


# ---------------------------------------------------------------------------
# B248: Merkle range diff — the diff set is known arithmetic, not fixture
# luck: a leaf differs iff it contains a dropped (k%1009=0) or digest-
# shifted (k%997=0) key.
# ---------------------------------------------------------------------------


def test_merkle_range_diff_matches_perturbation_arithmetic(spark, sf_dir):
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.relational_queries import (
        _MERKLE_LEAF,
        orders_merkle_range_diff,
    )

    keys = [r.o_orderkey for r in read_table(spark, sf_dir, "orders").select("o_orderkey").collect()]
    expected_leaves = sorted(
        {k // _MERKLE_LEAF for k in keys if k % 1009 == 0 or k % 997 == 0}
    )
    got = orders_merkle_range_diff(spark, sf_dir).collect()
    assert sorted(r.leaf for r in got) == expected_leaves
    for r in got:
        # each differing leaf reports a real divergence, and the ledger
        # proves the walk checked no finer range outside differing parents
        assert (r.n_rows_a, r.sum_digest_a) != (r.n_rows_b, r.sum_digest_b)
        assert r.n_l1_checked <= 16 * r.n_l2_diff


# ---------------------------------------------------------------------------
# B250: conformal novelty — the finite-sample validity guarantee must hold
# on the exchangeable holdout at every alpha.
# ---------------------------------------------------------------------------


def test_conformal_validity_on_holdout(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.text_queries import doc_conformal_novelty_audit

    rows = doc_conformal_novelty_audit(spark, sf_dir).collect()
    assert len(rows) == 6  # 3 alphas x 2 populations
    for r in rows:
        if r.population == "good_holdout":
            # split-conformal theorem: E[flag rate] <= alpha on exchangeable
            # data; finite-sample slack 2/sqrt(n_docs) in ppm
            slack = int(2_000_000 / (r.n_docs ** 0.5))
            assert r.flag_rate_ppm <= r.alpha_ppm + slack, (
                r.alpha_ppm, r.flag_rate_ppm, slack
            )
        assert 0 <= r.n_flagged <= r.n_docs


# ---------------------------------------------------------------------------
# B251: skyline — no result row may dominate another, and every non-result
# doc must be dominated by some result row (checked against the brute
# all-pairs definition on the small fixture).
# ---------------------------------------------------------------------------


def test_pareto_skyline_equals_brute_force_dominance(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.text_queries import doc_pareto_skyline

    sky = {(r.doc_id, r.n_tokens, r.quality_micro) for r in doc_pareto_skyline(spark, sf_dir).collect()}
    assert sky
    # brute-force oracle over all docs (sf0.001: 500 docs)
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.text_queries import _QMICRO_SPARK, _STOPWORDS

    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    pts = [
        (r.doc_id, r.n_tokens, r.q)
        for r in d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
            F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
            .cast("long")
            .alias("n_stop"),
        )
        .select("doc_id", "n_tokens", F.expr(_QMICRO_SPARK).cast("long").alias("q"))
        .collect()
    ]

    def dominated(p, others):
        return any(
            o[1] >= p[1] and o[2] >= p[2] and (o[1] > p[1] or o[2] > p[2]) for o in others
        )

    brute = {p for p in pts if not dominated(p, pts)}
    assert sky == brute


# ---------------------------------------------------------------------------
# B252: priority sampling — exhaustive-sample exactness (n <= k => tau = 0
# => estimate == exact, the DLT boundary case) checked by running the same
# machinery with k far above the corpus size via a filtered twin.
# ---------------------------------------------------------------------------


def test_priority_sample_exact_when_exhaustive(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.event_queries import (
        events_priority_sample_audit,
    )

    # sf0.001 has 1000 events > k=64, so the registered query exercises the
    # sampling branch; the exhaustive branch is pinned by construction:
    # every type with n_sampled == n_events must have est == exact, and in
    # general the estimator never reports a sampled count above the type's
    # population
    rows = events_priority_sample_audit(spark, sf_dir).collect()
    assert rows
    total_sampled = sum(r.n_sampled for r in rows)
    assert total_sampled == 64
    for r in rows:
        assert 0 <= r.n_sampled <= r.n_events
        if r.n_sampled == r.n_events:
            assert r.est_cents == r.exact_cents and r.err_ppm == 0


def test_priority_sample_tau_zero_branch(spark):
    # a 3-row frame with the registered arithmetic and k=64: the sample is
    # exhaustive, tau must be 0 and every estimate exact — guards the
    # boundary the audit's corpus never reaches
    import pyspark.sql.functions as SF

    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 250), (3, "b", 50)],
        "event_id: long, event_type: string, cents: long",
    ).withColumn(
        "u_micro",
        SF.lit(1)
        + SF.expr("cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint)")
        % 1000000,
    )
    q = df.select("event_id", "event_type", "cents", SF.expr("cents * 1000000 div u_micro").alias("prio"))
    topk1 = q.orderBy(SF.col("prio").desc(), "event_id").limit(65)
    tau = topk1.agg(SF.count("*").alias("nk"), SF.min("prio").alias("mp")).select(
        SF.when(SF.col("nk") < 65, SF.lit(0)).otherwise(SF.col("mp")).alias("tau")
    )
    est = (
        topk1.limit(64)
        .crossJoin(tau)
        .groupBy("event_type")
        .agg(SF.sum(SF.greatest(SF.col("cents"), SF.col("tau"))).alias("est"))
    )
    got = {r.event_type: r.est for r in est.collect()}
    assert got == {"a": 350, "b": 50}


# ---------------------------------------------------------------------------
# B253: Shapley attribution — the coalition machinery must match the
# closed form for this v (each conversion splits equally among its touched
# channels), and credit must be conserved.
# ---------------------------------------------------------------------------


def test_shapley_matches_closed_form_and_conserves(spark, sf_dir):
    from fractions import Fraction

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import (
        events_shapley_attribution,
    )

    got = {r.channel: r for r in events_shapley_attribution(spark, sf_dir).collect()}
    assert set(got) == {"click", "error", "signup", "view"}

    # closed form: phi_i = sum over exactly-T conversions of 1/|T| for T ∋ i
    ev = read_table(spark, sf_dir, "events")
    rows = ev.select("user_id", "event_type", "ts").collect()
    first_p = {}
    for r in rows:
        if r.event_type == "purchase":
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                first_p[r.user_id] = r.ts
    masks = {u: set() for u in first_p}
    for r in rows:
        if r.event_type != "purchase" and r.user_id in first_p and r.ts < first_p[r.user_id]:
            masks[r.user_id].add(r.event_type)
    phi = {c: Fraction(0) for c in ("click", "error", "signup", "view")}
    for t in masks.values():
        for c in t:
            phi[c] += Fraction(1, len(t))
    for c, want in phi.items():
        assert Fraction(got[c].phi_24, 24) == want, (c, got[c].phi_24, want)
    # conservation: total credit == touched conversions (untouched ones
    # cancel in the marginal differences)
    touched = sum(1 for t in masks.values() if t)
    assert sum(r.phi_24 for r in got.values()) == 24 * touched
    assert all(r.n_conversions == len(first_p) for r in got.values())


# ---------------------------------------------------------------------------
# B255: bitemporal as-of — the restatement semantics: later T sees the
# corrections, wider V sees more facts, and the late/corrected key sets
# behave exactly as synthesized.
# ---------------------------------------------------------------------------


def test_bitemporal_asof_restatement_semantics(spark, sf_dir):
    from collections import defaultdict

    from vectordb_hr_data_spark.querydefs.relational_queries import (
        orders_bitemporal_asof,
    )

    got = defaultdict(dict)
    for r in orders_bitemporal_asof(spark, sf_dir).collect():
        got[(r.t_label, r.v_label)][r.o_orderstatus] = (r.n_orders, r.revenue_cents)
    assert set(got) == {("T4_8", "V4_8"), ("T4_8", "V8_8"), ("T6_8", "V4_8"), ("T6_8", "V8_8")}

    def tot(cell, i):
        return sum(v[i] for v in got[cell].values())

    # wider valid-time window at fixed T sees at least as many facts
    assert tot(("T4_8", "V8_8"), 0) >= tot(("T4_8", "V4_8"), 0)
    assert tot(("T6_8", "V8_8"), 0) >= tot(("T6_8", "V4_8"), 0)
    # later transaction time at fixed V: same-or-more facts (late arrivals
    # land) AND same-or-higher revenue (corrections are +500; no fact
    # leaves)
    for vlab in ("V4_8", "V8_8"):
        assert tot(("T6_8", vlab), 0) >= tot(("T4_8", vlab), 0)
        assert tot(("T6_8", vlab), 1) >= tot(("T4_8", vlab), 1)


# ---------------------------------------------------------------------------
# B257: Neyman allocation — optimality bound, budget conservation, and the
# exact N_h·sigma_h identity re-derived in Python.
# ---------------------------------------------------------------------------


def test_neyman_allocation_optimal_and_conserved(spark, sf_dir):
    import math

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        _NEYMAN_BUDGET,
        events_neyman_allocation_audit,
    )

    rows = events_neyman_allocation_audit(spark, sf_dir).collect()
    assert sum(r.n_neyman for r in rows) == _NEYMAN_BUDGET
    assert sum(r.n_prop for r in rows) == _NEYMAN_BUDGET
    # the optimality theorem: Neyman variance <= proportional variance
    assert all(r.neyman_vs_prop_ppm <= 1_000_000 for r in rows)
    # the s_h identity, exact in Python integers
    ev = read_table(spark, sf_dir, "events").select("event_type", "value").collect()
    moments = {}
    for r in ev:
        cents = int(round(float(r.value) * 100))
        n, sx, sxx = moments.get(r.event_type, (0, 0, 0))
        moments[r.event_type] = (n + 1, sx + cents, sxx + cents * cents)
    for r in rows:
        n, sx, sxx = moments[r.event_type]
        assert r.nh_sigma == math.isqrt(n * sxx - sx * sx), r.event_type


# ---------------------------------------------------------------------------
# B259: FD contracts — the declared key FDs must hold with ZERO violations
# on the synthetic tables, and the declared non-FDs must actually violate.
# ---------------------------------------------------------------------------


def test_fd_contracts_match_expectations(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.relational_queries import (
        _FD_CONTRACTS,
        fd_contract_audit,
    )

    got = {r.fd_name: r for r in fd_contract_audit(spark, sf_dir).collect()}
    assert set(got) == {c[0] for c in _FD_CONTRACTS}
    for name, _t, _l, _r, holds in _FD_CONTRACTS:
        if holds:
            assert got[name].n_violating_groups == 0, name
            assert got[name].max_distinct_rhs == 1, name
        else:
            assert got[name].n_violating_groups > 0, name


# ---------------------------------------------------------------------------
# B261: IVF compaction — plan invariants: exactly the bottom quartile
# merges, targets are survivors — and the ledger is HONEST: on this
# corpus the nearest-survivor policy worsens max/min occupancy (starved
# cells pile into one survivor), which the plan must report, not hide.
# ---------------------------------------------------------------------------


def test_ivf_compaction_plan_invariants(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.vector_queries import (
        _IVF_COMPACT_CELLS,
        ivf_cell_compaction_plan,
    )

    rows = ivf_cell_compaction_plan(spark, sf_dir).collect()
    assert len(rows) == _IVF_COMPACT_CELLS // 4
    merged = {r.merged_cid for r in rows}
    targets = {r.target_cid for r in rows}
    assert not merged & targets, "a merged cell can never be a merge target"
    for r in rows:
        assert r.n_cells_after == r.n_cells_before - len(rows)
        assert r.imbalance_before_milli >= 1000 and r.imbalance_after_milli >= 1000
    # the measured trade on this corpus: fewer cells, WORSE spread — the
    # ledger must carry both numbers so the maintenance job can decide
    assert rows[0].imbalance_after_milli != rows[0].imbalance_before_milli


# ---------------------------------------------------------------------------
# B262: KMV mergeability is EXACT — merged-from-leaves sketches must be
# bit-identical to direct sketches at every level.
# ---------------------------------------------------------------------------


def test_kmv_merge_equals_direct_sketch(spark, sf_dir):
    from vectordb_hr_data_spark.io import read_table

    K = 64
    ev = read_table(spark, sf_dir, "events")
    du = ev.selectExpr(
        "event_type", "unix_micros(ts) div 86400000000 as day", "user_id"
    ).distinct()
    h = du.selectExpr(
        "event_type",
        "day",
        "cast(conv(substring(md5(concat('u:', cast(user_id as string))), 1, 15),"
        " 16, 10) as bigint) as hv",
    )
    leaf = h.groupBy("event_type", "day").agg(
        F.expr(f"slice(array_sort(collect_set(hv)), 1, {K})").alias("ks")
    )
    merged = {
        r.event_type: tuple(r.ks)
        for r in leaf.groupBy("event_type")
        .agg(
            F.expr(
                f"slice(array_sort(array_distinct(flatten(collect_list(ks)))), 1, {K})"
            ).alias("ks")
        )
        .collect()
    }
    direct = {
        r.event_type: tuple(r.ks)
        for r in h.groupBy("event_type")
        .agg(F.expr(f"slice(array_sort(collect_set(hv)), 1, {K})").alias("ks"))
        .collect()
    }
    assert merged == direct and len(merged) > 0


def test_kmv_estimate_branch_no_overflow():
    # the B190 oracle's estimate branch had never executed on test data
    # (every source holds <= 64 distinct tokens) and harbored a latent
    # INT64 overflow: DuckDB folds (K-1) * M eagerly as integers. The
    # reordered (K-1) * 1.0 * M must evaluate on a sketch that actually
    # overflows K.
    import duckdb

    from vectordb_hr_data_spark.querydefs.dedup_queries import KMV_K, KMV_M

    con = duckdb.connect()
    est = con.execute(
        f"SELECT CAST(floor(({KMV_K} - 1) * 1.0 * {KMV_M} / 1152921504606846) AS BIGINT)"
    ).fetchone()[0]
    assert est == 63000  # (K-1) * M / (M/1000) = 63 * 1000


# ---------------------------------------------------------------------------
# B263: cell suppression — the published table must leak nothing through
# either margin: every row/column has 0 or >= 2 hidden cells.
# ---------------------------------------------------------------------------


def test_cell_suppression_margins_safe(spark, sf_dir):
    from collections import defaultdict

    from vectordb_hr_data_spark.querydefs.scrub_queries import (
        customer_cell_suppression,
    )

    rows = customer_cell_suppression(spark, sf_dir).collect()
    assert rows
    by_seg, by_reg, n_hidden = defaultdict(int), defaultdict(int), 0
    for r in rows:
        hid = int(r.published_count == -1)
        assert hid == (r.prim_sup + r.comp_row + r.comp_col > 0)
        by_seg[r.segment] += hid
        by_reg[r.region] += hid
        n_hidden += hid
    for line, cnt in {**by_seg, **by_reg}.items():
        assert cnt == 0 or cnt >= 2, (line, cnt)
    # the self-audit ledger agrees with the margin walk above
    assert all(r.residual_leaks == 0 for r in rows)
    # sf0.001 actually exercises suppression (sparse grid); larger SFs may
    # legitimately publish everything
    if rows[0].n_customers < 60:
        assert n_hidden >= 2


# ---------------------------------------------------------------------------
# B265: KS two-sample — cross-check D against scipy-free Python ECDFs, and
# the null case (same seeded split => no rejection expected at 95%).
# ---------------------------------------------------------------------------


def test_ks_two_sample_matches_python_ecdf(spark, sf_dir):
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_ks_two_sample

    row = events_ks_two_sample(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select("user_id", "value").collect()
    import hashlib

    arms = {0: [], 1: []}
    for r in ev:
        h = int(hashlib.md5(f"srm:{r.user_id}".encode()).hexdigest()[:8], 16) % 2
        arms[h].append(round(float(r.value) * 100))
    a0, a1 = sorted(arms[0]), sorted(arms[1])
    n0, n1 = len(a0), len(a1)
    values = sorted(set(a0) | set(a1))
    import bisect

    d_num = max(
        abs(bisect.bisect_right(a0, v) * n1 - bisect.bisect_right(a1, v) * n0)
        for v in values
    )
    assert (row.n_arm0, row.n_arm1) == (n0, n1)
    assert row.d_micro == d_num * 1_000_000 // (n0 * n1)
    # a hash split of one population is the null: the 95% gate must not fire
    assert row.reject_95 == 0


# ---------------------------------------------------------------------------
# B267: absorption DP — step-1 equals the raw transition probability to
# purchase, k-monotonicity, absorbing state pinned at 1.
# ---------------------------------------------------------------------------


def test_markov_absorption_consistency(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.event_queries import (
        events_markov_absorption,
        events_markov_transitions,
    )

    rows = {r.start_type: r for r in events_markov_absorption(spark, sf_dir).collect()}
    t_to_purchase = {
        r.from_type: r.prob_ppm
        for r in events_markov_transitions(spark, sf_dir).collect()
        if r.to_type == "purchase"
    }
    assert rows["purchase"].reach_1_ppm == 1_000_000
    for s, r in rows.items():
        if s != "purchase":
            assert r.reach_1_ppm == t_to_purchase[s], s
        assert r.reach_1_ppm <= r.reach_2_ppm <= r.reach_3_ppm <= r.reach_4_ppm


# ---------------------------------------------------------------------------
# B268: consistent hashing — keys may only move TO the new shard (the
# theorem the ring exists for), checked by a full Python re-derivation.
# ---------------------------------------------------------------------------


def test_ring_rebalance_moves_only_to_new_shard(spark, sf_dir):
    import bisect
    import hashlib

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        _RING_SPACE,
        _RING_VNODES,
        shard_rebalance_audit,
    )

    rows = {r.strategy: r for r in shard_rebalance_audit(spark, sf_dir).collect()}
    assert rows["ring"].moved_ppm < rows["mod"].moved_ppm // 5

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    def ring(n):
        pts = sorted(
            (h48(f"shard:{s}:{v}"), s) for s in range(n) for v in range(_RING_VNODES)
        )
        return pts

    def owner(pts, h):
        # predecessor convention: highest pos <= h, wrap to max
        ps = [p for p, _ in pts]
        i = bisect.bisect_right(ps, h) - 1
        return pts[i][1] if i >= 0 else pts[-1][1]

    r16, r17 = ring(16), ring(17)
    users = [
        r.user_id
        for r in read_table(spark, sf_dir, "events").select("user_id").distinct().collect()
    ]
    moved = 0
    for u in users:
        h = h48(f"key:{u}")
        a, b = owner(r16, h), owner(r17, h)
        if a != b:
            moved += 1
            assert b == 16, (u, a, b)  # only the NEW shard may gain keys
    assert moved == rows["ring"].n_moved
