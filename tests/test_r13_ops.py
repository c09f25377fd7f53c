"""Property tests for the r13 operators (B270-B276): the laws the
value-hash oracle cannot express — the PAV theorem behind the isotonic
fit, the Bloom no-false-negative theorem, sequential-test monotonicity,
IPS estimator identities, and the leakage-freedom constructions.

These run against the DuckDB oracle results (the strict checker already
proves Spark ≡ oracle per cell, so a law proven on the oracle side is
proven for the Spark plan too — and the tests stay Spark-session-free
and fast)."""

from __future__ import annotations

from fractions import Fraction

from vectordb_hr_data_spark import queries as Q


def _oracle_rows(ddb, name):
    res = ddb.execute(Q.REGISTRY[name].oracle)
    cols = [d[0] for d in res.description]
    return [dict(zip(cols, r)) for r in res.fetchall()]


# ---------------------------------------------------------------------------
# B273 isotonic: the minimax closed form must equal the classical
# pool-adjacent-violators fit, exactly (floored), plus the PAV laws.
# ---------------------------------------------------------------------------


def test_isotonic_equals_exact_pav_and_laws(ddb):
    from vectordb_hr_data_spark.querydefs.text_queries import _iso_scored_ddb, ISO_BINS

    bins = ddb.execute(
        f"WITH tf AS ({_iso_scored_ddb()}) "
        f"SELECT least(smicro * {ISO_BINS} // 1000000, {ISO_BINS - 1}) AS bin,"
        f" count(*) AS n, sum(y) AS pos FROM scored GROUP BY bin ORDER BY bin"
    ).fetchall()
    assert len(bins) >= 3
    # classical PAV (non-decreasing constraint), exact rationals
    stack: list[list] = []  # [w, s, n_bins]
    for _, n, pos in bins:
        stack.append([n, pos, 1])
        while len(stack) >= 2 and Fraction(stack[-2][1], stack[-2][0]) >= Fraction(
            stack[-1][1], stack[-1][0]
        ):
            w2, s2, c2 = stack.pop()
            stack[-1][0] += w2
            stack[-1][1] += s2
            stack[-1][2] += c2
    fit = []
    for w, s, c in stack:
        fit.extend([Fraction(s, w)] * c)

    got = _oracle_rows(ddb, "clf_isotonic_calibration")
    assert len(got) == len(bins)
    for row, f, (_, n, pos) in zip(got, fit, bins):
        # the micro-floored minimax IS floor(exact PAV): floor is monotone,
        # so it commutes with min and max over finite sets
        assert row["iso_fit_micro"] == (f * 1_000_000).__floor__(), row
    # law 1: the fit is monotone non-decreasing
    fits = [r["iso_fit_micro"] for r in got]
    assert fits == sorted(fits)
    # law 2: the exact fit preserves the weighted total (Σ n·fit = Σ pos)
    tot = sum(Fraction(n) * f for (_, n, _), f in zip(bins, fit))
    assert tot == sum(pos for _, _, pos in bins)
    # law 3: the fit actually pooled something on this corpus (the raw
    # reliability curve is not already monotone — otherwise the op tests
    # nothing); if this ever fails the fixture changed, not the math
    raw = [Fraction(pos, n) for _, n, pos in bins]
    assert raw != sorted(raw), "fixture degenerate: raw rates already isotonic"


# ---------------------------------------------------------------------------
# B274 bloom: no false negatives — every member key passes the filter.
# ---------------------------------------------------------------------------


def test_bloom_has_no_false_negatives(ddb):
    from vectordb_hr_data_spark.querydefs.relational_queries import (
        _BLOOM_K,
        _bloom_pos_ddb,
    )

    n_missed = ddb.execute(
        f"""
WITH members AS (
  SELECT DISTINCT o_orderkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
), seeds AS (SELECT unnest(ARRAY[0,1,2,3]) AS i),
mpos AS (
  SELECT DISTINCT {_bloom_pos_ddb('s.i', 'm.key')} AS pos
  FROM members m CROSS JOIN seeds s
), hit AS (
  SELECT m.key, count(*) AS nhit
  FROM (SELECT m2.key, {_bloom_pos_ddb('s.i', 'm2.key')} AS pos
        FROM members m2 CROSS JOIN seeds s) m
  JOIN mpos ON mpos.pos = m.pos GROUP BY m.key
)
SELECT count(*) FROM hit WHERE nhit < {_BLOOM_K}
"""
    ).fetchone()[0]
    assert n_missed == 0
    row = _oracle_rows(ddb, "orders_bloom_join_prune")[0]
    # every true member passes => pass count bounds from below; and the
    # filter must actually prune something at this occupancy
    assert row["n_pass"] >= row["n_true_members"]
    assert row["n_false_pos"] == row["n_pass"] - row["n_true_members"]
    assert 0 < row["occupancy_ppm"] < 1_000_000
    assert row["prune_ratio_ppm"] > 0


# ---------------------------------------------------------------------------
# B271 OBF: boundaries decrease, cumulative looks are monotone, and the
# final look sees the full horizon.
# ---------------------------------------------------------------------------


def test_obf_sequential_monotonicity(ddb):
    rows = _oracle_rows(ddb, "events_obf_sequential_test")
    assert [r["look"] for r in rows] == [1, 2, 3, 4]
    bounds = [r["obf_bound_milli"] for r in rows]
    assert bounds == sorted(bounds, reverse=True) and bounds[-1] == 2024
    for c in ("users_arm0", "users_arm1", "conv_arm0", "conv_arm1"):
        vals = [r[c] for r in rows]
        assert vals == sorted(vals), f"{c} not cumulative: {vals}"
    total_users = ddb.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert rows[-1]["users_arm0"] + rows[-1]["users_arm1"] == total_users


# ---------------------------------------------------------------------------
# B272 IPS: estimator sanity — matched mass bounds, ESS bounds, and the
# value policy cannot (materially) underperform the modal policy on its
# own self-normalized estimate.
# ---------------------------------------------------------------------------


def test_ips_policy_eval_identities(ddb):
    rows = {r["policy"]: r for r in _oracle_rows(ddb, "events_ips_policy_eval")}
    assert set(rows) == {"mode", "value"}
    # propensities come from the full log; the estimator folds over the
    # deterministic even-event_id eval half (ADVICE r13 de-degeneration)
    n_eval = ddb.execute(
        "SELECT count(*) FROM events WHERE event_id % 2 = 0"
    ).fetchone()[0]
    for r in rows.values():
        assert r["n_events"] == n_eval
        assert 0 < r["n_matched"] <= n_eval
        # Cauchy-Schwarz: ESS = (Σw)²/Σw² never exceeds the count of
        # non-zero-weight rows (the matched eval rows)
        assert 0 < r["ess_milli"] <= 1000 * r["n_matched"]
        # SNIPS and IPS estimate the same quantity; the realized weight
        # mass fluctuates O(1/√n) around n_eval, so they track within 15%
        hi = max(r["ips_value_micro"], r["snips_value_micro"])
        assert abs(r["ips_value_micro"] - r["snips_value_micro"]) <= 0.15 * hi
        # the de-degeneration witness: under the half-log fold Σw ≠ n_eval,
        # so SNIPS carries information IPS does not (pre-fix they were equal
        # by construction for every policy)
    assert any(
        r["ips_value_micro"] != r["snips_value_micro"] for r in rows.values()
    )
    # on this corpus the full-log value-argmax still wins on the half-log
    # estimate (empirical pin, no longer a per-construction theorem)
    assert rows["value"]["snips_value_micro"] >= rows["mode"]["snips_value_micro"]


# ---------------------------------------------------------------------------
# B275 group k-fold: the leakage-freedom construction — a content hash
# group can never straddle folds — and fold shares partition each fold.
# ---------------------------------------------------------------------------


def test_group_kfold_leakage_free(ddb):
    from vectordb_hr_data_spark.querydefs.pipeline_queries import KFOLD_K

    straddlers = ddb.execute(
        f"""
SELECT count(*) FROM (
  SELECT md5(text) AS chash,
         count(DISTINCT CAST(('0x' || substr(md5('kf:' || md5(text)), 1, 8)) AS BIGINT)
                        % {KFOLD_K}) AS nf
  FROM documents GROUP BY md5(text)
) WHERE nf > 1
"""
    ).fetchone()[0]
    assert straddlers == 0
    rows = _oracle_rows(ddb, "doc_group_kfold")
    n_total = ddb.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_total
    by_fold: dict[int, int] = {}
    for r in rows:
        by_fold[r["fold"]] = by_fold.get(r["fold"], 0) + r["n_docs"]
    assert len(by_fold) == KFOLD_K and all(v > 0 for v in by_fold.values())


# ---------------------------------------------------------------------------
# B276 CV folds: the leakage witness holds, windows expand, validation
# slices are non-empty.
# ---------------------------------------------------------------------------


def test_timeseries_cv_folds_leakage_witness(ddb):
    rows = _oracle_rows(ddb, "events_timeseries_cv_folds")
    assert [r["fold"] for r in rows] == [1, 2, 3, 4]
    for r in rows:
        assert r["train_max_us"] <= r["cut_us"], r
        assert r["val_events"] > 0 and r["train_events"] > 0
        assert 0 <= r["cold_users"] <= r["val_users"]
        assert 0 <= r["cold_user_ppm"] <= 1_000_000
    te = [r["train_events"] for r in rows]
    tu = [r["train_users"] for r in rows]
    assert te == sorted(te) and tu == sorted(tu)


# ---------------------------------------------------------------------------
# B270 uplift: segments partition the user dimension; per-segment 2x2s
# are internally consistent.
# ---------------------------------------------------------------------------


def test_uplift_segments_partition_users(ddb):
    rows = _oracle_rows(ddb, "events_uplift_by_segment")
    assert {r["segment"] for r in rows} <= {"low", "mid", "high"}
    n_users = ddb.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(r["users_arm0"] + r["users_arm1"] for r in rows) == n_users
    for r in rows:
        assert 0 <= r["conv_arm0"] <= r["users_arm0"]
        assert 0 <= r["conv_arm1"] <= r["users_arm1"]
        assert r["significant_95"] in (0, 1)


# ---------------------------------------------------------------------------
# B277 streaming bloom: replayed, duplicated, arbitrarily-batched key
# deliveries converge to the batch-built position table EXACTLY (set
# union absorbs even at-least-once redelivery).
# ---------------------------------------------------------------------------


def test_stream_bloom_append_converges_and_absorbs_redelivery(spark, sf_dir, tmp_path):
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.relational_queries import _BLOOM_K, _BLOOM_M
    from vectordb_hr_data_spark.functions import texthash as _H
    from vectordb_hr_data_spark.streaming.stream_ops import stream_bloom_append

    orders = read_table(spark, sf_dir, "orders")
    members = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("key"))
        .distinct()
    )
    src = tmp_path / "bloom_src"
    src.mkdir()
    # three batches by key residue, plus batch 0 DELIVERED TWICE — the
    # idempotence leg counting sinks cannot pass
    splits = [0, 1, 2, 0]
    for seq, residue in enumerate(splits):
        part = members.filter(F.col("key") % 3 == residue)
        tdir = str(tmp_path / f"bloom_part{seq}")
        part.coalesce(1).write.parquet(tdir)
        dst = str(src / f"f{seq}.parquet")
        shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + seq * 60, 1_700_000_000 + seq * 60))
    stream = (
        spark.readStream.schema(members.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    state = str(tmp_path / "bloom_state")
    stream_bloom_append(stream, state)

    seeds = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("i"))
    batch_pos = sorted(
        r.pos
        for r in members.crossJoin(F.broadcast(seeds))
        .select(
            F.expr(
                _H.spark_str_hash_fast(
                    "concat('bf', cast(i as string), ':', cast(key as string))"
                )
                + f" % {_BLOOM_M}"
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    streamed_pos = sorted(r.pos for r in spark.read.parquet(state).collect())
    assert streamed_pos == batch_pos and len(streamed_pos) > 0


# ---------------------------------------------------------------------------
# B278 isotropy: the sum-vector identity must equal the brute-force mean
# pairwise cosine it replaces (numpy replay over the quantized vectors).
# ---------------------------------------------------------------------------


def test_isotropy_identity_matches_bruteforce(ddb):
    import numpy as np

    rows = ddb.execute(
        "SELECT list_transform(embedding, x -> CAST(round(x * 1000.0) AS BIGINT))"
        " FROM embeddings ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    n = len(X)
    C = X - X.mean(axis=0)
    U = np.round(C / np.linalg.norm(C, axis=1, keepdims=True) * 1_000_000)
    G = U @ U.T
    offdiag = (G.sum() - np.trace(G)) / (n * (n - 1))
    want = int(np.floor(offdiag / 1_000_000))
    got = _oracle_rows(ddb, "embedding_isotropy_audit")[0]
    assert got["n_vectors"] == n
    assert got["mean_offdiag_cos_micro"] == want
    # unit-norm sanity gate: |sqq − n·1e12| ≤ n·1e7 — the raw micro mean
    # sits exactly on the 1e6 grain boundary, so the drift-tolerant gate
    # replaced it (ADVICE r14)
    assert got["self_dot_ok"] == 1
    # centered vectors sum to ~0, so the mean off-diagonal cosine must be
    # (slightly) negative — the identity's signature
    assert got["mean_offdiag_cos_micro"] < 0


# ---------------------------------------------------------------------------
# B279 audio framing: frame-count law + python RMS replay on sample docs.
# ---------------------------------------------------------------------------


def test_audio_frame_rms_laws(ddb):
    import math

    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        _FRAME_HOP,
        _FRAME_MAX,
        _FRAME_W,
    )

    rows = _oracle_rows(ddb, "multimodal_audio_frame_rms")
    by_doc: dict[int, list[dict]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = dict(ddb.execute("SELECT doc_id, text FROM documents").fetchall())
    assert set(by_doc) == set(texts)
    for doc_id in list(texts)[:20]:
        text = texts[doc_id]
        want_frames = min(max((len(text) - _FRAME_W) // _FRAME_HOP + 1, 1), _FRAME_MAX)
        frames = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        assert len(frames) == want_frames, (doc_id, len(frames), want_frames)
        for fr in frames:
            seg = text[fr["frame_idx"] * _FRAME_HOP : fr["frame_idx"] * _FRAME_HOP + _FRAME_W]
            codes = [ord(ch) for ch in seg]
            # ascii() stand-in decode: non-ASCII chars map per engine ascii()
            if all(c < 128 for c in codes):
                assert fr["n_samples"] == len(codes)
                want_rms = math.floor(
                    math.sqrt(sum(c * c for c in codes) / len(codes)) * 1_000_000 + 0.5
                )
                assert fr["rms_micro"] == want_rms, (doc_id, fr)
                assert fr["peak_code"] == max(codes)


# ---------------------------------------------------------------------------
# B280 char entropy: Jensen bound H <= ln(n_distinct), zero for
# single-char frames, and the gate threshold applied consistently.
# ---------------------------------------------------------------------------


def test_char_entropy_bounds(ddb):
    import math

    from vectordb_hr_data_spark.querydefs.text_queries import _ENTROPY_GATE_MICRONAT

    rows = _oracle_rows(ddb, "doc_char_entropy_gate")
    assert rows
    for r in rows:
        # weighted mean of once-rounded terms: ±1 micronat slack on the bound
        assert 0 <= r["entropy_micronat"] <= round(math.log(r["n_distinct_chars"]) * 1e6) + 1
        assert r["low_entropy_flag"] == (1 if r["entropy_micronat"] < _ENTROPY_GATE_MICRONAT else 0)
    # natural-language fixture: the typical doc sits in the 2-4.5 nat band
    med = sorted(r["entropy_micronat"] for r in rows)[len(rows) // 2]
    assert 2_000_000 < med < 4_500_000


# ---------------------------------------------------------------------------
# B281 pack advisor: one advised config, token totals invariant across
# budgets, bin count monotone non-increasing in budget.
# ---------------------------------------------------------------------------


def test_pack_config_advisor_laws(ddb):
    rows = _oracle_rows(ddb, "pack_config_advisor")
    assert [r["budget"] for r in rows] == [1024, 2048, 4096, 8192]
    assert sum(r["advised"] for r in rows) == 1
    assert len({r["total_tokens"] for r in rows}) == 1
    nb = [r["n_bins"] for r in rows]
    assert nb == sorted(nb, reverse=True)
    for r in rows:
        assert 0 <= r["overflow_tokens"] <= r["total_tokens"]
        assert r["n_overflow_bins"] <= r["n_bins"]


# ---------------------------------------------------------------------------
# B282 FK inference: the true TPC-H edges are accepted, the planted
# non-edges rejected, and containment is consistent with the overlap.
# ---------------------------------------------------------------------------


def test_fk_inference_separates_edges_from_non_edges(ddb):
    rows = {(r["child_col"], r["parent_col"]): r for r in _oracle_rows(ddb, "schema_fk_inference")}
    true_edges = [
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("orders.o_custkey", "customer.c_custkey"),
        ("customer.c_nationkey", "nation.n_nationkey"),
        ("supplier.s_nationkey", "nation.n_nationkey"),
    ]
    non_edges = [
        ("orders.o_orderkey", "customer.c_custkey"),
        ("part.p_size", "nation.n_nationkey"),
    ]
    for e in true_edges:
        assert rows[e]["inferred_fk"] == 1, (e, rows[e])
        assert rows[e]["fwd_containment_ppm"] == 1_000_000
    for e in non_edges:
        assert rows[e]["inferred_fk"] == 0, (e, rows[e])
    for r in rows.values():
        assert r["n_overlap"] <= min(r["n_child_distinct"], r["n_parent_distinct"])
        assert 0 <= r["fwd_containment_ppm"] <= 1_000_000


# ---------------------------------------------------------------------------
# B283 counting bloom: deletion cannot create false negatives among
# SURVIVORS (a member's increments are only removed by its own delete),
# and the estimator relations hold.
# ---------------------------------------------------------------------------


def test_counting_bloom_survivors_all_pass(ddb):
    row = _oracle_rows(ddb, "orders_counting_bloom_delete")[0]
    assert row["n_remaining_pass"] == row["n_remaining"], row
    assert row["n_members"] == row["n_deleted"] + row["n_remaining"]
    assert 0 <= row["n_deleted_pass"] <= row["n_deleted"]
    assert 0 <= row["deleted_persistence_ppm"] <= 1_000_000
    assert 0 <= row["measured_fpp_ppm"] <= 1_000_000
    # deletions actually removed bits: net occupancy below the B274
    # insert-only filter's occupancy
    ins_only = _oracle_rows(ddb, "orders_bloom_join_prune")[0]
    assert row["bits_net_set"] < ins_only["bits_set"]


# ---------------------------------------------------------------------------
# B283 streaming twin: the I/D key CDC replayed over batches converges
# to the batch-built net counters; survivors pass, NULL op raises.
# ---------------------------------------------------------------------------


def test_stream_counting_bloom_converges_to_batch(spark, sf_dir, tmp_path):
    import glob
    import os
    import shutil

    import pytest as _pytest
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.relational_queries import _BLOOM_K, _BLOOM_M
    from vectordb_hr_data_spark.functions import texthash as _H
    from vectordb_hr_data_spark.streaming.stream_ops import stream_counting_bloom

    orders = read_table(spark, sf_dir, "orders")
    members = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_orderkey").alias("key"))
        .agg(F.max("o_orderstatus").alias("st"))
    )
    # CDC log: insert every member, then delete the fulfilled subset
    cdc = members.select(F.lit("I").alias("op"), "key").unionByName(
        members.filter(F.col("st") == "F").select(F.lit("D").alias("op"), "key")
    )
    src = tmp_path / "cbf_src"
    src.mkdir()
    # batches split so some deletes arrive in earlier files than their
    # inserts' siblings — order must not matter (signed sum)
    for seq, residue in enumerate([0, 1, 2]):
        part = cdc.filter(F.col("key") % 3 == residue)
        tdir = str(tmp_path / f"cbf_part{seq}")
        part.coalesce(1).write.parquet(tdir)
        dst = str(src / f"f{seq}.parquet")
        shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + seq * 60, 1_700_000_000 + seq * 60))
    stream = spark.readStream.schema(cdc.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "cbf_state")
    stream_counting_bloom(stream, state)

    pos_expr = F.expr(
        _H.spark_str_hash_fast("concat('bf', cast(i as string), ':', cast(key as string))")
        + f" % {_BLOOM_M}"
    )
    seeds = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("i"))
    batch_net = {
        r.pos: r.net
        for r in members.crossJoin(F.broadcast(seeds))
        .groupBy(pos_expr.alias("pos"))
        .agg(
            F.sum(F.when(F.col("st") == "F", 0).otherwise(1)).cast("long").alias("net")
        )
        .filter(F.col("net") != 0)
        .collect()
    }
    streamed_net = {r.pos: r.net for r in spark.read.parquet(state).collect()}
    assert streamed_net == batch_net and len(streamed_net) > 0

    # NULL op raises loudly
    bad = spark.createDataFrame([(None, 7)], "op string, key long")
    bsrc = tmp_path / "cbf_bad_src"
    bsrc.mkdir()
    tdir = str(tmp_path / "cbf_bad_part")
    bad.coalesce(1).write.parquet(tdir)
    shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], str(bsrc / "f0.parquet"))
    bstream = spark.readStream.schema(bad.schema).option("maxFilesPerTrigger", 1).parquet(str(bsrc))
    with _pytest.raises(Exception, match="op outside I/D"):
        stream_counting_bloom(bstream, str(tmp_path / "cbf_bad_state"))


# ---------------------------------------------------------------------------
# B284 repeat spans: python sliding-window replay on sample docs, the
# 2x bracketing law (dup at L implies dup at every shorter L), and the
# window-count arithmetic.
# ---------------------------------------------------------------------------


def test_repeat_span_profile_laws(ddb):
    from vectordb_hr_data_spark.querydefs.text_queries import _REPEAT_LS, _REPEAT_PREFIX

    rows = _oracle_rows(ddb, "doc_repeat_span_profile")
    by_doc: dict[int, dict[int, dict]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["win_len"]] = r
    texts = dict(ddb.execute("SELECT doc_id, text FROM documents").fetchall())
    for doc_id, prof in list(by_doc.items())[:15]:
        text = texts[doc_id][:_REPEAT_PREFIX]
        for L, r in prof.items():
            want_windows = max(min(len(texts[doc_id]), _REPEAT_PREFIX) - L + 1, 0)
            assert r["n_windows"] == want_windows, (doc_id, L, r)
            wins = [text[i : i + L] for i in range(want_windows)]
            from collections import Counter

            cnt = Counter(wins)
            assert r["n_distinct"] == len(cnt)
            assert r["n_dup_windows"] == sum(n for n in cnt.values() if n > 1)
        # a duplicate at length L contains duplicates at every L' < L:
        # dup flags are monotone non-increasing in window length
        flags = [1 if prof[L]["n_dup_windows"] > 0 else 0 for L in sorted(prof)]
        assert flags == sorted(flags, reverse=True), (doc_id, flags)


# ---------------------------------------------------------------------------
# B287 Procrustes: R is orthogonal, recovers the PLANTED rotation, and
# collapses the alignment error to the ripple floor.
# ---------------------------------------------------------------------------


def test_procrustes_recovers_planted_rotation(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.opq import seeded_rotation
    from vectordb_hr_data_spark.querydefs.vector_queries import embedding_procrustes_align

    row = embedding_procrustes_align(spark, sf_dir).collect()[0]
    assert row.err_after_micro < row.err_before_micro / 100, row
    # the planted per-dim ripple is U{-3..3}/1000 per element: its mean
    # square is (1/7)Σk²/10⁶·dim = 4·64/10⁶ = 256 micro — the floor the
    # aligned error must sit near (alignment cannot beat the noise)
    assert 100 <= row.err_after_micro <= 600, row

    # independent numpy replay: the Procrustes solution recovers the
    # planted rotation up to the noise
    emb = read_table(spark, sf_dir, "embeddings")
    X = np.array(
        [r.e for r in emb.select(F.col("embedding").cast("array<double>").alias("e"))
         .orderBy("vec_id").collect()]
    )
    dim = X.shape[1]
    Rt = np.array(seeded_rotation(dim, seed=11))  # rows = output dims
    Y = X @ Rt.T
    M = X.T @ Y
    u, _, vt = np.linalg.svd(M)
    R = u @ vt
    assert np.allclose(R.T @ R, np.eye(dim), atol=1e-9)
    assert np.abs(R - Rt.T).max() < 1e-6, "Procrustes did not recover the planted rotation"


# ---------------------------------------------------------------------------
# B285 Apriori: the pruning ledger is consistent (candidates shrink at
# every stage) and every reported triple's pairs are frequent.
# ---------------------------------------------------------------------------


def test_basket_triples_apriori_ledger(ddb):
    rows = _oracle_rows(ddb, "basket_triple_mining")
    assert rows
    g = rows[0]
    assert g["n_prefix_candidates"] >= g["n_face_pruned_candidates"] >= g["n_frequent_triples"]
    assert g["n_frequent_triples"] >= len(rows) or len(rows) <= 10
    for r in rows:
        assert r["p1"] < r["p2"] < r["p3"]
        assert 0 < r["conf_vs_pair_ppm"] <= 1_000_000
    sups = [r["support"] for r in rows]
    assert sups == sorted(sups, reverse=True)


# ---------------------------------------------------------------------------
# B286 sampling table: contiguous exact ranges, order by count, weights
# equal round(c^0.75) via the sqrt(sqrt(c^3)) identity.
# ---------------------------------------------------------------------------


def test_negative_sampling_table_ranges(ddb):
    import math

    rows = _oracle_rows(ddb, "doc_negative_sampling_table")
    n_vocab = ddb.execute(
        "SELECT count(DISTINCT t) FROM (SELECT unnest(string_split(text, ' ')) t"
        " FROM documents) WHERE t <> ''"
    ).fetchone()[0]
    assert len(rows) == min(200, n_vocab)
    cum = 0
    for r in rows:
        assert r["cum_lo"] == cum and r["cum_hi"] == cum + r["w75"]
        cum = r["cum_hi"]
        assert r["w75"] == round(math.sqrt(math.sqrt(float(r["cnt"]) ** 3)))
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    # smoothing law: weight share is flatter than count share (the head
    # is down-weighted relative to raw frequency)
    tot_c = sum(cnts)
    head = rows[0]
    assert head["w75"] / cum < head["cnt"] / tot_c
