"""Round-13 regression tests: the VERDICT r12 findings (rank-range cache
leak, memo lifecycle, delta-join state guards, the driver-window staleness
bound as code) and the ADVICE r12 findings (NULL-op CDC gate evasion,
multiplicity-state net=0 growth, sessionize closed-dir bootstrap)."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# VERDICT r12 #1: with_exact_rank_range must leave NO cached frame behind.
# The r12 form persist()ed its input and never unpersisted — every call
# leaked one MEMORY_AND_DISK user-dimension frame into the session for the
# process lifetime (events_user_rfm 2.14 -> 4.29 s). The r13 form spills
# to a pid-scoped scratch parquet instead: same 1x upstream compute
# (test_r12_fixes pins that), zero cache residue (this pins that).
# ---------------------------------------------------------------------------


def test_rank_range_leaves_no_persistent_rdds(spark):
    from vectordb_hr_data_spark.operators.quantiles import (
        with_exact_ntile_range,
        with_exact_rank_range,
    )

    def persistent_ids():
        # py4j auto-converts java.lang.Integer keys to Python ints
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(str(k)) for k in jmap.keySet().toArray()}

    before = persistent_ids()

    base = spark.range(1000).select(
        (F.col("id") * 37 % 1009).alias("v"), F.col("id").alias("tid")
    )
    ranked = with_exact_rank_range(base, "v", "tid", "rn", num_parts=8)
    assert ranked.count() == 1000
    tiled = with_exact_ntile_range(base, 5, "v", "tid", "t", num_parts=8)
    assert tiled.count() == 1000

    after = persistent_ids()
    assert after <= before, f"rank-range leaked cached RDDs: {after - before}"


def test_rank_range_scratch_lands_under_memo_root(spark):
    """The spill table must live under the memo root with this pid's token
    so the atexit/stale sweeps cover it — a spill outside the lifecycle
    would re-create the litter problem the sweep solves."""
    from vectordb_hr_data_spark.operators import memo
    from vectordb_hr_data_spark.operators.quantiles import with_exact_rank_range

    base = spark.range(100).select(F.col("id").alias("v"), F.col("id").alias("tid"))
    ranked = with_exact_rank_range(base, "v", "tid", "rn", num_parts=4)
    assert ranked.count() == 100
    mine = [
        d
        for d in os.listdir(memo._root())
        if d.startswith("scratch-rankrange_rn-") and f"-p{os.getpid()}-" in d
    ]
    assert mine, "rank-range spill did not land under the memo root"


# ---------------------------------------------------------------------------
# VERDICT r12 #2/#3: memo lifecycle — invalidate() forces a recompute,
# invalidate_all() flushes everything, sweep_stale() removes dead-pid
# litter and keeps live-pid dirs.
# ---------------------------------------------------------------------------


def test_memo_invalidate_recomputes(spark, sf_dir, tmp_path):
    from vectordb_hr_data_spark.operators import memo

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3).select(F.col("id").alias("x"))

    name = "r13_test_curve"
    assert memo.memo_table(spark, sf_dir, name, build).count() == 3
    assert memo.memo_table(spark, sf_dir, name, build).count() == 3
    assert calls["n"] == 1, "memo did not amortize the second call"

    path = memo._path(sf_dir, name)
    assert os.path.isdir(path)
    memo.invalidate(name)
    assert not os.path.isdir(path), "invalidate left the on-disk table"
    assert memo.memo_table(spark, sf_dir, name, build).count() == 3
    assert calls["n"] == 2, "invalidate did not force a recompute"
    memo.invalidate(name)


def test_memo_invalidate_all_flushes_everything(spark, sf_dir):
    from vectordb_hr_data_spark.operators import memo

    for nm in ("r13_flush_a", "r13_flush_b"):
        memo.memo_table(spark, sf_dir, nm, lambda: spark.range(2))
    paths = [memo._path(sf_dir, nm) for nm in ("r13_flush_a", "r13_flush_b")]
    assert all(os.path.isdir(p) for p in paths)
    memo.invalidate_all()
    assert not any(os.path.isdir(p) for p in paths)
    assert not memo._SAVED


def test_memo_sweep_stale_removes_dead_pid_dirs_only():
    import subprocess

    from vectordb_hr_data_spark.operators import memo

    root = memo._root()
    os.makedirs(root, exist_ok=True)
    # a genuinely dead pid: a child that has already exited
    proc = subprocess.Popen(["true"])
    proc.wait()
    dead = proc.pid
    dead_dir = os.path.join(root, f"r13sweep-x-p{dead}")
    live_dir = os.path.join(root, f"r13sweep-y-p{os.getpid()}")
    os.makedirs(dead_dir, exist_ok=True)
    os.makedirs(live_dir, exist_ok=True)
    try:
        memo.sweep_stale()
        assert not os.path.isdir(dead_dir), "dead-pid dir survived the sweep"
        assert os.path.isdir(live_dir), "live-pid dir was swept"
    finally:
        shutil.rmtree(dead_dir, ignore_errors=True)
        shutil.rmtree(live_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# VERDICT r12 #4: stream_delta_join state guards — a CORRUPTED accumulator
# dir must raise a named error, never silently degrade the view to
# batch-only joins; an absent dir is still the normal first-batch bootstrap
# (test_streaming's convergence test keeps pinning that path).
# ---------------------------------------------------------------------------


def _one_file_stream(spark, tmp_path, df, tag):
    src = tmp_path / f"{tag}_src"
    src.mkdir()
    tdir = str(tmp_path / f"{tag}_part")
    df.coalesce(1).write.parquet(tdir)
    shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], str(src / "f0.parquet"))
    return spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(str(src))


def _dj_rows(spark, n=4):
    rows = [("O", i, "1-URGENT", None, None, None, None, None) for i in range(n)] + [
        ("L", None, None, i, 1, 10.0, 0.1, "N") for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "side string, o_orderkey long, o_orderpriority string, l_orderkey long,"
        " l_linenumber int, l_extendedprice double, l_discount double, l_returnflag string",
    )


def test_stream_delta_join_corrupt_state_raises(spark, tmp_path):
    from vectordb_hr_data_spark.streaming.stream_ops import stream_delta_join

    o_acc = str(tmp_path / "dj13_o_acc")
    os.makedirs(o_acc)
    with open(os.path.join(o_acc, "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    stream = _one_file_stream(spark, tmp_path, _dj_rows(spark), "dj13")
    with pytest.raises(Exception, match="unreadable"):
        stream_delta_join(
            stream, o_acc, str(tmp_path / "dj13_l_acc"), str(tmp_path / "dj13_view")
        )


def test_state_reader_treats_marker_only_dir_as_bootstrap(spark, tmp_path):
    """A dir holding only _SUCCESS (an empty append's residue — the
    ADVICE r12 #3 scenario) is 'no state yet', not corruption."""
    from vectordb_hr_data_spark.streaming.stream_ops import _read_state_or_none

    d = str(tmp_path / "markers_only")
    os.makedirs(d)
    open(os.path.join(d, "_SUCCESS"), "w").close()
    assert _read_state_or_none(spark, d, "t") is None
    assert _read_state_or_none(spark, str(tmp_path / "absent"), "t") is None


# ---------------------------------------------------------------------------
# ADVICE r12 #1 (medium): a NULL op must raise like any other unknown tag —
# the bare ~isin gate is NULL for NULL, dropping the row from `bad` while
# the signed folds' .otherwise() branches treat it as a delete/retraction.
# ---------------------------------------------------------------------------


def test_cdc_retraction_null_op_raises(spark, tmp_path):
    from vectordb_hr_data_spark.streaming.stream_ops import stream_cdc_retraction_agg

    bad = spark.createDataFrame(
        [(None, "O", 100, None)],
        "op string, status string, before_cents long, after_cents long",
    )
    stream = _one_file_stream(spark, tmp_path, bad, "cdcnull")
    with pytest.raises(Exception, match="malformed CDC"):
        stream_cdc_retraction_agg(stream, str(tmp_path / "cdcnull_state"))


def test_distinct_multiplicity_null_op_raises(spark, tmp_path):
    from vectordb_hr_data_spark.streaming.stream_ops import stream_distinct_multiplicity

    bad = spark.createDataFrame(
        [(None, "click", 7)], "op string, event_type string, user_id long"
    )
    stream = _one_file_stream(spark, tmp_path, bad, "multnull")
    with pytest.raises(Exception, match="op outside I/D"):
        stream_distinct_multiplicity(stream, str(tmp_path / "multnull_state"))


# ---------------------------------------------------------------------------
# ADVICE r12 #2: the multiplicity state is bounded by ACTIVE pairs — a
# fully-retracted pair leaves no state row (and comes back on re-insert).
# ---------------------------------------------------------------------------


def test_distinct_multiplicity_state_prunes_net_zero(spark, tmp_path):
    from vectordb_hr_data_spark.streaming.stream_ops import stream_distinct_multiplicity

    rows = [
        ("I", "click", 1),
        ("I", "click", 2),
        ("D", "click", 1),  # user 1 fully retracted -> no state row
    ]
    df = spark.createDataFrame(rows, "op string, event_type string, user_id long")
    src = tmp_path / "prune_src"
    src.mkdir()
    # two batches: the insert batch, then the retraction batch
    for i, batch in enumerate([rows[:2], rows[2:]]):
        b = spark.createDataFrame(batch, df.schema)
        tdir = str(tmp_path / f"prune_part{i}")
        b.coalesce(1).write.parquet(tdir)
        dst = str(src / f"f{i}.parquet")
        shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state_path = str(tmp_path / "prune_state")
    stream_distinct_multiplicity(stream, state_path)
    state = {(r.event_type, r.user_id): r.net for r in spark.read.parquet(state_path).collect()}
    assert state == {("click", 2): 1}, state


# ---------------------------------------------------------------------------
# ADVICE r12 #3: sessionize_from_state with NO closed session ever (every
# user still inside their first session) must fall back to the open state.
# ---------------------------------------------------------------------------


def test_sessionize_from_state_open_only(spark, tmp_path):
    from vectordb_hr_data_spark.streaming.stream_ops import (
        sessionize_from_state,
        stream_sessionize,
    )

    # three events, one user, all within the 30-min gap: one OPEN session,
    # nothing ever closes
    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-01-01 10:05:00", 7, "click", 2.0, "{}"),
        (3, "2024-01-01 10:10:00", 7, "purchase", 3.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    stream = _one_file_stream(spark, tmp_path, ev, "sess13")
    state = str(tmp_path / "sess13_state")
    stream_sessionize(stream, state)
    got = sessionize_from_state(spark, state).collect()
    assert len(got) == 1
    assert got[0].user_id == 7 and got[0].n_events == 3 and got[0].session_id == 1


# ---------------------------------------------------------------------------
# VERDICT r12 item 6: the driver-window staleness bound as a STANDING test.
# The rotation ledger was prose in NEXT.md; this encodes it — every oracle's
# newest driver CORRECTNESS row (counting the upcoming window as the next
# round) must be within the rotation cycle, and an oracle that has never
# held a row must be queued within the next two windows.
# ---------------------------------------------------------------------------


def test_driver_window_staleness_bound():
    import json
    import math
    import re

    from vectordb_hr_data_spark import queries as Q

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, int] = {}
    rounds = []
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        rounds.append(r)
        for k in json.load(open(f)):
            newest[k] = max(newest.get(k, 0), r)
    assert rounds, "no CORRECTNESS history committed"
    next_round = max(rounds) + 1

    oracles = [n for n in Q.PRIORITY if Q.REGISTRY[n].oracle is not None]
    window = set(Q.PRIORITY[:50])
    for n in window:
        if Q.REGISTRY[n].oracle is not None:
            newest[n] = next_round

    # the driver checks 50/round, so the tightest standing bound is the
    # rotation cycle length ceil(|oracles| / 50); K floors at 5 (the
    # NEXT.md prose bound) and grows with the registry
    K = max(5, math.ceil(len(oracles) / 50))

    never = [n for n in oracles if n not in newest]
    assert all(Q.PRIORITY.index(n) < 100 for n in never), (
        "never-windowed oracles must be queued within the next two windows: "
        f"{[n for n in never if Q.PRIORITY.index(n) >= 100]}"
    )
    stale = {
        n: next_round - newest[n]
        for n in oracles
        if n in newest and next_round - newest[n] > K
    }
    assert not stale, (
        f"oracles whose newest driver row is older than K={K} rounds "
        f"(rotate them into the next window): {stale}"
    )


# ---------------------------------------------------------------------------
# VERDICT r12 item 5: the index MAINTENANCE story as ONE scenario — build →
# stream append → needs_retune fires → memos invalidated BEFORE the callback
# → re-suggest refreshes the geometry → the advisor re-advises on fresh
# curves → every advised row still clears its recall target. The pieces
# (B19/B25/B27/B228/B238 + the r13 invalidate hook) each have their own
# test; this proves they compose, the way B22/B40 prove the data-prep story.
# ---------------------------------------------------------------------------


def test_index_lifecycle_scenario(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators import memo
    from vectordb_hr_data_spark.operators.ivf import ivf_assign, suggest_ivf_params
    from vectordb_hr_data_spark.operators.quantize import fit_ranges, sq8_encode_arrow
    from vectordb_hr_data_spark.querydefs.similarity_queries import ann_index_advisor
    from vectordb_hr_data_spark.streaming.stream_ops import stream_ivf_sq8_append

    # 1. advise on the current geometry — builds + memoizes the curves
    adv1 = ann_index_advisor(spark, sf_dir).collect()
    assert adv1 and all(r.achieved_recall_milli >= r.target_milli for r in adv1)
    curve_paths = sorted(memo._SAVED)
    assert curve_paths, "advisor did not memoize its curves"
    mtimes1 = {p: os.path.getmtime(p) for p in curve_paths}

    # 2. stream the corpus past the built rows-per-cell budget
    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    cents_df = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )
    centroid_rows = [(int(r.cid), [float(x) for x in r.cvec]) for r in cents_df.collect()]
    idx_path = str(tmp_path / "lc_idx")
    seed = emb.filter(F.col("vec_id") < 250)
    ivf_assign(seed, cents_df).select(
        "vec_id", "embedding", sq8_encode_arrow("embedding", lo, hi).alias("codes"), "cid"
    ).write.partitionBy("cid").mode("overwrite").parquet(idx_path)
    src = str(tmp_path / "lc_src")
    rest = emb.filter(F.col("vec_id") >= 250)
    rest.write.parquet(src)

    fired: list[int] = []
    flushed_before_callback: list[bool] = []

    def on_retune(n_now: int) -> None:
        # the invalidate hook must run BEFORE the callback, so a rebuild
        # scheduled here already sees the memos flushed
        flushed_before_callback.append(not memo._SAVED)
        fired.append(n_now)

    stream = spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = stream_ivf_sq8_append(
        stream, idx_path, centroid_rows, lo, hi,
        base_rows=250, on_retune=on_retune, rows_per_cell=50,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # 3. the trigger fired once, with the memos already invalidated
    assert len(fired) == 1 and fired[0] > 4 * 50 * 2.0
    assert flushed_before_callback == [True]
    assert not any(os.path.isdir(p) for p in curve_paths), "stale curve tables survived"

    # 4. the rebuild leg: re-suggest refreshes the geometry
    n_now = spark.read.parquet(idx_path).count()
    k_new, _ = suggest_ivf_params(n_now, 64, 0.6, rows_per_cell=50)
    assert k_new > len(centroid_rows), "geometry did not refresh at the grown scale"

    # 5. the advisor re-advises on FRESH curves and the gate still holds
    adv2 = ann_index_advisor(spark, sf_dir).collect()
    assert adv2 and all(r.achieved_recall_milli >= r.target_milli for r in adv2)
    recomputed = sorted(memo._SAVED)
    assert recomputed, "advisor did not rebuild its curve memos"
    for p in recomputed:
        if p in mtimes1:
            assert os.path.getmtime(p) > mtimes1[p], f"stale curve served: {p}"
