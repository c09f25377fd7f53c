"""Regression tests for the r11 fixes: the three ADVICE r10 bugs
(conversion-lag per-chunk fold, with_exact_ntile cardinality enforcement,
KMV stream/batch boundary) and the two VERDICT r10 scale conversions
(range-bucketed exact rank replacing the global windows in
customer_revenue_pareto / events_zorder_layout), plus drift bounds for
the new approx-quantile threshold twins."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r10 #1: conversion-lag must fold the WHOLE micro-batch time-sorted,
# not each Arrow chunk independently
# ---------------------------------------------------------------------------


def test_stream_conversion_lag_multichunk_group(spark, tmp_path):
    """A user's micro-batch rows split across several Arrow chunks (forced
    with maxRecordsPerBatch=1) with the purchase row AHEAD of the
    earlier-in-time signup row in delivery order. Sorting each chunk
    independently drops the conversion; the fixed fold (concat all
    chunks, one global time sort) must capture it."""
    from vectordb_hr_data_spark.streaming.stream_ops import (
        run_to_completion,
        stream_conversion_lag_state,
    )

    rows = [
        # purchase FIRST in file order, signup earlier in event time
        (1, "2024-01-02 00:00:00", 7, "purchase", 5.0, "{}"),
        (2, "2024-01-01 00:00:00", 7, "signup", None, "{}"),
        # a control user delivered in time order
        (3, "2024-01-01 00:00:00", 8, "signup", None, "{}"),
        (4, "2024-01-03 00:00:00", 8, "purchase", 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "mc_src")
    df.coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        stream = (
            spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        emitted = run_to_completion(
            stream_conversion_lag_state(stream), "mc_clag_state", output_mode="update"
        )
        got = {r.user_id: (r.s_us, r.lag_us) for r in emitted.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    day_us = 86_400_000_000
    assert got[7][1] == day_us, got  # one day signup->purchase lag captured
    assert got[8][1] == 2 * day_us, got


# ---------------------------------------------------------------------------
# ADVICE r10 #3: KMV stream/batch parity AT the K-distinct boundary
# ---------------------------------------------------------------------------


def test_stream_kmv_boundary_matches_batch(spark, tmp_path):
    """A source with EXACTLY K distinct tokens must report the exact
    count from BOTH the stream state and the batch query (the batch
    ``nd <= K`` branch). The state keeps K+1 smallest hashes so a
    just-full sketch is distinguishable from an overflowing one; sources
    below and above K pin the other two branches."""
    from vectordb_hr_data_spark.querydefs.dedup_queries import (
        KMV_K,
        kmv_distinct_sketch,
    )
    from vectordb_hr_data_spark.streaming.stream_ops import (
        kmv_from_state,
        stream_kmv_sketch,
    )

    def doc(i, source, toks):
        return (i, source, "en", " ".join(toks), source)

    rows = []
    # exactly K distinct tokens, split across two batches with overlap
    a = [f"a{i}" for i in range(KMV_K)]
    rows.append(doc(1, "s_atK", a[: KMV_K // 2 + 8]))
    rows.append(doc(2, "s_atK", a[KMV_K // 2 - 8 :]))
    # K-1 distinct
    b = [f"b{i}" for i in range(KMV_K - 1)]
    rows.append(doc(3, "s_under", b))
    rows.append(doc(4, "s_under", b[:10]))
    # 3K distinct
    c = [f"c{i}" for i in range(3 * KMV_K)]
    rows.append(doc(5, "s_over", c[: 2 * KMV_K]))
    rows.append(doc(6, "s_over", c[KMV_K :]))
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string, url string"
    )
    sf = tmp_path / "kmv_sf"
    sf.mkdir()
    df.write.parquet(str(sf / "documents.parquet"))

    import glob
    import os
    import shutil

    src = tmp_path / "kmv_b_src"
    src.mkdir()
    for i, part in enumerate((df.filter(F.col("doc_id") % 2 == 0), df.filter(F.col("doc_id") % 2 == 1))):
        tdir = str(tmp_path / f"kmv_b_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "kmv_b_state")
    stream_kmv_sketch(stream, state)

    got = {r.source: r.n_distinct_est for r in kmv_from_state(spark, state).collect()}
    want = {
        r.source: r.n_distinct_est
        for r in kmv_distinct_sketch(spark, str(sf)).collect()
    }
    assert got == want, (got, want)
    assert got["s_atK"] == KMV_K  # the exact boundary the r10 guard missed
    assert got["s_under"] == KMV_K - 1
    assert got["s_over"] != 3 * KMV_K  # estimate branch, same on both sides


# ---------------------------------------------------------------------------
# ADVICE r10 #2: with_exact_ntile enforces its cardinality contract in-plan
# ---------------------------------------------------------------------------


def test_with_exact_ntile_cardinality_guard_fires(spark, sf_dir):
    """Exceeding max_distinct must fail the query with the named error —
    never a silent broadcast of a value-dimension-sized table."""
    from vectordb_hr_data_spark.operators.quantiles import with_exact_ntile

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents")
    )
    df = with_exact_ntile(rev, 5, "cents", "o_custkey", "t", max_distinct=3)
    with pytest.raises(Exception, match="with_exact_ntile.*max_distinct"):
        df.collect()
    # and the default bound leaves bounded-cardinality callers untouched
    ok = with_exact_ntile(rev, 5, "cents", "o_custkey", "t")
    assert ok.count() == rev.count()


# ---------------------------------------------------------------------------
# VERDICT r10 items 2/4: the range-bucketed exact rank form
# ---------------------------------------------------------------------------


def test_with_exact_rank_range_matches_window(spark):
    """with_exact_rank_range / with_exact_ntile_range claim bit-equality
    with row_number()/ntile() OVER (ORDER BY value [DESC], tie) — pin it
    on adversarial frames: heavy ties, near-unique values, N < buckets,
    both directions."""
    import random

    from vectordb_hr_data_spark.operators.quantiles import (
        with_exact_ntile_range,
        with_exact_rank_range,
    )

    rng = random.Random(7)
    cases = [
        [(i, rng.randint(0, 5)) for i in range(97)],        # heavy ties
        [(i, rng.randint(0, 10**9)) for i in range(500)],   # near-unique
        [(i, 7) for i in range(31)],                        # all tie
        [(i, i % 3) for i in range(4)],                     # N < buckets
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "tid long, v long")
        for desc in (False, True):
            order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("tid").asc()]
            w = Window.orderBy(*order)
            want_rn = {r.tid: r.rn for r in df.select("tid", F.row_number().over(w).alias("rn")).collect()}
            got_rn = {
                r.tid: r.rn
                for r in with_exact_rank_range(df, "v", "tid", "rn", descending=desc)
                .select("tid", "rn")
                .collect()
            }
            assert got_rn == want_rn, (desc, len(rows))
            want_t = {r.tid: r.t for r in df.select("tid", F.ntile(10).over(w).cast("long").alias("t")).collect()}
            got_t = {
                r.tid: r.t
                for r in with_exact_ntile_range(df, 10, "v", "tid", "t", descending=desc)
                .select("tid", "t")
                .collect()
            }
            assert got_t == want_t, (desc, len(rows))


def test_zorder_file_ids_are_contiguous_thousand_blocks(spark, sf_dir):
    """The converted events_zorder_layout must still emit exact
    1000-row file blocks in zval order (ranks a true permutation) — the
    failure mode of the pid-based form was non-1000-row files."""
    from vectordb_hr_data_spark.querydefs.event_queries import (
        ZORDER_ROWS_PER_FILE,
        events_zorder_layout,
    )

    got = events_zorder_layout(spark, sf_dir).groupBy("file_id").count().collect()
    sizes = {r.file_id: r["count"] for r in got}
    n = sum(sizes.values())
    full, rem = divmod(n, ZORDER_ROWS_PER_FILE)
    for fid, sz in sizes.items():
        if fid < full:
            assert sz == ZORDER_ROWS_PER_FILE, sizes
        else:
            assert sz == rem, sizes


# ---------------------------------------------------------------------------
# VERDICT r10 item 5: threshold twins stay near their exact-rank forms
# ---------------------------------------------------------------------------


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / max(len(a | b), 1)


def test_dsir_threshold_drift_bounded(spark, sf_dir):
    """dsir_importance_threshold selects by an approx-quantile cutoff on
    the SAME shared scores as the exact-rank form — the kept sets may
    disagree only near the cut, so overlap stays high and every
    disagreement doc scores within the boundary band of the exact cut."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        dsir_importance_resample,
        dsir_importance_threshold,
    )

    exact = dsir_importance_resample(spark, sf_dir)
    kept_exact = {r.doc_id for r in exact.filter("selected").collect()}
    kept_thr = {r.doc_id for r in dsir_importance_threshold(spark, sf_dir).collect()}
    assert _jaccard(kept_exact, kept_thr) >= 0.8, (len(kept_exact), len(kept_thr))
    # disagreements sit at the score boundary: every symmetric-difference
    # doc scores within the band spanned by the two cut points
    scores = {
        r.doc_id: round(r.log_ratio * 1e6)
        for r in exact.select("doc_id", "log_ratio").collect()
    }
    if kept_exact != kept_thr:
        boundary_lo = min(
            min((scores[d] for d in kept_exact), default=0),
            min((scores[d] for d in kept_thr), default=0),
        )
        for d in kept_exact ^ kept_thr:
            assert scores[d] >= boundary_lo - 1


def test_quality_prep_threshold_drift_bounded(spark, sf_dir):
    """quality_prep_threshold runs the same five stages as the exact
    pipeline with both cuts as approx-quantile filters — the surviving
    doc sets must stay close (two stacked near-exact cuts)."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        quality_prep_pipeline,
        quality_prep_threshold,
    )

    kept_exact = {r.doc_id for r in quality_prep_pipeline(spark, sf_dir).collect()}
    kept_thr = {r.doc_id for r in quality_prep_threshold(spark, sf_dir).collect()}
    assert kept_exact and kept_thr
    assert _jaccard(kept_exact, kept_thr) >= 0.7, (len(kept_exact), len(kept_thr))


# ---------------------------------------------------------------------------
# B224/B225: batch HNSW-graph construction invariants + export round-trip
# ---------------------------------------------------------------------------


def test_hnsw_graph_structural_invariants(spark, sf_dir):
    """The built graph must carry HNSW's structural properties: per-layer
    degree caps (2M at layer 0, M above), layer-l neighbors only among
    nodes that exist at layer l, every non-isolated node present at every
    layer up to its level, and the stats header consistent with the
    graph (entry = max-level node, min id on ties)."""
    from vectordb_hr_data_spark.operators.hnsw import HNSW_M, hnsw_level_expr
    from vectordb_hr_data_spark.querydefs.vector_queries import (
        hnsw_graph_build,
        hnsw_graph_stats,
    )

    g = hnsw_graph_build(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    levels = {
        r.vec_id: r.level
        for r in emb.select("vec_id", hnsw_level_expr("vec_id").alias("level")).collect()
    }
    from collections import Counter

    deg = Counter()
    for r in g:
        deg[(r.vec_id, r.layer)] += 1
        # neighbor exists at this layer
        assert levels[r.neighbor_id] >= r.layer, (r.neighbor_id, r.layer)
        # node itself exists at this layer
        assert levels[r.vec_id] >= r.layer
        assert r.neighbor_id != r.vec_id
        assert r.d_q >= 0
    for (vid, layer), d in deg.items():
        cap = 2 * HNSW_M if layer == 0 else HNSW_M
        assert d <= cap, (vid, layer, d)
    # ranks are 1..deg contiguous per (node, layer)
    ranks = {}
    for r in g:
        ranks.setdefault((r.vec_id, r.layer), []).append(r.rk)
    for key, rks in ranks.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), key

    stats = {r.layer: r for r in hnsw_graph_stats(spark, sf_dir).collect()}
    max_level = max(levels.values())
    assert set(stats) == set(range(max_level + 1))
    edges_by_layer = Counter(r.layer for r in g)
    for layer, row in stats.items():
        assert row.n_nodes == sum(1 for v in levels.values() if v >= layer)
        assert row.n_edges == edges_by_layer.get(layer, 0)
    want_entry = min(
        (v for v in levels), key=lambda v: (-levels[v], v)
    )
    assert stats[0].entry_vec_id == want_entry
    assert stats[0].entry_level == max_level


def test_hnsw_export_roundtrip(spark, sf_dir, tmp_path):
    """export_hnsw_graph writes layer-partitioned parquet a serving
    process can read back layer-by-layer, byte-identical rows."""
    from vectordb_hr_data_spark.operators.hnsw import export_hnsw_graph
    from vectordb_hr_data_spark.querydefs.vector_queries import hnsw_graph_build

    g = hnsw_graph_build(spark, sf_dir)
    path = str(tmp_path / "hnsw_graph")
    export_hnsw_graph(g, path)
    back = spark.read.parquet(path)
    want = sorted(map(tuple, g.select("vec_id", "layer", "rk", "neighbor_id", "d_q").collect()))
    got = sorted(map(tuple, back.select("vec_id", "layer", "rk", "neighbor_id", "d_q").collect()))
    assert got == want
    # top layer is its own directory — a serving process loads it first
    import os

    layers = sorted(
        int(d.split("=")[1]) for d in os.listdir(path) if d.startswith("layer=")
    )
    assert layers and layers[0] == 0


def test_hnsw_search_recall_floor_and_shape(spark, sf_dir):
    """The probe-routed graph search must be a real ANN path, not a
    degenerate one: mean recall@10 vs exact brute force stays above 0.8
    on the synthetic corpus (measured 0.90 at nprobe=4/16), every query
    returns a full k list of distinct non-self candidates in
    non-decreasing distance order."""
    from vectordb_hr_data_spark.querydefs.vector_queries import (
        HNSW_EVAL_QUERIES,
        HNSW_SEARCH_K,
        hnsw_graph_search,
        hnsw_recall_eval,
    )

    rows = hnsw_graph_search(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(HNSW_EVAL_QUERIES))
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, HNSW_SEARCH_K + 1)), qid
        assert len({r.vec_id for r in rs}) == HNSW_SEARCH_K
        assert all(r.vec_id != qid for r in rs)
        dists = [r.d_q for r in rs]
        assert dists == sorted(dists), qid

    recalls = [r.recall_milli for r in hnsw_recall_eval(spark, sf_dir).collect()]
    assert sum(recalls) / len(recalls) >= 800, recalls
