"""Physical-plan audits: the properties that keep these queries viable at
100 TB must be visible in the executed plan, not assumed.

- filters reach the parquet scan (PushedFilters)
- small dims broadcast (BroadcastHashJoin), the probe side never shuffles
  for them
- global top-k lowers to TakeOrderedAndProject (per-partition heaps, no
  full sort)
- a doc_type-partitioned index prunes partitions on the doc_type filter
"""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.relational_queries import q6_forecast_revenue

    plan = _plan(q6_forecast_revenue(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q3_broadcasts_dimensions(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.relational_queries import q3_shipping_priority

    plan = _plan(q3_shipping_priority(spark, sf_dir))
    # both joins broadcast the dim side; the fact side (lineitem) must
    # never be shuffled for a join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_topk_is_take_ordered(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.similarity_queries import ann_text_search

    plan = _plan(ann_text_search(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no standalone global sort node


def test_chunk_ann_is_generate_plus_take_ordered(spark, sf_dir):
    """Chunk-granular retrieval must stay shuffle-free: explode + narrow
    projection + TakeOrderedAndProject, no Exchange besides the top-k."""
    from vectordb_hr_data_spark.querydefs.similarity_queries import chunk_ann_search

    plan = _plan(chunk_ann_search(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Generate explode" in plan
    assert "Exchange" not in plan


def test_column_pruning_reads_needed_columns_only(spark, sf_dir):
    from vectordb_hr_data_spark.querydefs.vector_queries import knn_topk_l2sq

    plan = _plan(knn_topk_l2sq(spark, sf_dir))
    scan = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "embedding" in scan and "vec_id" in scan
    assert "label" not in scan  # unused column must be pruned


def test_ivf_assign_is_map_side(spark, sf_dir):
    """The IVF centroid assignment must be a pure projection: no Exchange
    at all (the r2 form cross-joined then windowed on vec_id, shuffling the
    k-times-replicated corpus — VERDICT r2 item 1)."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.ivf import ivf_assign

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    plan = _plan(ivf_assign(emb, cents))
    assert "Exchange" not in plan
    assert "Window" not in plan


def test_ivf_assign_gemm_matches_expression(spark, sf_dir):
    """The BLAS argmin fast path must produce the identical assignment as
    the oracle-exact expression form, ties included."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.ivf import ivf_assign, ivf_assign_gemm

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    expr = {r.vec_id: r.cid for r in ivf_assign(emb, cents).select("vec_id", "cid").collect()}
    gemm = {r.vec_id: r.cid for r in ivf_assign_gemm(emb, cents).select("vec_id", "cid").collect()}
    assert expr == gemm


def test_batch_topk_exchange_is_pre_reduced(spark, sf_dir):
    """The per-query rank's exchange must consume the partial-top-k output
    (MapInPandas), not the full N×Q scored stream (VERDICT r2 item 3)."""
    from vectordb_hr_data_spark.querydefs.similarity_queries import batch_topk_many_queries

    plan = _plan(batch_topk_many_queries(spark, sf_dir))
    assert "MapInPandas" in plan
    # the hash exchange feeding the window sits ABOVE the local reducer in
    # the plan tree (printed plan lists parents first)
    exch = plan.index("Exchange hashpartitioning")
    assert plan.index("MapInPandas") > exch
    assert "Window" in plan


def test_local_topk_per_key_matches_global(spark):
    """Partial top-k then global rank must equal the direct global answer,
    including boundary ties."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.operators.knn import local_topk_per_key

    rows = [(i % 4, i, float((i * 7) % 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "key int, vid int, d double").repartition(8)
    got = sorted(
        map(tuple, local_topk_per_key(df, "key", ("d", "vid"), 5).collect())
    )
    exact = sorted(
        (r.key, r.vid, r.d)
        for r in df.collect()
    )
    import itertools

    expect = []
    keyf = lambda t: t[0]
    for key, grp in itertools.groupby(sorted(exact, key=lambda t: (t[0], t[2], t[1])), key=keyf):
        g = list(grp)[:5 * df.rdd.getNumPartitions()]  # local union is a superset
        expect.append((key, g))
    # global top-5 per key must be contained in the local-topk union
    for key, g in expect:
        top5 = [t for t in g][:5]
        for t in top5:
            assert tuple(t) in set(got)


def test_topk_per_key_expr_matches_window_and_arrow_twin(spark):
    """The pure-expression per-key top-k must equal BOTH the window-rank
    exact answer and the Arrow pre-reduce + window composition, ties
    included (VERDICT r3 item 5: twins parity-tested, picked per
    call-site)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.operators.knn import local_topk_per_key, topk_per_key_expr

    rows = [(i % 7, i, float((i * 13) % 23) / 7.0) for i in range(500)]
    df = spark.createDataFrame(rows, "key int, vid int, d double").repartition(8)

    expr_got = sorted(map(tuple, topk_per_key_expr(df, "key", ("d", "vid"), 4).collect()))

    w = Window.partitionBy("key").orderBy(F.col("d").asc(), F.col("vid").asc())
    exact = sorted(
        map(
            tuple,
            df.withColumn("rn", F.row_number().over(w)).filter("rn <= 4").drop("rn").collect(),
        )
    )
    arrow_got = sorted(
        map(
            tuple,
            local_topk_per_key(df, "key", ("d", "vid"), 4)
            .withColumn("rn", F.row_number().over(w))
            .filter("rn <= 4")
            .drop("rn")
            .collect(),
        )
    )
    assert expr_got == exact == arrow_got


def test_batch_topk_per_label_plan_has_no_python(spark, sf_dir):
    """knn_batch_topk_per_label must be pure JVM: hash aggregate +
    explode, no Arrow/Pandas node, no Window (VERDICT r3 item 5)."""
    from vectordb_hr_data_spark.querydefs.vector_queries import knn_batch_topk_per_label

    plan = _plan(knn_batch_topk_per_label(spark, sf_dir))
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_sq8_plan_codegens_around_arrow_eval(spark, sf_dir):
    """VERDICT r3 #1: the SQ8 query's plan must contain whole-stage-codegen
    stages (the ``*(n)`` prefix in the simple plan string) — the quantized
    math runs in ONE ArrowEvalPython, and the scan/project stages around it
    stay codegen'd instead of the fully interpreted HOF plan r3 shipped."""
    from vectordb_hr_data_spark.querydefs.vector_queries import knn_topk_sq8

    plan = _plan(knn_topk_sq8(spark, sf_dir))
    assert "*(" in plan  # WholeStageCodegen stages present
    assert "ArrowEvalPython" in plan
    assert "TakeOrderedAndProject" in plan
    assert "zip_with" not in plan and "aggregate(" not in plan


def test_sq8_arrow_twin_is_bit_exact(spark, sf_dir):
    """``sq8_qdist_arrow`` must equal the expression composition
    ``l2sq(sq8_reconstruct(sq8_encode(v)))`` EXACTLY (no rounding slack)
    over the whole corpus — the parity pin that lets the registry query
    ride the Arrow path while the DuckDB oracle mirrors the expressions."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.functions import vector as V
    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.quantize import (
        fit_ranges,
        sq8_encode,
        sq8_qdist_arrow,
        sq8_reconstruct,
    )
    from vectordb_hr_data_spark.querydefs.vector_queries import _query_vec

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    q = _query_vec(spark, sf_dir)
    expr = V.l2sq(sq8_reconstruct(sq8_encode("embedding", lo, hi), lo, hi), F.lit([float(x) for x in q]))
    arrow = sq8_qdist_arrow("embedding", lo, hi, q)
    mismatches = emb.select(expr.alias("e"), arrow.alias("a")).filter(F.col("e") != F.col("a")).count()
    assert mismatches == 0


def test_ivf_indexed_probe_prunes_partitions(spark, sf_dir):
    """The persisted-IVF probe must read only the n_probe cid partitions:
    PartitionFilters carries `cid IN (...)` with exactly N_PROBE ids
    (VERDICT r3 item 7 — prune checked on the executed plan of the real
    registry query, whose RESULT is also oracle-checked)."""
    import re

    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        N_PROBE,
        ivf_topk_indexed_query,
    )

    plan = _plan(ivf_topk_indexed_query(spark, sf_dir))
    m = re.search(r"PartitionFilters: \[cid#\d+ IN \(([^)]*)\)\]", plan)
    assert m, plan
    assert len(m.group(1).split(",")) == N_PROBE


def test_chunk_ivf_build_is_map_only_and_probe_prunes(spark, sf_dir):
    """chunk→embed→IVF (VERDICT r3 item 6): everything up to the
    partitioned write is map-only (explode + projections, zero Exchange),
    and the probe read prunes to N_PROBE cid partitions."""
    import re

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.operators.ivf import ivf_assign
    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        N_CENTROIDS,
        N_PROBE,
        _chunk_embed_df,
        chunk_embed_ivf_search,
    )

    chunks = _chunk_embed_df(spark, sf_dir)
    cents = chunks.filter((F.col("chunk_idx") == 0) & (F.col("doc_id") < N_CENTROIDS)).select(
        F.col("doc_id").cast("int").alias("cid"), F.col("v").alias("cvec")
    )
    build_plan = _plan(ivf_assign(chunks, cents, id_col="doc_id", vec_col="v"))
    assert "Exchange" not in build_plan
    assert "Generate explode" in build_plan

    probe_plan = _plan(chunk_embed_ivf_search(spark, sf_dir))
    m = re.search(r"PartitionFilters: \[cid#\d+ IN \(([^)]*)\)\]", probe_plan)
    assert m, probe_plan
    assert len(m.group(1).split(",")) == N_PROBE


def test_ivf_sq8_index_scans_prune_partitions_and_columns(spark, sf_dir):
    """The IVF16+SQ8 persisted-index capstone must show BOTH prunings in
    its executed plan: each of the two FileScans reads only the n_probe
    cid partitions, phase 1 reads ONLY the byte codes (no float column),
    phase 2 ONLY the float vectors (no codes) — 1 byte/dim over
    n_probe/16 of the corpus is the whole point at 100 TB."""
    import re

    from vectordb_hr_data_spark.querydefs.vector_queries import ivf_sq8_rerank_indexed

    plan = _plan(ivf_sq8_rerank_indexed(spark, sf_dir))
    pf = re.findall(r"PartitionFilters: \[cid#\d+ IN \(([^)]*)\)\]", plan)
    assert len(pf) == 2 and all(len(p.split(",")) == 4 for p in pf), plan
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    codes_scans = [s for s in schemas if "codes" in s]
    vec_scans = [s for s in schemas if "embedding" in s]
    assert len(codes_scans) == 1 and "embedding" not in codes_scans[0]
    assert len(vec_scans) == 1 and "codes" not in vec_scans[0]


def test_doc_type_partition_pruning(spark, tmp_path):
    """The written index is partitioned by doc_type; a doc_type equality
    filter must prune at the source (the Spark form of the reference's
    where={'doc_type': t} index-side filter)."""
    from tests.test_hr_pipeline import _mk_corpus
    from vectordb_hr_data_spark.pipeline import build_index
    from vectordb_hr_data_spark.schemas import EMPLOYEE_SCHEMA, JOB_SCHEMA

    emps, jobs = _mk_corpus()
    out = str(tmp_path / "idx")
    build_index(
        spark.createDataFrame(emps, EMPLOYEE_SCHEMA),
        spark.createDataFrame(jobs, JOB_SCHEMA),
        out_path=out,
    )
    from pyspark.sql import functions as F

    df = spark.read.parquet(out).filter(F.col("doc_type") == "employee").select("id")
    plan = _plan(df)
    # partition filter shows up as PartitionFilters on the scan
    assert "PartitionFilters" in plan
    section = plan.split("PartitionFilters:")[1][:200]
    assert "doc_type" in section


def test_sq8_encode_arrow_is_bit_exact(spark, sf_dir):
    """The vectorized build-path encoder must produce byte-identical codes
    to the expression twin over the whole corpus (span==0 branch included)."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.quantize import (
        fit_ranges,
        sq8_encode,
        sq8_encode_arrow,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    # force a span==0 dimension through both paths as well
    lo2 = list(lo); hi2 = list(hi); hi2[0] = lo2[0]
    for l, h in ((lo, hi), (lo2, hi2)):
        bad = (
            emb.select(
                sq8_encode("embedding", l, h).alias("e"),
                sq8_encode_arrow("embedding", l, h).alias("a"),
            )
            .filter(F.col("e") != F.col("a"))
            .count()
        )
        assert bad == 0


def test_ivf_pq_index_scans_prune_partitions_and_columns(spark, sf_dir):
    """faiss IVF16,PQ8 analogue: both FileScans pruned to n_probe cid
    partitions; phase 1 reads ONLY the 8-byte pqcodes column, phase 2 ONLY
    the float vectors."""
    import re

    from vectordb_hr_data_spark.querydefs.vector_queries import ivf_pq_adc_indexed

    plan = _plan(ivf_pq_adc_indexed(spark, sf_dir))
    pf = re.findall(r"PartitionFilters: \[cid#\d+ IN \(([^)]*)\)\]", plan)
    assert len(pf) == 2 and all(len(p.split(",")) == 4 for p in pf), plan
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    codes_scans = [s for s in schemas if "pqcodes" in s]
    vec_scans = [s for s in schemas if "embedding" in s]
    assert len(codes_scans) == 1 and "embedding" not in codes_scans[0]
    assert len(vec_scans) == 1 and "pqcodes" not in vec_scans[0]


def test_residual_det_plan_shape(spark, sf_dir):
    """The hash-checked residual IVFADC twin: both phases lower to
    TakeOrderedAndProject (per-partition heaps, no global sort), and the
    only Python boundaries are the two Arrow kernels (residual encode +
    per-cid ADC) — the assignment argmin stays a JVM expression."""
    from vectordb_hr_data_spark.querydefs.vector_queries import ivf_pq_residual_det

    plan = _plan(ivf_pq_residual_det(spark, sf_dir))
    assert plan.count("TakeOrderedAndProject") == 2, plan
    assert plan.count("ArrowEvalPython") == 2, plan
    assert "CartesianProduct" not in plan


def test_filtered_ivf_prunes_partitions_and_pushes_predicate(spark, sf_dir):
    """Filtered ANN over the persisted index must do BOTH prunings in one
    scan: PartitionFilters = the n_probe probed cids AND the metadata
    equality pushed to the parquet reader — the composition that makes
    pre-filtering free when the index is a table."""
    import re

    from vectordb_hr_data_spark.querydefs.similarity_queries import ivf_topk_prefiltered

    plan = _plan(ivf_topk_prefiltered(spark, sf_dir))
    pf = re.findall(r"PartitionFilters: \[cid#\d+ IN \(([^)]*)\)\]", plan)
    assert len(pf) == 1 and len(pf[0].split(",")) == 4, plan
    assert "EqualTo(label,3)" in plan, plan
    assert "TakeOrderedAndProject" in plan


def test_r6_quality_ops_broadcast_and_stay_jvm(spark, sf_dir):
    """The r6 quality/selection operators must keep their 100 TB shape:
    count-table joins broadcast (never shuffle the corpus-sized side for
    a vocabulary-sized dim), and no Python/Arrow eval nodes appear — the
    scoring paths are whole-stage-codegen expression work."""
    from vectordb_hr_data_spark.queries import REGISTRY

    for name, wants_bhj in [
        ("doc_lm_perplexity", True),
        ("dsir_importance_resample", True),
        ("doc_quality_classifier", False),  # weights derive per-row, no join
        ("doc_dup_ngram_coverage", True),   # dup-gram set joins back to spans
    ]:
        plan = _plan(REGISTRY[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        if wants_bhj:
            assert "BroadcastHashJoin" in plan, name


def test_token_budget_sample_single_domain_exchange(spark, sf_dir):
    """source_token_budget_sample: exactly one hashpartitioning exchange
    (the window on the domain key) before the presentation sort — the
    running sum must not introduce extra shuffles."""
    import re

    from vectordb_hr_data_spark.queries import REGISTRY

    plan = _plan(REGISTRY["source_token_budget_sample"].fn(spark, sf_dir))
    # rangepartitioning for the final orderBy is presentation-only; the
    # real work shuffles once on source
    hashes = re.findall(r"Exchange hashpartitioning\(source", plan)
    assert len(hashes) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_simhash_hamming_band_join_is_hash_join(spark, sf_dir):
    """neardup_simhash_hamming: the banded candidate join must be a hash
    join on (band_id, band_val) — never a nested-loop/cartesian — and the
    Hamming predicate rides as its residual condition."""
    from vectordb_hr_data_spark.queries import REGISTRY

    plan = _plan(REGISTRY["neardup_simhash_hamming"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan  # broadcast or shuffled, either is fine
    assert "band_val" in plan


def test_sq4_pack_arrow_is_bit_exact_and_unpack_roundtrips(spark, sf_dir):
    """SQ4 (r6): the Arrow build-path encoder must produce byte-identical
    packed codes to the expression twin (span==0 branch included), the
    Arrow packed-distance must equal the distance computed from the
    expression reconstruction, and shift/mask unpack must round-trip the
    codes exactly."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.quantize import (
        fit_ranges,
        sq4_codes,
        sq4_encode_packed_arrow,
        sq4_pack,
        sq4_qdist_packed_arrow,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    # force a span==0 dimension through both paths
    lo2 = list(lo); hi2 = list(hi); hi2[0] = lo2[0]
    expr = emb.select(
        "vec_id", sq4_pack(sq4_codes("embedding", lo2, hi2)).alias("pk")
    )
    arrow = emb.select("vec_id", sq4_encode_packed_arrow("embedding", lo2, hi2).alias("pk"))
    a = {r.vec_id: r.pk for r in expr.collect()}
    b = {r.vec_id: r.pk for r in arrow.collect()}
    assert a == b
    # unpack round-trip + distance parity on the real ranges
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    codes = emb.select("vec_id", sq4_codes("embedding", lo, hi).alias("c4"))
    packed = codes.select("vec_id", "c4", sq4_pack("c4").alias("pk"))
    rows = packed.withColumn(
        "qd", sq4_qdist_packed_arrow("pk", lo, hi, q)
    ).collect()
    for r in rows:
        u = [b + 128 for b in r.pk]
        unpacked = []
        for byte in u:
            unpacked.extend([byte >> 4, byte & 15])
        assert unpacked == list(r.c4), r.vec_id
        recon = [l + ci / 15.0 * (h - l) for ci, l, h in zip(unpacked, lo, hi)]
        acc = 0.0
        for rc, qi in zip(recon, q):
            d = rc - float(qi)
            acc = acc + d * d
        assert abs(acc - r.qd) < 1e-9, r.vec_id


def test_sq4_encode_clamps_out_of_range_vectors(spark, sf_dir):
    """Regression (ADVICE r6): vectors OUTSIDE the trained [lo, hi] range
    (new data encoded against persisted quantizer state) must clamp to
    codes 0..15 like faiss's SQ4 — an unclamped code corrupts BOTH
    nibbles of the packed byte. Both the expression twin and the Arrow
    build path must agree and stay well-defined."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.operators.quantize import (
        fit_ranges,
        sq4_codes,
        sq4_encode_packed_arrow,
        sq4_pack,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    lo, hi = fit_ranges(emb, "embedding", 64)
    # scale the corpus 3x so most dims overshoot hi (and undershoot lo)
    wild = emb.select(
        "vec_id", F.expr("transform(embedding, x -> x * 3.0)").alias("embedding")
    )
    codes = {r.vec_id: r.c4 for r in wild.select("vec_id", sq4_codes("embedding", lo, hi).alias("c4")).collect()}
    assert any(c in (0, 15) for c4 in codes.values() for c in c4)  # clamp exercised
    for c4 in codes.values():
        assert all(0 <= c <= 15 for c in c4)
    expr = {r.vec_id: r.pk for r in wild.select("vec_id", sq4_pack(sq4_codes("embedding", lo, hi)).alias("pk")).collect()}
    arrow = {r.vec_id: r.pk for r in wild.select("vec_id", sq4_encode_packed_arrow("embedding", lo, hi).alias("pk")).collect()}
    assert expr == arrow
    for vid, pk in expr.items():
        for byte, c0, c1 in zip(pk, codes[vid][0::2], codes[vid][1::2]):
            u = byte + 128
            assert (u >> 4, u & 15) == (c0, c1)


def test_registry_wide_plan_invariants(spark, sf_dir):
    """Global guard over EVERY registry query's physical plan: no
    CartesianProduct (an unbounded all-pairs join would be fatal at
    100 TB) and no BatchEvalPython (row-at-a-time Python in a hot path —
    Arrow-batched ArrowEvalPython/MapInPandas are the sanctioned Python
    escapes). Catches regressions the per-query plan tests don't cover."""
    from vectordb_hr_data_spark.queries import REGISTRY

    offenders = {}
    for name, spec in REGISTRY.items():
        try:
            plan = _plan(spec.fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - surface the real error
            offenders[name] = f"plan build failed: {e}"
            continue
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython")
        if bad:
            offenders[name] = ",".join(bad)
    assert not offenders, offenders


def test_ivf_sq4_index_scans_prune_partitions_and_columns(spark, sf_dir):
    """The IVF16+SQ4 composition (r6) must show the same two prunings as
    its SQ8 sibling: both FileScans read only the n_probe cid partitions,
    phase 1 reads ONLY the packed nibble codes (0.5 byte/dim — half of
    SQ8's scan), phase 2 ONLY the float vectors."""
    import re

    from vectordb_hr_data_spark.querydefs.vector_queries import ivf_sq4_rerank_indexed

    plan = _plan(ivf_sq4_rerank_indexed(spark, sf_dir))
    pf = re.findall(r"PartitionFilters: \[cid#\d+ IN \(([^)]*)\)\]", plan)
    assert len(pf) == 2 and all(len(p.split(",")) == 4 for p in pf), plan
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    code_scans = [s for s in schemas if "pk" in s]
    vec_scans = [s for s in schemas if "embedding" in s]
    assert len(code_scans) == 1 and "embedding" not in code_scans[0]
    assert len(vec_scans) == 1 and "pk" not in vec_scans[0]


def test_quality_prep_pipeline_plan_shape(spark, sf_dir):
    """quality_prep_pipeline (B40): the VISIBLE composed plan (the
    localCheckpoint fan-out boundaries truncate earlier stages into RDD
    leaves) must keep the final stages' shape: the DSIR count tables join
    BROADCAST, no Python eval nodes, no cartesian products."""
    from vectordb_hr_data_spark.queries import REGISTRY

    plan = _plan(REGISTRY["quality_prep_pipeline"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_build_shares_one_user_partitioning(spark, sf_dir):
    """events_scd2_user_state (B48, r7): every window and the run
    aggregation partition on user_id, so the physical plan must contain
    exactly ONE hashpartitioning exchange on user_id (plus only the
    presentation ORDER BY's range exchange) — the single-shuffle claim in
    the docstring, pinned."""
    from vectordb_hr_data_spark.queries import REGISTRY

    plan = _plan(REGISTRY["events_scd2_user_state"].fn(spark, sf_dir))
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 1, plan
    assert "user_id" in plan.split("Exchange hashpartitioning", 1)[1].split("\n", 1)[0]


def test_zorder_and_matryoshka_plans_are_clean(spark, sf_dir):
    """r7 plan hygiene: the Z-order assignment's only exchanges are the
    1-row extremes broadcast and the rank/order windows (no Python nodes
    at all — the interleave is integer codegen); matryoshka's two phases
    both lower to TakeOrderedAndProject with no Exchange or Python."""
    from vectordb_hr_data_spark.queries import REGISTRY

    zplan = _plan(REGISTRY["events_zorder_layout"].fn(spark, sf_dir))
    assert "EvalPython" not in zplan and "MapInPandas" not in zplan
    assert "BroadcastExchange" in zplan  # the extremes frame

    mplan = _plan(REGISTRY["knn_matryoshka_rerank"].fn(spark, sf_dir))
    assert mplan.count("TakeOrderedAndProject") == 2, mplan
    assert "EvalPython" not in mplan and "Exchange hashpartitioning" not in mplan


def _has_ntile_window(plan: str) -> bool:
    """True iff the plan carries the ntile() WINDOW FUNCTION — not the
    substring: with_exact_ntile's in-plan cardinality guard embeds its own
    name in the assert_true message, and approx_percentile( also contains
    'ntile('."""
    import re

    return re.search(r"(?<![\w.])ntile\(", plan) is not None


def _unpartitioned_windows(df):
    """Walk the executed plan; return [(node, has_aggregate_below)] for
    every WindowExec whose partitionSpec is empty (single-partition sort)."""
    out = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if "WindowExec" in cls or "WindowGroupLimitExec" in cls:
            try:
                empty = node.partitionSpec().isEmpty()
            except Exception:
                empty = False
            if empty:
                agg_below = "HashAggregate" in node.toString()[node.toString().find("\n") :]
                out.append((cls, agg_below))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


@pytest.mark.parametrize(
    "qname",
    [
        "doc_k_anonymity_audit",
        "events_user_rfm",
        "doc_equidepth_bins",
        "source_curriculum_order",
        "curriculum_token_budget",
        # r11 conversions (VERDICT r10 items 2 and 4): range-bucketed
        # exact-rank forms — near-unique value columns, so no ntile AND
        # nothing value-dimension-sized broadcast either
        "customer_revenue_pareto",
        "events_zorder_layout",
    ],
)
def test_exact_ntile_queries_have_no_global_window_over_base_rows(spark, sf_dir, qname):
    """r10 scale fix (VERDICT r9 items 2-3): the quantile-bucket queries
    must not sort the full frame through one task. The ntile is replaced
    by the exact-rank two-form, so (a) no ntile survives in the plan and
    (b) any remaining unpartitioned window runs strictly over an
    AGGREGATED (bounded-cardinality) table — a HashAggregate sits below
    it — never over base rows."""
    from vectordb_hr_data_spark.queries import REGISTRY

    df = REGISTRY[qname].fn(spark, sf_dir)
    plan = _plan(df)
    assert not _has_ntile_window(plan), plan[:1500]
    for cls, agg_below in _unpartitioned_windows(df):
        assert agg_below, f"{qname}: unpartitioned {cls} over non-aggregated input"


# Registered queries whose plans carry a DOCUMENTED unpartitioned window
# over non-aggregated input, each citing its bounded-frame contract. Empty
# today: the r11 sweep converted the last offenders (customer_revenue_pareto,
# events_zorder_layout). A new entry requires the query docstring to state
# why the windowed frame is bounded at 100 TB.
UNPARTITIONED_WINDOW_ALLOWLIST: dict[str, str] = {}


def test_registry_wide_no_unpartitioned_window_over_base_rows(spark, sf_dir):
    """VERDICT r10 item 3: the per-query ntile audits only guard NAMED
    queries — B222 reintroduced the global-window shape one round after
    the discipline was written. This sweep walks EVERY registered query's
    physical plan and asserts each empty-partitionSpec WindowExec sits
    above a HashAggregate (a bounded-cardinality aggregate table — the
    sanctioned two-form shape) or appears in the explicit allowlist with
    its bounded-frame contract."""
    from vectordb_hr_data_spark.queries import REGISTRY

    offenders = {}
    for name, spec in REGISTRY.items():
        if name in UNPARTITIONED_WINDOW_ALLOWLIST:
            continue
        try:
            wins = _unpartitioned_windows(spec.fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - surface the real error
            offenders[name] = f"plan build failed: {e}"
            continue
        viol = [cls for cls, agg_below in wins if not agg_below]
        if viol:
            offenders[name] = viol
    assert not offenders, offenders


def test_rfm_streaming_read_path_shares_batch_scorer(spark, sf_dir, tmp_path):
    """VERDICT r9 item 6 (RFM half): the streaming read path must reuse
    rfm_quintile_scores — scoring parity can't drift — and therefore
    carries no global ntile window either."""
    import pyspark.sql.functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.querydefs.event_queries import events_user_rfm
    from vectordb_hr_data_spark.streaming.stream_ops import rfm_from_state

    ev = read_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("t1")).collect()[0].t1
    state = str(tmp_path / "rfm_state")
    (
        ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).cast("long").alias("last_t"),
            F.count("*").cast("long").alias("f_n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("m_cents"),
        )
        .write.parquet(state)
    )
    got = rfm_from_state(spark, state, mx)
    assert not _has_ntile_window(_plan(got))
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in events_user_rfm(spark, sf_dir).collect()
    ]


def test_with_exact_ntile_matches_builtin_ntile_exactly(spark):
    """operators/quantiles.with_exact_ntile claims bit-equality with
    ntile(n) OVER (ORDER BY value, tie) — pin it on adversarial frames:
    heavy ties, N < n, N == n, N % n != 0, descending order, and a
    single-value column (every row ties)."""
    import random

    from pyspark.sql import Window
    import pyspark.sql.functions as F

    from vectordb_hr_data_spark.operators.quantiles import with_exact_ntile

    rng = random.Random(42)
    cases = [
        [(i, rng.randint(0, 5)) for i in range(97)],   # heavy ties, N%n != 0
        [(i, rng.randint(0, 1000)) for i in range(500)],  # mostly unique
        [(i, 7) for i in range(31)],                   # single value: all tie
        [(i, i % 3) for i in range(4)],                # N < n
        [(i, rng.randint(0, 2)) for i in range(10)],   # N == n
    ]
    for n in (5, 10):
        for rows in cases:
            df = spark.createDataFrame(rows, "tid long, v long")
            for desc in (False, True):
                order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("tid").asc()]
                want = df.select(
                    "tid", F.ntile(n).over(Window.orderBy(*order)).cast("long").alias("t")
                )
                got = with_exact_ntile(df, n, "v", "tid", "t", descending=desc).select(
                    "tid", "t"
                )
                w = {r.tid: r.t for r in want.collect()}
                g = {r.tid: r.t for r in got.collect()}
                assert g == w, (n, desc, len(rows))


def test_r10_new_op_plans_are_clean(spark, sf_dir):
    """r10 plan hygiene for the B177-B200 batch: no Python eval nodes, no
    cartesian products, broadcasts where claimed, top-k lowered."""
    from vectordb_hr_data_spark.queries import REGISTRY

    # DSAR: tomb keys broadcast, no cartesian
    p = _plan(REGISTRY["dsar_access_report"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p

    # fingerprint / integrity / reconciliation: pure JVM map+agg, no Python
    for q in (
        "source_corpus_fingerprint",
        "multimodal_payload_integrity",
        "orders_reconciliation_audit",
        "dedup_normalization_dividend",
    ):
        p = _plan(REGISTRY[q].fn(spark, sf_dir))
        assert "EvalPython" not in p and "MapInPandas" not in p, q
        assert "CartesianProduct" not in p, q

    # hotlist + rank fusion: global top-N lowers to TakeOrderedAndProject
    for q in ("boilerplate_shingle_hotlist", "quality_rank_fusion"):
        p = _plan(REGISTRY[q].fn(spark, sf_dir))
        assert "TakeOrderedAndProject" in p, q

    # rank fusion: the three decile rankings carry NO ntile (exact-rank
    # two-form) and no unpartitioned window over non-aggregated input
    p = _plan(REGISTRY["quality_rank_fusion"].fn(spark, sf_dir))
    assert not _has_ntile_window(p)
    for cls, agg_below in _unpartitioned_windows(
        REGISTRY["quality_rank_fusion"].fn(spark, sf_dir)
    ):
        assert agg_below, f"quality_rank_fusion: unpartitioned {cls}"


def test_hnsw_index_memo_and_layer_pruned_search(spark, sf_dir):
    """VERDICT r11 item 2: the HNSW query path searches the PERSISTED
    layer-partitioned export, never a per-call rebuild — (a) the memo
    builds once per (corpus, process) and a second ensure is a no-op,
    (b) a single-layer read prunes to that layer's partition directory,
    (c) the executed search plan scans the persisted index path with a
    layer-pruned PartitionFilter (the layer-0 ef-expansion scans; upper
    layers are consumed into the eagerly-checkpointed frontier hops)."""
    import os
    import re

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.querydefs.vector_queries import (
        _ensure_hnsw_index,
        _hnsw_index_path,
        hnsw_graph_search,
    )

    nodes, g = _ensure_hnsw_index(spark, sf_dir)
    plan = _plan(g.filter(F.col("layer") == 3))
    assert re.search(r"PartitionFilters: \[[^\]]*layer#\d+ = 3", plan), plan

    success = os.path.join(_hnsw_index_path(sf_dir), "graph", "_SUCCESS")
    mt = os.path.getmtime(success)
    _ensure_hnsw_index(spark, sf_dir)
    assert os.path.getmtime(success) == mt  # memo hit: no rewrite

    splan = _plan(hnsw_graph_search(spark, sf_dir))
    assert "spark_graft_hnsw" in splan, "search does not read the persisted index"
    assert re.search(r"PartitionFilters: \[[^\]]*layer#\d+ = 0", splan), splan
