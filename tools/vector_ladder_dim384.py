"""Validate the vector-index compression ladder at the REFERENCE's real
dimension (VERDICT r4 #2): the reference embeds with all-MiniLM-L6-v2 at
dim 384 (reference config.py:16; header.bin = 1536 B/vector), while the
driver testdata is dim 64 — so the ladder's Arrow batch economics, codegen
width, and PQ geometry had only been measured at 1/6 the production row
width.

Synthesizes a dim-384 float32 corpus (default 100k rows, ~25× the sf0.1
row count) and measures every ladder rung with the SAME operators the
registry queries use — fit_ranges/sq8_* (dim-agnostic), pq_* (explicit
dim/m/k), persisted IVF with (k, n_probe) from suggest_ivf_params. Two
PQ geometries are measured side by side: the dim-64 demo constants
(m=8 → 48-dim subspaces, k=16) and the production geometry the 6× width
actually demands (m=48 → 8-dim subspaces, k=128; 128 not 256 because
codes are array<tinyint>). Flat-ADC for wide m rides the residual-ADC
Arrow kernel with a single zero centroid (q − 0 = q), since the unrolled
JVM lookup expression would re-materialize an m×k literal per row — the
measured literal-rematerialization cliff.

Also sweeps spark.sql.execution.arrow.maxRecordsPerBatch over the widest
Arrow path to check the 5000-row default (sized at dim 64) against 6×
wider rows.

Usage: python tools/vector_ladder_dim384.py [n_rows] [dim]
Prints the markdown tables recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

OUT = "/tmp/vector_ladder_dim384"
N_RECALL_QUERIES = 5


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def build_corpus(
    spark, n_rows: int, dim: int, clustered: bool = False, noise: float = 0.05
) -> str:
    """``clustered=False``: uniform — adversarial for PQ (concentration of
    measure; nearest neighbours barely closer than the median point).
    ``clustered=True``: a 64-component mixture whose within-cluster noise
    is LOW-RANK (16 latent dims) — the shape real MiniLM-style text
    embeddings have (intrinsic dimension in the tens). ``noise`` scales
    the latent basis: the default 0.05 gives per-dim within-cluster std
    ≈ 0.05·√16 = 0.2 (the on-distribution case); ~0.005 gives the TIGHT
    manifold where within-cluster gaps shrink below every ambient-space
    sketch's quantization noise — the stress bracket (project first /
    OPQ territory, r6 re-measurement of the r5 low-rank row)."""
    ntag = "" if noise == 0.05 else f"-n{noise}"
    path = f"{OUT}/corpus-{n_rows}-{dim}{('-mog16' + ntag) if clustered else ''}"
    if os.path.exists(path + "/_SUCCESS"):
        return path

    n_clusters, latent = 64, 16
    seed_rng = np.random.RandomState(99)
    centers = seed_rng.rand(n_clusters, dim).astype(np.float32)
    basis = (seed_rng.randn(latent, dim) * noise).astype(np.float32)

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def gen(ids: pd.Series) -> pd.Series:
        rng = np.random.RandomState(12345 + int(ids.iloc[0]) % 999983)
        if clustered:
            which = (ids.to_numpy() % n_clusters).astype(int)
            z = rng.randn(len(ids), latent).astype(np.float32)
            m = centers[which] + z @ basis
        else:
            m = rng.rand(len(ids), dim).astype(np.float32)
        return pd.Series(list(m))

    (
        spark.range(n_rows)
        .select(F.col("id").alias("vec_id"), gen(F.col("id")).alias("embedding"))
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def exact_qdist(query: list[float]) -> "F.Column":
    """Arrow GEMM exact squared-L2 — the scale path for the float32 rung
    (the expression-HOF scorer is the dim-64 oracle twin; at dim 384 the
    interpreted fold is ~10× slower, which is itself a finding)."""
    q = np.asarray(query, dtype=np.float64)
    qsq = float(q @ q)

    @F.pandas_udf(T.DoubleType())
    def qd(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(np.einsum("ij,ij->i", m, m) - 2.0 * (m @ q) + qsq)

    return qd(F.col("embedding"))


def topk(df, dist_col, k=10):
    return (
        df.select("vec_id", dist_col.alias("d"))
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(k)
    )


def timed(fn, warm=1, runs=3):
    for _ in range(warm):
        fn()
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return sorted(times)[len(times) // 2]


def main() -> int:
    from vectordb_hr_data_spark.operators.ivf import ivf_assign_gemm, suggest_ivf_params
    from vectordb_hr_data_spark.operators.knn import overfetch_count
    from vectordb_hr_data_spark.operators.pq import (
        pq_codebook,
        pq_codebook_kmeans,
        pq_encode_arrow,
        pq_encode_residual_arrow,
        pq_residual_qdist_arrow,
    )
    from vectordb_hr_data_spark.operators.quantize import (
        fit_ranges,
        sq4_encode_packed_arrow,
        sq4_qdist_packed_arrow,
        sq8_encode_arrow,
        sq8_qdist_codes_arrow,
    )
    from vectordb_hr_data_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    clustered = "--clustered" in sys.argv
    noise = 0.05
    for a in sys.argv:
        if a.startswith("--noise="):
            noise = float(a.split("=", 1)[1])
    spark = get_spark("ladder-384", cpus=16)
    corpus = build_corpus(spark, n_rows, dim, clustered=clustered, noise=noise)
    ntag = "" if noise == 0.05 else f"-n{noise}"
    tag = f"{n_rows}-{dim}" + (("-mog" + ntag) if clustered else "")
    emb = spark.read.parquet(corpus)
    queries = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < N_RECALL_QUERIES).orderBy("vec_id").collect()
    ]

    # trained state (once, like any index build)
    t0 = time.time()
    lo, hi = fit_ranges(emb, "embedding", dim)
    t_fit = time.time() - t0
    cb_demo = pq_codebook(emb, dim=dim, m=8, k=16)
    cb_prod = pq_codebook(emb, dim=dim, m=48, k=128)
    cb_prod256 = pq_codebook(emb, dim=dim, m=48, k=256)  # 8-bit codes via the −128 offset
    t0 = time.time()
    cb_learned = pq_codebook_kmeans(emb, dim=dim, m=48, k=128, sample_fraction=0.05)
    t_learn = time.time() - t0
    # Coarse quantizer provisioning is the whole game on clustered data
    # (r5 finding: strided centroids cover 4/64 clusters → IVF recall 0.00,
    # an artifact of the quantizer, not of PQ). On-distribution runs feed
    # the known cluster count through the tuning contract
    # (suggest_ivf_params n_clusters floor) and LEARN the centroids —
    # exactly what SCALE.md prescribes at 100 TB (estimate cluster count,
    # K = max(N/10k, ~clusters)). Uniform runs keep the strided demo
    # centroids so the r5 numbers stay reproducible.
    if clustered:
        from vectordb_hr_data_spark.operators.ivf import fit_centroids

        k_cells, n_probe = suggest_ivf_params(n_rows, dim, 0.6, n_clusters=64)
        t0 = time.time()
        cents = fit_centroids(emb, k=k_cells).localCheckpoint(eager=True)
        t_cents = time.time() - t0
        print(f"# learned {k_cells}-centroid coarse quantizer in {t_cents:.0f}s, probe {n_probe}")
    else:
        k_cells, n_probe = suggest_ivf_params(n_rows, dim, 0.6)
        stride = n_rows // k_cells
        cents = spark.createDataFrame(
            [
                (int(r.vec_id // stride), [float(x) for x in r.embedding])
                for r in emb.filter(
                    (F.col("vec_id") % stride == 0) & (F.expr(f"vec_id div {stride}") < k_cells)
                ).collect()
            ],
            "cid int, cvec array<double>",
        )
    cent_map = {r.cid: list(r.cvec) for r in cents.collect()}
    ZERO = {0: [0.0] * dim}  # flat ADC = residual ADC against a zero centroid

    # persisted payloads (zstd): what each rung's phase-1 scan READS
    payloads = {
        "float32": emb,
        "sq8": emb.select("vec_id", sq8_encode_arrow("embedding", lo, hi).alias("codes")),
        "sq4": emb.select("vec_id", sq4_encode_packed_arrow("embedding", lo, hi).alias("pk")),
        "pq-demo": emb.select(
            "vec_id", pq_encode_arrow("embedding", cb_demo, dim=dim, m=8).alias("rc")
        ).withColumn("cid", F.lit(0)),
        "pq-prod": emb.select(
            "vec_id", pq_encode_arrow("embedding", cb_prod, dim=dim, m=48).alias("rc")
        ).withColumn("cid", F.lit(0)),
        "pq-prod256": emb.select(
            "vec_id", pq_encode_arrow("embedding", cb_prod256, dim=dim, m=48).alias("rc")
        ).withColumn("cid", F.lit(0)),
        "pq-learned": emb.select(
            "vec_id", pq_encode_arrow("embedding", cb_learned, dim=dim, m=48).alias("rc")
        ).withColumn("cid", F.lit(0)),
    }
    sizes = {}
    for name, df in payloads.items():
        p = f"{OUT}/pay-{name}-{tag}"
        if not os.path.exists(p + "/_SUCCESS"):
            df.write.mode("overwrite").option("compression", "zstd").parquet(p)
        sizes[name] = du(p)

    idx = f"{OUT}/ivfsq8-{tag}"
    if not os.path.exists(idx + "/_SUCCESS"):
        a = ivf_assign_gemm(emb, cents)
        a.select(
            "vec_id", "embedding", sq8_encode_arrow("embedding", lo, hi).alias("codes"), "cid"
        ).write.partitionBy("cid").mode("overwrite").option("compression", "zstd").parquet(idx)

    def pay(name):
        return spark.read.parquet(f"{OUT}/pay-{name}-{tag}")

    def rerank(cand, query):
        surv = emb.join(F.broadcast(cand), "vec_id")
        return [r.vec_id for r in topk(surv, exact_qdist(query)).collect()]

    def exact_run(query):
        return [r.vec_id for r in topk(emb, exact_qdist(query)).collect()]

    def sq8_run(query):
        cand = topk(
            pay("sq8"), sq8_qdist_codes_arrow("codes", lo, hi, query), overfetch_count(10)
        ).select("vec_id")
        return rerank(cand, query)

    def sq4_run(query):
        cand = topk(
            pay("sq4"), sq4_qdist_packed_arrow("pk", lo, hi, query), overfetch_count(10)
        ).select("vec_id")
        return rerank(cand, query)

    def probe_of(query):
        return sorted(
            cent_map, key=lambda c: sum((a - b) ** 2 for a, b in zip(query, cent_map[c]))
        )[:n_probe]

    def ivf_run(query):
        probe = probe_of(query)
        scan = spark.read.parquet(idx).filter(F.col("cid").isin(probe))
        cand = topk(
            scan.select("vec_id", "codes"),
            sq8_qdist_codes_arrow("codes", lo, hi, query),
            overfetch_count(10),
        ).select("vec_id")
        surv = scan.join(F.broadcast(cand), "vec_id")
        return [r.vec_id for r in topk(surv, exact_qdist(query)).collect()]

    # OPQ rung (r6): eigen-allocated PCA rotation learned from a bounded
    # sample, applied as one GEMM per Arrow batch, then the SAME learned-
    # codebook PQ machinery in the rotated space; candidates re-ranked
    # exactly in the ORIGINAL space (rotation is an isometry). This is the
    # "project first" escape hatch for the tight-manifold flat-PQ erosion.
    from vectordb_hr_data_spark.operators.opq import pca_rotation_fit, project_arrow

    t0 = time.time()
    opq_rot = pca_rotation_fit(emb, dim=dim, m=48, sample_n=min(n_rows, 20_000))
    rot_frame = emb.select("vec_id", project_arrow("embedding", opq_rot).alias("rotv"))
    cb_opq = pq_codebook_kmeans(
        rot_frame, dim=dim, m=48, k=128, vec_col="rotv", sample_fraction=0.05
    )
    t_opq = time.time() - t0
    opq_pay_path = f"{OUT}/pay-opq-{tag}"
    if not os.path.exists(opq_pay_path + "/_SUCCESS"):
        rot_frame.select(
            "vec_id", pq_encode_arrow("rotv", cb_opq, dim=dim, m=48).alias("rc")
        ).withColumn("cid", F.lit(0)).write.mode("overwrite").option(
            "compression", "zstd"
        ).parquet(opq_pay_path)
    sizes["opq"] = du(opq_pay_path)
    opq_rmat = np.asarray(opq_rot)

    def opq_run(query):
        rq = [float(x) for x in opq_rmat @ np.asarray(query, dtype=np.float64)]
        cand = topk(
            spark.read.parquet(opq_pay_path),
            pq_residual_qdist_arrow("rc", "cid", ZERO, cb_opq, rq, dim=dim, m=48),
            overfetch_count(10),
        ).select("vec_id")
        return rerank(cand, query)

    # Bitsketch rung (r6): 1 bit/dim sign sketch over a seeded rotation —
    # dim/32 packed bigint halves, phase-1 = xor+popcount JVM codegen only.
    from vectordb_hr_data_spark.operators.bitsketch import (
        hamming_distance_n,
        signature_half,
        signature_half_driver,
    )
    from vectordb_hr_data_spark.operators.opq import seeded_rotation

    n_halves = dim // 32
    bs_rot = seeded_rotation(dim, seed=7)
    bs_rmat = np.asarray(bs_rot)
    bs_pay_path = f"{OUT}/pay-bitsketch-{tag}"
    if not os.path.exists(bs_pay_path + "/_SUCCESS"):
        brot = emb.select("vec_id", project_arrow("embedding", bs_rot).alias("rotv"))
        brot.select(
            "vec_id",
            *[signature_half("rotv", h).alias(f"sig{h}") for h in range(n_halves)],
        ).write.mode("overwrite").option("compression", "zstd").parquet(bs_pay_path)
    sizes["bitsketch"] = du(bs_pay_path)

    def bitsketch_run(query):
        rq = bs_rmat @ np.asarray(query, dtype=np.float64)
        qsigs = [signature_half_driver(rq, h) for h in range(n_halves)]
        cand = (
            spark.read.parquet(bs_pay_path)
            .select(
                "vec_id",
                hamming_distance_n([f"sig{h}" for h in range(n_halves)], qsigs).alias("hd"),
            )
            .orderBy(F.col("hd").asc(), F.col("vec_id").asc())
            .limit(200)
            .select("vec_id")
        )
        return rerank(cand, query)

    def pq_run_factory(name, cbk, m):
        def run(query):
            cand = topk(
                pay(name),
                pq_residual_qdist_arrow("rc", "cid", ZERO, cbk, query, dim=dim, m=m),
                overfetch_count(10),
            ).select("vec_id")
            return rerank(cand, query)

        return run

    # residual IVFADC at the production geometry: deterministic residual
    # codebook from 128 mid-corpus rows' residuals vs their assigned
    # centroid, plus the LEARNED residual codebook (per-subspace k-means on
    # the residual frame — the actual faiss IVF,PQ training recipe)
    assigned = ivf_assign_gemm(emb, cents)
    res_rows = (
        assigned.filter(F.col("vec_id").between(1000, 1127))
        .select("vec_id", "embedding", "cid")
        .orderBy("vec_id")
        .collect()
    )
    res_cb = [
        [float(a) - cent_map[int(r.cid)][i] for i, a in enumerate(r.embedding)]
        for r in res_rows
    ]
    cents_b = assigned.sparkSession.createDataFrame(
        sorted(cent_map.items()), "cid int, cvec array<double>"
    )
    res_frame = assigned.join(F.broadcast(cents_b), "cid").select(
        F.zip_with(
            F.col("embedding").cast("array<double>"), F.col("cvec"), lambda a, b: a - b
        ).alias("resv")
    )
    t0 = time.time()
    res_cb_learned = pq_codebook_kmeans(
        res_frame, dim=dim, m=48, k=128, vec_col="resv", sample_fraction=0.05
    )
    t_rlearn = time.time() - t0

    def res_run_factory(cbk):
        def run(query):
            probe = probe_of(query)
            pc = {c: cent_map[c] for c in probe}
            scan = spark.read.parquet(idx).filter(F.col("cid").isin(probe))
            coded = scan.select(
                "vec_id",
                "embedding",
                "cid",
                pq_encode_residual_arrow("embedding", "cid", pc, cbk, dim=dim, m=48).alias("rc"),
            )
            cand = topk(
                coded,
                pq_residual_qdist_arrow("rc", "cid", pc, cbk, query, dim=dim, m=48),
                overfetch_count(10),
            ).select("vec_id")
            surv = scan.join(F.broadcast(cand), "vec_id")
            return [r.vec_id for r in topk(surv, exact_qdist(query)).collect()]

        return run

    res_run = res_run_factory(res_cb)
    res_run_learned = res_run_factory(res_cb_learned)

    exact_sets = {}
    for qi, q in enumerate(queries):
        exact_sets[qi] = set(exact_run(q))

    rungs = [
        ("float32 exact (GEMM)", exact_run, sizes["float32"], 1.0),
        ("SQ8 rerank", sq8_run, sizes["sq8"], 1.0),
        ("SQ4 nibble-packed rerank", sq4_run, sizes["sq4"], 1.0),
        (f"IVF{k_cells}+SQ8 (probe {n_probe})", ivf_run, sizes["sq8"], n_probe / k_cells),
        ("PQ m=8,k=16 (demo const)", pq_run_factory("pq-demo", cb_demo, 8), sizes["pq-demo"], 1.0),
        ("PQ m=48,k=128 (prod)", pq_run_factory("pq-prod", cb_prod, 48), sizes["pq-prod"], 1.0),
        ("PQ m=48,k=256 (8-bit offset)", pq_run_factory("pq-prod256", cb_prod256, 48), sizes["pq-prod256"], 1.0),
        (f"PQ m=48,k=128 LEARNED ({t_learn:.0f}s fit)", pq_run_factory("pq-learned", cb_learned, 48), sizes["pq-learned"], 1.0),
        (f"OPQ(PCA-alloc)+PQ m=48,k=128 ({t_opq:.0f}s fit)", opq_run, sizes["opq"], 1.0),
        ("bitsketch 1-bit/dim + Hamming (overfetch 200)", bitsketch_run, sizes["bitsketch"], 1.0),
        (f"residual IVFADC m=48 (probe {n_probe})", res_run, sizes["pq-prod"], n_probe / k_cells),
        (
            f"residual IVFADC m=48 LEARNED ({t_rlearn:.0f}s fit, probe {n_probe})",
            res_run_learned,
            sizes["pq-learned"],
            n_probe / k_cells,
        ),
    ]
    print(
        f"\n| rung | scan B/vec (zstd) | × corpus frac read | recall@10 (mean of {N_RECALL_QUERIES}) "
        f"| warm median s |  (n={n_rows}, dim={dim}; fit_ranges {t_fit:.1f}s)"
    )
    print("|---|---|---|---|---|")
    for name, fn, sz, frac in rungs:
        recs = [len(set(fn(q)) & exact_sets[qi]) / 10 for qi, q in enumerate(queries)]
        med = timed(lambda: fn(queries[0]))
        print(
            f"| {name} | {sz / n_rows:.0f} | {frac:.2f} | {sum(recs) / len(recs):.2f} | {med:.2f} |"
        )

    print("\n| maxRecordsPerBatch | SQ8 scan median s | (widest Arrow path)")
    print("|---|---|")
    for batch in (1000, 5000, 20000):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        med = timed(lambda: sq8_run(queries[0]))
        print(f"| {batch} | {med:.2f} |")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
