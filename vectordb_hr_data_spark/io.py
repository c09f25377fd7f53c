"""Sources and sinks.

The driver testdata is parquet (TESTDATA.md); the reference's native
source is one multi-line nested JSON file (reference ``data_loader.py:28-29``)
and its sink is a ChromaDB collection upsert (reference
``vector_db.py:163-168``) — here the "collection" is a parquet dataset
partitioned by ``doc_type`` so doc_type predicates become partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/projections into it.

    CONTRACT: reading ``events`` sets two session confs on the CALLER's
    session for the rest of its lifetime — ``nanosAsLong=true`` and
    ``session.timeZone=UTC``. Sessions built via ``session.get_spark``
    already carry both (no-op there); for a plain external session (the
    driver's) the UTC pin changes timestamp rendering/parsing semantics
    from that point on. That is deliberate: every query and oracle in this
    repo assumes UTC instants, and a half-UTC session would be worse.

    ``events.ts`` has shipped in two physical forms across testdata
    generations, both normalized here to a session-UTC TIMESTAMP so every
    downstream query sees one type:

    - TIMESTAMP(NANOS): Spark surfaces it as int64 nanos
      (``spark.sql.legacy.parquet.nanosAsLong``); converted with exact
      integer division (ns epoch exceeds double precision, no float math).
    - timestamp[us] with isAdjustedToUTC=false: Spark 4 infers
      TIMESTAMP_NTZ, which rejects numeric casts (breaks epoch-seconds
      arithmetic) and differs from the LTZ semantics the oracles assume;
      cast to TIMESTAMP — with the session pinned to UTC this maps
      wall-clock to the same instant DuckDB reads natively.
    """
    from pyspark.sql import types as T

    if name == "events":
        # settable at runtime, and required for ANY session reading this
        # table (the caller may pass a plain session — e.g. the driver's)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the NTZ→LTZ cast below is instant-correct only under UTC; pin it
        # here too so a plain non-UTC caller session can't read shifted
        # instants that diverge from the DuckDB oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV source with an explicit schema (never inferSchema in production —
    inference is a second full scan and type-unstable)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (columnar, pushdown-capable like parquet)."""
    return spark.read.orc(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TESTDATA_TABLES) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name in tables:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_hr_json(spark: SparkSession, path: str, key: str, schema) -> DataFrame:
    """Entity extraction from the reference's single nested JSON file.

    Mirrors ``_load_specific_data_from_integrated_file`` (reference
    ``data_loader.py:15-49``): pull ``data[key]`` (a JSON array of records)
    and tolerate a missing key / malformed file by returning an empty frame
    rather than raising.
    """
    from pyspark.sql import types as T

    wrapper = T.StructType([T.StructField(key, T.ArrayType(schema), True)])
    try:
        raw = spark.read.schema(wrapper).option("multiLine", True).option("mode", "PERMISSIVE").json(path)
        out = raw.select(F.explode_outer(F.col(key)).alias("rec")).select("rec.*")
        return out.filter(F.col("id").isNotNull())
    except Exception:
        return spark.createDataFrame([], schema)


def _hadoop_fs(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for ``path`` via the JVM gateway — works for
    file://, hdfs://, s3a://, any scheme on the classpath (shutil is
    local-only and would silently break remote URIs)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def merge_upsert(spark: SparkSession, path: str, updates: DataFrame, key: str = "id") -> None:
    """Incremental last-wins upsert into a parquet dataset without Delta
    (guide: 'MERGE INTO … emulate with anti-join + union'): keep existing
    rows whose key is NOT in the update set (left_anti), union the updates,
    rewrite. Matches the reference's ``collection.upsert`` semantics
    (``vector_db.py:163-168``) — new keys insert, existing keys are
    replaced by the update row. With Delta on the classpath this becomes a
    real MERGE INTO and avoids the full rewrite.

    Crash-safety: the swap is rename-aside (path → path._old, staging →
    path, delete ._old) through the Hadoop FileSystem API, so every
    intermediate state keeps a complete copy of either the old or the new
    dataset, and non-local URIs (hdfs://, s3a://) work. A leftover ._old
    from a previous crash is recovered (restored if the live dir vanished,
    else discarded) before merging.
    """
    fs, live, jvm = _hadoop_fs(spark, path)
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._old")
    if fs.exists(old):
        if fs.exists(live):
            fs.delete(old, True)  # previous swap completed; stale backup
        elif not fs.rename(old, live):
            # previous swap died mid-way and the rollback ALSO failed: ._old
            # holds the only copy of the dataset. Falling through would read
            # nothing, overwrite with just the updates, and a later call
            # would delete ._old as "stale" — silent data loss (ADVICE r02).
            raise IOError(
                f"merge_upsert: crash recovery failed — cannot rename {old} back to {path}; "
                "the pre-crash dataset lives only in ._old, refusing to proceed"
            )
    try:
        existing = spark.read.parquet(path)
    except Exception:
        updates.write.mode("overwrite").parquet(path)
        return
    kept = existing.join(updates.select(key).distinct(), key, "left_anti")
    merged = kept.unionByName(updates, allowMissingColumns=True)
    # self-overwrite requires a materialization barrier with plain parquet
    staging_str = path.rstrip("/") + "._staging"
    merged.write.mode("overwrite").parquet(staging_str)
    staging = jvm.org.apache.hadoop.fs.Path(staging_str)
    if not fs.rename(live, old):
        raise IOError(f"merge_upsert: failed to rename {path} aside")
    if not fs.rename(staging, live):
        fs.rename(old, live)  # restore — the old dataset is still intact
        raise IOError(f"merge_upsert: failed to move staging into {path}")
    fs.delete(old, True)


def merge_upsert_bucketed(
    spark: SparkSession, path: str, updates: DataFrame, key: str = "id", n_buckets: int = 16
) -> list[int]:
    """Incremental last-wins upsert that rewrites ONLY the touched
    partitions (VERDICT r2 item 7: the anti-join+union emulation rewrites
    the full target per merge — a full-table write per batch at 100 TB).

    The dataset is laid out partitioned by ``_kb = pmod(xxhash64(key),
    n_buckets)``. A merge computes the update's bucket set (tiny distinct),
    reads just those partitions (partition pruning), anti-joins within
    them, and writes back with DYNAMIC partition overwrite — partitions
    absent from the update batch keep their files byte-identical (asserted
    in tests/test_merge_and_bucketing.py). Write amplification drops from
    O(|table|) to O(|table| · touched/n_buckets); size n_buckets so a
    typical batch touches a minority of buckets.

    The merged touched-bucket rows are localCheckpoint-ed (eager) before
    the overwrite: lineage is truncated, so the write can never recompute
    from the partitions it is replacing — a lost executor fails the job
    instead of corrupting it. Delta's MERGE INTO subsumes this when its
    jars are on the classpath. Returns the touched bucket ids.
    """
    bucket = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).cast("int")
    upd = updates.withColumn("_kb", bucket)
    fs, live, _ = _hadoop_fs(spark, path)
    if not fs.exists(live):
        upd.write.mode("overwrite").partitionBy("_kb").parquet(path)
        return sorted(r._kb for r in upd.select("_kb").distinct().collect())
    touched = sorted(r._kb for r in upd.select("_kb").distinct().collect())
    existing = spark.read.parquet(path).filter(F.col("_kb").isin(touched))
    kept = (
        existing.drop("_kb")
        .join(upd.select(key).distinct(), key, "left_anti")
        .withColumn("_kb", bucket)
    )
    merged = kept.unionByName(upd, allowMissingColumns=True).localCheckpoint(True)
    mode_before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("_kb").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode_before)
    return touched


def write_bucketed_table(
    df: DataFrame, name: str, bucket_col: str, n_buckets: int = 8, sort_col: str | None = None
) -> None:
    """Bucketed managed table: pre-shuffles once at write so later joins /
    aggregations on ``bucket_col`` between co-bucketed tables need NO
    exchange (the cluster-scale answer to repeated fact-fact joins)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(name)


def register_index_table(spark: SparkSession, name: str, path: str) -> None:
    """Collection DDL (SURVEY.md A15): expose a stored index as a catalog
    table/view — the Spark analogue of get_or_create_collection."""
    spark.read.parquet(path).createOrReplaceTempView(name)


def drop_index_table(spark: SparkSession, name: str) -> bool:
    """delete_collection analogue; True if the view existed."""
    return spark.catalog.dropTempView(name)


def write_index(df: DataFrame, path: str, partition_by: str = "doc_type") -> None:
    """Index sink: last-wins-by-id dedup then partitioned parquet overwrite.

    The reference upserts with last-wins semantics per id (reference
    ``vector_db.py:163-168``); without Delta on the classpath the idiomatic
    batch equivalent is a deterministic full overwrite of a dataset that is
    already deduplicated by key. Partitioning by ``doc_type`` makes the
    reference's ``where={'doc_type': t}`` pre-filter (reference
    ``talent_recommender.py:31-40``) a partition-pruned scan at any scale.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("_ingest_order").desc())
    if "_ingest_order" in df.columns:
        deduped = (
            df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn", "_ingest_order")
        )
    else:
        deduped = df.dropDuplicates(["id"])
    # sort by id within each doc_type partition: parquet row-group min/max
    # stats then prune id point-lookups inside a partition
    deduped.sortWithinPartitions(partition_by, "id").write.mode("overwrite").partitionBy(
        partition_by
    ).parquet(path)


def write_training_shards(
    docs: DataFrame,
    out_path: str,
    n_shards: int = 8,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The data-loader handoff sink (the write side of B31's seeded
    shuffle/shard): one balanced exchange on the shard key, per-shard
    seeded order, ``partitionBy(shard)`` parquet layout (the
    tfrecord/webdataset shape — a loader streams shard directories
    independently), plus a ``_manifest`` directory recording per-shard
    row and token counts (what an epoch scheduler reads; written from the
    SAME frame so it cannot drift from the data).

    Returns the manifest frame. At 100 TB: the exchange carries each row
    once on a uniform md5-derived key; the manifest aggregate is
    shard-count-sized; nothing collects to the driver."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":shuffle:{seed}")))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % n_shards).cast("int")
    keyed = docs.withColumn("skey", key).withColumn("shard", shard)
    ordered = keyed.repartition(n_shards, "shard").sortWithinPartitions("shard", "skey", id_col)
    ordered.write.mode("overwrite").partitionBy("shard").parquet(out_path)
    manifest = (
        keyed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col(text_col), " "))).cast("long").alias("n_tokens"),
        )
        .orderBy("shard")
    )
    manifest.write.mode("overwrite").parquet(out_path.rstrip("/") + "/_manifest")
    return manifest


# ---------------------------------------------------------------------------
# Trained quantizer state persistence (r6) — the write_index/read_index
# analog for the ladder's trained artifacts: SQ ranges, PQ codebooks, OPQ
# rotations. Everything a serving session needs to encode/score WITHOUT
# re-fitting: doubles round-trip parquet bit-exactly, so codes produced
# from reloaded state are hash-identical to the training session's.
# ---------------------------------------------------------------------------
def save_quantizer_state(
    spark: SparkSession,
    path: str,
    sq_ranges: tuple[list[float], list[float]] | None = None,
    pq_codebook: list[list[float]] | None = None,
    rotation: list[list[float]] | None = None,
) -> None:
    """Persist trained quantizer artifacts as one typed parquet frame:
    (artifact, i, j, vec). Artifacts absent from the call are absent from
    the frame; ``load_quantizer_state`` returns exactly what was saved."""
    rows: list[tuple[str, int, int, list[float]]] = []
    if sq_ranges is not None:
        lo, hi = sq_ranges
        rows.append(("sq_lo", 0, 0, [float(x) for x in lo]))
        rows.append(("sq_hi", 0, 0, [float(x) for x in hi]))
    if pq_codebook is not None:
        # repo codebook shape: k full-dim codewords (operators/pq.py —
        # subspace views slice them at encode time)
        for c, vec in enumerate(pq_codebook):
            rows.append(("pq", c, 0, [float(x) for x in vec]))
    if rotation is not None:
        for i, row in enumerate(rotation):
            rows.append(("rot", i, 0, [float(x) for x in row]))
    if not rows:
        raise ValueError("nothing to save")
    spark.createDataFrame(
        rows, "artifact string, i int, j int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_quantizer_state(spark: SparkSession, path: str) -> dict:
    """Reload artifacts saved by ``save_quantizer_state``. Returns a dict
    with any of 'sq_ranges' (lo, hi), 'pq_codebook', 'rotation'."""
    rows = spark.read.parquet(path).collect()
    by = {}
    for r in rows:
        by.setdefault(r.artifact, []).append(r)
    out: dict = {}
    if "sq_lo" in by:
        out["sq_ranges"] = (list(by["sq_lo"][0].vec), list(by["sq_hi"][0].vec))
    if "pq" in by:
        out["pq_codebook"] = [list(r.vec) for r in sorted(by["pq"], key=lambda r: r.i)]
    if "rot" in by:
        out["rotation"] = [list(r.vec) for r in sorted(by["rot"], key=lambda r: r.i)]
    return out


def compact_clustered(
    spark: SparkSession,
    path: str,
    sort_cols: list[str],
    rows_per_file: int,
    staging_suffix: str = "._compact",
) -> tuple[int, int]:
    """OPTIMIZE-style compaction: rewrite a parquet dataset's many small
    files into ~rows/rows_per_file files CLUSTERED on ``sort_cols`` —
    with a Z-order key column (events_zorder_layout's zval) this is the
    native-Spark form of Delta's OPTIMIZE ZORDER, restoring both the IO
    amortization a firehose of small appends destroyed AND the
    multi-column file-skipping locality. Mechanism: repartitionByRange on
    the sort key (range boundaries from Spark's reservoir sampling — no
    global sort) + sortWithinPartitions + maxRecordsPerFile; the rewrite
    goes through a staging dir + rename swap so readers never see a
    PARTIALLY WRITTEN dataset. The swap itself is two renames, so a
    concurrent read in that window can transiently fail with
    FileNotFound (and on object stores like S3A, rename is a non-atomic
    copy — production targets there need a transactional table format,
    e.g. Delta/Iceberg, for a truly atomic swap). Returns
    (files_before, files_after)."""
    import math

    fs, live, jvm = _hadoop_fs(spark, path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    files_before = df.select(F.input_file_name()).distinct().count()
    n_part = max(1, math.ceil(n_rows / (rows_per_file * 4)))
    staging_str = path.rstrip("/") + staging_suffix
    (
        df.repartitionByRange(n_part, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.option("maxRecordsPerFile", rows_per_file)
        .mode("overwrite")
        .parquet(staging_str)
    )
    staging = jvm.org.apache.hadoop.fs.Path(staging_str)
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._old")
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(live, old):
        raise IOError(f"compact_clustered: cannot move {path} aside")
    if not fs.rename(staging, live):
        fs.rename(old, live)  # roll back
        raise IOError(f"compact_clustered: cannot swap staging into {path}")
    fs.delete(old, True)
    after = spark.read.parquet(path)
    files_after = after.select(F.input_file_name()).distinct().count()
    return files_before, files_after
