"""Regression tests for the round-10 ADVICE fixes: degenerate corpora must
degrade to the oracle's answer (empty / 0 / NULL), never crash or diverge."""

from __future__ import annotations

import pyspark.sql.functions as F


def _write_docs(spark, path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(f"{path}/documents.parquet")


def test_ngram_novelty_short_docs_no_crash(spark, tmp_path):
    """B139: docs with fewer than 3 whitespace tokens must yield NO grams
    (like the oracle's range(1, len-1)), not throw
    INVALID_PARAMETER_VALUE.START from a descending sequence(0, -1)."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import doc_ngram_novelty

    d = str(tmp_path / "shortdocs")
    _write_docs(
        spark,
        d,
        [
            (1, "one", "en", "web", 3),
            (2, "two words", "en", "web", 9),
            (3, "", "en", "web", 0),
            (4, "a full trigram here now", "en", "web", 23),
        ],
    )
    rows = doc_ngram_novelty(spark, d).collect()
    # only doc 4 has >= 3 tokens -> only row; 3 distinct trigrams, all novel
    assert [r.doc_id for r in rows] == [4]
    assert rows[0].n_distinct_grams == 3 and rows[0].novelty_micro == 1000000


def test_funnel_zero_view_corpus_conv_ppm_zero(spark, tmp_path):
    """B59 + B147: a corpus with zero 'view' events divides by
    greatest(s1, 1) -> conv_ppm 0 on every stage, no NULL divergence."""
    from vectordb_hr_data_spark.querydefs.event_queries import (
        events_funnel_strict,
        events_funnel_windowed,
    )

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
         (2, "2024-01-01 11:00:00", 7, "purchase", 2.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "noview")
    ev.write.parquet(f"{d}/events.parquet")
    for q in (events_funnel_strict, events_funnel_windowed):
        out = q(spark, d).collect()
        assert len(out) == 3
        assert all(r.n_users == 0 and r.conv_ppm == 0 for r in out)


def test_rec_coverage_degenerate_catalog_null_ild(spark, tmp_path):
    """B154: a catalog where every rec list has one item produces no
    intra-list pairs -> mean_ild_micro must be NULL (the oracle's scalar
    subquery answer), not an int(None) TypeError."""
    from vectordb_hr_data_spark.querydefs.similarity_queries import (
        REC_EVAL_QUERIES,
        rec_coverage_diversity,
    )

    # 2-vector catalog: both are queries (vec_id < 10); each rec list holds
    # exactly the one OTHER vector -> no (a, b) pair with b.vec_id > a.vec_id
    # inside any list -> the ILD aggregate is empty.
    emb = spark.createDataFrame(
        [(0, [0.0, 1.0], 0), (1, [1.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    d = str(tmp_path / "tinycat")
    emb.write.parquet(f"{d}/embeddings.parquet")
    out = rec_coverage_diversity(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_queries == REC_EVAL_QUERIES
    assert r.n_recs_total == 2 and r.catalog_size == 2
    assert r.mean_ild_micro is None


def test_snapshot_diff_null_text_not_misclassified(spark, tmp_path):
    """B166: a document row with NULL text (NULL md5 on both sides) must
    classify by ROW presence like the oracle -- 'unchanged', never
    'added'/'removed' from hash NULL-ness."""
    from vectordb_hr_data_spark.querydefs.pipeline_queries import (
        SNAPSHOT_MOD,
        corpus_snapshot_diff,
    )

    # doc_id 1: present in both snapshots (1 % SNAPSHOT_MOD != 0), NULL text
    assert 1 % SNAPSHOT_MOD != 0
    d = str(tmp_path / "nulltext")
    _write_docs(
        spark,
        d,
        [
            (1, None, "en", "web", 0),
            (2, "stable text body", "en", "web", 16),
        ],
    )
    out = {r.source: r for r in corpus_snapshot_diff(spark, d).collect()}
    r = out["web"]
    # both rows exist in prev AND cur; nothing added/removed. doc 1's NULL
    # hash compares NULL <> NULL -> not 'changed' either (oracle semantics).
    assert r.n_added == 0 and r.n_removed == 0
    assert r.n_unchanged == 2 and r.n_changed == 0


def test_worker_entry_import_order_survives_partial_registry():
    """Python UDF workers re-import the package with the UDF's module as
    the entry point; mid-cycle, sibling querydef modules are partial and
    the registry incomplete. Entry via text_queries (the
    term_heavy_hitters worker path) must import cleanly — before the r10
    guard, scrub_queries' capstone KeyError'd here and crashed every
    text-module UDF worker."""
    import subprocess
    import sys

    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "import vectordb_hr_data_spark.querydefs.text_queries as t;"
            "print('entry-import ok')",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "entry-import ok" in r.stdout
