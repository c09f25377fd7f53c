"""Property-based invariants (SURVEY.md §5.2 layer 4) via hypothesis.

Spark jobs are too slow for per-example pytest×hypothesis loops, so the
strategy generates SMALL corpora once per property and asserts the
invariant over all rows — each property still explores randomized
shapes/sizes across runs (seeded for reproducibility).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vectordb_hr_data_spark.embed import _hash_vec

RNG = random.Random(42)
WORDS = ["spark", "query", "join", "scan", "merge", "sort", "table", "row", "batch", "stream"]


def _random_docs(n: int) -> list[tuple[int, str]]:
    return [
        (i, " ".join(RNG.choice(WORDS) for _ in range(RNG.randint(3, 30)))) for i in range(n)
    ]


def test_topk_subset_of_overfetch(spark):
    """top-k results are always a subset of the over-fetched candidate set
    (k ≤ overfetch width, same ordering keys)."""
    from vectordb_hr_data_spark.operators.knn import knn_topk, overfetch_count

    rows = [(i, _hash_vec(f"v{i}", 8)) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = _hash_vec("query", 8)
    for k in (1, 3, 5):
        wide = {r["vec_id"] for r in knn_topk(df, q, k=overfetch_count(k)).collect()}
        narrow = {r["vec_id"] for r in knn_topk(df, q, k=k).collect()}
        assert narrow <= wide


def test_union_count_is_sum(spark):
    from vectordb_hr_data_spark.operators.hr import tagged_union

    for ne, nj in [(0, 5), (7, 0), (13, 4)]:
        e = spark.createDataFrame([(f"E{i}",) for i in range(ne)], "id string")
        j = spark.createDataFrame([(f"J{i}",) for i in range(nj)], "id string")
        u = tagged_union(e, j)
        assert u.count() == ne + nj
        by_type = {r["doc_type"]: r["n"] for r in u.groupBy("doc_type").agg(F.count("*").alias("n")).collect()}
        assert by_type.get("employee", 0) == ne and by_type.get("job", 0) == nj


def test_dedup_idempotent(spark):
    """Deduplicating an already-deduplicated corpus is a no-op."""
    docs = _random_docs(50) + _random_docs(20)  # RNG may produce collisions
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = df.dropDuplicates(["text"])
    twice = once.dropDuplicates(["text"])
    assert once.count() == twice.count()
    assert once.count() == df.select("text").distinct().count()


def test_rerank_stable_under_ties(spark):
    """Rows with equal reasoning count order by distance then id — repeated
    evaluation must give identical order (determinism the reference gets
    from Python's stable sort, SURVEY §7.4 #4)."""
    from vectordb_hr_data_spark.operators.hr import rerank

    rows = [
        (f"id{i}", ["r"] * (i % 3), float(i % 7) / 10)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id string, reasoning array<string>, distance double")
    a = [r["id"] for r in rerank(df, 10).collect()]
    b = [r["id"] for r in rerank(df, 10).collect()]
    assert a == b
    # and the ordering key actually holds
    got = rerank(df, 40).collect()
    keys = [(-len(r["reasoning"]), r["distance"], r["id"]) for r in got]
    assert keys == sorted(keys)


def test_flatten_roundtrips_scalars(spark):
    from vectordb_hr_data_spark.operators.hr import flatten_metadata

    rows = [(1, "a", 2.5, True, None)]
    df = spark.createDataFrame(rows, "i long, s string, d double, b boolean, n string")
    out = flatten_metadata(df).collect()[0]
    assert (out["i"], out["s"], out["d"], out["b"], out["n"]) == rows[0]


def test_minhash_probability_approximates_jaccard(spark):
    """Single-hash MinHash collision rate ≈ Jaccard (the property the
    min-shingle blocking relies on): for identical sets it's 1, for
    disjoint sets 0."""
    from vectordb_hr_data_spark.functions import texthash as H

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    toks = df.select("doc_id", F.expr(H.spark_tokens("text")).alias("toks"))
    sh = toks.select("doc_id", F.array_min(F.expr(H.spark_shingles("toks"))).alias("mn"))
    got = {r["doc_id"]: r["mn"] for r in sh.collect()}
    assert got[1] == got[2] and got[1] != got[3]


def test_simhash_fold_and_vote_mechanisms_agree(spark, sf_dir):
    """The two simhash MECHANISMS in the repo must compute the same
    signature from the same feature set: `doc_simhash`'s 32-fold
    expression (fine for small distinct-token arrays) and
    `neardup_simhash_hamming`'s explode→codegen-vote-sum form (the shape
    that scales to shingle arrays). Run both over the same distinct-token
    features for every document and assert bit-equality."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.functions import texthash as H
    from vectordb_hr_data_spark.io import read_table

    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("toks"))
    hashed = t.select("doc_id", F.expr(H.spark_hash_array("toks")).alias("hashes"))
    fold = {
        r.doc_id: r.sh
        for r in hashed.select(
            "doc_id", F.expr(H.spark_simhash("hashes")).cast("bigint").alias("sh")
        ).collect()
    }
    ex = t.select("doc_id", F.explode("toks").alias("tok")).select(
        "doc_id", F.expr(H.spark_str_hash_fast("tok")).alias("h")
    )
    votes = ex.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(32)
        ]
    )
    sh_expr = None
    for b in range(32):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("bigint")
        sh_expr = bit if sh_expr is None else sh_expr + bit
    vote = {r.doc_id: r.sh for r in votes.select("doc_id", sh_expr.cast("bigint").alias("sh")).collect()}
    assert fold == vote


def test_no_docstring_eaten_by_template_chain():
    """VERDICT r8 #2: `\"\"\"...\"\"\".replace(...)` as a function's first
    statement silently discards the docstring (__doc__ is None). The fix
    assigns the templated string to __doc__ after the def; this sweep
    keeps the pattern from coming back anywhere in the package."""
    import ast
    import pathlib

    import vectordb_hr_data_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for p in root.rglob("*.py"):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef) and node.body:
                first = node.body[0]
                if not isinstance(first, ast.Expr) or not isinstance(first.value, ast.Call):
                    continue
                r = first.value
                while isinstance(r, ast.Call) and isinstance(r.func, ast.Attribute):
                    r = r.func.value
                if isinstance(r, ast.Constant) and isinstance(r.value, str):
                    offenders.append(f"{p}:{node.lineno} {node.name}")
    assert offenders == []


def test_exact_ntile_forms_agree_on_random_frames(spark):
    """r11 property sweep: on randomized frames (varying size, value
    skew, tie density) the broadcast two-form, the range-bucketed form,
    and the built-in ntile window all agree BIT-FOR-BIT, in both
    directions — the bucketed forms additionally for several bucket
    counts so boundary placement provably cannot move a rank."""
    from pyspark.sql import Window

    from vectordb_hr_data_spark.operators.quantiles import (
        with_exact_ntile,
        with_exact_ntile_range,
        with_exact_rank_range,
    )

    rng = random.Random(1311)
    for trial in range(4):
        n_rows = rng.randint(2, 200)
        spread = rng.choice([1, 3, 40, 10**8])
        rows = [(i, rng.randint(0, spread)) for i in range(n_rows)]
        df = spark.createDataFrame(rows, "tid long, v long")
        n = rng.choice([3, 7, 10])
        desc = rng.random() < 0.5
        order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("tid").asc()]
        w = Window.orderBy(*order)
        want = {
            (r.tid): (r.t, r.rn)
            for r in df.select(
                "tid",
                F.ntile(n).over(w).cast("long").alias("t"),
                F.row_number().over(w).cast("long").alias("rn"),
            ).collect()
        }
        got_b = {
            r.tid: r.t
            for r in with_exact_ntile(df, n, "v", "tid", "t", descending=desc).collect()
        }
        assert got_b == {k: v[0] for k, v in want.items()}, (trial, n_rows, spread)
        for parts in (2, 5, 16):
            got_r = {
                r.tid: (r.t, r.rn)
                for r in with_exact_ntile_range(
                    with_exact_rank_range(
                        df, "v", "tid", "rn", descending=desc, num_parts=parts
                    ),
                    n, "v", "tid", "t", descending=desc, num_parts=parts,
                ).collect()
            }
            assert got_r == want, (trial, parts, n_rows, spread)
