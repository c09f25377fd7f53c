"""B38: distributed BPE tokenizer training over ``documents``.

The "train a tokenizer on the corpus" stage of a training-data pipeline
(Sennrich et al. ACL'16), shaped for Spark:

- The corpus collapses ONCE to a (word, freq) vocabulary frame — the only
  pass whose cost scales with corpus size; everything after is
  vocabulary-sized. At 100 TB the vocabulary is millions of rows, not
  billions: this is the same reduction a word2vec/fastText fit does.
- Merge rounds are sequential BY DEFINITION (merge k+1 depends on the
  corpus state after merge k), so the router mirrors
  ``operators/components.connected_components``: a vocabulary under
  ``driver_threshold`` collects once and trains in exact python (a merge
  round over a small dict is microseconds; a Spark job is ~0.5 s of fixed
  scheduling), while a larger vocabulary runs DISTRIBUTED rounds — explode
  adjacent symbol pairs weighted by word freq → groupBy count (map-side
  partials, uniform pair key) → ONE argmax row to the driver → apply the
  merge with a left-fold column expression (no UDF). Both paths implement
  the identical semantics (ties break on (count desc, left, right)); the
  pytest pins them against each other.
- The left-fold merge reproduces BPE's left-to-right greedy application:
  "aaa" under merge (a,a) becomes [aa, a], never [a, aa].

Iterative ⇒ registered rows-only (the driver records a rows-only check);
correctness is pinned by a python-recompute pytest and the cross-path
equality test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..queries import register

BPE_N_MERGES = 8
BPE_DRIVER_THRESHOLD = 100_000  # vocabulary rows; same routing idea as CC


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_fold_expr(left: str, right: str) -> str:
    """Left-fold that rewrites adjacent (left, right) symbol pairs into the
    merged symbol, greedily left-to-right (the BPE application order)."""
    l, r = _sql_quote(left), _sql_quote(right)
    lr = _sql_quote(left + right)
    return (
        "aggregate(syms, cast(array() as array<string>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {l} AND s = {r} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({lr})) "
        "ELSE concat(acc, array(s)) END)"
    )


_PAIRS_EXPR = (
    "CASE WHEN size(syms) >= 2 THEN"
    " transform(sequence(1, size(syms) - 1),"
    " i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"
    " ELSE array() END"
)

Merge = tuple[int, str, str, str, int]


def _merge_word(syms: list[str], l: str, r: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == l and s == r:
            out[-1] = l + r
        else:
            out.append(s)
    return out


def _bpe_train_driver(
    freqs: list[tuple[str, int]], n_merges: int
) -> tuple[list[Merge], dict[str, list[str]]]:
    """Exact in-memory trainer over a collected (word, freq) vocabulary."""
    freq = dict(freqs)
    vocab = {w: list(w) for w in freq}
    merges: list[Merge] = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq[w]
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, cnt))
        vocab = {w: _merge_word(syms, l, r) for w, syms in vocab.items()}
    return merges, vocab


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = BPE_N_MERGES,
    method: str = "auto",
    driver_threshold: int = BPE_DRIVER_THRESHOLD,
) -> tuple[list[Merge], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    table rows and the final (word, freq, syms) vocabulary frame.

    ``method``: ``auto`` collects vocabularies under ``driver_threshold``
    and trains exactly on the driver; ``distributed`` forces the Spark
    merge rounds (what ``auto`` runs at scale; the pytest pins equality).
    """
    if method not in ("auto", "distributed"):
        raise ValueError(f"unknown method {method!r}")
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    vocab = words.select(
        "w", "freq", F.split(F.col("w"), "").alias("syms")
    ).localCheckpoint(eager=True)
    small = (
        method == "auto"
        and vocab.limit(driver_threshold + 1).count() <= driver_threshold
    )
    if small:
        freqs = [(r["w"], int(r["freq"])) for r in vocab.select("w", "freq").collect()]
        merges, final = _bpe_train_driver(freqs, n_merges)
        final_df = spark.createDataFrame(
            [(w, dict(freqs)[w], syms) for w, syms in final.items()],
            "w string, freq long, syms array<string>",
        )
        return merges, final_df
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (
            vocab.select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).first()
        if best is None:
            break
        merges.append((rank, best["l"], best["r"], best["l"] + best["r"], int(best["cnt"])))
        vocab = vocab.select(
            "w", "freq", F.expr(_merge_fold_expr(best["l"], best["r"])).alias("syms")
        )
    return merges, vocab


@register("bpe_train_merges", None)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: (merge_rank, left, right, merged,
    pair_count), rank-ordered. Ties on count break lexicographically on
    (left, right) so the fit is deterministic across partitionings."""
    d = read_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(spark, d)
    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, merged string, pair_count long"
    ).orderBy("merge_rank")


@register("bpe_encode_token_counts", None)
def bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges to the corpus and report per-document BPE
    token counts — the encode side of the tokenizer: per document,
    tokens = sum over its words of that word's merged symbol count,
    computed by joining the doc→word explosion against the trained
    vocabulary (broadcast — it is vocabulary-sized)."""
    d = read_table(spark, sf_dir, "documents")
    _, vocab = bpe_train(spark, d)
    sym_counts = vocab.select("w", F.size("syms").alias("n_syms"))
    dw = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")).filter(
        F.length("w") > 0
    )
    return (
        dw.join(F.broadcast(sym_counts), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )
