"""Batch construction of an HNSW-style layered neighbor graph.

The reference ships a Chroma HNSW index (chroma_db_store header: M=16,
efConstruction=100) built by SEQUENTIAL insertion — each new point beam-
searches the existing graph (beam width efConstruction) for its M
neighbors. That algorithm is inherently serial and has no faithful
data-parallel form; what a batch engine CAN build, exactly and
reproducibly, is the artifact a serving system loads: per-node, per-layer
neighbor lists with HNSW's structural properties —

- geometric layer assignment: P(level ≥ l) = (1/M)^l, HNSW's
  level = floor(-ln(U) · mL) with mL = 1/ln(M). Computed as an INTEGER
  contract (no cross-engine ln/floor hazard): the number of leading '0'
  hex digits of md5(vec_id || ':hnswlvl') is exactly geometric with
  ratio 1/16 = 1/M, capped at HNSW_MAX_LEVEL.
- per-layer degree caps: M neighbors on upper layers, 2·M on layer 0
  (HNSW's M0 = 2M convention).
- neighbors at layer l come only from nodes that EXIST at layer l
  (level ≥ l), ranked by quantized L2² with vec_id tie-breaks.

Candidate generation replaces the beam search with the repo's blocked
discipline: nodes pair only WITHIN their deterministic IVF cell (nearest
of the first-K-rows centroids, 4-decimal quantization, cid tie-breaks —
the ``ivf_cell_silhouette`` contract), so construction is never O(N²):
per-cell work is |cell|², and cells are bounded by ROWS_PER_CELL at
corpus scale (cell count grows with N). The price vs true HNSW is edges
never crossing cell boundaries — upper layers lose some long-range
links; the production mitigation — assigning each node to its top-N
cells so edges can span Voronoi boundaries — is the ``assign_cells``
parameter (querydefs.vector_queries ``hnsw_multicell_graph_build`` /
``hnsw_multicell_recall_curve`` build and price it; ``dedup_pairs``
here drops the cross-cell duplicate pairs). efConstruction has no batch
analogue — the per-cell candidate set IS the (exhaustive-within-cell)
beam.

Reference parity artifact: vector_db.py builds its HNSW via chromadb
defaults (hnsw:space sq-L2 — the same metric used here);
``export_hnsw_graph`` writes the neighbor lists parquet PARTITIONED BY
layer so a serving process can load one layer at a time, top (entry)
layer first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V

HNSW_M = 16  # reference header.bin: M=16
HNSW_MAX_LEVEL = 4


def hnsw_level_expr(id_col: str) -> Column:
    """Integer-exact geometric level: leading '0' hex digits of
    md5(id || ':hnswlvl'); P(level ≥ l) = 16^-l = (1/M)^l."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":hnswlvl")))
    # built inside-out so the LONGEST prefix is the outermost (first-
    # checked) branch: level 4 wins over level 1 when both match
    expr = F.lit(0)
    for l in range(1, HNSW_MAX_LEVEL + 1):
        expr = F.when(F.substring(h, 1, l) == "0" * l, F.lit(l)).otherwise(expr)
    return expr.cast("int")


def hnsw_level_sql(id_expr: str) -> str:
    """DuckDB twin of ``hnsw_level_expr`` (same md5 string, same prefixes)."""
    h = f"md5(CAST({id_expr} AS VARCHAR) || ':hnswlvl')"
    case = "CASE"
    for l in range(HNSW_MAX_LEVEL, 0, -1):
        case += f" WHEN substr({h}, 1, {l}) = '{'0' * l}' THEN {l}"
    return case + " ELSE 0 END"


def build_hnsw_graph(
    nodes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cid",
    m: int = HNSW_M,
    dedup_pairs: bool = False,
) -> DataFrame:
    """Layered neighbor lists over cell-blocked candidates.

    ``nodes`` carries (id, vector, cell); returns one row per
    (vec_id, layer, rk): ``neighbor_id`` and the quantized squared-L2
    distance ``d_q`` (= round(round(l2sq, 4) · 10⁴), an exact integer).
    Scale shape: one self-join keyed on the cell id (per-cell candidate
    volume |cell|², bounded by the IVF ROWS_PER_CELL contract), a
    sequence-explode over the pair's shared layers (geometric levels →
    expected factor ≈ 1 + 2/M), and one partitioned rank per (node,
    layer). No global window, nothing corpus-sized broadcast.

    ``dedup_pairs=True`` is REQUIRED when ``nodes`` carries multi-cell
    assignments (one row per (node, cell)): a pair sharing two cells
    would otherwise appear twice and eat two rank slots. The dedup is an
    exchange on (vec_id, neighbor_id) — the distance and levels are pure
    functions of the pair, so dropping either duplicate is exact — and
    is off by default because single-assigned pairs are unique by
    construction and the extra shuffle would be waste."""
    lvl = nodes.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.col(cell_col).alias("__c"),
        hnsw_level_expr(id_col).alias("level"),
    )
    a = lvl.select(
        F.col("__id").alias("vec_id"),
        F.col("__v").alias("va"),
        F.col("__c").alias("ca"),
        F.col("level").alias("la"),
    )
    b = lvl.select(
        F.col("__id").alias("neighbor_id"),
        F.col("__v").alias("vb"),
        F.col("__c").alias("cb"),
        F.col("level").alias("lb"),
    )
    pairs = a.join(b, (F.col("ca") == F.col("cb")) & (F.col("vec_id") != F.col("neighbor_id"))).select(
        "vec_id",
        "neighbor_id",
        "la",
        "lb",
        F.round(F.round(V.l2sq("va", "vb"), 4) * 10000)
        .cast("long")
        .alias("d_q"),
    )
    if dedup_pairs:
        pairs = pairs.dropDuplicates(["vec_id", "neighbor_id"])
    layered = pairs.select(
        "vec_id",
        "neighbor_id",
        "d_q",
        F.explode(F.sequence(F.lit(0), F.least("la", "lb"))).alias("__l"),
    ).select("vec_id", "neighbor_id", "d_q", F.col("__l").cast("long").alias("layer"))
    w = Window.partitionBy("vec_id", "layer").orderBy(
        F.col("d_q").asc(), F.col("neighbor_id").asc()
    )
    cap = F.when(F.col("layer") == 0, F.lit(2 * m)).otherwise(F.lit(m))
    return (
        layered.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= cap)
        .select("vec_id", "layer", "rk", "neighbor_id", "d_q")
    )


def hnsw_entry_point(graph_or_levels: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """HNSW search starts at the top layer's single entry node: the
    max-level node, min id on ties — a 1-row aggregate."""
    lv = graph_or_levels.select(
        F.col(id_col).alias("__id"), hnsw_level_expr(id_col).alias("level")
    )
    return lv.agg(
        F.max(F.struct(F.col("level"), (-F.col("__id")).alias("nid"))).alias("t")
    ).select(
        (-F.col("t.nid")).cast("long").alias("entry_vec_id"),
        F.col("t.level").cast("long").alias("entry_level"),
    )


def export_hnsw_graph(graph: DataFrame, path: str) -> None:
    """Persist the neighbor lists the way a serving process reads them:
    parquet PARTITIONED BY layer (top layer first at search time), sorted
    within files by (vec_id, rk) so one node's list is one contiguous
    run. The exchange keys on (layer, vec_id) — hashing on layer alone
    would funnel the corpus-sized layer 0 through ONE write task; with
    the node id in the key each layer directory is written by many tasks
    and a node's list is still contiguous inside its file."""
    (
        graph.repartition(F.col("layer"), F.col("vec_id"))
        .sortWithinPartitions("vec_id", "rk")
        .write.mode("overwrite")
        .partitionBy("layer")
        .parquet(path)
    )


HNSW_NPROBE = 4


def hnsw_probe_candidates(
    graph: DataFrame,
    nodes: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = HNSW_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cid",
    multi_assigned: bool = False,
) -> DataFrame:
    """The probe-routed candidate generator behind the SPANN-style search
    (see ``hnsw_greedy_search`` for the full design rationale): per query,
    the top-``nprobe`` cells by centroid distance, a per-cell greedy
    layered descent from the cell entry (fixed unroll, one hop per
    layer), and a two-hop layer-0 ef expansion. Returns ONE row per
    (query_id, cand): quantized distance ``d_q`` and ``pn`` = the
    smallest probe rank whose cell produced the candidate — the tag that
    lets the recall CURVE derive every nprobe' <= nprobe grid point from
    this single pass (the one-pass-tagged-grid discipline).

    Scale shape: every step joins a (Q·nprobe)-row frontier (broadcast,
    checkpointed per hop — nested-broadcast lineage otherwise re-executes
    all prior iterations) against the id-keyed graph/vector tables —
    per-step candidate volume Q·nprobe·(2M)², never corpus-sized.

    ``multi_assigned=True`` declares that ``nodes`` carries one row per
    (node, assigned cell): the id→vector lookup table is then
    deduplicated so the final candidate join cannot emit one row per
    assignment (the in-loop greedy argmin needs no dedup — the
    groupBy-min absorbs duplicates)."""
    emb = nodes.select(F.col(id_col).alias("__nid"), F.col(vec_col).alias("__nv"))
    if multi_assigned:
        emb = emb.dropDuplicates(["__nid"])

    def dq(vcol: str) -> Column:
        return F.round(F.round(V.l2sq(vcol, "qv"), 4) * 10000).cast("long")

    # (1) coarse routing: top-nprobe cells per query, probe rank kept
    wp = Window.partitionBy("query_id").orderBy(F.col("cd").asc(), F.col(cell_col).asc())
    probe = (
        centroids.crossJoin(F.broadcast(queries))
        .select(
            "query_id",
            "qv",
            cell_col,
            F.round(V.l2sq("cv", "qv"), 4).alias("cd"),
        )
        .withColumn("pn", F.row_number().over(wp).cast("long"))
        .filter(F.col("pn") <= nprobe)
        .select("query_id", "qv", cell_col, "pn")
    )
    # (2) per-cell entry points (max level, min id within the cell)
    cell_entry = (
        nodes.select(
            F.col(cell_col),
            F.col(id_col).alias("__id"),
            hnsw_level_expr(id_col).alias("level"),
        )
        .groupBy(cell_col)
        .agg(F.max(F.struct(F.col("level"), (-F.col("__id")).alias("nid"))).alias("t"))
        .select(cell_col, (-F.col("t.nid")).cast("long").alias("cur"))
    )
    cur = probe.join(F.broadcast(cell_entry), cell_col).select(
        "query_id", "qv", cell_col, "pn", "cur"
    )
    for layer in range(HNSW_MAX_LEVEL, 0, -1):
        nb = (
            F.broadcast(cur)
            .join(
                graph.filter(F.col("layer") == layer).select(
                    F.col("vec_id").alias("cur"), "neighbor_id"
                ),
                "cur",
            )
            .select(
                "query_id", "qv", cell_col, "pn", F.col("neighbor_id").alias("cand")
            )
        )
        # no dedup needed in-loop (cur is never in its own neighbor list
        # and lists are distinct); the greedy argmin is a map-side-partial
        # aggregate on the lexicographic (d_q, cand) struct — an exchange
        # on (query, cell) instead of a window sort; pn rides along
        # (functionally determined by the (query, cell) key)
        cands = cur.select(
            "query_id", "qv", cell_col, "pn", F.col("cur").alias("cand")
        ).unionByName(nb)
        scored = cands.join(emb, F.col("cand") == F.col("__nid")).select(
            "query_id", "qv", cell_col, "pn", "cand", dq("__nv").alias("d_q")
        )
        # checkpoint the Q·nprobe-row frontier each hop: without it every
        # later broadcast subplan re-executes ALL prior iterations
        # (nested-broadcast lineage — measured quadratic job blowup), and
        # a serving system keeps the frontier between hops anyway
        cur = (
            scored.groupBy("query_id", cell_col)
            .agg(
                F.min(F.struct(F.col("d_q"), F.col("cand"))).alias("__m"),
                F.first("qv").alias("qv"),
                F.first("pn").alias("pn"),
            )
            .select(
                "query_id", "qv", cell_col, "pn", F.col("__m.cand").alias("cur")
            )
            .localCheckpoint(eager=True)
        )
    # (3) layer-0 two-hop ef expansion (graph edges stay in-cell, so a
    # candidate's cell — hence its pn — is the frontier row's)
    g0 = graph.filter(F.col("layer") == 0).select(
        F.col("vec_id").alias("src"), "neighbor_id"
    )
    hop1 = (
        F.broadcast(cur)
        .join(g0, F.col("cur") == F.col("src"))
        .select("query_id", "qv", "pn", F.col("neighbor_id").alias("cand"))
        .localCheckpoint(eager=True)
    )
    # dedup hop1 per (query, cand) keeping the SMALLEST pn — a plain
    # dropDuplicates kept an arbitrary row's pn, which is only safe when
    # edges stay in-cell (single assignment: one reaching cell per cand);
    # multi-cell edges cross cells, so a cand reachable from two probed
    # cells must propagate the better probe rank into its hop-2 expansion
    hop1d = hop1.groupBy("query_id", "cand").agg(
        F.min("pn").alias("pn"), F.first("qv").alias("qv")
    )
    hop2 = (
        F.broadcast(hop1d)
        .join(g0, F.col("cand") == F.col("src"))
        .select("query_id", "qv", "pn", F.col("neighbor_id").alias("cand"))
    )
    # (4) union, exclude self, collapse to one row per (query, cand)
    # keeping the SMALLEST probe rank that reached it
    ef = (
        cur.select("query_id", "qv", "pn", F.col("cur").alias("cand"))
        .unionByName(hop1)
        .unionByName(hop2)
        .filter(F.col("cand") != F.col("query_id"))
        .groupBy("query_id", "cand")
        .agg(F.min("pn").alias("pn"), F.first("qv").alias("qv"))
    )
    return ef.join(emb, F.col("cand") == F.col("__nid")).select(
        "query_id", F.col("cand").alias("vec_id"), dq("__nv").alias("d_q"), "pn"
    )


def hnsw_greedy_search(
    graph: DataFrame,
    nodes: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = HNSW_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cid",
) -> DataFrame:
    """SPANN-style search over the cell-sharded graph — the query path a
    serving system runs against per-shard HNSW graphs, as bounded
    declarative algebra.

    The built graph's edges never cross cells (that is what bounds
    construction), so a single global entry point cannot route a query
    out of the entry's cell — measured recall from a pure-graph descent
    on uniform synthetic vectors was ~0. Production systems shard graphs
    the same way and solve routing the same way this does (SPANN / DiskANN
    sharding): (1) the COARSE QUANTIZER picks the query's top-``nprobe``
    cells (map-side vs the broadcast centroid table — the existing IVF
    probe discipline, 4-decimal quantization, cid tie-breaks); (2) inside
    each probed cell the layered graph takes over: start at the CELL's
    entry point (max level, min id within the cell), ONE greedy hop per
    layer from HNSW_MAX_LEVEL down to 1 (true HNSW iterates to a local
    minimum; the single-hop form keeps the unrolled plan fixed and
    deterministic — the recall eval prices the simplification); (3) at
    layer 0 expand TWO hops of neighbor lists as the ef-candidate set;
    (4) union the probed cells\' candidates, exclude the query\'s own
    node, exact top-k re-rank. Candidate generation is
    ``hnsw_probe_candidates`` (shared with the recall curve)."""
    cands = hnsw_probe_candidates(
        graph,
        nodes,
        queries,
        centroids,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        cell_col=cell_col,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d_q").asc(), F.col("vec_id").asc())
    return (
        cands.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "vec_id", "d_q")
    )
