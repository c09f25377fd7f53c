"""Additional TPC-H-shape relational queries (public query patterns,
adapted to the columns this schema actually has): nation-pair volume (Q7),
national market share (Q8), profit-by-nation-year (Q9), important-part
value concentration (Q11), priority CASE aggregation (Q12), ratio
aggregate (Q14), top-revenue supplier (Q15), disjunctive multi-range
predicates (Q19), waiting-orders exists/not-exists (Q21), NOT EXISTS +
scalar-average subquery (Q22), returned-items top customers (Q10). With
these the full 22-query TPC-H shape catalogue is covered (q1-q22 across
this module, relational_queries, and subquery_queries). All decimal-exact,
all oracle-checked. Columns the synthetic schema lacks are substituted by
documented stand-ins (no partsupp table → lineitem-derived supply value;
no commit/receipt dates → l_returnflag='R' as the lateness proxy; supply
cost → the l_tax component), keeping each query's SHAPE — join topology,
subquery structure, aggregation pattern — faithful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..queries import register

D = "decimal(18,2)"


def _dec(c: str):
    return F.col(c).cast(D)


@register(
    "q7_nation_volume",
    """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(date_part('year', l.l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_name <> nc.n_name
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume per year (Q7 shape): fact table joined to
    two different dimension paths (supplier-nation, customer-nation)."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q12_priority_case_agg",
    """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l.l_returnflag
ORDER BY l_returnflag
""",
)
def q12_priority_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional CASE counting inside aggregation (Q12 shape; priority
    stands in for the absent shipmode column)."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    o = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_ratio_aggregate",
    """
SELECT round(
  100.0 * CAST(sum(CASE WHEN p.p_type LIKE '%STEEL%'
        THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        ELSE 0 END) AS DOUBLE)
  / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
  6) AS steel_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-09-01 00:00:00'
""",
)
def q14_ratio_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-revenue ratio in one pass (Q14 shape): both numerator
    and denominator as exact decimal sums, divided as doubles."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01 00:00:00").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    steel = F.when(F.col("p_type").like("%STEEL%"), rev).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(steel).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("steel_revenue_pct")
        )
    )


@register(
    "q19_disjunctive_predicates",
    """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 10)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity >= 30)
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive range predicates across the join (Q19
    shape) — exercises CNF conversion / partial pushdown."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 30))
    )
    return j.filter(cond).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@register(
    "q22_idle_rich_customers",
    """
SELECT c.c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
ORDER BY c_mktsegment
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-average subquery + NOT EXISTS anti join (Q22 shape):
    above-average-balance customers who never ordered."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).first()[0]
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q8_national_market_share",
    """
WITH base AS (
  SELECT CAST(date_part('year', o.o_orderdate) AS INT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM base GROUP BY o_year ORDER BY o_year
""",
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's revenue share of a region's market for one
    part type, per order year — the deepest dimension fan in the catalogue
    (lineitem → part, supplier→nation, orders→customer→nation→region).
    Every dimension broadcasts; the fact table never shuffles for a join."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_rkey"))
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_rkey") == r.r_regionkey)
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    zero = F.lit(0).cast(D)
    return (
        base.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit_by_nation_year",
    """
SELECT ns.n_name AS nation,
       CAST(date_part('year', o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on a product line grouped by supplier nation and
    order year. The schema has no partsupp/ps_supplycost, so the cost
    component is the line's tax amount — the decimal-exact arithmetic and
    the (nation, year) rollup over a name-LIKE-filtered part dimension are
    the shape under test."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - _dec(
        "l_extendedprice"
    ) * _dec("l_tax")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@register(
    "q11_important_part_value",
    """
WITH supplied AS (
  SELECT l.l_partkey,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey < 5
)
SELECT l_partkey, round(CAST(sum(value) AS DOUBLE), 2) AS part_value
FROM supplied
GROUP BY l_partkey
HAVING CAST(sum(value) AS DOUBLE) > 0.001 * (SELECT CAST(sum(value) AS DOUBLE) FROM supplied)
ORDER BY part_value DESC, l_partkey
""",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part supplied value restricted to one supplier group,
    keeping parts whose value exceeds a fraction of the global total — the
    HAVING-against-scalar-subquery pattern. No partsupp table exists, so
    supplied value derives from lineitem (extendedprice × quantity). The
    global total is one scalar collected on the driver (the always-safe
    collect); both sides compare in DOUBLE with identical arithmetic."""
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    supplied = l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey).select(
        "l_partkey", (_dec("l_extendedprice") * _dec("l_quantity")).alias("value")
    )
    total = float(supplied.agg(F.sum("value").cast("double")).first()[0])
    return (
        supplied.groupBy("l_partkey")
        .agg(F.sum("value").alias("v"))
        .filter(F.col("v").cast("double") > 0.001 * total)
        .select("l_partkey", F.round(F.col("v").cast("double"), 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


@register(
    "q15_top_revenue_supplier",
    """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
""",
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: a revenue view over a 3-month window, returning the
    supplier(s) whose revenue equals the view's maximum — equality against
    a scalar subquery, exact because the revenue stays DECIMAL until the
    output boundary (double equality would be engine-dependent)."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev")).first()[0]  # scalar, driver-safe
    return (
        rev.filter(F.col("total_rev") == F.lit(max_rev))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q21_suppliers_kept_orders_waiting",
    """
WITH l1 AS (
  SELECT DISTINCT l.l_suppkey, l.l_orderkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R' AND o.o_orderstatus = 'F'
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
)
def q21_suppliers_kept_orders_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the hardest subquery topology in TPC-H — for each
    (supplier, finished order): EXISTS another supplier on the order, NOT
    EXISTS another supplier who also failed it. Lateness proxies to
    l_returnflag='R' (no commit/receipt dates in this schema).

    Spark form is the aggregation decorrelation of the two EXISTS: dedup
    (order, supplier) pairs once (map-side partial agg) carrying a
    per-pair late flag, then ONE window over the order key annotates each
    pair with the order's supplier count and late-supplier count —
    "another supplier exists" ⟺ n_supp ≥ 2, "no other late supplier" ⟺
    n_late = 1. Two shuffles total (pair dedup, order window), no pair-set
    self-join, no countDistinct Expand; the window key is the order key
    whose group size is bounded by suppliers-per-order, so there is no
    skew at any corpus size. Results identical to the EXISTS oracle."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = read_table(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("is_late")
    )
    w = Window.partitionBy("l_orderkey")
    annotated = pairs.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count("*").over(w).alias("n_supp"),
        F.sum("is_late").over(w).alias("n_late"),
    )
    waiting = (
        annotated.filter(
            (F.col("is_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
        )
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


@register(
    "q10_returned_items_top_customers",
    """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-revenue top customers (Q10 shape): selective fact filter →
    join → agg → top-k."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
