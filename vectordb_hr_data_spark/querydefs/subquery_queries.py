"""Subquery coverage: correlated scalar subqueries, HAVING-gated IN
subqueries, and per-group minimum correlation — the Catalyst subquery
rewrites (decorrelation to joins) the §2 checklist's relational engine
needs. Written through the SQL API (spark.sql) since that is where
subquery syntax lives; shapes follow public TPC-H Q17/Q18/Q2 patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import read_table
from ..queries import register


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    vname = f"{name}_sq"
    read_table(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


@register(
    "q17_small_quantity_revenue",
    """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-part average threshold) — Catalyst
    decorrelates it into an aggregate + join, which is exactly the plan
    you'd hand-write at scale."""
    li, p = _view(spark, sf_dir, "lineitem"), _view(spark, sf_dir, "part")
    return spark.sql(
        f"""
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM {li} l JOIN {p} p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity) FROM {li} l2 WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


@register(
    "q18_large_volume_customers",
    """
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over a HAVING aggregate → left-semi join after rewrite;
    the aggregate subquery is tiny relative to the fact table, so the semi
    join is cheap at any scale."""
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    li = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT c.c_name, o.o_orderkey, o.o_orderdate,
               o.o_totalprice,
               CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM {c} c JOIN {o} o ON c.c_custkey = o.o_custkey
        JOIN {li} l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM {li} GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250
        )
        GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o_orderkey
        LIMIT 20
        """
    )


@register(
    "q4_order_priority_exists",
    """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS subquery → left-semi join (TPC-H Q4 shape)."""
    o = _view(spark, sf_dir, "orders")
    li = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM {o} o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM {li} l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """
    )


@register(
    "q13_customer_order_distribution",
    """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + double aggregation (TPC-H Q13 shape): customers
    with zero orders must appear with c_count = 0 — count(col) over the
    outer join's nulls, not count(*)."""
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        WITH per_cust AS (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM {c} c LEFT OUTER JOIN {o} o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """
    )


@register(
    "q16_suppliers_not_in",
    """
SELECT p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size >= 40
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_type
ORDER BY supplier_cnt DESC, p_type
""",
)
def q16_suppliers_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery → null-aware anti join (TPC-H Q16 shape)."""
    li = _view(spark, sf_dir, "lineitem")
    p = _view(spark, sf_dir, "part")
    s = _view(spark, sf_dir, "supplier")
    return spark.sql(
        f"""
        SELECT p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM {li} l JOIN {p} p ON p.p_partkey = l.l_partkey
        WHERE p.p_size >= 40
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM {s} WHERE s_acctbal < 0
          )
        GROUP BY p.p_type
        ORDER BY supplier_cnt DESC, p_type
        """
    )


@register(
    "q20_part_supply_nested",
    """
SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%a%')
    AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey
  HAVING sum(l.l_quantity) > 100
)
ORDER BY s.s_name
""",
)
def q20_part_supply_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN subqueries with a HAVING aggregate (TPC-H Q20 shape) —
    two levels of semi-join after decorrelation."""
    s = _view(spark, sf_dir, "supplier")
    li = _view(spark, sf_dir, "lineitem")
    p = _view(spark, sf_dir, "part")
    return spark.sql(
        f"""
        SELECT s.s_name, s.s_acctbal
        FROM {s} s
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey FROM {li} l
          WHERE l.l_partkey IN (SELECT p_partkey FROM {p} WHERE p_name LIKE '%a%')
            AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l.l_suppkey
          HAVING sum(l.l_quantity) > 100
        )
        ORDER BY s.s_name
        """
    )


@register(
    "q2_cheapest_supplier_per_part",
    """
SELECT p.p_partkey, s.s_name,
       s.s_acctbal
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size <= 10
  AND s.s_acctbal = (
    SELECT min(s2.s_acctbal)
    FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    WHERE l2.l_partkey = p.p_partkey
  )
GROUP BY p.p_partkey, s.s_name, s.s_acctbal
ORDER BY p.p_partkey, s.s_name
""",
)
def q2_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group minimum via correlated equality subquery (TPC-H Q2's
    min-cost-supplier shape)."""
    p = _view(spark, sf_dir, "part")
    li = _view(spark, sf_dir, "lineitem")
    s = _view(spark, sf_dir, "supplier")
    return spark.sql(
        f"""
        SELECT p.p_partkey, s.s_name,
               s.s_acctbal
        FROM {p} p
        JOIN {li} l ON l.l_partkey = p.p_partkey
        JOIN {s} s ON s.s_suppkey = l.l_suppkey
        WHERE p.p_size <= 10
          AND s.s_acctbal = (
            SELECT min(s2.s_acctbal)
            FROM {li} l2 JOIN {s} s2 ON s2.s_suppkey = l2.l_suppkey
            WHERE l2.l_partkey = p.p_partkey
          )
        GROUP BY p.p_partkey, s.s_name, s.s_acctbal
        ORDER BY p.p_partkey, s.s_name
        """
    )
