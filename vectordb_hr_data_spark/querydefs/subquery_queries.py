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
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0 AS DECIMAL(38,6)) AS avg_yearly
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
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0 AS DECIMAL(38,6)) AS avg_yearly
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
       CAST(o.o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_qty
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
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
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
               CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_qty
        FROM {c} c JOIN {o} o ON c.c_custkey = o.o_custkey
        JOIN {li} l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM {li} GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250
        )
        GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
        """
    )


@register(
    "q2_cheapest_supplier_per_part",
    """
SELECT p.p_partkey, s.s_name,
       CAST(s.s_acctbal AS DECIMAL(18,2)) AS s_acctbal
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
               CAST(s.s_acctbal AS DECIMAL(18,2)) AS s_acctbal
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
