"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``vectordb_hr_data_spark``; the registry in
``vectordb_hr_data_spark/queries.py`` keeps each Spark query and its
DuckDB oracle SQL side by side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vectordb_hr_data_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's whole query
    path — text → embedding → exact top-k → 1-distance similarity — as one
    declarative pipeline (ann_text_search)."""
    from vectordb_hr_data_spark.querydefs.similarity_queries import ann_text_search

    return ann_text_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; ops without an entry get the driver's
    weaker rows-only check (non-SQL-expressible, e.g. real model UDFs)."""
    return _q.oracle_sql()
