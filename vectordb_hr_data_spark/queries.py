"""Query registry: every implemented operator exposed as a named query over
the driver testdata, paired with its DuckDB oracle SQL (driver contract in
``__spark_entry__.py``; coverage checklist in SURVEY.md §2).

Each entry is a ``(spark_fn, oracle_sql)`` pair where ``spark_fn(spark,
sf_dir) -> DataFrame`` and ``oracle_sql`` is ANSI SQL DuckDB runs over the
same parquet tables (views pre-registered). Column names/aliases match
exactly on both sides; float results are rounded identically on both sides
so the driver's order-insensitive value-hash is stable.

Ops that real-model inference or iterative algorithms make non-SQL-
expressible register with ``oracle_sql=None`` → the driver records a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


# ---------------------------------------------------------------------------
# import the operator query modules so their @register calls populate REGISTRY
# ---------------------------------------------------------------------------

from .querydefs import vector_queries  # noqa: E402,F401

_MODULES = [vector_queries]

for _mod_name in (
    "relational_queries",
    "text_queries",
    "dedup_queries",
    "event_queries",
    "hr_queries",
    "similarity_queries",
    "udf_queries",
    "subquery_queries",
    "tpch_more_queries",
):
    try:
        _m = __import__(f"vectordb_hr_data_spark.querydefs.{_mod_name}", fromlist=[_mod_name])
        _MODULES.append(_m)
    except ImportError:
        pass
