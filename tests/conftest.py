from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from vectordb_hr_data_spark.session import get_spark

    spark = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with the driver's views pre-registered — mirrors
    the t2 oracle harness."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def assert_matches_oracle(sdf, ddb, sql: str, sort_by=None):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL —
    the same contract as the driver's t2 (row count + columns + values)."""
    import math

    spark_rows = [tuple(r) for r in sdf.collect()]
    cols = sdf.columns
    res = ddb.execute(sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = [tuple(r) for r in res.fetchall()]
    assert sorted(cols) == sorted(oracle_cols), f"schema mismatch: {cols} vs {oracle_cols}"
    # reorder oracle columns to spark order
    idx = [oracle_cols.index(c) for c in cols]
    oracle_rows = [tuple(r[i] for i in idx) for r in oracle_rows]
    assert len(spark_rows) == len(oracle_rows), f"rowcount {len(spark_rows)} vs {len(oracle_rows)}"

    def norm(row):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append(round(v, 6) + 0.0 if not math.isnan(v) else "NaN")
            else:
                out.append(v)
        return tuple(out)

    assert sorted(map(norm, spark_rows), key=repr) == sorted(map(norm, oracle_rows), key=repr)
