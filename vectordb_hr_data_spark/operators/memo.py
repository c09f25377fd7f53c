"""Per-process result memo for small derived tables (tuning curves).

The index family amortizes its BUILD via ``_IVF_BUILT``-style memos; the
tuning curves (B201/B231/B233) still re-ran their bounded-frontier search
on every call, which made the B238 advisor — a pure composition of three
curves — pay three full curve evaluations (measured 12.8 s at sf0.1).
Curves are tiny deterministic tables (a handful of rows per grid), so the
right amortization is to persist the RESULT once per (process, sf_dir,
name) and let every later composition read it back: the advisor becomes
three parquet reads. Same pid-scoped path discipline as
``_ivf_index_path`` — concurrent processes never clobber each other.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_SAVED: set[str] = set()


def _path(sf_dir: str, name: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(
        tempfile.gettempdir(), "spark_graft_memo", f"{name}-{tag}-{os.getpid()}"
    )


def memo_table(
    spark: SparkSession, sf_dir: str, name: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized result of ``build()`` for (process, sf_dir,
    name): computed and persisted on first call, a plain parquet read
    afterwards. Callers re-apply their ORDER BY — parquet keeps values
    and schema, not order."""
    path = _path(sf_dir, name)
    if path not in _SAVED:
        build().write.mode("overwrite").parquet(path)
        _SAVED.add(path)
    return spark.read.parquet(path)
