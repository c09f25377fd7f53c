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

Lifecycle (VERDICT r12 item 3 — a memo without one contradicts the
freshness discipline the retune family exists for):

- ``invalidate(name)`` / ``invalidate_all()`` drop memo entries AND their
  on-disk tables, so the next call recomputes. The streaming index sinks
  (``stream_ivf_sq8_append`` / ``stream_hnsw_append``) call
  ``invalidate_all()`` the moment ``needs_retune`` fires — a rebuilt
  index can never serve a STALE tuning curve to ``ann_index_advisor``.
- every directory this module creates embeds a ``p<pid>`` token; an
  ``atexit`` hook removes this process's dirs, and import-time
  ``sweep_stale()`` removes litter from DEAD pids (crashed or SIGKILLed
  processes whose atexit never ran) — a shared box stays clean.
- ``scratch_dir(kind)`` hands out one-shot pid-scoped spill dirs under
  the same root (``operators.quantiles`` writes its rank-pass input
  there) so ALL temp tables share the single sweep discipline.
"""

from __future__ import annotations

import atexit
import itertools
import hashlib
import os
import re
import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_SAVED: set[str] = set()
_SCRATCH_SEQ = itertools.count()
# matches the pid token in any dir this module created: <stem>-p<pid> or
# scratch-<kind>-p<pid>-<seq>
_PID_TOKEN = re.compile(r"-p(\d+)(?:-\d+)?$")


def _root() -> str:
    return os.path.join(tempfile.gettempdir(), "spark_graft_memo")


def _path(sf_dir: str, name: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(_root(), f"{name}-{tag}-p{os.getpid()}")


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


def scratch_dir(kind: str) -> str:
    """A fresh pid-scoped one-shot directory under the memo root; the
    caller writes whatever it likes there. Removed by this process's
    atexit sweep (or, after a crash, by the next process's
    ``sweep_stale``) — never by ``invalidate``, because scratch tables
    back in-flight DataFrames that read them lazily."""
    seq = next(_SCRATCH_SEQ)
    return os.path.join(_root(), f"scratch-{kind}-p{os.getpid()}-{seq}")


def invalidate(name: str) -> None:
    """Forget every memo whose ``name`` matches (any sf_dir tag), deleting
    the on-disk table: the next ``memo_table`` call recomputes. Wired into
    the streaming index sinks' retune path so geometry changes flush the
    curves derived from the old geometry."""
    prefix = f"{name}-"
    for p in list(_SAVED):
        if os.path.basename(p).startswith(prefix):
            _SAVED.discard(p)
            shutil.rmtree(p, ignore_errors=True)


def invalidate_all() -> None:
    """Flush every memoized table this process holds (the retune hook:
    an index rebuild changes the geometry every curve was measured on,
    so all of them are stale at once)."""
    for p in list(_SAVED):
        _SAVED.discard(p)
        shutil.rmtree(p, ignore_errors=True)


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else — leave it alone
    return True


def sweep_stale() -> int:
    """Remove memo/scratch dirs left by DEAD pids (crashed processes whose
    atexit never ran). Runs once at import; safe to call any time.
    Returns the number of directories removed."""
    root = _root()
    removed = 0
    try:
        entries = os.listdir(root)
    except FileNotFoundError:
        return 0
    for d in entries:
        m = _PID_TOKEN.search(d)
        if m and not _pid_alive(int(m.group(1))):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
            removed += 1
    return removed


def _atexit_sweep() -> None:
    """Remove every dir THIS pid created (memos and scratch alike)."""
    root = _root()
    try:
        entries = os.listdir(root)
    except FileNotFoundError:
        return
    for d in entries:
        m = _PID_TOKEN.search(d)
        if m and int(m.group(1)) == os.getpid():
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    _SAVED.clear()


atexit.register(_atexit_sweep)
sweep_stale()
