"""Fail-fast concurrent materialization of independent Spark subgraphs.

Guide §2.6: independent jobs submitted from driver threads let the
scheduler back-fill the tail of one job with the other's tasks. The naive
``ThreadPoolExecutor`` form has two operational holes (ADVICE r14):

- a failure in one chain left the sibling chain's jobs running to
  completion (wasted cluster work, delayed error surfacing);
- plain pool threads do NOT inherit the calling thread's JVM-local
  properties under PySpark's pinned-thread mode, so any job-group tag a
  harness set for per-query cancellation silently didn't cover these jobs.

``materialize_concurrently`` fixes both: each thunk runs through
``pyspark.inheritable_thread_target`` (captures the CALLING thread's local
properties, job group included, at submission time) plus one shared job
TAG for this call — tags are additive, so the harness's group id survives —
and the first exception cancels every job carrying the tag before
re-raising.
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Callable
from concurrent.futures import FIRST_EXCEPTION, ThreadPoolExecutor, wait
from typing import Any

from pyspark import inheritable_thread_target
from pyspark.sql import SparkSession

__all__ = ["materialize_concurrently"]

_SEQ = itertools.count()


def materialize_concurrently(spark: SparkSession, *thunks: Callable[[], Any]) -> list[Any]:
    """Run ``thunks`` on driver threads; return their results in order.

    Fail-fast: on the first exception the sibling thunks' Spark jobs are
    cancelled via ``cancelJobsWithTag`` (the still-queued futures are
    cancelled outright) and the original exception re-raises."""
    sc = spark.sparkContext
    tag = f"concmat-p{os.getpid()}-{next(_SEQ)}"

    def _wrap(fn: Callable[[], Any]) -> Callable[[], Any]:
        @inheritable_thread_target
        def run() -> Any:
            sc.addJobTag(tag)
            try:
                return fn()
            finally:
                sc.removeJobTag(tag)

        return run

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futs = [pool.submit(_wrap(t)) for t in thunks]
        done, not_done = wait(futs, return_when=FIRST_EXCEPTION)
        err = next((f.exception() for f in done if f.exception()), None)
        if err is not None:
            for f in not_done:
                f.cancel()
            try:
                sc.cancelJobsWithTag(tag)
            except Exception:
                pass  # cancellation is best-effort; the error below is the story
            for f in futs:  # drain: cancelled siblings may raise — irrelevant now
                try:
                    f.result()
                except Exception:
                    pass
            raise err
    return [f.result() for f in futs]
