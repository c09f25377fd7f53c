"""Round-14 hardening tests.

VERDICT r13 #1: every stateful streaming sink must route its
accumulated-state bootstrap read through ``_read_state_or_none``
(absent dir = bootstrap, corrupt dir = named RuntimeError). The r12
fix built the helper but wired only 5 of 16 call sites; the other 11
still wrapped ``spark.read.parquet(state_path)`` in a bare
``except Exception`` and silently REBUILT FROM THE CURRENT BATCH —
for the watermark ledger that silently reset the high-water mark,
re-admitting already-expired late data; for the CDC sinks it dropped
all accumulated retractions.

This file carries (a) the AST sweep that keeps the pattern from
coming back, and (b) corrupt-state regression tests for the scariest
retrofitted sinks.
"""

from __future__ import annotations

import ast
import glob
import os
import shutil

import pytest


# ---------------------------------------------------------------------------
# (a) the sweep: no try-block in stream_ops.py may contain a parquet state
# read — state reads go through _read_state_or_none, the ONE place allowed
# to try/except a read (plus the Kafka import guard, which wraps load(), not
# a state path).
# ---------------------------------------------------------------------------

_ALLOWED_TRY_FUNCS = {"_read_state_or_none", "read_kafka_stream"}


def _is_read_parquet_call(node: ast.AST) -> bool:
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "parquet"
        and isinstance(node.func.value, ast.Attribute)
        and node.func.value.attr == "read"
    )


def test_no_bare_except_around_state_reads():
    import vectordb_hr_data_spark.streaming.stream_ops as S

    tree = ast.parse(open(S.__file__).read())
    offenders: list[str] = []
    # map every Try node to its enclosing function name
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for node in ast.walk(fn):
            if not isinstance(node, ast.Try):
                continue
            if fn.name in _ALLOWED_TRY_FUNCS:
                continue
            for stmt in node.body:
                for sub in ast.walk(stmt):
                    if _is_read_parquet_call(sub):
                        offenders.append(f"{fn.name}:{node.lineno}")
    assert not offenders, (
        "state-path parquet reads wrapped in try/except (must route through "
        f"_read_state_or_none): {sorted(set(offenders))}"
    )


def test_all_sinks_call_state_reader():
    """Belt-and-braces: the module must hold at least the 16 known
    _read_state_or_none call sites (5 from r13 + 11 retrofitted + the
    heavy-hitter sink found in the r14 sweep)."""
    import vectordb_hr_data_spark.streaming.stream_ops as S

    src = open(S.__file__).read()
    assert src.count("_read_state_or_none(") >= 17  # 16 call sites + the def


# ---------------------------------------------------------------------------
# (b) corrupt-state regressions for the highest-blast-radius retrofits
# ---------------------------------------------------------------------------


def _one_file_stream(spark, tmp_path, df, tag):
    src = tmp_path / f"{tag}_src"
    src.mkdir()
    tdir = str(tmp_path / f"{tag}_part")
    df.coalesce(1).write.parquet(tdir)
    shutil.move(glob.glob(f"{tdir}/part-*.parquet")[0], str(src / "f0.parquet"))
    return spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(str(src))


def _corrupt_dir(tmp_path, name):
    d = str(tmp_path / name)
    os.makedirs(d)
    with open(os.path.join(d, "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    return d


def _events_df(spark, n=4):
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1, 12, i), i % 2, "view", 1.0, "{}")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )


def test_late_audit_corrupt_ledger_raises(spark, tmp_path):
    """The watermark ledger was the scariest silent-rebuild: a corrupted
    dir used to reset the high-water mark and re-admit expired late data."""
    from vectordb_hr_data_spark.streaming.stream_ops import stream_late_audit

    state = _corrupt_dir(tmp_path, "late_state")
    stream = _one_file_stream(spark, tmp_path, _events_df(spark), "late14")
    with pytest.raises(Exception, match="stream_late_audit.*unreadable"):
        stream_late_audit(stream, state, watermark_s=60)


def test_mergeable_agg_corrupt_state_raises(spark, tmp_path):
    """The generic associative sink backs ~15 streaming twins — a corrupt
    accumulator must raise, not restart every twin's state from one batch."""
    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.streaming.stream_ops import stream_mergeable_agg

    state = _corrupt_dir(tmp_path, "magg_state")
    stream = _one_file_stream(spark, tmp_path, _events_df(spark), "magg14")
    with pytest.raises(Exception, match="stream_mergeable_agg.*unreadable"):
        stream_mergeable_agg(
            stream,
            state,
            ["event_type"],
            [F.count("*").cast("long").alias("c")],
            [F.sum("c").cast("long").alias("c")],
        )


def test_cdc_retraction_corrupt_state_raises(spark, tmp_path):
    """A corrupt CDC accumulator used to silently drop every accumulated
    retraction (rebuild-from-batch) — the exact corruption the loud I/U/D
    op validation exists to prevent."""
    from vectordb_hr_data_spark.streaming.stream_ops import stream_cdc_retraction_agg

    state = _corrupt_dir(tmp_path, "cdc_state")
    cdc = spark.createDataFrame(
        [("I", "O", None, 100)],
        "op string, status string, before_cents long, after_cents long",
    )
    stream = _one_file_stream(spark, tmp_path, cdc, "cdc14")
    with pytest.raises(Exception, match="stream_cdc_retraction_agg.*unreadable"):
        stream_cdc_retraction_agg(stream, state)


def test_scd2_corrupt_target_raises(spark, tmp_path):
    from vectordb_hr_data_spark.streaming.stream_ops import stream_scd2_dim

    target = _corrupt_dir(tmp_path, "scd2_target")
    stream = _one_file_stream(spark, tmp_path, _events_df(spark), "scd14")
    with pytest.raises(Exception, match="stream_scd2_dim.*unreadable"):
        stream_scd2_dim(stream, target)
