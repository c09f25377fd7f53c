"""Round-15 bench output contract (VERDICT r14 what's-wrong #4 / next #7).

The driver parses the LAST line of bench.py's captured output as the one-
line JSON record. r13's parse failed because the self-check's recheck
chatter (stderr) trailed the JSON in the combined capture. bench.py now
emits the JSON via _emit_record() as the process's final act, strictly
after every stderr write. This test runs a real subset bench as a
subprocess with stdout+stderr COMBINED — exactly the capture mode that
broke r13 — and asserts the last line parses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_combined_capture_ends_with_json():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
        SPARK_GRAFT_CPUS="2",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "bench.py"), "acctbal_rollup"],
        cwd=here,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,  # the combined capture that broke r13
        timeout=600,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    record = json.loads(lines[-1])  # must parse — the driver contract
    assert record["metric"] == "total_query_wall_sec"
    assert record["unit"] == "sec"
    assert set(record["queries"]) == {"acctbal_rollup"}
    assert record["queries"]["acctbal_rollup"] >= 0
