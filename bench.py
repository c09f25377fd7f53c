"""Headline benchmark: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The full record (all queries, repeat counts, config) is also written to
BENCH_LOCAL.json next to this file, so per-query numbers survive even when
the caller truncates stdout. Queries whose first run takes ≥1 s are re-run
to 3 samples and report the median — single-shot JVM noise at that range is
±10%, which blurred regressions in earlier rounds.

Optional argv: query names to bench (default: all registered).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SLOW_SEC = 1.0  # re-sample queries at or above this first-run time
REPEATS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vectordb_hr_data_spark.session import get_spark
    import vectordb_hr_data_spark.queries as Q

    only = set(sys.argv[1:])
    spark = get_spark("bench", cpus=cpus)
    # JVM/codegen warm-up covering the machinery the first queries would
    # otherwise absorb: scan, broadcast join, shuffle agg, sort
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(20000)
    ss = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    (
        li.join(F.broadcast(ss), li.l_suppkey == ss.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("l_quantity").alias("q"))
        .orderBy(F.col("q").desc())
        .limit(5)
        .count()
    )
    # first-touch every table once (footer/stat reads + OS page cache) so
    # per-query timings measure the query, not which one read a file first
    import vectordb_hr_data_spark.io as IO

    for t in IO.TESTDATA_TABLES:
        IO.read_table(spark, sf_dir, t).count()

    def run_once(fn) -> tuple[float, int]:
        # cold-cache every run: queries that cache internally (decontaminate,
        # minhash LSH) must not carry state into the next sample, and the
        # medians stay comparable with earlier single-shot rounds
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        return time.perf_counter() - t0, n

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    total = 0.0
    names = [n for n in sorted(Q.REGISTRY) if not only or n in only]
    for name in names:
        fn = Q.REGISTRY[name].fn
        try:
            dt, n = run_once(fn)
            runs = [dt]
            if dt >= SLOW_SEC:
                for _ in range(REPEATS - 1):
                    runs.append(run_once(fn)[0])
            med = statistics.median(runs)
            timings[name] = round(med, 3)
            samples[name] = [round(r, 3) for r in runs]
            total += med
            print(f"# {name}: {med:.3f}s ({n} rows; runs={samples[name]})", file=sys.stderr)
        except Exception as e:  # keep benching the rest; surface the failure
            timings[name] = -1.0
            samples[name] = []
            print(f"# {name}: FAILED: {e}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    record = {
        "metric": "total_query_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The ONE-LINE JSON contract requires this line to be the LAST thing the
    # process emits (r13's driver parse failed because a self-check recheck
    # line landed after it in the combined capture — VERDICT r14 item 7), so
    # the dump is deferred to _emit_record() at the very end of main(); all
    # progress/self-check chatter above goes to stderr BEFORE it.
    if only:
        # subset runs are for iteration — don't clobber the full record
        spark.stop()
        _emit_record(record)
        return
    # durable full record (stdout may be truncated by the harness)
    try:
        import glob
        import re

        here = os.path.dirname(os.path.abspath(__file__))
        local = dict(record, samples=samples, cpus=cpus, sf_dir=sf_dir,
                     n_queries=len(timings))
        with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
            json.dump(local, f, indent=1, sort_keys=True)
        # per-round untruncated twin (VERDICT r5 #6): the driver's
        # BENCH_r{N}.json captures stdout/stderr tails and has truncated
        # three rounds running (parsed: null) — write the same full record
        # under the round number the driver will stamp next, so the round
        # artifact set always contains a parseable copy
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        n_round = (max(rounds) + 1) if rounds else 1
        summary_path = os.path.join(here, f"BENCH_SUMMARY_r{n_round:02d}.json")
        with open(summary_path, "w") as f:
            json.dump(local, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"# bench record not written: {e}", file=sys.stderr)
        summary_path = None

    # ------------------------------------------------------------------
    # end-of-run self-check (VERDICT r12 item 7): the summary must parse
    # and cover the whole registry, no query may fail, and no query ≥0.5 s
    # last round may regress >2.5× without a SCALE.md note naming it
    # (format: a line containing "BENCH-NOTE: <query_name>"). The r12 rfm
    # regression shipped unnamed — this makes that impossible. Apparent
    # regressions get ONE confirmation re-measure before failing: 3-sample
    # medians on index-building queries jitter past 2.5× maybe once per
    # few hundred runs (observed: chunk_embed_ivf_search [3.0, 0.8, 1.9]
    # vs [1.9, 0.7, 0.7] an hour apart, plans identical); a REAL
    # regression reproduces, jitter does not. Re-measured values land in
    # the summary's "recheck" field so the artifact shows both numbers.
    # ------------------------------------------------------------------
    problems: list[str] = []
    if summary_path is not None:
        with open(summary_path) as f:
            chk = json.load(f)
        if chk.get("n_queries") != len(Q.REGISTRY):
            problems.append(
                f"summary covers {chk.get('n_queries')} queries, registry has "
                f"{len(Q.REGISTRY)}"
            )
        failed = sorted(n for n, t in chk["queries"].items() if t < 0)
        if failed:
            problems.append(f"failed queries: {failed}")
        prev_path = os.path.join(here, f"BENCH_SUMMARY_r{n_round - 1:02d}.json")
        if os.path.exists(prev_path):
            with open(prev_path) as f:
                prev = json.load(f)["queries"]
            try:
                with open(os.path.join(here, "SCALE.md")) as f:
                    noted = set(re.findall(r"BENCH-NOTE:\s*([A-Za-z0-9_]+)", f.read()))
            except OSError:
                noted = set()
            suspects = sorted(
                n
                for n, t in chk["queries"].items()
                if prev.get(n, 0) >= 0.5 and t > 2.5 * prev[n] and n not in noted
            )
            if suspects:
                recheck: dict[str, float] = {}
                for n in suspects:
                    runs2 = [run_once(Q.REGISTRY[n].fn)[0] for _ in range(REPEATS)]
                    recheck[n] = round(statistics.median(runs2), 3)
                    print(
                        f"# recheck {n}: {recheck[n]:.3f}s (runs={[round(r, 3) for r in runs2]})",
                        file=sys.stderr,
                    )
                if summary_path is not None:
                    chk["recheck"] = recheck
                    with open(summary_path, "w") as f:
                        json.dump(chk, f, indent=1, sort_keys=True)
                confirmed = sorted(
                    f"{n} {prev[n]:.2f}->{chk['queries'][n]:.2f}s (recheck {recheck[n]:.2f}s)"
                    for n in suspects
                    if recheck[n] > 2.5 * prev[n]
                )
                if confirmed:
                    problems.append(
                        "confirmed >2.5x regressions (add a 'BENCH-NOTE: <name>' "
                        f"line to SCALE.md or fix them): {confirmed}"
                    )
    spark.stop()
    if problems:
        # rc != 0 signals the failure; the record still goes out last so a
        # tolerant caller can read the numbers that produced it
        print("bench self-check FAILED: " + "; ".join(problems), file=sys.stderr)
        _emit_record(record)
        raise SystemExit(3)
    _emit_record(record)


def _emit_record(record: dict) -> None:
    """Print the one-line JSON as the process's FINAL output and flush.

    Everything else (progress, rechecks, self-check verdicts) writes to
    stderr strictly before this call, so a combined stdout+stderr capture
    always ends with a parseable JSON line (VERDICT r14 item 7; a unit
    test pins last-line-parses on a subset run)."""
    sys.stderr.flush()
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
