"""Property tests for the r14 operators (B288-B292): independent python
replays of each deterministic algorithm plus the laws the value-hash
oracle cannot express — Page-Hinkley alarm semantics on a PLANTED level
shift, exact order-statistic identities for the watermark-lag ledger,
the survivorship rule set replayed field-by-field, brute-force longest
repeated substring, and the span-corruption budget laws.

Replays read the same sf0.001 parquet through DuckDB and recompute the
answer with plain python (fractions/sets — no SQL), so a bug shared by
the Spark plan and its oracle SQL still gets caught."""

from __future__ import annotations

import hashlib

from vectordb_hr_data_spark import queries as Q


def _oracle_rows(ddb, name):
    res = ddb.execute(Q.REGISTRY[name].oracle)
    cols = [d[0] for d in res.description]
    return [dict(zip(cols, r)) for r in res.fetchall()]


def _fast_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# B288 Page-Hinkley: python replay of the quantized statistic + alarm laws
# ---------------------------------------------------------------------------


def test_page_hinkley_replay_and_laws(ddb):
    from vectordb_hr_data_spark.querydefs.event_queries import (
        _PH_DELTA_MICRO,
        _PH_LAMBDA_MICRO,
    )

    daily = ddb.execute(
        "SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,"
        " CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1 ORDER BY d"
    ).fetchall()
    assert len(daily) >= 3
    s = 0
    m = 0
    mn = 0
    expect = []
    for rn, (d, c) in enumerate(daily, start=1):
        s += c
        q = (s * 1_000_000) // rn
        m += c * 1_000_000 - q - _PH_DELTA_MICRO
        mn = min(mn, m)
        expect.append((d, c, m, m - mn, 1 if m - mn > _PH_LAMBDA_MICRO else 0))

    got = _oracle_rows(ddb, "events_page_hinkley_drift")
    assert len(got) == len(expect)
    first_alarm_days = [r["day_epoch_days"] for r in got if r["is_first_alarm"] == 1]
    alarm_days = [r["day_epoch_days"] for r in got if r["is_alarm"] == 1]
    for row, (d, c, m_e, ph_e, al_e) in zip(got, expect):
        assert row["day_epoch_days"] == d
        assert row["n_events"] == c
        assert row["m_micro"] == m_e
        assert row["ph_micro"] == ph_e
        assert row["is_alarm"] == al_e
        # law: PH is a drawup — never negative
        assert row["ph_micro"] >= 0
    # law: first alarm is exactly the earliest alarm day (or absent)
    if alarm_days:
        assert first_alarm_days == [min(alarm_days)]
    else:
        assert first_alarm_days == []


def test_page_hinkley_planted_shift(spark, tmp_path):
    """A planted level shift must alarm AFTER the shift and never before:
    30 quiet days at 40 events/day, then 10 days at 200/day."""
    import pandas as pd

    rows = []
    eid = 0
    for day in range(40):
        n = 40 if day < 30 else 200
        for j in range(n):
            rows.append(
                (
                    eid,
                    pd.Timestamp("2024-01-01")
                    + pd.Timedelta(days=day, seconds=j * 7 % 86000),
                    j % 50,
                    "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path / "planted")
    (tmp_path / "planted").mkdir()
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "planted" / "events.parquet"))
    out = Q.REGISTRY["events_page_hinkley_drift"].fn(spark, sf).collect()
    assert len(out) == 40
    shift_day = out[30]["day_epoch_days"]
    alarms = [r["day_epoch_days"] for r in out if r["is_alarm"] == 1]
    assert alarms, "a 5x level shift must trip the lambda threshold"
    assert min(alarms) >= shift_day, "no alarm before the planted shift"
    firsts = [r for r in out if r["is_first_alarm"] == 1]
    assert len(firsts) == 1 and firsts[0]["day_epoch_days"] == min(alarms)


# ---------------------------------------------------------------------------
# B290 watermark lag: python replay of the exact order statistics
# ---------------------------------------------------------------------------


def test_watermark_lag_replay_and_laws(ddb):
    ev = ddb.execute("SELECT event_id, user_id FROM events").fetchall()
    by_src: dict[int, list[int]] = {}
    for eid, uid in ev:
        lag = _fast_hash(str(eid)) % 1800 + (3600 if eid % 97 == 0 else 0)
        by_src.setdefault(uid % 8, []).append(lag)

    got = {r["source"]: r for r in _oracle_rows(ddb, "events_ingest_watermark_lag")}
    assert set(got) == set(by_src)
    for src, lags in by_src.items():
        lags.sort()
        n = len(lags)
        row = got[src]
        assert row["n_events"] == n
        assert row["p50_lag_s"] == lags[(n + 1) // 2 - 1]
        assert row["p95_lag_s"] == lags[(n * 95 + 99) // 100 - 1]
        assert row["p99_lag_s"] == lags[(n * 99 + 99) // 100 - 1]
        assert row["n_late_60s"] == sum(1 for v in lags if v > 60)
        assert row["n_late_300s"] == sum(1 for v in lags if v > 300)
        assert row["n_late_900s"] == sum(1 for v in lags if v > 900)
        # laws: percentiles ordered, late counts anti-monotone in the delay
        assert row["p50_lag_s"] <= row["p95_lag_s"] <= row["p99_lag_s"]
        assert row["n_late_60s"] >= row["n_late_300s"] >= row["n_late_900s"]


# ---------------------------------------------------------------------------
# B289 golden record: field-by-field python replay of the survivorship rules
# ---------------------------------------------------------------------------


def test_golden_record_rules_replay(ddb):
    cust = ddb.execute(
        "SELECT c_custkey, c_name,"
        " CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT), c_mktsegment"
        " FROM customer"
    ).fetchall()
    SRC_ORD = {"app": 2, "crm": 0, "web": 1}  # lexicographic asc = app<crm<web
    tally = {
        "name": {"crm": 0, "web": 0, "app": 0},
        "bal": {"crm": 0, "web": 0, "app": 0},
    }
    seg_ties = 0
    name_len_sum = 0
    bal_sum = 0
    n_mobile = 0
    for k, name, cents, seg in cust:
        vs = [
            ("crm", 10 + k % 5, name, cents, seg),
            (
                "web",
                20 + k % 3,
                None if k % 3 == 0 else name.upper(),
                None if k % 5 == 0 else cents + k % 11 - 5,
                None if k % 2 == 0 else seg,
            ),
            (
                "app",
                15,
                name + "-verified" if k % 7 == 0 else name[: max(len(name) - 2, 1)],
                None if k % 4 == 0 else cents - 7,
                "MOBILE" if k % 13 == 0 else seg,
            ),
        ]
        named = [(s, rd, nm) for s, rd, nm, _, _ in vs if nm is not None]
        named.sort(key=lambda t: (-len(t[2]), -t[1], t[0]))
        tally["name"][named[0][0]] += 1
        name_len_sum += len(named[0][2])
        bald = [(s, rd, b) for s, rd, _, b, _ in vs if b is not None]
        bald.sort(key=lambda t: (-t[1], t[0]))
        tally["bal"][bald[0][0]] += 1
        bal_sum += bald[0][2]
        segs = [sg for _, _, _, _, sg in vs if sg is not None]
        cnt: dict[str, int] = {}
        for sg in segs:
            cnt[sg] = cnt.get(sg, 0) + 1
        mc = max(cnt.values())
        at_max = sorted(s for s, c in cnt.items() if c == mc)
        if len(at_max) > 1:
            seg_ties += 1
        if at_max[0] == "MOBILE":
            n_mobile += 1

    (row,) = _oracle_rows(ddb, "customer_golden_record")
    assert row["n_customers"] == len(cust)
    for src in ("crm", "web", "app"):
        assert row[f"name_wins_{src}"] == tally["name"][src], src
        assert row[f"bal_wins_{src}"] == tally["bal"][src], src
    assert row["seg_tie_breaks"] == seg_ties
    assert row["golden_name_len_sum"] == name_len_sum
    assert row["golden_bal_cents_sum"] == bal_sum
    assert row["n_seg_mobile"] == n_mobile
    # law: every customer yields exactly one winner per exclusive field
    assert sum(tally["name"].values()) == len(cust)
    assert sum(tally["bal"].values()) == len(cust)


# ---------------------------------------------------------------------------
# B291 longest repeat: brute force over every doc prefix
# ---------------------------------------------------------------------------


def test_longest_repeat_bruteforce(ddb):
    docs = ddb.execute("SELECT doc_id, substr(text, 1, 256) FROM documents").fetchall()

    def lrs(s: str) -> int:
        best = 0
        for ln in range(1, len(s)):
            seen = set()
            hit = False
            for i in range(len(s) - ln + 1):
                w = s[i : i + ln]
                if w in seen:
                    hit = True
                    break
                seen.add(w)
            if hit:
                best = ln
            else:
                break  # monotone: no dup at ln => none at any longer ln
        return best

    per = {d: lrs(s) for d, s in docs}
    ml = max(per.values()) if per else 0
    (row,) = _oracle_rows(ddb, "doc_longest_repeat_exact")
    assert row["max_repeat_len"] == ml
    if ml == 0:
        assert row["n_docs_at_max"] == 0 and row["min_doc_id"] == -1
    else:
        at_max = [d for d, v in per.items() if v == ml]
        assert row["n_docs_at_max"] == len(at_max)
        assert row["min_doc_id"] == min(at_max)


# ---------------------------------------------------------------------------
# B292 span corruption: layout replay + budget laws
# ---------------------------------------------------------------------------


def test_span_corruption_replay_and_budget(ddb):
    docs = ddb.execute("SELECT doc_id, text FROM documents").fetchall()
    got = {r["doc_id"]: r for r in _oracle_rows(ddb, "doc_span_corruption_plan")}
    assert set(got) == {d for d, _ in docs}
    for doc_id, text in docs:
        nt = len(text.split(" "))
        full = nt // 20
        tail = nt % 20
        starts = []
        for b in range(full + (1 if tail >= 3 else 0)):
            bs = 20 if b < full else tail
            mod = 18 if bs >= 20 else bs - 2
            st = b * 20 + _fast_hash(f"sc:{doc_id}:{b}") % mod
            # law: every span fits inside its own block
            assert st + 3 <= b * 20 + bs
            starts.append(st)
        row = got[doc_id]
        assert row["n_tokens"] == nt
        assert row["n_spans"] == len(starts)
        assert row["n_masked"] == 3 * len(starts)
        assert row["mask_rate_ppm"] == (3 * len(starts) * 1_000_000) // nt
        assert row["span_start_sum"] == sum(starts)
        # budget laws: exactly 15% when blocks divide evenly; a 1-2 token
        # tail undershoots (no room for a span); a 3..19 token tail
        # OVERSHOOTS (a full 3-token span over a short block) — the
        # realized-rate column exists precisely to expose both
        if tail == 0 and nt > 0:
            assert row["mask_rate_ppm"] == 150_000
        elif tail < 3:
            assert row["mask_rate_ppm"] < 150_000
        else:
            assert row["mask_rate_ppm"] > 150_000
            assert row["mask_rate_ppm"] <= (3 * (full + 1) * 1_000_000) // (20 * full + 3)


# ---------------------------------------------------------------------------
# B288 streaming twin: mergeable day-count state ≡ batch Page-Hinkley
# ---------------------------------------------------------------------------


def test_stream_page_hinkley_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_page_hinkley: after 4 unordered micro-batches (events split
    by event_id mod 4, so every day's count is assembled across batches)
    the from-state PH output must equal the one-shot batch query — the
    sequential statistic is confined to the reduced day table, so only
    the associative count fold has to survive the batch boundaries."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        page_hinkley_from_state,
        stream_page_hinkley,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "ph_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"ph_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "ph_state")
    stream_page_hinkley(stream, state)
    got = sorted(map(tuple, page_hinkley_from_state(spark, state).collect()))
    want = sorted(
        map(tuple, Q.REGISTRY["events_page_hinkley_drift"].fn(spark, sf_dir).collect())
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# B294 Mann-Whitney: python replay + the U-sum identity
# ---------------------------------------------------------------------------


def test_mannwhitney_replay_and_laws(ddb):
    vals = ddb.execute(
        "SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,"
        " CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " FROM events WHERE event_type IN ('click','view') AND value IS NOT NULL"
    ).fetchall()
    a = sorted(c for g, c in vals if g == 0)
    b = sorted(c for g, c in vals if g == 1)
    # exact 2×U via the direct definition: 2U1 = Σ_{i,j} 2·[a_i > b_j] + [a_i = b_j]
    import bisect

    u1_x2 = 0
    for x in a:
        lt = bisect.bisect_left(b, x)
        eq = bisect.bisect_right(b, x) - lt
        u1_x2 += 2 * lt + eq

    (row,) = _oracle_rows(ddb, "events_mannwhitney_test")
    n1, n2 = len(a), len(b)
    assert row["n_click"] == n1 and row["n_view"] == n2
    assert row["u_click_x2"] == u1_x2
    # law: U1 + U2 = n1·n2 (×2 scale)
    assert row["u_click_x2"] + row["u_view_x2"] == 2 * n1 * n2
    assert row["auc_ppm"] == u1_x2 * 1_000_000 // (2 * n1 * n2)
    assert 0 <= row["auc_ppm"] <= 1_000_000
    # law: z sign agrees with the dominance direction
    if row["u_click_x2"] > n1 * n2:
        assert row["z_milli"] >= 0
    elif row["u_click_x2"] < n1 * n2:
        assert row["z_milli"] <= 0
    # tie term replay
    from collections import Counter

    ties = Counter(a) + Counter(b)
    assert row["tie_cubes"] == sum(t**3 - t for t in ties.values())


# ---------------------------------------------------------------------------
# B295 apportionment: Hamilton replay + the quota property
# ---------------------------------------------------------------------------


def test_apportionment_replay_and_quota_property(ddb):
    strata = ddb.execute(
        "SELECT lang, source, CAST(count(*) AS BIGINT) FROM documents"
        " GROUP BY lang, source ORDER BY lang, source"
    ).fetchall()
    tot = sum(n for _, _, n in strata)
    budget = tot // 10
    base = {(l, s): budget * n // tot for l, s, n in strata}
    rem = sorted(
        ((-(budget * n % tot), l, s) for l, s, n in strata)
    )  # largest remainder first, tie lang/source asc
    leftover = budget - sum(base.values())
    extra = {(l, s) for _, l, s in rem[:leftover]}

    got = {(r["lang"], r["source"]): r for r in _oracle_rows(ddb, "sample_apportionment_plan")}
    assert set(got) == set(base)
    total_alloc = 0
    for (l, s, n) in strata:
        row = got[(l, s)]
        want = base[(l, s)] + (1 if (l, s) in extra else 0)
        assert row["final_alloc"] == want, (l, s)
        assert row["base_alloc"] == base[(l, s)]
        total_alloc += row["final_alloc"]
        # quota property: within one seat of the exact quota, never above
        # the stratum size (budget is 10% of the corpus)
        q = budget * n / tot
        assert q - 1 < row["final_alloc"] < q + 1
        assert row["final_alloc"] <= n
    # the Hamilton guarantee: the budget is hit EXACTLY
    assert total_alloc == budget


# ---------------------------------------------------------------------------
# B296 salting advisor: replay + the ceil-division guarantee
# ---------------------------------------------------------------------------


def test_salting_advisor_replay_and_guarantee(ddb):
    from vectordb_hr_data_spark.querydefs.event_queries import _SALT_TASKS

    counts = dict(
        ddb.execute("SELECT user_id, CAST(count(*) AS BIGINT) FROM events GROUP BY 1").fetchall()
    )
    total = sum(counts.values())
    target = max(total // _SALT_TASKS, 1)
    sf = {k: (c + target - 1) // target if c > target else 1 for k, c in counts.items()}
    rows = _oracle_rows(ddb, "events_salting_advisor")
    assert 1 <= len(rows) <= 10
    led = rows[0]
    assert led["target_rows_per_task"] == target
    assert led["max_before"] == max(counts.values())
    assert led["n_keys"] == len(counts)
    assert led["n_hot_keys"] == sum(1 for f in sf.values() if f > 1)
    assert led["extra_partitions"] == sum(f - 1 for f in sf.values())
    want_after = max((c + sf[k] - 1) // sf[k] for k, c in counts.items())
    assert led["max_after"] == want_after
    # the ceil-division guarantee: no salted slice exceeds the target
    assert led["max_after"] <= target
    # top rows are the largest keys, count-desc with key tie-break
    ordered = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
    for r, (k, c) in zip(rows, ordered):
        assert (r["key"], r["n_rows"], r["salt_factor"]) == (k, c, sf[k])
        assert r["rows_per_salt"] == (c + sf[k] - 1) // sf[k]


# ---------------------------------------------------------------------------
# B297 v-optimal: full-enumeration replay — the argmin is truly optimal
# ---------------------------------------------------------------------------


def test_voptimal_full_enumeration_replay(ddb):
    daily = ddb.execute(
        "SELECT CAST(floor(epoch(ts)/86400) AS BIGINT), CAST(count(*) AS BIGINT)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = [d for d, _ in daily]
    cs = [c for _, c in daily]
    D = len(cs)
    assert D >= 4
    p1 = [0]
    p2 = [0]
    for c in cs:
        p1.append(p1[-1] + c)
        p2.append(p2[-1] + c * c)

    def cost(a, b):
        s = p1[b] - p1[a]
        return (p2[b] - p2[a]) - (s * s) // (b - a)

    best = None
    for i in range(1, D - 2):
        for j in range(i + 1, D - 1):
            for k in range(j + 1, D):
                t = cost(0, i) + cost(i, j) + cost(j, k) + cost(k, D)
                cand = (t, i, j, k)
                if best is None or cand < best:
                    best = cand
    t, i, j, k = best

    rows = _oracle_rows(ddb, "events_voptimal_histogram")
    assert len(rows) == 4
    bounds = [(0, i), (i, j), (j, k), (k, D)]
    for row, (a, b) in zip(rows, bounds):
        assert row["day_lo"] == days[a]
        assert row["day_hi"] == days[b - 1]
        assert row["n_days"] == b - a
        assert row["seg_events"] == p1[b] - p1[a]
        assert row["seg_sse"] == cost(a, b)
        assert row["seg_sse"] >= 0
        assert row["total_sse"] == t
    # consistency: the four segment SSEs sum to the reported optimum
    assert sum(r["seg_sse"] for r in rows) == t
    # optimality sanity vs a naive equal-width split
    q = D // 4
    naive = cost(0, q) + cost(q, 2 * q) + cost(2 * q, 3 * q) + cost(3 * q, D)
    assert t <= naive


# ---------------------------------------------------------------------------
# B298 streaming twin: mergeable (source, lag) state ≡ batch lag ledger
# ---------------------------------------------------------------------------


def test_stream_watermark_lag_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_watermark_lag: 4 unordered micro-batches of the events feed
    must converge to the one-shot events_ingest_watermark_lag — exact
    order statistics assembled from counts that were split across
    batches."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        stream_watermark_lag,
        watermark_lag_from_state,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "wl_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"wl_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "wl_state")
    stream_watermark_lag(stream, state)
    got = sorted(map(tuple, watermark_lag_from_state(spark, state).collect()))
    want = sorted(
        map(tuple, Q.REGISTRY["events_ingest_watermark_lag"].fn(spark, sf_dir).collect())
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# B299 patch plan: replay + the patch-budget theorem
# ---------------------------------------------------------------------------


def test_patch_plan_replay_and_budget(ddb):
    doc_ids = [d for (d,) in ddb.execute("SELECT doc_id FROM documents").fetchall()]
    got = {r["doc_id"]: r for r in _oracle_rows(ddb, "multimodal_patch_plan")}
    assert set(got) == set(doc_ids)
    P, MX = 14, 896
    budget = ((MX + P - 1) // P) ** 2
    for doc_id in doc_ids:
        w = 320 + _fast_hash(f"w:{doc_id}") % 1600
        h = 240 + _fast_hash(f"h:{doc_id}") % 1080
        m = max(w, h)
        tw = (w * MX) // m if m > MX else w
        th = (h * MX) // m if m > MX else h
        px = (tw + P - 1) // P
        py = (th + P - 1) // P
        row = got[doc_id]
        assert (row["width"], row["height"]) == (w, h)
        assert (row["target_w"], row["target_h"]) == (tw, th)
        assert (row["patches_x"], row["patches_y"]) == (px, py)
        assert row["n_patches"] == px * py
        pad_area = px * P * py * P
        assert row["pad_waste_ppm"] == (pad_area - tw * th) * 1_000_000 // pad_area
        # laws: the resize never upscales, stays within the long-side cap,
        # and the plan never exceeds the token budget
        assert tw <= w and th <= h
        assert max(tw, th) <= MX
        assert row["n_patches"] <= budget
        # padding rounds UP: padded area always covers the target
        assert pad_area >= tw * th


# ---------------------------------------------------------------------------
# B300 power planner: replay + monotonicity laws
# ---------------------------------------------------------------------------


def test_ab_power_planner_replay_and_laws(ddb):
    import math

    users = ddb.execute(
        "SELECT user_id, CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))"
        " AS BIGINT) FROM events WHERE value IS NOT NULL GROUP BY user_id"
    ).fetchall()
    cents = [c for _, c in users]
    n = len(cents)
    s1 = sum(cents)
    s2 = sum(c * c for c in cents)
    var = s2 / n - (s1 / n) ** 2
    mean = s1 / n

    rows = _oracle_rows(ddb, "events_ab_power_planner")
    assert [r["mde_pct"] for r in rows] == [1, 2, 5, 10]
    prev80 = None
    for r in rows:
        assert r["n_users_measured"] == n
        assert r["mean_cents"] == s1 // n
        assert r["var_cents2"] == s2 // n - (s1 // n) ** 2
        delta = r["mde_pct"] / 100.0 * mean
        want80 = math.ceil(2.0 * var * (1.959964 + 0.841621) ** 2 / (delta * delta))
        want90 = math.ceil(2.0 * var * (1.959964 + 1.281552) ** 2 / (delta * delta))
        assert r["n_per_arm_power80"] == want80
        assert r["n_per_arm_power90"] == want90
        # laws: more power costs more users; smaller MDE costs more users
        assert r["n_per_arm_power90"] > r["n_per_arm_power80"]
        if prev80 is not None:
            assert r["n_per_arm_power80"] <= prev80
        prev80 = r["n_per_arm_power80"]


# ---------------------------------------------------------------------------
# B301 shot boundaries: replay + the no-false-boundary theorem
# ---------------------------------------------------------------------------


def test_shot_boundaries_replay_and_theorem(ddb):
    doc_ids = [d for (d,) in ddb.execute("SELECT doc_id FROM documents").fetchall()]
    got = {r["doc_id"]: r for r in _oracle_rows(ddb, "multimodal_shot_boundaries")}
    assert set(got) == set(doc_ids)
    total_planted = 0
    total_detected = 0
    for doc_id in doc_ids:
        nf = 24 + _fast_hash(f"nf:{doc_id}") % 96
        cuts = [
            f for f in range(1, nf) if _fast_hash(f"b:{doc_id}:{f}") % 8 == 0
        ]
        shot = []
        s = 0
        ci = set(cuts)
        for f in range(nf):
            if f in ci:
                s += 1
            shot.append(s)
        sig = {
            s_: (_fast_hash(f"s1:{doc_id}:{s_}"), _fast_hash(f"s2:{doc_id}:{s_}"))
            for s_ in set(shot)
        }
        det = []
        for f in range(1, nf):
            a, b = sig[shot[f - 1]], sig[shot[f]]
            dist = bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")
            if dist >= 16:
                det.append(f)
        # theorem: within a shot the distance is exactly 0 → no false cuts
        assert set(det) <= set(cuts)
        total_planted += len(cuts)
        total_detected += len(det)
        row = got[doc_id]
        n_shots = len(det) + 1
        assert row["n_frames"] == nf
        assert row["n_shots"] == n_shots
        assert row["mean_shot_len_milli"] == nf * 1000 // n_shots
        bounds = [0] + det + [nf]
        assert row["max_shot_len"] == max(b - a for a, b in zip(bounds, bounds[1:]))
        assert row["first_cut_frame"] == (det[0] if det else -1)
    # a miss needs a ≤16-of-64-bit hash collision: essentially never
    assert total_detected >= int(0.99 * total_planted)


# ---------------------------------------------------------------------------
# B302 generalization ladder: replay + the lattice monotonicity theorem
# ---------------------------------------------------------------------------


def test_generalization_ladder_replay_and_monotonicity(ddb):
    cust = ddb.execute(
        "SELECT c_nationkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " FROM customer"
    ).fetchall()

    def tdiv(x, d):
        # both engines truncate integer division toward zero (Spark div,
        # DuckDB // on integers); python // floors — replay must truncate
        return int(x / d) if x < 0 else x // d

    def qkey(nat, cents, a, g):
        qa = {0: str(cents), 1: str(tdiv(cents, 10000)), 2: str(tdiv(cents, 100000)), 3: "*"}[a]
        qg = {0: str(nat), 1: str(nat // 5), 2: "*"}[g]
        return (qa, qg)

    got = {(r["acctbal_level"], r["geo_level"]): r for r in _oracle_rows(ddb, "customer_generalization_ladder")}
    assert set(got) == {(a, g) for a in range(4) for g in range(3)}
    minsz = {}
    for a in range(4):
        for g in range(3):
            from collections import Counter

            sizes = Counter(qkey(n, c, a, g) for n, c in cust)
            row = got[(a, g)]
            assert row["min_class_size"] == min(sizes.values())
            assert row["n_classes"] == len(sizes)
            assert row["n_violating"] == sum(1 for v in sizes.values() if v < 5)
            assert row["satisfies_k"] == (1 if min(sizes.values()) >= 5 else 0)
            minsz[(a, g)] = min(sizes.values())
    # theorem: coarsening a dimension never shrinks the min class size
    for a in range(3):
        for g in range(3):
            assert minsz[(a + 1, g)] >= minsz[(a, g)]
    for a in range(4):
        for g in range(2):
            assert minsz[(a, g + 1)] >= minsz[(a, g)]
    # chosen = minimal distortion among satisfying nodes, unique
    sat = [(r["distortion_ppm"], k) for k, r in got.items() if r["satisfies_k"] == 1]
    chosen = [k for k, r in got.items() if r["chosen"] == 1]
    if sat:
        assert len(chosen) == 1 and chosen[0] == min(sat)[1]
    else:
        assert chosen == []


# ---------------------------------------------------------------------------
# B303 posting plan: replay + ledger consistency
# ---------------------------------------------------------------------------


def test_posting_plan_replay_and_ledger(ddb):
    docs = ddb.execute("SELECT doc_id, text FROM documents").fetchall()
    from collections import Counter

    df = Counter()
    for _, text in docs:
        for t in set(text.split(" ")):
            if t:
                df[t] += 1
    n_docs = len(docs)
    rows = _oracle_rows(ddb, "term_posting_plan")
    assert len(rows) == 15
    led = rows[0]
    assert led["n_docs"] == n_docs
    assert led["n_terms"] == len(df)
    assert led["total_postings"] == sum(df.values())
    assert led["total_bytes"] == 8 * sum(df.values())
    stop = {t for t, c in df.items() if c * 5 > n_docs}
    assert led["n_stopwords"] == len(stop)
    assert led["postings_cut"] == sum(df[t] for t in stop)
    assert led["bytes_cut"] == 8 * sum(df[t] for t in stop)
    ordered = sorted(df.items(), key=lambda t: (-t[1], t[0]))[:15]
    for r, (t, c) in zip(rows, ordered):
        assert (r["term"], r["df"]) == (t, c)
        assert r["posting_bytes"] == 8 * c
        assert r["skip_blocks"] == (c + 127) // 128
        assert r["is_stopword"] == (1 if c * 5 > n_docs else 0)


# ---------------------------------------------------------------------------
# B304 QTE: exact order-statistic replay + monotone quantile law
# ---------------------------------------------------------------------------


def test_qte_replay_and_laws(ddb):
    vals = ddb.execute(
        "SELECT CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8))"
        " AS BIGINT) % 2,"
        " CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " FROM events WHERE value IS NOT NULL"
    ).fetchall()
    arms = {0: sorted(c for a, c in vals if a == 0), 1: sorted(c for a, c in vals if a == 1)}
    rows = _oracle_rows(ddb, "events_quantile_treatment_effect")
    assert [r["decile"] for r in rows] == list(range(1, 10))
    prev0 = prev1 = None
    for r in rows:
        d = r["decile"]
        for arm, col in ((0, "q_arm0_cents"), (1, "q_arm1_cents")):
            n = len(arms[arm])
            k = (n * d + 9) // 10
            assert r[col] == arms[arm][k - 1], (d, arm)
        assert r["qte_cents"] == r["q_arm1_cents"] - r["q_arm0_cents"]
        # law: quantiles are non-decreasing in the decile
        if prev0 is not None:
            assert r["q_arm0_cents"] >= prev0 and r["q_arm1_cents"] >= prev1
        prev0, prev1 = r["q_arm0_cents"], r["q_arm1_cents"]


# ---------------------------------------------------------------------------
# B305 capture–recapture: replay + estimator laws
# ---------------------------------------------------------------------------


def test_capture_recapture_replay_and_laws(ddb):
    ev = ddb.execute("SELECT user_id, CAST(epoch(ts) AS BIGINT) FROM events").fetchall()
    t0 = min(t for _, t in ev)
    t1 = max(t for _, t in ev)
    w1 = {u for u, t in ev if t * 2 < t0 + t1}
    w2 = {u for u, t in ev if t * 2 >= t0 + t1}
    n1, n2, m = len(w1), len(w2), len(w1 & w2)
    observed = len(w1 | w2)
    (row,) = _oracle_rows(ddb, "events_capture_recapture")
    assert (row["n_window1"], row["n_window2"], row["n_both"]) == (n1, n2, m)
    assert row["n_observed"] == observed
    if m > 0:
        lp = n1 * n2 // m
        assert row["lp_estimate"] == lp
        assert row["coverage_ppm"] == observed * 1_000_000 // lp
        # laws: the estimate can never be below what was directly observed
        # (integer-floor slack of at most 1), and Chapman ≤ LP
        assert row["lp_estimate"] >= observed - 1
        assert row["chapman_estimate"] <= row["lp_estimate"] + 1
    assert row["chapman_estimate"] == (n1 + 1) * (n2 + 1) // (m + 1) - 1


# ---------------------------------------------------------------------------
# B306 Good-Turing: frequency-of-frequencies replay + mass law
# ---------------------------------------------------------------------------


def test_good_turing_replay_and_laws(ddb):
    from collections import Counter

    docs = ddb.execute("SELECT text FROM documents").fetchall()
    tf = Counter()
    for (text,) in docs:
        for t in text.split(" "):
            if t:
                tf[t] += 1
    ff = Counter(tf.values())
    n_tokens = sum(tf.values())
    n1, n2 = ff.get(1, 0), ff.get(2, 0)
    rows = _oracle_rows(ddb, "doc_good_turing_unseen")
    assert [r["r"] for r in rows] == [1, 2, 3, 4, 5]
    for r in rows:
        assert r["n_r"] == ff.get(r["r"], 0)
        assert r["n_tokens"] == n_tokens
        assert r["n_types"] == len(tf)
        assert (r["n1"], r["n2"]) == (n1, n2)
        assert r["unseen_mass_ppm"] == n1 * 1_000_000 // n_tokens
        # law: the unseen mass is a probability share
        assert 0 <= r["unseen_mass_ppm"] <= 1_000_000
        if n1 > 0:
            assert r["r1_star_milli"] == 2 * n2 * 1000 // n1


# ---------------------------------------------------------------------------
# B307 streaming twin: mergeable rank state ≡ batch Mann-Whitney
# ---------------------------------------------------------------------------


def test_stream_mannwhitney_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_mannwhitney: 4 unordered micro-batches must converge to the
    one-shot events_mannwhitney_test — the sorted cumulative rank walk is
    confined to the bounded count state, so only the associative count
    fold has to survive batch boundaries."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        mannwhitney_from_state,
        stream_mannwhitney,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "mw_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"mw_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "mw_state")
    stream_mannwhitney(stream, state)
    got = sorted(map(tuple, mannwhitney_from_state(spark, state).collect()))
    want = sorted(
        map(tuple, Q.REGISTRY["events_mannwhitney_test"].fn(spark, sf_dir).collect())
    )
    assert got == want and len(got) == 1


# ---------------------------------------------------------------------------
# B308 readability: python replay + bucket consistency
# ---------------------------------------------------------------------------


def test_readability_replay_and_buckets(ddb):
    import re

    docs = ddb.execute("SELECT doc_id, text FROM documents").fetchall()
    got = {r["doc_id"]: r for r in _oracle_rows(ddb, "doc_readability_score")}
    assert set(got) == {d for d, _ in docs}
    for doc_id, text in docs:
        w = len([x for x in text.split(" ") if x])
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        v = len(re.findall(r"[aeiouy]+", text.lower()))
        fl = 206835 - (1015 * w) // s - (84600 * v) // w
        row = got[doc_id]
        assert (row["n_words"], row["n_sentences"], row["n_vowel_groups"]) == (w, s, v)
        assert row["flesch_milli"] == fl
        want = (
            "very_easy"
            if fl >= 90000
            else "standard"
            if fl >= 60000
            else "difficult"
            if fl >= 30000
            else "very_difficult"
        )
        assert row["grade"] == want
