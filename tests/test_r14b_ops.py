"""Property tests for the r14 second-half operators (B309+): independent
python replays of each deterministic algorithm plus the laws the
value-hash oracle cannot express — the Little's-law full-horizon identity,
Mattson stack-distance monotonicity, Levenshtein DP replay against a
from-scratch python implementation, and the BH step-up guarantees.

Replays read the same sf0.001 parquet through DuckDB and recompute the
answer with plain python (sets/loops — no SQL), so a bug shared by the
Spark plan and its oracle SQL still gets caught."""

from __future__ import annotations

from vectordb_hr_data_spark import queries as Q


def _oracle_rows(ddb, name):
    res = ddb.execute(Q.REGISTRY[name].oracle)
    cols = [d[0] for d in res.description]
    return [dict(zip(cols, r)) for r in res.fetchall()]


# ---------------------------------------------------------------------------
# B309 Little's law: python replay + the full-horizon identity
# ---------------------------------------------------------------------------


def test_littles_law_replay_and_identity(ddb):
    iv = ddb.execute(
        "SELECT date_diff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE)),"
        " max(date_diff('day', DATE '1995-01-01', CAST(l.l_shipdate AS DATE)))"
        " FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
        " GROUP BY o.o_orderkey, o.o_orderdate"
    ).fetchall()
    n = len(iv)
    t_lo = min(o for o, _ in iv)
    t_hi = max(c for _, c in iv)
    sum_dur = sum(c - o for o, c in iv)
    rows = _oracle_rows(ddb, "orders_littles_law_audit")
    assert [r["probe_idx"] for r in rows] == list(range(1, 10))
    l_avg_milli = sum_dur * 1000 // (t_hi - t_lo)
    for r in rows:
        k = r["probe_idx"]
        probe = t_lo + (t_hi - t_lo) * k // 10
        assert r["probe_day"] == probe
        l_obs = sum(1 for o, c in iv if o <= probe < c)
        assert r["l_observed"] == l_obs
        assert r["l_timeavg_milli"] == l_avg_milli
        assert r["lambda_ppm_per_day"] == n * 1_000_000 // (t_hi - t_lo)
        assert r["w_milli_days"] == sum_dur * 1000 // n
        assert r["deviation_milli"] == l_obs * 1000 - l_avg_milli
    # Little's-law identity: λ·W == time-average L exactly (before floor),
    # so the two integer floors agree within the floor slack
    lam_w_milli = (n * sum_dur * 1000) // ((t_hi - t_lo) * n)
    assert abs(lam_w_milli - l_avg_milli) <= 1
    # truncation bias: the mean probe L cannot exceed the time-average by
    # more than the per-probe deviation spread (edges are depressed — at
    # minimum the first/last probes see ≤ the max deviation)
    obs = [r["l_observed"] * 1000 for r in rows]
    assert min(obs) <= l_avg_milli + 1000  # some probe sits at/below average


# ---------------------------------------------------------------------------
# B310 LRU hit curve: brute-force stack-distance replay + monotonicity
# ---------------------------------------------------------------------------


def test_lru_hit_curve_replay_and_monotonicity(ddb):
    ev = ddb.execute(
        "SELECT user_id,"
        " coalesce(CAST(nullif(regexp_extract(props, '[0-9]+'), '') AS BIGINT) % 16, -1),"
        " ts, event_id FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user: dict = {}
    for u, k, _, _ in ev:
        by_user.setdefault(u, []).append(k)
    n_acc = sum(len(v) for v in by_user.values())
    dists = []  # reuse distance per repeat access
    n_cold = 0
    for seq in by_user.values():
        last: dict = {}
        for i, k in enumerate(seq):
            if k in last:
                dists.append(len(set(seq[last[k] + 1 : i])))
            else:
                n_cold += 1
            last[k] = i
    rows = _oracle_rows(ddb, "events_lru_hit_curve")
    assert [r["cache_size"] for r in rows] == [1, 2, 4, 8, 16]
    prev_hits = -1
    for r in rows:
        c = r["cache_size"]
        hits = sum(1 for d in dists if d <= c - 1)
        assert r["n_accesses"] == n_acc
        assert r["n_cold_misses"] == n_cold
        assert r["n_repeat_accesses"] == n_acc - n_cold
        assert r["n_hits"] == hits
        assert r["hit_ratio_ppm"] == hits * 1_000_000 // n_acc
        # LRU inclusion property: hit count is monotone in capacity
        assert hits >= prev_hits
        prev_hits = hits
    # with the 16-slot keyspace, capacity 16 serves every repeat access
    assert rows[-1]["n_hits"] == len(dists)


# ---------------------------------------------------------------------------
# B311 edit-distance gate: from-scratch Levenshtein DP replay
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


def test_edit_distance_gate_replay(ddb):
    docs = dict(
        ddb.execute("SELECT doc_id, substr(text, 1, 200) FROM documents").fetchall()
    )
    blocks = ddb.execute(
        "SELECT doc_id, md5(substr(text, 1, 40)) FROM documents"
    ).fetchall()
    by_blk: dict = {}
    for d, b in blocks:
        by_blk.setdefault(b, []).append(d)
    expect = {}
    for ids in by_blk.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = docs[ids[i]], docs[ids[j]]
                dist = _lev(a, b)
                cap = max(len(a), len(b))
                expect[(ids[i], ids[j])] = (dist, cap)
    rows = _oracle_rows(ddb, "doc_edit_distance_gate")
    assert len(rows) == len(expect)
    for r in rows:
        dist, cap = expect[(r["doc_id_a"], r["doc_id_b"])]
        assert r["edit_distance"] == dist
        assert r["cap_len"] == cap
        assert r["norm_milli"] == dist * 1000 // cap
        assert r["is_dup"] == (1 if dist * 1000 // cap <= 150 else 0)
        # distance never exceeds the longer capped side ⇒ norm ≤ 1000
        assert 0 <= r["norm_milli"] <= 1000
    assert len(rows) > 0  # the blocking actually yields candidates


# ---------------------------------------------------------------------------
# B312 BH-FDR: step-up replay + the procedure's structural guarantees
# ---------------------------------------------------------------------------


def test_bh_fdr_replay_and_laws(ddb):
    seg = ddb.execute(
        "SELECT event_type, CAST(date_part('dow', ts) AS BIGINT),"
        " count(*), sum(CASE WHEN CAST(round(value*100) AS BIGINT) >= 5000"
        " THEN 1 ELSE 0 END) FROM events GROUP BY 1, 2"
    ).fetchall()
    nn = sum(r[2] for r in seg)
    ss = sum(r[3] for r in seg)
    m = len(seg)
    ps = []
    for et, dow, n, s in seg:
        d = s * nn - n * ss
        z2 = d * d * 1_000_000 // (n * ss * (nn - ss))
        p = min(1_000_000, 1_000_000_000_000 // max(z2, 1))
        ps.append((p, et, dow, n, s, z2))
    ps.sort(key=lambda t: (t[0], t[1], t[2]))
    raw = [p * m // (i + 1) for i, (p, *_) in enumerate(ps)]
    adj = raw[:]
    for i in range(m - 2, -1, -1):
        adj[i] = min(adj[i], adj[i + 1])
    adj = [min(1_000_000, a) for a in adj]
    rows = _oracle_rows(ddb, "events_bh_fdr_gate")
    assert len(rows) == m
    prev_adj = 0
    for i, r in enumerate(rows):
        p, et, dow, n, s, z2 = ps[i]
        assert (r["event_type"], r["dow"], r["n"], r["s"]) == (et, dow, n, s)
        assert r["z2_micro"] == z2
        assert r["p_micro"] == p
        assert r["bh_rank"] == i + 1
        assert r["adj_p_micro"] == adj[i]
        assert r["is_discovery"] == (1 if adj[i] <= 50_000 else 0)
        # step-up structure: adjusted p is monotone non-decreasing in rank
        # and never below the raw p
        assert r["adj_p_micro"] >= prev_adj
        assert r["adj_p_micro"] >= r["p_micro"]
        prev_adj = r["adj_p_micro"]
    # discoveries form a prefix of the rank order (step-up property)
    flags = [r["is_discovery"] for r in rows]
    assert flags == sorted(flags, reverse=True)


# ---------------------------------------------------------------------------
# B313 ring rebalance: python replay + the consistent-hashing theorem
# ---------------------------------------------------------------------------


def test_ring_rebalance_replay_and_no_reshuffle_theorem(ddb):
    import hashlib

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    ring = [
        (srv, vn, h32(f"ring:{srv}:{vn}")) for srv in range(9) for vn in range(16)
    ]
    doc_ids = [r[0] for r in ddb.execute("SELECT doc_id FROM documents").fetchall()]

    def assign(h, n_srv):
        best = min(
            ((pos - h) % 4294967296, srv, vn)
            for srv, vn, pos in ring
            if srv < n_srv
        )
        return best[1]

    moved = 0
    before: dict = {}
    after: dict = {}
    inbound: dict = {}
    for d in doc_ids:
        h = h32(f"doc:{d}")
        a, b = assign(h, 8), assign(h, 9)
        before[a] = before.get(a, 0) + 1
        after[b] = after.get(b, 0) + 1
        if a != b:
            moved += 1
            inbound[b] = inbound.get(b, 0) + 1
            # the consistent-hashing no-reshuffle theorem: a doc only
            # moves TO the new server, never between old servers
            assert b == 8, f"doc {d} reshuffled {a}→{b} between OLD servers"
    rows = _oracle_rows(ddb, "doc_ring_rebalance_audit")
    assert [r["server"] for r in rows] == list(range(9))
    for r in rows:
        s = r["server"]
        assert r["n_docs_before"] == before.get(s, 0)
        assert r["n_docs_after"] == after.get(s, 0)
        assert r["n_inbound"] == inbound.get(s, 0)
        assert r["total_moved"] == moved
        assert r["moved_ppm"] == moved * 1_000_000 // len(doc_ids)
        if s < 8:
            assert r["n_inbound"] == 0  # the theorem, as seen by the query
    assert rows[8]["n_docs_before"] == 0


# ---------------------------------------------------------------------------
# B314 HLL: python replay of registers + estimator bracketing
# ---------------------------------------------------------------------------


def test_hll_register_audit_replay(ddb):
    import hashlib

    users = [
        r[0] for r in ddb.execute("SELECT DISTINCT user_id FROM events").fetchall()
    ]
    regs = [0] * 64
    for u in users:
        hv = int(hashlib.md5(f"hll:{u}".encode()).hexdigest()[:12], 16)
        j, w = hv >> 42, hv & ((1 << 42) - 1)
        rank = 43 if w == 0 else 43 - w.bit_length()
        regs[j] = max(regs[j], rank)
    import math

    harmonic = sum(1 << (43 - m) for m in regs)
    est = 709340 * 64 * 64 * (1 << 43) // harmonic // 1_000_000
    v = sum(1 for m in regs if m == 0)
    lc = 64 * round(math.log(64 / v) * 1_000_000) // 1_000_000 if v else 0
    applied = lc if (est * 2 <= 5 * 64 and v > 0) else est
    (row,) = _oracle_rows(ddb, "events_hll_register_audit")
    assert row["n_registers"] == 64
    assert row["n_zero_registers"] == v
    assert row["harmonic_scaled"] == harmonic
    assert row["hll_estimate"] == est
    assert row["lc_estimate"] == lc
    assert row["applied_estimate"] == applied
    assert row["exact_distinct"] == len(users)
    assert row["err_ppm"] == abs(applied - len(users)) * 1_000_000 // len(users)
    # with the published small-range correction applied, the estimate is
    # within ±50% at any n (raw-only failed this badly at tiny n)
    assert row["err_ppm"] < 500_000


# ---------------------------------------------------------------------------
# B315 GK gamma: brute-force pair counting over the binned users
# ---------------------------------------------------------------------------


def test_gk_gamma_replay(ddb):
    per_user = ddb.execute(
        "SELECT count(*), sum(CAST(round(value*100) AS BIGINT))"
        " FROM events GROUP BY user_id"
    ).fetchall()
    binned = [(min(f, 10), min(m // 100000, 9)) for f, m in per_user]
    c = d = 0
    for i in range(len(binned)):
        for j in range(i + 1, len(binned)):
            (f1, m1), (f2, m2) = binned[i], binned[j]
            if (f1 - f2) * (m1 - m2) > 0:
                c += 1
            elif (f1 - f2) * (m1 - m2) < 0 and f1 != f2 and m1 != m2:
                d += 1
    (row,) = _oracle_rows(ddb, "events_gk_gamma_association")
    assert row["n_users"] == len(binned)
    assert row["n_concordant"] == c
    assert row["n_discordant"] == d
    if c + d:
        mag = (abs(c - d) * 1000) // (c + d)
        assert row["gamma_milli"] == (mag if c >= d else -mag)
        assert -1000 <= row["gamma_milli"] <= 1000
    else:
        assert row["gamma_milli"] == 0


# ---------------------------------------------------------------------------
# B316 newsvendor: replay + the discrete optimality condition
# ---------------------------------------------------------------------------


def test_newsvendor_replay_and_optimality(ddb):
    demand = [
        r[0]
        for r in ddb.execute(
            "SELECT count(*) FROM orders GROUP BY"
            " date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))"
        ).fetchall()
    ]
    demand.sort()
    n = len(demand)

    def cost(s, cu, co):
        return sum(cu * max(q - s, 0) + co * max(s - q, 0) for q in demand)

    rows = _oracle_rows(ddb, "orders_newsvendor_policy")
    assert len(rows) == 3
    for r in rows:
        cu, co = r["cost_underage"], r["cost_overage"]
        q_ppm = cu * 1_000_000 // (cu + co)
        assert r["fractile_ppm"] == q_ppm
        k = (q_ppm * n + 999_999) // 1_000_000
        s_star = demand[k - 1]
        assert r["n_days"] == n
        assert r["stock_level"] == s_star
        assert r["total_cost"] == cost(s_star, cu, co)
        assert r["n_underage_days"] == sum(1 for q in demand if q > s_star)
        assert r["n_overage_days"] == sum(1 for q in demand if q < s_star)
        # discrete newsvendor optimality: the critical-fractile order
        # statistic beats both integer neighbors on empirical cost
        assert cost(s_star, cu, co) <= cost(s_star + 1, cu, co)
        assert cost(s_star, cu, co) <= cost(max(s_star - 1, 0), cu, co)


# ---------------------------------------------------------------------------
# B317 streaming HLL: 4 unordered micro-batches ≡ the one-shot batch audit
# ---------------------------------------------------------------------------


def test_stream_hll_converges_to_batch(spark, sf_dir, tmp_path):
    """stream_hll: register max-merge is associative and idempotent, so
    any micro-batch split (here 4 unordered slices with overlapping
    users) must converge to the batch estimator columns exactly."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import hll_from_state, stream_hll

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "hll_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"hll_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "hll_state")
    stream_hll(stream, state)
    got = sorted(map(tuple, hll_from_state(spark, state).collect()))
    batch = Q.REGISTRY["events_hll_register_audit"].fn(spark, sf_dir)
    want = sorted(
        map(
            tuple,
            batch.select(
                "n_registers",
                "n_zero_registers",
                "harmonic_scaled",
                "hll_estimate",
                "lc_estimate",
                "applied_estimate",
            ).collect(),
        )
    )
    assert got == want and len(got) == 1


# ---------------------------------------------------------------------------
# B318 CvM: python replay + the family cross-check laws
# ---------------------------------------------------------------------------


def test_cvm_replay_and_laws(ddb):
    vals = ddb.execute(
        "SELECT CASE WHEN event_type='click' THEN 0 ELSE 1 END,"
        " CAST(round(value*100) AS BIGINT) FROM events"
        " WHERE event_type IN ('click','view') AND value IS NOT NULL"
    ).fetchall()
    from collections import Counter

    c1 = Counter(c for g, c in vals if g == 0)
    c2 = Counter(c for g, c in vals if g == 1)
    n1, n2 = sum(c1.values()), sum(c2.values())
    a = b = 0
    num = 0
    for cents in sorted(set(c1) | set(c2)):
        a += c1.get(cents, 0)
        b += c2.get(cents, 0)
        w = c1.get(cents, 0) + c2.get(cents, 0)
        num += w * (a * n2 - b * n1) ** 2
    t_micro = num * 1_000_000 // ((n1 + n2) * (n1 + n2) * n1 * n2)
    (row,) = _oracle_rows(ddb, "events_cvm_two_sample")
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["n_distinct_values"] == len(set(c1) | set(c2))
    assert row["t_micro"] == t_micro
    assert row["is_reject"] == (1 if t_micro > 461_000 else 0)
    # law: T is non-negative, and identical samples would give exactly 0
    assert t_micro >= 0
    # self-check: swapping the groups leaves T invariant (symmetry)
    a = b = 0
    num_sw = 0
    for cents in sorted(set(c1) | set(c2)):
        a += c2.get(cents, 0)
        b += c1.get(cents, 0)
        w = c1.get(cents, 0) + c2.get(cents, 0)
        num_sw += w * (a * n1 - b * n2) ** 2
    assert num_sw == num


# ---------------------------------------------------------------------------
# B319 TTL curve: python replay + monotonicity in T
# ---------------------------------------------------------------------------


def test_ttl_cache_curve_replay(ddb):
    ev = ddb.execute(
        "SELECT user_id,"
        " coalesce(CAST(nullif(regexp_extract(props, '[0-9]+'), '') AS BIGINT) % 16, -1),"
        " CAST(floor(epoch(ts)) AS BIGINT), event_id"
        " FROM events ORDER BY user_id, 3, event_id"
    ).fetchall()
    last: dict = {}
    gaps = []
    n_acc = 0
    for u, k, t, _ in ev:
        n_acc += 1
        if (u, k) in last:
            gaps.append(t - last[(u, k)])
        last[(u, k)] = t
    rows = _oracle_rows(ddb, "events_ttl_cache_curve")
    assert [r["ttl_s"] for r in rows] == [60, 300, 1800, 7200, 86400]
    prev = -1
    for r in rows:
        T = r["ttl_s"]
        hits = [g for g in gaps if g <= T]
        assert r["n_accesses"] == n_acc
        assert r["n_repeat_accesses"] == len(gaps)
        assert r["n_hits"] == len(hits)
        assert r["hit_ratio_ppm"] == len(hits) * 1_000_000 // n_acc
        assert r["mean_served_age_s"] == (sum(hits) // len(hits) if hits else 0)
        assert r["n_hits"] >= prev  # longer TTL never loses hits
        prev = r["n_hits"]


# ---------------------------------------------------------------------------
# B320 DiD: python replay + the placebo/structure laws
# ---------------------------------------------------------------------------


def test_diff_in_diff_replay_and_laws(ddb):
    ev = ddb.execute(
        "SELECT CAST(('0x' || substr(md5('did:' || CAST(user_id AS VARCHAR)), 1, 8))"
        " AS BIGINT) % 2, CAST(floor(epoch(ts)) AS BIGINT),"
        " CAST(round(value*100) AS BIGINT) FROM events"
    ).fetchall()
    t0 = min(t for _, t, _ in ev)
    t1 = max(t for _, t, _ in ev)
    cells: dict = {}
    for g, t, c in ev:
        p = 0 if t * 2 < t0 + t1 else 1
        n, s = cells.get((g, p), (0, 0))
        cells[(g, p)] = (n + 1, s + c)
    mean = {k: s * 1_000_000 // n for k, (n, s) in cells.items()}
    (row,) = _oracle_rows(ddb, "events_diff_in_diff")
    for (g, p), (n, _) in cells.items():
        tag = ("c" if g == 0 else "t") + ("_pre" if p == 0 else "_post")
        assert row[f"n_{tag}"] == n
        assert row[f"mean_{tag}"] == mean[(g, p)]
    assert row["pre_gap_micro"] == mean[(1, 0)] - mean[(0, 0)]
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    assert row["did_micro"] == did
    # structure law: DiD is antisymmetric under swapping the group labels
    did_swapped = (mean[(0, 1)] - mean[(0, 0)]) - (mean[(1, 1)] - mean[(1, 0)])
    assert did_swapped == -did
    # all four cells must be populated for the estimator to be defined
    assert len(cells) == 4


# ---------------------------------------------------------------------------
# B321 Kaplan-Meier: python replay + survival laws
# ---------------------------------------------------------------------------


def test_kaplan_meier_replay_and_laws(ddb):
    pu = ddb.execute(
        "SELECT min(floor(epoch(ts)/86400)), max(floor(epoch(ts)/86400))"
        " FROM events GROUP BY user_id"
    ).fetchall()
    h_end = max(int(b) for _, b in pu)
    life = [
        (int(b) - int(a), 0 if h_end - int(b) < 14 else 1) for a, b in pu
    ]
    from collections import Counter

    deaths = Counter(lt for lt, e in life if e)
    cens = Counter(lt for lt, e in life if not e)
    lts = sorted(set(lt for lt, _ in life))
    rows = _oracle_rows(ddb, "events_kaplan_meier_retention")
    assert [r["lifetime_days"] for r in rows] == lts
    s = 1_000_000
    at_risk = len(life)
    prev_s = 1_000_001
    for r, lt in zip(rows, lts):
        d = deaths.get(lt, 0)
        c = cens.get(lt, 0)
        assert r["n_at_risk"] == at_risk
        assert r["n_deaths"] == d
        assert r["n_censored"] == c
        assert r["hazard_micro"] == d * 1_000_000 // at_risk
        s = s * (at_risk - d) // at_risk
        assert r["survival_micro"] == s
        # survival is monotone non-increasing and in [0, 1e6]
        assert 0 <= r["survival_micro"] < prev_s + 1
        prev_s = r["survival_micro"]
        at_risk -= d + c
    assert at_risk == 0  # the life table exhausts the cohort


# ---------------------------------------------------------------------------
# B322 SPRT: python replay + walk linearity
# ---------------------------------------------------------------------------


def test_sprt_replay_and_laws(ddb):
    daily = ddb.execute(
        "SELECT CAST(floor(epoch(ts)/86400) AS BIGINT), count(*),"
        " sum(CASE WHEN CAST(round(value*100) AS BIGINT) >= 5000 THEN 1 ELSE 0 END)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    rows = _oracle_rows(ddb, "events_sprt_daily")
    assert len(rows) == len(daily)
    cs = cf = 0
    first_cross = None
    for r, (d, n, s) in zip(rows, daily):
        cs += s
        cf += n - s
        llr = cs * 117783 + cf * (-87011)
        assert (r["day_epoch_days"], r["n_trials"], r["n_successes"]) == (d, n, s)
        assert r["llr_micro"] == llr
        state = 1 if llr >= 2944439 else (-1 if llr <= -2944439 else 0)
        assert r["boundary_state"] == state
        if state != 0 and first_cross is None:
            first_cross = d
    for r in rows:
        assert r["is_first_decision"] == (
            1 if first_cross is not None and r["day_epoch_days"] == first_cross else 0
        )
    # at most one first decision
    assert sum(r["is_first_decision"] for r in rows) <= 1


# ---------------------------------------------------------------------------
# B323 EB shrinkage: replay + the between-ness and monotonicity laws
# ---------------------------------------------------------------------------


def test_eb_shrinkage_replay_and_laws(ddb):
    seg = ddb.execute(
        "SELECT event_type, CAST(date_part('dow', ts) AS BIGINT), count(*),"
        " sum(CASE WHEN CAST(round(value*100) AS BIGINT) >= 5000 THEN 1 ELSE 0 END)"
        " FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    nn = sum(r[2] for r in seg)
    m = len(seg)
    rbar = sum(r[3] for r in seg) * 1_000_000 // nn
    var = (
        sum(n * (s * 1_000_000 // n - rbar) ** 2 for _, _, n, s in seg) // nn
    )
    tau2 = max(var - rbar * (1_000_000 - rbar) // (nn // m), 1)
    k = rbar * (1_000_000 - rbar) // tau2
    rows = _oracle_rows(ddb, "events_eb_rate_shrinkage")
    assert len(rows) == m
    for r, (et, dow, n, s) in zip(rows, seg):
        raw = s * 1_000_000 // n
        shrunk = (s * 1_000_000 + k * rbar) // (n + k)
        assert (r["event_type"], r["dow"], r["n"], r["s"]) == (et, dow, n, s)
        assert r["raw_micro"] == raw
        assert r["shrunk_micro"] == shrunk
        assert r["shrink_weight_ppm"] == n * 1_000_000 // (n + k)
        assert r["prior_k"] == k
        # between-ness: shrunk lies between raw and the global rate
        lo, hi = min(raw, rbar), max(raw, rbar)
        assert lo - 1 <= shrunk <= hi + 1
    # monotone shrink weight in n
    by_n = sorted(rows, key=lambda r: r["n"])
    ws = [r["shrink_weight_ppm"] for r in by_n]
    assert ws == sorted(ws)


# ---------------------------------------------------------------------------
# B324 CvM-from-state: the shared count state serves both rank tests
# ---------------------------------------------------------------------------


def test_cvm_from_mannwhitney_state(spark, sf_dir, tmp_path):
    """cvm_from_state over the state stream_mannwhitney wrote must equal
    the one-shot events_cvm_two_sample — one mergeable count table, two
    rank tests at read time."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        cvm_from_state,
        stream_mannwhitney,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "cvm_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"cvm_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "cvm_state")
    stream_mannwhitney(stream, state)
    got = sorted(map(tuple, cvm_from_state(spark, state).collect()))
    want = sorted(
        map(tuple, Q.REGISTRY["events_cvm_two_sample"].fn(spark, sf_dir).collect())
    )
    assert got == want and len(got) == 1


# ---------------------------------------------------------------------------
# B325 l-diversity: python replay + triad consistency
# ---------------------------------------------------------------------------


def test_l_diversity_replay(ddb):
    rows_raw = ddb.execute(
        "SELECT c_nationkey,"
        " CASE WHEN c_acctbal < 0 THEN -1"
        " ELSE least(CAST(floor(c_acctbal/2000) AS BIGINT), 4) END,"
        " c_mktsegment FROM customer"
    ).fetchall()
    cls: dict = {}
    for nk, band, seg in rows_raw:
        cls.setdefault((nk, band), []).append(seg)
    got = _oracle_rows(ddb, "customer_l_diversity_audit")
    assert len(got) == len(cls)
    for r in got:
        members = cls[(r["nationkey"], r["bal_band"])]
        assert r["class_size"] == len(members)
        assert r["n_distinct_sensitive"] == len(set(members))
        assert r["satisfies_l"] == (1 if len(set(members)) >= 3 else 0)
        # l-diversity implies l-anonymity: a class with ≥l distinct
        # sensitive values has ≥l members
        if r["satisfies_l"]:
            assert r["class_size"] >= 3


# ---------------------------------------------------------------------------
# B326 gains/lift: python replay + the ranking-eval laws
# ---------------------------------------------------------------------------


def test_gains_lift_replay_and_laws(ddb):
    # reuse the registered B35 oracle's integer dot for the score replay
    clf = {
        r["doc_id"]: r["dot_milli"]
        for r in _oracle_rows(ddb, "doc_quality_classifier")
    }
    chars = dict(ddb.execute("SELECT doc_id, n_chars FROM documents").fetchall())
    med = sorted(chars.values())[(len(chars) - 1) // 2]
    # exact low median: smallest v with cum*2 >= tot
    vals = sorted(chars.values())
    tot = len(vals)
    cum = 0
    from collections import Counter

    cnt = Counter(vals)
    for v in sorted(cnt):
        cum += cnt[v]
        if cum * 2 >= tot:
            med = v
            break
    labeled = [(clf[d], 1 if chars[d] >= med else 0) for d in clf]
    support: dict = {}
    for s, p in labeled:
        c, np_ = support.get(s, (0, 0))
        support[s] = (c + 1, np_ + p)
    tot_n = sum(c for c, _ in support.values())
    tot_p = sum(p for _, p in support.values())
    per: dict = {}
    cum_before = 0
    for s in sorted(support, reverse=True):
        c, p = support[s]
        dec = min(cum_before * 10 // tot_n, 9)
        n0, p0 = per.get(dec, (0, 0))
        per[dec] = (n0 + c, p0 + p)
        cum_before += c
    rows = _oracle_rows(ddb, "doc_gains_lift_table")
    assert [r["decile"] for r in rows] == sorted(per)
    cn = cp = 0
    prev_gain = -1
    for r in rows:
        n, p = per[r["decile"]]
        cn += n
        cp += p
        assert (r["n"], r["n_pos"]) == (n, p)
        assert (r["cum_n"], r["cum_pos"]) == (cn, cp)
        assert r["gains_ppm"] == cp * 1_000_000 // tot_p
        assert r["lift_ppm"] == cp * tot_n * 1_000_000 // (cn * tot_p)
        assert r["gains_ppm"] >= prev_gain  # gains curve is monotone
        prev_gain = r["gains_ppm"]
    assert cn == tot_n and cp == tot_p
    assert rows[-1]["gains_ppm"] == 1_000_000  # the full corpus captures all


# ---------------------------------------------------------------------------
# B327 seasonal decomposition: python replay + reconstruction identity
# ---------------------------------------------------------------------------


def test_seasonal_decomposition_replay(ddb):
    daily = ddb.execute(
        "SELECT CAST(floor(epoch(ts)/86400) AS BIGINT), count(*)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = [d for d, _ in daily]
    ys = {d: y for d, y in daily}
    sum7 = {}
    for i, d in enumerate(days):
        win = days[max(0, i - 3) : i + 4]
        if len(win) == 7 and i >= 3 and i + 3 < len(days):
            sum7[d] = sum(ys[x] for x in win)
    det7 = {d: 7 * ys[d] - sum7[d] for d in sum7}
    by_dow: dict = {}
    for d, v in det7.items():
        by_dow.setdefault(d % 7, []).append((v, d))
    seasonal = {}
    for dow, vs in by_dow.items():
        vs.sort()
        seasonal[dow] = vs[(len(vs) - 1) // 2][0]
    rows = _oracle_rows(ddb, "events_seasonal_decomposition")
    assert [r["day_epoch_days"] for r in rows] == days
    for r in rows:
        d = r["day_epoch_days"]
        assert r["n_events"] == ys[d]
        assert r["dow"] == d % 7
        assert r["seasonal7"] == seasonal[d % 7]
        if d in sum7:
            assert r["is_edge"] == 0
            assert r["sum7"] == sum7[d]
            assert r["det7"] == det7[d]
            # reconstruction identity: 7y = sum7 + seasonal + residual
            assert 7 * ys[d] == r["sum7"] + r["seasonal7"] + r["resid7"]
        else:
            assert r["is_edge"] == 1
            assert r["sum7"] == -1


# ---------------------------------------------------------------------------
# B328 runs test: python replay over B327's replayed residuals
# ---------------------------------------------------------------------------


def test_residual_runs_replay(ddb):
    rows = _oracle_rows(ddb, "events_seasonal_decomposition")
    resid = [
        r["resid7"] for r in rows if r["is_edge"] == 0 and r["resid7"] != 0
    ]
    signs = [1 if x > 0 else 0 for x in resid]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n = n1 + n2
    e = 1_000_000 + 2 * n1 * n2 * 1_000_000 // n
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) * 10**12 // (n * n * (n - 1))
    z2 = (runs * 1_000_000 - e) ** 2 // max(var, 1)
    (row,) = _oracle_rows(ddb, "events_residual_runs_test")
    assert (row["n_positive"], row["n_negative"], row["n_runs"]) == (n1, n2, runs)
    assert row["expected_runs_micro"] == e
    assert row["var_runs_micro2"] == var
    assert row["z2_micro"] == z2
    assert row["is_nonrandom"] == (1 if z2 > 20_000_000 else 0)
    # structural bounds: 1 ≤ R ≤ n, and E[R] ≤ (n/2 + 1) in micro
    assert 1 <= runs <= n
    assert e <= (n * 1_000_000) // 2 + 1_000_001


# ---------------------------------------------------------------------------
# B329 bandit replay: python replay + the regret structure laws
# ---------------------------------------------------------------------------


def test_bandit_replay_and_laws(ddb):
    da = ddb.execute(
        "WITH arms AS (SELECT event_type,"
        " dense_rank() OVER (ORDER BY event_type) - 1 AS idx"
        " FROM (SELECT DISTINCT event_type FROM events))"
        " SELECT CAST(floor(epoch(e.ts)/86400) AS BIGINT), a.idx, count(*),"
        " sum(CASE WHEN CAST(round(e.value*100) AS BIGINT) >= 5000 THEN 1 ELSE 0 END)"
        " FROM events e JOIN arms a USING (event_type) GROUP BY 1, 2"
    ).fetchall()
    days: dict = {}
    for d, i, n, s in da:
        days.setdefault(d, {})[i] = (n, s)
    k = 5
    totals = {i: [0, 0] for i in range(k)}
    for cells in days.values():
        for i, (n, s) in cells.items():
            totals[i][0] += n
            totals[i][1] += s
    best = max(
        range(k),
        key=lambda i: (totals[i][1] * 10**6 // totals[i][0] if totals[i][0] else 0, -i),
    )
    cs, cn = [0] * k, [0] * k
    cum = 0
    expect = []
    for t, d in enumerate(sorted(days), start=1):
        cells = days[d]
        if t <= k:
            a = t - 1
        else:
            rates = [cs[i] * 10**6 // cn[i] if cn[i] else 0 for i in range(k)]
            a = max(range(k), key=lambda i: (rates[i], -i))
        n_a, s_a = cells.get(a, (0, 0))
        cr = s_a * 10**6 // n_a if n_a else 0
        nb, sb = cells.get(best, (0, 0))
        br = sb * 10**6 // nb if nb else 0
        cs[a] += s_a
        cn[a] += n_a
        cum += br - cr
        expect.append((t, d, a, cr, best, br - cr, cum))
    rows = _oracle_rows(ddb, "events_bandit_replay_regret")
    got = [
        (
            r["day_idx"],
            r["day_epoch_days"],
            r["chosen_arm"],
            r["chosen_rate_micro"],
            r["best_fixed_arm"],
            r["regret_micro"],
            r["cum_regret_micro"],
        )
        for r in rows
    ]
    assert got == expect
    # the first k days explore each arm exactly once, in index order
    assert [r["chosen_arm"] for r in rows[:k]] == list(range(k))
    # choosing the hindsight-best arm every day would give cum regret 0
    assert all(r["regret_micro"] == 0 for r in rows if r["chosen_arm"] == best)


# ---------------------------------------------------------------------------
# B330 Markov stationary: python replay + distribution laws
# ---------------------------------------------------------------------------


def test_markov_stationary_replay_and_laws(ddb):
    pairs = ddb.execute(
        "WITH arms AS (SELECT event_type,"
        " dense_rank() OVER (ORDER BY event_type) - 1 AS idx"
        " FROM (SELECT DISTINCT event_type FROM events)),"
        " seq AS (SELECT a.idx AS i, lead(a.idx) OVER"
        " (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS j"
        " FROM events e JOIN arms a USING (event_type))"
        " SELECT i, j, count(*) FROM seq WHERE j IS NOT NULL GROUP BY i, j"
    ).fetchall()
    k = 5
    counts = [[0] * k for _ in range(k)]
    for i, j, c in pairs:
        counts[i][j] = c
    p = []
    for i in range(k):
        tot = sum(counts[i])
        if tot == 0:
            p.append([1_000_000 if i == j else 0 for j in range(k)])
        else:
            p.append([counts[i][j] * 1_000_000 // tot for j in range(k)])
    v = [1_000_000 // k] * k
    for _ in range(24):
        v = [sum(v[i] * p[i][j] for i in range(k)) // 1_000_000 for j in range(k)]
    w = [sum(v[i] * p[i][j] for i in range(k)) // 1_000_000 for j in range(k)]
    rows = _oracle_rows(ddb, "events_markov_stationary")
    assert [r["state"] for r in rows] == list(range(k))
    for r in rows:
        assert r["stationary_micro"] == v[r["state"]]
        assert r["invariance_gap_micro"] == abs(v[r["state"]] - w[r["state"]])
        # converged: one more application moves no state by more than 0.1%
        assert r["invariance_gap_micro"] <= 1000
    # π is a (floored) probability vector: each round loses ≤ k micro to
    # the π floors plus ≤ k−1 micro per row to the p-normalization floors
    # (rows sum to ≤ 1e6), so 24 rounds keep the mass within 24·(2k−1)
    assert 1_000_000 - 24 * (2 * k - 1) <= sum(v) <= 1_000_000


# ---------------------------------------------------------------------------
# B331 Kruskal-Wallis: python replay + invariance laws
# ---------------------------------------------------------------------------


def test_kruskal_wallis_replay(ddb):
    vals = ddb.execute(
        "SELECT event_type, CAST(round(value*100) AS BIGINT) FROM events"
        " WHERE value IS NOT NULL"
    ).fetchall()
    from collections import Counter

    wv = Counter(c for _, c in vals)
    r2 = {}
    cum = 0
    for c in sorted(wv):
        r2[c] = 2 * cum + wv[c] + 1
        cum += wv[c]
    groups: dict = {}
    for g, c in vals:
        n, rr = groups.get(g, (0, 0))
        groups[g] = (n + 1, rr + r2[c])
    nn = sum(n for n, _ in groups.values())
    k = len(groups)
    s = sum(rr * rr // n for n, rr in groups.values())
    h = 3 * s * 1_000_000 // (nn * (nn + 1)) - 3 * (nn + 1) * 1_000_000
    tw = sum(w**3 - w for w in wv.values())
    n3n = nn**3 - nn
    adj = (
        h * n3n // (n3n - tw) if h >= 0 else -((-h) * n3n // (n3n - tw))
    )
    (row,) = _oracle_rows(ddb, "events_kruskal_wallis")
    assert (row["n_total"], row["n_groups"]) == (nn, k)
    assert row["h_micro"] == h
    assert row["h_tie_adj_micro"] == adj
    assert row["is_reject"] == (1 if adj > 9_488_000 else 0)
    # tie correction can only inflate |H| (n3n/(n3n−tw) ≥ 1)
    assert abs(adj) >= abs(h)


# ---------------------------------------------------------------------------
# B332 post-stratification: replay + the bias-correction law
# ---------------------------------------------------------------------------


def test_poststratified_mean_replay_and_law(ddb):
    ev = ddb.execute(
        "SELECT event_type, user_id, CAST(round(value*100) AS BIGINT) FROM events"
    ).fetchall()
    pop: dict = {}
    samp: dict = {}
    for et, u, c in ev:
        n, s = pop.get(et, (0, 0))
        pop[et] = (n + 1, s + c)
        if u % 2 == 1 or et == "click":
            n, s = samp.get(et, (0, 0))
            samp[et] = (n + 1, s + c)
    nn = sum(n for n, _ in pop.values())
    ss = sum(s for _, s in pop.values())
    sn = sum(n for n, _ in samp.values())
    ss2 = sum(s for _, s in samp.values())
    post = (
        sum(pop[et][0] * (samp[et][1] * 10**6 // samp[et][0]) for et in samp) // nn
    )
    naive = ss2 * 10**6 // sn
    true = ss * 10**6 // nn
    rows = _oracle_rows(ddb, "events_poststratified_mean")
    assert len(rows) == len(samp)
    for r in rows:
        et = r["event_type"]
        assert (r["pop_n"], r["samp_n"]) == (pop[et][0], samp[et][0])
        assert r["samp_mean_micro"] == samp[et][1] * 10**6 // samp[et][0]
        assert r["pop_share_ppm"] == pop[et][0] * 10**6 // nn
        assert r["samp_share_ppm"] == samp[et][0] * 10**6 // sn
        assert (r["naive_micro"], r["post_micro"], r["true_micro"]) == (
            naive,
            post,
            true,
        )
    # the skew is real: the click stratum is overrepresented in the sample
    click = next(r for r in rows if r["event_type"] == "click")
    assert click["samp_share_ppm"] > click["pop_share_ppm"]
    # decomposition identity: naive is the SAMPLE-share-weighted stratum
    # means and post the POPULATION-share-weighted ones — their gap is
    # exactly the composition term (within k micro of floor slack each)
    k = len(samp)
    naive_decomp = sum(
        samp[et][0] * (samp[et][1] * 10**6 // samp[et][0]) for et in samp
    ) // sn
    assert abs(naive - naive_decomp) <= k
    # post equals true when within-stratum sample means equal population
    # means; here the residual is pure within-stratum sampling noise,
    # bounded well inside 1% of the mean on this corpus
    assert abs(post - true) * 100 <= true


# ---------------------------------------------------------------------------
# B333 A/A sweep: replay + the calibration law
# ---------------------------------------------------------------------------


def test_aa_calibration_replay_and_law(ddb):
    import hashlib

    ev = ddb.execute(
        "SELECT user_id, CASE WHEN CAST(round(value*100) AS BIGINT) >= 5000"
        " THEN 1 ELSE 0 END FROM events"
    ).fetchall()
    rows = _oracle_rows(ddb, "events_aa_calibration_sweep")
    assert [r["seed"] for r in rows] == list(range(16))
    rejects = 0
    for r in rows:
        seed = r["seed"]
        n0 = s0 = n1 = s1 = 0
        for u, x in ev:
            arm = int(hashlib.md5(f"aa{seed}:{u}".encode()).hexdigest()[:8], 16) % 2
            if arm == 0:
                n0 += 1
                s0 += x
            else:
                n1 += 1
                s1 += x
        assert (r["n0"], r["s0"], r["n1"], r["s1"]) == (n0, s0, n1, s1)
        d = s0 * n1 - s1 * n0
        z2 = d * d * (n0 + n1) * 10**6 // (n0 * n1 * (s0 + s1) * (n0 + n1 - s0 - s1))
        assert r["z2_micro"] == z2
        p = min(10**6, 10**12 // max(z2, 1))
        assert r["p_micro"] == p
        assert r["is_reject"] == (1 if p <= 50_000 else 0)
        rejects += r["is_reject"]
    assert all(r["n_rejects_total"] == rejects for r in rows)
    # calibration: the Chebyshev bound is conservative at nominal 5%, so
    # 16 placebo splits should essentially never reject — allow ≤ 2
    assert rejects <= 2


# ---------------------------------------------------------------------------
# Module-constant collision sweep (the B313/_RING_VNODES lesson): a
# querydef module assigns each top-level UPPER_CASE constant exactly once.
# Oracle SQL strings are baked at decoration time but Spark bodies read
# module globals at CALL time, so a later redefinition silently
# desynchronizes the two sides — the exact bug this sweep now pins.
# ---------------------------------------------------------------------------


def test_no_duplicate_module_constants():
    import ast
    import glob
    import os

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vectordb_hr_data_spark",
        "querydefs",
    )
    offenders = []
    for path in sorted(glob.glob(os.path.join(base, "*.py"))):
        tree = ast.parse(open(path).read())
        seen: dict = {}
        for node in tree.body:
            targets = []
            if isinstance(node, ast.Assign):
                targets = [t.id for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                targets = [node.target.id]
            for name in targets:
                # constants: ALL_CAPS with optional leading underscore(s)
                core = name.lstrip("_")
                if core and core == core.upper() and any(c.isalpha() for c in core):
                    if name in seen:
                        offenders.append(f"{os.path.basename(path)}:{name}")
                    seen[name] = node.lineno
    assert not offenders, (
        "module-level constant reassigned (bakes stale oracle SQL vs live"
        f" Spark body): {offenders}"
    )


# ---------------------------------------------------------------------------
# B334 ABC/XYZ: python replay + classification laws
# ---------------------------------------------------------------------------


def test_abc_xyz_replay_and_laws(ddb):
    pd_rows = ddb.execute(
        "SELECT l_partkey,"
        " date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)),"
        " sum(CAST(l_quantity AS BIGINT)),"
        " sum(CAST(round(l_extendedprice*100) AS BIGINT))"
        " FROM lineitem GROUP BY 1, 2"
    ).fetchall()
    parts: dict = {}
    for pk, _, q, rev in pd_rows:
        n, sq, sqq, r = parts.get(pk, (0, 0, 0, 0))
        parts[pk] = (n + 1, sq + q, sqq + q * q, r + rev)
    order = sorted(parts, key=lambda pk: (-parts[pk][3], pk))
    tot_rev = sum(v[3] for v in parts.values())
    cum = 0
    expect = {}
    for pk in order:
        n, sq, sqq, rev = parts[pk]
        cum += rev
        abc = "A" if cum * 100 <= tot_rev * 80 else ("B" if cum * 100 <= tot_rev * 95 else "C")
        cv2 = n * sqq * 1_000_000 // (sq * sq) - 1_000_000 if sq > 0 else 0
        xyz = "X" if cv2 < 62_500 else ("Y" if cv2 < 250_000 else "Z")
        expect[pk] = (n, rev, cum * 1_000_000 // tot_rev, abc, cv2, xyz)
    rows = _oracle_rows(ddb, "part_abc_xyz_classification")
    assert len(rows) == len(parts)
    for r in rows:
        n, rev, cum_ppm, abc, cv2, xyz = expect[r["partkey"]]
        assert (r["n_days"], r["revenue_cents"]) == (n, rev)
        assert r["cum_rev_ppm"] == cum_ppm
        assert (r["abc_class"], r["xyz_class"]) == (abc, xyz)
        assert r["cv2_ppm"] == cv2
        assert r["cv2_ppm"] >= 0  # CV² is non-negative by Cauchy-Schwarz
    # the Pareto property: A-class parts are a minority holding ≥80% share
    a = [r for r in rows if r["abc_class"] == "A"]
    assert 0 < len(a) < len(rows)


# ---------------------------------------------------------------------------
# B335 lag profile: python replay + percentile ordering law
# ---------------------------------------------------------------------------


def test_fulfillment_lag_replay(ddb):
    lag_rows = ddb.execute(
        "SELECT o.o_orderpriority,"
        " min(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)))"
        " FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
        " GROUP BY o.o_orderkey, o.o_orderpriority"
    ).fetchall()
    by_prio: dict = {}
    backdated: dict = {}
    for p, d in lag_rows:
        by_prio.setdefault(p, []).append(max(d, 0))
        backdated[p] = backdated.get(p, 0) + (1 if d < 0 else 0)
    rows = _oracle_rows(ddb, "orders_fulfillment_lag_profile")
    assert len(rows) == len(by_prio)
    for r in rows:
        lags = sorted(by_prio[r["order_priority"]])
        n = len(lags)

        def pct(p):
            # smallest lag whose cumulative count reaches ceil(p·n/100)
            k = -(-p * n // 100)
            return lags[k - 1]

        assert r["n_orders"] == n
        assert r["n_backdated"] == backdated[r["order_priority"]]
        assert r["mean_lag_milli_days"] == sum(lags) * 1000 // n
        assert r["p50_days"] == pct(50)
        assert r["p90_days"] == pct(90)
        assert r["p99_days"] == pct(99)
        assert r["max_days"] == lags[-1]
        # order statistics are monotone in p
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"] <= r["max_days"]


# ---------------------------------------------------------------------------
# B336 Youden: python replay + argmax/tie-break laws
# ---------------------------------------------------------------------------


def test_youden_threshold_replay(ddb):
    clf = {
        r["doc_id"]: r["dot_milli"] for r in _oracle_rows(ddb, "doc_quality_classifier")
    }
    chars = dict(ddb.execute("SELECT doc_id, n_chars FROM documents").fetchall())
    from collections import Counter

    cnt = Counter(chars.values())
    tot = len(chars)
    cum = 0
    for v in sorted(cnt):
        cum += cnt[v]
        if cum * 2 >= tot:
            med = v
            break
    labeled = [(clf[d], 1 if chars[d] >= med else 0) for d in clf]
    support: dict = {}
    for s, p in labeled:
        c, np_ = support.get(s, (0, 0))
        support[s] = (c + 1, np_ + p)
    p_tot = sum(p for _, p in support.values())
    n_tot = sum(c - p for c, p in support.values())
    expect = []
    tp = fp = 0
    for s in sorted(support, reverse=True):
        c, p = support[s]
        tp += p
        fp += c - p
        tpr = tp * 10**6 // p_tot
        fpr = fp * 10**6 // n_tot
        expect.append((s, tp, fp, tpr, fpr, tpr - fpr))
    jmax = max(e[5] for e in expect)
    cbest = min(e[0] for e in expect if e[5] == jmax)
    rows = _oracle_rows(ddb, "doc_youden_threshold")
    assert len(rows) == len(expect)
    for r, e in zip(rows, expect):
        assert (
            r["cut_milli"],
            r["tp"],
            r["fp"],
            r["tpr_ppm"],
            r["fpr_ppm"],
            r["j_micro"],
        ) == e
        assert r["is_best"] == (1 if (e[5], e[0]) == (jmax, cbest) else 0)
    assert sum(r["is_best"] for r in rows) == 1
    # the most permissive cut classifies everything positive: TPR = FPR = 1
    last = rows[-1]
    assert last["tpr_ppm"] == 1_000_000 and last["fpr_ppm"] == 1_000_000
    assert last["j_micro"] == 0


# ---------------------------------------------------------------------------
# B337 streamed segment counts: one state, two read views ≡ their batches
# ---------------------------------------------------------------------------


def test_segment_count_state_serves_both_views(spark, sf_dir, tmp_path):
    """stream_segment_counts: 4 unordered micro-batches; bh_fdr_from_state
    and eb_from_state over that ONE state must equal the one-shot B312 and
    B323 queries exactly."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        bh_fdr_from_state,
        eb_from_state,
        stream_segment_counts,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "segc_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"segc_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "segc_state")
    stream_segment_counts(stream, state)
    for view, batch_name in [
        (bh_fdr_from_state, "events_bh_fdr_gate"),
        (eb_from_state, "events_eb_rate_shrinkage"),
    ]:
        got = sorted(map(tuple, view(spark, state).collect()))
        want = sorted(map(tuple, Q.REGISTRY[batch_name].fn(spark, sf_dir).collect()))
        assert got == want and len(got) > 0, batch_name


# ---------------------------------------------------------------------------
# B338 Simpson diversity: python replay + Hill-number bounds
# ---------------------------------------------------------------------------


def test_simpson_diversity_replay_and_bounds(ddb):
    from collections import Counter

    docs = ddb.execute("SELECT source, text FROM documents").fetchall()
    by_src: dict = {}
    for src, text in docs:
        cnt = by_src.setdefault(src, Counter())
        for t in text.split(" "):
            if t:
                cnt[t] += 1
    rows = _oracle_rows(ddb, "doc_source_simpson_diversity")
    assert len(rows) == len(by_src)
    for r in rows:
        cnt = by_src[r["source"]]
        n = sum(cnt.values())
        v = len(cnt)
        coll = sum(c * (c - 1) for c in cnt.values())
        assert (r["n_tokens"], r["n_vocab"]) == (n, v)
        assert r["simpson_repeat_ppm"] == coll * 10**6 // (n * (n - 1))
        eff = n * (n - 1) * 1000 // coll if coll else v * 1000
        assert r["effective_vocab_milli"] == eff
        # provable bounds for the UNBIASED estimator: ≥ 1, ≤ n−1 (it may
        # legitimately exceed the raw vocab on near-uniform counts — the
        # without-replacement correction — so v is NOT an upper bound)
        assert 1000 <= eff <= (n - 1) * 1000
        # and the biased (with-replacement) version IS capped by v:
        sq = sum(c * c for c in cnt.values())
        assert sq * v >= n * n  # Σp² ≥ 1/v  ⇔  biased eff ≤ v


# ---------------------------------------------------------------------------
# B339 streamed score support: one state, gains AND Youden views ≡ batch
# ---------------------------------------------------------------------------


def test_score_support_state_serves_both_views(spark, sf_dir, tmp_path):
    """stream_score_support: 4 unordered document micro-batches; the
    gains and Youden read views over that ONE state must equal the
    one-shot B326/B336 queries — including the label median, which
    re-derives over the streamed char marginal at read time."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        gains_from_state,
        stream_score_support,
        youden_from_state,
    )

    docs = read_table(spark, sf_dir, "documents")
    src = tmp_path / "score_src"
    src.mkdir()
    for i in range(4):
        part = docs.filter((F.col("doc_id") % 4) == i)
        tdir = str(tmp_path / f"score_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(
        str(src)
    )
    state = str(tmp_path / "score_state")
    stream_score_support(stream, state)
    for view, batch_name in [
        (gains_from_state, "doc_gains_lift_table"),
        (youden_from_state, "doc_youden_threshold"),
    ]:
        got = sorted(map(tuple, view(spark, state).collect()))
        want = sorted(map(tuple, Q.REGISTRY[batch_name].fn(spark, sf_dir).collect()))
        assert got == want and len(got) > 0, batch_name


# ---------------------------------------------------------------------------
# B340 HHI: python replay + concentration laws
# ---------------------------------------------------------------------------


def test_supplier_hhi_replay_and_laws(ddb):
    sr = ddb.execute(
        "SELECT s.s_nationkey, l.l_suppkey,"
        " sum(CAST(round(l.l_extendedprice*100) AS BIGINT))"
        " FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey"
        " GROUP BY 1, 2"
    ).fetchall()
    by_nat: dict = {}
    for nk, _, r in sr:
        by_nat.setdefault(nk, []).append(r)
    rows = _oracle_rows(ddb, "supplier_revenue_hhi")
    assert len(rows) == len(by_nat)
    for r in rows:
        revs = by_nat[r["nationkey"]]
        tot = sum(revs)
        r2 = sum(x * x for x in revs)
        hhi = r2 * 10**6 // (tot * tot)
        assert r["n_suppliers"] == len(revs)
        assert r["total_revenue_cents"] == tot
        assert r["hhi_ppm"] == hhi
        assert r["effective_suppliers_milli"] == tot * tot * 1000 // r2
        want = "high" if hhi >= 250_000 else ("moderate" if hhi >= 150_000 else "low")
        assert r["concentration"] == want
        # bounds: 1/n ≤ HHI ≤ 1, and effective count ≤ raw count
        n = len(revs)
        assert 10**6 // n - 1 <= hhi <= 10**6
        assert r["effective_suppliers_milli"] <= n * 1000 + 1000


# ---------------------------------------------------------------------------
# B341 streamed daily counts: ONE state, THREE sequential-statistic views
# ---------------------------------------------------------------------------


def test_daily_count_state_serves_three_views(spark, sf_dir, tmp_path):
    """stream_daily_counts: 4 unordered micro-batches; the seasonal
    decomposition, the residual runs test, and the SPRT walk over that
    ONE state must equal their one-shot batch queries — the sequential
    statistics live entirely in the read-time views."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from vectordb_hr_data_spark.io import read_table
    from vectordb_hr_data_spark.streaming.stream_ops import (
        runs_from_state,
        seasonal_from_state,
        sprt_from_state,
        stream_daily_counts,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "daily_src"
    src.mkdir()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        tdir = str(tmp_path / f"daily_part{i}")
        part.coalesce(1).write.parquet(tdir)
        pf = glob.glob(f"{tdir}/part-*.parquet")[0]
        dst = str(src / f"f{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    state = str(tmp_path / "daily_state")
    stream_daily_counts(stream, state)
    for view, batch_name in [
        (seasonal_from_state, "events_seasonal_decomposition"),
        (runs_from_state, "events_residual_runs_test"),
        (sprt_from_state, "events_sprt_daily"),
    ]:
        got = sorted(map(tuple, view(spark, state).collect()))
        want = sorted(map(tuple, Q.REGISTRY[batch_name].fn(spark, sf_dir).collect()))
        assert got == want and len(got) > 0, batch_name


# ---------------------------------------------------------------------------
# B342 doubly-robust OPE: python replay + the DR structure laws
# ---------------------------------------------------------------------------


def test_dr_policy_eval_replay_and_laws(ddb):
    ev = ddb.execute(
        "SELECT event_id, CAST(user_id % 4 AS BIGINT), event_type,"
        " CAST(round(value*100) AS BIGINT) FROM events"
    ).fetchall()
    from collections import defaultdict

    g = defaultdict(lambda: [0, 0])
    qtr = defaultdict(lambda: [0, 0])
    h = defaultdict(lambda: [0, 0])
    n_eval = 0
    for eid, seg, act, cents in ev:
        g[(seg, act)][0] += 1
        g[(seg, act)][1] += cents
        if eid % 2 == 1:
            qtr[(seg, act)][0] += 1
            qtr[(seg, act)][1] += cents
        else:
            h[(seg, act)][0] += 1
            h[(seg, act)][1] += cents
            n_eval += 1
    n_seg = defaultdict(int)
    for (seg, _), (c, _) in g.items():
        n_seg[seg] += c
    q = {k: r * 10**6 // c for k, (c, r) in qtr.items()}
    segs = sorted(n_seg)
    pols = {}
    pols["mode"] = {
        s: min((a for (s2, a) in g if s2 == s), key=lambda a: (-g[(s, a)][0], a))
        for s in segs
    }
    pols["value"] = {
        s: min(
            (a for (s2, a) in g if s2 == s),
            key=lambda a: (-(g[(s, a)][1] * 10**6 // g[(s, a)][0]), a),
        )
        for s in segs
    }
    nh = defaultdict(int)
    for (seg, _), (ch, _) in h.items():
        nh[seg] += ch
    rows = {r["policy"]: r for r in _oracle_rows(ddb, "events_dr_policy_eval")}
    assert set(rows) == {"mode", "value"}
    for pname, pi in pols.items():
        dm_num = sum(nh[s] * q.get((s, pi[s]), 0) for s in segs)
        corr_num = 0
        ips_num = 0
        for s in segs:
            a = pi[s]
            if (s, a) not in h:
                continue
            ch, rh = h[(s, a)]
            c = g[(s, a)][0]
            qv = q.get((s, a), 0)
            num = rh * 10**6 - ch * qv
            t = (num * n_seg[s]) // c if num >= 0 else -(((-num) * n_seg[s]) // c)
            corr_num += t
            ips_num += rh * 10**6 * n_seg[s] // c
        r = rows[pname]
        dm_v = dm_num // n_eval
        corr_v = corr_num // n_eval if corr_num >= 0 else -((-corr_num) // n_eval)
        assert r["n_eval"] == n_eval
        assert r["dm_value_micro"] == dm_v
        assert r["correction_micro"] == corr_v
        assert r["dr_value_micro"] == dm_v + corr_v
        assert r["ips_value_micro"] == ips_num // n_eval
        # structure: DR = DM + correction, where the correction pulls
        # toward the observed rewards; it need not sit inside [DM, IPS]
        # in general, but it cannot land FARTHER from IPS than DM does
        # beyond the floor/propensity-mismatch scale
        assert abs(r["dr_value_micro"] - r["ips_value_micro"]) <= abs(
            r["dm_value_micro"] - r["ips_value_micro"]
        ) + 10**6


# ---------------------------------------------------------------------------
# B343 Mann-Kendall: python replay + antisymmetry law
# ---------------------------------------------------------------------------


def test_mann_kendall_replay_and_laws(ddb):
    daily = ddb.execute(
        "SELECT CAST(floor(epoch(ts)/86400) AS BIGINT), count(*)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ys = [y for _, y in daily]
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else (-1 if ys[j] < ys[i] else 0))
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(ys)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) // 18
    z2 = 0 if abs(s) <= 1 or var_s == 0 else (abs(s) - 1) ** 2 * 10**6 // var_s
    (row,) = _oracle_rows(ddb, "events_mann_kendall_trend")
    assert (row["mk_s"], row["n_days"]) == (s, n)
    assert row["n_pairs"] == n * (n - 1) // 2
    assert row["var_s"] == var_s
    assert row["z2_micro"] == z2
    assert row["trend_sign"] == (1 if s > 0 else (-1 if s < 0 else 0))
    assert row["is_trend"] == (1 if z2 > 20_000_000 else 0)
    # bounds: |S| ≤ n_pairs, and reversing time flips the sign exactly
    assert abs(s) <= row["n_pairs"]
    s_rev = sum(
        (1 if ys[::-1][j] > ys[::-1][i] else (-1 if ys[::-1][j] < ys[::-1][i] else 0))
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert s_rev == -s


# ---------------------------------------------------------------------------
# B344 changepoint: python replay + argmax optimality
# ---------------------------------------------------------------------------


def test_single_changepoint_replay(ddb):
    daily = ddb.execute(
        "SELECT CAST(floor(epoch(ts)/86400) AS BIGINT), count(*)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    n = len(daily)
    sn = sum(y for _, y in daily)
    st = 0
    best = None
    for t, (d, y) in enumerate(daily, start=1):
        st += y
        if t >= n:
            break
        dv = abs(st * n - t * sn)
        if best is None or dv > best[0] or (dv == best[0] and d < best[1]):
            best = (dv, d, t, st)
    dv, d_star, t_star, st_star = best
    (row,) = _oracle_rows(ddb, "events_single_changepoint")
    assert (row["split_day"], row["split_pos"], row["n_days"]) == (d_star, t_star, n)
    assert row["deviation_scaled"] == dv // n
    assert row["left_mean_micro"] == st_star * 10**6 // t_star
    assert row["right_mean_micro"] == (sn - st_star) * 10**6 // (n - t_star)
    assert row["shift_micro"] == row["right_mean_micro"] - row["left_mean_micro"]
    # optimality: no other split has a strictly larger deviation
    st = 0
    for t, (d, y) in enumerate(daily, start=1):
        st += y
        if t < n:
            assert abs(st * n - t * sn) <= dv


# ---------------------------------------------------------------------------
# B345 Borda fusion: python replay + positional-rule laws
# ---------------------------------------------------------------------------


def test_borda_fusion_replay(ddb):
    clf = {
        r["doc_id"]: r["dot_milli"] for r in _oracle_rows(ddb, "doc_quality_classifier")
    }
    chars = dict(ddb.execute("SELECT doc_id, n_chars FROM documents").fetchall())
    n = len(chars)
    from collections import Counter

    def midranks_desc(vals):
        cnt = Counter(vals)
        r2 = {}
        cum = 0
        for v in sorted(cnt, reverse=True):
            r2[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        return r2

    ra = midranks_desc(list(clf.values()))
    rb = midranks_desc(list(chars.values()))
    fused = sorted(
        (
            (4 * (n + 1) - ra[clf[d]] - rb[chars[d]], -d)
            for d in clf
        ),
        reverse=True,
    )[:20]
    expect = {(-md, b2) for b2, md in fused}
    rows = _oracle_rows(ddb, "doc_borda_fusion")
    assert len(rows) == 20
    for r in rows:
        d = r["doc_id"]
        assert r["dot_milli"] == clf[d]
        assert r["n_chars"] == chars[d]
        assert r["r2_score"] == ra[clf[d]]
        assert r["r2_length"] == rb[chars[d]]
        assert r["borda2"] == 4 * (n + 1) - ra[clf[d]] - rb[chars[d]]
        assert (d, r["borda2"]) in expect
        # doubled midranks live in [3, 2n+...]: each r2 ∈ [w+1, 2n−w+1]
        assert 3 <= r["r2_score"] <= 2 * n
        # Borda points bounded by the two best-possible positions
        assert r["borda2"] <= 4 * (n + 1) - 6
