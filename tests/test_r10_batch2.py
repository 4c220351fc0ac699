"""r10 batch-2: temporal reachability (time-respecting paths) and
first-touch session attribution — python replicas at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date, timedelta

from pyspark.sql import functions as F

from crawlingbigdatavisionaid_spark.plans import registry
from crawlingbigdatavisionaid_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _q(name):
    registry._load_all()
    return registry.QUERIES[name].fn


def test_temporal_reachability_matches_python_replica(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey", F.to_date("o_orderdate").alias("t"))
        .distinct()
        .collect()
    )
    edges = defaultdict(list)
    for r in rows:
        c, s, t = f"c:{r[0]}", f"s:{r[1]}", r[2]
        edges[c].append((s, t))
        edges[s].append((c, t))
    arr = {"s:1": date(1992, 1, 1)}
    for _ in range(4):
        nxt = dict(arr)
        for node, a in arr.items():
            for dst, t in edges.get(node, ()):
                if t >= a and (dst not in nxt or t < nxt[dst]):
                    nxt[dst] = t
        arr = nxt
    by_year = defaultdict(list)
    for node, a in arr.items():
        if node != "s:1":
            by_year[a.year].append(node)
    want = {
        y: (len(ns), min(ns), max(ns)) for y, ns in by_year.items()
    }
    got = {
        r["arrival_year"]: (r["n_nodes"], r["first_node"], r["last_node"])
        for r in _q("temporal_reachability")(spark, SF).collect()
    }
    assert got == want


def test_temporal_tighter_than_static_bfs(spark):
    """Time-respecting reachability can never exceed static
    reachability at the same hop count (temporal edges are a subset of
    usable transitions)."""
    temporal = sum(
        r["n_nodes"]
        for r in _q("temporal_reachability")(spark, SF).collect()
    )
    static = sum(
        r["n_nodes"]
        for r in _q("trade_bfs_hops")(spark, SF).collect()
        if r["hop"] > 0
    )
    assert temporal <= static


def test_attribution_matches_python_replica(spark):
    rows = (
        load_table(spark, SF, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (r["ts"], r["event_id"], r["event_type"], r["value"])
        )
    agg = defaultdict(lambda: [0, 0])
    gap = timedelta(minutes=30)
    for evs in by_user.values():
        evs.sort(key=lambda e: (e[0], e[1]))
        sessions = []
        for e in evs:
            if sessions and e[0] - sessions[-1][-1][0] <= gap:
                sessions[-1].append(e)
            else:
                sessions.append([e])
        for sess in sessions:
            first_type = min(sess)[2]
            rev = sum(
                int(math.floor(v * 100 + 0.5))
                for ts, ei, et, v in sess
                if et == "purchase" and v is not None
            )
            agg[first_type][0] += 1
            agg[first_type][1] += rev
    want = {t: tuple(v) for t, v in agg.items()}
    got = {
        r["first_touch"]: (r["n_sessions"], r["revenue_cents"])
        for r in _q("attribution_first_touch")(spark, SF).collect()
    }
    assert got == want


def test_gini_and_hhi_match_python_replicas(spark):
    orders = (
        load_table(spark, SF, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    cust = defaultdict(int)
    for r in orders:
        cust[r["o_custkey"]] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    xs = sorted(cust.values())
    n, sv = len(xs), sum(xs)
    sriv = sum(i * x for i, x in enumerate(xs, start=1))
    want_gini = (1000000 * (2 * sriv - (n + 1) * sv)) // (n * sv)
    [row] = _q("revenue_gini")(spark, SF).collect()
    assert (row["n_customers"], row["gini_micro"]) == (n, want_gini)

    li = (
        load_table(spark, SF, "lineitem")
        .select("l_suppkey", "l_extendedprice")
        .collect()
    )
    supp = defaultdict(int)
    for r in li:
        supp[r["l_suppkey"]] += int(
            math.floor(r["l_extendedprice"] * 100 + 0.5)
        )
    vs = list(supp.values())
    t = sum(vs)
    want_hhi = (10000000 * sum(v * v for v in vs)) // (t * t)
    want_cr1 = (1000 * max(vs)) // t
    [row] = _q("market_concentration_hhi")(spark, SF).collect()
    assert (row["n_suppliers"], row["hhi_milli"], row["cr1_permille"]) == (
        len(vs),
        want_hhi,
        want_cr1,
    )


def test_nation_share_sums_to_1000_per_region(spark):
    rows = _q("nation_share_of_region")(spark, SF).collect()
    by_region = defaultdict(list)
    for r in rows:
        by_region[r["region"]].append(r["share_of_region_permille"])
    for region, shares in by_region.items():
        # floors undershoot by < 1 permille per nation
        assert 1000 - len(shares) < sum(shares) <= 1000, region
    total = sum(r["share_of_total_permille"] for r in rows)
    assert 1000 - len(rows) < total <= 1000


def test_cumulative_unique_users_replica(spark):
    rows = (
        load_table(spark, SF, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "ts")
        .collect()
    )
    first = {}
    for r in rows:
        d = r["ts"].date()
        u = r["user_id"]
        if u not in first or d < first[u]:
            first[u] = d
    daily = defaultdict(int)
    for d in first.values():
        daily[d] += 1
    want = []
    cum = 0
    for d in sorted(daily):
        cum += daily[d]
        want.append((d, daily[d], cum))
    got = [
        (r["day"], r["new_users"], r["cumulative_users"])
        for r in _q("cumulative_unique_users")(spark, SF).collect()
    ]
    assert got == want
    assert got[-1][2] == len(first)


def test_ccf_lag0_equals_same_day_correlation(spark):
    """Lag 0 of the CCF is plain same-day Pearson between the two
    zero-filled series; replicate it exactly."""
    rows = (
        load_table(spark, SF, "events")
        .where(F.col("ts").isNotNull())
        .select("ts", "event_type")
        .collect()
    )
    daily = defaultdict(lambda: [0, 0])
    for r in rows:
        d = r["ts"].date()
        if r["event_type"] == "click":
            daily[d][0] += 1
        elif r["event_type"] == "purchase":
            daily[d][1] += 1
    lo, hi = min(daily), max(daily)
    days = [lo + timedelta(days=i) for i in range((hi - lo).days + 1)]
    xs = [daily[d][0] if d in daily else 0 for d in days]
    ys = [daily[d][1] if d in daily else 0 for d in days]
    n = len(days)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    want = round(
        float(n * sxy - sx * sy)
        / math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy)),
        6,
    )
    got = {
        r["lag"]: (r["n_pairs"], r["ccf"])
        for r in _q("purchase_click_ccf")(spark, SF).collect()
    }
    assert got[0] == (n, want)
    assert set(got) == set(range(8))


def test_survival_curve_monotone_and_replica(spark):
    rows = (
        load_table(spark, SF, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "ts")
        .collect()
    )
    span = {}
    for r in rows:
        d = r["ts"].date()
        u = r["user_id"]
        lo, hi = span.get(u, (d, d))
        span[u] = (min(lo, d), max(hi, d))
    days = {u: (hi - lo).days for u, (lo, hi) in span.items()}
    n = len(days)
    want = []
    for k in (0, 1, 7, 14, 28):
        s = sum(1 for v in days.values() if v >= k)
        want.append((k, s, 1000 * s // n))
    got = [
        (r["k_days"], r["survivors"], r["survival_permille"])
        for r in _q("user_survival_curve")(spark, SF).collect()
    ]
    assert got == want
    # survival is non-increasing in k, and S(0) covers everyone
    perms = [p for _, _, p in got]
    assert perms == sorted(perms, reverse=True)
    assert got[0][1] == n


def test_cohort_ltv_replica(spark):
    rows = (
        load_table(spark, SF, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_type", "value")
        .collect()
    )
    first = {}
    for r in rows:
        d = r["ts"].date()
        u = r["user_id"]
        if u not in first or d < first[u]:
            first[u] = d
    cohort = {u: d - timedelta(days=d.weekday()) for u, d in first.items()}
    csize = defaultdict(int)
    for c in cohort.values():
        csize[c] += 1
    weekly = defaultdict(int)
    for r in rows:
        if r["event_type"] != "purchase" or r["value"] is None:
            continue
        c = cohort[r["user_id"]]
        wk = (r["ts"].date() - c).days // 7
        weekly[(c, wk)] += int(math.floor(r["value"] * 100 + 0.5))
    want = []
    for c in sorted(csize):
        cum = 0
        for wk in sorted(w for (cc, w) in weekly if cc == c):
            cum += weekly[(c, wk)]
            want.append((c, wk, csize[c], cum, cum // csize[c]))
    got = [
        (
            r["cohort"],
            r["week"],
            r["cohort_users"],
            r["cum_revenue_cents"],
            r["ltv_cents_per_user"],
        )
        for r in _q("cohort_ltv_curve")(spark, SF).collect()
    ]
    assert got == want
