"""r9 batch-2 queries: min-plus Bellman-Ford cheapest path, journey
trigrams, rolling 7-day distinct users, positional phrase search — each
pinned against a pure-Python replica at sf0.001."""

from __future__ import annotations

import re
from collections import defaultdict

from crawlingbigdatavisionaid_spark.plans import registry
from crawlingbigdatavisionaid_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _q(name):
    registry._load_all()
    return registry.QUERIES[name].fn


def test_cheapest_path_matches_bellman_ford(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey").collect()
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).collect()
    by_order = {}
    for r in orders:
        cents = int((r["o_totalprice"] * 100 + 0.5) // 1)
        by_order[r["o_orderkey"]] = (f"c:{r['o_custkey']}", cents)
    w = {}
    for r in li:
        if r["l_orderkey"] not in by_order:
            continue
        c, cents = by_order[r["l_orderkey"]]
        key = (c, f"s:{r['l_suppkey']}")
        w[key] = min(w.get(key, cents), cents)
    adj = defaultdict(list)
    for (c, s), cost in w.items():
        adj[c].append((s, cost))
        adj[s].append((c, cost))
    dist = {"s:1": 0}
    for _ in range(4):
        nxt = dict(dist)
        for n, d0 in dist.items():
            for m, cost in adj[n]:
                cand = d0 + cost
                if cand < nxt.get(m, 1 << 62):
                    nxt[m] = cand
        dist = nxt
    exp = sorted(dist.items(), key=lambda t: (t[1], t[0]))[:20]
    got = [(r["node"], r["cost"]) for r in _q("cheapest_trade_path")(spark, SF).collect()]
    assert got == exp


def test_journey_trigrams_match_python(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    hist = defaultdict(list)
    for r in ev:
        hist[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts = defaultdict(int)
    for seq in hist.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(len(types) - 2):
            counts[">".join(types[i : i + 3])] += 1
    exp = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:25]
    got = [(r["journey"], r["n"]) for r in _q("journey_trigrams_topk")(spark, SF).collect()]
    assert got == exp and len(got) == 25


def test_rolling_distinct_users_matches_python(spark):
    ev = load_table(spark, SF, "events").select("ts", "user_id").collect()
    du = {(r["ts"].date(), r["user_id"]) for r in ev}
    days = sorted({d for d, _ in du})
    exp = {}
    for t in days:
        exp[t] = len({u for d, u in du if 0 <= (t - d).days <= 6})
    got = {r["day"]: r["active_users_7d"] for r in _q("rolling_7day_distinct_users")(spark, SF).collect()}
    assert got == exp and len(got) == len(days)


def test_phrase_search_matches_regex_scan(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    counts = {}
    for r in docs:
        toks = re.findall(r"[a-z]+", (r["text"] or "").lower())
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "data" and toks[i + 1] == "query"
        )
        if n:
            counts[r["doc_id"]] = n
    exp = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:25]
    got = [(r["doc_id"], r["n_hits"]) for r in _q("phrase_search_positions")(spark, SF).collect()]
    assert got == exp and len(got) > 0


def test_ohlc_matches_python(spark):
    ev = load_table(spark, SF, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    buckets = defaultdict(list)
    for r in ev:
        hour = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets[(r["event_type"], hour)].append(
            (r["ts"], r["event_id"], r["value"])
        )
    exp = {}
    for k, rows in buckets.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        exp[k] = (rows[0][2], max(vals), min(vals), rows[-1][2], len(rows))
    got = {
        (r["event_type"], r["hour"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in _q("value_ohlc_hourly")(spark, SF).collect()
    }
    assert got == exp


def test_conversion_latency_matches_python(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_type"]))
    lats = []
    for rows in by_user.values():
        rows.sort()
        last_click = None
        for ts, et in rows:
            if et == "click":
                last_click = ts
            elif et == "purchase" and last_click is not None:
                d = ts - last_click
                lats.append(
                    (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
                )
    lats.sort()
    n = len(lats)

    def cut(p):
        import math

        return lats[math.ceil(p * n) - 1]

    [r] = _q("conversion_latency_percentiles")(spark, SF).collect()
    assert (r["n_rows"], r["p50_us"], r["p90_us"], r["p99_us"]) == (
        n, cut(0.50), cut(0.90), cut(0.99),
    )


def test_mannwhitney_matches_python_and_u_identity(spark):
    import math

    ev = load_table(spark, SF, "events").select("event_type", "value").collect()
    vals = [
        (r["event_type"], r["value"])
        for r in ev
        if r["event_type"] in ("click", "purchase") and r["value"] is not None
    ]
    allv = sorted(v for _, v in vals)
    from bisect import bisect_left, bisect_right

    def dbl(v):
        return 2 * bisect_left(allv, v) + (bisect_right(allv, v) - bisect_left(allv, v)) + 1

    exp = {}
    for g in ("click", "purchase"):
        gs = [v for t, v in vals if t == g]
        exp[g] = (len(gs), sum(dbl(v) for v in gs) - len(gs) * (len(gs) + 1))
    got = {
        r["event_type"]: (r["n"], r["u2"])
        for r in _q("mannwhitney_value_shift")(spark, SF).collect()
    }
    assert got == exp
    # U_a + U_b == n_a * n_b  (doubled: u2_a + u2_b == 2 n_a n_b)
    (na, ua), (nb, ub) = got["click"], got["purchase"]
    assert ua + ub == 2 * na * nb


def test_chisq_matches_python(spark):
    from collections import Counter

    ev = load_table(spark, SF, "events").select("event_type", "ts").collect()
    obs = Counter((r["event_type"], r["ts"].hour // 6) for r in ev)
    n = sum(obs.values())
    rt = Counter()
    ct = Counter()
    for (t, d), o in obs.items():
        rt[t] += o
        ct[d] += o
    micros = 0
    for (t, d), o in obs.items():
        num = (o * n - rt[t] * ct[d]) ** 2 * 1_000_000
        den = rt[t] * ct[d] * n * n
        micros += num // den
    [r] = _q("chisq_type_daypart")(spark, SF).collect()
    assert r["n_cells"] == len(obs)
    assert r["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert r["chi2"] == micros / 1e6
