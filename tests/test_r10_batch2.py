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
