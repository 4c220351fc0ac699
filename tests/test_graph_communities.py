"""Community/cohesion/link-prediction tier (plans/graph.py additions):
python replicas at sf0.001 + the k-core fixpoint check the docstring
promises."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from crawlingbigdatavisionaid_spark.plans import registry
from crawlingbigdatavisionaid_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _q(name):
    registry._load_all()
    return registry.QUERIES[name].fn


def _trade_pairs(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    return {(r[0], r[1]) for r in rows}


def _adj(pairs):
    adj = defaultdict(set)
    for c, s in pairs:
        adj[f"c:{c}"].add(f"s:{s}")
        adj[f"s:{s}"].add(f"c:{c}")
    return adj


def test_lpa_matches_python_replica(spark):
    adj = _adj(_trade_pairs(spark))
    label = {n: n for n in adj}
    for _ in range(4):
        nxt = {}
        for n, nbrs in adj.items():
            votes = Counter(label[u] for u in nbrs)
            # highest count, then smallest label
            nxt[n] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        label = nxt
    sizes = Counter(label.values())
    want = sorted(
        (
            (lab, sz, min(n for n in label if label[n] == lab),
             max(n for n in label if label[n] == lab))
            for lab, sz in sizes.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = [
        (r["community"], r["size"], r["first_node"], r["last_node"])
        for r in _q("label_propagation_communities")(spark, SF).collect()
    ]
    assert got == want


def _kcore_python(adj, k, rounds):
    alive = set(adj)
    for _ in range(rounds):
        deg = Counter()
        for n in alive:
            deg[n] = sum(1 for u in adj[n] if u in alive)
        alive = {n for n in alive if deg[n] >= k}
    return alive


def test_kcore_matches_python_and_is_fixpoint(spark):
    adj = _adj(_trade_pairs(spark))
    core4 = _kcore_python(adj, 3, 4)
    core5 = _kcore_python(adj, 3, 5)
    # the pinned 4-round peel has converged at test scale, so the
    # reported membership IS the 3-core (docstring contract)
    assert core4 == core5
    want = {}
    for side in ("c", "s"):
        members = sorted(n for n in core4 if n.startswith(side))
        if members:
            want[side] = (len(members), members[0], members[-1])
    got = {
        r["side"]: (r["n_nodes"], r["first_node"], r["last_node"])
        for r in _q("kcore_membership")(spark, SF).collect()
    }
    assert got == want


def test_link_prediction_jaccard_replica(spark):
    pairs = _trade_pairs(spark)
    by_c = defaultdict(set)
    for c, s in pairs:
        by_c[c].add(s)
    # df-cap: drop hub customers (none expected at sf0.001, but apply
    # the same rule as both engines)
    by_c = {c: ss for c, ss in by_c.items() if len(ss) <= 64}
    by_s = defaultdict(set)
    for c, ss in by_c.items():
        for s in ss:
            by_s[s].add(c)
    common = Counter()
    for c, ss in by_c.items():
        ss = sorted(ss)
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1 :]:
                common[(s1, s2)] += 1
    scored = [
        (
            s1,
            s2,
            cm,
            len(by_s[s1]),
            len(by_s[s2]),
            1000 * cm // (len(by_s[s1]) + len(by_s[s2]) - cm),
        )
        for (s1, s2), cm in common.items()
    ]
    want = sorted(scored, key=lambda t: (-t[5], -t[2], t[0], t[1]))[:20]
    got = [
        tuple(r)
        for r in _q("link_prediction_jaccard")(spark, SF).collect()
    ]
    assert got == want


def test_wedge_cap_excludes_hubs(spark):
    """The cap must drop hub customers from PAIR GENERATION and from
    the degree denominator alike — a capped customer contributes to
    neither (both engines filter before sdeg)."""
    from crawlingbigdatavisionaid_spark.plans.graph import _WEDGE_CAP

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    deg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .groupBy("o_custkey")
        .agg(F.countDistinct("l_suppkey").alias("dc"))
        .agg(F.max("dc").alias("mx"))
        .collect()[0]["mx"]
    )
    # sanity: the synthetic graph stays under the cap, so the capped
    # and uncapped answers coincide at test scale
    assert deg <= _WEDGE_CAP
