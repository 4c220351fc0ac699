"""Time-series diagnostics (plans/timeseries.py): python replicas at
sf0.001 pin the semantics the DuckDB oracles then cross-check at sf0.01."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date, timedelta

from pyspark.sql import functions as F

from crawlingbigdatavisionaid_spark.plans import registry
from crawlingbigdatavisionaid_spark.sources import load_table

SF = "/root/testdata/sf0.001"
EPOCH = date(1992, 1, 1)


def _q(name):
    registry._load_all()
    return registry.QUERIES[name].fn


def _daily_order_cents(spark):
    rows = (
        load_table(spark, SF, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily = defaultdict(int)
    for r in rows:
        idx = (r["o_orderdate"].date() - EPOCH).days
        daily[idx] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    return daily


def test_acf_matches_python_replica(spark):
    daily = _daily_order_cents(spark)
    lo, hi = min(daily), max(daily)
    series = [daily.get(i, 0) for i in range(lo, hi + 1)]
    want = {}
    for lag in range(1, 8):
        x = series[lag:]  # a.idx = b.idx + lag -> x leads
        y = series[: len(series) - lag]
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        syy = sum(b * b for b in y)
        r = float(n * sxy - sx * sy) / math.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy)
        )
        want[lag] = (n, round(r, 6))
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in _q("daily_revenue_acf")(spark, SF).collect()
    }
    assert got == want


def test_cusum_matches_python_replica(spark):
    rows = (
        load_table(spark, SF, "events")
        .where(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & (F.col("event_type") == "purchase")
        )
        .select("ts", "value")
        .collect()
    )
    daily = defaultdict(int)
    for r in rows:
        daily[r["ts"].date()] += int(math.floor(r["value"] * 100 + 0.5))
    days = sorted(daily)
    n, t = len(days), sum(daily.values())
    best = None
    cum = 0
    for k, d in enumerate(days, start=1):
        cum += daily[d]
        s = n * cum - k * t
        # argmax by (abs desc, day asc)
        if best is None or (abs(s), -(d - EPOCH).days) > best[0]:
            best = ((abs(s), -(d - EPOCH).days), (d, s))
    want_day, want_s = best[1]
    [row] = _q("cusum_changepoint_day")(spark, SF).collect()
    assert row["day"] == want_day
    assert row["cusum_scaled"] == want_s
    assert row["side"] == ("up" if want_s >= 0 else "down")


def test_dow_profile_exact_permille(spark):
    daily = _daily_order_cents(spark)
    g = defaultdict(lambda: [0, 0])
    for idx, v in daily.items():
        isodow = (EPOCH + timedelta(days=idx)).isoweekday()
        g[isodow][0] += 1
        g[isodow][1] += v
    n_all = sum(v[0] for v in g.values())
    s_all = sum(v[1] for v in g.values())
    want = {
        dow: (nd, c, (c * n_all * 1000) // (nd * s_all))
        for dow, (nd, c) in g.items()
    }
    got = {
        r["isodow"]: (r["n_days"], r["revenue_cents"], r["seasonal_permille"])
        for r in _q("dow_seasonal_profile")(spark, SF).collect()
    }
    assert got == want
    # day-weighted mean of the permille indices is ~1000 by construction
    # (each index floors, so the mean can undershoot by < 1 permille)
    wmean = sum(nd * p for nd, c, p in want.values()) // n_all
    assert wmean in range(994, 1001)


def test_decayed_leaderboard_matches_python_replica(spark):
    rows = (
        load_table(spark, SF, "events")
        .where(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & (F.col("event_type") == "purchase")
        )
        .select("user_id", "ts", "value")
        .collect()
    )
    ref = max(r["ts"].date() for r in rows)
    score = defaultdict(int)
    for r in rows:
        age_w = min((ref - r["ts"].date()).days // 7, 8)
        score[r["user_id"]] += (
            int(math.floor(r["value"] * 100 + 0.5)) << (8 - age_w)
        )
    want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["user_id"], r["decayed_score_cents"])
        for r in _q("decayed_user_leaderboard")(spark, SF).collect()
    ]
    assert got == want
    # recency dominance: a this-week purchase outweighs the same cents
    # made >=8 weeks ago by exactly 256x in the score
    assert (1 << 8) == 256


def test_theilsen_matches_python_replica(spark):
    daily = sorted(_daily_order_cents(spark).items())
    slopes = []
    saw_negative_inexact = False
    for i in range(len(daily)):
        ia, va = daily[i]
        for j in range(i + 1, len(daily)):
            ib, vb = daily[j]
            dx = ib - ia
            num = (vb - va) * 10**6
            if num < 0 and num % dx != 0:
                saw_negative_inexact = True
            # Python // IS floor — the engines replicate it via the
            # sign-correct correction in _floor_div_sql
            slopes.append(num // dx)
    # the data must actually exercise the trunc-vs-floor divergence,
    # otherwise this replica proves nothing (r10 advice: the old shift
    # passed only because affected quotients happened to be exact)
    assert saw_negative_inexact
    slopes.sort()
    n = len(slopes)
    want = slopes[math.ceil(0.5 * n) - 1]
    [row] = _q("theilsen_trend")(spark, SF).collect()
    assert row["n_pairs"] == n
    assert row["slope_micros"] == want


def test_theilsen_negative_slope_rounding(spark):
    """The sign-correct floor must make BOTH engines agree with Python
    floor for NEGATIVE inexact slopes — the exact case trunc-toward-zero
    gets wrong (trunc(-7/2) = -3, floor = -4). Replicates the quantizer
    on both engines. dx=2 cases always divide dy*10^6 exactly (10^6 is
    even), so they alone are VACUOUS for the floor correction (r11
    advice #1: trunc == floor whenever the remainder is zero); the
    dx=3 and dx=7 cases have non-zero remainders and fire the
    correction branch on negative quotients (e.g. -10^6 // 3 =
    -333334 floor vs -333333 trunc)."""
    import duckdb

    from crawlingbigdatavisionaid_spark.plans.timeseries import (
        _floor_div_sql,
    )

    saw_inexact_negative = False
    for dy, dx in ((-3, 2), (-7, 2), (7, 2), (-1, 3), (1, 3), (-5, 7)):
        num = dy * 10**6
        want = num // dx  # Python floor
        if num < 0 and num % dx != 0:
            saw_inexact_negative = True
        expr = _floor_div_sql(
            f"(CAST({dy} AS DECIMAL(38,0)) * 1000000)", str(dx)
        )
        got_spark = spark.sql(f"SELECT CAST({expr} AS BIGINT) AS q").collect()[
            0
        ]["q"]
        duck_expr = (
            f"(CAST({dy} AS HUGEINT) * 1000000) // {dx}"
            f" - (CASE WHEN (CAST({dy} AS HUGEINT) * 1000000) % {dx} <> 0"
            f" AND {dy} < 0 THEN 1 ELSE 0 END)"
        )
        got_duck = duckdb.sql(
            f"SELECT CAST({duck_expr} AS BIGINT)"
        ).fetchone()[0]
        assert got_spark == got_duck == want, (
            dy, dx, got_spark, got_duck, want,
        )
    # the case list must keep exercising the branch this test exists for
    assert saw_inexact_negative


def test_bootstrap_ci_matches_python_replica(spark):
    import hashlib

    from crawlingbigdatavisionaid_spark.plans.timeseries import (
        _BOOT_B,
        _POIS_T,
    )

    rows = (
        load_table(spark, SF, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    data = [
        (r["o_orderkey"], int(math.floor(r["o_totalprice"] * 100 + 0.5)))
        for r in rows
    ]

    def pois(u32):
        for k, t in enumerate(_POIS_T):
            if u32 < t:
                return k
        return 6

    means = []
    for b in range(_BOOT_B):
        sw = n = 0
        for key, cents in data:
            u = int(hashlib.md5(f"{key}:{b}".encode()).hexdigest()[:8], 16)
            w = pois(u)
            sw += w * cents
            n += w
        means.append(float(sw) / float(n))
    means.sort()
    want = {
        "n_replicas": _BOOT_B,
        "mean_cents": round(
            float(sum(c for _, c in data)) / len(data), 4
        ),
        "ci_lo_cents": round(means[math.ceil(0.025 * _BOOT_B) - 1], 4),
        "ci_mid_cents": round(means[math.ceil(0.5 * _BOOT_B) - 1], 4),
        "ci_hi_cents": round(means[math.ceil(0.975 * _BOOT_B) - 1], 4),
    }
    [row] = _q("bootstrap_mean_ci")(spark, SF).collect()
    assert row.asDict() == want
    # the CI must bracket the point estimate
    assert want["ci_lo_cents"] <= want["mean_cents"] <= want["ci_hi_cents"]
