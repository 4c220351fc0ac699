"""Property-based tests (SURVEY.md §5.4): tokenizer vs a Python ``re``
oracle, and gap-fill invariants. Each hypothesis example ships a whole
batch of rows through one Spark job to keep wall time sane.
"""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawlingbigdatavisionaid_spark.functions.text import TOKEN_PATTERN, tokens
from crawlingbigdatavisionaid_spark.operators.timeline import timeline_gapfill

# stable under both Java's and Python's lower(): ascii + punct + digits +
# a few case-stable non-ascii chars (no Turkish İ / sigma edge cases)
_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n.,;:!?'\"()[]{}<>-_/\\@#$%^&*+=~`|éñüß中文а"
)

_slow = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_slow
@given(
    texts=st.lists(
        st.text(alphabet=_ALPHABET, max_size=200), min_size=1, max_size=40
    )
)
def test_tokenizer_matches_python_re_oracle(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", tokens("text").alias("toks")).collect()
    }
    pat = re.compile(TOKEN_PATTERN)
    for i, t in enumerate(texts):
        assert got[i] == pat.findall(t.lower()), repr(t)


@_slow
@given(
    days=st.lists(
        st.dates(
            min_value=dt.date(2020, 1, 1), max_value=dt.date(2021, 12, 31)
        ),
        min_size=1,
        max_size=60,
    ),
    n_nulls=st.integers(min_value=0, max_value=5),
)
def test_gapfill_invariants(spark, days, n_nulls):
    rows = [(dt.datetime.combine(d, dt.time(12, 0)),) for d in days]
    rows += [(None,)] * n_nulls
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["day"]: r["cnt"] for r in timeline_gapfill(df, "ts").collect()}

    lo, hi = min(days), max(days)
    # dense: every day between min and max present exactly once
    assert len(out) == (hi - lo).days + 1
    assert set(out) == {lo + dt.timedelta(days=i) for i in range((hi - lo).days + 1)}
    # counts preserved; nulls dropped; absent days zero-filled
    assert sum(out.values()) == len(days)
    for d in set(out) - set(days):
        assert out[d] == 0
    for d in set(days):
        assert out[d] == days.count(d)


def test_pack_sequences_conserves_docs_and_tokens(spark, sf_dir):
    """Packing invariants: every document lands in exactly one sequence,
    and sequence token sums conserve the corpus token total."""
    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.functions import text as T
    from crawlingbigdatavisionaid_spark.plans import query_map
    from crawlingbigdatavisionaid_spark.sources import load_table

    packed = query_map()["pack_sequences"](spark, sf_dir)
    agg = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("seq_tokens").alias("toks")
    ).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    want = docs.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(T.tokens("text"))).alias("toks"),
    ).collect()[0]
    assert agg["docs"] == want["docs"]
    assert agg["toks"] == want["toks"]


# URL-shaped generator: scheme://host[:port]/path[?query][#fragment] from a
# constrained alphabet, with tracking params and percent-escapes mixed in
_URL_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    min_size=1,
    max_size=8,
)
_PARAM = st.one_of(
    st.tuples(_URL_WORD, _URL_WORD),
    st.tuples(
        st.sampled_from(
            ["utm_source", "utm_medium", "fbclid", "gclid", "autm_source", "xgclid"]
        ),
        _URL_WORD,
    ),
)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = ".".join(draw(st.lists(_URL_WORD, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_URL_WORD, min_size=0, max_size=3))
    path = "/" + "/".join(segs) if segs else draw(st.sampled_from(["", "/"]))
    esc = draw(st.sampled_from(["", "%2f", "%2F", "%zz", "%3d"]))
    params = draw(st.lists(_PARAM, min_size=0, max_size=4))
    query = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    return f"{scheme}://{host}{port}{path}{esc}" + (
        f"?{query}" if query else ""
    ) + frag


@_slow
@given(urls=st.lists(_urls(), min_size=1, max_size=30))
def test_canonical_url_idempotent_on_generated_urls(spark, urls):
    """Idempotence must hold for ANY url shape the generator produces —
    the dedup key is only sound if canonicalize is a fixed point."""
    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.functions.urls import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        canonical_url("url").alias("once")
    ).select("once", canonical_url(F.col("once")).alias("twice")).collect()
    for r in rows:
        assert r["once"] == r["twice"], (r["once"], r["twice"])


def test_chunked_cumsum_equals_plain_window(spark):
    """The chunked prefix sum must be BIT-IDENTICAL to the plain
    unbounded window on data that spans many chunks, has sparse/dense
    id regions, chunk-boundary ids, and multi-group partitions."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from crawlingbigdatavisionaid_spark.operators.prefix import chunked_cumsum

    rng = random.Random(7)
    rows = []
    for g in ("a", "b", "c"):
        ids = {rng.randrange(0, 40) for _ in range(60)}
        ids |= {7, 8, 15, 16, 31, 32}  # chunk boundaries at chunk=8
        rows += [(g, i, rng.randrange(0, 100)) for i in sorted(ids)]
    df = spark.createDataFrame(rows, "g string, oid long, v long")
    w = (
        Window.partitionBy("g")
        .orderBy("oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = {
        (r.g, r.oid): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    chunked = {
        (r.g, r.oid): r.cum
        for r in chunked_cumsum(
            df, ["g"], "oid", F.col("v"), "cum", chunk=8
        ).collect()
    }
    assert chunked == plain


def test_chunked_cumsum_keeps_null_partition_keys(spark):
    """Review regression: PARTITION BY keeps a NULL group; the chunked
    form's rejoin must be null-safe or NULL-keyed rows vanish."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from crawlingbigdatavisionaid_spark.operators.prefix import chunked_cumsum

    df = spark.createDataFrame(
        [(None, 1, 10), (None, 2, 20), ("a", 1, 5)],
        "g string, oid long, v long",
    )
    w = (
        Window.partitionBy("g")
        .orderBy("oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = {
        (r.g, r.oid): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    chunked = {
        (r.g, r.oid): r.cum
        for r in chunked_cumsum(df, ["g"], "oid", F.col("v"), "cum", chunk=8).collect()
    }
    assert chunked == plain and len(chunked) == 3


def test_chunked_cumsum_keeps_null_order_rows(spark):
    """ADVICE r6 (low): a NULL order_col row gets a NULL _sub chunk key
    on both sides of the rejoin — the chunk-key equality must be
    null-safe too, or the row silently vanishes. The plain window keeps
    it (NULLS FIRST within its group)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from crawlingbigdatavisionaid_spark.operators.prefix import chunked_cumsum

    df = spark.createDataFrame(
        [("a", None, 7), ("a", 1, 10), ("a", 2, 20), ("b", None, 3)],
        "g string, oid long, v long",
    )
    w = (
        Window.partitionBy("g")
        .orderBy("oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = {
        (r.g, r.oid): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    chunked = {
        (r.g, r.oid): r.cum
        for r in chunked_cumsum(df, ["g"], "oid", F.col("v"), "cum", chunk=8).collect()
    }
    assert chunked == plain and len(chunked) == 4


def test_global_rank_and_ntile_equal_plain_window(spark):
    """operators/rank.global_rank + ntile_expr must be BIT-IDENTICAL to
    ROW_NUMBER/NTILE over the unpartitioned window, across sizes that
    hit empty, single-row, fewer-rows-than-partitions, non-divisible
    and divisible tile counts."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from crawlingbigdatavisionaid_spark.operators.rank import (
        global_rank,
        ntile_expr,
    )

    rng = random.Random(11)
    for n_rows in (0, 1, 7, 33, 96, 100):
        rows = [(i, rng.randrange(0, 20)) for i in range(n_rows)]
        df = spark.createDataFrame(rows, "id long, v long")
        w = Window.orderBy("v", "id")
        plain = {
            r.id: (r.rank, r.t3, r.t4)
            for r in df.select(
                "id",
                F.row_number().over(w).alias("rank"),
                F.ntile(3).over(w).alias("t3"),
                F.ntile(4).over(w).alias("t4"),
            ).collect()
        }
        ranked = global_rank(df, ["v", "id"], alias="rank")
        n = F.broadcast(df.agg(F.count(F.lit(1)).alias("_n")))
        got = {
            r.id: (r.rank, r.t3, r.t4)
            for r in ranked.crossJoin(n)
            .select(
                "id",
                "rank",
                ntile_expr(F.col("rank"), F.col("_n"), 3).alias("t3"),
                ntile_expr(F.col("rank"), F.col("_n"), 4).alias("t4"),
            )
            .collect()
        }
        assert got == plain, n_rows


def test_global_rank_total_alias_matches_count(spark):
    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.operators.rank import global_rank

    df = spark.range(37).selectExpr("id", "id % 5 AS v")
    out = global_rank(df, ["v", "id"], alias="r", total_alias="n")
    rows = out.select("r", "n").collect()
    assert all(r.n == 37 for r in rows)
    assert sorted(r.r for r in rows) == list(range(1, 38))
    empty = spark.createDataFrame([], "id long, v long")
    assert global_rank(empty, ["v", "id"], "r", total_alias="n").count() == 0


def test_grouped_rank_equals_plain_keyed_window(spark):
    """operators/rank.grouped_rank must be BIT-IDENTICAL to
    ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id) under a total
    per-group order, across group counts/sizes that hit empty groups,
    single-row groups, groups larger than the partition count, and a
    group run spanning partition boundaries; total_alias must equal
    each group's row count."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from crawlingbigdatavisionaid_spark.operators.rank import grouped_rank

    rng = random.Random(23)
    for n_rows, n_groups in ((0, 1), (1, 1), (40, 2), (97, 3), (200, 5)):
        rows = [
            (i, rng.randrange(0, n_groups), rng.randrange(0, 9))
            for i in range(n_rows)
        ]
        df = spark.createDataFrame(rows, "id long, g long, v long")
        w = Window.partitionBy("g").orderBy("v", "id")
        plain = {
            r.id: r.rank
            for r in df.select(
                "id", F.row_number().over(w).alias("rank")
            ).collect()
        }
        out = grouped_rank(df, ["g"], ["v", "id"], alias="rank",
                           total_alias="n")
        got = {r.id: r.rank for r in out.collect()}
        assert got == plain, (n_rows, n_groups)
        sizes = {r.g: r.cnt for r in df.groupBy("g").agg(
            F.count(F.lit(1)).alias("cnt")).collect()}
        assert all(r.n == sizes[r.g] for r in out.collect())


def test_exact_cut_matches_decimal_ceil_where_float_diverges(spark):
    """r8 ADVICE (low): ``ceil(p * n)`` with a DOUBLE literal diverges
    from the oracles' DECIMAL evaluation on adversarial (p, n) — e.g.
    Python/Java ``0.07 * 100 == 7.000000000000001`` so float-ceil says
    8 where DECIMAL ceil(0.07 * 100) == 7.  ``exact_cut`` computes the
    rank as (num*n + den - 1) div den in DECIMAL(38,0); pin it against
    Fraction arithmetic (== DECIMAL ceil by construction) over a grid
    that includes the known float-divergent pairs."""
    import math
    from fractions import Fraction

    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.operators.rank import exact_cut

    ps = (0.07, 0.1, 0.29, 0.5, 0.55, 0.9, 0.99, 0.999)
    ns = (1, 3, 7, 100, 101, 999, 10**6, 10**12, 10**15)
    # at least one grid point must be float-divergent, else the test
    # is vacuous
    assert any(
        math.ceil(p * n) != math.ceil(Fraction(str(p)) * n)
        for p in ps
        for n in ns
    )
    df = spark.createDataFrame([(n,) for n in ns], "n long")
    cols = [exact_cut(p, F.col("n")).alias(f"c{i}") for i, p in enumerate(ps)]
    for row in df.select("n", *cols).collect():
        for i, p in enumerate(ps):
            want = math.ceil(Fraction(str(p)) * row.n)
            assert row[f"c{i}"] == want, (p, row.n, row[f"c{i}"], want)
