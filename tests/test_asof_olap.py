"""Unit tests for the as-of join operator edge cases and OLAP plans."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crawlingbigdatavisionaid_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),  # matches r2 (09:30)
            (2, "a", _ts("2024-01-01 09:00:00")),  # matches r1 (09:00) inclusive
            (3, "a", _ts("2024-01-01 08:00:00")),  # before all rights -> null
            (4, "b", _ts("2024-01-01 12:00:00")),  # key with no rights -> null
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 09:00:00"), 10.0),
            ("a", _ts("2024-01-01 09:30:00"), 20.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", right_payload=("v",)
        ).collect()
    }
    assert out == {1: 20.0, 2: 10.0, 3: None, 4: None}


def test_asof_payload_struct_is_atomic_across_null_payloads(spark):
    """A newer right row with a NULL payload column must NOT let an older
    row's value bleed through — payload travels as one struct."""
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 09:00:00"), 10.0, "old"),
            ("a", _ts("2024-01-01 09:30:00"), None, "new"),
        ],
        "k string, ts timestamp, v double, tag string",
    )
    row = asof_join(left, right, on="k", right_payload=("v", "tag")).first()
    assert row["asof_tag"] == "new"
    assert row["asof_v"] is None  # not 10.0 from the older row


def test_asof_tie_on_equal_ts_prefers_largest_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 09:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 09:00:00"), 7, 100.0),
            ("a", _ts("2024-01-01 09:00:00"), 9, 200.0),
        ],
        "k string, ts timestamp, seq long, v double",
    )
    row = asof_join(
        left, right, on="k", right_payload=("v",), right_tiebreak="seq"
    ).first()
    assert row["asof_v"] == 200.0


def test_asof_plan_has_single_shuffle(spark):
    """The merge-as-of must cost one exchange (by key), not a join + a
    window exchange."""
    left = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("k"), F.col("id").cast("timestamp").alias("ts")
    )
    right = spark.range(5).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").cast("timestamp").alias("ts"),
        F.col("id").alias("v"),
    )
    plan = (
        asof_join(left, right, on="k", right_payload=("v",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_join_equals_plain_join(spark):
    """Salting must be invisible in the results — only the partitioning
    changes."""
    from crawlingbigdatavisionaid_spark.operators.skew import salted_join

    left = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(5)], "k long, label string"
    )
    plain = left.join(right, "k").select("k", "payload", "label")
    salted = salted_join(left, right, on="k", n_salts=8).select(
        "k", "payload", "label"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_outer_keeps_unmatched(spark):
    from crawlingbigdatavisionaid_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    right = spark.createDataFrame([(1, "dim")], "k long, label string")
    out = {
        r["k"]: r["label"]
        for r in salted_join(left, right, on="k", n_salts=4, how="left").collect()
    }
    assert out == {1: "dim", 99: None}
