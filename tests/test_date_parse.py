"""Permissive publish-date parse cascade vs ``dateutil.parser.parse``.

The reference parses arbitrary date strings with dateutil
(``/root/reference/app.py:90``); our declarative equivalent is the
pinned ``_TS_FORMATS`` coalesce cascade in extraction/udfs.py.  These
tests render real datetimes through every accepted surface form and
assert the cascade agrees with dateutil, and that the documented
refusals (ambiguous / bare-number forms) stay null rather than guessing.
"""

from __future__ import annotations

from datetime import datetime, timezone

from dateutil import parser as duparser  # ships with pandas
from pyspark.sql import functions as F

from crawlingbigdatavisionaid_spark.extraction.udfs import parse_published

# (strftime pattern, sample) — one per _TS_FORMATS family.  Samples use
# day>12 where the month/day order could be ambiguous, and a second
# sample with day<=12 guards the US-order choice.
SAMPLES = [
    "2024-03-05T10:00:00.123456+02:00",
    "2024-03-05T10:00:00.123+02:00",
    "2024-03-05T10:00:00+02:00",
    "2024-03-05T10:00:00.123456",
    "2024-03-05T10:00:00.123",
    "2024-03-05T10:00:00",
    "2024-03-05 10:00:00+02:00",
    "2024-03-05 10:00:00.123",
    "2024-03-05 10:00:00",
    "2024-03-05",
    "Tue, 05 Mar 2024 10:00:00 +0000",
    "Tue, 5 Mar 2024 10:00:00 +0200",
    "Tue, 05 Mar 2024 10:00:00 +02:00",
    "05 Mar 2024 10:00:00 +0000",
    "Mar 5, 2024",
    "March 5, 2024",
    "5 March 2024",
    "25 March 2024",
    "5 Mar 2024",
    "03/05/2024",
    "11/28/2024",
    "2024/03/05",
]

# dateutil would guess these; the cascade must refuse (null) instead.
REFUSED = ["20240305", "next tuesday", "03-05-24", ""]


def _spark_parse(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "raw string")
    rows = df.select(
        "raw", parse_published(F.col("raw")).alias("ts")
    ).collect()
    return {r["raw"]: r["ts"] for r in rows}


def _dateutil_utc(s):
    dt = duparser.parse(s)
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def test_cascade_matches_dateutil_on_accepted_forms(spark):
    got = _spark_parse(spark, SAMPLES)
    for s in SAMPLES:
        expect = _dateutil_utc(s)
        assert got[s] is not None, f"cascade refused {s!r}"
        # session tz is UTC, so Spark's naive result is directly comparable
        assert got[s] == expect, f"{s!r}: spark={got[s]} dateutil={expect}"


def test_refused_forms_stay_null(spark):
    got = _spark_parse(spark, REFUSED)
    for s in REFUSED:
        assert got[s] is None, f"cascade guessed {got[s]} for {s!r}"


def test_generated_datetimes_round_trip(spark):
    """Render a spread of datetimes through each surface form and check
    the cascade's value agrees with dateutil on every one."""
    dts = [
        datetime(2023, 1, 1, 0, 0, 0),
        datetime(2024, 2, 29, 23, 59, 59),
        datetime(2024, 12, 31, 6, 30, 15),
        datetime(2025, 7, 4, 12, 0, 1),
    ]
    forms = [
        "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%d %H:%M:%S",
        "%Y-%m-%d",
        "%a, %d %b %Y %H:%M:%S +0000",
        "%b %d, %Y",
        "%B %d, %Y",
        "%d %B %Y",
        "%m/%d/%Y",
        "%Y/%m/%d",
    ]
    strings = [dt.strftime(f) for dt in dts for f in forms]
    got = _spark_parse(spark, strings)
    for s in strings:
        assert got[s] == _dateutil_utc(s), (
            f"{s!r}: spark={got[s]} dateutil={_dateutil_utc(s)}"
        )
