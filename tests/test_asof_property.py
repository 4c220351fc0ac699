"""Property test: the distributed merge-as-of agrees with pandas
``merge_asof`` (backward, inclusive) on random inputs."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawlingbigdatavisionaid_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)

_ts = st.integers(min_value=0, max_value=10_000).map(
    lambda s: T0 + dt.timedelta(seconds=s)
)
_key = st.integers(min_value=0, max_value=3)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=30),
    right=st.lists(
        st.tuples(_key, _ts, st.floats(0, 100, allow_nan=False)),
        min_size=0,
        max_size=30,
        # merge_asof semantics are ambiguous for duplicate (key, ts) on
        # the right; the operator breaks that tie via right_tiebreak,
        # which pandas can't express — so keep (key, ts) unique here
        unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "id long, k long, ts timestamp"
    )
    rdf = spark.createDataFrame(right, "k long, ts timestamp, v double")

    got = {
        r["id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            ldf, rdf, on="k", right_payload=("ts", "v"), prefix="asof_"
        ).collect()
    }

    lp = pd.DataFrame(
        {"id": range(len(left)), "k": [k for k, _ in left], "ts": [t for _, t in left]}
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        {
            "k": pd.array([k for k, _, _ in right], dtype="int64"),
            "rts": pd.to_datetime([t for _, t, _ in right]),
            "v": pd.array([v for _, _, v in right], dtype="float64"),
        }
    ).sort_values("rts", kind="stable")
    merged = pd.merge_asof(
        lp,
        rp,
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    for row in merged.itertuples():
        want_ts = None if pd.isna(row.rts) else row.rts.to_pydatetime()
        want_v = None if pd.isna(row.v) else row.v
        assert got[row.id] == (want_ts, want_v), (row.id, got[row.id])
