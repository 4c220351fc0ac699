"""Every registered query with an oracle must match DuckDB at sf0.001.

This is a fast local replica of the driver's t2 gate (which runs at
sf0.01) — see tools/verify_local.py for the CLI form.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.verify_local import TABLES, compare

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _all_query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, con, name):
    fn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = fn(spark, SF)
    rows = [tuple(r) for r in df.collect()]
    if name not in oracles:
        # rows-only contract: must run and (for our queries) be non-empty
        assert rows is not None
        return
    rel = con.sql(oracles[name])
    problems = compare(name, df.columns, rows, list(rel.columns), rel.fetchall())
    assert not problems, "\n".join(str(p) for p in problems)
