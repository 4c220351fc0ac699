"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and, where an oracle exists, the matching
DuckDB SQL on the same parquet tables; compares row count, schema (sorted
column names), and an order-insensitive value comparison. Use while
iterating so driver-side CORRECTNESS_r{N}.json holds no surprises.

Usage:  python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        # exact-match floats; callers are expected to round in-query
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Columns sorted by name, rows canonicalized and sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def _float_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, (float, int)):
        if a == b:
            return True
        if math.isnan(a) and isinstance(b, float) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare(name, spark_cols, spark_rows, ora_cols, ora_rows) -> list[str]:
    problems = []
    if sorted(spark_cols) != sorted(ora_cols):
        problems.append(f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
        return problems
    if len(spark_rows) != len(ora_rows):
        problems.append(f"row count mismatch: spark={len(spark_rows)} oracle={len(ora_rows)}")
    s = _rowset(spark_cols, spark_rows)
    o = _rowset(ora_cols, ora_rows)
    exact_mismatch = 0
    tol_mismatch = 0
    for a, b in zip(s, o):
        if a != b:
            exact_mismatch += 1
            if not (
                len(a) == len(b) and all(_float_close(x, y) for x, y in zip(a, b))
            ):
                tol_mismatch += 1
                if tol_mismatch <= 3:
                    problems.append(f"  value diff:\n    spark : {a}\n    oracle: {b}")
    if exact_mismatch and not tol_mismatch:
        problems.append(
            f"WARN {exact_mismatch} rows equal only within float tolerance "
            "(driver hash may treat as mismatch!)"
        )
    elif tol_mismatch:
        problems.insert(0, f"{tol_mismatch} rows differ beyond tolerance")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from crawlingbigdatavisionaid_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in omap:
            print(f"ok?  {name}: rows={len(spark_rows)} ({dt:.1f}s) [rows-only, no oracle]")
            if len(spark_rows) == 0:
                print(f"WARN {name}: 0 rows from rows-only query")
            continue
        try:
            rel = con.sql(omap[name])
            ora_cols = list(rel.columns)
            ora_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_cols, spark_rows, ora_cols, ora_rows)
        if problems:
            print(f"FAIL {name}: ({dt:.1f}s)")
            for p in problems:
                print("   ", p)
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(spark_rows)} ({dt:.1f}s)")
    print("---", "ALL PASS" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
