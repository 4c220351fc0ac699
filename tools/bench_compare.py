#!/usr/bin/env python
"""Per-query bench regression report: old BENCH json vs new.

Usage: python tools/bench_compare.py BENCH_r01.json [new.json]

If the second file is omitted, runs ``bench.py`` fresh and compares its
output. Exits nonzero if any warm per-query time regressed more than
REGRESSION_X vs the old run (new queries are reported, not failed).
"""

from __future__ import annotations

import json
import subprocess
import sys

REGRESSION_X = 1.5
MIN_ABS_SEC = 0.3  # ignore noise on sub-300ms queries


def _load(path: str) -> dict:
    """Accept either a raw bench.py JSON line or the driver's BENCH_r*.json
    wrapper (bench stdout embedded in a "tail" field)."""
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
        if "queries" in obj:
            return obj
        tail = obj.get("tail", "")
        start = tail.rindex('{"metric"')
        return json.loads(tail[start:].splitlines()[0])
    except (json.JSONDecodeError, ValueError):
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    old = _load(sys.argv[1])
    if len(sys.argv) > 2:
        new = _load(sys.argv[2])
    else:
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        new = json.loads(line)

    key = "queries_warm" if "queries_warm" in old and "queries_warm" in new else "queries"
    o, n = old[key], new[key]
    regressions = []
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for q in sorted(set(o) | set(n)):
        if q not in o:
            print(f"{q:40s} {'-':>8s} {n[q]:8.2f}    NEW")
            continue
        if q not in n:
            print(f"{q:40s} {o[q]:8.2f} {'-':>8s}    GONE")
            continue
        ratio = n[q] / o[q] if o[q] > 0 else float("inf")
        flag = ""
        if ratio > REGRESSION_X and n[q] - o[q] > MIN_ABS_SEC:
            flag = "  REGRESSED"
            regressions.append(q)
        print(f"{q:40s} {o[q]:8.2f} {n[q]:8.2f} {ratio:6.2f}x{flag}")
    ot, nt = old.get("warm_total"), new.get("warm_total")
    if ot and nt:
        print(f"{'TOTAL (warm)':40s} {ot:8.2f} {nt:8.2f} {nt / ot:6.2f}x")
    if regressions:
        print(f"\n{len(regressions)} regression(s): {regressions}")
        return 1
    print("\nno per-query regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
