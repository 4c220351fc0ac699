"""URL canonicalization for crawl dedup (OP-DEDUP-01 support).

The reference dedups on the RAW url string (``crawl.py:73`` —
``find_one({'sources': url})``), so ``http://X`` and ``http://X/`` or a
``?utm_source=...`` variant re-crawl as "new" articles. The Spark-native
engine canonicalizes first; the rules below are pure string transforms
(built-in regexp — JVM-side, codegen) with exact DuckDB twins so the
dedup key is engine-portable:

1. lowercase scheme+host (path stays case-sensitive per RFC 3986)
2. strip the fragment (``#...``)
3. strip tracking params (``utm_*``, ``fbclid``, ``gclid``) but keep
   meaningful query params
4. drop a trailing ``?`` left by step 3
5. collapse a trailing slash
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRACKING = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*"


def canonical_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # lowercase scheme://host (up to the first '/' after '://')
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)),
        F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""),
    )
    c = F.regexp_replace(c, r"#.*$", "")            # fragment
    c = F.regexp_replace(c, _TRACKING + r"&?", "")  # tracking params
    c = F.regexp_replace(c, r"[?&]$", "")           # dangling separator
    c = F.regexp_replace(c, r"(.+?)/$", r"$1")      # trailing slash
    return c
