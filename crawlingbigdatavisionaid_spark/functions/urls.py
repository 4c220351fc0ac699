"""URL canonicalization for crawl dedup (OP-DEDUP-01 support).

The reference dedups on the RAW url string (``crawl.py:73`` —
``find_one({'sources': url})``), so ``http://X`` and ``http://X/`` or a
``?utm_source=...`` variant re-crawl as "new" articles. The Spark-native
engine canonicalizes first; the rules below are pure string transforms
(built-in regexp / higher-order array functions — all JVM-side) with
exact expected-value oracles so the dedup key is engine-portable:

1. lowercase scheme+host (path stays case-sensitive per RFC 3986)
2. strip default ports (``:80`` for http, ``:443`` for https)
3. strip the fragment (``#...``)
4. strip tracking params (``utm_*``, ``fbclid``, ``gclid``) but keep
   meaningful query params; the match is ANCHORED on a ``?``/``&``
   separator so a param NAME merely ending in a tracking name
   (``?autm_source=1``) is untouched
5. uppercase percent-encoding hex (``%2f`` == ``%2F`` per RFC 3986)
6. sort query params (``?b=2&a=1`` == ``?a=1&b=2`` for dedup purposes)
7. drop a dangling ``?``/``&`` and collapse a trailing slash

Every rule is a fixed point, so the composite is idempotent —
re-canonicalizing a stored key changes nothing (property-tested).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRACKING = r"([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*"


def canonical_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # lowercase scheme://host (up to the first '/' after '://')
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)),
        F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""),
    )
    # default ports alias the same origin
    c = F.regexp_replace(c, r"^(http://[^/:?#]*):80(?=[/?#]|$)", "$1")
    c = F.regexp_replace(c, r"^(https://[^/:?#]*):443(?=[/?#]|$)", "$1")
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    # tracking params: keep the separator ($1) so a following kept param
    # still has one; stripping may leave '?&' / '&&' runs — collapse them
    c = F.regexp_replace(c, _TRACKING, "$1")
    c = F.regexp_replace(c, r"\?&+", "?")
    c = F.regexp_replace(c, r"&&+", "&")
    c = F.regexp_replace(c, r"[?&]+$", "")  # dangling separator
    c = _upper_percent_encodings(c)
    c = _sort_query_params(c)  # after separator cleanup: no empty segments
    c = F.regexp_replace(c, r"(.+?)/$", r"$1")  # trailing slash
    return c


def _upper_percent_encodings(c: Column) -> Column:
    """``%2f`` -> ``%2F``: split at each ``%`` (lookahead keeps it),
    uppercase the two hex chars of each valid escape, rejoin. Scheme and
    host contain no ``%`` by construction, so whole-string is safe."""
    pieces = F.split(c, r"(?=%)")
    fixed = F.transform(
        pieces,
        lambda p: F.when(
            p.rlike(r"^%[0-9a-fA-F]{2}"),
            F.concat(
                F.upper(F.substring(p, 1, 3)), F.substring(p, 4, 2147483647)
            ),
        ).otherwise(p),
    )
    return F.array_join(fixed, "")


def _sort_query_params(c: Column) -> Column:
    """Byte-order sort of ``k=v`` params; empty query left alone."""
    query = F.regexp_extract(c, r"\?(.+)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.when(
        query == "", c
    ).otherwise(
        F.concat(F.regexp_replace(c, r"\?.*$", ""), F.lit("?"), sorted_q)
    )
