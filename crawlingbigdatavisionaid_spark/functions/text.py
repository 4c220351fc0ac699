"""Text-analytics column functions.

The reference's text pipeline (``app.py:25-73``) is: concatenate every
document, lowercase, tokenize ``\\b[a-zA-Z]+\\b``, drop ~140 stopwords and
tokens of length <= 2, count frequencies, keep the top 150 (OP-TXT-01..03,
OP-FLT-03). Rebuilt here as per-row column expressions — word frequency is
associative, so the global string concat (``app.py:30``, an anti-pattern
that would OOM at scale) is replaced by per-row tokenize → explode →
hash aggregate with map-side partial aggregation.

Everything stays JVM-side (built-in regexp / higher-order functions —
whole-stage codegen, no Python in the hot path). Each helper has a DuckDB
SQL twin used by the oracle strings so both engines compute bit-identical
values.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A standard English stopword list (~140 terms), playing the role of the
# reference's inline set (app.py:33-57). The exact membership is part of
# the engine's contract: it is embedded identically in the SQL oracles.
STOPWORDS: tuple[str, ...] = tuple(
    sorted(
        """
    a about above after again against all am an and any are aren as at be
    because been before being below between both but by can cannot could
    couldn did didn do does doesn doing don down during each few for from
    further had hadn has hasn have haven having he her here hers herself him
    himself his how i if in into is isn it its itself just ll me mightn more
    most mustn my myself needn no nor not now o of off on once only or other
    our ours ourselves out over own re s same shan she should shouldn so some
    such t than that the their theirs them themselves then there these they
    this those through to too under until up ve very was wasn we were weren
    what when where which while who whom why will with won wouldn you your
    yours yourself yourselves
    """.split()
    )
)

# Tokenizer pattern: the reference's \b[a-zA-Z]+\b on lowercased text
# degenerates to runs of [a-z]+ (app.py:31).
TOKEN_PATTERN = "[a-z]+"
# BPE-ish subword pattern: letter runs, digit runs, single punctuation.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

MOD = 1_000_000_007  # fingerprint modulus (fits BIGINT through a*31+b)


def sql_stopword_list() -> str:
    """The stopword set as a SQL IN-list literal (for oracle strings)."""
    return ", ".join(f"'{w}'" for w in STOPWORDS)


def tokens(col: Column | str) -> Column:
    """Lowercase + regex tokenize into array<string> (OP-TXT-01)."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish subword tokenization (letters / digits / punct runs)."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_PATTERN), 0)


def is_content_word(col: Column) -> Column:
    """Reference keep-rule: not a stopword AND length > 2 (OP-FLT-03)."""
    return (~col.isin(*STOPWORDS)) & (F.length(col) > 2)


def char_fingerprint(col: Column | str) -> Column:
    """Deterministic rolling polynomial hash over the text's characters.

    fp = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) mod 1e9+7).
    Pure built-in higher-order functions — codegen'd, no UDF. DuckDB twin:
    ``list_reduce(list_prepend(0, list_transform(string_split(t,''),
    c -> ascii(c))), (a,b) -> (a*31+b) % 1000000007)``.
    """
    name = col if isinstance(col, str) else None
    expr = name if name else None
    if expr is None:
        raise ValueError("char_fingerprint needs a column name (uses F.expr)")
    return F.expr(
        f"aggregate(transform(split({expr}, ''), c -> cast(ascii(c) as bigint)),"
        f" cast(0 as bigint), (a, b) -> (a*31 + b) % {MOD})"
    )


def bpe_encode_expr(
    col: Column, merges: "list[tuple[str, str]] | tuple[tuple[str, str], ...]"
) -> Column:
    """BPE-encode a word column with a rank-ordered merge table as pure
    chained JVM ``replace`` calls — no UDF, no iteration.

    Each character is boundary-guarded as ``<c>``; merge (x, y) becomes
    one exhaustive left-to-right replacement ``<x><y>`` -> ``<xy>``.
    Applying merges this way IN RANK ORDER is equivalent to the
    canonical lowest-rank-first BPE encoder because a merge's output
    symbol can only participate in later-rank merges (its parts stop
    existing the moment it is created) — any valid trained merge
    sequence satisfies this by construction, so the rule lists
    ``operators/bpe.bpe_train`` emits plug in directly:
    ``bpe_encode_expr(F.col("w"), [(a, b) for _, a, b, _ in trained])``.
    Pinned segmentation-for-segmentation against a reference priority
    encoder in tests/test_udtf.py. Token count of the encoded string =
    its ``<`` count: ``length(s) - length(replace(s, '<', ''))``."""
    s = F.regexp_replace(col, "(.)", "<$1>")
    for x, y in merges:
        s = F.replace(s, F.lit(f"<{x}><{y}>"), F.lit(f"<{x}{y}>"))
    return s
