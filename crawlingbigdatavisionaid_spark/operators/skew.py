"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles most
cases at runtime; explicit salting remains necessary when (a) the skew
is in a *streaming* stateful join where AQE can't re-plan, (b) the hot
key is known and enormous (one key > executor memory), or (c) the engine
must guarantee a bound on per-task input regardless of statistics.

Pattern: the skewed (probe) side gets a deterministic salt in
``[0, n_salts)``; the other side is replicated ``n_salts`` times; the
join key becomes ``(key, salt)``, splitting each hot key's rows across
``n_salts`` tasks. Row-identical results to the unsalted join — only the
partitioning changes. Cost: the replicated side shuffles ``n_salts`` x
its size, so salt the side that is small relative to the hot key's row
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with the hot-key rows of
    ``skewed`` spread over ``n_salts`` sub-keys.

    The salt is a deterministic hash of the whole skewed row (stable
    across retries — safe under speculative execution), so equal rows
    land together but a hot key's many distinct rows fan out.
    """
    salted = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(F.struct(*skewed.columns)), F.lit(n_salts)).cast("int")
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted.join(replicated, [on, _SALT], how)
    return out.drop(_SALT)
