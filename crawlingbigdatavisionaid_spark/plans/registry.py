"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 is exposed here as a named
:class:`QuerySpec`: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent ANSI-SQL oracle string for DuckDB.
``__spark_entry__.py`` re-exports these maps verbatim.

Determinism rules applied throughout (so order-insensitive value hashes
match the oracle):
- every computed column is aliased identically in Spark and SQL;
- floating outputs are either avoided (rank/id/count outputs), produced by
  exact integer/decimal arithmetic then rounded and cast to double, or
  derived from single IEEE-deterministic operations (one division);
- top-k queries always carry a total tie-break order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One registered query: Spark implementation + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    ops: tuple[str, ...] = field(default=())  # SURVEY.md §2 OP-IDs covered


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None,
    ops: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    """Decorator: add a query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, ops=ops)
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every spec module exactly once (side effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        analytics,
        asof,
        dedup,
        extraction,
        multimodal,
        observability,
        olap,
        similarity,
        star,
        streaming,
        text,
        windows,
    )

    _LOADED = True
