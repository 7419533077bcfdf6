"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an ANSI-SQL oracle string that DuckDB runs
over the same parquet files. The driver hash-compares both sides at
sf=0.01; column names/aliases MUST match between the two.

Determinism rules every registered query follows:
- No LIMIT without a total tie-breaking ORDER BY.
- Float aggregates rounded (summation order differs between engines).
- Timestamps stay native; the session is pinned to UTC.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from gearpump_spark.session import ensure_runtime_conf


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    desc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, desc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, wrapped, oracle, desc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}


_LOADED = False


def _load() -> None:
    """Import every query module (each registers on import)."""
    global _LOADED
    if _LOADED:
        return
    import gearpump_spark.queries.relational  # noqa: F401
    import gearpump_spark.queries.tpch_extra  # noqa: F401
    import gearpump_spark.queries.temporal  # noqa: F401
    import gearpump_spark.queries.dataflow  # noqa: F401
    import gearpump_spark.queries.llm  # noqa: F401
    import gearpump_spark.queries.sketches  # noqa: F401
    import gearpump_spark.queries.sampling  # noqa: F401

    _LOADED = True
