"""Shared helpers for oracle-checked queries.

Floating-point SUMs are order-dependent, and Spark (parallel partial
aggregates) and DuckDB (sequential) sum in different orders. We therefore
aggregate money/measure columns as fixed-scale DECIMALs — exact and
associative, so partial aggregation order cannot change the result — and
cast the final value back to DOUBLE. Both engines then produce bitwise
identical doubles and the driver's value-hash matches without rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dec(col: Column | str) -> Column:
    """Cast to the canonical exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def out_double(col: Column) -> Column:
    """Surface a decimal as double, deterministically across engines.

    A decimal whose unscaled value exceeds 2^53 rounds differently to
    double in DuckDB vs the JVM (1-ulp). Reducing to scale 2 first keeps
    the unscaled value tiny, making the conversion exact on both sides.
    """
    return col.cast("decimal(38,2)").cast("double")


def dsum(col: Column | str) -> Column:
    """Exact decimal sum, surfaced as double."""
    return out_double(F.sum(dec(col)))


def davg(col: Column | str) -> Column:
    """Exact-sum average: decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (out_double(F.sum(dec(c))) / F.count(c)).cast("double")


# SQL-side equivalents (DuckDB): keep in sync with the helpers above.
SQL_DEC = "DECIMAL(18,4)"


def sql_out_double(expr: str) -> str:
    return f"CAST(CAST(ROUND({expr}, 2) AS DECIMAL(38,2)) AS DOUBLE)"


def sql_dsum(expr: str) -> str:
    return sql_out_double(f"SUM(CAST({expr} AS {SQL_DEC}))")


def sql_davg(expr: str) -> str:
    return f"CAST({sql_out_double(f'SUM(CAST({expr} AS {SQL_DEC}))')} / COUNT({expr}) AS DOUBLE)"
