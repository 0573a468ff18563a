"""Shared helpers for oracle-matched queries.

Float determinism convention
----------------------------
DuckDB and Spark sum doubles in different orders, so raw ``SUM(double)``
is not bit-reproducible across engines. Every aggregated double in an
oracle-matched query therefore follows this convention, in BOTH the Spark
expression and the oracle SQL:

1. cast the input to ``DECIMAL(38,6)`` (exact, order-independent sums),
2. aggregate in decimal (exact in both engines),
3. cast the exact result to double and ``round(…, N)``.

The double produced from the same exact decimal is bit-identical in both
engines, and a tie at the rounding digit is impossible for binary doubles
at scale ≥ 1 (k.5·10⁻ⁿ is not a dyadic rational for n ≥ 1), so rounding is
also bit-identical. The decimal cast is a correctness-harness convention
only — it costs one extra codegen'd cast per row and does not change the
shuffle/aggregation structure Catalyst picks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dec(col) -> Column:
    """Exact-decimal view of a double column (order-independent sums)."""
    return F.col(col).cast(DEC) if isinstance(col, str) else col.cast(DEC)


def dsum(col, alias: str, ndigits: int = 4) -> Column:
    """Deterministic cross-engine SUM over a double column."""
    return F.round(F.sum(dec(col)).cast("double"), ndigits).alias(alias)


def davg(col, alias: str, ndigits: int = 6) -> Column:
    """Deterministic cross-engine AVG: exact decimal sum / count, in doubles."""
    c = dec(col)
    return F.round(
        F.sum(c).cast("double") / F.count(c).cast("double"), ndigits
    ).alias(alias)


# SQL-side equivalents (DuckDB dialect == ANSI here).
def sql_dsum(expr: str, alias: str, ndigits: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE), {ndigits}) AS {alias}"


def sql_davg(expr: str, alias: str, ndigits: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE), {ndigits}) AS {alias}"
    )
