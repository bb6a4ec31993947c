"""Deterministic money arithmetic.

Double sums are order-dependent (floating-point addition doesn't
associate), so a shuffled/partial-aggregated Spark sum of doubles can
differ in low bits from a single-threaded oracle — and from itself
across runs. Every monetary aggregate in the query corpus therefore:

  1. casts the double column to an exact DECIMAL at its true scale
     (prices carry 2 decimals, rates 4),
  2. sums in decimal (exact, order-independent, map-side combinable),
  3. rounds to a fixed output scale and casts to DOUBLE (values at
     scale 2 stay below 2^53, so the final double is exact).

This is also the right call at 100 TB: bit-reproducible aggregates
regardless of partitioning, no "re-run changed the 12th digit".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money_sum(expr: Column, out_scale: int = 2) -> Column:
    """Exact decimal sum of a decimal expression -> rounded DOUBLE."""
    return F.round(F.sum(expr), out_scale).cast("double")


def money_sum_sql(expr_sql: str, out_scale: int = 2) -> str:
    """DuckDB twin of money_sum."""
    return f"CAST(ROUND(SUM({expr_sql}), {out_scale}) AS DOUBLE)"


def money_avg_sql(expr_sql: str, out_scale: int = 2) -> str:
    """DuckDB twin of money-sum / count as exact-then-double division."""
    return (
        f"CAST(ROUND(SUM({expr_sql}), {out_scale}) AS DOUBLE)"
        f" / CAST(COUNT(*) AS DOUBLE)"
    )
