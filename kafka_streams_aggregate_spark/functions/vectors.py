"""Vector expression helpers over array<double> columns.

All pure Catalyst higher-order functions (`zip_with`/`aggregate`):
JVM-side, codegen'd, no Python in the hot path. The fold is a
sequential left-to-right sum — the same evaluation order DuckDB's
list_inner_product uses on DOUBLE[], so cosine values are
bit-comparable against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """dot / sqrt(|a|^2 * |b|^2) — single-sqrt formula, mirrored
    exactly in the oracle SQL."""
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


# DuckDB twins (same formula, same DOUBLE[] cast, same sequential sum).
def cosine_sql(a_sql: str, b_sql: str) -> str:
    return (
        f"list_inner_product(CAST({a_sql} AS DOUBLE[]), CAST({b_sql} AS DOUBLE[]))"
        f" / sqrt(list_inner_product(CAST({a_sql} AS DOUBLE[]), CAST({a_sql} AS DOUBLE[]))"
        f" * list_inner_product(CAST({b_sql} AS DOUBLE[]), CAST({b_sql} AS DOUBLE[])))"
    )
