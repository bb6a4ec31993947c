"""The cross-engine md5 hash family — single owner of the expression pair.

Spark and DuckDB compute md5 bit-identically, so an integer derived
from a fixed-width hex prefix is the one hash both engines agree on
cell-exactly (xxhash64 is JVM-only). 15 hex digits = 60 bits is the
widest prefix that still fits a signed BIGINT on both engines.

Every operator family that needs oracle-verifiable hashing (minhash/
simhash twins in operators/dedup.py, the HLL/CMS/Bloom sketches in
operators/sketches.py) MUST take both sides of the pair from here: the
Spark column expression and the DuckDB SQL text encode the same
(prefix-width, cast) choice, and a drift between them silently breaks
an engine-parity oracle somewhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH60_HEX_DIGITS = 15  # 60 bits; 16 digits could set the sign bit


def hash60(col: Column) -> Column:
    """Spark side: md5-derived non-negative 60-bit BIGINT."""
    return F.conv(
        F.substring(F.md5(col), 1, HASH60_HEX_DIGITS), 16, 10
    ).cast("bigint")


def hash60_sql(expr: str) -> str:
    """DuckDB side; ``expr`` must already be a VARCHAR expression."""
    return (
        f"CAST(CONCAT('0x', substr(md5({expr}), 1, {HASH60_HEX_DIGITS}))"
        f" AS BIGINT)"
    )
