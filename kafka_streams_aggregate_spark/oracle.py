"""Local DuckDB oracle harness — a stand-in for the driver's
correctness gate (row-count + schema + order-insensitive value-hash),
used by the test suite so parity failures surface before a round ends.

Comparison is deliberately strict: columns sorted by name, rows sorted
by all columns, cell-by-cell equality with exact float matching. If
this passes, any reasonable value-hash passes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kafka_streams_aggregate_spark.schemas import TABLE_NAMES


def duck_con_for(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _cell(v):
    """Canonicalize one cell, PRESERVING the numeric kind.

    The driver's value-hash distinguishes int64 from float64 (round 9's
    q_cohort_ltv red row: a DuckDB HUGEINT window sum fetched into
    pandas as float64 hashed differently from Spark's int64 even though
    every value compared equal). Python's ``100 == 100.0`` is ``True``,
    so a plain ``.item()`` normalization is blind to exactly that
    failure class — wrap numerics as (kind, value) pairs so int-vs-float
    (and Decimal-vs-either) drift fails locally the way it fails at the
    driver. bool is an int subclass: test it first.
    """
    import decimal

    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if hasattr(v, "item") and type(v).__name__ != "ndarray":  # numpy scalar
        v = v.item()
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    return v


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    rows: list[tuple] = []
    for row in pdf.itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon_row.append(tuple(_cell(x) for x in v))
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif pd.api.types.is_scalar(v) and pd.isna(v):
                canon_row.append(None)
            else:
                canon_row.append(_cell(v))
        rows.append(tuple(canon_row))
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityResult:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return ParityResult(
            name, False, len(spark_pdf), len(oracle_pdf),
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
        )
    if len(spark_pdf) != len(oracle_pdf):
        return ParityResult(
            name, False, len(spark_pdf), len(oracle_pdf),
            f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}",
        )
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return ParityResult(
                name, False, len(spark_pdf), len(oracle_pdf),
                f"first row diff at sorted idx {i}:\n  spark : {ra}\n  oracle: {rb}",
            )
    return ParityResult(name, True, len(spark_pdf), len(oracle_pdf))


def check_query(
    spark: SparkSession, name: str, sf_dir: str, con: Any | None = None
) -> ParityResult:
    """Run one registered query against its oracle and compare."""
    from kafka_streams_aggregate_spark.registry import load_all

    qd = load_all()[name]
    sdf: DataFrame = qd.spark(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if qd.oracle is None:
        return ParityResult(name, True, len(spark_pdf), -1, "rows-only (no oracle)")
    own_con = con is None
    con = con or duck_con_for(sf_dir)
    try:
        oracle_pdf = con.execute(qd.oracle).fetchdf()
    finally:
        if own_con:
            con.close()
    return compare_frames(name, spark_pdf, oracle_pdf)
