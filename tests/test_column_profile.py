"""Column profiler — pre-validation for the round-11 registration
queue (operators/stats.py:column_profile).

Profiled columns are integer/string typed (the operator's exactness
contract: float min/max to-string formatting differs across engines).
Registration-ready oracle text in PROFILE_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]

PROFILE_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS "column",
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_repr,
           CAST(MAX({c}) AS VARCHAR) AS max_repr
    FROM read_parquet('{{sf}}/orders.parquet')
    """
    for c in _COLS
)


def test_profile_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.stats import column_profile
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    got = (
        column_profile(orders, _COLS)
        .toPandas()
        .sort_values("column")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(PROFILE_ORACLE.format(sf=SF))
        .df()
        .sort_values("column")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) == len(_COLS)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_profile_nulls_and_minmax(spark):
    """NULL counting and native-order (not lexicographic) min/max."""
    from kafka_streams_aggregate_spark.operators.stats import column_profile

    df = spark.createDataFrame(
        [(1, "b"), (2, None), (10, "a"), (None, "a")],
        "x int, s string",
    )
    got = {
        r["column"]: (
            r["n_rows"], r["n_null"], r["n_distinct"],
            r["min_repr"], r["max_repr"],
        )
        for r in column_profile(df, ["x", "s"]).collect()
    }
    # native int order: max is 10, not lexicographic "2"
    assert got["x"] == (4, 1, 3, "1", "10")
    assert got["s"] == (4, 1, 2, "a", "b")
