"""Winsorization + Tukey-fence outlier audit — pre-validation for the
round-11 registration queue (operators/stats.py:winsorize /
tukey_outliers).

Both keep the classic robust rules entirely in exact integer space:
rank-selected bounds by the ceil-rank rule, and the 1.5*IQR fences
doubled so no float appears. Registration-ready oracle texts in
WINSOR_ORACLE / TUKEY_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

WINSOR_ORACLE = """
    WITH v AS (
        SELECT CAST(c_nationkey AS BIGINT) AS g,
               CAST(c_custkey AS BIGINT) AS id,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v
        FROM read_parquet('{sf}/customer.parquet')
    ),
    ranked AS (
        SELECT g, id, v,
               row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM v
    ),
    bounds AS (
        SELECT g,
               CAST(MIN(CASE WHEN rn >= (10 * n + 99) // 100 THEN v END)
                    AS BIGINT) AS lo,
               CAST(MIN(CASE WHEN rn >= (90 * n + 99) // 100 THEN v END)
                    AS BIGINT) AS hi
        FROM ranked GROUP BY g
    )
    SELECT r.g AS group_key, r.id, r.v,
           CAST(greatest(b.lo, least(b.hi, r.v)) AS BIGINT) AS v_wins,
           CAST(CASE WHEN r.v < b.lo THEN -1 WHEN r.v > b.hi THEN 1
                     ELSE 0 END AS BIGINT) AS clipped
    FROM ranked r JOIN bounds b ON r.g = b.g
"""

TUKEY_ORACLE = """
    WITH v AS (
        SELECT CAST(c_nationkey AS BIGINT) AS g,
               CAST(c_custkey AS BIGINT) AS id,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v
        FROM read_parquet('{sf}/customer.parquet')
    ),
    ranked AS (
        SELECT g, id, v,
               row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM v
    ),
    bounds AS (
        SELECT g,
               CAST(MIN(CASE WHEN rn >= (25 * n + 99) // 100 THEN v END)
                    AS BIGINT) AS q1,
               CAST(MIN(CASE WHEN rn >= (75 * n + 99) // 100 THEN v END)
                    AS BIGINT) AS q3
        FROM ranked GROUP BY g
    )
    SELECT r.g AS group_key,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(b.q1) AS BIGINT) AS q1,
           CAST(MAX(b.q3) AS BIGINT) AS q3,
           CAST(SUM(CASE WHEN 2 * r.v < 2 * b.q1 - 3 * (b.q3 - b.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN 2 * r.v > 2 * b.q3 + 3 * (b.q3 - b.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM ranked r JOIN bounds b ON r.g = b.g
    GROUP BY r.g
"""


def _cust(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "customer", SF).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.col("c_custkey").cast("bigint").alias("id"),
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("v"),
    )


def test_winsorize_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import winsorize

    got = (
        winsorize(_cust(spark), "g", "v", "id", lo_pct=10, hi_pct=90)
        .toPandas()
        .sort_values(["group_key", "id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(WINSOR_ORACLE.format(sf=SF))
        .df()
        .sort_values(["group_key", "id"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert (got["clipped"] != 0).any()
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_tukey_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import tukey_outliers

    got = (
        tukey_outliers(_cust(spark), "g", "v", "id")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(TUKEY_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_winsorize_hand_values(spark):
    """1..10 at (20, 80): lo = rank-2 value = 2, hi = rank-8 value =
    8; 1 clamps up, 10 clamps down, 5 untouched."""
    from kafka_streams_aggregate_spark.operators.stats import winsorize

    df = spark.createDataFrame(
        [("g", i, i) for i in range(1, 11)], "g string, id long, v long"
    )
    rows = {
        r["id"]: r
        for r in winsorize(df, "g", "v", "id", lo_pct=20, hi_pct=80).collect()
    }
    assert (rows[1]["v_wins"], rows[1]["clipped"]) == (2, -1)
    assert (rows[10]["v_wins"], rows[10]["clipped"]) == (8, 1)
    assert (rows[5]["v_wins"], rows[5]["clipped"]) == (5, 0)


def test_tukey_hand_values(spark):
    """1..11 plus 100: n=12, q1 = rank-3 value = 3, q3 = rank-9 value
    = 9, iqr 6; high fence v > 18 -> only 100; low fence v < -6 ->
    none."""
    from kafka_streams_aggregate_spark.operators.stats import tukey_outliers

    vals = list(range(1, 12)) + [100]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, id long, v long"
    )
    [r] = tukey_outliers(df, "g", "v", "id").collect()
    assert (r["n"], r["q1"], r["q3"], r["n_low"], r["n_high"]) == (
        12,
        3,
        9,
        0,
        1,
    )
