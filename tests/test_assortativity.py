"""Degree assortativity — pre-validation for the round-11
registration queue (operators/graph.py:degree_assortativity).

Exact integer Pearson core over symmetrized endpoint degrees; float
tail is cast->sqrt x2, multiply, divide (sqrt is IEEE-exact), so the
oracle is bit-equal (hex pin). Registration-ready oracle text in
ASSORT_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

ASSORT_ORACLE = """
    WITH li AS (
        SELECT DISTINCT l_suppkey, l_partkey
        FROM read_parquet('{sf}/lineitem.parquet')
    ),
    e AS (
        SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
               'p' || CAST(l_partkey AS VARCHAR) AS dst
        FROM li
    ),
    sym AS (
        SELECT src, dst FROM e
        UNION ALL
        SELECT dst, src FROM e
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src),
    paired AS (
        SELECT a.deg AS dx, b.deg AS dy
        FROM sym JOIN deg a ON sym.src = a.node
                 JOIN deg b ON sym.dst = b.node
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(dx) AS BIGINT) AS sum_x,
               CAST(SUM(dy) AS BIGINT) AS sum_y,
               CAST(SUM(dx * dy) AS BIGINT) AS sum_xy,
               CAST(SUM(dx * dx) AS BIGINT) AS sum_x2,
               CAST(SUM(dy * dy) AS BIGINT) AS sum_y2
        FROM paired
    )
    SELECT m, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
           CASE WHEN m * sum_x2 - sum_x * sum_x > 0
                 AND m * sum_y2 - sum_y * sum_y > 0
                THEN CAST(m * sum_xy - sum_x * sum_y AS DOUBLE)
                     / (sqrt(CAST(m * sum_x2 - sum_x * sum_x AS DOUBLE))
                        * sqrt(CAST(m * sum_y2 - sum_y * sum_y AS DOUBLE)))
           END AS assortativity
    FROM agg
"""


def test_assortativity_parity_bit_equal(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import (
        degree_assortativity,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = (
        load_table(spark, "lineitem", SF)
        .select("l_suppkey", "l_partkey")
        .dropDuplicates()
    )
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    got = degree_assortativity(edges).toPandas()
    con = duckdb.connect()
    exp = con.sql(ASSORT_ORACLE.format(sf=SF)).df()
    con.close()
    assert len(got) == len(exp) == 1
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    assert got["assortativity"][0] == exp["assortativity"][0]
    assert got["assortativity"][0].hex() == exp["assortativity"][0].hex()


def test_assortativity_hand_values(spark):
    """Star K_{1,3}: hub degree 3, leaves 1. Symmetrized pairs: three
    (3,1) + three (1,3): m=6, Sx=Sy=12, Sxy=18, Sxx=Syy=30;
    r = (108-144)/(sqrt(36)*sqrt(36)) = -1 (perfectly
    disassortative)."""
    from kafka_streams_aggregate_spark.operators.graph import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c")], "src string, dst string"
    )
    [r] = degree_assortativity(edges).collect()
    assert (r["m"], r["sum_x"], r["sum_xy"], r["sum_x2"]) == (6, 12, 18, 30)
    assert r["assortativity"] == -1.0


def test_assortativity_regular_null(spark):
    """A 3-cycle is 2-regular: zero degree variance -> NULL."""
    from kafka_streams_aggregate_spark.operators.graph import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    [r] = degree_assortativity(edges).collect()
    assert r["assortativity"] is None
