"""Weighted percentiles — pre-validation for the round-11
registration queue (operators/stats.py:weighted_percentile).

Exact cumulative-weight ceil-rank selection; RANGE-frame peers make
the selection tie-order-independent by construction. Registration-
ready oracle text in WPCT_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

WPCT_ORACLE = """
    WITH b AS (
        SELECT l_returnflag AS g,
               CAST(floor(l_extendedprice) AS BIGINT) AS v,
               CAST(floor(l_quantity) AS BIGINT) AS w
        FROM read_parquet('{sf}/lineitem.parquet')
    ),
    c AS (
        SELECT g, v,
               SUM(w) OVER (PARTITION BY g ORDER BY v) AS cumw,
               SUM(w) OVER (PARTITION BY g) AS wt
        FROM b
    )
    SELECT g AS group_key,
           CAST(MAX(wt) AS BIGINT) AS w_total,
           CAST(MIN(CASE WHEN cumw >= (50 * wt + 99) // 100 THEN v END)
                AS BIGINT) AS p50,
           CAST(MIN(CASE WHEN cumw >= (90 * wt + 99) // 100 THEN v END)
                AS BIGINT) AS p90,
           CAST(MIN(CASE WHEN cumw >= (99 * wt + 99) // 100 THEN v END)
                AS BIGINT) AS p99
    FROM c GROUP BY g
"""


def test_weighted_percentile_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        weighted_percentile,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF).select(
        F.col("l_returnflag").alias("g"),
        F.expr("CAST(floor(l_extendedprice) AS BIGINT)").alias("v"),
        F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("w"),
    )
    got = (
        weighted_percentile(li, "g", "v", "w")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(WPCT_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_weighted_percentile_hand_values(spark):
    """values 1..4 with weights (1, 1, 1, 7), W=10: p50 target = 5
    -> value 4 (cum 3 at v=3, 10 at v=4); p90 target 9 -> 4;
    unweighted-style p10 target 1 -> value 1."""
    from kafka_streams_aggregate_spark.operators.stats import (
        weighted_percentile,
    )

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 1), ("g", 4, 7)],
        "g string, v long, w long",
    )
    [r] = weighted_percentile(
        df, "g", "v", "w", percentiles=(10, 50, 90)
    ).collect()
    assert r["w_total"] == 10
    assert (r["p10"], r["p50"], r["p90"]) == (1, 4, 4)


def test_weighted_percentile_duplicate_values_peer_cum(spark):
    """Duplicate values are RANGE peers: weights at equal v pool
    before the threshold test, so selection is order-independent.
    v=5 twice (w 4 each), v=9 once (w 2), W=10: p40 target 4 -> 5."""
    from kafka_streams_aggregate_spark.operators.stats import (
        weighted_percentile,
    )

    df = spark.createDataFrame(
        [("g", 5, 4), ("g", 5, 4), ("g", 9, 2)], "g string, v long, w long"
    )
    [r] = weighted_percentile(df, "g", "v", "w", percentiles=(40, 95)).collect()
    assert (r["p40"], r["p95"]) == (5, 9)
