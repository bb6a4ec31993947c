"""Linear-weighted Cohen's kappa — pre-validation for the round-11
registration queue (operators/stats.py:cohens_kappa_weighted).

Ordinal partial-credit agreement in the exact common-denominator
integer form; chance term is a label²-sized marginal cross, never a
data-sized join. Registration-ready oracle text in WKAPPA_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

WKAPPA_ORACLE = """
    WITH r AS (
        SELECT source AS g,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 3 AS a0,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT % 4 AS flip
        FROM read_parquet('{sf}/documents.parquet')
    ),
    lab AS (
        SELECT g, a0 AS a,
               CASE WHEN flip < 3 THEN a0 ELSE (a0 + 1) % 3 END AS b
        FROM r
    ),
    cells AS (SELECT g, a, b, COUNT(*) AS c FROM lab GROUP BY 1, 2, 3),
    ma AS (SELECT g, a, SUM(c) AS ra FROM cells GROUP BY 1, 2),
    mb AS (SELECT g, b, SUM(c) AS cb FROM cells GROUP BY 1, 2),
    ch AS (
        SELECT ma.g, SUM(abs(ma.a - mb.b) * ra * cb) AS we_num
        FROM ma JOIN mb ON ma.g = mb.g GROUP BY ma.g
    ),
    tot AS (
        SELECT g, SUM(c) AS n, SUM(abs(a - b) * c) AS wo_num
        FROM cells GROUP BY g
    )
    SELECT tot.g AS group_key,
           CAST(n AS BIGINT) AS n,
           CAST(wo_num AS BIGINT) AS wo_num,
           CAST(we_num AS BIGINT) AS we_num,
           CASE WHEN we_num <> 0
                THEN CAST((1000000 * (we_num - n * wo_num)) // we_num
                          AS BIGINT)
           END AS kappa_w_ppm
    FROM tot JOIN ch ON tot.g = ch.g
"""


def test_weighted_kappa_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        cohens_kappa_weighted,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF).select(
        F.col("source").alias("g"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10)"
            " AS BIGINT) % 3"
        ).alias("a0"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 3, 2), 16, 10)"
            " AS BIGINT) % 4"
        ).alias("flip"),
    )
    lab = docs.selectExpr(
        "g",
        "a0 AS a",
        "CASE WHEN flip < 3 THEN a0 ELSE (a0 + 1) % 3 END AS b",
    )
    got = (
        cohens_kappa_weighted(lab, "g", "a", "b")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(WKAPPA_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_weighted_kappa_hand_values(spark):
    """cells (0,0)x2, (0,1)x1, (2,2)x1: N=4, WO=1,
    WE = 3*(0+1+2) + 1*(2+1+0) = 14 -> kappa = (14-4)/14 ->
    714285 ppm."""
    from kafka_streams_aggregate_spark.operators.stats import (
        cohens_kappa_weighted,
    )

    df = spark.createDataFrame(
        [("g", 0, 0), ("g", 0, 0), ("g", 0, 1), ("g", 2, 2)],
        "g string, a long, b long",
    )
    [r] = cohens_kappa_weighted(df, "g", "a", "b").collect()
    assert (r["n"], r["wo_num"], r["we_num"], r["kappa_w_ppm"]) == (
        4,
        1,
        14,
        714_285,
    )


def test_weighted_kappa_degenerate_null(spark):
    """One label only on both sides: WE = 0 -> NULL."""
    from kafka_streams_aggregate_spark.operators.stats import (
        cohens_kappa_weighted,
    )

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 1, 1)], "g string, a long, b long"
    )
    [r] = cohens_kappa_weighted(df, "g", "a", "b").collect()
    assert r["kappa_w_ppm"] is None
