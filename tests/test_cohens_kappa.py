"""Cohen's kappa — pre-validation for the round-11 registration queue
(operators/stats.py:cohens_kappa).

Chance-corrected inter-rater agreement in the exact common-denominator
integer form; raters synthesized from the md5 hash family (75%%
agreement by construction). Registration-ready oracle text in
KAPPA_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

KAPPA_ORACLE = """
    WITH r AS (
        SELECT source AS g,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 3 AS a0,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT % 4 AS flip
        FROM read_parquet('{sf}/documents.parquet')
    ),
    lab AS (
        SELECT g, CAST(a0 AS VARCHAR) AS a,
               CAST(CASE WHEN flip < 3 THEN a0 ELSE (a0 + 1) % 3 END
                    AS VARCHAR) AS b
        FROM r
    ),
    cells AS (SELECT g, a, b, COUNT(*) AS c FROM lab GROUP BY 1, 2, 3),
    ma AS (SELECT g, a, SUM(c) AS ra FROM cells GROUP BY 1, 2),
    mb AS (SELECT g, b, SUM(c) AS cb FROM cells GROUP BY 1, 2),
    ch AS (
        SELECT ma.g, SUM(ra * cb) AS chance_num
        FROM ma JOIN mb ON ma.g = mb.g AND ma.a = mb.b GROUP BY ma.g
    ),
    tot AS (
        SELECT g, SUM(c) AS n,
               SUM(CASE WHEN a = b THEN c ELSE 0 END) AS agree
        FROM cells GROUP BY g
    )
    SELECT tot.g AS group_key,
           CAST(n AS BIGINT) AS n,
           CAST(agree AS BIGINT) AS agree,
           CAST(chance_num AS BIGINT) AS chance_num,
           CASE WHEN n * n <> chance_num
                THEN CAST((1000000 * (n * agree - chance_num))
                          // (n * n - chance_num) AS BIGINT)
           END AS kappa_ppm
    FROM tot JOIN ch ON tot.g = ch.g
"""


def test_cohens_kappa_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import cohens_kappa
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
        "CAST(a0 AS STRING) AS a",
        "CAST(CASE WHEN flip < 3 THEN a0 ELSE (a0 + 1) % 3 END"
        " AS STRING) AS b",
    )
    got = (
        cohens_kappa(lab, "g", "a", "b")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(KAPPA_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_cohens_kappa_hand_values(spark):
    """2x2: cells (y,y)=4, (y,n)=1, (n,y)=1, (n,n)=4 -> N=10, A=8,
    E = 5*5 + 5*5 = 50; kappa = (80-50)/(100-50) = 0.6 -> 600000."""
    from kafka_streams_aggregate_spark.operators.stats import cohens_kappa

    rows = (
        [("g", "y", "y")] * 4
        + [("g", "y", "n")]
        + [("g", "n", "y")]
        + [("g", "n", "n")] * 4
    )
    df = spark.createDataFrame(rows, "g string, a string, b string")
    [r] = cohens_kappa(df, "g", "a", "b").collect()
    assert (r["n"], r["agree"], r["chance_num"], r["kappa_ppm"]) == (
        10,
        8,
        50,
        600_000,
    )


def test_cohens_kappa_degenerate_null(spark):
    """Both raters constant: N*N == E -> kappa undefined (NULL)."""
    from kafka_streams_aggregate_spark.operators.stats import cohens_kappa

    df = spark.createDataFrame(
        [("g", "x", "x"), ("g", "x", "x")], "g string, a string, b string"
    )
    [r] = cohens_kappa(df, "g", "a", "b").collect()
    assert r["kappa_ppm"] is None and r["agree"] == 2
