"""Exact rank-based ROC AUC — pre-validation for the round-11
registration queue (operators/stats.py:auc_roc_exact).

Mann–Whitney rank identity with the repo's tie-broken permutation-
rank policy; integer core, one window + one aggregate. Registration-
ready oracle text in AUC_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

AUC_ORACLE = """
    WITH s AS (
        SELECT source AS g, doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS score,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 2))::BIGINT < 64
                    THEN 1 ELSE 0 END AS label
        FROM read_parquet('{sf}/documents.parquet')
    ),
    r AS (
        SELECT g, label,
               row_number() OVER (PARTITION BY g ORDER BY score, doc_id)
                   AS rk
        FROM s
    ),
    a AS (
        SELECT g, SUM(label) AS n_pos,
               COUNT(*) - SUM(label) AS n_neg,
               SUM(label * rk) AS rank_sum_pos
        FROM r GROUP BY g
    )
    SELECT g AS group_key,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CAST(rank_sum_pos AS BIGINT) AS rank_sum_pos,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST((1000000 * (rank_sum_pos
                           - (n_pos * (n_pos + 1)) // 2))
                          // (n_pos * n_neg) AS BIGINT)
           END AS auc_ppm
    FROM a
"""


def test_auc_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import auc_roc_exact
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF).select(
        F.col("source").alias("g"),
        F.col("doc_id"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("score"),
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)), 5, 2),"
            " 16, 10) AS BIGINT) < 64 THEN 1 ELSE 0 END"
        ).alias("label"),
    )
    got = (
        auc_roc_exact(docs, "g", "score", "label", "doc_id")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(AUC_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_auc_hand_values(spark):
    """Scores 10<20<30<40, labels (0,1,0,1): positive ranks {2,4},
    AUC = (6 - 3)/4 = 0.75 -> 750000 ppm. Perfect separation
    (labels 0,0,1,1) -> 1e6."""
    from kafka_streams_aggregate_spark.operators.stats import auc_roc_exact

    df = spark.createDataFrame(
        [("g", 1, 10, 0), ("g", 2, 20, 1), ("g", 3, 30, 0), ("g", 4, 40, 1)],
        "g string, id long, score long, label long",
    )
    [r] = auc_roc_exact(df, "g", "score", "label", "id").collect()
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (2, 2, 750_000)

    perfect = spark.createDataFrame(
        [("g", 1, 10, 0), ("g", 2, 20, 0), ("g", 3, 30, 1), ("g", 4, 40, 1)],
        "g string, id long, score long, label long",
    )
    [p] = auc_roc_exact(perfect, "g", "score", "label", "id").collect()
    assert p["auc_ppm"] == 1_000_000


def test_auc_single_class_null(spark):
    from kafka_streams_aggregate_spark.operators.stats import auc_roc_exact

    df = spark.createDataFrame(
        [("g", 1, 10, 1), ("g", 2, 20, 1)],
        "g string, id long, score long, label long",
    )
    [r] = auc_roc_exact(df, "g", "score", "label", "id").collect()
    assert r["auc_ppm"] is None
